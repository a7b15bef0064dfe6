"""Flagship models: KeypointCompleter, its Cycle variant, and the linear
autoencoder Embedding.

Batch-first, padded-batch TPU re-design of the reference models
(model.py:60-340).  One Flax module covers both KeypointCompleter
(model.py:60-170) and KeypointCompleterCycle (model.py:212-321); the two
differ only in

  * positional-encoding application: A1 computes
    ``token_norm(x) + pe + learned`` (model.py:128-132) while Cycle keeps an
    extra pre-PE residual, ``token_norm(x) + (token_norm(x) + pe) + learned``
    (model.py:283-284) — the ``pe_residual`` flag;
  * PE table length: 2048 vs 512 (model.py:74-75 vs 226-227);
  * target key-padding: A1 hardcodes ``tgt_key_padding_mask=None``
    (model.py:143) while Cycle forwards it (model.py:294) — the
    ``use_tgt_key_padding`` flag.

Inputs are (B, T, K, 2) with an optional (B, T) validity mask; padded frames
are excluded from attention so batched outputs equal the reference's
batch-size-1 outputs exactly on real frames.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.keypoints import FRAME_FEATURES, NUM_COORDS, NUM_KEYPOINTS
from ..ops import masks as mask_ops
from .layers import (SwiGLU, TransformerCore, _DenseParams, _SwiGLUParams,
                     sinusoidal_positional_encoding, token_norm)


def _attention_platform() -> str:
    """Platform the model will actually execute on: an explicitly pinned
    jax_default_device wins (the test suite pins CPU while the TPU plugin
    still wins the default-backend election); else the default backend."""
    dev = jax.config.jax_default_device
    if isinstance(dev, str):  # jax also accepts platform strings here
        return dev
    platform = getattr(dev, "platform", None)
    return platform if platform is not None else jax.default_backend()


def resolve_pointwise_impl(impl: str) -> str:
    """"auto": the fused pre/post pointwise-chain kernels on TPU
    (ops/pallas/pointwise.py), plain XLA elsewhere."""
    if impl != "auto":
        return impl
    return "pallas" if _attention_platform() == "tpu" else "xla"


def resolve_attention_impl(impl: str, T: int, min_len: int = 0) -> str:
    """"auto" picks the pallas kernel on TPU — it beats XLA at every
    measured shape (1.10x at B=256 T=128 up to 3.1x at T=1024; RESULTS.md
    crossover table), since the (B, H, T, T) logits never touch HBM — and
    xla otherwise; pallas kernels only compile for the TPU backend.
    ``min_len`` raises the bar for the kernel (0 = always on TPU)."""
    if impl != "auto":
        return impl
    if T >= min_len and _attention_platform() == "tpu":
        return "pallas"
    return "xla"


def _expand_bias(bias, batch):
    """Normalize a (T, T) / (B, T, T) additive bias to (B, 1, T, T)."""
    if bias is None:
        return None
    if bias.ndim == 2:
        bias = jnp.broadcast_to(bias, (batch,) + bias.shape)
    return bias[:, None, :, :]


class KeypointCompleter(nn.Module):
    """Encoder-decoder keypoint-sequence inpainter.

    Pipeline (reference model.py:100-170): flatten frame -> twin Linear
    embeddings -> per-token norm -> sinusoidal + learned PE -> per-stream
    SwiGLU -> post-LN transformer (src = masked stream, tgt = shifted
    "filled" stream) -> SwiGLU -> token_norm(decoded + filled_emb) residual
    -> swish self-gate -> Linear head -> (B, T, K, 2).
    """

    hidden_dim: int
    num_layers: int
    num_heads: int
    input_size: int = FRAME_FEATURES
    ff_dim: int = 2048
    pe_max_len: int = 2048
    pe_residual: bool = False          # True == Cycle variant
    use_tgt_key_padding: bool = False  # True == Cycle variant
    dtype: jnp.dtype = jnp.float32
    # "xla": additive-bias einsum attention (src_bias/tgt_bias are used);
    # "pallas": fused TPU kernel building the bias in-kernel from the 1-D
    # frame masks (src_bias/tgt_bias ignored; mask kinds come from
    # src_mask_kind/tgt_mask_kind); "auto" (default): pallas on the TPU
    # backend — it wins at every measured shape (RESULTS.md crossover
    # table) — and xla elsewhere
    attention_impl: str = "auto"
    auto_pallas_min_len: int = 0
    # fuse the ENTIRE attention sublayer (qkv proj + attention + out proj
    # + residual [+ LN]) into one Pallas kernel when the pallas path is
    # active and T allows full-VMEM residency (ops/pallas/attn_sublayer.py)
    attn_sublayer_fusion: bool = True
    # merge sublayer PAIRS into whole-layer kernels (layer_fused.py) when
    # supported — the fastest inference path.  Training sets this False:
    # the merged kernels' backward is an XLA recompute, while the
    # per-sublayer kernels have native residual-fed Pallas backwards.
    merge_layers: bool = True
    # "pallas" (via "auto" on TPU): fused LN+FF+residual+LN sublayer kernel
    # (ops/pallas/ffn.py); "xla": flax FeedForward + LayerNorms
    ff_impl: str = "auto"
    # fused pre/post pointwise chains (token_norm + PE + SwiGLU in, SwiGLU
    # + residual norm + swish + head out) as Pallas kernels
    # (ops/pallas/pointwise.py); "auto" = pallas on TPU
    pointwise_impl: str = "auto"
    scan_layers: bool = False   # lax.scan over layers (fast compile)
    remat: bool = False         # per-layer rematerialization
    # sequence parallelism: constrain the token axis of the embedding
    # streams to the mesh's "model" axis; GSPMD shards the pointwise /
    # feed-forward work over tokens and inserts the gathers attention
    # needs.  Requires running under a ("data", "model") mesh.
    sequence_parallel: bool = False

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,                 # (B, T, K, 2) masked stream
        filled: jnp.ndarray,                 # (B, T, K, 2) shifted stream
        src_frame_mask: Optional[jnp.ndarray] = None,  # (B, T) 1 = missing
        tgt_frame_mask: Optional[jnp.ndarray] = None,  # (B, T)
        src_bias: Optional[jnp.ndarray] = None,        # (B, T, T) or (T, T)
        tgt_bias: Optional[jnp.ndarray] = None,
        valid_mask: Optional[jnp.ndarray] = None,      # (B, T) 1 = real frame
        src_mask_kind: str = "repeat-inc",             # pallas path only
        tgt_mask_kind: str = "repeat-inc",
    ) -> jnp.ndarray:
        B, T = inputs.shape[0], inputs.shape[1]
        if T > self.pe_max_len:
            raise ValueError(
                f"sequence length {T} exceeds pe_max_len={self.pe_max_len}; "
                "raise pe_max_len or chunk the sequence")
        x = inputs.reshape(B, T, -1).astype(self.dtype)
        f = filled.reshape(B, T, -1).astype(self.dtype)

        pe = sinusoidal_positional_encoding(
            self.pe_max_len, self.hidden_dim, self.dtype)[:T]
        learned_in = self.param(
            "learned_input_pos", nn.initializers.uniform(scale=1.0),
            (1, 1, self.hidden_dim), self.dtype)
        learned_fill = self.param(
            "learned_filled_pos", nn.initializers.uniform(scale=1.0),
            (1, 1, self.hidden_dim), self.dtype)

        # width cap: the three stacked SwiGLU weights are VMEM-stationary
        # (18*D^2 bytes under bf16x3) — D=1024 overflows the 16 MB scoped
        # limit by 2 MB; wider models take the XLA chain
        # sequence_parallel excluded like the sublayer-fusion gate below:
        # an unpartitioned pallas_call cannot take mesh-sharded (B, T, D)
        # activations on the token axis
        use_pw = (resolve_pointwise_impl(self.pointwise_impl) == "pallas"
                  and self.hidden_dim % 128 == 0 and T % 8 == 0
                  and self.hidden_dim <= 512
                  and not self.sequence_parallel)
        import os as _os
        embed_fold = _os.environ.get("KIT_PW_EMBED", "1") == "1"
        if use_pw and embed_fold:
            # the 108-wide embedding Dense folds INTO the pre-stream
            # kernel (lane-padded to 128): the narrow matmul stops
            # wasting 20 of 128 MXU lanes as a standalone op and the
            # (B, T, D) embeddings never round-trip HBM.  Param trees
            # stay identical to the nn.Dense path (checkpoint compat).
            from ..ops.pallas.pointwise import fused_pre_stream_embed
            w_in, b_in = _DenseParams(x.shape[-1], self.hidden_dim,
                                      name="input_embedding")()
            w_fill, b_fill = _DenseParams(f.shape[-1], self.hidden_dim,
                                          name="filled_embedding")()
            sw_in = _SwiGLUParams(self.hidden_dim,
                                  name="swiglu_input_prev")()
            sw_fill = _SwiGLUParams(self.hidden_dim,
                                    name="swiglu_filled_prev")()
            src = fused_pre_stream_embed(x, w_in, b_in,
                                         pe + learned_in[0],
                                         *sw_in, self.pe_residual, False)
            tgt, filled_emb = fused_pre_stream_embed(
                f, w_fill, b_fill, pe + learned_fill[0],
                *sw_fill, self.pe_residual, True)
        elif use_pw:  # KIT_PW_EMBED=0: XLA embed + fused pointwise chain
            from ..ops.pallas.pointwise import fused_pre_stream
            input_emb = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name="input_embedding")(x)
            filled_emb = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                  name="filled_embedding")(f)
            sw_in = _SwiGLUParams(self.hidden_dim,
                                  name="swiglu_input_prev")()
            sw_fill = _SwiGLUParams(self.hidden_dim,
                                    name="swiglu_filled_prev")()
            src = fused_pre_stream(input_emb, pe + learned_in[0],
                                   *sw_in, self.pe_residual)
            tgt = fused_pre_stream(filled_emb, pe + learned_fill[0],
                                   *sw_fill, self.pe_residual)
        else:
            input_emb = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name="input_embedding")(x)
            filled_emb = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                  name="filled_embedding")(f)
            input_norm = token_norm(input_emb)
            filled_norm = token_norm(filled_emb)
            if self.pe_residual:  # Cycle pre-PE residual (model.py:283)
                input_pos = input_norm + (input_norm + pe) + learned_in
                filled_pos = filled_norm + (filled_norm + pe) + learned_fill
            else:                 # A1 (model.py:128-132)
                input_pos = (input_norm + pe) + learned_in
                filled_pos = (filled_norm + pe) + learned_fill

            src = SwiGLU(self.hidden_dim, self.dtype,
                         name="swiglu_input_prev")(input_pos)
            tgt = SwiGLU(self.hidden_dim, self.dtype,
                         name="swiglu_filled_prev")(filled_pos)

        if self.sequence_parallel:
            from jax.sharding import PartitionSpec as _P
            from jax.lax import with_sharding_constraint as _wsc
            spec = _P("data", "model", None)
            try:
                src, tgt = _wsc(src, spec), _wsc(tgt, spec)
            except RuntimeError:
                pass  # no mesh in context (e.g. params init) -> no-op

        # ---- attention biases -------------------------------------------
        impl = resolve_attention_impl(self.attention_impl, T,
                                      self.auto_pallas_min_len)
        enc_bias = dec_bias = cross_bias = None
        src_fused = tgt_fused = cross_fused = None
        if impl == "pallas":
            zeros = jnp.zeros((B, T), self.dtype)
            sub = self.attn_sublayer_fusion and not self.sequence_parallel
            src_fused = {
                "mask": src_frame_mask if src_frame_mask is not None
                else zeros,
                "valid": valid_mask,
                "kind": src_mask_kind if src_frame_mask is not None
                else "all",
                "add_keypad": src_frame_mask is not None,
                "sublayer": sub,
                "merge": self.merge_layers,
            }
            tgt_fused = {
                "mask": tgt_frame_mask if tgt_frame_mask is not None
                else zeros,
                "valid": valid_mask,
                "kind": tgt_mask_kind if tgt_frame_mask is not None
                else "all",
                "add_keypad": (self.use_tgt_key_padding
                               and tgt_frame_mask is not None),
                "sublayer": sub,
                "merge": self.merge_layers,
            }
            cross_fused = {"mask": zeros, "valid": valid_mask,
                           "kind": "all", "add_keypad": False,
                           "sublayer": sub, "merge": self.merge_layers}
        else:
            enc_bias = _expand_bias(src_bias, B)
            if src_frame_mask is not None:
                # torch float key_padding_mask: values added to logits
                kp = mask_ops.key_padding_additive(src_frame_mask)[:, None]
                enc_bias = kp if enc_bias is None else enc_bias + kp

            dec_bias = _expand_bias(tgt_bias, B)
            if self.use_tgt_key_padding and tgt_frame_mask is not None:
                kp = mask_ops.key_padding_additive(tgt_frame_mask)[:, None]
                dec_bias = kp if dec_bias is None else dec_bias + kp

            if valid_mask is not None:
                pad = mask_ops.padding_bias(valid_mask)[:, None]
                enc_bias = pad if enc_bias is None else enc_bias + pad
                dec_bias = pad if dec_bias is None else dec_bias + pad
                cross_bias = pad

        decoded = TransformerCore(
            self.hidden_dim, self.num_heads, self.num_layers, self.ff_dim,
            self.dtype, scan_layers=self.scan_layers, remat=self.remat,
            ff_impl=self.ff_impl, name="transformer")(
                src, tgt, enc_bias, dec_bias, cross_bias,
                src_fused, tgt_fused, cross_fused)

        if use_pw:
            from ..ops.pallas.pointwise import fused_post_head
            sw_dec = _SwiGLUParams(self.hidden_dim,
                                   name="swiglu_decoded")()
            wh, bh = _DenseParams(self.hidden_dim, self.input_size,
                                  name="fc_final")()
            out = fused_post_head(decoded, filled_emb, *sw_dec, wh, bh)
        else:
            decoded = SwiGLU(self.hidden_dim, self.dtype,
                             name="swiglu_decoded")(decoded)
            decoded = token_norm(decoded + filled_emb)
            decoded = decoded * jax.nn.sigmoid(decoded)  # swish self-gate
            out = nn.Dense(self.input_size, dtype=self.dtype,
                           name="fc_final")(decoded)
        return out.reshape(B, T, NUM_KEYPOINTS, NUM_COORDS)


def keypoint_completer_cycle(hidden_dim, num_layers, num_heads,
                             **kw) -> KeypointCompleter:
    """The Cycle variant (reference KeypointCompleterCycle,
    model.py:212-321)."""
    return KeypointCompleter(
        hidden_dim=hidden_dim, num_layers=num_layers, num_heads=num_heads,
        pe_max_len=512, pe_residual=True, use_tgt_key_padding=True, **kw)


class Embedding(nn.Module):
    """Linear autoencoder over flattened frames (reference
    model.py:324-340), pre-trained by the A3 regime."""

    hidden_dim: int
    input_size: int = FRAME_FEATURES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T = x.shape[0], x.shape[1]
        h = x.reshape(B, T, -1).astype(self.dtype)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     name="input_embedding")(h)
        h = nn.Dense(self.input_size, dtype=self.dtype,
                     name="output_embedding")(h)
        return h.reshape(B, T, NUM_KEYPOINTS, NUM_COORDS)
