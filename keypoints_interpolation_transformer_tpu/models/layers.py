"""Core Flax layers for the keypoint inpainter.

These re-derive, batch-first and TPU-native, the exact numerical semantics of
the reference model's building blocks (reference model.py):

  * SwiGLU (model.py:11-22)
  * sinusoidal positional encoding (model.py:24-50)
  * token_norm — the reference applies torch ``InstanceNorm1d(hidden_dim)``
    to sequence-first (T, 1, D) activations (model.py:69-70,124-125,150):
    with batch dim T and channel dim 1, torch normalizes each token's D
    features to zero mean / unit variance (eps 1e-5, no affine).  That is a
    per-token LayerNorm without scale/offset, which is what we implement.
  * multi-head attention with ADDITIVE float biases — torch adds float
    ``attn_mask`` and float ``key_padding_mask`` values to the logits.
  * post-LN transformer encoder/decoder layers with exact-erf GELU and
    dim_feedforward=2048 (torch nn.Transformer defaults, model.py:84-90).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-5  # torch LayerNorm / InstanceNorm default


def token_norm(x, eps=LN_EPS):
    """Per-token normalization over the feature axis, no affine params."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def sinusoidal_positional_encoding(max_len: int, dim: int,
                                   dtype=jnp.float32) -> jnp.ndarray:
    """(max_len, dim) sin/cos table — reference model.py:33-42."""
    positions = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(positions * div))
    pe = pe.at[:, 1::2].set(jnp.cos(positions * div))
    return pe.astype(dtype)


class SwiGLU(nn.Module):
    """fc3(fc1(x) * sigmoid(fc2(x))), hidden == input dim as used."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x)
        x2 = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc3")(
            x1 * jax.nn.sigmoid(x2))


class MultiHeadAttention(nn.Module):
    """Batch-first MHA with additive-bias masking.

    logits = (q @ k^T) / sqrt(head_dim) + bias, softmax over keys.
    ``bias`` broadcasts against (B, H, Tq, Tk); float values are added
    directly, matching torch's float-mask semantics.

    ``fused_spec`` selects the Pallas fused-attention path instead: a dict
    {"mask": (B, T), "valid": (B, T) | None, "kind": str, "add_keypad":
    bool} — the bias is then built IN-KERNEL from the 1-D masks (see
    ops/pallas/attention.py) and ``bias`` is ignored.
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, bias: Optional[jnp.ndarray] = None,
                 fused_spec: Optional[dict] = None):
        assert self.dim % self.num_heads == 0
        hd = self.dim // self.num_heads

        def heads(name, x):
            y = nn.Dense(self.dim, dtype=self.dtype, name=name)(x)
            return y.reshape(y.shape[:-1] + (self.num_heads, hd))

        q = heads("q_proj", q_in)   # (B, Tq, H, hd)
        k = heads("k_proj", kv_in)  # (B, Tk, H, hd)
        v = heads("v_proj", kv_in)

        if fused_spec is not None:
            from ..ops.pallas.attention import fused_attention
            out = fused_attention(q, k, v, fused_spec["mask"],
                                  fused_spec.get("valid"),
                                  fused_spec.get("kind", "repeat-inc"),
                                  fused_spec.get("add_keypad", False))
            out = out.astype(self.dtype)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / math.sqrt(hd)
            if bias is not None:
                logits = logits + bias.astype(logits.dtype)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(out.shape[:2] + (self.dim,)).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class FeedForward(nn.Module):
    dim: int
    ff_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.ff_dim, dtype=self.dtype, name="linear1")(x)
        h = jax.nn.gelu(h, approximate=False)  # torch "gelu" is exact erf
        return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)


class _DenseParams(nn.Module):
    """Parameters of an nn.Dense (same names/shapes/initializers) WITHOUT
    calling it — lets the fused-FFN path own the identical param tree, so
    checkpoints swap freely between ff_impl='xla' and 'pallas'."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.features_in, self.features_out))
        b = self.param("bias", nn.initializers.zeros,
                       (self.features_out,))
        return k, b


class _LayerNormParams(nn.Module):
    """nn.LayerNorm's scale/bias params without calling it."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _FFParams(nn.Module):
    """linear1/linear2 params under an 'ff'-named scope (matches
    FeedForward's tree)."""

    dim: int
    ff_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.ff_dim, name="linear1")()
        w2, b2 = _DenseParams(self.ff_dim, self.dim, name="linear2")()
        return w1, b1, w2, b2


class _SwiGLUParams(nn.Module):
    """fc1/fc2/fc3 params matching SwiGLU's tree — lets the fused
    pointwise kernels (ops/pallas/pointwise.py) own identical params."""

    dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.dim, name="fc1")()
        w2, b2 = _DenseParams(self.dim, self.dim, name="fc2")()
        w3, b3 = _DenseParams(self.dim, self.dim, name="fc3")()
        return w1, b1, w2, b2, w3, b3


class _MHAParams(nn.Module):
    """q/k/v/out projection params matching MultiHeadAttention's tree —
    lets the fused attention-SUBLAYER kernel own the identical params, so
    checkpoints swap freely between fused and unfused attention."""

    dim: int

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.dim, self.dim, name="q_proj")()
        wk, bk = _DenseParams(self.dim, self.dim, name="k_proj")()
        wv, bv = _DenseParams(self.dim, self.dim, name="v_proj")()
        wo, bo = _DenseParams(self.dim, self.dim, name="out_proj")()
        return wq, bq, wk, bk, wv, bv, wo, bo


def _use_sublayer_kernel(fused, T, D) -> bool:
    from ..ops.pallas.attn_sublayer import fused_attn_sublayer_supported
    return (fused is not None and fused.get("sublayer", False)
            and fused_attn_sublayer_supported(T, D))


def _fused_sublayer(x, memory, mha_params, ln_params, fused, num_heads):
    """Run one whole attention sublayer (projections + attention +
    residual + optional LN) as a single Pallas kernel."""
    from ..ops.pallas.attn_sublayer import fused_attn_sublayer
    if ln_params is None:
        zero = jnp.zeros((0,), x.dtype)
        ln_params, post_ln = (zero, zero), False
    else:
        post_ln = True
    params = (*mha_params, *ln_params)
    return fused_attn_sublayer(
        x, memory, params, (fused["mask"], fused.get("valid")),
        fused.get("kind", "repeat-inc"), fused.get("add_keypad", False),
        post_ln, num_heads)


def resolve_ff_impl(impl: str) -> str:
    """"auto": the fused Pallas FF-sublayer kernel on TPU (the GELU
    intermediate and the residual+LayerNorm never touch HBM; RESULTS.md
    round-3 table), plain XLA elsewhere.  "pallas-int8": the same kernel
    with int8-on-MXU matmuls (serving; falls back to xla off-TPU)."""
    from ..models.completer import _attention_platform
    if impl == "auto":
        return "pallas" if _attention_platform() == "tpu" else "xla"
    if impl == "pallas-int8" and _attention_platform() != "tpu":
        return "xla"
    return impl


class EncoderLayer(nn.Module):
    """Post-LN: x = LN1(x + SA(x)); x = LN2(x + FF(x)).

    ``ff_impl`` "pallas" runs the whole LN1 -> FF -> residual -> LN2 tail
    as ONE fused kernel (ops/pallas/ffn.py) with an identical param tree.
    """

    dim: int
    num_heads: int
    ff_dim: int
    dtype: jnp.dtype = jnp.float32
    ff_impl: str = "xla"

    @nn.compact
    def __call__(self, x, bias=None, fused=None):
        impl = resolve_ff_impl(self.ff_impl)
        use_sub = _use_sublayer_kernel(fused, x.shape[1], self.dim)
        if (use_sub and impl in ("pallas", "pallas-int8")
                and fused.get("merge", True)):
            from ..ops.pallas.layer_fused import (fused_encoder_layer,
                                                  fused_layer_supported)
            if fused_layer_supported(x.shape[1], self.dim, self.ff_dim):
                # the WHOLE layer in one kernel: the attention->FF
                # hand-off never touches HBM; "pallas-int8" runs the FF
                # matmuls int8-on-MXU inside the same kernel
                mha = _MHAParams(self.dim, name="self_attn")()
                g1, be1 = _LayerNormParams(self.dim, name="norm1")()
                w1, b1, w2, b2 = _FFParams(self.dim, self.ff_dim,
                                           name="ff")()
                g2, be2 = _LayerNormParams(self.dim, name="norm2")()
                # attn_int8 measured a net LOSS at the widths the merged
                # kernel supports (D=256: 1534K vs 1759K bf16 frames/s —
                # per-row dynamic quantization VPU overhead exceeds the
                # MXU saving on 256x256 projections); opt-in only
                import os as _os
                a8 = (impl == "pallas-int8"
                      and _os.environ.get("KIT_ATTN_INT8") == "1")
                return fused_encoder_layer(
                    x, (*mha, w1, b1, w2, b2, g1, be1, g2, be2),
                    (fused["mask"], fused.get("valid")),
                    fused.get("kind", "repeat-inc"),
                    fused.get("add_keypad", False), self.num_heads,
                    impl == "pallas-int8", a8)
        if use_sub:
            mha = _MHAParams(self.dim, name="self_attn")()
            r = _fused_sublayer(x, None, mha, None, fused, self.num_heads)
        else:
            r = x + MultiHeadAttention(self.dim, self.num_heads, self.dtype,
                                       name="self_attn")(x, x, bias, fused)
        if impl in ("pallas", "pallas-int8"):
            from ..ops.pallas.ffn import fused_ffn
            g1, be1 = _LayerNormParams(self.dim, name="norm1")()
            w1, b1, w2, b2 = _FFParams(self.dim, self.ff_dim, name="ff")()
            g2, be2 = _LayerNormParams(self.dim, name="norm2")()
            return fused_ffn(r, w1, b1, w2, b2, g1, be1, g2, be2, True,
                             impl == "pallas-int8")
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(r)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(
            x + FeedForward(self.dim, self.ff_dim, self.dtype,
                            name="ff")(x))
        return x


class DecoderLayer(nn.Module):
    """Post-LN: self-attn, cross-attn, feed-forward.

    ``ff_impl`` "pallas" fuses the LN2 -> FF -> residual -> LN3 tail."""

    dim: int
    num_heads: int
    ff_dim: int
    dtype: jnp.dtype = jnp.float32
    ff_impl: str = "xla"

    @nn.compact
    def __call__(self, x, memory, self_bias=None, cross_bias=None,
                 self_fused=None, cross_fused=None):
        if (_use_sublayer_kernel(self_fused, x.shape[1], self.dim)
                and _use_sublayer_kernel(cross_fused, x.shape[1], self.dim)
                and memory.shape[1] == x.shape[1]
                and self_fused.get("merge", True)):
            # both decoder attention sublayers in ONE kernel: the
            # post-self-attn activations never touch HBM; when the FF
            # weights also fit VMEM the FF tail fuses in — a WHOLE
            # decoder layer per kernel
            from ..ops.pallas.layer_fused import (
                decoder_full_supported, fused_decoder_selfcross)
            mha_s = _MHAParams(self.dim, name="self_attn")()
            ln1 = _LayerNormParams(self.dim, name="norm1")()
            mha_c = _MHAParams(self.dim, name="cross_attn")()
            impl = resolve_ff_impl(self.ff_impl)
            full = (impl == "pallas"
                    and decoder_full_supported(x.shape[1], self.dim,
                                               self.ff_dim))
            ff_params = None
            if full or impl in ("pallas", "pallas-int8"):
                g2, be2 = _LayerNormParams(self.dim, name="norm2")()
                w1, b1, w2, b2 = _FFParams(self.dim, self.ff_dim,
                                           name="ff")()
                g3, be3 = _LayerNormParams(self.dim, name="norm3")()
                if full:
                    ff_params = (w1, b1, w2, b2, g2, be2, g3, be3)
            r = fused_decoder_selfcross(
                x, memory, (*mha_s, *mha_c, *ln1),
                (self_fused["mask"], self_fused.get("valid"),
                 cross_fused["mask"], cross_fused.get("valid")),
                ff_params,
                self_fused.get("kind", "repeat-inc"),
                self_fused.get("add_keypad", False),
                cross_fused.get("kind", "all"),
                cross_fused.get("add_keypad", False), self.num_heads,
                impl == "pallas-int8"
                and __import__("os").environ.get("KIT_ATTN_INT8") == "1")
            if full:
                return r
            if impl in ("pallas", "pallas-int8"):
                from ..ops.pallas.ffn import fused_ffn
                return fused_ffn(r, w1, b1, w2, b2, g2, be2, g3, be3,
                                 True, impl == "pallas-int8")
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm2")(r)
            return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                                name="norm3")(
                x + FeedForward(self.dim, self.ff_dim, self.dtype,
                                name="ff")(x))
        if _use_sublayer_kernel(self_fused, x.shape[1], self.dim):
            mha = _MHAParams(self.dim, name="self_attn")()
            ln1 = _LayerNormParams(self.dim, name="norm1")()
            x = _fused_sublayer(x, None, mha, ln1, self_fused,
                                self.num_heads)
        else:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                             name="norm1")(
                x + MultiHeadAttention(self.dim, self.num_heads, self.dtype,
                                       name="self_attn")(x, x, self_bias,
                                                         self_fused))
        if (_use_sublayer_kernel(cross_fused, x.shape[1], self.dim)
                and memory.shape[1] == x.shape[1]):
            mha = _MHAParams(self.dim, name="cross_attn")()
            r = _fused_sublayer(x, memory, mha, None, cross_fused,
                                self.num_heads)
        else:
            r = x + MultiHeadAttention(self.dim, self.num_heads, self.dtype,
                                       name="cross_attn")(x, memory,
                                                          cross_bias,
                                                          cross_fused)
        impl = resolve_ff_impl(self.ff_impl)
        if impl in ("pallas", "pallas-int8"):
            from ..ops.pallas.ffn import fused_ffn
            g1, be1 = _LayerNormParams(self.dim, name="norm2")()
            w1, b1, w2, b2 = _FFParams(self.dim, self.ff_dim, name="ff")()
            g2, be2 = _LayerNormParams(self.dim, name="norm3")()
            return fused_ffn(r, w1, b1, w2, b2, g1, be1, g2, be2, True,
                             impl == "pallas-int8")
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(r)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(
            x + FeedForward(self.dim, self.ff_dim, self.dtype,
                            name="ff")(x))
        return x


class _EncoderScanBody(nn.Module):
    dim: int
    num_heads: int
    ff_dim: int
    dtype: jnp.dtype
    remat: bool
    ff_impl: str = "xla"

    @nn.compact
    def __call__(self, x, bias, fused):
        layer = nn.remat(EncoderLayer) if self.remat else EncoderLayer
        x = layer(self.dim, self.num_heads, self.ff_dim, self.dtype,
                  self.ff_impl, name="layer")(x, bias, fused)
        return x, None


class _DecoderScanBody(nn.Module):
    dim: int
    num_heads: int
    ff_dim: int
    dtype: jnp.dtype
    remat: bool
    ff_impl: str = "xla"

    @nn.compact
    def __call__(self, y, memory, self_bias, cross_bias, self_fused,
                 cross_fused):
        layer = nn.remat(DecoderLayer) if self.remat else DecoderLayer
        y = layer(self.dim, self.num_heads, self.ff_dim, self.dtype,
                  self.ff_impl, name="layer")(y, memory, self_bias,
                                              cross_bias, self_fused,
                                              cross_fused)
        return y, None


class TransformerCore(nn.Module):
    """Encoder-decoder stack with final LayerNorms, as torch nn.Transformer
    builds when given layer counts (model.py:84-90).

    ``scan_layers`` runs the stack as a lax.scan over one layer's params
    (stacked on a leading axis) — identical numerics, ~num_layers x faster
    compile.  ``remat`` adds activation rematerialization per layer.
    """

    dim: int
    num_heads: int
    num_layers: int
    ff_dim: int = 2048
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False
    remat: bool = False
    ff_impl: str = "xla"

    @nn.compact
    def __call__(self, src, tgt, src_bias=None, tgt_bias=None,
                 cross_bias=None, src_fused=None, tgt_fused=None,
                 cross_fused=None):
        if self.scan_layers:
            enc = nn.scan(
                _EncoderScanBody,
                variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers)(
                    self.dim, self.num_heads, self.ff_dim, self.dtype,
                    self.remat, self.ff_impl, name="encoder_scan")
            x, _ = enc(src, src_bias, src_fused)
        else:
            x = src
            for i in range(self.num_layers):
                layer = nn.remat(EncoderLayer) if self.remat \
                    else EncoderLayer
                x = layer(self.dim, self.num_heads, self.ff_dim,
                          self.dtype, self.ff_impl,
                          name=f"encoder_{i}")(x, src_bias, src_fused)
        memory = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                              name="encoder_norm")(x)

        if self.scan_layers:
            dec = nn.scan(
                _DecoderScanBody,
                variable_axes={"params": 0}, split_rngs={"params": True},
                in_axes=(nn.broadcast,) * 5,
                length=self.num_layers)(
                    self.dim, self.num_heads, self.ff_dim, self.dtype,
                    self.remat, self.ff_impl, name="decoder_scan")
            y, _ = dec(tgt, memory, tgt_bias, cross_bias, tgt_fused,
                       cross_fused)
        else:
            y = tgt
            for i in range(self.num_layers):
                layer = nn.remat(DecoderLayer) if self.remat \
                    else DecoderLayer
                y = layer(self.dim, self.num_heads, self.ff_dim,
                          self.dtype, self.ff_impl,
                          name=f"decoder_{i}")(
                              y, memory, tgt_bias, cross_bias,
                              tgt_fused, cross_fused)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                            name="decoder_norm")(y)
