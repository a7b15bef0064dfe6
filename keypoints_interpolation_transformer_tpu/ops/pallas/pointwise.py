"""Pallas TPU fused pre/post pointwise chains of the KeypointCompleter.

The reference model (model.py:100-170) wraps its transformer in two
pointwise-heavy chains that the round-3 profile put at ~3.5-4 ms of the
~30 ms flagship step (B=256, T=128, D=256):

  pre  (per stream):  e = Dense(flat)            [stays in XLA]
                      n = token_norm(e) (+ n) + pe + learned
                      s = fc3(fc1(n) * sigmoid(fc2(n)))        (SwiGLU)
  post:               s = fc3(fc1(d) * sigmoid(fc2(d)))        (SwiGLU)
                      d = token_norm(s + filled_emb)
                      d = d * sigmoid(d)                       (swish)
                      out = d @ Wh + bh                        (head)

Each chain is one row-blocked, weight-stationary kernel: the SwiGLU
intermediates and every norm/gate pass stay in VMEM instead of
round-tripping (B, T, D) tensors through HBM between XLA ops.

MXU strategy per ops/pallas/attention._mxu_mode; bf16x3 weights are
pre-stacked [hi; lo; hi] outside the kernel so the three partial
products accumulate inside one MXU matmul (ops/pallas/ffn._dot3).
Backward follows the XLA reference implementation via jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _mxu_mode, _prep
from .attn_sublayer import _proj
from .ffn import _stack_weight_3x

LN_EPS = 1e-5


def _token_norm(x, eps=LN_EPS):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def _swiglu(n, w1, b1, w2, b2, w3, b3, mode):
    np_ = _prep(n, mode)
    x1 = _proj(np_, w1, b1, mode)
    x2 = _proj(np_, w2, b2, mode)
    g = x1 * jax.nn.sigmoid(x2)
    return _proj(_prep(g, mode), w3, b3, mode)


def _prep_weights(ws, mode):
    """Stack/cast stationary weights for the kernel mode; ws f32."""
    if mode == "bf16x3":
        return [_stack_weight_3x(w) for w in ws]
    if mode == "bf16":
        return [w.astype(jnp.bfloat16) for w in ws]
    return [w.astype(jnp.float32) for w in ws]


def _row_block(B, T, D):
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and bb * T * D * 4 * 6 <= (8 << 20):
            return bb
    return 1


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _pre_kernel(e_ref, pe_ref, w1, w2, w3, b1, b2, b3, o_ref, *,
                bb, mode, pe_residual):
    for b in range(bb):
        e = e_ref[b].astype(jnp.float32)          # (T, D)
        n = _token_norm(e)
        # pe_ref carries pe + learned, pre-summed outside (both additive)
        n = (n + n + pe_ref[...].astype(jnp.float32) if pe_residual
             else n + pe_ref[...].astype(jnp.float32))
        s = _swiglu(n, (w1[...],), b1[0], (w2[...],), b2[0],
                    (w3[...],), b3[0], mode)
        o_ref[b] = s.astype(o_ref.dtype)


def _post_kernel(d_ref, f_ref, w1, w2, w3, wh, b1, b2, b3, bh, o_ref, *,
                 bb, mode):
    for b in range(bb):
        d = d_ref[b].astype(jnp.float32)          # (T, D)
        f = f_ref[b].astype(jnp.float32)
        s = _swiglu(d, (w1[...],), b1[0], (w2[...],), b2[0],
                    (w3[...],), b3[0], mode)
        z = _token_norm(s + f)
        z = z * jax.nn.sigmoid(z)
        out = _proj(_prep(z, mode), (wh[...],), bh[0], mode)
        o_ref[b] = out.astype(o_ref.dtype)


def _pre_pallas(e, pe_learned, w1, b1, w2, b2, w3, b3, pe_residual):
    B, T, D = e.shape
    mode = _mxu_mode(e.dtype)
    bb = _row_block(B, T, D)
    row = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    ws = _prep_weights([w1, w2, w3], mode)
    vecs = [v.reshape(1, -1).astype(jnp.float32) for v in (b1, b2, b3)]
    return pl.pallas_call(
        functools.partial(_pre_kernel, bb=bb, mode=mode,
                          pe_residual=pe_residual),
        grid=(B // bb,),
        in_specs=[row, _const_spec((T, D)),
                  *[_const_spec(w.shape) for w in ws],
                  *[_const_spec(v.shape) for v in vecs]],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(e.shape, e.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(e, pe_learned.astype(jnp.float32), *ws, *vecs)


def _post_pallas(decoded, filled_emb, w1, b1, w2, b2, w3, b3, wh, bh):
    B, T, D = decoded.shape
    F = wh.shape[1]
    mode = _mxu_mode(decoded.dtype)
    bb = _row_block(B, T, D)
    row = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, T, F), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    ws = _prep_weights([w1, w2, w3, wh], mode)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b1, b2, b3, bh)]
    return pl.pallas_call(
        functools.partial(_post_kernel, bb=bb, mode=mode),
        grid=(B // bb,),
        in_specs=[row, row, *[_const_spec(w.shape) for w in ws],
                  *[_const_spec(v.shape) for v in vecs]],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, F), decoded.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(decoded, filled_emb, *ws, *vecs)


def pre_stream_reference(e, pe_learned, w1, b1, w2, b2, w3, b3,
                         pe_residual):
    """Pure-XLA same math (backward path + CPU fallback + test oracle)."""
    n = _token_norm(e.astype(jnp.float32))
    n = (n + n + pe_learned) if pe_residual else (n + pe_learned)
    x1 = jnp.dot(n, w1) + b1
    x2 = jnp.dot(n, w2) + b2
    return (jnp.dot(x1 * jax.nn.sigmoid(x2), w3) + b3).astype(e.dtype)


def post_head_reference(decoded, filled_emb, w1, b1, w2, b2, w3, b3,
                        wh, bh):
    d = decoded.astype(jnp.float32)
    x1 = jnp.dot(d, w1) + b1
    x2 = jnp.dot(d, w2) + b2
    s = jnp.dot(x1 * jax.nn.sigmoid(x2), w3) + b3
    z = _token_norm(s + filled_emb)
    z = z * jax.nn.sigmoid(z)
    return (jnp.dot(z, wh) + bh).astype(decoded.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_pre_stream(e, pe_learned, w1, b1, w2, b2, w3, b3,
                     pe_residual=False):
    """token_norm(e) [+norm] + (pe + learned) -> SwiGLU, one VMEM pass.

    ``pe_learned`` is the (T, D) sum of the sinusoidal table and the
    learned position vector (both additive constants per call)."""
    return _pre_pallas(e, pe_learned, w1, b1, w2, b2, w3, b3, pe_residual)


def _pre_vjp_fwd(e, pe_learned, w1, b1, w2, b2, w3, b3, pe_residual):
    out = fused_pre_stream(e, pe_learned, w1, b1, w2, b2, w3, b3,
                           pe_residual)
    return out, (e, pe_learned, w1, b1, w2, b2, w3, b3)


def _pre_vjp_bwd(pe_residual, res, g):
    _, vjp = jax.vjp(
        lambda *a: pre_stream_reference(*a, pe_residual=pe_residual), *res)
    return vjp(g)


fused_pre_stream.defvjp(_pre_vjp_fwd, _pre_vjp_bwd)


@jax.custom_vjp
def fused_post_head(decoded, filled_emb, w1, b1, w2, b2, w3, b3, wh, bh):
    """SwiGLU -> token_norm(+filled residual) -> swish -> head Dense,
    one VMEM pass (reference model.py:150-156)."""
    return _post_pallas(decoded, filled_emb, w1, b1, w2, b2, w3, b3,
                        wh, bh)


def _post_vjp_fwd(decoded, filled_emb, w1, b1, w2, b2, w3, b3, wh, bh):
    out = fused_post_head(decoded, filled_emb, w1, b1, w2, b2, w3, b3,
                          wh, bh)
    return out, (decoded, filled_emb, w1, b1, w2, b2, w3, b3, wh, bh)


def _post_vjp_bwd(res, g):
    _, vjp = jax.vjp(post_head_reference, *res)
    return vjp(g)


fused_post_head.defvjp(_post_vjp_fwd, _post_vjp_bwd)


# ---------------------------------------------------------------------------
# Round 4: the 108-wide embedding Dense folded INTO the pre-stream kernel.
# The reference embeds flattened frames with Linear(108 -> D)
# (model.py:65-66); standalone that matmul wastes 20 of 128 MXU lanes and
# round-trips the (B, T, D) embedding through HBM before the pointwise
# chain.  Here the frame features are zero-padded to the 128-lane boundary
# OUTSIDE the kernel (free: XLA fuses the pad into the producer) and the
# whole  embed -> token_norm -> +PE -> SwiGLU  chain runs in one pass.
# The filled stream's embedding is ALSO a residual input of the post-head
# kernel (model.py:150), so the kernel can emit it as a second output.
# ---------------------------------------------------------------------------


def _pre_embed_kernel(x_ref, pe_ref, wemb, w1, w2, w3, bemb, b1, b2, b3,
                      *out_refs, bb, mode, pe_residual, want_emb):
    o_ref = out_refs[0]
    e_ref = out_refs[1] if want_emb else None
    for b in range(bb):
        xf = x_ref[b].astype(jnp.float32)            # (T, Fp)
        e = _proj(_prep(xf, mode), (wemb[...],), bemb[0], mode)
        if want_emb:
            e_ref[b] = e.astype(e_ref.dtype)
        n = _token_norm(e)
        n = (n + n + pe_ref[...].astype(jnp.float32) if pe_residual
             else n + pe_ref[...].astype(jnp.float32))
        s = _swiglu(n, (w1[...],), b1[0], (w2[...],), b2[0],
                    (w3[...],), b3[0], mode)
        o_ref[b] = s.astype(o_ref.dtype)


def _pre_embed_pallas(x, wemb, bemb, pe_learned, w1, b1, w2, b2, w3, b3,
                      pe_residual, want_emb):
    B, T, F = x.shape
    D = wemb.shape[1]
    Fp = ((F + 127) // 128) * 128
    if Fp != F:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Fp - F)))
        wemb = jnp.pad(wemb, ((0, Fp - F), (0, 0)))
    mode = _mxu_mode(x.dtype)
    bb = _row_block(B, T, max(D, Fp))
    row_in = pl.BlockSpec((bb, T, Fp), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    row_out = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    ws = _prep_weights([wemb, w1, w2, w3], mode)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (bemb, b1, b2, b3)]
    out_shape = [jax.ShapeDtypeStruct((B, T, D), x.dtype)]
    out_specs = [row_out]
    if want_emb:
        out_shape.append(jax.ShapeDtypeStruct((B, T, D), x.dtype))
        out_specs.append(row_out)
    outs = pl.pallas_call(
        functools.partial(_pre_embed_kernel, bb=bb, mode=mode,
                          pe_residual=pe_residual, want_emb=want_emb),
        grid=(B // bb,),
        in_specs=[row_in, _const_spec((T, D)),
                  *[_const_spec(w.shape) for w in ws],
                  *[_const_spec(v.shape) for v in vecs]],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, pe_learned.astype(jnp.float32), *ws, *vecs)
    return outs if want_emb else outs[0]


def pre_stream_embed_reference(x, wemb, bemb, pe_learned, w1, b1, w2, b2,
                               w3, b3, pe_residual, want_emb):
    """Pure-XLA same math (backward path + CPU fallback + test oracle)."""
    e = jnp.dot(x.astype(jnp.float32), wemb) + bemb
    s = pre_stream_reference(e, pe_learned, w1, b1, w2, b2, w3, b3,
                             pe_residual)
    if want_emb:
        return s, e.astype(x.dtype)
    return s


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_pre_stream_embed(x, wemb, bemb, pe_learned, w1, b1, w2, b2,
                           w3, b3, pe_residual=False, want_emb=False):
    """Linear(F->D) embed + token_norm [+norm] + (pe+learned) + SwiGLU in
    ONE lane-padded VMEM pass; ``want_emb`` also returns the embedding
    (the filled stream's post-head residual, model.py:150)."""
    return _pre_embed_pallas(x, wemb, bemb, pe_learned, w1, b1, w2, b2,
                             w3, b3, pe_residual, want_emb)


def _pre_embed_vjp_fwd(x, wemb, bemb, pe_learned, w1, b1, w2, b2, w3, b3,
                       pe_residual, want_emb):
    out = fused_pre_stream_embed(x, wemb, bemb, pe_learned, w1, b1, w2,
                                 b2, w3, b3, pe_residual, want_emb)
    return out, (x, wemb, bemb, pe_learned, w1, b1, w2, b2, w3, b3)


def _pre_embed_vjp_bwd(pe_residual, want_emb, res, g):
    _, vjp = jax.vjp(
        lambda *a: pre_stream_embed_reference(
            *a, pe_residual=pe_residual, want_emb=want_emb), *res)
    return vjp(g)


fused_pre_stream_embed.defvjp(_pre_embed_vjp_fwd, _pre_embed_vjp_bwd)
