"""Pallas TPU fused attention SUBLAYER: qkv projections + attention +
out-projection + residual (+ optional LayerNorm) in one VMEM pass.

The round-3 profile (benchmarks/profile_step.py) put the attention stack
at ~40% of the flagship inference step even with the fused attention
kernel: the q/k/v/o (B, T, D) tensors each round-trip HBM between the
XLA projection matmuls and the kernel (~270 MB of traffic per layer at
the flagship shape, vs 67 MB strictly needed).  This kernel computes the
whole post-LN attention sublayer of a torch-default transformer layer
(reference model.py:84-90)

    q = x @ Wq + bq;  k = m @ Wk + bk;  v = m @ Wv + bv   (m = x or memory)
    a = softmax(q k^T / sqrt(dh) + bias) v                 (per head)
    r = x + a @ Wo + bo
    y = LN(r) if post_ln else r

entirely in VMEM: HBM traffic per grid cell is x (+ memory) in, y out.

Design (v5e):
  * Grid over batch blocks; the full T range is resident per cell (the
    kernel is used for T <= _MAX_T; longer sequences take the unfused
    fused_attention path, whose query grid streams VMEM).
  * Weights ride with constant index maps -> loaded once, VMEM-resident
    across cells (weight-stationary), exactly like ops/pallas/ffn.py.
  * The attention core reuses the transposed-score / wide-softmax layout
    of ops/pallas/attention.py (keys on sublanes; all heads of a row
    block share one bias and one dense softmax phase).
  * MXU strategy per ops/pallas/attention._mxu_mode: bf16 single pass
    under DEFAULT, in-kernel hi/lo split bf16x3 under HIGH (Mosaic
    cannot lower Precision.HIGH), f32 HIGHEST under HIGHEST.  bf16x3
    weights are pre-split hi/lo OUTSIDE the kernel via
    lax.reduce_precision (an astype round-trip gets folded by XLA's
    excess-precision simplifier on runtime inputs — see
    ops/pallas/ffn._split_hi_lo).
  * Backward is the XLA recompute of identical math via jax.custom_vjp
    (gradient numerics follow the XLA path), as for the FFN kernel.

The reference applies these sublayers inside torch's TransformerEncoder/
DecoderLayer (model.py:84-90, batch_first=False); this kernel is the
TPU-native fusion of that sublayer, not a translation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import (LOG2E as _LOG2E, _bias_terms_T, _dot, _head_group,
                        _mxu_mode, _prep, _prob_dot, _prob_parts,
                        _slice_parts, _xla_attention)

LN_EPS = 1e-5

# Full-T residency: beyond this the (T, hg*T) score scratch + 6 (T, D)
# tensors outgrow scoped VMEM; callers fall back to the streaming
# fused_attention kernel.
_MAX_T = 512


def _ln(x, gamma, beta, eps=LN_EPS):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * gamma + beta


def _proj(x_parts, w_parts, b, mode):
    """Projection against a VMEM-stationary weight.  Under bf16x3 the
    weight arrives pre-stacked [w_hi; w_lo; w_hi] (3D, D) and the three
    partial products run as ONE matmul with the activation parts
    concatenated along the contraction axis — the partials accumulate in
    the MXU instead of as VPU adds (ops/pallas/ffn._dot3)."""
    if mode == "bf16x3":
        ah, al = x_parts
        a_cat = jnp.concatenate([ah, ah, al], axis=1)
        return jax.lax.dot_general(
            a_cat, w_parts[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) + b
    return _dot(x_parts, w_parts, ((1,), (0,)), mode) + b


def _attn_core(q, k, v, bias, heads, dh, mode):
    """(T, D) f32 q/k/v -> (T, D) f32 attention output, transposed-score
    wide-softmax layout (see ops/pallas/attention._attn_kernel).

    The caller has already folded 1/sqrt(dh) * log2(e) into the
    q-projection weights (free, outside the kernel) and log2(e) into the
    bias's finite terms, so the scores are log2-domain and the softmax
    runs as exp2 — the VPU-native exponential — with no per-head
    scaling pass."""
    T = q.shape[0]
    hg = _head_group(heads, T, T, mode)
    qp, kp, vp = _prep(q, mode), _prep(k, mode), _prep(v, mode)
    outs = []
    for g in range(0, heads, hg):
        sts = []
        for h in range(g, g + hg):
            qh = _slice_parts(qp, h * dh, (h + 1) * dh)
            kh = _slice_parts(kp, h * dh, (h + 1) * dh)
            sts.append(_dot(kh, qh, ((1,), (1,)), mode) + bias)
        wide = sts[0] if hg == 1 else jnp.concatenate(sts, axis=1)
        wide = wide - jnp.max(wide, axis=0, keepdims=True)
        e = jnp.exp2(wide)
        w = _prob_parts(e * (1.0 / jnp.sum(e, axis=0, keepdims=True)),
                        mode)
        for i, h in enumerate(range(g, g + hg)):
            wh = _slice_parts(w, i * T, (i + 1) * T)
            vh = _slice_parts(vp, h * dh, (h + 1) * dh)
            outs.append(_prob_dot(wh, vh, ((0,), (0,)), mode))
    return jnp.concatenate(outs, axis=1)


def _sublayer_kernel(x_ref, mem_ref, mask_ref, valid_ref, *rest, kind,
                     add_keypad, heads, dh, bb, mode, post_ln, n_w):
    # rest = weight part refs (n_w of them), bq, bk, bv, bo, [g, be], o_ref
    # mem_ref IS x_ref for self-attention (single DMA).
    w_refs = rest[:n_w]
    b_refs = rest[n_w:n_w + 4]
    ln_refs = rest[n_w + 4:-1]
    o_ref = rest[-1]
    per = n_w // 4  # parts per weight: 2 (bf16x3) or 1
    wq, wk, wv, wo = (tuple(r[...] for r in w_refs[i * per:(i + 1) * per])
                      for i in range(4))
    bq_, bk_, bv_, bo_ = (r[0].astype(jnp.float32) for r in b_refs)
    T = x_ref.shape[1]
    # per-batch-row processing: whole-block q/k/v materialization was
    # measured speed-neutral (the kernel is VPU-softmax bound, not
    # MXU-dispatch bound) and overflowed scoped VMEM at f32/bb=8
    for b in range(bb):
        x = x_ref[b].astype(jnp.float32)                  # (T, D)
        xp = _prep(x, mode)
        if mem_ref is x_ref:
            mp = xp
        else:
            mp = _prep(mem_ref[b].astype(jnp.float32), mode)
        q = _proj(xp, wq, bq_, mode)
        k = _proj(mp, wk, bk_, mode)
        v = _proj(mp, wv, bv_, mode)
        bias = _bias_terms_T(mask_ref[b, 0], valid_ref[b, 0], T, kind,
                             add_keypad, 0, T, mul=_LOG2E)
        a = _attn_core(q, k, v, bias, heads, dh, mode)
        r = x + _proj(_prep(a, mode), wo, bo_, mode)
        if post_ln:
            r = _ln(r, ln_refs[0][0].astype(jnp.float32),
                    ln_refs[1][0].astype(jnp.float32))
        o_ref[b] = r.astype(o_ref.dtype)


def _batch_block_sublayer(B, T, D, mode):
    """Rows per grid cell: ~6 (T, D) f32 live tensors + score scratch per
    batch row, double-buffered x/mem/out blocks; budget ~10 MB scoped."""
    per_row = T * D * 4 * 8  # x, mem, q, k, v, a + slack, f32
    score = T * T * 4 * (3 if mode != "bf16" else 2)
    budget = 10 << 20
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and bb * (per_row + score) <= budget:
            return bb
    return 1


def fused_attn_sublayer_supported(T: int, D: int = 0) -> bool:
    """T must fit full-VMEM residency; D is capped so the four stationary
    projection weights (up to 6*D*D bytes each in bf16x3 stacked form,
    double-buffered by the pipeline) stay inside the 16 MB scoped-VMEM
    limit — measured: D=1024 bf16 overflows by 1.17 MB."""
    return T <= _MAX_T and T % 8 == 0 and D <= 512


def _fwd_pallas(x, memory, params, mask, valid, kind, add_keypad, post_ln,
                heads):
    wq, bq_, wk, bk_, wv, bv_, wo, bo_, ln_scale, ln_bias = params
    B, T, D = x.shape
    dh = D // heads
    # fold 1/sqrt(dh) * log2(e) into the q projection — free (the scaled
    # weights are computed once outside the kernel), and the softmax then
    # runs as exp2 on log2-domain scores (see _attn_core)
    qscale = _LOG2E / math.sqrt(dh)
    wq = wq * qscale
    bq_ = bq_ * qscale
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)
    mode = _mxu_mode(x.dtype)
    bb = _batch_block_sublayer(B, T, D, mode)
    self_attn = memory is None

    row_spec = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bb, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if mode == "bf16x3":
        from .ffn import _stack_weight_3x
        w_ops = [_stack_weight_3x(w) for w in (wq, wk, wv, wo)]
    elif mode == "bf16":
        w_ops = [w.astype(jnp.bfloat16) for w in (wq, wk, wv, wo)]
    else:
        w_ops = [w.astype(jnp.float32) for w in (wq, wk, wv, wo)]
    n_w = len(w_ops)
    b_ops = [b.reshape(1, D).astype(jnp.float32)
             for b in (bq_, bk_, bv_, bo_)]
    ln_ops = ([ln_scale.reshape(1, D).astype(jnp.float32),
               ln_bias.reshape(1, D).astype(jnp.float32)]
              if post_ln else [])

    mem_ops = [] if self_attn else [memory]
    operands = [x, *mem_ops, mask[:, None, :], valid[:, None, :],
                *w_ops, *b_ops, *ln_ops]
    specs = [row_spec, *([row_spec] if not self_attn else []),
             vec_spec, vec_spec,
             *[const_spec(w.shape) for w in w_ops],
             *[const_spec(b.shape) for b in b_ops],
             *[const_spec(p.shape) for p in ln_ops]]

    def kernel(x_ref, *refs):
        if self_attn:
            mem_ref, rest = x_ref, refs
        else:
            mem_ref, rest = refs[0], refs[1:]
        _sublayer_kernel(x_ref, mem_ref, rest[0], rest[1], *rest[2:],
                         kind=kind, add_keypad=add_keypad, heads=heads,
                         dh=dh, bb=bb, mode=mode, post_ln=post_ln, n_w=n_w)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(*operands)


def attn_sublayer_reference(x, memory, params, mask, valid, kind,
                            add_keypad, post_ln, heads):
    """Pure-XLA same math (backward path + CPU fallback + test oracle)."""
    wq, bq_, wk, bk_, wv, bv_, wo, bo_, ln_scale, ln_bias = params
    B, T, D = x.shape
    dh = D // heads
    mem = x if memory is None else memory
    q = (jnp.dot(x, wq) + bq_).reshape(B, T, heads, dh)
    k = (jnp.dot(mem, wk) + bk_).reshape(B, T, heads, dh)
    v = (jnp.dot(mem, wv) + bv_).reshape(B, T, heads, dh)
    a, _ = _xla_attention(q, k, v, mask, valid, kind, add_keypad)
    r = x + jnp.dot(a.reshape(B, T, D), wo) + bo_
    if post_ln:
        r = _ln(r, ln_scale, ln_bias)
    return r


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_attn_sublayer(x, memory, params, masks, kind="repeat-inc",
                        add_keypad=False, post_ln=False, heads=8):
    """y = [LN](x + MHA(x, mem) @ Wo + bo) as ONE Pallas kernel.

    ``params`` = (wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias)
    (ln_* may be size-0 placeholders when post_ln=False);
    ``masks`` = (frame_mask (B, T), valid (B, T) | None);
    ``memory`` None selects self-attention.  Forward runs the Pallas
    kernel; gradients follow the XLA reference implementation."""
    mask, valid = masks
    return _fwd_pallas(x, memory, params, mask, valid, kind, add_keypad,
                       post_ln, heads)


def _vjp_fwd(x, memory, params, masks, kind, add_keypad, post_ln, heads):
    out = fused_attn_sublayer(x, memory, params, masks, kind, add_keypad,
                              post_ln, heads)
    return out, (x, memory, params, masks)


def _vjp_bwd(kind, add_keypad, post_ln, heads, res, g):
    x, memory, params, masks = res
    mask, valid = masks

    if memory is None:
        def ref(x_, params_):
            return attn_sublayer_reference(x_, None, params_, mask, valid,
                                           kind, add_keypad, post_ln, heads)
        _, vjp = jax.vjp(ref, x, params)
        dx, dparams = vjp(g)
        dmem = None
    else:
        def ref(x_, memory_, params_):
            return attn_sublayer_reference(x_, memory_, params_, mask,
                                           valid, kind, add_keypad,
                                           post_ln, heads)
        _, vjp = jax.vjp(ref, x, memory, params)
        dx, dmem, dparams = vjp(g)
    return dx, dmem, dparams, (None, None)


fused_attn_sublayer.defvjp(_vjp_fwd, _vjp_bwd)
