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
  * Backward (bf16/bf16x3 on TPU) is a NATIVE Pallas kernel fed by
    residuals the training forward saves (q/k/v, the attention output a,
    the softmax probabilities, and the pre-LN residual): no score,
    softmax, or projection recompute — only the gradient matmuls, with
    dW/db/dLN accumulated in VMEM across batch cells (the ffn.py
    pattern).  f32-highest keeps the XLA-recompute VJP for exact XLA
    gradient numerics.

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

from .attention import (LOG2E as _LOG2E, _PROB_SPLIT, _bias_terms_T, _dot,
                        _head_group, _mxu_mode, _prep, _prob_dot,
                        _prob_parts, _score_dot, _slice_parts,
                        _softmax_wide, _xla_attention)

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


def _attn_core(q, k, v, bias, heads, dh, mode, want_probs=False):
    """(T, D) f32 q/k/v -> (T, D) f32 attention output, transposed-score
    wide-softmax layout (see ops/pallas/attention._attn_kernel).

    The caller has already folded 1/sqrt(dh) * log2(e) into the
    q-projection weights (free, outside the kernel) and log2(e) into the
    bias's finite terms, so the scores are log2-domain and the softmax
    runs as exp2 — the VPU-native exponential — with no per-head
    scaling pass.

    ``want_probs`` (training forward) also returns the (T_k, H*T_q) f32
    softmax probabilities (head h at columns h*T..(h+1)*T, key-major) —
    the residual that lets the native backward skip the score+softmax
    recompute entirely."""
    T = q.shape[0]
    hg = _head_group(heads, T, T, mode)
    qp, kp, vp = _prep(q, mode), _prep(k, mode), _prep(v, mode)
    outs = []
    probs = []
    for g in range(0, heads, hg):
        sts = []
        for h in range(g, g + hg):
            qh = _slice_parts(qp, h * dh, (h + 1) * dh)
            kh = _slice_parts(kp, h * dh, (h + 1) * dh)
            st = _score_dot(kh, qh, mode)
            sts.append(st if bias is None else st + bias)
        wide = sts[0] if hg == 1 else jnp.concatenate(sts, axis=1)
        wf = _softmax_wide(wide)
        if want_probs:
            probs.append(wf)
        w = _prob_parts(wf, mode)
        for i, h in enumerate(range(g, g + hg)):
            wh = _slice_parts(w, i * T, (i + 1) * T)
            vh = _slice_parts(vp, h * dh, (h + 1) * dh)
            outs.append(_prob_dot(wh, vh, ((0,), (0,)), mode))
    out = jnp.concatenate(outs, axis=1)
    if want_probs:
        return out, (probs[0] if len(probs) == 1
                     else jnp.concatenate(probs, axis=1))
    return out


def _sublayer_kernel(x_ref, mem_ref, mask_ref, valid_ref, *rest, kind,
                     add_keypad, heads, dh, bb, mode, post_ln, n_w,
                     has_valid):
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
        bias = _bias_terms_T(mask_ref[b, 0],
                             valid_ref[b, 0] if has_valid else None, T,
                             kind, add_keypad, 0, T, mul=_LOG2E)
        a = _attn_core(q, k, v, bias, heads, dh, mode)
        r = x + _proj(_prep(a, mode), wo, bo_, mode)
        if post_ln:
            r = _ln(r, ln_refs[0][0].astype(jnp.float32),
                    ln_refs[1][0].astype(jnp.float32))
        o_ref[b] = r.astype(o_ref.dtype)


def _sublayer_train_kernel(x_ref, mem_ref, mask_ref, valid_ref, *rest,
                           kind, add_keypad, heads, dh, bb, mode,
                           post_ln, n_w, qs, has_valid, save_probs=True):
    """Training forward: same math as _sublayer_kernel but with UNFOLDED
    q weights (the scale*log2e fold happens in-kernel so the saved q
    residual is the plain projection output) and residual outputs
    (q, k, v, a, probs[, r]) for the native backward.

    ``save_probs=False`` (256 < T <= _MAX_T, where the (T, H*T) probs
    block outgrows scoped VMEM) omits the probs residual, the
    attention-output residual ``a`` AND the query residual ``q``; the
    backward then recomputes q from x (one projection) and each head's
    softmax + `a` tile from q/k/v (see _sublayer_bwd_kernel's recompute
    mode).  Each dropped residual saves a (B, T, D) f32 HBM write here
    and a double-buffered pipeline row (2 MB at T=512) in the backward
    — measured on chip, the `a` row alone put the post-LN self-attention
    backward 516 KB over the 16 MB scoped-VMEM limit, and the q row put
    the cross-attention backward 2.17 MB over."""
    w_refs = rest[:n_w]
    b_refs = rest[n_w:n_w + 4]
    n_out = (6 if save_probs else 3) + (1 if post_ln else 0)
    ln_refs = rest[n_w + 4:-n_out]
    outs = rest[-n_out:]
    if save_probs:
        o_ref, q_ref, k_ref, v_ref, a_ref, w_ref = outs[:6]
        r_ref = outs[6] if post_ln else None
    else:
        o_ref, k_ref, v_ref = outs[:3]
        q_ref = None
        a_ref = None
        w_ref = None
        r_ref = outs[3] if post_ln else None
    per = n_w // 4
    wq, wk, wv, wo = (tuple(r[...] for r in w_refs[i * per:(i + 1) * per])
                      for i in range(4))
    bq_, bk_, bv_, bo_ = (r[0].astype(jnp.float32) for r in b_refs)
    T = x_ref.shape[1]
    for b in range(bb):
        x = x_ref[b].astype(jnp.float32)
        xp = _prep(x, mode)
        if mem_ref is x_ref:
            mp = xp
        else:
            mp = _prep(mem_ref[b].astype(jnp.float32), mode)
        q = _proj(xp, wq, bq_, mode)          # UNSCALED (saved residual)
        k = _proj(mp, wk, bk_, mode)
        v = _proj(mp, wv, bv_, mode)
        bias = _bias_terms_T(mask_ref[b, 0],
                             valid_ref[b, 0] if has_valid else None, T,
                             kind, add_keypad, 0, T, mul=_LOG2E)
        if save_probs:
            a, w = _attn_core(q * qs, k, v, bias, heads, dh, mode,
                              want_probs=True)
        else:
            a = _attn_core(q * qs, k, v, bias, heads, dh, mode)
        r = x + _proj(_prep(a, mode), wo, bo_, mode)
        k_ref[b] = k
        v_ref[b] = v
        if save_probs:
            q_ref[b] = q
            a_ref[b] = a
        # probs residual in bf16 under the fast modes: halves the largest
        # residual's HBM traffic, and matches the forward's bf16
        # probability-feed error model (the AV matmul already consumes
        # bf16 probs); f32 under mode "f32" (gradient-parity tests)
        if save_probs:
            w_ref[b] = w.astype(w_ref.dtype)
        if post_ln:
            r_ref[b] = r
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
                heads, want_residuals=False, save_probs=True):
    wq, bq_, wk, bk_, wv, bv_, wo, bo_, ln_scale, ln_bias = params
    B, T, D = x.shape
    dh = D // heads
    qscale = _LOG2E / math.sqrt(dh)
    if not want_residuals:
        # fold 1/sqrt(dh) * log2(e) into the q projection — free (the
        # scaled weights are computed once outside the kernel), and the
        # softmax then runs as exp2 on log2-domain scores (_attn_core).
        # The training variant folds IN-KERNEL instead so the saved q
        # residual is the plain projection output.
        wq = wq * qscale
        bq_ = bq_ * qscale
    has_valid = valid is not None
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)
    mode = _mxu_mode(x.dtype)
    bb = _batch_block_sublayer(B, T, D, mode)
    if want_residuals:
        # the residual outputs (5-6 extra (bb, T, D)/(bb, T, H*T) blocks)
        # roughly triple the per-cell VMEM footprint
        bb = min(bb, 2)
        if save_probs and T * heads * T * 4 * bb > (1 << 21):
            bb = 1  # probs block budget
        if not save_probs:
            bb = 1  # long T: 6-7 f32 (T, D) residual blocks per cell
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

    if want_residuals:
        def kernel(x_ref, *refs):
            if self_attn:
                mem_ref, rest = x_ref, refs
            else:
                mem_ref, rest = refs[0], refs[1:]
            _sublayer_train_kernel(
                x_ref, mem_ref, rest[0], rest[1], *rest[2:],
                kind=kind, add_keypad=add_keypad, heads=heads, dh=dh,
                bb=bb, mode=mode, post_ln=post_ln, n_w=n_w, qs=qscale,
                has_valid=has_valid, save_probs=save_probs)

        f32row = jax.ShapeDtypeStruct((B, T, D), jnp.float32)
        if save_probs:        # outputs o, q, k, v, a, w (+r)
            out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype),
                         f32row, f32row, f32row, f32row]
            out_specs = [row_spec] * 5
        else:                 # outputs o, k, v (+r); q/a/w rebuilt in bwd
            out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype),
                         f32row, f32row]
            out_specs = [row_spec] * 3
        if save_probs:
            prob_spec = pl.BlockSpec((bb, T, heads * T),
                                     lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
            prob_dt = jnp.float32 if mode == "f32" else jnp.bfloat16
            out_shape.append(
                jax.ShapeDtypeStruct((B, T, heads * T), prob_dt))
            out_specs.append(prob_spec)
        if post_ln:
            out_shape.append(f32row)
            out_specs.append(row_spec)
        outs = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(*operands)
        if save_probs:
            y, q, k, v, a, w = outs[:6]
            r = outs[6] if post_ln else None
        else:
            y, k, v = outs[:3]
            q = None
            a = None
            w = None
            r = outs[3] if post_ln else None
        return y, (q, k, v, a, w, r)

    def kernel(x_ref, *refs):
        if self_attn:
            mem_ref, rest = x_ref, refs
        else:
            mem_ref, rest = refs[0], refs[1:]
        _sublayer_kernel(x_ref, mem_ref, rest[0], rest[1], *rest[2:],
                         kind=kind, add_keypad=add_keypad, heads=heads,
                         dh=dh, bb=bb, mode=mode, post_ln=post_ln, n_w=n_w,
                         has_valid=has_valid)

    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(*operands)


# ---------------------------------------------------------------------------
# Native Pallas backward: residual-fed (q/k/v/a/probs saved by the training
# forward), so there is NO score/softmax/projection recompute — only the
# gradient matmuls, with the LN backward fused and dW/db accumulated in
# VMEM across the sequentially-visited batch cells (the ffn.py pattern).
# ---------------------------------------------------------------------------


def _sublayer_bwd_kernel(*refs, self_attn, post_ln, heads, dh, bb, mode,
                         n_w, scale, recompute=False, kind="all",
                         add_keypad=False, has_valid=True):
    """Residual-fed backward.  ``recompute=False`` consumes the saved
    softmax probabilities; ``recompute=True`` (256 < T <= _MAX_T, where
    the (T, H*T) probs residual outgrows scoped VMEM) rebuilds each
    head's probabilities from the saved q/k — the exact forward compute
    (same scaled-q bf16 split, exp2 softmax, bias build), per (T, T)
    head tile so only one tile is ever live."""
    from .ffn import _ln_bwd
    if recompute:
        # q is re-projected from x in-kernel; `a` is rebuilt per head
        # tile — each saved residual row would cost 2 MB of
        # double-buffered pipeline this kernel cannot afford at T=512
        x_ref, dy_ref, k_ref, v_ref = refs[:4]
        q_ref = None
        a_ref = None
        mask_ref, valid_ref = refs[4], refs[5]
        w_ref = None
        idx = 6
    else:
        x_ref, dy_ref, q_ref, k_ref, v_ref = refs[:5]
        a_ref, w_ref = refs[5], refs[6]
        idx = 7
    mem_ref = None
    if not self_attn:
        mem_ref = refs[idx]
        idx += 1
    r_ref = None
    if post_ln:
        r_ref = refs[idx]
        idx += 1
    w_refs = refs[idx:idx + n_w]
    idx += n_w
    bq_ref = None
    if recompute:
        bq_ref = refs[idx]               # q-projection bias (re-proj)
        idx += 1
    if post_ln:
        g_r = refs[idx]
        idx += 1
    if recompute:
        # VMEM scratch accumulators (dq/dk/dv/a/q/da)
        dq_s, dk_s, dv_s, a_s, q_s, da_s = refs[-6:]
        outs = refs[idx:-6]
    else:
        outs = refs[idx:]
    oi = 0
    dx_ref = outs[oi]
    oi += 1
    if not self_attn:
        dmem_ref = outs[oi]
        oi += 1
    (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
     dwo_ref, dbo_ref) = outs[oi:oi + 8]
    oi += 8
    if post_ln:
        dg_ref, dbe_ref = outs[oi:oi + 2]

    per = n_w // 4
    wq, wk, wv, wo = (tuple(r[...] for r in w_refs[i * per:(i + 1) * per])
                      for i in range(4))

    accs = [dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
            dwo_ref, dbo_ref] + ([dg_ref, dbe_ref] if post_ln else [])

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in accs:
            ref[...] = jnp.zeros_like(ref)

    T = x_ref.shape[1]
    for b in range(bb):
        x = x_ref[b].astype(jnp.float32)
        dy = dy_ref[b].astype(jnp.float32)
        if post_ln:
            dr, n2 = _ln_bwd(dy, r_ref[b], g_r[0])
            dg_ref[...] += jnp.sum(dy * n2, axis=0, keepdims=True)
            dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        else:
            dr = dy
        drp = _prep(dr, mode)
        dbo_ref[...] += jnp.sum(dr, axis=0, keepdims=True)
        if not recompute:
            # dWo from the saved attention-output residual; the
            # recompute branch rebuilds `a` per head tile below and
            # accumulates dWo after the head loop instead
            dwo_ref[...] += _dot(_prep(a_ref[b], mode), drp,
                                 ((0,), (0,)), mode)
        da = _dot(drp, wo, ((1,), (1,)), mode)            # dr @ Wo^T
        if not recompute:
            # full-width part splits; the recompute branch instead reads
            # per-head slices straight off the residual refs (the four
            # (T, D) splits cost ~2 MB of stack it cannot afford)
            qp = _prep(q_ref[b], mode)
            kp = _prep(k_ref[b], mode)
            vp = _prep(v_ref[b], mode)
            dap = _prep(da, mode)
        if recompute:
            # Query-blocked softmax rebuild.  Every reduction here (the
            # softmax max/sum and the dL correction term) runs over the
            # KEY axis (axis 0), so tiling the query axis is exact math.
            # The full-width (Tk, Tq) rebuild measured 17.19 MB scoped
            # VMEM at T=512 cross-attention — over the 16 MB limit.
            # Two levers keep the blocked version inside budget: only
            # (Tk, qb) tiles are ever live, and the per-(head, block)
            # results are stored straight into the dq/dk/dv VMEM scratch
            # refs so their live ranges END there (a pure-SSA version of
            # this loop measured 21.4 MB — Mosaic's stack allocator does
            # not reuse slots across long unrolled value chains).
            qb = T if T <= _BWD_RECOMPUTE_QB else _BWD_RECOMPUTE_QB
            # re-project q from x — same math (and same 3-partial dot)
            # as the forward's projection; the saved-q residual row cost
            # 2 MB of double-buffered pipeline (measured: it put the
            # T=512 cross-attention backward 2.17 MB over budget)
            q_s[...] = (_dot(_prep(x, mode), wq, ((1,), (0,)), mode)
                        + bq_ref[0].astype(jnp.float32))
            # da staged through scratch: the fori body below can only
            # take dynamic (pl.ds) slices of REFS, not of SSA values
            da_s[...] = da
            da = None
            # the j-loop is a lax.fori_loop (one traced body) when qb
            # divides T: Mosaic's stack allocator does NOT reuse slots
            # across unrolled iterations, and the unrolled form measured
            # ~6 MB of loop stack at T=512 (17.59 MB total, compile-time
            # OOM) where the rolled form fits
            n_blk = T // qb
            fori = (T % qb == 0) and n_blk > 1
            for h in range(heads):
                lo, hi = h * dh, (h + 1) * dh
                kh = _prep(k_ref[b, :, lo:hi], mode)
                vh = _prep(v_ref[b, :, lo:hi], mode)

                def block(j0, jw, dk_h, dv_h, kh=kh, vh=vh, lo=lo, hi=hi):
                    bias = _bias_terms_T(
                        mask_ref[b, 0],
                        valid_ref[b, 0] if has_valid else None,
                        T, kind, add_keypad, j0, jw, mul=_LOG2E)
                    # the forward scaled q BEFORE the bf16 split
                    # (_attn_core got q * qscale); reproduce exactly so
                    # the rebuilt probs match the ones the forward's AV
                    # matmul consumed
                    qsj = _prep(q_s[pl.ds(j0, jw), lo:hi]
                                * (scale * _LOG2E), mode)
                    st = _dot(kh, qsj, ((1,), (1,)), mode)  # (Tk, jw)
                    if bias is not None:
                        st = st + bias
                    st = st - jnp.max(st, axis=0, keepdims=True)
                    ex = jnp.exp2(st)
                    wt = ex * (1.0 / jnp.sum(ex, axis=0, keepdims=True))
                    if mode != "f32" and not _PROB_SPLIT:
                        # the forward's AV matmul consumed bf16 probs;
                        # reuse the SAME bf16 tile for the prob parts
                        # below (one cast, one stack slot) instead of
                        # a bf16->f32->bf16 round trip
                        wb = wt.astype(jnp.bfloat16)
                        wt = wb.astype(jnp.float32)
                        wl = (wb,)
                    else:
                        if mode != "f32":
                            wt = wt.astype(jnp.bfloat16).astype(
                                jnp.float32)
                        wl = _prob_parts(wt, mode)
                    ghj = _prep(da_s[pl.ds(j0, jw), lo:hi], mode)
                    # rebuild this (jw, dh) tile of the attention output
                    # (same operands/feed as the forward AV matmul) —
                    # dWo consumes it after the head loop, replacing the
                    # saved `a` residual row
                    a_s[pl.ds(j0, jw), lo:hi] = _prob_dot(
                        wl, vh, ((0,), (0,)), mode)
                    dv_h = dv_h + _prob_dot(wl, ghj, ((1,), (0,)), mode)
                    gw = _dot(vh, ghj, ((1,), (1,)), mode)  # (Tk, jw)
                    tmp = gw - jnp.sum(gw * wt, axis=0, keepdims=True)
                    dl = _prep((wt * tmp) * scale, mode)
                    dq_s[pl.ds(j0, jw), lo:hi] = _dot(
                        dl, kh, ((0,), (0,)), mode)
                    qhj = _prep(q_s[pl.ds(j0, jw), lo:hi], mode)
                    dk_h = dk_h + _dot(dl, qhj, ((1,), (0,)), mode)
                    return dk_h, dv_h

                zkv = (jnp.zeros((T, dh), jnp.float32),
                       jnp.zeros((T, dh), jnp.float32))
                if fori:
                    dk_h, dv_h = jax.lax.fori_loop(
                        0, n_blk,
                        lambda j, c: block(j * qb, qb, *c), zkv)
                else:
                    dk_h, dv_h = zkv
                    for j0 in range(0, T, qb):
                        dk_h, dv_h = block(j0, min(qb, T - j0),
                                           dk_h, dv_h)
                dk_s[:, lo:hi] = dk_h
                dv_s[:, lo:hi] = dv_h
            # dWo from the rebuilt attention output (the loop tiles are
            # dead here, so this full-width read peaks below the loop)
            dwo_ref[...] += _dot(_prep(a_s[...], mode), drp,
                                 ((0,), (0,)), mode)
            # dq/dk/dv stay in their scratch refs; the projection tail
            # reads each JUST before its use so only one full-width
            # gradient (and its part split) is ever live
            dq = dk = dv = None
        else:
            wprob = w_ref[b]                              # (Tk, H*Tq) f32
            dqs, dks, dvs = [], [], []
            for h in range(heads):
                lo, hi = h * dh, (h + 1) * dh
                gh = _slice_parts(dap, lo, hi)            # (Tq, dh)
                vh = _slice_parts(vp, lo, hi)
                qh = _slice_parts(qp, lo, hi)
                kh = _slice_parts(kp, lo, hi)
                wt = jax.lax.slice_in_dim(wprob, h * T, (h + 1) * T,
                                          axis=1).astype(jnp.float32)
                wl = _prob_parts(wt, mode)
                dvs.append(_prob_dot(wl, gh, ((1,), (0,)), mode))
                gw = _dot(vh, gh, ((1,), (1,)), mode)     # (Tk, Tq)
                tmp = gw - jnp.sum(gw * wt, axis=0, keepdims=True)
                dl = _prep((wt * tmp) * scale, mode)
                dqs.append(_dot(dl, kh, ((0,), (0,)), mode))  # (Tq, dh)
                dks.append(_dot(dl, qh, ((1,), (0,)), mode))  # (Tk, dh)
            dq = jnp.concatenate(dqs, axis=1)
            dk = jnp.concatenate(dks, axis=1)
            dv = jnp.concatenate(dvs, axis=1)
        # One projection at a time so only that projection's part split
        # and input-grad product are live — the all-at-once ordering
        # (dqp/dkp/dvp + dxq/dxk/dxv simultaneously) held ~3 MB more
        # stack and pushed the post-LN self-attention backward past the
        # scoped-VMEM limit at T=512.
        xp = _prep(x, mode)
        mp = xp if self_attn else _prep(
            mem_ref[b].astype(jnp.float32), mode)
        if recompute:
            dq = dq_s[...]
        dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
        dqp = _prep(dq, mode)
        dwq_ref[...] += _dot(xp, dqp, ((0,), (0,)), mode)
        acc = dr + _dot(dqp, wq, ((1,), (1,)), mode)      # dq @ Wq^T
        if recompute:
            dk = dk_s[...]
        dbk_ref[...] += jnp.sum(dk, axis=0, keepdims=True)
        dkp = _prep(dk, mode)
        dwk_ref[...] += _dot(mp, dkp, ((0,), (0,)), mode)
        dxk = _dot(dkp, wk, ((1,), (1,)), mode)
        if self_attn:
            acc = acc + dxk
        else:
            # stage the K-side memory gradient NOW so dxk's live range
            # ends here instead of spanning the whole V block
            dmem_ref[b] = dxk.astype(dmem_ref.dtype)
        dxk = None
        if recompute:
            dv = dv_s[...]
        dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)
        dvp = _prep(dv, mode)
        dwv_ref[...] += _dot(mp, dvp, ((0,), (0,)), mode)
        dxv = _dot(dvp, wv, ((1,), (1,)), mode)
        if self_attn:
            dx_ref[b] = (acc + dxv).astype(dx_ref.dtype)
        else:
            dx_ref[b] = acc.astype(dx_ref.dtype)
            dmem_ref[b] = (dmem_ref[b].astype(jnp.float32)
                           + dxv).astype(dmem_ref.dtype)


def _bwd_batch_block(B, T, D, heads):
    """bb for the backward grid: ~10 row tensors + the probs block,
    double-buffered, within ~8 MB."""
    per_row = (10 * T * D * 4 + T * heads * T * 4) * 2
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and bb * per_row <= (8 << 20):
            return bb
    return 1


def _bwd_pallas(x, memory, params, residuals, g, post_ln, heads,
                mask=None, valid=None, kind="repeat-inc",
                add_keypad=False):
    from .ffn import _split_hi_lo
    wq, bq_, wk, bk_, wv, bv_, wo, bo_, ln_scale, ln_bias = params
    q, k, v, a, w, r = residuals
    recompute = w is None     # probs residual omitted at 256 < T <= _MAX_T
    B, T, D = x.shape
    dh = D // heads
    scale = 1.0 / math.sqrt(dh)
    mode = _mxu_mode(x.dtype)
    self_attn = memory is None
    has_valid = valid is not None
    if recompute and valid is None:
        valid = jnp.ones((B, T), jnp.float32)

    if mode == "bf16x3":
        w_ops = [p for wx in (wq, wk, wv, wo)
                 for p in _split_hi_lo(wx.astype(jnp.float32))]
    elif mode == "bf16":
        w_ops = [wx.astype(jnp.bfloat16) for wx in (wq, wk, wv, wo)]
    else:
        w_ops = [wx.astype(jnp.float32) for wx in (wq, wk, wv, wo)]
    n_w = len(w_ops)

    bb = 1 if recompute else _bwd_batch_block(B, T, D, heads)
    row_spec = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if recompute:
        # no `q`/`a` operands: the kernel re-projects q from x and
        # rebuilds the attention output per head tile (each saved
        # residual row costs 2 MB of double-buffered pipeline — q alone
        # put the T=512 cross-attention backward 2.17 MB over budget)
        operands = [x, g, k, v]
        specs = [row_spec] * 4
        vec_spec = pl.BlockSpec((bb, 1, T), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        operands += [mask[:, None, :], valid[:, None, :]]
        specs += [vec_spec, vec_spec]
    else:
        operands = [x, g, q, k, v, a]
        specs = [row_spec] * 6
        prob_spec = pl.BlockSpec((bb, T, heads * T), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        operands.append(w)
        specs.append(prob_spec)
    if not self_attn:
        operands.append(memory)
        specs.append(row_spec)
    if post_ln:
        operands.append(r)
        specs.append(row_spec)
    operands += w_ops
    specs += [const_spec(wx.shape) for wx in w_ops]
    if recompute:
        bqv = bq_.reshape(1, D).astype(jnp.float32)   # q re-projection
        operands.append(bqv)
        specs.append(const_spec(bqv.shape))
    if post_ln:
        gln = ln_scale.reshape(1, D).astype(jnp.float32)
        operands.append(gln)
        specs.append(const_spec(gln.shape))

    dW = jax.ShapeDtypeStruct((D, D), jnp.float32)
    db = jax.ShapeDtypeStruct((1, D), jnp.float32)
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    out_specs = [row_spec]
    if not self_attn:
        out_shape.append(jax.ShapeDtypeStruct(memory.shape, memory.dtype))
        out_specs.append(row_spec)
    out_shape += [dW, db] * 4
    out_specs += [const_spec((D, D)), const_spec((1, D))] * 4
    if post_ln:
        out_shape += [db, db]
        out_specs += [const_spec((1, D))] * 2

    outs = pl.pallas_call(
        functools.partial(_sublayer_bwd_kernel, self_attn=self_attn,
                          post_ln=post_ln, heads=heads, dh=dh, bb=bb,
                          mode=mode, n_w=n_w, scale=scale,
                          recompute=recompute, kind=kind,
                          add_keypad=add_keypad, has_valid=has_valid),
        grid=(B // bb,),
        in_specs=specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=([pltpu.VMEM((T, D), jnp.float32)] * 6
                        if recompute else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*operands)

    oi = 0
    dx = outs[oi]
    oi += 1
    dmem = None
    if not self_attn:
        dmem = outs[oi]
        oi += 1
    dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = outs[oi:oi + 8]
    oi += 8
    if post_ln:
        dg, dbe = outs[oi][0].astype(ln_scale.dtype), \
            outs[oi + 1][0].astype(ln_bias.dtype)
    else:
        dg, dbe = jnp.zeros_like(ln_scale), jnp.zeros_like(ln_bias)
    dparams = (dwq.astype(wq.dtype), dbq[0].astype(bq_.dtype),
               dwk.astype(wk.dtype), dbk[0].astype(bk_.dtype),
               dwv.astype(wv.dtype), dbv[0].astype(bv_.dtype),
               dwo.astype(wo.dtype), dbo[0].astype(bo_.dtype),
               dg, dbe)
    return dx, dmem, dparams


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


# native residual-fed backward ("1", default); "0" restores the XLA
# recompute VJP (A/B + gradient-numerics knob)
import os as _os
_SUB_BWD_NATIVE = _os.environ.get("KIT_ATTN_SUBLAYER_BWD", "1") == "1"

# probs-residual VMEM budget: the (T, H*T) block is double-buffered as a
# pipeline block in both the training forward (output) and the backward
# (input); past ~2 MB it blows scoped VMEM together with the ~10 row
# tensors (f32-element accounting, matching the forward's bb gate)
_PROBS_RESIDUAL_BYTES = 1 << 21

# recompute-mode query-tile width: scratch per (head, block) step is
# ~8 (Tk, qb) f32 tiles.  128 keeps the lane dim at one full register
# tile; SHRINKING it is counterproductive — measured on chip at T=512,
# qb=64 grew the stack (16.72 MB vs 16.50 MB at qb=128) because Mosaic
# does not reuse slots across the extra unrolled iterations.  The fit
# came instead from dropping the `a` residual row and reading dq/dk/dv
# just-in-time in the projection tail.
_BWD_RECOMPUTE_QB = 128


def _bwd_vmem_model(mode, T, D, heads, recompute, self_attn, post_ln):
    """Modeled scoped-VMEM bytes for one backward grid cell (bb=1).

    A calibrated proxy, not an exact Mosaic accounting: double-buffered
    row operands + stationary weights/accumulators + the dominant live
    scratch + a measured tail term.  Chip calibration points at T=512:
    the UNBLOCKED recompute rebuild measured 17.19 MB scoped
    (compile-time OOM); qb=128 query blocking left post-LN
    self-attention at 16.50 MB (still OOM, and the tail term below is
    fit to that number); qb=64 compiles and runs.  Future wider shapes
    (D, heads, T) fall back to the XLA recompute VJP instead of failing
    to compile."""
    rows = ((4 if recompute else 6)                              # inputs
            + (0 if self_attn else 1) + (1 if post_ln else 0)
            + 1 + (0 if self_attn else 1))                       # outputs
    pipeline = rows * T * D * 4 * 2                   # double-buffered
    wbytes = {"bf16x3": 8 * D * D * 2, "bf16": 4 * D * D * 2,
              "f32": 4 * D * D * 4}[mode]
    acc = 4 * D * D * 4                               # f32 dW accumulators
    # tail liveness the loop cannot end early: dr/da/acc f32 rows plus
    # their bf16x3 part splits, and the LN backward's n2/dy rows when
    # post_ln (fit to the 16.50 MB measurement above)
    tail = (3 + (2 if post_ln else 0)) * T * D * 4
    if recompute:
        qb = min(T, _BWD_RECOMPUTE_QB)
        scratch = 8 * T * qb * 4 + 6 * T * D * 4  # tiles + 6 (T,D) refs
    else:
        pipeline += T * heads * T * 4 * 2             # probs pipeline block
        scratch = 4 * T * D * 4
    return pipeline + wbytes + acc + tail + scratch


# calibrated so the verified flagship shapes pass (T=512 cross-attention
# models at ~15.8 MB and fits on-chip after query blocking) while clearly
# over-budget widths fall back
_BWD_VMEM_LIMIT = 16 << 20


def _sub_bwd_mode(dtype, T, heads, D=256, self_attn=False,
                  post_ln=True) -> Optional[str]:
    """Native-backward flavor for this shape, or None (XLA recompute VJP).

    "residual": the training forward saves the softmax probs and the
    backward is fully recompute-free (T <= 256 at 8 heads).
    "recompute": 256 < T <= _MAX_T — the probs block no longer fits
    scoped VMEM, so the forward saves only q/k/v/a(/r) and the backward
    rebuilds each head's (T, T) probs tile from the saved projections
    (still no projection or out-projection recompute; this is what lifts
    the training T-cap the round-4 verdict flagged)."""
    from ...models.completer import _attention_platform
    if not (_SUB_BWD_NATIVE and _mxu_mode(dtype) in ("bf16", "bf16x3")
            and _attention_platform() == "tpu"):
        return None
    mode = _mxu_mode(dtype)
    if T * heads * T * 4 <= _PROBS_RESIDUAL_BYTES:
        if _bwd_vmem_model(mode, T, D, heads, False, self_attn,
                           post_ln) <= _BWD_VMEM_LIMIT:
            return "residual"
        return None
    if (T <= _MAX_T and T % 8 == 0
            and _bwd_vmem_model(mode, T, D, heads, True, self_attn,
                                post_ln) <= _BWD_VMEM_LIMIT):
        return "recompute"
    return None


def _sub_bwd_native_ok(dtype, T, heads, **kw) -> bool:
    return _sub_bwd_mode(dtype, T, heads, **kw) is not None


def _vjp_fwd(x, memory, params, masks, kind, add_keypad, post_ln, heads):
    mask, valid = masks
    bwd_mode = _sub_bwd_mode(x.dtype, x.shape[1], heads, D=x.shape[2],
                             self_attn=memory is None, post_ln=post_ln)
    if bwd_mode is not None:
        out, res = _fwd_pallas(x, memory, params, mask, valid, kind,
                               add_keypad, post_ln, heads,
                               want_residuals=True,
                               save_probs=bwd_mode == "residual")
        return out, (x, memory, params, masks, res)
    out = fused_attn_sublayer(x, memory, params, masks, kind, add_keypad,
                              post_ln, heads)
    return out, (x, memory, params, masks, None)


def _vjp_bwd(kind, add_keypad, post_ln, heads, res, g):
    x, memory, params, masks, residuals = res
    mask, valid = masks

    if residuals is not None:
        dx, dmem, dparams = _bwd_pallas(x, memory, params, residuals, g,
                                        post_ln, heads, mask=mask,
                                        valid=valid, kind=kind,
                                        add_keypad=add_keypad)
        return dx, dmem, dparams, (None, None)

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
