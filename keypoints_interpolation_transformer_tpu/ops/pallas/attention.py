"""Pallas TPU fused attention for the keypoint inpainter.

Fuses, per (batch-block, query-block) grid cell, entirely in VMEM:

  scores = q k^T / sqrt(dh)
         + repeat-inc bias        (built from the 1-D frame mask IN-KERNEL,
                                   so no (B, T, T) bias is ever materialized
                                   in HBM — the reference builds it with an
                                   O(T^2) Python loop, model.py:200-202)
         + float key-padding      (torch semantics: +mask[col], optional)
         + padding bias           (blocks attention to padded frames)
  out = softmax(scores) v

Design notes (v5e, dh = 32; measured in RESULTS.md):

  * One grid cell covers ALL heads of a block of batch rows — the additive
    bias is shared across heads, so it is built once per row instead of
    once per (batch, head), and per-cell work is large enough to hide the
    pipeline overhead that made a (B, H, ·) grid lose to XLA.
  * q/k/v stay in the model's natural head-folded (B, T, H*dh) layout — no
    (B, H, T, dh) transpose through HBM on either side of the kernel.
  * Scores are computed TRANSPOSED (keys on sublanes, queries on lanes):
    the softmax then reduces over the 8-deep sublane axis instead of the
    128-wide lane axis (~7 shuffle ops per vreg saved), and the AV /
    backward contractions all take axis-0 contractions with no explicit
    transposes.
  * Per head-group, the transposed score tiles are concatenated into one
    wide (T, hg*bq) tensor so the softmax runs as a single dense VPU phase
    that Mosaic can overlap with the MXU matmuls.  This combination is
    what finally beats XLA at the flagship shape (B=256, T=128) where
    XLA's materialized (B, H, T, T) logits cost ~134 MB/layer of HBM.
  * The (T, T) tiles live only in VMEM; with the full key range resident
    per cell (the PE caps T at 2048) a flash streaming recurrence is
    unnecessary — logits simply never touch HBM.
  * MXU strategy follows the ambient jax.default_matmul_precision so the
    kernel's speed/accuracy trade matches the XLA path it replaces: bf16
    single-pass under DEFAULT, in-kernel hi/lo-split bf16x3 (3 native
    passes, XLA's "high" error model — Mosaic cannot lower HIGH) under
    HIGH, and f32 HIGHEST multi-pass under HIGHEST (see _mxu_mode).
  * The backward is a Pallas kernel too (same transposed structure): it
    recomputes the probabilities in VMEM and emits dq/dk/dv without ever
    writing the (B, H, T, T) weight tensor to HBM.  Above _BWD_PALLAS_MAX_T
    it falls back to an XLA recompute (VMEM bound).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
LOG2E = 1.4426950408889634  # log2(e): exp(x) == exp2(x * LOG2E)

# query-block size: (T, BQ) transposed score tiles stay in VMEM at T = 2048
Q_BLOCK = 512
# largest T whose full backward working set ((T, D) x7 + (T, T) tiles)
# fits VMEM; beyond it the backward recomputes in XLA
_BWD_PALLAS_MAX_T = 512
# wide-softmax budget: heads are grouped so T * hg * bq f32 elements of
# concatenated scores stay ~2 MB
_WIDE_ELEMS = 1 << 19


def _bias_terms(mask_row, valid_row, T, kind, add_keypad, row_offset=0,
                rows=None):
    """(rows, T) additive bias from 1-D masks — query-major (XLA path)."""
    rows = T if rows is None else rows
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 0) + row_offset
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, T), 1)
    mask_col = mask_row[None, :]  # (1, T) broadcasts over rows
    bias = jnp.zeros((rows, T), jnp.float32)
    if kind == "repeat-inc":
        blocked = jnp.logical_and(col > row, mask_col > 0)
        bias = jnp.where(blocked, NEG, 0.0)
    elif kind != "all":
        raise ValueError(f"unsupported fused mask kind {kind!r}")
    if add_keypad:
        bias = bias + mask_col
    if valid_row is not None:
        bias = bias + jnp.where(valid_row[None, :] > 0, 0.0, NEG)
    return bias


def _bias_terms_T(mask_row, valid_row, T, kind, add_keypad, qry_offset=0,
                  cols=None, mul=1.0):
    """(T, cols) additive bias, key-major (transposed kernel layout).

    ``mul`` scales the FINITE keypad term only — used by the exp2
    softmax (logits pre-multiplied by log2(e) so the VPU evaluates
    exp2 instead of exp; the -1e9 blockers stay unscaled, they
    saturate either way).

    Returns ``None`` when the bias is statically zero (kind "all", no
    keypad, no valid mask — e.g. the decoder's cross-attention on full
    batches): callers then skip the per-head bias adds entirely.
    Key-only terms (keypad/valid) stay (T, 1) and broadcast in the add."""
    cols = T if cols is None else cols
    mask_key = mask_row[:, None]
    bias = None
    if kind == "repeat-inc":
        key_i = jax.lax.broadcasted_iota(jnp.int32, (T, cols), 0)
        qry_i = jax.lax.broadcasted_iota(jnp.int32, (T, cols), 1) \
            + qry_offset
        blocked = jnp.logical_and(key_i > qry_i, mask_key > 0)
        bias = jnp.where(blocked, NEG, 0.0)
    elif kind != "all":
        raise ValueError(f"unsupported fused mask kind {kind!r}")
    if add_keypad:
        kp = mask_key * mul
        bias = kp if bias is None else bias + kp
    if valid_row is not None:
        vb = jnp.where(valid_row[:, None] > 0, 0.0, NEG)
        bias = vb if bias is None else bias + vb
    return bias


def _head_slice(x, h, dh):
    return jax.lax.slice_in_dim(x, h * dh, (h + 1) * dh, axis=-1)


def _mxu_mode(dtype) -> str:
    """MXU strategy matching the ambient jax.default_matmul_precision.

    Mosaic cannot lower Precision.HIGH, and it lowers a DEFAULT-precision
    f32 dot as a SINGLE bf16 MXU pass (measured 1.7e-1 error vs f32 on a
    256x256 standard-normal matmul) — so the ambient precision cannot
    simply be recorded into the kernel jaxpr.  Instead:

      * bf16 operands / ambient "default"  -> "bf16": one native pass.
      * ambient "high" (bf16x3)            -> "bf16x3": operands are
        split in-kernel into hi+lo bf16 parts and the product assembled
        from 3 native passes (hi@hi + hi@lo + lo@hi, f32 accumulation) —
        XLA's own error model for Precision.HIGH, at half the MXU cost
        of HIGHEST's 6-pass product.
      * ambient "highest"                  -> "f32": Precision.HIGHEST
        multi-pass (7.6e-6 on the probe above).
    """
    if jnp.dtype(dtype) != jnp.float32:
        return "bf16"
    prec = getattr(jax.config, "jax_default_matmul_precision", None)
    if prec in (None, "default", "bfloat16", "fastest"):
        return "bf16"
    if prec in ("tensorfloat32", "high", "bfloat16_3x"):
        return "bf16x3"
    return "f32"


def _split_hi_lo_kernel(x):
    """In-kernel f32 -> (bf16 hi, bf16 lo).  Mosaic compiles the astype
    round-trip literally (no excess-precision folding), so the plain form
    is correct here — unlike XLA-land, where lax.reduce_precision is
    required (see ops/pallas/ffn._split_hi_lo)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prep(x, mode):
    """Pre-cast/split an operand once; returns a parts tuple for _dot."""
    if mode == "bf16":
        return (x.astype(jnp.bfloat16),)
    if mode == "bf16x3":
        return _split_hi_lo_kernel(x)
    return (x,)


def _slice_parts(parts, lo, hi, axis=-1):
    return tuple(jax.lax.slice_in_dim(p, lo, hi, axis=axis) for p in parts)


import os as _os

# bf16x3 probability handling for the AV contraction: "0" (default)
# feeds the softmax probabilities to the MXU as single bf16; "1" keeps
# the full hi/lo split (exactly XLA-high's error model, ~5% slower at
# the flagship shape).  Measured end-to-end (bench.py, 256/6/8 B=256
# T=128): bf16 probs 8.7e-5 masked-MPJPE vs f32 (inside the 1e-4 bar),
# full split 1.1e-5.
_PROB_SPLIT = _os.environ.get("KIT_ATTN_PROB_SPLIT", "0") == "1"

# Wide-softmax max-subtraction.  KIT_ATTN_MAXSUB=0 SKIPS the per-query
# max reduce + subtract passes over the wide score tensor (softmax is
# shift-invariant; a +64 clamp folded into the exp2 pass keeps overflow
# impossible since sum <= T * 2^64 << 2^127, and the denominator guard
# sends fully-blocked query columns to exactly-zero probs instead of
# the max-sub path's uniform-average-over-garbage).
#
# NOTE (round 5, measured): this was the remaining named softmax lever
# ("fold the max-subtract into the bias pass") and it is NEUTRAL on the
# chip — 0.479 vs 0.470 ms/layer (attention_bench, B=256 T=128, high),
# i.e. the max+subtract passes are free: Mosaic overlaps the wide
# elementwise/reduce phases with the MXU dots already.  Together with
# the deferred-normalization result below, the conclusion is that the
# attention core's ~9x gap over its MXU floor (0.47 ms vs ~54 us) is
# NOT softmax-pass-count; the cost sits in the many skinny per-head
# dot launches and their 32-lane operand slices (16 score/AV dots per
# row block at bf16x3, contraction dim 32).  Next lever worth building:
# fewer/wider dots per launch, not fewer VPU passes.  Default stays the
# classic max-subtract (exactly XLA's softmax shift, incl. uniform
# output over fully-blocked columns).
_MAXSUB = _os.environ.get("KIT_ATTN_MAXSUB", "1") == "1"
_EXP_CLAMP = 64.0


def _softmax_wide(wide):
    """Key-major softmax over axis 0 of the wide log2-domain scores."""
    if _MAXSUB:
        wide = wide - jnp.max(wide, axis=0, keepdims=True)
        e = jnp.exp2(wide)
        return e * (1.0 / jnp.sum(e, axis=0, keepdims=True))
    e = jnp.exp2(jnp.minimum(wide, _EXP_CLAMP))
    return e * (1.0 / (jnp.sum(e, axis=0, keepdims=True) + 1e-30))


# NOTE (round 5, measured): DEFERRED softmax normalization — feeding the
# MXU the unnormalized exp2 outputs and scaling each query's attention
# output row by 1/rowsum afterwards — was built and measured ~2x SLOWER
# on the chip (attn sublayer x18: 21.5-23.2 ms vs 11.4 normalize-in-wide
# at the flagship shape), in BOTH row-sum formulations (MXU ones-column
# contraction and VPU sum + transpose): the (hg*T, 1) sublane-major
# reciprocal vector and its per-head row-slicing force relayouts that
# cost far more than the one full-wide normalize multiply they remove.
# Lane-major wide phases are the only fast shape for this softmax.


# bf16x3 score dots as ONE contraction-stacked launch instead of three:
# st = kh@qh + kh@ql + kl@qh == [kh|kh|kl] @ [qh|ql|qh] at K=96.  The
# stacked operands duplicate only the (T, dh) head slices (12K elems),
# NOT the wide prob tensor that made the 3-way _dot stack lose 1.6x;
# a K=96 contraction drives 3/4 of the MXU's 128-deep array per pass
# where the three K=32 launches each use 1/4.
_SCORE_STACK = _os.environ.get("KIT_ATTN_SCORE_STACK", "0") == "1"


def _score_dot(k_parts, q_parts, mode):
    """Transposed (T, bq) score tile k_h q_h^T from prepped parts."""
    if mode == "bf16x3" and _SCORE_STACK:
        (kh, kl), (qh, ql) = k_parts, q_parts
        ks = jnp.concatenate([kh, kh, kl], axis=1)
        qs = jnp.concatenate([qh, ql, qh], axis=1)
        return jax.lax.dot_general(ks, qs, ((((1,), (1,)), ((), ()))),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    return _dot(k_parts, q_parts, ((1,), (1,)), mode)


def _prob_parts(w, mode):
    """Prep the softmax probabilities for the AV contraction.

    Under bf16x3 (unless KIT_ATTN_PROB_SPLIT=1) the probabilities are
    fed to the MXU as SINGLE bf16 (one cast pass) instead of a hi/lo
    split (three full passes over the wide tensor + double per-head
    slicing): they live in [0, 1], so the extra quantization is a ~2^-9
    relative perturbation of weights that sum to 1 — measured
    end-to-end masked-MPJPE 8.7e-5 vs f32 (inside the 1e-4 bench gate,
    RESULTS.md), while the value path keeps full split precision."""
    if mode == "bf16x3" and not _PROB_SPLIT:
        return (w.astype(jnp.bfloat16),)
    return _prep(w, mode)


def _prob_dot(w_parts, v_parts, contract, mode):
    """AV dot with bf16 probabilities against split-precision values."""
    if mode == "bf16x3" and len(w_parts) == 1:
        (wb,), (vh_, vl_) = w_parts, v_parts

        def d(a, b):
            return jax.lax.dot_general(a, b, (contract, ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.DEFAULT)

        return d(wb, vh_) + d(wb, vl_)
    return _dot(w_parts, v_parts, contract, mode)


def _dot(a_parts, b_parts, contract, mode):
    """In-kernel dot over pre-prepped operand parts (see _mxu_mode).

    bf16x3 runs hi@hi + hi@lo + lo@hi as THREE dots here: for the
    score/AV dots the operands change every head, so the contraction-axis
    stacking that wins in ops/pallas/ffn (weight-stationary) would re-copy
    the wide softmax tensor three times per head — measured 1.6x SLOWER
    than the separate dots at the flagship shape.  Projection dots against
    stationary weights should use the stacked form instead (see
    ops/pallas/attn_sublayer._proj)."""
    prec = (jax.lax.Precision.HIGHEST if mode == "f32"
            else jax.lax.Precision.DEFAULT)

    def d(a, b):
        return jax.lax.dot_general(a, b, (contract, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    if mode == "bf16x3":
        (ah, al), (bh, bl) = a_parts, b_parts
        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return d(a_parts[0], b_parts[0])


def _head_group(H, T, bq, mode="bf16"):
    # f32 operands double every wide-softmax scratch tensor (and bf16x3
    # adds hi/lo bf16 copies of it); halve the element budget so the
    # T=2048 f32 forward stays inside the 16 MB scoped-VMEM limit
    # (measured: the bf16 budget overflows by 428 KB)
    budget = _WIDE_ELEMS if mode == "bf16" else _WIDE_ELEMS // 2
    for hg in (8, 4, 2, 1):
        if H % hg == 0 and T * hg * bq <= budget:
            return hg
    return 1


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, valid_ref, o_ref, *,
                 kind: str, add_keypad: bool, scale: float, heads: int,
                 dh: int, bb: int, bq: int, mode: str, has_valid: bool):
    T = k_ref.shape[1]
    qry_offset = pl.program_id(1) * bq
    hg = _head_group(heads, T, bq, mode)
    for b in range(bb):
        # fold scale AND log2(e) into q once per row block — the score
        # tiles then need no per-head scaling, and the softmax runs as
        # exp2 (log2-domain logits), the VPU-native exponential
        q = _prep(q_ref[b].astype(jnp.float32) * (scale * LOG2E), mode)
        k = _prep(k_ref[b], mode)             # (T, D) parts
        v = _prep(v_ref[b], mode)
        rows = q_ref.shape[1]
        # key-major bias, built ONCE per row; identical for every head
        bias = _bias_terms_T(mask_ref[b, 0],
                             valid_ref[b, 0] if has_valid else None, T,
                             kind, add_keypad, qry_offset, rows, mul=LOG2E)
        for g in range(0, heads, hg):
            sts = []
            for h in range(g, g + hg):
                qh = _slice_parts(q, h * dh, (h + 1) * dh)   # (BQ, dh)
                kh = _slice_parts(k, h * dh, (h + 1) * dh)   # (T, dh)
                st = _score_dot(kh, qh, mode)
                sts.append(st if bias is None else st + bias)
            wide = sts[0] if hg == 1 else jnp.concatenate(sts, axis=1)
            w = _prob_parts(_softmax_wide(wide), mode)
            for i, h in enumerate(range(g, g + hg)):
                wh = _slice_parts(w, i * rows, (i + 1) * rows)
                vh = _slice_parts(v, h * dh, (h + 1) * dh)
                # (BQ, dh), axis-0 contraction
                out = _prob_dot(wh, vh, ((0,), (0,)), mode)
                o_ref[b, :, h * dh:(h + 1) * dh] = out.astype(o_ref.dtype)


def _batch_block(B, T, D, itemsize, budget_bytes=1 << 20):
    """Rows per grid cell: enough work to hide per-cell overhead, bounded
    by VMEM — every blocked tensor is double-buffered by the pipeline, so
    the forward holds 2 x 4 x (bb, T, D) blocks plus score scratch.  The
    budget is per-block BYTES (~1 MB), so wider models (larger D) get
    proportionally fewer rows instead of overflowing scoped VMEM."""
    rows = max(budget_bytes // max(D * itemsize, 1), 1)
    for bb in (8, 4, 2, 1):
        if B % bb == 0 and bb * T <= rows:
            return bb
    return 1


def _fused_fwd(q, k, v, mask, valid, kind, add_keypad):
    B, T, H, dh = q.shape
    D = H * dh
    scale = 1.0 / math.sqrt(dh)
    has_valid = valid is not None
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)

    qf = q.reshape(B, T, D)                   # head-folded, layout-free
    kf = k.reshape(B, T, D)
    vf = v.reshape(B, T, D)

    mode = _mxu_mode(q.dtype)
    bq = min(Q_BLOCK if T <= 1024 else Q_BLOCK // 4, T)
    if T % bq:  # pad queries to a block multiple; extra rows are dropped
        pad = bq - T % bq
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
    tq = qf.shape[1]
    bb = _batch_block(B, T, D, jnp.dtype(q.dtype).itemsize) \
        if tq == T else 1

    grid = (B // bb, tq // bq)
    q_spec = pl.BlockSpec((bb, bq, D), lambda b, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((bb, T, D), lambda b, j: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    # 1-D per-frame vectors ride as (B, 1, T) so the block's trailing dims
    # equal the array dims (TPU tiling rule)
    vec_spec = pl.BlockSpec((bb, 1, T), lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, kind=kind, add_keypad=add_keypad,
                          scale=scale, heads=H, dh=dh, bb=bb, bq=bq,
                          mode=mode, has_valid=has_valid),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, vec_spec, vec_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qf, kf, vf, mask[:, None, :], valid[:, None, :])
    return out[:, :T].reshape(B, T, H, dh)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, mask_ref, valid_ref,
                     dq_ref, dk_ref, dv_ref, *, kind: str, add_keypad: bool,
                     scale: float, heads: int, dh: int, bb: int, mode: str,
                     has_valid: bool = True):
    T = q_ref.shape[1]
    for b in range(bb):
        q = _prep(q_ref[b], mode)             # (T, D) parts
        k = _prep(k_ref[b], mode)
        v = _prep(v_ref[b], mode)
        g = _prep(g_ref[b], mode)
        bias = _bias_terms_T(mask_ref[b, 0],
                             valid_ref[b, 0] if has_valid else None, T,
                             kind, add_keypad)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = _slice_parts(q, h * dh, (h + 1) * dh)
            kh = _slice_parts(k, h * dh, (h + 1) * dh)
            vh = _slice_parts(v, h * dh, (h + 1) * dh)
            gh = _slice_parts(g, h * dh, (h + 1) * dh)
            # key-major throughout: w_T is softmax over axis 0
            st = _dot(kh, qh, ((1,), (1,)), mode) * scale
            if bias is not None:
                st = st + bias
            st = st - jnp.max(st, axis=0, keepdims=True)
            e = jnp.exp(st)
            wt = e * (1.0 / jnp.sum(e, axis=0, keepdims=True))  # (Tk,Tq) f32
            wl = _prep(wt, mode)
            # dv = w^T g                    (T_k, dh)
            dv = _dot(wl, gh, ((1,), (0,)), mode)
            # gw_T = v g^T                  (T_k, T_q)
            gw = _dot(vh, gh, ((1,), (1,)), mode)
            # dl_T = w * (gw - colsum(gw * w)) * scale
            tmp = gw - jnp.sum(gw * wt, axis=0, keepdims=True)
            dl = _prep((wt * tmp) * scale, mode)           # (T_k, T_q)
            dq = _dot(dl, kh, ((0,), (0,)), mode)
            dk = _dot(dl, qh, ((1,), (0,)), mode)
            dq_ref[b, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, sl] = dv.astype(dv_ref.dtype)


def _fused_bwd_pallas(q, k, v, g, mask, valid, kind, add_keypad):
    B, T, H, dh = q.shape
    D = H * dh
    scale = 1.0 / math.sqrt(dh)
    has_valid = valid is not None
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)
    qf, kf, vf, gf = (x.reshape(B, T, D) for x in (q, k, v, g))
    # 7 double-buffered (bb, T, D) blocks + (T, T) tiles in VMEM
    bb = _batch_block(B, T, D, jnp.dtype(q.dtype).itemsize,
                      budget_bytes=512 << 10)

    spec = pl.BlockSpec((bb, T, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((bb, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((B, T, D), x.dtype) for x in (q, k, v)]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, kind=kind,
                          add_keypad=add_keypad, scale=scale, heads=H,
                          dh=dh, bb=bb, mode=_mxu_mode(q.dtype),
                          has_valid=has_valid),
        grid=(B // bb,),
        in_specs=[spec, spec, spec, spec, vec_spec, vec_spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qf, kf, vf, gf, mask[:, None, :], valid[:, None, :])
    return (dq.reshape(B, T, H, dh), dk.reshape(B, T, H, dh),
            dv.reshape(B, T, H, dh))


def _xla_attention(q, k, v, mask, valid, kind, add_keypad):
    """Reference XLA path (also the long-T backward recompute)."""
    B, T, H, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)
    bias = jax.vmap(lambda m, vd: _bias_terms(m, vd, T, kind, add_keypad))(
        mask, valid)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[:, None]
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype), w


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, mask, valid, kind="repeat-inc",
                    add_keypad=False):
    """(B, T, H, dh) attention with in-kernel repeat-inc masking."""
    return _fused_fwd(q, k, v, mask, valid, kind, add_keypad)


def _vjp_fwd(q, k, v, mask, valid, kind, add_keypad):
    out = _fused_fwd(q, k, v, mask, valid, kind, add_keypad)
    return out, (q, k, v, mask, valid)


def _vjp_bwd(kind, add_keypad, res, g):
    q, k, v, mask, valid = res
    T = q.shape[1]
    use_pallas = T <= _BWD_PALLAS_MAX_T
    # measured (RESULTS.md): under f32-HIGHEST MXU passes, XLA's batched
    # f32 backward wins at short T (0.83x at T=128); the pallas backward
    # wins everywhere under bf16 (1.5-2.9x) and bf16x3 (in-kernel 3-pass)
    if _mxu_mode(q.dtype) == "f32" and T < 256:
        use_pallas = False
    if use_pallas:
        dq, dk, dv = _fused_bwd_pallas(q, k, v, g, mask, valid, kind,
                                       add_keypad)
        return dq, dk, dv, None, None
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    _, w = _xla_attention(q, k, v, mask, valid, kind, add_keypad)
    dv = jnp.einsum("bhqk,bqhd->bkhd", w, g.astype(jnp.float32))
    gw = jnp.einsum("bqhd,bkhd->bhqk", g.astype(jnp.float32), v)
    tmp = gw - jnp.sum(gw * w, axis=-1, keepdims=True)
    dlogits = (w * tmp) * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, k)
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, q)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def xla_attention(q, k, v, mask, valid=None, kind="repeat-inc",
                  add_keypad=False):
    return _xla_attention(q, k, v, mask, valid, kind, add_keypad)[0]
