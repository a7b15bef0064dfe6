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
  * MXU input dtype follows the ambient jax.default_matmul_precision so
    the kernel's speed/accuracy trade matches the XLA path it replaces
    (bf16 under DEFAULT, f32 under high/highest).
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
                  cols=None):
    """(T, cols) additive bias, key-major (transposed kernel layout)."""
    cols = T if cols is None else cols
    key_i = jax.lax.broadcasted_iota(jnp.int32, (T, cols), 0)
    qry_i = jax.lax.broadcasted_iota(jnp.int32, (T, cols), 1) + qry_offset
    mask_key = mask_row[:, None]
    bias = jnp.zeros((T, cols), jnp.float32)
    if kind == "repeat-inc":
        blocked = jnp.logical_and(key_i > qry_i, mask_key > 0)
        bias = jnp.where(blocked, NEG, 0.0)
    elif kind != "all":
        raise ValueError(f"unsupported fused mask kind {kind!r}")
    if add_keypad:
        bias = bias + mask_key
    if valid_row is not None:
        bias = bias + jnp.where(valid_row[:, None] > 0, 0.0, NEG)
    return bias


def _head_slice(x, h, dh):
    return jax.lax.slice_in_dim(x, h * dh, (h + 1) * dh, axis=-1)


def _dot(a, b, contract):
    """In-kernel dot with an explicitly pinned precision (the ambient
    jax.default_matmul_precision would otherwise be recorded into the
    kernel jaxpr, and Mosaic cannot lower HIGH).  For f32 operands the
    precision must be HIGHEST: Mosaic lowers a DEFAULT-precision f32 dot
    as a SINGLE bf16 MXU pass (measured 1.7e-1 error vs f32 on a 256x256
    standard-normal matmul), silently losing the accuracy the f32 path
    exists for; HIGHEST lowers as a multi-pass product (7.6e-6).  The
    speed trade is made upstream by casting operands to
    _ambient_mxu_dtype — bf16 operands take the fast DEFAULT path."""
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, (contract, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _ambient_mxu_dtype(dtype):
    """MXU input dtype matching the ambient jax.default_matmul_precision.

    XLA's DEFAULT precision runs f32 matmuls as single-pass bf16 on the
    MXU; a Mosaic dot_general with f32 operands runs full-precision
    multi-pass.  To keep the kernel's speed/accuracy trade identical to
    the XLA path it replaces, f32 operands are cast to bf16 under default
    precision and kept f32 under high/highest (bench.py gates the choice
    by masked-frame MPJPE)."""
    if dtype != jnp.float32:
        return dtype
    prec = getattr(jax.config, "jax_default_matmul_precision", None)
    if prec in (None, "default", "bfloat16", "fastest"):
        return jnp.bfloat16
    return jnp.float32


def _head_group(H, T, bq, mxu_dtype=jnp.bfloat16):
    # f32 operands double every wide-softmax scratch tensor; halve the
    # element budget so the T=2048 f32 forward stays inside the 16 MB
    # scoped-VMEM limit (measured: the bf16 budget overflows by 428 KB)
    budget = (_WIDE_ELEMS // 2 if jnp.dtype(mxu_dtype).itemsize >= 4
              else _WIDE_ELEMS)
    for hg in (8, 4, 2, 1):
        if H % hg == 0 and T * hg * bq <= budget:
            return hg
    return 1


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, valid_ref, o_ref, *,
                 kind: str, add_keypad: bool, scale: float, heads: int,
                 dh: int, bb: int, bq: int, mxu_dtype):
    T = k_ref.shape[1]
    qry_offset = pl.program_id(1) * bq
    hg = _head_group(heads, T, bq, mxu_dtype)
    for b in range(bb):
        q = q_ref[b].astype(mxu_dtype)        # (BQ, D)
        k = k_ref[b].astype(mxu_dtype)        # (T, D)
        v = v_ref[b].astype(mxu_dtype)
        # key-major bias, built ONCE per row; identical for every head
        bias = _bias_terms_T(mask_ref[b, 0], valid_ref[b, 0], T, kind,
                             add_keypad, qry_offset, q.shape[0])
        for g in range(0, heads, hg):
            sts = []
            for h in range(g, g + hg):
                qh = _head_slice(q, h, dh)    # (BQ, dh)
                kh = _head_slice(k, h, dh)    # (T, dh)
                sts.append(_dot(kh, qh, ((1,), (1,))) * scale + bias)
            wide = sts[0] if hg == 1 else jnp.concatenate(sts, axis=1)
            wide = wide - jnp.max(wide, axis=0, keepdims=True)
            e = jnp.exp(wide)
            w = (e / jnp.sum(e, axis=0, keepdims=True)).astype(mxu_dtype)
            for i, h in enumerate(range(g, g + hg)):
                wh = jax.lax.slice_in_dim(w, i * q.shape[0],
                                          (i + 1) * q.shape[0], axis=1)
                vh = _head_slice(v, h, dh)
                # (BQ, dh), axis-0 contraction
                out = _dot(wh, vh, ((0,), (0,)))
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
    if valid is None:
        valid = jnp.ones((B, T), jnp.float32)

    qf = q.reshape(B, T, D)                   # head-folded, layout-free
    kf = k.reshape(B, T, D)
    vf = v.reshape(B, T, D)

    mxu_dtype = _ambient_mxu_dtype(q.dtype)
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
                          mxu_dtype=mxu_dtype),
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
                     scale: float, heads: int, dh: int, bb: int, mxu_dtype):
    T = q_ref.shape[1]
    for b in range(bb):
        q = q_ref[b].astype(mxu_dtype)        # (T, D)
        k = k_ref[b].astype(mxu_dtype)
        v = v_ref[b].astype(mxu_dtype)
        g = g_ref[b].astype(mxu_dtype)
        bias = _bias_terms_T(mask_ref[b, 0], valid_ref[b, 0], T, kind,
                             add_keypad)
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = _head_slice(q, h, dh)
            kh = _head_slice(k, h, dh)
            vh = _head_slice(v, h, dh)
            gh = _head_slice(g, h, dh)
            # key-major throughout: w_T is softmax over axis 0
            st = _dot(kh, qh, ((1,), (1,))) * scale + bias
            st = st - jnp.max(st, axis=0, keepdims=True)
            e = jnp.exp(st)
            wt = e / jnp.sum(e, axis=0, keepdims=True)     # (T_k, T_q) f32
            wl = wt.astype(mxu_dtype)
            # dv = w^T g                    (T_k, dh)
            dv = _dot(wl, gh, ((1,), (0,)))
            # gw_T = v g^T                  (T_k, T_q)
            gw = _dot(vh, gh, ((1,), (1,)))
            # dl_T = w * (gw - colsum(gw * w)) * scale
            tmp = gw - jnp.sum(gw * wt, axis=0, keepdims=True)
            dl = ((wt * tmp) * scale).astype(mxu_dtype)    # (T_k, T_q)
            dq = _dot(dl, kh, ((0,), (0,)))
            dk = _dot(dl, qh, ((1,), (0,)))
            dq_ref[b, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, sl] = dv.astype(dv_ref.dtype)


def _fused_bwd_pallas(q, k, v, g, mask, valid, kind, add_keypad):
    B, T, H, dh = q.shape
    D = H * dh
    scale = 1.0 / math.sqrt(dh)
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
                          dh=dh, bb=bb,
                          mxu_dtype=_ambient_mxu_dtype(q.dtype)),
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
    # measured (RESULTS.md): under f32 high/highest MXU passes, XLA's
    # batched f32 backward wins at short T (0.83x at T=128); the pallas
    # backward wins everywhere under bf16 (1.5-2.9x)
    if _ambient_mxu_dtype(q.dtype) == jnp.float32 and T < 256:
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
