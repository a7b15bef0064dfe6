"""Pallas TPU fused transformer feed-forward sublayer.

The round-2 profile (benchmarks/profile_step.py) showed the FF sublayers
are 62% of the flagship inference step at bf16x3 — and ~43% of that is NOT
matmul: the (B, T, 2048) GELU intermediate round-trips HBM and the
residual + LayerNorm are separate passes.  This kernel computes the whole
post-attention sublayer of a torch-default transformer layer
(reference model.py:84-90 uses torch's TransformerEncoder/DecoderLayer:
``x = norm2(x + linear2(gelu(linear1(x))))``) in ONE pass over the rows:

    x1 = LN1(r)            (optional: absorbs the attention sublayer's
                            residual norm, saving one more HBM pass)
    u  = x1 @ W1 + b1
    h  = gelu_exact(u)     (erf — torch activation="gelu" semantics)
    z  = x1 + h @ W2 + b2
    y  = LN2(z)

Design (v5e):
  * Grid over row blocks of the flattened (B*T, D) tokens; weights ride
    with a constant index map, so Mosaic keeps them VMEM-resident across
    cells (loaded once, weight-stationary).
  * HBM traffic per cell = rows in + rows out.  The (rows, 2048)
    intermediate lives and dies in VMEM.
  * MXU precision matches the ambient jax.default_matmul_precision:
      - default  -> single bf16 pass (operands cast to bf16)
      - high     -> bf16x3: operands split into hi+lo bf16 parts and the
                    product assembled from 3 native bf16 passes
                    (hi@hi + hi@lo + lo@hi) with f32 accumulation — the
                    same error model as XLA's "high" f32 matmul, because
                    Mosaic cannot lower Precision.HIGH in-kernel
                    (memory: mosaic-precision-pitfalls)
      - highest  -> f32 operands with Precision.HIGHEST (multi-pass)
  * Backward (bf16/bf16x3 on TPU) is a NATIVE Pallas kernel
    (_ffn_bwd_pallas): the training forward saves the pre-GELU u and
    pre-LN2 z residuals so the backward runs recompute-free — 4 gradient
    matmuls with the LN/GELU backward fused, dW/db/dLN accumulated in
    VMEM across row cells.  f32-highest and the quantized mode keep the
    XLA-recompute VJP (exact XLA gradient numerics for parity work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5

# rows per grid cell: weights (4 MB split-bf16 or 4 MB f32) + the (R, FF)
# intermediate and its splits must fit scoped VMEM (16 MB)
import os as _os
_ROW_BLOCK = int(_os.environ.get("KIT_FFN_ROW_BLOCK", "256"))


def _precision_mode(dtype) -> str:
    if jnp.dtype(dtype) != jnp.float32:
        return "bf16"
    prec = getattr(jax.config, "jax_default_matmul_precision", None)
    if prec in (None, "default", "bfloat16", "fastest"):
        return "bf16"
    if prec in ("tensorfloat32", "high", "bfloat16_3x"):
        return "bf16x3"
    return "f32"


def _split_hi_lo(x):
    """XLA-land f32 -> (bf16 hi, bf16 lo) split, with hi computed via
    lax.reduce_precision, NOT an astype round-trip: under jit, XLA's
    excess-precision simplifier folds ``f32(bf16(x))`` back to ``x`` when
    x is a runtime value (a jit argument, e.g. model params), making
    lo == 0 and silently degrading bf16x3 to single-pass bf16 (observed:
    full-model MPJPE 1.9e-3 vs the 1e-4 gate, while the standalone test —
    whose weights were trace CONSTANTS, folded with true rounding —
    stayed at 2e-5).  reduce_precision is the fold-proof rounding
    primitive."""
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    hi = hi_f32.astype(jnp.bfloat16)            # exact: already bf16-valued
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _split_hi_lo_kernel(x):
    """In-kernel split: Mosaic has no reduce_precision lowering, and it
    compiles the astype round-trip literally (no excess-precision
    folding), so the plain form is both available and correct here."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _stack_weight_3x(w):
    """(K, N) f32 -> (3K, N) bf16 [w_hi; w_lo; w_hi], the weight side of
    the single-matmul bf16x3 form (see _dot3)."""
    w_hi, w_lo = _split_hi_lo(w.astype(jnp.float32))
    return jnp.concatenate([w_hi, w_lo, w_hi], axis=0)


def _dot3(a, b_stacked):
    """bf16x3 as ONE MXU matmul: hi@hi + hi@lo + lo@hi is evaluated by
    contracting [a_hi | a_hi | a_lo] (R, 3K) against the pre-stacked
    [b_hi; b_lo; b_hi] (3K, N) — the three partial products accumulate
    in the MXU's f32 accumulator over the K dimension instead of as two
    separate (R, N) VPU adds, and the MXU pipelines one K=3K matmul
    instead of three dispatches (measured: 3-dot form cost 1.53x the
    single-pass bf16 dot; this form ~1.1x)."""
    a_hi, a_lo = _split_hi_lo_kernel(a)
    a_cat = jnp.concatenate([a_hi, a_hi, a_lo], axis=1)
    return jax.lax.dot_general(a_cat, b_stacked, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _dot1(a, b, precision):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _ln(x, gamma, beta, eps=LN_EPS):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * gamma + beta


# Rational minimax-style fit of erf(t)/t in u = t^2 on [0, 16], clamped
# at |t| = 4 (erfc(4) = 1.5e-8).  Derived by weighted-least-squares
# iteration against math.erf and validated in f32 Horner arithmetic:
# max abs error 3.6e-7 over the full clamped range — two orders below
# the bf16x3 dot noise floor.  a[0] = 2/sqrt(pi) as theory requires.
_ERF_NUM = (1.1283791612e+00, 1.8576051351e-01, 5.2164984706e-02,
            3.5787606964e-03, 2.8271350914e-04, 2.1091421936e-06)
_ERF_DEN = (1.0000000000e+00, 4.9795910022e-01, 1.1221760052e-01,
            1.4588278651e-02, 1.1213606292e-03, 3.8598467705e-05)


def _erf_approx(t):
    """erf via an odd rational t * A(t^2)/B(t^2) — no exp, no abs/sign,
    one division; ~2.5x cheaper on the VPU than the previous
    exp-based Abramowitz&Stegun 7.1.26 form (the exp alone was ~40% of
    the GELU's VPU passes).  Mosaic has no erf lowering
    (NotImplementedError: primitive erf), so the exact-erf GELU the
    reference uses (torch activation='gelu') is evaluated with this
    form in-kernel; the XLA reference/backward path keeps the true
    erf."""
    t = jnp.clip(t, -4.0, 4.0)
    u = t * t
    num = _ERF_NUM[-1]
    for c in _ERF_NUM[-2::-1]:
        num = num * u + c
    den = _ERF_DEN[-1]
    for c in _ERF_DEN[-2::-1]:
        den = den * u + c
    return t * num / den


def _gelu_exact(x):
    # torch "gelu" is the exact erf form (model.py:87 activation='gelu')
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _body(x1, r, w1_parts, w2_parts, b1, b2, g2, be2, mode):
    """Returns (y, u, z) — u/z are the training residuals (pre-GELU
    activation and pre-LN2 sum); inference writers discard them."""
    if mode == "bf16x3":
        u = _dot3(x1, w1_parts[0]) + b1
        h = _gelu_exact(u)
        z = x1 + _dot3(h, w2_parts[0]) + b2
    elif mode == "bf16":
        u = _dot1(x1.astype(jnp.bfloat16), w1_parts[0],
                  jax.lax.Precision.DEFAULT) + b1
        h = _gelu_exact(u)
        z = x1 + _dot1(h.astype(jnp.bfloat16), w2_parts[0],
                       jax.lax.Precision.DEFAULT) + b2
    else:
        u = _dot1(x1, w1_parts[0], jax.lax.Precision.HIGHEST) + b1
        h = _gelu_exact(u)
        z = x1 + _dot1(h, w2_parts[0], jax.lax.Precision.HIGHEST) + b2
    return _ln(z, g2, be2), u, z


# sub-blocks interleaved inside a cell: the per-half dependency chains
# (dot1 -> gelu -> dot2) are independent, so Mosaic's scheduler can run
# one half's GELU on the VPU while the other half's matmul occupies the
# MXU — without it the units strictly alternate and the cell time is the
# SUM of MXU and VPU time instead of ~max
_SUB_BLOCKS = int(_os.environ.get("KIT_FFN_SUB_BLOCKS", "2"))


def _row_halves(R):
    n = _SUB_BLOCKS
    if n <= 1 or R % n or R // n < 8:
        return [(0, R)]
    step = R // n
    return [(i * step, (i + 1) * step) for i in range(n)]


def _kernel_split(r_ref, w1s, w2s, b1, b2, g1, be1, g2, be2,
                  o_ref, *res_refs, pre_ln):
    w1_parts = (w1s[...],)
    w2_parts = (w2s[...],)
    for lo, hi in _row_halves(r_ref.shape[0]):
        r = r_ref[lo:hi].astype(jnp.float32)
        x1 = _ln(r, g1[0], be1[0]) if pre_ln else r
        y, u, z = _body(x1, r, w1_parts, w2_parts,
                        b1[0], b2[0], g2[0], be2[0], "bf16x3")
        o_ref[lo:hi] = y.astype(o_ref.dtype)
        if res_refs:  # training: save u (pre-GELU) and z (pre-LN2)
            res_refs[0][lo:hi] = u
            res_refs[1][lo:hi] = z


def _kernel_single(r_ref, w1, w2, b1, b2, g1, be1, g2, be2, o_ref,
                   *res_refs, pre_ln, mode):
    for lo, hi in _row_halves(r_ref.shape[0]):
        r = r_ref[lo:hi].astype(jnp.float32)
        x1 = _ln(r, g1[0], be1[0]) if pre_ln else r
        y, u, z = _body(x1, r, (w1[...],), (w2[...],),
                        b1[0], b2[0], g2[0], be2[0], mode)
        o_ref[lo:hi] = y.astype(o_ref.dtype)
        if res_refs:
            res_refs[0][lo:hi] = u
            res_refs[1][lo:hi] = z


def _quant_rows(x):
    """Dynamic symmetric per-row int8: (xq int8, scale (R, 1) f32)."""
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
    return xq, s


def _int8_dot(x, wq, ws):
    xq, s = _quant_rows(x)
    # precision pinned to DEFAULT: an int8 dot is exact, but an ambient
    # "highest" would make Mosaic emit contract_precision<fp32> on i8
    # operands and fail to compile ("Bad lhs type") — serving runs under
    # the model's matmul_precision context, which defaults to highest
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32,
                              precision=jax.lax.Precision.DEFAULT)
    return acc.astype(jnp.float32) * s * ws


def _kernel_int8(r_ref, w1q, w1s, w2q, w2s, b1, b2, g1, be1, g2, be2,
                 o_ref, *, pre_ln):
    """Serving int8: both FF matmuls run int8xint8->int32 on the MXU
    (2x the bf16 rate on v5e) with per-token dynamic activation scales
    quantized IN-KERNEL — the int8 tensors and the (R, FF) intermediate
    never touch HBM.  Same scale semantics as eval/quantize."""
    for lo, hi in _row_halves(r_ref.shape[0]):
        r = r_ref[lo:hi].astype(jnp.float32)
        x1 = _ln(r, g1[0], be1[0]) if pre_ln else r
        u = _int8_dot(x1, w1q[...], w1s[0]) + b1[0]
        h = _gelu_exact(u)
        z = x1 + _int8_dot(h, w2q[...], w2s[0]) + b2[0]
        o_ref[lo:hi] = _ln(z, g2[0], be2[0]).astype(o_ref.dtype)


def _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln,
                    quantized=False, want_residuals=False):
    """Forward kernel.  ``want_residuals`` (training) adds two outputs —
    u = x1@W1+b1 (pre-GELU) and z = x1 + gelu(u)@W2+b2 (pre-LN2), both
    f32 — so the native backward needs NO forward-recompute matmuls
    (the round-3 recompute cost two extra 3-pass matmuls per cell and
    made the fused path lose under grad at bf16x3)."""
    orig_shape = r.shape
    D = orig_shape[-1]
    FFD = w1.shape[1]
    x = r.reshape(-1, D)
    N = x.shape[0]
    R = min(_ROW_BLOCK, max(8, N))
    pad = (-N) % R
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mode = "int8" if quantized else _precision_mode(r.dtype)

    # stationary-weight VMEM budget: the weights are double-buffered by
    # the pipeline, so wide models overflow the 16 MB scoped limit
    # (measured: D=1024 f32 exceeds it by 5.2 MB).  Over budget -> the
    # XLA reference path (identical math); near budget -> smaller row
    # blocks.  int8's weights are 4x smaller than f32, which is why the
    # quantized mode keeps the fused path at widths the float modes lose.
    bytes_per = {"f32": 8, "bf16x3": 12, "bf16": 4, "int8": 2.5}[mode]
    wbytes = bytes_per * D * FFD
    if wbytes > (8 << 20):
        if mode == "int8":
            # preserve int8 numerics off-kernel (XLA int8 dense chain)
            from ...eval.quantize import _int8_dense_xla, _quantize_kernel
            xf = r.astype(jnp.float32)
            x1 = _ln(xf, g1, be1) if pre_ln else xf
            q1, s1 = _quantize_kernel(w1)
            q2, s2 = _quantize_kernel(w2)
            h = jax.nn.gelu(_int8_dense_xla(x1, q1, s1, b1, jnp.float32),
                            approximate=False)
            z = x1 + _int8_dense_xla(h, q2, s2, b2, jnp.float32)
            return _ln(z, g2, be2).astype(r.dtype)
        if want_residuals:
            return _ffn_reference_with_residuals(
                r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln)
        return ffn_reference(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln)
    if wbytes > (4 << 20):
        R = min(R, 128)
        x = r.reshape(-1, D)
        pad = (-N) % R
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))

    row_spec = pl.BlockSpec((R, D), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    vecs = [b1.reshape(1, FFD), b2.reshape(1, D), g1.reshape(1, D),
            be1.reshape(1, D), g2.reshape(1, D), be2.reshape(1, D)]
    vecs = [v.astype(jnp.float32) for v in vecs]
    vec_specs = [const_spec(v.shape) for v in vecs]

    if mode == "int8":
        # symmetric per-output-channel weight quantization, in-graph (a
        # few VPU passes over the weights, trivial next to the matmuls;
        # XLA folds it when the weights are trace constants)
        def wq(w):
            w = w.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                            1e-12) / 127.0
            q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            return q, s
        w1q, w1sc = wq(w1)
        w2q, w2sc = wq(w2)
        operands = [x, w1q, w1sc, w2q, w2sc, *vecs]
        specs = [row_spec, const_spec(w1q.shape), const_spec(w1sc.shape),
                 const_spec(w2q.shape), const_spec(w2sc.shape), *vec_specs]
        kernel = functools.partial(_kernel_int8, pre_ln=pre_ln)
    elif mode == "bf16x3":
        w1s = _stack_weight_3x(w1)
        w2s = _stack_weight_3x(w2)
        operands = [x, w1s, w2s, *vecs]
        specs = [row_spec, const_spec(w1s.shape), const_spec(w2s.shape),
                 *vec_specs]
        kernel = functools.partial(_kernel_split, pre_ln=pre_ln)
    else:
        wdt = jnp.bfloat16 if mode == "bf16" else jnp.float32
        operands = [x, w1.astype(wdt), w2.astype(wdt), *vecs]
        specs = [row_spec, const_spec(w1.shape), const_spec(w2.shape),
                 *vec_specs]
        kernel = functools.partial(_kernel_single, pre_ln=pre_ln,
                                   mode=mode)

    out_specs = row_spec
    out_shape = jax.ShapeDtypeStruct(x.shape, r.dtype)
    if want_residuals:
        u_spec = pl.BlockSpec((R, FFD), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        out_specs = (row_spec, u_spec, row_spec)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((x.shape[0], FFD), jnp.float32),
                     jax.ShapeDtypeStruct(x.shape, jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=(x.shape[0] // R,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*operands)
    if want_residuals:
        y, u, z = out
        if pad:
            y, u, z = y[:N], u[:N], z[:N]
        return y.reshape(orig_shape), u, z
    if pad:
        out = out[:N]
    return out.reshape(orig_shape)


def _ffn_reference_with_residuals(r, w1, b1, w2, b2, g1, be1, g2, be2,
                                  pre_ln):
    """XLA fallback of the want_residuals forward (same math)."""
    D = r.shape[-1]
    x = r.reshape(-1, D).astype(jnp.float32)
    x1 = _ln(x, g1, be1) if pre_ln else x
    u = jnp.dot(x1, w1) + b1
    h = jax.nn.gelu(u, approximate=False)
    z = x1 + jnp.dot(h, w2) + b2
    return _ln(z, g2, be2).astype(r.dtype).reshape(r.shape), u, z


# ---------------------------------------------------------------------------
# Native Pallas backward: recompute-in-VMEM + dW accumulation across cells
# ---------------------------------------------------------------------------

_BWD_ROW_BLOCK = int(_os.environ.get("KIT_FFN_BWD_ROW_BLOCK", "128"))


def _dot_parts(a_parts, b_parts, contract, mode):
    """Generic in-kernel dot over prepped parts (bf16 / bf16x3 / f32) —
    same strategy table as ops/pallas/attention._dot."""
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


def _prep_act(x, mode):
    if mode == "bf16":
        return (x.astype(jnp.bfloat16),)
    if mode == "bf16x3":
        return _split_hi_lo_kernel(x)
    return (x,)


def _ln_bwd(dy_affine, x, gamma, eps=LN_EPS):
    """Backward of y = norm(x)*gamma + beta given dy; returns
    (dx, dgamma_rows, dbeta_rows) with the d* summed over rows by the
    caller.  norm recomputed from x."""
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(v + eps)
    n = (x - m) * inv
    dn = dy_affine * gamma
    dx = (dn - jnp.mean(dn, axis=-1, keepdims=True)
          - n * jnp.mean(dn * n, axis=-1, keepdims=True)) * inv
    return dx, n


def _gelu_grad(u):
    """d/du [0.5 u (1 + erf(u/sqrt(2)))] = Phi(u) + u * phi(u)."""
    phi = jnp.exp(-0.5 * u * u) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf_approx(u * (2.0 ** -0.5)))
    return cdf + u * phi


def _ffn_bwd_kernel(r_ref, g_ref, *rest, pre_ln, mode, n_w, has_uz):
    if has_uz:
        u_ref, z_ref, rest = rest[0], rest[1], rest[2:]
    w_refs = rest[:n_w]
    b1r, b2r, g1r, be1r, g2r, be2r = rest[n_w:n_w + 6]
    (dr_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, dg1_ref, dbe1_ref,
     dg2_ref, dbe2_ref) = rest[n_w + 6:]
    per = n_w // 2
    w1p = tuple(r[...] for r in w_refs[:per])
    w2p = tuple(r[...] for r in w_refs[per:])

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dbe1_ref[...] = jnp.zeros_like(dbe1_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        dbe2_ref[...] = jnp.zeros_like(dbe2_ref)

    r = r_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    b1, b2 = b1r[0], b2r[0]
    g1, be1, g2, be2 = g1r[0], be1r[0], g2r[0], be2r[0]

    # --- forward values: saved residuals (training fwd) or recompute ----
    if pre_ln:
        m1 = jnp.mean(r, axis=-1, keepdims=True)
        v1 = jnp.mean((r - m1) * (r - m1), axis=-1, keepdims=True)
        inv1 = jax.lax.rsqrt(v1 + LN_EPS)
        n1 = (r - m1) * inv1
        x1 = n1 * g1 + be1
    else:
        x1 = r
    x1p = _prep_act(x1, mode)
    if has_uz:
        u = u_ref[...]
        h = _gelu_exact(u)          # VPU-only; exact same fn as forward
        hp = _prep_act(h, mode)
        z = z_ref[...]
    else:
        u = _dot_parts(x1p, w1p, ((1,), (0,)), mode) + b1
        h = _gelu_exact(u)
        hp = _prep_act(h, mode)
        z = x1 + _dot_parts(hp, w2p, ((1,), (0,)), mode) + b2

    # --- LN2 backward ----------------------------------------------------
    dz, n2 = _ln_bwd(g, z, g2)
    dg2_ref[...] += jnp.sum(g * n2, axis=0, keepdims=True)
    dbe2_ref[...] += jnp.sum(g, axis=0, keepdims=True)

    # --- second matmul ---------------------------------------------------
    dzp = _prep_act(dz, mode)
    db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dw2_ref[...] += _dot_parts(hp, dzp, ((0,), (0,)), mode)   # (FF, D)
    dh = _dot_parts(dzp, w2p, ((1,), (1,)), mode)             # (R, FF)

    # --- GELU + first matmul --------------------------------------------
    du = dh * _gelu_grad(u)
    dup = _prep_act(du, mode)
    db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dw1_ref[...] += _dot_parts(x1p, dup, ((0,), (0,)), mode)  # (D, FF)
    dx1 = _dot_parts(dup, w1p, ((1,), (1,)), mode) + dz

    # --- LN1 backward / passthrough -------------------------------------
    if pre_ln:
        dg1_ref[...] += jnp.sum(dx1 * n1, axis=0, keepdims=True)
        dbe1_ref[...] += jnp.sum(dx1, axis=0, keepdims=True)
        dn1 = dx1 * g1
        dr = (dn1 - jnp.mean(dn1, axis=-1, keepdims=True)
              - n1 * jnp.mean(dn1 * n1, axis=-1, keepdims=True)) * inv1
    else:
        dr = dx1
    dr_ref[...] = dr.astype(dr_ref.dtype)


def _ffn_bwd_pallas(r, g, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln, mode,
                    u=None, z=None):
    """Full-sublayer backward as ONE kernel.  With ``u``/``z`` residuals
    saved by the training forward there are NO forward-recompute matmuls
    — only the 4 gradient matmuls, with LN/GELU backward fused and the
    (R, FF) intermediates living in VMEM; weight/bias/LN gradients
    accumulate in VMEM across the sequentially-visited row cells.
    Without residuals the forward is recomputed in VMEM (2 extra
    matmuls) — the pre-round-4 behavior, kept as fallback."""
    orig_shape = r.shape
    D = orig_shape[-1]
    FFD = w1.shape[1]
    x = r.reshape(-1, D)
    gg = g.reshape(-1, D)
    N = x.shape[0]
    R = _BWD_ROW_BLOCK
    if mode == "bf16x3" and D * FFD >= (1 << 18):
        # bf16x3 triples the (R, FF) transient footprint (hi/lo splits of
        # u/h/du/dh) on top of the 8 MB of stationary weights + dW
        # accumulators; R=128 at the flagship width measured 23.4 MB of
        # scoped VMEM (limit 16).
        R = min(R, 64)
    R = min(R, max(8, N))
    pad = (-N) % R
    has_uz = u is not None
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        gg = jnp.pad(gg, ((0, pad), (0, 0)))
        if has_uz:
            u = jnp.pad(u, ((0, pad), (0, 0)))
            z = jnp.pad(z, ((0, pad), (0, 0)))

    if mode == "bf16x3":
        w1p = _split_hi_lo(w1.astype(jnp.float32))
        w2p = _split_hi_lo(w2.astype(jnp.float32))
    elif mode == "bf16":
        w1p = (w1.astype(jnp.bfloat16),)
        w2p = (w2.astype(jnp.bfloat16),)
    else:
        w1p = (w1.astype(jnp.float32),)
        w2p = (w2.astype(jnp.float32),)
    w_ops = [*w1p, *w2p]
    n_w = len(w_ops)

    vecs = [b1.reshape(1, FFD), b2.reshape(1, D), g1.reshape(1, D),
            be1.reshape(1, D), g2.reshape(1, D), be2.reshape(1, D)]
    vecs = [v.astype(jnp.float32) for v in vecs]

    row_spec = pl.BlockSpec((R, D), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, r.dtype),          # dr
        jax.ShapeDtypeStruct((D, FFD), jnp.float32),     # dW1
        jax.ShapeDtypeStruct((FFD, D), jnp.float32),     # dW2
        jax.ShapeDtypeStruct((1, FFD), jnp.float32),     # db1
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # db2
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dg1
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dbe1
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dg2
        jax.ShapeDtypeStruct((1, D), jnp.float32),       # dbe2
    ]
    out_specs = (row_spec, const_spec((D, FFD)), const_spec((FFD, D)),
                 const_spec((1, FFD)), const_spec((1, D)),
                 const_spec((1, D)), const_spec((1, D)),
                 const_spec((1, D)), const_spec((1, D)))

    uz_ops, uz_specs = [], []
    if has_uz:
        uz_ops = [u, z]
        uz_specs = [pl.BlockSpec((R, FFD), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM), row_spec]

    outs = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, pre_ln=pre_ln, mode=mode,
                          n_w=n_w, has_uz=has_uz),
        grid=(x.shape[0] // R,),
        in_specs=[row_spec, row_spec, *uz_specs,
                  *[const_spec(w.shape) for w in w_ops],
                  *[const_spec(v.shape) for v in vecs]],
        out_specs=out_specs,
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, gg, *uz_ops, *w_ops, *vecs)
    dr, dw1, dw2, db1, db2, dg1, dbe1, dg2, dbe2 = outs
    if pad:
        dr = dr[:N]
    dr = dr.reshape(orig_shape)
    zero_like = lambda a: jnp.zeros_like(a)
    if not pre_ln:
        dg1v, dbe1v = zero_like(g1), zero_like(be1)
    else:
        dg1v, dbe1v = dg1[0].astype(g1.dtype), dbe1[0].astype(be1.dtype)
    return (dr, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dg1v, dbe1v,
            dg2[0].astype(g2.dtype), dbe2[0].astype(be2.dtype))


# ---------------------------------------------------------------------------
# Two-kernel split backward: each kernel holds ONE weight (+ its dW
# accumulator) stationary, so the fixed VMEM cost is half the monolith's.
# This is what lets the NATIVE backward run at bf16x3 flagship width
# (256x2048), where the monolithic kernel's split weights + f32 dW
# accumulators measured 20.9-23.4 MB against the 16 MB scoped limit.
# The (N, FF) du hand-off between the kernels round-trips HBM once
# (~64 MB at B=64 T=128 — ~0.2 ms at v5e bandwidth), which the fused
# elementwise chains and in-VMEM intermediates more than buy back vs the
# residual-fed XLA backward.  Residual-fed only (requires saved u/z).
# ---------------------------------------------------------------------------


def _ffn_bwd_kernel_a(g_ref, z_ref, u_ref, *rest, mode, n_w2):
    """dz/dW2 half: LN2 backward, second-matmul gradients, GELU grad.
    Stationary: W2 parts + dW2 accumulator.  Emits du and dz rows."""
    w2_refs = rest[:n_w2]
    g2r = rest[n_w2]
    (du_ref, dz_ref, dw2_ref, db2_ref, dg2_ref, dbe2_ref) = rest[n_w2 + 1:]
    w2p = tuple(r[...] for r in w2_refs)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg2_ref[...] = jnp.zeros_like(dg2_ref)
        dbe2_ref[...] = jnp.zeros_like(dbe2_ref)

    g = g_ref[...].astype(jnp.float32)
    z = z_ref[...]
    u = u_ref[...]

    dz, n2 = _ln_bwd(g, z, g2r[0])
    dg2_ref[...] += jnp.sum(g * n2, axis=0, keepdims=True)
    dbe2_ref[...] += jnp.sum(g, axis=0, keepdims=True)

    h = _gelu_exact(u)                    # VPU-only (u is saved)
    hp = _prep_act(h, mode)
    dzp = _prep_act(dz, mode)
    db2_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dw2_ref[...] += _dot_parts(hp, dzp, ((0,), (0,)), mode)   # (FF, D)
    dh = _dot_parts(dzp, w2p, ((1,), (1,)), mode)             # (R, FF)
    du_ref[...] = dh * _gelu_grad(u)
    dz_ref[...] = dz


def _ffn_bwd_kernel_b(r_ref, du_ref, dz_ref, *rest, pre_ln, mode, n_w1):
    """dx/dW1 half: first-matmul gradients + LN1 backward.  Stationary:
    W1 parts + dW1 accumulator.  Consumes kernel A's du/dz rows."""
    w1_refs = rest[:n_w1]
    g1r, be1r = rest[n_w1:n_w1 + 2]
    (dr_ref, dw1_ref, db1_ref, dg1_ref, dbe1_ref) = rest[n_w1 + 2:]
    w1p = tuple(r[...] for r in w1_refs)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        dbe1_ref[...] = jnp.zeros_like(dbe1_ref)

    r = r_ref[...].astype(jnp.float32)
    du = du_ref[...]
    dz = dz_ref[...]
    g1, be1 = g1r[0], be1r[0]

    if pre_ln:
        m1 = jnp.mean(r, axis=-1, keepdims=True)
        v1 = jnp.mean((r - m1) * (r - m1), axis=-1, keepdims=True)
        inv1 = jax.lax.rsqrt(v1 + LN_EPS)
        n1 = (r - m1) * inv1
        x1 = n1 * g1 + be1
    else:
        x1 = r
    x1p = _prep_act(x1, mode)
    dup = _prep_act(du, mode)
    db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dw1_ref[...] += _dot_parts(x1p, dup, ((0,), (0,)), mode)  # (D, FF)
    dx1 = _dot_parts(dup, w1p, ((1,), (1,)), mode) + dz

    if pre_ln:
        dg1_ref[...] += jnp.sum(dx1 * n1, axis=0, keepdims=True)
        dbe1_ref[...] += jnp.sum(dx1, axis=0, keepdims=True)
        dn1 = dx1 * g1
        dr = (dn1 - jnp.mean(dn1, axis=-1, keepdims=True)
              - n1 * jnp.mean(dn1 * n1, axis=-1, keepdims=True)) * inv1
    else:
        dr = dx1
    dr_ref[...] = dr.astype(dr_ref.dtype)


def _split_bwd_fits(D, FFD, R, mode, budget=14 << 20) -> bool:
    """Explicit scoped-VMEM budget for the two split kernels (every
    fused kernel budgets its stationary bytes and falls back — repo
    rule).  Stationary (constant-index-map) operands: the weight parts
    (bf16 hi/lo under bf16x3) plus the f32 dW accumulator.  Row-block
    operands are double-buffered by Mosaic; bf16x3 adds the (R, 3*FF)
    hi/lo concat transients of _dot3.  Budget 14 MB of the 16 MB scoped
    limit, leaving headroom for Mosaic's own scratch."""
    per_part = 2 if mode in ("bf16", "bf16x3") else 4
    n_parts = 2 if mode == "bf16x3" else 1
    stationary = D * FFD * (per_part * n_parts + 4)
    rows = 2 * R * (3 * D + 2 * FFD) * 4
    transient = R * 3 * FFD * 2 * (3 if mode == "bf16x3" else 1)
    return stationary + rows + transient <= budget


def _ffn_bwd_pallas_split(r, g, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln,
                          mode, u, z):
    """Residual-fed two-kernel backward (see block comment above)."""
    assert u is not None and z is not None
    orig_shape = r.shape
    D = orig_shape[-1]
    FFD = w1.shape[1]
    x = r.reshape(-1, D)
    gg = g.reshape(-1, D)
    N = x.shape[0]
    R = _BWD_ROW_BLOCK
    if mode == "bf16x3" and D * FFD >= (1 << 18):
        # hi/lo splits of the (R, FF) transients still triple the row
        # footprint; with only half the stationary bytes per kernel,
        # R=64 keeps each kernel ~11 MB of scoped VMEM at 256x2048.
        R = min(R, 64)
    R = min(R, max(8, N))
    if not _split_bwd_fits(D, FFD, R, mode):
        return _ffn_bwd_xla_from_residuals(
            r, g, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln, u, z)
    pad = (-N) % R
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        gg = jnp.pad(gg, ((0, pad), (0, 0)))
        u = jnp.pad(u, ((0, pad), (0, 0)))
        z = jnp.pad(z, ((0, pad), (0, 0)))

    if mode == "bf16x3":
        w1p = _split_hi_lo(w1.astype(jnp.float32))
        w2p = _split_hi_lo(w2.astype(jnp.float32))
    elif mode == "bf16":
        w1p = (w1.astype(jnp.bfloat16),)
        w2p = (w2.astype(jnp.bfloat16),)
    else:
        w1p = (w1.astype(jnp.float32),)
        w2p = (w2.astype(jnp.float32),)

    row_spec = pl.BlockSpec((R, D), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ff_spec = pl.BlockSpec((R, FFD), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    grid = (x.shape[0] // R,)
    f32 = jnp.float32

    # ---- kernel A: LN2 + second matmul + GELU grad ----------------------
    a_out = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel_a, mode=mode, n_w2=len(w2p)),
        grid=grid,
        in_specs=[row_spec, row_spec, ff_spec,
                  *[const_spec(w.shape) for w in w2p],
                  const_spec((1, D))],
        out_specs=(ff_spec, row_spec, const_spec((FFD, D)),
                   const_spec((1, D)), const_spec((1, D)),
                   const_spec((1, D))),
        out_shape=(jax.ShapeDtypeStruct((x.shape[0], FFD), f32),  # du
                   jax.ShapeDtypeStruct(x.shape, f32),            # dz
                   jax.ShapeDtypeStruct((FFD, D), f32),           # dW2
                   jax.ShapeDtypeStruct((1, D), f32),             # db2
                   jax.ShapeDtypeStruct((1, D), f32),             # dg2
                   jax.ShapeDtypeStruct((1, D), f32)),            # dbe2
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(gg, z, u, *w2p, g2.reshape(1, D).astype(f32))
    du, dz, dw2, db2, dg2, dbe2 = a_out

    # ---- kernel B: first matmul + LN1 ------------------------------------
    b_out = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel_b, pre_ln=pre_ln, mode=mode,
                          n_w1=len(w1p)),
        grid=grid,
        in_specs=[row_spec, ff_spec, row_spec,
                  *[const_spec(w.shape) for w in w1p],
                  const_spec((1, D)), const_spec((1, D))],
        out_specs=(row_spec, const_spec((D, FFD)), const_spec((1, FFD)),
                   const_spec((1, D)), const_spec((1, D))),
        out_shape=(jax.ShapeDtypeStruct(x.shape, r.dtype),        # dr
                   jax.ShapeDtypeStruct((D, FFD), f32),           # dW1
                   jax.ShapeDtypeStruct((1, FFD), f32),           # db1
                   jax.ShapeDtypeStruct((1, D), f32),             # dg1
                   jax.ShapeDtypeStruct((1, D), f32)),            # dbe1
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, du, dz, *w1p, g1.reshape(1, D).astype(f32),
      be1.reshape(1, D).astype(f32))
    dr, dw1, db1, dg1, dbe1 = b_out

    if pad:
        dr = dr[:N]
    dr = dr.reshape(orig_shape)
    if not pre_ln:
        dg1v, dbe1v = jnp.zeros_like(g1), jnp.zeros_like(be1)
    else:
        dg1v, dbe1v = dg1[0].astype(g1.dtype), dbe1[0].astype(be1.dtype)
    return (dr, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            dg1v, dbe1v,
            dg2[0].astype(g2.dtype), dbe2[0].astype(be2.dtype))


def _ffn_bwd_xla_from_residuals(r, g, w1, b1, w2, b2, g1, be1, g2, be2,
                                pre_ln, u, z):
    """Residual-fed XLA backward: the saved u/z replace the forward
    recompute (whose 2 extra matmuls made the round-3 recompute VJP lose
    at bf16x3), and XLA's fusion handles the elementwise chains.  Used
    where the monolithic Pallas backward's fixed VMEM cost (split
    stationary weights + f32 dW accumulators, each double-buffered by
    the Mosaic pipeline) exceeds scoped VMEM — measured 20.9-23.4 MB at
    the flagship width under bf16x3 against the 16 MB limit."""
    D = r.shape[-1]
    x = r.reshape(-1, D).astype(jnp.float32)
    gg = g.reshape(-1, D).astype(jnp.float32)

    if pre_ln:
        m1 = jnp.mean(x, axis=-1, keepdims=True)
        v1 = jnp.mean((x - m1) * (x - m1), axis=-1, keepdims=True)
        inv1 = jax.lax.rsqrt(v1 + LN_EPS)
        n1 = (x - m1) * inv1
        x1 = n1 * g1 + be1
    else:
        x1 = x
    h = jax.nn.gelu(u, approximate=False)

    # LN2 backward from z
    m2 = jnp.mean(z, axis=-1, keepdims=True)
    v2 = jnp.mean((z - m2) * (z - m2), axis=-1, keepdims=True)
    inv2 = jax.lax.rsqrt(v2 + LN_EPS)
    n2 = (z - m2) * inv2
    dg2 = jnp.sum(gg * n2, axis=0)
    dbe2 = jnp.sum(gg, axis=0)
    dn2 = gg * g2
    dz = (dn2 - jnp.mean(dn2, axis=-1, keepdims=True)
          - n2 * jnp.mean(dn2 * n2, axis=-1, keepdims=True)) * inv2

    db2 = jnp.sum(dz, axis=0)
    dw2 = jnp.dot(h.T, dz)
    dh = jnp.dot(dz, w2.T)
    # exact-erf GELU derivative: Phi(u) + u * phi(u)
    phi = jnp.exp(-0.5 * u * u) * 0.3989422804014327
    cdf = 0.5 * (1.0 + jax.lax.erf(u * (2.0 ** -0.5)))
    du = dh * (cdf + u * phi)
    db1 = jnp.sum(du, axis=0)
    dw1 = jnp.dot(x1.T, du)
    dx1 = jnp.dot(du, w1.T) + dz

    if pre_ln:
        dg1 = jnp.sum(dx1 * n1, axis=0)
        dbe1 = jnp.sum(dx1, axis=0)
        dn1 = dx1 * g1
        dr = (dn1 - jnp.mean(dn1, axis=-1, keepdims=True)
              - n1 * jnp.mean(dn1 * n1, axis=-1, keepdims=True)) * inv1
    else:
        dg1, dbe1 = jnp.zeros_like(g1), jnp.zeros_like(be1)
        dr = dx1
    return (dr.reshape(r.shape).astype(r.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype), dg1.astype(g1.dtype),
            dbe1.astype(be1.dtype), dg2.astype(g2.dtype),
            dbe2.astype(be2.dtype))


def ffn_reference(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln=False):
    """Pure-XLA same math (backward path + CPU fallback + test oracle)."""
    x = r.astype(jnp.float32)
    x1 = _ln(x, g1, be1) if pre_ln else x
    h = jax.nn.gelu(jnp.dot(x1, w1) + b1, approximate=False)  # true erf
    z = x1 + jnp.dot(h, w2) + b2
    return _ln(z, g2, be2).astype(r.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_ffn(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln=False,
              quantized=False):
    """y = LN2(x1 + gelu(x1@W1+b1)@W2 + b2), x1 = LN1(r) if pre_ln else r.

    Forward runs the Pallas kernel; gradients follow the XLA reference
    implementation (identical math, XLA matmul numerics).  ``quantized``
    runs both matmuls int8-on-MXU with in-kernel dynamic activation
    scales (serving path; gradients still follow the float reference)."""
    return _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln,
                           quantized)


# save u/z residuals from the training forward so the native backward
# runs recompute-free ("1", default); "0" restores the round-3
# recompute-in-VMEM backward (A/B knob)
_BWD_SAVE = _os.environ.get("KIT_FFN_BWD_SAVE", "1") == "1"
# bf16x3 backward: residual-fed XLA backward (default) vs the two-kernel
# Pallas split ("1", opt-in A/B knob; see _ffn_bwd_pallas_split).  The
# split was briefly default in round 4 but measured a train-step
# REGRESSION on the chip: 31.9 ms / 257K frames/s (split) vs 29.3 ms /
# 279K (XLA residual-fed) at B=64 T=128 flagship bf16x3 — the two extra
# kernel launches + the f32 du/dz HBM hand-off between kernels A and B
# cost more than the in-kernel elementwise fusion saves, because XLA
# already fuses those chains into its gradient matmuls.
_BWD_SPLIT = _os.environ.get("KIT_FFN_BWD_SPLIT", "0") == "1"


def _bwd_native_ok(quantized, mode, w1) -> bool:
    from ...models.completer import _attention_platform
    return (not quantized and mode in ("bf16", "bf16x3")
            and _attention_platform() == "tpu"
            and w1.shape[0] * w1.shape[1] <= 600_000)


def _fused_ffn_vjp_fwd(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln,
                       quantized):
    mode = _precision_mode(r.dtype)
    if _bwd_native_ok(quantized, mode, w1) and _BWD_SAVE:
        out, u, z = _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2,
                                    pre_ln, quantized, want_residuals=True)
        return out, (r, w1, b1, w2, b2, g1, be1, g2, be2, u, z)
    out = _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln,
                          quantized)
    return out, (r, w1, b1, w2, b2, g1, be1, g2, be2)


def _fused_ffn_vjp_bwd(pre_ln, quantized, res, g):
    r, w1, b1, w2, b2, g1, be1, g2, be2 = res[:9]
    u, z = (res[9], res[10]) if len(res) > 9 else (None, None)
    mode = _precision_mode(r.dtype)
    if _bwd_native_ok(quantized, mode, w1):
        if mode == "bf16" and w1.shape[0] * w1.shape[1] * 6 <= (4 << 20):
            # native fused backward: forward values come from the saved
            # u/z residuals (recompute-free — 4 gradient matmuls only);
            # dW/db/dLN accumulated across row cells.  Only bf16 fits:
            # the split weights + f32 dW accumulators are each
            # double-buffered by the pipeline, and the bf16x3 form's
            # fixed cost alone exceeds the 16 MB scoped-VMEM limit at
            # the flagship width (measured 20.9 MB).
            return _ffn_bwd_pallas(r, g, w1, b1, w2, b2, g1, be1, g2,
                                   be2, pre_ln, mode, u, z)
        if u is not None:
            if _BWD_SPLIT:
                # two-kernel native split: halved stationary VMEM fits
                # bf16x3 at the flagship width (the monolith doesn't),
                # recompute-free, elementwise chains fused in-kernel.
                return _ffn_bwd_pallas_split(
                    r, g, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln,
                    mode, u, z)
            # residual-fed XLA backward: no forward-recompute matmuls;
            # ambient precision gives the XLA matmuls the same bf16x3
            # error model as the forward kernel.
            return _ffn_bwd_xla_from_residuals(
                r, g, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln, u, z)
    _, vjp = jax.vjp(
        lambda *a: ffn_reference(*a, pre_ln=pre_ln), r, w1, b1, w2, b2,
        g1, be1, g2, be2)
    return vjp(g)


fused_ffn.defvjp(_fused_ffn_vjp_fwd, _fused_ffn_vjp_bwd)
