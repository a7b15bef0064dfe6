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
  * Backward is the XLA recompute of the same math via jax.custom_vjp —
    gradient numerics follow the XLA path; the forward win also applies
    to the train step's forward half.
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


def _dot3(a, b_hi, b_lo):
    """bf16x3: f32 a against pre-split weight, 3 native bf16 MXU passes."""
    a_hi, a_lo = _split_hi_lo_kernel(a)
    d = functools.partial(jax.lax.dot_general,
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _dot1(a, b, precision):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _ln(x, gamma, beta, eps=LN_EPS):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * gamma + beta


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — two orders below the bf16x3 dot noise floor).  Mosaic has no
    erf lowering (NotImplementedError: primitive erf), so the exact-erf
    GELU the reference uses (torch activation='gelu') is evaluated with
    this VPU-friendly form in-kernel; the XLA reference/backward path
    keeps the true erf."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    # torch "gelu" is the exact erf form (model.py:87 activation='gelu')
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _body(x1, r, w1_parts, w2_parts, b1, b2, g2, be2, mode):
    if mode == "bf16x3":
        u = _dot3(x1, *w1_parts) + b1
        h = _gelu_exact(u)
        z = x1 + _dot3(h, *w2_parts) + b2
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
    return _ln(z, g2, be2)


def _kernel_split(r_ref, w1h, w1l, w2h, w2l, b1, b2, g1, be1, g2, be2,
                  o_ref, *, pre_ln):
    r = r_ref[...].astype(jnp.float32)
    x1 = _ln(r, g1[0], be1[0]) if pre_ln else r
    o_ref[...] = _body(x1, r, (w1h[...], w1l[...]), (w2h[...], w2l[...]),
                       b1[0], b2[0], g2[0], be2[0],
                       "bf16x3").astype(o_ref.dtype)


def _kernel_single(r_ref, w1, w2, b1, b2, g1, be1, g2, be2, o_ref, *,
                   pre_ln, mode):
    r = r_ref[...].astype(jnp.float32)
    x1 = _ln(r, g1[0], be1[0]) if pre_ln else r
    o_ref[...] = _body(x1, r, (w1[...],), (w2[...],),
                       b1[0], b2[0], g2[0], be2[0], mode).astype(o_ref.dtype)


def _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln):
    orig_shape = r.shape
    D = orig_shape[-1]
    FFD = w1.shape[1]
    x = r.reshape(-1, D)
    N = x.shape[0]
    R = min(_ROW_BLOCK, max(8, N))
    pad = (-N) % R
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mode = _precision_mode(r.dtype)

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

    if mode == "bf16x3":
        w1h, w1l = _split_hi_lo(w1.astype(jnp.float32))
        w2h, w2l = _split_hi_lo(w2.astype(jnp.float32))
        operands = [x, w1h, w1l, w2h, w2l, *vecs]
        specs = [row_spec, const_spec(w1.shape), const_spec(w1.shape),
                 const_spec(w2.shape), const_spec(w2.shape), *vec_specs]
        kernel = functools.partial(_kernel_split, pre_ln=pre_ln)
    else:
        wdt = jnp.bfloat16 if mode == "bf16" else jnp.float32
        operands = [x, w1.astype(wdt), w2.astype(wdt), *vecs]
        specs = [row_spec, const_spec(w1.shape), const_spec(w2.shape),
                 *vec_specs]
        kernel = functools.partial(_kernel_single, pre_ln=pre_ln,
                                   mode=mode)

    out = pl.pallas_call(
        kernel,
        grid=(x.shape[0] // R,),
        in_specs=specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, r.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*operands)
    if pad:
        out = out[:N]
    return out.reshape(orig_shape)


def ffn_reference(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln=False):
    """Pure-XLA same math (backward path + CPU fallback + test oracle)."""
    x = r.astype(jnp.float32)
    x1 = _ln(x, g1, be1) if pre_ln else x
    h = jax.nn.gelu(jnp.dot(x1, w1) + b1, approximate=False)  # true erf
    z = x1 + jnp.dot(h, w2) + b2
    return _ln(z, g2, be2).astype(r.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_ffn(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln=False):
    """y = LN2(x1 + gelu(x1@W1+b1)@W2 + b2), x1 = LN1(r) if pre_ln else r.

    Forward runs the Pallas kernel; gradients follow the XLA reference
    implementation (identical math, XLA matmul numerics)."""
    return _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln)


def _fused_ffn_vjp_fwd(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln):
    out = _ffn_fwd_pallas(r, w1, b1, w2, b2, g1, be1, g2, be2, pre_ln)
    return out, (r, w1, b1, w2, b2, g1, be1, g2, be2)


def _fused_ffn_vjp_bwd(pre_ln, res, g):
    r, w1, b1, w2, b2, g1, be1, g2, be2 = res
    _, vjp = jax.vjp(
        lambda *a: ffn_reference(*a, pre_ln=pre_ln), r, w1, b1, w2, b2,
        g1, be1, g2, be2)
    return vjp(g)


fused_ffn.defvjp(_fused_ffn_vjp_fwd, _fused_ffn_vjp_bwd)
