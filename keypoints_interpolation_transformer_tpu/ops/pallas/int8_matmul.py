"""Pallas TPU fused dynamic-quantize int8 dense.

The round-2 measurement (RESULTS.md int8 table) showed per-token
activation quantization (abs-max + round/clip on the VPU, as separate
XLA ops with HBM round-trips of the int8 tensor) eating the int8 MXU
advantage at the flagship width.  This kernel fuses the whole chain —

    s  = max(|x_row|) / 127          (dynamic per-token scale)
    xq = clip(round(x / s))          (int8, lives only in VMEM)
    y  = (xq @ Wq) * s * w_scale + b (int32 MXU accumulation)

— into one row-blocked, weight-stationary pass: HBM sees the f32 rows
in and the f32 rows out, nothing else.  Weights are pre-quantized once
per checkpoint (eval/quantize._quantize_kernel, symmetric
per-output-channel scales).

Used by eval/quantize._int8_dense on the TPU backend; the XLA form
remains the fallback (CPU, odd shapes) and the numerical oracle — both
compute identical math, tested against each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 512


def _kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                    # (R, K)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)          # (R, 1)
    xq = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
    # DEFAULT precision pinned: ambient "highest" makes Mosaic emit
    # contract_precision<fp32> on i8 operands and fail ("Bad lhs type")
    acc = jax.lax.dot_general(xq, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32,
                              precision=jax.lax.Precision.DEFAULT)
    y = acc.astype(jnp.float32) * s * ws_ref[0] + b_ref[0]
    o_ref[...] = y.astype(o_ref.dtype)


def fused_int8_dense(x, kernel_q, w_scale, bias, out_dtype=None):
    """y = dequant(int8(x) @ kernel_q) + bias, quantization fused in-VMEM.

    x: (..., K) float; kernel_q: (K, N) int8; w_scale: (N,) f32;
    bias: (N,) or None.
    """
    out_dtype = out_dtype or x.dtype
    shape = x.shape
    K = shape[-1]
    N = kernel_q.shape[1]
    x2 = x.reshape(-1, K)
    n_rows = x2.shape[0]
    # row block must be a sublane multiple (8) for Mosaic tiling; rows
    # are padded up to a block multiple below
    R = min(_ROW_BLOCK, ((max(8, n_rows) + 7) // 8) * 8)
    pad = (-n_rows) % R
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    b = (bias if bias is not None else jnp.zeros((N,), jnp.float32))

    row_in = pl.BlockSpec((R, K), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    row_out = pl.BlockSpec((R, N), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(x2.shape[0] // R,),
        in_specs=[row_in, const(kernel_q.shape), const((1, N)),
                  const((1, N))],
        out_specs=row_out,
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x2, kernel_q, w_scale.reshape(1, N).astype(jnp.float32),
      jnp.asarray(b, jnp.float32).reshape(1, N))
    if pad:
        out = out[:n_rows]
    return out.reshape(*shape[:-1], N)
