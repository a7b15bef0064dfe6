"""Pallas fused masked Euclidean loss.

One kernel instance per video computes the frame-weighted mean of squared
keypoint euclidean distances (the reference EuclideanLoss,
euclidean_loss.py:4-17, extended with padding weights) entirely in VMEM —
diff, square, pair-sum, mask, and both reductions fused.

Differentiable via custom VJP (the gradient is the closed form
2 (pred - target) * w / (count)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _loss_kernel(p_ref, t_ref, w_ref, num_ref, den_ref, *, k: int):
    d = p_ref[0] - t_ref[0]              # (T, K*2)
    sq = d * d
    w = w_ref[0, 0][:, None]             # (T, 1)
    num_ref[0, 0] = jnp.sum(sq * w)
    den_ref[0, 0] = jnp.sum(w) * k


def _fwd(pred, target, frame_weight):
    B, T, K, C = pred.shape
    p = pred.reshape(B, T, K * C)
    t = target.reshape(B, T, K * C)
    w = frame_weight[:, None, :]

    blk = pl.BlockSpec((1, T, K * C), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    scl = pl.BlockSpec((1, 1), lambda b: (b, 0),
                       memory_space=pltpu.SMEM)
    num, den = pl.pallas_call(
        functools.partial(_loss_kernel, k=K),
        grid=(B,),
        in_specs=[blk, blk, vec],
        out_specs=(scl, scl),
        out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)),
    )(p, t, w.astype(p.dtype))
    return num[:, 0] / jnp.maximum(den[:, 0], 1.0)


@jax.custom_vjp
def fused_euclidean_loss(pred, target, frame_weight):
    """(B, T, K, 2) x2 + (B, T) -> (B,) per-video euclidean losses."""
    return _fwd(pred, target, frame_weight)


def _vjp_fwd(pred, target, frame_weight):
    return _fwd(pred, target, frame_weight), (pred, target, frame_weight)


def _vjp_bwd(res, g):
    pred, target, w = res
    K = pred.shape[2]
    den = jnp.maximum(jnp.sum(w, axis=-1) * K, 1.0)      # (B,)
    scale = (g / den)[:, None, None, None]
    dp = 2.0 * (pred - target) * w[..., None, None] * scale
    return dp.astype(pred.dtype), (-dp).astype(target.dtype), None


fused_euclidean_loss.defvjp(_vjp_fwd, _vjp_bwd)
