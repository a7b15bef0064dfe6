"""Int8 inference quantization for the serving path.

No reference counterpart (the reference serves nothing); this is a
TPU-native serving extension: v5e MXUs run int8 x int8 -> int32 matmuls
at twice the bf16 rate, so weight+activation int8 halves the matmul cost
of the forward pass at a small accuracy cost.

Mechanism: every ``nn.Dense`` in the model is intercepted at apply time
(``flax.linen.intercept_methods`` — no model changes, no re-derived
forward).  Weights are pre-quantized once per checkpoint with symmetric
per-output-channel scales; activations are quantized dynamically with a
symmetric per-token scale.  The dot runs int8 with an int32 accumulator
(XLA lowers this onto the MXU's native int8 path); bias add and
everything between the matmuls stays in the model's float dtype, so
norms/softmax/gates are untouched.

Accuracy is a deployment decision: `Inpainter(..., quantize="int8")`
selects it, and `quantization_error()` reports the masked-frame MPJPE
delta vs the float forward so callers can gate (RESULTS.md records the
measured delta and speedup at the flagship shape).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _quantize_kernel(kernel) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a (in, out)
    Dense kernel."""
    kernel = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale[0]                      # (in, out) int8, (out,) f32


def quantize_dense_table(params) -> Dict[str, Tuple]:
    """{'/'-joined module path: (kernel_int8, scale)} for every Dense
    kernel in a parameter pytree."""
    table: Dict[str, Tuple] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 2:
                table["/".join(path)] = _quantize_kernel(tree["kernel"])
            for k, v in tree.items():
                walk(v, path + (k,))

    root = params.get("params", params)
    walk(root, ())
    return table


def _int8_dense_xla(x, kernel_q, w_scale, bias, out_dtype):
    """XLA form (CPU fallback + numerical oracle for the fused kernel)."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-12)
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    # DEFAULT precision pinned: integer dots are exact; an inherited
    # ambient "highest" is meaningless for i8 and breaks Mosaic lowering
    # in the kernel twins of this math (see ops/pallas/ffn._int8_dot)
    acc = jax.lax.dot_general(xq, kernel_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32,
                              precision=jax.lax.Precision.DEFAULT)
    y = acc.astype(jnp.float32) * x_scale * w_scale[None, :]
    if bias is not None:
        y = y + bias[None, :].astype(jnp.float32)
    return y.reshape(*shape[:-1], kernel_q.shape[1]).astype(out_dtype)


def _int8_dense(x, kernel_q, w_scale, bias, out_dtype):
    """y = dequant(int8(x) @ kernel_q) + bias with per-token activation
    scales; accumulation in int32 on the MXU.  On TPU the whole chain
    (dynamic quantization + matmul + dequant) runs as one Pallas kernel
    (ops/pallas/int8_matmul.py) so the int8 tensor never touches HBM."""
    from ..models.completer import _attention_platform

    if _attention_platform() == "tpu":
        from ..ops.pallas.int8_matmul import fused_int8_dense
        return fused_int8_dense(x, kernel_q, w_scale, bias, out_dtype)
    return _int8_dense_xla(x, kernel_q, w_scale, bias, out_dtype)


def int8_interceptor(table: Dict[str, Tuple]):
    """flax method interceptor replacing quantized Dense calls."""

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        name = getattr(context.orig_method, "__name__",
                       getattr(getattr(context.orig_method, "func", None),
                               "__name__", ""))
        if (isinstance(mod, nn.Dense) and name in ("__call__", "_call")
                and "/".join(mod.path) in table):
            kernel_q, w_scale = table["/".join(mod.path)]
            bias = (mod.variables["params"].get("bias")
                    if mod.use_bias else None)
            out_dtype = args[0].dtype
            return _int8_dense(args[0], kernel_q, w_scale, bias, out_dtype)
        return next_fn(*args, **kwargs)

    return interceptor


@contextlib.contextmanager
def int8_dense_calls(table: Dict[str, Tuple]):
    """Context manager: within it, model.apply uses int8 Dense matmuls."""
    with nn.intercept_methods(int8_interceptor(table)):
        yield


def quantization_error(model, params, table, example_inputs,
                       frame_mask=None, **apply_kwargs) -> float:
    """MPJPE delta of the int8 forward vs the float forward on the example
    batch: mean over keypoints of the per-point Euclidean distance between
    the two (B, T, K, 2) outputs.  ``frame_mask`` (B, T), 1 = missing,
    restricts the mean to masked frames — the frames the model actually
    fills — matching the bench.py / RESULTS.md parity-gate metric."""
    ref = model.apply(params, *example_inputs, **apply_kwargs)
    with int8_dense_calls(table):
        got = model.apply(params, *example_inputs, **apply_kwargs)
    d = jnp.linalg.norm(got.astype(jnp.float32) - ref.astype(jnp.float32),
                        axis=-1)                          # (B, T, K)
    if frame_mask is not None:
        w = jnp.asarray(frame_mask, jnp.float32)[:, :, None]
        return float(jnp.sum(d * w) / jnp.maximum(
            jnp.sum(w) * d.shape[-1], 1.0))
    return float(jnp.mean(d))
