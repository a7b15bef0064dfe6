"""Per-segment profile of the flagship inference forward (the bench.py
workload): where do the milliseconds go at B=256, T=128, 256/6/8?

Times, on the real chip and per precision:

  * full      — the exact bench.py forward (model + composite)
  * mm_only   — the model's matmul skeleton alone (every Dense + the
                attention contractions at identical shapes) = the MXU
                roofline for this architecture
  * ff        — one encoder FF sublayer chain x 12 (linear1/gelu/linear2
                + residual + LayerNorm), the FLOP bulk
  * attn      — one self-attention sublayer x 18 (qkv proj, fused
                attention, out proj, residual + LN)
  * pointwise — the pre/post chains (token_norm, PE adds, SwiGLU x3,
                swish gate, head)

Usage: python benchmarks/profile_step.py [--precision high] [--steps 8]
Writes benchmarks/profile_step.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, K = 256, 128, 54
D, LAYERS, HEADS, FF = 256, 6, 8, 2048


def timed(fn, args, steps, chain_idx=0):
    """Steady-state ms/step with async-safe chaining: the chained arg is
    replaced by (a cast of) the previous output so steps serialize."""
    import jax
    import jax.numpy as jnp

    from keypoints_interpolation_transformer_tpu.utils.profiling import (
        StepTimer)

    f = jax.jit(fn)
    timer = StepTimer(warmup=2)
    args = list(args)
    for _ in range(steps + 2):
        out = f(*args)
        head = out[0] if isinstance(out, tuple) else out
        carry = head.reshape(args[chain_idx].shape) \
            if head.size == args[chain_idx].size else \
            args[chain_idx] + jnp.asarray(head.ravel()[0], args[chain_idx].dtype) * 0
        args[chain_idx] = carry
        timer.step(out)
    return timer.summary()["sec_per_step"] * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="high",
                    choices=["highest", "high", "default"])
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.models.layers import (
        token_norm)
    from keypoints_interpolation_transformer_tpu.ops.losses import (
        composite_prediction)
    from keypoints_interpolation_transformer_tpu.ops.pallas.attention import (
        fused_attention)

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    clean = jnp.asarray(rng.uniform(0.2, 0.8, (B, T, K, 2)), jnp.float32)
    miss = jnp.asarray((rng.uniform(size=(B, T)) < 0.3), jnp.float32)
    masked = jnp.where(miss[..., None, None] > 0, 0.0, clean)

    model = KeypointCompleter(hidden_dim=D, num_layers=LAYERS,
                              num_heads=HEADS)
    params = model.init(jax.random.key(0), masked[:, :8], masked[:, :8])

    x2 = jax.random.normal(key, (B, T, D), jnp.float32)
    w1 = jax.random.normal(key, (D, FF), jnp.float32) * 0.02
    b1 = jnp.zeros((FF,), jnp.float32)
    w2 = jax.random.normal(key, (FF, D), jnp.float32) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)
    wd = jax.random.normal(key, (D, D), jnp.float32) * 0.05
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)

    def ln(x, gamma, beta, eps=1e-5):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * gamma + beta

    def full(params, masked, clean, miss):
        pred = model.apply(params, masked, clean, src_frame_mask=miss,
                           tgt_frame_mask=miss)
        return composite_prediction(pred, clean, miss)

    def ff_stack(x):
        for _ in range(2 * LAYERS):
            h = jnp.dot(x, w1) + b1
            h = jax.nn.gelu(h, approximate=False)
            y = jnp.dot(h, w2) + b2
            x = ln(x + y, g, be)
        return x

    def attn_stack(x, miss):
        for _ in range(3 * LAYERS):  # 6 enc self + 6 dec self + 6 cross
            q = jnp.dot(x, wd).reshape(B, T, HEADS, D // HEADS)
            k = jnp.dot(x, wd).reshape(B, T, HEADS, D // HEADS)
            v = jnp.dot(x, wd).reshape(B, T, HEADS, D // HEADS)
            o = fused_attention(q, k, v, miss, None, "repeat-inc", True)
            o = jnp.dot(o.reshape(B, T, D), wd)
            x = ln(x + o, g, be)
        return x

    def mm_only(x):
        # every Dense in the model at its true shape, no elementwise:
        # per layer: enc(q,k,v,o + ff1,ff2) + dec(2x qkvo + ff1,ff2)
        for _ in range(LAYERS):
            for _ in range(4 + 8):          # qkvo enc + 2x qkvo dec
                x = jnp.dot(x, wd)
            for _ in range(2):              # enc + dec FF
                h = jnp.dot(x, w1)
                x = jnp.dot(h, w2)
        return x

    def pointwise(x_kp):
        # pre: 2x (embed Dense, token_norm, PE add, learned add, SwiGLU)
        # post: SwiGLU, token_norm residual, swish, head Dense
        flat = x_kp.reshape(B, T, K * 2)
        we = jax.random.normal(key, (K * 2, D), jnp.float32) * 0.05
        wh = jax.random.normal(key, (D, K * 2), jnp.float32) * 0.05
        pe = jax.random.normal(key, (T, D), jnp.float32)
        outs = []
        for _ in range(2):
            e = jnp.dot(flat, we)
            n = token_norm(e) + pe + 0.1
            s = jnp.dot(n, wd) * jax.nn.sigmoid(jnp.dot(n, wd))
            outs.append(jnp.dot(s, wd))
        dec = outs[0] + outs[1]
        s = jnp.dot(dec, wd) * jax.nn.sigmoid(jnp.dot(dec, wd))
        dec = token_norm(jnp.dot(s, wd) + outs[1])
        dec = dec * jax.nn.sigmoid(dec)
        return jnp.dot(dec, wh)

    from keypoints_interpolation_transformer_tpu.ops.pallas.ffn import (
        fused_ffn)

    model_ffp = KeypointCompleter(hidden_dim=D, num_layers=LAYERS,
                                  num_heads=HEADS, ff_impl="pallas")

    def full_ffpallas(params, masked, clean, miss):
        pred = model_ffp.apply(params, masked, clean, src_frame_mask=miss,
                               tgt_frame_mask=miss)
        return composite_prediction(pred, clean, miss)

    def ff_fused_stack(x):
        for _ in range(2 * LAYERS):
            x = fused_ffn(x, w1, b1, w2, b2, g, be, g, be, False)
        return x

    rows = {}
    with jax.default_matmul_precision(args.precision):
        rows["full"] = timed(full, (params, masked, clean, miss),
                             args.steps, chain_idx=1)
        rows["full_ffpallas"] = timed(
            full_ffpallas, (params, masked, clean, miss), args.steps,
            chain_idx=1)
        rows["mm_only"] = timed(mm_only, (x2,), args.steps)
        rows["ff_x12"] = timed(ff_stack, (x2,), args.steps)
        rows["ff_fused_x12"] = timed(ff_fused_stack, (x2,), args.steps)
        rows["attn_x18"] = timed(attn_stack, (x2, miss), args.steps)
        rows["pointwise"] = timed(pointwise, (masked,), args.steps)

    rows["accounted"] = rows["ff_x12"] + rows["attn_x18"] + rows["pointwise"]
    rows["precision"] = args.precision
    rows["frames_per_sec_full"] = B * T / (rows["full"] / 1e3)
    rows["frames_per_sec_ffpallas"] = B * T / (rows["full_ffpallas"] / 1e3)
    print(json.dumps(rows, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"profile_step_{args.precision}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
