"""End-to-end forward throughput across sequence lengths (round-4 data
for the RESULTS.md crossover table).

At each T the "auto" kernels resolve differently:
  T <= 256  -> merged whole-layer kernels (layer_fused._MAX_T = 256)
  T <= 512  -> attention-SUBLAYER kernels (attn_sublayer._MAX_T = 512)
  T  > 512  -> per-op fused attention (query-streaming grid) + fused FF

Per-dispatch host overhead through the tunnel is ~5 ms (see
train_step_bench), so steps are chained through a data dependency and
timed with boundary syncs only (the bench.py methodology).

Usage: python benchmarks/long_t_bench.py [--precision high] [--steps 6]
Prints one JSON line per (B, T) configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="high",
                    choices=["highest", "high", "default"])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--configs", default="256x128,64x256,32x512,16x1024,8x2048",
                    help="comma-separated BxT pairs (equal token budget)")
    args = ap.parse_args()

    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.ops.masks import (
        attention_bias)
    from keypoints_interpolation_transformer_tpu.utils.profiling import (
        StepTimer)

    model = KeypointCompleter(hidden_dim=256, num_layers=6, num_heads=8)
    rng = np.random.default_rng(0)

    for spec in args.configs.split(","):
        B, T = (int(v) for v in spec.split("x"))
        clean = jnp.asarray(rng.uniform(0.2, 0.8, (B, T, 54, 2)),
                            jnp.float32)
        miss = jnp.asarray(rng.uniform(size=(B, T)) < 0.3, jnp.float32)
        masked = jnp.where(miss[..., None, None] > 0, 0.0, clean)

        with jax.default_matmul_precision(args.precision):
            params = model.init(jax.random.key(0), masked[:, :8],
                                masked[:, :8])

            def fwd(params, x):
                bias = attention_bias("repeat-inc", miss, T)
                return model.apply(params, x, clean, src_frame_mask=miss,
                                   src_bias=bias, tgt_bias=bias)

            f = jax.jit(fwd)
            timer = StepTimer(warmup=1)
            x = masked
            for _ in range(args.steps + 1):
                x = f(params, x)
                timer.step(x, frames=B * T)
            s = timer.summary()
        print(json.dumps({
            "B": B, "T": T, "precision": args.precision,
            "ms_per_fwd": round(s["sec_per_step"] * 1e3, 3),
            "frames_per_sec": round(s["frames_per_sec"], 1)}))


if __name__ == "__main__":
    main()
