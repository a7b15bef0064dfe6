"""Steady-state a1 train-step throughput at the flagship configuration.

Times the full jitted step (corruption + fwd + bwd + Adam) on the real
chip with async-safe chaining (the params feed the next step, and the
timer closes each step with a host readback — see utils/profiling).

Usage: python benchmarks/train_step_bench.py [--precision high]
       [--batch 64] [--t 128] [--steps 10]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--ff_impl", default=None,
                    help="override ModelConfig.ff_impl (e.g. pallas to "
                         "force the fused FF kernel + its native Pallas "
                         "backward in the train step)")
    args = ap.parse_args()

    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from keypoints_interpolation_transformer_tpu.train.state import TrainState
    from keypoints_interpolation_transformer_tpu.train.steps import (
        build_model, make_train_step)
    from keypoints_interpolation_transformer_tpu.utils.config import Config
    from keypoints_interpolation_transformer_tpu.utils.profiling import (
        StepTimer)

    B, T = args.batch, args.t
    cfg = Config()
    cfg.model.hidden_dim, cfg.model.num_heads, cfg.model.num_layers = 256, 8, 6
    if args.ff_impl:
        cfg.model.ff_impl = args.ff_impl
    model = build_model(cfg.model, "plain", for_training=True)

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.2, 0.8, (B, T, 54, 2)), jnp.float32)
    length = jnp.full((B,), T, jnp.int32)
    weight = jnp.ones((B,), jnp.float32)

    with jax.default_matmul_precision(args.precision):
        params = model.init(jax.random.key(0), clean[:, :8],
                            clean[:, :8])["params"]
        state = TrainState.create(params)
        step = jax.jit(make_train_step(model, cfg, stats=None))
        timer = StepTimer(warmup=2)
        key = jax.random.key(1)
        for i in range(args.steps + 2):
            key, sub = jax.random.split(key)
            state, metrics = step(state, clean, length, weight, sub,
                                  jnp.float32(1e-4))
            timer.step(metrics["loss"], frames=B * T)
        s = timer.summary()
    out = {"ms_per_step": round(s["sec_per_step"] * 1e3, 3),
           "frames_per_sec": round(s["frames_per_sec"], 1),
           "precision": args.precision, "batch": B, "t": T,
           "loss_finite": bool(np.isfinite(float(metrics["loss"]))),
           "ff_impl": args.ff_impl or "auto(training->xla)"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
