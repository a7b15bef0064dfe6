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
    ap.add_argument("--segment", default="full",
                    choices=["full", "fwd", "pre"],
                    help="time the full step, the forward-only loss, or "
                         "just the on-device corruption preprocessing")
    ap.add_argument("--chain", type=int, default=10,
                    help="steps chained inside ONE jitted lax.scan per "
                         "dispatch: the tunnel costs ~5 ms of host "
                         "overhead PER CALL (measured on a trivial jit), "
                         "so per-call timing reports dispatch latency, "
                         "not device throughput.  1 = legacy per-call "
                         "timing.")
    ap.add_argument("--attn_sublayer_fusion", default=None,
                    choices=["on", "off"],
                    help="override ModelConfig.attn_sublayer_fusion")
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
    cfg.model.matmul_precision = args.precision  # build_model reads the cfg
    if args.ff_impl:
        cfg.model.ff_impl = args.ff_impl
    if args.attn_sublayer_fusion:
        cfg.model.attn_sublayer_fusion = args.attn_sublayer_fusion
    model = build_model(cfg.model, "plain", for_training=True)

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.2, 0.8, (B, T, 54, 2)), jnp.float32)
    length = jnp.full((B,), T, jnp.int32)
    weight = jnp.ones((B,), jnp.float32)

    with jax.default_matmul_precision(args.precision):
        params = model.init(jax.random.key(0), clean[:, :8],
                            clean[:, :8])["params"]
        state = TrainState.create(params)
        if args.segment == "full":
            inner = make_train_step(model, cfg, stats=None)
            if args.chain > 1:
                def chained(state, keys, clean, length, weight, lr):
                    def body(st, k):
                        st, m = inner(st, clean, length, weight, k, lr)
                        return st, m["loss"]
                    return jax.lax.scan(body, state, keys)
                chained_jit = jax.jit(chained, donate_argnums=(0,))

                def step(state, clean, length, weight, key, lr):
                    keys = jax.random.split(key, args.chain)
                    state, losses = chained_jit(state, keys, clean,
                                                length, weight, lr)
                    return state, {"loss": losses[-1]}
            else:
                step = jax.jit(inner)
        else:
            from keypoints_interpolation_transformer_tpu.train.steps import (
                completer_forward, corrupt_batch, make_train_criterion,
                shift_streams)

            def fwd(params, clean, length, weight, key, lr):
                y, inputs, mask = corrupt_batch(
                    key, clean, length, augment=True, aug_prob=0.5,
                    is_random_missing=False, dataset_name="all",
                    stats=None)
                x, x_no, x_mask, y_mask, valid = shift_streams(
                    inputs, mask, length)
                if args.segment == "pre":
                    return jnp.sum(x) + jnp.sum(y_mask) + jnp.sum(y)
                pred = completer_forward(model, params, x, x_no, x_mask,
                                         y_mask, valid)
                crit = make_train_criterion("a1", False)
                pv = crit(pred, y, valid)
                return jnp.sum(pv * weight) / jnp.sum(weight)

            fwd_jit = jax.jit(fwd)

            def step(state, clean, length, weight, key, lr):
                loss = fwd_jit(state.params, clean, length, weight, key,
                               lr)
                return state, {"loss": loss}
        chain = args.chain if args.segment == "full" else 1
        timer = StepTimer(warmup=2)
        key = jax.random.key(1)
        for i in range(args.steps + 2):
            key, sub = jax.random.split(key)
            state, metrics = step(state, clean, length, weight, sub,
                                  jnp.float32(1e-4))
            timer.step(metrics["loss"], frames=B * T * chain)
        s = timer.summary()
    out = {"ms_per_step": round(s["sec_per_step"] * 1e3 / chain, 3),
           "frames_per_sec": round(s["frames_per_sec"], 1),
           "chain": chain,
           "precision": args.precision, "batch": B, "t": T,
           "loss_finite": bool(np.isfinite(float(metrics["loss"]))),
           "ff_impl": args.ff_impl or f"auto({model.ff_impl})",
           "attn_sublayer_fusion": model.attn_sublayer_fusion}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
