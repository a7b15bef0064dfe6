"""Int8 vs float serving forward on the real chip.

Times the Inpainter's jitted composite forward at the flagship
configuration (256/6/8) for the float path (under each matmul precision)
and the int8 path, and reports the int8 forward's max output delta vs the
f32 forward.  Chained steps + dependent-scalar readback (tunnel-safe
timing, see bench.py).

Usage: python benchmarks/quantize_bench.py [--batch 256] [--t 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--t", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=6)
    ap.add_argument("--num_heads", type=int, default=8)
    args = ap.parse_args()

    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from keypoints_interpolation_transformer_tpu.eval.serving import (
        Inpainter)
    from keypoints_interpolation_transformer_tpu.transforms.corruption \
        import add_sos
    from keypoints_interpolation_transformer_tpu.utils.config import (
        ModelConfig)

    B, T = args.batch, args.t
    mc = ModelConfig(hidden_dim=args.hidden_dim,
                     num_layers=args.num_layers, num_heads=args.num_heads)
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.2, 0.8, (B, T, 54, 2)), jnp.float32)
    miss = jnp.asarray(rng.uniform(size=(B, T)) < 0.3, jnp.float32)
    valid = jnp.ones((B, T), jnp.float32)
    inputs, mask = add_sos(clean, miss)

    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    model = KeypointCompleter(hidden_dim=mc.hidden_dim,
                              num_layers=mc.num_layers,
                              num_heads=mc.num_heads)
    params = model.init(jax.random.key(0), clean[:, :8], clean[:, :8])

    def timeit(run):
        # chain all steps inside ONE jit: per-call dispatch through the
        # tunnel costs ~1 ms and eager chaining ops would dominate
        @jax.jit
        def chained(params, inputs, mask, clean, valid):
            def body(x, _):
                y = run(params, inputs * (1 + 0 * jnp.mean(x)), mask,
                        clean, valid)
                return y, ()
            x, _ = jax.lax.scan(body, clean, None, length=args.steps)
            return x
        out = run(params, inputs, mask, clean, valid)
        x = chained(params, inputs, mask, clean, valid)
        float(jnp.sum(x))                       # warm + sync
        t0 = time.perf_counter()
        x = chained(params, inputs, mask, clean, valid)
        float(jnp.sum(x))
        dt = (time.perf_counter() - t0) / args.steps
        return dt, np.asarray(out)

    results = {}
    ref = None
    for name, prec, quant in (("f32_highest", "highest", None),
                              ("bf16x3", "high", None),
                              ("bf16", "default", None),
                              ("int8", "default", "int8")):
        inp = Inpainter({"params": params["params"]}, mc, quantize=quant)
        run = inp._fn(T)
        with jax.default_matmul_precision(prec):
            dt, out = timeit(jax.jit(run))
        if ref is None:
            ref = out
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "frames_per_sec": round(B * T / dt),
            "max_delta_vs_f32": float(np.max(np.abs(out - ref))),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"shape": f"B={B} T={T}", **results}))


if __name__ == "__main__":
    main()
