"""Pallas vs XLA attention on the real chip, across the shapes the model
actually runs (flagship bench: B=256 T=128; buckets up to T=512; long-seq
seam up to the PE cap T=2048).

Usage:  python benchmarks/attention_bench.py [--bwd] [--dtype f32|bf16]

Prints one JSON line per shape with fwd (and optionally fwd+bwd) times and
the pallas/XLA speedup; used to set auto_pallas_min_len and the RESULTS.md
crossover table.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--precision", default="default",
                    choices=["default", "high", "highest"])
    ap.add_argument("--steps", type=int, default=20)
    # chain N applications inside ONE jit: per-call dispatch through the
    # remote tunnel costs ~1 ms, which would swamp a single-op timing; the
    # model itself runs 18 attention calls per forward, so this matches
    # how the kernel is actually amortized
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--shapes", type=str, default=(
        "256x128,64x256,16x512,16x1024,16x2048"))
    args = ap.parse_args()

    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from keypoints_interpolation_transformer_tpu.ops.pallas.attention \
        import fused_attention, xla_attention

    H, dh = 8, 32
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    rng = np.random.default_rng(0)

    import contextlib
    prec_ctx = (contextlib.nullcontext() if args.precision == "default"
                else jax.default_matmul_precision(args.precision))
    prec_ctx.__enter__()

    def timeit(f, *xs):
        out = f(*xs)
        first = jax.tree.leaves(out)[0]
        float(jnp.sum(first.astype(jnp.float32)))  # sync (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f(*xs)
        first = jax.tree.leaves(out)[0]
        float(jnp.sum(first.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.steps

    for spec in args.shapes.split(","):
        B, T = (int(x) for x in spec.split("x"))
        q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, dh)), dtype)
                   for _ in range(3))
        mask = jnp.asarray((rng.random((B, T)) < 0.3), jnp.float32)
        valid = jnp.ones((B, T), jnp.float32)

        L = args.layers

        def chain(f):
            def fwd(q, k, v):
                out = q
                for _ in range(L):
                    out = f(out, k, v, mask, valid, "repeat-inc", True)
                return out
            return fwd

        if args.bwd:
            def make(f):
                def loss(q, k, v):
                    return jnp.sum(jnp.square(
                        chain(f)(q, k, v).astype(jnp.float32)))
                return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        else:
            def make(f):
                return jax.jit(chain(f))

        t_pallas = timeit(make(fused_attention), q, k, v) / L
        t_xla = timeit(make(xla_attention), q, k, v) / L

        # parity check on the forward
        got = np.asarray(fused_attention(
            q, k, v, mask, valid, "repeat-inc", True), np.float32)
        want = np.asarray(xla_attention(
            q, k, v, mask, valid, "repeat-inc", True), np.float32)
        err = float(np.max(np.abs(got - want)))

        print(json.dumps({
            "B": B, "T": T, "dtype": args.dtype,
            "precision": args.precision,
            "mode": "fwd+bwd" if args.bwd else "fwd",
            "pallas_ms": round(t_pallas * 1e3, 3),
            "xla_ms": round(t_xla * 1e3, 3),
            "speedup": round(t_xla / t_pallas, 3),
            "max_abs_err": err,
        }), flush=True)


if __name__ == "__main__":
    main()
