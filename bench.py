"""Benchmark: interpolated keypoint-frames/sec/chip on the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: masked-frame inpainting inference (forward + composite) with the
reference's comparable configuration (hidden_dim=256, num_layers=6,
num_heads=8, 54x2 keypoints — parseMain.py defaults) over batched padded
clips on the available chip.

vs_baseline: speedup over the CPU reference pattern — a torch
nn.Transformer-based equivalent run the way the reference runs it
(batch_size=1, one python-loop video at a time, A1_train.py:244-245) —
measured live when torch is importable, else a recorded constant.

Numerics: bf16 MXU throughput is reported only if its masked-frame MPJPE
deviates < 1e-4 from the f32-highest forward (the BASELINE.json parity
bar); otherwise the f32 number is reported.
"""

import json
import time

import numpy as np

BATCH, T, K = 256, 128, 54
HIDDEN, LAYERS, HEADS = 256, 6, 8
STEPS = 8
TORCH_BASELINE_VIDEOS = 6
TORCH_BASELINE_REPEATS = 3
FALLBACK_CPU_FPS = 40.0  # measured torch CPU reference-pattern fallback


def _workload(rng):
    clean = rng.uniform(0.2, 0.8, (BATCH, T, K, 2)).astype(np.float32)
    miss = (rng.uniform(size=(BATCH, T)) < 0.3).astype(np.float32)
    masked = np.where(miss[..., None, None] > 0, 0.0, clean)
    return clean, miss, masked


def bench_jax():
    import jax
    import jax.numpy as jnp

    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.ops.losses import (
        composite_prediction)
    from keypoints_interpolation_transformer_tpu.ops.masks import (
        attention_bias)

    rng = np.random.default_rng(0)
    clean_np, miss_np, masked_np = _workload(rng)
    clean, miss, masked = (jnp.asarray(x) for x in
                           (clean_np, miss_np, masked_np))

    model = KeypointCompleter(hidden_dim=HIDDEN, num_layers=LAYERS,
                              num_heads=HEADS)
    params = model.init(jax.random.key(0), masked[:, :8], masked[:, :8])

    def fwd(params, masked, clean, miss):
        bias = attention_bias("repeat-inc", miss, T)
        pred = model.apply(params, masked, clean, src_frame_mask=miss,
                           src_bias=bias, tgt_bias=bias)
        return composite_prediction(pred, clean, miss)

    from keypoints_interpolation_transformer_tpu.utils.profiling import (
        StepTimer)

    def timed(precision):
        # steps are chained through a data dependency; StepTimer closes the
        # timed region with a host readback of a dependent scalar — on
        # remote-tunnel backends block_until_ready() can return at enqueue
        # time, which would time dispatch rate instead of device execution.
        # best-of-2 timing loops: tunnel/host scheduling noise moved the
        # single-loop number by ~5% run to run (min-of-n policy, like the
        # CPU baseline below).
        with jax.default_matmul_precision(precision):
            f = jax.jit(fwd)
            fps = 0.0
            for _ in range(2):
                timer = StepTimer(warmup=1)   # step 1 = compile + warm
                x = masked
                for _ in range(STEPS + 1):
                    x = f(params, x, clean, miss)
                    timer.step(x, frames=BATCH * T)
                fps = max(fps, timer.summary()["frames_per_sec"])
            out = f(params, masked, clean, miss)
        return fps, np.asarray(out)

    # fastest matmul precision whose masked-frame MPJPE stays within the
    # 1e-4 parity bar vs the f32 forward (BASELINE.json target)
    fps_hi, out_hi = timed("highest")
    w = miss_np[..., None]

    def gate(out):
        d = np.sqrt(((out - out_hi) ** 2).sum(-1))         # (B, T, K)
        return float((d * w).sum() / max(w.sum() * K, 1.0))

    best = (fps_hi, {"precision": "f32_highest"})
    for prec, name in (("high", "bf16x3"), ("default", "bf16")):
        fps, out = timed(prec)
        delta = gate(out)
        if delta < 1e-4 and fps > best[0]:
            best = (fps, {"precision": name, "mpjpe_delta_vs_f32": delta,
                          "f32_fps": fps_hi})
    return best


def bench_torch_reference_pattern():
    """The CPU reference pattern: batch-1 python loop, torch built-ins."""
    try:
        import torch
        import torch.nn as tnn
    except ImportError:
        return None

    torch.set_num_threads(max(1, __import__("os").cpu_count() or 1))

    class SwiGLU(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.a, self.b, self.c = (tnn.Linear(d, d) for _ in range(3))

        def forward(self, x):
            return self.c(self.a(x) * torch.sigmoid(self.b(x)))

    d = HIDDEN
    emb1, emb2 = tnn.Linear(K * 2, d), tnn.Linear(K * 2, d)
    norm = tnn.InstanceNorm1d(d)
    g1, g2, g3 = SwiGLU(d), SwiGLU(d), SwiGLU(d)
    core = tnn.Transformer(d_model=d, nhead=HEADS, activation="gelu",
                           dropout=0.0, num_encoder_layers=LAYERS,
                           num_decoder_layers=LAYERS)
    head = tnn.Linear(d, K * 2)

    rng = np.random.default_rng(0)
    videos = [rng.uniform(0.2, 0.8, (T, K, 2)).astype(np.float32)
              for _ in range(TORCH_BASELINE_VIDEOS)]
    masks = [(rng.uniform(size=T) < 0.3).astype(np.float32)
             for _ in range(TORCH_BASELINE_VIDEOS)]

    def one_video(v, m):
        x = torch.from_numpy(v).flatten(1).unsqueeze(1)
        mask = torch.from_numpy(m)
        sq = torch.from_numpy(
            np.where((m[None, :] == 1) & (np.arange(T)[:, None] <
                                          np.arange(T)[None, :]),
                     -np.inf, 0.0).astype(np.float32))
        a, b = norm(emb1(x)), norm(emb2(x))
        out = core(g1(a), g2(b), src_mask=sq, tgt_mask=sq,
                   src_key_padding_mask=mask.unsqueeze(0))
        out = norm(g3(out) + emb2(x))
        out = out * torch.sigmoid(out)
        return head(out.transpose(0, 1))

    # min-of-n: the per-video python loop is host-scheduling noisy; the
    # minimum is the reproducible "best the reference pattern can do"
    # (same policy as test_native_pack's timing)
    with torch.no_grad():
        one_video(videos[0], masks[0])  # warm
        best_dt = float("inf")
        for _ in range(TORCH_BASELINE_REPEATS):
            t0 = time.perf_counter()
            for v, m in zip(videos, masks):
                one_video(v, m)
            best_dt = min(best_dt, time.perf_counter() - t0)
    return TORCH_BASELINE_VIDEOS * T / best_dt


def main():
    from keypoints_interpolation_transformer_tpu.utils.compilation_cache \
        import enable_compilation_cache
    enable_compilation_cache()
    fps, extra = bench_jax()
    measured_cpu = bench_torch_reference_pattern()
    cpu_fps = measured_cpu or FALLBACK_CPU_FPS
    result = {
        "metric": "interpolated keypoint-frames/sec/chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / cpu_fps, 2),
        # provenance: which matmul precision passed the 1e-4 MPJPE gate,
        # its delta, and how the CPU baseline was obtained
        **{k: (round(v, 8) if isinstance(v, float) else v)
           for k, v in extra.items()},
        "cpu_baseline_fps": round(cpu_fps, 2),
        "cpu_baseline_source": "measured" if measured_cpu else "recorded",
        "cpu_baseline_n_videos": TORCH_BASELINE_VIDEOS,
        "cpu_baseline_n_repeats": TORCH_BASELINE_REPEATS,
    }
    print(json.dumps(result))  # ONE line only


if __name__ == "__main__":
    main()
