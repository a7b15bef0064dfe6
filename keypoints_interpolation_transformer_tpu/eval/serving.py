"""Batch inference API + HTTP serving with dynamic batching.

No reference counterpart (the reference ends at evaluation scripts); this
is the deployment surface: an ``Inpainter`` that loads any checkpoint
(orbax dir or reference ``.pth``), pads/buckets incoming ragged sequences,
runs the jitted composite-inpainting forward, and returns only the frames
that were missing — plus a threaded stdlib HTTP endpoint whose concurrent
requests are merged into shared device dispatches (``RequestBatcher``).

POST /inpaint {"videos": [[[x, y] * 54] * T, ...],
               "masks": [[0/1] * T, ...]}
  -> {"videos": [...]}  (masked frames replaced by model predictions)
GET /healthz -> {"ok": true}
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.keypoints import NUM_COORDS, NUM_KEYPOINTS
from ..models.completer import KeypointCompleter
from ..ops.losses import composite_prediction
from ..ops.masks import attention_bias
from ..transforms.corruption import add_sos
from ..utils.config import ModelConfig


class Inpainter:
    """Checkpoint-backed masked-frame inpainting with shape bucketing.

    ``quantize="int8"`` runs every Dense matmul int8-on-MXU (2x the bf16
    MXU rate on v5e) with per-channel weight / per-token activation
    scales — see eval/quantize.py; float path is the default."""

    def __init__(self, params, model_cfg: ModelConfig,
                 bucket_multiple: int = 32, max_seq_len: int = 512,
                 quantize: Optional[str] = None, variant: str = "plain",
                 first_params=None):
        from ..train.steps import build_model
        if variant not in ("plain", "cycle", "embedding"):
            raise ValueError(f"unknown variant {variant!r}")
        if variant == "cycle" and first_params is None:
            raise ValueError("cycle checkpoints need first_params (the "
                             "frozen plain model, A2_train_cycle.py:99)")
        self.variant = variant
        if quantize == "int8":
            # the FF matmuls (2/3 of the FLOPs) run inside the fused
            # Pallas FF/merged-layer kernels' int8 mode (in-kernel
            # dynamic activation quantization, ops/pallas/ffn
            # ._kernel_int8).  The attention q/k/v/out PROJECTIONS can
            # also run int8 inside the merged kernels, but ONLY under
            # the opt-in KIT_ATTN_INT8=1 (models/layers.py gates it;
            # measured a net LOSS at D=256 — see the log below — so it
            # is off by default).  The embeddings/head live inside the
            # fused pointwise kernels and stay float (108-wide — a
            # negligible FLOP share); any nn.Dense that still executes
            # (unfused fallbacks, Embedding variant) is intercepted by
            # the quantize-table path.  quantization_error() reports the
            # per-checkpoint masked-MPJPE delta for deployment gating.
            import dataclasses as _dc
            model_cfg = _dc.replace(model_cfg, ff_impl="pallas-int8")
        self.model = build_model(model_cfg, variant)
        self.first_model = build_model(model_cfg, "plain") \
            if variant == "cycle" else None
        if first_params is not None and "params" in first_params:
            first_params = first_params["params"]
        self.first_params = first_params
        self.params = params
        self.precision = model_cfg.matmul_precision
        self.bucket = bucket_multiple
        self.max_seq_len = max_seq_len
        self._jitted = {}
        self._qtable = None
        if quantize == "int8":
            from .quantize import quantize_dense_table
            self._qtable = quantize_dense_table(params)
            if model_cfg.hidden_dim <= 512:
                import logging
                logging.getLogger(__name__).info(
                    "int8 serving at hidden_dim=%d: measured a statistical "
                    "TIE with the float bf16 path at this width (D=256: "
                    "1.70-1.81M frames/s, order flips within run noise — "
                    "the shared attention work dominates) at ~2x the bf16 "
                    "output delta; int8 clearly wins from D>=1024 (431K vs "
                    "411K) where matmuls dominate.  Quantizing the "
                    "attention projections too (KIT_ATTN_INT8=1) measured "
                    "a net LOSS at this width.  See RESULTS.md int8 table.",
                    model_cfg.hidden_dim)
        elif quantize not in (None, "none"):
            raise ValueError(f"unknown quantize mode {quantize!r}")

    @classmethod
    def from_checkpoint(cls, path: str,
                        model_cfg: Optional[ModelConfig] = None,
                        first_checkpoint: Optional[str] = None, **kw):
        if first_checkpoint is not None:
            first = cls._load_params(first_checkpoint)
            kw["first_params"] = first
        if path.endswith(".pth"):
            from ..train.checkpoint import load_reference_checkpoint
            params, hyper = load_reference_checkpoint(path)
            model_cfg = model_cfg or ModelConfig(
                hidden_dim=int(hyper["hidden_dim"]),
                num_layers=int(hyper["num_layers"]),
                num_heads=int(hyper["num_heads"]))
        else:
            import os

            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as c:
                params = c.restore(os.path.abspath(path))
            if model_cfg is None:
                raise ValueError("orbax checkpoints need a ModelConfig")
        if "params" not in params:
            params = {"params": params}
        return cls(params, model_cfg, **kw)

    @staticmethod
    def _load_params(path: str):
        """Bare params tree from a reference .pth or an orbax dir."""
        if path.endswith(".pth"):
            from ..train.checkpoint import load_reference_checkpoint
            params, _ = load_reference_checkpoint(path)
            return params
        import os

        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as c:
            params = c.restore(os.path.abspath(path))
        return params.get("params", params) if isinstance(params, dict) \
            else params

    def _fn(self, t_pad: int):
        if t_pad not in self._jitted:
            model = self.model
            first_model = self.first_model
            first_params = self.first_params
            variant = self.variant
            qtable = self._qtable
            if qtable is not None:
                from .quantize import int8_dense_calls

            @jax.jit
            def run(params, inputs, mask, clean, valid):
                import contextlib

                from ..train.steps import cycle_forward
                from ..transforms.corruption import zero_missing_frames
                x, x_no = inputs[:, :-1], inputs[:, 1:]
                x_mask, y_mask = mask[:, :-1], mask[:, 1:]
                raw = params["params"] if "params" in params else params
                ctx = (int8_dense_calls(qtable) if qtable is not None
                       else contextlib.nullcontext())
                with ctx:
                    if variant == "embedding":
                        # AE reconstructs the frame-aligned stream (x_no
                        # lines up with `clean`); missing frames are
                        # zeroed first, as the A3/A4 regimes feed it
                        pred = model.apply(
                            {"params": raw},
                            zero_missing_frames(x_no, y_mask))
                    elif variant == "cycle":
                        pred = cycle_forward(
                            first_model, first_params, model, raw,
                            x, x_no, x_mask, y_mask, valid)
                    else:
                        src_bias = attention_bias("repeat-inc", x_mask,
                                                  t_pad)
                        tgt_bias = attention_bias("repeat-inc", y_mask,
                                                  t_pad)
                        pred = model.apply(
                            {"params": raw}, x, x_no, src_frame_mask=x_mask,
                            tgt_frame_mask=y_mask, src_bias=src_bias,
                            tgt_bias=tgt_bias, valid_mask=valid)
                return composite_prediction(pred, clean, y_mask)

            self._jitted[t_pad] = run
        return self._jitted[t_pad]

    def inpaint(self, videos: Sequence[np.ndarray],
                masks: Sequence[np.ndarray]) -> List[np.ndarray]:
        """videos: ragged (T_i, 54, 2); masks: (T_i,) with 1 = missing.
        Missing frames should carry any placeholder (typically the
        freeze-frame input); the model's predictions replace them."""
        out: List[Optional[np.ndarray]] = [None] * len(videos)
        buckets = {}
        for i, v in enumerate(videos):
            t = min(len(v), self.max_seq_len)
            t_pad = min(((t + self.bucket - 1) // self.bucket) * self.bucket,
                        self.max_seq_len)
            buckets.setdefault(t_pad, []).append(i)
        with jax.default_matmul_precision(self.precision):
            for t_pad, idxs in buckets.items():
                B = len(idxs)
                clean = np.zeros((B, t_pad, NUM_KEYPOINTS, NUM_COORDS),
                                 np.float32)
                miss = np.zeros((B, t_pad), np.float32)
                valid = np.zeros((B, t_pad), np.float32)
                for row, i in enumerate(idxs):
                    t = min(len(videos[i]), t_pad)
                    clean[row, :t] = videos[i][:t]
                    miss[row, :t] = np.asarray(masks[i][:t])
                    valid[row, :t] = 1.0
                inputs, mask = add_sos(jnp.asarray(clean),
                                       jnp.asarray(miss))
                res = self._fn(t_pad)(self.params, inputs, mask,
                                      jnp.asarray(clean),
                                      jnp.asarray(valid))
                res = np.asarray(res)
                for row, i in enumerate(idxs):
                    t = min(len(videos[i]), t_pad)
                    out[i] = res[row, :t]
        return out  # type: ignore[return-value]


class RequestBatcher:
    """Cross-request dynamic batching around the single device.

    The accelerator is the serialized resource: request handler threads
    enqueue (videos, masks) jobs; ONE worker thread drains the queue —
    after the first job arrives it keeps collecting for ``window_ms`` (or
    until ``max_batch_videos``) so concurrent small requests ride the same
    device dispatch.  The Inpainter's internal shape-bucketing then groups
    the merged set, so a batch of mixed lengths still compiles to a few
    padded buckets rather than one ragged mess.
    """

    def __init__(self, inpainter: Inpainter, max_batch_videos: int = 64,
                 window_ms: float = 3.0):
        import queue
        import threading

        self._inpainter = inpainter
        self._max = max_batch_videos
        self._window = window_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._queue_mod = queue
        self.stats = {"requests": 0, "videos": 0, "batches": 0,
                      "max_batch_videos": 0}
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, videos, masks):
        """Enqueue a job; returns a Future of List[np.ndarray]."""
        from concurrent.futures import Future
        fut: Future = Future()
        self._q.put((videos, masks, fut))
        return fut

    def close(self):
        self._stop = True
        self._q.put(None)
        self._thread.join(timeout=5)
        # Fail (don't strand) any jobs still queued behind the sentinel —
        # their submitters would otherwise block until request_timeout.
        while True:
            try:
                job = self._q.get_nowait()
            except self._queue_mod.Empty:
                break
            if job is not None:
                job[2].set_exception(RuntimeError("server shutting down"))

    def _loop(self):
        import time
        while not self._stop:
            first = self._q.get()
            if first is None:
                break
            jobs = [first]
            n = len(first[0])
            deadline = time.monotonic() + self._window
            while n < self._max:
                budget = deadline - time.monotonic()
                if budget <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=budget)
                except self._queue_mod.Empty:
                    break
                if nxt is None:
                    self._stop = True
                    break
                jobs.append(nxt)
                n += len(nxt[0])
            videos = [v for vs, _, _ in jobs for v in vs]
            masks = [m for _, ms, _ in jobs for m in ms]
            try:
                res = self._inpainter.inpaint(videos, masks)
            except Exception as e:  # surface device errors to every caller
                for _, _, fut in jobs:
                    if not fut.cancelled():
                        fut.set_exception(e)
                continue
            self.stats["requests"] += len(jobs)
            self.stats["videos"] += len(videos)
            self.stats["batches"] += 1
            self.stats["max_batch_videos"] = max(
                self.stats["max_batch_videos"], len(videos))
            off = 0
            for vs, _, fut in jobs:
                if not fut.cancelled():
                    fut.set_result(res[off:off + len(vs)])
                off += len(vs)


def make_server(inpainter: Inpainter, host: str = "127.0.0.1",
                port: int = 8321, max_batch_videos: int = 64,
                window_ms: float = 3.0, request_timeout: float = 600.0,
                max_videos_per_request: int = 256,
                log_requests: bool = False):
    """Threaded HTTP server with dynamic batching; returns (server,
    batcher) — call server.serve_forever() / batcher.close()."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = RequestBatcher(inpainter, max_batch_videos, window_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/statz":
                self._send(200, dict(batcher.stats))
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/inpaint":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                videos = [np.asarray(v, np.float32) for v in req["videos"]]
                masks = [np.asarray(m, np.float32) for m in req["masks"]]
                if len(videos) != len(masks):
                    raise ValueError("videos/masks length mismatch")
                if len(videos) > max_videos_per_request:
                    raise ValueError(
                        f"too many videos in one request "
                        f"({len(videos)} > {max_videos_per_request})")
                for v, m in zip(videos, masks):
                    if v.ndim != 3 or v.shape[1:] != (NUM_KEYPOINTS,
                                                      NUM_COORDS):
                        raise ValueError(
                            f"video must be (T, {NUM_KEYPOINTS}, "
                            f"{NUM_COORDS}), got {list(v.shape)}")
                    if len(m) != len(v):
                        raise ValueError("mask length != video length")
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            import concurrent.futures
            import time
            t0 = time.monotonic()
            fut = batcher.submit(videos, masks)
            try:
                res = fut.result(request_timeout)
            except concurrent.futures.TimeoutError:
                fut.cancel()  # drop it if the worker hasn't started it yet
                self._send(504, {"error": "inference timed out"})
                return
            except Exception as e:  # device/runtime errors -> HTTP 500
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, {"videos": [r.tolist() for r in res]})
            if log_requests:
                n_frames = sum(len(v) for v in videos)
                print(f"POST /inpaint videos={len(videos)} "
                      f"frames={n_frames} "
                      f"latency_ms={(time.monotonic() - t0) * 1e3:.1f}",
                      flush=True)

    server = ThreadingHTTPServer((host, port), Handler)
    return server, batcher


def serve(inpainter: Inpainter, host: str = "127.0.0.1", port: int = 8321,
          **kw):
    """Blocking HTTP serving around an Inpainter (threaded + batched)."""
    import signal
    import threading

    server, batcher = make_server(inpainter, host, port, **kw)
    print(f"serving on http://{host}:{server.server_address[1]}")

    def _shutdown(signum, frame):
        # serve_forever() must be stopped from another thread; shutdown()
        # blocks until the serve loop exits.
        threading.Thread(target=server.shutdown, daemon=True).start()

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[sig] = signal.signal(sig, _shutdown)
        except ValueError:  # not the main thread (e.g. under a test)
            pass
    try:
        server.serve_forever()
    finally:
        for sig, handler in prev.items():
            signal.signal(sig, handler)
        batcher.close()
        server.server_close()
