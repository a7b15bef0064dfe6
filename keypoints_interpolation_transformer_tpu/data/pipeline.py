"""Dataset runtime: ragged videos -> normalized, filtered, bucketed batches.

TPU re-design of the reference's LSP_Dataset + DataLoader(batch_size=1)
(dataloader.py:545-689, A1_train.py:244-245): instead of a per-video Python
loop, videos are padded into length buckets and fed as (B, T_pad, 54, 2)
batches with per-video length and weight vectors, so every downstream
computation is a fixed-shape batched array program.  Per-video losses are
exactly reproduced via frame-validity weights (see ops/losses.py).

Corruption and augmentation are NOT applied here for training — they run
fused inside the jitted train step (see train/steps.py), which is the
"one vmapped XLA preprocessing kernel" design.  Validation corruption is
precomputed once with a fixed key, mirroring the reference's
create_validation_data (dataloader.py:604-621).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..transforms.corruption import put_missing_frames
from ..transforms.filters import filter_videos
from ..transforms.normalize import normalize_pose_batch
from ..utils.registry import dataset_name_from_path, missing_stats


def bucket_length(t: int, multiple: int, max_len: int) -> int:
    b = ((t + multiple - 1) // multiple) * multiple
    return min(b, max_len)


def pad_videos(videos: Sequence[np.ndarray], t_pad: int):
    """Stack ragged videos into (B, t_pad, K, 2) + (B,) lengths.

    Uses the native C++ packer (data/native_pack.py, memcpy speed) when the
    toolchain is available; numpy fallback otherwise."""
    from .native_pack import pad_videos_native

    return pad_videos_native(videos, t_pad)


def _assemble_corrupted(corrupted, ids, t_pad):
    """Precorrupted rows -> padded (B, t_pad+1, K, 2) inputs + (B, t_pad+1)
    masks with the SOS frame prepended natively (kitpack_pad_with_sos; the
    reference's add_sos, dataloader.py:482-493, runs per video in Python)."""
    from .native_pack import pad_with_sos_native

    ins, _ = pad_with_sos_native([corrupted[i][0] for i in ids], t_pad,
                                 sos_value=1.0)
    msk, _ = pad_with_sos_native([corrupted[i][1] for i in ids], t_pad,
                                 sos_value=0.0)
    return ins, msk


@dataclasses.dataclass
class Batch:
    """One padded batch.  ``weight`` zeroes fill-duplicate rows so partially
    filled buckets don't bias epoch means."""

    clean: np.ndarray              # (B, T, K, 2)
    length: np.ndarray             # (B,)
    weight: np.ndarray             # (B,)
    inputs: Optional[np.ndarray] = None   # (B, T+1, K, 2) precorrupted + SOS
    mask: Optional[np.ndarray] = None     # (B, T+1)

    @property
    def valid(self) -> np.ndarray:
        T = self.clean.shape[1]
        return (np.arange(T)[None, :] < self.length[:, None]).astype(
            np.float32)


class KeypointDataset:
    """Load -> normalize -> filter, held as host-side ragged float32 list."""

    def __init__(self, videos: Optional[List[np.ndarray]] = None,
                 path: Optional[str] = None,
                 dataset_name: Optional[str] = None,
                 normalize: bool = True, apply_filter: bool = True,
                 max_seq_len: int = 512, bucket_multiple: int = 32):
        if videos is None:
            if path is None:
                raise ValueError("need videos or path")
            from .hdf5_io import read_split
            videos, _, _ = read_split(path)
            dataset_name = dataset_name or dataset_name_from_path(path)
        self.dataset_name = dataset_name or "all"
        self.max_seq_len = max_seq_len
        self.bucket_multiple = bucket_multiple

        videos = [np.asarray(v, np.float32)[:max_seq_len] for v in videos]
        if apply_filter:
            videos, self.dropped = filter_videos(videos)
        else:
            self.dropped = 0
        if normalize and videos:
            videos = self._normalize_bucketed(videos)
        self.videos = videos

    def _normalize_bucketed(self, videos):
        """Run the jitted normalizer once per bucket shape."""
        buckets: Dict[int, List[int]] = {}
        for i, v in enumerate(videos):
            buckets.setdefault(
                bucket_length(len(v), self.bucket_multiple,
                              self.max_seq_len), []).append(i)
        out: List[Optional[np.ndarray]] = [None] * len(videos)
        norm = jax.jit(normalize_pose_batch)
        for t_pad, idxs in buckets.items():
            padded, lens = pad_videos([videos[i] for i in idxs], t_pad)
            res = np.asarray(norm(jnp.asarray(padded)))
            for row, i in enumerate(idxs):
                out[i] = res[row, :lens[row]]
        return out

    def __len__(self):
        return len(self.videos)

    # -- batching ----------------------------------------------------------

    def _bucketed_indices(self, order: np.ndarray, batch_size: int):
        buckets: Dict[int, List[int]] = {}
        for i in order:
            buckets.setdefault(
                bucket_length(len(self.videos[i]), self.bucket_multiple,
                              self.max_seq_len), []).append(int(i))
        for t_pad, idxs in sorted(buckets.items()):
            for s in range(0, len(idxs), batch_size):
                yield t_pad, idxs[s:s + batch_size]

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0,
                corrupted: Optional[Dict[int, tuple]] = None
                ) -> Iterator[Batch]:
        """Yield fixed-shape batches; short batches are filled by repeating
        the first row with weight 0."""
        order = np.arange(len(self.videos))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for t_pad, idxs in self._bucketed_indices(order, batch_size):
            vids = [self.videos[i] for i in idxs]
            n = len(vids)
            fill = batch_size - n
            vids = vids + [vids[0]] * fill
            clean, lens = pad_videos(vids, t_pad)
            weight = np.concatenate(
                [np.ones(n, np.float32), np.zeros(fill, np.float32)])
            batch = Batch(clean=clean, length=lens, weight=weight)
            if corrupted is not None:
                src = idxs + [idxs[0]] * fill
                batch.inputs, batch.mask = _assemble_corrupted(
                    corrupted, src, t_pad)
            yield batch

    def num_batches(self, batch_size: int) -> int:
        return sum(1 for _ in self._bucketed_indices(
            np.arange(len(self.videos)), batch_size))

    # -- device-resident batching -------------------------------------------

    def device_buckets(self, corrupted: Optional[Dict[int, tuple]] = None,
                       sharding=None) -> Dict[int, dict]:
        """Upload each length bucket ONCE as stacked device arrays.

        Host->device bandwidth is the epoch bottleneck on tunneled TPUs
        (~10x the compute time); with the dataset resident in HBM, each
        epoch's batches are device-side gathers driven by tiny index
        vectors.  Returns {t_pad: {"clean", "length", "ids", and with
        ``corrupted``: "inputs", "mask"}}.
        """
        buckets: Dict[int, List[int]] = {}
        for i, v in enumerate(self.videos):
            buckets.setdefault(
                bucket_length(len(v), self.bucket_multiple,
                              self.max_seq_len), []).append(i)
        out: Dict[int, dict] = {}
        for t_pad, idxs in sorted(buckets.items()):
            clean, lens = pad_videos([self.videos[i] for i in idxs], t_pad)
            entry = {
                "clean": jax.device_put(clean, sharding),
                "length": jax.device_put(lens.astype(np.int32), sharding),
                "ids": idxs,
            }
            if corrupted is not None:
                ins, msk = _assemble_corrupted(corrupted, idxs, t_pad)
                entry["inputs"] = jax.device_put(ins, sharding)
                entry["mask"] = jax.device_put(msk, sharding)
            out[t_pad] = entry
        return out

    def device_batches(self, buckets: Dict[int, dict], batch_size: int,
                       shuffle: bool = False, seed: int = 0):
        """Yield device-gathered batches from device_buckets() output:
        (t_pad, rows_dict, weight_host).  Short batches repeat row 0 with
        weight 0, exactly like the host path."""
        rng = np.random.default_rng(seed)
        for t_pad, entry in buckets.items():
            n = len(entry["ids"])
            order = rng.permutation(n) if shuffle else np.arange(n)
            for s in range(0, n, batch_size):
                rows = order[s:s + batch_size]
                fill = batch_size - len(rows)
                weight = np.concatenate([np.ones(len(rows), np.float32),
                                         np.zeros(fill, np.float32)])
                if fill:
                    rows = np.concatenate([rows, [rows[0]] * fill])
                rows_dev = jnp.asarray(rows.astype(np.int32))
                picked = {k: jnp.take(v, rows_dev, axis=0)
                          for k, v in entry.items()
                          if k not in ("ids",)}
                yield t_pad, picked, weight

    def device_batch_plan(self, buckets: Dict[int, dict], batch_size: int,
                          shuffle: bool = False, seed: int = 0):
        """Stacked per-bucket batch plan for device-side epoch chaining
        (train/steps.make_chained_train_step): yields (t_pad, entry,
        rows (n, B) int32 device, weights (n, B) f32 host) with EXACTLY
        the batch composition device_batches() would produce — the same
        rng stream drives the per-bucket permutations, so chained and
        per-step epochs see identical batches."""
        rng = np.random.default_rng(seed)
        for t_pad, entry in buckets.items():
            n = len(entry["ids"])
            order = rng.permutation(n) if shuffle else np.arange(n)
            rws, wts = [], []
            for s in range(0, n, batch_size):
                rows = order[s:s + batch_size]
                fill = batch_size - len(rows)
                wts.append(np.concatenate(
                    [np.ones(len(rows), np.float32),
                     np.zeros(fill, np.float32)]))
                if fill:
                    rows = np.concatenate([rows, [rows[0]] * fill])
                rws.append(rows.astype(np.int32))
            yield (t_pad, entry, jnp.asarray(np.stack(rws)),
                   np.stack(wts))

    # -- validation corruption (precomputed once) ---------------------------

    def precompute_corruption(self, seed: int = 42,
                              is_random_missing: bool = False,
                              registry_path: Optional[str] = None
                              ) -> Dict[int, tuple]:
        """Reference create_validation_data (dataloader.py:604-621): corrupt
        every video once; serve the same corruption every epoch.

        Stored WITHOUT the SOS frame — batch assembly prepends it natively
        (_assemble_corrupted)."""
        stats = None
        name = self.dataset_name
        if not is_random_missing and name != "all":
            try:
                stats = missing_stats(name, registry_path)
            except KeyError:
                stats = None  # generic 'all' block mode (see train/loop.py)
        corrupt = jax.jit(
            lambda k, v, t: put_missing_frames(
                k, v, is_random_missing=is_random_missing,
                dataset_name="all" if stats is None else name,
                stats=stats, t_actual=t),
            static_argnames=())
        out: Dict[int, tuple] = {}
        key = jax.random.key(seed)
        buckets: Dict[int, List[int]] = {}
        for i, v in enumerate(self.videos):
            buckets.setdefault(
                bucket_length(len(v), self.bucket_multiple,
                              self.max_seq_len), []).append(i)
        for t_pad, idxs in buckets.items():
            padded, lens = pad_videos([self.videos[i] for i in idxs], t_pad)
            keys = jax.random.split(key, len(idxs) + 1)
            key = keys[0]
            vv, mm = jax.vmap(corrupt)(keys[1:], jnp.asarray(padded),
                                       jnp.asarray(lens))
            vv, mm = np.asarray(vv), np.asarray(mm)
            for row, i in enumerate(idxs):
                t = lens[row]
                out[i] = (vv[row, :t], mm[row, :t])
        return out
