"""Materialized (deterministic, reusable) corrupted datasets.

Re-derivation of generate_intermediate_validation.py: corrupt every video
once and write the shifted training tensors (x, y, x_mask, y_mask) to an
HDF5 group ``intermediate`` in the reference's ragged vlen schema
(generate_intermediate_validation.py:11-22,47-78), plus the matching
reader (:80-106).  x is zeroed at masked frames, as the reference does
(:64-65).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .pipeline import KeypointDataset

GROUP = "intermediate"


def generate_intermediate(ds: KeypointDataset, path: str,
                          seed: int = 42,
                          is_random_missing: bool = False) -> None:
    import h5py

    corrupted = ds.precompute_corruption(seed=seed,
                                         is_random_missing=is_random_missing)
    with h5py.File(path, "w") as f:
        g = f.create_group(GROUP)
        vfloat = h5py.special_dtype(vlen="float32")
        vint = h5py.special_dtype(vlen="int64")
        n = len(ds.videos)
        dx = g.create_dataset("x", (n,), dtype=vfloat)
        dy = g.create_dataset("y", (n,), dtype=vfloat)
        dxm = g.create_dataset("x_mask", (n,), dtype=vint)
        dym = g.create_dataset("y_mask", (n,), dtype=vint)
        dlen = g.create_dataset("length", (n,), dtype="int")
        dshape = g.create_dataset("shape", (2,), dtype="int")

        last_shape = (54, 2)
        for i, clean in enumerate(ds.videos):
            civ, cim = corrupted[i]              # (t, K, 2), (t) — no SOS
            # SOS prepend + src/tgt shift (A1_train.py:93-100)
            x = np.concatenate(
                [np.ones((1,) + civ.shape[1:], np.float32), civ[:-1]])
            x_mask = np.concatenate([[0.0], cim[:-1]]).astype(cim.dtype)
            y = clean
            y_mask = cim
            # zero masked x frames (generate_intermediate_validation.py:64)
            x = np.where(x_mask[:, None, None] > 0, 0.0, x)
            dx[i] = x.flatten()
            dy[i] = y.flatten()
            dxm[i] = x_mask.astype(np.int64)
            dym[i] = y_mask.astype(np.int64)
            dlen[i] = x.shape[0]
            last_shape = x.shape[1:]
        dshape[:] = last_shape


def read_intermediate(path: str) -> Tuple[List[np.ndarray], List[np.ndarray],
                                          List[np.ndarray], List[np.ndarray]]:
    """Returns (x, y, x_mask, y_mask) lists of per-video arrays."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f[GROUP]
        shp = np.asarray(g["shape"])
        xs, ys, xms, yms = [], [], [], []
        for x, y, xm, ym, t in zip(g["x"], g["y"], g["x_mask"], g["y_mask"],
                                   g["length"]):
            t = int(t)
            xs.append(np.asarray(x, np.float32).reshape(t, *shp))
            ys.append(np.asarray(y, np.float32).reshape(t, *shp))
            xms.append(np.asarray(xm))
            yms.append(np.asarray(ym))
    return xs, ys, xms, yms
