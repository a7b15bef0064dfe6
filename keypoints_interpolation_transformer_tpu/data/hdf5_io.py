"""HDF5 IO compatible with the reference's ragged schema.

The reference stores each split as group ``no_missing`` with vlen-float32
``data`` (flattened (T, 2, 54) records), ``length``, vlen-str ``label`` /
``video_name``, and a 2-int ``shape`` dataset (1_prepare_dataset.py:19-29);
readers reshape to (T, shape0, shape1) then transpose to (T, 54, 2)
(dataloader.py:267).  We read and write that format bit-for-bit so datasets
interchange with the reference pipeline.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

GROUP = "no_missing"


def write_split(path: str, videos: Sequence[np.ndarray],
                labels: Optional[Sequence[str]] = None,
                names: Optional[Sequence[str]] = None) -> None:
    """Write (T_i, 54, 2) videos in the reference schema (stored transposed
    as (T, 2, 54), flattened)."""
    import h5py

    labels = labels or [f"label_{i}" for i in range(len(videos))]
    names = names or [f"video_{i}" for i in range(len(videos))]
    with h5py.File(path, "w") as f:
        g = f.create_group(GROUP)
        vfloat = h5py.special_dtype(vlen="float32")
        vstr = h5py.special_dtype(vlen=str)
        n = len(videos)
        data = g.create_dataset("data", shape=(n,), dtype=vfloat)
        length = g.create_dataset("length", shape=(n,), dtype="int")
        label = g.create_dataset("label", shape=(n,), dtype=vstr)
        vname = g.create_dataset("video_name", shape=(n,), dtype=vstr)
        shape = g.create_dataset("shape", shape=(2,), dtype="int")
        for i, (v, lab, nam) in enumerate(zip(videos, labels, names)):
            stored = np.transpose(np.asarray(v, np.float32), (0, 2, 1))
            data[i] = stored.flatten()
            length[i] = v.shape[0]
            label[i] = lab
            vname[i] = nam
        shape[:] = (2, 54)


def read_split(path: str) -> Tuple[List[np.ndarray], List[str], List[str]]:
    """Read a split; returns (videos (T, 54, 2) float32, labels, names)."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f[GROUP]
        shp = np.asarray(g["shape"])
        videos, labels, names = [], [], []
        for rec, t, lab, nam in zip(g["data"], g["length"], g["label"],
                                    g["video_name"]):
            v = np.asarray(rec, np.float32).reshape(int(t), shp[0], shp[1])
            videos.append(np.transpose(v, (0, 2, 1)))
            labels.append(lab.decode() if isinstance(lab, bytes) else str(lab))
            names.append(nam.decode() if isinstance(nam, bytes) else str(nam))
    return videos, labels, names
