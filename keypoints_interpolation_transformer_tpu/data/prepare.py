"""Offline dataset ETL — the reference's 1_prepare_dataset.py re-designed.

Pipeline (1_prepare_dataset.py:76-135): read a raw per-video HDF5 (one group
per video with a (T, C, K_all) ``data`` array), select the 54 catalog
keypoints, keep only videos listed in a no-missing-values CSV, 80/20
shuffle-split with seed 42, and write train/validation splits in the ragged
reference schema (hdf5_io.py).

The keypoint selection uses the in-package catalog by default; an external
``Mapeo landmarks librerias.csv`` can override it (same column contract:
'Selected 54', 'mp_indexInArray').
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .keypoints import NUM_KEYPOINTS


def select_indices_from_catalog_csv(path: str) -> List[int]:
    """Read the reference's landmarks CSV (skiprows=1; rows with
    'Selected 54' == 'x'; sorted 'mp_indexInArray') —
    1_prepare_dataset.py:82-84."""
    import pandas as pd

    df = pd.read_csv(path, skiprows=1)
    df = df[df["Selected 54"] == "x"]
    return sorted(df["mp_indexInArray"].astype(int).values.tolist())


def shuffle_and_split(items: Sequence, seed: int = 42,
                      split_ratio: float = 0.8) -> Tuple[list, list]:
    """Seeded shuffle + 80/20 split (1_prepare_dataset.py:10-17)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(items))
    cut = int(split_ratio * len(items))
    return ([items[i] for i in order[:cut]],
            [items[i] for i in order[cut:]])


def read_raw_videos(h5_path: str, allowed_names: Optional[set],
                    idx_keypoints: Optional[Sequence[int]]
                    ) -> List[Tuple[str, np.ndarray]]:
    """Read the external per-video-group schema (got_h5_data,
    1_prepare_dataset.py:55-74): group['data'] is (T, C, K_all), sliced on
    the keypoint axis."""
    import h5py

    out = []
    with h5py.File(h5_path, "r") as f:
        for gname in f:
            g = f[gname]
            name = g["video_name"][...].item()
            if isinstance(name, bytes):
                name = name.decode()
            if allowed_names is not None and name not in allowed_names:
                continue
            data = np.asarray(g["data"], np.float32)
            if idx_keypoints is not None:
                data = data[:, :, list(idx_keypoints)]
            # raw layout (T, 2, 54) -> (T, 54, 2) as dataloader.py:267
            out.append((name, np.transpose(data, (0, 2, 1))))
    return out


def prepare_dataset(h5_path: str, output_dir: str, dataset_name: str,
                    csv_path: Optional[str] = None,
                    landmarks_csv: Optional[str] = None,
                    seed: int = 42) -> Tuple[str, str]:
    """Full ETL for one dataset; returns (train_path, valid_path)."""
    from .hdf5_io import write_split

    allowed = None
    if csv_path:
        import pandas as pd
        allowed = set(pd.read_csv(csv_path, encoding="utf-8")
                      ["Video Name"].astype(str).tolist())
    idx = None
    if landmarks_csv:
        idx = select_indices_from_catalog_csv(landmarks_csv)

    videos = read_raw_videos(h5_path, allowed, idx)
    for name, v in videos:
        if v.shape[1] != NUM_KEYPOINTS:
            raise ValueError(
                f"{name}: expected {NUM_KEYPOINTS} keypoints, got "
                f"{v.shape[1]} — pass landmarks_csv to select 54")

    train, valid = shuffle_and_split(videos, seed=seed)
    os.makedirs(output_dir, exist_ok=True)
    train_path = os.path.join(output_dir, f"training--{dataset_name}.hdf5")
    valid_path = os.path.join(output_dir, f"validation--{dataset_name}.hdf5")
    write_split(train_path, [v for _, v in train],
                names=[n for n, _ in train])
    write_split(valid_path, [v for _, v in valid],
                names=[n for n, _ in valid])
    return train_path, valid_path


def prepare_main(args) -> int:
    if args.synthetic:
        from .synthetic import write_synthetic_split
        os.makedirs(args.output_dir, exist_ok=True)
        tr = os.path.join(args.output_dir, f"training--{args.dataset}.hdf5")
        va = os.path.join(args.output_dir,
                          f"validation--{args.dataset}.hdf5")
        n = args.synthetic
        write_synthetic_split(tr, max(1, int(n * 0.8)), seed=42)
        write_synthetic_split(va, max(1, n - int(n * 0.8)), seed=43)
        print(tr)
        print(va)
        return 0

    from ..utils.registry import load_registry
    reg = load_registry(args.dataset_config
                        if os.path.exists(args.dataset_config) else None)
    cfg = reg.get(args.dataset, {})
    tr, va = prepare_dataset(
        cfg.get("hdf5_file"), args.output_dir, args.dataset,
        csv_path=cfg.get("csv_file"),
        landmarks_csv=cfg.get("landmarks_csv"))
    print(tr)
    print(va)
    return 0
