"""Dataset registry — JSON-compatible with the reference's
``dataset_config.json`` (loaded via utils.py:115-120).

Ships the three reference datasets' missingness statistics
(dataset_config.json:1-29) as defaults and reads user JSON overlays with the
same schema.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

from ..transforms.corruption import DatasetMissingStats

_BUILTIN: Dict[str, dict] = {
    "AUTSL": {
        "mean_consecutive_missing": 5.28,
        "std_consecutive_missing": 4.15,
        "samples": 491,
        "mean_number_missing_blocks": 4.18,
        "std_number_missing_blocks": 1.78,
    },
    "AEC": {
        "mean_consecutive_missing": 3.25,
        "std_consecutive_missing": 3.09,
        "samples": 267,
        "mean_number_missing_blocks": 1.92,
        "std_number_missing_blocks": 1.1,
    },
    "PUCP_PSL_DGI305": {
        "mean_consecutive_missing": 4.04,
        "std_consecutive_missing": 5.63,
        "samples": 185,
        "mean_number_missing_blocks": 1.66,
        "std_number_missing_blocks": 1.11,
    },
}


def load_registry(path: Optional[str] = None) -> Dict[str, dict]:
    """Built-in registry, optionally overlaid with a dataset_config.json."""
    reg = {k: dict(v) for k, v in _BUILTIN.items()}
    if path:
        with open(path) as f:
            for name, cfg in json.load(f).items():
                reg.setdefault(name, {}).update(cfg)
    return reg


def missing_stats(dataset_name: str,
                  path: Optional[str] = None) -> Optional[DatasetMissingStats]:
    """Stats for the per-dataset corruption mode; None for 'all'."""
    if dataset_name == "all":
        return None
    cfg = load_registry(path).get(dataset_name)
    if cfg is None:
        raise KeyError(f"dataset {dataset_name!r} not in registry; "
                       "add it to dataset_config.json")
    return DatasetMissingStats(
        mean_consecutive_missing=cfg["mean_consecutive_missing"],
        std_consecutive_missing=cfg["std_consecutive_missing"],
        mean_number_missing_blocks=cfg["mean_number_missing_blocks"],
        std_number_missing_blocks=cfg["std_number_missing_blocks"],
        samples=int(cfg["samples"]),
    )


def dataset_name_from_path(path: str) -> str:
    """'data/validation--AUTSL.hdf5' -> 'AUTSL' (dataloader.py:562)."""
    return path.split("--")[-1].split(".")[0]
