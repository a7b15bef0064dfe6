"""Working equivalents of the reference's legacy SPOTER-style helpers.

The reference carries a block of dictionary/numpy conversion utilities
inherited from SPOTER (augmentation.py:36-118) that is dead AND broken
there: the module-level copies reference an undefined global
``BODY_IDENTIFIERS`` (only ``self.BODY_IDENTIFIERS`` of a never-
instantiated class exists) and ``__dictionary_to_numpy`` hardcodes a
"leftEar" key from a different keypoint catalog.  These are faithful,
WORKING re-derivations over this package's 54-point catalog
(data/keypoints.PART_NAMES), kept for interoperability with SPOTER-style
dictionary pipelines:

  * numpy_to_dictionary / dictionary_to_numpy  (augmentation.py:36-62)
  * rotate_point                               (augmentation.py:65-82)
  * split_body_hands / wrap_sign_into_row      (augmentation.py:84-118,
    including the reference quirk that the "body" identifier set is the
    FULL pose+face+hand catalog — bodyKeypointMap's pose section
    includes face, dataloader.py:33 — so body and hands overlap)

The live augmentation math is in transforms/augment.py; nothing here is
on the training path.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from ..data.keypoints import PART_NAMES, body_map


def numpy_to_dictionary(data: np.ndarray) -> Dict[str, List]:
    """(T, K, 2) array -> {part_name: [(x, y), ...]} in catalog order."""
    data = np.asarray(data)
    return {name: data[:, i].tolist() for i, name in enumerate(PART_NAMES)}


def dictionary_to_numpy(landmarks: Dict[str, List]) -> np.ndarray:
    """{part_name: [(x, y), ...]} -> (T, K, 2) array in catalog order."""
    T = len(landmarks[PART_NAMES[0]])
    out = np.empty((T, len(PART_NAMES), 2), dtype=np.float64)
    for i, name in enumerate(PART_NAMES):
        arr = np.asarray(landmarks[name], dtype=np.float64)
        out[:, i, 0] = arr[:, 0]
        out[:, i, 1] = arr[:, 1]
    return out


def rotate_point(origin: Tuple[float, float], point: Tuple[float, float],
                 angle: float) -> Tuple[float, float]:
    """Rotate ``point`` counterclockwise by ``angle`` around ``origin``
    (reference __rotate, augmentation.py:65-82)."""
    ox, oy = origin
    px, py = point
    qx = ox + math.cos(angle) * (px - ox) - math.sin(angle) * (py - oy)
    qy = oy + math.sin(angle) * (px - ox) + math.cos(angle) * (py - oy)
    return qx, qy


def split_body_hands(sign: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, K, 2) -> (body, hands) landmark arrays by the catalog's
    identifier sets (reference __preprocess_row_sign — note body is the
    full pose+face+hands set, the bodyKeypointMap quirk)."""
    bm = body_map()
    sign = np.asarray(sign)
    return (sign[:, list(bm.body_identifiers)],
            sign[:, list(bm.hand_identifiers)])


def wrap_sign_into_row(body: np.ndarray, hands: np.ndarray) -> np.ndarray:
    """Concatenate body and hand landmark arrays along the keypoint axis
    (reference __wrap_sign_into_row, torch.cat dim=1)."""
    return np.concatenate([np.asarray(body), np.asarray(hands)], axis=1)
