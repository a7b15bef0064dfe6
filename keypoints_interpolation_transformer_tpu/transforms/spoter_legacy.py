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


# ---------------------------------------------------------------------------
# Bohacek-style legacy normalizers (reference body_normalization.py) — the
# last dead/unimported reference module, re-derived WORKING (the original
# is broken on modern pandas: DataFrame.append was removed, and its
# "return original_row on failure" aliases the mutated row object, so the
# claimed rollback never happens).  The live, vmapped equivalent of this
# scheme is transforms/normalize.py; nothing here is on the training path.
# ---------------------------------------------------------------------------

# reference body_normalization.py:5-18
BOHACEK_BODY_IDENTIFIERS = [
    "nose", "neck", "rightEye", "leftEye", "rightEar", "leftEar",
    "rightShoulder", "leftShoulder", "rightElbow", "leftElbow",
    "rightWrist", "leftWrist",
]


def _bohacek_box(frame_xy, last_box, eye_offset: float):
    """Per-frame signing-space box (body_normalization.py:53-95).

    frame_xy: {identifier: (x, y)}.  Returns ((sx, sy), (ex, ey)) or None
    when no box can be formed yet (pre-first-valid frames are skipped, as
    the reference's ``continue`` does).  ``eye_offset`` is the leftEye_Y
    offset in head-metric units: the DataFrame variant uses 0.5
    (:86), the dict variant 1.0 (:184 — the halved form is commented out
    there).
    """
    ls, rs = frame_xy["leftShoulder"], frame_xy["rightShoulder"]
    neck, nose = frame_xy["neck"], frame_xy["nose"]
    if (ls[0] == 0 or rs[0] == 0) and (neck[0] == 0 or nose[0] == 0):
        return last_box  # carry forward (or None before the first box)
    if ls[0] != 0 and rs[0] != 0:
        head = math.hypot(ls[0] - rs[0], ls[1] - rs[1])
    else:
        head = math.hypot(neck[0] - nose[0], neck[1] - nose[1])
    sx = neck[0] - 3 * head
    sy = frame_xy["leftEye"][1] + eye_offset * head
    ex = neck[0] + 3 * head
    ey = sy - 6 * head
    # clamp every box coordinate at 0 (:92-95)
    return (max(sx, 0.0), max(sy, 0.0)), (max(ex, 0.0), max(ey, 0.0))


def normalize_single_dict(row: Dict[str, List], *, eye_offset: float = 1.0):
    """Bohacek normalization of one sign sequence in dictionary form
    (reference body_normalization.normalize_single_dict, :128-221).

    ``row`` maps each BOHACEK_BODY_IDENTIFIERS name to a length-T list of
    (x, y) pairs.  Returns a NEW dict (the reference mutates in place and
    its failure rollback is defeated by aliasing — here the input is
    never touched and a degenerate box genuinely returns the input
    unchanged).  Zero-x landmarks are skipped; frames before the first
    valid box stay unnormalized.
    """
    T = len(row["leftEar"])
    out = {k: [list(p) for p in v] for k, v in row.items()}
    last_box = None
    for t in range(T):
        frame = {k: tuple(out[k][t]) for k in BOHACEK_BODY_IDENTIFIERS}
        box = _bohacek_box(frame, last_box, eye_offset)
        if box is None:
            continue
        last_box = box
        (sx, sy), (ex, ey) = box
        if ex - sx == 0 or sy - ey == 0:   # :204-207
            return {k: [list(p) for p in v] for k, v in row.items()}
        for key in BOHACEK_BODY_IDENTIFIERS:
            x, y = out[key][t][0], out[key][t][1]
            if x == 0:                      # :201-202
                continue
            out[key][t][0] = (x - sx) / (ex - sx)
            out[key][t][1] = (y - ey) / (sy - ey)
    return out


def normalize_body_full(df):
    """Bohacek normalization of a DataFrame of sequences (reference
    body_normalization.normalize_body_full, :21-125): one row per video,
    columns ``{identifier}_X`` / ``{identifier}_Y`` each holding a
    length-T list.  Returns (normalized_df, invalid_row_indexes); rows
    with no valid frame at the start are flagged invalid and returned
    unnormalized (the reference's intent — its actual rollback is an
    aliasing no-op, and DataFrame.append no longer exists).
    """
    import pandas as pd

    out_rows = []
    invalid = []
    for index, row in df.iterrows():
        T = len(row["leftEar_Y"])
        seq = {k: [(row[k + "_X"][t], row[k + "_Y"][t]) for t in range(T)]
               for k in BOHACEK_BODY_IDENTIFIERS}
        first_ok = any(
            not ((seq["leftShoulder"][t][0] == 0
                  or seq["rightShoulder"][t][0] == 0)
                 and (seq["neck"][t][0] == 0 or seq["nose"][t][0] == 0))
            for t in range(T))
        if not first_ok:
            invalid.append(index)
            out_rows.append(row)
            continue
        norm = normalize_single_dict(seq, eye_offset=0.5)  # :86 variant
        new = row.copy()
        for k in BOHACEK_BODY_IDENTIFIERS:
            new[k + "_X"] = [p[0] for p in norm[k]]
            new[k + "_Y"] = [p[1] for p in norm[k]]
        out_rows.append(new)
    return pd.DataFrame(out_rows, columns=df.columns), invalid
