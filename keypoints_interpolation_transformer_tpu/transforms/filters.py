"""Load-time video filters — vectorized numpy, host-side (run once).

Re-derivation of the reference's bad-video filter
(dataloader.py:439-480).  Semantics preserved exactly, including the
reference's control-flow quirks:

  * videos shorter than 10 frames are dropped — EXCEPT zero-length videos,
    which fall through the detection loop and are kept (dataloader.py:444,
    449-464);
  * the 8-frame head/tail trim happens on a local variable only — the
    stored video is NOT trimmed (dataloader.py:447 rebinds a local); the
    trim only scopes which frames are inspected;
  * a frame is "bad" when a wrist coincides (any coordinate) with both the
    hand's thumb tip and middle-finger DIP — a failed-hand-detection
    heuristic (dataloader.py:453-461);
  * the bad flag is checked at the TOP of the next iteration, so a bad
    LAST inspected frame alone never rejects the video
    (dataloader.py:449-464).
"""

from __future__ import annotations

import numpy as np

from ..data.keypoints import body_map


def is_bad_video(video: np.ndarray, bm=None) -> bool:
    """True if the video should be dropped."""
    bm = bm or body_map()
    n = len(video)
    if n == 0:
        return False      # reference quirk: empty video falls through
    if n < 10:
        return True
    v = video[8:-8]       # inspection window only; stored video untouched
    if len(v) == 0:
        return False

    idx = bm.index_of
    rw = v[:, idx["pose_right_wrist"]]
    lw = v[:, idx["pose_left_wrist"]]
    bad_r = (np.any(rw == v[:, idx["rightHand_thumb_tip"]], axis=1)
             & np.any(rw == v[:, idx["rightHand_middle_finger_dip"]], axis=1))
    bad_l = (np.any(lw == v[:, idx["leftHand_thumb_tip"]], axis=1)
             & np.any(lw == v[:, idx["leftHand_middle_finger_dip"]], axis=1))
    bad = bad_r | bad_l
    # flag is observed one iteration late: the final frame alone can't reject
    return bool(np.any(bad[:-1]))


def filter_videos(videos, bm=None):
    """Return (kept_videos, dropped_count) — reference filter_videos
    (dataloader.py:466-480) without the in-place pop loop."""
    bm = bm or body_map()
    kept = [v for v in videos if not is_bad_video(v, bm)]
    return kept, len(videos) - len(kept)
