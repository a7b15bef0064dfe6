"""The 54-keypoint catalog and skeleton-edge table.

The reference repo depends on two external CSVs it does not ship:
``Mapeo landmarks librerias.csv`` (keypoint catalog, consumed at
/root/reference/dataloader.py:236-243) and ``points_54.csv`` (skeleton edges,
/root/reference/utils.py:103-113).  This module ships both as first-class
Python tables so the framework is self-contained.

Layout of the 54 keypoints (sections and their sizes):
  pose      (10): nose, eyes, shoulders, elbows, wrists, chest_middle_up
  face       (2): mouth corners
  leftHand  (21): MediaPipe hand landmarks
  rightHand (21): MediaPipe hand landmarks

Named parts the preprocessing code requires (see reference
dataloader.py:81,101,120,303-308,453-457 and augmentation.py:21-22):
  pose_left_shoulder, pose_right_shoulder, pose_right_eye, pose_left_wrist,
  pose_right_wrist, pose_chest_middle_up, pose_left_elbow, pose_right_elbow,
  rightHand_thumb_tip, rightHand_middle_finger_dip, leftHand_thumb_tip,
  leftHand_middle_finger_dip.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

NUM_KEYPOINTS = 54
NUM_COORDS = 2
FRAME_FEATURES = NUM_KEYPOINTS * NUM_COORDS  # 108

_POSE_PARTS = [
    "nose",
    "left_eye",
    "right_eye",
    "left_shoulder",
    "right_shoulder",
    "left_elbow",
    "right_elbow",
    "left_wrist",
    "right_wrist",
    "chest_middle_up",
]

_FACE_PARTS = [
    "mouth_left",
    "mouth_right",
]

_HAND_PARTS = [
    "wrist",
    "thumb_cmc",
    "thumb_mcp",
    "thumb_ip",
    "thumb_tip",
    "index_finger_mcp",
    "index_finger_pip",
    "index_finger_dip",
    "index_finger_tip",
    "middle_finger_mcp",
    "middle_finger_pip",
    "middle_finger_dip",
    "middle_finger_tip",
    "ring_finger_mcp",
    "ring_finger_pip",
    "ring_finger_dip",
    "ring_finger_tip",
    "pinky_mcp",
    "pinky_pip",
    "pinky_dip",
    "pinky_tip",
]


def _build_tables():
    sections, parts = [], []
    for p in _POSE_PARTS:
        sections.append("pose")
        parts.append(f"pose_{p}")
    for p in _FACE_PARTS:
        sections.append("face")
        parts.append(f"face_{p}")
    for hand in ("leftHand", "rightHand"):
        for p in _HAND_PARTS:
            sections.append(hand)
            parts.append(f"{hand}_{p}")
    return tuple(sections), tuple(parts)


SECTIONS, PART_NAMES = _build_tables()
assert len(PART_NAMES) == NUM_KEYPOINTS


@dataclasses.dataclass(frozen=True)
class BodyMap:
    """Index sets per body section.

    Mirrors the semantics of the reference's ``bodyKeypointMap``
    (dataloader.py:31-44), including its quirk that the ``pose`` index set
    contains both the 'pose' and 'face' sections.
    """

    pose: tuple  # 'pose' + 'face' sections (reference quirk, dataloader.py:33)
    face: tuple
    left_hand: tuple
    right_hand: tuple
    index_of: dict  # part name -> column index

    @property
    def body_identifiers(self) -> tuple:
        """pose(+face) + leftHand + rightHand — the augmentation working set."""
        return self.pose + self.left_hand + self.right_hand

    @property
    def hand_identifiers(self) -> tuple:
        return self.left_hand + self.right_hand

    @property
    def arm_chains(self) -> tuple:
        """Per-side arm kinematic chains used by the arm-joint-rotate
        augmentation (reference augmentation.py:21-25)."""
        left = ("pose_chest_middle_up", "pose_left_shoulder",
                "pose_left_elbow", "pose_left_wrist")
        right = ("pose_chest_middle_up", "pose_right_shoulder",
                 "pose_right_elbow", "pose_right_wrist")
        return (
            tuple(self.index_of[p] for p in left),
            tuple(self.index_of[p] for p in right),
        )


@lru_cache(maxsize=1)
def body_map(sections=SECTIONS, parts=PART_NAMES) -> BodyMap:
    pose = tuple(i for i, s in enumerate(sections) if s in ("pose", "face"))
    face = tuple(i for i, s in enumerate(sections) if s == "face")
    left = tuple(i for i, s in enumerate(sections) if s == "leftHand")
    right = tuple(i for i, s in enumerate(sections) if s == "rightHand")
    return BodyMap(
        pose=pose,
        face=face,
        left_hand=left,
        right_hand=right,
        index_of={p: i for i, p in enumerate(parts)},
    )


def _hand_edges(base: int):
    """MediaPipe hand connectivity, offset by the hand's first column."""
    local = [
        (0, 1), (1, 2), (2, 3), (3, 4),          # thumb
        (0, 5), (5, 6), (6, 7), (7, 8),          # index
        (5, 9), (9, 10), (10, 11), (11, 12),     # middle
        (9, 13), (13, 14), (14, 15), (15, 16),   # ring
        (13, 17), (17, 18), (18, 19), (19, 20),  # pinky
        (0, 17),                                  # palm base
    ]
    return [(base + a, base + b) for a, b in local]


@lru_cache(maxsize=1)
def skeleton_edges() -> np.ndarray:
    """(E, 2) int array of (origin, target) keypoint-column pairs.

    Replaces the external ``points_54.csv`` consumed by the reference's
    rendering (utils.py:103-113) and quaternion baseline
    (test_quaternion.py:198-201).
    """
    bm = body_map()
    idx = bm.index_of
    pose_edges = [
        (idx["pose_nose"], idx["pose_left_eye"]),
        (idx["pose_nose"], idx["pose_right_eye"]),
        (idx["pose_nose"], idx["pose_chest_middle_up"]),
        (idx["pose_chest_middle_up"], idx["pose_left_shoulder"]),
        (idx["pose_chest_middle_up"], idx["pose_right_shoulder"]),
        (idx["pose_left_shoulder"], idx["pose_left_elbow"]),
        (idx["pose_left_elbow"], idx["pose_left_wrist"]),
        (idx["pose_right_shoulder"], idx["pose_right_elbow"]),
        (idx["pose_right_elbow"], idx["pose_right_wrist"]),
        (idx["face_mouth_left"], idx["face_mouth_right"]),
        (idx["pose_left_wrist"], idx["leftHand_wrist"]),
        (idx["pose_right_wrist"], idx["rightHand_wrist"]),
    ]
    edges = pose_edges
    edges += _hand_edges(idx["leftHand_wrist"])
    edges += _hand_edges(idx["rightHand_wrist"])
    return np.asarray(edges, dtype=np.int32)


def edges_index() -> np.ndarray:
    """(2, E) origin/target arrays — same layout as the reference's
    ``get_edges_index`` (utils.py:103-113)."""
    e = skeleton_edges()
    return np.stack([e[:, 0], e[:, 1]])


def write_edges_csv(path: str) -> None:
    """Materialize the skeleton edges in the reference's points_54.csv
    schema (1-indexed 'origin'/'tarjet' columns, utils.py:103-113)."""
    e = skeleton_edges()
    lines = ["origin,tarjet"]
    lines += [f"{a + 1},{b + 1}" for a, b in e]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_catalog_csv(path: str) -> None:
    """Materialize the catalog in the external-CSV schema the reference
    expects (columns: Selected 54, mp_indexInArray, Key, Section), so
    reference-formatted tooling can consume our table."""
    lines = ["# keypoint catalog (generated)",
             "Selected 54,mp_indexInArray,Key,Section"]
    for i, (sec, part) in enumerate(zip(SECTIONS, PART_NAMES)):
        key = part.split(f"{sec}_", 1)[-1]
        lines.append(f"x,{i},{key},{sec}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
