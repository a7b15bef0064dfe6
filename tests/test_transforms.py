"""Transforms: golden parity against loop oracles (normalization), cv2
(homography), and structural property tests (corruption, augmentation,
filters)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from keypoints_interpolation_transformer_tpu.data.keypoints import body_map
from keypoints_interpolation_transformer_tpu.transforms import augment
from keypoints_interpolation_transformer_tpu.transforms.corruption import (
    DatasetMissingStats, add_sos, missing_blocks_all, missing_blocks_dataset,
    put_missing_frames, random_missing, zero_missing_frames)
from keypoints_interpolation_transformer_tpu.transforms.filters import (
    is_bad_video)
from keypoints_interpolation_transformer_tpu.transforms.normalize import (
    normalize_pose, normalize_pose_batch)

BM = body_map()


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def _normalize_oracle(video):
    """Frame/keypoint loop oracle for signing-space normalization, following
    dataloader.py:71-140 step by step."""
    v = video.copy()
    i_ls = BM.index_of["pose_left_shoulder"]
    i_rs = BM.index_of["pose_right_shoulder"]
    i_re = BM.index_of["pose_right_eye"]
    last = None
    for t in range(len(v)):
        if v[t, i_ls, 0] == 0.0 or v[t, i_rs, 0] == 0.0:
            if last is None:
                continue
            start, end = last
        else:
            ls, rs = v[t, i_ls], v[t, i_rs]
            head = np.hypot(ls[0] - rs[0], ls[1] - rs[1]) / 2
            start = (0.5 - 3 * head, v[t, i_re, 1] - head / 2)
            end = (0.5 + 3 * head, 0.5 + 3.5 * head)
            last = (start, end)
        for k in range(v.shape[1]):
            if v[t, k, 0] == 0.0:
                continue
            nx = (v[t, k, 0] - start[0]) / (end[0] - start[0])
            ny = (v[t, k, 1] - end[1]) / (start[1] - end[1])
            v[t, k, 0] = nx
            v[t, k, 1] = 1 - ny
    return v


def _synth_video(rng, t=12, zero_frames=(), zero_kps=()):
    v = rng.uniform(0.1, 0.9, size=(t, 54, 2)).astype(np.float32)
    for f in zero_frames:
        v[f, BM.index_of["pose_left_shoulder"], 0] = 0.0
    for (f, k) in zero_kps:
        v[f, k, 0] = 0.0
    return v


def test_normalize_matches_loop_oracle(rng):
    v = _synth_video(rng, zero_frames=[0, 3, 4], zero_kps=[(2, 20), (5, 7)])
    got = np.asarray(normalize_pose(jnp.asarray(v)))
    want = _normalize_oracle(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_leading_invalid_frames_untouched(rng):
    v = _synth_video(rng, zero_frames=[0, 1])
    got = np.asarray(normalize_pose(jnp.asarray(v)))
    np.testing.assert_array_equal(got[:2], v[:2])  # no bbox yet
    assert not np.allclose(got[2:], v[2:])


def test_normalize_batch_vmap(rng):
    vs = np.stack([_synth_video(rng), _synth_video(rng)])
    got = np.asarray(normalize_pose_batch(jnp.asarray(vs)))
    for b in range(2):
        np.testing.assert_allclose(got[b], _normalize_oracle(vs[b]),
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# corruption
# ---------------------------------------------------------------------------

def test_random_missing_zeroes_and_mask(rng):
    v = rng.uniform(0.1, 1.0, size=(20, 54, 2)).astype(np.float32)
    out, mask = random_missing(jax.random.key(0), jnp.asarray(v))
    out, mask = np.asarray(out), np.asarray(mask)
    assert mask.shape == (20,)
    assert 1 <= mask.sum() <= 12  # 60% with replacement -> <= 12 unique
    np.testing.assert_array_equal(out[mask == 1], 0.0)
    np.testing.assert_array_equal(out[mask == 0], v[mask == 0])


def test_random_missing_respects_t_actual(rng):
    v = rng.uniform(0.1, 1.0, size=(20, 54, 2)).astype(np.float32)
    out, mask = random_missing(jax.random.key(1), jnp.asarray(v), t_actual=10)
    mask = np.asarray(mask)
    assert mask[10:].sum() == 0          # padding untouched
    assert 1 <= mask[:10].sum() <= 6


def test_blocks_all_freeze_fill(rng):
    v = rng.uniform(0.1, 1.0, size=(40, 54, 2)).astype(np.float32)
    out, mask = missing_blocks_all(jax.random.key(2), jnp.asarray(v))
    out, mask = np.asarray(out), np.asarray(mask)
    assert mask.sum() > 0
    # every masked frame is a freeze-frame copy of SOME original frame
    # (possibly one a later block masks — the reference copies in block
    # order from the mutating buffer)
    for t in np.flatnonzero(mask):
        assert any(np.array_equal(out[t], v[s]) for s in range(len(v))), t
    # unmasked frames unchanged
    np.testing.assert_array_equal(out[mask == 0], v[mask == 0])


def test_blocks_all_block_structure(rng):
    v = rng.uniform(0.1, 1.0, size=(60, 54, 2)).astype(np.float32)
    for seed in range(5):
        _, mask = missing_blocks_all(jax.random.key(seed), jnp.asarray(v))
        mask = np.asarray(mask)
        # blocks are per-section runs of <= 8 frames; adjacent blocks can
        # merge when a block fills its whole section (offset is pinned to 0
        # in mode "all"), so a maximal run spans at most 2 blocks
        runs = np.diff(np.flatnonzero(np.diff(
            np.concatenate([[0], mask, [0]]))).reshape(-1, 2), axis=1)
        assert np.all(runs >= 1) and np.all(runs <= 16)
        assert 1 <= len(runs) <= 7


def test_blocks_dataset_mode(rng):
    stats = DatasetMissingStats(
        mean_consecutive_missing=4.0, std_consecutive_missing=2.0,
        mean_number_missing_blocks=2.0, std_number_missing_blocks=1.0,
        samples=200)
    v = rng.uniform(0.1, 1.0, size=(50, 54, 2)).astype(np.float32)
    out, mask = missing_blocks_dataset(jax.random.key(3), jnp.asarray(v),
                                       stats)
    out, mask = np.asarray(out), np.asarray(mask)
    assert 0 < mask.sum() < 50
    np.testing.assert_array_equal(out[mask == 0], v[mask == 0])


def test_put_missing_frames_dispatch(rng):
    v = jnp.asarray(rng.uniform(0.1, 1.0, size=(30, 54, 2)).astype(np.float32))
    out, mask = put_missing_frames(jax.random.key(0), v,
                                   is_random_missing=True)
    assert np.asarray(mask).sum() > 0
    out, mask = put_missing_frames(jax.random.key(0), v, dataset_name="all")
    assert np.asarray(mask).sum() > 0


def test_zero_missing_and_sos(rng):
    v = rng.uniform(0.1, 1.0, size=(6, 54, 2)).astype(np.float32)
    mask = np.array([0, 1, 0, 0, 1, 0], np.float32)
    z = np.asarray(zero_missing_frames(jnp.asarray(v), jnp.asarray(mask)))
    np.testing.assert_array_equal(z[1], 0.0)
    np.testing.assert_array_equal(z[0], v[0])

    out, m2 = add_sos(jnp.asarray(v), jnp.asarray(mask))
    assert out.shape == (7, 54, 2)
    np.testing.assert_array_equal(np.asarray(out)[0], 1.0)
    np.testing.assert_array_equal(np.asarray(m2), [0, 0, 1, 0, 0, 1, 0])

    batched = add_sos(jnp.asarray(v)[None])
    assert batched.shape == (1, 7, 54, 2)


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------

def test_rotate_is_isometry_about_center(rng):
    v = rng.uniform(0.1, 0.9, size=(5, 54, 2)).astype(np.float32)
    out = np.asarray(augment.rotate(jax.random.key(0), jnp.asarray(v)))
    c = np.array([0.5, 0.5])
    r_in = np.linalg.norm(v - c, axis=-1)
    r_out = np.linalg.norm(out - c, axis=-1)
    np.testing.assert_allclose(r_in, r_out, atol=1e-5)
    assert not np.allclose(out, v)


def test_rotate_double_hand_quirk(rng):
    v = rng.uniform(0.1, 0.9, size=(3, 54, 2)).astype(np.float32)
    key = jax.random.key(1)
    twice = np.asarray(augment.rotate(key, jnp.asarray(v),
                                      double_hand_rotation=True))
    once = np.asarray(augment.rotate(key, jnp.asarray(v),
                                     double_hand_rotation=False))
    pose_only = [i for i in BM.pose if i not in BM.hand_identifiers]
    np.testing.assert_allclose(twice[:, pose_only], once[:, pose_only],
                               atol=1e-6)
    hands = list(BM.hand_identifiers)
    assert not np.allclose(twice[:, hands], once[:, hands])


def test_homography_matches_cv2(rng):
    src = np.array([[0, 1], [1, 1], [0, 0], [1, 0]], np.float32)
    dst = rng.uniform(-0.2, 1.2, size=(4, 2)).astype(np.float32)
    H_cv = cv2.getPerspectiveTransform(src, dst)
    H_us = np.asarray(augment.perspective_transform_matrix(
        jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(H_us / H_us[2, 2], H_cv / H_cv[2, 2],
                               atol=1e-4)

    pts = rng.uniform(0, 1, size=(7, 2)).astype(np.float32)
    want = cv2.perspectiveTransform(pts[None], H_cv)[0]
    got = np.asarray(augment.apply_homography(jnp.asarray(pts),
                                              jnp.asarray(H_us)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_shear_pins_zero_landmarks(rng):
    v = rng.uniform(0.1, 0.9, size=(4, 54, 2)).astype(np.float32)
    v[:, 5, :] = 0.0  # an undetected landmark
    out = np.asarray(augment.shear(jax.random.key(2), jnp.asarray(v),
                                   "squeeze"))
    np.testing.assert_array_equal(out[:, 5, :], 0.0)
    assert not np.allclose(out[:, 6, :], v[:, 6, :])


def test_arm_joint_rotate_preserves_upstream_and_bones(rng):
    v = rng.uniform(0.1, 0.9, size=(4, 54, 2)).astype(np.float32)
    out = np.asarray(augment.arm_joint_rotate(
        jax.random.key(3), jnp.asarray(v), probability=1.0))
    chest = BM.index_of["pose_chest_middle_up"]
    np.testing.assert_array_equal(out[:, chest], v[:, chest])  # chain root
    # bone lengths along each chain preserved (rotations are isometries)
    for chain in BM.arm_chains:
        for a, b in zip(chain[:-1], chain[1:]):
            li = np.linalg.norm(v[:, a] - v[:, b], axis=-1)
            lo = np.linalg.norm(out[:, a] - out[:, b], axis=-1)
            np.testing.assert_allclose(li, lo, atol=1e-5)
    assert not np.allclose(out, v)


def test_random_augment_gate(rng):
    v = jnp.asarray(rng.uniform(0.1, 0.9, size=(4, 54, 2)).astype(np.float32))
    out_never = augment.random_augment(jax.random.key(0), v, probability=0.0)
    np.testing.assert_array_equal(np.asarray(out_never), np.asarray(v))
    out_always = augment.random_augment(jax.random.key(0), v,
                                        probability=1.0)
    assert not np.allclose(np.asarray(out_always), np.asarray(v))
    # jit-compatible
    jitted = jax.jit(lambda k, v: augment.random_augment(k, v, 0.5))
    jitted(jax.random.key(1), v)


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def test_filter_short_and_empty(rng):
    assert is_bad_video(np.zeros((5, 54, 2), np.float32))
    assert not is_bad_video(np.zeros((0, 54, 2), np.float32))  # quirk


def test_filter_bad_hands(rng):
    v = rng.uniform(0.1, 0.9, size=(30, 54, 2)).astype(np.float32)
    assert not is_bad_video(v)
    bad = v.copy()
    i = BM.index_of
    # wrist coincides with thumb tip and middle dip on an inspected frame
    bad[15, i["rightHand_thumb_tip"]] = bad[15, i["pose_right_wrist"]]
    bad[15, i["rightHand_middle_finger_dip"]] = bad[15, i["pose_right_wrist"]]
    assert is_bad_video(bad)

    # ... but on the LAST inspected frame only, the reference keeps it
    last = v.copy()
    last[-9, i["rightHand_thumb_tip"]] = last[-9, i["pose_right_wrist"]]
    last[-9, i["rightHand_middle_finger_dip"]] = last[-9, i["pose_right_wrist"]]
    assert not is_bad_video(last)


# ---------------------------------------------------------------------------
# inventory-completeness helpers (dead in the reference, public here)
# ---------------------------------------------------------------------------

def test_normalize_hand_bbox(rng):
    from keypoints_interpolation_transformer_tpu.transforms.normalize import (
        normalize_hand)
    pts = rng.uniform(0.2, 0.8, size=(3, 21, 2)).astype(np.float32)
    out = np.asarray(normalize_hand(jnp.asarray(pts)))
    # normalized into the margin box: strictly inside (0, 1)
    assert out.min() > 0.0 and out.max() < 1.0
    # zero landmarks skipped
    pts[:, 4, 0] = 0.0
    out = np.asarray(normalize_hand(jnp.asarray(pts)))
    np.testing.assert_array_equal(out[:, 4], pts[:, 4])


def test_put_missing_values_collapses_hands(rng):
    from keypoints_interpolation_transformer_tpu.transforms.corruption import (
        put_missing_values)
    v = rng.uniform(0.1, 0.9, size=(12, 54, 2)).astype(np.float32)
    out, chosen = put_missing_values(jax.random.key(3), jnp.asarray(v))
    out, chosen = np.asarray(out), np.asarray(chosen)
    i = BM.index_of
    hit = False
    for t in range(12):
        if chosen[t] in (0, 2):
            np.testing.assert_array_equal(
                out[t, list(BM.left_hand)],
                np.tile(v[t, i["pose_left_wrist"]], (21, 1)))
            hit = True
        if chosen[t] in (1, 2):
            np.testing.assert_array_equal(
                out[t, list(BM.right_hand)],
                np.tile(v[t, i["pose_right_wrist"]], (21, 1)))
            hit = True
        if chosen[t] == -1:
            np.testing.assert_array_equal(out[t], v[t])
    assert hit


def test_add_sos_eos_and_chunks(rng):
    from keypoints_interpolation_transformer_tpu.transforms.corruption import (
        add_sos_eos, create_chunks, delete_last_sequence)
    v = jnp.asarray(rng.uniform(0.1, 0.9, size=(5, 54, 2)).astype(np.float32))
    out, m = add_sos_eos(v, jnp.ones(5))
    assert out.shape == (7, 54, 2)
    np.testing.assert_array_equal(np.asarray(out)[0], 1.0)      # SOS
    np.testing.assert_array_equal(np.asarray(out)[-1, :, 0], 0.0)  # EOS x
    np.testing.assert_array_equal(np.asarray(out)[-1, :, 1], 1.0)  # EOS y
    np.testing.assert_array_equal(np.asarray(m), [0, 1, 1, 1, 1, 1, 0])

    vv, mm = delete_last_sequence(v, jnp.ones(5))
    assert vv.shape == (4, 54, 2) and mm.shape == (4,)

    chunks = create_chunks([np.zeros((45, 54, 2)), np.zeros((7, 54, 2))])
    assert [len(c) for c in chunks] == [20, 20, 20, 7]


def test_dataset_corruption_distribution_matches_reference_logic(rng):
    """The per-dataset block mode must match a numpy re-simulation of the
    reference's sampling logic (dataloader.py:364-436) distributionally:
    mean masked-frame count and mean block count within 10%."""
    import math

    T = 80
    stats = DatasetMissingStats(
        mean_consecutive_missing=4.0, std_consecutive_missing=2.0,
        mean_number_missing_blocks=3.0, std_number_missing_blocks=1.5,
        samples=200)

    def ref_sim(r):
        bl = [np.percentile(r.normal(stats.mean_consecutive_missing,
                                     stats.std_consecutive_missing,
                                     stats.samples), p) for p in (25, 75)]
        bs = [np.percentile(r.normal(stats.mean_number_missing_blocks,
                                     stats.std_number_missing_blocks,
                                     stats.samples), p) for p in (25, 75)]
        nb_min = max(math.floor(bl[0]), 1)
        nb_max = max(math.ceil(bl[1]), nb_min)
        bs_min = max(math.floor(bs[0]), 1)
        bs_max = max(math.ceil(bs[1]), bs_min)
        nb = int(r.integers(nb_min, nb_max + 1))
        section = max(1, T // nb)
        rest = T % nb
        if section < bs_max + 4:
            section = max(bs_max + 4, 1)
            nb = max(1, T // section)
            rest = T % nb
        mask = np.zeros(T)
        for i in range(nb):
            nc = min(int(r.integers(bs_min, bs_max + 1)), section)
            rr = rest if i == nb - 1 else 0
            off = int(r.integers(0, rr + section - nc + 1))
            s = section * i + off
            e = min(s + nc, T - 1)
            mask[s:e] = 1
        return mask.sum(), nb

    trials = 300
    r = np.random.default_rng(7)
    ref = np.array([ref_sim(r) for _ in range(trials)])

    v = jnp.zeros((T, 54, 2))
    ours = []
    for i in range(trials):
        _, m = missing_blocks_dataset(jax.random.key(i), v, stats)
        ours.append(float(np.asarray(m).sum()))
    ours = np.array(ours)

    assert abs(ours.mean() - ref[:, 0].mean()) / ref[:, 0].mean() < 0.1, (
        ours.mean(), ref[:, 0].mean())


def test_dataset_stats_name_swap_is_faithful(rng):
    """The reference SWAPS its stat names (dataloader.py:368-383):
    ``mean_consecutive_missing`` drives the NUMBER of blocks and
    ``mean_number_missing_blocks`` drives the block SIZE.  Pin the quirk:
    (2, 14) stats must yield few long gaps, not fourteen 2-frame holes —
    a well-meaning "fix" here would silently change every corruption
    distribution (and invalidate registry overlays like the quality
    demo's)."""
    T = 96
    few_long = DatasetMissingStats(
        mean_consecutive_missing=2.0, std_consecutive_missing=0.5,
        mean_number_missing_blocks=14.0, std_number_missing_blocks=2.0,
        samples=200)
    many_short = DatasetMissingStats(
        mean_consecutive_missing=14.0, std_consecutive_missing=2.0,
        mean_number_missing_blocks=2.0, std_number_missing_blocks=0.5,
        samples=200)

    def block_stats(stats, trials=100):
        v = jnp.zeros((T, 54, 2))
        runs = []
        for i in range(trials):
            _, m = missing_blocks_dataset(jax.random.key(1000 + i), v,
                                          stats)
            m = np.asarray(m)
            edges = np.flatnonzero(np.diff(np.concatenate(
                ([0.0], m, [0.0]))))
            lengths = edges[1::2] - edges[0::2]
            runs.append((len(lengths), lengths.mean() if len(lengths)
                         else 0.0))
        arr = np.array(runs)
        return arr[:, 0].mean(), arr[:, 1].mean()

    n_fl, len_fl = block_stats(few_long)
    n_ms, len_ms = block_stats(many_short)
    # (2, 14): ~2 blocks of ~double-digit length
    assert n_fl < 4 and len_fl > 8, (n_fl, len_fl)
    # (14, 2): many short holes
    assert n_ms > 6 and len_ms < 4, (n_ms, len_ms)


def test_overlay_stats_above_max_blocks_are_not_clipped(rng):
    """A registry overlay whose sampled block count exceeds the built-in
    MAX_BLOCKS=16 unroll (possible via --registry_path, same schema as
    dataset_config.json) must reproduce the reference loop's distribution
    (dataloader.py:364-419), not silently clip at 16 blocks — the round-2
    silent-cap finding.  static_max_blocks sizes the unroll from the
    stats; this pins both the bound and the distribution at nb > 16."""
    import math

    from keypoints_interpolation_transformer_tpu.transforms.corruption import \
        static_max_blocks

    T = 256
    stats = DatasetMissingStats(
        mean_consecutive_missing=24.0, std_consecutive_missing=3.0,
        mean_number_missing_blocks=2.0, std_number_missing_blocks=0.5,
        samples=200)
    assert static_max_blocks(stats) > 24

    def ref_sim(r):
        bl = [np.percentile(r.normal(stats.mean_consecutive_missing,
                                     stats.std_consecutive_missing,
                                     stats.samples), p) for p in (25, 75)]
        bs = [np.percentile(r.normal(stats.mean_number_missing_blocks,
                                     stats.std_number_missing_blocks,
                                     stats.samples), p) for p in (25, 75)]
        nb_min = max(math.floor(bl[0]), 1)
        nb_max = max(math.ceil(bl[1]), nb_min)
        bs_min = max(math.floor(bs[0]), 1)
        bs_max = max(math.ceil(bs[1]), bs_min)
        nb = int(r.integers(nb_min, nb_max + 1))
        section = max(1, T // nb)
        rest = T % nb
        if section < bs_max + 4:
            section = max(bs_max + 4, 1)
            nb = max(1, T // section)
            rest = T % nb
        mask = np.zeros(T)
        for i in range(nb):
            nc = min(int(r.integers(bs_min, bs_max + 1)), section)
            rr = rest if i == nb - 1 else 0
            off = int(r.integers(0, rr + section - nc + 1))
            s = section * i + off
            e = min(s + nc, T - 1)
            mask[s:e] = 1
        return mask

    def count_blocks(m):
        edges = np.flatnonzero(np.diff(np.concatenate(([0.0], m, [0.0]))))
        return len(edges) // 2

    trials = 200
    r = np.random.default_rng(11)
    ref = np.array([(m.sum(), count_blocks(m))
                    for m in (ref_sim(r) for _ in range(trials))])

    v = jnp.zeros((T, 54, 2))
    ours = []
    for i in range(trials):
        _, m = missing_blocks_dataset(jax.random.key(5000 + i), v, stats)
        m = np.asarray(m)
        ours.append((m.sum(), count_blocks(m)))
    ours = np.array(ours)

    # the clipped implementation would cap block counts at 16; the
    # reference regularly places >20 blocks with these stats
    assert ref[:, 1].max() > 16 and ours[:, 1].max() > 16, (
        ref[:, 1].max(), ours[:, 1].max())
    assert abs(ours[:, 0].mean() - ref[:, 0].mean()) / ref[:, 0].mean() \
        < 0.1, (ours[:, 0].mean(), ref[:, 0].mean())
    assert abs(ours[:, 1].mean() - ref[:, 1].mean()) / ref[:, 1].mean() \
        < 0.1, (ours[:, 1].mean(), ref[:, 1].mean())


class TestSpoterLegacy:
    """Working re-derivations of the reference's dead/broken SPOTER
    helpers (augmentation.py:36-118)."""

    def test_dict_numpy_round_trip(self):
        import numpy as np
        from keypoints_interpolation_transformer_tpu.transforms import (
            spoter_legacy as sl)

        rng = np.random.default_rng(0)
        arr = rng.normal(size=(5, 54, 2))
        d = sl.numpy_to_dictionary(arr)
        assert len(d) == 54 and len(d["pose_nose"]) == 5
        back = sl.dictionary_to_numpy(d)
        np.testing.assert_allclose(back, arr)

    def test_rotate_point_matches_complex_oracle(self):
        import cmath
        import numpy as np
        from keypoints_interpolation_transformer_tpu.transforms import (
            spoter_legacy as sl)

        rng = np.random.default_rng(1)
        for _ in range(20):
            o = tuple(rng.normal(size=2))
            p = tuple(rng.normal(size=2))
            a = float(rng.uniform(-3, 3))
            got = sl.rotate_point(o, p, a)
            z = (complex(*p) - complex(*o)) * cmath.exp(1j * a) + complex(*o)
            np.testing.assert_allclose(got, (z.real, z.imag), atol=1e-12)

    def test_split_wrap_shapes_and_quirk(self):
        import numpy as np
        from keypoints_interpolation_transformer_tpu.transforms import (
            spoter_legacy as sl)

        rng = np.random.default_rng(2)
        sign = rng.normal(size=(4, 54, 2))
        body, hands = sl.split_body_hands(sign)
        # reference quirk: "body" is the FULL catalog (pose incl. face
        # incl. hands), hands are the 42 hand columns
        assert body.shape == (4, 54, 2) and hands.shape == (4, 42, 2)
        wrapped = sl.wrap_sign_into_row(body, hands)
        assert wrapped.shape == (4, 96, 2)
        np.testing.assert_allclose(wrapped[:, :54], sign)


def test_intermediate_loss_matches_torch_pattern():
    """intermediate_loss == sum of plain MSEs (reference model.py:53-57)."""
    import numpy as np
    import jax.numpy as jnp
    from keypoints_interpolation_transformer_tpu.ops.losses import (
        intermediate_loss, mse_loss)

    rng = np.random.default_rng(3)
    tgt = jnp.asarray(rng.normal(size=(2, 6, 54, 2)), jnp.float32)
    outs = [jnp.asarray(rng.normal(size=(2, 6, 54, 2)), jnp.float32)
            for _ in range(3)]
    got = float(intermediate_loss(outs, tgt))
    want = sum(float(jnp.mean(mse_loss(o, tgt))) for o in outs)
    np.testing.assert_allclose(got, want, rtol=1e-6)


class TestBohacekLegacy:
    """Working re-derivations of the reference's dead/unimported
    body_normalization.py (the last legacy module): invariants of the
    Bohacek box — neck maps to x=0.5, leftEye to y=5/6 under the dict
    variant's eye_offset=1 (body_normalization.py:184-186) — plus the
    carry-forward, zero-skip and invalid-sequence behaviors."""

    def _seq(self, T=3):
        from keypoints_interpolation_transformer_tpu.transforms.\
            spoter_legacy import BOHACEK_BODY_IDENTIFIERS
        # head metric (shoulder distance) = 0.05 keeps the 6h-tall box
        # strictly inside the positive quadrant (no :92-95 clamping), so
        # the closed-form invariants below hold exactly
        base = {
            "nose": (0.52, 0.30), "neck": (0.50, 0.42),
            "rightEye": (0.48, 0.28), "leftEye": (0.54, 0.28),
            "rightEar": (0.45, 0.30), "leftEar": (0.56, 0.30),
            "rightShoulder": (0.475, 0.50), "leftShoulder": (0.525, 0.50),
            "rightElbow": (0.44, 0.65), "leftElbow": (0.57, 0.66),
            "rightWrist": (0.43, 0.78), "leftWrist": (0.58, 0.80),
        }
        assert set(base) == set(BOHACEK_BODY_IDENTIFIERS)
        return {k: [list(v) for _ in range(T)] for k, v in base.items()}

    def test_box_invariants_and_zero_skip(self):
        from keypoints_interpolation_transformer_tpu.transforms.\
            spoter_legacy import normalize_single_dict

        row = self._seq()
        row["rightWrist"][1] = [0.0, 0.44]  # x==0 -> skipped (:201-202)
        out = normalize_single_dict(row)
        # head metric = shoulder distance 0.2; box x = neck +- 3h -> neck
        # lands mid-box; leftEye y = (ley - ey)/(sy - ey) = 5h/6h
        for t in range(3):
            np.testing.assert_allclose(out["neck"][t][0], 0.5, atol=1e-12)
            np.testing.assert_allclose(out["leftEye"][t][1], 5.0 / 6.0,
                                       atol=1e-12)
        assert out["rightWrist"][1] == [0.0, 0.44]  # untouched
        assert row["rightWrist"][0] == [0.43, 0.78]  # input never mutated

    def test_carry_forward_and_headless_start(self):
        from keypoints_interpolation_transformer_tpu.transforms.\
            spoter_legacy import normalize_single_dict

        row = self._seq(T=3)
        # frame 1 loses shoulders AND neck/nose x -> carries frame 0's box
        for k in ("leftShoulder", "rightShoulder", "neck", "nose"):
            row[k][1] = [0.0, row[k][1][1]]
        out = normalize_single_dict(row)
        np.testing.assert_allclose(out["leftWrist"][1],
                                   out["leftWrist"][0], atol=1e-12)

        # no box formable at all -> returned unnormalized
        row2 = self._seq(T=2)
        for k in ("leftShoulder", "rightShoulder", "neck", "nose"):
            for t in range(2):
                row2[k][t] = [0.0, row2[k][t][1]]
        out2 = normalize_single_dict(row2)
        assert out2["leftEye"][0] == row2["leftEye"][0]

    def test_dataframe_variant(self):
        import pandas as pd
        from keypoints_interpolation_transformer_tpu.transforms.\
            spoter_legacy import (BOHACEK_BODY_IDENTIFIERS,
                                  normalize_body_full)

        seq = self._seq(T=2)
        cols = {}
        for k in BOHACEK_BODY_IDENTIFIERS:
            cols[k + "_X"] = [[p[0] for p in seq[k]]]
            cols[k + "_Y"] = [[p[1] for p in seq[k]]]
        # second row: nothing valid -> flagged invalid, unnormalized
        for k in BOHACEK_BODY_IDENTIFIERS:
            bad_x = ([0.0, 0.0]
                     if k in ("leftShoulder", "rightShoulder", "neck",
                              "nose") else [0.2, 0.2])
            cols[k + "_X"].append(bad_x)
            cols[k + "_Y"].append([0.3, 0.3])
        df = pd.DataFrame(cols)
        out, invalid = normalize_body_full(df)
        assert invalid == [1]
        np.testing.assert_allclose(out.loc[0, "neck_X"], [0.5, 0.5],
                                   atol=1e-12)
        np.testing.assert_allclose(out.loc[1, "leftEye_X"], [0.2, 0.2])
        # DataFrame variant uses the eye_offset=0.5 box (:86):
        # sy = ley + 0.5h, ey = sy - 6h -> leftEye y = 5.5h/6h
        np.testing.assert_allclose(out.loc[0, "leftEye_Y"],
                                   [5.5 / 6.0] * 2, atol=1e-12)


def test_unit_quad_homography_closed_form_matches_solve(rng):
    """perspective_from_unit_quad (closed form, no LU) equals the general
    8x8-solve homography for random destination quadrilaterals."""
    import jax.numpy as jnp
    from keypoints_interpolation_transformer_tpu.transforms.augment import (
        _UNIT_QUAD, perspective_from_unit_quad,
        perspective_transform_matrix)

    for _ in range(5):
        dst = jnp.asarray(
            (np.asarray(_UNIT_QUAD) +
             rng.uniform(-0.2, 0.2, (4, 2))).astype(np.float32))
        want = perspective_transform_matrix(_UNIT_QUAD, dst)
        got = perspective_from_unit_quad(dst)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
