"""Native C++ packer: builds, matches the numpy fallback bit-for-bit, and
is faster on realistic batch sizes."""

import time

import numpy as np
import pytest

from keypoints_interpolation_transformer_tpu.data import native_pack


def _videos(rng, n=16, tmin=20, tmax=200):
    return [rng.uniform(size=(int(t), 54, 2)).astype(np.float32)
            for t in rng.integers(tmin, tmax, n)]


def test_native_builds_and_matches_numpy(rng):
    if not native_pack.native_available():
        pytest.skip("no native toolchain")
    vids = _videos(rng)
    t_pad = 224
    out_n, len_n = native_pack.pad_videos_native(vids, t_pad)

    want = np.zeros((len(vids), t_pad, 54, 2), np.float32)
    for i, v in enumerate(vids):
        want[i, :len(v)] = v
    np.testing.assert_array_equal(out_n, want)
    np.testing.assert_array_equal(len_n, [len(v) for v in vids])


def test_truncation_and_valid_mask(rng):
    vids = _videos(rng, n=4, tmin=30, tmax=60)
    out, lens = native_pack.pad_videos_native(vids, 16)
    np.testing.assert_array_equal(lens, [16] * 4)
    np.testing.assert_array_equal(out[0], vids[0][:16])

    vm = native_pack.valid_mask_native(np.array([3, 5], np.int32), 6)
    np.testing.assert_array_equal(vm, [[1, 1, 1, 0, 0, 0],
                                       [1, 1, 1, 1, 1, 0]])


def test_native_is_faster(rng):
    if not native_pack.native_available():
        pytest.skip("no native toolchain")
    vids = _videos(rng, n=256, tmin=100, tmax=500)
    t_pad = 512

    def numpy_pack():
        out = np.zeros((len(vids), t_pad, 54, 2), np.float32)
        for i, v in enumerate(vids):
            out[i, :len(v)] = v
        return out

    native_pack.pad_videos_native(vids, t_pad)  # warm (build + cache)

    def best_of(f, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            times.append(time.perf_counter() - t0)
        return min(times)  # min-of-n is robust to concurrent CPU load

    t_native = best_of(lambda: native_pack.pad_videos_native(vids, t_pad))
    t_numpy = best_of(numpy_pack)
    # generous bound: this guards against regressions that make the native
    # path pathologically slow, not a micro-benchmark under test-runner load
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)


def test_pad_with_sos_matches_numpy(rng):
    """Native SOS-prepend packer == numpy fallback == transforms.add_sos."""
    vids = _videos(rng, n=8, tmin=10, tmax=40)
    masks = [(rng.random(len(v)) < 0.3).astype(np.float32) for v in vids]
    t_pad = 48

    for seq, sos in ((vids, 1.0), (masks, 0.0)):
        out, lens = native_pack.pad_with_sos_native(seq, t_pad, sos)
        want = np.zeros((len(seq), t_pad + 1) + seq[0].shape[1:], np.float32)
        want[:, 0] = sos
        for i, v in enumerate(seq):
            want[i, 1:len(v) + 1] = v
        np.testing.assert_array_equal(out, want)
        np.testing.assert_array_equal(lens, [len(v) for v in seq])

    # agrees with the jnp reference transform on one video
    import jax.numpy as jnp
    from keypoints_interpolation_transformer_tpu.transforms.corruption \
        import add_sos
    out, _ = native_pack.pad_with_sos_native([vids[0]], len(vids[0]), 1.0)
    ref = np.asarray(add_sos(jnp.asarray(vids[0])))
    np.testing.assert_array_equal(out[0], ref)


def test_pad_with_sos_truncates(rng):
    vids = _videos(rng, n=2, tmin=30, tmax=40)
    out, lens = native_pack.pad_with_sos_native(vids, 8, 1.0)
    assert out.shape[1] == 9
    np.testing.assert_array_equal(lens, [8, 8])
    np.testing.assert_array_equal(out[0, 1:], vids[0][:8])
    np.testing.assert_array_equal(out[0, 0], np.ones((54, 2), np.float32))
