"""Auxiliary subsystems: HDF5 schema round trip, ETL split, intermediate
materialization, viz rendering, .pth export round trip, registry."""

import numpy as np
import jax.numpy as jnp
import pytest

from keypoints_interpolation_transformer_tpu.data.hdf5_io import (
    read_split, write_split)
from keypoints_interpolation_transformer_tpu.data.intermediate import (
    generate_intermediate, read_intermediate)
from keypoints_interpolation_transformer_tpu.data.pipeline import (
    KeypointDataset, bucket_length)
from keypoints_interpolation_transformer_tpu.data.prepare import (
    shuffle_and_split)
from keypoints_interpolation_transformer_tpu.data.synthetic import (
    synthetic_dataset)
from keypoints_interpolation_transformer_tpu.utils.registry import (
    dataset_name_from_path, missing_stats)
from keypoints_interpolation_transformer_tpu.utils.viz import (
    render_frame, validation_image)


def test_hdf5_round_trip(tmp_path, rng):
    videos = [rng.uniform(size=(t, 54, 2)).astype(np.float32)
              for t in (5, 9, 3)]
    p = str(tmp_path / "split.hdf5")
    write_split(p, videos, labels=["a", "b", "c"])
    back, labels, names = read_split(p)
    assert labels == ["a", "b", "c"]
    for v, w in zip(videos, back):
        np.testing.assert_array_equal(v, w)


def test_reference_schema_layout(tmp_path, rng):
    """Stored records are flattened (T, 2, 54) — the reference layout
    (1_prepare_dataset.py:43-45, dataloader.py:267)."""
    import h5py

    v = rng.uniform(size=(4, 54, 2)).astype(np.float32)
    p = str(tmp_path / "s.hdf5")
    write_split(p, [v])
    with h5py.File(p) as f:
        g = f["no_missing"]
        rec = np.asarray(g["data"][0]).reshape(4, 2, 54)
        np.testing.assert_array_equal(np.transpose(rec, (0, 2, 1)), v)
        assert list(g["shape"][:]) == [2, 54]


def test_shuffle_split_deterministic():
    items = list(range(10))
    a1, b1 = shuffle_and_split(items, seed=42)
    a2, b2 = shuffle_and_split(items, seed=42)
    assert a1 == a2 and b1 == b2
    assert len(a1) == 8 and len(b1) == 2
    assert sorted(a1 + b1) == items


def test_intermediate_round_trip(tmp_path):
    ds = KeypointDataset(videos=synthetic_dataset(4, 16, 24),
                         dataset_name="all", bucket_multiple=16,
                         max_seq_len=64)
    p = str(tmp_path / "inter.hdf5")
    generate_intermediate(ds, p, seed=1)
    xs, ys, xms, yms = read_intermediate(p)
    assert len(xs) == len(ds.videos)
    for x, y, xm, ym, clean in zip(xs, ys, xms, yms, ds.videos):
        assert x.shape == (len(clean), 54, 2)
        np.testing.assert_array_equal(y, clean)
        # masked x frames are zeroed
        np.testing.assert_array_equal(x[xm == 1], 0.0)
        assert len(ym) == len(xm)


def test_viz(tmp_path, rng):
    v = rng.uniform(0.2, 0.8, size=(3, 54, 2)).astype(np.float32)
    img = render_frame(v[0], label="Input", frame_idx=0)
    assert img.shape == (256, 256, 3) and img.sum() > 0
    strip = validation_image(v, v, v, path=str(tmp_path / "val.jpg"))
    assert strip.shape[0] == 3 * 256
    assert (tmp_path / "val.jpg").exists()


def test_pth_export_round_trip(tmp_path, rng):
    import jax
    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.train.checkpoint import (
        load_reference_checkpoint, save_reference_checkpoint)

    model = KeypointCompleter(hidden_dim=32, num_layers=2, num_heads=4,
                              ff_dim=64)
    x = jnp.zeros((1, 8, 54, 2))
    params = model.init(jax.random.key(0), x, x)["params"]
    p = str(tmp_path / "export.pth")
    save_reference_checkpoint(p, params, hidden_dim=32, num_layers=2,
                              num_heads=4)
    back, hyper = load_reference_checkpoint(p)
    assert hyper["hidden_dim"] == 32
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(back)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_registry():
    s = missing_stats("AUTSL")
    assert s.samples == 491 and s.mean_consecutive_missing == 5.28
    assert missing_stats("all") is None
    with pytest.raises(KeyError):
        missing_stats("NOPE")
    assert dataset_name_from_path("data/validation--AUTSL.hdf5") == "AUTSL"


def test_bucketing():
    assert bucket_length(5, 32, 512) == 32
    assert bucket_length(33, 32, 512) == 64
    assert bucket_length(600, 32, 512) == 512


def test_edges_csv_round_trip(tmp_path):
    """points_54.csv writer: the reference's get_edges_index recipe
    (1-indexed origin/tarjet, utils.py:103-113) recovers our table."""
    import pandas as pd
    from keypoints_interpolation_transformer_tpu.data.keypoints import (
        edges_index, write_edges_csv)

    p = str(tmp_path / "points_54.csv")
    write_edges_csv(p)
    df = pd.read_csv(p)
    ori = np.array(df.origin - 1)
    tar = np.array(df.tarjet - 1)
    np.testing.assert_array_equal(np.array([ori, tar]), edges_index())


def test_metrics_logger_artifact(tmp_path):
    import json
    from keypoints_interpolation_transformer_tpu.utils.metrics import (
        MetricsLogger)

    lg = MetricsLogger(log_dir=str(tmp_path), run_name="t")
    lg.log(0, loss=1.0)
    lg.log_artifact("/some/ckpt")
    lg.close()
    recs = [json.loads(l) for l in open(lg.path)]
    assert recs[0]["loss"] == 1.0
    assert recs[1]["artifact"] == "/some/ckpt"


def test_gesture_synthetic_mode():
    from keypoints_interpolation_transformer_tpu.data.synthetic import (
        synthetic_dataset)

    vids = synthetic_dataset(6, 20, 30, seed=1, motion="gestures", vocab=1,
                             noise=0.0)
    # vocab=1, no noise: every clip is a window of the SAME trajectory, so
    # any two clips share their overlap exactly when aligned
    assert all(v.shape[1:] == (54, 2) for v in vids)
    # deterministic per seed
    vids2 = synthetic_dataset(6, 20, 30, seed=1, motion="gestures", vocab=1,
                              noise=0.0)
    for a, b in zip(vids, vids2):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError, match="motion"):
        synthetic_dataset(2, 10, 12, motion="nope")


def test_prepare_dataset_from_raw_schema(tmp_path, rng):
    """Full ETL: external per-video-group HDF5 (raw (T, 2, K) layout) +
    no-missing CSV -> 80/20 reference-schema splits
    (1_prepare_dataset.py:76-135)."""
    import h5py
    import pandas as pd
    from keypoints_interpolation_transformer_tpu.data.prepare import (
        prepare_dataset)

    raw = str(tmp_path / "raw.hdf5")
    names = [f"vid_{i}" for i in range(10)]
    with h5py.File(raw, "w") as f:
        for i, n in enumerate(names):
            g = f.create_group(str(i))
            g.create_dataset("video_name", data=n)
            g.create_dataset(
                "data", data=rng.uniform(
                    size=(12 + i, 2, 54)).astype(np.float32))

    csv = str(tmp_path / "ok.csv")
    pd.DataFrame({"Video Name": names[:8]}).to_csv(csv, index=False)

    tr, va = prepare_dataset(raw, str(tmp_path), "SYNTH", csv_path=csv)
    vids_tr, _, names_tr = read_split(tr)
    vids_va, _, names_va = read_split(va)
    assert len(vids_tr) == 6 and len(vids_va) == 2   # 80/20 of the 8 listed
    assert set(names_tr) | set(names_va) <= set(names[:8])
    for v in vids_tr + vids_va:
        assert v.shape[1:] == (54, 2)


def test_train_rejects_empty_dataset(tmp_path):
    from keypoints_interpolation_transformer_tpu.data.pipeline import (
        KeypointDataset)
    from keypoints_interpolation_transformer_tpu.train.loop import train
    from keypoints_interpolation_transformer_tpu.utils.config import (
        Config, ModelConfig, TrainConfig)

    empty = KeypointDataset(videos=[], dataset_name="all")
    cfg = Config(model=ModelConfig(hidden_dim=32, num_heads=4, num_layers=1,
                                   ff_dim=64),
                 train=TrainConfig(regime="a1", epochs=1,
                                   checkpoint_dir=str(tmp_path / "ckpt"),
                                   results_dir=str(tmp_path / "results")))
    with pytest.raises(ValueError, match="empty dataset"):
        train(cfg, train_ds=empty, val_ds=empty)


def test_test_result_image(tmp_path):
    """Working sent_test_result equivalent (the reference's is
    dead-broken: calls a nonexistent model.get_src_mask)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.utils.viz import (
        test_result_image)

    rng = np.random.default_rng(0)
    video = rng.uniform(0.2, 0.8, (6, 54, 2)).astype(np.float32)
    mask = (rng.uniform(size=6) < 0.3).astype(np.float32)
    model = KeypointCompleter(hidden_dim=32, num_layers=1, num_heads=4,
                              attention_impl="xla")
    params = model.init(jax.random.key(0), jnp.asarray(video)[None],
                        jnp.asarray(video)[None])
    out = test_result_image(model, params, video, mask,
                            path=str(tmp_path / "test_strip.jpg"))
    assert out.ndim == 3 and out.shape[1] > out.shape[0]  # horizontal strip
    assert (tmp_path / "test_strip.jpg").exists()
