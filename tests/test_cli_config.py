"""CLI flag surface: every live reference flag (parseMain.py:3-60 +
LSP_Dataset ctor args, dataloader.py:551-553) has a CLI path, non-default
values reach the Config, and the per-regime early-stop defaults are
faithful (a3 never breaks on patience, A3_train_embedding.py:265-267)."""

import json
import os

import numpy as np

from keypoints_interpolation_transformer_tpu import cli
from keypoints_interpolation_transformer_tpu.utils.config import (
    Config, TrainConfig)


def _parse_train(extra):
    argv = ["train", "--regime", "a1", "--synthetic", "8"] + extra
    a = cli.build_parser().parse_args(argv)
    return cli._cfg_from_args(a, a.regime)


def test_every_reference_flag_reaches_config():
    cfg = _parse_train([
        "--is_random_missing",
        "--no-augmentation",
        "--augmentations_prob", "0.25",
        "--no-double_hand_rotation",
        "--no-device_resident_data",
        "--attention_impl", "pallas",
        "--scan_layers", "--remat", "--sequence_parallel",
        "--no-early_stop",
        "--resume_from", "/tmp/somewhere",
        "--max_epochs_this_run", "7",
        "--no-save_checkpoints",
        "--save_plots",
        "--results_dir", "r2",
        "--checkpoint_dir", "c2",
        "--fused_loss",
    ])
    assert cfg.data.is_random_missing is True
    assert cfg.data.have_augmentation is False
    assert cfg.data.augmentations_prob == 0.25
    assert cfg.data.double_hand_rotation is False
    assert cfg.data.device_resident_data is False
    assert cfg.model.attention_impl == "pallas"
    assert cfg.model.scan_layers and cfg.model.remat
    assert cfg.model.sequence_parallel
    assert cfg.train.early_stop is False
    assert cfg.train.resume_from == "/tmp/somewhere"
    assert cfg.train.max_epochs_this_run == 7
    assert cfg.train.save_checkpoints is False
    assert cfg.train.save_plots is True
    assert cfg.train.results_dir == "r2"
    assert cfg.train.checkpoint_dir == "c2"
    assert cfg.train.fused_loss is True


def test_early_stop_defaults_faithful_per_regime():
    assert TrainConfig(regime="a1").effective_early_stop() is True
    assert TrainConfig(regime="a2").effective_early_stop() is True
    assert TrainConfig(regime="a4").effective_early_stop() is True
    # the reference's A3 never breaks on patience (A3:265-267)
    assert TrainConfig(regime="a3").effective_early_stop() is False
    # explicit override wins either way
    assert TrainConfig(regime="a3", early_stop=True) \
        .effective_early_stop() is True
    assert TrainConfig(regime="a1", early_stop=False) \
        .effective_early_stop() is False


def test_cli_train_smoke_with_nondefault_flags(tmp_path, monkeypatch):
    """One real run driven through cli.main with non-default data flags."""
    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "train", "--regime", "a1", "--synthetic", "8",
        "--epochs", "2", "--hidden_dim", "16", "--num_heads", "2",
        "--num_layers", "1", "--batch_size", "4", "--lr", "1e-3",
        "--is_random_missing", "--no-augmentation",
        "--no-device_resident_data",
        "--max_epochs_this_run", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--experiment_name", "cli_smoke",
    ])
    assert rc == 0


def test_metrics_jsonl_has_watch_norms(tmp_path, monkeypatch):
    """wandb.watch analog (A1_train.py:251): grad/param norms per epoch."""
    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "train", "--regime", "a1", "--synthetic", "8",
        "--epochs", "1", "--hidden_dim", "16", "--num_heads", "2",
        "--num_layers", "1", "--batch_size", "4",
        "--no-save_checkpoints",
        "--experiment_name", "watch_smoke",
    ])
    assert rc == 0
    path = os.path.join("results", "watch_smoke.metrics.jsonl")
    recs = [json.loads(ln) for ln in open(path)]
    epoch_recs = [r for r in recs if "train_loss" in r]
    assert epoch_recs, recs
    for r in epoch_recs:
        assert np.isfinite(r["grad_norm"]) and r["grad_norm"] > 0
        assert np.isfinite(r["param_norm"]) and r["param_norm"] > 0


def test_registry_paths_and_lsa64():
    from keypoints_interpolation_transformer_tpu.utils.registry import (
        dataset_paths, load_registry, missing_stats)

    # dataset_info_all.csv's LSA64 row ships built in
    p = dataset_paths("LSA64")
    assert p["hdf5_file"].endswith("LSA64--mediapipe.hdf5")
    assert "LSA64_without_missing_values" in p["csv_file"]
    # dataset_info.csv (non-_all) has no LSA64 row
    assert "hdf5_file" not in load_registry(
        include_all_index=False).get("LSA64", {})
    # stat-bearing rows keep both stats and paths
    reg = load_registry()
    assert reg["AUTSL"]["hdf5_file"].endswith("AUTSL--mediapipe.hdf5")
    assert reg["AUTSL"]["mean_consecutive_missing"] == 5.28
    # LSA64 has no missingness stats -> explicit KeyError (callers fall
    # back to the generic 'all' block-corruption mode)
    import pytest
    with pytest.raises(KeyError):
        missing_stats("LSA64")


def test_config_roundtrip_with_new_fields():
    cfg = Config()
    cfg.train.early_stop = False
    cfg.train.fused_loss = True
    cfg2 = Config.from_dict(json.loads(cfg.to_json()))
    assert cfg2.train.early_stop is False
    assert cfg2.train.fused_loss is True
    assert cfg2.train.effective_early_stop() is False
