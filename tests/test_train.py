"""End-to-end training: all four regimes on hermetic synthetic data, the
freeze-graft behavior, and dp x tp mesh execution on the virtual 8-device
CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypoints_interpolation_transformer_tpu.train.loop import train
from keypoints_interpolation_transformer_tpu.train.state import (
    TrainState, apply_gradients, freeze_mask_for_graft, linear_decay_lrs,
    step_drop_lrs)
from keypoints_interpolation_transformer_tpu.utils.config import (
    Config, DataConfig, MeshConfig, ModelConfig, TrainConfig)


def _cfg(regime, name, tmp_path, epochs=2, mesh=None, **train_kw):
    return Config(
        model=ModelConfig(hidden_dim=32, num_heads=4, num_layers=1,
                          ff_dim=64),
        # one length bucket -> one compiled shape per phase (fast suite)
        data=DataConfig(synthetic_num_videos=10, synthetic_min_len=20,
                        synthetic_max_len=30, batch_size=4,
                        bucket_multiple=16, max_seq_len=64),
        mesh=mesh or MeshConfig(),
        train=TrainConfig(regime=regime, lr=1e-3, epochs=epochs, patience=50,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          results_dir=str(tmp_path / "results"),
                          experiment_name=name, log_every=0, **train_kw),
    )


def test_a1_loss_decreases(tmp_path):
    res = train(_cfg("a1", "t_a1", tmp_path, epochs=3))
    assert res.epochs_run == 3
    assert res.val_losses[-1] < res.val_losses[0]
    assert res.train_losses[-1] < res.train_losses[0]
    assert res.checkpoint_path is not None
    assert res.baseline_losses  # epoch-0 freeze-frame baseline recorded


def test_full_regime_chain(tmp_path):
    r1 = train(_cfg("a1", "c_a1", tmp_path, epochs=1))
    r3 = train(_cfg("a3", "c_a3", tmp_path, epochs=1))
    r2 = train(_cfg("a2", "c_a2", tmp_path, epochs=1,
                    upload_model=r1.checkpoint_path))
    r4 = train(_cfg("a4", "c_a4", tmp_path, epochs=1,
                    upload_embedding_model=r3.checkpoint_path))
    for r in (r1, r2, r3, r4):
        assert np.isfinite(r.best_val_loss)


def test_a2_requires_first_model(tmp_path):
    with pytest.raises(ValueError, match="upload_model"):
        train(_cfg("a2", "t_a2_missing", tmp_path))


def test_a4_graft_freezes_embeddings(tmp_path):
    r3 = train(_cfg("a3", "g_a3", tmp_path, epochs=1))
    cfg = _cfg("a4", "g_a4", tmp_path, epochs=2,
               upload_embedding_model=r3.checkpoint_path)

    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as c:
        emb = c.restore(r3.checkpoint_path)

    res = train(cfg)
    with ocp.StandardCheckpointer() as c:
        final = c.restore(res.checkpoint_path)

    # grafted + frozen: embeddings and head must not have moved
    np.testing.assert_array_equal(final["input_embedding"]["kernel"],
                                  emb["input_embedding"]["kernel"])
    np.testing.assert_array_equal(final["filled_embedding"]["kernel"],
                                  emb["input_embedding"]["kernel"])
    np.testing.assert_array_equal(final["fc_final"]["bias"],
                                  emb["output_embedding"]["bias"])
    # ... while the transformer itself trained
    assert np.isfinite(res.best_val_loss)


def test_mesh_dp_tp_runs(tmp_path, cpu_devices):
    assert len(cpu_devices) >= 8
    res = train(_cfg("a1", "mesh_a1", tmp_path, epochs=1,
                     mesh=MeshConfig(data=4, model=2)))
    assert np.isfinite(res.best_val_loss)


def test_lr_schedules():
    lin = linear_decay_lrs(1e-3, 5)
    np.testing.assert_allclose(lin[0], 1e-3)
    np.testing.assert_allclose(lin[-1], 2e-4)
    step = step_drop_lrs(1e-3, 100, drop_epoch=80)
    assert step[80] == 1e-3 and step[81] == 1e-4


def test_adam_matches_torch_semantics():
    """One Adam step on a toy quadratic matches torch.optim.Adam."""
    import torch

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([tw], lr=0.1)
    for _ in range(3):
        opt.zero_grad()
        (tw ** 2).sum().backward()
        opt.step()

    params = {"w": jnp.asarray(w0)}
    state = TrainState.create(params)
    for _ in range(3):
        grads = jax.tree.map(lambda p: 2 * p, state.params)
        state = apply_gradients(state, grads, 0.1)
    # optax and torch evaluate the identical formula in different op order;
    # agreement is to f32 rounding
    np.testing.assert_allclose(np.asarray(state.params["w"]),
                               tw.detach().numpy(), atol=1e-5)


def test_dp_sharding_matches_single_device(tmp_path):
    """Data-parallel execution must reproduce single-device numerics (the
    batch math is identical; XLA's all-reduce only changes summation
    order)."""
    r_single = train(_cfg("a1", "eq_single", tmp_path, epochs=2))
    r_dp = train(_cfg("a1", "eq_dp", tmp_path, epochs=2,
                      mesh=MeshConfig(data=2, model=1)))
    np.testing.assert_allclose(r_dp.train_losses, r_single.train_losses,
                               rtol=2e-4)
    np.testing.assert_allclose(r_dp.val_losses, r_single.val_losses,
                               rtol=2e-4)


def test_resume_matches_uninterrupted(tmp_path):
    """Interrupt after 2 of 4 epochs, resume: the resumed trajectory must
    equal the uninterrupted run exactly (optimizer state, epoch counter,
    LR-schedule position and RNG key all restored — the reference's resume
    drops these, A1_train.py:268)."""
    import os

    r_full = train(_cfg("a1", "r_full", tmp_path, epochs=3))
    r_part = train(_cfg("a1", "r_part", tmp_path, epochs=3,
                        max_epochs_this_run=1))
    fs = os.path.join(os.path.dirname(r_part.checkpoint_path), "full_state")
    r_res = train(_cfg("a1", "r_res", tmp_path, epochs=3, resume_from=fs))
    np.testing.assert_allclose(r_res.val_losses, r_full.val_losses[1:],
                               rtol=1e-5)


def test_sequence_parallel_forward_matches(cpu_devices, rng):
    """sequence_parallel=True on a ("data","model") mesh must reproduce the
    unsharded forward; GSPMD inserts the token-axis collectives."""
    import jax.numpy as jnp
    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.ops.masks import (
        attention_bias)
    from keypoints_interpolation_transformer_tpu.parallel.mesh import (
        make_mesh, shard_params)
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(hidden_dim=32, num_layers=1, num_heads=4, ff_dim=64)
    m_ref = KeypointCompleter(**kw)
    m_sp = KeypointCompleter(**kw, sequence_parallel=True)
    B, T = 4, 16
    x = jnp.asarray(rng.uniform(size=(B, T, 54, 2)).astype(np.float32))
    msk = jnp.asarray((rng.random((B, T)) < 0.4).astype(np.float32))
    bias = attention_bias("repeat-inc", msk, T)
    p = m_ref.init(jax.random.key(0), x, x)["params"]
    want = m_ref.apply({"params": p}, x, x, src_frame_mask=msk,
                       src_bias=bias, tgt_bias=bias)

    mesh = make_mesh(2, 4, devices=cpu_devices)
    with mesh:
        ps = shard_params(p, mesh)
        xb = jax.device_put(x, NamedSharding(mesh, P("data")))
        got = jax.jit(lambda p, x: m_sp.apply(
            {"params": p}, x, x, src_frame_mask=msk,
            src_bias=bias, tgt_bias=bias))(ps, xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)


def test_unknown_dataset_falls_back_to_generic_corruption(tmp_path):
    """Training from files whose dataset name has no registry stats must
    fall back to the generic 'all' block mode instead of crashing."""
    cfg = _cfg("a1", "t_unknown", tmp_path, epochs=1)
    cfg.data.dataset_name = "NOT_IN_REGISTRY"
    res = train(cfg)
    assert np.isfinite(res.best_val_loss)


def test_device_resident_data_matches_host_path(tmp_path):
    """Device-resident bucket gathers must reproduce the host streaming
    path exactly (single bucket -> identical shuffle order)."""
    cfg_host = _cfg("a1", "d_host", tmp_path, epochs=2,
                    save_checkpoints=False)
    cfg_host.data.device_resident_data = False
    r_host = train(cfg_host)
    cfg_dev = _cfg("a1", "d_dev", tmp_path, epochs=2, save_checkpoints=False)
    cfg_dev.data.device_resident_data = True
    r_dev = train(cfg_dev)
    np.testing.assert_allclose(r_dev.val_losses, r_host.val_losses,
                               rtol=1e-6)


def test_run_config_snapshot_round_trips(tmp_path):
    """Every run persists its resolved Config (the reference's
    wandb config + log_code analog, A1_train.py:357-372):
    results/{run}.config.json exists, round-trips through
    Config.from_json_file to an equal Config, and records provenance."""
    import dataclasses
    import json

    cfg = _cfg("a1", "t_cfgsnap", tmp_path, epochs=1)
    train(cfg)
    path = os.path.join(cfg.train.results_dir, "t_cfgsnap.config.json")
    assert os.path.exists(path)
    with open(path) as f:
        doc = json.load(f)
    assert doc["framework_version"]
    assert "git_sha" in doc
    rt = Config.from_json_file(path)
    assert dataclasses.asdict(rt) == dataclasses.asdict(cfg)


def test_flagship_dim_tp_sp_step_matches_single_device(cpu_devices, rng):
    """Tensor + sequence parallelism AT THE REFERENCE'S FLAGSHIP
    DIMENSIONS (hidden 256 / 6 layers / 8 heads, parseMain.py:10-14):
    one a1-style train step (loss + grads + Adam) on a (4, 2) dp x tp
    mesh with sequence_parallel must match the single-device step to the
    usual DP tolerance.  This executes the Megatron head-split (8 heads
    over model=2), the SwiGLU col/row split, and the token-axis
    sequence-parallel constraint at real width — previously proven only
    at D=32 toy dims."""
    assert len(cpu_devices) >= 8
    from jax.sharding import NamedSharding, PartitionSpec as P
    from keypoints_interpolation_transformer_tpu.models.completer import (
        KeypointCompleter)
    from keypoints_interpolation_transformer_tpu.ops.masks import (
        attention_bias)
    from keypoints_interpolation_transformer_tpu.parallel.mesh import (
        make_mesh, shard_params)

    kw = dict(hidden_dim=256, num_layers=6, num_heads=8)
    B, T = 4, 16  # small T bounds CPU compile time; the width is flagship
    x = jnp.asarray(rng.uniform(size=(B, T, 54, 2)).astype(np.float32))
    msk = jnp.asarray((rng.random((B, T)) < 0.4).astype(np.float32))
    bias = attention_bias("repeat-inc", msk, T)

    def make_step(model):
        def loss_fn(params):
            pred = model.apply({"params": params}, x, x,
                               src_frame_mask=msk, src_bias=bias,
                               tgt_bias=bias)
            return jnp.mean((pred - x) ** 2)

        def step(state):
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return loss, apply_gradients(state, grads, jnp.float32(1e-3))
        return step

    m_ref = KeypointCompleter(**kw)
    p = m_ref.init(jax.random.key(0), x[:, :8], x[:, :8])["params"]
    want_loss, want_state = jax.jit(make_step(m_ref))(TrainState.create(p))

    m_sp = KeypointCompleter(**kw, sequence_parallel=True)
    mesh = make_mesh(4, 2, devices=cpu_devices)
    with mesh:
        ps = shard_params(p, mesh)
        got_loss, got_state = jax.jit(make_step(m_sp))(
            TrainState.create(ps))
        got_loss = float(got_loss)
    np.testing.assert_allclose(got_loss, float(want_loss), rtol=2e-4)
    # updated parameters agree leaf-by-leaf (collective sum order only)
    for a, b in zip(jax.tree.leaves(got_state.params),
                    jax.tree.leaves(want_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
