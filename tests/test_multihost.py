"""Multi-process (multi-host shape) training equivalence.

The reference is single-process/single-device (A1_train.py:222-224); the
framework extends it with a jax.distributed launcher and a hybrid
DCN x ICI mesh (parallel/distributed.py).  This test runs the REAL CLI
trainer as 2 coordinated CPU processes x 4 virtual devices each (global
mesh data=4, model=2, data split 2-way over "DCN") and asserts the
per-epoch train/val losses equal a single-process 8-device run of the
same configuration.
"""

import os
import re
import subprocess
import sys

import numpy as np

ARGS = ["-m", "keypoints_interpolation_transformer_tpu.cli", "train",
        "--regime", "a1", "--synthetic", "16", "--epochs", "2",
        "--hidden_dim", "32", "--num_heads", "4", "--num_layers", "1",
        "--lr", "1e-3", "--batch_size", "8", "--max_seq_len", "64",
        "--synthetic_max_len", "48", "--precision", "highest",
        "--mesh_data", "4", "--mesh_model", "2", "--no-save_plots",
        # the axon TPU plugin can win the default-backend election even
        # under JAX_PLATFORMS=cpu, which would resolve "auto" to pallas
        "--attention_impl", "xla"]


def _losses(text):
    """[(train, val), ...] from 'epoch N: ... train=X val=Y ...' lines."""
    out = []
    for m in re.finditer(r"epoch \d+: .*train=([\d.e+-]+) val=([\d.e+-]+)",
                         text):
        out.append((float(m.group(1)), float(m.group(2))))
    return out


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _base_env(tmp_path, ndev):
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    # keep the axon TPU plugin out of the subprocesses entirely
    e.pop("PALLAS_AXON_POOL_IPS", None)
    e["XLA_FLAGS"] = (e.get("XLA_FLAGS", "") +
                      f" --xla_force_host_platform_device_count={ndev}")
    # append, never replace (the axon sitecustomize must stay importable)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    e.pop("KIT_COORDINATOR", None)
    e.pop("KIT_NUM_PROCESSES", None)
    return e


def test_two_process_run_matches_single_process(tmp_path):
    args = ARGS + ["--checkpoint_dir", str(tmp_path / "ckpt"),
                   "--results_dir", str(tmp_path / "res"),
                   "--experiment_name", "mh"]

    # single-process, 8 virtual devices, mesh (4, 2)
    single = subprocess.run(
        [sys.executable] + args, env=_base_env(tmp_path, 8),
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path))
    assert single.returncode == 0, single.stdout + single.stderr
    ref = _losses(single.stdout)
    assert len(ref) == 2, single.stdout + single.stderr

    # 2 processes x 4 virtual devices, same global mesh: the data axis
    # spans the two processes (hybrid DCN x ICI layout)
    from keypoints_interpolation_transformer_tpu.parallel.distributed \
        import launch_local
    args_mp = ARGS + ["--checkpoint_dir", str(tmp_path / "ckpt_mp"),
                      "--results_dir", str(tmp_path / "res_mp"),
                      "--experiment_name", "mh_mp"]
    env = _base_env(tmp_path, 4)
    procs = launch_local(2, args_mp, port=12923,
                         cpu_devices_per_process=4, env=env)
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)
    got = _losses(outs[0]) or _losses(outs[1])
    assert len(got) == 2, "\n".join(outs)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=1e-6)

    # the coordinator (and only the coordinator) wrote the checkpoint
    assert (tmp_path / "ckpt_mp" / "mh_mp" / "best").exists(), \
        "\n".join(outs)
