"""Unit tests for the multi-host helpers that don't need 2 processes
(the full 2-process equivalence run lives in test_multihost.py)."""

import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np

from keypoints_interpolation_transformer_tpu.parallel import distributed \
    as dist


def test_hybrid_mesh_falls_back_to_plain_mesh_when_single_granule():
    mesh = dist.make_hybrid_mesh(4, 2, dcn_data=1)
    assert mesh.shape == {"data": 4, "model": 2}


def test_hybrid_mesh_validates_divisibility():
    cpus = jax.devices("cpu")
    assert len(cpus) == 8
    with mock.patch.object(jax, "process_count", return_value=1):
        # 8 devices not divisible by dcn=3
        try:
            dist.make_hybrid_mesh(-1, 1, dcn_data=3)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "not divisible" in str(e)
        # explicit data incompatible with dcn x ici layout
        try:
            dist.make_hybrid_mesh(3, 1, dcn_data=2)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "incompatible" in str(e)


def test_hybrid_mesh_needs_one_granule_per_dcn_slot():
    """dcn_data=2 in a single process has no second granule (neither a
    second slice nor a second process) — the builder must refuse rather
    than silently fold both DCN slots into one host."""
    with mock.patch.object(jax, "process_count", return_value=1):
        try:
            dist.make_hybrid_mesh(-1, 2, dcn_data=2)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "slices" in str(e)


def test_global_put_and_gathers_degrade_to_local_single_process():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = dist.make_hybrid_mesh(4, 2, dcn_data=1)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    arr = dist.global_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(dist.gather_to_host(arr), x)
    chunks = [jnp.ones((3,)), jnp.zeros((2,))]
    np.testing.assert_array_equal(dist.gather_concat(chunks),
                                  [1, 1, 1, 0, 0])
    assert dist.gather_concat([]).shape == (0,)


def test_quantize_table_reconstructs_kernels():
    """Dequantized int8 kernels match the float kernels to one scale
    step per channel (symmetric per-output-channel quantization)."""
    from keypoints_interpolation_transformer_tpu.eval.quantize import (
        quantize_dense_table)

    rng = np.random.default_rng(0)
    params = {"params": {"a": {"kernel": rng.standard_normal((16, 8))
                               .astype(np.float32) * 3.0,
                               "bias": np.zeros(8, np.float32)},
                         "nested": {"b": {"kernel": rng.standard_normal(
                             (4, 4)).astype(np.float32)}},
                         # non-Dense 3-D kernel (e.g. conv) is skipped
                         "c": {"kernel": np.zeros((2, 2, 2), np.float32)}}}
    table = quantize_dense_table(params)
    assert set(table) == {"a", "nested/b"}
    for path, full in (("a", params["params"]["a"]["kernel"]),
                       ("nested/b",
                        params["params"]["nested"]["b"]["kernel"])):
        q, scale = table[path]
        assert q.dtype == jnp.int8
        deq = np.asarray(q, np.float32) * np.asarray(scale)[None, :]
        step = np.asarray(scale)
        assert np.all(np.abs(deq - full) <= step[None, :] * 0.5 + 1e-7)
