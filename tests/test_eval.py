"""Eval layer: baselines evaluation, checkpoint inference benchmark,
serving Inpainter, bf16 compute mode."""

import numpy as np
import jax
import jax.numpy as jnp

from keypoints_interpolation_transformer_tpu.data.pipeline import (
    KeypointDataset)
from keypoints_interpolation_transformer_tpu.data.synthetic import (
    synthetic_dataset)
from keypoints_interpolation_transformer_tpu.eval.baselines import (
    evaluate_baselines)
from keypoints_interpolation_transformer_tpu.eval.inference import (
    evaluate_checkpoint)
from keypoints_interpolation_transformer_tpu.eval.serving import Inpainter
from keypoints_interpolation_transformer_tpu.eval.stats import (
    compare_distributions)
from keypoints_interpolation_transformer_tpu.models.completer import (
    KeypointCompleter)
from keypoints_interpolation_transformer_tpu.utils.config import ModelConfig


def _tiny_ds(n=6):
    return KeypointDataset(videos=synthetic_dataset(n, 16, 30),
                           dataset_name="all", bucket_multiple=16,
                           max_seq_len=32)


def _tiny_model_and_params():
    mc = ModelConfig(hidden_dim=32, num_layers=1, num_heads=4, ff_dim=64)
    model = KeypointCompleter(hidden_dim=32, num_layers=1, num_heads=4,
                              ff_dim=64)
    x = jnp.zeros((1, 8, 54, 2))
    params = model.init(jax.random.key(0), x, x)["params"]
    return mc, params


def test_evaluate_baselines_all():
    res = evaluate_baselines(_tiny_ds(), batch_size=4,
                             which=("freeze", "cubic", "quaternion"))
    for k in ("freeze", "cubic", "quaternion"):
        assert len(res[k]) == 6
        assert all(np.isfinite(v) for v in res[k])
        assert all(v >= 0 for v in res[k])
    # same corruption seed -> deterministic
    res2 = evaluate_baselines(_tiny_ds(), batch_size=4, which=("freeze",))
    np.testing.assert_allclose(res["freeze"], res2["freeze"], rtol=1e-6)


def test_compare_distributions():
    out = compare_distributions({"a": [1.0, 2.0, 3.0],
                                 "b": [4.0, 5.0, 6.0]}, verbose=False)
    assert out["anova"]["significant"]
    assert "tukey_pvalues" in out


def test_evaluate_checkpoint_metrics():
    mc, params = _tiny_model_and_params()
    res = evaluate_checkpoint(params, mc, _tiny_ds(4), batch_size=4,
                              warmup=False)
    assert res["num_videos"] == 4
    assert res["frames_per_sec"] > 0
    assert np.isfinite(res["masked_mpjpe"])
    assert np.isfinite(res["val_euclidean_loss"])


def test_inpainter_replaces_only_missing(rng):
    mc, params = _tiny_model_and_params()
    inp = Inpainter({"params": params}, mc, bucket_multiple=16,
                    max_seq_len=64)
    videos = [rng.uniform(0.2, 0.8, (t, 54, 2)).astype(np.float32)
              for t in (10, 25)]
    masks = [(rng.random(t) < 0.3).astype(np.float32) for t in (10, 25)]
    out = inp.inpaint(videos, masks)
    for v, m, o in zip(videos, masks, out):
        assert o.shape == v.shape
        np.testing.assert_array_equal(o[m == 0], v[m == 0])
        assert not np.allclose(o[m == 1], v[m == 1])


def test_bf16_compute_mode(rng):
    """The model runs and stays finite with bfloat16 activations."""
    model = KeypointCompleter(hidden_dim=32, num_layers=1, num_heads=4,
                              ff_dim=64, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(size=(2, 16, 54, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), x, x)
    out = model.apply(params, x, x)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
