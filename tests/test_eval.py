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
    assert res["end_to_end_frames_per_sec"] > 0
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


def test_http_serving_endpoint(rng):
    """Drive the HTTP surface itself: valid request, malformed payloads."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from keypoints_interpolation_transformer_tpu.eval import serving

    mc, params = _tiny_model_and_params()
    inp = serving.Inpainter({"params": params}, mc, bucket_multiple=16,
                            max_seq_len=32)

    server, batcher = serving.make_server(inp, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    try:
        ok = json.loads(urllib.request.urlopen(
            f"{base}/healthz", timeout=30).read())
        assert ok == {"ok": True}

        v = rng.uniform(0.2, 0.8, (8, 54, 2)).astype(np.float32)
        m = [0, 1, 1, 0, 0, 0, 1, 0]
        req = json.dumps({"videos": [v.tolist()], "masks": [m]}).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"{base}/inpaint", req,
            {"Content-Type": "application/json"}), timeout=300)
        out = np.asarray(json.loads(r.read())["videos"][0], np.float32)
        mm = np.array(m)
        np.testing.assert_allclose(out[mm == 0], v[mm == 0], atol=1e-6)
        assert not np.allclose(out[mm == 1], v[mm == 1])

        # malformed: wrong keypoint shape -> 400 naming the shape
        bad = json.dumps({"videos": [[[0.1, 0.2]] * 4],
                          "masks": [[0] * 4]}).encode()
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/inpaint", bad,
                {"Content-Type": "application/json"}), timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        batcher.close()


def test_int8_quantized_inpainter(rng):
    """quantize="int8" swaps every Dense matmul for an int8 dot via the
    flax method interceptor: same composite identity on non-missing
    frames, predictions within int8 dequantization tolerance of the
    float path, and every 2-D Dense kernel covered by the quant table."""
    from keypoints_interpolation_transformer_tpu.eval import serving
    from keypoints_interpolation_transformer_tpu.eval.quantize import (
        quantization_error, quantize_dense_table)

    mc, params = _tiny_model_and_params()
    fl = serving.Inpainter({"params": params}, mc, bucket_multiple=16,
                           max_seq_len=32)
    q8 = serving.Inpainter({"params": params}, mc, bucket_multiple=16,
                           max_seq_len=32, quantize="int8")

    table = quantize_dense_table({"params": params})
    n_dense = sum(1 for p in jax.tree_util.tree_leaves_with_path(params)
                  if p[0][-1].key == "kernel" and p[1].ndim == 2)
    assert len(table) == n_dense > 0

    v = rng.uniform(0.2, 0.8, (12, 54, 2)).astype(np.float32)
    m = np.zeros(12, np.float32)
    m[4:8] = 1.0
    out_f = fl.inpaint([v], [m])[0]
    out_q = q8.inpaint([v], [m])[0]

    # composite keeps non-missing frames bit-identical to the input
    np.testing.assert_array_equal(out_q[m == 0], v[m == 0])
    # int8 predictions track the float forward
    np.testing.assert_allclose(out_q[m == 1], out_f[m == 1], atol=0.05)
    # ... but are genuinely quantized (not the float path in disguise)
    assert np.abs(out_q[m == 1] - out_f[m == 1]).max() > 0

    # direct forward-delta report agrees
    x = jnp.asarray(v[None])
    err = quantization_error(fl.model, {"params": params}, table, (x, x))
    assert 0 < err < 0.1


def test_http_serving_batches_concurrent_requests(rng):
    """N concurrent single-video POSTs are merged into shared device
    dispatches by the RequestBatcher; every response is still correct."""
    import json
    import threading
    import urllib.request

    from keypoints_interpolation_transformer_tpu.eval import serving

    mc, params = _tiny_model_and_params()
    inp = serving.Inpainter({"params": params}, mc, bucket_multiple=16,
                            max_seq_len=32)
    # wide window so all concurrent requests land in one batch
    server, batcher = serving.make_server(inp, host="127.0.0.1", port=0,
                                          window_ms=300.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    N, T = 6, 8
    vids = [rng.uniform(0.2, 0.8, (T, 54, 2)).astype(np.float32)
            for _ in range(N)]
    mask = [0, 1, 1, 0, 0, 0, 1, 0]
    results, errs = [None] * N, []

    # warm the jit once so the timed window isn't a compile
    inp.inpaint([vids[0]], [np.asarray(mask, np.float32)])

    def post(i):
        try:
            req = json.dumps({"videos": [vids[i].tolist()],
                              "masks": [mask]}).encode()
            r = urllib.request.urlopen(urllib.request.Request(
                f"{base}/inpaint", req,
                {"Content-Type": "application/json"}), timeout=300)
            results[i] = np.asarray(json.loads(r.read())["videos"][0],
                                    np.float32)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    try:
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(N)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        mm = np.array(mask)
        for i in range(N):
            np.testing.assert_allclose(results[i][mm == 0],
                                       vids[i][mm == 0], atol=1e-6)

        stats = json.loads(urllib.request.urlopen(
            f"{base}/statz", timeout=30).read())
        assert stats["requests"] == N
        assert stats["videos"] == N
        # fewer device dispatches than requests = batching happened
        assert stats["batches"] < N, stats
        assert stats["max_batch_videos"] > 1, stats
    finally:
        server.shutdown()
        batcher.close()


def _variant_params(variant):
    from keypoints_interpolation_transformer_tpu.train.steps import (
        build_model)
    mc = ModelConfig(hidden_dim=32, num_layers=1, num_heads=4, ff_dim=64)
    model = build_model(mc, variant)
    x = jnp.zeros((1, 8, 54, 2))
    if variant == "embedding":
        params = model.init(jax.random.key(1), x)["params"]
    else:
        params = model.init(jax.random.key(1), x, x)["params"]
    return mc, params


def test_evaluate_checkpoint_cycle_variant():
    """eval-model covers a2 (Cycle) checkpoints: same metric dict as
    plain, driven by a frozen first model (A2_train_cycle.py:99-115)."""
    _, first_params = _tiny_model_and_params()
    mc, params = _variant_params("cycle")
    res = evaluate_checkpoint(params, mc, _tiny_ds(4), batch_size=4,
                              warmup=False, variant="cycle",
                              first_params=first_params)
    for k in ("val_euclidean_loss", "masked_mpjpe",
              "end_to_end_frames_per_sec", "num_videos"):
        assert np.isfinite(res[k]) and res[k] >= 0, (k, res[k])
    assert res["variant"] == "cycle"
    # first_params is mandatory for cycle
    import pytest
    with pytest.raises(ValueError):
        evaluate_checkpoint(params, mc, _tiny_ds(4), variant="cycle")


def test_evaluate_checkpoint_embedding_variant():
    """eval-model covers a3 (Embedding AE) checkpoints, scored as the A3
    regime scores them (identity recon of the zero-masked stream)."""
    mc, params = _variant_params("embedding")
    res = evaluate_checkpoint(params, mc, _tiny_ds(4), batch_size=4,
                              warmup=False, variant="embedding")
    for k in ("val_euclidean_loss", "masked_mpjpe",
              "end_to_end_frames_per_sec"):
        assert np.isfinite(res[k]) and res[k] >= 0, (k, res[k])
    assert res["variant"] == "embedding"


def test_serving_cycle_and_embedding_variants(rng):
    """The Inpainter serves every checkpoint type the framework produces;
    composite still keeps non-missing frames bit-identical."""
    from keypoints_interpolation_transformer_tpu.eval import serving

    _, first_params = _tiny_model_and_params()
    v = rng.uniform(0.2, 0.8, (12, 54, 2)).astype(np.float32)
    m = np.zeros(12, np.float32)
    m[4:8] = 1.0

    for variant in ("cycle", "embedding"):
        mc, params = _variant_params(variant)
        kw = {"first_params": first_params} if variant == "cycle" else {}
        inp = serving.Inpainter({"params": params}, mc, bucket_multiple=16,
                                max_seq_len=32, variant=variant, **kw)
        out = inp.inpaint([v], [m])[0]
        assert out.shape == v.shape
        np.testing.assert_array_equal(out[m == 0], v[m == 0])
        assert np.abs(out[m == 1] - v[m == 1]).max() > 0  # actually filled
        assert np.isfinite(out).all()


def test_eval_baselines_cli_writes_reference_artifacts(tmp_path, capsys):
    """The eval-baselines CLI emits the reference scripts' image files:
    initial_loss_euclidean_{ds}.jpg (2_dataset_missing_loss.py:69),
    cubic_histogram_freq_{ds}.jpg and cubic_histogram_{ds}.jpg
    (3_test_cubic_interpolation.py:100-176)."""
    import json
    import os

    from keypoints_interpolation_transformer_tpu.cli import main

    rd = str(tmp_path / "res")
    rc = main(["eval-baselines", "--synthetic", "6",
               "--batch_size", "4", "--results_dir", rd])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    expect = [f"initial_loss_euclidean_synthetic.jpg",
              f"cubic_histogram_freq_synthetic.jpg",
              f"cubic_histogram_synthetic.jpg"]
    for name in expect:
        path = os.path.join(rd, name)
        assert path in out["artifacts"], (name, out["artifacts"])
        assert os.path.getsize(path) > 0
    assert "anova" in out["stats"]
