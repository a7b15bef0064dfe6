"""Parity against the ACTUAL reference code at /root/reference.

Round 1 proved parity against a hand-rebuilt torch oracle
(test_model_parity.py) — a transcription error there would go undetected
(VERDICT.md missing #2).  These tests import the real reference modules
read-only and assert:

  * the Flax KeypointCompleter / -Cycle forward matches the real
    ``model.KeypointCompleter`` / ``KeypointCompleterCycle`` (model.py:60-321)
    on random weights via ``completer_params_from_torch``;
  * ``attention_bias`` matches the real ``KeypointCompleter.get_mask``
    (model.py:172-209) for every matrixType;
  * a checkpoint produced by the REAL ``A1_train.train_epoch``
    (A1_train.py:84-137) loads here and reproduces the real
    ``eval_epoch`` (A1_train.py:139-218) composite EuclideanLoss values and
    epoch-0 baselines to <= 1e-4 masked-frame MPJPE.

The reference needs ``wandb`` (not installed) and an external
``points_54.csv`` (not shipped); both are provided as a stub / a generated
file, which exercises our own ``write_edges_csv`` against the real
``get_edges_index`` reader (utils.py:103-113).
"""

import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from keypoints_interpolation_transformer_tpu.data.keypoints import (
    write_edges_csv)
from keypoints_interpolation_transformer_tpu.models.completer import (
    KeypointCompleter, keypoint_completer_cycle)
from keypoints_interpolation_transformer_tpu.ops.cubic_spline import (
    cubic_interpolation)
from keypoints_interpolation_transformer_tpu.ops.losses import (
    composite_prediction, euclidean_loss)
from keypoints_interpolation_transformer_tpu.ops.masks import (
    NEG, attention_bias)
from keypoints_interpolation_transformer_tpu.train.checkpoint import (
    completer_params_from_torch, load_reference_checkpoint)

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

D, HEADS, LAYERS, T = 32, 4, 2, 9


def _stub_wandb():
    if "wandb" in sys.modules:
        return
    w = types.ModuleType("wandb")
    w.init = w.log = w.watch = w.log_artifact = lambda *a, **k: None
    w.Image = lambda *a, **k: None
    w.Artifact = lambda *a, **k: types.SimpleNamespace(
        add_file=lambda *a, **k: None)
    w.run = types.SimpleNamespace(name="stub", log_code=lambda *a, **k: None)
    sys.modules["wandb"] = w


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Imports the real reference model + A1 trainer modules."""
    _stub_wandb()
    work = tmp_path_factory.mktemp("refwork")
    write_edges_csv(str(work / "points_54.csv"))
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(work)  # A1_train reads ./points_54.csv at import (utils.py:105)
    try:
        import euclidean_loss as ref_losses
        import model as ref_model
        import A1_train as ref_a1
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)
    return types.SimpleNamespace(model=ref_model, a1=ref_a1,
                                 losses=ref_losses)


def _inputs(rng, t=T):
    x = rng.uniform(size=(t, 54, 2)).astype(np.float32)
    filled = rng.uniform(size=(t, 54, 2)).astype(np.float32)
    fmask = (rng.uniform(size=t) < 0.4).astype(np.float32)
    return x, filled, fmask


@pytest.mark.parametrize("kind", ["triangle", "repeat", "repeat-inc", "all"])
def test_attention_bias_matches_real_get_mask(ref, kind):
    rng = np.random.default_rng(5)
    fmask = (rng.uniform(size=T) < 0.4).astype(np.float32)
    builder = ref.model.KeypointCompleter(108, 8, 1, 1)
    want = builder.get_mask(torch.from_numpy(fmask), T, kind).numpy()
    want = np.where(np.isneginf(want), NEG, want)
    got = np.asarray(attention_bias(kind, jnp.asarray(fmask), T))
    np.testing.assert_array_equal(got, want)


def _forward_parity(ref, variant, d, layers, heads, t, seed=11,
                    atol=5e-5, rtol=1e-4):
    torch.manual_seed(seed)
    cls = (ref.model.KeypointCompleter if variant == "plain"
           else ref.model.KeypointCompleterCycle)
    net = cls(108, d, layers, heads).eval()

    rng = np.random.default_rng(3)
    x, filled, fmask = _inputs(rng, t)
    kind = "repeat-inc" if variant == "plain" else "all"
    builder = ref.model.KeypointCompleter(108, 8, 1, 1)
    real_mask = builder.get_mask(torch.from_numpy(fmask), t, kind)

    with torch.no_grad():
        want = net(torch.from_numpy(x), torch.from_numpy(filled),
                   src_pad_mask=torch.from_numpy(fmask).unsqueeze(0),
                   tgt_pad_mask=torch.from_numpy(fmask).unsqueeze(0),
                   src_mask=real_mask, tgt_mask=real_mask).numpy()

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = completer_params_from_torch(sd, layers)
    if variant == "plain":
        m = KeypointCompleter(hidden_dim=d, num_layers=layers,
                              num_heads=heads)
    else:
        m = keypoint_completer_cycle(d, layers, heads)
    bias = attention_bias(kind, jnp.asarray(fmask), t)
    got = m.apply({"params": params},
                  jnp.asarray(x)[None], jnp.asarray(filled)[None],
                  src_frame_mask=jnp.asarray(fmask)[None],
                  tgt_frame_mask=jnp.asarray(fmask)[None],
                  src_bias=bias, tgt_bias=bias)
    got = np.asarray(got)[0]
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)
    # the headline gate: masked-frame MPJPE between the two frameworks
    sel = fmask > 0
    mpjpe = float(np.mean(np.linalg.norm(got[sel] - want[sel], axis=-1)))
    assert mpjpe <= 1e-4, f"masked-frame MPJPE {mpjpe}"


@pytest.mark.parametrize("variant", ["plain", "cycle"])
def test_flax_matches_real_reference_forward(ref, variant):
    _forward_parity(ref, variant, D, LAYERS, HEADS, T)


@pytest.mark.parametrize("variant", ["plain", "cycle"])
def test_flax_matches_real_reference_forward_flagship(ref, variant):
    """Forward parity at the reference's OWN default dimensions —
    hidden_dim=256, num_layers=6, num_heads=8 (parseMain.py:10-14) — and
    T=128 (well past the toy T=9): numerical error compounds ~3x deeper
    and ~8x wider than the toy case, so this is the configuration the
    RESULTS.md parity table actually claims."""
    _forward_parity(ref, variant, 256, 6, 8, 128, atol=2e-4, rtol=1e-3)


def _synthetic_videos(rng, lengths=(8, 11, 9)):
    """(inputs, sota, mask) batch-1 tuples shaped like LSP_Dataset output
    after add_sos (dataloader.py:482-493,674-686): SOS-ones frame prepended
    to the corrupted stream and a 0 prepended to the mask; sota is the
    clean video without SOS."""
    videos = []
    for t in lengths:
        clean = rng.uniform(0.2, 0.8, size=(t, 54, 2)).astype(np.float32)
        miss = (rng.uniform(size=t) < 0.35).astype(np.float32)
        miss[0] = 0.0  # reference blocks never start at frame 0 after SOS
        masked = np.where(miss[:, None, None] > 0, clean[0], clean)
        inputs = np.concatenate(
            [np.ones((1, 54, 2), np.float32), masked])
        mask = np.concatenate([[0.0], miss]).astype(np.float32)
        videos.append((torch.from_numpy(inputs)[None],
                       torch.from_numpy(clean)[None],
                       torch.from_numpy(mask)[None]))
    return videos


def _real_a1_roundtrip(ref, tmp_path, d, layers, heads, lengths,
                       train_epochs=2):
    """Train with the REAL A1 train_epoch, eval with the REAL eval_epoch,
    save the reference .pth schema, load it here, and reproduce the real
    composite eval losses and predictions."""
    torch.manual_seed(0)
    net = ref.model.KeypointCompleter(108, d, layers, heads)
    rng = np.random.default_rng(7)
    videos = _synthetic_videos(rng, lengths)

    crit = torch.nn.MSELoss()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    dev = torch.device("cpu")
    for _ in range(train_epochs):
        losses = ref.a1.train_epoch(net, videos, crit, opt, dev)
    assert np.isfinite(np.mean(losses))

    # Real eval at epoch 0: fills the module-level baseline/cubic lists
    ref.a1.loss_baseline_acum.clear()
    ref.a1.loss_cubic_acum.clear()
    val_crit = ref.losses.EuclideanLoss()
    with torch.no_grad():
        val_losses, _ = ref.a1.eval_epoch(net, videos, val_crit, 0, dev)

    path = str(tmp_path / "real_a1.pth")
    torch.save({
        "model_state_dict": net.state_dict(),
        "optimizer_state_dict": opt.state_dict(),
        "input_size": 108, "hidden_dim": d, "num_layers": layers,
        "num_heads": heads, "loss": float(np.mean(val_losses)),
    }, path)
    params, hyper = load_reference_checkpoint(path)
    assert hyper["hidden_dim"] == d and hyper["num_layers"] == layers
    m = KeypointCompleter(hidden_dim=d, num_layers=layers, num_heads=heads)

    for i, (inputs, sota, mask) in enumerate(videos):
        x = inputs[0].numpy()[:-1]
        x_no_sota = inputs[0].numpy()[1:]
        y = sota[0].numpy()
        x_mask = mask[0].numpy()[:-1]
        y_mask = mask[0].numpy()[1:]
        t = x.shape[0]

        with torch.no_grad():
            want = net(torch.from_numpy(x), torch.from_numpy(x_no_sota),
                       src_pad_mask=torch.from_numpy(x_mask).unsqueeze(0),
                       tgt_pad_mask=torch.from_numpy(y_mask).unsqueeze(0),
                       src_mask=net.get_mask(torch.from_numpy(x_mask), t,
                                             "repeat-inc"),
                       tgt_mask=net.get_mask(torch.from_numpy(y_mask), t,
                                             "repeat-inc")).numpy()

        got = np.asarray(m.apply(
            {"params": params},
            jnp.asarray(x)[None], jnp.asarray(x_no_sota)[None],
            src_frame_mask=jnp.asarray(x_mask)[None],
            src_bias=attention_bias("repeat-inc", jnp.asarray(x_mask), t),
            tgt_bias=attention_bias("repeat-inc", jnp.asarray(y_mask), t),
        ))[0]

        # masked-frame MPJPE between real-torch and loaded-Flax predictions
        sel = y_mask > 0
        mpjpe = float(np.mean(np.linalg.norm(
            got[sel] - want[sel], axis=-1)))
        assert mpjpe <= 1e-4, f"video {i}: masked-frame MPJPE {mpjpe}"

        # composite eval loss must reproduce the real eval_epoch value
        comp = composite_prediction(jnp.asarray(got)[None],
                                    jnp.asarray(y)[None],
                                    jnp.asarray(y_mask)[None])
        ours = float(euclidean_loss(comp, jnp.asarray(y)[None])[0])
        np.testing.assert_allclose(ours, float(val_losses[i]),
                                   rtol=1e-4, atol=1e-6)

        # epoch-0 baselines: real freeze-frame + real pandas cubic vs ours
        base_ours = float(euclidean_loss(jnp.asarray(x_no_sota)[None],
                                         jnp.asarray(y)[None])[0])
        np.testing.assert_allclose(base_ours,
                                   float(ref.a1.loss_baseline_acum[i]),
                                   rtol=1e-5, atol=1e-7)
        cubic_ours = cubic_interpolation(jnp.asarray(x_no_sota),
                                         jnp.asarray(y_mask))
        cubic_loss_ours = float(euclidean_loss(cubic_ours[None],
                                               jnp.asarray(y)[None])[0])
        np.testing.assert_allclose(cubic_loss_ours,
                                   float(ref.a1.loss_cubic_acum[i]),
                                   rtol=1e-4, atol=1e-5)


def test_real_a1_train_checkpoint_roundtrip(ref, tmp_path):
    _real_a1_roundtrip(ref, tmp_path, D, LAYERS, HEADS, (8, 11, 9))


@pytest.mark.slow
def test_real_a1_train_checkpoint_roundtrip_flagship(ref, tmp_path):
    """The round-2 VERDICT's missing #1: the same real-A1 .pth round-trip
    at the reference's flagship configuration (256/6/8, parseMain.py:10-14)
    with T >= 128 — the <=1e-4 masked-MPJPE parity claim is asserted at the
    dimensions RESULTS.md actually cites, not extrapolated from 32/2/9."""
    _real_a1_roundtrip(ref, tmp_path, 256, 6, 8, (128, 140, 131),
                       train_epochs=1)
