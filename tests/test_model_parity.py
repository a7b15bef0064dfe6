"""Numerical parity of the Flax KeypointCompleter against a torch oracle.

The oracle assembles the reference architecture (model.py:60-321) from
torch built-ins using the reference's parameter names, so that
``completer_params_from_torch`` can ingest its state dict — this is exactly
the path a reference ``.pth`` checkpoint takes.  Forward outputs must agree
to float32 tolerance, which is what underwrites the 1e-4 MPJPE parity
target in BASELINE.json.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from keypoints_interpolation_transformer_tpu.models.completer import (
    Embedding, KeypointCompleter, keypoint_completer_cycle)
from keypoints_interpolation_transformer_tpu.ops.masks import attention_bias
from keypoints_interpolation_transformer_tpu.train.checkpoint import (
    completer_params_from_torch, embedding_params_from_torch)

D, HEADS, LAYERS, T, K, FF = 32, 4, 2, 9, 54, 64


class _TorchSwiGLU(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1, self.fc2, self.fc3 = (tnn.Linear(dim, dim) for _ in range(3))

    def forward(self, x):
        return self.fc3(self.fc1(x) * torch.sigmoid(self.fc2(x)))


def _pe_table(max_len, dim):
    pos = torch.arange(max_len, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, dim, 2, dtype=torch.float32)
                    * (-math.log(10000.0) / dim))
    pe = torch.zeros(max_len, dim)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


class _TorchOracle(tnn.Module):
    """Reference-equivalent forward, unbatched (T, K, 2) in / out."""

    def __init__(self, input_size, d, layers, heads, pe_residual=False,
                 use_tgt_kp=False):
        super().__init__()
        self.pe_residual, self.use_tgt_kp = pe_residual, use_tgt_kp
        self.input_embedding = tnn.Linear(input_size, d)
        self.filled_embedding = tnn.Linear(input_size, d)
        self.norm = tnn.InstanceNorm1d(d)
        self.learned_input_positional_encoder = tnn.Parameter(
            torch.rand(1, 1, d))
        self.learned_filled_positional_encoder = tnn.Parameter(
            torch.rand(1, 1, d))
        self.swiGlu_input_prev = _TorchSwiGLU(d)
        self.swiGlu_filled_prev = _TorchSwiGLU(d)
        self.transformer = tnn.Transformer(
            d_model=d, nhead=heads, activation="gelu", dropout=0.0,
            num_encoder_layers=layers, num_decoder_layers=layers,
            dim_feedforward=FF)
        self.swiGlu_decoded = _TorchSwiGLU(d)
        self.fc_final = tnn.Linear(d, input_size)
        self.register_buffer("pe", _pe_table(2048, d))

    def forward(self, x, filled, src_pad, tgt_pad, src_mask, tgt_mask):
        T_ = x.shape[0]
        seq = x.flatten(1).unsqueeze(1).float()       # (T, 1, F)
        fseq = filled.flatten(1).unsqueeze(1).float()
        ie, fe = self.input_embedding(seq), self.filled_embedding(fseq)
        inorm, fnorm = self.norm(ie), self.norm(fe)
        pe = self.pe[:T_].unsqueeze(1)
        if self.pe_residual:
            ip = inorm + (inorm + pe) + self.learned_input_positional_encoder
            fp = fnorm + (fnorm + pe) + self.learned_filled_positional_encoder
        else:
            ip = (inorm + pe) + self.learned_input_positional_encoder
            fp = (fnorm + pe) + self.learned_filled_positional_encoder
        dec = self.transformer(
            self.swiGlu_input_prev(ip), self.swiGlu_filled_prev(fp),
            src_key_padding_mask=src_pad,
            tgt_key_padding_mask=tgt_pad if self.use_tgt_kp else None,
            src_mask=src_mask, tgt_mask=tgt_mask)
        dec = self.norm(self.swiGlu_decoded(dec) + fe)
        dec = dec * torch.sigmoid(dec)
        out = self.fc_final(dec.transpose(0, 1))
        return out.squeeze(0).view(-1, K, 2)


def _random_inputs(rng, t=T):
    x = rng.uniform(size=(t, K, 2)).astype(np.float32)
    filled = rng.uniform(size=(t, K, 2)).astype(np.float32)
    fmask = (rng.uniform(size=t) < 0.4).astype(np.float32)
    return x, filled, fmask


@pytest.mark.parametrize("variant", ["plain", "cycle"])
def test_completer_matches_torch_oracle(rng, variant):
    torch.manual_seed(7)
    cycle = variant == "cycle"
    oracle = _TorchOracle(K * 2, D, LAYERS, HEADS, pe_residual=cycle,
                          use_tgt_kp=cycle).eval()

    x, filled, fmask = _random_inputs(rng)
    kind = "all" if cycle else "repeat-inc"
    bias = np.asarray(attention_bias(kind, jnp.asarray(fmask), T))

    with torch.no_grad():
        want = oracle(
            torch.from_numpy(x), torch.from_numpy(filled),
            torch.from_numpy(fmask).unsqueeze(0),
            torch.from_numpy(fmask).unsqueeze(0),
            torch.from_numpy(np.where(bias < -1e8, -np.inf, bias)),
            torch.from_numpy(np.where(bias < -1e8, -np.inf, bias)),
        ).numpy()

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = completer_params_from_torch(sd, LAYERS)

    if cycle:
        model = keypoint_completer_cycle(D, LAYERS, HEADS, input_size=K * 2,
                                         ff_dim=FF)
    else:
        model = KeypointCompleter(hidden_dim=D, num_layers=LAYERS,
                                  num_heads=HEADS, input_size=K * 2,
                                  ff_dim=FF)
    got = model.apply(
        {"params": params},
        jnp.asarray(x)[None], jnp.asarray(filled)[None],
        src_frame_mask=jnp.asarray(fmask)[None],
        tgt_frame_mask=jnp.asarray(fmask)[None],
        src_bias=jnp.asarray(bias), tgt_bias=jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got)[0], want,
                               atol=2e-5, rtol=1e-4)


def test_padded_batch_equals_unpadded(rng):
    """Padding frames must not perturb real-frame outputs."""
    torch.manual_seed(3)
    oracle = _TorchOracle(K * 2, D, LAYERS, HEADS).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = completer_params_from_torch(sd, LAYERS)
    model = KeypointCompleter(hidden_dim=D, num_layers=LAYERS,
                              num_heads=HEADS, input_size=K * 2, ff_dim=FF)

    x, filled, fmask = _random_inputs(rng, t=6)
    bias6 = attention_bias("repeat-inc", jnp.asarray(fmask), 6)
    out_exact = model.apply(
        {"params": params}, jnp.asarray(x)[None], jnp.asarray(filled)[None],
        src_frame_mask=jnp.asarray(fmask)[None],
        src_bias=bias6, tgt_bias=bias6)

    t_max = 10
    xp = np.zeros((1, t_max, K, 2), np.float32)
    fp = np.zeros((1, t_max, K, 2), np.float32)
    mp = np.zeros((1, t_max), np.float32)
    vp = np.zeros((1, t_max), np.float32)
    xp[0, :6], fp[0, :6], mp[0, :6], vp[0, :6] = x, filled, fmask, 1.0
    bias10 = attention_bias("repeat-inc", jnp.asarray(mp), t_max)
    out_pad = model.apply(
        {"params": params}, jnp.asarray(xp), jnp.asarray(fp),
        src_frame_mask=jnp.asarray(mp),
        src_bias=bias10, tgt_bias=bias10,
        valid_mask=jnp.asarray(vp))
    np.testing.assert_allclose(np.asarray(out_pad)[0, :6],
                               np.asarray(out_exact)[0], atol=1e-5)


def test_embedding_matches_torch(rng):
    torch.manual_seed(5)
    lin_in, lin_out = tnn.Linear(K * 2, D), tnn.Linear(D, K * 2)
    x = rng.uniform(size=(4, K, 2)).astype(np.float32)
    with torch.no_grad():
        want = lin_out(lin_in(torch.from_numpy(x).flatten(1))).view(
            -1, K, 2).numpy()
    sd = {}
    for name, mod in (("input_embedding", lin_in),
                      ("output_embedding", lin_out)):
        sd[f"{name}.weight"] = mod.weight.detach().numpy()
        sd[f"{name}.bias"] = mod.bias.detach().numpy()
    params = embedding_params_from_torch(sd)
    model = Embedding(hidden_dim=D, input_size=K * 2)
    got = model.apply({"params": params}, jnp.asarray(x)[None])
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=1e-5)


def test_scan_layers_equivalence(rng):
    """scan_layers=True (stacked params, lax.scan) must reproduce the
    unrolled stack exactly; stack/unstack converters round-trip."""
    import jax
    from keypoints_interpolation_transformer_tpu.train.checkpoint import (
        stack_layer_params, unstack_layer_params)

    kw = dict(hidden_dim=D, num_layers=LAYERS, num_heads=HEADS, ff_dim=FF,
              input_size=K * 2)
    m_plain = KeypointCompleter(**kw)
    m_scan = KeypointCompleter(**kw, scan_layers=True)
    x, filled, fmask = _random_inputs(rng)
    bias = attention_bias("repeat-inc", jnp.asarray(fmask), T)

    p = m_plain.init(jax.random.key(0), jnp.asarray(x)[None],
                     jnp.asarray(filled)[None])["params"]
    ps = stack_layer_params(p)
    out_plain = m_plain.apply({"params": p}, jnp.asarray(x)[None],
                              jnp.asarray(filled)[None],
                              src_frame_mask=jnp.asarray(fmask)[None],
                              src_bias=bias, tgt_bias=bias)
    out_scan = m_scan.apply({"params": ps}, jnp.asarray(x)[None],
                            jnp.asarray(filled)[None],
                            src_frame_mask=jnp.asarray(fmask)[None],
                            src_bias=bias, tgt_bias=bias)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_plain),
                               atol=2e-6)
    back = unstack_layer_params(ps)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # remat variant: gradients flow and stay finite
    m_remat = KeypointCompleter(**kw, scan_layers=True, remat=True)
    g = jax.grad(lambda pp: float(0) + jnp.sum(m_remat.apply(
        {"params": pp}, jnp.asarray(x)[None], jnp.asarray(filled)[None],
        src_frame_mask=jnp.asarray(fmask)[None],
        src_bias=bias, tgt_bias=bias) ** 2))(ps)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
