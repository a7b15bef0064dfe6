"""Pallas kernels (run in interpreter mode on CPU; the real-TPU path is
exercised by bench/verification): parity with the XLA reference
implementations, forward and gradient."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from keypoints_interpolation_transformer_tpu.models.completer import (
    KeypointCompleter)
from keypoints_interpolation_transformer_tpu.ops import losses
from keypoints_interpolation_transformer_tpu.ops.masks import attention_bias
from keypoints_interpolation_transformer_tpu.ops.pallas.attention import (
    fused_attention, xla_attention)
from keypoints_interpolation_transformer_tpu.ops.pallas.masked_loss import (
    fused_euclidean_loss)


def _qkv(rng, B=2, T=32, H=4, dh=32):
    return tuple(jnp.asarray(rng.normal(size=(B, T, H, dh)).astype(
        np.float32)) for _ in range(3))


@pytest.mark.parametrize("kind,keypad", [("repeat-inc", True),
                                         ("repeat-inc", False),
                                         ("all", True), ("all", False)])
def test_fused_attention_matches_xla(rng, kind, keypad):
    q, k, v = _qkv(rng)
    mask = jnp.asarray((rng.random((2, 32)) < 0.3).astype(np.float32))
    valid = jnp.asarray((np.arange(32)[None, :] <
                         np.array([[32], [20]])).astype(np.float32))
    # "highest" keeps the kernel's MXU dtype at f32 (matching the f32 XLA
    # oracle); the default-precision bf16 cast is covered separately below
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        got = fused_attention(q, k, v, mask, valid, kind, keypad)
    want = xla_attention(q, k, v, mask, valid, kind, keypad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_batch_block_budget_scales_with_width():
    """The VMEM block budget is bytes-based: wider models get fewer rows
    per grid cell (D=1024 f32 overflowed the 16 MB scoped VMEM when the
    budget was row-based)."""
    from keypoints_interpolation_transformer_tpu.ops.pallas.attention \
        import _batch_block

    # flagship: D=256 f32 -> 1 MB/block allows bb*T = 1024 rows
    assert _batch_block(256, 128, 256, 4) == 8
    # 4x wider -> 4x fewer rows per block
    assert _batch_block(256, 128, 1024, 4) == 2
    # bf16 halves the bytes -> twice the rows of f32 at the same width
    assert _batch_block(256, 256, 1024, 2) == 2
    assert _batch_block(256, 256, 1024, 4) == 1
    # degenerate: always at least one row
    assert _batch_block(1, 2048, 4096, 4) == 1


def test_ambient_precision_selects_mxu_mode():
    from keypoints_interpolation_transformer_tpu.ops.pallas.attention \
        import _mxu_mode

    assert _mxu_mode(jnp.bfloat16) == "bf16"
    with jax.default_matmul_precision("highest"):
        assert _mxu_mode(jnp.float32) == "f32"
    with jax.default_matmul_precision("high"):
        assert _mxu_mode(jnp.float32) == "bf16x3"
    with jax.default_matmul_precision("default"):
        assert _mxu_mode(jnp.float32) == "bf16"


def test_fused_attention_default_precision_tracks_bf16(rng):
    """Under default matmul precision the kernel casts to bf16 like XLA;
    parity holds at bf16 tolerance."""
    q, k, v = _qkv(rng)
    mask = jnp.asarray((rng.random((2, 32)) < 0.3).astype(np.float32))
    valid = jnp.ones((2, 32), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_attention(q, k, v, mask, valid, "repeat-inc", True)
    want = xla_attention(q, k, v, mask, valid, "repeat-inc", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_fused_attention_grads_match(rng):
    q, k, v = _qkv(rng)
    mask = jnp.asarray((rng.random((2, 32)) < 0.3).astype(np.float32))
    valid = jnp.ones((2, 32), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mask, valid,
                                       "repeat-inc", True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, mask, valid,
                                     "repeat-inc", True) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_attention_long_seq_xla_bwd_path(rng):
    """T above _BWD_PALLAS_MAX_T takes the XLA recompute backward."""
    T = 640
    q, k, v = _qkv(rng, B=1, T=T)
    mask = jnp.asarray((rng.random((1, T)) < 0.3).astype(np.float32))
    valid = jnp.ones((1, T), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, mask, valid,
                                       "repeat-inc", True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, mask, valid,
                                     "repeat-inc", True) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_model_pallas_impl_matches_xla_impl(rng):
    """Whole model with attention_impl='pallas' equals the default path."""
    T = 16
    x = jnp.asarray(rng.uniform(size=(1, T, 54, 2)).astype(np.float32))
    f = jnp.asarray(rng.uniform(size=(1, T, 54, 2)).astype(np.float32))
    m = jnp.asarray((rng.random((1, T)) < 0.4).astype(np.float32))
    valid = jnp.ones((1, T), jnp.float32)

    kw = dict(hidden_dim=32, num_layers=1, num_heads=4, ff_dim=64)
    model_x = KeypointCompleter(**kw)
    model_p = KeypointCompleter(**kw, attention_impl="pallas")
    params = model_x.init(jax.random.key(0), x, f)

    bias = attention_bias("repeat-inc", m, T)
    out_x = model_x.apply(params, x, f, src_frame_mask=m, tgt_frame_mask=m,
                          src_bias=bias, tgt_bias=bias, valid_mask=valid)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out_p = model_p.apply(params, x, f, src_frame_mask=m,
                              tgt_frame_mask=m, valid_mask=valid)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5)


def test_fused_euclidean_loss(rng):
    p = jnp.asarray(rng.normal(size=(3, 16, 54, 2)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(3, 16, 54, 2)).astype(np.float32))
    w = jnp.asarray((np.arange(16)[None, :] <
                     np.array([[16], [9], [4]])).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fused_euclidean_loss(p, t, w)
    want = losses.euclidean_loss(p, t, frame_weight=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    def f1(p):
        return jnp.sum(fused_euclidean_loss(p, t, w))

    def f2(p):
        return jnp.sum(losses.euclidean_loss(p, t, frame_weight=w))

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f1)(p)
    g2 = jax.grad(f2)(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_auto_impl_resolution():
    """"auto" picks pallas only on the TPU platform (pallas kernels cannot
    lower for CPU); the platform comes from the PINNED default device when
    set (the test suite pins CPU while the TPU plugin still wins the
    default-backend election)."""
    import keypoints_interpolation_transformer_tpu.models.completer as mc
    import unittest.mock as mock

    with mock.patch.object(mc, "_attention_platform", return_value="tpu"):
        assert mc.resolve_attention_impl("auto", 128) == "pallas"
        assert mc.resolve_attention_impl("auto", 2048, 1024) == "pallas"
        assert mc.resolve_attention_impl("auto", 512, 1024) == "xla"
        assert mc.resolve_attention_impl("xla", 4096) == "xla"
        assert mc.resolve_attention_impl("pallas", 8) == "pallas"
    with mock.patch.object(mc, "_attention_platform", return_value="cpu"):
        assert mc.resolve_attention_impl("auto", 2048) == "xla"

    # this suite pins jax_default_device to CPU, so the default-"auto"
    # model resolves to xla and runs WITHOUT interpret mode
    assert mc._attention_platform() == "cpu"
    m = KeypointCompleter(hidden_dim=32, num_layers=1, num_heads=4,
                          ff_dim=64)   # attention_impl defaults to "auto"
    assert m.attention_impl == "auto"
    x = jnp.zeros((1, 128, 54, 2))
    msk = jnp.zeros((1, 128))
    from keypoints_interpolation_transformer_tpu.ops.masks import (
        attention_bias as ab)
    bias = ab("repeat-inc", msk, 128)
    p = m.init(jax.random.key(0), x, x, src_bias=bias, tgt_bias=bias)
    out = m.apply(p, x, x, src_frame_mask=msk, tgt_frame_mask=msk,
                  src_bias=bias, tgt_bias=bias)
    assert out.shape == (1, 128, 54, 2)

    # forcing pallas still runs under interpret mode
    mp = KeypointCompleter(hidden_dim=32, num_layers=1, num_heads=4,
                           ff_dim=64, attention_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out = mp.apply(p, x, x, src_frame_mask=msk, tgt_frame_mask=msk)
    assert out.shape == (1, 128, 54, 2)


def test_fused_loss_train_step_matches_xla(rng, tmp_path):
    """cfg.train.fused_loss routes the train criterion through the pallas
    kernel; one a1 step produces the same loss and updated params."""
    from keypoints_interpolation_transformer_tpu.train.state import TrainState
    from keypoints_interpolation_transformer_tpu.train.steps import (
        build_model, make_train_step)
    from keypoints_interpolation_transformer_tpu.utils.config import (
        Config, DataConfig, ModelConfig, TrainConfig)

    clean = jnp.asarray(np.random.default_rng(0).uniform(
        size=(4, 16, 54, 2)).astype(np.float32))
    length = jnp.asarray([16, 12, 9, 16], jnp.int32)
    weight = jnp.ones(4, jnp.float32)

    def run(fused):
        cfg = Config(
            model=ModelConfig(hidden_dim=32, num_heads=4, num_layers=1,
                              ff_dim=64),
            data=DataConfig(),
            train=TrainConfig(regime="a1", fused_loss=fused))
        model = build_model(cfg.model, "plain")
        params = model.init(jax.random.key(0), clean, clean)["params"]
        state = TrainState.create(params)
        step = make_train_step(model, cfg, None)
        with pltpu.force_tpu_interpret_mode():
            state, m = step(state, clean, length, weight,
                            jax.random.key(7), jnp.float32(1e-3))
        return float(m["loss"]), jax.tree.map(np.asarray, state.params)

    loss_x, params_x = run(False)
    loss_p, params_p = run(True)
    np.testing.assert_allclose(loss_p, loss_x, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_p), jax.tree.leaves(params_x)):
        np.testing.assert_allclose(a, b, atol=1e-6)


# ---- fused feed-forward sublayer (ops/pallas/ffn.py) ---------------------

def _ffn_operands(rng, N=24, D=32, FF=64):
    r = jnp.asarray(rng.normal(size=(2, N // 2, D)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(D, FF)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(FF,)).astype(np.float32) * 0.01)
    w2 = jnp.asarray((rng.normal(size=(FF, D)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01)
    g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
    be1 = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
    g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
    be2 = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
    return r, w1, b1, w2, b2, g1, be1, g2, be2


@pytest.mark.parametrize("pre_ln", [False, True])
def test_fused_ffn_matches_reference(rng, pre_ln):
    from keypoints_interpolation_transformer_tpu.ops.pallas.ffn import (
        ffn_reference, fused_ffn)

    ops = _ffn_operands(rng)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        got = fused_ffn(*ops, pre_ln)
    want = ffn_reference(*ops, pre_ln=pre_ln)
    # only forward delta is the in-kernel A&S-7.1.26 erf (<=1.5e-7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_ffn_grads_match(rng):
    from keypoints_interpolation_transformer_tpu.ops.pallas.ffn import (
        ffn_reference, fused_ffn)

    ops = _ffn_operands(rng)

    def f1(*a):
        return jnp.sum(fused_ffn(*a, True) ** 2)

    def f2(*a):
        return jnp.sum(ffn_reference(*a, pre_ln=True) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g1 = jax.grad(f1, argnums=tuple(range(9)))(*ops)
    g2 = jax.grad(f2, argnums=tuple(range(9)))(*ops)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_split_hi_lo_survives_jit_folding(rng):
    """REGRESSION: an astype-round-trip hi/lo split gets folded by XLA's
    excess-precision simplifier when the input is a runtime value, turning
    lo into zeros and silently degrading bf16x3 to single-pass bf16
    (observed as full-model MPJPE 1.9e-3 vs the 1e-4 gate).  The
    reduce_precision-based split must yield a faithful two-term
    decomposition under jit for ARGUMENT inputs."""
    from keypoints_interpolation_transformer_tpu.ops.pallas.ffn import (
        _split_hi_lo)

    x = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    hi, lo = jax.jit(_split_hi_lo)(x)
    # the two bf16 terms reconstruct x to ~bf16^2 relative error
    recon = hi.astype(np.float32) + lo.astype(np.float32)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x),
                               rtol=1e-5, atol=1e-6)
    # and lo genuinely carries the residual (the bug zeroed it)
    assert float(jnp.max(jnp.abs(lo.astype(jnp.float32)))) > 0


def test_model_ff_pallas_matches_xla_and_shares_params(rng):
    """ff_impl='pallas' reuses the exact param tree of the xla path (so
    checkpoints swap freely) and reproduces its outputs."""
    T = 16
    x = jnp.asarray(rng.uniform(size=(1, T, 54, 2)).astype(np.float32))
    f = jnp.asarray(rng.uniform(size=(1, T, 54, 2)).astype(np.float32))
    m = jnp.asarray((rng.random((1, T)) < 0.4).astype(np.float32))

    kw = dict(hidden_dim=32, num_layers=2, num_heads=4, ff_dim=64,
              attention_impl="xla")
    model_x = KeypointCompleter(**kw, ff_impl="xla")
    model_p = KeypointCompleter(**kw, ff_impl="pallas")
    params = model_x.init(jax.random.key(0), x, f)
    with pltpu.force_tpu_interpret_mode():
        params_p = model_p.init(jax.random.key(0), x, f)
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_p)):
        assert a.shape == b.shape

    from keypoints_interpolation_transformer_tpu.ops.masks import (
        attention_bias)
    bias = attention_bias("repeat-inc", m, T)
    out_x = model_x.apply(params, x, f, src_frame_mask=m, tgt_frame_mask=m,
                          src_bias=bias, tgt_bias=bias)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out_p = model_p.apply(params, x, f, src_frame_mask=m,
                              tgt_frame_mask=m, src_bias=bias,
                              tgt_bias=bias)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5)


def test_ff_impl_auto_resolution():
    import unittest.mock as mock

    import keypoints_interpolation_transformer_tpu.models.completer as mc
    from keypoints_interpolation_transformer_tpu.models.layers import (
        resolve_ff_impl)

    with mock.patch.object(mc, "_attention_platform", return_value="tpu"):
        assert resolve_ff_impl("auto") == "pallas"
        assert resolve_ff_impl("xla") == "xla"
    with mock.patch.object(mc, "_attention_platform", return_value="cpu"):
        assert resolve_ff_impl("auto") == "xla"
        assert resolve_ff_impl("pallas") == "pallas"


def test_fused_attention_high_precision_bf16x3(rng):
    """Under ambient "high" the kernel emulates bf16x3 with in-kernel
    hi/lo splits (Mosaic cannot lower Precision.HIGH); parity vs the f32
    oracle holds at bf16x3 tolerance, much tighter than single-pass
    bf16."""
    q, k, v = _qkv(rng)
    mask = jnp.asarray((rng.random((2, 32)) < 0.3).astype(np.float32))
    valid = jnp.ones((2, 32), jnp.float32)
    want = xla_attention(q, k, v, mask, valid, "repeat-inc", True)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("high"):
        got = fused_attention(q, k, v, mask, valid, "repeat-inc", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)


def _sublayer_args(rng, B=2, T=32, D=64, post_ln=False):
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    ws = [jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
          for _ in range(4)]
    bs = [jnp.asarray((rng.normal(size=(D,)) * 0.05).astype(np.float32))
          for _ in range(4)]
    if post_ln:
        ln = (jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(
                  np.float32)),
              jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32)))
    else:
        ln = (jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.float32))
    params = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3], *ln)
    mask = jnp.asarray((rng.random((B, T)) < 0.3).astype(np.float32))
    valid = jnp.asarray((np.arange(T)[None, :] <
                         np.array([[T], [T - 8]])).astype(np.float32))
    return x, mem, params, mask, valid


@pytest.mark.parametrize("self_attn,post_ln", [(True, False), (True, True),
                                               (False, False)])
def test_fused_attn_sublayer_matches_reference(rng, self_attn, post_ln):
    from keypoints_interpolation_transformer_tpu.ops.pallas.attn_sublayer \
        import attn_sublayer_reference, fused_attn_sublayer

    x, mem, params, mask, valid = _sublayer_args(rng, post_ln=post_ln)
    memory = None if self_attn else mem
    kind = "repeat-inc" if self_attn else "all"
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        got = fused_attn_sublayer(x, memory, params, (mask, valid), kind,
                                  self_attn, post_ln, 4)
    want = attn_sublayer_reference(x, memory, params, mask, valid, kind,
                                   self_attn, post_ln, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_attn_sublayer_grads_follow_reference(rng):
    from keypoints_interpolation_transformer_tpu.ops.pallas.attn_sublayer \
        import attn_sublayer_reference, fused_attn_sublayer

    x, _, params, mask, valid = _sublayer_args(rng)

    def loss_fused(x, params):
        with pltpu.force_tpu_interpret_mode():
            y = fused_attn_sublayer(x, None, params, (mask, valid),
                                    "repeat-inc", True, False, 4)
        return jnp.sum(y * y)

    def loss_ref(x, params):
        y = attn_sublayer_reference(x, None, params, mask, valid,
                                    "repeat-inc", True, False, 4)
        return jnp.sum(y * y)

    with jax.default_matmul_precision("highest"):
        gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
        wx, wp = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), rtol=2e-4,
                               atol=2e-4)
    for a, b in zip(gp, wp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)


def test_model_sublayer_fusion_matches_unfused(rng):
    """The full model with attn_sublayer_fusion on equals the per-op
    pallas path (both interpret mode, f32-highest)."""
    B, T = 2, 16
    kp = jnp.asarray(rng.normal(size=(B, T, 54, 2)).astype(np.float32))
    miss = jnp.asarray((rng.random((B, T)) < 0.3).astype(np.float32))

    def run(sub):
        # sub=True + ff_impl="pallas" exercises the MERGED whole-layer
        # kernel (ops/pallas/layer_fused.py) for the encoder layers
        model = KeypointCompleter(hidden_dim=32, num_layers=1, num_heads=4,
                                  attention_impl="pallas",
                                  ff_impl="pallas" if sub else "xla",
                                  attn_sublayer_fusion=sub)
        with pltpu.force_tpu_interpret_mode(), \
                jax.default_matmul_precision("highest"):
            params = model.init(jax.random.key(0), kp, kp)
            return model.apply(params, kp, kp, src_frame_mask=miss,
                               tgt_frame_mask=miss)

    np.testing.assert_allclose(np.asarray(run(True)),
                               np.asarray(run(False)), atol=2e-5)


@pytest.mark.parametrize("pre_ln", [False, True])
def test_ffn_pallas_backward_matches_reference_vjp(rng, pre_ln):
    """The native Pallas FFN backward (in-VMEM recompute + cross-cell dW
    accumulation) must match jax.vjp of the XLA reference to fp noise."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import ffn

    D, FF = 64, 128
    r = jnp.asarray(rng.normal(size=(2, 24, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 24, D)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(D, FF)) * 0.05).astype(np.float32))
    b1 = jnp.asarray((rng.normal(size=(FF,)) * 0.01).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(FF, D)) * 0.05).astype(np.float32))
    b2 = jnp.asarray((rng.normal(size=(D,)) * 0.01).astype(np.float32))
    ln = [jnp.asarray((1 + 0.1 * rng.normal(size=(D,))).astype(np.float32)),
          jnp.asarray((0.1 * rng.normal(size=(D,))).astype(np.float32)),
          jnp.asarray((1 + 0.1 * rng.normal(size=(D,))).astype(np.float32)),
          jnp.asarray((0.1 * rng.normal(size=(D,))).astype(np.float32))]

    _, vjp = jax.vjp(lambda *a: ffn.ffn_reference(*a, pre_ln=pre_ln),
                     r, w1, b1, w2, b2, *ln)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = ffn._ffn_bwd_pallas(r, g, w1, b1, w2, b2, *ln, pre_ln, "f32")
    for a, b in zip(got, want):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)


def test_ffn_int8_mode_close_to_float(rng):
    """Serving int8 FF kernel: int8 quantization noise only (bounded),
    same math otherwise."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import ffn

    D, FF = 128, 256
    r = jnp.asarray(rng.normal(size=(64, D)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(D, FF)) * 0.05).astype(np.float32))
    b1 = jnp.asarray((rng.normal(size=(FF,)) * 0.01).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(FF, D)) * 0.05).astype(np.float32))
    b2 = jnp.asarray((rng.normal(size=(D,)) * 0.01).astype(np.float32))
    one = jnp.ones((D,), jnp.float32)
    zero = jnp.zeros((D,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = ffn.fused_ffn(r, w1, b1, w2, b2, one, zero, one, zero,
                            True, True)
    want = ffn.ffn_reference(r, w1, b1, w2, b2, one, zero, one, zero, True)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 0.05, err


def test_fused_int8_dense_bit_exact_vs_xla(rng):
    """The fused quantize-matmul kernel computes the identical int8
    arithmetic as the XLA chain (measured bit-exact on hardware too)."""
    from keypoints_interpolation_transformer_tpu.eval.quantize import (
        _int8_dense_xla, _quantize_kernel)
    from keypoints_interpolation_transformer_tpu.ops.pallas.int8_matmul \
        import fused_int8_dense

    x = jnp.asarray(rng.normal(size=(40, 64)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(64, 128)) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(128,)) * 0.02).astype(np.float32))
    wq, ws = _quantize_kernel(w)
    with pltpu.force_tpu_interpret_mode():
        got = fused_int8_dense(x, wq, ws, b)
    want = _int8_dense_xla(x, wq, ws, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("with_ff", [False, True])
def test_fused_decoder_layer_matches_reference(rng, with_ff):
    """Merged decoder self+cross (+optional FF tail) kernel vs the XLA
    reference, forward and gradients."""
    from keypoints_interpolation_transformer_tpu.ops.pallas.layer_fused \
        import decoder_selfcross_reference, fused_decoder_selfcross

    B, T, H, dh, FF = 2, 32, 4, 16, 128
    D = H * dh
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    ws = [jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
          for _ in range(8)]
    bs = [jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32))
          for _ in range(8)]
    g1 = jnp.asarray((1 + 0.1 * rng.normal(size=(D,))).astype(np.float32))
    be1 = jnp.asarray((0.1 * rng.normal(size=(D,))).astype(np.float32))
    params = tuple(v for pair in zip(ws, bs) for v in pair) + (g1, be1)
    if with_ff:
        ff = (jnp.asarray((rng.normal(size=(D, FF)) * 0.05).astype(
                  np.float32)),
              jnp.asarray((rng.normal(size=(FF,)) * 0.01).astype(
                  np.float32)),
              jnp.asarray((rng.normal(size=(FF, D)) * 0.05).astype(
                  np.float32)),
              jnp.asarray((rng.normal(size=(D,)) * 0.01).astype(
                  np.float32)),
              jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32),
              jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))
    else:
        ff = None
    smask = jnp.asarray((rng.random((B, T)) < 0.3).astype(np.float32))
    cmask = jnp.zeros((B, T), jnp.float32)
    valid = jnp.ones((B, T), jnp.float32)
    masks = (smask, valid, cmask, valid)

    with jax.default_matmul_precision("highest"), \
            pltpu.force_tpu_interpret_mode():
        got = fused_decoder_selfcross(x, mem, params, masks, ff,
                                      "repeat-inc", True, "all", False, 4)
    want = decoder_selfcross_reference(x, mem, params, smask, valid,
                                       cmask, valid, "repeat-inc", True,
                                       "all", False, 4, ff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)

    def lf(x, mem, params):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_decoder_selfcross(
                x, mem, params, masks, ff, "repeat-inc", True, "all",
                False, 4) ** 2)

    def lr(x, mem, params):
        return jnp.sum(decoder_selfcross_reference(
            x, mem, params, smask, valid, cmask, valid, "repeat-inc",
            True, "all", False, 4, ff) ** 2)

    with jax.default_matmul_precision("highest"):
        gs = jax.grad(lf, argnums=(0, 1, 2))(x, mem, params)
        wsg = jax.grad(lr, argnums=(0, 1, 2))(x, mem, params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(wsg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


# ---- round-4 native residual-fed backwards --------------------------------


@pytest.mark.parametrize("pre_ln", [False, True])
def test_ffn_residual_forward_and_recompute_free_backward(rng, pre_ln):
    """Training FF forward saves u (pre-GELU) and z (pre-LN2); the
    backward fed those residuals matches the XLA reference VJP without
    any forward-recompute matmuls."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import ffn

    args = _ffn_operands(rng)
    r, g_ops = args[0], args[1:]
    g = jnp.asarray(rng.normal(size=r.shape).astype(np.float32))

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        y0 = ffn._ffn_fwd_pallas(r, *g_ops, pre_ln)
        y1, u, z = ffn._ffn_fwd_pallas(r, *g_ops, pre_ln,
                                       want_residuals=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    _, vjp = jax.vjp(lambda *a: ffn.ffn_reference(*a, pre_ln=pre_ln),
                     r, *g_ops)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = ffn._ffn_bwd_pallas(r, g, *g_ops, pre_ln, "f32", u, z)
    with jax.default_matmul_precision("highest"):
        got_xla = ffn._ffn_bwd_xla_from_residuals(r, g, *g_ops, pre_ln,
                                                  u, z)
    for a, ax, b in zip(got, got_xla, want):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ax) / s, np.asarray(b) / s,
                                   atol=1e-5)


@pytest.mark.parametrize("pre_ln", [False, True])
def test_ffn_split_backward_matches_reference_vjp(rng, pre_ln):
    """The two-kernel split backward (the bf16x3-flagship path: each
    kernel holds one weight + its dW accumulator stationary) matches the
    XLA reference VJP fed the same saved u/z residuals."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import ffn

    args = _ffn_operands(rng)
    r, g_ops = args[0], args[1:]
    g = jnp.asarray(rng.normal(size=r.shape).astype(np.float32))

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        _, u, z = ffn._ffn_fwd_pallas(r, *g_ops, pre_ln,
                                      want_residuals=True)

    _, vjp = jax.vjp(lambda *a: ffn.ffn_reference(*a, pre_ln=pre_ln),
                     r, *g_ops)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = ffn._ffn_bwd_pallas_split(r, g, *g_ops, pre_ln, "f32", u, z)
        # bf16x3 mode exercises the split-weight operands structurally
        got3 = ffn._ffn_bwd_pallas_split(r, g, *g_ops, pre_ln, "bf16x3",
                                         u, z)
    for a, a3, b in zip(got, got3, want):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a3) / s, np.asarray(b) / s,
                                   atol=5e-3)


@pytest.mark.parametrize("pre_ln", [False, True])
def test_ffn_split_backward_multicell_accumulation(rng, monkeypatch,
                                                   pre_ln):
    """Row block SMALLER than N (R=8, N=20 -> 3 grid cells + 4 padded
    rows): exercises the pl.when(program_id==0) zero-init, the
    cross-cell += accumulation of dW/db/dLN, and the padding branch of
    both the split and the monolith backwards (ADVICE r4: the N=24
    default gives grid=1, never accumulating)."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import ffn

    monkeypatch.setattr(ffn, "_BWD_ROW_BLOCK", 8)
    args = _ffn_operands(rng, N=20)
    r, g_ops = args[0], args[1:]
    g = jnp.asarray(rng.normal(size=r.shape).astype(np.float32))

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        _, u, z = ffn._ffn_fwd_pallas(r, *g_ops, pre_ln,
                                      want_residuals=True)
    _, vjp = jax.vjp(lambda *a: ffn.ffn_reference(*a, pre_ln=pre_ln),
                     r, *g_ops)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got_split = ffn._ffn_bwd_pallas_split(r, g, *g_ops, pre_ln, "f32",
                                              u, z)
        got_mono = ffn._ffn_bwd_pallas(r, g, *g_ops, pre_ln, "f32", u, z)
    for a, m, b in zip(got_split, got_mono, want):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(m) / s, np.asarray(b) / s,
                                   atol=1e-5)


def test_ffn_split_backward_vmem_budget_fallback(rng, monkeypatch):
    """Widths whose stationary bytes would overflow scoped VMEM must
    fall back to the residual-fed XLA backward (and still be correct)."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import ffn

    assert ffn._split_bwd_fits(256, 2048, 64, "bf16x3")      # flagship fits
    assert not ffn._split_bwd_fits(2048, 8192, 64, "bf16x3")  # overflow

    args = _ffn_operands(rng)
    r, g_ops = args[0], args[1:]
    g = jnp.asarray(rng.normal(size=r.shape).astype(np.float32))
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        _, u, z = ffn._ffn_fwd_pallas(r, *g_ops, False,
                                      want_residuals=True)
    # force the budget to reject: the split must route to the XLA path
    monkeypatch.setattr(ffn, "_split_bwd_fits", lambda *a, **k: False)
    calls = []
    orig = ffn._ffn_bwd_xla_from_residuals
    monkeypatch.setattr(
        ffn, "_ffn_bwd_xla_from_residuals",
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    _, vjp = jax.vjp(lambda *a: ffn.ffn_reference(*a, pre_ln=False),
                     r, *g_ops)
    want = vjp(g)
    with jax.default_matmul_precision("highest"):
        got = ffn._ffn_bwd_pallas_split(r, g, *g_ops, False, "f32", u, z)
    assert calls, "budget-rejected split did not fall back to XLA"
    for a, b in zip(got, want):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=1e-5)


@pytest.mark.parametrize("self_attn,post_ln", [(True, False), (True, True),
                                               (False, False)])
def test_attn_sublayer_native_backward_matches_reference(rng, self_attn,
                                                         post_ln):
    """The residual-fed native sublayer backward (q/k/v/a/probs saved by
    the training forward) matches jax.vjp of the XLA reference."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import \
        attn_sublayer as asl

    x, mem, params, mask, valid = _sublayer_args(rng, T=16, D=32,
                                                 post_ln=post_ln)
    memory = None if self_attn else mem
    kind = "repeat-inc" if self_attn else "all"
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        y0 = asl._fwd_pallas(x, memory, params, mask, valid, kind,
                             self_attn, post_ln, 4)
        y1, res = asl._fwd_pallas(x, memory, params, mask, valid, kind,
                                  self_attn, post_ln, 4,
                                  want_residuals=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-6)

    if memory is None:
        def ref(x_, params_):
            return asl.attn_sublayer_reference(x_, None, params_, mask,
                                               valid, kind, self_attn,
                                               post_ln, 4)
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(ref, x, params)
            want_dx, want_dp = vjp(g)
            want_dmem = None
    else:
        def ref(x_, m_, params_):
            return asl.attn_sublayer_reference(x_, m_, params_, mask,
                                               valid, kind, self_attn,
                                               post_ln, 4)
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(ref, x, memory, params)
            want_dx, want_dmem, want_dp = vjp(g)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        dx, dmem, dp = asl._bwd_pallas(x, memory, params, res, g,
                                       post_ln, 4)

    # normalize by the global gradient scale: dbk is mathematically
    # EXACTLY zero (the softmax gradient sums to zero over keys, so
    # sum_k dk = sum_q q * sum_k dl[k,q] = 0) — a per-tensor relative
    # comparison would divide float noise by ~1e-8
    gscale = max(float(jnp.max(jnp.abs(t)))
                 for t in [want_dx, *want_dp] if t.size) + 1e-9

    def close(a, b):
        np.testing.assert_allclose(np.asarray(a) / gscale,
                                   np.asarray(b) / gscale, atol=2e-5)

    close(dx, want_dx)
    if memory is not None:
        close(dmem, want_dmem)
    for a, b in zip(dp, want_dp):
        if a.size:
            close(a, b)


@pytest.mark.parametrize("self_attn,post_ln", [(True, False), (True, True),
                                               (False, False)])
def test_attn_sublayer_recompute_backward_matches_reference(rng, self_attn,
                                                            post_ln):
    """The long-T native backward (256 < T <= _MAX_T): the training
    forward omits the probs residual (save_probs=False) and the backward
    rebuilds each head's (T, T) probs tile from the saved q/k — gradients
    still match jax.vjp of the XLA reference."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import \
        attn_sublayer as asl

    x, mem, params, mask, valid = _sublayer_args(rng, T=16, D=32,
                                                 post_ln=post_ln)
    memory = None if self_attn else mem
    kind = "repeat-inc" if self_attn else "all"
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        y0 = asl._fwd_pallas(x, memory, params, mask, valid, kind,
                             self_attn, post_ln, 4)
        y1, res = asl._fwd_pallas(x, memory, params, mask, valid, kind,
                                  self_attn, post_ln, 4,
                                  want_residuals=True, save_probs=False)
    assert res[4] is None  # no probs residual saved
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-6)

    if memory is None:
        def ref(x_, params_):
            return asl.attn_sublayer_reference(x_, None, params_, mask,
                                               valid, kind, self_attn,
                                               post_ln, 4)
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(ref, x, params)
            want_dx, want_dp = vjp(g)
            want_dmem = None
    else:
        def ref(x_, m_, params_):
            return asl.attn_sublayer_reference(x_, m_, params_, mask,
                                               valid, kind, self_attn,
                                               post_ln, 4)
        with jax.default_matmul_precision("highest"):
            _, vjp = jax.vjp(ref, x, memory, params)
            want_dx, want_dmem, want_dp = vjp(g)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        dx, dmem, dp = asl._bwd_pallas(x, memory, params, res, g,
                                       post_ln, 4, mask=mask, valid=valid,
                                       kind=kind, add_keypad=self_attn)

    gscale = max(float(jnp.max(jnp.abs(t)))
                 for t in [want_dx, *want_dp] if t.size) + 1e-9

    def close(a, b):
        np.testing.assert_allclose(np.asarray(a) / gscale,
                                   np.asarray(b) / gscale, atol=2e-5)

    close(dx, want_dx)
    if memory is not None:
        close(dmem, want_dmem)
    for a, b in zip(dp, want_dp):
        if a.size:
            close(a, b)


def test_sub_bwd_mode_shape_routing():
    """Mode routing: probs residual to T<=256 (8 heads), recompute to
    256<T<=512, XLA beyond — on-TPU gate aside (forced via env default)."""
    from keypoints_interpolation_transformer_tpu.ops.pallas import \
        attn_sublayer as asl

    # platform gate: only check the shape arithmetic (pretend TPU)
    import keypoints_interpolation_transformer_tpu.models.completer as mc
    orig = mc._attention_platform
    mc._attention_platform = lambda: "tpu"
    try:
        with jax.default_matmul_precision("high"):
            assert asl._sub_bwd_mode(jnp.float32, 128, 8) == "residual"
            assert asl._sub_bwd_mode(jnp.float32, 256, 8) == "residual"
            assert asl._sub_bwd_mode(jnp.float32, 384, 8) == "recompute"
            # T=512: the three shapes training actually builds (encoder
            # self pre-LN, decoder self post-LN, decoder cross pre-LN)
            # all fit the chip-calibrated VMEM model and take the native
            # recompute backward...
            for self_attn, post_ln in ((True, False), (True, True),
                                       (False, False)):
                assert asl._sub_bwd_mode(
                    jnp.float32, 512, 8, self_attn=self_attn,
                    post_ln=post_ln) == "recompute"
            # ...while the worst-case row count (cross + post-LN, which
            # no trainer builds) models over the 16 MB scoped limit and
            # falls back instead of OOMing at compile time
            assert asl._sub_bwd_mode(jnp.float32, 512, 8,
                                     self_attn=False, post_ln=True) is None
            assert asl._sub_bwd_mode(jnp.float32, 1024, 8) is None
        with jax.default_matmul_precision("highest"):
            assert asl._sub_bwd_mode(jnp.float32, 128, 8) is None
    finally:
        mc._attention_platform = orig


@pytest.mark.parametrize("pe_residual", [False, True])
def test_fused_pre_stream_embed_matches_reference(rng, pe_residual):
    """The embed-folded pre-stream kernel (108 lane-padded to 128) equals
    the XLA reference, and the want_emb output equals the plain Dense."""
    from keypoints_interpolation_transformer_tpu.ops.pallas.pointwise \
        import fused_pre_stream_embed, pre_stream_embed_reference

    B, T, F, D = 2, 16, 108, 128
    x = jnp.asarray(rng.normal(size=(B, T, F)).astype(np.float32))
    wemb = jnp.asarray((rng.normal(size=(F, D)) * 0.1).astype(np.float32))
    bemb = jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
    sw = [jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
          if i % 2 == 0 else
          jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32))
          for i in range(6)]
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        got_s, got_e = fused_pre_stream_embed(x, wemb, bemb, pe, *sw,
                                              pe_residual, True)
        got_only = fused_pre_stream_embed(x, wemb, bemb, pe, *sw,
                                          pe_residual, False)
    want_s, want_e = pre_stream_embed_reference(x, wemb, bemb, pe, *sw,
                                                pe_residual, True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_only), np.asarray(want_s),
                               atol=2e-5)

    # gradients follow the XLA reference via custom_vjp
    def lf(x, wemb):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_pre_stream_embed(
                x, wemb, bemb, pe, *sw, pe_residual, False) ** 2)

    def lr(x, wemb):
        return jnp.sum(pre_stream_embed_reference(
            x, wemb, bemb, pe, *sw, pe_residual, False) ** 2)

    with jax.default_matmul_precision("highest"):
        ga = jax.grad(lf, argnums=(0, 1))(x, wemb)
        gb = jax.grad(lr, argnums=(0, 1))(x, wemb)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_merged_kernels_attn_int8_close_to_float(rng):
    """attn_int8 serving mode (q/k/v/out projections int8-on-MXU inside
    the merged encoder/decoder kernels) stays within int8 quantization
    noise of the float reference."""
    from keypoints_interpolation_transformer_tpu.ops.pallas.layer_fused \
        import (decoder_selfcross_reference, encoder_layer_reference,
                fused_decoder_selfcross, fused_encoder_layer)

    B, T, H, dh, FF = 2, 16, 4, 8, 64
    D = H * dh
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, T)) < 0.3).astype(np.float32))
    valid = jnp.ones((B, T), jnp.float32)

    ws = [jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
          for _ in range(4)]
    bs = [jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32))
          for _ in range(4)]
    w1 = jnp.asarray((rng.normal(size=(D, FF)) * 0.05).astype(np.float32))
    b1 = jnp.asarray((rng.normal(size=(FF,)) * 0.01).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(FF, D)) * 0.05).astype(np.float32))
    b2 = jnp.asarray((rng.normal(size=(D,)) * 0.01).astype(np.float32))
    ones, zeros = jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32)
    enc_params = (ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
                  w1, b1, w2, b2, ones, zeros, ones, zeros)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        got = fused_encoder_layer(x, enc_params, (mask, valid),
                                  "repeat-inc", True, H, True, True)
    want = encoder_layer_reference(x, enc_params, mask, valid,
                                   "repeat-inc", True, H)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 0.1, err            # int8 quantization noise only
    assert err > 1e-7                # and it IS the int8 path

    ws8 = [jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
           for _ in range(8)]
    bs8 = [jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32))
           for _ in range(8)]
    dec_params = tuple(v for pair in zip(ws8, bs8) for v in pair) + \
        (ones, zeros)
    masks = (mask, valid, jnp.zeros_like(mask), valid)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        got = fused_decoder_selfcross(x, mem, dec_params, masks, None,
                                      "repeat-inc", True, "all", False,
                                      H, True)
    want = decoder_selfcross_reference(x, mem, dec_params, mask, valid,
                                       jnp.zeros_like(mask), valid,
                                       "repeat-inc", True, "all", False, H)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 0.1, err
    assert err > 1e-7


def test_model_pointwise_embed_fold_matches_xla(rng):
    """Full model with pointwise_impl='pallas' (which folds the embedding
    Dense into the pre-stream kernel at D%128==0) equals the XLA chain;
    the param tree is unchanged (checkpoint compat)."""
    B, T = 1, 16
    x = jnp.asarray(rng.uniform(size=(B, T, 54, 2)).astype(np.float32))
    m = jnp.asarray((rng.random((B, T)) < 0.4).astype(np.float32))

    kw = dict(hidden_dim=128, num_layers=1, num_heads=4, ff_dim=128,
              attention_impl="pallas")
    model_x = KeypointCompleter(**kw, pointwise_impl="xla")
    model_p = KeypointCompleter(**kw, pointwise_impl="pallas")
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        params = model_p.init(jax.random.key(0), x, x)
        out_p = model_p.apply(params, x, x, src_frame_mask=m,
                              tgt_frame_mask=m)
        out_x = model_x.apply(params, x, x, src_frame_mask=m,
                              tgt_frame_mask=m)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=5e-5)
