"""Jitted train/eval steps for the four regimes.

ONE train loop covers the reference's four trainers; each regime is a
forward/criterion recipe:

  a1  plain supervised (A1_train.py:84-137): src = SOS+frames[:-1],
      tgt = frames shifted by one, "repeat-inc" attention biases, MSE train
      criterion, EuclideanLoss + masked composite at eval.
  a2  cycle (A2_train_cycle.py:78-128): frozen first model produces the
      filled stream for a trainable Cycle model run with zero ("all")
      attention biases and all-ones pad masks.
  a3  embedding autoencoder (A3_train_embedding.py:75-105): zero missing
      frames with p=0.95, identity reconstruction, EuclideanLoss both ways.
  a4  fine-tune (A4_train_with_pretrained.py:83-187): masked input frames
      zeroed, EuclideanLoss train / EuclideanDistanceLoss eval, optional
      embedding graft + freeze.

Training corruption/augmentation run HERE, fused on device inside the step
(vmapped over the batch) — the reference does them per video in Python
inside Dataset.__getitem__ (dataloader.py:623-686).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.completer import Embedding, KeypointCompleter, \
    keypoint_completer_cycle
from ..ops import losses
from ..ops.masks import attention_bias
from ..transforms.augment import random_augment
from ..transforms.corruption import add_sos, put_missing_frames, \
    zero_missing_frames
from .state import apply_gradients


def build_model(model_cfg, variant: Optional[str] = None, *,
                for_training: bool = False):
    """Construct the configured model.

    ``for_training`` resolves the "auto" fusion knobs for the grad path
    (measured, RESULTS.md round 4): the per-SUBLAYER kernels (attention
    sublayer + FF sublayer) with their native residual-fed Pallas
    backwards at bf16/bf16x3, instead of the merged whole-layer kernels
    (whose backward is an XLA recompute — a measured net loss under
    grad); XLA pointwise; and XLA everything at "highest" (exact XLA
    gradient numerics for parity work).  Explicit "on"/"pallas"/"off"
    settings still win.
    """
    v = variant or model_cfg.variant
    dtype = jnp.dtype(model_cfg.compute_dtype)
    impl = getattr(model_cfg, "attention_impl", "xla")
    ff_impl = getattr(model_cfg, "ff_impl", "xla")
    pw_impl = getattr(model_cfg, "pointwise_impl", "auto")
    sub = getattr(model_cfg, "attn_sublayer_fusion", "auto")
    scan = getattr(model_cfg, "scan_layers", False)
    remat = getattr(model_cfg, "remat", False)
    sp = getattr(model_cfg, "sequence_parallel", False)
    merge = True
    if for_training:
        from ..models.completer import _attention_platform
        on_tpu = _attention_platform() == "tpu"
        prec = getattr(model_cfg, "matmul_precision", "highest")
        fast = prec in ("default", "bfloat16", "fastest", "high",
                        "tensorfloat32", "bfloat16_3x")
        if ff_impl == "auto":
            # fused FF + its native recompute-free backward (the training
            # forward saves the u/z residuals) wins at bf16 AND bf16x3;
            # "highest" keeps XLA gradient numerics for parity work.
            # Platform-gated: pallas kernels only lower on TPU.
            ff_impl = "pallas" if (fast and on_tpu) else "xla"
        pw_impl = "xla" if pw_impl == "auto" else pw_impl
        # sublayer fusion now has a native residual-fed backward at
        # bf16/bf16x3 (ops/pallas/attn_sublayer._bwd_pallas) — default it
        # ON for fast precisions; the merged whole-layer kernels stay off
        # under grad (their backward is an XLA recompute, measured net
        # loss).  "highest" falls back to per-op kernels + XLA VJPs.
        sub_flag = sub == "on" or (sub != "off" and fast and on_tpu)
        merge = False
    else:
        sub_flag = sub != "off"
    fused_kw = dict(attn_sublayer_fusion=sub_flag, pointwise_impl=pw_impl,
                    merge_layers=merge)
    if v == "plain":
        return KeypointCompleter(
            hidden_dim=model_cfg.hidden_dim, num_layers=model_cfg.num_layers,
            num_heads=model_cfg.num_heads, input_size=model_cfg.input_size,
            ff_dim=model_cfg.ff_dim, dtype=dtype, attention_impl=impl,
            ff_impl=ff_impl, scan_layers=scan, remat=remat,
            sequence_parallel=sp, **fused_kw)
    if v == "cycle":
        return keypoint_completer_cycle(
            model_cfg.hidden_dim, model_cfg.num_layers, model_cfg.num_heads,
            input_size=model_cfg.input_size, ff_dim=model_cfg.ff_dim,
            dtype=dtype, attention_impl=impl, ff_impl=ff_impl,
            scan_layers=scan, remat=remat, sequence_parallel=sp, **fused_kw)
    if v == "embedding":
        return Embedding(hidden_dim=model_cfg.hidden_dim,
                         input_size=model_cfg.input_size, dtype=dtype)
    raise ValueError(f"unknown model variant {v!r}")


# ---------------------------------------------------------------------------
# fused on-device preprocessing
# ---------------------------------------------------------------------------

def corrupt_batch(key, clean, length, *, augment: bool, aug_prob: float,
                  is_random_missing: bool, dataset_name: str, stats,
                  double_hand_rotation: bool = True):
    """augment -> put_missing_frames -> add_sos, vmapped over the batch.

    Returns (y, inputs, mask): y is the (possibly augmented) clean target —
    the reference's augmentation mutates the stored video in place, so the
    target IS the augmented video (dataloader.py:649-663,674).
    """
    B = clean.shape[0]
    k_aug, k_cor = jax.random.split(key)
    y = clean
    if augment:
        y = jax.vmap(lambda k, v: random_augment(
            k, v, aug_prob, double_hand_rotation=double_hand_rotation))(
                jax.random.split(k_aug, B), clean)
    corrupted, miss = jax.vmap(
        lambda k, v, t: put_missing_frames(
            k, v, is_random_missing=is_random_missing,
            dataset_name=dataset_name, stats=stats, t_actual=t))(
                jax.random.split(k_cor, B), y, length)
    inputs, mask = add_sos(corrupted, miss)
    return y, inputs, mask


def shift_streams(inputs, mask, length):
    """The reference src/tgt shift (A1_train.py:93-100) on padded batches.

    x = inputs[:, :-1] (SOS + frames), x_no_sota = inputs[:, 1:] (frames);
    valid[p] = p < length marks the positions that exist unpadded.
    """
    T = inputs.shape[1] - 1
    x, x_no = inputs[:, :-1], inputs[:, 1:]
    x_mask, y_mask = mask[:, :-1], mask[:, 1:]
    valid = (jnp.arange(T)[None, :] < length[:, None]).astype(jnp.float32)
    return x, x_no, x_mask, y_mask, valid


def _weighted_mean(per_video, weight):
    return jnp.sum(per_video * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def make_train_criterion(regime: str, fused: bool):
    """Per-video train criterion (pred, target, valid) -> (B,).

    a1/a2 use torch.nn.MSELoss semantics (A1_train.py:254, == euclidean/2);
    a3/a4 use EuclideanLoss (A3:180, A4:259).  ``fused`` routes through the
    pallas fused masked-loss kernel (ops/pallas/masked_loss.py; TPU or
    interpret mode only)."""
    if fused:
        from ..ops.pallas.masked_loss import fused_euclidean_loss
        if regime in ("a1", "a2"):
            return lambda p, y, v: 0.5 * fused_euclidean_loss(p, y, v)
        return fused_euclidean_loss
    if regime in ("a1", "a2"):
        return lambda p, y, v: losses.mse_loss(p, y, frame_weight=v)
    return lambda p, y, v: losses.euclidean_loss(p, y, frame_weight=v)


# ---------------------------------------------------------------------------
# regime forwards
# ---------------------------------------------------------------------------

def completer_forward(model, params, x, x_no, x_mask, y_mask, valid,
                      mask_kind: str = "repeat-inc"):
    from ..models.completer import resolve_attention_impl

    T = x.shape[1]
    impl = resolve_attention_impl(model.attention_impl, T,
                                  model.auto_pallas_min_len)
    src_bias = tgt_bias = None
    if impl != "pallas":  # pallas builds biases in-kernel
        src_bias = attention_bias(mask_kind, x_mask, T)
        tgt_bias = attention_bias(mask_kind, y_mask, T)
    return model.apply({"params": params}, x, x_no,
                       src_frame_mask=x_mask, tgt_frame_mask=y_mask,
                       src_bias=src_bias, tgt_bias=tgt_bias,
                       valid_mask=valid,
                       src_mask_kind=mask_kind, tgt_mask_kind=mask_kind)


def cycle_forward(first_model, first_params, model, params,
                  x, x_no, x_mask, y_mask, valid):
    """A2: frozen first model feeds the Cycle model
    (A2_train_cycle.py:99-115)."""
    pred1 = completer_forward(first_model, first_params, x, x_no,
                              x_mask, y_mask, valid, "repeat-inc")
    # the first model is FROZEN (A2 optimizes the cycle model only,
    # A2_train_cycle.py:241): cutting the gradient here lets XLA drop the
    # first model's entire backward (incl. residual saving) — the cycle
    # model's parameter grads are computed at fixed inputs either way
    pred1 = jax.lax.stop_gradient(pred1)
    ones = jnp.ones_like(x_mask)
    # "all" masks are zeros -> no attention bias; pad masks are all ones,
    # a uniform +1 on the logits (softmax no-op) reproduced for fidelity
    return model.apply({"params": params}, x_no, pred1,
                       src_frame_mask=ones, tgt_frame_mask=ones,
                       valid_mask=valid,
                       src_mask_kind="all", tgt_mask_kind="all")


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------

def _build_train_step(model, cfg, stats, first_model=None,
                      freeze_mask=None) -> Callable:
    """The (unjitted) train-step body for cfg.train.regime.

    Signature: step(state, clean, length, weight, key, lr,
                    [first_params]) -> (state, metrics)
    """
    regime = cfg.train.regime
    d = cfg.data
    criterion = make_train_criterion(regime,
                                     getattr(cfg.train, "fused_loss", False))
    watch = getattr(cfg.train, "watch_norms", False)

    def _global_norm(tree):
        return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                            for x in jax.tree.leaves(tree)))

    def finish(state, grads, lr, loss, per_video, freeze=None):
        """Shared optimizer step + metrics assembly.  grad/param global
        norms are the local analog of wandb.watch(model)
        (A1_train.py:251)."""
        metrics = {"loss": loss, "per_video": per_video}
        if watch:
            metrics["grad_norm"] = _global_norm(grads)
        state = apply_gradients(state, grads, lr, freeze)
        if watch:
            metrics["param_norm"] = _global_norm(state.params)
        return state, metrics

    def preprocess(key, clean, length):
        return corrupt_batch(
            key, clean, length, augment=d.have_augmentation,
            aug_prob=d.augmentations_prob,
            is_random_missing=d.is_random_missing,
            dataset_name=d.dataset_name if stats is not None else "all",
            stats=stats, double_hand_rotation=d.double_hand_rotation)

    def common(key, clean, length):
        y, inputs, mask = preprocess(key, clean, length)
        x, x_no, x_mask, y_mask, valid = shift_streams(inputs, mask, length)
        return y, x, x_no, x_mask, y_mask, valid

    if regime == "a1":
        def loss_fn(params, key, clean, length, weight):
            y, x, x_no, x_mask, y_mask, valid = common(key, clean, length)
            pred = completer_forward(model, params, x, x_no, x_mask, y_mask,
                                     valid)
            per_video = criterion(pred, y, valid)
            return _weighted_mean(per_video, weight), per_video

        def step(state, clean, length, weight, key, lr):
            (loss, per_video), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, key, clean, length,
                                       weight)
            return finish(state, grads, lr, loss, per_video)

    elif regime == "a2":
        def loss_fn(params, first_params, key, clean, length, weight):
            y, x, x_no, x_mask, y_mask, valid = common(key, clean, length)
            pred = cycle_forward(first_model, first_params, model, params,
                                 x, x_no, x_mask, y_mask, valid)
            per_video = criterion(pred, y, valid)
            return _weighted_mean(per_video, weight), per_video

        def step(state, clean, length, weight, key, lr, first_params):
            (loss, per_video), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, first_params, key,
                                       clean, length, weight)
            return finish(state, grads, lr, loss, per_video)

    elif regime == "a3":
        def loss_fn(params, key, clean, length, weight):
            k_pre, k_zero = jax.random.split(key)
            _, inputs, mask = preprocess(k_pre, clean, length)
            x, _, x_mask, _, valid = shift_streams(inputs, mask, length)
            # zero missing frames with p = 0.95 per video (A3:87-92)
            zero_gate = jax.random.uniform(k_zero, (x.shape[0],)) >= 0.05
            zeroed = zero_missing_frames(x, x_mask)
            x = jnp.where(zero_gate[:, None, None, None], zeroed, x)
            y = x
            pred = model.apply({"params": params}, x)
            per_video = criterion(pred, y, valid)
            return _weighted_mean(per_video, weight), per_video

        def step(state, clean, length, weight, key, lr):
            (loss, per_video), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, key, clean, length,
                                       weight)
            return finish(state, grads, lr, loss, per_video)

    elif regime == "a4":
        def loss_fn(params, key, clean, length, weight):
            y, x, x_no, x_mask, y_mask, valid = common(key, clean, length)
            x = zero_missing_frames(x, x_mask)  # A4:107-108
            pred = completer_forward(model, params, x, x_no, x_mask, y_mask,
                                     valid)
            per_video = criterion(pred, y, valid)
            return _weighted_mean(per_video, weight), per_video

        def step(state, clean, length, weight, key, lr):
            (loss, per_video), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, key, clean, length,
                                       weight)
            return finish(state, grads, lr, loss, per_video, freeze_mask)

    else:
        raise ValueError(f"unknown regime {regime!r}")

    return step


def make_train_step(model, cfg, stats, first_model=None,
                    freeze_mask=None) -> Callable:
    """Jitted per-batch train step (see _build_train_step)."""
    step = _build_train_step(model, cfg, stats, first_model, freeze_mask)
    return jax.jit(step, donate_argnums=(0,))


def make_chained_train_step(model, cfg, stats, first_model=None,
                            freeze_mask=None) -> Callable:
    """Device-side epoch chaining: ONE dispatch runs a whole bucket's
    batches as a ``lax.scan`` over the per-batch train step, with the
    train state as the carry and each batch gathered from the
    device-resident bucket inside the scan.

    Measured motivation (RESULTS.md round 4): one jitted call passing the
    ~350-leaf train state costs ~15-20 ms of HOST dispatch through the
    tunnel — comparable to the device work itself at flagship B=64.
    Chaining pays it once per bucket per epoch instead of once per batch.

    The RNG stream is IDENTICAL to the per-step path: the scan carries
    the epoch key and splits it per batch exactly as the loop does
    (``k_epoch, k_step = split(k_epoch)``), so chained and per-step runs
    (e.g. the DP-equivalence and resume tests) produce the same draws.

    Signature: chained(state, bucket_clean, bucket_length,
                       rows (n, B) int32, weights (n, B) f32, key, lr,
                       [first_params]) -> (state, key, stacked_metrics)
    """
    step = _build_train_step(model, cfg, stats, first_model, freeze_mask)

    def chained(state, bucket_clean, bucket_length, rows, weights, key,
                lr, *extra):
        def body(carry, xs):
            st, k = carry
            r, w = xs
            clean = jnp.take(bucket_clean, r, axis=0)
            length = jnp.take(bucket_length, r, axis=0)
            k, k_step = jax.random.split(k)
            st, m = step(st, clean, length, w, k_step, lr, *extra)
            return (st, k), m

        (state, key), ms = jax.lax.scan(body, (state, key),
                                        (rows, weights))
        return state, key, ms

    return jax.jit(chained, donate_argnums=(0,))


def make_predict_fn(model, cfg, first_model=None) -> Callable:
    """Composited predictions on a precorrupted batch — used for the
    reference's new-best validation imagery (A1_train.py:209-215,305-309)."""
    regime = cfg.train.regime

    def predict(params, inputs, mask, clean, length, first_params=None):
        x, x_no, x_mask, y_mask, valid = shift_streams(inputs, mask, length)
        if regime == "a3":
            x = zero_missing_frames(x, x_mask)
            return model.apply({"params": params}, x), x
        if regime == "a2":
            pred = cycle_forward(first_model, first_params, model, params,
                                 x, x_no, x_mask, y_mask, valid)
        else:
            if regime == "a4":
                x = zero_missing_frames(x, x_mask)
            pred = completer_forward(model, params, x, x_no, x_mask,
                                     y_mask, valid)
        comp = losses.composite_prediction(pred, clean, y_mask)
        # reference shows inputs with missing frames blanked (A1:210)
        shown = x * (1.0 - x_mask)[..., None, None]
        return comp, shown

    return jax.jit(predict)


def make_eval_step(model, cfg, first_model=None) -> Callable:
    """Eval on precorrupted batches (validation corruption is precomputed,
    mirroring dataloader.py:604-621).

    Signature: eval_step(params, inputs, mask, clean, length,
                         [first_params]) -> per-video losses (B,)
    plus the freeze-frame baseline per-video losses for epoch-0 reporting.
    """
    regime = cfg.train.regime

    def criterion(pred, y, valid):
        if regime == "a4":
            return losses.euclidean_distance_loss(pred, y, frame_weight=valid)
        return losses.euclidean_loss(pred, y, frame_weight=valid)

    if regime == "a3":
        def eval_step(params, inputs, mask, clean, length):
            x, _, x_mask, _, valid = shift_streams(inputs, mask, length)
            x = zero_missing_frames(x, x_mask)  # always zeroed at eval
            y = x
            pred = model.apply({"params": params}, x)
            per_video = losses.euclidean_loss(pred, y, frame_weight=valid)
            baseline = losses.euclidean_loss(x, y, frame_weight=valid)
            return per_video, baseline
    else:
        def eval_step(params, inputs, mask, clean, length, first_params=None):
            x, x_no, x_mask, y_mask, valid = shift_streams(
                inputs, mask, length)
            y = clean
            if regime == "a2":
                pred = cycle_forward(first_model, first_params, model,
                                     params, x, x_no, x_mask, y_mask, valid)
            else:
                if regime == "a4":
                    x = zero_missing_frames(x, x_mask)
                pred = completer_forward(model, params, x, x_no, x_mask,
                                         y_mask, valid)
            pred = losses.composite_prediction(pred, y, y_mask)
            per_video = criterion(pred, y, valid)
            baseline = criterion(x_no, y, valid)  # freeze-frame baseline
            return per_video, baseline

    return jax.jit(eval_step)
