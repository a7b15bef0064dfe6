"""Train state and optimizer.

Adam with torch defaults (betas 0.9/0.999, eps 1e-8 — the reference's
``Adam(model.parameters(), lr)``, A1_train.py:256) built from
``optax.scale_by_adam`` so the learning rate can be injected per step: the
reference rewrites param-group LRs per epoch (A1_train.py:42-54,287), which
maps to passing ``lr`` into the jitted step.

Freezing (the A4 embedding graft, A4_train_with_pretrained.py:249-254) is a
gradient mask: frozen leaves get zero gradients, so their Adam moments stay
zero and the parameters never move — equivalent to requires_grad=False.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params):
        return cls(params=params, opt_state=ADAM.init(params),
                   step=jnp.zeros((), jnp.int32))


ADAM = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def apply_gradients(state: TrainState, grads, lr,
                    freeze_mask=None) -> TrainState:
    """One Adam step at learning rate ``lr`` (traced scalar ok)."""
    if freeze_mask is not None:
        grads = jax.tree.map(
            lambda g, frozen: jnp.where(frozen, 0.0, g), grads, freeze_mask)
    updates, opt_state = ADAM.update(grads, state.opt_state, state.params)
    params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
    return state.replace(params=params, opt_state=opt_state,
                         step=state.step + 1)


def linear_decay_lrs(lr: float, epochs: int):
    """The A1/A4 per-epoch schedule: linspace(lr, lr/5, epochs)
    (A1_train.py:269-271)."""
    import numpy as np

    return np.linspace(lr, lr / 5.0, num=epochs)


def step_drop_lrs(lr: float, epochs: int, drop_epoch: int = 80,
                  factor: float = 10.0):
    """The A3 schedule: constant, /factor from drop_epoch + 1 on
    (A3_train_embedding.py:261-263 — the drop applies AFTER epoch 80)."""
    import numpy as np

    out = np.full(epochs, lr, dtype=np.float64)
    if drop_epoch + 1 < epochs:
        out[drop_epoch + 1:] = lr / factor
    return out


def freeze_mask_for_graft(params) -> Any:
    """True for leaves of input_embedding / filled_embedding / fc_final —
    the modules the A4 graft freezes (A4_train_with_pretrained.py:249-254)."""
    frozen_roots = ("input_embedding", "filled_embedding", "fc_final")

    def mark(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        return jnp.asarray(names[0] in frozen_roots)

    return jax.tree_util.tree_map_with_path(mark, params)
