"""Checkpointing: Orbax for native state, plus a converter for the
reference's torch ``.pth`` schema.

The reference saves ``{model_state_dict, optimizer_state_dict, input_size,
hidden_dim, num_layers, num_heads, loss}`` on every new-best validation loss
(A1_train.py:313-321).  ``load_reference_checkpoint`` maps that state dict
onto our Flax parameter tree so a reference-trained model can be served /
fine-tuned here and checked for 1e-4 MPJPE parity.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear (out, in) weight -> flax Dense (in, out) kernel."""
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _layer_norm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _swiglu(sd, prefix):
    return {f"fc{i}": _linear(sd, f"{prefix}.fc{i}") for i in (1, 2, 3)}


def _attention(sd, prefix):
    """torch MultiheadAttention packed in_proj -> separate q/k/v Dense."""
    w = _t(sd[f"{prefix}.in_proj_weight"])  # (3D, D)
    b = _t(sd[f"{prefix}.in_proj_bias"])    # (3D,)
    d = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {"kernel": w[i * d:(i + 1) * d].T,
                     "bias": b[i * d:(i + 1) * d]}
    out["out_proj"] = _linear(sd, f"{prefix}.out_proj")
    return out


def completer_params_from_torch(sd: Mapping[str, Any],
                                num_layers: int) -> Dict[str, Any]:
    """Map a reference KeypointCompleter/-Cycle state dict (model.py:60-321)
    onto the Flax KeypointCompleter parameter tree."""
    core: Dict[str, Any] = {}
    for i in range(num_layers):
        enc = f"transformer.encoder.layers.{i}"
        core[f"encoder_{i}"] = {
            "self_attn": _attention(sd, f"{enc}.self_attn"),
            "ff": {"linear1": _linear(sd, f"{enc}.linear1"),
                   "linear2": _linear(sd, f"{enc}.linear2")},
            "norm1": _layer_norm(sd, f"{enc}.norm1"),
            "norm2": _layer_norm(sd, f"{enc}.norm2"),
        }
        dec = f"transformer.decoder.layers.{i}"
        core[f"decoder_{i}"] = {
            "self_attn": _attention(sd, f"{dec}.self_attn"),
            "cross_attn": _attention(sd, f"{dec}.multihead_attn"),
            "ff": {"linear1": _linear(sd, f"{dec}.linear1"),
                   "linear2": _linear(sd, f"{dec}.linear2")},
            "norm1": _layer_norm(sd, f"{dec}.norm1"),
            "norm2": _layer_norm(sd, f"{dec}.norm2"),
            "norm3": _layer_norm(sd, f"{dec}.norm3"),
        }
    core["encoder_norm"] = _layer_norm(sd, "transformer.encoder.norm")
    core["decoder_norm"] = _layer_norm(sd, "transformer.decoder.norm")

    return {
        "input_embedding": _linear(sd, "input_embedding"),
        "filled_embedding": _linear(sd, "filled_embedding"),
        "learned_input_pos": _t(sd["learned_input_positional_encoder"]),
        "learned_filled_pos": _t(sd["learned_filled_positional_encoder"]),
        "swiglu_input_prev": _swiglu(sd, "swiGlu_input_prev"),
        "swiglu_filled_prev": _swiglu(sd, "swiGlu_filled_prev"),
        "swiglu_decoded": _swiglu(sd, "swiGlu_decoded"),
        "transformer": core,
        "fc_final": _linear(sd, "fc_final"),
    }


def stack_layer_params(params: Mapping) -> Dict[str, Any]:
    """Convert an unrolled parameter tree (transformer/encoder_{i}/...) to
    the scan_layers layout (transformer/encoder_scan/layer/... with a
    stacked leading axis).  Numerics are identical."""
    core = params["transformer"]
    n = 1 + max(int(k.split("_")[1]) for k in core
                if k.startswith("encoder_") and k.split("_")[1].isdigit())

    def stack(side):
        trees = [core[f"{side}_{i}"] for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    new_core = {k: v for k, v in core.items()
                if not (k.startswith("encoder_") or k.startswith("decoder_"))
                or not k.split("_")[1].isdigit()}
    new_core["encoder_scan"] = {"layer": stack("encoder")}
    new_core["decoder_scan"] = {"layer": stack("decoder")}
    out = dict(params)
    out["transformer"] = new_core
    return out


def unstack_layer_params(params: Mapping) -> Dict[str, Any]:
    """Inverse of stack_layer_params."""
    core = params["transformer"]
    new_core = {k: v for k, v in core.items()
                if k not in ("encoder_scan", "decoder_scan")}
    for side in ("encoder", "decoder"):
        stacked = core[f"{side}_scan"]["layer"]
        n = jax.tree.leaves(stacked)[0].shape[0]
        for i in range(n):
            new_core[f"{side}_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    out = dict(params)
    out["transformer"] = new_core
    return out


def embedding_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Map the reference Embedding autoencoder (model.py:324-340)."""
    return {"input_embedding": _linear(sd, "input_embedding"),
            "output_embedding": _linear(sd, "output_embedding")}


def load_reference_checkpoint(path: str):
    """Load a reference ``.pth`` checkpoint; returns (params, hyperparams).

    Requires torch (CPU) only at call time.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    hyper = {k: ckpt[k] for k in
             ("input_size", "hidden_dim", "num_layers", "num_heads")
             if k in ckpt}
    if any(k.startswith("transformer.") for k in sd):
        params = completer_params_from_torch(sd, int(hyper["num_layers"]))
    else:
        params = embedding_params_from_torch(sd)
    params = jax.tree.map(jnp.asarray, params)
    return params, hyper


def _to_torch_linear(out: Dict, prefix: str, leaf: Mapping) -> None:
    out[f"{prefix}.weight"] = np.asarray(leaf["kernel"]).T.copy()
    out[f"{prefix}.bias"] = np.asarray(leaf["bias"]).copy()


def completer_params_to_torch(params: Mapping) -> Dict[str, np.ndarray]:
    """Inverse converter: Flax KeypointCompleter params -> a reference-named
    torch state dict (numpy values), so models trained here can be consumed
    by reference tooling."""
    sd: Dict[str, np.ndarray] = {}
    _to_torch_linear(sd, "input_embedding", params["input_embedding"])
    _to_torch_linear(sd, "filled_embedding", params["filled_embedding"])
    sd["learned_input_positional_encoder"] = np.asarray(
        params["learned_input_pos"]).copy()
    sd["learned_filled_positional_encoder"] = np.asarray(
        params["learned_filled_pos"]).copy()
    for ours, theirs in (("swiglu_input_prev", "swiGlu_input_prev"),
                         ("swiglu_filled_prev", "swiGlu_filled_prev"),
                         ("swiglu_decoded", "swiGlu_decoded")):
        for i in (1, 2, 3):
            _to_torch_linear(sd, f"{theirs}.fc{i}", params[ours][f"fc{i}"])
    core = params["transformer"]
    layer_ids = sorted(int(k.split("_")[1]) for k in core
                       if k.startswith("encoder_")
                       and k.split("_")[1].isdigit())
    for i in layer_ids:
        for side, attn_names in (("encoder", (("self_attn", "self_attn"),)),
                                 ("decoder", (("self_attn", "self_attn"),
                                              ("cross_attn",
                                               "multihead_attn")))):
            lp = core[f"{side}_{i}"]
            base = f"transformer.{side}.layers.{i}"
            for ours_attn, theirs_attn in attn_names:
                at = lp[ours_attn]
                w = np.concatenate([np.asarray(at[n]["kernel"]).T
                                    for n in ("q_proj", "k_proj", "v_proj")])
                b = np.concatenate([np.asarray(at[n]["bias"])
                                    for n in ("q_proj", "k_proj", "v_proj")])
                sd[f"{base}.{theirs_attn}.in_proj_weight"] = w
                sd[f"{base}.{theirs_attn}.in_proj_bias"] = b
                _to_torch_linear(sd, f"{base}.{theirs_attn}.out_proj",
                                 at["out_proj"])
            _to_torch_linear(sd, f"{base}.linear1", lp["ff"]["linear1"])
            _to_torch_linear(sd, f"{base}.linear2", lp["ff"]["linear2"])
            norms = ("norm1", "norm2") if side == "encoder" else \
                ("norm1", "norm2", "norm3")
            for nm in norms:
                sd[f"{base}.{nm}.weight"] = np.asarray(
                    lp[nm]["scale"]).copy()
                sd[f"{base}.{nm}.bias"] = np.asarray(lp[nm]["bias"]).copy()
    for ours, theirs in (("encoder_norm", "transformer.encoder.norm"),
                         ("decoder_norm", "transformer.decoder.norm")):
        sd[f"{theirs}.weight"] = np.asarray(core[ours]["scale"]).copy()
        sd[f"{theirs}.bias"] = np.asarray(core[ours]["bias"]).copy()
    _to_torch_linear(sd, "fc_final", params["fc_final"])
    return sd


def save_reference_checkpoint(path: str, params: Mapping, *,
                              input_size: int = 108, hidden_dim: int,
                              num_layers: int, num_heads: int,
                              loss: float = float("nan")) -> None:
    """Write a reference-schema ``.pth`` (A1_train.py:313-321)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in completer_params_to_torch(params).items()}
    torch.save({
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "input_size": input_size,
        "hidden_dim": hidden_dim,
        "num_layers": num_layers,
        "num_heads": num_heads,
        "loss": loss,
    }, path)


# ---------------------------------------------------------------------------
# Orbax native checkpointing
# ---------------------------------------------------------------------------

def save_train_state(directory: str, step: int, state) -> None:
    """Persist the full train state (params, opt state, step, RNG key)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_train_state(directory: str, step: int, template):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def latest_step(directory: str):
    if not os.path.isdir(directory):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(directory)
             if d.startswith("step_")]
    return max(steps) if steps else None
