"""TPU-native sign-language keypoint-sequence inpainting framework.

A from-scratch JAX / Flax / Pallas re-design of the capabilities of
JoeNatan30/keypoints_interpolation_transformer: inpainting missing frames in
2-D pose-keypoint sequences (54 MediaPipe keypoints x (x, y) per frame) with
an encoder-decoder transformer, classical cubic-spline / quaternion-SLERP
baselines, four training regimes, and a unified sharded (pjit/shard_map)
training loop.

Layering (bottom-up):
  data/        keypoint catalog, HDF5 IO (reference-schema compatible),
               padded/bucketed batching, synthetic data
  transforms/  pure-jnp vmappable preprocessing: signing-space normalization,
               missing-frame corruption, geometric augmentations
  ops/         losses, attention-bias builders, cubic-spline + SLERP
               baselines, Pallas TPU kernels
  models/      Flax KeypointCompleter / Cycle / Embedding
  parallel/    mesh + sharding utilities (dp x tp)
  train/       unified train loop covering the A1-A4 regimes
  eval/        baselines evaluation, inference benchmark, statistics
  utils/       config, registry, logging, profiling
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps bare `import` fast on 1-core hosts)."""
    if name in ("KeypointCompleter", "Embedding",
                "keypoint_completer_cycle"):
        from .models import completer
        return getattr(completer, name)
    if name in ("Config", "ModelConfig", "DataConfig", "TrainConfig",
                "MeshConfig"):
        from .utils import config
        return getattr(config, name)
    if name == "train":
        from .train.loop import train
        return train
    if name == "Inpainter":
        from .eval.serving import Inpainter
        return Inpainter
    if name == "cubic_interpolation":
        from .ops.cubic_spline import cubic_interpolation
        return cubic_interpolation
    if name == "quaternion_interpolation":
        from .ops.slerp import quaternion_interpolation
        return quaternion_interpolation
    raise AttributeError(name)


__all__ = ["KeypointCompleter", "Embedding", "keypoint_completer_cycle",
           "Config", "ModelConfig", "DataConfig", "TrainConfig",
           "MeshConfig", "train", "Inpainter", "cubic_interpolation",
           "quaternion_interpolation"]
