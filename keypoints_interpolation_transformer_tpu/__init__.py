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
