"""Typed configuration for the whole framework.

Replaces the reference's argparse parent parser (parseMain.py:3-60) and the
module-header magic constants (A1_train.py:29-32 etc.) with one dataclass
tree.  Field names and defaults track the reference flags so experiment
configs translate 1:1: hidden_dim=256, num_heads=8, num_layers=6, lr=5e-6,
epochs=500, patience=50 (parseMain.py:10-34).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class ModelConfig:
    hidden_dim: int = 256
    num_heads: int = 8
    num_layers: int = 6
    input_size: int = 108          # 54 keypoints x 2 (A1_train.py:247)
    ff_dim: int = 2048             # torch nn.Transformer default
    variant: str = "plain"         # "plain" | "cycle" | "embedding"
    # numerics: "highest" = f32 MXU passes (reference parity);
    # "default" = bf16 MXU passes (fast path)
    matmul_precision: str = "highest"
    compute_dtype: str = "float32"
    # "auto" (default): fused pallas kernel on TPU (wins at every measured
    # shape, RESULTS.md), xla elsewhere; "xla" | "pallas" force a path
    attention_impl: str = "auto"
    # fused FF-sublayer kernel (LN+FF+residual+LN in one pass): "auto" =
    # pallas on TPU for inference, xla for training (the kernel's backward
    # is an XLA recompute, so under grad the fused forward is paid twice —
    # measured net loss at bf16x3); "xla" | "pallas" force a path
    ff_impl: str = "auto"
    # fused attention-SUBLAYER kernel (qkv proj + attention + out proj +
    # residual [+ LN] in one pass, ops/pallas/attn_sublayer.py): "auto" =
    # on for inference / off for training (same recompute argument; the
    # per-op pallas attention keeps its native fused backward for the
    # train step); "on" | "off" force
    attn_sublayer_fusion: str = "auto"
    # fused pre/post pointwise chains (ops/pallas/pointwise.py): "auto" =
    # pallas on TPU for inference, xla for training; "xla" | "pallas"
    pointwise_impl: str = "auto"
    # lax.scan over layers (stacked params; identical numerics).  NOTE:
    # prefer the unrolled default when tensor-parallel sharding is on —
    # GSPMD-partitioning a scanned loop compiles far slower than the
    # unrolled stack at these sizes.
    scan_layers: bool = False
    remat: bool = False            # per-layer rematerialization
    # shard the token axis over the mesh "model" axis between attention
    # blocks (GSPMD inserts the gathers); needs mesh.model > 1
    sequence_parallel: bool = False


@dataclasses.dataclass
class DataConfig:
    dataset_name: str = "all"
    # optional dataset_config.json overlay (missingness stats / paths)
    registry_path: Optional[str] = None
    training_set_path: str = ""
    validation_set_path: str = ""
    batch_size: int = 8
    max_seq_len: int = 512
    bucket_multiple: int = 32      # pad lengths up to multiples of this
    augmentations_prob: float = 0.5
    have_augmentation: bool = True
    is_random_missing: bool = False
    double_hand_rotation: bool = True   # reproduce augmentation.py:134-140
    # keep padded buckets resident in HBM and gather batches on device —
    # host->device transfer is the epoch bottleneck on tunneled TPUs.
    # Applies on single-device runs when the dataset fits (see loop).
    device_resident_data: bool = True
    # synthetic data (hermetic runs / benchmarks); motion "gestures" draws
    # clips as windows of a shared prototype vocabulary — the structured
    # regime where learned dynamics beat blind interpolation
    synthetic_num_videos: int = 0
    synthetic_min_len: int = 24
    synthetic_max_len: int = 96
    synthetic_motion: str = "smooth"   # "smooth" | "gestures"
    synthetic_vocab: int = 8
    seed: int = 42


@dataclasses.dataclass
class MeshConfig:
    data: int = 1                  # data-parallel axis size
    model: int = 1                 # tensor-parallel axis size
    # multi-host: data-parallel slices spanning processes over DCN
    # (parallel/distributed.py); 1 = single process or auto (process count)
    dcn_data: int = 1
    # jax.distributed coordination (None -> single process, or taken from
    # KIT_COORDINATOR / KIT_NUM_PROCESSES / KIT_PROCESS_ID env)
    coordinator: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclasses.dataclass
class TrainConfig:
    regime: str = "a1"             # a1 | a2 | a3 | a4
    lr: float = 5e-6
    epochs: int = 500
    patience: int = 50
    # None -> faithful per-regime default: a1/a2/a4 break on patience
    # (A1_train.py:335-347); a3's patience check never breaks
    # (A3_train_embedding.py:265-267).  Set True/False to override.
    early_stop: Optional[bool] = None
    seed: int = 42
    checkpoint_dir: str = "model_checkpoint"
    experiment_name: Optional[str] = None
    # a2: checkpoint of the frozen first model
    upload_model: Optional[str] = None
    # a4: warm start / embedding graft
    upload_general_model: Optional[str] = None
    upload_embedding_model: Optional[str] = None
    freeze_grafted: bool = True
    # a3 schedule: lr /10 at this epoch (A3_train_embedding.py:261-263)
    a3_lr_drop_epoch: int = 80
    # path to a saved full_state dir: restores params, optimizer, epoch
    # counter, LR-schedule position and RNG key (the reference's resume
    # loses the last three — A1_train.py:268)
    resume_from: Optional[str] = None
    # time-box: stop after this many epochs THIS RUN without shortening the
    # LR schedule (which always spans `epochs`); resume later
    max_epochs_this_run: Optional[int] = None
    log_every: int = 1
    save_checkpoints: bool = True
    # on new best: violin histogram + validation strips (reference
    # sent_histogram / sent_validation_result, A1_train.py:304-309)
    save_plots: bool = False
    results_dir: str = "results"
    # full_state (params+optimizer+epoch, ~3x params bytes) is written at
    # most every N improving epochs; best params are written on every best.
    # Saves run on a background thread (async orbax) so the device keeps
    # training during serialization.
    full_state_every: int = 5
    # epoch-0 cubic-spline baseline (A1_train.py:193-195)
    epoch0_cubic_baseline: bool = True
    # per-epoch parameter/gradient global norms in the metrics stream —
    # the local analog of the reference's wandb.watch(model)
    # (A1_train.py:251)
    watch_norms: bool = True
    # pallas fused masked-loss kernel (ops/pallas/masked_loss.py) for the
    # per-video criterion inside the train step; TPU backend only
    fused_loss: bool = False
    # device-side epoch chaining: run each device-resident bucket's
    # batches as ONE lax.scan dispatch (state as carry) instead of one
    # jitted call per batch — a step call passing the ~350-leaf train
    # state costs ~15-20 ms of host marshaling through the TPU tunnel
    # (RESULTS.md round 4).  RNG/batch composition are identical to the
    # per-step path.  Applies when device_resident_data is active
    # (single-process); mesh runs keep per-step dispatch.
    chain_steps: bool = True

    def effective_early_stop(self) -> bool:
        if self.early_stop is None:
            return self.regime != "a3"
        return self.early_stop


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        return cls(
            model=ModelConfig(**d.get("model", {})),
            data=DataConfig(**d.get("data", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
            train=TrainConfig(**d.get("train", {})),
        )

    @classmethod
    def from_json_file(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))
