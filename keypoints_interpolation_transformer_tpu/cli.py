"""Command-line interface.

Replaces the reference's per-script argparse entry points (A1-A4 trainers +
evaluation scripts) with one CLI.  Flag names track parseMain.py:3-60.

Usage:
  python -m keypoints_interpolation_transformer_tpu.cli train --regime a1 \
      --training_set_path data/training--AUTSL.hdf5 \
      --validation_set_path data/validation--AUTSL.hdf5
  python -m keypoints_interpolation_transformer_tpu.cli train --regime a1 \
      --synthetic 64 --epochs 3          # hermetic synthetic run
  python -m keypoints_interpolation_transformer_tpu.cli prepare ...
  python -m keypoints_interpolation_transformer_tpu.cli eval-baselines ...
"""

from __future__ import annotations

import argparse
import json
import sys

from .utils.config import (Config, DataConfig, MeshConfig, ModelConfig,
                           TrainConfig)


def _add_common(p: argparse.ArgumentParser):
    B = argparse.BooleanOptionalAction
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_layers", type=int, default=6)
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--patience", type=int, default=50)
    p.add_argument("--training_set_path", type=str, default="")
    p.add_argument("--validation_set_path", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic videos instead of HDF5 paths")
    p.add_argument("--synthetic_motion", type=str, default="smooth",
                   choices=["smooth", "gestures"])
    p.add_argument("--synthetic_vocab", type=int, default=8)
    p.add_argument("--synthetic_min_len", type=int, default=24)
    p.add_argument("--synthetic_max_len", type=int, default=96)
    p.add_argument("--registry_path", type=str, default=None,
                   help="JSON overlay of per-dataset corruption stats "
                        "(dataset_config.json schema)")
    p.add_argument("--dataset_name", type=str, default=None,
                   help="override the dataset name (default: parsed from "
                        "the validation path's '--' suffix, else 'all')")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    # multi-host (parallel/distributed.py): every rank runs the same
    # command with its own --process_id; coordinator is rank 0's address
    p.add_argument("--mesh_dcn", type=int, default=1)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--precision", type=str, default="highest",
                   choices=["highest", "high", "default"])
    p.add_argument("--wandb", action="store_true")
    # data-path behavior (reference parseMain.py / LSP_Dataset flags)
    p.add_argument("--is_random_missing", action="store_true",
                   help="60%%-random-frame corruption mode "
                        "(dataloader.py:320-334)")
    p.add_argument("--augmentation", action=B, default=True,
                   help="training-time augmentation (dataloader.py:551-553)")
    p.add_argument("--augmentations_prob", type=float, default=0.5)
    p.add_argument("--double_hand_rotation", action=B, default=True,
                   help="reproduce the reference's double hand rotation "
                        "quirk (augmentation.py:134-140)")
    p.add_argument("--device_resident_data", action=B, default=True)
    # model execution knobs
    p.add_argument("--attention_impl", type=str, default="auto",
                   choices=["xla", "pallas", "auto"])
    p.add_argument("--ff_impl", type=str, default="auto",
                   choices=["xla", "pallas", "auto"],
                   help="fused LN+FF+residual+LN sublayer kernel "
                        "(ops/pallas/ffn.py); auto = pallas on TPU")
    p.add_argument("--attn_sublayer_fusion", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="whole attention-sublayer kernel (ops/pallas/"
                        "attn_sublayer.py); auto = on for inference, "
                        "off for training")
    p.add_argument("--pointwise_impl", type=str, default="auto",
                   choices=["xla", "pallas", "auto"],
                   help="fused pre/post pointwise chains (ops/pallas/"
                        "pointwise.py); auto = pallas on TPU inference")
    p.add_argument("--scan_layers", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--sequence_parallel", action="store_true")


def _cfg_from_args(a, regime: str) -> Config:
    from .utils.registry import dataset_name_from_path

    name = a.dataset_name or "all"
    if a.validation_set_path and not a.dataset_name:
        name = dataset_name_from_path(a.validation_set_path)
    return Config(
        model=ModelConfig(hidden_dim=a.hidden_dim, num_heads=a.num_heads,
                          num_layers=a.num_layers,
                          matmul_precision=a.precision,
                          attention_impl=a.attention_impl,
                          ff_impl=a.ff_impl,
                          attn_sublayer_fusion=a.attn_sublayer_fusion,
                          pointwise_impl=a.pointwise_impl,
                          scan_layers=a.scan_layers, remat=a.remat,
                          sequence_parallel=a.sequence_parallel),
        data=DataConfig(dataset_name=name,
                        training_set_path=a.training_set_path,
                        validation_set_path=a.validation_set_path,
                        batch_size=a.batch_size, max_seq_len=a.max_seq_len,
                        synthetic_num_videos=a.synthetic, seed=a.seed,
                        synthetic_motion=a.synthetic_motion,
                        synthetic_vocab=a.synthetic_vocab,
                        synthetic_min_len=a.synthetic_min_len,
                        synthetic_max_len=a.synthetic_max_len,
                        is_random_missing=a.is_random_missing,
                        have_augmentation=a.augmentation,
                        augmentations_prob=a.augmentations_prob,
                        double_hand_rotation=a.double_hand_rotation,
                        device_resident_data=a.device_resident_data,
                        registry_path=a.registry_path),
        mesh=MeshConfig(data=a.mesh_data, model=a.mesh_model,
                        dcn_data=a.mesh_dcn, coordinator=a.coordinator,
                        num_processes=a.num_processes,
                        process_id=a.process_id),
        train=TrainConfig(regime=regime, lr=a.lr, epochs=a.epochs,
                          patience=a.patience, seed=a.seed,
                          experiment_name=a.experiment_name,
                          upload_model=getattr(a, "upload_model", None),
                          upload_general_model=getattr(
                              a, "upload_general_model", None),
                          upload_embedding_model=getattr(
                              a, "upload_embedding_model", None),
                          early_stop=getattr(a, "early_stop", None),
                          resume_from=getattr(a, "resume_from", None),
                          max_epochs_this_run=getattr(
                              a, "max_epochs_this_run", None),
                          save_checkpoints=getattr(
                              a, "save_checkpoints", True),
                          save_plots=getattr(a, "save_plots", False),
                          results_dir=getattr(a, "results_dir", "results"),
                          checkpoint_dir=getattr(a, "checkpoint_dir",
                                                 "model_checkpoint"),
                          fused_loss=getattr(a, "fused_loss", False),
                          full_state_every=getattr(a, "full_state_every",
                                                   5)),
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("keypoints_interpolation_transformer_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="unified trainer (regimes a1-a4)")
    _add_common(p_train)
    B = argparse.BooleanOptionalAction
    p_train.add_argument("--regime", choices=["a1", "a2", "a3", "a4"],
                         default="a1")
    p_train.add_argument("--upload_model", type=str, default=None,
                         help="a2: frozen first-model checkpoint")
    p_train.add_argument("--upload_general_model", type=str, default=None)
    p_train.add_argument("--upload_embedding_model", type=str, default=None)
    p_train.add_argument("--early_stop", action=B, default=None,
                         help="default: faithful per regime (a3 never "
                              "breaks on patience)")
    p_train.add_argument("--resume_from", type=str, default=None,
                         help="full_state dir: restores params, optimizer, "
                              "epoch counter, LR position and RNG key")
    p_train.add_argument("--max_epochs_this_run", type=int, default=None)
    p_train.add_argument("--full_state_every", type=int, default=5,
                         help="write the exact-resume full_state every Nth "
                              "best-checkpoint save (epoch 0 always)")
    p_train.add_argument("--save_checkpoints", action=B, default=True)
    p_train.add_argument("--save_plots", action=B, default=False,
                         help="violin histogram + validation strips on new "
                              "best (A1_train.py:304-309)")
    p_train.add_argument("--results_dir", type=str, default="results")
    p_train.add_argument("--checkpoint_dir", type=str,
                         default="model_checkpoint")
    p_train.add_argument("--fused_loss", action="store_true",
                         help="pallas fused masked-loss kernel (TPU only)")

    p_prep = sub.add_parser("prepare", help="dataset ETL (reference "
                            "1_prepare_dataset.py)")
    p_prep.add_argument("--dataset", type=str, required=True)
    p_prep.add_argument("--dataset_config", type=str,
                        default="dataset_config.json")
    p_prep.add_argument("--output_dir", type=str, default="data")
    p_prep.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic videos instead")

    p_base = sub.add_parser("eval-baselines", help="freeze-frame + cubic + "
                            "quaternion baselines (reference 2_/3_/test_* "
                            "scripts)")
    _add_common(p_base)
    p_base.add_argument("--which", type=str, default="all",
                        choices=["all", "freeze", "cubic", "quaternion"])
    p_base.add_argument("--results_dir", type=str, default="results",
                        help="where the reference-named image artifacts "
                             "(initial_loss_euclidean_*, cubic_histogram_*)"
                             " are written")

    p_infer = sub.add_parser("eval-model", help="checkpoint inference "
                             "benchmark (the reference's empty "
                             "3_test_IA_interpolation.py)")
    _add_common(p_infer)
    p_infer.add_argument("--checkpoint", type=str, required=True)
    p_infer.add_argument("--variant", type=str, default="plain",
                         choices=["plain", "cycle", "embedding"],
                         help="checkpoint type: plain=a1/a4, cycle=a2 "
                              "(needs --first_checkpoint), embedding=a3")
    p_infer.add_argument("--first_checkpoint", type=str, default=None,
                         help="frozen plain model feeding a cycle "
                              "checkpoint (A2_train_cycle.py:99)")

    p_mat = sub.add_parser("materialize", help="precompute corrupted "
                           "tensors to HDF5 (reference "
                           "generate_intermediate_validation.py)")
    _add_common(p_mat)
    p_mat.add_argument("--output", type=str, required=True)
    p_mat.add_argument("--random_missing", action="store_true")

    p_serve = sub.add_parser("serve", help="HTTP inpainting endpoint")
    _add_common(p_serve)
    p_serve.add_argument("--checkpoint", type=str, required=True)
    p_serve.add_argument("--host", type=str, default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8321)
    p_serve.add_argument("--quantize", type=str, default=None,
                         choices=["int8"],
                         help="int8 weight+activation matmuls (2x MXU "
                              "rate on v5e; small accuracy cost)")
    p_serve.add_argument("--variant", type=str, default="plain",
                         choices=["plain", "cycle", "embedding"],
                         help="checkpoint type: plain=a1/a4, cycle=a2 "
                              "(needs --first_checkpoint), embedding=a3")
    p_serve.add_argument("--first_checkpoint", type=str, default=None)
    p_serve.add_argument("--log_requests", action="store_true")
    return parser


def main(argv=None):
    a = build_parser().parse_args(argv)

    from .utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    if a.cmd == "train":
        from .parallel import distributed as dist
        if getattr(a, "num_processes", 1) > 1 and a.coordinator:
            dist.init_distributed(a.coordinator, a.num_processes,
                                  a.process_id)
        else:
            dist.init_from_env()
        from .train.loop import train
        res = train(_cfg_from_args(a, a.regime), use_wandb=a.wandb)
        if not dist.is_coordinator():
            return 0
        print(json.dumps({
            "best_val_loss": res.best_val_loss,
            "best_epoch": res.best_epoch,
            "epochs_run": res.epochs_run,
            "checkpoint": res.checkpoint_path,
        }))
        return 0

    if a.cmd == "prepare":
        from .data.prepare import prepare_main
        return prepare_main(a)

    if a.cmd == "eval-baselines":
        from .eval.baselines import baselines_main
        return baselines_main(a)

    if a.cmd == "eval-model":
        from .eval.inference import inference_main
        return inference_main(a)

    if a.cmd == "materialize":
        from .data.intermediate import generate_intermediate
        from .data.pipeline import KeypointDataset
        if a.synthetic:
            from .data.synthetic import synthetic_dataset
            ds = KeypointDataset(videos=synthetic_dataset(a.synthetic),
                                 dataset_name="all",
                                 max_seq_len=a.max_seq_len)
        else:
            ds = KeypointDataset(path=a.training_set_path or
                                 a.validation_set_path,
                                 max_seq_len=a.max_seq_len)
        generate_intermediate(ds, a.output, seed=a.seed,
                              is_random_missing=a.random_missing)
        print(a.output)
        return 0

    if a.cmd == "serve":
        from .eval.serving import Inpainter, serve
        from .utils.config import ModelConfig
        mc = None
        if not a.checkpoint.endswith(".pth"):
            mc = ModelConfig(hidden_dim=a.hidden_dim,
                             num_layers=a.num_layers,
                             num_heads=a.num_heads,
                             matmul_precision=a.precision)
        serve(Inpainter.from_checkpoint(a.checkpoint, mc,
                                        quantize=a.quantize,
                                        variant=a.variant,
                                        first_checkpoint=a.first_checkpoint),
              host=a.host, port=a.port, log_requests=a.log_requests)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
