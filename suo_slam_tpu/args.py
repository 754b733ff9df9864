"""CLI argument surface, mirroring the reference (`lib/args.py`).

Same two modes (train / eval), same flag names and defaults, same
`data_root = ./data/bop_datasets/<dataset>` convention, plus TPU-specific
additions (`--bf16`, `--norm`). The per-username default table is dropped —
env-var overrides (SUO_BATCH_SIZE etc.) replace it.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser
from sys import argv


def _env_int(name, default):
    return int(os.environ.get(name, default))


def get_args(mode="train", argv_override=None):
    assert mode in ("train", "eval")
    parser = ArgumentParser(
        description=("Evaluate" if mode == "eval" else "Train") + " PkpNet (TPU)"
    )
    probe = argv_override if argv_override is not None else argv
    is_tless = "tless" in probe

    default_ckpt = None if mode == "train" else "results/latest/model_best"
    parser.add_argument("--checkpoint_path", "-c", default=default_ckpt,
                        help="Checkpoint to load (resume for train, run for eval).")
    parser.add_argument("--dataset", "-d", default="ycbv", choices=["ycbv", "tless"])
    parser.add_argument("--no_network_cov", "-u", action="store_true",
                        help="Ignore predicted covariance (and skip MLE loss in training).")
    parser.add_argument("--show_viz", action="store_true")
    det_choices = ["gt", "gt+noise"] + ([] if mode == "train" else ["saved"])
    parser.add_argument("--detection_type", "-t",
                        default="gt+noise" if mode == "train" else "saved",
                        choices=det_choices)
    parser.add_argument("--bf16", action="store_true", default=True,
                        help="bfloat16 compute in the backbone (TPU default).")
    parser.add_argument("--no_bf16", dest="bf16", action="store_false")
    parser.add_argument("--norm", default="batch", choices=["group", "batch"],
                        help="Backbone normalization. Default 'batch' matches the "
                             "reference's BatchNorm and is required by the int8 "
                             "inference path (--int8 folds BN into conv epilogues); "
                             "'group' is a sync-free batch-independent alternative.")

    default_split = "primesense" if is_tless else "real+synt"
    if mode == "train":
        parser.add_argument("--workers", "-j", type=int, default=_env_int("SUO_WORKERS", 4))
        parser.add_argument("--loader", default="thread",
                            choices=["thread", "process"],
                            help="Worker tier for the train loader: thread "
                                 "(prefetch; decode hides behind the device "
                                 "step) or process (the reference's "
                                 "num_workers equivalent — scales "
                                 "decode+augment on real-size frames). "
                                 "Batches are bit-identical either way.")
        parser.add_argument("--batch_size", "-b", type=int,
                            default=_env_int("SUO_BATCH_SIZE", 16 if is_tless else 2))
        parser.add_argument("--epochs", type=int, default=1000 if is_tless else 30)
        parser.add_argument("--lr", type=float, default=1e-3)
        parser.add_argument("--ext", default="")
        parser.add_argument("--no_resume", action="store_true")
        parser.add_argument("--pretrain", default=None)
        parser.add_argument("--data_split", default=default_split,
                            help='"+"-separated: real, synt, pbr (or primesense).')
        parser.add_argument("--truncate_obj", type=int,
                            default=_env_int("SUO_TRUNCATE_OBJ", 16))
        parser.add_argument("--mask_occluded", action="store_true")
        parser.add_argument("--no_augmentations", action="store_true")
        parser.add_argument("--steps_per_epoch", type=int, default=0,
                            help="Cap steps per epoch (0 = full dataset); for smoke runs.")
        parser.add_argument("--val_steps", type=int, default=0,
                            help="Cap validation batches per epoch (0 = full "
                                 "val split); for smoke runs.")
        parser.add_argument("--val_start_epoch", type=int, default=5,
                            help="First epoch eligible for val-driven "
                                 "model_best (reference: 5).")
        parser.add_argument("--no_val", action="store_true",
                            help="Skip the held-out validation epoch entirely "
                                 "(no per-epoch test-split pass).")
        parser.add_argument("--val_select_best", action="store_true",
                            help="Let the test-split val epoch drive "
                                 "model_best/best.txt. OFF by default: the "
                                 "val split IS the eval split, so selecting "
                                 "on it leaks test data (the reference ships "
                                 "with this block commented out — "
                                 "`train.py:330-348`, is_best always False). "
                                 "Default selection uses training loss.")
        parser.add_argument("--use_cache", action="store_true",
                            help="Use the native mmap frame cache + threaded "
                                 "gatherer (packs on first run).")
    else:
        parser.add_argument("--nviews", type=int, default=-1,
                            help="1 = single-view PnP, N>1 = SfM per frame, -1 = full SLAM.")
        parser.add_argument("--no_viz", action="store_true")
        parser.add_argument("--viz_cov", action="store_true")
        parser.add_argument("--do_viz_extra", action="store_true")
        parser.add_argument("--no_prior_det", "-p", action="store_true")
        parser.add_argument("--debug_gt_kp", action="store_true")
        parser.add_argument("--gt_cam_pose", action="store_true")
        parser.add_argument("--debug_saved_only", action="store_true")
        parser.add_argument("--give_all_prior", action="store_true")
        parser.add_argument("--ref_manual_info", action="store_true",
                            help="Reference-faithful no-cov BA weighting: "
                                 "identity edge information in BA "
                                 "(object_slam.py:825-828) instead of our "
                                 "default 1/manual_kp_std^2; RANSAC/reinit "
                                 "keep 1/sigma^2 either way.")
        parser.add_argument("--batched", action="store_true",
                            help="Single-view (--nviews 1) throughput mode: "
                                 "precompute a window of views' keypoints in "
                                 "one chunked network call (bench.py-level "
                                 "throughput); engine PnP/BA semantics "
                                 "unchanged (eval/batched.py).")
        parser.add_argument("--eval_window", type=int, default=16,
                            help="Views per precompute window for --batched.")
        parser.add_argument("--pipeline_scenes", type=int, default=0,
                            help="Throughput mode for --nviews -1 (scenes) "
                                 "or --nviews N>1 (SfM keyframes): run K "
                                 "independent problems in lockstep, each on "
                                 "its own engine, batching their per-frame "
                                 "network calls into one dispatch "
                                 "(eval/pipeline.py). Results match the "
                                 "sequential sweep (exactly for bf16 or "
                                 "int8 with a persisted scales sidecar; "
                                 "int8 WITHOUT a sidecar refuses to run "
                                 "unless --int8_online_ok). 0/1 disables.")
        parser.add_argument("--int8", action="store_true",
                            help="int8-RESIDENT network inference (+82%% over "
                                 "bf16 at accuracy parity, BENCHMARKS.md); "
                                 "needs a norm=batch post_stem checkpoint")
        parser.add_argument("--int8_scales", default=None,
                            help="int8 activation-scale sidecar (.npz from "
                                 "calibrate_int8.py); default: auto-detect "
                                 "next to the checkpoint, else online "
                                 "first-frames calibration")
        parser.add_argument("--int8_online_ok", action="store_true",
                            help="Allow --int8 --pipeline_scenes WITHOUT a "
                                 "persisted scales sidecar. Online "
                                 "calibration sees different crops per mode, "
                                 "so pipelined output diverges from the "
                                 "sequential sweep; without this flag that "
                                 "combination refuses to run.")

    parser.add_argument("--data_root", default=None,
                        help="Override BOP dataset root (default ./data/bop_datasets/<dataset>).")
    parser.add_argument("--kp_config_root", default=None,
                        help="Override kp_configs dir (default repo kp_configs/).")
    args = parser.parse_args(argv_override)
    if args.data_root is None:
        args.data_root = os.path.join(os.getcwd(), "data/bop_datasets", args.dataset)
    return args
