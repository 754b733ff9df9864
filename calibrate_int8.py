#!/usr/bin/env python
"""Offline int8 activation-scale calibration.

Runs a configurable sample of dataset frames through the f32 calibration
traversal (`models/int8_forward.calibrate`) with the WORST-CASE prior and
persists the per-quant-point absmax tuple as a checkpoint sidecar
(`<checkpoint>/int8_scales.npz`). `evaluate.py --int8` auto-detects the
sidecar, making int8 serving accuracy independent of whatever the session's
first frames happen to look like (the online first-frames calibration
remains the fallback).

The crops fed to calibration are produced by the SAME on-device ROI stage
the engine uses (`ops/roi.roi_crop_batch`), so the recorded ranges match
serving exactly.

Usage:
  ./calibrate_int8.py --dataset ycbv --data_root <bop root> \
      --checkpoint_path results/.../model_best [--n_frames 64] [--out PATH]
"""

import argparse
import os
import sys

import numpy as np


def sample_frames(dataset, n_frames):
    """Evenly sample (scene, view) pairs across all scenes."""
    pairs = [
        (s, v) for s in dataset.scene_ids() for v in dataset.view_ids(s)
    ]
    if len(pairs) <= n_frames:
        return pairs
    idx = np.linspace(0, len(pairs) - 1, n_frames).astype(int)
    return [pairs[i] for i in idx]


def collect_crop_batches(dataset, frames, input_hw, batch_size=16):
    """Frames -> list of [B, H, W, 3] ROI-crop batches via the engine's own
    on-device ROI stage."""
    import jax.numpy as jnp

    from suo_slam_tpu.ops import roi as roi_ops

    crops_all = []
    for scene_id, view_id in frames:
        obj_ids = dataset.obj_ids(scene_id, view_id)
        if not len(obj_ids):
            continue
        sample = dataset.get_raw(scene_id, view_id, obj_ids, p_give_prior=0.0)
        img = jnp.asarray(sample["img"])[None]
        boxes = jnp.asarray(sample["bboxes"], jnp.float32)[None]
        valid = jnp.ones((1, boxes.shape[1]), bool)
        crops = roi_ops.roi_crop_batch(img, boxes, valid, input_hw)[0]
        crops_all.append(np.asarray(crops))
    flat = np.concatenate(crops_all, axis=0) if crops_all else None
    if flat is None:
        raise SystemExit("no frames with detections found for calibration")
    return [
        jnp.asarray(flat[i: i + batch_size])
        for i in range(0, len(flat), batch_size)
    ]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset", choices=("ycbv", "tless"), default="ycbv")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--kp_config_root", default=None)
    ap.add_argument("--split", default=None,
                    help="dataset split (default: the eval split)")
    ap.add_argument("--n_frames", type=int, default=64,
                    help="frames sampled evenly across scenes")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--input_hw", type=int, nargs=2, default=(256, 256),
                    help="ROI crop size fed to the net (engine input_hw)")
    ap.add_argument("--out", default=None,
                    help="output .npz (default: sidecar next to checkpoint)")
    ap.add_argument("--no_bf16", dest="bf16", action="store_false")
    args = ap.parse_args(argv)

    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()

    from suo_slam_tpu.data.bop import BopDataset
    from suo_slam_tpu.eval.loading import default_scales_path, load_eval_network
    from suo_slam_tpu.models import int8_forward as i8

    split = args.split or (
        "test" if args.dataset == "ycbv" else "test_primesense"
    )
    dataset = BopDataset(
        args.data_root, split, bop_dset=args.dataset, ignore_symmetry=True,
        kp_config_root=args.kp_config_root, seed=666,
    )
    net, variables, epoch = load_eval_network(
        args.checkpoint_path, bf16=args.bf16
    )
    if net.norm != "batch":
        raise SystemExit(
            f"int8 calibration requires a norm='batch' checkpoint; got "
            f"norm={net.norm!r}"
        )

    frames = sample_frames(dataset, args.n_frames)
    print(f"calibrating over {len(frames)} frames "
          f"(checkpoint epoch {epoch}) ...")
    batches = collect_crop_batches(
        dataset, frames, tuple(args.input_hw), args.batch_size,
    )
    # worst-case prior (prior_batches=None): value range [0,1] by
    # construction — see int8_forward.calibrate
    scales = i8.calibrate(net, variables, batches)
    out = args.out or default_scales_path(args.checkpoint_path)
    i8.save_scales(out, scales)
    n_crops = sum(int(b.shape[0]) for b in batches)
    print(f"saved {len(scales)} activation scales (from {n_crops} crops) "
          f"to {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
