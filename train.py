#!/usr/bin/env python
"""Training CLI for PkpNet on BOP datasets.

TPU-native rebuild of the reference `train.py`: same CLI surface and results
directory contract (auto-resume from the newest matching
`results/pkpnet_<dataset>_<split>_<ext>_<timestamp>` dir, `checkpoint-<N>` /
`checkpoint-latest` / `model_best` files, `params.txt` dump, annealed
MLE + variance + BCE losses), with the torch DataLoader + DataParallel
replaced by a host prefetch loop feeding a pjit-sharded train step over a
data-parallel device mesh (`suo_slam_tpu/train/harness.py`).
"""

import json
import os
import sys
import time

import numpy as np


def build_datasets(args):
    from suo_slam_tpu.data.bop import BopDataset

    splits = []
    for part in args.data_split.split("+"):
        split = f"train_{part}" if not part.startswith("train") else part
        splits.append(split)
    datasets = [
        BopDataset(
            args.data_root, split, bop_dset=args.dataset, map_by="view",
            mask_occluded=args.mask_occluded, no_aug=args.no_augmentations,
            det_type=args.detection_type, kp_config_root=args.kp_config_root,
            seed=123 + i,
        )
        for i, split in enumerate(splits)
    ]
    return datasets


from suo_slam_tpu.data.loader import ConcatLoader  # noqa: F401  (CLI + tests use train.ConcatLoader)


def build_val_datasets(args):
    """Held-out validation data: the test-split keyframes, like the
    reference (`train.py:309-325`: `test_primesense` for T-LESS, `test`
    keyframes for YCBV; no augmentation on test splits by construction).
    Returns [] if the split is absent on disk (e.g. train-only fixtures)."""
    from suo_slam_tpu.data.bop import BopDataset

    split = "test_primesense" if args.dataset == "tless" else "test"
    if not os.path.isdir(os.path.join(args.data_root, split)):
        return []
    return [
        BopDataset(
            args.data_root, split, bop_dset=args.dataset, map_by="view",
            det_type="gt", kp_config_root=args.kp_config_root, seed=666,
        )
    ]


def to_device_batch(np_batch, o_pad=None):
    import jax.numpy as jnp

    from suo_slam_tpu.train.harness import Batch

    def pad_obj(a):
        if o_pad is None or a.shape[1] == o_pad:
            return a
        out = np.zeros((a.shape[0], o_pad) + a.shape[2:], a.dtype)
        out[:, : a.shape[1]] = a[:, :o_pad]
        return out

    return Batch(
        images=jnp.asarray(np_batch["images"]),
        boxes=jnp.asarray(pad_obj(np_batch["boxes"])),
        obj_mask=jnp.asarray(pad_obj(np_batch["obj_mask"])),
        prior_uv=jnp.asarray(pad_obj(np_batch["prior_uv"])),
        prior_mask=jnp.asarray(pad_obj(np_batch["prior_mask"])),
        uv_gt=jnp.asarray(pad_obj(np_batch["uv_gt"])),
        kp_mask=jnp.asarray(pad_obj(np_batch["kp_mask"])),
    )


def _dump_epoch_viz(outdir, epoch, net, state, np_batch, max_objs=4,
                    split="train"):
    """Per-epoch prediction viz PNG (the reference dumps viz every epoch
    into `viz_<split>_epoch_<N>`, `train.py:33-38,119-156`). Best-effort:
    failures never kill training. Returns the viz dir (or None)."""
    try:
        import cv2
        import jax
        import jax.numpy as jnp

        from suo_slam_tpu.eval.viz import make_frame_viz
        from suo_slam_tpu.ops import heatmap as hm
        from suo_slam_tpu.ops import roi as roi_ops
        from suo_slam_tpu.train.harness import model_variables

        img = np_batch["images"][0]
        boxes = np_batch["boxes"][0]
        omask = np_batch["obj_mask"][0]
        crops = roi_ops.roi_crop_batch(
            jnp.asarray(img[None]), jnp.asarray(boxes[None]),
            jnp.asarray(omask[None]), (256, 256),
        )[0]
        out = net.apply(model_variables(state.params, state.batch_stats), crops)
        dets = {}
        for i in range(min(int(omask.sum()), max_objs)):
            dets[int(np_batch["obj_ids"][0][i]) if "obj_ids" in np_batch else i + 1] = {
                "bbox": boxes[i],
                "uv": np.asarray(out.uv[i]),
                "cov": np.asarray(out.cov[i]) if out.cov is not None else None,
                "kp_mask": np.asarray(out.kp_mask[i] > 0.3)
                & np_batch["kp_model_masks"][0][i],
            }
        viz_dir = os.path.join(outdir, f"viz_{split}_epoch_{epoch}")
        os.makedirs(viz_dir, exist_ok=True)
        viz = make_frame_viz(img, dets, {}, np_batch["K"][0])
        cv2.imwrite(os.path.join(viz_dir, "sample.png"), viz[..., ::-1])
        return viz_dir
    except Exception as e:  # pragma: no cover
        print(f"viz dump failed: {e}")
        return None


def main():
    import jax
    import jax.numpy as jnp

    from suo_slam_tpu.args import get_args
    from suo_slam_tpu.models import PkpNet
    from suo_slam_tpu.train import checkpoint as ckpt
    from suo_slam_tpu.train import harness
    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()
    args = get_args("train")
    print("======= Train Args ================")
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")
    print("===================================")

    results_root = os.path.join(os.getcwd(), "results")
    split_tag = args.data_split
    # Resolve the resume checkpoint BEFORE building the net, and let the
    # checkpoint's recorded architecture flags win over CLI defaults — the
    # same precedence eval uses (`eval/loading.py`). Otherwise a default
    # flip (e.g. --norm batch) makes auto-resume of an older group-norm run
    # build the wrong parameter template and fail restore.
    resume_path = None
    if args.checkpoint_path:
        resume_path = args.checkpoint_path
    elif not args.no_resume:
        resume_dir = ckpt.find_resume_dir(results_root, args.dataset, split_tag, args.ext)
        if resume_dir is not None:
            resume_path = os.path.join(resume_dir, "checkpoint-latest")
    if resume_path is not None:
        trained = ckpt.peek_checkpoint_args(resume_path)
        for arch_flag in ("norm", "no_network_cov"):
            if arch_flag in trained and trained[arch_flag] != getattr(args, arch_flag):
                print(f"Resume: overriding --{arch_flag}="
                      f"{getattr(args, arch_flag)} with the checkpoint's "
                      f"recorded {trained[arch_flag]!r}")
                setattr(args, arch_flag, trained[arch_flag])

    tiny = bool(int(os.environ.get("SUO_TINY_NET", "0")))  # smoke tests
    net = PkpNet(
        calc_cov=not args.no_network_cov, norm=args.norm,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        **(dict(n_stack=1, n_modules=1, features=16) if tiny else {}),
    )
    optimizer = harness.make_optimizer(args.lr)
    state = harness.init_state(net, jax.random.PRNGKey(0), optimizer)

    start_epoch = 0
    best_val = float("inf")
    best_train = float("inf")  # no-val fallback metric (persisted, see below)
    outdir = None
    if resume_path is not None:
        print(f"{'Resuming' if args.checkpoint_path else 'Auto-resuming'} "
              f"from {resume_path}")
        state, start_epoch, _, best_val, best_train = ckpt.load_checkpoint(
            resume_path, state)
        start_epoch += 1
        outdir = os.path.dirname(resume_path)
    if args.pretrain:
        from suo_slam_tpu.train.checkpoint import load_model_only
        from suo_slam_tpu.train.harness import model_variables

        variables, _, _ = load_model_only(
            args.pretrain, model_variables(state.params, state.batch_stats)
        )
        state = state._replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
    if outdir is None:
        outdir = os.path.join(
            results_root, ckpt.output_dir_name(args.dataset, split_tag, args.ext)
        )
        os.makedirs(outdir, exist_ok=True)
    print(f"Writing results to {outdir}")
    with open(os.path.join(outdir, "params.txt"), "w") as f:
        json.dump(vars(args), f, indent=2)

    datasets = build_datasets(args)
    if getattr(args, "use_cache", False):
        from suo_slam_tpu.data.fastload import CacheLoader

        paths = [
            os.path.join(args.data_root, f"{ds.split}.suocache") for ds in datasets
        ]
        loader = CacheLoader(
            datasets, paths, args.batch_size, args.truncate_obj,
            n_threads=args.workers,
        )
        print(f"Native cache loader: {loader.total} frames "
              f"({len(datasets)} splits), {len(loader)} steps/epoch")
    else:
        loader = ConcatLoader(datasets, args.batch_size, args.truncate_obj,
                              workers=args.workers,
                              mode=getattr(args, "loader", "thread"))
        print(f"Training on {loader.total} frames, {len(loader)} steps/epoch "
              f"({loader.workers} decode {loader.mode} workers)")

    mesh = harness.data_parallel_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    do_anneal = args.pretrain is None  # reference `train.py:333-334`
    step_fn = (
        harness.make_sharded_train_step(net, optimizer, mesh, do_anneal=do_anneal)
        if n_dev > 1 and args.batch_size % n_dev == 0
        else jax.jit(harness.make_train_step(net, optimizer, do_anneal=do_anneal),
                     donate_argnums=(0,))
    )

    # held-out validation over test-split keyframes (reference
    # `train.py:309-325` builds the same loader): per-epoch avg uv_loss is
    # reported every epoch, and drives model_best / best.txt / viz_best
    # after `val_start_epoch` only under --val_select_best (see the
    # selection block below for why that is opt-in)
    val_loader = None
    if not args.no_val:
        val_datasets = build_val_datasets(args)
        if val_datasets:
            # workers=1: the in-line loading path keeps the sample ->
            # RNG-stream mapping deterministic (thread scheduling would
            # permute it), so with reset_rng() per epoch val_err is exactly
            # reproducible — the metric must be comparable across epochs
            # because it drives model_best
            val_loader = ConcatLoader(val_datasets, args.batch_size,
                                      args.truncate_obj, seed=666,
                                      workers=1)
            print(f"Validating on {val_loader.total} held-out frames, "
                  f"{len(val_loader)} batches/epoch")
        else:
            print("WARNING: no test split on disk — model_best falls back "
                  "to training loss")
    eval_step = jax.jit(harness.make_eval_step(net, do_anneal=do_anneal))

    args_dict = vars(args).copy()
    for epoch in range(start_epoch, args.epochs):
        t_epoch = time.time()
        t0 = time.time()
        # device-side loss accumulator: every step contributes to the epoch
        # average without a per-step host sync (float() only on print steps
        # and at epoch end)
        sum_loss, n_steps = jnp.zeros(()), 0
        train_np_batch = None
        for i, np_batch in enumerate(loader.epoch()):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            train_np_batch = np_batch
            batch = to_device_batch(np_batch, o_pad=args.truncate_obj)
            state, metrics = step_fn(state, batch, jnp.asarray(float(epoch)))
            sum_loss = sum_loss + metrics["loss"]
            n_steps += 1
            from suo_slam_tpu.utils import ram_guard

            if not ram_guard(99.0):  # host-OOM watchdog (`train.py:105-109`)
                print("RAM usage too high (>99%). Exiting.")
                sys.exit(1)
            if (i + 1) % 10 == 0 or i == 0:
                loss = float(metrics["loss"])
                print(
                    f"Epoch: {epoch} [{i + 1}/{len(loader)}] "
                    f"loss_tot={loss:.3f} uv_loss={float(metrics['uv_loss']):.3f} "
                    f"var_loss=({float(metrics['var_lambda']):.3f},"
                    f"{float(metrics['var_loss']):.3f}) "
                    f"mask_loss=({float(metrics['mask_lambda']):.3f},"
                    f"{float(metrics['mask_loss']):.3f}) "
                    f"sec/it={(time.time() - t0) / (i + 1):.2f}",
                    flush=True,
                )
        train_loss = float(sum_loss) / max(1, n_steps)

        # ---- validation epoch (no grad, running BN stats) ----
        val_err = None
        val_np_batch = None
        if val_loader is not None:
            v_sum, v_n = 0.0, 0
            for d in val_loader.datasets:
                d.reset_rng()  # identical prior/augment draws every epoch
            for j, np_batch in enumerate(
                    val_loader.epoch(shuffle=False, seed=666)):
                if args.val_steps and j >= args.val_steps:
                    break
                if val_np_batch is None:
                    val_np_batch = np_batch
                batch = to_device_batch(np_batch, o_pad=args.truncate_obj)
                m = eval_step(state.params, state.batch_stats, batch,
                              jnp.asarray(float(epoch)))
                v_sum += float(m["uv_loss"])
                v_n += 1
                print(f"Test: [{j + 1}/{len(val_loader)}] "
                      f"uv_loss={v_sum / v_n:.3f} avg", end="\r", flush=True)
            if v_n:
                val_err = v_sum / v_n
                print(f"\nEpoch {epoch} val uv_loss: {val_err:.4f}")

        # model_best selection. DEFAULT: training loss. The val epoch above
        # is reporting-only unless --val_select_best: the val split IS the
        # eval split (test keyframes), and the reference deliberately ships
        # with val-driven selection disabled for exactly that reason — its
        # whole val/is_best block is commented out with "This is the test
        # set, so we should not use the best network anyways"
        # (`train.py:330-348`, is_best always False). Both selection metrics
        # persist in the checkpoint so auto-resume keeps comparing against
        # the true running minimum (not a fresh inf).
        is_best = False
        if args.val_select_best and val_err is not None:
            if epoch >= args.val_start_epoch and val_err < best_val:
                with open(os.path.join(outdir, "best.txt"), "w") as f:
                    f.write(f"epoch={epoch}\nval_err={val_err}\n"
                            f"prev_best={best_val}")
                best_val = val_err
                is_best = True
        elif not args.val_select_best and train_loss < best_train:
            best_train = train_loss
            is_best = True
        ckpt.save_checkpoint(outdir, state, epoch, args_dict, best_val,
                             is_best=is_best, best_train=best_train)
        if train_np_batch is not None:
            _dump_epoch_viz(outdir, epoch, net, state, train_np_batch,
                            split="train")
        if val_np_batch is not None:
            viz_dir = _dump_epoch_viz(outdir, epoch, net, state, val_np_batch,
                                      split="test")
            if is_best and viz_dir is not None:
                import shutil

                viz_best = os.path.join(outdir, "viz_best")
                if os.path.exists(viz_best):
                    shutil.rmtree(viz_best)
                shutil.copytree(viz_dir, viz_best)
        print(
            f"Epoch {epoch} done in {time.time() - t_epoch:.1f}s, "
            f"train loss {train_loss:.4f}"
            + (f", val uv_loss {val_err:.4f}" if val_err is not None else "")
            + (" (best)" if is_best else "")
        )


if __name__ == "__main__":
    main()
