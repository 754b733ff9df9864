#!/usr/bin/env python
"""Covariance calibration check (rebuild of the reference `plot_cov.py`).

Runs PkpNet over a training split, scatters keypoint error against predicted
sigma, and reports the fraction of errors inside the 99% chi-square bound of
the predicted 2D covariance — written to `percent_sigma_inbounds.txt` +
`sigma_plot.png` like the reference (`plot_cov.py:141-159`).
"""

import argparse
import os

import numpy as np

from suo_slam_tpu.eval.calibration import CHI2_99_2DOF, cov_chi2, pct_inbounds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_path", "-c", required=True)
    ap.add_argument("--dataset", "-d", default="ycbv", choices=["ycbv", "tless"])
    ap.add_argument("--split", default="train_pbr")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--kp_config_root", default=None)
    ap.add_argument("--max_frames", type=int, default=200)
    ap.add_argument("--out", default=None)
    ap.add_argument("--norm", default="batch", choices=["group", "batch"])
    args = ap.parse_args()
    data_root = args.data_root or os.path.join(
        os.getcwd(), "data/bop_datasets", args.dataset
    )
    out_dir = args.out or os.path.dirname(args.checkpoint_path) or "."
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from suo_slam_tpu.data.bop import BopDataset, collate
    from suo_slam_tpu.eval.loading import load_eval_network
    from suo_slam_tpu.ops import heatmap as hm
    from suo_slam_tpu.ops import roi as roi_ops

    # shared loader: checkpoint-recorded norm wins over --norm, torch
    # `.pth.tar` checkpoints convert automatically (same path evaluate.py
    # and calibrate_int8.py use)
    net, variables, _ = load_eval_network(
        args.checkpoint_path, bf16=False, norm=args.norm)

    ds = BopDataset(data_root, args.split, bop_dset=args.dataset, no_aug=True,
                    ignore_symmetry=False, kp_config_root=args.kp_config_root,
                    seed=0)

    @jax.jit
    def fwd(images, boxes, obj_mask, prior_uv, prior_mask):
        crops = roi_ops.roi_crop_batch(images, boxes, obj_mask, (256, 256))
        b, o = boxes.shape[:2]
        crops = crops.reshape((b * o,) + crops.shape[2:])
        phw = net.prior_hw((256, 256))
        prior = hm.render_prior_heatmaps(
            prior_uv.reshape(b * o, -1, 2), prior_mask.reshape(b * o, -1),
            hw=phw, sigma_px=hm.prior_sigma_for(phw))
        out = net.apply(variables, crops)
        return out.uv.reshape(b, o, -1, 2), out.cov.reshape(b, o, -1, 2, 2)

    errs, sigmas, chi2s = [], [], []
    n = min(len(ds), args.max_frames)
    for i in range(n):
        s = ds[i]
        batch = collate([s])
        uv, cov = fwd(
            jnp.asarray(batch["images"]), jnp.asarray(batch["boxes"]),
            jnp.asarray(batch["obj_mask"]), jnp.asarray(batch["prior_uv"]),
            jnp.asarray(batch["prior_mask"]),
        )
        uv, cov = np.asarray(uv)[0], np.asarray(cov)[0]
        gt, mask = batch["uv_gt"][0], batch["kp_mask"][0]
        res = gt - uv
        a, d = cov[..., 0, 0], cov[..., 1, 1]
        chi2 = cov_chi2(uv, cov, gt)
        errs.append(np.linalg.norm(res, axis=-1)[mask])
        sigmas.append(np.sqrt(0.5 * (a + d))[mask])
        chi2s.append(chi2[mask])
        print(f"[{i + 1}/{n}]", end="\r", flush=True)
    errs = np.concatenate(errs)
    sigmas = np.concatenate(sigmas)
    chi2s = np.concatenate(chi2s)
    pct = pct_inbounds(chi2s)
    msg = (f"{pct:.2f}% of {len(chi2s)} keypoint errors inside the 99% "
           f"chi2 bound of the predicted covariance")
    print("\n" + msg)
    with open(os.path.join(out_dir, "percent_sigma_inbounds.txt"), "w") as f:
        f.write(msg + "\n")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(6, 5))
    plt.scatter(sigmas, errs, s=2, alpha=0.3)
    lim = max(1e-3, float(np.percentile(sigmas, 99)))
    xs = np.linspace(0, lim, 50)
    plt.plot(xs, np.sqrt(CHI2_99_2DOF) * xs, "r-", label="99% bound")
    plt.xlabel("predicted sigma (NDC)")
    plt.ylabel("error (NDC)")
    plt.legend()
    plt.title(msg, fontsize=8)
    plt.savefig(os.path.join(out_dir, "sigma_plot.png"), dpi=120)
    print("Wrote", os.path.join(out_dir, "sigma_plot.png"))


if __name__ == "__main__":
    main()
