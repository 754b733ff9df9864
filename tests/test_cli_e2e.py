"""End-to-end CLI tests: train a tiny run and evaluate on the synthetic BOP
fixture, exercising the full reference surface (train.py / evaluate.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers.synthetic_bop import write_synthetic_bop

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def bop_layout(tmp_path_factory):
    """BOP-style layout: <root>/bop_datasets/ycbv/... like the reference."""
    root = tmp_path_factory.mktemp("bop_layout")
    ds_root = root / "bop_datasets" / "ycbv"
    write_synthetic_bop(str(ds_root), n_scenes=1, n_views=4)
    # evaluate expects models_bop-compat_eval for ycbv; symlink to models dir
    os.symlink(
        ds_root / "models_bop-compat", ds_root / "models_bop-compat_eval",
        target_is_directory=True,
    )
    return str(ds_root)


def _run(cmd, cwd, extra_env=None):
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    if extra_env:
        env.update(extra_env)
    res = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=900
    )
    assert res.returncode == 0, f"cmd failed:\n{res.stdout[-4000:]}\n{res.stderr[-4000:]}"
    return res


def test_evaluate_single_view_gt_kp(bop_layout, tmp_path):
    """evaluate.py --nviews 1 --debug_gt_kp on the fixture: near-perfect AUC."""
    cmd = [
        sys.executable, os.path.join(REPO, "evaluate.py"),
        "--nviews", "1", "--debug_gt_kp", "--dataset", "ycbv",
        "--data_root", bop_layout,
        "--kp_config_root", os.path.join(bop_layout, "kp_configs"),
        "--checkpoint_path", "",
        "--do_viz_extra", "--viz_cov",
    ]
    res = _run(cmd, cwd=str(tmp_path))
    out = res.stdout
    assert "AUC of ADD(-S)" in out
    # summary.txt written in the method outdir
    outdirs = [
        d for d in (tmp_path / "results").iterdir() if d.is_dir()
    ] if (tmp_path / "results").exists() else []
    summary_files = list((tmp_path).rglob("summary.txt"))
    assert summary_files, out
    txt = summary_files[0].read_text()
    assert "AUC" in txt
    csvs = list(tmp_path.rglob("pkpnet-*.csv"))
    assert csvs
    # BOP'19 row: scene_id,im_id,obj_id,score,R(9 space-sep),t(3 space-sep),time
    lines = csvs[0].read_text().strip().splitlines()
    assert lines and len(lines[0].split(",")) == 7
    assert len(lines[0].split(",")[4].split()) == 9
    assert len(lines[0].split(",")[5].split()) == 3
    # Mean AUC should be high with GT keypoints
    import re

    m = re.search(r"AUC of ADD\(-S\): ([\d.]+)", out)
    assert m and float(m.group(1)) > 80.0, out
    # viz images written (3-panel frame visualizations)
    viz = list(tmp_path.rglob("viz_images/*.png"))
    assert viz, out
    # --do_viz_extra: per-object figure panels in a per-frame subdir
    # (`evaluate.py:222-229` in the reference)
    extra = list(tmp_path.rglob("viz_images/scene_*/bbox_input.png"))
    assert extra, out
    assert list(extra[0].parent.glob("viz_obj_*_output.png")), out


def test_evaluate_slam_mode_gt_kp(bop_layout, tmp_path):
    cmd = [
        sys.executable, os.path.join(REPO, "evaluate.py"),
        "--nviews", "-1", "--debug_gt_kp", "--dataset", "ycbv",
        "--data_root", bop_layout,
        "--kp_config_root", os.path.join(bop_layout, "kp_configs"),
        "--checkpoint_path", "",
    ]
    res = _run(cmd, cwd=str(tmp_path))
    out = res.stdout
    assert "% of camera poses found" in out
    import re

    m = re.search(r"AUC of ADD\(-S\): ([\d.]+)", out)
    assert m and float(m.group(1)) > 80.0, out
    m = re.search(r"NOTE: ([\d.]+)% of camera poses found", out)
    assert m and float(m.group(1)) == 100.0, out


@pytest.mark.slow  # subprocess with its own jax import + compile
def test_train_throughput_bench_smoke(tmp_path):
    """benchmarks/train_throughput.py emits one valid JSON line (tiny net,
    CPU smoke of the script the TPU battery runs unattended)."""
    env = os.environ.copy()
    env.update(SUO_TB_TINY="1", SUO_TB_BATCH="1", SUO_TB_OBJ="2",
               SUO_TB_STEPS="2", SUO_BENCH_ALLOW_CPU="1",
               PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks/train_throughput.py")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    row = json.loads(res.stdout.strip().splitlines()[-1])
    assert row["metric"] == "train_step_throughput" and row["value"] > 0


@pytest.mark.slow  # subprocess with its own jax import + compile
def test_train_roofline_bench_smoke(tmp_path):
    """benchmarks/train_roofline.py emits one valid JSON line with the
    floor decomposition fields (tiny net, CPU smoke)."""
    env = os.environ.copy()
    env.update(SUO_TR_TINY="1", SUO_TR_STEPS="2", SUO_BENCH_ALLOW_CPU="1",
               PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks/train_roofline.py")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    row = json.loads(res.stdout.strip().splitlines()[-1])
    assert row["metric"] == "train_step_roofline" and row["value"] > 0
    for key in ("nogather_ms", "fwd_only_ms", "floor_compute_ms", "sweep"):
        assert key in row, row
    assert len(row["sweep"]) >= 2


@pytest.mark.slow  # subprocess with its own jax import + engine compiles
def test_soak_memory_bench_smoke(tmp_path):
    """benchmarks/soak_memory.py runs a short sequence and reports RSS
    telemetry (CPU smoke of the soak battery)."""
    env = os.environ.copy()
    env.update(SUO_SM_TINY="1", SUO_SM_CPU="1", PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks/soak_memory.py")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    row = json.loads(res.stdout.strip().splitlines()[-1])
    assert row["metric"] == "soak_memory" and row["views"] == 60
    assert row["rss_mb"] and row["median_frame_ms_late"] > 0


def test_train_val_best_then_int8_eval(bop_layout, tmp_path):
    """Opt-in val-selection story: train (norm=batch default) with the
    held-out validation epoch driving model_best/best.txt/viz_best (via
    --val_select_best — off by default since the val split is the eval
    split), calibrate int8 scales offline into the checkpoint sidecar, then
    run `evaluate.py --int8` which auto-detects it."""
    kp_root = os.path.join(bop_layout, "kp_configs")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", kp_root,
        "--data_split", "synt", "--batch_size", "2", "--truncate_obj", "3",
        "--epochs", "2", "--steps_per_epoch", "2", "--no_bf16",
        "--val_steps", "2", "--val_start_epoch", "0", "--no_resume",
        "--val_select_best",
    ]
    env = {"SUO_TINY_NET": "1"}
    res = _run(cmd, cwd=str(tmp_path), extra_env=env)
    assert "val uv_loss" in res.stdout
    best = list(tmp_path.rglob("model_best"))
    assert best, res.stdout[-2000:]
    best_txt = list(tmp_path.rglob("best.txt"))
    assert best_txt and "val_err=" in best_txt[0].read_text()
    assert list(tmp_path.rglob("viz_best/*.png")), res.stdout[-2000:]

    # offline int8 calibration -> sidecar next to the checkpoint
    cmd_cal = [
        sys.executable, os.path.join(REPO, "calibrate_int8.py"),
        "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", kp_root, "--checkpoint_path", str(best[0]),
        "--n_frames", "3", "--batch_size", "4", "--no_bf16",
    ]
    res_cal = _run(cmd_cal, cwd=str(tmp_path), extra_env=env)
    sidecar = best[0].parent / (best[0].name + ".int8_scales.npz")
    assert sidecar.is_file(), res_cal.stdout[-2000:]
    assert "saved" in res_cal.stdout and "activation scales" in res_cal.stdout

    cmd2 = [
        sys.executable, os.path.join(REPO, "evaluate.py"),
        "--nviews", "1", "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", kp_root, "--checkpoint_path", str(best[0]),
        "--int8", "--no_viz", "--detection_type", "gt", "--no_bf16",
    ]
    def read_csv_rows(pat="nviews=1-"):
        # outdir sits next to the checkpoint (model_path), shared by runs
        csvs = [p for p in tmp_path.rglob("pkpnet-*.csv") if pat in p.name]
        assert len(csvs) == 1, csvs
        return {
            tuple(l.split(",")[:3]): l
            for l in csvs[0].read_text().strip().splitlines()
        }

    res2 = _run(cmd2, cwd=str(tmp_path), extra_env=env)
    assert "int8 scales sidecar" in res2.stdout, res2.stdout[-2000:]
    assert "AUC of ADD(-S)" in res2.stdout, res2.stdout[-2000:]
    rows_seq = read_csv_rows()

    # --batched (windowed network precompute) must reproduce the sequential
    # single-view results: same engine semantics, same sidecar scales
    res3 = _run(cmd2 + ["--batched", "--eval_window", "3"],
                cwd=str(tmp_path), extra_env=env)
    assert "AUC of ADD(-S)" in res3.stdout, res3.stdout[-2000:]
    import re

    auc_seq = float(re.search(r"AUC of ADD\(-S\): ([\d.]+)", res2.stdout).group(1))
    auc_bat = float(re.search(r"AUC of ADD\(-S\): ([\d.]+)", res3.stdout).group(1))
    assert abs(auc_seq - auc_bat) < 0.5, (auc_seq, auc_bat)
    # pose-level parity via the BOP CSVs
    rows = [rows_seq, read_csv_rows()]
    assert rows[0].keys() == rows[1].keys()
    for k in rows[0]:
        a = np.fromstring(rows[0][k].split(",")[4], sep=" ")
        b = np.fromstring(rows[1][k].split(",")[4], sep=" ")
        np.testing.assert_allclose(a, b, atol=5e-2, err_msg=f"R row {k}")

    # full-SLAM (--nviews -1) with the SAME int8 sidecar: the
    # scene-pipelined sweep must reproduce the sequential sweep's BOP CSV
    # EXACTLY — same executor, same persisted scales, engines reseed per
    # reset (the serving-path exactness claim in docs/SERVING.md). Both
    # runs share the method outdir, so capture the CSV between them.
    cmd_slam = [
        sys.executable, os.path.join(REPO, "evaluate.py"),
        "--nviews", "-1", "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", kp_root, "--checkpoint_path", str(best[0]),
        "--int8", "--no_viz", "--detection_type", "gt", "--no_bf16",
    ]
    res_s = _run(cmd_slam, cwd=str(tmp_path), extra_env=env)
    assert "int8 scales sidecar" in res_s.stdout, res_s.stdout[-2000:]
    rows_slam_seq = read_csv_rows("nviews=-1")
    res_p = _run(cmd_slam + ["--pipeline_scenes", "2"],
                 cwd=str(tmp_path), extra_env=env)
    assert "Pipelining" in res_p.stdout, res_p.stdout[-2000:]
    assert read_csv_rows("nviews=-1") == rows_slam_seq


def test_train_smoke_and_resume(bop_layout, tmp_path):
    """2-epoch tiny training run, then auto-resume for 1 more epoch.

    Also covers the two resume-correctness fixes: (a) the no-val fallback
    selection metric (best_train) persists in the checkpoint, so the first
    post-resume epoch is NOT automatically marked best against a fresh inf;
    (b) default selection is train-loss driven — no best.txt (a val-split
    artifact) is ever written without --val_select_best."""
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", os.path.join(bop_layout, "kp_configs"),
        "--data_split", "synt", "--batch_size", "2", "--truncate_obj", "3",
        "--epochs", "2", "--steps_per_epoch", "2", "--no_bf16",
    ]
    env = {"SUO_TINY_NET": "1"}
    res = _run(cmd, cwd=str(tmp_path), extra_env=env)
    assert "Epoch 1 done" in res.stdout
    ckpts = list(tmp_path.rglob("checkpoint-latest"))
    assert ckpts
    # default selection: model_best exists (train-loss driven), best.txt
    # (val-selection artifact) does not
    assert list(tmp_path.rglob("model_best"))
    assert not list(tmp_path.rglob("best.txt"))
    # best_train persisted in the checkpoint
    from suo_slam_tpu.train import checkpoint as ckpt_mod

    best_train_saved = ckpt_mod.peek_checkpoint_scalar(str(ckpts[0]), "best_train")
    assert best_train_saved is not None and best_train_saved < float("inf")
    # resume picks up from epoch 2
    cmd[cmd.index("--epochs") + 1] = "3"
    res2 = _run(cmd, cwd=str(tmp_path), extra_env=env)
    assert "Auto-resuming" in res2.stdout
    assert "Epoch 2 done" in res2.stdout and "Epoch 1 done" not in res2.stdout


def test_eval_all_ycbv_sweep_script(bop_layout, tmp_path):
    """Drive the ACTUAL shipped shell sweep (`scripts/eval_all_ycbv.sh` —
    rebuild of the reference 5-method sweep,
    `/root/reference/scripts/eval_all_ycbv.sh:21-51`) end-to-end against the
    synthetic fixture: single-view, SLAM, no-prior, no-cov, gt-cam-pose,
    then the table.txt aggregation. Catches script-level breakage (arg
    plumbing, outdir globs, aggregation) that driving evaluate.py directly
    cannot."""
    kp_root = os.path.join(bop_layout, "kp_configs")
    env = {"SUO_TINY_NET": "1"}
    # tiny checkpoint for the sweep to load
    _run([
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", kp_root,
        "--data_split", "synt", "--batch_size", "2", "--truncate_obj", "3",
        "--epochs", "1", "--steps_per_epoch", "1", "--no_bf16", "--no_val",
        "--no_resume",
    ], cwd=str(tmp_path), extra_env=env)
    ckpt = list(tmp_path.rglob("model_best"))[0]

    res = _run([
        "bash", os.path.join(REPO, "scripts", "eval_all_ycbv.sh"), str(ckpt),
        "--data_root", bop_layout, "--kp_config_root", kp_root,
        "--detection_type", "gt", "--no_viz", "--no_bf16",
    ], cwd=str(tmp_path), extra_env=env)
    table = ckpt.parent / "table.txt"
    assert table.is_file(), res.stdout[-3000:]
    txt = table.read_text()
    # one summary section per sweep method, each with the AUC table
    for tag in ["nviews=1", "nviews=-1-det=gt_ycbv", "NO-PRIOR-DET",
                "NO-COV", "GT-CAM-POSE"]:
        assert any(tag in line for line in txt.splitlines()
                   if line.startswith("====")), (tag, txt[:2000])
    assert txt.count("AUC of ADD(-S)") == 5, txt.count("AUC of ADD(-S)")


def test_train_resume_overrides_arch_flags(bop_layout, tmp_path):
    """Auto-resume must rebuild the net with the checkpoint's recorded
    architecture (norm), not the CLI default — a --norm default flip would
    otherwise make the restore fail against the wrong parameter template."""
    kp_root = os.path.join(bop_layout, "kp_configs")
    base = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "ycbv", "--data_root", bop_layout,
        "--kp_config_root", kp_root,
        "--data_split", "synt", "--batch_size", "2", "--truncate_obj", "3",
        "--epochs", "1", "--steps_per_epoch", "1", "--no_bf16",
    ]
    env = {"SUO_TINY_NET": "1"}
    _run(base + ["--norm", "group"], cwd=str(tmp_path), extra_env=env)
    # resume WITHOUT --norm (default batch): must pick up group from the ckpt
    res = _run(base[: base.index("--epochs")] + ["--epochs", "2",
               "--steps_per_epoch", "1", "--no_bf16"],
               cwd=str(tmp_path), extra_env=env)
    assert "overriding --norm=batch with the checkpoint's recorded 'group'" \
        in res.stdout, res.stdout[-2000:]
    assert "Epoch 1 done" in res.stdout


@pytest.fixture(scope="session")
def tless_layout(tmp_path_factory):
    """T-LESS BOP layout (models_cad, train/test_primesense, targets json)."""
    root = tmp_path_factory.mktemp("tless_layout") / "bop_datasets" / "tless"
    write_synthetic_bop(str(root), n_scenes=1, n_views=3, bop_dset="tless")
    return str(root)


def test_eval_all_tless_sweep_script(tless_layout, tmp_path):
    """Drive the ACTUAL shipped T-LESS sweep (`scripts/eval_all_tless.sh` —
    rebuild of the reference 4-method sweep,
    `/root/reference/scripts/eval_all_tless.sh:21-31`) end-to-end: train a
    tiny net on train_primesense, then single-view, SLAM, no-prior, no-cov —
    each with the VSD scoring path — and the table_tless.txt aggregation of
    BOTH summary.txt and vsd_summary.txt per method. The ycbv twin covers
    the AUC table path; this covers the T-LESS-specific pieces (targets-json
    indexing at script level, per-method VSD summaries, the tless outdir
    glob)."""
    kp_root = os.path.join(tless_layout, "kp_configs")
    env = {"SUO_TINY_NET": "1"}
    _run([
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", "tless", "--data_root", tless_layout,
        "--kp_config_root", kp_root,
        "--batch_size", "2", "--truncate_obj", "3",
        "--epochs", "1", "--steps_per_epoch", "1", "--no_bf16", "--no_val",
        "--no_resume",
    ], cwd=str(tmp_path), extra_env=env)
    ckpt = list(tmp_path.rglob("model_best"))[0]

    res = _run([
        "bash", os.path.join(REPO, "scripts", "eval_all_tless.sh"), str(ckpt),
        "--data_root", tless_layout, "--kp_config_root", kp_root,
        "--detection_type", "gt", "--no_viz", "--no_bf16",
    ], cwd=str(tmp_path), extra_env=env)
    table = ckpt.parent / "table_tless.txt"
    assert table.is_file(), res.stdout[-3000:]
    txt = table.read_text()
    # one summary.txt + one vsd_summary.txt section per sweep method
    for tag in ["nviews=1", "nviews=-1-det=gt", "NO-PRIOR-DET", "NO-COV"]:
        assert any(tag in line for line in txt.splitlines()
                   if line.startswith("====")), (tag, txt[:2000])
    assert txt.count("==== ") == 8, txt
    assert txt.count("Mean object recall") == 4, txt
