#!/usr/bin/env python
"""Scene-pipelined full-SLAM evaluation throughput (sequential vs --pipeline_scenes).

Builds a synthetic multi-scene BOP fixture, writes a random-weight full-size
checkpoint, and times the COMPLETE `Evaluator` full-SLAM sweep
(`--nviews -1`) twice: the reference-shaped sequential scene loop vs the
scene-pipelined mode (eval/pipeline.py — K per-scene engines in lockstep,
their per-frame network calls batched into one multi-frame dispatch).
Outputs are identical between the modes (tests/test_pipelined_eval.py); this
measures the wall-clock difference. Each mode is timed on its SECOND pass so
compile time (persistent-cached anyway) stays out of the number.

Prints ONE JSON line. Env knobs: SUO_PIPE_SCENES (default 8), SUO_PIPE_VIEWS
(views/scene, default 12), SUO_PIPE_K (workers, default = scenes),
SUO_PIPE_INT8=1 (int8 executor; a scales sidecar is calibrated and persisted
UNTIMED first — the serving configuration, and the config whose pipelined
outputs are exactly equal to sequential — so the timed sweeps measure
steady-state serving, not per-run calibration/quantization), SUO_TB_TINY=1
(tiny net, CI smoke).
"""

import contextlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (probe/retry + lock + outage shield)

N_SCENES = int(os.environ.get("SUO_PIPE_SCENES", "8"))
N_VIEWS = int(os.environ.get("SUO_PIPE_VIEWS", "12"))
K = int(os.environ.get("SUO_PIPE_K", str(N_SCENES)))
INT8 = bool(int(os.environ.get("SUO_PIPE_INT8", "0")))


def run():
    import jax

    from suo_slam_tpu.utils.jit_cache import enable_jit_cache

    enable_jit_cache()
    bench.force_cpu_if_allowed()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tests"))
    from helpers.synthetic_bop import write_synthetic_bop

    work = tempfile.mkdtemp(prefix="suo_pipe_bench_")
    try:
        ds_root = os.path.join(work, "bop_datasets", "ycbv")
        write_synthetic_bop(ds_root, n_scenes=N_SCENES, n_views=N_VIEWS)
        os.symlink(os.path.join(ds_root, "models_bop-compat"),
                   os.path.join(ds_root, "models_bop-compat_eval"),
                   target_is_directory=True)

        # random-weight checkpoint at the flagship architecture (timing is
        # weight-independent; parity of OUTPUTS is pinned by the tests)
        import jax.numpy as jnp

        from suo_slam_tpu.models import PkpNet
        from suo_slam_tpu.train import checkpoint as ckpt
        from suo_slam_tpu.train import harness

        tiny = bool(int(os.environ.get("SUO_TB_TINY", "0")))
        net = PkpNet(
            norm="batch",
            **(dict(n_stack=1, n_modules=1, features=16) if tiny else {}),
        )
        state = harness.init_state(net, jax.random.PRNGKey(0),
                                   harness.make_optimizer())
        ck_dir = os.path.join(work, "results", "pkpnet_bench")
        ckpt.save_checkpoint(ck_dir, state, 0, {"norm": "batch"}, float("inf"))
        ck_path = os.path.join(ck_dir, "checkpoint-latest")
        if tiny:
            os.environ["SUO_TINY_NET"] = "1"

        if INT8:
            # persist the calibration sidecar (untimed): evaluate.py --int8
            # auto-detects it next to the checkpoint, so both timed sweeps
            # run the steady-state serving path with identical scales
            import importlib.util as _ilu

            cspec = _ilu.spec_from_file_location(
                "suo_calibrate_cli", os.path.join(repo, "calibrate_int8.py"))
            cmod = _ilu.module_from_spec(cspec)
            cspec.loader.exec_module(cmod)
            cmod.main([
                "--dataset", "ycbv", "--data_root", ds_root,
                "--checkpoint_path", ck_path,
                "--kp_config_root", os.path.join(ds_root, "kp_configs"),
                "--n_frames", "8",
            ])

        sys.argv = ["evaluate.py"]
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "suo_evaluate_cli", os.path.join(repo, "evaluate.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        def timed_sweep(pipeline_scenes):
            best = None
            for _ in range(2):  # second pass: compiles out of the number
                ev = mod.Evaluator(
                    "ycbv", ds_root, ck_path, nviews=-1, detection_type="gt",
                    no_viz=True, int8=INT8,
                    kp_config_root=os.path.join(ds_root, "kp_configs"),
                    pipeline_scenes=pipeline_scenes,
                )
                t0 = time.perf_counter()
                with contextlib.redirect_stdout(sys.stderr):
                    summary = ev.run()
                dt = time.perf_counter() - t0
                assert summary is not None and "ours" in summary, summary
                best = dt
            return best

        cwd = os.getcwd()
        os.chdir(work)
        try:
            seq_s = timed_sweep(0)
            pipe_s = timed_sweep(K)
        finally:
            os.chdir(cwd)

        frames = N_SCENES * N_VIEWS
        print(json.dumps({
            "metric": "slam_eval_scene_pipeline_speedup",
            "value": round(seq_s / pipe_s, 2),
            "unit": "x",
            "seq_s": round(seq_s, 2),
            "pipe_s": round(pipe_s, 2),
            "seq_fps": round(frames / seq_s, 1),
            "pipe_fps": round(frames / pipe_s, 1),
            "scenes": N_SCENES, "views": N_VIEWS, "workers": K,
            "int8": INT8,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main():
    bench.guarded_run(run, "slam_eval_scene_pipeline_speedup", unit="x")


if __name__ == "__main__":
    main()
