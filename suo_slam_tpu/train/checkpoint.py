"""Checkpoint save/load with the reference's directory contract.

Mirrors `train.py:166-181,201-227,349-355`: results dirs named
`results/pkpnet_<dataset>_<split>_<ext>_<MM-DD-YYYY@HH-MM-SS>/` holding
`checkpoint-<epoch>` + `checkpoint-latest` + `model_best` files with
`{args, epoch, model, best_val, optimizer}` — here serialized with flax
msgpack instead of torch pickle, and args as a JSON sidecar inside the
payload for provenance.
"""

from __future__ import annotations

import json
import os
import re
import time

import jax
import numpy as np
from flax import serialization


def output_dir_name(dataset: str, split: str, ext: str = "") -> str:
    stamp = time.strftime("%m-%d-%Y@%H-%M-%S")
    parts = ["pkpnet", dataset, split.replace("+", "-")]
    if ext:
        parts.append(ext)
    return "_".join(parts) + "_" + stamp


def find_resume_dir(results_root: str, dataset: str, split: str, ext: str = "") -> str | None:
    """Newest matching results dir (timestamp-sorted), like `train.py:201-227`."""
    if not os.path.isdir(results_root):
        return None
    prefix = "_".join(["pkpnet", dataset, split.replace("+", "-")] + ([ext] if ext else []))
    pat = re.compile(re.escape(prefix) + r"_(\d{2}-\d{2}-\d{4}@\d{2}-\d{2}-\d{2})$")
    best, best_t = None, None
    for name in os.listdir(results_root):
        m = pat.match(name)
        if not m:
            continue
        t = time.strptime(m.group(1), "%m-%d-%Y@%H-%M-%S")
        if (best_t is None or t > best_t) and os.path.exists(
            os.path.join(results_root, name, "checkpoint-latest")
        ):
            best, best_t = os.path.join(results_root, name), t
    return best


def save_checkpoint(outdir: str, state, epoch: int, args: dict, best_val: float,
                    is_best: bool = False, best_train: float = float("inf")):
    """state: train.harness.TrainState (params + opt_state + step + rng).

    `best_train` is the no-val fallback selection metric; persisting it keeps
    is_best meaningful across auto-resume (a fresh-process inf would mark the
    first post-resume epoch best even when it is worse).
    """
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "rng": np.asarray(state.rng),
        "epoch": np.asarray(epoch),
        "best_val": np.asarray(best_val, np.float64),
        "best_train": np.asarray(best_train, np.float64),
        "args_json": json.dumps(args),
    }
    data = serialization.to_bytes(payload)
    # Small sidecar with the scalar/args fields so peek_* and resume don't
    # msgpack-decode the whole payload (params + opt state, order of GB at
    # flagship scale) just to read provenance.
    meta = json.dumps({
        "epoch": int(epoch),
        "best_val": float(best_val),
        "best_train": float(best_train),
        "args": args,
    })
    os.makedirs(outdir, exist_ok=True)
    for name in [f"checkpoint-{epoch}", "checkpoint-latest"] + (
        ["model_best"] if is_best else []
    ):
        tmp = os.path.join(outdir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(outdir, name))
        mtmp = os.path.join(outdir, name + ".meta.json.tmp")
        with open(mtmp, "w") as f:
            f.write(meta)
        os.replace(mtmp, os.path.join(outdir, name + ".meta.json"))


def _read_meta(path: str) -> dict | None:
    """The save-time meta sidecar for a checkpoint file, or None when the
    checkpoint predates sidecars (callers fall back to the full parse)."""
    try:
        with open(path + ".meta.json") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def load_checkpoint(path: str, state_template):
    """Returns (TrainState, epoch, args_dict, best_val, best_train).

    state_template: a TrainState with the right pytree structure/shapes
    (from `harness.init_state`). Tolerant of checkpoints written before a
    scalar field existed (restores the per-subtree state dicts instead of
    requiring an exact top-level key set): `best_train` defaults to inf.
    """
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.msgpack_restore(data)
    state = state_template._replace(
        params=serialization.from_state_dict(state_template.params, payload["params"]),
        batch_stats=serialization.from_state_dict(
            state_template.batch_stats, payload["batch_stats"]
        ),
        opt_state=serialization.from_state_dict(
            state_template.opt_state, payload["opt_state"]
        ),
        step=jax.numpy.asarray(payload["step"]),
        rng=jax.numpy.asarray(payload["rng"]),
    )
    args = json.loads(payload.get("args_json", "") or "{}")
    best_train = float(np.asarray(payload.get("best_train", np.inf)))
    return (state, int(payload["epoch"]), args, float(payload["best_val"]),
            best_train)


def peek_checkpoint_scalar(path: str, key: str):
    """A top-level scalar field from a checkpoint (None if absent) without
    needing a state template — e.g. 'best_val', 'best_train', 'epoch'.
    Reads the meta sidecar when present; full msgpack parse otherwise."""
    meta = _read_meta(path)
    if meta is not None:
        return float(meta[key]) if key in meta else None
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.msgpack_restore(data)
    if key not in payload:
        return None
    return float(np.asarray(payload[key]))


def peek_checkpoint_args(path: str) -> dict:
    """Training-args provenance dict stored in a checkpoint ({} if absent).

    Lets eval auto-detect architecture choices (e.g. `norm`) recorded at
    train time before constructing the net, so a flag mismatch cannot load
    a checkpoint into the wrong architecture. Reads the meta sidecar when
    present; full msgpack parse otherwise."""
    meta = _read_meta(path)
    if meta is not None:
        return meta.get("args", {}) or {}
    with open(path, "rb") as f:
        data = f.read()
    payload = serialization.msgpack_restore(data)
    return json.loads(payload.get("args_json", "") or "{}")


def load_model_only(path: str, variables_template):
    """For eval / --pretrain: the model variables (params [+ batch_stats]).

    variables_template: dict like `net.init(...)` returns.
    Returns (variables, epoch, args).
    """
    with open(path, "rb") as f:
        data = f.read()
    # tolerant partial restore: parse full dict, take the model subtrees
    payload = serialization.msgpack_restore(data)
    variables = {
        "params": serialization.from_state_dict(
            variables_template["params"], payload["params"]
        )
    }
    if "batch_stats" in variables_template and payload.get("batch_stats"):
        variables["batch_stats"] = serialization.from_state_dict(
            variables_template["batch_stats"], payload["batch_stats"]
        )
    epoch = int(np.asarray(payload.get("epoch", -1)))
    args = json.loads(payload.get("args_json", "") or "{}")
    return variables, epoch, args
