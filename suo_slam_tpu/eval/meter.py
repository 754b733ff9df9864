"""ADD / ADD-S / ADD(-S) pose-error metrics with PoseCNN-style AUC.

Rebuild of `lib/utils/eval_meter.py`. The point-distance computation — the
hot op is the ADD-S pairwise min distance, O(P^2) per object
(`eval_meter.py:241-242`) — runs as one jitted batched kernel over the dense
padded point clouds from `data.mesh.MeshDb.points_padded()`; the AUC
bookkeeping stays in numpy.

AUC convention: mm errors, 0.1 m cutoff, monotone precision envelope
(`compute_auc_posecnn`, `eval_meter.py:22-45`); per-object AUC averaging as
in DeepIM/CosyPose (`eval_meter.py:118-121`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def compute_auc_posecnn(errors) -> float:
    """Area under the accuracy-vs-threshold curve, threshold in [0, 0.1] m.

    Errors are in mm (converted internally); errors > 0.1 m count as never
    correct. Same algorithm as the reference (`eval_meter.py:22-45`).
    """
    errors = np.squeeze(np.asarray(errors, np.float64).copy()) * 1e-3
    errors = np.atleast_1d(errors)
    errors[errors > 0.1] = np.inf
    d = np.sort(errors)
    accuracy = np.cumsum(np.ones(d.shape[0])) / d.shape[0]
    finite = np.isfinite(d)
    if finite.sum() == 0:
        return 0.0
    d = d[finite]
    accuracy = accuracy[finite]
    mrec = np.concatenate(([0.0], d, [0.1]))
    mpre = np.concatenate(([0.0], accuracy, [accuracy[-1]]))
    for i in range(1, len(mpre)):
        mpre[i] = max(mpre[i], mpre[i - 1])
    ids = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(((mrec[ids] - mrec[ids - 1]) * mpre[ids]).sum() * 10.0)


class AverageMeter:
    """Numerically-stable running average (`eval_meter.py:47-63`)."""

    def __init__(self):
        self.avg = 0.0
        self.n = 0

    def update(self, x, k=1):
        self.n += k
        self.avg = ((self.n - k) * self.avg + x) / self.n

    def average(self):
        return self.avg


class AddAucMeter:
    """Per-class error accumulation -> AUC (`eval_meter.py:66-95`)."""

    def __init__(self, obj_avg=True):
        self.err_map: dict[int, list[float]] = {}
        self.obj_avg = obj_avg

    def update(self, obj_ids, errs):
        for obj_id, err in zip(obj_ids, errs):
            self.err_map.setdefault(int(obj_id), []).append(float(err))

    def average(self):
        assert self.err_map, "AddAucMeter.average() with no data"
        auc_map = {o: compute_auc_posecnn(e) for o, e in self.err_map.items()}
        if self.obj_avg:
            return sum(auc_map.values()) / len(auc_map), auc_map
        all_errs = [e for errs in self.err_map.values() for e in errs]
        return compute_auc_posecnn(all_errs), auc_map


@partial(jax.jit, static_argnames=())
def _add_dists_kernel(points, n_pts, T_pred, T_gt):
    """(mean ADD dist [B], mean ADD-S dist [B]) over padded point clouds.

    points: [B, P, 3]; n_pts: [B] valid counts; poses [B, 4, 4] or [B, 3, 4].
    ADD-S min runs over the full [B, P, P] distance tensor with padded
    columns masked to +inf and padded rows excluded from the mean.
    """
    mask = (
        jnp.arange(points.shape[1])[None, :] < n_pts[:, None]
    )  # [B, P]
    p_pred = jnp.einsum("bij,bpj->bpi", T_pred[:, :3, :3], points) + T_pred[:, None, :3, 3]
    p_gt = jnp.einsum("bij,bpj->bpi", T_gt[:, :3, :3], points) + T_gt[:, None, :3, 3]
    denom = jnp.maximum(n_pts.astype(points.dtype), 1.0)

    d_add = jnp.linalg.norm(p_gt - p_pred, axis=-1)  # [B, P]
    add = jnp.sum(jnp.where(mask, d_add, 0.0), -1) / denom

    d2 = jnp.sum(
        (p_gt[:, :, None, :] - p_pred[:, None, :, :]) ** 2, -1
    )  # [B, P(gt), P(pred)]
    d2 = jnp.where(mask[:, None, :], d2, jnp.inf)  # mask padded pred columns
    d_adds = jnp.sqrt(jnp.min(d2, axis=-1))
    adds = jnp.sum(jnp.where(mask, d_adds, 0.0), -1) / denom
    return add, adds


class EvalMeter:
    """ADD/ADD-S/ADD(-S) AUC meters over a MeshDb (`eval_meter.py:97-242`)."""

    def __init__(self, mesh_db, d=0.1):
        self.mesh_db = mesh_db
        self.d = d
        pts, cnt = mesh_db.points_padded()
        self._points = jnp.asarray(pts)
        self._counts = jnp.asarray(cnt)
        self.add_meter = AddAucMeter(obj_avg=True)
        self.adds_meter = AddAucMeter(obj_avg=True)
        self.add_maybe_s_meter = AddAucMeter(obj_avg=True)

    def update(self, obj_ids, poses_pred, poses_gt):
        obj_ids = [int(o) for o in obj_ids]
        idx = jnp.asarray([o - 1 for o in obj_ids])
        Tp = jnp.asarray(np.stack([_to44_np(p) for p in poses_pred]), jnp.float32)
        Tg = jnp.asarray(np.stack([_to44_np(p) for p in poses_gt]), jnp.float32)
        add, adds = _add_dists_kernel(self._points[idx], self._counts[idx], Tp, Tg)
        add = np.asarray(add)
        adds = np.asarray(adds)
        is_sym = self.mesh_db.is_symmetric[[o - 1 for o in obj_ids]]
        add_ms = np.where(is_sym, adds, add)
        self.add_meter.update(obj_ids, add.tolist())
        self.adds_meter.update(obj_ids, adds.tolist())
        self.add_maybe_s_meter.update(obj_ids, add_ms.tolist())

    def update_no_det(self, obj_ids):
        inf = [np.inf] * len(obj_ids)
        self.add_meter.update(obj_ids, inf)
        self.adds_meter.update(obj_ids, inf)
        self.add_maybe_s_meter.update(obj_ids, inf)

    def result(self):
        return {
            "AUC of ADD": self.add_meter.average(),
            "AUC of ADD-S": self.adds_meter.average(),
            "AUC of ADD(-S)": self.add_maybe_s_meter.average(),
        }

    def pprint_objs_str(self, gt_obj_map):
        def pad(s, w=22):
            s = str(s)
            return s + " " * max(0, w - len(s))

        ret = ""
        result = self.result()
        keys = ["AUC of ADD", "AUC of ADD-S"]
        ret += pad("") + "& "
        for i, k in enumerate(keys):
            ret += pad(k, 15) + ("" if i == len(keys) - 1 else "& ")
        ret += "\\\\\n"
        for obj_id in sorted(gt_obj_map):
            ret += pad(gt_obj_map[obj_id]) + "& "
            for i, k in enumerate(keys):
                _, per_obj = result[k]
                ret += pad(f"{100 * per_obj.get(obj_id, 0):.1f}", 15) + (
                    "" if i == len(keys) - 1 else "& "
                )
            ret += "\\\\\n"
        ret += pad("Mean") + "& "
        for i, k in enumerate(keys):
            avg, _ = result[k]
            ret += pad(f"{100 * avg:.1f}", 15) + ("" if i == len(keys) - 1 else "& ")
        ret += "\n\n"
        ret += f'AUC of ADD(-S): {100 * result["AUC of ADD(-S)"][0]:.1f}\n'
        return ret

    def pprint(self):
        for k, v in self.result().items():
            print(f"{k}: {v[0]}")


def _to44_np(T):
    out = np.eye(4, dtype=np.float32)
    T = np.asarray(T)
    out[: T.shape[0], :] = T
    return out
