"""Batched single-view evaluation: windowed network precompute.

`evaluate.py --nviews 1` scores every keyframe independently (the PVNet-style
protocol, reference `evaluate.py:196-198`); the network sees one frame's
object bucket per dispatch, so the sweep is bound by per-view dispatch
latency, not by the chip's large-batch throughput (bench.py). Single-view
mode never feeds priors (`lib/object_slam.py:361-362`) and never shares state
across views, so the network stage factors out exactly: this runner
precomputes a WINDOW of upcoming views' keypoint predictions in one chunked
jitted call (`slam.kernels.make_batch_inference`), and the untouched SLAM
engine consumes them through its `infer_fn` injection point — PnP, filtering,
BA, and result collection stay byte-for-byte the engine's own. With a
persisted int8 scales sidecar the cached outputs are bit-identical to the
per-frame path (same executor, same scales; the batch dimension does not
enter per-sample math).
"""

from __future__ import annotations

import numpy as np

from ..slam.engine import MIN_PAD_BOX


class BatchedSingleViewRunner:
    """Window prefetcher + engine infer_fn for `--nviews 1 --batched`.

    load_inputs(scene_id, view_id) -> (obj_ids, bboxes, sample) | None is
    the evaluator's per-view detection/sample loader; infer_batch_fn is a
    `make_batch_inference` callable. `get()` returns the cached entry for a
    view (precomputing the next `window` views on a miss) and arms the
    engine-side `infer_fn` to serve that view's outputs.
    """

    def __init__(self, infer_batch_fn, load_inputs, window=16, obj_slots=8,
                 bbox_inflate=0.0):
        self._fn = infer_batch_fn
        self._load = load_inputs
        self.window = int(window)
        self.obj_slots = int(obj_slots)
        self.bbox_inflate = float(bbox_inflate)
        self._plan: list[tuple[int, int]] = []
        self._cache: dict[tuple[int, int], dict | None] = {}
        self._current: dict | None = None

    def set_plan(self, scene_id, view_ids):
        """Declare the upcoming view order for one scene."""
        self._plan = [(int(scene_id), int(v)) for v in view_ids]
        self._cache.clear()
        self._current = None

    # ---------------------------------------------------------- precompute --
    def _precompute_from(self, key):
        try:
            start = self._plan.index(key)
        except ValueError:
            raise KeyError(f"view {key} not in the declared plan")
        todo = [k for k in self._plan[start : start + self.window]
                if k not in self._cache]
        loaded = []
        for sc, vw in todo:
            ent = self._load(sc, vw)
            self._cache[(sc, vw)] = None if ent is None else {
                "obj_ids": ent[0], "bboxes": ent[1], "sample": ent[2],
            }
            if ent is not None:
                loaded.append((sc, vw))
        if not loaded:
            return
        # fixed window height: a partial last window pads with invalid rows
        # instead of compiling a new program shape
        g = self.window
        # power-of-2 slot bucket over the window's max detection count: a
        # handful of jit shapes, no fixed capacity to overflow, minimal
        # padding waste
        max_of = max(len(self._cache[k]["obj_ids"]) for k in loaded)
        o = self.obj_slots
        while o < max_of:
            o *= 2
        sample0 = self._cache[loaded[0]]["sample"]
        h, w = sample0["img"].shape[:2]
        imgs = np.zeros((g, h, w, 3), np.float32)
        boxes = np.zeros((g, o, 4), np.float32)
        boxes[..., 2:] = MIN_PAD_BOX
        valid = np.zeros((g, o), bool)
        for i, k in enumerate(loaded):
            ent = self._cache[k]
            of = len(ent["obj_ids"])
            imgs[i] = ent["sample"]["img"]
            bx = np.asarray(ent["bboxes"], np.float32).copy()
            # the engine inflates before inference (`engine.process_view`);
            # crops must match what its own network call would see
            bx[:, :2] *= 1.0 - self.bbox_inflate
            bx[:, 2:] *= 1.0 + self.bbox_inflate
            boxes[i, :of] = bx
            valid[i, :of] = True
        uv, cov, mask = self._fn(
            np.asarray(imgs), np.asarray(boxes), np.asarray(valid)
        )
        uv, mask = np.asarray(uv), np.asarray(mask)
        cov = None if cov is None else np.asarray(cov)
        for i, k in enumerate(loaded):
            ent = self._cache[k]
            of = len(ent["obj_ids"])
            ent["out"] = (
                uv[i, :of],
                None if cov is None else cov[i, :of],
                mask[i, :of],
            )
            ent["boxes_infl"] = boxes[i, :of].copy()

    # --------------------------------------------------------------- serve --
    def get(self, scene_id, view_id):
        """Entry for one view (obj_ids/bboxes/sample + cached outputs), or
        None when the view has no usable detections. Arms `infer_fn`."""
        key = (int(scene_id), int(view_id))
        if key not in self._cache:
            self._precompute_from(key)
        ent = self._cache.pop(key)
        self._current = ent
        return ent

    def infer_fn(self, img, boxes, obj_valid, prior_uv, prior_valid,
                 has_prior=True):
        """Engine-side inference: serves the armed view's cached outputs,
        padded to the engine's bucket shape."""
        ent = self._current
        if ent is None or "out" not in ent:
            raise RuntimeError(
                "batched infer_fn called with no precomputed view armed — "
                "call get(scene_id, view_id) before engine.process_view"
            )
        uv, cov, mask = ent["out"]
        of = uv.shape[0]
        ob = np.asarray(boxes).shape[0]
        # order/content guard: the engine must be asking about the same crops
        np.testing.assert_allclose(
            np.asarray(boxes)[:of], ent["boxes_infl"], atol=1e-3,
            err_msg="engine boxes do not match the precomputed view",
        )
        pad = lambda a: np.concatenate(
            [a, np.zeros((ob - of,) + a.shape[1:], a.dtype)], 0
        ) if ob > of else a[:ob]
        return (
            pad(uv),
            None if cov is None else pad(cov),
            pad(mask),
        )

    # The engine probes this attr on the callable it was handed (a bound
    # method forwards attribute lookups to __func__, NOT to the class, so
    # it must live on the function). Cached outputs already honor
    # prior-lessness — single-view mode never feeds priors.
    infer_fn.supports_no_prior = True
