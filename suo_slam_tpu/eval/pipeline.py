"""Scene-pipelined full-SLAM evaluation: cross-scene network batching.

`evaluate.py --nviews -1` runs scenes strictly sequentially in the reference
(`evaluate.py:178-180`); each frame's network call carries only that frame's
object bucket (~8 crops), so the sweep is bound by per-dispatch latency, not
by the chip's large-batch throughput (BENCHMARKS.md: 8-crop latency 1.88 ms
vs 23 ms for 128 crops — 16x more crops for 12x the time). Scenes are
independent SLAM problems, so they pipeline: K scenes run in lockstep on K
worker threads, each with its OWN engine (state, priors, BA graph), and a
`BatchingInferServer` collects one pending network request per live scene
and serves them all in ONE multi-frame dispatch
(`slam.kernels.make_multi_frame_inference`). This realizes SURVEY §7 hard
part (e): the prior-feedback loop keeps each scene sequential — throughput
comes from batching objects within a frame AND pipelining across scenes.

Engine semantics are untouched: the server hands each engine a callable
with the `make_frame_inference` signature through the engine's existing
`infer_fn` injection point, and each scene's PnP / camera RANSAC / BA /
lifecycle runs in its own engine exactly as in sequential mode. With a
persisted int8 scales sidecar the batched outputs are bit-identical to the
per-frame path (same executor, same scales — the batch dimension does not
enter per-sample math), so results match sequential evaluation exactly;
scoring runs on the main thread in scene order either way.
"""

from __future__ import annotations

import threading

import jax.numpy as jnp

from ..slam.engine import MIN_PAD_BOX


class BatchingInferServer:
    """Barrier-batches concurrent engines' network calls into one dispatch.

    n_clients engines each own a client callable (`client(cid)`); a call
    blocks until every LIVE client has a request pending, then the last
    arriver assembles the [G=n_clients, O=max bucket] batch (inactive /
    finished rows padded invalid) and runs `multi_fn` once. A client that
    finished its work calls `done(cid)` so the barrier shrinks. Assembly
    stays on-device (jnp stack/pad of the engines' already-device arrays) —
    pulling images back to host would pay a tunnel round trip per scene.
    """

    def __init__(self, multi_fn, n_clients: int):
        self._fn = multi_fn
        self._cv = threading.Condition()
        self._active = int(n_clients)
        self._n = int(n_clients)
        self._pending: dict[int, tuple] = {}
        self._results: dict[int, tuple] = {}
        self._error: BaseException | None = None

    # ------------------------------------------------------------- client --
    def client(self, cid: int):
        def infer(img, boxes, obj_valid, prior_uv, prior_valid, has_prior=True):
            with self._cv:
                self._pending[cid] = (
                    img, boxes, obj_valid, prior_uv, prior_valid, bool(has_prior)
                )
                while cid not in self._results:
                    if self._error is not None:
                        raise RuntimeError(
                            "pipelined inference aborted by a peer scene"
                        ) from self._error
                    if self._pending and len(self._pending) >= self._active:
                        self._dispatch_locked()
                    else:
                        self._cv.wait(timeout=1.0)
                return self._results.pop(cid)

        # engine probes this on the callable (see kernels.make_frame_inference)
        infer.supports_no_prior = True
        return infer

    def done(self, cid: int):
        """A client finished (or died): shrink the barrier; a full round of
        the remaining clients may now be dispatchable by whoever is waiting."""
        with self._cv:
            self._active -= 1
            self._cv.notify_all()

    def abort(self, exc: BaseException):
        """Wake every waiter with the worker's exception instead of hanging."""
        with self._cv:
            self._error = exc
            self._cv.notify_all()

    # ----------------------------------------------------------- dispatch --
    def _dispatch_locked(self):
        """Assemble + run the batch. On ANY failure, record the error so the
        non-dispatching clients (whose requests were already consumed) raise
        instead of waiting forever — the leader re-raises its own copy."""
        try:
            self._dispatch_inner()
        except BaseException as e:  # noqa: BLE001 — delivered to all waiters
            self._error = e
            self._cv.notify_all()
            raise

    def _dispatch_inner(self):
        reqs = self._pending
        self._pending = {}
        cids = sorted(reqs)
        imgs0 = reqs[cids[0]][0]
        h, w = imgs0.shape[:2]
        nk = reqs[cids[0]][3].shape[-2]
        o = max(int(reqs[c][1].shape[0]) for c in cids)
        any_prior = any(reqs[c][5] for c in cids)

        # masked-out pad slots still flow through the ROI crop, so they get
        # a harmless nonzero box (a zero-size box is a 0-division in the
        # per-crop K fixup) — same convention as the engine's pad slots
        pad_box = jnp.asarray(
            [0.0, 0.0, MIN_PAD_BOX, MIN_PAD_BOX], jnp.float32
        )

        def pad_o(a, target, box=False):
            n = int(a.shape[0])
            if n == target:
                return a
            fill = (
                jnp.broadcast_to(pad_box, (target - n, 4))
                if box else jnp.zeros((target - n,) + a.shape[1:], a.dtype)
            )
            return jnp.concatenate([a, fill], axis=0)

        rows = {"img": [], "boxes": [], "valid": [], "puv": [], "pval": []}
        for c in cids:
            img, boxes, valid, puv, pval, _ = reqs[c]
            if img.shape[:2] != (h, w):
                raise ValueError(
                    "pipelined scenes must share an image size; got "
                    f"{img.shape[:2]} vs {(h, w)}"
                )
            rows["img"].append(jnp.asarray(img, jnp.float32))
            rows["boxes"].append(
                pad_o(jnp.asarray(boxes, jnp.float32), o, box=True)
            )
            rows["valid"].append(pad_o(jnp.asarray(valid, bool), o))
            rows["puv"].append(pad_o(jnp.asarray(puv, jnp.float32), o))
            rows["pval"].append(pad_o(jnp.asarray(pval, bool), o))
        # pad the scene axis to the CONSTRUCTION-time client count so the
        # jitted program keeps one G shape as scenes finish
        for _ in range(self._n - len(cids)):
            rows["img"].append(jnp.zeros((h, w, 3), jnp.float32))
            rows["boxes"].append(jnp.broadcast_to(pad_box, (o, 4)))
            rows["valid"].append(jnp.zeros((o,), bool))
            rows["puv"].append(jnp.zeros((o, nk, 2), jnp.float32))
            rows["pval"].append(jnp.zeros((o, nk), bool))

        uv, cov, mask = self._fn(
            jnp.stack(rows["img"]), jnp.stack(rows["boxes"]),
            jnp.stack(rows["valid"]), jnp.stack(rows["puv"]),
            jnp.stack(rows["pval"]), has_prior=any_prior,
        )
        for i, c in enumerate(cids):
            oi = int(reqs[c][1].shape[0])
            self._results[c] = (
                uv[i, :oi],
                None if cov is None else cov[i, :oi],
                mask[i, :oi],
            )
        self._cv.notify_all()


class ScenePool:
    """K worker threads draining a scene queue in declared order.

    `run_scene(cid, scene_id)` is the caller's per-scene closure (build an
    engine with `server.client(cid)` injected, drive its views, return the
    scene's collected artifacts). Results come back as {scene_id: value};
    the first worker exception aborts the server (so no peer hangs at the
    barrier) and re-raises on the main thread.
    """

    def __init__(self, server: BatchingInferServer | None, n_workers: int):
        self._server = server
        self._n = int(n_workers)

    def run(self, scene_ids, run_scene):
        work = list(scene_ids)
        lock = threading.Lock()
        results: dict = {}
        errors: list[BaseException] = []

        def worker(cid):
            try:
                while True:
                    with lock:
                        if errors or not work:
                            break
                        scene_id = work.pop(0)
                    results[scene_id] = run_scene(cid, scene_id)
            except BaseException as e:  # noqa: BLE001 — propagated to main
                with lock:
                    errors.append(e)
                if self._server is not None:
                    self._server.abort(e)
            finally:
                if self._server is not None:
                    self._server.done(cid)

        threads = [
            threading.Thread(target=worker, args=(cid,), daemon=True)
            for cid in range(self._n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        return results
