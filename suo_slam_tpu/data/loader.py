"""Host-side batch loaders for training: threaded prefetch and
process-pool tiers over BopDataset, with per-(epoch, item) sample seeding
so batches are bit-identical across worker modes and counts.

Replaces the reference's torch DataLoader worker tier
(`/root/reference/train.py:319-325`). Lives in the package (not the train.py
CLI) so spawn-based worker children can re-import it by a stable module
name regardless of what `train` resolves to on sys.path.
"""

import os
import threading

import numpy as np

_MP_DATASETS = None  # process-pool worker state (set by _mp_init)


def _mp_init(datasets_blob):
    global _MP_DATASETS
    import pickle

    _MP_DATASETS = pickle.loads(datasets_blob)


def _mp_load_batch(args):
    """Process-pool task: decode+augment+collate one batch entirely in the
    worker (one pickle of the collated arrays back, no per-item IPC)."""
    from suo_slam_tpu.data.bop import collate

    idx, cseed, item_seeds, truncate_obj = args
    samples = [
        _sample_seeded(_MP_DATASETS, int(i), int(s))
        for i, s in zip(idx, item_seeds)
    ]
    return collate(samples, truncate_obj=truncate_obj, seed=cseed)


def _mp_warm(sec):
    import time

    time.sleep(sec)
    return os.getpid()


def _sample_seeded(datasets, i, seed):
    for d in datasets:
        n = len(d)
        if i < n:
            return d.sample_seeded(i, seed)
        i -= n
    raise IndexError


class ConcatLoader:
    """Shuffling batch loader over concatenated datasets with background
    prefetch and two worker tiers.

    Replaces the reference's torch DataLoader worker tier
    (`train.py:319-325`). Every sample's augmentation/prior randomness is
    seeded per (epoch, item) from the loader stream
    (`BopDataset.sample_seeded`), so batches are BIT-IDENTICAL across
    worker modes and counts — workers only change speed.

    mode="thread" (default): `workers` threads + a prefetch queue. Python
    holds the GIL through most of get_raw's numpy work, so threads mainly
    hide IO/decode — measured ~flat scaling on full-size frames.
    mode="process": a spawn-based process pool collates whole batches in
    the workers (the reference's num_workers equivalent) — use for
    real-data training where decode+augment must scale.
    """

    def __init__(self, datasets, batch_size, truncate_obj, seed=0, workers=4,
                 prefetch=4, mode="thread"):
        self.datasets = datasets
        self.lengths = [len(d) for d in datasets]
        self.total = sum(self.lengths)
        self.batch_size = batch_size
        self.truncate_obj = truncate_obj
        self.workers = max(1, int(workers))
        self.prefetch = max(1, int(prefetch))
        self.rng = np.random.default_rng(seed)
        if mode not in ("thread", "process"):
            raise ValueError(f"loader mode {mode!r}")
        self.mode = mode
        self._pool = None

    def __len__(self):
        return max(1, self.total // self.batch_size)

    def sample(self, i, seed=None):
        if seed is not None:
            return _sample_seeded(self.datasets, i, seed)
        for d, n in zip(self.datasets, self.lengths):
            if i < n:
                return d[i]
            i -= n
        raise IndexError

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            import pickle
            from concurrent.futures import ProcessPoolExecutor

            # Workers are numpy/cv2/PIL only — they must NOT inherit the
            # TPU platform env: the sandbox's sitecustomize imports jax and
            # registers the axon tunnel at interpreter start, which can hang
            # a spawned child (and a dozen workers dialing the device would
            # fight the parent). Spawn ALL workers eagerly inside a CPU-env
            # window (concurrent sleeps force the lazy executor to start
            # every process now), then restore the parent env.
            saved = {
                k: os.environ.get(k)
                for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
            }
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            try:
                pool = ProcessPoolExecutor(
                    self.workers, mp_context=mp.get_context("spawn"),
                    initializer=_mp_init,
                    initargs=(pickle.dumps(self.datasets),),
                )
                warm = [pool.submit(_mp_warm, 0.3)
                        for _ in range(self.workers)]
                for f in warm:
                    f.result(timeout=120)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            self._pool = pool
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(cancel_futures=True)
            self._pool = None

    def epoch(self, shuffle=True, seed=None):
        """One epoch of batches. seed: when given, draw this epoch's
        shuffle/collate/item randomness from a LOCAL rng(seed) instead of
        the advancing loader stream — the validation loop passes a fixed
        seed so epochs are bit-comparable."""
        from suo_slam_tpu.data.bop import collate

        rng = self.rng if seed is None else np.random.default_rng(seed)
        order = np.arange(self.total)
        if shuffle:
            rng.shuffle(order)
        batches = [
            (order[b * self.batch_size : (b + 1) * self.batch_size],
             int(rng.integers(2**31)),
             rng.integers(2**31, size=self.batch_size))
            for b in range(len(self))
        ]
        if self.mode == "process" and self.workers > 1:
            pool = self._process_pool()
            args = [(idx, cseed, iseeds, self.truncate_obj)
                    for idx, cseed, iseeds in batches]
            # chunksize=1 + bounded in-flight window: prefetch semantics
            futures = []
            pending = list(args)
            inflight = self.workers + self.prefetch
            while pending or futures:
                while pending and len(futures) < inflight:
                    futures.append(pool.submit(_mp_load_batch, pending.pop(0)))
                yield futures.pop(0).result()
            return
        if self.workers == 1:
            for idx, cseed, iseeds in batches:
                samples = [self.sample(int(i), int(s))
                           for i, s in zip(idx, iseeds)]
                yield collate(samples, truncate_obj=self.truncate_obj, seed=cseed)
            return

        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()
        stop = threading.Event()

        def put(item):
            # bounded-blocking put that aborts if the consumer went away —
            # otherwise an early `break` out of the epoch would leave the
            # producer (and its worker pool + prefetched batches) pinned
            # forever on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.workers) as ex:
                    for idx, cseed, iseeds in batches:
                        if stop.is_set():
                            return
                        samples = list(ex.map(
                            lambda a: self.sample(int(a[0]), int(a[1])),
                            zip(idx, iseeds)))
                        if not put(collate(samples, truncate_obj=self.truncate_obj,
                                           seed=cseed)):
                            return
                put(SENTINEL)
            except BaseException as e:  # surfaced in the consumer
                put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
