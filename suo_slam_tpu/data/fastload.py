"""Fast training IO: binary frame cache + C++ threaded batch gatherer.

Replaces the reference's DataLoader-worker decode tier
(`train.py:319-325` with `--workers` processes each cv2-decoding PNGs): BOP
frames are decoded ONCE into a flat mmap-able cache, and at train time the
native library (`suo_slam_tpu/native/fastload.cpp`, built on first use with
g++) gathers shuffled batches with a thread pool + madvise readahead. Label
math (symmetry pick, projection, augmentation) stays in `BopDataset.get_raw`,
fed with the pre-decoded image, so semantics are identical to the pure-Python
path.

Usage:
    pack_cache(dataset, "train.suocache")
    loader = CacheLoader(dataset, "train.suocache", batch_size=16)
    for batch in loader.epoch():   # dicts from data.bop.collate
        ...
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_MAGIC = b"SUOC"
_VERSION = 1
_HEADER = np.dtype([
    ("magic", "S4"), ("version", "<u4"), ("n_samples", "<u8"),
    ("h", "<u4"), ("w", "<u4"), ("c", "<u4"), ("depth_flag", "<u4"),
    ("record_bytes", "<u8"),
])

_LIB = None


def _lib_path() -> str:
    d = os.path.join(os.path.dirname(__file__), "..", "native")
    return os.path.normpath(os.path.join(d, "libfastload.so"))


def build_library(force: bool = False) -> str:
    """Compile the C++ gatherer with g++ (cached .so next to the source)."""
    so = _lib_path()
    src = os.path.join(os.path.dirname(so), "fastload.cpp")
    if force or not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(build_library())
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [ctypes.c_char_p]
    lib.fl_close.argtypes = [ctypes.c_void_p]
    for name in ("fl_num_samples",):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("fl_height", "fl_width", "fl_channels", "fl_has_depth"):
        getattr(lib, name).restype = ctypes.c_int32
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.fl_gather.restype = ctypes.c_int
    lib.fl_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_void_p, ctypes.c_int,
    ]
    lib.fl_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def pack_cache(dataset, path: str, with_depth: bool | None = None) -> str:
    """Decode every indexed frame of `dataset` into the binary cache."""
    with_depth = dataset.mask_occluded if with_depth is None else with_depth
    views = list(dataset.view_index)
    assert views, "Dataset has no frames"
    img0 = dataset.read_img(*views[0])
    h, w, c = img0.shape
    rec_bytes = 8 + h * w * c + (4 * h * w if with_depth else 0)
    header = np.zeros((), _HEADER)
    header["magic"] = _MAGIC
    header["version"] = _VERSION
    header["n_samples"] = len(views)
    header["h"], header["w"], header["c"] = h, w, c
    header["depth_flag"] = int(with_depth)
    header["record_bytes"] = rec_bytes
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header.tobytes())
        for scene_id, view_id in views:
            img = dataset.read_img(scene_id, view_id)
            assert img.shape == (h, w, c), (
                f"Mixed frame sizes in split: {img.shape} vs {(h, w, c)}"
            )
            f.write(np.asarray([scene_id, view_id], "<i4").tobytes())
            f.write(np.ascontiguousarray(img, np.uint8).tobytes())
            if with_depth:
                f.write(
                    np.ascontiguousarray(
                        dataset.read_depth(scene_id, view_id), "<f4"
                    ).tobytes()
                )
    os.replace(tmp, path)
    return path


class CacheReader:
    """ctypes wrapper over the native mmap cache."""

    def __init__(self, path: str):
        self.lib = _load_lib()
        self.handle = self.lib.fl_open(path.encode())
        assert self.handle, f"Failed to open cache {path}"
        self.n = self.lib.fl_num_samples(self.handle)
        self.h = self.lib.fl_height(self.handle)
        self.w = self.lib.fl_width(self.handle)
        self.c = self.lib.fl_channels(self.handle)
        self.has_depth = bool(self.lib.fl_has_depth(self.handle))

    def close(self):
        if self.handle:
            self.lib.fl_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def gather(self, indices, n_threads: int = 8):
        """-> (ids [B, 2] i32, imgs [B, H, W, C] u8, depth [B, H, W] f32|None)."""
        idx = np.ascontiguousarray(indices, np.int64)
        b = len(idx)
        ids = np.empty((b, 2), np.int32)
        imgs = np.empty((b, self.h, self.w, self.c), np.uint8)
        depth = np.empty((b, self.h, self.w), np.float32) if self.has_depth else None
        r = self.lib.fl_gather(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            depth.ctypes.data if depth is not None else None,
            n_threads,
        )
        assert r == 0, "fl_gather failed (index out of range?)"
        return ids, imgs, depth

    def prefetch(self, indices):
        idx = np.ascontiguousarray(indices, np.int64)
        self.lib.fl_prefetch(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
        )


class CacheLoader:
    """Shuffling batch loader: native image gather + python label math.

    Accepts one dataset + cache path, or lists of each — multiple splits are
    shuffled into a single global index (like the reference's ConcatDataset,
    `train.py:313-317`), so batches mix samples across splits.
    """

    def __init__(self, dataset, cache_path, batch_size: int,
                 truncate_obj: int | None = None, seed: int = 0,
                 n_threads: int = 8):
        datasets = dataset if isinstance(dataset, (list, tuple)) else [dataset]
        paths = cache_path if isinstance(cache_path, (list, tuple)) else [cache_path]
        assert len(datasets) == len(paths)
        self.datasets = list(datasets)
        self.readers = []
        for ds, path in zip(self.datasets, paths):
            if not os.path.exists(path):
                print(f"Packing frame cache {path} ...")
                pack_cache(ds, path)
            r = CacheReader(path)
            assert r.n == len(ds.view_index), (
                f"Cache/dataset mismatch for {path} — repack the cache"
            )
            self.readers.append(r)
        self.counts = np.asarray([r.n for r in self.readers])
        self.offsets = np.concatenate([[0], np.cumsum(self.counts)])
        self.total = int(self.counts.sum())
        self.batch_size = batch_size
        self.truncate_obj = truncate_obj
        self.rng = np.random.default_rng(seed)
        self.n_threads = n_threads

    @property
    def reader(self):  # single-split convenience
        assert len(self.readers) == 1
        return self.readers[0]

    def __len__(self):
        return max(1, self.total // self.batch_size)

    def _gather(self, global_idx):
        """Gather a mixed-source batch, preserving input order."""
        src = np.searchsorted(self.offsets, global_idx, side="right") - 1
        out = [None] * len(global_idx)
        for s in np.unique(src):
            sel = np.nonzero(src == s)[0]
            local = global_idx[sel] - self.offsets[s]
            ids, imgs, depths = self.readers[s].gather(local, self.n_threads)
            for j, k in enumerate(sel):
                out[k] = (int(s), ids[j], imgs[j],
                          depths[j] if depths is not None else None)
        return out

    def _prefetch(self, global_idx):
        src = np.searchsorted(self.offsets, global_idx, side="right") - 1
        for s in np.unique(src):
            local = global_idx[src == s] - self.offsets[s]
            self.readers[s].prefetch(local)

    def epoch(self, shuffle: bool = True):
        from .bop import collate

        order = np.arange(self.total)
        if shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            if b + 1 < nb:  # overlap next batch's page-in with this one's math
                self._prefetch(order[(b + 1) * self.batch_size :
                                     (b + 2) * self.batch_size])
            samples = []
            for s, ids, img, depth in self._gather(idx):
                scene_id, view_id = int(ids[0]), int(ids[1])
                ds = self.datasets[s]
                samples.append(
                    ds.get_raw(scene_id, view_id, ds.obj_ids(scene_id, view_id),
                               img=img, depth=depth)
                )
            yield collate(samples, truncate_obj=self.truncate_obj,
                          seed=int(self.rng.integers(2**31)))
