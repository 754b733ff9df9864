"""Host-side image augmentations with camera-matrix fixup.

Numpy/cv2/PIL rebuild of the reference augmentation stack
(`lib/datasets/augmentations.py`): a scale+rotate warp that *corrects K*
(introducing off-diagonals, which the whole NDC pipeline supports), plus
Pillow photometric jitter. These run in the host data-loader tier; everything
downstream is device code.

Each augmentation is `aug(rng, img, depth, bboxes, K) -> (img, depth, bboxes,
K)` with img uint8 HWC. A seeded `np.random.Generator` replaces the global
`random`/`np.random` state so loader workers are reproducible.
"""

from __future__ import annotations

import numpy as np

try:  # cv2 is present in the image; guard anyway for minimal installs
    import cv2

    cv2.setNumThreads(0)
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image, ImageEnhance, ImageFilter


class ScaleAndRotate:
    """Random scale [1, 1.5] + rotation +-5 deg (50%: +180 deg), K-corrected.

    Matches `NpScaleAndRotate` (`augmentations.py:41-77`): the affine warp is
    folded into K as K' = T @ K, so 3D keypoints keep projecting correctly.
    """

    def __init__(self, scale=(1.0, 1.5), angle=(-5.0, 5.0), p_flip=0.5):
        self.scale = scale
        self.angle = angle
        self.p_flip = p_flip

    def __call__(self, rng, img, depth=None, bboxes=None, K=None):
        assert cv2 is not None, "cv2 required for ScaleAndRotate"
        h, w = img.shape[:2]
        s = rng.uniform(*self.scale)
        angle = rng.uniform(*self.angle)
        if rng.uniform() < self.p_flip:
            angle += 180.0
        T = np.eye(3, dtype=np.float64)
        T[:2, :] = cv2.getRotationMatrix2D((w / 2.0 - 0.5, h / 2.0 - 0.5), angle, s)
        if K is not None:
            K = T @ K
        A = T[:2, :]
        img = cv2.warpAffine(img, A, (w, h), flags=cv2.INTER_LINEAR)
        if depth is not None:
            depth = cv2.warpAffine(depth, A, (w, h), flags=cv2.INTER_NEAREST)
        if bboxes is not None:
            pts = bboxes.reshape(-1, 2) @ A[:2, :2].T + A[None, :2, 2]
            bboxes = pts.reshape(-1, 4).astype(np.float32)
        return img, depth, bboxes, K


class _PillowEnhance:
    def __init__(self, fn, p, factor_interval):
        self.fn = fn
        self.p = p
        self.factor_interval = factor_interval

    def __call__(self, rng, img, depth=None, bboxes=None, K=None):
        if rng.uniform() <= self.p:
            pil = Image.fromarray(img)
            pil = self.fn(pil).enhance(factor=rng.uniform(*self.factor_interval))
            img = np.asarray(pil)
        return img, depth, bboxes, K


class Blur:
    def __init__(self, p=0.4, factor_interval=(1, 3)):
        self.p = p
        self.factor_interval = factor_interval

    def __call__(self, rng, img, depth=None, bboxes=None, K=None):
        if rng.uniform() <= self.p:
            k = int(rng.integers(self.factor_interval[0], self.factor_interval[1] + 1))
            pil = Image.fromarray(img).filter(ImageFilter.GaussianBlur(k))
            img = np.asarray(pil)
        return img, depth, bboxes, K


def Sharpness(p=0.3, factor_interval=(0.0, 50.0)):
    return _PillowEnhance(ImageEnhance.Sharpness, p, factor_interval)


def Contrast(p=0.3, factor_interval=(0.2, 50.0)):
    return _PillowEnhance(ImageEnhance.Contrast, p, factor_interval)


def Brightness(p=0.5, factor_interval=(0.1, 6.0)):
    return _PillowEnhance(ImageEnhance.Brightness, p, factor_interval)


def Color(p=0.3, factor_interval=(0.0, 20.0)):
    return _PillowEnhance(ImageEnhance.Color, p, factor_interval)


def default_train_augs():
    """The reference's training stack (`lib/datasets/bop.py:84-91`)."""
    return [
        ScaleAndRotate(),
        Blur(p=0.4, factor_interval=(1, 3)),
        Sharpness(p=0.3, factor_interval=(0.0, 50.0)),
        Contrast(p=0.3, factor_interval=(0.2, 50.0)),
        Brightness(p=0.5, factor_interval=(0.1, 6.0)),
        Color(p=0.3, factor_interval=(0.0, 20.0)),
    ]


def apply_augs(augs, rng, img, depth=None, bboxes=None, K=None, p_any=0.8):
    """Apply the stack with probability `p_any` (`lib/datasets/bop.py:573-575`)."""
    if augs and rng.uniform() < p_any:
        for a in augs:
            img, depth, bboxes, K = a(rng, img, depth, bboxes, K)
    return img, depth, bboxes, K
