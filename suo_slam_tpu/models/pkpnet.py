"""PkpNet: probabilistic keypoint network (uv + 2x2 covariance + validity).

TPU-native rebuild of the reference `lib/models/pkpnet.py:65-119`. Inputs are
a *dense padded* ROI batch (the `ops.roi.roi_crop_batch` front-end replaces
`torchvision.ops.roi_align`, and `ops.heatmap.render_prior_heatmaps` replaces
the host-side prior rasterization), so the network itself is a pure
static-shape function ideal for jit/pjit:

    images_roi: [N, 256, 256, 3]   (already cropped+resized, NHWC)
    prior_kp:   [N, 256, 256, 41]  (on-device rendered Gaussians; zeros = none)
    -> uv [N, 41, 2] NDC, cov [N, 41, 2, 2], kp_mask [N, 41] sigmoid prob,
       plus the raw heatmap logits/probs of the final stack.

The keypoint-validity classifier matches the reference head: mean-pooled
heatmap logits -> ReLU -> Dropout(0.5) -> Dense(41->41)
(`pkpnet.py:74-78,116-118`).

TPU-first deviation (prior injection): the reference concatenates the 41
prior-keypoint channels to the RGB input at full 256x256 resolution
(`pkpnet.py:95-101`), which makes the stride-2 7x7 stem convolve 44 channels
(~4.3 GFLOP/crop) and moves ~11 MB/crop of mostly-zero Gaussians through
HBM. Here the prior is rendered at heatmap resolution (H/4 x W/4) and
injected AFTER the stem through a 1x1 projection added to the feature map
(`prior_mode="post_stem"`, the default) — same conditioning capability, ~14%
fewer FLOPs and ~40x less prior bandwidth. `prior_mode="concat"` preserves
the reference wiring for ablation.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kp import config as kp_config
from ..ops import heatmap as hm
from .hourglass import HourglassNet

Dtype = Any


class PkpNetOutput(NamedTuple):
    uv: jax.Array               # [N, K, 2] expected NDC keypoint location
    cov: jax.Array | None       # [N, K, 2, 2] heatmap covariance (None if off)
    prob: jax.Array             # [N, H/4, W/4, K] softmaxed heatmaps
    prob_logits: jax.Array      # [N, H/4, W/4, K] raw final-stack logits
    kp_mask_logits: jax.Array   # [N, K]
    kp_mask: jax.Array          # [N, K] sigmoid validity probability
    aux_logits: tuple[jax.Array, ...] = ()  # earlier stacks (aux supervision)


class PkpNet(nn.Module):
    """Stacked-hourglass keypoint network with covariance readout."""

    num_kp: int = kp_config.num_kp()
    calc_cov: bool = True
    n_stack: int = 2
    n_modules: int = 2
    features: int = 256
    norm: str = "batch"
    prior_mode: str = "post_stem"  # "post_stem" (TPU-first) | "concat" (reference)
    quant: str = "off"  # "off" | "calib" | "int8" (see models/quant.py)
    transpose_heatmaps: bool = False  # for torch-converted checkpoints: the
    # reference's soft-argmax meshgrid is transposed (u along heatmap ROWS,
    # `lib/models/pkpnet.py:19-26`), so its trained heatmaps must be
    # transposed before our natural-orientation readout
    dtype: Dtype = jnp.float32

    def prior_hw(self, input_hw: tuple[int, int]) -> tuple[int, int]:
        """Resolution the prior heatmaps should be rendered at."""
        if self.prior_mode == "concat":
            return input_hw
        return (input_hw[0] // 4, input_hw[1] // 4)

    @nn.compact
    def __call__(
        self,
        images_roi: jax.Array,
        prior_kp: jax.Array | None = None,
        train: bool = False,
        row_mask: jax.Array | None = None,
    ) -> PkpNetOutput:
        """row_mask: [N] real-row validity — padded ROI slots are excluded
        from BatchNorm training statistics."""
        n, h, w, c = images_roi.shape
        assert c == 3, f"expected RGB ROI batch, got {images_roi.shape}"
        if self.quant == "off":
            conv_cls = nn.Conv
        else:
            from functools import partial

            from .quant import QuantConv

            assert not train, "quantized modes are inference-only"
            conv_cls = partial(QuantConv, mode=self.quant)
        backbone = HourglassNet(
            in_features=3 + (self.num_kp if self.prior_mode == "concat" else 0),
            num_output=self.num_kp,
            n_stack=self.n_stack,
            n_modules=self.n_modules,
            features=self.features,
            norm=self.norm,
            dtype=self.dtype,
            conv_cls=conv_cls,
        )
        if self.prior_mode == "concat":
            if prior_kp is None:
                prior_kp = jnp.zeros((n, h, w, self.num_kp), images_roi.dtype)
            assert prior_kp.shape[1:3] == (h, w), prior_kp.shape
            x = jnp.concatenate(
                [images_roi, prior_kp.astype(images_roi.dtype)], axis=-1
            )
            outs = backbone(x, train, row_mask=row_mask)
        else:
            if prior_kp is None:
                prior_kp = jnp.zeros((n, h // 4, w // 4, self.num_kp), images_roi.dtype)
            assert prior_kp.shape[1:3] == (h // 4, w // 4), (
                f"post_stem prior must be H/4 x W/4, got {prior_kp.shape}"
            )
            outs = backbone(images_roi, train, extra=prior_kp, row_mask=row_mask)
        raw = outs[-1]  # [N, h/4, w/4, K] f32
        if self.transpose_heatmaps:
            raw = jnp.swapaxes(raw, 1, 2)

        prob = hm.spatial_softmax(raw)
        uv, cov = hm.soft_argmax(prob, calc_cov=self.calc_cov)

        pooled = jnp.mean(raw, axis=(1, 2))  # [N, K]
        y = nn.relu(pooled)
        y = nn.Dropout(0.5, deterministic=not train)(y)
        mask_logits = nn.Dense(self.num_kp, dtype=jnp.float32)(y)

        return PkpNetOutput(
            uv=uv,
            cov=cov,
            prob=prob,
            prob_logits=raw,
            kp_mask_logits=mask_logits,
            kp_mask=jax.nn.sigmoid(mask_logits),
            aux_logits=tuple(outs[:-1]),
        )
