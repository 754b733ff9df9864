"""VOC-style background compositing + paste-occluder augmentation tests."""

import os

import numpy as np
import pytest

from tests.helpers.synthetic_bop import write_synthetic_bop

from suo_slam_tpu.data.bop import BopDataset


@pytest.fixture(scope="module")
def bop_with_bg(tmp_path_factory):
    root = tmp_path_factory.mktemp("bg_bop")
    ds_root = root / "ycbv"
    write_synthetic_bop(str(ds_root), n_scenes=1, n_views=3)
    # fake VOC background dir next to the dataset root
    import cv2

    bg_dir = root / "VOCdevkit" / "VOC2012" / "JPEGImages"
    os.makedirs(bg_dir)
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(
            str(bg_dir / f"bg_{i}.jpg"),
            rng.integers(100, 255, (100, 150, 3), dtype=np.uint8),
        )
    return str(ds_root)


def test_synt_split_composites_background(bop_with_bg):
    ds = BopDataset(
        bop_with_bg, "train_synt",
        kp_config_root=os.path.join(bop_with_bg, "kp_configs"),
        no_aug=True, seed=0,
    )
    assert len(ds.bg_image_files) == 3
    s = ds[0]
    # fixture background pixels are value 30/255; after compositing the
    # zero-depth region must show the (bright) background instead
    img = s["img"]
    border = img[:4, :4]  # corner is off-object -> depth 0 -> composited
    assert float(border.mean()) > 0.3, float(border.mean())
    # objects still present: projection consistency preserved
    m = s["kp_model_masks"][0]
    p_cam = s["model_kps"][0][m] @ s["poses"][0][:3, :3].T + s["poses"][0][:3, 3]
    uvw = p_cam @ s["K_kps"][0].T
    uv = uvw[:, :2] / uvw[:, 2:3]
    np.testing.assert_allclose(uv, s["kp_uvs"][0][m], atol=1e-4)


def test_test_split_never_composites(bop_with_bg):
    ds = BopDataset(
        bop_with_bg, "test",
        kp_config_root=os.path.join(bop_with_bg, "kp_configs"), seed=0,
    )
    assert ds.bg_image_files == []
    s = ds[0]
    assert float(s["img"][:4, :4].mean()) < 0.15  # untouched dark background


def test_missing_bg_dir_warns_and_continues(tmp_path):
    ds_root = tmp_path / "ycbv"
    write_synthetic_bop(str(ds_root), n_scenes=1, n_views=2)
    ds = BopDataset(
        str(ds_root), "train_synt",
        kp_config_root=os.path.join(str(ds_root), "kp_configs"),
        no_aug=True, seed=0,
    )
    assert ds.bg_image_files == []
    s = ds[0]  # must not raise
    assert s["img"].shape == (240, 320, 3)
