"""Data-layer tests on the synthetic BOP fixture: indexing, projection
consistency, symmetry selection, collate, mesh DB, PLY IO."""

import os

import numpy as np
import pytest

from tests.helpers.synthetic_bop import (
    OBJ_HALF_EXTENTS,
    cuboid_corners,
    write_synthetic_bop,
)

from suo_slam_tpu.data.bop import BopDataset, collate
from suo_slam_tpu.data.mesh import load_mesh_db, load_ply_vertices
from suo_slam_tpu.kp import config as kp_config


@pytest.fixture(scope="session")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_bop")
    return write_synthetic_bop(str(root), n_scenes=1, n_views=4)


def _make_ds(bop_root, split="test", **kw):
    kw.setdefault("kp_config_root", os.path.join(bop_root, "kp_configs"))
    kw.setdefault("seed", 0)
    return BopDataset(bop_root, split, bop_dset="ycbv", **kw)


def test_indexing(bop_root):
    ds = _make_ds(bop_root)
    assert len(ds.scene_ids()) == 1
    assert len(ds) == 4  # map_by view
    assert len(ds.obj_ids(0, 0)) == 3
    ds_obj = _make_ds(bop_root, map_by="obj")
    assert len(ds_obj) == 12
    ds_single = _make_ds(bop_root, map_by="obj_2")
    assert len(ds_single) == 4
    s = ds_single[0]
    assert list(s["obj_ids"]) == [2]


def test_get_raw_shapes_and_projection_consistency(bop_root):
    ds = _make_ds(bop_root, ignore_symmetry=True)
    s = ds[0]
    o = s["bboxes"].shape[0]
    nk = kp_config.num_kp()
    assert s["img"].shape == (240, 320, 3) and s["img"].dtype == np.float32
    assert s["kp_uvs"].shape == (o, nk, 2)
    assert s["model_kps"].shape == (o, nk, 3)
    # Only the 8 box-corner channels are labeled
    assert s["kp_model_masks"].sum() == o * 8
    # Projecting model kps through pose + NDC-fixed K reproduces kp_uvs
    for i in range(o):
        m = s["kp_model_masks"][i]
        p_cam = s["model_kps"][i][m] @ s["poses"][i][:3, :3].T + s["poses"][i][:3, 3]
        uvw = p_cam @ s["K_kps"][i].T
        uv = uvw[:, :2] / uvw[:, 2:3]
        np.testing.assert_allclose(uv, s["kp_uvs"][i][m], atol=1e-4)
        # GT model kps are the cuboid corners
        np.testing.assert_allclose(
            s["model_kps"][i][m],
            cuboid_corners(*OBJ_HALF_EXTENTS[int(s["obj_ids"][i])]),
            atol=1e-5,
        )


def test_kp_masks_subset_of_model_masks(bop_root):
    ds = _make_ds(bop_root)
    for idx in range(len(ds)):
        s = ds[idx]
        assert not np.any(s["kp_masks"] & ~s["kp_model_masks"])


def test_symmetry_pick_discrete(bop_root):
    ds = _make_ds(bop_root)
    # object 3 has a 180-deg z symmetry: stack should be [I, Rz(pi)]
    syms = ds.symmetries[2]
    assert syms.shape[0] == 2
    T = np.eye(4)
    T[2, 3] = 600.0
    T_best, i_best = ds.pick_symmetry_transform(2, T[:3, :], random=False)
    assert i_best in (0, 1)
    # picking twice is deterministic
    T_best2, i2 = ds.pick_symmetry_transform(2, T[:3, :], random=False)
    assert i2 == i_best
    np.testing.assert_allclose(T_best, T_best2)
    # object 2 with continuous symmetry: 1 + 64 entries
    assert ds.symmetries[1].shape[0] == 65


def test_symmetry_equivalence_with_device_version(bop_root):
    import jax.numpy as jnp

    from suo_slam_tpu.core import symmetry as sym_dev
    from suo_slam_tpu.core.symmetry import pad_symmetry_stack

    ds = _make_ds(bop_root)
    oi = 2
    T = np.eye(4)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    T[2, 3] = 700.0
    host_T, host_i = ds.pick_symmetry_transform(oi, T[:3, :])
    syms, valid = pad_symmetry_stack(ds.symmetries[oi], 4)
    kp = ds.kp_full[oi][ds.kp_full_mask[oi]]
    dev_T, dev_i = sym_dev.pick_symmetry_transform(
        jnp.asarray(T), jnp.asarray(syms), jnp.asarray(valid),
        jnp.asarray(kp), jnp.asarray(ds.view_pose[oi]),
    )
    assert int(dev_i) == host_i
    np.testing.assert_allclose(np.asarray(dev_T), host_T, atol=1e-8)


def test_train_split_with_augmentation_keeps_projection_consistent(bop_root):
    ds = _make_ds(bop_root, split="train_synt", ignore_symmetry=True, seed=3)
    s = ds[0]
    # even with warp augmentation, kp_uvs must equal projection via fixed K
    for i in range(s["bboxes"].shape[0]):
        m = s["kp_model_masks"][i]
        p_cam = s["model_kps"][i][m] @ s["poses"][i][:3, :3].T + s["poses"][i][:3, 3]
        uvw = p_cam @ s["K_kps"][i].T
        uv = uvw[:, :2] / uvw[:, 2:3]
        np.testing.assert_allclose(uv, s["kp_uvs"][i][m], atol=1e-3)


def test_collate_padding_and_truncation(bop_root):
    ds = _make_ds(bop_root)
    batch = collate([ds[0], ds[1]])
    assert batch["images"].shape == (2, 240, 320, 3)
    assert batch["boxes"].shape == (2, 3, 4)
    assert batch["obj_mask"].all()
    b2 = collate([ds[0], ds[1]], truncate_obj=2)
    assert b2["boxes"].shape == (2, 2, 4)
    assert b2["obj_mask"].sum() == 4


def test_mesh_db(bop_root):
    db = load_mesh_db(os.path.join(bop_root, "models_bop-compat"))
    assert db.obj_ids == [1, 2, 3]
    assert db.is_symmetric[1] and db.is_symmetric[2] and not db.is_symmetric[0]
    assert db.has_continuous_sym[1]
    he = OBJ_HALF_EXTENTS[1]
    np.testing.assert_allclose(db.diameter[0], 2 * np.linalg.norm(he), rtol=1e-6)
    pts, cnt = db.points_padded()
    assert pts.shape[0] == 3 and cnt.min() >= 8


def test_ply_roundtrip_binary(tmp_path):
    # binary little-endian with extra properties
    pts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    path = tmp_path / "test.ply"
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 17\n")
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\n")
        f.write(b"end_header\n")
        for p in pts:
            import struct

            f.write(struct.pack("<fffB", p[0], p[1], p[2], 128))
    out = load_ply_vertices(str(path))
    np.testing.assert_allclose(out, pts, atol=1e-6)


def test_bbox_noise_det_type(bop_root):
    ds0 = _make_ds(bop_root, det_type="gt", seed=1)
    ds1 = _make_ds(bop_root, det_type="gt+noise", seed=1)
    b0 = ds0[0]["bboxes"]
    b1 = ds1[0]["bboxes"]
    assert not np.allclose(b0, b1)


def test_map_by_obj_training_iteration(bop_root):
    """map_by='obj' (per-object samples, the T-LESS single-object training
    mode) and map_by='obj_<id>' feed the training collate correctly."""
    ds = _make_ds(bop_root, map_by="obj")
    s = ds[5]
    assert s["bboxes"].shape[0] == 1
    batch = collate([ds[0], ds[4], ds[8]])
    assert batch["boxes"].shape == (3, 1, 4)
    assert batch["obj_mask"].all()
    # all three synthetic objects appear across per-object samples
    ids = {int(ds[i]["obj_ids"][0]) for i in range(len(ds))}
    assert ids == {1, 2, 3}


@pytest.mark.slow
def test_loader_modes_bit_identical(tmp_path):
    """Per-item seeding makes batches independent of the worker tier:
    inline (workers=1), threaded, and process-pool loaders must produce
    bit-identical epochs for the same seed."""
    # NOTE: import from the package, not `train` — the reference-oracle
    # tests put /root/reference on sys.path, whose own train.py shadows
    # our CLI module within a shared pytest process.
    from suo_slam_tpu.data.loader import ConcatLoader

    from tests.helpers.synthetic_bop import write_synthetic_bop

    root = write_synthetic_bop(str(tmp_path / "bop"), n_scenes=1, n_views=8)
    from suo_slam_tpu.data.bop import BopDataset

    def batches(workers, mode):
        ds = BopDataset(root, "train_synt", bop_dset="ycbv",
                        kp_config_root=os.path.join(root, "kp_configs"),
                        seed=0)
        loader = ConcatLoader([ds], batch_size=2, truncate_obj=8,
                              seed=5, workers=workers, mode=mode)
        try:
            return list(loader.epoch(shuffle=True, seed=11))
        finally:
            loader.close()

    ref = batches(1, "thread")
    thr = batches(4, "thread")
    proc = batches(2, "process")
    assert len(ref) == len(thr) == len(proc) > 0
    for a, b, c in zip(ref, thr, proc):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"thread {k}")
            np.testing.assert_array_equal(a[k], c[k], err_msg=f"process {k}")
