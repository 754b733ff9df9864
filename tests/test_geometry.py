import numpy as np
import jax.numpy as jnp

from suo_slam_tpu.core import geometry, lie, symmetry
from suo_slam_tpu.kp import config as kp_config


def _fix_K_ref(K_, bbox):
    """Reference numpy implementation of fix_K_for_bbox_ndc
    (lib/utils/utils.py:416-429)."""
    x1, y1, x2, y2 = bbox
    x, y, w, h = x1, y1, x2 - x1, y2 - y1
    K = np.copy(K_)
    duv = np.array([x, y], dtype=np.float64)
    T = np.eye(3)
    T[:2, 2] = -duv
    S = np.eye(3)
    S[0, :] *= 2.0 / w
    S[1, :] *= -2.0 / h
    S[0, 2] -= 1
    S[1, 2] += 1
    return S @ T @ K


def test_fix_K_for_bbox_ndc_matches_reference():
    rng = np.random.default_rng(0)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]])
    for _ in range(20):
        x1, y1 = rng.uniform(0, 300, 2)
        w, h = rng.uniform(20, 200, 2)
        bbox = np.array([x1, y1, x1 + w, y1 + h])
        ours = np.asarray(geometry.fix_K_for_bbox_ndc(jnp.asarray(K), jnp.asarray(bbox)))
        ref = _fix_K_ref(K, bbox)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_ndc_projection_consistency():
    """A point projecting to pixel (u,v) in the full image must land at
    (2(u-x)/w - 1, 1 - 2(v-y)/h) with the fixed K."""
    rng = np.random.default_rng(1)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    pts = rng.normal(size=(50, 3)) * 50 + np.array([0, 0, 800.0])
    bbox = np.array([100.0, 80, 300, 260])
    uv_full, z = geometry.project(jnp.asarray(K), jnp.asarray(pts))
    uv_full = np.asarray(uv_full)
    x1, y1, x2, y2 = bbox
    w, h = x2 - x1, y2 - y1
    expect = np.stack(
        [2 * (uv_full[:, 0] - x1) / w - 1, 1 - 2 * (uv_full[:, 1] - y1) / h], axis=-1
    )
    K_bbox = geometry.fix_K_for_bbox_ndc(jnp.asarray(K), jnp.asarray(bbox))
    uv_ndc, z2 = geometry.project(K_bbox, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(uv_ndc), expect, atol=1e-9)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-9)


def test_ndc_pixel_roundtrip():
    rng = np.random.default_rng(2)
    uv = rng.uniform(-0.99, 0.99, size=(100, 2))
    xy = geometry.ndc_to_pixels(jnp.asarray(uv), (256, 256))
    uv2 = geometry.pixels_to_ndc(xy, (256, 256))
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-12)
    # reference formula check
    x = np.clip(uv[:, 0], -1, 1) * 128 + 128 - 0.5
    y = 256 - 0.5 - (np.clip(uv[:, 1], -1, 1) * 128 + 128)
    np.testing.assert_allclose(np.asarray(xy), np.stack([x, y], -1), atol=1e-12)


def test_transform_pts_broadcasting():
    rng = np.random.default_rng(3)
    T = np.eye(4)
    T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.1, -0.2, 0.3])))
    T[:3, 3] = [1, 2, 3]
    pts = rng.normal(size=(4, 10, 3))
    out = np.asarray(geometry.transform_pts(jnp.asarray(T), jnp.asarray(pts)))
    expect = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, expect, atol=1e-12)
    # batched T per group
    Ts = np.tile(T, (4, 1, 1))
    out2 = np.asarray(geometry.transform_pts(jnp.asarray(Ts), jnp.asarray(pts)))
    np.testing.assert_allclose(out2, expect, atol=1e-12)


def test_normalize_image_points():
    K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
    rng = np.random.default_rng(4)
    uv = rng.uniform(0, 640, size=(20, 2))
    ours = np.asarray(geometry.normalize_image_points(jnp.asarray(K), jnp.asarray(uv)))
    KinvT = np.linalg.inv(K).T
    ref = uv @ KinvT[:2, :2] + KinvT[2:3, :2]
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_kp_config_vocabulary():
    assert kp_config.num_kp() == 41
    cfg = kp_config.load_kp_config("ycbv")
    assert len(cfg) == 21
    # cracker_box: box_like + brand + nutrition + bar = 8 + 12 = 20 channels
    assert cfg.channel_mask[1].sum() == 20
    # bowl: cylinder only = 10
    assert cfg.channel_mask[12].sum() == 10
    # power_drill: hand_tool + grip + brand = 6 + 4 + 4 = 14
    assert cfg.channel_mask[14].sum() == 14
    tless = kp_config.load_kp_config("tless")
    assert len(tless) == 30
    # all tless are plain shapes
    assert set(tless.channel_mask.sum(-1).tolist()) <= {8, 10}
    # channel order stable: box corners are channels 0..7
    m = kp_config.get_kps("box_like", False, False, False, False, False)
    assert sorted(m.values()) == list(range(8))


def test_symmetry_stack_and_pick():
    # Object with one discrete 180deg z-flip symmetry
    Tz = np.eye(4)
    Tz[:3, :3] = np.asarray(lie.euler2R(jnp.asarray([0.0, 0, 180])))
    info = {"symmetries_discrete": [Tz.reshape(-1).tolist()]}
    syms = symmetry.build_symmetry_stack(info)
    assert syms.shape == (2, 4, 4)
    padded, valid = symmetry.pad_symmetry_stack(syms, 4)
    assert valid.tolist() == [True, True, False, False]

    rng = np.random.default_rng(5)
    kp = rng.normal(size=(8, 3))
    T_VtoC = np.eye(4)
    T_VtoC[:3, 3] = [0, 0, 5]
    # GT pose equals the view pose composed with the symmetry: picking should
    # undo it (select index 1) so result is close to the view pose.
    T_OtoC = T_VtoC @ np.linalg.inv(Tz)
    T_best, i_best = symmetry.pick_symmetry_transform(
        jnp.asarray(T_OtoC), jnp.asarray(padded), jnp.asarray(valid), jnp.asarray(kp), jnp.asarray(T_VtoC)
    )
    assert int(i_best) == 1
    np.testing.assert_allclose(np.asarray(T_best), T_VtoC, atol=1e-9)

    # continuous symmetry discretizes to 64 + identity
    info_c = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    syms_c = symmetry.build_symmetry_stack(info_c)
    assert syms_c.shape == (65, 4, 4)
