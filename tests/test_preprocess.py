"""Preprocessing + per-benchmark calibration tests.

Covers devo_tpu/data/calibs.py (published-constant registry + the readers
for dataset-shipped calibration files) and preprocess.py's undistortion
pipeline against the reference's conventions
(/root/reference/scripts/pp_{eds,hku,mvsec,tumvie,rpg,ecd,vector}.py).
"""
import json
import os

import numpy as np
import pytest

from devo_tpu.data import calibs
from devo_tpu.data.preprocess import (compute_rectify_map,
                                      new_camera_matrix,
                                      preprocess_with_calib,
                                      undistort_images)

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")


def test_registry_shapes_and_models():
    """Every built-in entry exposes a valid K / dist of the right model."""
    for reg, model, n_dist in [(calibs.EDS, "radtan", 4),
                               (calibs.HKU, "radtan", 4),
                               (calibs.RPG_180x240, "radtan", 4)]:
        for key, cam in reg.items():
            assert cam.K.shape == (3, 3) and cam.K[2, 2] == 1.0
            assert cam.model == model and len(cam.dist) == n_dist
            assert cam.fx > 0 and cam.fy > 0
            H, W = cam.size
            assert 0 < cam.cx < W and 0 < cam.cy < H
    # EDS rgb focal length ~1.37x the event camera's (different sensors)
    assert calibs.EDS[("calib0", "rgb")].fx > calibs.EDS[("calib0", "evs")].fx
    # HKU extrinsics are rigid transforms
    for T in (calibs.HKU_T_CAM0_CAM1, calibs.HKU_T_MARKER_CAM0):
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)


def test_tumvie_reader_policies(tmp_path):
    """TUM-VIE reader: cam 2/3 are the event cameras; events get the
    balance=0.5 fisheye target, images balance=0 (pp_tumvie.py:72,142)."""
    blob = {"value0": {
        "intrinsics": [
            {"intrinsics": dict(fx=900.0 + i, fy=901.0 + i, cx=512.0,
                                cy=384.0, k1=0.01, k2=-0.02, k3=0.003,
                                k4=-0.001)} for i in range(4)],
        "resolution": [[1024, 768]] * 2 + [[1280, 720]] * 2}}
    p = tmp_path / "camera-calibrationA.json"
    p.write_text(json.dumps(blob))
    evs = calibs.read_tumvie_calib(str(p), 2)
    img = calibs.read_tumvie_calib(str(p), 0, for_images=True)
    assert evs.model == "fisheye" and evs.policy == "balance05"
    assert img.policy == "balance0"
    assert evs.fx == 902.0 and evs.size == (720, 1280)
    assert img.fx == 900.0 and img.size == (768, 1024)


def test_mvsec_vector_ecd_fpv_readers(tmp_path):
    import yaml

    chain = {"cam0": {"intrinsics": [223.9, 223.6, 170.7, 128.2],
                      "distortion_coeffs": [-0.048, 0.011, -0.022, 0.009],
                      "resolution": [346, 260]},
             "cam1": {"intrinsics": [223.1, 222.9, 170.1, 129.5],
                      "distortion_coeffs": [-0.049, 0.012, -0.023, 0.010],
                      "resolution": [346, 260]}}
    cy = tmp_path / "camchain-imucam-indoor_flying.yaml"
    cy.write_text(yaml.safe_dump(chain))
    left = calibs.read_mvsec_camchain(str(cy), "left")
    right = calibs.read_mvsec_camchain(str(cy), "right")
    assert left.model == "fisheye" and left.size == (260, 346)
    assert left.fx == 223.9 and right.fx == 223.1

    vec = {"camera_matrix": {"data": [886.2, 0, 610.5, 0, 886.6, 514.4,
                                      0, 0, 1]},
           "distortion_coefficients": {"data": [-0.14, 0.09, 0.0004, 0.0002]},
           "image_height": 480, "image_width": 640}
    vy = tmp_path / "left_event_camera_intrinsic_results.yaml"
    vy.write_text(yaml.safe_dump(vec))
    v = calibs.read_vector_calib(str(vy))
    assert v.model == "radtan" and v.fx == 886.2 and v.size == (480, 640)

    ct = tmp_path / "calib.txt"
    np.savetxt(ct, [[199.0, 198.0, 132.0, 110.0,
                     -0.368, 0.150, -0.0007, -0.0005, 0.0]])
    e = calibs.read_ecd_calib(str(ct))
    assert len(e.dist) == 5 and e.fx == 199.0  # radtan + k3

    fpv = {"cam0": {"intrinsics": [172.98, 172.98, 163.33, 134.99],
                    "distortion_coeffs": [-0.027, -0.006, 0.0003, -0.0002],
                    "resolution": [346, 260]}}
    fy = tmp_path / "camchain.yaml"
    fy.write_text(yaml.safe_dump(fpv))
    f = calibs.read_fpv_calib(str(fy))
    assert f.model == "fisheye" and f.size == (260, 346)


def test_user_json_override(tmp_path):
    p = tmp_path / "calib.json"
    p.write_text(json.dumps({"K": [[500, 0, 320], [0, 501, 240], [0, 0, 1]],
                             "dist": [0.1, -0.05, 0.001, 0.0],
                             "model": "radtan", "size": [480, 640]}))
    c = calibs.from_user_json(str(p))
    assert c.fx == 500 and c.fy == 501 and c.size == (480, 640)


def test_new_camera_matrix_policies():
    cam = calibs.EDS[("calib0", "evs")]
    H, W = cam.size
    K_new = new_camera_matrix(cam.K, cam.dist_np, H, W, "radtan", "optimal0")
    # the reference asserts the alpha=0 ROI covers the full frame
    # (pp_eds.py:82-84); the pinned calibration satisfies it
    _, roi = cv2.getOptimalNewCameraMatrix(cam.K, cam.dist_np, (W, H),
                                           alpha=0, newImgSize=(W, H))
    x, y, w, h = roi
    assert x == 0 and y == 0 and w + 1 == W and h + 1 == H
    assert K_new[0, 0] > 0
    # zero distortion: optimal0 keeps K (up to roi rounding), keep is exact
    K = cam.K
    np.testing.assert_allclose(
        new_camera_matrix(K, np.zeros(4), H, W, "radtan", "keep"), K)


def test_rectify_map_zero_distortion_is_identity():
    K = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    rm = compute_rectify_map(K, np.zeros(4), 240, 320, K_new=K)
    gx, gy = np.meshgrid(np.arange(320), np.arange(240))
    np.testing.assert_allclose(rm[..., 0], gx, atol=1e-3)
    np.testing.assert_allclose(rm[..., 1], gy, atol=1e-3)


def test_undistort_images_roundtrip(tmp_path):
    """Zero distortion remap reproduces the input image (interior)."""
    rng = np.random.default_rng(0)
    img = (rng.random((60, 80)) * 255).astype(np.uint8)
    p = tmp_path / "im.png"
    cv2.imwrite(str(p), img)
    K = np.array([[100.0, 0, 40], [0, 100, 30], [0, 0, 1]])
    out = tmp_path / "und"
    n = undistort_images([str(p)], str(out), K, np.zeros(4), K, 60, 80)
    assert n == 1
    back = cv2.imread(str(out / "000000.png"), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back[2:-2, 2:-2], img[2:-2, 2:-2])


def test_preprocess_with_calib_sidecars(tmp_path):
    """End-to-end over a synthetic sequence: all reference sidecar files
    appear with the right naming and the time origin moves to ~0
    (pp_eds.py:34-57 offset semantics)."""
    seq = tmp_path / "seq"
    (seq / "images").mkdir(parents=True)
    t0 = 5_000_000
    with h5py.File(seq / "events.h5", "w") as f:
        f["t"] = np.arange(t0, t0 + 100_000, 100, np.int64)
    gt = np.zeros((10, 8))
    gt[:, 0] = (t0 + np.arange(10) * 1e4) / 1e6   # seconds, like EDS
    gt[:, 7] = 1.0
    np.savetxt(seq / "stamped_groundtruth.txt", gt)
    np.savetxt(seq / "images_timestamps.txt",
               t0 + np.arange(5) * 2e4, fmt="%d")
    for i in range(3):
        cv2.imwrite(str(seq / "images" / f"frame_{i:04d}.png"),
                    np.full((480, 640), i * 40, np.uint8))

    cam = calibs.EDS[("calib0", "evs")]
    rgb = calibs.EDS[("calib0", "rgb")]
    off = preprocess_with_calib(str(seq), cam, suffix="_calib0",
                                images_dir="images", img_calib=rgb)
    assert off == t0
    for fn in ["rectify_map_calib0.h5", "calib_undist_calib0.txt",
               "calib_undist_calib0.json", "t_offset_us.txt",
               "stamped_groundtruth_us.txt", "images_timestamps_us.txt"]:
        assert (seq / fn).exists(), fn
    assert len(list((seq / "images_undistorted_calib0").iterdir())) == 3
    # rectify map has the event-camera shape; stamps start at 0
    with h5py.File(seq / "rectify_map_calib0.h5") as f:
        assert f["rectify_map"].shape == (480, 640, 2)
    assert np.loadtxt(seq / "images_timestamps_us.txt")[0] == 0
    fx, fy, cx, cy = np.loadtxt(seq / "calib_undist_calib0.txt")
    assert 0 < cx < 640 and 0 < cy < 480 and fx > 0 and fy > 0


def test_voconfig_from_yaml(tmp_path):
    """Reference-format yaml overrides (config/eval_*.yaml surface)."""
    from devo_tpu.runtime.config import EVAL_CONFIGS, VOConfig

    # the shipped files load and match the built-in EVAL_CONFIGS thresholds
    import glob
    root = os.path.join(os.path.dirname(__file__), "..", "config")
    shipped = sorted(glob.glob(os.path.join(root, "eval_*.yaml")))
    assert len(shipped) >= 8
    for path in shipped:
        name = os.path.basename(path)[5:-5]
        cfg = VOConfig.from_yaml(path)
        assert cfg.KEYFRAME_THRESH == EVAL_CONFIGS[name].KEYFRAME_THRESH, name
        assert cfg.PATCHES_PER_FRAME == 96

    # sizing-knob overrides re-derive EDGE_CAP
    p = tmp_path / "c.yaml"
    p.write_text("PATCH_LIFETIME: 7\nKEYFRAME_THRESH: 33.0\n")
    cfg = VOConfig.from_yaml(str(p))
    assert cfg.KEYFRAME_THRESH == 33.0
    assert cfg.EDGE_CAP == VOConfig(PATCH_LIFETIME=7).EDGE_CAP \
        and cfg.EDGE_CAP < VOConfig().EDGE_CAP

    # unknown keys are rejected, not silently ignored
    bad = tmp_path / "bad.yaml"
    bad.write_text("KEYFRAME_TRESH: 1.0\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        VOConfig.from_yaml(str(bad))


def test_preprocess_rejects_sizeless_calib(tmp_path):
    """A {K, dist}-only user JSON must fail loudly, not write (0,0) maps;
    the pp CLIs fill the benchmark's default size instead."""
    c = calibs.CamCalib(500.0, 500.0, 320.0, 240.0, (0, 0, 0, 0))
    with pytest.raises(ValueError, match="no resolution"):
        preprocess_with_calib(str(tmp_path), c)
    p = tmp_path / "calib.json"
    p.write_text(json.dumps({"K": [500, 501, 320, 240]}))
    filled = calibs.from_user_json(str(p), default_size=(260, 346))
    assert filled.size == (260, 346)
    explicit = json.dumps({"K": [500, 501, 320, 240], "size": [480, 640]})
    p.write_text(explicit)
    assert calibs.from_user_json(str(p), default_size=(260, 346)).size \
        == (480, 640)


def test_preprocess_normalize_times_off(tmp_path):
    """normalize_times=False (HKU/MVSEC/VECtor extraction trees) writes no
    time sidecars — shifting only the GT would desync the loader's
    dataset-native stamps."""
    with h5py.File(tmp_path / "events.h5", "w") as f:
        f["t"] = np.arange(7_000_000, 7_100_000, 100, np.int64)
    cam = calibs.HKU["left"]
    preprocess_with_calib(str(tmp_path), cam, suffix="_left",
                          normalize_times=False)
    assert not (tmp_path / "t_offset_us.txt").exists()
    assert (tmp_path / "rectify_map_left.h5").exists()


def test_from_yaml_preserves_pinned_edge_cap(tmp_path):
    """Non-sizing yaml overrides must not silently re-derive an explicitly
    pinned EDGE_CAP (it keys compiled executables)."""
    from devo_tpu.runtime.config import VOConfig

    base = VOConfig().replace(EDGE_CAP=8192)
    p = tmp_path / "c.yaml"
    p.write_text("KEYFRAME_THRESH: 25.0\n")
    assert VOConfig.from_yaml(str(p), base=base).EDGE_CAP == 8192
    p.write_text("PATCH_LIFETIME: 7\n")   # sizing knob -> re-derive
    assert VOConfig.from_yaml(str(p), base=base).EDGE_CAP \
        == VOConfig(PATCH_LIFETIME=7).EDGE_CAP
