"""Per-benchmark loader quirk tests over tiny synthetic fixtures.

Each test builds a minimal on-disk tree matching the benchmark's file
conventions and asserts the quirk the reference encodes for it
(/root/reference/utils/load_utils.py): window rules, hot-pixel policies,
hand-tuned crops, timestamp conventions, GT formats.
"""
import json
import os

import h5py
import numpy as np
import pytest

from devo_tpu.data import benchmarks as bm

H, W = 32, 40
N_IMGS = 12
DT_US = 10_000          # 10 ms frame spacing


def write_events_h5(path, t_us, x, y, p, with_index=True):
    with h5py.File(path, "w") as f:
        f.create_dataset("events/t", data=np.asarray(t_us, np.int64))
        f.create_dataset("events/x", data=np.asarray(x, np.uint16))
        f.create_dataset("events/y", data=np.asarray(y, np.uint16))
        f.create_dataset("events/p", data=np.asarray(p, np.int8))
        if with_index:
            from devo_tpu.data.event_utils import compute_ms_to_idx
            f.create_dataset("ms_to_idx",
                             data=compute_ms_to_idx(np.asarray(t_us)))


def make_stream(n=4000, t_max_us=N_IMGS * DT_US + 20_000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.integers(0, t_max_us, n))
    x = rng.integers(0, W, n)
    y = rng.integers(0, H, n)
    p = rng.integers(0, 2, n) * 2 - 1
    return t, x, y, p


def write_identity_rmap(path, h, w):
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    with h5py.File(path, "w") as f:
        f.create_dataset("rectify_map", data=np.stack([gx, gy], -1))


def tss_imgs():
    return np.arange(N_IMGS, dtype=np.float64) * DT_US + 5_000


# ------------------------------------------------------------------- EDS

def test_eds_half_window_and_hardcoded_intrinsics(tmp_path):
    d = str(tmp_path)
    t, x, y, p = make_stream()
    write_events_h5(os.path.join(d, "events.h5"), t, x, y, p)
    write_identity_rmap(os.path.join(d, "rectify_map_calib0.h5"), 480, 640)
    np.savetxt(os.path.join(d, "images_timestamps_us.txt"), tss_imgs())

    out = list(bm.eds_evs_iterator(d))
    assert len(out) >= N_IMGS - 2
    vox, intr, ts = out[0]
    assert vox.shape == (5, 480, 640)
    np.testing.assert_array_equal(intr, bm.EDS_INTRINSICS["calib0"])
    # the emitted stamp is the window MIDPOINT (load_utils.py:76): for EDS
    # t0 = image stamp, t1 = t0 + dT (half the mean spacing)
    np.testing.assert_allclose(ts, (tss_imgs()[0] + DT_US / 4) / 1e6)
    # dT = mean spacing / 2: events of the first window must all fall in
    # [ts0, ts0 + 5ms) — check by re-voxelizing manually
    sel = (t >= tss_imgs()[0]) & (t < tss_imgs()[0] + DT_US / 2)
    assert sel.sum() > 2
    from devo_tpu.data.event_utils import to_voxel_grid, remove_hot_pixels_voxel
    want = remove_hot_pixels_voxel(
        to_voxel_grid(x[sel], y[sel], t[sel].astype(np.float64), p[sel],
                      480, 640, 5), num_stds=10.0)
    np.testing.assert_allclose(vox, want, atol=1e-5)


def test_eds_calib1_selects_other_calibration(tmp_path):
    d = str(tmp_path)
    t, x, y, p = make_stream()
    write_events_h5(os.path.join(d, "events.h5"), t, x, y, p)
    write_identity_rmap(os.path.join(d, "rectify_map_calib1.h5"), 480, 640)
    np.savetxt(os.path.join(d, "images_timestamps_us.txt"), tss_imgs())
    _, intr, _ = next(iter(bm.eds_evs_iterator(d, calib1=True)))
    np.testing.assert_array_equal(intr, bm.EDS_INTRINSICS["calib1"])


# --------------------------------------------------------------- TUM-VIE

def test_tumvie_resize_scales_intrinsics(tmp_path):
    d = str(tmp_path)
    t, x, y, p = make_stream()
    # events live on the full 1280x720 sensor
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1280, len(t))
    y = rng.integers(0, 720, len(t))
    write_events_h5(os.path.join(d, "seq-events_left.h5"), t, x, y, p)
    write_identity_rmap(os.path.join(d, "rectify_map_left.h5"), 720, 1280)
    os.makedirs(os.path.join(d, "left_images_undistorted"))
    np.savetxt(os.path.join(d, "left_images_undistorted",
                            "image_timestamps_left.txt"), tss_imgs())
    calib = {"value0": {"intrinsics": [
        {"intrinsics": {"fx": 1.0, "fy": 1.0, "cx": 1.0, "cy": 1.0}},
        {"intrinsics": {"fx": 2.0, "fy": 2.0, "cx": 2.0, "cy": 2.0}},
        {"intrinsics": {"fx": 900.0, "fy": 901.0, "cx": 640.0, "cy": 360.0}},
        {"intrinsics": {"fx": 910.0, "fy": 911.0, "cx": 641.0, "cy": 361.0}},
    ]}}
    with open(os.path.join(d, "calibration.json"), "w") as f:
        json.dump(calib, f)

    out = list(bm.tumvie_evs_iterator(d, camID=2, H=360, W=640))
    vox, intr, _ = out[0]
    assert vox.shape == (5, 360, 640)       # down-scaled (load_utils.py:103)
    np.testing.assert_allclose(
        intr, [900.0 * 0.5, 901.0 * 0.5, 640.0 * 0.5, 360.0 * 0.5])


# ------------------------------------------------------------------- RPG

def _write_rpg(tmp_path, sim=False):
    d = os.path.join(str(tmp_path), "simulation_3planes" if sim else "seq")
    os.makedirs(d, exist_ok=True)
    t, x, y, p = make_stream()
    np.savetxt(os.path.join(d, "evs_left.txt"),
               np.stack([t, x, y, (p > 0).astype(int)], 1), fmt="%d")
    np.savetxt(os.path.join(d, "calib_undist_left.txt"),
               [100.0, 100.0, W / 2, H / 2])
    if not sim:
        write_identity_rmap(os.path.join(d, "rectify_map_left.h5"), H, W)
    np.savetxt(os.path.join(d, "tss_imgs_us_left.txt"), tss_imgs())
    return d, (t, x, y, p)


def test_rpg_ecd_mid_timestamps_and_last_frame_dropped(tmp_path):
    d, _ = _write_rpg(tmp_path)
    out = list(bm.rpg_evs_iterator(d, H=H, W=W))
    tss = tss_imgs()
    assert len(out) <= N_IMGS - 1           # last image dropped (:640)
    # emitted ts = min((t0 + t1)/2, next stamp) (:664)
    dT_us = np.diff(tss).mean()
    want = min((tss[0] + tss[0] + dT_us) / 2, tss[1]) / 1e6
    np.testing.assert_allclose(out[0][2], want)


def test_rpg_simulation_has_no_rectify_map(tmp_path):
    d, (t, x, y, p) = _write_rpg(tmp_path, sim=True)
    out = list(bm.rpg_evs_iterator(d, H=H, W=W))   # no rectify_map_left.h5
    assert len(out) > 0


# ------------------------------------------------------------------- ECD

def _write_ecd(tmp_path):
    d = str(tmp_path)
    t, x, y, p = make_stream()
    # ECD events.txt is stamped in SECONDS (load_utils.py:715-716)
    np.savetxt(os.path.join(d, "events.txt"),
               np.stack([t / 1e6, x, y, (p > 0).astype(int)], 1),
               fmt="%.9f %d %d %d")
    write_identity_rmap(os.path.join(d, "rectify_map.h5"), H, W)
    np.savetxt(os.path.join(d, "calib_undist.txt"),
               [100.0, 100.0, W / 2, H / 2])
    np.savetxt(os.path.join(d, "tss_us.txt"), tss_imgs())
    return d, (t, x, y, p)


def test_ecd_next_image_windows_and_seconds_events(tmp_path):
    """DELTA_MS=None spans each window to the NEXT image stamp
    (load_utils.py:643-646) — unlike RPG/FPV which default to the mean
    frame spacing; events arrive in seconds and are converted to us."""
    d, (t, x, y, p) = _write_ecd(tmp_path)
    out = list(bm.ecd_evs_iterator(d, H=H, W=W))
    tss = tss_imgs()
    assert len(out) <= N_IMGS - 1           # last image dropped (:640)
    vox, intr, ts = out[0]
    assert vox.shape == (5, H, W)
    # emitted ts = min((t0+t1)/2, next) with t1 == next image stamp
    np.testing.assert_allclose(ts, (tss[0] + tss[1]) / 2 / 1e6)
    # the first voxel must cover exactly the events in [ts0, ts1)
    from devo_tpu.data.event_utils import to_voxel_grid
    sel = (t >= tss[0]) & (t < tss[1])
    want = to_voxel_grid(x[sel], y[sel], t[sel].astype(np.float64), p[sel],
                         H, W, 5)
    np.testing.assert_allclose(vox, want, atol=1e-4)


def test_ecd_explicit_delta_is_range_checked(tmp_path):
    d, _ = _write_ecd(tmp_path)
    with pytest.raises(AssertionError):
        list(bm.ecd_evs_iterator(d, dT_ms=3.0, H=H, W=W))   # (5, 1000) per :705-706
    out = list(bm.ecd_evs_iterator(d, dT_ms=6.0, H=H, W=W))
    # with an explicit window, ts = min((t0 + 6ms)/2 midpoint, next)
    tss = tss_imgs()
    want = min((tss[0] + tss[0] + 6_000) / 2, tss[1]) / 1e6
    np.testing.assert_allclose(out[0][2], want)


def test_ecd_dispatch_and_gt(tmp_path):
    """'ecd' must dispatch to the quirk iterator (not the generic
    fallback), and GT routes through load_ecd_gt (seconds -> us)."""
    d, _ = _write_ecd(tmp_path)
    out = list(bm.benchmark_evs_iterator("ecd", d, H=H, W=W))
    assert len(out) > 0 and out[0][0].shape == (5, H, W)

    rows = np.concatenate([np.arange(4)[:, None] * 1.0,   # seconds
                           np.zeros((4, 6)), np.ones((4, 1))], 1)
    np.savetxt(os.path.join(d, "groundtruth.txt"), rows)
    tss_us, traj = bm.load_benchmark_gt("ecd", d)
    np.testing.assert_allclose(tss_us, np.arange(4) * 1e6)
    assert traj.shape == (4, 7)


# ------------------------------------------------------------------- FPV

def test_fpv_t_offset_and_gt_window_crop(tmp_path):
    d = str(tmp_path)
    t, x, y, p = make_stream()
    t_off = 1_000_000
    # events.txt stamped in SECONDS, offset by t_offset (load_utils.py:1203)
    np.savetxt(os.path.join(d, "events.txt"),
               np.stack([(t + t_off) / 1e6, x, y,
                         (p > 0).astype(int)], 1), fmt="%.9f %d %d %d")
    np.savetxt(os.path.join(d, "t_offset_us.txt"), [t_off], fmt="%d")
    write_identity_rmap(os.path.join(d, "rectify_map.h5"), H, W)
    np.savetxt(os.path.join(d, "calib_undist.txt"),
               [100.0, 100.0, W / 2, H / 2])
    # long image list vs short GT -> crop to the GT window (:1218-1225)
    n_long = 40
    tss_long = np.arange(n_long, dtype=np.float64) * DT_US
    np.savetxt(os.path.join(d, "images_timestamps_us.txt"), tss_long)

    out_full = list(bm.fpv_evs_iterator(d, H=H, W=W))
    assert len(out_full) > 0

    gt_t0, gt_t1 = 6 * DT_US, 12 * DT_US
    tss_gt = np.asarray([gt_t0, gt_t1], np.float64)
    # force the crop branch: image span - gt span > 5 s AND gt starts > 5 s
    # after the first image -> scale everything up
    tss_long2 = tss_long * 1e3              # 10 s spacing
    np.savetxt(os.path.join(d, "images_timestamps_us.txt"), tss_long2)
    tss_gt2 = np.asarray([tss_long2[6], tss_long2[12]])
    out_crop = list(bm.fpv_evs_iterator(d, H=H, W=W, tss_gt_us=tss_gt2,
                                        dT_ms=5.0))
    # frames before the GT window are gone
    assert all(ts >= tss_long2[6] / 1e6 for _, _, ts in out_crop)


# ----------------------------------------------------------------- MVSEC

def test_mvsec_event_index_windows_and_gt(tmp_path):
    d = os.path.join(str(tmp_path), "indoor_flying1_data")
    os.makedirs(d)
    t, x, y, p = make_stream()
    n_imgs = 6
    tss = np.arange(n_imgs, dtype=np.float64) * DT_US + 3_000
    idxs = np.searchsorted(t, tss)          # image_raw_event_inds
    with h5py.File(os.path.join(d, "indoor_flying1_data.hdf5"), "w") as f:
        f.create_dataset("davis/left/image_raw",
                         data=np.zeros((n_imgs, H, W), np.uint8))
        f.create_dataset("davis/left/image_raw_event_inds", data=idxs)
        f.create_dataset("davis/left/events",
                         data=np.stack([x, y, t / 1e6, p], 1))
    np.savetxt(os.path.join(d, "tss_imgs_us_left.txt"), tss)
    np.savetxt(os.path.join(d, "calib_undist_left.txt"),
               [100.0, 100.0, W / 2, H / 2])
    write_identity_rmap(os.path.join(d, "rectify_map_left.h5"), H, W)

    out = list(bm.mvsec_evs_iterator(d, H=H, W=W))
    # windows are index ranges between consecutive images, so every event
    # before image i (and after image i-1) lands in voxel i
    assert 0 < len(out) <= n_imgs
    np.testing.assert_allclose(out[0][2], tss[0] / 1e6)

    # GT hdf5: (N, 4, 4) homogeneous -> (N, 7)
    Tm = np.tile(np.eye(4), (5, 1, 1))
    Tm[:, 0, 3] = np.arange(5)
    with h5py.File(os.path.join(d, "indoor_flying1_gt.hdf5"), "w") as f:
        f.create_dataset("davis/left/pose", data=Tm)
        f.create_dataset("davis/left/pose_ts", data=np.arange(5) * 0.1)
    tss_gt, traj = bm.load_mvsec_traj(d)
    assert traj.shape == (5, 7)
    np.testing.assert_allclose(traj[:, 0], np.arange(5))
    np.testing.assert_allclose(tss_gt, np.arange(5) * 1e5)


# ---------------------------------------------------------------- VECtor

@pytest.mark.parametrize("seq,half", [("desk_fast", True),
                                      ("desk_normal", False)])
def test_vector_dt_rule_and_crops(tmp_path, seq, half):
    d = os.path.join(str(tmp_path), seq)
    os.makedirs(d)
    n_imgs = 80
    tss = np.arange(n_imgs, dtype=np.float64) * DT_US + 2_000
    t, x, y, p = make_stream(t_max_us=int(tss[-1]) + 20_000)
    write_events_h5(os.path.join(d, f"{seq}1.synced.left_event.hdf5"),
                    t, x, y, p)
    write_identity_rmap(os.path.join(d, "rectify_map_left.h5"), H, W)
    np.savetxt(os.path.join(d, "calib_undist_evs_left.txt"),
               [100.0, 100.0, W / 2, H / 2])
    np.savetxt(os.path.join(d, "tss_imgs_us_left.txt"), tss)

    out = list(bm.vector_evs_iterator(d, H=H, W=W))
    imstart, imstop = bm.VECTOR_CROPS[seq]
    n_want = len(tss[imstart:imstop])
    assert len(out) <= n_want
    # crop applied: first emitted ts >= the imstart-th image stamp
    assert out[0][2] >= tss[imstart] / 1e6 - 1e-9
    # dT rule: "fast" halves the window, others double it — verify by
    # recomputing the first voxel with the expected window
    dT = DT_US / 2.0 if half else DT_US * 2.0
    sel = (t >= tss[imstart]) & (t < tss[imstart] + dT)
    from devo_tpu.data.event_utils import to_voxel_grid
    want = to_voxel_grid(x[sel], y[sel], t[sel].astype(np.float64), p[sel],
                         H, W, 5)
    np.testing.assert_allclose(out[0][0], want, atol=1e-5)


# ------------------------------------------------------------------- HKU

def test_hku_crops_and_del_idxs(tmp_path):
    d = os.path.join(str(tmp_path), "HDR_circle")
    os.makedirs(d)
    n_imgs = 2400
    tss = np.arange(n_imgs, dtype=np.float64) * 1000.0   # 1 ms spacing
    t, x, y, p = make_stream(n=20000, t_max_us=int(tss[-1]) + 5000)
    write_events_h5(os.path.join(d, "evs_left.h5"), t, x, y, p)
    write_identity_rmap(os.path.join(d, "rectify_map_left.h5"), H, W)
    np.savetxt(os.path.join(d, "calib_undist_left.txt"),
               [100.0, 100.0, W / 2, H / 2])
    np.savetxt(os.path.join(d, "tss_imgs_us_left.txt"), tss)

    out = list(bm.hku_evs_iterator(d, H=H, W=W, stride=50))
    imstart, imstop = bm.HKU_CROPS["HDR_circle"]
    emitted = np.asarray([ts * 1e6 for _, _, ts in out])
    assert emitted.min() >= tss[imstart] - 1e-3
    assert emitted.max() <= tss[imstop] + 1e-3
    # corrupt frames 1349-1354 are deleted
    for bad in bm.HKU_DEL_IDXS["HDR_circle"]:
        assert not np.any(np.isclose(emitted, tss[bad]))


# ------------------------------------------------------------ GT loaders

def test_gt_loader_formats(tmp_path):
    rows = np.concatenate([np.arange(5)[:, None] * 1e6,
                           np.zeros((5, 6)), np.ones((5, 1))], 1)
    p_us = os.path.join(str(tmp_path), "gt_us.txt")
    np.savetxt(p_us, rows, header="ts x y z qx qy qz qw")
    # eds/tumvie: skiprows=1 handled via the '#'-comment header here
    tss, traj = bm.load_gt_us(p_us)
    assert traj.shape == (5, 7)

    rows_s = rows.copy()
    rows_s[:, 0] = np.arange(5)             # seconds
    p_s = os.path.join(str(tmp_path), "gt_s.txt")
    np.savetxt(p_s, rows_s)
    tss_e, _ = bm.load_ecd_gt(p_s)
    np.testing.assert_allclose(tss_e, np.arange(5) * 1e6)   # s -> us


def test_gt_loaders_reject_unsorted(tmp_path):
    # reference loaders assert sortedness (load_utils.py:607,616); ours must
    # too — associate() searchsorts the GT stamps
    rows = np.concatenate([np.array([3e6, 1e6, 2e6])[:, None],
                           np.zeros((3, 6)), np.ones((3, 1))], 1)
    p = os.path.join(str(tmp_path), "gt.txt")
    np.savetxt(p, rows)
    with pytest.raises(AssertionError):
        bm.load_gt_us(p)


def _write_gt(path, tss_us):
    rows = np.concatenate([np.asarray(tss_us, np.float64)[:, None],
                           np.zeros((len(tss_us), 6)),
                           np.ones((len(tss_us), 1))], 1)
    np.savetxt(path, rows)


def test_load_benchmark_gt_routing(tmp_path):
    """The candidate files each reference eval driver loads, all
    microsecond-stamped with NO unit conversion (eval_rpg_evs.py:50,
    eval_vector_evs.py:42, eval_hku_evs.py:40, eval_fpv_evs.py:55)."""
    tss = np.arange(4, dtype=np.float64) * 1e6

    rpg = tmp_path / "rpg"
    rpg.mkdir()
    _write_gt(str(rpg / "gt_stamped_left.txt"), tss)   # us (pp_rpg.py:16-18)
    got, _ = bm.load_benchmark_gt("rpg", str(rpg))
    np.testing.assert_allclose(got, tss)               # no double 1e6 scale

    vec = tmp_path / "vector"
    vec.mkdir()
    _write_gt(str(vec / "poses_evs_left.txt"), tss)
    got, _ = bm.load_benchmark_gt("vector", str(vec))
    np.testing.assert_allclose(got, tss)

    hku = tmp_path / "hku"
    hku.mkdir()
    _write_gt(str(hku / "gt_stamped_left.txt"), tss)
    got, _ = bm.load_benchmark_gt("hku", str(hku))
    np.testing.assert_allclose(got, tss)

    # fpv prefers the CAMERA-frame GT when both exist
    fpv = tmp_path / "fpv"
    fpv.mkdir()
    _write_gt(str(fpv / "stamped_groundtruth_us.txt"), tss)
    _write_gt(str(fpv / "stamped_groundtruth_us_cam.txt"), tss + 7.0)
    got, _ = bm.load_benchmark_gt("fpv", str(fpv))
    np.testing.assert_allclose(got, tss + 7.0)


def test_write_camera_frame_gt(tmp_path):
    """T_world_cam = T_world_body @ T_body_cam (pp_fpv.py:19-43)."""
    from devo_tpu.data.preprocess import write_camera_frame_gt
    from devo_tpu.utils.pose_utils import poses_quat_to_hom

    rng = np.random.default_rng(3)
    q = rng.standard_normal((5, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gt = np.concatenate([np.arange(5)[:, None] * 0.1,      # seconds
                         rng.standard_normal((5, 3)), q], 1)
    src = str(tmp_path / "gt.txt")
    np.savetxt(src, gt)

    T_body_cam = np.eye(4)
    T_body_cam[:3, 3] = [0.1, -0.2, 0.3]
    out_path = str(tmp_path / "gt_cam.txt")
    write_camera_frame_gt(src, out_path, T_body_cam, tss_to_us=1e6)

    out = np.loadtxt(out_path)
    np.testing.assert_allclose(out[:, 0], np.arange(5) * 1e5, atol=1e-3)
    T_wb = poses_quat_to_hom(gt[:, 1:8])
    T_wc = poses_quat_to_hom(out[:, 1:8])
    np.testing.assert_allclose(T_wc, T_wb @ T_body_cam[None], atol=1e-5)
