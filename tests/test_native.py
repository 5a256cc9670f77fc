"""Native voxelizer vs NumPy reference parity + event-utils unit tests."""
import numpy as np
import pytest

from devo_tpu.data import event_utils as eu


def make_events(n=5000, H=60, W=80, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, W + 1, n).astype(np.float32)
    y = rng.uniform(-1, H + 1, n).astype(np.float32)
    t = np.sort(rng.integers(0, 100_000, n)).astype(np.int64)
    p = rng.choice([-1, 1], n).astype(np.int8)
    return x, y, t, p


def test_voxel_grid_basic_properties():
    H, W = 60, 80
    x, y, t, p = make_events(H=H, W=W)
    vox = eu.to_voxel_grid(x, y, t, p, H, W, 5)
    assert vox.shape == (5, H, W)
    # total mass ~ sum of polarities of in-bounds events (trilinear preserves mass)
    inb = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    np.testing.assert_allclose(vox.sum(), p[inb].sum(), atol=abs(p[~inb]).sum() + 1)


def test_native_voxelizer_matches_numpy():
    native = pytest.importorskip("devo_tpu.native")
    if not native.available():
        pytest.skip("no compiler")
    H, W = 60, 80
    x, y, t, p = make_events(H=H, W=W, seed=1)
    want = eu.to_voxel_grid(x, y, t, p, H, W, 5)
    got = native.to_voxel_grid(x, y, t, p, H, W, 5)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_native_voxelizer_with_rectify_map():
    native = pytest.importorskip("devo_tpu.native")
    if not native.available():
        pytest.skip("no compiler")
    H, W = 40, 50
    rng = np.random.default_rng(2)
    x = rng.integers(0, W, 3000).astype(np.float32)
    y = rng.integers(0, H, 3000).astype(np.float32)
    t = np.sort(rng.integers(0, 50_000, 3000)).astype(np.int64)
    p = rng.choice([-1, 1], 3000).astype(np.int8)
    rmap = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1).astype(np.float32)
    rmap += rng.normal(0, 0.5, rmap.shape).astype(np.float32)
    want = eu.to_voxel_grid(x, y, t, p, H, W, 5, rectify_map=rmap)
    got = native.to_voxel_grid(x, y, t, p, H, W, 5, rectify_map=rmap)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_native_ms_to_idx_matches_numpy():
    native = pytest.importorskip("devo_tpu.native")
    if not native.available():
        pytest.skip("no compiler")
    t = np.sort(np.random.default_rng(3).integers(0, 500_000, 10_000)).astype(np.int64)
    np.testing.assert_array_equal(native.compute_ms_to_idx(t),
                                  eu.compute_ms_to_idx(t))


def test_ms_to_idx_invariant():
    t = np.sort(np.random.default_rng(4).integers(0, 100_000, 2000)).astype(np.int64)
    idx = eu.compute_ms_to_idx(t)
    for ms in (0, 13, 57, len(idx) - 1):
        i = idx[ms]
        assert i == len(t) or t[i] >= ms * 1000
        if i > 0:
            assert t[i - 1] < ms * 1000


def test_hot_pixel_filter():
    vox = np.zeros((5, 20, 20), np.float32)
    vox[:, 5, 5] = 100.0   # hot pixel
    vox[:, 1, 1] = 0.1
    out = eu.remove_hot_pixels_voxel(vox, num_stds=3.0)
    assert out[:, 5, 5].sum() == 0.0
    assert out[:, 1, 1].sum() > 0.0


def test_event_slicer_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    n = 5000
    rng = np.random.default_rng(5)
    t = np.sort(rng.integers(0, 200_000, n)).astype(np.int64)
    fn = tmp_path / "events.h5"
    with h5py.File(fn, "w") as f:
        f.create_dataset("events/t", data=t)
        for k in "xyp":
            f.create_dataset(f"events/{k}", data=rng.integers(0, 100, n))
    with h5py.File(fn, "r") as f:
        sl = eu.EventSlicer(f)
        ev = sl.get_events(10_000, 60_000)
        assert ev is not None
        assert (ev["t"] >= 10_000).all() and (ev["t"] < 60_000).all()
        want = ((t >= 10_000) & (t < 60_000)).sum()
        assert len(ev["t"]) == want


def test_quantize_i8_matches_numpy():
    """Fused C++ i8 wire quantizer == the NumPy reference formula
    (engine.upload hot path; devo_tpu/native/voxelizer.cpp:quantize_i8)."""
    from devo_tpu import native
    rng = np.random.default_rng(7)
    v = (rng.standard_normal((32, 40, 5)) * (rng.random((32, 40, 5)) < 0.2)
         ).astype(np.float32)
    q, s = native.quantize_i8(v)
    m = float(np.abs(v).max())
    s_ref = m / 127.0
    q_ref = np.clip(np.rint(v / np.float32(s_ref)), -127, 127).astype(np.int8)
    assert q.dtype == np.int8 and q.shape == v.shape
    np.testing.assert_array_equal(q, q_ref)
    np.testing.assert_allclose(s, s_ref, rtol=1e-6)
    # dequantized error bounded by half a step
    np.testing.assert_allclose(q.astype(np.float32) * s, v, atol=s / 2 + 1e-9)
    # empty / all-zero input: scale 1, zeros
    q0, s0 = native.quantize_i8(np.zeros((4, 4), np.float32))
    assert s0 == 1.0 and not q0.any()
