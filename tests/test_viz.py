"""Visualization surface tests (devo_tpu/utils/viz.py vs
/root/reference/utils/viz_utils.py + devo/plot_utils.py): every public
function runs headless and produces the expected images/files."""
import os

import numpy as np
import pytest

from devo_tpu.utils import viz


@pytest.fixture()
def voxel():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((5, 24, 32)).astype(np.float32)
    return v * (np.abs(v) > 1.0)


def test_render_voxel_polarity(voxel):
    img = viz.render_voxel(voxel)
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8
    s = voxel.sum(0)
    # positive -> red, negative -> blue, silent -> white (viz_utils render
    # convention, reference :12-26 uses the same 3-color coding)
    assert (img[s > 1e-3] == (255, 0, 0)).all()
    assert (img[s < -1e-3] == (0, 0, 255)).all()
    assert (img[np.abs(s) <= 1e-3] == 255).all()


def test_render_events_last_polarity():
    x = np.array([1, 1, 5]); y = np.array([2, 2, 3])
    p = np.array([1, 0, 1])
    img = viz.render_events(x, y, p, 8, 8)
    assert (img[2, 1] == (255, 0, 0)).all()   # last event at (1,2) is neg
    assert (img[3, 5] == (0, 0, 255)).all()
    assert (img[0, 0] == 255).all()


def test_scorer_and_depth_maps():
    s = np.linspace(0, 1, 12).reshape(3, 4)
    hm = viz.render_scorer_map(s)
    dm = viz.render_depth_map(s)
    assert hm.shape == dm.shape == (3, 4, 3)
    assert hm[0, 0, 0] < hm[-1, -1, 0]  # red channel increases with score


def test_draw_patches_and_flow_lines():
    img = np.zeros((20, 30, 3), np.uint8)
    out = viz.draw_patches(img, np.array([[5.0, 5.0], [200.0, 5.0]]))
    assert (out[5, 5] == (0, 255, 0)).all()    # in-bounds drawn
    assert out.sum() == 9 * 255                # 3x3 green; oob skipped
    out2 = viz.draw_flow_lines(img, np.array([[2.0, 2.0]]),
                               np.array([[10.0, 10.0]]))
    assert out2.sum() > 0


def test_plot_trajectory_and_pose(tmp_path):
    t = np.linspace(0, 1, 50)
    est = np.stack([np.cos(t), np.sin(t), t], -1)
    gt = est + 0.01
    p1 = tmp_path / "traj.png"
    viz.plot_trajectory(str(p1), est, gt, title="test")
    p2 = viz.visualize_pose(est, gt, plot_axes="xz",
                            path=str(tmp_path / "pose.png"))
    assert p1.exists() and os.path.exists(p2)


def test_save_voxels_and_flow_viz(tmp_path, voxel):
    paths = viz.save_voxels(voxel[None], str(tmp_path / "vox"))
    assert paths and all(os.path.exists(p) for p in paths)

    flow_data = {3: {"ii": np.array([2, 2]), "jj": np.array([3, 3]),
                     "coords_est": np.random.rand(2, 3, 3, 2) * 6,
                     "coords_src": np.random.rand(2, 2) * 6,
                     "img": voxel}}
    viz.viz_flow_inference(str(tmp_path), flow_data)
    assert os.path.exists(tmp_path / "flow_viz" / "000003.png")
    viz.save_flow_visualization(str(tmp_path / "fv"), flow_data)


def test_patch_following_variants(tmp_path, voxel):
    images = [voxel, voxel, voxel]
    rec = {"ii": np.array([0, 0, 1]), "jj": np.array([1, 1, 2]),
           "coords_est": np.random.rand(3, 3, 3, 2) * 6}
    patch_data = {1: rec, 2: rec}
    viz.plot_patch_following(images, patch_data, str(tmp_path / "pf"),
                             num_frame_pairs=2)
    paths = viz.plot_patch_following_all(images, patch_data,
                                         str(tmp_path / "pfa"),
                                         num_frame_pairs=2)
    assert all(os.path.exists(p) for p in paths)


def test_plot_flow_train_and_depths(tmp_path, voxel):
    n, E = 5, 12
    rng = np.random.default_rng(1)
    voxels = np.stack([voxel] * n).transpose(0, 2, 3, 1)  # (N, H, W, bins)
    step = {"ii": rng.integers(0, n, E), "jj": rng.integers(0, n, E),
            "coords": rng.random((E, 3, 3, 2)) * 6,
            "coords_gt": rng.random((E, 3, 3, 2)) * 6,
            "emask": np.ones(E, bool)}
    paths = viz.plot_flow_train(voxels, step, str(tmp_path / "ft"),
                                fidx_center=2)
    assert all(os.path.exists(p) for p in paths)

    patches = rng.random((n, 4, 3, 3, 3)).astype(np.float32)
    viz.plot_patch_depths([voxel] * n, patches, str(tmp_path / "pd"))
    assert os.path.exists(tmp_path / "pd" / "depth_000000.png")


def test_plot_flow_train_single_frame(tmp_path, voxel):
    """n=1 leaves no neighbor panels; must still save a (blank) figure
    instead of crashing on a zero-width figsize."""
    step = {"ii": np.zeros(2, int), "jj": np.zeros(2, int),
            "coords": np.zeros((2, 3, 3, 2)), "coords_gt": np.zeros((2, 3, 3, 2)),
            "emask": np.ones(2, bool)}
    paths = viz.plot_flow_train(voxel[None].transpose(0, 2, 3, 1), step,
                                str(tmp_path))
    assert all(os.path.exists(p) for p in paths)
