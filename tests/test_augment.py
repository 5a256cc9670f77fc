"""Tests for voxel randaug (data/randaug.py) and the RGB-D augmentor
(data/rgbd.py). The reference semantics are torchvision image ops applied to
an events->RGB encoding (/root/reference/utils/voxel_utils.py:55-137,
devo/data_readers/augmentation.py:16-75)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devo_tpu.data import randaug
from devo_tpu.data.rgbd import RGBDAugmentor


def _voxels(key=0, shape=(4, 32, 48, 5)):
    rng = np.random.default_rng(key)
    v = rng.standard_normal(shape).astype(np.float32)
    v *= rng.random(shape) < 0.2
    return jnp.asarray(v)


class TestRandaugOps:
    def _rgb(self):
        v = randaug.rescale_normalize(_voxels())
        return randaug._to_rgb_u8(jnp.moveaxis(v, -1, -3))

    def test_rgb_roundtrip_quantized(self):
        """evs2rgb -> rgb2evs is the identity up to uint8 quantization."""
        v = randaug.rescale_normalize(_voxels())
        x = jnp.moveaxis(v, -1, -3)
        back = randaug._from_rgb_u8(randaug._to_rgb_u8(x))
        assert jnp.max(jnp.abs(back - x)) <= 1.0 / 255.0 + 1e-6
        assert jnp.all(jnp.sign(jnp.where(jnp.abs(x) > 1 / 255, back, 0.0))
                       == jnp.sign(jnp.where(jnp.abs(x) > 1 / 255, x, 0.0)))

    def test_invert_involution(self):
        rgb = self._rgb()
        twice = randaug._invert(randaug._invert(rgb, None), None)
        np.testing.assert_allclose(np.asarray(twice), np.asarray(rgb))

    def test_posterize_identity_at_8_bits(self):
        rgb = self._rgb()
        np.testing.assert_allclose(np.asarray(randaug._posterize(rgb, 8.0)),
                                   np.asarray(rgb))

    def test_posterize_masks_low_bits(self):
        rgb = self._rgb()
        out = np.asarray(randaug._posterize(rgb, 4.0)).astype(np.int64)
        assert np.all(out % 16 == 0)

    def test_solarize_threshold_zero_inverts(self):
        rgb = self._rgb()
        np.testing.assert_allclose(np.asarray(randaug._solarize(rgb, 0.0)),
                                   np.asarray(randaug._invert(rgb, None)))

    def test_brightness_scales(self):
        rgb = self._rgb()
        out = randaug._brightness(rgb, 0.5)
        np.testing.assert_allclose(np.asarray(out),
                                   np.floor(np.asarray(rgb) * 0.5))

    def test_contrast_blend_bounds(self):
        rgb = self._rgb()
        out = np.asarray(randaug._contrast(rgb, 0.1))
        assert out.min() >= 0.0 and out.max() <= 255.0

    def test_sharpness_keeps_borders(self):
        rgb = self._rgb()
        out = np.asarray(randaug._sharpness(rgb, 2.0))
        ref = np.asarray(rgb)
        np.testing.assert_allclose(out[..., 0, :, :], ref[..., 0, :, :])
        np.testing.assert_allclose(out[..., -1, :], ref[..., -1, :])

    def test_all_ops_preserve_uint8_range(self):
        rgb = self._rgb()
        table = np.asarray(randaug._factor_table())
        for i, op in enumerate(randaug._OPS):
            out = np.asarray(op(rgb, jnp.float32(table[i, 3])))
            assert out.min() >= 0.0 and out.max() <= 255.0, op.__name__
            assert np.all(out == np.floor(out)), op.__name__


class TestVoxelAugment:
    def test_jit_and_shapes(self):
        v = _voxels()
        out = jax.jit(randaug.voxel_augment)(v, jax.random.PRNGKey(0))
        assert out.shape == v.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_output_is_std_normalized(self):
        v = _voxels()
        out = np.asarray(randaug.voxel_augment(v, jax.random.PRNGKey(3)))
        nz = out[out != 0]
        if nz.size > 10:
            assert abs(nz.mean()) < 0.2
            assert abs(nz.std() - 1.0) < 0.2

    def test_every_op_reachable_and_finite(self):
        v = _voxels()
        seen = set()
        for s in range(40):
            key = jax.random.PRNGKey(s)
            op_i = int(jax.random.randint(jax.random.split(key)[0], (), 0,
                                          len(randaug._OPS)))
            seen.add(op_i)
            out = randaug.voxel_augment(v, key)
            assert np.all(np.isfinite(np.asarray(out))), f"op {op_i}"
        assert len(seen) == len(randaug._OPS)

    def test_maybe_gate(self):
        v = _voxels()
        out = randaug.maybe_voxel_augment(v, jax.random.PRNGKey(0), "std",
                                          prob=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(v))
        out = randaug.maybe_voxel_augment(v, jax.random.PRNGKey(0), "std",
                                          prob=1.0)
        assert not np.allclose(np.asarray(out), np.asarray(v))


class TestRGBDAugmentor:
    def _clip(self, n=3, h=64, w=96):
        rng = np.random.default_rng(0)
        imgs = rng.random((n, h, w, 3)).astype(np.float32) * 255.0
        depths = 1.0 + rng.random((n, h, w)).astype(np.float32)
        poses = np.tile(np.asarray([0, 0, 0, 0, 0, 0, 1.0], np.float32), (n, 1))
        intr = np.tile(np.asarray([80.0, 80.0, w / 2, h / 2], np.float32), (n, 1))
        return imgs, poses, depths, intr

    def test_shapes_and_ranges(self):
        imgs, poses, depths, intr = self._clip()
        aug = RGBDAugmentor((48, 64), np.random.default_rng(1))
        for _ in range(5):
            im2, p2, d2, in2 = aug(imgs, poses, 1.0 / depths, intr)
            assert im2.shape == (3, 48, 64, 3)
            assert d2.shape == (3, 48, 64)
            # bicubic resize overshoots [0, 255] slightly, as the
            # reference's unclamped F.interpolate(mode='bicubic') does
            assert np.all(np.isfinite(im2))
            assert im2.min() >= -80.0 and im2.max() <= 335.0
            assert np.all(np.isfinite(d2))
            np.testing.assert_allclose(p2, poses)

    def test_intrinsics_follow_crop(self):
        imgs, poses, depths, intr = self._clip()
        rng = np.random.default_rng(2)
        aug = RGBDAugmentor((48, 64), rng)
        im2, _, _, in2 = aug(imgs, poses, 1.0 / depths, intr)
        # principal point must stay inside the crop
        assert np.all(in2[:, 2] > 0) and np.all(in2[:, 2] < 64)
        assert np.all(in2[:, 3] > 0) and np.all(in2[:, 3] < 48)
        # focal scaled by the same factor as the image
        scale = in2[0, 0] / intr[0, 0]
        assert 0.5 < scale < 2.0

    def test_grayscale_branch(self):
        imgs, poses, depths, intr = self._clip()
        aug = RGBDAugmentor((48, 64), np.random.default_rng(0))
        g = aug.color_transform(imgs)
        assert g.shape == imgs.shape
        assert g.dtype == np.float32

    def test_identity_scale_geometry(self):
        """With the augmentor's rng pinned to scale=1, crop is pure center
        crop and depth values are preserved."""
        imgs, poses, depths, intr = self._clip()

        class FixedRng:
            def random(self, *a):
                return np.float64(0.9) if not a else np.full(a[0], 0.9)
            def uniform(self, lo, hi):  # unused when random() >= 0.8
                return 0.0
            def permutation(self, n):
                return np.arange(n)
        aug = RGBDAugmentor((48, 64), FixedRng())
        im2, _, d2, _ = aug(imgs, poses, 1.0 / depths, intr)
        y0, x0 = (64 - 48) // 2, (96 - 64) // 2
        np.testing.assert_allclose(d2, (1.0 / depths)[:, y0:y0 + 48, x0:x0 + 64])
        np.testing.assert_allclose(im2, imgs[:, y0:y0 + 48, x0:x0 + 64])
