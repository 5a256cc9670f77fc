"""Golden test: Pallas correlation kernel vs the XLA reference implementation.

Runs in interpreter mode on CPU (pl.pallas_call(interpret=...) via
pltpu.force_tpu_interpret_mode) over shapes small enough to execute quickly;
the on-TPU compiled path is exercised by bench.py and the engine.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import corr_pallas


def make_case(seed=0, E=24, mem=4, H=32, W=40, C=128, M=16, P=3,
              coord_range=None):
    rng = np.random.default_rng(seed)
    gmap = rng.standard_normal((M, P, P, C)).astype(np.float32)
    fmap = rng.standard_normal((mem, H, W, C)).astype(np.float32)
    kk = rng.integers(0, M, E).astype(np.int32)
    jj = rng.integers(0, mem, E).astype(np.int32)
    lo_x, hi_x = coord_range or (-6, W + 6)
    cx = rng.uniform(lo_x, hi_x, (E, 1, 1))
    cy = rng.uniform(-6, H + 6, (E, 1, 1))
    off = np.arange(P) - P // 2
    coords = np.stack([
        np.broadcast_to(cx + off[None, None, :], (E, P, P)),
        np.broadcast_to(cy + off[None, :, None], (E, P, P)),
    ], -1).astype(np.float32)
    mask = rng.random(E) < 0.9
    return (jnp.asarray(gmap), jnp.asarray(fmap), jnp.asarray(coords),
            jnp.asarray(kk), jnp.asarray(jj), jnp.asarray(mask))


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_corr_matches_xla(seed):
    gmap, fmap, coords, kk, jj, mask = make_case(seed)
    # the kernel computes in bf16 (as the engine's mixed-precision path
    # does); quantize the reference inputs identically
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_pallas(gmap, fmap, coords, kk, jj, mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_pallas_corr_out_of_bounds_taps_zero():
    # centers far off-image: all taps out of bounds -> exact zeros
    gmap, fmap, coords, kk, jj, mask = make_case(
        seed=2, E=8, coord_range=(-300, -200))
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_pallas(gmap, fmap, coords, kk, jj, mask)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("ablate", ["split", "full"])
def test_banded_corr_matches_xla(seed, ablate):
    # both shipping kernel variants (phase-split default + interleaved
    # 'full' with rotating scratches) must stay parity-covered
    gmap, fmap, coords, kk, jj, mask = make_case(seed, E=24)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], ablate=ablate)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_banded_corr_early_exit_blocks():
    """Blocks past n_live are skipped; the prefix must still be exact."""
    E = 2 * corr_pallas.BE
    gmap, fmap, coords, kk, jj, _ = make_case(4, E=E)
    live = corr_pallas.BE - 8
    mask = jnp.arange(E) < live
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=live,
            hp=corr_pallas.banded_shape(32, 40)[1])
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_banded_corr_pyramid_shapes():
    gmap, fmap, coords, kk, jj, mask = make_case(5, E=16)
    fmap2 = fmap.reshape(fmap.shape[0], fmap.shape[1] // 4, 4,
                         fmap.shape[2] // 4, 4, -1).mean((2, 4))
    pyr = (jnp.stack([corr_pallas.band_frame(f) for f in fmap]),
           jnp.stack([corr_pallas.band_frame(f) for f in fmap2]))
    with pltpu.force_tpu_interpret_mode():
        out = corr_pallas.corr_pyramid_banded(
            gmap, pyr, coords, kk, jj, mask, n_live=16, hw=(32, 40))
    assert out.shape == (16, 2 * 49 * 9)


@pytest.mark.parametrize("win_rows", [10, 12])
def test_banded_corr_small_window_matches_xla(win_rows):
    """Shrunk DMA windows (upper pyramid levels: 10 rows at lvl 4) must be
    exact for patches whose y-spread fits the budget (make_case patches
    span exactly 2 px = the win_rows=10 budget)."""
    gmap, fmap, coords, kk, jj, mask = make_case(6, E=24)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], win_rows=win_rows)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


@pytest.mark.parametrize("seed", [0, 3])
def test_banded_corr_i8_matches_xla(seed):
    """int8 banded rings (flat layout + per-slot dequant scale) must match
    the XLA reference computed over the identically-quantized features."""
    gmap, fmap, coords, kk, jj, mask = make_case(seed, E=24)
    qs = [corr_pallas.band_frame_i8(f) for f in fmap]
    fmap_b = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    assert fmap_b.dtype == jnp.int8
    # reference over the dequantized features (the exact int values the
    # kernel sees, times the scale it applies on the output)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    s = jnp.max(jnp.abs(fmap), axis=(1, 2, 3), keepdims=True) / 127.0
    fq = jnp.clip(jnp.round(fmap / s), -127, 127) * s
    want = corr_ops.corr(gb, fq, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], scale=scale)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_band_frame_i8_quantization_error_small():
    """End-to-end quantization error of the i8 rings vs float correlation:
    must stay far below the correlation magnitudes the update net consumes."""
    gmap, fmap, coords, kk, jj, mask = make_case(7, E=24)
    want = corr_ops.corr(gmap, fmap, coords, kk, jj, radius=3)
    qs = [corr_pallas.band_frame_i8(f) for f in fmap]
    fmap_b = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], scale=scale)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    err = np.abs(np.asarray(got) - want)
    assert np.median(err[np.asarray(mask)]) < 0.2   # corr values are O(20)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("win_rows", [16, 10])
def test_banded_g8c_matches_xla(seed, win_rows):
    """Compact group kernel (no in-kernel extraction; XLA extract_blend_g8)
    must match the gather reference, at both per-level window sizes."""
    gmap, fmap, coords, kk, jj, mask = make_case(seed, E=24)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], ablate="g8c",
            win_rows=win_rows)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_banded_g8c_i8_matches_xla():
    """g8c over int8 flat-layout rings: per-edge dequant scale is applied in
    extract_blend_g8 (lane-mapped), not in the kernel."""
    gmap, fmap, coords, kk, jj, mask = make_case(1, E=24)
    qs = [corr_pallas.band_frame_i8(f) for f in fmap]
    fmap_b = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    s = jnp.max(jnp.abs(fmap), axis=(1, 2, 3), keepdims=True) / 127.0
    fq = jnp.clip(jnp.round(fmap / s), -127, 127) * s
    want = corr_ops.corr(gb, fq, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], scale=scale,
            ablate="g8c")
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_banded_g8c_early_exit_blocks():
    """Blocks past n_live skip; the compact output for them is uninitialized
    and extract_blend_g8's mask select must still zero those edges."""
    E = 2 * corr_pallas.BE
    gmap, fmap, coords, kk, jj, _ = make_case(4, E=E)
    live = corr_pallas.BE - 8
    mask = jnp.arange(E) < live
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=live, ablate="g8c",
            hp=corr_pallas.banded_shape(32, 40)[1])
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


@pytest.mark.parametrize("seed", [0, 3])
def test_banded_g8_matches_xla(seed):
    """The block-diagonal group kernel must be numerically identical to the
    per-edge kernel path (same taps, one matmul per 8 edges)."""
    gmap, fmap, coords, kk, jj, mask = make_case(seed, E=24)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    fb = fmap.astype(jnp.bfloat16).astype(jnp.float32)
    want = corr_ops.corr(gb, fb, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=coords.shape[0],
            hp=corr_pallas.banded_shape(32, 40)[1], ablate="g8")
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_l4_resident_matches_xla(seed):
    """VMEM-resident level-4 kernel vs the gather reference on int8-exact
    quantized frames (dequant scale applied in-kernel)."""
    gmap, fmap, coords, kk, jj, mask = make_case(seed, E=24)
    qs = [corr_pallas.pad_frame_l4_i8(f) for f in fmap]
    fmap_p = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    s4 = jnp.max(jnp.abs(fmap), axis=(1, 2, 3), keepdims=True) / 127.0
    fq = jnp.clip(jnp.round(fmap / s4), -127, 127) * s4
    want = corr_ops.corr(gb, fq, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_l4_resident(
            gmap, fmap_p, coords, kk, jj, mask, n_live=coords.shape[0],
            scale=scale)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_l4_resident_early_exit_blocks():
    """Blocks past n_live skip; outputs for dead edges must still be zero
    through the blend mask."""
    E = 2 * corr_pallas.BE
    gmap, fmap, coords, kk, jj, _ = make_case(4, E=E)
    live = corr_pallas.BE - 8
    mask = jnp.arange(E) < live
    qs = [corr_pallas.pad_frame_l4_i8(f) for f in fmap]
    fmap_p = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    s4 = jnp.max(jnp.abs(fmap), axis=(1, 2, 3), keepdims=True) / 127.0
    fq = jnp.clip(jnp.round(fmap / s4), -127, 127) * s4
    want = corr_ops.corr(gb, fq, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_l4_resident(
            gmap, fmap_p, coords, kk, jj, mask, n_live=live, scale=scale)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)


def test_l4_resident_out_of_bounds_taps_zero():
    gmap, fmap, coords, kk, jj, mask = make_case(
        seed=2, E=8, coord_range=(-300, -200))
    qs = [corr_pallas.pad_frame_l4_i8(f) for f in fmap]
    fmap_p = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_l4_resident(
            gmap, fmap_p, coords, kk, jj, mask, n_live=coords.shape[0],
            scale=scale)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)


def _i8_pyramid(fmap):
    """Build a two-level int8 banded pyramid (level-2 via 2x2 mean pool so
    the test stays small) + per-level scales + dequantized references."""
    fmap2 = fmap.reshape(fmap.shape[0], fmap.shape[1] // 2, 2,
                         fmap.shape[2] // 2, 2, -1).mean((2, 4))
    pyr, scales, deq = [], [], []
    for fm in (fmap, fmap2):
        qs = [corr_pallas.band_frame_i8(f) for f in fm]
        pyr.append(jnp.stack([q for q, _ in qs]))
        scales.append(jnp.stack([s for _, s in qs]))
        s = jnp.max(jnp.abs(fm), axis=(1, 2, 3), keepdims=True) / 127.0
        deq.append(jnp.clip(jnp.round(fm / s), -127, 127) * s)
    return tuple(pyr), tuple(scales), deq


@pytest.mark.parametrize("variant", ["pair", "pair2", "mono", "mono2", "mono3", "mono4"])
@pytest.mark.parametrize("seed", [0, 3])
def test_pair_i8_matches_reference(seed, variant):
    """The merged two-level kernel vs the gather reference on int8-exact
    quantized frames, both levels."""
    gmap, fmap, coords, kk, jj, mask = make_case(seed, E=24)
    pyr, scales, deq = _i8_pyramid(fmap)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    wants = [corr_ops.corr(gb, fq, coords / lvl, kk, jj, radius=3)
             for fq, lvl in zip(deq, (1, 2))]
    want = np.stack([np.asarray(w) for w in wants], -1).reshape(24, -1)
    want = want * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_pyramid_banded(
            gmap, pyr, coords, kk, jj, mask, n_live=24, hw=(32, 40),
            levels=(1, 2), scales=scales, wins=(16, 12), variant=variant)
    # error budget vs the f32 oracle: i8 ring quantization (dominant, with
    # cancellation cases near 5e-2 already) for the f32-out 'pair' variant;
    # the bf16-out variants (pair2/mono/mono2/mono3) add one product
    # rounding on the out surface (ADVICE r04: keep the pre-existing 5e-2
    # regression bound for the variant whose numerics did not change)
    atol = 5e-2 if variant == "pair" else 0.12
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-2)


@pytest.mark.parametrize("variant", ["pair", "pair2", "mono", "mono2", "mono3", "mono4"])
@pytest.mark.parametrize("i8", [False, True], ids=["bf16", "i8"])
def test_pair_matches_split(i8, variant):
    """pair must agree with the per-level split kernels on the SAME rings
    (identical math, merged schedule)."""
    gmap, fmap, coords, kk, jj, mask = make_case(5, E=24)
    if i8:
        pyr, scales, _ = _i8_pyramid(fmap)
    else:
        fmap2 = fmap.reshape(fmap.shape[0], fmap.shape[1] // 2, 2,
                             fmap.shape[2] // 2, 2, -1).mean((2, 4))
        pyr = tuple(jnp.stack([corr_pallas.band_frame(f) for f in fm])
                    for fm in (fmap, fmap2))
        scales = None
    kw = dict(n_live=24, hw=(32, 40), levels=(1, 2), scales=scales,
              wins=(16, 12))
    with pltpu.force_tpu_interpret_mode():
        ref = corr_pallas.corr_pyramid_banded(
            gmap, pyr, coords, kk, jj, mask, variant="split", **kw)
        got = corr_pallas.corr_pyramid_banded(
            gmap, pyr, coords, kk, jj, mask, variant=variant, **kw)
    if i8 and variant in ("pair2", "mono", "mono2", "mono3", "mono4"):
        # these variants store a bf16 out surface; on the i8 path the f32
        # dequant-scale product is re-rounded to bf16 (rel <= 2^-8) while
        # split keeps f32 out. Taps reach ~50 (bf16 ulp 0.25) and the
        # bilinear blend cancels, so small outputs need an atol term.
        # bf16 rings are exact (values pass through the bf16 R scratch
        # unchanged) and stay bitwise below.
        tol = dict(atol=0.1, rtol=5e-3)
    else:
        tol = dict(atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


@pytest.mark.parametrize("variant", ["pair", "pair2", "mono", "mono2", "mono3", "mono4"])
def test_pair_early_exit_blocks(variant):
    """Blocks past n_live skip in the merged kernel; the live prefix must
    stay exact and dead edges zero."""
    E = 2 * corr_pallas.BE
    gmap, fmap, coords, kk, jj, _ = make_case(4, E=E)
    live = corr_pallas.BE - 8
    mask = jnp.arange(E) < live
    pyr, scales, deq = _i8_pyramid(fmap)
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    wants = [corr_ops.corr(gb, fq, coords / lvl, kk, jj, radius=3)
             for fq, lvl in zip(deq, (1, 2))]
    want = np.stack([np.asarray(w) for w in wants], -1).reshape(E, -1)
    want = want * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_pyramid_banded(
            gmap, pyr, coords, kk, jj, mask, n_live=live, hw=(32, 40),
            levels=(1, 2), scales=scales, wins=(16, 12), variant=variant)
    # i8 quantization + bf16 out budget (see test_pair_i8_matches_reference)
    atol = 5e-2 if variant == "pair" else 0.12
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-2)


@pytest.mark.parametrize("i8", [False, True], ids=["bf16", "i8"])
def test_split2_matches_split(i8):
    """The software-pipelined kernel must agree with plain split exactly
    (same math, lagged schedule), across multiple blocks."""
    E = 3 * corr_pallas.BE
    gmap, fmap, coords, kk, jj, mask = make_case(8, E=E)
    if i8:
        qs = [corr_pallas.band_frame_i8(f) for f in fmap]
        fmap_b = jnp.stack([q for q, _ in qs])
        scale = jnp.stack([s for _, s in qs])
    else:
        fmap_b = jnp.stack([corr_pallas.band_frame(f) for f in fmap])
        scale = None
    kw = dict(n_live=E, hp=corr_pallas.banded_shape(32, 40)[1], scale=scale)
    with pltpu.force_tpu_interpret_mode():
        ref = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, ablate="split", **kw)
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, ablate="split2", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_split2_early_exit_blocks():
    """Dead blocks skip both pipeline phases; live prefix exact, dead edges
    zero after the blend mask."""
    E = 3 * corr_pallas.BE
    gmap, fmap, coords, kk, jj, _ = make_case(9, E=E)
    live = corr_pallas.BE + 5
    mask = jnp.arange(E) < live
    qs = [corr_pallas.band_frame_i8(f) for f in fmap]
    fmap_b = jnp.stack([q for q, _ in qs])
    scale = jnp.stack([s for _, s in qs])
    gb = gmap.astype(jnp.bfloat16).astype(jnp.float32)
    s = jnp.max(jnp.abs(fmap), axis=(1, 2, 3), keepdims=True) / 127.0
    fq = jnp.clip(jnp.round(fmap / s), -127, 127) * s
    want = corr_ops.corr(gb, fq, coords, kk, jj, radius=3)
    want = np.asarray(want) * np.asarray(mask)[:, None]
    with pltpu.force_tpu_interpret_mode():
        got = corr_pallas.corr_level_banded(
            gmap, fmap_b, coords, kk, jj, mask, n_live=live,
            hp=corr_pallas.banded_shape(32, 40)[1], scale=scale,
            ablate="split2")
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-2, rtol=1e-2)
