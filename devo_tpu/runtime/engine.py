"""The DEVO inference engine as a jit-compiled state machine.

TPU-native redesign of /root/reference/devo/devo.py (`class DEVO`). The
reference is an object-oriented mutable engine with dynamically growing edge
lists and per-iteration CPU round-trips (fastba.neighbors). Here the entire
per-frame tracking step — normalization, patchify CNNs, patch selection,
motion model, edge appends, the recurrent update + bundle adjustment, and
keyframing — is one pure function over a fixed-shape `VOState` pytree,
compiled once by XLA.

Key data structure: a fixed-capacity edge table kept **packed and sorted by
(patch id kk, target frame jj)** at all times. Because appends arrive in
sorted order by construction (each new frame adds one max-jj edge per live
patch, plus a fresh max-kk block) and removals preserve relative order, the
invariant is maintained with O(E) cumsum/searchsorted index arithmetic and
dense gathers — no argsort, no scatter (both serialize on TPU). Sortedness
then makes every downstream reduction cheap:

  * temporal neighbors = adjacent rows (vs the reference's CPU sort,
    fastba/ba.cpp:104-149);
  * SoftAgg patch-groups and the BA patch diagonal = cumsum boundary sums;
  * BA pose blocks = one-hot matmuls on the MXU;
  * frame-pair SoftAgg groups = one-hot matmul (<= ~700 groups).

Feature ring buffers (mem = 32, devo.py:69-86), keyframe buffer shifts
(devo.py:285-303) and all control flow run on device via whole-buffer
gathers and lax.cond. The host only feeds voxels and drains a small aux
record per frame to rebuild the full-rate trajectory (devo.py:186-208).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.data.normalize import normalize
from devo_tpu.geom import edgewise
from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3
from devo_tpu.nets.evonet import EVONet
from devo_tpu.ops import ba as ba_ops
from devo_tpu.ops import corr as corr_ops
from devo_tpu.ops import corr_pallas
from devo_tpu.ops import graph as graph_ops
from devo_tpu.ops import lookup as lookup_ops
from devo_tpu.ops import table as table_ops

from .config import VOConfig

# numpy scalar on purpose: a module-level jnp constant instantiates the
# device backend at import time (hanging every CLI if the tunnel is down)
INT_MAX = np.int32(0x7FFFFFFF)


class VOState(NamedTuple):
    # frame buffers (N = BUFFER_SIZE)
    tstamps: jnp.ndarray      # (N,) i32 frame-counter values
    poses: jnp.ndarray        # (N, 7) f32 world-to-camera
    patches: jnp.ndarray      # (N*M, 3*P*P) f32, flat [x(PP), y(PP), d(PP)]
                              # (a (.,3,P,P) layout tile-pads ~30x on TPU)
    intrinsics: jnp.ndarray   # (N, 4) f32 (feature-resolution)
    colors: jnp.ndarray       # (N, M) f32 event magnitude for viz

    # feature ring buffers (mem = 32)
    imap: jnp.ndarray         # (mem*M, Di)
    gmap: jnp.ndarray         # (mem*M, P, P, Df)
    fmap1: jnp.ndarray        # (mem, h1, w1, Df)
    fmap2: jnp.ndarray        # (mem, h1//4, w1//4, Df)
    # banded duplicates for the corr kernel (ops/corr_pallas.py:band_frame):
    # overlapped x-bands make every correlation window one contiguous DMA.
    # bf16 (mem, rows, BWIN, Df) by default; with cfg.CORR_RING_I8 the flat
    # int8 (mem, rows*BWIN, Df) layout (band_frame_i8) plus per-slot dequant
    # scales fsc1/fsc2 — half the window-DMA bytes, exact after rescale
    fmap1b: jnp.ndarray       # (mem, rows1, 24, Df) bf16 | (mem, rows1*24, Df) i8
    fmap2b: jnp.ndarray       # (mem, rows2, 24, Df) bf16 | (mem, rows2*24, Df) i8
    fsc1: jnp.ndarray         # (mem,) f32 dequant scales (i8 rings; else (0,))
    fsc2: jnp.ndarray         # (mem,) f32

    # packed, (kk, jj)-sorted edge table
    ii: jnp.ndarray           # (E,) i32 source frame
    jj: jnp.ndarray           # (E,) i32 target frame
    kk: jnp.ndarray           # (E,) i32 global patch index (frame*M + slot)
    enet: jnp.ndarray         # (E, Di) hidden state
    n_edges: jnp.ndarray      # () i32 packed count; mask == arange < n_edges
    # keyframe-cull drops are DEFERRED: the cull only marks rows here (plus
    # index decrements) and the next frame's append merge removes them in
    # its single pack pass — a mid-step repack would cost a second O(E)
    # table gather per frame. Always all-False outside the cull -> next
    # append window; the packed prefix stays sorted throughout (kept rows
    # never move, dropped rows are order-preserved placeholders).
    pending_drop: jnp.ndarray  # (E,) bool

    # scalars
    n: jnp.ndarray            # () i32 keyframe count
    counter: jnp.ndarray      # () i32 frames tracked
    initialized: jnp.ndarray  # () bool
    rng: jax.Array

    @property
    def emask(self):
        return jnp.arange(self.ii.shape[0]) < self.n_edges


class StepAux(NamedTuple):
    status: jnp.ndarray      # 0 = skipped, 1 = probe-rejected, 2 = keyframe
    kf_removed: jnp.ndarray  # bool: a keyframe was culled this step
    kf_t0: jnp.ndarray       # () i32 counter stamp of predecessor
    kf_t1: jnp.ndarray       # () i32 counter stamp of removed frame
    kf_dP: jnp.ndarray       # (7,) relative pose P_k * P_{k-1}^-1
    n_edges: jnp.ndarray     # () i32 live edge count (un-donated copy the
                             # host can prefetch without touching the state)


def _banded_dims(h: int, w: int, i8: bool = False):
    rows, _hp = corr_pallas.banded_shape(h, w)
    if i8:
        return (rows * corr_pallas.BWIN,)   # flat int8 layout (band_frame_i8)
    return (rows, corr_pallas.BWIN)


def _impl_active(cfg: VOConfig) -> str:
    """Corr implementation actually executed. Mosaic only compiles on real
    TPUs, so CPU normally falls back to the gather reference path; setting
    DEVO_CORR_INTERPRET=1 keeps the configured impl so tests can drive the
    SHIPPING banded/i8 plumbing (_banded_writes, banded _shift_ring,
    per-slot dequant-scale shifts) end-to-end under
    pltpu.force_tpu_interpret_mode() (VERDICT r02 weak #7)."""
    import os
    if jax.default_backend() == "tpu" or os.environ.get("DEVO_CORR_INTERPRET"):
        return cfg.CORR_IMPL
    return "gather"


def _use_banded(cfg: VOConfig) -> bool:
    """Whether the banded Pallas corr path is active."""
    return _impl_active(cfg) == "banded"


def _l4_resident(cfg: VOConfig, ht: int, wd: int) -> bool:
    """Whether the level-4 ring uses the VMEM-resident layout
    (pad_frame_l4_i8): one DMA descriptor per corr call instead of one per
    edge (the per-edge window DMA is issue-bound — PERF_NOTES r03). "auto"
    enables it when the whole ring set fits a conservative VMEM budget
    (the kernel also needs its R-buffer, g block and output block)."""
    if not _use_banded(cfg) or cfg.CORR_L4_RESIDENT == "off":
        return False
    if cfg.CORR_KERNEL == "pair":
        # the pair kernel runs both levels' banded-DMA pipelines in one
        # pass; the resident layout has no banded level-4 ring to pair
        if cfg.CORR_L4_RESIDENT == "on":
            raise ValueError("CORR_L4_RESIDENT='on' is incompatible with "
                             "CORR_KERNEL='pair'")
        return False
    if not cfg.CORR_RING_I8:
        if cfg.CORR_L4_RESIDENT == "on":
            raise ValueError("CORR_L4_RESIDENT='on' requires CORR_RING_I8 "
                             "(bf16 rings double the VMEM footprint)")
        return False
    hp, wp = corr_pallas.l4_shape(ht // 16, wd // 16)
    mb = cfg.MEM * hp * wp * cfg.DIM_FNET / 2**20
    if cfg.CORR_L4_RESIDENT == "on":
        return True
    return mb <= 12.0


def init_state(cfg: VOConfig, ht: int, wd: int, seed: int = 0,
               edge_cap: int = None) -> VOState:
    N, M, P = cfg.BUFFER_SIZE, cfg.M, cfg.P
    mem, E = cfg.MEM, edge_cap or cfg.EDGE_CAP
    h1, w1 = ht // 4, wd // 4
    banded = _use_banded(cfg)
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    poses = jnp.zeros((N, 7), jnp.float32).at[:, 6].set(1.0)
    return VOState(
        tstamps=jnp.zeros((N,), jnp.int32),
        poses=poses,
        patches=jnp.zeros((N * M, 3 * P * P), jnp.float32),
        intrinsics=jnp.zeros((N, 4), jnp.float32),
        colors=jnp.zeros((N, M), jnp.float32),
        imap=jnp.zeros((mem * M, cfg.DIM_INET), fdt),
        gmap=jnp.zeros((mem * M, P, P, cfg.DIM_FNET), fdt),
        # only the ring family the active corr impl reads is allocated
        # (zero-slot otherwise): the unused family would still cost its
        # per-frame writes, keyframe shifts, and the XLA layout-
        # canonicalization copies it attracts
        fmap1=jnp.zeros((0 if banded else mem, h1, w1, cfg.DIM_FNET), fdt),
        fmap2=jnp.zeros((0 if banded else mem,
                         h1 // 4, w1 // 4, cfg.DIM_FNET), fdt),
        fmap1b=jnp.zeros((mem if banded else 0,)
                         + _banded_dims(h1, w1, cfg.CORR_RING_I8)
                         + (cfg.DIM_FNET,),
                         jnp.int8 if cfg.CORR_RING_I8 else jnp.bfloat16),
        fmap2b=jnp.zeros((mem if banded else 0,)
                         + (corr_pallas.l4_shape(h1 // 4, w1 // 4)
                            if _l4_resident(cfg, ht, wd) else
                            _banded_dims(h1 // 4, w1 // 4, cfg.CORR_RING_I8))
                         + (cfg.DIM_FNET,),
                         jnp.int8 if cfg.CORR_RING_I8 else jnp.bfloat16),
        fsc1=jnp.ones((mem if banded and cfg.CORR_RING_I8 else 0,),
                      jnp.float32),
        fsc2=jnp.ones((mem if banded and cfg.CORR_RING_I8 else 0,),
                      jnp.float32),
        ii=jnp.zeros((E,), jnp.int32),
        jj=jnp.zeros((E,), jnp.int32),
        kk=jnp.zeros((E,), jnp.int32),
        enet=jnp.zeros((E, cfg.DIM_INET),
                       jnp.bfloat16 if cfg.ENET_BF16 else jnp.float32),
        n_edges=jnp.int32(0),
        pending_drop=jnp.zeros((E,), bool),
        n=jnp.int32(0),
        counter=jnp.int32(0),
        initialized=jnp.asarray(False),
        rng=jax.random.PRNGKey(seed),
    )


# ---------------------------------------------------------------- edge table

def _gather_edges(st: VOState, src: jnp.ndarray,
                  band=None, valid_count=None) -> VOState:
    # one-hot MXU gather: a fancy-index gather of the 4 table arrays lowers
    # to a serial per-row loop (~4.5 ms at E=10240, bench_table_ops.py); the
    # exact one-hot matmul costs ~0.7 ms (ops/table.py)
    ii, jj, kk, enet = table_ops.take_rows(src, st.ii, st.jj, st.kk, st.enet,
                                           band=band, valid_count=valid_count)
    return st._replace(ii=ii, jj=jj, kk=kk, enet=enet)


def _ss(table: jnp.ndarray, queries: jnp.ndarray, side: str) -> jnp.ndarray:
    """searchsorted as a dense compare-reduce. jnp.searchsorted's binary
    search lowers to a ~log2(E)-step while loop with a full-table gather per
    step (~2.5 ms at E=15k); the (Q, T) compare matrix fuses into its sum
    and runs on the VPU in ~0.2 ms."""
    cmp = (table[None, :] <= queries[:, None] if side == "right"
           else table[None, :] < queries[:, None])
    return jnp.sum(cmp, axis=1, dtype=jnp.int32)


def _remove_and_pack(st: VOState, drop: jnp.ndarray) -> VOState:
    """Drop edges and re-pack, preserving order (stable partition via a
    prefix-sum + dense rank search — jnp.where(size=) would sort)."""
    E = st.ii.shape[0]
    keep = st.emask & ~drop
    csum = jnp.cumsum(keep.astype(jnp.int32))
    # src[r] = index of the (r+1)-th kept edge = #\{csum <= r\}
    src = _ss(csum, jnp.arange(E, dtype=jnp.int32), "right")
    src = jnp.minimum(src, E - 1)
    # pack-only displacement is src[r] - r in [0, #dropped]: band the
    # one-hot with a static budget of two stacked culls + a purge (typical
    # drops are one cull, a few hundred edges); a bigger removal trips
    # take_rows' traced fallback to the full (E, E) one-hot — correct
    # either way (this path runs on rebucket absorption, not per frame)
    M_life = 2 * 96 * 25  # conservative: 2 * M * (2 * PATCH_LIFETIME - 1)
    st = _gather_edges(st, src, band=(0, M_life), valid_count=csum[-1])
    return st._replace(n_edges=csum[-1])


def _append_edges(cfg: VOConfig, st: VOState, drop=None) -> VOState:
    """Append the new frame's factors while keeping the table sorted+packed
    (devo.py:361-380, 541-542). Called after n was incremented; the new
    frame is n-1.

    Forward edges (one per live patch, jj = n-1 = max) merge at each patch
    segment's end; the backward block (new patches = max kk) appends at the
    tail. Both positions follow from rank arithmetic on the sorted table.
    An optional `drop` mask removes edges in the SAME merge pass — the
    per-frame removal-window purge (devo.py:305-306) folds in here for free
    (no update runs between the reference's purge and the next append).
    """
    M, r = cfg.M, cfg.PATCH_LIFETIME
    E = st.ii.shape[0]
    n = st.n
    Di = st.enet.shape[1]

    keep = st.emask & ~st.pending_drop
    if drop is not None:
        keep = keep & ~drop
    kk_key = jnp.where(keep, st.kk, INT_MAX)
    csum = jnp.cumsum(keep.astype(jnp.int32))
    Ne = csum[-1]

    # ---- forward edges: patches of frames [n-r, n-1) -> frame n-1
    F = M * (r - 1)
    pstart = M * jnp.maximum(n - r, 0)
    fpatch = pstart + jnp.arange(F, dtype=jnp.int32)
    fvalid = fpatch < M * (n - 1)           # prefix (fpatch ascending)
    n_f = jnp.sum(fvalid).astype(jnp.int32)
    # insert position in the compacted kept table: #kept rows with kk <= f
    seg_end = jnp.sum((kk_key[None, :] <= fpatch[:, None]) & keep[None, :],
                      axis=1, dtype=jnp.int32)
    ins_pos = jnp.where(fvalid, seg_end + jnp.arange(F, dtype=jnp.int32), INT_MAX)

    # ---- merge kept + forward into positions [0, Ne + n_f)
    p = jnp.arange(E, dtype=jnp.int32)
    cnt_before = _ss(ins_pos, p, "right")
    ins_idx = _ss(ins_pos, p, "left")
    is_ins = ins_pos[jnp.clip(ins_idx, 0, F - 1)] == p
    # rank among kept rows -> original row index
    q = jnp.clip(p - cnt_before, 0, E - 1)
    src_old = jnp.minimum(_ss(csum, q, "right"), E - 1)
    fsel = jnp.clip(ins_idx, 0, F - 1)
    N1 = Ne + n_f

    # banded one-hot gather: displacement is bounded below by the forward
    # block (inserts) and above by the drop budget (purge + one deferred
    # cull); a bigger merge falls back to the full one-hot inside the cond
    g_ii, g_jj, g_kk, g_net = table_ops.take_rows(
        src_old, st.ii, st.jj, st.kk, st.enet,
        band=(F, M * (2 * r - 1)), valid_count=N1)
    new_kk = jnp.where(is_ins, fpatch[fsel], g_kk)
    new_jj = jnp.where(is_ins, n - 1, g_jj)
    new_ii = jnp.where(is_ins, fpatch[fsel] // M, g_ii)
    new_net = jnp.where(is_ins[:, None], 0.0, g_net)

    # ---- backward block: patches of frame n-1 x frames [max(n-r,0), n)
    B = M * r
    fstart = jnp.maximum(n - r, 0)
    s = n - fstart                                # valid span (traced)
    q = jnp.arange(B, dtype=jnp.int32)
    row = q // jnp.maximum(s, 1)
    col = q % jnp.maximum(s, 1)
    bvalid = q < M * s
    kk_b = M * (n - 1) + jnp.clip(row, 0, M - 1)
    jj_b = fstart + col
    n_b = jnp.sum(bvalid).astype(jnp.int32)

    # place backward block at [N1, N1 + n_b)
    bpos = p - N1
    in_b = (bpos >= 0) & (bpos < n_b)
    bsel = jnp.clip(bpos, 0, B - 1)
    new_kk = jnp.where(in_b, kk_b[bsel], new_kk)
    new_jj = jnp.where(in_b, jj_b[bsel], new_jj)
    new_ii = jnp.where(in_b, n - 1, new_ii)
    new_net = jnp.where(in_b[:, None], 0.0, new_net)

    # overflow drops the tail of the merged table (graceful degradation —
    # the rebucket policy relies on this instead of huge safety margins);
    # clamp the count so emask never claims nonexistent rows
    return st._replace(ii=new_ii, jj=new_jj, kk=new_kk, enet=new_net,
                       n_edges=jnp.minimum(N1 + n_b, E),
                       pending_drop=jnp.zeros_like(st.pending_drop))


def _segment_ids(cfg: VOConfig, st: VOState):
    """Dense group ids for SoftAgg over live edges (update operator)."""
    span = cfg.frame_span
    tmin = jnp.maximum(st.n - span, 0)
    kbase = tmin * cfg.M
    mask = st.emask
    kk_seg = jnp.where(mask, jnp.clip(st.kk - kbase, 0, cfg.patch_slots - 1),
                       cfg.patch_slots)
    ij_seg = (jnp.clip(st.ii - tmin, 0, span - 1) * span
              + jnp.clip(st.jj - tmin, 0, span - 1))
    return kk_seg, ij_seg, tmin, kbase


# ------------------------------------------------------------------- update

def _live_window(cfg: VOConfig, st: VOState) -> edgewise.LiveWindow:
    """Frame window covering every live edge index (incl. the motion
    probe's jj = n): one-hot lookups replace serial row-gather loops."""
    return edgewise.LiveWindow(
        jnp.maximum(st.n - (cfg.MEM - 6), 0).astype(jnp.int32), cfg.MEM)


def _edge_features(cfg: VOConfig, st: VOState, ii, jj, kk, mask=None):
    """Reproject + 2-level correlation + context for a set of edges
    (devo.py:210-223, 308-314)."""
    M, mem, P = cfg.M, cfg.MEM, cfg.P
    geo = edgewise.reproject(st.poses, st.patches, st.intrinsics, ii, jj, kk,
                             window=_live_window(cfg, st))
    coords = edgewise.coords_to_corr_format(geo, P)
    kk_ring = (kk % (M * mem)).astype(jnp.int32)
    jj_ring = (jj % mem).astype(jnp.int32)
    if mask is None:
        mask = jnp.ones(ii.shape, bool)
    impl = _impl_active(cfg)
    if impl == "banded":
        # trace-time guard: hw below derives row addressing from cfg.HT/WD,
        # which must match the resolution the banded rings in `st` were
        # built at — a mismatch (direct make_step/init_state callers passing
        # ht/wd != cfg.HT/WD) would silently compute garbage correlations
        exp = _banded_dims(cfg.HT // 4, cfg.WD // 4, cfg.CORR_RING_I8) \
            + (cfg.DIM_FNET,)
        if tuple(st.fmap1b.shape[1:]) != exp:
            raise ValueError(
                f"banded corr ring shape {tuple(st.fmap1b.shape[1:])} does "
                f"not match cfg.HT/WD=({cfg.HT},{cfg.WD}) (expected {exp}); "
                "init_state and the config disagree on resolution")
        # the table is packed, so the mask is a prefix and its sum is the
        # live count the kernel's block early-exit needs
        n_live = jnp.sum(mask).astype(jnp.int32)
        wins = (cfg.CORR_WIN_L1,) + tuple(
            corr_pallas.level_win_rows(lvl) for lvl in cfg.CORR_LEVELS[1:])
        corr_feat = corr_pallas.corr_pyramid_banded(
            st.gmap, (st.fmap1b, st.fmap2b), coords, kk_ring, jj_ring, mask,
            n_live, hw=(cfg.HT // 4, cfg.WD // 4),
            radius=cfg.CORR_RADIUS, levels=cfg.CORR_LEVELS,
            scales=(st.fsc1, st.fsc2) if st.fsc1.shape[0] else None,
            variant=cfg.CORR_KERNEL, wins=wins)
    elif impl == "pallas":
        corr_feat = corr_pallas.corr_pyramid_pallas(
            st.gmap, (st.fmap1, st.fmap2), coords, kk_ring, jj_ring, mask,
            radius=cfg.CORR_RADIUS, levels=cfg.CORR_LEVELS)
    elif impl == "window":
        outs = [corr_ops.corr_window(st.gmap, fm, coords / lvl, kk_ring,
                                     jj_ring, mask, radius=cfg.CORR_RADIUS)
                for fm, lvl in zip((st.fmap1, st.fmap2), cfg.CORR_LEVELS)]
        corr_feat = jnp.stack(outs, axis=-1).reshape(ii.shape[0], -1)
    else:
        cdtype = st.gmap.dtype
        corr_feat = corr_ops.corr_pyramid(
            st.gmap, (st.fmap1, st.fmap2), coords.astype(cdtype), kk_ring,
            jj_ring, radius=cfg.CORR_RADIUS, levels=cfg.CORR_LEVELS)
    ctx = lookup_ops.lookup(st.imap, kk_ring)   # one-hot, not a gather loop
    return geo, corr_feat.astype(jnp.float32), ctx.astype(jnp.float32)


def _update_once(net: EVONet, params, cfg: VOConfig, st: VOState) -> VOState:
    """One tracking update: reproject -> corr -> recurrent update -> 2 GN
    iterations of BA (devo.py:308-344)."""
    mask = st.emask
    geo, corr_feat, ctx = _edge_features(cfg, st, st.ii, st.jj, st.kk, mask)

    ixn, jxn = graph_ops.sorted_neighbors(st.kk, mask)
    kk_seg, ij_seg, tmin, kbase = _segment_ids(cfg, st)

    enet, delta, weight = net.apply(
        {"params": params}, st.enet, ctx, corr_feat, ixn, jxn,
        kk_seg, cfg.patch_slots, ij_seg, cfg.frame_span ** 2, mask,
        method=EVONet.run_update, kk_sorted=True)

    target = jnp.stack([geo.center_x, geo.center_y], -1) + delta
    weight = jnp.where(mask[:, None], weight, 0.0)

    t0 = jnp.where(st.initialized,
                   jnp.maximum(st.n - cfg.OPTIMIZATION_WINDOW, 1), 1)
    t0 = jnp.maximum(t0, 1).astype(jnp.int32)

    intr_n = st.intrinsics[jnp.maximum(st.n - 1, 0)]
    bounds = jnp.stack([jnp.float32(-64.0), jnp.float32(-64.0),
                        2 * intr_n[2] + 64, 2 * intr_n[3] + 64])

    poses, patches = ba_ops.run_ba(
        st.poses, st.patches, st.intrinsics, target, weight,
        jnp.float32(1e-4), st.ii, st.jj, st.kk, mask,
        t0=t0, t1=st.n, kbase=kbase, window=cfg.ba_window,
        patch_slots=cfg.patch_slots, bounds=bounds, iterations=2,
        structure_only=jnp.asarray(False), max_residual=128.0,
        ep=1.0, lm=1e-4, depth_clamp="inference", kk_sorted=True,
        geo_window=_live_window(cfg, st))

    return st._replace(poses=poses, patches=patches,
                       enet=enet.astype(st.enet.dtype))


def _motion_probe(net: EVONet, params, cfg: VOConfig, st: VOState):
    """Throwaway update on last-frame patches vs the candidate frame
    (devo.py:241-256); returns the median predicted flow norm."""
    M = cfg.M
    kk = (st.n - 1) * M + jnp.arange(M, dtype=jnp.int32)
    jj = jnp.full((M,), st.n, jnp.int32)
    ii = jnp.full((M,), st.n - 1, jnp.int32)
    geo, corr_feat, ctx = _edge_features(cfg, st, ii, jj, kk)

    enet0 = jnp.zeros((M, cfg.DIM_INET), jnp.float32)
    mask = jnp.ones((M,), bool)
    ixn = jnp.full((M,), -1, jnp.int32)
    kk_seg = jnp.arange(M, dtype=jnp.int32)
    ij_seg = jnp.zeros((M,), jnp.int32)
    _, delta, _ = net.apply(
        {"params": params}, enet0, ctx, corr_feat, ixn, ixn,
        kk_seg, M, ij_seg, 1, mask, method=EVONet.run_update, kk_sorted=True)
    return jnp.quantile(jnp.linalg.norm(delta, axis=-1), 0.5)


# ----------------------------------------------------------------- keyframe

def _motionmag2(cfg: VOConfig, st: VOState, i, j):
    """Mean flow magnitude over edges (i -> j) and (j -> i)
    (devo.py:258-265), from ONE full-table flow pass — flow_mag is cheap
    vector math but its reproject is a per-edge table pass, so the two
    directions share it. Returns (mean_ij, mean_ji, both_nonempty):
    the reference's .mean() over an empty selection is NaN, which makes
    the keyframe test `m/2 < thresh` FALSE — an empty direction must
    suppress the cull, not force it (edge-cap tail-drop sheds exactly
    these recent-frame edges under pressure)."""
    fm = edgewise.flow_mag_edges(st.poses, st.patches, st.intrinsics,
                                 st.ii, st.jj, st.kk, beta=0.5,
                                 window=_live_window(cfg, st))

    def masked_mean(a, b):
        sel = (st.ii == a) & (st.jj == b) & st.emask
        cnt = jnp.sum(sel)
        return jnp.sum(jnp.where(sel, fm, 0.0)) / jnp.maximum(cnt, 1), cnt > 0

    m_ij, ok_ij = masked_mean(i, j)
    m_ji, ok_ji = masked_mean(j, i)
    return m_ij, m_ji, ok_ij & ok_ji


def _shift_ring(buf: jnp.ndarray, k, mem: int, L: int):
    """Ring-buffer shift for keyframe removal (devo.py:297-300): the slots
    of frames k .. n-2 (a static L = KEYFRAME_INDEX-1 of them) take the next
    frame's content. Single-slot dynamic moves — a whole-ring gather reads
    the full buffer (755 MB for the banded level-1 features)."""
    for j in range(L):
        src = jax.lax.dynamic_index_in_dim(buf, (k + j + 1) % mem, 0,
                                           keepdims=False)
        buf = jax.lax.dynamic_update_index_in_dim(buf, src, (k + j) % mem, 0)
    return buf


def _remove_keyframe(cfg: VOConfig, st: VOState, k) -> VOState:
    """Cull keyframe k: drop its edges, shift indices and buffers down
    (devo.py:279-303). Index shifts preserve the sort order."""
    M, mem = cfg.M, cfg.MEM
    N = cfg.BUFFER_SIZE

    # the cull only MARKS its edges and shifts indices; the actual repack
    # is deferred into the next frame's append merge (nothing reads the
    # edge table between the cull — the last op of the step — and that
    # merge, and an immediate repack would cost a second O(E) gather per
    # frame). Kept rows stay mutually sorted under the decrements: the
    # maps are monotone and no kept row has ii == k or jj == k, so no ties
    # are created among kept rows.
    drop = ((st.ii == k) | (st.jj == k)) & st.emask
    st = st._replace(
        ii=jnp.where(st.ii > k, st.ii - 1, st.ii),
        jj=jnp.where(st.jj > k, st.jj - 1, st.jj),
        kk=jnp.where(st.kk // M > k, st.kk - M, st.kk),
        pending_drop=st.pending_drop | drop,
    )

    # only frames (k, n) hold data that must move down one slot; that is a
    # static KEYFRAME_INDEX-1 frames — a windowed dynamic-slice move, not a
    # whole-buffer gather (N*M = 393k rows of patches otherwise)
    L = cfg.KEYFRAME_INDEX - 1

    def shift_frames(buf, rows_per_frame=1):
        r = rows_per_frame
        mv = jax.lax.dynamic_slice(
            buf.reshape(N * r, -1), ((k + 1) * r, 0),
            (L * r, buf.reshape(N * r, -1).shape[1]))
        out = jax.lax.dynamic_update_slice(buf.reshape(N * r, -1), mv, (k * r, 0))
        return out.reshape(buf.shape)

    return st._replace(
        tstamps=shift_frames(st.tstamps[:, None])[:, 0],
        poses=shift_frames(st.poses),
        intrinsics=shift_frames(st.intrinsics),
        colors=shift_frames(st.colors),
        # rows_per_frame=M keeps the flat (N*M, 27) layout: a reshape to
        # (N, M*27) forces a physical relayout both ways (~1 ms/frame of
        # reshape+copy in the keyframe branch, see PERF_NOTES.md)
        patches=shift_frames(st.patches, rows_per_frame=M),
        imap=_shift_ring(st.imap.reshape(mem, M, -1), k, mem, L).reshape(st.imap.shape),
        gmap=_shift_ring(st.gmap.reshape(mem, M, *st.gmap.shape[1:]), k, mem, L).reshape(st.gmap.shape),
        fmap1=_shift_ring(st.fmap1, k, mem, L) if st.fmap1.shape[0]
        else st.fmap1,
        fmap2=_shift_ring(st.fmap2, k, mem, L) if st.fmap2.shape[0]
        else st.fmap2,
        fmap1b=_shift_ring(st.fmap1b, k, mem, L) if st.fmap1b.shape[0]
        else st.fmap1b,
        fmap2b=_shift_ring(st.fmap2b, k, mem, L) if st.fmap2b.shape[0]
        else st.fmap2b,
        fsc1=_shift_ring(st.fsc1, k, mem, L) if st.fsc1.shape[0]
        else st.fsc1,
        fsc2=_shift_ring(st.fsc2, k, mem, L) if st.fsc2.shape[0]
        else st.fsc2,
        n=st.n - 1,
    )


def _keyframe(cfg: VOConfig, st: VOState) -> Tuple[VOState, Dict[str, jnp.ndarray]]:
    """Keyframing (devo.py:267-306): measure flow between frames t-5 and t-3;
    if small, remove frame t-4 and record its relative pose delta."""
    i = st.n - cfg.KEYFRAME_INDEX - 1
    j = st.n - cfg.KEYFRAME_INDEX + 1
    m_ij, m_ji, nonempty = _motionmag2(cfg, st, i, j)
    m = m_ij + m_ji
    remove = (m / 2.0 < cfg.KEYFRAME_THRESH) & (i >= 0) & nonempty

    k = st.n - cfg.KEYFRAME_INDEX
    t0 = st.tstamps[jnp.maximum(k - 1, 0)]
    t1 = st.tstamps[jnp.maximum(k, 0)]
    dP = se3.mul(st.poses[k], se3.inv(st.poses[jnp.maximum(k - 1, 0)]))

    st = jax.lax.cond(remove, lambda s: _remove_keyframe(cfg, s, k), lambda s: s, st)

    # NB: the removal-window purge (devo.py:305-306) is folded into the next
    # frame's _append_edges merge — one fewer full-table pack per frame

    aux = dict(kf_removed=remove, kf_t0=t0, kf_t1=t1, kf_dP=dP)
    return st, aux


# --------------------------------------------------------------------- step

def _write_frame(net: EVONet, params, cfg: VOConfig, st: VOState,
                 voxel, intrinsics, key) -> VOState:
    """Patchify the new frame and fill buffers at slot n (devo.py:475-527)."""
    M, P, mem = cfg.M, cfg.P, cfg.MEM
    n = st.n

    out = net.apply(
        {"params": params}, voxel[None], key,
        patches_per_image=M,
        training=False,
        scorer_eval_mode=cfg.SCORER_EVAL_MODE,
        scorer_eval_use_grid=cfg.SCORER_EVAL_USE_GRID,
        method=EVONet.run_patchify)

    patches = out["patches"][0].reshape(M, 3 * P * P)  # flat [x, y, d] blocks
    imap_p = out["imap"][0]            # (M, Di)
    gmap_p = out["gmap"][0]            # (M, P, P, Df)
    fmap = out["fmap"][0]              # (h1, w1, Df)

    # motion model (devo.py:502-512)
    def damped_linear(poses):
        P1 = poses[n - 1]
        P2 = poses[n - 2]
        xi = cfg.MOTION_DAMPING * se3.log(se3.mul(P1, se3.inv(P2)))
        return se3.mul(se3.exp(xi), P1)

    new_pose = jax.lax.cond(
        n > 1, lambda p: damped_linear(p),
        lambda p: p[jnp.maximum(n - 1, 0)], st.poses)

    # depth init (devo.py:514-520)
    key_d = jax.random.fold_in(key, 1)
    rand_d = jax.random.uniform(key_d, (M, 1))
    PP = P * P
    med_src = jax.lax.dynamic_slice(
        st.patches, (jnp.maximum(n - 3, 0) * M, 2 * PP), (3 * M, PP))
    med = jnp.median(med_src)
    depth = jnp.where(st.initialized, med, 0.0) + jnp.where(st.initialized, 0.0, 1.0) * rand_d
    patches = patches.at[:, 2 * PP:].set(jnp.broadcast_to(depth, (M, PP)))

    fdt = st.gmap.dtype
    fmap2 = fmap.reshape(fmap.shape[0] // 4, 4, fmap.shape[1] // 4, 4, -1).mean((1, 3))
    banded = st.fmap1b.shape[0] > 0

    return st._replace(
        tstamps=st.tstamps.at[n].set(st.counter),
        poses=st.poses.at[n].set(new_pose),
        patches=jax.lax.dynamic_update_slice(st.patches, patches, (n * M, 0)),
        intrinsics=st.intrinsics.at[n].set(intrinsics / 4.0),
        colors=st.colors.at[n].set(out["clr"][0]),
        imap=jax.lax.dynamic_update_slice(st.imap, imap_p.astype(fdt), ((n % mem) * M, 0)),
        gmap=jax.lax.dynamic_update_slice(st.gmap, gmap_p.astype(fdt), ((n % mem) * M, 0, 0, 0)),
        fmap1=st.fmap1 if banded else st.fmap1.at[n % mem].set(
            fmap.astype(fdt)),
        fmap2=st.fmap2 if banded else st.fmap2.at[n % mem].set(
            fmap2.astype(fdt)),
        **_banded_writes(st, n % mem, fmap, fmap2, banded),
        counter=st.counter + 1,
    )


def _banded_writes(st: VOState, slot, fmap, fmap2, banded: bool):
    """Ring writes for the banded corr buffers: bf16 (rows, BWIN, C) slabs,
    or with CORR_RING_I8 the flat int8 layout + per-slot dequant scales.
    A 4-D fmap2b ring means the level-4 VMEM-resident layout is active
    (CORR_L4_RESIDENT): plain padded i8 frames instead of banded ones."""
    if not banded:
        return {}
    if st.fsc1.shape[0] > 0:                  # int8 rings
        q1, s1 = corr_pallas.band_frame_i8(fmap)
        if st.fmap2b.ndim == 4:
            q2, s2 = corr_pallas.pad_frame_l4_i8(fmap2)
        else:
            q2, s2 = corr_pallas.band_frame_i8(fmap2)
        return dict(fmap1b=st.fmap1b.at[slot].set(q1),
                    fmap2b=st.fmap2b.at[slot].set(q2),
                    fsc1=st.fsc1.at[slot].set(s1),
                    fsc2=st.fsc2.at[slot].set(s2))
    return dict(fmap1b=st.fmap1b.at[slot].set(corr_pallas.band_frame(fmap)),
                fmap2b=st.fmap2b.at[slot].set(corr_pallas.band_frame(fmap2)))


def make_step(net: EVONet, cfg: VOConfig):
    """Build the jitted per-frame tracking step."""

    def step(params, st: VOState, voxel, vscale,
             intrinsics) -> Tuple[VOState, StepAux]:
        # voxel: (H, W, bins). The host transfers a quantized wire format
        # (int8 q + f32 scale by default — a quarter of the f32 bytes; the
        # tunnel moves ~130 MB/s so wire size is frame-rate critical,
        # PERF_NOTES.md); dequantize on device.
        voxel = voxel.astype(jnp.float32) * vscale
        key, key_sel = jax.random.split(st.rng)
        st = st._replace(rng=key)

        if cfg.EVS:
            # normalization + empty-voxel gate (devo.py:406-457)
            nonzero_frac = jnp.mean((voxel != 0.0).astype(jnp.float32))
            skip = (st.n == 0) & (nonzero_frac < 2e-2)
            voxel = normalize(voxel, cfg.NORM)
        else:
            # frame input (devo.py:395): scale to [-0.5, 1.5]
            skip = jnp.asarray(False)
            voxel = 2.0 * (voxel / 255.0) - 0.5

        def do_skip(st):
            aux = StepAux(jnp.int32(0), jnp.asarray(False), jnp.int32(0),
                          jnp.int32(0), se3.identity(), st.n_edges + 0)
            return st, aux

        def do_track(st):
            st = _write_frame(net, params, cfg, st, voxel, intrinsics, key_sel)

            probe_ok = jax.lax.cond(
                (st.n > 0) & ~st.initialized,
                lambda s: _motion_probe(net, params, cfg, s) >= cfg.MOTION_PROBE_THRESH,
                lambda s: jnp.asarray(True), st)

            def rejected(st):
                aux = StepAux(jnp.int32(1), jnp.asarray(False), jnp.int32(0),
                              jnp.int32(0), se3.identity(), st.n_edges + 0)
                return st, aux

            def accepted(st):
                st = st._replace(n=st.n + 1)
                # the previous frame's purge, applied in the same merge
                # (bound uses the pre-increment n, matching devo.py:305-306).
                # DELIBERATE deviation: edges whose TARGET frame jj has left
                # the live window are purged too. The reference keeps them
                # (it purges by patch frame only) but reads their corr
                # features from a ring slot already overwritten once
                # jj < n - MEM — silent feature aliasing; here they would
                # clamp to the window edge and read the wrong pose. Both are
                # garbage inputs; dropping the edge is strictly cleaner.
                # +1 margin: the purge runs one frame before the window that
                # the next update sees.
                purge = (((st.kk // cfg.M)
                          < (st.n - 1 - cfg.REMOVAL_WINDOW))
                         | (st.jj < st.n - (cfg.MEM - 6) + 1)) & st.emask
                st = _append_edges(cfg, st, drop=purge)

                def do_init(st):
                    st = st._replace(initialized=jnp.asarray(True))
                    st = jax.lax.fori_loop(
                        0, 12, lambda _, s: _update_once(net, params, cfg, s), st)
                    return st, dict(kf_removed=jnp.asarray(False),
                                    kf_t0=jnp.int32(0), kf_t1=jnp.int32(0),
                                    kf_dP=se3.identity())

                def do_steady(st):
                    st = _update_once(net, params, cfg, st)
                    return _keyframe(cfg, st)

                def do_nothing(st):
                    return st, dict(kf_removed=jnp.asarray(False),
                                    kf_t0=jnp.int32(0), kf_t1=jnp.int32(0),
                                    kf_dP=se3.identity())

                st, kf_aux = jax.lax.cond(
                    (st.n == 8) & ~st.initialized, do_init,
                    lambda s: jax.lax.cond(s.initialized, do_steady, do_nothing, s),
                    st)
                aux = StepAux(jnp.int32(2), kf_aux["kf_removed"],
                              kf_aux["kf_t0"], kf_aux["kf_t1"],
                              kf_aux["kf_dP"], st.n_edges + 0)
                return st, aux

            return jax.lax.cond(probe_ok, accepted, rejected, st)

        return jax.lax.cond(skip, do_skip, do_track, st)

    return jax.jit(step, donate_argnums=(1,))


# ----------------------------------------------------------------- host API

class _EdgeCountSampler:
    """Background reader of the per-step live edge count.

    Any synchronous device read through the axon tunnel costs a flat ~31 ms
    round-trip (PERF_NOTES.md); sampling on a daemon thread keeps the main
    loop free of syncs. The rebucketing margin grows with the sample's
    frame lag, so a stale value is safe, just conservative."""

    def __init__(self):
        import threading
        self._lock = threading.Lock()
        self._ev = threading.Event()
        self._pending = None
        self._gen = 0                 # bumped by reset(); stale-sequence
                                      # samples carry the old generation
        self.latest = None            # (frame_idx, count)
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def submit(self, frame_idx, arr):
        with self._lock:
            self._pending = (self._gen, frame_idx, arr)
        self._ev.set()

    def _run(self):
        while True:
            self._ev.wait()
            with self._lock:
                item, self._pending = self._pending, None
                self._ev.clear()
            if item is None:
                continue
            g, f, arr = item
            try:
                v = int(arr)          # blocks in this thread only (~31 ms)
            except Exception:
                continue
            with self._lock:
                # a reset() may have raced the device read above: publishing
                # the old sequence's count would mis-size the next
                # sequence's first bucket
                if g == self._gen:
                    self.latest = (f, v)

    def read(self):
        with self._lock:
            return self.latest

    def reset(self):
        with self._lock:
            self._gen += 1
            self.latest = None
            self._pending = None


@functools.partial(jax.jit, static_argnums=(5,))
def _fit_edges(ii, jj, kk, enet, pending, E: int):
    """Resize the edge-table arrays to capacity E in ONE dispatch. Separate
    eager pad/slice ops cost ~30 ms dispatch each through the axon tunnel
    plus an ~800 ms first-use remote compile — which used to bill an entire
    chunk's worth of time to whichever frame crossed a bucket boundary."""
    def fit(a):
        if a.shape[0] >= E:
            return a[:E]
        pad = [(0, E - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad)
    return fit(ii), fit(jj), fit(kk), fit(enet), fit(pending)


class _BucketPrecompiler:
    """Compile-ahead of per-bucket step executables.

    The engine runs one XLA executable per edge-table bucket; compiling a
    new bucket through the axon remote compiler costs 10-90 s, which would
    stall tracking (and wrecked bench runs whose timed window caught a
    bucket switch). This thread walks the bucket ladder in ascending order
    and warms each executable by stepping a throwaway state, so the tracker
    only ever moves to buckets whose executables already exist; _rebucket
    defers any move whose target isn't ready (growth is covered by the
    append merge's graceful tail-drop overflow in the meantime)."""

    def __init__(self, run_dummy_step, caps, cap0: int, dim_inet: int):
        import threading
        self._run = run_dummy_step
        self._all_caps = sorted(set(caps) | {cap0})
        self._caps = [c for c in sorted(caps) if c != cap0]
        self._di = dim_inet
        self._ready = {cap0}
        self._lock = threading.Lock()
        self._done = threading.Event()
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    def _worker(self):
        for cap in self._caps:
            try:
                self._run(cap)
            except Exception:   # a failed warm just means a slower switch
                continue
            with self._lock:
                self._ready.add(cap)
        # warm the resize executables for every transition (shape-keyed jit
        # cache): an unwarmed pair costs an ~800 ms remote compile on the
        # frame that crosses the boundary
        for a in self._all_caps:
            z1 = jnp.zeros((a,), jnp.int32)
            z2 = jnp.zeros((a, self._di), jnp.float32)
            zb = jnp.zeros((a,), bool)
            for b in self._all_caps:
                if b == a:
                    continue
                try:
                    jax.block_until_ready(
                        _fit_edges(z1 + 0, z1 + 0, z1 + 0, z2 + 0.0,
                                   zb | False, b))
                except Exception:
                    pass
        self._done.set()

    def ready(self, cap: int) -> bool:
        with self._lock:
            return cap in self._ready

    def wait(self, timeout=None) -> bool:
        return self._done.wait(timeout)


class DEVO:
    """Host-side orchestrator mirroring the reference engine's interface
    (devo.py:21-555): call per frame, then terminate() for the trajectory."""

    def __init__(self, cfg: VOConfig, params, ht=480, wd=640, seed=0):
        if (cfg.HT, cfg.WD) != (ht, wd):
            import dataclasses
            cfg = dataclasses.replace(cfg, HT=ht, WD=wd)
        self.cfg = cfg
        self.net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                          dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR,
                          dtype=jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32,
                          bins=cfg.BINS, fused_encoders=cfg.FUSED_ENCODERS,
                          scorer_s2d=cfg.SCORER_S2D,
                          encoder_s2d=cfg.ENCODER_S2D)
        self.params = params
        # Bucketed edge capacity: the worst-case bound (EDGE_CAP) is ~2-10x
        # the live edge count of typical sequences, and every per-edge op
        # scales with the table size. The packed table lets us run at the
        # smallest bucket that fits, growing/shrinking between frames (jit
        # caches one executable per bucket). The per-frame growth is bounded
        # by one append block, so a one-frame-lagged count + margin is safe.
        self._block = cfg.M * (2 * cfg.PATCH_LIFETIME - 1)
        # finer steps in the steady-state range (~6-15k live at M=96):
        # every per-edge op scales with the bucket, so -25% bucket = -25%
        # frame time; coarser above (each bucket is one XLA executable)
        # each bucket is one XLA executable the precompiler must build —
        # keep the ladder lean (EDGE_CAP//2 ~ 12 blocks, dropped as a dup)
        import os
        force = os.environ.get("DEVO_FORCE_BUCKET")   # perf diagnosis only
        caps = sorted({self._round_cap(c) for c in (
            3 * self._block, 4 * self._block, 5 * self._block,
            6 * self._block, 8 * self._block, 12 * self._block,
            2 * cfg.EDGE_CAP // 3, cfg.EDGE_CAP)}) if not force \
            else [self._round_cap(int(force))]
        self._caps = [c for c in caps if c <= self._round_cap(cfg.EDGE_CAP)]
        # start at a bucket that holds the 8-frame init clique (64*M edges,
        # devo.py:544-548) plus one append block, so initialization never
        # sheds edges while the sampler is still warming up
        cap0 = next((c for c in self._caps if c >= 64 * cfg.M + self._block),
                    self._caps[-1])
        self._cap0, self._ht, self._wd = cap0, ht, wd
        self.state = init_state(cfg, ht, wd, seed, edge_cap=cap0)
        self.step_fn = make_step(self.net, cfg)
        # standalone update (the harness's 12 final refinement iterations)
        # runs OUTSIDE the per-frame step, so the previous frame's deferred
        # keyframe cull (pending_drop) has not been absorbed by an append
        # merge yet — flush it first or stale rows (whose frame indices were
        # not decremented) would feed the update and BA
        def _upd(p, s):
            s = jax.lax.cond(
                jnp.any(s.pending_drop),
                lambda s: _remove_and_pack(s, s.pending_drop)._replace(
                    pending_drop=jnp.zeros_like(s.pending_drop)),
                lambda s: s, s)
            return _update_once(self.net, p, self.cfg, s)
        self._update_fn = jax.jit(_upd, donate_argnums=(1,))
        # compile every bucket executable ahead of need (TPU only: the CPU
        # fallback is for tests, where eager per-bucket warming would just
        # burn the suite's time)
        self._precompiler = (
            _BucketPrecompiler(self._warm_bucket, self._caps, cap0,
                               cfg.DIM_INET)
            if jax.default_backend() == "tpu" else None)
        self._sampler = _EdgeCountSampler()
        self._frame_idx = 0
        self.aux_log = []          # device aux records (lazy)
        self.viewer = None         # optional live viewer (start_viewer)

    def start_viewer(self, out_dir: str = "viewer_out", period: float = 2.0):
        """Attach the live viewer (devo.py:139-149): a background thread
        renders trajectory + point cloud + input inset to PNG frames in
        `out_dir`. Headless-friendly dpviewer equivalent; all device reads
        happen on the viewer thread at a bounded rate."""
        from devo_tpu.runtime.viewer import Viewer
        self.viewer = Viewer(self, out_dir=out_dir, period=period)
        return self.viewer

    @staticmethod
    def _round_cap(c: int) -> int:
        # 1024-row bucket granularity == ops/table.py's _T tile and
        # config._round_up's EDGE_CAP rounding — keep the three in sync
        from devo_tpu.runtime.config import _round_up
        return _round_up(max(c, 1024), 1024)

    def _warm_bucket(self, cap: int):
        """Compile the step executable for bucket `cap` by running one
        throwaway step (the donated dummy state frees as it goes)."""
        cfg = self.cfg
        wire = {"i8": jnp.int8, "f16": jnp.float16}.get(
            getattr(cfg, "VOXEL_WIRE", "i8"), jnp.float32)
        # __call__ crops 346-wide MVSEC/FPV voxels to 344 BEFORE the step, so
        # the warm shape must match or every precompiled executable misses
        # the jit cache and the remote compile lands on a live frame
        wd = cfg.WD - 2 if cfg.WD == 346 else cfg.WD
        dummy = init_state(cfg, cfg.HT, wd, seed=0, edge_cap=cap)
        voxel = jnp.zeros((cfg.HT, wd, cfg.BINS), wire)
        intr = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)
        out = self.step_fn(self.params, dummy, voxel, np.float32(1.0), intr)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        # warm the standalone refinement update too: the harness's 12 final
        # update() calls would otherwise hit a fresh 10-90 s remote compile
        # per bucket shape right after tracking finishes
        dummy2 = init_state(cfg, cfg.HT, wd, seed=0, edge_cap=cap)
        out2 = self._update_fn(self.params, dummy2)
        jax.block_until_ready(jax.tree_util.tree_leaves(out2)[0])

    def reset(self, seed: int = 0, params=None):
        """Reset tracking state for a new sequence/trial while KEEPING every
        compiled executable (a fresh DEVO instance re-jits make_step, so a
        5-trial benchmark run would pay the 10-90 s remote compile per
        bucket per trial)."""
        if params is not None:
            self.params = params
        self.state = init_state(self.cfg, self._ht, self._wd, seed,
                                edge_cap=self._cap0)
        self._sampler.reset()
        self._frame_idx = 0
        self._frames_since_check = 0
        self._checked_once = False
        if hasattr(self, "_prev_sample"):
            del self._prev_sample
        self.aux_log = []

    def wait_buckets(self, timeout=None) -> bool:
        """Block until every bucket executable is compiled (bench/eval call
        this after their warmup so no timed frame hits a compile)."""
        if self._precompiler is None:
            return True
        return self._precompiler.wait(timeout)

    def _rebucket(self):
        """Grow/shrink the edge table to the smallest safe bucket. The
        device count is only consulted every few frames (each read syncs the
        host to the previous step); growth between checks is bounded by one
        append block per frame, covered by the margin."""
        self._frames_since_check = getattr(self, "_frames_since_check", 0) + 1
        if self._frames_since_check < 2 \
                and getattr(self, "_checked_once", False):
            return
        self._frames_since_check = 0
        self._checked_once = True
        cur = getattr(self, "_frame_idx", 0)
        sample = self._sampler.read()
        if sample is None:
            # startup only: one synchronous read
            sample = (cur, int(self.state.n_edges))
        f, ne = sample
        # Overflowing appends degrade gracefully (the merge drops its tail
        # and the next check grows the bucket), so the margin only needs to
        # cover TYPICAL growth over the sample lag — estimated from the
        # last two samples — not the worst case. A lag-paranoid margin
        # previously parked the bucket at ~5x the live count, and every
        # per-edge op (and the Pallas grid) scales with the bucket.
        pf, pne = getattr(self, "_prev_sample", (f, ne))
        self._prev_sample = (f, ne)
        # growth is physically bounded by one append block per frame; an
        # unclamped estimate turned one n-increment spike (+1632 edges) into
        # a 2-bucket over-jump whose larger per-edge ops then stuck around
        # under the shrink hysteresis
        growth = min(max(0, ne - pne) / max(1, f - pf), self._block / 2)
        need = int(ne + growth * (cur - f + 2)) + self._block
        cap = self.state.ii.shape[0]
        ready = (self._precompiler.ready if self._precompiler is not None
                 else lambda c: True)
        # smallest compiled bucket that fits; an uncompiled target is
        # deferred (a switch would stall tracking 10-90 s on the remote
        # compiler) — growth meanwhile degrades gracefully via the append
        # merge's tail-drop overflow
        target = next((c for c in self._caps
                       if c >= need and (c == cap or ready(c))), None)
        if target is None:
            target = self._caps[-1] if ready(self._caps[-1]) else cap
        if target == cap or (target < cap and need + self._block // 2 > target):
            return  # hysteresis: only shrink with half a block of slack
        st = self.state
        ii, jj, kk, enet, pending = _fit_edges(
            st.ii, st.jj, st.kk, st.enet, st.pending_drop, target)
        self.state = st._replace(ii=ii, jj=jj, kk=kk, enet=enet,
                                 pending_drop=pending)

    def upload(self, voxel):
        """Host->device voxel transfer; returns (device_array, scale).

        Wire format per cfg.VOXEL_WIRE: 'i8' (default) quantizes to int8
        with a per-frame scale — 4x fewer tunnel bytes than f32. Event
        voxels are trilinear splats of unit polarities, so the <=0.4%
        quantization error is far below the sensor noise the std/rescale
        normalization already absorbs. 'f16'/'f32' are lossless options for
        parity runs. Callers may run this on a prefetch thread to overlap
        the transfer with the previous frame's compute (the reference's
        multiprocessing loaders hide the same latency,
        load_utils.py:119-131)."""
        wire = getattr(self.cfg, "VOXEL_WIRE", "i8")
        if wire == "i8":
            from devo_tpu import native
            q, scale = native.quantize_i8(np.asarray(voxel, np.float32))
            return jnp.asarray(q), np.float32(scale)
        dt = np.float16 if wire == "f16" else np.float32
        if isinstance(voxel, np.ndarray) and voxel.dtype != dt:
            voxel = np.ascontiguousarray(voxel, dtype=dt)
        return jnp.asarray(voxel), np.float32(1.0)

    def upload_batch(self, voxels):
        """Upload K frames in ONE host->device transfer; returns a list of
        (device_view, scale) tuples consumable by __call__.

        Every per-frame upload pays a flat ~31 ms tunnel sync on top of the
        wire time (PERF_NOTES "Tunnel characteristics"); measured in the
        round-3 A/B bench this made the uploader the critical path (2-3.3 s
        of every ~3 s timing window waiting on uploads). One stacked
        (K, H, W, bins) transfer amortizes the sync to 31/K ms/frame; the
        per-frame device slices dispatch lazily and cost no round-trip."""
        import jax as _jax

        wire = getattr(self.cfg, "VOXEL_WIRE", "i8")
        if wire == "i8":
            from devo_tpu import native
            qs, scales = zip(*(native.quantize_i8(np.asarray(v, np.float32))
                               for v in voxels))
            dev = jnp.asarray(np.stack(qs))
            _jax.block_until_ready(dev)
            return [(dev[i], np.float32(s)) for i, s in enumerate(scales)]
        dt = np.float16 if wire == "f16" else np.float32
        dev = jnp.asarray(np.stack(
            [np.ascontiguousarray(v, dtype=dt) for v in voxels]))
        _jax.block_until_ready(dev)
        return [(dev[i], np.float32(1.0)) for i in range(len(voxels))]

    def __call__(self, tstamp, voxel, intrinsics):
        """voxel: (H, W, bins) numpy/jax array; intrinsics: (4,)."""
        vscale = np.float32(1.0)
        if self.viewer is not None and isinstance(voxel, np.ndarray):
            self.viewer.update_image(voxel)   # host ref only (devo.py:388)
        if isinstance(voxel, tuple):          # pre-uploaded (array, scale)
            voxel, vscale = voxel
        if voxel.shape[-2] == 346:  # MVSEC/FPV width hack (devo.py:466-467)
            voxel = voxel[:, 1:-1, :]
        self._rebucket()
        if not isinstance(voxel, jax.Array):
            voxel, vscale = self.upload(voxel)
        st, aux = self.step_fn(self.params, self.state, voxel, vscale,
                               jnp.asarray(intrinsics, jnp.float32))
        self.state = st
        self.aux_log.append((tstamp, aux))
        self._frame_idx = getattr(self, "_frame_idx", 0) + 1
        # sample at most every 3rd frame: each background int() read holds
        # the tunnel for a ~31 ms round-trip, and a continuously-pending
        # read steals ~1/3 of the main loop's dispatch bandwidth
        if self._frame_idx % 3 == 0:
            self._sampler.submit(self._frame_idx, aux.n_edges)

    def update(self):
        """Extra refinement update (used by the eval harness's 12 final
        iterations, eval_utils.py:127-130)."""
        self.state = self._update_fn(self.params, self.state)

    def terminate(self):
        """Reconstruct the full-rate trajectory (devo.py:186-208): chain the
        stored relative deltas onto the keyframe poses, invert to c2w."""
        if self.viewer is not None:           # devo.py:205-206
            self.viewer.join()
            self.viewer = None
        st = self.state
        n = int(st.n)
        counter = int(st.counter)
        poses_kf = np.asarray(st.poses[:max(n, 1)])
        tstamps_kf = np.asarray(st.tstamps[:max(n, 1)])

        traj = {int(t): poses_kf[i] for i, t in enumerate(tstamps_kf[:n])}
        delta = {}
        tlist = []
        cnt = 0
        # ONE host transfer for the whole aux log: per-field int()/bool()
        # reads cost a flat ~31 ms tunnel round-trip EACH (PERF_NOTES), i.e.
        # minutes of sync reads on a long sequence
        auxes_host = jax.device_get([a for _, a in self.aux_log])
        for (tstamp, _), aux in zip(self.aux_log, auxes_host):
            status = int(aux.status)
            if status == 0:
                continue
            tlist.append(tstamp)
            cnt += 1
            if status == 1:  # probe-rejected: identity to previous
                delta[cnt - 1] = (cnt - 2, np.asarray(se3.identity()))
            if bool(aux.kf_removed):
                delta[int(aux.kf_t1)] = (int(aux.kf_t0), np.asarray(aux.kf_dP))

        if not bool(st.initialized):
            poses = np.tile(np.asarray([0, 0, 0, 0, 0, 0, 1.0]), (counter, 1))
            poses[:, :3] += np.random.randn(counter, 3) * 0.01
            return poses, np.asarray(tlist, np.float64)

        def get_pose(t):
            # iterative delta-chain walk (deep chains would overflow python
            # recursion; devo.py:179-184 recurses)
            chain = []
            while t not in traj:
                chain.append(t)
                t = delta[t][0]
            base = traj[t]
            for tt in reversed(chain):
                dP = delta[tt][1]
                base = np.asarray(se3.mul(jnp.asarray(dP), jnp.asarray(base)))
                traj[tt] = base
            return base

        poses = np.stack([get_pose(t) for t in range(counter)])
        poses = np.asarray(se3.inv(jnp.asarray(poses)))  # w2c -> c2w
        return poses, np.asarray(tlist, np.float64)

    def point_cloud(self):
        """World-frame patch centers for visualization (devo.py:342-344)."""
        st = self.state
        n = int(st.n)
        M = self.cfg.M
        P = self.cfg.P
        pts = pops.point_cloud(st.poses,
                               st.patches[: n * M].reshape(-1, 3, P, P),
                               st.intrinsics, jnp.arange(n * M) // M)
        c = P // 2
        pts = pts[:, c, c, :]
        return np.asarray(pts[..., :3] / np.maximum(np.asarray(pts[..., 3:]), 1e-8))
