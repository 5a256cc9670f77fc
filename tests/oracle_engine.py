"""Reference-semantics NumPy/eager oracle of the DEVO tracking engine.

A direct transcription of the reference's per-frame control flow
(/root/reference/devo/devo.py:382-555: normalization gate, patchify, motion
model, depth init, motion probe, edge appends devo.py:361-380, init-at-8
with 12 updates, steady update + keyframe devo.py:267-306, delta-chain
terminate devo.py:186-208) built on DYNAMICALLY-SIZED numpy/JAX arrays and
the repo's *module-level* primitives (EVONet, ops/corr gather impl,
ops/ba.run_ba, geom/projective reference-layout transforms).

This is deliberately a different implementation strategy from
runtime/engine.py (packed static table + one jitted step): the golden test
runs both over the same frames with the same params and RNG stream and
asserts matching probe/keyframe decisions, edge tables, and pose
trajectories — the integration-level parity evidence module tests can't
give. The only structural liberty taken: the reference purges
REMOVAL_WINDOW edges at the END of keyframe(); the oracle applies that
purge at the START of the next frame (before the append). Nothing reads
the table in between, so the two are state-for-state equivalent at every
step boundary — and this makes end-of-step tables directly comparable
with the engine, which folds the purge into the next append merge.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.data.normalize import normalize
from devo_tpu.geom import projective as pops
from devo_tpu.lie import se3
from devo_tpu.nets.evonet import EVONet
from devo_tpu.ops import ba as ba_ops
from devo_tpu.ops import corr as corr_ops
from devo_tpu.runtime.config import VOConfig


class SlowDEVO:
    def __init__(self, cfg: VOConfig, params, ht: int, wd: int, seed: int = 0):
        self.cfg = cfg
        self.params = params
        self.net_mod = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET,
                              dim_fnet=cfg.DIM_FNET, dim=cfg.DIM,
                              patch_selector=cfg.PATCH_SELECTOR,
                              dtype=jnp.float32, bins=cfg.BINS)
        N, M, P, mem = cfg.BUFFER_SIZE, cfg.M, cfg.P, cfg.MEM
        self.ht, self.wd = ht, wd
        self.M, self.P, self.mem = M, P, mem
        self.n = 0            # keyframe count
        self.m = 0            # patch count
        self.counter = 0
        self.initialized = False
        self.rng = jax.random.PRNGKey(seed)

        self.tstamps_ = np.zeros(N, np.int64)
        self.poses_ = np.zeros((N, 7), np.float32)
        self.poses_[:, 6] = 1.0
        self.patches_ = np.zeros((N * M, 3, P, P), np.float32)
        self.intrinsics_ = np.zeros((N, 4), np.float32)
        self.imap_ = np.zeros((mem * M, cfg.DIM_INET), np.float32)
        self.gmap_ = np.zeros((mem * M, P, P, cfg.DIM_FNET), np.float32)
        h1, w1 = ht // 4, wd // 4
        self.fmap1_ = np.zeros((mem, h1, w1, cfg.DIM_FNET), np.float32)
        self.fmap2_ = np.zeros((mem, h1 // 4, w1 // 4, cfg.DIM_FNET),
                               np.float32)

        # dynamic edge table, reference insertion order
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.kk = np.zeros(0, np.int64)
        self.net = np.zeros((0, cfg.DIM_INET), np.float32)

        self.delta = {}
        self.tlist = []
        self.probe_log = []       # True = accepted
        self.kf_log = []          # True = a keyframe was culled

    # ------------------------------------------------------------ helpers
    def _remove(self, drop: np.ndarray):
        keep = ~drop
        self.ii, self.jj, self.kk = self.ii[keep], self.jj[keep], self.kk[keep]
        self.net = self.net[keep]

    def _append(self, kk_new, jj_new):
        self.kk = np.concatenate([self.kk, kk_new])
        self.jj = np.concatenate([self.jj, jj_new])
        self.ii = np.concatenate([self.ii, kk_new // self.M])
        self.net = np.concatenate(
            [self.net, np.zeros((len(kk_new), self.cfg.DIM_INET), np.float32)])

    def _edges_forw(self):
        r, M, n = self.cfg.PATCH_LIFETIME, self.M, self.n
        t0, t1 = M * max(n - r, 0), M * max(n - 1, 0)
        kk = np.arange(t0, t1)
        return kk, np.full(len(kk), n - 1, np.int64)

    def _edges_back(self):
        r, M, n = self.cfg.PATCH_LIFETIME, self.M, self.n
        kk = np.repeat(np.arange(M * (n - 1), M * n), n - max(n - r, 0))
        jj = np.tile(np.arange(max(n - r, 0), n), M)
        return kk, jj

    def _neighbors(self):
        """Reference fastba.neighbors: prev/next edge of the same patch in
        (kk, jj) order, as indices into the insertion-order table."""
        E = len(self.kk)
        order = np.lexsort((self.jj, self.kk))
        ix = np.full(E, -1, np.int64)
        jx = np.full(E, -1, np.int64)
        for a, b in zip(order[:-1], order[1:]):
            if self.kk[a] == self.kk[b]:
                ix[b] = a
                jx[a] = b
        return ix, jx

    def _run_update_net(self, net, ctx, corr_feat, ix, jx, kk, ii, jj):
        """Call the shared Update module with insertion-order (unsorted)
        tables: dense segment ids come from np.unique."""
        E = len(kk)
        _, kk_seg = np.unique(kk, return_inverse=True)
        _, ij_seg = np.unique(ii * 100000 + jj, return_inverse=True)
        mask = jnp.ones(E, bool)
        enet, delta, weight = self.net_mod.apply(
            {"params": self.params}, jnp.asarray(net), jnp.asarray(ctx),
            jnp.asarray(corr_feat), jnp.asarray(ix.astype(np.int32)),
            jnp.asarray(jx.astype(np.int32)),
            jnp.asarray(kk_seg.astype(np.int32)), int(kk_seg.max()) + 1,
            jnp.asarray(ij_seg.astype(np.int32)), int(ij_seg.max()) + 1,
            mask, method=EVONet.run_update, kk_sorted=False)
        return np.asarray(enet), np.asarray(delta), np.asarray(weight)

    def _corr_ctx(self, coords, kk, jj):
        M, mem = self.M, self.mem
        kk_ring = (kk % (M * mem)).astype(np.int32)
        jj_ring = (jj % mem).astype(np.int32)
        corr_feat = corr_ops.corr_pyramid(
            jnp.asarray(self.gmap_), (jnp.asarray(self.fmap1_),
                                      jnp.asarray(self.fmap2_)),
            coords, jnp.asarray(kk_ring), jnp.asarray(jj_ring),
            radius=self.cfg.CORR_RADIUS, levels=self.cfg.CORR_LEVELS)
        ctx = self.imap_[kk_ring]
        return np.asarray(corr_feat, np.float32), ctx

    def _reproject(self, ii, jj, kk):
        return pops.transform(
            jnp.asarray(self.poses_), jnp.asarray(self.patches_),
            jnp.asarray(self.intrinsics_), jnp.asarray(ii.astype(np.int32)),
            jnp.asarray(jj.astype(np.int32)), jnp.asarray(kk.astype(np.int32)))

    # ------------------------------------------------------- probe / update
    def motion_probe(self):
        """devo.py:241-256."""
        M = self.M
        kk = np.arange(self.m - M, self.m)
        jj = np.full(M, self.n, np.int64)
        ii = kk // M
        coords = self._reproject(ii, jj, kk)
        corr_feat, ctx = self._corr_ctx(coords, kk, jj)
        net0 = np.zeros((M, self.cfg.DIM_INET), np.float32)
        none = np.full(M, -1, np.int64)
        _, delta, _ = self._run_update_net(net0, ctx, corr_feat, none, none,
                                           kk, ii, jj)
        return float(np.quantile(np.linalg.norm(delta, axis=-1), 0.5))

    def update(self):
        """devo.py:308-344."""
        cfg = self.cfg
        coords = self._reproject(self.ii, self.jj, self.kk)
        corr_feat, ctx = self._corr_ctx(coords, self.kk, self.jj)
        ix, jx = self._neighbors()
        enet, delta, weight = self._run_update_net(
            self.net, ctx, corr_feat, ix, jx, self.kk, self.ii, self.jj)
        self.net = enet

        P = self.P
        ctr = np.asarray(coords)[:, P // 2, P // 2]
        target = ctr + delta

        t0 = max(self.n - cfg.OPTIMIZATION_WINDOW if self.initialized else 1, 1)
        t1 = self.n
        intr_n = self.intrinsics_[max(self.n - 1, 0)]
        bounds = np.asarray([-64.0, -64.0, 2 * intr_n[2] + 64,
                             2 * intr_n[3] + 64], np.float32)
        E = len(self.kk)
        poses, patches = ba_ops.run_ba(
            jnp.asarray(self.poses_), jnp.asarray(self.patches_),
            jnp.asarray(self.intrinsics_),
            jnp.asarray(target, jnp.float32), jnp.asarray(weight, jnp.float32),
            jnp.float32(1e-4),
            jnp.asarray(self.ii.astype(np.int32)),
            jnp.asarray(self.jj.astype(np.int32)),
            jnp.asarray(self.kk.astype(np.int32)),
            jnp.ones(E, bool), t0=jnp.int32(t0), t1=jnp.int32(t1),
            kbase=jnp.int32(0), window=int(t1 - t0),
            patch_slots=int(self.m), bounds=jnp.asarray(bounds),
            iterations=2, structure_only=jnp.asarray(False),
            max_residual=128.0, ep=1.0, lm=1e-4, depth_clamp="inference",
            kk_sorted=False)
        self.poses_ = np.array(poses)        # writable copies
        self.patches_ = np.array(patches)

    def motionmag(self, i, j):
        """devo.py:258-265."""
        k = (self.ii == i) & (self.jj == j)
        if k.sum() == 0:
            # reference .mean() over empty is NaN -> `m/2 < thresh` False
            # -> no cull; the engine encodes the same via a nonempty flag
            return float("nan")
        flow = pops.flow_mag(
            jnp.asarray(self.poses_), jnp.asarray(self.patches_),
            jnp.asarray(self.intrinsics_),
            jnp.asarray(self.ii[k].astype(np.int32)),
            jnp.asarray(self.jj[k].astype(np.int32)),
            jnp.asarray(self.kk[k].astype(np.int32)), beta=0.5)
        return float(jnp.mean(flow))

    def keyframe(self):
        """devo.py:267-303 (cull only; the REMOVAL_WINDOW purge is applied
        at the start of the next frame, see module docstring)."""
        cfg, M = self.cfg, self.M
        i = self.n - cfg.KEYFRAME_INDEX - 1
        j = self.n - cfg.KEYFRAME_INDEX + 1
        mval = (self.motionmag(i, j) + self.motionmag(j, i)) / 2.0
        removed = bool(mval < cfg.KEYFRAME_THRESH) and i >= 0
        self.kf_log.append(removed)
        if not removed:
            return
        k = self.n - cfg.KEYFRAME_INDEX
        t0 = int(self.tstamps_[k - 1])
        t1 = int(self.tstamps_[k])
        dP = np.asarray(se3.mul(jnp.asarray(self.poses_[k]),
                                se3.inv(jnp.asarray(self.poses_[k - 1]))))
        self.delta[t1] = (t0, dP)

        self._remove((self.ii == k) | (self.jj == k))
        self.kk = np.where(self.ii > k, self.kk - M, self.kk)
        self.ii = np.where(self.ii > k, self.ii - 1, self.ii)
        self.jj = np.where(self.jj > k, self.jj - 1, self.jj)

        for f in range(k, self.n - 1):
            self.tstamps_[f] = self.tstamps_[f + 1]
            self.poses_[f] = self.poses_[f + 1]
            self.patches_[f * M:(f + 1) * M] = \
                self.patches_[(f + 1) * M:(f + 2) * M]
            self.intrinsics_[f] = self.intrinsics_[f + 1]
            self.imap_[(f % self.mem) * M:(f % self.mem + 1) * M] = \
                self.imap_[((f + 1) % self.mem) * M:((f + 1) % self.mem + 1) * M]
            self.gmap_[(f % self.mem) * M:(f % self.mem + 1) * M] = \
                self.gmap_[((f + 1) % self.mem) * M:((f + 1) % self.mem + 1) * M]
            self.fmap1_[f % self.mem] = self.fmap1_[(f + 1) % self.mem]
            self.fmap2_[f % self.mem] = self.fmap2_[(f + 1) % self.mem]

        self.n -= 1
        self.m -= M

    # -------------------------------------------------------------- step
    def __call__(self, tstamp, voxel_hwc, intrinsics):
        cfg, M, P, mem = self.cfg, self.M, self.P, self.mem

        # deferred REMOVAL_WINDOW purge from the previous frame's keyframe()
        # plus the engine's DOCUMENTED deviation: edges whose target frame
        # left the live feature window are dropped (the reference keeps
        # them but reads ring-aliased corr features once jj < n - MEM;
        # see engine.py `accepted`)
        if len(self.kk):
            self._remove((self.ii < self.n - cfg.REMOVAL_WINDOW)
                         | (self.jj < self.n + 1 - (cfg.MEM - 6) + 1))

        # rng stream mirrors engine.make_step exactly
        key, key_sel = jax.random.split(self.rng)
        self.rng = key

        voxel = jnp.asarray(voxel_hwc, jnp.float32)
        if cfg.EVS:
            if self.n == 0 and float(jnp.mean((voxel != 0).astype(
                    jnp.float32))) < 2e-2:
                return  # skip (devo.py:406-414)
            voxel = normalize(voxel, cfg.NORM)
        else:
            voxel = 2.0 * (voxel / 255.0) - 0.5

        out = self.net_mod.apply(
            {"params": self.params}, voxel[None], key_sel,
            patches_per_image=M, training=False,
            scorer_eval_mode=cfg.SCORER_EVAL_MODE,
            scorer_eval_use_grid=cfg.SCORER_EVAL_USE_GRID,
            method=EVONet.run_patchify)
        patches = np.array(out["patches"][0])    # (M, 3, P, P) (writable copy)
        n = self.n

        self.tlist.append(tstamp)
        self.tstamps_[n] = self.counter
        self.intrinsics_[n] = np.asarray(intrinsics) / 4.0

        # motion model (devo.py:502-512)
        if n > 1:
            P1 = jnp.asarray(self.poses_[n - 1])
            P2 = jnp.asarray(self.poses_[n - 2])
            xi = cfg.MOTION_DAMPING * se3.log(se3.mul(P1, se3.inv(P2)))
            self.poses_[n] = np.asarray(se3.mul(se3.exp(xi), P1))
        else:
            self.poses_[n] = self.poses_[max(n - 1, 0)]

        # depth init (devo.py:514-520); same key stream as the engine
        key_d = jax.random.fold_in(key_sel, 1)
        rand_d = np.asarray(jax.random.uniform(key_d, (M, 1)))
        if self.initialized:
            s = np.median(self.patches_[(n - 3) * M:n * M, 2])
            patches[:, 2] = s
        else:
            patches[:, 2] = rand_d[:, :, None]
        self.patches_[n * M:(n + 1) * M] = patches

        self.imap_[(n % mem) * M:(n % mem + 1) * M] = np.asarray(out["imap"][0])
        self.gmap_[(n % mem) * M:(n % mem + 1) * M] = np.asarray(out["gmap"][0])
        fmap = np.asarray(out["fmap"][0])
        self.fmap1_[n % mem] = fmap
        h1, w1 = fmap.shape[0], fmap.shape[1]
        self.fmap2_[n % mem] = fmap.reshape(h1 // 4, 4, w1 // 4, 4, -1) \
            .mean((1, 3))
        self.counter += 1

        if self.n > 0 and not self.initialized:
            if self.motion_probe() < cfg.MOTION_PROBE_THRESH:
                self.probe_log.append(False)
                self.delta[self.counter - 1] = (self.counter - 2,
                                                np.asarray(se3.identity()))
                return
            self.probe_log.append(True)

        self.n += 1
        self.m += M

        self._append(*self._edges_forw())
        self._append(*self._edges_back())

        if self.n == 8 and not self.initialized:
            self.initialized = True
            for _ in range(12):
                self.update()
        elif self.initialized:
            self.update()
            self.keyframe()

    def terminate(self):
        """devo.py:186-208."""
        traj = {int(self.tstamps_[i]): self.poses_[i] for i in range(self.n)}
        if not self.initialized:
            poses = np.tile(np.asarray([0, 0, 0, 0, 0, 0, 1.0]),
                            (self.counter, 1))
            return poses, np.asarray(self.tlist, np.float64)

        def get_pose(t):
            chain = []
            while t not in traj:
                chain.append(t)
                t = self.delta[t][0]
            base = traj[t]
            for tt in reversed(chain):
                base = np.asarray(se3.mul(jnp.asarray(self.delta[tt][1]),
                                          jnp.asarray(base)))
                traj[tt] = base
            return base

        poses = np.stack([get_pose(t) for t in range(self.counter)])
        poses = np.asarray(se3.inv(jnp.asarray(poses)))
        return poses, np.asarray(self.tlist, np.float64)
