"""Benchmark: event-voxel VO throughput on one TPU chip.

Runs the full DEVO tracking engine (patchify CNNs + patch selection +
recurrent update + bundle adjustment + keyframing) over a synthetic
EDS-resolution (480x640, 5-bin) event-voxel stream and reports steady-state
frames/sec. North-star baseline: 60 FPS on one v5e chip
(/root/repo/BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _hb(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _probe_backend(timeout_s: int = 300) -> bool:
    """The axon backend init HANGS indefinitely while the TPU tunnel is
    down (observed 2026-08-17/18); probe it in a bounded subprocess so a
    dead tunnel fails the bench in minutes, not the driver's whole budget."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_backend():
        _hb("backend init probe failed/timed out (TPU tunnel down?) — "
            "aborting instead of hanging")
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    from devo_tpu.nets.evonet import EVONet
    from devo_tpu.runtime.config import VOConfig
    from devo_tpu.runtime.engine import DEVO
    from devo_tpu.utils.timing import enable_compilation_cache

    # cold driver runs pay 10-90 s/bucket remote compiles without this;
    # with it, executables compiled by ANY previous run on this host load
    # in O(100 ms) and the warm window measures steady-state tracking
    enable_compilation_cache()

    HT, WD = 480, 640
    # warm through the early-sequence edge-count peak (purging starts at
    # n > REMOVAL_WINDOW) so every bucket executable is compiled before the
    # timed window — a mid-timing recompile costs minutes. N_POST frames run
    # after wait_buckets() and before timing: the FIRST dispatch of each
    # freshly-(de)serialized bucket executable pays ~0.5 s of host-side
    # setup (measured as window-1 dispatch 0.51 s vs 0.04 s steady) that is
    # one-time cost, not throughput
    # N_POST is a floor: after it, post frames continue until the live-edge
    # count plateaus (ADVICE r03: window 1 otherwise starts below steady
    # load — 7776 vs 9600 live edges — and flatters the overall number),
    # bounded by N_POST_MAX so a pathological config still terminates.
    N_WARM, N_POST, N_POST_MAX, N_BENCH = 48, 8, 336, 336

    # the motion-probe gate is a learned behavior (devo.py:531-534); with
    # random weights it rejects every frame and the bench would measure the
    # (cheap) rejection path instead of tracking. Disable it here.
    # BENCH_RING_I8/BENCH_WIRE env knobs A/B the corr-ring dtype and the
    # host->device wire format without editing the file (perf triage).
    import os
    ring_raw = os.environ.get("BENCH_RING_I8", "1").strip().lower()
    if ring_raw not in ("0", "1", "true", "false", "yes", "no", ""):
        sys.exit(f"BENCH_RING_I8={ring_raw!r}: expected one of "
                 "0/1/true/false/yes/no")
    ring_i8 = ring_raw in ("1", "true", "yes")
    wire = os.environ.get("BENCH_WIRE", "i8").strip().lower()
    if wire not in ("i8", "f16", "f32"):
        # the engine silently falls back to f32 for unknown values — a
        # typo'd A/B run must fail loudly, not measure the wrong config
        sys.exit(f"BENCH_WIRE={wire!r}: expected one of i8/f16/f32")
    kern = os.environ.get("BENCH_CORR_KERNEL", "").strip().lower()
    kern = kern or VOConfig.CORR_KERNEL
    if kern not in ("split", "split2", "pair", "pair2", "mono", "mono2", "mono3", "mono4", "g8c"):
        sys.exit(f"BENCH_CORR_KERNEL={kern!r}: expected "
                 "split/split2/pair/pair2/mono/mono2/mono3/mono4/g8c")
    wr1 = int(os.environ.get("BENCH_CORR_WR1", "0")) or VOConfig.CORR_WIN_L1
    # Workload + de-lottery (VERDICT r04 item 3; re-characterized r05 with
    # 12 timed windows). Under random weights every frame is culled
    # (flow magnitude ~0 < KEYFRAME_THRESH, n pinned at 8); each cull
    # removes one frame's ~2400 edges while the append adds ~2496, so the
    # live count CREEPS +~96/frame without bound — r04's "7776->11616
    # cull cycle" was this treadmill's transient, and which bucket the
    # async sampler grabbed during it was the "bucket lottery". The pinned
    # DEVO_FORCE_BUCKET below therefore DEFINES the operating point: the
    # count climbs to the cap (~4 windows) and equilibrates there under
    # append-shedding. 12288 ~= 12k live edges, the mid-band of real
    # sequence loads (real runs mix culls with growing n + REMOVAL_WINDOW
    # purge; sustained fast motion reaches ~40k).
    #   * BENCH_KEYFRAME_THRESH=-1 selects that no-cull MAX-LOAD regime:
    #     live edges saturate at ~41k, FPS scales ~1/bucket (15.83 FPS at
    #     40960, window spread 0.002 — PERF_NOTES r05).
    #   * the early windows (pre-saturation) read 57-64 FPS; the honest
    #     steady number is the SATURATED tail, which the 12-window median
    #     approaches. All windows are in the JSON for attribution.
    kf_thresh = float(os.environ.get("BENCH_KEYFRAME_THRESH",
                                     str(VOConfig.KEYFRAME_THRESH)))
    if kf_thresh >= 0 and "DEVO_FORCE_BUCKET" not in os.environ:
        # pin the cull-regime bucket (the 11616-edge cycle peak fits);
        # max-load runs let the sampler find the saturation bucket
        os.environ["DEVO_FORCE_BUCKET"] = "12288"
    s2d = os.environ.get("BENCH_SCORER_S2D", "").strip().lower()
    s2d = VOConfig.SCORER_S2D if s2d == "" else s2d in ("1", "true", "yes")
    es2d = os.environ.get("BENCH_ENCODER_S2D", "").strip().lower()
    es2d = VOConfig.ENCODER_S2D if es2d == "" else es2d in ("1", "true", "yes")
    cfg = VOConfig(
        MOTION_PROBE_THRESH=-1.0,
        KEYFRAME_THRESH=kf_thresh,
        CORR_RING_I8=ring_i8,
        VOXEL_WIRE=wire,
        CORR_KERNEL=kern,
        CORR_WIN_L1=wr1,
        SCORER_S2D=s2d,
        ENCODER_S2D=es2d,
    )
    net = EVONet(P=cfg.P, dim_inet=cfg.DIM_INET, dim_fnet=cfg.DIM_FNET,
                 dim=cfg.DIM, patch_selector=cfg.PATCH_SELECTOR)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, HT, WD, 5)), jax.random.PRNGKey(1))["params"]

    # synthetic sliding event texture with real optical flow
    rng = np.random.default_rng(0)
    base = rng.standard_normal((HT, WD * 2, 5)).astype(np.float32)
    base *= (rng.random((HT, WD * 2, 5)) < 0.1)
    intr = np.asarray([320.0, 320.0, WD / 2, HT / 2], np.float32)

    slam = DEVO(cfg, params, ht=HT, wd=WD, seed=0)

    def frame(i):
        sh = (3 * i) % WD
        return base[:, sh:sh + WD]

    # batched double-buffered upload thread: the host->device voxel
    # transfer otherwise serializes with the step execution (the reference
    # hides the same latency with multiprocessing loaders,
    # load_utils.py:119-131), and EVERY per-frame upload pays a flat
    # ~31 ms tunnel sync — measured as the bench's critical path in the
    # round-3 A/B (window_upload_wait_s ~= the whole window). One stacked
    # K-frame transfer amortizes the sync to 31/K ms/frame
    # (engine.upload_batch).
    import queue
    import threading

    # Unbounded queue: the whole synthetic stream (168 x 1.5 MB i8 voxels
    # ~= 260 MB) fits in v5e HBM, and the warm/bucket-compile phase gives
    # the uploader minutes of overlap to get fully ahead of the timed
    # window. The round-3 A/B showed upload wait WAS the critical path
    # (2-3.3 s of every ~3 s window) and swung the headline number 3x with
    # tunnel state; a fully-ahead uploader makes the bench measure the
    # engine, with window_upload_wait_s in the JSON proving the overlap.
    UPLOAD_BATCH = 8
    q: "queue.Queue" = queue.Queue()

    N_TOT = N_WARM + N_POST_MAX + N_BENCH

    def uploader():
        buf = []
        for i in range(N_TOT):
            buf.append((i, frame(i)))
            if len(buf) == UPLOAD_BATCH or i == N_TOT - 1:
                ups = slam.upload_batch([f for _, f in buf])
                for (j, _), uv in zip(buf, ups):
                    q.put((j, uv))
                buf = []

    threading.Thread(target=uploader, daemon=True).start()

    _hb("engine built; warming")
    for _ in range(N_WARM):
        i, vox = q.get()
        slam(i / 30.0, vox, intr)
        if i % 12 == 0:
            _hb(f"warm frame {i}/{N_WARM}")
    jax.block_until_ready(slam.state.poses)
    # every bucket executable must exist before timing: a mid-window bucket
    # switch would otherwise charge a 10-90 s remote compile to the FPS
    _hb("warm done; waiting for bucket executables")
    while not slam.wait_buckets(timeout=60):
        pc = slam._precompiler
        _hb(f"buckets ready: {sorted(pc._ready)} of {pc._all_caps}")
    # absorb the one-time first-dispatch cost of the post-compile
    # executables before the timed windows. The precompiler's _warm_bucket
    # already runs one throwaway step per bucket as it compiles, so every
    # bucket executable has been dispatched once by now; these N_POST frames
    # additionally cover the main-thread re-dispatch of whichever bucket is
    # resident (the 0.51 s window-1 dispatch spike measured in r03). Buckets
    # NOT visited before timing would still pay that cost mid-window — in
    # practice the timed windows stay in one bucket (window_bucket_caps).
    for _ in range(N_POST):
        i, vox = q.get()
        slam(i / 30.0, vox, intr)
    jax.block_until_ready(slam.state.poses)
    # keep running post frames until the live-edge count plateaus so every
    # timed window measures steady-state load (growth < 16 edges/frame over
    # a 4-frame probe; each probe costs one ~31 ms sync read, outside the
    # timed windows)
    used = N_POST
    cur = prev = int(slam.state.n_edges)
    calm = 0
    force_cap = os.environ.get("DEVO_FORCE_BUCKET")
    target = int(force_cap) if force_cap else None
    while used + 8 <= N_POST_MAX:
        for _ in range(8):
            i, vox = q.get()
            slam(i / 30.0, vox, intr)
        used += 8
        jax.block_until_ready(slam.state.poses)
        cur = int(slam.state.n_edges)
        if target is not None:
            # pinned bucket: the live-edge treadmill creeps to the cap and
            # equilibrates there (r05) — time ONLY the saturated steady
            # state so every window measures the same, honest load
            if cur >= target - 128:
                break
            continue
        # unpinned (max-load regime): append/removal makes growth bursty;
        # require TWO consecutive calm probes
        calm = calm + 1 if cur - prev < 64 else 0
        if calm >= 2:
            break
        prev = cur
    _hb(f"buckets ready; {cur} live edges after {used} post frames; timing")

    # timed sub-windows: one block per window. The overall number is the
    # deliverable; the per-window spread diagnoses environment variance
    # (cold tunnel, host contention, bucket transitions — the round-1
    # driver measured 28.55 where the builder measured 38.15, see
    # PERF_NOTES.md "Measurement rules")
    # 12 windows: the live-edge cull cycle spans several windows and the
    # stochastic patch selection makes each config's cycle differ — with 4
    # windows the phase MIX swung the overall number by more than real
    # config deltas (r05: 56.94 vs 56.36 on identical configs). 12 windows
    # ~= 4 cycles: the mix converges and the median 'steady' number sits
    # mid-cycle.
    WINDOWS = 12
    per = N_BENCH // WINDOWS  # 28 frames/window
    win_fps, win_qwait, win_caps, win_live, win_disp = [], [], [], [], []
    win_dt = []
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        qwait = 0.0
        disp = 0.0
        caps = set()
        for _ in range(per):
            tq = time.perf_counter()
            i, vox = q.get()
            qwait += time.perf_counter() - tq
            td = time.perf_counter()
            slam(i / 30.0, vox, intr)
            # host-side dispatch cost (returns before device completion):
            # if this approaches the device step time, the bench is
            # HOST-dispatch-bound, not engine-bound
            disp += time.perf_counter() - td
            caps.add(slam.state.ii.shape[0])
        jax.block_until_ready(slam.state.poses)
        win_dt.append(time.perf_counter() - t0)
        win_fps.append(per / win_dt[-1])
        win_qwait.append(qwait)
        win_disp.append(disp)
        win_caps.append(sorted(caps))
        # one sync live-edge read per window boundary (~31 ms tunnel
        # round-trip, outside the block_until_ready'd window timing above
        # would bias; it lands AFTER t0 of nothing — acceptable: it charges
        # the NEXT window ~31 ms, noted in the JSON for attribution)
        win_live.append(int(slam.state.n_edges))
    # sum of window durations only: the per-boundary diagnostic live-edge
    # read costs a flat ~24-31 ms tunnel round-trip OUTSIDE the windows
    # and was silently charging the overall number ~0.3 s/run (r05)
    dt = sum(win_dt)

    fps = WINDOWS * per / dt
    # the warm loop above runs INTO the pinned-cap equilibrium before
    # timing, so every window measures the saturated steady state; the
    # median is a plain robust center (transient windows no longer exist)
    steady = float(np.median(win_fps))
    spread = (max(win_fps) - min(win_fps)) / max(win_fps)
    print(json.dumps({
        "metric": "event_vo_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        "steady_window_fps": round(steady, 2),
        "window_fps": [round(f, 2) for f in win_fps],
        "window_spread": round(spread, 3),
        # perf-triage diagnostics (VERDICT r02: the bench must be able to
        # attribute its own regressions without a human at the keyboard)
        "config": {"ring_i8": ring_i8, "wire": wire, "corr_kernel": kern,
                   "keyframe_thresh": kf_thresh,
                   "scorer_s2d": s2d,
                   "encoder_s2d": es2d,
                   "force_bucket": os.environ.get("DEVO_FORCE_BUCKET"),
                   # kernel-tune env knobs (ADVICE r03: IF/K/BE A/B runs
                   # must be distinguishable from the JSON artifact alone)
                   "corr_win_l1": wr1,
                   "corr_if": os.environ.get("DEVO_CORR_IF"),
                   "corr_k": os.environ.get("DEVO_CORR_K"),
                   "corr_be": os.environ.get("DEVO_CORR_BE")},
        "window_upload_wait_s": [round(x, 2) for x in win_qwait],
        "window_dispatch_s": [round(x, 2) for x in win_disp],
        "window_bucket_caps": win_caps,
        "window_end_live_edges": win_live,
    }))


if __name__ == "__main__":
    main()
