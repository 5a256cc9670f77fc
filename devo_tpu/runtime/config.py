"""Runtime configuration.

Dataclass counterpart of the reference's yacs node
(/root/reference/devo/config.py) plus the per-benchmark YAML overrides
(config/default_evs.yaml, config/eval_*.yaml). Extra fields size the static
TPU buffers (edge capacity, BA window, SoftAgg segment spans) that replace
the reference's dynamically growing tensors.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class VOConfig:
    # reference knobs (devo/config.py:6-32; yaml values in comments)
    BUFFER_SIZE: int = 4096
    HT: int = 480                        # image height (static per run)
    WD: int = 640                        # image width
    GRADIENT_BIAS: bool = False
    PATCH_SELECTOR: str = "scorer"
    SCORER_EVAL_MODE: str = "multi"
    SCORER_EVAL_USE_GRID: bool = True
    NORM: str = "std"
    EVS: bool = True                     # event voxels; False = frame input
                                         # (RGB / E2VID / rendered ev-frames)
    BINS: int = 5                        # input channels (3 for frames)
    PATCHES_PER_FRAME: int = 96          # default_evs.yaml: 96 (config.py: 80)
    REMOVAL_WINDOW: int = 22             # yaml: 22
    OPTIMIZATION_WINDOW: int = 10        # yaml: 10
    PATCH_LIFETIME: int = 13             # yaml: 13
    KEYFRAME_INDEX: int = 4
    KEYFRAME_THRESH: float = 15.0
    MOTION_MODEL: str = "DAMPED_LINEAR"
    MOTION_DAMPING: float = 0.5
    MOTION_PROBE_THRESH: float = 2.0     # devo.py:532 (2.0 at scale 1)
    MIXED_PRECISION: bool = True

    # network shape
    PATCH_SIZE: int = 3
    DIM_INET: int = 384
    DIM_FNET: int = 128
    DIM: int = 32
    CORR_RADIUS: int = 3
    CORR_LEVELS: tuple = (1, 4)

    # TPU static capacities
    MEM: int = 32                        # feature ring buffer (devo.py:69)
    EDGE_CAP: int = 0                    # 0 -> auto from the bound below
    VOXEL_WIRE: str = "i8"               # host->device wire format: "i8"
                                         #   (per-frame-scaled int8, 4x
                                         #   fewer tunnel bytes), "f16",
                                         #   "f32" (lossless, parity runs)
    CORR_IMPL: str = "banded"            # "banded" (per-edge contiguous-DMA
                                         #   Pallas kernel, live-count early
                                         #   exit — the fast path),
                                         # "window" (slice-gather + MXU),
                                         # "pallas" (grouped VMEM-resident),
                                         # "gather" (naive reference form)
    CORR_KERNEL: str = "mono"            # banded kernel flavor: "mono"
                                         #   (both levels' windows in ONE
                                         #   stacked buffer -> ONE dot per
                                         #   edge, extraction inlined into
                                         #   the matmul loop, cross-block
                                         #   DMA continuation — engine bench
                                         #   53.8 vs pair 47.0 FPS, r04),
                                         # "mono2" (mono with 2-edge dot
                                         #   batching; -3.2 FPS r04 — the
                                         #   in-kernel window concat copy),
                                         # "mono4" (mono2 minus the concat:
                                         #   even-pair ring slots are
                                         #   adjacent, both windows read as
                                         #   ONE slice — STILL -3 FPS at
                                         #   matched cycle phase, r05: the
                                         #   2-edge dot itself loses, not
                                         #   just the copy. Probe kept),
                                         # "pair2" (per-level buffers,
                                         #   phase-split ext, cross-block
                                         #   DMA continuation),
                                         # "pair" (both pyramid levels in
                                         #   ONE kernel, shared per-edge g
                                         #   block, per-level DMA pipelines
                                         #   — engine bench 43.9 vs 41.6 FPS
                                         #   over per-level split, r03),
                                         # "split" (phase-split DMA+MXU then
                                         #   in-kernel per-edge extraction,
                                         #   one call per level),
                                         # "split2" (software-pipelined:
                                         #   block b-1's extraction runs
                                         #   under block b's window-DMA
                                         #   stream; lagged output block),
                                         # "g8c" (compact group matmul + XLA
                                         #   extraction — measured 20-100x
                                         #   SLOWER on real v5e, kept only
                                         #   as a probe; PERF_NOTES r03).
    CORR_WIN_L1: int = 12                # level-1 window DMA rows: 8 (8x8
                                         #   taps incl. bilinear) + the
                                         #   budget for per-edge patch
                                         #   y-spread after reprojection.
                                         #   16 (spread <= 8 px at feature
                                         #   res) matches level_win_rows;
                                         #   12 (spread <= 4, the default —
                                         #   +1.1 FPS measured r04) cuts
                                         #   level-1 window bytes 25% — the
                                         #   DMA is stream-bandwidth-bound
                                         #   at ~220 GB/s (r04 probe), so
                                         #   bytes are the lever. Edges
                                         #   whose patch distorts > 4 px in
                                         #   y get clipped taps (BA weight
                                         #   gating covers them; x budget
                                         #   stays 8).
    CORR_L4_RESIDENT: str = "off"        # level-4 ring layout: "on" = plain
                                         #   padded i8 rings, whole ring set
                                         #   VMEM-resident in the corr kernel
                                         #   (ONE DMA descriptor per call
                                         #   instead of one per edge).
                                         #   Measured +13 ms/pyramid-call on
                                         #   real v5e vs banded-DMA — a
                                         #   hardware-REJECTED probe, kept
                                         #   off (PERF_NOTES r03),
                                         # "off" = banded-DMA level 4 (the
                                         #   measured-fastest default),
                                         # "auto" = on iff the ring set fits
                                         #   the VMEM budget (requires
                                         #   CORR_RING_I8)
    ENET_BF16: bool = True               # store the recurrent per-edge
                                         #   hidden state (enet) in bf16:
                                         #   cuts the per-frame edge-table
                                         #   merge payload 3x (an f32 state
                                         #   needs a 3-plane bf16 split to
                                         #   move exactly; bf16 rides in
                                         #   one). The update operator runs
                                         #   the state through LayerNorm
                                         #   first and the reference
                                         #   autocasts the whole block to
                                         #   fp16 (devo.py:71-74); golden
                                         #   tests cover the bf16 state.
    FUSED_ENCODERS: bool = True          # evaluate fnet+inet as one block-
                                         #   diagonal network (exact; halves
                                         #   the lane-padded stage-1 conv
                                         #   traffic — nets/fused_encoder.py)
    SCORER_S2D: bool = True              # evaluate the scorer in space-to-
                                         #   depth(4) layout (exact; fills
                                         #   the 128 lanes every stage
                                         #   instead of padding 8/16/32
                                         #   channels — nets/scorer_s2d.py;
                                         #   engine A/B in PERF_NOTES r05)
    ENCODER_S2D: bool = False            # fused-encoder stage 1 in space-
                                         #   to-depth(2) layout (exact;
                                         #   fused_encoder.fused_encode_s2d,
                                         #   r05 probe — see PERF_NOTES)
    CORR_RING_I8: bool = True            # store the banded corr feature
                                         #   rings as per-frame-scaled int8
                                         #   (halves the kernel's window-DMA
                                         #   bytes — the measured bottleneck
                                         #   stage); corr is linear in the
                                         #   frame features so one per-slot
                                         #   scale on the output dequantizes
                                         #   exactly. False = bf16 rings
                                         #   (lossless wrt the bf16 net).

    def __post_init__(self):
        if self.EDGE_CAP == 0:
            # worst-case live edges: patches from the last REMOVAL_WINDOW+2
            # frames, each with at most 2*PATCH_LIFETIME-1 edges, plus one
            # freshly appended block before compaction.
            per_patch = 2 * self.PATCH_LIFETIME - 1
            bound = self.PATCHES_PER_FRAME * (self.REMOVAL_WINDOW + 2) * per_patch
            bound += self.PATCHES_PER_FRAME * per_patch
            object.__setattr__(self, "EDGE_CAP", _round_up(bound, 1024))

    # derived statics
    @property
    def M(self) -> int:
        return self.PATCHES_PER_FRAME

    @property
    def P(self) -> int:
        return self.PATCH_SIZE

    @property
    def ba_window(self) -> int:
        return max(self.OPTIMIZATION_WINDOW, 8)

    @property
    def frame_span(self) -> int:
        """Frame range that live edges can touch, for dense segment ids."""
        return self.REMOVAL_WINDOW + 4

    @property
    def patch_slots(self) -> int:
        return self.frame_span * self.M

    def replace(self, **kw) -> "VOConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_yaml(cls, path: str, base: "VOConfig" = None) -> "VOConfig":
        """Load a reference-format yaml override file (the user-facing
        `--config config/eval_eds.yaml` surface; cf. the yacs merge at
        /root/reference/evals/eval_evs/eval_eds_evs.py:85). Unknown keys
        are rejected so typos don't silently fall back to defaults."""
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - fields
        if unknown:
            raise ValueError(f"{path}: unknown config keys {sorted(unknown)}")
        base = base if base is not None else cls()
        if not raw:
            return base
        # re-derive EDGE_CAP only when a sizing knob actually changes —
        # an explicitly pinned base EDGE_CAP must survive unrelated
        # overrides (it keys compiled executables)
        sizing = {"PATCHES_PER_FRAME", "REMOVAL_WINDOW", "PATCH_LIFETIME"}
        if sizing & set(raw):
            raw = {"EDGE_CAP": 0, **raw}
        return dataclasses.replace(base, **raw)


# per-benchmark overrides mirroring /root/reference/config/eval_*.yaml.
# Eval configs use the LOSSLESS f16 voxel wire: ATE parity claims must not
# ride on the bench's int8 quantization (i8 stays the default for raw
# VOConfig/bench runs, where wire bytes gate frame rate).
DEFAULT_EVS = VOConfig()
# CORR_WIN_L1=16: eval runs keep the full level-1 window (no tap clipping
# beyond the reference's own 8-px spread budget) until the MIGRATION.md
# step-3c A/B proves the bench's 12-row trim ATE-neutral (ADVICE r04).
_EVAL_BASE = DEFAULT_EVS.replace(VOXEL_WIRE="f16", CORR_RING_I8=False,
                                 CORR_WIN_L1=16)
EVAL_CONFIGS = {
    "default": _EVAL_BASE,                                   # KEYFRAME_THRESH 15
    "eds": _EVAL_BASE.replace(KEYFRAME_THRESH=25.0),
    "fpv": _EVAL_BASE.replace(KEYFRAME_THRESH=5.0),
    "rpg": _EVAL_BASE.replace(KEYFRAME_THRESH=5.0),
    "hku": _EVAL_BASE,
    "mvsec": _EVAL_BASE.replace(KEYFRAME_THRESH=5.0),
    "vector": _EVAL_BASE,
    "tumvie": _EVAL_BASE,
    "tartanair": _EVAL_BASE,
}
