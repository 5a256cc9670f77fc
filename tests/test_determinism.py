"""Determinism of the tracking engine (SURVEY §5.2).

The reference's CUDA kernels accumulate with atomicAdd, whose float
ordering makes runs NON-deterministic (correlation_kernel.cu:77,185-186;
ba_cuda.cu:297-322). This build replaces every scatter with segment ops /
one-hot matmuls, so two runs over the same frames with the same seed must
be BITWISE identical — poses, edge table, and trajectory. This test is the
proof the survey calls for (the advantage the reference cannot have).
"""
import numpy as np

from devo_tpu.runtime.engine import DEVO

from test_engine import HT, WD, TEST_CFG, make_params, synthetic_voxels


def _run(params, n_frames=12):
    slam = DEVO(TEST_CFG, params, ht=HT, wd=WD, seed=0)
    for vox, intr, ts in synthetic_voxels(n_frames):
        slam(ts, np.transpose(vox, (1, 2, 0)), intr)
    poses, tss = slam.terminate()
    st = slam.state
    table = tuple(np.asarray(x) for x in (st.ii, st.jj, st.kk, st.emask))
    return np.asarray(poses), np.asarray(tss), table, np.asarray(st.patches)


def test_two_runs_bitwise_identical():
    params = make_params(TEST_CFG)
    p1, t1, tab1, patches1 = _run(params)
    p2, t2, tab2, patches2 = _run(params)
    # bitwise: view as raw bytes so NaN payloads / -0.0 would count too
    np.testing.assert_array_equal(p1.view(np.uint8), p2.view(np.uint8))
    np.testing.assert_array_equal(t1, t2)
    for a, b in zip(tab1, tab2):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(patches1.view(np.uint8),
                                  patches2.view(np.uint8))
