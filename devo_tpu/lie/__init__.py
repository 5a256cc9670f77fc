"""Pure-JAX Lie-group library (SO3 / RxSO3 / SE3 / Sim3).

TPU-native replacement for the reference's lietorch extension
(/root/reference/devo/lietorch/): the Eigen/CUDA backends become plain
differentiable JAX functions over trailing-dim arrays, so exp/log/mul/inv/
adj/act all fuse into surrounding XLA programs with no custom kernels needed.
"""
from . import quaternion, rxso3, se3, sim3, so3

__all__ = ["quaternion", "so3", "rxso3", "se3", "sim3"]
