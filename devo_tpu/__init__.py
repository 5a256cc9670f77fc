"""devo_tpu — a TPU-native event visual odometry framework.

Ground-up JAX/XLA/Pallas rebuild of Deep Event Visual Odometry (DEVO,
3DV 2024; reference implementation tum-vision/DEVO). Sparse patch-based
monocular VO on event-voxel input: a learned patch selector + feature/context
CNNs, a recurrent update operator, and a differentiable bundle-adjustment
layer, all designed for the TPU compilation model (static shapes, masked
fixed-capacity patch graphs, segment-sum scatter, bf16 feature path,
f32 Gauss-Newton solves).
"""
__version__ = "0.1.0"
