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


def _apply_platform_env() -> None:
    """Make a ``JAX_PLATFORMS=cpu python ...`` prefix actually work.

    The axon sitecustomize imports jax at interpreter start and forces the
    axon platform via config, which CLOBBERS the env var — so every CLI that
    later touches `jax.devices()` initializes the remote-TPU client even when
    the caller asked for CPU (and hangs whenever the tunnel is down).
    Re-assert the env var through `jax.config` at package import, which is
    always before any devo_tpu entry point instantiates a backend.
    """
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if not plat or plat == "axon":
        return
    try:
        import jax

        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # jax absent or backends already up: leave the session as-is


_apply_platform_env()
