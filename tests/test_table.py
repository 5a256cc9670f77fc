"""Bit-exactness of the one-hot MXU table gather (ops/table.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from devo_tpu.ops import table as table_ops


def test_take_rows_bit_exact():
    rng = np.random.default_rng(0)
    E, Di = 513, 96
    ii = rng.integers(0, 4096, E).astype(np.int32)
    jj = rng.integers(0, 4096, E).astype(np.int32)
    kk = rng.integers(0, 393216, E).astype(np.int32)
    # full-range f32 payload incl. denormal-ish and large magnitudes
    # full exactness domain: |v| in {0} u [2^-100, 2^127] (below that the
    # third bf16 residual term hits the subnormal floor; absolute error is
    # then < 1e-38 — see ops/table.py docstring)
    enet = (rng.standard_normal((E, Di)) *
            10.0 ** rng.integers(-25, 30, (E, Di))).astype(np.float32)
    src = rng.integers(0, E, E).astype(np.int32)

    got = jax.jit(table_ops.take_rows)(
        jnp.asarray(src), jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
        jnp.asarray(enet))
    np.testing.assert_array_equal(np.asarray(got[0]), ii[src])
    np.testing.assert_array_equal(np.asarray(got[1]), jj[src])
    np.testing.assert_array_equal(np.asarray(got[2]), kk[src])
    np.testing.assert_array_equal(np.asarray(got[3]), enet[src])


def test_take_rows_identity_and_extremes():
    E, Di = 64, 8
    ii = jnp.arange(E, dtype=jnp.int32)
    enet = jnp.asarray(
        np.asarray([[0.0, -0.0, 1.0, -1.0, 1.6e38, -1.6e38, 1e-25, 7.0]]
                   * E, np.float32))
    src = jnp.arange(E, dtype=jnp.int32)
    out = table_ops.take_rows(src, ii, ii, ii, enet)
    np.testing.assert_array_equal(np.asarray(out[2]), np.arange(E))
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(enet))


def test_take_rows_bf16_payload_bit_exact():
    """A bf16 hidden state rides in ONE plane and must stay bit-exact
    through both the banded and full paths (ENET_BF16 engine default)."""
    rng = np.random.default_rng(3)
    E, Di = 2048, 16
    ii = rng.integers(0, 4096, E).astype(np.int32)
    enet = jnp.asarray(rng.standard_normal((E, Di)), jnp.bfloat16)
    src = np.minimum(np.arange(E) + rng.integers(0, 64, E), E - 1).astype(np.int32)
    iij = jnp.asarray(ii)
    got = jax.jit(lambda s: table_ops.take_rows(
        s, iij, iij, iij, enet, band=(0, 128), valid_count=E))(
        jnp.asarray(src))
    assert got[3].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got[0]), ii[src])
    np.testing.assert_array_equal(
        np.asarray(got[3], np.float32), np.asarray(enet, np.float32)[src])
    # full path (no band)
    got2 = table_ops.take_rows(jnp.asarray(src), iij, iij, iij, enet)
    np.testing.assert_array_equal(
        np.asarray(got2[3], np.float32), np.asarray(enet, np.float32)[src])
