"""Unit tests for UB5 reconstruction and staggered-grid stencils."""

import jax.numpy as jnp
import numpy as np
import pytest

from rbc_gym_tpu.ops import stencils as st


def _ub5_face_ref(q, m):
    """Golden UB5 left-biased value at the face between cells m-1 and m."""
    n = len(q)
    return (
        2 * q[(m - 3) % n]
        - 13 * q[(m - 2) % n]
        + 47 * q[(m - 1) % n]
        + 27 * q[m % n]
        - 3 * q[(m + 1) % n]
    ) / 60


def test_recon_c2f_periodic_matches_golden_positive_velocity():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4))
    vel = np.ones((16, 4))
    out = st.recon_c2f_periodic(jnp.asarray(q), jnp.asarray(vel), axis=-2)
    for i in range(16):
        np.testing.assert_allclose(
            np.asarray(out)[i, 0], _ub5_face_ref(q[:, 0], i), rtol=1e-12
        )


def test_recon_periodic_constant_exact():
    q = jnp.full((12, 3), 3.7)
    for vel_sign in (1.0, -1.0):
        vel = jnp.full((12, 3), vel_sign)
        out = st.recon_c2f_periodic(q, vel, axis=-2)
        np.testing.assert_allclose(np.asarray(out), 3.7, rtol=1e-12)
        out = st.recon_f2c_periodic(q, vel, axis=-2)
        np.testing.assert_allclose(np.asarray(out), 3.7, rtol=1e-12)


def test_recon_periodic_fifth_order_convergence():
    """UB5 is a finite-volume scheme: 5th-order when fed cell *averages*."""
    errs = []
    for n in (32, 64):
        h = 2 * np.pi / n
        x_f = np.arange(n) * h
        # cell averages of sin over [x_f[i], x_f[i]+h]
        q = (np.cos(x_f) - np.cos(x_f + h)) / h
        out = st.recon_c2f_periodic(
            jnp.asarray(q)[:, None], jnp.ones((n, 1)), axis=-2
        )
        errs.append(np.max(np.abs(np.asarray(out)[:, 0] - np.sin(x_f))))
    order = np.log2(errs[0] / errs[1])
    assert order > 4.5, f"observed order {order}"


def test_z_matrices_constant_exact_interior():
    nz = 16
    left, right = st.z_recon_matrices_c2f(nz)
    q = np.full(nz, 2.5)
    for mat in (left, right):
        out = mat @ q
        # interior faces must reproduce constants exactly
        np.testing.assert_allclose(out[1:-1], 2.5, rtol=1e-12)
    # f2c likewise
    left, right = st.z_recon_matrices_f2c(nz)
    q = np.full(nz + 1, -1.3)
    for mat in (left, right):
        np.testing.assert_allclose(mat @ q, -1.3, rtol=1e-12)


def test_z_matrix_ub5_rows_match_periodic_formula():
    nz = 32
    left, _ = st.z_recon_matrices_c2f(nz)
    q = np.random.default_rng(1).normal(size=nz)
    # row k=5 is deep interior -> UB5
    expected = (2 * q[2] - 13 * q[3] + 47 * q[4] + 27 * q[5] - 3 * q[6]) / 60
    np.testing.assert_allclose(left[5] @ q, expected, rtol=1e-12)


def test_divergence_operators_consistent():
    # d/dx then d/dz of a linear field is exact
    nx, nz, dx, dz = 8, 6, 0.5, 0.25
    x = np.arange(nx) * dx
    u = np.tile(3.0 * x[:, None], (1, nz))
    ddx = st.ddx_f2c(jnp.asarray(u), dx, axis=-2)
    assert np.allclose(np.asarray(ddx)[:-1], 3.0)  # interior (wrap row differs)

    zf = np.arange(nz + 1) * dz
    w = np.tile(2.0 * zf[None, :], (nx, 1))
    ddz = st.ddz_f2c(jnp.asarray(w), dz)
    np.testing.assert_allclose(np.asarray(ddz), 2.0, rtol=1e-12)


def test_d2z_value_bc_linear_profile_zero():
    """A linear profile hitting the BC values exactly has zero Laplacian."""
    nz, dz = 10, 0.2
    z_c = (np.arange(nz) + 0.5) * dz
    lz = nz * dz
    bottom, top = 2.0, 1.0
    q = bottom + (top - bottom) * z_c / lz
    out = st.d2z_center_value_bc(jnp.asarray(q)[None, :], dz, bottom, top)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-10)


def test_fused_z_recon_matches_matrices():
    """Slice-based z reconstruction == matrix path wherever the advecting
    velocity can be nonzero (interior faces / all centers)."""
    rng = np.random.default_rng(5)
    nz = 16
    q = jnp.asarray(rng.normal(size=(3, 8, nz)))
    vel = jnp.asarray(rng.normal(size=(3, 8, nz + 1)))
    left, right = st.z_recon_matrices_c2f(nz)
    want = jnp.where(
        vel > 0,
        st.apply_z_matrix(jnp.asarray(left), q),
        st.apply_z_matrix(jnp.asarray(right), q),
    )
    got = st.recon_c2f_z_fused(q, vel)
    np.testing.assert_allclose(
        np.asarray(got)[..., 1:-1], np.asarray(want)[..., 1:-1], rtol=1e-12
    )

    qf = jnp.asarray(rng.normal(size=(3, 8, nz + 1)))
    velc = jnp.asarray(rng.normal(size=(3, 8, nz)))
    left, right = st.z_recon_matrices_f2c(nz)
    want = jnp.where(
        velc > 0,
        st.apply_z_matrix(jnp.asarray(left), qf),
        st.apply_z_matrix(jnp.asarray(right), qf),
    )
    got = st.recon_f2c_z_fused(qf, velc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)
