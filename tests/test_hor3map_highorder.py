"""hor3map high-order options: ih4/ih6 implicit edges, ih5 slopes, PQM
(mod_hor3map.F90:577-1039,1707-1870,2119-2337)."""

import numpy as np
import jax.numpy as jnp

from blom_tpu.ops import hor3map as h3


def _cell_means(poly, p):
    """Exact cell means of a polynomial (coeff list, ascending) on
    interfaces p."""
    P = np.polynomial.Polynomial(poly)
    Pi = P.integ()
    return np.asarray([(Pi(p[k + 1]) - Pi(p[k])) / (p[k + 1] - p[k])
                       for k in range(len(p) - 1)])


def test_ih4_exact_for_cubics():
    """The ih4 tridiagonal edge scheme reproduces cubic profiles
    exactly on a nonuniform grid (4th-order accuracy)."""
    rng = np.random.default_rng(0)
    p = np.concatenate([[0.], np.cumsum(rng.uniform(.5, 2., 12))])
    poly = [1.3, -2.0, 0.7, 0.35]
    tm = _cell_means(poly, p)
    e = h3.edges_ih4(jnp.asarray(p)[:, None], jnp.asarray(tm)[:, None])
    exact = np.polynomial.Polynomial(poly)(p)
    np.testing.assert_allclose(np.asarray(e)[:, 0], exact, rtol=1e-9,
                               atol=1e-9)


def test_ih6_exact_for_quintics():
    """The ih6 scheme reproduces quintic profiles exactly; ih5 slopes
    reproduce the exact derivative (interior edges)."""
    rng = np.random.default_rng(1)
    p = np.concatenate([[0.], np.cumsum(rng.uniform(.8, 1.2, 14))])
    poly = [0.4, 1.1, -0.3, 0.08, -0.01, 0.002]
    tm = _cell_means(poly, p)
    e, s = h3.edges_slopes_ih6(jnp.asarray(p)[:, None],
                               jnp.asarray(tm)[:, None],
                               lb_ord=6, rb_ord=6)
    P = np.polynomial.Polynomial(poly)
    dP = P.deriv()
    kk = len(tm)
    # interior edges where the full ih6 stencil is in play
    sl = slice(2, kk - 1)
    np.testing.assert_allclose(np.asarray(e)[sl, 0], P(p)[sl],
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s)[sl, 0], dP(p)[sl],
                               rtol=1e-6, atol=1e-6)


def test_pqm_mean_preservation():
    """The PQM quartic integrates back to the cell means exactly."""
    rng = np.random.default_rng(2)
    kk = 10
    p = np.concatenate([[0.], np.cumsum(rng.uniform(.5, 2., kk))])
    tm = rng.uniform(1., 3., kk)
    rc = h3.pqm_reconstruct(jnp.asarray(p)[:, None],
                            jnp.asarray(tm)[:, None])
    mean = (np.asarray(rc.c0) + np.asarray(rc.c1) / 2.
            + np.asarray(rc.c2) / 3. + np.asarray(rc.c3) / 4.
            + np.asarray(rc.c4) / 5.)
    np.testing.assert_allclose(mean[:, 0], tm, rtol=1e-10)


def test_pqm_remap_conserves():
    """Remapping a PQM reconstruction to a different grid conserves the
    column integral."""
    rng = np.random.default_rng(3)
    kk = 12
    p_src = np.concatenate([[0.], np.cumsum(rng.uniform(.5, 2., kk))])
    tm = rng.uniform(1., 3., kk)
    rc = h3.pqm_reconstruct(jnp.asarray(p_src)[:, None],
                            jnp.asarray(tm)[:, None])
    p_dst = np.linspace(0., p_src[-1], 9)
    means = h3.remap_means(rc, jnp.asarray(p_dst)[:, None])
    tot_src = np.sum(tm * np.diff(p_src))
    tot_dst = float(np.sum(np.asarray(means)[:, 0] * np.diff(p_dst)))
    np.testing.assert_allclose(tot_dst, tot_src, rtol=1e-12)


def test_pqm_monotonic_no_overshoot():
    """Monotonic PQM of a monotonic step profile stays within data
    bounds everywhere in every cell."""
    kk = 12
    p = np.arange(kk + 1, dtype=float)
    tm = np.where(np.arange(kk) < kk // 2, 1.0, 3.0).astype(float)
    rc = h3.pqm_reconstruct(jnp.asarray(p)[:, None],
                            jnp.asarray(tm)[:, None],
                            limiting=h3.MONOTONIC)
    xi = np.linspace(0., 1., 33)
    vals = (np.asarray(rc.c0)[:, 0, None]
            + np.asarray(rc.c1)[:, 0, None] * xi
            + np.asarray(rc.c2)[:, 0, None] * xi ** 2
            + np.asarray(rc.c3)[:, 0, None] * xi ** 3
            + np.asarray(rc.c4)[:, 0, None] * xi ** 4)
    assert vals.min() >= 1.0 - 1e-9
    assert vals.max() <= 3.0 + 1e-9


def test_ppm_ih4_reconstruct_smooth():
    """ih4-PPM beats the explicit-edge PPM on a smooth profile."""
    kk = 24
    p = np.linspace(0., 2 * np.pi, kk + 1)
    tm = _cell_means([0., 1.], p) * 0.
    f = lambda x: np.sin(x)
    Fi = lambda x: -np.cos(x)
    tm = np.diff(Fi(p)) / np.diff(p)
    rc = h3.ppm_ih4_reconstruct(jnp.asarray(p)[:, None],
                                jnp.asarray(tm)[:, None],
                                limiting='none')
    edges = np.asarray(rc.c0)[:, 0]
    err = np.abs(edges[2:-2] - f(p[:-1])[2:-2]).max()
    assert err < 2e-4
