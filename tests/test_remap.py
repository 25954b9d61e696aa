"""Incremental-remapping advection tests: moment primitives, exact
conservation, uniform-field preservation, monotonicity, solid-body
translation, and E2E fuk95 with advmth='remap'."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.dynamics import remap as rm


# ----------------------------------------------------------------- #
# polygon moments
# ----------------------------------------------------------------- #

def test_triint_unit_triangle():
    """Area and first moments of the right triangle (0,0),(1,0),(0,1)
    against analytic values."""
    a, ax, ay, axx, ayy, axy = [float(v) for v in
                                rm.triint(1., 0., 0., 1., 0., 0., 1.)]
    assert a == pytest.approx(.5)
    # int x dA over that triangle = 1/6; moments returned include area
    assert ax == pytest.approx(1. / 6.)
    assert ay == pytest.approx(1. / 6.)
    assert axx == pytest.approx(1. / 12.)   # int x^2 = 1/12
    assert ayy == pytest.approx(1. / 12.)
    assert axy == pytest.approx(1. / 24.)   # int xy = 1/24


def test_triint_orientation_sign():
    """Clockwise vertex order flips the signed area."""
    a1 = float(rm.triint(1., 0., 0., 1., 0., 0., 1.)[0])
    a2 = float(rm.triint(1., 0., 0., 0., 1., 1., 0.)[0])
    assert a1 == pytest.approx(-a2)


def test_penint_square():
    """A unit square split as a degenerate pentagon integrates to the
    square's moments: area 1, centroid moments 0 about the centre."""
    # vertices (counterclockwise): corners of [-.5,.5]^2 with one
    # midpoint vertex
    a, ax, ay, axx, ayy, axy = [float(v) for v in rm.penint(
        1., -.5, -.5, .5, -.5, .5, 0., .5, .5, -.5, .5)]
    assert a == pytest.approx(1.)
    assert ax == pytest.approx(0., abs=1e-14)
    assert ay == pytest.approx(0., abs=1e-14)
    assert axx == pytest.approx(1. / 12.)
    assert ayy == pytest.approx(1. / 12.)


# ----------------------------------------------------------------- #
# single-layer remap properties
# ----------------------------------------------------------------- #

@pytest.fixture(scope='module')
def chan():
    """Small all-wet periodic channel grid."""
    from blom_tpu.drivers import standalone
    model = standalone.build_fuk95(itdm=32, jtdm=12, kdm=4)
    return model


def _layer_setup(chan, seed=1):
    grid = chan.grid
    rng = np.random.RandomState(seed)
    H = grid.shape
    dp = jnp.asarray(50. * 9806. * (1. + .2 * rng.rand(*H)))
    dp = dp * grid.ip
    tr = jnp.stack([jnp.asarray(10. + rng.rand(*H)),
                    jnp.asarray(35. + .5 * rng.rand(*H))]) * grid.ip
    pbot = dp * 3.
    plo = dp * 1.5
    pbu = jnp.minimum(pbot, grid.im1(pbot))
    pbv = jnp.minimum(pbot, grid.jm1(pbot))
    pbmin = pbot
    return grid, dp, tr, pbmin, pbu, pbv, plo


def test_remap_zero_velocity_identity(chan):
    grid, dp, tr, pbmin, pbu, pbv, plo = _layer_setup(chan)
    z = jnp.zeros_like(dp)
    dp2, tr2, fdu, fdv, ftru, ftrv = rm.remap_layer(
        grid, pbmin, pbu, pbv, plo, z, z, dp, tr)
    np.testing.assert_allclose(np.asarray(dp2), np.asarray(dp),
                               atol=1e-9)
    wet = np.asarray(grid.ip) > 0
    np.testing.assert_allclose(np.asarray(tr2)[:, wet],
                               np.asarray(tr)[:, wet], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fdu), 0., atol=1e-20)


def test_remap_conserves_mass_and_tracer(chan):
    grid, dp, tr, pbmin, pbu, pbv, plo = _layer_setup(chan)
    rng = np.random.RandomState(3)
    H = grid.shape
    # smooth random flux areas, CFL-safe
    # amplitudes sized for the 650 m fuk95 spacing: displacement must
    # stay well inside one cell for the remap geometry to be exact
    cau = jnp.asarray(.04 * np.cos(np.linspace(0, 2 * np.pi, H[1]))
                      [None, :] * np.ones(H)) * grid.scuy * 9806.
    cav = jnp.asarray(.0075 * rng.randn(*H)) * grid.scvx * 9806.
    cau = cau * grid.iu
    cav = cav * grid.iv
    dp2, tr2, fdu, fdv, ftru, ftrv = rm.remap_layer(
        grid, pbmin, pbu, pbv, plo, cau, cav, dp, tr)
    a = np.asarray(grid.scp2)
    m0 = float((np.asarray(dp) * a).sum())
    m1 = float((np.asarray(dp2) * a).sum())
    assert abs(m1 - m0) / m0 < 1e-12
    t0 = float((np.asarray(dp) * np.asarray(tr[0]) * a).sum())
    t1 = float((np.asarray(dp2 + rm.DPEPS * 0) * np.asarray(tr2[0])
                * a).sum())
    # tracer mass conserved up to the dpeps bookkeeping
    assert abs(t1 - t0) / abs(t0) < 1e-9


def test_remap_uniform_tracer_preserved(chan):
    """Compatibility: a uniform tracer must stay exactly uniform under
    any flow (the defining property of incremental remapping)."""
    grid, dp, tr, pbmin, pbu, pbv, plo = _layer_setup(chan)
    tr = tr.at[0].set(7.5 * grid.ip)
    rng = np.random.RandomState(4)
    H = grid.shape
    cau = jnp.asarray(.1 * rng.randn(*H)) * grid.scuy * 9806. * grid.iu
    cav = jnp.asarray(.1 * rng.randn(*H)) * grid.scvx * 9806. * grid.iv
    dp2, tr2, *_ = rm.remap_layer(grid, pbmin, pbu, pbv, plo, cau, cav,
                                  dp, tr)
    wet = np.asarray(grid.ip) > 0
    np.testing.assert_allclose(np.asarray(tr2[0])[wet], 7.5, rtol=5e-9)


def test_remap_monotone(chan):
    """No new tracer extrema under non-divergent translation (the
    limited-reconstruction property; under strongly divergent flow the
    thin-layer division relaxes strict monotonicity, as in the
    reference)."""
    grid, dp, tr, pbmin, pbu, pbv, plo = _layer_setup(chan)
    H = grid.shape
    dp = jnp.full(H, 50. * 9806.) * grid.ip
    cau = .35 * grid.scp2 * grid.iu
    cav = .25 * grid.scp2 * grid.iv
    dp2, tr2, *_ = rm.remap_layer(grid, pbmin, pbu, pbv, plo, cau, cav,
                                  dp, tr)
    wet = np.asarray(grid.ip) > 0
    t_old = np.asarray(tr[0])[wet]
    t_new = np.asarray(tr2[0])[wet]
    assert t_new.max() <= t_old.max() + 1e-7
    assert t_new.min() >= t_old.min() - 1e-7


def test_remap_translates_anomaly_east(chan):
    """Uniform eastward flow moves a tracer blob east."""
    grid, dp, tr, pbmin, pbu, pbv, plo = _layer_setup(chan)
    H = grid.shape
    x = np.zeros(H)
    x[:, 8] = 1.
    tr = tr.at[0].set(jnp.asarray(10. + x) * grid.ip)
    dp = jnp.full(H, 50. * 9806.) * grid.ip
    # non-dimensional velocity 0.3 cells/step => flux area .3*scp2
    cau = .3 * grid.scp2 * grid.iu
    cav = jnp.zeros(H)
    dp2, tr2, *_ = rm.remap_layer(grid, pbmin, pbu, pbv, plo, cau, cav,
                                  dp, tr)
    wet = np.asarray(grid.ip) > 0
    t2 = np.asarray(tr2[0])
    j = 6
    com_old = 8.
    w = np.asarray(tr[0])[j] - 10.
    w2 = t2[j] - 10.
    w2 = np.maximum(w2, 0.)
    com_new = (w2 * np.arange(H[1])).sum() / max(w2.sum(), 1e-12)
    assert com_new > com_old + .05


# ----------------------------------------------------------------- #
# E2E
# ----------------------------------------------------------------- #

def test_fuk95_remap_e2e():
    """fuk95 with advmth='remap' runs stably with exact mass
    conservation and bounded salinity."""
    from blom_tpu.drivers import standalone
    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=12)
    model.par = model.par._replace(advmth='remap')
    grid = model.grid
    m0 = float((np.asarray(model.state.dp[1]).sum(0) * grid.scp2
                * grid.ip).sum())
    s, clock = standalone.run(model, 6)
    for name in ('dp', 'temp', 'saln', 'u', 'v', 'pb'):
        assert np.isfinite(np.asarray(getattr(s, name))).all(), name
    m1 = float((np.asarray(s.dp[1]).sum(0) * grid.scp2
                * grid.ip).sum())
    assert abs(m1 - m0) / m0 < 1e-12
    wet = np.asarray(grid.ip) > 0
    sal = np.asarray(s.saln[1])[:, wet]
    np.testing.assert_allclose(sal, 35., atol=1e-7)
