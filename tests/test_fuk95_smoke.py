"""End-to-end smoke tests of the fuk95 step loop.

Mirrors the reference's integration-test strategy (meson `run fuk95`,
/root/reference/tests/fuk95/meson.build:1-24: pass = the model runs);
adds quantitative conservation and sanity checks the reference lacks."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.core.constants import onem
from blom_tpu.drivers import standalone


@pytest.fixture(scope='module')
def model():
    return standalone.build_fuk95()


def test_initial_state_sane(model):
    s = model.state
    g = model.grid
    ip = np.asarray(g.ip)
    # bottom pressure approx rho0*g*h0 over wet points
    pb = np.asarray(s.pb[0])
    assert np.all(pb[ip > 0] > 190. * onem)
    assert np.all(pb[ip > 0] < 210. * onem)
    assert np.all(pb[ip == 0] == 0.)
    # temperature in physical range
    t = np.asarray(s.temp[0])
    assert np.all(t[:, ip > 0] > -3.) and np.all(t[:, ip > 0] < 40.)
    # thicknesses non-negative, sum to pb
    dp = np.asarray(s.dp[0])
    assert dp.min() >= 0.
    np.testing.assert_allclose(dp.sum(0)[ip > 0], pb[ip > 0], rtol=1e-12)
    assert np.isfinite(np.asarray(s.pgfx)).all()


def test_step_runs_and_is_finite(model):
    s, clock = standalone.run(model, 4)
    for name in ('dp', 'temp', 'saln', 'u', 'v', 'pb', 'ub', 'vb'):
        arr = np.asarray(getattr(s, name))
        assert np.isfinite(arr).all(), f'{name} has non-finite values'
    assert clock.nstep == 4


@pytest.mark.slow
def test_mass_conservation_20_steps(model):
    g = model.grid
    ip = np.asarray(g.ip)
    scp2 = np.asarray(g.scp2)
    s0 = model.state
    mass0 = float((np.asarray(s0.dp[1]).sum(0) * scp2 * ip).sum())

    s, _ = standalone.run(model, 20)
    n = 1  # after even #steps, slot 1 holds the newest level
    mass = float((np.asarray(s.dp[n]).sum(0) * scp2 * ip).sum())
    assert abs(mass - mass0) / mass0 < 1e-7

    # salinity should stay near the uniform initial 35 (advection of a
    # uniform tracer must not create extrema; small deviations only from
    # the barotropic correction scaling)
    sal = np.asarray(s.saln[n])[:, ip > 0]
    assert abs(sal.mean() - 35.) < 1e-3
    assert sal.min() > 34.5 and sal.max() < 35.5

    # velocities stay bounded (jet adjustment, no blow-up)
    assert np.abs(np.asarray(s.u)).max() < 2.0
    assert np.abs(np.asarray(s.v)).max() < 2.0


@pytest.mark.slow
def test_jet_adjustment_generates_flow(model):
    # The unbalanced density front must generate along-channel flow (v)
    # within a few steps (geostrophic adjustment of the fuk95 front).
    s, _ = standalone.run(model, 10)
    v = np.asarray(s.v[1])
    assert np.abs(v).max() > 1e-3
