"""Neutral diffusion (ltedtp='neutral') properties.

Mirrors the physical contracts of the reference mod_ndiff.F90: exact
tracer conservation, uniform-tracer preservation, and — the defining
property — mixing along neutrally matched positions rather than along
model layers."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from blom_tpu.drivers import standalone
from blom_tpu.dynamics.diffus import diffus
from blom_tpu.dynamics.ndiff import ndiff
from blom_tpu.core.constants import onem
from blom_tpu.core.state import cumulative_p


@pytest.fixture(scope='module')
def model():
    m = standalone.build_fuk95(itdm=32, jtdm=12, kdm=8, use_idlage=True)
    # nonzero isopycnal diffusivity so the operator actually acts
    m.dfl = dataclasses.replace(
        m.dfl, difiso=jnp.ones_like(m.dfl.difiso) * 500.0)
    return m


def _tracer_mass(grid, c, dp):
    return float(np.sum(np.asarray(c) * np.asarray(dp)
                        * np.asarray(grid.scp2) * np.asarray(grid.ip)))


def test_ndiff_conserves_and_preserves_uniform(model):
    m = model
    n, mm = 1, 0
    s0 = m.state
    mld_p = jnp.full(m.grid.shape, 50.0) * onem
    s1 = ndiff(m.grid, m.e, s0, m.dfl, mm, n, 2 * m.par.baclin, mld_p)

    dp = s0.dp[n]
    for name in ('temp', 'saln'):
        b = _tracer_mass(m.grid, getattr(s0, name)[n], dp)
        a = _tracer_mass(m.grid, getattr(s1, name)[n], dp)
        np.testing.assert_allclose(a, b, rtol=1e-12)
    assert np.isfinite(np.asarray(s1.temp)).all()
    assert np.isfinite(np.asarray(s1.saln)).all()

    # uniform salinity (fuk95: 35 everywhere) must be untouched
    ipm = np.asarray(m.grid.ip) > 0
    sal = np.asarray(s1.saln[n])[:, ipm]
    np.testing.assert_allclose(sal, 35.0, atol=1e-10)

    # uniform passive tracer preserved exactly
    s0u = dataclasses.replace(s0, trc=jnp.ones_like(s0.trc))
    s1u = ndiff(m.grid, m.e, s0u, m.dfl, mm, n, 2 * m.par.baclin, mld_p)
    tr = np.asarray(s1u.trc[n, 0])[:, ipm]
    np.testing.assert_allclose(tr, 1.0, atol=1e-10)


def test_ndiff_mixes_along_neutral_not_layers(model):
    """Tracer painted as a function of density: neutral diffusion must
    leave it (nearly) invariant where isopycnals tilt across layers,
    while along-layer diffusion visibly erodes it."""
    m = model
    n, mm = 1, 0
    s0 = m.state
    # fuk95's front tilts isopycnals strongly across the channel; a
    # tracer equal to the local temperature is density-locked (S
    # uniform), so neutral mixing of it mirrors neutral mixing of T
    trc = jnp.broadcast_to(s0.temp[n][None, None],
                           (2, s0.trc.shape[1]) + s0.temp[n].shape)
    s0 = dataclasses.replace(s0, trc=jnp.asarray(trc))
    mld_p = jnp.full(m.grid.shape, 10.0) * onem  # tiny ML: pure neutral
    delt1 = 2 * m.par.baclin

    s_n = ndiff(m.grid, m.e, s0, m.dfl, mm, n, delt1, mld_p)
    s_l, _ = diffus(m.grid, m.e, s0, m.dfl, mm, n, delt1)

    # compare away from the clamped ends of the matching (surface
    # pressure-aligned region, unmatched bottom) on layers with mass
    ipm = np.asarray(m.grid.ip) > 0
    dpm = np.asarray(s0.dp[n]) > 1.0
    sel = (dpm & ipm[None])[2:-2]
    d_neutral = np.abs(np.asarray(s_n.temp[n] - s0.temp[n]))[2:-2][sel]
    d_layer = np.abs(np.asarray(s_l.temp[n] - s0.temp[n]))[2:-2][sel]
    # along-neutral change should be far below along-layer change
    assert d_neutral.mean() < 0.3 * d_layer.mean(), \
        (d_neutral.mean(), d_layer.mean())


def test_ndiff_step_integration(model):
    """Full step loop with ltedtp='neutral' stays finite and conserves
    mass."""
    m = standalone.build_fuk95(itdm=32, jtdm=12, kdm=8)
    m.par = m.par._replace(
        ltedtp='neutral',
        difest=m.par.difest._replace(egmndf=100.0, egmxdf=1500.0))
    s, _ = standalone.run(m, 6)
    assert np.isfinite(np.asarray(s.dp)).all()
    assert np.isfinite(np.asarray(s.temp)).all()
    g = m.grid
    mass0 = float((np.asarray(m.state.dp[1]).sum(0)
                   * np.asarray(g.scp2) * np.asarray(g.ip)).sum())
    mass1 = float((np.asarray(s.dp[1]).sum(0)
                   * np.asarray(g.scp2) * np.asarray(g.ip)).sum())
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)
