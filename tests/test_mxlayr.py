"""Bulk mixed layer (Oberhuber TKE balance) behavior tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core.constants import onem
from blom_tpu.drivers import standalone
from blom_tpu.dynamics import mxlayr as mx


@pytest.fixture(scope='module')
def model():
    return standalone.build_fuk95(vcoord='isopyc_bulkml',
                                  itdm=32, jtdm=12, kdm=10)


def _mld(model, s):
    ip = np.asarray(model.grid.ip) > 0
    dp1 = np.asarray(s.dp[1])
    return (dp1[0] + dp1[1])[ip] / onem


def _forced(model, taux=0., surflx=0., sswflx=0.):
    f = model.forcing
    H = model.grid.shape
    return dataclasses.replace(
        f, taux=jnp.full(H, taux) * model.grid.iu,
        surflx=jnp.full(H, surflx) * model.grid.ip,
        sswflx=jnp.full(H, sswflx) * model.grid.ip)


def _run(model, forcing, nsteps=2):
    s = model.state
    par = model.par.mxlayr
    for i in range(nsteps):
        n = 1
        s = mx.mxlayr(model.grid, model.e, s, forcing, par, 0, n,
                      jnp.asarray(2. * model.par.baclin, s.dp.dtype),
                      swabs=model.swabs)
    return s


def test_wind_stirring_deepens_ml(model):
    s0 = _run(model, _forced(model, taux=0.))
    s1 = _run(model, _forced(model, taux=1.0))
    assert _mld(model, s1).mean() > _mld(model, s0).mean()


def test_cooling_deepens_warming_shoals(model):
    # surflx > 0 = heat OUT of the ocean (cooling, destabilizing:
    # bfltot = g*alpha0*alfa*surflx/spcifh > 0, mod_mxlayr.F90:341-346)
    s_cool = _run(model, _forced(model, surflx=400.))
    s_warm = _run(model, _forced(model, surflx=-400.))
    assert _mld(model, s_cool).mean() != pytest.approx(
        _mld(model, s_warm).mean(), rel=1e-6)
    assert _mld(model, s_cool).mean() >= _mld(model, s_warm).mean()


def test_ml_bounded_and_conservative(model):
    f = _forced(model, taux=.3, surflx=100., sswflx=80.)
    s0 = model.state
    s1 = _run(model, f, nsteps=3)
    g = model.grid
    ip = np.asarray(g.ip)
    # mass conservation (mxlayr redistributes, total column unchanged)
    m0 = (np.asarray(s0.dp[1]).sum(0) * np.asarray(g.scp2) * ip).sum()
    m1 = (np.asarray(s1.dp[1]).sum(0) * np.asarray(g.scp2) * ip).sum()
    assert abs(m1 - m0) / m0 < 1e-12
    ml = _mld(model, s1)
    assert ml.min() >= mx.mltmin * .9
    assert np.isfinite(np.asarray(s1.temp)).all()
    assert np.isfinite(np.asarray(s1.saln)).all()
    # skin layer is capped at thktop
    dp0 = np.asarray(s1.dp[1][0])[ip > 0] / onem
    assert dp0.max() <= mx.thktop + 1e-6


def test_penetrating_shortwave_warms_subsurface(model):
    """With purely penetrating shortwave heating, layers below the skin
    must warm (the reference's swfc2/swal2 profile application,
    mod_mxlayr.F90:1162-1196)."""
    f = _forced(model, sswflx=200.)
    s0 = model.state
    s1 = _run(model, f, nsteps=2)
    ip = np.asarray(model.grid.ip) > 0
    warm2 = (np.asarray(s1.temp[1][1]) - np.asarray(s0.temp[1][1]))[ip]
    assert warm2.mean() > 0.
