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


def test_entrain_energy_matches_exact_integral_oracle():
    """The entrainment PE/KE energetics (entrain_energy; the
    p_p_alpha-based dpe of mod_mxlayr.F90:877-916) match the
    transcription using the EXACT closed-form integrals
    (tests/oracles/mxlayr_oracle.py) — the production series is
    accurate to ~1e-9 relative at oceanic pressures."""
    import numpy as np
    import jax.numpy as jnp
    from blom_tpu.dynamics.mxlayr import entrain_energy
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.oracles import mxlayr_oracle as mo

    rng = np.random.default_rng(11)
    for _ in range(200):
        p_top = rng.uniform(0., 1e4)
        prk = p_top + rng.uniform(1e4, 2e6)
        pmxl = prk + rng.uniform(1e2, 5e5)
        tk, sk = rng.uniform(-1., 25.), rng.uniform(30., 37.)
        tm0, sm0 = rng.uniform(-1., 25.), rng.uniform(30., 37.)
        uk, vk, um, vm = rng.normal(0., .3, 4)
        dpe0, dke0 = rng.uniform(0., 1e-6, 2)
        delt1, rm5 = 360., .8
        got = entrain_energy(
            jnp.float64(p_top), jnp.float64(prk), jnp.float64(pmxl),
            jnp.float64(tk), jnp.float64(sk), jnp.float64(tm0),
            jnp.float64(sm0), jnp.float64(dpe0), jnp.float64(dke0),
            jnp.float64(uk), jnp.float64(vk), jnp.float64(um),
            jnp.float64(vm), delt1, rm5)
        want = mo.entrain_energy(p_top, prk, pmxl, tk, sk, tm0, sm0,
                                 dpe0, dke0, uk, vk, um, vm, delt1,
                                 rm5)
        for g, w, nm in zip(got, want, ('tmx', 'smx', 'dpe', 'dke')):
            # dpe uses the reference's truncated series for p_p_alpha,
            # which deviates from the exact log form by ~1e-7..1e-5
            # relative over multi-megapascal spans (the accuracy the
            # reference itself accepts, mod_eos.F90:455-462)
            rtol = 1e-5 if nm == 'dpe' else 1e-7
            assert np.isclose(float(g), w, rtol=rtol, atol=1e-12), \
                (nm, float(g), w)
