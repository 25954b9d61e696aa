"""Carbon-isotope (cisonew) tests: tracer-block layout, derived
atmospheric constants, 13C conservation through the process chain,
fractionation sign, and exact 14C decay of the full water column."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.bgc import chemistry as chem
from blom_tpu.bgc import ciso, processes, sinking
from blom_tpu.bgc.params import (NBGC, BgcParams, BgcTracers as T,
                                 make_tracer_index)


@pytest.fixture(scope='module')
def par():
    return BgcParams()


@pytest.fixture(scope='module')
def cp():
    return ciso.CisoParams()


@pytest.fixture(scope='module')
def ti():
    return make_tracer_index(use_ciso=True)


def test_ciso_index_layout(ti):
    """12 isotope slots right after the base block, in the reference
    assignment order (mo_param1_bgc.F90:334-346); further extensions
    follow the isotope block (:364-366)."""
    assert ti.ntotal == NBGC + 12
    assert ti.sco213 == NBGC and ti.calc14 == NBGC + 11
    assert ti.names[NBGC:] == ciso.CISO_NAMES
    both = make_tracer_index(use_ciso=True, use_cfc=True)
    assert both.cfc11 == NBGC + 12


def test_atm_derived_constants(cp):
    """The derived atmospheric 13C closes the delta-13C identity
    (mo_param_bgc.F90:637-646: d13C_atm back-computed from atm_c13
    must equal prei13) and c14fac is O(1e-12)."""
    d13 = ((cp.atm_c13 / (cp.atm_co2 - cp.atm_c13)) / cp.re1312
           - 1.) * 1000.
    np.testing.assert_allclose(d13, cp.prei13, rtol=1e-12)
    assert 1.0e-12 < cp.c14fac < 1.4e-12
    assert 0. < cp.c14dec(1.) < 1.
    # half-life: after c14_t_half days the factor accumulates to ~1/2
    lam = 1. - cp.c14dec(1.)
    np.testing.assert_allclose(lam * cp.c14_t_half, np.log(2.),
                               rtol=1e-9)


def _column(ti, kk=16, jj=3, ii=4, seed=1):
    rng = np.random.RandomState(seed)
    shp = (kk, jj, ii)
    oc = np.zeros((ti.ntotal,) + shp)
    oc[T.sco212] = 2.1e-3 + 2e-4 * rng.rand(*shp)
    oc[T.alkali] = 2.3e-3 + 2e-4 * rng.rand(*shp)
    oc[T.phosph] = 1.e-6 + 2.e-6 * rng.rand(*shp)
    oc[T.oxygen] = 1.e-4 + 2.e-4 * rng.rand(*shp)
    oc[T.gasnit] = 8.e-4
    oc[T.ano3] = 5.e-6 + 30.e-6 * rng.rand(*shp)
    oc[T.silica] = 10.e-6 + 80.e-6 * rng.rand(*shp)
    oc[T.doc] = 1.e-7 * rng.rand(*shp)
    oc[T.phy] = 1.e-8 + 1.e-7 * rng.rand(*shp)
    oc[T.zoo] = 1.e-8 + 1.e-7 * rng.rand(*shp)
    oc[T.det] = 1.e-8 + 1.e-7 * rng.rand(*shp)
    oc[T.calc] = 1.e-8 * rng.rand(*shp)
    oc[T.opal] = 1.e-8 * rng.rand(*shp)
    oc[T.iron] = 0.6e-9
    oc[T.hi] = 1.e-8
    dz = 10. + 40. * rng.rand(*shp)
    temp = 2. + 20. * rng.rand(*shp)
    saln = 34. + rng.rand(*shp)
    return jnp.asarray(oc), jnp.asarray(dz), jnp.asarray(temp), \
        jnp.asarray(saln)


def _c13(oc, dz, par, ti):
    org = oc[ti.doc13] + oc[ti.phy13] + oc[ti.zoo13] + oc[ti.det13]
    return float(((oc[ti.sco213] + oc[ti.calc13] + par.rcar * org)
                  * dz).sum())


def test_ocprod_ciso_conserves_13c(par, cp, ti):
    """The isotope replay of the ocprod fluxes moves 13C between DIC,
    organic pools and shells without creating or destroying any."""
    oc, dz, temp, saln = _column(ti)
    oc = ciso.init_ciso_tracers(oc, ti, cp, par)
    lyr = jnp.ones(dz.shape, bool)
    satoxy = chem.sat_oxygen(temp, saln)
    strahl = jnp.full(dz.shape[1:], 100.)
    dtb = jnp.asarray(0.5)

    c13_0 = _c13(oc, dz, par, ti)
    keq = chem.kequi(temp, saln, jnp.zeros_like(temp))
    co2star = ciso.co2star_from_hi(oc, jnp.ones_like(temp), keq)
    oc2, diags, flx = processes.ocprod(oc, temp, dz, strahl, satoxy,
                                       lyr, dtb, par,
                                       return_fluxes=True)
    oc_iso = ciso.ocprod_ciso(oc, ti, flx, co2star, lyr, dtb, par, cp)
    rows = jnp.array([getattr(ti, nm) for nm in ciso.CISO_NAMES])
    oc2 = oc2.at[rows].set(oc_iso[rows])

    c13_1 = _c13(oc2, dz, par, ti)
    np.testing.assert_allclose(c13_1, c13_0, rtol=1e-11)
    assert np.isfinite(np.asarray(oc2)).all()


def test_photosynthesis_fractionates_light(par, cp, ti):
    """Biology prefers 12C: freshly produced organic matter is
    isotopically lighter than the source DIC (bifr13 < 1,
    mo_ocprod.F90:413-421), so the 13C/12C ratio of the production
    flux into phytoplankton is below the DIC ratio."""
    oc, dz, temp, saln = _column(ti)
    oc = ciso.init_ciso_tracers(oc, ti, cp, par)
    lyr = jnp.ones(dz.shape, bool)
    satoxy = chem.sat_oxygen(temp, saln)
    strahl = jnp.full(dz.shape[1:], 200.)
    dtb = jnp.asarray(0.5)
    keq = chem.kequi(temp, saln, jnp.zeros_like(temp))
    co2star = ciso.co2star_from_hi(oc, jnp.ones_like(temp), keq)

    oc2, diags, flx = processes.ocprod(oc, temp, dz, strahl, satoxy,
                                       lyr, dtb, par,
                                       return_fluxes=True)
    oc_iso = ciso.ocprod_ciso(oc, ti, flx, co2star, lyr, dtb, par, cp)

    rdic = np.asarray(oc[ti.sco213] / oc[T.sco212])
    dphy13 = np.asarray(oc_iso[ti.phy13] - oc[ti.phy13])
    dphy = np.asarray(oc2[T.phy] - oc[T.phy])
    grow = dphy > 1e-12
    assert grow.any()
    # flux ratio strictly below the DIC ratio where there is growth
    assert (dphy13[grow] < rdic[grow] * dphy[grow] * (1. - 1e-4)).all()


def test_full_step_13c_conserved_14c_decays(par, cp, ti):
    """Ice-covered full hamocc_step (no air-sea exchange): the 13C
    inventory is exactly conserved and the 14C inventory decays by
    exactly c14dec (mo_carchm.F90:667-675)."""
    from blom_tpu.bgc.step import (hamocc_step, init_bgc_tracers,
                                   zero_bgc_forcing)
    from blom_tpu.core.constants import onem
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=16, jtdm=8, kdm=10)
    z = jnp.zeros((2, ti.ntotal) + model.state.dp.shape[-3:],
                  model.state.dp.dtype)
    zo = jnp.zeros((ti.ntotal,) + model.state.dp.shape[-3:],
                   model.state.dp.dtype)
    s = dataclasses.replace(model.state, trc=z, trcold=zo)
    s = init_bgc_tracers(s, 0, model.e, n=0, ti=ti, cp=cp)
    f = zero_bgc_forcing(model.grid.shape)
    f = f._replace(fice=jnp.ones_like(f.fice))   # kw* = 0

    dtsec = 180.
    step = jax.jit(lambda s: hamocc_step(
        model.grid, model.e, par, s, f, 0, 0, 0, dtsec, ti=ti,
        cp=cp)[0])
    s1 = step(s)

    def inv(state, rows_sco, rows_calc, rows_org):
        t = np.asarray(state.trc[0])
        d = np.asarray(state.dp[0]) / onem
        org = sum(t[r] for r in rows_org)
        return float(((t[rows_sco] + t[rows_calc] + par.rcar * org)
                      * d).sum())

    c13_0 = inv(s, ti.sco213, ti.calc13,
                (ti.doc13, ti.phy13, ti.zoo13, ti.det13))
    c13_1 = inv(s1, ti.sco213, ti.calc13,
                (ti.doc13, ti.phy13, ti.zoo13, ti.det13))
    np.testing.assert_allclose(c13_1, c13_0, rtol=1e-9)

    c14_0 = inv(s, ti.sco214, ti.calc14,
                (ti.doc14, ti.phy14, ti.zoo14, ti.det14))
    c14_1 = inv(s1, ti.sco214, ti.calc14,
                (ti.doc14, ti.phy14, ti.zoo14, ti.det14))
    dec = cp.c14dec(dtsec / 86400.)
    np.testing.assert_allclose(c14_1, c14_0 * dec, rtol=1e-9)

    assert np.isfinite(np.asarray(s1.trc)).all()


def test_ciso_e2e_fuk95(par, cp, ti):
    """Full dynamics + BGC + carbon isotopes end-to-end: the isotope
    tracers ride the CPPM advection/ALE remap; everything stays finite
    and delta13C of DIC remains in a physical window."""
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=16, jtdm=8, kdm=10,
                                   use_bgc=True, use_ciso=True)
    s, clock = standalone.run(model, 4)
    trc = np.asarray(s.trc)
    assert np.isfinite(trc).all()
    dp = np.asarray(s.dp[0])
    wet = dp > 1e-6
    oc = jnp.asarray(trc[0])
    d13 = np.asarray(ciso.delta13c(oc, ti, cp))[wet]
    assert (d13 > -40.).all() and (d13 < 20.).all()


def test_delta_diagnostics(par, cp, ti):
    """delta13C of DIC initialized at the preindustrial atmospheric
    ratio reads back prei13; Delta14C at the normalized ratio 1 reads
    back ~0 permil."""
    oc, dz, temp, saln = _column(ti)
    oc = ciso.init_ciso_tracers(oc, ti, cp, par)
    d13 = np.asarray(ciso.delta13c(oc, ti, cp))
    np.testing.assert_allclose(d13, cp.prei13, atol=1e-6)
    d14 = np.asarray(ciso.delta14c(oc, ti, cp))
    # stored ratio 1 corresponds to the preindustrial atmosphere
    alpha14 = 2. * (cp.prei13 + 25.)
    d14cat = (cp.prei14 + alpha14) / (1. - alpha14 / 1000.)
    np.testing.assert_allclose(d14, d14cat, atol=1e-6)
