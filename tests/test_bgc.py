"""iHAMOCC-equivalent BGC tests: carbonate solver, conservation of
P/Si/C inventories through the process chain, sinking conservation,
and a multi-step column integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.bgc import chemistry as chem
from blom_tpu.bgc import processes, sinking
from blom_tpu.bgc.params import NBGC, BgcParams, BgcTracers as T


@pytest.fixture(scope='module')
def par():
    return BgcParams()


def _column(kk=20, jj=4, ii=6, seed=0):
    """Random but oceanographically plausible concentration block."""
    rng = np.random.RandomState(seed)
    shp = (kk, jj, ii)
    oc = np.zeros((NBGC,) + shp)
    oc[T.sco212] = 2.1e-3 + 2e-4 * rng.rand(*shp)
    oc[T.alkali] = 2.3e-3 + 2e-4 * rng.rand(*shp)
    oc[T.phosph] = 1.e-6 + 2.e-6 * rng.rand(*shp)
    oc[T.oxygen] = 1.e-4 + 2.e-4 * rng.rand(*shp)
    oc[T.gasnit] = 8.e-4 * np.ones(shp)
    oc[T.ano3] = 5.e-6 + 30.e-6 * rng.rand(*shp)
    oc[T.silica] = 10.e-6 + 80.e-6 * rng.rand(*shp)
    oc[T.doc] = 1.e-7 * rng.rand(*shp)
    oc[T.phy] = 1.e-8 + 1.e-7 * rng.rand(*shp)
    oc[T.zoo] = 1.e-8 + 1.e-7 * rng.rand(*shp)
    oc[T.det] = 1.e-8 + 1.e-7 * rng.rand(*shp)
    oc[T.calc] = 1.e-8 * rng.rand(*shp)
    oc[T.opal] = 1.e-8 * rng.rand(*shp)
    oc[T.an2o] = 1.e-8 * rng.rand(*shp)
    oc[T.dms] = 1.e-9 * rng.rand(*shp)
    oc[T.iron] = 0.6e-9 * np.ones(shp)
    oc[T.fdust] = 1.e-9 * rng.rand(*shp)
    oc[T.hi] = 1.e-8
    dz = 10. + 40. * rng.rand(*shp)
    temp = 2. + 20. * rng.rand(*shp) * np.exp(-np.arange(kk) / 5.)[:, None, None]
    saln = 34. + rng.rand(*shp)
    return jnp.asarray(oc), jnp.asarray(dz), jnp.asarray(temp), jnp.asarray(saln)


# ----------------------------------------------------------------- #
# carbonate chemistry
# ----------------------------------------------------------------- #

def test_ph_solver_converges_to_alkalinity_balance(par):
    """At the solver's fixed point the carbonate + minor-system
    alkalinity must reproduce total alkalinity (carchm_solve,
    mo_carchm.F90:868-931)."""
    t = jnp.asarray([2., 10., 25.])
    s = jnp.asarray([33., 35., 36.])
    prb = jnp.asarray([0., 100., 400.])
    k = chem.kequi(t, s, prb)
    tc = jnp.asarray([2.15e-3, 2.05e-3, 1.95e-3])
    ta = jnp.asarray([2.30e-3, 2.32e-3, 2.28e-3])
    sit = jnp.full(3, 50.e-6)
    pt = jnp.full(3, 1.5e-6)
    ah, ac = chem.solve_h(s, tc, ta, sit, pt, k, jnp.full(3, 1.e-8))
    # carbonate alkalinity from [H+]: HCO3 + 2 CO3
    cu = (2. * tc - ac) / (2. + k.K1 / ah)
    cb = k.K1 * cu / ah
    cc = k.K2 * cb / ah
    np.testing.assert_allclose(np.asarray(cb + 2. * cc),
                               np.asarray(ac), rtol=1e-6)
    # total alkalinity closes
    ac2 = ta + chem._minor_alk(s, sit, pt, ah, k)
    np.testing.assert_allclose(np.asarray(ac2), np.asarray(ac), rtol=1e-5)


def test_surface_ph_in_ocean_range(par):
    """Modern-surface-ocean DIC/ALK must give pH ~8.0-8.2."""
    k = chem.kequi(jnp.asarray(18.), jnp.asarray(35.), jnp.asarray(0.))
    ah, _ = chem.solve_h(jnp.asarray(35.), jnp.asarray(2.0e-3),
                         jnp.asarray(2.3e-3), jnp.asarray(5.e-6),
                         jnp.asarray(5.e-7), k, jnp.asarray(1.e-8))
    ph = -np.log10(float(ah))
    assert 7.8 < ph < 8.4, ph


def test_oxygen_saturation_magnitude():
    """O2 saturation at 10C/35psu is ~280 umol/kg ~ 2.8e-4 kmol/m3."""
    sat = float(chem.sat_oxygen(jnp.asarray(10.), jnp.asarray(35.)))
    assert 2.3e-4 < sat < 3.4e-4, sat


# ----------------------------------------------------------------- #
# production / remineralization conservation
# ----------------------------------------------------------------- #

def _inventory(oc, dz, par):
    """Mass-weighted P, Si, C, O2-equivalent inventories."""
    w = dz
    P = ((oc[T.phosph] + oc[T.phy] + oc[T.zoo] + oc[T.doc] + oc[T.det])
         * w).sum()
    Si = ((oc[T.silica] + oc[T.opal]) * w).sum()
    C = ((oc[T.sco212] + oc[T.calc]
          + par.rcar * (oc[T.phy] + oc[T.zoo] + oc[T.doc] + oc[T.det]))
         * w).sum()
    return float(P), float(Si), float(C)


def test_ocprod_conserves_p_si_c(par):
    oc, dz, temp, saln = _column()
    lyr = jnp.ones(dz.shape, bool)
    satoxy = chem.sat_oxygen(temp, saln)
    strahl = jnp.full(dz.shape[1:], 100.)
    P0, Si0, C0 = _inventory(oc, dz, par)
    oc2, diags = processes.ocprod(oc, temp, dz, strahl, satoxy, lyr,
                                  jnp.asarray(0.5), par)
    P1, Si1, C1 = _inventory(oc2, dz, par)
    assert abs(P1 - P0) < 1e-12 * max(abs(P0), 1.)
    assert abs(Si1 - Si0) < 1e-12 * max(abs(Si0), 1.)
    assert abs(C1 - C0) < 1e-10 * max(abs(C0), 1.)
    assert float(diags['intphosy'].min()) >= 0.


def test_ocprod_produces_in_light_only(par):
    """Production requires light: zero surface irradiance => zero
    primary production."""
    oc, dz, temp, saln = _column()
    lyr = jnp.ones(dz.shape, bool)
    satoxy = chem.sat_oxygen(temp, saln)
    oc2, diags = processes.ocprod(oc, temp, dz,
                                  jnp.zeros(dz.shape[1:]), satoxy, lyr,
                                  jnp.asarray(0.5), par)
    np.testing.assert_allclose(np.asarray(diags['intphosy']), 0.)


def test_cyano_fixes_nitrogen_toward_redfield(par):
    oc, dz, temp, saln = _column()
    oc = oc.at[T.ano3].set(1.e-6)          # strongly N-limited
    euph = jnp.ones(dz.shape, bool)
    oc2, intnfix = processes.cyano(oc, temp, dz, euph,
                                   jnp.asarray(1.0), par)
    assert float(intnfix.sum()) > 0.
    # N2 consumed: dgasnit = -dansp/2
    dn = np.asarray(oc2[T.ano3] - oc[T.ano3])
    dg = np.asarray(oc2[T.gasnit] - oc[T.gasnit])
    np.testing.assert_allclose(dg, -0.5 * dn, rtol=1e-10)


# ----------------------------------------------------------------- #
# sinking
# ----------------------------------------------------------------- #

def test_sinking_conserves_with_sedbypass(par):
    oc, dz, temp, saln = _column()
    ptiestw = jnp.concatenate([jnp.zeros_like(dz[:1]),
                               jnp.cumsum(dz, axis=0)], 0)
    ptiestu = ptiestw[:-1] + 0.5 * dz
    omask = jnp.ones(dz.shape[1:])
    inv0 = {i: float((oc[i] * dz).sum()) for i in sinking.SINKERS}
    si0 = float(((oc[T.silica] + oc[T.opal]) * dz).sum())
    c0 = float(((oc[T.sco212] + oc[T.calc]) * dz).sum())
    oc2, flx = sinking.sinking(oc, dz, ptiestu, omask,
                               jnp.asarray(0.5), par)
    # det redistributed, opal/calc partially dissolved to silica/DIC:
    det1 = float((oc2[T.det] * dz).sum())
    assert abs(det1 - inv0[T.det]) < 1e-9 * max(inv0[T.det], 1e-30)
    si1 = float(((oc2[T.silica] + oc2[T.opal]) * dz).sum())
    assert abs(si1 - si0) < 1e-9 * max(si0, 1e-30)
    c1 = float(((oc2[T.sco212] + oc2[T.calc]) * dz).sum())
    assert abs(c1 - c0) < 1e-9 * max(c0, 1e-30)


def test_sinking_moves_mass_downward(par):
    """A surface detritus anomaly must move its centre of mass down."""
    oc, dz, temp, saln = _column()
    oc = oc.at[T.det].set(0.).at[T.det, 0].set(1.e-6)
    par2 = par._replace(sedbypass=False)
    ptiestw = jnp.concatenate([jnp.zeros_like(dz[:1]),
                               jnp.cumsum(dz, axis=0)], 0)
    ptiestu = ptiestw[:-1] + 0.5 * dz
    omask = jnp.ones(dz.shape[1:])
    z0 = float((oc[T.det] * dz * ptiestu).sum()
               / (oc[T.det] * dz).sum())
    oc2, flx = sinking.sinking(oc, dz, ptiestu, omask,
                               jnp.asarray(1.0), par2)
    z1 = float((oc2[T.det] * dz * ptiestu).sum()
               / jnp.maximum((oc2[T.det] * dz).sum(), 1e-30))
    assert z1 > z0


# ----------------------------------------------------------------- #
# full step in the model
# ----------------------------------------------------------------- #

@pytest.mark.slow
def test_hamocc_step_in_model(par):
    """Wire the BGC into the fuk95 model and run steps: inventories of
    P stay conserved up to air-sea-free processes, all fields finite,
    oxygen/DIC in plausible ranges."""
    from blom_tpu.bgc.step import (BgcForcing, hamocc_step,
                                   init_bgc_tracers, zero_bgc_forcing)
    from blom_tpu.core.constants import onem
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=12)
    s = init_bgc_tracers(
        _with_bgc_tracers(model), 0, model.e, n=0)
    f = zero_bgc_forcing(model.grid.shape)

    step = jax.jit(lambda s: hamocc_step(
        model.grid, model.e, par, s, f, 0, 0, 0, 180.)[0])
    s1 = step(s)
    for _ in range(5):
        s1 = step(s1)

    trc = np.asarray(s1.trc[0])
    assert np.isfinite(trc).all()
    dp = np.asarray(s1.dp[0])
    wet = dp > 1e-6
    # oxygen plausible
    oxy = trc[T.oxygen][wet]
    assert (oxy > 0.).all() and (oxy < 5e-4).all()
    # phosphorus conservation under zero air-sea P flux: weight by dp
    def pinv(state):
        t = np.asarray(state.trc[0])
        d = np.asarray(state.dp[0])
        tot = (t[T.phosph] + t[T.phy] + t[T.zoo] + t[T.doc] + t[T.det])
        return float((tot * d / onem).sum())
    np.testing.assert_allclose(pinv(s1), pinv(s), rtol=1e-9)


def _with_bgc_tracers(model):
    """Rebuild model state with NBGC tracer slots."""
    import dataclasses
    z = jnp.zeros((2, NBGC) + model.state.dp.shape[-3:],
                  model.state.dp.dtype)
    zo = jnp.zeros((NBGC,) + model.state.dp.shape[-3:],
                   model.state.dp.dtype)
    return dataclasses.replace(model.state, trc=z, trcold=zo)


@pytest.mark.slow
def test_bgc_e2e_fuk95(par):
    """Full dynamics + BGC end-to-end: the BGC tracer block rides the
    CPPM advection and ALE remap; inventories stay finite and total
    phosphorus is conserved through the coupled step (no P air-sea
    flux, zero-P rivers)."""
    from blom_tpu.core.constants import onem
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=12,
                                   use_bgc=True)

    def pinv(state, lev):
        t = np.asarray(state.trc[lev])
        d = np.asarray(state.dp[lev])
        tot = (t[T.phosph] + t[T.phy] + t[T.zoo] + t[T.doc] + t[T.det])
        return float((tot * d / onem).sum())

    p0 = pinv(model.state, 0)
    s, clock = standalone.run(model, 6)
    trc = np.asarray(s.trc)
    assert np.isfinite(trc).all()
    p1 = pinv(s, 0)
    np.testing.assert_allclose(p1, p0, rtol=5e-7)


def test_river_and_ndep_inputs(par):
    """River loads and N deposition add the right inventories in the
    right pools (mo_apply_rivin/mo_apply_ndep base paths)."""
    from blom_tpu.bgc import inputs as bi
    oc, dz, temp, saln = _column()
    kk, jj, ii = dz.shape
    kmle = (jnp.arange(kk) < 2).astype(dz.dtype)[:, None, None] \
        * jnp.ones((kk, jj, ii))
    riv = jnp.zeros((bi.NRIV, jj, ii)).at[bi.RiverFields.rdin].set(1.e-3)
    riv = riv.at[bi.RiverFields.ralk].set(2.e-3)
    inv0 = float((oc[T.ano3] * dz).sum())
    alk0 = float((oc[T.alkali] * dz).sum())
    oc2 = bi.apply_rivin(oc, riv, dz, kmle, jnp.asarray(1.0), par)
    # added DIN inventory = rivin * dtb/365 * area-sum over cells
    expect = 1.e-3 / 365. * jj * ii
    got = float((oc2[T.ano3] * dz).sum()) - inv0
    np.testing.assert_allclose(got, expect, rtol=1e-9)
    assert float((oc2[T.alkali] * dz).sum()) > alk0

    lyr0 = jnp.ones((jj, ii), bool)
    oc3 = bi.apply_ndep(oc2, jnp.full((jj, ii), 5.e-4), dz, lyr0,
                        jnp.asarray(1.0))
    dno3 = float(((oc3[T.ano3] - oc2[T.ano3]) * dz).sum())
    dalk = float(((oc3[T.alkali] - oc2[T.alkali]) * dz).sum())
    np.testing.assert_allclose(dno3, 5.e-4 / 365. * jj * ii, rtol=1e-9)
    np.testing.assert_allclose(dalk, -dno3, rtol=1e-9)


def test_boxatm_closes_carbon(par):
    from blom_tpu.bgc.inputs import update_boxatm
    scp2 = jnp.full((4, 5), 1.e10)
    mask = jnp.ones((4, 5))
    flux = jnp.full((4, 5), 1.e-6)   # kmol C /m2 to atmosphere
    atm1 = float(update_boxatm(jnp.asarray(284.7), flux, scp2, mask))
    total_kmol = 1.e-6 * 1.e10 * 20
    expect = 284.7 + total_kmol * 12e-12 / 2.13
    assert atm1 == pytest.approx(expect, rel=1e-12)


def test_preformed_tracers(par):
    from blom_tpu.bgc.inputs import NBGC_PREF, PrefTracers, preftrc
    oc, dz, temp, saln = _column()
    kk, jj, ii = dz.shape
    ext = jnp.concatenate([oc, jnp.zeros((NBGC_PREF - NBGC, kk, jj, ii))])
    kmle = (jnp.arange(kk) < 3).astype(dz.dtype)[:, None, None] \
        * jnp.ones((kk, jj, ii))
    idx = PrefTracers()
    out = preftrc(ext, kmle)
    np.testing.assert_allclose(np.asarray(out[idx.prefo2][:3]),
                               np.asarray(oc[T.oxygen][:3]))
    # below the ML the preformed tracer is untouched (still zero)
    np.testing.assert_allclose(np.asarray(out[idx.prefpo4][3:]), 0.)


def test_cfc_exchange(par):
    """CFC uptake from a 1990s-style atmosphere: surface concentrations
    rise toward equilibrium, SF6 solubility lower than CFC-11's,
    hemisphere blend interpolates across the tropics."""
    from blom_tpu.bgc import cfc
    jj, ii, kk = 4, 6, 5
    H = (jj, ii)
    z = jnp.zeros((kk, jj, ii))
    t0 = jnp.full(H, 10.)
    s0 = jnp.full(H, 35.)
    plat = jnp.asarray(np.broadcast_to(
        np.linspace(-60., 60., jj)[:, None], H).copy())
    atm = cfc.CfcAtm(cfc11_nh=270., cfc11_sh=260., cfc12_nh=520.,
                     cfc12_sh=505., sf6_nh=3., sf6_sh=2.8)
    c11, c12, sf, flx = cfc.cfc_exchange(
        z, z, z, t0, s0, plat, jnp.full(H, 8.), jnp.zeros(H),
        jnp.full(H, 101325.), jnp.full(H, 50.), jnp.ones(H, bool),
        atm, 1800.)
    assert (np.asarray(c11[0]) > 0.).all()
    assert (np.asarray(c12[0]) > 0.).all()
    assert (np.asarray(sf[0]) > 0.).all()
    # deeper layers untouched
    np.testing.assert_allclose(np.asarray(c11[1:]), 0.)
    # solubility: a_sf6 << a_cfc11 at 10C
    a11, a12, asf = cfc.solubility_cfc(jnp.asarray(10.), jnp.asarray(35.))
    assert float(asf) < float(a11) * 0.2
    # hemisphere blend: northern rows see the NH value
    b = cfc.hemisphere_blend(plat, 270., 260.)
    assert float(np.asarray(b)[-1, 0]) == pytest.approx(270.)
    assert float(np.asarray(b)[0, 0]) == pytest.approx(260.)
    # flux into an undersaturated ocean is downward (positive)
    assert (np.asarray(flx['flx11']) > 0.).all()


# ----------------------------------------------------------------- #
# extensions: extended N cycle, bromoform, shelf-sea residence time
# ----------------------------------------------------------------- #

def test_extn_watercol_conserves_N_and_P(par):
    """The four extNcycle processes (mo_extNwatercol.F90:83-454) must
    conserve total nitrogen (counting N2O and N2 as 2 N... the
    reference stores an2o/gasnit per molecule with stoichiometric
    factors such that each carries its N internally: an2o in kmol N2O,
    gasnit in kmol N2) and total phosphorus exactly."""
    from blom_tpu.bgc import extensions as ext
    from blom_tpu.bgc.params import make_tracer_index

    ti = make_tracer_index(use_extncycle=True)
    oc, dz, temp, saln = _column()
    # widen the block with NH4/NO2 slots
    extra = np.zeros((ti.ntotal - NBGC,) + oc.shape[1:])
    rng = np.random.RandomState(3)
    extra[ti.anh4 - NBGC] = 1.e-6 * rng.rand(*oc.shape[1:])
    extra[ti.ano2 - NBGC] = 1.e-6 * rng.rand(*oc.shape[1:])
    oc = jnp.concatenate([oc, jnp.asarray(extra)], axis=0)
    # make some cells strongly hypoxic so denit/anammox activate
    oc = oc.at[T.oxygen, 10:].set(1.e-9)
    wet = jnp.ones(dz.shape, bool)

    def totals(o):
        N = (o[T.ano3] + o[ti.ano2] + o[ti.anh4]
             + 2. * o[T.an2o] + 2. * o[T.gasnit]
             + par.rnit * (o[T.det] + o[T.phy] + o[T.zoo] + o[T.doc]))
        P = (o[T.phosph] + o[T.det] + o[T.phy] + o[T.zoo] + o[T.doc])
        return (float(jnp.sum(N * dz)), float(jnp.sum(P * dz)))

    N0, P0 = totals(oc)
    oc2, diags = ext.extn_watercol(oc, ti, temp, wet, jnp.asarray(0.5),
                                   par)
    N1, P1 = totals(oc2)
    assert abs(N1 - N0) < 1e-10 * abs(N0)
    assert abs(P1 - P0) < 1e-10 * abs(P0)
    # something actually happened
    assert float(jnp.max(jnp.abs(oc2[ti.anh4] - oc[ti.anh4]))) > 0
    # no negative concentrations created
    for idx in (ti.anh4, ti.ano2, T.ano3, T.an2o, T.oxygen, T.det):
        assert float(oc2[idx].min()) >= -1e-20


def test_extn_nitrification_needs_oxygen(par):
    """Amox/nitr rates collapse when O2 -> 0 (O2limanh4 factor,
    mo_extNwatercol.F90:124-131)."""
    from blom_tpu.bgc import extensions as ext
    from blom_tpu.bgc.params import make_tracer_index

    ti = make_tracer_index(use_extncycle=True)
    oc, dz, temp, saln = _column()
    extra = np.zeros((ti.ntotal - NBGC,) + oc.shape[1:])
    extra[ti.anh4 - NBGC] = 1.e-6
    extra[ti.ano2 - NBGC] = 1.e-6
    oc = jnp.concatenate([oc, jnp.asarray(extra)], axis=0)
    wet = jnp.ones(dz.shape, bool)

    rich = oc.at[T.oxygen].set(3.e-4)
    poor = oc.at[T.oxygen].set(1.e-12)
    _, d_rich = ext.nitrification(rich, ti, temp, wet, 0.5, par,
                                  ext.ExtNParams())
    _, d_poor = ext.nitrification(poor, ti, temp, wet, 0.5, par,
                                  ext.ExtNParams())
    assert float(jnp.mean(d_rich['nitr_NH4'])) > \
        10. * float(jnp.mean(d_poor['nitr_NH4']))


def test_bromoform_cycle(par):
    """Undersaturated surface ocean takes up CHBr3 from the atmosphere;
    hydrolysis+substitution decay reduces concentrations; production
    adds where there is light (mo_ocprod.F90:548-563,
    mo_carchm.F90:547-548,612-626)."""
    from blom_tpu.bgc import extensions as ext

    bp = ext.BromoParams()
    shp = (4, 6)
    wet0 = jnp.ones(shp, bool)
    bromo0 = jnp.zeros(shp)    # fully undersaturated
    new, atmflx = ext.bromo_surface_flux(
        bromo0, jnp.full(shp, 15.), jnp.zeros(shp), jnp.full(shp, 8.),
        jnp.full(shp, 101325.), jnp.full(shp, 50.), 3600., bp, wet0)
    assert float(new.min()) > 0.          # ocean gained
    assert float(atmflx.max()) < 0.       # atmosphere lost

    # decay shrinks a positive concentration
    kk = 5
    b = jnp.full((kk,) + shp, 1.e-11)
    tk = jnp.full((kk,) + shp, 288.15)
    kw = jnp.full((kk,) + shp, 1.e-14)
    ah = jnp.full((kk,) + shp, 1.e-8)
    b2 = ext.bromo_deep_decay(b, tk, kw, ah, 86400., jnp.ones(b.shape,
                                                              bool))
    assert float(jnp.max(b2)) < 1.e-11
    assert float(jnp.min(b2)) > 0.


def test_shelfsea_residence_time():
    from blom_tpu.bgc import extensions as ext
    shp = (3, 4, 5)
    age = jnp.full(shp, 2.0)
    shelf = jnp.zeros(shp[1:], bool).at[:, :2].set(True)
    wet = jnp.ones(shp, bool)
    age2 = ext.shelfsea_residence_time(age, shelf, wet, 0.5)
    np.testing.assert_allclose(np.asarray(age2[:, :, :2]), 2.5)
    np.testing.assert_allclose(np.asarray(age2[:, :, 2:]), 1.5)
    # relaxation floors at zero
    age3 = ext.shelfsea_residence_time(jnp.zeros(shp), shelf, wet, 0.5)
    assert float(age3.min()) == 0.


def test_inventory_bgc_audit(par):
    """inventory_bgc aggregates (mo_inventory_bgc.F90:405-460) must be
    invariant under ocprod + extNcycle, and must move one-for-one with
    a DIC perturbation."""
    from blom_tpu.bgc import extensions as ext
    from blom_tpu.bgc.inventory import inventory_bgc, inventory_deltas
    from blom_tpu.bgc.params import make_tracer_index

    ti = make_tracer_index(use_extncycle=True)
    oc, dz, temp, saln = _column()
    extra = np.zeros((ti.ntotal - NBGC,) + oc.shape[1:])
    extra[ti.anh4 - NBGC] = 1.e-6
    extra[ti.ano2 - NBGC] = 1.e-6
    oc = jnp.concatenate([oc, jnp.asarray(extra)], axis=0)
    area = jnp.full(dz.shape[1:], 1.e8)
    om = jnp.ones(dz.shape[1:])
    wet = jnp.ones(dz.shape, bool)

    inv0 = inventory_bgc(oc, dz, area, om, par, ti=ti)
    oc2, _ = ext.extn_watercol(oc, ti, temp, wet, jnp.asarray(0.5), par)
    inv1 = inventory_bgc(oc2, dz, area, om, par, ti=ti)
    d = inventory_deltas(inv0, inv1)
    assert abs(d['totalnitr']) < 1e-12
    assert abs(d['totalphos']) < 1e-12
    assert abs(d['totalsil']) < 1e-14

    # perturbation accounting: +X kmol DIC raises totalcarbon by X
    pert = oc.at[T.sco212].add(1.e-5)
    invp = inventory_bgc(pert, dz, area, om, par, ti=ti)
    dv = float(invp['totalcarbon'] - inv0['totalcarbon'])
    expect = float(jnp.sum(1.e-5 * dz * area[None] * om[None]))
    np.testing.assert_allclose(dv, expect, rtol=1e-9)


def test_natdic_parallel_carbonate(par):
    """Natural-DIC system (use_natDIC, mo_carchm.F90:245-257,444-451,
    633-658): with natural tracers initialized to the actual ones and
    the same pre-industrial atmosphere, the natural system must evolve
    identically to the base system through carchm."""
    from blom_tpu.bgc import extensions as ext
    from blom_tpu.bgc.params import make_tracer_index

    ti = make_tracer_index(use_natdic=True)
    oc, dz, temp, saln = _column(kk=6)
    extra = np.zeros((ti.ntotal - NBGC,) + oc.shape[1:])
    oc = jnp.concatenate([oc, jnp.asarray(extra)], axis=0)
    oc = oc.at[ti.natsco212].set(oc[T.sco212])
    oc = oc.at[ti.natalkali].set(oc[T.alkali])
    oc = oc.at[ti.natcalc].set(oc[T.calc])
    oc = oc.at[ti.nathi].set(oc[T.hi])

    shp = dz.shape
    lyr = jnp.ones(shp, bool)
    rho = jnp.full(shp, 1.025)
    ptiestu = jnp.cumsum(dz, axis=0) - 0.5 * dz
    fu10 = jnp.full(shp[1:], 7.)
    slp = jnp.full(shp[1:], 101325.)
    fice = jnp.zeros(shp[1:])
    kmle = jnp.ones(shp[1:], jnp.int32)

    from blom_tpu.bgc import carchm as carchm_mod
    parnat = par._replace(atm_co2=284.7)
    ocb, _, _ = carchm_mod.carchm(oc, temp, saln, rho, dz, ptiestu, lyr,
                                  kmle, None, fu10, slp, fice, 3600.,
                                  parnat)
    ocn, diags = ext.carchm_nat(oc, ti, temp, saln, rho, dz, ptiestu,
                                lyr, fu10, slp, fice, 3600., par,
                                atm_co2_nat=284.7)
    np.testing.assert_allclose(np.asarray(ocn[ti.natsco212]),
                               np.asarray(ocb[T.sco212]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ocn[ti.nathi]),
                               np.asarray(ocb[T.hi]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ocn[ti.natcalc]),
                               np.asarray(ocb[T.calc]), rtol=1e-10)
    assert bool(jnp.all(jnp.isfinite(diags['natpco2'])))

    # bio mirror: deltas propagate one-to-one
    oc2 = oc.at[T.sco212].add(1.e-6).at[T.calc].add(2.e-7)
    oc3 = ext.natdic_bio_mirror(oc, oc2, ti)
    np.testing.assert_allclose(
        np.asarray(oc3[ti.natsco212] - oc[ti.natsco212]), 1.e-6)
    np.testing.assert_allclose(
        np.asarray(oc3[ti.natcalc] - oc[ti.natcalc]), 2.e-7)


def test_offline_restart_remap_conserves():
    """tools/bgc_inputs vertical re-layering must conserve the column
    integral and reproduce constants exactly
    (utils/iHAMOCC/restart_remapping counterpart)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bgc_inputs', 'tools/bgc_inputs.py')
    bi = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bi)

    rng = np.random.RandomState(0)
    ks, kd, J, I = 8, 13, 3, 4
    dps = rng.rand(ks, J, I) + 0.1
    p_src = np.concatenate([np.zeros((1, J, I)),
                            np.cumsum(dps, axis=0)], axis=0)
    pb = p_src[-1]
    # destination: same column range, different layering
    w = rng.rand(kd, J, I) + 0.1
    w = w / w.sum(0)
    p_dst = np.concatenate([np.zeros((1, J, I)),
                            np.cumsum(w * pb[None], axis=0)], axis=0)
    trc = rng.rand(2, ks, J, I)
    out = bi.remap_restart_column(trc, p_src, p_dst)
    tot_src = (trc * dps[None]).sum(1)
    tot_dst = (out * (p_dst[1:] - p_dst[:-1])[None]).sum(1)
    np.testing.assert_allclose(tot_dst, tot_src, rtol=1e-12)
    # constant field stays constant
    out_c = bi.remap_restart_column(np.full((1, ks, J, I), 3.3),
                                    p_src, p_dst)
    np.testing.assert_allclose(out_c, 3.3, rtol=1e-12)

    # nearest-neighbour regrid: a smooth zonal field survives
    lat = np.linspace(-89.5, 89.5, 180)
    lon = np.linspace(0.5, 359.5, 360)
    f = np.cos(np.radians(lat))[:, None] * np.ones((180, 360))
    plat = np.linspace(-60, 60, 20)[:, None] * np.ones((20, 30))
    plon = np.ones((20, 1)) * np.linspace(0, 355, 30)[None]
    g = bi.regrid_to_model(lat, lon, f, plat, plon)
    np.testing.assert_allclose(g, np.cos(np.radians(plat)), atol=0.01)
