"""ben02 bulk forcing + thermodynamic sea ice tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core import eos
from blom_tpu.phys import ben02, bulktf, seaice


@pytest.fixture(scope='module')
def setup():
    from blom_tpu.drivers import standalone
    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=8)
    return model


def test_qsat_magnitudes():
    """Saturation humidity at 20C/1atm ~ 0.0147 kg/kg; over ice at
    -10C much smaller; derivative positive."""
    q = float(ben02.qsatw(jnp.asarray(293.15), jnp.asarray(101325.)))
    assert 0.013 < q < 0.016, q
    qi = float(ben02.qsati(jnp.asarray(263.15), jnp.asarray(101325.)))
    assert 0.001 < qi < 0.002, qi
    assert float(ben02.dqsatw(jnp.asarray(293.15),
                              jnp.asarray(101325.))) > 0.
    assert float(ben02.rhoair(jnp.asarray(288.), jnp.asarray(0.008),
                              jnp.asarray(101325.))) == pytest.approx(
        1.22, abs=.05)


def test_bulktf_neutral_values():
    """Transfer coefficients converge to ~1.0-1.5e-3 for moderate wind
    over open water (Fairall et al. 96 magnitudes)."""
    du = jnp.asarray(8.)
    ta = jnp.asarray(288.)
    qa = jnp.asarray(0.008)
    ts = jnp.asarray(288.5)
    qs = ben02.qsatw(ts, jnp.asarray(101325.))
    cd = ch = ce = jnp.asarray(1.e-3)
    wg2 = jnp.asarray(1.e-4)
    for _ in range(8):
        cd, ch, ce, wg2 = bulktf.bulktf(du, 10., ta, 10., qa, 10.,
                                        ts, qs, jnp.asarray(0.),
                                        cd, ch, ce, wg2)
    assert 5.e-4 < float(cd) < 2.5e-3, float(cd)
    assert 5.e-4 < float(ch) < 2.5e-3
    assert 5.e-4 < float(ce) < 2.5e-3
    assert float(wg2) >= 0.01 ** 2


def test_lkb_monotone_bins():
    """LKB roughness Reynolds fits are continuous-ish and positive."""
    reu = jnp.asarray([0.05, 0.5, 2., 8., 20., 80., 200., 800.])
    ret, req = bulktf.lkb(reu)
    assert (np.asarray(ret) > 0.).all()
    assert (np.asarray(req) > 0.).all()


def test_asflux_fluxes_plausible(setup):
    """With a warm dataset and zero dataset fluxes the recovered
    atmosphere is near the dataset SST and fluxes are bounded."""
    model = setup
    H = model.grid.shape
    clim = ben02.neutral_clim(H)
    b = ben02.init_ben02(H)
    ice = seaice.init_seaice(H)
    tml = jnp.full(H, 288.5)
    sml = jnp.full(H, 35.)
    b2 = ben02.asflux(model.e, b, clim, ice, tml, sml)
    swa = np.asarray(b2.swa)
    nsf = np.asarray(b2.nsf)
    assert np.isfinite(swa).all() and np.isfinite(nsf).all()
    np.testing.assert_allclose(swa, 150. * (1. - .065), rtol=1e-6)
    assert (np.abs(nsf) < 500.).all()
    assert (np.asarray(b2.dfl) < 0.).all()     # more upward flux when warmer
    assert (np.asarray(b2.ustarw) >= 0.).all()
    # evaporation upward (negative) for saturated surface, dry-ish air
    assert (np.asarray(b2.eva) < 1e-3).all()


def test_ice_forms_in_freezing_conditions(setup):
    """Cold atmosphere over near-freezing water must grow ice, and the
    freshwater/salt fluxes must reflect brine rejection."""
    model = setup
    H = model.grid.shape
    clim = ben02.neutral_clim(H, dswrf=0., tsrf=248.)
    b = ben02.init_ben02(H)
    ice = seaice.init_seaice(H)
    e = model.e
    sotl = jnp.full(H, 35.)
    totl = eos.tfrz(e, sotl) + 0.001         # just above freezing [C]
    b = ben02.asflux(e, b, clim, ice, totl + 273.15, sotl)
    from blom_tpu.phys.swabs import init_swabs
    sw = init_swabs(H, 'jerlov', 3)
    dp1 = jnp.full(H, 5. * 9806.)
    ice2, flx = ben02.thermf_ben02(
        model.grid, e, b, clim, ice, dp1, totl, sotl,
        jnp.zeros(H), sw.swfc2, sw.swal2, 1800.)
    wet = np.asarray(model.grid.ip) > 0
    fice = np.asarray(ice2.ficem)[wet]
    assert (fice > 0.).any(), 'no ice formed under -25C atmosphere'
    assert (fice <= seaice.fice_max + 1e-12).all()
    assert (np.asarray(ice2.hicem)[wet] >= 0.).all()
    # freezing rejects brine: brnflx (positive down in reference sign,
    # stored positive up here) must be nonzero somewhere
    assert np.isfinite(np.asarray(flx['salflx'])).all()
    assert (np.asarray(flx['surflx'])[wet] != 0.).any()


def test_ice_melts_in_warm_conditions(setup):
    """A warm sunny atmosphere must shrink existing thin ice."""
    model = setup
    H = model.grid.shape
    clim = ben02.neutral_clim(H, dswrf=300., tsrf=295.)
    b = ben02.init_ben02(H)
    ice = seaice.init_seaice(H)
    import dataclasses
    ice = dataclasses.replace(
        ice, ficem=jnp.full(H, .5), hicem=jnp.full(H, .2),
        tsrfm=jnp.full(H, 270.), ticem=jnp.full(H, 270.))
    e = model.e
    sotl = jnp.full(H, 35.)
    totl = jnp.full(H, 6.)
    b = ben02.asflux(e, b, clim, ice, totl + 273.15, sotl)
    from blom_tpu.phys.swabs import init_swabs
    sw = init_swabs(H, 'jerlov', 3)
    dp1 = jnp.full(H, 20. * 9806.)
    vol0 = float((ice.ficem * ice.hicem).sum())
    ice2, flx = ben02.thermf_ben02(
        model.grid, e, b, clim, ice, dp1, totl, sotl,
        jnp.zeros(H), sw.swfc2, sw.swal2, 1800.)
    wet = np.asarray(model.grid.ip) > 0
    vol1 = float((ice2.ficem * ice2.hicem)[wet].sum())
    assert vol1 < vol0 * np.count_nonzero(wet) / wet.size + 1e-12


def test_sfcstr_blends_ice_stress(setup):
    model = setup
    H = model.grid.shape
    clim = ben02.neutral_clim(H)
    b = ben02.init_ben02(H)
    ice = seaice.init_seaice(H)
    taux0, tauy0 = ben02.sfcstr_ben02(model.grid, b, clim, ice)
    import dataclasses
    icy = dataclasses.replace(ice, ficem=jnp.ones(H),
                              hicem=jnp.full(H, 2.))
    taux1, tauy1 = ben02.sfcstr_ben02(model.grid, b, clim, icy)
    iu = np.asarray(model.grid.iu) > 0
    # full ice cover with zero ice-ocean stress kills the wind stress
    assert (np.abs(np.asarray(taux1)[iu])
            <= np.abs(np.asarray(taux0)[iu]) + 1e-15).all()
    assert np.abs(np.asarray(taux1)[iu]).max() < 1e-12
