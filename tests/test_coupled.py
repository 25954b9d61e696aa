"""Coupled-mode cap tests: forcing translation, time smoothing,
thermf_cesm fluxes, export fields, and a full 2-interval advance."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.drivers import coupled, standalone


@pytest.fixture(scope='module')
def model():
    return standalone.build_fuk95(itdm=24, jtdm=12, kdm=8)


def _imports(shape, taux=.05, swnet=150., lat=-60., sen=-15.,
             lwup=-380., lwdn=340., rain=3e-5):
    z = jnp.zeros(shape)
    f = lambda v: jnp.full(shape, v)
    return coupled.ImportFields(
        taux=f(taux), tauy=z, swnet=f(swnet), lat=f(lat), sen=f(sen),
        lwup=f(lwup), lwdn=f(lwdn), rain=f(rain), snow=z,
        evap=f(-4e-5), rofl=z, rofi=z, melth=z, meltw=z, salt=z,
        ifrac=z, pslv=f(101325.), duu10n=f(36.),
        rofl_glc=z, rofi_glc=z, lamult=f(1.), ustokes=z, vstokes=z,
        hstokes=z, bcpho=z, bcphi=z, flxdst=z, ndep=z, co2prog=z,
        co2diag=z)


def test_import_rotates_slots(model):
    H = model.grid.shape
    cf = coupled.init_cesm_forcing(H)
    cf = coupled.import_forcing(cf, _imports(H, swnet=100.))
    cf = coupled.import_forcing(cf, _imports(H, swnet=200.))
    np.testing.assert_allclose(np.asarray(cf.swa[0]), 100.)
    np.testing.assert_allclose(np.asarray(cf.swa[1]), 200.)
    # nsf assembled from lat+sen+lwup+lwdn
    np.testing.assert_allclose(np.asarray(cf.nsf[1]),
                               -60. - 15. - 380. + 340.)


def test_getfrc_smoothing_blends(model):
    H = model.grid.shape
    cf = coupled.init_cesm_forcing(H)
    cf = coupled.import_forcing(cf, _imports(H, swnet=100.))
    cf = coupled.import_forcing(cf, _imports(H, swnet=200.))
    n_in_cpl = 8
    vals = [float(np.asarray(
        coupled.getfrc_cesm(cf, n_in_cpl, i)['swa'])[0, 0])
        for i in range(n_in_cpl)]
    # starts near the previous interval, ends at the current
    assert vals[0] < 150. < vals[-1]
    assert vals[-1] == pytest.approx(200., abs=5.)
    assert all(vals[i] <= vals[i + 1] + 1e-9 for i in range(7))
    # smtfrc off: always the current slot
    v = coupled.getfrc_cesm(cf, n_in_cpl, 0, smtfrc=False)['swa']
    np.testing.assert_allclose(np.asarray(v), 200.)


def test_thermf_cesm_fluxes(model):
    H = model.grid.shape
    cf = coupled.init_cesm_forcing(H)
    cf = coupled.import_forcing(cf, _imports(H))
    cf = coupled.import_forcing(cf, _imports(H))
    frc = coupled.getfrc_cesm(cf, 4, 0)
    flx = coupled.thermf_cesm(model.grid, model.e, model.state, frc,
                              0, 1, 180.)
    wet = np.asarray(model.grid.ip) > 0
    # heat flux = -(swa+nsf+hmltfz); hmlt=0, frzpot=0 for 10C water
    expect = -(150. + (-60. - 15. - 380. + 340.))
    np.testing.assert_allclose(np.asarray(flx['surflx'])[wet], expect,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(flx['frzpot'])[wet], 0.)
    assert np.isfinite(np.asarray(flx['salflx'])).all()
    # virtual salt flux correction makes the global mean match the
    # reference-salinity flux: area mean of salflx ~ -sref*fwflx*1e3*...
    fw = 3e-5 - 4e-5
    mean_s = float((np.asarray(flx['salflx']) * np.asarray(model.grid.scp2)
                    * wet).sum() / (np.asarray(model.grid.scp2) * wet).sum())
    assert mean_s == pytest.approx(coupled.SREF * fw, rel=1e-6)


def test_export_fields(model):
    H = model.grid.shape
    frz = jnp.zeros(H)
    ex = coupled.ocn_export(model.grid, model.e, model.state, 0, frz,
                            180.)
    wet = np.asarray(model.grid.ip) > 0
    assert np.isfinite(np.asarray(ex.So_t)).all()
    # surface temperature in Kelvin
    assert (np.asarray(ex.So_t)[wet] > 250.).all()
    assert (np.asarray(ex.So_s)[wet] > 30.).all()
    np.testing.assert_allclose(np.asarray(ex.So_omask),
                               np.asarray(model.grid.ip))


def test_cap_advance_two_intervals(model):
    """Two coupling intervals of 3 steps each: the ModelAdvance loop
    (ocn_comp_nuopc.F90:886-950)."""
    import copy
    mdl = standalone.build_fuk95(itdm=24, jtdm=12, kdm=8)
    cap = coupled.OcnCap(mdl, nstep_in_cpl=3)
    H = mdl.grid.shape
    m0 = float((np.asarray(mdl.state.dp[1]).sum(0)
                * np.asarray(mdl.grid.scp2) * np.asarray(mdl.grid.ip)).sum())
    ex1 = cap.advance(_imports(H))
    ex2 = cap.advance(_imports(H, swnet=50.))
    assert cap.nstep == 6
    for f in ex2:
        assert np.isfinite(np.asarray(f)).all()
    # mass conserved through the coupled loop
    lev = 1 - (cap.nstep % 2)
    m1 = float((np.asarray(mdl.state.dp[lev]).sum(0)
                * np.asarray(mdl.grid.scp2) * np.asarray(mdl.grid.ip)).sum())
    assert abs(m1 - m0) / m0 < 1e-12
    # SST answered the forcing (expected change ~1e-4 K per interval)
    wet = np.asarray(mdl.grid.ip) > 0
    dsst = np.abs(np.asarray(ex1.So_t) - np.asarray(ex2.So_t))[wet]
    assert dsst.max() > 1e-6


def test_noforcing_config(model):
    from blom_tpu.configs import noforcing
    f = noforcing.inifrc_noforcing(8, model.grid.shape)
    f = noforcing.getfrc_noforcing(f)
    f = noforcing.sfcstr_noforcing(f)
    assert float(np.abs(np.asarray(f.taux)).max()) == 0.
    assert float(np.abs(np.asarray(f.surflx)).max()) == 0.


def test_stream_interp_cyclic():
    from blom_tpu.drivers import streams
    rng = np.random.default_rng(3)
    fields = rng.normal(size=(12, 4, 5))
    st = streams.monthly_stream(fields, 2000, 2000, 1, nday_in_year=360.)
    # mid-January record should be returned exactly at its mid-time
    got = np.asarray(st.interp(1, 15.))
    np.testing.assert_allclose(got, fields[0], rtol=1e-12)
    # halfway between Jan and Feb
    got = np.asarray(st.interp(1, 30.))
    np.testing.assert_allclose(got, .5 * (fields[0] + fields[1]),
                               rtol=1e-12)
    # December -> January wrap (day 359 is 14/30 of the way from
    # mid-December day 345 to mid-January day 15 of the next cycle)
    got = np.asarray(st.interp(1, 359.))
    w1 = (359. - 345.) / 30.
    np.testing.assert_allclose(got, (1 - w1) * fields[11] + w1 * fields[0],
                               rtol=1e-12)
    # year cycling: model year 5 maps onto the single data year
    got5 = np.asarray(st.interp(5, 15.))
    np.testing.assert_allclose(got5, fields[0], rtol=1e-12)


def test_swtfrz_options():
    from blom_tpu.drivers.streams import swtfrz
    s = jnp.asarray([0., 35.])
    np.testing.assert_allclose(np.asarray(swtfrz(s, 'minus1p8')),
                               [-1.8, -1.8])
    np.testing.assert_allclose(np.asarray(swtfrz(s, 'linear_salt')),
                               [0., -0.0544 * 35.], rtol=1e-12)
    mush = np.asarray(swtfrz(s, 'mushy'))
    assert mush[0] == 0. and -2.5 < mush[1] < -1.5


def test_cap_export_profiles_and_data_init(model):
    """The upgraded cap exports level profiles and supports the
    DataInitialize phase (ocn_comp_nuopc.F90:367-560)."""
    from blom_tpu.drivers import coupled
    cap = coupled.OcnCap(model, nstep_in_cpl=2)
    exp0 = cap.data_initialize()
    assert exp0.So_t_depth.shape[0] == coupled.NLEV_EXPORT
    ip = np.asarray(model.grid.ip) > 0
    t0 = np.asarray(exp0.So_t_depth[0])[ip]
    assert np.isfinite(t0).all()
    # surface-level export matches SST where the top bin is wet
    sst = np.asarray(model.state.temp[1][0])[ip]
    assert abs(t0.mean() - sst.mean()) < 2.0
    # BGC export fields default to zeros
    assert float(jnp.sum(jnp.abs(exp0.Faoo_fco2_ocn))) == 0.

    imp = coupled.zero_imports(model.grid.shape, model.state.dp.dtype)
    exp1 = cap.advance(imp)
    assert np.isfinite(np.asarray(exp1.So_t)[ip]).all()
    assert np.isfinite(np.asarray(exp1.So_t_depth[0])[ip]).all()
