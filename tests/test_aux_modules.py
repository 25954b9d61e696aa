"""Tests for the small auxiliary physics/util modules: temmin, niw,
tidaldissip, intp1d/idarlx, pointtest, timing."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core import eos
from blom_tpu.core.constants import grav, onem


@pytest.fixture(scope='module')
def model():
    from blom_tpu.drivers import standalone
    return standalone.build_fuk95(itdm=24, jtdm=12, kdm=8)


def test_temmin_is_freezing_point_of_reference_density(model):
    """temmin(k) must equal tfrz(S*) where sig(tfrz(S*), S*) = sigmar
    (settemmin, mod_temmin.F90:80-100)."""
    from blom_tpu.phys.temmin import settemmin
    e = model.e
    sigmar = model.state.sigmar
    tm = settemmin(e, sigmar, vcoord_isopyc=True, expcnf='fuk95')
    tm_np = np.asarray(tm)
    sg = np.asarray(sigmar)
    # verify: sig(temmin, salfrz) == sigmar with salfrz = temmin/atf
    k, j, i = 4, 5, 6
    salfrz = tm_np[k, j, i] / e.atf
    sig_chk = float(eos.sig(e, tm_np[k, j, i], salfrz))
    assert sig_chk == pytest.approx(sg[k, j, i], abs=1e-8)
    # non-isopycnic path: constant
    tm2 = settemmin(e, sigmar, vcoord_isopyc=False)
    np.testing.assert_allclose(np.asarray(tm2), -3.)


def test_niw_tendency_tracks_velocity_change(model):
    """A velocity jump in the mixed layer must register as a positive
    inertial KE tendency; steady velocities decay toward zero
    tendency."""
    import dataclasses
    from blom_tpu.phys.niw import init_niw, niw_ke_tendency
    s = model.state
    H = model.grid.shape
    niw = init_niw(H)
    # initialize pbu/pbv to something nonzero to avoid division guard
    s = dataclasses.replace(
        s, pbu=jnp.full_like(s.pbu, 100. * onem),
        pbv=jnp.full_like(s.pbv, 100. * onem),
        dpu=s.dpu.at[:].set(10. * onem), dpv=s.dpv.at[:].set(10. * onem))
    niw1 = niw_ke_tendency(model.grid, s, niw, 0, 360., model.par.dlt)
    # impulse: add 0.1 m/s to ML u
    s2 = dataclasses.replace(s, u=s.u.at[0, :2].add(.1))
    niw2 = niw_ke_tendency(model.grid, s2, niw1, 0, 360., model.par.dlt)
    wet = np.asarray(model.grid.ip) > 0
    assert float(np.asarray(niw2.idkedt)[wet].max()) > 0.
    assert np.isfinite(np.asarray(niw2.idkedt)).all()


def test_tidal_diffusivity_bottom_intensified(model):
    from blom_tpu.phys.tidaldissip import (inivar_tidaldissip,
                                           tidal_diffusivity)
    kk, (jj, ii) = 8, model.grid.shape
    dp_k = jnp.full((kk, jj, ii), 200. * onem)
    p_i = jnp.concatenate([jnp.zeros((1, jj, ii)),
                           jnp.cumsum(dp_k, 0)], 0)
    twedon = jnp.full((jj, ii), .01)
    bvfbot = jnp.full((jj, ii), 1.e-3)
    bvfsq = jnp.full((kk, jj, ii), 1.e-6)
    nut = tidal_diffusivity(twedon, bvfbot, bvfsq, p_i, dp_k, grav)
    nut_np = np.asarray(nut)
    assert np.isfinite(nut_np).all()
    assert (nut_np >= 0.).all()
    # bottom-intensified: deepest layer > top layer
    assert (nut_np[-1] > nut_np[0]).all()
    # zero dissipation -> zero diffusivity
    nut0 = tidal_diffusivity(inivar_tidaldissip((jj, ii)), bvfbot,
                             bvfsq, p_i, dp_k, grav)
    np.testing.assert_allclose(np.asarray(nut0), 0.)


def test_intp1d_constant_linear_exact():
    """intp1d is a smoothing quadratic fit through 5 equally spaced
    slices evaluated at t = x - 1/2 relative to the middle slice
    (mod_intp1d.F90:20-60): constants and linear trends are
    reproduced exactly, quadratics approximately."""
    from blom_tpu.phys.intp1d import intp1d
    for x in (0., .25, .5, .9):
        assert intp1d(7., 7., 7., 7., 7., x) == pytest.approx(7.)
        # f(t) = t at t = -2..2 -> value x - 1/2
        got = intp1d(-2., -1., 0., 1., 2., x)
        assert got == pytest.approx(x - .5, abs=1e-12)
    # quadratic: smoothed but close at the middle-slice time (x = 1/2)
    f = lambda t: t * t
    got = intp1d(f(-2.), f(-1.), f(0.), f(1.), f(2.), .5)
    assert abs(got - 0.) < .05


def test_clim_indices_wrap():
    from blom_tpu.phys.intp1d import clim_indices
    i1, i2, i3, i4, i5, x = clim_indices(1, 0.)
    assert i3 == 0 and 0. <= x < 1.
    assert i1 == 46 and i2 == 47 and i4 == 1 and i5 == 2
    i1, i2, i3, i4, i5, x = clim_indices(365, .99)
    assert 0 <= i3 < 48


def test_idarlx_roundtrip(tmp_path):
    from blom_tpu.phys.idarlx import apply_flux_clim, load_flux_clim
    arr = np.random.RandomState(0).randn(48, 4, 5)
    p = tmp_path / 'tflxdi.npz'
    np.savez(p, tflxap=arr)
    clim = load_flux_clim(str(p), 'tflxap')
    out = apply_flux_clim(clim, 10, .5)
    assert out.shape == (4, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_pointtest_format(model):
    from blom_tpu.utils.pointtest import ptest
    txt = ptest(model.state, 0, 5, 4, model.grid)
    assert 'point test at (i=5, j=4)' in txt
    assert 'dp[m]' in txt and 'pb=' in txt


def test_timers():
    import time as _t
    from blom_tpu.utils.timing import Timers
    tm = Timers()
    tm.start('a')
    _t.sleep(.01)
    dt = tm.stop('a')
    assert dt >= .009
    tm.start('a')
    dt2 = tm.stop('a', block_on=jnp.ones(3) * 2.)
    rep = tm.statistics()
    assert 'a' in rep and tm.count['a'] == 2
    assert 'sec for step' in tm.step_line(5, 'a')


def test_fwbbal_balances_freshwater():
    """The prfac update makes scaled precipitation exactly offset
    evaporation in the annual mean (fwbbal, mod_forcing.F90:361-441)."""
    from blom_tpu.phys.forcing import fwbbal_accumulate, fwbbal_update
    H = (4, 5)
    z = jnp.zeros(H)
    eiacc, pracc = z, z
    eva = jnp.full(H, -4.e-5)       # net evaporation (upward)
    lip = jnp.full(H, 3.e-5)
    for _ in range(10):
        eiacc, pracc = fwbbal_accumulate(eiacc, pracc, eva, z, lip, z,
                                         z, z, 300.)
    scp2 = jnp.full(H, 1.e8)
    prfac, eiacc, pracc = fwbbal_update(jnp.asarray(1.), eiacc, pracc,
                                        scp2, jnp.ones(H))
    # scaled precip exactly offsets evaporation: prfac*P + E = 0
    assert float(prfac) == pytest.approx(4. / 3., rel=1e-12)
    np.testing.assert_allclose(np.asarray(eiacc), 0.)


def test_swabs_chlorophyll_methods():
    """ma94 polynomial fractions must sum to 1-ma94_irfc; ohl03 LUT at a
    Table-1a node must reproduce the node values (mod_swabs.F90:405-435,
    653-710)."""
    from blom_tpu.phys import swabs

    chl10 = jnp.asarray([[-1.0, 0.0], [1.5, -3.0]])  # incl. out-of-range
    sw = swabs.swabs_from_chl(chl10, 'chlorophyll_ma94')
    np.testing.assert_allclose(np.asarray(sw.swfc1 + sw.swfc2),
                               1.0 - swabs.ma94_irfc, rtol=1e-12)
    assert np.all(np.asarray(sw.swal1) > 0)
    assert np.all(np.asarray(sw.swal2) > np.asarray(sw.swal1))

    # chl = 1.0 (log10 = 0) is a Table 1a node and also an exact LUT grid
    # point (lut spans log10 in [-3, 1] -> 0 lands on index 300).
    sw1 = swabs.swabs_from_chl(jnp.asarray([[0.0]]), 'chlorophyll_ohl03')
    i = np.argwhere(swabs.chl_tab1a == 1.0)[0, 0]
    np.testing.assert_allclose(float(sw1.swfc1[0, 0]),
                               swabs.a2_tab1a[i], rtol=1e-6)
    np.testing.assert_allclose(float(sw1.swal2[0, 0]),
                               1.0 / swabs.b1_tab1a[i], rtol=1e-6)

    # monthly climatology update: constant climatology -> constant fields
    chl10c = jnp.full((12, 2, 2), 0.0)
    swm = swabs.updswa('chlorophyll_ma94', chl10c, (0.3, 1, 2, 3, 4, 5))
    np.testing.assert_allclose(np.asarray(swm.swfc1),
                               float(sw.swfc1[0, 1]), rtol=1e-12)


def test_pgforc_geopotential_matches_dynamic_enthalpy(model):
    """The two PGF formulations (pgforc_geopotential
    mod_pgforc.F90:95-260 vs pgforc_dynamic_enthalpy :265-437) are
    independent discretizations of the same force; on the fuk95 jet the
    layer PGF fields must agree to discretization accuracy, and the
    geopotential PGF of a resting, horizontally uniform state must
    vanish."""
    from blom_tpu.dynamics import pgforc

    s = model.state
    sg = pgforc.pgforc(model.grid, model.e, s, 0, 1, pgfmth='geopotential')
    sd = pgforc.pgforc(model.grid, model.e, s, 0, 1,
                       pgfmth='dynamic enthalpy')
    scale = float(jnp.max(jnp.abs(sd.pgfx[1])))
    assert scale > 0
    assert float(jnp.max(jnp.abs(sg.pgfx[1] - sd.pgfx[1]))) < 1e-4 * scale
    assert float(jnp.max(jnp.abs(sg.pgfy[1] - sd.pgfy[1]))) < 1e-4 * scale
    assert bool(jnp.all(jnp.isfinite(sg.pgfxm)))

    # horizontally uniform stratification: zero PGF
    import dataclasses
    kk = model.grid.kk
    t0 = s.temp[0, :, :1, :1] * 0 + jnp.linspace(
        10., 2., kk)[:, None, None]
    su = dataclasses.replace(
        s,
        temp=s.temp * 0 + t0[None],
        saln=s.saln * 0 + 35.0,
        dp=s.dp * 0 + jnp.mean(s.dp, axis=(2, 3), keepdims=True))
    sg0 = pgforc.pgforc(model.grid, model.e, su, 0, 1,
                        pgfmth='geopotential')
    assert float(jnp.max(jnp.abs(sg0.pgfx[1]))) < 1e-7 * max(scale, 1e-30)
