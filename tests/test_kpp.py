"""KPP boundary-layer scheme tests (LMD94/CVMix-equivalent)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core.constants import onem
from blom_tpu.phys import vmix
from blom_tpu.drivers import standalone


@pytest.fixture(scope='module')
def model():
    return standalone.build_fuk95(itdm=24, jtdm=12, kdm=10)


def test_velocity_scales_limits():
    """Neutral: w = kappa*ustar; stable forcing reduces w; unstable
    increases w_s (LMD94 phi functions)."""
    sig = jnp.asarray(.5)
    h = jnp.asarray(50.)
    ust = jnp.asarray(.01)
    wm0, ws0 = vmix.turb_velocity_scales(sig, h, ust, jnp.asarray(0.))
    assert float(wm0) == pytest.approx(0.4 * .01, rel=1e-6)
    assert float(ws0) == pytest.approx(0.4 * .01, rel=1e-6)
    # stable (bfsfc < 0 is destabilizing in this convention; stable
    # here means zeta > 0 => bfsfc*kappa*sigma*h/ust^3 > 0)
    wm_st, ws_st = vmix.turb_velocity_scales(sig, h, ust,
                                             jnp.asarray(1.e-7))
    assert float(wm_st) < float(wm0)
    wm_un, ws_un = vmix.turb_velocity_scales(sig, h, ust,
                                             jnp.asarray(-1.e-7))
    assert float(ws_un) > float(ws0)


def _forced(model, taux=0.1, surflx=0.):
    f = model.forcing
    H = model.grid.shape
    f = dataclasses.replace(
        f, taux=jnp.full(H, taux) * model.grid.iu,
        surflx=jnp.full(H, surflx) * model.grid.ip)
    return f


def test_obl_deepens_with_wind(model):
    par = vmix.VmixParams()
    f_weak = _forced(model, taux=.01)
    f_strong = _forced(model, taux=.5)
    v1 = vmix.difest_vertical_kpp(model.grid, model.e, model.state,
                                  f_weak, model.swabs, par, 0)
    v2 = vmix.difest_vertical_kpp(model.grid, model.e, model.state,
                                  f_strong, model.swabs, par, 0)
    wet = np.asarray(model.grid.ip) > 0
    h1 = np.asarray(v1.mld)[wet].mean()
    h2 = np.asarray(v2.mld)[wet].mean()
    assert h2 > h1, (h1, h2)


def test_kpp_profile_shape(model):
    """Boundary-layer diffusivity is zero at the surface interface,
    positive inside the OBL, zero below it."""
    par = vmix.VmixParams(bdmc2=0., visc_bg=0., nu_shear0=0.,
                          nubmin=0.)
    f = _forced(model, taux=.2)
    v = vmix.difest_vertical_kpp(model.grid, model.e, model.state, f,
                                 model.swabs, par, 0)
    wet = np.asarray(model.grid.ip) > 0
    K = np.asarray(v.Kdiff_t)
    assert (K[0][wet] == 0.).all()
    # some interface inside the OBL has positive diffusivity
    assert K[1:, wet].max() > 1e-4
    # diffusivity vanishes well below the OBL
    p = np.cumsum(np.asarray(model.state.dp[0]), 0) / 9806.
    hbl = np.asarray(v.mld)
    below = p[:-1] > hbl[None] * 1.5
    assert (K[1:][below & wet[None]] < 1e-10).all()


def test_nonlocal_only_when_destabilizing(model):
    par = vmix.VmixParams()
    # cooling (positive surflx upward = heat loss -> destabilizing;
    # check sign convention through buoyfl[0] > 0)
    f_cool = _forced(model, taux=.1, surflx=500.)
    f_warm = _forced(model, taux=.1, surflx=-500.)
    vc = vmix.difest_vertical_kpp(model.grid, model.e, model.state,
                                  f_cool, model.swabs, par, 0)
    vw = vmix.difest_vertical_kpp(model.grid, model.e, model.state,
                                  f_warm, model.swabs, par, 0)
    wet = np.asarray(model.grid.ip) > 0
    nl_c = np.asarray(vc.t_ns_nonloc)[1:, wet]
    nl_w = np.asarray(vw.t_ns_nonloc)[1:, wet]
    assert nl_c.max() > 0.      # nonlocal active under cooling
    assert nl_w.max() == 0.     # collapsed to the surface when heating


def test_kpp_e2e_step(model):
    """Full model step with the KPP estimator substituted."""
    import blom_tpu.dynamics.step as step_mod
    from blom_tpu.dynamics.step import blom_step

    orig = step_mod.difest_vertical
    step_mod.difest_vertical = vmix.difest_vertical_kpp
    try:
        f = _forced(model, taux=.1, surflx=200.)
        s, dfl = blom_step(model.grid, model.e, model.par,
                           model.coeffs_i, model.coeffs_j,
                           model.state, f, model.dfl, 0, 1,
                           jnp.asarray(180.), model.swabs)
        for name in ('dp', 'temp', 'saln', 'u', 'v'):
            assert np.isfinite(np.asarray(getattr(s, name))).all()
    finally:
        step_mod.difest_vertical = orig


def test_langmuir_enhancement(model):
    """The wave-coupler Langmuir factor multiplies the boundary-layer
    diffusivity."""
    par = vmix.VmixParams(bdmc2=0., visc_bg=0., nu_shear0=0., nubmin=0.)
    f = _forced(model, taux=.2)
    H = model.grid.shape
    v1 = vmix.difest_vertical_kpp(model.grid, model.e, model.state, f,
                                  model.swabs, par, 0)
    v2 = vmix.difest_vertical_kpp(model.grid, model.e, model.state, f,
                                  model.swabs, par, 0,
                                  lamult=jnp.full(H, 2.5))
    wet = np.asarray(model.grid.ip) > 0
    k1 = np.asarray(v1.Kdiff_t)[1:, wet]
    k2 = np.asarray(v2.Kdiff_t)[1:, wet]
    pos = k1 > 1e-10
    np.testing.assert_allclose(k2[pos] / k1[pos], 2.5, rtol=1e-9)


def test_tidal_dissipation_wired_into_diffusivity():
    """VmixParams.twedon feeds the tidally driven diapycnal diffusivity
    (the tdmflg branch, mod_difest.F90:2929-2941): bottom-intensified,
    proportional to the dissipation, zero when disabled."""
    import numpy as np
    import jax.numpy as jnp
    from blom_tpu.drivers import standalone
    from blom_tpu.phys.vmix import VmixParams, difest_vertical

    model = standalone.build_fuk95(itdm=24, jtdm=8, kdm=10)
    n = 1
    base = difest_vertical(model.grid, model.e, model.state,
                           model.forcing, model.swabs, VmixParams(), n)

    twedon = jnp.full(model.grid.shape, 5e-2)
    par_t = VmixParams(twedon=twedon)
    tid = difest_vertical(model.grid, model.e, model.state,
                          model.forcing, model.swabs, par_t, n)

    wet = np.asarray(model.grid.ip) > 0
    dk = np.asarray(tid.Kdiff_t - base.Kdiff_t)[:, wet]
    assert (dk >= -1e-15).all()
    assert dk.max() > 0., 'tidal term added nothing'
    # bottom intensification: the extra diffusivity in the deepest
    # interior interface dominates the shallowest
    assert dk[-1].mean() > dk[1].mean()
    # doubling the dissipation doubles the (uncapped) extra diffusivity
    tid2 = difest_vertical(model.grid, model.e, model.state,
                           model.forcing, model.swabs,
                           VmixParams(twedon=2. * twedon), n)
    dk2 = np.asarray(tid2.Kdiff_t - base.Kdiff_t)[:, wet]
    mask = dk < 0.5 * VmixParams().tdmmax
    np.testing.assert_allclose(dk2[mask], 2. * dk[mask], rtol=1e-6)
