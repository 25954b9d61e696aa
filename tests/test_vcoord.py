"""Reference-density generator and sigref-adaption tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core import vcoord as vc


def test_cubic_root():
    # x^3 - 2x^2 - 5x + 6 has roots 1, 3, -2
    r = float(vc.cubic_root(1., -2., -5., 6., jnp.asarray(0.9)))
    assert r == pytest.approx(1., abs=1e-10)
    r = float(vc.cubic_root(1., -2., -5., 6., jnp.asarray(2.8)))
    assert r == pytest.approx(3., abs=1e-10)


def test_sigma_fun_monotone_and_endpoints():
    """Bezier reference densities run monotonically from sp1 to sp4
    for standard parameters (sigma_fun, mod_vcoord.F90:172-269)."""
    spec = vc.SigmaFunSpec(sp1=22., zp2=.3, zp3=.7, sp4=37.2,
                           dsdz_bot=.1)
    sig = np.asarray(vc.sigma_fun(spec, 53))
    assert sig[0] == pytest.approx(22., abs=1e-6)
    assert sig[-1] == pytest.approx(37.2, abs=1e-6)
    assert (np.diff(sig) > 0.).all()


def test_sigma_fun_bottom_parabola():
    """With z_bot < 1 the profile ends at s_bot."""
    spec = vc.SigmaFunSpec(sp1=22., zp2=.3, zp3=.7, sp4=37.2,
                           dsdz_bot=.1, z_bot=.85, s_bot=37.30)
    sig = np.asarray(vc.sigma_fun(spec, 53))
    assert sig[-1] == pytest.approx(37.30, abs=1e-6)
    assert (np.diff(sig) > -1e-9).all()


def test_sigma_fun_traceable():
    """sigma_fun jits and differentiates in the varying parameters."""
    import jax

    def f(sp1):
        spec = vc.SigmaFunSpec(sp1=sp1)
        return vc.sigma_fun(spec, 20).sum()

    g = float(jax.grad(f)(jnp.asarray(22.)))
    assert np.isfinite(g) and g != 0.


def test_sra_daily_max_and_accumulate():
    sra = vc.init_sra((3, 4))
    dp1 = jnp.full((3, 4), 100.)
    sg1 = jnp.full((3, 4), 26.)
    sra = vc.sra_find_ml_dmax(sra, dp1, sg1)
    sra = vc.sra_find_ml_dmax(sra, dp1 * .5, sg1 + 1.)  # shallower
    np.testing.assert_allclose(np.asarray(sra.dpml_dmax), 100.)
    np.testing.assert_allclose(np.asarray(sra.sigmlb_dmax), 26.)
    sra = vc.sra_accumulate(sra, 0)
    assert int(sra.tlev_accnum[0]) == 1
    np.testing.assert_allclose(np.asarray(sra.dpml_dmax), 0.)
    sra = vc.sra_update_clim(sra)
    np.testing.assert_allclose(np.asarray(sra.dpml_clim[0]), 100.)
    assert int(sra.tlev_accnum[0]) == 0


def test_sra_optimize_reduces_cost():
    """The (sp1, zp2) descent must not increase the ML-fit cost."""
    kdm = 20
    spec = vc.SigmaFunSpec(sp1=20., zp2=.45, sp4=37.2)
    sra = vc.init_sra((4, 5))
    # synthetic climatology: ML base density 27, observed ML 50 dbar
    sra = vc.sra_find_ml_dmax(sra, jnp.full((4, 5), 5.e5),
                              jnp.full((4, 5), 27.))
    sra = vc.sra_accumulate(sra, 0)
    sra = vc.sra_update_clim(sra)
    plevel = jnp.linspace(1.e4, 4.e6, kdm)
    wgt = jnp.ones((4, 5))
    mask = jnp.ones((4, 5))
    c0 = float(vc.sra_cost(plevel, vc.sigma_fun(spec, kdm), sra, wgt,
                           mask))
    spec2 = vc.sra_optimize_sp1_zp2(spec, plevel, sra, wgt, mask, kdm,
                                    niter=15)
    c1 = float(vc.sra_cost(plevel, vc.sigma_fun(spec2, kdm), sra, wgt,
                           mask))
    assert np.isfinite(c0) and np.isfinite(c1)
    assert c1 <= c0 + 1e-9


def test_sra_update_filter_converges():
    """Repeated filtering pulls the active spec toward the new
    parameters (sra_update, mod_vcoord.F90:354-405)."""
    old = vc.SigmaFunSpec(sp1=22.)
    new = vc.SigmaFunSpec(sp1=23.)
    spec = old
    for i in range(2000):
        spec = vc.sra_update_filter(spec, old, new, 1.0, 86400.,
                                    nday_in_year=360., ts1=.01,
                                    ts2=.01)
    assert float(spec.sp1) == pytest.approx(23., abs=.01)
