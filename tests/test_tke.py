"""TKE/GLS turbulence closure tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core.constants import alpha0, grav, onem
from blom_tpu.phys import tke as tk


def _setup(kk=10, jj=3, ii=4, shear2=1.e-5, n2=1.e-5, difdia0=1.e-4):
    """shear2 is the target squared shear frequency [s-2]."""
    shp = (kk, jj, ii)
    tke = jnp.full(shp, 1.e-4)
    gls = jnp.full(shp, 1.e-5)
    difdia = jnp.full(shp, difdia0)
    h = 50. * onem
    h_m = h * alpha0 / grav
    dp_k = jnp.full(shp, h)
    du2l = jnp.full(shp, shear2 * h_m ** 2)
    bvfsq = jnp.full(shp, n2)
    p_i = jnp.cumsum(jnp.concatenate([jnp.zeros((1, jj, ii)),
                                      dp_k]), axis=0)
    ustar = jnp.full((jj, ii), .01)
    ustarb = jnp.full((jj, ii), .002)
    kmax = jnp.full((jj, ii), kk - 1, jnp.int32)
    return tke, gls, difdia, du2l, bvfsq, dp_k, p_i, ustar, ustarb, kmax


def test_derived_coefficients_match_initke():
    """Spot-check the derived Canuto coefficients against the initke
    formulas (mod_tke.F90:135-160)."""
    assert tk.gls_s0 == pytest.approx(1.5 * .107 * 11.9 ** 2)
    assert tk.gls_b0 == pytest.approx(3. * 11.9 ** 2)
    assert tk.cmu_fac1 == pytest.approx(.527 ** 3.)
    assert tk.gls_fac6 == pytest.approx(8. / .527 ** 6)


def test_update_bounded_and_finite():
    par = tk.TkeParams()
    args = _setup()
    tke, gls, nus, L = tk.tke_gls_update(*args, jnp.asarray(360.), par)
    for a in (tke, gls, nus, L):
        assert np.isfinite(np.asarray(a)).all()
    assert (np.asarray(tke) >= tk.tke_min).all()
    assert (np.asarray(gls) >= tk.gls_psi_min).all()
    assert (np.asarray(nus) >= 0.).all()
    assert (np.asarray(nus) <= 4.05 * par.nug0 + 1e-12).all()
    assert (np.asarray(L) >= tk.Ls_unlmt_min).all()


def test_shear_production_grows_tke():
    """Strong shear, weak stratification: TKE must grow (below the
    2-layer surface floor)."""
    par = tk.TkeParams()
    args = list(_setup(shear2=1.e-3, n2=1.e-8, difdia0=1.e-2))
    tke0 = args[0]
    out = tk.tke_gls_update(*args, jnp.asarray(3600.), par)
    grew = np.asarray(out[0][3:-1]) > np.asarray(tke0[3:-1])
    assert grew.all()


def test_stable_stratification_damps_mixing():
    """Stronger N^2 must give smaller diffusivity at equal shear."""
    par = tk.TkeParams()
    weak = tk.tke_gls_update(*_setup(n2=1.e-7), jnp.asarray(360.),
                             par)
    strong = tk.tke_gls_update(*_setup(n2=1.e-4), jnp.asarray(360.),
                               par)
    nus_w = float(np.asarray(weak[2])[5].mean())
    nus_s = float(np.asarray(strong[2])[5].mean())
    assert nus_s < nus_w


def test_bottom_bc_sets_friction_tke():
    par = tk.TkeParams()
    args = _setup()
    kmax = args[-1]
    tke, gls, nus, L = tk.tke_gls_update(*args, jnp.asarray(360.), par)
    ust = .002
    expect = (ust / tk.gls_cmu0) ** 2
    np.testing.assert_allclose(np.asarray(tke)[-1], expect, rtol=1e-12)


def test_surface_floor():
    par = tk.TkeParams()
    tke, gls, nus, L = tk.tke_gls_update(*_setup(), jnp.asarray(360.),
                                         par)
    np.testing.assert_allclose(np.asarray(tke)[:2], tk.tke_min)
    np.testing.assert_allclose(np.asarray(gls)[:2], tk.gls_psi_min)


def test_tke_closure_in_isopyc_step():
    """fuk95 isopycnic run with the TKE/GLS closure active: tracers
    update, diffusivities stay bounded, state finite."""
    import dataclasses as dc
    import jax
    from blom_tpu.drivers import standalone
    from blom_tpu.dynamics.step import blom_step

    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=8,
                                   vcoord='isopyc_bulkml')
    # allocate 2 tracer slots for TKE/GLS
    kk = 8
    H = model.grid.shape
    z = jnp.zeros((2, 2, kk) + H)
    s = dc.replace(model.state,
                   trc=z.at[:, 0].set(tk.tke_min)
                   .at[:, 1].set(tk.gls_psi_min),
                   trcold=jnp.zeros((2, kk) + H))
    par = model.par._replace(itrtke=0, itrgls=1)
    s1, dfl = jax.jit(
        lambda s: blom_step(model.grid, model.e, par, model.coeffs_i,
                            model.coeffs_j, s, model.forcing, model.dfl,
                            0, 1, jnp.asarray(180.), model.swabs))(s)
    assert np.isfinite(np.asarray(s1.trc)).all()
    wet = np.asarray(model.grid.ip) > 0
    tke_f = np.asarray(s1.trc[1, 0])[:, wet]
    assert (tke_f >= tk.tke_min - 1e-12).all()
    # the bottom friction BC raises TKE above the floor
    assert tke_f.max() > 2. * tk.tke_min
