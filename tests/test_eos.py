"""EOS unit tests.

Reference values computed from the published BLOM fit formulas
(/root/reference/phy/mod_eos.F90:37-54,163-436) evaluated independently
here in numpy f64; plus internal-consistency properties (inverse
round-trips, series-vs-analytic integral agreement, autodiff-vs-closed-form
derivatives) that the reference itself never tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blom_tpu.core import eos
from blom_tpu.core.constants import onem, alpha0


@pytest.fixture(scope='module')
def e():
    return eos.init_eos(pref=0.0, expcnf='fuk95')


def test_rho_reference_value():
    # Independent evaluation of the rational fit at a standard point.
    p, th, s = 2000.0 * onem, 3.0, 34.5
    p1 = (eos.a11 + (eos.a12 + eos.a14 * th + eos.a15 * s) * th
          + (eos.a13 + eos.a16 * s) * s + (eos.b11 + eos.b12 * th
                                           + eos.b13 * s) * p)
    p2 = (eos.a21 + (eos.a22 + eos.a24 * th + eos.a25 * s) * th
          + (eos.a23 + eos.a26 * s) * s + (eos.b21 + eos.b22 * th
                                           + eos.b23 * s) * p)
    assert np.isclose(float(eos.rho(p, th, s)), p1 / p2, rtol=0, atol=1e-12)
    # physically sensible in-situ density at 2 km depth
    assert 1030.0 < p1 / p2 < 1045.0


def test_rho_alp_reciprocal():
    p, th, s = 500.0 * onem, 10.0, 35.0
    assert np.isclose(float(eos.rho(p, th, s)) * float(eos.alp(p, th, s)),
                      1.0, rtol=0, atol=1e-14)


def test_sig_sig0_consistency(e):
    # With pref = 0, sig and sig0 coefficients coincide.
    th, s = np.array([2.0, 10.0, 25.0]), np.array([30.0, 35.0, 37.0])
    np.testing.assert_allclose(np.asarray(eos.sig(e, th, s)),
                               np.asarray(eos.sig0(e, th, s)), atol=1e-13)
    # sigma units: rho(0,th,s) - 1/alpha0
    np.testing.assert_allclose(
        np.asarray(eos.sig(e, th, s)),
        np.asarray(eos.rho(0.0, th, s)) - 1.0 / alpha0, atol=1e-9)


def test_tofsig_roundtrip(e):
    th = np.linspace(-1.5, 28.0, 40)
    s = np.linspace(30.0, 38.0, 40)
    sg = eos.sig(e, th, s)
    th2 = eos.tofsig(e, sg, s)
    np.testing.assert_allclose(np.asarray(th2), th, atol=1e-9)


def test_sofsig_roundtrip(e):
    th = np.linspace(-1.5, 28.0, 40)
    s = np.linspace(30.0, 38.0, 40)
    sg = eos.sig(e, th, s)
    s2 = eos.sofsig(e, sg, th)
    np.testing.assert_allclose(np.asarray(s2), s, atol=1e-9)


def test_drhodt_matches_autodiff():
    p, th, s = 1000.0 * onem, 8.0, 35.0
    g = jax.grad(lambda t: eos.rho(p, t, s))(th)
    assert np.isclose(float(eos.drhodt(p, th, s)), float(g), rtol=1e-10)


def test_drhods_matches_autodiff():
    p, th, s = 1000.0 * onem, 8.0, 35.0
    g = jax.grad(lambda x: eos.rho(p, th, x))(s)
    assert np.isclose(float(eos.drhods(p, th, s)), float(g), rtol=1e-10)


def test_dsigdt_dsigds_match_autodiff(e):
    th, s = 8.0, 35.0
    gt = jax.grad(lambda t: eos.sig(e, t, s))(th)
    gs = jax.grad(lambda x: eos.sig(e, th, x))(s)
    assert np.isclose(float(eos.dsigdt(e, th, s)), float(gt), rtol=1e-10)
    assert np.isclose(float(eos.dsigds(e, th, s)), float(gs), rtol=1e-10)


def test_dalp_matches_autodiff():
    p, th, s = 1000.0 * onem, 8.0, 35.0
    gt = jax.grad(lambda t: eos.alp(p, t, s))(th)
    gs = jax.grad(lambda x: eos.alp(p, th, x))(s)
    assert np.isclose(float(eos.dalpdt(p, th, s)), float(gt), rtol=1e-10)
    assert np.isclose(float(eos.dalpds(p, th, s)), float(gs), rtol=1e-10)


def test_p_alpha_series_vs_analytic():
    # Compare the truncated series against the exact log expression
    # (commented analytic form, mod_eos.F90:410-416).
    th, s = 5.0, 35.0
    p1v, p2v = 100.0 * onem, 3000.0 * onem
    a1 = (eos.a11 + (eos.a12 + eos.a14 * th + eos.a15 * s) * th
          + (eos.a13 + eos.a16 * s) * s)
    a2 = (eos.a21 + (eos.a22 + eos.a24 * th + eos.a25 * s) * th
          + (eos.a23 + eos.a26 * s) * s)
    b1 = eos.b11 + eos.b12 * th + eos.b13 * s
    b2 = eos.b21 + eos.b22 * th + eos.b23 * s
    exact = (b2 * (p2v - p1v)
             + (a2 - a1 * b2 / b1) * np.log((a1 + b1 * p2v)
                                            / (a1 + b1 * p1v))) / b1
    assert np.isclose(float(eos.p_alpha(p1v, p2v, th, s)), exact, rtol=1e-12)


def test_delphi_consistent_with_p_alpha():
    th, s = 5.0, 35.0
    p1v, p2v = 100.0 * onem, 3000.0 * onem
    dphi, alp1, alp2 = eos.delphi(p1v, p2v, th, s)
    assert np.isclose(float(dphi), -float(eos.p_alpha(p1v, p2v, th, s)),
                      rtol=1e-14)
    assert np.isclose(float(alp1), float(eos.alp(p1v, th, s)), rtol=1e-14)
    assert np.isclose(float(alp2), float(eos.alp(p2v, th, s)), rtol=1e-14)


def test_p_p_alpha_vs_quadrature():
    # p_p_alpha(p1,p2) = int_{p1}^{p2} int_{p1}^{p} alpha dp' dp
    th, s = 5.0, 35.0
    p1v, p2v = 0.0, 2000.0 * onem
    ps = np.linspace(p1v, p2v, 20001)
    inner = np.array([float(eos.p_alpha(p1v, p, th, s)) for p in
                      ps[:: 400]])
    ps_c = ps[::400]
    quad = np.trapezoid(inner, ps_c)
    assert np.isclose(float(eos.p_p_alpha(p1v, p2v, th, s)), quad, rtol=1e-4)


def test_dynh_derivatives_match_autodiff():
    # Dynamic enthalpy over [p1,p2] relative to p0: the derivative pair
    # returned must equal autodiff of the mean dynamic enthalpy
    #   h(th,s) = (1/(p2-p1)) d/dth int_{p1}^{p2} [phi(p0->p)] dp
    # Use the analytic relationship: mean of -p_alpha(p0,p,th,s) over p.
    p0, p1v, p2v = 0.0, 500.0 * onem, 1500.0 * onem
    th, s = 6.0, 35.2

    def mean_dynh(t, x):
        ps = jnp.linspace(p1v, p2v, 801)
        vals = jax.vmap(lambda p: eos.p_alpha(p0, p, t, x))(ps)
        return jnp.trapezoid(vals, ps) / (p2v - p1v)

    gt = jax.grad(mean_dynh, argnums=0)(th, s)
    gs = jax.grad(mean_dynh, argnums=1)(th, s)
    dt_, ds_ = eos.dynh_derivatives(p0, p1v, p2v, th, s)
    assert np.isclose(float(dt_), float(gt), rtol=1e-6)
    assert np.isclose(float(ds_), float(gs), rtol=1e-6)


def test_freeze_temperature(e):
    assert np.isclose(float(eos.tfrz(e, 35.0)), -0.0547 * 35.0)
    ec = eos.init_eos(0.0, 'cesm')
    assert np.isclose(float(eos.tfrz(ec, 35.0)), -1.8)
