"""CPPM sweep kernel unit tests.

Covers all four reference kernel families
(cppm_{fc,pc}_{nosc,mono}, /root/reference/phy/mod_cppm.F90:1470-2498):
conservation, uniform-tracer preservation, and limiter monotonicity on
analytic profiles — the unit coverage the Fortran reference lacks
(SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.dynamics import cppm as cm

VARIANTS = [('full', 'non_oscillatory'), ('full', 'monotonic'),
            ('partial', 'non_oscillatory'), ('partial', 'monotonic')]


def _setup(N=64, nrow=1, k=1, nt=3, seed=0, step_profile=False):
    rng = np.random.default_rng(seed)
    ip = np.ones((nrow, N))
    dx = np.ones((nrow, N))
    co = cm.init_cppm_coeffs(ip, dx, axis=-1, periodic=True,
                             dtype=jnp.float64)
    h = 1.0 + .5 * np.sin(2 * np.pi * np.arange(N) / N)
    h = np.broadcast_to(h, (k, nrow, N)).copy()
    if step_profile:
        t0 = np.where(np.arange(N) < N // 2, 1.0, 3.0)
        tm = np.broadcast_to(t0, (nt, k, nrow, N)).copy()
    else:
        tm = rng.uniform(1., 4., (nt, k, nrow, N))
    ca = np.broadcast_to(.3 + .1 * np.cos(2 * np.pi * np.arange(N) / N),
                         (k, nrow, N)).copy()
    db = np.full((k, nrow, N), 1e9)
    p = np.concatenate([np.zeros((1, nrow, N)), np.cumsum(h, axis=0)])
    ai = np.ones((nrow, N))
    args = (jnp.asarray(h), jnp.asarray(tm), jnp.asarray(ca),
            jnp.asarray(db), jnp.asarray(p[:-1]), jnp.asarray(p[1:]),
            jnp.asarray(ai))
    return co, args


@pytest.mark.parametrize('compat,lim', VARIANTS)
def test_conservation(compat, lim):
    """Mass and tracer mass are telescoping sums on a periodic ring."""
    co, (h, tm, ca, db, du, dl, ai) = _setup()
    hn, tmn, hf, htf = cm.cppm_sweep(h, tm, ca, db, du, dl, ai, co, True,
                                     compatibility=compat, limiting=lim)
    ho = jnp.maximum(0., h) + cm.dpeps
    assert np.isclose(float(jnp.sum(hn)), float(jnp.sum(ho)),
                      rtol=0, atol=1e-12)
    assert np.allclose(np.asarray(jnp.sum(hn * tmn, axis=(1, 2, 3))),
                       np.asarray(jnp.sum(ho * tm, axis=(1, 2, 3))),
                       rtol=1e-13)


@pytest.mark.parametrize('compat,lim', VARIANTS)
def test_uniform_tracer_preserved(compat, lim):
    """A spatially uniform tracer stays exactly uniform."""
    co, (h, tm, ca, db, du, dl, ai) = _setup()
    tm = jnp.full_like(tm, 2.5)
    hn, tmn, _, _ = cm.cppm_sweep(h, tm, ca, db, du, dl, ai, co, True,
                                  compatibility=compat, limiting=lim)
    assert np.allclose(np.asarray(tmn), 2.5, rtol=0, atol=1e-11)


@pytest.mark.parametrize('compat', ['full', 'partial'])
def test_monotonic_limiting_no_new_extrema(compat):
    """The monotonic limiter must not create new tracer extrema when
    advecting a step profile (the defining property of
    parabola_coeffs_*_mono, mod_cppm.F90:820-1116,1266-1371)."""
    co, (h, tm, ca, db, du, dl, ai) = _setup(step_profile=True)
    h = jnp.ones_like(h)          # uniform thickness
    du = jnp.zeros_like(du)
    dl = jnp.ones_like(dl)
    lo, hi = float(tm.min()), float(tm.max())
    for _ in range(20):
        h, tm, _, _ = cm.cppm_sweep(h, tm, ca, db, du, dl, ai, co, True,
                                    compatibility=compat,
                                    limiting='monotonic')
    assert float(tm.min()) >= lo - 1e-11
    assert float(tm.max()) <= hi + 1e-11


@pytest.mark.parametrize('compat,lim', VARIANTS)
def test_smooth_profile_accuracy(compat, lim):
    """One sweep of a smooth profile stays close to the semi-Lagrangian
    exact translation (4th-order edges: error << first-order upwind)."""
    N = 128
    co, (h, tm, ca, db, du, dl, ai) = _setup(N=N, nt=2)
    h = jnp.ones_like(h)
    du = jnp.zeros_like(du)
    dl = jnp.ones_like(dl)
    c = .25
    ca = jnp.full_like(ca, c)
    x = np.arange(N)
    prof = 2. + np.sin(2 * np.pi * x / N)
    tm = jnp.asarray(np.broadcast_to(prof, tm.shape))
    hn, tmn, _, _ = cm.cppm_sweep(h, tm, ca, db, du, dl, ai, co, True,
                                  compatibility=compat, limiting=lim)
    exact = 2. + np.sin(2 * np.pi * (x - c) / N)
    err = np.abs(np.asarray(tmn[0, 0, 0]) - exact).max()
    upwind_err = np.abs(
        (1 - c) * prof + c * np.roll(prof, 1) - exact).max()
    assert err < .2 * upwind_err
