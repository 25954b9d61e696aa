"""Pallas CPPM sweep kernel vs the jnp reference path.

The Pallas kernel (dynamics/cppm_pallas.py) runs cppm._cppm_sweep_body
on VMEM tiles; in interpret mode on CPU it must reproduce the jnp path
to roundoff for every kernel family, both sweep axes, open/periodic
boundaries, with and without the transverse divergence correction, and
through the large-tracer-stack chunking path."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.dynamics import cppm as cm
from blom_tpu.dynamics import cppm_pallas as cp

VARIANTS = [('full', 'non_oscillatory'), ('full', 'monotonic'),
            ('partial', 'non_oscillatory'), ('partial', 'monotonic')]


def _setup(ax, periodic, nt=3, kk=5, J=12, I=16, seed=0):
    rng = np.random.default_rng(seed)
    ip = np.ones((J, I))
    # land cells to exercise several stencil classes
    ip[3, 5] = 0.
    ip[7, 2:4] = 0.
    ip[0, 0] = 0.
    dx = rng.uniform(.6, 1.5, (J, I))
    co = cm.init_cppm_coeffs(ip, dx, axis=ax, periodic=periodic,
                             dtype=jnp.float64)
    h = rng.uniform(.2, 2., (kk, J, I))
    tm = rng.uniform(1., 4., (nt, kk, J, I))
    ca = rng.uniform(-.3, .3, (kk, J, I))
    db = rng.uniform(5., 12., (J, I))
    p = np.concatenate([np.zeros((1, J, I)), np.cumsum(h, axis=0)])
    ai = 1. / rng.uniform(.8, 1.2, (J, I))
    div = rng.uniform(-.1, .1, (kk, J, I))
    j = jnp.asarray
    return co, (j(h), j(tm), j(ca), j(db), j(p[:-1]), j(p[1:]), j(ai)), \
        j(div)


@pytest.mark.parametrize('ax', [-1, -2])
@pytest.mark.parametrize('periodic', [True, False])
@pytest.mark.parametrize('compat,lim', VARIANTS)
def test_pallas_matches_jnp(ax, periodic, compat, lim):
    co, (h, tm, ca, db, du, dl, ai), div = _setup(ax, periodic)
    for d in (None, div):
        with cm._axis(ax):
            ref = cm._cppm_sweep_body(h, tm, ca, db, du, dl, ai, co,
                                      periodic, d, compat, lim)
        out = cp.cppm_sweep_pallas(h, tm, ca, db, du, dl, ai, co,
                                   periodic, div_corr=d,
                                   compatibility=compat, limiting=lim,
                                   ax=ax, interpret=True)
        for r, o, name in zip(ref, out, ('hn', 'tmn', 'hf', 'htf')):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-12, atol=1e-12,
                                       err_msg=f'{name} ax={ax}')


def test_pallas_tracer_chunking(monkeypatch):
    """nt > _MAX_NT takes the chunked path; the positivity clamp must
    still key on the GLOBAL tracer index (itrc0 threading)."""
    monkeypatch.setattr(cp, '_MAX_NT', 2)
    co, (h, tm, ca, db, du, dl, ai), _ = _setup(-1, True, nt=5)
    with cm._axis(-1):
        ref = cm._cppm_sweep_body(h, tm, ca, db, du, dl, ai, co,
                                  True, None, 'full', 'non_oscillatory')
    out = cp.cppm_sweep_pallas(h, tm, ca, db, du, dl, ai, co, True,
                               interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-12, atol=1e-12)


def test_pallas_3d_db_ai():
    """Rank-flexible db/ai (3-D variants used by some fixtures)."""
    co, (h, tm, ca, db, du, dl, ai), _ = _setup(-1, True)
    db3 = jnp.broadcast_to(db, h.shape)
    ai3 = jnp.broadcast_to(ai, h.shape)
    with cm._axis(-1):
        ref = cm._cppm_sweep_body(h, tm, ca, db3, du, dl, ai3, co,
                                  True, None, 'full', 'non_oscillatory')
    out = cp.cppm_sweep_pallas(h, tm, ca, db3, du, dl, ai3, co, True,
                               interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-12, atol=1e-12)
