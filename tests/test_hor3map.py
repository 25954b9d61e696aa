"""hor3map reconstruction/remap property tests.

Properties the reference's design guarantees (mod_h3.F90):
conservation under remapping, exactness for linear profiles, and
monotonicity under limiting — tested here as unit tests the reference
itself lacks (SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp

from blom_tpu.ops import hor3map as h3


def _col(pvals):
    return jnp.asarray(pvals, jnp.float64)[:, None]


def test_identity_remap():
    p = _col([0., 1., 2.5, 4., 7., 10.])
    tm = _col([1., 3., 2., 5., 4.])
    rc = h3.ppm_reconstruct(p, tm)
    out = h3.remap_means(rc, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tm), atol=1e-12)


def test_conservation_arbitrary_target():
    rng = np.random.default_rng(0)
    edges = np.concatenate([[0.], np.cumsum(rng.uniform(.5, 2., 12))])
    tm = rng.uniform(0., 10., 12)
    p = _col(edges)
    rc = h3.ppm_reconstruct(p, _col(tm))
    tgt = np.concatenate([[0.], np.sort(rng.uniform(0, edges[-1], 7)),
                          [edges[-1]]])
    out = np.asarray(h3.remap_means(rc, _col(tgt)))[:, 0]
    total_src = np.sum(tm * np.diff(edges))
    total_dst = np.sum(out * np.diff(tgt))
    np.testing.assert_allclose(total_dst, total_src, rtol=1e-12)


def test_linear_profile_exact():
    edges = np.array([0., 1., 2., 3.5, 5., 7., 9., 10.])
    mid = .5 * (edges[1:] + edges[:-1])
    tm = 2.0 + 3.0 * mid          # linear in depth
    rc = h3.ppm_reconstruct(_col(edges), _col(tm),
                            limiting=h3.MONOTONIC)
    tgt = np.array([0., .5, 2.2, 4., 6.5, 8., 10.])
    out = np.asarray(h3.remap_means(rc, _col(tgt)))[:, 0]
    midt = .5 * (tgt[1:] + tgt[:-1])
    # target layers fully inside the source interior (source boundary
    # layers use one-sided / piecewise-constant estimates) are exact
    np.testing.assert_allclose(out[2:5], 2.0 + 3.0 * midt[2:5], rtol=1e-10)


def test_monotonic_no_new_extrema():
    edges = np.linspace(0., 10., 11)
    tm = np.array([1., 1., 1., 2., 5., 9., 9.5, 9.8, 10., 10.])
    rc = h3.ppm_reconstruct(_col(edges), _col(tm),
                            limiting=h3.MONOTONIC)
    tgt = np.linspace(0., 10., 23)
    out = np.asarray(h3.remap_means(rc, _col(tgt)))[:, 0]
    assert out.min() >= tm.min() - 1e-12
    assert out.max() <= tm.max() + 1e-12


def test_zero_thickness_layers():
    # columns with vanished layers (bottom-tracking grid) must not NaN
    edges = np.array([0., 1., 2., 4., 4., 4.])
    tm = np.array([1., 2., 3., 3., 3.])
    rc = h3.ppm_reconstruct(_col(edges), _col(tm))
    tgt = np.array([0., .7, 2.4, 4., 4., 4.])
    out = np.asarray(h3.remap_means(rc, _col(tgt)))[:, 0]
    assert np.isfinite(out).all()
    total_src = np.sum(tm * np.diff(edges))
    total_dst = np.sum(out * np.diff(tgt))
    np.testing.assert_allclose(total_dst, total_src, rtol=1e-9)


def test_interface_evals():
    p = _col([0., 2., 4., 6.])
    tm = _col([1., 2., 4.])
    rc = h3.ppm_reconstruct(p, tm, limiting=h3.MONOTONIC)
    # parabola mean equals the cell mean: c0 + c1/2 + c2/3 = tm
    mean = np.asarray(rc.c0 + rc.c1 / 2 + rc.c2 / 3)
    np.testing.assert_allclose(mean, np.asarray(tm), atol=1e-12)
    # eval0/eval1 at x=0/1
    np.testing.assert_allclose(np.asarray(rc.eval0()), np.asarray(rc.c0))
    np.testing.assert_allclose(np.asarray(rc.eval1()),
                               np.asarray(rc.c0 + rc.c1 + rc.c2))


def test_remap_groups_matches_remap_means():
    """remap_groups (fused multi-field scan) must be exactly equivalent
    to per-tracer remap_means."""
    import numpy as np
    rng = np.random.default_rng(21)
    kk, H = 9, (5,)
    hsrc = rng.uniform(.3, 2., (kk,) + H)
    p = jnp.asarray(np.concatenate([np.zeros((1,) + H),
                                    np.cumsum(hsrc, 0)], 0))
    hdst = rng.uniform(0., 2., (kk,) + H)
    hdst[rng.uniform(size=(kk,) + H) < .2] = 0.
    pd = np.concatenate([np.zeros((1,) + H), np.cumsum(hdst, 0)], 0)
    pd *= np.asarray(p)[-1] / np.maximum(pd[-1], 1e-12)
    pd = jnp.asarray(pd)

    # second group: its own grids
    hsrc2 = rng.uniform(.3, 2., (kk,) + H)
    p2 = jnp.asarray(np.concatenate([np.zeros((1,) + H),
                                     np.cumsum(hsrc2, 0)], 0))
    pd2 = p2 * (1. + 0.05 * jnp.sin(jnp.arange(kk + 1))[:, None])

    tms = [jnp.asarray(rng.normal(size=(kk,) + H)) for _ in range(3)]
    rcs = [h3.ppm_ih4_reconstruct(p, tm) for tm in tms[:2]]
    rc2 = h3.ppm_reconstruct(p2, tms[2])

    got = h3.remap_groups([(rcs, pd), ([rc2], pd2)])
    want0 = h3.remap_means(rcs[0], pd)
    want1 = h3.remap_means(rcs[1], pd)
    want2 = h3.remap_means(rc2, pd2)
    np.testing.assert_allclose(np.asarray(got[0][0]), np.asarray(want0),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got[0][1]), np.asarray(want1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got[1][0]), np.asarray(want2),
                               rtol=1e-12, atol=1e-12)


def test_remap_groups_bottom_only_fast_path():
    """The ALE fast path (bottom_only_empties=True) is exactly
    equivalent to the general scan when interior destination layers are
    non-vanishing and empties occur only at the bottom cap — the
    invariant regrid_nudge's dpmin_interior clamp provides."""
    import numpy as np
    rng = np.random.default_rng(5)
    kk, H = 9, (6,)
    hsrc = rng.uniform(.3, 2., (kk,) + H)
    # a land column: zero-thickness source everywhere
    hsrc[:, 0] = 0.
    p = jnp.asarray(np.concatenate([np.zeros((1,) + H),
                                    np.cumsum(hsrc, 0)], 0))
    p_bot = np.asarray(p)[-1]
    # destination: non-vanishing interior, capped at the bottom so the
    # last few layers collapse to p_bot
    hdst = rng.uniform(.2, 2., (kk,) + H)
    pd = np.concatenate([np.zeros((1,) + H), np.cumsum(hdst, 0)], 0)
    pd = np.minimum(pd * 1.4, p_bot[None])
    pd = jnp.asarray(pd)

    tms = [jnp.asarray(rng.normal(size=(kk,) + H)) for _ in range(2)]
    rcs = [h3.ppm_reconstruct(p, tm) for tm in tms]

    slow = h3.remap_groups([(rcs, pd)])
    fast = h3.remap_groups([(rcs, pd)], bottom_only_empties=True)
    for a, b in zip(slow[0], fast[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)
