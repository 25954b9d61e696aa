"""Tripolar fold, grid-file ingest, flood fill, and climatological
initial conditions."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.parallel import arctic


# ----------------------------------------------------------------- #
# arctic fold
# ----------------------------------------------------------------- #

def test_fold_p_scalar_roundtrip():
    """The p-fold is an involution: folding the ghost row of the
    mirrored field returns the original (mod_xc.F90:2432-2442)."""
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(6, 8))
    a = arctic.arctic_sync(a, 'p')
    # top row now equals the mirror of the row below
    np.testing.assert_allclose(np.asarray(a)[-1],
                               np.asarray(a)[-2][::-1])
    # and syncing twice is idempotent
    a2 = arctic.arctic_sync(a, 'p')
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a))


def test_fold_vector_sign_flip():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(6, 8))
    g = np.asarray(arctic.fold_row(a, 'p', vector=True))
    gs = np.asarray(arctic.fold_row(a, 'p', vector=False))
    np.testing.assert_allclose(g, -gs)


def test_fold_u_stagger():
    """u-points mirror with the one-point roll (io = ii+2-i)."""
    a = jnp.asarray(np.arange(48, dtype=float).reshape(6, 8))
    g = np.asarray(arctic.fold_row(a, 'u'))
    src = np.asarray(a)[-3]
    expect = np.roll(src[::-1], 1)
    np.testing.assert_allclose(g, expect)


def test_fold_qv_selfmirror():
    """q/v top row: eastern half mirrors the western half with sign
    flip for vectors (mod_xc.F90:2444-2492)."""
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(6, 8))
    v = arctic.arctic_sync(a, 'v', vector=True)
    top = np.asarray(v)[-1]
    mir = top[::-1]
    # for i >= ii/2 the value equals -mirror
    np.testing.assert_allclose(top[4:], -mir[4:])


def test_jp1_arctic_interior_matches_shift():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(6, 8))
    out = np.asarray(arctic.jp1_arctic(a, 'p'))
    np.testing.assert_allclose(out[:-1], np.asarray(a)[1:])
    # top row reads the fold ghost
    np.testing.assert_allclose(out[-1], np.asarray(a)[-3][::-1])


def test_fold_continuity_across_fold():
    """A physically continuous scalar field (function of position on
    the doubled sphere) is continuous across the fold: the ghost row
    equals the field continued past the fold line."""
    jj, ii = 8, 12
    # symmetric field about the fold: f(i, j) with fold pairing
    # (i, jj-1+m) <-> (ii+1-i, jj-m)  [1-based p-grid]
    f = np.zeros((jj, ii))
    rng = np.random.RandomState(4)
    base = rng.randn(jj, ii)
    f[:] = base
    # impose the fold symmetry on the top two rows: row jj mirrors jj-1
    f[-1] = f[-2][::-1]
    a = jnp.asarray(f)
    g = np.asarray(arctic.fold_row(a, 'p'))
    np.testing.assert_allclose(g, f[-3][::-1])


# ----------------------------------------------------------------- #
# geoenv file + flood fill
# ----------------------------------------------------------------- #

def test_geoenv_file_roundtrip(tmp_path):
    """Dump the fuk95 grid's geometry as a grid archive and rebuild an
    equivalent Grid via geoenv_file."""
    from blom_tpu.core.geoenv import geoenv_file
    from blom_tpu.drivers import standalone
    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=6)
    g = model.grid
    path = tmp_path / 'grid.npz'
    np.savez(path,
             pdx=np.asarray(g.scpx), pdy=np.asarray(g.scpy),
             udx=np.asarray(g.scux), udy=np.asarray(g.scuy),
             vdx=np.asarray(g.scvx), vdy=np.asarray(g.scvy),
             qdx=np.asarray(g.scqx), qdy=np.asarray(g.scqy),
             plat=np.asarray(g.plat), plon=np.asarray(g.plon),
             qlat=np.asarray(g.plat), pdepth=np.asarray(g.depths))
    g2 = geoenv_file(str(path), kk=6, baclin=180., periodic_i=True)
    np.testing.assert_allclose(np.asarray(g2.scp2), np.asarray(g.scp2))
    np.testing.assert_allclose(np.asarray(g2.ip), np.asarray(g.ip))
    np.testing.assert_allclose(np.asarray(g2.depths),
                               np.asarray(g.depths))


def test_fill_global():
    from blom_tpu.core.geoenv import fill_global
    a = np.full((6, 8), np.nan)
    a[2, 3] = 5.
    mask = np.ones((6, 8))
    out = fill_global(a, np.nan, mask=mask)
    np.testing.assert_allclose(out, 5.)
    # masked-out region untouched by requirement (filled or zero, but
    # wet points all get the value)
    a2 = np.full((6, 8), np.nan)
    a2[0, 0] = 1.
    a2[5, 7] = 3.
    out2 = fill_global(a2, np.nan, mask=mask)
    assert np.isfinite(out2).all()
    assert out2.min() >= 1. and out2.max() <= 3.


# ----------------------------------------------------------------- #
# climatological initial conditions
# ----------------------------------------------------------------- #

@pytest.mark.slow
def test_inicon_woa_builds_runnable_state():
    """Synthetic z-climatology -> initial state -> a few stable model
    steps (the inicon_woa_file path, mod_inicon.F90:343-561)."""
    import dataclasses
    from blom_tpu.core import init as init_mod
    from blom_tpu.core.inicon import inicon_woa
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=8)
    grid, e = model.grid, model.e
    jj, ii = grid.shape
    ksrc = 15
    bnds = np.stack([np.linspace(0., 900., ksrc),
                     np.linspace(0., 900., ksrc) + 60.], 1)
    zc = bnds.mean(1)
    t_src = np.broadcast_to(
        (20. * np.exp(-zc / 400.))[:, None, None],
        (ksrc, jj, ii)).copy()
    s_src = np.broadcast_to(
        (34. + zc / 1000.)[:, None, None], (ksrc, jj, ii)).copy()
    # punch some missing holes
    t_src[3, 5, 5] = np.nan
    s_src[3, 5, 5] = np.nan

    temp, saln, sigmar, phi = inicon_woa(grid, e, t_src, s_src, bnds)
    assert np.isfinite(temp).all() and np.isfinite(saln).all()
    # stable stratification
    assert (np.diff(sigmar, axis=0) >= -1e-12).all()
    # temperature decreases downward for this profile
    wet = np.asarray(grid.ip) > 0
    assert (temp[0][wet] > temp[-1][wet]).all()

    state = init_mod.init_state(
        grid, e, phi=phi, temp=temp, saln=saln, sigmar=sigmar,
        delt1=180., dlt=model.clock.dlt, dtype=jnp.float64, ntr=0)
    model2 = dataclasses.replace(model, state=state)
    s, clock = standalone.run(model2, 4)
    for name in ('dp', 'temp', 'saln', 'u', 'v'):
        assert np.isfinite(np.asarray(getattr(s, name))).all(), name


def test_cwmod_channel_width(tmp_path):
    """A CWMOD entry must override scuy/scvx at the named cell and the
    edge areas scu2/scv2 must follow (mod_geoenv.F90:777-862)."""
    from blom_tpu.core.geoenv import geoenv_file
    from blom_tpu.core.config import load_limits
    from blom_tpu.drivers import standalone
    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=6)
    g = model.grid
    path = tmp_path / 'grid.npz'
    np.savez(path,
             pdx=np.asarray(g.scpx), pdy=np.asarray(g.scpy),
             udx=np.asarray(g.scux), udy=np.asarray(g.scuy),
             vdx=np.asarray(g.scvx), vdy=np.asarray(g.scvy),
             qdx=np.asarray(g.scqx), qdy=np.asarray(g.scqy),
             plat=np.asarray(g.plat), plon=np.asarray(g.plon),
             qlat=np.asarray(g.plat), pdepth=np.asarray(g.depths))

    deck = tmp_path / 'limits'
    deck.write_text(
        "&CWMOD\n"
        "  CWMTAG = 'gibraltar'\n"
        "  CWMEDG = 'u'\n"
        "  CWMI = 5\n"
        "  CWMJ = 7\n"
        "  CWMWTH = 12000.\n"
        "/\n")
    cfg = load_limits(str(deck))
    assert cfg.cwmod == (('gibraltar', 'u', 5, 7, 12000.0),)

    g2 = geoenv_file(str(path), kk=6, baclin=180., periodic_i=True,
                     cwmod=cfg.cwmod)
    assert float(g2.scuy[6, 4]) == 12000.0
    np.testing.assert_allclose(float(g2.scu2[6, 4]),
                               12000.0 * float(g.scux[6, 4]))
    # untouched elsewhere
    assert float(g2.scuy[0, 0]) == float(g.scuy[0, 0])
