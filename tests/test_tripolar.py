"""Tripolar-fold dynamics tests (VERDICT r2 item 2).

A synthetic bipolar-fold grid (configs/tripolar.py) with an active
Arctic seam: the dynamics must (a) keep a fold-symmetric state
fold-symmetric WITHOUT the end-of-step sync (proving every stencil
reads correct fold ghosts), and (b) conserve mass/tracer content over
the physical cells across the seam.  Reference fold semantics:
/root/reference/phy/mod_xc.F90:2405-2700."""

import numpy as np
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.parallel import arctic


def _sym_err(s, fields=('dp', 'temp', 'saln', 'u', 'v', 'pb', 'ub',
                        'vb', 'pbu', 'pbv')):
    """Max deviation of the fold-duplicated DOFs from their mirrors."""
    err = {}
    for name in fields:
        a = getattr(s, name)
        kind, vector = arctic.STATE_KINDS[name]
        synced = arctic.arctic_sync(a, kind, vector)
        err[name] = float(np.max(np.abs(np.asarray(synced - a))))
    return err


@pytest.fixture(scope='module')
def model():
    return standalone.build_tripolar(itdm=32, jtdm=24, kdm=6)


def test_initial_state_symmetric(model):
    err = _sym_err(model.state)
    assert max(err.values()) == 0.0, err


def test_fold_symmetry_preserved_without_sync(model, monkeypatch):
    """Run steps with the end-of-step sync disabled: if every stencil
    reads correct fold ghosts, the computed state stays symmetric on
    its own (the reference gets this from xctilr by construction)."""
    m = standalone.build_tripolar(itdm=32, jtdm=24, kdm=6)
    # build (with the initial sync) first; disable only the per-step
    # end-of-step sync so the stencils have to hold symmetry themselves
    monkeypatch.setattr('blom_tpu.parallel.arctic.sync_state',
                        lambda s: s)
    s, clock = standalone.run(m, 4)
    assert np.isfinite(np.asarray(s.dp)).all()
    err = _sym_err(s)
    # bound is f64 roundoff on ~1e5-magnitude fields (relative ~1e-12);
    # a fold-logic break shows up as O(1) asymmetry
    assert max(err.values()) < 1e-6, err
    # the blob must actually move: the run is not a no-op
    assert float(np.max(np.abs(np.asarray(s.v[0])))) > 0.


def test_physical_mass_conserved_across_seam(model):
    """Total mass over the physical cells (all rows but the duplicated
    top row) is conserved while transport crosses the fold."""
    m = standalone.build_tripolar(itdm=32, jtdm=24, kdm=6)
    w = np.asarray(m.grid.scp2 * m.grid.ip)[ :-1]

    def mass(s, lev):
        return float(np.sum(np.asarray(s.dp[lev])[:, :-1] * w))

    m0 = mass(m.state, 0)
    s, clock = standalone.run(m, 6)
    m1 = mass(s, 0)
    assert abs(m1 - m0) / m0 < 1e-11

    # transport across the seam actually occurred: nonzero v on the
    # fold row (the seam edge), so the conservation check is not vacuous
    vseam = np.max(np.abs(np.asarray(s.vflx[0][:, -1, :])))
    assert vseam > 0.


def test_uniform_tracer_preserved_across_seam():
    """A uniform T/S field stays uniform through fold-crossing
    advection (no spurious seam sources)."""
    m = standalone.build_tripolar(itdm=32, jtdm=24, kdm=6)
    import dataclasses
    import jax.numpy as jnp
    s0 = m.state
    # overwrite with uniform tracers but keep the dp/velocity dynamics
    m.state = dataclasses.replace(
        s0, saln=jnp.full_like(s0.saln, 35.))
    s, clock = standalone.run(m, 4)
    wet = np.asarray(m.grid.ip) > 0
    sal = np.asarray(s.saln[0])[:, wet]
    assert np.allclose(sal, 35., atol=1e-9)
