"""Tripolar fold inside the whole-step shard_map driver.

The reference's PE-invariance guarantee covers tripolar grids: the
distributed fold is a first-class halo type for every exchange
(mod_xc.F90:2518-2700).  These tests hold the shard_map step to it:

- BITWISE mesh-factorization invariance on an arctic grid (the exact
  analogue of test_step_shmap.test_step_shmap_bitwise_across_meshes);
- agreement with the unsharded arctic blom_step to FMA/fold-recompute
  roundoff (ghost-region intermediates are recomputed on mirror data
  instead of exchanged after compute — exact for rotation-equivariant
  operators, roundoff-level otherwise; see step_shmap docstring);
- fold symmetry of the duplicated top-row DOFs preserved.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.dynamics.step import blom_step
from blom_tpu.dynamics.step_shmap import make_sharded_step
from blom_tpu.parallel import arctic, mesh as pmesh

FIELDS = ('dp', 'temp', 'saln', 'u', 'v', 'pb', 'ub', 'vb',
          'ubflxs_p', 'pb_p', 'pgfx', 'pgfy', 'uflx', 'vtflx')


def _build():
    return standalone.build_tripolar(itdm=32, jtdm=24, kdm=6)


def _run_sharded(model, mesh_shape, nsteps):
    mesh = pmesh.make_mesh(jax.devices()[:mesh_shape[0] * mesh_shape[1]],
                           shape=mesh_shape)
    step = make_sharded_step(mesh, model.grid, model.e, model.par,
                             model.coeffs_i, model.coeffs_j,
                             model.forcing, model.swabs)
    s = pmesh.shard_pytree(model.state, mesh)
    dfl = pmesh.shard_pytree(model.dfl, mesh)

    @jax.jit
    def advance(s, dfl):
        d = jnp.asarray(model.par.baclin, s.pb.dtype)
        s, dfl = step(s, dfl, 0, 1, d)
        for k in range(1, nsteps):
            mm, nn = k % 2, 1 - k % 2
            s, dfl = step(s, dfl, mm, nn, 2 * d)
        return s

    return advance(s, dfl)


def _run_unsharded(model, nsteps):
    @jax.jit
    def advance(s, dfl):
        d = jnp.asarray(model.par.baclin, s.pb.dtype)
        s, dfl = blom_step(model.grid, model.e, model.par,
                           model.coeffs_i, model.coeffs_j, s,
                           model.forcing, dfl, 0, 1, d, model.swabs)
        for k in range(1, nsteps):
            mm, nn = k % 2, 1 - k % 2
            s, dfl = blom_step(model.grid, model.e, model.par,
                               model.coeffs_i, model.coeffs_j, s,
                               model.forcing, dfl, mm, nn, 2 * d,
                               model.swabs)
        return s

    return advance(model.state, model.dfl)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
@pytest.mark.slow
def test_arctic_shmap_bitwise_across_meshes():
    """1x1 vs 2x2 vs 2x4 meshes produce BIT-IDENTICAL states after 4
    steps on a tripolar grid."""
    model = _build()
    nsteps = 4
    ref = _run_sharded(model, (2, 2), nsteps)
    for shape in ((1, 1), (2, 4), (1, 4)):
        out = _run_sharded(model, shape, nsteps)
        for name in FIELDS:
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(out, name))
            assert np.array_equal(a, b), \
                f'{name}: mesh {shape} differs from 2x2 (bitwise)'


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
@pytest.mark.slow
def test_arctic_shmap_vs_unsharded_2steps():
    """The fold-aware shard_map step matches the unsharded arctic
    blom_step to roundoff over 2 steps: O(1) localized errors at the
    seam mean a fold stagger/sign/source bug."""
    model = _build()
    ref = _run_unsharded(model, 2)
    out = _run_sharded(model, (2, 2), 2)
    scale = {'dp': 1e5, 'pb': 1e5, 'pb_p': 1e5, 'ubflxs_p': 1e6,
             'uflx': 1e9, 'vtflx': 1e10}
    for name in FIELDS:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(
            a, b, rtol=1e-7, atol=1e-7 * scale.get(name, 1.0),
            err_msg=f'{name}: arctic shard_map step deviates from '
                    'unsharded beyond fold-recompute roundoff')


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
@pytest.mark.slow
def test_arctic_shmap_fold_symmetry():
    """The duplicated top-row DOFs stay mirror-consistent after sharded
    steps (the in-step ghosts and the end-of-step block-local sync must
    agree with arctic_sync)."""
    model = _build()
    s = _run_sharded(model, (2, 2), 4)
    for name in ('dp', 'temp', 'u', 'v', 'pb', 'ub', 'vb'):
        a = np.asarray(getattr(s, name))
        kind, vector = arctic.STATE_KINDS[name]
        synced = np.asarray(arctic.arctic_sync(jnp.asarray(a), kind,
                                               vector))
        err = float(np.max(np.abs(synced - a)))
        assert err < 1e-9, f'{name}: fold asymmetry {err}'
