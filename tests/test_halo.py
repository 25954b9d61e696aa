"""Explicit shard_map halo exchange and margin-k batching: sharded
stencil sweeps must equal the dense global computation exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.parallel import halo, mesh as pmesh


def _global_step(a, periodic_i=True, periodic_j=False):
    """Dense reference: one diffusion step with the same topology."""
    def sh(x, di, dj):
        out = jnp.roll(x, (-dj, -di), axis=(-2, -1))
        if dj == 1 and not periodic_j:
            out = out.at[..., -1, :].set(0.)
        if dj == -1 and not periodic_j:
            out = out.at[..., 0, :].set(0.)
        if di == 1 and not periodic_i:
            out = out.at[..., :, -1].set(0.)
        if di == -1 and not periodic_i:
            out = out.at[..., :, 0].set(0.)
        return out
    return a + .2 * (sh(a, 1, 0) + sh(a, -1, 0) + sh(a, 0, 1)
                     + sh(a, 0, -1) - 4. * a)


def _local_step(w):
    """The same stencil on a halo-widened block: pure local rolls are
    valid because the ghosts carry the neighbour data."""
    lap = (jnp.roll(w, -1, -1) + jnp.roll(w, 1, -1)
           + jnp.roll(w, -1, -2) + jnp.roll(w, 1, -2) - 4. * w)
    return w + .2 * lap


@pytest.fixture(scope='module')
def mesh():
    return pmesh.make_mesh()


@pytest.mark.parametrize('margin,nsub', [(1, 4), (2, 4), (3, 7)])
def test_margin_k_matches_dense(mesh, margin, nsub):
    ny, nx = mesh.devices.shape
    rng = np.random.RandomState(margin)
    a = jnp.asarray(rng.randn(8 * ny, 16 * nx))

    fn = halo.sharded_stencil(mesh, _local_step, nsub, margin,
                              periodic_i=True, periodic_j=False)
    got = np.asarray(fn(a))

    want = a
    for _ in range(nsub):
        want = _global_step(want)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-13)


def test_closed_boundaries(mesh):
    ny, nx = mesh.devices.shape
    a = jnp.ones((8 * ny, 16 * nx))
    fn = halo.sharded_stencil(mesh, _local_step, 3, 3,
                              periodic_i=False, periodic_j=False)
    got = np.asarray(fn(a))
    want = a
    for _ in range(3):
        want = _global_step(want, periodic_i=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-13)


def test_exchange_is_sharded_not_gathered(mesh):
    """The jitted sharded stencil keeps its output sharded over the
    mesh (no implicit all-gather)."""
    ny, nx = mesh.devices.shape
    a = jax.device_put(
        jnp.ones((8 * ny, 16 * nx)),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec('y', 'x')))
    fn = halo.sharded_stencil(mesh, _local_step, 2, 2)
    out = fn(a)
    assert not out.sharding.is_fully_replicated
