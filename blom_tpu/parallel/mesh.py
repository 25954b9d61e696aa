"""Device-mesh domain decomposition.

TPU-native replacement for the reference's MPI 2-D block decomposition
(reference: /root/reference/phy/mod_xc.F90:1332-2026 xcspmd;
bld/blom_dimensions compile-time tiling).  The horizontal (j, i) axes of
every field are sharded over a `jax.sharding.Mesh('y', 'x')`; stencil
shifts (jnp.roll) on sharded axes lower to XLA collective permutes over
ICI, which reproduces the reference's halo exchange (xctilr,
mod_xc.F90:2342-3188) without explicit ghost zones.  Explicit
shard_map + margin-k halos are the planned optimization for the
barotropic subcycling (mod_barotp.F90:387-397's margin-2 trick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, shape=None) -> Mesh:
    """Build a 2-D ('y', 'x') device mesh.  With n devices and no shape,
    factorize n as close to square as possible (the reference picks its
    tile grid qr x pr the same way from the patch.input decomposition)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        ny = int(np.floor(np.sqrt(n)))
        while n % ny:
            ny -= 1
        shape = (ny, n // ny)
    devs = np.asarray(devices).reshape(shape)
    return Mesh(devs, ('y', 'x'))


def horiz_spec(ndim: int, transposed: bool = False) -> P:
    """PartitionSpec sharding the trailing (j, i) axes of an ndim array."""
    lead = (None,) * (ndim - 2)
    return P(*lead, 'x', 'y') if transposed else P(*lead, 'y', 'x')


def shard_pytree(tree, mesh: Mesh, transposed: bool = False):
    """device_put every leaf with its trailing two axes sharded."""
    def put(leaf):
        if not hasattr(leaf, 'ndim') or leaf.ndim < 2:
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, horiz_spec(leaf.ndim, transposed)))
    return jax.tree.map(put, tree)
