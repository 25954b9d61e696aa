"""Explicit halo exchange with ppermute and margin-k batching.

TPU-native counterpart of the reference halo machinery
(/root/reference/phy/mod_xc.F90:2342-3188 xctilr: nbdy-wide ghost
zones filled by ISEND/IRECV to the 4 tile neighbours, with per-call
margin widths; and the barotropic solver's margin-2 trick of
exchanging every 2nd substep, mod_barotp.F90:387-397).

Inside `shard_map` over a Mesh(('y','x')) each device holds one
rectangular block.  `halo_exchange` widens it by `margin` ghost cells
on each side using `lax.ppermute` ring shifts over ICI — the direct
analogue of xctilr(a, ..., mh, nh, ...).  `halo_scan` amortizes: one
margin-m exchange buys m local stencil applications, shrinking the
valid region by one cell per application (the generalized margin-k
version of the reference's every-2nd-substep exchange).

East-west is periodic (the reference's i-periodicity for nreg>=1);
north-south is closed with zero ghosts (land rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_perm(n, up: bool):
    """Source->destination pairs for a ring shift over n mesh slots."""
    if up:
        return [(i, (i + 1) % n) for i in range(n)]
    return [((i + 1) % n, i) for i in range(n)]


def halo_exchange(a, margin: int, ny: int, nx: int,
                  periodic_i: bool = True, periodic_j: bool = False):
    """Widen a local block (..., jloc, iloc) by `margin` ghost cells
    per side, filling them from the mesh neighbours (xctilr,
    mod_xc.F90:2342-3188).  Must run inside shard_map with mesh axes
    ('y', 'x').  Non-periodic edges get zero ghosts."""
    m = margin

    # --- east-west over the 'x' ring --------------------------------
    # ppermute even when nx == 1 (identity permutation): keeps the
    # 1-device program structurally identical to the multi-device one,
    # which the bitwise mesh-invariance contract depends on.
    east_edge = a[..., -m:]
    west_edge = a[..., :m]
    from_west = lax.ppermute(east_edge, 'x', _ring_perm(nx, True))
    from_east = lax.ppermute(west_edge, 'x', _ring_perm(nx, False))
    if not periodic_i:
        xi = lax.axis_index('x') if nx > 1 else 0
        zw = jnp.zeros_like(from_west)
        from_west = jnp.where(xi == 0, zw, from_west)
        from_east = jnp.where(xi == nx - 1, zw, from_east)
    a = jnp.concatenate([from_west, a, from_east], axis=-1)

    # --- north-south over the 'y' ring ------------------------------
    north_edge = a[..., -m:, :]
    south_edge = a[..., :m, :]
    from_south = lax.ppermute(north_edge, 'y', _ring_perm(ny, True))
    from_north = lax.ppermute(south_edge, 'y', _ring_perm(ny, False))
    if not periodic_j:
        yi = lax.axis_index('y') if ny > 1 else 0
        zs = jnp.zeros_like(from_south)
        from_south = jnp.where(yi == 0, zs, from_south)
        from_north = jnp.where(yi == ny - 1, zs, from_north)
    return jnp.concatenate([from_south, a, from_north], axis=-2)


def halo_scan(stencil_fn, a, nsub: int, margin: int, ny: int, nx: int,
              periodic_i: bool = True, periodic_j: bool = False):
    """Run `nsub` applications of a 5-point-stencil update exchanging
    halos only every `margin` applications (the generalized
    mod_barotp.F90:387-397 margin-2 subcycling).

    stencil_fn(block) must be a pure local update whose dependency
    radius is one cell; it is applied to the halo-widened block and the
    result's valid interior shrinks by one ring per application.  On
    non-periodic edges the out-of-domain ghosts are re-zeroed after
    every application (the Dirichlet exterior the reference encodes
    via land masks)."""

    def exterior_mask(m):
        """1 inside the global domain, 0 in out-of-domain ghosts of the
        widened block (edge shards of non-periodic axes)."""
        jj, ii = a.shape[-2] + 2 * m, a.shape[-1] + 2 * m
        msk = jnp.ones((jj, ii), a.dtype)
        if not periodic_i:
            xi = lax.axis_index('x') if nx > 1 else 0
            col = jnp.arange(ii)
            msk = msk * jnp.where((xi == 0) & (col < m)[None, :], 0., 1.)
            msk = msk * jnp.where((xi == nx - 1)
                                  & (col >= ii - m)[None, :], 0., 1.)
        if not periodic_j:
            yi = lax.axis_index('y') if ny > 1 else 0
            row = jnp.arange(jj)
            msk = msk * jnp.where((yi == 0) & (row < m)[:, None], 0., 1.)
            msk = msk * jnp.where((yi == ny - 1)
                                  & (row >= jj - m)[:, None], 0., 1.)
        return msk

    def do_round(a, m):
        wide = halo_exchange(a, m, ny, nx, periodic_i, periodic_j)
        msk = exterior_mask(m)
        for s in range(m):
            wide = stencil_fn(wide) * msk
        return wide[..., m:-m, m:-m]

    def round_body(a, _):
        return do_round(a, margin), None

    a, _ = lax.scan(round_body, a, None, length=nsub // margin)
    rem = nsub % margin
    if rem:
        a = do_round(a, rem)
    return a


def sharded_stencil(mesh: Mesh, stencil_fn, nsub: int, margin: int,
                    periodic_i: bool = True, periodic_j: bool = False):
    """Build a jitted global-array function applying `nsub` stencil
    sweeps with margin-k halo batching over the mesh."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    ny, nx = mesh.devices.shape
    spec = P('y', 'x')

    def local(a):
        return halo_scan(stencil_fn, a, nsub, margin, ny, nx,
                         periodic_i, periodic_j)

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(fn)
