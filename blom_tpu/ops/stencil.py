"""Neighbor-shift primitives for C-grid stencils.

TPU-native replacement for BLOM's halo-zone indexing: instead of arrays
with ±nbdy ghost cells updated by MPI halo exchange
(reference: /root/reference/phy/mod_xc.F90:2342-3188 xctilr), fields are
dense (..., jdm, idm) arrays and neighbor access is expressed with XLA
roll/shift ops.  On a single device, a periodic axis is `jnp.roll` and a
closed axis is a shift-in-zeros; under `shard_map` the same API is
provided by the halo-exchange wrappers in blom_tpu/parallel/halo.py.

Index convention follows the reference C-grid (HYCOM staggering):
u(i, j) sits between p(i-1, j) and p(i, j); v(i, j) between p(i, j-1) and
p(i, j); q(i, j) at the corner shared by p(i-1, j-1)..p(i, j)
(mod_bigrid.F90:222-243).  `im1(a)[..., j, i] == a[..., j, i-1]`, etc.
The i index is the last axis, j the second-to-last.
"""

from __future__ import annotations

import jax.numpy as jnp

AXIS_I = -1
AXIS_J = -2


def _shift(a, axis: int, offset: int, periodic: bool):
    """out[..., x] = a[..., x + offset] along `axis`.

    For non-periodic axes the vacated cells are filled with zero (land):
    the reference keeps land halos at zero and its loop masks skip them;
    here masks multiply the result instead."""
    if offset == 0:
        return a
    if periodic:
        return jnp.roll(a, -offset, axis=axis)
    # shift with zero fill: static slice + concat, NOT roll — rolls
    # along the second-to-last (sublane) axis are pathologically slow
    # to compile for the TPU backend, while pad+slice lowers cleanly
    n = a.shape[axis]

    def take(lo, hi):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(lo, hi)
        return a[tuple(idx)]

    pad_shape = list(a.shape)
    pad_shape[axis] = abs(offset)
    zeros = jnp.zeros(pad_shape, a.dtype)
    if offset > 0:
        return jnp.concatenate([take(offset, n), zeros], axis=axis)
    return jnp.concatenate([zeros, take(0, n + offset)], axis=axis)


def im1(a, periodic_i: bool):
    """a at (i-1, j)."""
    return _shift(a, AXIS_I, -1, periodic_i)


def ip1(a, periodic_i: bool):
    """a at (i+1, j)."""
    return _shift(a, AXIS_I, +1, periodic_i)


def jm1(a, periodic_j: bool):
    """a at (i, j-1)."""
    return _shift(a, AXIS_J, -1, periodic_j)


def jp1(a, periodic_j: bool):
    """a at (i, j+1)."""
    return _shift(a, AXIS_J, +1, periodic_j)


def shift(a, di: int = 0, dj: int = 0, periodic_i: bool = False,
          periodic_j: bool = False):
    """a at (i+di, j+dj)."""
    out = a
    if di:
        out = _shift(out, AXIS_I, di, periodic_i)
    if dj:
        out = _shift(out, AXIS_J, dj, periodic_j)
    return out
