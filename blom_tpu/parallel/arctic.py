"""Tripolar (Arctic bipolar) fold topology.

TPU-native counterpart of the reference halo logic for tripolar grids
(/root/reference/phy/mod_xc.F90:2405-2495 single-tile fold;
:2518-2700 distributed fold), used by tnx* global grids (nreg=2).  The
top model row is the bipolar fold line: values beyond it are the
i-mirrored (and, for vectors, sign-flipped) values from below the
fold, with per-grid staggering offsets:

  p: ghost(j=jj+m, i) = s * a(jj-1-m, ii+1-i)         (":2432-2442")
  u: ghost(j=jj+m, i) = s * a(jj-1-m, ii+2-i mod ii)  (":2462-2472")
  q: row jj self-mirrors for i > ii/2 with ii+2-i; ghosts mirror jj-m
  v: row jj self-mirrors for i > ii/2 with ii+1-i; ghosts mirror jj-m

with s = -1 for vector components, +1 for scalars
(halo_ps..halo_vv types, mod_xc.F90:107-110,2420-2423).

On a device mesh the fold pairs column-shards of the top row with
their mirrors; expressed as whole-array flips XLA lowers it to a
collective permute between mirrored shards — no gather needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _mirror_p(row):
    """i -> ii+1-i (1-based) == reverse (0-based)."""
    return row[..., ::-1]


def _mirror_u(row):
    """i -> mod(ii+1-i, ii)+1 (1-based) == roll(reverse, 1)."""
    return jnp.roll(row[..., ::-1], 1, axis=-1)


def fold_row(a, kind: str = 'p', vector: bool = False, m: int = 0):
    """The ghost row m rows above the stored top row (reference halo
    index j = m+1; the reference's j=0 write lands on the stored top
    row itself and is handled by arctic_sync).

    a: (..., J, I).  kind in {'p','u','q','v'}.  Sources:
      p/u ghost jj+1+m mirrors row jj-2-m (":2432-2442,2462-2472")
      q/v ghost jj+1+m mirrors row jj-1-m (":2444-2460,2474-2492")."""
    s = -1. if vector else 1.
    if kind == 'p':
        mir = _mirror_p(a[..., -3 - m, :])
    elif kind == 'u':
        mir = _mirror_u(a[..., -3 - m, :])
    elif kind == 'q':
        mir = _mirror_u(a[..., -2 - m, :])
    elif kind == 'v':
        mir = _mirror_p(a[..., -2 - m, :])
    else:
        raise ValueError(kind)
    return s * mir


def arctic_sync(a, kind: str = 'p', vector: bool = False):
    """Enforce the fold-duplicated degrees of freedom on the top row
    (the reference's j=0 p/u ghost write and the q/v half-row
    self-mirror, mod_xc.F90:2432-2492)."""
    s = -1. if vector else 1.
    ii = a.shape[-1]
    if kind == 'p':
        top = s * _mirror_p(a[..., -2, :])
        return a.at[..., -1, :].set(top)
    if kind == 'u':
        top = s * _mirror_u(a[..., -2, :])
        return a.at[..., -1, :].set(top)
    # q/v: the top row's eastern half is the mirror of its western half
    mir = _mirror_u(a[..., -1, :]) if kind == 'q' else \
        _mirror_p(a[..., -1, :])
    idx = jnp.arange(ii)
    east = idx >= ii // 2
    top = jnp.where(east, s * mir, a[..., -1, :])
    return a.at[..., -1, :].set(top)


def jp1_arctic(a, kind: str = 'p', vector: bool = False):
    """Neighbour at j+1 on a tripolar grid: interior rows shift; the
    top row reads the fold ghost."""
    ghost = fold_row(a, kind, vector, m=0)
    return jnp.concatenate([a[..., 1:, :], ghost[..., None, :]],
                           axis=-2)
