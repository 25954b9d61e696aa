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
    if a.shape[-1] < m or a.shape[-2] < m:
        raise ValueError(
            f'halo_exchange: local block {a.shape[-2:]} smaller than '
            f'margin {m} — use a coarser mesh or a larger grid '
            f'(ghosts would need next-nearest-neighbour data)')

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


def fold_fixup_stack(wide, margin: int, ny: int, nx: int,
                     variant, sign, src_rows):
    """Replace the top `margin` ghost rows of a halo-widened stacked
    array (N, jw, iw) with tripolar fold ghosts on the top mesh row —
    the distributed-fold branch of xctilr
    (/root/reference/phy/mod_xc.F90:2518-2700).

    Per stacked row r (static numpy metadata):
      variant[r]: 0 p-kind, 1 u, 2 v, 3 q, -1 skip (keep zero ghosts);
      sign[r]:    +1 scalar, -1 vector component (halo_uv/halo_vv);
      src_rows[r]: stack row the mirror data comes FROM (identity
        except the xixp/xixm-style fold-swap pairs).

    Ghost row g (g=0 just above the stored top row) mirrors stored row
    -3-g (p/u kinds) or -2-g (q/v kinds) of the x-MIRROR block
    (mesh column nx-1-xi), i-reversed; u/q kinds are additionally
    rolled one column east (the ii+2-i stagger, mod_xc.F90:2542-2620);
    vectors flip sign.  Must run inside shard_map over ('y','x');
    requires i-periodicity (every tripolar grid is) and local block
    height >= margin+2."""
    import numpy as np
    M = margin
    jw = wide.shape[-2]
    w = wide.shape[-1] - 2 * M          # unpadded block width
    if jw - 2 * M - 2 < 0:
        raise ValueError(
            f'tripolar fold needs local block height >= margin+2 '
            f'(got {jw - 2 * M} rows, margin {M})')

    src = wide[np.asarray(src_rows)]
    # j-flipped source rows: ghost g <- stored top row minus (2+g) for
    # p/u, minus (1+g) for q/v
    pu_rows = src[..., jw - 2 * M - 2:jw - M - 2, :][..., ::-1, :]
    qv_rows = src[..., jw - 2 * M - 1:jw - M - 1, :][..., ::-1, :]
    seg = jnp.concatenate([pu_rows, qv_rows], axis=-2)
    seg = lax.ppermute(seg, 'x', [(i, nx - 1 - i) for i in range(nx)])
    seg = seg[..., ::-1]                # i-reversal: p/v alignment
    # u/q stagger: one-column global roll east; the vacated westmost
    # ghost column is the mirror-west neighbour's column w-1
    col = lax.ppermute(seg[..., w - 1:w], 'x',
                       [(i, (i + 1) % nx) for i in range(nx)])
    seg_r = jnp.concatenate([col, seg[..., :-1]], axis=-1)

    variant = np.asarray(variant)
    sel = lambda m: jnp.asarray(m, bool)[:, None, None]  # noqa: E731
    cur_top = wide[..., jw - M:, :]
    ghost = jnp.where(sel(variant == 0), seg[..., :M, :],
                      jnp.zeros_like(cur_top))
    ghost = jnp.where(sel(variant == 1), seg_r[..., :M, :], ghost)
    ghost = jnp.where(sel(variant == 2), seg[..., M:, :], ghost)
    ghost = jnp.where(sel(variant == 3), seg_r[..., M:, :], ghost)
    ghost = ghost * jnp.asarray(np.asarray(sign), wide.dtype)[:, None, None]
    ghost = jnp.where(sel(variant < 0), cur_top, ghost)

    yi = lax.axis_index('y') if ny > 1 else 0
    top = jnp.where(yi == ny - 1, ghost, wide[..., jw - M:, :])
    return jnp.concatenate([wide[..., :jw - M, :], top], axis=-2)


def fold_sync_stack(st, ny: int, nx: int, variant, sign, src_rows):
    """Block-local arctic_sync (parallel/arctic.py): rewrite the stored
    TOP ROW's fold-duplicated degrees of freedom inside shard_map —
    p/u rows become the mirror of the row below on the mirror block;
    q/v rows self-mirror their eastern half (mod_xc.F90:2432-2492).

    st: UNWIDENED stacked blocks (N, jloc, iloc); metadata as in
    fold_fixup_stack."""
    import numpy as np
    w = st.shape[-1]
    src = st[np.asarray(src_rows)]
    seg = jnp.concatenate([src[..., -2:-1, :], src[..., -1:, :]],
                          axis=-2)      # (N, 2, w): row below + top row
    seg = lax.ppermute(seg, 'x', [(i, nx - 1 - i) for i in range(nx)])
    seg = seg[..., ::-1]
    col = lax.ppermute(seg[..., w - 1:w], 'x',
                       [(i, (i + 1) % nx) for i in range(nx)])
    seg_r = jnp.concatenate([col, seg[..., :-1]], axis=-1)

    variant = np.asarray(variant)
    sgn = jnp.asarray(np.asarray(sign), st.dtype)[:, None]
    xi = lax.axis_index('x') if nx > 1 else 0
    gcol = xi * w + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    east = gcol >= (w * nx) // 2

    sel = lambda m: jnp.asarray(m, bool)[:, None]   # noqa: E731
    cur = st[..., -1, :]
    top = jnp.where(sel(variant == 0), sgn * seg[..., 0, :], cur)
    top = jnp.where(sel(variant == 1), sgn * seg_r[..., 0, :], top)
    top = jnp.where(sel(variant == 2) & east, sgn * seg[..., 1, :], top)
    top = jnp.where(sel(variant == 3) & east, sgn * seg_r[..., 1, :],
                    top)
    yi = lax.axis_index('y') if ny > 1 else 0
    top = jnp.where(yi == ny - 1, top, cur)
    return jnp.concatenate([st[..., :-1, :], top[..., None, :]],
                           axis=-2)


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
