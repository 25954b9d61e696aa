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


# field -> (grid kind, vector?) for the prognostic state
# (the itype tags each field gets in the reference's xctilr calls,
# halo_ps..halo_vv, mod_xc.F90:107-110)
STATE_KINDS = {
    'dp': ('p', False), 'temp': ('p', False), 'saln': ('p', False),
    'sigma': ('p', False), 'sealv': ('p', False), 'pb': ('p', False),
    'pb_p': ('p', False), 'pb_mn': ('p', False), 'trc': ('p', False),
    'dpold': ('p', False), 'told': ('p', False), 'sold': ('p', False),
    'trcold': ('p', False), 'sigmar': ('p', False),
    'ustarb': ('p', False), 'phi': ('p', False), 'p': ('p', False),
    'u': ('u', True), 'dpu': ('u', False), 'dpuold': ('u', False),
    'pbu': ('u', False), 'pbu_p': ('u', False), 'pu': ('u', False),
    'ub': ('u', True), 'ubflx': ('u', True), 'ubflx_mn': ('u', True),
    'ubflxs': ('u', True), 'ubflxs_p': ('u', True),
    'ubcors_p': ('u', True), 'uflx': ('u', True), 'utflx': ('u', True),
    'usflx': ('u', True), 'cau': ('u', True), 'pgfx': ('u', True),
    'pgfx_o': ('u', True), 'pgfxm': ('u', True),
    'pgfxm_o': ('u', True),
    'v': ('v', True), 'dpv': ('v', False), 'dpvold': ('v', False),
    'pbv': ('v', False), 'pbv_p': ('v', False), 'pv': ('v', False),
    'vb': ('v', True), 'vbflx': ('v', True), 'vbflx_mn': ('v', True),
    'vbflxs': ('v', True), 'vbflxs_p': ('v', True),
    'vbcors_p': ('v', True), 'vflx': ('v', True), 'vtflx': ('v', True),
    'vsflx': ('v', True), 'cav': ('v', True), 'pgfy': ('v', True),
    'pgfy_o': ('v', True), 'pgfym': ('v', True),
    'pgfym_o': ('v', True),
    'pvtrop': ('q', False),
}


# bottom-pressure-sensitivity pairs: the mirror SWAPS the +/- roles
# with NO sign flip (the mirrored u/v-point's east/north cell is the
# original's west/south cell): xixp(jj,i) = xixm(jj-1, Mu(i)), etc.
XI_PAIRS_U = (('xixp', 'xixm'), ('xixp_o', 'xixm_o'))
XI_PAIRS_V = (('xiyp', 'xiym'), ('xiyp_o', 'xiym_o'))


def sync_xi_pair_u(a, b):
    """Top-row sync of a (xixp-like, xixm-like) pair at u-points:
    a's duplicated top row is the u-mirror of b's row below, and vice
    versa (positive swap)."""
    at = _mirror_u(b[..., -2, :])
    bt = _mirror_u(a[..., -2, :])
    return (a.at[..., -1, :].set(at), b.at[..., -1, :].set(bt))


def sync_xi_pair_v(a, b):
    """Seam-row sync of a (xiyp-like, xiym-like) pair at v-points: the
    eastern half of the top row is the p-mirror of the partner's
    western half (positive swap)."""
    ii = a.shape[-1]
    idx = jnp.arange(ii)
    east = idx >= ii // 2
    at = jnp.where(east, _mirror_p(b[..., -1, :]), a[..., -1, :])
    bt = jnp.where(east, _mirror_p(a[..., -1, :]), b[..., -1, :])
    return (a.at[..., -1, :].set(at), b.at[..., -1, :].set(bt))


def sync_state(s):
    """Enforce the fold-duplicated degrees of freedom on every tagged
    prognostic/diagnostic field of a State (the role of the reference's
    per-phase xctilr calls on a tripolar grid: the top row of p/u
    fields and the eastern half of the top row of q/v fields are
    mirror copies, mod_xc.F90:2405-2700).  Called once per step; cheap
    (top-row-only elementwise ops)."""
    import dataclasses as _dc

    updates = {}
    for name, (kind, vector) in STATE_KINDS.items():
        a = getattr(s, name, None)
        if a is None or not hasattr(a, 'ndim') or a.ndim < 2:
            continue
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        updates[name] = arctic_sync(a, kind, vector)
    for pairs, syncer in ((XI_PAIRS_U, sync_xi_pair_u),
                          (XI_PAIRS_V, sync_xi_pair_v)):
        for pa, pb in pairs:
            a = getattr(s, pa, None)
            b = getattr(s, pb, None)
            if a is None or b is None or not hasattr(a, 'ndim') \
                    or a.ndim < 2:
                continue
            updates[pa], updates[pb] = syncer(a, b)
    return _dc.replace(s, **updates)
