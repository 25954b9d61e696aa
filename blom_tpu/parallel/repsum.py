"""Bit-reproducible (sharding-invariant) global reductions.

TPU-native counterpart of the reference's reproducible global sum
(reference: /root/reference/phy/mod_xc.F90:2071-2192 xcsum — fixed
(2*nbdy+1)-wide strip partial sums in fixed order, then row sums, then
a single ordered sum over rows; bit-for-bit identical for any MPI
decomposition).

Here the same fixed-order hierarchy is expressed with static Python
loops over strip/row indices, which XLA compiles to a fixed sequence of
elementwise adds.  Elementwise adds are bitwise deterministic and their
ORDER is pinned by the data flow — independent of how the arrays are
sharded over the device mesh — so a 1-device and an N-device run
produce bit-identical sums (the PE-invariance property the reference
guarantees by construction).

`jnp.sum`, by contrast, lowers to a reduction whose association order
is a compiler choice that may differ between shardings; it is NOT
reproducible across mesh shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

#: strip width, matching the reference's 2*nbdy+1 with nbdy=4
#: (mod_xc.F90:2090 mxsum strips)
STRIP = 9


def repsum_2d(a, mask=None, strip: int = STRIP):
    """Fixed-order sum of a 2-D (J, I) field in f64.

    Order: within-strip (ascending i), strips (ascending), rows
    (ascending j) — xcsum's exact hierarchy (mod_xc.F90:2112-2170)."""
    a = a.astype(jnp.float64)
    if mask is not None:
        a = a * mask.astype(jnp.float64)
    j, i = a.shape[-2], a.shape[-1]
    pad = (-i) % strip
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    nstrips = (i + pad) // strip
    a = a.reshape(a.shape[:-1] + (nstrips, strip))

    # within-strip, ascending i (elementwise over all strips/rows)
    s = a[..., 0]
    for w in range(1, strip):
        s = s + a[..., w]
    # across strips, ascending
    row = s[..., 0]
    for l in range(1, nstrips):
        row = row + s[..., l]
    # across rows, ascending j
    tot = row[..., 0]
    for jj in range(1, j):
        tot = tot + row[..., jj]
    return tot


def repsum_3d(a, mask=None, strip: int = STRIP):
    """Fixed-order sum of a (K, J, I) field: k-columns are collapsed
    first (ascending k, elementwise — still deterministic), then the
    2-D hierarchy.  Matches the reference pattern of calling xcsum on
    per-layer util arrays accumulated over k (mod_budget.F90:69-200)."""
    a = a.astype(jnp.float64)
    col = a[0]
    for k in range(1, a.shape[0]):
        col = col + a[k]
    return repsum_2d(col, mask, strip)


def repsum(a, mask=None, strip: int = STRIP):
    """Dispatch on rank: (J, I) or (K, J, I)."""
    if a.ndim == 2:
        return repsum_2d(a, mask, strip)
    if a.ndim == 3:
        return repsum_3d(a, mask, strip)
    raise ValueError(f'repsum: unsupported rank {a.ndim}')
