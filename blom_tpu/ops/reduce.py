"""Shape-stable (fixed-order) axis reductions.

`jnp.sum` lowers to a reduction whose association order is an XLA
choice that can vary with the array/block shape — so the same column
summed inside different shard_map block sizes can differ in the last
bit, breaking the bitwise mesh-factorization invariance contract of
the sharded step (see parallel/repsum.py for the global-sum analogue;
the reference gets this for free from its fixed Fortran loop order).

`ksum` chains the adds in ascending index order — bit-identical for
any surrounding block shape.  Use it for any k-axis (or small-axis)
sum whose result feeds prognostic state; plain `jnp.sum` remains fine
for diagnostics and for one-hot selections (exact in any order).
"""

from __future__ import annotations


def ksum(a, axis: int = 0):
    """Fixed-order (ascending-index chained) sum along `axis`."""
    axis = axis % a.ndim
    idx0 = [slice(None)] * a.ndim
    idx0[axis] = 0
    out = a[tuple(idx0)]
    for k in range(1, a.shape[axis]):
        idx = [slice(None)] * a.ndim
        idx[axis] = k
        out = out + a[tuple(idx)]
    return out
