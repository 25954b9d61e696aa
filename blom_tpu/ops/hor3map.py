"""1-D vertical reconstruction / regrid / remap library.

TPU-native re-design of the reference's HOR3MAP library
(reference: /root/reference/phy/mod_hor3map.F90 — PCM/PLM/PPM/PQM
reconstruction with monotonic/non-oscillatory limiting, regridding by
root finding, remapping by piecewise integration).

This implementation provides the PPM path (the reconstruction method of
every shipped config, tests/fuk95/limits:229) with monotonic and
non-oscillatory limiting, using explicit 4th-order nonuniform edge
estimation (an unrolled per-cell 4x4 elimination — the same linear
system the reference solves; the reference's ih4/ih6 *implicit* edge
estimation via tridiagonal solves is a planned refinement).  Everything
is dense over columns: arrays are (kk[+1], ...) with the vertical axis
leading, and the remap integral uses an O(kk^2) mask-sum formulation
instead of per-column searchsorted — elementwise VPU work instead of
gathers, which is the faster layout on TPU.

Reconstruction representation: within layer k, f(x) = c0 + c1*x + c2*x^2
for normalized x in [0, 1] (the reference stores the same polynomial
coefficients; extract_polycoeff/peval0/peval1,
mod_ale_regrid_remap.F90:141-184).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

heps = 1.e-11   # small thickness guard [Pa]

MONOTONIC = 'monotonic'
NON_OSCILLATORY = 'non_oscillatory'
NON_OSCILLATORY_POSDEF = 'non_oscillatory_posdef'


_STATIC_LOOPS = False


class static_loops:
    """Trace-time switch: run kscan loops as statically unrolled
    Python loops instead of lax.scan.  Mosaic (Pallas TPU) cannot
    lower scans with extensive inputs/outputs inside kernels; the ALE
    kernels (dynamics/ale_pallas.py) enable this around their bodies.
    The per-iteration op order is identical."""

    def __enter__(self):
        global _STATIC_LOOPS
        self.old = _STATIC_LOOPS
        _STATIC_LOOPS = True

    def __exit__(self, *exc):
        global _STATIC_LOOPS
        _STATIC_LOOPS = self.old


def kscan(body, init, xs, unroll=8):
    """Final carry of scanning `body` over the leading axis of `xs`
    (see static_loops)."""
    import jax as _jax
    if not _STATIC_LOOPS:
        final, _ = _jax.lax.scan(body, init, xs, unroll=unroll)
        return final
    length = _jax.tree_util.tree_leaves(xs)[0].shape[0]
    carry = init
    for k in range(length):
        # static slicing (lax.index_in_dim): a[k] would lower to
        # dynamic_slice, which Mosaic cannot lower inside kernels
        xk = _jax.tree_util.tree_map(
            lambda a: _jax.lax.index_in_dim(a, k, 0, keepdims=False),
            xs)
        carry, _ = body(carry, xk)
    return carry


def _shift_clamped(a, off, n_out, hi):
    """a[clip(arange(n_out) + off, 0, hi)] expressed as static
    slices + concats along axis 0.  Equivalent to an integer-array
    gather but lowers to cheap major-axis slicing on TPU (gathers
    along a non-lane axis are serialized; see PERF.md)."""
    lo_rep = max(0, -off)                # leading copies of a[0]
    hi_rep = max(0, n_out - 1 + off - hi)  # trailing copies of a[hi]
    start = max(0, off)
    stop = min(hi, n_out - 1 + off) + 1
    parts = []
    if lo_rep:
        parts.extend([a[:1]] * lo_rep)
    parts.append(a[start:stop])
    if hi_rep:
        parts.extend([a[hi:hi + 1]] * hi_rep)
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return out


class Recon(NamedTuple):
    """Piecewise-polynomial reconstruction on a source grid: parabolic
    (c3 = c4 = None) or quartic (PQM)."""
    p: jnp.ndarray      # (kk+1, ...) source interface positions
    c0: jnp.ndarray     # (kk, ...) polynomial coefficients
    c1: jnp.ndarray
    c2: jnp.ndarray
    c3: jnp.ndarray = None
    c4: jnp.ndarray = None

    def eval0(self):
        """Upper-interface values (peval0)."""
        return self.c0

    def eval1(self):
        """Lower-interface values (peval1)."""
        v = self.c0 + self.c1 + self.c2
        if self.c3 is not None:
            v = v + self.c3 + self.c4
        return v

    def deval0(self):
        """d/dx at the upper interface (dpeval0)."""
        return self.c1

    def deval1(self):
        """d/dx at the lower interface (dpeval1)."""
        v = self.c1 + 2. * self.c2
        if self.c3 is not None:
            v = v + 3. * self.c3 + 4. * self.c4
        return v


def edge4_weights(dx):
    """Per-edge stencil weights (w1..w4) of the 4th-order nonuniform
    edge estimate between cells k-1 and k from the 4-cell stencil
    (k-2, k-1, k, k+1) — the explicit solve of the same cell-mean
    moment system the reference builds (set_stencil_coeffs' 1111
    branch, mod_cppm.F90:121-200, applied vertically).  dx: (kk, ...).

    The weights depend only on the source grid, so fields sharing a
    grid (T, S, all tracers) compute them ONCE (reconstruct_multi).
    Boundary rows are folded in: one-sided 3-cell estimates for the
    outermost interior edges, cell-mean copies at the column ends."""
    kk = dx.shape[0]

    def pad(a, off):
        # value of cell k+off relative to edge position k (edge k between
        # cells k-1 and k); clamp out-of-range to nearest cell
        return _shift_clamped(a, off, kk + 1, kk - 1)

    x1 = pad(dx, -2)
    x2 = pad(dx, -1)
    x3 = pad(dx, 0)
    x4 = pad(dx, 1)

    c1_2, c1_3, c2_3, c1_4, c3_4, c1_6, c1_12 = \
        .5, 1 / 3., 2 / 3., .25, .75, 1 / 6., 1 / 12.

    a12 = -x2 - c1_2 * x1
    a22 = -c1_2 * x2
    a32 = c1_2 * x3
    a42 = x3 + c1_2 * x4
    a13 = a12 * a12 + c1_12 * x1 * x1
    a23 = -c2_3 * a22 * x2
    a33 = c2_3 * a32 * x3
    a43 = a42 * a42 + c1_12 * x4 * x4
    a14 = (a13 + c1_6 * x1 * x1) * a12
    a24 = -c3_4 * a23 * x2
    a34 = c3_4 * a33 * x3
    a44 = (a43 + c1_6 * x4 * x4) * a42

    def safe(x):
        return jnp.where(jnp.abs(x) < 1e-300, 1e-300, x)

    # full 4-cell elimination (hevc solve)
    b22 = a22 - a12
    b32 = a32 - a12
    b42 = a42 - a12
    b23 = (a23 - a13) / safe(b22)
    b33 = a33 - a13 - b23 * b32
    b43 = a43 - a13 - b23 * b42
    b24 = (a24 - a14) / safe(b22)
    b34 = a34 - a14 - b24 * b32
    b44 = a44 - a14 - b24 * b42
    b34 = b34 / safe(b33)
    b44 = b44 - b34 * b43
    h2 = -a12 + 0. * a12
    h3 = -a13 - b23 * h2
    h4 = (-a14 - b24 * h2 - b34 * h3) / safe(b44)
    h3 = (h3 - b43 * h4) / safe(b33)
    h2 = (h2 - b32 * h3 - b42 * h4) / safe(b22)
    h1 = 1. - h2 - h3 - h4

    # 3-cell one-sided estimates for edges 1 and kk-1 (0111/1110 branches)
    # 0111: cells (k-1, k, k+1)
    c32 = a32 - a22
    c42 = a42 - a22
    c33 = (a33 - a23) / safe(c32)
    c43 = a43 - a23 - c33 * c42
    g3 = -a22 + 0. * a22
    g4 = (-a23 - c33 * g3) / safe(c43)
    g3 = (g3 - c42 * g4) / safe(c32)
    g2 = 1. - g3 - g4
    # 1110: cells (k-2, k-1, k)
    d22 = a22 - a12
    d32 = a32 - a12
    d23 = (a23 - a13) / safe(d22)
    d33 = a33 - a13 - d23 * d32
    f2 = -a12 + 0. * a12
    f3 = (-a13 - d23 * f2) / safe(d33)
    f2 = (f2 - d32 * f3) / safe(d22)
    f1 = 1. - f2 - f3

    kidx = _kidx(kk + 1, 1 + ((dx.ndim - 1)))
    zero = jnp.zeros_like(h1)
    one = zero + 1.
    w1 = jnp.where(kidx == 1, zero, h1)
    w2 = jnp.where(kidx == 1, zero, h2)
    w3 = jnp.where(kidx == 1, g3, h3)
    w4 = jnp.where(kidx == 1, g4, h4)
    w2 = jnp.where(kidx == 1, g2, w2)
    w1 = jnp.where(kidx == kk - 1, f1, w1)
    w2 = jnp.where(kidx == kk - 1, f2, w2)
    w3 = jnp.where(kidx == kk - 1, f3, w3)
    w4 = jnp.where(kidx == kk - 1, zero, w4)
    # top edge: top-cell mean; bottom edge: bottom-cell mean
    top = kidx == 0
    bot = kidx == kk
    w1 = jnp.where(top | bot, zero, w1)
    w2 = jnp.where(top, zero, jnp.where(bot, one, w2))
    w3 = jnp.where(top, one, jnp.where(bot, zero, w3))
    w4 = jnp.where(top | bot, zero, w4)
    return w1, w2, w3, w4


def _edge4(dx, tm, weights=None):
    """4th-order edge estimate: apply edge4_weights to the 4-cell
    stencil of cell means.  tm: (kk, ...) -> edges (kk+1, ...)."""
    kk = tm.shape[0]
    if weights is None:
        weights = edge4_weights(dx)
    w1, w2, w3, w4 = weights
    t1 = _shift_clamped(tm, -2, kk + 1, kk - 1)
    t2 = _shift_clamped(tm, -1, kk + 1, kk - 1)
    t3 = _shift_clamped(tm, 0, kk + 1, kk - 1)
    t4 = _shift_clamped(tm, 1, kk + 1, kk - 1)
    return w1 * t1 + w2 * t2 + w3 * t3 + w4 * t4


def _kidx(kk, ndim):
    # broadcasted_iota generates directly in the target shape —
    # arange().reshape() needs a lane->sublane shape cast Mosaic
    # cannot infer inside Pallas kernels
    import jax as _jax
    return _jax.lax.broadcasted_iota(jnp.int32,
                                     (kk,) + (1,) * (ndim - 1), 0)


def _slope_clamp(tm, tel, ter, dx, apply_mask):
    """The shared slope-based edge clamp of both PPM interior limiters
    (limit_ppm_interior_monotonic, mod_hor3map.F90:1885-1907): limit
    edges by the minmod of one-sided/centered slopes on the nonuniform
    grid, flattening local extrema; applied where apply_mask holds (and
    only at interior cells — boundary cells are handled by
    _limit_boundary)."""
    kk = tm.shape[0]
    tm_m = jnp.concatenate([tm[:1], tm[:-1]], axis=0)
    tm_p = jnp.concatenate([tm[1:], tm[-1:]], axis=0)
    dx_m = jnp.concatenate([dx[:1], dx[:-1]], axis=0)
    dx_p = jnp.concatenate([dx[1:], dx[-1:]], axis=0)
    hi = 1.0 / dx
    hci = 2.0 / (dx_m + 2. * dx + dx_p)
    sl = 2. * (tm - tm_m) * hi
    sr = 2. * (tm_p - tm) * hi
    has = sl * sr > 0.
    sc0 = (tm_p - tm_m) * hci
    sc = jnp.copysign(jnp.minimum(jnp.minimum(jnp.abs(sl), jnp.abs(sr)),
                                  jnp.abs(sc0)), sc0)
    lim = .5 * dx * jnp.abs(sc)
    tel2 = jnp.where((tm_m - tel) * (tm - tel) > 0.,
                     tm - jnp.copysign(jnp.minimum(lim, jnp.abs(tel - tm)),
                                       sc), tel)
    ter2 = jnp.where((tm_p - ter) * (tm - ter) > 0.,
                     tm + jnp.copysign(jnp.minimum(lim, jnp.abs(ter - tm)),
                                       sc), ter)
    tel2 = jnp.where(has, tel2, tm)
    ter2 = jnp.where(has, ter2, tm)
    interior = (_kidx(kk, tm.ndim) >= 1) & (_kidx(kk, tm.ndim) <= kk - 2)
    m = apply_mask & interior
    return jnp.where(m, tel2, tel), jnp.where(m, ter2, ter)


def _pair_sweep(tm, tel, ter):
    """Edge-pair consistency sweep (mod_hor3map.F90:1911-1917): where the
    jump across an interior edge opposes the cell-mean difference,
    replace both one-sided edge values by their average.  Each pass
    writes tel[j] and ter[j-1] only, so the Fortran loop is
    order-independent and vectorizes exactly."""
    kk = tm.shape[0]
    tm_m = jnp.concatenate([tm[:1], tm[:-1]], axis=0)
    ter_m = jnp.concatenate([ter[:1], ter[:-1]], axis=0)
    kidx = _kidx(kk, tm.ndim)
    cond = ((tel - ter_m) * (tm - tm_m) < 0.) \
        & (kidx >= 2) & (kidx <= kk - 2)
    avg = .5 * (ter_m + tel)
    tel = jnp.where(cond, avg, tel)
    cond_p = jnp.concatenate([cond[1:], cond[-1:] & False], axis=0)
    avg_p = jnp.concatenate([avg[1:], avg[-1:]], axis=0)
    ter = jnp.where(cond_p, avg_p, ter)
    return tel, ter


def _parabola_limit(tm, tel, ter, apply_mask):
    """Overshoot limiting of the parabola interior extremum
    (mod_hor3map.F90:1919-1929), interior cells only."""
    kk = tm.shape[0]
    kidx = _kidx(kk, tm.ndim)
    d = ter - tel
    q = d * (2. * tm - tel - ter)
    r = d * d / 3.
    m = apply_mask & (kidx >= 1) & (kidx <= kk - 2)
    tel2 = jnp.where(m & (q > r), 3. * tm - 2. * ter, tel)
    ter2 = jnp.where(m & (-r > q), 3. * tm - 2. * tel, ter)
    return tel2, ter2


def _limit_boundary(tm, tel, ter, dx, pc_upper=False, pc_lower=False):
    """Boundary-cell limiting (limit_ppm_boundary,
    mod_hor3map.F90:2000-2070): don't treat boundary cells as extrema,
    but keep their parabolas monotonic within the cell."""
    kk = tm.shape[0]
    kidx = _kidx(kk, tm.ndim)

    # top (left) boundary cell 0
    flat0 = (tm[1] - ter[0]) * (tm[0] - ter[0]) > 0.
    s0 = 2. * (tm[2] - tm[1]) / (dx[1] + dx[2])
    cand0 = tm[0] + s0 * dx[0] / 3.
    uer0 = jnp.where(s0 > 0.,
                     jnp.maximum(tm[0], jnp.minimum(ter[0], cand0)),
                     jnp.minimum(tm[0], jnp.maximum(ter[0], cand0)))
    uer0 = jnp.where(flat0, tm[0], uer0)
    uel0 = jnp.where(flat0, tm[0], .5 * (3. * tm[0] - uer0))
    if pc_upper:
        uel0, uer0 = tm[0], tm[0]

    # bottom (right) boundary cell kk-1
    flat1 = (tm[kk - 1] - tel[kk - 1]) * (tm[kk - 2] - tel[kk - 1]) > 0.
    s1 = 2. * (tm[kk - 2] - tm[kk - 3]) / (dx[kk - 3] + dx[kk - 2])
    cand1 = tm[kk - 1] - s1 * dx[kk - 1] / 3.
    uel1 = jnp.where(s1 > 0.,
                     jnp.minimum(tm[kk - 1], jnp.maximum(tel[kk - 1], cand1)),
                     jnp.maximum(tm[kk - 1], jnp.minimum(tel[kk - 1], cand1)))
    uel1 = jnp.where(flat1, tm[kk - 1], uel1)
    uer1 = jnp.where(flat1, tm[kk - 1], .5 * (3. * tm[kk - 1] - uel1))
    if pc_lower:
        uel1, uer1 = tm[kk - 1], tm[kk - 1]

    tel = jnp.where(kidx == 0, uel0[None], tel)
    ter = jnp.where(kidx == 0, uer0[None], ter)
    tel = jnp.where(kidx == kk - 1, uel1[None], tel)
    ter = jnp.where(kidx == kk - 1, uer1[None], ter)
    return tel, ter


def _limit_posdef(tm, tel, ter):
    """Positive-definite parabola adjustment (limit_ppm_posdef,
    mod_hor3map.F90:2072-2098), all cells."""
    min_u_0 = jnp.minimum(tm, 0.)
    tel = jnp.maximum(tel, min_u_0)
    ter = jnp.maximum(ter, min_u_0)
    sl = 2. * (3. * tm - 2. * tel - ter)
    a2 = 3. * (tel - 2. * tm + ter)
    sr = sl + 2. * a2
    denom = 3. * sl * sr + 4. * a2 * a2
    q = 3. * tm / jnp.where(jnp.abs(denom) < 1e-300, 1e-300, denom)
    neg = (sl < 0.) & (sr > 0.) & (a2 * tel - .25 * sl * sl < a2 * min_u_0)
    tel = jnp.where(neg, sl * sl * q, tel)
    ter = jnp.where(neg, sr * sr * q, ter)
    return tel, ter


def _limit_mono(tm, tel, ter, dx):
    """PPM monotonic limiter (limit_ppm_interior_monotonic,
    mod_hor3map.F90:1872-1927), nonuniform grid, vertical axis 0.
    Interior cells only; call _limit_boundary afterwards."""
    always = jnp.ones(tm.shape, bool)
    tel, ter = _slope_clamp(tm, tel, ter, dx, always)
    tel, ter = _pair_sweep(tm, tel, ter)
    return _parabola_limit(tm, tel, ter, always)


def _limit_nosc(tm, tel, ter, dx):
    """Non-oscillatory limiting (limit_ppm_interior_non_oscillatory,
    mod_hor3map.F90:1929-1998): apply the slope clamp and parabola limit
    only where the parabola's second derivative changes sign vs a
    neighbor; the pair sweep runs unconditionally."""
    kk = tm.shape[0]
    d2 = tel - 2. * tm + ter
    d2_m = jnp.concatenate([d2[:1], d2[:-1]], axis=0)
    d2_p = jnp.concatenate([d2[1:], d2[-1:]], axis=0)
    need = (d2_m * d2 < 0.) | (d2 * d2_p < 0.)
    tel, ter = _slope_clamp(tm, tel, ter, dx, need)
    tel, ter = _pair_sweep(tm, tel, ter)
    return _parabola_limit(tm, tel, ter, need)


def ppm_reconstruct(p, tm, limiting=NON_OSCILLATORY,
                    pc_upper=False, pc_lower=False,
                    edge_weights=None) -> Recon:
    """PPM reconstruction of layer means tm on interfaces p.

    p: (kk+1, ...), tm: (kk, ...).  pc_upper/pc_lower: force piecewise-
    constant reconstruction in the top/bottom layer (the reference's
    *_pc_*_bndr options, mod_ale_regrid_remap.F90:76-81).
    edge_weights: precomputed edge4_weights(dx) when several fields
    share the source grid."""
    kk = tm.shape[0]
    dx = jnp.maximum(p[1:] - p[:-1], 0.) + heps
    e = _edge4(dx, tm, edge_weights)
    tel = e[:-1]
    ter = e[1:]

    if limiting == MONOTONIC:
        tel, ter = _limit_mono(tm, tel, ter, dx)
        tel, ter = _limit_boundary(tm, tel, ter, dx, pc_upper, pc_lower)
    elif limiting in (NON_OSCILLATORY, NON_OSCILLATORY_POSDEF):
        tel, ter = _limit_nosc(tm, tel, ter, dx)
        tel, ter = _limit_boundary(tm, tel, ter, dx, pc_upper, pc_lower)
        if limiting == NON_OSCILLATORY_POSDEF:
            tel, ter = _limit_posdef(tm, tel, ter)

    kidx = _kidx(kk, 1 + ((tm.ndim - 1)))
    pc_mask = jnp.zeros_like(tm, dtype=bool)
    if pc_upper:
        pc_mask = pc_mask | (kidx == 0)
    if pc_lower:
        pc_mask = pc_mask | (kidx == kk - 1)
    # vanishing layers: piecewise constant
    pc_mask = pc_mask | (dx <= 2. * heps)
    tel = jnp.where(pc_mask, tm, tel)
    ter = jnp.where(pc_mask, tm, ter)

    c0 = tel
    c1 = 6. * tm - 4. * tel - 2. * ter
    c2 = 3. * (tel - 2. * tm + ter)
    return Recon(p=p, c0=c0, c1=c1, c2=c2)


def ppm_reconstruct_multi(p, tms, limiting=NON_OSCILLATORY,
                          pc_upper=False, pc_lower=False):
    """PPM-reconstruct several fields sharing interfaces p, computing
    the grid-only edge stencil weights once (the reference's
    prepare_reconstruction/reconstruct split, mod_hor3map.F90:268-283:
    grid preparation is separate from per-field reconstruction).

    (A stacked-field variant was measured at bench size and performs
    the same; the per-field loop with shared weights is kept for
    simplicity.)"""
    dx = jnp.maximum(p[1:] - p[:-1], 0.) + heps
    w = edge4_weights(dx)
    return [ppm_reconstruct(p, tm, limiting, pc_upper, pc_lower,
                            edge_weights=w) for tm in tms]


def integrate_to(rc: Recon, pq):
    """I(pq) = integral of the reconstruction from the column top to
    position pq; pq: (nq, ...) broadcastable against rc arrays.

    Scan over source layers accumulating clipped partial integrals:
    O(kk*nq) elementwise work with only (nq, H) live temporaries (a dense
    (nq, kk, H) formulation would materialize GBs at production sizes)."""
    import jax

    dx = jnp.maximum(rc.p[1:] - rc.p[:-1], 0.)            # (kk, ...)
    dxi = 1.0 / jnp.maximum(dx, heps)

    c3 = jnp.zeros_like(rc.c2) if rc.c3 is None else rc.c3
    c4 = jnp.zeros_like(rc.c2) if rc.c4 is None else rc.c4

    def body(acc, xs):
        p_up, dxk, dxik, c0, c1, c2, c3k, c4k = xs
        x = jnp.clip((pq - p_up[None]) * dxik[None], 0., 1.)
        x2 = x * x
        acc = acc + dxk[None] * (c0[None] * x + .5 * c1[None] * x2
                                 + (1. / 3.) * c2[None] * x2 * x
                                 + .25 * c3k[None] * x2 * x2
                                 + .2 * c4k[None] * x2 * x2 * x)
        return acc, None

    acc0 = jnp.zeros(pq.shape, pq.dtype)
    acc, _ = jax.lax.scan(body, acc0,
                          (rc.p[:-1], dx, dxi, rc.c0, rc.c1, rc.c2,
                           c3, c4),
                          unroll=8)
    return acc


def remap_groups(groups, bottom_only_empties: bool = False):
    """Fused multi-field remap: one `lax.scan` over source layers for
    several (reconstructions, destination-grid) groups at once.

    groups: list of (rc_list, p_dst) where all Recons in rc_list share
    the same source grid rc.p, and every group has the same number of
    source layers.  Returns a list of lists of destination means,
    matching the group/tracer structure.

    Equivalent to calling remap_means per tracer (same reference
    semantics: exact piecewise-polynomial integration, point values for
    vanishing destination layers — remap, mod_hor3map.F90:4723-4790),
    but the per-layer geometry work (interface positions, clipped
    coordinates) is computed once per group and the ~4 scans per ALE
    step fuse into one, which roughly halves the remap cost on TPU
    (the op is VPU-compute-bound; carry overhead of separate scans is
    the other loss)."""
    import jax

    prep = []
    for rc_list, p_dst in groups:
        p = rc_list[0].p
        dx = jnp.maximum(p[1:] - p[:-1], 0.)
        coeffs = []
        for rc in rc_list:
            c3 = jnp.zeros_like(rc.c2) if rc.c3 is None else rc.c3
            c4 = jnp.zeros_like(rc.c2) if rc.c4 is None else rc.c4
            coeffs.append((rc.c0, rc.c1, rc.c2, c3, c4))
        prep.append((p, dx, coeffs, p_dst))

    xs = tuple((p[:-1], dx) + tuple(c for cs in coeffs for c in cs)
               for p, dx, coeffs, _ in prep)
    pqs = tuple(p_dst for _, _, _, p_dst in prep)
    # quartic terms can be dropped when every reconstruction is
    # parabolic (the PPM production path) — ~40% fewer remap flops
    parabolic = all(rc.c3 is None for rc_list, _ in groups
                    for rc in rc_list)

    if bottom_only_empties:
        # Fast path for the ALE production regrid: interior destination
        # layers are >= dpmin_interior thick (regrid_nudge's monotonic
        # clamp), so empty destination layers occur only where p_dst is
        # capped at the column bottom.  The per-edge point-value/found
        # carries (the dominant HBM traffic and flops of the general
        # scan) are then unnecessary: the collapsed layers' value is
        # the deepest wet source layer's lower-edge value.
        def init_group(g):
            _, _, coeffs, p_dst = prep[g]
            z = jnp.zeros(p_dst.shape, p_dst.dtype)
            return tuple(z for _ in coeffs)

        def body(carry, xs_k):
            new_carry = []
            for g, xg in enumerate(xs_k):
                accs = carry[g]
                p_up, dxk = xg[0], xg[1]
                pq = pqs[g]
                dxik = 1.0 / jnp.maximum(dxk, heps)
                x = jnp.clip((pq - p_up[None]) * dxik[None], 0., 1.)
                x2 = x * x
                accs2 = []
                for t in range(len(accs)):
                    c0, c1, c2, c3, c4 = xg[2 + 5 * t: 7 + 5 * t]
                    poly = (c0[None] * x + .5 * c1[None] * x2
                            + (1. / 3.) * c2[None] * x2 * x)
                    if not parabolic:
                        poly = poly + .25 * c3[None] * x2 * x2 \
                            + .2 * c4[None] * x2 * x2 * x
                    accs2.append(accs[t] + dxk[None] * poly)
                new_carry.append(tuple(accs2))
            return tuple(new_carry), None

        init = tuple(init_group(g) for g in range(len(prep)))
        final = kscan(body, init, xs)

        out = []
        for g, accs in enumerate(final):
            p, dx, coeffs, p_dst = prep[g]
            # deepest wet source layer (dx > heps) per column, as a
            # rev-free one-hot (Mosaic cannot lower `rev` in kernels):
            # the deepest wet k is the max of the wet-masked k-index
            wet = dx > heps
            kidx = _kidx(wet.shape[0], wet.ndim)
            kbot = jnp.max(jnp.where(wet, kidx, -1), axis=0)
            deepest = wet & (kidx == kbot[None])
            dpd = p_dst[1:] - p_dst[:-1]
            dpdi = 1.0 / jnp.maximum(dpd, heps)
            means_g = []
            for t, acc in enumerate(accs):
                c0, c1, c2, c3, c4 = coeffs[t]
                ev1 = c0 + c1 + c2
                if not parabolic:
                    ev1 = ev1 + c3 + c4
                botv = jnp.sum(jnp.where(deepest, ev1, 0.), axis=0)
                means = (acc[1:] - acc[:-1]) * dpdi
                means_g.append(jnp.where(dpd > heps, means, botv[None]))
            out.append(means_g)
        return out

    def init_group(g):
        _, _, coeffs, p_dst = prep[g]
        z = jnp.zeros(p_dst.shape, p_dst.dtype)
        return (tuple(z for _ in coeffs), tuple(z for _ in coeffs),
                jnp.zeros(p_dst.shape, bool))

    def body(carry, xs_k):
        new_carry = []
        for g, xg in enumerate(xs_k):
            accs, points, found = carry[g]
            p_up, dxk = xg[0], xg[1]
            pq = pqs[g]
            dxik = 1.0 / jnp.maximum(dxk, heps)
            x = jnp.clip((pq - p_up[None]) * dxik[None], 0., 1.)
            x2 = x * x
            inl = (pq >= p_up[None]) & (pq <= (p_up + dxk)[None]) \
                & (dxk[None] > heps) & (~found)
            accs2, points2 = [], []
            for t in range(len(accs)):
                c0, c1, c2, c3, c4 = xg[2 + 5 * t: 7 + 5 * t]
                acc = accs[t] + dxk[None] * (
                    c0[None] * x + .5 * c1[None] * x2
                    + (1. / 3.) * c2[None] * x2 * x
                    + .25 * c3[None] * x2 * x2
                    + .2 * c4[None] * x2 * x2 * x)
                fval = (c0[None] + c1[None] * x + c2[None] * x2
                        + c3[None] * x2 * x + c4[None] * x2 * x2)
                points2.append(jnp.where(inl, fval, points[t]))
                accs2.append(acc)
            new_carry.append((tuple(accs2), tuple(points2), found | inl))
        return tuple(new_carry), None

    init = tuple(init_group(g) for g in range(len(prep)))
    final = kscan(body, init, xs)

    out = []
    for g, (accs, points, found) in enumerate(final):
        p_dst = prep[g][3]
        dpd = p_dst[1:] - p_dst[:-1]
        dpdi = 1.0 / jnp.maximum(dpd, heps)
        means_g = []
        for acc, point in zip(accs, points):
            means = (acc[1:] - acc[:-1]) * dpdi
            point_l = jnp.where(found[:-1], point[:-1], means)
            means_g.append(jnp.where(dpd > heps, means, point_l))
        out.append(means_g)
    return out


REGRID_MVAL = -1.e33    # missing value of the regrid search
#                         (the reference's regrid_mval sentinel)


def regrid_crossings(rc: Recon, trg):
    """Pressures where a monotone piecewise-parabolic reconstruction
    crosses each target value (the reference's root-finding `regrid`,
    mod_hor3map.F90 regrid publics): for every target trg[q] the first
    layer whose edge-value interval contains it is located in a scan
    over source layers and the parabola's crossing solved analytically
    (stable quadratic form; linear fallback for vanishing curvature).
    Targets lighter than the top reconstruction / denser than the
    bottom return REGRID_MVAL.  trg: (nq, ...) broadcastable against
    rc fields; returns (nq, ...)."""
    import jax
    from jax import lax

    dx = jnp.maximum(rc.p[1:] - rc.p[:-1], 0.)
    ev0 = rc.eval0()
    ev1 = rc.eval1()

    def body(carry, xs):
        got, found = carry
        p_up, dxk, c0, c1, c2, e0, e1 = xs
        t = trg
        inl = (t >= jnp.minimum(e0, e1)[None]) \
            & (t <= jnp.maximum(e0, e1)[None]) & (~found) \
            & (dxk[None] > heps)
        # solve a x^2 + b x + c = 0 (a=c2, b=c1, c=c0-t) for the root
        # in [0, 1]; a segment monotone on [0, 1] has exactly one.
        # Stable pair: r1 = q/a, r2 = c/q with q = -(b + sign(b)*sqrt(D))/2.
        a_, b_, cc = c2[None], c1[None], c0[None] - t
        disc = jnp.maximum(b_ * b_ - 4. * a_ * cc, 0.)
        sq = jnp.sqrt(disc)
        small_a = jnp.abs(a_) < 1e-30
        small_b = jnp.abs(b_) < 1e-30
        q_ = -.5 * (b_ + jnp.sign(b_) * sq)
        r1 = q_ / jnp.where(small_a, 1., a_)
        r2 = cc / jnp.where(jnp.abs(q_) > 1e-300, q_, 1.)
        x_lin = -cc / jnp.where(small_b, 1., b_)
        x_sym = jnp.sqrt(jnp.maximum(
            -cc / jnp.where(small_a, 1., a_), 0.))   # b == 0 case
        x = jnp.where((r1 >= 0.) & (r1 <= 1.), r1, r2)
        x = jnp.where(small_b & (~small_a), x_sym, x)
        x = jnp.where(small_a, x_lin, x)
        x = jnp.clip(x, 0., 1.)
        got = jnp.where(inl, p_up[None] + x * dxk[None], got)
        return (got, found | inl), None

    init = (jnp.full(jnp.broadcast_shapes(
        trg.shape, (trg.shape[0],) + rc.c0.shape[1:]), REGRID_MVAL,
        rc.c0.dtype), jnp.zeros(
        jnp.broadcast_shapes(trg.shape,
                             (trg.shape[0],) + rc.c0.shape[1:]), bool))
    (got, found), _ = lax.scan(
        body, init, (rc.p[:-1], dx, rc.c0, rc.c1, rc.c2, ev0, ev1))
    return got


def remap_means(rc: Recon, p_dst):
    """Destination layer means: (I(p_dst[k+1]) - I(p_dst[k])) / dp_dst
    (the reference's remap, piecewise integration).  Zero-thickness
    destination layers get the point value of the reconstruction,
    gathered in the same source-layer scan."""
    import jax

    dx = jnp.maximum(rc.p[1:] - rc.p[:-1], 0.)
    dxi = 1.0 / jnp.maximum(dx, heps)
    pq = p_dst

    c3 = jnp.zeros_like(rc.c2) if rc.c3 is None else rc.c3
    c4 = jnp.zeros_like(rc.c2) if rc.c4 is None else rc.c4

    def body(carry, xs):
        acc, point, found = carry
        p_up, dxk, dxik, c0, c1, c2, c3k, c4k = xs
        x = jnp.clip((pq - p_up[None]) * dxik[None], 0., 1.)
        x2 = x * x
        acc = acc + dxk[None] * (c0[None] * x + .5 * c1[None] * x2
                                 + (1. / 3.) * c2[None] * x2 * x
                                 + .25 * c3k[None] * x2 * x2
                                 + .2 * c4k[None] * x2 * x2 * x)
        # point value at pq where it falls inside this (nonempty) layer
        inl = (pq >= p_up[None]) & (pq <= (p_up + dxk)[None]) \
            & (dxk[None] > heps) & (~found)
        fval = (c0[None] + c1[None] * x + c2[None] * x2
                + c3k[None] * x2 * x + c4k[None] * x2 * x2)
        point = jnp.where(inl, fval, point)
        found = found | inl
        return (acc, point, found), None

    acc0 = jnp.zeros(pq.shape, pq.dtype)
    (I, point, found), _ = jax.lax.scan(
        body, (acc0, acc0, jnp.zeros(pq.shape, bool)),
        (rc.p[:-1], dx, dxi, rc.c0, rc.c1, rc.c2, c3, c4), unroll=8)

    dpd = p_dst[1:] - p_dst[:-1]
    means = (I[1:] - I[:-1]) / jnp.maximum(dpd, heps)
    point_l = jnp.where(found[:-1], point[:-1], means)
    return jnp.where(dpd > heps, means, point_l)


# ------------------------------------------------------------------ #
# implicit high-order edge estimation (ih4 / ih6+ih5) and PQM
# (mod_hor3map.F90:631-1039 coefficient setup,
#  :1707-1870 tridiagonal reconstructions, :2119-2337 PQM limiting)
# ------------------------------------------------------------------ #

def _tridiag_dirichlet(tde1, tde2, rhs, e_first, e_last):
    """Solve the edge tridiagonal with unit diagonal and Dirichlet
    boundary edges (the Thomas recursion of
    reconstruct_ppm_edge_values, mod_hor3map.F90:1744-1755).

    tde1/tde2/rhs: (kk+1, ...) rows for interior edges 1..kk-1 (rows 0
    and kk are ignored); e_first/e_last: boundary edge values.
    Returns edges (kk+1, ...)."""
    import jax

    kk1 = rhs.shape[0]

    def fwd(carry, xs):
        e_prev, gam_prev = carry
        t1, t2, r = xs
        bei = 1.0 / (1.0 - t1 * gam_prev)
        e = (r - t1 * e_prev) * bei
        gam = t2 * bei
        return (e, gam), (e, gam)

    (_, _), (e_f, gam) = jax.lax.scan(
        fwd, (e_first, jnp.zeros_like(e_first)),
        (tde1[1:-1], tde2[1:-1], rhs[1:-1]), unroll=8)

    def bwd(e_next, xs):
        e, g = xs
        e2 = e - g * e_next
        return e2, e2

    _, e_b = jax.lax.scan(bwd, e_last, (e_f, gam), reverse=True,
                          unroll=8)
    return jnp.concatenate([e_first[None], e_b, e_last[None]], axis=0)


def _ih4_coeffs(h):
    """Row coefficients for the ih4 edge tridiagonal at interior edges
    (edge_ih4_coeff, mod_hor3map.F90:631-649).  h: (kk, ...); returns
    (tde1, tde2, rhs3, rhs4) at edges (kk+1, ...) (rows 0/kk unused)."""
    h1 = jnp.concatenate([h[:1], h], axis=0)     # cell above edge
    h2 = jnp.concatenate([h, h[-1:]], axis=0)    # cell below edge
    q = 1.0 / (h1 + h2)
    t1 = h2 * h2 * q * q
    t2 = h1 * h1 * q * q
    t3 = 2. * t1 * (h2 + 2. * h1) * q
    t4 = 2. * t2 * (h1 + 2. * h2) * q
    return t1, t2, t3, t4


def _boundary_poly(h, tm, ord_: int, side: str):
    """Boundary edge + slope from an ord_-cell polynomial fit
    (edge_slope_lblu/rblu, mod_hor3map.F90:913-1039): solve the moment
    system A c = u for the polynomial in the basis phi_p = xi^p / p!
    measured from the boundary edge; c[0] is the edge value, c[1] the
    slope."""
    kk = tm.shape[0]
    n = ord_
    if side == 'left':
        hs = [h[i] for i in range(n)]
        us = [tm[i] for i in range(n)]
        centers = []
        c = .5 * hs[0]
        centers.append(c)
        for i in range(1, n):
            c = c + .5 * (hs[i - 1] + hs[i])
            centers.append(c)
    else:
        hs = [h[kk - n + i] for i in range(n)]
        us = [tm[kk - n + i] for i in range(n)]
        centers = []
        c = -.5 * hs[-1]
        centers = [None] * n
        centers[n - 1] = c
        for i in range(n - 2, -1, -1):
            c = c - .5 * (hs[i + 1] + hs[i])
            centers[i] = c

    rows = []
    for i in range(n):
        a2 = centers[i]
        hh = hs[i]
        a2sq = a2 * a2
        hsq = hh * hh
        row = [jnp.ones_like(a2), a2]
        if n > 2:
            row.append(.5 * (a2sq + hsq / 12.))
        if n > 3:
            row.append((1. / 6.) * a2 * (a2sq + .25 * hsq))
        if n > 4:
            row.append((1. / 24.) * (a2sq * (a2sq + .5 * hsq)
                                     + hsq * hsq / 80.))
        if n > 5:
            row.append((1. / 120.) * a2 * (a2sq + .75 * hsq)
                       * (a2sq + hsq / 12.))
        rows.append(row)

    A = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    u = jnp.stack(us, axis=-1)[..., None]
    c = jnp.linalg.solve(A, u)[..., 0]
    return c[..., 0], c[..., 1]


def edges_ih4(p, tm, lb_ord: int = 4, rb_ord: int = 4):
    """Implicit 4th-order edge estimation (prepare_ppm +
    reconstruct_ppm_edge_values, mod_hor3map.F90:1308-1497,1707-1763):
    a tridiagonal solve along the column, vectorized over all columns.

    p: (kk+1, ...), tm: (kk, ...).  Returns edges (kk+1, ...)."""
    dx = jnp.maximum(p[1:] - p[:-1], 0.) + heps
    t1, t2, t3, t4 = _ih4_coeffs(dx)
    tm_up = jnp.concatenate([tm[:1], tm], axis=0)
    tm_lo = jnp.concatenate([tm, tm[-1:]], axis=0)
    rhs = t3 * tm_up + t4 * tm_lo
    e0, _ = _boundary_poly(dx, tm, lb_ord, 'left')
    e1, _ = _boundary_poly(dx, tm, rb_ord, 'right')
    return _tridiag_dirichlet(t1, t2, rhs, e0, e1)


def _ih6_matrices(dx):
    """Per-edge 6x6 moment matrices for the symmetric ih6/ih5 stencil
    (edge_ih6_slope_ih5_coeff_sym, mod_hor3map.F90:782-845), batched
    over edges and columns.  dx: (kk, ...); valid for interior edges
    2..kk-2 (others fall back to ih4)."""
    def at(off):
        return _shift_clamped(dx, off, dx.shape[0] + 1, dx.shape[0] - 1)

    h1, h2, h3, h4 = at(-2), at(-1), at(0), at(1)
    one = jnp.ones_like(h1)
    zer = jnp.zeros_like(h1)

    def stack_col(rows):
        return jnp.stack(rows, axis=-1)

    # column 1: -E(j-1) coefficient moments; column 2: E(j+1) ...
    c11 = [one, -h2, h2 * h2, -h2 ** 3, h2 ** 4, -h2 ** 5]
    c22 = [one, h3, h3 * h3, h3 ** 3, h3 ** 4, h3 ** 5]

    a23 = .5 * h1 + h2
    a23sq = a23 * a23
    h1sq = h1 * h1
    col3 = [-one, a23, -a23sq - h1sq / 12.,
            a23 * (a23sq + .25 * h1sq),
            -a23sq * (a23sq + .5 * h1sq) - h1sq * h1sq / 80.,
            a23 * (a23sq + .75 * h1sq) * (a23sq + h1sq / 12.)]
    col4 = [-one, .5 * h2, -h2 * h2 / 3., .25 * h2 ** 3,
            -h2 ** 4 / 5., h2 ** 5 / 6.]
    col5 = [-one, -.5 * h3, -h3 * h3 / 3., -.25 * h3 ** 3,
            -h3 ** 4 / 5., -h3 ** 5 / 6.]
    a26 = -h3 - .5 * h4
    a26sq = a26 * a26
    h4sq = h4 * h4
    col6 = [-one, a26, -a26sq - h4sq / 12.,
            a26 * (a26sq + .25 * h4sq),
            -a26sq * (a26sq + .5 * h4sq) - h4sq * h4sq / 80.,
            a26 * (a26sq + .75 * h4sq) * (a26sq + h4sq / 12.)]

    A = jnp.stack([stack_col(c11), stack_col(c22), stack_col(col3),
                   stack_col(col4), stack_col(col5), stack_col(col6)],
                  axis=-1)
    return A


def _moment_col_cell(c, h):
    """Negated mean moments -E[x^p] (p = 0..5) of the Taylor monomials
    over a cell of width h centered at signed position c relative to
    the edge — the cell columns of the ih6 moment matrices
    (edge_ih6_slope_ih5_coeff_*, mod_hor3map.F90:716-911)."""
    one = jnp.ones_like(c)
    csq = c * c
    hsq = h * h
    return [-one,
            -c,
            -(csq + hsq / 12.),
            -(c * (csq + .25 * hsq)),
            -(csq * (csq + .5 * hsq) + hsq * hsq / 80.),
            -(c * (csq + .75 * hsq) * (csq + hsq / 12.))]


def _ih6_matrices_asym(dx, side: str):
    """6x6 moment matrices for the asymmetric near-boundary stencils
    (edge_ih6_slope_ih5_coeff_asymleft/-right,
    mod_hor3map.F90:716-780,847-911), evaluated at every edge (only the
    near-boundary rows are consumed)."""
    def at(off):
        return _shift_clamped(dx, off, dx.shape[0] + 1, dx.shape[0] - 1)

    one_like = jnp.ones_like(at(0))

    def powers(x):
        return [one_like, x, x * x, x ** 3, x ** 4, x ** 5]

    if side == 'left':
        h1, h2, h3, h4 = at(-1), at(0), at(1), at(2)
        col1 = powers(-h1)                      # E at the edge above
        col2 = powers(h2)                       # E at the edge below
        col3 = _moment_col_cell(-.5 * h1, h1)            # cell e-1
        col4 = _moment_col_cell(.5 * h2, h2)             # cell e
        col5 = _moment_col_cell(h2 + .5 * h3, h3)        # cell e+1
        col6 = _moment_col_cell(h2 + h3 + .5 * h4, h4)   # cell e+2
    else:
        h1, h2, h3, h4 = at(-3), at(-2), at(-1), at(0)
        col1 = powers(-h3)
        col2 = powers(h4)
        col3 = _moment_col_cell(-(.5 * h1 + h2 + h3), h1)
        col4 = _moment_col_cell(-(.5 * h2 + h3), h2)
        col5 = _moment_col_cell(-.5 * h3, h3)
        col6 = _moment_col_cell(.5 * h4, h4)

    def stack_col(rows):
        return jnp.stack(rows, axis=-1)

    return jnp.stack([stack_col(col1), stack_col(col2), stack_col(col3),
                      stack_col(col4), stack_col(col5), stack_col(col6)],
                     axis=-1)


def edges_slopes_ih6(p, tm, lb_ord: int = 6, rb_ord: int = 4):
    """Implicit 6th/5th-order edge + slope estimation
    (reconstruct_pqm_edge_slope_values, mod_hor3map.F90:1765-1870):
    per-edge 6x6 solves give the tridiagonal row coefficients (ih4/ih3
    fallback where not diagonally dominant, prepare_pqm:1246-1266),
    then two Thomas solves along the column.

    Returns (edges, slopes): (kk+1, ...) each; slopes are per unit
    position."""
    kk = tm.shape[0]
    dx = jnp.maximum(p[1:] - p[:-1], 0.) + heps

    def solve_coeffs(A):
        rhs_e = jnp.zeros(A.shape[:-1], A.dtype).at[..., 0].set(-1.)
        ce = jnp.linalg.solve(A, rhs_e[..., None])[..., 0]
        # slope system matrix B (edge_ih6_slope_ih5_coeff_common,
        # mod_hor3map.F90:672-712)
        B = jnp.zeros_like(A)
        B = B.at[..., 0:5, 2:6].set(A[..., 1:6, 2:6])
        mult = jnp.asarray([1., 2., 3., 4., 5.], A.dtype)
        B = B.at[..., 0:5, 0].set(
            A[..., 0:5, 0] * mult.reshape((1,) * (A.ndim - 2) + (5,)))
        B = B.at[..., 0:5, 1].set(
            A[..., 0:5, 1] * mult.reshape((1,) * (A.ndim - 2) + (5,)))
        B = B.at[..., 5, 0].set(0.).at[..., 5, 1].set(0.)
        B = B.at[..., 5, 2:6].set(1.)
        cs = jnp.linalg.solve(B, rhs_e[..., None])[..., 0]
        return ce, cs

    ce, cs = solve_coeffs(_ih6_matrices(dx))
    ce_l, cs_l = solve_coeffs(_ih6_matrices_asym(dx, 'left'))
    ce_r, cs_r = solve_coeffs(_ih6_matrices_asym(dx, 'right'))

    def cellv(off):
        return _shift_clamped(tm, off, kk + 1, kk - 1)

    u_m4 = cellv(-4)
    u_m3 = cellv(-3)
    u_m2, u_m1, u_0, u_p1 = cellv(-2), cellv(-1), cellv(0), cellv(1)
    u_p2 = cellv(2)

    def rhs_of(c, us):
        return (c[..., 2] * us[0] + c[..., 3] * us[1]
                + c[..., 4] * us[2] + c[..., 5] * us[3])

    kidx = _kidx(kk + 1, 1 + ((tm.ndim - 1)))
    at_l = kidx == 1
    at_r = kidx == kk - 1

    def sel(sym, lft, rgt):
        return jnp.where(at_l, lft, jnp.where(at_r, rgt, sym))

    te1 = sel(ce[..., 0], ce_l[..., 0], ce_r[..., 0])
    te2 = sel(ce[..., 1], ce_l[..., 1], ce_r[..., 1])
    ts1 = sel(cs[..., 0], cs_l[..., 0], cs_r[..., 0])
    ts2 = sel(cs[..., 1], cs_l[..., 1], cs_r[..., 1])
    rhs_e6 = sel(rhs_of(ce, (u_m2, u_m1, u_0, u_p1)),
                 rhs_of(ce_l, (u_m1, u_0, u_p1, u_p2)),
                 rhs_of(ce_r, (u_m3, u_m2, u_m1, u_0)))
    rhs_s6 = sel(rhs_of(cs, (u_m2, u_m1, u_0, u_p1)),
                 rhs_of(cs_l, (u_m1, u_0, u_p1, u_p2)),
                 rhs_of(cs_r, (u_m3, u_m2, u_m1, u_0)))

    # ih4/ih3 fallback where the ih6/ih5 rows are not diagonally
    # dominant, and at the near-boundary edges (prepare_pqm:1246-1296)
    f1, f2, f3, f4 = _ih4_coeffs(dx)
    rhs_e4 = f3 * u_m1 + f4 * u_0
    # ih3 slopes (slope_ih3_coeff, mod_hor3map.F90:651-670)
    h1 = jnp.concatenate([dx[:1], dx], axis=0)
    h2 = jnp.concatenate([dx, dx[-1:]], axis=0)
    h11, h22, h12 = h1 * h1, h2 * h2, h1 * h2
    qs = 1.0 / ((h1 + h2) * (h11 + 3. * h12 + h22))
    s1 = h2 * (h11 + h2 * (h1 - h2)) * qs
    s2 = h1 * (h22 + h1 * (h2 - h1)) * qs
    s3 = -12. * h12 * qs
    rhs_s3 = s3 * u_m1 - s3 * u_0

    interior6 = (kidx >= 1) & (kidx <= kk - 1) & (kk > 4)
    bad = (jnp.abs(te1) + jnp.abs(te2) > 1.) \
        | (jnp.abs(ts1) + jnp.abs(ts2) > 1.) | ~interior6
    te1 = jnp.where(bad, f1, te1)
    te2 = jnp.where(bad, f2, te2)
    rhs_e6 = jnp.where(bad, rhs_e4, rhs_e6)
    ts1 = jnp.where(bad, s1, ts1)
    ts2 = jnp.where(bad, s2, ts2)
    rhs_s6 = jnp.where(bad, rhs_s3, rhs_s6)

    lb = max(2, min(lb_ord, kk))
    rb = max(2, min(rb_ord, kk))
    e0, sl0 = _boundary_poly(dx, tm, lb, 'left')
    e1, sl1 = _boundary_poly(dx, tm, rb, 'right')

    edges = _tridiag_dirichlet(te1, te2, rhs_e6, e0, e1)
    slopes = _tridiag_dirichlet(ts1, ts2, rhs_s6, sl0, sl1)
    return edges, slopes


def ppm_ih4_reconstruct(p, tm, limiting=NON_OSCILLATORY,
                        pc_upper=False, pc_lower=False,
                        lb_ord: int = 4, rb_ord: int = 4) -> Recon:
    """PPM with implicit 4th-order edges (the reference's default
    hor3map PPM path, prepare_ppm + reconstruct_ppm_edge_values)."""
    kk = tm.shape[0]
    dx = jnp.maximum(p[1:] - p[:-1], 0.) + heps
    e = edges_ih4(p, tm, lb_ord, rb_ord)
    tel, ter = e[:-1], e[1:]

    if limiting == MONOTONIC:
        tel, ter = _limit_mono(tm, tel, ter, dx)
        tel, ter = _limit_boundary(tm, tel, ter, dx, pc_upper, pc_lower)
    elif limiting in (NON_OSCILLATORY, NON_OSCILLATORY_POSDEF):
        tel, ter = _limit_nosc(tm, tel, ter, dx)
        tel, ter = _limit_boundary(tm, tel, ter, dx, pc_upper, pc_lower)
        if limiting == NON_OSCILLATORY_POSDEF:
            tel, ter = _limit_posdef(tm, tel, ter)

    kidx = _kidx(kk, 1 + ((tm.ndim - 1)))
    pc_mask = jnp.zeros_like(tm, dtype=bool)
    if pc_upper:
        pc_mask = pc_mask | (kidx == 0)
    if pc_lower:
        pc_mask = pc_mask | (kidx == kk - 1)
    pc_mask = pc_mask | (dx <= 2. * heps)
    tel = jnp.where(pc_mask, tm, tel)
    ter = jnp.where(pc_mask, tm, ter)

    return Recon(p=p, c0=tel, c1=6. * tm - 4. * tel - 2. * ter,
                 c2=3. * (tel - 2. * tm + ter))


def _limit_pqm_monotonic(tm, dx, uel, uer, usl, usr):
    """Monotonic PQM limiting (limit_pqm_monotonic,
    mod_hor3map.F90:2119-2337), dense over columns.  usl/usr are
    xi-slopes (already scaled by cell width)."""
    kk = tm.shape[0]
    tm_m = jnp.concatenate([tm[:1], tm[:-1]], axis=0)
    tm_p = jnp.concatenate([tm[1:], tm[-1:]], axis=0)
    dx_m = jnp.concatenate([dx[:1], dx[:-1]], axis=0)
    dx_p = jnp.concatenate([dx[1:], dx[-1:]], axis=0)

    hi = 1.0 / dx
    hci = 2.0 / (dx_m + 2. * dx + dx_p)
    sl = 2. * (tm - tm_m) * hi
    sr = 2. * (tm_p - tm) * hi
    sc0 = (tm_p - tm_m) * hci
    sc = jnp.sign(sc0) * jnp.minimum(
        jnp.minimum(jnp.abs(sl), jnp.abs(sr)), jnp.abs(sc0))
    has = sl * sr > 0.

    uel2 = jnp.where((tm_m - uel) * (tm - uel) > 0.,
                     tm - jnp.sign(sc) * jnp.minimum(
                         .5 * dx * jnp.abs(sc), jnp.abs(uel - tm)), uel)
    uer2 = jnp.where((tm_p - uer) * (tm - uer) > 0.,
                     tm + jnp.sign(sc) * jnp.minimum(
                         .5 * dx * jnp.abs(sc), jnp.abs(uer - tm)), uer)
    usl2 = jnp.where(usl * sc < 0., 0., usl)
    usr2 = jnp.where(usr * sc < 0., 0., usr)

    uel = jnp.where(has, uel2, tm)
    uer = jnp.where(has, uer2, tm)
    usl = jnp.where(has, usl2, 0.)
    usr = jnp.where(has, usr2, 0.)

    # inconsistent-edge fix between neighbours (:2162-2168)
    uer_m = jnp.concatenate([uer[:1], uer[:-1]], axis=0)
    fixe = (uel - uer_m) * (tm - tm_m) < 0.
    mid = .5 * (uer_m + uel)
    uel = jnp.where(fixe, mid, uel)
    # propagate to the neighbour's right edge
    fixe_p = jnp.concatenate([fixe[1:], jnp.zeros_like(fixe[-1:])],
                             axis=0)
    uel_p = jnp.concatenate([uel[1:], uel[-1:]], axis=0)
    uer = jnp.where(fixe_p, uel_p, uer)

    # inconsistent inflexion points (:2172-2264): derivative
    # coefficients of the quartic
    a0 = usl
    a1 = 2. * (30. * tm - 18. * uel - 12. * uer - 4.5 * usl + 1.5 * usr)
    a2 = 3. * (-60. * tm + 32. * uel + 28. * uer + 6. * usl - 4. * usr)
    a3 = 4. * (30. * tm - 15. * (uel + uer) - 2.5 * (usl - usr))
    b0, b1, b2 = a1, 2. * a2, 3. * a3

    ueps = 1e-14
    q1 = b0 * b2
    q2 = b1 * b1 - 4. * q1

    def dq(xi):
        return a0 + xi * (a1 + xi * (a2 + xi * a3))

    s = jnp.sqrt(jnp.maximum(q2, 0.))
    q3 = .5 / jnp.where(jnp.abs(b2) < ueps, 1., b2)
    xi_a = -(b1 + s) * q3
    xi_b = -(b1 - s) * q3
    xi_lin = -b0 / jnp.where(jnp.abs(b1) < ueps, 1., b1)

    one_inflex = b0 * (b0 + b1 + b2) < 0.
    lin_case = jnp.abs(b2) < ueps
    xi1 = jnp.where((xi_a > 0.) & (xi_a < 1.), xi_a, xi_b)
    bad_one = jnp.where(
        lin_case,
        (jnp.abs(b1) > ueps) & (dq(xi_lin) * sc < 0.),
        dq(xi1) * sc < 0.)
    bad_two = (dq(xi_a) * sc < 0.) | (dq(xi_b) * sc < 0.)
    incon = (q2 > 0.) & jnp.where(one_inflex, bad_one,
                                  (q1 > ueps) & bad_two)

    # left-leaning fix (limit_pqm_monotonic :2230-2246): cascade
    # usl -> (zero-slope / usr fix / uel fix)
    l_usl1 = (10. / 3.) * tm - (8. / 3.) * uel - (2. / 3.) * uer
    l_bad1 = l_usl1 * sc < 0.
    l_usr2 = 4. * uel + 6. * uer - 10. * tm
    l_bad2 = l_usr2 * sc < 0.
    usl_L = jnp.where(l_bad1, 0.,
                      jnp.where(l_bad2, (10. / 3.) * (uer - tm), l_usl1))
    usr_L = jnp.where(l_bad1, 20. * (tm - uel),
                      jnp.where(l_bad2, 0., l_usr2))
    uel_L = jnp.where(l_bad1, uel,
                      jnp.where(l_bad2, 2.5 * tm - 1.5 * uer, uel))
    uer_L = jnp.where(l_bad1, 5. * tm - 4. * uel, uer)

    # right-leaning fix (:2247-2263)
    r_usr1 = (8. / 3.) * uer + (2. / 3.) * uel - (10. / 3.) * tm
    r_bad1 = r_usr1 * sc < 0.
    r_usl2 = 10. * tm - 4. * uer - 6. * uel
    r_bad2 = r_usl2 * sc < 0.
    usr_R = jnp.where(r_bad1, 0.,
                      jnp.where(r_bad2, (10. / 3.) * (tm - uel), r_usr1))
    usl_R = jnp.where(r_bad1, 20. * (uer - tm),
                      jnp.where(r_bad2, 0., r_usl2))
    uer_R = jnp.where(r_bad1, uer,
                      jnp.where(r_bad2, 2.5 * tm - 1.5 * uel, uer))
    uel_R = jnp.where(r_bad1, 5. * tm - 4. * uer, uel)

    left = jnp.abs(sl) < jnp.abs(sr)
    uel_f = jnp.where(left, uel_L, uel_R)
    uer_f = jnp.where(left, uer_L, uer_R)
    usl_f = jnp.where(left, usl_L, usl_R)
    usr_f = jnp.where(left, usr_L, usr_R)

    uel = jnp.where(incon, uel_f, uel)
    uer = jnp.where(incon, uer_f, uer)
    usl = jnp.where(incon, usl_f, usl)
    usr = jnp.where(incon, usr_f, usr)

    # boundary cells (:2266-2336): not treated as extrema, but the
    # reconstruction is kept monotonic within the cell
    kk = tm.shape[0]
    kidx = _kidx(kk, 1 + ((tm.ndim - 1)))
    u2 = tm[1] if kk > 1 else tm[0]
    u3 = tm[2] if kk > 2 else tm[-1]
    pcm_top = (u2 - uer[0]) * (tm[0] - uer[0]) > 0.
    s_top = 2. * (u3 - u2) / (dx[1] + dx[2]) if kk > 2         else jnp.zeros_like(tm[0])
    cand = tm[0] + (1. / 3.) * s_top * dx[0]
    uer0 = jnp.where(s_top > 0.,
                     jnp.maximum(tm[0], jnp.minimum(uel[1], cand)),
                     jnp.minimum(tm[0], jnp.maximum(uel[1], cand)))
    uer0 = jnp.where(pcm_top, tm[0], uer0)
    uel0 = jnp.where(pcm_top, tm[0], .5 * (3. * tm[0] - uer0))
    usl0 = jnp.where(pcm_top, 0.,
                     6. * tm[0] - 4. * uel0 - 2. * uer0)
    usr0 = jnp.where(pcm_top, 0.,
                     2. * uel0 + 4. * uer0 - 6. * tm[0])

    um1 = tm[-2] if kk > 1 else tm[0]
    um2 = tm[-3] if kk > 2 else tm[0]
    pcm_bot = (tm[-1] - uel[-1]) * (um1 - uel[-1]) > 0.
    s_bot = 2. * (um1 - um2) / (dx[-3] + dx[-2]) if kk > 2         else jnp.zeros_like(tm[-1])
    candb = tm[-1] - (1. / 3.) * s_bot * dx[-1]
    uelN = jnp.where(s_bot > 0.,
                     jnp.minimum(tm[-1], jnp.maximum(uer[-2], candb)),
                     jnp.maximum(tm[-1], jnp.minimum(uer[-2], candb)))
    uelN = jnp.where(pcm_bot, tm[-1], uelN)
    uerN = jnp.where(pcm_bot, tm[-1], .5 * (3. * tm[-1] - uelN))
    uslN = jnp.where(pcm_bot, 0.,
                     6. * tm[-1] - 4. * uelN - 2. * uerN)
    usrN = jnp.where(pcm_bot, 0.,
                     2. * uelN + 4. * uerN - 6. * tm[-1])

    uel = uel.at[0].set(uel0).at[-1].set(uelN)
    uer = uer.at[0].set(uer0).at[-1].set(uerN)
    usl = usl.at[0].set(usl0).at[-1].set(uslN)
    usr = usr.at[0].set(usr0).at[-1].set(usrN)
    return uel, uer, usl, usr


def pqm_reconstruct(p, tm, limiting=MONOTONIC,
                    pc_upper=False, pc_lower=False,
                    lb_ord: int = 6, rb_ord: int = 4) -> Recon:
    """Piecewise Quartic Method reconstruction (the reference's
    hor3map PQM path: prepare_pqm + reconstruct_pqm_edge_slope_values
    + limit_pqm_*, mod_hor3map.F90:1041-1306,1765-1870,2119-2624).

    Quartic per cell in normalized xi: f = c0 + c1 xi + ... + c4 xi^4
    with f(0)=uel, f(1)=uer, f'(0)=usl, f'(1)=usr, mean=tm."""
    kk = tm.shape[0]
    dx = jnp.maximum(p[1:] - p[:-1], 0.) + heps
    edges, slopes = edges_slopes_ih6(p, tm, lb_ord, rb_ord)
    uel, uer = edges[:-1], edges[1:]
    usl = slopes[:-1] * dx     # xi-slopes (":1866-1868")
    usr = slopes[1:] * dx

    if limiting == MONOTONIC:
        uel, uer, usl, usr = _limit_pqm_monotonic(tm, dx, uel, uer,
                                                  usl, usr)
    elif limiting in (NON_OSCILLATORY, NON_OSCILLATORY_POSDEF):
        # d2-gated: only limit where curvature changes sign
        d2 = uel - 2. * tm + uer
        d2_m = jnp.concatenate([d2[:1], d2[:-1]], axis=0)
        d2_p = jnp.concatenate([d2[1:], d2[-1:]], axis=0)
        need = (d2_m * d2 <= 0.) | (d2 * d2_p <= 0.)
        uel_l, uer_l, usl_l, usr_l = _limit_pqm_monotonic(
            tm, dx, uel, uer, usl, usr)
        uel = jnp.where(need, uel_l, uel)
        uer = jnp.where(need, uer_l, uer)
        usl = jnp.where(need, usl_l, usl)
        usr = jnp.where(need, usr_l, usr)
        if limiting == NON_OSCILLATORY_POSDEF:
            uel = jnp.maximum(uel, 0.)
            uer = jnp.maximum(uer, 0.)

    kidx = _kidx(kk, 1 + ((tm.ndim - 1)))
    pc_mask = jnp.zeros_like(tm, dtype=bool)
    if pc_upper:
        pc_mask = pc_mask | (kidx == 0)
    if pc_lower:
        pc_mask = pc_mask | (kidx == kk - 1)
    pc_mask = pc_mask | (dx <= 2. * heps)
    uel = jnp.where(pc_mask, tm, uel)
    uer = jnp.where(pc_mask, tm, uer)
    usl = jnp.where(pc_mask, 0., usl)
    usr = jnp.where(pc_mask, 0., usr)

    # quartic coefficients from (uel, uer, usl, usr, mean)
    c0 = uel
    c1 = usl
    c2 = 30. * tm - 18. * uel - 12. * uer - 4.5 * usl + 1.5 * usr
    c3 = -60. * tm + 32. * uel + 28. * uer + 6. * usl - 4. * usr
    c4 = 30. * tm - 15. * (uel + uer) - 2.5 * (usl - usr)
    return Recon(p=p, c0=c0, c1=c1, c2=c2, c3=c3, c4=c4)
