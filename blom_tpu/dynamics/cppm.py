"""Compatible Piecewise Parabolic Method (CPPM) advection.

TPU-native re-design of the reference CPPM transport
(reference: /root/reference/phy/mod_cppm.F90).  Strang-split 1-D sweeps
(i then j, order alternating per step, mod_cppm.F90:2748-2834) with:

- 4th-order thickness edge-value reconstruction from precomputed,
  land-stencil-aware coefficients (set_stencil_coeffs,
  mod_cppm.F90:101-320 — computed host-side at init here);
- runtime 'full compatibility' tracer edge-value coefficients from
  per-cell 4x4 LU solves (parabola_coeffs_fc_nosc, mod_cppm.F90:490-818)
  — unrolled scalar elimination, vectorized over all cells;
- non-oscillatory limiting (h_edges_nosc, mod_cppm.F90:361-434);
- upstream parabola flux integration (flux_integration,
  mod_cppm.F90:1373-1468).

Instead of the reference's per-row 1-D scratch arrays, each sweep is a
dense (ntr|k, jdm, idm) computation with shifts along the sweep axis; the
j-sweep runs the same kernel on axis-swapped arrays (the reference
permutes to (j, i) layout the same way, mod_cppm.F90:2731-2744).

All four reference kernel families are available, selected by the
`compatibility` ('full' | 'partial') and `limiting` ('non_oscillatory' |
'monotonic') arguments of `cppm_sweep`, mirroring the reference's
cppm_{fc,pc}_{nosc,mono}_{i,j} dispatch (mod_cppm.F90:1470-2498,
selection at :2748-2834):

- full + non_oscillatory: tracer edges from compatible per-cell LU
  solves; limiting gated by a d2 extrema detector
  (parabola_coeffs_fc_nosc, :490-818);
- full + monotonic: compatible edges, unconditional PPM limiting
  (parabola_coeffs_fc_mono, :820-1116);
- partial + non_oscillatory/monotonic: tracer edges from the same
  4th-order thickness coefficients (not compatible), simple parabola
  coefficients (parabola_coeffs_pc_nosc/_mono, :1118-1371).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

dpeps = 1.e-12   # small thickness (mod_cppm.F90:76)

# stencil class tags (mod_cppm.F90:60-68)
S0000, S1111, S1110, S0111, S1100, S0110, S0011, S0100, S0010 = range(9)


class CppmCoeffs(NamedTuple):
    """Per-cell sweep coefficients, sweep axis last."""
    stencil: jax.Array   # int32
    hevc: jax.Array      # (4, ...) thickness edge-value coefficients
    ssc: jax.Array       # one-sided slope coefficient
    scc: jax.Array       # centered slope coefficient
    d2m: jax.Array       # second-derivative mask
    tmc0: jax.Array      # (12, ...) tracer matrix coefficients
    tmcl: jax.Array
    tmcr: jax.Array
    dx: jax.Array = None  # grid spacing along the sweep (natural
    #                       layout; lets the Pallas kernel rebuild
    #                       tmc0/l/r in VMEM instead of loading 36
    #                       coefficient slabs — cppm_pallas._tmc_from_dx)


def _set_stencil_coeffs_np(sm, dx):
    """Host-side port of set_stencil_coeffs (mod_cppm.F90:101-320) for a
    single cell: returns (stencil, hevc[4], tmc0[12], tmcl[12], tmcr[12])."""
    c1_2, c1_3, c2_3, c1_4, c3_4 = .5, 1 / 3., 2 / 3., .25, .75
    c1_5, c1_6, c1_10, c1_12, c1_15, c1_20 = \
        1 / 5., 1 / 6., 1 / 10., 1 / 12., 1 / 15., 1 / 20.

    a12 = -dx[1] - c1_2 * dx[0]
    a22 = -c1_2 * dx[1]
    a32 = c1_2 * dx[2]
    a42 = dx[2] + c1_2 * dx[3]
    a13 = a12 * a12 + c1_12 * dx[0] * dx[0]
    a23 = -c2_3 * a22 * dx[1]
    a33 = c2_3 * a32 * dx[2]
    a43 = a42 * a42 + c1_12 * dx[3] * dx[3]
    a14 = (a13 + c1_6 * dx[0] * dx[0]) * a12
    a24 = -c3_4 * a23 * dx[1]
    a34 = c3_4 * a33 * dx[2]
    a44 = (a43 + c1_6 * dx[3] * dx[3]) * a42

    tmcl = np.zeros(12)
    tmcr = np.zeros(12)
    tmc0 = np.zeros(12)
    tmcl[0] = -c1_12 * dx[0]
    tmcl[1] = (c1_10 * dx[0] + c1_6 * dx[1]) * dx[0]
    tmcl[2] = -(c1_10 * (dx[0] + 3 * dx[1]) * dx[0]
                + c1_4 * dx[1] ** 2) * dx[0]
    tmcl[3] = -c1_12 * dx[1]
    tmcl[4] = c1_10 * dx[1] ** 2
    tmcl[5] = -c1_10 * dx[1] ** 3
    tmcl[6] = -c1_12 * dx[2]
    tmcl[7] = -c1_15 * dx[2] ** 2
    tmcl[8] = -c1_20 * dx[2] ** 3
    tmcl[9] = -c1_12 * dx[3]
    tmcl[10] = -(c1_15 * dx[3] + c1_6 * dx[2]) * dx[3]
    tmcl[11] = -(c1_5 * (c1_4 * dx[3] + dx[2]) * dx[3]
                 + c1_4 * dx[2] ** 2) * dx[3]

    tmcr[0] = c1_12 * dx[0]
    tmcr[1] = -(c1_15 * dx[0] + c1_6 * dx[1]) * dx[0]
    tmcr[2] = (c1_5 * (c1_4 * dx[0] + dx[1]) * dx[0]
               + c1_4 * dx[1] ** 2) * dx[0]
    tmcr[3] = c1_12 * dx[1]
    tmcr[4] = -c1_15 * dx[1] ** 2
    tmcr[5] = c1_20 * dx[1] ** 3
    tmcr[6] = c1_12 * dx[2]
    tmcr[7] = c1_10 * dx[2] ** 2
    tmcr[8] = c1_10 * dx[2] ** 3
    tmcr[9] = c1_12 * dx[3]
    tmcr[10] = (c1_10 * dx[3] + c1_6 * dx[2]) * dx[3]
    tmcr[11] = (c1_10 * (dx[3] + 3 * dx[2]) * dx[3]
                + c1_4 * dx[2] ** 2) * dx[3]

    tmc0[0] = a12
    tmc0[1] = a13 - tmcl[1] - tmcr[1]
    tmc0[2] = a14 - tmcl[2] - tmcr[2]
    tmc0[3] = a22
    tmc0[4] = a23 - tmcl[4] - tmcr[4]
    tmc0[5] = a24 - tmcl[5] - tmcr[5]
    tmc0[6] = a32
    tmc0[7] = a33 - tmcl[7] - tmcr[7]
    tmc0[8] = a34 - tmcl[8] - tmcr[8]
    tmc0[9] = a42
    tmc0[10] = a43 - tmcl[10] - tmcr[10]
    tmc0[11] = a44 - tmcl[11] - tmcr[11]

    sm = tuple(int(x) for x in sm)
    hevc = np.zeros(4)
    if sm == (1, 1, 1, 1):
        st = S1111
        b22 = a22 - a12
        b32 = a32 - a12
        b42 = a42 - a12
        b23 = (a23 - a13) / b22
        b33 = a33 - a13 - b23 * b32
        b43 = a43 - a13 - b23 * b42
        b24 = (a24 - a14) / b22
        b34 = a34 - a14 - b24 * b32
        b44 = a44 - a14 - b24 * b42
        b34 = b34 / b33
        b44 = b44 - b34 * b43
        h2 = -a12
        h3 = -a13 - b23 * h2
        h4 = -a14 - b24 * h2 - b34 * h3
        h4 = h4 / b44
        h3 = (h3 - b43 * h4) / b33
        h2 = (h2 - b32 * h3 - b42 * h4) / b22
        hevc[:] = [1. - h2 - h3 - h4, h2, h3, h4]
    elif sm == (1, 1, 1, 0):
        st = S1110
        b22 = a22 - a12
        b32 = a32 - a12
        b23 = (a23 - a13) / b22
        b33 = a33 - a13 - b23 * b32
        h2 = -a12
        h3 = (-a13 - b23 * h2) / b33
        h2 = (h2 - b32 * h3) / b22
        hevc[:] = [1. - h2 - h3, h2, h3, 0.]
    elif sm == (0, 1, 1, 1):
        st = S0111
        b32 = a32 - a22
        b42 = a42 - a22
        b33 = (a33 - a23) / b32
        b43 = a43 - a23 - b33 * b42
        h3 = -a22
        h4 = (-a23 - b33 * h3) / b43
        h3 = (h3 - b42 * h4) / b32
        hevc[:] = [0., 1. - h3 - h4, h3, h4]
    elif sm == (0, 1, 1, 0):
        st = S0110
        b32 = a32 - a22
        h3 = -a22 / b32
        hevc[:] = [0., 1. - h3, h3, 0.]
    elif sm[0] == 1 and sm[1] == 1:
        st = S1100
        b22 = a22 - a12
        h2 = -a12 / b22
        hevc[:] = [1. - h2, h2, 0., 0.]
    elif sm[2] == 1 and sm[3] == 1:
        st = S0011
        b42 = a42 - a32
        h4 = -a32 / b42
        hevc[:] = [0., 0., 1. - h4, h4]
    elif sm[1] == 1:
        st = S0100
        hevc[:] = [0., 1., 0., 0.]
    elif sm[2] == 1:
        st = S0010
        hevc[:] = [0., 0., 1., 0.]
    else:
        st = S0000
    return st, hevc, tmc0, tmcl, tmcr


NGHOST_ARCTIC = 3   # fold ghost rows for the j-sweep (the reference's
                    # (0,3) xctilr halo width, mod_cppm.F90:1956-1960)


def init_cppm_coeffs(ip_np: np.ndarray, dx_np: np.ndarray, axis: int,
                     periodic: bool, dtype=jnp.float64,
                     arctic: bool = False) -> CppmCoeffs:
    """Build sweep coefficients for a direction (init_cppm,
    mod_cppm.F90:2504-2746).  `ip_np` and `dx_np` are (jdm, idm); `axis`
    is the sweep axis (-1: i, -2: j).  Returned arrays have the sweep
    axis LAST for axis=-1; for axis=-2 they are returned in NATURAL
    (j, i) layout and the sweep runs along the j axis in place (no
    transposes of the 3-D state).

    With `arctic` the domain is extended by NGHOST_ARCTIC fold ghost
    rows (p-grid mirror: ghost jj+1+m = i-reversed row jj-2-m,
    mod_xc.F90:2430-2442) so the sweep sees the correct stencil across
    the bipolar seam: for axis=-2 the ghost rows join the sweep columns;
    for axis=-1 they are extra independent sweep rows whose i-stencil
    coefficients come from the mirrored geometry (used by the shard_map
    step's fold halos, step_shmap._fix_coeff_ghosts)."""
    if arctic:
        gh_ip = [ip_np[-3 - mm][::-1][None] for mm in range(NGHOST_ARCTIC)]
        gh_dx = [dx_np[-3 - mm][::-1][None] for mm in range(NGHOST_ARCTIC)]
        ip_np = np.concatenate([ip_np] + gh_ip, axis=0)
        dx_np = np.concatenate([dx_np] + gh_dx, axis=0)
    if axis == -2:
        ip_np = ip_np.T
        dx_np = dx_np.T
    nrow, ncell = ip_np.shape

    def cells(off):
        out = np.roll(ip_np, -off, axis=1)
        if not periodic:
            if off > 0:
                out[:, -off:] = 0
            elif off < 0:
                out[:, :-off] = 0
        return out

    def dxs(off):
        out = np.roll(dx_np, -off, axis=1)
        if not periodic:
            if off > 0:
                out[:, -off:] = dx_np[:, -1:]
            elif off < 0:
                out[:, :-off] = dx_np[:, :1]
        return out

    sm4 = np.stack([cells(o) for o in (-2, -1, 0, 1)], axis=-1)
    dx4 = np.stack([dxs(o) for o in (-2, -1, 0, 1)], axis=-1)

    stencil = np.zeros((nrow, ncell), np.int32)
    hevc = np.zeros((4, nrow, ncell))
    tmc0 = np.zeros((12, nrow, ncell))
    tmcl = np.zeros((12, nrow, ncell))
    tmcr = np.zeros((12, nrow, ncell))
    ssc = np.zeros((nrow, ncell))
    scc = np.zeros((nrow, ncell))
    d2m = np.zeros((nrow, ncell))

    for r in range(nrow):
        for c in range(ncell):
            st, hv, t0, tl, tr = _set_stencil_coeffs_np(sm4[r, c], dx4[r, c])
            stencil[r, c] = st
            hevc[:, r, c] = hv
            tmc0[:, r, c] = t0
            tmcl[:, r, c] = tl
            tmcr[:, r, c] = tr
    # slope coefficients / d2 mask use the 3-cell stencil (i-1, i, i+1)
    # (set_slope_coeffs / set_d2_mask, mod_cppm.F90:322-359)
    sm3 = np.stack([cells(o) for o in (-1, 0, 1)], axis=-1)
    dx3 = np.stack([dxs(o) for o in (-1, 0, 1)], axis=-1)
    wet3 = np.all(sm3 == 1, axis=-1)
    ssc = np.where(wet3, 2.0, 0.0)
    scc = np.where(wet3,
                   2.0 * dx3[..., 1] / (dx3[..., 0] + 2 * dx3[..., 1]
                                        + dx3[..., 2]),
                   0.0)
    d2m = np.where(wet3, 1.0, 0.0)

    if axis == -2:
        # back to natural (j, i) layout; the sweep reads along axis -2
        stencil = stencil.T
        hevc = hevc.swapaxes(-1, -2)
        tmc0 = tmc0.swapaxes(-1, -2)
        tmcl = tmcl.swapaxes(-1, -2)
        tmcr = tmcr.swapaxes(-1, -2)
        ssc = ssc.T
        scc = scc.T
        d2m = d2m.T

    asj = lambda a: jnp.asarray(np.ascontiguousarray(a), dtype)
    # natural-layout grid spacing for the Pallas kernel (axis=-2 work
    # arrays are transposed at this point; see dx field docstring)
    dx_nat = dx_np.T if axis == -2 else dx_np
    return CppmCoeffs(stencil=jnp.asarray(np.ascontiguousarray(stencil)),
                      hevc=asj(hevc),
                      ssc=asj(ssc), scc=asj(scc), d2m=asj(d2m),
                      tmc0=asj(tmc0), tmcl=asj(tmcl), tmcr=asj(tmcr),
                      dx=asj(dx_nat))


_SWEEP_AXIS = -1   # sweep axis for _sh; set by cppm_sweep(ax=...)


class _axis:
    """Trace-time sweep-axis context: lets the same 1-D kernel run
    along i (last axis) or j (second-to-last) without transposing the
    fields — transposes of the (k, j, i) state cost more on TPU than
    the sweep itself."""

    def __init__(self, ax):
        self.ax = ax

    def __enter__(self):
        global _SWEEP_AXIS
        self.old = _SWEEP_AXIS
        _SWEEP_AXIS = self.ax

    def __exit__(self, *exc):
        global _SWEEP_AXIS
        _SWEEP_AXIS = self.old


def _sh(a, off, periodic):
    """Value at (idx + off) along the sweep axis.

    Non-periodic shifts use static slice + zero padding rather than
    jnp.roll: rolls along the second-to-last (sublane) axis cost
    minutes of TPU compile time, while pad+slice compiles instantly
    and lowers to the same data movement."""
    ax = _SWEEP_AXIS
    if off == 0:
        return a
    n = a.shape[ax]
    if periodic:
        out = jnp.roll(a, -off, axis=ax)
        return out

    def take(lo, hi):
        idx = [slice(None)] * a.ndim
        idx[ax] = slice(lo, hi)
        return a[tuple(idx)]

    pad_shape = list(a.shape)
    pad_shape[ax] = abs(off)
    zeros = jnp.zeros(pad_shape, a.dtype)
    if off > 0:
        return jnp.concatenate([take(off, n), zeros], axis=ax)
    return jnp.concatenate([zeros, take(0, n + off)], axis=ax)


def _minmod3(sl, sr, sc):
    return jnp.sign(sc) * jnp.minimum(jnp.minimum(jnp.abs(sl), jnp.abs(sr)),
                                      jnp.abs(sc))


def _h_edges_nosc(co: CppmCoeffs, hm, periodic):
    """Thickness edge reconstruction with non-oscillatory limiting
    (h_edges_nosc, mod_cppm.F90:361-434).  hm has sweep axis last, with
    possible leading dims (k, rows)."""
    he = (co.hevc[0] * _sh(hm, -2, periodic) + co.hevc[1] * _sh(hm, -1, periodic)
          + co.hevc[2] * hm + co.hevc[3] * _sh(hm, 1, periodic))
    hel = he
    her = _sh(he, 1, periodic)

    d2h = co.d2m * (hel - 2. * hm + her)
    need = (_sh(d2h, -1, periodic) * d2h <= 0.) | (d2h * _sh(d2h, 1, periodic) <= 0.)

    hm_m = _sh(hm, -1, periodic)
    hm_p = _sh(hm, 1, periodic)
    sl = co.ssc * (hm - hm_m)
    sr = co.ssc * (hm_p - hm)
    has_slope = sl * sr > 0.
    sc = _minmod3(sl, sr, co.scc * (hm_p - hm_m))

    hel2 = jnp.where((hm_m - hel) * (hm - hel) > 0.,
                     hm - jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(hel - hm)),
                     hel)
    her2 = jnp.where((hm_p - her) * (hm - her) > 0.,
                     hm + jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(her - hm)),
                     her)
    d = her2 - hel2
    q = d * (2. * hm - hel2 - her2)
    r = d * d / 3.
    hel3 = jnp.where(q > r, 3. * hm - 2. * her2, hel2)
    her3 = jnp.where(-r > q, 3. * hm - 2. * hel2, her2)

    hel_l = jnp.where(has_slope, hel3, hm)
    her_l = jnp.where(has_slope, her3, hm)
    hel = jnp.where(need, hel_l, hel)
    her = jnp.where(need, her_l, her)

    # positivity of the parabola (mod_cppm.F90:418-430)
    hel = jnp.maximum(hel, dpeps)
    her = jnp.maximum(her, dpeps)
    sl = 2. * (3. * hm - 2. * hel - her)
    a2 = 3. * (hel - 2. * hm + her)
    sr = sl + 2. * a2
    cond = (sl < 0.) & (sr > 0.) & (a2 * hel - .25 * sl * sl < a2 * dpeps)
    qq = 3. * hm / (3. * sl * sr + 4. * a2 * a2)
    hel = jnp.where(cond, sl * sl * qq, hel)
    her = jnp.where(cond, sr * sr * qq, her)
    return hel, her


def _h_edges_mono(co: CppmCoeffs, hm, periodic):
    """Thickness edge reconstruction with unconditional monotonic
    limiting (h_edges_mono, mod_cppm.F90:436-488)."""
    he = (co.hevc[0] * _sh(hm, -2, periodic) + co.hevc[1] * _sh(hm, -1, periodic)
          + co.hevc[2] * hm + co.hevc[3] * _sh(hm, 1, periodic))
    hel = he
    her = _sh(he, 1, periodic)

    hm_m = _sh(hm, -1, periodic)
    hm_p = _sh(hm, 1, periodic)
    sl = co.ssc * (hm - hm_m)
    sr = co.ssc * (hm_p - hm)
    has_slope = sl * sr > 0.
    sc = _minmod3(sl, sr, co.scc * (hm_p - hm_m))

    hel2 = jnp.where((hm_m - hel) * (hm - hel) > 0.,
                     hm - jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(hel - hm)),
                     hel)
    her2 = jnp.where((hm_p - her) * (hm - her) > 0.,
                     hm + jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(her - hm)),
                     her)
    d = her2 - hel2
    q = d * (2. * hm - hel2 - her2)
    r = d * d / 3.
    hel3 = jnp.where(q > r, 3. * hm - 2. * her2, hel2)
    her3 = jnp.where(-r > q, 3. * hm - 2. * hel2, her2)

    hel = jnp.where(has_slope, hel3, hm)
    her = jnp.where(has_slope, her3, hm)
    return hel, her


def _tracer_edge_coeffs(co: CppmCoeffs, hm, hel, her, periodic):
    """Per-cell compatible tracer edge-value coefficients tevc1..4
    (parabola_coeffs_fc_nosc, mod_cppm.F90:505-729): class-dependent LU
    solves, all classes evaluated densely and selected by stencil tag."""
    def row(cell_off, j0):
        """matrix row elements (a_r2, a_r3, a_r4) for the cell at offset."""
        h = _sh(hm, cell_off, periodic)
        hl = _sh(hel, cell_off, periodic)
        hr = _sh(her, cell_off, periodic)
        hi = 1.0 / h
        a2 = co.tmc0[j0] + (co.tmcl[j0] * hl + co.tmcr[j0] * hr) * hi
        a3 = co.tmc0[j0 + 1] + (co.tmcl[j0 + 1] * hl
                                + co.tmcr[j0 + 1] * hr) * hi
        a4 = co.tmc0[j0 + 2] + (co.tmcl[j0 + 2] * hl
                                + co.tmcr[j0 + 2] * hr) * hi
        return a2, a3, a4

    a12, a13, a14 = row(-2, 0)
    b22, b23, b24 = row(-1, 3)
    b32, b33, b34 = row(0, 6)
    b42, b43, b44 = row(1, 9)

    def safe(x):
        return jnp.where(x == 0., 1., x)

    # ---- 1111 (full 4x4)
    a22 = b22 - a12
    a23 = b23 - a13
    a24 = b24 - a14
    a32 = b32 - a12
    a33 = b33 - a13
    a34 = b34 - a14
    a42 = b42 - a12
    a43 = b43 - a13
    a44 = b44 - a14
    q = 1.0 / safe(a22)
    a23q = a23 * q
    c33 = a33 - a23q * a32
    c43 = a43 - a23q * a42
    a24q = a24 * q
    c34 = a34 - a24q * a32
    c44 = a44 - a24q * a42
    c34 = c34 / safe(c33)
    c44 = c44 - c34 * c43
    t2 = -a12
    t3 = -a13 - a23q * t2
    t4 = -a14 - a24q * t2 - c34 * t3
    t4 = t4 / safe(c44)
    t3 = (t3 - c43 * t4) / safe(c33)
    t2 = (t2 - a32 * t3 - a42 * t4) / safe(a22)
    tev_1111 = (1. - t2 - t3 - t4, t2, t3, t4)

    # ---- 1110
    d23 = (b23 - a13) / safe(b22 - a12)
    d33 = (b33 - a13) - d23 * (b32 - a12)
    t2 = -a12
    t3 = (-a13 - d23 * t2) / safe(d33)
    t2 = (t2 - (b32 - a12) * t3) / safe(b22 - a12)
    tev_1110 = (1. - t2 - t3, t2, t3, jnp.zeros_like(t2))

    # ---- 0111
    e32 = b32 - b22
    e42 = b42 - b22
    e33 = (b33 - b23) / safe(e32)
    e43 = (b43 - b23) - e33 * e42
    t3 = -b22
    t4 = (-b23 - e33 * t3) / safe(e43)
    t3 = (t3 - e42 * t4) / safe(e32)
    tev_0111 = (jnp.zeros_like(t3), 1. - t3 - t4, t3, t4)

    # ---- 1100
    t2 = -a12 / safe(b22 - a12)
    z = jnp.zeros_like(t2)
    tev_1100 = (1. - t2, t2, z, z)

    # ---- 0110
    t3 = -b22 / safe(b32 - b22)
    tev_0110 = (z, 1. - t3, t3, z)

    # ---- 0011
    t4 = -b32 / safe(b42 - b32)
    tev_0011 = (z, z, 1. - t4, t4)

    one = jnp.ones_like(t2)
    tev_0100 = (z, one, z, z)
    tev_0010 = (z, z, one, z)
    tev_0000 = (z, z, z, z)

    tabs = [tev_0000, tev_1111, tev_1110, tev_0111, tev_1100,
            tev_0110, tev_0011, tev_0100, tev_0010]
    st = co.stencil
    tevc = []
    for c in range(4):
        out = tabs[0][c]
        for tag in range(1, 9):
            out = jnp.where(st == tag, tabs[tag][c], out)
        tevc.append(out)
    return tevc


def _pos_mask(tm, itrc0):
    """Positivity-clamp mask over the stacked-tracer axis: global tracer
    index >= 1 (everything but temp, mod_cppm.F90:791-805).  `itrc0` is
    the global index of tm[0] (nonzero when the Pallas path chunks the
    tracer stack).  broadcasted_iota keeps this TPU/Mosaic-legal."""
    nt = tm.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (nt,) + (1,) * (tm.ndim - 1),
                                   0)
    return idx + itrc0 >= 1


def _parabola_coeffs_fc_nosc(co: CppmCoeffs, hm, tm, hel, her, periodic,
                             itrc0=0):
    """Tracer edge values, non-oscillatory limiting and parabola
    coefficients (parabola_coeffs_fc_nosc, mod_cppm.F90:490-818).

    tm: (nt, ...) stacked tracers (temp, saln, passive...); positivity
    clamping applies to indices >= 1 (mod_cppm.F90:791-805)."""
    tevc = _tracer_edge_coeffs(co, hm, hel, her, periodic)

    te = (tevc[0] * _sh(tm, -2, periodic) + tevc[1] * _sh(tm, -1, periodic)
          + tevc[2] * tm + tevc[3] * _sh(tm, 1, periodic))
    tel = te
    ter = _sh(te, 1, periodic)

    # thickness-dependent parabola factors (mod_cppm.F90:731-747)
    qh = 1.0 / (12. * hm - hel - her)
    hf1m = 60. * hm * qh
    hf1l = -(42. * hm + 4. * hel - 6. * her) * qh
    hf1r = -(18. * hm - 4. * hel + 6. * her) * qh
    hf2m = -hf1m
    hf2l = 5. * (6. * hm + hel - her) * qh
    hf2r = 5. * (6. * hm - hel + her) * qh

    d2t = co.d2m * (hf2m * tm + hf2l * tel + hf2r * ter)
    need = (_sh(d2t, -1, periodic) * d2t <= 0.) \
        | (d2t * _sh(d2t, 1, periodic) <= 0.)

    tm_m = _sh(tm, -1, periodic)
    tm_p = _sh(tm, 1, periodic)
    sl = co.ssc * (tm - tm_m)
    sr = co.ssc * (tm_p - tm)
    has_slope = sl * sr > 0.
    sc = _minmod3(sl, sr, co.scc * (tm_p - tm_m))

    tel2 = jnp.where((tm_m - tel) * (tm - tel) > 0.,
                     tm - jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(tel - tm)),
                     tel)
    ter2 = jnp.where((tm_p - ter) * (tm - ter) > 0.,
                     tm + jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(ter - tm)),
                     ter)
    # non-oscillatory slope fix (mod_cppm.F90:766-782)
    sl2 = hf1m * tm + hf1l * tel2 + hf1r * ter2
    a2 = hf2m * tm + hf2l * tel2 + hf2r * ter2
    sr2 = sl2 + 2. * a2
    fix = sl2 * sr2 < 0.
    left_fix = (ter2 - tel2) * a2 < 0.
    tel3 = jnp.where(
        fix & left_fix,
        -((hf1m + 2. * hf2m) * tm + (hf1r + 2. * hf2r) * ter2)
        / (hf1l + 2. * hf2l),
        tel2)
    ter3 = jnp.where(
        fix & ~left_fix,
        -(hf1m * tm + hf1l * tel3) / hf1r,
        ter2)

    tel_l = jnp.where(has_slope, tel3, tm)
    ter_l = jnp.where(has_slope, ter3, tm)
    tel = jnp.where(need, tel_l, tel)
    ter = jnp.where(need, ter_l, ter)

    # positivity for saln/passive tracers (nt >= 1) (mod_cppm.F90:791-805)
    pos = _pos_mask(tm, itrc0)
    tel_p = jnp.maximum(tel, 0.)
    ter_p = jnp.maximum(ter, 0.)
    sl3 = hf1m * tm + hf1l * tel_p + hf1r * ter_p
    a23 = hf2m * tm + hf2l * tel_p + hf2r * ter_p
    sr3 = sl3 + 2. * a23
    condp = (sl3 < 0.) & (sr3 > 0.) & (a23 * tel_p - .25 * sl3 * sl3 < 0.)
    qq = 3. * tm / (3. * sl3 * sr3 + 4. * a23 * a23)
    tel_p2 = jnp.where(condp, sl3 * sl3 * qq, tel_p)
    ter_p2 = jnp.where(condp, sr3 * sr3 * qq, ter_p)
    tel = jnp.where(pos, tel_p2, tel)
    ter = jnp.where(pos, ter_p2, ter)

    hpc0 = hel
    hpc1 = 6. * hm - 4. * hel - 2. * her
    hpc2 = 3. * (hel - 2. * hm + her)
    tpc0 = tel
    tpc1 = hf1m * tm + hf1l * tel + hf1r * ter
    tpc2 = hf2m * tm + hf2l * tel + hf2r * ter
    return (hpc0, hpc1, hpc2), (tpc0, tpc1, tpc2)


def _parabola_coeffs_fc_mono(co: CppmCoeffs, hm, tm, hel, her, periodic):
    """Compatible tracer edges + unconditional monotonic limiting
    (parabola_coeffs_fc_mono, mod_cppm.F90:820-1116)."""
    tevc = _tracer_edge_coeffs(co, hm, hel, her, periodic)

    te = (tevc[0] * _sh(tm, -2, periodic) + tevc[1] * _sh(tm, -1, periodic)
          + tevc[2] * tm + tevc[3] * _sh(tm, 1, periodic))
    tel = te
    ter = _sh(te, 1, periodic)

    # thickness-dependent parabola factors (mod_cppm.F90:1063-1071)
    qh = 1.0 / (12. * hm - hel - her)
    hf1m = 60. * hm * qh
    hf1l = -(42. * hm + 4. * hel - 6. * her) * qh
    hf1r = -(18. * hm - 4. * hel + 6. * her) * qh
    hf2m = -hf1m
    hf2l = 5. * (6. * hm + hel - her) * qh
    hf2r = 5. * (6. * hm - hel + her) * qh

    tm_m = _sh(tm, -1, periodic)
    tm_p = _sh(tm, 1, periodic)
    sl = co.ssc * (tm - tm_m)
    sr = co.ssc * (tm_p - tm)
    has_slope = sl * sr > 0.
    sc = _minmod3(sl, sr, co.scc * (tm_p - tm_m))

    tel2 = jnp.where((tm_m - tel) * (tm - tel) > 0.,
                     tm - jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(tel - tm)),
                     tel)
    ter2 = jnp.where((tm_p - ter) * (tm - ter) > 0.,
                     tm + jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(ter - tm)),
                     ter)
    # derivative-sign fix (mod_cppm.F90:1087-1098), same formulas as the
    # nosc variant but applied unconditionally within the sloped region
    sl2 = hf1m * tm + hf1l * tel2 + hf1r * ter2
    a2 = hf2m * tm + hf2l * tel2 + hf2r * ter2
    sr2 = sl2 + 2. * a2
    fix = sl2 * sr2 < 0.
    left_fix = (ter2 - tel2) * a2 < 0.
    tel3 = jnp.where(
        fix & left_fix,
        -((hf1m + 2. * hf2m) * tm + (hf1r + 2. * hf2r) * ter2)
        / (hf1l + 2. * hf2l),
        tel2)
    ter3 = jnp.where(
        fix & ~left_fix,
        -(hf1m * tm + hf1l * tel3) / hf1r,
        ter2)

    tel = jnp.where(has_slope, tel3, tm)
    ter = jnp.where(has_slope, ter3, tm)

    hpc0 = hel
    hpc1 = 6. * hm - 4. * hel - 2. * her
    hpc2 = 3. * (hel - 2. * hm + her)
    tpc0 = tel
    tpc1 = hf1m * tm + hf1l * tel + hf1r * ter
    tpc2 = hf2m * tm + hf2l * tel + hf2r * ter
    return (hpc0, hpc1, hpc2), (tpc0, tpc1, tpc2)


def _pc_tracer_edges(co: CppmCoeffs, tm, periodic):
    """4th-order tracer edges from the thickness coefficients — the
    non-compatible ('partial compatibility') estimate
    (parabola_coeffs_pc_*, mod_cppm.F90:1143-1155)."""
    te = (co.hevc[0] * _sh(tm, -2, periodic)
          + co.hevc[1] * _sh(tm, -1, periodic)
          + co.hevc[2] * tm + co.hevc[3] * _sh(tm, 1, periodic))
    return te, _sh(te, 1, periodic)


def _parabola_coeffs_pc_nosc(co: CppmCoeffs, hm, tm, hel, her, periodic,
                             itrc0=0):
    """Non-compatible tracer edges + d2-gated non-oscillatory limiting
    (parabola_coeffs_pc_nosc, mod_cppm.F90:1118-1264).  hel/her are the
    already-limited thickness edges (h part identical to
    h_edges_nosc)."""
    tel, ter = _pc_tracer_edges(co, tm, periodic)

    d2t = co.d2m * (tel - 2. * tm + ter)
    need = (_sh(d2t, -1, periodic) * d2t <= 0.) \
        | (d2t * _sh(d2t, 1, periodic) <= 0.)

    tm_m = _sh(tm, -1, periodic)
    tm_p = _sh(tm, 1, periodic)
    sl = co.ssc * (tm - tm_m)
    sr = co.ssc * (tm_p - tm)
    has_slope = sl * sr > 0.
    sc = _minmod3(sl, sr, co.scc * (tm_p - tm_m))

    tel2 = jnp.where((tm_m - tel) * (tm - tel) > 0.,
                     tm - jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(tel - tm)),
                     tel)
    ter2 = jnp.where((tm_p - ter) * (tm - ter) > 0.,
                     tm + jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(ter - tm)),
                     ter)
    d = ter2 - tel2
    q = d * (2. * tm - tel2 - ter2)
    r = d * d / 3.
    tel3 = jnp.where(q > r, 3. * tm - 2. * ter2, tel2)
    ter3 = jnp.where(-r > q, 3. * tm - 2. * tel2, ter2)

    tel_l = jnp.where(has_slope, tel3, tm)
    ter_l = jnp.where(has_slope, ter3, tm)
    tel = jnp.where(need, tel_l, tel)
    ter = jnp.where(need, ter_l, ter)

    # positivity for saln/passive tracers (mod_cppm.F90:1239-1252)
    pos = _pos_mask(tm, itrc0)
    tel_p = jnp.maximum(tel, 0.)
    ter_p = jnp.maximum(ter, 0.)
    sl3 = 2. * (3. * tm - 2. * tel_p - ter_p)
    a23 = 3. * (tel_p - 2. * tm + ter_p)
    sr3 = sl3 + 2. * a23
    condp = (sl3 < 0.) & (sr3 > 0.) & (a23 * tel_p - .25 * sl3 * sl3 < 0.)
    qq = 3. * tm / (3. * sl3 * sr3 + 4. * a23 * a23)
    tel_p2 = jnp.where(condp, sl3 * sl3 * qq, tel_p)
    ter_p2 = jnp.where(condp, sr3 * sr3 * qq, ter_p)
    tel = jnp.where(pos, tel_p2, tel)
    ter = jnp.where(pos, ter_p2, ter)

    hpc0 = hel
    hpc1 = 6. * hm - 4. * hel - 2. * her
    hpc2 = 3. * (hel - 2. * hm + her)
    tpc0 = tel
    tpc1 = 6. * tm - 4. * tel - 2. * ter
    tpc2 = 3. * (tel - 2. * tm + ter)
    return (hpc0, hpc1, hpc2), (tpc0, tpc1, tpc2)


def _parabola_coeffs_pc_mono(co: CppmCoeffs, hm, tm, hel, her, periodic):
    """Non-compatible tracer edges + unconditional monotonic limiting
    (parabola_coeffs_pc_mono, mod_cppm.F90:1266-1371)."""
    tel, ter = _pc_tracer_edges(co, tm, periodic)

    tm_m = _sh(tm, -1, periodic)
    tm_p = _sh(tm, 1, periodic)
    sl = co.ssc * (tm - tm_m)
    sr = co.ssc * (tm_p - tm)
    has_slope = sl * sr > 0.
    sc = _minmod3(sl, sr, co.scc * (tm_p - tm_m))

    tel2 = jnp.where((tm_m - tel) * (tm - tel) > 0.,
                     tm - jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(tel - tm)),
                     tel)
    ter2 = jnp.where((tm_p - ter) * (tm - ter) > 0.,
                     tm + jnp.sign(sc) * jnp.minimum(.5 * jnp.abs(sc),
                                                     jnp.abs(ter - tm)),
                     ter)
    d = ter2 - tel2
    q = d * (2. * tm - tel2 - ter2)
    r = d * d / 3.
    tel3 = jnp.where(q > r, 3. * tm - 2. * ter2, tel2)
    ter3 = jnp.where(-r > q, 3. * tm - 2. * tel2, ter2)

    tel = jnp.where(has_slope, tel3, tm)
    ter = jnp.where(has_slope, ter3, tm)

    hpc0 = hel
    hpc1 = 6. * hm - 4. * hel - 2. * her
    hpc2 = 3. * (hel - 2. * hm + her)
    tpc0 = tel
    tpc1 = 6. * tm - 4. * tel - 2. * ter
    tpc2 = 3. * (tel - 2. * tm + ter)
    return (hpc0, hpc1, hpc2), (tpc0, tpc1, tpc2)


def _flux_integration(ca, ai, db, du, dl, hpc, tpc, periodic):
    """Integrate upstream parabolas over the flux area (flux_integration,
    mod_cppm.F90:1373-1468).  Edge i lies between cells i-1 and i; ca>0
    means transport from cell i-1 into cell i."""
    hpc0, hpc1, hpc2 = hpc
    tpc0, tpc1, tpc2 = tpc
    c1_2, c1_3, c1_4, c1_5 = .5, 1 / 3., .25, 1 / 5.

    # ---- negative ca: upstream is cell i
    c = ca * ai
    hb_n = jnp.maximum(0., db - du)
    deep_n = dl > db
    hf_par_n = hpc0 - (c1_2 * hpc1 - c1_3 * hpc2 * c) * c
    hf_n = jnp.where(deep_n, hb_n, hf_par_n) * ca
    p0_n = jnp.where(deep_n, hb_n, hf_par_n)
    p1_n = jnp.where(deep_n, -c1_2 * hb_n * c,
                     -(c1_2 * hpc0 - (c1_3 * hpc1 - c1_4 * hpc2 * c) * c) * c)
    p2_n = jnp.where(deep_n, c1_3 * hb_n * c * c,
                     (c1_3 * hpc0 - (c1_4 * hpc1 - c1_5 * hpc2 * c) * c)
                     * c * c)
    htf_n = (p0_n * tpc0 + p1_n * tpc1 + p2_n * tpc2) * ca

    # ---- positive ca: upstream is cell i-1
    aiw = _sh(ai, -1, periodic)
    duw = _sh(du, -1, periodic)
    dlw = _sh(dl, -1, periodic)
    h0w = _sh(hpc0, -1, periodic)
    h1w = _sh(hpc1, -1, periodic)
    h2w = _sh(hpc2, -1, periodic)
    t0w = _sh(tpc0, -1, periodic)
    t1w = _sh(tpc1, -1, periodic)
    t2w = _sh(tpc2, -1, periodic)

    cw = ca * aiw
    q1 = 1. - c1_2 * cw
    q2 = 1. - (1. - c1_3 * cw) * cw
    hb_p = jnp.maximum(0., db - duw)
    deep_p = dlw > db
    hf_par_p = h0w + q1 * h1w + q2 * h2w
    hf_p = jnp.where(deep_p, hb_p, hf_par_p) * ca
    q3 = c1_4 * (1. + 3. * (1. - cw) * q2)
    q4 = c1_5 * (1. + 4. * (1. - cw) * q3)
    p0_p = jnp.where(deep_p, hb_p, hf_par_p)
    p1_p = jnp.where(deep_p, q1 * hb_p, q1 * h0w + q2 * h1w + q3 * h2w)
    p2_p = jnp.where(deep_p, q2 * hb_p, q2 * h0w + q3 * h1w + q4 * h2w)
    htf_p = (p0_p * t0w + p1_p * t1w + p2_p * t2w) * ca

    neg = ca < 0.
    hf = jnp.where(neg, hf_n, hf_p)
    htf = jnp.where(neg, htf_n, htf_p)
    return hf, htf


def cppm_sweep(hm_in, tm, ca, db, du, dl, ai, co: CppmCoeffs,
               periodic: bool, div_corr=None,
               compatibility: str = 'full',
               limiting: str = 'non_oscillatory', ax: int = -1):
    """One 1-D CPPM transport sweep along the last axis
    (cppm_{fc,pc}_{nosc,mono}_i, mod_cppm.F90:1470-2498; kernel
    selection per the cppm namelist options, :2748-2834).

    hm_in: (k, rows, N) thickness; tm: (nt, k, rows, N) tracers;
    ca: (k, rows, N) flux area at the left edge of each cell;
    db: (k?, rows, N) bottom pressure at edges; du/dl: cell top/bottom
    interface pressure; ai: inverse cell area; div_corr: transverse
    flux-area divergence for the second Strang pass.

    Returns (h_new_raw, tm_new, hf, htf): h_new_raw = ho - div(hf)*ai
    (before the dp clamp), updated tracers, and the edge fluxes.

    On TPU with f32 fields the sweep dispatches to the fused Pallas
    kernel (cppm_pallas.cppm_sweep_pallas) — one VMEM-resident pass over
    (k-block, row-block, sweep-axis) tiles; the jnp path below is the
    CPU/f64 reference implementation and the two are element-for-element
    the same program."""
    if _pallas_ok(hm_in, co):
        from .cppm_pallas import cppm_sweep_pallas
        return cppm_sweep_pallas(hm_in, tm, ca, db, du, dl, ai, co,
                                 periodic, div_corr=div_corr,
                                 compatibility=compatibility,
                                 limiting=limiting, ax=ax)
    with _axis(ax):
        return _cppm_sweep_body(hm_in, tm, ca, db, du, dl, ai, co,
                                periodic, div_corr, compatibility,
                                limiting)


def _pallas_ok(hm, co) -> bool:
    """Use the fused Pallas sweep kernel?  TPU backend + f32 + dx
    available; BLOM_TPU_PALLAS=0 disables (escape hatch)."""
    import os
    if os.environ.get('BLOM_TPU_PALLAS', '1') == '0':
        return False
    if co.dx is None or hm.dtype != jnp.float32:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _cppm_sweep_body(hm_in, tm, ca, db, du, dl, ai, co, periodic,
                     div_corr, compatibility, limiting, itrc0=0):
    ho = jnp.maximum(0., hm_in) + dpeps
    hm = ho
    if div_corr is not None:
        hm = hm / (1. - div_corr * ai)

    if limiting == 'monotonic':
        hel, her = _h_edges_mono(co, hm, periodic)
        if compatibility == 'full':
            hpc, tpc = _parabola_coeffs_fc_mono(co, hm, tm, hel, her,
                                                periodic)
        else:
            hpc, tpc = _parabola_coeffs_pc_mono(co, hm, tm, hel, her,
                                                periodic)
    else:
        hel, her = _h_edges_nosc(co, hm, periodic)
        if compatibility == 'full':
            hpc, tpc = _parabola_coeffs_fc_nosc(co, hm, tm, hel, her,
                                                periodic, itrc0)
        else:
            hpc, tpc = _parabola_coeffs_pc_nosc(co, hm, tm, hel, her,
                                                periodic, itrc0)
    hf, htf = _flux_integration(ca, ai, db, du, dl, hpc, tpc, periodic)

    hf_e = _sh(hf, 1, periodic)
    htf_e = _sh(htf, 1, periodic)
    hn = ho - (hf_e - hf) * ai
    hni = 1.0 / hn
    tm_new = (ho * tm - (htf_e - htf) * ai) * hni
    return hn, tm_new, hf, htf
