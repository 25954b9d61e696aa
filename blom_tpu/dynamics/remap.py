"""Incremental-remapping advection (advmth='remap').

TPU-native counterpart of the reference scheme
(/root/reference/phy/mod_remap.F90:205-1522 remap, with the polygon
moment primitives triint/penint :53-199): per edge, the fluxed mass is
the integral of a slope-limited linear reconstruction over the
geometric departure region — a pentagon rooted in the upwind cell plus
corner triangles from the diagonal neighbours when the corner
velocities sweep across cell boundaries.

Dense re-design: the reference's per-point branch ladder (flow
direction, corner-velocity signs, land-neighbour index fallbacks)
becomes jnp.where selections over whole (J, I) planes; a single
"tracer stack" carries temp, saln and all passive tracers through the
identical moment algebra (the reference unrolls them); the layer loop
is a vmap.  The ATRC age-tracer second-moment path (natr > 0) is not
implemented (natr = 0 in all shipped configurations).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.grid import Grid

DPEPS = 1.e-12   # small layer thickness [Pa] (mod_remap.F90:40-41)


# ------------------------------------------------------------------ #
# polygon flux-integral primitives
# ------------------------------------------------------------------ #

def triint(ac, x1, y1, x2, y2, x3, y3):
    """Integrals of {1, x, y, xx, yy, xy} over a triangle, times cell
    area (triint, mod_remap.F90:53-102).  Returns (a, ax, ay, axx,
    ayy, axy) with the moment terms pre-multiplied by the area a."""
    xx = x1 * x2 + x2 * x3 + x1 * x3
    yy = y1 * y2 + y2 * y3 + y1 * y3
    xy = x1 * y1 + x2 * y2 + x3 * y3
    a = .5 * ((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) * ac
    ax = (x1 + x2 + x3) / 3.
    ay = (y1 + y2 + y3) / 3.
    axx = (9. * ax * ax - xx) / 6.
    ayy = (9. * ay * ay - yy) / 6.
    axy = (9. * ax * ay + xy) / 12.
    return a, ax * a, ay * a, axx * a, ayy * a, axy * a


def penint(ac, x1, y1, x2, y2, x3, y3, x4, y4, x5, y5):
    """Same moments over a pentagon, as the fan of triangles (123),
    (135), (345) (penint, mod_remap.F90:104-199)."""
    m1 = triint(ac, x1, y1, x2, y2, x3, y3)
    m2 = triint(ac, x1, y1, x3, y3, x5, y5)
    m3 = triint(ac, x3, y3, x4, y4, x5, y5)
    return tuple(p + q + r for p, q, r in zip(m1, m2, m3))


# ------------------------------------------------------------------ #
# limited linear reconstructions
# ------------------------------------------------------------------ #

def _neighbors(grid: Grid, a):
    """The 8 neighbour values with land fallback to the centre value
    (the iw/ie/js/jn/isw... index construction,
    mod_remap.F90:370-383)."""
    w_ok = grid.iu > 0.
    e_ok = grid.ip1(grid.iu) > 0.
    s_ok = grid.iv > 0.
    n_ok = grid.jp1(grid.iv) > 0.

    aw = jnp.where(w_ok, grid.im1(a), a)
    ae = jnp.where(e_ok, grid.ip1(a), a)
    as_ = jnp.where(s_ok, grid.jm1(a), a)
    an = jnp.where(n_ok, grid.jp1(a), a)

    def diag(ishift, jshift, iok, jok, a_iface, a_jface):
        # The reference builds isw = i*(1-ip(iw,js)) + iw*ip(iw,js)
        # with iw/js ALREADY face-fallen-back (:370-383): when only one
        # face neighbour exists the "diagonal" collapses to that (wet)
        # face value; when both exist but the true diagonal is dry,
        # BOTH coordinates fall back to the centre.
        cand = grid.shift(a, ishift, jshift)
        wet = grid.shift(grid.ip, ishift, jshift) > 0.
        both = iok & jok
        return jnp.where(both, jnp.where(wet, cand, a),
                         jnp.where(iok, a_iface,
                                   jnp.where(jok, a_jface, a)))

    asw = diag(-1, -1, w_ok, s_ok, aw, as_)
    ase = diag(1, -1, e_ok, s_ok, ae, as_)
    anw = diag(-1, 1, w_ok, n_ok, aw, an)
    ane = diag(1, 1, e_ok, n_ok, ae, an)
    # bool + bool is logical-or in jnp; cast so two wet neighbors give
    # the centered-difference 1/2 (the reference's 1/max(1, ie-iw))
    dxi = 1. / jnp.maximum(1., w_ok.astype(a.dtype)
                           + e_ok.astype(a.dtype))
    dyi = 1. / jnp.maximum(1., s_ok.astype(a.dtype)
                           + n_ok.astype(a.dtype))
    return (aw, ae, as_, an, asw, ase, anw, ane), (dxi, dyi)


def _recon_dp(grid: Grid, dp, pup, pbmin):
    """Limited dp gradient + centre-of-mass offsets
    (mod_remap.F90:385-411)."""
    def clipdp(a_dp, a_pup):
        return jnp.maximum(DPEPS, jnp.minimum(pbmin - a_pup, a_dp))

    (dpw, dpe, dps, dpn, dpsw, dpse, dpnw, dpne), (dxi, dyi) = \
        _neighbors(grid, dp)
    (puw, pue, pus, pun, pusw, puse, punw, pune), _ = \
        _neighbors(grid, pup)
    vals = [clipdp(a, b) for a, b in
            [(dpsw, pusw), (dps, pus), (dpse, puse), (dpw, puw),
             (dpe, pue), (dpnw, punw), (dpn, pun), (dpne, pune)]]
    dpc = jnp.maximum(DPEPS, jnp.minimum(pbmin - pup, dp))
    stack = jnp.stack(vals)
    gx = (clipdp(dpe, pue) - clipdp(dpw, puw)) * dxi
    gy = (clipdp(dpn, pun) - clipdp(dps, pus)) * dyi
    gmx = .5 * (jnp.abs(gx) + jnp.abs(gy))
    fmx = jnp.maximum(0., stack.max(0) - dpc)
    fmn = jnp.minimum(0., stack.min(0) - dpc)
    ok = (fmx > 0.) & (fmn < 0.)
    q = jnp.minimum(fmx / jnp.maximum(fmx, gmx),
                    fmn / jnp.minimum(fmn, -gmx))
    q = jnp.where(ok, q, 0.)
    gx = gx * q
    gy = gy * q
    xd = gx / (12. * dp)
    yd = gy / (12. * dp)
    return gx, gy, xd, yd


def _recon_tr(grid: Grid, tr, xd, yd):
    """Limited tracer gradient + offset-corrected mean
    (mod_remap.F90:413-468), vmapped over the tracer stack axis."""
    def one(a):
        (aw, ae, as_, an, asw, ase, anw, ane), (dxi, dyi) = \
            _neighbors(grid, a)
        gx = (ae - aw) * dxi
        gy = (an - as_) * dyi
        q1 = gx * (-.5 - xd)
        q2 = gx * (.5 - xd)
        q3 = gy * (-.5 - yd)
        q4 = gy * (.5 - yd)
        stack = jnp.stack([asw, as_, ase, aw, ae, anw, an, ane])
        fmx = jnp.maximum(0., stack.max(0) - a)
        fmn = jnp.minimum(0., stack.min(0) - a)
        gmx = jnp.maximum(q1, q2) + jnp.maximum(q3, q4)
        gmn = jnp.minimum(q1, q2) + jnp.minimum(q3, q4)
        ok = (fmx > 0.) & (fmn < 0.)
        q = jnp.minimum(fmx / jnp.maximum(fmx, gmx),
                        fmn / jnp.minimum(fmn, gmn))
        q = jnp.where(ok, q, 0.)
        gx = gx * q
        gy = gy * q
        d = a - gx * xd - gy * yd
        return gx, gy, d

    return jax.vmap(one)(tr)


# ------------------------------------------------------------------ #
# corner velocities
# ------------------------------------------------------------------ #

def _corner_velocities(grid: Grid, cu, cv):
    """Non-dimensional corner velocities at q-points
    (mod_remap.F90:613-656)."""
    ip = grid.ip
    ipw = grid.im1(ip)
    ips = grid.jm1(ip)
    ipsw = grid.im1(grid.jm1(ip))
    nw = ipsw + ips + ipw + ip

    cu_s = grid.jm1(cu)
    cv_w = grid.im1(cv)

    # nw == 4: harmonic mean unless signs differ
    hu = jnp.where(cu_s * cu <= 0., 0.,
                   2. * cu_s * cu / jnp.where(jnp.abs(cu_s + cu) > 0.,
                                              cu_s + cu, 1.))
    hv = jnp.where(cv_w * cv <= 0., 0.,
                   2. * cv_w * cv / jnp.where(jnp.abs(cv_w + cv) > 0.,
                                              cv_w + cv, 1.))

    # nw == 2 straight pairs
    pair_s = (ipsw + ips) == 2.
    pair_n = (ipw + ip) == 2.
    pair_w = (ipsw + ipw) == 2.
    pair_e = (ips + ip) == 2.
    cuc2 = jnp.where(pair_s, cu_s, jnp.where(pair_n, cu, 0.))
    cvc2 = jnp.where(pair_s | pair_n, 0.,
                     jnp.where(pair_w, cv_w, jnp.where(pair_e, cv, 0.)))

    cuc = jnp.where(nw == 4., hu, jnp.where(nw == 2., cuc2, 0.))
    cvc = jnp.where(nw == 4., hv, jnp.where(nw == 2., cvc2, 0.))
    return cuc, cvc


# ------------------------------------------------------------------ #
# edge fluxes
# ------------------------------------------------------------------ #

def _moments_contrib(m, dl, gx, gy, trg):
    """Mass + tracer flux of one polygon contribution
    (mod_remap.F90:700-712): trg = (gxs, gys, ds) tracer stacks."""
    a, ax, ay, axx, ayy, axy = m
    fd = a * dl + ax * gx + ay * gy
    qx = ax * dl + axx * gx + axy * gy
    qy = ay * dl + axy * gx + ayy * gy
    gxs, gys, ds = trg
    ftr = fd[None] * ds + qx[None] * gxs + qy[None] * gys
    return fd, ftr


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) > 1.e-12, b, jnp.where(b >= 0.,
                                                           1.e-12,
                                                           -1.e-12))


def _u_fluxes(grid: Grid, dp, pup, gx, gy, trg, cu, cuc, cvc, pbu):
    """u-edge mass/tracer fluxes (mod_remap.F90:662-1040).  Fields at
    source cells are gathered by shifts; both flow directions are
    computed and blended by sign(cu)."""
    sc = grid.scp2
    sci = grid.scp2i

    def at(di, dj, a):
        return grid.shift(a, di, dj)

    cvc_n = grid.jp1(cvc)   # corner (i, j+1)
    cuc_n = grid.jp1(cuc)
    # fluxing-area middle vertex (":667-668")
    ym = -.5 * (cvc + cvc_n)
    xm = _safe_div((ym + .5) * cuc - (ym - .5) * cuc_n - 2. * cu,
                   1. + cvc - cvc_n)

    def tr_at(di, dj):
        gxs, gys, ds = trg
        return at(di, dj, gxs), at(di, dj, gys), at(di, dj, ds)

    def dl_at(di, dj):
        return jnp.minimum(at(di, dj, dp),
                           jnp.maximum(0., pbu - at(di, dj, pup)))

    ntr = trg[0].shape[0]
    zf = jnp.zeros_like(cu)
    zt = jnp.zeros((ntr,) + cu.shape, cu.dtype)

    def contrib(cond, m, di, dj):
        dl = dl_at(di, dj)
        fd, ftr = _moments_contrib(m, dl, at(di, dj, gx),
                                   at(di, dj, gy), tr_at(di, dj))
        return jnp.where(cond, fd, zf), jnp.where(cond[None], ftr, zt)

    # ---- cu > 0 (west upwind) ------------------------------------
    s_on = cvc > 0.
    n_on = cvc_n < 0.
    xc0s = _safe_div(xm * cvc - cuc * (ym + .5), cvc + ym + .5)
    xc1s = xc0s * at(-1, 0, sc) * at(-1, -1, sci)
    m_sw = triint(at(-1, -1, sc), xc1s + .5, .5, -cuc + .5,
                  -cvc + .5, .5, .5)
    fd_sw, ftr_sw = contrib(s_on, m_sw, -1, -1)
    x4p = jnp.where(s_on, xc0s + .5, -cuc + .5)
    y4p = jnp.where(s_on, -.5, -cvc - .5)

    xc0n = _safe_div(xm * cvc_n - cuc_n * (ym - .5), cvc_n + ym - .5)
    xc1n = xc0n * at(-1, 0, sc) * at(-1, 1, sci)
    m_nw = triint(at(-1, 1, sc), xc1n + .5, -.5, .5, -.5,
                  -cuc_n + .5, -cvc_n - .5)
    fd_nw, ftr_nw = contrib(n_on, m_nw, -1, 1)
    x2p = jnp.where(n_on, xc0n + .5, -cuc_n + .5)
    y2p = jnp.where(n_on, .5, -cvc_n + .5)

    m_pw = penint(at(-1, 0, sc), .5, .5, x2p, y2p, xm + .5, ym,
                  x4p, y4p, .5, -.5)
    dl_w = dl_at(-1, 0)
    fd_w, ftr_w = _moments_contrib(m_pw, dl_w, at(-1, 0, gx),
                                   at(-1, 0, gy), tr_at(-1, 0))
    fd_pos = fd_sw + fd_nw + fd_w
    ftr_pos = ftr_sw + ftr_nw + ftr_w

    # ---- cu < 0 (east upwind, source cells at i, j +/- 1) --------
    xc1s = xc0s * sc * at(0, -1, sci)
    m_se = triint(at(0, -1, sc), xc1s - .5, .5, -cuc - .5,
                  -cvc + .5, -.5, .5)
    fd_se, ftr_se = contrib(s_on, m_se, 0, -1)
    x4m = jnp.where(s_on, xc0s - .5, -cuc - .5)
    y4m = jnp.where(s_on, -.5, -cvc - .5)

    xc1n = xc0n * sc * at(0, 1, sci)
    m_ne = triint(at(0, 1, sc), xc1n - .5, -.5, -.5, -.5,
                  -cuc_n - .5, -cvc_n - .5)
    fd_ne, ftr_ne = contrib(n_on, m_ne, 0, 1)
    x2m = jnp.where(n_on, xc0n - .5, -cuc_n - .5)
    y2m = jnp.where(n_on, .5, -cvc_n + .5)

    m_pe = penint(sc, -.5, .5, x2m, y2m, xm - .5, ym, x4m, y4m,
                  -.5, -.5)
    dl_e = jnp.minimum(dp, jnp.maximum(0., pbu - pup))
    fd_e, ftr_e = _moments_contrib(m_pe, dl_e, gx, gy, trg)
    fd_neg = fd_se + fd_ne + fd_e
    ftr_neg = ftr_se + ftr_ne + ftr_e

    pos = cu > 0.
    fdu = jnp.where(pos, fd_pos, fd_neg) * grid.iu
    ftru = jnp.where(pos[None], ftr_pos, ftr_neg) * grid.iu[None]
    return fdu, ftru


def _v_fluxes(grid: Grid, dp, pup, gx, gy, trg, cv, cuc, cvc, pbv):
    """v-edge fluxes (mod_remap.F90:1076-1448), mirror of _u_fluxes."""
    sc = grid.scp2
    sci = grid.scp2i

    def at(di, dj, a):
        return grid.shift(a, di, dj)

    cuc_e = grid.ip1(cuc)
    cvc_e = grid.ip1(cvc)
    xm = -.5 * (cuc + cuc_e)
    ym = _safe_div((xm + .5) * cvc - (xm - .5) * cvc_e - 2. * cv,
                   1. + cuc - cuc_e)

    def tr_at(di, dj):
        gxs, gys, ds = trg
        return at(di, dj, gxs), at(di, dj, gys), at(di, dj, ds)

    def dl_at(di, dj):
        return jnp.minimum(at(di, dj, dp),
                           jnp.maximum(0., pbv - at(di, dj, pup)))

    ntr = trg[0].shape[0]
    zf = jnp.zeros_like(cv)
    zt = jnp.zeros((ntr,) + cv.shape, cv.dtype)

    def contrib(cond, m, di, dj):
        dl = dl_at(di, dj)
        fd, ftr = _moments_contrib(m, dl, at(di, dj, gx),
                                   at(di, dj, gy), tr_at(di, dj))
        return jnp.where(cond, fd, zf), jnp.where(cond[None], ftr, zt)

    w_on = cuc > 0.
    e_on = cuc_e < 0.

    # ---- cv > 0 (south upwind) -----------------------------------
    yc0w = _safe_div(ym * cuc - cvc * (xm + .5), cuc + xm + .5)
    yc1w = yc0w * at(0, -1, sc) * at(-1, -1, sci)
    m_sw = triint(at(-1, -1, sc), .5, yc1w + .5, .5, .5,
                  -cuc + .5, -cvc + .5)
    fd_sw, ftr_sw = contrib(w_on, m_sw, -1, -1)
    x2p = jnp.where(w_on, -.5, -cuc - .5)
    y2p = jnp.where(w_on, yc0w + .5, -cvc + .5)

    yc0e = _safe_div(ym * cuc_e - cvc_e * (xm - .5), cuc_e + xm - .5)
    yc1e = yc0e * at(0, -1, sc) * at(1, -1, sci)
    m_se = triint(at(1, -1, sc), -.5, yc1e + .5, -cuc_e - .5,
                  -cvc_e + .5, -.5, .5)
    fd_se, ftr_se = contrib(e_on, m_se, 1, -1)
    x4p = jnp.where(e_on, .5, -cuc_e + .5)
    y4p = jnp.where(e_on, yc0e + .5, -cvc_e + .5)

    m_ps = penint(at(0, -1, sc), -.5, .5, x2p, y2p, xm, ym + .5,
                  x4p, y4p, .5, .5)
    fd_s, ftr_s = _moments_contrib(m_ps, dl_at(0, -1), at(0, -1, gx),
                                   at(0, -1, gy), tr_at(0, -1))
    fd_pos = fd_sw + fd_se + fd_s
    ftr_pos = ftr_sw + ftr_se + ftr_s

    # ---- cv < 0 (north upwind, sources at j, i +/- 1) ------------
    yc1w = yc0w * sc * at(-1, 0, sci)
    m_nw = triint(at(-1, 0, sc), .5, yc1w - .5, .5, -.5,
                  -cuc + .5, -cvc - .5)
    fd_nw, ftr_nw = contrib(w_on, m_nw, -1, 0)
    x2m = jnp.where(w_on, -.5, -cuc - .5)
    y2m = jnp.where(w_on, yc0w - .5, -cvc - .5)

    yc1e = yc0e * sc * at(1, 0, sci)
    m_ne = triint(at(1, 0, sc), -.5, yc1e - .5, -cuc_e - .5,
                  -cvc_e - .5, -.5, -.5)
    fd_ne, ftr_ne = contrib(e_on, m_ne, 1, 0)
    x4m = jnp.where(e_on, .5, -cuc_e + .5)
    y4m = jnp.where(e_on, yc0e - .5, -cvc_e - .5)

    m_pn = penint(sc, -.5, -.5, x2m, y2m, xm, ym - .5, x4m, y4m,
                  .5, -.5)
    dl_n = jnp.minimum(dp, jnp.maximum(0., pbv - pup))
    fd_n, ftr_n = _moments_contrib(m_pn, dl_n, gx, gy, trg)
    fd_neg = fd_nw + fd_ne + fd_n
    ftr_neg = ftr_nw + ftr_ne + ftr_n

    pos = cv > 0.
    fdv = jnp.where(pos, fd_pos, fd_neg) * grid.iv
    ftrv = jnp.where(pos[None], ftr_pos, ftr_neg) * grid.iv[None]
    return fdv, ftrv


# ------------------------------------------------------------------ #
# single-layer driver
# ------------------------------------------------------------------ #

def remap_layer(grid: Grid, pbmin, pbu, pbv, plo, cau, cav, dp, tr
                ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Advect one layer's thickness and tracer stack by incremental
    remapping (remap, mod_remap.F90:205-1522).

    tr: (ntr, J, I) tracer stack (temp, saln, passive tracers).
    Returns (dp_new, tr_new, fdu, fdv, ftru, ftrv) with fluxes in
    area*pressure units matching uflx/utflx accumulation."""
    dp = jnp.maximum(0., dp) + DPEPS
    pup = plo - dp

    gx, gy, xd, yd = _recon_dp(grid, dp, pup, pbmin)
    gxs, gys, ds = _recon_tr(grid, tr, xd, yd)
    trg = (gxs, gys, ds)

    # non-dimensional edge velocities (":592-611")
    cu = jnp.where(cau > 0., cau * grid.im1(grid.scp2i),
                   cau * grid.scp2i) * grid.iu
    cv = jnp.where(cav > 0., cav * grid.jm1(grid.scp2i),
                   cav * grid.scp2i) * grid.iv

    cuc, cvc = _corner_velocities(grid, cu, cv)

    fdu, ftru = _u_fluxes(grid, dp, pup, gx, gy, trg, cu, cuc, cvc, pbu)
    fdv, ftrv = _v_fluxes(grid, dp, pup, gx, gy, trg, cv, cuc, cvc, pbv)

    # update (":1455-1517")
    div = (grid.ip1(fdu) - fdu + grid.jp1(fdv) - fdv) * grid.scp2i
    dp_new = dp - div
    trdiv = (grid.ip1(ftru) - ftru + grid.jp1(ftrv) - ftrv) \
        * grid.scp2i[None]
    tr_new = (dp[None] * tr - trdiv) / dp_new[None]
    dp_new = jnp.maximum(0., dp_new - DPEPS) * grid.ip
    tr_new = jnp.where(grid.ip[None] > 0., tr_new, tr)
    return dp_new, tr_new, fdu, fdv, ftru, ftrv
