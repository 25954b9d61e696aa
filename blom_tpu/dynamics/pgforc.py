"""Baroclinic pressure-gradient force.

TPU-native re-design of the reference PGF module
(reference: /root/reference/phy/mod_pgforc.F90).  Column recursions are
expressed as (reversed) cumulative sums over the k axis; horizontal
differences are mask-multiplied stencil shifts.  Both PGF methods are
implemented: 'geopotential' (pgforc_geopotential, mod_pgforc.F90:96-263;
the reference's per-column while-loop search for the layer containing
the interpolation pressure becomes a vectorized monotone count +
take_along_axis gather) and 'dynamic enthalpy'
(pgforc_dynamic_enthalpy, :265-437), the default used by every shipped
config.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import eos
from ..core.constants import grav, onemm, epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p, dpu_dpv_upstream

wpgf = .25        # PGF time-averaging weight (mod_pgforc.F90:46-48)
p0_dynh = 0.0     # dynamic-enthalpy reference pressure (mod_pgforc.F90:49)


def _revcumsum(a, axis=0):
    """sum_{k'=k}^{K-1} a[k'] along axis."""
    return jnp.flip(jnp.cumsum(jnp.flip(a, axis), axis), axis)


def pgforc(grid: Grid, e: eos.EosParams, s: State, m: int, n: int,
           pgfmth: str = 'dynamic enthalpy') -> State:
    """Compute the PGF fields for the new time level n (mod_pgforc.F90:
    439-615 pgforc driver).  Also refreshes p/pu/pv/dpu/dpv from dp(n)."""
    kk = grid.kk
    iu, iv, ip = grid.iu, grid.iv, grid.ip

    # --- refresh interface pressures and velocity-point thicknesses
    # (mod_pgforc.F90:450-478)
    p = cumulative_p(s.dp[n]) * ip
    dpu_n, dpv_n = dpu_dpv_upstream(grid, p)
    pu = cumulative_p(dpu_n)
    pv = cumulative_p(dpv_n)
    s = dataclasses.replace(
        s, p=p, pu=pu, pv=pv,
        dpu=s.dpu.at[n].set(dpu_n), dpv=s.dpv.at[n].set(dpv_n))

    # --- save old PGF fields (mod_pgforc.F90:480-525)
    s = dataclasses.replace(
        s,
        xixp_o=s.xixp[n], xixm_o=s.xixm[n], pgfxm_o=s.pgfxm[n],
        xiyp_o=s.xiyp[n], xiym_o=s.xiym[n], pgfym_o=s.pgfym[n],
        pgfx_o=s.pgfx[n], pgfy_o=s.pgfy[n])

    temp, saln, dp = s.temp[n], s.saln[n], s.dp[n]

    if pgfmth == 'geopotential':
        (phi, pgfx, pgfy, pgfxm, pgfym,
         xixp, xixm, xiyp, xiym) = _pgforc_geopotential(
            grid, temp, saln, dp, s.phi[kk], p, pu, pv, dpu_n, dpv_n)
        return _finalize(grid, s, n, phi, pgfx, pgfy, pgfxm, pgfym,
                         xixp, xixm, xiyp, xiym)
    if pgfmth != 'dynamic enthalpy':
        raise ValueError(
            f'pgfmth={pgfmth!r} is unsupported (mod_pgforc.F90:525-535)')

    # --- potential (dynamic enthalpy + geopotential), its linearized
    # bottom-pressure response, and interface geopotential
    # (mod_pgforc.F90:283-329): bottom-up recursions -> reversed cumsums.
    p_lo = p[1:]
    A = eos.p_alpha(p0_dynh, p_lo, temp, saln)               # (kk,H)
    alp_lo = eos.alp(p_lo, temp, saln)
    B = eos.p_alpha(p0_dynh, p_lo[:-1], temp[1:], saln[1:])  # (kk-1,H)
    alpB = eos.alp(p_lo[:-1], temp[1:], saln[1:])

    phi_bot = s.phi[kk]
    # pot_dynh(kk-1 0-based) = phi_bot + A[kk-1]; recursion adds A[k]-B[k].
    inc = A[:-1] - B                                          # (kk-1,H)
    pot_dynh = phi_bot + A[-1] + jnp.concatenate(
        [_revcumsum(inc), jnp.zeros_like(A[:1])], axis=0)

    pb_resp_inc = (alp_lo[:-1] - alpB) * p_lo[:-1]
    pot_dynh_pb = alp_lo[-1] * p_lo[-1] + jnp.concatenate(
        [_revcumsum(pb_resp_inc), jnp.zeros_like(A[:1])], axis=0)

    dphi_layer = eos.p_alpha(p[:-1], p[1:], temp, saln)       # (kk,H)
    phi = jnp.concatenate(
        [phi_bot[None] + _revcumsum(dphi_layer),
         phi_bot[None]], axis=0)

    # --- dynamic-enthalpy derivative fields (mod_pgforc.F90:331-357)
    dynh_ts_t, dynh_ts_s = eos.dynh_derivatives(
        p0_dynh, p[:-1], p[1:], temp, saln)
    dalpds_r = eos.dalpds(e.pref, temp, saln)
    dalpdt_r = eos.dalpdt(e.pref, temp, saln)
    thick = (dp >= onemm).astype(dp.dtype)
    dynh_a = jnp.where(thick > 0, dynh_ts_s / dalpds_r, 0.0)
    dynh_t = jnp.where(thick > 0, dynh_ts_t - dynh_a * dalpdt_r, 0.0)
    alpha_r = eos.alp(e.pref, temp, saln)

    # --- layer PGF on u/v points (mod_pgforc.F90:366-430)
    im1, jm1 = grid.im1, grid.jm1

    pgfx = -(pot_dynh - im1(pot_dynh))
    both_u = (thick * im1(thick)) > 0
    pgfx = pgfx + jnp.where(
        both_u,
        .5 * ((im1(dynh_t) + dynh_t) * (temp - im1(temp))
              + (im1(dynh_a) + dynh_a) * (alpha_r - im1(alpha_r))),
        0.0)
    pgfx = pgfx * iu

    pgfy = -(pot_dynh - jm1(pot_dynh))
    both_v = (thick * jm1(thick)) > 0
    pgfy = pgfy + jnp.where(
        both_v,
        .5 * ((jm1(dynh_t) + dynh_t) * (temp - jm1(temp))
              + (jm1(dynh_a) + dynh_a) * (alpha_r - jm1(alpha_r))),
        0.0)
    pgfy = pgfy * iv

    # thickness-weighted vertical sums
    pgfxm = jnp.sum(pgfx * dpu_n, axis=0) * iu
    xixm = jnp.sum(im1(pot_dynh_pb) * dpu_n, axis=0) * iu
    xixp = jnp.sum(pot_dynh_pb * dpu_n, axis=0) * iu
    pgfym = jnp.sum(pgfy * dpv_n, axis=0) * iv
    xiym = jnp.sum(jm1(pot_dynh_pb) * dpv_n, axis=0) * iv
    xiyp = jnp.sum(pot_dynh_pb * dpv_n, axis=0) * iv

    return _finalize(grid, s, n, phi, pgfx, pgfy, pgfxm, pgfym,
                     xixp, xixm, xiyp, xiym)


def _side_eval(p, temp, saln, phi, phip, prs):
    """Evaluate one side (plus or minus column) of the geopotential PGF
    at the interpolation pressures prs (kk, ny, nx): locate the layer
    containing prs (the kup/kum/kvp/kvm while-loops of
    mod_pgforc.F90:172-183,215-226 become a monotone count), then
    extrapolate phi/phip from the interface below with delphi.

    Returns (phi_side, base, alp_at_prs) where base is the xi-term part
    that does not involve the other side's specific volume
    (mod_pgforc.F90:185-208)."""
    kk = temp.shape[0]
    # kup (0-based layer index): largest r in [0, kk-1] with p[r] <= prs
    idx = jnp.sum((p[:kk, None] <= prs[None, :]).astype(jnp.int32),
                  axis=0) - 1
    idx = jnp.clip(idx, 0, kk - 1)
    p_g = jnp.take_along_axis(p, idx + 1, axis=0)
    t_g = jnp.take_along_axis(temp, idx, axis=0)
    s_g = jnp.take_along_axis(saln, idx, axis=0)
    phi_g = jnp.take_along_axis(phi, idx + 1, axis=0)
    phip_g = jnp.take_along_axis(phip, idx + 1, axis=0)
    dphi, alp_prs, alp_g = eos.delphi(prs, p_g, t_g, s_g)
    phi_side = phi_g - dphi
    base = phip_g + p_g * alp_g
    return phi_side, base, alp_prs


def _pgforc_geopotential(grid: Grid, temp, saln, dp, phi_bot, p, pu, pv,
                         dpu_n, dpv_n):
    """PGF as the gradient of geopotential on pressure surfaces
    (pgforc_geopotential, mod_pgforc.F90:95-260)."""
    kk = grid.kk
    iu, iv = grid.iu, grid.iv
    im1, jm1 = grid.im1, grid.jm1

    # --- interface geopotential phi and the bottom-pressure response
    # integral phip, bottom-up recursions (mod_pgforc.F90:111-135).
    dphi_l, alpu_l, alpl_l = eos.delphi(p[:-1], p[1:], temp, saln)
    thin = dp < epsilp
    dphi_l = jnp.where(thin, 0.0, dphi_l)
    phip_inc = jnp.where(thin, 0.0, p[1:] * alpl_l - p[:-1] * alpu_l)
    # phi[k] = phi[k+1] - dphi_l[k]; phip[kk] = 0, phip[k] = phip[k+1]+inc
    phi = jnp.concatenate(
        [phi_bot[None] - _revcumsum(dphi_l), phi_bot[None]], axis=0)
    phip = jnp.concatenate(
        [_revcumsum(phip_inc), jnp.zeros_like(phip_inc[:1])], axis=0)

    # --- u-point PGF (mod_pgforc.F90:144-209)
    prs_u = (pu[1:] - .5 * dpu_n) * iu
    phi_p, base_p, alpup = _side_eval(p, temp, saln, phi, phip, prs_u)
    phi_m, base_m, alpum = _side_eval(
        im1(p), im1(temp), im1(saln), im1(phi), im1(phip), prs_u)
    cp = .25 * (p[1:] + p[:-1])
    cm = .25 * (im1(p)[1:] + im1(p)[:-1])
    q = prs_u / jnp.maximum(cp + cm, epsilp)
    cp, cm = q * cp, q * cm
    pgfx = -(phi_p - phi_m) * iu
    xixp = jnp.sum((base_p - cp * (alpup - alpum)) * dpu_n, axis=0) * iu
    xixm = jnp.sum((base_m - cm * (alpum - alpup)) * dpu_n, axis=0) * iu
    pgfxm = jnp.sum(pgfx * dpu_n, axis=0) * iu

    # --- v-point PGF (mod_pgforc.F90:211-252)
    prs_v = (pv[1:] - .5 * dpv_n) * iv
    phi_p, base_p, alpvp = _side_eval(p, temp, saln, phi, phip, prs_v)
    phi_m, base_m, alpvm = _side_eval(
        jm1(p), jm1(temp), jm1(saln), jm1(phi), jm1(phip), prs_v)
    cp = .25 * (p[1:] + p[:-1])
    cm = .25 * (jm1(p)[1:] + jm1(p)[:-1])
    q = prs_v / jnp.maximum(cp + cm, epsilp)
    cp, cm = q * cp, q * cm
    pgfy = -(phi_p - phi_m) * iv
    xiyp = jnp.sum((base_p - cp * (alpvp - alpvm)) * dpv_n, axis=0) * iv
    xiym = jnp.sum((base_m - cm * (alpvm - alpvp)) * dpv_n, axis=0) * iv
    pgfym = jnp.sum(pgfy * dpv_n, axis=0) * iv

    return phi, pgfx, pgfy, pgfxm, pgfym, xixp, xixm, xiyp, xiym


def _finalize(grid: Grid, s: State, n: int, phi, pgfx, pgfy, pgfxm, pgfym,
              xixp, xixm, xiyp, xiym) -> State:
    """Normalize the vertically averaged PGF fields by the predicted
    bottom pressures and split off the bottom-pressure sensitivities
    consumed by the barotropic solver (mod_pgforc.F90:539-594)."""
    iu, iv, ip = grid.iu, grid.iv, grid.ip
    im1, jm1 = grid.im1, grid.jm1

    qu = iu / jnp.maximum(s.pbu_p, epsilp)
    qv = iv / jnp.maximum(s.pbv_p, epsilp)
    pgfxm = pgfxm * qu
    xixp = xixp * qu
    xixm = xixm * qu
    pgfym = pgfym * qv
    xiyp = xiyp * qv
    xiym = xiym * qv

    pgfx = (pgfx - pgfxm) * iu
    pgfy = (pgfy - pgfym) * iv

    pb_p_safe = jnp.maximum(s.pb_p, epsilp)
    pgfxm = (pgfxm + xixp - xixm) * iu
    xixp = xixp / pb_p_safe * iu
    xixm = xixm / jnp.maximum(im1(s.pb_p), epsilp) * iu
    pgfym = (pgfym + xiyp - xiym) * iv
    xiyp = xiyp / pb_p_safe * iv
    xiym = xiym / jnp.maximum(jm1(s.pb_p), epsilp) * iv

    sealv = phi[0] / grav * ip

    return dataclasses.replace(
        s,
        phi=phi,
        pgfx=s.pgfx.at[n].set(pgfx), pgfy=s.pgfy.at[n].set(pgfy),
        pgfxm=s.pgfxm.at[n].set(pgfxm), pgfym=s.pgfym.at[n].set(pgfym),
        xixp=s.xixp.at[n].set(xixp), xixm=s.xixm.at[n].set(xixm),
        xiyp=s.xiyp.at[n].set(xiyp), xiym=s.xiym.at[n].set(xiym),
        sealv=sealv)
