"""Baroclinic pressure-gradient force.

TPU-native re-design of the reference PGF module
(reference: /root/reference/phy/mod_pgforc.F90).  Column recursions are
expressed as (reversed) cumulative sums over the k axis; horizontal
differences are mask-multiplied stencil shifts.  Both PGF methods are
implemented: 'geopotential' (pgforc_geopotential, mod_pgforc.F90:96-263)
is deferred to a later round; 'dynamic enthalpy'
(pgforc_dynamic_enthalpy, :265-437) is the default used by every shipped
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

    if pgfmth != 'dynamic enthalpy':
        raise NotImplementedError(
            "only pgfmth='dynamic enthalpy' this round (mod_pgforc.F90:527)")

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

    # --- finalize (mod_pgforc.F90:539-594)
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
