"""Generic model initialization from configuration initial conditions.

TPU-native re-design of the reference init path
(reference: /root/reference/phy/mod_inicon.F90:932-1459 inicon generic
part; /root/reference/phy/mod_blom_init.F90:203-444 blom_init_phase2).
Consumes per-experiment initial profiles (interface geopotential, layer
sigma/temp/saln) and produces a fully initialized State."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import eos
from .constants import grav, epsilp
from .grid import Grid
from .state import State, empty_state, cumulative_p, dpu_dpv_upstream


def getpl(e_th, e_s, phiu, phil, pup, iters: int = 12):
    """Lower interface pressure from layer T/S and the geopotential at
    both interfaces (getpl, mod_inicon.F90:105-137).  Newton iteration on
    the hydrostatic integral; fixed iteration count (quadratic
    convergence makes 12 ample) instead of the reference's while loop."""
    plo = pup - eos.rho(pup, e_th, e_s) * (phil - phiu)

    def body(_, plo):
        dphi, _, alpl = eos.delphi(pup, plo, e_th, e_s)
        q = (phil - phiu - dphi) / alpl
        return plo - q

    return jax.lax.fori_loop(0, iters, body, plo)


def init_state(grid: Grid, e: eos.EosParams, *, phi, temp, saln, sigmar,
               v=None, u=None, delt1, dlt,
               dtype=jnp.float64, ntr: int = 0) -> State:
    """Build the initial State (inicon, mod_inicon.F90:932-1459).

    phi: (kk+1, H) interface geopotential [m2 s-2]; temp/saln/sigmar:
    (kk, H); u/v: optional (kk, H) initial velocities."""
    kk = grid.kk
    ip, iu, iv, iq = grid.ip, grid.iu, grid.iv, grid.iq
    im1, jm1, ip1 = grid.im1, grid.jm1, grid.ip1

    s = empty_state(grid, dtype, ntr=ntr)

    temp = jnp.asarray(temp, dtype)
    saln = jnp.asarray(saln, dtype)
    phi = jnp.asarray(phi, dtype)
    sigmar = jnp.asarray(sigmar, dtype)

    # freeze bound + consistent sigma (mod_inicon.F90:986-1040 default)
    temp = jnp.maximum(eos.tfrz(e, saln), temp)
    sigma = eos.sig(e, temp, saln)

    # hydrostatic interface pressures (mod_inicon.F90:1046-1068)
    def scan_p(pup, xs):
        th, sl, phiu, phil = xs
        plo = getpl(th, sl, phiu, phil, pup)
        return plo, plo

    p0 = getpl(temp[0], saln[0], jnp.zeros_like(phi[0]), phi[0],
               jnp.zeros_like(phi[0]))
    _, p_rest = jax.lax.scan(scan_p, p0, (temp, saln, phi[:-1], phi[1:]))
    p = jnp.concatenate([p0[None], p_rest], axis=0) * ip

    dp = (p[1:] - p[:-1]) * ip
    p = cumulative_p(dp) * ip

    # bottom pressures (mod_inicon.F90:1088-1127)
    pbot = p[kk]
    pb = jnp.stack([pbot, pbot])
    pbu1 = jnp.minimum(pbot, im1(pbot)) * iu
    pbv1 = jnp.minimum(pbot, jm1(pbot)) * iv

    dpu, dpv = dpu_dpv_upstream(grid, p)
    pu = cumulative_p(dpu)
    pv = cumulative_p(dpv)

    # NOTE: the reference applies a direct ALE regrid at init for hybrid
    # vertical coordinates (mod_inicon.F90:1154-1159); wired in once the
    # ALE machinery lands.

    # kfpla and trace-layer collapse (mod_inicon.F90:1370-1399): gather
    # vanishing interior layers (k >= 3) into the first thick one.
    def collapse(carry, xs):
        dps, kf, found = carry
        dp_k, k_idx = xs
        thin = dp_k < epsilp
        take = (~found) & thin
        dps = dps + jnp.where(take, dp_k, 0.)
        newfound = found | (~thin)
        add_here = (~found) & (~thin)
        dp_out = jnp.where(take, 0., dp_k) + jnp.where(add_here, dps, 0.)
        dps = jnp.where(add_here, 0., dps)
        kf = jnp.where(add_here & (kf < 0), k_idx, kf)
        return (dps, kf, newfound), dp_out

    if kk > 2:
        init_carry = (jnp.zeros_like(dp[0]),
                      jnp.full(grid.shape, -1, jnp.int32),
                      jnp.zeros(grid.shape, bool))
        (dps_left, kf, found), dp_int = jax.lax.scan(
            collapse, init_carry, (dp[2:], jnp.arange(2, kk, dtype=jnp.int32)))
        # leftover goes to layer 2 (1-based) if no thick interior layer
        dp2 = dp[1] + jnp.where(found, 0., dps_left)
        kf = jnp.where(found, kf, kk)
        dp = jnp.concatenate([dp[:1], dp2[None], dp_int], axis=0) * ip
        kfpla = jnp.stack([kf, kf])
    else:
        kfpla = jnp.full((2,) + grid.shape, 2, jnp.int32)

    p = cumulative_p(dp) * ip

    # pvtrop (mod_inicon.F90:1190-1230): same dense rule as barotp.
    pbp = jnp.maximum(pbot, epsilp)
    pvt = jnp.zeros_like(pbot)
    pvt = jnp.where(jm1(iu) > 0,
                    grid.corioq * 2. / (jm1(pbp) + im1(jm1(pbp))), pvt)
    pvt = jnp.where(iu > 0, grid.corioq * 2. / (pbp + im1(pbp)), pvt)
    pvt = jnp.where(im1(iv) > 0,
                    grid.corioq * 2. / (im1(pbp) + im1(jm1(pbp))), pvt)
    pvt = jnp.where(iv > 0, grid.corioq * 2. / (pbp + jm1(pbp)), pvt)
    pvt = jnp.where(iq > 0,
                    grid.corioq * 4.
                    / (pbp + im1(pbp) + jm1(pbp) + im1(jm1(pbp))), pvt)
    pvtrop = jnp.stack([pvt, pvt])

    # velocity separation (mod_inicon.F90:1232-1296)
    if u is None:
        u = jnp.zeros_like(dp)
    if v is None:
        v = jnp.zeros_like(dp)
    u = jnp.asarray(u, dtype) * iu
    v = jnp.asarray(v, dtype) * iv
    ub1 = jnp.sum(u * dpu, axis=0) / jnp.maximum(pbu1, epsilp) * iu
    vb1 = jnp.sum(v * dpv, axis=0) / jnp.maximum(pbv1, epsilp) * iv
    u = (u - ub1) * iu
    v = (v - vb1) * iv

    tsfac = delt1 / dlt
    ubflx_mn1 = ub1 * pbu1 * grid.scuy
    vbflx_mn1 = vb1 * pbv1 * grid.scvx
    ubflxs1 = ubflx_mn1 * tsfac
    vbflxs1 = vbflx_mn1 * tsfac

    # initial barotropic coriolis sums (mod_inicon.F90:1298-1330)
    jp1 = grid.jp1
    vsx = vbflx_mn1 * grid.scvxi
    ubcors_p = (vsx + jp1(vsx) + im1(vsx) + im1(jp1(vsx))) \
        * (pvt + jp1(pvt)) * .125 * tsfac * iu
    usy = ubflx_mn1 * grid.scuyi
    vbcors_p = -(usy + ip1(usy) + jm1(usy) + ip1(jm1(usy))) \
        * (pvt + ip1(pvt)) * .125 * tsfac * iv

    two = lambda a: jnp.stack([a, a])
    s = dataclasses.replace(
        s,
        u=two(u), v=two(v), dp=two(dp),
        dpu=two(dpu), dpv=two(dpv),
        temp=two(temp * ip), saln=two(saln * ip), sigma=two(sigma * ip),
        p=p, pu=pu, pv=pv, phi=phi * ip,
        pb=pb, pbu=two(pbu1), pbv=two(pbv1),
        pb_p=pbot, pbu_p=pbu1, pbv_p=pbv1,
        pb_mn=pb, ubflx_mn=two(ubflx_mn1), vbflx_mn=two(vbflx_mn1),
        ubflx=two(ubflx_mn1), vbflx=two(vbflx_mn1),
        ubflxs=jnp.stack([ubflxs1, ubflxs1, ubflxs1]),
        vbflxs=jnp.stack([vbflxs1, vbflxs1, vbflxs1]),
        ubflxs_p=two(ubflxs1), vbflxs_p=two(vbflxs1),
        ubcors_p=ubcors_p, vbcors_p=vbcors_p,
        pvtrop=pvtrop,
        dpold=two(dp), dpuold=dpu, dpvold=dpv,
        told=temp * ip, sold=saln * ip,
        sigmar=sigmar * ip,
        kfpla=kfpla)

    # PGF fields at init (mod_inicon.F90:1336-1368): call pgforc with
    # (m, n) = (1, 0) then copy level 0 -> 1.
    from ..dynamics.pgforc import pgforc
    s = pgforc(grid, e, s, m=1, n=0)
    s = dataclasses.replace(
        s,
        pgfx=s.pgfx.at[1].set(s.pgfx[0]),
        pgfy=s.pgfy.at[1].set(s.pgfy[0]),
        pgfxm=s.pgfxm.at[1].set(s.pgfxm[0]),
        pgfym=s.pgfym.at[1].set(s.pgfym[0]),
        xixp=s.xixp.at[1].set(s.xixp[0]),
        xixm=s.xixm.at[1].set(s.xixm[0]),
        xiyp=s.xiyp.at[1].set(s.xiyp[0]),
        xiym=s.xiym.at[1].set(s.xiym[0]))

    return s
