"""Baroclinic mass-flux correction toward the barotropic bottom pressure.

TPU-native re-design of the reference correction
(reference: /root/reference/phy/mod_pbcor.F90).  pbcor1
(mod_pbcor.F90:66-414) corrects the advected (new time level) thicknesses
toward the predicted bottom pressure before the barotropic solve; pbcor2
(:416-759) corrects the mid level toward the solved bottom pressure.
Only the 'uc' (upstream column) method this round; 'dluc' later."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import eos
from ..core.constants import epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p

dpeps1 = 1.e-5   # (mod_pbcor.F90:57-60)
dpeps2 = 1.e-7


def _upstream_column_fluxes(grid: Grid, utot, vtot, dp_k, temp_k, saln_k,
                            p_bot):
    """'uc' column fluxes: distribute the residual barotropic transport
    over layers in proportion to the upstream column's thickness profile
    (mod_pbcor.F90:167-238)."""
    im1, jm1 = grid.im1, grid.jm1
    pb_safe = jnp.maximum(p_bot, epsilp)
    frac_w = im1(dp_k) / jnp.maximum(im1(pb_safe), epsilp)
    frac_c = dp_k / pb_safe
    upos = utot > 0.
    uflux = jnp.where(upos, utot * frac_w, utot * frac_c) * grid.iu
    uflux2 = uflux * jnp.where(upos, im1(saln_k), saln_k)
    uflux3 = uflux * jnp.where(upos, im1(temp_k), temp_k)

    frac_s = jm1(dp_k) / jnp.maximum(jm1(pb_safe), epsilp)
    vpos = vtot > 0.
    vflux = jnp.where(vpos, vtot * frac_s, vtot * frac_c) * grid.iv
    vflux2 = vflux * jnp.where(vpos, jm1(saln_k), saln_k)
    vflux3 = vflux * jnp.where(vpos, jm1(temp_k), temp_k)
    return uflux, uflux2, uflux3, vflux, vflux2, vflux3


def pbcor1(grid: Grid, s: State, m: int, n: int, dlt) -> State:
    """Pre-barotropic thickness correction (mod_pbcor.F90:66-414)."""
    ip, iu, iv = grid.ip, grid.iu, grid.iv
    ip1, jp1 = grid.ip1, grid.jp1
    jp1vv = lambda a: grid.jp1(a, 'v', True)   # noqa: E731 (fold-aware)

    p = cumulative_p(s.dp[n]) * ip
    p_bot = p[grid.kk]

    utot = (dlt * s.ubflxs_p[m] - jnp.sum(s.uflx[m], axis=0)) * iu
    vtot = (dlt * s.vbflxs_p[m] - jnp.sum(s.vflx[m], axis=0)) * iv

    uflux, uflux2, uflux3, vflux, vflux2, vflux3 = _upstream_column_fluxes(
        grid, utot, vtot, s.dp[n], s.temp[n], s.saln[n], p_bot)
    upos, vpos = (utot > 0.)[None], (vtot > 0.)[None]
    uflxtr = uflux[None] * jnp.where(upos, grid.im1(s.trc[n]), s.trc[n])
    vflxtr = vflux[None] * jnp.where(vpos, grid.jm1(s.trc[n]), s.trc[n])

    dpo = s.dp[n]
    dp_new = jnp.maximum(0., dpo - (ip1(uflux) - uflux
                                    + jp1vv(vflux) - vflux) * grid.scp2i) * ip
    dpo_e = dpo + dpeps1
    dpni = 1. / (dp_new + dpeps1)
    saln_new = (dpo_e * s.saln[n]
                - (ip1(uflux2) - uflux2 + jp1vv(vflux2) - vflux2)
                * grid.scp2i) * dpni * ip
    temp_new = (dpo_e * s.temp[n]
                - (ip1(uflux3) - uflux3 + jp1vv(vflux3) - vflux3)
                * grid.scp2i) * dpni * ip
    trc_new = (dpo_e[None] * s.trc[n]
               - (grid.ip1(uflxtr) - uflxtr + grid.jp1(vflxtr, 'v', True) - vflxtr)
               * grid.scp2i) * dpni[None] * ip
    dp_new = jnp.where(dp_new < dpeps2, 0., dp_new)

    # rescale column to the predicted bottom pressure (mod_pbcor.F90:376-400)
    pbot_new = jnp.sum(dp_new, axis=0)
    pbfac = s.pb_p / jnp.maximum(pbot_new, epsilp)
    dp_new = dp_new * pbfac * ip

    return dataclasses.replace(
        s,
        dp=s.dp.at[n].set(dp_new),
        temp=s.temp.at[n].set(temp_new),
        saln=s.saln.at[n].set(saln_new),
        trc=s.trc.at[n].set(trc_new),
        uflx=s.uflx.at[m].add(uflux),
        vflx=s.vflx.at[m].add(vflux),
        usflx=s.usflx.at[m].add(uflux2),
        utflx=s.utflx.at[m].add(uflux3),
        vsflx=s.vsflx.at[m].add(vflux2),
        vtflx=s.vtflx.at[m].add(vflux3))


def pbcor2(grid: Grid, e: eos.EosParams, s: State, m: int, n: int,
           dlt) -> State:
    """Post-barotropic thickness correction (mod_pbcor.F90:416-759)."""
    ip, iu, iv = grid.ip, grid.iu, grid.iv
    ip1, jp1 = grid.ip1, grid.jp1
    jp1vv = lambda a: grid.jp1(a, 'v', True)   # noqa: E731 (fold-aware)

    dp_m = (jnp.maximum(0., s.dp[m]) + epsilp) * ip
    p = cumulative_p(dp_m) * ip
    p_bot = p[grid.kk]

    utot = (dlt * s.ubflxs[n] - jnp.sum(s.uflx[n], axis=0)) * iu
    vtot = (dlt * s.vbflxs[n] - jnp.sum(s.vflx[n], axis=0)) * iv

    uflux, uflux2, uflux3, vflux, vflux2, vflux3 = _upstream_column_fluxes(
        grid, utot, vtot, dp_m, s.temp[m], s.saln[m], p_bot)
    upos, vpos = (utot > 0.)[None], (vtot > 0.)[None]
    uflxtr = uflux[None] * jnp.where(upos, grid.im1(s.trc[m]), s.trc[m])
    vflxtr = vflux[None] * jnp.where(vpos, grid.jm1(s.trc[m]), s.trc[m])

    dpo = dp_m
    dp_new = dpo - grid.scp2i * (ip1(uflux) - uflux + jp1vv(vflux) - vflux)
    dpni = ip / jnp.maximum(dp_new, epsilp * .5)
    saln_new = (dpo * s.saln[m]
                - grid.scp2i * (ip1(uflux2) - uflux2
                                + jp1vv(vflux2) - vflux2)) * dpni
    temp_new = (dpo * s.temp[m]
                - grid.scp2i * (ip1(uflux3) - uflux3
                                + jp1vv(vflux3) - vflux3)) * dpni
    trc_new = (dpo[None] * s.trc[m]
               - grid.scp2i * (grid.ip1(uflxtr) - uflxtr
                               + grid.jp1(vflxtr, 'v', True) - vflxtr)) * dpni[None]
    sigma_new = eos.sig(e, temp_new, saln_new) * ip
    dp_new = dp_new - epsilp
    dp_new = jnp.where(dp_new < dpeps2, 0., dp_new) * ip

    # rescale column to the barotropic bottom pressure (mod_pbcor.F90:716-741)
    pbot_new = jnp.sum(dp_new, axis=0)
    pbfac = s.pb[m] / jnp.maximum(pbot_new, epsilp)
    dp_new = dp_new * pbfac * ip
    p_new = cumulative_p(dp_new) * ip

    return dataclasses.replace(
        s,
        dp=s.dp.at[m].set(dp_new),
        temp=s.temp.at[m].set(temp_new),
        saln=s.saln.at[m].set(saln_new),
        trc=s.trc.at[m].set(trc_new),
        sigma=s.sigma.at[m].set(sigma_new),
        p=p_new,
        uflx=s.uflx.at[n].add(uflux),
        vflx=s.vflx.at[n].add(vflux),
        usflx=s.usflx.at[n].add(uflux2),
        utflx=s.utflx.at[n].add(uflux3),
        vsflx=s.vsflx.at[n].add(vflux2),
        vtflx=s.vtflx.at[n].add(vflux3))
