"""Shared derived fields: buoyancy frequency, neutral slopes, MLD.

TPU-native re-design of the reference common-field routines
(reference: /root/reference/phy/mod_cmnfld_routines.F90 — interface/layer
buoyancy frequency squared with vertical smoothing (cmnfld_bfsqf_*,
:61-421), neutral-surface slope vectors (cmnfld_nslope_*, :423-883), and
mixed-layer depth diagnostics (:933-1084)).

Round-1 scope (ALE path): interface BFSQ with a 1-2-1 vertical filter
standing in for the reference's diffusion-equation smoothing, the
neutral-slope formula nslp = (g*rho_x/(rho0*N2) + phi_x/g)/dx evaluated
densely at all interior interfaces, and a density-criterion MLD."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import eos
from ..core.constants import grav, rho0, onem, onemu, epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p

bfsqmn = 1.e-7   # minimum filtered BFSQ [s-2] (mod_cmnfld.F90 parameter)


class CmnFields(NamedTuple):
    bfsqi: jnp.ndarray   # (kk+1, H) interface buoyancy freq^2 [s-2]
    bfsqf: jnp.ndarray   # (kk+1, H) filtered, bounded below
    nslpx: jnp.ndarray   # (kk+1, H) x neutral slope at u [dimensionless]
    nslpy: jnp.ndarray   # (kk+1, H) y neutral slope at v
    mld: jnp.ndarray     # (H) mixed layer depth [m]


def cmnfld(grid: Grid, e: eos.EosParams, s: State, n: int) -> CmnFields:
    """Compute BFSQ, neutral slopes and MLD for time level n (cmnfld2,
    mod_cmnfld_routines.F90:1158-1240 staging)."""
    kk = grid.kk
    ip, iu, iv = grid.ip, grid.iu, grid.iv
    im1, jm1 = grid.im1, grid.jm1

    dp = s.dp[n]
    temp, saln = s.temp[n], s.saln[n]
    p = cumulative_p(dp) * ip

    # ---- interface BFSQ: N2 = g^2 * d(rho)/dp with rho of adjacent
    # layers evaluated at the shared interface pressure
    # (cmnfld_bfsqf_*, mod_cmnfld_routines.F90:92-100 structure)
    pm = p[1:-1]
    rho_lo = eos.rho(pm, temp[1:], saln[1:])
    rho_up = eos.rho(pm, temp[:-1], saln[:-1])
    dp_mid = jnp.maximum(.5 * (dp[:-1] + dp[1:]), onemu)
    n2 = grav * grav * (rho_lo - rho_up) / dp_mid      # (kk-1, H)
    zt = jnp.zeros_like(n2[:1])
    bfsqi = jnp.concatenate([zt, n2, zt], axis=0)
    bfsqi = bfsqi.at[0].set(bfsqi[1]).at[kk].set(bfsqi[kk - 1])

    # vertical 1-2-1 smoothing + lower bound (stand-in for the
    # diffusion-equation filter, mod_cmnfld_routines.F90:118-210)
    up = jnp.concatenate([bfsqi[:1], bfsqi[:-1]], axis=0)
    dn = jnp.concatenate([bfsqi[1:], bfsqi[-1:]], axis=0)
    bfsqf = jnp.maximum(.25 * up + .5 * bfsqi + .25 * dn, bfsqmn)

    # ---- interface geopotential (hydrostatic; :436-453)
    phi_bot = s.phi[kk]
    dphi_layer = eos.p_alpha(p[:-1], p[1:], temp, saln)
    phi = jnp.concatenate(
        [phi_bot[None]
         + jnp.flip(jnp.cumsum(jnp.flip(dphi_layer, 0), 0), 0),
         phi_bot[None]], axis=0)

    # ---- neutral slopes at interior interfaces (:497-528):
    # nslp = (g*rho_x/(rho0*bfsqf) + phi_x/g) / dx
    # rho_x: average of the two adjacent layers' in-situ density
    # difference at the shared interface pressure.

    # x-slope at u points
    pmn_u = .5 * (pm + im1(pm))
    rho_c = eos.rho(pmn_u, temp[:-1], saln[:-1])
    rho_cl = eos.rho(pmn_u, temp[1:], saln[1:])
    rho_x = .5 * ((rho_c - im1(rho_c)) + (rho_cl - im1(rho_cl)))
    phi_x = phi[1:-1] - im1(phi[1:-1])
    bfsqm_u = .5 * (bfsqf[1:-1] + im1(bfsqf[1:-1]))
    nslpx_i = (grav * rho_x / (rho0 * bfsqm_u) + phi_x / grav) \
        * grid.scuxi * iu
    nslpx = jnp.concatenate([zt, nslpx_i, zt], axis=0)

    # y-slope at v points
    pmn_v = .5 * (pm + jm1(pm))
    rho_c = eos.rho(pmn_v, temp[:-1], saln[:-1])
    rho_cl = eos.rho(pmn_v, temp[1:], saln[1:])
    rho_y = .5 * ((rho_c - jm1(rho_c)) + (rho_cl - jm1(rho_cl)))
    phi_y = phi[1:-1] - jm1(phi[1:-1])
    bfsqm_v = .5 * (bfsqf[1:-1] + jm1(bfsqf[1:-1]))
    nslpy_i = (grav * rho_y / (rho0 * bfsqm_v) + phi_y / grav) \
        * grid.scvyi * iv
    nslpy = jnp.concatenate([zt, nslpy_i, zt], axis=0)

    # ---- MLD: density criterion (mld diagnostics, :933-1084 lev82-like)
    sig0v = eos.sig0(e, temp, saln)
    deeper = sig0v > sig0v[0] + .03
    z_mid = (p[:-1] + .5 * dp) / onem
    mld = jnp.min(jnp.where(deeper, z_mid, p[kk] / onem), axis=0)
    mld = jnp.maximum(mld, 1.0) * ip

    return CmnFields(bfsqi=bfsqi * ip, bfsqf=bfsqf * ip,
                     nslpx=nslpx, nslpy=nslpy, mld=mld)
