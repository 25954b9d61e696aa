"""Vertical mixing coefficients and surface-flux penetration (ALE path).

TPU-native equivalents of the reference's vertical-physics chain for the
hybrid vertical coordinate (mod_blom_step.F90:196-207):

- `ale_forcing` (reference: /root/reference/phy/mod_ale_forcing.F90):
  shortwave and brine penetration factors and interface buoyancy flux;
- `difest_vertical` (reference: /root/reference/phy/mod_difest.F90
  difest_vertical_hybrid, which wraps the external CVMix library):
  interface diffusivities/viscosity.  This round implements a CVMix-lite
  interior scheme — LMD94 shear-instability mixing, constant background
  (the deck's BDMTYP=2/BDMC2, tests/fuk95/limits:329-331) and enhanced
  convective mixing — while the full KPP boundary-layer scheme (OBL
  depth, interior matching, nonlocal transport) is a later round; the
  nonlocal profiles here collapse the surface fluxes into the top layer,
  which is KPP's limit for an unresolved boundary layer.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import eos
from ..core.constants import grav, alpha0, spcifh, onem, onemu, epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from .forcing import Forcing
from .swabs import SwabsFields, swamxd


class VmixParams(NamedTuple):
    bdmc2: float = 1.e-5      # background diapycnal diffusivity [m2 s-1]
    nubmin: float = 1.e-6     # minimum background viscosity [m2 s-1]
    nu_shear0: float = 5.e-3  # LMD94 max shear diffusivity [m2 s-1]
    ri0: float = .7           # LMD94 critical Richardson number
    kv_conv: float = .1       # convective-instability diffusivity [m2 s-1]
    visc_bg: float = 1.e-4    # background viscosity [m2 s-1]
    brine_mlbase_frac: float = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VmixFields:
    """Interface mixing coefficients and penetration factors.

    Kvisc_m/Kdiff_t/Kdiff_s: (kk, H), index k = interface above layer k
    (index 0 unused, the surface has no diffusive flux);
    *_nonloc: (kk+1, H) cumulative flux-penetration factors;
    buoyfl: (kk+1, H) interface buoyancy flux [m2 s-3]."""
    Kvisc_m: jax.Array
    Kdiff_t: jax.Array
    Kdiff_s: jax.Array
    t_sw_nonloc: jax.Array
    s_br_nonloc: jax.Array
    t_ns_nonloc: jax.Array
    s_nb_nonloc: jax.Array
    t_rs_nonloc: jax.Array
    s_rs_nonloc: jax.Array
    buoyfl: jax.Array
    mld: jax.Array          # mixed layer depth [m]


def _surface_collapsed(kk, shape, dtype):
    nl = jnp.zeros((kk + 1,) + tuple(shape), dtype)
    return nl.at[0].set(1.0)


def _penetration_profile(p, dp, pmax, raw):
    """Redistribute the below-column remainder of a penetration profile
    (mod_ale_forcing.F90:96-117): below pmax (or the sea floor) the
    profile is zero, and the remainder is absorbed linearly-in-pressure
    over the column above."""
    kk = dp.shape[0]
    # deepest interface receiving flux: first interface k (1-based
    # 2..kk+1) with p >= pmax ends the profile
    active = p[1:] <= pmax                      # (kk, H): interface k+1 active
    # kmax+1 interface pressure (cap of absorption)
    p_cap = jnp.minimum(pmax, p[-1])
    # nlbot: raw value at the cap
    nlbot = (raw[-1] * 0.)
    # find raw at the first inactive interface (or bottom)
    below = jnp.concatenate([jnp.zeros_like(active[:1]), ~active], axis=0)
    first_below = jnp.cumsum(below.astype(jnp.int32), axis=0) == 1
    nlbot = jnp.sum(jnp.where(first_below, raw, 0.), axis=0)
    has_below = jnp.any(first_below, axis=0)
    nlbot = jnp.where(has_below, nlbot, raw[-1])
    p_capc = jnp.where(has_below, jnp.minimum(pmax, jnp.sum(
        jnp.where(first_below, p, 0.), axis=0)), p_cap)
    pmaxi = 1.0 / jnp.maximum(p_capc, epsilp)

    interior = jnp.concatenate(
        [jnp.ones_like(active[:1]), active], axis=0)   # (kk+1, H)
    nl = jnp.where(interior, raw - nlbot * p * pmaxi * (p > 0.), 0.)
    nl = nl.at[0].set(1.0)
    return nl


def ale_forcing(grid: Grid, e: eos.EosParams, s: State, forcing: Forcing,
                swabs: SwabsFields, par: VmixParams, n: int,
                mld) -> dict:
    """Penetration factors + buoyancy flux (mod_ale_forcing.F90:45-223)."""
    kk = grid.kk
    dp = s.dp[n]
    p = cumulative_p(dp) * grid.ip

    # shortwave penetration (mod_ale_forcing.F90:54-120)
    pmax_sw = swamxd * onem
    lei1 = 1.0 / (swabs.swal1 * onem)
    lei2 = 1.0 / (swabs.swal2 * onem)
    raw_sw = (swabs.swfc1 * jnp.exp(-lei1 * jnp.minimum(pmax_sw, p))
              + swabs.swfc2 * jnp.exp(-lei2 * jnp.minimum(pmax_sw, p)))
    raw_sw = raw_sw.at[0].set(1.0)
    t_sw = _penetration_profile(p, dp, pmax_sw, raw_sw)

    # brine penetration (mod_ale_forcing.F90:122-176)
    cbra1 = 2.0 ** (1.0 / 3.0)
    cbra2 = cbra1 * cbra1 / 12.0
    mldp = jnp.maximum(mld, 1.0) * onem
    pmax_br = cbra1 * mldp
    q = jnp.minimum(cbra1, p / mldp)
    q_c = q / cbra1
    q3 = q * q * q
    q_c3 = q_c * q_c * q_c
    fb = par.brine_mlbase_frac
    raw_br = (fb * (1. - cbra2 * q * q3 * (7. - 2. * q3))
              + (1. - fb) * (1. - q + q_c3 * q_c3
                             * (6. * cbra1 - 7. - (5. * cbra1 - 6.) * q_c)))
    raw_br = raw_br.at[0].set(1.0)
    s_br = _penetration_profile(p, dp, pmax_br, raw_br)

    # buoyancy flux (mod_ale_forcing.F90:178-214)
    cpi = 1.0 / spcifh
    gaa = grav * alpha0 * alpha0
    t1, s1 = s.temp[n][0], s.saln[n][0]
    dsgdt = eos.dsigdt0(e, t1, s1)
    dsgds = eos.dsigds0(e, t1, s1)
    hf = forcing.surflx
    hfsw = forcing.sswflx
    sf = forcing.salflx
    sfbr = forcing.brnflx
    buoyfl = -(dsgdt * t_sw * hfsw * cpi + dsgds * s_br * sfbr) * gaa
    buoyfl = buoyfl.at[0].set(-(dsgdt * hf * cpi + dsgds * sf) * gaa)

    return dict(t_sw_nonloc=t_sw, s_br_nonloc=s_br, buoyfl=buoyfl)


def difest_vertical(grid: Grid, e: eos.EosParams, s: State,
                    forcing: Forcing, swabs: SwabsFields,
                    par: VmixParams, n: int) -> VmixFields:
    """Interface mixing coefficients (CVMix-lite; see module docstring).

    Replaces difest_vertical_hybrid (mod_difest.F90) + CVMix: LMD94
    shear instability + constant background + convective enhancement."""
    kk = grid.kk
    dtype = s.dp.dtype
    dp = s.dp[n]
    sig = s.sigma[n]
    p = cumulative_p(dp) * grid.ip

    # mixed layer depth [m]: density criterion dsig = 0.03 kg/m3
    sig0v = eos.sig0(e, s.temp[n], s.saln[n])
    dcrit = 0.03
    deeper = sig0v > sig0v[0] + dcrit
    z_mid = (p[:-1] + .5 * dp) / onem
    mld = jnp.min(jnp.where(deeper, z_mid, p[kk] / onem), axis=0)
    mld = jnp.maximum(mld, 1.0)

    # interface N^2 and shear^2 (interfaces above layers k = 1..kk-1)
    dp_mid = jnp.maximum(.5 * (dp[:-1] + dp[1:]), onemu)
    n2 = grav * grav * (sig[1:] - sig[:-1]) / dp_mid

    u_p = .5 * (s.u[n] + grid.ip1(s.u[n]))
    v_p = .5 * (s.v[n] + grid.jp1(s.v[n]))
    dz = dp_mid * alpha0 / grav
    shear2 = ((u_p[1:] - u_p[:-1]) ** 2 + (v_p[1:] - v_p[:-1]) ** 2) \
        / (dz * dz)

    ri = n2 / jnp.maximum(shear2, 1e-14)
    x = jnp.clip(ri / par.ri0, 0., 1.)
    nu_shear = par.nu_shear0 * (1. - x * x) ** 3
    conv = jnp.where(n2 < 0., par.kv_conv, 0.)

    kdiff = nu_shear + conv + par.bdmc2
    kvisc = jnp.maximum(nu_shear + conv + par.visc_bg, par.nubmin)

    zero_top = jnp.zeros_like(kdiff[:1])
    Kdiff = jnp.concatenate([zero_top, kdiff], axis=0) * grid.ip
    Kvisc = jnp.concatenate([zero_top, kvisc], axis=0) * grid.ip

    nl_surface = _surface_collapsed(kk, grid.shape, dtype) * grid.ip

    pen = ale_forcing(grid, e, s, forcing, swabs, par, n, mld)

    return VmixFields(
        Kvisc_m=Kvisc, Kdiff_t=Kdiff, Kdiff_s=Kdiff,
        t_sw_nonloc=pen['t_sw_nonloc'], s_br_nonloc=pen['s_br_nonloc'],
        t_ns_nonloc=nl_surface, s_nb_nonloc=nl_surface,
        t_rs_nonloc=nl_surface, s_rs_nonloc=nl_surface,
        buoyfl=pen['buoyfl'], mld=mld)
