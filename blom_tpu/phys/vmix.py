"""Vertical mixing coefficients and surface-flux penetration (ALE path).

TPU-native equivalents of the reference's vertical-physics chain for the
hybrid vertical coordinate (mod_blom_step.F90:196-207):

- `ale_forcing` (reference: /root/reference/phy/mod_ale_forcing.F90):
  shortwave and brine penetration factors and interface buoyancy flux;
- `difest_vertical` (reference: /root/reference/phy/mod_difest.F90
  difest_vertical_hybrid, which wraps the external CVMix library):
  interface diffusivities/viscosity.  Two estimators are provided:
  `difest_vertical` — a CVMix-lite interior scheme (LMD94 shear
  instability, constant background per the deck's BDMTYP=2/BDMC2,
  tests/fuk95/limits:329-331, convective enhancement) with the
  surface fluxes collapsed into the top layer; and
  `difest_vertical_kpp` (VmixParams.use_kpp) — the full KPP ocean
  boundary layer: bulk-Richardson OBL depth, LMD94 similarity velocity
  scales, cubic shape-function diffusivities, and nonlocal transport
  of the destabilizing surface fluxes.
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
    use_kpp: bool = False     # full KPP OBL scheme (difest_vertical_kpp)
    bdmc2: float = 1.e-5      # background diapycnal diffusivity [m2 s-1]
    nubmin: float = 1.e-6     # minimum background viscosity [m2 s-1]
    nu_shear0: float = 5.e-3  # LMD94 max shear diffusivity [m2 s-1]
    ri0: float = .7           # LMD94 critical Richardson number
    kv_conv: float = .1       # convective-instability diffusivity [m2 s-1]
    visc_bg: float = 1.e-4    # background viscosity [m2 s-1]
    brine_mlbase_frac: float = 1.0
    # tidal-dissipation driven mixing (tdmflg, mod_difest.F90:2929-2941):
    # twedon = tidal wave energy dissipation over bottom N [kg s-2],
    # (jdm, idm) array from phys.tidaldissip; None disables the term
    twedon: object = None
    tdmmax: float = .1        # cap on the tidal diffusivity [m2 s-1]


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


def _tidal_term(grid: Grid, par: VmixParams, dp, p, n2):
    """Tidally driven diapycnal diffusivity at interior interfaces
    (the tdmflg branch of the reference's diffusivity estimate,
    mod_difest.F90:2929-2941): bottom-intensified vertical structure
    times the local dissipation energy twedon * N_bottom, divided by
    N^2.  Returns (kk-1, H) aligned with the interior-interface
    diffusivities."""
    from .tidaldissip import tidal_diffusivity

    # thickness-weighted mean BV frequency over the bottom dpnbav
    # region (mod_difest.F90:193,2686-2706)
    dpnbav = 250. * onem
    n2_pad_l = jnp.concatenate([n2[:1], n2, n2[-1:]], axis=0)
    bvf_layer = jnp.sqrt(jnp.maximum(
        .5 * (n2_pad_l[:-1] + n2_pad_l[1:]), 0.))
    pbot = p[-1]
    q = jnp.maximum(0., p[1:] - jnp.maximum(pbot[None] - dpnbav, p[:-1]))
    dps = jnp.sum(q, axis=0)
    bvfbot = jnp.sum(bvf_layer * q, axis=0) / jnp.maximum(dps, epsilp)
    # layer-mean N^2 from the adjacent interface values
    n2_pad = jnp.concatenate([n2[:1], n2, n2[-1:]], axis=0)   # (kk+1, H)
    bvfsq_layer = jnp.maximum(.5 * (n2_pad[:-1] + n2_pad[1:]), 1.e-12)
    ktid_layer = tidal_diffusivity(
        jnp.asarray(par.twedon, dp.dtype), bvfbot, bvfsq_layer, p, dp,
        grav, plat=grid.plat)                                  # (kk, H)
    ktid = .5 * (ktid_layer[:-1] + ktid_layer[1:])             # (kk-1, H)
    return jnp.clip(ktid, 0., par.tdmmax)


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
    v_p = .5 * (s.v[n] + grid.jp1(s.v[n], 'v', True))
    dz = dp_mid * alpha0 / grav
    shear2 = ((u_p[1:] - u_p[:-1]) ** 2 + (v_p[1:] - v_p[:-1]) ** 2) \
        / (dz * dz)

    ri = n2 / jnp.maximum(shear2, 1e-14)
    x = jnp.clip(ri / par.ri0, 0., 1.)
    nu_shear = par.nu_shear0 * (1. - x * x) ** 3
    conv = jnp.where(n2 < 0., par.kv_conv, 0.)

    kdiff = nu_shear + conv + par.bdmc2
    kvisc = jnp.maximum(nu_shear + conv + par.visc_bg, par.nubmin)

    if par.twedon is not None:
        # tidal-dissipation energy enters the TRACER diffusivity only
        # (difdia, mod_difest.F90:2954); momentum viscosity is untouched.
        kdiff = kdiff + _tidal_term(grid, par, dp, p, n2)

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


# ------------------------------------------------------------------ #
# KPP ocean boundary layer (LMD94 / CVMix_kpp equivalent)
# ------------------------------------------------------------------ #

KAPPA = 0.4
# LMD94 similarity constants (CVMix defaults; cvmix_kpp)
ZETA_M, A_M, C_M = -0.2, 1.257, 8.360
ZETA_S, A_S, C_S = -1.0, -28.86, 98.96
RIC = 0.3           # critical bulk Richardson number
CV_T2 = 1.6         # turbulent-shear coefficient Cv
EPS_SL = 0.1        # surface-layer fraction epsilon
BETA_T = -0.2       # entrainment flux ratio
CS_NONLOC = 10.     # nonlocal transport coefficient C*


def turb_velocity_scales(sigma, hbl, ustar, bfsfc):
    """LMD94 turbulent velocity scales w_m, w_s (phi-function
    similarity; CVMix cvmix_kpp_compute_turbulent_scales as used by
    difest_vertical_hybrid, mod_difest.F90:1085-1140)."""
    ust3 = jnp.maximum(ustar, 1.e-8) ** 3
    sig_eff = jnp.where(bfsfc < 0., jnp.minimum(sigma, EPS_SL), sigma)
    zeta = sig_eff * hbl * KAPPA * bfsfc / ust3
    ku = KAPPA * jnp.maximum(ustar, 1.e-8)
    # stable
    w_st = ku / (1. + 5. * jnp.maximum(zeta, 0.))
    # unstable
    zm = jnp.minimum(zeta, 0.)
    wm_u = jnp.where(zm > ZETA_M,
                     ku * (1. - 16. * zm) ** .25,
                     ku * (A_M - C_M * zm) ** (1. / 3.))
    ws_u = jnp.where(zm > ZETA_S,
                     ku * jnp.sqrt(1. - 16. * zm),
                     ku * (A_S - C_S * zm) ** (1. / 3.))
    wm = jnp.where(zeta >= 0., w_st, wm_u)
    ws = jnp.where(zeta >= 0., w_st, ws_u)
    return wm, ws


def bulk_richardson_obl(grid: Grid, e: eos.EosParams, s: State, n: int,
                        ustar, bfsfc0):
    """Boundary-layer depth from the bulk Richardson number criterion
    (LMD94 eq. 21; CVMix cvmix_kpp_compute_bulk_Richardson +
    OBL_depth)."""
    kk = grid.kk
    dp = s.dp[n]
    p = cumulative_p(dp) * grid.ip
    z_mid = (p[:-1] + .5 * dp) / onem                  # (kk, H) [m]

    # buoyancy of each layer relative to the surface layer
    sig0v = eos.sig0(e, s.temp[n], s.saln[n])
    b = -grav * alpha0 * sig0v                          # [m s-2]-ish
    br = b[0]

    u_p = .5 * (s.u[n] + grid.ip1(s.u[n])) + s.ub[n][None]
    v_p = .5 * (s.v[n] + grid.jp1(s.v[n], 'v', True)) + s.vb[n][None]
    dv2 = (u_p[0][None] - u_p) ** 2 + (v_p[0][None] - v_p) ** 2

    # interface N (for the turbulent shear term)
    dp_mid = jnp.maximum(.5 * (dp[:-1] + dp[1:]), onemu)
    n2 = grav * grav * (sig0v[1:] - sig0v[:-1]) / dp_mid
    n_freq = jnp.sqrt(jnp.maximum(n2, 0.))
    n_lyr = jnp.concatenate([n_freq[:1], n_freq], axis=0)

    # ws at sigma=1 with h = z (LMD94 Vt2 uses the local depth)
    _, ws = turb_velocity_scales(jnp.ones_like(z_mid), z_mid,
                                 ustar[None], bfsfc0[None])
    cvt2 = (CV_T2 * jnp.sqrt(-BETA_T / (C_S * EPS_SL))
            / (RIC * KAPPA ** 2))
    vt2 = jnp.maximum(cvt2 * z_mid * n_lyr * ws, 1.e-10)

    rib = z_mid * grav * alpha0 * jnp.maximum(br[None] - b, 0.) \
        / (dv2 + vt2)
    # replace the buoyancy difference sign convention: deeper denser
    # water has lower b, so br - b >= 0 under stable stratification
    supercrit = rib > RIC
    first = jnp.argmax(supercrit, axis=0)
    any_sc = jnp.any(supercrit, axis=0)
    zz = jnp.take_along_axis(z_mid, first[None], axis=0)[0]
    hbl = jnp.where(any_sc, zz, p[kk] / onem)
    return jnp.maximum(hbl, 1.), n_freq


def kpp_boundary_layer(grid: Grid, hbl, ustar, bfsfc0, p_i):
    """KPP diffusivity/viscosity profile inside the boundary layer and
    the nonlocal transport profile (LMD94 eq. 19-20, 28; CVMix
    cvmix_coeffs_kpp)."""
    z_if = p_i / onem                                  # (kk+1, H)
    # interior interfaces 1..kk-1 (between layers k-1 and k), matching
    # the VmixFields convention Kdiff[k] = interface above layer k
    z_int = z_if[1:-1]                                 # (kk-1, H)
    sigma = jnp.clip(z_int / jnp.maximum(hbl, 1.)[None], 0., 1.)
    wm, ws = turb_velocity_scales(sigma, hbl[None], ustar[None],
                                  bfsfc0[None])
    G = sigma * (1. - sigma) ** 2                      # shape function
    inside = z_int < hbl[None]
    Km = jnp.where(inside, hbl[None] * wm * G, 0.)
    Ks = jnp.where(inside, hbl[None] * ws * G, 0.)
    ztop = jnp.zeros_like(Km[:1])
    Km = jnp.concatenate([ztop, Km], axis=0)           # (kk, H)
    Ks = jnp.concatenate([ztop, Ks], axis=0)

    # nonlocal transport: cumulative fraction profile (1 at surface,
    # 0 below the OBL) active only under destabilizing forcing
    sig_all = jnp.clip(z_if[1:] / jnp.maximum(hbl, 1.)[None], 0., 1.)
    unstable = (bfsfc0 > 0.)[None]
    nl = jnp.where(unstable & (z_if[1:] < hbl[None]),
                   (1. - sig_all) ** 2, 0.)
    nl = jnp.concatenate([jnp.ones_like(nl[:1]), nl], axis=0)
    return Km, Ks, nl


def difest_vertical_kpp(grid: Grid, e: eos.EosParams, s: State,
                        forcing: Forcing, swabs: SwabsFields,
                        par: VmixParams, n: int,
                        lamult=None) -> VmixFields:
    """Full KPP vertical mixing (difest_vertical_hybrid + CVMix_kpp,
    mod_difest.F90:900-1200): interior LMD94 shear + background,
    boundary-layer profile from the bulk Richardson OBL depth, and
    nonlocal redistribution of the non-shortwave surface fluxes."""
    base = difest_vertical(grid, e, s, forcing, swabs, par, n)

    # surface friction velocity from the wind stress
    taux_p = .5 * (forcing.taux + grid.ip1(forcing.taux))
    tauy_p = .5 * (forcing.tauy + grid.jp1(forcing.tauy, 'v', True))
    ustar = jnp.sqrt(jnp.sqrt(taux_p ** 2 + tauy_p ** 2) / 1000.)

    # surface buoyancy flux: buoyfl[0] (positive = buoyancy loss =>
    # destabilizing in this sign convention, mod_ale_forcing sign)
    bfsfc0 = base.buoyfl[0]

    hbl, _ = bulk_richardson_obl(grid, e, s, n, ustar, bfsfc0)
    dp = s.dp[n]
    p_i = cumulative_p(dp) * grid.ip
    Km_bl, Ks_bl, nl = kpp_boundary_layer(grid, hbl, ustar, bfsfc0,
                                          p_i)
    if lamult is None and getattr(forcing, 'lamult', None) is not None:
        lamult = forcing.lamult
    if lamult is not None:
        # Langmuir enhancement of the boundary-layer diffusivity
        # (CVMix Langmuir option consumed by difest_vertical_hybrid;
        # lamult = Sw_lamult from the wave coupler, mod_cesm.F90)
        Km_bl = Km_bl * lamult[None]
        Ks_bl = Ks_bl * lamult[None]

    Kvisc = jnp.maximum(base.Kvisc_m, Km_bl * grid.ip)
    Kdiff = jnp.maximum(base.Kdiff_t, Ks_bl * grid.ip)

    return dataclasses.replace(
        base, Kvisc_m=Kvisc, Kdiff_t=Kdiff, Kdiff_s=Kdiff,
        t_ns_nonloc=nl * grid.ip, s_nb_nonloc=nl * grid.ip,
        mld=hbl)
