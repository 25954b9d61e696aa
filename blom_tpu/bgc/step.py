"""BGC step orchestration and BLOM<->BGC interface.

TPU-native counterpart of the reference coupling chain
(/root/reference/hamocc/mo_hamocc_step.F90:27-105 hamocc_step ->
mo_hamocc4bcm.F90:28-410 hamocc4bcm, mo_intfcblom.F90 blom2hamocc /
hamocc2blom, mo_vgrid.F90 set_vgrid, mo_trc_limitc.F90).

The model state carries BGC tracers in BLOM per-mass units inside the
generic trc block; each BGC step converts to concentrations [kmol/m3]
via the in-situ density (trc * rho/rho0, bgc_rho of
mo_intfcblom.F90:81-116), runs the process chain on dense (K, J, I)
arrays, and converts back — so `ocetra * dz == trc * dp/onem` and BLOM
mass advection conserves BGC inventories exactly.

Process order (mo_hamocc4bcm.F90:229-346): ocprod -> sinking ->
limitc -> cyano -> carchm -> dust deposition -> (sediment bypassed).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import eos
from ..core.constants import onem, rho0
from ..core.grid import Grid
from ..core.state import State
from . import carchm as carchm_mod
from . import processes, sinking as sinking_mod
from .params import NBGC, BgcParams, BgcTracers as T


class BgcForcing(NamedTuple):
    """Surface fields the BGC needs beyond the physics forcing
    (arguments of hamocc4bcm, mo_hamocc4bcm.F90:28-60)."""
    swr: jax.Array     # surface shortwave [W m-2] (strahl)
    fu10: jax.Array    # 10-m wind speed [m s-1] (pfu10)
    slp: jax.Array     # sea-level pressure [Pa] (ppao)
    fice: jax.Array    # sea-ice fraction (psicomo)
    dustdep: jax.Array  # dust deposition [kg m-2/step] (dust input)


def zero_bgc_forcing(shape, dtype=jnp.float64, swr=50., fu10=5.,
                     slp=101325.) -> BgcForcing:
    H = tuple(shape)
    f = lambda v: jnp.full(H, v, dtype)
    return BgcForcing(swr=f(swr), fu10=f(fu10), slp=f(slp),
                      fice=jnp.zeros(H, dtype), dustdep=jnp.zeros(H, dtype))


def init_bgc_tracers(s: State, itrbgc: int, e: eos.EosParams,
                     n: int = 0, ti=None, cp=None) -> State:
    """Initial BGC tracer values (profile-climatology path replaced by
    the reference's constant fallbacks, mo_ini_fields.F90:196-236, plus
    WOA-like uniform nutrient levels in BLOM per-mass units).  With
    ti/cp, the carbon-isotope pools are set at the preindustrial
    atmospheric ratio / biogenic fractionation (mo_ini_fields.F90:
    166-200; ratios are per-mass-invariant so the concentration
    formulas of ciso.init_ciso_tracers apply directly)."""
    trc = s.trc
    wet = (s.dp[n] > 0.).astype(trc.dtype)

    def setc(idx, val):
        nonlocal trc
        trc = trc.at[:, itrbgc + idx].set(val * wet)

    setc(T.sco212, 2.27e-3)      # ~mean ocean DIC [kmol/m3]
    setc(T.alkali, 2.37e-3)
    setc(T.phosph, 2.17e-6)
    setc(T.oxygen, 2.2e-4)
    setc(T.ano3, 31.e-6)
    setc(T.silica, 90.e-6)
    setc(T.gasnit, 1.e-10)
    setc(T.doc, 1.e-8)
    setc(T.phy, 1.e-8)
    setc(T.zoo, 1.e-8)
    setc(T.det, 1.e-8)
    setc(T.calc, 0.)
    setc(T.opal, 1.e-8)
    setc(T.an2o, 0.)
    setc(T.dms, 0.)
    setc(T.fdust, 0.)
    setc(T.iron, 0.6e-9)
    setc(T.dicsat, 1.e-8)
    setc(T.hi, 1.e-8)
    if ti is not None and cp is not None:
        from . import ciso as ciso_mod
        for lev in range(trc.shape[0]):
            blk = trc[lev, itrbgc:itrbgc + ti.ntotal]
            blk = ciso_mod.init_ciso_tracers(blk, ti, cp, BgcParams())
            trc = trc.at[lev, itrbgc:itrbgc + ti.ntotal].set(blk)
    return dataclasses.replace(s, trc=trc)


def _vgrid(dz, dp_min_sink, dp_ez):
    """Derived vertical-grid fields (set_vgrid, mo_vgrid.F90:80-200):
    layer-centre depths, euphotic mask, bottom-layer index."""
    ptiestw = jnp.concatenate(
        [jnp.zeros_like(dz[:1]), jnp.cumsum(dz, axis=0)], axis=0)
    ptiestu = ptiestw[:-1] + 0.5 * dz
    euph = ptiestw[:-1] < dp_ez
    kidx = jnp.arange(dz.shape[0])[:, None, None]
    kbo = jnp.max(jnp.where(dz > dp_min_sink, kidx, 0), axis=0)
    return ptiestu, euph, kbo


def hamocc_step(grid: Grid, e: eos.EosParams, par: BgcParams,
                s: State, f: BgcForcing, itrbgc: int, n: int, nn: int,
                dtsec, kmle: Optional[jax.Array] = None,
                ti=None, cp=None):
    """One BGC step on time level n (hamocc_step,
    mo_hamocc_step.F90:27-105).  nn is unused (single-copy design);
    kept for signature parity with the reference's 2-level copy.

    ti/cp: optional extended tracer-index namespace + ciso parameters
    — when both are given the block is ti.ntotal wide and the carbon-
    isotope chain (bgc/ciso.py, the reference's use_cisonew) runs
    alongside the base processes."""
    dtype = s.dp.dtype
    dp = s.dp[n]
    temp = s.temp[n]
    saln = s.saln[n]

    # --- blom2hamocc (mo_intfcblom.F90:81-136): in-situ density and
    # geometric layer thickness
    from ..core.state import cumulative_p
    p_i = cumulative_p(dp)
    pmid = p_i[:-1] + 0.5 * dp
    rho = eos.rho(pmid, temp, saln) / rho0          # rho/rho0 == [g/cm3]
    bgc_rho = rho
    dz = dp / (onem * bgc_rho)                      # [m]
    omask = grid.ip
    lyr = (dp > par.dp_min * onem) & (omask > 0.5)
    dz = jnp.where(lyr, dz, 0.)

    ntot = ti.ntotal if ti is not None else NBGC
    oc = s.trc[n, itrbgc:itrbgc + ntot] * bgc_rho[None]
    oc = oc.at[T.hi].set(s.trc[n, itrbgc + T.hi])   # hi is not a conc.

    ptiestu, euph, kbo = _vgrid(dz, par.dp_min_sink, par.dp_ez)
    euph = euph & lyr
    if kmle is None:
        kmle = jnp.full(grid.shape, 1, jnp.int32)   # kmle_static = 2

    dtb = dtsec / 86400.

    # dust / iron deposition (mo_apply_fedep.F90: surface layer gets
    # dust [kg] -> fdust [kg/m3] and soluble iron, 3.5% Fe, 1% soluble)
    dz0 = jnp.maximum(dz[0], 1.e-12)
    wet0 = lyr[0]
    oc = oc.at[T.fdust, 0].add(jnp.where(wet0, f.dustdep / dz0, 0.))
    oc = oc.at[T.iron, 0].add(
        jnp.where(wet0, f.dustdep * 0.035 * 0.01 / 55.85 / dz0, 0.))

    satoxy = carchm_mod.chem.sat_oxygen(temp, saln)
    if cp is not None and ti is not None:
        from . import ciso as ciso_mod
        # co2star for the Laws-1997 fractionation, from the persistent
        # pH tracer (the previous step's carbonate solve)
        tcl = jnp.clip(temp, carchm_mod.chem.TEMP_MIN,
                       carchm_mod.chem.TEMP_MAX)
        scl = jnp.clip(saln, carchm_mod.chem.SALN_MIN,
                       carchm_mod.chem.SALN_MAX)
        keq = carchm_mod.chem.kequi(tcl, scl,
                                    ptiestu * 98060. * 1.027e-6)
        co2star = ciso_mod.co2star_from_hi(oc, rho, keq)
        oc_pre = oc
        oc, prod_diags, prod_flx = processes.ocprod(
            oc, temp, dz, f.swr, satoxy, lyr, dtb, par,
            return_fluxes=True)
        oc_iso = ciso_mod.ocprod_ciso(oc_pre, ti, prod_flx, co2star,
                                      lyr, dtb, par, cp)
        iso_rows = jnp.array([getattr(ti, nm)
                              for nm in ciso_mod.CISO_NAMES])
        oc = oc.at[iso_rows].set(oc_iso[iso_rows])
        extra = ciso_mod.extra_sinkers(ti)
    else:
        oc, prod_diags = processes.ocprod(oc, temp, dz, f.swr, satoxy,
                                          lyr, dtb, par)
        extra = ()
    oc, bot_flx = sinking_mod.sinking(oc, dz, ptiestu, omask, dtb, par,
                                      extra=extra)

    # trc_limitc (mo_trc_limitc.F90): clip small negatives on organics
    organics = [T.phy, T.zoo, T.det, T.doc, T.calc, T.opal, T.dms]
    if ti is not None and cp is not None:
        organics += [ti.phy13, ti.phy14, ti.zoo13, ti.zoo14, ti.det13,
                     ti.det14, ti.doc13, ti.doc14, ti.calc13, ti.calc14]
    for idx in organics:
        oc = oc.at[idx].set(jnp.maximum(oc[idx], 0.))

    oc, intnfix = processes.cyano(oc, temp, dz, euph, dtb, par)
    oc, satoxy, carb_diags = carchm_mod.carchm(
        oc, temp, saln, rho, dz, ptiestu, lyr, kmle,
        f.swr, f.fu10, f.slp, f.fice, dtsec, par, ti=ti, cp=cp)

    # --- hamocc2blom (mo_intfcblom.F90:396-470): back to per-mass
    trc_new = oc / bgc_rho[None]
    trc_new = trc_new.at[T.hi].set(oc[T.hi])
    trc = s.trc.at[n, itrbgc:itrbgc + ntot].set(
        jnp.where(lyr[None], trc_new, s.trc[n, itrbgc:itrbgc + ntot]))
    s = dataclasses.replace(s, trc=trc)

    diags = dict(prod_diags)
    diags.update(bot_flx)
    diags.update(carb_diags)
    diags['intnfix'] = intnfix
    return s, diags


def hamocc_step_with_sediment(grid: Grid, e: eos.EosParams,
                              par: BgcParams, s: State, f: BgcForcing,
                              sed, itrbgc: int, n: int, nn: int, dtsec,
                              kmle: Optional[jax.Array] = None):
    """hamocc_step followed by the sediment module (the
    use_sedbypass=False path of mo_hamocc4bcm.F90:355-402: powach
    incl. dipowa, then sedshi).  The sediment state is an explicit
    carry alongside the ocean state; bottom particle fluxes feed the
    sediment instead of being redistributed."""
    from . import sediment as sd
    from . import carchm as carchm_mod

    par_nosb = par._replace(sedbypass=False)
    s, diags = hamocc_step(grid, e, par_nosb, s, f, itrbgc, n, nn,
                           dtsec, kmle)

    dp = s.dp[n]
    temp = s.temp[n]
    saln = s.saln[n]
    from ..core.state import cumulative_p
    p_i = cumulative_p(dp)
    pmid = p_i[:-1] + 0.5 * dp
    rho = eos.rho(pmid, temp, saln) / rho0
    dz = dp / (onem * rho)
    lyr = (dp > par.dp_min * onem) & (grid.ip > 0.5)
    dz = jnp.where(lyr, dz, 0.)
    _, _, kbo = _vgrid(dz, par.dp_min_sink, par.dp_ez)
    kk = dp.shape[0]
    kbo_onehot = (jnp.arange(kk)[:, None, None] == kbo[None]) \
        .astype(dp.dtype)
    bolay = jnp.maximum(jnp.sum(dz * kbo_onehot, axis=0), 1.e-3)
    saln_bot = jnp.sum(saln * kbo_onehot, axis=0)
    temp_bot = jnp.sum(temp * kbo_onehot, axis=0)
    rrho_bot = jnp.sum(rho * kbo_onehot, axis=0)
    pbot_bar = jnp.sum(pmid * kbo_onehot, axis=0) * 98060. * 1.027e-6 \
        / onem
    keq = carchm_mod.chem.kequi(temp_bot, saln_bot, pbot_bar)

    oc = s.trc[n, itrbgc:itrbgc + NBGC] * rho[None]
    oc = oc.at[T.hi].set(s.trc[n, itrbgc + T.hi])

    flx = {k: diags[k] for k in ('prorca', 'prcaca', 'silpro',
                                 'produs')}
    sed, oc = sd.powach(sed, oc, flx, keq, bolay, kbo_onehot, grid.ip,
                        saln_bot, rrho_bot, dtsec, par)
    sed = sd.sedshi(sed, grid.ip)

    trc_new = oc / rho[None]
    trc_new = trc_new.at[T.hi].set(oc[T.hi])
    trc = s.trc.at[n, itrbgc:itrbgc + NBGC].set(
        jnp.where(lyr[None], trc_new, s.trc[n, itrbgc:itrbgc + NBGC]))
    s = dataclasses.replace(s, trc=trc)
    return s, sed, diags
