"""Sediment module: pore-water chemistry, diffusion, and burial
shifting.

TPU-native counterpart of the reference sediment system
(/root/reference/hamocc/mo_sedmnt.F90 grid/state, mo_powadi.F90
implicit dissolution-diffusion solver, mo_powach.F90 pore-water
chemistry, mo_dipowa.F90 pore-water diffusion, mo_sedshi.F90 burial
shifting).  Four solid constituents (POC, CaCO3, opal, clay) in ks=12
layers over 7 pore-water tracers coupled to the bottom water.

Dense re-design: the reference's j-row × i-vector tridiagonal solves
become whole-field Thomas eliminations unrolled over the fixed ks
levels; every per-point branch is a jnp.where.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import chemistry as chem
from .params import BgcParams, BgcTracers as T

KS = 12

# sediment grid (namelist dzs default + sed_porosity,
# namelist_definition_blom.xml:4863-4897; ini_sedmnt mo_sedmnt.F90:
# 87-212) — dzs [m], 13 interface spacings
DZS = np.array([0.001, 0.003, 0.005, 0.007, 0.009, 0.011, 0.013,
                0.015, 0.017, 0.019, 0.021, 0.023, 0.025])
SEDDW = .5 * (DZS[:-1] + DZS[1:])          # (ks,) layer volume weight
SEDDZI = 1. / DZS                           # (ks+1,)
PORWAT = np.array([0.85, 0.83, 0.8, 0.79, 0.77, 0.75, 0.73, 0.7,
                   0.68, 0.66, 0.64, 0.62])
PORSOL = 1. - PORWAT
PORWAH = np.concatenate([[.5 * (1. + PORWAT[0])],
                         .5 * (PORWAT[1:] + PORWAT[:-1])])
SOLFU = float((SEDDW * PORSOL).sum())

# rate constants (mo_param_bgc.F90:546-572), per second; scaled by dt
SEDICT = 1.e-9      # pore-water molecular diffusivity [m2/s]
SILSAT = 0.001      # silicate saturation [kmol/m3]
DISSO_POC = 3.9e-7  # [1/(kmol O2/m3 s)]
DISSO_SIL = 1.0e-7
DISSO_CACO3 = 1.0e-7
SED_DENIT = 0.01 / 86400.
SED_SULF = 0.01 / 86400.
SED_O2THRESH_HYPOXIC = 1.e-6
SED_O2THRESH_SULF = 3.e-6
SED_NO3THRESH_SULF = 3.e-6

# solid weight/density volume factors (mo_sedmnt.F90:103-106)
CALFA = 100. / 2600.
OPLFA = 60. / 2200.
ORGFA = 30. / 1000.
CLAFA = 1. / 2600.


class SedSolid:
    """Solid constituent indices (mo_param1_bgc.F90:212-215)."""
    sso12 = 0   # POC [kmol P / m3 solid]
    ssc12 = 1   # CaCO3
    sssil = 2   # opal
    sster = 3   # clay [kg / m3 solid]


class SedPow:
    """Pore-water tracer indices (mo_param1_bgc.F90:232-238) and their
    ocean counterparts (map_por2octra)."""
    aic = 0     # DIC
    aal = 1     # alkalinity
    aph = 2     # phosphate
    aox = 3     # oxygen
    n2 = 4      # dinitrogen
    no3 = 5     # nitrate
    asi = 6     # silicate


NPOWTRA = 7
POW2OC = (T.sco212, T.alkali, T.phosph, T.oxygen, T.gasnit, T.ano3,
          T.silica)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SedState:
    sedlay: jax.Array   # (4, ks, J, I) solids
    powtra: jax.Array   # (7, ks, J, I) pore water [kmol/m3]
    burial: jax.Array   # (4, J, I)
    sedhpl: jax.Array   # (ks, J, I) pore-water [H+]


def init_sediment(shape, dtype=jnp.float64) -> SedState:
    H = tuple(shape)
    return SedState(
        sedlay=jnp.zeros((4, KS) + H, dtype),
        powtra=jnp.zeros((NPOWTRA, KS) + H, dtype)
        .at[SedPow.aic].set(2.27e-3).at[SedPow.aal].set(2.37e-3)
        .at[SedPow.aox].set(2.e-4).at[SedPow.no3].set(30.e-6)
        .at[SedPow.asi].set(1.e-4).at[SedPow.n2].set(1.e-10)
        .at[SedPow.aph].set(2.e-6),
        burial=jnp.zeros((4,) + H, dtype),
        sedhpl=jnp.full((KS,) + H, 1.e-8, dtype))


def powadi(solrat, sedb1, bolay, omask, dt):
    """Implicit dissolution-diffusion tridiagonal solve over the
    (ks+1)-level pore-water column incl. the bottom-water box
    (powadi, mo_powadi.F90:25-110).

    solrat: (ks, J, I) dissolution sink coefficients;
    sedb1: (ks+1, J, I) right-hand side (level 0 = bottom water);
    returns sediso (ks+1, J, I)."""
    sedict = SEDICT * dt
    lo = [None] * (KS + 1)
    up = [None] * (KS + 1)
    dg = [None] * (KS + 1)
    zero = jnp.zeros_like(bolay)
    # rows 1..ks (mo_powadi.F90:36-46)
    for k in range(1, KS + 1):
        asu = sedict * SEDDZI[k - 1] * PORWAH[k - 1]
        alo = sedict * SEDDZI[k] * PORWAH[k] if k < KS else 0.
        up[k] = jnp.full_like(bolay, -asu)
        lo[k] = jnp.full_like(bolay, -alo)
        dg[k] = (SEDDW[k - 1] * PORWAT[k - 1] + asu + alo
                 + solrat[k - 1] * PORWAT[k - 1] * SEDDW[k - 1])
    # row 0: bottom-water box (":48-61")
    alo0 = sedict * SEDDZI[0] * PORWAH[0]
    up[0] = zero
    lo[0] = jnp.where(omask > .5, -alo0, 0.)
    dg[0] = jnp.where(omask > .5, bolay + alo0, 1.)

    # forward elimination (":63-77")
    b = [sedb1[k] for k in range(KS + 1)]
    for k in range(1, KS + 1):
        w = up[k] / dg[k - 1]
        dg[k] = dg[k] - lo[k - 1] * w
        b[k] = b[k] - w * b[k - 1]
    # back substitution (":79-93")
    out = [None] * (KS + 1)
    out[KS] = b[KS] / dg[KS]
    for k in range(KS - 1, -1, -1):
        out[k] = (b[k] - lo[k] * out[k + 1]) / dg[k]
    return jnp.stack(out)


def _umfa():
    return jnp.asarray(PORSOL / PORWAT)[:, None, None]


def powach(sed: SedState, oc, bot_flx, keq, bolay, kbo_onehot, omask,
           saln_bot, rrho_bot, dt, p: BgcParams):
    """Sediment pore-water chemistry (powach, mo_powach.F90:28-656):
    opal dissolution, aerobic POC remineralization, denitrification,
    sulfate reduction, CaCO3 dissolution with pore-water carbonate
    chemistry, then pore-water diffusion (dipowa) and clay input.

    oc: (ntr, K, J, I) ocean concentrations (bottom exchange applies
    at the kbo layer via kbo_onehot (K, J, I)); bot_flx: dict with
    prorca/prcaca/silpro/produs [kmol m-2/step]; keq: Kequi of the
    bottom layer; bolay: bottom-layer thickness [m]."""
    sedlay = sed.sedlay
    powtra = sed.powtra
    umfa = _umfa()
    seddw_w = jnp.asarray(SEDDW * PORWAT)[:, None, None]
    psol1 = PORSOL[0] * SEDDW[0]

    def bot(idx):
        return jnp.sum(oc[idx] * kbo_onehot, axis=0)

    def set_bot(o, idx, val):
        return o.at[idx].set(jnp.where(kbo_onehot > 0.,
                                       val[None], o[idx]))

    # ---------------- opal (":110-165") -----------------------------
    disso = DISSO_SIL * dt
    undsa = SILSAT - powtra[SedPow.asi]
    sedb1 = jnp.concatenate(
        [(bolay * (SILSAT - bot(T.silica)))[None],
         seddw_w * (SILSAT - powtra[SedPow.asi])])
    sil1 = sedlay[SedSolid.sssil, 0] + bot_flx['silpro'] / psol1
    solrat = (sedlay[SedSolid.sssil] * disso / (1. + disso * undsa)
              * umfa)
    solrat = solrat.at[0].set(
        sil1 * disso / (1. + disso * undsa[0]) * umfa[0])
    sediso = powadi(solrat, sedb1, bolay, omask, dt)
    oc = set_bot(oc, T.silica, SILSAT - sediso[0])
    sedlay = sedlay.at[SedSolid.sssil, 0].add(bot_flx['silpro'] / psol1)
    solrat2 = sedlay[SedSolid.sssil] * disso / (1. + disso * sediso[1:])
    sedlay = sedlay.at[SedSolid.sssil].add(-sediso[1:] * solrat2)
    powtra = powtra.at[SedPow.asi].set(SILSAT - sediso[1:])

    # ---------------- aerobic POC (":170-260") -----------------------
    disso = DISSO_POC * dt
    undsa = powtra[SedPow.aox]
    sedb1 = jnp.concatenate(
        [(bolay * bot(T.oxygen))[None], seddw_w * powtra[SedPow.aox]])
    poc1 = sedlay[SedSolid.sso12, 0] + bot_flx['prorca'] / psol1
    solrat = (sedlay[SedSolid.sso12] * p.ro2ut * disso
              / (1. + disso * undsa) * umfa)
    solrat = solrat.at[0].set(
        poc1 * p.ro2ut * disso / (1. + disso * undsa[0]) * umfa[0])
    sediso = powadi(solrat, sedb1, bolay, omask, dt)
    oc = set_bot(oc, T.oxygen, sediso[0])
    sedlay = sedlay.at[SedSolid.sso12, 0].add(bot_flx['prorca'] / psol1)
    solrat2 = sedlay[SedSolid.sso12] * disso / (1. + disso * sediso[1:])
    posol = sediso[1:] * solrat2
    aerob = posol * umfa
    sedlay = sedlay.at[SedSolid.sso12].add(-posol)
    powtra = powtra.at[SedPow.aph].add(posol * umfa)
    powtra = powtra.at[SedPow.no3].add(posol * p.rnit * umfa)
    powtra = powtra.at[SedPow.aox].set(sediso[1:])

    # ---------------- denitrification (":265-300") -------------------
    hypox = powtra[SedPow.aox] < SED_O2THRESH_HYPOXIC
    posol = jnp.where(
        hypox,
        SED_DENIT * dt * jnp.minimum(
            .25 * powtra[SedPow.no3] / p.rdnit2,
            sedlay[SedSolid.sso12]), 0.)
    anaerob = posol * umfa
    sedlay = sedlay.at[SedSolid.sso12].add(-posol)
    powtra = powtra.at[SedPow.aph].add(posol * umfa)
    powtra = powtra.at[SedPow.no3].add(-p.rdnit1 * posol * umfa)
    powtra = powtra.at[SedPow.n2].add(p.rdnit2 * posol * umfa)

    # ---------------- sulfate reduction (":305-330") -----------------
    sul = hypox & (powtra[SedPow.no3] < SED_NO3THRESH_SULF) \
        & (powtra[SedPow.aox] < SED_O2THRESH_SULF)
    posol = jnp.where(sul, SED_SULF * dt * sedlay[SedSolid.sso12], 0.)
    sulf = posol * umfa
    sedlay = sedlay.at[SedSolid.sso12].add(-posol)
    powtra = powtra.at[SedPow.aph].add(posol * umfa)
    powtra = powtra.at[SedPow.no3].add(posol * umfa * p.rnit)

    # ---------------- CaCO3 + carbonate chemistry (":340-450") -------
    alk = (powtra[SedPow.aal] - (sulf + aerob) * (p.rnit + 1.)
           + anaerob * (p.rdnit1 - 1.)) / rrho_bot
    c = (powtra[SedPow.aic] + (anaerob + aerob + sulf) * p.rcar) \
        / rrho_bot
    sit = powtra[SedPow.asi] / rrho_bot
    pt = powtra[SedPow.aph] / rrho_bot
    ah1 = jnp.clip(sed.sedhpl, 1.e-11, 1.e-4)
    kb = chem.Kequi(*[k[None] for k in keq])  # broadcast over ks
    ah1, ac = chem.solve_h(saln_bot[None], c, alk, sit, pt, kb, ah1,
                           p.niter, 1.e-20, 1.)
    cu = (2. * c - ac) / (2. + kb.K1 / ah1)
    cc = kb.K2 * kb.K1 * cu / ah1 ** 2
    sedhpl = jnp.maximum(1.e-20, ah1)
    powcar = cc * rrho_bot

    disso = DISSO_CACO3 * dt
    satlev = keq.Kspc / chem.CALCON
    co3_bot = bot_c03(oc, kbo_onehot, keq, saln_bot, rrho_bot, p)
    undsa = jnp.maximum(satlev[None] - powcar, 0.)
    # the surface sediment layer uses the slightly raised saturation
    # level satlev+2e-5 (mo_powach.F90:372-380)
    undsa0 = jnp.maximum(satlev + 2.e-5 - powcar[0], 0.)
    sedb1 = jnp.concatenate(
        [(bolay * (satlev + 2.e-5 - co3_bot))[None], seddw_w * undsa])
    cal1 = sedlay[SedSolid.ssc12, 0] + bot_flx['prcaca'] / psol1
    solrat = (sedlay[SedSolid.ssc12] * disso / (1. + disso * undsa)
              * umfa)
    solrat = solrat.at[0].set(
        cal1 * disso / (1. + disso * undsa0) * umfa[0])
    solrat = jnp.where(undsa <= 0., 0., solrat)
    sediso = powadi(solrat, sedb1, bolay, omask, dt)
    sedlay = sedlay.at[SedSolid.ssc12, 0].add(bot_flx['prcaca'] / psol1)
    solrat2 = sedlay[SedSolid.ssc12] * disso / (1. + disso * sediso[1:])
    posol = jnp.where(undsa > 0., sediso[1:] * solrat2, 0.)
    sedlay = sedlay.at[SedSolid.ssc12].add(-posol)
    powtra = powtra.at[SedPow.aic].add(
        posol * umfa + (aerob + anaerob + sulf) * p.rcar)
    powtra = powtra.at[SedPow.aal].add(
        2. * posol * umfa - (p.rnit + 1.) * (aerob + sulf)
        + (p.rdnit1 - 1.) * anaerob)

    # ---------------- clay input (dipowa caller, powach ":440") ------
    sedlay = sedlay.at[SedSolid.sster, 0].add(bot_flx['produs'] / psol1)

    sed = dataclasses.replace(sed, sedlay=sedlay, powtra=powtra,
                              sedhpl=sedhpl)

    # ---------------- pore-water diffusion (dipowa) ------------------
    sed, oc = dipowa(sed, oc, bolay, kbo_onehot, omask, dt)
    return sed, oc


def bot_c03(oc, kbo_onehot, keq, saln_bot, rrho_bot, p: BgcParams):
    """Carbonate-ion concentration of the bottom water (the co3 field
    carchm saves, used by powach's CaCO3 boundary term)."""
    tc = jnp.sum(oc[T.sco212] * kbo_onehot, axis=0) / rrho_bot
    ta = jnp.sum(oc[T.alkali] * kbo_onehot, axis=0) / rrho_bot
    sit = jnp.sum(oc[T.silica] * kbo_onehot, axis=0) / rrho_bot
    pt = jnp.sum(oc[T.phosph] * kbo_onehot, axis=0) / rrho_bot
    ah1, ac = chem.solve_h(saln_bot, tc, ta, sit, pt, keq,
                           jnp.full_like(tc, 1.e-8), p.niter)
    cu = (2. * tc - ac) / (2. + keq.K1 / ah1)
    return keq.K2 * keq.K1 * cu / ah1 ** 2 * rrho_bot


def dipowa(sed: SedState, oc, bolay, kbo_onehot, omask, dt):
    """Implicit vertical diffusion of all pore-water tracers coupled
    to the bottom water (dipowa, mo_dipowa.F90:30-140)."""
    powtra = sed.powtra
    seddw_w = jnp.asarray(SEDDW * PORWAT)[:, None, None]

    zero_solrat = jnp.zeros((KS,) + bolay.shape, bolay.dtype)
    new_pow = []
    new_oc = oc
    for iv in range(NPOWTRA)[::1]:
        bot_v = jnp.sum(oc[POW2OC[iv]] * kbo_onehot, axis=0)
        sedb1 = jnp.concatenate([(bolay * bot_v)[None],
                                 seddw_w * powtra[iv]])
        sediso = powadi(zero_solrat, sedb1, bolay, omask, dt)
        new_pow.append(sediso[1:])
        new_oc = new_oc.at[POW2OC[iv]].set(
            jnp.where(kbo_onehot > 0., sediso[0][None],
                      new_oc[POW2OC[iv]]))
    return dataclasses.replace(sed, powtra=jnp.stack(new_pow)), new_oc


def sedshi(sed: SedState, omask):
    """Burial shifting (sedshi, mo_sedshi.F90:28-200): shift solid
    overfill downward layer by layer, push the deepest layer's
    overfill into the burial pool, top up the deepest layer from
    burial when undersaturated, then shift deficits upward."""
    sedlay = sed.sedlay
    burial = sed.burial

    volfac = jnp.asarray([ORGFA * 122., CALFA, OPLFA, CLAFA]
                         )[:, None, None]

    def solid_volume(lay_k):
        return jnp.sum(volfac * lay_k, axis=0)

    # downward shifts (":40-75")
    for k in range(KS - 1):
        sedlo = solid_volume(sedlay[:, k])
        wsed = jnp.maximum(0., (sedlo - 1.) / (jnp.abs(sedlo) + 1e-10))
        uebers = wsed[None] * sedlay[:, k]
        frac = (SEDDW[k] * PORSOL[k]) / (SEDDW[k + 1] * PORSOL[k + 1])
        sedlay = sedlay.at[:, k].add(-uebers)
        sedlay = sedlay.at[:, k + 1].add(uebers * frac)

    # deepest layer -> burial (":78-105")
    sedlo = solid_volume(sedlay[:, KS - 1])
    wsed = jnp.maximum(0., (sedlo - 1.) / (jnp.abs(sedlo) + 1e-10))
    uebers = wsed[None] * sedlay[:, KS - 1]
    sedlay = sedlay.at[:, KS - 1].add(-uebers)
    burial = burial + uebers * SEDDW[KS - 1] * PORSOL[KS - 1]

    # refill the deepest layer from burial (":108-165")
    fulsed = jnp.zeros_like(sedlo)
    for k in range(KS):
        fulsed = fulsed + PORSOL[k] * SEDDW[k] \
            * solid_volume(sedlay[:, k])
    seddef = SOLFU - fulsed
    spresent = jnp.sum(volfac * burial, axis=0)
    burial = burial.at[SedSolid.sster].add(
        jnp.maximum(0., seddef - spresent) / CLAFA)
    buried = jnp.sum(volfac * burial, axis=0)
    refill = seddef / (buried + 1e-10)
    frac = PORSOL[KS - 1] * SEDDW[KS - 1]
    sedlay = sedlay.at[:, KS - 1].add(refill[None] * burial / frac)
    burial = burial * (1. - refill[None])

    # upward shifts (":170-196")
    for k in range(KS - 1, 0, -1):
        sedlo = solid_volume(sedlay[:, k])
        wsed = jnp.maximum(0., (sedlo - 1.) / (jnp.abs(sedlo) + 1e-10))
        uebers = wsed[None] * sedlay[:, k]
        frac = (PORSOL[k] * SEDDW[k]) / (PORSOL[k - 1] * SEDDW[k - 1])
        sedlay = sedlay.at[:, k].add(-uebers)
        sedlay = sedlay.at[:, k - 1].add(uebers * frac)

    msk = (omask > .5)
    sedlay = jnp.where(msk[None, None], sedlay, sed.sedlay)
    burial = jnp.where(msk[None], burial, sed.burial)
    return dataclasses.replace(sed, sedlay=sedlay, burial=burial)
