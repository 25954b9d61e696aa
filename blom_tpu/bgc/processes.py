"""Biological production, remineralization, N2 fixation.

TPU-native counterpart of the reference routines
(/root/reference/hamocc/mo_ocprod.F90:29-1188 ocprod and
mo_cyano.F90:28-100 cyano), base configuration (no AGG/isotopes/
extended N cycle).  All updates are elementwise over dense
(ntr, K, J, I) concentration arrays; the only sequential piece is the
downward light-attenuation recurrence, a `lax.scan` over K.

`oc` is the ocetra-equivalent: concentrations in kmol/m3 (P units for
the organic pools).  `dtb` is the traced timestep in days; reference
rates are 1/day and multiply dtb here (the reference pre-multiplies at
init, mo_param_bgc.F90:780-846).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.reduce import ksum
from jax import lax

from .params import BgcParams, BgcTracers as T


def swr_absorption(oc, dz, lyr, p: BgcParams):
    """Mean shortwave absorption factor per layer and the column light
    attenuation (ocprod vloop, mo_ocprod.F90:243-278).

    Returns abs_bgc (K,J,I): fraction of surface irradiance available
    (layer mean), on wet layers."""

    def body(absorption, args):
        dzk, phyk, wet = args
        atten = p.atten_w + p.atten_c * jnp.maximum(0., phyk)
        dzs = jnp.maximum(dzk, 1.e-12)
        ab = (absorption / atten) * (1. - jnp.exp(-atten * dzs)) / dzs
        new_abs = jnp.where(wet, absorption * jnp.exp(-atten * dzs),
                            absorption)
        return new_abs, jnp.where(wet, ab, 0.)

    init = jnp.ones_like(dz[0])
    _, abs_bgc = lax.scan(body, init, (dz, oc[T.phy], lyr))
    return abs_bgc


def ocprod(oc, ptho, dz, strahl, satoxy, lyr, dtb, p: BgcParams,
           return_fluxes: bool = False):
    """Production + remineralization + denitrification + sulfate
    reduction (ocprod loops 1-3, mo_ocprod.F90:294-1010).

    Returns (oc, diags) where diags holds the vertically integrated
    export/production fields (mo_biomod accumulators).  With
    return_fluxes=True, returns (oc, diags, flx) where flx carries the
    per-layer process fluxes the carbon-isotope replay (bgc/ciso.py)
    multiplies by source-pool isotope ratios."""
    abs_bgc = swr_absorption(oc, dz, lyr, p)

    temp = jnp.clip(ptho, -3., 40.)

    # --- production loop (mo_ocprod.F90:330-520) -------------------
    phofa = p.pi_alpha * strahl[None] * abs_bgc
    temfa = 0.6 * 1.066 ** temp
    pho = dtb * phofa * temfa / jnp.sqrt(phofa ** 2 + temfa ** 2)

    avphy = jnp.maximum(p.phytomi, oc[T.phy])
    avgra = jnp.maximum(p.grami, oc[T.zoo])
    avsil = jnp.maximum(0., oc[T.silica])
    avdic = jnp.maximum(0., oc[T.sco212])
    avanut = jnp.maximum(0., jnp.minimum(oc[T.phosph],
                                         oc[T.ano3] / p.rnit))
    avanfe = jnp.maximum(0., jnp.minimum(avanut, oc[T.iron] / p.riron))
    xa = avanfe
    xn = xa / (1. + pho * avphy / (xa + p.bkphy))
    phosy = jnp.maximum(0., xa - xn)
    phosy = jnp.where(avdic <= p.rcar * phosy, avdic / p.rcar, phosy)

    ya = avphy + phosy
    yn = ((ya + p.grazra * dtb * avgra * p.phytomi / (avphy + p.bkzoo))
          / (1. + p.grazra * dtb * avgra / (avphy + p.bkzoo)))
    grazing = jnp.maximum(0., ya - yn)
    graton = p.epsher * (1. - p.zinges) * grazing
    gratpoc = (1. - p.epsher) * grazing
    grawa = p.epsher * p.zinges * grazing

    phythresh = jnp.maximum(0., oc[T.phy] - 2. * p.phytomi)
    zoothresh = jnp.maximum(0., oc[T.zoo] - 2. * p.grami)
    phymor = p.dyphy * dtb * phythresh
    exud = p.gammap * dtb * phythresh
    zoomor = p.spemor * dtb * zoothresh * zoothresh
    excdoc = p.gammaz * dtb * zoothresh
    export = zoomor * (1. - p.ecan) + phymor + gratpoc

    delsil = jnp.minimum(p.ropal * export * avsil / (avsil + p.bkopal),
                         0.5 * avsil)
    delcar = p.rcalc * export * p.bkopal / (avsil + p.bkopal)

    dmsprod = ((p.dmsp5 * delsil + p.dmsp4 * delcar)
               * (1. + 1. / (temp + p.dmsp1) ** 2))
    dms_uv = p.dmsp2 * dtb * phofa / p.pi_alpha * oc[T.dms]

    dtr = -phosy + graton + p.ecan * zoomor

    wet = lyr
    upd = {
        T.phosph: dtr,
        T.ano3: dtr * p.rnit,
        T.alkali: -2. * delcar - (p.rnit + 1.) * dtr,
        T.oxygen: -dtr * p.ro2ut,
        T.det: export,
        T.dms: dmsprod - dms_uv,
        T.sco212: -delcar + p.rcar * dtr,
        T.phy: phosy - grazing - phymor - exud,
        T.zoo: grawa - excdoc - zoomor,
        T.doc: excdoc + exud,
        T.calc: delcar,
        T.silica: -delsil,
        T.opal: delsil,
        T.iron: dtr * p.riron,
    }
    for idx, d in upd.items():
        oc = oc.at[idx].add(jnp.where(wet, d, 0.))

    intphosy = ksum(jnp.where(wet, phosy * p.rcar * dz, 0.), axis=0)
    expoor = ksum(jnp.where(wet, export * p.rcar * dz, 0.), axis=0)
    expoca = ksum(jnp.where(wet, delcar * dz, 0.), axis=0)
    exposi = ksum(jnp.where(wet, delsil * dz, 0.), axis=0)

    # --- aerobic remineralization (mo_ocprod.F90:620-800) ----------
    aerob = oc[T.oxygen] > p.o2thresh_aerob
    pocrem = jnp.minimum(p.drempoc * dtb * oc[T.det],
                         0.33 * oc[T.oxygen] / p.ro2ut)
    docrem = jnp.minimum(p.remido * dtb * oc[T.doc],
                         0.33 * oc[T.oxygen] / p.ro2ut)
    pocrem = jnp.where(aerob & wet, jnp.maximum(pocrem, 0.), 0.)
    docrem = jnp.where(aerob & wet, jnp.maximum(docrem, 0.), 0.)
    remin = pocrem + docrem

    oc = oc.at[T.det].add(-pocrem)
    oc = oc.at[T.doc].add(-docrem)
    oc = oc.at[T.phosph].add(remin)
    oc = oc.at[T.ano3].add(remin * p.rnit)
    oc = oc.at[T.alkali].add(-(p.rnit + 1.) * remin)
    oc = oc.at[T.oxygen].add(-p.ro2ut * remin)
    oc = oc.at[T.sco212].add(p.rcar * remin)
    oc = oc.at[T.iron].add(
        remin * p.riron
        - jnp.where(wet, p.relaxfe * dtb
                    * jnp.maximum(oc[T.iron] - p.fesoly, 0.), 0.))

    # opal dissolution (mo_ocprod.F90:771-781)
    opalrem = jnp.where(wet, p.dremopal * dtb * 0.1 * (temp + 3.)
                        * oc[T.opal], 0.)
    opalrem = jnp.maximum(opalrem, 0.)
    oc = oc.at[T.opal].add(-opalrem)
    oc = oc.at[T.silica].add(opalrem)

    # N2O production from remineralization (mo_ocprod.F90:783-794)
    aou = satoxy - oc[T.oxygen]
    refra = 1. + 3. * (0.5 + jnp.sign(aou - 1.97e-4) * 0.5)
    dn2o = remin * 1.e-4 * p.ro2ut * refra
    oc = oc.at[T.an2o].add(dn2o)
    oc = oc.at[T.gasnit].add(-dn2o)
    oc = oc.at[T.oxygen].add(-0.5 * dn2o)

    # bacterial DMS decomposition (mo_ocprod.F90:797-799)
    dms_bac = (p.dmsp3 * dtb * jnp.abs(temp + 3.) * oc[T.dms]
               * (oc[T.dms] / (p.dmsp6 + oc[T.dms])))
    oc = oc.at[T.dms].add(-jnp.where(wet, dms_bac, 0.))

    # --- denitrification (ocprod loop2, mo_ocprod.F90:874-930) -----
    hypox = (oc[T.oxygen] < p.o2thresh_hypoxic) & wet
    remin_dn = p.drempoc_anaerob * dtb * jnp.minimum(
        oc[T.det], 0.5 * oc[T.ano3] / p.rdnit1)
    remin2o = p.dremn2o * dtb * jnp.minimum(
        oc[T.det], 0.003 * oc[T.an2o] / p.rdn2o1)
    remin_dn = jnp.where(hypox, jnp.maximum(remin_dn, 0.), 0.)
    remin2o = jnp.where(hypox, jnp.maximum(remin2o, 0.), 0.)

    oc = oc.at[T.alkali].add((p.rdnit1 - 1.) * remin_dn - remin2o)
    oc = oc.at[T.sco212].add(p.rcar * (remin_dn + remin2o))
    oc = oc.at[T.det].add(-(remin_dn + remin2o))
    oc = oc.at[T.phosph].add(remin_dn + remin2o)
    oc = oc.at[T.ano3].add(-p.rdnit1 * remin_dn)
    oc = oc.at[T.gasnit].add(p.rdnit2 * remin_dn + p.rdn2o2 * remin2o)
    oc = oc.at[T.iron].add(p.riron * (remin_dn + remin2o))
    oc = oc.at[T.an2o].add(-p.rdn2o1 * remin2o)
    intdnit = ksum(p.rdnit0 * remin_dn * dz, axis=0)

    # --- sulfate reduction (ocprod loop3, mo_ocprod.F90:965-1010) --
    sul = hypox & (oc[T.ano3] < p.no3thresh_sulf)
    remin_su = jnp.where(sul, p.dremsul * dtb * oc[T.det], 0.)
    oc = oc.at[T.det].add(-remin_su)
    oc = oc.at[T.alkali].add(-(p.rnit + 1.) * remin_su)
    oc = oc.at[T.sco212].add(p.rcar * remin_su)
    oc = oc.at[T.phosph].add(remin_su)
    oc = oc.at[T.ano3].add(p.rnit * remin_su)
    oc = oc.at[T.iron].add(p.riron * remin_su)

    diags = {'intphosy': intphosy, 'expoor': expoor, 'expoca': expoca,
             'exposi': exposi, 'intdnit': intdnit}
    if return_fluxes:
        w = lambda a: jnp.where(wet, a, 0.)
        flx = {'phosy': w(phosy), 'grazing': w(grazing),
               'phymor': w(phymor), 'zoomor': w(zoomor),
               'excdoc': w(excdoc), 'exud': w(exud),
               'export': w(export), 'avsil': avsil,
               'pocrem': pocrem, 'docrem': docrem,
               'remin_dn': remin_dn + remin2o, 'remin_su': remin_su}
        return oc, diags, flx
    return oc, diags


def cyano(oc, ptho, dz, euph, dtb, p: BgcParams):
    """Cyanobacteria N2 fixation in the euphotic zone
    (mo_cyano.F90:28-100, base path without extended N cycle).

    euph: boolean (K,J,I) euphotic-zone wet mask (k <= kwrbioz)."""
    ttemp = jnp.clip(ptho, -3., 40.)
    nfixtfac = jnp.maximum(
        0., p.tf2 * ttemp * ttemp + p.tf1 * ttemp + p.tf0) / p.tff
    deficit = euph & (oc[T.ano3] < p.rnit * oc[T.phosph])
    blue = p.bluefix * dtb * nfixtfac
    new_no3 = (oc[T.ano3] * (1. - blue)
               + blue * p.rnit * oc[T.phosph])
    dansp = jnp.where(deficit, new_no3 - oc[T.ano3], 0.)
    oc = oc.at[T.ano3].add(dansp)
    oc = oc.at[T.gasnit].add(-dansp * 0.5)
    oc = oc.at[T.oxygen].add(-dansp * 1.25)
    oc = oc.at[T.alkali].add(-dansp)
    intnfix = ksum(dansp * dz, axis=0)
    return oc, intnfix
