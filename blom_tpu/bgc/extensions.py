"""Optional iHAMOCC subsystems: extended N cycle, bromoform, shelf-sea
residence time.

TPU-native counterparts of the reference's compile-flag extensions:

- extended nitrogen cycle (use_extNcycle): nitrification (NH4 -> NO2 ->
  NO3 with dark carbon fixation and O2-dependent N2O branching),
  denitrification / dissimilatory NO3 reduction, anammox, and the
  combined NO2 denitrification + DNRA step
  (/root/reference/hamocc/mo_extNwatercol.F90:83-474, parameter
  defaults mo_param_bgc.F90:371-427,765-767).
- bromoform tracer (use_BROMO): production tied to primary production
  with an opal-dependence, UV photolysis, hydrolysis and halide
  substitution decay, and air-sea exchange
  (/root/reference/hamocc/mo_ocprod.F90:548-563,
  mo_carchm.F90:295,360-388,421,547-548,612-626,
  mo_param_bgc.F90:508-513, atm_bromo mo_param_bgc.F90:231).
- shelf-sea water residence time (use_shelfsea_res_time): an age-like
  tracer incremented on the shelf and relaxed to zero off it
  (/root/reference/hamocc/mo_shelfsea_restime.F90:36-71).

All functions are elementwise over dense (K, J, I) concentration
arrays; `dtb` is the timestep in days (the reference folds dtb into the
rates at init, mo_param_bgc.F90:829-846).  Extension tracers live in
extra slots appended after the base block (see
params.make_tracer_index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .params import BgcParams, BgcTracers as T

_EPS = 2.220446049250313e-16


class ExtNParams(NamedTuple):
    """Extended-N-cycle rate constants (mo_param_bgc.F90:371-427; the
    derived constants of :182-196,765-767).  Rates in 1/day."""
    # nitrification on NH4 (:371-382)
    ranh4nitr: float = 0.6
    q10anh4nitr: float = 3.3
    trefanh4nitr: float = 20.
    bkoxamox: float = 0.333e-6
    bkanh4nitr: float = 0.133e-6
    bkamoxn2o: float = 0.1e-6
    n2omaxy: float = 0.003
    n2oybeta: float = 18.
    bkyamox: float = 0.333e-6
    # nitrification on NO2 (:385-390)
    rano2nitr: float = 0.75
    q10ano2nitr: float = 2.7
    trefano2nitr: float = 20.
    bkoxnitr: float = 0.788e-6
    bkano2nitr: float = 0.287e-6
    nob2aoay: float = 0.44
    # denitrification on NO3 (:393-397)
    rano3denit: float = 0.0001
    q10ano3denit: float = 2.
    trefano3denit: float = 10.
    sc_ano3denit: float = 0.12e6
    bkano3denit: float = 5.e-6
    # anammox (:400-406)
    rano2anmx: float = 0.001
    q10anmx: float = 1.6
    trefanmx: float = 10.
    alphaanmx: float = 0.45e6
    bkoxanmx: float = 11.3e-6
    bkano2anmx: float = 5.e-6
    # denitrification on NO2 (:409-413)
    rano2denit: float = 0.002
    q10ano2denit: float = 2.0
    trefano2denit: float = 10.
    bkoxano2denit: float = 2.e-6
    bkano2denit: float = 5.6e-6
    # DNRA on NO2 (:416-420)
    rdnra: float = 0.0001
    q10dnra: float = 2.
    trefdnra: float = 10.
    bkoxdnra: float = 2.5e-6
    bkdnra: float = 0.05e-6
    # denitrification on N2O (:423-427)
    ran2odenit: float = 0.00035
    q10an2odenit: float = 3.
    trefan2odenit: float = 10.
    bkoxan2odenit: float = 10.e-6
    bkan2odenit: float = 0.1e-6
    # N2O pathway split (derived, :765-767)
    yield_n2o_inf: float = 0.077
    # stoichiometry (:182-196)
    max_limiter: float = 0.9999
    ro2utammo: float = 140.
    rnoxp: float = 280.
    rno2anmx: float = 1144.
    rnh4anmx: float = 880.
    rno2dnra: float = 93. + 1. / 3.

    @property
    def mufn2o(self):
        return 0.11 / (50. * 1.e6 * self.bkoxamox)

    @property
    def bn2o(self):
        return self.yield_n2o_inf / (50. * self.mufn2o)

    @property
    def bkanh4anmx(self):
        return self.bkano2anmx * self.rnh4anmx / self.rno2anmx

    @property
    def rnh4dnra(self):
        return self.rno2dnra + 16.        # rnit from BgcParams default


def _tclip(ptho):
    """merge(ptho, 10, ptho < 40) of the reference."""
    return jnp.where(ptho < 40., ptho, 10.)


def nitrification(oc, ti, ptho, wet, dtb, p: BgcParams, ep: ExtNParams):
    """NH4 -> NO2 -> NO3 nitrification with dark carbon fixation and
    O2-dependent N2O production (mo_extNwatercol.F90:83-211).

    ti: tracer-index namespace with base indices + anh4/ano2.
    Returns (oc, diags)."""
    rnoi = 1. / p.rnit
    rc2n = p.rcar / p.rnit
    ro2nnit = ep.ro2utammo / p.rnit
    rnm1 = p.rnit - 1.
    temp = _tclip(ptho)
    o2 = oc[T.oxygen]
    nh4 = oc[ti.anh4]
    no2 = oc[ti.ano2]

    # ammonium oxidation (amox)
    tdep = ep.q10anh4nitr ** ((temp - ep.trefanh4nitr) / 10.)
    o2lim = o2 / (o2 + ep.bkoxamox)
    nut1 = nh4 / (nh4 + ep.bkanh4nitr)
    anh4new = nh4 / (1. + ep.ranh4nitr * dtb * tdep * o2lim * nut1)
    potdnh4amox = jnp.maximum(0., nh4 - anh4new)

    # pathway split (Santoro et al. 2021 / Ji et al. 2018 form)
    fn2o = (ep.mufn2o * (ep.bn2o + (1. - ep.bn2o)
                         * ep.bkoxamox / (o2 + ep.bkoxamox))
            * nh4 / (nh4 + ep.bkamoxn2o))
    fno2 = o2 / (o2 + ep.bkoxamox)
    fdetamox = (ep.n2omaxy * 2. * (1. + ep.n2oybeta) * o2 * ep.bkyamox
                / (o2 ** 2 + 2. * o2 * ep.bkyamox + ep.bkyamox ** 2))
    ftot = fn2o + fno2 + fdetamox + _EPS
    fn2o = fn2o / ftot
    fno2 = fno2 / ftot
    fdetamox = 1. - (fn2o + fno2)

    # NO2 oxidation (nitr)
    tdep2 = ep.q10ano2nitr ** ((temp - ep.trefano2nitr) / 10.)
    o2lim2 = o2 / (o2 + ep.bkoxnitr)
    nut2 = no2 / (no2 + ep.bkano2nitr)
    ano2new = no2 / (1. + ep.rano2nitr * dtb * tdep2 * o2lim2 * nut2)
    potdno2nitr = jnp.maximum(0., no2 - ano2new)

    no2fdetamox = ep.nob2aoay * ep.n2omaxy * 2. * (1. + ep.n2oybeta) \
        * o2 * ep.bkyamox \
        / (o2 ** 2 + 2. * o2 * ep.bkyamox + ep.bkyamox ** 2)
    # the reference recomputes no2fn2o/no2fno2 with the same formulas as
    # fn2o/fno2 pre-normalization (mo_extNwatercol.F90:152-160)
    no2fn2o = (ep.mufn2o * (ep.bn2o + (1. - ep.bn2o)
                            * ep.bkoxamox / (o2 + ep.bkoxamox))
               * nh4 / (nh4 + ep.bkamoxn2o))
    no2fno2 = o2 / (o2 + ep.bkoxamox)
    fdetnitr = no2fdetamox / (no2fno2 + no2fn2o + _EPS)

    totd = potdnh4amox + potdno2nitr
    amoxfrac = potdnh4amox / (totd + _EPS)
    nitrfrac = 1. - amoxfrac

    ml = ep.max_limiter
    totd = jnp.maximum(0., jnp.minimum(
        totd, jnp.minimum(
            ml * nh4 / (amoxfrac + fdetnitr * nitrfrac + _EPS),
            jnp.minimum(
                ml * oc[T.sco212]
                / (rc2n * (fdetamox * amoxfrac + fdetnitr * nitrfrac)
                   + _EPS),
                jnp.minimum(
                    ml * oc[T.phosph]
                    / (rnoi * (fdetamox * amoxfrac
                               + fdetnitr * nitrfrac) + _EPS),
                    jnp.minimum(
                        ml * oc[T.iron]
                        / (p.riron * rnoi * (fdetamox * amoxfrac
                                             + fdetnitr * nitrfrac)
                           + _EPS),
                        jnp.minimum(
                            ml * o2
                            / ((1.5 * fno2 + fn2o - ro2nnit * fdetamox)
                               * amoxfrac
                               + (0.5 - ro2nnit * fdetnitr) * nitrfrac
                               + _EPS),
                            ml * oc[T.alkali]
                            / ((2. * fno2 + fn2o
                                + rnm1 * rnoi * fdetamox) * amoxfrac
                               + rnm1 * rnoi * fdetnitr * nitrfrac
                               + _EPS))))))))
    amox = jnp.where(wet, amoxfrac * totd, 0.)
    nitr = jnp.where(wet, nitrfrac * totd, 0.)

    om = rnoi * (fdetamox * amox + fdetnitr * nitr)
    oc = oc.at[ti.anh4].add(-amox - fdetnitr * nitr)
    oc = oc.at[T.an2o].add(0.5 * fn2o * amox)
    oc = oc.at[ti.ano2].add(fno2 * amox - nitr)
    oc = oc.at[T.ano3].add(nitr)
    oc = oc.at[T.det].add(om)
    oc = oc.at[T.sco212].add(-rc2n * (fdetamox * amox + fdetnitr * nitr))
    oc = oc.at[T.phosph].add(-om)
    oc = oc.at[T.iron].add(-p.riron * om)
    oc = oc.at[T.oxygen].add(
        -(1.5 * fno2 + fn2o - ro2nnit * fdetamox) * amox
        - (0.5 - ro2nnit * fdetnitr) * nitr)
    oc = oc.at[T.alkali].add(
        -(2. * fno2 + fn2o + rnm1 * rnoi * fdetamox) * amox
        - rnm1 * rnoi * fdetnitr * nitr)
    diags = {'nitr_NH4': amox, 'nitr_NO2': nitr,
             'nitr_N2O_prod': 0.5 * fn2o * amox,
             'nitr_NH4_OM': rnoi * fdetamox * amox,
             'nitr_NO2_OM': rnoi * fdetnitr * nitr}
    return oc, diags


def denit_no3_to_no2(oc, ti, ptho, wet, dtb, p: BgcParams,
                     ep: ExtNParams):
    """Denitrification / dissimilatory NO3 reduction NO3 -> NO2
    (mo_extNwatercol.F90:214-265)."""
    temp = _tclip(ptho)
    rnoxpi = 1. / ep.rnoxp
    rnm1 = p.rnit - 1.
    no3 = oc[T.ano3]
    tdep = ep.q10ano3denit ** ((temp - ep.trefano3denit) / 10.)
    o2inhib = 1. - jnp.tanh(ep.sc_ano3denit * oc[T.oxygen])
    nutlim = no3 / (no3 + ep.bkano3denit)
    no3new = no3 / (1. + ep.rano3denit * dtb * tdep * o2inhib * nutlim)
    d = jnp.maximum(0., jnp.minimum(
        no3 - no3new, ep.max_limiter * oc[T.det] * ep.rnoxp))
    d = jnp.where(wet, d, 0.)
    oc = oc.at[T.ano3].add(-d)
    oc = oc.at[ti.ano2].add(d)
    oc = oc.at[T.det].add(-d * rnoxpi)
    oc = oc.at[ti.anh4].add(d * p.rnit * rnoxpi)
    oc = oc.at[T.sco212].add(d * p.rcar * rnoxpi)
    oc = oc.at[T.phosph].add(d * rnoxpi)
    oc = oc.at[T.iron].add(d * p.riron * rnoxpi)
    oc = oc.at[T.alkali].add(d * rnm1 * rnoxpi)
    return oc, {'denit_NO3': d}


def anammox(oc, ti, ptho, wet, dtb, p: BgcParams, ep: ExtNParams):
    """Anaerobic ammonium oxidation (mo_extNwatercol.F90:268-326)."""
    temp = _tclip(ptho)
    rno2anmxi = 1. / ep.rno2anmx
    rnm1 = p.rnit - 1.
    no2 = oc[ti.ano2]
    nh4 = oc[ti.anh4]
    tdep = ep.q10anmx ** ((temp - ep.trefanmx) / 10.)
    ex = jnp.exp(jnp.clip(
        ep.alphaanmx * (oc[T.oxygen] - ep.bkoxanmx), -50., 50.))
    o2inhib = 1. - ex / (1. + ex)
    nut1 = no2 / (no2 + ep.bkano2anmx)
    nut2 = nh4 / (nh4 + ep.bkanh4anmx)
    no2new = no2 / (1. + ep.rano2anmx * dtb * tdep * o2inhib
                    * nut1 * nut2)
    ml = ep.max_limiter
    d = jnp.maximum(0., jnp.minimum(
        no2 - no2new, jnp.minimum(
            ml * nh4 * ep.rno2anmx / ep.rnh4anmx,
            jnp.minimum(
                ml * oc[T.sco212] * ep.rno2anmx / p.rcar,
                jnp.minimum(
                    ml * oc[T.phosph] * ep.rno2anmx,
                    jnp.minimum(
                        ml * oc[T.iron] * ep.rno2anmx / p.riron,
                        ml * oc[T.alkali] * ep.rno2anmx / rnm1))))))
    d = jnp.where(wet, d, 0.)
    oc = oc.at[ti.ano2].add(-d)
    oc = oc.at[ti.anh4].add(-d * ep.rnh4anmx * rno2anmxi)
    oc = oc.at[T.gasnit].add(d * (ep.rnh4anmx - p.rnit) * rno2anmxi)
    oc = oc.at[T.ano3].add(d * ep.rnoxp * rno2anmxi)
    oc = oc.at[T.det].add(d * rno2anmxi)
    oc = oc.at[T.sco212].add(-d * p.rcar * rno2anmxi)
    oc = oc.at[T.phosph].add(-d * rno2anmxi)
    oc = oc.at[T.iron].add(-d * p.riron * rno2anmxi)
    oc = oc.at[T.alkali].add(-d * rnm1 * rno2anmxi)
    return oc, {'anmx_N2_prod': d * (ep.rnh4anmx - p.rnit) * rno2anmxi,
                'anmx_OM_prod': d * rno2anmxi}


def denit_dnra(oc, ti, ptho, wet, dtb, p: BgcParams, ep: ExtNParams):
    """NO2 -> N2O -> N2 denitrification + DNRA NO2 -> NH4
    (mo_extNwatercol.F90:329-454)."""
    temp = _tclip(ptho)
    rnoxpi = 1. / ep.rnoxp
    rno2dnrai = 1. / ep.rno2dnra
    rnh4dnra = ep.rnh4dnra
    rnm1 = p.rnit - 1.
    o2 = oc[T.oxygen]
    no2 = oc[ti.ano2]
    n2o = oc[T.an2o]

    # denitrification on N2O
    tdep = ep.q10an2odenit ** ((temp - ep.trefan2odenit) / 10.)
    o2in = ep.bkoxan2odenit ** 2 / (o2 ** 2 + ep.bkoxan2odenit ** 2)
    nut = n2o / (n2o + ep.bkan2odenit)
    an2onew = n2o / (1. + ep.ran2odenit * dtb * tdep * o2in * nut)
    an2odenit = jnp.maximum(0., jnp.minimum(n2o, n2o - an2onew))

    # potential denitrification rate on NO2
    tdep = ep.q10ano2denit ** ((temp - ep.trefano2denit) / 10.)
    o2in = ep.bkoxano2denit ** 2 / (o2 ** 2 + ep.bkoxano2denit ** 2)
    nut = no2 / (no2 + ep.bkano2denit)
    rpotden = jnp.maximum(0., ep.rano2denit * dtb * tdep * o2in * nut)

    # potential DNRA rate on NO2
    tdep = ep.q10dnra ** ((temp - ep.trefdnra) / 10.)
    o2in = ep.bkoxdnra ** 2 / (o2 ** 2 + ep.bkoxdnra ** 2)
    nut = no2 / (no2 + ep.bkdnra)
    rpotdnra = jnp.maximum(0., ep.rdnra * dtb * tdep * o2in * nut)

    potno2new = no2 / (1. + rpotden + rpotdnra)
    potdno2 = jnp.maximum(0., jnp.minimum(no2, no2 - potno2new))
    fdenit = rpotden / (rpotden + rpotdnra + _EPS)
    fdnra = 1. - fdenit
    ano2denit = fdenit * potdno2
    ano2dnra = fdnra * potdno2

    # detritus limitation
    potddet = rnoxpi * (ano2denit + an2odenit) + rno2dnrai * ano2dnra
    fdet1 = rnoxpi * ano2denit / (potddet + _EPS)
    fdet2 = rnoxpi * an2odenit / (potddet + _EPS)
    fdet3 = 1. - fdet1 - fdet2
    potddet = jnp.maximum(0., jnp.minimum(
        potddet, ep.max_limiter * oc[T.det]))
    potddet = jnp.where(wet, potddet, 0.)

    ano2denit = fdet1 * ep.rnoxp * potddet
    an2odenit = fdet2 * ep.rnoxp * potddet
    ano2dnra = fdet3 * ep.rno2dnra * potddet

    oc = oc.at[ti.ano2].add(-ano2denit - ano2dnra)
    oc = oc.at[T.an2o].add(-an2odenit + 0.5 * ano2denit)
    oc = oc.at[T.gasnit].add(an2odenit)
    oc = oc.at[ti.anh4].add(p.rnit * rnoxpi * (ano2denit + an2odenit)
                            + rnh4dnra * rno2dnrai * ano2dnra)
    oc = oc.at[T.det].add(-(ano2denit + an2odenit) * rnoxpi
                          - ano2dnra * rno2dnrai)
    oc = oc.at[T.sco212].add(p.rcar * rnoxpi * (ano2denit + an2odenit)
                             + p.rcar * rno2dnrai * ano2dnra)
    oc = oc.at[T.phosph].add((ano2denit + an2odenit) * rnoxpi
                             + ano2dnra * rno2dnrai)
    oc = oc.at[T.iron].add(p.riron * rnoxpi * (ano2denit + an2odenit)
                           + p.riron * rno2dnrai * ano2dnra)
    oc = oc.at[T.alkali].add(
        (295. * ano2denit + rnm1 * an2odenit) * rnoxpi
        + (ep.rno2dnra + rnh4dnra - 1.) * rno2dnrai * ano2dnra)
    return oc, {'denit_NO2': ano2denit, 'denit_N2O': an2odenit,
                'DNRA_NO2': ano2dnra}


def extn_watercol(oc, ti, ptho, wet, dtb, p: BgcParams,
                  ep: ExtNParams = ExtNParams()):
    """The extNcycle process sequence as called from ocprod
    (mo_ocprod.F90:940-955): nitrification -> denit NO3->NO2 -> anammox
    -> denit/DNRA.  Returns (oc, diags)."""
    oc, d1 = nitrification(oc, ti, ptho, wet, dtb, p, ep)
    oc, d2 = denit_no3_to_no2(oc, ti, ptho, wet, dtb, p, ep)
    oc, d3 = anammox(oc, ti, ptho, wet, dtb, p, ep)
    oc, d4 = denit_dnra(oc, ti, ptho, wet, dtb, p, ep)
    d1.update(d2); d1.update(d3); d1.update(d4)
    return oc, d1


# ----------------------------------------------------------------------
# Bromoform (use_BROMO)
# ----------------------------------------------------------------------

class BromoParams(NamedTuple):
    """Bromoform constants (mo_param_bgc.F90:508-513, atm_bromo :231)."""
    rbro: float = 2.4e-6 * 16.       # production per phosy [P units]
    fbro1: float = 1.0
    fbro2: float = 1.0
    atm_bromo: float = 3.4           # atmospheric CHBr3 [ppt]


def bromo_ocprod(bromo, phosy, avsil, strahl, swa_clim0, abs_uv,
                 bkopal, dtb, bp: BromoParams, wet):
    """Production from primary production + UV photolysis sink
    (mo_ocprod.F90:548-563).  swa_clim0: climatological surface
    shortwave used to normalize the UV profile; abs_uv: fractional UV
    penetration per layer (K,J,I)."""
    bro_beta = bp.rbro * (bp.fbro1 * avsil / (avsil + bkopal)
                          + bp.fbro2 * bkopal / (avsil + bkopal))
    safe = jnp.maximum(swa_clim0, 1.e-30)
    bro_uv = jnp.where(
        swa_clim0 > 0.,
        0.0333 * dtb * 0.3 * (strahl / safe)[None] * abs_uv * bromo,
        0.)
    d = jnp.where(wet, bro_beta * phosy - bro_uv, 0.)
    return bromo + d, {'int_chbr3_prod': bro_beta * phosy,
                       'int_chbr3_uv': bro_uv}


def bromo_deep_decay(bromo, tk, kw_water, ah1, dtsec, wet):
    """Hydrolysis (Stemmler et al. 2015 eq. 2-4) and halide substitution
    (eq. 5-6) decay (mo_carchm.F90:612-626).  tk: temperature [K];
    kw_water: water dissociation product Kw; ah1: hydrogen-ion conc."""
    kb1 = 2.05e12 * jnp.exp(-1.073e5 / (8.314 * tk)) * dtsec
    b = bromo * (1.0 - kb1 * kw_water / jnp.maximum(ah1, 1.e-30))
    lsub = 7.33e-10 * jnp.exp(1.250713e4 * (1.0 / 298. - 1.0 / tk)) \
        * dtsec
    b = b * (1.0 - lsub)
    return jnp.where(wet, b, bromo)


def bromo_surface_flux(bromo0, temp0, fice, fu10, slp, dz0, dtsec,
                       bp: BromoParams, wet0):
    """Air-sea CHBr3 exchange (mo_carchm.F90:295,360,386-387,547-548).
    Returns (new surface bromoform, flux into atmosphere [kmol/m2])."""
    t = temp0
    t2, t3 = t * t, t * t * t
    tk = t + 273.15
    sch = 4662.8 - 319.45 * t + 9.9012 * t2 - 0.1159 * t3
    a_bromo = jnp.exp(13.16 - 4973.0 / tk)
    kw = ((1. - fice) * 1.e-2 / 3600.
          * (0.222 * fu10 ** 2 + 0.33 * fu10)
          * (660. / jnp.maximum(sch, 1.)) ** 0.5)
    flux = kw * dtsec * (bp.atm_bromo / a_bromo * 1.0e-12 * slp
                         * 1.0e-5 / (tk * 0.083) - bromo0)
    flux = jnp.where(wet0, flux, 0.)
    new = bromo0 + flux / jnp.maximum(dz0, 1.e-12)
    return jnp.where(wet0, new, bromo0), -flux


# ----------------------------------------------------------------------
# Natural DIC (use_natDIC)
# ----------------------------------------------------------------------

def natdic_bio_mirror(oc_pre, oc_post, ti):
    """Apply the biological DIC/alkalinity/calcite tendencies to the
    natural-carbon tracers.  In the reference every bio process adds
    identical terms to inat* (e.g. mo_ocprod.F90:528-543,
    mo_extNwatercol.F90:190-196); mirroring the net bio delta is
    algebraically the same and keeps the optional path out of the base
    kernels.  Call after ocprod/cyano/extN, before carchm."""
    oc = oc_post
    oc = oc.at[ti.natsco212].add(oc_post[T.sco212] - oc_pre[T.sco212])
    oc = oc.at[ti.natalkali].add(oc_post[T.alkali] - oc_pre[T.alkali])
    oc = oc.at[ti.natcalc].add(oc_post[T.calc] - oc_pre[T.calc])
    return oc


def carchm_nat(oc, ti, ptho, psao, prho, dz, ptiestu, lyr, fu10, slp,
               fice, dtsec, p: BgcParams, atm_co2_nat: float = 284.7):
    """Parallel carbonate system for the natural (pre-industrial)
    carbon tracers (the use_natDIC branches of mo_carchm.F90:245-257,
    444-451,545,598-604,633-658; atm_co2_nat mo_param_bgc.F90:230).

    Solves pH for (natsco212, natalkali), applies the natural air-sea
    CO2 flux against a fixed pre-industrial atmosphere, and dissolves
    natcalc.  Returns (oc, diags with natpco2/natco2flux)."""
    from . import chemistry as chem
    from .carchm import SRFDIC_MIN, XCONVXA

    t = jnp.clip(ptho, chem.TEMP_MIN, chem.TEMP_MAX)
    s = jnp.clip(psao, chem.SALN_MIN, chem.SALN_MAX)
    tk = t + chem.TZERO
    prb = ptiestu * 98060. * 1.027e-6
    k = chem.kequi(t, s, prb)
    rrho = prho

    tc = oc[ti.natsco212] / rrho
    ta = oc[ti.natalkali] / rrho
    sit = oc[T.silica] / rrho
    pt = oc[T.phosph] / rrho
    ah1 = jnp.clip(oc[ti.nathi], p.ah_min, p.ah_max)
    ah1, ac = chem.solve_h(s, tc, ta, sit, pt, k, ah1, p.niter,
                           p.ah_min, p.ah_max)
    oc = oc.at[ti.nathi].set(jnp.where(lyr, ah1, oc[ti.nathi]))

    cu = (2. * tc - ac) / (2. + k.K1 / ah1)
    cb = k.K1 * cu / ah1
    cc = k.K2 * cb / ah1
    natco3 = cc * rrho

    # natural surface CO2 flux (mo_carchm.F90:444-451,545)
    t0 = t[0]
    tk0 = tk[0]
    scco2 = chem.schmidt_numbers(t0)[0]
    opn = 1. - fice
    kwco2 = opn * XCONVXA * fu10 ** 2 * jnp.sqrt(660. / scco2)
    rpp0 = slp / 101325.
    Bvir = (-1636.75 + 12.0408 * tk0 - 0.0327957 * tk0 ** 2
            + 0.0000316528 * tk0 ** 3)
    delta = 57.7 - 0.118 * tk0
    fc = jnp.exp(rpp0 * (Bvir + 2. * delta) / (82.057 * tk0))
    pH2O = jnp.exp(24.4543 - 67.4509 * (100. / tk0)
                   - 4.8489 * jnp.log(tk0 / 100.) - 0.000544 * s[0])
    dz0 = jnp.maximum(dz[0], 1.e-12)
    natcu_sat = k.Kh0[0] * atm_co2_nat * 1.e-6 * (rpp0 - pH2O) * fc
    fluxd = natcu_sat * kwco2 * dtsec * rrho[0]
    fluxu = cu[0] * kwco2 * dtsec * rrho[0]
    fluxu = jnp.minimum(
        fluxu, fluxd - (SRFDIC_MIN - oc[ti.natsco212, 0]) * dz0)
    wet0 = lyr[0]
    oc = oc.at[ti.natsco212, 0].add(
        jnp.where(wet0, (fluxd - fluxu) / dz0, 0.))

    # natural calcite dissolution (mo_carchm.F90:633-658)
    natomega = (chem.CALCON * s / 35.) * cc
    natomegaC = natomega / k.Kspc
    natsupsat = natco3 - natco3 / jnp.maximum(natomegaC, 1.e-12)
    natundsa = jnp.maximum(0., -natsupsat)
    dtb = dtsec / 86400.
    natdissol = jnp.where(lyr, jnp.minimum(
        natundsa, p.dremcalc * dtb * oc[ti.natcalc]), 0.)
    oc = oc.at[ti.natcalc].add(-natdissol)
    oc = oc.at[ti.natalkali].add(2. * natdissol)
    oc = oc.at[ti.natsco212].add(natdissol)

    natpco2 = cu[0] * 1.e6 / k.Kh0[0] / fc
    return oc, {'natco2flux': jnp.where(wet0, fluxu - fluxd, 0.),
                'natpco2': jnp.where(wet0, natpco2, 0.),
                'natomegac': natomegaC}


# ----------------------------------------------------------------------
# Shelf-sea residence time (use_shelfsea_res_time)
# ----------------------------------------------------------------------

def shelfsea_residence_time(shelfage, shelfmask, wet, dtb):
    """Age-like tracer: +dtb on shelf columns, relaxed toward zero
    elsewhere (shelfsea_residence_time,
    mo_shelfsea_restime.F90:36-71)."""
    upd = jnp.where(shelfmask[None], shelfage + dtb,
                    jnp.maximum(0., shelfage - dtb))
    return jnp.where(wet, upd, shelfage)
