"""Global BGC inventory / conservation check.

TPU-native counterpart of the reference inventory
(/root/reference/hamocc/mo_inventory_bgc.F90:28-512 inventory_bgc):
volume-integrated totals and mean concentrations of every ocean tracer,
pore-water/sediment/burial totals when the sediment is active, and the
aggregated element budgets (C, P, Si, N, O2, alkalinity) used by the
reference's use_PBGC_OCNP_TIMESTEP per-process conservation audit
(extN_inv_check, mo_extNwatercol.F90:457-474).

Sums use the fixed-order strip hierarchy of parallel/repsum.py, so
inventories are bit-identical on any device mesh (the reference's
xcsum PE-invariance, mod_xc.F90:2071-2192).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..parallel.repsum import repsum_2d, repsum_3d
from .params import BgcParams, BgcTracers as T, NBGC


def inventory_bgc(oc, dz, area, omask, p: BgcParams, ti=None, sed=None,
                  atm_co2_ppm=None, names=None):
    """Compute the BGC inventory (inventory_bgc,
    mo_inventory_bgc.F90:28-460).

    oc: (ntr, K, J, I) concentrations [kmol/m3]; dz: (K, J, I) layer
    thickness [m]; area: (J, I) cell areas [m2]; ti: optional extended
    tracer-index namespace (params.make_tracer_index); sed: optional
    SedState; atm_co2_ppm: optional global-mean atmospheric CO2 to fold
    into total carbon (ppm2con = 0.35e-3 kmol/m2/ppm,
    mo_inventory_bgc.F90:82-84).

    Returns a dict with per-tracer totals ('total_<name>'), mean
    concentrations ('mean_<name>'), ocean volume/area, ODZ volume and
    the element aggregates."""
    f64 = jnp.float64
    w = (dz * area[None] * omask[None]).astype(f64)   # cell volumes
    ztotvol = repsum_3d(w)
    ztotarea = repsum_2d((area * omask * (dz[0] > 0)).astype(f64))

    ntr = oc.shape[0]
    if names is None:
        from .params import TRACER_NAMES
        names = ti.names if ti is not None else TRACER_NAMES
        if len(names) < ntr:
            names = list(names) + [f'trc{i}' for i in
                                   range(len(names), ntr)]
    tot = jax.vmap(repsum_3d)(oc.astype(f64) * w[None])

    inv = {'totvol': ztotvol, 'totarea': ztotarea}
    for i in range(ntr):
        inv[f'total_{names[i]}'] = tot[i]
        inv[f'mean_{names[i]}'] = tot[i] / ztotvol

    def t(idx):
        return tot[idx]

    # ODZ volume, O2 < 20 umol/m3 threshold (mo_inventory_bgc.F90:102)
    inv['odz_volume'] = repsum_3d(jnp.where(
        oc[T.oxygen] < 20.e-6, w, 0.))

    # element aggregates (mo_inventory_bgc.F90:405-460)
    organic = t(T.det) + t(T.doc) + t(T.phy) + t(T.zoo)
    totalcarbon = organic * p.rcar + t(T.sco212) + t(T.calc)
    totalphos = organic + t(T.phosph)
    totalsil = t(T.silica) + t(T.opal)
    totalnitr = (organic * p.rnit + t(T.ano3) + t(T.gasnit) * 2.
                 + t(T.an2o) * 2.)
    totaloxy = (t(T.oxygen) + t(T.an2o) * 0.5
                - organic * p.ro2ut + t(T.sco212) + t(T.calc))
    totalalk = t(T.alkali)
    if ti is not None and hasattr(ti, 'anh4'):
        totalnitr = totalnitr + t(ti.anh4) + t(ti.ano2)
    if ti is not None and hasattr(ti, 'bromo'):
        inv['total_bromoform'] = t(ti.bromo)

    if sed is not None:
        # pore water + solid sediment + burial (mo_inventory_bgc.F90:
        # 130-198,405-412); sediment volumes use the module's fixed
        # porosity-weighted layer thicknesses
        from .sediment import (SEDDW, PORWAT, PORSOL, SedPow, SedSolid)
        import numpy as np
        pw = (jnp.asarray(SEDDW * PORWAT)[:, None, None]
              * (area * omask)[None]).astype(f64)
        ps = (jnp.asarray(SEDDW * PORSOL)[:, None, None]
              * (area * omask)[None]).astype(f64)
        powtot = jax.vmap(repsum_3d)(sed.powtra.astype(f64) * pw[None])
        sedtot = jax.vmap(repsum_3d)(sed.sedlay.astype(f64) * ps[None])
        burtot = jax.vmap(repsum_2d)(sed.burial.astype(f64)
                                     * (area * omask)[None])
        inv['total_powtra'] = powtot
        inv['total_sedlay'] = sedtot
        inv['total_burial'] = burtot
        totalcarbon = (totalcarbon + powtot[SedPow.aic]
                       + sedtot[SedSolid.ssc12]
                       + (sedtot[SedSolid.sso12]
                          + burtot[SedSolid.sso12]) * p.rcar
                       + burtot[SedSolid.ssc12])
        totalphos = (totalphos + powtot[SedPow.aph]
                     + sedtot[SedSolid.sso12]
                     + burtot[SedSolid.sso12])
        totalsil = (totalsil + powtot[SedPow.asi]
                    + sedtot[SedSolid.sssil] + burtot[SedSolid.sssil])

    if atm_co2_ppm is not None:
        ppm2con = 0.35e-3
        totalcarbon = totalcarbon + atm_co2_ppm * ppm2con * ztotarea

    inv['totalcarbon'] = totalcarbon
    inv['totalphos'] = totalphos
    inv['totalsil'] = totalsil
    inv['totalnitr'] = totalnitr
    inv['totaloxy'] = totaloxy
    inv['totalalk'] = totalalk
    return inv


def inventory_deltas(inv0: dict, inv1: dict, keys=('totalcarbon',
                     'totalphos', 'totalsil', 'totalnitr',
                     'totalalk')):
    """Relative drift of the element aggregates between two inventory
    snapshots (the printed audit of extN_inv_check /
    use_PBGC_OCNP_TIMESTEP)."""
    out = {}
    for k in keys:
        a, b = inv0[k], inv1[k]
        out[k] = float((b - a) / jnp.maximum(jnp.abs(a), 1.e-30))
    return out
