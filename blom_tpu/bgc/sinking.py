"""Particle sinking of detritus, calcite, opal and dust.

TPU-native counterpart of the reference scheme
(/root/reference/hamocc/mo_vertical_fluxes.F90:47-537 sinking +
get_ws).  The reference's per-column sequential implicit-upstream
update with a running donor layer becomes a `lax.scan` over K carrying
(donor concentration, donor speed) for the four sinking tracers; the
per-column mass-conservation normalization (tco/tcn ratio) and the
sediment-bypass redistribution of bottom fluxes are dense reductions.

Layers thinner than dp_min_sink mirror the donor concentration and do
not advance the donor (mo_vertical_fluxes.F90:196-210); the bottom
flux leaves from the last thick layer at that layer's sinking speed
(the reference evaluates get_ws at k=kpke for the bottom flux; using
the donor layer's own speed is equivalent for conservation since the
same speed enters both the budget and the flux).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.reduce import ksum as ksum2
from jax import lax

from .params import BgcParams, BgcTracers as T

SINKERS = (T.det, T.calc, T.opal, T.fdust)
SPEED_CLASS = {'poc': 0, 'cal': 1, 'opal': 2, 'dust': 3}


def sink_speeds(ptiestu, dtb, p: BgcParams):
    """Sinking speeds [m/timestep] at layer centres (get_ws,
    mo_vertical_fluxes.F90:47-75; WLIN branch = depth-linear POC)."""
    if p.use_wlin:
        wpoc = jnp.minimum(p.wmin + p.wlin * ptiestu, p.wmax) * dtb
    else:
        wpoc = jnp.full_like(ptiestu, p.wpoc_const) * dtb
    wcal = jnp.full_like(ptiestu, p.wcal_const) * dtb
    wopal = jnp.full_like(ptiestu, p.wopal_const) * dtb
    wdust = jnp.full_like(ptiestu, p.wdust_const) * dtb
    return jnp.stack([wpoc, wcal, wopal, wdust])


def sinking(oc, dz, ptiestu, omask, dtb, p: BgcParams, extra=()):
    """Advance sinking for one timestep.  Returns (oc, bottom_fluxes)
    where bottom_fluxes is a dict of prorca/prcaca/silpro/produs
    [kmol m-2/timestep] (zeroed if redistributed by sedbypass).

    extra: tuple of (tracer_idx, speed_class, flux_name, redist_idx)
    for additional sinkers riding the same speed fields — the carbon
    isotopes det13/det14 (poc speed) and calc13/calc14 (cal speed)
    (mo_vertical_fluxes.F90:208-217).  Under sedbypass the bottom flux
    is returned to the water column at redist_idx (:496-526 — organic
    isotopes stay detritus, shell isotopes remineralize to DIC
    isotopes; the reference's flor14 line reads pror13, an apparent
    typo fixed here)."""
    cls = jnp.array(
        list(range(len(SINKERS))) + [SPEED_CLASS[e[1]] for e in extra])
    idxs = tuple(SINKERS) + tuple(e[0] for e in extra)
    w = sink_speeds(ptiestu, dtb, p)[cls]         # (N, K, J, I)
    conc = oc[jnp.array(idxs)]                    # (N, K, J, I)
    thick = dz > p.dp_min_sink                    # (K, J, I)
    wet = dz > p.dp_min

    # surface layer: no inflow; WLIN outflow speed clamps to wmin
    # (mo_vertical_fluxes.F90:146-159) — applies to every poc-class row
    if p.use_wlin:
        poc_rows = (cls == SPEED_CLASS['poc'])
        w = w.at[:, 0].set(jnp.where(poc_rows[:, None, None],
                                     p.wmin * dtb, w[:, 0]))

    def ksum(a):
        # fixed-order (ascending-k chained) column sum: jnp.sum's
        # association order is a compiler choice that varies with the
        # block shape, which breaks the bitwise mesh-factorization
        # invariance of the sharded step (parallel/repsum.py rationale)
        col = a[:, 0]
        for k in range(1, a.shape[1]):
            col = col + a[:, k]
        return col

    tco = ksum(jnp.where(wet[None], conc * dz[None], 0.))

    def body(carry, args):
        dconc, dw = carry                         # donor conc/speed (4,J,I)
        ck, dzk, wk, thickk, wetk = args
        dzs = jnp.maximum(dzk, 1.e-12)
        # fma-contraction pin: XLA:CPU's contraction choice for this
        # product-into-sum varies with the shard_map block shape,
        # breaking bitwise mesh-factorization invariance of the BGC
        # tracers (ops/reduce.py rationale)
        _cz, _dd = jax.lax.optimization_barrier((ck * dzk, dconc * dw))
        new_thick = (_cz + _dd) / (dzs + wk)
        new = jnp.where(thickk[None], new_thick,
                        jnp.where(wetk[None], dconc, ck))
        dconc2 = jnp.where(thickk[None], new, dconc)
        dw2 = jnp.where(thickk[None], wk, dw)
        return (dconc2, dw2), new

    zero = jnp.zeros_like(conc[:, 0])
    (dconc, dw), new_conc = lax.scan(
        body, (zero, zero), (conc.swapaxes(0, 1), dz, w.swapaxes(0, 1),
                             thick, wet))
    new_conc = new_conc.swapaxes(0, 1)            # (4, K, J, I)

    bot = dconc * dw                              # bottom flux per tracer
    tcn = ksum(jnp.where(wet[None], new_conc * dz[None], 0.)) + bot
    q = jnp.where((tco > 1.e-12) & (tcn > 1.e-12), tco / tcn, 1.)
    new_conc = jnp.where(wet[None], new_conc * q[:, None], new_conc)
    bot = bot * q

    bot = bot * omask[None]
    prorca, prcaca, silpro, produs = bot[:4]
    xbot = {e[2]: bot[4 + i] for i, e in enumerate(extra)}

    for i, idx in enumerate(idxs):
        oc = oc.at[idx].set(jnp.where(omask > 0.5, new_conc[i], oc[idx]))

    if p.sedbypass:
        # redistribute bottom fluxes over the column; opal and CaCO3
        # remineralize instantaneously (mo_vertical_fluxes.F90:472-534)
        colz = jnp.maximum(ksum2(jnp.where(wet, dz, 0.), axis=0),
                           1.e-12)
        florca = jnp.where(wet, (prorca / colz)[None], 0.)
        flcaca = jnp.where(wet, (prcaca / colz)[None], 0.)
        flsil = jnp.where(wet, (silpro / colz)[None], 0.)
        oc = oc.at[T.det].add(florca)
        oc = oc.at[T.alkali].add(2. * flcaca)
        oc = oc.at[T.sco212].add(flcaca)
        oc = oc.at[T.silica].add(flsil)
        z = jnp.zeros_like(prorca)
        for i, e in enumerate(extra):
            oc = oc.at[e[3]].add(jnp.where(wet, (bot[4 + i] / colz)[None],
                                           0.))
            xbot[e[2]] = z
        flx = {'prorca': z, 'prcaca': z, 'silpro': z, 'produs': produs,
               'carflx_bot': prorca * p.rcar, 'calflx_bot': prcaca,
               'bsiflx_bot': silpro}
    else:
        flx = {'prorca': prorca, 'prcaca': prcaca, 'silpro': silpro,
               'produs': produs, 'carflx_bot': prorca * p.rcar,
               'calflx_bot': prcaca, 'bsiflx_bot': silpro}
    flx.update(xbot)
    return oc, flx
