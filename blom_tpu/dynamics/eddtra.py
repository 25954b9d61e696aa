"""Eddy-induced (bolus) transport: Gent-McWilliams for the ALE path.

TPU-native re-design of the reference eddy-transport module
(reference: /root/reference/phy/mod_eddtra.F90 eddtra_ale :1001-1800):
the GM interface streamfunction is  -kappa * neutral_slope, converted to
a mass flux with -g*rho0*delt1*dy, ramped linearly to zero through the
mixed layer, and limited so no grid cell is depleted by more than
ffac = 1/16 of its mass per step.

The reference's limiter is a converge-until-done alternating up/down
sweep (:1312-1412 with a 1000-iteration abort); here a fixed number of
alternating sweeps (lax.fori_loop over a k-scan) applies the same
clipping — the reference's loop converges in a few sweeps for any state
the model can reach, and each sweep is monotone (never un-clips).
Submesoscale restratification (mlrmth fox08/bod23) is a later round
(the shipped decks use MLRMTH='none')."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from ..core.constants import grav, rho0, onem, epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from .cmnfld import CmnFields
from .diffusion_fields import DiffusionFields

ffac = .0625          # max fraction of cell mass depleted (:1011)
fface = .99 * ffac
N_SWEEPS_MAX = 64


def _limit_mfl(mfl, avail_w, avail_c, area_w, area_c):
    """Alternating up/down flux-limiting sweeps (mod_eddtra.F90:1312-1412).

    mfl: (kk+1, H) interface mass fluxes; avail_w/avail_c: (kk, H)
    depletable thickness of the west/center cell; area_*: (H)."""
    kk = mfl.shape[0] - 1

    def limit_layer(mfl, k):
        mk = mfl[k]
        mk1 = mfl[k + 1]
        d = mk1 - mk
        lim_w = ffac * jnp.maximum(epsilp, avail_w[k]) * area_w
        lim_c = ffac * jnp.maximum(epsilp, avail_c[k]) * area_c
        q_w = fface * avail_w[k] * area_w
        q_c = fface * avail_c[k] * area_c

        # depleting west cell too much (d > lim_w): clip dominating flux
        big = mk1 > -mk
        mk1_a = jnp.where(mk > -.5 * q_w, mk + q_w, .5 * q_w)
        mk_a = jnp.where(mk > -.5 * q_w, mk, -mk1_a)
        mk_b = jnp.where(mk1 < .5 * q_w, mk1 - q_w, -.5 * q_w)
        mk1_b = jnp.where(mk1 < .5 * q_w, mk1, -mk_b)
        mk_w = jnp.where(big, mk_a, mk_b)
        mk1_w = jnp.where(big, mk1_a, mk1_b)

        # depleting center cell too much (d < -lim_c)
        bigc = mk1 < -mk
        mk1_c = jnp.where(mk < .5 * q_c, mk - q_c, -.5 * q_c)
        mk_c = jnp.where(mk < .5 * q_c, mk, -mk1_c)
        mk_d = jnp.where(mk1 > -.5 * q_c, mk1 + q_c, .5 * q_c)
        mk1_d = jnp.where(mk1 > -.5 * q_c, mk1, -mk_d)
        mk_cc = jnp.where(bigc, mk_c, mk_d)
        mk1_cc = jnp.where(bigc, mk1_c, mk1_d)

        over_w = d > lim_w
        over_c = d < -lim_c
        mk_new = jnp.where(over_w, mk_w, jnp.where(over_c, mk_cc, mk))
        mk1_new = jnp.where(over_w, mk1_w, jnp.where(over_c, mk1_cc, mk1))
        mfl = mfl.at[k].set(mk_new).at[k + 1].set(mk1_new)
        return mfl, jnp.any(over_w | over_c)

    # converge-until-done alternating sweeps, FIRST pass descending
    # (the reference flips kdir before the first pass, :1315-1341, so
    # pass 1 runs k = kmax..1); bounded at 64 sweeps (the reference
    # aborts at 1000 — production states converge in a handful).
    def sweep_cond(carry):
        _, it, ch = carry
        return ch & (it < N_SWEEPS_MAX)

    def sweep(carry):
        mfl, it, _ = carry
        desc = it % 2 == 0

        def body(k, st):
            mfl, ch = st
            kf = jnp.where(desc, kk - 1 - k, k)
            mfl, c = limit_layer(mfl, kf)
            return mfl, ch | c

        mfl, ch = lax.fori_loop(0, kk, body, (mfl, jnp.asarray(False)))
        return mfl, it + 1, ch

    mfl, _, _ = lax.while_loop(
        sweep_cond, sweep, (mfl, 0, jnp.asarray(True)))
    # pin the boundary interfaces
    mfl = mfl.at[0].set(0.0)
    return mfl


def eddtra(grid: Grid, s: State, cf: CmnFields, dfl: DiffusionFields,
           m: int, n: int, delt1) -> DiffusionFields:
    """GM eddy-induced mass fluxes umfltd/vmfltd at mid level m
    (eddtra_ale, mod_eddtra.F90:1001-1800)."""
    kk = grid.kk
    iu, iv, ip = grid.iu, grid.iv, grid.ip
    im1, jm1 = grid.im1, grid.jm1

    p = cumulative_p(s.dp[n]) * ip
    mld_p = cf.mld * onem    # [Pa]

    kidx1 = jnp.arange(1, kk + 2).reshape((kk + 1,) + (1,) * (p.ndim - 1))

    def direction(mask, nbr, slp, dpuv, pbuv, scuv, area_nbr):
        # interface streamfunction below the mixed layer
        kappa = .5 * (nbr(dfl.difint) + dfl.difint)   # (kk, H) layers
        kappa_i = jnp.concatenate(
            [kappa[:1], .5 * (kappa[:-1] + kappa[1:]), kappa[-1:]], axis=0)
        et2mf = -grav * rho0 * delt1 * scuv
        mfl_gm = -kappa_i * slp * et2mf * mask        # (kk+1, H)

        # kmax: deepest layer with mass at either adjacent scalar point
        # (mod_eddtra.F90:1230-1236); interfaces beyond kmax carry no
        # flux and are excluded from the limiter, matching the
        # reference's k = 1..kmax loop bounds.
        pair_wet = (nbr(s.dp[n]) > epsilp) | (s.dp[n] > epsilp)
        kmax = jnp.max(jnp.where(pair_wet, kidx1[:-1], 1), axis=0)  # (H)
        act = kidx1 <= kmax[None]                     # interfaces 1..kmax
        mfl_gm = mfl_gm * act

        # mixed-layer linear ramp (mod_eddtra.F90:1266-1275)
        puv = cumulative_p(dpuv)
        pml = jnp.minimum(puv[0]
                          + .5 * (nbr(mld_p) + mld_p), puv[kk])
        below = (puv > pml) & act
        # value at the ML base: first interface below pml
        first_below = jnp.cumsum(below.astype(jnp.int32), axis=0) == 1
        mfl_base = jnp.sum(jnp.where(first_below, mfl_gm, 0.), axis=0)
        frac = (puv - puv[0]) / jnp.maximum(pml - puv[0], epsilp)
        mfl = jnp.where(below, mfl_gm, mfl_base[None] * jnp.clip(frac, 0., 1.))
        mfl = jnp.where(act, mfl, 0.)
        mfl = mfl.at[0].set(0.).at[kk].set(0.)

        # depletable thicknesses (mod_eddtra.F90:1300-1308)
        avail_n = jnp.maximum(
            0., jnp.minimum(nbr(p[1:]), pbuv) - nbr(p[:-1]))
        avail_c = jnp.maximum(0., jnp.minimum(p[1:], pbuv) - p[:-1])

        mfl = _limit_mfl(mfl * mask, avail_n, avail_c,
                         area_nbr, grid.scp2)
        # layer mass flux = streamfunction difference (:1438-1449)
        return (mfl[1:] - mfl[:-1]) * mask

    umfltd = direction(iu, im1, cf.nslpx, s.dpu[n], s.pbu[n],
                       grid.scuy, im1(grid.scp2))
    vmfltd = direction(iv, jm1, cf.nslpy, s.dpv[n], s.pbv[n],
                       grid.scvx, jm1(grid.scp2))

    return dataclasses.replace(
        dfl,
        umfltd=dfl.umfltd.at[m].set(umfltd),
        vmfltd=dfl.vmfltd.at[m].set(vmfltd))


def eddtra_isopyc(grid: Grid, s: State, dfl: DiffusionFields,
                  m: int, n: int, delt1) -> DiffusionFields:
    """GM eddy-induced mass fluxes for the isopycnic regime
    (eddtra_gm_isopyc_bulkml, mod_eddtra.F90:228-1000).

    In the isopycnic framework the layer interfaces ARE the neutral
    surfaces, so the GM interface streamfunction is kappa times the
    interface pressure slope, Upsilon_k = -kappa * d p_k / dx
    (in pressure units; the reference's upsilon, :382-420), active on
    interior interfaces (k >= kfpla, the first physical interior
    layer) and ramped linearly to zero through the bulk mixed layer
    (layers 1-2).  The dense re-design evaluates every interface and
    masks the reference's per-column case logic: columns where the
    mixed layer reaches the bottom on both sides (kfpla > kk at both
    scalar points, Case 1, :315-321) get zero flux; the hydrostatic-
    selection subtleties of Cases 2/3 collapse to the interior-start
    mask max(kfpla(i-1), kfpla(i)).  The same ffac depletion limiter
    is applied (:560-760)."""
    kk = grid.kk
    iu, iv, ip = grid.iu, grid.iv, grid.ip
    im1, jm1 = grid.im1, grid.jm1

    p = cumulative_p(s.dp[n]) * ip
    kfpla = s.kfpla[n]

    def direction(mask, nbr, dpuv, pbuv, scuv, scuvxi, area_nbr):
        kappa = .5 * (nbr(dfl.difint) + dfl.difint)
        kappa_i = jnp.concatenate(
            [kappa[:1], .5 * (kappa[:-1] + kappa[1:]), kappa[-1:]],
            axis=0)
        # interface pressure slope at the velocity point [Pa / m]
        dpdx = (p - nbr(p)) * scuvxi[None]
        et2mf = -grav * rho0 * delt1 * scuv
        mfl_gm = -kappa_i * (-dpdx / (grav * rho0)) * et2mf * mask

        # interior gate: interfaces above the first physical interior
        # layer of BOTH adjacent columns are mixed-layer interfaces
        kintr = jnp.maximum(kfpla, nbr(kfpla))          # (H,)
        kidx = jnp.arange(kk + 1).reshape(
            (kk + 1,) + (1,) * (p.ndim - 1))
        interior = (kidx >= kintr[None]) & (kidx < kk)
        # Case 1: mixed layer to the bottom on both sides -> no flux
        active = (kintr <= kk)[None]

        # linear ramp through the mixed layer: value at the interior
        # start interface, scaled by p / p_intr (:430-470)
        first_int = (jnp.cumsum(interior.astype(jnp.int32), axis=0)
                     == 1) & interior
        mfl_base = jnp.sum(jnp.where(first_int, mfl_gm, 0.), axis=0)
        p_base = jnp.sum(jnp.where(first_int, p, 0.), axis=0)
        puv = cumulative_p(dpuv)
        frac = jnp.clip(puv / jnp.maximum(p_base[None], epsilp), 0., 1.)
        mfl = jnp.where(interior, mfl_gm, mfl_base[None] * frac)
        mfl = jnp.where(active, mfl, 0.)
        mfl = mfl.at[0].set(0.).at[kk].set(0.)

        avail_n = jnp.maximum(
            0., jnp.minimum(nbr(p[1:]), pbuv) - nbr(p[:-1]))
        avail_c = jnp.maximum(0., jnp.minimum(p[1:], pbuv) - p[:-1])
        mfl = _limit_mfl(mfl * mask, avail_n, avail_c,
                         area_nbr, grid.scp2)
        return (mfl[1:] - mfl[:-1]) * mask

    umfltd = direction(iu, im1, s.dpu[n], s.pbu[n], grid.scuy,
                       grid.scuxi, im1(grid.scp2))
    vmfltd = direction(iv, jm1, s.dpv[n], s.pbv[n], grid.scvx,
                       grid.scvyi, jm1(grid.scp2))

    return dataclasses.replace(
        dfl,
        umfltd=dfl.umfltd.at[m].set(umfltd),
        vmfltd=dfl.vmfltd.at[m].set(vmfltd))
