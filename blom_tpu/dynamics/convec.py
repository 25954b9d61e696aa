"""Convective adjustment (isopycnic bulk-mixed-layer regime).

TPU-native re-design of the reference convective adjustment
(reference: /root/reference/phy/mod_convec.F90:43-449 convec): remove
static instabilities between the lower mixed layer (layer 2) and the
interior isopycnic layers by mixing the mixed layer downward while the
in-situ density jump across the mixed-layer base is unstable, then
re-assigning the first physical layer index kfpla so the mixed water
sits in its density class.

The reference's outer loop body executes exactly once (done is set
.true. at the top and never reset, :193-203); per-column while-loops
become k-scans with masks.  The kfplo history merge (:108-186) and the
momentum redistribution (:305-449) are implemented; parity against the
loop-level transcription is tests/test_convec_oracle.py."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.reduce import ksum
from jax import lax

from ..core import eos
from ..core.constants import epsilp
from ..core.grid import Grid
from ..core.state import State

# The reference's converge loop body runs exactly once (done is set
# .true. at the top and never reset, mod_convec.F90:193-203)
N_PASSES = 1


def _collapse_thin(delp, kidx):
    """Collapse the leading run of thin interior layers (k >= 2, 0-based)
    into the first thick one (mod_convec.F90:91-106).  Returns
    (delp_new, kfpl) with kfpl 0-based."""
    kk = delp.shape[0]

    def scan(carry, xs):
        dps, kf, found = carry
        dp_k, k_i = xs
        interior = k_i >= 2
        thin = (dp_k < epsilp) & interior
        take = (~found) & thin
        dps2 = dps + jnp.where(take, dp_k, 0.)
        add_here = (~found) & (~thin) & interior
        dp_out = jnp.where(take, 0., dp_k) + jnp.where(add_here, dps2, 0.)
        dps3 = jnp.where(add_here, 0., dps2)
        found2 = found | add_here
        kf2 = jnp.where(add_here & (kf < 0), k_i, kf)
        return (dps3, kf2, found2), dp_out

    H = delp.shape[1:]
    init = (jnp.zeros(H, delp.dtype), jnp.full(H, -1, jnp.int32),
            jnp.zeros(H, bool))
    (dps, kf, found), delp_new = lax.scan(
        scan, init, (delp, jnp.arange(kk, dtype=jnp.int32)))
    # leftover (everything thin): add to layer 1 (0-based) as in the
    # reference's k > kk branch
    delp_new = delp_new.at[1].add(jnp.where(found, 0., dps))
    kfpl = jnp.where(found, kf, kk)
    return delp_new, kfpl


def convec(grid: Grid, e: eos.EosParams, s: State, m: int, n: int) -> State:
    kk = grid.kk
    ip = grid.ip
    kidx = jnp.arange(kk, dtype=jnp.int32).reshape(
        (kk,) + (1,) * len(grid.shape))

    ttem = s.temp[n]
    ssal = s.saln[n]
    delp = s.dp[n]
    densr = s.sigmar
    ntr = s.trc.shape[1]
    ttrc = s.trc[n]

    delp, kfpl = _collapse_thin(delp, kidx)

    # ---- kfplo history merge (mod_convec.F90:108-186): when the first
    # physical layer moved up since last step, merge the layers between
    # and re-place the merged water in its density class.
    kfplo = s.kfpla[n].astype(kfpl.dtype)
    hist = kfpl < kfplo

    def _merge(rng):
        dps = ksum(jnp.where(rng, delp, 0.), axis=0)
        q = 1. / jnp.maximum(dps, epsilp)
        ttmp = ksum(jnp.where(rng, ttem * delp, 0.), axis=0) * q
        stmp = ksum(jnp.where(rng, ssal * delp, 0.), axis=0) * q
        trmix = (ksum(jnp.where(rng[None], ttrc * delp[None], 0.),
                      axis=1) * q[None]) if ntr else None
        return dps, ttmp, stmp, trmix

    # case A: kfplo within the column (:110-148)
    rngA = (kidx >= kfpl) & (kidx <= kfplo)
    dpsA, ttA, ssA, trA = _merge(rngA)
    dtA = eos.sig(e, ttA, ssA)
    densr_o = jnp.sum(jnp.where(kidx == kfplo, densr, 0.), axis=0)
    applyA = hist & (kfplo <= kk - 1) & (dtA > densr_o)
    zeroA = rngA & (kidx < kfplo)
    atA = kidx == kfplo

    # case B: no previous physical layer (:149-185): merge to the
    # bottom and find the fitting density class
    rngB = (kidx >= kfpl) & (kidx <= kk - 1)
    dpsB, ttB, ssB, trB = _merge(rngB)
    dtB = eos.sig(e, ttB, ssB)
    fits = (dtB[None] >= densr) & (kidx >= 2)
    kfplB = jnp.maximum(2, jnp.max(jnp.where(fits, kidx, 2), axis=0))
    applyB = hist & (kfplo > kk - 1)
    zeroB = rngB
    atB = kidx == kfplB

    def _apply(a, merged_val, applyX, zeroX, atX):
        a2 = jnp.where(applyX[None] & zeroX, 0. * a, a)
        return jnp.where(applyX[None] & atX, merged_val[None], a2)

    for applyX, zeroX, atX, dpsX, ttX, ssX, dtX, trX, kfX in (
            (applyA, zeroA, atA, dpsA, ttA, ssA, dtA, trA, kfplo),
            (applyB, zeroB, atB, dpsB, ttB, ssB, dtB, trB, kfplB)):
        delp = jnp.where(applyX[None] & zeroX, 0., delp)
        delp = jnp.where(applyX[None] & atX, dpsX[None], delp)
        ttem = jnp.where(applyX[None] & atX, ttX[None], ttem)
        ssal = jnp.where(applyX[None] & atX, ssX[None], ssal)
        if ntr:
            ttrc = jnp.where((applyX[None] & atX)[None],
                             trX[:, None], ttrc)
        kfpl = jnp.where(applyX, kfX, kfpl)

    for _ in range(N_PASSES):
        # ---- mixing extent scan (mod_convec.F90:207-246): accumulate
        # layers downward from kfpl while the density jump at the current
        # accumulated mass is unstable.
        T2, S2 = ttem[1], ssal[1]
        acc0 = (T2 * delp[1], S2 * delp[1], delp[1], T2, S2,
                jnp.ones(grid.shape, bool))

        def mix_scan(carry, xs):
            tdps, sdps, dps, tmix, smix, mixing = carry
            t_k, s_k, dp_k, k_i = xs
            at_depth = k_i >= kfpl
            unstable = (eos.rho(dps, tmix, smix)
                        > eos.rho(dps, t_k, s_k)) | (dp_k < epsilp)
            absorb = mixing & at_depth & unstable
            tdps2 = tdps + jnp.where(absorb, t_k * dp_k, 0.)
            sdps2 = sdps + jnp.where(absorb, s_k * dp_k, 0.)
            dps2 = dps + jnp.where(absorb, dp_k, 0.)
            q = 1.0 / jnp.maximum(dps2, epsilp)
            tmix2 = jnp.where(absorb, tdps2 * q, tmix)
            smix2 = jnp.where(absorb, sdps2 * q, smix)
            mixing2 = mixing & jnp.where(at_depth, absorb, True)
            return (tdps2, sdps2, dps2, tmix2, smix2, mixing2), absorb

        (tdps, sdps, dps, tmix, smix, _), absorbed = lax.scan(
            mix_scan, acc0, (ttem, ssal, delp, kidx))

        any_mix = jnp.any(absorbed, axis=0)
        kmix = jnp.max(jnp.where(absorbed, kidx, -1), axis=0)

        dens_mix = eos.sig(e, tmix, smix)

        # new kfpl: smallest k in [2, kmix] with dens_mix >= densr(k),
        # scanned downward from kmix (mod_convec.F90:252-262: step up
        # while dens(2) < densr(k))
        ok_class = (dens_mix[None] >= densr) & (kidx >= 2) & (kidx <= kmix)
        # kfpl_new = last k with densr <= dens_mix (deepest fitting), or 2
        kfpl_new = jnp.maximum(jnp.max(jnp.where(ok_class, kidx, 2 - 1),
                                       axis=0), 2).astype(jnp.int32)
        kfpl_new = jnp.minimum(kfpl_new,
                               jnp.maximum(kmix, 2)).astype(jnp.int32)

        # mass absorbed from the interior
        dps_int = ksum(jnp.where(absorbed & (kidx >= 2), delp, 0.),
                       axis=0)

        # apply updates where mixing happened
        upd = any_mix & (kmix >= kfpl)
        T2n = jnp.where(upd, tmix, T2)
        S2n = jnp.where(upd, smix, S2)

        zero_zone = absorbed & (kidx >= 2)
        at_kfpl = kidx == kfpl_new[None]
        between = (kidx > kfpl_new[None]) & (kidx <= kmix[None])

        if ntr:
            # mixed tracer value over ML + absorbed layers (pre-update dp)
            trmix = (ksum(jnp.where(zero_zone[None],
                                    ttrc * delp[None], 0.), axis=1)
                     + ttrc[:, 1] * delp[1][None]) \
                / jnp.maximum(dps, epsilp)[None]
            place = (at_kfpl | between)[None] & upd[None, None]
            ttrc = jnp.where(place, trmix[:, None], ttrc)
            ttrc = ttrc.at[:, 1].set(
                jnp.where(upd[None], trmix, ttrc[:, 1]))

        delp = jnp.where(upd[None] & zero_zone, 0., delp)
        delp = jnp.where(upd[None] & at_kfpl, dps_int[None], delp)
        ttem = jnp.where(upd[None] & (at_kfpl | between), T2n[None], ttem)
        # layers between kfpl and kmix take their reference density class
        # (mod_convec.F90:264-268): T from the ML, S from sofsig
        ssal_b = eos.sofsig(e, densr, T2n[None])
        ssal = jnp.where(upd[None] & at_kfpl, S2n[None],
                         jnp.where(upd[None] & between, ssal_b, ssal))
        ttem = ttem.at[1].set(T2n)
        ssal = ssal.at[1].set(S2n)
        kfpl = jnp.where(upd, kfpl_new, kfpl)

    sigma_new = eos.sig(e, ttem, ssal) * ip

    s = dataclasses.replace(
        s,
        temp=s.temp.at[n].set(ttem * ip),
        saln=s.saln.at[n].set(ssal * ip),
        dp=s.dp.at[n].set(delp * ip),
        sigma=s.sigma.at[n].set(sigma_new),
        kfpla=s.kfpla.at[n].set(kfpl))
    if ntr:
        s = dataclasses.replace(s, trc=s.trc.at[n].set(ttrc))

    # ---- momentum redistribution (mod_convec.F90:305-449): remap u/v
    # conservatively from the old velocity-point pressure grid onto the
    # one implied by the convected thicknesses; empty new layers get 0.
    from ..core.state import cumulative_p
    from ..ops import hor3map as h3

    p_new = cumulative_p(s.dp[n]) * ip
    im1, jm1 = grid.im1, grid.jm1

    def remap_vel(vel, p_old_uv, mask, nbr):
        pb_uv = p_old_uv[kk]
        pn = .5 * (jnp.minimum(pb_uv[None], p_new)
                   + jnp.minimum(pb_uv[None], nbr(p_new)))
        rc = h3.Recon(p=p_old_uv, c0=vel, c1=jnp.zeros_like(vel),
                      c2=jnp.zeros_like(vel))
        means = h3.remap_means(rc, pn)
        dpn = pn[1:] - pn[:-1]
        return jnp.where(dpn > 0., means, 0.) * mask

    u_new = remap_vel(s.u[n], s.pu, grid.iu, im1)
    v_new = remap_vel(s.v[n], s.pv, grid.iv, jm1)
    return dataclasses.replace(
        s, u=s.u.at[n].set(u_new), v=s.v.at[n].set(v_new))
