"""ALE vertical regridding and remapping.

TPU-native re-design of the reference ALE machinery
(reference: /root/reference/phy/mod_ale_regrid_remap.F90:1486-1984
ale_regrid_remap).  Per step, for the cntiso_hybrid vertical coordinate:

1. reconstruct T/S profiles (PPM, reconstruct_trc_jslice, :186-261);
2. regrid: nudge interface pressures toward the interface reference
   potential densities while keeping minimum near-surface thicknesses
   (regrid_cntiso_hybrid_nudge_jslice, :560-916);
3. laterally smooth weakly-stratified interfaces
   (regrid_smooth_jslice, :946-1020);
4. remap tracers onto the new grid (remap_trc_jslice, :1022-1057);
5. recompute dpu/dpv and remap velocities (:1760-1960).

All column loops are dense over (k, j, i).  Both REGRID_METHOD options
are implemented: 'nudge' (regrid_cntiso_hybrid_nudge_jslice, :560-916)
and 'direct' (regrid_cntiso_hybrid_direct_jslice, :286-560, via the
hor3map root-finding regrid).  Remaining simplifications, to be
tightened later: the reference's quadratic-Bezier transition-zone
adjustment of target densities (:670-740) and the dpvar_fac local
thickness-variation limiter (:845-912) are replaced by the monotonic
minimum-thickness clamp; the plevel vertical coordinate is pending.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..core import eos
from ..core.constants import epsilp, grav, onem
from ..core.grid import Grid
from ..core.state import State, cumulative_p, dpu_dpv_upstream
from ..ops import hor3map as h3


class AleParams(NamedTuple):
    plevel: tuple            # (kk,) minimum interface depths [Pa]
    dpmin_interior: float    # [Pa]
    regrid_nudge_ts: float   # [s]
    stab_fac_limit: float
    smooth_diff_max: float   # [m2 s-1]
    k_range_plevel: int
    tracer_limiting: str = h3.NON_OSCILLATORY
    velocity_limiting: str = h3.NON_OSCILLATORY
    tracer_pc_upper: bool = True
    velocity_pc_upper: bool = True
    # 'ppm' (explicit edges) | 'ppm_ih4' (implicit 4th-order edges) |
    # 'pqm' (implicit 6th/5th-order quartic) — the RECONSTRUCTION_METHOD
    # + bndr_ord namelist options (mod_ale_regrid_remap.F90:62-81)
    reconstruction_method: str = 'ppm'
    upper_bndr_ord: int = 6
    lower_bndr_ord: int = 4
    # 'nudge' | 'direct' (REGRID_METHOD, mod_ale_regrid_remap.F90:68)
    regrid_method: str = 'nudge'
    bfsq_min: float = 1.e-7   # monotonization slope floor [s-2]


def make_ale_params(kk: int, dpmin_surface_m: float = 1.5,
                    dpmin_inflation: float = 1.0,
                    dpmin_interior_m: float = .1,
                    regrid_nudge_ts: float = 86400.,
                    stab_fac_limit: float = .75,
                    smooth_diff_max: float = 50000.,
                    k_range_plevel: int = 4,
                    reconstruction_method: str = 'ppm') -> AleParams:
    """Defaults matching the fuk95 deck (tests/fuk95/limits:231-249) and
    vcoord defaults (mod_vcoord.F90:87-88, plevel 'inflation' spec
    :948-955: plevel(1)=0, plevel(k+1)=plevel(k)+dpmin, dpmin*=factor)."""
    plevel = [0.0]
    dpmin = dpmin_surface_m * onem
    for _ in range(kk - 1):
        plevel.append(plevel[-1] + dpmin)
        dpmin *= dpmin_inflation
    return AleParams(plevel=tuple(plevel),
                     dpmin_interior=dpmin_interior_m * onem,
                     regrid_nudge_ts=regrid_nudge_ts,
                     stab_fac_limit=stab_fac_limit,
                     smooth_diff_max=smooth_diff_max,
                     k_range_plevel=k_range_plevel,
                     reconstruction_method=reconstruction_method)


def _ale_pallas_ok(ale: AleParams, p_src) -> bool:
    """Use the fused Pallas ALE kernels?  TPU + f32 + PPM explicit
    edges + nudge regrid (the production configuration);
    BLOM_TPU_PALLAS=0 disables."""
    import os

    import jax as _jax
    if os.environ.get('BLOM_TPU_PALLAS', '1') == '0':
        return False
    if ale.reconstruction_method != 'ppm' \
            or ale.regrid_method != 'nudge':
        return False
    if p_src.dtype != jnp.float32 or p_src.ndim != 3:
        return False
    try:
        return _jax.default_backend() == 'tpu'
    except Exception:
        return False


def _recon(ale: AleParams, p, tm, limiting, pc_upper=False,
           pc_lower=False):
    """Reconstruction dispatch (RECONSTRUCTION_METHOD,
    mod_ale_regrid_remap.F90:62-81): explicit-edge PPM, implicit-edge
    ih4 PPM, or PQM with ih6/ih5 implicit edges+slopes."""
    m = ale.reconstruction_method
    if m == 'pqm':
        return h3.pqm_reconstruct(p, tm, limiting, pc_upper, pc_lower,
                                  lb_ord=ale.upper_bndr_ord,
                                  rb_ord=ale.lower_bndr_ord)
    if m == 'ppm_ih4':
        return h3.ppm_ih4_reconstruct(p, tm, limiting, pc_upper,
                                      pc_lower,
                                      lb_ord=min(ale.upper_bndr_ord, 4),
                                      rb_ord=min(ale.lower_bndr_ord, 4))
    return h3.ppm_reconstruct(p, tm, limiting, pc_upper, pc_lower)


def _recon_multi(ale: AleParams, p, tms, limiting, pc_upper=False,
                 pc_lower=False):
    """Reconstruct several fields on a shared source grid; for the PPM
    method the grid-only edge weights are computed once
    (h3.ppm_reconstruct_multi)."""
    if ale.reconstruction_method == 'ppm':
        return h3.ppm_reconstruct_multi(p, tms, limiting, pc_upper,
                                        pc_lower)
    return [_recon(ale, p, tm, limiting, pc_upper, pc_lower)
            for tm in tms]


def _sigma_at(p_src, sig_up, sig_lo, pq):
    """Linear-in-layer interface density at pressure pq (scan over
    source layers; regrid nudge's sig_pmin interpolation,
    mod_ale_regrid_remap.F90:643-651)."""
    dp = p_src[1:] - p_src[:-1]
    dpi = 1.0 / jnp.maximum(dp, epsilp)

    def body(carry, xs):
        got, found = carry
        p_up, dp_k, dpi_k, su, sl = xs
        inl = (pq >= p_up[None]) & (pq < (p_up + dp_k)[None]) & (~found)
        w = jnp.clip((pq - p_up[None]) * dpi_k[None], 0., 1.)
        got = jnp.where(inl, (1. - w) * su[None] + w * sl[None], got)
        return (got, found | inl), None

    init = (jnp.zeros(pq.shape, pq.dtype), jnp.zeros(pq.shape, bool))
    got, found = h3.kscan(body, init,
                          (p_src[:-1], dp, dpi, sig_up, sig_lo))
    # below the column: use the deepest lower-interface value
    # (static index: a[-1] lowers to dynamic_slice, which Mosaic
    # rejects inside Pallas kernels)
    import jax as _jax
    bottom = _jax.lax.index_in_dim(sig_lo, sig_lo.shape[0] - 1, 0,
                                   keepdims=False)
    return jnp.where(found, got, bottom)


def regrid_nudge(grid, e: eos.EosParams, ale: AleParams,
                 p_src, rc_t: h3.Recon, rc_s: h3.Recon, sigmar,
                 delt1, plevel_arr=None, clamp_impl='scan'):
    """Nudge interface pressures toward interface target densities
    (regrid_cntiso_hybrid_nudge_jslice, mod_ale_regrid_remap.F90:560-916).

    `grid` may be a Grid or a bare layer count (the column-local core
    runs unchanged inside the Pallas regrid kernel, ale_pallas.py).
    Returns (p_dst, smooth_fac), both (kk+1, H)."""
    kk = grid if isinstance(grid, int) else grid.kk
    H = p_src.shape[1:]
    p_bot = p_src[kk]

    t_up, t_lo = rc_t.eval0(), rc_t.eval1()
    s_up, s_lo = rc_s.eval0(), rc_s.eval1()
    sig_up = eos.sig(e, t_up, s_up)      # (kk, H)
    sig_lo = eos.sig(e, t_lo, s_lo)

    dp_src = p_src[1:] - p_src[:-1]
    wet_layer = dp_src > epsilp
    sig_max = jnp.max(jnp.where(wet_layer, sig_lo, -jnp.inf), axis=0)
    sig_max = jnp.where(jnp.isfinite(sig_max), sig_max, 0.)

    sig_trg = sigmar                                    # (kk, H)
    dsig_trg = jnp.concatenate(
        [sig_trg[1:] - sig_trg[:-1], sig_trg[-1:] - sig_trg[-2:-1]], axis=0)
    dsig_trg = jnp.maximum(dsig_trg, 1e-12)

    kidx = h3._kidx(kk, 1 + len(H))

    # kdmx: deepest interface index whose target density is lighter than
    # the densest reconstructed water (0-based layer index semantics:
    # interfaces k = 1..kk use sig_trg[k-1] as their target in the
    # 1-based reference; here target of interface k is sigmar[k-1]).
    # reference kdmx (1-based): largest k with sig_trg(k) < sig_max.
    kdmx = jnp.maximum(1, jnp.sum((sig_trg < sig_max).astype(jnp.int32),
                                  axis=0))              # (H) 1-based

    # plevel_arr: the Pallas kernel passes the minimum-depth table as a
    # kernel input (captured constant arrays are rejected there)
    plevel = (jnp.asarray(ale.plevel, p_src.dtype)
              if plevel_arr is None else plevel_arr.astype(p_src.dtype))
    pmin = jnp.minimum(plevel.reshape((kk,) + (1,) * len(H)) + p_src[0],
                       p_bot)                           # (kk, H), 1-based k

    nudge_fac = delt1 / ale.regrid_nudge_ts

    # interface density at minimum pressures
    sig_pmin = _sigma_at(p_src, sig_up, sig_lo, pmin)   # (kk, H)

    # transition interface kt (1-based): first k > k_range_plevel with
    # sig_trg(k) > sig_pmin(k), limited to <= kdmx
    kb = ale.k_range_plevel
    cond = (kidx + 1 > kb) & (kidx + 1 <= kdmx) & (sig_trg > sig_pmin)
    any_cond = jnp.any(cond, axis=0)
    # f32 argmax: Mosaic's in-kernel argmax supports float32 only;
    # argmax of the 0/1 floats picks the same (first-True) index
    kt = jnp.where(any_cond,
                   jnp.argmax(cond.astype(jnp.float32), axis=0) + 1,
                   kdmx + 1)

    # --- candidate positions for interfaces k = 2..kk (1-based).
    # pressure-regime candidate: nudge toward pmin
    p_int = p_src[1:-1]                                 # interfaces 2..kk
    pmin_int = pmin[1:]                                 # pmin(k), k=2..kk
    cand_press = p_int + nudge_fac * (pmin_int - p_int)

    # isopycnal-regime candidate (cases A/B/C of the reference)
    su = sig_lo[:-1]          # lower-interface density of layer k-1
    sl = sig_up[1:]           # upper-interface density of layer k
    # target density of interface k (1-based k = 2..kk) is sigmar(k),
    # i.e. sigmar[1:] 0-based (mod_ale_regrid_remap.F90:612-616)
    st = sig_trg[1:]

    dsdx_up = (eos.dsigdt(e, t_lo, s_lo) * rc_t.deval1()
               + eos.dsigds(e, t_lo, s_lo) * rc_s.deval1())[:-1]
    dsdx_lo = (eos.dsigdt(e, t_up, s_up) * rc_t.deval0()
               + eos.dsigds(e, t_up, s_up) * rc_s.deval0())[1:]

    dst_km1 = dsig_trg[:-1]   # dsig_trg(k-1)
    dst_k = dsig_trg[1:]      # dsig_trg(k)

    dp_up = jnp.maximum(p_src[1:-1] - p_src[:-2], epsilp)
    dp_lo = jnp.maximum(p_src[2:] - p_src[1:-1], epsilp)

    lim = ale.stab_fac_limit

    def nudge_up(dsig, dsigdx_raw, dstv):
        stab = dsigdx_raw / dstv
        dsigdx = dstv * jnp.maximum(stab, lim)
        delta = jnp.maximum(-.5, dsig * nudge_fac / dsigdx) \
            * (p_src[1:-1] - p_src[:-2])
        return delta, stab

    def nudge_dn(dsig, dsigdx_raw, dstv):
        stab = dsigdx_raw / dstv
        dsigdx = dstv * jnp.maximum(stab, lim)
        delta = jnp.minimum(.5, dsig * nudge_fac / dsigdx) \
            * (p_src[2:] - p_src[1:-1])
        return delta, stab

    # case A: target lighter than both neighbors -> move interface up
    dA, stabA = nudge_up(st - su, dsdx_up, dst_km1)
    # case B: target denser than both -> move down
    dB, stabB = nudge_dn(st - sl, dsdx_lo, dst_k)
    # case C: between -> interpolated interface density decides direction
    sig_intrp = ((sl + .5 * dsdx_lo) * dp_up
                 + (su - .5 * dsdx_up) * dp_lo) / (dp_up + dp_lo)
    sig_intrp = jnp.clip(sig_intrp, jnp.minimum(su, sl), jnp.maximum(su, sl))
    dsigC = st - sig_intrp
    dCu, stabCu = nudge_up(dsigC, dsdx_up + 2. * (sig_intrp - su), dst_km1)
    dCd, stabCd = nudge_dn(dsigC, dsdx_lo + 2. * (sl - sig_intrp), dst_k)
    dC = jnp.where(dsigC < 0., dCu, dCd)
    stabC = jnp.where(dsigC < 0., stabCu, stabCd)

    caseA = (st < su) & (st < sl)
    caseB = (st > su) & (st > sl)
    delta = jnp.where(caseA, dA, jnp.where(caseB, dB, dC))
    stab = jnp.where(caseA, stabA, jnp.where(caseB, stabB, stabC))
    cand_iso = p_src[1:-1] + delta
    sf_iso = jnp.clip((lim - stab) / lim, 0., 1.)

    # select per interface: k (1-based) in [2, kt) -> pressure regime;
    # [kt, kdmx] -> isopycnal; (kdmx, kk] -> bottom
    kif = kidx[1:] + 1        # 1-based interface index, 2..kk
    press_reg = kif < kt
    iso_reg = (kif >= kt) & (kif <= kdmx)
    cand = jnp.where(press_reg, cand_press,
                     jnp.where(iso_reg, cand_iso, p_bot))
    sfac = jnp.where(press_reg, 1.0, jnp.where(iso_reg, sf_iso, 0.))

    # monotonic clamp with minimum interior thickness
    # (the reference's per-case clamp + dpmin enforcement)
    if clamp_impl == 'cummax':
        # scan-free equivalent for the Pallas kernel (Mosaic cannot
        # lower scans with stacked outputs): with the substitution
        # t_k = out_k - (k+1)*dpmin the recurrence
        #   out_k = min(max(max(c_k, pmn_k), out_{k-1}+dpmin), p_bot)
        # becomes a seeded running max under a k-DECREASING bound,
        # i.e. exactly  out_k = min(p_bot, cummax(a_k-(k+1)d) + (k+1)d)
        # (max is associative-exact; the +-(k+1)d detour costs ~1 ULP
        # vs the scan, which is why the jnp path keeps the scan)
        d = ale.dpmin_interior
        nmid = kk - 1                 # interior interfaces 2..kk
        # integer broadcasted_iota then cast (Mosaic: iota is
        # integer-only and arange().reshape() is an unsupported
        # lane->sublane shape cast)
        import jax as _jax
        kseq = (_jax.lax.broadcasted_iota(
            jnp.int32, (nmid,) + (1,) * len(H), 0) + 1
        ).astype(p_src.dtype)
        atil = jnp.maximum(cand, pmin[1:]) - kseq * d
        atil = jnp.maximum(atil, p_src[:1])       # seed: prev_0 = p_top
        run = atil
        shift = 1
        while shift < nmid:
            pad = jnp.full_like(run[:shift], -jnp.inf)
            run = jnp.maximum(run, jnp.concatenate(
                [pad, run[:-shift]], axis=0))
            shift *= 2
        p_mid = jnp.minimum(run + kseq * d, p_bot)
    else:
        def clamp_scan(prev, xs):
            c, pmn = xs
            out = jnp.minimum(jnp.maximum(jnp.maximum(c, pmn),
                                          prev + ale.dpmin_interior),
                              p_bot)
            return out, out

        _, p_mid = lax.scan(clamp_scan, p_src[0], (cand, pmin[1:]))
    p_dst = jnp.concatenate([p_src[:1], p_mid, p_bot[None]], axis=0)
    smooth_fac = jnp.concatenate(
        [jnp.ones_like(sfac[:1]), sfac, jnp.zeros_like(sfac[:1])], axis=0)
    return p_dst, smooth_fac


def regrid_direct(grid: Grid, e: eos.EosParams, ale: AleParams,
                  p_src, sigma_n, sigmar):
    """Direct regrid: place interfaces where a monotone reconstruction
    of the column potential density crosses the interface target
    densities (regrid_cntiso_hybrid_direct_jslice,
    mod_ale_regrid_remap.F90:286-560).

    Vectorization deviations from the reference's loops, validated by
    tests/test_ale_direct.py: the run-merge monotonization is a
    fixed-iteration Jacobi pairwise merge with the same dp-weighted
    means and beta/2 slope floor; the surface transition zone uses the
    plevel minimum clamp (the nudge path's pmin machinery) in place of
    the quadratic blending of :530-556.

    Returns (p_dst, smooth_fac)."""
    kk = grid.kk
    H = p_src.shape[1:]
    p_bot = p_src[kk]
    beta = ale.bfsq_min / (grav * grav)

    # --- monotonize sig_src with the beta/2 slope floor
    # (mod_ale_regrid_remap.F90:337-402): Jacobi pairwise merges
    sig = sigma_n
    dp_src = jnp.maximum(p_src[1:] - p_src[:-1], 0.)

    def merge_pass(sig, start):
        # merge violating pairs (k, k+1) for k = start, start+2, ...
        # into their dp-weighted mean with the beta/2 slope restored
        # (the window [ku, kl+1] = [k, k+2] case of :347-399)
        span = p_src[2:] - p_src[:-2]                  # (kk-1, H)
        viol = (sig[1:] - sig[:-1]) < .5 * beta * span
        kidx = jnp.arange(kk - 1).reshape((kk - 1,) + (1,) * len(H))
        act = viol & ((kidx % 2) == start)
        wsum = dp_src[:-1] + dp_src[1:]
        smean = (sig[:-1] * dp_src[:-1] + sig[1:] * dp_src[1:]) \
            / jnp.maximum(wsum, epsilp)
        up = smean + .5 * beta * (p_src[1:-1] - p_src[2:])
        lo = smean + .5 * beta * (p_src[1:-1] - p_src[:-2])
        new_up = jnp.where(act, up, sig[:-1])
        new_lo = jnp.where(act, lo, sig[1:])
        return jnp.concatenate(
            [new_up[:1],
             jnp.where(act[1:], up[1:], new_lo[:-1]),
             new_lo[-1:]], axis=0)

    for it in range(kk):
        sig = merge_pass(sig, it % 2)

    # --- monotone reconstruction + root-finding regrid
    rc_sig = h3.ppm_reconstruct(p_src, sig, h3.MONOTONIC)
    sig_trg = jnp.concatenate([sigmar, sigmar[-1:]], axis=0)
    p_cand = h3.regrid_crossings(rc_sig, sig_trg)      # (kk+1, H)

    # --- boundedness (:424-441): leading missing -> column top,
    # trailing missing -> column bottom
    found = p_cand > .5 * h3.REGRID_MVAL
    lead = jnp.cumsum(found.astype(jnp.int32), axis=0) == 0
    trail = jnp.cumsum(found[::-1].astype(jnp.int32), axis=0)[::-1] == 0
    p_cand = jnp.where(lead, p_src[:1], p_cand)
    p_cand = jnp.where(trail & (~lead), p_bot[None], p_cand)

    # --- all-missing fallback (:445-461): put the column in the layer
    # whose target-density bounds bracket the column mean density
    none_found = ~jnp.any(found, axis=0)
    smean_col = jnp.sum(sig * dp_src, axis=0) \
        / jnp.maximum(p_bot - p_src[0], epsilp)
    kidx1 = jnp.arange(1, kk + 1).reshape((kk,) + (1,) * len(H))
    # first 1-based k in [2, kk] with smean < sig_trg(k); all interfaces
    # >= ks go to the bottom
    cond = (smean_col[None] < sig_trg[1:]) & (kidx1 >= 2)
    ks = jnp.where(jnp.any(cond, axis=0),
                   jnp.argmax(cond, axis=0) + 1, kk + 1)  # 1-based
    qidx = jnp.arange(kk + 1).reshape((kk + 1,) + (1,) * len(H))
    fallback = jnp.where(qidx >= ks[None], p_bot[None], p_src[:1])
    p_cand = jnp.where(none_found[None], fallback, p_cand)

    # --- plevel surface minima + minimum-thickness monotone clamp
    # (:466-556, simplified; same machinery as the nudge path)
    plevel = jnp.asarray(ale.plevel, p_src.dtype)
    pmin = jnp.minimum(plevel.reshape((kk,) + (1,) * len(H)) + p_src[0],
                       p_bot)
    dpmin = min(ale.plevel[1] - ale.plevel[0], ale.dpmin_interior)

    def clamp_scan(prev, xs):
        c, pmn = xs
        out = jnp.minimum(jnp.maximum(jnp.maximum(c, pmn),
                                      prev + dpmin), p_bot)
        return out, out

    _, p_mid = lax.scan(clamp_scan, p_src[0], (p_cand[1:], pmin))
    p_dst = jnp.concatenate([p_src[:1], p_mid[:-1], p_bot[None]], axis=0)
    # no stability-weighted lateral smoothing in the direct method
    # (the reference smooths only pressure-regime interfaces; here the
    # pressure regime is exactly the pmin-clamped region)
    at_pmin = jnp.abs(p_dst[1:-1] - pmin[:-1]) < 1e-6
    sfac = at_pmin.astype(p_src.dtype)
    smooth_fac = jnp.concatenate(
        [jnp.ones_like(sfac[:1]), sfac, jnp.zeros_like(sfac[:1])], axis=0)
    return p_dst, smooth_fac


def regrid_smooth(grid: Grid, ale: AleParams, p_dst, smooth_fac, delt1):
    """Lateral flux-limited diffusion of weakly stratified interfaces
    (regrid_smooth_jslice, mod_ale_regrid_remap.F90:946-1020)."""
    im1, ip1, jm1, jp1 = grid.im1, grid.ip1, grid.jm1, grid.jp1
    jp1vv = lambda a: grid.jp1(a, 'v', True)   # noqa: E731 (fold-aware)
    iu, iv, ip = grid.iu, grid.iv, grid.ip

    pd = p_dst                       # (kk+1, H)
    dlayer_up = pd[1:-1] - pd[:-2]   # thickness of layer k-1 at interface k
    dlayer_lo = pd[2:] - pd[1:-1]    # thickness of layer k

    # u-direction
    cdiff = delt1 * grid.scuy * grid.scuxi
    difmx = .5 * (im1(grid.difmxp) + grid.difmxp)
    flxhi = .125 * jnp.minimum(im1(dlayer_up) * im1(grid.scp2),
                               dlayer_lo * grid.scp2)
    flxlo = -.125 * jnp.minimum(dlayer_up * grid.scp2,
                                im1(dlayer_lo) * im1(grid.scp2))
    sdiff = jnp.minimum(.5 * (im1(smooth_fac[1:-1]) + smooth_fac[1:-1])
                        * ale.smooth_diff_max, difmx)
    flxu = jnp.clip(cdiff * sdiff * (im1(pd[1:-1]) - pd[1:-1]),
                    flxlo, flxhi) * iu

    # v-direction
    cdiffv = delt1 * grid.scvx * grid.scvyi
    difmxv = .5 * (jm1(grid.difmxp) + grid.difmxp)
    flxhiv = .125 * jnp.minimum(jm1(dlayer_up) * jm1(grid.scp2),
                                dlayer_lo * grid.scp2)
    flxlov = -.125 * jnp.minimum(dlayer_up * grid.scp2,
                                 jm1(dlayer_lo) * jm1(grid.scp2))
    sdiffv = jnp.minimum(.5 * (jm1(smooth_fac[1:-1]) + smooth_fac[1:-1])
                         * ale.smooth_diff_max, difmxv)
    flxv = jnp.clip(cdiffv * sdiffv * (jm1(pd[1:-1]) - pd[1:-1]),
                    flxlov, flxhiv) * iv

    conv = (ip1(flxu) - flxu + jp1vv(flxv) - flxv)
    p_new_mid = (pd[1:-1] - conv * grid.scp2i) * ip
    return jnp.concatenate([pd[:1], p_new_mid, pd[-1:]], axis=0)


def ale_regrid_remap(grid: Grid, e: eos.EosParams, ale: AleParams,
                     s: State, m: int, n: int, delt1) -> State:
    """Full per-step ALE operation (ale_regrid_remap,
    mod_ale_regrid_remap.F90:1486-1984)."""
    kk = grid.kk
    ip, iu, iv = grid.ip, grid.iu, grid.iv
    im1, jm1 = grid.im1, grid.jm1

    p_src = cumulative_p(s.dp[n]) * ip
    p_bot = p_src[kk]

    ntr = s.trc.shape[1]
    # fused Pallas path for the column-local halves (TPU/f32, PPM
    # reconstruction + nudge regrid — the production configuration);
    # the jnp path below is the CPU/f64 reference implementation
    use_pallas = _ale_pallas_ok(ale, p_src)

    # 1.+2. reconstruct T/S and regrid
    # (REGRID_METHOD dispatch, mod_ale_regrid_remap.F90:68)
    rcs_p = None
    if ale.regrid_method == 'direct':
        p_dst, smooth_fac = regrid_direct(grid, e, ale, p_src,
                                          s.sigma[n], s.sigmar)
    elif use_pallas:
        from .ale_pallas import regrid_call
        p_dst, smooth_fac = regrid_call(e, ale, p_src, s.temp[n],
                                        s.saln[n], s.sigmar, delt1)
    else:
        rcs_p = _recon_multi(
            ale, p_src,
            [s.temp[n], s.saln[n]] + [s.trc[n, nt] for nt in range(ntr)],
            ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
        p_dst, smooth_fac = regrid_nudge(grid, e, ale, p_src, rcs_p[0],
                                         rcs_p[1], s.sigmar, delt1)

    if rcs_p is None and not use_pallas:
        # 'direct' regrid path: reconstructions are still needed for
        # the remap below
        rcs_p = _recon_multi(
            ale, p_src,
            [s.temp[n], s.saln[n]] + [s.trc[n, nt] for nt in range(ntr)],
            ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)

    # 3. lateral smoothing
    if ale.smooth_diff_max > 0.:
        p_dst = regrid_smooth(grid, ale, p_dst, smooth_fac, delt1)

    # 4.+5. remap tracers and velocities (copy_jslice_to_3d, :1153-1179;
    # velocity remap :1760-1960).  The new velocity-point grids depend
    # only on p_dst, so the tracer and velocity remaps fuse into one
    # multi-group scan over source layers (h3.remap_groups).
    dp_new = jnp.maximum(p_dst[1:] - p_dst[:-1], 0.) * ip

    pu_old = cumulative_p(s.dpu[n])
    pv_old = cumulative_p(s.dpv[n])

    p_new = cumulative_p(dp_new) * ip
    dpu_new, dpv_new = dpu_dpv_upstream(grid, p_new)
    pu_new = cumulative_p(dpu_new)
    pv_new = cumulative_p(dpv_new)

    # rescale old velocity-point interfaces to the new column range
    qu = jnp.minimum(im1(p_bot), p_bot) \
        / jnp.maximum(pu_old[kk], epsilp)
    qv = jnp.minimum(jm1(p_bot), p_bot) \
        / jnp.maximum(pv_old[kk], epsilp)

    # bottom_only_empties: the regrid's dpmin_interior clamp guarantees
    # interior destination layers are non-vanishing, which drops the
    # per-edge point/found carries from the remap scan (its dominant
    # cost at production size)
    if use_pallas:
        from .ale_pallas import remap_call
        means_p, u_mean, v_mean = remap_call(
            ale, p_src,
            [s.temp[n], s.saln[n]] + [s.trc[n, nt] for nt in range(ntr)],
            pu_old * qu, s.u[n], pv_old * qv, s.v[n],
            p_dst, pu_new, pv_new)
    else:
        rc_u = _recon(ale, pu_old * qu, s.u[n], ale.velocity_limiting,
                      pc_upper=ale.velocity_pc_upper)
        rc_v = _recon(ale, pv_old * qv, s.v[n], ale.velocity_limiting,
                      pc_upper=ale.velocity_pc_upper)
        (means_p, (u_mean,), (v_mean,)) = h3.remap_groups(
            [(rcs_p, p_dst), ([rc_u], pu_new), ([rc_v], pv_new)],
            bottom_only_empties=True)

    temp_new = means_p[0] * ip
    saln_new = means_p[1] * ip
    sigma_new = eos.sig(e, temp_new, saln_new) * ip
    u_new = u_mean * iu
    v_new = v_mean * iv

    if ntr:
        s = dataclasses.replace(
            s, trc=s.trc.at[n].set(
                jnp.stack([mn * ip for mn in means_p[2:]], axis=0)))

    s = dataclasses.replace(
        s,
        dp=s.dp.at[n].set(dp_new),
        temp=s.temp.at[n].set(temp_new),
        saln=s.saln.at[n].set(saln_new),
        sigma=s.sigma.at[n].set(sigma_new))

    return dataclasses.replace(
        s,
        u=s.u.at[n].set(u_new), v=s.v.at[n].set(v_new),
        dpu=s.dpu.at[n].set(dpu_new), dpv=s.dpv.at[n].set(dpv_new),
        dpuold=dpu_new, dpvold=dpv_new,
        p=p_new, pu=pu_new, pv=pv_new)
