"""Diapycnal mixing between isopycnic layers.

TPU-native re-design of the reference diapycnal flux solver
(reference: /root/reference/phy/mod_diapfl.F90:45-1048 diapfl).  The
full scheme: per column, interface mass fluxes are solved implicitly
from the layer-thickness diffusion equation driven by the diapycnal
diffusivity difdia, with restoration fluxes nudging interior layer
densities toward their reference values, flux limits keeping
interfaces inside the fluid domain, bottom-boundary-layer mixing from
the bottom friction velocity, and a final tridiagonal solve advecting
T/S/tracers (and u/v) with the resulting fluxes.

Vectorization: the reference's per-column while-loops become
fixed-iteration k-scans (the flux-limit loop and the
alternating-direction backward solve both converge monotonically; the
iteration counts below exceed what the reference typically needs and
the parity test checks convergence against the loop-level oracle,
tests/oracles/diapfl_oracle.py).  Per-column integer bounds
(kfpl/kmin/kmax) gate every scan with dense masks — no gathers."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ops.reduce import ksum
from jax import lax

from ..core import eos
from ..core.constants import grav, alpha0, epsilp, onem
from ..core.grid import Grid
from ..core.state import State, cumulative_p

# parameters (mod_diapfl.F90:90-92)
dsgmnr = .1
fcmxr = .25
dsgcr0 = .25
dfeps = 1.e-12
gbbl = .2
kappa = .4
ustmin = 1.e-4

N_LIMIT = 6     # flux-limit sweeps (reference loops to convergence)
N_SOLVE = 24    # alternating down/up backward-solve passes


def _tridiag(delp, fpu, fpl, rows_on, kmin_m, fields):
    """The asymmetric tridiagonal of mod_diapfl.F90:545-572: forward
    elimination downward then back-substitution, identity outside
    rows_on.  fields: list of (kk, H) arrays; returns solved copies."""
    q = 1. / jnp.where(rows_on, delp + fpu + fpl, 1.)
    atd = jnp.where(rows_on, -fpu * q, 0.)
    ctd_row = jnp.where(rows_on, -fpl * q, 0.)
    dtd = jnp.where(rows_on, delp * q, 1.)

    def fwd(carry, xs):
        ctd_prev, bitd_prev, prevs = carry
        a_k, c_k, d_k, on_k, vals = xs
        gtd = jnp.where(on_k, ctd_prev * bitd_prev, 0.)
        bitd = 1. / (1. - a_k * gtd)
        outs = tuple((d_k * v - a_k * pv) * bitd
                     for v, pv in zip(vals, prevs))
        # at the first active row the a_k is 0 so prevs are inert
        return (c_k, bitd, outs), (gtd, outs)

    init_prev = tuple(f[0] * 0. for f in fields)
    (c_l, b_l, _), (gtd, sol) = lax.scan(
        fwd, (jnp.zeros_like(delp[0]), jnp.ones_like(delp[0]),
              init_prev),
        (atd, ctd_row, dtd, rows_on, tuple(f for f in fields)))

    def bwd(nxts, xs):
        g_k1, vals, on_k = xs
        outs = tuple(jnp.where(on_k, v - g_k1 * nv, v)
                     for v, nv in zip(vals, nxts))
        return outs, outs

    gtd_next = jnp.concatenate([gtd[1:], jnp.zeros_like(gtd[:1])], 0)
    last = tuple(s[-1] for s in sol)
    _, out_rev = lax.scan(
        bwd, last,
        (gtd_next[::-1], tuple(s[::-1] for s in sol), rows_on[::-1]))
    return tuple(o[::-1] for o in out_rev)


def diapfl(grid: Grid, e: eos.EosParams, s: State, difdia, m: int,
           n: int, delt1, temmin=None) -> State:
    """difdia: (kk, H) interface/layer diapycnal diffusivity
    [m2 s-1]."""
    kk = grid.kk
    H = grid.shape
    ip = grid.ip
    ipb = ip > 0
    kidx = jnp.arange(kk).reshape((kk,) + (1,) * len(H))

    dp0 = s.dp[n]
    tt0, ss0 = s.temp[n], s.saln[n]
    dens0, sigr = s.sigma[n], s.sigmar
    ntr = s.trc.shape[1]
    trc0 = s.trc[n]
    nu0 = difdia

    c = grav * grav * delt1 / (alpha0 * alpha0)

    kfpl = s.kfpla[n].astype(jnp.int32)
    kmin = kfpl - 2
    wet = dp0 > epsilp
    kmax = jnp.max(jnp.where(wet & (kidx >= 1), kidx, 0), axis=0)
    active = (kmin < kmax) & ipb

    # restoration mask (rstdns, :150-156)
    sig_kfpl = jnp.sum(jnp.where(kidx == kfpl, dens0, 0.), axis=0)
    sigr_kfpl = jnp.sum(jnp.where(kidx == kfpl, sigr, 0.), axis=0)
    sigr_kfpl1 = jnp.sum(jnp.where(kidx == kfpl + 1, sigr, 0.), axis=0)
    no_rst1 = (kfpl != kmax) \
        & (sig_kfpl > .5 * (sigr_kfpl + sigr_kfpl1))
    rstdns = (kidx != kfpl) & ~((kidx == kfpl + 1) & no_rst1)

    # ML copy into the kmin/kmin+1 slots (:159-175)
    def ml_slots(a):
        return jnp.where(kidx == kmin, a[0][None],
                         jnp.where(kidx == kmin + 1, a[1][None], a))

    delp = ml_slots(dp0)
    ttem = ml_slots(tt0)
    ssal = ml_slots(ss0)
    nu = ml_slots(nu0)
    dens = ml_slots(dens0)
    ttrc = jnp.stack([ml_slots(trc0[nt]) for nt in range(ntr)]) \
        if ntr else trc0

    # zero thicknesses outside [kmin, kmax] for the pressure build
    in_col = (kidx >= kmin) & (kidx <= kmax)
    delp_c = jnp.where(in_col, delp, 0.)
    pres = cumulative_p(delp_c)                       # (kk+1, H)
    pbot = ksum(jnp.where(in_col, delp_c, 0.), axis=0)

    # ---- ML fluxes (:181-198)
    d0 = jnp.sum(jnp.where(kidx == kmin, delp_c, 0.), axis=0)
    d1 = jnp.sum(jnp.where(kidx == kmin + 1, delp_c, 0.), axis=0)
    d2 = jnp.sum(jnp.where(kidx == kmin + 2, delp_c, 0.), axis=0)
    nu_0 = jnp.sum(jnp.where(kidx == kmin, nu, 0.), axis=0)
    nu_1 = jnp.sum(jnp.where(kidx == kmin + 1, nu, 0.), axis=0)
    p_k1 = d0                      # pres at kmin+1 relative to kmin
    fpl_kmin = jnp.minimum(jnp.minimum(p_k1, pbot - p_k1),
                           c * nu_0 * (d0 + d1)
                           / jnp.maximum(2. * d0 * d1, epsilp))
    delpu = jnp.maximum(onem, d1)
    delpl = jnp.maximum(onem, d2)
    p_k2 = d0 + d1
    fpl_kmin1 = jnp.minimum(jnp.minimum(p_k2, pbot - p_k2),
                            c * nu_1 * (delpu + delpl)
                            / (2. * delpu * delpl))

    # ---- bottom boundary layer mixing (:201-211)
    in_int = (kidx >= kfpl) & (kidx <= kmax - 1)     # interior loop rows
    has_int = kfpl < kmax
    d_kmax = jnp.sum(jnp.where(kidx == kmax, delp_c, 0.), axis=0)
    d_km1 = jnp.sum(jnp.where(kidx == kmax - 1, delp_c, 0.), axis=0)
    sigr_kmax = jnp.sum(jnp.where(kidx == kmax, sigr, 0.), axis=0)
    sigr_km1 = jnp.sum(jnp.where(kidx == kmax - 1, sigr, 0.), axis=0)
    ust = s.ustarb
    nubbl = gbbl * ust ** 3 * jnp.exp(
        -(d_kmax + .5 * d_km1) * jnp.abs(grid.coriop) * alpha0
        / (kappa * jnp.maximum(ustmin, ust) * grav)) \
        / (alpha0 * grav * jnp.maximum(sigr_kmax - sigr_km1, 1e-12))
    nu = jnp.where((kidx == kmax - 1) & has_int[None],
                   jnp.maximum(nu, nubbl[None]), nu)

    # ---- linearized density jumps + restoration fluxes (:214-292)
    tt_m = jnp.concatenate([ttem[:1], ttem[:-1]], 0)
    ss_m = jnp.concatenate([ssal[:1], ssal[:-1]], 0)
    tt_p = jnp.concatenate([ttem[1:], ttem[-1:]], 0)
    ss_p = jnp.concatenate([ssal[1:], ssal[-1:]], 0)
    sigr_m = jnp.concatenate([sigr[:1], sigr[:-1]], 0)
    sigr_p = jnp.concatenate([sigr[1:], sigr[-1:]], 0)
    dens_m = jnp.concatenate([dens[:1], dens[:-1]], 0)
    dens_p = jnp.concatenate([dens[1:], dens[-1:]], 0)

    dsgdt = eos.dsigdt(e, ttem, ssal)
    dsgds = eos.dsigds(e, ttem, ssal)
    one = jnp.ones_like(delp)
    use_rst = rstdns & in_int
    dsgu = jnp.where(use_rst | (kidx == kmax),
                     jnp.maximum(dsgmnr * (sigr - sigr_m),
                                 dsgdt * (ttem - tt_m)
                                 + dsgds * (ssal - ss_m)), one)
    dsgl = jnp.where(use_rst,
                     jnp.maximum(dsgmnr * (sigr_p - sigr),
                                 dsgdt * (tt_p - ttem)
                                 + dsgds * (ss_p - ssal)), one)
    dsghm = jnp.where(use_rst, 2. * dsgu * dsgl / (dsgu + dsgl), one)
    dsg = jnp.where(use_rst, .5 * (dsgu + dsgl), one)
    dsgui = 1. / dsgu
    dsgli = 1. / dsgl

    fcmx = .25 * (jnp.sqrt(delp * delp
                           + 4. * c * nu * dsg * (dsgui + dsgli))
                  - delp) * dsghm * fcmxr
    dsgc = dens - sigr
    qd = jnp.maximum(0., (dens - sigr_p)
                     / jnp.where(jnp.abs(sigr - sigr_p) > 0.,
                                 (sigr - sigr_p) * (1. - dsgcr0), 1.))
    qd = jnp.maximum(0., 1. - qd * qd) ** 3
    fcu_pos = jnp.where(dens_m < sigr,
                        jnp.minimum(qd * dsgc * delp
                                    + (1. - qd) * fcmx, dsgc * delp),
                        0.)
    qu = jnp.maximum(0., (dens - sigr_m)
                     / jnp.where(jnp.abs(sigr - sigr_m) > 0.,
                                 (sigr - sigr_m) * (1. - dsgcr0), 1.))
    qu = jnp.maximum(0., 1. - qu * qu) ** 3
    fcl_neg = jnp.where(dens_p > sigr,
                        jnp.maximum(qu * dsgc * delp
                                    - (1. - qu) * fcmx, dsgc * delp),
                        0.)
    fcu = jnp.where(use_rst & (dsgc > 0.), fcu_pos, 0.)
    fcl = jnp.where(use_rst & (dsgc <= 0.), fcl_neg, 0.)
    # row kfpl-1 carries -fpl of the lower mixed layer (:215-216)
    fcl = jnp.where(kidx == kfpl - 1, -fpl_kmin1[None], fcl)

    # kmax row: upper flux from density excess (:276-292)
    dens_kmax = jnp.sum(jnp.where(kidx == kmax, dens, 0.), axis=0)
    dens_kmax_m = jnp.sum(jnp.where(kidx == kmax - 1, dens, 0.), axis=0)
    dsgui_kmax = jnp.sum(jnp.where(kidx == kmax, dsgui, 0.), axis=0)
    fpu_kmax = jnp.where(
        (dens_kmax > sigr_kmax) & (dens_kmax_m < sigr_kmax),
        jnp.minimum(d_km1, (dens_kmax - sigr_kmax) * d_kmax
                    * dsgui_kmax), 0.)
    fcu = jnp.where(kidx == kmax, (fpu_kmax * 1.)[None] * dsgu, fcu)
    # NOTE: fcu(kmax) = fpu(kmax)*dsgu(kmax) (:292)

    # ---- flux-limit iteration (:295-329): fixed sweeps
    pres_p1 = pres[1:]                                 # p at k+1
    pres_k = pres[:-1]
    p_kfpl = jnp.sum(jnp.where(kidx == kfpl, pres_k, 0.), axis=0)

    def shift_dn(a):                                   # value at k+1
        return jnp.concatenate([a[1:], a[-1:] * 0.], 0)

    def shift_up(a):                                   # value at k-1
        return jnp.concatenate([a[:1] * 0., a[:-1]], 0)

    fmax_ = jnp.zeros_like(delp)
    kfmaxu = jnp.full(H, -1, jnp.int32)

    def limit_iter(i, carry):
        fcl_i, fcu_i, fmax_i, kfmaxu_i = carry

        on = in_int
        init = (jnp.zeros(H, delp.dtype), jnp.zeros(H, delp.dtype),
                jnp.ones(H, delp.dtype))
        fcu_kmax_v = jnp.sum(jnp.where(kidx == kmax, fcu_i, 0.), axis=0)

        def dn2(carry_f, xs_k):
            fmax_k1, fcu_k1, dsgui_k1 = carry_f
            fcl_k, dsgl_k, pk1, on_k, fcu_k, dsgui_k, is_kmax = xs_k
            fmax_k1 = jnp.where(is_kmax, 0., fmax_k1)
            fcu_k1 = jnp.where(is_kmax, fcu_kmax_v, fcu_k1)
            dsgui_k1 = jnp.where(is_kmax, dsgui_kmax, dsgui_k1)
            q = ((fmax_k1 + fcu_k1) * dsgui_k1 + (pbot - pk1)) * dsgl_k
            fcl_new = jnp.where(on_k, jnp.maximum(-q, fcl_k), fcl_k)
            fmax_new = jnp.where(on_k, q + fcl_new, fmax_k1)
            fcu_out = jnp.where(on_k, fcu_k, fcu_k1)
            dsgui_out = jnp.where(on_k, dsgui_k, dsgui_k1)
            return (fmax_new, fcu_out, dsgui_out), (fcl_new, fmax_new)

        is_kmax_rows = (kidx == kmax - 0)
        _, (fcl_r, fmax_r) = lax.scan(
            dn2, init,
            (fcl_i[::-1], dsgl[::-1], pres_p1[::-1], on[::-1],
             fcu_i[::-1], dsgui[::-1],
             jnp.broadcast_to(is_kmax_rows, delp.shape)[::-1]))
        fcl_i = fcl_r[::-1]
        fmax_i = jnp.where(on, fmax_r[::-1], fmax_i * 0.)

        # upward recurrence: clamp fcu(k) by fmax(k-1) (forward scan)
        def up(carry_f, xs_k):
            fmax_m, fcl_m, dsgli_m, kfm = carry_f
            (fcu_k, dsgu_k, pk, on_k, fmax_k, fcl_k, dsgli_k,
             k_i) = xs_k
            q = ((fmax_m - fcl_m) * dsgli_m + (pk - p_kfpl)) * dsgu_k
            fcu_new = jnp.where(on_k, jnp.minimum(fcu_k, q), fcu_k)
            clamp = on_k & (fmax_k > q - fcu_new)
            fmax_new = jnp.where(clamp, q - fcu_new, fmax_k)
            kfm = jnp.where(clamp, k_i, kfm)
            fmax_out = jnp.where(on_k, fmax_new, fmax_m)
            fcl_out = jnp.where(on_k, fcl_k, fcl_m)
            dsgli_out = jnp.where(on_k, dsgli_k, dsgli_m)
            return (fmax_out, fcl_out, dsgli_out, kfm), \
                (fcu_new, fmax_new)

        # seed: row kfpl-1 has fmax=0, fcl=-fpl_kmin1, dsgli=1
        init_u = (jnp.zeros(H, delp.dtype), -fpl_kmin1,
                  jnp.ones(H, delp.dtype), jnp.full(H, -1, jnp.int32))
        _, (fcu_n, fmax_n) = lax.scan(
            up, init_u,
            (fcu_i, dsgu, pres_k, on, fmax_i, fcl_i, dsgli,
             jnp.broadcast_to(kidx, delp.shape).astype(jnp.int32)))
        fcu_i = fcu_n
        fmax_i = jnp.where(on, fmax_n, fmax_i)
        return (fcl_i, fcu_i, fmax_i, kfmaxu_i)

    # run the limit iteration; track kfmaxu from the last sweep
    carry = (fcl, fcu, fmax_, kfmaxu)
    for _ in range(N_LIMIT):
        carry = limit_iter(0, carry)
    fcl, fcu, fmax_, _ = carry
    # kfmaxu: deepest k whose fmax was set by the upward clamp in the
    # final state: recompute via the clamp condition
    fmax_up_prev = shift_up(fmax_)
    fcl_up_prev = jnp.where(kidx == kfpl, -fpl_kmin1[None],
                            shift_up(fcl))
    dsgli_up_prev = jnp.where(kidx == kfpl, 1., shift_up(dsgli))
    q_up = ((fmax_up_prev - fcl_up_prev) * dsgli_up_prev
            + (pres_k - p_kfpl)) * dsgu
    clamped_up = in_int & (fmax_ >= q_up - fcu - 1e-9 * jnp.abs(q_up))
    kfmaxu = jnp.max(jnp.where(clamped_up, kidx, -1), axis=0)

    # ---- first guess + h (:333-353)
    f = jnp.where(in_int,
                  jnp.minimum(jnp.minimum(
                      fmax_,
                      .5 * jnp.sqrt(c * nu * dsg * (dsgui + dsgli))
                      * dsghm),
                      c * nu * dsg / jnp.maximum(epsilp, delp)), 0.)
    fcu_p1 = shift_dn(fcu)
    dsgui_p1 = shift_dn(dsgui)
    fcl_m1 = jnp.where(kidx == kfpl, -fpl_kmin1[None], shift_up(fcl))
    dsgli_m1 = jnp.where(kidx == kfpl, 1., shift_up(dsgli))
    h = jnp.where(in_int,
                  fcu * dsgui - fcl * dsgli
                  + fcl_m1 * dsgli_m1 - fcu_p1 * dsgui_p1, 0.)

    # ---- alternating-direction backward solve (:356-533)
    def backward_core(q, r, t):
        s_ = jnp.sqrt(q * q + r)
        f0_std = (q + s_) * t
        df_std = (1. + q / s_) * t
        # Taylor branch for q < 0 with r/q^2 small (:389-404)
        qq = jnp.where(jnp.abs(q) > 0., q, -1.)
        sr = r / (qq * qq)
        rr = .00390625 * sr
        f0_tay = -qq * rr * (128. - sr * (32. - sr * (
            16. - sr * (10. - sr * 7.)))) * t
        df_tay = rr * (128. - sr * (96. - sr * (
            80. - sr * (70. - sr * 63.)))) * t
        use_tay = (q < 0.) & (sr < 1.e-3)
        return (jnp.where(use_tay, f0_tay, f0_std),
                jnp.where(use_tay, df_tay, df_std))

    def down_pass(f):
        def body(carry_f, xs_k):
            ctd, bitd, remfmx, f_prev, f0_prev = carry_f
            (on_k, fmax_k, h_k, delp_k, nu_k, dsg_k, dsgui_k, dsgli_k,
             dsghm_k, dsgli_m1_k, dsgui_p1_k, f_next_old, k_i) = xs_k
            q = f0_prev * dsgli_m1_k + f_next_old * dsgui_p1_k \
                - delp_k - h_k
            r = 4. * c * nu_k * dsg_k * (dsgui_k + dsgli_k)
            t = .25 * dsghm_k
            f0_k, dfdg = backward_core(q, r, t)
            hit = f0_k >= fmax_k
            f0_k = jnp.where(hit, fmax_k, f0_k)
            dfdg = jnp.where(hit, 0., dfdg)
            remfmx_new = remfmx | (hit & (k_i > kfmaxu))
            use_rem = remfmx
            gtd_k = jnp.where(use_rem, 0., ctd * bitd)
            atd = -dfdg * dsgli_m1_k
            ctd_new = -dfdg * dsgui_p1_k
            bitd_new = 1. / (1. - atd * gtd_k)
            f_k = (f0_k - atd * (f_prev - f0_prev)
                   + ctd_new * f_next_old) * bitd_new
            f_k = jnp.where(use_rem, fmax_k, f_k)
            f0_k = jnp.where(use_rem, fmax_k, f0_k)
            gtd_out = jnp.where(on_k, gtd_k, 0.)
            # freeze carries off-range
            ctd_c = jnp.where(on_k, ctd_new, ctd)
            bitd_c = jnp.where(on_k, bitd_new, bitd)
            rem_c = jnp.where(on_k, remfmx_new, remfmx)
            fp_c = jnp.where(on_k, f_k, f_prev)
            f0p_c = jnp.where(on_k, f0_k, f0_prev)
            return (ctd_c, bitd_c, rem_c, fp_c, f0p_c), \
                (gtd_out, jnp.where(on_k, f_k, 0.),
                 jnp.where(on_k, f0_k, 0.))

        f_next_old = shift_dn(f)
        init = (jnp.zeros(H, delp.dtype), jnp.ones(H, delp.dtype),
                jnp.zeros(H, bool), jnp.zeros(H, delp.dtype),
                jnp.zeros(H, delp.dtype))
        _, (gtd, f_new, f0_new) = lax.scan(
            body, init,
            (in_int, fmax_, h, delp, nu, dsg, dsgui, dsgli, dsghm,
             dsgli_m1, dsgui_p1, f_next_old,
             jnp.broadcast_to(kidx, delp.shape).astype(jnp.int32)))

        # back substitution upward (:434-440)
        def sub(f_next, xs_k):
            f_k, gtd_k1, fmax_k, on_k = xs_k
            f_out = jnp.where(on_k,
                              jnp.minimum(fmax_k, f_k - gtd_k1 * f_next),
                              f_k)
            return jnp.where(on_k, f_out, f_next), f_out

        gtd_next = shift_dn(gtd)
        _, f_rev = lax.scan(
            sub, jnp.zeros(H, delp.dtype),
            (f_new[::-1], gtd_next[::-1], fmax_[::-1], in_int[::-1]))
        return f_rev[::-1]

    def up_pass(f):
        def body(carry_f, xs_k):
            atd, bitd, remfmx, f_prev, f0_prev = carry_f
            (on_k, fmax_k, h_k, delp_k, nu_k, dsg_k, dsgui_k, dsgli_k,
             dsghm_k, dsgli_m1_k, dsgui_p1_k, f_below_old, k_i) = xs_k
            # upward: f_prev/f0_prev are the k+1 (just updated) values;
            # f_below_old is the old k-1 value
            q = f_below_old * dsgli_m1_k + f0_prev * dsgui_p1_k \
                - delp_k - h_k
            r = 4. * c * nu_k * dsg_k * (dsgui_k + dsgli_k)
            t = .25 * dsghm_k
            f0_k, dfdg = backward_core(q, r, t)
            hit = f0_k >= fmax_k
            f0_k = jnp.where(hit, fmax_k, f0_k)
            dfdg = jnp.where(hit, 0., dfdg)
            remfmx_new = remfmx | (hit & (k_i <= kfmaxu))
            use_rem = remfmx
            gtd_k = jnp.where(use_rem, 0., atd * bitd)
            atd_new = -dfdg * dsgli_m1_k
            ctd_new = -dfdg * dsgui_p1_k
            bitd_new = 1. / (1. - ctd_new * gtd_k)
            f_k = (f0_k + atd_new * f_below_old
                   - ctd_new * (f_prev - f0_prev)) * bitd_new
            f_k = jnp.where(use_rem, fmax_k, f_k)
            f0_k = jnp.where(use_rem, fmax_k, f0_k)
            gtd_out = jnp.where(on_k, gtd_k, 0.)
            atd_c = jnp.where(on_k, atd_new, atd)
            bitd_c = jnp.where(on_k, bitd_new, bitd)
            rem_c = jnp.where(on_k, remfmx_new, remfmx)
            fp_c = jnp.where(on_k, f_k, f_prev)
            f0p_c = jnp.where(on_k, f0_k, f0_prev)
            return (atd_c, bitd_c, rem_c, fp_c, f0p_c), \
                (gtd_out, jnp.where(on_k, f_k, 0.),
                 jnp.where(on_k, f0_k, 0.))

        f_below_old = jnp.where(kidx == kfpl, 0., shift_up(f))
        init = (jnp.zeros(H, delp.dtype), jnp.ones(H, delp.dtype),
                jnp.zeros(H, bool), jnp.zeros(H, delp.dtype),
                jnp.zeros(H, delp.dtype))
        _, (gtd_r, f_r, f0_r) = lax.scan(
            body, init,
            (in_int[::-1], fmax_[::-1], h[::-1], delp[::-1], nu[::-1],
             dsg[::-1], dsgui[::-1], dsgli[::-1], dsghm[::-1],
             dsgli_m1[::-1], dsgui_p1[::-1], f_below_old[::-1],
             jnp.broadcast_to(kidx, delp.shape).astype(jnp.int32)[::-1]))
        gtd = gtd_r[::-1]
        f_new = f_r[::-1]

        # back substitution downward (:507-512)
        def sub(f_prev, xs_k):
            f_k, gtd_m1, fmax_k, on_k = xs_k
            f_out = jnp.where(on_k,
                              jnp.minimum(fmax_k, f_k - gtd_m1 * f_prev),
                              f_k)
            return jnp.where(on_k, f_out, f_prev), f_out

        gtd_prev = shift_up(gtd)
        _, f_fin = lax.scan(
            sub, jnp.zeros(H, delp.dtype),
            (f_new, gtd_prev, fmax_, in_int))
        return f_fin

    for it in range(N_SOLVE):
        f = down_pass(f) if it % 2 == 0 else up_pass(f)

    # ---- mass fluxes (:536-541)
    fpu = jnp.where(in_int, (f + fcu) * dsgui, 0.)
    fpl = jnp.where(in_int, (f - fcl) * dsgli, 0.)
    fpu = jnp.where((kidx == kmax) & (kfpl <= kmax)[None],
                    fpu_kmax[None], fpu)
    fpu = jnp.where(kidx == kfpl, fpl_kmin1[None], fpu)
    fpu = jnp.where(kidx == kmin + 1, fpl_kmin[None], fpu)
    fpl = jnp.where(kidx == kmin, fpl_kmin[None], fpl)
    fpl = jnp.where(kidx == kmin + 1, fpl_kmin1[None], fpl)
    fpl = jnp.where(kidx == kmax, 0., fpl)

    # gate everything on active columns + the fluid range
    rows_on = in_col & active[None]
    fpu = jnp.where(rows_on, fpu, 0.)
    fpl = jnp.where(rows_on, fpl, 0.)

    # ---- T/S/tracer tridiagonal (:545-572)
    fields = [ssal, ttem] + ([ttrc[nt] for nt in range(ntr)])
    solved = _tridiag(jnp.where(rows_on, delp, 1.),
                      fpu, fpl, rows_on, kmin, fields)
    ssal_n, ttem_n = solved[0], solved[1]
    trc_n = list(solved[2:])
    dens_n = eos.sig(e, ttem_n, ssal_n)

    # ---- thickness update (:573-577)
    fpl_m1 = shift_up(fpl)
    fpu_p1 = shift_dn(fpu)
    dnew = jnp.where(in_int & active[None],
                     jnp.maximum(0., delp + fpu + fpl - fpl_m1 - fpu_p1),
                     delp)
    dnew = jnp.where((kidx == kmax) & active[None],
                     jnp.maximum(0., delp + fpu - fpl_m1), dnew)

    # ---- mixed-layer copy-back (:580-600)
    def pick(a, kq):
        return jnp.sum(jnp.where(kidx == kq, a, 0.), axis=0)

    def put(a, k_static, val, cond):
        return a.at[k_static].set(jnp.where(cond, val, a[k_static]))

    t0v, t1v = pick(ttem_n, kmin), pick(ttem_n, kmin + 1)
    s0v, s1v = pick(ssal_n, kmin), pick(ssal_n, kmin + 1)
    g0v, g1v = pick(dens_n, kmin), pick(dens_n, kmin + 1)
    ttem_n = put(ttem_n, 0, t0v, active)
    ttem_n = put(ttem_n, 1, t1v, active)
    ssal_n = put(ssal_n, 0, s0v, active)
    ssal_n = put(ssal_n, 1, s1v, active)
    dens_n = put(dens_n, 0, g0v, active)
    dens_n = put(dens_n, 1, g1v, active)
    # thickness bookkeeping for kmin > 0 (:587-594)
    d_kmin1 = pick(dnew, kmin + 1)
    dnew = put(dnew, 1, jnp.where(kmin == 1, d_kmin1, dnew[1]),
               active & (kmin >= 1))
    dnew = jnp.where((kidx == kmin + 1) & (kmin == 1)[None]
                     & active[None], 0., dnew)
    dnew = jnp.where((kidx == kmin) & (kmin >= 2)[None] & active[None],
                     0., dnew)
    if ntr:
        for nt in range(ntr):
            v0, v1 = pick(trc_n[nt], kmin), pick(trc_n[nt], kmin + 1)
            trc_n[nt] = put(trc_n[nt], 0, v0, active)
            trc_n[nt] = put(trc_n[nt], 1, v1, active)

    # inactive columns keep their inputs
    ttem_n = jnp.where(active[None], ttem_n, tt0)
    ssal_n = jnp.where(active[None], ssal_n, ss0)
    dens_n = jnp.where(active[None], dens_n, dens0)
    dnew = jnp.where(active[None], dnew, dp0)
    if ntr:
        trc_n = [jnp.where(active[None], trc_n[nt], trc0[nt])
                 for nt in range(ntr)]

    # ---- massless fill (:604-649)
    t2 = ttem_n[1]
    tmn = temmin if temmin is not None else -3.
    no_int = kfpl > kmax
    t_kfpl = jnp.sum(jnp.where(kidx == kfpl, ttem_n, 0.), axis=0)
    t_kmax = jnp.sum(jnp.where(kidx == kmax, ttem_n, 0.), axis=0)
    fill_a = (kidx >= 2) & no_int[None] & ipb[None]
    fill_b = (kidx >= 2) & (kidx < kfpl) & (~no_int[None]) & ipb[None]
    fill_c = (kidx > kmax) & (~no_int[None]) & ipb[None]
    t_fill = jnp.where(fill_a, jnp.maximum(t2[None], tmn),
                       jnp.where(fill_b, t_kfpl[None],
                                 jnp.where(fill_c, t_kmax[None],
                                           ttem_n)))
    filled = fill_a | fill_b | fill_c
    s_fill = jnp.where(filled, eos.sofsig(e, sigr, t_fill), ssal_n)
    d_fill = jnp.where(filled, sigr, dens_n)
    dp_fill = jnp.where(fill_a | fill_b, 0., dnew)
    ttem_n, ssal_n, dens_n, dnew = t_fill, s_fill, d_fill, dp_fill
    if ntr:
        for nt in range(ntr):
            v1 = trc_n[nt][1]
            v_kfpl = jnp.sum(jnp.where(kidx == kfpl, trc_n[nt], 0.),
                             axis=0)
            v_kmax = jnp.sum(jnp.where(kidx == kmax, trc_n[nt], 0.),
                             axis=0)
            trc_n[nt] = jnp.where(
                fill_a, v1[None],
                jnp.where(fill_b, v_kfpl[None],
                          jnp.where(fill_c, v_kmax[None], trc_n[nt])))

    # ---- momentum-mixing flux save (:654-700)
    fpl_kmin_v = jnp.where(active, pick(fpl, kmin), 0.)
    fpug = jnp.where(kidx <= kmin, fpl_kmin_v[None],
                     jnp.where(kidx <= kmax, fpu, 0.))
    fplg = jnp.where(kidx <= kmin, fpl_kmin_v[None],
                     jnp.where(kidx <= kmax, fpl, 0.))
    fpug = jnp.where(active[None], fpug, 0.)
    fplg = jnp.where(active[None], fplg, 0.)

    s_out = dataclasses.replace(
        s,
        temp=s.temp.at[n].set(ttem_n * ip),
        saln=s.saln.at[n].set(ssal_n * ip),
        sigma=s.sigma.at[n].set(dens_n * ip),
        dp=s.dp.at[n].set(dnew * ip))
    if ntr:
        s_out = dataclasses.replace(
            s_out, trc=s_out.trc.at[n].set(jnp.stack(trc_n, 0)))

    # ---- diapycnal mixing of momentum (:707-1048)
    s_out = _momentum_mix(grid, s_out, fpug, fplg, kmin, active, n)
    return s_out


def _momentum_mix(grid: Grid, s: State, fpug, fplg, kmin, active,
                  n: int) -> State:
    """u/v column mixing with the interpolated, bathymetry-limited
    interface fluxes (mod_diapfl.F90:707-1048)."""
    kk = grid.kk
    H = grid.shape
    kidx = jnp.arange(kk).reshape((kk,) + (1,) * len(H))
    im1, jm1 = grid.im1, grid.jm1

    p = cumulative_p(s.dp[n]) * grid.ip
    kmin_f = jnp.where(active, kmin, kk).astype(jnp.float64
                                                if s.dp.dtype ==
                                                jnp.float64
                                                else jnp.float32)

    def mix(vel, dpvel, nbr, mask, pbvel_bot):
        kmin_uv = jnp.minimum(nbr(kmin_f), kmin_f).astype(jnp.int32)
        wetv = dpvel > 0.
        kmax_uv = jnp.max(jnp.where(wetv & (kidx >= 1), kidx, 0),
                          axis=0)
        act = (kmin_uv < kmax_uv) & (mask > 0)

        def limited(pcol, fpug_c, fplg_c):
            fplg_m1 = jnp.concatenate([fplg_c[:1] * 0., fplg_c[:-1]], 0)
            pold = pcol[:-1] - fplg_m1 + fpug_c
            pnew = pcol[:-1]
            pb = pbvel_bot[None]
            fpum = jnp.where(
                pold <= pb,
                fpug_c,
                jnp.where(pnew <= pb, fpug_c - pold + pb,
                          .5 * (fpug_c + fplg_m1)))
            fplm = jnp.where(
                pold <= pb,
                jnp.where(pnew <= pb, fplg_m1, fplg_m1 - pnew + pb),
                jnp.where(pnew <= pb, fplg_m1,
                          .5 * (fpug_c + fplg_m1)))
            return fpum, fplm

        fpum_m, fplm_m = limited(nbr(p), nbr(fpug), nbr(fplg))
        fpum_p, fplm_p = limited(p, fpug, fplg)
        fpu_v = .5 * (fpum_m + fpum_p)       # at interface k (above lyr)
        fplm1_v = .5 * (fplm_m + fplm_p)     # fpl(k-1)

        in_rng = (kidx >= kmin_uv) & (kidx <= kmax_uv) & act[None]
        fpu_row = jnp.where(in_rng & (kidx > kmin_uv), fpu_v, 0.)
        fpl_row = jnp.where(
            in_rng & (kidx < kmax_uv),
            jnp.concatenate([fplm1_v[1:], fplm1_v[-1:] * 0.], 0), 0.)

        # collapse the mixed layers into the kmin/kmin+1 slots
        vml = jnp.where(kidx == kmin_uv, vel[0][None],
                        jnp.where(kidx == kmin_uv + 1, vel[1][None],
                                  vel))
        dml = jnp.where(kidx == kmin_uv, dpvel[0][None],
                        jnp.where(kidx == kmin_uv + 1, dpvel[1][None],
                                  dpvel))
        (v_new,) = _tridiag(jnp.where(in_rng, dml, 1.), fpu_row,
                            fpl_row, in_rng, kmin_uv, [vml])
        v0 = jnp.sum(jnp.where(kidx == kmin_uv, v_new, 0.), axis=0)
        v1 = jnp.sum(jnp.where(kidx == kmin_uv + 1, v_new, 0.), axis=0)
        v_kmax = jnp.sum(jnp.where(kidx == kmax_uv, v_new, 0.), axis=0)
        out = jnp.where((kidx >= kmin_uv + 2) & in_rng, v_new, vel)
        out = out.at[0].set(jnp.where(act, v0, vel[0]))
        out = out.at[1].set(jnp.where(act, v1, vel[1]))
        # newly opened layers get the deepest velocity (:842-848)
        opened = (kidx > kmax_uv) \
            & (jnp.minimum(nbr(p)[1:], p[1:]) < pbvel_bot[None]) \
            & act[None]
        out = jnp.where(opened, v_kmax[None], out)
        return out * mask

    pu_bot = jnp.sum(s.dpu[n], axis=0)
    pv_bot = jnp.sum(s.dpv[n], axis=0)
    u_new = mix(s.u[n], s.dpu[n], im1, grid.iu, pu_bot)
    v_new = mix(s.v[n], s.dpv[n], jm1, grid.iv, pv_bot)
    return dataclasses.replace(
        s, u=s.u.at[n].set(u_new), v=s.v.at[n].set(v_new))
