"""Bulk surface mixed layer: Oberhuber (1993) TKE balance.

TPU-native re-design of the reference bulk mixed layer
(reference: /root/reference/phy/mod_mxlayr.F90:130-1431 mxlayr).  The
mixed layer consists of layers 1-2 (layer 1 a thktop=10 m skin); a TKE
budget decides between entrainment deepening and detrainment toward
the depth restoring TKE balance.

TKE sources/sinks per the reference (:288-386):
  mtkeus = rm0*ustar^3 * exp(-lui*pmxl)          wind work, decayed
  mtkeni = niwgf*niwbf*idkedt * exp(-lui*pmxl)   near-inertial waves
  mtkebf = (cbftot - cbfpsw*G(lei*pmxl)) * exp(-lbi*pmxl) * pmxl
           buoyancy flux incl. penetrating shortwave correction, with
           the Gaspar-type decay scale lbi = lui (destabilizing) or
           lui*kappa/mu (stabilizing)
  mtkers = -crs*pmxl^3                           Fox-Kemper (2008)
           mixed-layer-eddy restratification, 'variable'/'constant'/
           'limited' time-scale options (mlrttp)
  mtkepe/-ke: potential-energy cost (exact p_p_alpha integrals) and
           rm5 momentum-entrainment kinetic-energy source during
           entrainment (:877-1016).

Detrainment solves tkew(pmxl) = 0 by the reference's damped Newton
iteration (:385-454) vectorized over columns (fixed maxitr sweeps with
convergence masks).  Entrainment walks layers kfpl..kk with the same
Newton solve inside each layer (:833-1019).

Deliberate simplifications, documented for the parity pass: the
fossil-layer content is assigned to its isopycnic density class as a
whole (the reference's per-case partial-filling logic :695-800 is
condensed to class selection + merge), and the brine-plume distribution
(:525-620, active only when brnflx < 0, i.e. with an ice model) applies
the brine flux to layer 2.  Velocity remapping after the mixed-layer
change follows in mod_momtum's dpu/dpv recomputation (here: the caller
refreshes dpu/dpv from the new dp — mxlayr tail :1246-1431)."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.reduce import ksum
from jax import lax

from ..core import eos
from ..core.constants import (grav, alpha0, spcifh, onem, onecm, onemm,
                              epsilp)
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from ..phys.forcing import Forcing

mltmin = 5.      # minimum ML thickness [m] (mod_mxlayr.F90:73)
thktop = 10.     # skin layer thickness [m] (mod_mxlayr.F90:75)
tencm = 10. * onecm
onemu = .009806

# Oberhuber closure parameters (mod_mxlayr.F90:168-172)
kappa = .4
mu = 2.
ustmin = .001
mldjmp = 1.e-3
maxitr = 20

# Fox-Kemper restratification constants (mod_mxlayr.F90:178-181)
cori20 = 4.9745e-5
ci = 44. / 63.
slbg0 = 0.


class MxlayrParams(NamedTuple):
    rm0: float = 1.2        # wind TKE efficiency (deck RM0)
    rm5: float = 0.         # momentum-entrainment TKE efficiency (RM5)
    mlrttp: str = 'variable'   # restratification time-scale type
    ce: float = .06         # MLE efficiency (mod_eddtra.F90:58)
    tau_mlr: float = 86400.    # restrat. timescale (mod_eddtra.F90:64)
    lfmin: float = 5.e3     # min front length scale (mod_eddtra.F90:80)
    niwgf: float = 0.       # NIW energy factor (mod_niw)
    niwbf: float = .35
    swamxd: float = 200.    # max shortwave penetration depth [m]


def _bg2(grid: Grid, e: eos.EosParams, s: State, n: int):
    """Squared lateral buoyancy gradient of the mixed layer
    (mod_mxlayr.F90:222-280), with the reference's one-sided treatment
    at land edges."""
    # barrier-isolated: this subgraph shares inputs (dp, temp, saln)
    # with the rest of the mxlayr DAG; without the fences XLA re-fuses
    # the shared subexpressions differently per block shape and the
    # 1-ulp bg2 differences break the bitwise mesh-factorization
    # invariance of the sharded step (via crs -> TKE -> entrainment)
    dp1, dp2, t1, t2, s1, s2 = jax.lax.optimization_barrier(
        (s.dp[n][0], s.dp[n][1], s.temp[n][0], s.temp[n][1],
         s.saln[n][0], s.saln[n][1]))
    q = 1. / jnp.maximum(dp1 + dp2, epsilp)
    tmxl = (t1 * dp1 + t2 * dp2) * q
    smxl = (s1 * dp1 + s2 * dp2) * q
    b = grav * alpha0 * eos.sig0(e, tmxl, smxl)

    qx = (b - grid.im1(b)) * grid.scuxi
    u2 = qx * qx * grid.iu
    qy = (b - grid.jm1(b)) * grid.scvyi
    v2 = qy * qy * grid.iv

    u2p = grid.ip1(u2)
    nu = grid.iu + grid.ip1(grid.iu)
    gx = jnp.where(nu > 1.5, .5 * (u2 + u2p), u2 + u2p)
    v2p = grid.jp1(v2, 'v', True)
    nv = grid.iv + grid.jp1(grid.iv, 'v', True)
    gy = jnp.where(nv > 1.5, .5 * (v2 + v2p), v2 + v2p)
    return jax.lax.optimization_barrier((gx + gy + slbg0) * grid.ip)



def entrain_energy(p_top, prk, pmxl, tk, sk, tm0, sm0, dpe0, dke0,
                   uk, vk, um, vm, delt1, rm5):
    """Potential/kinetic-energy terms of the entrainment TKE budget
    (mod_mxlayr.F90:877-916 and the per-layer accumulation :975-1010):
    the PE cost of mixing layer k's slab into the mixed layer expressed
    through the dynamic-enthalpy double integral p_p_alpha, floored by
    the mldjmp minimum stratification, and the rm5-weighted
    mean-shear KE source."""
    denom = jnp.maximum(pmxl - p_top, epsilp)
    tmx = (tm0 * (prk - p_top) + tk * (pmxl - prk)) / denom
    smx = (sm0 * (prk - p_top) + sk * (pmxl - prk)) / denom
    dpe = dpe0 + jnp.maximum(
        .5 * alpha0 * alpha0 * mldjmp
        * (prk - p_top) * (pmxl - prk),
        eos.p_p_alpha(pmxl, p_top, tmx, smx)
        - eos.p_p_alpha(pmxl, prk, tk, sk)
        - eos.p_p_alpha(prk, p_top, tm0, sm0)
        - (p_top - prk) * eos.p_alpha(pmxl, prk, tk, sk)) \
        * alpha0 / (delt1 * grav)
    dke = dke0 + .5 * rm5 * (prk - p_top) * (pmxl - prk) \
        * ((uk - um) ** 2 + (vk - vm) ** 2) * alpha0 \
        / (denom * delt1 * grav)
    return tmx, smx, dpe, dke

def mxlayr(grid: Grid, e: eos.EosParams, s: State, forcing: Forcing,
           par: MxlayrParams, m: int, n: int, delt1,
           swabs=None, idkedt=None, dfl=None):
    """Returns the updated State; when `dfl` (DiffusionFields) is
    passed, returns (state, dfl) with the mtke TKE-budget diagnostics
    filled (mod_mxlayr.F90 mtkeus..mtkeke)."""
    return _mxlayr(grid, e, s, forcing, par, m, n, delt1, swabs,
                   idkedt, dfl)


def _mxlayr(grid: Grid, e: eos.EosParams, s: State, forcing: Forcing,
            par: MxlayrParams, m: int, n: int, delt1,
            swabs=None, idkedt=None, dfl=None):
    kk = grid.kk
    ip = grid.ip
    H = grid.shape
    dtype = s.dp.dtype
    kidx = jnp.arange(kk, dtype=jnp.int32).reshape((kk,) + (1,) * len(H))

    ttem = s.temp[n]
    ssal = s.saln[n]
    delp = s.dp[n]
    dens = s.sigma[n]
    densr = s.sigmar
    kfpl = s.kfpla[n].astype(jnp.int32)

    pres = cumulative_p(delp) * ip                # (kk+1, H)
    cpi = 1.0 / spcifh
    dtg = delt1 * grav
    qag = alpha0 / grav

    # shortwave penetration profile (swfc2/swal2 of mod_swabs)
    if swabs is not None:
        swfc2 = swabs.swfc2
        swal2 = jnp.maximum(swabs.swal2, 1e-3)
    else:
        swfc2 = jnp.zeros(H, dtype)
        swal2 = jnp.full(H, 20., dtype)

    # ---- TKE budget coefficients (mod_mxlayr.F90:330-386)
    # (fma-contraction pin, see the t2_ent note below: tmxl feeds both
    # the TKE coefficients and the detrain-branch ML content)
    q12 = 1. / jnp.maximum(delp[0] + delp[1], epsilp)
    _t0d, _t1d, _s0d, _s1d = jax.lax.optimization_barrier(
        (ttem[0] * delp[0], ttem[1] * delp[1],
         ssal[0] * delp[0], ssal[1] * delp[1]))
    tmxl = (_t0d + _t1d) * q12
    smxl = (_s0d + _s1d) * q12
    alfa = -alpha0 * eos.dsigdt0(e, tmxl, smxl)
    beta = alpha0 * eos.dsigds0(e, tmxl, smxl)
    bfltot = grav * alpha0 * (alfa * forcing.surflx * cpi
                              - beta * (forcing.salflx - forcing.brnflx))
    bflpsw = grav * alpha0 * alfa * swfc2 * forcing.sswflx * cpi

    taux_p = .5 * (forcing.taux + grid.ip1(forcing.taux))
    tauy_p = .5 * (forcing.tauy + grid.jp1(forcing.tauy, 'v', True))
    ustar = jnp.sqrt(jnp.sqrt(taux_p ** 2 + tauy_p ** 2) / 1000.)
    ustar3 = ustar ** 3

    lui = jnp.abs(grid.coriop) * qag / (kappa
                                        * jnp.maximum(ustmin, ustar))
    lei = 1.0 / (onem * swal2)
    cus = par.rm0 * ustar3
    cni = (par.niwgf * par.niwbf * idkedt
           if idkedt is not None else jnp.zeros(H, dtype))
    cbftot = .5 * bfltot * qag
    cbfpsw = .5 * bflpsw * qag

    bg2 = _bg2(grid, e, s, n)
    rtau = 1. / par.tau_mlr
    rlf = 1. / par.lfmin
    f2 = grid.coriop * grid.coriop
    if par.mlrttp == 'variable':
        crs = (ci * par.ce * bg2 * qag ** 3
               * jnp.sqrt(grid.scp2 / (f2 + rtau * rtau)) * rlf)
    elif par.mlrttp == 'constant':
        crs = ci * par.ce * bg2 * qag ** 3 * jnp.sqrt(grid.scp2) \
            * rlf / cori20
    else:   # 'limited'
        crs = (ci * par.ce * bg2 * rlf * qag ** 3
               * jnp.sqrt(grid.scp2 / jnp.minimum(cori20 * cori20,
                                                  f2 + rtau * rtau)))

    # pin the fusion boundary around the TKE-source coefficients: XLA's
    # fusion (and with it FMA formation) for the big tke_terms DAG is
    # block-shape-dependent, which broke the bitwise mesh-factorization
    # invariance of the sharded step through the entrainment branch
    # selection (measured: 1-ulp mtkers differences seeding O(1) dpu
    # flips a step later).  The barrier makes the coefficient
    # computation its own fusion with shape-independent codegen.
    lui, lei, cus, cni, cbftot, cbfpsw, crs = jax.lax.optimization_barrier(
        (lui, lei, cus, cni, cbftot, cbfpsw, crs))

    def tke_terms(pmxl, floor_pm=False):
        """(tkew_wind_part, lbi): the pmxl-dependent sources
        (mod_mxlayr.F90:366-386)."""
        rm1 = jnp.exp(-lui * pmxl)
        qv = lei * (jnp.maximum(tencm, pmxl) if floor_pm else pmxl)
        rm3 = jnp.exp(-qv)
        rm4 = 2. / qv
        qb = cbftot - cbfpsw * (rm4 * (1. - rm3) - rm3)
        stab = qb >= 0.
        lbi = jnp.where(stab, lui * kappa / mu, lui)
        rm2 = jnp.where(stab, jnp.exp(-lbi * pmxl), rm1)
        us = cus * rm1
        ni = cni * rm1
        bf = qb * rm2 * pmxl
        rs = -crs * pmxl * pmxl * pmxl
        return us + ni + bf + rs, lbi, (us, ni, bf, rs)

    pmxl0 = pres[2]
    tkew0, lbi0, _ = tke_terms(pmxl0)

    detrain = (tkew0 < 0.) & (pmxl0 > mltmin * onem)
    shallow = (tkew0 < 0.) & ~detrain
    entrain = tkew0 >= 0.

    # ================== detrainment (mod_mxlayr.F90:388-454) =========
    # initial guess
    use_lbi = pres[2] * lbi0 > 1.
    pm_g = 1. / jnp.maximum(lbi0, 1e-30)
    dpm_g = jnp.minimum(jnp.minimum(pm_g - pres[0], pres[2] - pm_g),
                        tencm)
    pmxl_init = jnp.where(use_lbi, pm_g - .5 * dpm_g, pres[2] - tencm)
    dpmxl_init = jnp.where(use_lbi, dpm_g, jnp.full(H, -tencm, dtype))

    def newton_det(carry, it):
        pmxl, dpmxl, tkeo, done = carry
        tkew, lbi, _ = tke_terms(pmxl, floor_pm=True)
        first_special = (it == 0) & use_lbi
        dtke = (tkew - tkeo) / jnp.where(jnp.abs(dpmxl) < 1e-30, 1e-30,
                                         dpmxl)
        flat = jnp.abs(dtke) < (jnp.abs(tkew) + 1e-22) \
            / jnp.maximum(pres[2] - pres[0], epsilp)
        dp_new = jnp.where(
            flat,
            jnp.where(tkew < 0., .5 * (pres[0] - pmxl),
                      .5 * (pres[2] - pmxl)),
            jnp.maximum(pres[0] - pmxl,
                        jnp.minimum(pres[2] - pmxl,
                                    -tkew / jnp.where(jnp.abs(dtke)
                                                      < 1e-30, 1e-30,
                                                      dtke))))
        dp_new = jnp.where(first_special, dpmxl, dp_new)
        pmxl2 = jnp.where(done, pmxl, pmxl + dp_new)
        done2 = done | (jnp.abs(dp_new) < onemm)
        return (pmxl2, dp_new, tkew, done2), None

    (pmxl_det, _, _, _), _ = lax.scan(
        newton_det,
        (pmxl_init, dpmxl_init, tkew0, jnp.zeros(H, bool)),
        jnp.arange(maxitr))
    pmxl_det = jnp.maximum(mltmin * onem, pmxl_det)

    # ================== shallow branch (:802-824) ====================
    pmxl_sh = jnp.full(H, mltmin * onem, dtype)

    # ================== entrainment (:826-1019) ======================
    # mean ML velocity over layers 1-2 (at p-points, :833-848)
    def uvmean(k0, k1=None):
        du = s.dpu[n]
        dv = s.dpv[n]
        uu = s.u[n]
        vv = s.v[n]

        def at(k):
            un = uu[k] * du[k] + grid.ip1(uu[k] * du[k])
            ud = du[k] + grid.ip1(du[k])
            vn = vv[k] * dv[k] + grid.jp1(vv[k] * dv[k], 'v', True)
            vd = dv[k] + grid.jp1(dv[k], 'v', True)
            return un, ud, vn, vd
        un0, ud0, vn0, vd0 = at(k0)
        if k1 is not None:
            un1, ud1, vn1, vd1 = at(k1)
            un0, ud0 = un0 + un1, ud0 + ud1
            vn0, vd0 = vn0 + vn1, vd0 + vd1
        return (un0 / jnp.maximum(onecm, ud0),
                vn0 / jnp.maximum(onecm, vd0))

    um0, vm0 = uvmean(0, 1)
    uk_st, vk_st = [], []
    for k in range(kk):
        uu, vv = uvmean(k)
        uk_st.append(uu)
        vk_st.append(vv)
    uk_st = jnp.stack(uk_st)
    vk_st = jnp.stack(vk_st)

    def layer_tke(pmxl, prk, prk1, tk, sk, tm0, sm0, dpe0, dke0, uk, vk,
                  um, vm):
        """TKE with PE/KE terms while entraining within layer k
        (:877-916)."""
        tmx, smx, dpe, dke = entrain_energy(
            pres[0], prk, pmxl, tk, sk, tm0, sm0, dpe0, dke0, uk, vk,
            um, vm, delt1, par.rm5)
        tkew, lbi, _ = tke_terms(pmxl, floor_pm=True)
        return tkew - dpe + dke, tmx, smx, dpe, dke

    # walk layers: start at layer 2 bottom; absorb interior layers while
    # TKE remains positive; inside the terminating layer solve for pmxl
    # (one lax.scan over k so the Newton body is traced once).
    ntrc = s.trc.shape[1]
    trc_n = s.trc[n]                     # (ntrc, kk, H)

    def walk_body(carry, xs):
        (pm_e, tdps, sdps, trdps, tm0, sm0, um, vm, dpe0, dke0,
         active) = carry
        t_k, s_k, dp_k, trc_k, uk, vk, kfloat = xs
        in_layer = active & (kfpl <= kfloat + 1) & (dp_k >= epsilp)

        prk = pm_e
        prk1 = prk + dp_k
        tke_full, tmx_f, smx_f, dpe_f, dke_f = layer_tke(
            prk1, prk, prk1, t_k, s_k, tm0, sm0, dpe0, dke0, uk, vk,
            um, vm)
        absorb = in_layer & (tke_full >= 0.)

        def newton_ent(c, _):
            pmxl, dpmxl, tkeo, done = c
            tkew, _, _, _, _ = layer_tke(pmxl, prk, prk1, t_k, s_k,
                                         tm0, sm0, dpe0, dke0, uk, vk,
                                         um, vm)
            dtke = (tkew - tkeo) / jnp.where(jnp.abs(dpmxl) < 1e-30,
                                             1e-30, dpmxl)
            flat = jnp.abs(dtke) < (jnp.abs(tkew) + 1e-22) \
                / jnp.maximum(dp_k, epsilp)
            dp_new = jnp.where(
                flat,
                jnp.where(tkew < 0., .5 * (prk - pmxl), prk1 - pmxl),
                jnp.maximum(prk - pmxl,
                            jnp.minimum(prk1 - pmxl,
                                        -tkew / jnp.where(
                                            jnp.abs(dtke) < 1e-30,
                                            1e-30, dtke))))
            dp_new = jnp.maximum(
                jnp.maximum(mltmin * onem, prk) - pmxl, dp_new)
            pmxl2 = jnp.where(done, pmxl, pmxl + dp_new)
            done2 = done | (jnp.abs(dp_new) < onemm)
            return (pmxl2, dp_new, tkew, done2), None

        pm_init = prk + jnp.minimum(tencm, .5 * dp_k)
        (pm_part, _, _, _), _ = lax.scan(
            newton_ent,
            (pm_init, jnp.minimum(tencm, .5 * dp_k),
             jnp.zeros(H, dtype), jnp.zeros(H, bool)),
            None, length=maxitr)
        pm_part = jnp.clip(pm_part, prk, prk1)
        partial = in_layer & ~absorb

        take = jnp.where(absorb, dp_k,
                         jnp.where(partial, pm_part - prk, 0.))
        pm_e = jnp.where(absorb, prk1, jnp.where(partial, pm_part,
                                                 pm_e))
        tdps = tdps + t_k * take
        sdps = sdps + s_k * take
        trdps = trdps + trc_k * take[None]

        tm0 = jnp.where(absorb, tmx_f, tm0)
        sm0 = jnp.where(absorb, smx_f, sm0)
        dpe0 = jnp.where(absorb, dpe_f, dpe0)
        dke0 = jnp.where(absorb, dke_f, dke0)
        denom = jnp.maximum(pm_e - pres[0], epsilp)
        um = jnp.where(absorb,
                       (um * (prk - pres[0]) + uk * (pm_e - prk))
                       / denom, um)
        vm = jnp.where(absorb,
                       (vm * (prk - pres[0]) + vk * (pm_e - prk))
                       / denom, vm)
        active = active & ~partial
        return (pm_e, tdps, sdps, trdps, tm0, sm0, um, vm, dpe0, dke0,
                active), take

    walk_init = (
        pres[2],
        ttem[1] * delp[1],
        ssal[1] * delp[1],
        trc_n[:, 1] * delp[1][None],
        jnp.where(delp[0] + delp[1] > epsilp, tmxl, ttem[0]),
        jnp.where(delp[0] + delp[1] > epsilp, smxl, ssal[0]),
        um0, vm0,
        jnp.zeros(H, dtype), jnp.zeros(H, dtype),
        entrain)
    kfloats = jnp.arange(2, kk, dtype=jnp.int32).reshape(
        (kk - 2,) + (1,) * len(H)) + jnp.zeros((1,) + H, jnp.int32)
    xs_walk = (ttem[2:], ssal[2:], delp[2:],
               jnp.moveaxis(trc_n[:, 2:], 1, 0), uk_st[2:], vk_st[2:],
               kfloats)
    (pm_e, tdps, sdps, trdps_st, _, _, _, _, dpe_fin, dke_fin,
     _), takes = lax.scan(walk_body, walk_init, xs_walk)
    delp_ent = delp.at[2:].add(-takes)
    trdps = [trdps_st[t] for t in range(ntrc)]

    pmxl_ent = jnp.minimum(pres[kk], pm_e)

    # ================== combine branches =============================
    pmxl = jnp.where(detrain, pmxl_det,
                     jnp.where(shallow, pmxl_sh, pmxl_ent))

    # -- rebuild the column ------------------------------------------
    # entrainment/shallow: layers up to pmxl join layer 2 (tdps sums);
    # detrainment: ML shrinks, fossil water assigned to its class.
    dptopl = jnp.minimum(thktop * onem, .5 * (pmxl - pres[0]))

    # --- branch D (detrain): fossil layer content
    dpfsl = jnp.maximum(pres[2] - pmxl_det, 0.)
    below2 = pmxl_det < pres[1]
    qf = 1. / jnp.maximum(dpfsl, epsilp)
    # fma-contraction pins (see t2_ent note): product-into-sum chains
    # whose contraction XLA:CPU decides per block shape
    _tf1, _tf0, _sf1, _sf0 = jax.lax.optimization_barrier(
        (ttem[1] * delp[1],
         ttem[0] * jnp.maximum(pres[1] - pmxl_det, 0.),
         ssal[1] * delp[1],
         ssal[0] * jnp.maximum(pres[1] - pmxl_det, 0.)))
    tfsl = jnp.where(below2, (_tf1 + _tf0) * qf, ttem[1])
    sfsl = jnp.where(below2, (_sf1 + _sf0) * qf, ssal[1])
    sigfsl = eos.sig(e, tfsl, sfsl)

    # density class for the fossil water: deepest k in [2, kk-1] with
    # densr <= sigfsl, not above kfpl-1's position (:695-800 condensed)
    fits = (densr <= sigfsl[None]) & (kidx >= 2)
    kdet = jnp.clip(jnp.max(jnp.where(fits, kidx, 2), axis=0), 2, kk - 1)

    # --- shallow branch: absorb interior mass into the ML up to mltmin
    take_sh = jnp.clip(jnp.minimum(pmxl_sh[None], pres[1:]) - pres[:-1],
                       0., delp) * (kidx >= 2)
    _td1, _sd1 = jax.lax.optimization_barrier(
        (ttem[1] * delp[1], ssal[1] * delp[1]))
    tdps_sh = _td1 + ksum(ttem * take_sh, axis=0)
    sdps_sh = _sd1 + ksum(ssal * take_sh, axis=0)

    # --- assemble new columns per branch
    # detrain: ML = [dptopl, pmxl-dptopl]; interior gains fossil at kdet
    ml_t_det = tmxl
    ml_s_det = smxl
    delp_det = delp
    gets = (kidx == kdet[None]) & detrain[None] & (dpfsl[None] > 0.)
    wnew = jnp.where(gets,
                     dpfsl[None] / jnp.maximum(delp + dpfsl[None],
                                               epsilp), 0.)
    ttem_det, ssal_det = jax.lax.optimization_barrier(
        (ttem * (1. - wnew) + tfsl[None] * wnew,
         ssal * (1. - wnew) + sfsl[None] * wnew))
    delp_det = delp + jnp.where(gets, dpfsl[None], 0.)

    # entrain/shallow: interior layers lose entrained mass
    tdps_e = jnp.where(shallow, tdps_sh, tdps)
    sdps_e = jnp.where(shallow, sdps_sh, sdps)
    delp_ent = jnp.where(shallow[None],
                         delp - take_sh * (kidx >= 2), delp_ent)
    # ML content after entrainment: everything between the skin and pmxl
    ml_mass = jnp.maximum(delp[0] + jnp.maximum(pmxl - pres[1], 0.),
                          epsilp)
    # barrier: forbid fma-contraction of the skin-layer product into
    # the sum — XLA:CPU's contraction choice here varied with the
    # shard_map block shape (measured 1-ulp t2_ent differences), which
    # breaks the bitwise mesh-invariance contract
    _tp0, _sp0 = jax.lax.optimization_barrier(
        (ttem[0] * delp[0], ssal[0] * delp[0]))
    t2_ent = (tdps_e + _tp0) / ml_mass
    s2_ent = (sdps_e + _sp0) / ml_mass

    ent_like = entrain | shallow
    ttem_new = jnp.where(ent_like[None], ttem, ttem_det)
    ssal_new = jnp.where(ent_like[None], ssal, ssal_det)
    delp_new = jnp.where(ent_like[None], delp_ent, delp_det)

    ml_t = jnp.where(ent_like, t2_ent, ml_t_det)
    ml_s = jnp.where(ent_like, s2_ent, ml_s_det)

    # skin/remainder split of the new ML
    dp0 = dptopl
    dp1 = jnp.maximum(pmxl - pres[0] - dptopl, 0.)
    delp_new = delp_new.at[0].set(dp0 * ip).at[1].set(dp1 * ip)
    ttem_new = ttem_new.at[0].set(ml_t).at[1].set(ml_t)
    ssal_new = ssal_new.at[0].set(ml_s).at[1].set(ml_s)

    # tracers go through the same redistribution (ttrc of the
    # reference: entrained tracer mass joins the ML; detrained fossil
    # water carries tracer into its density class)
    if ntrc:
        trc_new = trc_n
        trdps_sh = (trc_n[:, 1] * delp[1][None]
                    + ksum(trc_n * take_sh[None], axis=1))
        trdps_e = jnp.where(shallow[None],
                            trdps_sh, jnp.stack(trdps)) \
            if ntrc else None
        trml = (trdps_e + jax.lax.optimization_barrier(
            trc_n[:, 0] * delp[0][None])) / ml_mass[None]
        trfsl = trc_n[:, 1]
        wnew_t = wnew[None]
        trc_det = jax.lax.optimization_barrier(
            trc_n * (1. - wnew_t) + trfsl[:, None] * wnew_t)
        trc_new = jnp.where(ent_like[None, None], trc_n, trc_det)
        trc_new = trc_new.at[:, 0].set(
            jnp.where(ent_like[None], trml, trc_n[:, 0]))
        trc_new = trc_new.at[:, 1].set(
            jnp.where(ent_like[None], trml, trc_n[:, 1]))
        s = dataclasses.replace(
            s, trc=s.trc.at[n].set(trc_new * ip[None, None]))

    # ---- apply forcing (:1162-1196): penetrating shortwave below the
    # skin with the swfc2/swal2 exponential profile, capped at swamxd
    pradd = par.swamxd * onem
    pres_new = cumulative_p(delp_new) * ip
    psw_at = lambda pp: swfc2 * jnp.exp(-lei * jnp.minimum(pradd, pp))
    pswbas = swfc2 * jnp.exp(-lei * delp_new[0])
    psw_up = psw_at(pres_new[1:-1])           # (kk-1, H) below layer 1
    psw_lo = psw_at(pres_new[2:])
    dsw = jnp.concatenate([jnp.zeros((1,) + H, dtype),
                           psw_up - psw_lo], axis=0)   # (kk, H)
    # The forcing corrections are barrier-pinned before they enter the
    # temperature/salinity sums: XLA:CPU's fma-contraction choices for
    # these product-into-sum chains vary with the shard_map block
    # shape, breaking the bitwise mesh-invariance contract (measured
    # 1-ulp ttem differences; same class as the t2_ent pin above).
    heat_pen = jax.lax.optimization_barrier(
        dsw * forcing.sswflx[None] * dtg * cpi
        / jnp.maximum(delp_new, epsilp))
    ttem_new = ttem_new - jnp.where(delp_new > onemu, heat_pen, 0.)
    # top layer: total non-penetrating heat + salt
    pswtail = psw_at(pres_new[kk])
    q0 = dtg / jnp.maximum(delp_new[0], epsilp)
    corr_t0, corr_s0, corr_s1 = jax.lax.optimization_barrier((
        (forcing.surflx - (pswbas - pswtail) * forcing.sswflx
         + forcing.surrlx) * q0 * cpi,
        (forcing.salflx - forcing.brnflx + forcing.salrlx) * q0,
        forcing.brnflx * dtg / jnp.maximum(delp_new[1], epsilp)))
    ttem_new = ttem_new.at[0].add(-corr_t0)
    ssal_new = ssal_new.at[0].add(-corr_s0)
    # brine flux into layer 2 (condensed brine plume)
    ssal_new = ssal_new.at[1].add(-corr_s1)

    ssal_new = jnp.maximum(ssal_new, 0.)
    sigma_new = eos.sig(e, ttem_new, ssal_new) * ip

    # ---- mtke diagnostics at the final mixed-layer depth
    # (mod_mxlayr.F90 mtkeus/mtkeni/mtkebf/mtkers/mtkepe/mtkeke)
    if dfl is not None:
        _, _, (t_us, t_ni, t_bf, t_rs) = tke_terms(pmxl, floor_pm=True)
        mtke = jnp.stack([t_us, t_ni, t_bf, t_rs,
                          jnp.where(entrain, -dpe_fin, 0.),
                          jnp.where(entrain, dke_fin, 0.)]) * ip[None]
        dfl = dataclasses.replace(dfl, mtke=mtke)

    # ---- first physical layer (:1205-1218): first k >= 2 with mass
    haskm = (delp_new * (kidx >= 2)) > epsilp
    kfpl_new = jnp.where(jnp.any(haskm, axis=0),
                         jnp.argmax(haskm, axis=0),
                         kk).astype(s.kfpla.dtype)

    s = dataclasses.replace(
        s,
        temp=s.temp.at[n].set(ttem_new * ip),
        saln=s.saln.at[n].set(ssal_new * ip),
        dp=s.dp.at[n].set(jnp.maximum(delp_new, 0.) * ip),
        sigma=s.sigma.at[n].set(sigma_new),
        kfpla=s.kfpla.at[n].set(kfpl_new))
    if _TAP is not None:
        _TAP.update(dict(
            bg2=bg2, crs=crs, tkew0=tkew0,
            pmxl_det=pmxl_det, pmxl_sh=pmxl_sh, pm_e=pm_e,
            tdps=tdps, sdps=sdps, takes=takes, pmxl=pmxl,
            dpe_fin=dpe_fin, dke_fin=dke_fin,
            ttem_new=ttem_new, delp_new=delp_new,
            tfsl=tfsl, take_sh=take_sh, tdps_sh=tdps_sh,
            t2_ent=t2_ent, ml_t=ml_t, dsw=dsw, heat_pen=heat_pen,
            pswbas=pswbas))
    return s if dfl is None else (s, dfl)


#: debug tap (tests only): set to a dict to capture intermediates
_TAP = None
