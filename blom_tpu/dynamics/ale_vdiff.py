"""Vertical diffusion of tracers and momentum (ALE path).

TPU-native re-design of the reference implicit vertical diffusion
(reference: /root/reference/phy/mod_ale_vdiff.F90).  Backward-Euler
tridiagonal solves per column, vectorized over the horizontal: the
forward elimination / back substitution become `lax.scan`s over k with
all columns in the batch dimensions — identical arithmetic to the
reference's in-line Thomas algorithm (mod_ale_vdiff.F90:106-176)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from ..core import eos
from ..core.constants import grav, spcifh, alpha0, onem
from ..core.grid import Grid
from ..core.state import State
from ..phys.forcing import Forcing
from ..phys.vmix import VmixFields

dpmin_vdiff = 0.1 * onem   # (mod_ale_vdiff.F90:44)


def _thomas(dp_c, fp, rhs):
    """Solve the tridiagonal system
      -fp(k)*X(k-1) + (dp(k)+fp(k)+fp(k+1))*X(k) - fp(k+1)*X(k+1) = rhs(k)
    with fp (kk, H), fp[0] = 0 implied surface, batched over trailing
    dims (mod_ale_vdiff.F90:97-176's elimination, generalized)."""
    kk = dp_c.shape[0]
    fp_next = jnp.concatenate([fp[1:], jnp.zeros_like(fp[:1])], axis=0)

    def fwd(carry, xs):
        bei_prev, x_prev = carry
        dpk, fpk, fpk1, r = xs
        gam = -fpk * bei_prev
        bei = 1.0 / (dpk + fpk * (1.0 + gam) + fpk1)
        x = (r + fpk * x_prev) * bei
        return (bei, x), (x, gam)

    bei0 = 1.0 / (dp_c[0] + fp_next[0])
    x0 = rhs[0] * bei0
    (_, _), (xs, gams) = lax.scan(
        fwd, (bei0, x0),
        (dp_c[1:], fp[1:], fp_next[1:], rhs[1:]), unroll=8)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    gams = jnp.concatenate([jnp.zeros_like(gams[:1]), gams], axis=0)

    def back(x_next, xs_):
        xk, gamk1 = xs_
        x = xk - gamk1 * x_next
        return x, x

    _, out_rev = lax.scan(back, xs[-1], (xs[:-1], gams[1:]), reverse=True,
                          unroll=8)
    return jnp.concatenate([out_rev, xs[-1:]], axis=0)


def ale_vdifft(grid: Grid, e: eos.EosParams, s: State, forcing: Forcing,
               vf: VmixFields, m: int, n: int, delt1) -> State:
    """Implicit vertical diffusion of T/S with surface-flux application
    (ale_vdifft, mod_ale_vdiff.F90:51-238)."""
    kk = grid.kk
    ip = grid.ip
    dp_c = s.dp[n]
    cpi = 1.0 / spcifh
    dtg = delt1 * grav
    c = grav * grav * delt1 / (alpha0 * alpha0)

    fpbase = jnp.concatenate(
        [jnp.zeros_like(dp_c[:1]),
         c / jnp.maximum(dpmin_vdiff, .5 * (dp_c[:-1] + dp_c[1:]))], axis=0)

    hfsw = forcing.sswflx
    hfns = forcing.surflx - hfsw
    hfrs = forcing.surrlx
    sfbr = forcing.brnflx
    sfnb = forcing.salflx - sfbr
    sfrs = forcing.salrlx

    def dnl(nl):
        return nl[:-1] - nl[1:]

    fp_t = vf.Kdiff_t * fpbase
    rhs_t = dp_c * s.temp[n] - (dnl(vf.t_ns_nonloc) * hfns
                                + dnl(vf.t_sw_nonloc) * hfsw
                                + dnl(vf.t_rs_nonloc) * hfrs) * dtg * cpi
    temp_new = _thomas(dp_c + 1e-30, fp_t, rhs_t) * ip

    fp_s = vf.Kdiff_s * fpbase
    rhs_s = dp_c * s.saln[n] - (dnl(vf.s_nb_nonloc) * sfnb
                                + dnl(vf.s_br_nonloc) * sfbr
                                + dnl(vf.s_rs_nonloc) * sfrs) * dtg
    saln_new = _thomas(dp_c + 1e-30, fp_s, rhs_s)
    saln_new = jnp.maximum(0., saln_new) * ip

    sigma_new = eos.sig(e, temp_new, saln_new) * ip

    ntr = s.trc.shape[1]
    if ntr:
        # tracers diffuse with the temperature diffusivity and zero
        # surface flux (mod_ale_vdiff.F90:178-216; trflx is zero for all
        # idealized configs)
        trc_news = []
        for nt in range(ntr):
            tr_new = _thomas(dp_c + 1e-30, fp_t, dp_c * s.trc[n, nt])
            trc_news.append(jnp.maximum(0., tr_new) * ip)
        s = dataclasses.replace(
            s, trc=s.trc.at[n].set(jnp.stack(trc_news, axis=0)))

    return dataclasses.replace(
        s,
        temp=s.temp.at[n].set(temp_new),
        saln=s.saln.at[n].set(saln_new),
        sigma=s.sigma.at[n].set(sigma_new))


def ale_vdiffm(grid: Grid, s: State, vf: VmixFields, m: int, n: int,
               delt1) -> State:
    """Implicit vertical diffusion of baroclinic velocity (ale_vdiffm,
    mod_ale_vdiff.F90:240-376)."""
    c = grav * grav * delt1 / (alpha0 * alpha0)

    dpu_c = s.dpu[n]
    nuv_u = .5 * (grid.im1(vf.Kvisc_m) + vf.Kvisc_m)
    fp_u = jnp.concatenate(
        [jnp.zeros_like(dpu_c[:1]),
         nuv_u[1:] * c / jnp.maximum(dpmin_vdiff,
                                     .5 * (dpu_c[:-1] + dpu_c[1:]))], axis=0)
    u_new = _thomas(dpu_c + 1e-30, fp_u, dpu_c * s.u[n]) * grid.iu

    dpv_c = s.dpv[n]
    nuv_v = .5 * (grid.jm1(vf.Kvisc_m) + vf.Kvisc_m)
    fp_v = jnp.concatenate(
        [jnp.zeros_like(dpv_c[:1]),
         nuv_v[1:] * c / jnp.maximum(dpmin_vdiff,
                                     .5 * (dpv_c[:-1] + dpv_c[1:]))], axis=0)
    v_new = _thomas(dpv_c + 1e-30, fp_v, dpv_c * s.v[n]) * grid.iv

    return dataclasses.replace(
        s, u=s.u.at[n].set(u_new), v=s.v.at[n].set(v_new))
