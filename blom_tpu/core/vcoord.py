"""Vertical-coordinate reference densities: Bezier sigma profiles and
the adaptive reference density (sigref_adapt) machinery.

TPU-native counterpart of the reference module
(/root/reference/phy/mod_vcoord.F90): the cubic-Bezier-plus-parabolas
reference-density generator (sigma_fun :172-269, cubic_root :153-170)
and the sigref adaption system (sra_update :354-405 time filters,
sra_find_ml_dmax :406-470, sra_accumulate :472-573 ML statistics,
sra_cost :272-312 and the finite-difference (sp1, zp2) optimization of
sra_optimize :575-800).

The generator is jnp-traceable in the varying parameters (sp1, zp2,
sp4, s_bot) with static geometry (z_top/z_bot/kmax), so sra_update can
run inside the jitted step; Newton iterations for the Bezier parameter
run a fixed trip count.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

T_TOL_ITERS = 30


class SigmaFunSpec(NamedTuple):
    """Parameters of the reference-density function
    (sigma_fun_spec_type, mod_vcoord.F90:100-140)."""
    sp1: float = 22.        # sigma at the top Bezier point
    zp2: float = .3         # z of the 2nd Bezier control point
    zp3: float = .7         # z of the 3rd Bezier control point
    sp4: float = 37.2       # sigma at the bottom Bezier point
    dsdz_bot: float = .1    # d(sigma)/dz at the bottom
    s_top: float = 20.      # surface parabola value (z_top > 0 only)
    z_top: float = 0.       # top parabola end (0 = none)
    s_bot: float = 37.25    # bottom parabola value (z_bot < 1 only)
    z_bot: float = 1.       # bottom parabola start (1 = none)


def cubic_root(a, b, c, d, x_ini):
    """Newton iteration for a root of ax^3+bx^2+cx+d
    (cubic_root, mod_vcoord.F90:153-170), fixed trip count."""
    def body(_, x):
        f = ((a * x + b) * x + c) * x + d
        df = (3. * a * x + 2. * b) * x + c
        return x - f / jnp.where(jnp.abs(df) > 1e-14, df,
                                 jnp.where(df >= 0., 1e-14, -1e-14))
    return jax.lax.fori_loop(0, T_TOL_ITERS, body, x_ini * 1.)


def sigma_fun(spec: SigmaFunSpec, kmax: int):
    """Reference potential densities (sigma_fun,
    mod_vcoord.F90:172-269): cubic Bezier in (z, sigma) matched with
    optional top/bottom parabolas."""
    z_eps = 1e-6
    ktt = int(spec.z_top * (kmax - 1)) + 1 if spec.z_top > z_eps else 0
    ktb = (int(spec.z_bot * (kmax - 1)) + 2
           if spec.z_bot < 1. - z_eps else kmax + 1)

    sp1 = jnp.asarray(spec.sp1, jnp.float64)
    zp2 = jnp.asarray(spec.zp2, jnp.float64)
    sp4 = jnp.asarray(spec.sp4, jnp.float64)
    s_bot = jnp.asarray(spec.s_bot, jnp.float64)

    zp1, zp3, zp4 = 0., spec.zp3, 1.
    sp2 = sp4 - spec.dsdz_bot * (1. - zp2)
    sp3 = sp4 - spec.dsdz_bot * (1. - zp3)

    az = -zp1 + 3. * zp2 - 3. * zp3 + zp4
    bz = 3. * zp1 - 6. * zp2 + 3. * zp3
    cz = -3. * zp1 + 3. * zp2
    as_ = -sp1 + 3. * sp2 - 3. * sp3 + sp4
    bs = 3. * sp1 - 6. * sp2 + 3. * sp3
    cs = -3. * sp1 + 3. * sp2
    ds = sp1

    zs = jnp.arange(kmax, dtype=jnp.float64) / (kmax - 1)

    def bez_at(z, t0):
        t = cubic_root(az, bz, cz, zp1 - z, t0)
        return ((as_ * t + bs) * t + cs) * t + ds, t

    # Bezier interior (sequential Newton warm starts -> scan)
    def body(t, z):
        val, t2 = bez_at(z, t)
        return t2, val
    _, sig_bez = jax.lax.scan(body, jnp.asarray(0., jnp.float64), zs)
    sig = sig_bez

    if ktt > 0:
        # top parabola matching the Bezier at z_top (":233-249")
        ft, t = bez_at(jnp.asarray(spec.z_top, jnp.float64),
                       jnp.asarray(0., jnp.float64))
        dft = (((3. * as_ * t + 2. * bs) * t + cs)
               / ((3. * az * t + 2. * bz) * t + cz))
        f0 = spec.s_top
        q1 = 1. / spec.z_top
        q2 = (f0 - ft) * q1
        a = (dft + q2) * q1
        b = -(dft + 2. * q2)
        top = (a * zs + b) * zs + f0
        sig = jnp.where(jnp.arange(kmax) < ktt, top, sig)

    if ktb <= kmax:
        # bottom parabola matching at z_bot (":251-268")
        ft, t = bez_at(jnp.asarray(spec.z_bot, jnp.float64),
                       jnp.asarray(1., jnp.float64))
        dft = (((3. * as_ * t + 2. * bs) * t + cs)
               / ((3. * az * t + 2. * bz) * t + cz))
        f0 = s_bot
        zb = spec.z_bot
        q1 = 1. / (1. - zb) ** 2
        a = ((zb - 1.) * dft + f0 - ft) * q1
        b = (-(dft * zb + 2. * (f0 - ft)) * zb + dft) * q1
        c = (((f0 + dft) * zb - 2. * ft - dft) * zb + ft) * q1
        bot = (a * zs + b) * zs + c
        sig = jnp.where(jnp.arange(kmax) >= ktb - 1, bot, sig)

    return sig


# ------------------------------------------------------------------ #
# sigref adaption (sra_*)
# ------------------------------------------------------------------ #

SRA_TLEV_NUM = 12    # monthly climatology bins


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SraState:
    """Adaption accumulators (mod_vcoord.F90:300-352 declarations)."""
    dpml_dmax: jax.Array     # (J, I) daily max ML thickness [Pa]
    sigmlb_dmax: jax.Array   # (J, I) density at ML base at daily max
    dpml_sum: jax.Array      # (T, J, I) per-bin sums
    sigmlb_sum: jax.Array
    tlev_accnum: jax.Array   # (T,) int
    dpml_clim: jax.Array     # (T, J, I) climatology
    sigmlb_clim: jax.Array
    has_clim: jax.Array      # (T, J, I) bool-ish


def init_sra(shape, dtype=jnp.float64) -> SraState:
    H = tuple(shape)
    z = jnp.zeros(H, dtype)
    zt = jnp.zeros((SRA_TLEV_NUM,) + H, dtype)
    return SraState(dpml_dmax=z, sigmlb_dmax=z, dpml_sum=zt,
                    sigmlb_sum=zt,
                    tlev_accnum=jnp.zeros(SRA_TLEV_NUM, jnp.int32),
                    dpml_clim=zt, sigmlb_clim=zt,
                    has_clim=jnp.zeros((SRA_TLEV_NUM,) + H, dtype))


def sra_find_ml_dmax(sra: SraState, dpml, sigmlb) -> SraState:
    """Track the daily maximum mixed-layer thickness and the density
    at its base (sra_find_ml_dmax, mod_vcoord.F90:406-470)."""
    deeper = dpml > sra.dpml_dmax
    return dataclasses.replace(
        sra,
        dpml_dmax=jnp.where(deeper, dpml, sra.dpml_dmax),
        sigmlb_dmax=jnp.where(deeper, sigmlb, sra.sigmlb_dmax))


def sra_accumulate(sra: SraState, tlev: int) -> SraState:
    """End-of-day accumulation into climatology bin tlev
    (sra_accumulate, mod_vcoord.F90:472-573, ML part)."""
    return dataclasses.replace(
        sra,
        dpml_sum=sra.dpml_sum.at[tlev].add(sra.dpml_dmax),
        sigmlb_sum=sra.sigmlb_sum.at[tlev].add(sra.sigmlb_dmax),
        tlev_accnum=sra.tlev_accnum.at[tlev].add(1),
        dpml_dmax=jnp.zeros_like(sra.dpml_dmax),
        sigmlb_dmax=jnp.zeros_like(sra.sigmlb_dmax))


def sra_update_clim(sra: SraState, sra_clim_ts: float = 5.) -> SraState:
    """End-of-year climatology time filter (sra_optimize first block,
    mod_vcoord.F90:600-635)."""
    wgt = 1. / (sra_clim_ts + 1.)
    q = 1. / jnp.maximum(sra.tlev_accnum, 1)[:, None, None]
    new_dp = sra.dpml_sum * q
    new_sg = sra.sigmlb_sum * q
    have = sra.has_clim > 0.
    dp_clim = jnp.where(have, (1. - wgt) * sra.dpml_clim + wgt * new_dp,
                        new_dp)
    sg_clim = jnp.where(have, (1. - wgt) * sra.sigmlb_clim
                        + wgt * new_sg, new_sg)
    return dataclasses.replace(
        sra, dpml_clim=dp_clim, sigmlb_clim=sg_clim,
        has_clim=jnp.ones_like(sra.has_clim),
        dpml_sum=jnp.zeros_like(sra.dpml_sum),
        sigmlb_sum=jnp.zeros_like(sra.sigmlb_sum),
        tlev_accnum=jnp.zeros_like(sra.tlev_accnum))


def sra_cost(plevel, sigref, sra: SraState, wgt, mask):
    """Deviation of the constant-pressure-level ML thickness from the
    observed climatological ML thickness (sra_cost,
    mod_vcoord.F90:272-312): sum over bins of
    log(dpml_plev/dpml)^2 * weight."""
    kdm = sigref.shape[0]
    sgl = sra.sigmlb_clim                       # (T, J, I)
    idx = jnp.clip(jnp.searchsorted(sigref, sgl.reshape(-1))
                   .reshape(sgl.shape), 1, kdm - 1)
    s0 = sigref[idx - 1]
    s1 = sigref[idx]
    w = jnp.clip((sgl - s0) / jnp.maximum(s1 - s0, 1e-12), 0., 1.)
    dpml_plev = (1. - w) * plevel[idx - 1] + w * plevel[idx]
    valid = (sra.dpml_clim > 0.) & (mask[None] > 0.)
    logdiff = jnp.log(jnp.maximum(dpml_plev, 1e-12)
                      / jnp.maximum(sra.dpml_clim, 1e-12))
    return jnp.sum(jnp.where(valid, logdiff ** 2 * wgt[None], 0.))


def sra_optimize_sp1_zp2(spec: SigmaFunSpec, plevel, sra: SraState,
                         wgt, mask, kdm: int, niter: int = 20,
                         lr=(.05, .005)) -> SigmaFunSpec:
    """Fixed-iteration descent on (sp1, zp2) with central-difference
    gradients (sra_cost_grad + the Adam loop of sra_optimize,
    mod_vcoord.F90:640-760, simplified to plain gradient descent with
    fixed step sizes)."""
    dx = jnp.asarray([.01, .001])
    x = jnp.asarray([spec.sp1, spec.zp2])

    def cost_at(x):
        sp = spec._replace(sp1=x[0], zp2=x[1])
        return sra_cost(plevel, sigma_fun(sp, kdm), sra, wgt, mask)

    lr = jnp.asarray(lr)

    def body(_, x):
        g0 = (cost_at(x + jnp.asarray([dx[0] / 2, 0.]))
              - cost_at(x - jnp.asarray([dx[0] / 2, 0.]))) / dx[0]
        g1 = (cost_at(x + jnp.asarray([0., dx[1] / 2]))
              - cost_at(x - jnp.asarray([0., dx[1] / 2]))) / dx[1]
        g = jnp.asarray([g0, g1])
        x = x - lr * jnp.tanh(g)
        return jnp.asarray([x[0], jnp.clip(x[1], .05, .6)])

    x = jax.lax.fori_loop(0, niter, body, x)
    return spec._replace(sp1=x[0], zp2=x[1])


def sra_update_filter(spec, spec_old, spec_new, frac_of_year,
                      baclin: float, nday_in_year: float = 365.,
                      ts1: float = 5., ts2: float = 10.):
    """Per-step time filter blending the adapted parameters
    (sra_update, mod_vcoord.F90:354-405).  Returns the filtered
    spec."""
    w0 = frac_of_year
    w1 = baclin / (86400. * nday_in_year * ts1 + baclin)
    w2 = baclin / (86400. * nday_in_year * ts2 + baclin)
    sp1_t = (1. - w0) * spec_old.sp1 + w0 * spec_new.sp1
    zp2_t = (1. - w0) * spec_old.zp2 + w0 * spec_new.zp2
    sp4_t = (1. - w0) * spec_old.sp4 + w0 * spec_new.sp4
    s_bot_t = (1. - w0) * spec_old.s_bot + w0 * spec_new.s_bot
    return spec._replace(
        sp1=(1. - w1) * spec.sp1 + w1 * sp1_t,
        zp2=(1. - w1) * spec.zp2 + w1 * zp2_t,
        sp4=(1. - w2) * spec.sp4 + w2 * sp4_t,
        s_bot=(1. - w2) * spec.s_bot + w2 * s_bot_t)
