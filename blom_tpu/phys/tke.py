"""k-epsilon / GLS second-order turbulence closure.

TPU-native counterpart of the reference closure: constants and derived
coefficients from /root/reference/phy/mod_tke.F90:36-165 (initke), and
the per-column TKE/GLS update + Canuto-A stability functions embedded
in the isopycnic diffusivity estimator
(/root/reference/phy/mod_difest.F90:2641-2975, difest_isobml TKE
branch).  TKE and the generic length scale psi are carried as tracers
(itrtke/itrgls slots of the trc block) so they ride the same advection
as everything else (meson turbclo option, meson.build:96-113).

All conditionals become jnp.where over dense columns; the
quasi-implicit source/sink update (Patankar form) is elementwise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.constants import alpha0, epsilp, grav, onem

# mod_tke.F90:37-58
gls_cmu0 = .527
Pr_t = 1.
zos = .0002
gls_p = 3.
gls_m = 1.5
gls_n = -1.
gls_c1 = 1.44
gls_c2 = 1.92
gls_c3plus = 1.
gls_c3minus = -.63
_L1, _L2, _L3, _L4 = .107, .0032, .0864, .12
_L5, _L6, _L7, _L8 = 11.9, .4, .0, .48
gls_Gh0 = .0329
gls_Ghmin = -.28
gls_Ghcri = .03
vonKar = .4

tke_min = 7.6e-8
gls_psi_min = 1.e-14
Ls_unlmt_min = 1.e-8

# derived coefficients (initke, mod_tke.F90:135-160)
sqrt2 = 2. ** .5
cmu_fac1 = gls_cmu0 ** (-gls_p / gls_n)
cmu_fac2 = gls_cmu0 ** (3. + gls_p / gls_n)
cmu_fac3 = sqrt2
tke_exp1 = gls_m / gls_n
gls_exp1 = 1. / gls_n
gls_fac6 = 8. / gls_cmu0 ** 6
gls_s0 = 1.5 * _L1 * _L5 ** 2
gls_s1 = (-_L4 * (_L6 + _L7)
          + 2. * _L4 * _L5 * (_L1 - _L2 / 3. - _L3)
          + 1.5 * _L1 * _L5 * _L8)
gls_s2 = -3. / 8. * _L1 * (_L6 ** 2 - _L7 ** 2)
gls_s4 = 2. * _L5
gls_s5 = 2. * _L4
gls_s6 = (2. / 3. * _L5 * (3. * _L3 ** 2 - _L2 ** 2)
          - .5 * _L5 * _L1 * (3. * _L3 - _L2)
          + .75 * _L1 * (_L6 - _L7))
gls_b0 = 3. * _L5 ** 2
gls_b1 = _L5 * (7. * _L4 + 3. * _L8)
gls_b2 = (_L5 ** 2 * (3. * _L3 ** 2 - _L2 ** 2)
          - .75 * (_L6 ** 2 - _L7 ** 2))
gls_b3 = _L4 * (4. * _L4 + 3. * _L8)
gls_b4 = (_L4 * (_L2 * _L6 - 3. * _L3 * _L7
                 - _L5 * (_L2 ** 2 - _L3 ** 2))
          + _L5 * _L8 * (3. * _L3 ** 2 - _L2 ** 2))
gls_b5 = .25 * (_L2 ** 2 - 3. * _L3 ** 2) * (_L6 ** 2 - _L7 ** 2)


class TkeParams(NamedTuple):
    """Runtime switches of the TKE branch (mod_difest.F90:174-196)."""
    use_gls: bool = True       # prognostic psi (GLS) vs diagnostic
    nug0: float = 2.5e-1       # max gravity-current diffusivity [m2/s]
    ustmin: float = .001       # min bottom friction velocity [m/s]
    tkepf: float = 0.          # fraction of surface TKE penetrating
    tkepls: float = 20. * onem  # penetration length scale [Pa]


def init_tke_tracers(trc, itrtke: int, itrgls: int):
    """Initialize TKE/GLS tracer slots (initke, mod_tke.F90:105-117)."""
    trc = trc.at[:, itrtke].set(tke_min)
    trc = trc.at[:, itrgls].set(gls_psi_min)
    return trc


def tke_gls_update(tke, gls, difdia, du2l, bvfsq, dp_k, p_i, ustar,
                   ustarb, kmax, delt1, par: TkeParams):
    """One quasi-implicit TKE(/GLS) source-sink update and the
    resulting diapycnal diffusivity (mod_difest.F90:2673-2930).

    Inputs, all (K, J, I) unless noted: tke/gls tracers, previous
    difdia [m2/s], du2l squared velocity jump across the layer [m2/s2],
    bvfsq Brunt-Vaisala frequency squared [s-2], dp_k layer thickness
    [Pa], p_i (K+1, J, I) interface pressure; ustar/ustarb/(J, I)
    surface and bottom friction velocities; kmax (J, I) int index of
    the deepest active layer.  Returns (tke, gls, nus, L_scale)."""
    kk = tke.shape[0]
    kidx = jnp.arange(kk)[:, None, None]

    # shear/buoyancy production (":2676-2686")
    thin = dp_k <= epsilp * 10.
    h = jnp.maximum(onem, dp_k) * alpha0 / grav
    shear2 = jnp.where(thin, 1.e-9,
                       jnp.maximum(1.e-13, du2l) / (h * h))
    prod = jnp.where(thin, 0., difdia * Pr_t * shear2)
    buoy = jnp.where(thin, 0., -difdia * bvfsq)

    gls_c3 = jnp.where(bvfsq > 0., gls_c3minus, gls_c3plus)

    if not par.use_gls:
        # diagnostic psi from local equilibrium (":2779-2781")
        gls = jnp.maximum((gls_c1 * prod + gls_c3 * buoy) / gls_c2,
                          gls_psi_min)

    tke_eps = (cmu_fac2 * tke ** (1.5 + gls_m / gls_n)
               * gls ** (-1. / gls_n))
    tke_Q = tke_eps / tke

    if par.use_gls:
        # prognostic psi update (":2789-2812")
        gls_prod = (gls / tke) * gls_c1 * prod
        gls_buoy = (gls / tke) * gls_c3 * buoy
        gls_diss = (gls / tke) * gls_c2 * tke_eps
        gls_Q = gls_diss / gls
        pos = gls_prod + gls_buoy >= 0.
        gls_new = jnp.where(
            pos,
            (gls + delt1 * (gls_prod + gls_buoy)) / (1. + delt1 * gls_Q),
            (gls + delt1 * gls_prod)
            / (1. + delt1 * (gls_Q - gls_buoy / gls)))
        gls = jnp.maximum(gls_new, gls_psi_min)
        # Galperin-type limit (":2806-2813")
        q = (.56 ** (.5 * gls_n) * gls_cmu0 ** gls_p
             * tke ** (gls_m + .5 * gls_n)
             * jnp.maximum(bvfsq, 1.e-10) ** (-.5 * gls_n))
        gls = jnp.where(bvfsq > 0., jnp.maximum(gls, q), gls)

    # TKE update (":2816-2828")
    tke_eps = (cmu_fac2 * tke ** (1.5 + gls_m / gls_n)
               * gls ** (-1. / gls_n))
    tke_Q = tke_eps / tke
    pos = prod + buoy >= 0.
    tke_new = jnp.where(
        pos,
        (tke + delt1 * (prod + buoy)) / (1. + delt1 * tke_Q),
        jnp.maximum((tke + delt1 * prod)
                    / (1. + delt1 * (tke_Q - buoy / tke)), tke_min))
    tke = jnp.maximum(tke_new, tke_min)

    # surface TKE penetration (":2830-2841")
    if par.tkepf > 0.:
        q = jnp.where(
            dp_k < epsilp,
            jnp.exp(-p_i[:-1] / par.tkepls),
            par.tkepls * (jnp.exp(-p_i[:-1] / par.tkepls)
                          - jnp.exp(-p_i[1:] / par.tkepls))
            / jnp.maximum(dp_k, epsilp))
        tke = tke + 67.83 * par.tkepf * q * ustar[None] ** 2

    # thin layers and the 2-layer surface mixed layer hold minimum
    # values (":2843-2852")
    floor = thin | (kidx < 2)
    tke = jnp.where(floor, tke_min, tke)
    gls = jnp.where(floor, gls_psi_min, gls)

    # bottom boundary condition (":2854-2863")
    ust = jnp.maximum(ustarb, par.ustmin)
    at_bot = kidx == kmax[None]
    tke = jnp.where(at_bot, jnp.maximum(tke_min, (ust / gls_cmu0) ** 2)[None] * jnp.ones_like(tke), tke)
    if par.use_gls:
        gls_bot = jnp.maximum(
            gls_psi_min,
            gls_cmu0 ** (gls_p - 2. * gls_m) * ust ** (2. * gls_m)
            * vonKar ** gls_n)
        gls = jnp.where(at_bot, gls_bot[None] * jnp.ones_like(gls), gls)

    # length scales (":2865-2879")
    Ls_unlmt = jnp.maximum(
        Ls_unlmt_min,
        cmu_fac1 * gls ** gls_exp1 * tke ** (-tke_exp1))
    Ls_lmt = jnp.where(
        bvfsq > 0.,
        jnp.minimum(Ls_unlmt, tke ** (-gls_m / gls_n) * gls ** gls_n),
        Ls_unlmt)

    # Canuto-A stability functions (":2881-2910")
    Gh = jnp.minimum(gls_Gh0, -bvfsq * Ls_lmt * Ls_lmt / (2. * tke))
    Gh = jnp.minimum(Gh, (Gh - (Gh - gls_Ghcri) ** 2)
                     / (Gh + gls_Gh0 - 2. * gls_Ghcri))
    Gh = jnp.clip(Gh, gls_Ghmin, gls_Gh0)
    Gm = ((gls_b0 / gls_fac6 - gls_b1 * Gh
           + gls_b3 * gls_fac6 * Gh ** 2)
          / (gls_b2 - gls_b4 * gls_fac6 * Gh))
    Gm = jnp.minimum(Gm, shear2 * Ls_lmt * Ls_lmt / (2. * tke))
    cff = (gls_b0 - gls_b1 * gls_fac6 * Gh + gls_b2 * gls_fac6 * Gm
           + gls_b3 * gls_fac6 ** 2 * Gh ** 2
           - gls_b4 * gls_fac6 ** 2 * Gh * Gm
           + gls_b5 * gls_fac6 ** 2 * Gm * Gm)
    Sm = jnp.maximum((gls_s0 - gls_s1 * gls_fac6 * Gh
                      + gls_s2 * gls_fac6 * Gm) / cff, 0.)
    Sh = jnp.maximum((gls_s4 - gls_s5 * gls_fac6 * Gh
                      + gls_s6 * gls_fac6 * Gm) / cff, 0.)
    Sm = Sm * cmu_fac3 / gls_cmu0 ** 3
    Sh = Sh * cmu_fac3 / gls_cmu0 ** 3

    ql = sqrt2 * Ls_lmt * jnp.sqrt(tke)
    nus = jnp.minimum(Sh * ql, 4.05 * par.nug0)   # (":2917")
    L_scale = jnp.maximum(Ls_lmt, Ls_unlmt_min)

    if par.use_gls:
        # recompute psi from the limited length scale (":2922-2927")
        gls = jnp.maximum(
            gls_cmu0 ** gls_p * tke ** gls_m * L_scale ** gls_n,
            gls_psi_min)
        gls = jnp.where(floor, gls_psi_min, gls)

    return tke, gls, nus, L_scale
