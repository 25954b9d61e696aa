"""Baroclinic momentum equation.

TPU-native re-design of the reference momentum solver
(reference: /root/reference/phy/mod_momtum.F90:215-1280 momtum).  All
per-layer 2-D loops are vectorized over the k axis; land/sidewall special
cases are dense mask selections.  Implements the Sadourny (1975)
enstrophy-conserving ('enscon'), energy-conserving ('enecon') and
energy-conserving-with-dissipation ('enedis') Coriolis schemes.

Deviation from the reference: at promontory vorticity points the
reference reads whatever is in the scratch velocity arrays from earlier
layers (mod_momtum.F90:556-574 loops only touch wet sections); here dry
velocities are exactly zero, which is well-defined and equivalent for
fuk95/channel-class geometries.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import grav, alpha0, epsilp, epsilpl, onem, onemm
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from ..phys.forcing import Forcing
from .pgforc import wpgf
from .tmsmt import wuv1, wuv2

slip = -1.0       # -1: no-slip sidewalls (mod_momtum.F90:94-96)
thkbot = 10.0     # bottom boundary layer thickness [m] (mod_momtum.F90:97)


class MomtumParams(NamedTuple):
    """Namelist viscosity/friction parameters (mod_momtum.F90:53-90)."""
    mdv2hi: float = 0.0
    mdv2lo: float = 0.0
    mdv4hi: float = 0.0
    mdv4lo: float = 0.0
    vsc2hi: float = .2
    vsc2lo: float = .2
    vsc4hi: float = 0.0
    vsc4lo: float = 0.0
    cbar: float = .05
    cb: float = .002
    mommth: str = 'enscon'


def _hfharm(a, b):
    """Half harmonic mean (mod_momtum.F90:131-142)."""
    return a * b / (a + b)



def _dpmx(grid: Grid, dp_m):
    """Neighborhood thickness maxima at q points
    (mod_momtum.F90:355-396)."""
    im1, jm1 = grid.im1, grid.jm1
    du = grid.iu * (dp_m + im1(dp_m))
    dv = grid.iv * (dp_m + jm1(dp_m))
    return jnp.maximum(8. * onem,
                       jnp.maximum(jnp.maximum(du, jm1(du)),
                                   jnp.maximum(dv, im1(dv))))


def potvor_field(grid: Grid, dp_m, utotm, vtotm, dpmx=None,
                 return_dpvor: bool = False):
    """Absolute/potential vorticity at q points, interior + lateral
    boundary treatment (mod_momtum.F90:473-575).  With return_dpvor,
    returns (potvor, dpvor) — the LYR_DPVOR diagnostic."""
    ip, iu, iv, iq = grid.ip, grid.iu, grid.iv, grid.iq
    im1, ip1, jm1 = grid.im1, grid.ip1, grid.jm1
    jp1p = lambda a: grid.jp1(a, 'p')           # noqa: E731
    cutoff = onem
    if dpmx is None:
        dpmx = _dpmx(grid, dp_m)

    Vv = vtotm * grid.scvy        # zero where dry
    Uu = utotm * grid.scux
    v_e = jnp.where(iv > 0, Vv, slip * im1(Vv))
    v_w = jnp.where(im1(iv) > 0, im1(Vv), slip * Vv)
    u_nn = jnp.where(iu > 0, Uu, slip * jm1(Uu))
    u_ss = jnp.where(jm1(iu) > 0, jm1(Uu), slip * Uu)
    vort_b = (v_e - v_w - (u_nn - u_ss)) * grid.scq2i
    vort_i = (Vv - im1(Vv) - (Uu - jm1(Uu))) * grid.scq2i
    vort = jnp.where(iq > 0, vort_i, vort_b)
    absvor = vort + grid.corioq

    dpvor_i = .125 * jnp.maximum(
        2. * (dp_m + im1(dp_m) + jm1(dp_m) + im1(jm1(dp_m))),
        jnp.maximum(jnp.maximum(dpmx, im1(dpmx)),
                    jnp.maximum(jnp.maximum(ip1(dpmx), jm1(dpmx)),
                                jp1p(dpmx))))
    # boundary candidates (v-section ends first, u-section ends override;
    # mod_momtum.F90:484-575 loop order)
    cand_ve = .125 * jnp.maximum(4. * (dp_m + jm1(dp_m)),
                                 jnp.maximum(dpmx, ip1(dpmx)))
    cand_vw = .125 * jnp.maximum(4. * im1(dp_m + jm1(dp_m)),
                                 jnp.maximum(im1(dpmx), dpmx))
    cand_un = .125 * jnp.maximum(4. * (dp_m + im1(dp_m)),
                                 jnp.maximum(dpmx, jp1p(dpmx)))
    cand_us = .125 * jnp.maximum(4. * jm1(dp_m + im1(dp_m)),
                                 jnp.maximum(jm1(dpmx), dpmx))
    dpvor_b = jnp.full_like(dp_m, cutoff)
    dpvor_b = jnp.where(iv > 0, cand_ve, dpvor_b)
    dpvor_b = jnp.where(im1(iv) > 0, cand_vw, dpvor_b)
    dpvor_b = jnp.where(iu > 0, cand_un, dpvor_b)
    dpvor_b = jnp.where(jm1(iu) > 0, cand_us, dpvor_b)
    dpvor = jnp.where(iq > 0, dpvor_i, dpvor_b)
    potvor = absvor / dpvor

    if return_dpvor:
        return potvor, dpvor
    return potvor


def coriolis_terms(grid: Grid, dp_m, utotm, vtotm, uflux0, vflux0,
                   potvor, mommth: str):
    """Coriolis advection terms cau/cav for the three vorticity schemes
    (enscon/enecon/enedis, mod_momtum.F90:664-838)."""
    iu, iv = grid.iu, grid.iv
    im1, ip1, jm1 = grid.im1, grid.ip1, grid.jm1
    jp1q = lambda a: grid.jp1(a, 'q')           # noqa: E731
    jp1vv = lambda a: grid.jp1(a, 'v', True)    # noqa: E731

    if mommth == 'enscon':
        cau = .125 * (vflux0 + jp1vv(vflux0) + im1(vflux0) + im1(jp1vv(vflux0))) \
            * (potvor + jp1q(potvor)) * iu
        cav = -.125 * (uflux0 + ip1(uflux0) + jm1(uflux0) + ip1(jm1(uflux0))) \
            * (potvor + ip1(potvor)) * iv
    elif mommth == 'enecon':
        cau = .25 * ((vflux0 + im1(vflux0)) * potvor
                     + (jp1vv(vflux0) + im1(jp1vv(vflux0))) * jp1q(potvor)) * iu
        cav = -.25 * ((uflux0 + jm1(uflux0)) * potvor
                      + ip1(uflux0 + jm1(uflux0)) * ip1(potvor)) * iv
    elif mommth == 'enedis':
        # Sadourny energy-conserving scheme with upwind-selected
        # min/max mass fluxes for slight dissipation
        # (mod_momtum.F90:664-712 min/max setup, :765-812 fluxes)
        c1, c2, c3, slp_ = 1. - 1.5 * .5, 1. - .5, 2., .5

        def hminmax(hc, hm):
            hm2 = jnp.where(jnp.abs(hc) < .1 * jnp.abs(hm), 10. * hc, hm)
            adj = jnp.where(
                jnp.abs(hc) < c2 * jnp.abs(hm2),
                3. * hc + (1. - c2 * 3.) * hm2,
                jnp.where(jnp.abs(hc) <= c3 * jnp.abs(hm2), hm2,
                          slp_ * hc + (1. - c3 * slp_) * hm2))
            hc2 = jnp.where(jnp.abs(hc) > c1 * jnp.abs(hm2), adj, hc)
            return jnp.minimum(hc2, hm2), jnp.maximum(hc2, hm2)

        uh_min, uh_max = hminmax(.5 * utotm * (dp_m + im1(dp_m)),
                                 uflux0)
        vh_min, vh_max = hminmax(.5 * vtotm * (dp_m + jm1(dp_m)),
                                 vflux0)

        def upw(pv, sgn, hmx, hmn, flip):
            s_ = pv * sgn
            sel = jnp.where(s_ == 0., .5 * (hmx + hmn),
                            jnp.where((s_ < 0.) != flip, hmx, hmn))
            return pv * sel

        t1u = upw(jp1q(potvor), utotm, jp1vv(vh_max) + im1(jp1vv(vh_max)),
                  jp1vv(vh_min) + im1(jp1vv(vh_min)), False)
        t2u = upw(potvor, utotm, vh_max + im1(vh_max),
                  vh_min + im1(vh_min), False)
        cau = .25 * (t1u + t2u) * iu

        t1v = upw(ip1(potvor), vtotm, ip1(uh_max) + jm1(ip1(uh_max)),
                  ip1(uh_min) + jm1(ip1(uh_min)), True)
        t2v = upw(potvor, vtotm, uh_max + jm1(uh_max),
                  uh_min + jm1(uh_min), True)
        cav = -.25 * (t1v + t2v) * iv
    else:
        raise NotImplementedError(f'mommth={mommth!r}')

    return cau, cav


class MomtumKIn(NamedTuple):
    """Per-k (kk, jdm, idm) inputs of the fused stencil body
    (prologue products of momtum; see _uv_body)."""
    u_m: jax.Array
    u_n: jax.Array
    v_m: jax.Array
    v_n: jax.Array
    dp_m: jax.Array
    dpu_m: jax.Array
    dpv_m: jax.Array
    p_lo: jax.Array     # p(k)   at p-points
    p_hi: jax.Array     # p(k+1)
    pu_lo: jax.Array    # pu(k)
    pu_hi: jax.Array    # pu(k+1)
    pv_lo: jax.Array
    pv_hi: jax.Array
    stress_u: jax.Array
    stress_v: jax.Array
    pgf_u: jax.Array
    pgf_v: jax.Array


class Momtum2DIn(NamedTuple):
    """(jdm, idm) inputs of the fused stencil body."""
    ubflxs_m: jax.Array
    ubflxs_n: jax.Array
    vbflxs_m: jax.Array
    vbflxs_n: jax.Array
    pbu_m: jax.Array
    pbv_m: jax.Array
    pbu_n: jax.Array
    pbv_n: jax.Array
    drag: jax.Array
    ubrhs: jax.Array
    vbrhs: jax.Array
    difwgt: jax.Array


def _uv_body(grid: Grid, par: MomtumParams, f: MomtumKIn, d2: Momtum2DIn,
             tsfac, delt1):
    """The per-layer stencil core of the momentum solve: total
    velocities, vorticity, deformation viscosity, momentum fluxes,
    bottom/wind stress application -> unfilled (u_new, v_new)
    (mod_momtum.F90:388-1152).  Purely elementwise over k with +-1
    2-D stencils, so it runs unchanged either as plain XLA or inside
    the fused Pallas kernel (momtum_pallas.py) on VMEM-resident
    (kb, jdm, idm) blocks."""
    ip, iu, iv, iq = grid.ip, grid.iu, grid.iv, grid.iq
    im1, ip1, jm1, jp1 = grid.im1, grid.ip1, grid.jm1, grid.jp1
    jp1q = lambda a: grid.jp1(a, 'q')           # noqa: E731
    jp1u = lambda a: grid.jp1(a, 'u')           # noqa: E731
    jp1v = lambda a: grid.jp1(a, 'v')           # noqa: E731
    jp1uv = lambda a: grid.jp1(a, 'u', True)    # noqa: E731
    jp1vv = lambda a: grid.jp1(a, 'v', True)    # noqa: E731

    cutoff = onem
    thkbop = thkbot * onem
    u_m, u_n, v_m, v_n = f.u_m, f.u_n, f.v_m, f.v_n
    dp_m, dpu_m, dpv_m = f.dp_m, f.dpu_m, f.dpv_m
    stress_u, stress_v = f.stress_u, f.stress_v
    pgf_u, pgf_v = f.pgf_u, f.pgf_v
    drag, ubrhs, vbrhs = d2.drag, d2.ubrhs, d2.vbrhs
    difwgt = d2.difwgt

    # ---- total velocities at mid and old levels (mod_momtum.F90:388-432)
    pbu_m_safe = jnp.maximum(d2.pbu_m * grid.scuy, epsilpl)
    pbv_m_safe = jnp.maximum(d2.pbv_m * grid.scvx, epsilpl)
    pbu_n_safe = jnp.maximum(d2.pbu_n * grid.scuy, epsilpl)
    pbv_n_safe = jnp.maximum(d2.pbv_n * grid.scvx, epsilpl)
    utotm = (u_m + d2.ubflxs_m * tsfac / pbu_m_safe) * iu
    vtotm = (v_m + d2.vbflxs_m * tsfac / pbv_m_safe) * iv
    utotn = (u_n + d2.ubflxs_n * tsfac / pbu_n_safe) * iu
    vtotn = (v_n + d2.vbflxs_n * tsfac / pbv_n_safe) * iv
    uflux0 = utotm * jnp.maximum(dpu_m, cutoff) * iu
    vflux0 = vtotm * jnp.maximum(dpv_m, cutoff) * iv

    # ---- dpmx: neighborhood thickness maxima (mod_momtum.F90:373-410)
    dpmx = _dpmx(grid, dp_m)

    # ---- sidewall-aware auxiliary velocities (mod_momtum.F90:434-470)
    dpu_col = f.pu_hi  # pu(k+1)
    wgtja = jnp.clip((dpu_col - jm1(d2.pbu_m))
                     / jnp.maximum(dpu_col - f.pu_lo, epsilp), 0., 1.)
    wgtjb = jnp.clip((dpu_col - jp1u(d2.pbu_m))
                     / jnp.maximum(dpu_col - f.pu_lo, epsilp), 0., 1.)
    uja = (1. - wgtja) * jm1(utotn) + wgtja * slip * utotn
    ujb = (1. - wgtjb) * jp1uv(utotn) + wgtjb * slip * utotn
    dl2u = (utotn - .25 * (ip1(utotn) + im1(utotn) + uja + ujb)) * iu

    dpv_col = f.pv_hi
    wgtia = jnp.clip((dpv_col - im1(d2.pbv_m))
                     / jnp.maximum(dpv_col - f.pv_lo, epsilp), 0., 1.)
    wgtib = jnp.clip((dpv_col - ip1(d2.pbv_m))
                     / jnp.maximum(dpv_col - f.pv_lo, epsilp), 0., 1.)
    via = (1. - wgtia) * im1(vtotn) + wgtia * slip * vtotn
    vib = (1. - wgtib) * ip1(vtotn) + wgtib * slip * vtotn
    dl2v = (vtotn - .25 * (jp1vv(vtotn) + jm1(vtotn) + via + vib)) * iv

    # ---- vorticity / potential vorticity at q (mod_momtum.F90:473-575)
    potvor = potvor_field(grid, dp_m, utotm, vtotm, dpmx)

    # ---- deformation fields (mod_momtum.F90:537-584)
    defor1 = ((ip1(utotn * grid.scuy) - utotn * grid.scuy)
              - (jp1vv(vtotn * grid.scvx) - vtotn * grid.scvx)) ** 2 \
        * grid.scp2i
    Vn = vtotn * grid.scvy
    Un = utotn * grid.scux
    d2_i = (im1(vib) * grid.scvy - via * im1(grid.scvy)
            + jm1(ujb) * grid.scux - uja * jm1(grid.scux)) ** 2 * grid.scq2i
    ve_n = jnp.where(iv > 0, Vn, slip * im1(Vn))
    vw_n = jnp.where(im1(iv) > 0, im1(Vn), slip * Vn)
    un_n = jnp.where(iu > 0, Un, slip * jm1(Un))
    us_n = jnp.where(jm1(iu) > 0, jm1(Un), slip * Un)
    d2_b = (ve_n - vw_n + un_n - us_n) ** 2 * grid.scq2i
    defor2 = jnp.where(iq > 0, d2_i, d2_b)

    # sidewall-aware del2 neighbors (mod_momtum.F90:586-607)
    dl2uja = (1. - wgtja) * jm1(dl2u) + wgtja * slip * dl2u
    dl2ujb = (1. - wgtjb) * jp1uv(dl2u) + wgtjb * slip * dl2u
    dl2via = (1. - wgtia) * im1(dl2v) + wgtia * slip * dl2v
    dl2vib = (1. - wgtib) * ip1(dl2v) + wgtib * slip * dl2v

    # ---- Arakawa kinetic energy (GOLD variant; mod_momtum.F90:609-663)
    ke = .25 * (grid.scu2 * utotm ** 2 + ip1(grid.scu2 * utotm ** 2)
                + grid.scv2 * vtotm ** 2 + jp1v(grid.scv2 * vtotm ** 2)) \
        * grid.scp2i

    # ---- Coriolis advection terms (mod_momtum.F90:719-784)
    cau, cav = coriolis_terms(grid, dp_m, utotm, vtotm, uflux0, vflux0,
                              potvor, par.mommth)

    # ================= u equation =================
    # deformation-dependent viscosity at u (mod_momtum.F90:790-804)
    qw = .5 * (im1(difwgt) + difwgt)
    deform_u = jnp.sqrt(.5 * (defor1 + im1(defor1) + defor2 + jp1q(defor2)))
    vsc2u = jnp.maximum(qw * par.mdv2hi + (1. - qw) * par.mdv2lo,
                        (qw * par.vsc2hi + (1. - qw) * par.vsc2lo) * deform_u)
    vsc4u = jnp.maximum(qw * par.mdv4hi + (1. - qw) * par.mdv4lo,
                        (qw * par.vsc4hi + (1. - qw) * par.vsc4lo) * deform_u)

    # longitudinal momentum flux at p-points (mod_momtum.F90:821-836)
    vsc2u_a = jnp.where(iu > 0, vsc2u, ip1(vsc2u))
    vsc2u_b = jnp.where(ip1(iu) > 0, ip1(vsc2u), vsc2u)
    vsc4u_a = jnp.where(iu > 0, vsc4u, ip1(vsc4u))
    vsc4u_b = jnp.where(ip1(iu) > 0, ip1(vsc4u), vsc4u)
    dpxy_u = jnp.maximum(dpu_m, onemm)
    dpib_u = jnp.maximum(ip1(dpu_m), onemm)
    harm_p = _hfharm(dpxy_u, dpib_u)
    uflux1 = jnp.where(
        (iu + ip1(iu)) > 0,
        jnp.minimum(grid.difmxp, (vsc2u_a + vsc2u_b) * grid.scpy)
        * harm_p * (utotn - ip1(utotn))
        + jnp.minimum(.125 * grid.difmxp, (vsc4u_a + vsc4u_b) * grid.scpy)
        * harm_p * (dl2u - ip1(dl2u)),
        0.0)

    # lateral momentum flux at q-points (mod_momtum.F90:838-915)
    dpja = jnp.maximum(jm1(dpu_m), onemm)
    dpja = dpja + wgtja * (dpxy_u - dpja)
    dpjb = jnp.maximum(jp1u(dpu_m), onemm)
    dpjb = dpjb + wgtjb * (dpxy_u - dpjb)
    vsc2a = jnp.where(jm1(iu) > 0, jm1(vsc2u), vsc2u)
    vsc4a = jnp.where(jm1(iu) > 0, jm1(vsc4u), vsc4u)
    vsc2b = jnp.where(jp1u(iu) > 0, jp1u(vsc2u), vsc2u)
    vsc4b = jnp.where(jp1u(iu) > 0, jp1u(vsc4u), vsc4u)
    uflux2 = (jnp.minimum(grid.difmxq, (vsc2u + vsc2a) * grid.scqx)
              * _hfharm(dpja, dpxy_u) * (uja - utotn)
              + jnp.minimum(.125 * grid.difmxq, (vsc4u + vsc4a) * grid.scqx)
              * _hfharm(dpja, dpxy_u) * (dl2uja - dl2u)) * iu
    uflux3 = (jnp.minimum(jp1q(grid.difmxq), (vsc2u + vsc2b) * jp1q(grid.scqx))
              * _hfharm(dpjb, dpxy_u) * (utotn - ujb)
              + jnp.minimum(.125 * jp1q(grid.difmxq),
                            (vsc4u + vsc4b) * jp1(grid.scqx))
              * _hfharm(dpjb, dpxy_u) * (dl2u - dl2ujb)) * iu

    # bottom boundary layer stress + update (mod_momtum.F90:948-984)
    pbu_m = d2.pbu_m
    ptopl_u = .5 * (jnp.minimum(pbu_m, f.p_lo) + jnp.minimum(pbu_m, im1(f.p_lo)))
    pbotl_u = .5 * (jnp.minimum(pbu_m, f.p_hi) + jnp.minimum(pbu_m, im1(f.p_hi)))
    qbot = .5 * (drag + im1(drag)) \
        * (jnp.maximum(pbu_m - thkbop, pbotl_u)
           - jnp.maximum(pbu_m - thkbop, jnp.minimum(ptopl_u, pbotl_u - onemm))) \
        / jnp.maximum(dpu_m, onemm)
    botstr_u = -utotn * qbot / (1. + delt1 * qbot)

    u_new = (u_n + delt1 * (
        -grid.scuxi * (-pgf_u + stress_u + (ke - im1(ke)))
        + cau - ubrhs + botstr_u
        - (uflux1 - im1(uflux1) + uflux3 - uflux2)
        / (grid.scu2 * jnp.maximum(dpu_m, onemm)))) * iu

    # ================= v equation =================
    qw = .5 * (jm1(difwgt) + difwgt)
    deform_v = jnp.sqrt(.5 * (defor1 + jm1(defor1) + defor2 + ip1(defor2)))
    vsc2v = jnp.maximum(qw * par.mdv2hi + (1. - qw) * par.mdv2lo,
                        (qw * par.vsc2hi + (1. - qw) * par.vsc2lo) * deform_v)
    vsc4v = jnp.maximum(qw * par.mdv4hi + (1. - qw) * par.mdv4lo,
                        (qw * par.vsc4hi + (1. - qw) * par.vsc4lo) * deform_v)

    vsc2v_a = jnp.where(iv > 0, vsc2v, jp1v(vsc2v))
    vsc2v_b = jnp.where(jp1v(iv) > 0, jp1v(vsc2v), vsc2v)
    vsc4v_a = jnp.where(iv > 0, vsc4v, jp1v(vsc4v))
    vsc4v_b = jnp.where(jp1v(iv) > 0, jp1v(vsc4v), vsc4v)
    dpxy_v = jnp.maximum(dpv_m, onemm)
    dpjb_v = jnp.maximum(jp1v(dpv_m), onemm)
    harm_pv = _hfharm(dpxy_v, dpjb_v)
    vflux1 = jnp.where(
        (iv + jp1v(iv)) > 0,
        jnp.minimum(grid.difmxp, (vsc2v_a + vsc2v_b) * grid.scpx)
        * harm_pv * (vtotn - jp1vv(vtotn))
        + jnp.minimum(.125 * grid.difmxp, (vsc4v_a + vsc4v_b) * grid.scpx)
        * harm_pv * (dl2v - jp1vv(dl2v)),
        0.0)

    dpia = jnp.maximum(im1(dpv_m), onemm)
    dpia = dpia + wgtia * (dpxy_v - dpia)
    dpib = jnp.maximum(ip1(dpv_m), onemm)
    dpib = dpib + wgtib * (dpxy_v - dpib)
    vsc2a = jnp.where(im1(iv) > 0, im1(vsc2v), vsc2v)
    vsc4a = jnp.where(im1(iv) > 0, im1(vsc4v), vsc4v)
    vsc2b = jnp.where(ip1(iv) > 0, ip1(vsc2v), vsc2v)
    vsc4b = jnp.where(ip1(iv) > 0, ip1(vsc4v), vsc4v)
    vflux2 = (jnp.minimum(grid.difmxq, (vsc2v + vsc2a) * grid.scqy)
              * _hfharm(dpia, dpxy_v) * (via - vtotn)
              + jnp.minimum(.125 * grid.difmxq, (vsc4v + vsc4a) * grid.scqy)
              * _hfharm(dpia, dpxy_v) * (dl2via - dl2v)) * iv
    vflux3 = (jnp.minimum(ip1(grid.difmxq), (vsc2v + vsc2b) * ip1(grid.scqy))
              * _hfharm(dpib, dpxy_v) * (vtotn - vib)
              + jnp.minimum(.125 * ip1(grid.difmxq),
                            (vsc4v + vsc4b) * ip1(grid.scqy))
              * _hfharm(dpib, dpxy_v) * (dl2v - dl2vib)) * iv

    pbv_m = d2.pbv_m
    ptopl_v = .5 * (jnp.minimum(pbv_m, f.p_lo) + jnp.minimum(pbv_m, jm1(f.p_lo)))
    pbotl_v = .5 * (jnp.minimum(pbv_m, f.p_hi) + jnp.minimum(pbv_m, jm1(f.p_hi)))
    qbot = .5 * (drag + jm1(drag)) \
        * (jnp.maximum(pbv_m - thkbop, pbotl_v)
           - jnp.maximum(pbv_m - thkbop, jnp.minimum(ptopl_v, pbotl_v - onemm))) \
        / jnp.maximum(dpv_m, onemm)
    botstr_v = -vtotn * qbot / (1. + delt1 * qbot)

    v_new = (v_n + delt1 * (
        -grid.scvyi * (-pgf_v + stress_v + (ke - jm1(ke)))
        + cav - vbrhs + botstr_v
        - (vflux1 - jm1(vflux1) + vflux3 - vflux2)
        / (grid.scv2 * jnp.maximum(dpv_m, onemm)))) * iv

    return u_new, v_new


def _pallas_ok(grid: Grid, u) -> bool:
    """Use the fused Pallas momentum kernel?  TPU + f32 + non-arctic
    (on tripolar grids the single-device GSPMD path needs fold-aware
    j+1 reads; under the shard_map step the per-shard grid is already
    fold-free, so sharded tripolar runs DO take the kernel);
    BLOM_TPU_PALLAS=0 disables (escape hatch)."""
    import os
    if os.environ.get('BLOM_TPU_PALLAS', '1') == '0':
        return False
    if grid.arctic or u.dtype != jnp.float32 or u.ndim != 3:
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def momtum(grid: Grid, s: State, forcing: Forcing, par: MomtumParams,
           difwgt, m: int, n: int, delt1, dlt, vcoord_isopyc: bool = False):
    """Advance baroclinic velocity from old level n using mid level m.

    Returns (state, utotn_out, vtotn_out): the depth-mean velocity
    tendency fed to the barotropic solver (mod_momtum.F90:1154-1269).

    Structure: an XLA prologue (interface-pressure cumsums, bottom-drag
    column integrals, wind-stress and PGF time blends), then the fused
    per-layer stencil body (_uv_body; on TPU/f32 a Pallas kernel), then
    the sequential massless-fill scan + time smoothing epilogue."""
    kk = grid.kk
    ip, iu, iv, iq = grid.ip, grid.iu, grid.iv, grid.iq
    im1, ip1, jm1, jp1 = grid.im1, grid.ip1, grid.jm1, grid.jp1
    jp1vv = lambda a: grid.jp1(a, 'v', True)    # noqa: E731

    thkbop = thkbot * onem
    tsfac = dlt / delt1
    dt1inv = 1.0 / delt1

    dp_m, dp_n = s.dp[m], s.dp[n]
    dpu_m, dpu_n = s.dpu[m], s.dpu[n]
    dpv_m, dpv_n = s.dpv[m], s.dpv[n]
    u_m, u_n = s.u[m], s.u[n]
    v_m, v_n = s.v[m], s.v[n]

    # interface pressures from mid-level thicknesses (mod_momtum.F90:244-255)
    p = cumulative_p(dp_m) * ip
    pu = cumulative_p(dpu_m)
    pv = cumulative_p(dpv_m)

    # ---- bottom drag (mod_momtum.F90:257-294): bulk formula over the
    # bottom boundary layer, at p-points.
    pbot = p[kk]
    pbotl = jnp.maximum(p[1:], pbot - thkbop)
    ptopl = jnp.maximum(p[:-1], pbot - thkbop)
    ubot_bl = jnp.sum((u_n + ip1(u_n)) * (pbotl - ptopl), axis=0)
    vbot_bl = jnp.sum((v_n + jp1vv(v_n)) * (pbotl - ptopl), axis=0)

    ubs = s.ubflxs_p[n] / jnp.maximum(epsilpl, s.pbu[n] * grid.scuy)
    vbs = s.vbflxs_p[n] / jnp.maximum(epsilpl, s.pbv[n] * grid.scvx)
    ubot = (ubs + ip1(ubs)) * tsfac + ubot_bl / thkbop
    vbot = (vbs + jp1vv(vbs)) * tsfac + vbot_bl / thkbop
    ubbl = .5 * jnp.sqrt(ubot * ubot + vbot * vbot)
    qdrag = par.cb * (ubbl + par.cbar)
    drag = qdrag * grav / (alpha0 * thkbop) * ip
    ustarb = jnp.sqrt(qdrag * ubbl) * ip

    # ---- barotropic r.h.s. (mod_momtum.F90:296-313)
    ubrhs = s.ubcors_p * tsfac * iu
    vbrhs = s.vbcors_p * tsfac * iv

    # ---- wind stress (mod_momtum.F90:917-946)
    if vcoord_isopyc:
        stress_u = jnp.zeros_like(dpu_m)
        stress_u = stress_u.at[0].set(
            -2. * forcing.taux * grav * grid.scux
            / jnp.maximum(p[1] + im1(p[1]), epsilp))
        stress_v = jnp.zeros_like(dpv_m)
        stress_v = stress_v.at[0].set(
            -2. * forcing.tauy * grav * grid.scvy
            / jnp.maximum(p[1] + jm1(p[1]), epsilp))
    else:
        stress_u = -(forcing.mu_nonloc[:-1] - forcing.mu_nonloc[1:]) \
            * forcing.taux * grav * grid.scux / jnp.maximum(onemm, dpu_m)
        stress_v = -(forcing.mv_nonloc[:-1] - forcing.mv_nonloc[1:]) \
            * forcing.tauy * grav * grid.scvy / jnp.maximum(onemm, dpv_m)
    stress_u = stress_u * iu
    stress_v = stress_v * iv

    # ---- PGF time blend (mod_momtum.F90:974-977)
    pgf_u = (1. - 2. * wpgf) * s.pgfx[m] + wpgf * (s.pgfx_o + s.pgfx[n])
    pgf_v = (1. - 2. * wpgf) * s.pgfy[m] + wpgf * (s.pgfy_o + s.pgfy[n])

    f = MomtumKIn(u_m=u_m, u_n=u_n, v_m=v_m, v_n=v_n, dp_m=dp_m,
                  dpu_m=dpu_m, dpv_m=dpv_m,
                  p_lo=p[:-1], p_hi=p[1:], pu_lo=pu[:-1], pu_hi=pu[1:],
                  pv_lo=pv[:-1], pv_hi=pv[1:],
                  stress_u=stress_u, stress_v=stress_v,
                  pgf_u=pgf_u, pgf_v=pgf_v)
    d2 = Momtum2DIn(ubflxs_m=s.ubflxs_p[m], ubflxs_n=s.ubflxs_p[n],
                    vbflxs_m=s.vbflxs_p[m], vbflxs_n=s.vbflxs_p[n],
                    pbu_m=s.pbu[m], pbv_m=s.pbv[m],
                    pbu_n=s.pbu[n], pbv_n=s.pbv[n],
                    drag=drag, ubrhs=ubrhs, vbrhs=vbrhs, difwgt=difwgt)

    if _pallas_ok(grid, u_m):
        from .momtum_pallas import momtum_uv_pallas
        u_new, v_new = momtum_uv_pallas(grid, par, f, d2, tsfac, delt1)
    else:
        u_new, v_new = _uv_body(grid, par, f, d2, tsfac, delt1)

    # ---- time smoothing part 1 (mod_momtum.F90:974-977)
    u_m_s = (u_m * (wuv1 * dpu_m + onemm) + u_n * wuv2 * s.dpuold) * iu
    v_m_s = (v_m * (wuv1 * dpv_m + onemm) + v_n * wuv2 * s.dpvold) * iv

    # ---- massless-point fill + velocity clamp (mod_momtum.F90:1154-1210):
    # sequential top-down blend with the layer above.
    def fill_scan(carry, xs):
        ua, va = carry
        uk, vk, dpum, dpun, dpvm, dpvn = xs
        qu = jnp.minimum(jnp.minimum(dpum, dpun), onem)
        qv = jnp.minimum(jnp.minimum(dpvm, dpvn), onem)
        uk = (uk * qu + ua * (onem - qu)) / onem
        vk = (vk * qv + va * (onem - qv)) / onem
        uk = (jnp.clip(uk + s.ub[m], -grid.umax, grid.umax) - s.ub[m]) * iu
        vk = (jnp.clip(vk + s.vb[m], -grid.vmax, grid.vmax) - s.vb[m]) * iv
        return (uk, vk), (uk, vk)

    # k=0 blends with itself (kan = max(1,k-1) in the reference)
    (_, _), (u_f, v_f) = lax.scan(
        fill_scan, (u_new[0], v_new[0]),
        (u_new, v_new, dpu_m, dpu_n, dpv_m, dpv_n), unroll=8)

    utot = jnp.sum(u_f * dpu_n, axis=0) / jnp.maximum(s.pbu_p, epsilp) * iu
    vtot = jnp.sum(v_f * dpv_n, axis=0) / jnp.maximum(s.pbv_p, epsilp) * iv

    # time smoothing part 2 (mod_momtum.F90:1212-1247)
    u_f = (u_f - utot) * iu
    v_f = (v_f - vtot) * iv
    u_m_new = (u_m_s + u_f * wuv2 * dpu_n) \
        / (wuv1 * dpu_m + onemm + wuv2 * (s.dpuold + dpu_n)) * iu
    v_m_new = (v_m_s + v_f * wuv2 * dpv_n) \
        / (wuv1 * dpv_m + onemm + wuv2 * (s.dpvold + dpv_n)) * iv

    utotn_out = utot * dt1inv
    vtotn_out = vtot * dt1inv

    # store old-level interface pressures at u/v (mod_momtum.F90:1263-1281)
    pu_new = cumulative_p(dpu_n)
    pv_new = cumulative_p(dpv_n)

    s = dataclasses.replace(
        s,
        u=s.u.at[n].set(u_f).at[m].set(u_m_new),
        v=s.v.at[n].set(v_f).at[m].set(v_m_new),
        pu=pu_new, pv=pv_new, ustarb=ustarb)
    return s, utotn_out, vtotn_out
