"""Bulk turbulent air-sea transfer coefficients (Fairall et al. 1996).

TPU-native counterpart of the reference module
(/root/reference/ben02/mod_bulktf.F90): Monin-Obukhov stability
functions, Liu-Katsaros-Businger roughness Reynolds scaling, and one
iteration of the bulk flux algorithm.  All functions are elementwise
over arrays; the reference's sequential bin search in `lkb` becomes a
vectorized piecewise power law.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 0.62197              # molecular weight ratio dry air / vapour
CV = 1. / EPS - 1.
T0 = 273.15
ZI = 600.                  # inversion height [m]
G = 9.8
BETA = 1.2                 # gustiness constant
ALPHA = .011               # Charnock constant
KARMAN = .4

_SQRT3 = 1.732050807568877
_SQRT3I = .5773502691896258


def _psi_conv(zeta, kin_log2):
    """Shared convective-branch blend of the Kansas-type and free-
    convective forms (mod_bulktf.F90:40-97)."""
    x = (1. - 16. * zeta) ** .25
    psik = kin_log2(x)
    y = (1. - 12.87 * zeta) ** (1. / 3.)
    psic = (1.5 * jnp.log((y * y + y + 1.) / 3.)
            - _SQRT3 * jnp.arctan((2. * y + 1.) * _SQRT3I)
            + jnp.pi * _SQRT3I)
    f = 1. / (1. + zeta * zeta)
    return f * psik + (1. - f) * psic


def psiu(zeta):
    """Velocity profile function (mod_bulktf.F90:40-67)."""
    zneg = jnp.minimum(zeta, -1.e-12)
    conv = _psi_conv(
        zneg,
        lambda x: (2. * jnp.log((1. + x) * .5) + jnp.log((1. + x * x) * .5)
                   - 2. * jnp.arctan(x) + jnp.pi * .5))
    return jnp.where(zeta >= 0., -4.7 * zeta, conv)


def psitq(zeta):
    """Temperature/humidity profile function (mod_bulktf.F90:71-97)."""
    zneg = jnp.minimum(zeta, -1.e-12)
    conv = _psi_conv(zneg, lambda x: 2. * jnp.log((1. + x * x) * .5))
    return jnp.where(zeta >= 0., -4.7 * zeta, conv)


# LKB roughness-Reynolds tables (mod_bulktf.F90:116-119)
_LKB_RE = jnp.array([0.11, 0.825, 3.0, 10.0, 30.0, 100., 300., 1000.])
_LKB_AT = jnp.array([0.177, 1.376, 1.026, 1.625, 4.661, 34.904,
                     1667.19, 5.88e5])
_LKB_BT = jnp.array([0., 0.929, -0.599, -1.018, -1.475, -2.067,
                     -2.907, -3.935])
_LKB_AQ = jnp.array([0.292, 1.808, 1.393, 1.956, 4.994, 30.709,
                     1448.68, 2.98e5])
_LKB_BQ = jnp.array([0., 0.826, -0.528, -0.870, -1.297, -1.845,
                     -2.682, -3.616])


def lkb(reu):
    """Roughness Reynolds numbers for temperature and humidity (Liu,
    Katsaros & Businger 1979; mod_bulktf.F90:101-131)."""
    i = jnp.clip(jnp.searchsorted(_LKB_RE, reu, side='left'), 0, 7)
    ret = _LKB_AT[i] * reu ** _LKB_BT[i]
    req = _LKB_AQ[i] * reu ** _LKB_BQ[i]
    return ret, req


def bulktf(du, zu, ta, zt, qa, zq, ts, qs, icec, cd, ch, ce, wg2):
    """One iteration of the bulk transfer-coefficient algorithm
    (mod_bulktf.F90:135-248).  Returns updated (cd, ch, ce, wg2)."""
    tv = ta * (1. + CV * qa)
    tac = ta - T0
    visca = 1.326e-5 * (1. + tac * (6.542e-3 + tac
                                    * (8.301e-6 - tac * 4.84e-9)))
    dt = ta - ts + .0098 * zt
    dq = qa - qs

    du1 = jnp.maximum(du, 1.e-2)
    du2 = du1 * du1
    s = jnp.sqrt(du2 + wg2)
    ustar2 = cd * s * du1
    ustar = jnp.sqrt(ustar2)
    fac = ustar / (cd * du1)
    tstar = fac * ch * dt
    qstar = fac * ce * dq

    tvstar = tstar * (1 + CV * qa) + CV * ta * qstar
    li = jnp.minimum(3. / zu, G * KARMAN * tvstar / (ustar2 * tv))

    w3 = -ZI * G * ustar * tvstar / ta
    wg = jnp.maximum(.1, BETA * jnp.maximum(0., w3) ** (1. / 3.))
    s = jnp.sqrt(du2 + wg * wg)

    zetau = zu * li
    zetat = zt * li
    zetaq = zq * li

    z0 = icec * 2.e-3 + (1. - icec) * (0.11 * visca / ustar
                                       + ALPHA * ustar2 / G)
    cd2 = KARMAN / jnp.maximum(7., jnp.log(zu / z0) - psiu(zetau))
    ustar = cd2 * jnp.sqrt(s * du1)

    reu = ustar * z0 / visca
    ret, req = lkb(reu)
    fac = visca / ustar
    z0t = fac * ret
    z0q = fac * req
    ct2 = KARMAN / jnp.maximum(7., jnp.log(zt / z0t) - psitq(zetat))
    cq2 = KARMAN / jnp.maximum(7., jnp.log(zq / z0q) - psitq(zetaq))

    return cd2 * cd2, cd2 * ct2, cd2 * cq2, wg * wg
