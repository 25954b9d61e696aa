"""Loop-level numpy oracle of the Oberhuber mixed-layer TKE balance.

Transcribed from /root/reference/phy/mod_mxlayr.F90 — the squared
lateral buoyancy gradient (:222-280), the TKE source coefficients and
terms (:330-386), and the damped-Newton detrainment-depth solve
(:388-454) — independent of the production JAX implementation.
"""

import math

import numpy as np

grav = 9.806
alpha0 = 1.0e-3
spcifh = 3990.0
onem = 9806.
onemm = 9.806
tencm = 980.6

kappa = 0.4
mu = 2.0
ustmin = 0.001
maxitr = 20
cori20 = 4.9745e-5
ci = 44. / 63.

# EOS coefficient subset needed for dsigdt0/dsigds0/sig0 (mod_eos.F90)
from . import eos_oracle as eo   # noqa: E402


def _sig0_coeffs():
    c = eo.inieos(0.0)
    # surface-referenced coefficients equal pref=0 coefficients
    return c


def dsigdt0(th, s):
    c = _sig0_coeffs()
    r1 = (c['ap11'] + (c['ap12'] + c['ap14'] * th + c['ap15'] * s) * th
          + (c['ap13'] + c['ap16'] * s) * s)
    r2 = (c['ap21'] + (c['ap22'] + c['ap24'] * th + c['ap25'] * s) * th
          + (c['ap23'] + c['ap26'] * s) * s)
    return ((c['ap12'] + 2. * c['ap14'] * th + c['ap15'] * s
             - (c['ap22'] + 2. * c['ap24'] * th + c['ap25'] * s)
             * r1 / r2) / r2)


def dsigds0(th, s):
    c = _sig0_coeffs()
    r1 = (c['ap11'] + (c['ap12'] + c['ap14'] * th + c['ap15'] * s) * th
          + (c['ap13'] + c['ap16'] * s) * s)
    r2 = (c['ap21'] + (c['ap22'] + c['ap24'] * th + c['ap25'] * s) * th
          + (c['ap23'] + c['ap26'] * s) * s)
    return ((c['ap13'] + c['ap15'] * th + 2. * c['ap16'] * s
             - (c['ap23'] + c['ap25'] * th + 2. * c['ap26'] * s)
             * r1 / r2) / r2)


def tke_coeffs(dp1, dp2, t1, t2, s1, s2, surflx, salflx, brnflx,
               sswflx, swfc2, swal2, coriop, ustar, ustar3, rm0,
               bg2, scp2, ce, tau_mlr, lfmin, rtsflg, cni=0.0):
    """The pmxl-independent TKE coefficients (mod_mxlayr.F90:330-365).

    Returns (cus, cni, cbftot, cbfpsw, lui, lei, crs)."""
    q = 1. / (dp1 + dp2)
    tmxl = (t1 * dp1 + t2 * dp2) * q
    smxl = (s1 * dp1 + s2 * dp2) * q
    alfa = -alpha0 * dsigdt0(tmxl, smxl)
    beta = alpha0 * dsigds0(tmxl, smxl)
    bfltot = grav * alpha0 * (alfa * surflx / spcifh
                              - beta * (salflx - brnflx))
    bflpsw = grav * alpha0 * alfa * swfc2 * sswflx / spcifh

    qag = alpha0 / grav
    lui = abs(coriop) * qag / (kappa * max(ustmin, ustar))
    lei = 1. / (onem * swal2)
    cus = rm0 * ustar3
    cbftot = .5 * bfltot * qag
    cbfpsw = .5 * bflpsw * qag

    rtau = 1. / tau_mlr
    rlf = 1. / lfmin
    if rtsflg == 1:       # 'variable'
        crs = (ci * ce * bg2 * qag ** 3
               * math.sqrt(scp2 / (coriop * coriop + rtau * rtau)) * rlf)
    elif rtsflg == 2:     # 'constant'
        crs = ci * ce * bg2 * qag ** 3 * math.sqrt(scp2) * rlf / cori20
    else:                 # 'limited'
        crs = (ci * ce * bg2 * rlf * qag ** 3
               * math.sqrt(scp2 / min(cori20 * cori20,
                                      coriop * coriop + rtau * rtau)))
    return cus, cni, cbftot, cbfpsw, lui, lei, crs


def tke_terms(pmxl, coeffs, floor_pm=True):
    """(us, ni, bf, rs, lbi) at mixed-layer pressure depth pmxl
    (mod_mxlayr.F90:366-386; :519-545 uses max(tencm, pmxl) in the
    shortwave decay scale)."""
    cus, cni, cbftot, cbfpsw, lui, lei, crs = coeffs
    rm1 = math.exp(-lui * pmxl)
    q = lei * (max(tencm, pmxl) if floor_pm else pmxl)
    rm3 = math.exp(-q)
    rm4 = 2. / q
    qb = cbftot - cbfpsw * (rm4 * (1. - rm3) - rm3)
    if qb < 0.:
        lbi = lui
        rm2 = rm1
    else:
        lbi = lui * kappa / mu
        rm2 = math.exp(-lbi * pmxl)
    us = cus * rm1
    ni = cni * rm1
    bf = qb * rm2 * pmxl
    rs = -crs * pmxl ** 3
    return us, ni, bf, rs, lbi


def detrain_pmxl(pres1, pres3, coeffs, mltmin=5.0):
    """Damped-Newton solve for the detrainment depth
    (mod_mxlayr.F90:388-454).  pres1/pres3: surface and layer-2 bottom
    pressures.  Returns pmxl."""
    us, ni, bf, rs, lbi = tke_terms(pres3, coeffs, floor_pm=False)
    tkeo = us + ni + bf + rs

    if pres3 * lbi > 1.:
        pmxl = 1. / lbi
        dpmxl = min(pmxl - pres1, pres3 - pmxl, tencm)
        pmxl = pmxl - .5 * dpmxl
        first_special = True
    else:
        dpmxl = -tencm
        pmxl = pres3 + dpmxl
        first_special = False

    nitr = 0
    while True:
        nitr += 1
        us, ni, bf, rs, lbi = tke_terms(pmxl, coeffs)
        tkew = us + ni + bf + rs
        if not (nitr == 1 and first_special):
            dtke = (tkew - tkeo) / dpmxl
            if abs(dtke) < (abs(tkew) + 1e-22) / (pres3 - pres1):
                if tkew < 0.:
                    dpmxl = .5 * (pres1 - pmxl)
                else:
                    dpmxl = .5 * (pres3 - pmxl)
            else:
                dpmxl = max(pres1 - pmxl, min(pres3 - pmxl,
                                              -tkew / dtke))
        pmxl = pmxl + dpmxl
        tkeo = tkew
        if abs(dpmxl) < onemm or nitr == maxitr:
            break
    return max(mltmin * onem, pmxl)


# ---------------------------------------------------------------- #
# entrainment energetics (mod_mxlayr.F90:877-916, :975-1010)
# ---------------------------------------------------------------- #

def p_p_alpha_exact(p1, p2, th, s):
    """EXACT double pressure integral of specific volume — the closed
    log form the reference documents next to its series
    (mod_eos.F90:455-459) — independent of the production series."""
    import numpy as np
    a1 = eo.a11 + (eo.a12 + eo.a14 * th + eo.a15 * s) * th + (eo.a13 + eo.a16 * s) * s
    a2 = eo.a21 + (eo.a22 + eo.a24 * th + eo.a25 * s) * th + (eo.a23 + eo.a26 * s) * s
    b1 = eo.b11 + eo.b12 * th + eo.b13 * s
    b2 = eo.b21 + eo.b22 * th + eo.b23 * s
    return (.5 * b2 * (p2 - p1) ** 2
            + (a2 - a1 * b2 / b1)
            * ((a1 / b1 + p2) * np.log((a1 + b1 * p2) / (a1 + b1 * p1))
               - (p2 - p1))) / b1


def p_alpha_exact(p1, p2, th, s):
    import numpy as np
    a1 = eo.a11 + (eo.a12 + eo.a14 * th + eo.a15 * s) * th + (eo.a13 + eo.a16 * s) * s
    a2 = eo.a21 + (eo.a22 + eo.a24 * th + eo.a25 * s) * th + (eo.a23 + eo.a26 * s) * s
    b1 = eo.b11 + eo.b12 * th + eo.b13 * s
    b2 = eo.b21 + eo.b22 * th + eo.b23 * s
    return (b2 * (p2 - p1)
            + (a2 - a1 * b2 / b1)
            * np.log((a1 + b1 * p2) / (a1 + b1 * p1))) / b1


def entrain_energy(p_top, prk, pmxl, tk, sk, tm0, sm0, dpe0, dke0,
                   uk, vk, um, vm, delt1, rm5, mldjmp=1.e-3,
                   alpha0=1.e-3, grav=9.806):
    """Transcription of the entrainment PE/KE terms with EXACT
    integrals (dpe :879-889 / :995-1005, dke :890-893)."""
    denom = max(pmxl - p_top, 1e-30)
    tmx = (tm0 * (prk - p_top) + tk * (pmxl - prk)) / denom
    smx = (sm0 * (prk - p_top) + sk * (pmxl - prk)) / denom
    dpe = dpe0 + max(
        .5 * alpha0 * alpha0 * mldjmp * (prk - p_top) * (pmxl - prk),
        p_p_alpha_exact(pmxl, p_top, tmx, smx)
        - p_p_alpha_exact(pmxl, prk, tk, sk)
        - p_p_alpha_exact(prk, p_top, tm0, sm0)
        - (p_top - prk) * p_alpha_exact(pmxl, prk, tk, sk)) \
        * alpha0 / (delt1 * grav)
    dke = dke0 + .5 * rm5 * (prk - p_top) * (pmxl - prk) \
        * ((uk - um) ** 2 + (vk - vm) ** 2) * alpha0 \
        / (denom * delt1 * grav)
    return tmx, smx, dpe, dke
