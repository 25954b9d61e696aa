"""Loop-level numpy oracle of the momtum vorticity/Coriolis section.

Transcribed independently from /root/reference/phy/mod_momtum.F90:
dpmx buildup (:355-396), boundary + interior vorticity / potential
vorticity (:473-575), the enedis min/max flux setup (:664-716) and the
Coriolis advection terms for all three mommth schemes (:719-838).
Pure numpy, 0-based indices with (j, i) layout; the reference's
land-skipping section loops (isu/ifu/ilu ...) become explicit wet-run
detection so the boundary writes happen in the reference's ORDER
(v-section ends first, then u-section ends override at shared
corners).  Out-of-domain neighbor reads are zero (the reference's
zeroed land halos); i-periodicity is not exercised (the fuk95 wall
geometry, walls in i, periodic j, is emulated by wrapping j reads).

Double-entry parity partner of dynamics/momtum.potvor_field /
coriolis_terms (PARITY.md methodology)."""

import numpy as np

SLIP = -1.0
CUTOFF = 9806.0         # onem [Pa]


def _runs(mask_row):
    """Contiguous wet runs [(i_first, i_last)] of a 0/1 row."""
    runs = []
    start = None
    for i, w in enumerate(mask_row):
        if w and start is None:
            start = i
        elif not w and start is not None:
            runs.append((start, i - 1))
            start = None
    if start is not None:
        runs.append((start, len(mask_row) - 1))
    return runs


def _get(a, j, i, per_j):
    jj, ii = a.shape
    if per_j:
        j = j % jj
    if j < 0 or j >= jj or i < 0 or i >= ii:
        return 0.0
    return a[j, i]


def oracle_potvor(ip, iu, iv, iq, dp, utotm, vtotm, scux, scvy, scq2i,
                  corioq, per_j=True):
    """potvor (jj, ii) per mod_momtum.F90:355-575 (single layer)."""
    jj, ii = ip.shape

    def g(a, j, i):
        return _get(a, j, i, per_j)

    # ---- dpmx (:355-396): max over adjacent u/v two-layer sums
    dpmx = np.full((jj, ii), 8. * CUTOFF)
    du = np.zeros((jj, ii))
    dv = np.zeros((jj, ii))
    for j in range(jj):
        for i in range(ii):
            if iu[j, i]:
                du[j, i] = dp[j, i] + g(dp, j, i - 1)
            if iv[j, i]:
                dv[j, i] = dp[j, i] + g(dp, j - 1, i)
    for j in range(jj):
        for i in range(ii):
            cands = [8. * CUTOFF]
            # u at (i,j) writes dpmx(i,j) and dpmx(i,j+1)
            if iu[j, i]:
                cands.append(du[j, i])
            if g(iu, j - 1, i):
                cands.append(g(du, j - 1, i))
            # v at (i,j) writes dpmx(i,j) and dpmx(i+1,j)
            if iv[j, i]:
                cands.append(dv[j, i])
            if g(iv, j, i - 1):
                cands.append(g(dv, j, i - 1))
            dpmx[j, i] = max(cands)

    vort = np.zeros((jj, ii))
    dpvor = np.full((jj, ii), CUTOFF)
    touched = np.zeros((jj, ii), bool)

    # ---- v-section boundary writes (:477-496), order: ifv then ilv
    jrange = range(jj) if per_j else range(jj)
    for j in jrange:
        for (i0, i1) in _runs(iv[j]):
            # section start: vort(i0) from v(i0)
            vort[j, i0] = vtotm[j, i0] * (1. - SLIP) * scvy[j, i0] \
                * scq2i[j, i0]
            dpvor[j, i0] = .125 * max(
                4. * (dp[j, i0] + g(dp, j - 1, i0)),
                dpmx[j, i0], g(dpmx, j, i0 + 1))
            touched[j, i0] = True
            # section end: vort(i1+1) from v(i1)
            if i1 + 1 < ii:
                vort[j, i1 + 1] = -vtotm[j, i1] * (1. - SLIP) \
                    * scvy[j, i1] * scq2i[j, i1 + 1]
                dpvor[j, i1 + 1] = .125 * max(
                    4. * (dp[j, i1] + g(dp, j - 1, i1)),
                    dpmx[j, i1], g(dpmx, j, i1 + 1))
                touched[j, i1 + 1] = True

    # ---- u-section boundary writes (:512-531), j-runs per column i,
    # AFTER the v loops (override at shared corners)
    for i in range(ii):
        col = iu[:, i]
        for (j0, j1) in _runs(col):
            vort[j0, i] = -utotm[j0, i] * (1. - SLIP) * scux[j0, i] \
                * scq2i[j0, i]
            dpvor[j0, i] = .125 * max(
                4. * (dp[j0, i] + g(dp, j0, i - 1)),
                dpmx[j0, i], g(dpmx, j0 + 1, i))
            touched[j0, i] = True
            jn = j1 + 1
            if jn < jj or per_j:
                jn2 = jn % jj if per_j else jn
                vort[jn2, i] = utotm[j1, i] * (1. - SLIP) * scux[j1, i] \
                    * scq2i[jn2, i]
                dpvor[jn2, i] = .125 * max(
                    4. * (dp[j1, i] + g(dp, j1, i - 1)),
                    dpmx[j1, i], g(dpmx, jn2, i))
                touched[jn2, i] = True

    # ---- interior q points (:560-575)
    for j in range(jj):
        for i in range(ii):
            if iq[j, i]:
                vort[j, i] = (vtotm[j, i] * scvy[j, i]
                              - g(vtotm * scvy, j, i - 1)
                              - utotm[j, i] * scux[j, i]
                              + g(utotm * scux, j - 1, i)) * scq2i[j, i]
                dpvor[j, i] = .125 * max(
                    2. * (dp[j, i] + g(dp, j, i - 1) + g(dp, j - 1, i)
                          + g(dp, j - 1, i - 1)),
                    dpmx[j, i], g(dpmx, j, i - 1), g(dpmx, j, i + 1),
                    g(dpmx, j - 1, i), g(dpmx, j + 1, i))
                touched[j, i] = True

    return (vort + corioq) / dpvor, touched


def _minmax_1d(hc, hm):
    """The enedis flux min/max adjustment (:664-716), scalars."""
    c1 = 1. - 1.5 * .5
    c2 = 1. - .5
    c3 = 2.
    slope = .5
    if abs(hc) < .1 * abs(hm):
        hm = 10. * hc
    elif abs(hc) > c1 * abs(hm):
        if abs(hc) < c2 * abs(hm):
            hc = 3. * hc + (1. - c2 * 3.) * hm
        elif abs(hc) <= c3 * abs(hm):
            hc = hm
        else:
            hc = slope * hc + (1. - c3 * slope) * hm
    return (min(hc, hm), max(hc, hm))


def oracle_coriolis(ip, iu, iv, dp, utotm, vtotm, uflux, vflux, potvor,
                    mommth, per_j=True):
    """cau/cav per mod_momtum.F90:664-838 (single layer)."""
    jj, ii = ip.shape

    def g(a, j, i):
        return _get(a, j, i, per_j)

    cau = np.zeros((jj, ii))
    cav = np.zeros((jj, ii))

    if mommth == 'enedis':
        uh_min = np.zeros((jj, ii))
        uh_max = np.zeros((jj, ii))
        vh_min = np.zeros((jj, ii))
        vh_max = np.zeros((jj, ii))
        for j in range(jj):
            for i in range(ii):
                if iu[j, i]:
                    uhc = .5 * utotm[j, i] * (dp[j, i] + g(dp, j, i - 1))
                    uh_min[j, i], uh_max[j, i] = _minmax_1d(
                        uhc, uflux[j, i])
                if iv[j, i]:
                    vhc = .5 * vtotm[j, i] * (dp[j, i] + g(dp, j - 1, i))
                    vh_min[j, i], vh_max[j, i] = _minmax_1d(
                        vhc, vflux[j, i])

    for j in range(jj):
        for i in range(ii):
            if iu[j, i]:
                if mommth == 'enscon':
                    cau[j, i] = .125 * (
                        vflux[j, i] + g(vflux, j + 1, i)
                        + g(vflux, j, i - 1) + g(vflux, j + 1, i - 1)) \
                        * (potvor[j, i] + g(potvor, j + 1, i))
                elif mommth == 'enecon':
                    cau[j, i] = .25 * (
                        (vflux[j, i] + g(vflux, j, i - 1)) * potvor[j, i]
                        + (g(vflux, j + 1, i) + g(vflux, j + 1, i - 1))
                        * g(potvor, j + 1, i))
                else:
                    pvn = g(potvor, j + 1, i)
                    s1 = pvn * utotm[j, i]
                    if s1 == 0.:
                        t1 = pvn * ((g(vh_max, j + 1, i)
                                     + g(vh_max, j + 1, i - 1))
                                    + (g(vh_min, j + 1, i)
                                       + g(vh_min, j + 1, i - 1))) * .5
                    elif s1 < 0.:
                        t1 = pvn * (g(vh_max, j + 1, i)
                                    + g(vh_max, j + 1, i - 1))
                    else:
                        t1 = pvn * (g(vh_min, j + 1, i)
                                    + g(vh_min, j + 1, i - 1))
                    pv0 = potvor[j, i]
                    s2 = pv0 * utotm[j, i]
                    if s2 == 0.:
                        t2 = pv0 * ((vh_max[j, i] + g(vh_max, j, i - 1))
                                    + (vh_min[j, i]
                                       + g(vh_min, j, i - 1))) * .5
                    elif s2 < 0.:
                        t2 = pv0 * (vh_max[j, i] + g(vh_max, j, i - 1))
                    else:
                        t2 = pv0 * (vh_min[j, i] + g(vh_min, j, i - 1))
                    cau[j, i] = .25 * (t1 + t2)
            if iv[j, i]:
                if mommth == 'enscon':
                    cav[j, i] = -.125 * (
                        uflux[j, i] + g(uflux, j, i + 1)
                        + g(uflux, j - 1, i) + g(uflux, j - 1, i + 1)) \
                        * (potvor[j, i] + g(potvor, j, i + 1))
                elif mommth == 'enecon':
                    cav[j, i] = -.25 * (
                        (uflux[j, i] + g(uflux, j - 1, i)) * potvor[j, i]
                        + (g(uflux, j, i + 1) + g(uflux, j - 1, i + 1))
                        * g(potvor, j, i + 1))
                else:
                    pve = g(potvor, j, i + 1)
                    s1 = pve * vtotm[j, i]
                    if s1 == 0.:
                        t1 = pve * ((g(uh_max, j, i + 1)
                                     + g(uh_max, j - 1, i + 1))
                                    + (g(uh_min, j, i + 1)
                                       + g(uh_min, j - 1, i + 1))) * .5
                    elif s1 > 0.:
                        t1 = pve * (g(uh_max, j, i + 1)
                                    + g(uh_max, j - 1, i + 1))
                    else:
                        t1 = pve * (g(uh_min, j, i + 1)
                                    + g(uh_min, j - 1, i + 1))
                    pv0 = potvor[j, i]
                    s2 = pv0 * vtotm[j, i]
                    if s2 == 0.:
                        t2 = pv0 * ((uh_max[j, i] + g(uh_max, j - 1, i))
                                    + (uh_min[j, i]
                                       + g(uh_min, j - 1, i))) * .5
                    elif s2 > 0.:
                        t2 = pv0 * (uh_max[j, i] + g(uh_max, j - 1, i))
                    else:
                        t2 = pv0 * (uh_min[j, i] + g(uh_min, j - 1, i))
                    cav[j, i] = -.25 * (t2 + t1)
    return cau, cav
