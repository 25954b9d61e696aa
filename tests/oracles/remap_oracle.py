"""Loop-level numpy oracle of incremental-remapping advection.

Transcribed independently from /root/reference/phy/mod_remap.F90
remap:205-1522 with the polygon moment primitives triint:53-102 and
penint:104-199 (use_TRC generic tracer stack, natr = 0 — the ATRC
second-moment path is not used in any shipped configuration): limited
linear reconstructions of thickness and tracers, non-dimensional edge
and corner velocities, the per-edge upwind polygon flux assembly
(pentagon + corner triangles), and the conservative cell update.
Pure numpy, 0-based (j, i); per-axis periodicity flags.  Double-entry
parity partner of dynamics/remap.remap_layer (PARITY.md methodology)."""

import numpy as np

DPEPS = 1.e-12


def triint(ac, x1, y1, x2, y2, x3, y3):
    xx = x1 * x2 + x2 * x3 + x1 * x3
    yy = y1 * y2 + y2 * y3 + y1 * y3
    xy = x1 * y1 + x2 * y2 + x3 * y3
    a = .5 * ((x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)) * ac
    ax = (x1 + x2 + x3) / 3.
    ay = (y1 + y2 + y3) / 3.
    axx = (9. * ax * ax - xx) / 6.
    ayy = (9. * ay * ay - yy) / 6.
    axy = (9. * ax * ay + xy) / 12.
    return a, ax * a, ay * a, axx * a, ayy * a, axy * a


def penint(ac, x1, y1, x2, y2, x3, y3, x4, y4, x5, y5):
    m1 = triint(ac, x1, y1, x2, y2, x3, y3)
    m2 = triint(ac, x1, y1, x3, y3, x5, y5)
    m3 = triint(ac, x3, y3, x4, y4, x5, y5)
    return tuple(p + q + r for p, q, r in zip(m1, m2, m3))


def remap_oracle(ip, iu, iv, scp2, scp2i, pbmin, pbu, pbv, plo,
                 cau, cav, dp_in, tr_in,
                 periodic_i=True, periodic_j=False):
    """One layer of remap.  tr_in: (ntr, jj, ii).  Returns
    (dp_new, tr_new, fdu, fdv, ftru, ftrv)."""
    jj, ii = dp_in.shape
    ntr = tr_in.shape[0]

    def I(i):                                         # noqa: E743
        return i % ii if periodic_i else min(max(i, 0), ii - 1)

    def J(j):
        return j % jj if periodic_j else min(max(j, 0), jj - 1)

    dp = np.where(ip > 0, np.maximum(0., dp_in) + DPEPS, dp_in + DPEPS)
    pup = plo - dp
    tr = tr_in.copy()

    dx = np.zeros((jj, ii))
    dy = np.zeros((jj, ii))
    xd = np.zeros((jj, ii))
    yd = np.zeros((jj, ii))
    trx = np.zeros((ntr, jj, ii))
    try_ = np.zeros((ntr, jj, ii))
    trd = tr.copy()

    # limited gradients (mod_remap.F90:360-590)
    for j in range(jj):
        for i in range(ii):
            if ip[j, i] == 0:
                continue
            iw = I(i - 1) if iu[j, i] else i
            ie = I(i + 1) if iu[j, I(i + 1)] else i
            js = J(j - 1) if iv[j, i] else j
            jn = J(j + 1) if iv[J(j + 1), i] else j
            dxi = 1.0 / max(1, int(iu[j, i]) + int(iu[j, I(i + 1)]))
            dyi = 1.0 / max(1, int(iv[j, i]) + int(iv[J(j + 1), i]))

            def dg(iq, jq):
                # diagonal with both-coordinate fallback (:370-383)
                if ip[jq, iq]:
                    return iq, jq
                return i, j

            isw, jsw = dg(iw, js)
            ise, jse = dg(ie, js)
            inw, jnw = dg(iw, jn)
            ine, jne = dg(ie, jn)

            def cdp(iq, jq):
                return max(DPEPS, min(pbmin[j, i] - pup[jq, iq],
                                      dp[jq, iq]))

            dpsw, dps, dpse = cdp(isw, jsw), cdp(i, js), cdp(ise, jse)
            dpw, dpc, dpe = cdp(iw, j), cdp(i, j), cdp(ie, j)
            dpnw, dpn, dpne = cdp(inw, jnw), cdp(i, jn), cdp(ine, jne)
            dx[j, i] = (dpe - dpw) * dxi
            dy[j, i] = (dpn - dps) * dyi
            dgmx = .5 * (abs(dx[j, i]) + abs(dy[j, i]))
            dfmx = max(0., max(dpsw, dps, dpse, dpw, dpe,
                               dpnw, dpn, dpne) - dpc)
            dfmn = min(0., min(dpsw, dps, dpse, dpw, dpe,
                               dpnw, dpn, dpne) - dpc)
            if dfmx > 0. and dfmn < 0.:
                q = min(dfmx / max(dfmx, dgmx), dfmn / min(dfmn, -dgmx))
                dx[j, i] *= q
                dy[j, i] *= q
                xd[j, i] = dx[j, i] / (12. * dp[j, i])
                yd[j, i] = dy[j, i] / (12. * dp[j, i])
            else:
                dx[j, i] = dy[j, i] = xd[j, i] = yd[j, i] = 0.

            for nt in range(ntr):
                c = tr[nt]
                gx = (c[j, ie] - c[j, iw]) * dxi
                gy = (c[jn, i] - c[js, i]) * dyi
                q1 = gx * (-.5 - xd[j, i])
                q2 = gx * (.5 - xd[j, i])
                q3 = gy * (-.5 - yd[j, i])
                q4 = gy * (.5 - yd[j, i])
                tgmx = max(q1, q2) + max(q3, q4)
                tgmn = min(q1, q2) + min(q3, q4)
                nb = [c[jsw, isw], c[js, i], c[jse, ise], c[j, iw],
                      c[j, ie], c[jnw, inw], c[jn, i], c[jne, ine]]
                tfmx = max(0., max(nb) - c[j, i])
                tfmn = min(0., min(nb) - c[j, i])
                if tfmx > 0. and tfmn < 0.:
                    q = min(tfmx / max(tfmx, tgmx),
                            tfmn / min(tfmn, tgmn))
                    trx[nt, j, i] = gx * q
                    try_[nt, j, i] = gy * q
                    trd[nt, j, i] = c[j, i] - gx * q * xd[j, i] \
                        - gy * q * yd[j, i]
                else:
                    trx[nt, j, i] = try_[nt, j, i] = 0.
                    trd[nt, j, i] = c[j, i]

    # non-dimensional velocities (:592-611)
    cu = np.zeros((jj, ii))
    cv = np.zeros((jj, ii))
    for j in range(jj):
        for i in range(ii):
            if iu[j, i]:
                cu[j, i] = cau[j, i] * (scp2i[j, I(i - 1)]
                                        if cau[j, i] > 0.
                                        else scp2i[j, i])
            if iv[j, i]:
                cv[j, i] = cav[j, i] * (scp2i[J(j - 1), i]
                                        if cav[j, i] > 0.
                                        else scp2i[j, i])

    # corner velocities (:613-656)
    cuc = np.zeros((jj, ii))
    cvc = np.zeros((jj, ii))
    for j in range(jj):
        for i in range(ii):
            iw, js = I(i - 1), J(j - 1)
            nw = ip[js, iw] + ip[js, i] + ip[j, iw] + ip[j, i]
            if nw == 4:
                if cu[js, i] * cu[j, i] <= 0.:
                    cuc[j, i] = 0.
                else:
                    cuc[j, i] = 2. * cu[js, i] * cu[j, i] \
                        / (cu[js, i] + cu[j, i])
                if cv[j, iw] * cv[j, i] <= 0.:
                    cvc[j, i] = 0.
                else:
                    cvc[j, i] = 2. * cv[j, iw] * cv[j, i] \
                        / (cv[j, iw] + cv[j, i])
            elif nw == 2:
                if ip[js, iw] + ip[js, i] == 2:
                    cuc[j, i] = cu[js, i]
                elif ip[j, iw] + ip[j, i] == 2:
                    cuc[j, i] = cu[j, i]
                elif ip[js, iw] + ip[j, iw] == 2:
                    cvc[j, i] = cv[j, iw]
                elif ip[js, i] + ip[j, i] == 2:
                    cvc[j, i] = cv[j, i]

    fdu = np.zeros((jj, ii))
    ftu = np.zeros((ntr, jj, ii))
    fdv = np.zeros((jj, ii))
    ftv = np.zeros((ntr, jj, ii))

    def add_contrib(acc_d, acc_t, j, i, m, jq, iq, pb_e):
        a, ax, ay, axx, ayy, axy = m
        dl = min(dp[jq, iq], max(0., pb_e - pup[jq, iq]))
        fd = a * dl + ax * dx[jq, iq] + ay * dy[jq, iq]
        acc_d[j, i] += fd
        qx = ax * dl + axx * dx[jq, iq] + axy * dy[jq, iq]
        qy = ay * dl + axy * dx[jq, iq] + ayy * dy[jq, iq]
        for nt in range(ntr):
            acc_t[nt, j, i] += fd * trd[nt, jq, iq] \
                + qx * trx[nt, jq, iq] + qy * try_[nt, jq, iq]

    # u-component fluxes (:662-1060)
    for j in range(jj):
        for i in range(ii):
            if not iu[j, i]:
                continue
            jn, iw = J(j + 1), I(i - 1)
            ym = -.5 * (cvc[j, i] + cvc[jn, i])
            xm = ((ym + .5) * cuc[j, i] - (ym - .5) * cuc[jn, i]
                  - 2. * cu[j, i]) / (1. + cvc[j, i] - cvc[jn, i])
            if cu[j, i] > 0.:
                if cvc[j, i] > 0.:
                    js = J(j - 1)
                    xc0 = (xm * cvc[j, i] - cuc[j, i] * (ym + .5)) \
                        / (cvc[j, i] + ym + .5)
                    xc1 = xc0 * scp2[j, iw] * scp2i[js, iw]
                    x4, y4 = xc0 + .5, -.5
                    m = triint(scp2[js, iw], xc1 + .5, .5,
                               -cuc[j, i] + .5, -cvc[j, i] + .5, .5, .5)
                    add_contrib(fdu, ftu, j, i, m, js, iw, pbu[j, i])
                else:
                    x4, y4 = -cuc[j, i] + .5, -cvc[j, i] - .5
                if cvc[jn, i] < 0.:
                    xc0 = (xm * cvc[jn, i] - cuc[jn, i] * (ym - .5)) \
                        / (cvc[jn, i] + ym - .5)
                    xc1 = xc0 * scp2[j, iw] * scp2i[jn, iw]
                    x2, y2 = xc0 + .5, .5
                    m = triint(scp2[jn, iw], xc1 + .5, -.5, .5, -.5,
                               -cuc[jn, i] + .5, -cvc[jn, i] - .5)
                    add_contrib(fdu, ftu, j, i, m, jn, iw, pbu[j, i])
                else:
                    x2, y2 = -cuc[jn, i] + .5, -cvc[jn, i] + .5
                m = penint(scp2[j, iw], .5, .5, x2, y2, xm + .5, ym,
                           x4, y4, .5, -.5)
                add_contrib(fdu, ftu, j, i, m, j, iw, pbu[j, i])
            else:
                if cvc[j, i] > 0.:
                    js = J(j - 1)
                    xc0 = (xm * cvc[j, i] - cuc[j, i] * (ym + .5)) \
                        / (cvc[j, i] + ym + .5)
                    xc1 = xc0 * scp2[j, i] * scp2i[js, i]
                    x4, y4 = xc0 - .5, -.5
                    m = triint(scp2[js, i], xc1 - .5, .5,
                               -cuc[j, i] - .5, -cvc[j, i] + .5,
                               -.5, .5)
                    add_contrib(fdu, ftu, j, i, m, js, i, pbu[j, i])
                else:
                    x4, y4 = -cuc[j, i] - .5, -cvc[j, i] - .5
                if cvc[jn, i] < 0.:
                    xc0 = (xm * cvc[jn, i] - cuc[jn, i] * (ym - .5)) \
                        / (cvc[jn, i] + ym - .5)
                    xc1 = xc0 * scp2[j, i] * scp2i[jn, i]
                    x2, y2 = xc0 - .5, .5
                    m = triint(scp2[jn, i], xc1 - .5, -.5, -.5, -.5,
                               -cuc[jn, i] - .5, -cvc[jn, i] - .5)
                    add_contrib(fdu, ftu, j, i, m, jn, i, pbu[j, i])
                else:
                    x2, y2 = -cuc[jn, i] - .5, -cvc[jn, i] + .5
                m = penint(scp2[j, i], -.5, .5, x2, y2, xm - .5, ym,
                           x4, y4, -.5, -.5)
                add_contrib(fdu, ftu, j, i, m, j, i, pbu[j, i])

    # v-component fluxes (:1066-1455)
    for j in range(jj):
        for i in range(ii):
            if not iv[j, i]:
                continue
            ie, js = I(i + 1), J(j - 1)
            xm = -.5 * (cuc[j, i] + cuc[j, ie])
            ym = ((xm + .5) * cvc[j, i] - (xm - .5) * cvc[j, ie]
                  - 2. * cv[j, i]) / (1. + cuc[j, i] - cuc[j, ie])
            if cv[j, i] > 0.:
                if cuc[j, i] > 0.:
                    iw = I(i - 1)
                    yc0 = (ym * cuc[j, i] - cvc[j, i] * (xm + .5)) \
                        / (cuc[j, i] + xm + .5)
                    yc1 = yc0 * scp2[js, i] * scp2i[js, iw]
                    x2, y2 = -.5, yc0 + .5
                    m = triint(scp2[js, iw], .5, yc1 + .5, .5, .5,
                               -cuc[j, i] + .5, -cvc[j, i] + .5)
                    add_contrib(fdv, ftv, j, i, m, js, iw, pbv[j, i])
                else:
                    x2, y2 = -cuc[j, i] - .5, -cvc[j, i] + .5
                if cuc[j, ie] < 0.:
                    yc0 = (ym * cuc[j, ie] - cvc[j, ie] * (xm - .5)) \
                        / (cuc[j, ie] + xm - .5)
                    yc1 = yc0 * scp2[js, i] * scp2i[js, ie]
                    x4, y4 = .5, yc0 + .5
                    m = triint(scp2[js, ie], -.5, yc1 + .5,
                               -cuc[j, ie] - .5, -cvc[j, ie] + .5,
                               -.5, .5)
                    add_contrib(fdv, ftv, j, i, m, js, ie, pbv[j, i])
                else:
                    x4, y4 = -cuc[j, ie] + .5, -cvc[j, ie] + .5
                m = penint(scp2[js, i], -.5, .5, x2, y2, xm, ym + .5,
                           x4, y4, .5, .5)
                add_contrib(fdv, ftv, j, i, m, js, i, pbv[j, i])
            else:
                if cuc[j, i] > 0.:
                    iw = I(i - 1)
                    yc0 = (ym * cuc[j, i] - cvc[j, i] * (xm + .5)) \
                        / (cuc[j, i] + xm + .5)
                    yc1 = yc0 * scp2[j, i] * scp2i[j, iw]
                    x2, y2 = -.5, yc0 - .5
                    m = triint(scp2[j, iw], .5, yc1 - .5, .5, -.5,
                               -cuc[j, i] + .5, -cvc[j, i] - .5)
                    add_contrib(fdv, ftv, j, i, m, j, iw, pbv[j, i])
                else:
                    x2, y2 = -cuc[j, i] - .5, -cvc[j, i] - .5
                if cuc[j, ie] < 0.:
                    yc0 = (ym * cuc[j, ie] - cvc[j, ie] * (xm - .5)) \
                        / (cuc[j, ie] + xm - .5)
                    yc1 = yc0 * scp2[j, i] * scp2i[j, ie]
                    x4, y4 = .5, yc0 - .5
                    m = triint(scp2[j, ie], -.5, yc1 - .5,
                               -cuc[j, ie] - .5, -cvc[j, ie] - .5,
                               -.5, -.5)
                    add_contrib(fdv, ftv, j, i, m, j, ie, pbv[j, i])
                else:
                    x4, y4 = -cuc[j, ie] + .5, -cvc[j, ie] - .5
                m = penint(scp2[j, i], -.5, -.5, x2, y2, xm, ym - .5,
                           x4, y4, .5, -.5)
                add_contrib(fdv, ftv, j, i, m, j, i, pbv[j, i])

    # update (:1466-1517)
    dp_new = dp.copy()
    tr_new = tr.copy()
    for j in range(jj):
        for i in range(ii):
            if ip[j, i] == 0:
                continue
            ie, jn = I(i + 1), J(j + 1)
            q = dp[j, i]
            dnew = q - (fdu[j, ie] - fdu[j, i]
                        + fdv[jn, i] - fdv[j, i]) * scp2i[j, i]
            for nt in range(ntr):
                tr_new[nt, j, i] = (q * tr[nt, j, i]
                                    - (ftu[nt, j, ie] - ftu[nt, j, i]
                                       + ftv[nt, jn, i]
                                       - ftv[nt, j, i])
                                    * scp2i[j, i]) / dnew
            dp_new[j, i] = max(0., dnew - DPEPS)
    return dp_new, tr_new, fdu, fdv, ftu, ftv
