"""Loop-level numpy oracle of the geopotential-method PGF.

Transcribed independently from /root/reference/phy/mod_pgforc.F90:
the pgforc driver's dpu/dpv refresh (:450-478), pgforc_geopotential
(:95-260 — column phi/phip build, the per-column kup/kum while-loop
walks, the xix/pgf accumulations) and the driver finalization
(:539-594), with the reference's own series delphi
(mod_eos.F90:478-529, coefficients :36-54).  Pure numpy, 0-based
(j, i); j reads wrap (periodic channel), out-of-range i reads are 0.

Double-entry parity partner of dynamics/pgforc.pgforc with
pgfmth='geopotential' (PARITY.md methodology)."""

import numpy as np

# mod_eos.F90:36-54
A11, A12, A13 = 9.9985372432159340e+02, 1.0380621928183473e+01, \
    1.7073577195684715e+00
A14, A15, A16 = -3.6570490496333680e-02, -7.3677944503527477e-03, \
    -3.5529175999643348e-03
B11, B12, B13 = 1.7083494994335439e-06, 7.1567921402953455e-09, \
    1.2821026080049485e-09
A21, A22, A23 = 1.0, 1.0316374535350838e-02, 8.9521792365142522e-04
A24, A25, A26 = -2.8438341552142710e-05, -1.1887778959461776e-05, \
    -4.0163964812921489e-06
B21, B22, B23 = 1.1995545126831476e-09, 5.5234008384648383e-12, \
    8.4310335919950873e-13

EPSILP = 1.e-12


def delphi(p1, p2, th, s):
    """Series geopotential difference + edge specific volumes
    (mod_eos.F90:478-529)."""
    a1 = A11 + (A12 + A14 * th + A15 * s) * th + (A13 + A16 * s) * s
    a2 = A21 + (A22 + A24 * th + A25 * s) * th + (A23 + A26 * s) * s
    b1 = B11 + B12 * th + B13 * s
    b2 = B21 + B22 * th + B23 * s
    pm = .5 * (p2 + p1)
    r = .5 * (p2 - p1) / (a1 + b1 * pm)
    q = b1 * r
    qq = q * q
    r1_3, r1_5, r1_7, r1_9 = 1. / 3., .2, 1. / 7., 1. / 9.
    dphi = -2. * r * (a2 + b2 * pm
                      + (a2 - a1 * b2 / b1) * qq
                      * (r1_3 + qq * (r1_5 + qq * (r1_7 + qq * r1_9))))
    alp1 = (a2 + b2 * p1) / (a1 + b1 * p1)
    alp2 = (a2 + b2 * p2) / (a1 + b1 * p2)
    return dphi, alp1, alp2


def oracle_pgforc_geo(ip, iu, iv, dp, temp, saln, phib, pb_p, pbu_p,
                      pbv_p):
    """All PGF fields after one geopotential-method pgforc call.

    dp/temp/saln: (kk, jj, ii) at the new time level; phib: bottom
    geopotential (jj, ii); pb_p/pbu_p/pbv_p: predicted bottom
    pressures.  Returns a dict of numpy arrays."""
    kk, jj, ii = dp.shape

    def gj(a, j):
        return a[..., j % jj, :]

    # ---- interface pressures p and velocity-point dpu/dpv/pu/pv
    # (driver, mod_pgforc.F90:450-478)
    p = np.zeros((kk + 1, jj, ii))
    for k in range(kk):
        p[k + 1] = np.where(ip > 0, p[k] + dp[k], 0.)
    dpu = np.zeros((kk, jj, ii))
    dpv = np.zeros((kk, jj, ii))
    pu = np.zeros((kk + 1, jj, ii))
    pv = np.zeros((kk + 1, jj, ii))
    for j in range(jj):
        for i in range(ii):
            if iu[j, i] and i >= 1:
                q = min(p[kk, j, i], p[kk, j, i - 1])
                for k in range(kk):
                    dpu[k, j, i] = .5 * (
                        (min(q, p[k + 1, j, i - 1])
                         - min(q, p[k, j, i - 1]))
                        + (min(q, p[k + 1, j, i]) - min(q, p[k, j, i])))
                    pu[k + 1, j, i] = pu[k, j, i] + dpu[k, j, i]
            if iv[j, i]:
                jm = (j - 1) % jj
                q = min(p[kk, j, i], p[kk, jm, i])
                for k in range(kk):
                    dpv[k, j, i] = .5 * (
                        (min(q, p[k + 1, jm, i]) - min(q, p[k, jm, i]))
                        + (min(q, p[k + 1, j, i]) - min(q, p[k, j, i])))
                    pv[k + 1, j, i] = pv[k, j, i] + dpv[k, j, i]

    # ---- phi / phip columns (pgforc_geopotential, :111-135)
    phi = np.zeros((kk + 1, jj, ii))
    phip = np.zeros((kk + 1, jj, ii))
    phi[kk] = phib
    for j in range(jj):
        for i in range(ii):
            if not ip[j, i]:
                continue
            for k in range(kk - 1, -1, -1):
                if dp[k, j, i] < EPSILP:
                    phi[k, j, i] = phi[k + 1, j, i]
                    phip[k, j, i] = phip[k + 1, j, i]
                else:
                    dph, alpu, alpl = delphi(
                        p[k, j, i], p[k + 1, j, i], temp[k, j, i],
                        saln[k, j, i])
                    phi[k, j, i] = phi[k + 1, j, i] - dph
                    phip[k, j, i] = phip[k + 1, j, i] \
                        + p[k + 1, j, i] * alpl - p[k, j, i] * alpu

    pgfx = np.zeros((kk, jj, ii))
    pgfy = np.zeros((kk, jj, ii))
    pgfxm = np.zeros((jj, ii))
    pgfym = np.zeros((jj, ii))
    xixp = np.zeros((jj, ii))
    xixm = np.zeros((jj, ii))
    xiyp = np.zeros((jj, ii))
    xiym = np.zeros((jj, ii))

    # ---- u/v PGF accumulations with the kup/kum walks (:142-257)
    for j in range(jj):
        jm = (j - 1) % jj
        for i in range(ii):
            if iu[j, i] and i >= 1:
                kup = kum = kk
                for k in range(kk - 1, -1, -1):
                    prs = pu[k + 1, j, i] - .5 * dpu[k, j, i]
                    while p[kup, j, i] > prs:
                        kup -= 1
                    while p[kum, j, i - 1] > prs:
                        kum -= 1
                    dphip, alpup, alplp = delphi(
                        prs, p[kup + 1, j, i], temp[kup, j, i],
                        saln[kup, j, i])
                    dphim, alpum, alplm = delphi(
                        prs, p[kum + 1, j, i - 1], temp[kum, j, i - 1],
                        saln[kum, j, i - 1])
                    cp = .25 * (p[k + 1, j, i] + p[k, j, i])
                    cm = .25 * (p[k + 1, j, i - 1] + p[k, j, i - 1])
                    q = prs / (cp + cm)
                    cp, cm = q * cp, q * cm
                    phi_p = phi[kup + 1, j, i] - dphip
                    xixp[j, i] += (phip[kup + 1, j, i]
                                   + p[kup + 1, j, i] * alplp
                                   - cp * (alpup - alpum)) * dpu[k, j, i]
                    phi_m = phi[kum + 1, j, i - 1] - dphim
                    xixm[j, i] += (phip[kum + 1, j, i - 1]
                                   + p[kum + 1, j, i - 1] * alplm
                                   - cm * (alpum - alpup)) * dpu[k, j, i]
                    pgfx[k, j, i] = -(phi_p - phi_m)
                    pgfxm[j, i] += pgfx[k, j, i] * dpu[k, j, i]
            if iv[j, i]:
                kvp = kvm = kk
                for k in range(kk - 1, -1, -1):
                    prs = pv[k + 1, j, i] - .5 * dpv[k, j, i]
                    while p[kvp, j, i] > prs:
                        kvp -= 1
                    while p[kvm, jm, i] > prs:
                        kvm -= 1
                    dphip, alpup, alplp = delphi(
                        prs, p[kvp + 1, j, i], temp[kvp, j, i],
                        saln[kvp, j, i])
                    dphim, alpum, alplm = delphi(
                        prs, p[kvm + 1, jm, i], temp[kvm, jm, i],
                        saln[kvm, jm, i])
                    cp = .25 * (p[k + 1, j, i] + p[k, j, i])
                    cm = .25 * (p[k + 1, jm, i] + p[k, jm, i])
                    q = prs / (cp + cm)
                    cp, cm = q * cp, q * cm
                    phi_p = phi[kvp + 1, j, i] - dphip
                    xiyp[j, i] += (phip[kvp + 1, j, i]
                                   + p[kvp + 1, j, i] * alplp
                                   - cp * (alpup - alpum)) * dpv[k, j, i]
                    phi_m = phi[kvm + 1, jm, i] - dphim
                    xiym[j, i] += (phip[kvm + 1, jm, i]
                                   + p[kvm + 1, jm, i] * alplm
                                   - cm * (alpum - alpup)) * dpv[k, j, i]
                    pgfy[k, j, i] = -(phi_p - phi_m)
                    pgfym[j, i] += pgfy[k, j, i] * dpv[k, j, i]

    # ---- driver finalization (:539-594)
    for j in range(jj):
        jm = (j - 1) % jj
        for i in range(ii):
            if iu[j, i] and i >= 1:
                q = 1. / pbu_p[j, i]
                pgfxm[j, i] *= q
                xixp[j, i] *= q
                xixm[j, i] *= q
                for k in range(kk):
                    pgfx[k, j, i] -= pgfxm[j, i]
                pgfxm[j, i] += xixp[j, i] - xixm[j, i]
                xixp[j, i] /= pb_p[j, i]
                xixm[j, i] /= pb_p[j, i - 1]
            if iv[j, i]:
                q = 1. / pbv_p[j, i]
                pgfym[j, i] *= q
                xiyp[j, i] *= q
                xiym[j, i] *= q
                for k in range(kk):
                    pgfy[k, j, i] -= pgfym[j, i]
                pgfym[j, i] += xiyp[j, i] - xiym[j, i]
                xiyp[j, i] /= pb_p[j, i]
                xiym[j, i] /= pb_p[jm, i]

    return dict(phi=phi, pgfx=pgfx, pgfy=pgfy, pgfxm=pgfxm,
                pgfym=pgfym, xixp=xixp, xixm=xixm, xiyp=xiyp,
                xiym=xiym, dpu=dpu, dpv=dpv)
