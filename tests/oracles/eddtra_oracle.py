"""Loop-level numpy oracle of the ALE Gent-McWilliams eddy transport.

Transcribed independently from /root/reference/phy/mod_eddtra.F90
eddtra_ale:1001-1800 with mlrmth='none' (upssmx/upssmy = 0, so the
submesoscale branch and the GM/SM split adjustment collapse to the GM
flux): per u/v velocity point, the interface GM mass flux is
-kappa*nslp*et2mf below the (time-filtered, here prescribed) mixed
layer, ramped linearly through the mixed layer, then flux-limited by
the converge-until-done alternating up/down depletion sweeps
(:1312-1412) and differenced into layer mass fluxes (:1438-1460).
Pure numpy, 0-based (k, j, i); per-axis periodicity flags.
Double-entry parity partner of dynamics/eddtra.eddtra
(PARITY.md methodology)."""

import numpy as np

GRAV = 9.806
RHO0 = 1.e3               # (mod_constants.F90:39)
ONEM = 9806.              # one metre in pressure units [Pa]
EPSILP = 1.e-12
FFAC = .0625
FFACE = .99 * FFAC
EPS = 1.e-14


def _limit(mfl, kmax, dlm, dlp, scp2m, scp2c, mfleps):
    """Alternating-direction depletion limiter (mod_eddtra.F90:1312-1412).

    mfl: (kk+2,) 1-based interface fluxes (index 0 unused); dlm/dlp:
    (kk+1,) 1-based depletable thicknesses of the minus/plus cells."""
    changed = True
    niter = 0
    kdir = 1
    while changed:
        niter += 1
        assert niter < 1000, 'no convergence'
        changed = False
        kdir = -kdir
        ks = (1 + kdir + (1 - kdir) * kmax) // 2
        ke = (1 - kdir + (1 + kdir) * kmax) // 2
        for k in range(ks, ke + kdir, kdir):
            if abs(mfl[k + 1] - mfl[k]) <= \
                    max(mfleps, EPS * abs(mfl[k + 1] + mfl[k])):
                continue
            if mfl[k + 1] - mfl[k] > FFAC * max(EPSILP, dlm[k]) * scp2m:
                q = FFACE * dlm[k] * scp2m
                if mfl[k + 1] > -mfl[k]:
                    if mfl[k] > -.5 * q:
                        mfl[k + 1] = mfl[k] + q
                    else:
                        mfl[k + 1] = .5 * q
                        mfl[k] = -mfl[k + 1]
                else:
                    if mfl[k + 1] < .5 * q:
                        mfl[k] = mfl[k + 1] - q
                    else:
                        mfl[k] = -.5 * q
                        mfl[k + 1] = -mfl[k]
                changed = True
            elif mfl[k + 1] - mfl[k] < -FFAC * max(EPSILP, dlp[k]) * scp2c:
                q = FFACE * dlp[k] * scp2c
                if mfl[k + 1] < -mfl[k]:
                    if mfl[k] < .5 * q:
                        mfl[k + 1] = mfl[k] - q
                    else:
                        mfl[k + 1] = -.5 * q
                        mfl[k] = -mfl[k + 1]
                else:
                    if mfl[k + 1] > -.5 * q:
                        mfl[k] = mfl[k + 1] + q
                    else:
                        mfl[k] = .5 * q
                        mfl[k + 1] = -mfl[k]
                changed = True
    return mfl


def _edge_flux(kk, pm, pc, dpuv, pbuv, dpm, dpc, difm, difc,
               nslp_e, hmlm, hmlc, scp2m, scp2c, scuv2, scuvy, delt1):
    """One velocity point: p/dp/dif of the minus-side (m) and center (c)
    columns, edge slope nslp_e (kk+1,), returns layer fluxes (kk,)."""
    mfleps = EPS * EPSILP * scuv2
    et2mf = -GRAV * RHO0 * delt1 * scuvy

    ptuv = max(pm[0], pc[0])
    puv = np.zeros(kk + 2)           # 1-based interfaces 1..kk+1
    puv[1] = ptuv
    kmax = 1
    for k in range(1, kk + 1):
        puv[k + 1] = puv[k] + dpuv[k - 1]
        if dpm[k - 1] > EPSILP or dpc[k - 1] > EPSILP:
            kmax = k

    hml = .5 * (hmlm + hmlc)
    pml = min(puv[1] + hml * ONEM, puv[kmax + 1])
    dpmli = 1.0 / max(pml - puv[1], 1e-300)

    kml = kmax + 1
    for k in range(kmax, 1, -1):
        if puv[k] > pml:
            kml = k
        else:
            break

    mflgm = np.zeros(kk + 2)
    for k in range(kml, kmax + 1):
        kappa = .25 * (difm[k - 2] + difc[k - 2]
                       + difm[k - 1] + difc[k - 1])
        mflgm[k] = -kappa * nslp_e[k - 1] * et2mf
    mflgm[kmax + 1] = 0.
    mflgm[1] = 0.
    for k in range(2, kml):
        mflgm[k] = mflgm[kml] * (puv[k] - puv[1]) * dpmli

    mfl = mflgm.copy()       # mflsm = 0 for mlrmth='none'

    dlm = np.zeros(kk + 1)
    dlp = np.zeros(kk + 1)
    for k in range(1, kmax + 1):
        dlm[k] = max(0., min(pm[k], pbuv) - max(pm[k - 1], ptuv))
        dlp[k] = max(0., min(pc[k], pbuv) - max(pc[k - 1], ptuv))

    mfl = _limit(mfl, kmax, dlm, dlp, scp2m, scp2c, mfleps)

    # zero fluxes below the roundoff threshold (:1400-1412 head of the
    # GM/SM split-adjust loop — with mflsm = 0 only the zeroing acts)
    for k in range(1, kmax + 2):
        if abs(mfl[k]) < mfleps:
            mfl[k] = 0.

    out = np.zeros(kk)
    for k in range(1, kmax + 1):
        if abs(mfl[k + 1] - mfl[k]) > \
                max(mfleps, EPS * abs(mfl[k + 1] + mfl[k])):
            out[k - 1] = mfl[k + 1] - mfl[k]
    return out


def eddtra_ale_oracle(ip, iu, iv, scp2, scu2, scv2, scuy, scvx,
                      p, dp, dpu, dpv, pbu, pbv, difint,
                      nslpx, nslpy, hml_tfbnd, delt1,
                      periodic_i=True, periodic_j=False):
    """Returns (umfltd, vmfltd), each (kk, jj, ii).

    p: (kk+1, jj, ii) scalar interface pressures; difint (kk, jj, ii);
    nslpx/nslpy (kk+1, jj, ii) interface neutral slopes at velocity
    points; hml_tfbnd (jj, ii) mixed-layer thickness [m]."""
    kk, jj, ii = dp.shape
    umfltd = np.zeros_like(dp)
    vmfltd = np.zeros_like(dp)
    for j in range(jj):
        for i in range(ii):
            if iu[j, i] != 0 and (periodic_i or i > 0):
                iw = (i - 1) % ii
                umfltd[:, j, i] = _edge_flux(
                    kk, p[:, j, iw], p[:, j, i], dpu[:, j, i],
                    pbu[j, i], dp[:, j, iw], dp[:, j, i],
                    difint[:, j, iw], difint[:, j, i],
                    nslpx[:, j, i], hml_tfbnd[j, iw], hml_tfbnd[j, i],
                    scp2[j, iw], scp2[j, i], scu2[j, i], scuy[j, i],
                    delt1)
            if iv[j, i] != 0 and (periodic_j or j > 0):
                js = (j - 1) % jj
                vmfltd[:, j, i] = _edge_flux(
                    kk, p[:, js, i], p[:, j, i], dpv[:, j, i],
                    pbv[j, i], dp[:, js, i], dp[:, j, i],
                    difint[:, js, i], difint[:, j, i],
                    nslpy[:, j, i], hml_tfbnd[js, i], hml_tfbnd[j, i],
                    scp2[js, i], scp2[j, i], scv2[j, i], scvx[j, i],
                    delt1)
    return umfltd, vmfltd
