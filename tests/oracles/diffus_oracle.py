"""Loop-level numpy oracle of the along-layer tracer diffusion.

Transcribed independently from /root/reference/phy/mod_diffus.F90:41-187
(diffus): per-layer u/v diffusive fluxes
q = delt1*.5*(difiso(i-1)+difiso(i))*scuy*scuxi*max(min(dp),dpeps),
flux = q*(c(upwind) - c), then the masked divergence update of
saln/temp/passive tracers and the in-place sigma refresh.  Pure numpy,
0-based (k, j, i); per-axis periodicity flags (the fuk95 channel is
j-periodic with i walls).  Double-entry parity partner of
dynamics/diffus.diffus (PARITY.md methodology)."""

import numpy as np

DPEPS = 1.e-5


def diffus_oracle(ip, iu, iv, scuy, scuxi, scvx, scvyi, scp2,
                  difiso, dp, temp, saln, trc, delt1, sig_fn,
                  periodic_i=True, periodic_j=False):
    """Returns (temp, saln, sigma, trc, utflld, usflld, vtflld,
    vsflld) after one diffus application.  All arrays (kk, jj, ii)
    except the 2-D metrics; trc is (ntr, kk, jj, ii) or None."""
    kk, jj, ii = dp.shape
    ntr = 0 if trc is None else trc.shape[0]
    temp = temp.copy()
    saln = saln.copy()
    trc = None if trc is None else trc.copy()
    sigma = np.zeros_like(temp)
    utf = np.zeros_like(dp)
    usf = np.zeros_like(dp)
    vtf = np.zeros_like(dp)
    vsf = np.zeros_like(dp)
    uft = np.zeros((ntr,) + dp.shape[1:]) if ntr else None
    vft = np.zeros((ntr,) + dp.shape[1:]) if ntr else None

    def im1_ok(i):
        return periodic_i or i > 0

    def jm1_ok(j):
        return periodic_j or j > 0

    for k in range(kk):
        # u fluxes (mod_diffus.F90:90-111)
        for j in range(jj):
            for i in range(ii):
                if iu[j, i] == 0:
                    continue
                jw, iw = j, (i - 1) % ii
                q = delt1 * .5 * (difiso[k, jw, iw] + difiso[k, j, i]) \
                    * scuy[j, i] * scuxi[j, i] \
                    * max(min(dp[k, jw, iw], dp[k, j, i]), DPEPS)
                usf[k, j, i] = q * (saln[k, jw, iw] - saln[k, j, i])
                utf[k, j, i] = q * (temp[k, jw, iw] - temp[k, j, i])
                for nt in range(ntr):
                    uft[nt, j, i] = q * (trc[nt, k, jw, iw]
                                         - trc[nt, k, j, i])
        # v fluxes (:113-136)
        for j in range(jj):
            for i in range(ii):
                if iv[j, i] == 0:
                    continue
                js = (j - 1) % jj
                q = delt1 * .5 * (difiso[k, js, i] + difiso[k, j, i]) \
                    * scvx[j, i] * scvyi[j, i] \
                    * max(min(dp[k, js, i], dp[k, j, i]), DPEPS)
                vsf[k, j, i] = q * (saln[k, js, i] - saln[k, j, i])
                vtf[k, j, i] = q * (temp[k, js, i] - temp[k, j, i])
                for nt in range(ntr):
                    vft[nt, j, i] = q * (trc[nt, k, js, i]
                                         - trc[nt, k, j, i])
        # divergence update (:138-163)
        for j in range(jj):
            for i in range(ii):
                if ip[j, i] == 0:
                    continue
                ie = (i + 1) % ii
                ie_ok = periodic_i or i + 1 < ii
                jn = (j + 1) % jj
                jn_ok = periodic_j or j + 1 < jj
                q = 1. / (scp2[j, i] * max(dp[k, j, i], DPEPS))
                us_e = usf[k, j, ie] if ie_ok else 0.
                ut_e = utf[k, j, ie] if ie_ok else 0.
                vs_n = vsf[k, jn, i] if jn_ok else 0.
                vt_n = vtf[k, jn, i] if jn_ok else 0.
                saln[k, j, i] -= q * (us_e - usf[k, j, i]
                                      + vs_n - vsf[k, j, i])
                temp[k, j, i] -= q * (ut_e - utf[k, j, i]
                                      + vt_n - vtf[k, j, i])
                for nt in range(ntr):
                    uftn = uft[nt, j, ie] if ie_ok else 0.
                    vftn = vft[nt, jn, i] if jn_ok else 0.
                    trc[nt, k, j, i] -= q * (
                        uftn - uft[nt, j, i]
                        + vftn - vft[nt, j, i])
                sigma[k, j, i] = sig_fn(temp[k, j, i], saln[k, j, i])
        if ntr:
            uft[:] = 0.
            vft[:] = 0.
    return temp, saln, sigma, trc, utf, usf, vtf, vsf
