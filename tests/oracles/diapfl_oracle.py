"""Loop-level numpy oracle of the diapycnal mixing column solver.

Transcribed independently from /root/reference/phy/mod_diapfl.F90:45-705
(the scalar part: restoration-flux setup with limiting iteration, the
alternating-direction backward implicit solve of the layer-thickness
diffusion equation, the T/S/tracer tridiagonal solve, thickness update,
mixed-layer copy-back and massless-layer fill) and :707-1048 (the
momentum part's flux interpolation/limiting and column solve).  Pure
numpy, one column at a time; eos callbacks are passed in so the oracle
shares no code with the production implementation beyond the physical
constants.

Double-entry parity partner of dynamics/diapfl.diapfl (PARITY.md)."""

import numpy as np

DSGMNR = .1
FCMXR = .25
DSGCR0 = .25
DFEPS = 1.e-12
GBBL = .2
KAPPA = .4
USTMIN = 1.e-4
EPSILP = 1.e-12
ONEM = 9806.


def column(ttem, ssal, delp, dens, sigr, nu, kfpl, ustarb, coriop,
           c, eos, ttrc=None, temmin=None):
    """One wet column.  All 1-based reference indices become 0-based;
    kfpl is 0-based.  eos: dict with sig, dsigdt, dsigds, sofsig.
    Returns (ttem, ssal, delp, dens, ttrc, fpu_g, fpl_g, kmin) with
    fpu_g/fpl_g the per-layer fluxes saved for momentum mixing."""
    kk = len(ttem)
    ttem, ssal = ttem.copy(), ssal.copy()
    delp, dens = delp.copy(), dens.copy()
    nu = nu.copy()
    ttrc = None if ttrc is None else ttrc.copy()
    ntr = 0 if ttrc is None else ttrc.shape[0]

    rstdns = np.ones(kk, bool)
    kmin = kfpl - 2
    kmax = 0
    for k in range(1, kk):
        if delp[k] > EPSILP:
            kmax = k

    fpu = np.zeros(kk)
    fpl = np.zeros(kk)
    fpug = np.zeros(kk)
    fplg = np.zeros(kk)

    if kmin < kmax:
        rstdns[kfpl] = False
        if kfpl != kmax and dens[kfpl] > .5 * (sigr[kfpl]
                                              + sigr[kfpl + 1]):
            rstdns[kfpl + 1] = False

        delp[kmin + 1] = delp[1]
        delp[kmin] = delp[0]
        ttem[kmin + 1] = ttem[1]
        ttem[kmin] = ttem[0]
        ssal[kmin + 1] = ssal[1]
        ssal[kmin] = ssal[0]
        nu[kmin + 1] = nu[1]
        nu[kmin] = nu[0]
        if ntr:
            ttrc[:, kmin + 1] = ttrc[:, 1]
            ttrc[:, kmin] = ttrc[:, 0]

        pres = np.zeros(kk + 1)
        for k in range(kmin, kmax + 1):
            pres[k + 1] = pres[k] + delp[k]

        k = kmin
        fpu[k] = 0.
        fpl[k] = min(pres[k + 1], pres[kmax + 1] - pres[k + 1],
                     c * nu[k] * (delp[k] + delp[k + 1])
                     / (2. * delp[k] * delp[k + 1]))
        k = kmin + 1
        fpu[k] = fpl[k - 1]
        delpu = max(ONEM, delp[k])
        delpl = max(ONEM, delp[k + 1])
        fpl[k] = min(pres[k + 1], pres[kmax + 1] - pres[k + 1],
                     c * nu[k] * (delpu + delpl) / (2. * delpu * delpl))
        fpl[kmax] = 0.

        dsgu = np.ones(kk)
        dsgl = np.ones(kk)
        dsghm = np.ones(kk)
        dsg = np.ones(kk)
        dsgui = np.ones(kk)
        dsgli = np.ones(kk)
        fcu = np.zeros(kk)
        fcl = np.zeros(kk)
        fmax_ = np.zeros(kk)

        if kfpl <= kmax:
            if kfpl < kmax:
                # bottom boundary layer mixing
                k = kmax - 1
                nubbl = GBBL * ustarb ** 3 * np.exp(
                    -(delp[k + 1] + .5 * delp[k]) * abs(coriop)
                    * (1.e-3) / (KAPPA * max(USTMIN, ustarb) * 9.806)) \
                    / (1.e-3 * 9.806 * (sigr[k + 1] - sigr[k]))
                nu[k] = max(nu[k], nubbl)

            k = kfpl - 1
            dsgli[k] = 1.
            fcl[k] = -fpl[k]
            for k in range(kfpl, kmax):
                if rstdns[k]:
                    dsgdt = eos['dsigdt'](ttem[k], ssal[k])
                    dsgds = eos['dsigds'](ttem[k], ssal[k])
                    dsgu[k] = max(DSGMNR * (sigr[k] - sigr[k - 1]),
                                  dsgdt * (ttem[k] - ttem[k - 1])
                                  + dsgds * (ssal[k] - ssal[k - 1]))
                    dsgl[k] = max(DSGMNR * (sigr[k + 1] - sigr[k]),
                                  dsgdt * (ttem[k + 1] - ttem[k])
                                  + dsgds * (ssal[k + 1] - ssal[k]))
                    dsghm[k] = 2. * dsgu[k] * dsgl[k] \
                        / (dsgu[k] + dsgl[k])
                    dsg[k] = .5 * (dsgu[k] + dsgl[k])
                    dsgui[k] = 1. / dsgu[k]
                    dsgli[k] = 1. / dsgl[k]
                    fcmx = .25 * (np.sqrt(delp[k] * delp[k]
                                          + 4. * c * nu[k] * dsg[k]
                                          * (dsgui[k] + dsgli[k]))
                                  - delp[k]) * dsghm[k] * FCMXR
                    dsgc = dens[k] - sigr[k]
                    if dsgc > 0.:
                        fcl[k] = 0.
                        if dens[k - 1] < sigr[k]:
                            q = max(0., (dens[k] - sigr[k + 1])
                                    / ((sigr[k] - sigr[k + 1])
                                       * (1. - DSGCR0)))
                            q = max(0., 1. - q * q)
                            q = q ** 3
                            fcu[k] = dsgc * delp[k]
                            fcu[k] = min(q * fcu[k] + (1. - q) * fcmx,
                                         fcu[k])
                        else:
                            fcu[k] = 0.
                    else:
                        fcu[k] = 0.
                        if dens[k + 1] > sigr[k]:
                            q = max(0., (dens[k] - sigr[k - 1])
                                    / ((sigr[k] - sigr[k - 1])
                                       * (1. - DSGCR0)))
                            q = max(0., 1. - q * q)
                            q = q ** 3
                            fcl[k] = dsgc * delp[k]
                            fcl[k] = max(q * fcl[k] - (1. - q) * fcmx,
                                         fcl[k])
                        else:
                            fcl[k] = 0.
                else:
                    fcl[k] = 0.
                    fcu[k] = 0.
            k = kmax
            dsgdt = eos['dsigdt'](ttem[k], ssal[k])
            dsgds = eos['dsigds'](ttem[k], ssal[k])
            dsgu[k] = max(DSGMNR * (sigr[k] - sigr[k - 1]),
                          dsgdt * (ttem[k] - ttem[k - 1])
                          + dsgds * (ssal[k] - ssal[k - 1]))
            dsgui[k] = 1. / dsgu[k]
            if dens[k] > sigr[k] and dens[k - 1] < sigr[k]:
                fpu[k] = min(delp[k - 1],
                             (dens[k] - sigr[k]) * delp[k] * dsgui[k])
            else:
                fpu[k] = 0.
            fcu[k] = fpu[k] * dsgu[k]

            # flux limit iteration
            fmax_[kfpl - 1] = 0.
            fmax_[kmax] = 0.
            kfmaxu = -1
            done = False
            while not done:
                done = True
                for k in range(kmax - 1, kfpl - 1, -1):
                    q = ((fmax_[k + 1] + fcu[k + 1]) * dsgui[k + 1]
                         + pres[kmax + 1] - pres[k + 1]) * dsgl[k]
                    fcl[k] = max(-q, fcl[k])
                    fmax_[k] = q + fcl[k]
                kfmaxu = -1
                for k in range(kfpl, kmax):
                    q = ((fmax_[k - 1] - fcl[k - 1]) * dsgli[k - 1]
                         + pres[k] - pres[kfpl]) * dsgu[k]
                    if fcu[k] > q:
                        fcu[k] = q
                        done = False
                    if fmax_[k] > q - fcu[k]:
                        fmax_[k] = q - fcu[k]
                        kfmaxu = k

            # first guess
            f0 = np.zeros(kk)
            f = np.zeros(kk)
            gtd = np.zeros(kk)
            fold = np.zeros(kk)
            h = np.zeros(kk)
            dflim = 0.
            for k in range(kfpl, kmax):
                f[k] = min(fmax_[k],
                           .5 * np.sqrt(c * nu[k] * dsg[k]
                                        * (dsgui[k] + dsgli[k]))
                           * dsghm[k],
                           c * nu[k] * dsg[k] / max(EPSILP, delp[k]))
                fold[k] = f[k]
                h[k] = fcu[k] * dsgui[k] - fcl[k] * dsgli[k] \
                    + fcl[k - 1] * dsgli[k - 1] \
                    - fcu[k + 1] * dsgui[k + 1]
                dflim = max(dflim, fmax_[k])
            dflim *= DFEPS

            def backward(q, r, t):
                if q < 0.:
                    s_ = r / (q * q)
                    if s_ < 1.e-3:
                        rr = .00390625 * s_
                        qv = -q * rr * (128. - s_ * (32. - s_ * (
                            16. - s_ * (10. - s_ * 7.))))
                        f0v = qv * t
                        qv = rr * (128. - s_ * (96. - s_ * (
                            80. - s_ * (70. - s_ * 63.))))
                        return f0v, qv * t
                s_ = np.sqrt(q * q + r)
                return (q + s_) * t, (1. + q / s_) * t

            niter = 0
            dwnwrd = False
            while True:
                dwnwrd = not dwnwrd
                if dwnwrd:
                    ctd, bitd = 0., 1.
                    remfmx = False
                    for k in range(kfpl, kmax):
                        if remfmx:
                            gtd[k] = 0.
                            f0[k] = fmax_[k]
                            f[k] = fmax_[k]
                        else:
                            q = f0[k - 1] * dsgli[k - 1] \
                                + f[k + 1] * dsgui[k + 1] \
                                - delp[k] - h[k]
                            r = 4. * c * nu[k] * dsg[k] \
                                * (dsgui[k] + dsgli[k])
                            t = .25 * dsghm[k]
                            f0[k], dfdg = backward(q, r, t)
                            if f0[k] >= fmax_[k]:
                                f0[k] = fmax_[k]
                                dfdg = 0.
                                if k > kfmaxu:
                                    remfmx = True
                            gtd[k] = ctd * bitd
                            atd = -dfdg * dsgli[k - 1]
                            ctd = -dfdg * dsgui[k + 1]
                            bitd = 1. / (1. - atd * gtd[k])
                            f[k] = (f0[k] - atd * (f[k - 1] - f0[k - 1])
                                    + ctd * f[k + 1]) * bitd
                    maxdf = 0.
                    for k in range(kmax - 1, kfpl - 1, -1):
                        f[k] = min(fmax_[k], f[k] - gtd[k + 1] * f[k + 1])
                        maxdf = max(maxdf, abs(f[k] - fold[k]))
                        fold[k] = f[k]
                else:
                    atd, bitd = 0., 1.
                    remfmx = False
                    for k in range(kmax - 1, kfpl - 1, -1):
                        if remfmx:
                            gtd[k] = 0.
                            f0[k] = fmax_[k]
                            f[k] = fmax_[k]
                        else:
                            q = f[k - 1] * dsgli[k - 1] \
                                + f0[k + 1] * dsgui[k + 1] \
                                - delp[k] - h[k]
                            r = 4. * c * nu[k] * dsg[k] \
                                * (dsgui[k] + dsgli[k])
                            t = .25 * dsghm[k]
                            f0[k], dfdg = backward(q, r, t)
                            if f0[k] >= fmax_[k]:
                                f0[k] = fmax_[k]
                                dfdg = 0.
                                if k <= kfmaxu:
                                    remfmx = True
                            gtd[k] = atd * bitd
                            atd = -dfdg * dsgli[k - 1]
                            ctd = -dfdg * dsgui[k + 1]
                            bitd = 1. / (1. - ctd * gtd[k])
                            f[k] = (f0[k] + atd * f[k - 1]
                                    - ctd * (f[k + 1] - f0[k + 1])) * bitd
                    maxdf = 0.
                    for k in range(kfpl, kmax):
                        f[k] = min(fmax_[k], f[k] - gtd[k - 1] * f[k - 1])
                        maxdf = max(maxdf, abs(f[k] - fold[k]))
                        fold[k] = f[k]
                niter += 1
                if maxdf <= dflim or niter == 100:
                    break

            for k in range(kfpl, kmax):
                fpu[k] = (f[k] + fcu[k]) * dsgui[k]
                fpl[k] = (f[k] - fcl[k]) * dsgli[k]
            fpu[kfpl] = fpl[kmin + 1]

        # T/S/tracer tridiagonal solve
        gtd = np.zeros(kk)
        ctd, bitd = 0., 1.
        for k in range(kmin, kmax + 1):
            gtd[k] = ctd * bitd
            q = 1. / (delp[k] + fpu[k] + fpl[k])
            atd = -fpu[k] * q
            ctd = -fpl[k] * q
            dtd = delp[k] * q
            bitd = 1. / (1. - atd * gtd[k])
            km = max(0, k - 1)
            ssal[k] = (dtd * ssal[k] - atd * ssal[km]) * bitd
            ttem[k] = (dtd * ttem[k] - atd * ttem[km]) * bitd
            if ntr:
                ttrc[:, k] = (dtd * ttrc[:, k] - atd * ttrc[:, km]) \
                    * bitd
        for k in range(kmax - 1, kmin - 1, -1):
            ssal[k] = ssal[k] - gtd[k + 1] * ssal[k + 1]
            ttem[k] = ttem[k] - gtd[k + 1] * ttem[k + 1]
            dens[k] = eos['sig'](ttem[k], ssal[k])
            if ntr:
                ttrc[:, k] = ttrc[:, k] - gtd[k + 1] * ttrc[:, k + 1]
        for k in range(kfpl, kmax):
            delp[k] = max(0., delp[k] + fpu[k] + fpl[k]
                          - fpl[k - 1] - fpu[k + 1])
        delp[kmax] = max(0., delp[kmax] + fpu[kmax] - fpl[kmax - 1])

        # copy back to the mixed layers
        ttem[0] = ttem[kmin]
        ttem[1] = ttem[kmin + 1]
        ssal[0] = ssal[kmin]
        ssal[1] = ssal[kmin + 1]
        dens[0] = dens[kmin]
        dens[1] = dens[kmin + 1]
        if kmin > 0:
            if kmin == 1:
                delp[1] = delp[kmin + 1]
                delp[kmin + 1] = 0.
            else:
                delp[kmin] = 0.
        if ntr:
            ttrc[:, 0] = ttrc[:, kmin]
            ttrc[:, 1] = ttrc[:, kmin + 1]

    # massless fill
    if kfpl > kmax:
        for k in range(2, kk):
            tmn = temmin[k] if temmin is not None else -3.
            ttem[k] = max(ttem[1], tmn)
            dens[k] = sigr[k]
            ssal[k] = eos['sofsig'](dens[k], ttem[k])
            delp[k] = 0.
            if ntr:
                ttrc[:, k] = ttrc[:, 1]
    else:
        for k in range(2, kfpl):
            ttem[k] = ttem[kfpl]
            dens[k] = sigr[k]
            ssal[k] = eos['sofsig'](dens[k], ttem[k])
            delp[k] = 0.
            if ntr:
                ttrc[:, k] = ttrc[:, kfpl]
        for k in range(kmax + 1, kk):
            ttem[k] = ttem[kmax]
            dens[k] = sigr[k]
            ssal[k] = eos['sofsig'](dens[k], ttem[k])
            if ntr:
                ttrc[:, k] = ttrc[:, kmax]

    # momentum-mixing flux save
    if kmin < kmax:
        for k in range(0, kmin + 1):
            fpug[k] = fpl[kmin]
            fplg[k] = fpl[kmin]
        for k in range(kmin + 1, kmax + 1):
            fpug[k] = fpu[k]
            fplg[k] = fpl[k]
    return ttem, ssal, delp, dens, ttrc, fpug, fplg, kmin
