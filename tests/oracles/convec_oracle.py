"""Loop-level numpy oracle of the convective adjustment column solver.

Transcribed independently from /root/reference/phy/mod_convec.F90:43-303
(the scalar part: first-physical-layer location with leading-thin-layer
collapse, the kfplo history merge, and the converge-until-done removal
of static instabilities between the lower mixed layer and the interior)
plus the u/v momentum redistribution remap (:305-449).

Double-entry parity partner of dynamics/convec.convec (PARITY.md)."""

import numpy as np

EPSILP = 1.e-12


def column(ttem, ssal, delp, dens, densr, kfplo, eos, ttrc=None):
    """One wet column, 0-based indices.  eos: dict with sig(t,s),
    sofsig(g,t), rho(p,t,s).  Returns (ttem, ssal, delp, dens, ttrc,
    kfpl)."""
    kk = len(ttem)
    ttem, ssal = ttem.copy(), ssal.copy()
    delp, dens = delp.copy(), dens.copy()
    ttrc = None if ttrc is None else ttrc.copy()
    ntr = 0 if ttrc is None else ttrc.shape[0]

    # first physical interior layer (:91-106)
    k = 2
    dps = 0.
    while k < kk and delp[k] < EPSILP:
        dps += delp[k]
        delp[k] = 0.
        k += 1
    if k >= kk:
        delp[1] += dps
        # also zero the last thin layer accumulated into dps
        kfpl = kk
    else:
        delp[k] += dps
        kfpl = k

    # kfplo history merge (:108-186)
    if kfpl < kfplo:
        if kfplo <= kk - 1:
            tdps = sdps = dps = 0.
            trdps = np.zeros(ntr)
            for k in range(kfpl, kfplo + 1):
                tdps += ttem[k] * delp[k]
                sdps += ssal[k] * delp[k]
                dps += delp[k]
                if ntr:
                    trdps += ttrc[:, k] * delp[k]
            q = 1. / dps
            ttmp, stmp = tdps * q, sdps * q
            dtmp = eos['sig'](ttmp, stmp)
            if dtmp > densr[kfplo]:
                for k in range(kfpl, kfplo):
                    delp[k] = 0.
                kfpl = kfplo
                ttem[kfpl], ssal[kfpl] = ttmp, stmp
                dens[kfpl] = dtmp
                delp[kfpl] = dps
                if ntr:
                    ttrc[:, kfpl] = trdps * q
        else:
            tdps = sdps = dps = 0.
            trdps = np.zeros(ntr)
            for k in range(kfpl, kk):
                tdps += ttem[k] * delp[k]
                sdps += ssal[k] * delp[k]
                dps += delp[k]
                if ntr:
                    trdps += ttrc[:, k] * delp[k]
                delp[k] = 0.
            q = 1. / dps
            ttmp, stmp = tdps * q, sdps * q
            dtmp = eos['sig'](ttmp, stmp)
            kfpl = kk - 1
            while dtmp < densr[kfpl] and kfpl > 2:
                kfpl -= 1
            ttem[kfpl], ssal[kfpl] = ttmp, stmp
            dens[kfpl] = dtmp
            delp[kfpl] = dps
            if ntr:
                ttrc[:, kfpl] = trdps * q

    if kfpl <= kk - 1:
        # remove static instabilities (:192-278)
        done = False
        niter = 0
        while not done:
            niter += 1
            if niter == 100:
                break
            done = True
            tdps = ttem[1] * delp[1]
            sdps = ssal[1] * delp[1]
            dps = delp[1]
            trdps = ttrc[:, 1] * delp[1] if ntr else np.zeros(0)
            ttmp, stmp = ttem[1], ssal[1]
            k = kfpl
            q = 1.
            while k <= kk - 1 and (
                    eos['rho'](dps, ttmp, stmp)
                    > eos['rho'](dps, ttem[k], ssal[k])
                    or delp[k] < EPSILP):
                tdps += ttem[k] * delp[k]
                sdps += ssal[k] * delp[k]
                dps += delp[k]
                q = 1. / dps
                ttmp, stmp = tdps * q, sdps * q
                if ntr:
                    trdps = trdps + ttrc[:, k] * delp[k]
                k += 1
            kmix = k - 1
            if kmix >= kfpl:
                ttem[1], ssal[1] = ttmp, stmp
                dens[1] = eos['sig'](ttem[1], ssal[1])
                if ntr:
                    ttrc[:, 1] = trdps * q
                dps2 = 0.
                for k in range(kfpl, kmix + 1):
                    dps2 += delp[k]
                    delp[k] = 0.
                k = kmix
                while dens[1] < densr[k] and k > 2:
                    k -= 1
                kfpl = k
                ttem[kfpl], ssal[kfpl] = ttem[1], ssal[1]
                dens[kfpl] = dens[1]
                delp[kfpl] = dps2
                if ntr:
                    ttrc[:, kfpl] = ttrc[:, 1]
                for k in range(kfpl + 1, kmix + 1):
                    ttem[k] = ttem[1]
                    dens[k] = densr[k]
                    ssal[k] = eos['sofsig'](dens[k], ttem[k])

    return ttem, ssal, delp, dens, ttrc, kfpl


def remap_u(uo, po, pn):
    """Conservative velocity remap (:319-341), one column."""
    kk = len(uo)
    un = np.zeros(kk)
    ko = 0
    for kn in range(kk):
        if pn[kn + 1] - pn[kn] == 0.:
            un[kn] = 0.
        else:
            udpn = 0.
            while pn[kn + 1] > po[ko + 1]:
                udpn += uo[ko] * (po[ko + 1] - max(po[ko], pn[kn]))
                ko += 1
            un[kn] = (udpn + uo[ko] * (pn[kn + 1]
                                       - max(po[ko], pn[kn]))) \
                / (pn[kn + 1] - pn[kn])
    return un
