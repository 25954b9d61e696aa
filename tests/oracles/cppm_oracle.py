"""Loop-level numpy oracle of the reference CPPM transport sweep.

Transcribed from /root/reference/phy/mod_cppm.F90 — set_stencil_coeffs
(:101-320), set_slope_coeffs/set_d2_mask (:322-359), h_edges_nosc/_mono
(:361-488), parabola_coeffs_fc_nosc (:490-818), flux_integration
(:1373-1468), and the row update of cppm_fc_nosc_i (:1595-1611) —
written independently of the production JAX implementation.

Operates on one 1-D row with 1-based-style padded index space handled
by plain python lists; rows are assumed land-bounded (mask 0 at both
ends) so no halo values matter.
"""

import numpy as np

dpeps = 1.e-12

S0000, S1111, S1110, S0111, S1100, S0110, S0011, S0100, S0010 = range(9)

c1_2, c1_3, c2_3, c1_4, c3_4, c1_5, c1_6, c1_10, c1_12, c1_15, c1_20 = (
    .5, 1 / 3., 2 / 3., .25, .75, .2, 1 / 6., .1, 1 / 12., 1 / 15., .05)


def set_stencil_coeffs(sm, dx):
    """mod_cppm.F90:101-320 — returns (stencil, hevc[4], tmc0, tmcl,
    tmcr)."""
    dx1, dx2, dx3, dx4 = dx
    a12 = -dx2 - c1_2 * dx1
    a22 = -c1_2 * dx2
    a32 = c1_2 * dx3
    a42 = dx3 + c1_2 * dx4
    a13 = a12 * a12 + c1_12 * dx1 * dx1
    a23 = -c2_3 * a22 * dx2
    a33 = c2_3 * a32 * dx3
    a43 = a42 * a42 + c1_12 * dx4 * dx4
    a14 = (a13 + c1_6 * dx1 * dx1) * a12
    a24 = -c3_4 * a23 * dx2
    a34 = c3_4 * a33 * dx3
    a44 = (a43 + c1_6 * dx4 * dx4) * a42

    tmcl = np.zeros(12)
    tmcr = np.zeros(12)
    tmc0 = np.zeros(12)
    tmcl[0] = -c1_12 * dx1
    tmcl[1] = (c1_10 * dx1 + c1_6 * dx2) * dx1
    tmcl[2] = -(c1_10 * (dx1 + 3. * dx2) * dx1 + c1_4 * dx2 ** 2) * dx1
    tmcl[3] = -c1_12 * dx2
    tmcl[4] = c1_10 * dx2 ** 2
    tmcl[5] = -c1_10 * dx2 ** 3
    tmcl[6] = -c1_12 * dx3
    tmcl[7] = -c1_15 * dx3 ** 2
    tmcl[8] = -c1_20 * dx3 ** 3
    tmcl[9] = -c1_12 * dx4
    tmcl[10] = -(c1_15 * dx4 + c1_6 * dx3) * dx4
    tmcl[11] = -(c1_5 * (c1_4 * dx4 + dx3) * dx4 + c1_4 * dx3 ** 2) * dx4

    tmcr[0] = c1_12 * dx1
    tmcr[1] = -(c1_15 * dx1 + c1_6 * dx2) * dx1
    tmcr[2] = (c1_5 * (c1_4 * dx1 + dx2) * dx1 + c1_4 * dx2 ** 2) * dx1
    tmcr[3] = c1_12 * dx2
    tmcr[4] = -c1_15 * dx2 ** 2
    tmcr[5] = c1_20 * dx2 ** 3
    tmcr[6] = c1_12 * dx3
    tmcr[7] = c1_10 * dx3 ** 2
    tmcr[8] = c1_10 * dx3 ** 3
    tmcr[9] = c1_12 * dx4
    tmcr[10] = (c1_10 * dx4 + c1_6 * dx3) * dx4
    tmcr[11] = (c1_10 * (dx4 + 3. * dx3) * dx4 + c1_4 * dx3 ** 2) * dx4

    tmc0[0] = a12
    tmc0[1] = a13 - tmcl[1] - tmcr[1]
    tmc0[2] = a14 - tmcl[2] - tmcr[2]
    tmc0[3] = a22
    tmc0[4] = a23 - tmcl[4] - tmcr[4]
    tmc0[5] = a24 - tmcl[5] - tmcr[5]
    tmc0[6] = a32
    tmc0[7] = a33 - tmcl[7] - tmcr[7]
    tmc0[8] = a34 - tmcl[8] - tmcr[8]
    tmc0[9] = a42
    tmc0[10] = a43 - tmcl[10] - tmcr[10]
    tmc0[11] = a44 - tmcl[11] - tmcr[11]

    hevc = np.zeros(4)
    sm = list(sm)
    if sm == [1, 1, 1, 1]:
        st = S1111
        a22_ = a22 - a12
        a32_ = a32 - a12
        a42_ = a42 - a12
        a23_ = (a23 - a13) / a22_
        a33_ = a33 - a13 - a23_ * a32_
        a43_ = a43 - a13 - a23_ * a42_
        a24_ = (a24 - a14) / a22_
        a34_ = a34 - a14 - a24_ * a32_
        a44_ = a44 - a14 - a24_ * a42_
        a34_ = a34_ / a33_
        a44_ = a44_ - a34_ * a43_
        h2 = -a12
        h3 = -a13 - a23_ * h2
        h4 = -a14 - a24_ * h2 - a34_ * h3
        h4 = h4 / a44_
        h3 = (h3 - a43_ * h4) / a33_
        h2 = (h2 - a32_ * h3 - a42_ * h4) / a22_
        hevc[:] = [1. - h2 - h3 - h4, h2, h3, h4]
    elif sm == [1, 1, 1, 0]:
        st = S1110
        a22_ = a22 - a12
        a32_ = a32 - a12
        a23_ = (a23 - a13) / a22_
        a33_ = a33 - a13 - a23_ * a32_
        h2 = -a12
        h3 = (-a13 - a23_ * h2) / a33_
        h2 = (h2 - a32_ * h3) / a22_
        hevc[:] = [1. - h2 - h3, h2, h3, 0.]
    elif sm == [0, 1, 1, 1]:
        st = S0111
        a32_ = a32 - a22
        a42_ = a42 - a22
        a33_ = (a33 - a23) / a32_
        a43_ = a43 - a23 - a33_ * a42_
        h3 = -a22
        h4 = (-a23 - a33_ * h3) / a43_
        h3 = (h3 - a42_ * h4) / a32_
        hevc[:] = [0., 1. - h3 - h4, h3, h4]
    elif sm == [0, 1, 1, 0]:
        st = S0110
        a32_ = a32 - a22
        h3 = -a22 / a32_
        hevc[:] = [0., 1. - h3, h3, 0.]
    elif sm[0] == 1 and sm[1] == 1:
        st = S1100
        a22_ = a22 - a12
        h2 = -a12 / a22_
        hevc[:] = [1. - h2, h2, 0., 0.]
    elif sm[2] == 1 and sm[3] == 1:
        st = S0011
        a42_ = a42 - a32
        h4 = -a32 / a42_
        hevc[:] = [0., 0., 1. - h4, h4]
    elif sm[1] == 1:
        st = S0100
        hevc[:] = [0., 1., 0., 0.]
    elif sm[2] == 1:
        st = S0010
        hevc[:] = [0., 0., 1., 0.]
    else:
        st = S0000
    return st, hevc, tmc0, tmcl, tmcr


def set_slope_coeffs(sm3, dx3):
    if 0 in list(sm3):
        return 0.0, 0.0
    return 2.0, 2.0 * dx3[1] / (dx3[0] + 2.0 * dx3[1] + dx3[2])


def set_d2_mask(sm3):
    return 0.0 if 0 in list(sm3) else 1.0


class RowCoeffs:
    """Per-row stencil coefficient tables (init_cppm, :2578-2607)."""

    def __init__(self, ipmask, dx):
        N = len(ipmask)
        self.N = N
        self.stencil = np.full(N, S0000, np.int32)
        self.hevc = np.zeros((N, 4))
        self.tmc0 = np.zeros((N, 12))
        self.tmcl = np.zeros((N, 12))
        self.tmcr = np.zeros((N, 12))
        self.ssc = np.zeros(N)
        self.scc = np.zeros(N)
        self.d2m = np.zeros(N)
        ipp = np.zeros(N + 4, np.int32)
        dxp = np.zeros(N + 4)
        ipp[2:N + 2] = ipmask
        dxp[2:N + 2] = dx
        dxp[:2] = dx[0]
        dxp[N + 2:] = dx[-1]
        for i in range(N):
            j = i + 2
            st, hv, t0, tl, tr = set_stencil_coeffs(ipp[j - 2:j + 2],
                                                    dxp[j - 2:j + 2])
            self.stencil[i] = st
            self.hevc[i] = hv
            self.tmc0[i] = t0
            self.tmcl[i] = tl
            self.tmcr[i] = tr
            self.ssc[i], self.scc[i] = set_slope_coeffs(
                ipp[j - 1:j + 2], dxp[j - 1:j + 2])
            self.d2m[i] = set_d2_mask(ipp[j - 1:j + 2])


def h_edges_nosc(rc, hm):
    """mod_cppm.F90:361-434.  hm: (N,).  Returns hel, her."""
    N = rc.N
    hel = np.zeros(N)
    her = np.zeros(N)
    for i in range(N):
        hm_m2 = hm[i - 2] if i - 2 >= 0 else 0.
        hm_m1 = hm[i - 1] if i - 1 >= 0 else 0.
        hm_p1 = hm[i + 1] if i + 1 < N else 0.
        he = (rc.hevc[i, 0] * hm_m2 + rc.hevc[i, 1] * hm_m1
              + rc.hevc[i, 2] * hm[i] + rc.hevc[i, 3] * hm_p1)
        hel[i] = he
        if i - 1 >= 0:
            her[i - 1] = he
    d2h = np.zeros(N)
    for i in range(N):
        d2h[i] = rc.d2m[i] * (hel[i] - 2. * hm[i] + her[i])
    for i in range(1, N - 1):
        if d2h[i - 1] * d2h[i] <= 0. or d2h[i] * d2h[i + 1] <= 0.:
            sl = rc.ssc[i] * (hm[i] - hm[i - 1])
            sr = rc.ssc[i] * (hm[i + 1] - hm[i])
            if sl * sr > 0.:
                sc = rc.scc[i] * (hm[i + 1] - hm[i - 1])
                sc = np.copysign(min(abs(sl), abs(sr), abs(sc)), sc)
                if (hm[i - 1] - hel[i]) * (hm[i] - hel[i]) > 0.:
                    hel[i] = hm[i] - np.copysign(
                        min(c1_2 * abs(sc), abs(hel[i] - hm[i])), sc)
                if (hm[i + 1] - her[i]) * (hm[i] - her[i]) > 0.:
                    her[i] = hm[i] + np.copysign(
                        min(c1_2 * abs(sc), abs(her[i] - hm[i])), sc)
                d = her[i] - hel[i]
                q = d * (2. * hm[i] - hel[i] - her[i])
                r = c1_3 * d * d
                if q > r:
                    hel[i] = 3. * hm[i] - 2. * her[i]
                elif -r > q:
                    her[i] = 3. * hm[i] - 2. * hel[i]
            else:
                hel[i] = hm[i]
                her[i] = hm[i]
        hel[i] = max(hel[i], dpeps)
        her[i] = max(her[i], dpeps)
        sl = 2. * (3. * hm[i] - 2. * hel[i] - her[i])
        a2 = 3. * (hel[i] - 2. * hm[i] + her[i])
        sr = sl + 2. * a2
        if sl < 0. and sr > 0.:
            if a2 * hel[i] - c1_4 * sl * sl < a2 * dpeps:
                q = 3. * hm[i] / (3. * sl * sr + 4. * a2 * a2)
                hel[i] = sl * sl * q
                her[i] = sr * sr * q
    return hel, her


def parabola_coeffs_fc_nosc(rc, hm, tm, hel, her):
    """mod_cppm.F90:490-818.  tm: (nt, N).  Returns hpc (3, N),
    tpc (3, nt, N)."""
    N = rc.N
    ntr = tm.shape[0]
    tel = np.zeros((ntr, N))
    ter = np.zeros((ntr, N))

    def hmat(i, row):
        """a_{row,col} matrix element contributions for cell offset."""
        return None

    for i in range(N):
        st = rc.stencil[i]
        t0, tl, tr = rc.tmc0[i], rc.tmcl[i], rc.tmcr[i]

        def elem(idx, cell):
            hii = 1. / hm[cell]
            return t0[idx] + (tl[idx] * hel[cell] + tr[idx] * her[cell]) * hii

        tevc = np.zeros(4)
        if st == S1111:
            a12 = elem(0, i - 2)
            a13 = elem(1, i - 2)
            a14 = elem(2, i - 2)
            a22 = elem(3, i - 1) - a12
            a23 = elem(4, i - 1) - a13
            a24 = elem(5, i - 1) - a14
            a32 = elem(6, i) - a12
            a33 = elem(7, i) - a13
            a34 = elem(8, i) - a14
            a42 = elem(9, i + 1) - a12
            a43 = elem(10, i + 1) - a13
            a44 = elem(11, i + 1) - a14
            q = 1. / a22
            a23 = a23 * q
            a33 = a33 - a23 * a32
            a43 = a43 - a23 * a42
            a24 = a24 * q
            a34 = a34 - a24 * a32
            a44 = a44 - a24 * a42
            a34 = a34 / a33
            a44 = a44 - a34 * a43
            t2 = -a12
            t3 = -a13 - a23 * t2
            t4 = -a14 - a24 * t2 - a34 * t3
            t4 = t4 / a44
            t3 = (t3 - a43 * t4) / a33
            t2 = (t2 - a32 * t3 - a42 * t4) / a22
            tevc[:] = [1. - t2 - t3 - t4, t2, t3, t4]
        elif st == S1110:
            a12 = elem(0, i - 2)
            a13 = elem(1, i - 2)
            a22 = elem(3, i - 1) - a12
            a23 = elem(4, i - 1) - a13
            a32 = elem(6, i) - a12
            a33 = elem(7, i) - a13
            a23 = a23 / a22
            a33 = a33 - a23 * a32
            t2 = -a12
            t3 = (-a13 - a23 * t2) / a33
            t2 = (t2 - a32 * t3) / a22
            tevc[:] = [1. - t2 - t3, t2, t3, 0.]
        elif st == S0111:
            a22 = elem(3, i - 1)
            a23 = elem(4, i - 1)
            a32 = elem(6, i) - a22
            a33 = elem(7, i) - a23
            a42 = elem(9, i + 1) - a22
            a43 = elem(10, i + 1) - a23
            a33 = a33 / a32
            a43 = a43 - a33 * a42
            t3 = -a22
            t4 = (-a23 - a33 * t3) / a43
            t3 = (t3 - a42 * t4) / a32
            tevc[:] = [0., 1. - t3 - t4, t3, t4]
        elif st == S1100:
            a12 = elem(0, i - 2)
            a22 = elem(3, i - 1) - a12
            t2 = -a12 / a22
            tevc[:] = [1. - t2, t2, 0., 0.]
        elif st == S0110:
            a22 = elem(3, i - 1)
            a32 = elem(6, i) - a22
            t3 = -a22 / a32
            tevc[:] = [0., 1. - t3, t3, 0.]
        elif st == S0011:
            a32 = elem(6, i)
            a42 = elem(9, i + 1) - a32
            t4 = -a32 / a42
            tevc[:] = [0., 0., 1. - t4, t4]
        elif st == S0100:
            tevc[:] = [0., 1., 0., 0.]
        elif st == S0010:
            tevc[:] = [0., 0., 1., 0.]

        for nt in range(ntr):
            tm_m2 = tm[nt, i - 2] if i - 2 >= 0 else 0.
            tm_m1 = tm[nt, i - 1] if i - 1 >= 0 else 0.
            tm_p1 = tm[nt, i + 1] if i + 1 < N else 0.
            te = (tevc[0] * tm_m2 + tevc[1] * tm_m1 + tevc[2] * tm[nt, i]
                  + tevc[3] * tm_p1)
            tel[nt, i] = te
            if i - 1 >= 0:
                ter[nt, i - 1] = te

    hf1m = np.zeros(N)
    hf1l = np.zeros(N)
    hf1r = np.zeros(N)
    hf2m = np.zeros(N)
    hf2l = np.zeros(N)
    hf2r = np.zeros(N)
    d2t = np.zeros((ntr, N))
    for i in range(N):
        q = 1. / (12. * hm[i] - hel[i] - her[i])
        hf1m[i] = 60. * hm[i] * q
        hf1l[i] = -(42. * hm[i] + 4. * hel[i] - 6. * her[i]) * q
        hf1r[i] = -(18. * hm[i] - 4. * hel[i] + 6. * her[i]) * q
        hf2m[i] = -hf1m[i]
        hf2l[i] = 5. * (6. * hm[i] + hel[i] - her[i]) * q
        hf2r[i] = 5. * (6. * hm[i] - hel[i] + her[i]) * q
        for nt in range(ntr):
            d2t[nt, i] = rc.d2m[i] * (hf2m[i] * tm[nt, i]
                                      + hf2l[i] * tel[nt, i]
                                      + hf2r[i] * ter[nt, i])

    for i in range(1, N - 1):
        for nt in range(ntr):
            if (d2t[nt, i - 1] * d2t[nt, i] <= 0.
                    or d2t[nt, i] * d2t[nt, i + 1] <= 0.):
                sl = rc.ssc[i] * (tm[nt, i] - tm[nt, i - 1])
                sr = rc.ssc[i] * (tm[nt, i + 1] - tm[nt, i])
                if sl * sr > 0.:
                    sc = rc.scc[i] * (tm[nt, i + 1] - tm[nt, i - 1])
                    sc = np.copysign(min(abs(sl), abs(sr), abs(sc)), sc)
                    if ((tm[nt, i - 1] - tel[nt, i])
                            * (tm[nt, i] - tel[nt, i]) > 0.):
                        tel[nt, i] = tm[nt, i] - np.copysign(
                            min(c1_2 * abs(sc),
                                abs(tel[nt, i] - tm[nt, i])), sc)
                    if ((tm[nt, i + 1] - ter[nt, i])
                            * (tm[nt, i] - ter[nt, i]) > 0.):
                        ter[nt, i] = tm[nt, i] + np.copysign(
                            min(c1_2 * abs(sc),
                                abs(ter[nt, i] - tm[nt, i])), sc)
                    sl = (hf1m[i] * tm[nt, i] + hf1l[i] * tel[nt, i]
                          + hf1r[i] * ter[nt, i])
                    a2 = (hf2m[i] * tm[nt, i] + hf2l[i] * tel[nt, i]
                          + hf2r[i] * ter[nt, i])
                    sr = sl + 2. * a2
                    if sl * sr < 0.:
                        if (ter[nt, i] - tel[nt, i]) * a2 < 0.:
                            tel[nt, i] = -(((hf1m[i] + 2. * hf2m[i])
                                            * tm[nt, i])
                                           + ((hf1r[i] + 2. * hf2r[i])
                                              * ter[nt, i])) \
                                / (hf1l[i] + 2. * hf2l[i])
                        else:
                            ter[nt, i] = -(hf1m[i] * tm[nt, i]
                                           + hf1l[i] * tel[nt, i]) / hf1r[i]
                else:
                    tel[nt, i] = tm[nt, i]
                    ter[nt, i] = tm[nt, i]
        # posdef for tracers nt >= 2 (reference nt = 2, ntr_loc with
        # 1-based temp=1, saln=2: posdef applies from salinity onward)
        for nt in range(1, ntr):
            tel[nt, i] = max(tel[nt, i], 0.)
            ter[nt, i] = max(ter[nt, i], 0.)
            sl = (hf1m[i] * tm[nt, i] + hf1l[i] * tel[nt, i]
                  + hf1r[i] * ter[nt, i])
            a2 = (hf2m[i] * tm[nt, i] + hf2l[i] * tel[nt, i]
                  + hf2r[i] * ter[nt, i])
            sr = sl + 2. * a2
            if sl < 0. and sr > 0.:
                if a2 * tel[nt, i] - c1_4 * sl * sl < 0.:
                    q = 3. * tm[nt, i] / (3. * sl * sr + 4. * a2 * a2)
                    tel[nt, i] = sl * sl * q
                    ter[nt, i] = sr * sr * q

    hpc = np.zeros((3, N))
    tpc = np.zeros((3, ntr, N))
    for i in range(1, N - 1):
        hpc[0, i] = hel[i]
        hpc[1, i] = 6. * hm[i] - 4. * hel[i] - 2. * her[i]
        hpc[2, i] = 3. * (hel[i] - 2. * hm[i] + her[i])
        for nt in range(ntr):
            tpc[0, nt, i] = tel[nt, i]
            tpc[1, nt, i] = (hf1m[i] * tm[nt, i] + hf1l[i] * tel[nt, i]
                             + hf1r[i] * ter[nt, i])
            tpc[2, nt, i] = (hf2m[i] * tm[nt, i] + hf2l[i] * tel[nt, i]
                             + hf2r[i] * ter[nt, i])
    return hpc, tpc


def flux_integration(ca, ai, db, du, dl, hpc, tpc):
    """mod_cppm.F90:1373-1468.  Edge i between cells i-1 and i."""
    N = len(ca)
    ntr = tpc.shape[1]
    hf = np.zeros(N)
    htf = np.zeros((ntr, N))
    for i in range(1, N):
        if ca[i] < 0.:
            c = ca[i] * ai[i]
            if dl[i] > db[i]:
                hb = max(0., db[i] - du[i])
                hf[i] = hb * ca[i]
                p0 = hb
                p1 = -c1_2 * hb * c
                p2 = c1_3 * hb * c * c
            else:
                hf[i] = (hpc[0, i] - (c1_2 * hpc[1, i]
                                      - c1_3 * hpc[2, i] * c) * c) * ca[i]
                p0 = hpc[0, i] - (c1_2 * hpc[1, i]
                                  - c1_3 * hpc[2, i] * c) * c
                p1 = -(c1_2 * hpc[0, i] - (c1_3 * hpc[1, i]
                                           - c1_4 * hpc[2, i] * c) * c) * c
                p2 = (c1_3 * hpc[0, i] - (c1_4 * hpc[1, i]
                                          - c1_5 * hpc[2, i] * c) * c) * c * c
            for nt in range(ntr):
                htf[nt, i] = (p0 * tpc[0, nt, i] + p1 * tpc[1, nt, i]
                              + p2 * tpc[2, nt, i]) * ca[i]
        else:
            c = ca[i] * ai[i - 1]
            q1 = 1. - c1_2 * c
            q2 = 1. - (1. - c1_3 * c) * c
            if dl[i - 1] > db[i]:
                hb = max(0., db[i] - du[i - 1])
                hf[i] = hb * ca[i]
                p0 = hb
                p1 = q1 * hb
                p2 = q2 * hb
            else:
                hf[i] = (hpc[0, i - 1] + q1 * hpc[1, i - 1]
                         + q2 * hpc[2, i - 1]) * ca[i]
                q3 = c1_4 * (1. + 3. * (1. - c) * q2)
                q4 = c1_5 * (1. + 4. * (1. - c) * q3)
                p0 = hpc[0, i - 1] + q1 * hpc[1, i - 1] + q2 * hpc[2, i - 1]
                p1 = (q1 * hpc[0, i - 1] + q2 * hpc[1, i - 1]
                      + q3 * hpc[2, i - 1])
                p2 = (q2 * hpc[0, i - 1] + q3 * hpc[1, i - 1]
                      + q4 * hpc[2, i - 1])
            for nt in range(ntr):
                htf[nt, i] = (p0 * tpc[0, nt, i - 1] + p1 * tpc[1, nt, i - 1]
                              + p2 * tpc[2, nt, i - 1]) * ca[i]
    return hf, htf


def sweep_fc_nosc(ipmask, dx, dp_row, tm, ca, ai, db, du, dl):
    """Full fc_nosc row sweep (cppm_fc_nosc_i, :1470-1623, single row,
    no second-pass divergence correction).  Returns (dp_new, tm_new,
    hf, htf)."""
    rc = RowCoeffs(ipmask, dx)
    N = rc.N
    ho = np.maximum(0., dp_row) + dpeps
    hm = ho.copy()
    hel, her = h_edges_nosc(rc, hm)
    hpc, tpc = parabola_coeffs_fc_nosc(rc, hm, tm, hel, her)
    hf, htf = flux_integration(ca, ai, db, du, dl, hpc, tpc)
    ntr = tm.shape[0]
    dp_new = dp_row.copy()
    tm_new = tm.copy()
    for i in range(1, N - 1):
        if ipmask[i] == 0:
            continue
        hn = ho[i] - (hf[i + 1] - hf[i]) * ai[i]
        hni = 1. / hn
        for nt in range(ntr):
            tm_new[nt, i] = (ho[i] * tm[nt, i]
                             - (htf[nt, i + 1] - htf[nt, i]) * ai[i]) * hni
        dp_new[i] = max(0., hn - dpeps)
    return dp_new, tm_new, hf, htf
