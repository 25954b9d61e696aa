"""Loop-level numpy oracle of one barotropic substep.

Transcribed independently from /root/reference/phy/mod_barotp.F90:
the odd substep (continuity + u-then-v with the chained new-u coriolis
source, :399-615) and the even substep (v-then-u, :617-838), for both
the enstrophy-conserving and the energy-conserving coriolis forms
('enscon' / 'enecon'-'enedis' branches).  Pure numpy, 0-based (j, i);
j reads wrap (periodic channel), out-of-range i reads are 0.

Double-entry parity partner of dynamics/barotp.make_substep
(PARITY.md methodology)."""

import numpy as np

WBARO = .125    # mod_tmsmt.F90:51


def _g(a, j, i):
    jj, ii = a.shape
    j = j % jj
    if i < 0 or i >= ii:
        return 0.0
    return a[j, i]


def oracle_substep(fld, pb_t, ubflx_t, vbflx_t, us, vs, uc, vc,
                   lll, wo, wm, wn, dlt, mommth):
    """One forward-backward substep (mod_barotp.F90:388-838).

    fld: dict of numpy (jj, ii) per-step fields (the _prologue bundle);
    pb_t/ubflx_t/vbflx_t: (2, jj, ii) working time levels; us/vs/uc/vc:
    running sums.  lll decides parity and the ml/nl slots (slot ml =
    (lll+1) %% 2 as in the production _slot convention).  Returns the
    updated (pb_t, ubflx_t, vbflx_t, us, vs, uc, vc) copies."""
    jj, ii = fld['ip'].shape
    odd = lll % 2 == 1
    ml, nl = (0, 1) if odd else (1, 0)

    pb_t = pb_t.copy()
    ubflx_t = ubflx_t.copy()
    vbflx_t = vbflx_t.copy()
    us, vs, uc, vc = us.copy(), vs.copy(), uc.copy(), vc.copy()

    ip, iu, iv = fld['ip'], fld['iu'], fld['iv']

    def pvt(j, i):
        return (wo * _g(fld['pvtrop_o'], j, i)
                + wm * _g(fld['pvtrop_m'], j, i)
                + wn * _g(fld['pvtrop_n'], j, i))

    # continuity (both parities; :401-412 / :622-633)
    pb_new = pb_t[nl].copy()
    for j in range(jj):
        for i in range(ii):
            if ip[j, i]:
                pb_new[j, i] = (
                    (1. - WBARO) * pb_t[ml, j, i]
                    + WBARO * pb_t[nl, j, i]
                    - (1. + WBARO) * dlt
                    * (_g(ubflx_t[ml], j, i + 1) - ubflx_t[ml, j, i]
                       + _g(vbflx_t[ml], j + 1, i) - vbflx_t[ml, j, i])
                    * fld['scp2i'][j, i])
            else:
                pb_new[j, i] = 0.
    pb_t[nl] = pb_new

    def u_eqn(vb_src_lev):
        for j in range(jj):
            for i in range(ii):
                if not iu[j, i]:
                    continue
                us[j, i] += -WBARO * ubflx_t[nl, j, i] \
                    + (1. + WBARO) * ubflx_t[ml, j, i]
                vsx = vb_src_lev * fld['scvxi']
                if mommth == 'enscon':
                    q = (_g(vsx, j, i) + _g(vsx, j + 1, i)
                         + _g(vsx, j, i - 1) + _g(vsx, j + 1, i - 1)) \
                        * (pvt(j, i) + pvt(j + 1, i)) * .125
                else:
                    q = .25 * ((_g(vsx, j, i) + _g(vsx, j, i - 1))
                               * pvt(j, i)
                               + (_g(vsx, j + 1, i)
                                  + _g(vsx, j + 1, i - 1))
                               * pvt(j + 1, i))
                uc[j, i] += q
                utndcy = q + (
                    wo * (fld['pgfxm_o'][j, i]
                          - (fld['xixp_o'][j, i] * pb_new[j, i]
                             - fld['xixm_o'][j, i]
                             * _g(pb_new, j, i - 1)))
                    + wm * (fld['pgfxm_m'][j, i]
                            - (fld['xixp_m'][j, i] * pb_new[j, i]
                               - fld['xixm_m'][j, i]
                               * _g(pb_new, j, i - 1)))
                    + wn * (fld['pgfxm_n'][j, i]
                            - (fld['xixp_n'][j, i] * pb_new[j, i]
                               - fld['xixm_n'][j, i]
                               * _g(pb_new, j, i - 1)))) \
                    * fld['scuxi'][j, i]
                new = ((1. - WBARO) * ubflx_t[ml, j, i]
                       + WBARO * ubflx_t[nl, j, i]
                       + (1. + WBARO) * dlt
                       * ((utndcy + fld['utotn'][j, i])
                          * fld['scuy'][j, i]
                          * min(_g(pb_new, j, i - 1), pb_new[j, i])
                          - fld['uglue'][j, i] * ubflx_t[ml, j, i]))
                ubflx_t[nl, j, i] = max(-fld['uminb'][j, i],
                                        min(fld['umaxb'][j, i], new))

    def v_eqn(ub_src_lev):
        for j in range(jj):
            for i in range(ii):
                if not iv[j, i]:
                    continue
                vs[j, i] += -WBARO * vbflx_t[nl, j, i] \
                    + (1. + WBARO) * vbflx_t[ml, j, i]
                usy = ub_src_lev * fld['scuyi']
                if mommth == 'enscon':
                    q = -(_g(usy, j, i) + _g(usy, j, i + 1)
                          + _g(usy, j - 1, i) + _g(usy, j - 1, i + 1)) \
                        * (pvt(j, i) + pvt(j, i + 1)) * .125
                else:
                    q = -.25 * ((_g(usy, j, i) + _g(usy, j - 1, i))
                                * pvt(j, i)
                                + (_g(usy, j, i + 1)
                                   + _g(usy, j - 1, i + 1))
                                * pvt(j, i + 1))
                vc[j, i] += q
                vtndcy = q + (
                    wo * (fld['pgfym_o'][j, i]
                          - (fld['xiyp_o'][j, i] * pb_new[j, i]
                             - fld['xiym_o'][j, i]
                             * _g(pb_new, j - 1, i)))
                    + wm * (fld['pgfym_m'][j, i]
                            - (fld['xiyp_m'][j, i] * pb_new[j, i]
                               - fld['xiym_m'][j, i]
                               * _g(pb_new, j - 1, i)))
                    + wn * (fld['pgfym_n'][j, i]
                            - (fld['xiyp_n'][j, i] * pb_new[j, i]
                               - fld['xiym_n'][j, i]
                               * _g(pb_new, j - 1, i)))) \
                    * fld['scvyi'][j, i]
                new = ((1. - WBARO) * vbflx_t[ml, j, i]
                       + WBARO * vbflx_t[nl, j, i]
                       + (1. + WBARO) * dlt
                       * ((vtndcy + fld['vtotn'][j, i])
                          * fld['scvx'][j, i]
                          * min(_g(pb_new, j - 1, i), pb_new[j, i])
                          - fld['vglue'][j, i] * vbflx_t[ml, j, i]))
                vbflx_t[nl, j, i] = max(-fld['vminb'][j, i],
                                        min(fld['vmaxb'][j, i], new))

    if odd:
        # u first with v(ml); then v with the NEW u (:414-615)
        u_eqn(vbflx_t[ml])
        v_eqn(ubflx_t[nl])
    else:
        # v first with u(ml); then u with the NEW v (:617-838)
        v_eqn(ubflx_t[ml])
        u_eqn(vbflx_t[nl])

    return pb_t, ubflx_t, vbflx_t, us, vs, uc, vc
