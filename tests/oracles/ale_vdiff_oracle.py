"""Loop-level numpy oracle of the reference implicit vertical diffusion.

Transcribed from /root/reference/phy/mod_ale_vdiff.F90:50-243 (ale_vdifft)
— the in-line Thomas elimination with surface-flux nonlocal penetration —
independent of the production JAX implementation.
"""

import numpy as np

grav = 9.806     # mod_constants.F90:32
alpha0 = 1.0e-3  # mod_constants.F90:37
spcifh = 3990.0  # mod_constants.F90:34


def vdifft_column(dp, temp, saln, nut, nus, hfsw, hfns, hfrs, sfbr,
                  sfnb, sfrs, t_sw_nl, t_ns_nl, t_rs_nl, s_br_nl,
                  s_nb_nl, s_rs_nl, delt1, dpmin_vdiff):
    """One column of ale_vdifft (mod_ale_vdiff.F90:69-176).

    dp, temp, saln, nut, nus: (kk,) — nut/nus are interface diffusivities
    indexed like the reference's Kdiff (index k = interface above layer
    k; index 0 unused).  *_nl: (kk+1,) nonlocal penetration profiles.
    Returns (temp_new, saln_new)."""
    kk = len(dp)
    cpi = 1.0 / spcifh
    dtg = delt1 * grav
    c = grav * grav * delt1 / (alpha0 * alpha0)

    fpbase = np.zeros(kk)
    for k in range(1, kk):
        fpbase[k] = c / max(dpmin_vdiff, 0.5 * (dp[k - 1] + dp[k]))

    def solve(u, fp, flux_terms):
        """flux_terms(k) = summed nonlocal-divergence source for layer k
        (already multiplied by dtg[*cpi])."""
        u = u.copy()
        gam = np.zeros(kk)
        bei = 1.0 / (dp[0] + fp[1]) if kk > 1 else 1.0 / dp[0]
        rhs = dp[0] * u[0] - flux_terms[0]
        u[0] = rhs * bei
        for k in range(1, kk - 1):
            gam[k] = -fp[k] * bei
            bei = 1.0 / (dp[k] + fp[k] * (1.0 + gam[k]) + fp[k + 1])
            rhs = dp[k] * u[k] - flux_terms[k]
            u[k] = (rhs + fp[k] * u[k - 1]) * bei
        k = kk - 1
        gam[k] = -fp[k] * bei
        bei = 1.0 / (dp[k] + fp[k] * (1.0 + gam[k]))
        rhs = dp[k] * u[k] - flux_terms[k]
        u[k] = (rhs + fp[k] * u[k - 1]) * bei
        for k in range(kk - 2, -1, -1):
            u[k] = u[k] - gam[k + 1] * u[k + 1]
        return u

    fp_t = nut * fpbase
    ft = np.zeros(kk)
    ft[0] = ((1.0 - t_ns_nl[1]) * hfns + (1.0 - t_sw_nl[1]) * hfsw
             + (1.0 - t_rs_nl[1]) * hfrs) * dtg * cpi
    for k in range(1, kk):
        ft[k] = ((t_ns_nl[k] - t_ns_nl[k + 1]) * hfns
                 + (t_sw_nl[k] - t_sw_nl[k + 1]) * hfsw
                 + (t_rs_nl[k] - t_rs_nl[k + 1]) * hfrs) * dtg * cpi
    temp_new = solve(temp, fp_t, ft)

    fp_s = nus * fpbase
    fs = np.zeros(kk)
    fs[0] = ((1.0 - s_nb_nl[1]) * sfnb + (1.0 - s_br_nl[1]) * sfbr
             + (1.0 - s_rs_nl[1]) * sfrs) * dtg
    for k in range(1, kk):
        fs[k] = ((s_nb_nl[k] - s_nb_nl[k + 1]) * sfnb
                 + (s_br_nl[k] - s_br_nl[k + 1]) * sfbr
                 + (s_rs_nl[k] - s_rs_nl[k + 1]) * sfrs) * dtg
    saln_new = solve(saln, fp_s, fs)
    saln_new = np.maximum(0.0, saln_new)
    return temp_new, saln_new
