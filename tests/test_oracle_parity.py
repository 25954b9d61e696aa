"""Double re-derivation parity tests (PARITY.md).

Each oracle in tests/oracles/ is a loop-level numpy transcription of the
reference Fortran, written independently of the production JAX code.
These tests assert the vectorized production implementations match the
oracles to f64 roundoff on randomized inputs — catching vectorization,
indexing and mask bugs in the Fortran -> dense-array re-design.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from blom_tpu.ops import hor3map as h3
from oracles import hor3map_oracle as h3o


def _rand_column(rng, kk, jumpy=False):
    """Random nonuniform column: interface positions + cell means."""
    h = rng.uniform(0.4, 2.5, size=kk)
    x = np.concatenate([[0.0], np.cumsum(h)])
    if jumpy:
        u = np.where(np.arange(kk) < kk // 2, 1.0, 0.0) \
            + 0.1 * rng.standard_normal(kk)
    else:
        u = np.sin(np.linspace(0, 3, kk)) + 0.3 * rng.standard_normal(kk)
    return x, u


@pytest.mark.parametrize('limiting', ['no_limiting', 'monotonic',
                                      'non_oscillatory',
                                      'non_oscillatory_posdef'])
def test_ppm_ih4_matches_oracle(limiting):
    rng = np.random.default_rng(7)
    kk = 12
    for trial in range(24):
        x, u = _rand_column(rng, kk, jumpy=trial % 2 == 0)
        if limiting == 'non_oscillatory_posdef':
            u = np.abs(u)
        pc_ref = h3o.ppm_reconstruct(x, u, limiting=limiting)

        lim = {'no_limiting': 'none',
               'monotonic': h3.MONOTONIC,
               'non_oscillatory': h3.NON_OSCILLATORY,
               'non_oscillatory_posdef': h3.NON_OSCILLATORY_POSDEF}[limiting]
        rc = h3.ppm_ih4_reconstruct(jnp.asarray(x)[:, None],
                                    jnp.asarray(u)[:, None],
                                    limiting=lim)
        got = np.stack([np.asarray(rc.c0)[:, 0],
                        np.asarray(rc.c1)[:, 0],
                        np.asarray(rc.c2)[:, 0]])
        np.testing.assert_allclose(got, pc_ref, rtol=1e-9, atol=1e-9,
                                   err_msg=f'trial {trial}')


def test_ppm_remap_matches_oracle():
    rng = np.random.default_rng(3)
    kk, kd = 12, 9
    for trial in range(12):
        x, u = _rand_column(rng, kk)
        pc_ref = h3o.ppm_reconstruct(x, u, limiting='non_oscillatory')
        # random destination grid spanning the same column
        w = rng.uniform(0.2, 2.0, size=kd)
        xd = np.concatenate([[0.0], np.cumsum(w)])
        xd *= x[-1] / xd[-1]
        ud_ref = h3o.remap_ppm(x, pc_ref, u, xd)

        rc = h3.ppm_ih4_reconstruct(jnp.asarray(x)[:, None],
                                    jnp.asarray(u)[:, None],
                                    limiting=h3.NON_OSCILLATORY)
        ud = np.asarray(h3.remap_means(rc, jnp.asarray(xd)[:, None]))[:, 0]
        np.testing.assert_allclose(ud, ud_ref, rtol=1e-9, atol=1e-9,
                                   err_msg=f'trial {trial}')


def test_ppm_remap_conserves():
    rng = np.random.default_rng(11)
    kk, kd = 10, 17
    x, u = _rand_column(rng, kk)
    w = rng.uniform(0.2, 2.0, size=kd)
    xd = np.concatenate([[0.0], np.cumsum(w)])
    xd *= x[-1] / xd[-1]
    rc = h3.ppm_ih4_reconstruct(jnp.asarray(x)[:, None],
                                jnp.asarray(u)[:, None],
                                limiting=h3.MONOTONIC)
    ud = np.asarray(h3.remap_means(rc, jnp.asarray(xd)[:, None]))[:, 0]
    np.testing.assert_allclose((ud * np.diff(xd)).sum(),
                               (u * np.diff(x)).sum(), rtol=1e-12)


# ---------------------------------------------------------------- vdiff
def test_ale_vdifft_matches_oracle():
    import dataclasses
    import jax.numpy as jnp
    from blom_tpu.drivers import standalone
    from blom_tpu.dynamics import ale_vdiff
    from blom_tpu.phys import vmix
    from oracles import ale_vdiff_oracle as vo

    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=10)
    grid, e = model.grid, model.e
    kk = grid.kk
    H = grid.shape
    rng = np.random.default_rng(5)
    s = model.state
    n = 1

    # randomize the state columns (wet mask applied)
    ip = np.asarray(grid.ip)
    dp = rng.uniform(0.3, 3.0, size=(kk,) + H) * 1e4 * ip
    temp = rng.uniform(2., 20., size=(kk,) + H) * ip
    saln = rng.uniform(30., 37., size=(kk,) + H) * ip
    s = dataclasses.replace(
        s, dp=s.dp.at[n].set(jnp.asarray(dp)),
        temp=s.temp.at[n].set(jnp.asarray(temp)),
        saln=s.saln.at[n].set(jnp.asarray(saln)))

    # random forcing
    f = model.forcing
    rnd2 = lambda lo, hi: jnp.asarray(rng.uniform(lo, hi, size=H) * ip)
    f = dataclasses.replace(
        f, surflx=rnd2(-200., 200.), sswflx=rnd2(0., 150.),
        surrlx=rnd2(-50., 50.), salflx=rnd2(-5e-3, 5e-3),
        brnflx=rnd2(-2e-3, 0.), salrlx=rnd2(-1e-3, 1e-3))

    # random mixing fields: monotone nonlocal profiles 1 -> 0
    def nonloc():
        w = rng.uniform(0., 1., size=(kk + 1,) + H)
        cum = np.cumsum(w, axis=0)
        prof = 1.0 - cum / cum[-1]
        prof[0] = 1.0
        prof[-1] = 0.0
        return jnp.asarray(prof)

    Kd_t = jnp.asarray(rng.uniform(0., 5e-3, size=(kk,) + H))
    Kd_s = jnp.asarray(rng.uniform(0., 5e-3, size=(kk,) + H))
    vf = vmix.VmixFields(
        Kvisc_m=Kd_t, Kdiff_t=Kd_t, Kdiff_s=Kd_s,
        t_sw_nonloc=nonloc(), s_br_nonloc=nonloc(),
        t_ns_nonloc=nonloc(), s_nb_nonloc=nonloc(),
        t_rs_nonloc=nonloc(), s_rs_nonloc=nonloc(),
        buoyfl=jnp.zeros((kk + 1,) + H), mld=jnp.zeros(H))

    delt1 = 2400.0
    out = ale_vdiff.ale_vdifft(grid, e, s, f, vf, 0, n, delt1)
    t_new = np.asarray(out.temp[n])
    s_new = np.asarray(out.saln[n])

    wet = np.argwhere(ip > 0)
    for (j, i) in wet[::7][:20]:
        t_ref, s_ref = vo.vdifft_column(
            dp[:, j, i], temp[:, j, i], saln[:, j, i],
            np.asarray(Kd_t)[:, j, i], np.asarray(Kd_s)[:, j, i],
            float(f.sswflx[j, i]),
            float(f.surflx[j, i] - f.sswflx[j, i]),
            float(f.surrlx[j, i]),
            float(f.brnflx[j, i]),
            float(f.salflx[j, i] - f.brnflx[j, i]),
            float(f.salrlx[j, i]),
            np.asarray(vf.t_sw_nonloc)[:, j, i],
            np.asarray(vf.t_ns_nonloc)[:, j, i],
            np.asarray(vf.t_rs_nonloc)[:, j, i],
            np.asarray(vf.s_br_nonloc)[:, j, i],
            np.asarray(vf.s_nb_nonloc)[:, j, i],
            np.asarray(vf.s_rs_nonloc)[:, j, i],
            delt1, ale_vdiff.dpmin_vdiff)
        np.testing.assert_allclose(t_new[:, j, i], t_ref,
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(s_new[:, j, i], s_ref,
                                   rtol=1e-9, atol=1e-9)


# ------------------------------------------------------------------ EOS
def test_eos_matches_oracle():
    from blom_tpu.core import eos
    from oracles import eos_oracle as eo

    e = eos.init_eos(pref=2000.e4, expcnf='fuk95')
    c = eo.inieos(2000.e4)
    rng = np.random.default_rng(2)
    for _ in range(50):
        th = rng.uniform(-2., 30.)
        s = rng.uniform(1., 40.)
        p = rng.uniform(0., 6000.e4)
        np.testing.assert_allclose(float(eos.rho(p, th, s)),
                                   eo.rho(p, th, s), rtol=1e-13)
        np.testing.assert_allclose(float(eos.sig(e, th, s)),
                                   eo.sig(c, th, s), rtol=1e-12)
        sg = eo.sig(c, th, s)
        np.testing.assert_allclose(float(eos.tofsig(e, sg, s)),
                                   eo.tofsig(c, sg, s), rtol=1e-10)
        np.testing.assert_allclose(float(eos.sofsig(e, sg, th)),
                                   eo.sofsig(c, sg, th), rtol=1e-10)
        # round trips close the inverse pair
        np.testing.assert_allclose(eo.tofsig(c, sg, s), th, rtol=1e-8,
                                   atol=1e-8)
        np.testing.assert_allclose(eo.sofsig(c, sg, th), s, rtol=1e-8,
                                   atol=1e-8)


def test_p_alpha_series_vs_analytic_log():
    """The production truncated series (mod_eos.F90:418-436) must agree
    with the exact analytic log integral to near roundoff over oceanic
    parameter ranges."""
    from blom_tpu.core import eos
    from oracles import eos_oracle as eo

    rng = np.random.default_rng(9)
    for _ in range(50):
        th = rng.uniform(-2., 30.)
        s = rng.uniform(5., 40.)
        p1 = rng.uniform(0., 5000.e4)
        p2 = p1 + rng.uniform(1.e2, 1000.e4)
        got = float(eos.p_alpha(p1, p2, th, s))
        ref = eo.p_alpha_analytic(p1, p2, th, s)
        np.testing.assert_allclose(got, ref, rtol=1e-12)
        d, a1, a2 = eos.delphi(p1, p2, th, s)
        np.testing.assert_allclose(float(d),
                                   eo.delphi_analytic(p1, p2, th, s),
                                   rtol=1e-12)


# ----------------------------------------------------------------- CPPM
def test_cppm_fc_nosc_sweep_matches_oracle():
    """Production vectorized CPPM fc_nosc sweep vs the loop-level
    Fortran-transcribed oracle on random masked rows."""
    from blom_tpu.dynamics import cppm
    from oracles import cppm_oracle as co

    rng = np.random.default_rng(13)
    N = 24
    for trial in range(6):
        ipmask = np.ones(N, np.int32)
        ipmask[0] = ipmask[-1] = 0
        # a land gap to exercise partial stencils
        g = rng.integers(5, N - 7)
        ipmask[g] = 0
        if trial % 2:
            ipmask[g + 1] = 0

        dx = rng.uniform(.5, 2., N) * 1e4
        dp_row = rng.uniform(0., 3., N) * 1e4 * ipmask
        ntr = 3
        tm = rng.uniform(0., 20., (ntr, N)) * ipmask

        # geometry: per-cell bottom pressure, layer top/bottom
        pbot = rng.uniform(4., 8., N) * 1e4
        du = rng.uniform(0., 2., N) * 1e4
        dl = du + dp_row
        db = np.zeros(N)
        ca = np.zeros(N)
        ai = 1.0 / (dx * dx)
        iu = np.zeros(N)
        for i in range(1, N):
            iu[i] = ipmask[i - 1] * ipmask[i]
            db[i] = min(pbot[i - 1], pbot[i])
        # flux areas bounded by CFL-ish fraction of upstream cell area
        ca = (rng.uniform(-1., 1., N) * .2 * dx * dx
              * np.minimum(1., dp_row / 1e4)) * iu

        dp_ref, tm_ref, hf_ref, htf_ref = co.sweep_fc_nosc(
            ipmask, dx, dp_row, tm, ca, ai, db, du, dl)

        import jax.numpy as jnp
        coeffs = cppm.init_cppm_coeffs(ipmask[None], dx[None], axis=-1,
                                       periodic=False)
        sh = lambda a: jnp.asarray(a)[None, None]
        hn, tm_new, hf, htf = cppm.cppm_sweep(
            sh(dp_row), jnp.asarray(tm)[:, None, None], sh(ca), sh(db),
            sh(du), sh(dl), sh(ai), coeffs, periodic=False,
            compatibility='full', limiting='non_oscillatory')
        dp_new = np.maximum(0., np.asarray(hn)[0, 0] - cppm.dpeps)
        tm_got = np.asarray(tm_new)[:, 0, 0]
        hf_got = np.asarray(hf)[0, 0]
        htf_got = np.asarray(htf)[:, 0, 0]

        wet = ipmask.astype(bool)
        wetu = iu.astype(bool)
        np.testing.assert_allclose(hf_got[wetu], hf_ref[wetu],
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f'hf trial {trial}')
        np.testing.assert_allclose(htf_got[:, wetu], htf_ref[:, wetu],
                                   rtol=1e-9, atol=1e-7,
                                   err_msg=f'htf trial {trial}')
        np.testing.assert_allclose(dp_new[wet], dp_ref[wet],
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f'dp trial {trial}')
        np.testing.assert_allclose(tm_got[:, wet], tm_ref[:, wet],
                                   rtol=1e-9, atol=1e-8,
                                   err_msg=f'tm trial {trial}')


# --------------------------------------------------------------- barotp
def test_barotp_weights_match_oracle():
    """Production per-substep PGF weights vs the Fortran-transcribed
    block schedule (mod_barotp.F90:328-358)."""
    from blom_tpu.dynamics import barotp as bt
    from oracles.barotp_weights_oracle import weight_schedule

    for lstep in (8, 30, 64):
        sched = weight_schedule(lstep)
        wfn = bt.substep_weights(lstep)
        for nb, rows in sched.items():
            for (lll, wo, wm, wn) in rows:
                got = wfn(nb, lll)
                np.testing.assert_allclose(got, (wo, wm, wn),
                                           rtol=1e-14, atol=1e-15,
                                           err_msg=f'lstep={lstep} '
                                                   f'nb={nb} lll={lll}')
        # weights must always sum to one
        for nb, rows in sched.items():
            for (_, wo, wm, wn) in rows:
                assert abs(wo + wm + wn - 1.) < 1e-12


# --------------------------------------------------------------- mxlayr
def test_mxlayr_detrainment_matches_oracle():
    """Production vectorized Oberhuber TKE balance vs the loop-level
    transcription: TKE coefficients, term decomposition and the
    damped-Newton detrainment depth (mod_mxlayr.F90:330-454)."""
    import dataclasses
    import jax.numpy as jnp
    from blom_tpu.core.constants import onem
    from blom_tpu.drivers import standalone
    from blom_tpu.dynamics import mxlayr as mx
    from oracles import mxlayr_oracle as mo

    model = standalone.build_fuk95(vcoord='isopyc_bulkml',
                                   itdm=32, jtdm=12, kdm=10)
    grid, e = model.grid, model.e
    H = grid.shape
    # warming + weak wind: stabilizing buoyancy flux -> detrainment
    f = dataclasses.replace(
        model.forcing,
        surflx=jnp.full(H, -250.) * grid.ip,      # heat INTO the ocean
        taux=jnp.full(H, .02) * grid.iu)
    s0 = model.state
    dfl0 = model.dfl
    par = mx.MxlayrParams()
    delt1 = 2. * model.par.baclin
    s1, dfl1 = mx.mxlayr(grid, e, s0, f, par, 0, 1,
                         jnp.asarray(delt1, s0.dp.dtype),
                         swabs=model.swabs, dfl=dfl0)

    ip = np.asarray(grid.ip)
    dp_n = np.asarray(s0.dp[1])
    t_n = np.asarray(s0.temp[1])
    s_n = np.asarray(s0.saln[1])
    mtke = np.asarray(dfl1.mtke)
    dp1_new = np.asarray(s1.dp[1])
    swfc2 = np.asarray(model.swabs.swfc2)
    swal2 = np.asarray(model.swabs.swal2)
    coriop = np.asarray(grid.coriop)
    scp2 = np.asarray(grid.scp2)
    scuxi = np.asarray(grid.scuxi)
    scvyi = np.asarray(grid.scvyi)
    surflx = np.asarray(f.surflx)
    taux = np.asarray(f.taux)
    tauy = np.asarray(f.tauy)

    jj, ii = H
    # loop-level bg2 (mod_mxlayr.F90:222-280), all-wet interior only
    q12 = 1. / np.maximum(dp_n[0] + dp_n[1], 1e-30)
    tm = (t_n[0] * dp_n[0] + t_n[1] * dp_n[1]) * q12
    sm = (s_n[0] * dp_n[0] + s_n[1] * dp_n[1]) * q12
    c = mo._sig0_coeffs()
    b = np.zeros(H)
    for j in range(jj):
        for i in range(ii):
            b[j, i] = mo.grav * mo.alpha0 * mo.eo.sig(c, tm[j, i],
                                                      sm[j, i])

    checked = 0
    for j in range(3, jj - 3):
        for i in range(3, ii - 3, 5):
            if ip[j, i] == 0 or min(ip[j - 1, i], ip[j + 1, i],
                                    ip[j, i - 1], ip[j, i + 1]) == 0:
                continue
            u2 = lambda i_: ((b[j, i_] - b[j, i_ - 1])
                             * scuxi[j, i_]) ** 2
            v2 = lambda j_: ((b[j_, i] - b[j_ - 1, i])
                             * scvyi[j_, i]) ** 2
            bg2 = .5 * (u2(i) + u2(i + 1)) + .5 * (v2(j) + v2(j + 1))

            txp = .5 * (taux[j, i] + taux[j, i + 1])
            typ = .5 * (tauy[j, i] + tauy[min(j + 1, jj - 1), i])
            ustar = np.sqrt(np.sqrt(txp ** 2 + typ ** 2) / 1000.)
            coeffs = mo.tke_coeffs(
                dp_n[0, j, i], dp_n[1, j, i], t_n[0, j, i], t_n[1, j, i],
                s_n[0, j, i], s_n[1, j, i], surflx[j, i], 0., 0., 0.,
                swfc2[j, i], max(swal2[j, i], 1e-3), coriop[j, i],
                ustar, ustar ** 3, par.rm0, bg2, scp2[j, i], par.ce,
                par.tau_mlr, par.lfmin, rtsflg=1)

            pres3 = dp_n[0, j, i] + dp_n[1, j, i]
            us, ni, bf, rs, _ = mo.tke_terms(pres3, coeffs,
                                             floor_pm=False)
            tkew0 = us + ni + bf + rs
            if not (tkew0 < 0. and pres3 > mx.mltmin * onem):
                continue    # only validate the detraining branch here
            pmxl_ref = mo.detrain_pmxl(0., pres3, coeffs)
            pmxl_got = dp1_new[0, j, i] + dp1_new[1, j, i]
            assert abs(pmxl_got - pmxl_ref) < mo.tencm, (
                j, i, pmxl_got / onem, pmxl_ref / onem)
            # mtke term decomposition at the solved depth
            us, ni, bf, rs, _ = mo.tke_terms(pmxl_ref, coeffs)
            np.testing.assert_allclose(
                mtke[:4, j, i], [us, ni, bf, rs], rtol=1e-5,
                atol=1e-12, err_msg=f'({j},{i})')
            checked += 1
    assert checked >= 10, checked
