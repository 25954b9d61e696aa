"""Double-entry parity: the full diapycnal mixing solver vs the
loop-level Fortran transcription (tests/oracles/diapfl_oracle.py)."""

import numpy as np
import jax.numpy as jnp

from blom_tpu.core import eos
from blom_tpu.drivers import standalone
from blom_tpu.dynamics.diapfl import diapfl
from tests.oracles import diapfl_oracle as orc


def _random_columns(model, seed=0):
    """Isopycnic-style columns: 2 mixed layers, massless pad, interior
    layers near their reference densities, random bottom truncation."""
    import dataclasses
    rng = np.random.default_rng(seed)
    grid = model.grid
    kk = grid.kk
    H = grid.shape
    ip = np.asarray(grid.ip)

    sigr = np.asarray(model.state.sigmar)
    kfpl = rng.integers(3, kk - 3, H)
    kmax = np.minimum(kk - 1, kfpl + rng.integers(1, kk - 2, H))
    dp = np.zeros((kk,) + H)
    dp[0] = 30. * 9806. * (1. + .2 * rng.random(H))
    dp[1] = 40. * 9806. * (1. + .2 * rng.random(H))
    kidx = np.arange(kk)[:, None, None]
    interior = (kidx >= kfpl) & (kidx <= kmax)
    dp = np.where(interior, 80. * 9806. * (.2 + rng.random((kk,) + H)),
                  dp)
    dp[2:] = np.where(interior[2:], dp[2:], 0.)
    dp *= ip

    temp = 12. - .6 * kidx + rng.normal(0., .2, (kk,) + H)
    e = model.e
    # interior T/S consistent-ish with reference densities + noise
    saln = np.asarray(eos.sofsig(e, jnp.asarray(
        sigr + rng.normal(0., .02, (kk,) + H)), jnp.asarray(temp)))
    dens = np.asarray(eos.sig(e, jnp.asarray(temp), jnp.asarray(saln)))

    s = model.state
    n = 1
    s = dataclasses.replace(
        s,
        dp=s.dp.at[n].set(jnp.asarray(dp)),
        temp=s.temp.at[n].set(jnp.asarray(temp)),
        saln=s.saln.at[n].set(jnp.asarray(saln)),
        sigma=s.sigma.at[n].set(jnp.asarray(dens)),
        kfpla=s.kfpla.at[n].set(jnp.asarray(kfpl)),
        ustarb=jnp.asarray(.01 * rng.random(H)))
    nu = jnp.asarray(10 ** rng.uniform(-6., -3., (kk,) + H))
    return s, nu, n


def test_diapfl_matches_column_oracle():
    model = standalone.build_fuk95(itdm=18, jtdm=8, kdm=12)
    s, nu, n = _random_columns(model)
    grid = model.grid
    e = model.e
    delt1 = 2. * model.par.baclin

    out = diapfl(grid, e, s, nu, 0, n, delt1)

    eos_cb = dict(
        sig=lambda t, sl: float(eos.sig(e, jnp.float64(t),
                                        jnp.float64(sl))),
        dsigdt=lambda t, sl: float(eos.dsigdt(e, jnp.float64(t),
                                              jnp.float64(sl))),
        dsigds=lambda t, sl: float(eos.dsigds(e, jnp.float64(t),
                                              jnp.float64(sl))),
        sofsig=lambda g, t: float(eos.sofsig(e, jnp.float64(g),
                                             jnp.float64(t))))

    ip = np.asarray(grid.ip) > 0
    c = 9.806 ** 2 * delt1 / (1.e-3 ** 2)
    jj, ii = grid.shape
    nbad = 0
    checked = 0
    for j in range(jj):
        for i in range(ii):
            if not ip[j, i]:
                continue
            tt, ss, dpp, dd, _, fpug, fplg, kmin = orc.column(
                np.asarray(s.temp[n])[:, j, i].astype(float),
                np.asarray(s.saln[n])[:, j, i].astype(float),
                np.asarray(s.dp[n])[:, j, i].astype(float),
                np.asarray(s.sigma[n])[:, j, i].astype(float),
                np.asarray(s.sigmar)[:, j, i].astype(float),
                np.asarray(nu)[:, j, i].astype(float),
                int(np.asarray(s.kfpla[n])[j, i]),
                float(np.asarray(s.ustarb)[j, i]),
                float(np.asarray(grid.coriop)[j, i]),
                c, eos_cb)
            checked += 1
            got_t = np.asarray(out.temp[n])[:, j, i]
            got_s = np.asarray(out.saln[n])[:, j, i]
            got_d = np.asarray(out.dp[n])[:, j, i]
            ok = (np.allclose(got_t, tt, rtol=1e-6, atol=1e-6)
                  and np.allclose(got_s, ss, rtol=1e-6, atol=1e-6)
                  and np.allclose(got_d, dpp, rtol=1e-6,
                                  atol=1e-3 * 9806.))
            if not ok:
                nbad += 1
                if nbad <= 3:
                    print(f'column ({j},{i}) kfpl='
                          f'{int(np.asarray(s.kfpla[n])[j, i])}')
                    print(' T got', got_t, '\n T want', tt)
                    print(' dp got', got_d, '\n dp want', dpp)
    assert checked > 50
    assert nbad == 0, f'{nbad}/{checked} columns mismatch'


def test_diapfl_conserves_and_momentum_uniform():
    """Column mass/heat/salt conservation within [kmin, kmax] and
    uniform-velocity preservation of the momentum mixing."""
    import dataclasses
    model = standalone.build_fuk95(itdm=18, jtdm=8, kdm=12)
    s, nu, n = _random_columns(model, seed=5)
    u0 = .13
    s = dataclasses.replace(
        s, u=s.u.at[n].set(jnp.full_like(s.u[n], u0) * model.grid.iu))
    grid = model.grid
    out = diapfl(grid, model.e, s, nu, 0, n, 2. * model.par.baclin)
    ip = np.asarray(grid.ip) > 0
    m0 = (np.asarray(s.dp[n]).sum(0))[ip]
    m1 = (np.asarray(out.dp[n]).sum(0))[ip]
    np.testing.assert_allclose(m1, m0, rtol=1e-11)
    h0 = (np.asarray(s.dp[n]) * np.asarray(s.temp[n])).sum(0)[ip]
    h1 = (np.asarray(out.dp[n]) * np.asarray(out.temp[n])).sum(0)[ip]
    np.testing.assert_allclose(h1, h0, rtol=1e-9, atol=1e-3)
    iu = np.asarray(grid.iu) > 0
    du = np.asarray(out.u[n])[:, iu]
    wetu = np.asarray(s.dpu[n])[:, iu] > 0.
    assert np.abs(du[wetu] - u0).max() < 1e-9
