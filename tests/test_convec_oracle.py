"""Double-entry parity: convective adjustment vs the loop-level
transcription (tests/oracles/convec_oracle.py)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from blom_tpu.core import eos
from blom_tpu.drivers import standalone
from blom_tpu.dynamics.convec import convec
from tests.oracles import convec_oracle as orc


def _random_state(model, seed=0):
    rng = np.random.default_rng(seed)
    grid = model.grid
    kk = grid.kk
    H = grid.shape
    ip = np.asarray(grid.ip)
    sigr = np.asarray(model.state.sigmar)
    kidx = np.arange(kk)[:, None, None]

    kfpl = rng.integers(2, kk - 2, H)
    kmax = np.minimum(kk - 1, kfpl + rng.integers(1, kk - 1, H))
    kfplo = np.clip(kfpl + rng.integers(-2, 5, H), 2, kk + 1)
    dp = np.zeros((kk,) + H)
    dp[0] = 25. * 9806. * (1. + .2 * rng.random(H))
    dp[1] = 35. * 9806. * (1. + .2 * rng.random(H))
    interior = (kidx >= kfpl) & (kidx <= kmax)
    dp = np.where(interior, 60. * 9806. * (.1 + rng.random((kk,) + H)),
                  dp)
    dp[2:] = np.where(interior[2:], dp[2:], 0.)
    dp *= ip

    temp = 14. - .5 * kidx + rng.normal(0., .8, (kk,) + H)
    e = model.e
    # make some columns statically UNSTABLE at the ML base: ML denser
    # than interior in ~half the columns
    sig_target = sigr + rng.normal(0., .05, (kk,) + H)
    unstable = rng.random(H) < .5
    sig_target[0] = np.where(unstable, sigr[kk // 2], sigr[0])
    sig_target[1] = np.where(unstable, sigr[kk // 2] + .02, sigr[1])
    saln = np.asarray(eos.sofsig(e, jnp.asarray(sig_target),
                                 jnp.asarray(temp)))
    dens = np.asarray(eos.sig(e, jnp.asarray(temp), jnp.asarray(saln)))

    s = model.state
    n = 1
    s = dataclasses.replace(
        s,
        dp=s.dp.at[n].set(jnp.asarray(dp)),
        temp=s.temp.at[n].set(jnp.asarray(temp)),
        saln=s.saln.at[n].set(jnp.asarray(saln)),
        sigma=s.sigma.at[n].set(jnp.asarray(dens)),
        kfpla=s.kfpla.at[n].set(jnp.asarray(kfplo)))
    return s, n


def test_convec_matches_column_oracle():
    model = standalone.build_fuk95(itdm=18, jtdm=8, kdm=12)
    s, n = _random_state(model)
    grid = model.grid
    e = model.e
    out = convec(grid, e, s, 0, n)

    eos_cb = dict(
        sig=lambda t, sl: float(eos.sig(e, jnp.float64(t),
                                        jnp.float64(sl))),
        sofsig=lambda g, t: float(eos.sofsig(e, jnp.float64(g),
                                             jnp.float64(t))),
        rho=lambda p, t, sl: float(eos.rho(jnp.float64(p),
                                           jnp.float64(t),
                                           jnp.float64(sl))))

    ip = np.asarray(grid.ip) > 0
    jj, ii = grid.shape
    nbad = checked = 0
    for j in range(jj):
        for i in range(ii):
            if not ip[j, i]:
                continue
            tt, ss, dpp, dd, _, kfpl = orc.column(
                np.asarray(s.temp[n])[:, j, i].astype(float),
                np.asarray(s.saln[n])[:, j, i].astype(float),
                np.asarray(s.dp[n])[:, j, i].astype(float),
                np.asarray(s.sigma[n])[:, j, i].astype(float),
                np.asarray(s.sigmar)[:, j, i].astype(float),
                int(np.asarray(s.kfpla[n])[j, i]), eos_cb)
            checked += 1
            got_t = np.asarray(out.temp[n])[:, j, i]
            got_s = np.asarray(out.saln[n])[:, j, i]
            got_d = np.asarray(out.dp[n])[:, j, i]
            got_k = int(np.asarray(out.kfpla[n])[j, i])
            # compare where mass lives (massless T/S are filled later
            # by diapfl in the step sequence)
            wet = (dpp > 1e-9) | (got_d > 1e-9)
            ok = (np.allclose(got_d, dpp, rtol=1e-9, atol=1e-6)
                  and np.allclose(got_t[wet], tt[wet], rtol=1e-9,
                                  atol=1e-9)
                  and np.allclose(got_s[wet], ss[wet], rtol=1e-9,
                                  atol=1e-9)
                  and got_k == min(kfpl, grid.kk))
            if not ok:
                nbad += 1
                if nbad <= 3:
                    print(f'({j},{i}) kfplo='
                          f'{int(np.asarray(s.kfpla[n])[j, i])} '
                          f'kfpl got {got_k} want {kfpl}')
                    print(' dp got ', got_d / 9806.)
                    print(' dp want', dpp / 9806.)
                    print(' T got ', got_t)
                    print(' T want', tt)
    assert checked > 50
    assert nbad == 0, f'{nbad}/{checked} columns mismatch'
