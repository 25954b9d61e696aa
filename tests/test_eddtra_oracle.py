"""Double-entry parity: ALE GM eddy transport vs the loop-level
Fortran transcription (tests/oracles/eddtra_oracle.py)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.core.grid import finish_grid
from blom_tpu.core.state import cumulative_p
from blom_tpu.dynamics.eddtra import eddtra
from blom_tpu.dynamics.cmnfld import CmnFields
from tests.oracles import eddtra_oracle as orc


def _setup(seed=0, kk=8, jj=10, ii=16, kappa_scale=1e3):
    rng = np.random.default_rng(seed)
    depths = np.where(rng.uniform(size=(jj, ii)) < .8, 500., 0.)
    depths[0, :] = 0.
    depths[-1, :] = 0.
    ones = np.ones((jj, ii))
    gs = 50e3
    grid = finish_grid(
        scpx=ones * gs, scpy=ones * gs, scux=ones * gs, scuy=ones * gs,
        scvx=ones * gs, scvy=ones * gs, scqx=ones * gs, scqy=ones * gs,
        plon=ones, plat=ones * 45., depths=depths,
        corioq=ones * 1e-4, coriop=ones * 1e-4, betafp=ones * 1e-11,
        periodic_i=True, periodic_j=False, kk=kk, baclin=1800.)
    ip = np.asarray(grid.ip)
    iu = np.asarray(grid.iu)
    iv = np.asarray(grid.iv)

    # random wet columns with a few massless bottom layers
    dp = rng.uniform(2e4, 4e5, (kk, jj, ii)) * ip
    nempty = rng.integers(0, 3, (jj, ii))
    for k in range(kk):
        dp[k] = np.where(k >= kk - nempty, 0., dp[k])
    p = np.concatenate([np.zeros((1, jj, ii)), np.cumsum(dp, 0)]) * ip

    # velocity-point thicknesses/bottom pressures as the model builds
    # them (min of neighbors)
    pbu = np.minimum(p[kk], np.roll(p[kk], 1, axis=1)) * iu
    pbv = np.minimum(p[kk], np.roll(p[kk], 1, axis=0)) * iv
    dpu = np.minimum(dp, np.roll(dp, 1, axis=2)) * iu
    dpv = np.minimum(dp, np.roll(dp, 1, axis=1)) * iv

    difint = rng.uniform(.2, 1., (kk, jj, ii)) * kappa_scale * ip
    nslpx = rng.normal(0., 1e-4, (kk + 1, jj, ii)) * iu
    nslpy = rng.normal(0., 1e-4, (kk + 1, jj, ii)) * iv
    nslpx[0] = nslpx[kk] = 0.
    nslpy[0] = nslpy[kk] = 0.
    mld = rng.uniform(5., 80., (jj, ii)) * ip
    return (grid, ip, iu, iv, dp, p, dpu, dpv, pbu, pbv, difint,
            nslpx, nslpy, mld)


class _S:
    """Minimal state shim carrying the fields eddtra reads."""

    def __init__(self, dp, dpu, dpv, pbu, pbv):
        n = 0
        self.dp = dp[None]
        self.dpu = dpu[None]
        self.dpv = dpv[None]
        self.pbu = pbu[None]
        self.pbv = pbv[None]


def _dfl(difint, kk, H):
    from blom_tpu.dynamics.diffusion_fields import zero_diffusion_fields
    dfl = zero_diffusion_fields(kk, H)
    return dataclasses.replace(dfl, difint=difint)


@pytest.mark.parametrize('kappa_scale', [1e3, 5e5])
def test_eddtra_ale_matches_oracle(kappa_scale):
    """kappa_scale=1e3: the depletion limiter never fires (pure GM
    streamfunction + ML ramp parity); 5e5: the limiter fires on many
    columns and the converged flux must still agree."""
    (grid, ip, iu, iv, dp, p, dpu, dpv, pbu, pbv, difint,
     nslpx, nslpy, mld) = _setup(kappa_scale=kappa_scale)
    kk, jj, ii = dp.shape
    delt1 = 3600.

    cf = CmnFields(bfsqi=jnp.zeros((kk + 1, jj, ii)),
                   bfsqf=jnp.zeros((kk + 1, jj, ii)),
                   nslpx=jnp.asarray(nslpx), nslpy=jnp.asarray(nslpy),
                   mld=jnp.asarray(mld))
    s = _S(jnp.asarray(dp), jnp.asarray(dpu), jnp.asarray(dpv),
           jnp.asarray(pbu), jnp.asarray(pbv))
    dfl = _dfl(jnp.asarray(difint), kk, (jj, ii))

    out = eddtra(grid, s, cf, dfl, m=1, n=0, delt1=delt1)
    got_u = np.asarray(out.umfltd[1])
    got_v = np.asarray(out.vmfltd[1])

    want_u, want_v = orc.eddtra_ale_oracle(
        ip, iu, iv, np.asarray(grid.scp2), np.asarray(grid.scu2),
        np.asarray(grid.scv2), np.asarray(grid.scuy),
        np.asarray(grid.scvx), p, dp, dpu, dpv, pbu, pbv, difint,
        nslpx, nslpy, mld, delt1,
        periodic_i=True, periodic_j=False)

    scale = max(np.abs(want_u).max(), np.abs(want_v).max(), 1.)
    np.testing.assert_allclose(got_u, want_u, rtol=1e-9,
                               atol=1e-9 * scale)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-9,
                               atol=1e-9 * scale)
