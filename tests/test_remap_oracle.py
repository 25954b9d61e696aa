"""Double-entry parity: incremental-remapping advection vs the
loop-level Fortran transcription (tests/oracles/remap_oracle.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.core.grid import finish_grid
from blom_tpu.dynamics.remap import remap_layer
from tests.oracles import remap_oracle as orc


def _setup(seed=0, jj=12, ii=16, ntr=3, periodic_i=True,
           periodic_j=False):
    rng = np.random.default_rng(seed)
    depths = np.where(rng.uniform(size=(jj, ii)) < .8, 300., 0.)
    if not periodic_i:
        depths[:, 0] = depths[:, -1] = 0.
    if not periodic_j:
        depths[0, :] = depths[-1, :] = 0.
    ones = np.ones((jj, ii))
    gs = 20e3
    grid = finish_grid(
        scpx=ones * gs, scpy=ones * gs, scux=ones * gs, scuy=ones * gs,
        scvx=ones * gs, scvy=ones * gs, scqx=ones * gs, scqy=ones * gs,
        plon=ones, plat=ones * 45., depths=depths,
        corioq=ones * 1e-4, coriop=ones * 1e-4, betafp=ones * 1e-11,
        periodic_i=periodic_i, periodic_j=periodic_j, kk=1,
        baclin=1800.)
    ip = np.asarray(grid.ip)
    iu = np.asarray(grid.iu)
    iv = np.asarray(grid.iv)
    H = (jj, ii)

    dp = rng.uniform(1e4, 4e5, H) * ip
    pb = rng.uniform(1e6, 2e6, H) * ip
    plo = np.minimum(dp * rng.uniform(1., 1.5, H), pb)
    # pbmin: min bottom pressure over the cell + 8 neighbors (the
    # caller builds it; here any consistent positive field works)
    pbmin = pb.copy()
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            n = np.roll(np.roll(pb, dj, 0), di, 1)
            pbmin = np.where((n > 0) & (pbmin > 0),
                             np.minimum(pbmin, np.where(n > 0, n,
                                                        pbmin)),
                             pbmin)
    pbu = np.minimum(pb, np.roll(pb, 1, 1)) * iu
    pbv = np.minimum(pb, np.roll(pb, 1, 0)) * iv

    # fluxing areas within the CFL bound (|ca| < cell area)
    sc = float(gs * gs)
    cau = rng.uniform(-.3, .3, H) * sc * iu
    cav = rng.uniform(-.3, .3, H) * sc * iv
    tr = np.stack([rng.uniform(2., 20., H),
                   rng.uniform(33., 36., H),
                   rng.uniform(0., 5., H)])[:ntr] * ip
    return grid, ip, iu, iv, dp, plo, pbmin, pbu, pbv, cau, cav, tr


@pytest.mark.parametrize('periodic_i,periodic_j',
                         [(True, False), (False, False)])
@pytest.mark.parametrize('seed', [0, 3])
def test_remap_layer_matches_oracle(periodic_i, periodic_j, seed):
    (grid, ip, iu, iv, dp, plo, pbmin, pbu, pbv, cau, cav,
     tr) = _setup(seed=seed, periodic_i=periodic_i,
                  periodic_j=periodic_j)
    j = jnp.asarray
    dp_new, tr_new, fdu, fdv, ftru, ftrv = remap_layer(
        grid, j(pbmin), j(pbu), j(pbv), j(plo), j(cau), j(cav),
        j(dp), j(tr))

    w_dp, w_tr, w_fdu, w_fdv, w_ftu, w_ftv = orc.remap_oracle(
        ip, iu, iv, np.asarray(grid.scp2), np.asarray(grid.scp2i),
        pbmin, pbu, pbv, plo, cau, cav, dp, tr,
        periodic_i=periodic_i, periodic_j=periodic_j)

    um = iu > 0
    vm = iv > 0
    pm = ip > 0
    fscale = max(np.abs(w_fdu).max(), np.abs(w_fdv).max(), 1.)
    np.testing.assert_allclose(np.asarray(fdu)[um], w_fdu[um],
                               rtol=1e-9, atol=1e-9 * fscale)
    np.testing.assert_allclose(np.asarray(fdv)[vm], w_fdv[vm],
                               rtol=1e-9, atol=1e-9 * fscale)
    tscale = max(np.abs(w_ftu).max(), np.abs(w_ftv).max(), 1.)
    np.testing.assert_allclose(np.asarray(ftru)[:, um], w_ftu[:, um],
                               rtol=1e-9, atol=1e-9 * tscale)
    np.testing.assert_allclose(np.asarray(ftrv)[:, vm], w_ftv[:, vm],
                               rtol=1e-9, atol=1e-9 * tscale)
    np.testing.assert_allclose(np.asarray(dp_new)[pm], w_dp[pm],
                               rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr_new)[:, pm],
                               w_tr[:, pm], rtol=1e-9, atol=1e-9)
