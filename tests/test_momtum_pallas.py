"""Pallas momentum kernel vs the jnp reference path.

The Pallas kernel (dynamics/momtum_pallas.py) runs momtum._uv_body on
VMEM-resident (kb, J, I) blocks; in interpret mode on CPU it must
reproduce the jnp path to roundoff for all three Coriolis schemes and
both boundary topologies."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.core.grid import finish_grid
from blom_tpu.dynamics.momtum import (Momtum2DIn, MomtumKIn,
                                      MomtumParams, _uv_body)
from blom_tpu.dynamics.momtum_pallas import momtum_uv_pallas


def _setup(seed=0, kk=5, jj=12, ii=18, periodic_i=False,
           periodic_j=True):
    rng = np.random.default_rng(seed)
    depths = np.where(rng.uniform(size=(jj, ii)) < .75, 200., 0.)
    if not periodic_i:
        depths[:, 0] = 0.
        depths[:, -1] = 0.
    if not periodic_j:
        depths[0, :] = 0.
        depths[-1, :] = 0.
    ones = np.ones((jj, ii))
    gs = 10e3
    grid = finish_grid(
        scpx=ones * gs, scpy=ones * gs, scux=ones * gs, scuy=ones * gs,
        scvx=ones * gs, scvy=ones * gs, scqx=ones * gs, scqy=ones * gs,
        plon=ones, plat=ones * 45., depths=depths,
        corioq=ones * 1e-4, coriop=ones * 1e-4, betafp=ones * 1e-11,
        periodic_i=periodic_i, periodic_j=periodic_j, kk=kk,
        baclin=1800.)
    ip = np.asarray(grid.ip)
    iu = np.asarray(grid.iu)
    iv = np.asarray(grid.iv)
    H3 = (kk, jj, ii)
    H2 = (jj, ii)
    j = jnp.asarray

    dp = rng.uniform(1e4, 3e5, H3) * ip
    dpu = rng.uniform(1e4, 3e5, H3) * iu
    dpv = rng.uniform(1e4, 3e5, H3) * iv
    p = np.concatenate([np.zeros((1, jj, ii)), np.cumsum(dp, 0)])
    pu = np.concatenate([np.zeros((1, jj, ii)), np.cumsum(dpu, 0)])
    pv = np.concatenate([np.zeros((1, jj, ii)), np.cumsum(dpv, 0)])

    f = MomtumKIn(
        u_m=j(rng.normal(0., .3, H3) * iu),
        u_n=j(rng.normal(0., .3, H3) * iu),
        v_m=j(rng.normal(0., .3, H3) * iv),
        v_n=j(rng.normal(0., .3, H3) * iv),
        dp_m=j(dp), dpu_m=j(dpu), dpv_m=j(dpv),
        p_lo=j(p[:-1]), p_hi=j(p[1:]),
        pu_lo=j(pu[:-1]), pu_hi=j(pu[1:]),
        pv_lo=j(pv[:-1]), pv_hi=j(pv[1:]),
        stress_u=j(rng.normal(0., 1e-6, H3) * iu),
        stress_v=j(rng.normal(0., 1e-6, H3) * iv),
        pgf_u=j(rng.normal(0., 1e-3, H3) * iu),
        pgf_v=j(rng.normal(0., 1e-3, H3) * iv))
    d2 = Momtum2DIn(
        ubflxs_m=j(rng.normal(0., 1e7, H2) * iu),
        ubflxs_n=j(rng.normal(0., 1e7, H2) * iu),
        vbflxs_m=j(rng.normal(0., 1e7, H2) * iv),
        vbflxs_n=j(rng.normal(0., 1e7, H2) * iv),
        pbu_m=j(pu[-1]), pbv_m=j(pv[-1]),
        pbu_n=j(pu[-1] * 1.01), pbv_n=j(pv[-1] * 1.01),
        drag=j(rng.uniform(0., 1e-7, H2) * ip),
        ubrhs=j(rng.normal(0., 1e-5, H2) * iu),
        vbrhs=j(rng.normal(0., 1e-5, H2) * iv),
        difwgt=j(rng.uniform(0., 1., H2) * ip))
    return grid, f, d2


@pytest.mark.parametrize('mommth', ['enscon', 'enecon', 'enedis'])
@pytest.mark.parametrize('periodic_i', [True, False])
def test_pallas_matches_jnp(mommth, periodic_i):
    grid, f, d2 = _setup(periodic_i=periodic_i)
    par = MomtumParams(mommth=mommth, mdv2hi=2., mdv2lo=1.,
                       vsc4hi=.1, vsc4lo=.05)
    tsfac, delt1 = 0.75, 3600.
    u_ref, v_ref = _uv_body(grid, par, f, d2, tsfac, delt1)
    u_pl, v_pl = momtum_uv_pallas(grid, par, f, d2, tsfac, delt1,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(u_pl), np.asarray(u_ref),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_ref),
                               rtol=1e-12, atol=1e-14)
