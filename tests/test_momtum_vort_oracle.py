"""Double-entry parity: momtum vorticity/Coriolis vs the loop-level
Fortran transcription (tests/oracles/momtum_vort_oracle.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.core.grid import finish_grid
from blom_tpu.dynamics.momtum import potvor_field, coriolis_terms
from tests.oracles import momtum_vort_oracle as orc


def _setup(seed=0, jj=12, ii=18):
    rng = np.random.default_rng(seed)
    depths = np.where(rng.uniform(size=(jj, ii)) < .75, 200., 0.)
    depths[:, 0] = 0.
    depths[:, -1] = 0.
    ones = np.ones((jj, ii))
    gs = 10e3
    grid = finish_grid(
        scpx=ones * gs, scpy=ones * gs, scux=ones * gs, scuy=ones * gs,
        scvx=ones * gs, scvy=ones * gs, scqx=ones * gs, scqy=ones * gs,
        plon=ones, plat=ones * 45., depths=depths,
        corioq=ones * 1e-4, coriop=ones * 1e-4, betafp=ones * 1e-11,
        periodic_i=False, periodic_j=True, kk=1, baclin=1800.)
    ip = np.asarray(grid.ip)
    iu = np.asarray(grid.iu)
    iv = np.asarray(grid.iv)
    iq = np.asarray(grid.iq)
    H = (jj, ii)
    dp = rng.uniform(1e4, 3e5, H) * ip
    utotm = rng.normal(0., .3, H) * iu
    vtotm = rng.normal(0., .3, H) * iv
    uflux = utotm * np.maximum(dp + np.roll(dp, 1, 1), 2 * orc.CUTOFF) \
        * .5 * iu
    vflux = vtotm * np.maximum(dp + np.roll(dp, 1, 0), 2 * orc.CUTOFF) \
        * .5 * iv
    return grid, ip, iu, iv, iq, dp, utotm, vtotm, uflux, vflux


def test_potvor_matches_oracle():
    grid, ip, iu, iv, iq, dp, utotm, vtotm, uflux, vflux = _setup()
    got = np.asarray(potvor_field(grid, jnp.asarray(dp),
                                  jnp.asarray(utotm),
                                  jnp.asarray(vtotm)))
    want, touched = orc.oracle_potvor(
        ip, iu, iv, iq, dp, utotm, vtotm,
        np.asarray(grid.scux), np.asarray(grid.scvy),
        np.asarray(grid.scq2i), np.asarray(grid.corioq))
    # compare where the reference writes (boundary + interior q points);
    # untouched all-land corners are never read by cau/cav on wet cells
    m = touched
    np.testing.assert_allclose(got[m], want[m], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize('mommth', ['enscon', 'enecon', 'enedis'])
def test_coriolis_terms_match_oracle(mommth):
    grid, ip, iu, iv, iq, dp, utotm, vtotm, uflux, vflux = _setup(seed=3)
    pv = potvor_field(grid, jnp.asarray(dp), jnp.asarray(utotm),
                      jnp.asarray(vtotm))
    cau, cav = coriolis_terms(grid, jnp.asarray(dp), jnp.asarray(utotm),
                              jnp.asarray(vtotm), jnp.asarray(uflux),
                              jnp.asarray(vflux), pv, mommth)
    want_u, want_v = orc.oracle_coriolis(
        ip, iu, iv, dp, utotm, vtotm, uflux, vflux, np.asarray(pv),
        mommth)
    np.testing.assert_allclose(np.asarray(cau), want_u, rtol=1e-9,
                               atol=1e-13, err_msg=f'cau {mommth}')
    np.testing.assert_allclose(np.asarray(cav), want_v, rtol=1e-9,
                               atol=1e-13, err_msg=f'cav {mommth}')
