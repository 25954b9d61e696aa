"""BGC diagnostic accumulation (bgcmean) tests
(reference: /root/reference/hamocc/mo_bgcmean.F90)."""

import numpy as np
import pytest

from blom_tpu.bgc import bgcmean as bm
from blom_tpu.drivers import standalone


@pytest.fixture(scope='module')
def run_out():
    model = standalone.build_fuk95(itdm=24, jtdm=8, kdm=6, use_bgc=True)
    g = bm.init_bgcm(model.grid, model.state, model.par.itrbgc)
    s, clock, ex = standalone.run(model, 3, dia_group=(g,))
    return model, s, ex['dia_group'][0]


def test_accumulation_counts(run_out):
    model, s, g = run_out
    assert float(np.asarray(g.nacc)) == 3


def test_layer_fields_thickness_weighted(run_out):
    """acclyr weights by dz; the finalized mean of a tracer must lie
    within the tracer's range (mo_bgcmean.F90:2011-2057)."""
    model, s, g = run_out
    means = bm.finalize_bgcm(g)
    wet = np.asarray(model.grid.ip) > 0
    from blom_tpu.bgc.params import BgcTracers as T
    sco = np.asarray(s.trc[1, model.par.itrbgc + T.sco212])
    m = np.asarray(means['sco212'])[:, wet]
    assert np.isfinite(m).all()
    assert m.max() <= sco[:, wet].max() * 1.5 + 1e-12
    assert (m >= 0.).all()


def test_srf_fluxes_present(run_out):
    model, s, g = run_out
    means = bm.finalize_bgcm(g)
    for k in ('co2flux', 'pco2', 'intphosy', 'carflx_bot'):
        assert np.isfinite(np.asarray(means[k])).all(), k
    # pco2 should be physical (O(100) ppm-scale partial pressure)
    wet = np.asarray(model.grid.ip) > 0
    pco2 = np.asarray(means['pco2'])[wet]
    assert pco2.max() > 10.


def test_write_netcdf(tmp_path, run_out):
    model, s, g = run_out
    p = tmp_path / 'bgcm.nc'
    bm.write_bgcm(str(p), model.grid, g, 1.0)
    from scipy.io import netcdf_file
    with netcdf_file(str(p), 'r') as f:
        assert 'co2flux' in f.variables
        assert 'sco212' in f.variables
        assert f.variables['sco212'].shape[1] == model.grid.kk
