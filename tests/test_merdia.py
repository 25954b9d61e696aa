"""z-level remap, meridional overturning/transport, and section
diagnostics tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from blom_tpu.core.constants import onem
from blom_tpu.io import merdia as md


def test_zlev_overlap_partition():
    """z-bin overlaps partition each layer down to the deepest bin."""
    kk, jj, ii = 6, 3, 4
    dp = jnp.full((kk, jj, ii), 500. * onem)
    p_i = jnp.concatenate([jnp.zeros((1, jj, ii)),
                           jnp.cumsum(dp, 0)], 0)
    w = md.zlev_overlap(p_i)
    # total overlap equals the column thickness (column is shallower
    # than the deepest bin edge, 8000 m)
    tot = np.asarray(w.sum(axis=(0, 1)))
    np.testing.assert_allclose(tot, 6 * 500. * onem, rtol=1e-12)


def test_to_zlev_recovers_profile():
    """A linear-in-depth field bin-averages to the analytic bin means."""
    kk, jj, ii = 40, 2, 2
    dz = 100.
    dp = jnp.full((kk, jj, ii), dz * onem)
    p_i = jnp.concatenate([jnp.zeros((1, jj, ii)),
                           jnp.cumsum(dp, 0)], 0)
    zc = (np.arange(kk) + .5) * dz
    field = jnp.asarray(np.broadcast_to(zc[:, None, None],
                                        (kk, jj, ii)).copy())
    out = np.asarray(md.to_zlev(field, p_i))
    # bin 9: [175, 225] m fully inside layers; value ~ centre 200 m
    assert out[9, 0, 0] == pytest.approx(200., abs=dz)
    # bins below the column floor (4000 m) are filled with 0
    assert out[-1, 0, 0] == 0.


def test_overturning_streamfunction_closed():
    """For a flow with zero net column transport the streamfunction
    returns to ~0 at the bottom; a two-cell flow gives the expected
    mid-depth extremum."""
    kk, jj, ii = 4, 6, 5
    vflx = np.zeros((kk, jj, ii))
    vflx[:2] = 1.       # northward above
    vflx[2:] = -1.      # southward below
    vflx = jnp.asarray(vflx)
    vlat = jnp.asarray(np.broadcast_to(
        np.linspace(-30., 30., jj)[:, None], (jj, ii)).copy())
    w = md.lat_bin_weights(vlat, np.array([-90., 0.]))
    psi = np.asarray(md.overturning_streamfunction(vflx, w))
    assert psi.shape == (2, kk + 1)
    np.testing.assert_allclose(psi[:, 0], 0.)
    np.testing.assert_allclose(psi[:, -1], 0., atol=1e-12)
    assert psi[0, 2] > 0.      # mid-depth maximum


def test_meridional_transport_sums():
    kk, jj, ii = 3, 4, 5
    flx = jnp.ones((kk, jj, ii))
    vlat = jnp.asarray(np.broadcast_to(
        np.array([-10., -5., 5., 10.])[:, None], (jj, ii)).copy())
    w = md.lat_bin_weights(vlat, np.array([-90., 0.]))
    t = np.asarray(md.meridional_transport(flx, w))
    # southern bin: 2 rows * 5 cols * 3 layers = 30, same north
    np.testing.assert_allclose(t, [30., 30.])


def test_region_mask_restricts():
    kk, jj, ii = 2, 3, 4
    flx = jnp.ones((kk, jj, ii))
    vlat = jnp.zeros((jj, ii)) + 5.
    region = jnp.zeros((jj, ii)).at[:, :2].set(1.)
    w = md.lat_bin_weights(vlat, np.array([-90.]), region=region)
    t = float(np.asarray(md.meridional_transport(flx, w))[0])
    assert t == pytest.approx(2 * 3 * 2)


def test_section_transport_masks():
    kk, jj, ii = 3, 5, 6
    uflx = jnp.asarray(np.random.RandomState(0).randn(kk, jj, ii))
    vflx = jnp.asarray(np.random.RandomState(1).randn(kk, jj, ii))
    uflg, vflg = md.section_masks_along_i((jj, ii), 3)
    t = float(md.section_transport(uflx, vflx, uflg, vflg))
    expect = float(np.asarray(uflx)[:, :, 3].sum())
    assert t == pytest.approx(expect)
    uflg, vflg = md.section_masks_along_j((jj, ii), 2, i_range=(1, 4))
    t = float(md.section_transport(uflx, vflx, uflg, vflg))
    expect = float(np.asarray(vflx)[:, 2, 1:4].sum())
    assert t == pytest.approx(expect)


def test_dia_group_ops_and_zlev(tmp_path):
    """Accumulation ops (ave/min/max/sq) + z-level fields through the
    dia group machinery and the NetCDF writer."""
    from blom_tpu.drivers import standalone
    from blom_tpu.io import dia

    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=6)
    g = dia.init_group(model.grid, model.state,
                       ['sst', ('temp', 'max'),
                        ('sealv', 'sq'), 'templvl', 'salnlvl'])
    for _ in range(3):
        g = dia.accumulate(model.grid, g, model.state, 0)
    assert float(np.asarray(g.nacc)) == 3.
    # max over identical states = the state itself
    np.testing.assert_allclose(np.asarray(g.acc['tempmx']),
                               np.asarray(model.state.temp[0]))
    # zlv field has depth leading axis
    assert g.acc['templvl'].shape[0] == len(md.DEPTHSLEV)
    p = tmp_path / 'dia.nc'
    dia.write_netcdf(str(p), model.grid, g, 1.5)
    from scipy.io import netcdf_file
    with netcdf_file(str(p), 'r', mmap=False) as f:
        assert 'templvl' in f.variables
        assert f.variables['templvl'].shape[1] == len(md.DEPTHSLEV)
        sst = f.variables['sst'][0]
        wet = np.asarray(model.grid.ip) > 0
        np.testing.assert_allclose(
            sst[wet], np.asarray(model.state.temp[0, 0])[wet],
            rtol=1e-6)
    g2 = dia.reset(g)
    assert float(np.asarray(g2.nacc)) == 0.
    assert np.isinf(np.asarray(g2.acc['tempmx'])).all()


def test_write_netcdf_includes_merdia(tmp_path):
    """diaout writes the overturning streamfunction and meridional
    heat/salt transports computed from accumulated fluxes
    (MER_MMFLXL/MER_MHFLX/MER_MSFLX, mod_dia.F90:4150-4340)."""
    from scipy.io import netcdf_file
    from blom_tpu.drivers import standalone
    from blom_tpu.io import dia

    model = standalone.build_fuk95(itdm=24, jtdm=12, kdm=6)
    g = dia.init_group(model.grid, model.state,
                       ('sst', 'vflx', 'vtflx', 'vsflx'),
                       forcing=model.forcing, dfl=model.dfl)
    s, _ = standalone.run(model, 4)
    g = dia.accumulate(model.grid, g, s, 1, model.forcing, model.dfl)
    path = tmp_path / 'dia.nc'
    dia.write_netcdf(str(path), model.grid, g, 1.0)
    with netcdf_file(str(path), 'r', mmap=False) as nc:
        assert 'mmflxl' in nc.variables
        assert 'mhflx' in nc.variables
        assert 'msflx' in nc.variables
        mosf = np.array(nc.variables['mmflxl'][:])
        assert np.isfinite(mosf).all()
        assert mosf.shape[1:] == (180, model.grid.kk + 1)
