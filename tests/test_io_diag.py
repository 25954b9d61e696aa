"""Restart bit-exactness, budgets, chkvar, checksums, diagnostics."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.dynamics import budget, chkvar
from blom_tpu.io import checksum, dia, restart


@pytest.fixture(scope='module')
def model():
    return standalone.build_fuk95(itdm=48, jtdm=16, kdm=8)


def test_restart_bit_exact(model, tmp_path_factory):
    """The reference's design invariant: bit-identical continuation after
    restart (mod_blom_step.F90:104-108, SURVEY.md section 4.3)."""
    tmp = tmp_path_factory.mktemp('rst')
    path = str(tmp / 'restart.npz')

    # straight run: 8 steps
    s8, c8 = standalone.run(model, 8)

    # split run: 4 steps, checkpoint, reload, 4 more
    s4, c4 = standalone.run(model, 4)
    restart.write_restart(path, s4, c4)
    s4r, c4r = restart.read_restart(path)
    assert c4r.nstep == 4
    m2 = dataclasses.replace(model, state=s4r, clock=c4r)
    s8r, c8r = standalone.run(m2, 4)

    for f in dataclasses.fields(s8):
        a = np.asarray(getattr(s8, f.name))
        b = np.asarray(getattr(s8r, f.name))
        assert a.shape == b.shape
        assert (a == b).all(), f'{f.name} not bit-identical after restart'


def test_budget_sums(model):
    b0 = budget.budget_sums(model.grid, model.state, 1)
    s, _ = standalone.run(model, 6)
    b1 = budget.budget_sums(model.grid, s, 1)
    d = budget.budget_deltas(b0, b1)
    assert abs(d['mass']) < 1e-12
    assert abs(d['salt'] / max(abs(float(b0.salt)), 1.)) < 1e-9


def test_chkvar_passes_and_catches(model):
    ok, bad = chkvar.chkvar(model.grid, model.state, 1)
    assert bool(ok)
    # corrupt a point -> must be caught with location
    s_bad = dataclasses.replace(
        model.state, temp=model.state.temp.at[1, 0, 5, 7].set(jnp.nan))
    ok2, bad2 = chkvar.chkvar(model.grid, s_bad, 1)
    assert not bool(ok2)
    with pytest.raises(FloatingPointError) as ei:
        chkvar.chkvar_host(model.grid, s_bad, 1, nstep=42)
    assert 'j=5' in str(ei.value) and 'i=7' in str(ei.value)


def test_checksums_change_and_reproduce(model):
    c0 = checksum.state_checksums(model.state, ('dp', 'temp', 'u'))
    c0b = checksum.state_checksums(model.state, ('dp', 'temp', 'u'))
    assert c0 == c0b
    s, _ = standalone.run(model, 2)
    c1 = checksum.state_checksums(s, ('dp', 'temp', 'u'))
    assert c1 != c0


def test_dia_accumulate_and_write(model, tmp_path_factory):
    tmp = tmp_path_factory.mktemp('dia')
    g = dia.init_group(model.grid, model.state,
                       ('sealv', 'sst', 'temp', 'dp'))
    s = model.state
    for lvl in (1, 1, 1):
        g = dia.accumulate(model.grid, g, s, lvl)
    path = str(tmp / 'hd.nc')
    dia.write_netcdf(path, model.grid, g, time_days=1.0)
    assert os.path.getsize(path) > 0

    from scipy.io import netcdf_file
    with netcdf_file(path, 'r') as f:
        assert 'sst' in f.variables and 'temp' in f.variables
        sst = f.variables['sst'][0].copy()
        ipm = np.asarray(model.grid.ip) > 0
        t0 = np.asarray(s.temp[1][0])
        np.testing.assert_allclose(sst[ipm], t0[ipm].astype('f4'), rtol=1e-6)


def test_restart_rotation(tmp_path):
    """3-slot rotating restart naming + rstdate.txt log
    (mod_restart.F90:1158-1212)."""
    import os
    from blom_tpu.core import modeltime
    from blom_tpu.io import restart as rst
    from blom_tpu.drivers import standalone

    model = standalone.build_fuk95(itdm=16, jtdm=8, kdm=4)
    clock = model.clock
    paths = set()
    c = clock
    for i in range(4):
        p = rst.restart_write_rotating(str(tmp_path), 'test', model.state,
                                       c, rstfrq=1., rstmon=True)
        paths.add(os.path.basename(p))
        # advance the clock one "month" by stepping days
        for _ in range(30 * c.nstep_in_day):
            c = c.step()
    # monthly rotation reuses at most 3 slot names
    assert len(paths) <= 3
    assert os.path.exists(tmp_path / 'rstdate.txt')
    lines = open(tmp_path / 'rstdate.txt').read().strip().split('\n')
    assert len(lines) == 4
    assert 'integration day' in lines[-1]
    # read back the newest restart: bit-exact state
    import numpy as np
    s2, c2 = rst.read_restart(p)
    np.testing.assert_array_equal(np.asarray(s2.dp),
                                  np.asarray(model.state.dp))


def test_compressed_output_and_wdiflx(tmp_path):
    """Ocean-points-only packing (ncdimc/ncpack) round-trips, and the
    diagnosed-flux writer produces a loadable climatology."""
    import jax.numpy as jnp
    import numpy as np
    from blom_tpu.drivers import standalone
    from blom_tpu.io import dia
    from blom_tpu.io.wdiflx import wdiflx
    from blom_tpu.phys.idarlx import load_flux_clim

    model = standalone.build_fuk95(itdm=16, jtdm=8, kdm=4)
    g = dia.init_group(model.grid, model.state, ['sst', 'temp'])
    g = dia.accumulate(model.grid, g, model.state, 0)
    p = tmp_path / 'comp.nc'
    dia.write_netcdf_compressed(str(p), model.grid, g, 1.0)
    from scipy.io import netcdf_file
    ipm = np.asarray(model.grid.ip) > 0
    with netcdf_file(str(p), 'r', mmap=False) as f:
        idx = f.variables['pcomp'][:]
        assert idx.size == ipm.sum()
        sst = f.variables['sst'][0]
        np.testing.assert_allclose(
            sst, np.asarray(model.state.temp[0, 0]).ravel()[idx],
            rtol=1e-6)

    acc = jnp.asarray(np.random.RandomState(0).rand(48, 8, 16))
    count = jnp.full((48,), 2)
    p2 = tmp_path / 'tflxdi.npz'
    mean = wdiflx(str(p2), acc * 2., count, 'tflxap')
    clim = load_flux_clim(str(p2), 'tflxap')
    np.testing.assert_allclose(np.asarray(clim), np.asarray(acc),
                               rtol=1e-12)


def test_rdcsss_loader(tmp_path):
    import numpy as np
    from blom_tpu.phys.rdcsss import rdcsss
    arr = np.random.RandomState(1).rand(12, 6, 8) + 34.
    arr[:, 2, 3] = -9.99e33           # missing point
    p = tmp_path / 'sss.npz'
    np.savez(p, sss=arr)
    out = np.asarray(rdcsss(str(p), mask=np.ones((6, 8))))
    assert out.shape == (12, 6, 8)
    assert np.isfinite(out).all()
    assert 33. < out[:, 2, 3].mean() < 36.   # filled from neighbours


def test_sharded_restart_roundtrip(tmp_path):
    """orbax sharded restart: bit-exact round trip of the full state
    pytree + clock."""
    import numpy as np
    from blom_tpu.drivers import standalone
    from blom_tpu.io import restart as rst

    model = standalone.build_fuk95(itdm=16, jtdm=8, kdm=4)
    rst.write_restart_sharded(str(tmp_path / 'ckpt'), model.state,
                              model.clock)
    s2, c2 = rst.read_restart_sharded(str(tmp_path / 'ckpt'))
    np.testing.assert_array_equal(np.asarray(s2.dp),
                                  np.asarray(model.state.dp))
    np.testing.assert_array_equal(np.asarray(s2.trc),
                                  np.asarray(model.state.trc))
    assert c2.nstep == model.clock.nstep
    assert c2.date.to_ymd() == model.clock.date.to_ymd()


def test_mldl82_and_mldb04_are_distinct_estimators():
    """The two MLD diagnostics implement the reference's two methods
    (cmnfld_mldl82 Levitus 1982 buoyancy criterion / cmnfld_mldb04
    de Boyer Montegut 2004 sig0-vs-10m criterion,
    mod_cmnfld_routines.F90:933-1084), not one shared extractor."""
    import numpy as np
    from blom_tpu.drivers import standalone
    from blom_tpu.io.dia import DiaCtx, _mldl82, _mldb04

    model = standalone.build_fuk95(itdm=48, jtdm=16, kdm=10)
    s, _ = standalone.run(model, 4)
    c = DiaCtx(model.grid, s, e=model.e)
    a = np.asarray(_mldl82(c, 1))
    b = np.asarray(_mldb04(c, 1))
    wet = np.asarray(model.grid.ip) > 0
    depth = np.asarray(model.grid.depths)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert (a[wet] > 0.).all() and (b[wet] > 0.).all()
    assert (a[wet] <= depth[wet] + 1.).all()
    assert (b[wet] <= depth[wet] + 1.).all()
    # the methods must not be the same function of the state
    assert np.abs(a[wet] - b[wet]).max() > 1e-6


def test_sharded_dia_output_roundtrip(tmp_path):
    """write_netcdf_sharded writes per-device shard files without
    gathering (the PnetCDF-parallel analogue, mod_nctools.F90:93-218);
    reassembly is exact and matches the unsharded accumulators."""
    import jax
    import numpy as np
    from blom_tpu.drivers import standalone
    from blom_tpu.io import dia as D
    from blom_tpu.parallel import mesh as pmesh

    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=6)
    g = D.init_group(model.grid, model.state,
                     [('sst', 'ave'), ('temp', 'ave'),
                      ('mldl82', 'max')],
                     dfl=model.dfl, swabs=model.swabs)
    g = D.accumulate(model.grid, g, model.state, 1, model.forcing,
                     model.dfl, swabs=model.swabs)

    mesh = pmesh.make_mesh(jax.devices()[:8])
    g_sh = dataclasses_replace_acc(g, mesh)
    out_dir = tmp_path / 'shards'
    D.write_netcdf_sharded(str(out_dir), model.grid, g_sh, 12.5)
    got = D.read_netcdf_sharded(str(out_dir))
    assert len(list(out_dir.glob('shard_*.nc'))) >= 8
    from blom_tpu.io.dia import _acc_key
    for name, op in g.fields:
        a = np.asarray(g.acc[_acc_key(name, op)])
        if op in ('ave', 'sq'):
            a = a / max(float(np.asarray(g.nacc)), 1.)
        name = _acc_key(name, op)
        np.testing.assert_allclose(got[name], a, rtol=0, atol=0)


def dataclasses_replace_acc(g, mesh):
    import dataclasses as _dc
    from blom_tpu.parallel import mesh as pmesh
    acc = {k: pmesh.shard_pytree(v, mesh) for k, v in g.acc.items()}
    return _dc.replace(g, acc=acc)


def test_sharded_accumulators_single_file_output(tmp_path):
    """write_netcdf on mesh-sharded accumulators host-gathers and
    produces ONE global file byte-identical in content to the
    unsharded write — sharded runs need no offline reassembler
    (single-file collective path, mod_nctools.F90:93-218)."""
    import jax
    import numpy as np
    from scipy.io import netcdf_file
    from blom_tpu.drivers import standalone
    from blom_tpu.io import dia as D
    from blom_tpu.parallel import mesh as pmesh

    model = standalone.build_fuk95(itdm=32, jtdm=16, kdm=6)
    g = D.init_group(model.grid, model.state,
                     [('sst', 'ave'), ('temp', 'ave'),
                      ('mldl82', 'max')],
                     dfl=model.dfl, swabs=model.swabs)
    g = D.accumulate(model.grid, g, model.state, 1, model.forcing,
                     model.dfl, swabs=model.swabs)

    mesh = pmesh.make_mesh(jax.devices()[:8])
    g_sh = dataclasses_replace_acc(g, mesh)
    p_ref = tmp_path / 'ref.nc'
    p_sh = tmp_path / 'sharded.nc'
    D.write_netcdf(str(p_ref), model.grid, g, 12.5)
    D.write_netcdf(str(p_sh), model.grid, g_sh, 12.5)
    with netcdf_file(str(p_ref), 'r', mmap=False) as fr, \
            netcdf_file(str(p_sh), 'r', mmap=False) as fs:
        assert set(fr.variables) == set(fs.variables)
        for name, vr in fr.variables.items():
            np.testing.assert_array_equal(vr[:], fs.variables[name][:])
