"""Margin-k shard_map barotropic solver (VERDICT r2 item 4).

Checks (a) numerical agreement with the GSPMD global-array path on an
8-device mesh, and (b) the collective-permute count in the compiled
HLO drops by the amortization factor (the point of the reference's
margin-2 every-2nd-substep exchange, mod_barotp.F90:387-397)."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blom_tpu.drivers import standalone
from blom_tpu.dynamics.barotp import barotp
from blom_tpu.dynamics.barotp_shmap import make_barotp_shmap
from blom_tpu.dynamics.step import blom_step
from blom_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 devices')


def _sharded_model(itdm=64, jtdm=32, kdm=6):
    model = standalone.build_fuk95(itdm=itdm, jtdm=jtdm, kdm=kdm)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    sh = {
        'grid': pmesh.shard_pytree(model.grid, mesh),
        'state': pmesh.shard_pytree(model.state, mesh),
        'forcing': pmesh.shard_pytree(model.forcing, mesh),
        'dfl': pmesh.shard_pytree(model.dfl, mesh),
        'ci': pmesh.shard_pytree(model.coeffs_i, mesh),
        'cj': pmesh.shard_pytree(model.coeffs_j, mesh),
        'swabs': pmesh.shard_pytree(model.swabs, mesh),
    }
    return model, mesh, sh


def test_shmap_matches_gspmd():
    """One full step with the shard_map barotp matches the GSPMD path."""
    model, mesh, sh = _sharded_model()
    d = jnp.asarray(model.par.baclin)

    def step_with(par):
        def f(grid, ci, cj, s, forcing, dfl, swabs):
            s2, _ = blom_step(grid, model.e, par, ci, cj, s, forcing,
                              dfl, 0, 1, d, swabs)
            return s2
        return f

    out_ref = jax.jit(step_with(model.par))(
        sh['grid'], sh['ci'], sh['cj'], sh['state'], sh['forcing'],
        sh['dfl'], sh['swabs'])

    par_sh = model.par._replace(barotp_fn=make_barotp_shmap(mesh))
    out_sh = jax.jit(step_with(par_sh))(
        sh['grid'], sh['ci'], sh['cj'], sh['state'], sh['forcing'],
        sh['dfl'], sh['swabs'])

    scale = {'pb': 2e5, 'pb_p': 2e5, 'pb_mn': 2e5, 'pbu': 2e5,
             'pbv': 2e5, 'ubflxs_p': 1e6, 'vbflxs_p': 1e6,
             'ubflx': 1e6, 'vbflx': 1e6, 'ubflx_mn': 1e6,
             'vbflx_mn': 1e6, 'ubflxs': 1e6, 'vbflxs': 1e6}
    for name in ('pb', 'pb_p', 'pb_mn', 'pbu', 'pbv', 'ub', 'vb',
                 'ubflx', 'vbflx', 'ubflxs', 'vbflxs', 'ubflxs_p',
                 'vbflxs_p', 'ubcors_p', 'vbcors_p'):
        a = np.asarray(getattr(out_ref, name))
        b = np.asarray(getattr(out_sh, name))
        np.testing.assert_allclose(
            a, b, rtol=1e-8, atol=1e-8 * scale.get(name, 1.0),
            err_msg=f'{name} differs (shmap vs gspmd)')


def _count_collectives(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    hlo = comp.as_text()
    return len(re.findall(r'collective-permute', hlo))


def test_collective_count_drops():
    """The shard_map path emits far fewer collective-permutes per
    barotropic solve than the GSPMD path."""
    model, mesh, sh = _sharded_model(itdm=64, jtdm=32, kdm=4)
    s = sh['state']
    grid = sh['grid']
    kk = model.grid.kk
    utotn = jnp.zeros_like(s.pb[0])
    vtotn = jnp.zeros_like(s.pb[0])
    lstep = model.par.lstep
    dlt = model.par.dlt

    def ref(s):
        return barotp(grid, s, utotn, vtotn, 0, 1, lstep, dlt,
                      model.par.barotp).pb

    shm = make_barotp_shmap(mesh)

    def new(s):
        return shm(grid, s, utotn, vtotn, 0, 1, lstep, dlt,
                   model.par.barotp).pb

    n_ref = _count_collectives(ref, s)
    n_new = _count_collectives(new, s)
    print(f'collective-permutes per barotp: gspmd={n_ref} shmap={n_new}')
    assert n_new < n_ref / 3, (n_ref, n_new)
