#!/usr/bin/env python
"""Compset presets + SMS/ERS test-list runner.

The cime_config analogue of the reference's CESM integration
(/root/reference/cime_config/testdefs/testlist_blom.xml:4-40 — the
aux_blom_noresm matrix of SMS_D_Ld1 smoke and ERS exact-restart tests
over compsets; config_compsets.xml compset long names; config_pes.xml
PE layouts).  Re-designed for the TPU runtime: a compset maps to a
standalone builder configuration (experiment x vertical coordinate x
tracer set), a PE layout maps to a jax.sharding mesh shape, and the
two reference test kinds become:

  SMS: N-step smoke — finite state + exact mass conservation;
  ERS: exact restart — run N+M straight vs run N, restart-roundtrip,
       run M; bit-identical final state (the reference's REFCASE
       comparison, ers.py semantics).

    python tools/testsuite.py [--list] [--category smoke|restart|all]
                              [--pes YxX] [--nsteps N]
"""

import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

#: compset name -> standalone builder configuration.  Names follow the
#: reference convention: NOINY* = standalone ocean (hybrid coordinate),
#: OC suffix = iHAMOCC, MICOM-era isopycnic spellings get an I prefix
#: (testlist_blom.xml + config_compsets.xml).
COMPSETS = {
    # hybrid (cntiso) vertical coordinate
    'NOINY': dict(vcoord='cntiso_hybrid'),
    'NOINYOC': dict(vcoord='cntiso_hybrid', use_bgc=True),
    'NOINYOCISO': dict(vcoord='cntiso_hybrid', use_bgc=True,
                       use_ciso=True),
    'NOINYAGE': dict(vcoord='cntiso_hybrid', use_idlage=True),
    # isopycnic bulk-ML coordinate (the MICOM heritage compsets)
    'NOIIA': dict(vcoord='isopyc_bulkml'),
    'NOIIAOC': dict(vcoord='isopyc_bulkml', use_bgc=True),
    # tripolar (bipolar fold) smoke
    'NOINYARCTIC': dict(tripolar=True),
}

DEFAULT_GRID = dict(itdm=32, jtdm=16, kdm=6)


def build(compset: str, pes=None):
    import jax
    from blom_tpu.drivers import standalone
    from blom_tpu.parallel import mesh as pmesh

    spec = dict(COMPSETS[compset])
    tripolar = spec.pop('tripolar', False)
    if tripolar:
        model = standalone.build_tripolar(itdm=32, jtdm=24, kdm=6)
    else:
        model = standalone.build_fuk95(**DEFAULT_GRID, **spec)
    if pes and pes != (1, 1):
        ny, nx = pes
        mesh = pmesh.make_mesh(jax.devices()[:ny * nx], shape=pes)
        model.state = pmesh.shard_pytree(model.state, mesh)
        model.dfl = pmesh.shard_pytree(model.dfl, mesh)
        model.grid = pmesh.shard_pytree(model.grid, mesh)
        model.forcing = pmesh.shard_pytree(model.forcing, mesh)
        model.swabs = pmesh.shard_pytree(model.swabs, mesh)
    return model


def sms(compset: str, nsteps=6, pes=None) -> str:
    """SMS_D: N-step debug smoke (finite + mass conserving)."""
    import numpy as np
    import jax.numpy as jnp
    from blom_tpu.drivers import standalone

    model = build(compset, pes)
    grid = model.grid
    # tripolar grids duplicate the top row across the fold: the
    # conserved mass is over the physical rows only
    w = grid.scp2 * grid.ip
    if grid.arctic:
        w = w.at[-1, :].set(0.)
    m0 = float(jnp.sum(model.state.dp[1].sum(0) * w))
    s, clock = standalone.run(model, nsteps)
    if not np.isfinite(np.asarray(s.dp)).all():
        return 'FAIL (non-finite dp)'
    lev = nsteps % 2
    m1 = float(jnp.sum(s.dp[lev].sum(0) * w))
    if abs(m1 - m0) / m0 > 1e-11:
        return f'FAIL (mass drift {(m1 - m0) / m0:.2e})'
    return 'PASS'


def ers(compset: str, n1=4, n2=4, pes=None) -> str:
    """ERS: exact-restart — straight N1+N2 vs restart at N1."""
    import numpy as np
    import jax
    from blom_tpu.drivers import standalone
    from blom_tpu.io import restart as rst

    ref_model = build(compset, pes)
    s_ref, _ = standalone.run(ref_model, n1 + n2)

    model = build(compset, pes)
    s1, clock1 = standalone.run(model, n1)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, 'rst.nc')
        rst.write_restart(path, s1, clock1)
        s1r, clock1r = rst.read_restart(path)
    model2 = build(compset, pes)
    model2 = dataclasses.replace(model2, state=s1r, clock=clock1r) \
        if dataclasses.is_dataclass(model2) else model2
    model2.state = s1r
    model2.clock = clock1r
    s2, _ = standalone.run(model2, n2)

    bad = []
    for name in ('dp', 'temp', 'saln', 'u', 'v', 'pb', 'ub', 'vb'):
        a = np.asarray(getattr(s_ref, name))
        b = np.asarray(getattr(s2, name))
        if not np.array_equal(a, b):
            bad.append(name)
    return 'PASS' if not bad else f'FAIL (restart diverges: {bad})'


#: the test list (the aux_blom_noresm matrix shape:
#: testlist_blom.xml:4-40)
TESTLIST = [
    ('SMS_D_Ld1', 'NOINY', 'smoke'),
    ('SMS_D_Ld1', 'NOINYOC', 'smoke'),
    ('SMS_D_Ld1', 'NOINYAGE', 'smoke'),
    ('SMS_D_Ld1', 'NOIIA', 'smoke'),
    ('SMS_D_Ld1', 'NOIIAOC', 'smoke'),
    ('SMS_D_Ld1', 'NOINYARCTIC', 'smoke'),
    ('ERS_Ld3', 'NOINY', 'restart'),
    ('ERS_Ld3', 'NOINYAGE', 'restart'),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--list', action='store_true')
    ap.add_argument('--category', default='all',
                    choices=('smoke', 'restart', 'all'))
    ap.add_argument('--pes', default='1x1',
                    help='mesh shape YxX (PE layout)')
    ap.add_argument('--nsteps', type=int, default=6)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.list:
        for name, compset, cat in TESTLIST:
            print(f'{name}.{compset}  [{cat}]')
        return 0

    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)

    pes = tuple(int(x) for x in args.pes.split('x'))
    failed = 0
    for name, compset, cat in TESTLIST:
        if args.category != 'all' and cat != args.category:
            continue
        fn = ers if cat == 'restart' else sms
        kw = {'nsteps': args.nsteps} if cat == 'smoke' else {}
        res = fn(compset, pes=pes, **kw)
        print(f'{name}.{compset:14s} {res}')
        failed += not res.startswith('PASS')
    return 1 if failed else 0


if __name__ == '__main__':
    sys.exit(main())
