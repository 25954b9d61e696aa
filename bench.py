"""Benchmark: baroclinic step-loop throughput on one TPU chip.

Metric: grid-points/s per chip (itdm*jtdm*kdm*steps / wall) on a
tnx1-class grid (384 x 360 x 53, the reference's 1-degree global size,
/root/reference/bld/tnx1v4) running the full fuk95-physics step loop
(CPPM advection + dynamic-enthalpy PGF + momentum + 30-substep
split-explicit barotropic solver + corrections + smoothing).

vs_baseline: the only quantitative anchor the reference publishes is the
fuk95 CI budget — 1 model day (480 steps of 156x32x12) within 900 s on a
CI CPU (tests/fuk95/meson.build:19-24) = 31,949 grid-points/s.  The
ratio reported is measured gp/s over that anchor.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from blom_tpu.drivers import standalone
    from blom_tpu.dynamics.step import make_two_step

    dtype = jnp.float32
    itdm, jtdm, kdm = 384, 360, 53
    model = standalone.build_fuk95(dtype=dtype, itdm=itdm, jtdm=jtdm,
                                   kdm=kdm)

    # enable the Eden-Greatbatch lateral diffusivity, GM eddy-induced
    # transport and isopycnal diffusion so the benchmark measures the
    # FULL production physics step (EGC=0.85 is the reference's
    # production deck value, e.g. NorESM tnx1 limits &DIFFUSION), not
    # the fuk95 idealized deck with those phases compiled out.
    from blom_tpu.dynamics.difest import DifestParams
    model.par = model.par._replace(
        difest=DifestParams(egc=.85, egmndf=100.))

    two_step = make_two_step(model.grid, model.e, model.par,
                             model.coeffs_i, model.coeffs_j,
                             model.forcing, model.dfl)

    @jax.jit
    def run_pairs(s, delt1_pairs):
        return jax.lax.scan(two_step, s, delt1_pairs)

    d2 = jnp.asarray(2.0 * model.par.baclin, dtype)

    def pairs(n):
        return (jnp.full((n,), d2), jnp.full((n,), d2))

    npairs = 10
    # warmup / compile with the SAME trip count (a different scan length
    # is a different XLA program)
    carry = (model.state, model.dfl)
    carry, _ = run_pairs(carry, pairs(npairs))
    jax.block_until_ready(carry[0].dp)

    t0 = time.perf_counter()
    carry, _ = run_pairs(carry, pairs(npairs))
    jax.block_until_ready(carry[0].dp)
    wall = time.perf_counter() - t0

    nsteps = 2 * npairs
    gps = itdm * jtdm * kdm * nsteps / wall
    baseline_gps = 156 * 32 * 12 * 480 / 900.0

    print(json.dumps({
        'metric': 'grid-points/s per chip (tnx1-class step loop)',
        'value': round(gps, 1),
        'unit': 'gridpoints/s',
        'vs_baseline': round(gps / baseline_gps, 2),
        'detail': {
            'grid': [itdm, jtdm, kdm],
            'steps': nsteps,
            'wall_s': round(wall, 3),
            'sec_per_step': round(wall / nsteps, 4),
            'platform': jax.devices()[0].platform,
            'device': str(jax.devices()[0]),
        },
    }))


if __name__ == '__main__':
    main()
