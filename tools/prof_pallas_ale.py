"""TPU microbench: fused Pallas ALE kernels vs the jnp path.

State-carried scan (real dependency) per PERF.md methodology.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from blom_tpu.drivers import standalone
from blom_tpu.dynamics import step as stepmod
from blom_tpu.dynamics.ale import ale_regrid_remap

TRIPS = 20


def timeit(name, fn, state, n=TRIPS):
    @jax.jit
    def loop(s):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, s, None, length=n)
        return out

    out = loop(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = loop(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:22s} {dt:8.2f} ms/step")
    return out


def main():
    dtype = jnp.float32
    model = standalone.build_fuk95(dtype=dtype, itdm=384, jtdm=360,
                                   kdm=53)
    grid, e, par = model.grid, model.e, model.par
    delt1 = jnp.asarray(2.0 * par.baclin, dtype)

    @jax.jit
    def warm(s, dfl):
        s, dfl = stepmod.blom_step(grid, e, par, model.coeffs_i,
                                   model.coeffs_j, s, model.forcing,
                                   dfl, 0, 1, delt1, model.swabs)
        return s
    s0 = warm(model.state, model.dfl)
    jax.block_until_ready(s0.dp)

    import numpy as np
    # correctness: pallas vs jnp on-device
    os.environ['BLOM_TPU_PALLAS'] = '0'
    ref = jax.jit(lambda s: ale_regrid_remap(grid, e, par.ale, s, 0, 1,
                                             delt1))(s0)
    os.environ['BLOM_TPU_PALLAS'] = '1'
    out = jax.jit(lambda s: ale_regrid_remap(grid, e, par.ale, s, 0, 1,
                                             delt1), backend=None)(s0)
    for nm in ('dp', 'temp', 'saln', 'u', 'v'):
        a = np.asarray(getattr(ref, nm), np.float64)
        b = np.asarray(getattr(out, nm), np.float64)
        d = np.abs(a - b)
        sc = max(1., np.abs(a).max())
        print(f'  {nm}: max abs diff {d.max():.3e} (rel {d.max()/sc:.3e})'
              f' cells>1e-4rel: {(d > 1e-4*sc).sum()}/{d.size}')

    os.environ['BLOM_TPU_PALLAS'] = '0'
    timeit('ale jnp', lambda s: ale_regrid_remap(grid, e, par.ale, s,
                                                 0, 1, delt1), s0)
    os.environ['BLOM_TPU_PALLAS'] = '1'
    timeit('ale pallas', lambda s: ale_regrid_remap(grid, e, par.ale, s,
                                                    0, 1, delt1), s0)


if __name__ == '__main__':
    main()
