"""Per-phase wall-clock profile of the bench-size step on the TPU chip.

Times each dynamics phase in an amortized jitted scan (same trip count
for warmup and measure so no recompile is timed), printing ms/step per
phase.  Phases are measured cumulatively-independently: each phase runs
standalone on a representative state, so totals need not add exactly to
the full-step time (fusion across phases changes the picture), but the
ranking tells us where to optimize.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from blom_tpu.drivers import standalone
from blom_tpu.dynamics import step as stepmod
from blom_tpu.dynamics.advect import advect
from blom_tpu.dynamics.ale import ale_regrid_remap
from blom_tpu.dynamics.barotp import barotp
from blom_tpu.dynamics.cmnfld import cmnfld
from blom_tpu.dynamics.difest import difest_lateral
from blom_tpu.dynamics.diffus import diffus
from blom_tpu.dynamics.eddtra import eddtra
from blom_tpu.dynamics.momtum import momtum
from blom_tpu.dynamics.pbcor import pbcor1, pbcor2
from blom_tpu.dynamics.pgforc import pgforc
from blom_tpu.dynamics.tmsmt import tmsmt1, tmsmt2
from blom_tpu.phys.thermf import thermf_relax
from blom_tpu.phys.vmix import difest_vertical
from blom_tpu.dynamics.ale_vdiff import ale_vdifft, ale_vdiffm


def timeit(name, fn, state, n=20):
    @jax.jit
    def loop(s):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, s, None, length=n)
        return out

    out = loop(state)           # compile + warmup
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = loop(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:22s} {dt:8.2f} ms/step")
    return dt


def main():
    dtype = jnp.float32
    itdm, jtdm, kdm = 384, 360, 53
    model = standalone.build_fuk95(dtype=dtype, itdm=itdm, jtdm=jtdm,
                                   kdm=kdm)
    # match bench.py: EG lateral diffusivity + GM + isopycnal diffusion on
    from blom_tpu.dynamics.difest import DifestParams
    model.par = model.par._replace(
        difest=DifestParams(egc=.85, egmndf=100.))
    grid, e, par = model.grid, model.e, model.par
    ci, cj = model.coeffs_i, model.coeffs_j
    forcing, dfl, swabs = model.forcing, model.dfl, model.swabs
    m, n = 0, 1
    delt1 = jnp.asarray(2.0 * par.baclin, dtype)
    dlt = par.dlt

    s0 = model.state

    # run a couple of real steps so the state is "warm" (nonzero fluxes);
    # jitted — eager dispatch through the TPU tunnel is pathologically slow
    @jax.jit
    def warm(s, dfl):
        s, dfl = stepmod.blom_step(grid, e, par, ci, cj, s, forcing, dfl,
                                   0, 1, delt1, swabs)
        return stepmod.blom_step(grid, e, par, ci, cj, s, forcing, dfl,
                                 1, 0, delt1, swabs)
    s0, dfl = warm(s0, dfl)
    jax.block_until_ready(s0.dp)

    cf0 = jax.jit(lambda s: cmnfld(grid, e, s, n))(s0)
    jax.block_until_ready(cf0.bfsqf)

    total = 0.
    total += timeit("full step", lambda s: stepmod.blom_step(
        grid, e, par, ci, cj, s, forcing, dfl, m, n, delt1, swabs)[0], s0)

    timeit("tmsmt1", lambda s: tmsmt1(grid, s, n, False), s0)
    if par.ale is not None:
        timeit("ale_regrid_remap", lambda s: ale_regrid_remap(
            grid, e, par.ale, s, m, n, delt1), s0)
    timeit("cmnfld", lambda s: _cm(grid, e, s, n), s0)
    timeit("difest+eddtra", lambda s: _de(grid, s, cf0, par, dfl, m, n,
                                          delt1), s0)
    timeit("advect", lambda s: advect(grid, s, dfl, ci, cj, m, n, delt1,
                                      dlt), s0)
    timeit("pbcor1+2", lambda s: pbcor2(grid, e, pbcor1(grid, s, m, n,
                                                        dlt), m, n, dlt),
           s0)
    timeit("diffus", lambda s: diffus(grid, e, s, dfl, m, n, delt1)[0],
           s0)
    timeit("pgforc", lambda s: pgforc(grid, e, s, m, n, par.pgfmth), s0)
    timeit("momtum", lambda s: momtum(grid, s, forcing, par.momtum,
                                      dfl.difwgt, m, n, delt1, dlt,
                                      False)[0], s0)
    timeit("vmix+ale_vdiff", lambda s: _vd(grid, e, s, forcing, swabs,
                                           par, m, n, delt1), s0)

    def _bt(s):
        _, ut, vt = momtum(grid, s, forcing, par.momtum, dfl.difwgt,
                           m, n, delt1, dlt, False)
        return barotp(grid, s, ut, vt, m, n, par.lstep, dlt, par.barotp)
    timeit("momtum+barotp", _bt, s0)
    timeit("tmsmt2", lambda s: tmsmt2(grid, s, m, n, False), s0)


def _cm(grid, e, s, n):
    import dataclasses
    cf = cmnfld(grid, e, s, n)
    # fold a cf-dependent zero into the carry so the phase isn't DCE'd
    dep = 0. * jnp.sum(cf.bfsqf)
    return dataclasses.replace(s, temp=s.temp + dep)


def _de(grid, s, cf, par, dfl, m, n, delt1):
    import dataclasses
    dfl = difest_lateral(grid, s, cf, par.difest, dfl, m, n)
    dfl = eddtra(grid, s, cf, dfl, m, n, delt1)
    dep = 0. * (jnp.sum(dfl.umfltd) + jnp.sum(dfl.difiso))
    return dataclasses.replace(s, temp=s.temp + dep)


def _vd(grid, e, s, forcing, swabs, par, m, n, delt1):
    vf = difest_vertical(grid, e, s, forcing, swabs, par.vmix, n)
    s = ale_vdifft(grid, e, s, forcing, vf, m, n, delt1)
    return ale_vdiffm(grid, s, vf, m, n, delt1)


if __name__ == "__main__":
    main()
