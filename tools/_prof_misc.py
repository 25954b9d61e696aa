import time, dataclasses, jax, jax.numpy as jnp
from jax import lax
from blom_tpu.drivers import standalone
from blom_tpu.dynamics import step as stepmod
from blom_tpu.dynamics.cppm import cppm_sweep
from blom_tpu.dynamics.pbcor import pbcor1, pbcor2
from blom_tpu.dynamics.advect import advect
from blom_tpu.core.state import cumulative_p

dtype = jnp.float32
model = standalone.build_fuk95(dtype=dtype, itdm=384, jtdm=360, kdm=53)
grid, e, par = model.grid, model.e, model.par
delt1 = jnp.asarray(2.0*par.baclin, dtype)
@jax.jit
def warm(s, dfl):
    s, dfl = stepmod.blom_step(grid, e, par, model.coeffs_i, model.coeffs_j,
                               s, model.forcing, dfl, 0, 1, delt1, model.swabs)
    return stepmod.blom_step(grid, e, par, model.coeffs_i, model.coeffs_j,
                             s, model.forcing, dfl, 1, 0, delt1, model.swabs)
s0, dfl = warm(model.state, model.dfl)
jax.block_until_ready(s0.dp)
EPS = jnp.float32(1e-30)

def timeit(name, fn, nrep=20):
    @jax.jit
    def loop(s):
        def body(c, _):
            return fn(c), None
        out, _ = lax.scan(body, s, None, length=nrep)
        return out
    out = loop(s0); jax.block_until_ready(out.dp)
    t0 = time.perf_counter()
    out = loop(s0); jax.block_until_ready(out.dp)
    print(f"{name:20s} {(time.perf_counter()-t0)/nrep*1e3:8.2f} ms/step", flush=True)

def dep(s, *arrs):
    acc = jnp.float32(0.)
    for a in arrs:
        acc = acc + jnp.sum(a.astype(jnp.float32) * EPS)
    return dataclasses.replace(s, temp=s.temp + acc)

n, m = 1, 0
def f_sweep_i(s):
    ip = grid.ip
    p = cumulative_p(s.dp[n]) * ip
    tm = jnp.concatenate([s.temp[n][None], s.saln[n][None]], axis=0)
    hn, tmn, hf, htf = cppm_sweep(s.dp[n], tm, s.cau, s.pbu[n], p[:-1], p[1:],
                                  grid.scp2i, model.coeffs_i, grid.periodic_i)
    return dep(s, hn, tmn, hf, htf)

def f_sweep_j(s):
    ip = grid.ip
    p = cumulative_p(s.dp[n]) * ip
    tm = jnp.concatenate([s.temp[n][None], s.saln[n][None]], axis=0)
    hn, tmn, hf, htf = cppm_sweep(s.dp[n], tm, s.cav, s.pbv[n], p[:-1], p[1:],
                                  grid.scp2i, model.coeffs_j, grid.periodic_j, ax=-2)
    return dep(s, hn, tmn, hf, htf)

def f_advect(s):
    s2 = advect(grid, s, dfl, model.coeffs_i, model.coeffs_j, m, n, delt1,
                par.dlt, par.advmth, par.cppm_compatibility, par.cppm_limiting)
    return dep(s, s2.dp[n], s2.temp[n], s2.uflx[m])

def f_pbcor(s):
    s2 = pbcor2(grid, e, pbcor1(grid, s, m, n, par.dlt), m, n, par.dlt)
    return dep(s, s2.dp[n], s2.temp[n])

def f_cump(s):
    p = cumulative_p(s.dp[n])
    return dep(s, p)

timeit('cumulative_p', f_cump)
timeit('cppm sweep i', f_sweep_i)
timeit('cppm sweep j', f_sweep_j)
timeit('advect full', f_advect)
timeit('pbcor1+2', f_pbcor)
