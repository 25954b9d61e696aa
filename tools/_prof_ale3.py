import time, dataclasses, jax, jax.numpy as jnp
from jax import lax
from blom_tpu.drivers import standalone
from blom_tpu.dynamics import step as stepmod
from blom_tpu.dynamics import ale as A
from blom_tpu.core.state import cumulative_p, dpu_dpv_upstream
from blom_tpu.core import eos
from blom_tpu.core.constants import epsilp
from blom_tpu.ops import hor3map as h3

dtype = jnp.float32
model = standalone.build_fuk95(dtype=dtype, itdm=384, jtdm=360, kdm=53)
grid, e, par = model.grid, model.e, model.par
ale = par.ale
delt1 = jnp.asarray(2.0*par.baclin, dtype)

@jax.jit
def warm(s, dfl):
    s, dfl = stepmod.blom_step(grid, e, par, model.coeffs_i, model.coeffs_j,
                               s, model.forcing, dfl, 0, 1, delt1, model.swabs)
    return stepmod.blom_step(grid, e, par, model.coeffs_i, model.coeffs_j,
                             s, model.forcing, dfl, 1, 0, delt1, model.swabs)
s0, dfl = warm(model.state, model.dfl)
jax.block_until_ready(s0.dp)
n = 1
EPS = jnp.float32(1e-30)

def timeit(name, fn, nrep=20):
    """fn: State -> (State, out); must thread a real dependency."""
    @jax.jit
    def loop(s):
        def body(c, _):
            return fn(c), None
        out, _ = lax.scan(body, s, None, length=nrep)
        return out
    out = loop(s0); jax.block_until_ready(out.dp)
    t0 = time.perf_counter()
    out = loop(s0); jax.block_until_ready(out.dp)
    print(f"{name:26s} {(time.perf_counter()-t0)/nrep*1e3:8.2f} ms/step", flush=True)

def dep(s, *arrs):
    """Perturb temp by eps*sum of outputs: forces recompute per iter."""
    acc = jnp.float32(0.)
    for a in arrs:
        acc = acc + jnp.sum(a.astype(jnp.float32) * EPS)
    return dataclasses.replace(s, temp=s.temp + acc)

def f_recon_ts(s):
    ip = grid.ip
    p_src = cumulative_p(s.dp[n]) * ip
    rcs = A._recon_multi(ale, p_src, [s.temp[n], s.saln[n]],
                         ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
    return dep(s, rcs[0].c0, rcs[0].c2, rcs[1].c0, rcs[1].c2)

def f_recon_uv(s):
    ip = grid.ip
    p_src = cumulative_p(s.dp[n]) * ip
    p_bot = p_src[grid.kk]
    pu_old = cumulative_p(s.dpu[n]); pv_old = cumulative_p(s.dpv[n])
    qu = jnp.minimum(grid.im1(p_bot), p_bot)/jnp.maximum(pu_old[grid.kk], epsilp)
    qv = jnp.minimum(grid.jm1(p_bot), p_bot)/jnp.maximum(pv_old[grid.kk], epsilp)
    rc_u = A._recon(ale, pu_old*qu, s.u[n], ale.velocity_limiting,
                    pc_upper=ale.velocity_pc_upper)
    rc_v = A._recon(ale, pv_old*qv, s.v[n], ale.velocity_limiting,
                    pc_upper=ale.velocity_pc_upper)
    return dep(s, rc_u.c0, rc_v.c0)

def f_nudge(s):
    ip = grid.ip
    p_src = cumulative_p(s.dp[n]) * ip
    rcs = A._recon_multi(ale, p_src, [s.temp[n], s.saln[n]],
                         ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
    p_dst, sf = A.regrid_nudge(grid, e, ale, p_src, rcs[0], rcs[1],
                               s.sigmar, delt1)
    return dep(s, p_dst, sf)

def f_nudge_smooth(s):
    ip = grid.ip
    p_src = cumulative_p(s.dp[n]) * ip
    rcs = A._recon_multi(ale, p_src, [s.temp[n], s.saln[n]],
                         ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
    p_dst, sf = A.regrid_nudge(grid, e, ale, p_src, rcs[0], rcs[1],
                               s.sigmar, delt1)
    p_dst = A.regrid_smooth(grid, ale, p_dst, sf, delt1)
    return dep(s, p_dst)

def f_full(s):
    s2 = A.ale_regrid_remap(grid, e, ale, s, 0, n, delt1)
    return dep(s, s2.dp[n], s2.temp[n], s2.u[n], s2.v[n])

def f_fullstep(s):
    s2, _ = stepmod.blom_step(grid, e, par, model.coeffs_i, model.coeffs_j,
                              s, model.forcing, dfl, 0, 1, delt1, model.swabs)
    return s2

timeit('recon T+S (multi)', f_recon_ts)
timeit('recon u+v', f_recon_uv)
timeit('recon TS + nudge', f_nudge)
timeit('recon TS + nudge+smooth', f_nudge_smooth)
timeit('ale full', f_full)
timeit('full step', f_fullstep)
