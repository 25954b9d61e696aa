import time, dataclasses, jax, jax.numpy as jnp
from jax import lax
from blom_tpu.drivers import standalone
from blom_tpu.dynamics import step as stepmod
from blom_tpu.dynamics import ale as A
from blom_tpu.core.state import cumulative_p, dpu_dpv_upstream
from blom_tpu.core import eos
from blom_tpu.ops import hor3map as h3

def timeit(name, fn, arg, n=20):
    @jax.jit
    def loop(a):
        def body(c, _):
            out = fn(a)
            # fold result into carry to avoid DCE, keep arg static
            leaves = jax.tree_util.tree_leaves(out)
            acc = c
            for l in leaves:
                acc = acc + jnp.sum(l.astype(jnp.float32))
            return acc, None
        out, _ = lax.scan(body, jnp.float32(0.), None, length=n)
        return out
    out = loop(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(arg); jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms/step", flush=True)

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
ip, iu, iv = grid.ip, grid.iu, grid.iv
p_src = cumulative_p(s0.dp[n]) * ip

timeit("recon T+S (multi)", lambda s: A._recon_multi(ale, p_src, [s.temp[n], s.saln[n]],
        ale.tracer_limiting, pc_upper=ale.tracer_pc_upper), s0)
rcs = A._recon_multi(ale, p_src, [s0.temp[n], s0.saln[n]],
                     ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
rc_t, rc_s = rcs
timeit("regrid_nudge", lambda s: A.regrid_nudge(grid, e, ale, p_src, rc_t, rc_s,
        s.sigmar, delt1), s0)
p_dst, sf = jax.jit(lambda s: A.regrid_nudge(grid, e, ale, p_src, rc_t, rc_s, s.sigmar, delt1))(s0)
timeit("regrid_smooth", lambda s: A.regrid_smooth(grid, ale, p_dst, sf, delt1), s0)
timeit("cumul+dpu_dpv", lambda s: dpu_dpv_upstream(grid, cumulative_p(
        jnp.maximum(p_dst[1:]-p_dst[:-1],0.)*ip)*ip), s0)
dp_new = jnp.maximum(p_dst[1:]-p_dst[:-1],0.)*ip
p_new = cumulative_p(dp_new)*ip
dpu_new, dpv_new = dpu_dpv_upstream(grid, p_new)
pu_new = cumulative_p(dpu_new); pv_new = cumulative_p(dpv_new)
pu_old = cumulative_p(s0.dpu[n]); pv_old = cumulative_p(s0.dpv[n])
p_bot = p_src[grid.kk]
from blom_tpu.core.constants import epsilp
qu = jnp.minimum(grid.im1(p_bot), p_bot)/jnp.maximum(pu_old[grid.kk], epsilp)
qv = jnp.minimum(grid.jm1(p_bot), p_bot)/jnp.maximum(pv_old[grid.kk], epsilp)
timeit("recon u", lambda s: A._recon(ale, pu_old*qu, s.u[n], ale.velocity_limiting,
        pc_upper=ale.velocity_pc_upper), s0)
rc_u = A._recon(ale, pu_old*qu, s0.u[n], ale.velocity_limiting, pc_upper=ale.velocity_pc_upper)
rc_v = A._recon(ale, pv_old*qv, s0.v[n], ale.velocity_limiting, pc_upper=ale.velocity_pc_upper)
timeit("remap_groups", lambda s: h3.remap_groups([
    ([rc_t, rc_s], p_dst), ([rc_u], pu_new), ([rc_v], pv_new)]), s0)
