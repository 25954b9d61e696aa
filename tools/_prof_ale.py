import time, jax, jax.numpy as jnp
from blom_tpu.drivers import standalone
from blom_tpu.dynamics import step as stepmod
from blom_tpu.dynamics.ale import ale_regrid_remap

def timeit(name, fn, state, n=20):
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
    print(f"{name:22s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms/step", flush=True)

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
timeit("ale_regrid_remap", lambda s: ale_regrid_remap(grid, e, par.ale, s, 0, 1, delt1), s0)
timeit("full step", lambda s: stepmod.blom_step(grid, e, par, model.coeffs_i,
        model.coeffs_j, s, model.forcing, dfl, 0, 1, delt1, model.swabs)[0], s0)
