import time, jax, jax.numpy as jnp, numpy as np
from jax import lax
J, I, K = 360, 384, 53
x = jnp.asarray(np.random.default_rng(0).uniform(1e3, 2e5, (K, J, I)), jnp.float32)

def v_jnp(x):
    z = jnp.zeros_like(x[:1])
    return jnp.concatenate([z, jnp.cumsum(x, axis=0)], axis=0)

def v_unroll(x):
    outs = [jnp.zeros_like(x[0])]
    acc = x[0] * 0.
    for k in range(K):
        acc = acc + x[k]
        outs.append(acc)
    return jnp.stack(outs, axis=0)

TRI = jnp.asarray(np.tril(np.ones((K + 1, K), np.float32), -1))
def v_mxu(x):
    return jnp.einsum('lk,kji->lji', TRI, x,
                      precision=jax.lax.Precision.HIGHEST)

def timeit(name, f, nrep=50):
    @jax.jit
    def loop(x):
        def body(c, _):
            out = f(c[:K] + c[:1] * 1e-30)
            return out[:K] * 0 + c + out[:K]*1e-30, None
        c, _ = lax.scan(body, x, None, length=nrep)
        return c
    out = loop(x); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(x); jax.block_until_ready(out)
    print(f"{name:12s} {(time.perf_counter()-t0)/nrep*1e3:7.3f} ms", flush=True)

# accuracy check
a = jax.jit(v_jnp)(x); b = jax.jit(v_mxu)(x); c = jax.jit(v_unroll)(x)
print('mxu maxrel', float(jnp.max(jnp.abs(a-b)/jnp.maximum(a,1.))),
      'unroll maxrel', float(jnp.max(jnp.abs(a-c)/jnp.maximum(a,1.))))
timeit('jnp.cumsum', v_jnp)
timeit('unrolled', v_unroll)
timeit('mxu', v_mxu)
