import os, sys; os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
mode = sys.argv[1]
if mode == 'f64':
    jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp
sys.path.insert(0,'/root/repo')
from blom_tpu.drivers import standalone
dtype = jnp.float64 if mode == 'f64' else jnp.float32
CKPTS = [10, 40, 120, 240, 480]
model = standalone.build_fuk95(dtype=dtype)
s = model.state
done = 0
out = {}
for ck in CKPTS:
    model.state = s
    s, clock = standalone.run(model, ck - done)
    model.clock = clock
    done = ck
    np.savez(f'/tmp/drift_{mode}_{ck}.npz',
             **{f: np.asarray(getattr(s, f), np.float64)
                for f in ('dp','temp','saln','u','v','pb','sealv')})
    print(mode, 'step', ck, flush=True)
