"""TPU microbench: fused Pallas CPPM sweep vs the jnp path.

Methodology per PERF.md r4: the timed scan carries a REAL dependency
(each iteration perturbs the carried thickness by 1e-30*sum(outputs)),
otherwise XLA hoists the loop-invariant work out and the measurement is
bogus.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from blom_tpu.dynamics import cppm as cm
from blom_tpu.dynamics import cppm_pallas as cp

KK, J, I = 53, 360, 384
NT = 2
DT = jnp.float32
TRIPS = 50


def setup(ax, periodic):
    rng = np.random.default_rng(0)
    ip = np.ones((J, I))
    dx = np.full((J, I), 650.)
    co = cm.init_cppm_coeffs(ip, dx, axis=ax, periodic=periodic, dtype=DT)
    h = rng.uniform(.2, 2., (KK, J, I))
    tm = rng.uniform(1., 4., (NT, KK, J, I))
    ca = rng.uniform(-.3, .3, (KK, J, I))
    db = rng.uniform(60., 120., (J, I))
    p = np.concatenate([np.zeros((1, J, I)), np.cumsum(h, axis=0)])
    ai = np.full((J, I), 1 / 650. ** 2)
    j = lambda a: jnp.asarray(a, DT)
    return co, (j(h), j(tm), j(ca), j(db), j(p[:-1]), j(p[1:]), j(ai))


def timed(fn, h0, tm0, ca0, args, label):
    # carry EVERY field the sweep reads per-iteration so nothing is
    # loop-invariant-hoistable (PERF.md r4 methodology note)
    @jax.jit
    def loop(h, tm, ca):
        def body(c, _):
            hc, tmc, cac = c
            out = fn(hc, tmc, cac, *args)
            eps = 1e-30 * (jnp.sum(out[0]) + jnp.sum(out[2]))
            return (hc + eps, tmc + eps, cac + eps), ()
        cN, _ = jax.lax.scan(body, (h, tm, ca), None, length=TRIPS)
        return cN
    r = loop(h0, tm0, ca0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(h0, tm0, ca0)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / TRIPS * 1e3
    print(f'{label}: {dt:.2f} ms/sweep')
    return dt


def main():
    print('device:', jax.devices()[0])
    for ax, periodic, name in ((-1, True, 'i-sweep'),
                               (-2, False, 'j-sweep')):
        co, (h, tm, ca, db, du, dl, ai) = setup(ax, periodic)

        def jnp_fn(hc, tm, ca, db, du, dl, ai):
            with cm._axis(ax):
                return cm._cppm_sweep_body(hc, tm, ca, db, du, dl, ai,
                                           co, periodic, None, 'full',
                                           'non_oscillatory')

        def pal_fn(hc, tm, ca, db, du, dl, ai):
            return cp.cppm_sweep_pallas(hc, tm, ca, db, du, dl, ai, co,
                                        periodic, ax=ax)

        # correctness on-device first
        r0 = jax.jit(lambda: jnp_fn(h, tm, ca, db, du, dl, ai))()
        r1 = jax.jit(lambda: pal_fn(h, tm, ca, db, du, dl, ai))()
        for a, b, nm in zip(r0, r1, ('hn', 'tmn', 'hf', 'htf')):
            d = jnp.abs(a - b)
            err = float(jnp.max(d))
            scale = float(jnp.max(jnp.abs(a))) or 1.
            nbig = int(jnp.sum(d > 1e-4 * scale))
            print(f'  {name} {nm}: max abs diff {err:.3e} '
                  f'(rel {err / scale:.3e}) '
                  f'cells>{1e-4:g}rel: {nbig}/{d.size}')

        args = (db, du, dl, ai)
        timed(jnp_fn, h, tm, ca, args, f'{name} jnp ')
        timed(pal_fn, h, tm, ca, args, f'{name} pallas')


if __name__ == '__main__':
    main()
