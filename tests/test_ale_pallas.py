"""Pallas ALE kernels vs the jnp reference path (interpret mode).

K1 (recon+nudge) and K2 (recon+remap) run the same jnp code inside
pallas_call on VMEM tiles (dynamics/ale_pallas.py); on CPU interpret
they must reproduce the plain path to roundoff, including the
tracer-chunking path."""

import numpy as np
import jax.numpy as jnp
import pytest

from blom_tpu.dynamics import ale as am
from blom_tpu.dynamics import ale_pallas as ap
from blom_tpu.ops import hor3map as h3
from blom_tpu.core import eos


def _setup(kk=6, J=10, I=12, seed=0):
    rng = np.random.default_rng(seed)
    e = eos.init_eos()
    ale = am.make_ale_params(kk)
    dp = rng.uniform(.5, 3., (kk, J, I)) * 1.e4
    p = np.concatenate([np.zeros((1, J, I)), np.cumsum(dp, axis=0)])
    t = rng.uniform(2., 18., (kk, J, I))
    s = rng.uniform(33., 36., (kk, J, I))
    sigmar = np.sort(rng.uniform(24., 28., (kk, J, I)), axis=0)
    j = jnp.asarray
    return e, ale, j(p), j(t), j(s), j(sigmar)


def test_regrid_kernel_matches_jnp():
    e, ale, p, t, s, sigmar = _setup()
    delt1 = 1800.
    rc_t, rc_s = h3.ppm_reconstruct_multi(
        p, [t, s], ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
    ref_pd, ref_sf = am.regrid_nudge(p.shape[0] - 1, e, ale, p, rc_t,
                                     rc_s, sigmar, delt1)
    pd, sf = ap.regrid_call(e, ale, p, t, s, sigmar, delt1,
                            interpret=True)
    # the kernel's scan-free monotonic clamp (cummax form) differs from
    # the scan by ~1 ULP of the pressure magnitude
    np.testing.assert_allclose(np.asarray(pd), np.asarray(ref_pd),
                               rtol=1e-11, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(ref_sf),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('ntr', [0, 5])
def test_remap_kernel_matches_jnp(ntr, monkeypatch):
    monkeypatch.setattr(ap, '_MAX_NT', 3)
    e, ale, p, t, s, sigmar = _setup()
    kk, J, I = t.shape
    rng = np.random.default_rng(1)
    trc = [jnp.asarray(rng.uniform(0., 2., (kk, J, I)))
           for _ in range(ntr)]
    u = jnp.asarray(rng.uniform(-.3, .3, (kk, J, I)))
    v = jnp.asarray(rng.uniform(-.3, .3, (kk, J, I)))
    dpu = jnp.asarray(rng.uniform(.5, 3., (kk, J, I)) * 1.e4)
    pu = jnp.concatenate([jnp.zeros((1, J, I)),
                          jnp.cumsum(dpu, axis=0)], axis=0)
    # destination grid: a nudged version of p with interior minimum
    rc_t, rc_s = h3.ppm_reconstruct_multi(
        p, [t, s], ale.tracer_limiting, pc_upper=ale.tracer_pc_upper)
    p_dst, _ = am.regrid_nudge(kk, e, ale, p, rc_t, rc_s, sigmar, 1800.)
    pu_new = p_dst * 0.98
    pv_new = p_dst * 0.97

    tms = [t, s] + trc
    rcs = h3.ppm_reconstruct_multi(p, tms, ale.tracer_limiting,
                                   pc_upper=ale.tracer_pc_upper)
    rc_u = h3.ppm_reconstruct(pu, u, ale.velocity_limiting,
                              pc_upper=ale.velocity_pc_upper)
    rc_v = h3.ppm_reconstruct(pu, v, ale.velocity_limiting,
                              pc_upper=ale.velocity_pc_upper)
    ref_means, (ref_u,), (ref_v,) = h3.remap_groups(
        [(rcs, p_dst), ([rc_u], pu_new), ([rc_v], pv_new)],
        bottom_only_empties=True)

    means, u_mean, v_mean = ap.remap_call(
        ale, p, tms, pu, u, pu, v, p_dst, pu_new, pv_new,
        interpret=True)
    assert len(means) == len(ref_means)
    for a, b in zip(means, ref_means):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_mean), np.asarray(ref_u),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_mean), np.asarray(ref_v),
                               rtol=1e-12, atol=1e-12)
