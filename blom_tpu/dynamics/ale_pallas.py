"""Fused Pallas TPU kernels for the column-local ALE pipeline.

The ALE step (ale_regrid_remap, /root/reference/phy/
mod_ale_regrid_remap.F90:1486-1984) is column-local except the lateral
interface smoothing and the dpu/dpv upstream selection.  Under plain
XLA the reconstruction and regrid-nudge sub-phases run ~25-35x above
their flop bound (fusion-split HBM round trips of the (k, j, i)
intermediates; PERF.md r4/r5).  Here the two column-local halves run
as single VMEM-resident kernels over (full-k, jb, ib) tiles, executing
the SAME jnp code (ops/hor3map.py + dynamics/ale.regrid_nudge) inside
`pallas_call`:

- K1 `regrid_call`: PPM reconstruction of T/S + the interface nudge
  -> (p_dst, smooth_fac);
- K2 `remap_call`: PPM reconstruction of all tracers + u/v on their
  rescaled grids + the fused multi-group remap -> destination means.

Between them the stencil parts (regrid_smooth, dpu_dpv_upstream) stay
in XLA.  Like cppm_pallas, these kernels are a memory-layout
optimization, not a numerical variant — interpret-mode tests pin exact
agreement with the jnp path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import hor3map as h3

# batch-tile sizes (full k stays resident)
_JB, _IB = 8, 128
#: tracer-stack chunk bound for K2 (VMEM; geometry recomputed/chunk)
_MAX_NT = 4


def _specs(kk: int, J: int, I: int, jb: int, ib: int):
    V = pltpu.VMEM
    grid = (pl.cdiv(J, jb), pl.cdiv(I, ib))
    sk1 = pl.BlockSpec((kk + 1, jb, ib), lambda j, i: (0, j, i),
                       memory_space=V)
    sk = pl.BlockSpec((kk, jb, ib), lambda j, i: (0, j, i),
                      memory_space=V)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)
    return grid, sk1, sk, ss


def regrid_call(e, ale, p_src, temp, saln, sigmar, delt1,
                interpret: bool = False):
    """K1: (p_dst, smooth_fac) from one fused kernel."""
    from .ale import regrid_nudge

    kk1, J, I = p_src.shape
    kk = kk1 - 1
    dt = p_src.dtype
    grid, sk1, sk, ss = _specs(kk, J, I, _JB, _IB)

    def kernel(d1_ref, plv_ref, p_ref, t_ref, s_ref, sr_ref, pd_ref,
               sf_ref):
        with h3.static_loops():
            p = p_ref[...]
            rc_t, rc_s = h3.ppm_reconstruct_multi(
                p, [t_ref[...], s_ref[...]], ale.tracer_limiting,
                pc_upper=ale.tracer_pc_upper)
            plv = plv_ref[...]        # (kk,1,1): broadcasts in place
            p_dst, sfac = regrid_nudge(kk, e, ale, p, rc_t, rc_s,
                                       sr_ref[...], d1_ref[0],
                                       plevel_arr=plv,
                                       clamp_impl='cummax')
            pd_ref[...] = p_dst
            sf_ref[...] = sfac

    splv = pl.BlockSpec((kk, 1, 1), lambda j, i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((kk1, J, I), dt),
                 jax.ShapeDtypeStruct((kk1, J, I), dt))
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=[ss, splv, sk1, sk, sk, sk],
        out_specs=(sk1, sk1), out_shape=out_shape, interpret=interpret,
        compiler_params=params)(
        jnp.asarray(delt1, dt).reshape(1),
        jnp.asarray(ale.plevel, dt).reshape(kk, 1, 1),
        p_src, temp, saln, sigmar)


def _remap_chunk(ale, p_src, tms, pu_q, u, pv_q, v, p_dst, pu_new,
                 pv_new, with_vel, interpret):
    kk1, J, I = p_src.shape
    kk = kk1 - 1
    dt = p_src.dtype
    nt = len(tms)
    grid, sk1, sk, _ = _specs(kk, J, I, _JB, _IB)

    def kernel(*refs):
        with h3.static_loops():
            p = refs[0][...]
            tvals = [refs[1 + i][...] for i in range(nt)]
            pos = 1 + nt
            rcs_p = h3.ppm_reconstruct_multi(
                p, tvals, ale.tracer_limiting,
                pc_upper=ale.tracer_pc_upper)
            groups = [(rcs_p, refs[pos][...])]          # p_dst
            pos += 1
            if with_vel:
                rc_u = h3.ppm_reconstruct(
                    refs[pos][...], refs[pos + 1][...],
                    ale.velocity_limiting,
                    pc_upper=ale.velocity_pc_upper)
                rc_v = h3.ppm_reconstruct(
                    refs[pos + 2][...], refs[pos + 3][...],
                    ale.velocity_limiting,
                    pc_upper=ale.velocity_pc_upper)
                groups += [([rc_u], refs[pos + 4][...]),
                           ([rc_v], refs[pos + 5][...])]
                pos += 6
            means = h3.remap_groups(groups, bottom_only_empties=True)
            outs = refs[pos:]
            o = 0
            for mn in means[0]:
                outs[o][...] = mn
                o += 1
            if with_vel:
                outs[o][...] = means[1][0]
                outs[o + 1][...] = means[2][0]

    args = [p_src] + list(tms) + [p_dst]
    in_specs = [sk1] + [sk] * nt + [sk1]
    if with_vel:
        args += [pu_q, u, pv_q, v, pu_new, pv_new]
        in_specs += [sk1, sk, sk1, sk, sk1, sk1]
    nout = nt + (2 if with_vel else 0)
    out_shape = tuple(jax.ShapeDtypeStruct((kk, J, I), dt)
                      for _ in range(nout))
    out_specs = tuple(sk for _ in range(nout))
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        compiler_params=params)(*args)
    if with_vel:
        return list(outs[:nt]), outs[nt], outs[nt + 1]
    return list(outs), None, None


def remap_call(ale, p_src, tms, pu_q, u, pv_q, v, p_dst, pu_new,
               pv_new, interpret: bool = False):
    """K2: destination means for the tracer stack and u/v from one
    fused kernel (recon + remap_groups).  Large tracer stacks are
    chunked (_MAX_NT) with the geometry recomputed per chunk."""
    nt = len(tms)
    if nt <= _MAX_NT:
        means, u_mean, v_mean = _remap_chunk(
            ale, p_src, tms, pu_q, u, pv_q, v, p_dst, pu_new, pv_new,
            True, interpret)
        return means, u_mean, v_mean
    means, u_mean, v_mean = _remap_chunk(
        ale, p_src, tms[:_MAX_NT], pu_q, u, pv_q, v, p_dst, pu_new,
        pv_new, True, interpret)
    for g0 in range(_MAX_NT, nt, _MAX_NT):
        more, _, _ = _remap_chunk(
            ale, p_src, tms[g0:g0 + _MAX_NT], None, None, None, None,
            p_dst, None, None, False, interpret)
        means += more
    return means, u_mean, v_mean
