"""Fused Pallas TPU kernel for the momentum-equation stencil core.

One `pallas_call` runs the ENTIRE per-layer section of the baroclinic
momentum solve (total velocities + potential vorticity + deformation
viscosity + longitudinal/lateral momentum fluxes + Coriolis + bottom
drag application; reference /root/reference/phy/mod_momtum.F90:388-1152)
on VMEM-resident whole-(jdm, idm) planes, blocked over k.  The
arithmetic is literally `momtum._uv_body` — the same traced jnp program
as the CPU/f64 reference path — executed inside the kernel on loaded
blocks, so the Pallas path is a memory-layout optimization, not a
numerical variant (same discipline as cppm_pallas / ale_pallas).

Why this wins: the body is ~600 flops/cell of dense elementwise work
with ±1-point stencils in BOTH horizontal axes and >60 live plane
temporaries.  Under plain XLA the DAG splits into many fusions that
round-trip (k, j, i) intermediates through HBM — measured ~16 ms at
bench size (PERF.md r4/r5) vs a sub-ms flop bound.  The fused kernel
reads each 3-D input once and writes u_new/v_new once: ~19 planes of
traffic per level ≈ 0.7 ms at v5e HBM bandwidth.

Tiling: k is a pure batch axis (every op in the body is elementwise
over k) → grid (kk/kb,) with (kb, J, I) blocks; both horizontal axes
stay whole in VMEM so the ±1 shifts (jnp.roll / zero-fill concat from
ops/stencil.py) need no inter-block halos.  The 2-D inputs (barotropic
fluxes, bottom pressures, drag, r.h.s., difwgt) and the 21 grid
metric/mask planes are stacked and fetched once (constant index map).

Gating (momtum._pallas_ok): TPU + f32 + non-arctic grid.  Under the
shard_map step the per-shard grid is fold-free (step_shmap builds
arctic=False inner grids), so sharded tripolar production runs DO take
this kernel; only the single-device GSPMD tripolar path falls back.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .momtum import Momtum2DIn, MomtumKIn, _uv_body

_KB = 1          # k-levels per block (whole planes; VMEM-bounded)

# Grid fields consumed by _uv_body (incl. potvor_field/coriolis_terms),
# replaced with VMEM-resident planes inside the kernel.
_METRICS = ('ip', 'iu', 'iv', 'iq',
            'scux', 'scuy', 'scvx', 'scvy', 'scuxi', 'scvyi',
            'scu2', 'scv2', 'scp2i', 'scq2i',
            'scpx', 'scpy', 'scqx', 'scqy',
            'difmxp', 'difmxq', 'corioq')

_N3 = len(MomtumKIn._fields)


def _make_kernel(grid, par):
    def kernel(*refs):
        f = MomtumKIn(*[r[...] for r in refs[:_N3]])
        ms = refs[_N3]
        d2 = Momtum2DIn(*[refs[_N3 + 1][i] for i in
                          range(len(Momtum2DIn._fields))])
        scal = refs[_N3 + 2]
        u_o, v_o = refs[_N3 + 3], refs[_N3 + 4]
        gk = dataclasses.replace(
            grid, **{name: ms[i] for i, name in enumerate(_METRICS)})
        u_new, v_new = _uv_body(gk, par, f, d2, scal[0], scal[1])
        u_o[...] = u_new
        v_o[...] = v_new
    return kernel


def momtum_uv_pallas(grid, par, f: MomtumKIn, d2: Momtum2DIn,
                     tsfac, delt1, interpret: bool = False):
    """Drop-in Pallas replacement for momtum._uv_body on TPU/f32."""
    kk, J, I = f.u_m.shape
    dt = f.u_m.dtype
    V = pltpu.VMEM

    ms = jnp.stack([jnp.asarray(getattr(grid, name), dt)
                    for name in _METRICS])
    d2s = jnp.stack([jnp.asarray(a, dt) for a in d2])
    scal = jnp.stack([jnp.asarray(tsfac, dt).reshape(()),
                      jnp.asarray(delt1, dt).reshape(())])

    s3 = pl.BlockSpec((_KB, J, I), lambda k: (k, 0, 0), memory_space=V)
    sM = pl.BlockSpec((len(_METRICS), J, I), lambda k: (0, 0, 0),
                      memory_space=V)
    s2 = pl.BlockSpec((len(Momtum2DIn._fields), J, I),
                      lambda k: (0, 0, 0), memory_space=V)
    ssc = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shape = (jax.ShapeDtypeStruct((kk, J, I), dt),
                 jax.ShapeDtypeStruct((kk, J, I), dt))
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        _make_kernel(grid, par),
        grid=(pl.cdiv(kk, _KB),),
        in_specs=[s3] * _N3 + [sM, s2, ssc],
        out_specs=(s3, s3),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params)(*f, ms, d2s, scal)
