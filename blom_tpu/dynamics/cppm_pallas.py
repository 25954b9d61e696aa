"""Fused Pallas TPU kernel for the CPPM transport sweep.

One `pallas_call` per sweep runs the ENTIRE 1-D CPPM kernel family
(thickness edge reconstruction + compatible tracer-edge LU solves +
limiters + upstream flux integration + cell update; reference
/root/reference/phy/mod_cppm.F90:1470-2498) on VMEM-resident tiles.
The per-element arithmetic is literally `cppm._cppm_sweep_body` — the
same traced jnp program as the CPU/f64 reference path — executed inside
the kernel on loaded blocks, so the Pallas path is a memory-layout
optimization, not a numerical variant.

Why this wins: the sweep is ~500 flops/cell of dense elementwise work
with +-2-point shifts along the sweep axis.  Under plain XLA the
expression DAG is split into several fusions that each round-trip the
(k, j, i) intermediates through HBM — measured ~11 ms/sweep at bench
size vs a ~2 ms flop bound (PERF.md r4).  The fused kernel reads each
input once and writes each output once.

Tiling: the sweep axis is kept fully VMEM-resident (shifts need no
halo); the other two axes are pure batch dims and are blocked:

- i-sweep (ax=-1): grid (J/jb, kk/kb), blocks (kb, jb, I);
- j-sweep (ax=-2): grid (I/ib, kk/kb), blocks (kb, J, ib) — the j axis
  (sublanes) stays whole, so the reference's 12 full-array transposes
  per step (mod_cppm.F90:2731-2744) never happen on TPU either.

The (12, J, I) tracer-matrix coefficient slabs tmc0/l/r (36 fields)
would dominate the VMEM budget of the full-J j-sweep blocks; they are
instead rebuilt in-kernel from the grid spacing `dx` — the
unconditional polynomial part of set_stencil_coeffs
(mod_cppm.F90:101-320) — trading ~120 flops per 2-D cell (amortized
over kb k-levels) for ~7 MB of VMEM.

The grid iterates k innermost so 2-D blocks (coeffs, db, ai) keep the
same block index across the inner loop and are fetched once per
row-block (Pallas skips re-fetch on unchanged index maps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cppm import CppmCoeffs, _axis, _cppm_sweep_body

# batch-axis block sizes (tunable; VMEM-bounded).  The sweep axis is
# always whole.
_KB_I, _JB_I = 8, 8      # i-sweep: blocks (8, 8, I)
_KB_J, _IB_J = 2, 128    # j-sweep: blocks (2, J, 128)
_MAX_NT = 4              # tracer-stack chunk size (VMEM bound); larger
#                          stacks re-run the h-geometry per chunk


def _dx_sh(dx, off, periodic, ax):
    """Grid spacing at (idx + off) along the sweep axis with EDGE
    REPLICATION at closed boundaries — the dxs() helper of
    init_cppm_coeffs (dynamics/cppm.py)."""
    if off == 0:
        return dx
    n = dx.shape[ax]
    if periodic:
        return jnp.roll(dx, -off, axis=ax)

    def take(lo, hi):
        idx = [slice(None)] * dx.ndim
        idx[ax] = slice(lo, hi)
        return dx[tuple(idx)]

    edge = take(n - 1, n) if off > 0 else take(0, 1)
    reps = [edge] * abs(off)
    if off > 0:
        return jnp.concatenate([take(off, n)] + reps, axis=ax)
    return jnp.concatenate(reps + [take(0, n + off)], axis=ax)


def _tmc_from_dx(dx, periodic, ax):
    """tmc0/tmcl/tmcr (12-tuples) from the 4-cell grid-spacing stencil —
    the unconditional polynomial block of set_stencil_coeffs
    (mod_cppm.F90:101-320; transcribed from cppm._set_stencil_coeffs_np
    with dx[0..3] densified to shifted fields)."""
    c1_2, c1_3, c2_3, c1_4, c3_4 = .5, 1 / 3., 2 / 3., .25, .75
    c1_5, c1_6, c1_10, c1_12, c1_15, c1_20 = \
        1 / 5., 1 / 6., 1 / 10., 1 / 12., 1 / 15., 1 / 20.

    d0 = _dx_sh(dx, -2, periodic, ax)
    d1 = _dx_sh(dx, -1, periodic, ax)
    d2 = dx
    d3 = _dx_sh(dx, 1, periodic, ax)

    a12 = -d1 - c1_2 * d0
    a22 = -c1_2 * d1
    a32 = c1_2 * d2
    a42 = d2 + c1_2 * d3
    a13 = a12 * a12 + c1_12 * d0 * d0
    a23 = -c2_3 * a22 * d1
    a33 = c2_3 * a32 * d2
    a43 = a42 * a42 + c1_12 * d3 * d3
    a14 = (a13 + c1_6 * d0 * d0) * a12
    a24 = -c3_4 * a23 * d1
    a34 = c3_4 * a33 * d2
    a44 = (a43 + c1_6 * d3 * d3) * a42

    tmcl = (
        -c1_12 * d0,
        (c1_10 * d0 + c1_6 * d1) * d0,
        -(c1_10 * (d0 + 3 * d1) * d0 + c1_4 * d1 ** 2) * d0,
        -c1_12 * d1,
        c1_10 * d1 ** 2,
        -c1_10 * d1 ** 3,
        -c1_12 * d2,
        -c1_15 * d2 ** 2,
        -c1_20 * d2 ** 3,
        -c1_12 * d3,
        -(c1_15 * d3 + c1_6 * d2) * d3,
        -(c1_5 * (c1_4 * d3 + d2) * d3 + c1_4 * d2 ** 2) * d3,
    )
    tmcr = (
        c1_12 * d0,
        -(c1_15 * d0 + c1_6 * d1) * d0,
        (c1_5 * (c1_4 * d0 + d1) * d0 + c1_4 * d1 ** 2) * d0,
        c1_12 * d1,
        -c1_15 * d1 ** 2,
        c1_20 * d1 ** 3,
        c1_12 * d2,
        c1_10 * d2 ** 2,
        c1_10 * d2 ** 3,
        c1_12 * d3,
        (c1_10 * d3 + c1_6 * d2) * d3,
        (c1_10 * (d3 + 3 * d2) * d3 + c1_4 * d2 ** 2) * d3,
    )
    tmc0 = (
        a12,
        a13 - tmcl[1] - tmcr[1],
        a14 - tmcl[2] - tmcr[2],
        a22,
        a23 - tmcl[4] - tmcr[4],
        a24 - tmcl[5] - tmcr[5],
        a32,
        a33 - tmcl[7] - tmcr[7],
        a34 - tmcl[8] - tmcr[8],
        a42,
        a43 - tmcl[10] - tmcr[10],
        a44 - tmcl[11] - tmcr[11],
    )
    return tmc0, tmcl, tmcr


def _make_kernel(periodic, has_div, compatibility, limiting, ax, itrc0):
    def kernel(*refs):
        (st, hevc, ssc, scc, d2m, dx, db, ai,
         hm, ca, du, dl, tm) = refs[:13]
        p = 13
        div = None
        if has_div:
            div = refs[p][...]
            p += 1
        hn_o, tmn_o, hf_o, htf_o = refs[p:p + 4]

        if compatibility == 'full':
            tmc0, tmcl, tmcr = _tmc_from_dx(dx[...], periodic, ax)
        else:
            z = jnp.zeros_like(dx[...])
            tmc0 = tmcl = tmcr = (z,) * 12
        co = CppmCoeffs(stencil=st[...], hevc=hevc[...], ssc=ssc[...],
                        scc=scc[...], d2m=d2m[...],
                        tmc0=tmc0, tmcl=tmcl, tmcr=tmcr)
        with _axis(ax):
            hn, tmn, hf, htf = _cppm_sweep_body(
                hm[...], tm[...], ca[...], db[...], du[...], dl[...],
                ai[...], co, periodic, div, compatibility, limiting,
                itrc0)
        hn_o[...] = hn
        tmn_o[...] = tmn
        hf_o[...] = hf
        htf_o[...] = htf
    return kernel


def _sweep_chunk(hm, tm, ca, db, du, dl, ai, co, periodic, div_corr,
                 compatibility, limiting, ax, itrc0, interpret):
    kk, J, I = hm.shape
    nt = tm.shape[0]
    dt = hm.dtype
    V = pltpu.VMEM

    if ax == -1:
        kb, rb = _KB_I, _JB_I
        grid = (pl.cdiv(J, rb), pl.cdiv(kk, kb))   # k innermost
        s3 = pl.BlockSpec((kb, rb, I), lambda r, k: (k, r, 0),
                          memory_space=V)
        s4 = pl.BlockSpec((nt, kb, rb, I), lambda r, k: (0, k, r, 0),
                          memory_space=V)
        s2 = pl.BlockSpec((rb, I), lambda r, k: (r, 0), memory_space=V)
        sh = pl.BlockSpec((4, rb, I), lambda r, k: (0, r, 0),
                          memory_space=V)
    elif ax == -2:
        kb, rb = _KB_J, _IB_J
        grid = (pl.cdiv(I, rb), pl.cdiv(kk, kb))
        s3 = pl.BlockSpec((kb, J, rb), lambda r, k: (k, 0, r),
                          memory_space=V)
        s4 = pl.BlockSpec((nt, kb, J, rb), lambda r, k: (0, k, 0, r),
                          memory_space=V)
        s2 = pl.BlockSpec((J, rb), lambda r, k: (0, r), memory_space=V)
        sh = pl.BlockSpec((4, J, rb), lambda r, k: (0, 0, r),
                          memory_space=V)
    else:
        raise ValueError(f'sweep axis {ax}')

    def s23(a):
        # db/ai are 2-D in the production call path but 3-D in some
        # unit-test fixtures; pick the spec by rank
        return s3 if a.ndim == 3 else s2

    in_specs = [s2, sh, s2, s2, s2, s2, s23(db), s23(ai),
                s3, s3, s3, s3, s4]
    args = [co.stencil, co.hevc, co.ssc, co.scc, co.d2m, co.dx,
            db, ai, hm, ca, du, dl, tm]
    has_div = div_corr is not None
    if has_div:
        in_specs.append(s3)
        args.append(div_corr)

    out_shape = (jax.ShapeDtypeStruct((kk, J, I), dt),
                 jax.ShapeDtypeStruct((nt, kk, J, I), dt),
                 jax.ShapeDtypeStruct((kk, J, I), dt),
                 jax.ShapeDtypeStruct((nt, kk, J, I), dt))
    out_specs = (s3, s4, s3, s4)

    kernel = _make_kernel(periodic, has_div, compatibility, limiting,
                          ax, itrc0)
    # the fused expression DAG keeps ~40 block-sized temporaries live;
    # raise Mosaic's scoped-VMEM cap above the 16 MB default (v5e has
    # 128 MiB VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        compiler_params=params)(*args)


def cppm_sweep_pallas(hm, tm, ca, db, du, dl, ai, co: CppmCoeffs,
                      periodic: bool, div_corr=None,
                      compatibility: str = 'full',
                      limiting: str = 'non_oscillatory', ax: int = -1,
                      interpret: bool = False):
    """Drop-in Pallas replacement for cppm.cppm_sweep on TPU/f32.

    Large tracer stacks (BGC) are chunked into groups of _MAX_NT to
    bound VMEM; the thickness geometry is recomputed per chunk (the
    h outputs are identical — the first chunk's are returned)."""
    nt = tm.shape[0]
    if nt <= _MAX_NT:
        return _sweep_chunk(hm, tm, ca, db, du, dl, ai, co, periodic,
                            div_corr, compatibility, limiting, ax, 0,
                            interpret)
    hn = hf = None
    tmn_parts, htf_parts = [], []
    for g0 in range(0, nt, _MAX_NT):
        chunk = tm[g0:g0 + _MAX_NT]
        hn_c, tmn_c, hf_c, htf_c = _sweep_chunk(
            hm, chunk, ca, db, du, dl, ai, co, periodic, div_corr,
            compatibility, limiting, ax, g0, interpret)
        if hn is None:
            hn, hf = hn_c, hf_c
        tmn_parts.append(tmn_c)
        htf_parts.append(htf_c)
    return (hn, jnp.concatenate(tmn_parts, axis=0), hf,
            jnp.concatenate(htf_parts, axis=0))
