"""Whole-step shard_map driver: the production multi-chip path.

The reference guarantees bit-identical results for ANY MPI
decomposition: every rank runs the same loop bodies on its tile, halos
are filled by xctilr, and global sums use a fixed-order scheme
(reference: /root/reference/phy/mod_xc.F90:2071-2322).  Under plain
GSPMD the sharded and unsharded XLA programs differ (fusion/FMA
formation), so fields drift apart at roundoff.  Running the WHOLE
baroclinic step inside `shard_map` restores the reference's guarantee
by construction: each phase computes on halo-widened local blocks with
the same per-element program regardless of the mesh, collectives only
move data, and the strip-hierarchy repsum covers true reductions.

Phase layout mirrors blom_step (dynamics/step.py; reference sequence
mod_blom_step.F90:74-324), with halo exchanges placed like the
reference's xctilr calls: each stencil phase-group widens the fields it
reads by a margin covering the group's total ring consumption (one
stacked ppermute exchange per group — the xctilr analogue), computes on
the widened blocks, and crops back.  Column-local phases (vertical
remap/reconstruction, vertical diffusion, tracers) run unpadded with no
communication.  The barotropic subcycle reuses the margin-k amortized
core (barotp_shmap.barotp_block; mod_barotp.F90:387-397).

Margins are deliberately generous; an insufficient margin breaks the
bitwise sharding-invariance tests (tests/test_step_shmap.py), which is
the validation contract.

Current restrictions: tripolar (arctic) folds and the isopycnic
(vcoord_isopyc) branch are not yet wired — make_sharded_step raises.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import eos
from ..core.grid import Grid
from ..parallel.halo import halo_exchange
from .barotp_shmap import wide_tree, crop_tree, barotp_block
from . import barotp as bt
from .advect import advect
from .ale import ale_regrid_remap
from .ale_vdiff import ale_vdifft, ale_vdiffm
from .cmnfld import cmnfld
from .difest import difest_lateral
from .diffus import diffus
from .eddtra import eddtra
from .momtum import momtum
from .pbcor import pbcor1, pbcor2
from .pgforc import pgforc
from .step import StepParams, init_fluxes, _difest_v
from .tmsmt import tmsmt1, tmsmt2

# ring-consumption margins per phase group (see module docstring)
M_ALE = 3        # regrid_smooth (2) + dpu_dpv_upstream (1)
M_EDD = 6        # cmnfld slopes + difest nbr + eddtra chains
M_ADV = 8        # cau/cav prep + CPPM i- and j-sweeps (3+3)
M_DIF = 3        # pbcor1 + isopycnal diffusion flux+divergence
M_PGF = 3        # pressure-gradient force
M_MOM = 6        # momtum: utotn->dl2->flux->divergence chains
M_VMX = 2        # vmix reads u/v/stress at neighbor points
M_BPRO = 2       # barotp prologue (im1(jm1(pb_p)) etc.)
M_POST = 2       # pbcor2


class _Ctx:
    """Mesh-block context: how to widen/crop local blocks."""

    def __init__(self, ny, nx, periodic_i, periodic_j):
        self.ny, self.nx = ny, nx
        self.periodic_i, self.periodic_j = periodic_i, periodic_j

    def widen(self, tree, margin):
        return wide_tree(tree, margin, self.ny, self.nx,
                         self.periodic_i, self.periodic_j)

    def crop(self, tree, margin):
        return crop_tree(tree, margin)


def _wide_grid(ctx: _Ctx, grid_b: Grid, margin: int) -> Grid:
    """Halo-widen every grid metric/mask; block-local topology is
    closed (halos carry global periodicity), so stencil shifts become
    zero-filled slice+pads."""
    g = ctx.widen(grid_b, margin)
    return dataclasses.replace(g, periodic_i=False, periodic_j=False,
                               arctic=False)


def _block_grid(grid_b: Grid) -> Grid:
    return dataclasses.replace(grid_b, periodic_i=False,
                               periodic_j=False, arctic=False)


def _fence(*trees):
    """Optimization barrier between phase groups: pins XLA fusion
    boundaries so per-element rounding (FMA formation) is identical
    for every block shape — the bitwise any-mesh invariance
    (including 1x1 vs NxM) depends on it.  The reference gets the
    same property from fixed compile-time tile loops."""
    out = jax.lax.optimization_barrier(trees)
    return out if len(trees) > 1 else out[0]


def blom_step_blocks(ctx: _Ctx, grid_b: Grid, e, par: StepParams,
                     coeffs_i, coeffs_j, s, forcing, dfl,
                     m: int, n: int, delt1, swabs=None):
    """Block-local baroclinic step (inside shard_map); mirrors
    dynamics/step.py blom_step phase for phase."""
    dlt = par.dlt
    gN = _block_grid(grid_b)

    # cache widened grids per margin (2-D metrics only — cheap)
    _gw = {}

    def gW(margin):
        if margin not in _gw:
            _gw[margin] = _wide_grid(ctx, grid_b, margin)
        return _gw[margin]

    s = init_fluxes(s, m)
    s = tmsmt1(gN, s, n, par.vcoord_isopyc)        # pointwise saves

    # ALE vertical regrid + remap: column-local except the lateral
    # interface smoothing (radius 2) and dpu/dpv upstream selection
    if not par.vcoord_isopyc and par.ale is not None:
        sW = ctx.widen(s, M_ALE)
        sW = ale_regrid_remap(gW(M_ALE), e, par.ale, sW, m, n, delt1)
        s = _fence(ctx.crop(sW, M_ALE))

    # derived fields + lateral diffusivities + GM eddy transport
    if par.difest is not None and (not par.vcoord_isopyc
                                   or par.difest.egc > 0.):
        sW, dflW = ctx.widen((s, dfl), M_EDD)
        g6 = gW(M_EDD)
        cf = cmnfld(g6, e, sW, n)
        dflW = difest_lateral(g6, sW, cf, par.difest, dflW, m, n)
        if par.difest.egc > 0.:
            dflW = eddtra(g6, sW, cf, dflW, m, n, delt1)
        dfl = _fence(ctx.crop(dflW, M_EDD))

    # advection (CPPM i- then j-sweep inside one widened region; the
    # reference re-exchanges between sweeps, here the margin covers
    # both: (3,0)+(0,3) xctilr, mod_cppm.F90:1803,1956)
    sW, dflW, ciW, cjW = ctx.widen((s, dfl, coeffs_i, coeffs_j), M_ADV)
    sW = advect(gW(M_ADV), sW, dflW, ciW, cjW, m, n, delt1, dlt,
                par.advmth, par.cppm_compatibility, par.cppm_limiting)
    s = _fence(ctx.crop(sW, M_ADV))

    # pre-barotropic mass-flux correction + lateral tracer diffusion
    sW, dflW = ctx.widen((s, dfl), M_DIF)
    g3 = gW(M_DIF)
    sW = pbcor1(g3, sW, m, n, dlt)
    if par.difest is not None \
            and (par.difest.egc > 0. or par.difest.egmndf > 0.):
        if par.ltedtp == 'neutral' and not par.vcoord_isopyc:
            raise NotImplementedError(
                'ltedtp=neutral under the shard_map step')
        sW, dflW = diffus(g3, e, sW, dflW, m, n, delt1)
        dfl = dataclasses.replace(
            dfl, utflld=ctx.crop(dflW.utflld, M_DIF),
            usflld=ctx.crop(dflW.usflld, M_DIF),
            vtflld=ctx.crop(dflW.vtflld, M_DIF),
            vsflld=ctx.crop(dflW.vsflld, M_DIF))
    s = _fence(ctx.crop(sW, M_DIF))

    # pressure gradient force
    sW = ctx.widen(s, M_PGF)
    sW = pgforc(gW(M_PGF), e, sW, m, n, par.pgfmth)
    s = _fence(ctx.crop(sW, M_PGF))

    # baroclinic momentum
    sW, dflW, fW = ctx.widen((s, dfl, forcing), M_MOM)
    sW, utotnW, vtotnW = momtum(gW(M_MOM), sW, fW, par.momtum,
                                dflW.difwgt, m, n, delt1, dlt,
                                par.vcoord_isopyc)
    s, utotn, vtotn = _fence(ctx.crop(sW, M_MOM),
                             ctx.crop(utotnW, M_MOM),
                             ctx.crop(vtotnW, M_MOM))

    # surface thermodynamics restoring (thermf, pointwise)
    if par.thermf is not None and (par.thermf.trxday > 0.
                                   or par.thermf.srxday > 0.):
        from ..phys.thermf import thermf_relax
        forcing = thermf_relax(gN, s, forcing, par.thermf, n,
                               forcing.sstclm, forcing.sssclm)

    # ALE-path vertical physics: column-local implicit solves; the
    # diffusivity estimate reads neighbor velocities/stress -> small
    # margin
    if not par.vcoord_isopyc and par.vmix is not None \
            and swabs is not None:
        sW, fW, swW = ctx.widen((s, forcing, swabs), M_VMX)
        g2 = gW(M_VMX)
        vf = _difest_v(par)(g2, e, sW, fW, swW, par.vmix, n)
        dfl = dataclasses.replace(
            dfl, difvho=ctx.crop(vf.Kdiff_t, M_VMX),
            difvso=ctx.crop(vf.Kdiff_s, M_VMX),
            difvmo=ctx.crop(vf.Kvisc_m, M_VMX),
            bld=ctx.crop(vf.mld, M_VMX) * _block_grid(grid_b).ip)
        sW = ale_vdifft(g2, e, sW, fW, vf, m, n, delt1)
        sW = ale_vdiffm(g2, sW, vf, m, n, delt1)
        s = _fence(ctx.crop(sW, M_VMX))

    # tracer source/sink update (column-local)
    if par.itriag >= 0:
        from ..tracers.idlage import idlage_step
        s = idlage_step(s, par.itriag, n, delt1, par.nday_in_year)

    # barotropic solve: prologue on a small margin, then the margin-k
    # amortized subcycle core
    sW = ctx.widen((s, utotn, vtotn), M_BPRO)
    fldW = bt._prologue(gW(M_BPRO), sW[0], sW[1], sW[2], m, n,
                        par.barotp)
    fld = ctx.crop(fldW, M_BPRO)
    out, sums = barotp_block(ctx.ny, ctx.nx, ctx.periodic_i,
                             ctx.periodic_j, fld, s.ubflxs, s.vbflxs,
                             s.ubflxs_p, s.vbflxs_p, m, n, par.lstep,
                             dlt, par.barotp)
    out['pvtrop_n'] = fld['pvtrop_n']
    s = _fence(bt.finalize(gN, s, m, n, out, sums))

    # post-barotropic mass-flux correction
    sW = ctx.widen(s, M_POST)
    sW = pbcor2(gW(M_POST), e, sW, m, n, dlt)
    s = _fence(ctx.crop(sW, M_POST))

    # leap-frog time smoothing (pointwise)
    s = tmsmt2(gN, s, m, n, par.vcoord_isopyc)

    return s, dfl


def make_sharded_step(mesh, grid: Grid, e, par: StepParams,
                      coeffs_i, coeffs_j, forcing, swabs=None):
    """Build step(s, dfl, m, n, delt1) -> (s, dfl) running the whole
    baroclinic step inside shard_map over `mesh` (('y','x') axes).

    Bit-identical to itself under any mesh factorization, and to the
    unsharded blom_step (same phase functions, same per-element
    arithmetic; verified by tests/test_step_shmap.py)."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if grid.arctic:
        raise NotImplementedError(
            'tripolar fold inside the shard_map step')
    if par.vcoord_isopyc:
        raise NotImplementedError(
            'isopycnic branch under the shard_map step')
    if par.ltedtp == 'neutral':
        raise NotImplementedError(
            'ltedtp=neutral under the shard_map step')
    if par.itrbgc >= 0:
        raise NotImplementedError('BGC under the shard_map step')

    ny, nx = mesh.devices.shape
    ctx = _Ctx(ny, nx, grid.periodic_i, grid.periodic_j)

    def spec_tree(tree):
        return jax.tree.map(
            lambda a: P(*([None] * (a.ndim - 2) + ['y', 'x']))
            if getattr(a, 'ndim', 0) >= 2 else P(), tree)

    args0 = (grid, coeffs_i, coeffs_j, forcing, swabs)
    fns = {}

    def build(m, n):
        def local(grid_b, ci_b, cj_b, f_b, sw_b, s_b, dfl_b, delt1):
            return blom_step_blocks(ctx, grid_b, e, par, ci_b, cj_b,
                                    s_b, f_b, dfl_b, m, n, delt1, sw_b)
        return local

    def step(s, dfl, m: int, n: int, delt1):
        key = (m, n)
        if key not in fns:
            local = build(m, n)
            in_specs = spec_tree(args0 + (s, dfl)) + (P(),)
            out_specs = spec_tree((s, dfl))
            # check_vma=False: several phase scans initialize carries
            # from literal zeros, which the varying-manual-axes type
            # checker rejects; correctness is enforced by the bitwise
            # invariance tests instead.
            fns[key] = shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)
        return fns[key](*args0, s, dfl, jnp.asarray(delt1))

    return step
