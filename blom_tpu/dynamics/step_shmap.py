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

Tripolar (arctic) grids are supported: every widening fills the top
mesh row's north ghosts with fold rows (mirror x-permute + stagger +
sign flip per field kind, parallel/fold_specs.py; the distributed fold
of mod_xc.F90:2518-2700), CPPM coefficients get their fold rows from
the arctic-extended init (replicated extension rows,
_fix_coeff_ghosts), and the step ends with the block-local
arctic_sync (tests/test_step_shmap_arctic.py: bitwise across
factorizations).

The isopycnic (bulk-ML) regime, BGC tracer updates and the in-step
cnsvdi budget sums also run under the sharded step
(tests/test_step_shmap_branches.py).  Budgets and the ALE production
config are bitwise mesh-invariant; the isopycnic and BGC paths are
near-bitwise (~1 ULP) — XLA:CPU's fp-contraction choices inside the
bulk-ML TKE DAG and the sinking scan body vary with the block shape
and cannot be fully pinned from JAX (genuine reduction-order hazards
are fixed via ops/reduce.ksum).  Remaining restriction:
ltedtp='neutral' raises.
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
M_CNV = 2        # convec velocity remap reads p columns at i-1/j-1
M_DIA = 3        # difest_v (1) + TKE neighbor reads + diapfl momentum
M_MXL = 2        # mxlayr TKE budget neighbor reads


class _Ctx:
    """Mesh-block context: how to widen/crop local blocks.

    With `arctic`, widening fills the top mesh row's north ghosts with
    tripolar fold rows per field kind (parallel.fold_specs;
    mod_xc.F90:2518-2700) instead of zeros."""

    def __init__(self, ny, nx, periodic_i, periodic_j, arctic=False):
        self.ny, self.nx = ny, nx
        self.periodic_i, self.periodic_j = periodic_i, periodic_j
        self.arctic = arctic

    def widen(self, tree, margin, overrides=None):
        specs = None
        if self.arctic:
            from ..parallel.fold_specs import leaf_specs
            specs = leaf_specs(tree, overrides)
        return wide_tree(tree, margin, self.ny, self.nx,
                         self.periodic_i, self.periodic_j,
                         fold_specs=specs)

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


def _fix_coeff_ghosts(ctx: _Ctx, coW, extra, margin: int, wx: int):
    """Patch the top mesh row's north ghost rows of halo-widened CPPM
    coefficient arrays from the arctic-extended coefficient rows.

    CPPM stencil coefficients are NOT fold mirrors (the 4-cell sweep
    stencil is orientation-asymmetric): the reference computes them at
    init on the fold-extended domain (init_cppm, mod_cppm.F90:2504-2746
    over the (0,3)-halo region) and so do we — `extra` holds the
    NGHOST_ARCTIC extended rows per coefficient field, replicated and
    pre-padded with `margin` wrap columns; ghost rows beyond
    NGHOST_ARCTIC stay zero (provably unconsumed by real cells: the
    j-sweep's fold consumption depth is 3)."""
    import jax as _jax
    from jax import lax as _lax
    from .cppm import NGHOST_ARCTIC

    M = margin
    xi = _lax.axis_index('x') if ctx.nx > 1 else 0
    yi = _lax.axis_index('y') if ctx.ny > 1 else 0

    def fix(wide_l, extra_l):
        jw = wide_l.shape[-2]
        rows = _lax.dynamic_slice_in_dim(extra_l, xi * wx,
                                         wx + 2 * M, axis=-1)
        ng = min(NGHOST_ARCTIC, M)
        top = wide_l[..., jw - M:jw - M + ng, :]
        top = jnp.where(yi == ctx.ny - 1, rows[..., :ng, :], top)
        return jnp.concatenate(
            [wide_l[..., :jw - M, :], top,
             wide_l[..., jw - M + ng:, :]], axis=-2)

    return _jax.tree.map(fix, coW, extra)


def blom_step_blocks(ctx: _Ctx, grid_b: Grid, e, par: StepParams,
                     coeffs_i, coeffs_j, s, forcing, dfl,
                     m: int, n: int, delt1, swabs=None,
                     coeff_extra=None, bgc_forcing=None,
                     budget_out=None, bgc_diag_out=None):
    """Block-local baroclinic step (inside shard_map); mirrors
    dynamics/step.py blom_step phase for phase.

    `budget_out`: optional list collecting block-local column-collapsed
    budget weights at the reference's cnsvdi checkpoints
    (budget_col_sums; the caller finishes them with repsum_2d on the
    assembled global fields — bitwise equal to the unsharded
    budget_sums).

    `bgc_diag_out`: optional list collecting the per-step hamocc
    diagnostics dict (accfields inputs, mo_hamocc_step.F90:101) —
    column-local fields, so block-local values assemble to the global
    diagnostics unchanged."""
    dlt = par.dlt
    gN = _block_grid(grid_b)

    def ckpt(lvl):
        if budget_out is not None:
            from .budget import budget_col_sums
            budget_out.append(budget_col_sums(gN, s, lvl))

    # cache widened grids per margin (2-D metrics only — cheap)
    _gw = {}

    def gW(margin):
        if margin not in _gw:
            _gw[margin] = _wide_grid(ctx, grid_b, margin)
        return _gw[margin]

    ckpt(n)   # budget_sums(1,n) (mod_blom_step.F90:96)
    s = init_fluxes(s, m)
    s = tmsmt1(gN, s, n, par.vcoord_isopyc)        # pointwise saves

    # ALE vertical regrid + remap: column-local except the lateral
    # interface smoothing (radius 2) and dpu/dpv upstream selection
    if not par.vcoord_isopyc and par.ale is not None:
        sW = ctx.widen(s, M_ALE)
        sW = ale_regrid_remap(gW(M_ALE), e, par.ale, sW, m, n, delt1)
        s = _fence(ctx.crop(sW, M_ALE))
        ckpt(n)   # budget_sums(2,n) after the remap (:132)

    # derived fields + lateral diffusivities + GM eddy transport
    if par.difest is not None and (not par.vcoord_isopyc
                                   or par.difest.egc > 0.):
        sW, dflW = ctx.widen((s, dfl), M_EDD)
        g6 = gW(M_EDD)
        cf = cmnfld(g6, e, sW, n)
        dflW = difest_lateral(g6, sW, cf, par.difest, dflW, m, n)
        if par.difest.egc > 0.:
            if par.vcoord_isopyc:
                from .eddtra import eddtra_isopyc
                dflW = eddtra_isopyc(g6, sW, dflW, m, n, delt1)
            else:
                dflW = eddtra(g6, sW, cf, dflW, m, n, delt1)
        dfl = _fence(ctx.crop(dflW, M_EDD))

    # advection (CPPM i- then j-sweep inside one widened region; the
    # reference re-exchanges between sweeps, here the margin covers
    # both: (3,0)+(0,3) xctilr, mod_cppm.F90:1803,1956)
    sW, dflW, ciW, cjW = ctx.widen((s, dfl, coeffs_i, coeffs_j), M_ADV)
    if ctx.arctic:
        wx = s.pb.shape[-1]
        ciW = _fix_coeff_ghosts(ctx, ciW, coeff_extra[0], M_ADV, wx)
        cjW = _fix_coeff_ghosts(ctx, cjW, coeff_extra[1], M_ADV, wx)
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
    ckpt(n)   # budget_sums(2|3,n) after advect/diffus (:156,159)

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

    # isopycnic path: convective adjustment + diapycnal mixing
    # (mod_blom_step.F90:174-186)
    if par.vcoord_isopyc:
        from .convec import convec
        from .diapfl import diapfl
        from .step import _tke_closure
        sW = ctx.widen(s, M_CNV)
        sW = convec(gW(M_CNV), e, sW, m, n)
        s = _fence(ctx.crop(sW, M_CNV))
        ckpt(n)   # budget_sums(3,n) after convec (:177)
        if par.vmix is not None and swabs is not None:
            sW, fW, swW = ctx.widen((s, forcing, swabs), M_DIA)
            g3v = gW(M_DIA)
            vf = _difest_v(par)(g3v, e, sW, fW, swW, par.vmix, n)
            dfl = dataclasses.replace(
                dfl, difvho=ctx.crop(vf.Kdiff_t, M_DIA),
                difvso=ctx.crop(vf.Kdiff_s, M_DIA),
                difvmo=ctx.crop(vf.Kvisc_m, M_DIA),
                bld=ctx.crop(vf.mld, M_DIA) * gN.ip)
            kdiffW = vf.Kdiff_t
            if par.itrtke >= 0:
                sW, kdiffW = _tke_closure(g3v, sW, fW, kdiffW, par, n,
                                          delt1)
            sW = diapfl(g3v, e, sW, kdiffW, m, n, delt1)
            s = _fence(ctx.crop(sW, M_DIA))
        ckpt(n)   # budget_sums(4,n) after diapfl (:183)

    # surface thermodynamics restoring (thermf, pointwise)
    if par.thermf is not None and (par.thermf.trxday > 0.
                                   or par.thermf.srxday > 0.):
        from ..phys.thermf import thermf_relax
        forcing = thermf_relax(gN, s, forcing, par.thermf, n,
                               forcing.sstclm, forcing.sssclm)

    # bulk mixed layer (mxlayr, mod_blom_step.F90:191-193)
    if par.vcoord_isopyc:
        from .mxlayr import mxlayr
        sW, fW, dflW, swW = ctx.widen((s, forcing, dfl, swabs), M_MXL)
        sW, dflW = mxlayr(gW(M_MXL), e, sW, fW, par.mxlayr, m, n,
                          delt1, swabs=swW, dfl=dflW)
        s = _fence(ctx.crop(sW, M_MXL))
        dfl = ctx.crop(dflW, M_MXL)

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
        ckpt(n)   # budget_sums(4,n) after ale_vdiffm (:205)

    # tracer source/sink update (column-local)
    if par.itriag >= 0:
        from ..tracers.idlage import idlage_step
        s = idlage_step(s, par.itriag, n, delt1, par.nday_in_year)
    if par.itrbgc >= 0 and bgc_forcing is not None:
        # iHAMOCC source/sink update: column-local, margin 0
        from ..bgc.step import hamocc_step
        s, bgcd = hamocc_step(gN, e, par.bgc, s, bgc_forcing,
                              par.itrbgc, n, m, delt1,
                              ti=par.bgc_ti, cp=par.bgc_cp)
        if bgc_diag_out is not None:
            bgc_diag_out.append(bgcd)

    ckpt(n)   # budget_sums(5,n) after updtrc (:215)

    # barotropic solve: prologue on a small margin, then the margin-k
    # amortized subcycle core
    sW = ctx.widen((s, utotn, vtotn), M_BPRO,
                   overrides={1: ('u', -1.), 2: ('v', -1.)})
    fldW = bt._prologue(gW(M_BPRO), sW[0], sW[1], sW[2], m, n,
                        par.barotp)
    fld = ctx.crop(fldW, M_BPRO)
    out, sums = barotp_block(ctx.ny, ctx.nx, ctx.periodic_i,
                             ctx.periodic_j, fld, s.ubflxs, s.vbflxs,
                             s.ubflxs_p, s.vbflxs_p, m, n, par.lstep,
                             dlt, par.barotp, arctic=ctx.arctic)
    out['pvtrop_n'] = fld['pvtrop_n']
    s = _fence(bt.finalize(gN, s, m, n, out, sums))

    # post-barotropic mass-flux correction
    sW = ctx.widen(s, M_POST)
    sW = pbcor2(gW(M_POST), e, sW, m, n, dlt)
    s = _fence(ctx.crop(sW, M_POST))
    ckpt(m)   # budget_sums(6,m) after pbcor2 (:224)

    # leap-frog time smoothing (pointwise)
    s = tmsmt2(gN, s, m, n, par.vcoord_isopyc)
    ckpt(m)   # budget_sums(7,m) after tmsmt2 (:230)

    if ctx.arctic:
        # enforce the fold-duplicated top-row degrees of freedom (the
        # shard_map counterpart of parallel.arctic.sync_state called at
        # the end of the unsharded blom_step)
        from ..parallel.fold_specs import leaf_specs
        from .barotp_shmap import sync_tree
        s = sync_tree(s, ctx.ny, ctx.nx, leaf_specs(s))

    return s, dfl


def make_sharded_step(mesh, grid: Grid, e, par: StepParams,
                      coeffs_i, coeffs_j, forcing, swabs=None,
                      bgc_forcing=None):
    """Build step(s, dfl, m, n, delt1[, budget_out]) -> (s, dfl)
    running the whole baroclinic step inside shard_map over `mesh`
    (('y','x') axes).

    Bit-identical to itself under any mesh factorization, and to the
    unsharded blom_step (same phase functions, same per-element
    arithmetic; verified by tests/test_step_shmap.py).  With a
    `budget_out` list, the reference's cnsvdi budget sums are appended
    per checkpoint (block-local column sums + the xcsum strip
    hierarchy on the assembled fields — bitwise equal to the unsharded
    budget_sums); the returned step advertises this via
    `step.supports_budget`."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if par.ltedtp == 'neutral':
        raise NotImplementedError(
            'ltedtp=neutral under the shard_map step')

    ny, nx = mesh.devices.shape
    ctx = _Ctx(ny, nx, grid.periodic_i, grid.periodic_j,
               arctic=grid.arctic)

    coeff_extra = None
    if grid.arctic:
        # arctic-extended coefficient rows (init_cppm over the fold
        # halo region, mod_cppm.F90:2504-2746): recompute both sweep
        # directions on the extended domain, shard the main J rows and
        # replicate the NGHOST extension rows (periodic-wrapped by
        # M_ADV columns for direct ghost slicing)
        import numpy as np
        from .cppm import init_cppm_coeffs
        J = grid.shape[-2]
        ip_np = np.asarray(grid.ip)
        dtype = grid.ip.dtype
        ext_i = init_cppm_coeffs(ip_np, np.asarray(grid.scpx), axis=-1,
                                 periodic=grid.periodic_i, dtype=dtype,
                                 arctic=True)
        ext_j = init_cppm_coeffs(ip_np, np.asarray(grid.scpy), axis=-2,
                                 periodic=grid.periodic_j, dtype=dtype,
                                 arctic=True)

        def split(co):
            main = jax.tree.map(lambda a: a[..., :J, :], co)
            M = M_ADV

            def wrap(a):
                ex = a[..., J:, :]
                return jnp.concatenate(
                    [ex[..., -M:], ex, ex[..., :M]], axis=-1)
            return main, jax.tree.map(wrap, co)
        coeffs_i, extra_i = split(ext_i)
        coeffs_j, extra_j = split(ext_j)
        coeff_extra = (extra_i, extra_j)

    def spec_tree(tree):
        return jax.tree.map(
            lambda a: P(*([None] * (a.ndim - 2) + ['y', 'x']))
            if getattr(a, 'ndim', 0) >= 2 else P(), tree)

    args0 = (grid, coeffs_i, coeffs_j, forcing, swabs, bgc_forcing)
    fns = {}

    def build(m, n, want_budget, want_bgcd):
        def local(grid_b, ci_b, cj_b, f_b, sw_b, bgcf_b, s_b, dfl_b,
                  delt1, cex_b=None):
            bout = [] if want_budget else None
            bgcd = [] if want_bgcd else None
            s_b, dfl_b = blom_step_blocks(
                ctx, grid_b, e, par, ci_b, cj_b, s_b, f_b, dfl_b, m, n,
                delt1, sw_b, coeff_extra=cex_b, bgc_forcing=bgcf_b,
                budget_out=bout, bgc_diag_out=bgcd)
            out = (s_b, dfl_b)
            if want_budget:
                out = out + (tuple(bout),)
            if want_bgcd:
                out = out + (bgcd[0] if bgcd else {},)
            return out
        return local

    def step(s, dfl, m: int, n: int, delt1, budget_out=None,
             bgc_diag_out=None):
        want_budget = budget_out is not None
        want_bgcd = bgc_diag_out is not None
        key = (m, n, want_budget, want_bgcd)
        if key not in fns:
            local = build(m, n, want_budget, want_bgcd)
            in_specs = spec_tree(args0 + (s, dfl)) + (P(),)
            args_extra = ()
            if coeff_extra is not None:
                # extension rows are replicated to every device
                in_specs = in_specs + (
                    jax.tree.map(lambda a: P(), coeff_extra),)
                args_extra = (coeff_extra,)
            out_specs = spec_tree((s, dfl))
            if want_budget:
                # number of checkpoints depends on the branch config;
                # trace count via an abstract eval is overkill — the
                # budget column fields are all 2-D sharded
                ncp = _n_checkpoints(par, swabs)
                out_specs = out_specs + (
                    tuple({k: P('y', 'x') for k in
                           ('mass', 'heat', 'salt')}
                          for _ in range(ncp)),)
            if want_bgcd:
                # the hamocc diagnostics dict structure depends on the
                # BGC extension config; recover it with an abstract
                # eval of the (column-local, collective-free) BGC
                # update alone (no compile)
                from ..bgc.step import hamocc_step

                def _diags(s_):
                    return hamocc_step(
                        grid, e, par.bgc, s_, bgc_forcing, par.itrbgc,
                        n, m, jnp.asarray(delt1), ti=par.bgc_ti,
                        cp=par.bgc_cp)[1]
                diag_aval = jax.eval_shape(_diags, s)
                out_specs = out_specs + (jax.tree.map(
                    lambda a: P(*([None] * (a.ndim - 2) + ['y', 'x']))
                    if a.ndim >= 2 else P(), diag_aval),)
            # check_vma=False: several phase scans initialize carries
            # from literal zeros, which the varying-manual-axes type
            # checker rejects; correctness is enforced by the bitwise
            # invariance tests instead.
            fns[key] = shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)
        args_extra = (coeff_extra,) if coeff_extra is not None else ()
        out = fns[key](*args0, s, dfl, jnp.asarray(delt1), *args_extra)
        if want_bgcd:
            bgc_diag_out.append(out[-1])
            out = out[:-1]
        if want_budget:
            from .budget import budget_sums_from_cols
            s, dfl, cols = out
            budget_out.extend(budget_sums_from_cols(c) for c in cols)
            return s, dfl
        return out[0], out[1]

    step.supports_budget = True
    step.supports_bgcm = True
    return step


def _n_checkpoints(par: StepParams, swabs) -> int:
    """Checkpoint count of blom_step's cnsvdi instrumentation for this
    branch configuration (budget_sums 1..7, mod_blom_step.F90:96-230);
    must mirror blom_step_blocks' (== blom_step's) ckpt call sites."""
    n = 5   # 1, after advect/diffus, after updtrc, pbcor2, tmsmt2
    if not par.vcoord_isopyc and par.ale is not None:
        n += 1   # after the vertical remap
    if par.vcoord_isopyc:
        n += 2   # after convec and after diapfl (unconditional)
    elif par.vmix is not None and swabs is not None:
        n += 1   # after ale_vdiffm
    return n
