"""One baroclinic model step: the orchestration of all dynamics phases.

TPU-native re-design of the reference step driver
(reference: /root/reference/phy/mod_blom_step.F90:74-324 blom_step).
The step is a pure function State -> State, jittable and scannable; the
two leap-frog time levels alternate via the static (m, n) slot indices
(m = nstep_pre % 2, n = 1 - m, mod_blom_step.F90:89-94), so a two-step
scan body covers both parities with fully static indexing.

Phases not yet implemented are noted inline; with the fuk95 deck's
parameters (zero interior diffusivity, zero forcing) the implemented
subset reproduces the reference sequence for that configuration except
for ALE vertical regridding and vertical mixing (next milestones).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from typing import Optional

from ..core import eos
from ..core.grid import Grid
from ..core.state import State
from ..phys.forcing import Forcing
from ..phys.swabs import SwabsFields
from ..phys.thermf import ThermfParams, thermf_relax
from ..phys.vmix import VmixParams, difest_vertical
from .advect import advect
from .ale import AleParams, ale_regrid_remap
from .ale_vdiff import ale_vdifft, ale_vdiffm
from .cmnfld import cmnfld
from .convec import convec
from .diapfl import diapfl
from .mxlayr import MxlayrParams, mxlayr
from .difest import DifestParams, difest_lateral
from .diffus import diffus
from .ndiff import ndiff
from .eddtra import eddtra
from .barotp import BarotpParams, barotp
from .cppm import CppmCoeffs
from .diffusion_fields import DiffusionFields
from .momtum import MomtumParams, momtum
from .pbcor import pbcor1, pbcor2
from .pgforc import pgforc
from .tmsmt import tmsmt1, tmsmt2


class StepParams(NamedTuple):
    """Static per-run parameters of the step function."""
    baclin: float
    lstep: int
    dlt: float
    momtum: MomtumParams = MomtumParams()
    barotp: BarotpParams = BarotpParams()
    pgfmth: str = 'dynamic enthalpy'
    advmth: str = 'cppm'      # 'cppm' | 'remap' (mod_advect.F90:52)
    cppm_compatibility: str = 'full'        # 'full' | 'partial'
    cppm_limiting: str = 'non_oscillatory'  # | 'monotonic'
    vcoord_isopyc: bool = False
    ale: Optional[AleParams] = None
    vmix: Optional[VmixParams] = VmixParams()
    itriag: int = -1          # index of the ideal-age tracer, -1 = none
    itrtke: int = -1          # TKE tracer index, -1 = no closure
    itrgls: int = -1          # GLS psi tracer index
    itrbgc: int = -1          # start index of the BGC block, -1 = none
    bgc: object = None        # BgcParams when itrbgc >= 0
    bgc_ti: object = None     # extended tracer-index namespace (ciso…)
    bgc_cp: object = None     # ciso.CisoParams when carbon isotopes on
    nday_in_year: float = 360.
    difest: Optional[DifestParams] = DifestParams()
    thermf: Optional[ThermfParams] = ThermfParams()
    mxlayr: MxlayrParams = MxlayrParams()
    ltedtp: str = 'layer'     # 'layer' | 'neutral' (mod_diffusion.F90:99)
    barotp_fn: object = None  # override: margin-k shard_map solver
    #                           (barotp_shmap.make_barotp_shmap)


def _difest_v(par: 'StepParams'):
    """Vertical-mixing estimator dispatch: CVMix-lite interior or the
    full KPP boundary-layer scheme (difest_vertical_hybrid's CVMix_kpp
    path, mod_difest.F90:900-1200)."""
    if par.vmix is not None and par.vmix.use_kpp:
        from ..phys.vmix import difest_vertical_kpp
        return difest_vertical_kpp
    return difest_vertical


def _tke_closure(grid: Grid, s: State, forcing: Forcing, kdiff,
                 par: 'StepParams', n: int, delt1):
    """Update the TKE/GLS tracers and merge the closure's diffusivity
    (difest_isobml TKE branch, mod_difest.F90:2641-2930)."""
    import jax.numpy as _jnp

    from ..core.state import cumulative_p
    from ..phys import tke as _tke

    dp_k = s.dp[n]
    p_i = cumulative_p(dp_k) * grid.ip
    sig = s.sigma[n]
    from ..core.constants import epsilp, grav
    dp_mid = _jnp.maximum(.5 * (dp_k[:-1] + dp_k[1:]), epsilp)
    bvfsq_i = grav * grav * (sig[1:] - sig[:-1]) / dp_mid
    bvfsq = _jnp.concatenate([bvfsq_i[:1], bvfsq_i], axis=0)

    u_p = .5 * (s.u[n] + grid.ip1(s.u[n]))
    v_p = .5 * (s.v[n] + grid.jp1(s.v[n], 'v', True))
    du2_i = (u_p[1:] - u_p[:-1]) ** 2 + (v_p[1:] - v_p[:-1]) ** 2
    du2l = _jnp.concatenate([du2_i[:1], du2_i], axis=0)

    kidx = _jnp.arange(dp_k.shape[0])[:, None, None]
    kmax = _jnp.max(_jnp.where(dp_k > epsilp, kidx, 0), axis=0)
    taux_p = .5 * (forcing.taux + grid.ip1(forcing.taux))
    tauy_p = .5 * (forcing.tauy + grid.jp1(forcing.tauy, 'v', True))
    ustar = _jnp.sqrt(_jnp.sqrt(taux_p ** 2 + tauy_p ** 2) / 1000.)

    tke_tr = _jnp.maximum(s.trc[n, par.itrtke], _tke.tke_min)
    gls_tr = _jnp.maximum(s.trc[n, par.itrgls], _tke.gls_psi_min)
    tp = _tke.TkeParams(use_gls=par.itrgls >= 0)
    tke_new, gls_new, nus, _ = _tke.tke_gls_update(
        tke_tr, gls_tr, kdiff, du2l, bvfsq, dp_k, p_i, ustar,
        s.ustarb, kmax, delt1, tp)
    trc = s.trc.at[n, par.itrtke].set(tke_new)
    if par.itrgls >= 0:
        trc = trc.at[n, par.itrgls].set(gls_new)
    s = dataclasses.replace(s, trc=trc)
    return s, _jnp.maximum(kdiff, nus)


def init_fluxes(s: State, m: int) -> State:
    """Reset mid-level flux accumulators (init_fluxes,
    mod_state.F90:341-383)."""
    z = jnp.zeros_like(s.uflx[m])
    return dataclasses.replace(
        s,
        uflx=s.uflx.at[m].set(z), vflx=s.vflx.at[m].set(z),
        utflx=s.utflx.at[m].set(z), vtflx=s.vtflx.at[m].set(z),
        usflx=s.usflx.at[m].set(z), vsflx=s.vsflx.at[m].set(z))


def blom_step(grid: Grid, e: eos.EosParams, par: StepParams,
              coeffs_i: CppmCoeffs, coeffs_j: CppmCoeffs,
              s: State, forcing: Forcing, dfl: DiffusionFields,
              m: int, n: int, delt1,
              swabs: Optional[SwabsFields] = None,
              bgc_forcing=None, budget_out: Optional[list] = None,
              bgc_diag_out: Optional[list] = None):
    """Advance one baroclinic time step (mod_blom_step.F90:74-324).

    Returns (state, dfl): the diffusion/eddy-transport fields are
    per-step state (difest/eddtra fill them, momtum/advect consume).
    m, n are static python ints (0/1); delt1 is traced (baclin on the
    first step from initial conditions, 2*baclin otherwise).

    When `budget_out` is a list, mass/heat/salt budget sums are appended
    at the reference's cnsvdi checkpoints (budget_sums calls 1..7,
    mod_blom_step.F90:96-230) so the caller can stack and difference
    them (budget_output, mod_budget.F90:202-356)."""
    dlt = par.dlt

    def ckpt(lvl):
        if budget_out is not None:
            from .budget import budget_sums
            budget_out.append(budget_sums(grid, s, lvl))

    ckpt(n)   # budget_sums(1,n) before anything (mod_blom_step.F90:96)

    # flux reset (mod_blom_step.F90:100-111)
    s = init_fluxes(s, m)

    # forcing ingest + shortwave: external - `forcing` is an input.

    # save old fields for time smoothing (mod_blom_step.F90:128)
    s = tmsmt1(grid, s, n, par.vcoord_isopyc)

    # ALE vertical regrid + remap (mod_blom_step.F90:131-135)
    if not par.vcoord_isopyc and par.ale is not None:
        s = ale_regrid_remap(grid, e, par.ale, s, m, n, delt1)
        ckpt(n)   # budget_sums(2,n) after the remap (:132)

    # derived fields + lateral diffusivities + GM eddy transport
    # (cmnfld2 / difest_lateral_hybrid|difest_isobml / eddtra,
    # mod_blom_step.F90:136-147; isopycnic GM: eddtra_gm_isopyc_bulkml,
    # mod_eddtra.F90:228)
    if par.difest is not None and (not par.vcoord_isopyc
                                   or par.difest.egc > 0.):
        cf = cmnfld(grid, e, s, n)
        dfl = difest_lateral(grid, s, cf, par.difest, dfl, m, n)
        if par.difest.egc > 0.:
            if par.vcoord_isopyc:
                from .eddtra import eddtra_isopyc
                dfl = eddtra_isopyc(grid, s, dfl, m, n, delt1)
            else:
                dfl = eddtra(grid, s, cf, dfl, m, n, delt1)

    # advection (mod_blom_step.F90:148)
    s = advect(grid, s, dfl, coeffs_i, coeffs_j, m, n, delt1, dlt,
               par.advmth, par.cppm_compatibility, par.cppm_limiting)

    # pre-barotropic mass-flux correction (mod_blom_step.F90:150)
    s = pbcor1(grid, s, m, n, dlt)

    # lateral tracer diffusion: along-layer (mod_blom_step.F90:152
    # diffus) or along neutral surfaces (ltedtp 'neutral', the
    # reference routes this through the ale_regrid_remap jslice
    # pipeline, mod_ale_regrid_remap.F90:1643-1670)
    if par.difest is not None \
            and (par.difest.egc > 0. or par.difest.egmndf > 0.):
        if par.ltedtp == 'neutral' and not par.vcoord_isopyc:
            from ..core.constants import onem
            s = ndiff(grid, e, s, dfl, m, n, delt1, cf.mld * onem)
        else:
            # along-layer diffusion: along isopycnals in the isopycnic
            # regime (mod_blom_step.F90:152 diffus, both regimes)
            s, dfl = diffus(grid, e, s, dfl, m, n, delt1)

    ckpt(n)   # budget_sums(2|3,n) after advect/diffus (:156,159)

    # wind stress dispatch (sfcstr, mod_blom_step.F90:163) is carried by
    # `forcing`.

    # pressure gradient force (mod_blom_step.F90:166)
    s = pgforc(grid, e, s, m, n, par.pgfmth)

    # baroclinic momentum (mod_blom_step.F90:169)
    s, utotn, vtotn = momtum(grid, s, forcing, par.momtum, dfl.difwgt,
                             m, n, delt1, dlt, par.vcoord_isopyc)

    # isopycnic path: convective adjustment + diapycnal mixing
    # (mod_blom_step.F90:174-186)
    if par.vcoord_isopyc:
        s = convec(grid, e, s, m, n)
        ckpt(n)   # budget_sums(3,n) after convec (:177)
        if par.vmix is not None and swabs is not None:
            vf = _difest_v(par)(grid, e, s, forcing, swabs, par.vmix, n)
            dfl = dataclasses.replace(dfl, difvho=vf.Kdiff_t,
                                      difvso=vf.Kdiff_s,
                                      difvmo=vf.Kvisc_m,
                                      bld=vf.mld * grid.ip)
            kdiff = vf.Kdiff_t
            if par.itrtke >= 0:
                # TKE(/GLS) second-order closure replaces the Ri-based
                # shear diffusivity (the use_TKE branch of
                # difest_isobml, mod_difest.F90:2641-2930)
                s, kdiff = _tke_closure(grid, s, forcing, kdiff, par,
                                        n, delt1)
            s = diapfl(grid, e, s, kdiff, m, n, delt1)
        ckpt(n)   # budget_sums(4,n) after diapfl (:183)

    # surface thermodynamics: restoring fluxes (thermf,
    # mod_blom_step.F90:188-189)
    if par.thermf is not None and (par.thermf.trxday > 0.
                                   or par.thermf.srxday > 0.):
        forcing = thermf_relax(grid, s, forcing, par.thermf, n,
                               forcing.sstclm, forcing.sssclm)

    if par.vcoord_isopyc:
        # bulk mixed layer (mxlayr, mod_blom_step.F90:191-193)
        s, dfl = mxlayr(grid, e, s, forcing, par.mxlayr, m, n, delt1,
                        swabs=swabs, dfl=dfl)
    elif par.vmix is not None and swabs is not None:
        # ALE-path vertical physics (mod_blom_step.F90:196-207):
        # cmnfld_bfsqi_ale + ale_forcing + difest_vertical_hybrid are
        # fused in difest_vertical; then implicit vertical diffusion.
        vf = _difest_v(par)(grid, e, s, forcing, swabs, par.vmix, n)
        dfl = dataclasses.replace(dfl, difvho=vf.Kdiff_t,
                                  difvso=vf.Kdiff_s, difvmo=vf.Kvisc_m,
                                  bld=vf.mld * grid.ip)
        s = ale_vdifft(grid, e, s, forcing, vf, m, n, delt1)
        s = ale_vdiffm(grid, s, vf, m, n, delt1)
        ckpt(n)   # budget_sums(4,n) after ale_vdiffm (:205)

    # tracer source/sink update (updtrc, mod_blom_step.F90:209-213) —
    # AFTER vertical physics, so ale_vdifft-diffused tracers feed the
    # source/sink terms exactly as in the reference sequence.
    if par.itriag >= 0:
        from ..tracers.idlage import idlage_step
        s = idlage_step(s, par.itriag, n, delt1, par.nday_in_year)
    if par.itrbgc >= 0 and bgc_forcing is not None:
        from ..bgc.step import hamocc_step
        s, bgc_diags = hamocc_step(grid, e, par.bgc, s, bgc_forcing,
                                   par.itrbgc, n, m, delt1,
                                   ti=par.bgc_ti, cp=par.bgc_cp)
        if bgc_diag_out is not None:
            # per-step BGC diagnostics for bgcmean accumulation
            # (accfields, mo_hamocc_step.F90:101)
            bgc_diag_out.append(bgc_diags)

    ckpt(n)   # budget_sums(5,n) after updtrc (:215)

    # barotropic solve (mod_blom_step.F90:218); the shard_map margin-k
    # solver can be substituted via par.barotp_fn (mod_barotp.F90:387-397)
    s = (par.barotp_fn or barotp)(grid, s, utotn, vtotn, m, n,
                                  par.lstep, dlt, par.barotp)

    # post-barotropic mass-flux correction (mod_blom_step.F90:221)
    s = pbcor2(grid, e, s, m, n, dlt)

    ckpt(m)   # budget_sums(6,m) after pbcor2 (:224)

    # leap-frog time smoothing (mod_blom_step.F90:227)
    s = tmsmt2(grid, s, m, n, par.vcoord_isopyc)

    ckpt(m)   # budget_sums(7,m) after tmsmt2 (:230)

    if grid.arctic:
        # enforce the fold-duplicated top-row degrees of freedom (the
        # role of the reference's xctilr fold writes on tripolar grids,
        # mod_xc.F90:2405-2700); keeps mirrored copies bit-identical
        # against roundoff-order drift.
        from ..parallel.arctic import sync_state
        s = sync_state(s)

    return s, dfl


def make_two_step(grid: Grid, e: eos.EosParams, par: StepParams,
                  coeffs_i: CppmCoeffs, coeffs_j: CppmCoeffs,
                  forcing: Forcing, dfl: DiffusionFields,
                  swabs: Optional[SwabsFields] = None,
                  bgc_forcing=None,
                  with_dia: bool = False, cnsvdi: bool = False,
                  chk: bool = False, with_bgcm: bool = False,
                  step_fn=None):
    """Return a scan body advancing two steps (both time-level
    parities).  First step of the pair uses (m, n) = (0, 1) — the parity
    of the very first model step (nstep_pre = 0).

    Optional in-step instrumentation, mirroring the reference step's
    diaacc/budget_sums/chkvar calls (mod_blom_step.F90:96-252):
      with_dia — the carry gains a DiaGroup accumulated after every
        step at the new time level (diaacc, :239);
      cnsvdi   — ys gain per-checkpoint budget sums (budget_sums 1..7);
      chk      — ys gain a per-step all-finite flag (chkvar, :252).
    With none of these set, carry is (state, dfl) and ys is None.

    `step_fn(s, dfl, m, n, delt1) -> (s, dfl)` overrides the plain
    blom_step — the sharded whole-step driver
    (step_shmap.make_sharded_step) plugs in here.  In-step budget
    hooks (cnsvdi) work with an override that advertises
    `supports_budget` (the sharded step does); in-step BGC diagnostics
    (with_bgcm) work with an override that advertises
    `supports_bgcm` (the sharded step does)."""
    if step_fn is not None and with_bgcm \
            and not getattr(step_fn, 'supports_bgcm', False):
        raise NotImplementedError(
            'in-step BGC diagnostics need a bgcm-capable step_fn')
    if step_fn is not None and cnsvdi \
            and not getattr(step_fn, 'supports_budget', False):
        raise NotImplementedError(
            'in-step budget hooks need a budget-capable step_fn')

    def one(s, dfl_c, m, n, d):
        bout = [] if cnsvdi else None
        bgcd = [] if with_bgcm else None
        if step_fn is not None:
            kw = {}
            if cnsvdi:
                kw['budget_out'] = bout
            if with_bgcm:
                kw['bgc_diag_out'] = bgcd
            s, dfl_c = step_fn(s, dfl_c, m, n, d, **kw)
        else:
            s, dfl_c = blom_step(grid, e, par, coeffs_i, coeffs_j, s,
                                 forcing, dfl_c, m, n, d, swabs,
                                 bgc_forcing, budget_out=bout,
                                 bgc_diag_out=bgcd)
        ys = {}
        if cnsvdi:
            import jax as _jax
            ys['budgets'] = _jax.tree.map(lambda *xs: jnp.stack(xs), *bout)
        if chk:
            from .chkvar import chkvar as _chkvar
            ys['ok'] = _chkvar(grid, s, n)[0]
        bgc_diags = (bgcd[0] if bgcd else {}) if with_bgcm else None
        return s, dfl_c, ys, bgc_diags

    extras = with_dia or cnsvdi or chk

    def two_step(carry, delt1_pair):
        if with_dia:
            s, dfl_c, group = carry
        else:
            s, dfl_c = carry
            group = None
        d1, d2 = delt1_pair
        def acc(group, s, lev, dfl_c, bgc_diags):
            from ..io.dia import accumulate

            def acc1(g):
                from ..bgc.bgcmean import BgcmGroup, acc_bgcm
                if isinstance(g, BgcmGroup):
                    return acc_bgcm(g, grid, s, lev, par.itrbgc,
                                    bgc_diags or {}, ti=par.bgc_ti)
                return accumulate(
                    grid, g, s, lev, forcing, dfl_c, swabs=swabs,
                    tridx={'itriag': par.itriag, 'itrtke': par.itrtke,
                           'itrgls': par.itrgls})

            if isinstance(group, (tuple, list)):
                return type(group)(acc1(g) for g in group)
            return acc1(group)

        s, dfl_c, ys1, bgcd1 = one(s, dfl_c, 0, 1, d1)
        if with_dia:
            group = acc(group, s, 1, dfl_c, bgcd1)
        s, dfl_c, ys2, bgcd2 = one(s, dfl_c, 1, 0, d2)
        if with_dia:
            group = acc(group, s, 0, dfl_c, bgcd2)
        carry = (s, dfl_c, group) if with_dia else (s, dfl_c)
        if not extras:
            return carry, None
        if ys1:
            import jax as _jax
            ys = {k: _jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                   ys1[k], ys2[k]) for k in ys1}
        else:
            ys = {}
        return carry, ys

    return two_step
