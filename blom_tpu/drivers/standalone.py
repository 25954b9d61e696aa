"""Standalone model driver.

TPU-native equivalent of the reference standalone program
(reference: /root/reference/drivers/nocoupler/blom.F:20-67): build a
configuration, initialize, and integrate the step loop under jit/scan."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import eos, init, modeltime
from ..core.grid import Grid
from ..core.state import State
from ..dynamics import cppm as cppm_mod
from ..dynamics.barotp import BarotpParams
from ..dynamics.diffusion_fields import zero_diffusion_fields
from ..dynamics.momtum import MomtumParams
from ..dynamics.step import StepParams, blom_step, make_two_step
from ..phys.forcing import zero_forcing
from ..phys.swabs import init_swabs


@dataclasses.dataclass
class Model:
    grid: Grid
    e: eos.EosParams
    par: StepParams
    coeffs_i: cppm_mod.CppmCoeffs
    coeffs_j: cppm_mod.CppmCoeffs
    clock: modeltime.ModelTime
    state: State
    forcing: object
    dfl: object
    swabs: object
    bgc_forcing: object = None


def _bgc_params():
    from ..bgc import BgcParams
    return BgcParams()


def build_fuk95(dtype=jnp.float64, itdm=None, jtdm=None, kdm=None,
                use_idlage=False, use_bgc=False, use_ciso=False,
                vcoord='cntiso_hybrid') -> Model:
    """Assemble the fuk95 experiment (tests/fuk95/limits deck values)."""
    from ..configs import fuk95 as cfg

    itdm = itdm or cfg.ITDM
    jtdm = jtdm or cfg.JTDM
    kdm = kdm or cfg.KDM

    baclin, batrop = 180., 6.
    clock = modeltime.init_timevars('fuk95', baclin, batrop,
                                    20000101, 20000101)
    grid = cfg.make_grid(baclin, itdm, jtdm, kdm, dtype=dtype)
    e = eos.init_eos(pref=0., expcnf='fuk95')

    if vcoord == 'isopyc_bulkml':
        z, sigma, saln, sigmar, phi = cfg.initial_profiles_isopyc(
            itdm, jtdm, kdm)
    else:
        z, sigma, saln, sigmar, phi = cfg.initial_profiles(itdm, jtdm, kdm)
    temp = np.asarray(eos.tofsig(e, sigma, saln))

    niag = 1 if use_idlage else 0
    itrbgc = niag if use_bgc else -1
    bgc_ti = bgc_cp = None
    if use_bgc:
        from ..bgc import NBGC
        if use_ciso:
            from ..bgc.ciso import CisoParams
            from ..bgc.params import make_tracer_index
            bgc_ti = make_tracer_index(use_ciso=True)
            bgc_cp = CisoParams()
            ntr = niag + bgc_ti.ntotal
        else:
            ntr = niag + NBGC
    else:
        ntr = niag
    state = init.init_state(
        grid, e, phi=phi, temp=temp, saln=saln, sigmar=sigmar,
        delt1=baclin, dlt=clock.dlt, dtype=dtype, ntr=ntr)

    from ..dynamics.ale import make_ale_params
    par = StepParams(
        baclin=baclin, lstep=clock.lstep, dlt=clock.dlt,
        momtum=MomtumParams(vsc2hi=.2, vsc2lo=.2, cbar=.05, cb=.002,
                            mommth='enscon'),
        barotp=BarotpParams(cwbdts=0., cwbdls=25., mommth='enscon'),
        pgfmth='dynamic enthalpy',
        vcoord_isopyc=(vcoord == 'isopyc_bulkml'),
        ale=None if vcoord == 'isopyc_bulkml' else make_ale_params(kdm),
        itriag=0 if use_idlage else -1,
        itrbgc=itrbgc,
        bgc=_bgc_params() if use_bgc else None,
        bgc_ti=bgc_ti, bgc_cp=bgc_cp)

    coeffs_i = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpx), axis=-1,
        periodic=grid.periodic_i, dtype=dtype)
    coeffs_j = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpy), axis=-2,
        periodic=grid.periodic_j, dtype=dtype, arctic=grid.arctic)

    forcing = zero_forcing(kdm, grid.shape, dtype)
    dfl = zero_diffusion_fields(kdm, grid.shape, dtype)
    swabs = init_swabs(grid.shape, 'jerlov', 3, dtype)

    bgc_forcing = None
    if use_bgc:
        from ..bgc.step import init_bgc_tracers, zero_bgc_forcing
        state = init_bgc_tracers(state, itrbgc, e, ti=bgc_ti, cp=bgc_cp)
        bgc_forcing = zero_bgc_forcing(grid.shape, dtype)

    return Model(grid=grid, e=e, par=par, coeffs_i=coeffs_i,
                 coeffs_j=coeffs_j, clock=clock, state=state,
                 forcing=forcing, dfl=dfl, swabs=swabs,
                 bgc_forcing=bgc_forcing)


def build_gridfile(grfile: str, kdm: int, baclin: float,
                   batrop: float, expcnf: str = 'ben02clim',
                   icfile: str = None, dtype=jnp.float64,
                   pref: float = 2000.e4, cwmod=(), arctic: bool = False,
                   idate: int = 20000101, idate0: int = None,
                   use_idlage: bool = False) -> Model:
    """Generic grid-file experiment builder: the expcnf dispatch branch
    for production configurations (ben02clim/ben02syn/cesm on tnx*-class
    grids; mod_inigeo + mod_inicon, mod_rdlim.F90:137-250).

    grfile: BLOM-convention grid NetCDF (mod_geoenv.F90:45-884);
    icfile: optional WOA-style z-level T/S climatology with variables
    t_an/s_an (k, j, i on the model grid) and depth_bnds (k, 2) —
    absent, a horizontally uniform stably stratified profile is used.
    Forcing starts at zero: ben02 bulk forcing or the coupled cap
    supplies it per step (phys/ben02.py, drivers/coupled.py)."""
    from ..core.geoenv import geoenv_file
    from ..core.inicon import inicon_woa
    from ..dynamics.ale import make_ale_params

    clock = modeltime.init_timevars(expcnf, baclin, batrop,
                                    idate, idate0 or idate)
    grid = geoenv_file(grfile, kk=kdm, baclin=baclin,
                       periodic_i=True, arctic=arctic, dtype=dtype,
                       cwmod=cwmod)
    e = eos.init_eos(pref=pref, expcnf=expcnf)

    jj, ii = grid.shape
    if icfile is not None:
        from scipy.io import netcdf_file
        with netcdf_file(icfile, 'r', mmap=False) as nc:
            t_src = np.array(nc.variables['t_an'][:], np.float64)
            s_src = np.array(nc.variables['s_an'][:], np.float64)
            bnds = np.array(nc.variables['depth_bnds'][:], np.float64)
        if t_src.ndim == 4:
            t_src, s_src = t_src[0], s_src[0]
    else:
        ksrc = 30
        zc = np.linspace(25., 4000., ksrc)
        dz = np.gradient(zc)
        bnds = np.stack([zc - .5 * dz, zc + .5 * dz], 1)
        t_src = np.broadcast_to(
            (2. + 18. * np.exp(-zc / 700.))[:, None, None],
            (ksrc, jj, ii)).copy()
        s_src = np.broadcast_to(
            (34.2 + .8 * (1. - np.exp(-zc / 1000.)))[:, None, None],
            (ksrc, jj, ii)).copy()
    temp, saln, sigmar, phi = inicon_woa(grid, e, t_src, s_src, bnds)

    ntr = 1 if use_idlage else 0
    state = init.init_state(
        grid, e, phi=phi, temp=temp, saln=saln, sigmar=sigmar,
        delt1=baclin, dlt=clock.dlt, dtype=dtype, ntr=ntr)

    par = StepParams(
        baclin=baclin, lstep=clock.lstep, dlt=clock.dlt,
        momtum=MomtumParams(vsc2hi=.2, vsc2lo=.2, cbar=.05, cb=.002,
                            mommth='enscon'),
        barotp=BarotpParams(cwbdts=5.e-5, cwbdls=25., mommth='enscon'),
        pgfmth='dynamic enthalpy',
        vcoord_isopyc=False,
        ale=make_ale_params(kdm),
        itriag=0 if use_idlage else -1)

    coeffs_i = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpx), axis=-1,
        periodic=grid.periodic_i, dtype=dtype)
    coeffs_j = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpy), axis=-2,
        periodic=grid.periodic_j, dtype=dtype, arctic=grid.arctic)

    forcing = zero_forcing(kdm, grid.shape, dtype)
    dfl = zero_diffusion_fields(kdm, grid.shape, dtype)
    swabs = init_swabs(grid.shape, 'jerlov', 3, dtype)

    return Model(grid=grid, e=e, par=par, coeffs_i=coeffs_i,
                 coeffs_j=coeffs_j, clock=clock, state=state,
                 forcing=forcing, dfl=dfl, swabs=swabs)


def _state_mesh(s):
    """The ('y','x') device mesh a state pytree is sharded over, or
    None when unsharded / single-device."""
    sh = getattr(s.dp, 'sharding', None)
    mesh = getattr(sh, 'mesh', None)
    if mesh is None or getattr(mesh, 'axis_names', None) != ('y', 'x'):
        return None
    if mesh.devices.size < 2:
        return None
    return mesh


def run(model: Model, nsteps: int, dia_group=None, cnsvdi: bool = False,
        chk: bool = False):
    """Integrate `nsteps` baroclinic steps from the current clock.

    The first step from initial conditions is forward (delt1 = baclin);
    later steps leap-frog (delt1 = 2*baclin) — mod_time.F90:49-55.

    In-step instrumentation (the reference's diaacc/budget_sums/chkvar,
    mod_blom_step.F90:96-252): pass `dia_group` (a DiaGroup) to
    accumulate diagnostics after every step inside the scan; `cnsvdi`
    to collect per-checkpoint budget sums; `chk` for a per-step
    all-finite flag.  Returns (state, clock) — plus an extras dict
    with keys 'dia_group'/'budgets'/'ok' when any of those are on."""
    s = model.state
    clock = model.clock
    with_dia = dia_group is not None
    extras_on = with_dia or cnsvdi or chk

    from ..bgc.bgcmean import BgcmGroup
    groups_list = (dia_group if isinstance(dia_group, (tuple, list))
                   else ([dia_group] if with_dia else []))
    with_bgcm = any(isinstance(g, BgcmGroup) for g in groups_list)

    # Auto-select the production multi-chip path when the state is
    # mesh-sharded: the whole-step shard_map driver (bitwise
    # PE-invariant, margin-k amortized halos) when the configuration
    # supports it, else at least the margin-k barotropic solver
    # (VERDICT r3 items 2/8; mod_barotp.F90:387-397 analogue).
    step_fn = None
    par = model.par
    mesh = _state_mesh(s)
    if mesh is not None:
        if not with_bgcm:
            try:
                from ..dynamics.step_shmap import make_sharded_step
                step_fn = make_sharded_step(
                    mesh, model.grid, model.e, par, model.coeffs_i,
                    model.coeffs_j, model.forcing, model.swabs,
                    bgc_forcing=model.bgc_forcing)
            except NotImplementedError:
                step_fn = None
        if step_fn is None and par.barotp_fn is None:
            from ..dynamics.barotp_shmap import make_barotp_shmap
            par = par._replace(barotp_fn=make_barotp_shmap(mesh))

    two_step = make_two_step(model.grid, model.e, par,
                             model.coeffs_i, model.coeffs_j,
                             model.forcing, model.dfl, model.swabs,
                             model.bgc_forcing, with_dia=with_dia,
                             cnsvdi=cnsvdi, chk=chk,
                             with_bgcm=with_bgcm, step_fn=step_fn)

    @jax.jit
    def run_pairs(carry, delt1_pairs):
        return jax.lax.scan(two_step, carry, delt1_pairs)

    # build the delt1 schedule
    delt1s = []
    c = clock
    for _ in range(nsteps):
        delt1s.append(c.delt1)
        c = c.step()
    n_even = (nsteps // 2) * 2

    dfl = model.dfl
    ys = None
    if n_even:
        pairs = (jnp.asarray(delt1s[0:n_even:2]),
                 jnp.asarray(delt1s[1:n_even:2]))
        carry = (s, dfl, dia_group) if with_dia else (s, dfl)
        carry, ys = run_pairs(carry, pairs)
        if with_dia:
            s, dfl, dia_group = carry
        else:
            s, dfl = carry
    if nsteps % 2:
        # odd tail: single step at the pair's first parity
        def tail(s, dfl, d):
            bout = [] if cnsvdi else None
            bgcd = [] if with_bgcm else None
            if step_fn is not None:
                s, dfl = step_fn(s, dfl, 0, 1, d)
            else:
                s, dfl = blom_step(model.grid, model.e, par,
                                   model.coeffs_i, model.coeffs_j,
                                   s, model.forcing, dfl, 0, 1, d,
                                   model.swabs, model.bgc_forcing,
                                   budget_out=bout, bgc_diag_out=bgcd)
            tys = {}
            if cnsvdi:
                tys['budgets'] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *bout)
            if chk:
                from ..dynamics.chkvar import chkvar as _chkvar
                tys['ok'] = _chkvar(model.grid, s, 1)[0]
            return s, dfl, tys, (bgcd[0] if bgcd else {})

        s, dfl, tys, tail_bgcd = jax.jit(tail)(
            s, dfl, jnp.asarray(delt1s[-1], s.pb.dtype))
        if with_dia:
            from ..bgc.bgcmean import acc_bgcm
            from ..io.dia import accumulate

            def _acc1(g, s, d, bgcd):
                def one_g(gi):
                    if isinstance(gi, BgcmGroup):
                        return acc_bgcm(gi, model.grid, s, 1,
                                        model.par.itrbgc, bgcd,
                                        ti=model.par.bgc_ti)
                    return accumulate(
                        model.grid, gi, s, 1, model.forcing, d,
                        swabs=model.swabs,
                        tridx={'itriag': model.par.itriag,
                               'itrtke': model.par.itrtke,
                               'itrgls': model.par.itrgls})
                if isinstance(g, (tuple, list)):
                    return type(g)(one_g(gi) for gi in g)
                return one_g(g)

            dia_group = jax.jit(_acc1)(dia_group, s, dfl, tail_bgcd)
        if extras_on and tys:
            if ys is None:
                ys = jax.tree.map(lambda x: x[None], tys)
            else:
                # ys from the scan has shape (npairs, 2, ...): flatten
                # pairs then append the tail step
                ys = jax.tree.map(
                    lambda a, b: jnp.concatenate(
                        [a.reshape((-1,) + a.shape[2:]), b[None]]), ys, tys)
    elif extras_on and ys is not None:
        ys = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), ys)

    model.dfl = dfl
    if not extras_on:
        return s, c
    extras = {}
    if with_dia:
        extras['dia_group'] = dia_group
    if ys:
        if cnsvdi:
            extras['budgets'] = ys['budgets']
        if chk:
            extras['ok'] = ys['ok']
    return s, c, extras


def build_channel(dtype=jnp.float64, itdm=None, jtdm=None, kdm=None,
                  ztx0=-.05, baclin=300., batrop=10.) -> Model:
    """Assemble the channel experiment (channel/mod_channel.F90)."""
    from ..configs import channel as cfg
    from ..dynamics.ale import make_ale_params

    itdm = itdm or cfg.ITDM
    jtdm = jtdm or cfg.JTDM
    kdm = kdm or cfg.KDM

    clock = modeltime.init_timevars('channel', baclin, batrop,
                                    20000101, 20000101)
    grid = cfg.make_grid(baclin, itdm, jtdm, kdm, dtype=dtype)
    e = eos.init_eos(pref=0., expcnf='channel')

    z, sigmar, saln, phi = cfg.initial_profiles(grid, itdm, jtdm, kdm)
    temp = np.asarray(eos.tofsig(e, sigmar, saln))

    state = init.init_state(
        grid, e, phi=phi, temp=temp, saln=saln, sigmar=sigmar,
        delt1=baclin, dlt=clock.dlt, dtype=dtype)

    par = StepParams(
        baclin=baclin, lstep=clock.lstep, dlt=clock.dlt,
        momtum=MomtumParams(vsc2hi=.2, vsc2lo=.2, cbar=.05, cb=.002,
                            mommth='enscon'),
        barotp=BarotpParams(cwbdts=5.e-5, cwbdls=25., mommth='enscon'),
        pgfmth='dynamic enthalpy', vcoord_isopyc=False,
        ale=make_ale_params(kdm))

    coeffs_i = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpx), axis=-1,
        periodic=grid.periodic_i, dtype=dtype)
    coeffs_j = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpy), axis=-2,
        periodic=grid.periodic_j, dtype=dtype, arctic=grid.arctic)

    forcing = zero_forcing(kdm, grid.shape, dtype)
    taux, tauy = cfg.wind_stress(grid.shape, ztx0)
    import dataclasses as _dc
    forcing = _dc.replace(
        forcing,
        taux=jnp.asarray(taux, dtype) * grid.iu,
        tauy=jnp.asarray(tauy, dtype) * grid.iv)
    dfl = zero_diffusion_fields(kdm, grid.shape, dtype)
    swabs = init_swabs(grid.shape, 'jerlov', 3, dtype)

    return Model(grid=grid, e=e, par=par, coeffs_i=coeffs_i,
                 coeffs_j=coeffs_j, clock=clock, state=state,
                 forcing=forcing, dfl=dfl, swabs=swabs)


def build_single_column(dtype=jnp.float64, kdm=None, baclin=1800.,
                        batrop=60.) -> Model:
    """Assemble the single-column experiment
    (single_column/mod_single_column.F90)."""
    from ..configs import single_column as cfg
    from ..dynamics.ale import make_ale_params

    kdm = kdm or cfg.KDM
    clock = modeltime.init_timevars('single_column', baclin, batrop,
                                    20000101, 20000101)
    grid = cfg.make_grid(baclin, kdm, dtype=dtype)
    e = eos.init_eos(pref=0., expcnf='single_column')

    z, temp, saln, phi = cfg.initial_profiles(kdm)
    sigmar = np.asarray(eos.sig(e, temp, saln))

    state = init.init_state(
        grid, e, phi=phi, temp=temp, saln=saln, sigmar=sigmar,
        delt1=baclin, dlt=clock.dlt, dtype=dtype)

    par = StepParams(
        baclin=baclin, lstep=clock.lstep, dlt=clock.dlt,
        momtum=MomtumParams(mommth='enscon'),
        barotp=BarotpParams(mommth='enscon'),
        pgfmth='dynamic enthalpy', vcoord_isopyc=False,
        ale=make_ale_params(kdm))

    coeffs_i = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpx), axis=-1,
        periodic=grid.periodic_i, dtype=dtype)
    coeffs_j = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpy), axis=-2,
        periodic=grid.periodic_j, dtype=dtype, arctic=grid.arctic)

    forcing = zero_forcing(kdm, grid.shape, dtype)
    dfl = zero_diffusion_fields(kdm, grid.shape, dtype)
    swabs = init_swabs(grid.shape, 'jerlov', 3, dtype)

    return Model(grid=grid, e=e, par=par, coeffs_i=coeffs_i,
                 coeffs_j=coeffs_j, clock=clock, state=state,
                 forcing=forcing, dfl=dfl, swabs=swabs)


def build_tripolar(dtype=jnp.float64, itdm=32, jtdm=24, kdm=6,
                   baclin=180., batrop=6.) -> Model:
    """Assemble the synthetic tripolar-fold experiment
    (configs/tripolar.py): i-periodic, closed south, Arctic bipolar
    fold on the top row (nreg=2 topology, mod_xc.F90:2405-2700)."""
    from ..configs import tripolar as cfg
    from ..dynamics.ale import make_ale_params
    from ..parallel.arctic import sync_state

    clock = modeltime.init_timevars('fuk95', baclin, batrop,
                                    20000101, 20000101)
    grid = cfg.make_grid(baclin, itdm, jtdm, kdm, dtype=dtype)
    e = eos.init_eos(pref=0., expcnf='fuk95')

    z, temp, saln, sigmar, phi = cfg.initial_profiles(itdm, jtdm, kdm)

    state = init.init_state(
        grid, e, phi=phi, temp=temp, saln=saln, sigmar=sigmar,
        delt1=baclin, dlt=clock.dlt, dtype=dtype)
    # enforce the fold-duplicated top row on the initial state
    state = sync_state(state)

    par = StepParams(
        baclin=baclin, lstep=clock.lstep, dlt=clock.dlt,
        momtum=MomtumParams(vsc2hi=.2, vsc2lo=.2, cbar=.05, cb=.002,
                            mommth='enscon'),
        barotp=BarotpParams(cwbdts=0., cwbdls=25., mommth='enscon'),
        pgfmth='dynamic enthalpy', vcoord_isopyc=False,
        ale=make_ale_params(kdm))

    coeffs_i = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpx), axis=-1,
        periodic=grid.periodic_i, dtype=dtype)
    coeffs_j = cppm_mod.init_cppm_coeffs(
        np.asarray(grid.ip), np.asarray(grid.scpy), axis=-2,
        periodic=grid.periodic_j, dtype=dtype, arctic=True)

    forcing = zero_forcing(kdm, grid.shape, dtype)
    dfl = zero_diffusion_fields(kdm, grid.shape, dtype)
    swabs = init_swabs(grid.shape, 'jerlov', 3, dtype)

    return Model(grid=grid, e=e, par=par, coeffs_i=coeffs_i,
                 coeffs_j=coeffs_j, clock=clock, state=state,
                 forcing=forcing, dfl=dfl, swabs=swabs)
