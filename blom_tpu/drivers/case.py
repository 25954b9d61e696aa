"""Namelist-driven case builder and run loop.

TPU-native counterpart of the reference's run-deck system: the
standalone main program (/root/reference/drivers/nocoupler/blom.F:
20-67), the `limits` namelist ingestion (/root/reference/phy/
mod_rdlim.F90) and the case-generation role of
/root/reference/cime_config/buildnml — a `limits` file (unmodified
BLOM deck format) builds a runnable experiment; `run_case` integrates
it with restart alarms, diagnostic output and the final checksum +
run.status protocol.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..core import config as cfg_mod
from ..core.config import RunConfig
from ..dynamics.momtum import MomtumParams
from ..dynamics.barotp import BarotpParams
from . import standalone


def build_case(limits_path: str = None, cfg: RunConfig = None):
    """Build a Model from a BLOM `limits` deck (rdlim + the expcnf
    dispatch of mod_inigeo/mod_inifrc, mod_rdlim.F90:137-250).

    Returns (model, cfg)."""
    if cfg is None:
        cfg = cfg_mod.load_limits(limits_path)
    dtype = jnp.float64 if cfg.dtype == 'float64' else jnp.float32

    vcoord = getattr(cfg.vcoord, 'vcoord_type', 'cntiso_hybrid')
    if cfg.expcnf == 'fuk95':
        model = standalone.build_fuk95(dtype=dtype, vcoord=vcoord)
    elif cfg.expcnf == 'channel':
        model = standalone.build_channel(dtype=dtype,
                                         baclin=cfg.baclin,
                                         batrop=cfg.batrop)
    elif cfg.expcnf in ('single_column', 'noforcing'):
        model = standalone.build_single_column(dtype=dtype,
                                               baclin=cfg.baclin,
                                               batrop=cfg.batrop)
    elif cfg.expcnf in ('ben02clim', 'ben02syn', 'cesm'):
        # production grid-file configurations (mod_rdlim.F90 GRFILE/
        # ICFILE; mod_inigeo + mod_inicon dispatch)
        if not cfg.grfile:
            raise ValueError(
                f'expcnf {cfg.expcnf!r} requires GRFILE in the deck')
        model = standalone.build_gridfile(
            cfg.grfile, kdm=cfg.kdm, baclin=cfg.baclin,
            batrop=cfg.batrop, expcnf=cfg.expcnf,
            icfile=cfg.icfile or None, dtype=dtype, pref=cfg.pref,
            cwmod=cfg.cwmod, idate=cfg.idate, idate0=cfg.idate0)
    else:
        raise ValueError(f'unsupported expcnf {cfg.expcnf!r}')

    model.par = model.par._replace(
        momtum=MomtumParams(
            mdv2hi=cfg.mdv2hi, mdv2lo=cfg.mdv2lo, mdv4hi=cfg.mdv4hi,
            mdv4lo=cfg.mdv4lo, vsc2hi=cfg.vsc2hi, vsc2lo=cfg.vsc2lo,
            vsc4hi=cfg.vsc4hi, vsc4lo=cfg.vsc4lo, cbar=cfg.cbar,
            cb=cfg.cb, mommth=cfg.mommth),
        barotp=BarotpParams(cwbdts=cfg.cwbdts, cwbdls=cfg.cwbdls,
                            mommth=cfg.mommth),
        pgfmth=cfg.pgfmth,
        advmth=cfg.advmth,
        cppm_compatibility=cfg.cppm_compatibility,
        cppm_limiting=cfg.cppm_limiting)
    if model.par.ale is not None:
        # &ALE_REGRID_REMAP reconstruction options
        # (mod_ale_regrid_remap.F90:62-81)
        model.par = model.par._replace(ale=model.par.ale._replace(
            reconstruction_method=cfg.ale.reconstruction_method,
            upper_bndr_ord=cfg.ale.upper_bndr_ord,
            lower_bndr_ord=cfg.ale.lower_bndr_ord,
            tracer_limiting=cfg.ale.tracer_limiting,
            velocity_limiting=cfg.ale.velocity_limiting,
            tracer_pc_upper=cfg.ale.tracer_pc_upper_bndr,
            velocity_pc_upper=cfg.ale.velocity_pc_upper_bndr))
    return model, cfg


def run_case(model, cfg: RunConfig, rundir: str = '.',
             dia_fields=('sst', 'sss', 'sealv', 'temp', 'saln'),
             nsteps: int = None):
    """The standalone run loop (program blom,
    drivers/nocoupler/blom.F:20-67): integrate nday2-nday1 days,
    accumulate + write diagnostics, write rotating restarts, print the
    final dp checksum and write run.status."""
    from ..io import checksum as cks
    from ..io import dia as dia_mod
    from ..io import restart as rst

    import math

    from ..dynamics import chkvar as chk_mod
    from ..dynamics.budget import budget_deltas

    clock = model.clock
    nspd = clock.nstep_in_day
    if nsteps is None:
        nsteps = (cfg.nday2 - cfg.nday1) * nspd

    # diagnostic groups: from the deck's &DIAPHY (GLB_* arrays,
    # mod_dia.F90:278-344) or a single default group over `dia_fields`
    gcfgs = list(cfg.dia_groups)
    if not gcfgs:
        gcfgs = [dia_mod.DiaGroupCfg(
            fnametag='hd', aveperio=max(1, cfg.nday2 - cfg.nday1),
            fields=tuple(dia_fields))]
    groups = tuple(
        dia_mod.init_group(model.grid, model.state, gc.fields,
                           forcing=model.forcing, dfl=model.dfl)
        for gc in gcfgs)

    # BGC output group (mo_bgcmean.F90 accumulation; alarm rides the
    # same GLB_* framework with the 'bgcm' file tag)
    if getattr(model.par, 'itrbgc', -1) >= 0:
        from ..bgc import bgcmean as bgcm_mod
        groups = groups + (bgcm_mod.init_bgcm(
            model.grid, model.state, model.par.itrbgc,
            ti=model.par.bgc_ti),)
        gcfgs.append(dia_mod.DiaGroupCfg(
            fnametag='bgcm', aveperio=max(1, cfg.nday2 - cfg.nday1)))

    # calendar-month/year groups (GLB_AVEPERIO 30 / 360..366,
    # mod_rdlim.F90:1197-1203) fire at day-granular calendar
    # boundaries, so they constrain the chunking to day boundaries
    periods = [nspd if (gc.monthly or gc.annual)
               else gc.steps_per_output(nspd) for gc in gcfgs]

    # the chunk length must divide every output period so alarms fire
    # on chunk boundaries (diaout_alarms, mod_dia.F90:2200-2311)
    chunk = nspd
    for p in periods:
        chunk = math.gcd(chunk, p)

    s = model.state
    done = 0
    while done < nsteps:
        n = min(chunk, nsteps - done)
        # per-step dia accumulation, chkvar guard and (cnsvdi-gated)
        # budget checkpoints ride the jitted scan
        # (diaacc/chkvar/budget_sums in-step, mod_blom_step.F90:96-252)
        s, clock2, extras = standalone.run(model, n, dia_group=groups,
                                           cnsvdi=cfg.cnsvdi, chk=True)
        groups = extras['dia_group']
        model.state = s
        model.clock = clock2
        clock = clock2
        ok = np.asarray(extras['ok'])
        if not ok.all():
            bad_step = int(np.argmin(ok))
            nstep_abs = clock.nstep - n + bad_step + 1
            lev = 1 - (nstep_abs - 1) % 2
            chk_mod.chkvar_host(model.grid, s, lev, nstep=nstep_abs)
        if cfg.cnsvdi:
            b = extras['budgets']   # leaves (nsteps_chunk, ncheck)
            import jax.tree_util as jtu
            first = jtu.tree_map(lambda a: a[0, 0], b)
            last = jtu.tree_map(lambda a: a[-1, -1], b)
            print(f'budget deltas over steps {done + 1}..{done + n}: '
                  f'{budget_deltas(first, last)}')
        done += n
        # per-group output alarms (diaout, mod_dia.F90:2311-3300;
        # BGC groups via bgcmean, mo_bgcmean.F90:2232-2405)
        from ..bgc import bgcmean as bgcm_mod
        groups = list(groups)
        for gi, (gc, period) in enumerate(zip(gcfgs, periods)):
            if gc.alarm(clock, done, nspd) or done == nsteps:
                path = os.path.join(
                    rundir, dia_mod.diafnm(cfg.runid, gc.fnametag,
                                           clock.time))
                if isinstance(groups[gi], bgcm_mod.BgcmGroup):
                    bgcm_mod.write_bgcm(path, model.grid, groups[gi],
                                        clock.time)
                    groups[gi] = bgcm_mod.reset_bgcm(groups[gi])
                    continue
                if gc.compflag:
                    dia_mod.write_netcdf_compressed(
                        path, model.grid, groups[gi], clock.time)
                elif getattr(gc, 'sharded_output', False):
                    dia_mod.write_netcdf_sharded(
                        path + '.d', model.grid, groups[gi], clock.time)
                else:
                    # host-gathered single global file; np.asarray on
                    # sharded accumulators gathers across the mesh, so
                    # sharded runs need no offline reassembler
                    dia_mod.write_netcdf(path, model.grid, groups[gi],
                                         clock.time,
                                         ncformat=gc.ncformat)
                groups[gi] = dia_mod.reset(groups[gi])
        groups = tuple(groups)
        # restart alarm (rstfrq days; restart_write naming,
        # mod_restart.F90:1143-1200)
        if cfg.rstfrq > 0 and done % (cfg.rstfrq * nspd) == 0:
            rst.restart_write_rotating(rundir, cfg.runid, s, clock)

    rst.restart_write_rotating(rundir, cfg.runid, s, clock)

    # final global dp checksum + run.status (blom.F:56-64)
    crc = cks.field_crc(np.asarray(s.dp))
    with open(os.path.join(rundir, 'run.status'), 'w') as f:
        f.write('success\n')
    return s, clock, crc
