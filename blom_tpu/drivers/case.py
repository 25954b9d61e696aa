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
    else:
        raise ValueError(f'expcnf {cfg.expcnf!r} needs a grid file; '
                         'use geoenv_file + init_state directly')

    model.par = model.par._replace(
        momtum=MomtumParams(
            mdv2hi=cfg.mdv2hi, mdv2lo=cfg.mdv2lo, mdv4hi=cfg.mdv4hi,
            mdv4lo=cfg.mdv4lo, vsc2hi=cfg.vsc2hi, vsc2lo=cfg.vsc2lo,
            vsc4hi=cfg.vsc4hi, vsc4lo=cfg.vsc4lo, cbar=cfg.cbar,
            cb=cfg.cb, mommth=cfg.mommth),
        barotp=BarotpParams(cwbdts=cfg.cwbdts, cwbdls=cfg.cwbdls,
                            mommth=cfg.mommth),
        pgfmth=cfg.pgfmth,
        advmth=cfg.advmth)
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

    clock = model.clock
    if nsteps is None:
        nsteps = (cfg.nday2 - cfg.nday1) * clock.nstep_in_day
    group = dia_mod.init_group(model.grid, model.state, dia_fields)

    steps_per_chunk = clock.nstep_in_day
    s = model.state
    done = 0
    while done < nsteps:
        n = min(steps_per_chunk, nsteps - done)
        s, clock2 = standalone.run(model, n)
        model.state = s
        model.clock = clock2
        clock = clock2
        done += n
        lev = (1 - done % 2)
        group = dia_mod.accumulate(model.grid, group, s, lev)
        # restart alarm (rstfrq days; restart_write naming,
        # mod_restart.F90:1143-1200)
        if cfg.rstfrq > 0 and (done % (cfg.rstfrq * steps_per_chunk)
                               == 0):
            rst.restart_write_rotating(rundir, cfg.runid, s, clock)

    dia_path = os.path.join(rundir, f'{cfg.runid}_dia.nc')
    dia_mod.write_netcdf(dia_path, model.grid, group,
                         time_days=clock.time)
    rst.restart_write_rotating(rundir, cfg.runid, s, clock)

    # final global dp checksum + run.status (blom.F:56-64)
    crc = cks.field_crc(np.asarray(s.dp))
    with open(os.path.join(rundir, 'run.status'), 'w') as f:
        f.write('success\n')
    return s, clock, crc
