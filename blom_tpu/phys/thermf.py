"""Surface thermodynamics: relaxation fluxes and flux assembly.

TPU-native equivalent of the reference thermf dispatch
(reference: /root/reference/phy/mod_thermf.F90:35-65 per-expcnf
dispatch; relaxation machinery as in ben02/channel thermf variants,
e.g. /root/reference/channel/mod_thermf_channel.F90: restoring heat and
salt fluxes from SST/SSS climatologies with e-folding times trxday/
srxday over a depth trxdpt/srxdpt, differences clamped to trxlim/srxlim;
/root/reference/phy/mod_forcing.F90:194-443 declares the knobs).

The idealized configs (fuk95, single_column with zero timescales) get
zero fluxes, exactly as in the reference."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..core.constants import grav, spcifh, onem
from ..core.grid import Grid
from ..core.state import State
from .forcing import Forcing


class ThermfParams(NamedTuple):
    trxday: float = 0.    # SST relax e-folding [days]; 0 = off
    srxday: float = 0.    # SSS relax e-folding [days]; 0 = off
    trxdpt: float = 1.    # relaxation depth [m]
    srxdpt: float = 1.
    trxlim: float = 1.5   # max |SST - clim| used [C]
    srxlim: float = .5    # max |SSS - clim| [g kg-1]


def thermf_relax(grid: Grid, s: State, forcing: Forcing,
                 par: ThermfParams, n: int,
                 sstclm=None, sssclm=None) -> Forcing:
    """Fill surrlx/salrlx restoring fluxes (thermf_* relaxation)."""
    surrlx = jnp.zeros_like(forcing.surrlx)
    salrlx = jnp.zeros_like(forcing.salrlx)

    if par.trxday > 0. and sstclm is not None:
        dt_lim = jnp.clip(sstclm - s.temp[n][0], -par.trxlim, par.trxlim)
        mass = par.trxdpt * onem / grav            # [kg m-2]
        surrlx = spcifh * mass * dt_lim / (par.trxday * 86400.) * grid.ip

    if par.srxday > 0. and sssclm is not None:
        ds_lim = jnp.clip(sssclm - s.saln[n][0], -par.srxlim, par.srxlim)
        mass = par.srxdpt * onem / grav
        salrlx = mass * ds_lim / (par.srxday * 86400.) * grid.ip

    return dataclasses.replace(forcing, surrlx=surrlx, salrlx=salrlx)
