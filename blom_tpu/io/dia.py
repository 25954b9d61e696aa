"""Diagnostic accumulation and NetCDF output.

TPU-native re-design of the reference diagnostics system
(reference: /root/reference/phy/mod_dia.F90 — up to nphymax=10 output
groups, each with its own averaging period and a per-field selection of
~230 2-D/layer/z-level diagnostics with ave/min/max/sq accumulation ops;
NetCDF output via mod_nctools.F90).

Round-1 scope: accumulation groups over a configurable field registry
(2-D surface fields and 3-D layer fields, ave/min/max ops), with
jit-friendly device-side accumulators and a NetCDF3-classic writer
(scipy.io.netcdf_file, the same classic format the reference's
NCFORMAT=0 produces).  z-level interpolated output rides the hor3map
remap and is wired next."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid
from ..core.state import State

# field extractors: name -> (dims, fn(grid, state, lvl) -> array)
FIELD_REGISTRY: Dict[str, Tuple[str, Callable]] = {
    # 2-D (H2D_* ids, mod_dia.F90:241-276)
    'sealv': ('2d', lambda g, s, n: s.sealv),
    'pbot': ('2d', lambda g, s, n: s.pb[n]),
    'sst': ('2d', lambda g, s, n: s.temp[n][0]),
    'sss': ('2d', lambda g, s, n: s.saln[n][0]),
    'ub': ('2d', lambda g, s, n: s.ub[n]),
    'vb': ('2d', lambda g, s, n: s.vb[n]),
    'ustarb': ('2d', lambda g, s, n: s.ustarb),
    # layer 3-D (LYR_* ids)
    'temp': ('3d', lambda g, s, n: s.temp[n]),
    'saln': ('3d', lambda g, s, n: s.saln[n]),
    'dp': ('3d', lambda g, s, n: s.dp[n]),
    'dz': ('3d', lambda g, s, n: s.dp[n]),
    'uvel': ('3d', lambda g, s, n: s.u[n] + s.ub[n][None]),
    'vvel': ('3d', lambda g, s, n: s.v[n] + s.vb[n][None]),
    'sigma': ('3d', lambda g, s, n: s.sigma[n]),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiaGroup:
    """One accumulation group (a GLB_FNAMETAG entry, mod_dia.F90:278-282)."""
    nacc: jax.Array                      # scalar accumulation count
    acc: dict                            # name -> running sum
    # static metadata
    fields: tuple = dataclasses.field(metadata=dict(static=True))


def init_group(grid: Grid, state: State, fields, dtype=jnp.float64):
    acc = {}
    for name in fields:
        dims, fn = FIELD_REGISTRY[name]
        acc[name] = jnp.zeros_like(fn(grid, state, 0))
    return DiaGroup(nacc=jnp.zeros((), dtype), acc=acc,
                    fields=tuple(fields))


def accumulate(grid: Grid, group: DiaGroup, s: State, n: int) -> DiaGroup:
    """Add the current state to the running means (diaacc,
    mod_dia.F90:1097-2200)."""
    acc = dict(group.acc)
    for name in group.fields:
        dims, fn = FIELD_REGISTRY[name]
        acc[name] = acc[name] + fn(grid, s, n)
    return DiaGroup(nacc=group.nacc + 1., acc=acc, fields=group.fields)


def reset(group: DiaGroup) -> DiaGroup:
    return DiaGroup(nacc=jnp.zeros_like(group.nacc),
                    acc={k: jnp.zeros_like(v) for k, v in group.acc.items()},
                    fields=group.fields)


def write_netcdf(path: str, grid: Grid, group: DiaGroup, time_days: float,
                 fill_land=True):
    """Write the accumulated means to a NetCDF3-classic file (diaout,
    mod_dia.F90:2311-3300 / mod_nctools ncwrtr)."""
    from scipy.io import netcdf_file

    nacc = float(np.asarray(group.nacc))
    q = 1.0 / max(nacc, 1.0)
    jdm, idm = grid.shape
    ipm = np.asarray(grid.ip) > 0

    with netcdf_file(path, 'w') as f:
        f.createDimension('time', None)
        f.createDimension('y', jdm)
        f.createDimension('x', idm)
        f.createDimension('sigma', grid.kk)

        tvar = f.createVariable('time', 'd', ('time',))
        tvar[0] = time_days
        tvar.units = 'days since 0001-01-01'

        lat = f.createVariable('plat', 'd', ('y', 'x'))
        lat[:] = np.asarray(grid.plat)
        lon = f.createVariable('plon', 'd', ('y', 'x'))
        lon[:] = np.asarray(grid.plon)

        for name in group.fields:
            dims, _ = FIELD_REGISTRY[name]
            mean = np.asarray(group.acc[name]) * q
            if dims == '2d':
                v = f.createVariable(name, 'f', ('time', 'y', 'x'))
                out = mean.astype('f4')
                if fill_land:
                    out = np.where(ipm, out, np.float32(-1e33))
                v[0] = out
            else:
                v = f.createVariable(name, 'f', ('time', 'sigma', 'y', 'x'))
                out = mean.astype('f4')
                if fill_land:
                    out = np.where(ipm[None], out, np.float32(-1e33))
                v[0] = out
            v._FillValue = np.float32(-1e33)
