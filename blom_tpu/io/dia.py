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

def _bottom(extract):
    """Deepest-wet-layer value of a layer field (the *BOT ids of
    mod_dia.F90: ACC_SBOT/ACC_TBOT)."""
    def fn(g, s, n):
        a = extract(g, s, n)
        wet = s.dp[n] > 1.e-3
        kidx = jnp.arange(a.shape[0])[:, None, None]
        kbot = jnp.max(jnp.where(wet, kidx, 0), axis=0)
        onehot = (kidx == kbot[None]).astype(a.dtype)
        return jnp.sum(a * onehot, axis=0)
    return fn


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
    'pbu': ('2d', lambda g, s, n: s.pbu[n]),
    'pbv': ('2d', lambda g, s, n: s.pbv[n]),
    'ubflxs': ('2d', lambda g, s, n: s.ubflxs[1]),
    'vbflxs': ('2d', lambda g, s, n: s.vbflxs[1]),
    'sbot': ('2d', _bottom(lambda g, s, n: s.saln[n])),
    'tbot': ('2d', _bottom(lambda g, s, n: s.temp[n])),
    'sigmx': ('2d', lambda g, s, n: s.sigma[n][0]),
    # layer 3-D (LYR_* ids)
    'temp': ('3d', lambda g, s, n: s.temp[n]),
    'saln': ('3d', lambda g, s, n: s.saln[n]),
    'dp': ('3d', lambda g, s, n: s.dp[n]),
    'dz': ('3d', lambda g, s, n: s.dp[n]),
    'dpu': ('3d', lambda g, s, n: s.dpu[n]),
    'dpv': ('3d', lambda g, s, n: s.dpv[n]),
    'uvel': ('3d', lambda g, s, n: s.u[n] + s.ub[n][None]),
    'vvel': ('3d', lambda g, s, n: s.v[n] + s.vb[n][None]),
    'sigma': ('3d', lambda g, s, n: s.sigma[n]),
    'uflx': ('3d', lambda g, s, n: s.uflx[n]),
    'vflx': ('3d', lambda g, s, n: s.vflx[n]),
    'utflx': ('3d', lambda g, s, n: s.utflx[n]),
    'vtflx': ('3d', lambda g, s, n: s.vtflx[n]),
    'usflx': ('3d', lambda g, s, n: s.usflx[n]),
    'vsflx': ('3d', lambda g, s, n: s.vsflx[n]),
}


def _zlv(extract):
    """Wrap a 3-D extractor to produce its z-level remap (LVL_* ids,
    mod_dia.F90:241-276 + ale_remap_diazlv)."""
    def fn(g, s, n):
        from ..core.state import cumulative_p
        from .merdia import to_zlev
        return to_zlev(extract(g, s, n), cumulative_p(s.dp[n]))
    return fn


FIELD_REGISTRY.update({
    'templvl': ('zlv', _zlv(lambda g, s, n: s.temp[n])),
    'salnlvl': ('zlv', _zlv(lambda g, s, n: s.saln[n])),
    'uvellvl': ('zlv', _zlv(lambda g, s, n: s.u[n] + s.ub[n][None])),
    'vvellvl': ('zlv', _zlv(lambda g, s, n: s.v[n] + s.vb[n][None])),
    'uflxlvl': ('zlv', _zlv(lambda g, s, n: s.uflx[n])),
    'vflxlvl': ('zlv', _zlv(lambda g, s, n: s.vflx[n])),
    'utflxlvl': ('zlv', _zlv(lambda g, s, n: s.utflx[n])),
    'vtflxlvl': ('zlv', _zlv(lambda g, s, n: s.vtflx[n])),
    'usflxlvl': ('zlv', _zlv(lambda g, s, n: s.usflx[n])),
    'vsflxlvl': ('zlv', _zlv(lambda g, s, n: s.vsflx[n])),
})

#: per-field accumulation operators (the ave/min/max/sq encoding of
#: mod_dia.F90's ACC_* tables)
VALID_OPS = ('ave', 'min', 'max', 'sq')


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiaGroup:
    """One accumulation group (a GLB_FNAMETAG entry, mod_dia.F90:278-282)."""
    nacc: jax.Array                      # scalar accumulation count
    acc: dict                            # name -> running sum
    # static metadata
    fields: tuple = dataclasses.field(metadata=dict(static=True))


def _norm_fields(fields):
    """Accept 'name' or ('name', op) entries; default op 'ave'."""
    out = []
    for f in fields:
        if isinstance(f, str):
            out.append((f, 'ave'))
        else:
            name, op = f
            assert op in VALID_OPS, op
            out.append((name, op))
    return tuple(out)


def init_group(grid: Grid, state: State, fields, dtype=jnp.float64):
    fields = _norm_fields(fields)
    acc = {}
    for name, op in fields:
        dims, fn = FIELD_REGISTRY[name]
        proto = fn(grid, state, 0)
        if op == 'min':
            acc[name] = jnp.full_like(proto, jnp.inf)
        elif op == 'max':
            acc[name] = jnp.full_like(proto, -jnp.inf)
        else:
            acc[name] = jnp.zeros_like(proto)
    return DiaGroup(nacc=jnp.zeros((), dtype), acc=acc, fields=fields)


def accumulate(grid: Grid, group: DiaGroup, s: State, n: int) -> DiaGroup:
    """Add the current state to the running accumulators (diaacc,
    mod_dia.F90:1097-2200; op semantics of the ACC_* encoding)."""
    acc = dict(group.acc)
    for name, op in group.fields:
        dims, fn = FIELD_REGISTRY[name]
        v = fn(grid, s, n)
        if op == 'ave':
            acc[name] = acc[name] + v
        elif op == 'sq':
            acc[name] = acc[name] + v * v
        elif op == 'min':
            acc[name] = jnp.minimum(acc[name], v)
        else:
            acc[name] = jnp.maximum(acc[name], v)
    return DiaGroup(nacc=group.nacc + 1., acc=acc, fields=group.fields)


def reset(group: DiaGroup) -> DiaGroup:
    acc = {}
    for name, op in group.fields:
        v = group.acc[name]
        if op == 'min':
            acc[name] = jnp.full_like(v, jnp.inf)
        elif op == 'max':
            acc[name] = jnp.full_like(v, -jnp.inf)
        else:
            acc[name] = jnp.zeros_like(v)
    return DiaGroup(nacc=jnp.zeros_like(group.nacc), acc=acc,
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

    from .merdia import DEPTHSLEV

    with netcdf_file(path, 'w') as f:
        f.createDimension('time', None)
        f.createDimension('y', jdm)
        f.createDimension('x', idm)
        f.createDimension('sigma', grid.kk)
        f.createDimension('depth', len(DEPTHSLEV))

        tvar = f.createVariable('time', 'd', ('time',))
        tvar[0] = time_days
        tvar.units = 'days since 0001-01-01'

        dvar = f.createVariable('depth', 'd', ('depth',))
        dvar[:] = DEPTHSLEV
        dvar.units = 'm'

        lat = f.createVariable('plat', 'd', ('y', 'x'))
        lat[:] = np.asarray(grid.plat)
        lon = f.createVariable('plon', 'd', ('y', 'x'))
        lon[:] = np.asarray(grid.plon)

        for name, op in _norm_fields(group.fields):
            dims, _ = FIELD_REGISTRY[name]
            mean = np.asarray(group.acc[name])
            if op in ('ave', 'sq'):
                mean = mean * q
            if dims == '2d':
                shape = ('time', 'y', 'x')
                mask = ipm
            elif dims == 'zlv':
                shape = ('time', 'depth', 'y', 'x')
                mask = ipm[None]
            else:
                shape = ('time', 'sigma', 'y', 'x')
                mask = ipm[None]
            v = f.createVariable(name, 'f', shape)
            out = mean.astype('f4')
            if fill_land:
                out = np.where(mask, out, np.float32(-1e33))
            v[0] = out
            v._FillValue = np.float32(-1e33)


def write_netcdf_compressed(path: str, grid: Grid, group: DiaGroup,
                            time_days: float):
    """Compressed (ocean-points-only) output: each field is packed
    into a 1-D 'pcomp' dimension holding only wet points, with the
    index map saved once (the NCFORMAT compressed path, mod_nctools
    ncdimc/ncpack/nccomp, mod_nctools.F90:140-2539)."""
    from scipy.io import netcdf_file

    nacc = float(np.asarray(group.nacc))
    q = 1.0 / max(nacc, 1.0)
    ipm = np.asarray(grid.ip) > 0
    idx = np.flatnonzero(ipm.ravel()).astype('i4')
    npts = idx.size

    from .merdia import DEPTHSLEV

    with netcdf_file(path, 'w') as f:
        f.createDimension('time', None)
        f.createDimension('pcomp', npts)
        f.createDimension('sigma', grid.kk)
        f.createDimension('depth', len(DEPTHSLEV))

        tvar = f.createVariable('time', 'd', ('time',))
        tvar[0] = time_days
        pvar = f.createVariable('pcomp', 'i', ('pcomp',))
        pvar[:] = idx
        pvar.compress = 'y x'

        for name, op in _norm_fields(group.fields):
            dims, _ = FIELD_REGISTRY[name]
            mean = np.asarray(group.acc[name])
            if op in ('ave', 'sq'):
                mean = mean * q
            if dims == '2d':
                v = f.createVariable(name, 'f', ('time', 'pcomp'))
                v[0] = mean.ravel()[idx].astype('f4')
            else:
                zdim = 'depth' if dims == 'zlv' else 'sigma'
                v = f.createVariable(name, 'f', ('time', zdim, 'pcomp'))
                flat = mean.reshape(mean.shape[0], -1)[:, idx]
                v[0] = flat.astype('f4')
