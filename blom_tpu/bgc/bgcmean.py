"""BGC diagnostic accumulation and output (bgcmean).

TPU-native re-design of iHAMOCC's diagnostic system
(reference: /root/reference/hamocc/mo_bgcmean.F90 — up to nbgcmax=10
output groups with per-group frequencies; srf/lyr/lvl field classes
accumulated via accsrf/acclyr/acclvl with layer-thickness weighting
:1965-2095 and finalized by finsrf/finlyr :2164-2228; NetCDF output
wrtsrf/wrtlyr/wrtlvl :2232-2405).

Field sources:
- 'trc'  — a BGC tracer concentration from the state block
  (per-mass units; layer fields, dz-weighted like acclyr);
- 'diag' — a per-step diagnostic from hamocc_step's returned dict
  (surface fluxes / vertically integrated rates are 2-D 'srf';
  omegaC/omegaA/co3 are 3-D layer fields);
- 'lvl'  — z-level remap of a 3-D source (acclvl + the depthslev
  table shared with io/merdia.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import onem
from .params import BgcTracers as T

#: name -> (kind, source) where kind in {'srf', 'lyr', 'lvl'} and
#: source is ('trc', tracer-attr) or ('diag', key)
FIELD_REGISTRY: Dict[str, Tuple[str, tuple]] = {
    # surface / integrated fluxes (jco2flux... ids, mo_bgcmean.F90:371+)
    'co2flux': ('srf', ('diag', 'co2flux')),
    'oxflux': ('srf', ('diag', 'oxflux')),
    'niflux': ('srf', ('diag', 'niflux')),
    'n2oflux': ('srf', ('diag', 'n2oflux')),
    'dmsflux': ('srf', ('diag', 'dmsflux')),
    'pco2': ('srf', ('diag', 'pco2')),
    'intphosy': ('srf', ('diag', 'intphosy')),
    'intdnit': ('srf', ('diag', 'intdnit')),
    'intnfix': ('srf', ('diag', 'intnfix')),
    'expoor': ('srf', ('diag', 'expoor')),
    'expoca': ('srf', ('diag', 'expoca')),
    'exposi': ('srf', ('diag', 'exposi')),
    'carflx_bot': ('srf', ('diag', 'carflx_bot')),
    'calflx_bot': ('srf', ('diag', 'calflx_bot')),
    'bsiflx_bot': ('srf', ('diag', 'bsiflx_bot')),
    # 3-D carbonate system diagnostics
    'omegac': ('lyr', ('diag', 'omegaC')),
    'omegaa': ('lyr', ('diag', 'omegaA')),
    'co3': ('lyr', ('diag', 'co3')),
}

#: tracer concentration fields (LYR_/LVL_ per-tracer ids)
for _nm in ('sco212', 'alkali', 'phosph', 'oxygen', 'ano3', 'silica',
            'iron', 'phy', 'zoo', 'det', 'doc', 'calc', 'opal',
            'an2o', 'dms', 'hi'):
    FIELD_REGISTRY[_nm] = ('lyr', ('trc', _nm))
    FIELD_REGISTRY[_nm + 'lvl'] = ('lvl', ('trc', _nm))
for _nm in ('omegac', 'omegaa', 'co3'):
    FIELD_REGISTRY[_nm + 'lvl'] = ('lvl', ('diag', {'omegac': 'omegaC',
                                                    'omegaa': 'omegaA',
                                                    'co3': 'co3'}[_nm]))
del _nm

DEFAULT_SRF = ('co2flux', 'pco2', 'dmsflux', 'oxflux', 'intphosy',
               'expoor', 'expoca', 'exposi', 'carflx_bot')
DEFAULT_LYR = ('sco212', 'alkali', 'phosph', 'oxygen', 'ano3', 'silica',
               'phy', 'det', 'doc', 'omegac', 'co3')
DEFAULT_FIELDS = DEFAULT_SRF + DEFAULT_LYR


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BgcmGroup:
    """One bgcmean accumulation group (a slot of the GLB_* arrays,
    mo_bgcmean.F90:93-130)."""
    nacc: jax.Array
    acc: dict                    # name -> running sum (dz-weighted for lyr)
    wgt: dict                    # name -> accumulated dz weights (lyr only)
    fields: tuple = dataclasses.field(metadata=dict(static=True))


def _tracer_index(name, ti):
    if ti is not None and hasattr(ti, name):
        return getattr(ti, name)
    return getattr(T, name)


def _dz(grid, s, n):
    return s.dp[n] / onem * grid.ip


def _extract(grid, s, n, itrbgc, ti, diags, name):
    kind, (src, key) = FIELD_REGISTRY[name]
    if src == 'trc':
        fld = s.trc[n, itrbgc + _tracer_index(key, ti)]
    else:
        fld = diags.get(key)
        if fld is None:
            return None, kind
    if kind == 'lvl':
        from ..core.state import cumulative_p
        from ..io.merdia import to_zlev
        fld = to_zlev(fld, cumulative_p(s.dp[n]))
    return fld, kind


def init_bgcm(grid, s, itrbgc: int, fields=DEFAULT_FIELDS, ti=None,
              dtype=jnp.float64) -> BgcmGroup:
    """Allocate zeroed accumulators (inisrf/inilyr/inilvl,
    mo_bgcmean.F90:1809-1899)."""
    acc, wgt = {}, {}
    for name in fields:
        kind = FIELD_REGISTRY[name][0]
        if kind == 'srf':
            acc[name] = jnp.zeros(grid.shape, dtype)
        elif kind == 'lyr':
            acc[name] = jnp.zeros((grid.kk,) + grid.shape, dtype)
            wgt[name] = jnp.zeros((grid.kk,) + grid.shape, dtype)
        else:
            from ..io.merdia import DEPTHSLEV
            acc[name] = jnp.zeros((len(DEPTHSLEV),) + grid.shape, dtype)
    return BgcmGroup(nacc=jnp.zeros((), dtype), acc=acc, wgt=wgt,
                     fields=tuple(fields))


def acc_bgcm(group: BgcmGroup, grid, s, n: int, itrbgc: int, diags,
             ti=None) -> BgcmGroup:
    """Accumulate one step (accsrf/acclyr/acclvl,
    mo_bgcmean.F90:1965-2095).  Layer fields are dz-weighted (the
    wghtsflg=1 path of acclyr) so averages are thickness means."""
    acc = dict(group.acc)
    wgt = dict(group.wgt)
    dz = _dz(grid, s, n)
    for name in group.fields:
        fld, kind = _extract(grid, s, n, itrbgc, ti, diags, name)
        if fld is None:
            continue
        if kind == 'lyr':
            acc[name] = acc[name] + fld * dz
            wgt[name] = wgt[name] + dz
        else:
            acc[name] = acc[name] + fld
    return BgcmGroup(nacc=group.nacc + 1., acc=acc, wgt=wgt,
                     fields=group.fields)


def finalize_bgcm(group: BgcmGroup):
    """Finish averages (finsrf/finlyr, mo_bgcmean.F90:2164-2228):
    srf/lvl divide by nacc; lyr divide by accumulated weights."""
    nacc = jnp.maximum(group.nacc, 1.)
    out = {}
    for name in group.fields:
        kind = FIELD_REGISTRY[name][0]
        a = group.acc[name]
        if kind == 'lyr':
            out[name] = a / jnp.maximum(group.wgt[name], 1e-30)
        else:
            out[name] = a / nacc
    return out


def reset_bgcm(group: BgcmGroup) -> BgcmGroup:
    z = {k: jnp.zeros_like(v) for k, v in group.acc.items()}
    zw = {k: jnp.zeros_like(v) for k, v in group.wgt.items()}
    return BgcmGroup(nacc=jnp.zeros_like(group.nacc), acc=z, wgt=zw,
                     fields=group.fields)


def write_bgcm(path: str, grid, group: BgcmGroup, time_days: float):
    """NetCDF3-classic output (wrtsrf/wrtlyr/wrtlvl,
    mo_bgcmean.F90:2232-2405)."""
    from scipy.io import netcdf_file

    from ..io.merdia import DEPTHSLEV

    means = finalize_bgcm(group)
    jdm, idm = grid.shape
    ipm = np.asarray(grid.ip) > 0

    with netcdf_file(path, 'w') as f:
        f.createDimension('time', None)
        f.createDimension('y', jdm)
        f.createDimension('x', idm)
        f.createDimension('sigma', grid.kk)
        f.createDimension('depth', len(DEPTHSLEV))
        tvar = f.createVariable('time', 'd', ('time',))
        tvar[0] = time_days
        dvar = f.createVariable('depth', 'd', ('depth',))
        dvar[:] = DEPTHSLEV

        for name in group.fields:
            kind = FIELD_REGISTRY[name][0]
            a = np.asarray(means[name]).astype('f4')
            if kind == 'srf':
                v = f.createVariable(name, 'f', ('time', 'y', 'x'))
                v[0] = np.where(ipm, a, np.float32(-1e33))
            elif kind == 'lyr':
                v = f.createVariable(name, 'f',
                                     ('time', 'sigma', 'y', 'x'))
                v[0] = np.where(ipm[None], a, np.float32(-1e33))
            else:
                v = f.createVariable(name, 'f',
                                     ('time', 'depth', 'y', 'x'))
                v[0] = np.where(ipm[None], a, np.float32(-1e33))
            v._FillValue = np.float32(-1e33)
