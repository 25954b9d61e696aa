"""Grid-file geometry ingest and flood fill of missing input data.

TPU-native counterpart of the reference geometry reader
(/root/reference/phy/mod_geoenv.F90:45-884 geoenv_file reads the grid
NetCDF's pdx/pdy/../qdx/qdy scale factors, plat/plon/qlat, pdepth and
rotation angle) and the missing-data flood fill
(/root/reference/phy/mod_fill_global.F90).  File ingest is host-side
numpy; supports classic NetCDF via scipy and .npz archives with the
same variable names.
"""

from __future__ import annotations

import numpy as np

from . import grid as grid_mod

OMEGA = 7.292e-5   # Earth rotation rate [1/s]

GRID_VARS = ('pdx', 'pdy', 'udx', 'udy', 'vdx', 'vdy', 'qdx', 'qdy',
             'plat', 'plon', 'qlat', 'pdepth')


def _load_vars(path: str, names):
    if path.endswith('.npz'):
        data = np.load(path)
        return {n: np.asarray(data[n], np.float64) for n in names}
    from scipy.io import netcdf_file
    with netcdf_file(path, 'r', mmap=False) as f:
        return {n: np.asarray(f.variables[n][:], np.float64).copy()
                for n in names}


def apply_cwmod(v, cwmod):
    """Channel-width modifications (the CWMOD namelist,
    mod_geoenv.F90:777-862): override the along-edge scale factor of a
    named strait cell — udy (scuy) for a 'u' edge, vdx (scvx) for a 'v'
    edge — with a prescribed width; the edge areas scu2/scv2 follow when
    the grid is finished.  cwmod entries are (cwmtag, cwmedg, cwmi,
    cwmj, cwmwth) with 1-based global Fortran indices."""
    for tag, edg, ci, cj, wth in cwmod:
        jtdm, itdm = v['pdx'].shape
        if edg not in ('u', 'v'):
            raise ValueError(
                f"cwmod {tag!r}: edge must be 'u' or 'v' "
                '(mod_geoenv.F90:826-832)')
        if not (1 <= ci <= itdm and 1 <= cj <= jtdm):
            raise ValueError(f'cwmod {tag!r}: indices out of bounds '
                             '(mod_geoenv.F90:833-839)')
        key = 'udy' if edg == 'u' else 'vdx'
        v[key][cj - 1, ci - 1] = float(wth)
    return v


def geoenv_file(path: str, kk: int, baclin: float,
                periodic_i: bool = True, arctic: bool = False,
                dtype=None, cwmod=()):
    """Build a Grid from a BLOM-convention grid file (geoenv_file,
    mod_geoenv.F90:45-884: scale factors from the *dx/*dy variables,
    Coriolis from qlat/plat, depths from pdepth).  cwmod is an optional
    sequence of channel-width modifications (see apply_cwmod)."""
    import jax.numpy as jnp
    v = _load_vars(path, GRID_VARS)
    if cwmod:
        v = apply_cwmod(v, cwmod)
    corioq = 2. * OMEGA * np.sin(np.radians(v['qlat']))
    coriop = 2. * OMEGA * np.sin(np.radians(v['plat']))
    rearth = 6.37122e6
    betafp = (2. * OMEGA * np.cos(np.radians(v['plat'])) / rearth)
    return grid_mod.finish_grid(
        scpx=v['pdx'], scpy=v['pdy'], scux=v['udx'], scuy=v['udy'],
        scvx=v['vdx'], scvy=v['vdy'], scqx=v['qdx'], scqy=v['qdy'],
        plon=v['plon'], plat=v['plat'], depths=v['pdepth'],
        corioq=corioq, coriop=coriop, betafp=betafp,
        periodic_i=periodic_i, periodic_j=False, kk=kk,
        baclin=baclin, arctic=arctic,
        dtype=dtype if dtype is not None else jnp.float64)


def fill_global(a: np.ndarray, missing, mask=None, cyclic_i: bool = True,
                maxiter: int = 1000) -> np.ndarray:
    """Flood-fill missing values by iterative neighbour averaging
    (mod_fill_global.F90: the reference sweeps until no missing points
    remain inside the ocean mask).  Host-side preprocessing for
    climatology ingest."""
    a = np.array(a, np.float64)
    if np.isnan(missing):
        miss = np.isnan(a)
    else:
        miss = np.abs(a - missing) < abs(missing) * 1e-6 + 1e-30
    if mask is not None:
        want = (np.asarray(mask) > 0)
    else:
        want = np.ones_like(a, bool)
    a[miss] = np.nan

    for _ in range(maxiter):
        bad = np.isnan(a) & want
        if not bad.any():
            break
        padded = a
        nb = []
        for (dj, di) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            sh = np.roll(padded, (dj, di), axis=(0, 1))
            if dj == 1:
                sh[0, :] = np.nan
            if dj == -1:
                sh[-1, :] = np.nan
            if not cyclic_i:
                if di == 1:
                    sh[:, 0] = np.nan
                if di == -1:
                    sh[:, -1] = np.nan
            nb.append(sh)
        nb = np.stack(nb)
        cnt = np.sum(~np.isnan(nb), axis=0)
        ssum = np.nansum(np.where(np.isnan(nb), 0., nb), axis=0)
        fill = bad & (cnt > 0)
        a[fill] = ssum[fill] / cnt[fill]
    a[np.isnan(a)] = 0.
    return a
