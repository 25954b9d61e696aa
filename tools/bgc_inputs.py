"""Offline iHAMOCC input preparation and restart remapping.

TPU-native counterpart of the reference's offline utility collection
(/root/reference/utils/iHAMOCC: restart_remapping/
iHAMOCC_restart_remapping.py, prepare_Ndeposition, prepare_dust_
deposition, prepare_river_inputs — shell/python/matlab tools that
regrid external datasets onto the model grid and remap BGC restart
files between grids).  Host-side numpy only; the model-grid target is
any Grid-like object exposing plat/plon/ip (or plain arrays).

Two capabilities:

- regrid_to_model(src_lat, src_lon, src, plat, plon): nearest-neighbour
  regrid of a (possibly masked) regular lat-lon dataset onto the
  model's curvilinear grid, with flood fill of missing values (the role
  of the cdo/nco pipelines in prepare_*_deposition).
- remap_restart(trc_src, p_src, p_dst, ...): conservative vertical
  re-layering of a tracer restart between vertical grids plus
  horizontal nearest-neighbour transfer between model grids (the role
  of iHAMOCC_restart_remapping.py).
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _nearest_index_map(src_lat, src_lon, plat, plon):
    """(j, i) index maps from a regular src grid to the model grid."""
    src_lat = np.asarray(src_lat)
    src_lon = np.asarray(src_lon) % 360.
    plat = np.asarray(plat)
    plon = np.asarray(plon) % 360.
    jj = np.argmin(np.abs(src_lat[None, None, :]
                          - plat[:, :, None]), axis=-1)
    # longitudes wrap: compare circular distance
    dlon = np.abs(src_lon[None, None, :] - plon[:, :, None])
    dlon = np.minimum(dlon, 360. - dlon)
    ii = np.argmin(dlon, axis=-1)
    return jj, ii


def regrid_to_model(src_lat, src_lon, src, plat, plon, missing=None,
                    mask=None):
    """Nearest-neighbour regrid of src(lat, lon) (or (n, lat, lon))
    onto the model grid (plat, plon), flood-filling missing values
    afterwards (the reference pipelines use cdo remapbil + fillmiss;
    utils/iHAMOCC/prepare_dust_deposition/*.sh)."""
    from blom_tpu.core.geoenv import fill_global

    src = np.asarray(src, np.float64)
    single = src.ndim == 2
    if single:
        src = src[None]
    jj, ii = _nearest_index_map(src_lat, src_lon, plat, plon)
    out = src[:, jj, ii]
    if missing is not None:
        for n in range(out.shape[0]):
            out[n] = fill_global(out[n], missing, mask=mask)
    return out[0] if single else out


def remap_restart_column(trc, p_src, p_dst):
    """Conservative vertical re-layering of layer-mean tracers:
    trc (ntr, ks, J, I) on source interfaces p_src (ks+1, J, I) ->
    destination interfaces p_dst (kd+1, J, I)
    (iHAMOCC_restart_remapping_functions.py's vertical remap role).
    Piecewise-constant (PCM) reconstruction => exact total
    conservation when the column ranges match."""
    trc = np.asarray(trc, np.float64)
    p_src = np.asarray(p_src, np.float64)
    p_dst = np.asarray(p_dst, np.float64)
    ntr, ks = trc.shape[:2]
    kd = p_dst.shape[0] - 1

    # cumulative integral at source interfaces
    dps = np.maximum(p_src[1:] - p_src[:-1], 0.)
    zero = np.zeros((ntr, 1) + trc.shape[2:])
    I = np.concatenate([zero, np.cumsum(trc * dps[None], axis=1)],
                       axis=1)
    # I has shape (ntr, ks+1, J, I); integrate to arbitrary pressure by
    # locating the containing layer
    def integral_at(pq):
        # pq (J, I) -> (ntr, J, I)
        pq_c = np.clip(pq, p_src[0], p_src[-1])
        # index of layer containing pq
        idx = np.sum(p_src[:-1] <= pq_c[None], axis=0) - 1
        idx = np.clip(idx, 0, ks - 1)
        J, Ii = np.indices(pq.shape)
        p_up = p_src[idx, J, Ii]
        frac = pq_c - p_up
        base = I[:, idx, J, Ii]
        return base + trc[:, idx, J, Ii] * frac

    out = np.empty((ntr, kd) + trc.shape[2:], np.float64)
    Iq = [integral_at(p_dst[k]) for k in range(kd + 1)]
    for k in range(kd):
        dpd = np.maximum(p_dst[k + 1] - p_dst[k], 1e-30)
        out[:, k] = (Iq[k + 1] - Iq[k]) / dpd
    return out


def remap_restart(trc_src, p_src, plat_src, plon_src, p_dst, plat_dst,
                  plon_dst, missing=None, mask_dst=None):
    """Full restart remap: horizontal nearest-neighbour transfer of
    each source column to the destination model grid, then vertical
    re-layering (utils/iHAMOCC/restart_remapping)."""
    jj, ii = _nearest_index_map(
        np.asarray(plat_src)[:, 0] if np.asarray(plat_src).ndim == 2
        else plat_src,
        np.asarray(plon_src)[0] if np.asarray(plon_src).ndim == 2
        else plon_src,
        plat_dst, plon_dst)
    trc_h = np.asarray(trc_src)[:, :, jj, ii]
    p_h = np.asarray(p_src)[:, jj, ii]
    out = remap_restart_column(trc_h, p_h, np.asarray(p_dst))
    if missing is not None:
        from blom_tpu.core.geoenv import fill_global
        for n in range(out.shape[0]):
            for k in range(out.shape[1]):
                out[n, k] = fill_global(out[n, k], missing,
                                        mask=mask_dst)
    return out


def prepare_ndep(src_lat, src_lon, nhx, noy, plat, plon, mask=None):
    """Combine NHx + NOy deposition fields and regrid to the model grid
    [kmol N m-2 yr-1] (prepare_Ndeposition role)."""
    tot = np.asarray(nhx, np.float64) + np.asarray(noy, np.float64)
    return regrid_to_model(src_lat, src_lon, tot, plat, plon,
                           missing=np.nan, mask=mask)


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--demo', action='store_true')
    args = ap.parse_args()
    if args.demo:
        lat = np.linspace(-89.5, 89.5, 180)
        lon = np.linspace(0.5, 359.5, 360)
        f = np.cos(np.radians(lat))[:, None] * np.ones((180, 360))
        plat = np.linspace(-60, 60, 50)[:, None] * np.ones((50, 80))
        plon = np.ones((50, 1)) * np.linspace(0, 355, 80)[None]
        out = regrid_to_model(lat, lon, f, plat, plon)
        print('regrid demo:', out.shape, out.min(), out.max())
