"""Climatological sea-surface salinity ingest.

TPU-native counterpart of the reference reader
(/root/reference/phy/mod_rdcsss.F90): loads the 12-month SSS
climatology used by the srxday relaxation (sssclm of mod_forcing),
with the missing-value flood fill applied per month.  Accepts classic
NetCDF (scipy) or npz with variable 'sss'."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.geoenv import fill_global


def rdcsss(path: str, mask=None, varname: str = 'sss',
           missing=-9.99e33, dtype=jnp.float64):
    """Return (12, jdm, idm) monthly SSS climatology (rdcsss,
    mod_rdcsss.F90; fill via mod_fill_global)."""
    if path.endswith('.npz'):
        arr = np.load(path)[varname].astype(np.float64)
    else:
        from scipy.io import netcdf_file
        with netcdf_file(path, 'r', mmap=False) as f:
            arr = np.asarray(f.variables[varname][:], np.float64).copy()
    if arr.shape[0] != 12:
        raise ValueError(f'expected 12 months, got {arr.shape}')
    out = np.empty_like(arr)
    for m in range(12):
        out[m] = fill_global(arr[m], missing, mask=mask)
    return jnp.asarray(out, dtype)
