"""Apply/diagnose heat and salt relaxation flux climatologies.

TPU-native counterpart of the reference module
(/root/reference/phy/mod_idarlx.F90:20-99 idarlx): loads 48-slice
annual climatologies of diagnosed heat (tflxdi) and salt (sflxdi)
relaxation fluxes for the aptflx/apsflx options of thermf.  The
Fortran unformatted reads become array loaders; application uses
intp1d over the 5 neighbouring slices (mod_thermf_ben02.F90:508-512).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .intp1d import clim_indices, intp1d

NSLICES = 48


def load_flux_clim(path: str, varname: str, dtype=jnp.float64):
    """Load a (48, jdm, idm) diagnosed flux climatology from .npz/.npy
    (idarlx, mod_idarlx.F90:36-95)."""
    if path.endswith('.npz'):
        arr = np.load(path)[varname]
    else:
        arr = np.load(path)
    if arr.shape[0] != NSLICES:
        raise ValueError(f'expected {NSLICES} slices, got {arr.shape}')
    return jnp.asarray(arr, dtype)


def apply_flux_clim(flxap, nday_of_year, frac_of_day,
                    nday_in_year: float = 365.):
    """Interpolate the climatology to the current time; the result is
    subtracted from surrlx/salrlx (mod_thermf_ben02.F90:508-512)."""
    m1, m2, m3, m4, m5, x = clim_indices(nday_of_year, frac_of_day,
                                         NSLICES, nday_in_year)
    return intp1d(flxap[m1], flxap[m2], flxap[m3], flxap[m4],
                  flxap[m5], x)


def diagnose_flux(acc, count, flx, slot: int):
    """Accumulate a relaxation flux into climatology slot `slot`
    (the ditflx/disflx accumulation, mod_thermf_ben02.F90:514-517);
    acc: (48, jdm, idm), count: (48,) ints."""
    acc = acc.at[slot].add(flx)
    count = count.at[slot].add(1)
    return acc, count
