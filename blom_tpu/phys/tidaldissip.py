"""Tidal wave energy dissipation input field.

TPU-native counterpart of the reference module
(/root/reference/phy/mod_tidaldissip.F90:20-160): holds `twedon`, the
tidal wave energy dissipation divided by the Brunt-Vaisala frequency
at the bottom, read from a grid file.  The NetCDF read becomes a
host-side loader accepting any array source (npz, scipy NetCDF, or an
in-memory array); the field itself is just data consumed by the tidal
term of the diffusivity estimators (mod_difest.F90:2929-2941).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inivar_tidaldissip(shape, dtype=jnp.float64):
    """Zero field (inivar_tidaldissip, mod_tidaldissip.F90:47-60)."""
    return jnp.zeros(tuple(shape), dtype)


def read_tidaldissip(path: str, varname: str = 'twedon',
                     dtype=jnp.float64):
    """Load the dissipation field (read_tidaldissip,
    mod_tidaldissip.F90:63-155).  Supports .npz/.npy archives and
    classic NetCDF via scipy."""
    if path.endswith('.npz'):
        arr = np.load(path)[varname]
    elif path.endswith('.npy'):
        arr = np.load(path)
    else:
        from scipy.io import netcdf_file
        with netcdf_file(path, 'r', mmap=False) as f:
            arr = f.variables[varname][:].copy()
    return jnp.asarray(arr, dtype)


def tidal_diffusivity(twedon, bvfbot, bvfsq, p_i, dp_k, grav: float,
                      tdmq: float = 1. / 3., dmxeff: float = .2,
                      tdmls0: float = 500. * 9806.,
                      tdmls1: float = 500. * 9806.,
                      tdclat: float = 0., tddlat: float = 1., plat=None):
    """Tidally driven diapycnal diffusivity profile (the tdmflg branch,
    mod_difest.F90:2929-2941): bottom-intensified vertical structure
    function times the local dissipation."""
    if plat is None:
        q = tdmls0
    else:
        w = .5 * (jnp.tanh(4. * (jnp.abs(plat) - tdclat) / tddlat - 2.)
                  + 1.)
        q = (1. - w) * tdmls0 + w * tdmls1
    pbot = p_i[-1]
    vsf = ((jnp.exp(p_i[1:] / q) - jnp.exp(p_i[:-1] / q))
           / (jnp.maximum(dp_k, 1.e-12)
              * jnp.maximum(jnp.exp(pbot / q) - 1., 1.e-12)))
    return (grav * tdmq * dmxeff * twedon[None] * bvfbot[None] * vsf
            / jnp.maximum(bvfsq, 1.e-12))
