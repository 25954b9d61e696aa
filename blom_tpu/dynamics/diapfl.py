"""Diapycnal mixing between isopycnic layers.

TPU-native counterpart of the reference diapycnal flux solver
(reference: /root/reference/phy/mod_diapfl.F90:45-1048 diapfl — per
column, implicit diapycnal mass/buoyancy fluxes between isopycnic layers
driven by the diapycnal diffusivity difdia, iterated to keep interior
layer densities on their reference values).

Round-1 scope: the buoyancy-diffusion part — implicit vertical diffusion
of T and S with the diapycnal diffusivity (the same Thomas solve as the
ALE path's vertical diffusion, reused) — while the mass-redistribution
(layer-interface migration) part of the reference scheme is deferred;
interior densities are instead maintained by convec and the slow drift
is restored through the advective/regrid pathways.  Documented as a
parity deviation."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import eos
from ..core.constants import grav, alpha0
from ..core.grid import Grid
from ..core.state import State
from .ale_vdiff import _thomas, dpmin_vdiff


def diapfl(grid: Grid, e: eos.EosParams, s: State, difdia, m: int, n: int,
           delt1) -> State:
    """difdia: (kk, H) interface diapycnal diffusivity [m2 s-1] (index k
    = interface above layer k, [0] unused)."""
    ip = grid.ip
    dp_c = s.dp[n]
    c = grav * grav * delt1 / (alpha0 * alpha0)

    fpbase = jnp.concatenate(
        [jnp.zeros_like(dp_c[:1]),
         c / jnp.maximum(dpmin_vdiff, .5 * (dp_c[:-1] + dp_c[1:]))], axis=0)
    fp = difdia * fpbase

    temp_new = _thomas(dp_c + 1e-30, fp, dp_c * s.temp[n]) * ip
    saln_new = jnp.maximum(
        _thomas(dp_c + 1e-30, fp, dp_c * s.saln[n]), 0.) * ip
    sigma_new = eos.sig(e, temp_new, saln_new) * ip

    s = dataclasses.replace(
        s,
        temp=s.temp.at[n].set(temp_new),
        saln=s.saln.at[n].set(saln_new),
        sigma=s.sigma.at[n].set(sigma_new))

    ntr = s.trc.shape[1]
    if ntr:
        trc_news = [jnp.maximum(
            _thomas(dp_c + 1e-30, fp, dp_c * s.trc[n, nt]), 0.) * ip
            for nt in range(ntr)]
        s = dataclasses.replace(
            s, trc=s.trc.at[n].set(jnp.stack(trc_news, axis=0)))
    return s
