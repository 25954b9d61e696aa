"""Lateral eddy diffusivity estimation.

TPU-native re-design of the reference's lateral diffusivity path
(reference: /root/reference/phy/mod_difest.F90 difest_lateral_hybrid —
Eden & Greatbatch (2008) eddy diffusivity from an inverse eddy time
scale and eddy length scale, a Rossby-radius-resolution weight difwgt
('edwmth', mod_diffusion.F90), and layer/interface diffusivities
difint/difiso bounded by [egmndf, egmxdf]).

EG-lite this round: the inverse time scale uses the Eady growth rate
sigma = |f| / sqrt(Ri (Ri + eggam)) with the large-scale Richardson
number Ri = N^2 / (N^2 slope^2) = 1/slope^2 ('large scale' EDRITP),
the eddy length is max(Rossby radius, eglsmn) capped by grid scale, and
K = egc * sigma * L^2 clipped to [egmndf, egmxdf].  The deck value
EGC = 0 (tests/fuk95/limits:316) reproduces zero interior diffusivity
exactly as in the reference."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from ..core.constants import grav, onem, epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from .cmnfld import CmnFields
from .diffusion_fields import DiffusionFields


class DifestParams(NamedTuple):
    # &DIFFUSION (mod_diffusion.F90:200-546)
    egc: float = 0.
    eggam: float = 200.
    eglsmn: float = 4000.    # min eddy length scale [m]
    egmndf: float = 0.       # min diffusivity [m2 s-1]
    egmxdf: float = 1500.    # max diffusivity [m2 s-1]
    egidfq: float = 1.       # difiso = egidfq * difint
    ri0: float = 1.2


def difest_lateral(grid: Grid, s: State, cf: CmnFields,
                   par: DifestParams, dfl: DiffusionFields,
                   m: int, n: int) -> DiffusionFields:
    """Fill difint/difiso/difwgt (difest_lateral_hybrid,
    mod_difest.F90)."""
    kk = grid.kk
    ip = grid.ip

    dp = s.dp[n]
    p = cumulative_p(dp) * ip
    H_col = jnp.maximum(p[kk] / (grav / 1e-3), 1.0)  # ~depth*rho0 [kg/m2]

    # first-baroclinic Rossby radius: Lr = (1/|f|) * int N dz / pi
    # with dz = dp * alpha0 / g
    n_int = jnp.sqrt(jnp.maximum(cf.bfsqi[1:-1], 0.))
    dz_mid = .5 * (dp[:-1] + dp[1:]) * 1.e-3 / grav
    cint = jnp.sum(n_int * dz_mid, axis=0)
    absf = jnp.maximum(jnp.abs(grid.coriop), 1.e-6)
    rossby = cint / (jnp.pi * absf)

    # resolution weight: ->1 when the radius is unresolved ('edwmth
    # smooth', mod_difest.F90)
    dx = jnp.sqrt(grid.scp2)
    difwgt = (dx * dx / (dx * dx + rossby * rossby)) * ip

    # interface slope magnitude -> large-scale Ri -> Eady rate
    slp_u = .5 * (cf.nslpx + grid.ip1(cf.nslpx))
    slp_v = .5 * (cf.nslpy + grid.jp1(cf.nslpy, 'v', True))
    slp2 = slp_u * slp_u + slp_v * slp_v          # (kk+1, H) at p
    ri = 1.0 / jnp.maximum(slp2, 1e-12)
    sigma_eady = absf / jnp.sqrt(ri * (ri + par.eggam))

    L = jnp.maximum(jnp.minimum(rossby, dx), par.eglsmn)
    K_i = jnp.clip(par.egc * sigma_eady * L * L,
                   par.egmndf, par.egmxdf) * ip   # (kk+1, H)

    # reference clamp order: min(difmxp, egmxdf, max(egmndf, K))
    # (mod_difest.F90:1910-1921) — difmxp is the grid/timestep CFL bound
    # on explicit lateral diffusion (numerical_bounds,
    # mod_blom_init.F90:446-555); without it an egmndf/egmxdf above the
    # stability limit makes diffus/eddtra explode.
    difint = jnp.minimum(grid.difmxp,
                         .5 * (K_i[:-1] + K_i[1:]))   # layer values
    # isopycnal diffusivity keeps the egmndf/egmxdf floor/cap after the
    # egidfq scaling: min(difmxp, egmxdf, max(egmndf, difint*egidfq))
    # (mod_difest.F90:1914-1916)
    difiso = jnp.minimum(grid.difmxp,
                         jnp.clip(par.egidfq * difint,
                                  par.egmndf, par.egmxdf))

    return dataclasses.replace(
        dfl, difint=difint, difiso=difiso, difwgt=difwgt)
