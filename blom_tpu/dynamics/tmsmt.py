"""Leap-frog time smoothing (Robert–Asselin-like).

TPU-native re-design of the reference time-smoothing module
(reference: /root/reference/phy/mod_tmsmt.F90).  Velocity smoothing lives
in momtum (as in the reference); here: the pre-step saves (tmsmt1,
mod_tmsmt.F90:215-280) and the post-step thickness/scalar blend (tmsmt2,
:282-412)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.constants import epsilp
from ..core.grid import Grid
from ..core.state import State, cumulative_p, dpu_dpv_upstream

# Smoothing weights (mod_tmsmt.F90:46-51).
wuv1 = .75
wuv2 = .125
wts1 = .875
wts2 = .0625
wbaro = .125


def tmsmt1(grid: Grid, s: State, n: int, vcoord_isopyc: bool = False) -> State:
    """Save old-time-level fields for later smoothing (mod_tmsmt.F90:215-280)."""
    s = dataclasses.replace(
        s,
        dpold=s.dpold.at[n].set(s.dp[n]),
        told=s.temp[n], sold=s.saln[n], trcold=s.trc[n])
    if vcoord_isopyc:
        s = dataclasses.replace(s, dpuold=s.dpu[n], dpvold=s.dpv[n])
    return s


def tmsmt2(grid: Grid, s: State, m: int, n: int,
           vcoord_isopyc: bool = False) -> State:
    """Blend mid level with old/new thickness-weighted fields
    (mod_tmsmt.F90:282-412)."""
    ip = grid.ip

    dpold_n = s.dpold[n]
    dp_n = s.dp[n]
    dp_m = s.dp[m]

    pbfaco = s.pb[m] / jnp.maximum(jnp.sum(dpold_n, axis=0), epsilp)
    pbfacn = s.pb[m] / jnp.maximum(jnp.sum(dp_n, axis=0), epsilp)

    pold = jnp.maximum(0., dpold_n * pbfaco)
    pmid = jnp.maximum(0., dp_m)
    pnew = jnp.maximum(0., dp_n * pbfacn)
    dp_m_new = (wts1 * pmid + wts2 * (pold + pnew)) * ip
    pold = pold + epsilp
    pmid = pmid + epsilp
    pnew = pnew + epsilp
    denom = dp_m_new + epsilp
    temp_m = (wts1 * pmid * s.temp[m]
              + wts2 * (pold * s.told + pnew * s.temp[n])) / denom * ip
    saln_m = (wts1 * pmid * s.saln[m]
              + wts2 * (pold * s.sold + pnew * s.saln[n])) / denom * ip
    trc_m = (wts1 * pmid[None] * s.trc[m]
             + wts2 * (pold[None] * s.trcold
                       + pnew[None] * s.trc[n])) / denom[None] * ip

    s = dataclasses.replace(
        s,
        dp=s.dp.at[m].set(dp_m_new),
        temp=s.temp.at[m].set(temp_m),
        saln=s.saln.at[m].set(saln_m),
        trc=s.trc.at[m].set(trc_m))

    p = cumulative_p(dp_m_new) * ip
    s = dataclasses.replace(s, p=p)

    if vcoord_isopyc:
        dpu_m, dpv_m = dpu_dpv_upstream(grid, p)
        s = dataclasses.replace(
            s, dpu=s.dpu.at[m].set(dpu_m), dpv=s.dpv.at[m].set(dpv_m))
    return s
