"""Lateral (along-layer) diffusion of tracers.

TPU-native re-design of the reference isopycnal diffusion
(reference: /root/reference/phy/mod_diffus.F90:41-187 diffus): depth-
limited harmonic-free diffusive fluxes q*(c(i-1) - c(i)) with
q = delt1 * mean(difiso) * dy/dx * max(min(dp), eps), applied to T, S
and passive tracers; the neutral-diffusion variant (ltedtp 'neutral')
lives in the ALE/ndiff pathway."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core import eos
from ..core.grid import Grid
from ..core.state import State
from .diffusion_fields import DiffusionFields

dpeps = 1.e-5    # (mod_diffus.F90:56)


def diffus(grid: Grid, e: eos.EosParams, s: State, dfl: DiffusionFields,
           m: int, n: int, delt1):
    """Returns (state, dfl): dfl gains the per-step isopycnal heat/salt
    fluxes (utflld..., the LYR/LVL_U/VT/SFLLD diagnostics)."""
    ip, iu, iv = grid.ip, grid.iu, grid.iv
    im1, ip1, jm1, jp1 = grid.im1, grid.ip1, grid.jm1, grid.jp1
    jp1vv = lambda a: grid.jp1(a, 'v', True)   # noqa: E731 (fold-aware)

    dp = s.dp[n]
    qu = delt1 * .5 * (im1(dfl.difiso) + dfl.difiso) \
        * grid.scuy * grid.scuxi \
        * jnp.maximum(jnp.minimum(im1(dp), dp), dpeps) * iu
    qv = delt1 * .5 * (jm1(dfl.difiso) + dfl.difiso) \
        * grid.scvx * grid.scvyi \
        * jnp.maximum(jnp.minimum(jm1(dp), dp), dpeps) * iv

    def apply(c):
        uf = qu * (im1(c) - c)
        vf = qv * (jm1(c) - c)
        div = (ip1(uf) - uf + jp1vv(vf) - vf)
        qi = 1.0 / (grid.scp2 * jnp.maximum(dp, dpeps))
        return (c - qi * div) * ip, uf, vf

    temp_new, utf, vtf = apply(s.temp[n])
    saln_new, usf, vsf = apply(s.saln[n])
    sigma_new = eos.sig(e, temp_new, saln_new) * ip

    s = dataclasses.replace(
        s,
        temp=s.temp.at[n].set(temp_new),
        saln=s.saln.at[n].set(saln_new),
        sigma=s.sigma.at[n].set(sigma_new),
        utflx=s.utflx.at[m].add(utf),
        vtflx=s.vtflx.at[m].add(vtf),
        usflx=s.usflx.at[m].add(usf),
        vsflx=s.vsflx.at[m].add(vsf))
    dfl = dataclasses.replace(dfl, utflld=utf, usflld=usf,
                              vtflld=vtf, vsflld=vsf)

    ntr = s.trc.shape[1]
    if ntr:
        trc_news = []
        for nt in range(ntr):
            tr_new, _, _ = apply(s.trc[n, nt])
            trc_news.append(tr_new)
        s = dataclasses.replace(
            s, trc=s.trc.at[n].set(jnp.stack(trc_news, axis=0)))
    return s, dfl
