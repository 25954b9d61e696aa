"""Layer thickness and tracer advection driver.

TPU-native re-design of the advection dispatch
(reference: /root/reference/phy/mod_advect.F90:59-189 advect).  Computes
CFL-clamped flux areas cau/cav from mid-level baroclinic velocity,
predicted barotropic transport and eddy/submesoscale transports
(mod_advect.F90:71-94), then runs either the CPPM Strang-split sweeps
(advmth='cppm') or incremental remapping (advmth='remap',
mod_advect.F90:96-153)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.constants import onemm, epsilpl
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from .cppm import CppmCoeffs, cppm_sweep, dpeps
from .diffusion_fields import DiffusionFields


def advect(grid: Grid, s: State, dfl: DiffusionFields,
           coeffs_i: CppmCoeffs, coeffs_j: CppmCoeffs,
           m: int, n: int, delt1, dlt,
           advmth: str = 'cppm',
           cppm_compatibility: str = 'full',
           cppm_limiting: str = 'non_oscillatory') -> State:
    iu, iv, ip = grid.iu, grid.iv, grid.ip

    # ---- flux areas (mod_advect.F90:71-94)
    dtdl_u = delt1 * grid.scuy
    ca_u = (s.u[m] * dtdl_u
            + s.ubflxs_p[m] * dlt / jnp.maximum(s.pbu[m], epsilpl)
            + (dfl.umfltd[m] + dfl.umflsm[m])
            / jnp.maximum(onemm, s.dpu[n]))
    cau = jnp.clip(ca_u, -grid.umax * dtdl_u, grid.umax * dtdl_u) * iu

    dtdl_v = delt1 * grid.scvx
    ca_v = (s.v[m] * dtdl_v
            + s.vbflxs_p[m] * dlt / jnp.maximum(s.pbv[m], epsilpl)
            + (dfl.vmfltd[m] + dfl.vmflsm[m])
            / jnp.maximum(onemm, s.dpv[n]))
    cav = jnp.clip(ca_v, -grid.vmax * dtdl_v, grid.vmax * dtdl_v) * iv

    s = dataclasses.replace(s, cau=cau, cav=cav)

    if advmth == 'remap':
        if grid.arctic:
            raise NotImplementedError(
                "advmth='remap' does not support tripolar grids yet; "
                "use advmth='cppm' (fold-aware j-sweeps)")
        return _advect_remap(grid, s, m, n)

    # ---- CPPM Strang-split sweeps (mod_cppm.F90:2748-2834): i first on
    # odd steps; with m = (nstep+1) % 2, odd nstep <=> m == 0.
    i_first = (m == 0)

    # interface pressures of the pre-advection state (used by
    # flux_integration's bottom-limited reconstruction)
    p = cumulative_p(s.dp[n]) * ip

    ntr = s.trc.shape[1]
    tm = jnp.concatenate([s.temp[n][None], s.saln[n][None], s.trc[n]], axis=0)
    h = s.dp[n]

    uflx_acc = jnp.zeros_like(h)
    vflx_acc = jnp.zeros_like(h)
    utflx_acc = jnp.zeros_like(h)
    usflx_acc = jnp.zeros_like(h)
    vtflx_acc = jnp.zeros_like(h)
    vsflx_acc = jnp.zeros_like(h)

    def sweep_i(h, tm, second):
        div = None
        if second:
            div = (grid.jp1(cav, 'v', True) - cav)
        hn, tmn, hf, htf = cppm_sweep(
            h, tm, cau, s.pbu[n], p[:-1], p[1:], grid.scp2i,
            coeffs_i, grid.periodic_i, div_corr=div,
            compatibility=cppm_compatibility, limiting=cppm_limiting)
        return hn, tmn, hf, htf

    def sweep_j(h, tm, second):
        # the same 1-D kernel running along the j axis in natural
        # layout (cppm_sweep(ax=-2)) — the reference's *_j kernels
        # permute (j, i); here the axis-generic shifts make permuting
        # (and its 12 full-array transposes per step) unnecessary.
        # On tripolar grids the sweep domain is extended by fold ghost
        # rows so the stencil reads across the bipolar seam (the
        # reference's (0,3) halo update, mod_cppm.F90:1956-1960).
        if grid.arctic:
            from ..parallel.arctic import fold_row
            from .cppm import NGHOST_ARCTIC

            def ext(a, kind, vector=False):
                gh = [fold_row(a, kind, vector, mm)[..., None, :]
                      for mm in range(NGHOST_ARCTIC)]
                return jnp.concatenate([a] + gh, axis=-2)
        else:
            def ext(a, kind, vector=False):
                return a

        jdm = h.shape[-2]
        div = None
        if second:
            div = ext(grid.ip1(cau) - cau, 'p')
        hn, tmn, hf, htf = cppm_sweep(
            ext(h, 'p'), ext(tm, 'p'), ext(cav, 'v', True),
            ext(s.pbv[n], 'v'), ext(p[:-1], 'p'),
            ext(p[1:], 'p'), ext(grid.scp2i, 'p'), coeffs_j,
            grid.periodic_j, div_corr=div,
            compatibility=cppm_compatibility, limiting=cppm_limiting,
            ax=-2)
        return (hn[..., :jdm, :], tmn[..., :jdm, :],
                hf[..., :jdm, :], htf[..., :jdm, :])

    if i_first:
        h1, tm1, hfu, htfu = sweep_i(h, tm, False)
        h1 = jnp.maximum(0., h1 - dpeps) * ip
        h2, tm2, hfv, htfv = sweep_j(h1, tm1, True)
        h2 = jnp.maximum(0., h2 - dpeps) * ip
    else:
        h1, tm1, hfv, htfv = sweep_j(h, tm, False)
        h1 = jnp.maximum(0., h1 - dpeps) * ip
        h2, tm2, hfu, htfu = sweep_i(h1, tm1, True)
        h2 = jnp.maximum(0., h2 - dpeps) * ip

    uflx_acc = uflx_acc + hfu
    utflx_acc = utflx_acc + htfu[0]
    usflx_acc = usflx_acc + htfu[1]
    vflx_acc = vflx_acc + hfv
    vtflx_acc = vtflx_acc + htfv[0]
    vsflx_acc = vsflx_acc + htfv[1]

    s = dataclasses.replace(s, trc=s.trc.at[n].set(tm2[2:] * ip))
    return dataclasses.replace(
        s,
        dp=s.dp.at[n].set(h2),
        temp=s.temp.at[n].set(tm2[0] * ip),
        saln=s.saln.at[n].set(tm2[1] * ip),
        uflx=s.uflx.at[m].add(uflx_acc * iu),
        vflx=s.vflx.at[m].add(vflx_acc * iv),
        utflx=s.utflx.at[m].add(utflx_acc * iu),
        usflx=s.usflx.at[m].add(usflx_acc * iu),
        vtflx=s.vtflx.at[m].add(vtflx_acc * iv),
        vsflx=s.vsflx.at[m].add(vsflx_acc * iv))


def _advect_remap(grid: Grid, s: State, m: int, n: int) -> State:
    """Incremental-remapping branch (mod_advect.F90:96-153): 9-point
    minimum bottom pressure with wet-neighbour fallbacks, then a
    per-layer remap (vmapped over k)."""
    from .remap import remap_layer

    ip = grid.ip
    pbot = cumulative_p(s.dp[n])[-1]

    # pbmin: 9-point min with land fallback to centre
    # (mod_advect.F90:103-119)
    w_ok = grid.iu > 0.
    e_ok = grid.ip1(grid.iu) > 0.
    s_ok = grid.iv > 0.
    n_ok = grid.jp1(grid.iv, 'v') > 0.

    def nb(a, di, dj, iok, jok):
        cand = grid.shift(a, di, dj)
        wet = grid.shift(ip, di, dj) > 0.
        return jnp.where(iok & jok & wet, cand, a)

    pbmin = pbot
    for (di, dj, iok, jok) in [
            (-1, 0, w_ok, True), (1, 0, e_ok, True),
            (0, -1, True, s_ok), (0, 1, True, n_ok),
            (-1, -1, w_ok, s_ok), (1, -1, e_ok, s_ok),
            (-1, 1, w_ok, n_ok), (1, 1, e_ok, n_ok)]:
        iok_ = iok if not isinstance(iok, bool) else jnp.ones_like(w_ok)
        jok_ = jok if not isinstance(jok, bool) else jnp.ones_like(w_ok)
        pbmin = jnp.minimum(pbmin, nb(pbot, di, dj, iok_, jok_))

    p_i = cumulative_p(s.dp[n])
    tr = jnp.concatenate([s.temp[n][None], s.saln[n][None], s.trc[n]],
                         axis=0)

    def one_layer(plo_k, cau_k, cav_k, dp_k, tr_k):
        return remap_layer(grid, pbmin, s.pbu[n], s.pbv[n], plo_k,
                           cau_k, cav_k, dp_k, tr_k)

    dp_new, tr_new, fdu, fdv, ftru, ftrv = jax.vmap(
        one_layer, in_axes=(0, 0, 0, 0, 1))(
        p_i[1:], s.cau, s.cav, s.dp[n], tr)

    # vmap puts k first: tr_new is (K, ntr, J, I)
    s = dataclasses.replace(
        s, trc=s.trc.at[n].set(tr_new[:, 2:].swapaxes(0, 1) * ip))
    return dataclasses.replace(
        s,
        dp=s.dp.at[n].set(dp_new),
        temp=s.temp.at[n].set(tr_new[:, 0] * ip),
        saln=s.saln.at[n].set(tr_new[:, 1] * ip),
        uflx=s.uflx.at[m].add(fdu * grid.iu),
        vflx=s.vflx.at[m].add(fdv * grid.iv),
        utflx=s.utflx.at[m].add(ftru[:, 0] * grid.iu),
        usflx=s.usflx.at[m].add(ftru[:, 1] * grid.iu),
        vtflx=s.vtflx.at[m].add(ftrv[:, 0] * grid.iv),
        vsflx=s.vsflx.at[m].add(ftrv[:, 1] * grid.iv))
