"""Neutral diffusion of tracers (ltedtp = 'neutral').

TPU-native re-design of the reference neutral-diffusion module
(reference: /root/reference/phy/mod_ndiff.F90 — ndiff_prep_jslice,
ndiff_uflx_jslice:1028-1088, ndiff_vflx_jslice:1090-1150,
ndiff_update_trc_jslice:1152-1175, core pair-flux ndiff_flx:160-953).

The reference walks the two columns adjacent to each velocity edge with
a sequential two-pointer search for neutral interfaces (pressures where
the linearized density difference between the columns vanishes,
drho = drhodt*(T1-T2) + drhods*(S1-S2), mod_ndiff.F90:150-158), then
exchanges tracer between neutrally-matched sublayers.  A data-dependent
while-loop over interface pairs cannot map to the MXU/VPU, so this
implementation re-poses the search densely: for every *source layer
center* of one column we locate the neutrally-matched position in the
neighbor column as the sign crossing of the monotone (in k) density
difference profile — an argmax + linear interpolation over the k axis —
and exchange tracer between the layer and its matched position,
depositing conservatively into the (at most two) containing layers.
This is a `lax.scan` over source layers with O(kk) dense (kk, j, i)
work per step: O(kk^2) elementwise total, no gathers beyond
k-axis `take_along_axis`, no data-dependent trip counts.

Surface alignment (ndiff_surface_align, mod_ndiff.F90:236-258): within
the mixed layer the reference aligns diffusion surfaces with the free
surface; here layers whose center lies above the edge-mean mixed-layer
pressure match in *pressure* space instead of density space — the same
crossing search with a different difference profile.

Both directed exchanges (A→B matched into B, B→A matched into A) are
computed and halved, which keeps the operator symmetric and exactly
conservative.  Stability: the per-layer exchange is clamped to 1/4 of
the mass of every participating layer (explicit-diffusion limit, the
role of the reference's flux limiting in ndiff_flx).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import eos
from ..core.constants import onemm
from ..core.grid import Grid
from ..core.state import State, cumulative_p
from .diffusion_fields import DiffusionFields

dp_eps = 1.e-5      # (mod_ndiff.F90:44 dp_eps)
rho_eps = 1.e-5     # (mod_ndiff.F90:43 rho_eps)


def _pair_exchange(C_a, T_a, S_a, h_a, pc_a, dt_a, ds_a,
                   C_b, T_b, S_b, h_b, pc_b, dt_b, ds_b,
                   q_edge, area_a, area_b, pml_edge):
    """One-directional neutral exchange: every layer of column A finds
    its neutrally matched position in column B.

    All column arrays are (kk, H) on the edge grid (H = (j, i) plane);
    C_* are (nc, kk, H) tracer stacks; q_edge is the per-layer edge
    exchange coefficient (kk, H).  Returns (dC_a, dC_b, uf):
    concentration increments for both columns and the per-A-layer
    diagnostic tracer fluxes (nc, kk, H), positive A->B.
    """
    kk = h_a.shape[0]
    nc = C_a.shape[0]
    valid_b = h_b > onemm
    kidx = jax.lax.broadcasted_iota(jnp.int32, h_b.shape, 0)

    def body(acc_b, xs):
        pc_ak, h_ak, T_ak, S_ak, dt_ak, ds_ak, q_edge_k, C_ak = xs

        # density difference of A's layer center vs every B layer
        # center, linearized with averaged derivatives (drho,
        # mod_ndiff.F90:150-158)
        drho = (.5 * (dt_ak[None] + dt_b) * (T_ak[None] - T_b)
                + .5 * (ds_ak[None] + ds_b) * (S_ak[None] - S_b))
        # surface-aligned layers match in pressure space instead
        aligned = pc_ak < pml_edge
        dvec = jnp.where(aligned[None], pc_ak[None] - pc_b, drho)
        # exclude massless B layers from the match
        big = jnp.asarray(1.e30, dvec.dtype)
        dvec = jnp.where(valid_b, dvec, -big)

        # first sign change from the top: j* and j*+1 bracket the match
        neg = dvec < 0.
        firstneg = jnp.argmax(neg, axis=0).astype(jnp.int32)
        anyneg = jnp.any(neg, axis=0)
        jneg = jnp.where(anyneg, firstneg, kk - 1)
        jstar = jnp.maximum(jneg - 1, 0)
        d0 = jnp.take_along_axis(dvec, jstar[None], 0)[0]
        d1 = jnp.take_along_axis(dvec, jneg[None], 0)[0]
        denom = d0 - d1
        w = jnp.where(jnp.abs(denom) > rho_eps * 1e-3,
                      jnp.clip(d0 / jnp.where(denom == 0., 1., denom),
                               0., 1.),
                      1.)
        # A denser than all of B -> match B bottom; lighter than all
        # -> jneg = jstar = 0 handled by the clip/denominator guard
        w = jnp.where(anyneg, w, 1.)

        def matched(x):
            x0 = jnp.take_along_axis(x, jstar[None], 0)[0]
            x1 = jnp.take_along_axis(x, jneg[None], 0)[0]
            return (1. - w) * x0 + w * x1

        h_bm = matched(h_b)
        C_bm = jax.vmap(matched)(C_b)                      # (nc, H)

        # exchange mass coefficient, clamped for explicit stability
        # against every participating layer's mass
        h0 = jnp.take_along_axis(h_b, jstar[None], 0)[0]
        h1 = jnp.take_along_axis(h_b, jneg[None], 0)[0]
        q = q_edge_k * jnp.maximum(jnp.minimum(h_ak, h_bm), dp_eps)
        q = jnp.minimum(q, .25 * area_a * h_ak)
        q = jnp.minimum(q, .25 * area_b * h0
                        / jnp.maximum(1. - w, 1e-6))
        q = jnp.minimum(q, .25 * area_b * h1 / jnp.maximum(w, 1e-6))
        q = jnp.maximum(q, 0.)

        f = q[None] * (C_ak - C_bm)                        # (nc, H)

        # conservative deposit into the two containing B layers
        oh = ((kidx == jstar[None]) * (1. - w)[None]
              + (kidx == jneg[None]) * w[None])            # (kk, H)
        acc_b = acc_b + oh[None] * f[:, None]
        return acc_b, f

    acc0 = jnp.zeros_like(C_b)
    acc_b, uf = jax.lax.scan(
        body, acc0,
        (pc_a, h_a, T_a, S_a, dt_a, ds_a, q_edge,
         jnp.moveaxis(C_a, 0, 1)))
    uf = jnp.moveaxis(uf, 1, 0)                            # (nc, kk, H)

    dC_a = -uf / (area_a * jnp.maximum(h_a, dp_eps))[None]
    dC_b = acc_b / (area_b * jnp.maximum(h_b, dp_eps))[None]
    return dC_a, dC_b, uf


def _direction_pass(grid: Grid, C, T, S, h, pc, drt, drs, pml,
                    shift_m, shift_p, q_edge, area):
    """Neutral exchange across one edge family.  shift_m maps cell
    fields onto the edge's minus-side column (e.g. grid.im1);
    shift_p shifts edge quantities back onto cells (e.g. grid.ip1).
    Returns (dC, uf): total concentration increment per cell and the
    symmetrized diagnostic flux (nc, kk, H) at the edge."""
    area_m = shift_m(area)
    pml_edge = .5 * (shift_m(pml) + pml)

    dAm, dBm, uf_ab = _pair_exchange(
        shift_m(C), shift_m(T), shift_m(S), shift_m(h), shift_m(pc),
        shift_m(drt), shift_m(drs),
        C, T, S, h, pc, drt, drs,
        q_edge, area_m, area, pml_edge)
    dBp, dAp, uf_ba = _pair_exchange(
        C, T, S, h, pc, drt, drs,
        shift_m(C), shift_m(T), shift_m(S), shift_m(h), shift_m(pc),
        shift_m(drt), shift_m(drs),
        q_edge, area, area_m, pml_edge)

    # symmetrize the two directed exchanges
    dC_minus = .5 * (dAm + dAp)      # increments on the minus-side cell
    dC_plus = .5 * (dBm + dBp)       # increments on this cell
    dC = dC_plus + shift_p(dC_minus)
    uf = .5 * (uf_ab - uf_ba)
    return dC, uf


def ndiff(grid: Grid, e: eos.EosParams, s: State, dfl: DiffusionFields,
          m: int, n: int, delt1, mld_p) -> State:
    """Neutral diffusion of T, S and passive tracers (the ltedtp =
    'neutral' path; reference driver mod_ale_regrid_remap.F90:1643-1670
    calling mod_ndiff.F90 jslice routines).

    mld_p: mixed-layer pressure (H,) for surface alignment."""
    ip, iu, iv = grid.ip, grid.iu, grid.iv
    dp = s.dp[n]
    temp, saln = s.temp[n], s.saln[n]

    p = cumulative_p(dp) * ip
    pc = p[:-1] + .5 * dp                        # layer-center pressure
    drt = eos.drhodt(pc, temp, saln)
    drs = eos.drhods(pc, temp, saln)

    ntr = s.trc.shape[1]
    C = jnp.concatenate(
        [temp[None], saln[None]]
        + ([s.trc[n]] if ntr else []), axis=0)   # (nc, kk, H)

    qu = delt1 * .5 * (grid.im1(dfl.difiso) + dfl.difiso) \
        * grid.scuy * grid.scuxi * iu
    qv = delt1 * .5 * (grid.jm1(dfl.difiso) + dfl.difiso) \
        * grid.scvx * grid.scvyi * iv

    dCx, ufx = _direction_pass(grid, C, temp, saln, dp, pc, drt, drs,
                               mld_p, grid.im1, grid.ip1, qu, grid.scp2)
    jp1p = lambda a: grid.jp1(a, 'p')   # noqa: E731 (fold-aware)
    dCy, vfy = _direction_pass(grid, C, temp, saln, dp, pc, drt, drs,
                               mld_p, grid.jm1, jp1p, qv, grid.scp2)

    C_new = (C + dCx + dCy) * ip[None]
    temp_new, saln_new = C_new[0], C_new[1]
    sigma_new = eos.sig(e, temp_new, saln_new) * ip

    s = dataclasses.replace(
        s,
        temp=s.temp.at[n].set(temp_new),
        saln=s.saln.at[n].set(saln_new),
        sigma=s.sigma.at[n].set(sigma_new),
        utflx=s.utflx.at[m].add(ufx[0]),
        vtflx=s.vtflx.at[m].add(vfy[0]),
        usflx=s.usflx.at[m].add(ufx[1]),
        vsflx=s.vsflx.at[m].add(vfy[1]))
    if ntr:
        s = dataclasses.replace(s, trc=s.trc.at[n].set(C_new[2:]))
    return s
