"""Model state pytree and shared state operators.

TPU-native re-design of the reference's global state arrays
(reference: /root/reference/phy/mod_state.F90:34-93).  Differences from
the Fortran layout, chosen for XLA:

- struct-of-arrays pytree instead of module globals;
- the two leap-frog time levels are an explicit leading axis of size 2
  (the reference interleaves them as k+nn/k+mm slices of a 2*kdm axis);
- array layout is (time, k, j, i) with i innermost (TPU lanes);
- no halo ghost zones — neighbor access is by stencil shift/ppermute.

Time-level convention: Fortran slots (1, 2) map to indices (0, 1); the
step driver passes static python ints m, n with
m = nstep_pre % 2, n = (nstep_pre + 1) % 2 (mod_blom_step.F90:89-94).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .constants import epsilp
from .grid import Grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    """Prognostic + auxiliary model state.  Shapes: L=(2,) time levels,
    K=(kk,), KP=(kk+1,), H=(jdm, idm)."""

    # -- primary prognostic fields (mod_state.F90:34-47), (L, K, *H)
    u: jax.Array        # baroclinic u [m s-1]
    v: jax.Array        # baroclinic v [m s-1]
    dp: jax.Array       # layer pressure thickness [Pa]
    dpu: jax.Array      # dp at u-points [Pa]
    dpv: jax.Array      # dp at v-points [Pa]
    temp: jax.Array     # potential temperature [C]
    saln: jax.Array     # salinity [g kg-1]
    sigma: jax.Array    # potential density [kg m-3]
    uflx: jax.Array     # accumulated u mass flux [kg m s-2]
    vflx: jax.Array
    utflx: jax.Array    # heat fluxes
    vtflx: jax.Array
    usflx: jax.Array    # salt fluxes
    vsflx: jax.Array

    # -- interface pressures / geopotential (KP, *H) (mod_state.F90:50-54)
    p: jax.Array
    pu: jax.Array
    pv: jax.Array
    phi: jax.Array

    # -- advective flux areas (K, *H) (mod_state.F90:57-58)
    cau: jax.Array
    cav: jax.Array

    # -- barotropic state (mod_state.F90:60-84)
    ubflxs: jax.Array     # (3, *H) barotropic mass flux sums
    vbflxs: jax.Array
    ub: jax.Array         # (L, *H)
    vb: jax.Array
    pb: jax.Array
    pbu: jax.Array
    pbv: jax.Array
    ubflxs_p: jax.Array   # (L, *H) predicted flux sums
    vbflxs_p: jax.Array
    pb_p: jax.Array       # (*H) predicted bottom pressure
    pbu_p: jax.Array
    pbv_p: jax.Array
    ubcors_p: jax.Array   # (*H) predicted coriolis sums
    vbcors_p: jax.Array
    sealv: jax.Array      # (*H) sea level [m]

    # -- barotropic solver persistent state (mod_barotp.F90:60-71)
    ubflx: jax.Array      # (L, *H)
    vbflx: jax.Array
    pb_mn: jax.Array
    ubflx_mn: jax.Array
    vbflx_mn: jax.Array
    pvtrop: jax.Array     # (L, *H) barotropic potential vorticity at q

    # -- pressure-gradient force state (mod_pgforc.F90:52-80)
    pgfx: jax.Array       # (L, K, *H)
    pgfy: jax.Array
    pgfx_o: jax.Array     # (K, *H) old level
    pgfy_o: jax.Array
    pgfxm: jax.Array      # (L, *H)
    pgfym: jax.Array
    xixp: jax.Array
    xixm: jax.Array
    xiyp: jax.Array
    xiym: jax.Array
    pgfxm_o: jax.Array    # (*H)
    pgfym_o: jax.Array
    xixp_o: jax.Array
    xixm_o: jax.Array
    xiyp_o: jax.Array
    xiym_o: jax.Array

    # -- time-smoothing saves (mod_tmsmt.F90:54-68)
    dpold: jax.Array      # (L, K, *H)
    dpuold: jax.Array     # (K, *H)
    dpvold: jax.Array
    told: jax.Array
    sold: jax.Array

    # -- passive tracers (trc/mod_tracers.F90: trc, trcold)
    trc: jax.Array        # (L, ntr, K, *H)
    trcold: jax.Array     # (ntr, K, *H)

    # -- vertical-coordinate reference densities (mod_vcoord.F90 sigmar)
    sigmar: jax.Array     # (K, *H) layer reference potential density

    # -- misc
    kfpla: jax.Array      # (L, *H) int: first physical interior layer
    ustarb: jax.Array     # (*H) bottom friction velocity [m s-1]


def _z(shape, dtype):
    return jnp.zeros(shape, dtype)


def empty_state(grid: Grid, dtype=jnp.float64, ntr: int = 0) -> State:
    kk = grid.kk
    H = grid.shape
    L2K = (2, kk) + H
    K = (kk,) + H
    KP = (kk + 1,) + H
    L2 = (2,) + H
    L3 = (3,) + H
    return State(
        u=_z(L2K, dtype), v=_z(L2K, dtype), dp=_z(L2K, dtype),
        dpu=_z(L2K, dtype), dpv=_z(L2K, dtype), temp=_z(L2K, dtype),
        saln=_z(L2K, dtype), sigma=_z(L2K, dtype),
        uflx=_z(L2K, dtype), vflx=_z(L2K, dtype), utflx=_z(L2K, dtype),
        vtflx=_z(L2K, dtype), usflx=_z(L2K, dtype), vsflx=_z(L2K, dtype),
        p=_z(KP, dtype), pu=_z(KP, dtype), pv=_z(KP, dtype),
        phi=_z(KP, dtype),
        cau=_z(K, dtype), cav=_z(K, dtype),
        ubflxs=_z(L3, dtype), vbflxs=_z(L3, dtype),
        ub=_z(L2, dtype), vb=_z(L2, dtype), pb=_z(L2, dtype),
        pbu=_z(L2, dtype), pbv=_z(L2, dtype),
        ubflxs_p=_z(L2, dtype), vbflxs_p=_z(L2, dtype),
        pb_p=_z(H, dtype), pbu_p=_z(H, dtype), pbv_p=_z(H, dtype),
        ubcors_p=_z(H, dtype), vbcors_p=_z(H, dtype), sealv=_z(H, dtype),
        ubflx=_z(L2, dtype), vbflx=_z(L2, dtype), pb_mn=_z(L2, dtype),
        ubflx_mn=_z(L2, dtype), vbflx_mn=_z(L2, dtype), pvtrop=_z(L2, dtype),
        pgfx=_z(L2K, dtype), pgfy=_z(L2K, dtype),
        pgfx_o=_z(K, dtype), pgfy_o=_z(K, dtype),
        pgfxm=_z(L2, dtype), pgfym=_z(L2, dtype),
        xixp=_z(L2, dtype), xixm=_z(L2, dtype),
        xiyp=_z(L2, dtype), xiym=_z(L2, dtype),
        pgfxm_o=_z(H, dtype), pgfym_o=_z(H, dtype),
        xixp_o=_z(H, dtype), xixm_o=_z(H, dtype),
        xiyp_o=_z(H, dtype), xiym_o=_z(H, dtype),
        dpold=_z(L2K, dtype), dpuold=_z(K, dtype), dpvold=_z(K, dtype),
        told=_z(K, dtype), sold=_z(K, dtype),
        trc=_z((2, ntr, kk) + H, dtype), trcold=_z((ntr, kk) + H, dtype),
        sigmar=_z(K, dtype),
        kfpla=jnp.full(L2, 2, jnp.int32), ustarb=_z(H, dtype))


def cumulative_p(dp_k):
    """Interface pressures (kk+1, ...) from layer thicknesses (kk, ...)."""
    zero = jnp.zeros_like(dp_k[:1])
    return jnp.concatenate([zero, jnp.cumsum(dp_k, axis=0)], axis=0)


def dpu_dpv_upstream(grid: Grid, p_i):
    """Layer thickness at u and v points by the reference's depth-limited
    half-sum rule (mod_pgforc.F90:452-476 and mod_blom_init.F90:283-305):

      q = min(pbot(i), pbot(i-1))
      dpu(k) = .5*((min(q, p(i-1,k+1)) - min(q, p(i-1,k)))
                 + (min(q, p(i,  k+1)) - min(q, p(i,  k))))
    """
    pbot = p_i[-1]
    p_w = grid.im1(p_i)
    q = jnp.minimum(pbot, grid.im1(pbot))
    dpu = .5 * ((jnp.minimum(q, p_w[1:]) - jnp.minimum(q, p_w[:-1]))
                + (jnp.minimum(q, p_i[1:]) - jnp.minimum(q, p_i[:-1])))
    p_s = grid.jm1(p_i)
    q = jnp.minimum(pbot, grid.jm1(pbot))
    dpv = .5 * ((jnp.minimum(q, p_s[1:]) - jnp.minimum(q, p_s[:-1]))
                + (jnp.minimum(q, p_i[1:]) - jnp.minimum(q, p_i[:-1])))
    return dpu * grid.iu, dpv * grid.iv
