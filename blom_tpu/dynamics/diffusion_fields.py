"""Lateral diffusion / eddy-transport parameter fields.

TPU-native equivalent of the reference diffusion storage
(reference: /root/reference/phy/mod_diffusion.F90 declares eddy
diffusivities difint/difiso/difdia, the Rossby-radius resolution weight
difwgt, GM bolus mass fluxes umfltd/vmfltd and submesoscale transports
umflsm/vmflsm).  Filled by difest/eddtra each step; zero-initialized,
which reproduces the fuk95 deck (EGC=0 -> zero interior diffusivity,
tests/fuk95/limits:316)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiffusionFields:
    difint: jax.Array   # (K, H) layer interface diffusivity [m2 s-1]
    difiso: jax.Array   # (K, H) isopycnal diffusivity [m2 s-1]
    difdia: jax.Array   # (K, H) diapycnal diffusivity [m2 s-1]
    difwgt: jax.Array   # (H) Rossby-radius resolution weight []
    umfltd: jax.Array   # (2, K, H) GM eddy-induced mass flux [kg m s-2]
    vmfltd: jax.Array
    umflsm: jax.Array   # (2, K, H) submesoscale mass flux [kg m s-2]
    vmflsm: jax.Array
    # vertical mixing coefficients stored for diagnostics (the
    # reference's difvho/difvso/difvmo of mod_diffusion.F90, filled
    # from CVMix/KPP each step; H2D/LYR/LVL_DIFV* ids of mod_dia.F90)
    difvho: jax.Array   # (K, H) vertical heat diffusivity [m2 s-1]
    difvso: jax.Array   # (K, H) vertical salt diffusivity [m2 s-1]
    difvmo: jax.Array   # (K, H) vertical momentum viscosity [m2 s-1]
    # bulk mixed layer TKE budget terms [m3 s-3] (mod_mxlayr.F90
    # mtkeus/mtkeni/mtkebf/mtkers/mtkepe/mtkeke; H2D_MTKE* diagnostics)
    mtke: jax.Array     # (6, H): us, ni, bf, rs, pe, ke
    # KPP/vmix boundary-layer (mixed-layer) depth [m] for the H2D_BLD/
    # MAXBLD diagnostics (mod_difest.F90 bldepth)
    bld: jax.Array      # (H)
    # isopycnal-diffusion heat/salt fluxes (mod_diffusion.F90:150-190
    # utflld/usflld/vtflld/vsflld; filled by dynamics.diffus)
    utflld: jax.Array   # (K, H)
    usflld: jax.Array
    vtflld: jax.Array
    vsflld: jax.Array


def zero_diffusion_fields(kk: int, shape, dtype=jnp.float64):
    H = tuple(shape)
    zk = jnp.zeros((kk,) + H, dtype)
    z2k = jnp.zeros((2, kk) + H, dtype)
    return DiffusionFields(
        difint=zk, difiso=zk, difdia=zk,
        difwgt=jnp.ones(H, dtype),
        umfltd=z2k, vmfltd=z2k, umflsm=z2k, vmflsm=z2k,
        difvho=zk, difvso=zk, difvmo=zk,
        mtke=jnp.zeros((6,) + H, dtype),
        bld=jnp.zeros(H, dtype),
        utflld=zk, usflld=zk, vtflld=zk, vsflld=zk)
