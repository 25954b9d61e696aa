"""Shortwave absorption profiles.

TPU-native re-design of the reference shortwave module
(reference: /root/reference/phy/mod_swabs.F90).  Implements the 'jerlov'
method: Paulson & Simpson (1977) double-exponential fit to Jerlov (1968)
water types (ps77 tables, mod_swabs.F90:95-107) and the 'top-layer'
method; chlorophyll-based methods are a later round."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

swamxd = 200.       # max shortwave penetration depth [m] (mod_swabs.F90:183)

# Jerlov water types I, IA, IB, II, III (mod_swabs.F90:104-107)
ps77_irfc = (.58, .62, .67, .77, .78)
ps77_al1 = (.35, .60, 1.00, 1.50, 1.40)
ps77_al2 = (23.00, 20.00, 17.00, 14.00, 7.90)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SwabsFields:
    """Absorption profile E(z)/E(0) = swfc1*exp(-z/swal1)
    + swfc2*exp(-z/swal2) (mod_swabs.F90:27-33); all (jdm, idm)."""
    swfc1: jax.Array
    swfc2: jax.Array
    swal1: jax.Array    # [m]
    swal2: jax.Array    # [m]


def init_swabs(shape, swamth: str = 'jerlov', jwtype: int = 3,
               dtype=jnp.float64) -> SwabsFields:
    ones = jnp.ones(shape, dtype)
    if swamth == 'jerlov':
        fc1 = ps77_irfc[jwtype - 1]
        return SwabsFields(swfc1=ones * fc1, swfc2=ones * (1. - fc1),
                           swal1=ones * ps77_al1[jwtype - 1],
                           swal2=ones * ps77_al2[jwtype - 1])
    if swamth == 'top-layer':
        # zero penetration below the surface: everything absorbed in the
        # top layer (mod_swabs.F90:236-244)
        return SwabsFields(swfc1=ones * 0., swfc2=ones * 0.,
                           swal1=ones * swamxd, swal2=ones * swamxd)
    raise NotImplementedError(f'swamth={swamth!r}')
