"""Ideal-age tracer.

TPU-native re-design of the reference ideal-age module
(reference: /root/reference/idlage/mod_idlage.F90): zero age in the
surface layer, ages by delt1 below, advected/diffused like any tracer."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.state import State


def idlage_init(s: State, itriag: int) -> State:
    """Zero the ideal-age tracer (idlage_init, mod_idlage.F90:33-54)."""
    return dataclasses.replace(
        s, trc=s.trc.at[:, itriag].set(0.0))


def idlage_step(s: State, itriag: int, n: int, delt1,
                nday_in_year: float = 360.) -> State:
    """Age update (idlage_step, mod_idlage.F90:56-97): surface layer
    reset to zero, subsurface layers aged by delt1 (in years)."""
    q = delt1 / (86400. * nday_in_year)
    age = s.trc[n, itriag]
    age = age.at[0].set(0.0)
    age = age.at[1:].add(q)
    return dataclasses.replace(s, trc=s.trc.at[n, itriag].set(age))
