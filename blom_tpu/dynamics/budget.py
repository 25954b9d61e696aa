"""Conservation budget diagnostics.

TPU-native re-design of the reference budget checks
(reference: /root/reference/phy/mod_budget.F90 — mass-weighted global
sums of dp, T, S at numbered checkpoints per step via the reproducible
xcsum, printed as deltas; gated by the cnsvdi namelist flag).

Sums are computed in f64 regardless of the state dtype with the
fixed-order strip hierarchy of parallel/repsum.py — bitwise identical
on any device mesh, the PE-invariance property of the reference's
xcsum (mod_xc.F90:2071-2192)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.grid import Grid
from ..core.state import State
from ..parallel.repsum import repsum_3d


class BudgetSums(NamedTuple):
    mass: jnp.ndarray   # sum dp*area [kg m s-2 * m2]
    heat: jnp.ndarray   # sum T*dp*area
    salt: jnp.ndarray   # sum S*dp*area


def budget_sums(grid: Grid, s: State, lvl: int) -> BudgetSums:
    """Global mass/heat/salt sums of time level `lvl`
    (budget_sums, mod_budget.F90:69-200), bit-reproducible across
    shardings (xcsum strip scheme)."""
    w = (grid.scp2 * grid.ip).astype(jnp.float64)
    dp = s.dp[lvl].astype(jnp.float64)
    mass = repsum_3d(dp * w)
    heat = repsum_3d(s.temp[lvl].astype(jnp.float64) * dp * w)
    salt = repsum_3d(s.saln[lvl].astype(jnp.float64) * dp * w)
    return BudgetSums(mass=mass, heat=heat, salt=salt)


def budget_deltas(b0: BudgetSums, b1: BudgetSums):
    """Relative budget changes between two checkpoints (budget_output,
    mod_budget.F90:202-356 prints the same deltas)."""
    return {
        'mass': float((b1.mass - b0.mass) / jnp.maximum(jnp.abs(b0.mass), 1.)),
        'heat': float((b1.heat - b0.heat) / jnp.maximum(jnp.abs(b0.heat), 1.)),
        'salt': float((b1.salt - b0.salt) / jnp.maximum(jnp.abs(b0.salt), 1.)),
    }
