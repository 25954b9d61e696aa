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
from ..parallel.repsum import repsum_2d


class BudgetSums(NamedTuple):
    mass: jnp.ndarray   # sum dp*area [kg m s-2 * m2]
    heat: jnp.ndarray   # sum T*dp*area
    salt: jnp.ndarray   # sum S*dp*area


def budget_col_sums(grid: Grid, s: State, lvl: int):
    """Column-collapsed (ascending-k chained, f64) mass/heat/salt
    weights — the block-local half of budget_sums.  Pointwise in
    (j, i), so it runs unchanged inside shard_map; repsum_2d of the
    assembled global fields then reproduces budget_sums BITWISE (the
    k-chain order is identical per element regardless of sharding)."""
    w = (grid.scp2 * grid.ip).astype(jnp.float64)
    dp = s.dp[lvl].astype(jnp.float64)

    def kchain(a):
        col = a[0]
        for k in range(1, a.shape[0]):
            col = col + a[k]
        return col

    return {'mass': kchain(dp * w),
            'heat': kchain(s.temp[lvl].astype(jnp.float64) * dp * w),
            'salt': kchain(s.saln[lvl].astype(jnp.float64) * dp * w)}


def budget_sums_from_cols(col) -> BudgetSums:
    """Finish budget sums from (global) column-collapsed fields with
    the xcsum strip hierarchy."""
    return BudgetSums(mass=repsum_2d(col['mass']),
                      heat=repsum_2d(col['heat']),
                      salt=repsum_2d(col['salt']))


def budget_sums(grid: Grid, s: State, lvl: int) -> BudgetSums:
    """Global mass/heat/salt sums of time level `lvl`
    (budget_sums, mod_budget.F90:69-200), bit-reproducible across
    shardings (xcsum strip scheme)."""
    return budget_sums_from_cols(budget_col_sums(grid, s, lvl))


def budget_deltas(b0: BudgetSums, b1: BudgetSums):
    """Relative budget changes between two checkpoints (budget_output,
    mod_budget.F90:202-356 prints the same deltas)."""
    return {
        'mass': float((b1.mass - b0.mass) / jnp.maximum(jnp.abs(b0.mass), 1.)),
        'heat': float((b1.heat - b0.heat) / jnp.maximum(jnp.abs(b0.heat), 1.)),
        'salt': float((b1.salt - b0.salt) / jnp.maximum(jnp.abs(b0.salt), 1.)),
    }
