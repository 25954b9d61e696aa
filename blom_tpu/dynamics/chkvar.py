"""NaN/Inf guard on prognostic fields.

TPU-native re-design of the reference per-step sanity check
(reference: /root/reference/phy/mod_chkvar.F90 — every step, dp/T/S are
scanned for non-finite or out-of-range values and the model aborts with
the offending grid location).

`chkvar` returns a device-side report; `chkvar_host` raises with
locations (host-side, for driver loops).  Inside jit, combine with
jax.debug.print or equinox-style error patterns as needed."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.state import State


def chkvar(grid: Grid, s: State, lvl: int):
    """Device-side check: returns (ok, bad_count_per_field)."""
    checks = {
        'dp': (s.dp[lvl], 0.0 - 1e-6, 1e9),
        'temp': (s.temp[lvl], -3., 50.),
        'saln': (s.saln[lvl], -1e-9, 100.),
    }
    bad = {}
    ok = jnp.asarray(True)
    for name, (a, lo, hi) in checks.items():
        mask = grid.ip > 0
        isbad = (~jnp.isfinite(a) | (a < lo) | (a > hi)) & mask
        bad[name] = jnp.sum(isbad)
        ok = ok & (bad[name] == 0)
    return ok, bad


def chkvar_host(grid: Grid, s: State, lvl: int, nstep=None):
    """Host-side check that raises with grid locations on failure
    (mod_chkvar.F90's located abort)."""
    ok, bad = chkvar(grid, s, lvl)
    if bool(ok):
        return
    msgs = []
    for name in bad:
        a = np.asarray(getattr(s, name)[lvl])
        m = ~np.isfinite(a) | (np.asarray(grid.ip) <= 0) * False
        m = ~np.isfinite(a)
        if name == 'temp':
            m |= (a < -3.) | (a > 50.)
        if name == 'saln':
            m |= (a < -1e-9) | (a > 100.)
        if name == 'dp':
            m |= a < -1e-6
        m &= np.asarray(grid.ip)[None] > 0
        if m.any():
            k, j, i = np.argwhere(m)[0]
            msgs.append(f'{name}[k={k}, j={j}, i={i}] = {a[k, j, i]!r}')
    raise FloatingPointError(
        f'chkvar: non-finite/out-of-range state at step {nstep}: '
        + '; '.join(msgs))
