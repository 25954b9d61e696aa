"""Single-point diagnostic dump.

TPU-native counterpart of the reference debug module
(/root/reference/phy/mod_pointtest.F90:20-120): the reference prints
the full column state at a namelist-selected (itest, jtest) point on
whichever rank owns it; here `ptest` extracts the column from the
(possibly sharded) global arrays and formats it host-side.
"""

from __future__ import annotations

import numpy as np


def ptest(state, n: int, itest: int, jtest: int, grid=None) -> str:
    """Format the prognostic column at (jtest, itest) on time level n
    (ptest / ptest2, mod_pointtest.F90)."""
    out = [f'point test at (i={itest}, j={jtest}), time level {n}:']
    dp = np.asarray(state.dp[n, :, jtest, itest])
    t = np.asarray(state.temp[n, :, jtest, itest])
    s = np.asarray(state.saln[n, :, jtest, itest])
    u = np.asarray(state.u[n, :, jtest, itest])
    v = np.asarray(state.v[n, :, jtest, itest])
    out.append(f'{"k":>3} {"dp[m]":>12} {"temp":>10} {"saln":>10}'
               f' {"u":>10} {"v":>10}')
    for k in range(dp.shape[0]):
        out.append(f'{k:3d} {dp[k] / 9806.:12.6f} {t[k]:10.5f}'
                   f' {s[k]:10.5f} {u[k]:10.6f} {v[k]:10.6f}')
    out.append(f'pb={float(np.asarray(state.pb[n, jtest, itest])):.6e}'
               f' ub={float(np.asarray(state.ub[n, jtest, itest])):.6e}'
               f' vb={float(np.asarray(state.vb[n, jtest, itest])):.6e}')
    if grid is not None:
        out.append(f'depth={float(np.asarray(grid.depths[jtest, itest])):.2f} m'
                   f' ip={int(np.asarray(grid.ip[jtest, itest]))}')
    return '\n'.join(out)
