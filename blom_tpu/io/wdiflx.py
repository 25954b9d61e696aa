"""Write diagnosed heat/salt relaxation flux climatologies.

TPU-native counterpart of the reference writer
(/root/reference/phy/mod_wdiflx.F90): dumps the 48-slice annual
accumulation produced by the ditflx/disflx options (see
phys/idarlx.diagnose_flux) so a later run can apply it via
aptflx/apsflx (phys/idarlx.load_flux_clim)."""

from __future__ import annotations

import numpy as np


def wdiflx(path: str, acc, count, varname: str):
    """Average the accumulated slices by their counts and save as an
    npz archive compatible with idarlx.load_flux_clim."""
    acc = np.asarray(acc)
    count = np.asarray(count).astype(np.float64)
    mean = acc / np.maximum(count[:, None, None], 1.)
    np.savez_compressed(path, **{varname: mean, varname + '_n': count})
    return mean
