"""Near-inertial wave kinetic-energy tendency.

TPU-native counterpart of the reference module
(/root/reference/phy/mod_niw.F90:20-254): tracks resolved mixed-layer
(2-layer) total velocities, removes a running inertial-period average
via an exponential reservoir, and diagnoses the vertically integrated
inertial kinetic-energy tendency `idkedt` used by the diffusivity
estimators as a near-inertial energy source.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.state import State

IPFAC = 2.              # inertial periods in the averaging window
CORI10 = 2.5256e-5      # Coriolis parameter at 10N [1/s]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NiwState:
    """(2 time levels, 2 ML layers, J, I) velocities + reservoirs
    (mod_niw.F90:43-52)."""
    uml: jax.Array      # (2, 2, J, I) previous total ML u
    vml: jax.Array
    umlres: jax.Array   # (2, J, I) running-average reservoirs
    vmlres: jax.Array
    idkedt: jax.Array   # (J, I) integrated inertial KE tendency


def init_niw(shape, dtype=jnp.float64) -> NiwState:
    H = tuple(shape)
    return NiwState(uml=jnp.zeros((2, 2) + H, dtype),
                    vml=jnp.zeros((2, 2) + H, dtype),
                    umlres=jnp.zeros((2,) + H, dtype),
                    vmlres=jnp.zeros((2,) + H, dtype),
                    idkedt=jnp.zeros(H, dtype))


def _component(res, vml_prev, vtot, cor, delt1):
    """Reservoir update + KE-difference for one layer of one component
    (mod_niw.F90:130-160)."""
    q = delt1 * jnp.maximum(CORI10, jnp.abs(cor)) / (IPFAC * 2. * jnp.pi)
    res = res + vtot
    vavg = res * q
    res = res * (1. - q)
    dke = (vtot - vavg) ** 2 - (vml_prev - vavg) ** 2
    return res, vavg, dke


def niw_ke_tendency(grid: Grid, s: State, niw: NiwState, m: int,
                    delt1, dlt) -> NiwState:
    """Diagnose idkedt and advance the NIW averaging state
    (niw_ke_tendency, mod_niw.F90:117-254)."""
    coru = .5 * (grid.coriop + grid.im1(grid.coriop))
    corv = .5 * (grid.coriop + grid.jm1(grid.coriop))

    ubt = s.ubflxs_p[m] * dlt / (delt1 * grid.scuy
                                 * jnp.maximum(s.pbu[m], 1.e-12))
    vbt = s.vbflxs_p[m] * dlt / (delt1 * grid.scvx
                                 * jnp.maximum(s.pbv[m], 1.e-12))

    umlres, vmlres = niw.umlres, niw.vmlres
    util1 = jnp.zeros_like(niw.idkedt)
    util2 = jnp.zeros_like(niw.idkedt)
    uml_new = niw.uml
    vml_new = niw.vml
    for kl in range(2):
        utot = s.u[m, kl] + ubt
        res, uavg, dkeu = _component(umlres[kl], niw.uml[m, kl], utot,
                                     coru, delt1)
        umlres = umlres.at[kl].set(res)
        util1 = util1 + dkeu * s.dpu[m, kl]
        uml_new = uml_new.at[m, kl].set(utot)

        vtot = s.v[m, kl] + vbt
        res, vavg, dkev = _component(vmlres[kl], niw.vml[m, kl], vtot,
                                     corv, delt1)
        vmlres = vmlres.at[kl].set(res)
        util2 = util2 + dkev * s.dpv[m, kl]
        vml_new = vml_new.at[m, kl].set(vtot)

    util1 = util1 * grid.iu
    util2 = util2 * grid.iv
    # p-point average of the u/v KE tendencies (mod_niw.F90:198-210)
    nu = jnp.maximum(1., grid.iu + grid.ip1(grid.iu))
    nv = jnp.maximum(1., grid.iv + grid.jp1(grid.iv, 'v'))
    idkedt = (jnp.abs((util1 + grid.ip1(util1)) / nu)
              + jnp.abs((util2 + grid.jp1(util2, 'v', True)) / nv)) * grid.ip

    return dataclasses.replace(niw, uml=uml_new, vml=vml_new,
                               umlres=umlres, vmlres=vmlres,
                               idkedt=idkedt)
