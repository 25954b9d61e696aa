"""Surface forcing fields.

TPU-native equivalent of the reference forcing storage
(reference: /root/reference/phy/mod_forcing.F90:194-443 declares surface
flux/relaxation fields; stress fields taux/tauy).  A plain pytree passed
into the step function; per-experiment `getfrc` implementations fill it
(mod_getfrc.F90:35-60 dispatch).  fuk95/channel-style idealized configs
use zeros or analytic expressions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Forcing:
    """Surface forcing at p-(fluxes) and u/v-(stress) points, (jdm, idm)."""

    taux: jax.Array      # x wind stress at u [N m-2]
    tauy: jax.Array      # y wind stress at v [N m-2]
    surflx: jax.Array    # non-shortwave heat flux [W m-2]
    sswflx: jax.Array    # shortwave heat flux [W m-2]
    salflx: jax.Array    # virtual salt flux [g m-2 s-1]
    brnflx: jax.Array    # brine flux [g m-2 s-1]
    surrlx: jax.Array    # heat-flux relaxation [W m-2]
    salrlx: jax.Array    # salt-flux relaxation [g m-2 s-1]
    # SST/SSS climatologies for restoring (mod_forcing.F90 sstclm/sssclm)
    sstclm: jax.Array
    sssclm: jax.Array
    # KPP nonlocal momentum-flux profile at u/v points, (kk+1, jdm, idm);
    # used to distribute wind stress over the boundary layer in the ALE
    # path (mod_momtum.F90:938-945 uses mu_nonloc differences).
    mu_nonloc: jax.Array
    mv_nonloc: jax.Array
    # Langmuir enhancement factor from the wave coupler (Sw_lamult,
    # mod_cesm.F90; 1 = no enhancement)
    lamult: jax.Array


def zero_forcing(kk: int, shape, dtype=jnp.float64) -> Forcing:
    H = tuple(shape)
    z2 = jnp.zeros(H, dtype)
    zk = jnp.zeros((kk + 1,) + H, dtype)
    # mu_nonloc = 1 at the surface, 0 below the first interface puts all
    # wind stress in the top layer (equivalent to the reference's KPP
    # nonlocal profile collapsed to the surface when the boundary layer
    # is unresolved).
    mu = zk.at[0].set(1.0)
    return Forcing(taux=z2, tauy=z2, surflx=z2, sswflx=z2, salflx=z2,
                   brnflx=z2, surrlx=z2, salrlx=z2,
                   sstclm=z2, sssclm=z2,
                   mu_nonloc=mu, mv_nonloc=mu,
                   lamult=jnp.ones(H, dtype))


def fwbbal_accumulate(eiacc, pracc, eva, fmltfz, lip, sop, rnf, rfi,
                      baclin: float):
    """Accumulate evaporation+ice-melt vs precipitation+runoff for the
    annual freshwater balancing (fwbbal, mod_forcing.F90:361-441,
    accumulation part)."""
    eiacc = eiacc + (eva + fmltfz) * baclin
    pracc = pracc + (lip + sop + rnf + rfi) * baclin
    return eiacc, pracc


def fwbbal_update(prfac, eiacc, pracc, scp2, wocn_mask):
    """Year-end update of the precipitation/runoff correction factor
    prfac = -prfac * total(E+I) / total(P+R) (fwbbal,
    mod_forcing.F90:382-410); returns (prfac, zeroed accumulators)."""
    totei = jnp.sum(eiacc * scp2 * wocn_mask)
    totpr = jnp.sum(pracc * scp2 * wocn_mask)
    new = -prfac * totei / jnp.where(jnp.abs(totpr) > 0., totpr, 1.)
    return new, jnp.zeros_like(eiacc), jnp.zeros_like(pracc)
