"""Thermodynamic sea-ice/snow state and parameters.

TPU-native counterpart of the reference modules
(/root/reference/phy/mod_seaice.F90:44-120 state fields and
/root/reference/ben02/mod_thdysi.F90:32-86 thermodynamic parameters).
The ice state is a small pytree carried alongside the ocean state by
configurations that use the ben02 bulk-forcing path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# mod_thdysi.F90:61-80 data statements
albi_f = .70       # max albedo over ice
albi_m = .60       # max albedo over melting ice
albs_f = .85       # albedo over snow
albs_m = .75       # albedo over melting snow
rhoice = 906.      # density of ice [kg m-3]
rhosnw = 330.      # density of snow [kg m-3]
rkice = 2.04       # ice conductivity [W m-1 K-1]
rksnw = .31        # snow conductivity [W m-1 K-1]
fusi = 3.02e8      # heat of fusion of ice [J m-3]
fuss = 1.10e8      # heat of fusion of snow [J m-3]
fice_max = .995    # maximum fractional ice cover
tice_m = 273.05    # melting point of ice [K]
tsnw_m = 273.15    # melting point of snow [K]
hice_nhmn = .50    # min ice thickness, northern hemisphere [m]
hice_shmn = .30    # min ice thickness, southern hemisphere [m]
sagets = 2.e-7     # snow aging timescale [s-1]
sice = 6.          # sea-ice salinity [g kg-1]
cwi = 0.006        # ice-ocean heat transfer coefficient
cuc = 1.e3         # under-cooled water heat-flux constant [W m-2 K-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SeaiceState:
    """Per-gridpoint ice/snow slab state, all (jdm, idm)
    (mod_seaice.F90 ficem/hicem/hsnwm/iagem, mod_thdysi tsrfm/ticem,
    plus the ben02 daily accumulators and runoff reservoir)."""
    ficem: jax.Array    # ice concentration []
    hicem: jax.Array    # ice thickness [m]
    hsnwm: jax.Array    # snow thickness [m]
    tsrfm: jax.Array    # surface temperature [K]
    ticem: jax.Array    # ice temperature [K]
    iagem: jax.Array    # ice age [days]
    ustari: jax.Array   # ice-ocean friction velocity [m s-1]
    uicem: jax.Array    # ice drift x velocity [m s-1] (mod_seaice.F90:40)
    vicem: jax.Array    # ice drift y velocity [m s-1]
    albm: jax.Array     # surface albedo [] (ben02 thermo)
    tauxice: jax.Array  # ice-ocean x stress [N m-2]
    tauyice: jax.Array  # ice-ocean y stress [N m-2]
    rnfres: jax.Array   # runoff reservoir [kg m-2]
    salt_corr: jax.Array  # accumulated salt-limiting correction


def init_seaice(shape, dtype=jnp.float64) -> SeaiceState:
    H = tuple(shape)
    z = jnp.zeros(H, dtype)
    return SeaiceState(ficem=z, hicem=z, hsnwm=z, uicem=z, vicem=z,
                       albm=z,
                       tsrfm=jnp.full(H, 273.15, dtype),
                       ticem=jnp.full(H, 273.15, dtype),
                       iagem=z, ustari=z, tauxice=z, tauyice=z,
                       rnfres=z, salt_corr=z)
