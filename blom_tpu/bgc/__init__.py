"""iHAMOCC-equivalent ocean biogeochemistry, TPU-native.

Re-design of the reference iHAMOCC model (/root/reference/hamocc/,
~26k LoC Fortran) as pure JAX column chemistry over dense (K, J, I)
fields: every process is either elementwise or a fixed-trip-count
`lax.scan`/`lax.fori_loop` over the vertical, so the whole BGC step
fuses into the jitted model step and vmaps trivially over shards.

Base tracer set (mo_param1_bgc.F90 i_base block, 18 advected tracers)
plus the hydrogen-ion field `hi` carried as a 19th tracer slot (the
reference keeps hi as separate persistent state used only as the
pH-solver initial guess; storing it in the tracer block gives restart
exactness and a transported first guess for free).
"""

from .params import BgcParams, BgcTracers, NBGC
from .step import BgcForcing, hamocc_step, init_bgc_tracers
