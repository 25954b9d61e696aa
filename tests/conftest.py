"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh (for sharding-invariance
tests, mirroring the reference's PE-count-invariance property,
/root/reference/phy/mod_xc.F90:2071-2322) and with f64 enabled so parity
against the real-8 Fortran formulas is exact."""

import os

# The container's sitecustomize registers the 'axon' TPU-tunnel platform and
# forces JAX_PLATFORMS=axon; tests must run on local CPU, so override both
# the env var and (after import) the jax config it sets.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the suite is dominated by XLA-CPU
# compiles of the full step at several grid sizes; caching them across
# runs cuts repeat-suite wall time several-fold.
_cache_dir = os.environ.get('BLOM_TPU_JAX_CACHE',
                            '/tmp/blom_tpu_jax_cache')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
