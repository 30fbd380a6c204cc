"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
--xla_force_host_platform_device_count (SURVEY.md §4 implication list).

Note: on this image a sitecustomize hook imports jax at interpreter startup
with JAX_PLATFORMS=axon (a tunneled single-TPU backend that admits one client
per host at a time). Setting the env var here is therefore too late — the
platform must be overridden through jax.config, which also keeps the test
suite from contending for the TPU tunnel with concurrently running jobs.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache (backend+CPU-fingerprint-keyed dir so AOT
# CPU entries from another machine are never loaded): repeated suite runs
# skip XLA recompiles.
from molgym_tpu.tools.util import enable_compile_cache  # noqa: E402

enable_compile_cache()
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
