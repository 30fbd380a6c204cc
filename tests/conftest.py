"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
--xla_force_host_platform_device_count (SURVEY.md §4 implication list).
Must run before jax initializes its backends, hence the env mutation at
import time.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', 'false')
