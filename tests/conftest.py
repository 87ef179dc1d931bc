"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-device sharding paths are tested on a single host the JAX way
(SURVEY.md §4): ``xla_force_host_platform_device_count=8``. Must run before
jax initializes, hence env setup at conftest import time.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
