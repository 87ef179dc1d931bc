"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-device sharding paths are tested on a single host the JAX way
(SURVEY.md §4): ``xla_force_host_platform_device_count=8``. Must run before
jax initializes, hence env setup at conftest import time.
"""

import os

# Force-assign: the harness presets JAX_PLATFORMS=axon (the TPU tunnel), so a
# setdefault would silently leave tests running on the real chip.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

# The env var alone is not enough: the harness's sitecustomize registers the
# axon TPU plugin in every interpreter and presets JAX_PLATFORMS=axon, so the
# config must be forced at the jax level too.
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: model-level tests compile big XLA programs;
# caching makes re-runs (and CI repeats) near-instant.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def _demote_eigen_spinners():
    """XLA:CPU's Eigen pool (one thread per virtual device) spins in a
    sched_yield loop while idle — on a low-core host the spinners starve
    the threads doing real work (measured ~10-20x slowdowns; see
    __graft_entry__.dryrun_multichip). Move them to SCHED_IDLE."""
    jax.devices()  # force backend (and pool) creation
    try:
        for tid in os.listdir('/proc/self/task'):
            try:
                with open(f'/proc/self/task/{tid}/comm') as f:
                    if 'XLAEigen' in f.read():
                        os.sched_setscheduler(int(tid), os.SCHED_IDLE,
                                              os.sched_param(0))
            except (OSError, ValueError):
                pass
    except (OSError, AttributeError):
        pass


_demote_eigen_spinners()
