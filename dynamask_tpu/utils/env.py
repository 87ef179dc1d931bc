"""Environment report, timing profiler, and repr mixin.

TPU-native rebuild of the reference's small utility tail
(reference: mmdet/utils/collect_env.py, mmdet/utils/profiling.py:9-39
``profile_time``, mmdet/utils/util_mixins.py ``NiceRepr``). The CUDA-event
profiler becomes a ``jax.block_until_ready`` wall-clock scope — on TPU the
dispatch is async exactly like CUDA streams, so the block is what makes the
interval meaningful.
"""

from __future__ import annotations

import contextlib
import platform
import sys
import time
from collections import defaultdict
from typing import Dict, Optional


def collect_env() -> Dict[str, str]:
    """Environment info dict (reference collect_env.py — CUDA/GCC rows are
    replaced by the JAX backend / device inventory)."""
    env: Dict[str, str] = {
        'sys.platform': sys.platform,
        'Python': sys.version.replace('\n', ''),
        'Platform': platform.platform(),
        'NumPy': __import__('numpy').__version__,
    }
    try:
        import jax
        env['JAX'] = jax.__version__
        try:
            devs = jax.devices()
            env['Backend'] = devs[0].platform if devs else 'none'
            env['Devices'] = ', '.join(str(d) for d in devs)
            env['Device count'] = str(len(devs))
        except Exception as e:  # no backend initialised / tunnel down
            env['Backend'] = f'unavailable ({type(e).__name__})'
    except ImportError:
        env['JAX'] = 'not installed'
    try:
        import jaxlib
        env['jaxlib'] = jaxlib.__version__
    except ImportError:
        pass
    try:
        import flax
        env['Flax'] = flax.__version__
    except ImportError:
        pass
    import dynamask_tpu
    env['DynaMask-TPU'] = getattr(dynamask_tpu, '__version__', 'dev')
    return env


_PROFILE_TOTALS: Dict[str, list] = defaultdict(lambda: [0.0, 0])


class _ProfileScope:
    """Handle yielded by ``profile_time``; assign the scope's device outputs
    to ``.out`` so exit can block on them."""

    out = None


@contextlib.contextmanager
def profile_time(name: str, stream=None, end_stream=None,
                 trace_name: Optional[str] = None, verbose: bool = True):
    """Wall-clock scope that blocks on device work at exit so async TPU
    dispatch is included, mirroring the reference's CUDA-event pairs
    (profiling.py:9-39). Totals accumulate per name.

    To time device work launched *inside* the scope, assign its outputs to
    the yielded handle (the only arrays a sync can wait on)::

        with profile_time('fwd') as p:
            p.out = model(x)

    ``end_stream`` may be a pytree or a zero-arg callable resolved at exit
    (the reference's end-event analogue). ``stream`` is also blocked on at
    exit, but note an array that already exists when the scope opens is
    usually already ready — prefer ``p.out``/``end_stream`` for outputs.
    """
    scope = _ProfileScope()
    t0 = time.perf_counter()
    try:
        yield scope
    finally:
        targets = [t() if callable(t) else t
                   for t in (scope.out, end_stream, stream) if t is not None]
        if targets:
            import jax
            jax.block_until_ready(targets)
        dt = time.perf_counter() - t0
        tot = _PROFILE_TOTALS[name]
        tot[0] += dt
        tot[1] += 1
        if verbose:
            print(f'{trace_name or name}: {dt * 1e3:.3f} ms '
                  f'(avg {tot[0] / tot[1] * 1e3:.3f} ms over {tot[1]})')


def profile_summary() -> Dict[str, float]:
    """Mean milliseconds per profiled scope name."""
    return {k: v[0] / max(v[1], 1) * 1e3 for k, v in _PROFILE_TOTALS.items()}


class NiceRepr:
    """``__repr__``/``__str__`` from a subclass ``__nice__`` (reference
    util_mixins.py). Subclasses define __nice__ -> str."""

    def __nice__(self) -> str:
        if hasattr(self, '__len__'):
            return str(len(self))
        raise NotImplementedError(
            f'Define the __nice__ method for {self.__class__!r}')

    def __repr__(self) -> str:
        try:
            return (f'<{self.__class__.__name__}({self.__nice__()}) '
                    f'at {hex(id(self))}>')
        except NotImplementedError as ex:
            import warnings
            warnings.warn(str(ex), category=RuntimeWarning)
            return object.__repr__(self)

    def __str__(self) -> str:
        try:
            return f'<{self.__class__.__name__}({self.__nice__()})>'
        except NotImplementedError as ex:
            import warnings
            warnings.warn(str(ex), category=RuntimeWarning)
            return object.__repr__(self)
