"""Native (C) runtime kernels with lazy in-tree compilation.

The reference's mask transport and eval hot loops are C (pycocotools
maskApi.c); this package provides the equivalent native kernels for this
framework. The extension is built on first import with the system
compiler into this directory and cached; set ``DYNAMASK_NO_NATIVE=1`` to
force the pure-numpy fallbacks in :mod:`dynamask_tpu.data.mask_codec`.

Public surface: ``maskc`` — the compiled module or ``None`` when
unavailable (no compiler, build error, or opt-out).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def _build() -> bool:
    """(Re)compile when the cached .so is missing or older than the
    source. The compile goes to a per-pid temp name and lands with an
    atomic rename, so concurrent importers never see a half-written
    file."""
    src = os.path.join(_HERE, 'maskc.c')
    so = os.path.join(_HERE, '_maskc' +
                      (sysconfig.get_config_var('EXT_SUFFIX') or '.so'))
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    cc = (sysconfig.get_config_var('CC') or 'cc').split()[0]
    include = sysconfig.get_paths()['include']
    tmp = '%s.tmp.%d' % (so, os.getpid())
    cmd = [cc, '-O2', '-shared', '-fPIC', '-I', include, src, '-o', tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=120)
        if proc.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, so)
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return True


maskc = None
if os.environ.get('DYNAMASK_NO_NATIVE', '0') != '1':
    # staleness check runs BEFORE any import so edits to maskc.c always
    # take effect on the next interpreter start
    if _build():
        try:
            from . import _maskc as maskc  # type: ignore
        except ImportError:
            try:
                if _HERE not in sys.path:
                    sys.path.insert(0, _HERE)
                import _maskc as maskc  # type: ignore
            except ImportError:
                maskc = None
