#!/usr/bin/env python
"""setup.py — thin setuptools shim over pyproject.toml.

Reference equivalent: /root/reference/setup.py:159-160 (torch
``cpp_extension.BuildExtension`` for the CUDA DCN ops). The TPU rebuild's
compute kernels are Pallas/XLA (no build step); the one native piece is the
RLE mask codec ``dynamask_tpu/native/maskc.c``, which is built here as an
optional C extension — and also self-builds at import time when missing
(``dynamask_tpu/native/__init__.py``), so a failed extension build degrades
gracefully to the numpy fallback rather than failing the install.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the optional native codec."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover - toolchain-dependent
            print(f'warning: skipping optional native extension ({e})')

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f'warning: optional extension {ext.name} skipped ({e})')


def get_extensions():
    from setuptools import Extension
    return [Extension('dynamask_tpu.native._maskc',
                      sources=['dynamask_tpu/native/maskc.c'],
                      extra_compile_args=['-O3'])]


setup(
    ext_modules=get_extensions(),
    cmdclass={'build_ext': OptionalBuildExt},
)
