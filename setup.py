"""Build script: pure-Python package + optional native _fastdiag extension.

The extension is best-effort: if a C toolchain is unavailable the package
installs without it and diagnostics fall back to the numpy implementation.
Build in place with:  python setup.py build_ext --inplace
"""

import os

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install because the native extension didn't build."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover
            print(f"warning: skipping native extension build: {e}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover
            print(f"warning: failed to build {ext.name}: {e}")


fastdiag = Extension(
    "mlx_mcmc_tpu._fastdiag",
    sources=[os.path.join("src", "fastdiag", "fastdiag.c")],
    extra_compile_args=["-O3", "-fopenmp"],
    extra_link_args=["-fopenmp"],
)

setup(
    ext_modules=[fastdiag],
    cmdclass={"build_ext": OptionalBuildExt},
)
