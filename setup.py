"""Build shim: compiles the refcore C engine as a shared object shipped
inside the wheel (loaded through ctypes, never imported as a module).

The reference project drives its native build through scikit-build-core +
CMake (reference: CMakeLists.txt, pyproject.toml); here a single C file
with no Python API keeps a plain setuptools Extension sufficient.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class BuildRefcore(build_ext):
    def get_export_symbols(self, ext):
        # plain C library: no PyInit_* entry point to export
        return []

    def get_ext_filename(self, fullname):
        # fixed name so the ctypes loader finds it without ABI suffixes
        import os

        return os.path.join(*fullname.split(".")) + ".so"


setup(
    ext_modules=[
        Extension(
            "pyrodigal_tpu._native.librefcore",
            sources=["pyrodigal_tpu/_native/refcore.c"],
            # -march=native: the wheel is built for (and on) the deploy
            # host; the ctypes loader rebuilds from source when a compiler
            # is available, so the shipped object only needs to match the
            # build machine.  -ffp-contract=off keeps the float64 engine
            # bit-identical across instruction sets (no FMA contraction).
            extra_compile_args=["-O3", "-march=native", "-ffp-contract=off"],
            libraries=["m"],
        )
    ],
    cmdclass={"build_ext": BuildRefcore},
)
