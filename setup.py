"""Wheel build for spsparse-tpu, including the native host runtime.

``pip wheel .`` / ``pip install .`` compiles ``csrc/spsparse_host.cpp``
into ``spsparse_tpu/native/_spsparse_host*.so`` so installed wheels carry
the native tier without a compiler on the target machine. The library
exports plain C symbols and is loaded with ``ctypes`` (no Python C API),
so building it as a setuptools Extension only reuses setuptools'
compiler plumbing. Source checkouts keep working without this step:
``spsparse_tpu.native`` falls back to on-demand ``make -C csrc`` and then
to numpy (see its module docstring).

Portability note: the in-tree Makefile uses ``-march=native`` (build
machine == run machine); the wheel build deliberately does not, so wheels
are portable across x86-64 hosts.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Build the native library but never fail the install over it: the
    package degrades gracefully (make fallback, then numpy)."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # pragma: no cover - toolchain-dependent
            self._warn(e)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # pragma: no cover - toolchain-dependent
            self._warn(e)

    @staticmethod
    def _warn(e):
        import warnings
        warnings.warn(
            f"native host library build failed ({e}); the wheel will fall "
            "back to on-demand make or numpy at runtime")


setup(
    ext_modules=[
        Extension(
            "spsparse_tpu.native._spsparse_host",
            sources=["csrc/spsparse_host.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
