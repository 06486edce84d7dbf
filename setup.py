"""Build configuration including the optional native extension.

The C++ extension (native/octopus_native.cpp) accelerates BGZF inflation and
BAM record scanning; the pure-python fallbacks keep the package fully
functional when no toolchain is available, so a failed extension build is
non-fatal.
"""

from setuptools import setup, Extension
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # toolchain missing: carry on pure-python
            print(f"octopus-tpu: native extension skipped ({e})")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:
            print(f"octopus-tpu: native extension skipped ({e})")


setup(
    ext_modules=[
        Extension(
            "octopus_tpu._native",
            sources=["native/octopus_native.cpp"],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
