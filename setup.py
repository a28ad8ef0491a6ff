"""Wheel build hook: ship the native C++ source as package data.

The C++ data-loader kernels (csrc/apda_io.cc) are compiled at first use by
``apda_fft_tpu.io.native`` (g++ via ctypes; no compiled artifact ships in
the wheel, so one wheel serves every platform with a toolchain and the
pure-NumPy fallbacks serve the rest).  The canonical source lives at the
repo root for development; this hook copies it into the package as
``apda_fft_tpu/_csrc/apda_io.cc`` so installed wheels are self-contained
(``io/native.py:_locate_source`` checks both spots).
"""

import os
import shutil

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNativeSource(build_py):
    def run(self):
        super().run()
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "csrc", "apda_io.cc")
        if os.path.exists(src):
            dst_dir = os.path.join(self.build_lib, "apda_fft_tpu", "_csrc")
            os.makedirs(dst_dir, exist_ok=True)
            shutil.copy2(src, dst_dir)


setup(cmdclass={"build_py": BuildPyWithNativeSource})
