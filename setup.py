"""Build hook: compile the native C++ helpers (anchor seeder/chainer,
poset-consistency decoder) into the wheel as cpecan_tpu/libcpecan.so.

The toolchain is optional — a wheel built without g++ simply omits the
library and the package falls back to the numpy implementations
(identical semantics; see cpecan_tpu/align/native.py). Editable/dev
installs use the same lazy on-demand compile as before.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

NATIVE_SOURCES = ["native/anchors.cpp", "native/posetfilter.cpp",
                  "native/mea.cpp"]


class build_py_with_native(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        srcs = [os.path.join(here, s) for s in NATIVE_SOURCES]
        if not all(os.path.exists(s) for s in srcs):
            return
        out = os.path.join(self.build_lib, "cpecan_tpu", "libcpecan.so")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out]
                + srcs, check=True)
        except Exception:
            pass  # numpy-fallback wheel


setup(cmdclass={"build_py": build_py_with_native})
