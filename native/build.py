"""Build the native planner/oracle shared library.

Usage: python native/build.py  (writes native/libspectral_native.so)

Plain g++ invocation — no CMake needed for two TUs; the reference's CMake
build (CMakeLists.txt, src/CMakeLists.txt) is matched by this script plus
the pyproject packaging at the repo root.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
LIB = HERE / "libspectral_native.so"


def build(verbose: bool = True) -> pathlib.Path:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-Wall", "-Wextra",
        str(HERE / "planner.cpp"), str(HERE / "oracle.cpp"),
        "-o", str(LIB), "-lm",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    print(f"built {LIB}")
    sys.exit(0)
