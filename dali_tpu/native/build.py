"""Build the native host runtime (libdali_tpu.so).

Usage: python dali_tpu/native/build.py
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src")
OUT = os.path.join(HERE, "libdali_tpu.so")


def build(verbose: bool = True) -> str:
    sources = [os.path.join(SRC, f) for f in sorted(os.listdir(SRC)) if f.endswith(".cc")]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-Wall",
        *sources,
        "-o",
        OUT,
        "-ljpeg",
        "-lpthread",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
