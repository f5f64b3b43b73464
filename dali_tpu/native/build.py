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


def _has_ffmpeg() -> bool:
    import ctypes.util

    return all(
        ctypes.util.find_library(n)
        for n in ("avformat", "avcodec", "avutil", "swscale", "swresample")
    )


def build(verbose: bool = True) -> str:
    sources = [os.path.join(SRC, f) for f in sorted(os.listdir(SRC)) if f.endswith(".cc")]
    libs = ["-ljpeg", "-lpthread"]
    defines = []
    if _has_ffmpeg():
        libs += ["-lavformat", "-lavcodec", "-lavutil", "-lswscale", "-lswresample"]
    else:
        sources = [s for s in sources if "video_decode" not in s and "audio_decode" not in s]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-Wall",
        *defines,
        *sources,
        "-o",
        OUT,
        *libs,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
