"""Build libdali_tpu_c.so (the C API) and the smoke-test binary."""

from __future__ import annotations

import os
import subprocess
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose=True):
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = sysconfig.get_config_var("LDVERSION")
    out = os.path.join(HERE, "libdali_tpu_c.so")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{inc}", os.path.join(HERE, "capi.cc"), "-o", out,
        f"-L{libdir}", f"-lpython{ver}", f"-Wl,-rpath,{libdir}",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print("built", build())
