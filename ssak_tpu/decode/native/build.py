"""Build the native n-gram LM library with g++.

Usage: python -m ssak_tpu.decode.native.build
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SOURCES = ["ngram.cpp"]


def build(verbose: bool = False) -> str:
    out = os.path.join(HERE, "libssaklm.so")
    srcs = [os.path.join(HERE, s) for s in SOURCES]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, *srcs]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native LM build failed:\n{res.stderr}")
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    print(build(verbose=True))
    sys.exit(0)
