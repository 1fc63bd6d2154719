"""Build the native audio library with g++.

Usage: python -m ssak_tpu.audio.native.build
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SOURCES = ["mp3dec.cpp", "avdec.cpp", "durations.cpp"]
LIBS = ["-lavformat", "-lavcodec", "-lavutil", "-pthread"]


def build(verbose: bool = False) -> str:
    out = os.path.join(HERE, "libssakaudio.so")
    srcs = [os.path.join(HERE, s) for s in SOURCES if os.path.exists(os.path.join(HERE, s))]
    if not srcs:
        raise FileNotFoundError("no native sources found")
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        out,
        *srcs,
        *LIBS,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    print(build(verbose=True))
    sys.exit(0)
