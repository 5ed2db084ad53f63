"""Build the native library: g++ -O3 -shared imageio.cc -lz."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = os.path.join(HERE, "libasdslam_native.so")
SOURCES = [os.path.join(HERE, s) for s in ("imageio.cc", "mapio.cc", "prefetch.cc")]


def build(force: bool = False) -> str:
    if os.path.exists(LIB) and not force:
        newest_src = max(os.path.getmtime(s) for s in SOURCES)
        if os.path.getmtime(LIB) >= newest_src:
            return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", LIB] + SOURCES + ["-lz", "-lpthread"]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
