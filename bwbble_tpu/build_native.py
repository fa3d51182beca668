"""Build the native C++ runtime: `python -m bwbble_tpu.build_native`."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    src = os.path.join(root, "native", "bwbble_native.cpp")
    out_dir = os.path.join(root, "native", "build")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libbwbble_native.so")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
