"""Build the native graph-preprocessing library.

Usage: ``python -m isplib_tpu.native.build``

This is the analog of the reference's ``configure`` script
(``/root/reference/configure``), minus the environment-probing autotuner —
tile selection happens at runtime in ``isplib_tpu.tune``.
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    from . import lib_path

    out = lib_path()
    src = os.path.join(os.path.dirname(out), "graphbuild.cpp")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", out,
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    from . import available
    sys.exit(0 if available() else 1)
