#!/usr/bin/env python3
"""Build libdfdvideo.so (first-party FFmpeg seek-decoder)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    out = os.path.join(HERE, "libdfdvideo.so")
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        os.path.join(HERE, "videodecode.cpp"),
        os.path.join(HERE, "videoencode.cpp"),
        "-o", out,
        "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
    ]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print(build())
    sys.exit(0)
