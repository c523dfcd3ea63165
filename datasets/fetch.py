#!/usr/bin/env python
"""Fetch smoke-test datasets into datasets/.

chesapeake.mtx (39x39 SuiteSparse smoke matrix, the reference's bundled
example input) is copied from the local reference checkout when present;
otherwise download it from the SuiteSparse collection (needs egress).
Nothing is committed to the repo.
"""
from __future__ import annotations

import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = [
    "/root/reference/datasets/chesapeake/chesapeake.mtx",
    "/root/reference/datasets/chesapeake.mtx",
]
URL = ("https://suitesparse-collection-website.herokuapp.com/MM/DIMACS10/"
       "chesapeake.tar.gz")


def fetch_chesapeake() -> str | None:
    dst = os.path.join(HERE, "chesapeake.mtx")
    if os.path.exists(dst):
        return dst
    for src in SOURCES:
        if os.path.exists(src):
            shutil.copy(src, dst)
            print(f"copied {src} -> {dst}")
            return dst
    print(f"chesapeake.mtx not found locally; fetch it from {URL}",
          file=sys.stderr)
    return None


if __name__ == "__main__":
    sys.exit(0 if fetch_chesapeake() else 1)
