"""Native (C++) acceleration tier.

Holds the compiled host-side hot paths — currently the Matrix Market
tokenizer (the analog of the reference's ``std::from_chars`` mmap walker,
reference: detail/mtx_parser.hxx:90-130). Built lazily with g++ into a
shared library and loaded via ctypes; every entry point has a pure-Python
fallback at its call site, so the package works without a toolchain.
"""
from __future__ import annotations

from loops_tpu.native.build import load_library  # noqa: F401
from loops_tpu.native.mtx import mtx_parse  # noqa: F401
