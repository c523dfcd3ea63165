"""Utilities: generators, fixtures, reference engines, validation, timing."""
from loops_tpu.utils import generate, sample  # noqa: F401
