"""Small host-side integer utilities.

TPU-native counterpart of the reference's ``src/utils.{h,c}`` (IsPowerOfTwo,
PowerOfTwo, LogOfTwo): these run on the host at trace time — horizon lengths
and tree depths are static under ``jax.jit``, so plain Python ints suffice.
"""

from __future__ import annotations


def is_power_of_two(x: int) -> bool:
    """True iff ``x`` is a positive power of two (ref: utils.c:7-9)."""
    return x > 0 and (x & (x - 1)) == 0


def power_of_two(exponent: int) -> int:
    """2**exponent via bit shift (ref: utils.c:11)."""
    return 1 << exponent


def log2_int(x: int) -> int:
    """Integer log2 of a power of two (ref: utils.c:13-15)."""
    if not is_power_of_two(x):
        raise ValueError(f"log2_int requires a power of two, got {x}")
    return x.bit_length() - 1
