"""Pure-numpy encoding kernels (no Spark imports — unit-testable standalone)."""

from . import bitpack, bss, delta, deltaba, dictionary, fsst, plainc, rle, varint

__all__ = [
    "bitpack",
    "bss",
    "delta",
    "deltaba",
    "dictionary",
    "fsst",
    "plainc",
    "rle",
    "varint",
]
