"""Human-readable byte-size parsing for job options.

Semantics match ``/root/reference/src/parse.rs:2-36``: number (int or
fractional) + optional SI/binary suffix, case-insensitive, whitespace
tolerant; rejects non-positive, NaN/inf, unknown suffixes, and values
that exceed the platform word. Used to parse ``max_input_bytes``-style
job parameters (ConversionOptions equivalents).
"""

from __future__ import annotations

import math

_USIZE_MAX = (1 << 64) - 1

_MULTIPLIERS = {
    "": 1,
    "b": 1,
    "kb": 1_000,
    "kib": 1_024,
    "mb": 1_000_000,
    "mib": 1_048_576,
    "gb": 1_000_000_000,
    "gib": 1_073_741_824,
    "tb": 1_000_000_000_000,
    "tib": 1_099_511_627_776,
}


class ByteSizeError(ValueError):
    pass


def byte_size(s: str) -> int:
    """Parse e.g. ``"500MB"``, ``"2GiB"``, ``"1024"`` -> bytes."""
    s = s.strip()
    split = len(s)
    for i, c in enumerate(s):
        if c.isascii() and c.isalpha():
            split = i
            break
    num_part, suffix = s[:split], s[split:].strip()
    try:
        num = float(num_part.strip())
    except ValueError:
        raise ByteSizeError(f"invalid number: {num_part}") from None
    if math.isnan(num) or math.isinf(num) or num <= 0.0:
        raise ByteSizeError("size must be a finite positive number")
    multiplier = _MULTIPLIERS.get(suffix.lower())
    if multiplier is None:
        raise ByteSizeError(f"unknown size suffix: {suffix}")
    bytes_f = num * multiplier
    if bytes_f >= _USIZE_MAX:
        raise ByteSizeError(f"size too large for this platform: {s}")
    result = int(bytes_f)
    if result == 0:
        raise ByteSizeError("size too small to represent")
    return result
