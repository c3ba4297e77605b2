from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = "/root/reference/tests/fixtures"


def normalize(s: str) -> str:
    """Golden comparison normalization (reference tests/common/mod.rs:3-17):
    trim line ends, collapse blank-line runs, strip trailing newline."""
    lines = [line.rstrip() for line in s.splitlines()]
    result: list[str] = []
    prev_blank = False
    for line in lines:
        is_blank = line == ""
        if is_blank and prev_blank:
            continue
        result.append(line)
        prev_blank = is_blank
    return "\n".join(result).rstrip()
