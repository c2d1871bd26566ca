"""Small shared helpers (reference cxai/utils/utilities.py)."""

from __future__ import annotations

import contextlib
import io
import math
import sys


def round_down(value: float, decimals: int = 1) -> float:
    """Floor to N decimals (utilities.py:6-16)."""
    factor = 10 ** decimals
    return math.floor(value * factor) / factor


class HiddenPrints(contextlib.ContextDecorator):
    """Silence stdout inside the block (utilities.py:19-26)."""

    def __enter__(self):
        self._stdout = sys.stdout
        sys.stdout = io.StringIO()
        return self

    def __exit__(self, *exc):
        sys.stdout = self._stdout
        return False
