"""Human-readable metric formatting (M1/M3).

The reference prints byte counters in IEC (multiples-of-1024) units in
its scroll-progress lines (esscroll/esscroll.go:277-291 ``IECFormat``);
this module is the analog for the build/CLI progress surfaces. Same
contract: one decimal place, unit ladder B, KiB … YiB.
"""

from __future__ import annotations

_UNITS = ["", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi"]


def iec_format(num: int | float) -> str:
    """Bytes → IEC string, e.g. 1536 → '1.5KiB' (esscroll.go:281-291)."""
    n = float(num)
    for unit in _UNITS:
        if n < 1024.0:
            return f"{n:.1f}{unit}B"
        n /= 1024.0
    return f"{n:.1f}YiB"
