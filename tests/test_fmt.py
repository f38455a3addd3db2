"""M3: IEC byte formatting — golden values matching the reference's
IECFormat contract (esscroll.go:281-291: one decimal, 1024 ladder)."""

from escp_spark.functions import iec_format


def test_iec_golden_values():
    assert iec_format(0) == "0.0B"
    assert iec_format(1) == "1.0B"
    assert iec_format(1023) == "1023.0B"
    assert iec_format(1024) == "1.0KiB"
    assert iec_format(1536) == "1.5KiB"
    assert iec_format(10 * 1024 * 1024) == "10.0MiB"
    assert iec_format(int(2.5 * 1024**3)) == "2.5GiB"
    assert iec_format(1024**4) == "1.0TiB"
    assert iec_format(1024**8 * 2) == "2.0YiB"


def test_iec_monotone_units():
    prev = ""
    for p in range(8):
        s = iec_format(1024**p)
        assert s.endswith("B") and s != prev
        prev = s
