"""Property tests for the md5-hex threshold arithmetic (pure Python —
the invariant the whole sampling module leans on: lexicographic order of
lowercase 8-char hex == numeric order of the value it encodes)."""

from __future__ import annotations

from hypothesis import given, strategies as st

from prom_etl_db_spark.functions.sampling import _HEX_SPAN, hex_threshold


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_is_8_hex_or_sentinel(f):
    t = hex_threshold(f)
    assert t == "g" or (len(t) == 8 and int(t, 16) == int(f * _HEX_SPAN))


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_threshold_monotone_in_fraction(a, b):
    ta, tb = hex_threshold(a), hex_threshold(b)
    if a <= b:
        assert ta <= tb  # string order == numeric order ("g" > all hex)


@given(st.integers(min_value=0, max_value=_HEX_SPAN - 1))
def test_every_position_lands_below_full_threshold(v):
    pos = format(v, "08x")
    assert pos < hex_threshold(1.0)
    # and a fraction equal to the position's own value is the boundary:
    # pos sits exactly AT threshold(v/span) — excluded, matching the
    # half-open [0, f) bucket semantics
    assert not pos < hex_threshold(v / _HEX_SPAN)
