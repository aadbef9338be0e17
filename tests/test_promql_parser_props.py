"""Property tests for the PromQL parser's scalar expression evaluation —
random arithmetic expressions evaluated both by the parser and by direct
AST walking in Python must agree (catches precedence/associativity bugs
the hand-written cases miss). Pure Python, no Spark session needed."""

from __future__ import annotations

import math
from datetime import datetime

from hypothesis import given, strategies as st

from prom_etl_db_spark.operators.promql_parser import eval_promql

T0 = datetime(2024, 3, 15, 12, 0, 0)

# numbers that keep ^ from overflowing and / from denormal edge cases
_num = st.integers(min_value=0, max_value=9)


@st.composite
def _expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        n = draw(_num)
        return str(n), float(n)
    op = draw(st.sampled_from(["+", "-", "*"]))
    ls, lv = draw(_expr(depth=depth + 1))
    rs, rv = draw(_expr(depth=depth + 1))
    value = {"+": lv + rv, "-": lv - rv, "*": lv * rv}[op]
    # fully parenthesized so the string unambiguously encodes the tree the
    # Python value was computed from; precedence/associativity have their
    # own dedicated tests below
    return f"({ls} {op} {rs})", value


@given(_expr())
def test_scalar_arithmetic_matches_python(pair):
    s, expected = pair
    got = eval_promql(None, s, T0)
    assert got == expected or math.isclose(got, expected)


@given(st.lists(_num, min_size=2, max_size=6))
def test_left_associative_subtraction_chain(nums):
    s = " - ".join(str(n) for n in nums)
    expected = float(nums[0])
    for n in nums[1:]:
        expected -= n
    assert eval_promql(None, s, T0) == expected


@given(_num, _num, _num)
def test_mul_binds_tighter_than_add(a, b, c):
    assert eval_promql(None, f"{a} + {b} * {c}", T0) == a + b * c
    assert eval_promql(None, f"{a} * {b} + {c}", T0) == a * b + c


@given(st.integers(min_value=1, max_value=4), st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=2))
def test_pow_right_associative(a, b, c):
    assert eval_promql(None, f"{a} ^ {b} ^ {c}", T0) == float(a ** (b ** c))


def test_unquote_roundtrips_escaped_strings():
    """Property: escaping any string with Go rules then _unquote-ing it
    returns the original — including quotes, backslashes, and control
    chars."""
    from hypothesis import given, strategies as st

    from prom_etl_db_spark.operators.promql_parser import _unquote

    _FWD = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\t": "\\t", "\r": "\\r",
            "\a": "\\a", "\b": "\\b", "\f": "\\f", "\v": "\\v"}

    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60))
    def check(s):
        quoted = '"' + "".join(_FWD.get(c, c) for c in s) + '"'
        assert _unquote(quoted) == s

    check()


def test_unquote_roundtrips_numeric_escape_spellings():
    """Property (r4): ANY code point spelled as its Go numeric escape —
    \\xNN (≤ 0xFF), \\uNNNN (BMP non-surrogate), \\UNNNNNNNN, or 3-digit
    octal (≤ 0o377) — unquotes to exactly chr(cp); and a backquoted raw
    string returns any backtick-free text verbatim."""
    from hypothesis import given, strategies as st

    from prom_etl_db_spark.operators.promql_parser import _unquote

    @given(st.integers(min_value=0, max_value=0x10FFFF))
    def check_cp(cp):
        if 0xD800 <= cp <= 0xDFFF:
            return  # surrogates are rejected, covered by the unit test
        spellings = [f"\\U{cp:08X}", f"\\U{cp:08x}"]
        if cp <= 0xFF:
            spellings += [f"\\x{cp:02x}", f"\\x{cp:02X}", f"\\{cp:03o}"]
        if cp <= 0xFFFF:
            spellings += [f"\\u{cp:04x}"]
        for sp in spellings:
            assert _unquote(f'"{sp}"') == chr(cp), sp

    check_cp()

    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                          blacklist_characters="`"),
                   max_size=60))
    def check_raw(s):
        assert _unquote(f"`{s}`") == s

    check_raw()
