"""Canary for the local gate's value normalization (``tools/
check_correctness._norm``): the Decimal branch must compare values
EXACTLY. Round-9 advice: the old ``repr(float(v))`` fold rounded any
decimal wider than 53 bits, so a 1-ulp drift on DECIMAL(38,x) would have
passed the gate silently. These tests fail if the float fold is ever
reintroduced."""

import decimal
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_correctness import _norm  # noqa: E402


def test_decimal_compare_is_exact_beyond_float_precision():
    # 38 significant digits — adjacent values collapse to ONE float64
    a = decimal.Decimal("12345678901234567890.123456789012345678")
    b = decimal.Decimal("12345678901234567890.123456789012345679")  # +1 ulp
    assert float(a) == float(b), "values chosen to alias under float64"
    assert _norm(a) != _norm(b), (
        "the gate folded Decimals through float again — a 1-ulp drift on "
        "DECIMAL(38,x) would pass silently"
    )


def test_decimal_compare_is_scale_insensitive():
    # DECIMAL scale is engine cosmetics, not value: 1.50 == 1.5000
    assert _norm(decimal.Decimal("1.50")) == _norm(decimal.Decimal("1.5000"))
    assert _norm(decimal.Decimal("-0.0")) == _norm(decimal.Decimal("0"))
    # big-exponent normalize() must not drop into E-notation
    assert "E" not in _norm(decimal.Decimal("150000000000000000000"))
    assert _norm(decimal.Decimal("150")) == "150"


def test_decimal_zero_and_sign():
    assert _norm(decimal.Decimal("0.000")) == _norm(decimal.Decimal("0"))
    assert _norm(decimal.Decimal("-1.5")) != _norm(decimal.Decimal("1.5"))
