"""The q521 exact-rational rounding identity, property-tested.

t_micro = round-half-away(num / den) is computed engine-side as
``(|num| + den/2) div den`` with a sign split (Spark ``div`` on
DECIMAL(38), DuckDB ``//`` on HUGEINT). This test pins the identity
against Python's exact Fraction arithmetic across randomized
magnitudes up to the DECIMAL(38) headroom, including negatives and
exact .5 ties — so both engines' shared construction provably equals
round-half-away-from-zero of the true rational.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def half_away_div(num: int, den: int) -> int:
    """The exact construction both engines execute: den > 0, den even
    (den = 6nm(n+m) always is), half = den // 2."""
    half = den // 2
    if num >= 0:
        return (num + half) // den
    return -(((-num) + half) // den)


def py_round_half_away(x: Fraction) -> int:
    q = x.numerator // x.denominator if x >= 0 else -((-x.numerator) // x.denominator)
    rem = abs(x - q)
    if x >= 0:
        return q + (1 if rem >= Fraction(1, 2) else 0)
    return q - (1 if rem >= Fraction(1, 2) else 0)


@given(
    num=st.integers(min_value=-(10**37), max_value=10**37),
    den=st.integers(min_value=1, max_value=10**30),
)
@settings(max_examples=2000, deadline=None)
def test_half_away_div_equals_rational_round(num: int, den: int):
    den2 = den * 2  # force even, like den = 6nm(n+m)
    assert half_away_div(num, den2) == py_round_half_away(
        Fraction(num, den2)
    )


def test_exact_ties_round_away_from_zero():
    # x = k + 1/2 exactly: half-away rounds |x| up
    assert half_away_div(5, 2) == 3  # 2.5 -> 3
    assert half_away_div(-5, 2) == -3  # -2.5 -> -3
    assert half_away_div(1, 2) == 1  # 0.5 -> 1
    assert half_away_div(-1, 2) == -1
    assert half_away_div(0, 2) == 0


def test_cvm_gate_magnitudes():
    """The q521 shapes at sf1-scale magnitudes stay within exact
    integer range and match the rational round."""
    n = m = 750_000
    u = 3 * 10**23
    nm = n * m
    num = 6_000_000 * u - 1_000_000 * nm * (4 * nm - 1)
    den = 6 * nm * (n + m)
    assert abs(num) < 10**38 and den < 10**38
    assert half_away_div(num, den) == py_round_half_away(Fraction(num, den))
