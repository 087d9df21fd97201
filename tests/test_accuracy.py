"""Regression: reproduce the reference's published approximation-error table
(reference/test.cpp:515-521, README.md:141) with asserted tolerances.

The reference only *prints* these numbers; here they are locked in.  The
0-split rows match to float32 round-off; split rows go through the adaptive
refinement path where tiny welding-order differences shift a few split
decisions, hence the slightly looser tolerance.
"""
import pytest

from cbtr_tpu.harness import measure_approximation

AXES = (1.0, 4.0, 2.0)

TABLE = [
    # split_steps, sectors, belts, divisor, reference error, rel tolerance
    (0, 4, 1, 1, 1.2555894, 1e-4),
    (0, 7, 3, 3, 2.2721614e-3, 1e-4),
    (0, 15, 5, 3, 1.9426199e-5, 1e-4),
    (1, 7, 3, 3, 7.0956006e-4, 5e-3),
    (1, 15, 5, 3, 4.0229771e-4, 5e-3),
    (2, 7, 3, 3, 1.1259826e-3, 5e-3),
    (2, 15, 5, 3, 6.7134395e-5, 5e-3),
]


@pytest.mark.parametrize("steps,sectors,belts,divisor,expected,rtol", TABLE)
def test_ellipsoid_approximation_error_table(steps, sectors, belts, divisor, expected, rtol):
    err = measure_approximation(steps, sectors, belts, AXES, divisor)
    assert err == pytest.approx(expected, rel=rtol)
