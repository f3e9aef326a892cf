"""Golden tests for PFB gain scrunching, mirroring the reference unit tests
(src/corrections.rs:1450-1545) — same inputs (powers of two), same expected
window maths."""

from birli_spark.operators.corrections import scrunch_gains


def test_scrunch_legacy_simple():
    ultra = [float(2 ** x) for x in range(30)]
    expected = [(2 ** (2 * x) + 2 ** (2 * x + 1)) / 2.0 for x in range(15)]
    assert scrunch_gains(ultra, 2, center_symmetric=False) == expected


def test_scrunch_mwax_even_scrunch_even_channels():
    ultra = [float(2 ** x) for x in range(12)]
    expected = [
        ultra[(2 * x - 1) % 12] / 4 + ultra[2 * x] / 2 + ultra[2 * x + 1] / 4
        for x in range(6)
    ]
    assert scrunch_gains(ultra, 2, center_symmetric=True) == expected


def test_scrunch_mwax_odd_scrunch_even_channels():
    ultra = [float(2 ** x) for x in range(12)]
    expected = [
        ultra[(3 * x - 1) % 12] / 3 + ultra[3 * x] / 3 + ultra[3 * x + 1] / 3
        for x in range(4)
    ]
    assert scrunch_gains(ultra, 3, center_symmetric=True) == expected


def test_scrunch_mwax_even_scrunch_odd_channels():
    ultra = [float(2 ** x) for x in range(12)]
    expected = [
        ultra[4 * x] / 8 + ultra[4 * x + 1] / 4 + ultra[4 * x + 2] / 4
        + ultra[4 * x + 3] / 4 + ultra[(4 * x + 4) % 12] / 8
        for x in range(3)
    ]
    assert scrunch_gains(ultra, 4, center_symmetric=True) == expected


def test_scrunch_mwax_odd_scrunch_odd_channels():
    ultra = [float(2 ** x) for x in range(15)]
    expected = [
        ultra[3 * x] / 6 + ultra[3 * x + 1] / 3 + ultra[3 * x + 2] / 3
        + ultra[(3 * x + 3) % 15] / 6
        for x in range(5)
    ]
    assert scrunch_gains(ultra, 3, center_symmetric=True) == expected


def test_scrunch_identity():
    ultra = [0.5, 1.5, 2.5]
    assert scrunch_gains(ultra, 1, center_symmetric=True) == ultra
