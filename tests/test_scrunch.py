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


def test_real_tables_scrunch_to_sane_gains():
    """The transcribed published tables scrunch to near-unity passband
    centres with attenuated edges — a structural sanity pin on the
    transcription (values themselves are pinned by the golden C5 test
    for cotter)."""
    from birli_spark.functions import pfb_tables as PT
    from birli_spark.operators.corrections import scrunch_gains

    cot = scrunch_gains(PT.PFB_COTTER_2014_10KHZ, 4, False)
    jake = scrunch_gains(PT.PFB_JAKE_2022_200HZ, 200, True)
    osj = scrunch_gains(PT.OSPFB_JAKE_2025_200HZ, 200, True)
    for g in (cot, jake, osj):
        assert len(g) == 32
        mid = g[len(g) // 2]
        assert 0.9 < mid < 1.1
        assert g[0] < mid          # attenuated edge
