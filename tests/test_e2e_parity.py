"""End-to-end decode parity on the bundled fixture WAV.

The contract (SURVEY.md section 6): identical unique-valid packet sets --
(streamaddress, calculated CRC) pairs -- and identical reject counts vs the
reference on audio_samples/afsk_300_il2pc_noise.wav.  Bad-frame *contents*
are not asserted: they arise from RS decodes of marginal bytes deep in the
noise ramp, where XLA/numpy float summation-order differences legitimately
flip ulp-marginal slicer decisions.  The codec layer itself is bit-exact
(tests/test_codec_differential.py).
"""

import os

import pytest

from pymodem_tpu.config import load_plan
from pymodem_tpu.runtime.executor import run_plan

from golden_afsk300 import (
    GOLDEN_5CHAIN,
    GOLDEN_5CHAIN_BAD,
    GOLDEN_PLL,
    GOLDEN_PLL_BAD,
)

CONFIG_DIR = "/root/reference/configs"


def _unique_pairs(aggregate):
    return [
        (p.streamaddress, p.calculated_crc)
        for p in aggregate.unique
        if p.valid_crc and p.valid_header
    ]


@pytest.mark.parametrize(
    "config,golden,golden_bad",
    [
        ("afsk_300_pll.json", GOLDEN_PLL, GOLDEN_PLL_BAD),
        ("afsk_300.json", GOLDEN_5CHAIN, GOLDEN_5CHAIN_BAD),
    ],
    ids=["pll_2chain", "mixed_5chain"],
)
def test_fixture_decode_parity(fixture_audio, config, golden, golden_bad):
    path = os.path.join(CONFIG_DIR, config)
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    result = run_plan(plan, audio, rate)
    agg = result.aggregate
    ours = _unique_pairs(agg)
    # The reference driver adds chains in *process completion* order
    # (pymodem.py:158-163), so which duplicate's streamaddress represents a
    # packet is racy in the reference itself.  The deterministic contract is
    # the CRC sequence plus addresses within the reference's own correlation
    # window (rate/40, pymodem.py:175).
    assert [crc for _, crc in ours] == [crc for _, crc in golden]
    window = rate / 40
    for (addr, _), (gold_addr, _) in zip(ours, golden):
        assert abs(addr - gold_addr) < window
    assert agg.count_bad() == golden_bad


def test_report_text_matches_reference(fixture_audio):
    """The rendered decoded_headers report is byte-identical to the
    reference's own output on the PLL fixture (captured 2026-08-16,
    tests/golden_pll_report.txt, progress lines stripped)."""
    path = os.path.join(CONFIG_DIR, "afsk_300_pll.json")
    golden_path = os.path.join(os.path.dirname(__file__), "golden_pll_report.txt")
    if not (os.path.exists(path) and os.path.exists(golden_path)):
        pytest.skip("reference artifacts not available")
    rate, audio = fixture_audio
    plan = load_plan(path, rate)
    result = run_plan(plan, audio, rate)
    ours = [ln for ln in result.reports[0].splitlines() if ln.strip()]
    golden = [
        ln.rstrip("\n") for ln in open(golden_path) if ln.strip()
    ]
    assert ours == golden
