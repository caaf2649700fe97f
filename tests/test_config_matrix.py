"""Every bundled reference config parses into a plan (or fails exactly as
the reference does -- SURVEY.md section 2.5 lists the known-broken ones)."""

import glob
import os

import pytest

from pymodem_tpu import modems
from pymodem_tpu.config import load_plan

CONFIGS = sorted(glob.glob("/root/reference/configs/*.json"))

# These request afsk_pll presets ('36', '1200') that don't exist in the
# reference (afsk_pll.py:22-52 defines only '300'); construction raises
# there too (AttributeError in tune()).
KNOWN_BROKEN = {"hf36.json", "afsk_1200_test.json"}


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    if not CONFIGS:
        pytest.skip("reference configs not available")
    name = os.path.basename(path)
    if name in KNOWN_BROKEN:
        with pytest.raises(ValueError):
            load_plan(path, 44100.0)
        return
    rate = 8000.0 if "300" in name else 44100.0 if "psk" in name else 96000.0
    plan = load_plan(path, rate)
    assert plan.chains, name
    # every chain's modem parameters build (tap design etc.)
    for chain in plan.chains:
        params = modems.build_params(chain.modem)
        assert params is not None
