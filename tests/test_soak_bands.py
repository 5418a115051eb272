"""Hermetic checks on the committed quality-band table
(tools/soak_bands.json) and its loader (tools/soak.py::load_band).

The bands are the round-4 de-saturation of the quality gates (VERDICT
r3 #2): 3-seed metric envelopes measured on hardness-tuned datasets,
asserted by ``tools/soak.py --band`` / ``tools/soak_retrieval.py
--band``.  These tests pin the table's internal consistency so a
hand-edit (or a drifted recalibration) fails in CI rather than
silently widening the gate.  (The reference's only quality gates are
its save thresholds — modelnet/train.py:96-103; the rebuild's bands
must therefore police themselves.)
"""

import importlib.util
import json
import os

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load_soak():
    spec = importlib.util.spec_from_file_location(
        "soak_tool", os.path.join(TOOLS, "soak.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bands():
    with open(os.path.join(TOOLS, "soak_bands.json")) as f:
        return json.load(f)


class TestBandTable:
    def test_flagship_presets_present(self, bands):
        # one band per soak family: classify, segment, retrieval
        assert {"modelnet40", "shapenetpart", "shrec16"} <= set(bands)

    def test_bands_internally_consistent(self, bands):
        for name, b in bands.items():
            if name.startswith("_"):
                continue
            assert b["lo"] < b["hi"], name
            seeds = b["seeds"]
            assert len(seeds) >= 3, f"{name}: band needs >=3 seeds"
            # every calibration seed must sit INSIDE its own band
            assert b["lo"] <= min(seeds) and max(seeds) <= b["hi"], name
            # band = seed envelope +/- pad (default 0.02 for 0..1
            # metrics; loss-scale bands commit their own pad).
            # rounding tolerance = pad/10
            pad = b.get("pad", 0.02)
            assert 0.0 < pad, name
            assert abs(b["lo"] - (min(seeds) - pad)) < pad / 10, name
            assert abs(b["hi"] - (max(seeds) + pad)) < pad / 10, name
            # a band that drifted back into saturation protects nothing:
            # accuracy-like metrics saturate at 1.0, losses at 0.0
            if "loss" in b["metric"] or "chamfer" in b["metric"]:
                assert b["lo"] > 0.0, f"{name}: band is saturated"
            else:
                assert b["hi"] < 0.99, f"{name}: band is saturated"
            assert 0.0 <= b["hardness"] <= 1.0, name
            for k in ("metric", "dataset", "epochs"):
                assert k in b, f"{name}: missing {k}"


class TestLoadBand:
    def test_returns_parseable_range(self, bands):
        soak = _load_soak()
        for name in bands:
            if name.startswith("_"):
                continue
            lo, hi = (float(x) for x in soak.load_band(name).split(","))
            assert (lo, hi) == (bands[name]["lo"], bands[name]["hi"])

    def test_unknown_preset_exits(self):
        soak = _load_soak()
        with pytest.raises(SystemExit):
            soak.load_band("no_such_preset")
