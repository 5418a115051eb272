"""Hermetic coverage for the per-round quality artifact driver
(tools/quality.py, VERDICT r4 #3): the soak-output parsing that turns a
band-asserted soak run into the QUALITY_r* verdict must survive both
driver formats (classify/segment soak.py and the retrieval soak)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from quality import FAMILIES, parse_soak_output  # noqa: E402


CLASSIFY_OUT = """\
band: modelnet40: [0.838, 0.91] on tools/make_modelnet_scale.py ...
epoch 29: 4.30 ms/step sustained = 1861.6 clouds/s (accuracy 0.3750)
eval: {'accuracy': 0.8576612903225806, 'loss': 0.4424035273973019}
band check: accuracy 0.8577 INSIDE [0.838, 0.91]
"""

RETRIEVAL_OUT = """\
epoch 19: 3.97 ms/step = 2012.9 clouds/s (loss 1.2539 acc 0.375)
wrote 825 rank files to /tmp/soak_shrec/rank
retrieval metrics (ground-truth labels): {'mAP': 0.6791, 'P@1': 0.8242}
band check: mAP 0.6791 OUTSIDE [0.616, 0.676]
"""


def test_parse_classify_soak():
    value, inside, ev, clouds = parse_soak_output(CLASSIFY_OUT, rc=0)
    assert value == 0.8577 and inside is True
    assert ev == {"accuracy": 0.8577, "loss": 0.4424}
    assert clouds == 1861.6


def test_parse_retrieval_soak_outside():
    # the band line overrides the exit code in BOTH directions
    value, inside, ev, clouds = parse_soak_output(RETRIEVAL_OUT, rc=0)
    assert value == 0.6791 and inside is False
    assert ev == {"mAP": 0.6791, "P@1": 0.8242}
    assert clouds == 2012.9


def test_parse_missing_band_line_falls_back_to_rc():
    value, inside, ev, clouds = parse_soak_output("epoch 0: crash\n", rc=1)
    assert value is None and inside is False
    assert ev is None and clouds is None
    _, inside_ok, _, _ = parse_soak_output("", rc=0)
    assert inside_ok is True


def test_families_cover_all_band_presets():
    import json
    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    with open(os.path.join(tools, "soak_bands.json")) as f:
        bands = json.load(f)
    presets = {k for k in bands if not k.startswith("_")}
    assert presets <= set(FAMILIES), (presets, set(FAMILIES))
