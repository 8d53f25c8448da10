"""SCALEPROOF.json growth-law pins (VERDICT r11 #2/#7): the
committed artifact must show the registered scaled-k shapes growing
~linearly and streaming state bounded by in-horizon key cardinality.
These read the ARTIFACT (machine-independent counts, not wall
seconds — wall ratios vary with the VM mood) so a regenerated file
that regresses the exponent fails CI."""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parents[1] / "SCALEPROOF.json"


@pytest.fixture(scope="module")
def art():
    if not ART.exists():
        pytest.skip("SCALEPROOF.json not generated")
    return json.loads(ART.read_text())


def test_artifact_is_the_mult10_tier(art):
    # a --mult 2 sanity run must never be committed as the artifact
    assert art["mult"] == 10


def test_scaled_k_candidate_pairs_grow_linearly(art):
    pc = art["bitext_candidate_pairs"]
    m1, m10 = pc["m1"], pc["m10"]
    # the cross join is the quadratic baseline: x100 at 10x
    assert m10["cross"] == 100 * m1["cross"]
    # runtime-scaled k (the registered q260/q261 shape): candidate
    # pairs must grow ~linearly — well under half the quadratic
    # exponent. Measured ~9.8x at 10x; 20x is the alarm threshold.
    scaled_ratio = m10["cells_k_scaled"] / m1["cells_k_scaled"]
    assert scaled_ratio < 20, scaled_ratio
    # the pinned-k ablation shows why runtime scaling matters:
    # super-linear growth (cells get denser as the corpus grows)
    fixed_ratio = m10["cells_k_fixed"] / m1["cells_k_fixed"]
    assert fixed_ratio > scaled_ratio * 2


def test_hundredx_tier_exponent_stays_linear(art):
    pc = art["bitext_candidate_pairs"]
    if "m100" not in pc:
        pytest.skip("m100 tier not generated")
    m1, m100 = pc["m1"], pc["m100"]
    assert m100["cells_k_scaled_k"] == 100 * m1["cells_k_scaled_k"]
    # exponent over two decades: log100(pairs ratio) ~ 1 for a
    # linear law (quadratic would be 2)
    exp = math.log(m100["cells_k_scaled"] / m1["cells_k_scaled"]) / math.log(
        100
    )
    assert exp < 1.3, exp
    # and the 100x cross-join witness is exactly quadratic
    assert m100["cross"] == 10_000 * m1["cross"]


def test_streaming_state_bounded_by_key_cardinality(art):
    st = art.get("streaming_state")
    if not st:
        pytest.skip("streaming_state section not generated")
    m1, m10 = st["m1"], st["m10"]
    # windowed rollup & WAU sketch: surviving state rows are
    # windows-x-groups in the watermark horizon — IDENTICAL at 10x
    # event density and 10x users
    for probe in ("windowed_rollup", "wau_approx_distinct"):
        assert m10[probe]["state_rows"] == m1[probe]["state_rows"], probe
    # the GC actually ran on both legs (rows were written + evicted,
    # not never-created)
    assert m1["windowed_rollup"]["rows_removed_last_batch"] > 0
    assert m10["windowed_rollup"]["rows_removed_last_batch"] > 0
    # dedup-by-event-id is the honest contrast: keys ARE events, so
    # in-horizon state grows with density (still horizon-bounded,
    # never history-bounded)
    assert (
        m10["dedup_ids"]["state_rows"]
        > 2 * m1["dedup_ids"]["state_rows"]
    )


def test_provenance_note_names_the_runtime_scaled_shapes(art):
    prov = art.get("provenance", {})
    assert "q260" in prov.get("q260_q261_note", "")
    assert "RUNTIME" in prov.get("q260_q261_note", "")
