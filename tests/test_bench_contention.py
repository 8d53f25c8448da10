"""The bench harness's machine-readable contention verdict
(VERDICT r11 #3): a noisy run must be discountable mechanically, not
by reading COVERAGE.md prose. Pure-function tests — no Spark."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


QUIET_CANON = {"sf": 0.1, "calib_sec": 0.2716, "calib_par_sec": 0.4183}


def test_quiet_run_is_not_contended(monkeypatch):
    monkeypatch.setattr(bench, "_canonical_detail", lambda: QUIET_CANON)
    sig = bench._contention_verdict(
        calibs=[0.2716, 0.2720, 0.2718],
        calib_par=0.4185,
        spreads=[0.02, 0.05, 0.03, 0.01],
        sf=0.1,
    )
    assert sig["contended"] is False
    assert sig["flags"] == {
        "drift": False,
        "spread": False,
        "canonical": False,
        "normalized": False,
    }
    assert sig["calib_vs_canonical"] == 1.0


def test_round11_driver_artifact_flags_on_canonical(monkeypatch):
    # the motivating case: calib 0.2778 / par 0.4303 vs the quiet
    # pair's 0.2716 / 0.4183 (+2.3 % / +2.9 %) while the headline
    # moved +13.6 % — both yardsticks breach the 2 % same-machine
    # threshold
    monkeypatch.setattr(bench, "_canonical_detail", lambda: QUIET_CANON)
    sig = bench._contention_verdict(
        calibs=[0.2778, 0.2781, 0.2779],
        calib_par=0.4303,
        spreads=[0.05, 0.08, 0.04],
        sf=0.1,
    )
    assert sig["contended"] is True
    assert sig["flags"]["canonical"] is True
    assert sig["flags"]["drift"] is False  # steady load, not a burst


def test_midrun_load_burst_flags_on_drift(monkeypatch):
    monkeypatch.setattr(bench, "_canonical_detail", lambda: None)
    sig = bench._contention_verdict(
        calibs=[0.2716, 0.3100, 0.2720],  # +14 % mid-run
        calib_par=0.42,
        spreads=[0.03, 0.02],
        sf=0.1,
    )
    assert sig["contended"] is True
    assert sig["flags"]["drift"] is True
    assert sig["calib_vs_canonical"] is None  # no canonical — skipped


def test_noisy_repeats_flag_on_spread(monkeypatch):
    monkeypatch.setattr(bench, "_canonical_detail", lambda: None)
    sig = bench._contention_verdict(
        calibs=[0.27, 0.27, 0.27],
        calib_par=0.42,
        spreads=[0.35, 0.6, 0.1, 0.4, 0.3],
        sf=0.1,
    )
    assert sig["contended"] is True
    assert sig["flags"]["spread"] is True


def test_different_machine_skips_canonical_signal(monkeypatch):
    # a 30 % faster VM is a machine change, not contention — the
    # canonical comparison must go null instead of flagging
    monkeypatch.setattr(bench, "_canonical_detail", lambda: QUIET_CANON)
    sig = bench._contention_verdict(
        calibs=[0.19, 0.19, 0.19],
        calib_par=0.30,
        spreads=[0.02],
        sf=0.1,
    )
    assert sig["calib_vs_canonical"] is None
    assert sig["flags"]["canonical"] is False


NORM_CANON = {
    "sf": 0.1,
    "calib_sec": 0.2716,
    "calib_par_sec": 0.4183,
    "value_norm": 171.9,
}


def test_uniform_load_flags_on_normalized_headline(monkeypatch):
    """The VERDICT r12 #3 blind spot: uniform whole-run co-tenant
    load barely moves the single-thread fold (drift quiet, canonical
    comparisons within 2 %) and repeats consistently (spread quiet),
    but parallel throughput is halved so the calibration-normalized
    headline balloons. Fixture numbers from this round's observed
    bursts: calib within 1 %, value_norm +18 %."""
    monkeypatch.setattr(bench, "_canonical_detail", lambda: NORM_CANON)
    sig = bench._contention_verdict(
        calibs=[0.2720, 0.2730, 0.2725],
        calib_par=0.4200,
        spreads=[0.04, 0.06, 0.05],
        sf=0.1,
        value_norm=202.8,  # +18 % normalized
    )
    assert sig["flags"]["drift"] is False
    assert sig["flags"]["spread"] is False
    assert sig["flags"]["canonical"] is False
    assert sig["flags"]["normalized"] is True
    assert sig["contended"] is True
    assert sig["value_norm_vs_canonical"] == round(202.8 / 171.9, 4)


def test_quiet_normalized_headline_does_not_flag(monkeypatch):
    monkeypatch.setattr(bench, "_canonical_detail", lambda: NORM_CANON)
    sig = bench._contention_verdict(
        calibs=[0.2716, 0.2720, 0.2718],
        calib_par=0.4185,
        spreads=[0.02, 0.05],
        sf=0.1,
        value_norm=175.0,  # +1.8 % — inside the r12 trio spread
    )
    assert sig["flags"]["normalized"] is False
    assert sig["contended"] is False


def test_pre_value_norm_canonical_skips_normalized(monkeypatch):
    # canonical without value_norm (pre-r13 artifact) → signal null
    monkeypatch.setattr(bench, "_canonical_detail", lambda: QUIET_CANON)
    sig = bench._contention_verdict(
        calibs=[0.2716],
        calib_par=0.4185,
        spreads=[0.02],
        sf=0.1,
        value_norm=200.0,
    )
    assert sig["value_norm_vs_canonical"] is None
    assert sig["flags"]["normalized"] is False


def test_off_sf_run_skips_canonical_signal(monkeypatch):
    monkeypatch.setattr(bench, "_canonical_detail", lambda: QUIET_CANON)
    sig = bench._contention_verdict(
        calibs=[0.2778],
        calib_par=0.4303,
        spreads=[0.02],
        sf=0.01,
    )
    assert sig["calib_vs_canonical"] is None
    assert sig["flags"]["canonical"] is False
