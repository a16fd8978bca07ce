"""scale_probe harness logic that must not regress: the fresh-JVM
anomaly re-measurement rewrite (VERDICT r11 item 4a). Pure-dict tests —
the subprocess measurer is injected, no Spark involved."""

from __future__ import annotations

import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "scale_probe", os.path.join(_ROOT, "scripts", "scale_probe.py")
)
scale_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scale_probe)


def _row(sf01, sf1):
    return {
        "sf0.1_s": sf01,
        "sf1_s": sf1,
        "ratio": round(sf1 / sf01, 2),
        "sf0.1_passes": [sf01, sf01 + 0.1],
        "sf1_passes": [sf1, sf1 + 0.1],
    }


def test_under_ratio_rows_untouched():
    table = {"q": _row(1.0, 8.0)}
    calls = []
    scale_probe.apply_remeasure(
        table, "/sf1", measure=lambda n, d: calls.append((n, d))
    )
    assert calls == []
    assert table["q"]["ratio"] == 8.0
    assert "remeasured_fresh_jvm" not in table["q"]


def test_over_ratio_row_rewritten_with_in_harness_kept():
    table = {"q": _row(1.0, 22.0)}  # the r11 q2_ann_pq_idx shape

    def fake(name, d):
        assert name == "q" and d == "/sf1"
        return {"passes": [2.9, 2.5, 2.6], "min": 2.5}

    scale_probe.apply_remeasure(table, "/sf1", measure=fake)
    row = table["q"]
    assert row["sf1_s"] == 2.5
    assert row["ratio"] == 2.5
    assert row["sf1_in_harness_s"] == 22.0
    assert row["sf1_in_harness_passes"] == [22.0, 22.1]
    assert row["remeasured_fresh_jvm"] is True


def test_still_anomalous_triggers_sf01_remeasure():
    # Fresh sf1 = 12 s against an artificially fast (memo-warm) sf0.1 of
    # 0.5 s would still read 24x; the harness then re-measures the sf0.1
    # side fresh too, and the honest ratio lands under the bound.
    table = {"q": _row(0.5, 30.0)}
    seen = []

    def fake(name, d):
        seen.append(d)
        if d == "/sf1":
            return {"passes": [12.0, 12.5, 13.0], "min": 12.0}
        return {"passes": [1.5, 1.6, 1.7], "min": 1.5}

    scale_probe.apply_remeasure(table, "/sf1", measure=fake, sf01_dir="/sf01")
    row = table["q"]
    assert seen == ["/sf1", "/sf01"]
    assert row["sf1_s"] == 12.0 and row["sf0.1_s"] == 1.5
    assert row["ratio"] == 8.0
    assert row["sf0.1_in_harness_s"] == 0.5
    # raw in-harness passes must ride along on BOTH sides (ADVICE r12 —
    # the sf0.1 branch used to drop them)
    assert row["sf0.1_in_harness_passes"] == [0.5, 0.6]
    assert row["sf0.1_passes"] == [1.5, 1.6, 1.7]


def test_failed_remeasure_leaves_row_intact():
    table = {"q": _row(1.0, 22.0)}
    scale_probe.apply_remeasure(table, "/sf1", measure=lambda n, d: None)
    assert table["q"]["sf1_s"] == 22.0
    assert "remeasured_fresh_jvm" not in table["q"]


def test_two_sweep_battery_structure(spark):
    """Two-sweep mode (round-13 order-decorrelation lever): same output
    contract as the default battery — min-of-two headline + both raw
    passes — plus the order marker, with pass 1 from the forward sweep
    and pass 2 from the reversed sweep."""
    names = ["dedup_exact", "ta_token_count"]
    out = scale_probe.time_queries(
        "/root/testdata/sf0.001", names=names, two_sweep=True
    )
    assert out["__battery_order__"] == "two_sweep_reversed"
    for n in names:
        assert len(out[f"{n}__passes"]) == 2
        assert out[n] == min(out[f"{n}__passes"])
