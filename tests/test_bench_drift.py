"""bench.py's drift tripwire (VERDICT r10 item 2): per-query
comparison against the stored certified-idle band, active ONLY on
calibration-clean runs — so host-load noise self-reports as 'not
clean' instead of consuming a hand A/B each round. Pure-Python tests
(no Spark session)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


CLEAN = dict(md5_before=0.199, md5_after=0.200, steal_pct=0.02)


def _report(timings, sf=0.1, loadavg=(0.2, 0.0, 0.0), **kw):
    args = {**CLEAN, **kw}
    return bench._drift_report(
        timings,
        sf,
        args["md5_before"],
        args["md5_after"],
        args["steal_pct"],
        list(loadavg),
    )


def test_clean_run_within_band_has_no_flags():
    ref = json.load(open(os.path.join(os.path.dirname(bench.__file__), "BENCH_REFERENCE.json")))
    r = _report(dict(ref["queries"]))  # exactly the reference values
    assert r["calibration_clean"] is True
    assert r["flags"] == [] and r["not_clean_reasons"] == []


def test_clean_run_flags_only_queries_past_threshold():
    r = _report({"route_topics": 2.5, "stats_counters": 0.76})
    assert r["calibration_clean"] is True
    assert [f["query"] for f in r["flags"]] == ["route_topics"]
    f = r["flags"][0]
    assert f["ref_sec"] == 1.697 and f["drift_pct"] > 20


def test_faster_is_never_flagged():
    # one-directional: improvements are not drift
    r = _report({"route_topics": 0.9})
    assert r["flags"] == []


def test_hot_run_reports_not_clean_and_suppresses_flags():
    r = _report({"route_topics": 9.9}, md5_before=0.31, steal_pct=1.5, loadavg=(4.8, 0, 0))
    assert r["calibration_clean"] is False
    assert r["flags"] == []
    assert len(r["not_clean_reasons"]) == 3  # md5, steal, loadavg all cited


def test_other_sf_is_out_of_band():
    r = _report({"route_topics": 9.9}, sf=1.0)
    assert r["calibration_clean"] is False
    assert "reference sf" in r["not_clean_reasons"][0]
    assert r["flags"] == []


def test_unknown_query_is_ignored():
    r = _report({"brand_new_query": 99.0})
    assert r["calibration_clean"] is True and r["flags"] == []
