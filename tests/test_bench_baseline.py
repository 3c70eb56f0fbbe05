"""Unit tests for bench.py's cross-round baseline selection (extracted r10).

Three rounds of ADVICE findings hit this logic (same-round self-comparison,
the no-history 1+10**9 fallback, corrupt-JSON aborts); these tests pin every
rule without a Spark run.
"""

import importlib.util
import json
import os


def _bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(d, name, obj):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        if isinstance(obj, str):
            f.write(obj)
        else:
            json.dump(obj, f)
    return p


def test_no_driver_history_yields_no_candidates(tmp_path):
    b = _bench()
    d = str(tmp_path)
    _write(d, "BENCH_r01.json", {"queries": {"q": 1.0}})
    assert b.baseline_candidates(d) == []


def test_same_round_and_newer_artifacts_excluded(tmp_path):
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r09.json", {})
    _write(d, "BENCH_r08.json", {})
    _write(d, "BENCH_r09.json", {})
    _write(d, "BENCH_r10.json", {})  # current round's own output
    names = [os.path.basename(p) for p in b.baseline_candidates(d)]
    assert names == ["BENCH_r08.json", "BENCH_r09.json"]


def test_bench_prev_env_overrides_inference(tmp_path):
    b = _bench()
    d = str(tmp_path)
    p = _write(d, "BENCH_r03.json", {})
    assert b.baseline_candidates(d, env_prev=p) == [p]
    assert b.baseline_candidates(d, env_prev=p + ".missing") == []


def test_corrupt_and_truncated_baselines_fall_back(tmp_path):
    b = _bench()
    d = str(tmp_path)
    good = _write(
        d,
        "BENCH_r07.json",
        {"queries": {"q1": 2.0}, "spark_probe_sec": 0.2, "sf": "0.1"},
    )
    corrupt = _write(d, "BENCH_r08.json", "{corrupt json")
    truncated = _write(d, "BENCH_r09.json", {"parsed": None, "tail": "..."})
    # valid JSON, wrong top-level shape (ADVICE r10): must be skipped
    # per-candidate, not AttributeError out of the whole comparison
    wrong_shape = _write(d, "BENCH_r10.json", ["not", "a", "dict"])
    mp = b.compare_prev(
        [good, corrupt, truncated, wrong_shape], {"q1": 4.0}, 0.2, "0.1"
    )
    assert mp is not None
    assert mp["artifact"] == "BENCH_r07.json"
    assert mp["n_matched"] == 1
    assert mp["ratio_normalized"] == 2.0


def test_driver_wrapped_artifact_unwraps_parsed(tmp_path):
    b = _bench()
    d = str(tmp_path)
    wrapped = _write(
        d,
        "BENCH_r06.json",
        {
            "n": 1,
            "rc": 0,
            "parsed": {
                "queries": {"q1": 1.0, "q2": 3.0},
                "spark_probe_sec": 0.1,
                "sf": "0.1",
            },
        },
    )
    mp = b.compare_prev([wrapped], {"q1": 1.0, "q2": 3.0}, 0.1, "0.1")
    assert mp is not None and mp["n_matched"] == 2
    assert mp["ratio_normalized"] == 1.0


def test_local_artifacts_are_candidates_ordered_for_driver_first_scan(tmp_path):
    """VERDICT r11 task 5: BENCH_LOCAL_r{N}.json joins the candidate pool;
    within a round the oldest-first list puts LOCAL before the driver
    artifact so compare_prev's newest-first scan tries the driver one
    first and falls back to the same round's local artifact."""
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    _write(d, "BENCH_r10.json", {})
    _write(d, "BENCH_LOCAL_r10.json", {})
    _write(d, "BENCH_r11.json", {})
    _write(d, "BENCH_LOCAL_r11.json", {})
    _write(d, "BENCH_LOCAL_r12.json", {})  # current round's own output
    names = [os.path.basename(p) for p in b.baseline_candidates(d)]
    assert names == [
        "BENCH_LOCAL_r10.json",
        "BENCH_r10.json",
        "BENCH_LOCAL_r11.json",
        "BENCH_r11.json",
    ]


def test_truncated_driver_falls_back_to_same_round_local(tmp_path):
    """The unstick scenario itself: the newest driver artifact is
    tail-truncated (parsed: null, as BENCH_r{8..11} all were) — the
    comparison must land on the same round's parseable local artifact, not
    skip back an extra round."""
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    _write(
        d,
        "BENCH_r07.json",
        {"queries": {"q1": 8.0}, "spark_probe_sec": 0.2, "sf": 0.1},
    )
    _write(d, "BENCH_r11.json", {"n": 1, "rc": 0, "parsed": None, "tail": "…"})
    _write(
        d,
        "BENCH_LOCAL_r11.json",
        {"queries": {"q1": 2.0}, "spark_probe_sec": 0.2, "sf": 0.1},
    )
    mp = b.compare_prev(b.baseline_candidates(d), {"q1": 2.0}, 0.2, 0.1)
    assert mp is not None
    assert mp["artifact"] == "BENCH_LOCAL_r11.json"
    assert mp["ratio_normalized"] == 1.0


def test_write_local_artifact_merges_same_round_minima(tmp_path):
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    run1 = {
        "queries": {"q1": 2.0, "q2": 5.0},
        "spark_probe_sec": 0.3,
        "cpu_probe_sec": 0.1,
        "sf": 0.1,
        "value": 7.0,
    }
    p = b.write_local_artifact(d, run1)
    assert os.path.basename(p) == "BENCH_LOCAL_r12.json"
    run2 = {
        "queries": {"q1": 3.0, "q2": 4.0, "q3": 1.0},
        "spark_probe_sec": 0.2,
        "cpu_probe_sec": 0.15,
        "sf": 0.1,
        "value": 8.0,
    }
    b.write_local_artifact(d, run2)
    merged = json.load(open(p))
    assert merged["queries"] == {"q1": 2.0, "q2": 4.0, "q3": 1.0}
    assert merged["n_runs_merged"] == 2
    assert merged["spark_probe_sec"] == 0.2
    assert merged["cpu_probe_sec"] == 0.1
    assert merged["value"] == 7.0  # recomputed from merged minima
    assert merged["value_normalized"] == round(7.0 / 0.2, 3)


def test_write_local_artifact_failed_query_rules(tmp_path):
    """A query that failed in EVERY merged run keeps value null; one that
    succeeded in any run contributes its minimum and clears the flag."""
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    b.write_local_artifact(
        d, {"queries": {"q1": 2.0}, "failed": ["qq"], "value": None,
            "partial_total": 2.0, "spark_probe_sec": 0.2, "sf": 0.1}
    )
    p = os.path.join(d, "BENCH_LOCAL_r12.json")
    # run 2: qq still failing -> stays null
    b.write_local_artifact(
        d, {"queries": {"q1": 2.5}, "failed": ["qq"], "value": None,
            "partial_total": 2.5, "spark_probe_sec": 0.2, "sf": 0.1}
    )
    m = json.load(open(p))
    assert m["value"] is None and m["failed"] == ["qq"]
    # run 3: qq recovered -> flag clears, totals recompute over minima
    b.write_local_artifact(
        d, {"queries": {"q1": 2.2, "qq": 9.0}, "value": 11.2,
            "spark_probe_sec": 0.25, "sf": 0.1}
    )
    m = json.load(open(p))
    assert "failed" not in m
    assert m["value"] == 11.0 and m["n_runs_merged"] == 3


def test_write_local_artifact_sf_change_skips_instead_of_merging(tmp_path):
    """Merging runs at different scale factors would corrupt the per-query
    minima AND slip past compare_prev's sf guard next round — and an off-sf
    run must not RESTART the artifact either (a casual sf0.001 smoke once
    wiped a committed min-of-13 sf0.1 series): the file stays untouched
    and the call returns None, same contract as the core-count guard."""
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    p = b.write_local_artifact(
        d, {"queries": {"q1": 2.0}, "spark_probe_sec": 0.2, "sf": 0.1,
            "value": 2.0}
    )
    assert b.write_local_artifact(
        d, {"queries": {"q1": 20.0}, "spark_probe_sec": 0.2, "sf": 1.0,
            "value": 20.0}
    ) is None
    m = json.load(open(p))
    assert m["sf"] == 0.1
    assert m["queries"] == {"q1": 2.0}  # untouched, NOT restarted
    assert m["n_runs_merged"] == 1


def test_write_local_artifact_failed_survives_query_removal(tmp_path):
    """A query that failed in run 1 and was absent from run 2's set has
    still never succeeded — the union rule keeps value null instead of the
    old intersection silently forgetting the failure."""
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    b.write_local_artifact(
        d, {"queries": {"q1": 2.0}, "failed": ["qq"], "value": None,
            "partial_total": 2.0, "spark_probe_sec": 0.2, "sf": 0.1}
    )
    b.write_local_artifact(
        d, {"queries": {"q1": 2.5}, "value": 2.5,
            "spark_probe_sec": 0.2, "sf": 0.1}
    )
    m = json.load(open(os.path.join(d, "BENCH_LOCAL_r12.json")))
    assert m["value"] is None and m["failed"] == ["qq"]


def test_write_local_artifact_contended_taints_merged_series(tmp_path):
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    b.write_local_artifact(
        d, {"queries": {"q1": 2.0}, "value": 2.0, "spark_probe_sec": 0.2,
            "sf": 0.1, "contended": True}
    )
    b.write_local_artifact(
        d, {"queries": {"q1": 1.8}, "value": 1.8, "spark_probe_sec": 0.2,
            "sf": 0.1}
    )
    m = json.load(open(os.path.join(d, "BENCH_LOCAL_r12.json")))
    assert m["contended"] is True  # the quiet run must not launder the tag


def test_write_local_artifact_core_count_guard(tmp_path):
    """A run at a different core count (the driver's scaling leg) must
    neither min-merge into the series — tiny queries can be FASTER at low
    width, planting cross-config minima — nor restart the artifact the way
    an sf change does: the file stays untouched and the call returns None.
    A legacy same-round artifact without a "cpus" key keeps merging."""
    b = _bench()
    d = str(tmp_path)
    _write(d, "CORRECTNESS_r11.json", {})
    p = b.write_local_artifact(
        d, {"queries": {"q1": 2.0}, "value": 2.0, "spark_probe_sec": 0.2,
            "sf": 0.1, "cpus": 32}
    )
    # 8-core run, faster on q1: must not touch the 32-core series
    assert b.write_local_artifact(
        d, {"queries": {"q1": 1.0}, "value": 1.0, "spark_probe_sec": 0.2,
            "sf": 0.1, "cpus": 8}
    ) is None
    m = json.load(open(p))
    assert m["queries"] == {"q1": 2.0}
    assert m["n_runs_merged"] == 1
    assert m["cpus"] == 32
    # legacy artifact (no cpus key): a keyed run merges and stamps the key
    os.remove(p)
    b.write_local_artifact(
        d, {"queries": {"q1": 2.0}, "value": 2.0, "spark_probe_sec": 0.2,
            "sf": 0.1}
    )
    b.write_local_artifact(
        d, {"queries": {"q1": 1.5}, "value": 1.5, "spark_probe_sec": 0.2,
            "sf": 0.1, "cpus": 32}
    )
    m = json.load(open(p))
    assert m["queries"] == {"q1": 1.5}
    assert m["n_runs_merged"] == 2
    assert m["cpus"] == 32
    # the OTHER missing-key direction (ADVICE r12): prev keyed, out built by
    # an external caller without "cpus" — must merge, not silently skip
    # (the old asymmetric get() evaluated 32 != None and returned None)
    b.write_local_artifact(
        d, {"queries": {"q1": 1.2}, "value": 1.2, "spark_probe_sec": 0.2,
            "sf": 0.1}
    )
    m = json.load(open(p))
    assert m["queries"] == {"q1": 1.2}
    assert m["n_runs_merged"] == 3
    assert m["cpus"] == 32  # the unkeyed run must not strip the stamp


def test_write_local_artifact_requires_driver_history(tmp_path):
    b = _bench()
    d = str(tmp_path)
    assert b.write_local_artifact(d, {"queries": {"q": 1.0}}) is None
    assert not os.listdir(d)


def test_sf_mismatch_disqualifies_baseline(tmp_path):
    b = _bench()
    d = str(tmp_path)
    other_sf = _write(
        d,
        "BENCH_r05.json",
        {"queries": {"q1": 1.0}, "spark_probe_sec": 0.2, "sf": "0.01"},
    )
    assert b.compare_prev([other_sf], {"q1": 1.0}, 0.2, "0.1") is None
