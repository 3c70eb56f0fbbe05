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


def test_sf_mismatch_disqualifies_baseline(tmp_path):
    b = _bench()
    d = str(tmp_path)
    other_sf = _write(
        d,
        "BENCH_r05.json",
        {"queries": {"q1": 1.0}, "spark_probe_sec": 0.2, "sf": "0.01"},
    )
    assert b.compare_prev([other_sf], {"q1": 1.0}, 0.2, "0.1") is None
