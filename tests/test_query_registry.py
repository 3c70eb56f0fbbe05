"""Registry-wide smoke gate: every ``queries()`` entry must run at the smoke
scale (sf0.001) and produce a stable, sane result.

This is the local twin of the driver's t1 smoke + a schema-stability check:
each query returns a non-empty schema, runs end-to-end, and (run twice) gives
the same row count — catching nondeterminism before the oracle gate does.
The value-level oracle comparison lives in tools/check_correctness.py (t2).
"""

import os

import pytest

from makinage_spark.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SMOKE_SF_DIR", "/root/testdata/sf0.001")

#: Streaming queries spin up a real StreamingQuery each call (~2s apiece);
#: run a representative pair rather than all of them on every pytest pass.
SLOW_STREAMING = {"stream_hourly_counts", "stream_roll_windows"}
SKIP_IN_SMOKE = {"stream_dedup_keys", "stream_scan_running"}
SLOW_STREAMING = SLOW_STREAMING | {"stream_stream_join", "stream_sliding_window", "graph_multiply_streaming"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP_IN_SMOKE))
def test_query_runs_at_smoke_scale(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.schema.fields, f"{name}: empty schema"
    n = df.count()
    assert n >= 0
    # deterministic: same count on re-execution (fresh plan)
    if name not in SLOW_STREAMING:
        df2 = QUERIES[name](spark, SF_DIR)
        assert df2.count() == n, f"{name}: nondeterministic row count"


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_registry_size_floor():
    # coverage must never silently shrink across rounds
    assert len(QUERIES) >= 180
    assert len(ORACLES) >= 172


def test_bigram_logprob_short_docs_do_not_crash(spark, tmp_path):
    """ADVICE r4 (high): docs with 0/1 tokens must not trip Spark 4 ANSI
    INVALID_ARRAY_INDEX in the bigram expansion — they simply contribute no
    bigrams (matching the oracle's empty generate_series)."""
    import pyspark.sql.functions as F

    d = tmp_path / "sfmini"
    d.mkdir()
    docs = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, None), (3, "two tokens here and more")],
        "doc_id long, text string",
    )
    docs.write.parquet(str(d / "documents.parquet"))
    out = QUERIES["bigram_logprob_score"](spark, str(d)).collect()
    assert {r.doc_id for r in out} == {3}
    assert all(r.n_bigrams >= 1 for r in out)
