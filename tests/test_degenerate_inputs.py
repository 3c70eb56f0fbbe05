"""Degenerate-input sweep: every registered query must survive a fixture
containing the hostile rows a 100 TB corpus WILL contain — null text, empty
text, whitespace-only, single-token and two-token docs, unicode-only docs,
pathological repetition, null and all-zero embeddings, single-event users.

The r4 advisor found exactly this bug class (bigram ANSI INVALID_ARRAY_INDEX
on 0/1-token docs — fixtures just happened to contain none); this sweep makes
the class structurally impossible to reintroduce: the degenerate fixture is
part of the suite, so any future array-index / division / aggregation edge
crashes here first.
"""

import os

import pytest
from pyspark.sql import functions as F

from makinage_spark.queries import QUERIES

SRC = os.environ.get("SMOKE_SF_DIR", "/root/testdata/sf0.001")

#: excluded: stream_dedup_keys/stream_scan_running are excluded from smoke
#: per test_query_registry (heavy streaming), the rest of the streaming
#: family runs (it is exactly where degenerate rows get interesting).
SKIP = {"stream_dedup_keys", "stream_scan_running"}

DEGENERATE_DOCS = [
    (900001, None),
    (900002, ""),
    (900003, "   "),
    (900004, "solo"),
    (900005, "two tokens"),
    (900006, "héllo wörld üñïcødé tökèns"),
    (900007, "spam " * 50),
    (900008, "\n\t\r"),
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degenerate_sf"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        from makinage_spark.sources import load_table

        load_table(spark, SRC, t).write.parquet(f"{d}/{t}.parquet")
    from makinage_spark.sources import load_table

    docs = load_table(spark, SRC, "documents")
    extra = spark.createDataFrame(DEGENERATE_DOCS, "doc_id long, text string")
    base_cols = docs.columns
    for c in base_cols:
        if c not in ("doc_id", "text"):
            extra = extra.withColumn(
                c, F.lit("synthetic") if c == "source" else F.lit(None)
            )
    docs.unionByName(extra.select(base_cols)).write.parquet(
        f"{d}/documents.parquet"
    )
    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.filter("vec_id = 0").first()["embedding"])
    eextra = spark.createDataFrame(
        [(900001, None), (900002, [0.0] * dim)],
        "vec_id long, embedding array<float>",
    )
    for f in emb.schema.fields:
        if f.name not in ("vec_id", "embedding"):
            eextra = eextra.withColumn(
                f.name, F.lit(None).cast(f.dataType)
            )
    emb.unionByName(eextra.select(emb.columns)).write.parquet(
        f"{d}/embeddings.parquet"
    )
    return d


def test_all_queries_survive_degenerate_inputs(spark, degenerate_dir):
    failures = {}
    for name in sorted(set(QUERIES) - SKIP):
        try:
            QUERIES[name](spark, degenerate_dir).count()
        except Exception as e:  # noqa: BLE001 - collecting the full sweep
            failures[name] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            spark.catalog.clearCache()
    assert not failures, (
        f"{len(failures)} queries crash on degenerate inputs:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(failures.items()))
    )
