#!/usr/bin/env python
"""Guard against driver value-hash canonicalization drift: every oracle's
Arrow output schema must contain only int64/double/string/bool/binary/float/
list columns.

Why: DuckDB silently widens SUM(INTEGER)/SUM(BIGINT)/count_if results to
HUGEINT, which surfaces as Arrow decimal128(38,0); int32 and date32 sneak in
from len()/generate_subscripts/DATE casts. The external correctness gate
hashes those differently from the Spark side's int64/double even when values
are equal — every round-2 hash failure was exactly this. List columns are
also rejected (r5 finding): the gate's pandas canonicalizer raises
`unhashable type: 'list'` on array cells, so any collect_list/array-valued
final column must be serialized (array_join / scaled-int string) on BOTH
sides before registration. Run after adding or editing any oracle:

    PYTHONPATH=/root/repo python tools/audit_oracle_types.py
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
CANONICAL = {"int64", "double", "string", "large_string", "bool", "binary", "float"}


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad: dict[str, list[tuple[str, str]]] = {}
    oracles = entrymod.oracle_sql()
    for name, sql in oracles.items():
        try:
            schema = con.sql(sql).arrow().schema
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:120]}")
            bad[name] = [("<query failed>", "")]
            continue
        susp = [
            (f.name, str(f.type))
            for f in schema
            if str(f.type) not in CANONICAL
        ]
        if susp:
            bad[name] = susp
            print(f"BAD  {name}: {susp}")
    print(f"\n{len(oracles)} oracles checked, {len(bad)} non-canonical")
    if bad:
        print("fix: CAST the offending oracle columns to BIGINT/DOUBLE/VARCHAR "
              "and align the Spark side")
        sys.exit(1)
    print("OK: all oracle outputs canonical")


if __name__ == "__main__":
    main()
