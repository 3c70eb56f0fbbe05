"""Topic serde (reference: makinage/encoding/{string,json,pickle,none}.py).

Each encoding maps between a raw ``value: binary`` column (the Kafka wire
format) and typed columns. An encoding is a pair of DataFrame transforms
``(encode, decode)`` — the same shape as the reference's
``encoder() -> (encode, decode)`` (makinage/encoding/string.py:1-17), but
operating on whole columns:

- ``string`` (default, makinage/operator.py:37-41) — utf-8 cast.
- ``json``   — ``from_json``/``to_json`` with a declared StructType; schemas
  are required by Spark and are the documented improvement over the
  reference's schema-on-read dicts (SURVEY §1.2).
- ``none``   — raw bytes pass-through (model blobs, config.sample.serve.yml:7).
- ``pickle`` — arbitrary Python objects via a pandas UDF; a compatibility shim
  only — it forces the Python boundary and blocks pushdown. Documented as the
  non-columnar escape hatch (SURVEY §7.2).
"""

from makinage_spark.encodings.codecs import (
    ENCODINGS,
    json_decode,
    json_encode,
    none_decode,
    none_encode,
    pickle_decode,
    pickle_encode,
    string_decode,
    string_encode,
)

__all__ = [
    "ENCODINGS",
    "string_encode",
    "string_decode",
    "json_encode",
    "json_decode",
    "pickle_encode",
    "pickle_decode",
    "none_encode",
    "none_decode",
]
