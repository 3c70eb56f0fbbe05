"""t-digest: mergeable streaming quantile sketch (rs.math.dist parity).

The reference's distribution operator family is t-digest-based
(``rs.math.dist``, README.rst:186 — the "real-time histogram" article). Spark's
built-in ``percentile_approx`` is a different mergeable sketch (GK); this
module supplies actual t-digest semantics — mean-centroid clusters sized by
the quantile scale function, so tail quantiles stay sharp — as a two-stage
distributed aggregation:

1. :func:`partial_digests` — ``mapInPandas``: one compressed digest per Arrow
   batch per key (narrow, no shuffle; O(delta) state per key per batch).
2. :func:`merge_digests` — ``groupBy(keys).applyInPandas``: concatenate
   centroid sets and re-compress (t-digests merge losslessly-enough by
   construction; one shuffle of digests, never of data).

This is exactly the partial/final split of a distributive aggregate, so the
same code serves batch tables and ``foreachBatch`` streaming accumulation.
Digest size is O(delta) independent of data volume — the 100 TB path ships
kilobytes per key to the reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "compress",
    "digest_quantile",
    "partial_digests",
    "merge_digests",
    "digest_quantiles_df",
]


def compress(
    means: np.ndarray, weights: np.ndarray, delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (mean, weight) centroids into ≤O(delta) clusters, bounding each
    cluster's weight by the classic scale limit ``4·W·q(1-q)/delta`` — small
    near the tails (sharp extreme quantiles), large in the middle."""
    if len(means) == 0:
        return means.astype(float), weights.astype(float)
    means = np.asarray(means, dtype=float)
    weights = np.asarray(weights, dtype=float)
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (w_before + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= limit:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def digest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate quantile ``q`` from a digest: linear interpolation between
    centroid midpoints on the cumulative-weight axis."""
    means = np.asarray(means, dtype=float)
    weights = np.asarray(weights, dtype=float)
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    # centroid midpoints in cumulative-weight space
    cum = np.cumsum(weights) - weights / 2.0
    target = q * total
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    return float(np.interp(target, cum, means))


def partial_digests(
    df: DataFrame, value_col: str, by: list[str], delta: float = 100.0
) -> DataFrame:
    """Stage 1: per-Arrow-batch, per-key compressed digests (narrow map)."""
    key_schema = ", ".join(f"{k} {t}" for k, t in df.select(*by).dtypes)
    schema = f"{key_schema}, means array<double>, weights array<double>"

    def _fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {k: [] for k in by} | {"means": [], "weights": []}
            for keys, grp in pdf.groupby(by, sort=False):
                keys = keys if isinstance(keys, tuple) else (keys,)
                vals = grp[value_col].to_numpy(dtype=float)
                m, w = compress(vals, np.ones_like(vals), delta)
                for k, v in zip(by, keys):
                    rows[k].append(v)
                rows["means"].append(m.tolist())
                rows["weights"].append(w.tolist())
            yield pd.DataFrame(rows)

    return df.select(*by, value_col).mapInPandas(_fn, schema=schema)


def merge_digests(partials: DataFrame, by: list[str], delta: float = 100.0) -> DataFrame:
    """Stage 2: shuffle digests (not data) on the key and re-compress."""
    key_schema = ", ".join(f"{k} {t}" for k, t in partials.select(*by).dtypes)
    schema = f"{key_schema}, means array<double>, weights array<double>"

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, dtype=float) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype=float) for x in pdf["weights"]])
        mm, mw = compress(m, w, delta)
        out = pdf.iloc[:1][by].copy()
        out["means"] = [mm.tolist()]
        out["weights"] = [mw.tolist()]
        return out

    return partials.groupBy(*by).applyInPandas(_merge, schema=schema)


def digest_quantiles_df(
    df: DataFrame,
    value_col: str,
    by: list[str],
    qs: list[float],
    delta: float = 100.0,
) -> DataFrame:
    """End-to-end: per-key t-digest quantile estimates ``q_<pct>`` columns."""
    merged = merge_digests(partial_digests(df, value_col, by, delta), by, delta)
    key_schema = ", ".join(f"{k} {t}" for k, t in merged.select(*by).dtypes)
    qcols = ", ".join(f"q_{int(q * 100)} double" for q in qs)
    schema = f"{key_schema}, {qcols}"

    def _extract(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[by].copy()
        for q in qs:
            out[f"q_{int(q * 100)}"] = [
                digest_quantile(m, w, q) for m, w in zip(pdf["means"], pdf["weights"])
            ]
        return out

    return merged.groupBy(*by).applyInPandas(
        lambda pdf: _extract(pdf), schema=schema
    )
