"""Sample serve hooks (reference: makinage/sample/serve.py:1-39) — the custom
predict / pre / post functions a serve config references by ``module:function``
spec (docs/configuration.rst:55, serve.py:31-43,60-79)."""

from __future__ import annotations

import pandas as pd


def ratio_predict(model, features: pd.DataFrame):
    """Custom predict hook: multiply the input by the model's ratio — the
    hot-swappable "zero model × ratio" scenario of tests/test_serve.py:49-131."""
    ratio = (model or {}).get("ratio", 1)
    return (features.iloc[:, 0].astype(float) * 0.0 + ratio).tolist()


def pre_mean_center(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sample pre-transform (serve.py:60-79 shape)."""
    out = pdf[["x"]].copy()
    out["x"] = out["x"] - out["x"].mean()
    return out


def post_with_input(pdf: pd.DataFrame, predictions) -> pd.DataFrame:
    """Sample post-transform: predictions alongside the raw input."""
    out = pdf.copy()
    out["pred"] = [float(p) for p in predictions]
    return out


def double_predict(model, features: pd.DataFrame):
    """Deterministic predict hook for the correctness gate: 2× the first
    feature column (exact double arithmetic — oracle-portable)."""
    return (features.iloc[:, 0].astype(float) * 2.0).tolist()
