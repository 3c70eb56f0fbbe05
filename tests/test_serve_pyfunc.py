"""The MLflow pyfunc loading branch (reference makinage/serve/serve.py:22-28):
``load_model`` unzips the published blob and hands the directory to
``mlflow.pyfunc.load_model``. mlflow isn't installed in this container, so a
minimal stub module is injected into sys.modules to execute the real
unzip→extract→load path over a real zip artifact; the loaded model then runs
through the full serve pipeline to a golden prediction."""

from __future__ import annotations

import io
import os
import sys
import types
import zipfile

import pandas as pd
import pytest

import makinage_spark.serve as mserve


def _stub_pyfunc_model(ratio: float):
    """What mlflow.pyfunc.load_model returns: an object with .predict.
    Closure-based (not a test-module class) so cloudpickle ships it to
    executors by value — workers never import this test module."""

    def predict(features: pd.DataFrame):
        return features.iloc[:, 0] * ratio

    return types.SimpleNamespace(predict=predict, ratio=ratio)


def _install_stub_mlflow(monkeypatch):
    """A fake mlflow.pyfunc whose load_model reads the EXTRACTED artifact
    directory — verifying load_model() really unzipped the blob there."""
    loaded_paths: list[str] = []

    def load_model(path: str):
        loaded_paths.append(path)
        # the stub insists on MLflow's artifact layout: an MLmodel file
        # plus the model payload, both present only if the zip extracted
        assert os.path.isfile(os.path.join(path, "MLmodel"))
        with open(os.path.join(path, "ratio.txt")) as f:
            return _stub_pyfunc_model(float(f.read().strip()))

    pyfunc = types.ModuleType("mlflow.pyfunc")
    pyfunc.load_model = load_model
    mlflow = types.ModuleType("mlflow")
    mlflow.pyfunc = pyfunc
    monkeypatch.setitem(sys.modules, "mlflow", mlflow)
    monkeypatch.setitem(sys.modules, "mlflow.pyfunc", pyfunc)
    return loaded_paths


def _model_blob(ratio: float) -> bytes:
    """A real zip artifact in the published-model wire shape."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("MLmodel", "flavors:\n  python_function:\n    loader_module: stub\n")
        zf.writestr("ratio.txt", str(ratio))
    return buf.getvalue()


def test_load_model_unzips_and_loads(monkeypatch):
    loaded = _install_stub_mlflow(monkeypatch)
    model = mserve.load_model(_model_blob(2.5))
    assert model.ratio == 2.5
    # load_model extracted to a fresh temp dir and passed THAT to pyfunc
    assert len(loaded) == 1 and os.path.isdir(loaded[0])


def test_load_model_import_gate_without_mlflow(monkeypatch):
    monkeypatch.setitem(sys.modules, "mlflow", None)  # force ImportError
    monkeypatch.setitem(sys.modules, "mlflow.pyfunc", None)
    with pytest.raises(ImportError, match="predict"):
        mserve.load_model(_model_blob(1.0))


def test_pyfunc_model_through_serve_pipeline(monkeypatch, spark):
    """Golden: blob → load_model → model.predict through serve()'s
    mapInPandas path, no custom predict: spec (serve.py:128-133 lifecycle)."""
    _install_stub_mlflow(monkeypatch)
    model = mserve.load_model(_model_blob(3.0))
    data = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    out = mserve.serve(
        {"input_field": "x", "output_field": "pred"},
        data,
        model=model,
        output_schema="x double, pred double",
    )
    assert sorted((r.x, r.pred) for r in out.collect()) == [
        (1.0, 3.0),
        (2.0, 6.0),
    ]


def test_pyfunc_hot_swap_two_blobs(monkeypatch, spark):
    """Two published blobs = two loads = two ratios (the model-topic
    hot-swap contract, serve.py:104-148), each verified by prediction."""
    _install_stub_mlflow(monkeypatch)
    data = spark.createDataFrame([(10.0,)], "x double")
    for ratio, want in ((2.0, 20.0), (7.0, 70.0)):
        model = mserve.load_model(_model_blob(ratio))
        out = mserve.serve(
            {"input_field": "x"},
            data,
            model=model,
            output_schema="x double, pred double",
        )
        assert [r.pred for r in out.collect()] == [want]
