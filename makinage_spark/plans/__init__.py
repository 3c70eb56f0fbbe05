"""Dataflow-graph layer: YAML config → wired Spark pipelines.

Reference: the YAML config is the plan (topics + operators,
config.sample.yml:1-17, docs/configuration.rst:35-57), compiled by
``create_operators`` (makinage/operator.py:162-279). Here the same graph shape
compiles to DataFrame transforms: topics become source/sink DataFrames,
operator factories are loaded by ``module:function`` spec and called as
``factory(config, *source_dfs) -> (sink_dfs, ...)`` — the reference's exact
factory contract (makinage/operator.py:229) with DataFrames in place of
observables.
"""

from makinage_spark.plans.loader import import_function
from makinage_spark.plans.graph import compile_graph, run_graph

__all__ = ["import_function", "compile_graph", "run_graph"]
