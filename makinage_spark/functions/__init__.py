"""Vectorized scalar function surface (SURVEY §2.3: the reference's arbitrary
Python lambdas → Arrow-batched pandas UDFs; built-in F.* preferred first)."""

from makinage_spark.functions.udfs import sigmoid100

__all__ = ["sigmoid100"]
