"""DataFrame-level operators: the relational skeleton of the engine.

Everything here is declarative (Catalyst-optimisable) column algebra;
the numeric kernels live in pyrate_spark.kernels and are attached via
grouped-map pandas UDFs in pyrate_spark.operators.grouped.
"""
