"""Physical-plan introspection shared by tests and the SCALE.md audit.

One home for the ``explainString`` incantation: the plan-shape
assertions (no BroadcastExchange in the Bloom probe, mapInPandas barrier
above the fetch join, ...) and the generated SCALE.md audit must all
read plans rendered the same way, or a rendering change makes them
silently diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as ``df.explain(mode)`` would print it.

    ``mode`` is any Spark ExplainMode name: ``simple``, ``extended``,
    ``codegen``, ``cost``, ``formatted``.
    """
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
