"""Pipeline audit metrics without extra scans (SURVEY.md §2.4 A12).

The reference pays a SEPARATE job for every logged row count
(``df.count()`` between stages — go-incremental-ingest-elt.py:200-222
counts the frame it is about to write; go-quality-elt.py logs
clean/flagged counts the same way). ``observed()`` attaches the
metrics to the plan itself via ``df.observe``: they are accumulated
DURING the write/action that runs anyway — zero additional scans, and
at 100 TB a saved scan is a saved pass over the table.

Metrics must be aggregate expressions (count/sum/min/max/...); read
them AFTER an action has materialized the frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str,
             **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns the instrumented frame and the Observation handle;
    ``obs.get`` blocks until the first action completes and yields
    {metric_name: value}.

        out, obs = observed(df, "ingest", n=F.count(F.lit(1)),
                            null_keys=F.sum(F.col("pk").isNull().cast("long")))
        write_parquet(out, path)
        audit = obs.get          # no extra job ran for this
    """
    obs = Observation(name)
    cols = [m.alias(k) for k, m in metrics.items()]
    return df.observe(obs, *cols), obs
