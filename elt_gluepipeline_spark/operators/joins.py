"""Join operators beyond equi-joins.

SURVEY.md §2.3 notes the reference uses only inner/left equi-joins;
right/full/semi/anti come free with ``df.join``. The one join Spark
does NOT ship natively is the AS-OF join (point-in-time lookup:
attribution, feature backfill, slowly-changing-dimension resolution).
A naive formulation — range join ``r.ts <= l.ts`` + keep-latest — is a
cross-product per key and dies on skew; the implementation here is the
shuffle-once union+window technique:

1. tag both sides and union them into one relation,
2. one window over the join keys ordered by (ts, side, tie),
3. ``last(payload, ignorenulls)`` with a running frame — each left row
   sees exactly the latest right payload at-or-before its timestamp,
4. keep left rows, unpack the payload.

Cost: ONE shuffle on the join keys (same as an equi-join), no pair
explosion regardless of how many right rows precede a left row. Skewed
keys can be salted upstream; AQE skew-split also applies since this is
a plain window shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str, *,
              right_payload: Sequence[str],
              tie_break: str | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Backward inclusive as-of join (left outer).

    For each left row, attach ``right_payload`` of the LATEST right row
    with the same ``on`` keys and ``right_ts <= left_ts``; null payload
    when no right row precedes. Ties on equal ``right_ts`` resolve to
    the greatest ``tie_break`` value (deterministic across engines and
    partitionings).

    Payload columns are returned as ``{prefix}{col}``. Null timestamps
    never participate: a right row with unknown time can't be proven to
    precede anything (dropped), and a null-ts left row has no
    at-or-before instant (matches nothing).
    """
    on = list(on)
    right = right.filter(F.col(right_ts).isNotNull())
    payload = F.struct(*[F.col(c) for c in right_payload])
    tie = F.col(tie_break) if tie_break is not None else F.lit(0)

    left_types = dict(left.dtypes)
    carry = [c for c in left.columns if c not in on and c != left_ts]

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(
            f"struct<{','.join(f'{c}:{dict(right.dtypes)[c]}' for c in right_payload)}>"
        ).alias("_payload"),
        *[F.col(c) for c in carry],
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tie.cast("long").alias("_tie"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in carry],
    )

    # right rows (side 0) sort BEFORE left rows (side 1) at equal ts →
    # inclusive match; among equal-ts right rows the greatest tie_break
    # sorts last and wins the running last().
    w = (Window.partitionBy(*on)
               .orderBy(F.col("_ts").asc_nulls_first(), F.col("_side").asc(),
                        F.col("_tie").asc_nulls_first())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l_tag.unionByName(r_tag)
                    .withColumn("_hit", F.last("_payload", ignorenulls=True).over(w))
                    .filter(F.col("_side") == 1))
    return matched.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in carry],
        *[F.col(f"_hit.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
