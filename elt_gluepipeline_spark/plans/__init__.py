"""Declared queries (SURVEY.md §2.10 Q1-Q12 re-expressed over the
driver's TPC-H-ish testdata, plus the training-data extension queries).

Each query is a QuerySpec: a Spark builder ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, a DuckDB oracle SQL string
computing the same result (same column NAMES and value semantics —
the correctness gate hash-compares them). Specs live next to their
oracles so they can't drift apart.

Domain mapping (restaurant reference → TPC-H testdata):
  order_items fact   → lineitem (line-item grain)
  order header       → orders   (customer, date, total)
  restaurant/location→ supplier / nation (via customer)
  item catalog       → part
  change feed        → events (ts-ordered, keyed by user/event_type)
  corpus / vectors   → documents / embeddings (extension ops)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""


# The driver's correctness gate records only the FIRST 50 registry
# entries (insertion order), so ordering is part of the contract: keep
# every query that needs an oracle-checked driver row in the head, and
# push queries whose coverage is redundant to the tail. Tail entries
# still run everywhere else (pytest, bench, tools/check_correctness).
_DEPRIORITIZED = (
    "q44_urgent_customers",  # LeftSemi shape pinned by a plan test;
                             # P8 filter surface green in q46/q10/q11
    "q23_json_props",      # JSON fns are a free-rider surface (SURVEY
                           # §2.7: absent in the reference); pytest'd
    "q51_order_timeline",  # analytic-window family already carries 3
                           # green rows (q05 lag, q33 row_number,
                           # q43 ntile); q51's shape pinned in plan tests
    "q06_trend_weekly",    # same _trend code path as q06_trend_daily
    "q06_trend_monthly",   # same _trend code path as q06_trend_daily
    "q36_top_locations_approx",  # rows-only HLL variant of green q08
    "q17_minhash_neardup",  # rows-only; portable oracle twin is q41
    "q21_simhash",          # rows-only; portable oracle twin is q40
    "q38_rolling_fingerprint",  # rows-only; md5 oracle twin is q24
    "q57_portable_split",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q58_contamination",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q59_dedupe_corpus",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q60_token_shards",    # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q61_chunk_docs",      # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q62_mixture_sample",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q63_repetition",      # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q64_embed_quantize",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q65_stream_upsert",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q66_tfidf",           # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q67_kmeans",          # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q68_scd2",            # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q69_stream_sliding",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q70_weighted_sample",  # head full at 50: oracle-checked via
                            # tools/check_correctness instead
    "q71_name_editdist",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q72_snapshot_diff",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q73_incremental_agg",  # head full at 50: oracle-checked via
                            # tools/check_correctness instead
    "q74_stream_incremental_agg",  # head full at 50: oracle-checked via
                                   # tools/check_correctness instead
    "q75_hashing_vectors",  # head full at 50: oracle-checked via
                            # tools/check_correctness instead
    "q76_product_quantize",  # head full at 50: oracle-checked via
                             # tools/check_correctness instead
    "q77_pq_adc",          # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q78_perplexity",      # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q79_trailing_features",  # head full at 50: oracle-checked via
                              # tools/check_correctness instead
    "q80_split_drift",     # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q81_ivf_pq",          # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q82_rerank",          # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q83_salted_enrich",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q84_anomaly_days",    # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q85_funnel",          # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q86_retention",       # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q87_top_paths",       # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q88_session_window",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q89_median_udaf",     # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q90_fk_audit",        # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q91_gap_fill",        # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q92_measure_profile",  # head full at 50: oracle-checked via
                            # tools/check_correctness instead
    "q93_peak_open_orders",  # head full at 50: oracle-checked via
                             # tools/check_correctness instead
    "q94_priority_argmax",  # head full at 50: oracle-checked via
                            # tools/check_correctness instead
    "q95_rolling_active_users",  # head full at 50: oracle-checked via
                                 # tools/check_correctness instead
    "q96_bitmap_distinct",  # head full at 50: oracle-checked via
                            # tools/check_correctness instead
    "q97_table_profile",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q98_heavy_hitters",   # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q99_spend_percentiles",  # head full at 50: oracle-checked via
                              # tools/check_correctness instead
    "q100_incremental_dedupe",  # head full at 50: oracle-checked via
                                # tools/check_correctness instead
    "q101_price_qty_regression",  # head full at 50: oracle-checked via
                                  # tools/check_correctness instead
    "q102_price_histogram",  # head full at 50: oracle-checked via
                             # tools/check_correctness instead
    "q103_corpus_pipeline",  # head full at 50: oracle-checked via
                             # tools/check_correctness instead
    "q104_event_cooccurrence",  # head full at 50: oracle-checked via
                                # tools/check_correctness instead
    "q105_transition_matrix",  # head full at 50: oracle-checked via
                               # tools/check_correctness instead
    "q106_stream_session_window",  # head full at 50: oracle-checked via
                                   # tools/check_correctness instead
    "q107_next_click",     # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q108_scd2_lookup",    # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q109_debounce",       # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q110_stream_attribution_outer",  # head full at 50: oracle-checked
                                      # via tools/check_correctness
    "q111_grouping_sets",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q112_vs_prior_orders",  # head full at 50: oracle-checked via
                             # tools/check_correctness instead
    "q113_stock_balance",  # head full at 50: oracle-checked via
                           # tools/check_correctness instead
    "q114_activity_streaks",  # head full at 50: oracle-checked via
                              # tools/check_correctness instead
    "q115_media_probe",    # provisional tail slot; the round-4 head
                           # rotation moves the new queries forward
    "q116_repetition_linear",  # provisional tail slot (see q115)
    "q117_stream_append_rollup",  # provisional tail slot (see q115)
)


def registry() -> dict[str, QuerySpec]:
    """All declared queries, reference-parity + extensions."""
    from . import reference, training

    out: dict[str, QuerySpec] = {}
    for mod in (reference, training):
        for spec in mod.SPECS:
            if spec.name in out:
                raise ValueError(f"duplicate query name {spec.name}")
            out[spec.name] = spec
    missing = [n for n in _DEPRIORITIZED if n not in out]
    if missing:
        raise ValueError(f"_DEPRIORITIZED names not in registry: {missing}")
    head = {n: s for n, s in out.items() if n not in _DEPRIORITIZED}
    if len(out) > 50 and len(head) != 50:
        raise ValueError(
            f"registry head must be exactly 50 (driver gate contract), "
            f"got {len(head)}: adjust _DEPRIORITIZED")
    tail = {n: out[n] for n in _DEPRIORITIZED}
    return {**head, **tail}
