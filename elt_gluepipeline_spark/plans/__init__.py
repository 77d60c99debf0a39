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
# entries (insertion order), so ordering is part of the contract.
# ROUND-6 ROTATION (judge item #1): after r05, every registry query
# through q151 has a driver CORRECTNESS row on file (r01-r03: q01-q56;
# r04: q58-q117; r05: the 25 never-recorded + q132-q151 + 5
# re-records). This round's head = the 21 post-r05-rotation additions
# q152-q172 (their only evidence so far is the judge's local
# check_correctness re-run) + any new round-6 queries + already-
# recorded fillers to keep the head at exactly 50. After r06, EVERY
# registry query has external driver-gate evidence across rounds.
# Tail entries still run everywhere else (pytest, bench,
# tools/check_correctness).
_DEPRIORITIZED = (
    # --- r01-r03-recorded rows kept out of the r05 head ------------
    # (q34/q37/q43/q45/q46 swapped to the tail when the round-5
    # additions q132-q136 took head slots, and q01-q04 + the two
    # finest trend grains when q146-q151 landed — new queries need
    # driver-recorded rows; all swapped-out names have r01 rows on
    # file)
    "q01_line_revenue",
    "q02_clv",
    "q03_clv_tiered",
    "q04_rfm_segments",
    "q06_trend_daily",
    "q06_trend_hourly",
    "q05_customer_profile",
    "q12_incr_dedupe",
    "q16_iqr_outliers",
    "q26_trend_rollup",
    "q27_surrogate_keys",
    "q29_stream_hourly",
    "q32_threshold_severity",
    "q33_top_customers_per_nation",
    "q34_sessionize",
    "q35_stream_sessions",
    "q37_calendar_join",
    "q43_spend_quintiles",
    "q45_order_reconcile",
    "q46_repeat_customers",
    "q47_removed_lines",
    "q49_priority_pivot",
    "q50_stream_enrich",
    "q52_status_cube",
    "q53_stream_dedupe",
    "q54_stream_keep_latest",
    "q55_salted_distinct",
    "q13_dedup_exact",
    "q14_text_stats",
    "q15_lang_id",
    "q18_ngram_jaccard",
    "q19_knn_cosine",
    "q20_lsh_ann",
    "q22_multimodal_meta",
    "q24_fingerprint_dedup",
    "q25_embedding_neardup",
    "q28_asof_attribution",
    "q30_frame_sample",
    "q31_ivf_ann",
    "q39_range_clicks",
    "q40_simhash_portable",
    "q41_minhash_portable",
    "q42_vocab",
    "q48_stream_attribution",
    "q56_neardup_groups",
    "q44_urgent_customers",
    "q23_json_props",
    "q51_order_timeline",
    "q06_trend_weekly",
    "q06_trend_monthly",
    "q36_top_locations_approx",
    "q17_minhash_neardup",
    "q21_simhash",
    "q38_rolling_fingerprint",
    # --- the 50 r04-head queries (driver rows recorded in r04) -----
    "q117_stream_append_rollup",
    "q65_stream_upsert",
    "q68_scd2",
    "q69_stream_sliding",
    "q72_snapshot_diff",
    "q74_stream_incremental_agg",
    "q79_trailing_features",
    "q83_salted_enrich",
    "q84_anomaly_days",
    "q85_funnel",
    "q86_retention",
    "q87_top_paths",
    "q88_session_window",
    "q89_median_udaf",
    "q90_fk_audit",
    "q91_gap_fill",
    "q93_peak_open_orders",
    "q95_rolling_active_users",
    "q97_table_profile",
    "q98_heavy_hitters",
    "q99_spend_percentiles",
    "q101_price_qty_regression",
    "q104_event_cooccurrence",
    "q106_stream_session_window",
    "q108_scd2_lookup",
    "q109_debounce",
    "q111_grouping_sets",
    "q112_vs_prior_orders",
    "q113_stock_balance",
    "q114_activity_streaks",
    "q115_media_probe",
    "q58_contamination",
    "q60_token_shards",
    "q61_chunk_docs",
    "q62_mixture_sample",
    "q116_repetition_linear",
    "q64_embed_quantize",
    "q66_tfidf",
    "q67_kmeans",
    "q70_weighted_sample",
    "q110_stream_attribution_outer",
    "q107_next_click",
    "q103_corpus_pipeline",
    "q100_incremental_dedupe",
    "q71_name_editdist",
    "q75_hashing_vectors",
    "q78_perplexity",
    "q80_split_drift",
    "q81_ivf_pq",
    "q82_rerank",
    # --- rotated out for r06 so q152-q172 take head slots (all of
    # these received driver rows in r05's head) ---------------------
    "q07_loyalty_impact",
    "q08_top_locations",
    "q09_discount_effect",
    "q10_quality_gate",
    "q11_transform_clean",
    "q57_portable_split",
    "q59_dedupe_corpus",
    "q118_linear_attribution",
    "q119_budget_curation",
    "q120_histogram_quantiles",
    "q121_unpivot",
    "q122_percentile_rank",
    "q123_basket_affinity",
    "q124_cohort_ltv",
    "q125_share_shift",
    "q126_passage_dedupe",
    "q127_bloom_prefilter",
    "q128_countmin",
    "q129_table_digest",
    "q130_generated_rollup",
    "q131_hll_portable",
    # --- rotated out when the round-6 additions q173-q176 took head
    # slots (all four have r04/r05 driver rows on file) --------------
    "q76_product_quantize",
    "q77_pq_adc",
    "q138_sequence_pack",
    "q139_greedy_pack",
    # --- rotated out for q177-q182 (all six hash-green in
    # CORRECTNESS_r05) ------------------------------------------------
    "q63_repetition",
    "q73_incremental_agg",
    "q92_measure_profile",
    "q94_priority_argmax",
    "q96_bitmap_distinct",
    "q102_price_histogram",
    "q105_transition_matrix",
    "q132_png_probe",
    "q133_bpe_encode",
    "q134_json_roundtrip",
    "q135_orc_roundtrip",
    "q136_stream_hll",
    # --- rotated out for the round-7 additions q189-q191 (all three
    # of these have hash-green CORRECTNESS_r06 rows) -----------------
    "q152_repeated_spans",
    "q153_semdedup",
    "q154_rawfile_ingest",
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
