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
# ROUND-10 ROTATION (VERDICT_r9 item #1): the head is the 50 queries
# with NO driver record or the stalest one — the 3 round-9 additions
# q200-q202 (never driver-recorded), the 12 remaining round-4 records
# (q85-q99 block), and the alphabetically-first 35 of the 37 round-5
# records. Every tail query below has a driver row from the round
# noted in its group header (the r9 rotation head — q192-q199 +
# q53-q56 + the 38 round-4-era records — was certified 50/50 by
# CORRECTNESS_r09 and moves to the tail). Tail entries still run
# everywhere else (pytest, bench, tools/check_correctness).
_DEPRIORITIZED = (
    # --- new in round 10 (no driver record yet; next rotation) ---
    "q203_lsh_index_delete",
    "q204_lsh_pruned_serve",
    # --- latest driver record: round 5 (2 queries; the 2 alphabetically-last of the r5 block — the rest of the block is in the r10 head) ---
    "q94_priority_argmax",
    "q96_bitmap_distinct",
    # --- latest driver record: round 6 (3 queries) ---
    "q152_repeated_spans",
    "q153_semdedup",
    "q154_rawfile_ingest",
    # --- latest driver record: round 7 (50 queries) ---
    "q137_jpeg_probe",
    "q140_sketch_overlap",
    "q141_index_append",
    "q142_gif_probe",
    "q143_compressed_text",
    "q144_shard_writer",
    "q145_copurchase_pagerank",
    "q146_html_extract",
    "q147_domain_cap",
    "q148_gopher_rules",
    "q149_component_split",
    "q150_variant_shred",
    "q151_xml_roundtrip",
    "q155_ridge_fit",
    "q156_unicode_nfc",
    "q157_triangles",
    "q158_pmi_cooc",
    "q159_inverted_index",
    "q160_zipf_fit",
    "q161_warc_roundtrip",
    "q162_tfidf_cosine",
    "q163_bm25",
    "q164_distinct_n",
    "q165_stream_enrich",
    "q166_kmv_distinct",
    "q167_kmv_jaccard",
    "q168_audio_stats",
    "q169_image_pool",
    "q170_prefix_join",
    "q171_lsh_recall",
    "q172_keep_best",
    "q173_crossdoc_dedup",
    "q174_pii_redact",
    "q175_logistic_fit",
    "q176_embed_standardize",
    "q177_winnowing",
    "q178_dsir_weights",
    "q179_js_drift",
    "q180_quantile_sketch",
    "q181_quality_filter",
    "q182_stream_quantiles",
    "q183_stream_decontaminate",
    "q184_hard_negatives",
    "q185_curation_funnel",
    "q186_vocab_coverage",
    "q187_interpolate",
    "q188_source_scorecard",
    "q189_lsh_recall_sampled",
    "q190_stream_chain",
    "q191_image_dhash_dedup",
    # --- latest driver record: round 8 (50 queries, the q01-q52-era head) ---
    "q01_line_revenue",
    "q02_clv",
    "q03_clv_tiered",
    "q04_rfm_segments",
    "q05_customer_profile",
    "q06_trend_daily",
    "q06_trend_hourly",
    "q06_trend_monthly",
    "q06_trend_weekly",
    "q12_incr_dedupe",
    "q13_dedup_exact",
    "q14_text_stats",
    "q15_lang_id",
    "q16_iqr_outliers",
    "q17_minhash_neardup",
    "q18_ngram_jaccard",
    "q19_knn_cosine",
    "q20_lsh_ann",
    "q21_simhash",
    "q22_multimodal_meta",
    "q23_json_props",
    "q24_fingerprint_dedup",
    "q25_embedding_neardup",
    "q26_trend_rollup",
    "q27_surrogate_keys",
    "q28_asof_attribution",
    "q29_stream_hourly",
    "q30_frame_sample",
    "q31_ivf_ann",
    "q32_threshold_severity",
    "q33_top_customers_per_nation",
    "q34_sessionize",
    "q35_stream_sessions",
    "q36_top_locations_approx",
    "q37_calendar_join",
    "q38_rolling_fingerprint",
    "q39_range_clicks",
    "q40_simhash_portable",
    "q41_minhash_portable",
    "q42_vocab",
    "q43_spend_quintiles",
    "q44_urgent_customers",
    "q45_order_reconcile",
    "q46_repeat_customers",
    "q47_removed_lines",
    "q48_stream_attribution",
    "q49_priority_pivot",
    "q50_stream_enrich",
    "q51_order_timeline",
    "q52_status_cube",
    # --- latest driver record: round 9 (50 queries, the r9 rotation head: q192-q199 + q53-q56 + the 38 round-4-era records) ---
    "q100_incremental_dedupe",
    "q101_price_qty_regression",
    "q103_corpus_pipeline",
    "q104_event_cooccurrence",
    "q106_stream_session_window",
    "q107_next_click",
    "q108_scd2_lookup",
    "q109_debounce",
    "q110_stream_attribution_outer",
    "q111_grouping_sets",
    "q112_vs_prior_orders",
    "q113_stock_balance",
    "q114_activity_streaks",
    "q115_media_probe",
    "q116_repetition_linear",
    "q117_stream_append_rollup",
    "q192_neardup_anchored",
    "q193_jpeg_subsampled",
    "q194_zorder_layout",
    "q195_bucketed_join",
    "q196_star_components",
    "q197_script_mix",
    "q198_jpeg_progressive",
    "q199_incremental_lsh",
    "q53_stream_dedupe",
    "q54_stream_keep_latest",
    "q55_salted_distinct",
    "q56_neardup_groups",
    "q58_contamination",
    "q60_token_shards",
    "q61_chunk_docs",
    "q62_mixture_sample",
    "q64_embed_quantize",
    "q65_stream_upsert",
    "q66_tfidf",
    "q67_kmeans",
    "q68_scd2",
    "q69_stream_sliding",
    "q70_weighted_sample",
    "q71_name_editdist",
    "q72_snapshot_diff",
    "q74_stream_incremental_agg",
    "q75_hashing_vectors",
    "q78_perplexity",
    "q79_trailing_features",
    "q80_split_drift",
    "q81_ivf_pq",
    "q82_rerank",
    "q83_salted_enrich",
    "q84_anomaly_days",
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
