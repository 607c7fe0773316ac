"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query registry lives in the package; this file just aggregates it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pinterest_data_pipeline218_spark.operators import (
    asof,
    bloom,
    clustering,
    corpus,
    dataquality,
    dedup,
    entity,
    graph,
    layout,
    multimodal,
    ranking,
    similarity,
    spatial,
    text_analysis,
)
from pinterest_data_pipeline218_spark.plans import (
    analytics_tpch,
    events,
    experiments,
    intervals,
    orderstats,
    pin_domain,
    sequences,
    tpch,
    tpch_extra,
    tpch_more,
    tpch_rest,
)

_MODULES = (
    analytics_tpch,
    tpch,
    tpch_extra,
    tpch_more,
    tpch_rest,
    events,
    sequences,
    experiments,
    orderstats,
    intervals,
    graph,
    ranking,
    entity,
    bloom,
    pin_domain,
    text_analysis,
    dedup,
    similarity,
    spatial,
    multimodal,
    corpus,
    asof,
    clustering,
    dataquality,
    layout,
)

# The driver's correctness gate checks the FIRST 50 registry entries. Window
# selection is mechanical (r12 contract): `python tools/ledger.py` joins the
# registry against every CORRECTNESS_r*.json and prints each query's latest
# driver round; the window below is (a) the staleness queue oldest-first —
# ledger @ r13 start: 24 rows last gated r08 (ALL windowed, including the
# five SURVEY §2.11 declared queries VERDICT r12 #2 named) and 24 rows last
# gated r09, of which 18 fit; the 6 deferred r09 rows (corpus_merge_increment,
# dedup_cluster_best, dedup_cluster_cc_bounded, ev_twa_daily, mm_fake_features,
# text_langid_trained) are the r14 carry, still inside the 4-round rotation
# contract now ENFORCED by test_ledger_no_row_older_than_rotation_contract —
# plus (b) every query whose plan or oracle MATERIALLY CHANGED since its last
# driver row (changes must re-gate), plus (c) queries NEW this round.
# Everything not in the window keeps full coverage via pytest and
# tools/selfcheck.py, which run the COMPLETE registry; window rotation trades
# driver-row freshness, never test coverage. Per-round tail rationale lives
# in git history (see `git log __spark_entry__.py`).
_WINDOW = (
    # (c) new this round:
    "hybrid_rrf_search",  # r13 NEW: BM25 + cosine Reciprocal Rank Fusion
    "ev_attribution_multitouch",  # r13 NEW: multi-touch conversion attribution
    "graph_label_propagation",  # r13 NEW: community detection over trade graph
    "dq_profile_drift",  # r13 NEW: two-cohort column-profile drift
    "corpus_span_corruption",  # r13 NEW: T5-style span-corruption planning
    "sim_ivf_increment",  # r13 NEW: frozen-quantizer assignment + staleness
    # (b) changed since their last driver row — must re-gate:
    "dedup_containment",  # r13: injectivity-attested hash-path verify
    "dedup_containment_seeds",  # same rewire (VERDICT r12 #3)
    # (a) the staleness queue, oldest-first — all 24 r08 rows:
    "corpus_bm25_search",
    "corpus_zorder_keys",
    "dedup_cluster_cc_capped",
    "ev_asof_click_before_purchase",
    "ev_cm_top_users",
    "ev_division_all_types",
    "ev_extremes_by_type",
    "ev_journey_pattern",
    "ev_locf_fill",
    "ev_session_window_native",
    "ev_user_value_drift",
    "graph_reachability_nations",
    "graph_triangle_nations",
    "set_bag_ops",
    "t5_priority_counts_by_year",
    "t6p1_top_customer_per_nation",
    "t6p2_top_nation_by_top_customer",
    "t8_compat_window_median",
    "t9_active_customers_by_year",
    "tpch_lateral_topk",
    "tpch_q16_supplier_count",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_concentrated_suppliers",
    "user_oldest_nulls_last",
    # (a) 18 of the 24 r09 rows (the declared pin/geo pipelines first):
    "pin_clean_pipeline",
    "geo_clean_pipeline",
    "corpus_build_full",
    "corpus_leakage_safe_split",
    "corpus_pack_sequences",
    "dq_orders_constraints",
    "ev_session_copresence_lift",
    "geo_nearby_pairs",
    "ml_semantic_keepers",
    "mm_image_phash",
    "sim_radius_search",
    "text_classifier_eval",
    "text_entity_ids",
    "text_fuzzy_pairs",
    "text_langid",
    "text_lm_backoff",
    "text_word_frequencies",
    "tpch_bloom_prefilter",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (T4 composition: join → group-count → rank window →
    distinct) on /root/testdata/sf0.001."""
    return analytics_tpch.t4_top_priority_per_nation(spark, "/root/testdata/sf0.001")


def _ordered(merged: dict) -> dict:
    """Window entries first (driver gates the first 50), then everything
    else in module registration order."""
    head = {k: merged[k] for k in _WINDOW if k in merged}
    head.update({k: v for k, v in merged.items() if k not in head})
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return _ordered(out)
