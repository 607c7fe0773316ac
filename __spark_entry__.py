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
# driver round; the window below is (c) queries NEW this round (the eight
# r13-staged operators, registered r14), plus (b) every query whose plan or
# oracle MATERIALLY CHANGED since its last driver row (changes must re-gate:
# dedup_ngram_jaccard took the injectivity-attested hash-path lever,
# graph_label_propagation gained the convergence-certified early stop), plus
# (a) the staleness queue oldest-first — ledger @ r14 start: the 6 rows last
# gated r09 (the r13 carry, VERDICT r13 #1 names them) and 34 of the 45 r10
# rows; the 11 deferred r10 rows (text_fingerprint, text_token_stats, the
# tpch_q12/14/15/18/3/4/5/6 block, window_showcase) are the r15 carry, inside
# the size-derived rotation contract enforced by
# test_ledger_no_row_older_than_rotation_contract (ROTATION_N = ceil(N/50)+1:
# a 200-query registry cannot round-trip a 50-slot window in 4 rounds once
# new/changed rows preempt slots — the contract scales with the registry).
# Everything not in the window keeps full coverage via pytest and
# tools/selfcheck.py, which run the COMPLETE registry; window rotation trades
# driver-row freshness, never test coverage. Per-round tail rationale lives
# in git history (see `git log __spark_entry__.py`).
_WINDOW = (
    # (c) new this round — the seven r14-staged operators (VERDICT r14 #1):
    "sim_mmr_topk",  # r15 NEW: MMR diversified top-k (greedy λ=0.7 replay)
    "text_readability_score",  # r15 NEW: Flesch reading ease, integer proxy
    "corpus_tokenizer_fertility",  # r15 NEW: BPE tokens-per-word by language
    "dedup_cluster_report",  # r15 NEW: cluster-size histogram over capped CC
    "mm_scene_cuts",  # r15 NEW: shot-boundary detection over frame kernel
    "dq_freshness_lag",  # r15 NEW: staleness vs the dataset's own frontier
    "ev_seasonal_backtest",  # r15 NEW: seasonal forecast backtest over CUSUM cells
    # (b) changed since their last driver row — must re-gate:
    "corpus_reservoir_sample",  # r15: presentation sort -> repartition(1)+
    # sortWithinPartitions (the VERDICT r14 #3 re-adjudication: global
    # orderBy's range-sampling pass re-executed the window child). That
    # root cause generalizes: a bare final orderBy over an exchange-free
    # per-doc pipeline re-runs the WHOLE codec/regex stage in the range
    # sampler — data.shielded_sort hash-materializes the output first.
    # The six heavy mm rows below take the shield and re-gate (measured
    # sf0.1 medians: resize 2.00->1.28, phash 1.70->1.12, decode
    # 1.37->1.04, audio_decode 0.82->0.55 interleaved); six r11 rows
    # (ml_hard_negatives + the text_decontaminate/dupspan/lm_score/
    # ngram_novelty/repetition block) defer to the r16 carry to make
    # room — all inside the size-derived rotation contract. The in-window
    # rows text_token_stats/text_fingerprint/text_quality_score/
    # text_pii_redact/text_readability_score/mm_audio_decode/
    # mm_binary_meta take the same shield and re-gate in place. The
    # other r15 ADVICE fixes (mmr zero-norm filter, cell-cap distinct,
    # plan_identity lookbehind, bounded edge registry) are builder-side.
    "mm_image_resize",
    "mm_image_phash",
    "mm_image_decode",
    "mm_audio_fingerprint",
    "mm_fake_features",
    "mm_frame_sample",
    # (b) second shield wave — pair/report rows whose range sampler
    # re-ran the candidate-join + verify segment (broadcast joins add no
    # exchange, so nothing shielded the sampler); interleaved A/B at
    # sf0.1: embedding_neardup 5.36->2.59, containment 2.18->0.90,
    # containment_seeds 6.97->4.97, ngram_jaccard 5.11->4.45,
    # merge_increment 2.59->1.96, dupspan_remove 2.95->1.87:
    "dedup_containment",
    "dedup_containment_seeds",
    "dedup_ngram_jaccard",
    "dedup_embedding_neardup",
    "corpus_merge_increment",
    "text_dupspan_remove",
    # (a) the staleness queue, oldest-first — all 11 r10 rows (the
    # documented r14 carry, VERDICT r14 #2 names them):
    "text_fingerprint",
    "text_token_stats",
    "tpch_q12_priority_classes",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "tpch_q3_shipping_priority",
    "tpch_q4_semi_join",
    "tpch_q5_regional_volume",
    "tpch_q6_revenue",
    "window_showcase",
    # (a) 32 of the 43 r11 rows, ledger order; the 11 deferred r11 rows
    # (text_tfidf_top_terms + the tpch_q1/q7..q22 block) are the r16
    # carry, inside the size-derived rotation contract:
    "corpus_stratified_sample",
    "dedup_cluster_cc_star",
    "dedup_compact_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_semantic_kmeans",
    "dedup_simhash",
    "ev_outliers_mad",
    "ev_session_outage_overlap",
    "ev_stats_by_type",
    "ev_trend_slope",
    "ev_value_ntiles",
    "mm_audio_decode",
    "mm_binary_meta",
    "sim_ivf_index_probe",
    "sim_ivfpq_lloyd_topk",
    "sim_pq_topk",
    "text_pii_redact",
    "text_quality_score",
    # ml_hard_negatives, text_decontaminate, text_lm_score,
    # text_ngram_novelty, text_repetition_score, text_subword_tokens,
    # ev_approx_distinct_users, ev_approx_value_quantiles, ev_mode_value,
    # ev_pivot_type_counts, ev_rollup_daily, ev_running_total:
    # displaced to the r16 carry by the (b) re-gates —
    # all r11 rows, inside the size-derived rotation contract (r11 rows
    # must re-gate by r17; the r16 window has the capacity)
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
