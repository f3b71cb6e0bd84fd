"""Plan-quality assertions — the 100 TB properties, checked on real plans.

Each test pins a property that must survive refactoring: filter pushdown,
column pruning, broadcast joins for small dims, map-side partial
aggregation, single-shuffle gridding.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.contract import ts_us_col
from seaexplorertools_spark import contract
from seaexplorertools_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_pushed_filters,
    read_schema_columns,
    scan_info,
    uses_broadcast_join,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = contract.QUERIES["s1_scan_project"](spark, sf_dir)
    assert has_pushed_filters(df), explain_str(df)


def test_column_pruning(spark, sf_dir):
    """The flagship grid2d projects 4 of lineitem's 11 columns — the scan
    must read exactly those."""
    df = contract.QUERIES["a1_grid2d_mean"](spark, sf_dir)
    cols = read_schema_columns(df)
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}, cols


def test_grid2d_is_single_shuffle(spark, sf_dir):
    df = contract.QUERIES["a1_grid2d_mean"](spark, sf_dir)
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_grid2d_partial_aggregate(spark, sf_dir):
    """Map-side combine before the shuffle (HashAggregate × 2)."""
    txt = explain_str(contract.QUERIES["a1_grid2d_mean"](spark, sf_dir))
    assert "partial_avg" in txt or "partial_count" in txt, txt


def test_dim_join_broadcasts(spark, sf_dir):
    df = contract.QUERIES["j4_broadcast_dim"](spark, sf_dir)
    assert uses_broadcast_join(df), explain_str(df, "simple")


def test_equi_3way_broadcasts_both_dims(spark, sf_dir):
    txt = explain_str(contract.QUERIES["j0_equi_3way"](spark, sf_dir), "simple")
    assert txt.count("BroadcastHashJoin") == 2, txt


def test_interp_join_one_sort_for_all_values(spark, sf_dir):
    """J1 with N value columns must reuse ONE window sort PER DIRECTION,
    not N: one ascending local sort feeds every prev-sample lookup and one
    descending local sort feeds every next-sample lookup (the O(n) running
    frames that replaced the O(n²) unboundedFollowing frames in round 5) —
    and still ONE exchange for the union window."""
    from seaexplorertools_spark.operators.joins import interp_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts_us", ts_us_col(ev))
    samples = ev.selectExpr("user_id", "ts_us", "value as v1", "value * 2 as v2", "value * 3 as v3")
    probes = ev.select("event_id", "user_id", "ts_us")
    out = interp_join(samples, probes, on="ts_us", values=["v1", "v2", "v3"], partition_by=["user_id"], suffix="_i")
    txt = explain_str(out, "simple")
    # asc + desc local sorts (value-count-independent), one union exchange
    assert txt.count("Sort ") <= 3, txt
    assert count_exchanges(out) <= 2, txt


def test_qc_mask_stays_in_scan_projection(spark, sf_dir):
    """P3 masking is pure projection — no exchange at all."""
    df = contract.QUERIES["p3_qc_mask"](spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df, "simple")


def test_stratified_sample_is_mapside_only(spark, sf_dir):
    """Hash-threshold sampling must stay a pure map-side filter: no
    exchange, pruned 2-column scan."""
    df = contract.QUERIES["q_stratified_sample"](spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df, "simple")
    cols = read_schema_columns(df)
    assert cols == {"doc_id", "lang"}, cols


def test_tfidf_broadcasts_corpus_size(spark, sf_dir):
    """The 1-row corpus-size join must broadcast (never shuffle the token
    stream against it) and the aggregates must partial-combine map-side."""
    df = contract.QUERIES["txt_tfidf"](spark, sf_dir)
    txt = explain_str(df)
    assert uses_broadcast_join(df), explain_str(df, "simple")
    assert "partial_count" in txt, txt


def test_first_seen_single_shuffle(spark, sf_dir):
    """Streaming-twin first-seen dedup is one groupBy: exactly one exchange,
    with a map-side partial min_by."""
    df = contract.QUERIES["st_first_seen"](spark, sf_dir)
    assert count_exchanges(df) == 1, explain_str(df, "simple")
    assert "partial_min_by" in explain_str(df), explain_str(df)


def test_pii_redact_no_shuffle(spark, sf_dir):
    """PII redaction is pure projection over the scan — zero exchanges."""
    df = contract.QUERIES["txt_pii_redact"](spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df, "simple")


def test_percentile_filter_broadcasts_per_lang_stats(spark, sf_dir):
    """The per-language p90 aggregate (|langs| rows) must come back as a
    broadcast, not a shuffled join."""
    df = contract.QUERIES["q_percentile_filter"](spark, sf_dir)
    assert uses_broadcast_join(df), explain_str(df, "simple")


def test_contamination_broadcasts_holdout(spark, sf_dir):
    """Decontamination joins the big train shingle stream against the small
    holdout set — the holdout side must broadcast."""
    df = contract.QUERIES["dd_contamination"](spark, sf_dir)
    assert uses_broadcast_join(df), explain_str(df, "simple")


def test_kmeans_assign_broadcasts_centroids(spark, sf_dir):
    df = contract.QUERIES["q_kmeans_assign"](spark, sf_dir)
    txt = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt, txt


def test_quantize_int8_no_shuffle(spark, sf_dir):
    """int8 quantization is per-row array math — zero exchanges."""
    df = contract.QUERIES["ann_quantize_int8"](spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df, "simple")


def test_entropy_partial_aggregates(spark, sf_dir):
    """Both token-entropy aggregations must partial-combine map-side."""
    txt = explain_str(contract.QUERIES["txt_entropy"](spark, sf_dir))
    assert "partial_count" in txt or "partial_sum" in txt, txt


def test_lm_scoring_broadcasts_model_tables(spark, sf_dir):
    """The bigram-LM count tables are vocab-sized — both scoring joins
    must broadcast; the corpus is never shuffled for the join."""
    df = contract.QUERIES["lm_bigram_xent"](spark, sf_dir)
    txt = explain_str(df, "simple")
    assert txt.count("BroadcastHashJoin") >= 2, txt


def test_mixture_resample_is_mapside_filter(spark, sf_dir):
    """After the dim-sized count collect, the keep decision is a pure
    map-side filter — zero exchanges in the returned plan."""
    df = contract.QUERIES["q_mixture_resample"](spark, sf_dir)
    assert count_exchanges(df) == 0, explain_str(df, "simple")


def test_profile_is_single_aggregate_pass(spark, sf_dir):
    """N-column profiling must stay one aggregate over one scan: a single
    exchange (partial -> final), not one pass per column. The multi-
    distinct rewrite uses Expand, not extra scans."""
    df = contract.QUERIES["q_profile_table"](spark, sf_dir)
    assert len(scan_info(df)) == 1, explain_str(df)


def test_hash_classifier_partial_aggregates(spark, sf_dir):
    """Classifier inference = explode + ONE map-side-combined avg."""
    df = contract.QUERIES["txt_hash_classifier"](spark, sf_dir)
    txt = explain_str(df)
    assert "partial_avg" in txt or "partial_sum" in txt, txt
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_semdedup_broadcasts_centroids_and_assignment(spark, sf_dir):
    """Centroid assignment broadcasts k rows; the pair join shuffles each
    vector once keyed by cluster (no crossJoin over the full table)."""
    df = contract.QUERIES["dd_semdedup"](spark, sf_dir)
    txt = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt, txt
    assert "CartesianProduct" not in txt, txt


def test_tpch_q5_all_dims_broadcast_one_fact_agg_shuffle(spark, sf_dir):
    """Q5's only hash-shuffle should be the lineitem⋈orders + final agg side;
    customer/supplier/nation/region all broadcast."""
    txt = explain_str(contract.QUERIES["q_tpch_q5"](spark, sf_dir), "simple")
    assert txt.count("BroadcastHashJoin") >= 4, txt


def test_tpch_q5_pushes_date_and_region_filters(spark, sf_dir):
    txt = explain_str(contract.QUERIES["q_tpch_q5"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in txt, txt
    assert "EqualTo(r_name,ASIA)" in txt, txt


def test_tpch_q10_topk_is_distributed_take_ordered(spark, sf_dir):
    txt = explain_str(contract.QUERIES["q_tpch_q10"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in txt, txt


def test_tpch_q19_disjunction_pushes_per_side_residuals(spark, sf_dir):
    """The OR of brand/size/quantity clauses must not defeat pushdown: the
    brand-only disjunct reaches the part scan, the quantity-only disjunct
    reaches the lineitem scan."""
    txt = explain_str(contract.QUERIES["q_tpch_q19"](spark, sf_dir))
    assert "And(EqualTo(p_brand,Brand#1)" in txt, txt  # brand+size disjunct → part scan
    assert "And(GreaterThanOrEqual(l_quantity,1.0)" in txt, txt  # qty disjunct → lineitem scan


def test_kmv_is_distinct_then_one_window_pass(spark, sf_dir):
    """KMV: distinct-of-hashes aggregate with map-side combine, then a single
    per-group window for the k smallest — no joins, no collect."""
    df = contract.QUERIES["q_kmv_distinct"](spark, sf_dir)
    txt = explain_str(df, "simple")
    assert "Window" in txt and "Join" not in txt, txt


def test_ohlc_single_aggregate_no_window(spark, sf_dir):
    """OHLC bars come out of ONE shuffle-aggregate (min_by/max_by), not a
    window pass or self-join."""
    df = contract.QUERIES["q_tumbling_ohlc"](spark, sf_dir)
    txt = explain_str(df, "simple")
    assert "Window" not in txt and "Join" not in txt, txt
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_decayed_agg_anchor_is_broadcast_scalar(spark, sf_dir):
    """The max-timestamp anchor joins as a broadcast of a 1-row aggregate —
    no collect boundary, no wide shuffle."""
    txt = explain_str(contract.QUERIES["q_decayed_agg"](spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in txt, txt


def test_auc_has_no_unpartitioned_window(spark, sf_dir):
    """The AUC rank prefix must run through global_cumsum: every Window in
    the plan is partitioned (by __pid); no single-partition stage."""
    import re

    df = contract.QUERIES["q_auc_scores"](spark, sf_dir)
    txt = explain_str(df, "formatted")
    for spec in re.findall(r"windowspecdefinition\((.*?)specifiedwindowframe", txt):
        head = [a.strip() for a in spec.split(",") if a.strip()]
        assert any((" ASC" not in a and " DESC" not in a) for a in head), txt


def test_profile_approx_has_no_expand_distinct(spark, sf_dir):
    """The HLL profile must not contain the exact query's countDistinct
    Expand: NDV comes from the register aggregate (partial_max map-side)."""
    df = contract.QUERIES["q_profile_table_approx"](spark, sf_dir)
    txt = explain_str(df, "formatted")
    assert "count(distinct" not in txt.lower(), txt
    # the only Expand allowed is the stack unpivot (constant 4-way), and
    # the register aggregate must partial-aggregate before the shuffle
    assert "partial_max" in txt or "max#" in txt, txt


def test_jaccard_prefix_verify_is_fanned_out(spark, sf_dir):
    """The candidate pairs repartition to full parallelism before the
    CPU-dense intersect verify (round-4 AQE-serialization fix)."""
    df = contract.QUERIES["dd_jaccard_prefix_pairs"](spark, sf_dir)
    txt = explain_str(df, "formatted")
    assert "REPARTITION_BY_COL" in txt or "hashpartitioning(id1" in txt, txt


def test_tpch_q9_single_lineitem_scan(spark, sf_dir):
    """The round-9 window rewrite: the derived-ps aggregate re-joined on
    its own grouping key collapsed to min().over(partitionBy(part, supp))
    — lineitem must be scanned ONCE and no (part, supp)-cardinality
    aggregate may be broadcast."""
    df = contract.QUERIES["q_tpch_q9"](spark, sf_dir)
    li_scans = [
        s for s in scan_info(df) if "l_extendedprice" in s["read_columns"]
    ]
    assert len(li_scans) == 1, explain_str(df, "simple")
    txt = explain_str(df, "formatted")
    assert "Window" in txt, txt


def test_robots_rules_single_pass_no_join(spark, sf_dir):
    """The round-9 UA-run rewrite: the rules parse is ONE pass over the
    exploded lines — no rules-to-uas self-join, one documents scan, and
    all windows keyed by the host column (no unpartitioned window)."""
    df = contract.QUERIES["q_robots_rules"](spark, sf_dir)
    txt = explain_str(df, "simple")
    assert "Join" not in txt, txt
    assert len(scan_info(df)) == 1, txt


def test_band_table_one_aggregate(spark, sf_dir):
    """The round-9 minhash fuse: band signatures come from ONE
    groupBy(doc) with k min-aggregate columns (stack unpivot after), not
    a groupBy(doc, seed) + groupBy(doc, band) pair."""
    from seaexplorertools_spark.operators.dedup import band_table
    from seaexplorertools_spark.contract import ptable

    bands = band_table(ptable(spark, sf_dir), k=16, band_rows=4)
    txt = explain_str(bands, "formatted")
    assert count_exchanges(bands) <= 2, txt  # ptable fan-out + the one agg
    assert "collect_list" not in txt, txt
    assert "partial_min" in txt, txt  # map-side combine survives


def test_cut_spans_pins_span_table(spark, sf_dir):
    """The round-9 span pin: cut_spans consistency-caches its spans input
    so the gram-shuffle producer executes once, not once per consumer
    branch."""
    from seaexplorertools_spark.caching import (
        ledger_size,
        release_consistency_caches,
    )
    from seaexplorertools_spark.operators.dedup import (
        cut_spans,
        duplicate_substring_spans,
    )
    from seaexplorertools_spark.contract import table

    release_consistency_caches()
    docs = table(spark, sf_dir, "documents")
    before = ledger_size()
    out = cut_spans(docs, duplicate_substring_spans(docs, k=32))
    assert ledger_size() > before, "spans input was not ledger-cached"
    assert out.columns == ["doc_id", "cleaned", "n_removed"]
    release_consistency_caches()
