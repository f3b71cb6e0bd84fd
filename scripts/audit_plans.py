#!/usr/bin/env python
"""Sweep EVERY contract query's physical plan and tabulate the 100 TB
plan properties into PLANAUDIT.md:

- exchanges (shuffles) in the optimized plan
- broadcast joins vs shuffle joins
- scans with pushed filters / pruned schemas
- single-partition windows (the scale trap — flagged unless the query is
  on the documented single-series allowlist)
- cartesian/broadcast-NL joins (flagged unless declared exact-baseline)

Usage: python scripts/audit_plans.py [--sf DIR] [--out PLANAUDIT.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose global (unpartitioned) window is the documented single-series
# semantics of the reference (SURVEY §2.5: one mission = one ordered series;
# multi-mission runs pass mission_col and the window partitions by it).
GLOBAL_WINDOW_OK = {
    "w1_centered_mean", "w1b_running_median_minmax", "w2_central_diff",
    "w3_cumsum", "w3b_cumsum_reverse", "w4_cumsum_reset", "w5_ffill",
    "w6_demean", "w7_tail_flag", "j1_interp_join", "j2_asof_nearest",
    "j2b_asof_backward", "r1_regrid_ladder", "ref_vertical_integration",
    # bounded-input windows: dim-sized aggregates, histogram bins
    # (~30 rows), or an already TakeOrdered-limited top-k (rank over k
    # rows). (global_rank/concurrency_profile offset windows were
    # eliminated in round 4 — their prefix sums are now windowless
    # explode+aggregate — so q_curriculum_order / q_corpus_shuffle /
    # q_peak_concurrency / q_rfm_segments need no entry here.)
    # round 4 removed every other former entry: chi2/KL/welch/
    # mutual_info/benford margins are tiny broadcast aggregates now,
    # skyline's strict-predecessor max and best-split's cumulative class
    # counts run through the windowless rank.py prefix machinery,
    # histogram density normalizes via a 1-row broadcast, and hybrid-RRF's
    # shortlist ranks have partitioned specs. The ONLY bounded-rank entry
    # left is the top-k rank over an already TakeOrdered-limited k rows:
    "q_topk_orders",
}

# Declared-exact baselines and axis densification: the crossJoin is the point
# (bounded by |queries| or |axis|), with ANN/bucketed variants as scale path.
CROSSJOIN_OK = {
    "ann_topk_bruteforce", "ann_hard_negatives", "ann_recall_report",
    "dd_embedding_dup",
    "dd_semdedup", "r2_pivot_export", "q_decayed_agg", "q_hybrid_rrf",
    "j5_scalar_broadcast", "q_percentile_filter", "txt_tfidf", "q_tpch_q11",
    "q_tpch_q22", "q_incremental_agg", "lm_bigram_xent", "lm_ppl_filter",
    "pipe_pretrain_prep", "q_mixture_resample", "a2_orientation_detect",
    "q_mad_outliers", "pipe_corpus_prep", "q_bm25_search",
    # bounded NL sides: 9-offset neighbor fanout (spatial), k×dim literal
    # centroid/LUT broadcasts (k-means, PQ)
    "q_spatial_eps_join", "q_kmeans_assign", "q_kmeans_iterate", "ann_topk_pq",
    # 1-row scalar-broadcast sides (the J5 pattern): PMI's global bigram
    # total; association-rules' basket total is folded into a literal;
    # target encoding's global-mean prior; RFM's (now, n_users) scalar
    # pair (the quartiles themselves are windowless global_rank
    # arithmetic — the only NL sides left are these 1-row scalars)
    "txt_pmi_bigrams", "q_target_encode", "q_rfm_segments",
    # kappa's (total, diag, cross_sum) are three 1-row aggregates joined
    # into one 1-row output — both NL sides are single rows
    "q_kappa_langid",
    # Naive Bayes base terms: every doc scores against every CLASS —
    # the NL side is the |labels|-row (5 here) broadcast class table;
    # the vocabulary-sized model joins on the token equi-key, never NL
    "q_nb_langid",
    # global_ntile's N rides a 1-row count broadcast (the J5 pattern)
    "q_equidepth_histogram",
    # round-4 windowless-margin rewrites: each query's total/margin rides
    # a 1-row aggregate broadcast (the J5 pattern) instead of an
    # unpartitioned window — the NL side is always a single row
    "q_chi2_independence", "q_kl_drift", "q_welch_ttest", "q_mutual_info",
    "q_benford_audit", "q_best_split", "a10_histogram",
    # recall report: three 1-row count aggregates joined into one 1-row
    # output — both NL sides are single rows
    "dd_lsh_recall_report",
    # DSIR: the nt/nr model totals and the selection-budget doc count are
    # each 1-row aggregates crossed in (the J5 pattern); the model join
    # itself is a ≤ n_buckets-row broadcast hash join
    "q_dsir_selection",
    # ranking eval: two declared-exact |queries|-bounded crossJoins (the
    # ann_topk_bruteforce pattern, full-dim + JL-space) feeding 10-row
    # per-query aggregates
    "q_search_ndcg",
    # vocab coverage: the corpus token total rides a 1-row aggregate
    # broadcast (the J5 pattern)
    "q_vocab_coverage",
    # Kneser–Ney: the scalars row (n_types, n1, n2, D) is a 1-row
    # aggregate crossed into scoring (J5 pattern); lm_kn_model
    # additionally crosses two more 1-row table-size aggregates into
    # its single-row report
    "lm_kn_xent", "lm_kn_model",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PLANAUDIT.md")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from seaexplorertools_spark.session import get_spark

    spark = get_spark("audit_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    rows, flags = [], []
    for name, fn in entrymod.queries().items():
        try:
            # isolate each query's plan: a prior query's .cache() would
            # otherwise substitute an InMemoryRelation into this plan
            # (hiding its standalone shuffle/pushdown shape) and make
            # audited rows depend on registration order
            spark.catalog.clearCache()
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # pragma: no cover
            rows.append((name, "ERROR", str(exc)[:80], "", "", ""))
            flags.append(f"{name}: plan build error {exc}")
            continue
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", plan))
        n_bnl = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin|\(\d+\) CartesianProduct", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        n_scan = len(re.findall(r"\(\d+\) Scan parquet", plan))
        n_pushed = sum(1 for p_ in pushed if p_.strip())
        # single-partition window: a spec whose args contain NO plain
        # partition column before the order/frame part. In formatted plans
        # the spec reads windowspecdefinition(pcol#1, pcol#2, ocol#3 ASC
        # NULLS ..., specifiedwindowframe(...)); a partition col is an arg
        # WITHOUT an ASC/DESC marker that precedes the frame.
        glob_win = 0
        for spec in re.findall(r"windowspecdefinition\((.*?)specifiedwindowframe", plan):
            head = [a.strip() for a in spec.split(",") if a.strip()]
            has_part = any(
                (" ASC" not in a and " DESC" not in a) for a in head
            )
            if not has_part:
                glob_win += 1
        glob_flag = "⚠" if glob_win and name not in GLOBAL_WINDOW_OK else ""
        bnl_flag = "⚠" if n_bnl and name not in CROSSJOIN_OK else ""
        if glob_flag:
            flags.append(f"{name}: {glob_win} unpartitioned window(s) not on allowlist")
        if bnl_flag:
            flags.append(f"{name}: {n_bnl} NL/cartesian join(s) not on allowlist")
        rows.append(
            (name, n_ex, f"{n_bhj}b/{n_smj}s/{n_bnl}nl", f"{n_pushed}/{n_scan}",
             glob_win, (glob_flag + bnl_flag) or "ok")
        )

    with open(args.out, "w") as fh:
        fh.write(
            "# PLANAUDIT — mechanical plan-property sweep of every contract query\n\n"
            f"Generated by `scripts/audit_plans.py` at {args.sf} (plans are\n"
            "SF-independent apart from AQE runtime choices). Columns: shuffles =\n"
            "`Exchange` nodes in the optimized plan; joins = broadcast-hash /\n"
            "sort-merge / nested-loop counts; pushed = scans with PushedFilters\n"
            "over total parquet scans; gwin = windows with NO partition key\n"
            "(allowed only for documented single-series semantics or\n"
            "bounded-input ranks); verdict ⚠ rows are explained below.\n\n"
            "| query | shuffles | joins (b/s/nl) | pushed | gwin | verdict |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            fh.write("| " + " | ".join(str(x) for x in r) + " |\n")
        fh.write("\n## Flags\n\n")
        if flags:
            for f_ in flags:
                fh.write(f"- {f_}\n")
        else:
            fh.write("none — every plan is either clean or on a documented allowlist\n")
    n_flag = len(flags)
    print(f"{len(rows)} plans audited, {n_flag} flagged -> {args.out}")
    return 0 if not n_flag else 1


if __name__ == "__main__":
    raise SystemExit(main())
