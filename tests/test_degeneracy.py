"""Degeneracy audit: every oracle-checked query must produce a
NON-VACUOUS result at sf0.01 — at least one row, and no column that is
NULL in every row.

Motivation (round 7): the driver's oracle comparison proves
Spark == DuckDB, but a query that returns 0 rows (or all-NULL values)
on both engines is green while verifying nothing — q_price_index
split ORDERS (whose dates span 1995-2001) at a 2024 literal, so every
row landed in period 0 and all three indices were NULL, hash-green
against the equally-degenerate oracle; q_anti_join matched 0 == 0
because every testdata customer has orders.  This test runs each
oracle through DuckDB alone (fast — no Spark) and fails on any query
whose own oracle is vacuous, which catches the class regardless of
which side the bug is on (the driver hash-check then covers
Spark == oracle).
"""

from __future__ import annotations

import duckdb
import pytest

from clv_data_pipeline_spark import registry
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


#: (query, column) pairs that are GENUINELY single-valued at sf0.01 —
#: reviewed one by one in round 8.  Three legitimate classes:
#: 1. scalar-attach: a global statistic broadcast onto every row
#:    (gini, auc, ece, idcg, modularity, mean_acc, pooled_diff,
#:    exact_users, est_out, n, n_days, n_users-per-decile);
#: 2. config/construction constants: resize targets (out_w/out_h),
#:    single-root trees (root), top-1 retrieval (rank), the single
#:    cohort week the query pins, equal-width deciles;
#: 3. documented DATA limitations of the synthetic corpus: no
#:    punctuation/digits/symbols/stopwords and a saturated ~60-word
#:    vocabulary (q_text_stats ratios, q_gopher_rules alpha/symbol/
#:    stopword rules and hence pass_gopher, q_heaps_law's zero growth
#:    slope, single-sentence docs, n_occ=1 RAKE phrases), and
#:    audit-assert columns whose steady state IS all-pass
#:    (within_bound, est_within_5pct, compacted, sign_flip, has_k,
#:    TPC-H's uniform name shapes).
#: Anything NOT here that goes constant is the flag-never-fires bug
#: class this audit caught 8 of in round 8 (q_lift_curve,
#: q_threshold_tuning, q_churn_labels, q_late_events, q_bh_fdr,
#: q_cusum, q_msprt, q_stl_decompose, q_price_elasticity,
#: q_image_dedup, q_audio_dedup, q_expectations, q_l_diversity).
CONSTANT_OK: frozenset[tuple[str, str]] = frozenset(
    {
        ("q_heaps_law", "vocab"),
        ("q_heaps_law", "beta"),
        ("q_heaps_law", "k"),
        ("q_simpson", "pooled_diff"),
        ("q_simpson", "sign_flip"),
        ("q_cross_validation", "mean_acc"),
        ("q_cross_validation", "sd_acc"),
        ("q_hll_merge", "exact_users"),
        ("q_hll_merge", "est_within_5pct"),
        ("q_json_extract", "has_k"),
        ("q_string_funcs", "name_prefix"),
        ("q_string_funcs", "name_len"),
        ("q_array_funcs", "types"),
        ("q_array_funcs", "n_types"),
        ("q_array_funcs", "tri_types"),
        ("q_text_stats", "punct_ratio"),
        ("q_text_stats", "digit_ratio"),
        ("q_cosine_topk", "rank"),
        ("q_ann_lsh_portable", "rank"),
        ("q_ann_ivf_portable", "rank"),  # top-1 contract: rank == 1
        ("q_ann_pq_portable", "rank"),  # top-1 contract: rank == 1
        ("q_dp_histogram", "epsilon"),  # mechanism parameter constant
        # BG/NBD x Gamma-Gamma CLV is nonnegative by construction, so
        # the reference's (misspelled, faithfully ported) quality
        # flags only fire on data errors — constant-false mirrors the
        # reference's own behavior on clean data (moved from the
        # rows-only whitelist at the round-12 graduation)
        ("q_clv_scores", "negatif_clv_flag"),
        ("q_clv_scores", "outliners_flag"),
        # the measured pair population is shared by every (b, r) grid
        # row by construction — the sweep varies the S-curve, not the
        # sample; exp_recall/fp_rate/utility are variance-checked
        ("q_lsh_param_sweep", "n_true_pairs"),
        ("q_lsh_param_sweep", "n_sub_pairs"),
        # Rayleigh quotient of the shared iterate — one ratio for the
        # whole fit, attached as broadcast scalar audit columns; the
        # per-row proj column is variance-checked normally
        ("q_pca_portable", "lam_num"),
        ("q_pca_portable", "lam_den"),
        ("q_retention_cohorts", "cohort_week"),
        ("q_source_report", "n_docs"),
        ("q_udtf_sentences", "sent_idx"),
        ("q_image_features", "min_px"),
        ("q_image_features", "max_px"),
        ("q_image_resize", "out_w"),
        ("q_image_resize", "out_h"),
        ("q_tree_paths", "root"),
        ("q_tree_depth_doubling", "root"),
        ("q_gopher_rules", "alpha_frac"),
        ("q_gopher_rules", "symbol_ratio"),
        ("q_gopher_rules", "r_word_len"),
        ("q_gopher_rules", "r_symbols"),
        ("q_gopher_rules", "r_alpha"),
        ("q_gopher_rules", "r_stopwords"),
        ("q_gopher_rules", "pass_gopher"),
        ("q_trend", "n"),
        ("q_dp_counts", "within_bound"),
        ("q_lorenz_gini", "gini"),
        ("q_cohort_ltv", "cohort_week"),
        ("q_applyinarrow", "n_docs"),
        ("q_auc", "auc"),
        ("q_rake", "n_occ"),
        ("q_join_explosion_audit", "est_out"),
        ("q_join_explosion_audit", "hot_key"),
        ("q_small_files", "compacted"),
        ("q_calibration", "ece"),
        ("q_ndcg", "idcg"),
        ("q_modularity", "modularity"),
        ("q_lift_curve", "n_users"),
        ("q_frame_sample", "frame_bytes"),
        ("q_simhash", "n_near_dup_pairs"),
        ("q_holt_winters", "n_days"),
        ("q_changepoint", "n_days"),
        # the lattice-MLE winning cell is ONE model shared by every
        # scored customer — constant by construction (scalar-attach
        # class, like q_pca_portable's lam_num/lam_den); p_alive /
        # pred_30d / pred_rank are variance-checked normally
        ("q_pareto_nbd", "cand"),
        ("q_pareto_nbd", "fit_r"),
        ("q_pareto_nbd", "fit_alpha"),
        ("q_pareto_nbd", "fit_s"),
        ("q_pareto_nbd", "fit_beta"),
        # corpus totals shared by every budget row of the packing
        # sweep by construction (the q_lsh_param_sweep
        # shared-pair-population class); split/pad fracs and the
        # argmin are variance-checked normally
        ("q_pack_eval", "n_docs"),
        ("q_pack_eval", "total_tokens"),
    }
)


def test_every_oracle_is_non_vacuous_at_sf001(con):
    bad = []
    for name, sql in registry.all_oracles().items():
        try:
            rows = con.execute(sql).fetchall()
        except Exception as ex:  # noqa: BLE001 — collect, report below
            bad.append((name, f"oracle error: {str(ex)[:120]}"))
            continue
        if not rows:
            bad.append((name, "0 rows"))
            continue
        cols = list(zip(*rows))
        allnull = [
            i for i, c in enumerate(cols) if all(v is None for v in c)
        ]
        if allnull:
            bad.append((name, f"all-NULL column indexes {allnull}"))
    assert not bad, (
        "vacuous oracle results (green-but-verifying-nothing): "
        + "; ".join(f"{n} [{why}]" for n, why in bad)
    )


def test_no_unexplained_constant_columns_at_sf001(con):
    """Constant-column vacuity (the class after all-NULL): a flag or
    computed column that is single-valued across every row at sf0.01
    is hash-green while its defining computation never fires — round
    8 found lift curves with lift=1.0 everywhere, churn labels that
    labeled nobody churned, and FDR corrections that never rejected.
    Every constant must either be fixed (planted effect, tuned
    threshold) or appear in CONSTANT_OK with its reviewed reason
    class.  Only multi-row results are checked: a 1-row aggregate is
    constant by arity, and <5 rows is too few to call anything
    degenerate."""
    bad = []
    for name, sql in registry.all_oracles().items():
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except Exception:  # noqa: BLE001 — the sibling test reports these
            continue
        if len(rows) < 5:
            continue
        for cn, vals in zip(cols, zip(*rows)):
            if len(set(vals)) == 1 and (name, cn) not in CONSTANT_OK:
                bad.append((name, cn, repr(vals[0])[:40]))
    assert not bad, (
        "unexplained constant columns (flag-never-fires vacuity — fix "
        "the query or whitelist with a reviewed reason): "
        + "; ".join(f"{n}.{c}={v}" for n, c, v in bad)
    )
