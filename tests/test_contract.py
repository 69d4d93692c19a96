"""Driver-contract stability (round-3 verdict item 9): the 88-query
registry's NAME SET must stay stable round-over-round, the attestation
ordering must keep the least-attested entries inside a 50-entry driver
window, and every reference dispatch string must resolve (folded here from
the r3 sweep so one test protects the whole contract surface)."""

from ckg_spark import driver_contract as DC
from ckg_spark.operators import analytics_factory as AF

EXPECTED_NAMES = {
    "q01_pricing_summary", "q02_filter_project", "q03_star_join",
    "q04_semi_join", "q05_anti_join", "q06_group_collect", "q07_first_order",
    "q08_window_lag", "q09_running_sum", "q10_topk_revenue",
    "q11_pivot_events", "q12_union", "q13_intersect", "q14_except",
    "q15_symmetric_dedup", "q16_scalar_funcs", "q17_cov", "q18_median",
    "q19_rollup", "q20_indicator_agg", "q21_mentions",
    "q22_mention_doc_counts", "q23_comention_pairs", "q24_link_best",
    "q25_term_cc", "q26_dedup_exact", "q27_token_stats",
    "q28_jaccard_adjacent", "q29_cosine_topk", "q30_doc_fingerprint",
    "q31_minhash_clusters", "q32_transcript_mention_edges",
    "q33_simhash_pairs", "q34_pivot_avg", "q35_zscore", "q36_quantile_norm",
    "q37_correlation", "q38_bh_correction", "q39_summary_stats",
    "q40_term_degree", "q41_tfidf", "q42_twostage_fdr",
    "q43_multi_correlation", "q44_regulation_enrichment", "q45_ivf_topk",
    "q46_kaplan_meier", "q47_ssgsea", "q48_rm_correlation",
    "q49_median_centered_norm", "q50_merge_for_polar", "q51_fold_change",
    "q52_ks_dstat", "q53_gopher_quality", "q54_c4_line_filter",
    "q55_ivf_batch_topk", "q56_louvain_communities", "q57_repetition_flags",
    "q58_language_id", "q59_curation_pipeline", "q60_knowledge_assembly",
    "q61_contamination_report", "q62_unigram_logprob", "q63_levene_w",
    "q64_effect_sizes", "q65_wgcna_modules", "q66_tom_similarity",
    "q67_word_frequencies", "q68_sam_dstats", "q69_sampled_frame_features",
    "q70_embedding_neardup", "q71_incremental_sync_edges",
    "q72_mixture_sample", "q73_pack_sequences", "q74_training_export",
    "q75_pack_shuffled", "q76_dup_ngram_coverage", "q77_semantic_dedup_pairs",
    "q78_remove_duplicate_ngrams", "q79_pii_scrub", "q80_session_stats",
    "q81_asof_join", "q82_bigram_backoff", "q83_nb_quality_classifier",
    "q84_token_divergence", "q85_turn_tool_attribution",
    "q86_nb_calibration", "q87_source_fingerprints",
    "q88_cluster_balanced_mixture", "q89_sft_examples",
    "q90_preference_pairs", "q91_boilerplate_turns", "q92_context_budget",
    "q93_incremental_canonicalize", "q94_chunk_documents",
    "q95_remove_boilerplate", "q96_validate_conversations",
    "q97_entity_recency", "q98_chunk_dedup", "q99_schema_violations",
    "q100_negative_sampling", "q101_triangle_counts", "q102_linking_contexts",
    "q103_cooccurrence_scores", "q104_embedding_disambiguation",
    "q105_link_prediction", "q106_edge_intervals",
    "q107_personalized_pagerank", "q108_pagerank",
}

# Round 5: zero rows-only entries remain — q33 runs the md5 hash variant
# (exactly reproducible in DuckDB) and q56 runs louvain on a provable-
# optimum clique-union graph built from the documents table.
ROWS_ONLY: set = set()


def test_registry_names_stable():
    assert set(DC.queries_dict()) == EXPECTED_NAMES
    assert len(DC.queries_dict()) == 108


def test_oracle_coverage_complete_except_declared_rows_only():
    oracles = DC.oracle_dict()
    assert set(DC.queries_dict()) - set(oracles) == ROWS_ONLY
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_attestation_window_holds_least_attested_first():
    """The driver writes correctness rows for only the first 50 queries()
    entries per round. Round-5 rotation: q01-q18 (last driver-green in
    r03), the oracle-upgraded q33/q56, and the round-5 block q69-q98 fill
    the window EXACTLY (18 + 2 + 30 = 50). The late round-5 additions
    (q99+) landed after the window was full and sit immediately past it —
    value-attested by tools/check_oracles.py instead — followed by the
    q19-q68 middle (every entry hash-green in CORRECTNESS_r04) ascending,
    so the spill leads the round-6 rotation."""
    def num(n):
        return int(n[1:].split("_")[0])

    names = list(DC.queries_dict())
    window = set(names[:50])
    for n in names:
        if (num(n) <= 18 or 69 <= num(n) <= 98
                or n in ("q33_simhash_pairs", "q56_louvain_communities")):
            assert n in window, n
    outside = names[50:]
    late = [n for n in outside if num(n) >= 99]
    middle = [n for n in outside if 19 <= num(n) <= 68]
    # spill = late additions first (they lead round 6), then the
    # r04-attested middle; each block ascending, nothing else outside
    assert outside == late + middle, outside
    assert late == sorted(late, key=num)
    assert middle == sorted(middle, key=num)


def test_reference_dispatch_strings_resolve():
    """Every analysis_type the reference's factory dispatches must resolve
    to an operator or a documented NotImplementedError — never KeyError."""
    for s in AF.REFERENCE_ANALYSIS_TYPES:
        assert s in AF._DISPATCH or s in AF._UNSUPPORTED, s
