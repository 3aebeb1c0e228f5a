"""Physical-plan audits: the optimizations we rely on at 100 TB must
actually appear in the executed plan (broadcasts, column pruning)."""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    # other test modules may have cached these tables; pruning assertions
    # need the real parquet scan
    spark.catalog.clearCache()
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_are_broadcast(spark):
    plan = _plan(spark, "region_revenue")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q3_customer_broadcast(spark):
    plan = _plan(spark, "tpch_q3_top_orders")
    assert "BroadcastHashJoin" in plan


def test_doc_stats_column_pruning(spark):
    plan = _plan(spark, "doc_stats")
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines, plan[:1000]
    # documents has 5 columns; n_chars isn't used -> must not be read
    assert "n_chars#" not in scan_lines[0].split("ReadSchema")[0]


def test_tpch_q1_filter_pushdown(spark):
    plan = _plan(spark, "tpch_q1_pricing_summary")
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed


def test_extraction_whole_stage_codegen_shell(spark):
    """The relational shell around the extraction UDF stays in codegen."""
    pages = entrymod._fixture_pages(spark, 40)
    from docling_spark import engine
    plan = (engine.extract_pages(pages, repartition=False)
            ._jdf.queryExecution().executedPlan().toString())
    # '*(n)' prefixes mark whole-stage-codegen stages in toString output
    assert "*(1)" in plan
    # and the scan is pruned to exactly (url, html)
    assert "ReadSchema: struct<url:string,html:binary>" in plan


def test_ngram_jaccard_no_cartesian(spark):
    """The near-dup self-join must be a shuffled equi-join on the gram
    key - never a cartesian/nested-loop product."""
    plan = _plan(spark, "ngram_jaccard_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # equi-join on the gram key (AQE picks broadcast at tiny scale,
    # sort-merge/shuffled-hash at scale - all fine, none are products)
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_doc_fingerprints_stays_jvm_side(spark):
    """Sketching is pure column algebra - no Python UDF stages."""
    plan = _plan(spark, "doc_fingerprints")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan


def test_gopher_quality_single_projection(spark):
    """The Gopher gate is one scan-side projection: no shuffle (Exchange),
    no Python UDF, scan pruned to (doc_id, text)."""
    plan = _plan(spark, "gopher_quality")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_passages_no_cartesian_no_udf(spark):
    """Passage dedup: explode + hash-groupBy + equi-join, all JVM-side."""
    plan = _plan(spark, "dup_passages")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_emb_knn_ivf_broadcast_probes_no_cartesian(spark):
    """IVF search joins the corpus to BROADCAST query probes on the
    list_id equi-key: the corpus side never shuffles on data size and
    no all-pairs product appears; assignment is JVM array algebra."""
    plan = _plan(spark, "emb_knn_ivf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_emb_cosine_dups_no_cartesian_no_udf(spark):
    """Cosine dedup must block on dim keys (equi-join) and stay JVM-side:
    no all-pairs product, no Python UDF stages, no window exchange for
    the top-m key extraction (array_sort does it per-row)."""
    plan = _plan(spark, "emb_cosine_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_pii_scrub_single_projection(spark):
    """PII scrub is one scan-side projection: regexp_count/replace stay
    in whole-stage codegen - no shuffle, no Python."""
    plan = _plan(spark, "pii_scrub")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats_no_cartesian_no_udf(spark):
    """Repetition filters: explode + hash aggregations + one equi-join
    on doc_id, all JVM-side."""
    plan = _plan(spark, "repetition_stats")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_token_stats_single_projection(spark):
    """Token counting is one scan-side projection: regexp_count stays
    in whole-stage codegen - no shuffle, no Python."""
    plan = _plan(spark, "bpe_token_stats")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_source_profile_partial_agg(spark):
    """Source profile is one hash aggregation with a map-side partial
    (two HashAggregate operators around a single key Exchange)."""
    plan = _plan(spark, "source_profile")
    assert plan.count("Exchange") <= 2  # key agg (+ distinct-lang expand)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_stratified_sample_zero_shuffle(spark):
    """Deterministic sampling is a scan-side filter+projection: the
    md5-bucket expression stays in whole-stage codegen - no Exchange,
    no Python."""
    plan = _plan(spark, "stratified_sample")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcast_bench_no_cartesian(spark):
    """Decontamination joins the corpus gram stream against a BROADCAST
    benchmark gram set - the corpus is never shuffled on text size and
    nothing goes all-pairs."""
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_profile_partial_agg(spark):
    """Per-host profile: hash aggregation with map-side partials; the
    distinct-path count uses Spark's two-phase partial-distinct."""
    plan = _plan(spark, "domain_profile")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_keywords_broadcast_scalar_no_cartesian(spark):
    """TF-IDF: tf/df hash aggs + word equi-join + per-doc window; the
    n_docs scalar is broadcast, nothing goes all-pairs, no Python."""
    plan = _plan(spark, "tfidf_keywords")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_surprisal_broadcast_scalar_no_cartesian(spark):
    """Unigram surprisal: two hash aggs + vocabulary-dimension join;
    the corpus-total scalar is broadcast, no Python."""
    plan = _plan(spark, "unigram_surprisal")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quality_gate_single_scan_broadcast_threshold(spark):
    """Quality gate: score projection + one percentile agg broadcast
    back as a 1-row scalar - the corpus itself never shuffles."""
    plan = _plan(spark, "quality_gate")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_event_funnel_user_keyed_no_window(spark):
    """Funnel: one user-keyed hash agg per depth - no window operator,
    no cross product, nothing Python-side."""
    plan = _plan(spark, "event_funnel")
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_profile_single_agg_no_udf(spark):
    """Embedding QC: scan-side norm fold + one label-keyed hash agg;
    the vector payload never shuffles (only partial-agg rows do)."""
    plan = _plan(spark, "embedding_profile")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_weights_broadcast_dim_no_cartesian(spark):
    """DSIR: the 256-row bucket dimension joins back by broadcast; the
    corpus shuffles only (doc, bucket) partial rows, no Python."""
    plan = _plan(spark, "dsir_weights")
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_zipf_topk_no_global_sort_materialize(spark):
    """Zipf head: word hash agg then TakeOrdered(k) - per-partition
    heaps merge k rows, the global sort never materializes; no Python."""
    plan = _plan(spark, "vocab_zipf")
    assert "HashAggregate" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sequence_pack_bounded_window_one_shuffle(spark):
    """Packing: one running-sum window partitioned on (shard,
    subshard) - bounded per-task sort, exactly one exchange, no
    Python."""
    plan = _plan(spark, "sequence_pack")
    assert "Window" in plan
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_perplexity_buckets_broadcast_thresholds(spark):
    """Tercile split: the threshold row is broadcast back; the scored
    corpus is never reshuffled for bucketing, no Python."""
    plan = _plan(spark, "perplexity_buckets")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_novelty_digest_join_no_window(spark):
    """Recrawl gate: both sides reduce to md5 digests before the join
    (text never shuffles), one low-cardinality agg, no window, no
    Python."""
    plan = _plan(spark, "incremental_novelty")
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_source_vocab_overlap_broadcast_sizes_no_cartesian(spark):
    """Vocab overlap: the S-row size table joins back by broadcast;
    the vocab self-join is a word-keyed equi-join (never a cross
    product) and nothing runs Python-side."""
    plan = _plan(spark, "source_vocab_overlap")
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_retention_cohorts_user_keyed_no_window(spark):
    """Retention triangle: user-keyed aggs + one user-keyed join;
    cohort sizes broadcast back; no window operator, no Python."""
    plan = _plan(spark, "retention_cohorts")
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_spans_single_text_scan(spark):
    """dup_span_manifest: gram index is localCheckpointed for its two
    consumers, so text is scanned and gram-built ONCE; no Python, no
    cartesian anywhere in the plan."""
    plan = _plan(spark, "dup_spans")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) <= 1, scans


def test_host_cap_two_phase_windows(spark):
    """host_budget_cap: the salted phase must partition its window on
    (host, salt) so a mega-host is spread over n_salts sort tasks."""
    plan = _plan(spark, "host_cap")
    assert "BatchEvalPython" not in plan
    win_nodes = [l for l in plan.splitlines()
                 if "Window [row_number()" in l]
    assert len(win_nodes) == 2, win_nodes
    # phase-1 window is keyed on (host, salt); and Spark pushes a
    # map-side WindowGroupLimit so even phase 1 never sorts a full group
    assert any("salt" in l for l in win_nodes)
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_bucketed_join_is_exchange_free(spark):
    """engine.write_bucketed: two tables bucketed on url join WITHOUT
    any Exchange - the write-once-shuffle-never contract for url-keyed
    reprocessing at 100 TB."""
    from pyspark.sql import functions as F
    from docling_spark import engine
    a = spark.range(2000).select(
        F.concat(F.lit("https://b.test/"), F.col("id").cast("string"))
        .alias("url"), F.col("id").alias("v1"))
    b = spark.range(2000).select(
        F.concat(F.lit("https://b.test/"), F.col("id").cast("string"))
        .alias("url"), (F.col("id") * 2).alias("v2"))
    engine.write_bucketed(a, "bk_a", num_buckets=8)
    engine.write_bucketed(b, "bk_b", num_buckets=8)
    # at test scale the planner would pick broadcast (and skip bucketed
    # reads); force the at-scale strategy - where both sides are far too
    # big to broadcast - to show the bucketing removes the shuffle
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "url")
        assert joined.count() == 2000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_approx_percentile_variants_keep_plan_shape(spark):
    """The approx=True 100-TB configuration must be one argument, not a
    plan rewrite: percentile_approx keeps the same Exchange count as
    the exact variant (one agg + broadcast-back) and produces sane
    values on small data."""
    from docling_spark import textfns
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    for fn, kwargs in ((textfns.quality_gate, {}),
                       (textfns.length_quantiles, {}),
                       (textfns.perplexity_buckets, {})):
        exact = fn(docs, **kwargs)
        approx = fn(docs, approx=True, **kwargs)
        pe = exact._jdf.queryExecution().executedPlan().toString()
        pa = approx._jdf.queryExecution().executedPlan().toString()
        assert pa.count("Exchange") == pe.count("Exchange"), fn.__name__
        assert approx.columns == exact.columns, fn.__name__
        assert approx.count() == exact.count(), fn.__name__

    # the approx gate keeps (about) the same fraction as the exact one
    # (score ties make the absolute fraction data-shaped; what must
    # hold is exact ~= approx - the sketch threshold lands on a real
    # data value at most one tie-group away from the interpolated one)
    ge = textfns.quality_gate(docs, quantile=0.7)
    ga = textfns.quality_gate(docs, quantile=0.7, approx=True)
    n = ge.count()
    kept_e = ge.where("keep").count() / n
    kept_a = ga.where("keep").count() / n
    assert abs(kept_a - kept_e) <= 0.10, (kept_e, kept_a)


def test_bm25_plan_broadcasts_query_dimensions(spark):
    """bm25_topk: query terms / df / corpus stats ride broadcast joins
    (the corpus-side TF table never shuffles for them), no cartesian
    product, and the per-query top-k is WindowGroupLimit-pushed."""
    plan = _plan(spark, "bm25_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin") >= 3, plan[:3000]
    assert "WindowGroupLimit" in plan


def test_pmi_plan_band_join_is_equi_join(spark):
    """pmi_pairs: the windowed co-occurrence join must be an equi-join
    on doc_id (band predicate as post-filter), never a cartesian."""
    plan = _plan(spark, "pmi_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_crawl_frontier_broadcast_rank_no_cartesian(spark):
    """crawl_frontier: the host-rank dimension rides a broadcast join
    onto the policy survivors; nothing goes all-pairs; the two-phase
    cap keeps windows per (host, salt) then per host."""
    plan = _plan(spark, "crawl_frontier")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_readability_single_projection(spark):
    """Readability is pure scan-side regexp algebra: no Exchange, no
    Python stages - free with the scan at 100 TB."""
    plan = _plan(spark, "readability")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_surprisal_no_cartesian_no_udf(spark):
    """Bigram LM: hash aggs + bigram/unigram equi-joins + broadcast V
    scalar - no all-pairs product, no Python."""
    plan = _plan(spark, "bigram_surprisal")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or \
        plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row V scalar
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_pair_join_is_equi_join(spark):
    """semantic_dedup's quadratic stage must be bounded by the cluster
    equi-key - no global cartesian."""
    from docling_spark import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = similarity.semantic_dedup(emb, k=4, n_iter=1, threshold=0.99)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
