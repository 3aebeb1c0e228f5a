"""Operator tests: dedup, similarity, text functions, streaming twins,
multimodal plumbing — over the driver-generated testdata tables."""

import pytest
from pyspark.sql import functions as F

from docling_spark import dedup, multimodal, similarity, streaming, textfns

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_exact_dedup_finds_planted_clones(spark, docs):
    clones = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000)
    groups = dedup.exact_duplicates(docs.unionByName(clones)).collect()
    assert len(groups) == 5
    assert all(g["dup_count"] == 2 for g in groups)
    kept = dedup.dedup_keep_first(docs.unionByName(clones))
    assert kept.count() == docs.count()


def test_minhash_lsh_recall_on_exact_clones(spark, docs):
    base = docs.limit(60)
    clones = base.limit(6).withColumn("doc_id", F.col("doc_id") + 10_000)
    pairs = dedup.near_duplicates(base.unionByName(clones), k=5,
                                  num_hashes=32, bands=16, threshold=0.99)
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    expected = {(r["doc_id"], r["doc_id"] + 10_000)
                for r in base.limit(6).collect()}
    # identical docs share every minhash: recall must be 100%
    assert expected <= found


def test_minhash_rejects_dissimilar(spark, docs):
    pairs = dedup.near_duplicates(docs.limit(40), k=5, num_hashes=32,
                                  bands=8, threshold=0.9)
    for r in pairs.collect():
        assert r["jaccard"] >= 0.9


def test_simhash_identical_hamming_zero(spark, docs):
    base = docs.limit(30)
    clones = base.limit(3).withColumn("doc_id", F.col("doc_id") + 10_000)
    out = dedup.simhash_near_duplicates(base.unionByName(clones),
                                        max_hamming=0)
    found = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    expected = {(r["doc_id"], r["doc_id"] + 10_000)
                for r in base.limit(3).collect()}
    assert expected <= found


def test_knn_bruteforce_self_similarity(spark, emb):
    qs = emb.where(F.col("vec_id") < 3)
    out = similarity.cosine_topk_bruteforce(emb, qs, k=3).collect()
    assert len(out) == 9
    for r in out:
        assert -1.001 <= r["cosine"] <= 1.001
        assert r["nbr_id"] != r["query_id"]


def test_knn_lsh_subset_of_bruteforce_domain(spark, emb):
    dim = len(emb.first()["embedding"])
    qs = emb.where(F.col("vec_id") < 3)
    out = similarity.cosine_topk_lsh(emb, qs, dim=dim, k=3, n_planes=4)
    rows = out.collect()
    assert all(r["rank"] <= 3 for r in rows)


def test_lsh_bucket_deterministic(spark, emb):
    dim = len(emb.first()["embedding"])
    b1 = similarity.lsh_bucket(emb.limit(20), dim).collect()
    b2 = similarity.lsh_bucket(emb.limit(20), dim).collect()
    assert {(r["vec_id"], r["bucket"]) for r in b1} == \
           {(r["vec_id"], r["bucket"]) for r in b2}


def test_textfns_basic(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox and the lazy dog", "en"),
         (2, "", "en"),
         (3, "der die das und ist von nicht mit", "de")],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        textfns.token_count("text").alias("tc"),
        textfns.lang_guess("text").alias("lg"),
        textfns.fingerprint("text").alias("fp")).collect()}
    assert out[1]["tc"] == 8
    assert out[2]["tc"] == 0
    assert out[1]["lg"] == "en"
    assert out[3]["lg"] == "de"
    assert out[1]["fp"] is not None and len(out[1]["fp"]) == 32


def test_quality_score_range(spark, docs):
    rows = docs.select(
        textfns.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_streaming_batch_twins(spark, events):
    hourly = streaming.hourly_event_counts(events)
    assert hourly.count() > 0
    total = hourly.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    sessions = streaming.batch_sessionize(events)
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == events.count()


def test_streaming_stream_runs(spark, tmp_path):
    """Real Structured Streaming micro-batch over the events parquet."""
    import shutil
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    src = str(src_dir)
    q = (streaming.stream_hourly_counts(spark, src)
         .writeStream.format("memory").queryName("hourly_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) c from hourly_stream").collect()[0]["c"]
    want = spark.read.parquet(f"{SF}/events.parquet").count()
    assert got == want


def test_multimodal_feature_plumbing(spark):
    rows = [(1, "image", b"\x89PNG fake bytes", "image/png"),
            (2, "audio", b"RIFF fake", "audio/wav"),
            (3, "video", None, "video/mp4")]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string")
    out = {r["media_id"]: r for r in
           multimodal.extract_media_features(df).collect()}
    assert out[1]["width"] is not None and out[1]["height"] is not None
    assert out[2]["duration_s"] is not None
    assert out[3]["byte_len"] == 0
    # determinism
    out2 = {r["media_id"]: r for r in
            multimodal.extract_media_features(df).collect()}
    assert out == out2
