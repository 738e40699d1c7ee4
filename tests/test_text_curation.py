"""Behavior tests for the round-5 curation operators (the synthetic
documents corpus contains no PII, so the registry query only proves
engine parity; these fixtures prove the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_scrub_redacts_and_counts(spark, tmp_path):
    """Emails, phone numbers, and IPv4 literals are replaced with typed
    placeholders; counts reflect matches; clean text carries no
    residue. The query fingerprints the scrubbed text, so here we apply
    the same pattern chain to inspect the text itself."""
    from dod_etl_spark.queries.llm import _PII_PATTERNS

    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or 555-123-4567 now"),
            (2, "server at 10.0.0.1 and mirror at 192.168.1.254"),
            (3, "nothing sensitive here"),
            (4, "a@b.io mailed c.d@e.org twice"),
            (5, "see https://user@host.example/p?x=1 and http://10.0.0.1/a"),
        ],
        "doc_id long, text string",
    )
    clean = F.col("text")
    cols = [F.col("doc_id")]
    for name, pat, repl in _PII_PATTERNS:
        cols.append(F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, repl)
    out = {r["doc_id"]: r for r in df.select(*cols, clean.alias("clean")).collect()}

    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "<EMAIL>" in out[1]["clean"] and "<PHONE>" in out[1]["clean"]
    assert "example" not in out[1]["clean"] and "555" not in out[1]["clean"]
    assert out[2]["n_ipv4"] == 2 and out[2]["clean"].count("<IP>") == 2
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == 0
    assert out[3]["clean"] == "nothing sensitive here"
    assert out[4]["n_email"] == 2 and out[4]["clean"].count("<EMAIL>") == 2
    # urls scrub FIRST: the embedded email/IP belong to the <URL>
    # placeholder, not their own
    assert out[5]["n_url"] == 2 and out[5]["clean"].count("<URL>") == 2
    assert out[5]["n_email"] == 0 and out[5]["n_ipv4"] == 0
    assert "host.example" not in out[5]["clean"]


def test_repetition_ratio_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),
            (2, "a genuinely varied sentence with unique words"),
        ],
        "doc_id long, text string",
    )
    tk = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    ratio = F.lit(1.0) - F.size(F.array_distinct(tk)) / F.size(tk).cast("double")
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", ratio.alias("r"), (ratio >= 0.3).alias("flag")).collect()
    }
    assert out[1]["flag"] and out[1]["r"] == 0.75  # 2 uniq / 8 toks
    assert not out[2]["flag"] and out[2]["r"] == 0.0


def test_domain_cap_is_deterministic_and_bounded(spark, sf_dir):
    from dod_etl_spark.queries.llm import _DOMAIN_CAP, domain_cap_docs

    a = domain_cap_docs(spark, sf_dir).toPandas()
    b = domain_cap_docs(spark, sf_dir).toPandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))  # no rand()
    per_source = a.groupby("source").size()
    assert (per_source <= _DOMAIN_CAP).all()


def test_minhash_bucket_size_cap(spark):
    """max_bucket_size drops degenerate LSH buckets from candidate
    generation: identical boilerplate docs form a mega-bucket whose
    pairs vanish under the cap, while a small genuine near-dup bucket
    survives. Uncapped behavior is unchanged (the oracle mode)."""
    from dod_etl_spark.operators.text_dedup import minhash_candidates

    boiler = [(i, "exact same boilerplate text repeated everywhere") for i in range(40)]
    near = [
        (100, "a genuinely unique document about spark shuffles"),
        (101, "a genuinely unique document about spark shuffling"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id long, text string")

    uncapped = minhash_candidates(docs, num_hashes=8, band_size=2, shingle_len=5)
    capped = minhash_candidates(
        docs, num_hashes=8, band_size=2, shingle_len=5, max_bucket_size=10
    )
    # 40 identical docs -> C(40,2)=780 boilerplate pairs uncapped.
    assert uncapped.filter("id_1 < 100").count() == 780
    assert capped.filter("id_1 < 100").count() == 0  # mega-bucket dropped
    # The small near-dup bucket survives the cap.
    assert capped.filter("id_1 = 100 AND id_2 = 101").count() == 1


def test_fingerprint_store_dedups_across_batches(spark, tmp_path):
    """Persistent-history exact dedup: content seen in ANY earlier batch
    (not just the watermark window) is suppressed; within-batch dups
    collapse to the min-id representative; the store grows append-only
    and is bucketed on fp (store side never shuffles in the anti-join).
    Also drivable by a real stream via foreachBatch."""
    import shutil
    from urllib.parse import urlparse

    from dod_etl_spark.streaming.dedup_store import FingerprintStore

    store = FingerprintStore(spark, table="dedup_fp_test", n_buckets=4)
    spark.sql("DROP TABLE IF EXISTS dedup_fp_test")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/dedup_fp_test", ignore_errors=True)

    b1 = spark.createDataFrame(
        [(3, "alpha"), (1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    out1 = store.dedup_batch(b1)
    rows1 = {(r["doc_id"], r["text"]) for r in out1.collect()}
    assert rows1 == {(1, "alpha"), (2, "beta")}  # min-id wins within batch
    assert store.seen_count() == 2

    # Batch 2: one historical dup (alpha), one new (gamma).
    b2 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma")], "doc_id long, text string"
    )
    out2 = store.dedup_batch(b2)
    assert {(r["doc_id"], r["text"]) for r in out2.collect()} == {(11, "gamma")}
    assert store.seen_count() == 3

    # Replay of batch 2 (at-least-once source): everything suppressed.
    assert store.dedup_batch(b2).count() == 0
    assert store.seen_count() == 3

    # Streaming drive: new content flows, historical dups do not.
    src = tmp_path / "fp_src"
    spark.createDataFrame(
        [(20, "beta"), (21, "delta")], "doc_id long, text string"
    ).write.parquet(str(src))
    from dod_etl_spark.streaming.sinks import MemorySink

    sink = MemorySink()

    def body(df, bid):
        sink(store.dedup_batch(df), bid)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "fp_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r["doc_id"], r["text"]) for r in sink.rows} == {(21, "delta")}
    assert store.seen_count() == 4
    spark.sql("DROP TABLE IF EXISTS dedup_fp_test")


def test_fingerprint_store_scan_is_bucketed(spark, tmp_path):
    """At scale (store past the broadcast threshold) the anti-join must
    read the store through its bucket layout — the seen-set side joins
    with NO exchange, only the micro-batch hashes into the layout."""
    import shutil
    from urllib.parse import urlparse

    from pyspark.sql import functions as F

    from dod_etl_spark.streaming.dedup_store import FingerprintStore

    spark.sql("DROP TABLE IF EXISTS fp_bucket_t")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/fp_bucket_t", ignore_errors=True)
    store = FingerprintStore(spark, table="fp_bucket_t", n_buckets=4)
    store.dedup_batch(
        spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = spark.createDataFrame(
            [(3, "z")], "doc_id long, text string"
        ).withColumn("fp", F.md5(F.col("text").cast("binary")))
        plan = (
            batch.join(spark.table("fp_bucket_t"), "fp", "left_anti")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS fp_bucket_t")


# --- Exact Jaccard similarity join (prefix filtering) ------------------------


def test_jaccard_join_matches_bruteforce(spark):
    """Prefix-filtered join == brute-force all-pairs on random docs —
    completeness and exactness in one property."""
    import itertools
    import random

    from dod_etl_spark.operators.text_dedup import jaccard_similarity_join

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        n = rng.randint(3, 12)
        rows.append((i, " ".join(rng.sample(vocab, n))))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    for t in (0.3, 0.5, 0.8):
        got = {
            (r["id_1"], r["id_2"])
            for r in jaccard_similarity_join(docs, threshold=t).collect()
        }
        want = set()
        sets = {i: set(txt.split()) for i, txt in rows}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter >= t * union:
                want.add((a, b))
        assert got == want, f"t={t}: {got ^ want}"


def test_jaccard_join_identical_and_disjoint(spark):
    from dod_etl_spark.operators.text_dedup import jaccard_similarity_join

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "delta epsilon zeta"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = jaccard_similarity_join(docs, threshold=0.99).collect()
    assert {(r["id_1"], r["id_2"]) for r in rows} == {(1, 2)}
    assert rows[0]["jaccard"] == 1.0


def test_jaccard_join_rejects_bad_threshold(spark):
    import pytest as _pytest

    from dod_etl_spark.operators.text_dedup import jaccard_similarity_join

    docs = spark.createDataFrame([(1, "a")], "doc_id LONG, text STRING")
    with _pytest.raises(ValueError):
        jaccard_similarity_join(docs, threshold=0.0)
