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
