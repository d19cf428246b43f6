"""Round-7 regression tests for the ADVICE findings.

Covers: streaming dedup state eviction via dropDuplicatesWithinWatermark,
streaming_nb_route resilience to priors-only labels, 64-bit aHash packing
under ANSI mode, and global_line_dedup first-occurrence election beyond
the old 1e6-line arithmetic encoding.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_dedup_uses_within_watermark_eviction(spark, tmp_path):
    """The streaming exact-dedup plan must carry a
    DeduplicateWithinWatermark node: plain dropDuplicates on a
    non-time key subset never evicts state, so the old plan grew the
    state store unboundedly on a live stream."""
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_dedup_exact,
    )

    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(
        [("a", "hello"), ("b", "hello"), ("c", "world")],
        "doc_id string, text string",
    ).withColumn("ts", F.current_timestamp()).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .parquet(src)
    )
    deduped = streaming_dedup_exact(stream, "text", "ts")
    plan = deduped._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in plan, plan

    q = (
        deduped.writeStream.format("memory")
        .queryName("r7_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select text from r7_dedup_out").collect()
    assert sorted(r.text for r in rows) == ["hello", "world"]


def test_streaming_curation_route_within_watermark(spark):
    """streaming_curation_route with an event-time column uses the
    WithinWatermark dedup (bounded state); without one it falls back
    to plain dropDuplicates for bounded replay."""
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_curation_route,
    )

    docs = spark.createDataFrame(
        [("a", "some text here", "2024-01-01 00:00:00")],
        "doc_id string, text string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with_time = streaming_curation_route(docs, event_time_col="ts")
    plan = with_time._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in plan, plan

    without_time = streaming_curation_route(docs, event_time_col=None)
    plan2 = without_time._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" not in plan2, plan2


def test_streaming_nb_route_priors_only_label(spark, tmp_path):
    """A label present in priors but absent from the model (all its
    training docs were empty) must not crash the router — batch
    nb_score silently omits such labels via its inner join, and the
    stream must match that, not KeyError mid-batch."""
    from genetics_spark_coloc_spark.operators.nb import (
        nb_priors,
        nb_score,
        nb_train,
    )
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_nb_route,
    )

    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta alpha", "en"),
            ("d2", "alpha gamma", "en"),
            ("d3", "uno dos tres", "es"),
            ("d4", "", "xx"),  # label xx: only empty text -> no model rows
            ("d5", "", "xx"),
        ],
        "doc_id string, text string, lang string",
    )
    model = nb_train(docs)
    assert model.filter(F.col("label") == "xx").count() == 0
    priors = nb_priors(docs)
    assert priors.filter(F.col("label") == "xx").count() == 1

    batch = {
        r.docId: (r.label, r.score) for r in nb_score(docs, model, priors).collect()
    }

    src = str(tmp_path / "nb_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_nb_route(stream, model, priors)
        .writeStream.format("memory")
        .queryName("r7_nb_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.docId: (r.label, r.score)
        for r in spark.sql("select * from r7_nb_out").collect()
    }
    assert got == batch
    assert all(lab != "xx" for lab, _ in got.values())


def test_ahash_signature_64_bits_ansi_safe(spark):
    """Packing a 64-feature signature whose top bit is set must use
    shift/OR semantics: the old acc*2+b fold overflowed a signed long
    on the last step and threw under spark.sql.ansi.enabled=true."""
    from genetics_spark_coloc_spark.operators.multimodal import ahash_signature

    # feature[i] maps to weight 2^i: feature[63] far above the mean
    # -> bit 63 (weight 2^63) is set
    feats = [10.0 / 256.0] * 63 + [200.0 / 256.0]
    df = spark.createDataFrame(
        [("m1", feats)], "mediaId string, feature array<float>"
    )
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        row = ahash_signature(df).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert row.nBits == 64
    # only bit 63 set == long MIN_VALUE as a signed 64-bit pattern
    assert row.sig == -(2**63)


def test_global_line_dedup_beyond_1m_lines(spark):
    """First-occurrence election must be lexicographic on
    (docId, pos), not the old docId*1e6+pos arithmetic key: with a
    shared line at pos >= 1e6 in the lower docId, the arithmetic key
    elected the HIGHER docId's occurrence."""
    from genetics_spark_coloc_spark.operators.text import global_line_dedup

    n_pad = 1_000_001
    df = (
        spark.createDataFrame([(1,), (2,)], "docId int")
        .withColumn(
            "lines",
            F.when(
                F.col("docId") == 1,
                # 1,000,001 distinct pad lines then "shared" at pos 1,000,001
                F.concat(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_pad - 1)),
                        lambda i: F.concat(F.lit("pad"), i.cast("string")),
                    ),
                    F.array(F.lit("shared")),
                ),
            ).otherwise(F.array(F.lit("shared"), F.lit("tail"))),
        )
    )
    out = {
        r.docId: (r.nLines, r.nKept)
        for r in global_line_dedup(df, F.col("lines"), id_col="docId").collect()
    }
    # doc 1 keeps everything incl. "shared" (smallest (docId,pos));
    # doc 2 loses "shared" to doc 1 despite its smaller arithmetic key
    assert out[1] == (n_pad + 1, n_pad + 1)
    assert out[2] == (2, 1)


def test_verbatim_hot_gram_guard_raises(spark):
    """A planted boilerplate gram with ~1e5 occurrences must abort
    the pair join loudly (the join is quadratic per gram: 1e5
    occurrences -> 1e10 pairs), with the frequency in the message."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from genetics_spark_coloc_spark.operators.text import (
        verbatim_match_spans,
    )

    # one doc of 100k identical tokens plants a single 5-gram with
    # ~1e5 occurrences; a second doc makes it cross-doc pairable
    docs = spark.range(2).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.array_repeat(F.lit("boiler"), 100_000), " "
        ).alias("text"),
    )
    guarded = verbatim_match_spans(docs, "text", "doc_id", min_tokens=5)
    with pytest.raises(SparkRuntimeException, match="hot-bucket guard"):
        guarded.count()


def test_verbatim_hot_gram_guard_cap_and_disable(spark):
    """on_hot_gram='cap' excludes the hot gram (bounded join, no
    error); hot_gram_ceiling=None restores the unguarded behavior;
    an explicit max_gram_freq supersedes the guard; and normal
    corpora below the ceiling are untouched by the default."""
    from genetics_spark_coloc_spark.operators.text import (
        verbatim_match_spans,
    )

    hot = spark.range(2).select(
        F.col("id").alias("doc_id"),
        F.array_join(F.array_repeat(F.lit("boiler"), 40), " ").alias("text"),
    )
    # cap mode: the hot gram (freq 72 > ceiling 10) is excluded -> no pairs
    capped = verbatim_match_spans(
        hot, "text", "doc_id", min_tokens=5, hot_gram_ceiling=10,
        on_hot_gram="cap",
    )
    assert capped.count() == 0
    # explicit max_gram_freq supersedes the guard entirely
    explicit = verbatim_match_spans(
        hot, "text", "doc_id", min_tokens=5, max_gram_freq=1000,
        hot_gram_ceiling=10,
    )
    assert explicit.count() > 0
    # disabled guard: same result as the explicit-cap=none path
    unguarded = verbatim_match_spans(
        hot, "text", "doc_id", min_tokens=5, hot_gram_ceiling=None
    )
    assert unguarded.count() == explicit.count()

    # a normal small corpus sails through the default ceiling
    normal = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tomorrow"),
        ],
        "doc_id int, text string",
    )
    rows = verbatim_match_spans(normal, "text", "doc_id", min_tokens=5).collect()
    assert len(rows) == 1 and rows[0].matchTokens == 9


def test_streaming_curation_route_matches_batch(spark, tmp_path):
    """Replaying a corpus through streaming_curation_route reproduces
    the batch curation_funnel verdicts: stage booleans are
    content-determined, so every emitted row's flags must equal the
    batch flags for that doc; exactly one doc per content family is
    emitted; and the family-level kept verdict matches the batch
    keeper's (stream elects first arrival, batch elects min-id — same
    family, same content, same flags)."""
    from genetics_spark_coloc_spark.operators.text import curation_funnel
    from genetics_spark_coloc_spark.streaming.pipelines import (
        streaming_curation_route,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # guarantee duplicate families: every doc appears twice under two ids
    docs = base.unionByName(
        base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )

    batch = curation_funnel(docs).collect()
    b_flags = {
        r.docId: (r.passQuality, r.passRepetition, r.passPii) for r in batch
    }
    fam = {
        r["h"]: (r["anyKept"])
        for r in curation_funnel(docs)
        .join(
            docs.select(
                F.col("doc_id").alias("docId"),
                F.md5(F.coalesce("text", F.lit(""))).alias("h"),
            ),
            on="docId",
        )
        .groupBy("h")
        .agg(F.max(F.col("kept").cast("int")).alias("anyKept"))
        .collect()
    }

    src = str(tmp_path / "curation_stream")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_curation_route(stream)
        .writeStream.format("memory")
        .queryName("r7_curation_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.sql("select * from r7_curation_out").collect()

    # one emission per content family
    assert len(streamed) == len(fam) > 100
    doc_hash = {
        r.docId: r.h
        for r in docs.select(
            F.col("doc_id").alias("docId"),
            F.md5(F.coalesce("text", F.lit(""))).alias("h"),
        ).collect()
    }
    seen_families = set()
    for r in streamed:
        # stage flags bit-identical to the batch operator's for this doc
        assert (r.passQuality, r.passRepetition, r.passPii) == b_flags[r.docId]
        # family kept verdict matches the batch family verdict
        assert int(r.kept) == fam[doc_hash[r.docId]], r
        seen_families.add(doc_hash[r.docId])
    assert seen_families == set(fam)


def test_merge_biosample_indices_semantics(spark):
    """Reference merge semantics (dataset/biosample_index.py:36-72)
    made deterministic: scalars take the first non-null by input
    priority (not a partition-order-dependent F.first), arrays take
    the sorted distinct union."""
    from genetics_spark_coloc_spark.operators.ontology import (
        merge_biosample_indices,
    )

    schema = (
        "biosampleId string, biosampleName string, description string, "
        "synonyms array<string>"
    )
    a = spark.createDataFrame(
        [("X", "name-a", None, ["s1", "s2"]), ("Y", "only-a", "da", None)],
        schema,
    )
    b = spark.createDataFrame(
        [("X", "name-b", "desc-b", ["s2", "s3"])], schema
    )
    out = {
        r.biosampleId: r
        for r in merge_biosample_indices([a, b]).collect()
    }
    x = out["X"]
    assert x.biosampleName == "name-a"  # priority 0 wins
    assert x.description == "desc-b"  # first NON-NULL wins
    assert x.synonyms == ["s1", "s2", "s3"]  # sorted distinct union
    y = out["Y"]
    assert (y.biosampleName, y.description) == ("only-a", "da")
    assert y.synonyms == []


def test_cms_sketch_guarantees(spark):
    """Count-Min invariants: estimates never UNDERestimate the true
    count, and for a corpus with far fewer distinct tokens than
    width x depth the heavy hitter's estimate is near-exact."""
    from genetics_spark_coloc_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )
    from genetics_spark_coloc_spark.operators.text import tokens

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common common rare"),
            (F.col("id") % 50).cast("string"),
        ).alias("text"),
    )
    toks = tokens(F.lower(F.col("text")))
    sketch = cms_sketch(docs, toks, depth=4, width=1024)
    true = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("trueCount"))
    )
    est = {
        r.token: r.estCount
        for r in cms_estimate(sketch, true, depth=4, width=1024).collect()
    }
    for r in true.collect():
        assert est[r.token] >= r.trueCount, r
    assert est["common"] == 400  # 2 per doc, 51 distinct tokens, no collisions expected at 4x1024


def test_hll_estimate_accuracy_and_merge(spark):
    """HLL invariants: the estimate lands within ~5x the standard
    error of the true distinct count at b=10, and register tables
    MERGE relationally (union + max == sketch of the union)."""
    from genetics_spark_coloc_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from genetics_spark_coloc_spark.operators.text import tokens

    def corpus(lo, hi):
        return spark.range(lo, hi).select(
            F.lit("en").alias("lang"),
            F.concat(F.lit("tok"), F.col("id").cast("string")).alias("text"),
        )

    full = corpus(0, 5000)
    toks = tokens(F.lower(F.col("text")))
    est = hll_estimate(hll_registers(full, toks, ["lang"], b=10), ["lang"], b=10)
    val = est.collect()[0].estDistinct
    # RSE at m=1024 is ~3.25%; allow 5 sigma
    assert abs(val - 5000) / 5000 < 0.1625, val

    # merge law: registers of two halves, unioned + max-combined,
    # give the same estimate as the full corpus
    r1 = hll_registers(corpus(0, 2500), toks, ["lang"], b=10)
    r2 = hll_registers(corpus(2500, 5000), toks, ["lang"], b=10)
    merged = (
        r1.unionByName(r2)
        .groupBy("lang", "register")
        .agg(F.max("maxRho").alias("maxRho"))
    )
    val2 = hll_estimate(merged, ["lang"], b=10).collect()[0].estDistinct
    assert val2 == val


def test_bloom_filter_no_false_negatives(spark):
    """Bloom invariants: every member passes (no false negatives);
    false positives exist at an undersized m but stay near the
    (1-e^{-kn/m})^k rate; filters merge by UNION."""
    from genetics_spark_coloc_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    others = spark.range(500, 3000).select(F.col("id").alias("k"))
    bloom = bloom_build(members, F.col("k"), m_bits=4096, k=3)
    passed = {
        int(r.key): r.bloomPass
        for r in bloom_probe(
            bloom, members.unionByName(others), F.col("k"), m_bits=4096, k=3
        ).collect()
    }
    assert all(passed[i] for i in range(500))  # no false negatives
    fp = sum(1 for i in range(500, 3000) if passed[i]) / 2500
    # expected rate ~ (1 - e^{-3*500/4096})^3 ~ 2.9%; allow wide band
    assert fp < 0.15, fp

    # merge law: union of two half-filters == filter of the union
    b1 = bloom_build(spark.range(0, 250).select(F.col("id").alias("k")), F.col("k"), 4096, 3)
    b2 = bloom_build(spark.range(250, 500).select(F.col("id").alias("k")), F.col("k"), 4096, 3)
    merged = b1.unionByName(b2).distinct()
    assert sorted(r.pos for r in merged.collect()) == sorted(
        r.pos for r in bloom.collect()
    )


def test_grid_quantile_error_bound(spark):
    """Grid-sketch estimates land within one bin width of the exact
    percentile — the fixed deterministic bound."""
    from genetics_spark_coloc_spark.operators.sketches import (
        grid_quantile_estimate,
        grid_quantile_sketch,
    )

    lo, hi, n_bins = 0.0, 1000.0, 200
    bin_width = (hi - lo) / n_bins
    df = spark.range(10_000).select(
        F.lit("g").alias("g"),
        ((F.col("id") * 37) % 1000).cast("double").alias("v"),
    )
    sketch = grid_quantile_sketch(df, F.col("v"), ["g"], lo, hi, n_bins)
    est = {
        r.q: r.estValue
        for r in grid_quantile_estimate(
            sketch, ["g"], [0.5, 0.9, 0.99], lo, hi, n_bins
        ).collect()
    }
    exact = df.selectExpr(
        "percentile(v, array(0.5, 0.9, 0.99)) as p"
    ).collect()[0].p
    for q, ex in zip([0.5, 0.9, 0.99], exact):
        assert abs(est[q] - ex) <= bin_width + 1e-6, (q, est[q], ex)
