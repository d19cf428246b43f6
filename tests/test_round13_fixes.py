"""Round-13 fixes beyond the cc_labels hardening (see
test_cc_labels_hardening.py): the finemap_grouped per-locus size
guard, the ANN recall-certification mode, the CLI catalog scoping,
and the bench baseline min-merge normalization."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_finemap_grouped_locus_size_guard(spark):
    """VERDICT r12 next #4: one pathological locus materializes a p×p
    LD matrix inside a single Python worker — the harness must fail
    loudly at the documented bound BEFORE the kernel allocates."""
    from genetics_spark_coloc_spark.operators.finemapping import (
        finemap_grouped,
    )

    ss = spark.range(30).select(
        F.lit("locus_huge").alias("studyLocusId"),
        F.concat(F.lit("v"), F.col("id")).alias("variantId"),
        (F.col("id") * 0.01).alias("beta"),
        F.lit(0.1).alias("standardError"),
    )
    with pytest.raises(Exception, match="max_locus_variants"):
        finemap_grouped(ss, max_locus_variants=10).collect()
    # under the bound the same input fits normally
    out = finemap_grouped(ss, max_locus_variants=30)
    assert out.count() == 30


def test_solo_baseline_entries_rescaled_to_prepass_host():
    """ADVICE r12 (bench.py): adjudication solo minima enter the
    baseline min-merge rescaled to the PRE-PASS host state — a host
    that recovered mid-run must not write an overly tight baseline."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import solo_baseline_entries

    flags = {
        # solo measured on a recovered (faster) host: speed-adjusted
        # value is normalized to the stored-baseline host state
        "q1": {"solo_sec": 1.0, "solo_sec_speed_adjusted": 1.2},
        # no speed adjustment recorded -> falls back to raw solo
        "q2": {"solo_sec": 2.0},
        # error verdict -> contributes nothing
        "q3": {"solo_sec": None},
    }
    ok = {"q1": 5.0, "q2": 1.5}
    # pre-pass host ran 1.25x slower than the stored baseline
    got = solo_baseline_entries(flags, ok, speed_ratio=1.25)
    assert got["q1"] == pytest.approx(1.5)  # 1.2 * 1.25, < in-pass 5.0
    assert got["q2"] == pytest.approx(1.5)  # min(in-pass 1.5, 2.0*1.25)
    assert "q3" not in got
    # raw solo (1.0) would have been tighter than the rescaled 1.5 —
    # exactly the over-tight entry the fix prevents
    assert got["q1"] > flags["q1"]["solo_sec"]


def _write(df, tmp_path, name):
    p = str(tmp_path / name)
    df.write.mode("overwrite").parquet(p)
    return p


def test_ivf_certify_detects_planted_drift(spark, tmp_path):
    """VERDICT r12 next #5: the ANN staleness monitor. Build an IVF
    index on a clean two-cluster corpus (certify: recall ~1), append
    a batch that straddles the frozen Voronoi boundary (each vector's
    true neighbours split across two lists, invisible to nprobe=1),
    re-certify: recall drops, the drop is RECORDED in the
    _recall_cert.json ledger inside the index, and a recall_floor
    between the two certifications fails the step loudly."""
    import json
    import os

    from genetics_spark_coloc_spark.steps import run_step

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    # two tight angular clusters around the frozen centroid directions
    # (0.01 steps: cosine gaps survive the kernels' 6dp rounding)
    train = [
        (i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(30)
    ] + [
        (100 + i, [0.01 * i, 1.0, 0.0, 0.0]) for i in range(30)
    ]
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    # drifted batch: TWIN PAIRS straddling the bisector of the two
    # frozen centroids — each pair shares a third coordinate (which
    # carries the neighbour distance) while a tiny ±0.01 second-coord
    # nudge flips the coarse assignment, so every drifted vector's
    # nearest true neighbour sits in the OTHER inverted list —
    # invisible to nprobe=1 by construction (in 1-D a sign split
    # keeps each side contiguous; the z-pairing is what interleaves)
    drift = [
        (
            200 + i,
            [
                1.0,
                1.0 + (0.01 if i % 2 else -0.01),
                0.1 * (1 + i // 2),
                0.0,
            ],
        )
        for i in range(40)
    ]

    corpus_p = _write(vecs(train), tmp_path, "corpus.parquet")
    cents_p = _write(vecs(cents), tmp_path, "cents.parquet")
    out = str(tmp_path / "ivf")
    run_step(
        spark, "ivf_index", {"corpus": corpus_p, "centroids": cents_p}, out
    )
    run_step(
        spark, "ivf_index", {"corpus": corpus_p, "centroids": cents_p}, out,
        params={"mode": "certify", "certify_queries": 40, "certify_k": 5},
    )
    cert_path = os.path.join(out, "_recall_cert.json")
    hist = json.load(open(cert_path))
    assert len(hist) == 1 and hist[0]["passed"]
    clean_recall = hist[0]["recall_at_k"]
    assert clean_recall > 0.95

    # the daily append, with a drifted crawl
    delta_p = _write(vecs(drift), tmp_path, "delta.parquet")
    run_step(
        spark, "ivf_index", {"corpus": delta_p, "centroids": cents_p}, out,
        params={"mode": "append"},
    )
    union_p = _write(vecs(train + drift), tmp_path, "union.parquet")
    run_step(
        spark, "ivf_index", {"corpus": union_p, "centroids": cents_p}, out,
        params={"mode": "certify", "certify_queries": 40, "certify_k": 5},
    )
    hist = json.load(open(cert_path))
    assert len(hist) == 2
    drifted_recall = hist[1]["recall_at_k"]
    assert drifted_recall < clean_recall - 0.05, (
        f"planted drift not detected: {clean_recall} -> {drifted_recall}"
    )
    # a floor between the two certifications gates the pipeline loudly,
    # and the failure message carries the measured remediation: with 2
    # centroids, nprobe=2 is exhaustive, so the hint must name it
    floor = (clean_recall + drifted_recall) / 2
    with pytest.raises(
        ValueError,
        match=r"(?s)recall certification FAILED.*Remediation: nprobe=2",
    ):
        run_step(
            spark, "ivf_index",
            {"corpus": union_p, "centroids": cents_p}, out,
            params={
                "mode": "certify", "certify_queries": 40,
                "certify_k": 5, "recall_floor": floor,
            },
        )
    # the failing certification is still recorded (history = evidence)
    hist = json.load(open(cert_path))
    assert len(hist) == 3 and hist[2]["passed"] is False


def test_ivfpq_certify_records_and_gates(spark, tmp_path):
    """The IVF-PQ twin: certify scores the compressed search against
    exact L2 over the raw corpus, appends to the ledger, and an
    unreachable recall_floor fails loudly."""
    import json
    import os

    from genetics_spark_coloc_spark.operators.pq import codebooks_from_first_k
    from genetics_spark_coloc_spark.steps import run_step

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    corpus = [
        (i, [float(10 * (i % 2)) + 0.01 * i, 0.02 * i, 1.0, 0.0])
        for i in range(40)
    ]
    cents = [(0, [0.0, 0.0, 1.0, 0.0]), (1, [10.0, 0.0, 1.0, 0.0])]
    corpus_p = _write(vecs(corpus), tmp_path, "pq_corpus.parquet")
    cents_p = _write(vecs(cents), tmp_path, "pq_cents.parquet")
    cbs_p = _write(
        codebooks_from_first_k(vecs(corpus), m=2, k=8, dim=4),
        tmp_path,
        "pq_cbs.parquet",
    )
    out = str(tmp_path / "ivfpq")
    ins = {"corpus": corpus_p, "centroids": cents_p, "codebooks": cbs_p}
    run_step(spark, "ivfpq_index", ins, out)
    run_step(
        spark, "ivfpq_index", ins, out,
        params={
            "mode": "certify", "certify_queries": 16,
            "certify_k": 3, "certify_nprobe": 2,
        },
    )
    hist = json.load(open(os.path.join(out, "_recall_cert.json")))
    assert len(hist) == 1 and 0.0 <= hist[0]["recall_at_k"] <= 1.0
    assert hist[0]["n_queries"] == 16
    with pytest.raises(ValueError, match="recall certification FAILED"):
        run_step(
            spark, "ivfpq_index", ins, out,
            params={
                "mode": "certify", "certify_queries": 16,
                "certify_k": 3, "certify_nprobe": 2,
                "recall_floor": 1.01,
            },
        )


def test_exact_l2_topk_ignores_junk_vectors(spark):
    """A null or dimension-mismatched embedding must never rank as a
    nearest neighbour: zip_with pads the shorter array with nulls, the
    fold goes NULL, and ASC ordering sorts nulls FIRST — the junk row
    would beat every real neighbour. Invalid rows are dropped up
    front (+ nulls-last ordering as belt-and-braces)."""
    from genetics_spark_coloc_spark.operators.pq import exact_l2_topk

    rows = [
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [2.0, 0.0]),
        (4, None),          # null embedding
        (5, [9.0]),         # wrong dimension
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = exact_l2_topk(df, df.filter(F.col("vec_id") == 1), k=2).collect()
    assert [(r["neighborId"], r["l2Dist"]) for r in out] == [
        (2, 1.0),
        (3, 4.0),
    ]
    # r14: with k > the valid-neighbour count, the dim-mismatched row
    # used to surface anyway with a NULL l2Dist (nulls-last only hides
    # it while enough valid neighbours exist) — it must be DROPPED
    out = exact_l2_topk(df, df.filter(F.col("vec_id") == 1), k=4).collect()
    assert [(r["neighborId"], r["l2Dist"]) for r in out] == [
        (2, 1.0),
        (3, 4.0),
    ]


def test_blas_topk_twins_match_column_forms(spark):
    """The certify path's BLAS ground-truth kernels must return
    exactly what the oracle-checked column forms return (same 6dp
    rounding, same id tiebreak, self-matches excluded) — on the real
    embeddings table, full tuple equality."""
    from genetics_spark_coloc_spark.operators.pq import (
        exact_l2_topk,
        exact_l2_topk_blas,
    )
    from genetics_spark_coloc_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blas,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    key = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.collect()
    )
    assert key(cosine_topk_blas(emb, queries, k=5)) == key(
        cosine_topk(emb, queries, k=5)
    )
    assert key(exact_l2_topk_blas(emb, queries, k=5)) == key(
        exact_l2_topk(emb, queries, k=5)
    )
    # junk rows never surface from the BLAS kernels either — and the
    # column cosine form excludes zero-norm rows too (0/0 = NaN, and
    # Spark orders NaN above every number: one junk row used to
    # become every query's top-1 under the DESC rank)
    junk = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),
            (2, [1.0, 0.0]),
            (3, None),
            (4, [9.0]),
            (5, [0.0, 0.0]),  # zero norm -> NaN cosine
        ],
        "vec_id long, embedding array<double>",
    )
    for fn in (cosine_topk_blas, cosine_topk):
        got = fn(junk, junk.filter("vec_id = 1"), k=4).collect()
        assert {r["neighborId"] for r in got} == {2}, fn.__name__
    got = exact_l2_topk_blas(junk, junk.filter("vec_id = 1"), k=3).collect()
    assert {r["neighborId"] for r in got} == {2, 5}  # zero-norm fine in L2

    # IVF twin of the cosine fix: a zero-norm member in a probed list
    # must never rank (it used to NaN-sort above every real neighbor)
    from genetics_spark_coloc_spark.operators.similarity import ivf_topk

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = ivf_topk(
        junk.filter("vec_id in (1, 2, 5)"),
        junk.filter("vec_id = 1"),
        cents,
        k=3,
        nprobe=2,
    ).collect()
    assert {r["neighborId"] for r in got} == {2}


def test_topk_recall_counts_silent_queries_as_zero(spark):
    """A query the approximate search returned NOTHING for is recall
    0, not a dropped row — otherwise an index that loses whole queries
    would look perfect on the ones it kept."""
    from genetics_spark_coloc_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q2", "c"), ("q2", "d")],
        "queryId string, neighborId string",
    )
    approx = spark.createDataFrame(
        [("q1", "a"), ("q1", "x")],  # q2 entirely absent
        "queryId string, neighborId string",
    )
    row = topk_recall(approx, exact).collect()[0]
    assert row["nQueries"] == 2
    assert row["avgRecall"] == pytest.approx(0.25)  # (0.5 + 0.0) / 2
    assert row["minRecall"] == 0.0


def test_line_freq_compact_crash_windows_self_heal(spark, tmp_path):
    """The line-frequency table IS the corpus evidence (the original
    crawls are gone), so its in-place compaction gets the same r13
    crash contract as cc_labels: tmp-write → delete → rename, with
    every consumer finishing an interrupted rename. Plant both crash
    windows and assert no state is ever torn."""
    import shutil

    from genetics_spark_coloc_spark.steps import run_step

    docs = spark.createDataFrame(
        [(i, "the same line " + ("x" if i % 2 else "y")) for i in range(20)],
        "doc_id long, text string",
    )
    docs_p = str(tmp_path / "docs.parquet")
    docs.write.parquet(docs_p)
    freq_p = str(tmp_path / "freq.parquet")
    run_step(spark, "line_freq", {"corpus": docs_p}, freq_p, params={"sep": " "})
    run_step(
        spark, "line_freq", {"corpus": docs_p}, freq_p,
        params={"sep": " ", "mode": "append"},
    )
    want = {
        r["segHash"]: r["segCount"]
        for r in spark.read.parquet(freq_p)
        .groupBy("segHash").sum("segCount")
        .withColumnRenamed("sum(segCount)", "segCount").collect()
    }

    # window (b): committed tmp, table deleted (crash between delete
    # and rename) — the next append self-heals before writing
    from pyspark.sql import functions as F

    compacted = (
        spark.read.parquet(freq_p)
        .groupBy("segHash").agg(F.sum("segCount").alias("segCount"))
    )
    tmp = freq_p + "__compacting"
    compacted.write.parquet(tmp)
    shutil.rmtree(freq_p)
    run_step(
        spark, "line_freq", {"corpus": docs_p}, freq_p,
        params={"sep": " ", "mode": "append"},
    )
    got = {
        r["segHash"]: r["segCount"]
        for r in spark.read.parquet(freq_p)
        .groupBy("segHash").sum("segCount")
        .withColumnRenamed("sum(segCount)", "segCount").collect()
    }
    # recovered table + one more shard of the same corpus = 1.5x counts
    assert got == {k: v + v // 2 for k, v in want.items()}
    assert not os.path.exists(tmp)

    # window (a): stale tmp with the table intact (crash before the
    # delete) — compact discards the tmp and completes normally
    compacted2 = (
        spark.read.parquet(freq_p)
        .groupBy("segHash").agg(F.sum("segCount").alias("segCount"))
    )
    compacted2.limit(1).write.parquet(tmp)  # junk tmp (wrong content)
    run_step(
        spark, "line_freq", {"corpus": freq_p}, freq_p,
        params={"mode": "compact"},
    )
    got2 = {
        r["segHash"]: r["segCount"]
        for r in spark.read.parquet(freq_p).collect()
    }
    assert got2 == got  # compacted to one row per hash, counts intact
    assert not os.path.exists(tmp)

    # the scrub CONSUMER also self-heals an interrupted rename: plant
    # window (b) again and read through line_scrub's freq= path
    spark.read.parquet(freq_p).write.parquet(tmp)
    shutil.rmtree(freq_p)
    out = run_step(
        spark, "line_scrub", {"docs": docs_p}, None,
        params={
            "sep": " ", "max_count": 1, "min_segment_chars": 1,
            "freq": freq_p,
        },
        write=False,
    )
    assert out.count() == 20 and os.path.exists(freq_p)


def test_empty_ledger_reseeds_instead_of_undercertifying(spark, tmp_path):
    """A crashed ledger compaction (saveAsTable overwrite = drop +
    rewrite) can leave the counts ledger registered but EMPTY; the
    next append must NOT total touched buckets against that empty
    history (it would certify a too-low max and let a cross-append
    hot bucket slip past the ceiling) — it reseeds via the full
    recompute branch, exactly like a pre-sidecar index."""
    from genetics_spark_coloc_spark.session import write_bucketed
    from genetics_spark_coloc_spark.steps import run_step

    shared = "the quick brown fox jumps over the lazy dog again and again"

    def batch(start_id):
        rows = [(start_id + i, shared) for i in range(3)]
        rows += [
            (
                start_id + 3 + i,
                " ".join(
                    f"w{start_id}x{i}t{j}v{(i * 7 + j * 13) % 97}"
                    for j in range(30)
                ),
            )
            for i in range(10)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    p0, p1 = str(tmp_path / "b0.parquet"), str(tmp_path / "b1.parquet")
    batch(0).write.parquet(p0)
    batch(100).write.parquet(p1)
    tbl = "band_index_empty_ledger"
    bp = {"num_perm": 16, "band_size": 4}
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}_bucket_counts")
    try:
        run_step(spark, "lsh_band_index", {"corpus": p0}, tbl,
                 params={"num_buckets": 4, **bp})
        # planted crash outcome: ledger exists but holds zero rows
        # (checkpoint severs the self-read before the overwrite)
        write_bucketed(
            spark.table(f"{tbl}_bucket_counts")
            .limit(0)
            .localCheckpoint(eager=True),
            f"{tbl}_bucket_counts",
            ["bandIdx", "bandHash"],
            num_buckets=16,
        )
        run_step(spark, "lsh_band_index", {"corpus": p1}, tbl,
                 params={"mode": "append", **bp})
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect()
        }
        certified = int(props["genetics_spark_coloc.max_bucket_count"])
        direct = (
            spark.table(tbl)
            .groupBy("bandIdx", "bandHash")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert certified == direct == 6, (
            f"empty ledger under-certified: {certified} vs true {direct}"
        )
        # and the reseed left the ledger consistent again
        ledger_max = (
            spark.table(f"{tbl}_bucket_counts")
            .groupBy("bandIdx", "bandHash")
            .agg(F.sum("c").alias("t"))
            .agg(F.max("t"))
            .collect()[0][0]
        )
        assert int(ledger_max) == 6
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_bucket_counts")


def test_cli_catalog_scoped_to_catalog_steps(tmp_path):
    """ADVICE r12 (__main__.py): a non-catalog CLI step must not open
    the Derby metastore — no metastore_db/ or derby.log side effects
    in cwd, so concurrent non-catalog runs cannot collide on Derby's
    single-process lock. (Catalog steps — lsh_band_index,
    bucket_layout, lsh_pairs with index= — still opt in via
    StepSpec.needs_catalog; the README quickstart test covers them.)"""
    import os
    import subprocess

    corpus = "/root/testdata/sf0.001/documents.parquet"
    r = subprocess.run(
        [
            "python", "-m", "genetics_spark_coloc_spark", "run",
            "corpus_overlap",
            "--in", f"left={corpus}", "--in", f"right={corpus}",
            "--out", str(tmp_path / "overlap.parquet"),
            "--param", "k=32",
            "--master", "local[2]", "--shuffle-partitions", "2",
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    leftovers = {
        n for n in os.listdir(tmp_path)
        if n in ("metastore_db", "derby.log")
    }
    assert not leftovers, f"non-catalog step leaked {leftovers} into cwd"
