"""The LLM-curation lifecycle as a living end-to-end test (VERDICT
r10 task #3) — the corpus-side twin of tests/test_lifecycle_e2e.py:

    raw documents → quality filter → exact dedup → persisted-band-
    index near-dup (via the REAL `lsh_band_index` step + certified
    guard-free incremental join) → exact-hash decontamination against
    an eval set (with a KMV overlap gate as the monitoring estimate)
    → C4 boilerplate scrub through the PERSISTED line-frequency table
    → token-budget allocation → pack_sequences

all in ONE Spark session at sf0.001, with every stage asserted
against a CLOSED-FORM DuckDB oracle over the SAME constructed parquet
inputs. Window prefix sums and band CTEs only — no recursive CTE
(MEMORY.md records DuckDB list-state recursion mis-executing under
threads).

Why the planted near-dups are caught DETERMINISTICALLY (no LSH luck):
char_shingles enumerates 8-char windows at stride 4 from position 0,
capped at 64 shingles; the near-dups append a marker to source docs
with >= 300 chars, i.e. past the 8 + 63*4 = 260-char cap, so their
shingle sets — hence minhash signatures, hence ALL band hashes — are
bit-identical to their sources and every band matches. The oracle
still replicates the banding exactly, so the equality assertion is
engine-vs-engine, not merely by-construction.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
QUALITY_MIN_TOKENS = 5
SEQ_LEN = 128
BUDGET = 1_000_000
SCRUB_MAX_COUNT = 40

# DuckDB token count identical to operators.text.tokens/token_count
_TOKS = (
    "CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)

# char_shingles(k=8, stride=4, cap=64) + 8-perm/2-band MinHash-LSH,
# identical to the committed delta_lsh_pairs oracle pattern
_BANDS_SQL = f"""
sh AS (
  SELECT DISTINCT doc_id AS docId, isDelta,
         substr(lower(text), CAST(i AS INT) * 4 + 1, 8) AS shingle
  FROM pool CROSS JOIN range(0, 64) AS t(i)
  WHERE CAST(i AS INT) < CAST(FLOOR(LEAST(GREATEST(
          (length(lower(text)) - 8) / 4 + 1, 1), 64)) AS INT)
),
hashed AS (
  SELECT docId, isDelta, CAST(p AS INT) AS perm,
         substr(md5(shingle), CAST(p AS INT) * 3 + 1, 8) AS h
  FROM sh, range(0, 8) AS pt(p)
),
sig AS (
  SELECT docId, isDelta, perm, MIN(h) AS minHash
  FROM hashed GROUP BY docId, isDelta, perm
),
bands AS (
  SELECT docId, isDelta, CAST(FLOOR(perm / 2) AS INT) AS bandIdx,
         md5(string_agg(minHash, '|' ORDER BY minHash)) AS bandHash
  FROM sig GROUP BY docId, isDelta, CAST(FLOOR(perm / 2) AS INT)
)
"""


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    """Construct the planted corpus, run the WHOLE Spark pipeline
    once, register the same inputs in DuckDB; stage tests assert
    engine-vs-engine equality on the shared state."""
    from genetics_spark_coloc_spark.operators.dedup import (
        exact_dedup,
        incremental_lsh_candidates,
        load_lsh_band_index,
    )
    from genetics_spark_coloc_spark.operators.sketches import (
        kmv_overlap_estimate,
        kmv_sketch,
    )
    from genetics_spark_coloc_spark.operators.text import (
        pack_sequences,
        token_budget_allocation,
        token_count,
    )
    from genetics_spark_coloc_spark.steps import run_step

    tmp = tmp_path_factory.mktemp("corpus_lifecycle")
    base = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "source"
    )

    # --- planted construction (all offsets deterministic) ----------
    # near-dup sources: the 10 smallest ids with >= 300 chars (past
    # the shingle cap — see module docstring)
    long_ids = [
        r["doc_id"]
        for r in base.filter(F.length("text") >= 300)
        .orderBy("doc_id")
        .limit(10)
        .collect()
    ]
    assert len(long_ids) == 10, "sf0.001 lost its long documents?"
    # eval-set sources: 5 quality-passing docs NOT among the near-dup
    # sources (planted contamination — they stay in train too)
    eval_ids = [
        r["doc_id"]
        for r in base.filter(
            (token_count(F.col("text")) >= QUALITY_MIN_TOKENS)
            & ~F.col("doc_id").isin(long_ids)
        )
        .orderBy("doc_id")
        .limit(5)
        .collect()
    ]
    assert len(eval_ids) == 5

    junk = spark.createDataFrame(
        [(10_000 + i, "x y", "crawl") for i in range(10)]
        + [(10_100 + i, "", "crawl") for i in range(5)],
        "doc_id long, text string, source string",
    )  # fails the quality gate (< 5 tokens)
    exact_copies = (
        base.filter(F.col("doc_id") < 15)
        .select(
            (F.col("doc_id") + 20_000).alias("doc_id"), "text", "source"
        )
    )  # exact dups of ids 0-14: dedup keeps the smaller id
    day0 = base.unionByName(junk).unionByName(exact_copies)

    near_dups = (
        base.filter(F.col("doc_id").isin(long_ids))
        .select(
            (F.col("doc_id") + 30_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq marker appended")).alias(
                "text"
            ),
            "source",
        )
    )
    fresh = spark.createDataFrame(
        [
            (
                31_000 + i,
                " ".join(f"freshtok{i}x{j}q{(i * 11 + j) % 89}" for j in range(40)),
                "crawl",
            )
            for i in range(10)
        ],
        "doc_id long, text string, source string",
    )
    delta = near_dups.unionByName(fresh)
    eval_docs = base.filter(F.col("doc_id").isin(eval_ids)).select(
        (F.col("doc_id") + 40_000).alias("doc_id"), "text"
    )

    paths = {}
    for name, df in [("day0", day0), ("delta", delta), ("evalset", eval_docs)]:
        p = str(tmp / f"{name}.parquet")
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    day0 = spark.read.parquet(paths["day0"])
    delta = spark.read.parquet(paths["delta"])
    eval_docs = spark.read.parquet(paths["evalset"])

    # --- THE PIPELINE (one session, every stage the real operator) -
    # 1. quality gate
    day0_q = day0.filter(token_count(F.col("text")) >= QUALITY_MIN_TOKENS)
    delta_q = delta.filter(token_count(F.col("text")) >= QUALITY_MIN_TOKENS)
    # 2. exact dedup (keep smallest id per content hash)
    keepers = exact_dedup(day0_q, "text", "doc_id")
    day0_kept = day0_q.join(
        keepers.select(F.col("keeperId").alias("doc_id")), "doc_id", "left_semi"
    )
    # 3. near-dup of the delta against the PERSISTED band index
    day0_kept_path = str(tmp / "day0_kept.parquet")
    day0_kept.write.mode("overwrite").parquet(day0_kept_path)
    day0_kept = spark.read.parquet(day0_kept_path)
    tbl = "corpus_lifecycle_band_idx"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}_bucket_counts")
    run_step(
        spark,
        "lsh_band_index",
        {"corpus": day0_kept_path},
        tbl,
        params={"num_buckets": 8},
    )
    index_bands = load_lsh_band_index(spark, tbl, hot_bucket_ceiling=10_000)
    cand = incremental_lsh_candidates(
        delta_q, index_bands=index_bands, index_guard=False
    )
    flagged = cand.select(F.col("deltaId").alias("doc_id")).distinct()
    delta_kept = delta_q.join(flagged, "doc_id", "left_anti")
    train = day0_kept.unionByName(delta_kept)
    # 4. decontamination: exact-hash anti-join vs the eval set, with
    #    the KMV overlap estimate as the before/after monitoring gate
    eval_hashes = eval_docs.select(F.md5("text").alias("h")).distinct()
    # the KMV gate sketches DOCUMENT fingerprints (md5(text)), the
    # decontamination granularity — token-level KMV barely moves when
    # a handful of docs leave a corpus sharing their vocabulary
    doc_fp = F.array(F.md5(F.col("text")))
    eval_sketch = kmv_sketch(eval_docs, doc_fp, [], k=256)
    pre_kmv = kmv_overlap_estimate(
        kmv_sketch(train, doc_fp, [], k=256), eval_sketch, k=256
    ).collect()[0]
    final = train.join(
        eval_hashes, F.md5(train["text"]) == eval_hashes["h"], "left_anti"
    )
    post_kmv = kmv_overlap_estimate(
        kmv_sketch(final, doc_fp, [], k=256), eval_sketch, k=256
    ).collect()[0]
    final_path = str(tmp / "final.parquet")
    final.write.mode("overwrite").parquet(final_path)
    final = spark.read.parquet(final_path)
    # 5. boilerplate scrub (C4 line dedup at token granularity — the
    #    testdata has no newlines) through the PERSISTED frequency
    #    table, i.e. the incremental production path: build the
    #    corpus evidence once, scrub against the at-rest artifact
    from genetics_spark_coloc_spark.operators.text import (  # noqa: PLC0415
        line_dedup,
        line_frequency_table,
    )

    freq_path = str(tmp / "line_freq.parquet")
    line_frequency_table(final, "text", sep=" ").write.mode(
        "overwrite"
    ).parquet(freq_path)
    scrub = line_dedup(
        final, "text", "doc_id", sep=" ", max_count=SCRUB_MAX_COUNT,
        min_segment_chars=1, freq_table=spark.read.parquet(freq_path),
    )
    scrubbed = scrub.select(
        F.col("docId").alias("doc_id"), F.col("cleanText").alias("text")
    ).join(final.select("doc_id", "source"), "doc_id")
    # 6. token budget  7. packing — both consume the SCRUBBED text
    budget = token_budget_allocation(
        scrubbed, BUDGET, temperature=2.0, source_col="source"
    )
    packed = pack_sequences(scrubbed, seq_len=SEQ_LEN)

    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    # shared oracle stage chain (quality → dedup → train-side pool)
    con.execute(
        f"""
        CREATE VIEW o_day0_q AS SELECT * FROM day0 WHERE {_TOKS} >= {QUALITY_MIN_TOKENS};
        CREATE VIEW o_delta_q AS SELECT * FROM delta WHERE {_TOKS} >= {QUALITY_MIN_TOKENS};
        CREATE VIEW o_day0_kept AS
          SELECT * FROM o_day0_q
          WHERE doc_id IN (SELECT MIN(doc_id) FROM o_day0_q GROUP BY md5(text));
        """
    )
    con.execute(
        f"""
        CREATE VIEW o_flagged AS
        WITH pool AS (
          SELECT doc_id, text, FALSE AS isDelta FROM o_day0_kept
          UNION ALL
          SELECT doc_id, text, TRUE AS isDelta FROM o_delta_q
        ),
        {_BANDS_SQL.strip()}
        SELECT DISTINCT d.docId AS doc_id
        FROM bands d JOIN bands i
          ON d.bandIdx = i.bandIdx AND d.bandHash = i.bandHash
        WHERE d.isDelta AND NOT i.isDelta
        """
    )
    con.execute(
        """
        CREATE VIEW o_train AS
          SELECT * FROM o_day0_kept
          UNION ALL
          SELECT * FROM o_delta_q
          WHERE doc_id NOT IN (SELECT doc_id FROM o_flagged);
        CREATE VIEW o_final AS
          SELECT * FROM o_train
          WHERE md5(text) NOT IN (SELECT md5(text) FROM evalset);
        """
    )
    con.execute(
        f"""
        CREATE VIEW o_scrubbed AS
        WITH segs AS (
          SELECT doc_id, source, CAST(i AS INT) AS pos,
                 parts[CAST(i AS INT) + 1] AS seg
          FROM (
            SELECT doc_id, source,
                   string_split(COALESCE(text, ''), ' ') AS parts,
                   unnest(range(len(string_split(COALESCE(text, ''), ' ')))) AS i
            FROM o_final
          )
        ),
        freq AS (
          SELECT md5(trim(seg)) AS h, COUNT(*) AS c FROM segs GROUP BY 1
        ),
        marked AS (
          SELECT s.doc_id, s.source, s.pos, s.seg,
                 (f.c > {SCRUB_MAX_COUNT} AND length(trim(s.seg)) >= 1) AS dropped
          FROM segs s JOIN freq f ON f.h = md5(trim(s.seg))
        )
        SELECT doc_id, source,
               COALESCE(string_agg(seg, ' ' ORDER BY pos)
                        FILTER (WHERE NOT dropped), '') AS text
        FROM marked GROUP BY doc_id, source
        """
    )
    try:
        yield {
            "spark": spark,
            "con": con,
            "long_ids": long_ids,
            "eval_ids": eval_ids,
            "day0_q": day0_q,
            "day0_kept": day0_kept,
            "flagged": flagged,
            "delta_kept": delta_kept,
            "train": train,
            "final": final,
            "scrubbed": scrubbed,
            "budget": budget,
            "packed": packed,
            "pre_kmv": pre_kmv,
            "post_kmv": post_kmv,
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_bucket_counts")


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).collect()}


def _oracle_ids(con, view):
    return {r[0] for r in con.execute(f"SELECT doc_id FROM {view}").fetchall()}


class TestCorpusLifecycle:
    def test_quality_gate(self, lifecycle):
        got = _ids(lifecycle["day0_q"])
        want = _oracle_ids(lifecycle["con"], "o_day0_q")
        assert got == want
        # the planted junk is gone; the planted dups/base survive
        assert not any(10_000 <= i < 10_200 for i in got)
        assert {20_000 + i for i in range(15)} <= got

    def test_exact_dedup(self, lifecycle):
        got = _ids(lifecycle["day0_kept"])
        want = _oracle_ids(lifecycle["con"], "o_day0_kept")
        assert got == want
        # copies lost to their smaller-id originals
        assert not any(20_000 <= i < 20_015 for i in got)
        assert set(range(15)) <= got

    def test_persisted_index_near_dup(self, lifecycle):
        got = _ids(lifecycle["flagged"])
        want = _oracle_ids(lifecycle["con"], "o_flagged")
        assert got == want
        # every planted near-dup caught (deterministic: identical
        # shingle sets past the cap), no fresh doc falsely flagged
        assert {i + 30_000 for i in lifecycle["long_ids"]} <= got
        assert not any(31_000 <= i < 31_010 for i in got)

    def test_decontamination(self, lifecycle):
        got = _ids(lifecycle["final"])
        want = _oracle_ids(lifecycle["con"], "o_final")
        assert got == want
        # the planted contamination left the corpus...
        assert not (set(lifecycle["eval_ids"]) & got)
        # ...and the KMV monitoring gate saw it: the doc-fingerprint
        # overlap estimate is positive while the contamination is in
        # (5 shared hashes) and exactly zero once removed (the pools
        # here are < k, so the sketch estimate is EXACT)
        assert lifecycle["pre_kmv"]["estJaccard"] > 0
        assert lifecycle["post_kmv"]["estJaccard"] == 0.0

    def test_line_scrub(self, lifecycle):
        con = lifecycle["con"]
        got = {
            (r["doc_id"], r["source"]): r["text"]
            for r in lifecycle["scrubbed"].collect()
        }
        want = {
            (r[0], r[1]): r[2]
            for r in con.execute(
                "SELECT doc_id, source, text FROM o_scrubbed"
            ).fetchall()
        }
        assert got == want
        # the scrub never drops DOCUMENTS, only lines: id conservation
        assert {k[0] for k in got} == _oracle_ids(con, "o_final")
        # and it actually bit: common tokens occur > SCRUB_MAX_COUNT
        # times across the ~500-doc final corpus
        n_shorter = con.execute(
            f"""
            SELECT COUNT(*) FROM o_scrubbed s JOIN o_final f USING (doc_id)
            WHERE length(s.text) < length(f.text)
            """
        ).fetchone()[0]
        assert n_shorter > 0

    def test_token_budget(self, lifecycle):
        con = lifecycle["con"]
        oracle = {
            r[0]: r[1:]
            for r in con.execute(
                f"""
                WITH cnt AS (
                  SELECT source, CAST(SUM({_TOKS}) AS BIGINT) AS availableTokens
                  FROM o_scrubbed GROUP BY source
                ),
                p AS (SELECT source, availableTokens,
                             CAST(ROUND(POWER(availableTokens, 0.5), 6)
                                  AS DECIMAL(28,6)) AS pw FROM cnt),
                tot AS (SELECT SUM(pw) AS t FROM p)
                SELECT source, availableTokens,
                       ROUND(CAST(pw AS DOUBLE) / CAST(t AS DOUBLE), 6) AS w,
                       CAST(ROUND(CAST(pw AS DOUBLE) / CAST(t AS DOUBLE)
                            * {BUDGET}.0) AS BIGINT) AS tgt
                FROM p, tot
                """
            ).fetchall()
        }
        got = {
            r["source"]: (
                r["availableTokens"],
                float(r["targetWeight"]),
                r["targetTokens"],
            )
            for r in lifecycle["budget"].collect()
        }
        assert got == oracle
        assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-4

    def test_pack_sequences(self, lifecycle):
        con = lifecycle["con"]
        oracle = {
            r[0]: r[1:]
            for r in con.execute(
                f"""
                WITH toks AS (
                  SELECT doc_id AS docId, CAST({_TOKS} AS BIGINT) AS nTokens
                  FROM o_scrubbed
                ),
                laid AS (
                  SELECT docId, nTokens,
                         COALESCE(SUM(nTokens) OVER (ORDER BY docId
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS startTok
                  FROM toks
                )
                SELECT docId, nTokens,
                       CAST(FLOOR(startTok / {SEQ_LEN}.0) AS BIGINT),
                       CAST(startTok % {SEQ_LEN} AS BIGINT),
                       FLOOR(startTok / {SEQ_LEN}.0) <> FLOOR(
                         (startTok + GREATEST(nTokens - 1, 0)) / {SEQ_LEN}.0)
                FROM laid
                """
            ).fetchall()
        }
        got = {
            r["docId"]: (
                r["nTokens"],
                r["seqId"],
                r["offsetInSeq"],
                r["spansBoundary"],
            )
            for r in lifecycle["packed"].collect()
        }
        assert got == oracle
        # lifecycle conservation: every final doc packed exactly once
        assert set(got) == _oracle_ids(con, "o_final")
