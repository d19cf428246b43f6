"""Contract queries: fine-mapping, simhash, L2G features, multimodal
plan, z-score harmonisation.

Parity rules as in queries.py. ``finemap_susie`` has no oracle
(iterative kernel, not SQL-expressible) — the driver records the
weaker rows-only check for it by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.pvalue import zscore_from_pvalue
from genetics_spark_coloc_spark.operators import finemapping, l2g
from genetics_spark_coloc_spark.operators.multimodal import frame_sample_plan
from genetics_spark_coloc_spark.queries import SUMSTATS_SQL, TAGS_SQL, _sumstats, _tags
from genetics_spark_coloc_spark.sources.tables import load_table


# ------------------------------------------------------------------ finemap
def q_finemap_abf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wakefield-ABF single-causal fine-mapping (distributed, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    ss = ev.select(
        F.concat(F.lit("F"), (F.col("user_id") % 20).cast("string")).alias("studyLocusId"),
        F.concat(F.lit("v"), F.col("event_id").cast("string")).alias("variantId"),
        ((F.col("value") - 50.0) / 10.0).alias("beta"),
        (0.02 + (F.col("event_id") % 10) / 100.0).alias("standardError"),
    )
    out = finemapping.finemap_abf(ss)
    return out.select(
        "studyLocusId",
        "variantId",
        F.round("logABF", 6).alias("logABF"),
        F.round("posteriorProbability", 6).alias("posteriorProbability"),
    )


SQL_FINEMAP_ABF = """
WITH ss AS (
  SELECT 'F' || CAST(user_id % 20 AS VARCHAR) AS studyLocusId,
         'v' || CAST(event_id AS VARCHAR)     AS variantId,
         (value - 50.0) / 10.0                AS beta,
         0.02 + (event_id % 10) / 100.0       AS standardError
  FROM events
),
abf AS (
  SELECT *,
         0.5 * LN(1 - 0.0225 / (0.0225 + standardError * standardError))
         + (beta / standardError) * (beta / standardError)
           * (0.0225 / (0.0225 + standardError * standardError)) / 2 AS logABF
  FROM ss
),
shifted AS (
  SELECT *, MAX(logABF) OVER (PARTITION BY studyLocusId) AS mx FROM abf
)
SELECT studyLocusId, variantId,
       ROUND(logABF, 6) AS logABF,
       ROUND(EXP(logABF - mx) / SUM(EXP(logABF - mx)) OVER (PARTITION BY studyLocusId), 6)
         AS posteriorProbability
FROM shifted
"""


def q_finemap_susie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SuSiE-inf (operators/susie.py) in its deterministic reduced
    configuration — identity LD, L=1, fixed hyperparameters — run
    through the real applyInPandas harness. In this configuration the
    model collapses to a closed form the DuckDB oracle replicates
    exactly, turning the previous rows-only check into a full
    rows+schema+hash gate on the genuine susie_inf code path."""
    ev = load_table(spark, sf_dir, "events")
    ss = ev.select(
        F.concat(F.lit("F"), (F.col("user_id") % 20).cast("string")).alias("studyLocusId"),
        F.concat(F.lit("v"), F.col("event_id").cast("string")).alias("variantId"),
        ((F.col("value") - 50.0) / 10.0).alias("beta"),
        (0.02 + (F.col("event_id") % 10) / 100.0).alias("standardError"),
    )
    out = finemapping.finemap_grouped(ss, kernel=finemapping.susie_reduced_kernel)
    return out.select(
        "studyLocusId",
        "variantId",
        F.round("posteriorProbability", 6).alias("posteriorProbability"),
        "credibleSetIndex",
        F.round("logBF", 6).alias("logBF"),
    )


SQL_FINEMAP_SUSIE = """
WITH ss AS (
  SELECT 'F' || CAST(user_id % 20 AS VARCHAR) AS studyLocusId,
         'v' || CAST(event_id AS VARCHAR)     AS variantId,
         (value - 50.0) / 10.0                AS beta,
         0.02 + (event_id % 10) / 100.0       AS standardError
  FROM events
),
lbf AS (
  -- susie-inf reduced closed form: omega = n + 1/ssq with n=100000,
  -- ssq=0.2; lbf = n z^2 / (2 omega) - 0.5 ln(omega ssq)
  SELECT studyLocusId, variantId,
         100000.0 * (beta/standardError) * (beta/standardError) / (2.0 * 100005.0)
           - 0.5 * LN(100005.0 * 0.2) AS logBF
  FROM ss
),
shifted AS (
  SELECT *, MAX(logBF) OVER (PARTITION BY studyLocusId) AS mxLbf FROM lbf
),
pip AS (
  SELECT *,
         EXP(logBF - mxLbf)
           / SUM(EXP(logBF - mxLbf)) OVER (PARTITION BY studyLocusId)
           AS posteriorProbability
  FROM shifted
),
cum AS (
  SELECT *,
         COALESCE(SUM(posteriorProbability) OVER (
           PARTITION BY studyLocusId
           ORDER BY ROUND(posteriorProbability, 6) DESC, variantId
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumBefore
  FROM pip
)
SELECT studyLocusId, variantId,
       ROUND(posteriorProbability, 6) AS posteriorProbability,
       CASE WHEN cumBefore < 0.99 THEN 1 ELSE 0 END AS credibleSetIndex,
       ROUND(logBF, 6) AS logBF
FROM cum
"""


def q_finemap_susie_inf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LD-aware SuSiE-inf per locus through the FULL kernel code path
    — position column → exp-decay LD build → eigendecomposition →
    V-basis susie_inf fit → purity-filtered credible-set extraction
    (operators/finemapping.py ``susie_inf_ld_oracle_kernel``) — in
    its deterministic oracle configuration: positions spaced 4e11
    apart so every off-diagonal LD entry underflows to exactly 0 and
    the model collapses to the closed form the DuckDB oracle
    replicates (see the kernel docstring). Hundreds of loci ×
    hundreds of variants, one eigh + fit per Arrow batch, scheduled
    across executors by groupBy(studyLocusId). The full
    exponential-decay-LD L=10 method-of-moments configuration stays
    pinned by golden pytest parity (tests/test_finemap_golden.py)."""
    ev = load_table(spark, sf_dir, "events")
    ss = (
        ev.select(
            F.concat(F.lit("L"), (F.col("event_id") % 400).cast("string")).alias(
                "studyLocusId"
            ),
            F.concat(F.lit("v"), F.col("event_id").cast("string")).alias("variantId"),
            (F.col("event_id") * F.lit(1_000_000_000)).cast("double").alias("position"),
            ((F.col("value") - 50.0) / 25.0).alias("beta"),
            (0.5 + (F.col("event_id") % 10) / 10.0).alias("standardError"),
        )
    )
    out = finemapping.finemap_grouped(
        ss, kernel=finemapping.susie_inf_ld_oracle_kernel
    )
    return out.select(
        "studyLocusId",
        "variantId",
        F.round("posteriorProbability", 6).alias("posteriorProbability"),
        "credibleSetIndex",
        F.round("logBF", 6).alias("logBF"),
    )


SQL_FINEMAP_SUSIE_INF = """
WITH ss AS (
  SELECT 'L' || CAST(event_id % 400 AS VARCHAR) AS studyLocusId,
         'v' || CAST(event_id AS VARCHAR)       AS variantId,
         ((value - 50.0) / 25.0) / (0.5 + (event_id % 10) / 10.0) AS z
  FROM events
),
-- susie-inf fixed-hyperparameter closed form with identity LD built
-- through the exp-decay machinery: omega = n + 1/ssq (n=100000,
-- ssq=0.2); lbf = n z^2 / (2 omega) - 0.5 ln(omega ssq)
lbf AS (
  SELECT studyLocusId, variantId,
         100000.0 * z * z / (2.0 * 100005.0)
           - 0.5 * LN(100005.0 * 0.2) AS logBF
  FROM ss
),
shifted AS (
  SELECT *, MAX(logBF) OVER (PARTITION BY studyLocusId) AS mx FROM lbf
),
pip AS (
  SELECT *,
         EXP(logBF - mx) / SUM(EXP(logBF - mx))
           OVER (PARTITION BY studyLocusId) AS pip
  FROM shifted
)
-- identity LD: a multi-member 99% credible set has min |r| = 0 and
-- fails the 0.5 purity gate, so only a single dominant variant
-- (PIP >= 0.99) survives as credible-set 1
SELECT studyLocusId, variantId,
       ROUND(pip, 6) AS posteriorProbability,
       CASE WHEN pip >= 0.99 THEN 1 ELSE 0 END AS credibleSetIndex,
       ROUND(logBF, 6) AS logBF
FROM pip
"""


def q_finemap_carma_ld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CARMA spike-slab search (operators/carma.py:
    ``carma_spike_slab`` — seed enumeration, batched slogdet/solve
    model scoring, greedy stepwise walk, pair outlier screen) in its
    oracle-able diagonal-LD configuration: no ``position`` column →
    identity LD, and ≤3 variants per locus so the seeded powerset IS
    the visited model space. Identity LD factorises every model
    score into per-variant singleton lbfs, so the PIP sum over the
    powerset has a closed form the DuckDB oracle replicates exactly
    — turning the previous rows-only check into a full hash gate on
    the genuine CARMA search path. (The full exponential-decay-LD
    configuration stays pinned by golden pytest parity on the
    reference's own locus — tests/test_finemap_golden.py.)"""
    ev = load_table(spark, sf_dir, "events")
    ss = (
        ev.select(
            F.concat(F.lit("M"), (F.col("event_id") % 400).cast("string")).alias(
                "studyLocusId"
            ),
            F.concat(
                F.lit("v"), ((F.col("event_id") / 400).cast("long") % 3).cast("string")
            ).alias("variantId"),
            ((F.col("value") - 50.0) / 25.0).alias("beta"),
            # se floor 0.2 keeps |z| <= ~10 so the scaled powerset
            # algebra stays well inside double range on both engines
            (0.2 + (F.col("event_id") % 10) / 50.0).alias("standardError"),
        )
        .groupBy("studyLocusId", "variantId")
        .agg(F.max("beta").alias("beta"), F.max("standardError").alias("standardError"))
    )
    out = finemapping.finemap_grouped(ss, kernel=finemapping.carma_ld_kernel)
    return out.select(
        "studyLocusId",
        "variantId",
        F.round("posteriorProbability", 6).alias("posteriorProbability"),
        "credibleSetIndex",
        F.round("logBF", 6).alias("logBF"),
    )


SQL_FINEMAP_CARMA_LD = """
WITH raw AS (
  SELECT 'M' || CAST(event_id % 400 AS VARCHAR)        AS studyLocusId,
         'v' || CAST((event_id // 400) % 3 AS VARCHAR) AS variantId,
         (value - 50.0) / 25.0                         AS beta,
         0.2 + (event_id % 10) / 50.0                  AS standardError
  FROM events
),
ss AS (
  SELECT studyLocusId, variantId,
         MAX(beta) AS beta, MAX(standardError) AS standardError
  FROM raw GROUP BY 1, 2
),
-- identity-LD singleton score: ½lnτ − ½ln(1+τ) + z²/(2(1+τ)), τ=0.04
ab AS (
  SELECT studyLocusId, variantId,
         0.5 * LN(0.04) - 0.5 * LN(1.04)
         + (beta / standardError) * (beta / standardError) / (2.0 * 1.04) AS A
  FROM ss
),
st AS (
  SELECT *, CAST(COUNT(*) OVER (PARTITION BY studyLocusId) AS DOUBLE) AS p
  FROM ab
),
-- p <= 3 by construction, so the visited model space is the full
-- powerset: enumerate it explicitly (identity LD makes every model
-- score the sum of its singleton scores plus the spike-slab prior
-- lgamma(p−k+1) − lgamma(p+1)); explicit enumeration avoids the
-- catastrophic cancellation a sum-of-exponentials factorisation
-- hits when the A spread exceeds double precision
models AS (
  SELECT studyLocusId, CAST(NULL AS VARCHAR) AS v1, CAST(NULL AS VARCHAR) AS v2,
         CAST(NULL AS VARCHAR) AS v3, 0.0 AS score
  FROM (SELECT DISTINCT studyLocusId FROM st)
  UNION ALL
  SELECT studyLocusId, variantId, NULL, NULL,
         A + LGAMMA(p) - LGAMMA(p + 1)
  FROM st
  UNION ALL
  SELECT a.studyLocusId, a.variantId, b.variantId, NULL,
         a.A + b.A + LGAMMA(a.p - 1) - LGAMMA(a.p + 1)
  FROM st a JOIN st b
    ON a.studyLocusId = b.studyLocusId AND a.variantId < b.variantId
  UNION ALL
  SELECT a.studyLocusId, a.variantId, b.variantId, c.variantId,
         a.A + b.A + c.A + LGAMMA(a.p - 2) - LGAMMA(a.p + 1)
  FROM st a
  JOIN st b ON a.studyLocusId = b.studyLocusId AND a.variantId < b.variantId
  JOIN st c ON b.studyLocusId = c.studyLocusId AND b.variantId < c.variantId
),
we AS (
  SELECT *, EXP(score - MAX(score) OVER (PARTITION BY studyLocusId)) AS w
  FROM models
),
pipn AS (
  SELECT s.studyLocusId, s.variantId, MIN(s.A) AS A,
         COALESCE(SUM(CASE WHEN s.variantId IN (e.v1, e.v2, e.v3)
                           THEN e.w END), 0.0) AS num,
         SUM(e.w) AS total
  FROM st s JOIN we e ON s.studyLocusId = e.studyLocusId
  GROUP BY 1, 2
)
SELECT studyLocusId, variantId,
       ROUND(num / total, 6) AS posteriorProbability,
       CAST(ROW_NUMBER() OVER (PARTITION BY studyLocusId
                               ORDER BY ROUND(num / total, 6) DESC, variantId) AS INT)
         AS credibleSetIndex,
       ROUND(A, 6) AS logBF
FROM pipn
"""


def q_finemap_carma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CARMA-style truncated model-space search per locus via
    applyInPandas (combinatorial enumeration — not SQL-expressible;
    rows-only check). Loci are sized (~100 variants) so pairwise
    enumeration is exact."""
    from genetics_spark_coloc_spark.operators.finemapping import carma_kernel

    ev = load_table(spark, sf_dir, "events")
    ss = (
        ev.select(
            F.concat(F.lit("C"), (F.col("event_id") % 100).cast("string")).alias(
                "studyLocusId"
            ),
            F.concat(F.lit("v"), (F.col("user_id") % 100).cast("string")).alias(
                "variantId"
            ),
            ((F.col("value") - 50.0) / 10.0).alias("beta"),
            # se floor 0.2 keeps |z| <= ~25 so the O(n) pair-mass
            # algebra stays inside double range on both engines
            (0.2 + (F.col("event_id") % 10) / 50.0).alias("standardError"),
        )
        .groupBy("studyLocusId", "variantId")
        .agg(F.max("beta").alias("beta"), F.max("standardError").alias("standardError"))
    )
    out = finemapping.finemap_grouped(ss, kernel=carma_kernel)
    return out.select(
        "studyLocusId",
        "variantId",
        F.round("posteriorProbability", 6).alias("posteriorProbability"),
        "credibleSetIndex",
        F.round("logBF", 6).alias("logBF"),
    )


SQL_FINEMAP_CARMA = """
WITH raw AS (
  SELECT 'C' || CAST(event_id % 100 AS VARCHAR) AS studyLocusId,
         'v' || CAST(user_id % 100 AS VARCHAR)  AS variantId,
         (value - 50.0) / 10.0                  AS beta,
         0.2 + (event_id % 10) / 50.0           AS standardError
  FROM events
),
ss AS (
  SELECT studyLocusId, variantId,
         MAX(beta) AS beta, MAX(standardError) AS standardError
  FROM raw GROUP BY 1, 2
),
abf AS (
  SELECT studyLocusId, variantId,
         0.5 * LN(1 - 0.0225 / (0.0225 + standardError * standardError))
         + (beta / standardError) * (beta / standardError)
           * (0.0225 / (0.0225 + standardError * standardError)) / 2 AS A
  FROM ss
),
s1 AS (
  SELECT *,
         MAX(A) OVER wl AS mA,
         CAST(COUNT(*) OVER wl AS DOUBLE) AS n,
         ROW_NUMBER() OVER (PARTITION BY studyLocusId
                            ORDER BY A DESC, variantId) AS rn
  FROM abf WINDOW wl AS (PARTITION BY studyLocusId)
),
s2 AS (
  SELECT *, MAX(CASE WHEN rn = 2 THEN A END) OVER wl AS a2
  FROM s1 WINDOW wl AS (PARTITION BY studyLocusId)
),
-- pair sums decomposed around the top variant (rn=1) so every
-- factor stays in [0, n] even when mA - a2 is thousands of log-units
s3 AS (
  SELECT *,
         SUM(EXP(A - mA)) OVER wl AS C1,
         SUM(CASE WHEN rn > 1 THEN EXP(A - a2) ELSE 0 END) OVER wl AS G1,
         SUM(CASE WHEN rn > 1 THEN EXP(A - a2) * EXP(A - a2) ELSE 0 END)
           OVER wl AS G2
  FROM s2 WINDOW wl AS (PARTITION BY studyLocusId)
),
s4 AS (
  SELECT *,
         n * LN(0.99)                          AS nullScore,
         LN(0.01) + (n - 1) * LN(0.99) + mA    AS singleMax,
         CASE WHEN n >= 2
              THEN 2 * LN(0.01) + (n - 2) * LN(0.99) + mA + a2 END AS pairMax
  FROM s3
),
s5 AS (
  SELECT *, GREATEST(nullScore, singleMax, COALESCE(pairMax, -1e308)) AS mx
  FROM s4
),
s6 AS (
  SELECT *,
         EXP(nullScore - mx)
         + EXP(LN(0.01) + (n - 1) * LN(0.99) + mA - mx) * C1
         + CASE WHEN n >= 2
                THEN EXP(2 * LN(0.01) + (n - 2) * LN(0.99) + mA + a2 - mx)
                     * (G1 + EXP(a2 - mA) * (G1 * G1 - G2) / 2)
                ELSE 0 END AS total,
         EXP(LN(0.01) + (n - 1) * LN(0.99) + A - mx) AS wSingle,
         CASE WHEN n < 2 THEN 0
              WHEN rn = 1
                THEN EXP(2 * LN(0.01) + (n - 2) * LN(0.99) + mA + a2 - mx) * G1
              ELSE EXP(2 * LN(0.01) + (n - 2) * LN(0.99) + A + mA - mx)
                   * (1 + EXP(a2 - mA) * (G1 - EXP(A - a2)))
         END AS wPair
  FROM s5
),
s7 AS (
  SELECT studyLocusId, variantId, A, (wSingle + wPair) / total AS pip FROM s6
)
SELECT studyLocusId, variantId,
       ROUND(pip, 6) AS posteriorProbability,
       CAST(ROW_NUMBER() OVER (PARTITION BY studyLocusId
                               ORDER BY ROUND(pip, 6) DESC, variantId) AS INT)
         AS credibleSetIndex,
       ROUND(A, 6) AS logBF
FROM s7
"""


# ------------------------------------------------------------------ simhash
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (near-dup fingerprint) — the
    codegen'd explode+sum table form (r14; bit-exact twin of the
    column fold, see dedup.simhash_table)."""
    from genetics_spark_coloc_spark.operators.dedup import simhash_table

    docs = load_table(spark, sf_dir, "documents")
    return simhash_table(docs, "text", "doc_id").select(
        F.col("docId"), F.col("sig").alias("simhash")
    )


SQL_SIMHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id AS docId, tok
  FROM documents,
       UNNEST(CASE WHEN length(trim(text)) = 0 THEN []
                   ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS t(tok)
),
vals AS (
  SELECT docId,
         CAST(list_sum(list_transform(range(8), i ->
           (strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT) + 1, 1)) - 1)
           * CAST(POWER(16, 7 - CAST(i AS INT)) AS BIGINT))) AS BIGINT) AS v
  FROM toks
),
votes AS (
  SELECT docId, CAST(b AS INT) AS b,
         SUM(CASE WHEN (v >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM vals CROSS JOIN range(0, 32) t(b)
  GROUP BY docId, CAST(b AS INT)
)
SELECT docId,
       CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
FROM votes
GROUP BY docId
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs (Manku et al. 2007, operators/
    dedup.simhash_near_dup_pairs): 4 blocks of 8 bits, candidates
    share a block, survivors have full-signature Hamming <= 3 —
    pigeonhole-exact recall at that radius."""
    from genetics_spark_coloc_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=32, bands=4, max_hamming=3
    )


SQL_SIMHASH_PAIRS = f"""
WITH sh AS ({SQL_SIMHASH}),
blocks AS (
  SELECT docId, simhash AS sig, CAST(i AS INT) AS bandIdx,
         (simhash >> (CAST(i AS INT) * 8)) & 255 AS blockVal
  FROM sh CROSS JOIN range(0, 4) t(i)
)
SELECT DISTINCT a.docId AS leftId, b.docId AS rightId,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hammingDist
FROM blocks a
JOIN blocks b ON a.bandIdx = b.bandIdx AND a.blockVal = b.blockVal
WHERE a.docId < b.docId
  AND bit_count(xor(a.sig, b.sig)) <= 3
"""


# -------------------------------------------------------------- l2g features
def _synthetic_locus_and_variant_index(spark: SparkSession, sf_dir: str):
    """Shared study-locus (with max-pp sentinel) + variant-index
    derivation for the L2G feature queries. Each tag variant maps to
    3 genes with deterministic TSS/footprint distances and a severity
    score."""
    tag_rows = _tags(spark, sf_dir)
    w = Window.partitionBy("studyLocusId").orderBy(
        F.col("posteriorProbability").desc(), F.col("tagVariantId").asc()
    )
    study_locus = (
        tag_rows.withColumn("_rn", F.row_number().over(w))
        .groupBy("studyLocusId")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("tagVariantId").alias("variantId"),
                    F.col("posteriorProbability"),
                )
            ).alias("locus"),
            F.min(F.when(F.col("_rn") == 1, F.col("tagVariantId"))).alias("variantId"),
        )
    )
    variant_index = (
        tag_rows.select(F.col("tagVariantId").alias("variantId"))
        .distinct()
        .withColumn("m", F.substring("variantId", 2, 10).cast("int"))
        .select(
            "variantId",
            F.transform(
                F.sequence(F.lit(0), F.lit(2)),
                lambda g: F.struct(
                    F.concat(F.lit("G"), ((F.col("m") + g) % 15).cast("string")).alias(
                        "targetId"
                    ),
                    (((F.col("m") * 7 + g * 13) % 50) * 10000)
                    .cast("long")
                    .alias("distanceFromTss"),
                    (((F.col("m") * 11 + g * 17) % 50) * 10000)
                    .cast("long")
                    .alias("distanceFromFootprint"),
                    (((F.col("m") * 3 + g * 7) % 10) / 10.0).alias("consequenceScore"),
                ),
            ).alias("transcriptConsequences"),
        )
    )
    return study_locus, variant_index


def q_l2g_registry_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL reference feature registry (feature_factory.py:102-134,
    29 features) as one wide matrix: distance ×4, coloc CLPP/H4 ×
    e/p/sQTL ×6, VEP ×2, their Neighbourhood variants, gene counts,
    isProteinCoding, credibleSetConfidence. Hash-checked end-to-end
    against SQL_L2G_REGISTRY_MATRIX — one DuckDB statement that
    replays every family pipeline (posterior-weighted distance
    scoring, coloc max aggregation with protein-coding zero
    extension, neighbourhood normalisation, windowed gene counts,
    confidence-class scoring) and pivots to the 29-column matrix."""
    study_locus, variant_index = _synthetic_locus_and_variant_index(spark, sf_dir)
    # ~10 feature families each consume these inputs; without an
    # explicit materialization every family re-runs the window-heavy
    # tag derivation (8× the work). localCheckpoint truncates the
    # lineage once — same pattern as the ontology closure.
    study_locus = study_locus.localCheckpoint(eager=False)
    variant_index = variant_index.localCheckpoint(eager=False)
    locus_num = F.substring("studyLocusId", 2, 10).cast("int")
    study_locus = (
        study_locus.withColumn("chromosome", (1 + locus_num % 3).cast("string"))
        .withColumn("position", (100_000 + (locus_num * 37) % 400_000).cast("int"))
        .withColumn(
            "confidence",
            F.when(locus_num % 4 == 0, F.lit("SuSiE fine-mapped credible set with in-sample LD"))
            .when(locus_num % 4 == 1, F.lit("SuSiE fine-mapped credible set with out-of-sample LD"))
            .when(locus_num % 4 == 2, F.lit("PICS fine-mapped credible set extracted from summary statistics"))
            .otherwise(F.lit("PICS fine-mapped credible set based on reported top hit")),
        )
    )
    # right-side QTL loci: each left locus colocalises with 2 QTL loci
    rsl = spark.range(30).select(
        F.concat(F.lit("R"), F.col("id").cast("string")).alias("studyLocusId"),
        F.concat(F.lit("Q"), (F.col("id") % 6).cast("string")).alias("studyId"),
    )
    coloc_meta = study_locus.select("studyLocusId").select(
        F.col("studyLocusId").alias("leftStudyLocusId"),
        F.substring("studyLocusId", 2, 10).cast("int").alias("ln"),
    )
    colocalisation = (
        coloc_meta.select(
            "leftStudyLocusId",
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("k"),
            "ln",
        )
        .select(
            "leftStudyLocusId",
            F.concat(F.lit("R"), ((F.col("ln") * 2 + F.col("k")) % 30).cast("string")).alias(
                "rightStudyLocusId"
            ),
            (((F.col("ln") * 7 + F.col("k") * 3) % 10) / 20.0).alias("clpp"),
            (((F.col("ln") * 11 + F.col("k") * 5) % 10) / 10.0).alias("h4"),
        )
    )
    study_index = spark.range(6).select(
        F.concat(F.lit("Q"), F.col("id").cast("string")).alias("studyId"),
        F.concat(F.lit("G"), (F.col("id") * 4 % 15).cast("string")).alias("geneId"),
        F.element_at(
            F.array(F.lit("eqtl"), F.lit("pqtl"), F.lit("sqtl")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("studyType"),
    )
    target_index = spark.range(15).select(
        F.concat(F.lit("G"), F.col("id").cast("string")).alias("id"),
        F.struct((1 + F.col("id") % 3).cast("string").alias("chromosome")).alias(
            "genomicLocation"
        ),
        (150_000 + (F.col("id") * 61_000) % 500_000).cast("long").alias("tss"),
        F.when(F.col("id") % 3 == 2, F.lit("lncRNA"))
        .otherwise(F.lit("protein_coding"))
        .alias("biotype"),
    )
    matrix = l2g.build_registry_feature_matrix(
        study_locus,
        variant_index,
        colocalisation,
        study_index,
        target_index,
        qtl_locus_to_study=rsl,
    )
    rounded = [
        F.round(F.col(c), 6).alias(c) if c not in ("studyLocusId", "geneId") else F.col(c)
        for c in matrix.columns
    ]
    return matrix.select(*rounded)


_REGISTRY_SQL_BODY = """
slx AS (
  SELECT l.studyLocusId, l.variantId,
         CAST(substr(l.studyLocusId, 2) AS INT) AS ln,
         CAST(1 + CAST(substr(l.studyLocusId, 2) AS INT) % 3 AS VARCHAR) AS chromosome,
         100000 + (CAST(substr(l.studyLocusId, 2) AS INT) * 37) % 400000 AS position,
         CASE CAST(substr(l.studyLocusId, 2) AS INT) % 4
              WHEN 0 THEN 1.0 WHEN 1 THEN 0.75 WHEN 2 THEN 0.5 ELSE 0.25
         END AS confScore
  FROM lead l
),
study_index AS (
  SELECT 'Q' || CAST(id AS VARCHAR) AS studyId,
         'G' || CAST(id * 4 % 15 AS VARCHAR) AS geneId,
         CASE id % 3 WHEN 0 THEN 'eqtl' WHEN 1 THEN 'pqtl' ELSE 'sqtl' END AS studyType
  FROM range(0, 6) t(id)
),
rsl AS (
  SELECT 'R' || CAST(id AS VARCHAR) AS rightStudyLocusId,
         'Q' || CAST(id % 6 AS VARCHAR) AS studyId
  FROM range(0, 30) t(id)
),
coloc_raw AS (
  SELECT s.studyLocusId AS leftStudyLocusId,
         'R' || CAST((s.ln * 2 + k) % 30 AS VARCHAR) AS rightStudyLocusId,
         ((s.ln * 7 + k * 3) % 10) / 20.0 AS clpp,
         ((s.ln * 11 + k * 5) % 10) / 10.0 AS h4
  FROM slx s CROSS JOIN range(0, 2) t(k)
),
target_index AS (
  SELECT 'G' || CAST(id AS VARCHAR) AS geneId,
         CAST(1 + id % 3 AS VARCHAR) AS g_chrom,
         150000 + (id * 61000) % 500000 AS g_tss,
         CASE WHEN id % 3 = 2 THEN 'lncRNA' ELSE 'protein_coding' END AS biotype
  FROM range(0, 15) t(id)
),
mean_agg AS (
  SELECT tg.studyLocusId, c.geneId,
         SUM((500000 - c.dTss + 1) * tg.posteriorProbability)  AS sTss,
         SUM((500000 - c.dFoot + 1) * tg.posteriorProbability) AS sFoot
  FROM tags tg JOIN csq c ON c.variantId = tg.tagVariantId
  GROUP BY 1, 2
),
sent AS (
  SELECT l.studyLocusId, c.geneId,
         500000 - c.dTss + 1  AS sTss,
         500000 - c.dFoot + 1 AS sFoot
  FROM lead l JOIN csq c ON c.variantId = l.variantId
),
vep_base AS (
  SELECT tg.studyLocusId, c.geneId,
         MAX(c.sev) AS maxScore,
         AVG(c.sev * tg.posteriorProbability) AS meanScore
  FROM tags tg JOIN csq c ON c.variantId = tg.tagVariantId
  GROUP BY 1, 2
),
local_long AS (
  SELECT studyLocusId, geneId, 'distanceTssMean' AS featureName,
         LOG10(sTss) / LOG10(500001) AS v FROM mean_agg
  UNION ALL
  SELECT studyLocusId, geneId, 'distanceFootprintMean',
         LOG10(sFoot) / LOG10(500001) FROM mean_agg
  UNION ALL
  SELECT studyLocusId, geneId, 'distanceSentinelTss',
         LOG10(sTss) / LOG10(500001) FROM sent
  UNION ALL
  SELECT studyLocusId, geneId, 'distanceSentinelFootprint',
         LOG10(sFoot) / LOG10(500001) FROM sent
  UNION ALL
  SELECT studyLocusId, geneId, 'vepMaximum', maxScore FROM vep_base
  UNION ALL
  SELECT studyLocusId, geneId, 'vepMean', meanScore FROM vep_base
),
coloc_meta AS (
  SELECT r.rightStudyLocusId, si.geneId, si.studyType AS rightType
  FROM rsl r JOIN study_index si ON si.studyId = r.studyId
),
coloc_agg AS (
  SELECT c.leftStudyLocusId AS studyLocusId, m.geneId,
         CASE m.rightType WHEN 'eqtl' THEN 'eQtl'
                          WHEN 'pqtl' THEN 'pQtl' ELSE 'sQtl' END AS pre,
         MAX(c.clpp) AS maxClpp, MAX(c.h4) AS maxH4
  FROM coloc_raw c JOIN coloc_meta m ON m.rightStudyLocusId = c.rightStudyLocusId
  GROUP BY 1, 2, 3
),
coloc_long AS (
  SELECT studyLocusId, geneId, pre || 'ColocClppMaximum' AS featureName,
         maxClpp AS v FROM coloc_agg
  UNION ALL
  SELECT studyLocusId, geneId, pre || 'ColocH4Maximum', maxH4 FROM coloc_agg
),
locus_coding_genes AS (
  SELECT DISTINCT s.studyLocusId, c.geneId
  FROM slx s
  JOIN csq c ON c.variantId = s.variantId
  JOIN target_index ti ON ti.geneId = c.geneId AND ti.biotype = 'protein_coding'
),
coloc_zero AS (
  SELECT g.studyLocusId, g.geneId, n.featureName, 0.0 AS v
  FROM locus_coding_genes g
  CROSS JOIN (SELECT DISTINCT featureName FROM coloc_long) n
  WHERE NOT EXISTS (
    SELECT 1 FROM coloc_long cl
    WHERE cl.studyLocusId = g.studyLocusId AND cl.geneId = g.geneId
      AND cl.featureName = n.featureName
  )
),
coloc_ext AS (
  SELECT * FROM coloc_long UNION ALL SELECT * FROM coloc_zero
),
local_nb AS (
  SELECT studyLocusId, geneId, featureName || 'Neighbourhood' AS featureName,
         CASE WHEN mx != 0 THEN v / mx ELSE 0.0 END AS v
  FROM (
    SELECT ll.studyLocusId, ll.geneId, ll.featureName, ll.v,
           MAX(ll.v) OVER (PARTITION BY ll.studyLocusId, ll.featureName) AS mx
    FROM local_long ll
    JOIN target_index ti ON ti.geneId = ll.geneId AND ti.biotype = 'protein_coding'
  )
),
coloc_nb AS (
  SELECT studyLocusId, geneId, featureName || 'Neighbourhood' AS featureName,
         CASE WHEN mx != 0 THEN v / mx ELSE 0.0 END AS v
  FROM (
    SELECT ce.studyLocusId, ce.geneId, ce.featureName, ce.v,
           MAX(ce.v) OVER (PARTITION BY ce.studyLocusId, ce.featureName) AS mx
    FROM coloc_ext ce
    JOIN target_index ti ON ti.geneId = ce.geneId AND ti.biotype = 'protein_coding'
  )
),
win_genes AS (
  SELECT s.studyLocusId, ti.geneId, ti.biotype
  FROM slx s
  JOIN target_index ti
    ON ti.g_chrom = s.chromosome
   AND ti.g_tss BETWEEN s.position - 500000 AND s.position + 500000
),
win_counts AS (
  SELECT studyLocusId,
         CAST(COUNT(*) AS DOUBLE) AS geneCount,
         CAST(SUM(CASE WHEN biotype = 'protein_coding' THEN 1 ELSE 0 END)
              AS DOUBLE) AS pcCount
  FROM win_genes GROUP BY 1
),
counts_long AS (
  SELECT w.studyLocusId, w.geneId, 'geneCount500kb' AS featureName,
         c.geneCount AS v
  FROM (SELECT DISTINCT studyLocusId, geneId FROM win_genes) w
  JOIN win_counts c USING (studyLocusId)
  UNION ALL
  SELECT w.studyLocusId, w.geneId, 'proteinGeneCount500kb', c.pcCount
  FROM (SELECT DISTINCT studyLocusId, geneId FROM win_genes) w
  JOIN win_counts c USING (studyLocusId)
),
coding_long AS (
  SELECT DISTINCT studyLocusId, geneId, 'isProteinCoding' AS featureName,
         CASE WHEN biotype = 'protein_coding' THEN 1.0 ELSE 0.0 END AS v
  FROM win_genes
),
conf_long AS (
  SELECT tg.studyLocusId, c.geneId, 'credibleSetConfidence' AS featureName,
         MAX(s.confScore) AS v
  FROM tags tg
  JOIN csq c ON c.variantId = tg.tagVariantId
  JOIN slx s ON s.studyLocusId = tg.studyLocusId
  GROUP BY 1, 2, 3
),
lng AS (
  SELECT * FROM local_long
  UNION ALL SELECT * FROM coloc_long
  UNION ALL SELECT * FROM local_nb
  UNION ALL SELECT * FROM coloc_nb
  UNION ALL SELECT * FROM counts_long
  UNION ALL SELECT * FROM coding_long
  UNION ALL SELECT * FROM conf_long
)
"""

_REGISTRY_PIVOT_COLS = ",\n".join(
    "       ROUND(COALESCE(MAX(CASE WHEN featureName = '{n}' THEN v END), 0.0), 6)"
    " AS {n}".format(n=n)
    for n in [
        "distanceSentinelTss",
        "distanceSentinelTssNeighbourhood",
        "distanceSentinelFootprint",
        "distanceSentinelFootprintNeighbourhood",
        "distanceTssMean",
        "distanceTssMeanNeighbourhood",
        "distanceFootprintMean",
        "distanceFootprintMeanNeighbourhood",
        "eQtlColocClppMaximum",
        "eQtlColocClppMaximumNeighbourhood",
        "pQtlColocClppMaximum",
        "pQtlColocClppMaximumNeighbourhood",
        "sQtlColocClppMaximum",
        "sQtlColocClppMaximumNeighbourhood",
        "eQtlColocH4Maximum",
        "eQtlColocH4MaximumNeighbourhood",
        "pQtlColocH4Maximum",
        "pQtlColocH4MaximumNeighbourhood",
        "sQtlColocH4Maximum",
        "sQtlColocH4MaximumNeighbourhood",
        "vepMean",
        "vepMeanNeighbourhood",
        "vepMaximum",
        "vepMaximumNeighbourhood",
        "geneCount500kb",
        "proteinGeneCount500kb",
        "isProteinCoding",
        "credibleSetConfidence",
    ]
)

def q_l2g_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four L2G distance features in long format — posterior-
    weighted mean + sentinel, TSS and footprint families (reference
    log10 scoring, dataset/l2g_features/distance.py:21-81)."""
    study_locus, variant_index = _synthetic_locus_and_variant_index(spark, sf_dir)
    out = l2g.distance_features(
        study_locus, variant_index, "distanceFromTss"
    ).unionByName(
        l2g.distance_features(study_locus, variant_index, "distanceFromFootprint")
    )
    return out.select(
        "studyLocusId",
        "geneId",
        "featureName",
        F.round("featureValue", 6).alias("featureValue"),
    )


_CSQ_SQL = """
csq AS (
  SELECT t.tagVariantId AS variantId,
         'G' || CAST((CAST(substr(t.tagVariantId, 2) AS INT) + CAST(g AS INT)) % 15 AS VARCHAR) AS geneId,
         CAST(((CAST(substr(t.tagVariantId, 2) AS INT) * 7 + CAST(g AS INT) * 13) % 50) * 10000 AS BIGINT) AS dTss,
         CAST(((CAST(substr(t.tagVariantId, 2) AS INT) * 11 + CAST(g AS INT) * 17) % 50) * 10000 AS BIGINT) AS dFoot,
         ((CAST(substr(t.tagVariantId, 2) AS INT) * 3 + CAST(g AS INT) * 7) % 10) / 10.0 AS sev
  FROM (SELECT DISTINCT tagVariantId FROM tags) t
  CROSS JOIN range(0, 3) r(g)
),
lead AS (
  SELECT studyLocusId, tagVariantId AS variantId
  FROM (
    SELECT studyLocusId, tagVariantId,
           ROW_NUMBER() OVER (PARTITION BY studyLocusId
                              ORDER BY posteriorProbability DESC, tagVariantId ASC) AS rn
    FROM tags
  ) WHERE rn = 1
)
"""


SQL_L2G_DISTANCE = f"""
WITH {TAGS_SQL.strip()},
{_CSQ_SQL.strip()},
mean_agg AS (
  SELECT tg.studyLocusId, c.geneId,
         SUM((500000 - c.dTss + 1) * tg.posteriorProbability)  AS sTss,
         SUM((500000 - c.dFoot + 1) * tg.posteriorProbability) AS sFoot
  FROM tags tg
  JOIN csq c ON c.variantId = tg.tagVariantId
  GROUP BY 1, 2
),
sent AS (
  SELECT l.studyLocusId, c.geneId,
         500000 - c.dTss + 1  AS sTss,
         500000 - c.dFoot + 1 AS sFoot
  FROM lead l JOIN csq c ON c.variantId = l.variantId
)
SELECT studyLocusId, geneId, 'distanceTssMean' AS featureName,
       ROUND(LOG10(sTss) / LOG10(500001), 6) AS featureValue FROM mean_agg
UNION ALL
SELECT studyLocusId, geneId, 'distanceFootprintMean',
       ROUND(LOG10(sFoot) / LOG10(500001), 6) FROM mean_agg
UNION ALL
SELECT studyLocusId, geneId, 'distanceSentinelTss',
       ROUND(LOG10(sTss) / LOG10(500001), 6) FROM sent
UNION ALL
SELECT studyLocusId, geneId, 'distanceSentinelFootprint',
       ROUND(LOG10(sFoot) / LOG10(500001), 6) FROM sent
"""


def q_vep_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VEP severity features (vepMaximum / vepMean) plus their
    protein-coding-restricted Neighbourhood variants (reference
    dataset/l2g_features/vep.py)."""
    study_locus, variant_index = _synthetic_locus_and_variant_index(spark, sf_dir)
    base = l2g.vep_features(study_locus, variant_index)
    protein_coding = spark.range(0, 15).select(
        F.concat(F.lit("G"), F.col("id").cast("string")).alias("geneId")
    ).filter(F.col("id") % 2 == 0)
    neigh = l2g.neighbourhood_normalise(base, protein_coding)
    return base.unionByName(neigh).select(
        "studyLocusId",
        "geneId",
        "featureName",
        F.round("featureValue", 6).alias("featureValue"),
    )


SQL_VEP_FEATURES = f"""
WITH {TAGS_SQL.strip()},
{_CSQ_SQL.strip()},
base AS (
  SELECT tg.studyLocusId, c.geneId,
         MAX(c.sev) AS maxScore,
         AVG(c.sev * tg.posteriorProbability) AS meanScore
  FROM tags tg
  JOIN csq c ON c.variantId = tg.tagVariantId
  GROUP BY 1, 2
),
long_base AS (
  SELECT studyLocusId, geneId, 'vepMaximum' AS featureName, maxScore AS v FROM base
  UNION ALL
  SELECT studyLocusId, geneId, 'vepMean', meanScore FROM base
),
pc AS (
  SELECT studyLocusId, geneId, featureName, v,
         MAX(v) OVER (PARTITION BY studyLocusId, featureName) AS regionalMax
  FROM long_base
  WHERE CAST(substr(geneId, 2) AS INT) % 2 = 0
)
SELECT studyLocusId, geneId, featureName, ROUND(v, 6) AS featureValue FROM long_base
UNION ALL
SELECT studyLocusId, geneId, featureName || 'Neighbourhood',
       ROUND(CASE WHEN regionalMax != 0 THEN v / regionalMax ELSE 0.0 END, 6)
FROM pc
"""


# one DuckDB statement replaying ALL feature-family pipelines of
# build_registry_feature_matrix (operators/l2g.py:437-492) over the
# same deterministic inputs, pivoted to the full-registry matrix
SQL_L2G_REGISTRY_MATRIX = f"""
WITH {TAGS_SQL.strip()},
{_CSQ_SQL.strip()},
{_REGISTRY_SQL_BODY.strip()}
SELECT studyLocusId, geneId,
{_REGISTRY_PIVOT_COLS}
FROM lng
GROUP BY studyLocusId, geneId
"""


# ------------------------------------------------------------- multimodal plan
def q_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan from metadata only (payload pages
    never read)."""
    ev = load_table(spark, sf_dir, "events")
    media = ev.select(
        F.col("event_id").alias("mediaId"),
        F.when(F.col("event_id") % 3 == 0, "video").otherwise("image").alias("modality"),
        (F.floor(F.col("value") * 100)).cast("int").alias("durationMs"),
    )
    return frame_sample_plan(media, every_ms=1000)


SQL_FRAME_PLAN = """
WITH media AS (
  SELECT event_id AS mediaId,
         CASE WHEN event_id % 3 = 0 THEN 'video' ELSE 'image' END AS modality,
         CAST(FLOOR(value * 100) AS INT) AS durationMs
  FROM events
)
SELECT mediaId, CAST(i AS INT) * 1000 AS frameTimestampMs
FROM media CROSS JOIN range(0, 1024) t(i)
WHERE modality = 'video'
  AND CAST(i AS INT) * 1000 <= GREATEST(durationMs - 1, 0)
"""


# ------------------------------------------------------------------- z-score
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-value -> signed z-score via Acklam inverse-normal, JVM-side
    (SURVEY §2.8 effect harmonisation; replaces scipy UDF)."""
    ss = _sumstats(spark, sf_dir)
    return ss.select(
        "studyId",
        "variantId",
        F.round(
            zscore_from_pvalue(
                F.col("pValueMantissa"), F.col("pValueExponent"), F.col("beta")
            ),
            6,
        ).alias("zScore"),
    )


SQL_ZSCORE = f"""
WITH {SUMSTATS_SQL.strip()},
base AS (
  SELECT studyId, variantId, beta,
         EXP(LN(CAST(pValueMantissa AS DOUBLE)) + pValueExponent * LN(10)) / 2 AS q
  FROM sumstats
),
branches AS (
  SELECT studyId, variantId, beta, q,
         SQRT(-2 * LN(q)) AS t,
         q - 0.5 AS r,
         (q - 0.5) * (q - 0.5) AS s
  FROM base
),
z AS (
  SELECT studyId, variantId, beta,
         CASE WHEN q < 0.02425 THEN
           (((((-7.784894002430293e-03 * t + -3.223964580411365e-01) * t + -2.400758277161838e+00) * t
              + -2.549732539343734e+00) * t + 4.374664141464968e+00) * t + 2.938163982698783e+00)
           / ((((7.784695709041462e-03 * t + 3.224671290700398e-01) * t + 2.445134137142996e+00) * t
              + 3.754408661907416e+00) * t + 1)
         ELSE
           -((((((-3.969683028665376e+01 * s + 2.209460984245205e+02) * s + -2.759285104469687e+02) * s
              + 1.383577518672690e+02) * s + -3.066479806614716e+01) * s + 2.506628277459239e+00) * r)
           / (((((-5.447609879822406e+01 * s + 1.615858368580409e+02) * s + -1.556989798598866e+02) * s
              + 6.680131188771972e+01) * s + -1.328068155288572e+01) * s + 1)
         END AS zraw
  FROM branches
)
SELECT studyId, variantId,
       ROUND(CASE WHEN beta < 0 THEN -ABS(zraw) ELSE ABS(zraw) END, 6) AS zScore
FROM z
"""


EXTRA_QUERIES = {
    "finemap_abf": q_finemap_abf,
    "finemap_susie": q_finemap_susie,
    "finemap_carma": q_finemap_carma,
    "finemap_susie_inf": q_finemap_susie_inf,
    "finemap_carma_ld": q_finemap_carma_ld,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "l2g_registry_matrix": q_l2g_registry_matrix,
    "l2g_distance_features": q_l2g_distance,
    "vep_features": q_vep_features,
    "frame_plan": q_frame_plan,
    "zscore": q_zscore,
}

EXTRA_ORACLES = {
    "finemap_abf": SQL_FINEMAP_ABF,
    "finemap_susie": SQL_FINEMAP_SUSIE,
    "finemap_carma": SQL_FINEMAP_CARMA,
    "finemap_susie_inf": SQL_FINEMAP_SUSIE_INF,
    "finemap_carma_ld": SQL_FINEMAP_CARMA_LD,
    "l2g_registry_matrix": SQL_L2G_REGISTRY_MATRIX,
    "simhash": SQL_SIMHASH,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "l2g_distance_features": SQL_L2G_DISTANCE,
    "vep_features": SQL_VEP_FEATURES,
    "frame_plan": SQL_FRAME_PLAN,
    "zscore": SQL_ZSCORE,
}


def q_susie_credible_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SuSiE-inf → study-locus credible-set rows, one applyInPandas
    kernel per locus (the distributed replacement for the reference's
    driver-side susie_inf_to_studylocus loop,
    susie_finemapper.py:188-320), in the oracle-able reduced model
    configuration (identity LD, L=1, fixed hyperparameters — see
    ``susie_study_locus_reduced_kernel``). The extraction logic this
    query hash-checks — effect ordering, 99% top-PIP prefix
    membership, LD-block purity, lead variant, locus assembly — is
    the genuine production code path; the full LD-aware model stays
    exercised (rows-only) by ``finemap_susie_inf``."""
    ev = load_table(spark, sf_dir, "events")
    ss = ev.select(
        F.concat(F.lit("L"), (F.col("event_id") % 400).cast("string")).alias(
            "studyLocusId"
        ),
        F.concat(F.lit("v"), F.col("event_id").cast("string")).alias("variantId"),
        ((F.col("value") - 50.0) / 25.0).alias("beta"),
        (0.5 + (F.col("event_id") % 10) / 10.0).alias("standardError"),
    )
    out = finemapping.finemap_grouped(
        ss,
        kernel=finemapping.susie_study_locus_reduced_kernel,
        schema=finemapping.SUSIE_STUDY_LOCUS_SCHEMA,
    )
    return out.select(
        "studyLocusId",
        "credibleSetIndex",
        F.round("credibleSetLog10BF", 6).alias("credibleSetLog10BF"),
        F.round("purityMeanR2", 6).alias("purityMeanR2"),
        F.round("purityMinR2", 6).alias("purityMinR2"),
        "leadVariantId",
        F.size("locus").alias("credibleSetSize"),
    )


SQL_SUSIE_CREDIBLE_SETS = """
WITH ss AS (
  SELECT 'L' || CAST(event_id % 400 AS VARCHAR) AS studyLocusId,
         'v' || CAST(event_id AS VARCHAR)       AS variantId,
         ((value - 50.0) / 25.0) / (0.5 + (event_id % 10) / 10.0) AS z
  FROM events
),
-- reduced susie-inf: omega = n + 1/ssq (n=100000, ssq=0.2);
-- lbf = n z² / (2 omega) − ½ ln(omega · ssq)
lbf AS (
  SELECT studyLocusId, variantId,
         100000.0 * z * z / (2.0 * 100005.0) - 0.5 * LN(100005.0 * 0.2) AS lbf
  FROM ss
),
s1 AS (
  SELECT *, MAX(lbf) OVER w AS mx, CAST(COUNT(*) OVER w AS DOUBLE) AS p
  FROM lbf WINDOW w AS (PARTITION BY studyLocusId)
),
pip AS (
  SELECT *,
         EXP(lbf - mx) / SUM(EXP(lbf - mx)) OVER w AS pip,
         mx - LN(p) + LN(SUM(EXP(lbf - mx)) OVER w) AS csLbf
  FROM s1 WINDOW w AS (PARTITION BY studyLocusId)
),
cum AS (
  SELECT *,
         COALESCE(SUM(pip) OVER (PARTITION BY studyLocusId
                                 ORDER BY ROUND(pip, 6) DESC, variantId
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0) AS cumBefore,
         ROW_NUMBER() OVER (PARTITION BY studyLocusId
                            ORDER BY ROUND(pip, 6) DESC, variantId) AS rn
  FROM pip
)
SELECT studyLocusId,
       1 AS credibleSetIndex,
       ROUND(MAX(csLbf) / LN(10), 6)                       AS credibleSetLog10BF,
       ROUND(1.0 / COUNT(*), 6)                            AS purityMeanR2,
       CASE WHEN COUNT(*) = 1 THEN 1.0 ELSE 0.0 END        AS purityMinR2,
       MIN(CASE WHEN rn = 1 THEN variantId END)            AS leadVariantId,
       CAST(COUNT(*) AS INT)                               AS credibleSetSize
FROM cum
WHERE cumBefore < 0.99
GROUP BY studyLocusId
"""


EXTRA_QUERIES["susie_credible_sets"] = q_susie_credible_sets
EXTRA_ORACLES["susie_credible_sets"] = SQL_SUSIE_CREDIBLE_SETS


def q_finemap_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fine-mapping benchmark (reference
    finemapping_simulations.py:16-267, distributed): simulate
    replicate loci with 2 planted causal variants, fine-map each
    through the applyInPandas SuSiE kernel, and score
    accuracy/sensitivity against the planted truth — the full
    simulate → fine-map → score pipeline in one plan. Runs in its
    oracle-able deterministic configuration (hash-uniform + Acklam
    Gaussian noise, identity-LD reduced SuSiE — see
    ``simulate_sumstats_deterministic``), so the driver hash-checks
    the whole benchmark end-to-end; the published correlated-noise
    N(0, U) model and the LD-aware kernel stay exercised by pytest
    (tests/test_finemap_golden.py)."""
    from genetics_spark_coloc_spark.operators import finemap_sim

    sim = finemap_sim.simulate_sumstats_deterministic(
        load_table(spark, sf_dir, "events")
    )
    cred = finemapping.finemap_grouped(
        sim.drop("isCausal"),
        kernel=finemapping.susie_study_locus_reduced_kernel,
        schema=finemapping.SUSIE_STUDY_LOCUS_SCHEMA,
    )
    truth = sim.select("studyLocusId", "variantId", "isCausal")
    return finemap_sim.score_credible_sets(cred, truth, n_causal=2)


SQL_FINEMAP_SIMULATION = """
WITH base AS (
  SELECT 'SIM' || CAST(CAST(FLOOR(event_id / 25.0) AS BIGINT) AS VARCHAR)
           AS studyLocusId,
         printf('v%04d', CAST(event_id % 25 AS INT)) AS variantId,
         CAST(event_id % 25 AS INT) IN (7, 19) AS isCausal,
         ((event_id * 2654435761) % 1000003 + 0.5) / 1000003.0 AS u,
         CASE WHEN event_id % 25 = 7
                THEN 1.5 + 0.7 * CAST(CAST(FLOOR(event_id / 25.0) AS BIGINT) % 5 AS DOUBLE)
              WHEN event_id % 25 = 19
                THEN -(1.0 + 0.5 * CAST(CAST(FLOOR(event_id / 25.0) AS BIGINT) % 7 AS DOUBLE))
              ELSE 0.0 END AS effect
  FROM events
),
-- Acklam inverse normal on q = min(u, 1-u), reflected by u<0.5
branches AS (
  SELECT *, LEAST(u, 1.0 - u) AS q,
         SQRT(-2 * LN(LEAST(u, 1.0 - u))) AS t,
         LEAST(u, 1.0 - u) - 0.5 AS r,
         (LEAST(u, 1.0 - u) - 0.5) * (LEAST(u, 1.0 - u) - 0.5) AS s
  FROM base
),
sim AS (
  SELECT studyLocusId, variantId, isCausal,
         effect + (CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END) * ABS(
           CASE WHEN q < 0.02425 THEN
             (((((-7.784894002430293e-03 * t + -3.223964580411365e-01) * t + -2.400758277161838e+00) * t
                + -2.549732539343734e+00) * t + 4.374664141464968e+00) * t + 2.938163982698783e+00)
             / ((((7.784695709041462e-03 * t + 3.224671290700398e-01) * t + 2.445134137142996e+00) * t
                + 3.754408661907416e+00) * t + 1)
           ELSE
             -((((((-3.969683028665376e+01 * s + 2.209460984245205e+02) * s + -2.759285104469687e+02) * s
                + 1.383577518672690e+02) * s + -3.066479806614716e+01) * s + 2.506628277459239e+00) * r)
             / (((((-5.447609879822406e+01 * s + 1.615858368580409e+02) * s + -1.556989798598866e+02) * s
                + 6.680131188771972e+01) * s + -1.328068155288572e+01) * s + 1)
           END) AS z
  FROM branches
),
-- reduced susie-inf closed form (identity LD, L=1, ssq=0.2):
-- lbf = n z^2/(2(n+5)) - 0.5 ln(0.2(n+5)), pip = softmax(lbf)
lbf AS (
  SELECT studyLocusId, variantId, isCausal,
         100000.0 * z * z / (2.0 * 100005.0) - 0.5 * LN(100005.0 * 0.2) AS lbf
  FROM sim
),
s1 AS (
  SELECT *, MAX(lbf) OVER w AS mx
  FROM lbf WINDOW w AS (PARTITION BY studyLocusId)
),
pip AS (
  SELECT *, EXP(lbf - mx) / SUM(EXP(lbf - mx)) OVER w AS pip
  FROM s1 WINDOW w AS (PARTITION BY studyLocusId)
),
cum AS (
  SELECT *,
         COALESCE(SUM(pip) OVER (PARTITION BY studyLocusId
                                 ORDER BY ROUND(pip, 6) DESC, variantId
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0) AS cumBefore,
         ROW_NUMBER() OVER (PARTITION BY studyLocusId
                            ORDER BY ROUND(pip, 6) DESC, variantId) AS rn
  FROM pip
),
members AS (
  SELECT studyLocusId, variantId, isCausal, rn FROM cum WHERE cumBefore < 0.99
),
per_cs AS (
  SELECT studyLocusId,
         MAX(CASE WHEN isCausal THEN 1.0 ELSE 0.0 END) AS isInX,
         MAX(CASE WHEN rn = 1 AND isCausal THEN 1.0 ELSE 0.0 END) AS isInLead
  FROM members GROUP BY studyLocusId
),
rec AS (
  SELECT COUNT(*) AS recovered
  FROM (SELECT DISTINCT studyLocusId, variantId FROM members WHERE isCausal)
)
SELECT COUNT(*)                               AS successfulRuns,
       COUNT(*)                               AS numberOfCs,
       COUNT(*) * 2                           AS expectedResults,
       ROUND(AVG(1.0 - isInX), 6)             AS falsePositives,
       ROUND(AVG(isInX), 6)                   AS accuracy,
       ROUND(AVG(isInLead), 6)                AS accuracyLead,
       ROUND(MAX(recovered) / (COUNT(*) * 2), 6) AS sensitivity
FROM per_cs CROSS JOIN rec
"""


EXTRA_QUERIES["finemap_simulation"] = q_finemap_simulation
EXTRA_ORACLES["finemap_simulation"] = SQL_FINEMAP_SIMULATION
