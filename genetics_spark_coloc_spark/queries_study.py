"""Contract queries: credible-set Bayes factors, trans-QTL flagging,
ancestry→LD-population aggregation, and QC-flag maintenance
(redundant top hits + lead p-value validation).

Parity rules as in queries.py: every aggregate/computed column is
aliased identically in the Spark query and the DuckDB oracle, floats
rounded to 6dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators.annotation import (
    flag_trans_qtls,
    qc_redundant_top_hits,
    validate_lead_pvalue,
)
from genetics_spark_coloc_spark.operators.credible_sets import (
    credible_set_log10bf,
)
from genetics_spark_coloc_spark.operators.study_index_ops import (
    aggregate_and_map_ancestries,
)
from genetics_spark_coloc_spark.queries import SUMSTATS_SQL, TAGS_SQL, _tags
from genetics_spark_coloc_spark.sources.tables import load_table


# ----------------------------------------------------- credible-set log10 BF
def q_credible_set_log10bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-credible-set log10 Bayes factor: stable logsumexp fold
    over the per-tag logBFs (reference study_locus.py:635-657 — there
    a Python UDF; here pure Spark higher-order functions)."""
    tags = _tags(spark, sf_dir)
    loci = tags.groupBy("studyLocusId").agg(
        F.sort_array(F.collect_list("logBF")).alias("logBFs")
    )
    return loci.select(
        "studyLocusId",
        F.round(credible_set_log10bf(F.col("logBFs")), 6).alias("credibleSetlog10BF"),
    )


SQL_CREDIBLE_SET_LOG10BF = f"""
WITH {TAGS_SQL.strip()},
mx AS (
  SELECT studyLocusId, MAX(logBF) AS m FROM tags GROUP BY 1
),
fold AS (
  SELECT t.studyLocusId, mx.m,
         SUM(EXP(t.logBF - mx.m)) AS s
  FROM tags t JOIN mx ON t.studyLocusId = mx.studyLocusId
  GROUP BY 1, 2
)
SELECT studyLocusId,
       ROUND((m + LN(s)) * 0.43429448190325176, 6) AS credibleSetlog10BF
FROM fold
"""


# ------------------------------------------------------------ trans-QTL flag
def q_trans_qtl_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isTransQtl per credible set: every tag on the wrong chromosome
    or >5 Mb from the measured gene's TSS (reference
    study_locus.py:686-777). GWAS loci come out null."""
    ev = load_table(spark, sf_dir, "events")
    study_locus = (
        ev.select(
            F.concat(F.lit("L"), (F.col("user_id") % 10).cast("string")).alias(
                "studyLocusId"
            ),
            F.concat(F.lit("S"), (F.col("user_id") % 10).cast("string")).alias(
                "studyId"
            ),
            F.concat_ws(
                "_",
                (1 + F.col("event_id") % 2).cast("string"),
                ((1 + F.col("event_id") % 40) * 250_000).cast("string"),
                F.lit("A"),
                F.lit("G"),
            ).alias("tagVariantId"),
        )
        .distinct()
        .groupBy("studyLocusId", "studyId")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("tagVariantId").alias("variantId")))
            ).alias("locus")
        )
    )
    study_index = spark.range(0, 10).select(
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("studyId"),
        F.when(F.col("id") % 2 == 0, "gwas").otherwise("eqtl").alias("studyType"),
        F.concat(F.lit("G"), F.col("id").cast("string")).alias("geneId"),
    )
    target_index = spark.range(0, 10).select(
        F.concat(F.lit("G"), F.col("id").cast("string")).alias("id"),
        ((1 + F.col("id") % 40) * 250_000).cast("long").alias("tss"),
        F.struct(
            (1 + F.col("id") % 2).cast("string").alias("chromosome")
        ).alias("genomicLocation"),
    )
    out = flag_trans_qtls(study_locus, study_index, target_index)
    # stringify the 3-state flag so null (gwas) compares stably
    return out.select(
        "studyLocusId",
        F.coalesce(F.col("isTransQtl").cast("string"), F.lit("null")).alias(
            "isTransQtl"
        ),
    )


SQL_TRANS_QTL_FLAG = """
WITH sl AS (
  SELECT DISTINCT
         'L' || CAST(user_id % 10 AS VARCHAR) AS studyLocusId,
         'S' || CAST(user_id % 10 AS VARCHAR) AS studyId,
         CAST(1 + event_id % 2 AS VARCHAR)    AS chromosome,
         CAST((1 + event_id % 40) * 250000 AS BIGINT) AS position
  FROM events
),
studies AS (
  SELECT 'S' || CAST(i AS VARCHAR) AS studyId,
         CASE WHEN i % 2 = 0 THEN 'gwas' ELSE 'eqtl' END AS studyType,
         'G' || CAST(i AS VARCHAR) AS geneId
  FROM range(0, 10) t(i)
),
genes AS (
  SELECT 'G' || CAST(i AS VARCHAR) AS geneId,
         CAST((1 + i % 40) * 250000 AS BIGINT) AS tss,
         CAST(1 + i % 2 AS VARCHAR) AS geneChromosome
  FROM range(0, 10) t(i)
),
tag_flags AS (
  SELECT sl.studyLocusId,
         (sl.chromosome != g.geneChromosome
          OR ABS(g.tss - sl.position) > 5000000) AS isTagTrans
  FROM sl
  JOIN studies s ON sl.studyId = s.studyId AND s.studyType != 'gwas'
  LEFT JOIN genes g ON s.geneId = g.geneId
),
qtl AS (
  SELECT studyLocusId, BOOL_AND(isTagTrans) AS isTransQtl
  FROM tag_flags GROUP BY 1
)
SELECT l.studyLocusId,
       COALESCE(CAST(q.isTransQtl AS VARCHAR), 'null') AS isTransQtl
FROM (SELECT DISTINCT studyLocusId FROM sl) l
LEFT JOIN qtl q ON l.studyLocusId = q.studyLocusId
"""


# -------------------------------------------------------- ancestry weights
_ANCESTRY_LABELS = [
    "European",
    "East Asian",
    "Finnish",
    "African unspecified",
    "Hispanic or Latin American",
    "South Asian",
]

_ANCESTRY_CASE_SQL = """
CASE ancestry
  WHEN 'European' THEN 'nfe'
  WHEN 'East Asian' THEN 'eas'
  WHEN 'Finnish' THEN 'fin'
  WHEN 'African unspecified' THEN 'afr'
  WHEN 'Hispanic or Latin American' THEN 'amr'
  WHEN 'South Asian' THEN 'eas'
END
"""


def q_ancestry_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestry→LD-panel mapping with relative sample sizes, computed
    entirely with row-local higher-order array folds (reference
    aggregate_and_map_ancestries, study_index.py:164-207)."""
    ev = load_table(spark, sf_dir, "events")
    labels = F.array(*[F.lit(x) for x in _ANCESTRY_LABELS])
    studies = (
        ev.select(
            F.concat(F.lit("S"), (F.col("user_id") % 20).cast("string")).alias(
                "studyId"
            ),
            F.element_at(labels, (F.col("event_id") % 6 + 1).cast("int")).alias(
                "ancestry"
            ),
            (100 + F.col("event_id") % 900).cast("double").alias("sampleSize"),
        )
        .groupBy("studyId", "ancestry")
        .agg(F.max("sampleSize").alias("sampleSize"))
        .groupBy("studyId")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ancestry", "sampleSize"))
            ).alias("discoverySamples")
        )
    )
    mapped = studies.select(
        "studyId",
        F.explode(
            aggregate_and_map_ancestries(F.col("discoverySamples"))
        ).alias("pop"),
    )
    return mapped.select(
        "studyId",
        F.col("pop.ldPopulation").alias("ldPopulation"),
        F.round(F.col("pop.relativeSampleSize"), 6).alias("relativeSampleSize"),
    )


SQL_ANCESTRY_WEIGHTS = f"""
WITH samples AS (
  SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS studyId,
         ['European','East Asian','Finnish','African unspecified',
          'Hispanic or Latin American','South Asian'][CAST(event_id % 6 AS INT) + 1] AS ancestry,
         CAST(100 + event_id % 900 AS DOUBLE) AS sampleSize
  FROM events
),
dedup AS (
  SELECT studyId, ancestry, MAX(sampleSize) AS sampleSize
  FROM samples GROUP BY 1, 2
),
mapped AS (
  SELECT studyId, {_ANCESTRY_CASE_SQL.strip()} AS ldPopulation, sampleSize
  FROM dedup
),
pop AS (
  SELECT studyId, ldPopulation, SUM(sampleSize) AS popSize
  FROM mapped GROUP BY 1, 2
)
SELECT studyId, ldPopulation,
       ROUND(popSize / SUM(popSize) OVER (PARTITION BY studyId), 6) AS relativeSampleSize
FROM pop
"""


# ------------------------------------------------- QC maintenance pipeline
def q_qc_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-p-value validation then redundant-top-hit flagging, QC
    arrays compared as sorted pipe-joined strings (reference
    validate_lead_pvalue study_locus.py:337-372 +
    qc_redundant_top_hits_from_PICS study_locus.py:1155-1191)."""
    ev = load_table(spark, sf_dir, "events")
    study_locus = ev.select(
        (F.col("event_id") % 120).cast("int").alias("k")
    ).distinct().select(
        F.concat(F.lit("L"), F.col("k").cast("string")).alias("studyLocusId"),
        F.concat(F.lit("S"), (F.col("k") % 8).cast("string")).alias("studyId"),
        F.when(F.col("k") % 3 == 0, "PICS").otherwise("SuSie").alias(
            "finemappingMethod"
        ),
        F.when(
            F.col("k") % 4 == 0,
            F.array(F.lit("Study locus from curated top hit")),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("qualityControls"),
        (1.0 + (F.col("k") % 9)).cast("float").alias("pValueMantissa"),
        (-3 - (F.col("k") % 10)).cast("int").alias("pValueExponent"),
    )
    out = qc_redundant_top_hits(
        validate_lead_pvalue(study_locus, pvalue_cutoff=1e-8)
    )
    return out.select(
        "studyLocusId",
        F.array_join(F.array_sort(F.col("qualityControls")), "|").alias("qcFlags"),
    )


SQL_QC_MAINTENANCE = """
WITH sl AS (
  SELECT DISTINCT CAST(event_id % 120 AS INT) AS k FROM events
),
base AS (
  SELECT 'L' || CAST(k AS VARCHAR) AS studyLocusId,
         'S' || CAST(k % 8 AS VARCHAR) AS studyId,
         CASE WHEN k % 3 = 0 THEN 'PICS' ELSE 'SuSie' END AS m,
         k % 4 = 0 AS topHit,
         CAST(1.0 + (k % 9) AS FLOAT) AS mant,
         CAST(-3 - (k % 10) AS INT) AS expo
  FROM sl
),
-- p > 1e-8  ⇔  expo > -8 OR (expo = -8 AND mant > 1.0)
flagged AS (
  SELECT *,
         (expo > -8 OR (expo = -8 AND mant > 1.0)) AS subsig
  FROM base
),
study_sumstats AS (
  SELECT studyId, BOOL_OR(NOT topHit) AS hasPicsSumstats
  FROM flagged WHERE m = 'PICS' GROUP BY 1
),
final AS (
  SELECT f.studyLocusId,
         LIST_SORT(
           CASE WHEN f.topHit THEN ['Study locus from curated top hit'] ELSE [] END
           || CASE WHEN f.subsig THEN ['Subsignificant p-value'] ELSE [] END
           || CASE WHEN f.topHit AND COALESCE(s.hasPicsSumstats, FALSE)
                   THEN ['PICS association explained by summary statistics of the same study']
                   ELSE [] END
         ) AS qc
  FROM flagged f LEFT JOIN study_sumstats s ON f.studyId = s.studyId
)
SELECT studyLocusId, COALESCE(ARRAY_TO_STRING(qc, '|'), '') AS qcFlags FROM final
"""


# ------------------------------------------------- study index sumstats QC
def q_study_qc_annotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold per-study sumstat QC metrics into the study index and
    apply the reference's threshold flags (annotate_sumstats_qc,
    study_index.py:495-609). Studies S5..S7 have no sumstats and get
    the not-available flag."""
    from genetics_spark_coloc_spark.operators.study_index_ops import (
        annotate_sumstats_qc,
    )
    from genetics_spark_coloc_spark.queries import _sumstats

    ss = _sumstats(spark, sf_dir)
    metrics = ss.groupBy("studyId").agg(
        F.avg("beta").alias("mean_beta"),
        (F.avg("beta") / 10.0).alias("mean_diff_pz"),
        (F.stddev_samp("beta") / 1000.0).alias("se_diff_pz"),
        (1.0 + F.abs(F.avg("beta")) * 20.0).alias("gc_lambda"),
        F.count(F.lit(1)).cast("double").alias("n_variants"),
    )
    study_index = spark.range(0, 8).select(
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("studyId"),
        F.lit("gwas").alias("studyType"),
    )
    out = annotate_sumstats_qc(
        study_index, metrics, threshold_min_n_variants=1000
    )
    return out.select(
        "studyId",
        "hasSumstats",
        F.array_join(F.array_sort(F.col("qualityControls")), "|").alias("qcFlags"),
    )


SQL_STUDY_QC_ANNOTATION = f"""
WITH {SUMSTATS_SQL.strip()},
metrics AS (
  SELECT studyId,
         CAST(AVG(beta) AS REAL) AS mean_beta,
         CAST(AVG(beta) / 10.0 AS REAL) AS mean_diff_pz,
         CAST(STDDEV_SAMP(beta) / 1000.0 AS REAL) AS se_diff_pz,
         CAST(1.0 + ABS(AVG(beta)) * 20.0 AS REAL) AS gc_lambda,
         CAST(COUNT(*) AS REAL) AS n_variants
  FROM sumstats GROUP BY 1
),
studies AS (
  SELECT 'S' || CAST(i AS VARCHAR) AS studyId FROM range(0, 8) t(i)
),
joined AS (
  SELECT s.studyId, m.studyId IS NOT NULL AS hasSumstats, m.*
  FROM studies s LEFT JOIN metrics m ON s.studyId = m.studyId
),
flags AS (
  SELECT studyId, hasSumstats,
         -- CASE WHEN <null> falls through to ELSE, mirroring Spark's
         -- when(cond) over null metrics exactly
         LIST_SORT(
           CASE WHEN NOT hasSumstats
                THEN ['Harmonized summary statistics are not available or empty'] ELSE [] END
           || CASE WHEN NOT (ABS(mean_beta) <= 0.05)
                THEN ['The mean beta QC check value is not within the expected range'] ELSE [] END
           || CASE WHEN NOT (ABS(mean_diff_pz) <= 0.05 AND se_diff_pz <= 0.05)
                THEN ['The PZ QC check values are not within the expected range'] ELSE [] END
           || CASE WHEN NOT (gc_lambda <= 2.5 AND gc_lambda >= 0.7)
                THEN ['The GC lambda value is not within the expected range'] ELSE [] END
           || CASE WHEN n_variants < 1000
                THEN ['The number of SNPs in the study is below the expected threshold'] ELSE [] END
         ) AS qc
  FROM joined
)
SELECT studyId, hasSumstats, COALESCE(ARRAY_TO_STRING(qc, '|'), '') AS qcFlags
FROM flags
"""


# ---------------------------------------------------------------- max MAF
def q_max_maf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum minor-allele frequency per variant across populations
    (reference max_maf, variant_index.py:205-224) — per-row array
    fold, no shuffle beyond the build."""
    from genetics_spark_coloc_spark.operators.annotation import max_maf

    ev = load_table(spark, sf_dir, "events")
    variants = (
        ev.select((F.col("event_id") % 500).cast("int").alias("v"))
        .distinct()
        .select(
            F.concat(F.lit("1_"), F.col("v").cast("string"), F.lit("_A_G")).alias(
                "variantId"
            ),
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda p: F.struct(
                    F.concat(F.lit("pop"), p.cast("string")).alias("populationName"),
                    (((F.col("v") * 7 + p * 13) % 100) / 100.0).alias(
                        "alleleFrequency"
                    ),
                ),
            ).alias("alleleFrequencies"),
        )
    )
    return variants.select(
        "variantId",
        F.round(max_maf(F.col("alleleFrequencies")), 6).alias("maxMaf"),
    )


SQL_MAX_MAF = """
WITH v AS (
  SELECT DISTINCT CAST(event_id % 500 AS INT) AS v FROM events
),
freqs AS (
  SELECT v, ((v * 7 + CAST(p AS INT) * 13) % 100) / 100.0 AS af
  FROM v CROSS JOIN range(0, 4) t(p)
)
SELECT '1_' || CAST(v AS VARCHAR) || '_A_G' AS variantId,
       ROUND(MAX(CASE WHEN af > 0.5 THEN 1 - af ELSE af END), 6) AS maxMaf
FROM freqs
GROUP BY v
"""


# ------------------------------------------------------- study deconvolution
def q_deconvolute_studies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge duplicate studyIds from two ingestion sources: QC-flag
    union with keep-top-hit cleanup, any-true sumstats flag, sorted
    study-type join, most-granular trait pick (reference
    deconvolute_studies, study_index.py:610-760 — deterministic
    groupBy redesign, no rand() windows)."""
    from genetics_spark_coloc_spark.operators.study_index_ops import (
        deconvolute_studies,
    )

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 30).cast("int").alias("k")).distinct()
    source_a = ks.select(
        F.concat(F.lit("S"), F.col("k").cast("string")).alias("studyId"),
        F.lit("gwas").alias("studyType"),
        F.lit(False).alias("hasSumstats"),
        F.when(
            F.col("k") % 3 == 0,
            F.array(
                F.lit("GWAS Catalog study has not been curated by Open Targets"),
                F.lit("Harmonized summary statistics are not available or empty"),
            ),
        )
        .otherwise(
            F.array(
                F.lit("Harmonized summary statistics are not available or empty")
            )
        )
        .alias("qualityControls"),
        F.concat(F.lit("traitA"), F.col("k").cast("string")).alias(
            "traitFromSource"
        ),
        F.array(F.lit("EFO1"), F.lit("EFO2")).alias("traitFromSourceMappedIds"),
    )
    source_b = ks.filter(F.col("k") % 2 == 0).select(
        F.concat(F.lit("S"), F.col("k").cast("string")).alias("studyId"),
        F.when(F.col("k") % 4 == 0, "gwas").otherwise("eqtl").alias("studyType"),
        F.lit(True).alias("hasSumstats"),
        F.array().cast("array<string>").alias("qualityControls"),
        F.concat(F.lit("traitB"), F.col("k").cast("string")).alias(
            "traitFromSource"
        ),
        F.array(F.lit("EFO1")).alias("traitFromSourceMappedIds"),
    )
    out = deconvolute_studies(source_a.unionByName(source_b))
    return out.select(
        "studyId",
        "hasSumstats",
        "studyType",
        "traitFromSource",
        F.array_join("qualityControls", "|").alias("qcFlags"),
        F.array_join("traitFromSourceMappedIds", "|").alias("mappedIds"),
    )


SQL_DECONVOLUTE_STUDIES = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 30 AS INT) AS k FROM events
),
source_a AS (
  SELECT 'S' || CAST(k AS VARCHAR) AS studyId, k,
         'gwas' AS studyType, FALSE AS hasSumstats,
         CASE WHEN k % 3 = 0
              THEN ['GWAS Catalog study has not been curated by Open Targets',
                    'Harmonized summary statistics are not available or empty']
              ELSE ['Harmonized summary statistics are not available or empty'] END AS qc,
         'traitA' || CAST(k AS VARCHAR) AS trait,
         ['EFO1','EFO2'] AS mapped
  FROM ks
),
source_b AS (
  SELECT 'S' || CAST(k AS VARCHAR) AS studyId, k,
         CASE WHEN k % 4 = 0 THEN 'gwas' ELSE 'eqtl' END AS studyType,
         TRUE AS hasSumstats,
         CAST([] AS VARCHAR[]) AS qc,
         'traitB' || CAST(k AS VARCHAR) AS trait,
         ['EFO1'] AS mapped
  FROM ks WHERE k % 2 = 0
),
unioned AS (
  SELECT * FROM source_a UNION ALL SELECT * FROM source_b
),
cleaned AS (
  SELECT u.studyId, u.studyType, u.hasSumstats, u.trait, u.mapped,
         -- no-curation flag dropped on sumstats-free rows; sumstats-not-available
         -- dropped everywhere when any source of the study has sumstats
         LIST_FILTER(u.qc, x ->
           NOT (NOT u.hasSumstats AND x = 'GWAS Catalog study has not been curated by Open Targets')
           AND NOT (grp.anySumstats AND x = 'Harmonized summary statistics are not available or empty')
         ) AS qc
  FROM unioned u
  JOIN (SELECT studyId, BOOL_OR(hasSumstats) AS anySumstats
        FROM unioned GROUP BY 1) grp USING (studyId)
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY studyId
                            ORDER BY LEN(mapped), mapped, trait) AS rn
  FROM cleaned
)
SELECT studyId,
       BOOL_OR(hasSumstats) AS hasSumstats,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT studyType)), ',') AS studyType,
       MAX(CASE WHEN rn = 1 THEN trait END) AS traitFromSource,
       COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(FLATTEN(LIST(qc)))), '|'), '') AS qcFlags,
       MAX(CASE WHEN rn = 1 THEN ARRAY_TO_STRING(mapped, '|') END) AS mappedIds
FROM ranked
GROUP BY studyId
"""


# ------------------------------------------------ variant effect normalise
_VE_METHODS = [
    "CADD", "GERP", "SIFT", "PolyPhen", "AlphaMissense", "Pangolin",
    "LOFTEE", "LossOfFunctionCuration", "SpliceAI", "VEP", "FoldX",
]
_SIFT_ASSESS = [
    "deleterious", "deleterious_low_confidence",
    "tolerated_low_confidence", "tolerated",
]
_PP_ASSESS = ["benign", "possibly_damaging", "probably_damaging", "unknown"]
_LOF_ASSESS = ["lof", "likely_lof", "uncertain", "likely_not_lof", "not_lof"]


def q_variant_effect_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalise heterogeneous predictor scores onto [-1,1] inside the
    variantEffect array (reference VariantEffectNormaliser,
    variant_index.py:367-717) — per-row transform, zero shuffle."""
    from genetics_spark_coloc_spark.operators.variant_effect import (
        normalise_variant_effect,
    )

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 200).cast("int").alias("k")).distinct()
    methods = F.array(*[F.lit(m) for m in _VE_METHODS])
    sift = F.array(*[F.lit(a) for a in _SIFT_ASSESS])
    pp = F.array(*[F.lit(a) for a in _PP_ASSESS])
    loftee = F.array(F.lit("HC"), F.lit("LC"))
    lof = F.array(*[F.lit(a) for a in _LOF_ASSESS])

    def entry(i):
        m = F.element_at(methods, ((F.col("k") * 3 + i) % 11 + 1).cast("int"))
        raw = ((F.col("k") * 13 + i * 29) % 100) / 100.0
        score = (
            F.when(m == "CADD", raw * 81)
            .when(m == "GERP", raw * 14 - 4)
            .when(m == "FoldX", raw * 4 - 2)
            .when(m == "Pangolin", raw * 2 - 1)
            .otherwise(raw)
        )
        assessment = (
            F.when(m == "SIFT", F.element_at(sift, ((F.col("k") + i) % 4 + 1).cast("int")))
            .when(m == "PolyPhen", F.element_at(pp, ((F.col("k") + i) % 4 + 1).cast("int")))
            .when(m == "LOFTEE", F.element_at(loftee, ((F.col("k") + i) % 2 + 1).cast("int")))
            .when(
                m == "LossOfFunctionCuration",
                F.element_at(lof, ((F.col("k") + i) % 5 + 1).cast("int")),
            )
        )
        return F.struct(
            m.alias("method"),
            assessment.alias("assessment"),
            score.alias("score"),
        )

    variants = ks.select(
        F.concat(F.lit("1_"), F.col("k").cast("string"), F.lit("_A_G")).alias(
            "variantId"
        ),
        F.transform(F.sequence(F.lit(0), F.lit(3)), entry).alias("variantEffect"),
    )
    out = variants.select(
        "variantId",
        F.explode(normalise_variant_effect(F.col("variantEffect"))).alias("ve"),
    )
    return out.select(
        "variantId",
        F.col("ve.method").alias("method"),
        F.round("ve.score", 6).alias("score"),
        F.round("ve.normalisedScore", 6).alias("normalisedScore"),
    )


SQL_VARIANT_EFFECT_NORM = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 200 AS INT) AS k FROM events
),
entries AS (
  SELECT k, CAST(i AS INT) AS i,
         ['CADD','GERP','SIFT','PolyPhen','AlphaMissense','Pangolin',
          'LOFTEE','LossOfFunctionCuration','SpliceAI','VEP','FoldX'][(k * 3 + CAST(i AS INT)) % 11 + 1] AS method,
         ((k * 13 + CAST(i AS INT) * 29) % 100) / 100.0 AS raw
  FROM ks CROSS JOIN range(0, 4) t(i)
),
scored AS (
  SELECT k, i, method,
         CASE WHEN method = 'CADD' THEN raw * 81
              WHEN method = 'GERP' THEN raw * 14 - 4
              WHEN method = 'FoldX' THEN raw * 4 - 2
              WHEN method = 'Pangolin' THEN raw * 2 - 1
              ELSE raw END AS score,
         CASE WHEN method = 'SIFT' THEN
                ['deleterious','deleterious_low_confidence',
                 'tolerated_low_confidence','tolerated'][(k + i) % 4 + 1]
              WHEN method = 'PolyPhen' THEN
                ['benign','possibly_damaging','probably_damaging','unknown'][(k + i) % 4 + 1]
              WHEN method = 'LOFTEE' THEN ['HC','LC'][(k + i) % 2 + 1]
              WHEN method = 'LossOfFunctionCuration' THEN
                ['lof','likely_lof','uncertain','likely_not_lof','not_lof'][(k + i) % 5 + 1]
         END AS assessment
  FROM entries
),
norm AS (
  SELECT k, method, score,
    CASE
      WHEN method = 'LOFTEE' THEN
        CASE WHEN assessment = 'HC' THEN 1.0 WHEN assessment = 'LC' THEN 0.85 END
      WHEN method = 'SIFT' THEN
        CASE WHEN (1 - ROUND(score, 2) >= 0.95) AND assessment = 'deleterious'
               THEN ((1 - score) - 0.95) / (1 - 0.95) * (1 - 0.5) + 0.5
             WHEN (1 - ROUND(score, 2) >= 0.95) AND assessment = 'deleterious_low_confidence'
               THEN ((1 - score) - 0.95) / (1 - 0.95) * (0.5 - 0) + 0
             WHEN (1 - ROUND(score, 2) <= 0.95) AND assessment = 'tolerated_low_confidence'
               THEN ((1 - score) - 0) / (0.95 - 0) * (0.0 - (-0.5)) + (-0.5)
             WHEN (1 - ROUND(score, 2) <= 0.95) AND assessment = 'tolerated'
               THEN ((1 - score) - 0) / (0.95 - 0) * ((-0.5) - (-1)) + (-1)
        END
      WHEN method = 'PolyPhen' THEN
        CASE WHEN assessment = 'unknown' THEN NULL
             WHEN score <= 0.446 THEN (score - 0) / (0.446 - 0) * ((-0.25) - (-1.0)) + (-1.0)
             WHEN score <= 0.908 THEN (score - 0.446) / (0.908 - 0.446) * (0.25 - (-0.25)) + (-0.25)
             WHEN score > 0.908 THEN (score - 0.908) / (1.0 - 0.908) * (1.0 - 0.25) + 0.25
        END
      WHEN method = 'AlphaMissense' THEN
        CASE WHEN score < 0.06 THEN (score - 0) / (0.06 - 0) * ((-0.25) - (-1.0)) + (-1.0)
             WHEN score < 0.77 THEN (score - 0.06) / (0.77 - 0.06) * (0.25 - (-0.25)) + (-0.25)
             WHEN score >= 0.77 THEN (score - 0.77) / (1 - 0.77) * (1 - 0.25) + 0.25
        END
      WHEN method = 'CADD' THEN
        CASE WHEN score <= 10 THEN (score - 0) / (10 - 0) * (0.0 - (-1.0)) + (-1.0)
             WHEN score <= 20 THEN (score - 10) / (20 - 10) * (0.5 - 0.0) + 0.0
             WHEN score <= 30 THEN (score - 20) / (30 - 20) * (0.75 - 0.5) + 0.5
             WHEN score > 30 THEN (score - 30) / (81 - 30) * (1 - 0.75) + 0.75
        END
      WHEN method = 'Pangolin' THEN
        CASE WHEN ABS(score) > 0.14 THEN (ABS(score) - 0.14) / (1 - 0.14) * (1 - 0.5) + 0.5
             WHEN ABS(score) <= 0.14 THEN (ABS(score) - 0) / (0.14 - 0) * (0.5 - 0.0) + 0.0
        END
      WHEN method = 'LossOfFunctionCuration' THEN
        CASE assessment WHEN 'lof' THEN 1.0 WHEN 'likely_lof' THEN 0.5
                        WHEN 'uncertain' THEN 0.0 WHEN 'likely_not_lof' THEN -0.5
                        WHEN 'not_lof' THEN -1.0 END
      WHEN method = 'SpliceAI' THEN score
      WHEN method = 'VEP' THEN score
      WHEN method = 'GERP' THEN
        CASE WHEN score > 6 THEN 1.0
             WHEN score >= 2 THEN (score - 2) / (6 - 2) * (1 - 0.5) + 0.5
             WHEN score >= 0 THEN (score - 0) / (2 - 0) * (0.5 - 0) + 0
             WHEN score >= -3 THEN (score - (-3)) / (0 - (-3)) * (0 - (-1)) + (-1)
             WHEN score < -3 THEN -1.0
        END
      WHEN method = 'FoldX' THEN
        CASE WHEN ABS(score) >= 2 THEN 1.0
             ELSE (ABS(score) - 0.0) / (2.0 - 0.0) * (1.0 - 0.0) + 0.0 END
    END AS normalisedScore
  FROM scored
)
SELECT '1_' || CAST(k AS VARCHAR) || '_A_G' AS variantId,
       method, ROUND(score, 6) AS score,
       ROUND(normalisedScore, 6) AS normalisedScore
FROM norm
"""


# ------------------------------------------------------------------- loftee
def q_loftee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOFTEE pLoF calls per variant→gene with the high-confidence
    flag (reference get_loftee, variant_index.py:341-364)."""
    from genetics_spark_coloc_spark.operators.variant_effect import get_loftee

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 300).cast("int").alias("k")).distinct()
    variants = ks.select(
        F.concat(F.lit("1_"), F.col("k").cast("string"), F.lit("_A_G")).alias(
            "variantId"
        ),
        F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda g: F.struct(
                F.concat(F.lit("G"), ((F.col("k") + g) % 20).cast("string")).alias(
                    "targetId"
                ),
                F.when((F.col("k") + g) % 3 == 0, "HC")
                .when((F.col("k") + g) % 3 == 1, "LC")
                .alias("lofteePrediction"),
            ),
        ).alias("transcriptConsequences"),
    )
    return get_loftee(variants)


SQL_LOFTEE = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 300 AS INT) AS k FROM events
),
tc AS (
  SELECT k,
         'G' || CAST((k + CAST(g AS INT)) % 20 AS VARCHAR) AS targetId,
         CASE WHEN (k + CAST(g AS INT)) % 3 = 0 THEN 'HC'
              WHEN (k + CAST(g AS INT)) % 3 = 1 THEN 'LC' END AS lofteePrediction
  FROM ks CROSS JOIN range(0, 3) t(g)
)
SELECT '1_' || CAST(k AS VARCHAR) || '_A_G' AS variantId,
       targetId, lofteePrediction,
       lofteePrediction = 'HC' AS isHighQualityPlof
FROM tc
WHERE lofteePrediction IS NOT NULL
"""


# -------------------------------------------------------- coloc max per gene
def q_coloc_max_per_gene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongest eCAVIAR colocalisation per (GWAS locus, gene)
    (reference extract_maximum_coloc_probability_per_region_and_gene,
    dataset/colocalisation.py:39-124)."""
    from genetics_spark_coloc_spark.operators.coloc import (
        max_coloc_probability_per_region_and_gene,
    )

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 120).cast("int").alias("k")).distinct()
    colocalisation = ks.select(
        F.concat(F.lit("L"), (F.col("k") % 10).cast("string")).alias(
            "leftStudyLocusId"
        ),
        F.concat(F.lit("R"), F.col("k").cast("string")).alias("rightStudyLocusId"),
        F.when(F.col("k") % 2 == 0, "eCAVIAR").otherwise("Coloc").alias(
            "colocalisationMethod"
        ),
        (F.col("k") / 120.0).alias("clpp"),
        (1.0 - F.col("k") / 120.0).alias("h4"),
    )
    study_locus = (
        ks.select(
            F.concat(F.lit("L"), (F.col("k") % 10).cast("string")).alias(
                "studyLocusId"
            ),
            F.concat(F.lit("GS"), (F.col("k") % 10).cast("string")).alias("studyId"),
        )
        .unionByName(
            ks.select(
                F.concat(F.lit("R"), F.col("k").cast("string")).alias("studyLocusId"),
                F.concat(F.lit("QS"), (F.col("k") % 15).cast("string")).alias(
                    "studyId"
                ),
            )
        )
        .distinct()
    )
    study_index = (
        spark.range(0, 10)
        .select(
            F.concat(F.lit("GS"), F.col("id").cast("string")).alias("studyId"),
            F.lit(None).cast("string").alias("geneId"),
            F.lit("gwas").alias("studyType"),
        )
        .unionByName(
            spark.range(0, 15).select(
                F.concat(F.lit("QS"), F.col("id").cast("string")).alias("studyId"),
                F.concat(F.lit("G"), (F.col("id") % 8).cast("string")).alias("geneId"),
                F.when(F.col("id") % 2 == 0, "eqtl").otherwise("pqtl").alias(
                    "studyType"
                ),
            )
        )
    )
    out = max_coloc_probability_per_region_and_gene(
        colocalisation,
        study_locus,
        study_index,
        filter_by_colocalisation_method="ECaviar",
        filter_by_qtls=["eqtl"],
    )
    return out.select(
        "studyLocusId",
        "geneId",
        "rightStudyLocusId",
        F.round("clpp", 6).alias("clpp"),
    )


SQL_COLOC_MAX_PER_GENE = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 120 AS INT) AS k FROM events
),
coloc AS (
  SELECT 'L' || CAST(k % 10 AS VARCHAR) AS leftStudyLocusId,
         'R' || CAST(k AS VARCHAR) AS rightStudyLocusId,
         CASE WHEN k % 2 = 0 THEN 'eCAVIAR' ELSE 'Coloc' END AS method,
         k / 120.0 AS clpp,
         k % 15 AS rightStudyNum
  FROM ks
),
annotated AS (
  SELECT c.*,
         'G' || CAST(c.rightStudyNum % 8 AS VARCHAR) AS geneId,
         CASE WHEN c.rightStudyNum % 2 = 0 THEN 'eqtl' ELSE 'pqtl' END AS rightType
  FROM coloc c
),
filtered AS (
  SELECT leftStudyLocusId AS studyLocusId, geneId, rightStudyLocusId, clpp
  FROM annotated
  WHERE LOWER(method) = 'ecaviar' AND rightType = 'eqtl'
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY studyLocusId, geneId
                               ORDER BY clpp DESC) AS rn
  FROM filtered
)
SELECT studyLocusId, geneId, rightStudyLocusId, ROUND(clpp, 6) AS clpp
FROM ranked WHERE rn = 1
"""


# -------------------------------------------- GWAS-Catalog assoc harmonise
def q_gwas_assoc_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GWAS-Catalog association effect→beta harmonisation: risk-allele
    strand logic, palindromic drop, CI-text effect typing, OR→ln(OR)
    (reference harmonise_association_effect_to_beta,
    datasource/gwas_catalog/associations.py:953-1085)."""
    from genetics_spark_coloc_spark.sources.gwas_catalog_assoc import (
        harmonise_association_effect_to_beta,
    )

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 100).cast("int").alias("k")).distinct()
    alleles = F.array(F.lit("A"), F.lit("T"), F.lit("G"), F.lit("C"))
    assoc = ks.select(
        F.col("k").alias("assocId"),
        F.concat(
            F.lit("rs"),
            F.col("k").cast("string"),
            F.lit("-"),
            F.element_at(alleles, ((F.col("k") * 7 + 2) % 4 + 1).cast("int")),
        ).alias("STRONGEST SNP-RISK ALLELE"),
        F.element_at(alleles, (F.col("k") % 4 + 1).cast("int")).alias(
            "referenceAllele"
        ),
        F.element_at(alleles, ((F.col("k") * 3 + 1) % 4 + 1).cast("int")).alias(
            "alternateAllele"
        ),
        ((1 + F.col("k") % 30) / 10.0).alias("OR or BETA"),
        F.when(F.col("k") % 3 == 0, "[0.08-0.12] unit increase")
        .when(F.col("k") % 3 == 1, "[0.5-1.5] unit decrease")
        .otherwise("[0.08-0.12]")
        .alias("95% CI (TEXT)"),
    )
    out = harmonise_association_effect_to_beta(assoc)
    return out.select(
        "assocId",
        F.round("beta", 6).alias("beta"),
        F.round("standardError", 6).alias("standardError"),
    )


SQL_GWAS_ASSOC_BETA = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 100 AS INT) AS k FROM events
),
assoc AS (
  SELECT k AS assocId,
         ['A','T','G','C'][(k * 7 + 2) % 4 + 1] AS risk,
         ['A','T','G','C'][k % 4 + 1] AS ref,
         ['A','T','G','C'][(k * 3 + 1) % 4 + 1] AS alt,
         (1 + k % 30) / 10.0 AS effect,
         CASE WHEN k % 3 = 0 THEN '[0.08-0.12] unit increase'
              WHEN k % 3 = 1 THEN '[0.5-1.5] unit decrease'
              ELSE '[0.08-0.12]' END AS ci
  FROM ks
),
flags AS (
  SELECT *,
         REVERSE(TRANSLATE(alt, 'ACTG', 'TGAC')) AS altRevComp,
         REVERSE(TRANSLATE(ref, 'ACTG', 'TGAC')) AS refRevComp,
         CASE WHEN ci LIKE '%increase%' OR ci LIKE '%decrease%'
              THEN 'beta' ELSE 'odds_ratio' END AS effectType,
         (CAST(regexp_extract(ci, '\\[(\\d+\\.*\\d*)-\\d+\\.*\\d*\\]', 1) AS REAL)) AS ciLower,
         (CAST(regexp_extract(ci, '\\[\\d+\\.*\\d*-(\\d+\\.*\\d*)\\]', 1) AS REAL)) AS ciUpper
  FROM assoc
),
typed AS (
  SELECT *,
         ref = altRevComp AS palindromic,
         (risk = ref OR risk = refRevComp) AS flip,
         (ciUpper - ciLower) / 3.92 AS se
  FROM flags
),
effects AS (
  SELECT assocId, effectType, se,
         CASE WHEN effectType = 'beta' AND NOT palindromic THEN
           CASE WHEN (flip AND ci LIKE '%increase%') OR (NOT flip AND ci LIKE '%decrease%')
                THEN -effect ELSE effect END
         END AS effect_beta,
         CASE WHEN effectType = 'odds_ratio' AND NOT palindromic THEN
           CASE WHEN effect = 0 AND flip THEN NULL
                WHEN flip THEN 1 / effect
                ELSE effect END
         END AS effect_or
  FROM typed
)
SELECT assocId,
       ROUND(CASE WHEN effect_beta IS NOT NULL THEN effect_beta
                  WHEN effect_or IS NOT NULL THEN LN(effect_or) END, 6) AS beta,
       ROUND(CASE WHEN effect_beta IS NOT NULL THEN se END, 6) AS standardError
FROM effects
"""


# ----------------------------------------------------------- study splitter
def q_study_splitter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split multi-trait GWAS-Catalog studies into sub-studies with
    resolved traits/EFOs (reference GWASCatalogStudySplitter,
    study_splitter.py:83-138; exact dense-rank count replaces
    approx_count_distinct)."""
    from genetics_spark_coloc_spark.sources.gwas_catalog_assoc import (
        split_multi_trait_studies,
    )

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 90).cast("int").alias("k")).distinct()
    associations = ks.select(
        F.concat(F.lit("GCST"), (F.col("k") % 30).cast("string")).alias("studyId"),
        F.concat_ws(
            "|",
            F.concat(F.lit("trait"), (F.col("k") % 7).cast("string")),
            F.when(F.col("k") % 3 == 0, "no_pvalue_text").otherwise(
                F.concat(F.lit("subset"), (F.col("k") % 3).cast("string"))
            ),
            F.when(
                F.col("k") % 2 == 0,
                F.concat(F.lit("EFO_1/EFO_"), (F.col("k") % 5).cast("string")),
            ),
        ).alias("subStudyDescription"),
    ).distinct()
    studies = spark.range(0, 30).select(
        F.concat(F.lit("GCST"), F.col("id").cast("string")).alias("studyId"),
        F.concat(F.lit("studyTrait"), F.col("id").cast("string")).alias(
            "traitFromSource"
        ),
        F.array(F.concat(F.lit("EFO_S"), F.col("id").cast("string"))).alias(
            "traitFromSourceMappedIds"
        ),
    )
    out = split_multi_trait_studies(studies, associations)
    return out.select(
        "studyId",
        "subStudyDescription",
        "updatedStudyId",
        "traitFromSource",
        F.array_join("traitFromSourceMappedIds", "|").alias("mappedIds"),
    )


SQL_STUDY_SPLITTER = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 90 AS INT) AS k FROM events
),
assoc AS (
  SELECT DISTINCT
         'GCST' || CAST(k % 30 AS VARCHAR) AS studyId,
         'trait' || CAST(k % 7 AS VARCHAR) || '|' ||
         CASE WHEN k % 3 = 0 THEN 'no_pvalue_text'
              ELSE 'subset' || CAST(k % 3 AS VARCHAR) END ||
         CASE WHEN k % 2 = 0 THEN '|EFO_1/EFO_' || CAST(k % 5 AS VARCHAR)
              ELSE '' END AS subStudyDescription
  FROM ks
),
studies AS (
  SELECT 'GCST' || CAST(i AS VARCHAR) AS studyId,
         'studyTrait' || CAST(i AS VARCHAR) AS studyTrait,
         'EFO_S' || CAST(i AS VARCHAR) AS studyEfo
  FROM range(0, 30) t(i)
),
parts AS (
  SELECT a.studyId, a.subStudyDescription,
         s.studyTrait, s.studyEfo,
         string_split(a.subStudyDescription, '|')[1] AS assocTrait,
         string_split(a.subStudyDescription, '|')[2] AS pvText,
         CASE WHEN LEN(string_split(a.subStudyDescription, '|')) >= 3
              THEN string_split(a.subStudyDescription, '|')[3] END AS assocEfo,
         DENSE_RANK() OVER (PARTITION BY a.studyId ORDER BY a.subStudyDescription) AS rnk
  FROM assoc a JOIN studies s ON a.studyId = s.studyId
),
counted AS (
  SELECT p.*, m.n
  FROM parts p
  JOIN (SELECT studyId, MAX(rnk) AS n FROM parts GROUP BY 1) m
    ON p.studyId = m.studyId
)
SELECT studyId, subStudyDescription,
       CASE WHEN n = 1 THEN studyId
            ELSE studyId || '_' || CAST(rnk AS VARCHAR) END AS updatedStudyId,
       CASE WHEN pvText IS NOT NULL AND pvText != 'no_pvalue_text'
              THEN assocTrait || ' [' || pvText || ']'
            WHEN assocTrait IS NOT NULL THEN assocTrait
            ELSE studyTrait END AS traitFromSource,
       COALESCE(
         ARRAY_TO_STRING(string_split(assocEfo, '/'), '|'),
         studyEfo
       ) AS mappedIds
FROM counted
"""


# ------------------------------------------------------- L2G gold standard
def q_l2g_gold_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full L2G gold-standard pipeline: curated positives → TSS-window
    negatives → overlap de-duplication → interaction-confounded
    false-negative removal (reference from_otg_curation,
    dataset/l2g_gold_standard.py:34-64 + datasource/open_targets/
    l2g_gold_standard.py:14-128)."""
    from genetics_spark_coloc_spark.operators.gold_standard import (
        build_gold_standard,
    )

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 80).cast("int").alias("k")).distinct()
    curation = ks.select(
        F.struct(
            F.concat(F.lit("GCST"), (F.col("k") % 10).cast("string")).alias("otg_id")
        ).alias("association_info"),
        F.struct(
            F.concat(F.lit("G"), (F.col("k") % 4).cast("string")).alias("gene_id"),
            F.when(F.col("k") % 3 < 2, "High").otherwise("Low").alias(
                "highest_confidence"
            ),
        ).alias("gold_standard_info"),
        F.struct(
            F.struct(
                F.lit("1").alias("chromosome"),
                (1000 + F.col("k") % 40).cast("string").alias("position"),
            ).alias("locus_GRCh38"),
            F.struct(
                F.lit("A").alias("reference"), F.lit("G").alias("alternative")
            ).alias("alleles"),
        ).alias("sentinel_variant"),
        F.struct(
            F.concat(F.lit("src"), (F.col("k") % 7).cast("string")).alias(
                "set_label"
            )
        ).alias("metadata"),
    )
    variants = (
        ks.select((F.col("k") % 40).cast("int").alias("p"))
        .distinct()
        .select(
            F.concat(
                F.lit("1_"), (1000 + F.col("p")).cast("string"), F.lit("_A_G")
            ).alias("variantId"),
            F.transform(
                F.sequence(F.lit(0), F.lit(2)),
                lambda g: F.struct(
                    F.concat(F.lit("G"), ((F.col("p") + g) % 6).cast("string")).alias(
                        "targetId"
                    ),
                    (((F.col("p") * 7 + g * 13) % 60) * 10000)
                    .cast("long")
                    .alias("distanceFromTss"),
                ),
            ).alias("transcriptConsequences"),
        )
    )
    overlaps = ks.filter(F.col("k") % 4 == 0).select(
        F.md5(
            F.concat_ws(
                "|",
                F.concat(F.lit("GCST"), (F.col("k") % 10).cast("string")),
                F.concat(
                    F.lit("1_"), (1000 + F.col("k") % 40).cast("string"), F.lit("_A_G")
                ),
            )
        ).alias("leftStudyLocusId"),
        F.concat(F.lit("OTHER"), F.col("k").cast("string")).alias(
            "rightStudyLocusId"
        ),
        F.concat(
            F.lit("1_"), (1000 + F.col("k") % 40).cast("string"), F.lit("_A_G")
        ).alias("tagVariantId"),
    )
    interactions = spark.range(0, 6).select(
        F.concat(F.lit("G"), F.col("id").cast("string")).alias("targetA"),
        F.concat(F.lit("G"), ((F.col("id") + 1) % 6).cast("string")).alias("targetB"),
        (0.5 + (F.col("id") % 4) / 10.0).alias("scoring"),
    ).unionByName(
        spark.range(0, 6).select(
            F.concat(F.lit("G"), F.col("id").cast("string")).alias("targetA"),
            F.concat(F.lit("G"), ((F.col("id") + 1) % 6).cast("string")).alias(
                "targetB"
            ),
            (0.3 + (F.col("id") % 4) / 10.0).alias("scoring"),
        )
    )
    out = build_gold_standard(curation, overlaps, variants, interactions)
    return out.select(
        "studyId",
        "variantId",
        "geneId",
        "goldStandardSet",
        F.array_join("sources", "|").alias("sources"),
    )


SQL_L2G_GOLD_STANDARD = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 80 AS INT) AS k FROM events
),
curation AS (
  SELECT k,
         'GCST' || CAST(k % 10 AS VARCHAR) AS studyId,
         'G' || CAST(k % 4 AS VARCHAR) AS geneId,
         CASE WHEN k % 3 < 2 THEN 'High' ELSE 'Low' END AS conf,
         '1_' || CAST(1000 + k % 40 AS VARCHAR) || '_A_G' AS variantId,
         'src' || CAST(k % 7 AS VARCHAR) AS source
  FROM ks
),
positives AS (
  SELECT md5(studyId || '|' || variantId) AS studyLocusId,
         studyId, variantId, geneId,
         LIST_SORT(LIST(DISTINCT source)) AS sources
  FROM curation WHERE conf IN ('High', 'Medium')
  GROUP BY 1, 2, 3, 4
),
dists AS (
  SELECT '1_' || CAST(1000 + p AS VARCHAR) || '_A_G' AS variantId,
         'G' || CAST((p + CAST(g AS INT)) % 6 AS VARCHAR) AS ncGene,
         ((p * 7 + CAST(g AS INT) * 13) % 60) * 10000 AS d
  FROM (SELECT DISTINCT CAST(k % 40 AS INT) AS p FROM ks)
  CROSS JOIN range(0, 3) t(g)
),
expanded AS (
  SELECT p.studyLocusId, p.studyId, p.variantId, p.sources,
         CASE WHEN p.geneId = d.ncGene OR d.ncGene IS NULL
              THEN 'positive' ELSE 'negative' END AS goldStandardSet,
         CASE WHEN p.geneId = d.ncGene OR d.ncGene IS NULL
              THEN p.geneId ELSE d.ncGene END AS geneId
  FROM positives p
  LEFT JOIN (SELECT * FROM dists WHERE d <= 500000) d
    ON p.variantId = d.variantId
),
gene_counts AS (
  SELECT geneId, COUNT(DISTINCT studyLocusId) AS nSl
  FROM expanded GROUP BY 1
),
ovl AS (
  SELECT md5('GCST' || CAST(k % 10 AS VARCHAR) || '|' ||
             '1_' || CAST(1000 + k % 40 AS VARCHAR) || '_A_G') AS leftStudyLocusId,
         '1_' || CAST(1000 + k % 40 AS VARCHAR) || '_A_G' AS tagVariantId
  FROM ks WHERE k % 4 = 0
),
unique_assoc AS (
  SELECT e.*
  FROM expanded e
  JOIN gene_counts gc ON e.geneId = gc.geneId
  LEFT JOIN (SELECT DISTINCT leftStudyLocusId, tagVariantId FROM ovl) o
    ON e.studyLocusId = o.leftStudyLocusId AND e.variantId = o.tagVariantId
  WHERE NOT (gc.nSl > 1 AND o.tagVariantId IS NOT NULL)
),
interactions AS (
  SELECT 'G' || CAST(i AS VARCHAR) AS geneIdA,
         'G' || CAST((i + 1) % 6 AS VARCHAR) AS geneIdB,
         MAX(s) AS score
  FROM (
    SELECT i, 0.5 + (i % 4) / 10.0 AS s FROM range(0, 6) t(i)
    UNION ALL
    SELECT i, 0.3 + (i % 4) / 10.0 FROM range(0, 6) t(i)
  )
  GROUP BY 1, 2
),
squared AS (
  SELECT geneIdA, geneIdB, score FROM interactions
  UNION ALL
  SELECT geneIdB, geneIdA, score FROM interactions
),
strong AS (
  SELECT * FROM squared WHERE score > 0.7
),
joined AS (
  SELECT u.*, s.geneIdB AS interactorGeneId,
         g2.goldStandardSet AS interactorGS
  FROM unique_assoc u
  LEFT JOIN strong s ON u.geneId = s.geneIdA
  LEFT JOIN (SELECT DISTINCT geneId AS igene, goldStandardSet
             FROM unique_assoc) g2
    ON s.geneIdB = g2.igene
)
SELECT DISTINCT studyId, variantId, geneId, goldStandardSet,
       ARRAY_TO_STRING(sources, '|') AS sources
FROM joined
WHERE (geneId != interactorGeneId OR interactorGeneId IS NULL)
  AND ((NOT (goldStandardSet = 'negative') AND interactorGS = 'positive')
       OR interactorGeneId IS NULL)
"""


# --------------------------------------------- GWAS-Catalog top-hit ingestion
def q_gwas_catalog_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed top-hit ingestion (reference
    gwas_catalog_top_hits.py:17-40): study splitter -> association
    studyId adoption + md5 studyLocusId -> ambiguity + TOP_HIT flags
    -> window clumping with non-leads flagged WINDOW_CLUMPED."""
    from genetics_spark_coloc_spark.pipelines import gwas_catalog_top_hits

    ev = load_table(spark, sf_dir, "events")
    ks = ev.select((F.col("event_id") % 180).cast("int").alias("k")).distinct()
    position = (
        F.lit(1000)
        + (F.col("k") / 60).cast("int") * 250
        + (F.col("k") % 7) * 600
    ).cast("int")
    base = ks.select(
        F.concat(F.lit("GCST"), (F.col("k") % 20).cast("string")).alias("studyId"),
        F.concat_ws(
            "|",
            F.concat(F.lit("trait"), (F.col("k") % 5).cast("string")),
            F.concat(F.lit("subset"), (F.col("k") % 2).cast("string")),
            F.concat(F.lit("EFO_1/EFO_"), (F.col("k") % 3).cast("string")),
        ).alias("subStudyDescription"),
        F.lit("1").alias("chromosome"),
        position.alias("position"),
        F.concat(F.lit("1_"), position.cast("string"), F.lit("_A_G")).alias(
            "variantId"
        ),
        (F.lit(1.0) + (F.col("k") % 9)).cast("float").alias("pValueMantissa"),
        (-(F.lit(9) + (F.col("k") % 6))).cast("int").alias("pValueExponent"),
        F.col("k"),
    )
    # planted ambiguity: a second mapping for every 13th association
    # (same variantId within the updated study, weaker mantissa)
    dups = base.filter(F.col("k") % 13 == 0).withColumn(
        "pValueMantissa", (F.col("pValueMantissa") + F.lit(0.5)).cast("float")
    )
    associations = base.unionByName(dups).drop("k")
    studies = spark.range(0, 20).select(
        F.concat(F.lit("GCST"), F.col("id").cast("string")).alias("studyId"),
        F.concat(F.lit("studyTrait"), F.col("id").cast("string")).alias(
            "traitFromSource"
        ),
        F.array(F.concat(F.lit("EFO_S"), F.col("id").cast("string"))).alias(
            "traitFromSourceMappedIds"
        ),
    )
    # distance 5000 > the 4100 max position spread per study, so the
    # greedy walk provably accepts exactly one lead per cluster — the
    # oracle can use the rank-1 closed form instead of DuckDB's
    # recursive CTE, whose threaded execution proved flaky
    _, clumped = gwas_catalog_top_hits(studies, associations, distance=5000)
    return clumped.select(
        "studyId",
        "variantId",
        "chromosome",
        "position",
        F.round("pValueMantissa", 6).alias("pValueMantissa"),
        "pValueExponent",
        "studyLocusId",
        F.array_join(F.array_sort("qualityControls"), ";").alias("qcFlags"),
    )


SQL_GWAS_CATALOG_TOP_HITS = """
WITH ks AS (
  SELECT DISTINCT CAST(event_id % 180 AS INT) AS k FROM events
),
base AS (
  SELECT 'GCST' || CAST(k % 20 AS VARCHAR) AS studyId,
         'trait' || CAST(k % 5 AS VARCHAR) || '|subset' || CAST(k % 2 AS VARCHAR)
           || '|EFO_1/EFO_' || CAST(k % 3 AS VARCHAR) AS subStudyDescription,
         '1' AS chromosome,
         CAST(1000 + (k // 60) * 250 + (k % 7) * 600 AS INT) AS position,
         CAST(1.0 + (k % 9) AS FLOAT) AS pValueMantissa,
         CAST(-(9 + (k % 6)) AS INT) AS pValueExponent,
         k
  FROM ks
),
assoc AS (
  SELECT studyId, subStudyDescription, chromosome, position,
         '1_' || CAST(position AS VARCHAR) || '_A_G' AS variantId,
         pValueMantissa, pValueExponent
  FROM base
  UNION ALL
  SELECT studyId, subStudyDescription, chromosome, position,
         '1_' || CAST(position AS VARCHAR) || '_A_G',
         CAST(pValueMantissa + 0.5 AS FLOAT), pValueExponent
  FROM base WHERE k % 13 = 0
),
ranks AS (
  SELECT studyId, subStudyDescription,
         DENSE_RANK() OVER (PARTITION BY studyId ORDER BY subStudyDescription) AS rnk
  FROM (SELECT DISTINCT studyId, subStudyDescription FROM assoc)
),
mapping AS (
  SELECT r.studyId, r.subStudyDescription,
         CASE WHEN m.n = 1 THEN r.studyId
              ELSE r.studyId || '_' || CAST(r.rnk AS VARCHAR) END AS updatedStudyId
  FROM ranks r
  JOIN (SELECT studyId, MAX(rnk) AS n FROM ranks GROUP BY 1) m
    ON r.studyId = m.studyId
),
upd AS (
  SELECT m.updatedStudyId AS studyId, a.variantId, a.chromosome, a.position,
         a.pValueMantissa, a.pValueExponent
  FROM assoc a
  JOIN mapping m
    ON a.studyId = m.studyId AND a.subStudyDescription = m.subStudyDescription
),
flagged AS (
  SELECT *, COUNT(*) OVER (PARTITION BY studyId, variantId) > 1 AS ambiguous
  FROM upd
),
-- TOTAL window order (position, pValueMantissa, variantId): the
-- planted ambiguous pair DUPLICATES a position, and with ORDER BY
-- position alone the LAG sort and the running-MAX sort may break the
-- tie differently (DuckDB's threaded window execution did exactly
-- that, intermittently splitting the pair across clusters and
-- flipping one WINDOW_CLUMPED flag); (position, pValueMantissa)
-- alone is still not total — rows can tie on both — so variantId
-- (unique within a study) closes the order, matching the Spark twin
-- in clumping.py. cluster_start itself depends only on position
-- VALUES, so the tie-break changes nothing semantically
clustered AS (
  SELECT *,
         MAX(CASE WHEN gap IS NULL OR gap > 5000 THEN position END)
           OVER (PARTITION BY studyId, chromosome
                 ORDER BY position, pValueMantissa, variantId
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_start
  FROM (
    SELECT *, position - LAG(position) OVER (
             PARTITION BY studyId, chromosome
             ORDER BY position, pValueMantissa, variantId) AS gap
    FROM flagged
  )
),
-- every cluster's positions are mutually within the 5000bp window
-- (max per-study spread is 4100 by construction), so the greedy walk
-- accepts exactly the most-significant row: lead <=> rank 1
marked AS (
  SELECT studyId, variantId, chromosome, position,
         pValueMantissa, pValueExponent, ambiguous,
         ROW_NUMBER() OVER (
           PARTITION BY studyId, chromosome, cluster_start
           ORDER BY pValueExponent ASC, pValueMantissa ASC, position ASC) = 1 AS isLead
  FROM clustered
)
SELECT studyId, variantId, chromosome, position,
       ROUND(pValueMantissa, 6) AS pValueMantissa, pValueExponent,
       md5(studyId || '|' || variantId) AS studyLocusId,
       CASE WHEN ambiguous THEN 'Association with ambiguous study;' ELSE '' END
         || CASE WHEN NOT isLead
                 THEN 'Explained by a more significant variant in the same window;'
                 ELSE '' END
         || 'Study locus from curated top hit' AS qcFlags
FROM marked
"""


# ------------------------------------------------ biosample index assembly
def q_biosample_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed biosample index (reference biosample_index.py:9-44):
    Cell Ontology + Uberon + EFO indices (node metadata + per-graph
    ancestor/descendant closures), EFO restricted to terms under
    CL_0000000, merged with first-non-null scalars (reference union
    order: uberon, efo, cell) and distinct-union arrays."""
    from genetics_spark_coloc_spark.operators.ontology import (
        assemble_biosample_index,
    )

    ev = load_table(spark, sf_dir, "events")

    def ks(mod):
        return ev.select(
            (F.col("event_id") % mod).cast("int").alias("k")
        ).distinct()

    arr = lambda c: F.array(c)  # noqa: E731
    s = lambda c: c.cast("string")  # noqa: E731

    cl = ks(25).filter(F.col("k") >= 1)
    cl_nodes = cl.select(
        F.concat(F.lit("CL_"), s(F.col("k"))).alias("biosampleId"),
        F.concat(F.lit("cell "), s(F.col("k"))).alias("biosampleName"),
        F.when(
            F.col("k") % 4 != 0, F.concat(F.lit("cell desc "), s(F.col("k")))
        ).alias("description"),
        F.when(F.col("k") % 3 == 0, arr(F.concat(F.lit("CX:"), s(F.col("k") % 5)))).alias(
            "xrefs"
        ),
        F.when(F.col("k") % 2 == 0, arr(F.concat(F.lit("cell syn "), s(F.col("k"))))).alias(
            "synonyms"
        ),
    ).unionByName(
        spark.createDataFrame(
            [("CL_0000000", "cell root", "root of all cells", None, ["cellula"])],
            "biosampleId string, biosampleName string, description string, "
            "xrefs array<string>, synonyms array<string>",
        )
    )
    cl_edges = cl.select(
        F.concat(F.lit("CL_"), s(F.col("k"))).alias("subject"),
        F.when(
            F.col("k") >= 2, F.concat(F.lit("CL_"), s((F.col("k") / 2).cast("int")))
        )
        .otherwise(F.lit("CL_0000000"))
        .alias("object"),
    )

    ub = ks(40)
    ub_nodes = ub.select(
        F.concat(F.lit("UBERON_"), s(F.col("k"))).alias("biosampleId"),
        F.concat(F.lit("uberon "), s(F.col("k"))).alias("biosampleName"),
        F.when(
            F.col("k") % 3 == 0, F.concat(F.lit("u desc "), s(F.col("k")))
        ).alias("description"),
        F.lit(None).cast("array<string>").alias("xrefs"),
        F.when(F.col("k") % 4 == 0, arr(F.concat(F.lit("u syn "), s(F.col("k"))))).alias(
            "synonyms"
        ),
    )
    ub_edges = ub.filter(F.col("k") >= 1).select(
        F.concat(F.lit("UBERON_"), s(F.col("k"))).alias("subject"),
        F.concat(F.lit("UBERON_"), s((F.col("k") / 2).cast("int"))).alias("object"),
    )

    efo = ks(12)
    efo_nodes = efo.select(
        F.concat(F.lit("EFO_"), s(F.col("k"))).alias("biosampleId"),
        F.concat(F.lit("efo "), s(F.col("k"))).alias("biosampleName"),
        F.when(
            F.col("k") % 2 == 0, F.concat(F.lit("efo desc "), s(F.col("k")))
        ).alias("description"),
        F.when(F.col("k") % 4 == 0, arr(F.concat(F.lit("EX:"), s(F.col("k"))))).alias(
            "xrefs"
        ),
        F.lit(None).cast("array<string>").alias("synonyms"),
    ).unionByName(
        spark.createDataFrame(
            [
                (
                    "UBERON_5",
                    "efo uberon five",
                    "anatomical structure (efo)",
                    None,
                    ["efo u5 syn"],
                )
            ],
            "biosampleId string, biosampleName string, description string, "
            "xrefs array<string>, synonyms array<string>",
        )
    )
    efo_edges = (
        efo.filter(F.col("k") >= 1)
        .select(
            F.concat(F.lit("EFO_"), s(F.col("k"))).alias("subject"),
            F.concat(F.lit("EFO_"), s((F.col("k") / 2).cast("int"))).alias("object"),
        )
        .unionByName(
            spark.createDataFrame(
                [("EFO_0", "CL_0000000"), ("UBERON_5", "EFO_3")],
                "subject string, object string",
            )
        )
    )

    merged = assemble_biosample_index(
        (cl_nodes, cl_edges), (ub_nodes, ub_edges), (efo_nodes, efo_edges)
    )
    return merged.select(
        "biosampleId",
        "biosampleName",
        "description",
        F.array_join("xrefs", "|").alias("xrefsStr"),
        F.array_join("synonyms", "|").alias("synonymsStr"),
        F.array_join("ancestors", "|").alias("ancestorsStr"),
        F.array_join("descendants", "|").alias("descendantsStr"),
    )


SQL_BIOSAMPLE_INDEX = """
WITH RECURSIVE
k25 AS (SELECT DISTINCT CAST(event_id % 25 AS INT) AS k FROM events),
k40 AS (SELECT DISTINCT CAST(event_id % 40 AS INT) AS k FROM events),
k12 AS (SELECT DISTINCT CAST(event_id % 12 AS INT) AS k FROM events),
cl_nodes AS (
  SELECT 'CL_' || CAST(k AS VARCHAR) AS biosampleId,
         'cell ' || CAST(k AS VARCHAR) AS biosampleName,
         CASE WHEN k % 4 != 0 THEN 'cell desc ' || CAST(k AS VARCHAR) END AS description,
         CASE WHEN k % 3 = 0 THEN ['CX:' || CAST(k % 5 AS VARCHAR)] END AS xrefs,
         CASE WHEN k % 2 = 0 THEN ['cell syn ' || CAST(k AS VARCHAR)] END AS synonyms
  FROM k25 WHERE k >= 1
  UNION ALL
  SELECT 'CL_0000000', 'cell root', 'root of all cells', NULL, ['cellula']
),
ub_nodes AS (
  SELECT 'UBERON_' || CAST(k AS VARCHAR) AS biosampleId,
         'uberon ' || CAST(k AS VARCHAR) AS biosampleName,
         CASE WHEN k % 3 = 0 THEN 'u desc ' || CAST(k AS VARCHAR) END AS description,
         CAST(NULL AS VARCHAR[]) AS xrefs,
         CASE WHEN k % 4 = 0 THEN ['u syn ' || CAST(k AS VARCHAR)] END AS synonyms
  FROM k40
),
efo_nodes AS (
  SELECT 'EFO_' || CAST(k AS VARCHAR) AS biosampleId,
         'efo ' || CAST(k AS VARCHAR) AS biosampleName,
         CASE WHEN k % 2 = 0 THEN 'efo desc ' || CAST(k AS VARCHAR) END AS description,
         CASE WHEN k % 4 = 0 THEN ['EX:' || CAST(k AS VARCHAR)] END AS xrefs,
         CAST(NULL AS VARCHAR[]) AS synonyms
  FROM k12
  UNION ALL
  SELECT 'UBERON_5', 'efo uberon five', 'anatomical structure (efo)', NULL, ['efo u5 syn']
),
edges AS (
  SELECT 'cl' AS g, 'CL_' || CAST(k AS VARCHAR) AS s,
         CASE WHEN k >= 2 THEN 'CL_' || CAST(k // 2 AS VARCHAR) ELSE 'CL_0000000' END AS o
  FROM k25 WHERE k >= 1
  UNION ALL
  SELECT 'ub', 'UBERON_' || CAST(k AS VARCHAR), 'UBERON_' || CAST(k // 2 AS VARCHAR)
  FROM k40 WHERE k >= 1
  UNION ALL
  SELECT 'efo', 'EFO_' || CAST(k AS VARCHAR), 'EFO_' || CAST(k // 2 AS VARCHAR)
  FROM k12 WHERE k >= 1
  UNION ALL SELECT 'efo', 'EFO_0', 'CL_0000000'
  UNION ALL SELECT 'efo', 'UBERON_5', 'EFO_3'
),
closure AS (
  SELECT g, s AS node, o AS dest FROM edges
  UNION
  SELECT c.g, c.node, e.o FROM closure c JOIN edges e ON c.g = e.g AND c.dest = e.s
),
anc AS (
  SELECT g, node, list_sort(list(DISTINCT dest)) AS ancestors
  FROM closure GROUP BY g, node
),
descs AS (
  SELECT g, dest AS node, list_sort(list(DISTINCT node)) AS descendants
  FROM closure GROUP BY g, dest
),
idx AS (
  SELECT 0 AS prio, n.*, a.ancestors, d.descendants
  FROM ub_nodes n
  LEFT JOIN anc a ON a.g = 'ub' AND a.node = n.biosampleId
  LEFT JOIN descs d ON d.g = 'ub' AND d.node = n.biosampleId
  UNION ALL
  SELECT 1, n.*, a.ancestors, d.descendants
  FROM efo_nodes n
  LEFT JOIN anc a ON a.g = 'efo' AND a.node = n.biosampleId
  LEFT JOIN descs d ON d.g = 'efo' AND d.node = n.biosampleId
  WHERE list_contains(COALESCE(a.ancestors, []), 'CL_0000000')
  UNION ALL
  SELECT 2, n.*, a.ancestors, d.descendants
  FROM cl_nodes n
  LEFT JOIN anc a ON a.g = 'cl' AND a.node = n.biosampleId
  LEFT JOIN descs d ON d.g = 'cl' AND d.node = n.biosampleId
)
SELECT biosampleId,
       arg_min(biosampleName, prio) FILTER (biosampleName IS NOT NULL) AS biosampleName,
       arg_min(description, prio) FILTER (description IS NOT NULL) AS description,
       COALESCE(ARRAY_TO_STRING(list_sort(list_distinct(flatten(list(COALESCE(xrefs, []))))), '|'), '') AS xrefsStr,
       COALESCE(ARRAY_TO_STRING(list_sort(list_distinct(flatten(list(COALESCE(synonyms, []))))), '|'), '') AS synonymsStr,
       COALESCE(ARRAY_TO_STRING(list_sort(list_distinct(flatten(list(COALESCE(ancestors, []))))), '|'), '') AS ancestorsStr,
       COALESCE(ARRAY_TO_STRING(list_sort(list_distinct(flatten(list(COALESCE(descendants, []))))), '|'), '') AS descendantsStr
FROM idx
GROUP BY biosampleId
"""


STUDY_QUERIES = {
    "credible_set_log10bf": q_credible_set_log10bf,
    "trans_qtl_flag": q_trans_qtl_flag,
    "ancestry_weights": q_ancestry_weights,
    "qc_maintenance": q_qc_maintenance,
    "study_qc_annotation": q_study_qc_annotation,
    "max_maf": q_max_maf,
    "deconvolute_studies": q_deconvolute_studies,
    "variant_effect_norm": q_variant_effect_norm,
    "loftee": q_loftee,
    "coloc_max_per_gene": q_coloc_max_per_gene,
    "gwas_assoc_beta": q_gwas_assoc_beta,
    "study_splitter": q_study_splitter,
    "l2g_gold_standard": q_l2g_gold_standard,
    "gwas_catalog_top_hits": q_gwas_catalog_top_hits,
    "biosample_index": q_biosample_index,
}

STUDY_ORACLES = {
    "credible_set_log10bf": SQL_CREDIBLE_SET_LOG10BF,
    "trans_qtl_flag": SQL_TRANS_QTL_FLAG,
    "ancestry_weights": SQL_ANCESTRY_WEIGHTS,
    "qc_maintenance": SQL_QC_MAINTENANCE,
    "study_qc_annotation": SQL_STUDY_QC_ANNOTATION,
    "max_maf": SQL_MAX_MAF,
    "deconvolute_studies": SQL_DECONVOLUTE_STUDIES,
    "variant_effect_norm": SQL_VARIANT_EFFECT_NORM,
    "loftee": SQL_LOFTEE,
    "coloc_max_per_gene": SQL_COLOC_MAX_PER_GENE,
    "gwas_assoc_beta": SQL_GWAS_ASSOC_BETA,
    "study_splitter": SQL_STUDY_SPLITTER,
    "l2g_gold_standard": SQL_L2G_GOLD_STANDARD,
    "gwas_catalog_top_hits": SQL_GWAS_CATALOG_TOP_HITS,
    "biosample_index": SQL_BIOSAMPLE_INDEX,
}
