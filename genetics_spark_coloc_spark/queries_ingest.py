"""Round-2 ingestion-layer contract queries: FinnGen SuSiE
fine-mapping, GWAS-Catalog study-index parsing, variant→VCF export,
LOF curation, eQTL-Catalogue study typing.

Same parity rules as queries.py: genetics-shaped inputs derived
deterministically from the driver's synthetic tables with arithmetic
both engines evaluate identically; every computed column aliased the
same on both sides; floats rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.sources.finngen_finemapping import (
    CREDSET_LBF_THRESHOLD,
    finngen_finemapping_to_study_locus,
)
from genetics_spark_coloc_spark.sources.tables import load_table

# --------------------------------------------------------------- FinnGen SuSiE


def _susie_wide_snps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw FinnGen-shaped wide SuSiE snp rows derived from lineitem:
    10 alpha/lbf/mean column triples, string-typed numerics as in the
    source TSVs."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey").cast("long")
    ln = F.col("l_linenumber").cast("long")
    pk = F.col("l_partkey").cast("long")
    r = k % 10
    lo = r * 100000 + 1
    pos = k * 10 + ln
    cols = [
        F.concat(F.lit("T"), (k % 5).cast("string")).alias("trait"),
        F.concat(
            F.lit("1:"), lo.cast("string"), F.lit("-"), (lo + 99999).cast("string")
        ).alias("region"),
        F.concat(F.lit("1:"), pos.cast("string"), F.lit(":A:G")).alias("v"),
        F.lit("chr1").alias("chromosome"),
        pos.cast("string").alias("position"),
        (ln % 4).cast("string").alias("cs"),
        F.concat(F.lit("2.5E-"), (5 + k % 10).cast("string")).alias("p"),
        ((1 + pk % 50) / 100.0).cast("string").alias("se"),
        (((pk % 40) + 1) / 100.0).cast("string").alias("maf"),
    ]
    for i in range(1, 11):
        cols.append((((pk * i) % 89) / 100.0).alias(f"alpha{i}"))
        cols.append((((k + i * 3) % 70) / 10.0).alias(f"lbf_variable{i}"))
        cols.append(((((pk + i * 11) % 19) - 9) / 10.0).alias(f"mean{i}"))
    return li.select(*cols)


def _susie_cs_summaries(spark: SparkSession) -> DataFrame:
    """Credible-set summary rows: 10 regions × 3 credible sets."""
    base = spark.range(0, 30)
    r = (F.col("id") / 3).cast("long")
    cs = F.col("id") % 3 + 1
    return base.select(
        F.concat(F.lit("T"), (r % 5).cast("string")).alias("trait"),
        F.concat(
            F.lit("1:"),
            (r * 100000 + 1).cast("string"),
            F.lit("-"),
            (r * 100000 + 100000).cast("string"),
        ).alias("region"),
        cs.cast("string").alias("cs"),
        ((r + cs) / 8.0).alias("cs_log10bf"),
        (0.5 + r / 20.0).alias("cs_avg_r2"),
        (0.3 + cs / 10.0).alias("cs_min_r2"),
    )


def q_finngen_finemapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinnGen SuSiE ingestion end-to-end (reference
    datasource/finngen/finemapping.py:193-533): wide-column →
    per-credible-set selection, LBF-threshold summary filter, max-PIP
    lead, locus aggregation, region span parse, md5 studyLocusId."""
    out = finngen_finemapping_to_study_locus(
        _susie_wide_snps(spark, sf_dir),
        _susie_cs_summaries(spark),
        release_prefix="FINNGEN_R11",
        lbf_threshold=CREDSET_LBF_THRESHOLD,
    )
    return out.select(
        "studyLocusId",
        "studyId",
        "region",
        "credibleSetIndex",
        "variantId",
        "position",
        F.round("beta", 6).alias("beta"),
        "pValueMantissa",
        "pValueExponent",
        F.round("standardError", 6).alias("standardError"),
        F.round("credibleSetlog10BF", 6).alias("credibleSetlog10BF"),
        F.round("purityMeanR2", 6).alias("purityMeanR2"),
        F.round("purityMinR2", 6).alias("purityMinR2"),
        "locusStart",
        "locusEnd",
        F.size("locus").alias("locusSize"),
        F.round(
            F.aggregate(
                "locus", F.lit(0.0), lambda acc, x: acc + x["posteriorProbability"]
            ),
            6,
        ).alias("sumPIP"),
    )


SQL_FINNGEN_FINEMAPPING = f"""
WITH snps AS (
  SELECT 'FINNGEN_R11_T' || CAST(l_orderkey % 5 AS VARCHAR)              AS studyId,
         '1:' || CAST((l_orderkey % 10) * 100000 + 1 AS VARCHAR) || '-'
              || CAST((l_orderkey % 10) * 100000 + 100000 AS VARCHAR)    AS region,
         '1_' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) || '_A_G' AS variantId,
         CAST(l_linenumber % 4 AS INT)                                   AS credibleSetIndex,
         CAST(l_orderkey * 10 + l_linenumber AS INT)                     AS position,
         CAST(2.5 AS REAL)                                               AS pValueMantissa,
         CAST(-(5 + l_orderkey % 10) AS INT)                             AS pValueExponent,
         (1 + l_partkey % 50) / 100.0                                    AS standardError,
         ((l_partkey * (l_linenumber % 4)) % 89) / 100.0                 AS posteriorProbability,
         ((l_orderkey + (l_linenumber % 4) * 3) % 70) / 10.0             AS logBF,
         (((l_partkey + (l_linenumber % 4) * 11) % 19) - 9) / 10.0       AS beta
  FROM lineitem
  WHERE l_linenumber % 4 > 0
),
cs AS (
  SELECT 'FINNGEN_R11_T' || CAST(((id // 3) % 5) AS VARCHAR)             AS studyId,
         '1:' || CAST((id // 3) * 100000 + 1 AS VARCHAR) || '-'
              || CAST((id // 3) * 100000 + 100000 AS VARCHAR)            AS region,
         CAST(id % 3 + 1 AS INT)                                         AS credibleSetIndex,
         ((id // 3) + (id % 3 + 1)) / 8.0                                AS credibleSetlog10BF,
         0.5 + (id // 3) / 20.0                                          AS purityMeanR2,
         0.3 + (id % 3 + 1) / 10.0                                       AS purityMinR2
  FROM range(30) t(id)
  WHERE ((id // 3) + (id % 3 + 1)) / 8.0 > {CREDSET_LBF_THRESHOLD}
     OR id % 3 + 1 = 1
),
j AS (
  SELECT s.*, c.credibleSetlog10BF, c.purityMeanR2, c.purityMinR2
  FROM snps s JOIN cs c USING (studyId, region, credibleSetIndex)
),
leads AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY studyId, region, credibleSetIndex
           ORDER BY posteriorProbability DESC, variantId) AS rn
  FROM j
),
loci AS (
  SELECT studyId, region, credibleSetIndex,
         COUNT(*)                            AS locusSize,
         ROUND(SUM(posteriorProbability), 6) AS sumPIP
  FROM j GROUP BY 1, 2, 3
)
SELECT md5(l.studyId || '|' || l.variantId || '|SuSIE') AS studyLocusId,
       l.studyId,
       l.region,
       l.credibleSetIndex,
       l.variantId,
       l.position,
       ROUND(l.beta, 6)                 AS beta,
       l.pValueMantissa,
       l.pValueExponent,
       ROUND(l.standardError, 6)        AS standardError,
       ROUND(l.credibleSetlog10BF, 6)   AS credibleSetlog10BF,
       ROUND(l.purityMeanR2, 6)         AS purityMeanR2,
       ROUND(l.purityMinR2, 6)          AS purityMinR2,
       CAST((l_split.lo) AS INT)        AS locusStart,
       CAST((l_split.hi) AS INT)        AS locusEnd,
       lo2.locusSize,
       lo2.sumPIP
FROM leads l
CROSS JOIN LATERAL (
  SELECT CAST(split_part(split_part(l.region, ':', 2), '-', 1) AS INT) AS lo,
         CAST(split_part(split_part(l.region, ':', 2), '-', 2) AS INT) AS hi
) l_split
JOIN loci lo2 USING (studyId, region, credibleSetIndex)
WHERE l.rn = 1
"""


# ------------------------------------------------- GWAS-Catalog study index


def q_discovery_sample_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nCases/nControls/nSamples extraction from free-text
    initialSampleSize (reference study_index.py:589-632): split,
    regexp the first integer per segment, keyword attribution, sum."""
    from genetics_spark_coloc_spark.sources.gwas_catalog_study_index import (
        annotate_discovery_sample_sizes,
    )

    orders = load_table(spark, sf_dir, "orders")
    sid = (F.col("o_orderkey") % 50).cast("long")
    studies = orders.select(
        F.concat(F.lit("GCST"), sid.cast("string")).alias("studyId"),
        F.concat(
            (100 + sid * 7).cast("string"),
            F.lit(" European cases, "),
            (200 + sid * 11).cast("string"),
            F.lit(" European controls, "),
            (50 + sid * 3).cast("string"),
            F.lit(" East Asian individuals"),
        ).alias("initialSampleSize"),
    ).distinct()
    return annotate_discovery_sample_sizes(studies).select(
        "studyId", "initialSampleSize", "nCases", "nControls", "nSamples"
    )


SQL_DISCOVERY_SAMPLE_SIZES = """
WITH st AS (
  SELECT DISTINCT
         'GCST' || CAST(o_orderkey % 50 AS VARCHAR) AS studyId,
         CAST(100 + (o_orderkey % 50) * 7 AS VARCHAR)  || ' European cases, ' ||
         CAST(200 + (o_orderkey % 50) * 11 AS VARCHAR) || ' European controls, ' ||
         CAST(50 + (o_orderkey % 50) * 3 AS VARCHAR)   || ' East Asian individuals' AS initialSampleSize
  FROM orders
),
parts AS (
  SELECT studyId, initialSampleSize,
         unnest(regexp_split_to_array(initialSampleSize, ',\\s+')) AS samples
  FROM st
),
sized AS (
  SELECT studyId, initialSampleSize, samples,
         TRY_CAST(regexp_extract(replace(samples, ',', ''), '[0-9]+', 0) AS INT) AS sampleSize
  FROM parts
)
SELECT studyId,
       initialSampleSize,
       CAST(SUM(CASE WHEN samples LIKE '%cases%'    THEN sampleSize ELSE 0 END) AS INT) AS nCases,
       CAST(SUM(CASE WHEN samples LIKE '%controls%' THEN sampleSize ELSE 0 END) AS INT) AS nControls,
       CAST(SUM(sampleSize) AS INT) AS nSamples
FROM sized
GROUP BY studyId, initialSampleSize
"""


def q_ancestry_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-split compound-ancestry parsing
    (reference study_index.py:36-135): each study reports
    ("European, African", X) and ("European", Y); the compound count
    splits evenly, then counts sum per unique label. Output exploded
    to rows for hashing."""
    from genetics_spark_coloc_spark.sources.gwas_catalog_study_index import (
        parse_discovery_samples,
    )

    orders = load_table(spark, sf_dir, "orders")
    sid = (F.col("o_orderkey") % 40).cast("long")
    raw = orders.select(
        F.concat(F.lit("GCST"), sid.cast("string")).alias("studyId"),
        F.array(
            F.struct(
                F.lit("European, African").alias("ancestry"),
                (101 + sid * 13).cast("int").alias("sampleSize"),
            ),
            F.struct(
                F.lit("European").alias("ancestry"),
                (500 + sid * 5).cast("int").alias("sampleSize"),
            ),
        ).alias("discoverySampleSize"),
    ).distinct()
    parsed = raw.select(
        "studyId",
        F.explode(parse_discovery_samples(F.col("discoverySampleSize"))).alias("s"),
    )
    return parsed.select(
        "studyId",
        F.col("s.ancestry").alias("ancestry"),
        F.col("s.sampleSize").alias("sampleSize"),
    )


SQL_ANCESTRY_SPLIT = """
WITH s AS (SELECT DISTINCT o_orderkey % 40 AS sid FROM orders)
SELECT 'GCST' || CAST(sid AS VARCHAR) AS studyId,
       'European' AS ancestry,
       CAST((101 + sid * 13) // 2 + (500 + sid * 5) AS INT) AS sampleSize
FROM s
UNION ALL
SELECT 'GCST' || CAST(sid AS VARCHAR) AS studyId,
       'African' AS ancestry,
       CAST((101 + sid * 13) // 2 AS INT) AS sampleSize
FROM s
"""


# ------------------------------------------------- Open-Targets variant exports


def q_variant_to_vcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant rows → VCF frame (reference open_targets/
    variants.py:67-136): explode top-level + locus variantIds, split
    chrom_pos_ref_alt, ACGT-only filter, distinct."""
    from genetics_spark_coloc_spark.sources.open_targets import variants_to_vcf

    part = load_table(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("long")
    alt = F.element_at(
        F.array(F.lit("G"), F.lit("T"), F.lit("C"), F.lit("N")),
        (pk % 4 + 1).cast("int"),
    )
    variants = part.select(
        F.concat(
            (1 + pk % 3).cast("string"),
            F.lit("_"),
            (1000 + pk % 5000).cast("string"),
            F.lit("_A_"),
            alt,
        ).alias("variantId"),
        F.when(pk % 5 == 0, F.concat(F.lit("rs"), (pk % 1000).cast("string"))).alias(
            "variantRsId"
        ),
        F.array(
            F.struct(
                F.concat(
                    F.lit("2_"), (50 + pk % 100).cast("string"), F.lit("_G_C")
                ).alias("variantId")
            )
        ).alias("locus"),
    )
    return variants_to_vcf(variants)


SQL_VARIANT_TO_VCF = """
WITH ids AS (
  SELECT CAST(1 + p_partkey % 3 AS VARCHAR) || '_' || CAST(1000 + p_partkey % 5000 AS VARCHAR)
           || '_A_' || (['G','T','C','N'])[CAST(p_partkey % 4 AS INT) + 1] AS vid,
         CASE WHEN p_partkey % 5 = 0 THEN 'rs' || CAST(p_partkey % 1000 AS VARCHAR) END AS rsid
  FROM part
  UNION ALL
  SELECT '2_' || CAST(50 + p_partkey % 100 AS VARCHAR) || '_G_C' AS vid,
         CASE WHEN p_partkey % 5 = 0 THEN 'rs' || CAST(p_partkey % 1000 AS VARCHAR) END AS rsid
  FROM part
),
rows_ AS (
  SELECT DISTINCT
         COALESCE(split_part(vid, '_', 1), '.')      AS "#CHROM",
         TRY_CAST(split_part(vid, '_', 2) AS INT)    AS POS,
         COALESCE(rsid, '.')                         AS ID,
         COALESCE(split_part(vid, '_', 3), '.')      AS REF,
         COALESCE(split_part(vid, '_', 4), '.')      AS ALT,
         '.' AS QUAL, '.' AS FILTER, '.' AS INFO
  FROM ids
)
SELECT * FROM rows_
WHERE "#CHROM" != '.' AND POS IS NOT NULL
  AND regexp_full_match(REF, '[GCTA.]*')
  AND regexp_full_match(ALT, '[GCTA.]*')
"""


def q_lof_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LoF curation ingestion (reference open_targets/
    lof_curation.py:60-98): GRCh38 chrom/pos + GRCh37 ref/alt compose
    the id; verdicts map to ordinal normalised scores and text
    descriptions."""
    from genetics_spark_coloc_spark.sources.open_targets import (
        lof_curation_to_variant_index,
    )

    part = load_table(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("long")
    verdict = F.element_at(
        F.array(
            F.lit("lof"),
            F.lit("likely_lof"),
            F.lit("uncertain"),
            F.lit("likely_not_lof"),
            F.lit("not_lof"),
        ),
        (pk % 5 + 1).cast("int"),
    )
    lof = part.select(
        F.concat(
            (1 + pk % 3).cast("string"),
            F.lit("-"),
            (100 + pk % 1000).cast("string"),
            F.lit("-A-G"),
        ).alias("variantIdGrch37"),
        F.concat(
            (1 + pk % 3).cast("string"),
            F.lit("-"),
            (110 + pk % 1000).cast("string"),
            F.lit("-A-G"),
        ).alias("variantIdGrch38"),
        verdict.alias("verdict"),
    )
    out = lof_curation_to_variant_index(lof)
    eff = F.col("variantEffect").getItem(0)
    return out.select(
        "variantId",
        "chromosome",
        "position",
        "referenceAllele",
        "alternateAllele",
        eff["assessment"].alias("assessment"),
        eff["normalisedScore"].alias("normalisedScore"),
        "variantDescription",
    )


SQL_LOF_CURATION = """
SELECT CAST(1 + p_partkey % 3 AS VARCHAR) || '_' || CAST(110 + p_partkey % 1000 AS VARCHAR) || '_A_G' AS variantId,
       CAST(1 + p_partkey % 3 AS VARCHAR)   AS chromosome,
       CAST(110 + p_partkey % 1000 AS INT)  AS position,
       'A' AS referenceAllele,
       'G' AS alternateAllele,
       (['lof','likely_lof','uncertain','likely_not_lof','not_lof'])[CAST(p_partkey % 5 AS INT) + 1] AS assessment,
       ([1.0, 0.5, 0.0, -0.5, -1.0])[CAST(p_partkey % 5 AS INT) + 1] AS normalisedScore,
       (['Assessed to cause LoF','Suspected to cause LoF','Uncertain LoF assessment',
         'Suspected not to cause LoF','Assessed not to cause LoF'])[CAST(p_partkey % 5 AS INT) + 1]
         || ' by OTAR2075 variant curation effort.' AS variantDescription
FROM part
"""


# ---------------------------------------------------- ontology closure


def q_ontology_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed transitive closure over an is_a forest (reference
    biosample_ontologies/utils.py:44-75 — driver BFS UDF; here
    log-depth path-doubling joins). Forest: supplier s → parent s//2."""
    from genetics_spark_coloc_spark.operators.ontology import transitive_closure

    sup = load_table(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey").cast("long")
    edges = sup.filter(sk > 1).select(
        F.concat(F.lit("UBERON_"), sk.cast("string")).alias("subject"),
        F.concat(F.lit("UBERON_"), (sk / 2).cast("long").cast("string")).alias(
            "object"
        ),
    )
    closure = transitive_closure(edges)
    return closure.groupBy("node").agg(
        F.count("*").cast("long").alias("numAncestors"),
        F.min("dest").alias("minAncestor"),
        F.max("dest").alias("maxAncestor"),
    )


SQL_ONTOLOGY_ANCESTORS = """
WITH RECURSIVE edges AS (
  SELECT 'UBERON_' || CAST(s_suppkey AS VARCHAR) AS subject,
         'UBERON_' || CAST(s_suppkey // 2 AS VARCHAR) AS object
  FROM supplier WHERE s_suppkey > 1
),
closure AS (
  SELECT subject AS node, object AS dest FROM edges
  UNION
  SELECT c.node, e.object AS dest
  FROM closure c JOIN edges e ON c.dest = e.subject
)
SELECT node,
       COUNT(*) AS numAncestors,
       MIN(dest) AS minAncestor,
       MAX(dest) AS maxAncestor
FROM closure
GROUP BY node
"""


# ------------------------------------------- L2G → disease-target evidence


def q_disease_target_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2G predictions to evidence rows (reference
    dataset/l2g_prediction.py:105-144): score threshold, credible-set
    and study joins, one row per mapped disease."""
    from genetics_spark_coloc_spark.operators.l2g import to_disease_target_evidence

    cust = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey").cast("long")
    predictions = cust.select(
        F.concat(F.lit("L"), (ck % 200).cast("string")).alias("studyLocusId"),
        F.concat(F.lit("G"), (ck % 30).cast("string")).alias("geneId"),
        ((ck % 100) / 100.0).alias("score"),
    ).distinct()
    study_locus = spark.range(0, 200).select(
        F.concat(F.lit("L"), F.col("id").cast("string")).alias("studyLocusId"),
        F.concat(F.lit("S"), (F.col("id") % 20).cast("string")).alias("studyId"),
    )
    study_index = spark.range(0, 20).select(
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("studyId"),
        F.array(
            F.concat(F.lit("EFO_"), F.col("id").cast("string")),
            F.concat(F.lit("MONDO_"), (F.col("id") % 7).cast("string")),
        ).alias("diseaseIds"),
    )
    return to_disease_target_evidence(
        predictions, study_locus, study_index, l2g_threshold=0.05
    ).select(
        "datatypeId",
        "datasourceId",
        "targetFromSourceId",
        "diseaseFromSourceMappedId",
        F.round("resourceScore", 6).alias("resourceScore"),
        "studyLocusId",
    )


SQL_DISEASE_TARGET_EVIDENCE = """
WITH predictions AS (
  SELECT DISTINCT
         'L' || CAST(c_custkey % 200 AS VARCHAR) AS studyLocusId,
         'G' || CAST(c_custkey % 30 AS VARCHAR)  AS geneId,
         (c_custkey % 100) / 100.0               AS score
  FROM customer
),
sl AS (
  SELECT 'L' || CAST(id AS VARCHAR) AS studyLocusId,
         'S' || CAST(id % 20 AS VARCHAR) AS studyId
  FROM range(200) t(id)
),
si AS (
  SELECT 'S' || CAST(id AS VARCHAR) AS studyId,
         ['EFO_' || CAST(id AS VARCHAR), 'MONDO_' || CAST(id % 7 AS VARCHAR)] AS diseaseIds
  FROM range(20) t(id)
)
SELECT 'genetic_association' AS datatypeId,
       'gwas_credible_sets'  AS datasourceId,
       p.geneId              AS targetFromSourceId,
       unnest(si.diseaseIds) AS diseaseFromSourceMappedId,
       ROUND(p.score, 6)     AS resourceScore,
       p.studyLocusId
FROM predictions p
JOIN sl USING (studyLocusId)
JOIN si USING (studyId)
WHERE p.score >= 0.05
"""


# ----------------------------------------------- per-project study indexes


def q_eqtl_study_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QTL study-type dispatch (reference eqtl_catalogue/
    study_index.py:59-86): quantification-method map + sc prefix for
    single-cell studies."""
    from genetics_spark_coloc_spark.sources.study_indexes import (
        identify_qtl_study_type,
    )

    part = load_table(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("long")
    methods = ["ge", "exon", "tx", "microarray", "leafcutter", "aptamer", "txrev"]
    raw = part.select(
        F.col("p_partkey").alias("datasetId"),
        F.element_at(
            F.array(*[F.lit(m) for m in methods]), (pk % 7 + 1).cast("int")
        ).alias("quantMethod"),
        F.when(pk % 3 == 0, "single-cell").otherwise("bulk").alias("rawStudyType"),
    )
    return raw.select(
        "datasetId",
        "quantMethod",
        "rawStudyType",
        identify_qtl_study_type(F.col("quantMethod"), F.col("rawStudyType")).alias(
            "studyType"
        ),
    )


SQL_EQTL_STUDY_TYPE = """
WITH raw AS (
  SELECT p_partkey AS datasetId,
         (['ge','exon','tx','microarray','leafcutter','aptamer','txrev'])[CAST(p_partkey % 7 AS INT) + 1] AS quantMethod,
         CASE WHEN p_partkey % 3 = 0 THEN 'single-cell' ELSE 'bulk' END AS rawStudyType
  FROM part
)
SELECT datasetId, quantMethod, rawStudyType,
       CASE WHEN rawStudyType = 'single-cell' THEN 'sc' ELSE '' END ||
       CASE quantMethod
         WHEN 'ge' THEN 'eqtl' WHEN 'exon' THEN 'eqtl' WHEN 'tx' THEN 'eqtl'
         WHEN 'microarray' THEN 'eqtl' WHEN 'leafcutter' THEN 'sqtl'
         WHEN 'aptamer' THEN 'pqtl' WHEN 'txrev' THEN 'tuqtl'
       END AS studyType
FROM raw
"""


def q_eqtl_sumstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eQTL-Catalogue sumstats normalisation (reference
    eqtl_catalogue/summary_stats.py:48-93): id composition, p-value
    decomposition, zero-beta and bad-position drops."""
    from genetics_spark_coloc_spark.sources.study_indexes import (
        process_eqtl_sumstats,
    )

    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey").cast("long")
    ln = F.col("l_linenumber").cast("long")
    raw = li.select(
        F.lit("GTEx_V8").alias("project_id"),
        F.concat(F.lit("Adipose_"), (k % 4).cast("string")).alias("qtl_group"),
        F.concat(F.lit("ENSG"), (k % 100).cast("string")).alias("gene_id"),
        (1 + k % 3).cast("string").alias("chromosome"),
        F.when(k % 11 == 0, F.lit(None).cast("string"))
        .otherwise((1000 + k * 7 + ln).cast("string"))
        .alias("position"),
        F.lit("A").alias("ref"),
        F.lit("G").alias("alt"),
        F.concat(F.lit("3.1e-"), (2 + k % 12).cast("string")).alias("pvalue"),
        F.when(k % 13 == 0, F.lit(0.0)).otherwise((ln - 3.5) / 10.0).alias("beta"),
        ((1 + k % 20) / 100.0).alias("se"),
        (((k % 45) + 1) / 100.0).alias("maf"),
    )
    out = process_eqtl_sumstats(raw)
    return out.select(
        "studyId",
        "variantId",
        "chromosome",
        "position",
        "pValueMantissa",
        "pValueExponent",
        F.round("beta", 6).alias("beta"),
        F.round("standardError", 6).alias("standardError"),
        F.round("effectAlleleFrequencyFromSource", 6).alias(
            "effectAlleleFrequencyFromSource"
        ),
    )


SQL_EQTL_SUMSTATS = """
SELECT 'GTEx_V8_Adipose_' || CAST(l_orderkey % 4 AS VARCHAR)
         || '_ENSG' || CAST(l_orderkey % 100 AS VARCHAR)        AS studyId,
       CAST(1 + l_orderkey % 3 AS VARCHAR) || '_'
         || CAST(1000 + l_orderkey * 7 + l_linenumber AS VARCHAR)
         || '_A_G'                                               AS variantId,
       CAST(1 + l_orderkey % 3 AS VARCHAR)                       AS chromosome,
       CAST(1000 + l_orderkey * 7 + l_linenumber AS INT)         AS position,
       CAST(3.1 AS REAL)                                         AS pValueMantissa,
       CAST(-(2 + l_orderkey % 12) AS INT)                       AS pValueExponent,
       ROUND((l_linenumber - 3.5) / 10.0, 6)                     AS beta,
       ROUND((1 + l_orderkey % 20) / 100.0, 6)                   AS standardError,
       ROUND(CAST(((l_orderkey % 45) + 1) / 100.0 AS REAL), 6)   AS effectAlleleFrequencyFromSource
FROM lineitem
WHERE l_orderkey % 11 != 0
  AND l_orderkey % 13 != 0
  AND (l_linenumber - 3.5) / 10.0 != 0
"""


def q_finngen_efo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-study EFO mapping aggregation (reference finngen/
    study_index.py:82-125): release-filtered curation join, mapped
    ids collected per study (sorted here; reference order is
    join-order-dependent)."""
    from genetics_spark_coloc_spark.sources.study_indexes import join_efo_mapping

    nat = load_table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey").cast("long")
    studies = nat.select(
        F.concat(F.lit("FINNGEN_R11_PHENO"), nk.cast("string")).alias("studyId"),
        F.concat(F.lit("trait"), (nk % 12).cast("string")).alias("traitFromSource"),
    )
    efo = spark.range(0, 16).select(
        F.lit("FinnGen_r11_cohort").alias("STUDY"),
        F.concat(F.lit("trait"), (F.col("id") % 8).cast("string")).alias(
            "PROPERTY_VALUE"
        ),
        F.concat(
            F.lit("http://purl.obolibrary.org/obo/EFO_"), F.col("id").cast("string")
        ).alias("SEMANTIC_TAG"),
    )
    out = join_efo_mapping(studies, efo, "R11")
    return out.select(
        "studyId",
        "traitFromSource",
        F.array_join(F.col("traitFromSourceMappedIds"), "|").alias("mappedIds"),
    )


SQL_FINNGEN_EFO_JOIN = """
WITH studies AS (
  SELECT 'FINNGEN_R11_PHENO' || CAST(n_nationkey AS VARCHAR) AS studyId,
         'trait' || CAST(n_nationkey % 12 AS VARCHAR)        AS traitFromSource
  FROM nation
),
efo AS (
  SELECT 'trait' || CAST(id % 8 AS VARCHAR) AS traitFromSource,
         'EFO_' || CAST(id AS VARCHAR)      AS traitFromSourceMappedId
  FROM range(16) t(id)
)
SELECT s.studyId,
       s.traitFromSource,
       COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST(e.traitFromSourceMappedId)
                  FILTER (e.traitFromSourceMappedId IS NOT NULL)), '|'), '') AS mappedIds
FROM studies s LEFT JOIN efo e USING (traitFromSource)
GROUP BY s.studyId, s.traitFromSource
"""


def q_ukbiobank_study_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UKBiobank manifest parsing (reference ukbiobank/
    study_index.py:35-110): SAIGE/NEALE constants and
    "category: name" → "Name | category" trait flips."""
    from genetics_spark_coloc_spark.sources.study_indexes import (
        ukbiobank_study_index,
    )

    cust = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey").cast("long")
    manifest = cust.select(
        F.when(ck % 2 == 0, F.concat(F.lit("SAIGE_"), ck.cast("string")))
        .otherwise(F.concat(F.lit("NEALE2_"), ck.cast("string")))
        .alias("code"),
        F.when(
            ck % 3 == 0,
            F.concat(F.lit("cancer: carcinoma"), (ck % 5).cast("string")),
        )
        .otherwise(F.concat(F.lit("height"), (ck % 5).cast("string")))
        .alias("trait"),
        (10000 + ck % 90000).alias("n_total"),
        (ck % 5000).alias("n_cases"),
        F.concat(F.lit("gs://ukb/"), ck.cast("string")).alias("in_path"),
    )
    out = ukbiobank_study_index(manifest)
    return out.select(
        "studyId",
        "traitFromSource",
        F.coalesce(F.col("pubmedId"), F.lit("")).alias("pubmedId"),
        "publicationDate",
        "nCases",
        "initialSampleSize",
        "summarystatsLocation",
    )


SQL_UKBIOBANK_STUDY_INDEX = """
WITH manifest AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN 'SAIGE_' ELSE 'NEALE2_' END
           || CAST(c_custkey AS VARCHAR) AS code,
         CASE WHEN c_custkey % 3 = 0
              THEN 'cancer: carcinoma' || CAST(c_custkey % 5 AS VARCHAR)
              ELSE 'height' || CAST(c_custkey % 5 AS VARCHAR) END AS trait,
         10000 + c_custkey % 90000 AS n_total,
         c_custkey % 5000          AS n_cases,
         'gs://ukb/' || CAST(c_custkey AS VARCHAR) AS in_path
  FROM customer
)
SELECT code AS studyId,
       CASE WHEN trait LIKE '%:%'
            THEN upper(substr(split_part(trait, ': ', 2), 1, 1))
                   || substr(split_part(trait, ': ', 2), 2)
                   || ' | ' || lower(split_part(trait, ': ', 1))
            ELSE trait END AS traitFromSource,
       CASE WHEN code LIKE 'SAIGE_%' THEN '30104761' ELSE '' END AS pubmedId,
       CASE WHEN code LIKE 'NEALE2_%' THEN '2018-08-01' ELSE '2018-10-24' END AS publicationDate,
       CAST(n_cases AS INT)        AS nCases,
       CAST(n_total AS VARCHAR)    AS initialSampleSize,
       in_path                     AS summarystatsLocation
FROM manifest
"""


# ----------------------------------------------- eQTL-Catalogue SuSiE


def q_eqtl_finemapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eQTL-Catalogue SuSiE ingestion (reference eqtl_catalogue/
    finemapping.py:121-262): lbf × credible-set × metadata join,
    per-credible-set LBF selection, lead + locus + whole-set log10BF."""
    from genetics_spark_coloc_spark.sources.eqtl_finemapping import (
        eqtl_susie_to_study_locus,
        parse_eqtl_susie_results,
    )

    # (l_orderkey, l_linenumber) is not unique in the synthetic
    # lineitem; dedupe so the lbf×credible-set join stays 1:1
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.min("l_partkey").alias("l_partkey"))
        # both raw frames (credible sets + wide LBFs) derive from this
        # deduped relation; truncate the lineage so the dedup shuffle
        # over the biggest table runs once, not once per frame
        .localCheckpoint(eager=False)
    )
    k = F.col("l_orderkey").cast("long")
    ln = F.col("l_linenumber").cast("long")
    pk = F.col("l_partkey").cast("long")
    pos = k * 10 + ln
    shared = {
        "dataset_id": F.concat(F.lit("QTD00000"), (k % 4).cast("string")),
        "molecular_trait_id": F.concat(F.lit("ENSG"), (k % 10).cast("string")),
        "region": F.concat(
            F.lit("1:"),
            ((k % 5) * 200000 + 1).cast("string"),
            F.lit("-"),
            ((k % 5) * 200000 + 200000).cast("string"),
        ),
        "variant": F.concat(F.lit("chr1_"), pos.cast("string"), F.lit("_A_G")),
    }
    credible_sets = li.select(
        *[v.alias(n) for n, v in shared.items()],
        F.concat(F.lit("ENSG"), (k % 10).cast("string")).alias("gene_id"),
        (1 + ln % 3).cast("int").alias("credibleSetIndex"),
        (((pk * (1 + ln % 3)) % 89) / 100.0).alias("pip"),
        F.concat(F.lit("2.5e-"), (5 + k % 10).cast("string")).alias("pvalue"),
        ((((pk + ln * 11) % 19) - 9) / 10.0).alias("beta"),
        ((1 + pk % 50) / 100.0).alias("se"),
    )
    lbf_cols = [
        (((k + i * 3) % 70) / 10.0).alias(f"lbf_variable{i}") for i in range(1, 11)
    ]
    lbf = li.select(
        *[v.alias(n) for n, v in shared.items()],
        F.lit("1").alias("chromosome"),
        pos.cast("int").alias("position"),
        *lbf_cols,
    )
    methods = ["ge", "leafcutter", "aptamer", "tx"]
    meta = spark.range(0, 4).select(
        F.concat(F.lit("QTD00000"), F.col("id").cast("string")).alias("dataset_id"),
        F.lit("GTEx").alias("study_label"),
        F.element_at(
            F.array(*[F.lit(m) for m in methods]), (F.col("id") + 1).cast("int")
        ).alias("quant_method"),
        F.lit("adipose").alias("sample_group"),
        F.concat(F.lit("UBERON_"), F.col("id").cast("string")).alias("tissue_id"),
        F.when(F.col("id") == 3, "single-cell").otherwise("bulk").alias("study_type"),
        (100 + F.col("id")).cast("int").alias("sample_size"),
    )
    out = eqtl_susie_to_study_locus(
        parse_eqtl_susie_results(credible_sets, lbf, meta)
    )
    return out.select(
        "studyLocusId",
        "studyId",
        "dataset_id",
        "region",
        "credibleSetIndex",
        "variantId",
        "position",
        F.round("posteriorProbability", 6).alias("posteriorProbability"),
        F.round("beta", 6).alias("beta"),
        F.round("standardError", 6).alias("standardError"),
        "nSamples",
        "studyType",
        "geneId",
        "biosampleFromSourceId",
        F.size("locus").alias("locusSize"),
        F.round("credibleSetlog10BF", 6).alias("credibleSetlog10BF"),
    )


SQL_EQTL_FINEMAPPING = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, MIN(l_partkey) AS l_partkey
  FROM lineitem GROUP BY 1, 2
),
tags AS (
  SELECT 'QTD00000' || CAST(l_orderkey % 4 AS VARCHAR)     AS dataset_id,
         'ENSG' || CAST(l_orderkey % 10 AS VARCHAR)        AS geneId,
         '1:' || CAST((l_orderkey % 5) * 200000 + 1 AS VARCHAR) || '-'
              || CAST((l_orderkey % 5) * 200000 + 200000 AS VARCHAR) AS region,
         '1_' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) || '_A_G' AS variantId,
         CAST(l_orderkey * 10 + l_linenumber AS INT)       AS position,
         CAST(1 + l_linenumber % 3 AS INT)                 AS credibleSetIndex,
         ((l_partkey * (1 + l_linenumber % 3)) % 89) / 100.0 AS posteriorProbability,
         (((l_partkey + l_linenumber * 11) % 19) - 9) / 10.0 AS beta,
         (1 + l_partkey % 50) / 100.0                      AS standardError,
         ((l_orderkey + (1 + l_linenumber % 3) * 3) % 70) / 10.0 AS logBF
  FROM li
),
meta AS (
  SELECT 'QTD00000' || CAST(id AS VARCHAR) AS dataset_id,
         (['ge','leafcutter','aptamer','tx'])[CAST(id AS INT) + 1] AS quant_method,
         'UBERON_' || CAST(id AS VARCHAR)  AS tissue_id,
         CASE WHEN id = 3 THEN 'single-cell' ELSE 'bulk' END AS study_type,
         CAST(100 + id AS INT)             AS sample_size
  FROM range(4) t(id)
),
j AS (
  SELECT t.*, m.quant_method, m.tissue_id, m.study_type, m.sample_size,
         lower('GTEx_' || m.quant_method || '_adipose_' || t.geneId) AS studyId,
         CASE WHEN m.study_type = 'single-cell' THEN 'sc' ELSE '' END ||
         CASE m.quant_method
           WHEN 'ge' THEN 'eqtl' WHEN 'leafcutter' THEN 'sqtl'
           WHEN 'aptamer' THEN 'pqtl' WHEN 'tx' THEN 'eqtl'
         END AS studyType
  FROM tags t JOIN meta m USING (dataset_id)
),
leads AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY dataset_id, geneId, region, credibleSetIndex
           ORDER BY posteriorProbability DESC, variantId) AS rn
  FROM j
),
loci AS (
  SELECT dataset_id, geneId, region, credibleSetIndex,
         COUNT(*) AS locusSize,
         MAX(logBF) + LN(SUM(EXP(logBF - mx))) AS lse
  FROM (SELECT *, MAX(logBF) OVER (
          PARTITION BY dataset_id, geneId, region, credibleSetIndex) AS mx FROM j)
  GROUP BY 1, 2, 3, 4, mx
)
SELECT md5(l.studyId || '|' || l.variantId || '|SuSIE') AS studyLocusId,
       l.studyId,
       l.dataset_id,
       l.region,
       l.credibleSetIndex,
       l.variantId,
       l.position,
       ROUND(l.posteriorProbability, 6) AS posteriorProbability,
       ROUND(l.beta, 6)                 AS beta,
       ROUND(l.standardError, 6)        AS standardError,
       l.sample_size                    AS nSamples,
       l.studyType,
       l.geneId,
       l.tissue_id                      AS biosampleFromSourceId,
       lo.locusSize,
       ROUND(lo.lse * 0.43429448190325176, 6) AS credibleSetlog10BF
FROM leads l
JOIN loci lo USING (dataset_id, geneId, region, credibleSetIndex)
WHERE l.rn = 1
"""


# --------------------------------------------------- Pan-UKBB LD toolset


def q_ukbb_allele_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pan-UKBB LD-index allele alignment (reference pan_ukbb_ld/
    ld.py:46-147): direct/flipped/unannotated matches, flipped rows
    rewritten with alleleOrder -1, best row per matrix index."""
    from genetics_spark_coloc_spark.sources.pan_ukbb import align_ld_index_alleles

    part = load_table(spark, sf_dir, "part")
    pk = F.col("p_partkey").cast("long")
    ukbb = part.select(
        (1 + pk % 3).cast("string").alias("chromosome"),
        (1000 + pk).cast("int").alias("position"),
        F.lit("A").alias("referenceAllele"),
        F.lit("G").alias("alternateAllele"),
        pk.alias("idx"),
    )
    # annotation: pk%4==0 direct (A/G), %4==1 flipped (G/A),
    # %4==2 mismatched (C/T → dropped), %4==3 no annotation row
    va = part.filter(pk % 4 < 3).select(
        (1 + pk % 3).cast("string").alias("chromosome"),
        (1000 + pk).cast("int").alias("position"),
        F.when(pk % 4 == 0, "A").when(pk % 4 == 1, "G").otherwise("C").alias(
            "referenceAllele"
        ),
        F.when(pk % 4 == 0, "G").when(pk % 4 == 1, "A").otherwise("T").alias(
            "alternateAllele"
        ),
    )
    return align_ld_index_alleles(ukbb, va).select(
        "variantId", "chromosome", "position", "alleleOrder", "idx"
    )


SQL_UKBB_ALLELE_ALIGN = """
WITH ukbb AS (
  SELECT DISTINCT
         CAST(1 + p_partkey % 3 AS VARCHAR)  AS chromosome,
         CAST(1000 + p_partkey AS INT)       AS position,
         'A' AS referenceAllele, 'G' AS alternateAllele,
         p_partkey AS idx
  FROM part
),
va AS (
  SELECT DISTINCT
         CAST(1 + p_partkey % 3 AS VARCHAR)  AS chromosome,
         CAST(1000 + p_partkey AS INT)       AS position,
         CASE WHEN p_partkey % 4 = 0 THEN 'A' WHEN p_partkey % 4 = 1 THEN 'G' ELSE 'C' END AS vaRef,
         CASE WHEN p_partkey % 4 = 0 THEN 'G' WHEN p_partkey % 4 = 1 THEN 'A' ELSE 'T' END AS vaAlt
  FROM part WHERE p_partkey % 4 < 3
),
aligned AS (
  SELECT u.chromosome, u.position, u.idx,
         CASE WHEN u.referenceAllele = v.vaAlt AND u.alternateAllele = v.vaRef THEN -1 ELSE 1 END AS alleleOrder,
         CASE WHEN u.referenceAllele = v.vaAlt AND u.alternateAllele = v.vaRef THEN v.vaRef ELSE u.referenceAllele END AS newRef,
         CASE WHEN u.referenceAllele = v.vaAlt AND u.alternateAllele = v.vaRef THEN v.vaAlt ELSE u.alternateAllele END AS newAlt
  FROM ukbb u LEFT JOIN va v USING (chromosome, position)
  WHERE (u.referenceAllele = v.vaRef AND u.alternateAllele = v.vaAlt)
     OR (u.referenceAllele = v.vaAlt AND u.alternateAllele = v.vaRef)
     OR v.vaRef IS NULL OR v.vaAlt IS NULL
),
ranked AS (
  SELECT chromosome || '_' || CAST(position AS VARCHAR) || '_' || newRef || '_' || newAlt AS variantId,
         chromosome, position, alleleOrder, idx,
         ROW_NUMBER() OVER (PARTITION BY idx ORDER BY alleleOrder DESC,
           chromosome || '_' || CAST(position AS VARCHAR) || '_' || newRef || '_' || newAlt) AS rn
  FROM aligned
)
SELECT variantId, chromosome, position, alleleOrder, idx
FROM ranked WHERE rn = 1
"""


def q_ld_symmetrise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed symmetric completion of upper-triangular LD entries
    (reference pan_ukbb_ld/ld.py:149-181 — numpy on the driver; here
    relational union + sign join + unit diagonal)."""
    from genetics_spark_coloc_spark.sources.pan_ukbb import symmetrise_ld_entries

    sup = load_table(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey").cast("long")
    n = 40
    half = sup.filter(sk < 200).select(
        (sk % n).alias("i"),
        (sk % n + sk % 7).alias("j"),
        ((sk % 19) / 20.0 - 0.45).alias("r"),
    ).filter(F.col("j") < n).distinct()
    orders = spark.range(0, n).select(
        F.col("id").alias("idx"),
        F.when(F.col("id") % 3 == 0, -1).otherwise(1).alias("alleleOrder"),
    )
    out = symmetrise_ld_entries(half, orders)
    return out.groupBy("i").agg(
        F.count("*").alias("nnz"),
        F.round(F.sum("r"), 6).alias("rowSum"),
    )


SQL_LD_SYMMETRISE = """
WITH half AS (
  SELECT DISTINCT
         s_suppkey % 40                    AS i,
         s_suppkey % 40 + s_suppkey % 7    AS j,
         (s_suppkey % 19) / 20.0 - 0.45    AS r
  FROM supplier
  WHERE s_suppkey < 200 AND s_suppkey % 40 + s_suppkey % 7 < 40
),
orders_ AS (
  SELECT id AS idx, CASE WHEN id % 3 = 0 THEN -1 ELSE 1 END AS alleleOrder
  FROM range(40) t(id)
),
upper_ AS (SELECT i, j, r FROM half WHERE i != j),
full_ AS (
  SELECT u.i, u.j, u.r * oi.alleleOrder * oj.alleleOrder AS r
  FROM (SELECT i, j, r FROM upper_
        UNION ALL
        SELECT j AS i, i AS j, r FROM upper_) u
  JOIN orders_ oi ON u.i = oi.idx
  JOIN orders_ oj ON u.j = oj.idx
  UNION ALL
  SELECT idx AS i, idx AS j, 1.0 AS r FROM orders_
)
SELECT i, COUNT(*) AS nnz, ROUND(SUM(r), 6) AS rowSum
FROM full_ GROUP BY i
"""


# -------------------------------------------------- evaluation metrics


def q_binary_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed classification metrics incl. Mann-Whitney ROC AUC
    with average tie ranks (reference trainer.py:416-424 — sklearn on
    the driver; here one window + one aggregation)."""
    from genetics_spark_coloc_spark.operators.l2g_trainer import (
        evaluate_binary_predictions,
    )

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    scored = orders.select(
        ((k % 1000) / 1000.0).alias("score"),
        (((k % 7) < 3).cast("int") * ((k % 1000) > 300).cast("int")).alias("label"),
    )
    m = evaluate_binary_predictions(scored)
    return m.select(
        "n",
        F.round("accuracy", 6).alias("accuracy"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
        F.round("areaUnderROC", 6).alias("areaUnderROC"),
    )


SQL_BINARY_METRICS = """
WITH scored AS (
  SELECT (o_orderkey % 1000) / 1000.0 AS score,
         CASE WHEN o_orderkey % 7 < 3 AND o_orderkey % 1000 > 300 THEN 1 ELSE 0 END AS label
  FROM orders
),
ranked AS (
  SELECT score, label,
         RANK() OVER (ORDER BY score ASC)
           + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS avgrank,
         CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS pred
  FROM scored
)
SELECT COUNT(*) AS n,
       ROUND(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS accuracy,
       ROUND(SUM(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) * 1.0
             / SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END), 6) AS precision,
       ROUND(SUM(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) * 1.0
             / SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END), 6) AS recall,
       ROUND(2.0 * SUM(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END)
             / (2.0 * SUM(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END)
                + SUM(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END)
                + SUM(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END)), 6) AS f1,
       ROUND((SUM(CASE WHEN label = 1 THEN avgrank END)
              - SUM(label) * (SUM(label) + 1) / 2.0)
             / (SUM(label) * SUM(1 - label)), 6) AS areaUnderROC
FROM ranked
"""


# ----------------------------------------------- credible-set QC step


def q_credible_set_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-fine-mapping QC (reference method/susie_inf.py:471-533):
    decomposed p-value threshold, purity filter, keep-best-log10BF
    dedupe per studyLocusId."""
    from genetics_spark_coloc_spark.operators.credible_sets import credible_set_qc

    cust = load_table(spark, sf_dir, "customer")
    ck = F.col("c_custkey").cast("long")
    cred = cust.select(
        F.concat(F.lit("CS"), (ck % 300).cast("string")).alias("studyLocusId"),
        F.concat(F.lit("1_"), ck.cast("string"), F.lit("_A_G")).alias("variantId"),
        (1.0 + (ck % 90) / 10.0).cast("float").alias("pValueMantissa"),
        (-(ck % 12) - 1).cast("int").alias("pValueExponent"),
        ((ck % 100) / 100.0).alias("purityMinR2"),
        ((ck % 77) / 7.0).alias("credibleSetlog10BF"),
    )
    out = credible_set_qc(cred, p_value_threshold=1e-5, purity_min_r2=0.25)
    return out.select(
        "studyLocusId",
        "variantId",
        "pValueMantissa",
        "pValueExponent",
        F.round("purityMinR2", 6).alias("purityMinR2"),
        F.round("credibleSetlog10BF", 6).alias("credibleSetlog10BF"),
    )


SQL_CREDIBLE_SET_QC = """
WITH cred AS (
  SELECT 'CS' || CAST(c_custkey % 300 AS VARCHAR) AS studyLocusId,
         '1_' || CAST(c_custkey AS VARCHAR) || '_A_G' AS variantId,
         CAST(1.0 + (c_custkey % 90) / 10.0 AS REAL) AS pValueMantissa,
         CAST(-(c_custkey % 12) - 1 AS INT)          AS pValueExponent,
         (c_custkey % 100) / 100.0                   AS purityMinR2,
         (c_custkey % 77) / 7.0                      AS credibleSetlog10BF
  FROM customer
),
filtered AS (
  SELECT * FROM cred
  WHERE (pValueExponent < -5 OR (pValueExponent = -5 AND pValueMantissa <= 1.0))
    AND purityMinR2 >= 0.25
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY studyLocusId
           ORDER BY credibleSetlog10BF DESC, variantId) AS rn
  FROM filtered
)
SELECT studyLocusId, variantId, pValueMantissa, pValueExponent,
       ROUND(purityMinR2, 6) AS purityMinR2,
       ROUND(credibleSetlog10BF, 6) AS credibleSetlog10BF
FROM ranked WHERE rn = 1
"""


INGEST_QUERIES = {
    "finngen_finemapping": q_finngen_finemapping,
    "discovery_sample_sizes": q_discovery_sample_sizes,
    "ancestry_split": q_ancestry_split,
    "variant_to_vcf": q_variant_to_vcf,
    "lof_curation": q_lof_curation,
    "ontology_ancestors": q_ontology_ancestors,
    "disease_target_evidence": q_disease_target_evidence,
    "eqtl_study_type": q_eqtl_study_type,
    "eqtl_sumstats": q_eqtl_sumstats,
    "finngen_efo_join": q_finngen_efo_join,
    "ukbiobank_study_index": q_ukbiobank_study_index,
    "eqtl_finemapping": q_eqtl_finemapping,
    "ukbb_allele_align": q_ukbb_allele_align,
    "ld_symmetrise": q_ld_symmetrise,
    "binary_metrics": q_binary_metrics,
    "credible_set_qc": q_credible_set_qc,
}

INGEST_ORACLES = {
    "finngen_finemapping": SQL_FINNGEN_FINEMAPPING,
    "discovery_sample_sizes": SQL_DISCOVERY_SAMPLE_SIZES,
    "ancestry_split": SQL_ANCESTRY_SPLIT,
    "variant_to_vcf": SQL_VARIANT_TO_VCF,
    "lof_curation": SQL_LOF_CURATION,
    "ontology_ancestors": SQL_ONTOLOGY_ANCESTORS,
    "disease_target_evidence": SQL_DISEASE_TARGET_EVIDENCE,
    "eqtl_study_type": SQL_EQTL_STUDY_TYPE,
    "eqtl_sumstats": SQL_EQTL_SUMSTATS,
    "finngen_efo_join": SQL_FINNGEN_EFO_JOIN,
    "ukbiobank_study_index": SQL_UKBIOBANK_STUDY_INDEX,
    "eqtl_finemapping": SQL_EQTL_FINEMAPPING,
    "ukbb_allele_align": SQL_UKBB_ALLELE_ALIGN,
    "ld_symmetrise": SQL_LD_SYMMETRISE,
    "binary_metrics": SQL_BINARY_METRICS,
    "credible_set_qc": SQL_CREDIBLE_SET_QC,
}
