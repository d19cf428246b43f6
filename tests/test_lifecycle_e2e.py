"""The reference's §3.2 lifecycle as a living test (VERDICT r9 task
#6): sumstats → window clumping → locus statistics → ABF fine-mapping
→ credible sets → find_overlaps → eCAVIAR + COLOC → L2G distance
features, all on the real sf0.001 testdata in ONE Spark session, with
every countable stage asserted against a CLOSED-FORM DuckDB oracle
(no recursive CTE — MEMORY.md records DuckDB list-state recursion
mis-executing under threads).

Why the greedy clump has a closed form here: positions live in
[0, 1e6) and the clump distance is 500k, so three mutually-accepted
leads would need two >=500k gaps = a span >= 1M — impossible. Hence
per (study, chromosome): if the gap clustering yields ONE cluster,
the greedy accepts rank-1 plus (at most) the most significant
candidate >= 500k from it; if it yields several clusters, each
cluster's span is < 500k (spans + the >500k boundary gap must fit in
1M), so each contributes exactly its rank-1.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.operators import coloc as coloc_ops
from genetics_spark_coloc_spark.operators import l2g
from genetics_spark_coloc_spark.operators.overlaps import find_overlaps
from genetics_spark_coloc_spark.pipelines import clump_and_finemap
from genetics_spark_coloc_spark.queries import SUMSTATS_SQL, _sumstats

SF = "/root/testdata/sf0.001"
DIST = 500_000


def _leads_cte(side: str, src: str, exp_cut: int) -> str:
    """Closed-form greedy leads for one sumstats source (see module
    docstring for why <=2 leads per study-chromosome is exact)."""
    return f"""
{side}_sig AS (
  SELECT * FROM {src}
  WHERE pValueExponent < {exp_cut}
     OR (pValueExponent = {exp_cut} AND pValueMantissa <= 1.0)
),
{side}_clustered AS (
  SELECT *,
         MAX(CASE WHEN gap IS NULL OR gap > {DIST} THEN position END)
           OVER (PARTITION BY studyId, chromosome ORDER BY position
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cluster_start
  FROM (
    SELECT *, position - LAG(position) OVER (
             PARTITION BY studyId, chromosome ORDER BY position) AS gap
    FROM {side}_sig
  )
),
{side}_rank AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY studyId, chromosome, cluster_start
           ORDER BY pValueExponent, pValueMantissa, position) AS rn
  FROM {side}_clustered
),
{side}_lead1 AS (
  SELECT studyId, chromosome, position, variantId
  FROM {side}_rank WHERE rn = 1
),
{side}_nclus AS (
  SELECT studyId, chromosome, COUNT(DISTINCT cluster_start) AS nc
  FROM {side}_clustered GROUP BY 1, 2
),
{side}_lead2 AS (
  SELECT studyId, chromosome, position, variantId
  FROM (
    SELECT c.studyId, c.chromosome, c.position, c.variantId,
           ROW_NUMBER() OVER (
             PARTITION BY c.studyId, c.chromosome
             ORDER BY c.pValueExponent, c.pValueMantissa, c.position) AS rn2
    FROM {side}_rank c
    JOIN {side}_lead1 l
      ON l.studyId = c.studyId AND l.chromosome = c.chromosome
    JOIN {side}_nclus n
      ON n.studyId = c.studyId AND n.chromosome = c.chromosome AND n.nc = 1
    WHERE ABS(c.position - l.position) >= {DIST}
  ) WHERE rn2 = 1
),
{side}_leads AS (
  SELECT * FROM {side}_lead1 UNION ALL SELECT * FROM {side}_lead2
),
{side}_tags AS (
  SELECT md5(l.studyId || '|' || l.variantId) AS slid,
         s.chromosome, s.variantId AS tagVariantId,
         s.position AS tagPosition
  FROM {side}_leads l
  JOIN {src} s
    ON s.studyId = l.studyId AND s.chromosome = l.chromosome
   AND ABS(s.position - l.position) <= {DIST}
)"""


ORACLE_SQL = f"""
WITH {SUMSTATS_SQL.strip()},
qtl_sumstats AS (
  SELECT 'Q' || studyId AS studyId, variantId, chromosome, position,
         beta, pValueMantissa, pValueExponent
  FROM sumstats
),
{_leads_cte('g', 'sumstats', -8)},
{_leads_cte('q', 'qtl_sumstats', -5)},
gq_pairs AS (
  SELECT DISTINCT g.slid AS leftId, q.slid AS rightId
  FROM g_tags g
  JOIN q_tags q
    ON q.chromosome = g.chromosome AND q.tagVariantId = g.tagVariantId
),
gg_pairs AS (
  SELECT DISTINCT a.slid AS leftId, b.slid AS rightId
  FROM g_tags a
  JOIN g_tags b
    ON b.chromosome = a.chromosome AND b.tagVariantId = a.tagVariantId
   AND a.slid > b.slid
),
-- synthetic variant->gene map mirrored on the Spark side: gene 1 is
-- always inside the 500k window, gene 2 only when its derived
-- distance lands under it
var_genes AS (
  SELECT tagVariantId AS variantId, 'G' || CAST(pos % 7 AS VARCHAR) AS geneId,
         pos % 400000 AS d
  FROM (SELECT DISTINCT tagVariantId, tagPosition AS pos FROM g_tags)
  UNION ALL
  SELECT tagVariantId, 'G' || CAST(pos % 7 + 1 AS VARCHAR), (pos * 31) % 900000
  FROM (SELECT DISTINCT tagVariantId, tagPosition AS pos FROM g_tags)
),
kept_genes AS (SELECT DISTINCT variantId, geneId FROM var_genes WHERE d <= {DIST}),
mean_pairs AS (
  SELECT DISTINCT t.slid, v.geneId
  FROM g_tags t JOIN kept_genes v ON v.variantId = t.tagVariantId
),
sentinel_pairs AS (
  SELECT DISTINCT md5(l.studyId || '|' || l.variantId) AS slid, v.geneId
  FROM g_leads l JOIN kept_genes v ON v.variantId = l.variantId
)
SELECT
  (SELECT COUNT(*) FROM g_leads)                       AS gwas_loci,
  (SELECT COUNT(*) FROM q_leads)                       AS qtl_loci,
  (SELECT COUNT(*) FROM g_tags)                        AS gwas_tag_rows,
  (SELECT COUNT(*) FROM gq_pairs) + (SELECT COUNT(*) FROM gg_pairs) AS overlap_pairs,
  (SELECT COUNT(*) FROM mean_pairs)                    AS l2g_mean_rows,
  (SELECT COUNT(*) FROM sentinel_pairs)                AS l2g_sentinel_rows
"""


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute("SET threads=1")  # see module docstring / MEMORY.md
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    row = con.execute(ORACLE_SQL).fetchone()
    cols = [d[0] for d in con.description]
    return dict(zip(cols, row))


def test_lifecycle_sumstats_to_coloc_to_l2g(spark, oracle):
    gwas = _sumstats(spark, SF)
    qtl = gwas.withColumn("studyId", F.concat(F.lit("Q"), F.col("studyId")))

    # --- clump + finemap (one lazy plan per side) -------------------
    gwas_loci = clump_and_finemap(gwas, DIST, 1e-8, "gwas")
    qtl_loci = clump_and_finemap(qtl, DIST, 1e-5, "eqtl")
    assert gwas_loci.count() == oracle["gwas_loci"]
    assert qtl_loci.count() == oracle["qtl_loci"]

    # locus arrays carry every sumstat row within the window, and the
    # ABF posteriors are a probability distribution per locus
    tag_rows = gwas_loci.select(F.explode("locus").alias("t"))
    assert tag_rows.count() == oracle["gwas_tag_rows"]
    pp_sums = (
        gwas_loci.select(
            F.aggregate(
                "locus", F.lit(0.0), lambda a, t: a + t["posteriorProbability"]
            ).alias("s")
        )
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in pp_sums)
    # every locus flags a 95% credible set
    assert (
        gwas_loci.filter(
            F.size(F.filter("locus", lambda t: t["is95CredibleSet"])) == 0
        ).count()
        == 0
    )

    # --- overlaps → colocalisation ---------------------------------
    study_locus = gwas_loci.unionByName(qtl_loci)
    overlaps = find_overlaps(study_locus)
    ecav = coloc_ops.ecaviar(overlaps)
    assert ecav.count() == oracle["overlap_pairs"]
    cl = coloc_ops.coloc(overlaps)
    n_coloc = cl.count()
    assert 0 < n_coloc <= oracle["overlap_pairs"]
    # posterior sanity on the computed tables
    bad_clpp = ecav.filter((F.col("clpp") < 0) | (F.col("clpp") > 1 + 1e-9))
    assert bad_clpp.count() == 0
    hsum = cl.select(
        (F.col("h0") + F.col("h1") + F.col("h2") + F.col("h3") + F.col("h4")).alias("s")
    ).collect()
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in hsum)

    # --- L2G distance features over the GWAS credible sets ---------
    variants = (
        gwas_loci.select(F.explode("locus").alias("t"))
        .select(F.col("t.variantId").alias("variantId"))
        .distinct()
        .withColumn("pos", F.split("variantId", "_")[1].cast("int"))
    )
    variant_index = variants.select(
        "variantId",
        F.array(
            F.struct(
                F.concat(F.lit("G"), (F.col("pos") % 7).cast("string")).alias(
                    "targetId"
                ),
                (F.col("pos") % 400000).cast("long").alias("distanceFromTss"),
            ),
            F.struct(
                F.concat(F.lit("G"), (F.col("pos") % 7 + 1).cast("string")).alias(
                    "targetId"
                ),
                ((F.col("pos") * 31) % 900000).cast("long").alias("distanceFromTss"),
            ),
        ).alias("transcriptConsequences"),
    )
    feats = l2g.distance_features(
        gwas_loci, variant_index, "distanceFromTss", genomic_window=DIST
    )
    by_name = {
        r["featureName"]: r["n"]
        for r in feats.groupBy("featureName").agg(F.count("*").alias("n")).collect()
    }
    assert by_name["distanceTssMean"] == oracle["l2g_mean_rows"]
    assert by_name["distanceSentinelTss"] == oracle["l2g_sentinel_rows"]
    # sentinel values are normalized log-distances in [0, 1]
    oob = feats.filter(
        (F.col("featureValue") < 0) | (F.col("featureValue") > 1.0 + 1e-9)
    )
    assert by_name["distanceTssMean"] > 0
    assert oob.filter(F.col("featureName") == "distanceSentinelTss").count() == 0
