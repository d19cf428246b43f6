"""Contract queries: per-source interval parsers + chain liftover.

Synthetic raw inputs derive deterministically from the events table;
every query has a DuckDB oracle (string parsing + joins are fully
SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genetics_spark_coloc_spark.sources.tables import load_table


def _gene_symbols(spark: SparkSession):
    return spark.range(20).select(
        F.concat(F.lit("SYM"), F.col("id").cast("string")).alias("geneSymbol"),
        F.concat(F.lit("ENSG"), F.col("id").cast("string")).alias("geneId"),
        (F.col("id") * 120_000).cast("long").alias("tss"),
        (1 + F.col("id") % 3).cast("string").alias("chromosome"),
    )


GENE_SYMBOLS_SQL = """
genes AS (
  SELECT 'SYM' || CAST(id AS VARCHAR)  AS geneSymbol,
         'ENSG' || CAST(id AS VARCHAR) AS geneId,
         CAST(id * 120000 AS BIGINT)   AS tss,
         CAST(1 + id % 3 AS VARCHAR)   AS chromosome
  FROM range(0, 20) t(id)
)
"""


def q_interval_andersson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Andersson 2014 parser on synthetic FANTOM5-style rows
    (sources/intervals.parse_andersson)."""
    from genetics_spark_coloc_spark.sources.intervals import parse_andersson

    ev = load_table(spark, sf_dir, "events")
    start = (F.col("event_id") * 91) % 2_000_000
    raw = ev.select(
        F.concat(
            F.lit("chr"),
            (1 + F.col("event_id") % 3).cast("string"),
            F.lit(":"),
            start.cast("string"),
            F.lit("-"),
            (start + 400).cast("string"),
            F.lit(";NM_1;SYM"),
            (F.col("event_id") % 20).cast("string"),
            F.lit(";R:0.5;FDR:0"),
        ).alias("name"),
        (F.col("event_id") % 1000).cast("int").alias("score"),
    )
    out = parse_andersson(raw, _gene_symbols(spark))
    return out.select(
        "chromosome",
        "start",
        "end",
        "geneId",
        F.round("resourceScore", 6).alias("resourceScore"),
        "datasourceId",
        "datatypeId",
        "pmid",
        "biofeature",
    )


SQL_INTERVAL_ANDERSSON = f"""
WITH {GENE_SYMBOLS_SQL.strip()},
raw AS (
  SELECT 'chr' || CAST(1 + event_id % 3 AS VARCHAR) || ':' ||
         CAST((event_id * 91) % 2000000 AS VARCHAR) || '-' ||
         CAST((event_id * 91) % 2000000 + 400 AS VARCHAR) ||
         ';NM_1;SYM' || CAST(event_id % 20 AS VARCHAR) || ';R:0.5;FDR:0' AS name,
         CAST(event_id % 1000 AS INT) AS score
  FROM events
),
parsed AS (
  SELECT CAST(1 + event_id % 3 AS VARCHAR) AS chrom,
         CAST((event_id * 91) % 2000000 AS INT) AS start,
         CAST((event_id * 91) % 2000000 + 400 AS INT) AS "end",
         'SYM' || CAST(event_id % 20 AS VARCHAR) AS gene_symbol,
         CAST(CAST(event_id % 1000 AS INT) AS REAL) / 1000 AS score
  FROM events
),
grouped AS (
  SELECT chrom, start, "end", gene_symbol, MAX(score) AS resourceScore
  FROM parsed GROUP BY 1, 2, 3, 4
)
SELECT g.chrom AS chromosome, g.start, g."end", genes.geneId,
       ROUND(g.resourceScore, 6) AS resourceScore,
       'andersson2014' AS datasourceId,
       'fantom5' AS datatypeId,
       '24670763' AS pmid,
       'aggregate' AS biofeature
FROM grouped g
LEFT JOIN genes
  ON g.gene_symbol = genes.geneSymbol
 AND ABS((g.start + g."end") / 2 - genes.tss) <= 2450000
"""


def q_interval_thurman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thurman 2012 parser (chromosome-qualified symbol join) on
    synthetic DHS rows."""
    from genetics_spark_coloc_spark.sources.intervals import parse_thurman

    ev = load_table(spark, sf_dir, "events")
    start = (F.col("event_id") * 67) % 1_000_000
    raw = ev.select(
        F.concat(F.lit("chr"), (1 + F.col("event_id") % 4).cast("string")).alias(
            "chrom"
        ),
        start.cast("int").alias("start"),
        (start + 150).cast("int").alias("end"),
        F.concat(F.lit("SYM"), (F.col("event_id") % 20).cast("string")).alias(
            "gene_name"
        ),
        ((F.col("event_id") % 100) / 100.0).alias("score"),
    )
    out = parse_thurman(raw, _gene_symbols(spark))
    return out.select(
        "chromosome",
        "start",
        "end",
        "geneId",
        F.round("resourceScore", 6).alias("resourceScore"),
        "datasourceId",
        "datatypeId",
        "pmid",
    )


SQL_INTERVAL_THURMAN = f"""
WITH {GENE_SYMBOLS_SQL.strip()},
raw AS (
  SELECT CAST(1 + event_id % 4 AS VARCHAR) AS chrom,
         CAST((event_id * 67) % 1000000 AS INT) AS start,
         CAST((event_id * 67) % 1000000 + 150 AS INT) AS "end",
         'SYM' || CAST(event_id % 20 AS VARCHAR) AS gene_name,
         (event_id % 100) / 100.0 AS score
  FROM events
)
SELECT DISTINCT r.chrom AS chromosome, r.start, r."end", genes.geneId,
       ROUND(r.score, 6) AS resourceScore,
       'thurman2012' AS datasourceId,
       'dhscor' AS datatypeId,
       '22955617' AS pmid
FROM raw r
JOIN genes ON r.gene_name = genes.geneSymbol AND r.chrom = genes.chromosome
"""


def q_interval_jung(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jung 2019 parser (promoter gene-list explode) on synthetic
    PCHi-C rows."""
    from genetics_spark_coloc_spark.sources.intervals import parse_jung

    ev = load_table(spark, sf_dir, "events")
    start = (F.col("event_id") * 43) % 1_000_000
    raw = ev.filter(F.col("event_id") % 3 == 0).select(
        F.concat(
            F.lit("SYM"),
            (F.col("event_id") % 20).cast("string"),
            F.lit(";SYM"),
            ((F.col("event_id") + 7) % 20).cast("string"),
        ).alias("Promoter"),
        F.concat(
            F.lit("chr"),
            (1 + F.col("event_id") % 3).cast("string"),
            F.lit("."),
            start.cast("string"),
            F.lit("."),
            (start + 5000).cast("string"),
        ).alias("Interacting_fragment"),
        F.element_at(
            F.array(F.lit("Liver"), F.lit("Lung"), F.lit("Brain")),
            (F.col("event_id") % 3).cast("int") + 1,
        ).alias("Tissue_type"),
    )
    out = parse_jung(raw, _gene_symbols(spark))
    return out.select(
        "chromosome",
        "start",
        "end",
        "geneId",
        "biofeature",
        F.round("resourceScore", 6).alias("resourceScore"),
        "datasourceId",
        "datatypeId",
        "pmid",
    )


SQL_INTERVAL_JUNG = f"""
WITH {GENE_SYMBOLS_SQL.strip()},
raw AS (
  SELECT 'SYM' || CAST(event_id % 20 AS VARCHAR) || ';SYM' ||
           CAST((event_id + 7) % 20 AS VARCHAR) AS promoter,
         CAST(1 + event_id % 3 AS VARCHAR) AS chrom,
         CAST((event_id * 43) % 1000000 AS INT) AS start,
         CAST((event_id * 43) % 1000000 + 5000 AS INT) AS "end",
         CASE event_id % 3 WHEN 0 THEN 'Liver' WHEN 1 THEN 'Lung' ELSE 'Brain' END AS tissue
  FROM events WHERE event_id % 3 = 0
),
exploded AS (
  SELECT chrom, start, "end", UNNEST(string_split(promoter, ';')) AS gene_name, tissue
  FROM raw
)
SELECT DISTINCT e.chrom AS chromosome, e.start, e."end", genes.geneId,
       e.tissue AS biofeature,
       1.0 AS resourceScore,
       'jung2019' AS datasourceId,
       'pchic' AS datatypeId,
       '31501517' AS pmid
FROM exploded e
JOIN genes ON e.gene_name = genes.geneSymbol
"""


def q_interval_javierre(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Javierre 2016 parser (bait scoring + body-overlap gene link) on
    synthetic PCHi-C rows."""
    from genetics_spark_coloc_spark.sources.intervals import parse_javierre

    ev = load_table(spark, sf_dir, "events")
    ostart = (F.col("event_id") * 57) % 2_000_000
    bstart = (F.col("event_id") * 83) % 2_000_000
    raw = ev.select(
        F.concat(F.lit("chr"), (1 + F.col("event_id") % 3).cast("string")).alias(
            "chrom"
        ),
        ostart.cast("int").alias("start"),
        (ostart + 4000).cast("int").alias("end"),
        F.concat(
            F.lit("chr"),
            (1 + F.col("event_id") % 3).cast("string"),
            F.lit(":"),
            bstart.cast("string"),
            F.lit("-"),
            (bstart + 4000).cast("string"),
            F.lit(","),
            ((F.col("event_id") % 90) / 10.0).cast("string"),
        ).alias("name"),
        F.element_at(
            F.array(F.lit("Mon"), F.lit("Mac"), F.lit("Neu")),
            (F.col("event_id") % 3).cast("int") + 1,
        ).alias("bio_feature"),
    )
    gene_locations = spark.range(20).select(
        (1 + F.col("id") % 3).cast("string").alias("chromosome"),
        (F.col("id") * 97_000).cast("long").alias("start"),
        (F.col("id") * 97_000 + 60_000).cast("long").alias("end"),
        F.concat(F.lit("ENSG"), F.col("id").cast("string")).alias("geneId"),
        (F.col("id") * 97_000 + 1_000).cast("long").alias("tss"),
    )
    out = parse_javierre(raw, gene_locations)
    return out.select(
        "chromosome",
        "start",
        "end",
        F.round("resourceScore", 6).alias("resourceScore"),
        "geneId",
        "biofeature",
        "datasourceId",
        "datatypeId",
        "pmid",
    )


SQL_INTERVAL_JAVIERRE = """
WITH glocs AS (
  SELECT CAST(1 + id % 3 AS VARCHAR) AS chromosome,
         CAST(id * 97000 AS BIGINT) AS gstart,
         CAST(id * 97000 + 60000 AS BIGINT) AS gend,
         'ENSG' || CAST(id AS VARCHAR) AS geneId,
         CAST(id * 97000 + 1000 AS BIGINT) AS tss
  FROM range(0, 20) t(id)
),
raw AS (
  SELECT CAST(1 + event_id % 3 AS VARCHAR) AS chrom,
         CAST((event_id * 57) % 2000000 AS INT) AS start,
         CAST((event_id * 57) % 2000000 + 4000 AS INT) AS "end",
         CAST(1 + event_id % 3 AS VARCHAR) AS name_chr,
         CAST((event_id * 83) % 2000000 AS INT) AS name_start,
         CAST((event_id * 83) % 2000000 + 4000 AS INT) AS name_end,
         CAST(CAST((event_id % 90) / 10.0 AS VARCHAR) AS REAL) AS name_score,
         CASE event_id % 3 WHEN 0 THEN 'Mon' WHEN 1 THEN 'Mac' ELSE 'Neu' END AS bio_feature
  FROM events
),
uniq AS (
  SELECT DISTINCT chrom, start, "end" FROM raw
),
linked AS (
  SELECT u.chrom, u.start, u."end", g.geneId, g.tss
  FROM uniq u
  LEFT JOIN glocs g
    ON u.chrom = g.chromosome
   AND ((u.start >= g.gstart AND u.start <= g.gend)
     OR (u."end" >= g.gstart AND u."end" <= g.gend))
),
joined AS (
  SELECT r.*, l.geneId, l.tss
  FROM raw r
  LEFT JOIN linked l ON r.chrom = l.chrom AND r.start = l.start AND r."end" = l."end"
)
SELECT name_chr AS chromosome, name_start AS start, name_end AS "end",
       ROUND(CAST(MAX(name_score) AS DOUBLE), 6) AS resourceScore,
       geneId,
       bio_feature AS biofeature,
       'javierre2016' AS datasourceId,
       'pchic' AS datatypeId,
       '27863249' AS pmid
FROM joined
WHERE ABS((start + "end") / 2 - tss) <= 2450000
GROUP BY name_chr, name_start, name_end, geneId, bio_feature
"""


def q_liftover_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-file liftover as a broadcast range join
    (operators/liftover.py): intervals lifted through a deterministic
    3-chromosome block table with one negative-strand chain."""
    from genetics_spark_coloc_spark.operators.liftover import liftover_intervals

    # chain: per chrom c in 1..3, blocks [b*10000, b*10000+8000) →
    # shifted by 5000 + b (so block drift is visible); chrom 3 maps
    # negative-strand
    chain = (
        spark.range(3)
        .select((F.col("id") + 1).cast("string").alias("tChrom"), F.col("id").alias("c"))
        .crossJoin(spark.range(50).select(F.col("id").alias("b")))
        .select(
            F.col("c").alias("chainIdx"),
            "tChrom",
            (F.col("b") * 10_000).alias("tStart"),
            (F.col("b") * 10_000 + 8_000).alias("tEnd"),
            F.col("tChrom").alias("qChrom"),
            F.when(F.col("c") < 2, F.col("b") * 10_000 + 5_000 + F.col("b"))
            .otherwise(F.col("b") * 10_000)
            .alias("qStart"),
            F.when(F.col("c") < 2, F.lit("+")).otherwise(F.lit("-")).alias("qStrand"),
            F.lit(1_000_000).cast("long").alias("qSize"),
        )
    )
    ev = load_table(spark, sf_dir, "events")
    start = (F.col("event_id") * 31) % 490_000
    intervals = ev.select(
        F.concat(F.lit(""), (1 + F.col("event_id") % 3).cast("string")).alias("chrom"),
        start.cast("long").alias("start"),
        (start + (F.col("event_id") % 400)).cast("long").alias("end"),
        F.col("event_id"),
    )
    out = liftover_intervals(intervals, chain, max_difference=100)
    return out.select(
        "event_id",
        "chrom",
        "start",
        "end",
        "mapped_start",
        "mapped_end",
    )


SQL_LIFTOVER_CHAIN = """
WITH chain AS (
  SELECT CAST(c + 1 AS VARCHAR) AS tChrom,
         b * 10000 AS tStart,
         b * 10000 + 8000 AS tEnd,
         CAST(c + 1 AS VARCHAR) AS qChrom,
         CASE WHEN c < 2 THEN b * 10000 + 5000 + b ELSE b * 10000 END AS qStart,
         CASE WHEN c < 2 THEN '+' ELSE '-' END AS qStrand,
         CAST(1000000 AS BIGINT) AS qSize
  FROM range(0, 3) tc(c) CROSS JOIN range(0, 50) tb(b)
),
intervals AS (
  SELECT event_id,
         CAST(1 + event_id % 3 AS VARCHAR) AS chrom,
         CAST((event_id * 31) % 490000 AS BIGINT) AS start,
         CAST((event_id * 31) % 490000 + (event_id % 400) AS BIGINT) AS "end"
  FROM events
),
a AS (
  SELECT i.*,
         CASE WHEN s.qStrand = '+' THEN s.qStart + (i.start - s.tStart)
              ELSE s.qSize - (s.qStart + (i.start - s.tStart)) - 1 END AS mappedA
  FROM intervals i
  JOIN chain s ON i.chrom = s.tChrom AND i.start >= s.tStart AND i.start < s.tEnd
),
ab AS (
  SELECT a.*,
         CASE WHEN e.qStrand = '+' THEN e.qStart + (a."end" - e.tStart)
              ELSE e.qSize - (e.qStart + (a."end" - e.tStart)) - 1 END AS mappedB
  FROM a
  JOIN chain e ON a.chrom = e.tChrom AND a."end" >= e.tStart AND a."end" < e.tEnd
)
SELECT event_id, chrom, start, "end",
       LEAST(mappedA, mappedB) AS mapped_start,
       GREATEST(mappedA, mappedB) AS mapped_end
FROM ab
WHERE ABS((GREATEST(mappedA, mappedB) - LEAST(mappedA, mappedB)) - ("end" - start)) <= 100
"""


INTERVAL_QUERIES = {
    "interval_andersson": q_interval_andersson,
    "interval_thurman": q_interval_thurman,
    "interval_jung": q_interval_jung,
    "interval_javierre": q_interval_javierre,
    "liftover_chain": q_liftover_chain,
}
INTERVAL_ORACLES = {
    "interval_andersson": SQL_INTERVAL_ANDERSSON,
    "interval_thurman": SQL_INTERVAL_THURMAN,
    "interval_jung": SQL_INTERVAL_JUNG,
    "interval_javierre": SQL_INTERVAL_JAVIERRE,
    "liftover_chain": SQL_LIFTOVER_CHAIN,
}
