"""Per-source interval parsers: Andersson 2014 (FANTOM5 enhancer–TSS),
Javierre 2016 (promoter-capture Hi-C), Jung 2019 (PCHi-C), and
Thurman 2012 (DHS correlation).

Reference parity: datasource/intervals/andersson.py:24-141,
javierre.py:35-173, jung.py:24-100, thurman.py:30-105. Each source
has its own raw schema, score semantics, and gene-linking rule:

- andersson: genes come from the ``name`` field ("chr:start-end;…;
  SYMBOL"), score is permille (÷1000), link by symbol with a
  ±2.45 Mb TSS proximity guard, keep max score per region/gene.
- javierre: each bait fragment (the ``name`` field) scores against
  the other fragment; genes link by POSITION OVERLAP of the other
  fragment with the gene body, TSS guard, max score per
  (bait, gene, biofeature).
- jung: fragment from ``Interacting_fragment`` ("chr.start.end"),
  promoter gene list is ';'-separated (exploded), constant score 1.
- thurman: plain BED-like columns, link by symbol AND chromosome.

All four accept pre-projected gene lookups instead of a TargetIndex
object, and an optional liftover mapping (operators/liftover.py) —
identity when None. Gene lookups are broadcast; interval↔gene
position joins go through the same binned equi-join pattern as the
locus operators when large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CANONICAL_CHROMOSOMES = [str(x) for x in range(1, 23)] + ["X", "Y", "MT"]
TWOSIDED_TSS_THRESHOLD = 2.45e6


def _maybe_lift(
    df: DataFrame,
    chain: DataFrame | None,
    chrom_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Apply chain-file liftover when a chain mapping is provided,
    keeping the original column names; identity otherwise."""
    if chain is None:
        return df
    from genetics_spark_coloc_spark.operators.liftover import liftover_intervals

    lifted = liftover_intervals(df, chain, chrom_col, start_col, end_col)
    return lifted.drop(start_col, end_col).withColumnsRenamed(
        {"mapped_start": start_col, "mapped_end": end_col}
    )


def parse_andersson(
    raw: DataFrame,
    gene_symbols: DataFrame,
    chain: DataFrame | None = None,
    twosided_threshold: float = TWOSIDED_TSS_THRESHOLD,
) -> DataFrame:
    """Andersson et al. 2014 FANTOM5 enhancer–promoter correlations.

    ``raw`` needs (name, score); ``gene_symbols`` needs
    (geneSymbol, geneId, tss). Reference: intervals/andersson.py:49-141.
    """
    parsed = (
        raw.withColumn("score", F.col("score").cast("float") / F.lit(1000))
        .withColumn("parsedName", F.split(F.col("name"), ";"))
        .withColumn("gene_symbol", F.get(F.col("parsedName"), 2))
        .withColumn("location", F.get(F.col("parsedName"), 0))
        .withColumn(
            "chrom",
            F.regexp_replace(F.get(F.split(F.col("location"), ":|-"), 0), "chr", ""),
        )
        .withColumn("start", F.get(F.split(F.col("location"), ":|-"), 1).cast("int"))
        .withColumn("end", F.get(F.split(F.col("location"), ":|-"), 2).cast("int"))
        .select("chrom", "start", "end", "gene_symbol", "score")
        .filter(F.col("chrom").isin(CANONICAL_CHROMOSOMES))
        .groupBy("chrom", "start", "end", "gene_symbol")
        .agg(F.max("score").alias("resourceScore"))
    )
    lifted = _maybe_lift(parsed, chain, "chrom", "start", "end").distinct()
    return (
        lifted.alias("intervals")
        .join(
            F.broadcast(gene_symbols).alias("genes"),
            on=[
                F.col("intervals.gene_symbol") == F.col("genes.geneSymbol"),
                F.abs(
                    (F.col("intervals.start") + F.col("intervals.end")) / 2
                    - F.col("genes.tss")
                )
                <= twosided_threshold,
            ],
            how="left",
        )
        .select(
            F.col("chrom").alias("chromosome"),
            F.col("intervals.start").alias("start"),
            F.col("intervals.end").alias("end"),
            "geneId",
            "resourceScore",
            F.lit("andersson2014").alias("datasourceId"),
            F.lit("fantom5").alias("datatypeId"),
            F.lit("24670763").alias("pmid"),
            F.lit("aggregate").alias("biofeature"),
        )
    )


def parse_javierre(
    raw: DataFrame,
    gene_locations: DataFrame,
    chain: DataFrame | None = None,
    twosided_threshold: float = TWOSIDED_TSS_THRESHOLD,
) -> DataFrame:
    """Javierre et al. 2016 promoter-capture Hi-C.

    ``raw`` needs (chrom, start, end, name, bio_feature) where
    ``name`` is "chr:start-end,score" for the scored bait fragment;
    ``gene_locations`` needs (chromosome, start, end, geneId, tss).
    Reference: intervals/javierre.py:35-173.
    """
    parsed = (
        raw.withColumn("name_split", F.split(F.col("name"), r":|-|,"))
        .withColumn("name_chr", F.regexp_replace(F.get(F.col("name_split"), 0), "chr", ""))
        .withColumn("name_start", F.get(F.col("name_split"), 1).cast("int"))
        .withColumn("name_end", F.get(F.col("name_split"), 2).cast("int"))
        .withColumn("name_score", F.get(F.col("name_split"), 3).cast("float"))
        .withColumn("chrom", F.regexp_replace(F.col("chrom"), "chr", ""))
        .drop("name_split", "name")
        .filter(
            F.col("name_score").isNotNull()
            & (F.col("chrom") == F.col("name_chr"))
            & F.col("name_chr").isin(CANONICAL_CHROMOSOMES)
        )
    )
    remapped = _maybe_lift(parsed, chain, "chrom", "start", "end")
    remapped = _maybe_lift(remapped, chain, "name_chr", "name_start", "name_end")

    # link the OTHER fragment to genes by body overlap of either edge
    unique_with_genes = (
        remapped.select("chrom", F.col("start").cast("int"), F.col("end").cast("int"))
        .distinct()
        .alias("intervals")
        .join(
            F.broadcast(gene_locations).alias("genes"),
            on=[
                F.col("intervals.chrom") == F.col("genes.chromosome"),
                (
                    (F.col("intervals.start") >= F.col("genes.start"))
                    & (F.col("intervals.start") <= F.col("genes.end"))
                )
                | (
                    (F.col("intervals.end") >= F.col("genes.start"))
                    & (F.col("intervals.end") <= F.col("genes.end"))
                ),
            ],
            how="left",
        )
        .select(
            F.col("intervals.chrom").alias("chrom"),
            F.col("intervals.start").alias("start"),
            F.col("intervals.end").alias("end"),
            F.col("genes.geneId").alias("geneId"),
            F.col("genes.tss").alias("tss"),
        )
    )
    return (
        remapped.join(unique_with_genes, on=["chrom", "start", "end"], how="left")
        .filter(
            F.abs((F.col("start") + F.col("end")) / 2 - F.col("tss"))
            <= twosided_threshold
        )
        .groupBy("name_chr", "name_start", "name_end", "geneId", "bio_feature")
        .agg(F.max(F.col("name_score")).alias("resourceScore"))
        .select(
            F.col("name_chr").alias("chromosome"),
            F.col("name_start").alias("start"),
            F.col("name_end").alias("end"),
            F.col("resourceScore").cast("double"),
            "geneId",
            F.col("bio_feature").alias("biofeature"),
            F.lit("javierre2016").alias("datasourceId"),
            F.lit("pchic").alias("datatypeId"),
            F.lit("27863249").alias("pmid"),
        )
    )


def parse_jung(
    raw: DataFrame,
    gene_symbols: DataFrame,
    chain: DataFrame | None = None,
) -> DataFrame:
    """Jung et al. 2019 PCHi-C.

    ``raw`` needs (Promoter, Interacting_fragment, Tissue_type) where
    Interacting_fragment is "chr1.start.end". Reference:
    intervals/jung.py:24-100.
    """
    parsed = (
        raw.withColumn("interval", F.split(F.col("Interacting_fragment"), r"\."))
        .select(
            F.regexp_replace(F.get(F.col("interval"), 0), "chr", "").alias("chrom"),
            F.get(F.col("interval"), 1).cast("int").alias("start"),
            F.get(F.col("interval"), 2).cast("int").alias("end"),
            F.col("Promoter").alias("gene_name"),
            F.col("Tissue_type").alias("tissue"),
        )
    )
    lifted = _maybe_lift(parsed, chain, "chrom", "start", "end")
    return (
        lifted.select(
            "chrom",
            "start",
            "end",
            F.explode(F.split(F.col("gene_name"), ";")).alias("gene_name"),
            "tissue",
        )
        .alias("intervals")
        .join(
            F.broadcast(gene_symbols).alias("genes"),
            on=[F.col("intervals.gene_name") == F.col("genes.geneSymbol")],
            how="inner",
        )
        .select(
            F.col("chrom").alias("chromosome"),
            F.col("intervals.start").alias("start"),
            F.col("intervals.end").alias("end"),
            "geneId",
            F.col("tissue").alias("biofeature"),
            F.lit(1.0).alias("resourceScore"),
            F.lit("jung2019").alias("datasourceId"),
            F.lit("pchic").alias("datatypeId"),
            F.lit("31501517").alias("pmid"),
        )
        .distinct()
    )


def parse_thurman(
    raw: DataFrame,
    gene_symbols: DataFrame,
    chain: DataFrame | None = None,
) -> DataFrame:
    """Thurman et al. 2012 DHS–promoter correlation.

    ``raw`` needs (chrom, start, end, gene_name, score);
    ``gene_symbols`` needs (geneSymbol, geneId, chromosome).
    Reference: intervals/thurman.py:30-105 — note the symbol join is
    chromosome-qualified here, unlike the other sources.
    """
    parsed = raw.select(
        F.regexp_replace(F.col("chrom"), "chr", "").alias("chrom"),
        "start",
        "end",
        "gene_name",
        "score",
    )
    lifted = _maybe_lift(parsed, chain, "chrom", "start", "end")
    return (
        lifted.alias("intervals")
        .join(
            F.broadcast(gene_symbols).alias("genes"),
            on=[
                F.col("intervals.gene_name") == F.col("genes.geneSymbol"),
                F.col("intervals.chrom") == F.col("genes.chromosome"),
            ],
            how="inner",
        )
        .select(
            F.col("chrom").alias("chromosome"),
            F.col("intervals.start").alias("start"),
            F.col("intervals.end").alias("end"),
            "geneId",
            F.col("score").cast("double").alias("resourceScore"),
            F.lit("thurman2012").alias("datasourceId"),
            F.lit("dhscor").alias("datatypeId"),
            F.lit("22955617").alias("pmid"),
        )
        .distinct()
    )
