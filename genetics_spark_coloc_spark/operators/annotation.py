"""Annotation & validation operators: schema coercion, label lookup,
VEP consequence selection, study/variant validation, interval↔gene
joins, VCF export.

Reference anchors: create_map lookup (common/spark_helpers.py:
451-482), @enforce_schema from_json(to_json) coercion
(spark_helpers.py:545-585), most-severe-consequence selection
(datasource/ensembl/vep_parser.py:604-911, reduced to its relational
core), validation joins (dataset/study_locus.py:160-230,278-335),
interval↔TSS join (datasource/intervals/andersson.py:113-123), VCF
sink (config.py:536-543).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_column_values(col: Column, mapping: dict[str, str], default: str | None = None) -> Column:
    """Literal label→id lookup via a create_map expression
    (reference: spark_helpers.py:451-482). Stays in codegen — no join
    for small static mappings."""
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked_up = F.create_map(*pairs)[col]
    return F.coalesce(looked_up, F.lit(default)) if default is not None else looked_up


def enforce_struct_schema(col: Column, ddl_schema: str) -> Column:
    """Coerce a struct column to an exact schema via
    from_json(to_json(x)) round-trip — drops extra fields, adds
    missing ones as null (reference: spark_helpers.py:545-585)."""
    return F.from_json(F.to_json(col), ddl_schema)


# consequence term -> severity score, most severe first (subset of the
# Ensembl ranking used by the reference's VEP parser)
CONSEQUENCE_SCORES: dict[str, float] = {
    "transcript_ablation": 1.0,
    "stop_gained": 0.95,
    "frameshift_variant": 0.95,
    "stop_lost": 0.9,
    "start_lost": 0.9,
    "missense_variant": 0.7,
    "splice_region_variant": 0.65,
    "synonymous_variant": 0.6,
    "5_prime_UTR_variant": 0.5,
    "3_prime_UTR_variant": 0.5,
    "intron_variant": 0.3,
    "upstream_gene_variant": 0.25,
    "downstream_gene_variant": 0.25,
    "intergenic_variant": 0.1,
}


def most_severe_consequence(consequence_terms: Column) -> Column:
    """Pick the most severe term from an array<string> of consequence
    terms (the VEP parser's core selection, vep_parser.py:604-700).

    Pure array fold over the static severity map — no UDF, no join.
    """
    def score(term: Column) -> Column:
        return F.coalesce(map_column_values(term, {k: str(v) for k, v in CONSEQUENCE_SCORES.items()}).cast("double"), F.lit(0.0))

    best = F.aggregate(
        consequence_terms,
        F.struct(F.lit(-1.0).alias("score"), F.lit(None).cast("string").alias("term")),
        lambda acc, t: F.when(score(t) > acc["score"], F.struct(score(t).alias("score"), t.alias("term"))).otherwise(acc),
    )
    return best["term"]


def validate_study_locus(
    study_locus: DataFrame,
    study_index: DataFrame,
    flag_missing_study: str = "Study not found in study index",
) -> DataFrame:
    """Left-join validation: flag loci whose study is absent from the
    study index (reference: study_locus.py:160-230)."""
    known = study_index.select("studyId").distinct().withColumn("_known", F.lit(True))
    return (
        study_locus.join(F.broadcast(known), on="studyId", how="left")
        .withColumn(
            "qualityControls",
            F.when(
                F.col("_known").isNull(),
                F.array_union(
                    F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
                    F.array(F.lit(flag_missing_study)),
                ),
            ).otherwise(F.col("qualityControls")),
        )
        .drop("_known")
    )


VALID_CHROMOSOMES = [str(i) for i in range(1, 23)] + ["X", "Y", "MT"]


def flag_invalid_variants(
    study_locus: DataFrame,
    flag: str = "Invalid variant identifier",
) -> DataFrame:
    """Flag loci whose lead variantId doesn't parse as
    chrom_pos_ref_alt with a known chromosome
    (reference: study_locus.py:278-335)."""
    parts = F.split(F.col("variantId"), "_")
    valid = (
        (F.size(parts) == 4)
        & parts[0].isin(VALID_CHROMOSOMES)
        & parts[1].try_cast("int").isNotNull()
        & (F.length(F.regexp_replace(parts[2], "[ACGT]", "")) == 0)
        & (F.length(F.regexp_replace(parts[3], "[ACGT]", "")) == 0)
    )
    return study_locus.withColumn(
        "qualityControls",
        F.when(
            ~F.coalesce(valid, F.lit(False)),
            F.array_union(
                F.coalesce(F.col("qualityControls"), F.array().cast("array<string>")),
                F.array(F.lit(flag)),
            ),
        ).otherwise(F.col("qualityControls")),
    )


def intervals_to_gene_tss(
    intervals: DataFrame, target_index: DataFrame, max_distance: int = 250_000
) -> DataFrame:
    """Join enhancer intervals to genes whose TSS is within
    ``max_distance`` of the interval midpoint
    (reference: intervals/andersson.py:113-123)."""
    genes = F.broadcast(
        target_index.select(
            F.col("id").alias("tssGeneId"),
            F.col("genomicLocation.chromosome").alias("g_chrom"),
            F.col("tss").alias("g_tss"),
        )
    )
    midpoint = ((F.col("start") + F.col("end")) / 2).cast("long")
    return (
        intervals.withColumn("midpoint", midpoint)
        .join(
            genes,
            on=[
                F.col("chromosome") == F.col("g_chrom"),
                F.abs(F.col("midpoint") - F.col("g_tss")) <= max_distance,
            ],
            how="inner",
        )
        .drop("g_chrom")
    )


def update_quality_flag(qc: Column, condition: Column, flag: str) -> Column:
    """Append a QC flag when the condition holds, keeping the array
    unique (reference: dataset.py:323-341 + array_distinct wrap)."""
    base = F.coalesce(qc, F.array().cast("array<string>"))
    return F.array_distinct(
        F.when(condition, F.array_union(base, F.array(F.lit(flag)))).otherwise(base)
    )


def flag_trans_qtls(
    study_locus: DataFrame,
    study_index: DataFrame,
    target_index: DataFrame,
    trans_threshold: int = 5_000_000,
) -> DataFrame:
    """``isTransQtl`` per credible set: a QTL locus is trans iff EVERY
    tag variant sits on a different chromosome than the measured gene
    or beyond ``trans_threshold`` of its TSS
    (reference: study_locus.py:686-777). GWAS loci stay null.

    Shape: explode tags → inner join QTL studies (gene LUT, broadcast)
    → left join gene TSS (broadcast) → groupBy locus with an all-tags
    fold; one shuffle on studyLocusId.
    """
    if "geneId" not in study_index.columns:
        return study_locus
    out = study_locus.drop("isTransQtl") if "isTransQtl" in study_locus.columns else study_locus

    qtl_studies = study_index.filter(F.col("studyType") != "gwas").select(
        "studyId", "geneId"
    )
    genes = target_index.select(
        F.col("id").alias("geneId"),
        "tss",
        F.col("genomicLocation.chromosome").alias("geneChromosome"),
    )
    tag_flags = (
        out.select("studyLocusId", "studyId", F.explode("locus").alias("tag"))
        .select(
            "studyLocusId",
            "studyId",
            F.split(F.col("tag.variantId"), "_")[0].alias("chromosome"),
            F.split(F.col("tag.variantId"), "_")[1].cast("long").alias("position"),
        )
        .join(F.broadcast(qtl_studies), on="studyId", how="inner")
        .join(F.broadcast(genes), on="geneId", how="left")
        .withColumn(
            "isTagTrans",
            F.when(
                (F.col("chromosome") != F.col("geneChromosome"))
                | (F.abs(F.col("tss") - F.col("position")) > trans_threshold),
                F.lit(True),
            ).otherwise(F.lit(False)),
        )
        .groupBy("studyLocusId")
        .agg(
            # trans iff no tag is cis (reference's collect_set/contains trick,
            # expressed as a direct universal quantifier)
            F.when(
                F.array_contains(F.collect_set("isTagTrans"), F.lit(False)), False
            )
            .otherwise(F.lit(True))
            .alias("isTransQtl")
        )
    )
    return out.join(tag_flags, on="studyLocusId", how="left")


def qc_redundant_top_hits(
    study_locus: DataFrame,
    top_hit_flag: str = "Study locus from curated top hit",
    redundant_flag: str = "PICS association explained by summary statistics of the same study",
) -> DataFrame:
    """Flag curated top hits in studies that also carry PICS
    associations derived from full summary statistics
    (reference qc_redundant_top_hits_from_PICS,
    study_locus.py:1155-1191)."""
    studies_with_sumstats = (
        study_locus.filter(F.col("finemappingMethod") == "PICS")
        .withColumn(
            "hasPicsSumstats",
            ~F.array_contains(F.col("qualityControls"), top_hit_flag),
        )
        .groupBy("studyId")
        .agg(F.max("hasPicsSumstats").alias("studiesWithPicsSumstats"))
    )
    return (
        study_locus.join(F.broadcast(studies_with_sumstats), on="studyId", how="left")
        .withColumn(
            "qualityControls",
            update_quality_flag(
                F.col("qualityControls"),
                F.array_contains(F.col("qualityControls"), top_hit_flag)
                & F.col("studiesWithPicsSumstats"),
                redundant_flag,
            ),
        )
        .drop("studiesWithPicsSumstats")
    )


def validate_lead_pvalue(
    study_locus: DataFrame,
    pvalue_cutoff: float,
    flag: str = "Subsignificant p-value",
) -> DataFrame:
    """QC-flag associations whose lead p-value is above the cutoff
    (reference validate_lead_pvalue, study_locus.py:337-372); the
    (mantissa, exponent) pair comparison avoids underflow."""
    from genetics_spark_coloc_spark.functions.pvalue import pvalue_pair_gt

    return study_locus.withColumn(
        "qualityControls",
        update_quality_flag(
            F.col("qualityControls"),
            pvalue_pair_gt(
                F.col("pValueMantissa"), F.col("pValueExponent"), pvalue_cutoff
            ),
            flag,
        ),
    )


VALID_CHROMOSOMES = [str(i) for i in range(1, 23)] + ["X", "Y", "XY", "MT"]


def validate_chromosome_label(
    study_locus: DataFrame,
    flag: str = "Chromosome not in 1:22, X, Y, XY or MT",
) -> DataFrame:
    """QC-flag loci whose chromosome label is outside 1..22/X/Y/XY/MT
    (reference validate_chromosome_label, study_locus.py:250-276)."""
    qc = (
        F.col("qualityControls")
        if "qualityControls" in study_locus.columns
        else F.lit(None).cast("array<string>")
    )
    return study_locus.withColumn(
        "qualityControls",
        update_quality_flag(
            qc, ~F.col("chromosome").isin(VALID_CHROMOSOMES), flag
        ),
    )


def max_maf(allele_frequencies: Column) -> Column:
    """Maximum minor-allele frequency across populations, biallelic
    assumption (reference max_maf, variant_index.py:205-224):
    fold each frequency to min(f, 1-f), take the array max."""
    return F.array_max(
        F.transform(
            allele_frequencies,
            lambda af: F.when(
                af["alleleFrequency"] > 0.5, 1 - af["alleleFrequency"]
            ).otherwise(af["alleleFrequency"]),
        )
    )


def write_vcf(variant_index: DataFrame, path: str) -> None:
    """Export a variant index as VCF-shaped text (fixed column order,
    tab-separated; reference: config.py:536-543 variant_index VCF
    step)."""
    vcf = variant_index.select(
        F.col("chromosome").alias("#CHROM"),
        F.col("position").alias("POS"),
        F.coalesce(F.col("variantId"), F.lit(".")).alias("ID"),
        F.col("referenceAllele").alias("REF"),
        F.col("alternateAllele").alias("ALT"),
        F.lit(".").alias("QUAL"),
        F.lit(".").alias("FILTER"),
        F.lit(".").alias("INFO"),
    ).orderBy("#CHROM", "POS")
    vcf.write.option("sep", "\t").option("header", True).mode("overwrite").csv(path)
