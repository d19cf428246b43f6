"""GWAS-Catalog curated-association harmonisation: risk-allele
extraction, strand logic, and effect→beta conversion.

Reference anchors: GWASCatalogCuratedAssociationsParser
(datasource/gwas_catalog/associations.py:143-1085) — the Column
helpers behind `harmonise_association_effect_to_beta`, plus
convert_odds_ratio_to_beta (common/utils.py:81-121). All pure
Column expressions — per-row, zero shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from genetics_spark_coloc_spark.functions.effect import ci_to_standard_error
from genetics_spark_coloc_spark.sources.readers import convert_odds_ratio_to_beta

__all__ = [
    "reverse_complement",
    "extract_risk_allele",
    "are_alleles_palindromic",
    "effect_needs_harmonisation",
    "get_effect_type",
    "harmonise_beta",
    "harmonise_odds_ratio",
    "convert_odds_ratio_to_beta",
    "harmonise_association_effect_to_beta",
]


def reverse_complement(allele: Column) -> Column:
    """Reverse complement of a DNA allele string; non-ACTG content
    passes through unchanged (reference: associations.py:456-491)."""
    allele = F.upper(allele)
    return F.when(
        allele.rlike("[ACTG]+"),
        F.reverse(F.translate(allele, "ACTG", "TGAC")),
    ).otherwise(allele)


def extract_risk_allele(risk_allele: Column) -> Column:
    """First allele of a 'rs123-A; rs456-G'-style GWAS-Catalog
    STRONGEST SNP-RISK ALLELE string (reference: associations.py:143-170)."""
    return F.split(F.split(risk_allele, "; ").getItem(0), "-").getItem(1)


def are_alleles_palindromic(
    reference_allele: Column, alternate_allele: Column
) -> Column:
    """True when ref equals the reverse complement of alt — the
    strand-ambiguous case (reference: associations.py:529-565)."""
    revcomp = reverse_complement(alternate_allele)
    return (
        F.when(reference_allele == revcomp, True)
        .when(revcomp.isNull(), False)
        .otherwise(False)
    )


def effect_needs_harmonisation(
    risk_allele: Column, reference_allele: Column
) -> Column:
    """True when the reported risk allele sits on the reference side
    (directly or via reverse complement), so the effect sign must flip
    to express the alt-allele effect (reference: associations.py:494-527)."""
    return (risk_allele == reference_allele) | (
        risk_allele == reverse_complement(reference_allele)
    )


def get_effect_type(ci_text: Column) -> Column:
    """'beta' when the CI text mentions increase/decrease, else
    'odds_ratio'; null in → null out (reference: associations.py:919-951)."""
    return F.when(
        F.lower(ci_text).contains("increase")
        | F.lower(ci_text).contains("decrease"),
        F.lit("beta"),
    ).when(ci_text.isNotNull(), F.lit("odds_ratio"))


def harmonise_beta(
    effect_size: Column, confidence_interval: Column, flipping_needed: Column
) -> Column:
    """Signed beta from effect size + CI direction text, with the
    allele-orientation flip folded in (reference: associations.py:567-626):
    sign flips when exactly one of (flip needed, 'decrease') holds."""
    return (
        F.when(
            (flipping_needed & confidence_interval.contains("increase"))
            | (~flipping_needed & confidence_interval.contains("decrease")),
            -effect_size,
        )
        .otherwise(effect_size)
        .cast("double")
    )


def harmonise_odds_ratio(effect_size: Column, flipping_needed: Column) -> Column:
    """OR or its reciprocal when flipped; a zero OR cannot be flipped
    (reference: associations.py:628-668)."""
    return (
        F.when((effect_size.cast("double") == 0) & flipping_needed, F.lit(None))
        .when(flipping_needed, 1 / effect_size)
        .otherwise(effect_size)
        .cast("double")
    )


def harmonise_association_effect_to_beta(df: DataFrame) -> DataFrame:
    """GWAS-Catalog association effect harmonisation
    (reference: associations.py:953-1085):

    1. extract the reported risk allele;
    2. flag palindromic pairs (effect dropped — strand unknowable);
    3. flag orientation flips;
    4. classify beta vs odds-ratio from the CI text;
    5. SE from the CI bounds ((upper-lower)/3.92);
    6. harmonise both effect spellings, convert OR → ln(OR).

    Requires columns: STRONGEST SNP-RISK ALLELE, referenceAllele,
    alternateAllele, OR or BETA, 95% CI (TEXT). Appends (beta,
    standardError).
    """
    required = [
        "STRONGEST SNP-RISK ALLELE",
        "referenceAllele",
        "alternateAllele",
        "OR or BETA",
        "95% CI (TEXT)",
    ]
    for column in required:
        if column not in df.columns:
            raise ValueError(
                f"Column {column} is required for harmonising effect to beta value."
            )
    ci = F.col("95% CI (TEXT)")
    prepared = df.withColumn(
        "reportedRiskAllele",
        extract_risk_allele(F.col("STRONGEST SNP-RISK ALLELE")),
    ).withColumns(
        {
            "isAllelePalindromic": are_alleles_palindromic(
                F.col("referenceAllele"), F.col("alternateAllele")
            ),
            "needsFlipping": effect_needs_harmonisation(
                F.col("reportedRiskAllele"), F.col("referenceAllele")
            ),
            "effectType": get_effect_type(ci),
            "standardError": ci_to_standard_error(
                F.regexp_extract(ci, r"\[(\d+\.*\d*)-\d+\.*\d*\]", 1).cast("float"),
                F.regexp_extract(ci, r"\[\d+\.*\d*-(\d+\.*\d*)\]", 1).cast("float"),
            ),
        }
    )
    effects = prepared.withColumns(
        {
            "effect_beta": F.when(
                (F.col("effectType") == "beta") & (~F.col("isAllelePalindromic")),
                harmonise_beta(
                    F.col("OR or BETA"), ci, F.col("needsFlipping")
                ),
            ),
            "effect_odds_ratio": F.when(
                (F.col("effectType") == "odds_ratio")
                & (~F.col("isAllelePalindromic")),
                harmonise_odds_ratio(F.col("OR or BETA"), F.col("needsFlipping")),
            ),
        }
    )
    return effects.select(
        *df.columns,
        *convert_odds_ratio_to_beta(
            F.col("effect_beta"),
            F.col("effect_odds_ratio"),
            F.col("standardError"),
        ),
    )


def resolve_trait(
    study_trait: Column, association_trait: Column, p_value_text: Column
) -> Column:
    """Association-level trait wins; a meaningful p-value-text is
    appended in brackets (reference study_splitter.py:21-49)."""
    return (
        F.when(
            p_value_text.isNotNull() & (p_value_text != "no_pvalue_text"),
            F.concat(association_trait, F.lit(" ["), p_value_text, F.lit("]")),
        )
        .when(association_trait.isNotNull(), association_trait)
        .otherwise(study_trait)
    )


def resolve_efo(association_efo: Column, study_efo: Column) -> Column:
    """Association-level EFO string (slash-split) wins over the
    study-level array (reference study_splitter.py:52-63)."""
    return F.coalesce(F.split(association_efo, r"\/"), study_efo)


def split_multi_trait_studies(
    studies: DataFrame, associations: DataFrame
) -> DataFrame:
    """Resolve multi-trait GWAS-Catalog studies into sub-studies
    (reference GWASCatalogStudySplitter.split,
    datasource/gwas_catalog/study_splitter.py:83-138).

    Output: one row per (studyId, subStudyDescription) with
    ``updatedStudyId`` (suffixed ``_<rank>`` only when a study hosts
    more than one sub-description), the resolved trait and EFO list.

    The reference sizes sub-study windows with approx_count_distinct
    (study_splitter.py:76-80) — approximate AND nondeterministic; here
    the exact count comes from the same dense_rank's max over the full
    partition frame, so reruns and the oracle agree.
    """
    rank_w = Window.partitionBy("studyId").orderBy("subStudyDescription")
    full_w = (
        Window.partitionBy("studyId")
        .orderBy("subStudyDescription")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    sub_desc = F.col("subStudyDescription")
    composite = associations.join(
        F.broadcast(studies), on="studyId", how="inner"
    ).select(
        "studyId",
        "subStudyDescription",
        F.dense_rank().over(rank_w).alias("_rank"),
        # F.get (not getItem): missing sub-fields must be null, and
        # Spark 4 ANSI mode turns out-of-bounds getItem into an error
        resolve_trait(
            F.col("traitFromSource"),
            F.get(F.split(sub_desc, r"\|"), 0),
            F.get(F.split(sub_desc, r"\|"), 1),
        ).alias("traitFromSource"),
        resolve_efo(
            F.get(F.split(sub_desc, r"\|"), 2),
            F.col("traitFromSourceMappedIds"),
        ).alias("traitFromSourceMappedIds"),
    )
    return (
        composite.withColumn("_n", F.max("_rank").over(full_w))
        .withColumn(
            "updatedStudyId",
            F.when(F.col("_n") == 1, F.col("studyId")).otherwise(
                F.concat_ws("_", F.col("studyId"), F.col("_rank"))
            ),
        )
        .drop("_rank", "_n")
        .distinct()
    )


# QC flag strings (reference StudyLocusQualityCheck, study_locus.py:92-97)
QC_SUBSIGNIFICANT = "Subsignificant p-value"
QC_NO_GENOMIC_LOCATION = "Incomplete genomic mapping"
QC_COMPOSITE = "Composite association"
QC_INCONSISTENCY = "Variant inconsistency"
QC_NON_MAPPED_VARIANT = "No mapping in GnomAd"
QC_PALINDROMIC_ALLELE = "Palindrome alleles - cannot harmonize"

# Representative slice of the GWAS-Catalog pValueText normalisation map
# (reference asset assets/data/gwas_pValueText_map.json, ~1k entries;
# callers pass their full mapping for production use)
PVALUE_TEXT_MAP = {
    "A risk allele not reported": "?",
    "African ancestry": "AA",
    "European Ancestry": "EA",
    "European ancestry": "EA",
    "East Asian ancestry": "EAS",
    "Alzheimer’s Disease": "AD",
    "Attention deficit hyperactivity disorder": "ADHD",
    "alanine aminotransferase": "ALT",
    "body mass index": "BMI",
}


def convert_gnomad_position_to_ensembl(
    position: Column, reference: Column, alternate: Column
) -> Column:
    """GnomAD → Ensembl position: indels shift by +1, SNPs unchanged
    (reference: associations.py:35-66)."""
    return F.when(
        (F.length(reference) > 1) | (F.length(alternate) > 1), position + 1
    ).otherwise(position)


def parse_gwas_pvalue(pvalue: Column) -> list[Column]:
    """GWAS-Catalog p-value string → (mantissa, exponent); values
    without an exponent get exponent 1 (reference: associations.py:69-99)."""
    split = F.split(pvalue, "E")
    return [
        split.getItem(0).cast("float").alias("pValueMantissa"),
        F.coalesce(F.get(split, 1).cast("integer"), F.lit(1)).alias(
            "pValueExponent"
        ),
    ]


def normalise_pvalue_text(
    p_value_text: Column, mapping: dict[str, str] | None = None
) -> Column:
    """pValueText → array of standardised abbreviations; null when no
    component maps (reference: associations.py:101-141): strip
    parentheses, split on comma, create_map lookup per element."""
    mapping = mapping or PVALUE_TEXT_MAP
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    map_expr = F.create_map(*pairs)
    splitted = F.split(F.regexp_replace(p_value_text, r"[\(\)]", ""), ",")
    mapped = F.transform(splitted, lambda x: map_expr[x])
    return F.when(F.forall(mapped, lambda x: x.isNull()), None).otherwise(mapped)


def qc_association_all(
    qc: Column,
    chromosome: Column,
    position: Column,
    reference_allele: Column,
    alternate_allele: Column,
    strongest_snp_risk_allele: Column,
    p_value_mantissa: Column,
    p_value_exponent: Column,
    p_value_cutoff: float,
) -> Column:
    """All association-level QC flags in one pass
    (reference _qc_all, associations.py:716-918): composite
    variant×variant interactions, subsignificance on the (mantissa,
    exponent) pair, missing genomic location, chromosome/position/
    risk-allele arity inconsistencies, unmapped variants, palindromic
    alleles."""
    from genetics_spark_coloc_spark.operators.annotation import update_quality_flag

    qc = update_quality_flag(
        qc, strongest_snp_risk_allele.contains(";"), QC_COMPOSITE
    )
    subsig = (p_value_exponent > F.lit(_cutoff_exponent(p_value_cutoff))) | (
        (p_value_exponent == F.lit(_cutoff_exponent(p_value_cutoff)))
        & (p_value_mantissa > F.lit(_cutoff_mantissa(p_value_cutoff)))
    )
    qc = update_quality_flag(qc, subsig, QC_SUBSIGNIFICANT)
    qc = update_quality_flag(
        qc, position.isNull() | chromosome.isNull(), QC_NO_GENOMIC_LOCATION
    )
    qc = update_quality_flag(
        qc,
        (F.size(F.split(chromosome, ";")) != F.size(F.split(position, ";")))
        | (
            F.size(F.split(chromosome, ";"))
            != F.size(F.split(strongest_snp_risk_allele, ";"))
        ),
        QC_INCONSISTENCY,
    )
    qc = update_quality_flag(qc, alternate_allele.isNull(), QC_NON_MAPPED_VARIANT)
    qc = update_quality_flag(
        qc,
        are_alleles_palindromic(reference_allele, alternate_allele),
        QC_PALINDROMIC_ALLELE,
    )
    return qc


def _cutoff_mantissa(threshold: float) -> float:
    from genetics_spark_coloc_spark.functions.pvalue import split_pvalue

    return split_pvalue(threshold)[0]


def _cutoff_exponent(threshold: float) -> int:
    from genetics_spark_coloc_spark.functions.pvalue import split_pvalue

    return split_pvalue(threshold)[1]


def collect_rsids(
    snp_id: Column, snp_id_current: Column, risk_allele: Column
) -> Column:
    """Distinct rsIDs reported for an association across the three
    GWAS-Catalog spellings (reference: associations.py:172-194)."""
    snp_id_current = F.when(
        snp_id_current.rlike("^[0-9]*$"),
        F.format_string("rs%s", snp_id_current),
    )
    risk_allele = F.split(risk_allele, "-").getItem(0)
    return F.array_distinct(F.array(snp_id, snp_id_current, risk_allele))


def compare_rsids(gnomad: Column, gwas: Column) -> Column:
    """True iff the GnomAD and GWAS-Catalog rsID sets intersect
    (reference: associations.py:303-336)."""
    return F.when(F.size(F.array_intersect(gnomad, gwas)) > 0, True).otherwise(
        False
    )


def flag_mappings_to_retain(association_id: Column, filter_column: Column) -> Column:
    """Keep every mapping unless a sibling mapping of the same
    association passes the filter and this one does not
    (reference: associations.py:338-387)."""
    w = Window.partitionBy(association_id)
    any_true = F.when(
        F.array_contains(F.collect_set(filter_column).over(w), True), True
    ).otherwise(False)
    return F.when(any_true & (~filter_column), False).otherwise(True)


def check_concordance(
    risk_allele: Column, reference_allele: Column, alternate_allele: Column
) -> Column:
    """Risk allele concordant with ref/alt on either strand; ambiguous
    ('?') and unmapped rows stay accepted (reference:
    associations.py:389-454)."""
    risk_rc = F.when(
        risk_allele.rlike(r"^[ACTG]+$"),
        F.reverse(F.translate(risk_allele, "ACTG", "TGAC")),
    ).otherwise(risk_allele)
    return (
        F.when(
            (risk_allele == reference_allele) | (risk_allele == alternate_allele),
            True,
        )
        .when(
            (risk_rc == reference_allele) | (risk_rc == alternate_allele),
            True,
        )
        .when(risk_allele == "?", True)
        .when(reference_allele.isNull(), True)
        .otherwise(False)
    )


def map_variants_to_gnomad_variants(
    gwas_associations: DataFrame, variant_index: DataFrame
) -> DataFrame:
    """Resolve raw GWAS-Catalog association rows to GnomAD variants
    (reference _map_variants_to_gnomad_variants,
    associations.py:197-301):

    1. candidate join on (chromosome, Ensembl-shifted position) —
       the variant side is pre-pruned with a semi-style join on the
       distinct association positions so only relevant variants flow
       into the mapping;
    2. drop candidates whose rsIDs disagree / alleles are discordant
       when a better sibling mapping exists (window-based retain
       flags);
    3. keep the max-MAF candidate per association;
    4. left join the resolution back onto the raw associations.

    ``variant_index`` needs: variantId, chromosome, position,
    referenceAllele, alternateAllele, rsIds, alleleFrequencies.
    """
    from genetics_spark_coloc_spark.functions.reshape import (
        get_record_with_maximum_value,
    )
    from genetics_spark_coloc_spark.operators.annotation import max_maf

    assoc_subset = gwas_associations.select(
        "rowId",
        F.col("CHR_ID").alias("chromosome"),
        F.col("CHR_POS").cast("integer").alias("ensemblPosition"),
        collect_rsids(
            F.split(F.col("SNPS"), "; ").getItem(0),
            F.col("SNP_ID_CURRENT"),
            F.split(F.col("STRONGEST SNP-RISK ALLELE"), "; ").getItem(0),
        ).alias("rsIdsGwasCatalog"),
        extract_risk_allele(F.col("STRONGEST SNP-RISK ALLELE")).alias("riskAllele"),
    )
    va_subset = variant_index.select(
        "variantId",
        "chromosome",
        convert_gnomad_position_to_ensembl(
            F.col("position"), F.col("referenceAllele"), F.col("alternateAllele")
        ).alias("ensemblPosition"),
        "position",
        F.col("rsIds").alias("rsIdsGnomad"),
        "referenceAllele",
        "alternateAllele",
        max_maf(F.col("alleleFrequencies")).alias("maxMaf"),
    ).join(
        assoc_subset.select("chromosome", "ensemblPosition").distinct(),
        on=["chromosome", "ensemblPosition"],
        how="inner",
    )
    filtered = (
        assoc_subset.join(va_subset, on=["chromosome", "ensemblPosition"], how="left")
        .withColumn(
            "rsIdFilter",
            flag_mappings_to_retain(
                F.col("rowId"),
                compare_rsids(F.col("rsIdsGnomad"), F.col("rsIdsGwasCatalog")),
            ),
        )
        .withColumn(
            "concordanceFilter",
            flag_mappings_to_retain(
                F.col("rowId"),
                check_concordance(
                    F.col("riskAllele"),
                    F.col("referenceAllele"),
                    F.col("alternateAllele"),
                ),
            ),
        )
        .filter(F.col("rsIdFilter") | F.col("concordanceFilter"))
    )
    resolved = get_record_with_maximum_value(filtered, ["rowId"], "maxMaf").select(
        "rowId",
        "variantId",
        "referenceAllele",
        "alternateAllele",
        "chromosome",
        "position",
    )
    return gwas_associations.join(resolved, on="rowId", how="left")
