"""VEP JSONL parser: Ensembl VEP output -> variant_index rows.

Re-expression of the reference parser
(datasource/ensembl/vep_parser.py:298-500 effect extraction,
:604-911 main projection) keeping its relational core: read JSONL
with an explicit schema, flatten transcript_consequences, score
consequence terms with the severity map, select the most severe
consequence per variant, and extract per-method variant-effect
assessments (CADD / PolyPhen / SIFT / LOFTEE / GERP / VEP) — falling
back to the INTERGENIC consequence block when a variant hits no
transcript, plus the regulatory-feature consequence long tail.

The declarative schema keeps spark.read.json from running a schema
inference pass over the whole corpus — required at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genetics_spark_coloc_spark.operators.annotation import (
    CONSEQUENCE_SCORES,
    map_column_values,
    most_severe_consequence,
)

VEP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("seq_region_name", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("allele_string", T.StringType()),
        T.StructField("most_severe_consequence", T.StringType()),
        T.StructField(
            "transcript_consequences",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("gene_id", T.StringType()),
                        T.StructField("transcript_id", T.StringType()),
                        T.StructField("biotype", T.StringType()),
                        T.StructField("canonical", T.IntegerType()),
                        T.StructField("consequence_terms", T.ArrayType(T.StringType())),
                        T.StructField("distance", T.LongType()),
                        T.StructField("cadd_phred", T.DoubleType()),
                        T.StructField("polyphen_score", T.DoubleType()),
                        T.StructField("polyphen_prediction", T.StringType()),
                        T.StructField("sift_score", T.DoubleType()),
                        T.StructField("sift_prediction", T.StringType()),
                        T.StructField("lof", T.StringType()),
                        T.StructField("lof_filter", T.StringType()),
                        T.StructField("conservation", T.DoubleType()),
                        T.StructField("hgvsg", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "intergenic_consequences",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("consequence_terms", T.ArrayType(T.StringType())),
                        T.StructField("cadd_phred", T.DoubleType()),
                        T.StructField("conservation", T.DoubleType()),
                        T.StructField("hgvsg", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "regulatory_feature_consequences",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("regulatory_feature_id", T.StringType()),
                        T.StructField("biotype", T.StringType()),
                        T.StructField("consequence_terms", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)

# output element type of the per-method variant-effect entries
_EFFECT_TYPE = (
    "struct<method: string, assessment: string, score: float, "
    "assessmentFlag: string, targetId: string>"
)


def _top_by_score(arr, score_field: str):
    """Element with the highest non-null ``score_field`` (reference
    _get_most_severe_transcript, vep_parser.py:298-347)."""
    scored = F.filter(arr, lambda c: c[score_field].isNotNull())
    ordered = F.array_sort(
        scored,
        lambda a, b: F.when(a[score_field] > b[score_field], -1)
        .when(a[score_field] < b[score_field], 1)
        .otherwise(0),
    )
    return F.get(ordered, 0)


def _effect_entry(
    arr,
    method: str,
    score_field: str | None = None,
    assessment_field: str | None = None,
    flag_field: str | None = None,
    gene_field: str | None = "gene_id",
):
    """One variant-effect struct for ``method`` (reference
    _vep_variant_effect_extractor, vep_parser.py:417-495): taken from
    the highest-scoring element, or any element carrying the
    assessment when the method has no score."""
    if score_field is not None:
        chosen = _top_by_score(arr, score_field)
    else:
        chosen = F.get(
            F.filter(arr, lambda c: c[assessment_field].isNotNull()), 0
        )
    score = (
        chosen[score_field].cast("float")
        if score_field is not None
        else F.lit(None).cast("float")
    )
    assessment = (
        chosen[assessment_field].cast("string")
        if assessment_field is not None
        else F.lit(None).cast("string")
    )
    flag = (
        chosen[flag_field].cast("string")
        if flag_field is not None
        else F.lit(None).cast("string")
    )
    target = (
        chosen[gene_field].cast("string")
        if gene_field is not None
        else F.lit(None).cast("string")
    )
    return F.when(
        chosen.isNotNull(),
        F.struct(
            F.lit(method).alias("method"),
            assessment.alias("assessment"),
            score.alias("score"),
            flag.alias("assessmentFlag"),
            target.alias("targetId"),
        ),
    ).cast(_EFFECT_TYPE)


def _vep_prediction_entry(most_severe: "F.Column"):
    """The VEP method entry: most severe consequence term + its
    severity score (reference _get_vep_prediction, vep_parser.py:348)."""
    return F.struct(
        F.lit("VEP").alias("method"),
        most_severe.alias("assessment"),
        map_column_values(
            most_severe, {k: str(v) for k, v in CONSEQUENCE_SCORES.items()}
        )
        .cast("float")
        .alias("score"),
        F.lit(None).cast("string").alias("assessmentFlag"),
        F.lit(None).cast("string").alias("targetId"),
    ).cast(_EFFECT_TYPE)


def read_vep_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """VEP JSONL -> variant_index-shaped rows.

    variantId is chrom_pos_ref_alt from seq_region_name/start/
    allele_string; per-transcript consequences carry a severity score
    from the static map; ``mostSevereConsequence`` is computed from
    the union of all transcript terms (not trusted from the input).
    """
    raw = spark.read.schema(VEP_SCHEMA).option("mode", "DROPMALFORMED").json(path)
    alleles = F.split(F.col("allele_string"), "/")
    csq_struct = F.transform(
        F.col("transcript_consequences"),
        lambda c: F.struct(
            c["gene_id"].alias("targetId"),
            F.coalesce(c["distance"], F.lit(0)).alias("distanceFromTss"),
            F.lit(None).cast("long").alias("distanceFromFootprint"),
            (F.coalesce(c["canonical"], F.lit(0)) == 1).alias("isEnsemblCanonical"),
            c["biotype"].alias("biotype"),
            F.aggregate(
                c["consequence_terms"],
                F.lit(0.0),
                lambda acc, t: F.greatest(
                    acc,
                    F.coalesce(
                        map_column_values(
                            t, {k: str(v) for k, v in CONSEQUENCE_SCORES.items()}
                        ).cast("double"),
                        F.lit(0.0),
                    ),
                ),
            ).cast("float").alias("consequenceScore"),
        ),
    )
    all_terms = F.flatten(
        F.coalesce(
            F.transform(F.col("transcript_consequences"), lambda c: c["consequence_terms"]),
            F.array(),
        )
    )
    tc = F.col("transcript_consequences")
    ic = F.col("intergenic_consequences")
    # per-method effect entries: transcript-backed when any transcript
    # consequence exists, otherwise the intergenic block carries
    # CADD/GERP (reference vep_parser.py:640-706)
    transcript_effects = F.array(
        _effect_entry(tc, "CADD", score_field="cadd_phred"),
        _effect_entry(
            tc, "PolyPhen", score_field="polyphen_score",
            assessment_field="polyphen_prediction",
        ),
        _effect_entry(
            tc, "SIFT", score_field="sift_score", assessment_field="sift_prediction"
        ),
        _effect_entry(
            tc, "LOFTEE", assessment_field="lof", flag_field="lof_filter"
        ),
        _effect_entry(tc, "GERP", score_field="conservation"),
        _vep_prediction_entry(F.col("most_severe_consequence")),
    )
    intergenic_effects = F.array(
        _effect_entry(ic, "CADD", score_field="cadd_phred", gene_field=None),
        _effect_entry(ic, "GERP", score_field="conservation", gene_field=None),
        _vep_prediction_entry(F.col("most_severe_consequence")),
    )
    variant_effect = F.filter(
        F.when(tc.isNotNull() & (F.size(tc) > 0), transcript_effects).otherwise(
            intergenic_effects
        ),
        lambda e: e.isNotNull(),
    )
    regulatory = F.transform(
        F.coalesce(F.col("regulatory_feature_consequences"), F.array()),
        lambda r: F.struct(
            r["regulatory_feature_id"].alias("regulatoryFeatureId"),
            r["biotype"].alias("biotype"),
            r["consequence_terms"].alias("variantFunctionalConsequenceTerms"),
        ),
    )
    hgvs = (
        F.when(F.size(tc) > 0, F.get(tc, 0)["hgvsg"])
        .when(F.size(ic) > 0, F.get(ic, 0)["hgvsg"])
        .otherwise(F.lit(None).cast("string"))
    )
    return raw.select(
        F.concat_ws(
            "_", F.col("seq_region_name"), F.col("start"), alleles[0], alleles[1]
        ).alias("variantId"),
        F.col("seq_region_name").alias("chromosome"),
        F.col("start").cast("integer").alias("position"),
        alleles[0].alias("referenceAllele"),
        alleles[1].alias("alternateAllele"),
        csq_struct.alias("transcriptConsequences"),
        # derived from transcript terms; intergenic/regulatory-only
        # variants fall back to VEP's own most_severe_consequence
        F.coalesce(
            most_severe_consequence(all_terms), F.col("most_severe_consequence")
        ).alias("mostSevereConsequence"),
        variant_effect.alias("variantEffect"),
        regulatory.alias("regulatoryFeatureConsequences"),
        hgvs.alias("hgvsId"),
    )
