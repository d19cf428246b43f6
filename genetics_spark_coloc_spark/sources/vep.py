"""VEP JSONL parser: Ensembl VEP output -> variant_index rows.

Reduced re-expression of the reference's 1100-line parser
(datasource/ensembl/vep_parser.py:604-911) keeping its relational
core: read JSONL with an explicit schema, flatten
transcript_consequences, score consequence terms with the severity
map, and select the most severe consequence per variant.

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
                    ]
                )
            ),
        ),
    ]
)


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
    return raw.select(
        F.concat_ws(
            "_", F.col("seq_region_name"), F.col("start"), alleles[0], alleles[1]
        ).alias("variantId"),
        F.col("seq_region_name").alias("chromosome"),
        F.col("start").cast("integer").alias("position"),
        alleles[0].alias("referenceAllele"),
        alleles[1].alias("alternateAllele"),
        csq_struct.alias("transcriptConsequences"),
        most_severe_consequence(all_terms).alias("mostSevereConsequence"),
    )
