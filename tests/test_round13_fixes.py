"""Round-13 fixes beyond the cc_labels hardening (see
test_cc_labels_hardening.py): the finemap_grouped per-locus size
guard, the ANN recall-certification mode, the CLI catalog scoping,
and the bench baseline min-merge normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_finemap_grouped_locus_size_guard(spark):
    """VERDICT r12 next #4: one pathological locus materializes a p×p
    LD matrix inside a single Python worker — the harness must fail
    loudly at the documented bound BEFORE the kernel allocates."""
    from genetics_spark_coloc_spark.operators.finemapping import (
        finemap_grouped,
    )

    ss = spark.range(30).select(
        F.lit("locus_huge").alias("studyLocusId"),
        F.concat(F.lit("v"), F.col("id")).alias("variantId"),
        (F.col("id") * 0.01).alias("beta"),
        F.lit(0.1).alias("standardError"),
    )
    with pytest.raises(Exception, match="max_locus_variants"):
        finemap_grouped(ss, max_locus_variants=10).collect()
    # under the bound the same input fits normally
    out = finemap_grouped(ss, max_locus_variants=30)
    assert out.count() == 30
