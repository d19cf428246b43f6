"""genetics_spark_coloc_spark — a PySpark-native post-GWAS analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference engine (d0choa/genetics_spark_coloc, a gentropy-style Open
Targets pipeline): GWAS summary-statistics harmonisation, window/LD
clumping into loci, credible-set math, locus-overlap detection,
Bayesian colocalisation (COLOC / eCAVIAR), PICS fine-mapping — plus a
large-scale training-data-pipeline layer (dedup, similarity search,
text analysis, multimodal plumbing).

Design rules (see SURVEY.md §7):
- Everything is declarative DataFrame / SQL so Catalyst can optimize
  (pushdown, pruning, join selection, AQE).
- No row-at-a-time Python UDFs on hot paths: logsumexp / softmax /
  PICS posteriors are higher-order array functions; per-locus numeric
  kernels are Arrow-batched ``applyInPandas``.
- Deterministic everywhere: md5-based ids, stable sort keys (the
  reference's ``orderBy(rand())`` dedup is replaced by deterministic
  ordering).
- Scale intent is 100 TB on a multi-executor cluster: broadcast small
  dims explicitly, bin range joins, partition by chromosome, let AQE
  handle skew.
"""

from genetics_spark_coloc_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
