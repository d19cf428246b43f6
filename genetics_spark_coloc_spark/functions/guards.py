"""Shared loud-failure guards for banded pair generators.

Every near-duplicate candidate generator in this engine has the same
scale shape: occurrences are keyed into buckets (an LSH band hash, a
SimHash block, an aHash band value, a winnowing fingerprint posting, a
verbatim gram key) and candidates come from a bucket-confined
self-join — never all-pairs. That confinement is the whole 100 TB
story, and it has exactly one failure mode: a DEGENERATE bucket. One
bucket holding f occurrences contributes f·(f−1)/2 pairs, so a single
boilerplate family funnelling 1% of a 10⁹-doc corpus into one band
bucket turns the "bounded" join into ~10¹⁴ pairs, silently.

``verbatim_match_spans`` grew a loud execution-time guard for this in
round 7 (operators/text.py); this module factors that device into a
shared helper so EVERY banded generator (MinHash LSH bands, SimHash
blocks, aHash bands, winnowing postings) enforces the same contract:

- ``on_hot="raise"`` (default): the job ABORTS at execution time with
  the offending bucket frequency in the message. The guard rides a
  ``assert_true`` filter on the per-bucket count aggregate — the
  aggregate is map-side combined on the same key the pair join
  shuffles on anyway, and no extra driver action is spent (no
  ``count()``/``collect()``; the assertion evaluates inside the same
  job that builds the join).
- ``on_hot="cap"``: occurrences in hot buckets are EXCLUDED from
  pairing — the standard suffix-filter trade (under-reports pairs
  that only meet in boilerplate buckets), bounded wall guaranteed.
- ``ceiling=None``: guard off (pre-round-8 behavior).

This is an additive scale-hardening layer; the reference
(d0choa/genetics_spark_coloc) has no near-dup surface at all
(SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MODES = ("raise", "cap")


def validate_on_hot(on_hot: str, context: str) -> None:
    """Reject typo'd modes at PLAN time, not deep in a job."""
    if on_hot not in _MODES:
        raise ValueError(
            f"{context}: on_hot_bucket must be one of {_MODES}, got {on_hot!r}"
        )


def hot_count_filter(
    counts: DataFrame,
    cnt_col: str,
    ceiling: "int | None",
    on_hot: str,
    context: str,
    param_hint: str = "on_hot_bucket",
) -> DataFrame:
    """Apply the ceiling to an EXISTING per-bucket count table.

    For generators that already aggregate bucket counts (verbatim
    gram frequencies), the guard is free: it rides that aggregate as
    one more filter. ``raise`` mode uses ``assert_true`` — NULL when
    the predicate holds, so every row passes the filter; a hot bucket
    aborts the job with its frequency before the quadratic join can
    expand it. ``cap`` mode drops hot buckets.

    ``param_hint`` names the CALLER's mode parameter in the abort
    message (``verbatim_match_spans`` exposes ``on_hot_gram``, the
    banded generators ``on_hot_bucket``), so the remediation the
    message suggests is always a parameter the failing call actually
    has. ``on_hot`` is validated even when ``ceiling`` is None, so a
    typo'd mode is rejected at plan time rather than silently
    accepted with the guard disabled.
    """
    validate_on_hot(on_hot, context)
    if ceiling is None:
        return counts
    if on_hot == "cap":
        return counts.filter(F.col(cnt_col) <= ceiling)
    return counts.filter(
        F.assert_true(
            F.col(cnt_col) <= ceiling,
            F.concat(
                F.lit(f"{context} hot-bucket guard: a bucket holds "),
                F.col(cnt_col).cast("string"),
                F.lit(
                    f" occurrences (> ceiling {ceiling}); the pair join is "
                    f"quadratic per bucket. Pass {param_hint}='cap' to "
                    "exclude degenerate buckets (strip_boilerplate upstream "
                    "is the documented pipeline order), or raise "
                    "hot_bucket_ceiling."
                ),
            ),
        ).isNull()
    )


def guard_hot_buckets(
    occ: DataFrame,
    key_cols: "list[str]",
    ceiling: "int | None",
    on_hot: str,
    context: str,
    param_hint: str = "on_hot_bucket",
) -> DataFrame:
    """Guard an occurrence table before its bucket self-join.

    Aggregates per-bucket counts (map-side combined, same key the
    downstream pair join shuffles on, output = |distinct buckets|
    rows) and LEFT SEMI joins the occurrences against the surviving
    buckets. In ``raise`` mode no row is ever dropped — either every
    bucket is under the ceiling and the semi join is the identity, or
    the job aborts loudly while building the (small) counts side; the
    pair output is bit-identical to the unguarded plan, which is why
    turning the guard on does not touch any oracle. In ``cap`` mode
    hot buckets' occurrences are removed wholesale.

    ``key_cols`` must be COLUMN NAMES present on ``occ`` (plain
    strings): the semi join resolves them on both sides by name, so
    an arbitrary Column expression has no name to join back on. Every
    generator in this repo buckets by named columns; a caller with a
    computed key materializes it with ``withColumn`` first.
    """
    validate_on_hot(on_hot, context)
    if ceiling is None:
        return occ
    for k in key_cols:
        if not isinstance(k, str):
            raise TypeError(
                f"{context}: guard_hot_buckets key_cols must be column "
                f"names (str), got {type(k).__name__}; materialize computed "
                "keys with withColumn first"
            )
    counts = occ.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_bucket_cnt"))
    ok = hot_count_filter(
        counts, "_bucket_cnt", ceiling, on_hot, context, param_hint
    )
    return occ.join(ok.select(*key_cols), on=key_cols, how="left_semi")
