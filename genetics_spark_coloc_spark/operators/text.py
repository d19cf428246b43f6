"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen) over a string column
— token counting, quality ratios, n-gram language ID heuristic, and
document fingerprinting. These extend the engine beyond the
reference's genetics surface (BASELINE.json north star); they are
designed to run over trillions of documents: no UDFs, no shuffles
except where aggregation is the point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from genetics_spark_coloc_spark.functions.reshape import declared_single_partition

# deliberately small, deterministic marker sets (parity with the SQL
# oracle matters more than linguistic accuracy)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(text)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def _ratio(matched_len: Column, total: Column) -> Column:
    return F.when(total > 0, matched_len.cast("double") / total.cast("double")).otherwise(0.0)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    kept = F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))
    return _ratio(kept, F.length(text))


def digit_ratio(text: Column) -> Column:
    kept = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return _ratio(kept, F.length(text))


def uppercase_ratio(text: Column) -> Column:
    kept = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    return _ratio(kept, F.length(text))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks).cast("double")).otherwise(
        0.0
    )


def mean_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")
    ).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score: length sweet spot, low punct/digit
    noise, presence of stopwords (prose-likeness).

    A simple, fully-declarative composite — the shape of a C4/Gopher
    style quality filter, kept deterministic for oracle parity.
    """
    n_tok = token_count(text)
    length_component = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5.0)
    digit_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio(text) * 5.0)
    stop_component = F.least(stopword_ratio(text) * 3.0, F.lit(1.0))
    return F.round(
        (length_component + punct_penalty + digit_penalty + stop_component) / 4.0, 6
    )


def language_id(text: Column) -> Column:
    """Argmax language over marker-token hit counts; 'und' when no
    marker hits. Ties break alphabetically (deterministic)."""
    toks = tokens(F.lower(text))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(markers))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct compares fields in order (score, then lang);
    # to make ties deterministic-alphabetical we negate via reverse
    # trick: pick max score, tie-break by SMALLEST lang label
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(
            (s["score"] > acc["score"]),
            s,
        ).otherwise(acc),
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the sorted set of
    lowercased tokens (word-order and duplication insensitive)."""
    toks = F.array_sort(F.array_distinct(tokens(F.lower(text))))
    return F.md5(F.concat_ws(" ", toks))


def ngram_repetition_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    (1 − distinct/total) — the Gopher-style repetition quality filter
    (Rae et al. 2021, "duplicate n-gram fraction"). 0.0 for documents
    with fewer than n tokens. Pure array expressions, JVM-side."""
    toks = tokens(F.lower(text))
    n_tokens = F.size(toks)
    n_grams = n_tokens - F.lit(n - 1)
    # build n-grams by zipping shifted slices — one O(m) slice per
    # offset instead of a per-element slice lambda (which costs an
    # array scan per n-gram in codegen)
    grams = F.slice(toks, 1, F.greatest(n_grams, F.lit(0)))
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(n_grams, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(
        n_grams >= 1,
        1.0 - F.size(F.array_distinct(grams)) / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))


def hash_split(
    id_col: Column,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> Column:
    """Deterministic train/validation/test assignment: the md5 of
    (salt|id) maps to [0, 1) and falls into cumulative weight
    buckets. Stable across runs, partitions, and engines — the
    reproducible replacement for randomSplit in training-data
    pipelines (and the same device l2g_trainer uses for group
    splits)."""
    weights = weights or {"train": 0.8, "validation": 0.1, "test": 0.1}
    bucket = hash_bucket(id_col, salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)


def gram_key(gram: Column, wide: bool = False) -> Column:
    """Shuffle key for an n-gram string: 8-byte ``xxhash64`` by
    default; ``wide=True`` upgrades to a two-salt 16-byte
    ``struct(xxhash64(g), xxhash64(g, 1))`` key. The 64-bit key has a
    birthday-collision tail at corpus scale (~10^4 falsely merged
    gram families at 10^12 grams — they only OVER-mark duplicates,
    never miss one); the two independent salts push the collision
    probability to the 128-bit regime (~10^-14 at 10^12 grams) at 2×
    the wire bytes. Struct keys hash/compare natively in Spark, so
    groupBy/join shapes are unchanged either way.
    """
    if wide:
        return F.struct(
            F.xxhash64(gram).alias("h0"),
            F.xxhash64(gram, F.lit(1)).alias("h1"),
        )
    return F.xxhash64(gram)


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined lowercase word n-grams in document
    order (duplicates kept — coverage metrics count occurrences).
    Built by zipping shifted slices: one O(m) slice per offset, not a
    per-element lambda."""
    toks = tokens(F.lower(text))
    n_grams = F.size(toks) - F.lit(n - 1)
    grams = F.slice(toks, 1, F.greatest(n_grams, F.lit(0)))
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(n_grams, F.lit(0)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return grams


def duplicate_ngram_coverage(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    wide_keys: bool = False,
) -> "DataFrame":
    """Inter-document duplicate n-gram coverage: per document, the
    fraction of its word n-gram occurrences whose gram also appears
    in at least one OTHER document — the cross-document substring
    duplication signal of Lee et al. (2022), "Deduplicating Training
    Data Makes Language Models Better", at n-gram granularity (their
    suffix-array spans, bucketed to fixed-width grams so the whole
    computation is two hash-shuffles).

    Scale shape: explode to (doc, gram) occurrences, then immediately
    collapse the gram STRING to a 64-bit xxhash so the wide text keys
    never cross the wire — every downstream shuffle (the per-gram
    distinct, the document-frequency aggregate, the join back) moves
    8-byte keys. A 64-bit collision merges two grams' document
    frequencies; at 10^9 distinct grams the birthday bound is ~3%
    for ONE merged pair corpus-wide, noise against the signal this
    statistic feeds — set ``wide_keys=True`` for the two-salt 128-bit
    struct key (:func:`gram_key`) at the 10^12-gram tail, 2× the
    wire bytes. Grams' document frequencies reduce with map-side
    combine on the high-cardinality key; one join back and a per-doc
    aggregate. No UDFs, no driver state. Documents with fewer than
    ``n`` tokens report coverage 0 over 0 grams.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    # r14: the gram source is the _gram_windows Arrow chain kernel —
    # the gram STRINGS are never materialized at all (the old form
    # built every space-joined 5-gram with k−1 interpreted zip_with
    # concat passes just to hash it one expression later). The key is
    # now the chained per-token hash instead of xxhash64(gramStr);
    # key equality is still window equality modulo the same 64-bit
    # birthday tail the docstring already budgets (wide_keys likewise
    # upgrades to the two-salt 128-bit struct in both forms), and the
    # oracle compares against true string grams either way. Collapse
    # to one row per (doc, gram) with a map-side-combining count.
    occ = (
        _gram_windows(df, text_col, id_col, n, wide_keys, checkpoint=False)
        .groupBy("docId", "gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    # rows are unique (doc, gram) pairs, so docs per gram >= 2
    # <=> gram is shared across documents. The document frequency
    # rides a window over the SAME (doc, gram) relation instead of a
    # separate aggregate joined back (r14) — one exchange of occ by
    # gram replaces the old agg-exchange + join-exchange pair.
    from pyspark.sql.window import Window  # noqa: PLC0415

    flagged = occ.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    )
    per_doc = flagged.groupBy("docId").agg(
        F.sum("_occ").alias("_n"),
        F.sum(
            F.when(F.col("_df") >= 2, F.col("_occ")).otherwise(0)
        ).alias("_dup"),
    )
    # the kernel emits nothing for documents with fewer than n tokens
    # (the old explode_outer kept them as null-gram marker rows) —
    # the left join from the corpus id set restores them as
    # (nGrams=0, coverage=0.0), exactly the old marker-row semantics
    return (
        df.select(F.col(id_col).alias("docId"))
        .distinct()
        .join(per_doc, on="docId", how="left")
        .select(
            "docId",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("nGrams"),
            F.when(F.col("_n") > 0, F.col("_dup") / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias("dupGramCoverage"),
        )
    )


# GPT-2-style pre-tokenizer, simplified to contraction suffixes /
# letter runs / digit runs / punctuation runs / whitespace, each with
# an optional leading space. Chosen so Java regex (Spark) and RE2
# (DuckDB) produce IDENTICAL leftmost-first matches — verified across
# punctuation, contractions, and non-ASCII text.
PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"
)


def pretokenize(text: Column) -> Column:
    """Array of pre-tokens (the BPE pre-segmentation). Pass the
    pattern as a Column literal — embedding it in a SQL string would
    eat the backslash escapes."""
    return F.regexp_extract_all(text, F.lit(PRETOKEN_PATTERN), F.lit(0))


def pretoken_stats(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Tokenizer-cost accounting per document: pre-token count and a
    BPE token-count estimate (each pre-token contributes
    max(1, ceil(len/4)) — the ~4-chars-per-token rule applied at
    pre-token granularity, so long words and punctuation runs are
    charged realistically). Pure Column expressions; null text counts
    as zero of both."""
    toks = pretokenize(F.col(text_col))
    est = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.greatest(F.lit(1).cast("long"), F.ceil(F.length(t) / 4.0)),
    )
    return df.select(
        F.col(id_col).alias("docId"),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("nPretokens"),
        F.coalesce(est, F.lit(0).cast("long")).alias("estBpeTokens"),
    )


def decontaminate(
    train: "DataFrame",
    eval_df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_matches: int = 1,
) -> "DataFrame":
    """Benchmark decontamination: flag training documents sharing word
    n-grams with an evaluation set (the standard n-gram-overlap
    decontamination used for LLM training corpora).

    Per train document: the number of DISTINCT n-grams it shares with
    ANY eval document, and isContaminated (>= ``min_matches``). Scale
    shape: the eval gram set is the small side — distinct gram hash
    join with map-side combine; the train explode is the only big
    scan. Documents shorter than ``n`` tokens are trivially clean.
    """
    train_grams = train.select(
        F.col(id_col).alias("docId"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).distinct()
    eval_grams = (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    matches = (
        train_grams.join(eval_grams, on="gram", how="inner")
        .groupBy("docId")
        .agg(F.count(F.lit(1)).alias("nMatchingGrams"))
    )
    return (
        train.select(F.col(id_col).alias("docId"))
        .distinct()
        .join(matches, on="docId", how="left")
        .select(
            "docId",
            F.coalesce("nMatchingGrams", F.lit(0)).cast("long").alias(
                "nMatchingGrams"
            ),
            (F.coalesce("nMatchingGrams", F.lit(0)) >= min_matches).alias(
                "isContaminated"
            ),
        )
    )


def tfidf_top_terms(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> "DataFrame":
    """Top-k characteristic terms per document by smoothed TF-IDF
    (tf · (ln((N+1)/(df+1)) + 1), the sklearn-style smooth idf).

    Scale shape: one explode to (doc, term) with a count aggregate
    (map-side combine), one broadcast-size term→df join keyed on the
    term, and a per-doc top-k window over at most |distinct terms per
    doc| rows. The corpus size N rides a broadcast crossJoin of a
    1-row aggregate (the operators/normalisation.py pattern), keeping
    the whole operator a single lazy plan — no driver-side collect.
    Ranking is on 6dp-rounded score with a term tiebreak so rank
    order is engine-reproducible.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.window import Window  # noqa: PLC0415

    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("_nDocs")
    )
    terms = (
        df.select(
            F.col(id_col).alias("docId"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("docId", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # r14: document frequency rides a window over the single
    # (doc, term) relation instead of a separate count aggregate
    # joined back — the old two-consumer form re-executed the
    # explode+groupBy subtree once per consumer (terms carried no
    # barrier); the window pays one term-key exchange of rows the
    # relation already owns. Same device as bm25_search/
    # duplicate_spans; df semantics unchanged (rows are unique
    # (doc, term), so the partition count IS the document frequency).
    scored = (
        terms.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "docId",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("_nDocs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("docId").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("docId", "term", "tfidf", "rank")
    )


def char_entropy_stats(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Shannon entropy (nats) of the lowercased character distribution
    per document — the classic gibberish/boilerplate quality signal
    (low entropy = repeated characters, high = noise). Computed as an
    explode → per-(doc, char) count → per-doc aggregate: two hash
    shuffles with map-side combine, no UDFs. Empty/null text scores
    0.0 over 0 characters.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from genetics_spark_coloc_spark.functions.stats import round_scaled_half_away

    # null-text docs contribute no characters; the left join below
    # restores them with 0/0.0 — mirroring the oracle's WHERE
    # text IS NOT NULL + LEFT JOIN shape
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("docId"),
            F.explode(F.split(F.lower(F.col(text_col)), "")).alias("ch"),
        )
        .filter(F.col("ch") != "")
        .groupBy("docId", "ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_doc = counts.groupBy("docId").agg(
        F.sum("n").alias("nChars"),
        (
            F.log(F.sum("n"))
            - F.sum(F.col("n") * F.log("n")) / F.sum("n")
        ).alias("entropy"),
    )
    return (
        df.select(F.col(id_col).alias("docId"))
        .distinct()
        .join(per_doc, on="docId", how="left")
        .select(
            "docId",
            F.coalesce("nChars", F.lit(0)).cast("long").alias("nChars"),
            round_scaled_half_away(F.coalesce("entropy", F.lit(0.0))).alias(
                "charEntropy"
            ),
        )
    )


def bigram_lm_score(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Corpus-trained bigram language-model quality signal — the
    perplexity-proxy filter CCNet-style pipelines apply before LLM
    training (Wenzek et al. 2020 score documents with a KenLM 5-gram;
    this is the same shape at bigram order, trained on the corpus
    itself so the operator is closed over its input).

    Model: add-one-smoothed conditional probabilities over the corpus
    vocabulary, P(w|v) = (c(v w) + 1) / (c_left(v) + V) with c_left
    the count of bigram occurrences led by v; per document the score
    is the mean natural-log probability over its bigram occurrences
    and ``perplexity`` = exp(−score). Documents with fewer than two
    tokens report 0 bigrams and null scores.

    Scale shape: one explode to (doc, bigram) occurrences reused by
    both consumers via a lineage-truncated relation. The log
    probability is a pure function of the DISTINCT bigram, so it is
    computed once per distinct bigram — the per-bigram count
    aggregate (map-side combine) joins the per-left-token aggregate
    on the distinct-key tables, and the 1-row vocabulary size rides
    a broadcast crossJoin — and only then joins back to occurrences:
    ONE big join on the bigram key instead of two, with the build
    side bounded by distinct-bigram (not occurrence) cardinality.
    One per-doc aggregate. No UDFs, no driver state.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    occ = df.select(
        F.col(id_col).alias("docId"),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("bigram"),
    ).localCheckpoint(eager=False)
    vocab = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    ).agg(F.countDistinct("tok").alias("_V"))
    big_counts = occ.groupBy("bigram").agg(F.count(F.lit(1)).alias("_cB"))
    left_counts = (
        occ.select(F.substring_index("bigram", " ", 1).alias("lft"))
        .groupBy("lft")
        .agg(F.count(F.lit(1)).alias("_cL"))
    )
    bigram_logp = (
        big_counts.withColumn("lft", F.substring_index("bigram", " ", 1))
        .join(left_counts, on="lft")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.log((F.col("_cB") + 1.0) / (F.col("_cL") + F.col("_V"))).alias(
                "_lp"
            ),
        )
    )
    scored = (
        occ.join(bigram_logp, on="bigram")
        .groupBy("docId")
        .agg(
            F.count(F.lit(1)).alias("nBigrams"),
            F.avg("_lp").alias("_alp"),
        )
    )
    return (
        df.select(F.col(id_col).alias("docId"))
        .distinct()
        .join(scored, on="docId", how="left")
        .select(
            "docId",
            F.coalesce("nBigrams", F.lit(0)).cast("long").alias("nBigrams"),
            F.round("_alp", 6).alias("avgLogProb"),
            F.round(F.exp(-F.col("_alp")), 6).alias("perplexity"),
        )
    )


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Deterministic [0, 1) bucket from md5(salt|id) — the shared
    device under ``hash_split`` and ``stratified_hash_sample``.
    Different salts give independent buckets, so split assignment and
    sampling decisions don't correlate."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )


def stratified_hash_sample(
    df: "DataFrame",
    stratum: Column,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "sample-v1",
) -> "DataFrame":
    """Per-stratum deterministic downsampling — the mixture-rebalance
    step of pre-training pipelines (downweight dominant languages or
    domains to a target mix, as in the Pile / ROOTS corpus recipes)
    without randomSplit's run-to-run nondeterminism.

    A row is kept iff its ``hash_bucket(id, salt)`` falls below its
    stratum's rate; unlisted strata keep ``default_rate``. Membership
    depends only on (salt, id), so the sample is reproducible across
    runs, partitions, and engines, and the realized rate concentrates
    on the target by the usual hash-uniformity argument. Pure Column
    predicate — at 100 TB this is a pushed-down filter, no shuffle.

    Adds ``stratum`` and ``samplingRate`` columns for audit.
    """
    rate: Column | None = None
    for name, r in sorted(rates.items()):
        cond = stratum == name
        rate = (
            F.when(cond, F.lit(float(r)))
            if rate is None
            else rate.when(cond, F.lit(float(r)))
        )
    rate_col = (
        rate.otherwise(F.lit(float(default_rate)))
        if rate is not None
        else F.lit(float(default_rate))
    )
    out = df.withColumn("stratum", stratum).withColumn("samplingRate", rate_col)
    return out.filter(hash_bucket(F.col(id_col), salt) < F.col("samplingRate"))


def temperature_mixture(
    df: "DataFrame",
    stratum: Column,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> "DataFrame":
    """Temperature-weighted mixture rebalance: sampling rates are
    DERIVED from the corpus's own stratum counts instead of supplied
    — rate_s = (n_s / n_min)^(α−1), the exponential smoothing of
    multilingual pre-training recipes (XLM-R's p_i ∝ n_i^α, Conneau
    et al. 2020; same family as DoReMi's domain reweighting). α=1
    keeps the natural mix (all rates 1), α=0 flattens every stratum
    down to the rarest one's share, 0<α<1 interpolates. The rarest
    stratum's rate is exactly 1 by construction — rebalance only ever
    downsamples, so membership stays a per-row hash test.

    Shape at scale: one tiny groupBy-count (strata cardinality rows),
    a broadcast scalar min, a broadcast join of the rates back onto
    the corpus, then the same deterministic ``hash_bucket`` filter
    ``stratified_hash_sample`` uses — the big relation is touched by
    exactly one scan + broadcast-hash-join, no repartition. Rates are
    rounded at 6dp BEFORE the membership test so both engines compare
    the same threshold. Rows with a NULL stratum count as their own
    stratum (null-safe join), matching SQL GROUP BY semantics.

    Adds ``stratum`` and ``samplingRate`` for audit, like
    :func:`stratified_hash_sample`.
    """
    counts = df.groupBy(stratum.alias("stratum")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # truncate the tiny counts relation's lineage: without this,
    # Catalyst re-expands the aggregate under the min() subtree and
    # the corpus is scanned a second time just to derive n_min
    counts = counts.localCheckpoint(eager=False)
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "stratum",
        F.round(
            F.pow(
                F.col("_n").cast("double") / F.col("_nmin").cast("double"),
                F.lit(float(alpha) - 1.0),
            ),
            6,
        ).alias("samplingRate"),
    )
    tagged = df.withColumn("stratum", stratum)
    out = tagged.join(
        F.broadcast(rates),
        tagged["stratum"].eqNullSafe(rates["stratum"]),
    ).drop(rates["stratum"])
    return out.filter(
        hash_bucket(F.col(id_col), salt) < F.col("samplingRate")
    )


def classifier_score(
    df: "DataFrame",
    weights: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
    threshold: float = 0.5,
) -> "DataFrame":
    """Linear bag-of-words quality classifier — the model-based
    document filter of CCNet / LLaMA-style pipelines (a fasttext-like
    scorer deciding keep/drop), expressed as pure relational algebra
    so the MODEL is data, not code: ``weights`` is a (term, weight)
    table, score = σ(bias + mean of the document's token weights),
    unknown tokens contribute 0 (they still count in the mean, the
    bag-average convention). Rule-based filters (gopher_quality) and
    this learned filter intentionally share the same tokenizer.

    Shape at scale: tokenize + explode (no shuffle — stays in the
    scan stage), broadcast-hash left join against the vocabulary
    (a fasttext vocab is ~1M rows — squarely broadcast territory),
    then ONE map-side-combined groupBy on the document key. Empty
    documents score σ(bias).

    Output: (docId, nTokens, meanWeight, score, label) with floats
    rounded at 6dp.
    """
    toks = df.select(
        F.col(id_col).alias("docId"),
        # NULL text scores like an empty document (σ(bias)), not a
        # null-propagated row — the keep/drop decision must be total
        F.coalesce(
            tokens(F.lower(F.col(text_col))),
            F.array().cast("array<string>"),
        ).alias("_toks"),
    ).select(
        "docId",
        F.size("_toks").alias("nTokens"),
        F.explode_outer("_toks").alias("term"),
    )
    scored = (
        toks.join(F.broadcast(weights), on="term", how="left")
        .groupBy("docId")
        .agg(
            F.max("nTokens").alias("nTokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_wsum"),
        )
        .withColumn(
            "meanWeight",
            F.when(
                F.col("nTokens") > 0, F.col("_wsum") / F.col("nTokens")
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_logit", F.lit(float(bias)) + F.col("meanWeight")
        )
        .withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_logit"))))
    )
    return scored.select(
        "docId",
        "nTokens",
        F.round("meanWeight", 6).alias("meanWeight"),
        F.round("score", 6).alias("score"),
        (F.col("score") >= F.lit(float(threshold))).alias("label"),
    )


# PII pattern family — one definition shared by the counter and the
# redactor so they can never disagree. Patterns are written in the
# common subset of Java regex (Spark) and RE2 (DuckDB oracles):
# no backrefs, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "longDigits": (r"\d{9,}", "<NUM>"),
}


def pii_stats(text: Column) -> dict[str, Column]:
    """Per-document PII pattern counts — the pre-training privacy
    filter primitive (count/flag before redaction or drop). Returns
    {name: count Column}; all JVM-side regexp_extract_all, no UDFs."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its placeholder token, applied in
    PII_PATTERNS order (emails before digit runs, so an address is
    redacted as one unit rather than leaving '<NUM>@host'). Pure
    regexp_replace chain — a pushed-down projection at any scale."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def gopher_quality(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> "DataFrame":
    """The published Gopher quality-rule family (Rae et al. 2021,
    "Scaling Language Models", Appendix A "MassiveWeb" filters) as one
    shuffle-free projection: per document, one boolean per rule plus
    the conjunction ``keep`` — word-count window, mean word length
    window, symbol-to-word ratio (# and ellipsis), bullet-start and
    ellipsis-end line fractions, alphabetic-word fraction, and
    stopword presence. Emitting per-rule booleans (not just the
    verdict) is what makes the filter auditable: rejection-reason
    distributions are one groupBy away. Pure Column expressions in
    the Java-regex∩RE2 subset; thresholds are the paper's defaults.
    """
    rules = gopher_rules(
        F.col(text_col),
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        max_ellipsis_line_frac=max_ellipsis_line_frac,
        max_bullet_line_frac=max_bullet_line_frac,
        min_alpha_word_frac=min_alpha_word_frac,
        min_stopword_hits=min_stopword_hits,
    )
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col).alias("docId"),
        *[c.alias(n) for n, c in rules.items()],
        keep.alias("keep"),
    )


def gopher_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> "dict[str, Column]":
    """The Gopher rule family as pure COLUMN expressions ({name:
    boolean Column}) — the composable form behind
    :func:`gopher_quality`, reusable wherever a flag must ride an
    existing projection (the streaming curation route cannot join)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    # null text behaves as empty (rejected by the word-count rule) on
    # both engines, instead of riding engine-specific null semantics
    txt = F.coalesce(text, F.lit(""))
    toks = tokens(txt)
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_len = F.when(
        n_words > 0, total_len.cast("double") / n_words.cast("double")
    ).otherwise(0.0)
    n_symbols = (
        F.length(txt)
        - F.length(F.regexp_replace(txt, r"#", ""))
        + F.size(F.regexp_extract_all(txt, F.lit(r"\.\.\."), 0))
    )
    lines = F.split(txt, r"\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]"))
    )
    ellipsis_lines = F.size(F.filter(lines, lambda ln: ln.rlike(r"\.\.\.\s*$")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]")))
    stop_hits = F.size(
        F.filter(tokens(F.lower(txt)), lambda t: t.isin(STOPWORDS))
    )

    rules = {
        "okWordCount": (n_words >= min_words) & (n_words <= max_words),
        "okMeanWordLen": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "okSymbolRatio": F.when(
            n_words > 0,
            n_symbols.cast("double") / n_words.cast("double")
            <= max_symbol_word_ratio,
        ).otherwise(F.lit(False)),
        "okBulletLines": F.when(
            n_lines > 0,
            bullet_lines.cast("double") / n_lines.cast("double")
            <= max_bullet_line_frac,
        ).otherwise(F.lit(False)),
        "okEllipsisLines": F.when(
            n_lines > 0,
            ellipsis_lines.cast("double") / n_lines.cast("double")
            <= max_ellipsis_line_frac,
        ).otherwise(F.lit(False)),
        "okAlphaWords": F.when(
            n_words > 0,
            alpha_words.cast("double") / n_words.cast("double")
            >= min_alpha_word_frac,
        ).otherwise(F.lit(False)),
        "okStopwords": stop_hits >= min_stopword_hits,
    }
    return rules


def duplicate_line_stats(text: Column) -> dict[str, Column]:
    """Line-level repetition signals from the Gopher repetition
    family (Rae et al. 2021, Appendix A: "duplicate line fraction"
    and "duplicate line character fraction"): the fraction of lines
    that are exact repeats of another line, and the fraction of
    non-newline characters living inside such repeated lines.

    Pure array expressions via a SORTED-RUNS formulation: sort the
    lines, mark positions equal to a neighbour (members of a
    duplicate run), count/weigh those. O(L log L) per document with
    only flat vector expressions — the naive per-line
    filter-within-transform is O(L²) AND re-inlines the line-array
    expression per element under Catalyst's projection collapse,
    which turned a 5k-doc corpus of ~150-line documents into minutes.
    Returns {nLines, dupLineFrac, dupLineCharFrac}.
    """
    lines = F.split(F.coalesce(text, F.lit("")), r"\n")
    n_lines = F.size(lines)
    srt = F.array_sort(lines)
    head = F.slice(srt, 1, F.greatest(n_lines - 1, F.lit(0)))
    tail = F.slice(srt, 2, F.greatest(n_lines - 1, F.lit(0)))
    eq_next = F.zip_with(head, tail, lambda a, b: a == b)
    false1 = F.array(F.lit(False))
    in_run = F.zip_with(
        F.concat(false1, eq_next),  # equals-previous, per position
        F.concat(eq_next, false1),  # equals-next, per position
        lambda a, b: a | b,
    )
    dup_lines = F.size(F.filter(in_run, lambda x: x))
    total_chars = F.aggregate(lines, F.lit(0), lambda a, ln: a + F.length(ln))
    dup_chars = F.aggregate(
        F.zip_with(
            srt, in_run, lambda ln, f: F.when(f, F.length(ln)).otherwise(F.lit(0))
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return {
        "nLines": n_lines.cast("long"),
        "dupLineFrac": F.when(
            n_lines > 0, dup_lines.cast("double") / n_lines.cast("double")
        ).otherwise(0.0),
        "dupLineCharFrac": F.when(
            total_chars > 0, dup_chars.cast("double") / total_chars.cast("double")
        ).otherwise(0.0),
    }


def chunk_documents(
    df: "DataFrame",
    max_tokens: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Sliding-window document chunking — the long-document splitter
    of training-prep pipelines (HF ``return_overflowing_tokens``
    semantics): windows of ``max_tokens`` tokens starting every
    ``stride`` tokens (overlap = max_tokens − stride), stopping once
    a window reaches the end, so no chunk is fully contained in its
    predecessor. Documents with ≤ max_tokens tokens (including empty
    ones) yield exactly one chunk.

    Pure array expressions: tokenize once, ``sequence`` out the chunk
    starts, slice + rejoin per chunk — a flatMap-shaped projection
    with no shuffle and no UDF; chunk explosion is bounded by
    ~n_tokens/stride per document.

    Emits (docId, chunkIdx, startTok, nChunkTokens, chunkText).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if stride <= 0 or max_tokens <= 0 or stride > max_tokens:
        raise ValueError(
            f"chunk_documents: need 0 < stride <= max_tokens, got "
            f"stride={stride} max_tokens={max_tokens}"
        )
    toks = F.coalesce(
        tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    n = F.size(toks)
    # 1 chunk when n <= max_tokens, else ceil((n-max)/stride)+1
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.floor(
            (n - F.lit(max_tokens) + F.lit(stride - 1)) / F.lit(stride)
        ).cast("int")
        + F.lit(1)
    )
    return (
        df.select(
            F.col(id_col).alias("docId"),
            toks.alias("_toks"),
            n.alias("_n"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunkIdx"),
        )
        .withColumn("startTok", F.col("chunkIdx") * F.lit(stride))
        .select(
            "docId",
            "chunkIdx",
            "startTok",
            F.least(
                F.lit(max_tokens), F.col("_n") - F.col("startTok")
            ).alias("nChunkTokens"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("startTok") + 1, F.lit(max_tokens)),
                " ",
            ).alias("chunkText"),
        )
    )


def interleave_order(
    df: "DataFrame",
    source: Column,
    id_col: str = "doc_id",
    salt: str = "epoch-0",
) -> "DataFrame":
    """Deterministic balanced training order: shuffle WITHIN each
    source by a salted hash, then interleave sources round-robin —
    consecutive training samples rotate across domains instead of
    clumping (the source-stratified shuffle of pretraining loaders),
    and changing ``salt`` ("epoch-1", …) reshuffles every epoch
    reproducibly.

    The order is defined by the emitted key pair, NOT a global row
    number: consumers ``orderBy(roundIdx, orderKey)``, which Spark
    executes as a range-partitioned distributed sort — no
    single-partition window anywhere. ``roundIdx`` is the row's rank
    within its source (one shuffle, partitioned by source);
    ``orderKey`` is the salted md5 that both drives the within-source
    shuffle and breaks ties across sources inside a round.

    Emits (docId, source, roundIdx, orderKey).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.window import Window  # noqa: PLC0415

    key = F.md5(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("source").orderBy("orderKey")
    return (
        df.select(
            F.col(id_col).alias("docId"),
            source.alias("source"),
            key.alias("orderKey"),
        )
        .withColumn("roundIdx", F.row_number().over(w))
        .select("docId", "source", "roundIdx", "orderKey")
    )


def pack_sequences(
    df: "DataFrame",
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """GPT-style contiguous sequence packing: documents are laid out
    in deterministic ``id`` order, token counts accumulate, and each
    document is assigned the training sequence (bin) its first token
    falls into — the concat-then-chunk packing used to build
    fixed-length pretraining batches, as an assignment table instead
    of a materialized token stream.

    Emits (docId, nTokens, seqId, offsetInSeq, spansBoundary):
    ``offsetInSeq`` is where the document starts inside its sequence
    and ``spansBoundary`` marks documents crossing a chunk edge (the
    ones a loss mask or document-attention reset must handle).

    Scale shape: one global sort-by-id window for the running token
    sum. A single total-order window is the honest cost of contiguous
    packing (the layout IS a global order); for corpora where that
    matters, pre-partition by shard key and pack within shards —
    the same operator applied per shard via partitionBy.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.window import Window  # noqa: PLC0415

    toks = token_count(F.col(text_col))
    out = df.select(
        F.col(id_col).alias("docId"), toks.alias("nTokens")
    ).withColumn(
        "startTok",
        F.coalesce(
            F.sum("nTokens").over(
                # global token offsets are intrinsically a sequential
                # prefix sum — single partition is the semantics, not
                # an accident; see the shard-via-partitionBy note above
                Window.partitionBy(declared_single_partition(F.col("docId")))
                .orderBy(F.col("docId"))
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return out.select(
        "docId",
        "nTokens",
        F.floor(F.col("startTok") / seq_len).cast("long").alias("seqId"),
        (F.col("startTok") % seq_len).cast("long").alias("offsetInSeq"),
        (
            F.floor(F.col("startTok") / seq_len)
            != F.floor(
                (F.col("startTok") + F.greatest(F.col("nTokens") - 1, F.lit(0)))
                / seq_len
            )
        ).alias("spansBoundary"),
    )


def bpe_top_merges(
    df: "DataFrame",
    k: int = 20,
    text_col: str = "text",
) -> "DataFrame":
    """First-iteration BPE merge candidates: corpus-wide counts of
    ADJACENT token pairs, top-k by frequency — the statistic each BPE
    training round is built on (Sennrich et al. 2016). Full BPE
    training is inherently sequential (each merge changes the next
    round's pair counts); at corpus scale the per-round primitive is
    exactly this distributed count, re-run per merge on the rewritten
    corpus — so this operator IS the distributed inner loop, exposed
    once.

    Shape: zip each token array with its own tail (one O(m) slice,
    no per-element lambda), explode, one map-side-combined count,
    TakeOrderedAndProject top-k — no global sort, no UDF.

    Emits (pair, pairCount) ordered by (count desc, pair asc).
    """
    toks = tokens(F.lower(F.col(text_col)))
    n_pairs = F.size(toks) - F.lit(1)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n_pairs, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_pairs, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        df.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("pairCount"))
        .orderBy(F.desc("pairCount"), F.asc("pair"))
        .limit(k)
    )


def strip_boilerplate(
    df: "DataFrame",
    lines: Column,
    id_col: str = "doc_id",
    max_df: int = 10,
) -> "DataFrame":
    """Corpus-level boilerplate line removal — the RefinedWeb/CCNet
    step that strips lines occurring in many documents (cookie
    banners, navigation, licence footers): a line appearing in more
    than ``max_df`` distinct documents is dropped from every
    document; order of surviving lines is preserved.

    Shape at scale: explode to (doc, pos, line), collapse the line
    STRING to xxhash64 before the document-frequency shuffle (8-byte
    keys on the wire — same device as duplicate_ngram_coverage), one
    distinct-per-doc count with map-side combine, one hash join back,
    then a per-doc collect_list(struct(pos, line)) sorted by position
    to rebuild the cleaned text. Three narrow shuffles, no UDF.

    Emits (docId, nLines, nKept, cleanedText); documents whose lines
    are ALL boilerplate keep a row with empty cleanedText.
    """
    occ = df.select(
        F.col(id_col).alias("docId"), F.posexplode_outer(lines).alias("pos", "line")
    ).withColumn(
        "lineHash",
        F.when(F.col("line").isNotNull(), F.xxhash64("line")),
    )
    dfreq = (
        occ.filter(F.col("lineHash").isNotNull())
        .select("lineHash", "docId")
        .distinct()
        .groupBy("lineHash")
        .agg(F.count(F.lit(1)).alias("lineDf"))
    )
    kept = (
        occ.join(dfreq, on="lineHash", how="left")
        .withColumn(
            "_keep",
            F.col("line").isNotNull() & (F.col("lineDf") <= F.lit(max_df)),
        )
    )
    return (
        kept.groupBy("docId")
        .agg(
            F.sum(F.when(F.col("line").isNotNull(), 1).otherwise(0)).alias(
                "nLines"
            ),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("nKept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("cleanedText"),
        )
    )


# URL canonicalization patterns, written in the Java-regex ∩ RE2
# subset (no lookaround/backrefs) so the DuckDB oracles replay them
# Anchored at a query-param boundary ([?&]) so a parameter whose NAME
# merely ends in "ref" (href=, pref=, xref=) is left intact; the
# separator is captured and re-emitted so the existing cleanup chain
# ('&&+' → '&', '?&' → '?', trailing '[?&]+') still collapses the gap.
_URL_TRACKING_PARAM = r"([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-level deduplication
    (CommonCrawl/CCNet convention): lowercase scheme+host, drop the
    fragment, drop tracking query parameters (utm_*, fbclid, gclid,
    ref), collapse an emptied query string, strip a trailing slash on
    the path. Pure regexp_replace chain — a pushed-down projection.
    """
    # lowercase scheme://host only (path/query stay case-sensitive)
    c = F.concat(
        F.lower(F.regexp_extract(url, r"^([a-zA-Z]+://[^/]*)", 1)),
        F.regexp_replace(url, r"^[a-zA-Z]+://[^/]*", ""),
    )
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    c = F.regexp_replace(c, _URL_TRACKING_PARAM, "$1")  # tracking params
    # separator cleanup ORDER matters: collapse doubled '&' runs
    # first, then a '?&' dangler, then a fully-emptied query, then
    # a path slash directly before '?' , then a trailing slash
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/\?", "?")
    c = F.regexp_replace(c, r"/$", "")
    return c


def url_dedup(
    df: "DataFrame",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> "DataFrame":
    """URL-level exact deduplication after canonicalization — the
    cheapest dedup pass of a crawl pipeline, run before any content
    hashing: one projection + one hash groupBy on the canonical URL,
    keeper = smallest id (deterministic). Emits the input ids with
    (canonicalUrl, urlGroupSize, isKeeper)."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    canon = df.select(
        F.col(id_col).alias("docId"),
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canonicalUrl"),
    )
    w_min = Window.partitionBy("canonicalUrl")
    return canon.select(
        "docId",
        "url",
        "canonicalUrl",
        F.count(F.lit(1)).over(w_min).cast("long").alias("urlGroupSize"),
        (F.col("docId") == F.min("docId").over(w_min)).alias("isKeeper"),
    )


def _gram_windows(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    k: int,
    wide_keys: bool,
    checkpoint: bool = True,
) -> "DataFrame":
    """(docId, start, gram) — every k-token window of every document
    with its hashed shuffle key: the shared first stage of
    :func:`duplicate_spans` and :func:`verbatim_match_spans`.
    Composite callers (duplicate_span_lengths) build this ONCE and
    pass it to both via their ``windows=`` parameter, so the dominant
    tokenize+n-gram corpus scan runs once, not twice.

    Two measured optimizations over the naive string-gram build:

    - keys are CHAINED token hashes, never materialized gram strings:
      each token hashes once, then k−1 zip_with passes fold
      ``xxhash64(acc, next)`` over shifted long slices — O(n·k) long
      hash ops with zero string allocation, vs the string build's
      O(n·k²) character copies (A/B at sf0.1: 1.00 vs 1.14 s at k=5,
      2.80 vs 2.99 s at k=20). Key equality is window equality
      modulo the same 64-bit birthday tail as hashing the string
      (``wide_keys`` chains a second salt for the 128-bit regime).
    - the result carries a lineage barrier: EVERY consumer reads the
      windows twice (gram-frequency aggregate + join back onto the
      occurrences), and without the barrier the whole tokenize+hash
      corpus scan runs once per reference.
    """
    # The k−1 chained zip_with(xxhash64) passes are CodegenFallback —
    # every element pays the interpreted HigherOrderFunction evaluator,
    # and the chain dominated verbatim_removal's corpus scan (~2.8 s of
    # its 3.6 s at sf0.1, k=20). The chain is pure uint64 arithmetic,
    # so it now runs as a vectorized Arrow kernel (guide §4.2) over the
    # SAME per-token JVM hashes — functions/xxh.py replicates
    # XXH64.hashLong bit-for-bit, so the emitted gram keys are
    # IDENTICAL to the column form's (parity pinned by
    # tests/test_gram_kernel_parity.py against _gram_windows_column).
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from genetics_spark_coloc_spark.functions.xxh import (
        _SEED,
        xxh64_hash_long,
    )

    toks = tokens(F.lower(F.col(text_col)))
    cols = [
        F.col(id_col).alias("docId"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("th"),
    ]
    if wide_keys:
        cols.append(
            F.transform(toks, lambda t: F.xxhash64(t, F.lit(1))).alias("th1")
        )
    src = df.select(*cols)
    did_type = src.schema["docId"].dataType.simpleString()
    gram_type = "struct<h0:bigint,h1:bigint>" if wide_keys else "bigint"
    out_schema = f"docId {did_type}, start int, gram {gram_type}"

    def _chain(vals: "np.ndarray", idx: "np.ndarray") -> "np.ndarray":
        g = vals[idx]
        for j in range(1, k):
            g = xxh64_hash_long(vals[idx + j], xxh64_hash_long(g, _SEED))
        return g

    def _windows(batches):
        for batch in batches:
            th = batch.column(1)
            lens = (
                pc.list_value_length(th)
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            n_grams = np.maximum(lens - (k - 1), 0)
            total = int(n_grams.sum())
            if total == 0:
                continue
            vals = (
                th.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .view(np.uint64)
            )
            doc_off = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=doc_off[1:])
            gram_cum = np.zeros(len(n_grams), dtype=np.int64)
            np.cumsum(n_grams[:-1], out=gram_cum[1:])
            doc_idx = np.repeat(np.arange(len(lens)), n_grams)
            within = np.arange(total) - np.repeat(gram_cum, n_grams)
            idx = doc_off[doc_idx] + within
            g0 = pa.array(_chain(vals, idx).view(np.int64), type=pa.int64())
            if wide_keys:
                v1 = (
                    batch.column(2)
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    .view(np.uint64)
                )
                gram = pa.StructArray.from_arrays(
                    [
                        g0,
                        pa.array(
                            _chain(v1, idx).view(np.int64), type=pa.int64()
                        ),
                    ],
                    names=["h0", "h1"],
                )
            else:
                gram = g0
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(batch.column(0), pa.array(doc_idx)),
                    pa.array(within.astype(np.int32), type=pa.int32()),
                    gram,
                ],
                names=["docId", "start", "gram"],
            )

    out = src.mapInArrow(_windows, out_schema)
    # single-consumer callers (duplicate_ngram_coverage) skip the
    # barrier: the windows feed exactly one aggregate, so there is no
    # recompute to bound and the checkpoint would only add a store
    return out.localCheckpoint(eager=False) if checkpoint else out


def _gram_windows_column(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    k: int,
    wide_keys: bool,
) -> "DataFrame":
    """The pre-r14 pure-Column form of :func:`_gram_windows` — k−1
    interpreted ``zip_with(xxhash64)`` passes. Kept as the parity
    reference for the Arrow kernel (tests/test_gram_kernel_parity.py
    asserts bit-identical output); not used by any query path."""
    toks = tokens(F.lower(F.col(text_col)))
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n_grams = F.greatest(F.size(tok_hashes) - F.lit(k - 1), F.lit(0))

    def chain(seed_salted):
        g = F.slice(seed_salted, 1, n_grams)
        for j in range(1, k):
            shifted = F.slice(seed_salted, j + 1, n_grams)
            g = F.zip_with(g, shifted, lambda a, b: F.xxhash64(a, b))
        return g

    if wide_keys:
        tok_hashes_1 = F.transform(toks, lambda t: F.xxhash64(t, F.lit(1)))
        keys = F.zip_with(
            chain(tok_hashes),
            chain(tok_hashes_1),
            lambda a, b: F.struct(a.alias("h0"), b.alias("h1")),
        )
    else:
        keys = chain(tok_hashes)
    return df.select(
        F.col(id_col).alias("docId"),
        F.posexplode(keys).alias("start", "gram"),
    ).localCheckpoint(eager=False)


def duplicate_spans(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    wide_keys: bool = False,
    windows: "DataFrame | None" = None,
) -> "DataFrame":
    """Exact substring-duplicate SPAN extraction — the span-level form
    of Lee et al. (2022) suffix-array dedup, re-expressed for Spark:
    a token position is duplicated iff it lies inside some
    ``min_tokens``-token window whose (lowercased) text occurs MORE
    THAN ONCE in the corpus (any document, any position — self-repeats
    count, matching the suffix-array semantics). Overlapping and
    abutting duplicated windows are merged into maximal spans, so each
    output row is one contiguous duplicated region.

    Scale shape: windows come from shifted-slice zips (no per-element
    lambda), are collapsed to 64-bit xxhash before the frequency
    shuffle (8-byte keys on the wire, map-side combine; set
    ``wide_keys=True`` for the two-salt 128-bit key — see
    :func:`gram_key` — at the ~10^12-gram collision tail), one hash
    join back, then a per-doc lag window + running-sum island merge —
    the same device as sessionization. No UDFs; the only wide
    relations shuffle on 8- or 16-byte or (docId) keys.

    Emits one row per maximal span: (docId, spanStart, spanEnd,
    spanTokens) with token offsets [spanStart, spanEnd). Documents
    with no duplicated window produce no rows.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    k = min_tokens
    wins = (
        windows
        if windows is not None
        else _gram_windows(df, text_col, id_col, k, wide_keys)
    )
    # r14: duplicated-gram detection rides a window over the single
    # gram-key exchange instead of a separate count aggregate joined
    # back (which shuffled the windows relation twice and re-read the
    # checkpoint per consumer) — same device as bm25_search's df
    # rewrite; occurrence semantics identical.
    dup = (
        wins.withColumn(
            "_cnt", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        )
        .filter(F.col("_cnt") >= 2)
        .select("docId", "start")
    )
    w = Window.partitionBy("docId").orderBy("start")
    run = Window.partitionBy("docId").orderBy("start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # two windows [s0,s0+k) [s1,s1+k) merge when s1 <= s0 + k
    # (overlap or exact abutment -> one contiguous duplicated region)
    islands = dup.withColumn(
        "_brk",
        F.when(
            F.col("start") - F.lag("start").over(w) > F.lit(k), 1
        ).otherwise(0),
    ).withColumn("islandId", F.sum("_brk").over(run))
    return (
        islands.groupBy("docId", "islandId")
        .agg(
            F.min("start").cast("long").alias("spanStart"),
            (F.max("start") + F.lit(k)).cast("long").alias("spanEnd"),
        )
        .select(
            "docId",
            "spanStart",
            "spanEnd",
            (F.col("spanEnd") - F.col("spanStart")).alias("spanTokens"),
        )
    )


def remove_duplicate_spans(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    wide_keys: bool = False,
) -> "DataFrame":
    """Lee et al. (2022) substring-duplicate REMOVAL: cut every
    maximal duplicated span found by :func:`duplicate_spans` out of
    each document and rebuild the text from the surviving tokens
    (original case; matching is case-insensitive like the span
    finder). One extra groupBy(docId) to gather a doc's spans plus
    one join back to the corpus; the token filter is a JVM array
    lambda over (token, index), O(tokens x spans) per document with
    spans typically tiny.

    Emits (docId, nTokens, nDupTokens, cleanedText) for EVERY input
    document; untouched documents keep their (whitespace-normalised)
    text with nDupTokens = 0.
    """
    spans = duplicate_spans(df, text_col, id_col, min_tokens, wide_keys)
    per_doc = spans.groupBy("docId").agg(
        F.collect_list(F.struct("spanStart", "spanEnd")).alias("_spans"),
        F.sum("spanTokens").alias("_nDup"),
    )
    base = df.select(
        F.col(id_col).alias("docId"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    joined = base.join(per_doc, on="docId", how="left")
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(
            F.col("_toks"),
            lambda t, i: ~F.exists(
                F.col("_spans"),
                lambda s: (i >= s["spanStart"]) & (i < s["spanEnd"]),
            ),
        )
    )
    return joined.select(
        "docId",
        F.coalesce(F.size("_toks"), F.lit(-1)).cast("long").alias("nTokens"),
        F.coalesce(F.col("_nDup"), F.lit(0)).cast("long").alias("nDupTokens"),
        F.concat_ws(" ", kept).alias("cleanedText"),
    )


def verbatim_match_spans(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_gram_freq: "int | None" = None,
    wide_keys: bool = False,
    windows: "DataFrame | None" = None,
    hot_gram_ceiling: "int | None" = 10_000,
    on_hot_gram: str = "raise",
) -> "DataFrame":
    """EXACT maximal verbatim matches of >= ``min_tokens`` tokens —
    the true maximal-match-length semantics of Lee et al. (2022)
    suffix-array dedup, which :func:`duplicate_spans` islands only
    bound from above: a 200-token verbatim copy reports ONE row with
    matchTokens=200, while an island chained from unrelated 5-token
    matches reports several short rows.

    Device: occurrences of duplicated ``min_tokens``-grams self-join
    on the gram key; a pair of occurrences (left doc/pos, right
    doc/pos) lies on the diagonal (leftId, rightId, leftStart −
    rightStart), and a verbatim copy of L tokens is exactly a run of
    L−k+1 CONSECUTIVE leftStart values on one diagonal (each step
    extends the match by one token; the run ends precisely where the
    texts diverge). Runs are found with the same lag + running-sum
    island device as sessionization — no UDF anywhere.

    Scale shape: grams collapse to hashed keys before the frequency
    shuffle and the pair join (``wide_keys=True`` upgrades to the
    two-salt 128-bit struct key — see :func:`gram_key` — for
    corpora at the ~10^12-gram birthday-collision tail). The pair
    join is quadratic in per-gram frequency; ``max_gram_freq`` caps
    it by EXCLUDING grams above the cap from pairing (boilerplate
    stop-grams), under-reporting matches that only run through such
    grams — the standard suffix-filter trade, off by default.

    Hot-gram guard: with ``max_gram_freq`` unset nothing else bounds
    the Σfreq² pair join — one 10⁶-occurrence boilerplate gram
    (license headers, templated pages) is 10¹² pairs. Mirroring
    connected_components' loud-failure convergence guard, any
    pairable gram whose frequency exceeds ``hot_gram_ceiling``
    (default 10⁴) fails the job at execution time with the offending
    frequency in the message (``on_hot_gram="raise"``, via an
    assert_true that rides the existing counts aggregate — zero extra
    scans or driver actions) or is excluded from pairing like an
    explicit cap (``on_hot_gram="cap"``). ``hot_gram_ceiling=None``
    disables the guard; an explicit ``max_gram_freq`` supersedes it.

    Pairs are canonical ((leftId, leftStart) < (rightId, rightStart)
    lexicographically), so each match is reported once. Output:
    (leftId, rightId, leftStart, rightStart, matchTokens); token
    matching is lowercased, offsets are 0-based token positions.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    from genetics_spark_coloc_spark.functions.guards import (
        hot_count_filter,
        validate_on_hot,
    )

    validate_on_hot(on_hot_gram, "verbatim_match_spans")
    k = min_tokens
    wins = (
        windows
        if windows is not None
        else _gram_windows(df, text_col, id_col, k, wide_keys)
    )
    # r14: the duplicated-gram prefilter rides a window count over the
    # single gram-key exchange instead of a separate counts aggregate
    # joined back (two gram-keyed passes over the windows relation
    # saved); the freq>=2 filter, the explicit max_gram_freq cap, and
    # the hot-gram guard are all predicates on that same windowed
    # count. Pairing stays a gram-keyed equi self-join — the grouped-
    # explode device the LSH/winnow family uses was ALSO drilled here
    # and rejected: with no expensive per-side subtree to save (wins
    # is already a checkpoint barrier), collect_list pushes the
    # aggregate into interpreted ObjectHashAggregate and the
    # slice-per-position explode copies each posting list O(m) times
    # (measured at sf0.1: join 1.42 s / grouped 1.32 s / this form
    # 0.86 s at k=5; 1.17 / 0.67 / 0.49 at k=20).
    occ = wins.withColumn(
        "_cnt", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    ).filter(F.col("_cnt") >= 2)
    if max_gram_freq is not None:
        occ = occ.filter(F.col("_cnt") <= max_gram_freq)
    else:
        occ = hot_count_filter(
            occ,
            "_cnt",
            hot_gram_ceiling,
            on_hot_gram,
            "verbatim_match_spans",
            param_hint="on_hot_gram",
        )
    occ = occ.select("gram", "docId", "start")
    left = occ.select(
        "gram",
        F.col("docId").alias("leftId"),
        F.col("start").alias("leftStart"),
    )
    right = occ.select(
        "gram",
        F.col("docId").alias("rightId"),
        F.col("start").alias("rightStart"),
    )
    pairs = left.join(right, on="gram", how="inner").filter(
        (F.col("leftId") < F.col("rightId"))
        | (
            (F.col("leftId") == F.col("rightId"))
            & (F.col("leftStart") < F.col("rightStart"))
        )
    )
    diag = pairs.select(
        "leftId",
        "rightId",
        (F.col("leftStart") - F.col("rightStart")).alias("_d"),
        "leftStart",
        "rightStart",
    )
    w = Window.partitionBy("leftId", "rightId", "_d").orderBy("leftStart")
    run = (
        Window.partitionBy("leftId", "rightId", "_d")
        .orderBy("leftStart")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = diag.withColumn(
        "_brk",
        F.when(
            F.col("leftStart") - F.lag("leftStart").over(w) != 1, 1
        ).otherwise(0),
    ).withColumn("runId", F.sum("_brk").over(run))
    return (
        runs.groupBy("leftId", "rightId", "_d", "runId")
        .agg(
            F.min("leftStart").cast("long").alias("leftStart"),
            F.min("rightStart").cast("long").alias("rightStart"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias(
                "matchTokens"
            ),
        )
        .select("leftId", "rightId", "leftStart", "rightStart", "matchTokens")
    )


def duplicate_span_lengths(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_gram_freq: "int | None" = None,
    wide_keys: bool = False,
    hot_gram_ceiling: "int | None" = 10_000,
    on_hot_gram: str = "raise",
) -> "DataFrame":
    """:func:`duplicate_spans` islands annotated with the MAXIMAL
    verbatim match length inside each island — spanTokens says how
    wide the duplicated region is; maxMatchTokens says how long its
    longest single verbatim copy actually is (the quantity Lee et al.
    2022 report). A 200-token copy scores (200, 200); a chain of
    unrelated 5-token matches covering 200 tokens scores (200, 5).

    Every verbatim match lies wholly inside an island on BOTH its
    sides (each of its anchor windows is duplicated, and duplicated
    windows are what islands are made of), so the annotation is a
    doc-keyed equi join of match endpoints onto islands plus a
    containment filter — no range-join machinery needed. With
    ``max_gram_freq`` set, matches running through capped grams are
    missing and maxMatchTokens falls back to null for islands only
    such matches would explain.

    Output: (docId, spanStart, spanEnd, spanTokens, maxMatchTokens).
    """
    # ONE tokenize+n-gram pass feeds both the island finder and the
    # match finder (_gram_windows carries its own lazy checkpoint:
    # materialized on first use, reused by every later reference)
    wins = _gram_windows(df, text_col, id_col, min_tokens, wide_keys)
    spans = duplicate_spans(
        df, text_col, id_col, min_tokens, wide_keys, windows=wins
    )
    matches = verbatim_match_spans(
        df, text_col, id_col, min_tokens, max_gram_freq, wide_keys,
        windows=wins, hot_gram_ceiling=hot_gram_ceiling,
        on_hot_gram=on_hot_gram,
    )
    sides = matches.select(
        F.col("leftId").alias("_mDoc"),
        F.col("leftStart").alias("_mStart"),
        "matchTokens",
    ).unionByName(
        matches.select(
            F.col("rightId").alias("_mDoc"),
            F.col("rightStart").alias("_mStart"),
            "matchTokens",
        )
    )
    # containment belongs in the JOIN condition (a post-filter on a
    # left join would drop capped islands instead of nulling them);
    # the docId equality keeps this a hash join, containment rides as
    # the join residual
    joined = spans.join(
        sides,
        on=(
            (F.col("docId") == F.col("_mDoc"))
            & (F.col("_mStart") >= F.col("spanStart"))
            & (F.col("_mStart") < F.col("spanEnd"))
        ),
        how="left",
    )
    return joined.groupBy(
        "docId", "spanStart", "spanEnd", "spanTokens"
    ).agg(F.max("matchTokens").alias("maxMatchTokens"))


def remove_verbatim_matches(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_match_tokens: int = 50,
    max_gram_freq: "int | None" = None,
    wide_keys: bool = False,
    hot_gram_ceiling: "int | None" = 10_000,
    on_hot_gram: str = "raise",
) -> "DataFrame":
    """The ACTUAL Lee et al. (2022) ExactSubstr removal policy: cut
    every occurrence of a verbatim substring of at least
    ``min_match_tokens`` tokens that appears more than once in the
    corpus (their paper uses 50). :func:`remove_duplicate_spans` cuts
    every >= k-token duplicated ISLAND — far more aggressive; this
    variant touches only long verbatim copies, the policy shown to
    help LM training without shredding short idioms.

    Anchoring grams at ``min_match_tokens`` directly (rather than
    filtering short-anchor matches) makes the threshold the CHEAP
    path: duplicated 50-grams are rare, so the frequency shuffle and
    the pair join shrink with the threshold. Overlapping matches are
    handled by recomputing coverage from the kept-token count, not by
    summing (possibly overlapping) match lengths.

    Emits (docId, nTokens, nDupTokens, cleanedText) for EVERY input
    document, matching :func:`remove_duplicate_spans`'s shape.
    """
    # lineage barrier: both removal sides read the match table, and
    # the diagonal-chain span search is the dominant cost — without
    # it the whole spans subtree runs once per side (measured
    # 8.3 s -> ~4.5 s at sf0.1)
    matches = verbatim_match_spans(
        df, text_col, id_col, min_match_tokens, max_gram_freq, wide_keys,
        hot_gram_ceiling=hot_gram_ceiling, on_hot_gram=on_hot_gram,
    ).localCheckpoint(eager=False)
    sides = matches.select(
        F.col("leftId").alias("docId"),
        F.col("leftStart").alias("_s"),
        (F.col("leftStart") + F.col("matchTokens")).alias("_e"),
    ).unionByName(
        matches.select(
            F.col("rightId").alias("docId"),
            F.col("rightStart").alias("_s"),
            (F.col("rightStart") + F.col("matchTokens")).alias("_e"),
        )
    )
    per_doc = sides.groupBy("docId").agg(
        F.collect_list(F.struct(F.col("_s"), F.col("_e"))).alias("_spans")
    )
    base = df.select(
        F.col(id_col).alias("docId"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    joined = base.join(per_doc, on="docId", how="left")
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.filter(
            F.col("_toks"),
            lambda t, i: ~F.exists(
                F.col("_spans"),
                lambda s: (i >= s["_s"]) & (i < s["_e"]),
            ),
        )
    )
    return joined.select(
        "docId",
        F.coalesce(F.size("_toks"), F.lit(-1)).cast("long").alias("nTokens"),
        (
            F.coalesce(F.size("_toks"), F.lit(0))
            - F.size(F.coalesce(kept, F.array()))
        ).cast("long").alias("nDupTokens"),
        F.concat_ws(" ", kept).alias("cleanedText"),
    )


def winnow_fingerprints(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    hash_fn: str = "md5",
) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS algorithm): hash every ``k``-token gram, slide a
    ``window``-wide frame over the gram-hash sequence, and keep the
    minimum hash of each frame. The selected set is position-robust:
    any shared substring of at least ``window + k - 1`` tokens is
    guaranteed to contribute at least one common fingerprint, so
    equal-fingerprint buckets are near-dup candidates.

    ``hash_fn='md5'`` (default) hashes to hex strings with
    lexicographic min — replays identically in any engine, so the
    sketch is cross-engine stable. ``hash_fn='xxhash64'`` hashes to
    bigints with numeric min — measured ~10% faster per-row (the
    frame-min slices dominate, not the hash); its real win is in
    ``winnow_candidate_pairs``, where postings shuffle 8-byte keys
    instead of 32-char strings. Spark-only (xxhash64 seeds are
    engine-specific). All work is per-row array math inside whole-stage
    codegen: O(grams x window) with no explode, no shuffle, no UDF.
    Documents shorter than ``window`` grams keep one fingerprint (the
    global min) if they have any gram at all.

    Emits (docId, nGrams, nFps, fpSketch) where fpSketch = md5 of the
    '|'-joined sorted distinct fingerprints.
    """
    staged, sel, m = _winnow_staged(df, text_col, id_col, k, window, hash_fn)
    fps = F.array_sort(F.array_distinct(sel))
    return staged.select(
        "docId",
        F.coalesce(m, F.lit(-1)).cast("long").alias("nGrams"),
        F.coalesce(F.size(fps), F.lit(0)).cast("long").alias("nFps"),
        F.md5(F.concat_ws("|", fps)).alias("fpSketch"),
    )


def _winnow_staged(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    k: int,
    window: int,
    hash_fn: str = "md5",
):
    """(staged df with materialized gram hashes, selected-fingerprint
    array, gram count) for winnowing: one hash per k-token gram, min
    per ``window``-wide frame (lexicographic for md5 strings, numeric
    for xxhash64 bigints). Selection keeps duplicates in frame order;
    callers distinct/sort as needed.

    Two deliberate plan shapes: (1) the gram+hash chain is an ALIASED
    column in its own Project — it is referenced by every shifted
    slice below, and CollapseProject refuses to inline a
    multiply-referenced non-trivial alias, so the chain evaluates
    once per row instead of once per reference; (2) frame minima come
    from ZIPPED SHIFTED SLICES (the word_ngrams device), O(m*window)
    per row — a per-frame slice lambda would re-evaluate its operand
    per frame, O(m^2), a measured 9x wall blowup on long documents.
    """
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"unsupported hash_fn: {hash_fn!r}")
    grams = word_ngrams(F.col(text_col), k)
    if hash_fn == "md5":
        gram_hashes = F.transform(grams, lambda g: F.md5(g))
        empty_type = "array<string>"
    else:
        gram_hashes = F.transform(grams, lambda g: F.xxhash64(g))
        empty_type = "array<bigint>"
    staged = df.select(
        F.col(id_col).alias("docId"), gram_hashes.alias("_h")
    )
    hashes = F.col("_h")
    m = F.size(hashes)
    n_frames = m - F.lit(window - 1)
    mins = F.slice(hashes, 1, F.greatest(n_frames, F.lit(0)))
    for t in range(1, window):
        shifted = F.slice(hashes, t + 1, F.greatest(n_frames, F.lit(0)))
        mins = F.zip_with(mins, shifted, lambda a, b: F.least(a, b))
    sel = (
        F.when(m >= F.lit(window), mins)
        .when(m >= 1, F.array(F.array_min(hashes)))
        .otherwise(F.array().cast(empty_type))
    )
    return staged, sel, m


def winnow_candidate_pairs(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    hash_fn: str = "md5",
    hot_bucket_ceiling: "int | None" = 10_000,
    on_hot_bucket: str = "raise",
) -> "DataFrame":
    """MOSS-style candidate generation from winnowing fingerprints:
    documents sharing at least ``min_shared`` selected fingerprints
    become a candidate pair, with the shared-fingerprint count as the
    similarity proxy — the inverted-index half of Schleimer et al.
    (2003) §4, and the third candidate generator of the dedup family
    (besides MinHash-LSH bands and hyperplane buckets).

    Scale shape (r14 grouped-explode form, the same device as
    ``band_self_pairs``): explode each doc's DISTINCT selected
    fingerprints to (fp, docId) postings — never all-pairs; ONE
    ``groupBy(fp)`` collects each posting list (sorted ascending, so
    emitted pairs are left < right exactly as the old bucket
    self-join's ``<`` predicate produced), the hot-bucket guard rides
    that same aggregate as a count filter, and pairs explode as
    (ids[i], ids[j]), i < j, reduced by a map-side-combined count.
    The old self-join form referenced the fingerprint subtree (md5
    per gram × frame mins — the expensive part) once per join side;
    this form computes it once, and the fp exchange it pays is the
    very shuffle the join needed anyway. A pathological fingerprint
    shared by a large fraction of the corpus quadratically inflates
    its bucket exactly like an LSH band does — the guard bounds it: a
    posting list over ``hot_bucket_ceiling`` docs aborts the job
    loudly (``on_hot_bucket="raise"``, default; output bit-identical
    when nothing is hot) or is excluded from pairing (``"cap"`` — the
    boilerplate stop-fingerprint trade; ``strip_boilerplate`` first
    remains the documented pipeline order). Per-bucket memory is
    bounded by the guard ceiling.

    Emits (leftId, rightId, nSharedFps >= min_shared).
    """
    return _winnow_pair_counts(
        df,
        text_col,
        id_col,
        k,
        window,
        min_shared,
        hash_fn,
        hot_bucket_ceiling,
        on_hot_bucket,
        with_counts=False,
    )


def _winnow_pair_counts(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    k: int,
    window: int,
    min_shared: int,
    hash_fn: str,
    hot_bucket_ceiling: "int | None",
    on_hot_bucket: str,
    with_counts: bool,
) -> "DataFrame":
    """Shared grouped-explode pair generator for the winnow family.

    ``with_counts=False``: (leftId, rightId, nSharedFps) — the
    :func:`winnow_candidate_pairs` contract. ``with_counts=True``
    additionally carries each side's per-doc fingerprint count
    (``_nL``/``_nR``) THROUGH the posting rows, so
    :func:`winnow_similarity` needs no count-table joins (which each
    re-derived the whole fingerprint subtree)."""
    from genetics_spark_coloc_spark.functions.guards import (
        hot_count_filter,
        validate_on_hot,
    )

    validate_on_hot(on_hot_bucket, "winnow_candidate_pairs")
    staged, sel, _m = _winnow_staged(df, text_col, id_col, k, window, hash_fn)
    # materialize the distinct-fp array once in its own aliased
    # projection: both the explode and (optionally) the count consume
    # it, and CollapseProject keeps a multi-referenced non-cheap
    # alias in place rather than re-inlining the selection chain
    fps_df = staged.select("docId", F.array_distinct(sel).alias("_fps"))
    if with_counts:
        postings = fps_df.select(
            F.struct(
                "docId", F.size("_fps").cast("long").alias("_n")
            ).alias("_doc"),
            F.explode("_fps").alias("fp"),
        )
    else:
        postings = fps_df.select(
            F.col("docId").alias("_doc"), F.explode("_fps").alias("fp")
        )
    # sort_array on (docId, _n) structs orders by docId first — ids
    # are unique per doc so the struct sort equals the id sort
    grouped = postings.groupBy("fp").agg(
        F.sort_array(F.collect_list("_doc")).alias("_ids"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    ok = hot_count_filter(
        grouped, "_cnt", hot_bucket_ceiling, on_hot_bucket, "winnow_candidate_pairs"
    )
    lefts = ok.select("_ids", F.posexplode("_ids").alias("_i", "_l"))
    pairs = lefts.select(
        "_l",
        F.explode(
            F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
        ).alias("_r"),
    )
    if with_counts:
        return (
            pairs.filter(F.col("_l.docId") != F.col("_r.docId"))
            .groupBy(
                F.col("_l.docId").alias("leftId"),
                F.col("_r.docId").alias("rightId"),
                F.col("_l._n").alias("_nL"),
                F.col("_r._n").alias("_nR"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("nSharedFps"))
            .filter(F.col("nSharedFps") >= F.lit(min_shared))
        )
    return (
        pairs.filter(F.col("_l") != F.col("_r"))
        .groupBy(
            F.col("_l").alias("leftId"),
            F.col("_r").alias("rightId"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("nSharedFps"))
        .filter(F.col("nSharedFps") >= F.lit(min_shared))
    )


def bm25_scores(
    df: "DataFrame",
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> "DataFrame":
    """Okapi BM25 retrieval scoring (Robertson & Walker 1994) of every
    document against a small keyword query — the lexical half of a
    hybrid (BM25 + ANN) retrieval stack.

    Because the query is a handful of literal terms, NOTHING explodes:
    each per-term tf is one JVM ``size(filter(tokens))`` array
    expression, so the corpus pass is a shuffle-free projection. The
    two corpus statistics BM25 needs — avg document length and
    per-term document frequencies — are a single 1-row aggregate
    (sum/count + one count-if per term) broadcast back via crossJoin,
    the same device as ``tfidf_top_terms``; no driver collect, no
    second scan shape. idf uses the standard BM25 form
    ln(1 + (N - df + 0.5)/(df + 0.5)), always positive.

    Emits (docId, dl, score) for documents matching at least one
    query term; score rounded to 6dp for engine-reproducible ranking.
    The query is SET-semantic: terms are lowercased and deduplicated,
    so a repeated (or case-variant) query term contributes once — the
    same contract as :func:`bm25_search`, keeping the direct and
    index-backed forms bit-identical on any query.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    q = sorted({t.lower() for t in query_terms})
    toks = tokens(F.lower(F.col(text_col)))

    def _tf(term: str) -> Column:
        # NB: a single-parameter lambda — a second (defaulted) param
        # would be read by F.filter as the element-index argument
        return F.coalesce(
            F.size(F.filter(toks, lambda t: t == F.lit(term))), F.lit(0)
        ).cast("long")

    base = df.select(
        F.col(id_col).alias("docId"),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("dl"),
        *[_tf(term).alias(f"_tf{i}") for i, term in enumerate(q)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_nDocs"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum(F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0)).alias(f"_df{i}")
            for i in range(len(q))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(q)):
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("_nDocs") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
        )
        part = idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
        )
        score = part if score is None else score + part
    return (
        joined.filter(
            sum(
                (F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0) for i in range(len(q))),
                F.lit(0),
            )
            > 0
        )
        .select("docId", "dl", F.round(score, 6).alias("score"))
    )


def rrf_fuse(
    ranked_lists: list["DataFrame"],
    id_col: str = "docId",
    rank_col: str = "rank",
    k0: int = 60,
) -> "DataFrame":
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    candidate rank lists — the standard glue of hybrid retrieval
    (BM25 list + ANN list): score(d) = sum over lists of
    1 / (k0 + rank_d), ranked descending.

    Inputs are TOP-K candidate lists by construction, so the final
    global ordering window runs over at most sum(|list_i|) rows —
    bounded and tiny relative to the corpus; the union + groupBy is
    one narrow shuffle on docId. Scores are 6dp-rounded before
    ranking so the fused order is engine-reproducible.

    Emits (docId, nLists, rrfScore, fusedRank).
    """
    from functools import reduce  # noqa: PLC0415

    from pyspark.sql.window import Window  # noqa: PLC0415

    tagged = [
        d.select(
            F.col(id_col).alias("docId"),
            F.col(rank_col).cast("long").alias("rank"),
        )
        for d in ranked_lists
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    scored = unioned.groupBy("docId").agg(
        F.count(F.lit(1)).cast("long").alias("nLists"),
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))), 6
        ).alias("rrfScore"),
    )
    # the union of the input ranked lists is bounded by contract
    # (callers pass top-k lists), so a single-partition rank is the
    # intended plan; the constant partition key declares that and
    # silences WindowExec's 'No Partition Defined' warning
    w = Window.partitionBy(declared_single_partition(F.col("docId"))).orderBy(
        F.col("rrfScore").desc(), F.col("docId").asc()
    )
    return scored.withColumn(
        "fusedRank", F.row_number().over(w).cast("int")
    )


def bpe_merge_tokens(toks: Column, pa: Column, pb: Column) -> Column:
    """One BPE merge round applied to a token array: every
    left-to-right non-overlapping adjacent (pa, pb) occurrence
    collapses into the single symbol ``pa + ' ' + pb`` — exactly the
    corpus rewrite between two ``bpe_top_merges`` counting rounds
    (Sennrich et al. 2016).

    The space joiner is deliberate: whitespace tokens can never
    contain a space, so a merged symbol is strictly longer than its
    left part and can never spuriously equal ``pa`` — which makes the
    sequential fold below EXACT for every pair, including pa == pb
    (where "a a a" must become ["a a", "a"], leftmost-first) and
    symbols that are themselves earlier merges.

    Cost model: the fold copies the accumulator per element —
    O(tokens^2) array writes per document, all JVM-side. Fine for
    typical documents; for million-token rows, pre-chunk first
    (``chunk_documents``).
    """
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == pa)
            & (t == pb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(pa, F.lit(" "), pb)),
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def apply_top_bpe_merge(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """One full round of the distributed BPE training loop: count all
    adjacent pairs (``bpe_top_merges``), pick the winner, rewrite the
    corpus with :func:`bpe_merge_tokens`. The winning pair is a 1-row
    aggregate broadcast onto the corpus scan — no driver round-trip,
    the whole round is one lazy plan; training N merges = N of these
    rounds, each a distributed count + rewrite (the inherently
    sequential part of BPE is the rounds, never the corpus pass).

    Emits the rewritten corpus long-form: (docId, pos, symbol) with
    merged symbols spelled "left right".
    """
    top1 = (
        bpe_top_merges(df, k=1, text_col=text_col)
        .select(F.split("pair", " ").alias("_p"))
        .select(
            F.get("_p", 0).alias("_pa"),
            F.get("_p", 1).alias("_pb"),
        )
    )
    toks = tokens(F.lower(F.col(text_col)))
    merged = df.crossJoin(F.broadcast(top1)).select(
        F.col(id_col).alias("docId"),
        bpe_merge_tokens(toks, F.col("_pa"), F.col("_pb")).alias("_sym"),
    )
    return (
        merged.select(
            "docId", F.posexplode_outer("_sym").alias("pos", "symbol")
        )
        .filter(F.col("symbol").isNotNull())
    )


def vocab_coverage(
    df: "DataFrame",
    vocab: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    term_col: str = "term",
) -> "DataFrame":
    """Tokenizer-fit diagnostic: per document, how much of the token
    stream a candidate vocabulary covers — the out-of-vocabulary rate
    that decides whether a tokenizer/vocab pairing suits a corpus
    before committing to a full training run.

    Scale shape: one explode to (doc, token) occurrences, one join
    against the DISTINCT vocabulary keyed on the term (Spark
    broadcasts it when small; a multi-million-entry vocab falls back
    to a hash join on the term key), one per-doc aggregate with
    map-side combine. Tokens are lowercased to match the vocabulary
    convention of every other operator here.

    Emits (docId, nTokens, nOov, oovRate) for EVERY input document;
    empty docs report rate 0 over 0 tokens.
    """
    occ = df.select(
        F.col(id_col).alias("docId"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    v = vocab.select(F.col(term_col).alias("tok")).distinct().withColumn(
        "_inV", F.lit(True)
    )
    return (
        occ.join(v, on="tok", how="left")
        .groupBy("docId")
        .agg(
            F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("nTokens"),
            F.sum(
                F.when(
                    F.col("tok").isNotNull() & F.col("_inV").isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("nOov"),
        )
        .select(
            "docId",
            "nTokens",
            "nOov",
            F.when(
                F.col("nTokens") > 0,
                F.round(F.col("nOov") / F.col("nTokens"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("oovRate"),
        )
    )


def corpus_stats_by_source(
    df: "DataFrame",
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Per-source corpus profile — the mixture-design summary read
    before weighting sources: document count, token volume, distinct
    vocabulary size, type-token ratio (the Heaps-law point estimate
    that flags template-generated vs organic sources), and mean doc
    length.

    Scale shape: one explode to (source, token) occurrences, one
    two-level aggregate — count_distinct(token) reduces through a
    partial per-partition distinct on the (source, token) pair, and
    the doc-level stats ride a separate tiny per-source aggregate
    joined back. Output is |sources| rows.

    Emits (source, nDocs, nTokens, nDistinctTokens, typeTokenRatio,
    meanDocTokens), sources with only empty/null docs report zeros.
    """
    occ = df.select(
        F.col(source_col).alias("source"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    tok_stats = occ.groupBy("source").agg(
        F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("nTokens"),
        F.count_distinct(F.col("tok")).cast("long").alias("nDistinctTokens"),
    )
    doc_stats = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("nDocs")
    )
    return (
        doc_stats.join(tok_stats, on="source", how="left")
        .select(
            "source",
            "nDocs",
            F.coalesce(F.col("nTokens"), F.lit(0)).alias("nTokens"),
            F.coalesce(F.col("nDistinctTokens"), F.lit(0)).alias(
                "nDistinctTokens"
            ),
            F.when(
                F.col("nTokens") > 0,
                F.round(F.col("nDistinctTokens") / F.col("nTokens"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("typeTokenRatio"),
            F.round(F.col("nTokens") / F.col("nDocs"), 6).alias(
                "meanDocTokens"
            ),
        )
    )


def winnow_similarity(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
    hash_fn: str = "md5",
) -> "DataFrame":
    """MOSS similarity scoring: fingerprint-set Jaccard for every
    candidate pair — shared / (|L| + |R| - shared) over the winnowed
    fingerprint sets, the score MOSS reports per file pair.

    r14 shape: the per-doc fingerprint counts ride the posting rows
    through the grouped-explode pair generator
    (:func:`_winnow_pair_counts` ``with_counts=True``), so the score
    is a pure projection over the pair aggregate — the old form's two
    count-table joins each re-derived the whole fingerprint subtree
    (md5 per gram × frame mins), tripling the expensive pass.

    Emits (leftId, rightId, nSharedFps, fpJaccard) rounded to 6dp.
    """
    pairs = _winnow_pair_counts(
        df,
        text_col,
        id_col,
        k,
        window,
        min_shared,
        hash_fn,
        hot_bucket_ceiling=10_000,
        on_hot_bucket="raise",
        with_counts=True,
    )
    return pairs.select(
        "leftId",
        "rightId",
        "nSharedFps",
        F.round(
            F.col("nSharedFps")
            / (F.col("_nL") + F.col("_nR") - F.col("nSharedFps")),
            6,
        ).alias("fpJaccard"),
    )


def weighted_sample(
    df: "DataFrame",
    weight: Column,
    n: int,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> "DataFrame":
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, A-Res): each row draws key =
    u^(1/w) with u the hash-uniform from md5(salt|id), and the n
    largest keys are the sample — provably equivalent to sequential
    weighted draws, but embarrassingly parallel and REPRODUCIBLE
    (same salt → same sample on any cluster layout, unlike
    rand()-based sampling). Rows with weight <= 0 or null are
    excluded, matching the sequential semantics.

    One projection + TakeOrderedAndProject top-n: no shuffle beyond
    the k-row ordered collect. The standard corpus use: quality- or
    temperature-weighted subset selection where the manifest must be
    re-derivable.

    Emits the sampled (docId, weight, sampleKey) ordered by key desc.
    """
    u = hash_bucket(F.col(id_col), salt)
    key = F.when(
        weight > 0, F.pow(u, F.lit(1.0) / weight.cast("double"))
    )
    return (
        df.select(
            F.col(id_col).alias("docId"),
            weight.cast("double").alias("weight"),
            F.round(key, 12).alias("sampleKey"),
        )
        .filter(F.col("sampleKey").isNotNull())
        .orderBy(F.desc("sampleKey"), F.asc("docId"))
        .limit(n)
    )


def bpe_train_merges(
    df: "DataFrame",
    n_merges: int = 3,
    text_col: str = "text",
    materialize_rounds: bool = False,
) -> "DataFrame":
    """Full iterative BPE training for ``n_merges`` rounds (Sennrich
    et al. 2016): round r counts adjacent pairs on the corpus as
    rewritten by merges 1..r-1, takes the (count desc, pair asc)
    winner, and rewrites with :func:`bpe_merge_tokens`. Emits the
    learned merge table — (mergeRank, pair, pairCount) — which IS the
    BPE tokenizer artifact; apply it later with repeated
    :func:`bpe_merge_tokens` folds.

    Shape per round: one O(m) slice-zip pair explode, one
    map-side-combined count, TakeOrderedAndProject(1), winner
    broadcast onto the next rewrite — no driver round-trip, no UDF;
    the whole training run is ONE lazy plan of n_merges chained
    rounds. BPE's sequential dependency is between rounds only, so
    this is the minimal coordination a distributed trainer can have.

    Scale note: lazily chained, round r re-executes the r-1 earlier
    fold rewrites (O(n²) total fold work — fine for small n_merges
    or bench-scale corpora, and it keeps the registry plan pure).
    For production vocab sizes set ``materialize_rounds=True``: each
    rewritten corpus is localCheckpoint'ed so every round does
    exactly one corpus pass, the same lineage-truncation device the
    CC and k-means loops use.
    """
    cur = df.select(tokens(F.lower(F.col(text_col))).alias("_t"))
    winners = []
    for r in range(n_merges):
        n_pairs = F.size("_t") - F.lit(1)
        # the winner carries pa/pb as SEPARATE columns: from round 2
        # on, symbols themselves contain the ' ' joiner, so the pair
        # string cannot be split back into its halves. The tie-break
        # is on the joined pair string (matches the oracle's ORDER BY
        # pair ASC — tuple order and string order DIFFER once pa can
        # be a spaced symbol).
        pairs = F.zip_with(
            F.slice("_t", 1, F.greatest(n_pairs, F.lit(0))),
            F.slice("_t", 2, F.greatest(n_pairs, F.lit(0))),
            lambda a, b: F.struct(a.alias("pa"), b.alias("pb")),
        )
        win = (
            cur.select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.pa").alias("_pa"), F.col("p.pb").alias("_pb"))
            .agg(F.count(F.lit(1)).alias("pairCount"))
            .withColumn("pair", F.concat_ws(" ", "_pa", "_pb"))
            .orderBy(F.desc("pairCount"), F.asc("pair"))
            .limit(1)
        )
        if materialize_rounds and r + 1 < n_merges:
            # the ONE-ROW winner has two consumers (the emitted merge
            # table and the next round's rewrite broadcast) — without
            # a barrier the full corpus pair count runs twice per
            # round (r14)
            win = win.localCheckpoint(eager=False)
        winners.append(
            win.select(
                F.lit(r + 1).cast("int").alias("mergeRank"),
                "pair",
                "pairCount",
            )
        )
        if r + 1 < n_merges:
            pq = win.select("_pa", "_pb")
            cur = cur.crossJoin(F.broadcast(pq)).select(
                bpe_merge_tokens(F.col("_t"), F.col("_pa"), F.col("_pb")).alias("_t")
            )
            if materialize_rounds:
                cur = cur.localCheckpoint(eager=False)
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out


def quality_percentile_select(
    df: "DataFrame",
    keep_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Per-source top-fraction selection by quality score — the
    DataComp/FineWeb curation device: rank every document WITHIN its
    source stratum and keep the best ``keep_frac``, so a uniformly
    high-scoring source cannot crowd the others out of the mixture
    (absolute-threshold filters do exactly that).

    percent_rank over (source | score desc, id asc): the id tie-break
    makes selection reproducible under score ties, and ranking is one
    window partitioned by source — the shuffle moves (id, score)
    pairs only, never text. Emits (source, docId, q, pctRank) for the
    kept rows; the caller semi-joins ids back against the corpus so
    full text never rides through the rank shuffle."""
    from pyspark.sql import Window  # noqa: PLC0415

    scored = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("docId"),
        quality_score(F.col(text_col)).alias("q"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("q"), F.asc("docId"))
    return (
        scored.withColumn("pctRank", F.round(F.percent_rank().over(w), 6))
        .filter(F.col("pctRank") <= F.lit(keep_frac))
    )


def token_budget_allocation(
    df: "DataFrame",
    total_budget: int,
    temperature: float = 1.0,
    source_col: str = "source",
    text_col: str = "text",
) -> "DataFrame":
    """Data-recipe planning: split a token budget across sources with
    temperature-scaled proportional weights (the LLaMA/DoReMi-style
    mixture table). For source s with available token count n_s,

        w_s = n_s^(1/T) / sum n^(1/T)        (T=1: proportional;
                                              T->inf: uniform)
        target_s = round(w_s * budget)
        rate_s   = target_s / n_s            (>1 means epochs of
                                              oversampling)

    Emits (source, availableTokens, targetWeight, targetTokens,
    samplingRate, epochs) — the manifest a sampler (weighted_sample /
    temperature_mixture) executes. One groupBy to per-source counts
    (map-side combined), one 1-row total broadcast back onto the
    handful of source rows; everything downstream of the count is
    tiny. Closed form, fully oracle-checkable."""
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "availableTokens"
        )
    )
    # the powered weights quantize to 6dp DECIMAL before the global
    # sum: a double SUM is addition-order-dependent, so the total (and
    # with it every rounded weight) could flip its last digit with the
    # partitioning — observed as a 1-ulp oracle flake at 16 vs 8
    # shuffle partitions. Decimal addition is exact and therefore
    # order-independent: the manifest is bit-identical on any cluster
    # layout and any engine (the DuckDB oracle quantizes identically).
    powered = counts.withColumn(
        "_p",
        F.round(
            F.pow(F.col("availableTokens").cast("double"), 1.0 / temperature), 6
        ).cast("decimal(28,6)"),
    )
    total = powered.agg(F.sum("_p").alias("_tot"))
    # the whole corpus can be empty (every source fully scrubbed
    # upstream): _tot is then 0 and the share is undefined — NULL
    # weight/target rather than an ANSI divide-by-zero one expression
    # before the per-source guard below catches it
    frac = F.when(
        F.col("_tot") > 0,
        F.col("_p").cast("double") / F.col("_tot").cast("double"),
    )
    return (
        powered.crossJoin(F.broadcast(total))
        .select(
            "source",
            "availableTokens",
            F.round(frac, 6).alias("targetWeight"),
            F.round(frac * F.lit(float(total_budget)))
            .cast("long")
            .alias("targetTokens"),
        )
        # a source can legitimately hold ZERO tokens (e.g. every doc
        # fully boilerplate-scrubbed upstream): its weight and target
        # are 0, and samplingRate/epochs are undefined — NULL, not an
        # ANSI divide-by-zero crash (surfaced by the lifecycle test's
        # scrub stage)
        .withColumn(
            "samplingRate",
            F.when(
                F.col("availableTokens") > 0,
                F.round(
                    F.col("targetTokens")
                    / F.col("availableTokens").cast("double"),
                    6,
                ),
            ),
        )
        .withColumn(
            "epochs",
            F.when(
                F.col("availableTokens") > 0,
                F.ceil(
                    F.col("targetTokens")
                    / F.col("availableTokens").cast("double")
                ).cast("int"),
            ),
        )
    )


def _md5_bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic [0, n_buckets) feature bucket from the first 8
    hex digits of md5 — engine-portable (DuckDB mirrors it exactly),
    unlike xxhash64/murmur whose seeds differ across engines."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def dsir_importance_weights(
    df: "DataFrame",
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> "DataFrame":
    """DSIR hashed-n-gram importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its hashed-unigram bag is
    under the TARGET distribution (rows where ``is_target``) than
    under the RAW corpus distribution, so that resampling raw data
    proportional to exp(logWeight) approximates sampling from the
    target domain.

    Model: tokens hash into ``n_buckets`` buckets (md5 device, engine
    -portable); bucket unigram distributions are add-``alpha``
    smoothed, p[b] = (c_target[b]+alpha)/(N_target+alpha*B) and q[b]
    likewise over the whole corpus; logWeight(doc) = sum_b c_doc[b] *
    (log p[b] - log q[b]).

    Scale shape: ONE explode of the corpus to (doc, bucket)
    occurrences; both distribution estimates are <=B-row aggregates
    with map-side combine, joined into a single <=B-row log-ratio dim
    that BROADCASTS onto the per-(doc, bucket) count table; one
    per-doc sum. No UDFs, no driver state, and the wire carries
    bucket ids (int) rather than token strings.
    """
    occ = df.select(
        F.col(id_col).alias("docId"),
        is_target.alias("_tgt"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("bucket", _md5_bucket(F.col("tok"), n_buckets))
    raw = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_cR"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_cT"),
    )
    tot = raw.agg(
        F.sum("_cR").alias("_NR"), F.sum("_cT").alias("_NT")
    )
    b = float(n_buckets)
    ratio = raw.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("_cT") + alpha) / (F.col("_NT") + alpha * b))
            - F.log((F.col("_cR") + alpha) / (F.col("_NR") + alpha * b))
        ).alias("_lr"),
    )
    doc_buckets = occ.groupBy("docId", "bucket").agg(
        F.count(F.lit(1)).alias("_c")
    )
    scored = (
        doc_buckets.join(F.broadcast(ratio), on="bucket")
        .groupBy("docId")
        .agg(
            F.sum("_c").alias("nTokens"),
            F.sum(F.col("_c") * F.col("_lr")).alias("_lw"),
        )
    )
    return (
        df.select(F.col(id_col).alias("docId"))
        .distinct()
        .join(scored, on="docId", how="left")
        .select(
            "docId",
            F.coalesce("nTokens", F.lit(0)).cast("long").alias("nTokens"),
            F.round(F.coalesce("_lw", F.lit(0.0)), 6).alias("logWeight"),
        )
    )


def global_line_dedup(
    df: "DataFrame",
    lines: Column,
    id_col: str = "doc_id",
) -> "DataFrame":
    """C4-style global span dedup (Raffel et al. 2020 discard all but
    ONE occurrence of any three-sentence span corpus-wide): every
    line keeps exactly its first corpus-wide occurrence — first =
    smallest (docId, position) — and is dropped everywhere else.
    Contrast ``strip_boilerplate``, which drops high-document-
    frequency lines from EVERY document including the first.

    Scale shape: explode to (doc, pos, line), collapse the line
    string to xxhash64 before any shuffle (8-byte keys on the wire),
    ONE groupBy(lineHash) min-aggregate over the lexicographic
    struct(docId, pos) order key (structs min-combine map-side like
    any scalar; single-occurrence lines never dominate memory because
    the agg is a scalar min), one hash join back, then the per-doc
    ordered rebuild. The struct key — not an arithmetic
    docId*K+pos encoding — keeps first-occurrence election correct
    for documents of ANY length and for any orderable id type.
    Emits (docId, nLines, nKept, cleanedText); docs whose every line
    lost the race keep a row with empty cleanedText.
    """
    occ = df.select(
        F.col(id_col).alias("docId"),
        F.posexplode_outer(lines).alias("pos", "line"),
    ).withColumn(
        "lineHash", F.when(F.col("line").isNotNull(), F.xxhash64("line"))
    ).withColumn(
        "orderKey",
        F.struct(F.col("docId").alias("d"), F.col("pos").alias("p")),
    )
    first = (
        occ.filter(F.col("lineHash").isNotNull())
        .groupBy("lineHash")
        .agg(F.min("orderKey").alias("firstKey"))
    )
    kept = occ.join(first, on="lineHash", how="left").withColumn(
        "_keep",
        F.col("line").isNotNull() & (F.col("orderKey") == F.col("firstKey")),
    )
    return (
        kept.groupBy("docId")
        .agg(
            F.sum(F.when(F.col("line").isNotNull(), 1).otherwise(0)).alias(
                "nLines"
            ),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("nKept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("cleanedText"),
        )
        .select(
            "docId",
            F.col("nLines").cast("long").alias("nLines"),
            F.col("nKept").cast("long").alias("nKept"),
            "cleanedText",
        )
    )


def shard_plan(
    df: "DataFrame",
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle-v1",
) -> "DataFrame":
    """Deterministic corpus shuffle + shard assignment — the data-
    ordering step before training: every document gets a pseudorandom
    but reproducible position (md5 hash of salt|id, so the order is
    stable across runs, engines, and partitionings — randomSplit /
    rand() are not), a shard = hash-order rank mod n_shards (round-
    robin over the shuffled order, so shard sizes differ by at most
    one even when ids are skewed), and a 0-based position within its
    shard equal to its dataloader step.

    Scale shape: the global rank is computed WITHOUT a global sort —
    the distributed two-level rank pattern. The [0,1) hash key is
    range-bucketed into 64 equal slices (hash uniformity makes the
    slices balanced by construction, no sampling pass needed), each
    bucket ranks its own rows under a PARTITIONED window, and a
    64-row cumulative-offset dim (running sum over bucket counts —
    bounded input, declared single partition) broadcasts back on.
    One shuffle on the bucket key, one broadcast join; never a
    single-partition pass over the data.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    n_range_buckets = 64
    keyed = df.select(
        F.col(id_col).alias("docId"),
        hash_bucket(F.col(id_col), salt).alias("_k"),
    ).withColumn(
        "_b",
        F.least(
            F.floor(F.col("_k") * n_range_buckets).cast("int"),
            F.lit(n_range_buckets - 1),
        ),
    )
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy(declared_single_partition(F.col("_b")))
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_b").orderBy(F.col("_k"), F.col("docId"))
    ranked = (
        keyed.join(F.broadcast(offsets), on="_b")
        .withColumn("_r", F.row_number().over(w_in) - 1 + F.col("_off"))
    )
    return ranked.select(
        "docId",
        F.pmod(F.col("_r"), F.lit(n_shards)).cast("int").alias("shard"),
        (F.col("_r") / F.lit(n_shards)).cast("long").alias("posInShard"),
    )


def curation_funnel(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    pii_text: "Column | None" = None,
    min_words: int = 20,
    max_dup_bigram_frac: float = 0.2,
    max_dup_trigram_frac: float = 0.18,
) -> "DataFrame":
    """The end-to-end curation verdict table — every stage of the
    standard pre-training keep/drop funnel (Gopher quality rules →
    repetition filter → PII gate → exact-dedup keeper election) as
    ONE declarative plan, emitting a per-document boolean per stage
    plus the final ``kept`` conjunction. Per-stage booleans (not just
    the verdict) are what make a production funnel auditable:
    per-stage rejection counts are one groupBy away, and stage
    ordering is irrelevant because every stage is evaluated
    independently.

    Scale shape: every row-local stage (quality, repetition, PII)
    rides ONE fused projection — a single scan of the text column, so
    at corpus scale the funnel costs one pass of I/O, not one per
    stage — and the only wide operation is the keeper election (one
    min-by-contentHash window, partitioned by the hash so it scales
    with the duplicate-family size, not the corpus). No joins
    anywhere: the window runs directly over the staged projection.
    ``pii_text`` lets callers gate on a different column than the
    quality stages (e.g. pre-redaction raw text).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    rules = gopher_rules(F.col(text_col), min_words=min_words)
    pass_quality = None
    for c in rules.values():
        pass_quality = c if pass_quality is None else (pass_quality & c)
    pass_rep = (
        ngram_repetition_ratio(F.col(text_col), 2) <= max_dup_bigram_frac
    ) & (ngram_repetition_ratio(F.col(text_col), 3) <= max_dup_trigram_frac)
    pii_col = pii_text if pii_text is not None else F.col(text_col)
    pii_counts = list(pii_stats(pii_col).values())
    total_pii = pii_counts[0]
    for c in pii_counts[1:]:
        total_pii = total_pii + c
    staged = df.select(
        F.col(id_col).alias("docId"),
        pass_quality.alias("passQuality"),
        pass_rep.alias("passRepetition"),
        (total_pii == 0).alias("passPii"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_contentHash"),
    )
    w = Window.partitionBy("_contentHash")
    return staged.select(
        "docId",
        "passQuality",
        "passRepetition",
        "passPii",
        (F.col("docId") == F.min("docId").over(w)).alias("isKeeper"),
    ).withColumn(
        "kept",
        F.col("passQuality")
        & F.col("passRepetition")
        & F.col("passPii")
        & F.col("isKeeper"),
    )


def line_frequency_table(
    df: "DataFrame",
    text_col: str = "text",
    sep: str = "\n",
) -> "DataFrame":
    """Corpus-wide segment-frequency table for :func:`line_dedup`'s
    incremental mode: (segHash = md5(trim(segment)), segCount). Built
    once over the corpus (one posexplode + one map-side-combined
    count on 16-byte keys), persisted, then every new crawl is
    scrubbed against CORPUS frequencies at O(delta) — the daily-loop
    twin of the band-index builder. Frequencies count every segment
    (the ``min_segment_chars`` protection applies at scrub time, not
    build time, so one table serves any protection threshold). A
    nightly refresh may either rebuild (mode overwrite) or APPEND new
    count shards: consumers re-aggregate per hash with SUM, so
    duplicate segHash rows across shards are additive, never a
    fan-out."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    return (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep), -1)
            ).alias("seg")
        )
        .select(F.md5(F.trim(F.col("seg"))).alias("segHash"))
        .groupBy("segHash")
        .agg(F.count(F.lit(1)).alias("segCount"))
    )


def line_dedup(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_count: int = 1,
    min_segment_chars: int = 10,
    freq_table: "DataFrame | None" = None,
    max_doc_segments: int = 1_000_000,
) -> "DataFrame":
    """Corpus-frequency segment removal — C4-style LINE deduplication
    generalized over the separator: split every document on ``sep``,
    count each (trimmed) segment's frequency ACROSS THE CORPUS, and
    rebuild documents dropping segments that occur more than
    ``max_count`` times — the standard boilerplate-line scrub
    (headers, footers, cookie banners) run before training. Segments
    shorter than ``min_segment_chars`` after trimming are protected
    (never dropped): trivially-short lines are common by nature, not
    boilerplate evidence.

    Emits (docId, nSegments, nDropped, cleanText) with cleanText the
    surviving segments re-joined by ``sep`` in original order (empty
    string when everything drops).

    Scale shape: one posexplode; frequencies via a map-side-combined
    count on md5(trim(segment)) (16-byte keys on the shuffle, never
    the segment text — the dup_ngram_coverage device); one hash join
    of segments against their own frequency table; per-doc rebuild as
    an array_sort(collect_list(struct(pos, seg))) fold — order
    restored without a window. No Python anywhere.

    The per-doc rebuild gathers every surviving segment of ONE
    document into one aggregation buffer — segment-bound per doc, not
    corpus-bound, but a pathological single multi-million-line
    document would serialize through one task. ``max_doc_segments``
    is the loud-guard bound on that contract (house style, like the
    hot-gram / hot-bucket / single-partition-window guards): a
    document whose segment count exceeds it fails the job with an
    actionable message instead of silently grinding one task. C4-
    shaped corpora sit around 10^1–10^4 lines/doc; the default bound
    (1M segments ≈ tens of MB of buffered text) is two orders above
    any real document while still far below an executor heap.

    ``freq_table`` switches to INCREMENTAL mode: segment frequencies
    come from a persisted :func:`line_frequency_table` (left join,
    unseen segments count 0 and are kept) instead of being recomputed
    from ``df`` — scrub a daily delta against corpus-level boilerplate
    evidence at O(delta). The streaming twin
    (``streaming.pipelines.streaming_line_dedup``) applies exactly
    this mode per micro-batch.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    segs = df.select(
        F.col(id_col).alias("docId"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep), -1)
        ).alias("pos", "seg"),
    ).withColumn("segHash", F.md5(F.trim(F.col("seg"))))
    # one join path for both modes: self-counting derives the table
    # from the input itself (every segment then matches, count >= 1);
    # incremental mode uses the persisted line_frequency_table — a
    # segment the table has never seen is unique in the reference
    # corpus (count 0, kept), and the delta never re-counts itself,
    # so the scrub is O(delta) against an at-rest corpus artifact.
    # The defensive per-hash SUM makes count-shard tables safe: a
    # nightly job appending new shards to the table (write
    # mode('append')) yields multiple rows per segHash, and counts
    # are additive — without the re-aggregation a duplicate key would
    # silently fan out every matching segment row into cleanText.
    freq = (
        freq_table.select("segHash", "segCount")
        if freq_table is not None
        else line_frequency_table(df, text_col, sep=sep)
    ).groupBy("segHash").agg(F.sum("segCount").alias("segCount"))
    joined = segs.join(freq, on="segHash", how="left").withColumn(
        "segCount", F.coalesce(F.col("segCount"), F.lit(0))
    )
    marked = joined.withColumn(
        "_drop",
        (F.col("segCount") > max_count)
        & (F.length(F.trim(F.col("seg"))) >= min_segment_chars),
    )
    kept_struct = F.when(
        ~F.col("_drop"), F.struct(F.col("pos"), F.col("seg"))
    )
    # loud guard on the rebuild contract — the count it checks is
    # computed in the SAME aggregate as the buffer it bounds, so the
    # check is free (no extra pass, no extra shuffle)
    guard_msg = F.concat(
        F.lit("line_dedup: document "),
        F.col("docId").cast("string"),
        F.lit(" has "),
        F.col("nSegments").cast("string"),
        F.lit(
            f" segments > documented bound {int(max_doc_segments)}; the "
            "per-doc rebuild buffers every surviving segment of one "
            "document in one aggregation buffer by design — split the "
            "document upstream or raise max_doc_segments before "
            "scaling up"
        ),
    )
    return (
        marked.groupBy("docId")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nSegments"),
            F.sum(F.col("_drop").cast("int")).cast("long").alias("nDropped"),
            F.array_sort(
                F.collect_list(kept_struct)
            ).alias("_kept"),
        )
        .select(
            "docId",
            F.when(
                F.col("nSegments") > F.lit(int(max_doc_segments)),
                F.raise_error(guard_msg),
            )
            .otherwise(F.col("nSegments"))
            .alias("nSegments"),
            "nDropped",
            F.array_join(
                F.transform(F.col("_kept"), lambda s: s["seg"]), sep
            ).alias("cleanText"),
        )
    )


def ngram_lm_table(
    df: "DataFrame",
    text_col: str = "text",
    order: int = 3,
    min_count: int = 1,
) -> "DataFrame":
    """Corpus n-gram count table for :func:`lm_stupid_backoff_score` —
    the persisted language MODEL of the Stupid-Backoff scheme (Brants
    et al. 2007, "Large Language Models in Machine Translation"),
    which replaces discounted smoothing with raw relative frequencies
    plus a fixed backoff factor EXACTLY so that the model reduces to
    count tables buildable with distributed aggregation.

    Rows: ``(gram, n, cnt)`` for every word 1..``order``-gram of the
    corpus (lowercased whitespace tokens, document-internal grams in
    :func:`word_ngrams` form). Counts are ADDITIVE per gram — the
    same contract as :func:`line_frequency_table`: a nightly refresh
    may append a new crawl's count shards and consumers re-aggregate
    with SUM per (gram, n), so duplicate gram rows across shards are
    never a fan-out. Scale shape: the three gram arrays ride one
    scan, one explode, ONE map-side-combined count on the gram key.

    ``min_count`` prunes rare grams from the emitted table (the
    standard KenLM-style size control; pruned grams score through
    backoff as unseen). Pruning BREAKS the additive append contract —
    a gram below threshold in each of two shards may exceed it
    jointly — so prune only at build/compact time over full counts,
    never on an append shard (the ``lm_table`` step enforces this).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if not 1 <= int(order) <= 3:
        raise ValueError(f"ngram_lm_table: order must be 1..3, got {order}")
    col = F.col(text_col)
    grams = tokens(F.lower(col))
    for k in range(2, int(order) + 1):
        grams = F.concat(grams, word_ngrams(col, k))
    counts = (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "gram",
            (F.size(F.split(F.col("gram"), F.lit(" "), -1))).cast("int").alias("n"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )
    if int(min_count) > 1:
        counts = counts.filter(F.col("cnt") >= int(min_count))
    return counts


def lm_stupid_backoff_score(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: "DataFrame | None" = None,
    order: int = 3,
    alpha: float = 0.4,
    lm_aggregated: bool = False,
) -> "DataFrame":
    """Per-document Stupid-Backoff n-gram LM score — the production
    form of the CCNet perplexity filter (Wenzek et al. 2020 train a
    KenLM ONCE on a reference corpus and score every new crawl
    against the frozen model; :func:`bigram_lm_score` is the
    closed-over-its-input special case). Scoring scheme per Brants
    et al. 2007: S(w|u v) = cnt(u v w)/cnt(u v) when the full n-gram
    was seen, else ``alpha`` · S(w|v), recursing to the unigram base,
    with every quantity a RAW corpus count — no discounting, which is
    what makes the model a plain additive count table maintainable by
    the ``lm_table`` step.

    ``lm`` is a ``(gram, n, cnt)`` table from :func:`ngram_lm_table`
    (duplicate gram rows re-aggregated here, honouring the additive
    shard contract); None trains on ``df`` itself. The unigram base
    is add-one smoothed over the MODEL vocabulary, S1(w) =
    (cnt(w)+1)/(N+V) — the OOV floor that keeps frozen-model scoring
    of unseen tokens finite (raw Stupid Backoff leaves S(OOV) = 0,
    which has no log). Position i scores with its longest in-document
    context: the first token at unigram level WITHOUT backoff penalty
    (nothing was backed off from), the second at bigram level, the
    rest at full order.

    Emits ``(docId, nTokens, avgLogScore, pseudoPerplexity)`` with
    avgLogScore the mean natural-log S over token positions and
    pseudoPerplexity = exp(−avgLogScore); documents with no tokens
    report 0 / null / null. An EMPTY model scores every position
    null (guarded division, no ANSI error).

    Scale shape (the :func:`bigram_lm_score` design one order up):
    the score is a pure function of the position's scoring KEY (the
    ≤order-gram ending at the position), so it is computed once per
    DISTINCT key — each key explodes into ≤5 count lookups (self,
    context, backoff suffix, suffix context, last word) satisfied by
    ONE join against the counts table and pivoted back by role — and
    only then joins back to the occurrence table: two gram-keyed
    shuffles bounded by distinct-key and occurrence cardinality, the
    1-row (N, V) aggregate rides a broadcast crossJoin, no UDFs, no
    driver state. The model side stays O(distinct grams); at corpus
    scale prune with ``min_count`` at build/compact time.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if int(order) not in (2, 3):
        raise ValueError(
            f"lm_stupid_backoff_score: order must be 2 or 3, got {order}"
        )
    a = float(alpha)
    col = F.col(text_col)
    self_trained = lm is None
    if self_trained:
        lm = ngram_lm_table(df, text_col, order=int(order))
        # ngram_lm_table emits exactly one row per gram
        lm_aggregated = True
    # ``lm_aggregated=True`` declares the table already carries ONE
    # row per gram (true for a fresh ngram_lm_table or a compacted
    # at-rest table) — the per-gram re-aggregation below is then an
    # identity and its full gram-keyed exchange is skipped (r14).
    # Passing it for a MULTI-SHARD table with duplicate gram rows
    # would double-count nothing but mis-join (duplicate lookup rows
    # fan out the pivot) — callers own that declaration.
    # (r14 note: a lazy localCheckpoint on `counts` was drilled and
    # REJECTED — the ExistingRDD barrier hides the build-side size
    # estimate, degrading the lookup broadcast join, and the model
    # lineage only has two executions here; measured 3.8 -> 5.3 s
    # WORSE at sf0.1. Deliberately left as-is.)
    if lm_aggregated:
        counts = lm.select("gram", F.col("cnt").cast("long").alias("_c"))
    else:
        # re-aggregate per gram FIRST (the additive shard contract: a
        # multi-shard table carries duplicate gram rows) — computing V
        # as a row count before this would overcount sharded
        # vocabularies.
        counts = lm.groupBy("gram").agg(F.sum("cnt").alias("_c"))
    if self_trained:
        # the model's unigram margin IS the corpus' token bag (same
        # tokenizer, same rows), so (N, V) come from one unigram-only
        # scan of ``df`` instead of re-executing the full 1..order-gram
        # explode + count lineage a second time (r14; bit-identical:
        # N = total token occurrences, V = distinct tokens)
        totals = df.select(
            F.explode(tokens(F.lower(col))).alias("_t")
        ).agg(
            F.count(F.lit(1)).alias("_N"),
            F.count_distinct(F.col("_t")).alias("_V"),
        )
    else:
        uni = lm.filter(F.col("n") == 1)
        if not lm_aggregated:
            uni = uni.groupBy("gram").agg(F.sum("cnt").alias("_cu"))
        else:
            uni = uni.select("gram", F.col("cnt").alias("_cu"))
        totals = uni.agg(
            F.sum("_cu").alias("_N"), F.count(F.lit(1)).alias("_V")
        )
    t1 = tokens(F.lower(col))
    if int(order) == 2:
        keys = F.concat(F.slice(t1, 1, 1), word_ngrams(col, 2))
    else:
        keys = F.concat(
            F.slice(t1, 1, 1),
            F.slice(word_ngrams(col, 2), 1, 1),
            word_ngrams(col, 3),
        )
    occ = df.select(
        F.col(id_col).alias("docId"), F.explode(keys).alias("key")
    ).localCheckpoint(eager=False)

    w = F.split(F.col("key"), F.lit(" "), -1)
    k = F.size(w)
    lookups = F.filter(
        F.array(
            F.struct(F.lit("c1").alias("role"), F.element_at(w, -1).alias("g")),
            F.struct(
                F.lit("c2").alias("role"),
                F.when(
                    k >= 2, F.array_join(F.slice(w, -2, 2), " ")
                ).alias("g"),
            ),
            F.struct(
                F.lit("cX2").alias("role"),
                F.when(k >= 2, F.element_at(w, -2)).alias("g"),
            ),
            F.struct(
                F.lit("c3").alias("role"),
                F.when(k == 3, F.col("key")).alias("g"),
            ),
            F.struct(
                F.lit("cX3").alias("role"),
                F.when(
                    k == 3, F.array_join(F.slice(w, 1, 2), " ")
                ).alias("g"),
            ),
        ),
        lambda s: s["g"].isNotNull(),
    )
    pivoted = (
        occ.select("key")
        .distinct()
        .select("key", F.explode(lookups).alias("_lk"))
        .join(
            counts, on=F.col("_lk.g") == F.col("gram"), how="left"
        )
        .groupBy("key")
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("_lk.role") == r, F.col("_c"))),
                    F.lit(0),
                ).alias(r)
                for r in ("c1", "c2", "cX2", "c3", "cX3")
            ]
        )
    )
    kk = F.size(F.split(F.col("key"), F.lit(" "), -1))
    denom = F.col("_N") + F.col("_V")
    s1 = F.when(denom > 0, (F.col("c1") + 1.0) / denom)
    s2 = F.when(
        (F.col("c2") > 0) & (F.col("cX2") > 0),
        F.col("c2") / F.col("cX2"),
    ).otherwise(F.lit(a) * s1)
    s3 = F.when(
        (F.col("c3") > 0) & (F.col("cX3") > 0),
        F.col("c3") / F.col("cX3"),
    ).otherwise(F.lit(a) * s2)
    score = (
        F.when(kk == 3, s3).when(kk == 2, s2).otherwise(s1)
    )
    score_tab = pivoted.crossJoin(F.broadcast(totals)).select(
        "key", F.log(score).alias("_ls")
    )
    scored = (
        occ.join(score_tab, on="key")
        .groupBy("docId")
        .agg(
            F.count(F.lit(1)).alias("nTokens"),
            F.avg("_ls").alias("_als"),
        )
    )
    return (
        df.select(F.col(id_col).alias("docId"))
        .distinct()
        .join(scored, on="docId", how="left")
        .select(
            "docId",
            F.coalesce("nTokens", F.lit(0)).cast("long").alias("nTokens"),
            F.round("_als", 6).alias("avgLogScore"),
            F.round(F.exp(-F.col("_als")), 6).alias("pseudoPerplexity"),
        )
    )


def bm25_postings(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_pfx: int = 64,
) -> "DataFrame":
    """Inverted-index postings for :func:`bm25_search` — the at-rest
    form of BM25 retrieval (:func:`bm25_scores` rescans the corpus
    per query; at corpus scale you index ONCE and each query touches
    only its own terms' postings).

    Rows: ``(pfx, term, docId, tf, dl)`` — one row per (document,
    distinct term), tf the in-document term frequency, dl the
    document length denormalized onto every posting so scoring never
    needs a doc-length side table. ``pfx = crc32(term) % n_pfx`` is
    the partition key: persisting with ``partitionBy("pfx")`` lets a
    query's scan statically prune to the partitions holding its own
    terms (the ``ivfpq_topk`` static-prune device; Spark's crc32 is
    the zlib CRC-32, so the Python side computes the same prefixes at
    plan time). Token-less documents emit no postings — corpus counts
    (n_docs, sum_dl) therefore live in the index META, not here.

    Scale shape: one explode + one map-side-combined count keyed on
    (term, doc); append = the new crawl's postings land as additional
    partition files (doc ids must be new — the ``bm25_index`` step
    documents that contract) plus a meta update.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    toks = tokens(F.lower(F.col(text_col)))
    occ = df.select(
        F.col(id_col).alias("docId"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return (
        occ.groupBy("term", "docId", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select(
            (F.crc32(F.col("term")) % int(n_pfx)).alias("pfx"),
            "term",
            "docId",
            "tf",
            "dl",
        )
    )


def bm25_corpus_stats(
    df: "DataFrame", text_col: str = "text"
) -> "DataFrame":
    """The 1-row (_nDocs, _sumDl) corpus aggregate :func:`bm25_search`
    broadcasts — counted over ALL documents (token-less ones included,
    exactly like :func:`bm25_scores`'s N/avgdl)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    toks = tokens(F.lower(F.col(text_col)))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("_nDocs"),
        F.sum(F.coalesce(F.size(toks), F.lit(0))).cast("long").alias("_sumDl"),
    )


def bm25_search(
    postings: "DataFrame",
    query_terms: list[str],
    stats: "DataFrame",
    k1: float = 1.2,
    b: float = 0.75,
    n_pfx: int = 64,
) -> "DataFrame":
    """Okapi BM25 over an inverted index — bit-identical scores to
    :func:`bm25_scores` on the corpus the index reflects, but the
    corpus is never rescanned: the query prunes the postings scan to
    its own terms' ``pfx`` partitions (prefixes computed driver-side
    with zlib crc32 == Spark crc32, so the IN-filter is STATIC and
    reaches the parquet source as a partition filter), per-term
    document frequencies fall out of the pruned postings themselves
    (one row per (term, doc) by construction), and the 1-row
    ``stats`` frame (from :func:`bm25_corpus_stats` or the index
    meta) rides a broadcast crossJoin.

    Emits ``(docId, dl, score)`` for documents matching at least one
    query term, score rounded to 6dp — the :func:`bm25_scores`
    output contract, so the two forms verify against each other.
    """
    import zlib  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    from pyspark.sql.window import Window  # noqa: PLC0415

    q = sorted({t.lower() for t in query_terms})
    pfxs = sorted({zlib.crc32(t.encode("utf-8")) % int(n_pfx) for t in q})
    pruned = postings.filter(
        F.col("pfx").isin(pfxs) & F.col("term").isin(q)
    )
    # document frequency per term as a window over the pruned postings
    # (one row per (term, doc) by construction): the pruned set is
    # read ONCE and shuffled once by term — a separate count aggregate
    # joined back would scan the partitions a second time, which at
    # probe scale cost more than the whole direct corpus scan
    scored = (
        pruned.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "docId",
            "dl",
            (
                F.log(
                    1.0
                    + (F.col("_nDocs") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * F.col("tf").cast("double")
                * (float(k1) + 1.0)
                / (
                    F.col("tf").cast("double")
                    + float(k1)
                    * (
                        1.0
                        - float(b)
                        + float(b)
                        * F.col("dl")
                        / (F.col("_sumDl") / F.col("_nDocs"))
                    )
                )
            ).alias("_part"),
        )
    )
    return (
        scored.groupBy("docId")
        .agg(
            F.first("dl").alias("dl"),
            F.round(F.sum("_part"), 6).alias("score"),
        )
    )
