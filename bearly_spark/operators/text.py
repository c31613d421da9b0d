"""Text-analysis operators for LLM training-data pipelines.

All hot-path expressions are JVM-side built-ins (split / filter /
transform / regexp) — no Python UDFs — so they run inside whole-stage
codegen and scale linearly with input bytes. The same definitions are
mirrored 1:1 in DuckDB SQL by the oracle strings in
``bearly_spark.registry`` (shared constants below keep the two in sync).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from bearly_spark.operators.rounding import (
    floor_round,
    floor_scaled,
    rational_round,
)

#: Tiny deterministic stopword lists used for language scoring. Shared with
#: the DuckDB oracle SQL — do not edit one side without the other.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}

#: Deterministic language priority for tie-breaks (first wins on equal
#: scores). Mirrored in the oracle CASE chain.
LANG_PRIORITY = ["en", "de", "es", "fr"]

#: "BPE-ish" word/number/punct tokenizer regex — shared with the oracle.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: Punctuation class for quality scoring — shared with the oracle.
PUNCT_CLASS = "[.,!?;:]"

#: English stopword list used for the quality score — shared with oracle.
QUALITY_STOPWORDS = STOPWORDS["en"]


def word_tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed (leading/trailing whitespace
    would otherwise yield '' entries)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def ensure_parallelism(df: DataFrame, width: str = "cores") -> DataFrame:
    """Round-robin repartition up to a parallelism floor when the input
    arrives in fewer splits (e.g. one small parquet file locally). A
    no-op at scale, where scans already produce >= floor splits — this
    never *reduces* partitioning and never triggers a job.

    ``width`` picks the floor (round-13 measurement, sf0.1 local[32]):

    - ``"cores"`` (default): the cluster's default parallelism — right
      for stages whose downstream per-row work is heavy (pair
      expansion + Levenshtein probes, per-doc signature UDFs): the
      entity-match probe measured 2.0s at 32 splits vs 5.8s at 8.
    - ``"shuffle"``: ``min(cores, spark.sql.shuffle.partitions)`` —
      right for wordcount-shaped tokenize passes, where the map work
      per split is small and per-task setup dominates past the
      session's shuffle width (hashed-TF measured 1.0s at the 8-wide
      shuffle width vs 1.35s at 32 splits).

    The split estimate comes from the scan's file listing
    (``df.inputFiles()``) — NOT ``df.rdd.getNumPartitions()``, which
    compiles the plan to an RDD on every call. File count underestimates
    splits when ``maxPartitionBytes`` chops large files, but that case is
    exactly the already-parallel one where the repartition is skipped
    anyway at scale; non-file sources (empty listing) are left alone
    (``createDataFrame`` already spreads to default parallelism).

    Lives here (round 13, moved from ``dedup``) so every corpus
    tokenize pass can spread a single-split documents scan before the
    Θ(tokens) regex/md5 map work — a single-file 5000-doc corpus
    otherwise serializes the whole tokenize+hash stage onto one
    core."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if width == "shuffle":
        try:
            target = min(
                target, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            )
        except (TypeError, ValueError):
            pass
    n_files = len(df.inputFiles())
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def token_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, single
    punctuation — a cheap, deterministic proxy for BPE token budgets."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), 0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return n_punct.cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def stopword_hits(tokens: Column, stopwords: list[str]) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, F.lower(t))))


def stopword_ratio(tokens: Column, stopwords: list[str]) -> Column:
    return stopword_hits(tokens, stopwords).cast("double") / F.greatest(
        F.size(tokens), F.lit(1)
    ).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]:
    0.4·min(1, n_tokens/50) + 0.3·(1 − punct_ratio) + 0.3·stopword_ratio.

    Length rewards substantive documents, punctuation penalizes symbol
    spam, stopword ratio rewards natural-language-like token mix. All
    arithmetic is per-row and order-free, so results are bit-deterministic.
    """
    toks = word_tokens(text)
    length_term = F.least(F.lit(1.0), F.size(toks).cast("double") / F.lit(50.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * stopword_ratio(toks, QUALITY_STOPWORDS)
    )


def quality_score_parts(text: Column) -> tuple[Column, Column]:
    """:func:`quality_score` as an exact integer rational (num, den):
    with T = n_tokens, m = min(50, T), L = max(len, 1), P = punct
    chars, S = stopword hits, Td = max(T, 1),

        score = m/125 + 3(L−P)/(10L) + 3S/(10Td)
              = (2·m·L·Td + 75·Td·(L−P) + 75·L·S) / (250·L·Td)

    so the 6dp emission can be ``rounding.rational_round`` — no IEEE
    arithmetic in the compared value (the round-7/8 midpoint-probe
    finding: the weighted ratio sum lands EXACTLY on 6dp midpoints on
    real fixtures, where any float form is a cross-build landmine).
    All factors in LONG (≤ 2·50·L·T ≈ 10¹³ for megabyte docs — no
    overflow even under ANSI)."""
    toks = word_tokens(text)
    t_ = F.size(toks).cast("long")
    m = F.least(F.lit(50).cast("long"), t_)
    ln = F.greatest(F.length(text), F.lit(1)).cast("long")
    np = (
        F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    ).cast("long")
    sh = stopword_hits(toks, QUALITY_STOPWORDS).cast("long")
    td = F.greatest(t_, F.lit(1).cast("long"))
    num = (
        F.lit(2).cast("long") * m * ln * td
        + F.lit(75).cast("long") * td * (ln - np)
        + F.lit(75).cast("long") * ln * sh
    )
    den = F.lit(250).cast("long") * ln * td
    return num, den


def lang_scores(tokens: Column) -> dict[str, Column]:
    return {lang: stopword_hits(tokens, words) for lang, words in STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax language guess with a fixed priority tie-break
    (LANG_PRIORITY order; 'und' = undetermined when no list scores > 0)."""
    scores = lang_scores(word_tokens(text))
    expr = F.lit("und")
    # Build the CASE chain back-to-front so earlier languages win ties.
    for lang in reversed(LANG_PRIORITY):
        others = [scores[o] for o in LANG_PRIORITY if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase token set. Two documents with the same bag of words collide —
    the classic cheap near-dup prefilter."""
    toks = F.array_sort(F.array_distinct(F.transform(word_tokens(text), F.lower)))
    return F.md5(F.concat_ws(" ", toks))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document stat bundle (all JVM-side).

    The two ratio columns quantize at 6dp via exact integer rationals
    (``rounding.rational_round``): the quality score's weighted ratio
    sum lands EXACTLY on 6dp midpoints on real fixtures (round-7/8
    midpoint audits), where every float form — plain ROUND and the
    floor form alike — is engine/build-defined."""
    df = ensure_parallelism(df, "shuffle")
    t = F.col(text_col)
    qn, qd = quality_score_parts(t)
    np = (F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))).cast("long")
    ln = F.greatest(F.length(t), F.lit(1)).cast("long")
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_bpe_tokens", bpe_token_count(t))
        .withColumn("punct_ratio", rational_round(np, ln, 6))
        .withColumn("quality", rational_round(qn, qd, 6))
        .withColumn("lang_guess", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )


def hashed_tf_embedding(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """Feature-hashed TF embedding: text -> L2-normalized dense
    ``array<double>`` of ``dim`` md5-bucketed token counts — the
    deterministic, model-free featurizer that turns the ``documents``
    table into an ``embeddings``-shaped table (ids + vectors), closing
    the docs -> vectors -> ANN pipeline loop without any external model.

    Every step is a JVM-side built-in (no UDF): tokenize/explode ->
    bucket = md5(token) first-6-hex as int mod dim (md5 is the one hash
    both Spark and DuckDB implement identically, which is what makes the
    oracle twin exact) -> per-(id, bucket) counts -> one map_from_entries
    per doc -> dense vector + L2 normalization over a 64-element array
    (interpreted HOF, but bounded by ``dim``, not data). Docs with no
    tokens get the zero vector. Counts are integers and the
    sum-of-squares is exact, so the normalized values match DuckDB
    bit-for-bit before the 6dp rounding.

    Scale: explode + one (id, bucket) shuffle + one (id) shuffle — both
    keyed on the doc id, mergeable partial aggregates all the way; at
    100 TB this is the same shape as wordcount.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.lower(F.col("_tok"))), 1, 6), 16, 10).cast("long") % dim
    ).alias("bucket")
    counts = (
        ensure_parallelism(df, "shuffle")
        .select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("_tok"))
        .select(id_col, bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sparse = counts.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("long")), F.lit(0)).cast(
            "double"
        ),
    )
    norm = F.sqrt(
        F.aggregate(F.col("_dense"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return (
        df.select(F.col(id_col))
        .join(sparse, id_col, "left")
        .withColumn("_dense", dense)
        .withColumn("_norm", norm)
        .select(
            F.col(id_col),
            F.transform(
                F.col("_dense"),
                lambda v: F.round(v / F.when(F.col("_norm") > 0, F.col("_norm")).otherwise(F.lit(1.0)), 6),
            ).alias("embedding"),
        )
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 keyword retrieval: top-``k`` documents for ``query``
    (distinct lowercased whitespace terms), scored

        score(d) = Σ_t  ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                        · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    — the classic probabilistic relevance function, the lexical
    counterpart to the embedding ANN path (and the standard first-stage
    retriever for decontamination / eval-overlap checks where exact
    keyword evidence matters more than semantic closeness).

    Scale shape: everything is JVM built-ins over wordcount-shaped
    shuffles keyed on doc id or term — tokenize/explode → per-doc length
    (one id-keyed agg), per-(id, term) tf restricted to the query's
    terms (the explode filter prunes the stream BEFORE the shuffle, so
    the tf aggregate is Θ(matching tokens), not Θ(corpus)), per-term df
    over that (tiny: ≤ |query| rows, broadcast back). The corpus-level
    scalars (N, avgdl) ride 1-row aggregates cross-joined in — Catalyst
    broadcasts single-row relations, no driver collect. Top-k is a
    distributed TakeOrdered (``orderBy().limit(k)``), never a global
    single-partition window; ranks are numbered on the k survivors.

    Determinism for the DuckDB twin: per-term contributions are rounded
    to 12dp and summed as DECIMAL(28,12) (order-independent, so Spark's
    aggregation order can't wiggle the last ulp), final score rounded to
    4dp; ties rank by doc id. k1+1 and 1-b are folded in Python and
    inlined as literals in BOTH engines so constant folding cannot
    differ in the last bit.

    Returns (id, score double, rank int), rank 1..k by (score desc, id).
    """
    terms = list(dict.fromkeys(t.lower() for t in query.split()))
    k1p1, omb = k1 + 1.0, 1.0 - b
    toks = ensure_parallelism(df, "shuffle").select(
        F.col(id_col),
        F.explode(F.transform(word_tokens(F.col(text_col)), F.lower)).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    wexpr = (idf * (F.col("tf") * F.lit(k1p1))) / (
        F.col("tf") + F.lit(k1) * (F.lit(omb) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .select(F.col(id_col), F.round(wexpr, 12).cast("decimal(28,12)").alias("w"))
    )
    scored = (
        contrib.groupBy(id_col)
        .agg(F.round(F.sum("w").cast("double"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col(id_col))
    )
    return scored.select(F.col(id_col), "score", rank.cast("int").alias("rank"))


def bm25_topk_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """:func:`bm25_topk` for a whole DataFrame of queries at once — the
    shape decontamination / eval-overlap checks actually need at scale:
    thousands of eval queries scored against the corpus in ONE pass
    over the token stream, instead of one driver-side loop iteration
    (and one full corpus scan) per query (round-4 verdict #5).

    Scale shape: identical to the single-query path with one extra
    broadcast — the (query_id, term) table (tiny: eval suites are
    thousands of short queries) joins into the per-(doc, term) tf
    stream AFTER the tf aggregate, so the corpus-sized shuffles
    (tokenize → dl, tf) are paid once regardless of query count; df_t
    and the corpus scalars (N, avgdl) are query-independent and also
    computed once. Per-query top-k is a rank window partitioned by
    query_id (WindowGroupLimit pushes the k-filter into the sort — no
    global single-partition sort), never a driver loop.

    Same determinism contract as the single-query path (12dp-rounded
    DECIMAL(28,12) contributions, 4dp score, ties by doc id), so the
    DuckDB twin is exact and the two paths agree query-by-query
    (equivalence-tested).

    Returns (query_id, id, score double, rank int), rank 1..k per query
    by (score desc, id)."""
    k1p1, omb = k1 + 1.0, 1.0 - b
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(F.transform(word_tokens(F.col(query_text_col)), F.lower))
        ).alias("term"),
    )
    toks = ensure_parallelism(df, "shuffle").select(
        F.col(id_col),
        F.explode(F.transform(word_tokens(F.col(text_col)), F.lower)).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    tf = (
        toks.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    wexpr = (idf * (F.col("tf") * F.lit(k1p1))) / (
        F.col("tf") + F.lit(k1) * (F.lit(omb) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(wexpr, 12).cast("decimal(28,12)").alias("w"),
        )
    )
    scored = contrib.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("w").cast("double"), 4).alias("score")
    )
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy(query_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    )
    return scored.withColumn("rank", rank.cast("int")).filter(F.col("rank") <= k)


def bigram_logprob_scores(
    df: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """Corpus-trained bigram language-model quality score per document:
    the mean add-k-smoothed log-probability of each document's token
    bigrams under counts aggregated from the WHOLE input corpus,

        score(d) = mean over bigrams (w1,w2) of
                   ln( (c(w1,w2) + k) / (c(w1,·) + k·V) )

    with V = vocabulary size. This is the perplexity-shaped quality
    signal (fluent text scores high; token soup, boilerplate and
    gibberish score low) that ratio heuristics (punct/stopword shares)
    can't express — the standard next tier of corpus quality filtering,
    with the corpus itself as the model (no external LM).

    Scale shape: one posexplode to bigram occurrences, then three
    wordcount-shaped aggregations (bigram counts, context counts, a
    1-row distinct-vocab scalar) joined back onto the occurrence stream
    — every shuffle keyed on token values with mergeable partial
    aggregates; the vocab scalar rides a 1-row broadcast.

    Determinism (round 8): each contribution is quantized to an
    INTEGER micro-nat (6dp) — ``floor(ln·10⁶ + 0.5)`` as BIGINT — then
    summed exactly; the per-doc mean is ``rational_round`` over those
    exact integers (4dp, integral division — no float division, no
    float rounding). The ln itself is the one irreducible libm call:
    a 1-ulp cross-build difference moves ``ln·10⁶`` by ~2·10⁻⁹, so a
    contribution flips only when it lands within that of a boundary —
    ~10⁻⁴ expected rows at this corpus size, vs ~certainty at the old
    12dp quantization (ulp(ln·10¹²) ≈ 2·10⁻³ — the round-8 midpoint
    audit flagged it). Exact-integer ln is not expressible in SQL;
    this bounds the residual risk instead and the probe measures it.

    Returns (id, n_bigrams, avg_logprob) for documents with ≥ 1 bigram
    (≥ 2 tokens); avg_logprob rounded to 4dp.
    """
    df = ensure_parallelism(df, "shuffle")
    t = F.transform(word_tokens(F.col(text_col)), F.lower)
    # bigram structs built array-side (one explode; no positional
    # self-join shuffle — token counts per doc are bounded, so the
    # interpreted HOF is Θ(tokens) per row, off the shuffle path)
    pair_arr = F.when(
        F.size(t) >= 2,
        F.transform(
            F.slice(t, 1, F.size(t) - 1),
            lambda w, i: F.struct(w.alias("w1"), F.get(t, i + 1).alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = df.select(F.col(id_col), F.explode(pair_arr).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = df.select(F.explode(t).alias("w")).agg(F.countDistinct("w").alias("v"))
    contrib = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            # integer micro-nats (floor is half-DOWN for the NEGATIVE
            # log-probs — deterministic in both engines); long cast of
            # the integer-valued double makes the sum exact
            floor_scaled(
                F.log(
                    (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
                ),
                6,
            ).cast("long").alias("lp_micro"),
        )
    )
    return contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        rational_round(
            F.sum("lp_micro"),
            F.lit(1_000_000) * F.count(F.lit(1)),
            4,
        ).alias("avg_logprob"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Context-window chunking: split each document into token windows
    of ``max_tokens`` advancing by ``max_tokens - overlap`` — the
    standard preprocessing for embedding models and training samples
    with bounded context (``pack_sequences`` solves the DUAL problem of
    concatenating short docs; this splits long ones). Tokens are
    LOWERCASED (the corpus-ops convention shared with BM25/minhash —
    chunk text feeds retrieval/embedding, not display). The final window
    is the remainder (shorter, never empty); a document at or under the
    budget yields exactly one chunk of itself; null/empty-token docs
    yield nothing.

    Pure JVM expressions end to end: tokenize once, explode a stride
    ``sequence`` of window starts, ``slice`` + ``array_join`` per
    window — map-only (Θ(tokens × 1/(1-overlap/max)) output rows, no
    shuffle at all), which is what a 100 TB chunking pass must be.

    Returns (id, chunk_id, n_chunks, chunk_tokens, chunk_text) with
    chunk_id 0-based in document order."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens: {overlap}, {max_tokens}")
    stride = max_tokens - overlap
    df = ensure_parallelism(df, "shuffle")
    toks = F.transform(word_tokens(F.col(text_col)), F.lower)
    n = F.size(toks)
    # window starts 0, stride, 2*stride, ... while start + overlap < n —
    # i.e. the last window begins at the largest multiple of stride
    # still holding unseen tokens: ceil((n - overlap)/stride) windows
    # GREATEST(1, ...): a non-empty doc at or under `overlap` tokens
    # still yields its one (short) chunk — and Spark's `sequence` would
    # otherwise count DOWN for a 0 upper bound
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride))
    ).cast("int")
    return (
        df.select(F.col(id_col), toks.alias("_t"), n.alias("_n"), n_chunks.alias("n_chunks"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            "n_chunks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
            F.col("_t"),
        )
        .select(
            id_col,
            "chunk_id",
            "n_chunks",
            F.slice(
                F.col("_t"), F.col("chunk_id") * stride + 1, F.lit(max_tokens)
            ).alias("_w"),
        )
        .select(
            id_col,
            "chunk_id",
            "n_chunks",
            F.size("_w").alias("chunk_tokens"),
            F.array_join("_w", " ").alias("chunk_text"),
        )
    )


def build_vocabulary(
    df: DataFrame, text_col: str = "text", top_v: int = 1000
) -> DataFrame:
    """Tokenizer-prep vocabulary: the ``top_v`` most frequent lowercased
    whitespace tokens with deterministic ties (count DESC, token ASC —
    a tie-broken total order, so the vocab is reproducible run-to-run
    and engine-to-engine). Output (token, cnt, rank), rank 1-based.

    Scale shape: one wordcount-shaped shuffle (map-side combine on the
    token) then a global top-V — TakeOrdered over |distinct tokens|
    rows, never the corpus. V is vocabulary-sized (thousands), so the
    result broadcasts into downstream consumers like :func:`oov_rate`.
    """
    from pyspark.sql import Window

    counts = (
        ensure_parallelism(df, "shuffle")
        .select(F.explode(word_tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_v)
        .select(
            "token",
            "cnt",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("token")))
            .alias("rank"),
        )
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a vocabulary frame
    (one ``token`` column, e.g. :func:`build_vocabulary` output) — the
    coverage check run before committing to a tokenizer vocab, and a
    quality/novelty signal per doc. Output (id, n_tokens, n_oov,
    oov_rate 6dp); docs with no tokens report NULL rate (not 0 — "no
    evidence" is not "fully covered").

    The vocab is broadcast (vocabulary-sized by construction); the
    corpus pays one explode + one broadcast left join + one groupBy on
    the id — no corpus-keyed shuffle beyond the id regroup."""
    toks = ensure_parallelism(df, "shuffle").select(
        F.col(id_col),
        F.explode_outer(word_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    flagged = toks.join(
        F.broadcast(vocab.select("token").distinct().withColumn("_in", F.lit(1))),
        "token",
        "left",
    )
    return flagged.groupBy(id_col).agg(
        F.count("token").alias("n_tokens"),
        F.sum(F.when(F.col("token").isNotNull() & F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("token").isNotNull() & F.col("_in").isNull(), 1).otherwise(0))
            / F.nullif(F.count("token"), F.lit(0)),
            6,
        ).alias("oov_rate"),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: for each document the
    ``top_k`` lowercased whitespace tokens ranked by
    ``(tf/doc_len) * (n_docs/df)`` — a deliberately ln-free IDF (the
    plain rarity ratio) so every score is a fixed IEEE expression over
    exact integer counts and twins bit-for-bit (the classic
    ``log(N/df)`` form only reweights monotonically per token, so the
    per-document ranking it induces differs only when two tokens tie,
    which the deterministic token tie-break already pins).

    Output (id, token, tfidf 6dp, rank 1..top_k); ranking is by the
    ROUNDED score (desc, token asc) so both engines rank identical
    values. Docs with no tokens are absent (no keywords to report).

    Scale shape: one (id, token) wordcount shuffle with map-side
    combine; doc lengths fall out of the same partitioning via a
    same-key window (no second shuffle); document frequencies are a
    token-keyed rollup of the DISTINCT (id, token) pairs already in
    hand — vocabulary-sized, joined back shuffle-on-token; the 1-row
    corpus doc count attaches as a broadcast. The final per-doc top-k
    is a WindowGroupLimit rank, never a global sort."""
    from pyspark.sql import Window

    tf = (
        ensure_parallelism(df, "shuffle")
        .select(
            F.col(id_col), F.explode(word_tokens(F.lower(F.col(text_col)))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tfc"))
    )
    # doc length over the same id partitioning — no extra shuffle
    tf = tf.withColumn("dlen", F.sum("tfc").over(Window.partitionBy(id_col)))
    dfc = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfc"))
    n_docs = tf.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfc, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            F.round(
                (F.col("tfc").cast("double") / F.col("dlen").cast("double"))
                * (F.col("n_docs").cast("double") / F.col("dfc").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "token", "tfidf", "rank")
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Corpus-level collocation extraction by PMI lift: adjacent token
    pairs ranked by ``p(w1,w2) / (p(w1)·p(w2))`` — how much more often
    the pair occurs than independence predicts ("new york", "machine
    learning"). The ln-free RATIO (pointwise mutual information is its
    log, a monotone reweighting) keeps every score a fixed IEEE tree
    over exact integer counts, so the twin matches bit-for-bit; pairs
    below ``min_count`` occurrences are dropped (PMI's classic
    low-count explosion). Returns the global top-``top_n`` by
    (rounded lift DESC, w1, w2) with counts.

    Scale shape: one array-side bigram build (Θ(tokens)/row, no
    positional self-join) + three wordcount-shaped shuffles (pair
    counts, unigram counts joined twice, both sides vocabulary-sized
    after aggregation) + two 1-row broadcast totals; final top-n is
    TakeOrdered over the min_count-surviving pairs, never a global
    sort of the corpus."""
    # tokenize ONCE behind an explicitly-partitioned exchange: the
    # bigram and unigram streams both read the same shuffle output
    # (ReusedExchange), so the regex tokenization runs one time and in
    # parallel even off a single-split file; totals are aggregates of
    # the (vocabulary-sized) count frames, not extra corpus scans.
    # Round 14: the floor goes BELOW the tokenize — the r13 layout put
    # the Θ(tokens) regex pass under the exchange, so a single-split
    # corpus still tokenized on one core and only the explode/groupBys
    # ran wide; spreading the RAW rows first (a no-op at scale, like
    # the eleven sibling passes) parallelizes the tokenize itself while
    # the tokens exchange keeps the one-tokenize sharing.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    toks = ensure_parallelism(df).select(
        F.transform(word_tokens(F.col(text_col)), F.lower).alias("ts")
    ).repartition(n_parts)
    t = F.col("ts")
    pair_arr = F.when(
        F.size(t) >= 2,
        F.transform(
            F.slice(t, 1, F.size(t) - 1),
            lambda w, i: F.struct(w.alias("w1"), F.get(t, i + 1).alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = toks.select(F.explode(pair_arr).alias("p")).select("p.w1", "p.w2")
    uni = toks.select(F.explode(t).alias("w"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    nb = c2.agg(F.sum("c2").alias("n_bigrams"))
    nu = c1.agg(F.sum("c1").alias("n_unigrams"))
    lift = (
        F.col("c2").cast("double") / F.col("n_bigrams").cast("double")
    ) / (
        (F.col("cu1").cast("double") / F.col("n_unigrams").cast("double"))
        * (F.col("cu2").cast("double") / F.col("n_unigrams").cast("double"))
    )
    scored = (
        c2.filter(F.col("c2") >= min_count)
        .join(c1.select(F.col("w").alias("w1"), F.col("c1").alias("cu1")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c1").alias("cu2")), "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1", "w2", F.col("c2").alias("pair_count"), F.round(lift, 6).alias("lift")
        )
    )
    return scored.orderBy(F.desc("lift"), "w1", "w2").limit(top_n)


# ===================================================================
# BPE merge learning (round 12) — distributed tokenizer prep: the
# Sennrich-2016 construction done Spark-first. Pair counting and merge
# application run over the DISTINCT-WORD frame (Theta(vocab), not
# Theta(corpus)): the corpus is scanned once for word frequencies, and
# each merge round is two wordcount-shaped shuffles over the vocab plus
# a map-only string replace — the shape that survives 100 TB, where
# vocab << corpus. No counterpart in the reference engine (capability
# superset, SURVEY §2.3 text family).
# ===================================================================

#: Symbol-sequence delimiter. Words containing it are excluded from
#: BPE learning and segmentation (they would corrupt the boundary
#: encoding); the oracle applies the same filter.
BPE_DELIM = "|"


def _bpe_word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — one corpus
    scan + one wordcount shuffle; every later BPE round touches only
    this (distinct-word-sized) frame."""
    return (
        ensure_parallelism(df, "shuffle")
        .select(
            F.explode(word_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("w")
        )
        .select(F.lower(F.col("w")).alias("word"))
        .filter(~F.col("word").contains(BPE_DELIM))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _bpe_initial_symbols(words: DataFrame) -> DataFrame:
    """word -> '|c|h|a|r|s|' boundary-delimited symbol string. The
    sentinel delimiters make every merge a plain non-overlapping
    left-to-right string replace of '|a|b|' with '|ab|' — identical
    semantics in java String.replace and DuckDB replace (pinned by
    tests on the '|a|a|a|' chain case)."""
    return words.withColumn(
        "sym",
        F.concat(
            F.lit(BPE_DELIM),
            F.array_join(
                F.regexp_extract_all(F.col("word"), F.lit("."), 0), BPE_DELIM
            ),
            F.lit(BPE_DELIM),
        ),
    )


def _bpe_pair_counts(syms: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies weighted by word
    frequency — slice/zip/explode (JVM-side), one wordcount shuffle
    over Theta(vocab * word_len) pair rows."""
    sy = F.filter(F.split(F.col("sym"), r"\|"), lambda x: x != F.lit(""))
    n = F.size(sy)
    pairs = F.arrays_zip(
        F.slice(sy, 1, n - 1).alias("a"), F.slice(sy, 2, n - 1).alias("b")
    )
    return (
        syms.select("freq", F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_learn(df: DataFrame, text_col: str, n_merges: int = 8) -> list[dict]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table as axis-sized driver rows, each
    ``{step, left, right, merged, pair_count}``.

    Each round: count adjacent symbol pairs over the distinct-word
    frame, take the (count DESC, pair ASC)-deterministic argmax (a
    1-row TakeOrdered collect — a convergence-style axis reduction),
    apply the merge as a map-only replace, and localCheckpoint to stop
    lineage growth across rounds. Rounds whose vocabulary has no pairs
    left stop early.
    """
    syms = _bpe_initial_symbols(_bpe_word_freqs(df, text_col))
    syms = syms.localCheckpoint(eager=False)
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        top = (
            _bpe_pair_counts(syms)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append(
            {
                "step": step,
                "left": a,
                "right": b,
                "merged": a + b,
                "pair_count": cnt,
            }
        )
        syms = syms.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f"{BPE_DELIM}{a}{BPE_DELIM}{b}{BPE_DELIM}"),
                F.lit(f"{BPE_DELIM}{a}{b}{BPE_DELIM}"),
            ),
        ).localCheckpoint(eager=False)
    return merges


def bpe_apply_merges(syms: DataFrame, merges: list[dict]) -> DataFrame:
    """Apply a learned merge table to a symbol frame (map-only: one
    chained replace expression, merges in step order)."""
    col = F.col("sym")
    for m in sorted(merges, key=lambda m: m["step"]):
        col = F.replace(
            col,
            F.lit(f"{BPE_DELIM}{m['left']}{BPE_DELIM}{m['right']}{BPE_DELIM}"),
            F.lit(f"{BPE_DELIM}{m['merged']}{BPE_DELIM}"),
        )
    return syms.withColumn("sym", col)


def bpe_segment_stats(
    df: DataFrame, id_col: str, text_col: str, merges: list[dict]
) -> DataFrame:
    """Per-document segmentation stats under a learned merge table:
    ``(id, n_words, n_chars, n_symbols)`` — the compression diagnostic
    that decides whether a vocab is worth shipping (chars/symbols ~
    bytes-per-token). The merge table is applied to the DISTINCT-WORD
    frame (Theta(vocab) replaces), then docs re-join their words
    against the broadcast-sized (word, n_sym) map: the corpus pays one
    tokenize + one broadcast join + one regroup, never a per-row
    Python call. Words containing the delimiter are excluded from the
    counts (same filter as learning)."""
    vocab = bpe_apply_merges(
        _bpe_initial_symbols(_bpe_word_freqs(df, text_col)), merges
    ).select(
        "word",
        F.size(
            F.filter(F.split(F.col("sym"), r"\|"), lambda x: x != F.lit(""))
        ).alias("n_sym"),
        F.length("word").alias("n_chr"),
    )
    toks = ensure_parallelism(df, "shuffle").select(
        F.col(id_col),
        F.explode(word_tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("w"),
    ).select(id_col, F.lower(F.col("w")).alias("word")).filter(
        ~F.col("word").contains(BPE_DELIM)
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chr").alias("n_chars"),
            F.sum("n_sym").alias("n_symbols"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce("n_symbols", F.lit(0)).cast("long").alias("n_symbols"),
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[dict],
    max_tokens: int = 40,
) -> DataFrame:
    """Encode documents under a learned merge table: the first
    ``max_tokens`` tokens of each document as
    ``(id, pos, symbol, token_id)`` rows — the tokenizer APPLICATION
    step (learn → segment stats → encode), i.e. what actually feeds a
    training pipeline. ``token_id`` is the symbol's rank in the full
    post-merge corpus inventory (freq DESC, symbol ASC — the vocab you
    would ship beside the merges), so ids are deterministic and dense.

    Scale shape: the merge table applies to the DISTINCT-WORD frame
    (Θ(vocab) replaces, never the corpus); documents pay one tokenize
    + one broadcast (word → symbol-array) join + one broadcast
    (symbol → id) join. Global token positions come from a cumulative
    per-word symbol-count window keyed by document — a per-document
    sort, never a global one. Words containing the delimiter are
    excluded (same filter as learning)."""
    from pyspark.sql import Window

    # localCheckpoint the post-merge distinct-word frame (the same
    # pattern as bpe_learn): the inventory collect below materializes
    # it once, and the vocab broadcast join reuses that result instead
    # of re-scanning the corpus and replaying every merge
    merged = bpe_apply_merges(
        _bpe_initial_symbols(_bpe_word_freqs(df, text_col)), merges
    ).localCheckpoint(eager=False)
    sy = F.filter(F.split(F.col("sym"), r"\|"), lambda x: x != F.lit(""))
    vocab = merged.select("word", sy.alias("syms"), F.size(sy).alias("n_sym"))
    # The inventory is AXIS-sized (<= alphabet + len(merges) symbols),
    # so it ranks on the driver and returns as a JVM literal — a global
    # row_number window here would plan the one-task
    # Sort-over-Exchange-SinglePartition this repo bans outright.
    inv_rows = (
        merged.select("freq", F.explode(sy).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("freq"))
        .collect()
    )
    ranked = sorted(inv_rows, key=lambda r: (-r["freq"], r["symbol"]))
    if not ranked:  # no encodable words anywhere in the corpus
        return df.limit(0).select(
            F.col(id_col),
            F.lit(0).cast("int").alias("pos"),
            F.lit("").alias("symbol"),
            F.lit(0).cast("int").alias("token_id"),
        )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r["symbol"]).alias("symbol"),
                F.lit(i + 1).cast("int").alias("token_id"),
            )
            for i, r in enumerate(ranked)
        ]
    )
    inventory = (
        df.sparkSession.range(1)
        .select(F.explode(pairs).alias("p"))
        .select("p.symbol", "p.token_id")
    )
    kept = F.filter(
        word_tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda x: ~F.lower(x).contains(BPE_DELIM),
    )
    toks = ensure_parallelism(df, "shuffle").select(
        F.col(id_col), F.posexplode(kept).alias("wpos", "w")
    ).select(id_col, "wpos", F.lower(F.col("w")).alias("word"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("wpos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        toks.join(F.broadcast(vocab), "word")
        .withColumn("offset", F.coalesce(F.sum("n_sym").over(w), F.lit(0)))
        # a word whose tokens all start past the cap contributes nothing
        .filter(F.col("offset") < max_tokens)
        .select(
            id_col,
            "offset",
            F.posexplode(F.col("syms")).alias("spos", "symbol"),
        )
        .select(
            id_col,
            (F.col("offset") + F.col("spos") + 1).cast("int").alias("pos"),
            "symbol",
        )
        .filter(F.col("pos") <= max_tokens)
    )
    return placed.join(F.broadcast(inventory), "symbol").select(
        id_col, "pos", "symbol", "token_id"
    )


def bpe_symbol_inventory(
    df: DataFrame, text_col: str, merges: list[dict], top_v: int = 50
) -> DataFrame:
    """The post-merge subword inventory — the vocabulary you would
    actually ship with the merges: ``(symbol, freq, rank)`` for the
    ``top_v`` most frequent symbols, freq = corpus occurrences
    (symbol count per word × word frequency). Deterministic ties
    (freq DESC, symbol ASC). Same Theta(vocab) shape as learning: the
    corpus was already reduced to (word, freq); symbols explode off
    the distinct-word frame and one wordcount shuffle + TakeOrdered
    finishes it."""
    from pyspark.sql import Window

    syms = bpe_apply_merges(
        _bpe_initial_symbols(_bpe_word_freqs(df, text_col)), merges
    )
    sy = F.filter(F.split(F.col("sym"), r"\|"), lambda x: x != F.lit(""))
    counted = (
        syms.select("freq", F.explode(sy).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), "symbol")
    return (
        counted.orderBy(F.desc("freq"), "symbol")
        .limit(top_v)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
