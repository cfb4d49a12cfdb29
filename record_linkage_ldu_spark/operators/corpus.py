"""Corpus-level training-data pipeline operators.

The dedup/ANN families (operators/dedup.py, operators/ann.py) decide
WHICH documents are redundant; these operators are the surrounding
pipeline steps a large-scale training-data build needs around them:

  * ``corpus_filter_flags`` — one composed C4-style cleaning pass
    (dedup + language + length + quality) with an observable
    reject-reason per document, not a silent filter;
  * ``stratified_sample`` — deterministic per-stratum hash sampling
    (reproducible corpus mixing: re-running the job re-selects the
    exact same documents, no RNG state);
  * ``token_budget_shards`` — pack documents, in a stable global
    order, into output shards holding ~``budget`` tokens each
    (training shards are token-budgeted, not row-counted);
  * ``decontaminate`` — flag corpus documents sharing winnowing
    fingerprints with a benchmark/eval set (train-test contamination
    is an n-gram-overlap property, the same rolling-hash machinery as
    winnow near-dup detection).

All four are pure DataFrame compositions (no Python in the row path)
with exact DuckDB twins.  Scale notes sit on each operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    doc_fingerprint,
    lang_id,
    max_run_count,
    ngrams_of_tokens,
    quality_score,
    sql_doc_fingerprint,
    sql_lang_id,
    sql_max_run_count,
    sql_ngrams,
    sql_quality_score,
    sql_token_count,
    sql_tokens,
    sql_winnow_fingerprint_cte,
    token_count,
    tokens,
)
from .dedup import ensure_width, winnow_fingerprint_table

# ------------------------------------------------------------------
# Composed cleaning filter (C4-style: dedup + lang + length + quality)
# ------------------------------------------------------------------

# Rejection precedence (first failing rule names the reason). Fixed
# and documented so the reject histogram is comparable across runs.
REJECT_ORDER = ("duplicate", "wrong_lang", "too_short", "too_long", "low_quality")


def corpus_filter_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.3,
) -> DataFrame:
    """One pass of composed corpus cleaning: every document gets its
    diagnostic columns plus the FIRST failing rule as ``reject_reason``
    (NULL = kept).  Emitting flags instead of filtering keeps the
    decision observable — the reject histogram is the cleaning report,
    and the actual filter is one ``WHERE keep = 1`` downstream.

    Scale shape: the lang/quality/token columns are one narrow
    projection over the scan (native expressions, no shuffle).  The
    duplicate flag is the exact-dedup groupBy restated as a canonical
    join: fingerprint -> min(doc_id) is one hash aggregate, joined
    back on fingerprint (both sides partition by the same key — AQE
    plans one shuffle each side, no skew: a fingerprint group is a
    duplicate family, bounded in practice, and the join carries only
    (fingerprint, canonical)).
    """
    # NULL text coalesces to '' so the row still flows: a null
    # fingerprint would silently drop the row at the canonical join
    # (null join keys never match) and null diagnostics would null
    # the reject_reason into keep=1
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        doc_fingerprint(txt).alias("_fp"),
        token_count(txt).alias("n_tokens"),
        lang_id(txt).alias("lang_pred"),
        quality_score(txt).alias("quality"),
    )
    canon = base.groupBy("_fp").agg(F.min("doc_id").alias("_canonical"))
    flagged = base.join(canon, "_fp").select(
        "doc_id",
        "n_tokens",
        "lang_pred",
        "quality",
        (F.col("doc_id") != F.col("_canonical")).alias("_dup"),
    )
    reason = (
        F.when(F.col("_dup"), F.lit("duplicate"))
        .when(F.col("lang_pred") != lang, F.lit("wrong_lang"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
    )
    return flagged.select(
        "doc_id",
        "n_tokens",
        "lang_pred",
        "quality",
        reason.alias("reject_reason"),
        F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


def sql_corpus_filter_flags(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.3,
) -> str:
    """DuckDB twin of ``corpus_filter_flags``."""
    txt = f"coalesce({text_col}, '')"
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   {sql_doc_fingerprint(txt)} AS _fp,
                   {sql_token_count(txt)} AS n_tokens,
                   {sql_lang_id(txt)} AS lang_pred,
                   {sql_quality_score(txt)} AS quality
            FROM {table}
        ),
        canon AS (
            SELECT _fp, min(doc_id) AS _canonical FROM base GROUP BY _fp
        ),
        flagged AS (
            SELECT b.doc_id, b.n_tokens, b.lang_pred, b.quality,
                   CASE WHEN b.doc_id <> c._canonical THEN 'duplicate'
                        WHEN b.lang_pred <> '{lang}' THEN 'wrong_lang'
                        WHEN b.n_tokens < {min_tokens} THEN 'too_short'
                        WHEN b.n_tokens > {max_tokens} THEN 'too_long'
                        WHEN b.quality < {min_quality} THEN 'low_quality'
                        END AS reject_reason
            FROM base b JOIN canon c USING (_fp)
        )
        SELECT doc_id, n_tokens, lang_pred, quality, reject_reason,
               CAST(CASE WHEN reject_reason IS NULL THEN 1 ELSE 0 END
                    AS INT) AS keep
        FROM flagged
    """


# ------------------------------------------------------------------
# Repetition-based quality signals (Gopher-style)
# ------------------------------------------------------------------


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition statistics — the Gopher-rules family of
    quality signals that catch boilerplate/templated text the
    length/stopword heuristics of ``quality_score`` miss:

      * ``dup_token_frac``  — 1 - distinct/total tokens;
      * ``top_bigram_frac`` — occurrences of the single most frequent
        word bigram over all bigram slots;
      * ``dup_trigram_frac``— fraction of trigram slots that are
        redundant re-occurrences of an earlier trigram
        (1 - distinct/total).

    Scale shape: entirely row-local — tokens are staged once as an
    attribute (the HOF lambdas index it, never re-derive it), the
    most-frequent-bigram count is a sort + one linear struct-state
    fold (``max_run_count``), so the whole operator is one narrow
    projection: no shuffle, no UDF, embarrassingly parallel at any
    corpus size.
    """
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    )
    n = F.size("_t")
    nd = n.cast("double")
    bi = ngrams_of_tokens(F.col("_t"), 2)
    tri = ngrams_of_tokens(F.col("_t"), 3)
    dup_tok = F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct("_t")) / nd
    ).otherwise(F.lit(0.0))
    top_bi = F.when(
        n >= 2, max_run_count(bi).cast("double") / (nd - 1)
    ).otherwise(F.lit(0.0))
    dup_tri = F.when(
        n >= 3, F.lit(1.0) - F.size(F.array_distinct(tri)) / (nd - 2)
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(top_bi, 6).alias("top_bigram_frac"),
        F.round(dup_tri, 6).alias("dup_trigram_frac"),
    )


def sql_repetition_signals(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``repetition_signals``."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   {sql_tokens(f"coalesce({text_col}, '')")} AS t
            FROM {table}
        ),
        g AS (
            SELECT doc_id, t,
                   {sql_ngrams("t", 2)} AS bg,
                   {sql_ngrams("t", 3)} AS tg
            FROM base
        )
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               round(CASE WHEN len(t) > 0
                     THEN 1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                     ELSE 0.0 END, 6) AS dup_token_frac,
               round(CASE WHEN len(t) >= 2
                     THEN CAST({sql_max_run_count("bg")} AS DOUBLE) / (len(t) - 1)
                     ELSE 0.0 END, 6) AS top_bigram_frac,
               round(CASE WHEN len(t) >= 3
                     THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / (len(t) - 2)
                     ELSE 0.0 END, 6) AS dup_trigram_frac
        FROM g
    """


# ------------------------------------------------------------------
# Token-window chunking (training-example preparation)
# ------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    chunk: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    context-window chunking step that turns corpus documents into
    training examples.  Chunk ``i`` covers token positions
    ``[i*stride, i*stride + chunk)`` with ``stride = chunk - overlap``;
    the chunk count ``max(1, 1 + ceil((n - chunk) / stride))`` covers
    every token, the final chunk may be short.  Empty docs emit no
    chunks.

    Scale shape: tokens staged once as an attribute, then one
    ``explode`` over the per-doc chunk-index sequence — a narrow
    Generate (fan-out proportional to output size), no shuffle, no
    UDF.  At 100TB the output is written partitioned by a hash of
    doc_id so one giant doc's chunks still spread over tasks via
    AQE's post-Generate coalescing.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    stride = chunk - overlap
    base = (
        ensure_width(df)
        .select(
            F.col(id_col).alias("doc_id"),
            tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
        )
        .withColumn("_n", F.size("_t"))
        .where(F.col("_n") > 0)
    )
    n_chunks = F.when(F.col("_n") <= chunk, F.lit(1)).otherwise(
        F.lit(1) + F.floor((F.col("_n") - chunk + stride - 1) / stride)
    )
    start = F.col("chunk_id") * stride
    return (
        base.select(
            "doc_id",
            "_t",
            "_n",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(F.lit(chunk), F.col("_n") - start)
            .cast("long")
            .alias("chunk_tokens"),
            F.array_join(F.slice("_t", start + 1, F.lit(chunk)), " ").alias(
                "chunk_text"
            ),
        )
    )


def sql_chunk_documents(
    table: str,
    chunk: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``chunk_documents`` (list slices are 1-based,
    end-inclusive in DuckDB — ``t[s+1 : s+chunk]`` ==
    ``slice(t, s+1, chunk)``)."""
    stride = chunk - overlap
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   {sql_tokens(f"coalesce({text_col}, '')")} AS t
            FROM {table}
        ),
        sized AS (
            SELECT doc_id, t, len(t) AS n FROM base WHERE len(t) > 0
        ),
        ch AS (
            SELECT doc_id, t, n,
                   unnest(range(0, CASE WHEN n <= {chunk} THEN 1
                          ELSE 1 + (n - {chunk} + {stride} - 1) // {stride}
                          END)) AS chunk_id
            FROM sized
        )
        SELECT doc_id,
               CAST(chunk_id AS INT) AS chunk_id,
               CAST(least({chunk}, n - chunk_id * {stride}) AS BIGINT)
                   AS chunk_tokens,
               array_to_string(
                   t[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk}],
                   ' ') AS chunk_text
        FROM ch
    """


# ------------------------------------------------------------------
# Deterministic corpus shuffle (training-order assignment)
# ------------------------------------------------------------------


def corpus_shuffle(
    df: DataFrame,
    n_shards: int = 16,
    seed: str = "shuf",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a deterministic global training order:
    shard = hash(seed:id) mod n_shards, position = rank of the hash
    within the shard.  Reading shards in id order yields the same
    shuffled stream on every run, engine, and cluster size — the
    reproducible-shuffle contract a training-data loader wants (no RNG
    state, re-runs and backfills land identically).

    Scale shape: one shuffle on the shard key + a per-shard window
    rank.  Size ``n_shards`` so a shard is one task's worth of rows
    (e.g. corpus_rows / 4M): the rank window is per-shard, so
    parallelism == n_shards.  For a global (non-sharded) order at
    extreme scale, compose the ``global_ranks`` two-pass recipe
    (blocking.py) over the hash instead.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"), key.alias("_key")
    )
    shard = (
        F.conv(F.substring("_key", 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_key", "doc_id")
    return (
        base.withColumn("shard", shard)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def corpus_shuffle_global(
    df: DataFrame,
    seed: str = "shuf",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global (non-sharded) deterministic shuffle order: ``pos`` =
    rank of md5(seed:id) across the WHOLE corpus — for consumers that
    want one totally-ordered stream rather than per-shard positions
    (``corpus_shuffle``).

    Scale shape: the rank never uses a single-partition window — it
    composes the ``global_ranks`` two-pass recipe (sample-quantile
    literal bounds -> per-bucket window + broadcast census-offset
    join), so the sort parallelism is ``num_partitions``, not 1.
    """
    from .blocking import global_ranks

    # the key is staged as a real column first: handing global_ranks
    # the derived md5 expression directly trips a Catalyst internal
    # error (ATTRIBUTE_NOT_FOUND) when the HOF bucket lambda collapses
    # into the census window chain
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        F.md5(
            F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
        ).alias("_sk"),
    )
    ranked = global_ranks(
        base, F.col("_sk"), id_col="doc_id", num_partitions=num_partitions
    )
    return ranked.select(
        "doc_id", (F.col("_rank") - 1).cast("long").alias("pos")
    )


def sql_corpus_shuffle_global(
    table: str,
    seed: str = "shuf",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``corpus_shuffle_global`` (one global window —
    fine at oracle scale)."""
    key = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    return f"""
        SELECT {id_col} AS doc_id,
               CAST(row_number() OVER (ORDER BY {key}, {id_col}) - 1
                    AS BIGINT) AS pos
        FROM {table}
    """


def sql_corpus_shuffle(
    table: str,
    n_shards: int = 16,
    seed: str = "shuf",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``corpus_shuffle``."""
    key = f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"
    shard = (
        f"CAST(('0x' || substr({key}, 1, 8))::UBIGINT % {n_shards} AS INT)"
    )
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id, {key} AS k, {shard} AS shard
            FROM {table}
        )
        SELECT doc_id, shard,
               CAST(row_number() OVER (
                    PARTITION BY shard ORDER BY k, doc_id
               ) - 1 AS BIGINT) AS pos
        FROM base
    """


# ------------------------------------------------------------------
# Feature-hashing linear quality model (classifier-filter plumbing)
# ------------------------------------------------------------------


def hashed_bow_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "bow",
    weight_range: int = 1000,
) -> DataFrame:
    """Model-based quality scoring hook: a feature-hashed linear
    bag-of-words scorer (the fasttext-style classifier-filter shape —
    hash token -> weight, sum, threshold).  The stand-in "model" maps
    each token to a deterministic integer weight in
    ``[-weight_range, weight_range]`` derived from md5(seed:token); a
    real deployment swaps that for a broadcast learned-weights lookup
    (token/bucket -> weight) with the identical plan shape.

    INTEGER weights on purpose: the per-doc logit is an exact integer
    sum, so it is order-independent (float accumulation order differs
    between engines and even between runs) and the DuckDB twin hashes
    bit-equal.  ``score`` = logit / (n_tokens * weight_range) in
    [-1, 1]; the sigmoid/threshold belongs to the consumer.

    Scale shape: entirely row-local — one staged token attribute, one
    ``aggregate`` fold per row (whole-stage codegen, no shuffle, no
    UDF, no weights broadcast needed for the hash stand-in).
    """
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    )
    mod = 2 * weight_range + 1

    def wt(t: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), t)), 1, 8), 16, 10
        ).cast("long")
        return h % mod - weight_range

    logit = F.aggregate(
        F.transform(F.col("_t"), wt),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size("_t").cast("long")
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        logit.alias("bow_logit"),
        F.round(
            F.when(n > 0, logit / (n * float(weight_range))).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("bow_score"),
    )


def sql_hashed_bow_score(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "bow",
    weight_range: int = 1000,
) -> str:
    """DuckDB twin of ``hashed_bow_score``.  Uses unnest + an integer
    SUM (order-free, exact) instead of a list fold: DuckDB 1.0
    mis-evaluates lambdas whose input expression itself carries
    lambdas (see sql_soundex), so the token list is flattened OUTSIDE
    any lambda; empty docs rejoin with logit 0."""
    mod = 2 * weight_range + 1
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   {sql_tokens(f"coalesce({text_col}, '')")} AS t
            FROM {table}
        ),
        flat AS (
            SELECT doc_id, unnest(t) AS tok FROM base
        ),
        sums AS (
            SELECT doc_id,
                   SUM(CAST(('0x' || substr(md5('{seed}:' || tok), 1, 8))
                            ::UBIGINT % {mod} AS BIGINT) - {weight_range})
                       AS logit
            FROM flat GROUP BY doc_id
        )
        SELECT b.doc_id,
               CAST(len(b.t) AS BIGINT) AS n_tokens,
               CAST(coalesce(s.logit, 0) AS BIGINT) AS bow_logit,
               round(CASE WHEN len(b.t) > 0
                     THEN CAST(coalesce(s.logit, 0) AS DOUBLE)
                          / (len(b.t) * {float(weight_range)})
                     ELSE 0.0 END, 6) AS bow_score
        FROM base b LEFT JOIN sums s USING (doc_id)
    """


def bow_score_weighted(
    df: DataFrame,
    weights: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int | None = None,
) -> DataFrame:
    """LEARNED-weights quality scorer — the swap-in ``hashed_bow_score``
    promises: the hash stand-in's ``md5(token) -> weight`` is replaced
    by an explicit vocabulary lookup, with the IDENTICAL row-local
    plan shape (one projection, one integer fold; no shuffle, no join,
    no UDF — pinned by tests/test_corpus.py's no-Exchange assert).

    ``weights`` is a driver-side token->int map injected as a map
    literal; OOV tokens weigh 0.  A trained linear filter's vocab is
    bounded (fastText-style quality models carry ~10^5-10^6 token
    weights ≈ a few MB) so the literal — like any broadcast — ships
    once per executor; for vocabularies beyond literal-friendly size
    use ``bow_score_weighted_join`` (explode + broadcast hash join),
    which trades the row-local fold for one aggregation shuffle.

    ``score`` = logit / (n_tokens * scale) with ``scale`` defaulting
    to max |weight| — same normalization contract as
    ``hashed_bow_score``.
    """
    if not weights:
        raise ValueError("bow_score_weighted: empty weights map")
    scale = scale or max(abs(int(w)) for w in weights.values()) or 1
    ks = sorted(weights)
    wmap = F.map_from_arrays(
        F.array(*[F.lit(k) for k in ks]),
        F.array(*[F.lit(int(weights[k])).cast("long") for k in ks]),
    )
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    )
    logit = F.aggregate(
        F.transform(
            F.col("_t"),
            lambda t: F.coalesce(
                F.try_element_at(wmap, t), F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n = F.size("_t").cast("long")
    return base.select(
        "doc_id",
        n.alias("n_tokens"),
        logit.alias("bow_logit"),
        F.round(
            F.when(n > 0, logit / (n * float(scale))).otherwise(F.lit(0.0)),
            6,
        ).alias("bow_score"),
    )


def bow_score_weighted_join(
    df: DataFrame,
    weights_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1,
) -> DataFrame:
    """Large-vocab sibling of ``bow_score_weighted``: ``weights_df``
    (token string, weight long) is a TABLE, broadcast-joined against
    the exploded token attribute, then re-aggregated per doc.  One
    broadcast hash join + one groupBy shuffle; use when the vocabulary
    outgrows a map literal.  Equality to the map-literal form is
    pinned by tests/test_corpus.py."""
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    )
    flat = base.select(
        "doc_id", F.size("_t").cast("long").alias("n_tokens"),
        F.explode_outer("_t").alias("tok"),
    )
    joined = flat.join(
        F.broadcast(weights_df.select(F.col("token").alias("tok"), "weight")),
        "tok",
        "left",
    )
    sums = joined.groupBy("doc_id", "n_tokens").agg(
        F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("bow_logit")
    )
    n = F.col("n_tokens")
    return sums.select(
        "doc_id",
        "n_tokens",
        "bow_logit",
        F.round(
            F.when(n > 0, F.col("bow_logit") / (n * float(scale))).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("bow_score"),
    )


def sql_bow_score_weighted(
    table: str,
    weights: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int | None = None,
) -> str:
    """DuckDB twin of ``bow_score_weighted`` (unnest + CASE lookup +
    integer SUM — same no-lambda-nesting workaround as
    ``sql_hashed_bow_score``)."""
    scale = scale or max(abs(int(w)) for w in weights.values()) or 1
    def q(tok: str) -> str:  # SQL string literal, quotes doubled
        return "'" + tok.replace("'", "''") + "'"

    case = (
        "CASE tok "
        + " ".join(
            f"WHEN {q(k)} THEN {int(weights[k])}" for k in sorted(weights)
        )
        + " ELSE 0 END"
    )
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   {sql_tokens(f"coalesce({text_col}, '')")} AS t
            FROM {table}
        ),
        flat AS (
            SELECT doc_id, unnest(t) AS tok FROM base
        ),
        sums AS (
            SELECT doc_id, SUM(CAST({case} AS BIGINT)) AS logit
            FROM flat GROUP BY doc_id
        )
        SELECT b.doc_id,
               CAST(len(b.t) AS BIGINT) AS n_tokens,
               CAST(coalesce(s.logit, 0) AS BIGINT) AS bow_logit,
               round(CASE WHEN len(b.t) > 0
                     THEN CAST(coalesce(s.logit, 0) AS DOUBLE)
                          / (len(b.t) * {float(scale)})
                     ELSE 0.0 END, 6) AS bow_score
        FROM base b LEFT JOIN sums s USING (doc_id)
    """


# ------------------------------------------------------------------
# Deterministic stratified sampling
# ------------------------------------------------------------------


def _uniform_draw(id_col: Column, seed: str, hash_fn: str = "md5") -> Column:
    """Deterministic uniform draw in [0, 1): a 32-bit hash of
    ``seed:id`` over 2^32.  k/2^32 with k < 2^32 is an EXACT double in
    any IEEE engine, so Spark and DuckDB agree bit-for-bit (same trick
    as the minhash md5 draws, dedup.py).

    ``hash_fn``: ``"md5"`` (default) has the DuckDB twin —
    oracle-checked; ``"xxhash64"`` is the production knob (one JVM
    64-bit hash vs an md5 digest per row — same knob and rationale as
    ``minhash_signatures``), identically distributed but with no
    DuckDB twin."""
    if hash_fn == "xxhash64":
        return (
            F.pmod(F.xxhash64(F.lit(seed), id_col.cast("string")), F.lit(1 << 32))
            .cast("double")
            / F.lit(4294967296.0)
        )
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (md5|xxhash64)")
    h = F.md5(F.concat_ws(":", F.lit(seed), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def _sql_uniform_draw(id_expr: str, seed: str) -> str:
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({id_expr} AS VARCHAR)), 1, 8))"
        "::UBIGINT / 4294967296.0)"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.25,
    seed: str = "strat",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    hash draw (a pure function of ``seed`` and the id) falls under its
    stratum's rate.  Corpus-mixing ratios (e.g. up-sample low-resource
    languages) as one narrow filter: reproducible across runs, cluster
    sizes, and engines — no RNG state, no ``sample()``
    partition-dependence.

    Scale shape: a scan-level projection + filter (no shuffle, no
    driver state).  ``rates`` are literal-injected (a handful of
    strata is a CASE expression, not a join); an unbounded stratum
    domain would instead broadcast-join a rates table — same plan
    shape, one tiny build side.
    """
    rates = rates or {}
    rate: Column = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(float(r))).otherwise(rate)
    draw = _uniform_draw(F.col(id_col), seed, hash_fn)
    return (
        df.withColumn("_draw", draw)
        .where(F.col("_draw") < rate)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(strata_col).alias("stratum"),
            F.round(F.col("_draw"), 6).alias("draw"),
        )
    )


def sql_stratified_sample(
    table: str,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.25,
    seed: str = "strat",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``stratified_sample`` (same literal rates, same
    md5 draw)."""
    rates = rates or {}
    rate = str(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = (
            f"CASE WHEN {strata_col} = '{key}' THEN {float(r)} ELSE {rate} END"
        )
    draw = _sql_uniform_draw(id_col, seed)
    return f"""
        SELECT {id_col} AS doc_id, {strata_col} AS stratum,
               round({draw}, 6) AS draw
        FROM {table}
        WHERE {draw} < ({rate})
    """


def source_quota_sample(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    seed: str = "quota",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    salt: int = 16,
) -> DataFrame:
    """Deterministic per-group HARD CAP: keep at most ``cap`` docs per
    ``group_col`` — the crawl-pipeline "max N pages per host" rule
    (:func:`stratified_sample` scales every stratum by a RATE; a quota
    bounds the absolute contribution of any one source no matter how
    big it is, which is the anti-spam/anti-SEO lever).  Selection is
    the ``cap`` smallest ``(hash draw, id)`` per group — a pure
    function of ``seed`` and the id, so the kept set is reproducible
    across runs, cluster sizes, and engines.

    Scale shape (skew is the POINT here — one mega-host can be half
    the crawl): a single ``row_number`` window partitioned by source
    would funnel that host into one task.  Instead, two bounded
    passes: (1) rank within ``(group, salt_bucket)`` — bucket = a hash
    of the id, so every task sees ≤ |group|/salt rows — and keep each
    bucket's top-``cap``; any global top-``cap`` row is necessarily in
    its own bucket's top-``cap``, so pass 1 is lossless.  (2) rank the
    ≤ ``salt × cap`` survivors per group for the final cut.  Both
    passes order by ``(draw, doc_id)`` — a total order, so ranks are
    deterministic.

    Returns ``(doc_id, <group_col>, quota_rank)`` for kept rows,
    ``quota_rank`` = 1-based rank within the group's kept set.
    """
    from pyspark.sql.window import Window

    draw = _uniform_draw(F.col(id_col), seed, hash_fn)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col),
        draw.alias("_draw"),
        F.pmod(
            F.xxhash64(F.lit("qsalt"), F.col(id_col).cast("string")),
            F.lit(salt),
        ).alias("_b"),
    )
    w1 = Window.partitionBy(group_col, "_b").orderBy("_draw", "doc_id")
    survivors = base.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= cap
    )
    w2 = Window.partitionBy(group_col).orderBy("_draw", "doc_id")
    return (
        survivors.withColumn("quota_rank", F.row_number().over(w2))
        .where(F.col("quota_rank") <= cap)
        .select("doc_id", group_col, "quota_rank")
    )


def sql_source_quota_sample(
    table: str,
    group_col: str = "source",
    cap: int = 100,
    seed: str = "quota",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`source_quota_sample` (same md5 draw; one
    plain window — the oracle needn't be skew-safe)."""
    draw = _sql_uniform_draw(id_col, seed)
    return f"""
        SELECT doc_id, {group_col}, quota_rank
        FROM (
            SELECT {id_col} AS doc_id, {group_col},
                   CAST(row_number() OVER (
                       PARTITION BY {group_col}
                       ORDER BY {draw}, {id_col}
                   ) AS INT) AS quota_rank
            FROM {table}
        )
        WHERE quota_rank <= {cap}
    """


def mixture_stats(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.25,
    seed: str = "strat",
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-stratum mixing report for a ``stratified_sample`` config:
    input docs/tokens, sampled docs/tokens, and the realized rate —
    the evidence table a corpus-mixing decision is reviewed against
    (requested rates are targets; realized rates ARE the mixture).

    Scale shape: the sampled flag is the SAME deterministic draw
    predicate recomputed inline (pure function of seed+id), so there
    is no join against the sample output — one narrow projection and
    one groupBy on a low-cardinality stratum key (partial aggregation
    does almost all the work map-side)."""
    rates = rates or {}
    rate: Column = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(float(r))).otherwise(rate)
    picked = _uniform_draw(F.col(id_col), seed, hash_fn) < rate
    base = ensure_width(df).select(
        F.col(strata_col).alias("stratum"),
        token_count(F.col(text_col)).alias("_nt"),
        picked.cast("long").alias("_s"),
    )
    return base.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.sum("_s").cast("long").alias("sampled_docs"),
        F.sum(F.col("_s") * F.col("_nt")).cast("long").alias("sampled_tokens"),
        F.round(F.sum("_s") / F.count("*"), 6).alias("realized_rate"),
    )


def vocab_stats(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum vocabulary statistics: token/type counts, hapax
    count, type-token ratio, hapax ratio — the lexical-diversity
    signals (Zipf-tail health) that catch template-generated or
    dedup-starved strata: boilerplate floods collapse TTR, a healthy
    crawl keeps a fat hapax tail (~40-60% of types in natural text),
    machine-repeated text doesn't.

    Scale shape: one explode → (stratum, term) count groupBy (the
    classic word-count — partial aggregation does the heavy lifting
    map-side; (stratum, term) granularity leaves no hot key) → one
    per-stratum rollup of the term-frequency table, plus a doc count
    on the un-exploded frame joined back on the low-cardinality
    stratum key.  A stratum whose docs are all empty has no vocabulary
    row (inner join — consistent in both engines)."""
    from ..functions.text import tokens

    wide = ensure_width(df)
    terms = (
        wide.select(
            F.col(strata_col).alias("stratum"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("stratum", "term")
        .agg(F.count("*").alias("tf"))
    )
    # doc counts come off the raw frame — no tokenization on this branch
    docs = wide.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    agg = terms.groupBy("stratum").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum((F.col("tf") == 1).cast("long")).cast("long").alias("n_hapax"),
    )
    return agg.join(F.broadcast(docs), "stratum").select(
        "stratum",
        "n_docs",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(
            F.col("n_types").cast("double") / F.col("n_tokens"), 6
        ).alias("type_token_ratio"),
        F.round(
            F.col("n_hapax").cast("double") / F.col("n_types"), 6
        ).alias("hapax_ratio"),
    )


def sql_vocab_stats(
    table: str, strata_col: str = "lang", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`vocab_stats` (tokens materialized before
    the unnest — the nested-lambda trap)."""
    from ..functions.text import sql_tokens

    return f"""
        WITH _toks AS MATERIALIZED (
            SELECT {strata_col} AS stratum, {sql_tokens(text_col)} AS t
            FROM {table}
        ),
        terms AS (
            SELECT stratum, unnest(t) AS term FROM _toks
        ),
        tf AS (
            SELECT stratum, term, count(*) AS tf FROM terms GROUP BY 1, 2
        ),
        docs AS (
            SELECT stratum, CAST(count(*) AS BIGINT) AS n_docs
            FROM _toks GROUP BY 1
        ),
        agg AS (
            SELECT stratum,
                   CAST(sum(tf) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(coalesce(sum(CASE WHEN tf = 1 THEN 1 END), 0)
                        AS BIGINT) AS n_hapax
            FROM tf GROUP BY 1
        )
        SELECT stratum, n_docs, n_tokens, n_types, n_hapax,
               round(CAST(n_types AS DOUBLE) / n_tokens, 6)
                   AS type_token_ratio,
               round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_ratio
        FROM agg JOIN docs USING (stratum)
    """


def token_percentiles(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-stratum token-length distribution stats (exact linear-
    interpolation percentiles) — the length profile a shard budget or
    a max_tokens gate is tuned against.

    Scale shape: one groupBy on the low-cardinality stratum key.
    Exact percentiles buffer each group's values on one reducer — fine
    for per-language groups at any corpus size IF the group count is
    small and values are ints; swap ``F.percentile`` for
    ``F.percentile_approx`` at extreme group sizes (approximate,
    mergeable sketch — no buffering), losing the DuckDB hash twin."""
    base = ensure_width(df).select(
        F.col(strata_col).alias("stratum"),
        token_count(F.col(text_col)).alias("_nt"),
    )
    pct = F.percentile("_nt", F.lit(list(percentiles)))
    return base.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_docs"),
        *[
            F.round(F.try_element_at(pct, F.lit(i + 1)), 6).alias(
                f"p{int(p * 100)}"
            )
            for i, p in enumerate(percentiles)
        ],
    )


def sql_token_percentiles(
    table: str,
    strata_col: str = "lang",
    text_col: str = "text",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of ``token_percentiles`` (quantile_cont and Spark's
    percentile both linear-interpolate, per the SQL standard)."""
    cols = ",\n               ".join(
        f"round(quantile_cont(_nt, {p}), 6) AS p{int(p * 100)}"
        for p in percentiles
    )
    return f"""
        WITH base AS (
            SELECT {strata_col} AS stratum,
                   {sql_token_count(text_col)} AS _nt
            FROM {table}
        )
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n_docs,
               {cols}
        FROM base GROUP BY stratum
    """


def sql_mixture_stats(
    table: str,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.25,
    seed: str = "strat",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``mixture_stats``."""
    rates = rates or {}
    rate = str(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = (
            f"CASE WHEN {strata_col} = '{key}' THEN {float(r)} ELSE {rate} END"
        )
    draw = _sql_uniform_draw(id_col, seed)
    return f"""
        WITH base AS (
            SELECT {strata_col} AS stratum,
                   {sql_token_count(text_col)} AS _nt,
                   CASE WHEN {draw} < ({rate}) THEN 1 ELSE 0 END AS _s
            FROM {table}
        )
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(_nt) AS BIGINT) AS n_tokens,
               CAST(sum(_s) AS BIGINT) AS sampled_docs,
               CAST(sum(_s * _nt) AS BIGINT) AS sampled_tokens,
               round(CAST(sum(_s) AS DOUBLE) / count(*), 6) AS realized_rate
        FROM base GROUP BY stratum
    """


# ------------------------------------------------------------------
# Token-budget sharding
# ------------------------------------------------------------------


def token_budget_shards(
    df: DataFrame,
    budget: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign documents (whole, in stable ``id`` order) to output
    shards of ~``budget`` tokens: shard = floor(start_offset / budget)
    where start_offset is the exclusive running token total.  Training
    shards are token-budgeted, not row-counted — a shard list with a
    known token count per file is what a data-loader contract wants.

    Scale shape: the global running sum NEVER uses a single-partition
    window (the naive ``Window.orderBy(id)`` serializes the corpus
    through one task).  Same two-pass recipe as
    ``blocking.global_ranks``: one tiny seeded sample turns into
    LITERAL range bounds -> bucket assignment is a native expression;
    within-bucket running sums are a partitioned window; bucket
    offsets are a cumsum over the <= n_part-row census, broadcast
    back.  Correctness does not depend on the sample (ties can't
    split: buckets cut on the id itself); only balance does.
    """
    base = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    spark = df.sparkSession
    n_part = num_partitions or max(
        8, min(int(spark.conf.get("spark.sql.shuffle.partitions", "200")), 64)
    )
    n = base.count()
    n_part = max(1, min(n_part, n or 1))
    bounds: list = []
    if n_part > 1:
        frac = min(1.0, (n_part * 20.0) / max(n, 1))
        sample = sorted(
            r["doc_id"]
            for r in base.select("doc_id").sample(False, frac, seed=42).collect()
            if r["doc_id"] is not None
        )
        if sample:
            step = len(sample) / n_part
            bounds = sorted({sample[int(step * i)] for i in range(1, n_part)})
    if bounds:
        # when-sum chain, not a HOF fold — see blocking.global_ranks
        # (Catalyst internal error + codegen)
        bucket = sum(
            (
                F.when(F.col("doc_id") >= F.lit(b), F.lit(1)).otherwise(
                    F.lit(0)
                )
                for b in bounds
            ),
            F.lit(0),
        )
    else:
        bucket = F.lit(0)
    bucketed = base.withColumn("_bucket", bucket)
    census = bucketed.groupBy("_bucket").agg(F.sum("n_tokens").alias("_t"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = census.select(
        "_bucket",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).cast("long").alias("_off"),
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                + F.col("_off")
            ).alias("start_offset"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / budget).alias("shard_id"),
        )
    )


def sql_token_budget_shards(
    table: str,
    budget: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``token_budget_shards`` (one global window — the
    oracle runs at test scale, where that's fine)."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   {sql_token_count(text_col)} AS n_tokens
            FROM {table}
        )
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_offset,
               CAST(floor(coalesce(sum(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {budget}) AS BIGINT) AS shard_id
        FROM base
    """


# ------------------------------------------------------------------
# Benchmark decontamination (train/test overlap via winnowing)
# ------------------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per corpus document: how many of its winnowing fingerprints
    also occur anywhere in the benchmark set.  Winnowing guarantees a
    shared token run >= k+w-1 contributes a shared fingerprint, so
    ``n_shared >= min_shared`` is the standard n-gram-overlap
    contamination flag (the eval-leak check a training-data build runs
    before export), with ``contamination_ratio`` for threshold tuning.

    Scale shape: the benchmark fingerprint set is eval-suite sized —
    broadcast it (default) and the corpus side never shuffles for the
    membership mark; the only shuffle is the per-doc count groupBy.
    A boilerplate fingerprint shared by millions of corpus docs is NOT
    a skew hazard here (broadcast hash lookup, no join-key explosion).
    Set ``broadcast_benchmark=False`` for a benchmark too large to
    broadcast: same plan with a shuffled left join on fingerprint.
    """
    cfp = winnow_fingerprint_table(corpus, text_col, id_col, k, w)
    bfp = (
        winnow_fingerprint_table(benchmark, text_col, id_col, k, w)
        .select("fingerprint")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bfp = F.broadcast(bfp)
    marked = cfp.join(bfp, "fingerprint", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_fps"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_fps",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_fps"), 6).alias(
                "contamination_ratio"
            ),
            F.when(F.col("n_shared") >= min_shared, F.lit(1))
            .otherwise(F.lit(0))
            .alias("contaminated"),
        )
    )


def sql_decontaminate(
    table: str,
    benchmark_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
) -> str:
    """DuckDB twin of ``decontaminate`` where benchmark and corpus are
    predicate-split from ONE table (fingerprints are per-doc, so
    computing them before the split is equivalent)."""
    cte = sql_winnow_fingerprint_cte(table, text_col, id_col, k, w)
    return f"""
        WITH {cte},
        bench AS (
            SELECT DISTINCT fingerprint FROM fp
            WHERE {benchmark_pred}
        ),
        corpus AS (
            SELECT doc_id, fingerprint FROM fp
            WHERE NOT ({benchmark_pred})
        )
        SELECT c.doc_id,
               CAST(count(*) AS BIGINT) AS n_fps,
               CAST(count(b.fingerprint) AS BIGINT) AS n_shared,
               round(CAST(count(b.fingerprint) AS DOUBLE) / count(*), 6)
                   AS contamination_ratio,
               CAST(CASE WHEN count(b.fingerprint) >= {min_shared}
                    THEN 1 ELSE 0 END AS INT) AS contaminated
        FROM corpus c LEFT JOIN bench b USING (fingerprint)
        GROUP BY c.doc_id
    """


# ------------------------------------------------------------------
# Line-level exact dedup (CCNet / RefinedWeb-style boilerplate removal)
# ------------------------------------------------------------------


def line_dedup(
    docs: DataFrame,
    min_dup_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove lines duplicated across >= ``min_dup_docs`` DISTINCT
    documents and reassemble the text (CCNet's paragraph-hash dedup /
    RefinedWeb's line-level filtering: headers, nav bars, cookie
    banners and license boilerplate repeat VERBATIM across pages and
    survive document-level dedup because the surrounding text
    differs).

    Policy (documented, deterministic):
      * line key = ``md5(lower(trim(line)))`` — whitespace-trimmed,
        case-folded exact match (near-dup lines are the winnow/minhash
        families' job);
      * a key in >= ``min_dup_docs`` distinct docs is boilerplate and
        is removed from EVERY doc (CCNet removes all copies; the
        content lives nowhere else by construction);
      * blank lines are never census'd (trivially shared) and pass
        through, preserving paragraph structure;
      * within-doc repetition alone never trips the filter (that
        signal is ``repetition_signals``) — the census counts
        DISTINCT docs.

    Output: one row per input doc — ``doc_id``, rebuilt ``text``,
    ``n_lines``, ``n_removed``.

    Scale shape: one explode (narrow Generate) -> one groupBy on the
    line key (the census; map-side partial agg) -> one shuffle join
    back (boilerplate set is corpus-sized in the worst case, so a
    broadcast is NOT assumed) -> one groupBy(doc_id) reassembly.  No
    UDFs, no driver materialization; every stage partitions on its
    key.  The 100TB deployment persists the census as a reusable
    boilerplate table exactly like the dedup families' indexes.
    """
    if min_dup_docs < 2:
        raise ValueError("line_dedup: min_dup_docs must be >= 2")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n").alias("ls"),
    )
    lines = base.select(
        "doc_id", F.posexplode("ls").alias("pos", "line")
    ).withColumn("k", F.md5(F.lower(F.trim("line")))).withColumn(
        "nonblank", F.trim("line") != ""
    )
    boiler = (
        lines.where("nonblank")
        .groupBy("k")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_dup_docs)
        .select("k")
    )
    # ONE join + ONE groupBy: `lines` (the expensive per-line explode +
    # md5 projection) is referenced by the census and by the marked
    # join only — collect_list skips the NULL structs of removed lines,
    # so totals, kept text, and removed counts all come out of the same
    # aggregation instead of three passes over the exploded plan.
    marked = lines.join(
        boiler.withColumn("boiler", F.lit(True)), "k", "left"
    ).withColumn(
        "keep",
        ~(F.col("nonblank") & F.coalesce(F.col("boiler"), F.lit(False))),
    )
    return marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum((~F.col("keep")).cast("long")).cast("long").alias("n_removed"),
    ).select("doc_id", "text", "n_lines", "n_removed")


def sql_line_dedup(
    table: str,
    min_dup_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    pre_cte: str | None = None,
) -> str:
    """DuckDB twin of :func:`line_dedup` (string_split('') == [''] in
    both engines, so an empty doc is one blank line in both).
    ``pre_cte`` prepends extra CTEs (e.g. a derived multi-line corpus)
    that ``table`` may reference."""
    pre = f"{pre_cte}," if pre_cte else ""
    return f"""
        WITH {pre}
        base AS (
            SELECT {id_col} AS doc_id,
                   string_split(coalesce({text_col}, ''), chr(10)) AS ls
            FROM {table}
        ),
        pe AS (
            SELECT doc_id, ls,
                   unnest(range(1, len(ls) + 1)) AS pos
            FROM base
        ),
        lx AS (
            SELECT doc_id, pos, ls[pos] AS line,
                   md5(lower(trim(ls[pos]))) AS k,
                   trim(ls[pos]) <> '' AS nonblank
            FROM pe
        ),
        boiler AS (
            SELECT k FROM lx WHERE nonblank
            GROUP BY k HAVING count(DISTINCT doc_id) >= {min_dup_docs}
        ),
        kept AS (
            SELECT doc_id, pos, line FROM lx
            WHERE NOT (nonblank AND k IN (SELECT k FROM boiler))
        ),
        agg AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY pos) AS text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        ),
        tot AS (
            SELECT doc_id, count(*) AS n_lines FROM lx GROUP BY doc_id
        )
        SELECT t.doc_id,
               coalesce(a.text, '') AS text,
               CAST(t.n_lines AS BIGINT) AS n_lines,
               CAST(t.n_lines - coalesce(a.n_kept, 0) AS BIGINT)
                   AS n_removed
        FROM tot t LEFT JOIN agg a USING (doc_id)
    """


# ------------------------------------------------------------------
# Bloom-pre-filtered decontamination (compact-membership pre-filter)
# ------------------------------------------------------------------


def _bloom_pos(fp: Column, i: int, m_bits: int) -> Column:
    """i-th Bloom bit position of a fingerprint: 32-bit md5 slice of
    ``i:fp`` mod m (same md5-mod trick as ``_uniform_draw`` — exact in
    DuckDB)."""
    h = F.md5(F.concat(F.lit(f"{i}:"), fp.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(m_bits)
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    n_hashes: int = 3,
    m_bits: int = 16384,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom-filter PRE-filter — the
    at-scale form of the eval-leak check: the benchmark fingerprint
    set folds into <= ``m_bits`` bit positions (a structure of fixed,
    corpus-independent size), every corpus fingerprint probes its
    ``n_hashes`` positions, and only the fingerprints that pass ALL
    probes reach the exact membership join.  At 10^12 docs that is
    the difference between joining EVERY corpus fingerprint against
    the benchmark set and joining ~the contaminated sliver plus a
    measured false-positive margin.

    Bloom filters have NO false negatives — a genuinely shared
    fingerprint always passes — so ``contaminated`` here equals
    :func:`decontaminate`'s flag exactly (pytest-pinned).  The
    false-positive cost is OBSERVABLE in the output: ``n_bloom_fp``
    (bloom-passing but not actually shared) per document; size
    ``m_bits``/``n_hashes`` against it.

    Counts are DISTINCT-fingerprint counts (the pre-filter operates on
    the distinct fingerprint set), unlike ``decontaminate``'s raw
    row counts — the contamination FLAG is unaffected (winnow rows are
    near-distinct per doc) and the pytest pins flag equality.

    Scale shape: the position table is broadcast (bounded by m_bits
    rows); the probe explode is x``n_hashes`` on the corpus
    fingerprint table followed by one groupBy back — in production the
    positions compile into an m-bit bitmap broadcast variable probed
    row-locally with no explode/regroup; the DataFrame form here keeps
    the exact DuckDB twin while exercising the same pre-filter plan.
    """
    cfp = (
        winnow_fingerprint_table(corpus, text_col, id_col, k, w)
        .select("doc_id", "fingerprint")
        .distinct()
    )
    bfp = (
        winnow_fingerprint_table(benchmark, text_col, id_col, k, w)
        .select("fingerprint")
        .distinct()
    )
    fp = F.col("fingerprint")
    positions = lambda: F.array(  # noqa: E731
        *[_bloom_pos(fp, i, m_bits) for i in range(n_hashes)]
    )
    bloom = (
        bfp.select(F.explode(positions()).alias("pos"))
        .distinct()
        .withColumn("_h", F.lit(1))
    )
    probes = cfp.select(
        "doc_id", "fingerprint", F.explode(positions()).alias("pos")
    )
    # one row back per (doc_id, fingerprint) — `cfp` (the winnowing
    # chain, the dominant cost at corpus scale) is referenced by this
    # path ONLY, so totals/pass/shared all come from one aggregation
    # instead of re-deriving the fingerprint table per output column
    hits = (
        probes.join(F.broadcast(bloom), "pos", "left")
        .groupBy("doc_id", "fingerprint")
        .agg(
            (F.coalesce(F.sum("_h"), F.lit(0)) == n_hashes).alias("_pass")
        )
    )
    flagged = hits.join(
        F.broadcast(bfp.withColumn("_e", F.lit(1))), "fingerprint", "left"
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fps"),
        F.sum(F.col("_pass").cast("long")).cast("long").alias("n_bloom_pass"),
        F.sum((F.col("_pass") & F.col("_e").isNotNull()).cast("long"))
        .cast("long")
        .alias("n_shared"),
    )
    return agg.select(
        "doc_id",
        "n_fps",
        "n_bloom_pass",
        "n_shared",
        (F.col("n_bloom_pass") - F.col("n_shared"))
        .cast("long")
        .alias("n_bloom_fp"),
        F.when(F.col("n_shared") >= min_shared, F.lit(1))
        .otherwise(F.lit(0))
        .alias("contaminated"),
    )


def sql_bloom_decontaminate(
    table: str,
    benchmark_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    n_hashes: int = 3,
    m_bits: int = 16384,
) -> str:
    """DuckDB twin of :func:`bloom_decontaminate` (predicate-split
    benchmark, same convention as ``sql_decontaminate``)."""
    cte = sql_winnow_fingerprint_cte(table, text_col, id_col, k, w)

    def pos(i: int) -> str:
        return (
            f"(('0x' || substr(md5('{i}:' || "
            f"CAST(fingerprint AS VARCHAR)), 1, 8))::UBIGINT % {m_bits})"
        )

    plist = "[" + ", ".join(pos(i) for i in range(n_hashes)) + "]"
    return f"""
        WITH {cte},
        bench AS (
            SELECT DISTINCT fingerprint FROM fp WHERE {benchmark_pred}
        ),
        corpus AS (
            SELECT DISTINCT doc_id, fingerprint FROM fp
            WHERE NOT ({benchmark_pred})
        ),
        bloom AS (
            SELECT DISTINCT pos FROM (
                SELECT unnest({plist}) AS pos FROM bench
            )
        ),
        probe AS (
            SELECT doc_id, fingerprint, unnest({plist}) AS pos FROM corpus
        ),
        hits AS (
            SELECT p.doc_id, p.fingerprint, count(b.pos) AS nh
            FROM probe p LEFT JOIN bloom b USING (pos)
            GROUP BY p.doc_id, p.fingerprint
        ),
        pass AS (
            SELECT doc_id, fingerprint FROM hits WHERE nh = {n_hashes}
        ),
        ex AS (
            SELECT p.doc_id,
                   count(*) AS n_bloom_pass,
                   count(b.fingerprint) AS n_shared
            FROM pass p LEFT JOIN bench b USING (fingerprint)
            GROUP BY p.doc_id
        ),
        tot AS (
            SELECT doc_id, count(*) AS n_fps FROM corpus GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_fps AS BIGINT) AS n_fps,
               CAST(coalesce(e.n_bloom_pass, 0) AS BIGINT) AS n_bloom_pass,
               CAST(coalesce(e.n_shared, 0) AS BIGINT) AS n_shared,
               CAST(coalesce(e.n_bloom_pass, 0) - coalesce(e.n_shared, 0)
                    AS BIGINT) AS n_bloom_fp,
               CAST(CASE WHEN coalesce(e.n_shared, 0) >= {min_shared}
                    THEN 1 ELSE 0 END AS INT) AS contaminated
        FROM tot t LEFT JOIN ex e USING (doc_id)
    """


def leakage_safe_split(
    docs: DataFrame,
    keep_list: DataFrame,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.90),
        ("valid", 0.05),
        ("test", 0.05),
    ),
    seed: str = "split",
    id_col: str = "doc_id",
    group_col: str = "canonical_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Entity-aware train/valid/test split: the assignment draw is a
    pure function of the near-dup CLUSTER id (the keep-list's
    ``canonical_id``), so every member of a cluster lands in the same
    split — near-duplicates can never straddle train and test, the
    eval-contamination failure mode a doc-level random split is blind
    to (the same reason decontamination exists; this closes the
    intra-corpus leak the benchmark check can't see).

    Input: ``docs`` (one row per doc) and a keep list
    ``(doc_id, canonical_id, ...)`` from
    :func:`~record_linkage_ldu_spark.operators.dedup.near_duplicate_keep_list`
    or :func:`keep_list_from_pairs`.  ``splits`` are (name, fraction)
    in declaration order; fractions must sum to 1.  Output: one row
    per doc — ``(doc_id, cluster_id, split, draw)``.

    Scale shape: one doc_id equi-join against the (doc-cardinality)
    keep list, then a scan-level hash projection — no extra shuffle
    beyond the join, no RNG state, reproducible across runs, engines,
    and cluster sizes (same k/2^32 draw as :func:`stratified_sample`).
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    # LEFT join + identity fallback: a doc absent from the keep list
    # (caller passed a partial mapping) must still land in a split —
    # silently dropping corpus rows is the one failure mode a split
    # op can't have.  Keep lists from near_duplicate_keep_list /
    # keep_list_from_pairs cover every doc, so the fallback is a
    # no-op on the standard path (and on every oracle-checked hash).
    joined = (
        docs.select(id_col)
        .join(keep_list.select(id_col, group_col), id_col, "left")
        .withColumn(group_col, F.coalesce(F.col(group_col), F.col(id_col)))
    )
    draw = _uniform_draw(F.col(group_col), seed, hash_fn)
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cond = draw < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        expr.otherwise(splits[-1][0])
        if expr is not None
        else F.lit(splits[-1][0])
    )
    return joined.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("cluster_id"),
        expr.alias("split"),
        F.round(draw, 6).alias("draw"),
    )


def sql_leakage_safe_split(
    canon_cte: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.90),
        ("valid", 0.05),
        ("test", 0.05),
    ),
    seed: str = "split",
) -> str:
    """DuckDB twin of :func:`leakage_safe_split`: ``canon_cte`` must
    expose ``(doc_id, canonical_id)``; cumulative cutoffs are the SAME
    Python-accumulated floats the Spark side compares against (repr-
    injected), so boundary draws agree bit-for-bit."""
    draw = _sql_uniform_draw("canonical_id", seed)
    case = "CASE"
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        case += f" WHEN {draw} < {cum!r} THEN '{name}'"
    case += f" ELSE '{splits[-1][0]}' END"
    return f"""
        SELECT doc_id, canonical_id AS cluster_id,
               {case} AS split,
               round({draw}, 6) AS draw
        FROM {canon_cte}
    """


def snapshot_diff(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset-version diff: what changed between two corpus
    snapshots — the audit table behind every retrain decision
    ("crawl v2 swapped 3% of the corpus — which 3%?").  One row per
    doc that is ``added`` (only in new), ``removed`` (only in old), or
    ``changed`` (same id, different content fingerprint); unchanged
    docs — the bulk — are filtered out before anything materializes.

    Output: ``(doc_id, status, old_fp, new_fp)`` with md5 content
    fingerprints for triage (NULL on the missing side).

    Scale shape: two scan-level fingerprint projections + ONE
    full-outer equi-join on the id + a filter.  No text leaves the
    scan — only 32-byte fingerprints shuffle.
    """
    # presence is keyed on explicit side flags, NOT fingerprint
    # nullity: md5(NULL text) is NULL, and conflating that with a
    # missing row misclassifies NULL-text docs as added/removed
    o = old_docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col).cast("binary")).alias("old_fp"),
        F.lit(1).alias("_in_old"),
    )
    n = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col).cast("binary")).alias("new_fp"),
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, "doc_id", "full")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), "changed")
    )
    return j.select(
        "doc_id", status.alias("status"), "old_fp", "new_fp"
    ).where(F.col("status").isNotNull())


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Corpus-trained unigram language-model quality score: each
    document's mean token log-probability under the corpus's own
    add-k-smoothed unigram distribution (perplexity = exp(-mean)).
    The heuristic quality_score flags malformed text; this flags
    *unusual* text — OCR shred, wrong-language islands, and boiler-
    plate floods sit at opposite perplexity tails, which makes it the
    standard second-stage corpus-quality filter (CCNet-style, with the
    corpus itself as the LM when no external KenLM exists).

    Scale shape: one explode -> (term) count groupBy trains the model
    (word-count, map-side partials); the two model scalars (N tokens,
    V types) reduce to one row and broadcast; scoring re-joins tokens
    to the term table on ``term`` — a shuffle join whose build side is
    the vocabulary (zipf-bounded, far smaller than the corpus; swap in
    ``F.broadcast`` when V fits the driver).  Docs with no tokens are
    excluded (no distribution to score under — inner-join semantics
    in both engines).

    Output: (doc_id, n_tokens, avg_logprob, perplexity).
    """
    from ..functions.text import tokens

    toks = ensure_width(df).select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    scalars = tf.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("v_types"),
    )
    model = tf.crossJoin(F.broadcast(scalars)).select(
        "term",
        F.log(
            (F.col("c") + F.lit(float(k)))
            / (F.col("n_total") + F.lit(float(k)) * F.col("v_types"))
        ).alias("logp"),
    )
    return (
        toks.join(model, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg("logp").alias("_avg"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round("_avg", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 4).alias("perplexity"),
        )
    )


def sql_unigram_lm_scores(
    table: str, text_col: str = "text", k: float = 1.0
) -> str:
    """DuckDB twin of :func:`unigram_lm_scores`.  ``toks`` and ``tf``
    are read twice -> MATERIALIZED (DuckDB 1.0 inlines plain CTEs per
    reference, re-running the tokenizer)."""
    from ..functions.text import sql_tokens

    kf = float(k)
    return f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, unnest({sql_tokens(text_col)}) AS term
            FROM {table}
        ),
        tf AS MATERIALIZED (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1
        ),
        scalars AS (
            SELECT CAST(sum(c) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS v_types
            FROM tf
        ),
        model AS (
            SELECT term,
                   ln((c + {kf}) / (n_total + {kf} * v_types)) AS logp
            FROM tf CROSS JOIN scalars
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(logp), 6) AS avg_logprob,
               round(exp(-avg(logp)), 4) AS perplexity
        FROM toks JOIN model USING (term)
        GROUP BY 1
    """


def bm25_search(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval over the corpus (Robertson/Sparck Jones;
    the Lucene +1 idf variant, so idf stays positive even for terms in
    more than half the corpus).  The corpus-side complement of the
    embedding ANN family: sparse lexical search, the first-stage
    retriever in every dedup-then-rank and eval-contamination audit
    that starts from a phrase rather than a vector.

    Scale shape: docs are pre-pruned with ``arrays_overlap`` against
    the literal query-term array — a scan-level narrow filter, so only
    hitting docs are exploded.  Per-term document frequencies come off
    the pruned explode (a query-term-bounded groupBy); the three
    corpus scalars (N, avgdl via sum of lengths) come from a
    tokenize-light full pass (one projection + one agg — no shuffle of
    document text).  Scoring joins term hits to the tiny df table
    (broadcast) and sums per doc.  Nothing quadratic anywhere; the
    expensive path is bounded by the number of HITTING docs, not the
    corpus.

    Output: (doc_id, n_hit_terms, score) for every doc matching >= 1
    query term.
    """
    from ..functions.text import tokens

    terms = tuple(dict.fromkeys(t.lower() for t in query_terms))
    qarr = F.array(*[F.lit(t) for t in terms])
    wide = ensure_width(df).select(
        "doc_id", tokens(F.col(text_col)).alias("_toks")
    )
    # corpus scalars off the token-count projection (no text shuffle)
    scalars = wide.select(F.size("_toks").alias("dl")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = (
        wide.where(F.arrays_overlap(F.col("_toks"), qarr))
        .select(
            "doc_id",
            F.size("_toks").alias("dl"),
            F.explode(
                F.filter(F.col("_toks"), lambda t: F.array_contains(qarr, t))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * (F.lit(float(k1)) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - float(b))
                        + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("w"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_hit_terms"),
        F.round(F.sum("w"), 6).alias("score"),
    )


def sql_bm25_search(
    table: str,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_search` — token arrays materialized
    once (``wide`` feeds scalars AND hits; DuckDB 1.0 inlines plain
    CTEs per reference, re-running the tokenizer)."""
    from ..functions.text import sql_tokens

    terms = tuple(dict.fromkeys(t.lower() for t in query_terms))
    qlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH wide AS MATERIALIZED (
            SELECT doc_id, {sql_tokens(text_col)} AS _toks
            FROM {table}
        ),
        scalars AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   avg(len(_toks)) AS avgdl
            FROM wide
        ),
        hits AS MATERIALIZED (
            SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id, len(_toks) AS dl, unnest(_toks) AS term
                FROM wide
            )
            WHERE term IN ({qlist})
            GROUP BY 1, 2, 3
        ),
        dfreq AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM hits GROUP BY 1
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_hit_terms,
               round(sum(
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * ({float(k1)} + 1.0))
                   / (tf + {float(k1)}
                      * (1.0 - {float(b)} + {float(b)} * dl / avgdl))
               ), 6) AS score
        FROM hits
        JOIN dfreq USING (term)
        CROSS JOIN scalars
        GROUP BY 1
    """


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    strata_col: str | None = None,
    seed: str = "aes",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws key = ln(u)/w from a hash-derived
    uniform u in (0, 1]; the n LARGEST keys are exactly a weight-
    proportional sample.  The weighted complement of
    ``stratified_sample`` — quality-weighted corpus subsampling
    (sample 1M docs proportional to a quality score) with no RNG
    state: reruns, cluster sizes, and engines all select the same
    rows.  Rows with NULL or non-positive weight are excluded (they
    have no sampling mass).

    Scale shape: one narrow projection computes the key, then global
    top-n compiles to ``TakeOrderedAndProject`` (per-partition heaps +
    one driver merge — no full sort, no single-partition window);
    with ``strata_col`` it is a per-stratum rank window instead (one
    shuffle on the stratum key).  Ties are impossible up to hash
    collisions; ``id_col`` breaks even those deterministically.

    Output: (stratum?, doc_id, weight, rank) with rank 1..n in
    descending-key (most-sampled-first) order.
    """
    # (k+1)/2^32 in (0, 1]: ln(0) is the only hazard of the [0,1) draw
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        4294967296.0
    )
    w = F.col(weight_col).cast("double")
    keyed = (
        df.where(w.isNotNull() & (w > 0))
        .select(
            *([F.col(strata_col).alias("stratum")] if strata_col else []),
            F.col(id_col).alias("doc_id"),
            F.round(w, 6).alias("weight"),
            (F.log(u) / w).alias("_key"),
        )
    )
    if strata_col is None:
        ranked = keyed.orderBy(
            F.col("_key").desc(), F.col("doc_id")
        ).limit(int(n))
        win = Window.orderBy(F.col("_key").desc(), F.col("doc_id"))
        return ranked.select(
            "doc_id",
            "weight",
            F.row_number().over(win).cast("long").alias("rank"),
        )
    win = Window.partitionBy("stratum").orderBy(
        F.col("_key").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rank", F.row_number().over(win).cast("long"))
        .where(F.col("rank") <= int(n))
        .select("stratum", "doc_id", "weight", "rank")
    )


def sql_weighted_sample(
    table: str,
    weight_col: str,
    n: int,
    strata_col: str | None = None,
    seed: str = "aes",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (same (k+1)/2^32 draw —
    exact doubles both engines; ln/divide are single IEEE ops, and the
    output carries only ranks, so sub-ulp libm differences cannot
    surface unless they invert two keys, which are ~1/k^2 apart)."""
    u = (
        f"((('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        "::UBIGINT + 1.0) / 4294967296.0)"
    )
    key = f"(ln({u}) / CAST({weight_col} AS DOUBLE))"
    guard = (
        f"{weight_col} IS NOT NULL AND CAST({weight_col} AS DOUBLE) > 0"
    )
    if strata_col is None:
        return f"""
            SELECT {id_col} AS doc_id,
                   round(CAST({weight_col} AS DOUBLE), 6) AS weight,
                   CAST(row_number() OVER (
                       ORDER BY {key} DESC, {id_col}
                   ) AS BIGINT) AS rank
            FROM {table}
            WHERE {guard}
            ORDER BY {key} DESC, {id_col}
            LIMIT {int(n)}
        """
    return f"""
        SELECT stratum, doc_id, weight, rank FROM (
            SELECT {strata_col} AS stratum, {id_col} AS doc_id,
                   round(CAST({weight_col} AS DOUBLE), 6) AS weight,
                   CAST(row_number() OVER (
                       PARTITION BY {strata_col}
                       ORDER BY {key} DESC, {id_col}
                   ) AS BIGINT) AS rank
            FROM {table}
            WHERE {guard}
        )
        WHERE rank <= {int(n)}
    """


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Bigram conditional language-model score: mean ln p(w_i | w_{i-1})
    over each document's bigrams, add-k smoothed against the corpus's
    own counts (perplexity = exp(-mean)).  The order-sensitive
    complement of :func:`unigram_lm_scores`: shuffled-word salad keeps
    its unigram perplexity but collapses here, which is exactly the
    failure mode (scrambled scrapes, columnized OCR) the unigram
    filter cannot see.  p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k*V).

    Scale shape: two word-count groupBys train the model (bigram and
    prefix-unigram counts — map-side partials, no hot key); scoring
    explodes each doc's bigram multiset once and joins it to the
    bigram model table on the bigram key (build side zipf-bounded).
    Docs with < 2 tokens have no bigram to score — excluded, same as
    both engines' inner join.

    Output: (doc_id, n_bigrams, avg_logprob, perplexity).
    """
    from ..functions.text import ngrams_of_tokens, tokens

    wide = ensure_width(df).select(
        "doc_id", tokens(F.col(text_col)).alias("_toks")
    )
    uni = wide.select(F.explode("_toks").alias("term"))
    c1 = uni.groupBy("term").agg(F.count("*").cast("long").alias("c1"))
    scalars = c1.agg(F.count("*").cast("long").alias("v_types"))
    bg = wide.select(
        "doc_id",
        F.explode(ngrams_of_tokens(F.col("_toks"), 2)).alias("bg"),
    )
    c2 = bg.groupBy("bg").agg(F.count("*").cast("long").alias("c2"))
    kf = float(k)
    model = (
        c2.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(c1, F.col("w1") == F.col("term"))
        .crossJoin(F.broadcast(scalars))
        .select(
            "bg",
            F.log(
                (F.col("c2") + F.lit(kf))
                / (F.col("c1") + F.lit(kf) * F.col("v_types"))
            ).alias("logp"),
        )
    )
    return (
        bg.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("logp").alias("_avg"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("_avg", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("_avg")), 4).alias("perplexity"),
        )
    )


def sql_bigram_lm_scores(
    table: str, text_col: str = "text", k: float = 1.0
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` — toks/bigram/count
    CTEs MATERIALIZED (each is read twice; DuckDB 1.0 inlines plain
    CTEs per reference)."""
    from ..functions.text import sql_ngrams, sql_tokens

    kf = float(k)
    return f"""
        WITH wide AS MATERIALIZED (
            SELECT doc_id, {sql_tokens(text_col)} AS _toks
            FROM {table}
        ),
        c1 AS MATERIALIZED (
            SELECT term, CAST(count(*) AS BIGINT) AS c1
            FROM (SELECT unnest(_toks) AS term FROM wide)
            GROUP BY 1
        ),
        scalars AS (
            SELECT CAST(count(*) AS BIGINT) AS v_types FROM c1
        ),
        bg AS MATERIALIZED (
            SELECT doc_id, unnest({sql_ngrams('_toks', 2)}) AS bg
            FROM wide
        ),
        c2 AS (
            SELECT bg, CAST(count(*) AS BIGINT) AS c2
            FROM bg GROUP BY 1
        ),
        model AS (
            SELECT c2.bg,
                   ln((c2.c2 + {kf}) / (c1.c1 + {kf} * v_types)) AS logp
            FROM c2
            JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.term
            CROSS JOIN scalars
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(logp), 6) AS avg_logprob,
               round(exp(-avg(logp)), 4) AS perplexity
        FROM bg JOIN model USING (bg)
        GROUP BY 1
    """


def lang_confusion(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Language-ID confusion matrix: the heuristic classifier's
    predictions against the corpus's own language labels — the
    accuracy audit that must exist before ``lang_id`` gates a cleaning
    pipeline (a systematically confused language pair silently drains
    a stratum).  One projection + one (label, pred) groupBy + a
    broadcast per-label total; rate = row-normalized recall.

    Output: (lang, lang_pred, n, rate) — one row per observed
    (label, prediction) cell.
    """
    from ..functions.text import lang_id

    pred = ensure_width(df).select(
        F.col(label_col).alias("lang"),
        lang_id(F.col(text_col)).alias("lang_pred"),
    )
    cells = pred.groupBy("lang", "lang_pred").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = cells.groupBy("lang").agg(F.sum("n").alias("_tot"))
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "lang_pred",
        "n",
        F.round(F.col("n") / F.col("_tot"), 6).alias("rate"),
    )


def sql_lang_confusion(
    table: str, label_col: str = "lang", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`lang_confusion`."""
    from ..functions.text import sql_lang_id

    return f"""
        WITH cells AS MATERIALIZED (
            SELECT {label_col} AS lang,
                   {sql_lang_id(text_col)} AS lang_pred,
                   CAST(count(*) AS BIGINT) AS n
            FROM {table}
            GROUP BY 1, 2
        )
        SELECT lang, lang_pred, n,
               round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang), 6)
                   AS rate
        FROM cells
    """


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Collocation mining: the corpus's top-k adjacent-token pairs by
    pointwise mutual information, PMI = ln(p(w1 w2) / (p(w1) p(w2))).
    The phrase-discovery pass a tokenizer/vocabulary build runs before
    merging multiword units ("new york" behaves as one token) — and a
    template detector: a boilerplate flood shows up as a block of
    near-identical extreme-PMI pairs.  ``min_count`` guards the PMI
    low-frequency pathology (a pair seen once between two hapaxes
    maxes the score).

    Scale shape: the same two word-count groupBys as the bigram LM;
    the pair table joins its two unigram marginals (zipf-bounded build
    sides) and the global top-k compiles to TakeOrderedAndProject.
    Ties break on the pair string, so the cut is deterministic.

    Output: (pair, n, pmi) — top_k rows, highest PMI first.
    """
    from ..functions.text import ngrams_of_tokens, tokens

    wide = ensure_width(df).select(tokens(F.col(text_col)).alias("_toks"))
    uni = wide.select(F.explode("_toks").alias("term"))
    c1 = uni.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    n1 = c1.agg(
        F.sum("c").cast("long").alias("n_uni"),
    )
    bg = wide.select(
        F.explode(ngrams_of_tokens(F.col("_toks"), 2)).alias("bg")
    )
    c2 = bg.groupBy("bg").agg(F.count("*").cast("long").alias("n"))
    n2 = c2.agg(F.sum("n").cast("long").alias("n_bg"))
    w1 = F.split(F.col("bg"), " ")[0]
    w2 = F.split(F.col("bg"), " ")[1]
    scored = (
        c2.where(F.col("n") >= int(min_count))
        .withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(c1.select(F.col("term").alias("w1"), F.col("c").alias("c_1")), "w1")
        .join(c1.select(F.col("term").alias("w2"), F.col("c").alias("c_2")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "bg",
            "n",
            F.round(
                F.log(
                    (F.col("n") / F.col("n_bg"))
                    / ((F.col("c_1") / F.col("n_uni"))
                       * (F.col("c_2") / F.col("n_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), F.col("bg"))
        .limit(int(top_k))
        .select(F.col("bg").alias("pair"), "n", "pmi")
    )


def sql_pmi_collocations(
    table: str,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> str:
    """DuckDB twin of :func:`pmi_collocations`."""
    from ..functions.text import sql_ngrams, sql_tokens

    return f"""
        WITH wide AS MATERIALIZED (
            SELECT {sql_tokens(text_col)} AS _toks FROM {table}
        ),
        c1 AS MATERIALIZED (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(_toks) AS term FROM wide)
            GROUP BY 1
        ),
        n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM c1),
        c2 AS MATERIALIZED (
            SELECT bg, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest({sql_ngrams('_toks', 2)}) AS bg FROM wide)
            GROUP BY 1
        ),
        n2 AS (SELECT CAST(sum(n) AS BIGINT) AS n_bg FROM c2)
        SELECT bg AS pair, n,
               round(ln((CAST(n AS DOUBLE) / n_bg)
                        / ((CAST(a.c AS DOUBLE) / n_uni)
                           * (CAST(b.c AS DOUBLE) / n_uni))), 6) AS pmi
        FROM c2
        JOIN c1 a ON string_split(bg, ' ')[1] = a.term
        JOIN c1 b ON string_split(bg, ' ')[2] = b.term
        CROSS JOIN n1 CROSS JOIN n2
        WHERE n >= {int(min_count)}
        ORDER BY pmi DESC, bg
        LIMIT {int(top_k)}
    """


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    per_doc: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: the ``per_doc`` highest
    tf·idf terms of each document (idf = ln(N/df), document
    frequency over distinct appearance).  The per-doc profile
    complement of :func:`bm25_search`'s query-side scoring — feeds
    dedup explainability ("these two docs share their top terms") and
    cheap topic labels for corpus mixture reports.

    Scale shape: one explode → (doc, term) tf groupBy; df is a second
    groupBy over the distinct (doc, term) table; scoring joins tf to
    the zipf-bounded df table; rank is one window per doc with a
    deterministic (weight desc, term) tiebreak.

    Output: (doc_id, term, tf, weight, pos) — pos 1..per_doc.
    """
    from ..functions.text import tokens

    wide = ensure_width(df)
    tf = (
        wide
        .select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    # lazy broadcast scalar (no eager driver action at build time);
    # count_distinct skips NULL doc_ids exactly like the twin's
    # count(DISTINCT doc_id)
    nd = wide.agg(
        F.count_distinct(F.col("doc_id")).cast("double").alias("n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("weight"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= int(per_doc))
    )


def sql_tfidf_keywords(
    table: str,
    text_col: str = "text",
    per_doc: int = 3,
) -> str:
    """DuckDB twin of :func:`tfidf_keywords` (same ln(N/df), same
    deterministic tiebreak)."""
    from ..functions.text import sql_tokens

    return f"""
        WITH tf AS MATERIALIZED (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest({sql_tokens(text_col)}) AS term
                  FROM {table})
            GROUP BY 1, 2
        ),
        dfreq AS MATERIALIZED (
            SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY 1
        ),
        nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
               FROM {table})
        SELECT doc_id, term, tf, weight, pos FROM (
            SELECT doc_id, term, tf,
                   round(tf * ln(n / df), 6) AS weight,
                   -- rank by the ROUNDED weight (the Spark window
                   -- orders the rounded column): sub-ulp libm drift
                   -- must not beat the term tiebreak
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY round(tf * ln(n / df), 6) DESC, term
                   ) AS BIGINT) AS pos
            FROM tf JOIN dfreq USING (term) CROSS JOIN nd
        )
        WHERE pos <= {int(per_doc)}
    """


def zipf_slope(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum Zipf exponent: the least-squares slope of
    ln(frequency) on ln(rank) over the stratum's term-frequency table
    (natural text sits near -1; template floods flatten the head,
    machine-generated tails steepen).  Completes the vocabulary-health
    trio with vocab_stats' TTR/hapax ratios — the slope sees the
    SHAPE of the distribution, not just its endpoints.

    Scale shape: the (stratum, term) word-count groupBy, a rank
    window per stratum (term-frequency tables are vocabulary-sized),
    then one closed-form covariance aggregate per stratum.

    Output: (stratum, n_types, zipf_slope).
    """
    from ..functions.text import tokens

    tf = (
        ensure_width(df)
        .select(
            F.col(strata_col).alias("stratum"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("stratum", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    w = Window.partitionBy("stratum").orderBy(
        F.col("tf").desc(), F.col("term")
    )
    xy = tf.select(
        "stratum",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    return (
        xy.groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_types"),
            F.avg("x").alias("mx"),
            F.avg("y").alias("my"),
            F.avg(F.col("x") * F.col("y")).alias("mxy"),
            F.avg(F.col("x") * F.col("x")).alias("mxx"),
        )
        .where(F.col("n_types") > 1)
        .select(
            "stratum",
            "n_types",
            F.round(
                (F.col("mxy") - F.col("mx") * F.col("my"))
                / (F.col("mxx") - F.col("mx") * F.col("mx")),
                4,
            ).alias("zipf_slope"),
        )
    )


def sql_zipf_slope(
    table: str, strata_col: str = "lang", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`zipf_slope` (slope rounded to 4: the
    closed-form moment sums differ by float ordering ~1e-15 across
    engines, far inside the 4dp quantum)."""
    from ..functions.text import sql_tokens

    return f"""
        WITH tf AS MATERIALIZED (
            SELECT stratum, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT {strata_col} AS stratum,
                         unnest({sql_tokens(text_col)}) AS term
                  FROM {table})
            GROUP BY 1, 2
        ),
        xy AS (
            SELECT stratum,
                   ln(CAST(row_number() OVER (
                       PARTITION BY stratum ORDER BY tf DESC, term
                   ) AS DOUBLE)) AS x,
                   ln(CAST(tf AS DOUBLE)) AS y
            FROM tf
        )
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n_types,
               round((avg(x * y) - avg(x) * avg(y))
                     / (avg(x * x) - avg(x) * avg(x)), 4) AS zipf_slope
        FROM xy
        GROUP BY 1
        HAVING count(*) > 1
    """


def _mixture_ratios(
    df: DataFrame, targets: dict[str, float], strata_col: str
) -> DataFrame:
    """Shared ratio derivation for the mixture family: one tiny counts
    groupBy + one 1-partition window over the |strata|-row frame,
    yielding (strata_col, _n, _ratio) with ratio = t_g * N / n_g.
    Both the downsampling (`mixture_rebalance`) and upsampling
    (`mixture_epochs`) twins and BOTH engine sides derive from this
    one definition, so a ratio-rule change cannot silently diverge.

    Contract note (both consumers): targets for strata ABSENT from
    the corpus contribute nothing and are NOT renormalized — the
    realized output lands at ~(sum of present targets)·N and the
    realized shares are t_g / (that sum).  Check `mixture_stats` for
    requested-vs-realized evidence when target strata may be missing.
    """
    from pyspark.sql.window import Window as W

    target: Column = F.lit(0.0)
    for key, t in sorted(targets.items()):
        target = F.when(F.col(strata_col) == key, F.lit(float(t))).otherwise(
            target
        )
    counts = df.groupBy(strata_col).agg(
        F.count("*").cast("double").alias("_n")
    )
    w = W.partitionBy()
    return counts.withColumn(
        "_ratio", target * F.sum("_n").over(w) / F.col("_n")
    )


def _sql_mixture_ratio_ctes(
    table: str, targets: dict[str, float], strata_col: str
) -> str:
    """DuckDB twin of :func:`_mixture_ratios` as `counts`/`ratios`
    CTE text (same literal targets, same expression order)."""
    target = "0.0"
    for key, t in sorted(targets.items()):
        target = (
            f"CASE WHEN {strata_col} = '{key}' THEN {float(t)} "
            f"ELSE {target} END"
        )
    return f"""counts AS (
            SELECT {strata_col}, CAST(count(*) AS DOUBLE) AS _n
            FROM {table} GROUP BY {strata_col}
        ),
        ratios AS (
            SELECT {strata_col},
                   ({target}) * sum(_n) OVER () / _n AS _ratio
            FROM counts
        )"""


def mixture_rebalance(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str = "lang",
    seed: str = "rebal",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Downsample to a TARGET mixture: given desired output shares per
    stratum (e.g. ``{"en": .4, "fr": .3, "de": .3}``), derive each
    stratum's keep probability from its measured frequency and apply
    the deterministic hash draw.  This is the mixture-weighting step
    of a pretraining data pipeline (DoReMi-style reweighting, applied
    as pure downsampling): ``stratified_sample`` takes rates as GIVEN;
    this op computes them FROM the corpus so the OUTPUT hits the
    requested proportions in expectation.

    keep_prob_g = ratio_g / max_h(ratio_h) with ratio_g = t_g * N /
    n_g — scaling by the max ratio means the scarcest-vs-target
    stratum is kept whole and everything else downsamples toward the
    target shape (no upsampling/duplication).  Strata absent from
    ``targets`` get ratio 0 and are dropped.

    Scale shape: one groupBy over the strata domain (tiny), two
    1-partition window aggregates over that TINY counts frame (|strata|
    rows, never the corpus), a broadcast join back, one filter — the
    corpus itself is never shuffled.  Deterministic across runs,
    cluster sizes, and engines (same md5-draw contract as
    ``stratified_sample``; ``hash_fn="xxhash64"`` is the production
    knob, no DuckDB twin).
    """
    from pyspark.sql.window import Window as W

    w = W.partitionBy()
    probs = (
        _mixture_ratios(df, targets, strata_col)
        .withColumn(
            "_mx", F.max(F.when(F.col("_ratio") > 0, F.col("_ratio"))).over(w)
        )
        .where(F.col("_ratio") > 0)
        .select(
            strata_col,
            (F.col("_ratio") / F.col("_mx")).alias("_keep_prob"),
        )
    )
    draw = _uniform_draw(F.col(id_col), seed, hash_fn)
    return (
        df.join(F.broadcast(probs), strata_col)
        .withColumn("_draw", draw)
        .where(F.col("_draw") < F.col("_keep_prob"))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(strata_col).alias("stratum"),
            F.round(F.col("_keep_prob"), 6).alias("keep_prob"),
            F.round(F.col("_draw"), 6).alias("draw"),
        )
    )


def sql_mixture_rebalance(
    table: str,
    targets: dict[str, float],
    strata_col: str = "lang",
    seed: str = "rebal",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`mixture_rebalance` — same literal targets,
    same expression shapes/order so the IEEE doubles agree bit-for-bit
    (ratio = t * N / n, keep = ratio / max_ratio, draw = md5 32-bit
    over 2^32)."""
    draw = _sql_uniform_draw(id_expr=id_col, seed=seed)
    return f"""
        WITH {_sql_mixture_ratio_ctes(table, targets, strata_col)},
        probs AS (
            SELECT {strata_col},
                   _ratio / max(CASE WHEN _ratio > 0 THEN _ratio END)
                            OVER () AS _keep_prob
            FROM ratios
            WHERE _ratio > 0
        )
        SELECT d.{id_col} AS doc_id,
               d.{strata_col} AS stratum,
               round(p._keep_prob, 6) AS keep_prob,
               round({draw}, 6) AS draw
        FROM {table} d JOIN probs p USING ({strata_col})
        WHERE {draw} < p._keep_prob
    """


def shingle_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
) -> DataFrame:
    """Per-document novelty: the share of the doc's DISTINCT w-word
    shingles that appear in NO other document.  The document-level
    redundancy dial the pairwise dedup family can't give you: near-dup
    detection answers "which pairs overlap", novelty answers "how much
    of THIS doc is new to the corpus" — low-novelty docs are template
    floods / syndicated copies even when no single pair crosses a
    near-dup threshold, and the score is the natural keep-priority for
    budgeted corpus selection.

    Output: one row per input doc — ``n_shingles``, ``n_unique``
    (corpus-wide df == 1), ``novelty = n_unique / n_shingles`` (NULL
    for shingle-less docs).

    Scale shape: one narrow explode, one shingle-keyed census groupBy
    (map-side partials — the same shuffle class as the MinHash
    signature pass), one shingle-keyed join back, one doc-keyed
    groupBy, one left join to reinstate empty docs.  No pair
    materialization anywhere.
    """
    from ..functions.text import shingles

    # r5: the one-split parquet corpus ran this whole explode+census
    # chain in ONE task (24s of a 44s bench row at sf0.1) — same
    # narrow-input trap ensure_width exists for in the dedup family
    sh = ensure_width(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), w=w)).alias("_sh"),
    )
    dfc = sh.groupBy("_sh").agg(F.count("*").alias("_df"))
    per = (
        sh.join(dfc, "_sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias(
                "n_unique"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shingles"), F.lit(0).cast("long")).alias(
                "n_shingles"
            ),
            F.coalesce(F.col("n_unique"), F.lit(0).cast("long")).alias(
                "n_unique"
            ),
            F.round(
                F.col("n_unique").cast("double") / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
    )


def sql_shingle_novelty(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
) -> str:
    """DuckDB twin of :func:`shingle_novelty` (same shingle tokenizer,
    same NULL-for-empty contract)."""
    from ..functions.text import sql_shingles

    return f"""
        WITH sh AS MATERIALIZED (
            SELECT {id_col} AS doc_id,
                   unnest({sql_shingles(text_col, w=w)}) AS _sh
            FROM {table}
        ),
        dfc AS MATERIALIZED (
            SELECT _sh, count(*) AS _df FROM sh GROUP BY _sh
        ),
        per AS (
            SELECT doc_id,
                   count(*) AS n_shingles,
                   sum(CASE WHEN _df = 1 THEN 1 ELSE 0 END) AS n_unique
            FROM sh JOIN dfc USING (_sh)
            GROUP BY doc_id
        )
        SELECT d.{id_col} AS doc_id,
               CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(coalesce(p.n_unique, 0) AS BIGINT) AS n_unique,
               round(CAST(p.n_unique AS DOUBLE) / p.n_shingles, 6)
                   AS novelty
        FROM {table} d LEFT JOIN per p ON d.{id_col} = p.doc_id
    """


def template_floods(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    w: int = 3,
    top_n: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Top-``top_n`` most-duplicated w-shingles per stratum — the
    template/boilerplate flood report.  ``shingle_novelty`` scores each
    DOC's redundancy; this names the REPEATED CONTENT itself (cookie
    banners, syndication footers, SEO templates), per language, ranked
    by document frequency — the observability table a cleaning pass is
    tuned against (CCNet/RefinedWeb-style line removal generalized to
    shingles).

    Output: (stratum, shingle, df, rank), rank 1 = most duplicated,
    ties broken by shingle text for a total order.  Scale shape: one
    explode, one (stratum, shingle)-keyed census groupBy (map-side
    partials), a ``min_df`` pre-filter, then a top-N window over the
    CENSUS (keyed by stratum — the window input is already one row per
    distinct shingle, never the corpus).
    """
    from ..functions.text import shingles

    sh = ensure_width(df).select(
        F.col(strata_col).alias("stratum"),
        F.explode(shingles(F.col(text_col), w=w)).alias("shingle"),
    )
    census = (
        sh.groupBy("stratum", "shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= int(min_df))
    )
    from pyspark.sql.window import Window as W

    w_rank = W.partitionBy("stratum").orderBy(
        F.col("df").desc(), F.col("shingle").asc()
    )
    return (
        census.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= int(top_n))
        .select("stratum", "shingle", F.col("df").cast("long").alias("df"),
                F.col("rank").cast("long").alias("rank"))
    )


def sql_template_floods(
    table: str,
    text_col: str = "text",
    strata_col: str = "lang",
    w: int = 3,
    top_n: int = 10,
    min_df: int = 2,
) -> str:
    """DuckDB twin of :func:`template_floods`."""
    from ..functions.text import sql_shingles

    return f"""
        WITH sh AS MATERIALIZED (
            SELECT {strata_col} AS stratum,
                   unnest({sql_shingles(text_col, w=w)}) AS shingle
            FROM {table}
        ),
        census AS (
            SELECT stratum, shingle, count(*) AS df
            FROM sh GROUP BY stratum, shingle
            HAVING count(*) >= {int(min_df)}
        )
        SELECT stratum, shingle, CAST(df AS BIGINT) AS df,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY stratum ORDER BY df DESC, shingle ASC
            ) AS rank
            FROM census
        )
        WHERE rank <= {int(top_n)}
    """


def mixture_epochs(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str = "lang",
    seed: str = "epoch",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    max_epochs: float = 100.0,
) -> DataFrame:
    """Target mixture WITH upsampling: emit each doc ``floor(r)`` or
    ``ceil(r)`` times where ``r = target_share * N / n_stratum`` — the
    epochs-per-source knob of a pretraining mix (a scarce in-target
    stratum repeats across epochs; an over-represented one
    downsamples), keeping the TOTAL output at ~N rows shaped exactly
    like ``targets``.  :func:`mixture_rebalance` is the pure-
    downsampling variant (keep probs <= 1); this one duplicates, so
    the output carries a ``copy`` ordinal per emitted duplicate (the
    training-order shuffle treats copies as distinct rows).

    Fractional epochs are resolved per-doc by the deterministic hash
    draw: copies = floor(r) + (draw < frac(r)), so expectation is
    exactly r with every decision a pure function of (seed, id).
    Strata absent from ``targets`` emit nothing; targets for strata
    absent from the CORPUS are not renormalized (see
    ``_mixture_ratios``).  ``max_epochs`` caps r — a tiny stratum
    with a nonzero target would otherwise explode into t*N/n copies
    of a handful of docs (one task exploding a huge sequence, and a
    "target-shaped" mix that is mostly duplicates of nothing); the
    cap bounds per-doc fanout and surfaces as epochs == max_epochs in
    the output, at the cost of that stratum under-filling its target.

    Scale shape: identical to ``mixture_rebalance`` (tiny counts
    groupBy + one window + broadcast join) plus one narrow
    explode(sequence) — output rows ~N, never quadratic.
    """
    probs = (
        _mixture_ratios(df, targets, strata_col)
        .where(F.col("_ratio") > 0)
        .select(
            strata_col,
            F.least(F.col("_ratio"), F.lit(float(max_epochs))).alias("_r"),
        )
    )
    draw = _uniform_draw(F.col(id_col), seed, hash_fn)
    with_copies = (
        df.join(F.broadcast(probs), strata_col)
        .withColumn("_draw", draw)
        .withColumn(
            "_copies",
            (
                F.floor(F.col("_r"))
                + F.when(
                    F.col("_draw") < F.col("_r") - F.floor(F.col("_r")), 1
                ).otherwise(0)
            ).cast("long"),
        )
        .where(F.col("_copies") >= 1)
    )
    return with_copies.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.col("_copies"))
        ).alias("copy"),
        F.round(F.col("_r"), 6).alias("epochs"),
    )


def sql_mixture_epochs(
    table: str,
    targets: dict[str, float],
    strata_col: str = "lang",
    seed: str = "epoch",
    id_col: str = "doc_id",
    max_epochs: float = 100.0,
) -> str:
    """DuckDB twin of :func:`mixture_epochs` (same shared ratio CTEs,
    same cap; unnest(range()) — DuckDB 1.0 lacks lateral column
    args)."""
    draw = _sql_uniform_draw(id_expr=id_col, seed=seed)
    return f"""
        WITH {_sql_mixture_ratio_ctes(table, targets, strata_col)},
        probs AS (
            SELECT {strata_col},
                   least(_ratio, {float(max_epochs)}) AS _r
            FROM ratios WHERE _ratio > 0
        ),
        wc AS (
            SELECT d.{id_col} AS doc_id,
                   d.{strata_col} AS stratum,
                   p._r,
                   CAST(floor(p._r) + (CASE WHEN {draw} < p._r - floor(p._r)
                        THEN 1 ELSE 0 END) AS BIGINT) AS _copies
            FROM {table} d JOIN probs p USING ({strata_col})
        )
        SELECT doc_id, stratum,
               CAST(unnest(range(1, _copies + 1)) AS BIGINT) AS copy,
               round(_r, 6) AS epochs
        FROM wc
        WHERE _copies >= 1
    """
