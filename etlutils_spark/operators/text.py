"""Text-analysis operators over a document corpus (training-data
pipeline surface): tokenization, quality stats, language ID heuristic,
token counting, fingerprinting.

Everything is built-in expression work (split / higher-order functions /
regexp / md5) — no Python in the hot path, so a 100 TB corpus scan stays
inside whole-stage codegen with the parquet reader pruning to the text
column.

Performance invariant: the token array is MATERIALIZED once per row
(``with_tokens``) before any consumer references it. Inlining the
``split`` call into every consumer expression re-evaluates it per use —
measured 25x slower for shingle construction (split embedded 3x per
shingle element). Catalyst's CollapseProject will not duplicate a
non-cheap aliased expression, so the projected column is computed once.

Portable-hash convention: md5 hex strings are the cross-engine hash
domain (identical in Spark and DuckDB, byte-wise comparable/min-able);
xxhash64 is the fast path where oracle parity is not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny in-vocabulary stopword sets; EN list doubles as the quality
# stopword list. Deterministic, dictionary-sized -> travel in the plan.
STOPWORDS = ("the", "a", "of", "and", "to", "in")
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "y", "los"),
    "zh": ("de5", "shi4", "le5", "he2"),  # romanized placeholders
}

TOKENS_COL = "__toks"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single-space convention of the corpus).
    Mirrors DuckDB ``string_split(text, ' ')`` exactly."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def with_tokens(df: DataFrame, text_col: str = "text", parallel: bool = True) -> DataFrame:
    """Materialize the token array once (see module docstring), spreading
    the input across the session's cores first (single-file scans are
    1-task; tokenization is the CPU stage that must parallelize)."""
    from etlutils_spark.sources.files import spread

    if parallel:
        df = spread(df)
    return df.withColumn(TOKENS_COL, tokens(text_col))


def shingles_from_tokens(tok_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token column.

    NB: Spark ``sequence(1, 0)`` yields [1, 0] (descending), unlike
    DuckDB ``generate_series(1, 0)`` = [] — short texts are guarded.
    """
    w = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)])
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(w) >= n, F.array_distinct(gram)).otherwise(empty)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Shingles straight from a text column — convenience for one-shot
    use. Multi-consumer pipelines must go through ``with_tokens`` +
    ``shingles_from_tokens`` instead (25x difference, see module doc)."""
    return shingles_from_tokens(tokens(text), n)


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality stats + a composite quality score.

    Columns: n_chars, n_tokens, n_distinct_tokens, avg_token_len,
    stopword_ratio, quality_score. All divisions are double/double —
    single IEEE ops, bit-identical to the DuckDB twin.
    """
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    n_tokens = F.size(toks).cast("bigint")
    sum_len = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    n_stop = _count_in(toks, STOPWORDS).cast("bigint")
    avg_token_len = sum_len.cast("double") / n_tokens.cast("double")
    stopword_ratio = n_stop.cast("double") / n_tokens.cast("double")
    quality = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + stopword_ratio * F.lit(0.3)
        + F.least(avg_token_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.2)
    )
    return base.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        avg_token_len.alias("avg_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str | None = None,
) -> DataFrame:
    """Marker-word language ID heuristic with a fixed priority order for
    ties (en > de > fr > es > zh); all-zero scores -> 'und'.

    ``label_col`` optionally names a ground-truth column to carry through
    as ``lang_label`` (for accuracy evaluation); omitted, the output has
    no label column, so the operator works on any corpus."""
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    scores = {k: _count_in(toks, v).cast("bigint") for k, v in LANG_MARKERS.items()}
    order = list(LANG_MARKERS)
    expr = None
    for lang in reversed(order):
        s = scores[lang]
        cond = s > 0
        for other in order:
            if order.index(other) < order.index(lang):
                cond = cond & (s > scores[other])
            elif other != lang:
                cond = cond & (s >= scores[other])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    pred = expr.otherwise(F.lit("und"))
    label = [F.col(label_col).alias("lang_label")] if label_col else []
    return base.select(
        F.col(id_col),
        *label,
        *[scores[k].alias(f"score_{k}") for k in order],
        pred.alias("lang_pred"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace vs regex ("BPE-ish" word/number pieces) token counts."""
    base = with_tokens(df, text_col)
    re_toks = F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+|[0-9]+"), 0)
    return base.select(
        F.col(id_col),
        F.size(F.col(TOKENS_COL)).cast("bigint").alias("n_ws_tokens"),
        F.size(re_toks).cast("bigint").alias("n_re_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: full-text md5 + winnowing-style min-shingle
    fingerprint (lexicographic min over shingle md5s — the portable-hash
    equivalent of a min-hash over 3-gram shingles)."""
    base = with_tokens(df, text_col).withColumn(
        "__sh", shingles_from_tokens(TOKENS_COL, 3)
    )
    return base.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.array_min(F.transform("__sh", F.md5)).alias("winnow_fp"),
    )


# DuckDB twins ---------------------------------------------------------------

DUCK_TOKENS = "string_split(text, ' ')"
DUCK_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),"
    " i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"
)


def duck_count_in(words: tuple[str, ...]) -> str:
    lit = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(w, t -> list_contains([{lit}], t)))"


def corpus_rarity_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Corpus-statistics quality score: how typical is each document's
    vocabulary of the corpus it lives in? A statistical-LM-flavored
    filter with NO float log-probs — every aggregate is integer /
    decimal-exact, so scores are bit-identical on any engine and any
    partitioning (a log-based perplexity would differ in the last ulp
    between libm implementations).

    Per doc: ``n_tokens``, ``avg_token_count`` (decimal-exact mean of
    each token's global occurrence count — low for gibberish/OOV-heavy
    docs), ``rare_ratio`` (fraction of tokens occurring <=
    ``rare_max_count`` times corpus-wide — high for noise).

    Contract note (review catch, documented not changed): a doc whose
    text is NULL tokenizes to zero rows and is ABSENT from the output
    (explode drops it), matching the DuckDB oracle's UNNEST shape —
    unlike ``line_boilerplate_removal``/``tokens_to_ids``, which emit
    a row for every input doc. Callers joining these stats back must
    left-join (or pre-filter NULL text) or NULL-text docs silently
    leave the pipeline; same contract in :func:`oov_stats`.

    Scale: two shuffles — the vocabulary count (token key) and the
    per-doc re-aggregation (id key). The token->count join is the skew
    point (stopwords hit every row): Spark AQE skew-join splits it, and
    the count table is vocabulary-sized (Zipf: ~sqrt of token mass), so
    it broadcasts for any corpus whose vocab fits in memory
    (``broadcast_vocab=True``, the default). At 100 TB a raw web-scale
    vocabulary can exceed executor memory — pass
    ``broadcast_vocab=False`` to fall back to a shuffle join on the
    token key (AQE's skew split handles the stopword keys), the same
    escape hatch as ``decontaminate(broadcast_benchmark=False)``.
    """
    from etlutils_spark.caching import persist_tracked

    # tok feeds TWO unshared subtrees (the vocabulary count and the
    # join probe) — Catalyst does not dedupe common subtrees, so
    # without the persist one action scans and tokenizes the corpus
    # twice (the bm25/bigram token-stream persist rule; optimization
    # guide §5: cache only multi-consumer intermediates).
    # The token is only ever an equality key (vocab groupBy + probe
    # join), so the stream narrows it to xxhash64 at the explode
    # (guide §2.3): 8-byte persisted/joined keys instead of token
    # strings; counts identical up to ~2^-64 collisions (the module's
    # documented jaccard-key trade).
    tok = persist_tracked(
        with_tokens(df, text_col)
        .select(id_col, F.explode(TOKENS_COL).alias("__t"))
        .select(id_col, F.xxhash64("__t").alias("__token"))
    )
    vocab = tok.groupBy("__token").agg(F.count(F.lit(1)).alias("__tc"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    return (
        tok.join(vocab, "__token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.col("__tc").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_token_count"),
            (
                F.sum(F.when(F.col("__tc") <= rare_max_count, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("rare_ratio"),
        )
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows (the
    context-window prep step before tokenizer/embedding stages):
    one output row per chunk with ``chunk_idx``, ``chunk_start``
    (1-based token offset), ``chunk_text`` and ``n_chunk_tokens``.
    ``overlap`` tokens are shared between consecutive chunks.

    Scale: pure array algebra on the materialized token column —
    sequence/posexplode/slice all run in whole-stage codegen, no UDF,
    no shuffle (a per-row flatMap at scan speed). Chunk geometry is a
    pure function of the token count, so output is deterministic under
    any partitioning.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    # start bound is size - overlap, not size: a start inside the final
    # overlap region emits a chunk FULLY CONTAINED in its predecessor
    # (zero new tokens), which a training/embedding consumer indexes
    # twice (review catch). Every token stays covered: the last kept
    # start s > size - overlap - step reaches s + max_tokens - 1 >=
    # size, and each dropped start's tokens lie inside the previous
    # chunk by the same algebra.
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    chunk = F.slice(toks, F.col("chunk_start"), max_tokens)
    return (
        base.select(id_col, TOKENS_COL, F.posexplode(starts).alias("chunk_idx", "chunk_start"))
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
    )


def build_vocab(
    df: DataFrame,
    top_n: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Top-N vocabulary induction: the highest-frequency tokens in the
    corpus, ranked (count DESC, token ASC — fully deterministic under
    ties). Output: (token, token_count, vocab_rank).

    Scale: one shuffle to the vocabulary-sized count table, then
    ``orderBy().limit(top_n)`` — Spark plans a distributed TakeOrdered
    (per-partition partial top-k, k rows per partition to the driver
    stage), NOT a global sort. The rank window runs over the already-
    limited top_n rows, so its single partition is bounded by top_n by
    construction.
    """
    from pyspark.sql import Window

    tok = with_tokens(df, text_col).select(F.explode(TOKENS_COL).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("token_count"))
    top = counts.orderBy(F.desc("token_count"), F.col("token")).limit(top_n)
    w = Window.orderBy(F.desc("token_count"), F.col("token"))
    return top.withColumn("vocab_rank", F.row_number().over(w).cast("bigint"))


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against an induced (or
    external) vocabulary — the tokenizer-coverage health metric run
    before committing to a vocab. Output: (id, n_tokens, n_oov,
    oov_rate); every occurrence counts (token frequency, not types).

    Scale: the vocab is top-N-bounded, so it broadcasts; the corpus side
    is one explode + left join + per-doc re-aggregation (one shuffle on
    the id key). The division is a single IEEE double op — bit-identical
    on any engine/partitioning. NULL-text docs are absent from the
    output (explode drops them — see the corpus_rarity_stats contract
    note); left-join these stats back or pre-filter NULL text.
    """
    tok = with_tokens(df, text_col).select(
        id_col, F.explode(TOKENS_COL).alias("token")
    )
    v = F.broadcast(vocab.select("token").withColumn("__in_v", F.lit(1)))
    n_tokens = F.count(F.lit(1)).cast("bigint")
    n_oov = F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0)).cast("bigint")
    return (
        tok.join(v, "token", "left")
        .groupBy(id_col)
        .agg(
            n_tokens.alias("n_tokens"),
            n_oov.alias("n_oov"),
            (n_oov.cast("double") / n_tokens.cast("double")).alias("oov_rate"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every word ``k``-gram POSITIONALLY (no dedup — the
    sequence matters), slide a window of ``window`` consecutive hashes,
    select each window's minimum; the distinct selected hashes are the
    document's fingerprint set. Coverage guarantee: any shared substring
    of at least ``window + k - 1`` tokens contributes >=1 common
    fingerprint, while only ~2/(window+1) of all k-gram hashes are
    stored — position-robust partial-overlap detection (the MOSS
    algorithm), where MinHash answers whole-document resemblance.

    Output: one ``(id, fingerprint)`` row per distinct selected hash.

    Scale: pure per-row Column algebra (sequence/transform/slice/
    array_min — all whole-stage codegen); the explode multiplies rows
    by the winnowed density only. Hashes are md5 hex (portable-hash
    convention, min-able lexicographically on any engine).
    """
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    npos = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), npos),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    g = base.select(id_col, grams.alias("__g"))
    nwin = F.greatest(F.size(F.col("__g")) - (window - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), nwin),
            lambda i: F.array_min(F.slice(F.col("__g"), i, window)),
        )
    )
    return g.select(id_col, F.explode(fps).alias("fingerprint"))


def tokens_to_ids(
    df: DataFrame,
    vocab: DataFrame,
    oov_id: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_literal_vocab: int = 8192,
    mode: str = "auto",
) -> DataFrame:
    """Encode each document's tokens as integer ids from a vocabulary
    (``build_vocab`` output or any ``(token, vocab_rank)`` frame) — the
    final tokenizer step before sequence packing: token -> vocab_rank,
    out-of-vocabulary -> ``oov_id``. Output: ``(id, ids array<bigint>,
    n_ids)``, order-preserving; NULL text -> NULL ids (split(NULL) is
    NULL). ``id_col`` must uniquely key rows — one row per document —
    in both modes (the broadcast path aggregates on it, so duplicate
    ids would merge; literal mode is per-row).

    Two execution modes, selected by ``mode``:

    - ``"literal"``: the vocabulary is collected (bounded: raises above
      ``max_literal_vocab`` entries) and embedded as a plan-literal
      map, so encoding is a zero-shuffle per-row ``transform`` lookup
      in whole-stage codegen — the same travel-in-the-plan discipline
      as the stopword lists. The budget default is MEASURED, not
      guessed: Catalyst planning cost is fine at 8k map entries (~3 s
      end to end) but blows up at 32k (~58 s — expression-tree size,
      not data).
    - ``"broadcast"``: the production path for BPE-scale (32k-100k+)
      vocabularies, where any plan-literal encoding is pathological:
      posexplode tokens, left-join the broadcast vocab table on the
      token key (hash lookup, no shuffle on the corpus side), then
      re-assemble each document's id sequence order-preserved via
      ``array_sort(collect_list(struct(pos, id)))`` — ONE shuffle, on
      the doc-id key, sized by token count not vocab size. Same
      contract as literal mode bit-for-bit (pinned by tests).
    - ``"auto"`` (default): literal when the vocab fits
      ``max_literal_vocab``, else broadcast — small vocabs keep the
      zero-shuffle plan, big ones never die on a plan-size cliff.
    """
    if mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"mode must be auto|literal|broadcast, got {mode!r}")
    if mode != "broadcast":
        rows = (
            vocab.select("token", "vocab_rank")
            .limit(max_literal_vocab + 1)
            .collect()
        )
        if len(rows) > max_literal_vocab:
            if mode == "literal":
                raise ValueError(
                    f"vocabulary exceeds max_literal_vocab={max_literal_vocab}; "
                    "use mode='broadcast' for BPE-scale vocabularies"
                )
        else:
            entries = [
                x
                for r in rows
                for x in (F.lit(r["token"]), F.lit(int(r["vocab_rank"])))
            ]
            mapping = F.create_map(*entries) if entries else F.create_map()
            base = with_tokens(df, text_col)
            ids = F.transform(
                F.col(TOKENS_COL),
                lambda t: F.coalesce(
                    F.element_at(mapping, t), F.lit(oov_id)
                ).cast("bigint"),
            )
            return base.select(id_col, ids.alias("ids")).withColumn(
                "n_ids", F.size("ids").cast("bigint")
            )
    # broadcast-join path (explicit, or auto overflow)
    tok = with_tokens(df, text_col).select(
        id_col,
        F.col(TOKENS_COL).isNull().alias("__null_toks"),
        F.posexplode_outer(TOKENS_COL).alias("__pos", "token"),
    )
    v = F.broadcast(
        vocab.select(
            "token", F.col("vocab_rank").cast("bigint").alias("__vid")
        )
    )
    # collect_list skips nulls, so the single posexplode_outer row a
    # NULL-token-array document emits (__pos NULL) contributes nothing
    # to the re-assembly; the __null_toks flag then restores literal
    # mode's NULL-in -> NULL-out (split(NULL) = NULL, so transform and
    # size are NULL too — bit-for-bit parity, pinned by tests)
    pair = F.when(
        F.col("__pos").isNotNull(),
        F.struct(
            F.col("__pos").alias("pos"),
            F.coalesce(F.col("__vid"), F.lit(oov_id)).cast("bigint").alias("vid"),
        ),
    )
    return (
        tok.join(v, "token", "left")
        .groupBy(id_col)
        .agg(
            F.when(
                F.max("__null_toks"),
                F.lit(None).cast("array<bigint>"),
            )
            .otherwise(
                F.transform(
                    F.array_sort(F.collect_list(pair)), lambda s: s["vid"]
                )
            )
            .alias("ids")
        )
        .withColumn("n_ids", F.size("ids").cast("bigint"))
    )


def token_gini_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity score: Gini impurity of the token
    distribution, ``1 - sum(count_t^2) / n^2`` — the log-free entropy
    proxy (this module's convention: ``ln`` is not correctly-rounded
    IEEE, Gini is pure integer counts + two exact divisions). Near 0 =
    one token dominates (degenerate/boilerplate); near 1 = uniformly
    diverse vocabulary. Plus type-token ratio ``n_distinct / n``.

    Zero shuffle: ``sum(count^2)`` is the sum of squared run lengths of
    the SORTED token array — the same O(n log n) per-row fold as
    ``repetition_stats``, all in whole-stage codegen."""
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    n = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("ss"),
    )

    def _step(acc, t):
        is_new = acc["prev"].isNull() | (acc["prev"] != t)
        # close the previous run's square on a boundary
        ss = F.when(is_new, acc["ss"] + acc["run"] * acc["run"]).otherwise(acc["ss"])
        run = F.when(is_new, F.lit(1).cast("bigint")).otherwise(acc["run"] + 1)
        return F.struct(t.alias("prev"), run.alias("run"), ss.alias("ss"))

    sum_sq = F.aggregate(
        F.array_sort(toks), init, _step,
        lambda acc: acc["ss"] + acc["run"] * acc["run"],
    )
    nd = n.cast("double")
    gini = F.lit(1.0) - (sum_sq.cast("double") / (nd * nd))
    return base.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / nd).alias("type_token_ratio"),
        gini.alias("token_gini"),
    )


def line_boilerplate_removal(
    df: DataFrame,
    max_doc_frac: float = 0.02,
    min_doc_count: int = 2,
    delim: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet/RefinedWeb-style line-level boilerplate removal: a line
    occurring in >= ``min_doc_count`` documents AND >= ``max_doc_frac``
    of the corpus is boilerplate (headers, navigation, cookie banners —
    content that repeats across pages without being content), and is
    dropped from every document; the survivors are reassembled in
    original order.

    Output: one row per input doc —
    ``(id_col, n_lines, n_boiler_lines, text_clean)`` where
    ``text_clean`` is the document with boilerplate lines removed
    (empty string when everything was boilerplate).

    Scale: explode to (doc, pos, line) is linear; line frequency is a
    two-level combinable aggregation keyed on the line itself (hash the
    line to a digest first at web scale to shrink the shuffle key);
    the boilerplate set is frequency-mass-bounded — each boilerplate
    line occupies >= max_doc_frac*N doc-slots, so there can be at most
    (avg lines/doc)/max_doc_frac such lines, a broadcast-sized build
    side by construction; reassembly is one
    groupBy(doc) with an order-struct array_sort — the same combinable
    collect used by pack_sequences. No quadratic stage, no driver
    state."""
    if not 0.0 < max_doc_frac <= 1.0:
        raise ValueError(f"max_doc_frac must be in (0,1], got {max_doc_frac}")
    total = df.select(
        F.count(F.lit(1)).cast("double").alias("__total_docs")
    )
    import re as _re

    # NULL text coalesces to '' (one empty line) so every input doc
    # yields an output row — split(NULL) would posexplode to zero rows
    # and silently drop the document from the result
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(delim))
        ).alias("__pos", "__line"),
    )
    freq = (
        lines.select(id_col, "__line")
        .distinct()  # per-doc dedup: a line repeated within one doc counts once
        .groupBy("__line")
        .agg(F.count(F.lit(1)).alias("__n_docs"))
    )
    boiler = (
        freq.crossJoin(F.broadcast(total))
        .filter(
            (F.col("__n_docs") >= min_doc_count)
            & (F.col("__n_docs") / F.col("__total_docs") >= max_doc_frac)
        )
        .select("__line", F.lit(True).alias("__boiler"))
    )
    marked = lines.join(boiler, "__line", "left")
    seq = F.array_sort(
        F.collect_list(
            F.when(
                F.col("__boiler").isNull(),
                F.struct(F.col("__pos"), F.col("__line")),
            )
        )
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("__boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_boiler_lines"),
        F.concat_ws(
            delim, F.transform(seq, lambda s: s["__line"])
        ).alias("text_clean"),
    )


# Sentinel piece delimiters for BPE encoding (ASCII file/group
# separators — absent from natural text; bpe_encode documents the
# contract). A piece p travels as FS+p+GS, so a merge pattern
# FS+a+GS+FS+b+GS can only ever match at a true piece boundary —
# substring-safe plain replace() in ANY engine, no lookbehind regex
# (RE2-portable by construction).
BPE_FS = "\x1c"
BPE_GS = "\x1d"


def bpe_train(
    df: DataFrame,
    num_merges: int = 16,
    sample_limit: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "list[tuple[str, str]]":
    """Byte-pair-encoding merge induction on a bounded deterministic
    sample (Sennrich et al., ACL 2016) — the ``pq_train`` pattern:
    tokenizers train on a sample driver-side (classic, cheap), then the
    learned merge table applies distributed at full scale
    (``bpe_encode``). Word-level: characters within whitespace words;
    no end-of-word marker (documented divergence from the paper's
    ``</w>`` — pieces never span words here regardless).

    Deterministic: the sample is the ``sample_limit`` lowest
    ``md5(id)`` docs (stable under partitioning/engine), and merge
    ties break lexicographically. Returns the ordered merge list.

    Scale: the doc sample is this function's 100-TB ceiling — see
    :func:`bpe_train_corpus` for the corpus-scale form, which counts
    words in Spark and trains on the (bounded) distinct-word table
    instead of a doc sample. Both run the same trainer on a word-
    frequency table, so on identical inputs the merge lists are
    bit-identical (pinned by a differential test)."""
    from collections import Counter

    rows = (
        df.select(text_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_limit)
        .collect()
    )
    import re as _re

    word_freq: Counter = Counter()
    for r in rows:
        for w in _re.split(r"[ \t\n\r\f]+", r[0] or ""):
            if w:
                word_freq[tuple(w)] += 1
    return _train_from_word_freq(word_freq, num_merges)


def bpe_train_corpus(
    df: DataFrame,
    num_merges: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_freq: int = 1,
    max_word_rows: int = 2_000_000,
) -> "list[tuple[str, str]]":
    """Corpus-scale BPE merge induction: the O(corpus) half — word
    counting — runs in Spark (split / explode / hash-agg, one job, all
    map-side combinable), and the driver trains on the DISTINCT
    word-frequency table, which is what actually bounds tokenizer
    training: natural-language vocabulary grows ~O(corpus^0.5) (Heaps'
    law), so the word table is KB-to-low-GB at 100 TB while the doc
    sample :func:`bpe_train` collects caps coverage at
    ``sample_limit`` docs. One Spark job total — NOT one agg per merge
    round, which at 8k merges would schedule 8k jobs for a table the
    driver holds comfortably (the same train-driver-side /
    apply-distributed split as ``pq_train``).

    ``min_freq`` prunes hapax/noise words BEFORE the collect (the
    standard tokenizer lever); ``max_word_rows`` is the loud guard —
    a corpus whose pruned vocabulary still exceeds it raises with the
    remedy (raise ``min_freq``) instead of silently OOMing the driver.

    Same selection rule as :func:`bpe_train` (max count, lexicographic
    min tie-break, same indexed incremental trainer), so the merge
    list for a given word-frequency table is bit-identical — the
    differential test feeds both paths the same docs and pins equal
    lists. ``min_freq > 1`` changes the TABLE, not the rule."""
    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), "[ \t\n\r\f]+"),
                    lambda w: F.length(w) > 0,
                )
            ).alias("__w")
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    if min_freq > 1:
        words = words.filter(F.col("__f") >= min_freq)
    rows = words.limit(max_word_rows + 1).collect()
    if len(rows) > max_word_rows:
        raise ValueError(
            f"bpe_train_corpus: distinct vocabulary exceeds "
            f"max_word_rows={max_word_rows} after min_freq={min_freq} "
            "pruning — raise min_freq (hapax words never win a merge "
            "against real vocabulary) or max_word_rows"
        )
    from collections import Counter

    word_freq: Counter = Counter()
    for r in rows:
        word_freq[tuple(r[0])] = int(r[1])
    return _train_from_word_freq(word_freq, num_merges)


def _train_from_word_freq(
    word_freq: "dict[tuple[str, ...], int]", num_merges: int
) -> "list[tuple[str, str]]":
    """The shared merge-induction loop over a word-frequency table.

    Indexed incremental trainer (Sennrich's fast variant): pair
    counts plus a pair -> {word} inverted index are maintained
    incrementally, so each merge touches only the words that CONTAIN
    the merged pair instead of re-counting the whole vocabulary —
    the difference between O(merges * vocab) and O(merges * hits),
    what makes the >= 1k-merge registrations practical (r6 verdict
    #8). Selection is a LAZY-DELETION HEAP, not a scan: the r8
    measurement put ~190 of the 8k-merge trainer's ~192 s in the
    per-merge max-count + min-pair passes over the few-hundred-
    thousand-entry pairs dict (two O(|pairs|) Python scans per merge);
    the heap keys ``(-count, pair)`` so the top is exactly the old
    rule — max count, lexicographic min tie-break — and every count
    update pushes a fresh entry while stale ones are discarded when
    popped (an entry is live iff its count matches the pair's CURRENT
    count, regardless of the path that count took). Merge lists stay
    bit-identical to the naive loop (pinned by a differential test)."""
    import heapq

    from collections import Counter

    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for word, f in word_freq.items():
        words.append(word)
        freqs.append(f)
    pairs: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, word in enumerate(words):
        f = freqs[wi]
        for i in range(len(word) - 1):
            p = (word[i], word[i + 1])
            pairs[p] += f
            where.setdefault(p, set()).add(wi)
    heap: "list[tuple[int, tuple[str, str]]]" = [
        (-c, p) for p, c in pairs.items()
    ]
    heapq.heapify(heap)
    # lazily-filled per-word pair-multiset cache: a word's old Counter
    # is exactly the new Counter stored when it was last rewritten, so
    # each rewrite builds ONE Counter, not two. Entries exist only for
    # words a merge has touched (bounded by hit words, not vocabulary).
    pair_cache: "dict[int, Counter]" = {}
    merges: list[tuple[str, str]] = []
    dirty: "set[tuple[str, str]]" = set()
    for _ in range(num_merges):
        while heap:
            negc, p = heap[0]
            if pairs.get(p) == -negc:
                break  # live: current count matches the entry
            heapq.heappop(heap)  # stale (count changed since push)
        if not heap:
            break
        a, b = heap[0][1]
        merges.append((a, b))
        ab = a + b
        for wi in sorted(where.get((a, b), ())):
            word, f = words[wi], freqs[wi]
            # left-to-right greedy rewrite via C-speed tuple.index /
            # slice-extend: scan cost is per OCCURRENCE, not per
            # position (identical output to the per-position loop,
            # including the a == b overlap semantics — a match always
            # resumes scanning after its second element)
            out: list[str] = []
            n = len(word)
            i = 0
            while True:
                j = i
                while True:
                    try:
                        j = word.index(a, j)
                    except ValueError:
                        j = -1
                        break
                    if j + 1 < n and word[j + 1] == b:
                        break
                    j += 1
                if j < 0:
                    out.extend(word[i:])
                    break
                out.extend(word[i:j])
                out.append(ab)
                i = j + 2
            new = tuple(out)
            # retract the old word's pair stats, add the new word's —
            # as a DELTA between the two pair multisets (built with
            # C-speed Counter(zip(...))), so only net-changed pairs
            # touch the counts/index/dirty set. The position-by-
            # position form did 2 dict ops per position per word (the
            # trainer's hottest loop, profiled ~60% of wall at the 1k-
            # merge registration); a 32-char word with one merge site
            # has ~3 net-changed pairs. Count arithmetic is identical
            # (same integer totals, commutative), and the where-index
            # net effect is the same: wi in where[p] iff p occurs in
            # the new word. Count changes only mark the pair DIRTY
            # here; the heap push happens once per dirty pair per
            # merge, below — pushing per update meant H pushes for a
            # pair touched by H hit words, and the stale entries made
            # heappop the trainer's hottest call (profiled: ~45% of
            # wall before that fix).
            oldc = pair_cache.get(wi)
            if oldc is None:
                oldc = Counter(zip(word, word[1:]))
            newc = Counter(zip(new, new[1:]))
            pair_cache[wi] = newc
            for p, c in oldc.items():
                d = c - newc.get(p, 0)
                if d > 0:
                    nc = pairs.get(p, 0) - d * f
                    if nc <= 0:
                        pairs.pop(p, None)
                    else:
                        pairs[p] = nc
                    dirty.add(p)
                    if p not in newc:
                        s = where.get(p)
                        if s is not None:
                            s.discard(wi)
            for p, c in newc.items():
                if p not in oldc:
                    pairs[p] = pairs.get(p, 0) + c * f
                    dirty.add(p)
                    where.setdefault(p, set()).add(wi)
                else:
                    d = c - oldc[p]
                    if d > 0:
                        pairs[p] = pairs.get(p, 0) + d * f
                        dirty.add(p)
            words[wi] = new
        # one live entry per surviving dirty pair at its FINAL count
        # (a pair retracted to zero just leaves its old entries stale)
        for p in dirty:
            c = pairs.get(p)
            if c is not None:
                heapq.heappush(heap, (-c, p))
        dirty.clear()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "auto",
    max_chain_merges: int = 128,
) -> DataFrame:
    """Apply an ordered BPE merge list to every document — the
    100 TB-scale half of the tokenizer.

    Two physical modes, same output byte-for-byte (differential-tested
    against each other and a pure-Python reference):

    - ``"chain"``: pure column algebra — split / transform / K plain
      ``replace`` calls, one per merge. No Python worker, whole-stage
      codegen. The plan grows LINEARLY in K, so this is the right
      shape only up to a plan-size budget — the same Catalyst cliff
      ``tokens_to_ids`` hit with literal vocab maps (measured: the
      chain is fine at 128 merges, minutes-of-analysis at 1k+;
      BASELINE.md 'BPE encode mode crossover').
    - ``"pandas"``: one ``mapInPandas`` pass; each Arrow batch encodes
      its DISTINCT words once (memoized — Zipf makes the hit rate
      high) with the sequential merge loop, cheap-rejecting merges
      whose concatenation isn't a substring of the word. Constant plan
      size at any vocabulary — the production shape for real (8k-50k
      merge) tokenizers.
    - ``"auto"`` (default): chain iff ``len(merges) <=
      max_chain_merges``.

    Output: ``(id_col, n_pieces, encoded)`` where ``encoded`` is the
    sentinel-delimited piece string (each piece as FS+piece+GS, words
    joined by spaces) — deterministic and engine-portable, so a DuckDB
    twin built from the same merge literals reproduces it
    byte-for-byte. Contract: input text must not contain the FS/GS
    control characters (ASCII 0x1C/0x1D; never present in natural
    text). Word boundaries are the explicit ASCII whitespace class
    ``[ \\t\\n\\r\\f]+`` — spelled out rather than ``\\s`` because the
    shorthand differs per engine (Java \\s adds \\x0B, Python str.split
    adds all Unicode spaces like NBSP); train, reference, encode, and
    the DuckDB oracle all share this one class, so pieces match
    byte-for-byte and an NBSP is part of its word everywhere."""
    if mode not in ("auto", "chain", "pandas"):
        raise ValueError(f"mode must be auto|chain|pandas, got {mode!r}")
    if mode == "auto":
        mode = "chain" if len(merges) <= max_chain_merges else "pandas"
    if mode == "pandas":
        return _bpe_encode_pandas(df, merges, text_col, id_col)
    words = F.filter(
        F.split(F.col(text_col), "[ \t\n\r\f]+"),
        lambda w: F.length(w) > 0,
    )
    wrap = lambda w: F.concat(  # noqa: E731
        F.lit(BPE_FS),
        F.concat_ws(BPE_GS + BPE_FS, F.split(w, "")),
        F.lit(BPE_GS),
    )
    s = F.concat_ws(" ", F.transform(words, wrap))
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(f"{BPE_FS}{a}{BPE_GS}{BPE_FS}{b}{BPE_GS}"),
            F.lit(f"{BPE_FS}{a}{b}{BPE_GS}"),
        )
    return df.select(
        F.col(id_col),
        (F.length(s) - F.length(F.replace(s, F.lit(BPE_FS), F.lit(""))))
        .cast("bigint")
        .alias("n_pieces"),
        s.alias("encoded"),
    )


def bpe_decode(
    df: DataFrame,
    encoded_col: str = "encoded",
    id_col: str = "doc_id",
) -> DataFrame:
    """Invert :func:`bpe_encode`'s sentinel-delimited piece string back
    to the whitespace-NORMALIZED source text — the detokenization half
    of the tokenizer, and the losslessness proof of the piece
    representation: pieces are ``FS+piece+GS`` with words joined by
    single spaces, and merges only ever CONCATENATE adjacent characters
    within a word, so stripping the two sentinels reconstructs the
    original words verbatim regardless of which merge table produced
    the encoding (decode is merge-table-INDEPENDENT). Exact up to the
    documented ``[ \\t\\n\\r\\f]+ -> ' '`` word-boundary normalization
    that tokenization itself applies; pure column algebra (two plain
    replaces), whole-stage codegen at any scale. Returns
    ``(id_col, text)``."""
    return df.select(
        F.col(id_col),
        F.replace(
            F.replace(F.col(encoded_col), F.lit(BPE_FS), F.lit("")),
            F.lit(BPE_GS),
            F.lit(""),
        ).alias("text"),
    )


def _bpe_encode_pandas(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str,
    id_col: str,
) -> DataFrame:
    """The constant-plan-size BPE encode: sequential merge loop per
    DISTINCT word, memoized per Arrow batch, with an ``a+b in word``
    substring pre-check that rejects the overwhelming majority of a
    large merge table in C before any piece loop runs. Emits the same
    sentinel-delimited string as the chain mode."""
    import re as _re

    import pandas as pd

    from etlutils_spark.sources.files import spread

    frozen = list(merges)
    ws = _re.compile(r"[ \t\n\r\f]+")
    # 2-char-prefix index over the merge table: a merge can only apply
    # to a word if its concatenation a+b occurs in the word as a
    # substring, which requires a+b's first two characters to be one of
    # the word's 2-grams. Grouping merges by that prefix lets each word
    # visit only the merges whose prefix it contains — ~|alphabet|^2 /
    # distinct-2-grams fewer substring checks per word at large merge
    # tables (the 1k-merge registrations scan a 32-char word against
    # 1024 merges otherwise), while the candidate list sorted by rank
    # preserves the sequential application order bit-for-bit.
    by2: dict[str, list[int]] = {}
    for k, (a, b) in enumerate(frozen):
        by2.setdefault((a + b)[:2], []).append(k)

    def encode_word(w: str) -> str:
        cand: set[int] = set()
        for i in range(len(w) - 1):
            lst = by2.get(w[i : i + 2])
            if lst is not None:
                cand.update(lst)
        pieces = list(w)
        for k in sorted(cand):
            a, b = frozen[k]
            if len(pieces) < 2:
                break
            if a + b not in w:
                continue
            out, i, n = [], 0, len(pieces)
            while i < n:
                if i + 1 < n and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            pieces = out
        return BPE_FS + (BPE_GS + BPE_FS).join(pieces) + BPE_GS

    def run(batches):
        memo: dict[str, str] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            encoded, counts = [], []
            for t in pdf[text_col]:
                parts = []
                n_pieces = 0
                for w in ws.split(t or ""):
                    if not w:
                        continue
                    e = memo.get(w)
                    if e is None:
                        e = memo[w] = encode_word(w)
                    parts.append(e)
                    n_pieces += e.count(BPE_FS)
                encoded.append(" ".join(parts))
                counts.append(n_pieces)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_pieces": pd.Series(counts, dtype="int64"),
                "encoded": encoded,
            })

    # id type DERIVED from the input schema (the png_roundtrip_stats
    # pattern): hardcoding 'long' broke the chain/pandas byte-for-byte
    # mode equivalence for string-id corpora — auto mode would silently
    # change the id type (or die in Arrow) past the merge-count
    # threshold (review catch)
    id_type = df.schema[id_col].dataType.simpleString()
    return spread(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, n_pieces bigint, encoded string"
    )


def bpe_encode_reference(text: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Pure-Python reference of the classic per-word greedy merge loop
    (for differential tests of bpe_encode's replace-chain)."""
    import re as _re

    out: list[str] = []
    for w in _re.split(r"[ \t\n\r\f]+", text):
        if not w:
            continue
        pieces = list(w)
        for a, b in merges:
            i, nxt = 0, []
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(pieces[i])
                    i += 1
            pieces = nxt
        out.extend(pieces)
    return out
