"""Keyword search and statistical language-model scoring over a corpus.

Two operators extending the text tier (SURVEY.md §2 scale extensions;
the reference delegates all querying to a backend DB — R/ffsql.R:53-65
— so full-text relevance ranking is net-new surface, built the same
Spark-first way as the rest of the text tier):

- ``bm25_topk``: inverted-index BM25 relevance ranking for a literal
  query-term set. The classical formula's ``ln``-idf is replaced by the
  rational idf core ``(N - df + 0.5) / (df + 0.5)`` — ``ln`` is not
  required to be correctly rounded by IEEE 754, so log-based scores
  differ in the last ulp between libm implementations (JVM vs DuckDB),
  while ``+ * / sqrt`` are exact. Same per-term monotonicity and the
  same Robertson tf-saturation; documented deterministic variant (the
  module-wide convention — see ``corpus_rarity_stats``).
- ``bigram_lm_scores``: per-document mean bigram transition probability
  P(w_i | w_{i-1}) under the corpus's own maximum-likelihood bigram
  model. A log-free fluency score in the CCNet spirit (LM-scored
  quality filtering): every probability is an exact rational
  ``count/count`` evaluated as one IEEE division, and the per-doc mean
  accumulates in decimal, so scores are bit-identical on any engine and
  any partitioning.

Scale design (100 TB corpus):
- ``bm25_topk`` filters the exploded token stream to the query terms
  BEFORE any shuffle — only matching (doc, term) rows ever move, so
  cost is proportional to the posting lists of the query terms, not the
  corpus. The df table is at most |query| rows (broadcast); the
  doc-length side is a one-bigint-per-doc projection whose join AQE
  sizes at runtime (broadcast below the threshold, shuffle on the
  doc-id key at corpus scale — both sides are then already narrow).
  The global top-k compiles to TakeOrderedAndProject (per-partition
  top-k, k-row merge).
- ``bigram_lm_scores`` shuffles twice (bigram-count key, then doc key)
  like ``corpus_rarity_stats``; the count tables are vocabulary²-sized
  in the worst case, so broadcasting them is opt-in and OFF by default
  (``broadcast_model=False`` leaves the join strategy to AQE, which
  broadcasts the tables when their runtime size fits and skew-splits
  stopword contexts otherwise; pass True only when the model is known
  dictionary-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etlutils_spark.operators.text import TOKENS_COL, with_tokens

DEC = "decimal(30,12)"


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by (log-free) BM25.

    Output: (doc_id, bm25, n_terms_matched, rank), rank 1..k, ties
    broken by ``id_col``. Documents matching no term never enter the
    plan (inverted-index semantics).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    from etlutils_spark.caching import persist_tracked

    # toks feeds THREE unshared subtrees (stats agg, dl projection, tf
    # explode) — Catalyst does not dedupe common subtrees, so without
    # the persist one action scans and tokenizes the full corpus 3x
    # (review catch; the dedup.py shingle table follows the same
    # materialize-before-fan-out rule)
    toks = persist_tracked(
        with_tokens(df, text_col).select(
            F.col(id_col), F.col(TOKENS_COL).alias("__w")
        )
    )
    # corpus stats: one tiny row, broadcast everywhere
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(F.size("__w")).alias("__sum_dl"),
    )
    dl = toks.select(id_col, F.size("__w").alias("__dl"))
    # posting lists: filter to query terms BEFORE the groupBy shuffle
    tf = (
        toks.select(F.col(id_col), F.explode("__w").alias("__term"))
        .filter(F.col("__term").isin(*query_terms))
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = F.col("__n_docs").cast("double")
    dfd = F.col("__df").cast("double")
    tfd = F.col("__tf").cast("double")
    dld = F.col("__dl").cast("double")
    avgdl = F.col("__sum_dl").cast("double") / n_docs
    idf = (n_docs - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    tf_part = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), (idf * tf_part).cast(DEC).alias("__ts"))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("__ts").cast("double").alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k, then a k-row merge on the driver side of the exchange) —
    # a global row_number window would funnel EVERY candidate doc into
    # one partition instead. The rank window then runs on <= k rows.
    top = agg.orderBy(F.desc("bm25"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def duck_bm25_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``bm25_topk`` — identical operand tree (same cast
    points, same parenthesization) so every double is bit-identical."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(len(w)) AS DOUBLE) AS sum_dl
      FROM toks
    ),
    dl AS (SELECT {id_col}, CAST(len(w) AS DOUBLE) AS dl FROM toks),
    tf AS (
      SELECT {id_col}, t.term AS term, CAST(count(*) AS DOUBLE) AS tf
      FROM toks, unnest(w) AS t(term)
      WHERE t.term IN ({terms})
      GROUP BY {id_col}, t.term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.{id_col},
             CAST(((n_docs - df + 0.5) / (df + 0.5))
                  * ((tf * CAST({k1 + 1.0!r} AS DOUBLE))
                     / (tf + CAST({k1!r} AS DOUBLE)
                          * (CAST({1.0 - b!r} AS DOUBLE)
                             + CAST({b!r} AS DOUBLE) * (dl / (sum_dl / n_docs)))))
                  AS DECIMAL(30,12)) AS ts
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING ({id_col})
      CROSS JOIN stats
    ),
    agg AS (
      SELECT {id_col},
             CAST(SUM(ts) AS DOUBLE) AS bm25,
             CAST(count(*) AS BIGINT) AS n_terms_matched
      FROM scored GROUP BY {id_col}
    )
    SELECT {id_col}, bm25, n_terms_matched, rank FROM (
      SELECT *, CAST(row_number() OVER (ORDER BY bm25 DESC, {id_col}) AS INT) AS rank
      FROM agg
    ) WHERE rank <= {k}
    """


def bigram_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    carry: list[str] | None = None,
) -> DataFrame:
    """One row per in-document bigram occurrence: (id[, carry...],
    __ctx, __nxt). ``carry`` columns (e.g. a language key for
    per-language models) ride the explode instead of being re-joined
    onto bigram mass afterwards.

    Built with array index algebra (``sequence`` over the materialized
    token array, like ``shingles_from_tokens``) — zero Python, one
    explode. Docs under 2 tokens contribute nothing (greatest guard:
    Spark ``sequence(1, 0)`` is DESCENDING, unlike DuckDB's empty
    ``generate_series``)."""
    toks = with_tokens(df, text_col)
    w = F.col(TOKENS_COL)
    idx = F.sequence(F.lit(1), F.size(w) - 1)
    pairs = F.transform(idx, lambda i: F.struct(
        F.element_at(w, i).alias("c"), F.element_at(w, i + 1).alias("n")
    ))
    # Spark sequence(1, 0) is DESCENDING ([1, 0]) unlike DuckDB's empty
    # generate_series — guard exactly like shingles_from_tokens
    empty = F.array().cast("array<struct<c:string,n:string>>")
    guarded = F.when(F.size(w) >= 2, pairs).otherwise(empty)
    extra = [F.col(c) for c in (carry or [])]
    return (
        toks.select(F.col(id_col), *extra, F.explode(guarded).alias("__bg"))
        .select(
            id_col, *(carry or []),
            F.col("__bg.c").alias("__ctx"), F.col("__bg.n").alias("__nxt"),
        )
    )


def _bigram_lm_scored(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_cols: list[str],
    broadcast_model: bool,
    with_min: bool,
) -> DataFrame:
    """ONE exact-rational bigram scoring pipeline for both the
    corpus-wide and the per-group (CCNet per-language) forms: the
    model's count keys and the per-doc grouping are extended by
    ``group_cols``, and every numeric convention (one IEEE division
    per transition, decimal-accumulated mean) lives HERE once — the
    two public faces must not be able to drift numerically."""
    from etlutils_spark.caching import persist_tracked

    # bg feeds THREE unshared subtrees (both model aggs + the join
    # base) — without the persist one action re-runs read + tokenize +
    # explode over the whole corpus 3x (review catch; same rule as the
    # bm25 token table).
    # The model lookups are pure equality on (group, ctx[, next]), so
    # the persisted stream narrows the strings to 8-byte xxhash64 keys
    # at the explode (guide §2.3): __ck hashes the context (c1's key),
    # __bk the full transition (c2's key). Counts — and therefore every
    # probability — are identical unless xxhash64 collides within one
    # model key space (~2^-64, the same documented trade as
    # jaccard_pairs' join key).
    ck = F.xxhash64(*group_cols, "__ctx")
    bk = F.xxhash64(*group_cols, "__ctx", "__nxt")
    bg = persist_tracked(
        bigram_rows(df, text_col, id_col, carry=group_cols or None).select(
            F.col(id_col), *[F.col(c) for c in group_cols],
            ck.alias("__ck"), bk.alias("__bk"),
        )
    )
    # Build the MODEL first — count/count joined on the distinct-bigram
    # table, which is vocabulary-sized — then attach it to the bigram
    # mass with ONE join (guide §2.4): the old shape joined bg with c2
    # and then c1 separately, shuffling the full bigram mass twice
    # (once per key) wherever the model outgrows a broadcast.
    c2 = bg.groupBy("__ck", "__bk").agg(F.count(F.lit(1)).alias("__n2"))
    c1 = bg.groupBy("__ck").agg(F.count(F.lit(1)).alias("__n1"))
    model = c2.join(c1, "__ck").select("__bk", "__n2", "__n1")
    if broadcast_model:
        model = F.broadcast(model)
    prob = F.col("__n2").cast("double") / F.col("__n1").cast("double")
    proj = [F.col(id_col), *[F.col(c) for c in group_cols],
            prob.cast(DEC).alias("__p")]
    aggs = [
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("__p").cast("double") / F.count(F.lit(1)))
        .alias("avg_bigram_prob"),
    ]
    if with_min:
        proj.append(prob.alias("__pd"))
        aggs.append(F.min("__pd").alias("min_bigram_prob"))
    return (
        bg.join(model, "__bk")
        .select(*proj)
        .groupBy(id_col, *group_cols)
        .agg(*aggs)
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document fluency under the corpus's own ML bigram model.

    Columns: ``n_bigrams``, ``avg_bigram_prob`` (decimal-exact mean of
    P(next | ctx) = c(ctx,next)/c(ctx as context)), ``min_bigram_prob``
    (the single most surprising transition — order-independent MIN).
    Low mean/min flags shuffled or machine-garbled text whose word
    transitions never occur elsewhere in the corpus. Docs with < 2
    tokens have no bigrams and are absent from the output (documented;
    mirror keeps the same inner-join shape)."""
    return _bigram_lm_scored(
        df, text_col, id_col, [], broadcast_model, with_min=True
    )


def ccnet_lm_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    mode: str = "exact",
    broadcast_model: bool = False,
) -> DataFrame:
    """CCNet-style LM quality bucketing (Wenzek et al. 2020): score
    each document under ITS OWN LANGUAGE's bigram model, then split
    each language into ``n_buckets`` fluency tiers (bucket 1 = most
    fluent "head", the slice CCNet keeps preferentially; 3 = "tail").
    The per-language model is the same exact-rational construction as
    :func:`bigram_lm_scores` — P(next | ctx) = count/count evaluated
    as one IEEE division, per-doc mean accumulated in decimal — so
    scores and buckets are bit-identical cross-engine. Docs with < 2
    tokens have no bigrams and are absent (same contract as
    ``bigram_lm_scores``).

    Output: ``(id, lang, n_bigrams, avg_bigram_prob, lm_bucket)``.

    ``mode="exact"`` ranks with an NTILE window per language
    (deterministic tie-break on id) — one global sort per language, the
    dictionary-scale mode an oracle can mirror exactly.
    ``mode="approx"`` replaces the sort with per-language
    percentile_approx thresholds broadcast back onto a stateless
    compare — the 100 TB path (no per-language global sort; same
    pattern as ``quality.percentile_prune``'s sketch mode), at the
    cost of sketch-grade bucket boundaries.

    Scale: the model aggregations key on xxhash64(lang, ctx[, next]) —
    same shuffle shape as the corpus-wide model, with language folded
    into the 8-byte key; the scored table is one narrow row per doc."""
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be exact|approx, got {mode!r}")
    # guard next to the mode check (review catch: n_buckets=1 built
    # percentile_approx with an EMPTY percentage array in approx mode
    # while exact mode worked, and n_buckets<1 died as a deep ntile
    # AnalysisException instead of a loud ValueError)
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if n_buckets == 1 and mode == "approx":
        raise ValueError(
            "n_buckets=1 has no thresholds to sketch — every doc is "
            "bucket 1; use mode='exact' (or more buckets)"
        )
    scored = _bigram_lm_scored(
        df, text_col, id_col, [lang_col], broadcast_model, with_min=False
    )
    if mode == "exact":
        w = Window.partitionBy(lang_col).orderBy(
            F.desc("avg_bigram_prob"), F.col(id_col)
        )
        return scored.withColumn("lm_bucket", F.ntile(n_buckets).over(w))
    # approx consumes the scored frame twice (threshold sketch + final
    # compare); without a persist the whole bigram scoring pipeline
    # (explode + two model aggs + two joins) runs twice
    from etlutils_spark.caching import persist_tracked

    scored = persist_tracked(scored)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    thresholds = scored.groupBy(lang_col).agg(
        F.percentile_approx("avg_bigram_prob", qs).alias("__t")
    )
    # bucket 1 = most fluent: count how many tier thresholds the score
    # clears (>=, so threshold-equal scores take the better bucket —
    # with heavy ties a strict > would push the entire modal mass into
    # the tail)
    bucket = F.lit(n_buckets) - F.aggregate(
        F.col("__t"),
        F.lit(0),
        lambda acc, t: acc
        + F.when(F.col("avg_bigram_prob") >= t, 1).otherwise(0),
    )
    return scored.join(F.broadcast(thresholds), lang_col).select(
        id_col, lang_col, "n_bigrams", "avg_bigram_prob",
        bucket.cast("int").alias("lm_bucket"),
    )


def duck_ccnet_lm_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> str:
    """DuckDB twin of ``ccnet_lm_buckets(mode="exact")`` (same operand
    tree, same NTILE ordering incl. the id tie-break)."""
    return f"""
    WITH toks AS (
      SELECT {id_col}, {lang_col}, string_split({text_col}, ' ') AS w
      FROM {table}
    ),
    bg AS (
      SELECT {id_col}, {lang_col}, w[g.i] AS ctx, w[g.i + 1] AS nxt
      FROM toks, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS g(i)
    ),
    c2 AS (SELECT {lang_col}, ctx, nxt, count(*) AS n2
           FROM bg GROUP BY {lang_col}, ctx, nxt),
    c1 AS (SELECT {lang_col}, ctx, count(*) AS n1
           FROM bg GROUP BY {lang_col}, ctx),
    scored AS (
      SELECT {id_col}, {lang_col},
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE)
                           AS DECIMAL(30,12))) AS DOUBLE) / count(*)
               AS avg_bigram_prob
      FROM bg JOIN c2 USING ({lang_col}, ctx, nxt)
              JOIN c1 USING ({lang_col}, ctx)
      GROUP BY {id_col}, {lang_col}
    )
    SELECT {id_col}, {lang_col}, n_bigrams, avg_bigram_prob,
           CAST(ntile({n_buckets}) OVER (
             PARTITION BY {lang_col}
             ORDER BY avg_bigram_prob DESC, {id_col}) AS INT) AS lm_bucket
    FROM scored
    """


def duck_bigram_lm_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of ``bigram_lm_scores`` (same operand tree)."""
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
    ),
    bg AS (
      SELECT {id_col}, w[g.i] AS ctx, w[g.i + 1] AS nxt
      FROM toks, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS g(i)
    ),
    c2 AS (SELECT ctx, nxt, count(*) AS n2 FROM bg GROUP BY ctx, nxt),
    c1 AS (SELECT ctx, count(*) AS n1 FROM bg GROUP BY ctx)
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         AS DECIMAL(30,12))) AS DOUBLE) / count(*)
             AS avg_bigram_prob,
           MIN(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS min_bigram_prob
    FROM bg JOIN c2 USING (ctx, nxt) JOIN c1 USING (ctx)
    GROUP BY {id_col}
    """
