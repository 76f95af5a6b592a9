"""Corpus quality operators for training-data curation: threshold
filtering, repetition scoring, and PII redaction.

The reference has no text tier at all (SURVEY §2 — its scalar surface is
recoder/LOCF/factorise); these are the scale extensions a pretraining
pipeline runs between ingest and dedup. Everything here is pure Column
algebra (JVM-side, whole-stage codegen) — no Python in the hot path —
and every threshold is an explicit argument so the filter predicate
reaches the parquet scan when the inputs are stats columns.

Scale notes:
- quality_filter is a narrow map + filter: no shuffle, fully
  pushdown-friendly when run over a materialized stats table.
- repetition_stats shares the tokenizer with operators.text and stays
  one narrow projection (no explode — n-gram counting via aggregate over
  the token array), so it runs at scan speed.
- redact_pii is regexp_replace chains; regexes are anchored to simple
  character classes that mean the same thing in Java regex (Spark) and
  RE2 (DuckDB oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etlutils_spark.operators.text import TOKENS_COL, with_tokens

# (pattern, replacement) — dialect-portable: character classes + bounded
# repetition only, no lookaround (RE2 has none).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Per-document repetition: the fraction of word n-grams that are
    repeats of an earlier occurrence (1 - distinct/total), plus the
    top n-gram's share. High values flag boilerplate / degenerate docs
    (the dup-line heuristic of C4/Gopher rules, word-level).

    One narrow projection: n-grams come from the token array via
    transform+slice, counting via array ops — no explode, no shuffle.
    """
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    n_grams = F.size(grams).cast("bigint")
    n_distinct = F.size(F.array_distinct(grams)).cast("bigint")
    # top n-gram multiplicity: longest equal-run in the sorted gram array
    # (O(n log n) per row; a frequency map rebuild would be O(n^2))
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def _step(acc, g):
        run = F.when(acc["prev"] == g, acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            g.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_count = F.aggregate(F.array_sort(grams), init, _step, lambda acc: acc["best"])
    safe_total = F.greatest(n_grams, F.lit(1)).cast("double")
    return base.select(
        F.col(id_col),
        n_grams.alias("n_ngrams"),
        n_distinct.alias("n_distinct_ngrams"),
        ((n_grams - n_distinct).cast("double") / safe_total).alias("dup_ngram_ratio"),
        (F.coalesce(top_count, F.lit(0)).cast("double") / safe_total).alias(
            "top_ngram_share"
        ),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.05,
    max_avg_token_len: float = 12.0,
    keep_only: bool = False,
) -> DataFrame:
    """Gopher/C4-style rule filter. Emits one boolean per rule plus the
    conjunction ``passes`` (and, with ``keep_only=True``, just the
    surviving rows of the input).

    Rules are plain Column predicates — over a precomputed stats table
    they push down to the scan; over raw text they run in one codegen
    stage with the tokenizer."""
    from etlutils_spark.operators.text import STOPWORDS

    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    n_tokens = F.size(toks).cast("bigint")
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stopword_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast(
        "double"
    )
    avg_token_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    ).cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double")

    r_len = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    r_stop = stopword_ratio >= min_stopword_ratio
    r_tok = avg_token_len <= max_avg_token_len
    passes = r_len & r_stop & r_tok
    if keep_only:
        return base.filter(passes).drop(TOKENS_COL)
    return base.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        stopword_ratio.alias("stopword_ratio"),
        avg_token_len.alias("avg_token_len"),
        r_len.alias("pass_length"),
        r_stop.alias("pass_stopwords"),
        r_tok.alias("pass_token_len"),
        passes.alias("passes"),
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.80,
    min_required_stopwords: int = 2,
    keep_only: bool = False,
) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", App. A1.1) as per-rule flags
    plus the conjunction — the industry-standard pre-training filter,
    complementing :func:`quality_filter` (generic thresholds) with the
    paper's exact rules:

    - word count in [50, 100k]
    - mean word length in [3, 10]
    - symbol-to-word ratio <= 0.1 for EACH of ``#`` and ``...``
      (two independent tests, as the paper specifies)
    - >= 80% of words contain at least one alphabetic character
    - >= 2 of the paper's required stop words (the/be/to/of/and/that/
      have/with) appear

    ``keep_only=True`` returns just the surviving input rows (original
    columns) — the composition mode ``curate_documents`` uses: the
    rules stay plain Column predicates, so the filter fuses into the
    caller's scan stage with no join and no second pass.

    The paper's line-based rules (bullet-start / ellipsis-end line
    fractions) belong to the line tier (``line_boilerplate_removal``;
    this corpus ships no newlines) and are intentionally not replicated
    here. Everything is one codegen projection over the token array —
    counts via length/replace algebra and array folds, no explode, no
    shuffle, no Python."""
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    n_words = F.size(toks).cast("bigint")
    safe_n = F.greatest(n_words, F.lit(1)).cast("double")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    mean_word_len = total_chars.cast("double") / safe_n
    text = F.coalesce(F.col(text_col), F.lit(""))
    # non-overlapping occurrence counts via length/replace (portable:
    # identical semantics in DuckDB's replace)
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / F.lit(3)
    hash_ratio = n_hash.cast("double") / safe_n
    ellipsis_ratio = n_ellipsis.cast("double") / safe_n
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
    ).cast("bigint")
    alpha_frac = alpha_words.cast("double") / safe_n
    required = F.array(
        *[F.lit(w) for w in ("the", "be", "to", "of", "and", "that", "have", "with")]
    )
    n_required = F.size(F.filter(toks, lambda t: F.array_contains(required, t)))

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mwl = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    # the paper tests hash and ellipsis ratios INDEPENDENTLY (each
    # <= 0.1), not their sum
    r_sym = (hash_ratio <= max_symbol_ratio) & (
        ellipsis_ratio <= max_symbol_ratio
    )
    r_alpha = alpha_frac >= min_alpha_word_frac
    r_stop = n_required >= min_required_stopwords
    passes = r_words & r_mwl & r_sym & r_alpha & r_stop
    if keep_only:
        return base.filter(passes).drop(TOKENS_COL)
    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        hash_ratio.alias("hash_word_ratio"),
        ellipsis_ratio.alias("ellipsis_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_required.cast("bigint").alias("n_required_stopwords"),
        r_words.alias("pass_word_count"),
        r_mwl.alias("pass_mean_word_len"),
        r_sym.alias("pass_symbol_ratio"),
        r_alpha.alias("pass_alpha_words"),
        r_stop.alias("pass_required_stopwords"),
        passes.alias("passes"),
    )


def c4_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sentences: int = 3,
    blocklist: Sequence[str] = (),
    keep_only: bool = False,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, §2.2 — the
    "Colossal Clean Crawled Corpus" rules) as per-rule flags plus the
    conjunction, the companion to :func:`gopher_quality_flags` that
    real curation stacks (RefinedWeb/FineWeb lineage) run side by side:

    - text ends with terminal punctuation (``.`` ``!`` ``?`` ``"``)
    - at least ``min_sentences`` sentences (words ending ``.!?`` — the
      single-line analog of C4's 3-sentence page rule)
    - no blocklisted word (``blocklist`` param; C4 uses a public
      "bad words" list — empty default auto-passes)
    - no ``lorem ipsum``, no ``{`` (code marker), no ``javascript``
      (C4 drops pages with these markers)

    C4's line-level rules (per-line terminal punctuation, 3+ word
    lines) belong to the line tier; its three-sentence-span dedup is
    ``window_dedup_stats/rewrite``. One codegen projection — no
    explode, no shuffle, no Python."""
    base = with_tokens(df, text_col)
    toks = F.col(TOKENS_COL)
    text = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(text)
    # \z (end-of-TEXT, supported by both Java regex and RE2), not $:
    # Java's $ also matches before a trailing newline while RE2's does
    # not, so '$' silently diverges from the DuckDB oracle on any
    # corpus where text/tokens can end in '\n' (same portability class
    # as the \S vs [^ \t\n\r\f] fix — see PLANS.md regex rules).
    n_sentences = F.size(
        F.filter(toks, lambda t: t.rlike("[.!?]\\z"))
    ).cast("bigint")

    r_punct = text.rlike('[.!?"]\\z')
    r_sent = n_sentences >= min_sentences
    r_block = F.lit(True)
    for w in blocklist:
        r_block = r_block & ~lower.contains(w.lower())
    r_lorem = ~lower.contains("lorem ipsum")
    r_brace = ~text.contains("{")
    r_js = ~lower.contains("javascript")
    passes = r_punct & r_sent & r_block & r_lorem & r_brace & r_js
    if keep_only:
        # composition mode: the predicates fuse into the caller's scan
        return base.filter(passes).drop(TOKENS_COL)
    return base.select(
        F.col(id_col),
        n_sentences.alias("n_sentences"),
        r_punct.alias("pass_terminal_punct"),
        r_sent.alias("pass_min_sentences"),
        r_block.alias("pass_blocklist"),
        r_lorem.alias("pass_no_lorem"),
        r_brace.alias("pass_no_brace"),
        r_js.alias("pass_no_javascript"),
        passes.alias("passes"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Replace email / phone / IP literals with typed placeholder tokens
    and count the replacements per class. Pure regexp_replace chain —
    scan-speed, no shuffle; patterns are RE2-compatible so the DuckDB
    oracle computes the identical result."""
    out = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    redacted = F.col("__t")
    for pat, repl in patterns:
        name = repl.strip("<>").lower()
        counts.append(
            F.size(F.regexp_extract_all(redacted, F.lit(pat), 0))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, repl)
    return out.select(
        F.col(id_col), *counts, redacted.alias("redacted_text")
    )


def percentile_prune(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
    exact: bool = True,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quality pruning: keep the top ``keep_frac`` of rows in
    each ``group_col`` partition by ``score_col`` (ties broken by
    ``id_col`` — fully deterministic). The FineWeb-style curation move:
    a fixed global score threshold over-prunes low-resource domains, so
    the threshold is per-group.

    ``exact=True`` ranks with one window pass (row_number + count over
    the group): each group must sort, which shuffles on the group key —
    few, large groups, exactly the shape AQE's skew handling splits.
    Keeps ``greatest(1, floor(keep_frac * n))`` rows per group and emits
    ``grp_rank`` so the cut is auditable.

    ``exact=False`` is the 100 TB path: a per-group
    ``percentile_approx`` threshold (one aggregation, no sort) joined
    back broadcast, then a scan-speed ``score >= threshold`` filter.
    Rank-error is bounded by n/approx_accuracy; the kept fraction drifts
    by at most that. Engine-specific sketch -> pytest contract, not an
    oracle.
    """
    from pyspark.sql import Window

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    if exact:
        w = Window.partitionBy(group_col).orderBy(
            F.desc(score_col), F.col(id_col)
        )
        cw = Window.partitionBy(group_col)
        rn = F.row_number().over(w)
        n = F.count(F.lit(1)).over(cw)
        n_keep = F.greatest(F.lit(1).cast("bigint"),
                            F.floor(F.lit(keep_frac) * n))
        return (
            df.withColumn("grp_rank", rn.cast("bigint"))
            .withColumn("__n_keep", n_keep)
            .filter(F.col("grp_rank") <= F.col("__n_keep"))
            .drop("__n_keep")
        )
    thr = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, 1.0 - keep_frac, approx_accuracy)
        .alias("__thr")
    )
    # null-safe join: a NULL group is a group like any other — exact
    # mode's window partitions NULL together and prunes it, so a plain
    # equality join here would silently DROP every NULL-group row from
    # the approx mode instead of thresholding them (the cap_per_group
    # convention — review catch)
    thr = thr.withColumnRenamed(group_col, "__grp")
    return (
        df.join(
            F.broadcast(thr), F.col(group_col).eqNullSafe(F.col("__grp"))
        )
        .filter(F.col(score_col) >= F.col("__thr"))
        .drop("__grp", "__thr")
    )


def rank_blend(
    df: DataFrame,
    signal_cols: dict[str, bool],
    id_col: str = "doc_id",
    approx_buckets: int | None = None,
) -> DataFrame:
    """Blend several per-document quality signals into one composite
    percentile rank (the ensemble-filtering step: each signal on its
    own scale becomes a [0,1] rank, the blend is their mean — how
    multi-classifier curation pipelines combine scores without
    unit-calibrating them).

    ``signal_cols`` maps column -> higher_is_better. Exact mode (the
    registered, oracle-checked form): rank = (row_number-1)/(n-1) under
    (signal, id) ordering — the id tie-break makes every rank
    deterministic on any engine, and the divisions/mean are single IEEE
    ops. Each signal costs a global sort, fine up to dictionary scale.

    ``approx_buckets=B`` is the 100 TB mode (the percentile_prune
    pattern): ONE percentile_approx aggregation computes every
    signal's B-1 thresholds in a single pass, broadcast-cross-joined
    back (a 1-row frame of B doubles per signal); each row maps to its
    bucket index /B by counting cleared thresholds — no global sort.
    The thresholds stay IN the plan: an eager ``.first()`` collect
    here would run one driver job per signal at plan-construction time
    (the same plan-time-probe failure mode the NB hash_dim guard
    removed — review catch) and crash on an empty frame. Sketch
    thresholds are engine-specific, so this mode is verified by the
    registered ``rank_blend_approx_contract`` (within 1.5 bucket
    widths of the exact ranks, constant+monotone per value) rather
    than full-value oracle recompute.
    """
    if not signal_cols:
        raise ValueError("signal_cols must be a non-empty {col: higher_is_better}")
    if approx_buckets is not None and approx_buckets < 2:
        # mirror the ccnet_lm_buckets guard: 1 bucket yields an empty
        # threshold array (every rank silently 0 / 1.0), 0 divides by
        # zero (NaN ranks) — both are misconfigurations, not modes
        raise ValueError(
            f"approx_buckets must be >= 2, got {approx_buckets}: one "
            "bucket has no interior percentile thresholds so every "
            "blend_rank collapses to a constant"
        )
    rank_cols = []
    if approx_buckets is None:
        # n is an unpartitioned-window count, not a
        # crossJoin(broadcast(agg)): the agg form re-planned and re-ran
        # df's WHOLE subtree (here: every upstream signal pipeline) a
        # second time just to count it, while the window rides the
        # single-partition exchange the global rank windows below
        # already require — exact mode is documented dictionary-scale,
        # so that exchange is a given, not a new cost (guide §2.4).
        out = df.withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy())
        )
        denom = F.greatest(F.col("__n") - 1, F.lit(1)).cast("double")
        for c, hib in signal_cols.items():
            w = Window.orderBy(
                F.col(c).asc() if hib else F.col(c).desc(), F.col(id_col)
            )
            out = out.withColumn(
                f"rank_{c}",
                (F.row_number().over(w) - F.lit(1)).cast("double") / denom,
            )
            rank_cols.append(f"rank_{c}")
    else:
        probs = [i / approx_buckets for i in range(1, approx_buckets)]
        thr = df.agg(
            *[
                F.percentile_approx(c, probs, 10_000).alias(f"__t_{c}")
                for c in signal_cols
            ]
        )
        out = df.crossJoin(F.broadcast(thr))
        for c, hib in signal_cols.items():
            # percentile_approx over an ALL-NULL signal yields a NULL
            # threshold array, which would silently null every rank AND
            # the blend for the whole corpus (the old eager collect at
            # least crashed — review catch). The assert rides the rank
            # value: a non-empty frame with a dead signal fails loudly;
            # an EMPTY frame has no rows to evaluate it and stays a
            # clean empty result.
            arr_ok = F.assert_true(
                F.col(f"__t_{c}").isNotNull(),
                F.lit(
                    f"rank_blend: signal column {c!r} has no non-NULL "
                    "values — its percentile thresholds are undefined "
                    "and every blend_rank would be NULL; drop the dead "
                    "signal or fix the upstream join that nulled it"
                ),
            )
            bucket = F.size(
                F.filter(F.col(f"__t_{c}"), lambda t: t <= F.col(c))
            ).cast("double") / F.lit(float(approx_buckets))
            bucket = F.when(arr_ok.isNull(), bucket)
            out = out.withColumn(
                f"rank_{c}", bucket if hib else (F.lit(1.0) - bucket)
            )
            rank_cols.append(f"rank_{c}")
    acc = F.col(rank_cols[0])
    for rc in rank_cols[1:]:
        acc = acc + F.col(rc)
    return out.select(
        id_col, *rank_cols, (acc / F.lit(float(len(rank_cols)))).alias("blend_rank")
    )


def winsorize(
    df: DataFrame,
    column: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    group_col: str | None = None,
    suffix: str = "_w",
) -> DataFrame:
    """Rank-based winsorization: clip ``column`` to its [lower_q,
    upper_q] empirical quantile band — the standard outlier treatment
    before numeric features enter training (z-score flags merely mark;
    this repairs). Adds ``column + suffix``; original kept for audit.

    Thresholds are ORDER-STATISTIC values (the element at rank
    ``floor(q*(n-1))`` in sort order), not interpolated quantiles:
    interpolation arithmetic differs across engines in the last ulp,
    order statistics are engine-exact — the package's oracle
    convention. NULLs pass through unclipped and take no rank.

    Scale: one Window rank pass per group (or one global aggregate via
    the grouped form with a constant group), threshold rows broadcast
    back; with ``group_col`` the shuffle is the group key — the same
    single-Exchange shape as percentile_prune."""
    if not 0.0 <= lower_q <= upper_q <= 1.0:
        raise ValueError(f"need 0 <= lower_q <= upper_q <= 1, got "
                         f"({lower_q}, {upper_q})")
    gcol = group_col
    if gcol is None:
        df = df.withColumn("__wg", F.lit(1))
        gcol = "__wg"
    vals = df.filter(F.col(column).isNotNull()).select(
        F.col(gcol).alias("__g"), F.col(column).alias("__v")
    )
    w = Window.partitionBy("__g").orderBy("__v")
    ranked = vals.withColumn("__r", F.row_number().over(w) - 1)
    counts = vals.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    # null-safe joins throughout: a NULL group is a group like any
    # other (same contract as cap_per_group) — plain equality would
    # leave every NULL-group row unclipped
    ranked = ranked.join(
        F.broadcast(counts.withColumnRenamed("__g", "__gc")),
        F.col("__g").eqNullSafe(F.col("__gc")),
    ).drop("__gc")
    lo_r = F.floor(F.lit(lower_q) * (F.col("__n") - 1))
    hi_r = F.floor(F.lit(upper_q) * (F.col("__n") - 1))
    bounds = (
        ranked.filter((F.col("__r") == lo_r) | (F.col("__r") == hi_r))
        .groupBy("__g")
        .agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    )
    out = df.join(
        F.broadcast(bounds), F.col(gcol).eqNullSafe(F.col("__g")), "left"
    ).withColumn(
        column + suffix,
        F.when(F.col(column).isNull(), F.col(column))
        .otherwise(F.least(F.greatest(F.col(column), F.col("__lo")),
                           F.col("__hi"))),
    ).drop("__g", "__lo", "__hi")
    return out.drop("__wg") if group_col is None else out


def _nb_feature(tok: "F.Column", hash_dim: int | None) -> "F.Column":
    """Classifier feature key: the raw token (vocabulary mode), or the
    hashing-trick bucket (first 8 md5 hex chars as a 32-bit int, mod
    ``hash_dim``) — the portable-digest convention of
    ``dedup.simhash_signatures``, so any SQL engine computes the same
    buckets. Hashing bounds the MODEL at ``hash_dim`` rows regardless
    of vocabulary size — the guaranteed-broadcastable 100 TB mode; the
    cost is deliberate collision (multiple tokens share a bucket)."""
    if hash_dim is None:
        return tok
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % hash_dim
    )


def nb_token_weights(
    df: DataFrame,
    label: "F.Column",
    text_col: str = "text",
    hash_dim: int | None = None,
) -> DataFrame:
    """Train the token-weight table of a Naive-Bayes-style quality
    classifier (the DCLM / fastText-filter recipe: label a seed split,
    learn token likelihood ratios, score everything). ``label`` is a
    boolean Column marking the positive ("high quality") class — e.g.
    an existing heuristic flag, a curated-source indicator, or a
    benchmark-likeness bit.

    Output: one row per distinct token — ``(token, c_pos, c_neg,
    weight, hash_dim)`` (``hash_dim`` null in vocabulary mode — it
    stamps the feature space so the scorer can refuse a mismatched
    table) where ``weight`` is the Laplace-smoothed likelihood
    ratio ``P(tok|pos) / P(tok|neg)`` = ``((c_pos+1)/(N_pos+V)) /
    ((c_neg+1)/(N_neg+V))``. LOG-FREE on purpose (the rational-idf
    convention of ``search.bm25_topk`` / ``corpus_rarity_stats``):
    every weight is a fixed tree of IEEE divisions over exact integer
    counts, so the trained table is bit-identical on any engine and
    any partitioning — a libm log would differ in the last ulp.

    Scale: one explode + ONE combinable token-keyed aggregation; the
    class totals are a 1-row aggregate broadcast-cross-joined back.
    The weight table is vocabulary-sized (Heaps: ~sqrt of token mass)
    — or exactly ``hash_dim`` rows in hashing-trick mode (see
    :func:`_nb_feature`), the mode whose model broadcast is bounded by
    construction at any corpus size.
    """
    # NULL labels are EXCLUDED from training, not trained as negatives:
    # F.sum skips a NULL __pos but F.count counts the row, so without
    # this filter an unlabeled row (e.g. a label derived from a join
    # with misses) would silently inflate c_neg and skew every weight
    # (review catch). Rows the seed heuristic couldn't label carry no
    # signal either way.
    tok = with_tokens(df.filter(label.isNotNull()), text_col).select(
        label.cast("int").alias("__pos"),
        F.explode(
            F.transform(TOKENS_COL, lambda t: _nb_feature(t, hash_dim))
        ).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.sum("__pos").cast("bigint").alias("c_pos"),
        (F.count(F.lit(1)) - F.sum("__pos")).cast("bigint").alias("c_neg"),
    )
    # counts feeds BOTH the totals aggregate and the weight projection;
    # without a persist the explode + token-keyed shuffle (the only
    # data-sized exchange) runs twice per train (the same double-
    # execution the ccnet approx path fixed — review catch). The
    # persisted table is vocabulary-sized, not corpus-sized.
    from etlutils_spark.caching import persist_tracked

    counts = persist_tracked(counts)
    totals = counts.agg(
        F.sum("c_pos").cast("bigint").alias("__np"),
        F.sum("c_neg").cast("bigint").alias("__nn"),
        F.count(F.lit(1)).cast("bigint").alias("__v"),
    )
    # fixed expression tree: (c_pos+1)/(N_pos+V) / ((c_neg+1)/(N_neg+V))
    w = (
        (F.col("c_pos") + 1).cast("double")
        / (F.col("__np") + F.col("__v")).cast("double")
    ) / (
        (F.col("c_neg") + 1).cast("double")
        / (F.col("__nn") + F.col("__v")).cast("double")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token", "c_pos", "c_neg", w.alias("weight"),
            # the feature space is stamped twice: as a VALUE column (the
            # lazy in-plan assert in nb_classifier_scores rides it) and
            # as column METADATA (-1 = vocab mode), which lives in the
            # schema and therefore survives even a ZERO-ROW table —
            # the case the value-borne assert can never see (review
            # catch). Spark persists column metadata through parquet.
            F.lit(hash_dim).cast("int").alias(
                "hash_dim",
                metadata={"nb_hash_dim": -1 if hash_dim is None else hash_dim},
            ),
        )
    )


def nb_classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_weights: bool = True,
    hash_dim: int | None = None,
) -> DataFrame:
    """Score documents under a :func:`nb_token_weights` table — the
    inference half of the classifier-filter stage. Per doc:
    ``n_tokens`` (instances that hit the weight table), ``nb_score``
    (decimal-exact sum of per-instance likelihood ratios — the
    additive log-free stand-in for the NB product, same spirit as the
    rational idf), and ``mean_weight`` (= nb_score / n_tokens; > 1
    means the doc's vocabulary leans positive). Tokens absent from the
    weight table contribute nothing (inner join) — score foreign
    corpora with the training corpus's table and unseen tokens are
    neutral by construction.

    Scale: stateless scan + broadcast join (vocabulary-sized table) +
    one per-doc combinable aggregation; ``broadcast_weights=False``
    falls back to a shuffle join for web-scale vocabularies (AQE skew
    split handles stopword keys), the ``corpus_rarity_stats`` escape
    hatch. ``hash_dim`` must match the value the weight table was
    trained with — ENFORCED against the table's stamped ``hash_dim``
    column (two different dims produce type-compatible bucket ids that
    PARTIALLY join and yield plausible but wrong scores, so a silent
    mismatch is the failure mode here — review catch). The check is a
    LAZY null-safe assert fused into the weight projection, not a
    driver-side read: an eager ``.first()`` probe would execute the
    full training aggregation at plan-construction time (and once per
    micro-batch in the streaming wrapper — second review catch)."""
    tok = with_tokens(df, text_col).select(
        id_col,
        F.explode(
            F.transform(TOKENS_COL, lambda t: _nb_feature(t, hash_dim))
        ).alias("token"),
    )
    if "hash_dim" in weights.columns:
        # fast path: the train-time COLUMN METADATA stamp (-1 = vocab
        # mode) is schema-level, so it catches a mismatch eagerly with
        # zero jobs AND on a zero-row weight table — the case the
        # value-borne assert below can never evaluate (review catch)
        meta = weights.schema["hash_dim"].metadata or {}
        if "nb_hash_dim" in meta:
            trained = int(meta["nb_hash_dim"])
            asked = -1 if hash_dim is None else hash_dim
            if trained != asked:
                raise ValueError(
                    "nb_classifier_scores: weight table was trained with "
                    f"hash_dim={None if trained == -1 else trained} but "
                    f"scoring was asked for hash_dim={hash_dim} — the "
                    "feature spaces differ and a partial join would score "
                    "every document with wrong weights; pass the training "
                    "value"
                )
        # backstop for tables that lost the metadata (built by hand, or
        # round-tripped through an engine that drops Spark column
        # metadata). null-safe (<=>): vocab mode stamps NULL, which must
        # equal a hash_dim=None scoring call and mismatch any integer;
        # the assert rides the weight value so pruning can never drop it
        ok = F.col("hash_dim").eqNullSafe(
            F.lit(hash_dim).cast("int")
        )
        msg = F.concat(
            F.lit(
                "nb_classifier_scores: weight table was trained with "
                "hash_dim="
            ),
            F.coalesce(F.col("hash_dim").cast("string"), F.lit("None")),
            F.lit(
                f" but scoring was asked for hash_dim={hash_dim} — the "
                "feature spaces differ and a partial join would score "
                "every document with wrong weights; pass the training "
                "value"
            ),
        )
        weights = weights.select(
            "token",
            F.when(
                F.assert_true(ok, msg).isNull(), F.col("weight")
            ).alias("weight"),
        )
    w = F.broadcast(weights) if broadcast_weights else weights
    dec = F.col("weight").cast("decimal(30,12)")
    out = (
        tok.join(w.select("token", "weight"), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(dec).cast("double").alias("nb_score"),
        )
    )
    return out.select(
        id_col, "n_tokens", "nb_score",
        (F.col("nb_score") / F.col("n_tokens").cast("double"))
        .alias("mean_weight"),
    )
