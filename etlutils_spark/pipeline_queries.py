"""Oracle-checked queries for the curation tier: deterministic
sampling / sharding, quality filtering, repetition scoring, PII
redaction, and sequence packing over the documents table.

Every operator here is hash-deterministic (md5 portable-hash domain), so
the DuckDB oracle reproduces it bit-for-bit — including the samples,
which is the point: an auditable pipeline's sample is a pure function of
the key, not an RNG state.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etlutils_spark.entry_queries import REGISTRY, _t, register
from etlutils_spark.operators.text import corpus_rarity_stats
from etlutils_spark.operators.quality import (
    PII_PATTERNS,
    quality_filter,
    redact_pii,
    repetition_stats,
)
from etlutils_spark.operators.sampling import (
    cap_per_group,
    hash_sample,
    mixture_resample,
    pack_sequences,
    rate_threshold_hex,
    shard_stats,
    stratified_sample,
)

# ---- deterministic sampling ------------------------------------------------

_SAMPLE_RATE = 0.1
_STRATA_RATES = {"en": 0.05, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 1.0}


@register(
    "source_cap_sample",
    """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 10
    """,
)
def q_source_cap_sample(spark, sf_dir):
    """Per-source cap (web-curation per-domain cap): keep at most 10
    docs per source, selected by key-digest order — deterministic under
    re-runs/repartitioning, like every sampler here. Exact window mode;
    the approx digest-threshold mode is the no-skew path for hot
    domains at web scale (operators/sampling.py::cap_per_group)."""
    return cap_per_group(
        _t(spark, sf_dir, "documents"), cap=10, group_col="source"
    ).select("doc_id", "lang", "source")


@register(
    "lang_cap_approx",
    """
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN counts c ON d.lang IS NOT DISTINCT FROM c.lang
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
               AS BIGINT)
          < CASE WHEN c.n <= 70 THEN 1152921504606846976
                 ELSE CAST(floor(70 / c.n * 1152921504606846976.0) AS BIGINT)
                 END
    """,
)
def q_lang_cap_approx(spark, sf_dir):
    """``cap_per_group(approx=True)`` — the no-window, no-skew cap for
    hot groups at web scale — as a FULL-VALUE oracle query (r12,
    completing the exact→approx parity sweep): the digest threshold is
    pure md5 + one IEEE division chain, so DuckDB recomputes the exact
    kept set value-for-value (no tolerance contract needed, unlike the
    percentile-sketch modes). cap=70 on lang exercises BOTH branches
    at sf0.01: en/zh/es exceed the cap (digest-threshold filter,
    ~±sqrt(cap) binomial noise around 70), de sits exactly AT it and
    fr under it (kept whole exactly — the n <= cap branch). The plan
    is one combinable count agg broadcast back onto a stateless scan
    filter — no per-group sort, the shape that survives a 10^9-doc
    domain."""
    return cap_per_group(
        _t(spark, sf_dir, "documents"), cap=70, group_col="lang",
        approx=True,
    ).select("doc_id", "lang", "source")


@register(
    "sample_hash_10pct",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) < '{rate_threshold_hex(_SAMPLE_RATE)}'
    """,
)
def q_sample_hash(spark, sf_dir):
    """Deterministic 10% sample: digest-threshold predicate, no RNG.
    Scale: stateless row filter — scan-speed, no shuffle, reproducible
    under any partitioning or retry."""
    return hash_sample(_t(spark, sf_dir, "documents"), _SAMPLE_RATE).select(
        "doc_id", "lang", "source"
    )


def _strata_case() -> str:
    arms = "\n".join(
        f"WHEN '{k}' THEN '{rate_threshold_hex(r)}'"
        for k, r in sorted(_STRATA_RATES.items())
    )
    return f"CASE lang {arms} ELSE '{rate_threshold_hex(0.0)}' END"


@register(
    "sample_stratified_lang",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) < {_strata_case()}
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Language-rebalancing sample: per-stratum deterministic rates
    (head language downsampled 20x, tail kept whole)."""
    return stratified_sample(
        _t(spark, sf_dir, "documents"), "lang", _STRATA_RATES
    ).select("doc_id", "lang", "source")


@register(
    "shard_manifest",
    """
    WITH sharded AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 16 AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents)
    SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS min_key, max(doc_id) AS max_key
    FROM sharded GROUP BY 1
    """,
)
def q_shard_manifest(spark, sf_dir):
    """Deterministic 16-way shard assignment + per-shard manifest
    (docs, token mass, key range) — the balance check before an export
    commits its layout. One partial-aggregated groupBy on a uniform
    hash key."""
    return shard_stats(_t(spark, sf_dir, "documents"), 16)


# ---- quality ---------------------------------------------------------------

_STOP_LIST = "['the', 'a', 'of', 'and', 'to', 'in']"


@register(
    "quality_filter_flags",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    m AS (
      SELECT doc_id,
             len(w) AS n_tokens,
             len(list_filter(w, t -> list_contains({_STOP_LIST}, t))) AS n_stop,
             list_sum(list_transform(w, t -> len(t))) AS sum_len
      FROM toks)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
           CAST(sum_len AS DOUBLE) / greatest(n_tokens, 1) AS avg_token_len,
           n_tokens >= 20 AND n_tokens <= 100000 AS pass_length,
           CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05 AS pass_stopwords,
           CAST(sum_len AS DOUBLE) / greatest(n_tokens, 1) <= 12.0 AS pass_token_len,
           (n_tokens >= 20 AND n_tokens <= 100000)
             AND CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05
             AND CAST(sum_len AS DOUBLE) / greatest(n_tokens, 1) <= 12.0 AS passes
    FROM m
    """,
)
def q_quality_filter(spark, sf_dir):
    """Gopher/C4-style rule filter: per-rule booleans + conjunction.
    Pure Column predicates — pushes to the scan over a stats table."""
    return quality_filter(_t(spark, sf_dir, "documents"))


@register(
    "gopher_quality_docs",
    r"""
    WITH toks AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    m AS (
      SELECT doc_id,
             len(w) AS n_words,
             greatest(len(w), 1) AS safe_n,
             list_sum(list_transform(w, t -> len(t))) AS sum_len,
             len(text) - len(replace(text, '#', '')) AS n_hash,
             (len(text) - len(replace(text, '...', ''))) / 3 AS n_ell,
             len(list_filter(w, t -> regexp_matches(t, '[a-zA-Z]')))
               AS alpha_words,
             len(list_filter(w, t -> list_contains(
               ['the','be','to','of','and','that','have','with'], t)))
               AS n_req
      FROM toks),
    f AS (
      SELECT doc_id, n_words,
             CAST(sum_len AS DOUBLE) / safe_n AS mean_word_len,
             CAST(n_hash AS DOUBLE) / safe_n AS hash_word_ratio,
             CAST(n_ell AS DOUBLE) / safe_n AS ellipsis_word_ratio,
             CAST(alpha_words AS DOUBLE) / safe_n AS alpha_word_frac,
             n_req
      FROM m)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           mean_word_len,
           hash_word_ratio,
           ellipsis_word_ratio,
           alpha_word_frac,
           CAST(n_req AS BIGINT) AS n_required_stopwords,
           n_words >= 50 AND n_words <= 100000 AS pass_word_count,
           mean_word_len >= 3.0 AND mean_word_len <= 10.0
             AS pass_mean_word_len,
           hash_word_ratio <= 0.1 AND ellipsis_word_ratio <= 0.1
             AS pass_symbol_ratio,
           alpha_word_frac >= 0.80 AS pass_alpha_words,
           n_req >= 2 AS pass_required_stopwords,
           (n_words >= 50 AND n_words <= 100000)
             AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
             AND (hash_word_ratio <= 0.1 AND ellipsis_word_ratio <= 0.1)
             AND alpha_word_frac >= 0.80
             AND n_req >= 2 AS passes
    FROM f
    """,
)
def q_gopher_quality(spark, sf_dir):
    """The published Gopher rule set (Rae et al. 2021, App. A1.1) as
    per-rule flags + conjunction over the corpus — word-count band,
    mean-word-length band, symbol-to-word ratio, alpha-word fraction,
    required stop words. One codegen projection; the oracle mirrors
    the operand order so every double is bit-identical."""
    from etlutils_spark.operators.quality import gopher_quality_flags

    return gopher_quality_flags(_t(spark, sf_dir, "documents"))


@register(
    "c4_quality_docs",
    r"""
    WITH toks AS (
      SELECT doc_id, text, lower(text) AS lt,
             string_split(text, ' ') AS w
      FROM documents),
    m AS (
      SELECT doc_id,
             len(list_filter(w, t -> regexp_matches(t, '[.!?]\z')))
               AS n_sentences,
             regexp_matches(text, '[.!?"]\z') AS r_punct,
             NOT contains(lt, 'lorem ipsum') AS r_lorem,
             NOT contains(text, '{') AS r_brace,
             NOT contains(lt, 'javascript') AS r_js,
             NOT contains(lt, 'spam') AND NOT contains(lt, 'casino')
               AS r_block
      FROM toks)
    SELECT doc_id,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           r_punct AS pass_terminal_punct,
           n_sentences >= 3 AS pass_min_sentences,
           r_block AS pass_blocklist,
           r_lorem AS pass_no_lorem,
           r_brace AS pass_no_brace,
           r_js AS pass_no_javascript,
           r_punct AND n_sentences >= 3 AND r_block AND r_lorem
             AND r_brace AND r_js AS passes
    FROM m
    """,
)
def q_c4_quality(spark, sf_dir):
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2) over the
    corpus, with a two-term demo blocklist exercising the blocklist
    rule (C4 ships a public bad-words list; the rule shape is what is
    under test). Stateless scan-speed predicates end to end."""
    from etlutils_spark.operators.quality import c4_quality_flags

    return c4_quality_flags(
        _t(spark, sf_dir, "documents"), blocklist=("spam", "casino")
    )


NB_LABEL_CHARS = 300  # median n_chars at bench SFs -> balanced classes

# shared by nb_quality_classifier and its streaming twin (the scorer
# is stateless per doc, so stream == batch at the value level)
NB_ORACLE_SQL = f"""
    WITH toks AS (
      SELECT doc_id, n_chars >= {NB_LABEL_CHARS} AS pos,
             UNNEST(string_split(text, ' ')) AS token
      FROM documents),
    tc AS (
      SELECT token,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
      FROM toks GROUP BY token),
    tot AS (
      SELECT SUM(c_pos) AS np, SUM(c_neg) AS nn, COUNT(*) AS v FROM tc),
    w AS (
      SELECT token,
             (CAST(c_pos + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))
               / (CAST(c_neg + 1 AS DOUBLE) / CAST(nn + v AS DOUBLE))
               AS weight
      FROM tc, tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(weight AS DECIMAL(30,12))) AS DOUBLE) AS nb_score,
           CAST(SUM(CAST(weight AS DECIMAL(30,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_weight
    FROM toks JOIN w USING (token)
    GROUP BY doc_id
    """


@register("nb_quality_classifier", NB_ORACLE_SQL)
def q_nb_quality_classifier(spark, sf_dir):
    """The classifier-filter stage of a DCLM/fastText-style curation
    pipeline: train Laplace-smoothed Naive-Bayes token likelihood
    ratios against a seed labeling (here the length heuristic n_chars
    >= 300 — any boolean Column works: curated-source flags,
    benchmark-likeness bits), then score every document as the
    decimal-exact sum of its tokens' ratios. LOG-FREE (the rational
    convention of bm25/corpus_rarity): weights are fixed IEEE division
    trees over exact integer counts, so train AND inference are
    bit-identical cross-engine — the oracle re-derives the entire
    model in SQL. Scale: one explode + one token-keyed combinable agg
    (train) + vocabulary-sized broadcast join + per-doc agg (score)."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    weights = nb_token_weights(
        docs, label=F.col("n_chars") >= NB_LABEL_CHARS
    )
    return nb_classifier_scores(docs, weights)


@register("streaming_nb_scoring", NB_ORACLE_SQL)
def q_streaming_nb_scoring(spark, sf_dir):
    """The classifier-filter stage under Structured Streaming: train
    the NB weight table ONCE on the batch corpus (the frozen offline
    model — how classifier filters deploy: train on a seed snapshot,
    score the firehose), then replay the corpus as 3 ordered
    micro-batches whose foreachBatch body IS ``nb_classifier_scores``
    with the broadcast weights — one shared code path, no streaming
    re-implementation. Scoring is stateless per doc (each doc's tokens
    live in one micro-batch), so stream == batch at the value level;
    the oracle is the SAME full-model SQL as ``nb_quality_classifier``,
    pinning that equality cross-engine."""
    import os
    import shutil

    from etlutils_spark.caching import persist_tracked
    from etlutils_spark.extension_queries import _sliced_stream
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    # trained once, consumed by every micro-batch: persist, or each
    # batch re-runs the train aggregation
    weights = persist_tracked(
        nb_token_weights(docs, label=F.col("n_chars") >= NB_LABEL_CHARS)
    )
    root = _rt_path(spark, "stream_nb")
    shutil.rmtree(root, ignore_errors=True)
    stream = _sliced_stream(spark, docs, root, n_slices=3)
    out = os.path.join(root, "scored")

    def sink(batch_df, epoch_id):
        nb_classifier_scores(batch_df, weights).write.mode(
            "append"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


NB_HASH_DIM = 1024


@register(
    "nb_classifier_hashed",
    f"""
    WITH toks AS (
      SELECT doc_id, n_chars >= {NB_LABEL_CHARS} AS pos,
             ('0x' || substring(md5(tok), 1, 8))::BIGINT % {NB_HASH_DIM}
               AS token
      FROM (SELECT doc_id, n_chars,
                   UNNEST(string_split(text, ' ')) AS tok
            FROM documents)),
    tc AS (
      SELECT token,
             SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
      FROM toks GROUP BY token),
    tot AS (
      SELECT SUM(c_pos) AS np, SUM(c_neg) AS nn, COUNT(*) AS v FROM tc),
    w AS (
      SELECT token,
             (CAST(c_pos + 1 AS DOUBLE) / CAST(np + v AS DOUBLE))
               / (CAST(c_neg + 1 AS DOUBLE) / CAST(nn + v AS DOUBLE))
               AS weight
      FROM tc, tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(weight AS DECIMAL(30,12))) AS DOUBLE) AS nb_score,
           CAST(SUM(CAST(weight AS DECIMAL(30,12))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_weight
    FROM toks JOIN w USING (token)
    GROUP BY doc_id
    """,
)
def q_nb_classifier_hashed(spark, sf_dir):
    """The hashing-trick mode of the NB classifier filter: tokens map
    to {NB_HASH_DIM}-bucket features (first 8 md5 hex chars as a
    32-bit int, the portable-digest convention of dedup.simhash), so
    the MODEL is bounded at hash_dim rows regardless of vocabulary —
    the guaranteed-broadcastable 100 TB inference mode (a raw
    web-scale vocabulary can exceed executor memory; 1024 buckets
    never do). Collisions are the documented trade; weights/scores
    remain bit-identical cross-engine because the bucket hash itself
    is portable."""
    from etlutils_spark.operators.quality import (
        nb_classifier_scores,
        nb_token_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    weights = nb_token_weights(
        docs, label=F.col("n_chars") >= NB_LABEL_CHARS,
        hash_dim=NB_HASH_DIM,
    )
    return nb_classifier_scores(docs, weights, hash_dim=NB_HASH_DIM)


@register(
    "text_repetition",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                            i -> concat_ws(' ', w[i], w[i+1])) AS grams
      FROM toks),
    ex AS (SELECT doc_id, gr FROM g, UNNEST(grams) AS t(gr)),
    cnt AS (SELECT doc_id, gr, count(*) AS c FROM ex GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_ngrams,
             CAST(MAX(c) AS BIGINT) AS top
      FROM cnt GROUP BY 1)
    SELECT doc_id, n_ngrams, n_distinct_ngrams,
           CAST(n_ngrams - n_distinct_ngrams AS DOUBLE)
             / greatest(n_ngrams, 1) AS dup_ngram_ratio,
           CAST(top AS DOUBLE) / greatest(n_ngrams, 1) AS top_ngram_share
    FROM agg
    """,
)
def q_text_repetition(spark, sf_dir):
    """Word-bigram repetition score (C4/Gopher dup-fraction rule).
    No explode: n-gram counting is array algebra inside one narrow
    projection, so the corpus scan stays one codegen stage."""
    return repetition_stats(_t(spark, sf_dir, "documents"))


# ---- PII redaction ---------------------------------------------------------

# deterministic synthetic PII (the corpus is synthetic lowercase words;
# augmenting from doc_id exercises every pattern class identically on
# both engines)
_AUG_SPARK = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com"
    " or 555-123-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),"
    " ' from 10.0.', CAST(doc_id % 256 AS STRING), '.1')"
)
_AUG_DUCK = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com"
    " or 555-123-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),"
    " ' from 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1')"
)


def _duck_redact_sql() -> str:
    stages = [f"SELECT doc_id, {_AUG_DUCK} AS t0 FROM documents"]
    prev = "t0"
    counts = []
    for i, (pat, repl) in enumerate(PII_PATTERNS):
        name = repl.strip("<>").lower()
        counts.append(f"n_{name}")
        stages.append(
            f"SELECT *, CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT)"
            f" AS n_{name},"
            f" regexp_replace({prev}, '{pat}', '{repl}', 'g') AS t{i + 1}"
            f" FROM s{i}"
        )
        prev = f"t{i + 1}"
    ctes = ",\n".join(f"s{i} AS ({q})" for i, q in enumerate(stages))
    return (
        f"WITH {ctes}\n"
        f"SELECT doc_id, {', '.join(counts)}, {prev} AS redacted_text"
        f" FROM s{len(stages) - 1}"
    )


@register("text_redact_pii", _duck_redact_sql())
def q_text_redact_pii(spark, sf_dir):
    """Email/phone/IP redaction with per-class counts over text
    augmented with deterministic synthetic PII. regexp chain only —
    scan-speed; patterns are RE2-compatible so both engines agree."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_AUG_SPARK).alias("text")
    )
    return redact_pii(docs)


# ---- sequence packing ------------------------------------------------------

_PACK_BUDGET = 512


@register(
    "pack_sequences_source",
    f"""
    WITH base AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    cum AS (
      SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM base)
    SELECT source, doc_id, n_tokens,
           CAST(cum_tokens - n_tokens AS BIGINT) AS start_offset,
           CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           n_tokens > 0 AND
           (cum_tokens - n_tokens) // {_PACK_BUDGET}
             != (cum_tokens - 1) // {_PACK_BUDGET} AS spans_boundary
    FROM cum
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing per source shard: running
    token offsets -> pack ids at a 512-token budget. The window is
    PARTITIONED (per-shard independence) — never a one-task global
    window."""
    return pack_sequences(
        _t(spark, sf_dir, "documents"), _PACK_BUDGET, group_col="source"
    )


# ---- domain mixture + corpus statistics (round-2 continuation) -------------

_MIX_WEIGHTS = {"en": 0.25, "de": 0.25, "es": 0.2, "fr": 0.2, "zh": 0.1}


def _mix_weight_values() -> str:
    return ", ".join(f"('{k}', {v})" for k, v in sorted(_MIX_WEIGHTS.items()))


@register(
    "mixture_resample_lang",
    f"""
    WITH w(lang, wt) AS (VALUES {_mix_weight_values()}),
    counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    feas AS (SELECT min(n / wt) AS total FROM counts JOIN w USING (lang)),
    rates AS (
      SELECT lang, wt * total / n AS rate
      FROM counts JOIN w USING (lang) CROSS JOIN feas)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (lang)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          < CAST(floor(rate * 1152921504606846976.0) AS BIGINT)
    """,
)
def q_mixture_resample(spark, sf_dir):
    """Target-mixture resampling over languages: data-dependent
    per-stratum rates (binding stratum kept whole), digest-threshold
    keep predicate. The rates come from a count aggregation, so unlike
    the fixed-rate samples the thresholds are computed IN the plan —
    60-bit digest-prefix vs floor(rate*2^60), IEEE-scalar identical on
    both engines."""
    return mixture_resample(
        _t(spark, sf_dir, "documents"), _MIX_WEIGHTS, strata_col="lang"
    ).select("doc_id", "lang", "source")


_RARE_MAX = 5


@register(
    "corpus_rarity",
    f"""
    WITH toks AS (
      SELECT doc_id, s AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(w) AS t(s)),
    vocab AS (SELECT token, count(*) AS tc FROM toks GROUP BY token)
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(SUM(CAST(tc AS DECIMAL(38,0))) AS DOUBLE) / count(*)
             AS avg_token_count,
           CAST(SUM(CASE WHEN tc <= {_RARE_MAX} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS rare_ratio
    FROM toks JOIN vocab USING (token)
    GROUP BY doc_id
    """,
)
def q_corpus_rarity(spark, sf_dir):
    """Corpus-statistics quality score (integer/decimal-exact — no
    float log-probs): per-doc mean global token count + rare-token
    ratio. Two shuffles (vocab count, per-doc re-agg); the vocab join
    broadcasts."""
    return corpus_rarity_stats(_t(spark, sf_dir, "documents"), rare_max_count=_RARE_MAX)


_VOCAB_N = 256

_DUCK_VOCAB = f"""
    toks AS (
      SELECT doc_id, s AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(w) AS t(s)),
    vc AS (SELECT token, CAST(count(*) AS BIGINT) AS token_count
           FROM toks GROUP BY token),
    vocab AS (
      SELECT token, token_count,
             CAST(row_number() OVER (ORDER BY token_count DESC, token)
                  AS BIGINT) AS vocab_rank
      FROM vc ORDER BY token_count DESC, token LIMIT {_VOCAB_N})
"""


@register(
    "vocab_top_tokens",
    f"WITH {_DUCK_VOCAB} SELECT token, token_count, vocab_rank FROM vocab",
)
def q_vocab_top_tokens(spark, sf_dir):
    """Top-N vocabulary induction: highest-frequency tokens, rank
    deterministic under ties (count DESC, token ASC). orderBy+limit
    plans a distributed TakeOrdered, not a global sort; the rank window
    runs over the top_n-bounded result."""
    from etlutils_spark.operators.text import build_vocab

    return build_vocab(_t(spark, sf_dir, "documents"), top_n=_VOCAB_N)


@register(
    "vocab_oov_rate",
    f"""
    WITH {_DUCK_VOCAB}
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS oov_rate
    FROM toks LEFT JOIN vocab v USING (token)
    GROUP BY doc_id
    """,
)
def q_vocab_oov_rate(spark, sf_dir):
    """Per-document out-of-vocabulary rate vs the induced top-N vocab —
    tokenizer-coverage health before committing to a vocab. The
    top-N-bounded vocab broadcasts; one explode + per-doc re-agg."""
    from etlutils_spark.operators.text import build_vocab, oov_stats

    docs = _t(spark, sf_dir, "documents")
    return oov_stats(docs, build_vocab(docs, top_n=_VOCAB_N))


_PRUNE_FRAC = 0.5


@register(
    "quality_percentile_prune",
    f"""
    WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w
               FROM documents),
    m AS (
      SELECT doc_id, lang,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS avg_token_len,
             CAST(len(list_filter(w, t -> list_contains({_STOP_LIST}, t))) AS DOUBLE)
               / CAST(len(w) AS DOUBLE) AS stopword_ratio
      FROM t),
    s AS (
      SELECT doc_id, lang,
             least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + stopword_ratio * 0.3
               + least(avg_token_len / 8.0, 1.0) * 0.2 AS quality_score
      FROM m),
    r AS (
      SELECT doc_id, lang, quality_score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality_score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM s)
    SELECT doc_id, lang, quality_score, CAST(rn AS BIGINT) AS grp_rank
    FROM r
    WHERE rn <= greatest(1, floor({_PRUNE_FRAC} * n))
    """,
)
def q_quality_percentile_prune(spark, sf_dir):
    """Per-language quality pruning: keep the top half of each lang by
    the composite quality score (per-group threshold — a global cut
    over-prunes low-resource langs). Exact mode: one window pass per
    group; the percentile_approx threshold mode is the sketch-based
    100 TB path (pytest contract)."""
    from etlutils_spark.operators.quality import percentile_prune
    from etlutils_spark.operators.text import text_stats

    docs = _t(spark, sf_dir, "documents")
    scored = text_stats(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return percentile_prune(
        scored, "quality_score", "lang", keep_frac=_PRUNE_FRAC
    ).select("doc_id", "lang", "quality_score", "grp_rank")


# Contract-tier oracle (ccnet/rank_blend pattern): percentile_approx
# thresholds are engine-specific sketch values, so the oracle
# recomputes the per-group doc mass and the EXACT kept count as values
# (greatest(1, floor(frac*n)) — pure integer math) and pins the
# sketch-tolerance invariants TRUE; the invariants are computed
# Spark-side against the exact window mode.
@register(
    "percentile_prune_approx_contract",
    f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(greatest(1, floor({_PRUNE_FRAC} * count(*))) AS BIGINT)
             AS kept_exact,
           TRUE AS superset_of_exact,
           TRUE AS threshold_consistent,
           TRUE AS extra_bounded_by_ties
    FROM documents GROUP BY lang
    """,
)
def q_percentile_prune_approx_contract(spark, sf_dir):
    """The 100 TB percentile_prune path as a registered contract (r12,
    completing the exact→approx parity sweep): ``percentile_prune(
    exact=False)`` — one combinable percentile_approx agg per group
    broadcast back onto a stateless ``score >= threshold`` filter, NO
    per-group sort — verified per language against the exact window
    mode over the same scored frame. Invariants (the pytest contract
    of test_percentile_prune_approx_mode_contract, now cross-engine):
    (a) the approx-kept set CONTAINS every exact survivor (the
    threshold includes the boundary row the rank cut may exclude);
    (b) threshold-consistency — no kept row scores below a dropped row
    in its group; (c) the extra kept mass is bounded by the tie count
    at the boundary score (plus nothing: sketch rank error n/10000 is
    sub-row at every SF). kept_exact is recomputed INDEPENDENTLY by
    DuckDB as greatest(1, floor(frac*n)), pinning the exact mode's cut
    arithmetic as a value. The exact window pass is the VERIFICATION
    harness; production runs the approx mode alone."""
    from etlutils_spark.caching import persist_tracked
    from etlutils_spark.operators.quality import percentile_prune
    from etlutils_spark.operators.text import text_stats

    docs = _t(spark, sf_dir, "documents")
    # three consumers (exact, approx, tie/drop audits) — persist or the
    # scoring scan runs four times
    scored = persist_tracked(
        text_stats(docs)
        .select("doc_id", "quality_score")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    ex = percentile_prune(
        scored, "quality_score", "lang", keep_frac=_PRUNE_FRAC
    )
    ap = persist_tracked(
        percentile_prune(
            scored, "quality_score", "lang", keep_frac=_PRUNE_FRAC,
            exact=False,
        )
    )
    n_docs = scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    ex_n = ex.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_exact")
    )
    ap_n = ap.groupBy("lang").agg(
        F.count(F.lit(1)).alias("__kept_ap"),
        F.min("quality_score").alias("__min_kept"),
    )
    # exact survivors missing from the approx set (must be zero)
    miss = (
        ex.select("doc_id", "lang")
        .join(ap.select("doc_id"), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__miss"))
    )
    # rows the approx mode dropped: their max score per group
    dropped = (
        scored.join(ap.select("doc_id"), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.max("quality_score").alias("__max_drop"))
    )
    # tie mass at the boundary (kept rows scoring exactly the minimum
    # kept value) — the only legitimate source of extra kept rows
    # null-safe lang joins throughout (the cap_per_group convention —
    # review catch): the DuckDB oracle's GROUP BY lang emits a NULL
    # group as a row, and the operator's exact/approx modes both keep
    # it, so a plain equality join here would silently drop it and
    # turn a legitimate NULL group into a row-count mismatch
    def _j(left, right, how="inner"):
        r = right.withColumnRenamed("lang", "__rl")
        return left.join(
            r, F.col("lang").eqNullSafe(F.col("__rl")), how
        ).drop("__rl")

    ties = (
        _j(scored, F.broadcast(ap_n))
        .filter(F.col("quality_score") == F.col("__min_kept"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__ties"))
    )
    return (
        _j(_j(_j(_j(_j(n_docs, ex_n), ap_n), miss, "left"), dropped, "left"),
           ties, "left")
        .select(
            "lang", "n_docs", "kept_exact",
            (F.coalesce("__miss", F.lit(0)) == 0).alias("superset_of_exact"),
            (
                F.col("__max_drop").isNull()
                | (F.col("__min_kept") >= F.col("__max_drop"))
            ).alias("threshold_consistent"),
            (
                (F.col("__kept_ap") - F.col("kept_exact"))
                <= F.coalesce("__ties", F.lit(0))
            ).alias("extra_bounded_by_ties"),
        )
    )


_CHUNK_MAX, _CHUNK_OVERLAP = 64, 8


@register(
    "chunk_documents_windows",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, w,
                 -- bound = len - overlap: a start inside the final
                 -- overlap region is fully contained in its
                 -- predecessor chunk (mirrors chunk_documents)
                 UNNEST(generate_series(1, greatest(len(w) - {_CHUNK_OVERLAP}, 1),
                                        {_CHUNK_MAX - _CHUNK_OVERLAP})) AS chunk_start
          FROM t)
    SELECT doc_id,
           CAST((chunk_start - 1) // {_CHUNK_MAX - _CHUNK_OVERLAP} AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           array_to_string(list_slice(w, chunk_start,
                           least(chunk_start + {_CHUNK_MAX} - 1, len(w))), ' ')
             AS chunk_text,
           CAST(len(list_slice(w, chunk_start,
                     least(chunk_start + {_CHUNK_MAX} - 1, len(w)))) AS INT)
             AS n_chunk_tokens
    FROM s
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Sliding-window token chunking (context-window prep): 64-token
    chunks, 8-token overlap. Pure array algebra in codegen — a per-row
    flatMap at scan speed, zero shuffle, deterministic geometry."""
    from etlutils_spark.operators.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP
    )


@register(
    "profile_documents",
    """
    WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
    stats AS (
      SELECT 'doc_id' AS column, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
             CAST(min(doc_id) AS VARCHAR) AS min_str, CAST(max(doc_id) AS VARCHAR) AS max_str
      FROM base
      UNION ALL
      SELECT 'lang', COUNT(*),
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT lang) AS BIGINT),
             min(lang), max(lang) FROM base
      UNION ALL
      SELECT 'source', COUNT(*),
             CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT source) AS BIGINT),
             min(source), max(source) FROM base
      UNION ALL
      SELECT 'n_chars', COUNT(*),
             CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT n_chars) AS BIGINT),
             CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM base)
    SELECT * FROM stats
    """,
)
def q_profile_documents(spark, sf_dir):
    """Data-quality profile of the documents table (id/lang/source/
    n_chars): nulls, exact distincts, min/max — ONE scan, one
    aggregation pass for all columns (the oracle's UNION ALL form
    scans per column; ours does not)."""
    from etlutils_spark.operators.recode import profile_table

    return profile_table(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    )


_DOC_COLS = "doc_id, text, lang, source, n_chars"

# Round-trip scratch dirs: one deterministic path per (kind, session),
# overwritten in place on re-runs (bench runs each query 3x; idempotence
# tests re-run queries) and removed at interpreter exit — a fresh
# mkdtemp per invocation leaked a full on-disk copy of the documents
# table every run.
_RT_ROOTS: dict[str, str] = {}


def _rt_path(spark, kind: str) -> str:
    import atexit
    import shutil
    import tempfile

    key = f"{kind}_{spark.sparkContext.applicationId}"
    if key not in _RT_ROOTS:
        path = os.path.join(tempfile.gettempdir(), f"etlutils_rt_{key}")
        _RT_ROOTS[key] = path
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return _RT_ROOTS[key]


@register(
    "write_roundtrip",
    """
    SELECT r_regionkey, r_name, CAST(2 AS BIGINT) AS n_copies
    FROM region
    """,
)
def q_write_roundtrip(spark, sf_dir):
    """The write-path protocol (S4-S6 surrogate — no DB in the driver
    harness): chunk-1 overwrite then append (R/ffsql.R:996-1007) against
    the engine's at-rest format, read back and aggregated so the driver
    hashes the sink's actual content. Idempotent across re-runs because
    the overwrite resets the target: any mode bug (double-append,
    ignored overwrite) changes n_copies and fails the hash."""
    from etlutils_spark.sources.sql import ingest_to_parquet

    region = _t(spark, sf_dir, "region")
    path = _rt_path(spark, "write_roundtrip")
    ingest_to_parquet(region, path, mode="overwrite")
    ingest_to_parquet(region, path, mode="append")  # the x= grow path
    return (
        spark.read.parquet(path)
        .groupBy("r_regionkey", "r_name")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "upsert_scd1",
    """
    WITH upd AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 1000 AS c_acctbal
      FROM customer WHERE c_custkey % 100 = 0
      UNION ALL
      SELECT c_custkey + 10000000, 'NEWSEG', 0.0
      FROM customer WHERE c_custkey % 1000 = 0)
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer WHERE c_custkey % 100 <> 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal FROM upd
    """,
)
def q_upsert_scd1(spark, sf_dir):
    """Keyed upsert (MERGE / SCD-1) against a parquet target: every
    100th customer's balance is updated in place, synthetic new keys
    append, everything else survives — then the target is read back so
    the driver hashes the merged content. Idempotent per run (the
    target is rebuilt from the source table first)."""
    from etlutils_spark.sources.merge import merge_upsert

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    path = _rt_path(spark, "upsert_scd1")
    cust.write.mode("overwrite").parquet(path)
    updates = (
        cust.filter(F.col("c_custkey") % 100 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .unionByName(
            cust.filter(F.col("c_custkey") % 1000 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
    )
    merge_upsert(spark, path, updates, key_cols="c_custkey")
    return spark.read.parquet(path)


@register("format_roundtrip_csv", f"SELECT {_DOC_COLS} FROM documents")
def q_format_roundtrip_csv(spark, sf_dir):
    """CSV sink+source fidelity: documents written to CSV and read
    back with an explicit schema must equal the parquet original
    (header, explicit nullValue sentinel so empty strings survive;
    the reference has no file formats at all — SURVEY §2.1)."""
    df = _t(spark, sf_dir, "documents").select(*_DOC_COLS.split(", "))
    path = _rt_path(spark, "csv")
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("nullValue", "\\N")
        .csv(path)
    )
    return (
        spark.read.schema(df.schema)
        .option("header", "true")
        .option("nullValue", "\\N")
        .csv(path)
    )


@register("format_roundtrip_json", f"SELECT {_DOC_COLS} FROM documents")
def q_format_roundtrip_json(spark, sf_dir):
    """JSON-lines sink+source fidelity: same contract as the CSV
    round-trip (explicit schema on read — schema inference is not part
    of the fidelity claim)."""
    df = _t(spark, sf_dir, "documents").select(*_DOC_COLS.split(", "))
    path = _rt_path(spark, "json")
    df.write.mode("overwrite").json(path)
    return spark.read.schema(df.schema).json(path)


@register(
    "format_roundtrip_text",
    """
    SELECT md5(text) AS line_md5, CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1
    """,
)
def q_format_roundtrip_text(spark, sf_dir):
    """Raw-text sink+source fidelity for the LLM-ingest path: the
    documents corpus written as plain one-doc-per-line text files and
    read back through read_text_corpus must preserve the content
    MULTISET exactly (per-line md5 + occurrence count — id-free, since
    raw text carries no keys; duplicates must survive with their
    multiplicity)."""
    from etlutils_spark.sources.files import read_text_corpus

    df = _t(spark, sf_dir, "documents").select("text")
    path = _rt_path(spark, "text")
    df.write.mode("overwrite").text(path)
    back = read_text_corpus(spark, path)
    return back.groupBy(F.md5("text").alias("line_md5")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# ---- storage-layout pruning (Z-order) --------------------------------------

# A stats-pruning scan reads a file iff the file's [min, max] envelope
# on a filtered column overlaps the predicate. This query computes that
# decision EXACTLY, deterministically, for two layouts of the events
# table — Morton-clustered vs append-ordered — with file assignment a
# pure function of the data (zkey prefix radix / contiguous event_id
# blocks; no RangePartitioner sampling), so DuckDB reproduces every
# envelope bit-for-bit. The physical counterpart (actual parquet files,
# actual skipped row groups) is asserted in tests/test_layout.py; the
# hilbert curve variant stays pytest-only (its rotate/reflect recurrence
# is a pandas UDF with no SQL twin).
_ZBITS = 8          # 8-bit ranks -> 16-bit Morton key over 2 columns
_ZFILES_LOG2 = 5    # 32 simulated files
_ZLO, _ZHI = 102, 115  # predicate box in rank space (~5% per dimension)

_Z_INTERLEAVE_SQL = " + ".join(
    f"(((ru >> {i}) & 1) << {2 * i}) + (((rv >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZBITS)
)

@register(
    "zorder_pruning_stats",
    f"""
    WITH b AS (
      SELECT min(user_id) AS mnu, max(user_id) AS mxu,
             min(value) AS mnv, max(value) AS mxv,
             min(event_id) AS mni, max(event_id) AS mxi
      FROM events),
    r AS (
      SELECT CAST(coalesce(least(greatest(
               floor(((e.user_id - b.mnu) / (b.mxu - b.mnu)) * 255), 0), 255), 0)
             AS BIGINT) AS ru,
             CAST(coalesce(least(greatest(
               floor(((e.value - b.mnv) / (b.mxv - b.mnv)) * 255), 0), 255), 0)
             AS BIGINT) AS rv,
             CAST(floor(((e.event_id - b.mni) * 32) / ((b.mxi - b.mni + 1) * 1.0))
             AS BIGINT) AS bucket_a
      FROM events e, b),
    k AS (SELECT *, ({_Z_INTERLEAVE_SQL}) >> {2 * _ZBITS - _ZFILES_LOG2}
                    AS bucket_z FROM r),
    f AS (
      SELECT 'zorder' AS layout, bucket_z AS bucket,
             min(ru) AS mnru, max(ru) AS mxru,
             min(rv) AS mnrv, max(rv) AS mxrv
      FROM k GROUP BY 1, 2
      UNION ALL
      SELECT 'append', bucket_a,
             min(ru), max(ru), min(rv), max(rv)
      FROM k GROUP BY 1, 2)
    SELECT layout,
           CAST(count(*) AS BIGINT) AS files_total,
           CAST(sum(CASE WHEN mnru <= {_ZHI} AND mxru >= {_ZLO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scan_user,
           CAST(sum(CASE WHEN mnrv <= {_ZHI} AND mxrv >= {_ZLO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scan_value,
           CAST(sum(CASE WHEN mnru <= {_ZHI} AND mxru >= {_ZLO}
                     AND mnrv <= {_ZHI} AND mxrv >= {_ZLO}
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scan_both
    FROM f GROUP BY layout
    """,
)
def q_zorder_pruning_stats(spark, sf_dir):
    """File-skipping effectiveness of the Z-order layout
    (sources/layout.py): per simulated file, the min/max envelope of
    both curve columns; per layout, how many of 32 files a
    stats-pruning scan must read for a ~5% box predicate. The Morton
    layout prunes on EVERY listed column; the append layout (the
    reference's only layout, SURVEY §2.1) prunes on none of them."""
    from etlutils_spark.sources.layout import _ranks, morton_interleave

    ev = _t(spark, sf_dir, "events")
    ru, rv = _ranks(ev, ["user_id", "value"], bits=_ZBITS)
    zkey = morton_interleave([ru, rv], bits=_ZBITS)
    idb = ev.agg(F.min("event_id").alias("mn"), F.max("event_id").alias("mx")).first()
    mn_id, span = idb["mn"], idb["mx"] - idb["mn"] + 1
    ranked = ev.select(
        ru.alias("ru"),
        rv.alias("rv"),
        F.shiftright(zkey, 2 * _ZBITS - _ZFILES_LOG2).alias("bucket_z"),
        F.floor((F.col("event_id") - F.lit(mn_id)) * 32 / F.lit(float(span)))
        .cast("long")
        .alias("bucket_a"),
    )
    env = (
        ranked.select(
            F.lit("zorder").alias("layout"), F.col("bucket_z").alias("bucket"),
            "ru", "rv",
        )
        .unionByName(
            ranked.select(
                F.lit("append").alias("layout"), F.col("bucket_a").alias("bucket"),
                "ru", "rv",
            )
        )
        .groupBy("layout", "bucket")
        .agg(
            F.min("ru").alias("mnru"), F.max("ru").alias("mxru"),
            F.min("rv").alias("mnrv"), F.max("rv").alias("mxrv"),
        )
    )
    scan_u = (F.col("mnru") <= _ZHI) & (F.col("mxru") >= _ZLO)
    scan_v = (F.col("mnrv") <= _ZHI) & (F.col("mxrv") >= _ZLO)
    return env.groupBy("layout").agg(
        F.count(F.lit(1)).alias("files_total"),
        F.sum(F.when(scan_u, 1).otherwise(0)).alias("files_scan_user"),
        F.sum(F.when(scan_v, 1).otherwise(0)).alias("files_scan_value"),
        F.sum(F.when(scan_u & scan_v, 1).otherwise(0)).alias("files_scan_both"),
    )


@register(
    "scd2_history",
    """
    WITH tgt AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '1994-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer),
    upd AS (
      SELECT c_custkey, 'UPGRADED' AS c_mktsegment,
             c_acctbal + 500 AS c_acctbal, TIMESTAMP '1996-06-01 00:00:00' AS eff
      FROM customer WHERE c_custkey % 100 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, c_acctbal, TIMESTAMP '1996-06-01 00:00:00'
      FROM customer WHERE c_custkey % 97 = 0 AND c_custkey % 100 <> 0
      UNION ALL
      SELECT c_custkey + 10000000, 'NEWSEG', 0.0, TIMESTAMP '1996-06-01 00:00:00'
      FROM customer WHERE c_custkey % 1000 = 0),
    changed AS (
      SELECT t.c_custkey,
             t.c_mktsegment AS old_seg, t.c_acctbal AS old_bal,
             t.valid_from AS old_from,
             u.c_mktsegment AS new_seg, u.c_acctbal AS new_bal, u.eff
      FROM tgt t JOIN upd u USING (c_custkey)
      WHERE t.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         OR t.c_acctbal IS DISTINCT FROM u.c_acctbal)
    SELECT c_custkey, old_seg AS c_mktsegment, old_bal AS c_acctbal,
           old_from AS valid_from, eff AS valid_to, FALSE AS is_current
    FROM changed
    UNION ALL
    SELECT c_custkey, new_seg, new_bal, eff, NULL, TRUE FROM changed
    UNION ALL
    SELECT t.* FROM tgt t
    WHERE t.c_custkey NOT IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal, u.eff, NULL, TRUE
    FROM upd u
    WHERE u.c_custkey NOT IN (SELECT c_custkey FROM tgt)
    """,
)
def q_scd2_history(spark, sf_dir):
    """SCD type 2 (sources/merge.scd2_apply): versioned customer
    snapshot + one update batch containing changed rows, no-op rows
    (identical attrs — must NOT open a version), and brand-new keys.
    Returns the full resulting history; the oracle derives the same
    history relationally."""
    from etlutils_spark.sources.merge import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    target = cust.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.lit("1994-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        cust.filter(F.col("c_custkey") % 100 == 0)
        .select(
            "c_custkey",
            F.lit("UPGRADED").alias("c_mktsegment"),
            (F.col("c_acctbal") + 500).alias("c_acctbal"),
        )
        .unionByName(
            cust.filter(
                (F.col("c_custkey") % 97 == 0) & (F.col("c_custkey") % 100 != 0)
            ).select("c_custkey", "c_mktsegment", "c_acctbal")
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 1000 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
                F.lit(0.0).alias("c_acctbal"),
            )
        )
        .withColumn("effective_date", F.lit("1996-06-01").cast("timestamp"))
    )
    return scd2_apply(
        target, updates,
        keys="c_custkey",
        attr_cols=["c_mktsegment", "c_acctbal"],
    )


# ---- end-to-end batch curation ---------------------------------------------

_SHINGLE3 = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),"
    " i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"
)

@register(
    "curation_pipeline_batch",
    f"""
    WITH bench AS (SELECT * FROM documents WHERE source IN ('src0', 'src1')),
    train AS (SELECT * FROM documents WHERE source NOT IN ('src0', 'src1')),
    m AS (
      SELECT doc_id,
             len(w) AS n_tokens,
             len(list_filter(w, t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop,
             list_sum(list_transform(w, t -> len(t))) AS sum_len
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM train)),
    q AS (
      SELECT t.* FROM train t JOIN m ON t.doc_id = m.doc_id
      WHERE m.n_tokens >= 20 AND m.n_tokens <= 100000
        AND CAST(m.n_stop AS DOUBLE) / greatest(m.n_tokens, 1) >= 0.05
        AND CAST(m.sum_len AS DOUBLE) / greatest(m.n_tokens, 1) <= 12.0),
    d AS (
      SELECT q.* FROM q
      JOIN (SELECT min(doc_id) AS doc_id
            FROM (SELECT doc_id,
                         md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
                  FROM q)
            GROUP BY h) k ON q.doc_id = k.doc_id),
    bsh AS (
      SELECT DISTINCT s AS shingle
      FROM (SELECT {_SHINGLE3} AS shl
            FROM (SELECT string_split(text, ' ') AS w FROM bench)),
           UNNEST(shl) AS t(s)),
    dsh AS (
      SELECT doc_id, s AS shingle
      FROM (SELECT doc_id, {_SHINGLE3} AS shl
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d)),
           UNNEST(shl) AS t(s)),
    hits AS (
      SELECT doc_id, count(*) AS n_hit
      FROM dsh WHERE shingle IN (SELECT shingle FROM bsh)
      GROUP BY doc_id),
    clean AS (
      SELECT d.* FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE coalesce(h.n_hit, 0) < 25),
    samp AS (
      SELECT * FROM clean
      WHERE md5(CAST(doc_id AS VARCHAR)) < '{rate_threshold_hex(0.5)}')
    SELECT doc_id, lang, source,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 8 AS INT) AS shard
    FROM samp
    """,
)
def q_curation_pipeline_batch(spark, sf_dir):
    """The full batch curation chain (operators/curation.py): quality
    rules -> exact dedup -> decontamination vs the src0/src1 benchmark
    slice -> deterministic 50% sample -> 8-way shard assignment. One
    composed operator, one chained oracle — every intermediate stage is
    also independently oracle-checked by its own registry query."""
    from etlutils_spark.operators.curation import curate_documents

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source").isin("src0", "src1"))
    train = docs.filter(~F.col("source").isin("src0", "src1"))
    out = curate_documents(
        train, bench, sample_rate=0.5, n_shards=8,
    )
    return out.select("doc_id", "lang", "source", "shard")


@register(
    "train_val_test_split",
    f"""
    SELECT doc_id, lang,
           CASE WHEN md5(CAST(doc_id AS VARCHAR))
                     < '{rate_threshold_hex(0.8)}' THEN 'train'
                WHEN md5(CAST(doc_id AS VARCHAR))
                     < '{rate_threshold_hex(0.9)}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_train_val_test_split(spark, sf_dir):
    """Deterministic 80/10/10 split assignment over the documents
    table (sampling.train_val_test_split): one digest, ordered
    thresholds — exclusive and exhaustive by construction."""
    from etlutils_spark.operators.sampling import train_val_test_split

    docs = _t(spark, sf_dir, "documents")
    return train_val_test_split(docs, (0.8, 0.1)).select(
        "doc_id", "lang", "split"
    )


@register(
    "constraint_audit",
    """
    WITH j AS (
      SELECT o.*, c.c_custkey AS fk
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
    a AS (SELECT
      CAST(SUM(CASE WHEN fk IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
        AS fk_customer,
      -- pass-counts-0 / everything-else-counts-1 (incl. NULL): the
      -- strict NULL-violates contract, mirrored from check_constraints
      CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
        AS positive_price,
      CAST(SUM(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
        AS orderdate_not_null,
      CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        AS unique_orderkey
    FROM j)
    SELECT 'fk_customer' AS rule, fk_customer AS n_violations,
           fk_customer = 0 AS passed FROM a
    UNION ALL
    SELECT 'positive_price', positive_price, positive_price = 0 FROM a
    UNION ALL
    SELECT 'orderdate_not_null', orderdate_not_null,
           orderdate_not_null = 0 FROM a
    UNION ALL
    SELECT 'unique_orderkey', unique_orderkey, unique_orderkey = 0 FROM a
    """,
)
def q_constraint_audit(spark, sf_dir):
    """Expectations pass over orders (plans/checks.check_constraints):
    FK-to-customer, positivity, not-null, key uniqueness — all rules in
    ONE aggregation over one broadcast-joined scan."""
    from etlutils_spark.plans.checks import check_constraints

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("fk")
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.fk, "left")
    return check_constraints(
        j,
        rules={
            "fk_customer": F.col("fk").isNotNull(),
            "positive_price": F.col("o_totalprice") > 0,
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
        },
        unique_keys={"unique_orderkey": "o_orderkey"},
    )


TOKEN_BUDGET = 2000

@register(
    "token_budget_sample",
    f"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents),
    p AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM d)
    SELECT doc_id, lang, n_tokens FROM p WHERE prefix < {TOKEN_BUDGET}
    """,
)
def q_token_budget_sample(spark, sf_dir):
    """Token-budgeted selection: per language, greedy digest-ordered
    prefix until 2000 tokens — the token-count mixture lever
    (mixture_resample's doc-count twin)."""
    from etlutils_spark.operators.sampling import token_budget_sample

    return token_budget_sample(
        _t(spark, sf_dir, "documents"), budget_tokens=TOKEN_BUDGET
    )


@register(
    "tokenize_to_ids",
    f"""
    WITH {_DUCK_VOCAB},
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pos AS (SELECT doc_id, w[ord] AS token, ord
            FROM t, UNNEST(generate_series(1, len(w))) AS u(ord)),
    m AS (SELECT pos.doc_id, pos.ord, COALESCE(v.vocab_rank, 0) AS id
          FROM pos LEFT JOIN vocab v USING (token))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ids,
           CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           md5(string_agg(CAST(id AS VARCHAR), ' ' ORDER BY ord)) AS ids_md5
    FROM m GROUP BY doc_id
    """,
)
def q_tokenize_to_ids(spark, sf_dir):
    """Vocabulary encoding of the corpus (tokens_to_ids over the induced
    top-N vocab), projected to driver-hashable scalars: id count, OOV
    count, and an md5 over the order-preserved id sequence. The array
    column stays operator-side (arrays are not canonicalizer-safe —
    the multimodal_features lesson)."""
    from etlutils_spark.operators.text import build_vocab, tokens_to_ids

    docs = _t(spark, sf_dir, "documents")
    enc = tokens_to_ids(docs, build_vocab(docs, top_n=_VOCAB_N))
    ids_str = F.transform(F.col("ids"), lambda i: i.cast("string"))
    return enc.select(
        "doc_id",
        "n_ids",
        F.size(F.filter(F.col("ids"), lambda i: i == 0)).cast("bigint").alias("n_oov"),
        F.md5(F.concat_ws(" ", ids_str)).alias("ids_md5"),
    )


@register(
    "tokenize_to_ids_bigvocab",
    f"""
    WITH {_DUCK_VOCAB.replace(f"LIMIT {_VOCAB_N}", "LIMIT 100000")},
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pos AS (SELECT doc_id, w[ord] AS token, ord
            FROM t, UNNEST(generate_series(1, len(w))) AS u(ord)),
    m AS (SELECT pos.doc_id, pos.ord, COALESCE(v.vocab_rank, 0) AS id
          FROM pos LEFT JOIN vocab v USING (token))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_ids,
           CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           md5(string_agg(CAST(id AS VARCHAR), ' ' ORDER BY ord)) AS ids_md5
    FROM m GROUP BY doc_id
    """,
)
def q_tokenize_to_ids_bigvocab(spark, sf_dir):
    """``tokens_to_ids`` in its BPE-scale configuration: the vocabulary
    is the ENTIRE corpus vocab (top 100k — larger than any sane
    plan-literal budget) and ``max_literal_vocab`` is forced tiny so
    the auto mode takes the broadcast-join path — posexplode, broadcast
    vocab hash join, positional re-assembly. Same scalar projection as
    ``tokenize_to_ids``; with every token in-vocab the oracle pins
    n_oov = 0 and the full order-preserved id sequence."""
    from etlutils_spark.operators.text import build_vocab, tokens_to_ids

    docs = _t(spark, sf_dir, "documents")
    enc = tokens_to_ids(
        docs, build_vocab(docs, top_n=100_000), max_literal_vocab=64,
        mode="auto",
    )
    ids_str = F.transform(F.col("ids"), lambda i: i.cast("string"))
    return enc.select(
        "doc_id",
        "n_ids",
        F.size(F.filter(F.col("ids"), lambda i: i == 0)).cast("bigint").alias("n_oov"),
        F.md5(F.concat_ws(" ", ids_str)).alias("ids_md5"),
    )


PACK_SEQ_LEN = 64

@register(
    "pack_ids_export",
    f"""
    WITH {_DUCK_VOCAB},
    t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    pos AS (SELECT doc_id, source, w[ord] AS token, ord
            FROM t, UNNEST(generate_series(1, len(w))) AS u(ord)),
    m AS (SELECT pos.doc_id, pos.source, pos.ord,
                 COALESCE(v.vocab_rank, 0) AS id
          FROM pos LEFT JOIN vocab v USING (token)),
    dl AS (SELECT doc_id, source, count(*) AS n_ids FROM m GROUP BY 1, 2),
    st AS (SELECT doc_id,
                  SUM(n_ids) OVER (PARTITION BY source ORDER BY doc_id)
                    - n_ids AS strt
           FROM dl),
    g AS (SELECT m.source, st.strt + m.ord - 1 AS gidx, m.id
          FROM m JOIN st ON m.doc_id = st.doc_id)
    SELECT source, CAST(gidx // {PACK_SEQ_LEN} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           count(*) = {PACK_SEQ_LEN} AS full,
           md5(string_agg(CAST(id AS VARCHAR), ' ' ORDER BY gidx)) AS ids_md5
    FROM g GROUP BY 1, 2
    """,
)
def q_pack_ids_export(spark, sf_dir):
    """Materialized fixed-length training sequences: vocab-encoded
    corpus laid end-to-end per source, cut every 64 tokens; one row per
    pack, id sequence projected to an order-preserved md5 (arrays stay
    operator-side)."""
    from etlutils_spark.operators.sampling import pack_ids_export
    from etlutils_spark.operators.text import build_vocab

    docs = _t(spark, sf_dir, "documents")
    packs = pack_ids_export(
        docs, build_vocab(docs, top_n=_VOCAB_N), seq_len=PACK_SEQ_LEN
    )
    ids_str = F.transform(F.col("ids"), lambda i: i.cast("string"))
    return packs.select(
        "source", "pack_id", "n_tokens", "full",
        F.md5(F.concat_ws(" ", ids_str)).alias("ids_md5"),
    )


@register(
    "curation_pipeline_tokens",
    r"""
    WITH m AS (
      SELECT doc_id,
             len(w) AS n_tokens,
             len(list_filter(w, t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop,
             list_sum(list_transform(w, t -> len(t))) AS sum_len
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    q AS (
      SELECT d0.* FROM documents d0 JOIN m ON d0.doc_id = m.doc_id
      WHERE m.n_tokens >= 20 AND m.n_tokens <= 100000
        AND CAST(m.n_stop AS DOUBLE) / greatest(m.n_tokens, 1) >= 0.05
        AND CAST(m.sum_len AS DOUBLE) / greatest(m.n_tokens, 1) <= 12.0),
    d AS (
      SELECT q.* FROM q
      JOIN (SELECT min(doc_id) AS doc_id
            FROM (SELECT doc_id,
                         md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS h
                  FROM q)
            GROUP BY h) kk ON q.doc_id = kk.doc_id),
    st0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
    sp AS (SELECT doc_id, w,
                  UNNEST(generate_series(1, greatest(len(w), 1), 32)) AS cs
           FROM st0),
    ck AS (SELECT doc_id, CAST((cs - 1) // 32 AS BIGINT) AS idx,
                  array_to_string(list_slice(w, cs, least(cs + 31, len(w))), ' ')
                    AS chunk_text
           FROM sp),
    mk AS (SELECT *, row_number() OVER (PARTITION BY md5(chunk_text)
                                        ORDER BY doc_id, idx) AS rn
           FROM ck),
    rw AS (SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY idx) AS dedup_text
           FROM mk WHERE rn = 1 GROUP BY doc_id),
    rws AS (SELECT rw.doc_id, rw.dedup_text, d.source
            FROM rw JOIN d ON rw.doc_id = d.doc_id),
    vt AS (SELECT s AS token
           FROM (SELECT string_split(dedup_text, ' ') AS w FROM rws),
                UNNEST(w) AS t(s)),
    vc AS (SELECT token, count(*) AS c FROM vt GROUP BY token),
    vocab AS (SELECT token,
                     CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT)
                       AS vocab_rank
              FROM vc ORDER BY c DESC, token LIMIT 256),
    t2 AS (SELECT doc_id, source, string_split(dedup_text, ' ') AS w FROM rws),
    pos AS (SELECT doc_id, source, w[ord] AS token, ord
            FROM t2, UNNEST(generate_series(1, len(w))) AS u(ord)),
    enc AS (SELECT pos.doc_id, pos.source, pos.ord,
                   COALESCE(v.vocab_rank, 0) AS id
            FROM pos LEFT JOIN vocab v USING (token)),
    dl AS (SELECT doc_id, source, count(*) AS n_ids FROM enc GROUP BY 1, 2),
    stt AS (SELECT doc_id,
                   SUM(n_ids) OVER (PARTITION BY source ORDER BY doc_id)
                     - n_ids AS strt
            FROM dl),
    g AS (SELECT enc.source, stt.strt + enc.ord - 1 AS gidx, enc.id
          FROM enc JOIN stt ON enc.doc_id = stt.doc_id)
    SELECT source, CAST(gidx // 64 AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           count(*) = 64 AS full,
           md5(string_agg(CAST(id AS VARCHAR), ' ' ORDER BY gidx)) AS ids_md5
    FROM g GROUP BY 1, 2
    """,
)
def q_curation_pipeline_tokens(spark, sf_dir):
    """The tokenizer-side end-to-end: quality filter -> exact dedup ->
    span-dedup REWRITE -> vocab induction on the survivors ->
    fixed-length id sequences (curate_to_sequences). Deterministic
    stage-by-stage, so the emitted training sequences hash-match the
    oracle's replication of the whole chain."""
    from etlutils_spark.operators.curation import curate_to_sequences

    packs = curate_to_sequences(_t(spark, sf_dir, "documents"))
    ids_str = F.transform(F.col("ids"), lambda i: i.cast("string"))
    return packs.select(
        "source", "pack_id", "n_tokens", "full",
        F.md5(F.concat_ws(" ", ids_str)).alias("ids_md5"),
    )


@register("format_roundtrip_orc", f"SELECT {_DOC_COLS} FROM documents")
def q_format_roundtrip_orc(spark, sf_dir):
    """ORC sink+source fidelity (sources/files.py read_orc/write_orc):
    same contract as the CSV/JSON round-trips. The oracle never reads
    ORC — a faithful round-trip must equal the parquet original, which
    DuckDB selects directly."""
    from etlutils_spark.sources.files import read_orc, write_orc

    df = _t(spark, sf_dir, "documents").select(*_DOC_COLS.split(", "))
    path = _rt_path(spark, "orc")
    write_orc(df, path, mode="overwrite")
    return read_orc(spark, path)


@register(
    "hilbert_curve_order2",
    """
    WITH pts AS (SELECT DISTINCT CAST(c_custkey % 4 AS BIGINT) AS x,
                                 CAST(c_nationkey % 4 AS BIGINT) AS y
                 FROM customer),
    canon AS (SELECT * FROM (VALUES
        (0,0,0),(1,0,1),(1,1,2),(0,1,3),
        (0,2,4),(0,3,5),(1,3,6),(1,2,7),
        (2,2,8),(2,3,9),(3,3,10),(3,2,11),
        (3,1,12),(2,1,13),(2,0,14),(3,0,15)) AS t(x, y, d))
    SELECT p.x, p.y, CAST(c.d AS BIGINT) AS hilbert_d
    FROM pts p JOIN canon c ON p.x = c.x AND p.y = c.y
    """,
)
def q_hilbert_curve_order2(spark, sf_dir):
    """Driver evidence for the Hilbert layout key (sources/layout.py,
    vectorized pandas UDF): data-derived 4x4 grid points keyed at
    order 2 must reproduce the CANONICAL public Hilbert curve (the
    classic xy2d walk (0,0)->(1,0)->(1,1)->(0,1)->(0,2)->...), embedded
    in the oracle as a VALUES table — an implementation-independent
    check of the rotate/reflect recurrence the Z-order query can't
    provide."""
    from etlutils_spark.sources.layout import hilbert_key

    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        (F.col("c_custkey") % 4).cast("long").alias("x"),
        (F.col("c_nationkey") % 4).cast("long").alias("y"),
    ).distinct()
    return pts.select(
        "x", "y", hilbert_key(pts, ["x", "y"], bits=2).alias("hilbert_d")
    )


@register(
    "mixture_temperature_lang",
    """
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    pw AS (SELECT lang, sqrt(CAST(n AS DOUBLE)) AS p FROM counts),
    feas AS (SELECT min(p) AS mn FROM pw),
    rates AS (SELECT lang, mn / p AS rate FROM pw CROSS JOIN feas)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (lang)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          < CAST(floor(rate * 1152921504606846976.0) AS BIGINT)
    """,
)
def q_mixture_temperature(spark, sf_dir):
    """Temperature (alpha=0.5) language rebalancing — sampling mass
    proportional to count^alpha (XLM-R-style head flattening). The
    per-stratum rate collapses to min_u(sqrt(n_u))/sqrt(n_s): sqrt
    chains instead of pow, so the data-dependent thresholds are
    bit-identical on both engines (operators/sampling.py
    temperature_resample)."""
    from etlutils_spark.operators.sampling import temperature_resample

    return temperature_resample(
        _t(spark, sf_dir, "documents"), alpha=0.5, strata_col="lang"
    ).select("doc_id", "lang", "source")


def _rank_blend_oracle() -> str:
    # compose the three already-oracled signal queries as subqueries
    # (DuckDB allows WITH inside a parenthesized subquery), then mirror
    # rank_blend's (row_number-1)/greatest(n-1,1) exactly
    ts = REGISTRY["text_stats"][1]
    rep = REGISTRY["text_repetition"][1]
    rar = REGISTRY["corpus_rarity"][1]
    return f"""
    WITH ts AS (SELECT doc_id, quality_score FROM ({ts})),
    rep AS (SELECT doc_id, dup_ngram_ratio FROM ({rep})),
    rar AS (SELECT doc_id, rare_ratio FROM ({rar})),
    sig AS (
      SELECT ts.doc_id, quality_score, dup_ngram_ratio, rare_ratio
      FROM ts JOIN rep USING (doc_id) JOIN rar USING (doc_id)),
    r AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY quality_score ASC, doc_id) - 1
                  AS DOUBLE)
               / CAST(greatest((SELECT count(*) FROM sig) - 1, 1) AS DOUBLE)
               AS rank_quality_score,
             CAST(row_number() OVER (ORDER BY dup_ngram_ratio DESC, doc_id) - 1
                  AS DOUBLE)
               / CAST(greatest((SELECT count(*) FROM sig) - 1, 1) AS DOUBLE)
               AS rank_dup_ngram_ratio,
             CAST(row_number() OVER (ORDER BY rare_ratio DESC, doc_id) - 1
                  AS DOUBLE)
               / CAST(greatest((SELECT count(*) FROM sig) - 1, 1) AS DOUBLE)
               AS rank_rare_ratio
      FROM sig)
    SELECT doc_id, rank_quality_score, rank_dup_ngram_ratio, rank_rare_ratio,
           ((rank_quality_score + rank_dup_ngram_ratio) + rank_rare_ratio)
             / 3.0 AS blend_rank
    FROM r
    """


@register("quality_rank_blend", _rank_blend_oracle())
def q_quality_rank_blend(spark, sf_dir):
    """Ensemble quality blending: three independent signals (composite
    quality score UP, n-gram repetition DOWN, rare-token ratio DOWN)
    rank-normalized to [0,1] and averaged — the multi-classifier
    curation composite, unit-free by construction. Exact mode (global
    row_number ranks, id tie-break) is the registered oracle-checked
    form; rank_blend(approx_buckets=B) is the sketch-threshold 100 TB
    mode (operators/quality.py)."""
    from etlutils_spark.operators.quality import rank_blend, repetition_stats
    from etlutils_spark.operators.text import corpus_rarity_stats, text_stats

    docs = _t(spark, sf_dir, "documents")
    sig = (
        text_stats(docs).select("doc_id", "quality_score")
        .join(repetition_stats(docs).select("doc_id", "dup_ngram_ratio"), "doc_id")
        .join(
            corpus_rarity_stats(docs, rare_max_count=_RARE_MAX)
            .select("doc_id", "rare_ratio"),
            "doc_id",
        )
    )
    return rank_blend(
        sig,
        {"quality_score": True, "dup_ngram_ratio": False, "rare_ratio": False},
    )


# Contract-tier oracle (same pattern as ccnet_lm_approx_contract): the
# approx mode's percentile_approx thresholds are engine-specific sketch
# values, so the oracle recomputes the per-signal doc mass as a VALUE
# and pins the sketch-tolerance invariants TRUE; the invariants are
# computed Spark-side against the registered exact-rank mode.
@register(
    "rank_blend_approx_contract",
    """
    SELECT 'n_chars' AS signal, CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS within_tolerance_of_exact,
           TRUE AS monotone_in_signal,
           TRUE AS blend_is_mean
    FROM documents
    UNION ALL
    SELECT 'n_tokens' AS signal, CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS within_tolerance_of_exact,
           TRUE AS monotone_in_signal,
           TRUE AS blend_is_mean
    FROM documents
    """,
)
def q_rank_blend_approx_contract(spark, sf_dir):
    """The 100 TB rank_blend path as a registered contract (r11 verdict
    stretch #7, the ccnet_lm_approx_contract pattern):
    ``rank_blend(approx_buckets=B)`` — one percentile_approx sketch per
    signal broadcast onto a stateless bucket compare, NO global sort —
    verified against the exact row_number ranks over the same signals
    (one ascending, one descending, so both polarities of the bucket
    mapping are under contract). Invariants per signal: (a) every doc's
    approx rank sits within 1.5 bucket widths of its exact rank (one
    width is the quantization floor — measured exactly 1/B at all three
    SFs — plus half a width of tie/sketch margin); (b) the approx rank
    is a CONSTANT, MONOTONE function of the raw signal value (equal
    values get equal ranks; rank moves with the signal in the declared
    direction — a collapsed or inverted sketch fails loudly); (c) the
    blend is exactly the IEEE mean of the per-signal ranks. The exact-
    rank reference pass (a global sort per signal) is the VERIFICATION
    harness only — production runs the approx mode alone, whose
    sort-free plan is the whole point at 100 TB."""
    from pyspark.sql import Window

    from etlutils_spark.operators.quality import rank_blend

    B = 10
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("n_chars"),
        F.size(F.split("text", " ")).cast("double").alias("n_tokens"),
    )
    signals = {"n_chars": True, "n_tokens": False}
    a = rank_blend(docs, signals, approx_buckets=B)
    e = rank_blend(docs, signals)
    j = (
        a.select(
            "doc_id", F.col("rank_n_chars").alias("a_c"),
            F.col("rank_n_tokens").alias("a_t"),
            F.col("blend_rank").alias("a_blend"),
        )
        .join(
            e.select(
                "doc_id", F.col("rank_n_chars").alias("e_c"),
                F.col("rank_n_tokens").alias("e_t"),
            ),
            "doc_id",
        )
        .join(docs, "doc_id")
    )
    # one row per (doc, signal): signal name, raw value, approx/exact
    # rank, declared direction — the per-signal aggregates below fold it
    per = j.select(
        "doc_id",
        (F.col("a_blend")
         == (F.col("a_c") + F.col("a_t")) / F.lit(2.0)).alias("__mean_ok"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_chars").alias("signal"),
                    F.col("n_chars").alias("v"),
                    F.col("a_c").alias("ar"), F.col("e_c").alias("er"),
                    F.lit(True).alias("hib"),
                ),
                F.struct(
                    F.lit("n_tokens").alias("signal"),
                    F.col("n_tokens").alias("v"),
                    F.col("a_t").alias("ar"), F.col("e_t").alias("er"),
                    F.lit(False).alias("hib"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "__mean_ok", "s.*")
    # monotone+constant over DISTINCT (signal, value, rank) triples — a
    # values-count-bounded frame (same harness-scale rationale as the
    # ccnet contract's exact-percentile pass); the lag window is
    # per-signal over distinct values only
    vals = per.select("signal", "v", "ar", "hib").distinct()
    w = Window.partitionBy("signal").orderBy("v")
    step_ok = F.when(
        F.lag("ar").over(w).isNull(), F.lit(True)
    ).otherwise(
        F.when(F.col("hib"), F.col("ar") >= F.lag("ar").over(w))
        .otherwise(F.col("ar") <= F.lag("ar").over(w))
    )
    constant_ok = (
        vals.groupBy("signal", "v")
        .agg((F.count(F.lit(1)) == 1).alias("one_rank_per_value"))
        .groupBy("signal")
        .agg(F.min("one_rank_per_value").alias("__const"))
    )
    monotone = (
        vals.select("signal", step_ok.alias("ok"))
        .groupBy("signal")
        .agg(F.min("ok").alias("__mono"))
    )
    agg = per.groupBy("signal").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.max(F.abs(F.col("ar") - F.col("er")))
         <= F.lit(1.5 / B)).alias("within_tolerance_of_exact"),
        F.min("__mean_ok").alias("blend_is_mean"),
    )
    return (
        agg.join(monotone, "signal")
        .join(constant_ok, "signal")
        .select(
            "signal", "n_docs", "within_tolerance_of_exact",
            (F.col("__mono") & F.col("__const")).alias("monotone_in_signal"),
            "blend_is_mean",
        )
    )


def _profile_side_sql(pred: str) -> str:
    cols = ["doc_id", "lang", "n_chars"]
    parts = []
    for c in cols:
        parts.append(f"""
      SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             CAST(min({c}) AS VARCHAR) AS min_str,
             CAST(max({c}) AS VARCHAR) AS max_str
      FROM documents WHERE {pred}""")
    return " UNION ALL ".join(parts)


@register(
    "profile_drift_documents",
    f"""
    WITH pa AS ({_profile_side_sql('TRUE')}),
    pb AS ({_profile_side_sql('doc_id % 2 = 0')})
    SELECT pa."column",
           pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b,
           pb.n_rows - pa.n_rows AS n_rows_delta,
           pa.n_nulls AS n_nulls_a, pb.n_nulls AS n_nulls_b,
           pb.n_nulls - pa.n_nulls AS n_nulls_delta,
           pa.n_distinct AS n_distinct_a, pb.n_distinct AS n_distinct_b,
           pb.n_distinct - pa.n_distinct AS n_distinct_delta,
           NOT (pa.min_str IS NOT DISTINCT FROM pb.min_str) AS min_changed,
           NOT (pa.max_str IS NOT DISTINCT FROM pb.max_str) AS max_changed
    FROM pa JOIN pb USING ("column")
    """,
)
def q_profile_drift(spark, sf_dir):
    """Release-to-release drift audit: per-column profile deltas
    between the documents corpus and a half-corpus snapshot proxy
    (even doc_ids) — row/null/cardinality deltas plus range-shift
    flags. Two single-pass profiles + a |columns|-row join
    (operators/recode.py profile_drift); auditing a 100 TB release
    against its predecessor is exactly two scans."""
    from etlutils_spark.operators.recode import profile_drift

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return profile_drift(docs, docs.filter(F.col("doc_id") % 2 == 0))
