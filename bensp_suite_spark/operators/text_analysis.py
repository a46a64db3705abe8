"""Text-analysis operators for LLM-data pipelines (north-star extensions,
SURVEY §7 phase 5): token counting, quality scoring, language ID,
document fingerprinting.

All hot-path logic is JVM-side (built-in functions / higher-order array
expressions) — no Python UDFs — so whole-stage codegen applies and the ops
scale to 100 TB document tables. Every op has an exact DuckDB oracle:
integer-only or integer-then-single-division math, so values hash
identically across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the stopword-hit language heuristic.
# Order = tie-break priority (first wins).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "por"),
}

FINGERPRINT_MOD = 2147483647  # 2^31 - 1; 31*acc + cp stays < 2^36, exact in i64


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(df: DataFrame, text: str = "text") -> DataFrame:
    return df.select(
        "doc_id",
        F.size(words_col(F.col(text))).alias("n_tokens"),
        F.length(F.col(text)).alias("n_chars"),
    )


#: GPT-2-style pre-tokenizer pattern, restricted to the regex subset that
#: Java regex and RE2 (DuckDB) evaluate identically: contraction suffixes,
#: space-prefixed letter runs, digit runs, punctuation runs. The real BPE
#: pattern's trailing-whitespace lookahead is dropped (RE2 has no
#: lookahead); counts differ from tiktoken only on runs of blanks.
BPE_ISH_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Sub-word-ish token counts: the BPE *pre-tokenization* granularity
    (the unit LLM data pipelines budget by), next to the whitespace count
    for comparison."""
    t = F.col(text)
    return df.select(
        "doc_id",
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).alias("n_bpe_tokens"),
        F.size(words_col(t)).alias("n_ws_tokens"),
    )


BPE_TOKEN_COUNT_SQL = f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens
    FROM documents
"""


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length / alpha-ratio / stopword-ratio quality signals. Ratios are
    int/int single divisions — deterministic doubles in any engine."""
    t = F.col(text)
    words = words_col(t)
    counted = df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.length(F.regexp_replace(t, "[^a-z]", "")).alias("n_alpha"),
        F.size(words).alias("n_tokens"),
        F.size(F.filter(words, _membership(LANG_STOPWORDS["en"]))).alias("stop"),
    )
    n_chars, n_tokens = F.col("n_chars"), F.col("n_tokens")
    return counted.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(F.col("n_alpha").cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(F.col("stop").cast("double") / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 6).alias("avg_token_len"),
    )


def _membership(sw: tuple[str, ...]):
    # NB: can't use a `sw=sw` default — PySpark's higher-order-function
    # wrapper binds a lambda Column to EVERY parameter of the callable.
    return lambda w: w.isin(*sw)


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: argmax of per-language stopword
    counts; earlier language wins ties; 'und' when no hits at all.

    Two chained projections on purpose: the first tokenizes once and emits
    one count column per language; the second computes the argmax from those
    named columns. Folding it into one projection makes every count
    expression (split + array filter, both CodegenFallback) appear several
    times in the nested CASE tree — ~10× slower, measured at sf0.1."""
    words = words_col(F.col(text))
    counted = df.select(
        "doc_id",
        *[
            F.size(F.filter(words, _membership(sw))).alias(f"c_{lang}")
            for lang, sw in LANG_STOPWORDS.items()
        ],
    )
    counts = {lang: F.col(f"c_{lang}") for lang in LANG_STOPWORDS}
    best_lang, best_cnt = F.lit("und"), F.lit(-1)
    for lang in LANG_STOPWORDS:  # forward pass, strict > keeps first-wins ties
        c = counts[lang]
        best_lang = F.when(c > best_cnt, F.lit(lang)).otherwise(best_lang)
        best_cnt = F.when(c > best_cnt, c).otherwise(best_cnt)
    pred = F.when(best_cnt <= 0, F.lit("und")).otherwise(best_lang)
    return counted.select("doc_id", pred.alias("pred_lang"), best_cnt.alias("hits"))


def lang_id_oracle_sql(table: str = "documents") -> str:
    """DuckDB SQL equivalent of lang_id (generated from the same stopword
    tables so the two can never drift)."""
    sel = ", ".join(
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"w -> w IN ({', '.join(repr(w) for w in sw)}))) AS c_{lang}"
        for lang, sw in LANG_STOPWORDS.items()
    )
    langs = list(LANG_STOPWORDS)
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"c_{lang} > 0"]
        conds += [f"c_{lang} > c_{o}" for o in langs[:i]]
        conds += [f"c_{lang} >= c_{o}" for o in langs[i + 1 :]]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    greatest = "GREATEST(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    return f"""
    SELECT doc_id, {case} AS pred_lang, CAST({greatest} AS INTEGER) AS hits
    FROM (SELECT doc_id, {sel} FROM {table})
    """


def doc_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Polynomial rolling-hash fingerprint of the whole document:
    fold(acc*31 + codepoint) mod 2^31-1 — the relational cousin of the
    reference's Rabin fingerprint kernel (rabin.c), expressed as a pure SQL
    fold so DuckDB reproduces it exactly."""
    # split('') yields one array element per codepoint in a single pass;
    # indexing with substr(t, i, 1) instead is O(n) per lookup (UTF-8 seek
    # from the start), i.e. quadratic per document — ~4× slower at sf0.1.
    fp = F.expr(
        f"aggregate(transform(split({text}, ''), c -> ascii(c)), "
        f"0L, (acc, cp) -> (acc * 31 + cp) % {FINGERPRINT_MOD})"
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def doc_fingerprint_oracle_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                              i -> CAST(unicode(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
             (acc, cp) -> (acc * 31 + cp) % {FINGERPRINT_MOD}) AS fingerprint
    FROM {table}
    """


# ---------------------------------------------------------------------------
# Training-corpus preparation: fixed-window chunking, PII scrubbing
# ---------------------------------------------------------------------------

# --- HTML → text extraction (step zero of a web-crawl pipeline) ------------
# Regex-based, deliberately: the crawl-scale convention (trafilatura-class
# parsers are the quality ceiling, but the bulk pass that feeds them is
# exactly this strip). Every pattern stays inside the Java-regex ∩ RE2
# subset — (?is) inline flags, non-greedy spans, NO lookarounds — so the
# extraction is engine-exact in DuckDB. Limitations are the regex family's
# (no nested <script> handling, only the five common entities decoded) and
# are documented rather than hidden.

#: the five entities worth decoding without an entity table
_HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def extract_html_text(col: Column) -> Column:
    """Visible text of an HTML document: drop script/style/comment spans,
    replace every remaining tag with a space, decode the common entities
    (&amp; LAST so '&amp;lt;' decodes to '&lt;', not '<'), collapse
    whitespace. Pure column expressions — the strip rides the scan."""
    t = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, "[ \\t\\n\\x0B\\f\\r]+", " "))


def extract_html_title(col: Column) -> Column:
    """First <title> body, entity-decoded and whitespace-collapsed (''
    when absent)."""
    raw = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, rep in _HTML_ENTITIES:
        raw = F.replace(raw, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(raw, "[ \\t\\n\\x0B\\f\\r]+", " "))


def extract_html_sql(col_sql: str) -> tuple[str, str]:
    """DuckDB renderings of (extract_html_text, extract_html_title)."""
    t = f"regexp_replace({col_sql}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?s)<!--.*?-->', ' ', 'g')"
    t = f"regexp_replace({t}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, rep in _HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        t = f"replace({t}, '{ent}', '{rep_sql}')"
    text = f"trim(regexp_replace({t}, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
    title_raw = f"regexp_extract({col_sql}, '(?is)<title[^>]*>(.*?)</title>', 1)"
    for ent, rep in _HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        title_raw = f"replace({title_raw}, '{ent}', '{rep_sql}')"
    title = f"trim(regexp_replace({title_raw}, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
    return text, title


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 500,
    overlap: int = 50,
    text: str = "text",
) -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (the context-window packing step of a training pipeline). All JVM-side:
    sequence → explode → substring is a narrow per-row expansion, no
    shuffle, output rows ∝ total characters / stride. Short docs yield one
    (possibly truncated) chunk; every character lands in ≥1 chunk."""
    stride = chunk_chars - overlap
    t = F.col(text)
    n_chunks = F.ceil(
        F.greatest(F.length(t) - F.lit(overlap), F.lit(1)) / F.lit(float(stride))
    ).cast("int")
    return (
        df.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            "chunk_text", F.substring(t, F.col("chunk_idx") * stride + 1, chunk_chars)
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


#: simple email shape, identical semantics in Java regex and RE2
EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"


def redact_pii(
    df: DataFrame,
    patterns: dict[str, str] | None = None,
    text: str = "text",
) -> DataFrame:
    """Replace PII-shaped substrings with typed placeholder tags
    (`{"<EMAIL>": regex, ...}`). regexp_replace is JVM-side codegen; the
    patterns must stay in the Java∩RE2 common subset so the DuckDB oracle
    sees identical semantics (same constraint the BPE pre-tokenizer
    documents). Adds `redacted` next to the original column."""
    patterns = patterns if patterns is not None else {"<EMAIL>": EMAIL_RE}
    out = F.col(text)
    for tag, regex in sorted(patterns.items()):
        out = F.regexp_replace(out, regex, tag)
    return df.withColumn("redacted", out)


# ---------------------------------------------------------------------------
# Trained BPE (Sennrich et al. 2016): learn merges once on a bounded
# driver-side sample (how every production vocab is built — GPT-2's was
# trained offline, then applied corpus-wide), tokenize the corpus with the
# learned ranks in one Arrow pass. Pure integer/string ops — no floats —
# so the golden oracle pins exactly on any engine.
# ---------------------------------------------------------------------------

BPE_END = "</w>"


def _bpe_words(text: str) -> list[tuple[str, ...]]:
    """Whitespace pre-tokenization → per-word symbol tuples (chars + the
    end-of-word marker)."""
    return [
        tuple(w) + (BPE_END,) for w in text.split() if w
    ]


def bpe_train(
    corpus: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_sample: int = 256,
) -> list[tuple[str, str]]:
    """Learn BPE merges on the lowest-id ``train_sample`` documents
    (bounded driver work, the family's sampling contract). Deterministic:
    each round merges the pair with the highest total count, ties broken
    by the lexicographically smallest pair; stops early when no pair
    repeats. Returns the ordered merge list — the vocabulary."""
    rows = (
        corpus.filter(F.col(id_col) < train_sample)
        .orderBy(id_col)
        .select(F.col(text_col).alias("t"))
        .collect()
    )
    freqs: dict[tuple[str, ...], int] = {}
    for r in rows:
        for w in _bpe_words(r["t"] or ""):
            freqs[w] = freqs.get(w, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, n in freqs.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        for w, n in freqs.items():
            out = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            merged[nw] = merged.get(nw, 0) + n
        freqs = merged
    return merges


def bpe_apply_word(word: tuple[str, ...], ranks: dict[tuple[str, str], int]):
    """Greedy lowest-rank-first merging of one word — the standard BPE
    tokenize loop (always merge the best-ranked pair present; ties in
    rank are impossible, ranks are unique)."""
    w = list(word)
    while len(w) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(w) - 1):
            r = ranks.get((w[i], w[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        w[best_i : best_i + 2] = [w[best_i] + w[best_i + 1]]
    return w


def bpe_tokenize_stats(
    corpus: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_chars, n_words, n_bpe_tokens) per document with the
    LEARNED vocabulary applied — one Arrow pass, ranks broadcast in the
    closure (a 200-merge vocab is a few KB; a 50k production vocab is
    still closure-sized). n_bpe_tokens is the number the training-data
    budget actually pays for."""
    import pandas as pd

    from ..session import ensure_worker_imports as _ewi

    _ewi(corpus.sparkSession)
    ranks = {p: i for i, p in enumerate(merges)}

    def gen(batches):
        for pdf in batches:
            ids, ncs, nws, nts = [], [], [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                words = _bpe_words(t)
                ids.append(int(did))
                ncs.append(len(t))
                nws.append(len(words))
                nts.append(sum(len(bpe_apply_word(w, ranks)) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_chars": pd.Series(ncs, dtype="int64"),
                    "n_words": pd.Series(nws, dtype="int64"),
                    "n_bpe_tokens": pd.Series(nts, dtype="int64"),
                }
            )

    return corpus.select(id_col, text_col).mapInPandas(
        gen, "doc_id long, n_chars long, n_words long, n_bpe_tokens long"
    )


# ---------------------------------------------------------------------------
# N-gram language-model quality scoring (the CCNet/KenLM-style signal,
# distributable form): train bigram/unigram counts over a reference slice
# with plain groupBy aggregations — the LM table shuffles counts, never
# text — then score every document by its add-one-smoothed mean bigram
# log-probability via a join against the LM. Low (very negative) scores
# flag gibberish / boilerplate / out-of-domain text; the standard
# pretraining-corpus quality filter shape.
# ---------------------------------------------------------------------------

LOGP_MICRO = 1_000_000


def _word_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, prev, cur) word-bigram rows — lowercased whitespace words,
    narrow explode (no shuffle)."""
    words = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " "
    )
    return (
        df.select(F.col(id_col).alias("_id"), words.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    lambda w, i: F.struct(
                        w.alias("prev"),
                        F.element_at(F.col("ws"), i + 2).alias("cur"),
                    ),
                )
            ).alias("bg"),
        )
        .select("_id", "bg.prev", "bg.cur")
    )


def ngram_lm_train(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_max_id: int = 256,
) -> tuple[DataFrame, DataFrame, int]:
    """→ (bigram counts, unigram counts, vocab size) over the reference
    slice (ids < train_max_id). Pure groupBy aggregations — at 100 TB the
    LM is a count table you'd write once and broadcast/bucket, exactly
    like a production KenLM artifact."""
    train = corpus.filter(F.col(id_col) < train_max_id)
    bg = _word_bigrams(train, text_col, id_col)
    bigrams = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    unigrams = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c_uni"))
    vocab = bg.select("cur").union(bg.select("prev")).distinct().count()
    return bigrams, unigrams, int(vocab)


def ngram_lm_score(
    corpus: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, sum_logp_micro): per-document total add-one-
    smoothed bigram log-probability, ln((c_bg+1)/(c_uni+V)), each term
    ROUNDed to 6 decimals then summed EXACTLY in integer micro-units —
    the sum is order-free, so the result value-hashes identically at any
    parallelism (the repo's decimal-exact float contract). Unseen
    bigrams/contexts degrade to ln(1/V)-ish mass like any add-one LM.
    Plan: two broadcast-able joins against the count tables + one
    aggregation; document text never shuffles."""
    bg = _word_bigrams(corpus, text_col, id_col)
    # ONE rounding: ln(p)·1e6 → ROUND(…, 0) → long. (Rounding to 6
    # decimals and THEN multiplying would re-introduce float error ahead
    # of the cast; HALF_UP-at-zero-decimals is mirrored exactly by the
    # golden's spark_round(x, 0) — both round away from zero.)
    logp_micro = F.round(
        F.log(
            (F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(1.0))
            / (F.coalesce(F.col("c_uni"), F.lit(0)) + F.lit(float(vocab)))
        )
        * F.lit(float(LOGP_MICRO)),
        0,
    ).cast("long")
    scored = (
        bg.join(F.broadcast(bigrams), ["prev", "cur"], "left")
        .join(F.broadcast(unigrams), ["prev"], "left")
        .select("_id", logp_micro.alias("lp_micro"))
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp_micro").cast("long").alias("sum_logp_micro"),
    )


def _class_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) rows — lowercased whitespace tokens, narrow explode
    (the drift report's tokenization, shared by the NB classifier's train
    and score sides so train/score vocabularies agree by construction)."""
    words = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " "
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(words).alias("token"))
        .filter(F.col("token") != "")
    )


def nb_quality_train(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, int, int]:
    """Train the fastText-style NAIVE-BAYES quality classifier — the
    pretraining-data filter CCNet/LLaMA-class pipelines run ("does this
    page look like the reference corpus or like crawl noise"), in its
    distributable closed form: per-token log-likelihood ratios
    ``ln((c_pos+1)/(N_pos+V)) − ln((c_neg+1)/(N_neg+V))`` with add-one
    smoothing over the union vocabulary. Training is two token-count
    aggregations + one vocabulary-sized full-outer join — counts shuffle,
    text never does; at 100 TB the model is a token→LLR table you write
    once and broadcast, exactly like a production fastText artifact.

    → (llr table (token, llr_micro), unseen_micro, prior_micro): every
    term is ROUNDed once into integer micro-units (the repo's
    decimal-exact float contract — per-doc sums become order-free).
    ``unseen_micro`` is the LLR of a token in NEITHER class (NOT zero —
    add-one smoothing gives it ln(N_neg+V) − ln(N_pos+V)); ``prior_micro``
    is the class-prior log-odds from the training doc counts."""
    import math

    tp = _class_tokens(pos, text_col, id_col)
    tn = _class_tokens(neg, text_col, id_col)
    cp = tp.groupBy("token").agg(F.count(F.lit(1)).alias("c_pos"))
    cn = tn.groupBy("token").agg(F.count(F.lit(1)).alias("c_neg"))
    joined = cp.join(cn, "token", "full_outer").select(
        "token",
        F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
        F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
    )
    # three bounded scalars: class token totals + union vocabulary size
    totals = joined.agg(
        F.sum("c_pos").alias("np"), F.sum("c_neg").alias("nn"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_pos, n_neg, vocab = int(totals["np"]), int(totals["nn"]), int(totals["v"])
    llr_micro = F.round(
        (
            F.log((F.col("c_pos") + F.lit(1.0)) / F.lit(float(n_pos + vocab)))
            - F.log((F.col("c_neg") + F.lit(1.0)) / F.lit(float(n_neg + vocab)))
        )
        * F.lit(float(LOGP_MICRO)),
        0,
    ).cast("long")
    llr = joined.select("token", llr_micro.alias("llr_micro"))
    unseen_micro = int(
        round(
            (math.log(1.0 / (n_pos + vocab)) - math.log(1.0 / (n_neg + vocab)))
            * LOGP_MICRO
        )
    )
    d_pos, d_neg = pos.count(), neg.count()
    prior_micro = int(
        round(
            (math.log(d_pos / (d_pos + d_neg)) - math.log(d_neg / (d_pos + d_neg)))
            * LOGP_MICRO
        )
    )
    return llr, unseen_micro, prior_micro


def nb_quality_score(
    docs: DataFrame,
    llr: DataFrame,
    unseen_micro: int,
    prior_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, score_micro, predicted_hq): per-document
    naive-Bayes log-odds — prior + Σ token LLRs (unseen tokens take the
    smoothed unseen constant, never zero), summed EXACTLY in integer
    micro-units so the value hashes identically at any parallelism.
    ``predicted_hq`` = score > 0, the keep/drop filter signal. Every
    input doc gets a verdict: a doc that tokenizes to ZERO tokens
    (empty/whitespace-only text) scores the PRIOR alone — the aggregation
    runs over exploded tokens, so token-less docs are restored by a left
    join back to the distinct input ids instead of silently vanishing
    from a keep/drop consumer's view (r9 ADVICE). Plan: one broadcast
    join against the (vocabulary-sized) LLR table + one aggregation + one
    id-only join-back; document text never shuffles."""
    toks = _class_tokens(docs, text_col, id_col)
    scored = toks.join(F.broadcast(llr), "token", "left").select(
        "_id",
        F.coalesce(F.col("llr_micro"), F.lit(unseen_micro)).alias("llr_micro"),
    )
    agg = scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("llr_micro") + F.lit(prior_micro))
        .cast("long")
        .alias("score_micro"),
    )
    all_ids = docs.select(F.col(id_col)).distinct()
    return all_ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("score_micro", F.lit(prior_micro))
        .cast("long")
        .alias("score_micro"),
    ).select(
        id_col,
        "n_tokens",
        "score_micro",
        (F.col("score_micro") > 0).alias("predicted_hq"),
    )


def _hashed_grams(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) rows — DSIR's hashed n-gram features: lowercase
    whitespace unigrams + bigrams, md5-hashed into ``n_buckets`` buckets
    (the same md5-prefix integer trick as the bloom positions — one
    deterministic cross-engine hash family for the whole repo). Narrow
    explode; the text never shuffles."""
    words = F.split(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " "
    )
    w = F.filter(words, lambda t: t != "")
    n = F.size(w)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(w, 1, n - 1),
            F.slice(w, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(w, bigrams)
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return df.select(
        F.col(id_col).alias("_id"), F.explode(grams).alias("gram")
    ).select("_id", bucket.alias("bucket"))


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> tuple[DataFrame, int]:
    """Fit DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169), the pretraining-data selector that picks raw
    web documents whose hashed-n-gram profile looks like a trusted target
    corpus: per-bucket importance log-ratio ``ln p_target(b) −
    ln p_raw(b)`` with add-one smoothing over the bucket space. Fitting
    is two count aggregations over (doc, bucket) explodes + one
    bucket-space full-outer join — counts shuffle (≤ n_buckets rows),
    text never does; at 100 TB the fitted model is a ≤ n_buckets-row
    table you broadcast, exactly like the NB classifier's LLR table.

    → (lr table (bucket, lr_micro), unseen_lr_micro): every ratio is
    ROUNDed once into integer micro-units (the repo's decimal-exact
    float contract — per-doc sums become order-free).
    ``unseen_lr_micro`` covers buckets absent from BOTH corpora."""
    import math

    tg = _hashed_grams(target, text_col, id_col, n_buckets)
    rg = _hashed_grams(raw, text_col, id_col, n_buckets)
    ct = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    cr = rg.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    joined = ct.join(cr, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("c_t", F.lit(0)).alias("c_t"),
        F.coalesce("c_r", F.lit(0)).alias("c_r"),
    )
    totals = joined.agg(
        F.sum("c_t").alias("nt"), F.sum("c_r").alias("nr")
    ).collect()[0]
    n_t, n_r = int(totals["nt"]), int(totals["nr"])
    lr_micro = F.round(
        (
            F.log((F.col("c_t") + F.lit(1.0)) / F.lit(float(n_t + n_buckets)))
            - F.log((F.col("c_r") + F.lit(1.0)) / F.lit(float(n_r + n_buckets)))
        )
        * F.lit(float(LOGP_MICRO)),
        0,
    ).cast("long")
    lr = joined.select("bucket", lr_micro.alias("lr_micro"))
    unseen = int(
        round(
            (
                math.log(1.0 / (n_t + n_buckets))
                - math.log(1.0 / (n_r + n_buckets))
            )
            * LOGP_MICRO
        )
    )
    return lr, unseen


def dsir_score(
    docs: DataFrame,
    lr: DataFrame,
    unseen_lr_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """(doc_id, n_grams, logweight_micro): per-document DSIR importance
    log-weight — Σ over the doc's hashed n-grams of the bucket log-ratio
    (buckets unseen at fit time take the smoothed constant), summed
    EXACTLY in integer micro-units. Every input doc gets a row: gram-less
    docs (empty/whitespace text) score 0 via the id join-back — the same
    no-silent-drop contract as :func:`nb_quality_score`. Plan: one
    broadcast join against the ≤ n_buckets-row table + one aggregation."""
    grams = _hashed_grams(docs, text_col, id_col, n_buckets)
    scored = grams.join(F.broadcast(lr), "bucket", "left").select(
        "_id",
        F.coalesce(F.col("lr_micro"), F.lit(unseen_lr_micro)).alias("lr_micro"),
    )
    agg = scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("lr_micro").cast("long").alias("logweight_micro"),
    )
    all_ids = docs.select(F.col(id_col)).distinct()
    return all_ids.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("logweight_micro", F.lit(0)).cast("long").alias(
            "logweight_micro"
        ),
    )


def dsir_select(
    target: DataFrame,
    pool: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """The full DSIR selection pass: fit p on ``target`` and q on the
    raw ``pool`` itself (the paper's estimator — q is the pool's own
    distribution), score every pool doc, and flag the top ``k`` by
    (logweight desc, id) as ``selected`` — the deterministic-rank
    variant of the paper's gumbel-top-k resample (ranking by weight is
    the zero-temperature limit; a seeded gumbel perturbation drops in as
    one extra column without changing the plan shape). Returns ALL
    scored pool docs with the flag, so the caller audits the margin,
    not just the winners.

    Plan shape: NO global window (a pool-sized row_number would funnel
    every row through one partition). The k-th (weight, id) pair comes
    from an ``orderBy().limit(k)`` — TakeOrderedAndProject: per-partition
    top-k + a k-row driver merge — reduced to a 1-row threshold that
    broadcast-joins back; the flag is a scan-local struct comparison."""
    if k < 1:
        # limit(0) would make the agg-max threshold NULL and silently
        # turn 'selected' NULL for every row — fail loudly instead
        raise ValueError(f"dsir_select requires k >= 1, got {k}")
    lr, unseen = dsir_fit(target, pool, text_col, id_col, n_buckets)
    scored = dsir_score(pool, lr, unseen, text_col, id_col, n_buckets)
    okey = F.struct(
        (-F.col("logweight_micro")).alias("negw"), F.col(id_col).alias("oid")
    )
    kth = (
        scored.orderBy(F.col("logweight_micro").desc(), F.col(id_col))
        .limit(k)
        .agg(F.max(okey).alias("kth"))
    )
    return scored.crossJoin(F.broadcast(kth)).select(
        id_col,
        "n_grams",
        "logweight_micro",
        (okey <= F.col("kth")).alias("selected"),
    )


def token_distribution_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    top: int = 20,
) -> DataFrame:
    """Corpus drift report — which tokens drove the shift between two
    snapshots: per-token KL contribution ``p_new · ln(p_new / p_old)``
    with add-one smoothing over the union vocabulary, micro-rounded per
    term (order-free integer sums — the LM-score contract), top
    ``top`` contributors by (contribution desc, token). Counts are plain
    groupBy aggregations; the only join is old-vs-new token counts —
    vocabulary-sized, never corpus-sized. The monitoring primitive for
    "did today's crawl change distribution" gates."""
    def counts(df: DataFrame, name: str) -> DataFrame:
        words = F.explode(
            F.split(
                F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "),
                " ",
            )
        )
        return (
            df.select(words.alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    co = counts(old, "c_old")
    cn = counts(new, "c_new")
    j = co.join(cn, "token", "full_outer").select(
        "token",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    tot = j.agg(
        F.sum("c_old").alias("t_old"),
        F.sum("c_new").alias("t_new"),
        F.count(F.lit(1)).alias("v"),
    )
    withp = j.crossJoin(F.broadcast(tot))
    p_new = (F.col("c_new") + F.lit(1.0)) / (F.col("t_new") + F.col("v"))
    p_old = (F.col("c_old") + F.lit(1.0)) / (F.col("t_old") + F.col("v"))
    contrib = F.round(p_new * F.log(p_new / p_old) * F.lit(1e9), 0).cast("long")
    # heavy cut first: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition top-N + driver merge — no single-partition window
    # over the full vocabulary); the rank window then sees ≤ top rows
    topped = (
        withp.select("token", "c_old", "c_new", contrib.alias("kl_nano"))
        .orderBy(F.col("kl_nano").desc(), "token")
        .limit(top)
    )
    w = Window.orderBy(F.col("kl_nano").desc(), F.col("token"))
    return topped.withColumn("drift_rank", F.row_number().over(w))
