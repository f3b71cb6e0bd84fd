"""Text-analysis operators for training-data pipelines (engine additions).

Language-ID (stopword voting), quality scoring (length/punct/token ratios),
token counting, and document fingerprinting — all pure Column expressions
(JVM codegen, no UDFs) so they run at scan speed and stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import tokens

# tiny per-language stopword sets for the n-gram/stopword-vote heuristic;
# deterministic and shared verbatim with the DuckDB oracle
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "de", "et", "un"],
    "es": ["el", "la", "de", "y", "un"],
    "zh": ["的", "是", "了", "在", "我"],
}
LANGS = sorted(STOPWORDS)  # deterministic vote order


def _isin_filter(words: list[str]):
    # NOTE: F.filter passes (element, index) to 2-arg lambdas — the closure
    # must be built with exactly one parameter.
    return lambda t: t.isin(*words)


def lang_votes(text: Column) -> list[Column]:
    """Stopword hit-count per language over the token array."""
    toks = tokens(text)
    return [F.size(F.filter(toks, _isin_filter(STOPWORDS[lang]))) for lang in LANGS]


def lang_guess(text: Column) -> Column:
    """argmax language by stopword votes; ties → first in sorted LANGS order;
    zero votes → 'und' (undetermined)."""
    votes = lang_votes(text)
    best = F.greatest(*votes)
    guess = F.lit("und")
    for lang, v in reversed(list(zip(LANGS, votes))):
        guess = F.when(v == best, F.lit(lang)).otherwise(guess)
    return F.when(best > 0, guess).otherwise(F.lit("und"))


def langid(docs: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """DataFrame-level language ID: materializes the token array and the five
    vote counts as staged columns so each interpreted array-filter runs once
    per row (``lang_guess`` as a bare Column inlines ``tokens(text)`` into
    every vote AND re-evaluates each vote in the argmax chain)."""
    staged = docs.withColumn("__toks", tokens(F.col(text_col)))
    vote_cols = {
        f"__v_{lang}": F.size(F.filter(F.col("__toks"), _isin_filter(STOPWORDS[lang])))
        for lang in LANGS
    }
    staged = staged.withColumns(vote_cols)
    best = F.greatest(*[F.col(f"__v_{lang}") for lang in LANGS])
    guess = F.lit("und")
    for lang in reversed(LANGS):
        guess = F.when(F.col(f"__v_{lang}") == best, F.lit(lang)).otherwise(guess)
    staged = staged.withColumn(out_col, F.when(best > 0, guess).otherwise(F.lit("und")))
    return staged.drop("__toks", *vote_cols)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenizer: word pieces, numbers, and single punctuation marks
# as separate tokens (the GPT-2 pre-tokenizer shape, simplified to a
# portable character-class regex shared verbatim with the DuckDB oracle)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens: letter runs, single digits, single
    punctuation. A cheap, deterministic proxy for LLM token budgeting
    (letter runs then subdivide ~4 chars/token downstream)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def punct_count(text: Column) -> Column:
    """Count of .,;:!? characters (identical char class in the oracle)."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features (length, tokens, type-token ratio, mean token
    length, punctuation ratio).

    The token array and distinct-token count are materialized in separate
    projections: higher-order array functions are interpreted (no codegen),
    and inlining ``tokens(text)`` into every feature re-runs the split+filter
    up to 6× per row. CollapseProject keeps non-cheap expressions
    materialized, so each is evaluated once (measured 6×: 2.12 s → 0.34 s on
    5k docs at sf0.1)."""
    t = F.col(text_col)
    staged = docs.withColumn("__toks", tokens(t)).withColumn(
        "__n_tok", F.size("__toks")
    ).withColumn("__n_dis", F.size(F.array_distinct("__toks")))
    n_tok = F.col("__n_tok")
    n_dis = F.col("__n_dis")
    n_chars = F.length(t)
    return staged.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tok,
            "n_distinct_tokens": n_dis,
            "ttr": F.round(
                n_dis.cast("double") / F.nullif(n_tok.cast("double"), F.lit(0.0)),
                6,
            ),
            "mean_tok_len": F.round(
                (n_chars - n_tok + 1).cast("double") / F.nullif(n_tok.cast("double"), F.lit(0.0)), 6
            ),
            "punct_ratio": F.round(
                punct_count(t).cast("double") / F.nullif(n_chars.cast("double"), F.lit(0.0)), 6
            ),
        }
    ).drop("__toks", "__n_tok", "__n_dis")


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Corpus-level TF-IDF: (doc, token, tf, df, tfidf = tf · ln(N/df)).

    Two aggregations over the exploded token stream — per-(doc, token)
    term frequency, then per-token document frequency — plus a 1-row
    broadcast of the corpus size (the j5 scalar-broadcast pattern, no
    collect). Shuffle volume is |distinct (doc, token)| rows; nothing is
    quadratic and nothing touches the driver, so the same plan runs on a
    100 TB corpus. ``min_df`` prunes the long hapax tail before the join
    when set > 1."""
    tk = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = tk.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n = docs.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    return (
        tf.join(dfreq, "tok")
        .join(F.broadcast(n))
        .select(
            id_col,
            "tok",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("tfidf"),
        )
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: the fraction of the token stream
    consumed by the single most frequent token and by the most frequent
    bigram (high values ⇒ boilerplate/spam; the standard pre-training
    quality filters threshold on them).

    Shape: explode tokens/bigrams → two-level aggregate (count per term,
    then max/total per doc) — all map-side-combinable groupBys, shuffle
    volume |distinct (doc, term)|. Only the max COUNT is emitted (not the
    argmax term), so ties cannot make results engine-dependent."""
    staged = docs.select(id_col, tokens(F.col(text_col)).alias("__toks"))
    big = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__toks", i), F.element_at("__toks", i + F.lit(1))
            ),
        ),
    ).otherwise(F.array())
    staged = staged.withColumn("__bigrams", big)

    # single pass: tag tokens 0 / bigrams 1 in ONE exploded stream, one
    # (doc, tag, term) count, one per-doc aggregate with conditional
    # sums/maxes — half the shuffles of two separate explode+agg chains
    # and no join (measured 1.96 s → 1.0 s warm at sf0.01)
    tagged = staged.select(
        id_col,
        F.explode(
            F.concat(
                F.transform(F.col("__toks"), lambda t: F.struct(F.lit(0).alias("g"), t.alias("t"))),
                F.transform(F.col("__bigrams"), lambda t: F.struct(F.lit(1).alias("g"), t.alias("t"))),
            )
        ).alias("e"),
    ).select(id_col, F.col("e.g").alias("g"), F.col("e.t").alias("t"))
    per_term = tagged.groupBy(id_col, "g", "t").agg(F.count("*").alias("n"))
    tok_n = F.when(F.col("g") == 0, F.col("n"))
    bg_n = F.when(F.col("g") == 1, F.col("n"))
    agg = per_term.groupBy(id_col).agg(
        F.sum(tok_n).alias("tok_total"),
        F.max(tok_n).alias("tok_top_n"),
        F.coalesce(F.sum(bg_n), F.lit(0)).alias("bigram_total"),
        F.coalesce(F.max(bg_n), F.lit(0)).alias("bigram_top_n"),
    )
    return agg.select(
        id_col,
        "tok_total",
        "tok_top_n",
        F.round(
            F.col("tok_top_n").cast("double")
            / F.nullif(F.col("tok_total").cast("double"), F.lit(0.0)),
            6,
        ).alias("top_token_frac"),
        "bigram_total",
        "bigram_top_n",
        F.round(
            F.col("bigram_top_n").cast("double")
            / F.nullif(F.col("bigram_total").cast("double"), F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every k-token shingle, then keep the minimum hash of
    each sliding window of ``window`` consecutive shingle hashes; the
    distinct kept hashes are the document's fingerprint set.

    Winnowing guarantees any shared run of ≥ k + window - 1 tokens yields at
    least one shared fingerprint — position-robust containment detection
    (vs ``fingerprint()``'s whole-document hash), the standard tool for
    finding training-data contamination by excerpt at corpus scale.

    Plan shape: ZERO shuffles before the output — the shingle-hash array,
    the sliding-window minima, and the per-doc distinct all run as JVM
    array expressions (``transform``/``slice``/``array_min``/
    ``array_distinct``) inside the scan projection; the only explode is
    the final fingerprint output. An earlier explode+window-min
    formulation cost a per-doc sort and shuffled every shingle hash —
    3.5× slower at sf0.1 (3.95 s → 1.11 s) with identical output.

    The shingle hash is the md5-hex prefix idiom (``operators/dedup.py``)
    so a DuckDB oracle reproduces it byte-for-byte.
    """
    toks = tokens(F.col(text_col))
    # guard: Spark's sequence(1, n) DESCENDS when n < 1 — emit an empty
    # list for docs shorter than k tokens (or with no full window) instead
    n_grams = F.size("__toks") - F.lit(k - 1)
    gram_idx = F.when(
        F.size("__toks") >= k, F.sequence(F.lit(1), n_grams)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        gram_idx,
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), i, k))), 1, 12), 16, 10
        ).cast("bigint"),
    )
    n_windows = F.size("__ghash") - F.lit(window - 1)
    win_idx = F.when(
        F.size("__ghash") >= window, F.sequence(F.lit(1), n_windows)
    ).otherwise(F.array().cast("array<int>"))
    fps = F.array_distinct(
        F.transform(win_idx, lambda i: F.array_min(F.slice(F.col("__ghash"), i, window)))
    )
    return (
        docs.withColumn("__toks", toks)
        .withColumn("__ghash", grams)
        .select(id_col, F.explode(fps).alias("fp"))
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    strip punctuation, md5. Robust to formatting-only edits."""
    norm = F.regexp_replace(F.lower(text), r"[.,;:!?]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)


# PII patterns shared verbatim with the DuckDB oracle. Kept to the regex
# subset Java's engine and RE2 interpret identically (char classes, bounded
# repetition, \d, \b) — no lookarounds or backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """PII scrubbing for training corpora: replace emails / IPv4 addresses /
    international-format phone numbers with typed placeholder tags and count
    each. Pure ``regexp_replace`` / ``regexp_extract_all`` Column
    expressions — scan-speed, whole-stage codegen, no UDF. Redaction order
    (email → ip → phone) is fixed so overlapping matches resolve
    deterministically."""
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    return df.withColumns(
        {
            "n_emails": F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), 0)),
            "n_ips": F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), 0)),
            "n_phones": F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), 0)),
            out_col: red,
        }
    )


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the whitespace-token
    distribution — a lexical-diversity quality signal (low entropy ⇒
    repetitive/boilerplate text; complements the Gopher-style top-fraction
    signals in :func:`repetition_features`). Uses the identity
    H = ln N − (Σ n·ln n)/N so the whole thing is one explode and two
    ordinary aggregations (both with map-side partial combine) — no window,
    no join; shuffle volume is distinct (doc, token), same as any per-doc
    term stat."""
    term = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("t"))
    per_term = term.groupBy(id_col, "t").agg(F.count("*").alias("n"))
    n = F.col("n").cast("double")
    agg = per_term.groupBy(id_col).agg(
        F.count("*").alias("n_types"),
        F.sum("n").alias("n_tokens"),
        F.sum(n * F.log(n)).alias("__nlogn"),
    )
    tot = F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_types",
        "n_tokens",
        F.round(F.log(tot) - F.col("__nlogn") / tot, 6).alias("entropy"),
    )


def normalize_text(text: Column) -> Column:
    """UTF-8 hygiene pass every web-scraped corpus needs before anything
    tokenizes it: lowercase → control characters to spaces → whitespace
    runs squeezed to one space → trim. Pure codegen regex chain (scan
    speed, no shuffle); the character classes are the ASCII-safe subset
    that Java regex (Spark) and RE2 (DuckDB oracle) interpret identically.
    Real corpora add NFC/NFKC unicode normalization here — that needs ICU,
    which Spark exposes only via UDF; kept out of the hot path by design."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[\\x00-\\x1f\\x7f]", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    return F.trim(t)


def pmi_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the classic
    collocation detector ("new york" scores high, "of the" doesn't) used
    to mine multi-word expressions from a corpus before tokenizer
    training. One explode produces the bigram stream (volume = token
    count, bounded); margins are windows over the DISTINCT-bigram table —
    margins must be computed before the min-count filter or the
    denominators would be biased. PMI = ln(c₁₂·N / (c₁·c₂)) on exact
    BIGINT counts."""
    t = docs.select(tokens(F.col(text_col)).alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = t.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i).alias("w1"),
                    F.element_at(F.col("toks"), i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("bg")
    )
    c = bg.select("bg.w1", "bg.w2").groupBy("w1", "w2").agg(
        F.count("*").alias("n")
    )
    # margins: per-word windows partition by the word (bounded per key);
    # the GLOBAL total must NOT be an unpartitioned window — the distinct-
    # bigram table is vocab²-shaped at scale, so a single-partition window
    # over it is a scale trap. A 1-row aggregate broadcast (the scalar-
    # broadcast pattern) costs one extra tiny stage instead.
    cl = F.sum("n").over(Window.partitionBy("w1")).cast("double")
    cr = F.sum("n").over(Window.partitionBy("w2")).cast("double")
    tot = c.agg(F.sum("n").alias("nn_total"))
    m = c.join(F.broadcast(tot)).select(
        "w1",
        "w2",
        "n",
        F.log(
            F.col("n").cast("double")
            * F.col("nn_total").cast("double")
            / (cl * cr)
        ).alias("pmi"),
    )
    return m.filter(F.col("n") >= min_count)


def readability_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease feature per document — the classic quality
    signal corpus filters threshold on (very low scores flag boilerplate
    / machine-generated sludge). Words = whitespace tokens; sentences =
    terminal-punctuation runs (floored at 1 for fragments); syllables ≈
    vowel-group runs per lowercased text (the standard cheap proxy).
    Pure codegen expressions — scan-speed, no UDF; the regex classes
    ([aeiouy]+, [.!?]+) evaluate identically in Java regex and RE2."""
    words = F.size(tokens(F.col(text_col))).cast("double")
    sentences = F.greatest(
        F.lit(1.0), F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("double")
    )
    syllables = F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")).cast(
        "double"
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / F.greatest(words, F.lit(1.0)))
    )
    return docs.select(
        id_col,
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        flesch.alias("flesch"),
    )


# unicode-block character classes — the SAME \x{hhhh} range syntax parses
# in Java regex (Spark) and RE2 (DuckDB), so the oracle is exact
SCRIPT_RANGES = {
    "latin": r"[A-Za-z]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "cjk": r"[\x{4E00}-\x{9FFF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
}


def script_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Writing-system composition per document: per-script character
    counts (unicode-block ranges, SCRIPT_RANGES) and the dominant script
    with a deterministic fixed-order tiebreak ('other' when no script
    chars at all). Complements the stopword-vote ``langid``: script
    routing catches ru/el/zh/ar text with zero stopword coverage and
    flags mixed-script spam (a classic corpus-poisoning signature).
    NULL text counts as empty (all-zero counts, dominant 'other') — the
    deterministic convention the exact oracle mirrors with
    coalesce(text, ''). Pure codegen regexp_count expressions —
    scan-speed, zero shuffle."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat in SCRIPT_RANGES.items()
    }
    names = list(SCRIPT_RANGES)
    top = F.greatest(*[counts[n] for n in names])
    dominant = F.when(top == 0, F.lit("other"))
    for n in names:  # fixed declaration order = deterministic tiebreak
        dominant = dominant.when(counts[n] == top, F.lit(n))
    return docs.select(
        id_col,
        *[counts[n].alias(f"n_{n}") for n in names],
        dominant.alias("dominant_script"),
    )


def canonicalize_url(url: Column) -> dict[str, Column]:
    """URL canonicalization — the web-corpus dedup key. Returns a dict of
    columns: ``canon_url`` (lower-cased scheme/host, leading ``www.``
    stripped, default port dropped (:80 http / :443 https), empty path
    → ``/``, query parameters SORTED, fragment dropped), ``host`` (the
    canonical host) and ``domain`` (last two host labels — the naive
    registrable domain; a real deployment swaps in the Public Suffix
    List, which is data, not code). Pure JVM expressions (regexp_extract
    on simple ``[^…]`` classes that parse identically in Java regex and
    RE2, split + array_sort for the query) — codegen, zero shuffle,
    exact-string oracle-able."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host0 = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    host = F.regexp_replace(host0, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path0 = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return {
        "canon_url": F.when(scheme == "", F.lit(None)).otherwise(canon),
        "host": F.when(scheme == "", F.lit(None)).otherwise(host),
        "domain": F.when(scheme == "", F.lit(None)).otherwise(domain),
    }


def html_extract(html: Column) -> Column:
    """HTML → visible text, the pretraining-ingest extraction step:
    script/style blocks and comments removed, block-closing tags
    (</p>, </div>, </li>, </h1-6>, </tr>, </title>, <br>) become
    newlines, remaining tags become spaces, the common entities decode
    (&amp; LAST so double-encoded entities stop at one level, per the
    standard), whitespace collapses (runs of spaces/tabs → one space,
    spaces around newlines dropped, newline runs → one) and the ends
    trim. Pure JVM regexp_replace chain — codegen, zero shuffle. This is
    the jusText-class cheap path; a DOM-accurate extraction is a library
    concern (trafilatura et al.), not an engine one."""
    t = F.regexp_replace(html, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/title)\b[^>]*>", "\n"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")
