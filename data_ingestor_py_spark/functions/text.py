"""Text analysis over the ``documents`` table: tokenization, quality
scoring, language ID, fingerprinting.

All pure Catalyst expressions (whole-stage codegen, no Python). Every
function has an exact DuckDB-SQL twin in ``__spark_entry__.oracle_sql`` —
the shared primitive is the engine-portable token hash
``H(t) = int(sha256(t)[:8], 16)`` (Spark: conv(substr(sha2,...)); DuckDB:
('0x'||substr(sha256,...))::BIGINT), so fingerprints/minhash/simhash are
bit-identical across engines.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve module-globally
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer: runs of letters, runs of digits, single punctuation.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword dictionaries (public common words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "auf"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "zh": ["de", "shi", "le", "zai", "you", "he", "wo", "ta", "men", "zhe"],
}

HASH_MOD = 2_147_483_647  # 2^31 - 1
FP_BASE = 131


def tokens(col: str | Column, pattern: str = " ") -> Column:
    """Whitespace tokens (non-empty)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != "")


def regex_tokens(col: str | Column) -> Column:
    """BPE-ish regex tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0)


def token_hash(tok: Column) -> Column:
    """Engine-portable 32-bit token hash (matches the DuckDB twin exactly)."""
    return F.conv(F.substring(F.sha2(tok, 256), 1, 8), 16, 10).cast("long")


def token_count(col: str | Column) -> Column:
    return F.size(regex_tokens(col))


# ---------------- BPE tokenizer (real merges table) ----------------
#
# Training pipelines budget by real BPE tokens, not regex proxies. This is
# a from-scratch byte-pair tokenizer with a PRECISE, engine-portable
# semantics: each merge rule is applied as ``BPE_PASSES`` consecutive
# leftmost non-overlapping string-replacement passes (the shared semantics
# of Java String.replace, Python str.replace, and DuckDB replace — all
# scan left-to-right and resume AFTER the replacement), rules in rank
# order. One pass of ``replace`` can miss an occurrence whose leading
# separator was consumed by the previous match (adjacent repeats like
# "hahaha"); repeated passes converge, and 4 passes cover adjacent-repeat
# chains far beyond natural-word lengths — within that bound the result
# coincides with textbook exhaustive-in-rank-order BPE (rank order is
# stable under merging because every new adjacency involves the newly
# created symbol, which no lower-ranked rule can reference).
#
# Three implementations of the SAME spec:
# - :func:`bpe_token_count` — pure Catalyst (whole-stage codegen chain of
#   replaces; the 100 TB hot path for a bounded merges table);
# - :func:`bpe_token_count_udf` — Arrow pandas UDF with a per-batch word
#   cache (the path for large merge tables, where a K-rule Catalyst
#   expression chain stops being reasonable);
# - :func:`bpe_count_reference` — driver-side pure Python (the parity
#   oracle for both).

BPE_SEP = "\x1f"  # unit separator: cannot appear in text tokens
BPE_PASSES = 4

# Fixture merges (rank order). Valid BPE shape: every multi-char input is
# the output of an earlier rule.
DEFAULT_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"),
    ("in", "g"), ("t", "o"), ("o", "u"), ("a", "t"),
]


def _bpe_segment_expr(word: Column, merges, passes: int) -> Column:
    """``\\x1f``-delimited symbol string for one word after the merge
    chain: ``'·h·e·l·l·o·'`` -> merges applied -> count separators."""
    s = F.concat(
        F.lit(BPE_SEP),
        # (?s): a whitespace-split token can still contain \n, which '.'
        # would skip, desyncing from the Python reference
        F.regexp_replace(word, "(?s)(.)", "$1" + BPE_SEP),
    )
    for a, b in merges:
        pat = F.lit(f"{BPE_SEP}{a}{BPE_SEP}{b}{BPE_SEP}")
        rep = F.lit(f"{BPE_SEP}{a}{b}{BPE_SEP}")
        for _ in range(passes):
            s = F.replace(s, pat, rep)
    return s


def bpe_token_count(
    col: str | Column,
    merges: list[tuple[str, str]] | None = None,
    passes: int = BPE_PASSES,
) -> Column:
    """Per-document BPE token count over whitespace words, pure Catalyst
    (no Python in the data path): each word becomes a separator-delimited
    symbol string, the merge chain is a fixed sequence of ``replace``
    expressions inside one projection, and the count is
    ``size(split(s, sep)) - 2``. Exact DuckDB twin in oracle_sql()."""
    merges = DEFAULT_BPE_MERGES if merges is None else list(merges)
    words = tokens(col)
    return F.coalesce(
        F.aggregate(
            words,
            F.lit(0),
            lambda acc, w: acc
            + F.size(F.split(_bpe_segment_expr(w, merges, passes), BPE_SEP))
            - 2,
        ),
        F.lit(0),  # NULL text counts zero, matching the UDF and the oracle
    )


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    passes: int = BPE_PASSES,
) -> DataFrame:
    return df.select(
        "doc_id",
        bpe_token_count(text_col, merges, passes)
        .cast("long")
        .alias("n_tokens_bpe"),
    )


def _bpe_count_word(w: str, merges, passes: int) -> int:
    s = BPE_SEP + BPE_SEP.join(w) + BPE_SEP
    for a, b in merges:
        pat = f"{BPE_SEP}{a}{BPE_SEP}{b}{BPE_SEP}"
        rep = f"{BPE_SEP}{a}{b}{BPE_SEP}"
        for _ in range(passes):
            if pat not in s:
                break
            s = s.replace(pat, rep)
    return s.count(BPE_SEP) - 1


def bpe_count_reference(
    text: str | None,
    merges: list[tuple[str, str]] | None = None,
    passes: int = BPE_PASSES,
) -> int:
    """Driver-side pure-Python reference of the exact same spec."""
    if text is None:
        return 0
    merges = DEFAULT_BPE_MERGES if merges is None else list(merges)
    return sum(
        _bpe_count_word(w, merges, passes) for w in text.split(" ") if w
    )


def bpe_token_count_udf(
    merges: list[tuple[str, str]] | None = None, passes: int = BPE_PASSES
):
    """Arrow-vectorized BPE token counter: the merges table is captured in
    the UDF closure (broadcast with the task), words are de-duplicated per
    Arrow batch through a cache (Zipf word frequency makes the cache hit
    rate high), and the per-word algorithm is the same spec as the
    Catalyst path. Use this when the merge table is too large to unroll
    into a Catalyst expression chain."""
    from pyspark.sql.functions import pandas_udf

    mg = list(DEFAULT_BPE_MERGES if merges is None else merges)

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def word(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = cache[w] = _bpe_count_word(w, mg, passes)
            return n

        return texts.map(
            lambda t: 0
            if t is None
            else sum(word(w) for w in t.split(" ") if w)
        )

    return _count


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + flag.

    Mirrors what a pretraining-data quality filter computes; all counts are
    integers so the oracle comparison is exact.
    """
    toks = tokens(text_col)
    rtoks = regex_tokens(text_col)
    n_ws = F.size(toks)
    n_rx = F.size(rtoks)
    n_punct = F.size(F.filter(rtoks, lambda t: t.rlike("^[^A-Za-z0-9]$")))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    n_chars = F.length(F.col(text_col))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_ws.alias("n_tokens_ws"),
        n_rx.alias("n_tokens_rx"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop_distinct"),
        (
            (n_ws >= 5) & (n_chars >= 50) & ((n_punct.cast("double") / F.greatest(n_rx, F.lit(1))) < 0.2)
        ).alias("is_quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-free heuristic language ID: distinct-stopword hits per
    language, argmax with lexicographic tie-break (S7's mode-argmax pattern
    generalized)."""
    toks = tokens(text_col)
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            # invert name for tie-break: higher struct wins, so ties pick
            # the lexicographically SMALLEST language name deterministically
            F.lit("".join(chr(255 - ord(ch)) for ch in lang)).alias("inv"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    best = F.greatest(*scores)
    return df.select("doc_id", F.col("lang").alias("true_lang"), best["lang"].alias("pred_lang"),
                     best["hits"].alias("stop_hits"))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash over the whitespace token stream:
    acc = (acc * 131 + H(tok) % P) % P with P = 2^31-1. Order-sensitive —
    a document fingerprint, not a bag hash."""
    toks = tokens(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + token_hash(t) % HASH_MOD) % HASH_MOD,
    )
    return df.select("doc_id", fp.alias("fingerprint"))


def split_assign(
    id_col: str | Column,
    weights: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 42,
) -> Column:
    """Deterministic train/val/test assignment: hash the id with the shared
    sha-prefix primitive, bucket into sum(weights) cells, map cell ranges to
    split names. Content-stable (reshuffling/reloading the data never moves
    a document between splits) and exactly reproducible in SQL — the
    property random() splits lack."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    total = sum(weights)
    h = F.conv(
        F.substring(F.sha2(F.concat(F.lit(f"{seed}:"), c.cast("string")), 256), 1, 8),
        16, 10,
    ).cast("long") % total
    cum = 0
    expr = None
    for w, name in zip(weights, names):
        cum += w
        cond = h < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(names[-1])


def build_vocab(df: DataFrame, text_col: str = "text", top_k: int = 100) -> DataFrame:
    """Vocabulary construction: whitespace tokens ranked by (count desc,
    token asc); token id = dense rank starting at 0.

    Shrink first, then rank: ``orderBy(...).limit(top_k)`` compiles to
    TakeOrderedAndProject — every partition keeps only its local top_k, so
    the corpus-wide distinct-token set never funnels through one task. The
    global row_number window then runs over at most ``top_k`` rows (the id
    table is broadcast-sized by construction)."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.withColumn("token_id", F.row_number().over(w) - 1)
        .select("token", "token_id", "cnt")
    )


def _sha_long(c: Column, seed: int = 42, nchars: int = 8) -> Column:
    """Engine-portable salted hash: int(sha256(f"{seed}:{v}")[:nchars], 16)
    (DuckDB twin: ('0x'||substr(sha256('{seed}:'||v),1,nchars))::BIGINT).
    nchars=8 gives 32 bits; 15 gives 60 bits (the most that fits a signed
    BIGINT in both engines) for callers whose modulus can exceed 2^32."""
    return F.conv(
        F.substring(F.sha2(F.concat(F.lit(f"{seed}:"), c.cast("string")), 256), 1, nchars),
        16, 10,
    ).cast("long")


def _sha_bucket(c: Column, mod: int, seed: int = 42) -> Column:
    """32-bit variant of :func:`_sha_long`, reduced mod ``mod``."""
    return _sha_long(c, seed) % mod


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Concat-then-chunk sequence packing (LLM pretraining batch prep):
    documents are laid out in a deterministic hash order and cut into
    fixed-token-budget packs; each document is assigned to the pack where
    its first token lands.

    Scale shape: packing is per-SHARD (hash of the doc id), so each shard's
    running token sum is an independent window partition — 100 TB packs as
    `shards` parallel streams with one shuffle, no global sort, and the
    layout is content-stable (reshuffling input splits never moves a doc
    between packs). Returns (id, shard, pack_id, offset_in_pack, n_tokens);
    pack_id is globally unique (shard * 2^32 + shard-local pack)."""
    from pyspark.sql import Window

    c = F.col(id_col)
    h = _sha_bucket(c, HASH_MOD, seed)
    out = df.select(
        c.alias(id_col),
        # long, matching the oracle's len() (BIGINT) exactly at the driver
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        (h % shards).alias("shard"),
        h.alias("_h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return out.select(
        id_col,
        "shard",
        (F.col("shard").cast("long") * F.lit(2**32)
         + F.floor(start / budget_tokens)).alias("pack_id"),
        (start % budget_tokens).cast("long").alias("offset_in_pack"),
        "n_tokens",
    )


def stratified_sample_fixed(
    df: DataFrame,
    strata_col: str = "lang",
    k: int = 50,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-size per-stratum sample: the k ids with the
    smallest salted hash within each stratum. Content-stable (a given doc
    is in or out regardless of how the data is split/ordered) and exactly
    reproducible in SQL — the distributed replacement for reservoir
    sampling, and the row_number window keeps WindowGroupLimit pushdown
    (each map task pre-prunes to k rows per stratum before the shuffle)."""
    from pyspark.sql import Window

    h = _sha_bucket(F.col(id_col), HASH_MOD, seed)
    w = Window.partitionBy(strata_col).orderBy(h.alias("_h"), F.col(id_col))
    return (
        df.select(id_col, strata_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def stratified_sample_rate(
    df: DataFrame,
    rate: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic rate sample, salted per stratum so strata are sampled
    independently: keep iff hash(seed:stratum:id) % 10000 < rate*10000.
    Pure filter — no shuffle at all."""
    key = F.concat(F.col(strata_col).cast("string"), F.lit(":"),
                   F.col(id_col).cast("string"))
    return df.where(_sha_bucket(key, 10_000, seed) < int(rate * 10_000))


def token_bigrams(toks: Column) -> Column:
    """Adjacent-token 2-grams of a token array as ``"a b"`` strings
    (empty array when there are fewer than 2 tokens).

    Built with ``zip_with(toks, toks[1:])`` rather than
    ``transform(sequence(...), i -> element_at(...))`` — higher-order
    functions are interpreted per element, and the zip form walks both
    arrays once instead of evaluating two positional lookups per index
    (measured 4.5x on the sf0.1 corpus). The zip pads the shorter side
    with NULL; ``concat_ws`` skips NULLs, so the padded tail element is
    just the last token — the outer ``slice`` drops it."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    zw = F.zip_with(toks, F.slice(toks, 2, n1), lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(zw, 1, n1)


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_len: int = 10,
) -> DataFrame:
    """Gopher/C4-style repetition quality signals, as pure Catalyst
    expressions (no shuffle, no Python): per document —

    - ``top2_cnt`` / ``n_2grams``: occurrences of the most frequent token
      2-gram (Gopher's "fraction in most common n-gram" family),
    - ``dup_lines`` / ``n_lines``: duplicate "lines" where a line is a
      ``line_len``-token chunk (the dup-line/paragraph fraction rule,
      adapted to single-line corpora),
    - ``n_distinct`` / ``n_tokens``: vocabulary diversity,
    - ``is_repetitive``: Gopher-ish flag via integer cross-multiplication
      (top-2-gram frac > 0.20, dup-line frac > 0.30, or distinct-token
      frac < 0.20) — all-integer outputs so the oracle compare is exact.

    Everything stays map-only (no per-doc explode/groupBy shuffle): the
    most-frequent-gram count is max-consecutive-run over the SORTED gram
    array (array_sort + aggregate). The computation is STAGED through
    intermediate projections so each expensive array (tokens, grams,
    lines) is materialized once per row and reused by name — a single flat
    projection would re-evaluate the interpreted higher-order expressions
    for every output column that mentions them (measured 7x the wall on
    sf0.1; CollapseProject keeps multi-use non-trivial aliases staged)."""
    toks = tokens(text_col)
    a = df.select(id_col, toks.alias("_toks"))
    tk = F.col("_toks")
    n = F.size(tk)
    n_lines = F.ceil(n / F.lit(line_len)).cast("long")
    # guard n_lines=0: sequence(0, -1) would generate a DESCENDING range
    lines = F.when(n_lines >= 1, F.transform(
        F.sequence(F.lit(0), (n_lines - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(tk, i * line_len + 1, line_len)),
    )).otherwise(F.array().cast("array<string>"))
    b = a.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tk)).cast("long").alias("n_distinct"),
        token_bigrams(tk).alias("_grams"),
        lines.alias("_lines"),
    )
    g = F.col("_grams")
    top_cnt = F.aggregate(
        F.array_sort(g),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    c = b.select(
        id_col,
        "n_tokens",
        F.size(g).cast("long").alias("n_2grams"),
        top_cnt.alias("top2_cnt"),
        F.size("_lines").cast("long").alias("n_lines"),
        (F.size("_lines") - F.size(F.array_distinct("_lines"))).cast("long").alias("dup_lines"),
        "n_distinct",
    )
    return c.select(
        id_col,
        "n_tokens", "n_2grams", "top2_cnt", "n_lines", "dup_lines", "n_distinct",
        (
            (F.col("top2_cnt") * 5 > F.col("n_2grams"))
            | (F.col("dup_lines") * 10 > F.col("n_lines") * 3)
            | (F.col("n_distinct") * 5 < F.col("n_tokens"))
        ).alias("is_repetitive"),
    )


def bigram_lm_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """N-gram language-model quality proxy (the KenLM-filter shape without
    the KenLM binary): score each document by the fraction of its token
    bigrams that are in-vocabulary for a bigram model trained on the corpus
    itself — a bigram is "known" if it occurs >= ``min_count`` times
    corpus-wide. Fluent text reuses common continuations; gibberish and
    boilerplate-mangled text does not.

    Distributed shape (the part KenLM can't give you at 100 TB): the model
    IS a DataFrame — (1) one explode+groupBy builds the corpus bigram
    counts, (2) one equi-join on the gram string + per-doc count scores
    every document. The model table is corpus-derived and unbounded, so it
    is NOT broadcast (contrast ``decontaminate``'s small eval set); the
    gram join is a plain shuffle join that AQE handles, and the known-set
    is pre-shrunk by the ``min_count`` filter before the join. All-integer
    outputs; ``is_fluent`` = more than 80% known bigrams (and at least
    one)."""
    grams = token_bigrams(tokens(text_col))
    exploded = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    known = (
        exploded.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("gram")
    )
    hits = (
        exploded.join(known, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_known"))
    )
    base = df.select(F.col(id_col), F.size(grams).cast("long").alias("n_bigrams"))
    n_known = F.coalesce(F.col("n_known"), F.lit(0)).cast("long")
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_bigrams",
        n_known.alias("n_known"),
        ((F.col("n_bigrams") > 0) & (n_known * 5 > F.col("n_bigrams") * 4)).alias("is_fluent"),
    )


# PII patterns: RE2-safe subset (no backrefs/lookaround) so the Spark (Java
# regex) and DuckDB (RE2) engines agree match-for-match.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# IPv4: \b-anchored (no matches inside word runs like 'v1.2.3.4x'), octets
# constrained to 0-255 ('999.999.999.999' is not an address), and a
# trailing dotted-run swallow so '1.2.3.4.5' redacts WHOLLY instead of
# leaking a partial '<IP>.5' remnant (lookarounds would be cleaner but are
# not RE2-safe; the swallow is the strongest RE2-expressible form).
_OCTET = r"(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"
PII_IPV4 = rf"\b({_OCTET}\.){{3}}{_OCTET}(\.[0-9]{{1,3}})*\b"
PII_PHONE = r"\+[0-9]{7,15}"


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-data PII scrub: replace emails / IPv4 addresses / intl
    phone numbers with typed placeholders and count each. Applied in fixed
    order (email -> ip -> phone) so the passes compose deterministically.
    Pure `regexp_replace`/`regexp_count` — map-only, codegen'd, zero
    Python; the at-scale cost is exactly one scan."""
    t0 = F.col(text_col)
    n_email = F.regexp_count(t0, F.lit(PII_EMAIL)).cast("long")
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4)).cast("long")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE)).cast("long")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        id_col,
        t3.alias("clean_text"),
        n_email.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_phone.alias("n_phones"),
    )


def _exact_isqrt(x: Column) -> Column:
    """Exact integer sqrt of a non-negative BIGINT as an expression: IEEE
    sqrt (correctly rounded, hence engine-portable) + ±1 integer
    correction. Shared contract with the DuckDB oracle twin."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when(s * s > x, s - 1).otherwise(s)
    return F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)


def mixture_sample(
    df: DataFrame,
    target_total: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted domain mixture sampling (the XLM-R / pretraining
    corpus-mixing rule at alpha = 0.5): domain s gets sampling weight
    w_s ∝ sqrt(n_s), so small domains are up-weighted relative to their
    share and hot domains damped. Keep-decision per row is

        H(seed:id) mod (n_s * Z)  <  w_s * target_total

    with w_s = isqrt(n_s * 10^6) and Z = sum(w_s) — ALL-INTEGER math, so
    the expected sample size is target_total (saturating at keep-all for
    tiny domains) and the decision is bit-identical across engines and
    partitionings (content-stable: reshuffling never changes the sample).

    The hash is 60-bit (15 sha256 hex chars — the widest that fits a
    signed BIGINT in both engines), so the keep rule stays exact while
    ``n_s * Z`` <= 2^60 — domains up to ~10^10 docs. A 32-bit hash here
    would silently break the expected-size contract for any domain beyond
    ~26k docs (raw % M == raw once M > 2^32, inflating keep-probability
    by orders of magnitude).

    Scale shape: domain stats are one aggregate over a metadata-scale
    group count; the per-row filter joins against the broadcast stats
    relation — no corpus shuffle."""
    stats = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", _exact_isqrt(F.col("_n") * F.lit(1_000_000)))
    )
    z = stats.agg(F.sum("_w").alias("_z"))
    stats = F.broadcast(stats.crossJoin(F.broadcast(z)))
    # raw engine-portable 60-bit hash (no modulus — the keep rule supplies it)
    raw = _sha_long(F.col(id_col), seed, nchars=15)
    return (
        df.join(stats, domain_col)
        .where(raw % (F.col("_n") * F.col("_z")) < F.col("_w") * F.lit(target_total))
        .select(id_col, domain_col)
    )


def remove_high_df_tokens(
    df: DataFrame,
    max_df: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate strip: drop tokens whose DOCUMENT frequency
    exceeds ``max_df`` of the corpus (navigation chrome, license headers,
    template words), preserving each document's remaining token order.

    Two distributed passes: (1) document-frequency count (explode DISTINCT
    tokens per doc -> groupBy token), (2) rebuild each text with the
    high-df set removed — the set is broadcast (it is small by definition:
    tokens in >max_df of docs are few) and the rebuild is a per-row filter,
    so pass 2 is shuffle-free. Returns (id, clean_text, n_removed)."""
    n_docs = df.count()  # scalar, driver-side (metadata-scale)
    docfreq = (
        df.select(F.explode(F.array_distinct(tokens(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df * n_docs)
        .select("token")
    )
    # hint the AGGREGATED 1-row relation (hinting below the aggregate would
    # be discarded and the crossJoin could plan as a cartesian shuffle)
    high = F.broadcast(docfreq.select(F.collect_set("token").alias("_high")))
    toks = tokens(text_col)
    kept = F.filter(toks, lambda t: ~F.array_contains(F.col("_high"), t))
    return (
        df.crossJoin(high)  # 1-row broadcast: the high-df token set
        .select(
            id_col,
            F.concat_ws(" ", kept).alias("clean_text"),
            (F.size(toks) - F.size(kept)).alias("n_removed"),
        )
    )
