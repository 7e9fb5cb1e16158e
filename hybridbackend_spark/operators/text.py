"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen) — at 100 TB a
per-row Python UDF here would dominate the pipeline, so none are used.
Driver north-star ops (not in the reference, which handles only tabular
features); the shapes follow standard LLM-corpus curation practice
(C4/Gopher-style quality signals).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "tokens",
    "token_count",
    "word_shingles",
    "char_shingles",
    "quality_signals",
    "quality_score",
    "lang_scores",
    "lang_id",
    "fingerprint",
    "hashing_vectorize",
    "jl_project",
    "redact_pii",
    "PII_PATTERNS",
    "extract_urls",
    "url_host",
    "registrable_domain",
    "URL_PATTERN",
    "STOPWORDS",
    "deletion_variants",
    "symspell_match",
    "ngram_repetition",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Minimal stopword profiles for the n-gram/stopword language heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"),
    "es": ("el", "la", "los", "y", "de", "un", "una", "es", "para", "en"),
}


def spread_small_scan(df):
    """Round-robin repartition up to the session's default parallelism
    when the input arrives in FEWER partitions (round-12, guide §2.5
    "one huge unsplittable file ... repartition immediately after the
    read"): the corpus fixtures are single-file parquet tables, so a
    tokenize/md5-heavy pipeline otherwise runs its entire per-row
    compute on 1-2 scan tasks while the rest of the cores idle. At
    scale, many-file inputs already exceed the core count and this is
    a no-op — the partition check, not a constant, decides. Only
    partitioning changes; every consumer of this helper is
    partitioning-invariant (exact-integer aggs / joins)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text (empty text -> [])."""
    t = F.lower(F.trim(_c(col)))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: split on word boundaries keeping punctuation
    as tokens (a cheap proxy for subword tokenizers; deterministic)."""
    t = F.trim(_c(col))
    pieces = F.filter(
        F.split(t, r"[^\w]+"), lambda x: F.length(x) > 0
    )
    punct = F.length(F.regexp_replace(t, r"[\w\s]", ""))
    return F.size(pieces) + punct


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (shingles) — the unit set for Jaccard/MinHash
    dedup. Expression-only: slice the token array at each start position.

    The token array is LET-BOUND as a lambda variable (outer transform over
    a single-element array): closures inside ``transform`` re-evaluate
    embedded expressions per element, so referencing ``tokens(col)``
    directly would re-run the regex split once per shingle — measured at
    ~1000x slowdown. Bound lambda variables are evaluated once.
    """
    bound = F.transform(
        F.array(tokens(col)),
        lambda toks: F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                )
            )
        ),
    )
    return F.element_at(bound, 1)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the lowercased text."""
    t = F.lower(F.trim(_c(col)))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1))),
            lambda i: F.substr(t, i, F.lit(n)),
        )
    )


def ngram_repetition(col: Column | str, n: int = 3) -> dict[str, Column]:
    """Intra-document repetition signals: total and distinct word
    n-gram counts (NON-distinct shingling, unlike :func:`word_shingles`)
    — the Gopher-rule "fraction of duplicate n-grams" quality filter
    for LLM corpus curation. Expression-only (same let-binding trick as
    word_shingles); the duplicate fraction is the single division
    (total - distinct) / total, exact cross-engine."""
    bound = F.transform(
        F.array(tokens(col)),
        lambda toks: F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    )
    grams = F.element_at(bound, 1)
    return {
        f"ngram{n}_total": F.size(grams).cast("long"),
        f"ngram{n}_distinct": F.size(F.array_distinct(grams)).cast("long"),
    }


def quality_signals(col: Column | str) -> dict[str, Column]:
    """Gopher/C4-style quality signals as named expressions: length,
    token count, mean token length, punctuation/digit/space ratios,
    stopword ratio."""
    t = F.trim(_c(col))
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens > 0, (
            F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
            / n_tokens.cast("double")
        )).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, (
            F.length(F.regexp_replace(t, r"[^.,;:!?'\"]", ""))
            / n_chars.cast("double")
        )).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(n_chars > 0, (
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars.cast("double")
        )).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tokens > 0, (
            n_stop / n_tokens.cast("double")
        )).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: rewards stopword presence and
    sane token lengths, penalizes digit/punct overload and extreme
    lengths. Deterministic, expression-only."""
    s = quality_signals(col)
    len_ok = (
        (s["n_tokens"] >= 5) & (s["n_tokens"] <= 100000)
        & (s["mean_token_len"] >= 2) & (s["mean_token_len"] <= 12)
    ).cast("double")
    return F.round(
        0.4 * len_ok
        + 0.3 * F.least(s["stopword_ratio"] * 5, F.lit(1.0))
        + 0.2 * (1 - F.least(s["digit_ratio"] * 5, F.lit(1.0)))
        + 0.1 * (1 - F.least(s["punct_ratio"] * 5, F.lit(1.0))),
        6,
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratio (the n-gram/stopword heuristic)."""
    toks = tokens(col)
    n_tokens = F.size(toks)
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array([F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
        out[lang] = F.when(n_tokens > 0, hits / n_tokens.cast("double")).otherwise(
            F.lit(0.0)
        )
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword profile score, alphabetical tie-break;
    'und' (undetermined) when no profile scores > 0."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))
            for lang in sorted(STOPWORDS)
        ]
    )
    # max by (score, then REVERSED lang) so that ascending sort puts the
    # winner last; alphabetical-first tie-break == pick smallest lang among
    # max scores -> sort by (s asc, l desc), take last.
    best = F.element_at(
        F.array_sort(
            pairs,
            lambda a, b: F.when(a["s"] < b["s"], -1)
            .when(a["s"] > b["s"], 1)
            .otherwise(
                F.when(a["l"] > b["l"], -1).when(a["l"] < b["l"], 1).otherwise(0)
            ),
        ),
        -1,
    )
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Order-sensitive document fingerprint: position-weighted rolling sum
    of character codes, fp = sum_i ((i mod 64)+1) * code(char_i), over the
    lowercased trimmed text. Cheap, deterministic, expressible in ANSI SQL
    for oracle checks (unlike xxhash64)."""
    t = F.lower(F.trim(_c(col)))
    chars = F.split(t, "")
    return F.aggregate(
        F.zip_with(
            chars,
            F.sequence(F.lit(0), F.greatest(F.size(chars) - 1, F.lit(0))),
            lambda ch, i: (F.pmod(i, F.lit(64)) + 1) * F.ascii(ch),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# URL shape in the Java/RE2-common regex subset (no lookaround): scheme,
# host of dot-separated labels, optional path of unreserved characters.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._/%-]*)?"


def extract_urls(col: Column | str) -> Column:
    """All http(s) URLs in the text, in order of appearance (array)."""
    return F.regexp_extract_all(_c(col), F.lit(URL_PATTERN), 0)


def url_host(col: Column | str) -> Column:
    """Hostname of a URL string ('' if the pattern doesn't match)."""
    return F.regexp_extract(_c(col), r"https?://([A-Za-z0-9.-]+)", 1)


def registrable_domain(host: Column | str) -> Column:
    """Registrable domain = last two dot-labels of the hostname (the
    eTLD+1 approximation used for domain-level corpus filtering and
    per-domain quality stats; a public-suffix list would refine
    multi-label TLDs). Single-label hosts pass through unchanged."""
    parts = F.split(_c(host), r"\.")
    return F.when(F.size(parts) <= 2, _c(host)).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


# PII patterns written in the regex subset Java (Spark) and RE2 (DuckDB,
# Go, Rust engines) evaluate identically: character classes, bounded
# repetition, non-capturing groups, \b word boundaries — no lookaround,
# no backreferences. Order matters: emails are redacted before phones so
# the digits in a mailbox name can't be double-matched.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}", "<PHONE>"),
    ("ssn_like", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
)


def redact_pii(col: Column | str) -> dict[str, Column]:
    """Redact common PII shapes (emails, IPv4s, intl phone numbers,
    SSN-style ids) from text, counting each redaction type.

    Returns ``{"redacted": Column, "n_<type>": Column, ...}`` — all pure
    JVM regexp expressions (one fused codegen stage per row; zero
    Python). Patterns apply in a fixed order so overlapping shapes
    (an email containing digits, an IP inside a phone-like run) resolve
    identically everywhere; counts are taken BEFORE any replacement so
    each type counts matches in the original text.
    """
    src = _c(col)
    out: dict[str, Column] = {}
    red = src
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(src, F.lit(pat))
        red = F.regexp_replace(red, pat, token)
    out["redacted"] = red
    return out


def hashing_vectorize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    idf: bool = True,
    dense: bool = True,
) -> DataFrame:
    """Feature-hashing text vectorization (the hashing trick): tokens
    hash to ``dim`` buckets (portable md5, so any engine re-derives the
    mapping), per-doc term frequencies accumulate per bucket, optionally
    weighted by an INTEGER-EXACT idf — ``1 + floor(log2 N) -
    floor(log2 df)`` whole bits (the binary-digit-count scheme of
    ``unigram_surprisal``; float ``ln`` differs across libms, integer
    bits never do). The bridge from raw text to every vector operator
    here (cosine top-k, PQ, k-means, near-dup) WITHOUT an external
    embedding model.

    Shapes: ``dense=False`` returns sparse (id, bucket, weight) rows —
    shuffle = nonzero cells; ``dense=True`` assembles the length-``dim``
    array per doc via one groupBy (map-side combined).
    """
    from .corpus import hash_bucket

    toks = spread_small_scan(df).select(
        F.col(id_col), F.explode(tokens(_c(text_col))).alias("_tok")
    )
    cells = (
        toks.withColumn("_b", hash_bucket(F.col("_tok"), dim, seed=0))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    if idf:
        # the tf cell table already holds one row per distinct (id,
        # bucket), so the document frequencies are a reread of it — cut
        # the lineage so the corpus is tokenized+hashed ONCE instead of
        # once per reference (round-12, guide §1.2; previously dfs was
        # a second full explode+md5 pass)
        cells = cells.localCheckpoint(eager=False)
        n_docs = df.select(F.col(id_col)).distinct().count()
        dfs = cells.groupBy("_b").agg(F.count(F.lit(1)).alias("_df"))
        bits_n = len(bin(n_docs)) - 3  # floor(log2 n_docs): '0b1...'
        idf_bits = F.lit(1 + bits_n) - (F.length(F.bin(F.col("_df"))) - 1)
        cells = cells.join(F.broadcast(dfs), "_b").withColumn(
            "weight", (F.col("_tf") * idf_bits).cast("long")
        )
    else:
        cells = cells.withColumn("weight", F.col("_tf").cast("long"))
    sparse = cells.select(id_col, F.col("_b").alias("bucket"), "weight")
    if not dense:
        return sparse
    assembled = sparse.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)),
    )
    return assembled.select(id_col, vec.alias("vector"))


def jl_project(
    df: DataFrame,
    vec_col: str = "vector",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 7,
    dp: int = 6,
) -> Column | DataFrame:
    """Johnson-Lindenstrauss random projection: dense ``in_dim`` vectors
    compress to ``out_dim`` via a seeded +-1 Rademacher matrix scaled by
    1/sqrt(out_dim) — pairwise distances preserved within (1 +- eps)
    w.h.p. The cheap densifier between :func:`hashing_vectorize`'s
    sparse TF-IDF space and the ANN/k-means operators (which cost
    O(dim) per comparison).

    The matrix folds into the plan as literals (deterministic from
    ``seed`` — any engine re-derives it); projection is a per-row
    expression, zero shuffle, zero Python."""
    import random

    rng = random.Random(seed)
    rows = [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(in_dim)]
        for _ in range(out_dim)
    ]
    inv = 1.0 / (out_dim ** 0.5)
    v = F.col(vec_col)
    comps = []
    for r in rows:
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(x) for x in r]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(F.round(dot * inv, dp))
    return df.withColumn("jl_vector", F.array(*comps))


def top_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` tokens by whole-bit
    TF-IDF, ``weight = tf * [(1 + floor(log2 N)) - floor(log2 df)]`` —
    the same exact integer-bit idf as ``hashing_vectorize`` (no float
    log anywhere), with deterministic (weight desc, token asc)
    tie-breaks, so the full keyword table hash-checks across engines.

    One token explode, one (doc, token) tf agg, one token df agg (tiny,
    broadcast), one per-doc top-k window keyed on the document — every
    shuffle is on doc or token keys; nothing global.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(_c(text_col))).alias("_tok"))
    tf = toks.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("tf"))
    dfs = (
        toks.select(id_col, "_tok")
        .distinct()
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    bits = lambda c: F.length(F.bin(c)) - 1
    weighted = (
        tf.join(F.broadcast(dfs), "_tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            F.col("_tok").alias("token"),
            (F.col("tf") * (F.lit(1) + bits(F.col("_n")) - bits(F.col("_df"))))
            .cast("long")
            .alias("weight"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("weight"), "token")
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "weight")
    )


def _one_deletions(col: str) -> Column:
    """Array of all single-character deletions of ``col`` (empty array for
    the empty string — Spark's ``sequence(1, 0)`` would otherwise run
    DOWNWARD and fabricate variants)."""
    return F.expr(
        f"if(length({col}) = 0, array(), "
        f"transform(sequence(1, length({col})), i -> "
        f"concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col}) - i))))"
    )


def deletion_variants(
    df: DataFrame, token_col: str, out_col: str = "variant", depth: int = 1
) -> DataFrame:
    """Each token plus its deletion neighborhood up to ``depth``
    characters removed — the SymSpell candidate-generation key set.
    Depth 1 yields |token|+1 rows per token; depth d is bounded by
    C(len, d) distinct variants (deduped per token before the join).
    All codegen expressions (transform + explode), no Python."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    out = df.withColumn(out_col, F.col(token_col))
    frontier = out
    for _ in range(depth):
        frontier = frontier.withColumn(
            out_col, F.explode(_one_deletions(out_col))
        )
        out = out.unionByName(frontier)
    return out.distinct()


def symspell_match(
    queries: DataFrame,
    vocab: DataFrame,
    query_col: str = "q",
    vocab_col: str = "token",
    max_distance: int = 1,
) -> DataFrame:
    """SymSpell-style fuzzy token match: candidates are generated by an
    EQUI-JOIN on deletion variants (a query token and a vocab token can
    be within edit distance 1 only if their deletion neighborhoods
    intersect), then verified with an exact ``levenshtein`` check.

    Scale shape: the naive approach is |Q| x |V| edit-distance pairs —
    a cross product. Here both sides expand to (len+1) variant rows and
    shuffle on the variant key; candidate pairs are the (rare) bucket
    collisions, and only those pay the levenshtein verify. This is the
    1000-executor spell-correction/entity-matching pattern.

    Completeness (the SymSpell theorem): if edit_distance(a, b) <= d,
    then deleting at most d characters from each brings them to a common
    string, so depth-``max_distance`` deletion neighborhoods intersect
    for EVERY qualifying pair. The variant join over-generates (e.g.
    distance-2 pairs at depth 1 via one deletion per side); the exact
    ``levenshtein`` verify removes them, so results are EXACTLY the
    distance-<=``max_distance`` pairs at any ``max_distance``."""
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    qv = deletion_variants(
        queries.select(F.col(query_col)).distinct(),
        query_col,
        depth=max_distance,
    )
    vv = deletion_variants(vocab, vocab_col, depth=max_distance)
    cand = (
        qv.join(vv, "variant")
        .select(query_col, *[c for c in vocab.columns])
        .distinct()
    )
    return cand.filter(
        F.levenshtein(F.col(query_col), F.col(vocab_col)) <= max_distance
    )
