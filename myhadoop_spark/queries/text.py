"""Text-analysis operators over the ``documents`` table.

Extension surface (project brief; SURVEY.md §2.3): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All are
pure JVM-side expression pipelines (split / higher-order array functions /
regex / hash built-ins) — no Python UDFs — so they run inside whole-stage
codegen and scale linearly with no shuffle at all (narrow, per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register

# stopword / marker lists (tiny, deterministic; shared with the SQL oracles)
STOPWORDS = ("the", "a", "of", "and", "to", "in")
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
}


def _tokens(col: str = "text") -> Column:
    """Reference tokenization (str.split() semantics,
    /root/reference/datanode.py:600-602) as an array column."""
    return F.filter(F.split(F.col(col), r"\s+"), lambda t: t != F.lit(""))


def _sql_tokens(col: str = "text") -> str:
    return rf"list_filter(string_split_regex({col}, '\s+'), t -> t <> '')"


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words))).cast("bigint")


def _sql_hits(tokens: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"CAST(len(list_filter({tokens}, t -> t IN ({lst}))) AS BIGINT)"


# ---------------------------------------------------------------------------
# token statistics
# ---------------------------------------------------------------------------


@register(
    "text_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, source, text,
                      {_sql_tokens('text')} AS toks
               FROM documents)
    SELECT doc_id, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS avg_token_len,
           CAST(len(list_distinct(toks)) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS ttr,
           {_sql_hits('toks', STOPWORDS)} AS stopword_hits
    FROM t
    """,
    tags=("text", "extension"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, type-token ratio, average
    token length, stopword hits."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
         / n_tokens.cast("double")).alias("avg_token_len"),
        (n_distinct.cast("double") / n_tokens.cast("double")).alias("ttr"),
        _hits(toks, STOPWORDS).alias("stopword_hits"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


@register(
    "quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_sql_tokens('text')} AS toks FROM documents),
    s AS (SELECT doc_id,
                 CAST(len(toks) AS DOUBLE) AS n_tokens,
                 CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct,
                 CAST({_sql_hits('toks', STOPWORDS)} AS DOUBLE) AS stop_hits
          FROM t)
    SELECT doc_id,
           0.4 * least(1.0, n_tokens / 50.0)
             + 0.3 * (n_distinct / n_tokens)
             + 0.3 * (1.0 - stop_hits / n_tokens) AS quality
    FROM s
    """,
    tags=("text", "extension"),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation + lexical
    diversity + non-stopword density. Deterministic double math on
    identical inputs — oracle-hashable."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    stop_hits = _hits(toks, STOPWORDS).cast("double")
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens / F.lit(50.0))
        + F.lit(0.3) * (n_distinct / n_tokens)
        + F.lit(0.3) * (F.lit(1.0) - stop_hits / n_tokens)
    )
    return docs.select("doc_id", quality.alias("quality"))


# ---------------------------------------------------------------------------
# language identification (marker-word voting)
# ---------------------------------------------------------------------------


def _sql_lang_case() -> str:
    hits = {lang: f"h_{lang}" for lang in LANG_MARKERS}
    clauses = []
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs):
        conds = [f"{hits[lang]} >= {hits[other]}" for other in langs[i + 1:]]
        conds = " AND ".join(conds) if conds else "TRUE"
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " END"


@register(
    "lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_sql_tokens('text')} AS toks FROM documents),
    h AS (SELECT doc_id, lang,
                 {', '.join(f"{_sql_hits('toks', ws)} AS h_{lang}"
                            for lang, ws in LANG_MARKERS.items())}
          FROM t)
    SELECT doc_id, lang AS labeled_lang,
           {_sql_lang_case()} AS predicted_lang
    FROM h
    """,
    tags=("text", "extension"),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language-ID heuristic: vote by per-language marker-word
    hits, ties broken by a fixed language order (en > de > fr > es)."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    hits = {lang: _hits(toks, ws) for lang, ws in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs):
        cond = F.lit(True)
        for other in langs[i + 1:]:
            cond = cond & (hits[lang] >= hits[other])
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex + chars/4 estimate)
# ---------------------------------------------------------------------------

_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len({_sql_tokens('text')}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS re_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
    tags=("text", "extension"),
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token counters per document: whitespace split, a BPE-ish
    regex lexer (letter runs / digit runs / single punctuation), and the
    chars/4 LLM-token estimate."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
        .cast("bigint").alias("re_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("bigint").alias("est_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


@register(
    "fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t <> ''))), ' ')) AS fp_shingle
    FROM documents
    """,
    tags=("text", "extension"),
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two content fingerprints: exact (md5 of normalized text) and
    bag-of-words (md5 of the sorted distinct token set) — the latter is
    invariant to token order, the building block for near-dup detection."""
    docs = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    toks = F.filter(F.split(norm, r"\s+"), lambda t: t != F.lit(""))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
        .alias("fp_shingle"),
    )
