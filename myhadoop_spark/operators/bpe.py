"""Byte-pair-encoding subword tokenizer — real BPE (Sennrich et al.
2016), upgrading the token-counting surface (queries/text.py's
whitespace + regex heuristics) to the tokenizer family actual
training pipelines budget with.

Scale shape — train on the VOCABULARY, not the corpus: the only
corpus-scale pass is one word-frequency aggregation (groupBy word);
every merge iteration then runs on the vocab table (distinct words ×
counts — millions of rows at 100 TB, not trillions of tokens):

  1. pair counts: explode each word's adjacent symbol pairs weighted
     by the word's corpus frequency, one groupBy-sum;
  2. argmax pair (count desc, pair asc — the deterministic tie-break);
     ONE collected row per iteration;
  3. merge applied to every word's symbol array as a JVM-side left
     fold (F.aggregate with (out, carry) state — non-overlapping
     left-to-right, the standard BPE semantics), localCheckpoint
     every few rounds to cut the iterative plan.

ENCODING is the one genuinely iterative per-record computation in
this repo (merges apply in priority order with data-dependent
lengths — not expressible as a fixed Catalyst expression tree; 40
stacked fold expressions would also blow past the Janino codegen
limits measured in the r2 dot-product study), so ``bpe_encode`` is an
Arrow pandas UDF over the BROADCAST merge list with a per-batch
word→tokens memo — each distinct word is encoded once per batch, the
Zipf head amortizes to a dict lookup.

Determinism: merges are a pure function of the corpus multiset
(deterministic tie-break), encoding a pure function of (word,
merges); both are pinned against a pure-Python reference
implementation in tests/test_bpe.py. No DuckDB oracle — iterative,
the documented no-SQL-twin class (SemDeDup/k-means precedent).

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from myhadoop_spark.operators.bm25 import _tokens
from myhadoop_spark.materialize import materialize

END = "</w>"   # end-of-word marker: lets merges capture word endings


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, syms): distinct corpus words with frequencies and
    their initial character-symbol arrays (chars + end marker)."""
    return (docs.select(F.explode(_tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "syms",
                F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))))


def _merge_fold(a: str, b: str):
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a+b over a symbol array, as one JVM-side fold."""
    merged = a + b

    def step(acc, s):
        take = acc["carry"].isNotNull() & (acc["carry"] == F.lit(a)) \
            & (s == F.lit(b))
        return F.struct(
            F.when(take, F.concat(acc["out"], F.array(F.lit(merged))))
            .otherwise(F.when(acc["carry"].isNotNull(),
                              F.concat(acc["out"], F.array(acc["carry"])))
                       .otherwise(acc["out"])).alias("out"),
            F.when(take, F.lit(None).cast("string"))
            .otherwise(s).alias("carry"))

    def finish(acc):
        return F.when(acc["carry"].isNotNull(),
                      F.concat(acc["out"], F.array(acc["carry"]))) \
            .otherwise(acc["out"])

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"))
    return lambda col: F.aggregate(col, init, step, finish)


def train_bpe(docs: DataFrame, *, n_merges: int = 64,
              text_col: str = "text",
              checkpoint_every: int = 8) -> list[tuple[str, str]]:
    """The ordered merge list learned from the corpus. Stops early
    when no adjacent pair occurs twice (nothing left worth merging —
    mirroring the reference implementation)."""
    vocab = _word_vocab(docs, text_col).transform(materialize)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (vocab
                 .select("cnt",
                         F.explode(
                             F.zip_with(
                                 F.slice(F.col("syms"), 1,
                                         F.size("syms") - 1),
                                 F.slice(F.col("syms"), 2,
                                         F.size("syms") - 1),
                                 lambda x, y: F.struct(x.alias("a"),
                                                       y.alias("b"))))
                         .alias("p"))
                 .groupBy("p.a", "p.b")
                 .agg(F.sum("cnt").alias("n"))
                 .orderBy(F.col("n").desc(), F.col("a").asc(),
                          F.col("b").asc())
                 .limit(1).collect())
        if not pairs or pairs[0].n < 2:
            break
        a, b = pairs[0].a, pairs[0].b
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_fold(a, b)(F.col("syms")))
        if (i + 1) % checkpoint_every == 0:
            vocab = vocab.transform(materialize)
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference/driver-side BPE encoding of one word — merges applied
    in training order, left-to-right non-overlapping. The pandas UDF
    below runs exactly this function."""
    syms = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]], *,
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """docs + ``out_col``: the document's BPE token stream (per
    whitespace word, concatenated in order). Arrow-batched pandas UDF
    over the broadcast merge list; a per-batch word memo encodes each
    distinct word once (the Zipf head is a dict hit)."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(list(merges))

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts):
        import re

        import pandas as pd
        ms = bc.value
        memo: dict[str, list[str]] = {}
        # ASCII \s+, NOT str.split(): training segments words with the
        # engine-wide Java-regex tokenization (_tokens), whose \s is
        # ASCII-only — Python's Unicode split would break e.g.
        # 'foo bar' into two words the merges were never trained
        # on (regression-tested)
        ws = re.compile(r"\s+", re.ASCII)

        def enc_doc(t):
            out: list[str] = []
            for w in ws.split(t or ""):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = encode_word(w, ms)
                out.extend(memo[w])
            return out

        return pd.Series([enc_doc(t) for t in texts])

    return docs.withColumn(out_col, _encode(F.col(text_col)))


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]], *,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_bpe_tokens): the sequence-length budget actual training
    pipelines pack against (composes with operators/packing.py the
    same way the whitespace counts do)."""
    return (bpe_encode(docs, merges, text_col=text_col)
            .select(F.col(id_col),
                    F.size("bpe_tokens").alias("n_bpe_tokens")))
