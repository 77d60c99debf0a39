"""Distributed BPE merge-rule fitting — the tokenizer-training step of
a training-data pipeline, shaped for 100 TB:

The classic observation (Sennrich et al., 2016, public) is that BPE
never needs the raw token stream: it fits on the WORD-FREQUENCY table.
One aggregation collapses the corpus (shuffle keys = distinct words,
weight = count) and every merge iteration then runs on that bounded
vocabulary table. Per iteration:

  1. pair counting — adjacent symbol pairs via zip_with over the
     symbol array and its shift, exploded and weight-summed
     (map-side partial agg; shuffle = distinct pairs, not occurrences);
  2. argmax — one orderBy(count desc, pair asc).limit(1) driver round
     (a bounded scalar per iteration, the kmeans-style recipe);
  3. merge application — a single F.aggregate fold per word rewrites
     [.., a, b, ..] → [.., ab, ..] left-to-right non-overlapping,
     entirely JVM-side (no Python in the loop).

Iterations localCheckpoint so lineage doesn't compound. Everything is
deterministic: ties break lexicographically on the pair, so the rule
list is reproducible across partitionings and engines (pytest pins
equality with a pure-python reference implementation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _symbols(word: Column) -> Column:
    """Initial symbol sequence: one UTF-8 character per symbol."""
    return F.split(word, "")


def _merge_fold(symbols: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    # F.get (0-based) returns null out of bounds — ANSI-safe on the
    # empty accumulator, unlike element_at which throws
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, n) table: the only pass over the raw data."""
    return (df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                       .alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def bpe_fit(df: DataFrame, text_col: str, *, n_merges: int = 10,
            min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules over the corpus.
    Returns the ordered rule list [(a, b), ...]; stops early when no
    pair reaches ``min_pair_count``."""
    vocab = (word_frequencies(df, text_col)
             .select(_symbols(F.col("word")).alias("sym"), "n")
             .localCheckpoint(eager=False))
    rules: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            F.explode(F.zip_with(
                F.slice("sym", 1, F.greatest(F.size("sym") - 1, F.lit(0))),
                F.slice("sym", 2, F.greatest(F.size("sym") - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )).alias("p"), "n")
        top = (pairs.groupBy("p").agg(F.sum("n").alias("cnt"))
                    .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
                    .limit(1).collect())
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        rules.append((a, b))
        vocab = (vocab.select(_merge_fold(F.col("sym"), a, b).alias("sym"),
                              "n")
                      .localCheckpoint(eager=False))
    return rules


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               rules: list[tuple[str, str]]) -> DataFrame:
    """Apply a fitted rule list: (id, tokens array, n_bpe_tokens).
    One fused projection — the rules compose into a single expression
    chain per word, applied map-only (no shuffle, no Python)."""
    base = (df.select(F.col(id_col),
                      F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+"))
                       .alias("pos", "word"))
              .filter(F.col("word") != ""))
    sym = _symbols(F.col("word"))
    for a, b in rules:
        sym = _merge_fold(sym, a, b)
    per_word = base.select(id_col, "pos", sym.alias("toks"))
    # collect_list order is partition-dependent: sort by word position
    # before flattening so the token sequence is deterministic
    return (per_word.groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "toks")))
                  .alias("_s"))
            .select(id_col,
                    F.flatten(F.transform("_s", lambda s: s["toks"]))
                     .alias("tokens"))
            .select(id_col, "tokens",
                    F.size("tokens").cast("long").alias("n_bpe_tokens")))
