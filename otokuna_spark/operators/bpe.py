"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
GPT-2/RoBERTa tokenizer family's training algorithm).

The 100 TB shape: BPE never needs the corpus — it needs the WORD
FREQUENCY TABLE. Step 1 is the only corpus-scale operation (one
hash-groupBy from 100 TB of text down to a vocabulary-sized relation,
~millions of rows); every merge round then runs over that bounded
relation: one weighted pair-count aggregation, one 1-row argmax, one
Arrow-batched merge application. Driver state per round is a single
(pair, count) row — the merge list itself, n_merges entries, is the
entire model.

Determinism: the argmax tie-breaks on (count DESC, pair_a ASC, pair_b
ASC), so the learned merge sequence is a pure function of the corpus —
independent of partitioning, order, and parallelism (asserted against a
reference implementation in tests).

The registry entry (q100) carries a FULL DuckDB oracle since round 11:
the iterative Sennrich merge loop is replayed as one recursive CTE
(per-round pair-stat argmax + greedy left-to-right merge via run-parity
windows), hash-matched against this implementation; the
reference-implementation test pins the merge sequence independently.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import text


END = "</w>"  # end-of-word marker, per the original algorithm


def word_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """The one corpus-scale op: whitespace words -> (word, freq).
    100 TB of text reduces to a vocabulary-sized relation here; everything
    downstream is bounded by |vocab|, not corpus size."""
    return (
        docs.select(F.explode(text.tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
    driver_vocab_limit: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list (the tokenizer model).

    Two execution paths, SAME result (asserted equal in tests):

    - **driver path** (vocab <= ``driver_vocab_limit``): collect the
      word-frequency table and run the reference merge loop in Python.
      This is how production tokenizer trainers work (the corpus-scale
      work is the word count; the merge loop touches only the vocab,
      which Heaps' law keeps in the low millions even at 100 TB —
      a ~1M-row collect is tens of MB). Per-merge cost: microseconds.
    - **distributed path** (otherwise, or ``driver_vocab_limit=0``):
      per round over the persisted word-frequency relation — weighted
      pair explode, one groupBy(pair) histogram, a 1-row argmax collect,
      and an Arrow-batched merge application; lineage cut with
      localCheckpoint every ``checkpoint_every`` rounds (cluster_pairs'
      device). Per-merge cost: one small Spark job (~1 s of scheduling
      overhead at any size) — only worth it when the vocab itself does
      not fit the driver.

    Stops early when no pair reaches ``min_pair_freq``. Argmax ties
    break on (count DESC, pair ASC): the merge sequence is a pure
    function of the corpus on both paths.
    """
    wf = word_frequencies(docs, text_col)
    if driver_vocab_limit > 0:
        # bounded probe: fetch limit+1 rows, not a full count scan
        head = wf.select("word", "freq").limit(driver_vocab_limit + 1).collect()
        if len(head) <= driver_vocab_limit:
            vocab = {tuple(list(r["word"]) + [END]): r["freq"] for r in head}
            return _train_driver(vocab, n_merges, min_pair_freq)

    words = (
        word_frequencies(docs, text_col)
        .select(
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(END))
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint()
    )

    merges: list[tuple[str, str]] = []
    for round_i in range(n_merges):
        pairs = (
            words.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def apply_merge(it, a=a, b=b):
            for pdf in it:
                out = []
                for syms in pdf["syms"]:
                    s = list(syms)
                    j, merged = 0, []
                    while j < len(s):
                        if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                            merged.append(a + b)
                            j += 2
                        else:
                            merged.append(s[j])
                            j += 1
                    out.append(merged)
                yield pd.DataFrame({"syms": out, "freq": pdf["freq"]})

        words = words.mapInPandas(apply_merge, schema="syms array<string>, freq long")
        if (round_i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def _train_driver(
    vocab: dict[tuple[str, ...], int], n_merges: int, min_pair_freq: int
) -> list[tuple[str, str]]:
    """Reference merge loop over an in-memory word-frequency dict —
    byte-identical semantics to the distributed rounds (same pair
    statistics, same (count DESC, pair ASC) tie-break, same
    all-occurrences left-to-right merge application)."""
    from collections import Counter

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_freq:
            break
        merges.append((a, b))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            merged, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    merged.append(a + b)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            key = tuple(merged)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def bpe_encode_tokens(docs: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Encode the corpus with a trained merge list: per doc,
    (id, n_words, n_bpe_tokens). The merge ranks travel as a broadcast
    Python dict inside an Arrow-batched pandas UDF; per-batch word-level
    memoization makes the cost proportional to DISTINCT words per batch,
    not tokens (Zipf does the rest)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("long")
    def n_bpe(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def encode_len(word: str) -> int:
            hit = cache.get(word)
            if hit is not None:
                return hit
            s = list(word) + [END]
            while len(s) >= 2:
                best, best_rank = None, None
                for j in range(len(s) - 1):
                    r = ranks.get((s[j], s[j + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = j, r
                if best is None:
                    break
                # merge ALL occurrences of the best pair, left to right
                a, b = s[best], s[best + 1]
                j, merged = 0, []
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        merged.append(a + b)
                        j += 2
                    else:
                        merged.append(s[j])
                        j += 1
                s = merged
            cache[word] = len(s)
            return len(s)

        return texts.map(lambda t: sum(encode_len(w) for w in t.split()) if t and t.strip() else 0)

    toks = docs.select(F.col(id_col), F.col(text_col), text.tokens(F.col(text_col)).alias("__toks"))
    return toks.select(
        F.col(id_col),
        F.size("__toks").alias("n_words"),
        n_bpe(F.col(text_col)).alias("n_bpe_tokens"),
    )
