"""BPE tokenizer training over a distributed corpus.

The idiomatic Spark split for subword-vocab training (same shape the
reference's ingestion uses for schema inference — one distributed pass to
a small summary, then driver-side decision-making):

1. ``word_counts`` — ONE distributed pass: whitespace words → hash-agg
   counts. At 100 TB this is the only job that touches the corpus; its
   output is the distinct-word table (Zipf-bounded, ~10⁶-10⁷ rows), which
   is what every real BPE trainer (SentencePiece, GPT-2's) actually
   consumes.
2. ``train_bpe`` — driver-side merge learning on the collected word-count
   table (capped at ``max_vocab_words`` by frequency so driver memory is
   bounded regardless of corpus size). Iterating merges distributed would
   cost one shuffle per merge (200+ jobs); on the aggregated counts it is
   milliseconds and exactly equivalent, because BPE's objective only sees
   word-level counts, never document positions.
3. ``segment`` — distributed apply: merges broadcast to executors,
   Arrow-batched ``mapInPandas`` with a per-batch word→pieces memo (Zipf
   again: the cache hits for all but the tail), so the per-row Python cost
   amortizes to a dict lookup.

Tie-breaking is deterministic everywhere (count desc, then lexicographic
pair) so the learned vocabulary is reproducible across runs and cluster
sizes — required for the driver's stable-schema/row checks and for any
real training-data pipeline (a vocab that depends on partitioning is a
bug).

No equivalent exists in the reference (closest: token casts in
`src/historical_bucket_to_bq.py:84-89`); this is a training-data
extension op per the round brief.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dbt_repo_spark.operators.dedup import tokens

END_OF_WORD = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str,
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """Corpus word-frequency table: (word, n) — one explode + hash-agg.

    Partial aggregation is map-side, so the shuffle carries ~|vocab| rows
    per task, not |corpus| — the plan that survives 100 TB.
    """
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    wc = (
        df.select(F.explode(tokens(txt)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("n") >= min_count)
    return wc


def train_bpe(
    wc: DataFrame,
    num_merges: int = 200,
    min_pair_count: int = 2,
    max_vocab_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a (word, n) count table. Returns ranked pairs.

    Driver-side on the capped word table (top ``max_vocab_words`` by
    count desc, word asc — deterministic). Classic algorithm: every word
    starts as chars + ``</w>``; repeatedly merge the most frequent
    adjacent symbol pair (ties broken lexicographically), maintaining
    pair counts incrementally (only words containing the merged pair are
    touched per iteration).
    """
    rows = (
        wc.orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_vocab_words)
        .collect()
    )
    # word as tuple-of-symbols, weighted by count
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"]) + (END_OF_WORD,)
        vocab[syms] = vocab.get(syms, 0) + int(r["n"])

    def pair_stats(
        vocab: dict[tuple[str, ...], int],
    ) -> dict[tuple[str, str], int]:
        stats: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + n
        return stats

    stats = pair_stats(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            i, out = 0, []
            changed = False
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            ns = tuple(out)
            new_vocab[ns] = new_vocab.get(ns, 0) + n
            if changed:
                # incremental pair-count maintenance for this word
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] -= n
                    if stats[p] <= 0:
                        stats.pop(p, None)
                for i in range(len(ns) - 1):
                    p = (ns[i], ns[i + 1])
                    stats[p] = stats.get(p, 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """Apply learned merges corpus-wide → (id, pieces, n_pieces).

    Arrow-batched ``mapInPandas``; the merges table rides the closure
    (broadcast by the task serializer — it is ≤ num_merges pairs). A
    word→pieces memo per batch collapses the per-row cost to a dict hit
    for every word already seen in the batch.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pieces", ArrayType(StringType())),
            StructField("n_pieces", LongType()),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.lower(F.col(text_col)) if lowercase else F.col(text_col)).alias(
            "__text"
        ),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in text.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            pieces = pdf["__text"].map(enc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": pieces,
                    "n_pieces": pieces.map(len).astype("int64"),
                }
            )

    return src.mapInPandas(run, schema=out_schema)
