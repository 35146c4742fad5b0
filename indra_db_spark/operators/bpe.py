"""Distributed BPE tokenizer training and application.

Beyond-reference training-data operator (SURVEY.md §2.12): learn a byte-pair
-encoding merge table over a corpus and tokenize with it — the
vocabulary-construction step of an LLM data pipeline.

Spark-first decomposition (the same shape production tokenizer trainers
use):

1. ``word_counts`` — the ONLY corpus-scale stage: one distributed
   explode + groupBy(word).  Map-side partial aggregation collapses each
   task to its distinct words before the exchange, so shuffle volume is
   O(distinct words), not O(corpus tokens).
2. ``train_bpe`` — the merge-learning loop runs on the DRIVER over the
   compact (word, freq) table.  This is not a concession: pair statistics
   are a pure function of the word-frequency table, whose size is
   vocabulary-bounded (Heaps' law), not corpus-bounded — at 100 TB the
   table is still ~10⁷ rows.  ``max_words`` caps the driver copy by
   taking the highest-frequency words (deterministic tie-break), the
   standard frequency-truncated training approximation.
3. ``tokenize`` — segmentation is a pure function of the word, so it runs
   once per DISTINCT word (Arrow-batched pandas UDF over the deduped word
   frame — the iterative greedy merge loop genuinely cannot be expressed
   with built-ins) and is joined back to occurrences.  Tokenization cost
   is therefore corpus-size-invariant; only the join scales with data.

Everything is deterministic: ties in pair frequency break lexicographically,
so the learned merge table is reproducible across partitionings and engines
— pinned by the differential suite (tests/test_bpe.py) against a pure-Python
twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = [
    "word_counts",
    "train_bpe",
    "py_train_bpe",
    "py_segment",
    "tokenize",
    "bpe_token_counts",
    "PINNED_MERGES_V1",
]

#: split pattern for word extraction — whitespace + punctuation boundaries,
#: shared with operators/text.py's token conventions
WORD_SPLIT = r"[^a-z0-9]+"


def word_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, freq) over the corpus — one explode + one partial-agg shuffle.

    Lowercases and splits on non-alphanumeric runs so the vocabulary is
    engine-reproducible (same regex runs in any SQL dialect).
    """
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                lambda w: w != "",
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


# ------------------------------------------------------------- training


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + freq
    return stats


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, freq in vocab.items():
        syms: list[str] = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                syms.append(merged)
                i += 2
            else:
                syms.append(symbols[i])
                i += 1
        key = tuple(syms)
        out[key] = out.get(key, 0) + freq
    return out


def py_train_bpe(
    word_freqs: list[tuple[str, int]],
    num_merges: int = 100,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) table — the pinned
    pure-Python core ``train_bpe`` delegates to.  Deterministic: the
    highest-frequency pair wins, ties break lexicographically."""
    vocab = {tuple(w): f for w, f in word_freqs if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        merges.append(best[0])
        vocab = _merge_vocab(vocab, best[0])
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn a merge table from a corpus DataFrame.

    The distributed part is ``word_counts``; the driver copy is capped at
    ``max_words`` highest-frequency words (ties break on the word itself so
    the training set is partition-independent).
    """
    wc = (
        word_counts(df, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return py_train_bpe([(r.word, r.freq) for r in wc], num_merges, min_pair_freq)


# ----------------------------------------------------------- application


def py_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge application (the GPT-2 bpe loop shape):
    repeatedly merge the present pair with the smallest training rank."""
    syms = list(word)
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def _segment_udf(merges: list[tuple[str, str]]):
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    # no type hints: `from __future__ import annotations` stringifies them
    # and pyspark's hint resolver chokes; the explicit returnType is enough
    def seg(words):
        cache: dict[str, list[str]] = {}

        def one(w):
            got = cache.get(w)
            if got is None:
                got = cache[w] = py_segment(w, ranks)
            return got

        return words.map(one)

    return pandas_udf(seg, ArrayType(StringType()))


def _doc_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                lambda w: w != "",
            )
        ).alias("pos", "word"),
    )


def tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a corpus with a learned merge table → (id, out_col).

    The pandas-UDF segmentation runs over DISTINCT words only; occurrences
    get their token lists by join.  Per-document order is restored with a
    sort_array over (pos, tokens) structs — one groupBy shuffle, no window.
    """
    words = _doc_words(df, text_col, id_col)
    seg = _segment_udf(merges)
    distinct = words.select("word").distinct().withColumn("toks", seg(F.col("word")))
    joined = words.join(distinct, "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("toks")))
                    ),
                    lambda s: s["toks"],
                )
            ).alias(out_col)
        )
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bpe_tokens) — the packing/budgeting fast path: joins
    per-word token COUNTS (int, not arrays) and sums, so the shuffle
    payload stays one int per word occurrence."""
    words = _doc_words(df, text_col, id_col)
    seg = _segment_udf(merges)
    distinct = (
        words.select("word")
        .distinct()
        .withColumn("n_toks", F.size(seg(F.col("word"))))
    )
    return (
        words.join(distinct, "word")
        .groupBy(id_col)
        .agg(F.sum("n_toks").cast("int").alias("n_bpe_tokens"))
    )


# ------------------------------------------------------ pinned tokenizer

#: Tokenizer-v1 merge table: the output of ``train_bpe(documents,
#: num_merges=60, min_pair_freq=2)`` on the sf0.001 ``documents`` corpus,
#: pinned as a versioned artifact.  This mirrors how production pipelines
#: ship tokenizers — train once, freeze, apply everywhere — and makes the
#: corpus-scale APPLICATION step (the part that actually runs over 100 TB)
#: fully oracle-checkable: applying merges in rank order with two
#: leftmost-nonoverlapping replace passes per rank over a space-separated
#: symbol string is exactly equivalent to the greedy lowest-rank-first
#: loop in ``py_segment`` whenever no merge is a self-pair (a == b) —
#: a merged symbol born at rank r can only participate in pairs learned
#: after r, so rank-order application never misses a lower rank, and the
#: second replace pass catches back-to-back occurrences whose shared
#: boundary separator the first pass consumed (pinned by a 300k-case fuzz
#: differential in tests/test_bpe.py).  ``tests/test_bpe.py`` also asserts
#: this table IS what training reproduces, so the training path stays tied
#: to the verified artifact.
PINNED_MERGES_V1: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"),
    ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("in", "e"), ("l", "ine"), ("e", "y"),
    ("k", "ey"), ("j", "o"), ("jo", "in"), ("g", "e"), ("mer", "ge"),
    ("er", "y"), ("g", "r"), ("gr", "o"), ("gro", "up"), ("q", "u"),
    ("qu", "ery"), ("c", "t"), ("ct", "or"), ("e", "ctor"),
    ("v", "ector"), ("a", "s"), ("as", "h"), ("h", "ash"), ("l", "ow"),
    ("s", "low"), ("a", "m"), ("e", "am"), ("r", "eam"), ("st", "ream"),
    ("f", "i"), ("fi", "l"),
]
