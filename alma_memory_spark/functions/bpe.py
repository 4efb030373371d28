"""BPE merge-loop token counting (VERDICT r7 #6).

The packing/mixing budgets previously ran only on estimates (len/4 or
the BPE-ish pre-tokenizer regex count). This module adds
tokenizer-FAITHFUL counts: the standard BPE encode loop (Sennrich et
al. 2016; the GPT-2 serving shape — regex pre-tokenizer, then
greedy lowest-rank pair merges WITHIN each pre-token) over a committed
merge table (resources/bpe_merges.txt, regenerated deterministically by
scripts/make_bpe_vocab.py).

Spark shape: the merge loop is inherently sequential per pre-token, so
it runs as an Arrow-batched pandas UDF with the ranks table broadcast
once per job — and the loop runs once per UNIQUE pre-token per batch
(memoized), then counts distribute over occurrences: cost is
O(unique pre-tokens x merge-loop), not O(corpus tokens). No JVM regex
can express the loop; this is exactly the "Pandas UDF when built-ins
genuinely can't" tier. Everything upstream/downstream (pre-token
extraction, budget packing, mixing) stays in column expressions.

The committed table is char-level (engine corpora are decoded UTF-8
text columns) with the space symbol written as Ġ in the file — the
GPT-2 merges.txt convention. Swap the resource for a real model's
merge table (same format) to match that model's counts where its
alphabet is char-representable.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

from pyspark.sql import Column, DataFrame, functions as F

from alma_memory_spark.functions.text import BPE_TOKEN_RE

DEFAULT_MERGES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "bpe_merges.txt",
)

__all__ = [
    "DEFAULT_MERGES",
    "bpe_encode",
    "bpe_token_count_udf",
    "bpe_token_ids_udf",
    "learn_merges",
    "load_merge_ranks",
    "load_vocab",
    "train_bpe_merges",
    "with_bpe_token_count",
    "with_bpe_token_ids",
    "write_merges",
]


@lru_cache(maxsize=8)
def load_merge_ranks(path: str = DEFAULT_MERGES) -> dict:
    """{(sym_a, sym_b): rank} from a merges.txt-format file (Ġ = space)."""
    ranks: dict = {}
    if path == DEFAULT_MERGES and not os.path.isfile(path):
        # zip-shipped package on an executor (addPyFile): the default
        # path points inside the zip, where open() fails — read via
        # the import system instead (r14 inherited-state fix, the
        # text.py _resource_lines precedent)
        from alma_memory_spark.functions.text import _resource_lines

        lines = _resource_lines("bpe_merges.txt")
        if lines is None:
            raise FileNotFoundError(path)
    else:
        with open(path, encoding="utf-8") as f:
            lines = f.read().splitlines()
    for line in lines:
        line = line.rstrip("\n")
        # only the '#version' header line is a comment in GPT-2
        # merges.txt — merge pairs whose first symbol is '#' are
        # legitimate and must not be dropped (ADVICE r8 #4); a
        # line that doesn't split into exactly two symbols is
        # likewise structural, not a merge
        if line.startswith("#version") or len(line.split(" ")) != 2:
            continue
        a, b = line.split(" ")
        ranks[(a.replace("Ġ", " "), b.replace("Ġ", " "))] = len(ranks)
    return ranks


def bpe_encode(pre_token: str, ranks: dict) -> list[str]:
    """Reference merge loop for ONE pre-token: start from characters,
    repeatedly merge the lowest-rank adjacent pair until none applies.
    Deliberately plain — the parity baseline the Arrow kernel is
    unit-tested against."""
    syms = list(pre_token)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        # merge EVERY occurrence of the chosen pair left-to-right (the
        # standard BPE step — all sites of the winning pair fuse in one
        # iteration)
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _count_series(texts, ranks: dict):
    """pandas Series[str] -> Series[int64]: BPE token count per text.
    The merge loop runs once per UNIQUE pre-token across the batch."""
    import pandas as pd

    memo: dict[str, int] = {}

    def count_one(text) -> int:
        if text is None:
            return 0
        total = 0
        for pt in re.findall(BPE_TOKEN_RE, text):
            n = memo.get(pt)
            if n is None:
                n = memo[pt] = len(bpe_encode(pt, ranks))
            total += n
        return total

    return pd.Series([count_one(t) for t in texts], dtype="int64")


def bpe_token_count_udf(spark, merges_path: str = DEFAULT_MERGES):
    """Arrow-batched pandas UDF: text column -> exact BPE token count.
    The ranks table broadcasts once; executors memoize per unique
    pre-token within each batch."""
    from pyspark.sql.functions import pandas_udf

    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    b = spark.sparkContext.broadcast(load_merge_ranks(merges_path))

    @pandas_udf("long")
    def _count(texts):
        return _count_series(texts, b.value)

    return _count


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_bpe",
    merges_path: str = DEFAULT_MERGES,
) -> DataFrame:
    """df + an exact BPE token-count column — the optional `token_col`
    source for pack_documents* / mix_rates_for_token_budget when the
    budget must be tokenizer-faithful instead of estimated."""
    udf = bpe_token_count_udf(df.sparkSession, merges_path)
    return df.withColumn(out_col, udf(F.col(text_col)))


@lru_cache(maxsize=8)
def load_vocab(path: str = DEFAULT_MERGES) -> dict:
    """{symbol: id}: deterministic vocabulary derived from the merge
    table alone (the GPT-2 construction: base alphabet first, then one
    entry per merge in rank order — a merge's output id IS determined
    by its rank). id 0 is reserved for <unk>: a character outside the
    table's alphabet (one the merge-training corpus never produced a
    merge component for). Swap the resource for a real model's
    merges + its vocab.json to match that model's ids exactly; this
    derived vocab keeps the ID STREAM deterministic and
    count-consistent (len(ids) == bpe token count, always) without
    shipping a second resource."""
    ranks = load_merge_ranks(path)
    base = sorted(
        {s for pair in ranks for s in pair if len(s) == 1}
    )
    vocab = {"<unk>": 0}
    for s in base:
        vocab[s] = len(vocab)
    for pair, _rank in sorted(ranks.items(), key=lambda kv: kv[1]):
        merged = pair[0] + pair[1]
        if merged not in vocab:
            vocab[merged] = len(vocab)
    return vocab


def bpe_token_ids_udf(spark, merges_path: str = DEFAULT_MERGES):
    """Arrow-batched pandas UDF: text column -> array<int> of BPE
    token ids (load_vocab's deterministic id space). Same memoized
    once-per-unique-pre-token merge loop as the count kernel — the
    two are consistent by construction: size(ids) == count."""
    from pyspark.sql.functions import pandas_udf

    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    b = spark.sparkContext.broadcast(
        (load_merge_ranks(merges_path), load_vocab(merges_path))
    )

    @pandas_udf("array<int>")
    def _ids(texts):
        import pandas as pd

        ranks, vocab = b.value
        memo: dict[str, list] = {}

        def ids_one(text):
            if text is None:
                return []
            out: list[int] = []
            for pt in re.findall(BPE_TOKEN_RE, text):
                ids = memo.get(pt)
                if ids is None:
                    ids = memo[pt] = [
                        vocab.get(s, 0) for s in bpe_encode(pt, ranks)
                    ]
                out.extend(ids)
            return out

        return pd.Series([ids_one(t) for t in texts])

    return _ids


def with_bpe_token_ids(
    df: DataFrame, text_col: str = "text", out_col: str = "input_ids",
    merges_path: str = DEFAULT_MERGES, unk_col: str | None = "n_unk",
) -> DataFrame:
    """df + a tokenizer-faithful `input_ids` array column — the last
    step before pack_documents* / write_training_shards emits
    dataloader-ready id shards instead of text. len(input_ids) always
    equals with_bpe_token_count's count (same kernel), so budgets
    computed on counts stay exact for the id stream.

    `unk_col` (default "n_unk") adds the per-document count of ids
    that are <unk>=0 — characters outside the merge table's alphabet
    COLLAPSE to one id, and on corpora whose script the merge table
    never saw that silently produces heavily-<unk> shards with no
    other signal (counts stay self-consistent, masking it). The column
    is a pure JVM expression over the emitted array (no second Python
    pass); callers should alert on `sum(n_unk)/sum(size(input_ids))`
    above a corpus-appropriate threshold before emitting shards.
    Pass unk_col=None to skip."""
    udf = bpe_token_ids_udf(df.sparkSession, merges_path)
    out = df.withColumn(out_col, udf(F.col(text_col)))
    if unk_col is not None:
        out = out.withColumn(
            unk_col, F.size(F.filter(F.col(out_col), lambda x: x == 0))
        )
    return out


# ---------------------------------------------------------------------------
# distributed BPE TRAINING (r11)
# ---------------------------------------------------------------------------

def learn_merges(freqs: dict, n_merges: int) -> list[tuple[str, str]]:
    """The deterministic BPE merge loop (Sennrich et al. 2016) over a
    pre-token frequency table: repeatedly merge the highest-frequency
    adjacent symbol pair, ties broken lexicographically, stopping when
    no pair occurs twice. Shared by scripts/make_bpe_vocab.py (which
    pins the committed resource byte-for-byte) and train_bpe_merges
    (the distributed trainer). Cost: O(n_merges * total word symbols)
    over the UNIQUE-pre-token table — never the corpus."""
    import collections

    words = {w: tuple(w) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def write_merges(path: str, merges: list[tuple[str, str]]) -> None:
    """merges.txt-format writer (Ġ = space, the GPT-2 convention the
    loader reverses); output loads back via load_merge_ranks."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: alma-bpe-1 (char-level, %d merges)\n" % len(merges))
        for a, b in merges:
            f.write(f"{a.replace(' ', 'Ġ')} {b.replace(' ', 'Ġ')}\n")


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 400,
    min_count: int = 1,
    top_words: int | None = None,
) -> list[tuple[str, str]]:
    """Train a BPE merge table ON the corpus, distributed: the classic
    two-phase design every scalable tokenizer trainer uses — BPE
    statistics depend on the corpus only through pre-token
    FREQUENCIES, so phase 1 is one map-side-combinable Spark count
    over `regexp_extract_all(BPE_TOKEN_RE)` (the same JVM-side
    pre-tokenizer the counting kernels use) and phase 2 is the
    deterministic merge loop over the collected (pre-token, count)
    table. The corpus is never touched again after the one count
    shuffle, and re-running on the same corpus reproduces the same
    table byte-for-byte (lexicographic tie-break).

    100 TB shape: the driver table is UNIQUE pre-tokens, not corpus
    tokens — bound it with `min_count` (raw web corpora have unbounded
    typo/URL tails; count-1 pre-tokens cannot influence early merges
    much) and/or `top_words` (keep the N highest-count pre-tokens,
    ties by pre-token — a TakeOrdered of constant k, the standard
    vocabulary-truncation trade). With either cap the collect is
    O(cap), independent of corpus size.

    Returns the merge list; persist with write_merges() and serve via
    with_bpe_token_count / with_bpe_token_ids (merges_path=...)."""
    pts = docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
        ).alias("pt")
    )
    counts = pts.groupBy("pt").agg(F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    if top_words is not None:
        counts = counts.orderBy(F.desc("cnt"), F.asc("pt")).limit(top_words)
    freqs = {r["pt"]: r["cnt"] for r in counts.collect()}
    return learn_merges(freqs, n_merges)
