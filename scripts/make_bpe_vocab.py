"""Train the committed BPE merge table (functions/bpe.py's default).

Standard BPE training (Sennrich et al. 2016, the GPT-2 shape: regex
pre-tokenizer, then merges learned WITHIN pre-tokens) over a fixed
seed corpus embedded below — fully deterministic: ties in pair
frequency break lexicographically, so re-running this script
reproduces alma_memory_spark/resources/bpe_merges.txt byte-for-byte.
Character-level alphabet (not GPT-2's byte encoder): the engine's
corpora are text columns already decoded to UTF-8 strings, and the
count semantics — pre-token -> merge loop -> symbol count — are
identical in shape.

Run:  python scripts/make_bpe_vocab.py   (rewrites the resource file)
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alma_memory_spark.functions.text import BPE_TOKEN_RE  # noqa: E402

N_MERGES = 400

SEED_CORPUS = """
the quick brown fox jumps over the lazy dog while the rain falls on the
plain and the train arrives at the station where the people wait with
umbrellas and newspapers reading about the weather and the games
spark reads the table and filters the rows then groups the values by key
and aggregates the counts before writing the result to parquet files
the query planner pushes the filter down to the scan and prunes the
columns so the join broadcasts the small side and avoids the shuffle
training data pipelines deduplicate documents score quality detect
language count tokens pack sequences and mix sources by sampling rates
the embedding vectors are quantized into cells and compared within each
cell so the pairwise cost stays bounded as the corpus grows larger
memory systems store heuristics outcomes domain knowledge and anti
patterns then retrieve them by similarity recency strength and success
the distributed system partitions the work across executors and each
partition processes its rows independently before the final reduction
computers compute numbers quickly because processors process
instructions in parallel pipelines with caches and branch predictors
interesting interested interests uninteresting disinterested interment
running runner runs ran walking walker walks walked jumping jumped
nation national international nationality denationalization rations
work works worked working worker workers workshop workplace network
light lighter lightest lightning delight slight flight bright brightly
"""


def pre_tokens(text: str) -> list[str]:
    return re.findall(BPE_TOKEN_RE, text)


def train(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    # the loop itself lives in functions/bpe.py (learn_merges) so the
    # script and the distributed trainer can never drift (r11)
    from alma_memory_spark.functions.bpe import learn_merges

    freqs = collections.Counter(pre_tokens(corpus))
    return learn_merges(dict(freqs), n_merges)


def main() -> None:
    merges = train(SEED_CORPUS, N_MERGES)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "alma_memory_spark", "resources", "bpe_merges.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write("#version: alma-bpe-1 (char-level, %d merges)\n" % len(merges))
        for a, b in merges:
            # symbols may CONTAIN the space char (pre-tokens absorb a
            # leading space), so the file encodes space as Ġ — the
            # GPT-2 merges.txt convention; the loader reverses it
            f.write(f"{a.replace(' ', 'Ġ')} {b.replace(' ', 'Ġ')}\n")
    print(f"wrote {len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
