"""Substring-granularity exact dedup (VERDICT r9 #2).

The published headline operator for training-data dedup is
exact-SUBSTRING dedup (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499): remove duplicated
token spans of at least `w` tokens (the paper ships w = 50),
catching boilerplate that crosses the sentence and paragraph
boundaries the unit-hash operators (operators/paragraphs.py) stop at.
The paper builds a corpus-wide suffix array; the scale-shaped
DataFrame approximation here is TOKEN-WINDOW fingerprint dedup:

1. split each doc into TOKEN UNITS — each unit is one whitespace-run-
   delimited token CARRYING ITS TRAILING WHITESPACE (the sentinel-
   insertion separator-preserving split from explode_sentences, applied
   at token granularity), so excision re-splices the surviving bytes
   exactly;
2. fingerprint every length-`w` window of normalized tokens (md5 over
   the space-joined lowercased tokens) — one row per window START, so
   the exploded row count is ~the corpus token count (the fp
   concatenation is transient compute, not stored data);
3. keep-first per fingerprint with the family's argmin aggregate
   (min(struct(doc_id, start)) — map-side combinable, NO window
   function, so a corpus-wide boilerplate span cannot funnel one
   task);
4. EXCISION (the drop-window choice): every unit covered by a
   non-winning window occurrence is dropped; the doc's surviving
   units re-splice in order. The paper's alternative — drop the whole
   doc when any window duplicates — is a trivial filter on n_kept <
   n_units downstream; drop-window is what the paper itself ships.

Keep-first semantics: the kept occurrence of a window fingerprint is
the minimal (doc_id, start) — deterministic under any partition
layout, replayable in ANSI SQL (the 'subdedup' gate hash-checks
md5(reassembled text) per doc against a DuckDB replay).

Scale shape: explode (narrow) -> one argmin shuffle on fp -> one
join back on the (fp, doc, start) triple -> one per-doc
collect_list of dropped starts (bounded by the doc's window count)
-> array-expression excision at scan speed. The per-unit coverage
test is O(#dropped-starts) per unit — quadratic only in the single-
document length, which is bounded; a suffix-array pass (the paper's
exact algorithm) is the swap-in for adversarially long documents.

Reference parity: the reference dedups whole memories at
consolidation time (alma/consolidation/deduplication.py:37-230);
sub-document granularity is the training-data-pipeline extension
surface, taken here to the granularity the paper actually ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions.text import WS_RE

__all__ = ["dedup_token_windows", "explode_token_windows", "token_units"]

#: ASCII record separator, inserted after each whitespace run then
#: split on — pre-existing \x1e bytes are stripped first (the enforced
#: sentinel precondition, shared with explode_sentences)
_UNIT_SENTINEL = "\x1e"
#: leading/trailing-whitespace trim for unit normalization (explicit
#: class: Java \s includes \x0b, RE2's does not)
_TRIM_RE = f"^{WS_RE}|{WS_RE}$"


def token_units(text_col) -> F.Column:
    """Array of token units: each unit is one token plus its trailing
    whitespace, so concat(units) == the (sentinel-sanitized) text
    byte-for-byte. A doc with LEADING whitespace yields a first unit
    that is pure whitespace — it participates in windows as an empty
    normalized token (deterministic, mirrored by the SQL oracle)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    marked = F.regexp_replace(
        F.regexp_replace(col, _UNIT_SENTINEL, ""),
        f"({WS_RE})",
        "$1" + _UNIT_SENTINEL,
    )
    # only the FINAL unit can be empty (text ending in whitespace);
    # dropping it is reassembly-neutral
    return F.filter(F.split(marked, _UNIT_SENTINEL), lambda p: p != "")


def _norm_toks(units: F.Column) -> F.Column:
    return F.transform(
        units, lambda u: F.lower(F.regexp_replace(u, _TRIM_RE, ""))
    )


def explode_token_windows(
    df: DataFrame, w: int = 50, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start, fp): one row per length-`w` token window, start
    0-based; fp = md5 over the space-joined normalized window tokens.
    Docs with fewer than `w` tokens yield no windows (they cannot
    contain a duplicated `w`-token span)."""
    units = token_units(text_col)
    toks = _norm_toks(units)
    n = F.size(toks)
    wins = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda s: F.struct(
                s.alias("start"),
                F.md5(
                    F.array_join(F.slice(toks, s + 1, w), " ")
                ).alias("fp"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,fp:string>>"))
    return df.select(
        F.col(id_col), F.explode(wins).alias("wn")
    ).select(id_col, F.col("wn.start").alias("start"), F.col("wn.fp").alias("fp"))


def dedup_token_windows(
    df: DataFrame, w: int = 50, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every duplicated `w`-token span (global first occurrence
    wins) and re-splice each document from its surviving token units
    in original order — byte-faithful w.r.t. the sanitized input on
    the kept spans. Returns (id, text_dedup, n_units, n_kept) for
    EVERY input doc."""
    base = df.select(F.col(id_col), token_units(text_col).alias("units"))
    wins = explode_token_windows(df, w, id_col, text_col)
    # argmin per fingerprint (combinable aggregate, no window); losers
    # rejoin on the full triple so a corpus-wide duplicate span cannot
    # skew the join
    winners = (
        wins.groupBy("fp")
        .agg(F.min(F.struct(F.col(id_col), F.col("start"))).alias("_w"))
        .select(
            "fp",
            F.col(f"_w.{id_col}").alias("_wid"),
            F.col("_w.start").alias("_wstart"),
        )
    )
    dropped = (
        wins.join(winners, "fp")
        .filter(
            (F.col(id_col) != F.col("_wid"))
            | (F.col("start") != F.col("_wstart"))
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("start")).alias("starts"))
    )
    starts = F.coalesce("starts", F.array().cast("array<int>"))
    kept = F.filter(
        F.col("units"),
        lambda u, j: ~F.exists(
            starts, lambda s: (s <= j) & (j < s + F.lit(w))
        ),
    )
    return (
        base.join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, "").alias("text_dedup"),
            F.size("units").alias("n_units"),
            F.size(kept).alias("n_kept"),
        )
    )
