"""Benchmark decontamination: drop training documents that share long
token n-grams with an evaluation/benchmark corpus.

The standard LLM pipeline stage (GPT-3 appendix-C shape: 13-gram
overlap against every benchmark): any training doc containing an
n-gram that also appears in the held-out set is contaminated and gets
dropped (or flagged for review). The reference has no corpus-scale
analog — this generalizes its exact-duplicate hygiene
(alma/consolidation/deduplication.py) to cross-corpus membership.

Spark shape (100 TB):
- n-grams are a narrow map (token array -> slice windows) + explode;
  the only shuffle is the distinct/join on the gram key.
- the benchmark side is SMALL by definition (eval sets are thousands
  of docs) -> its distinct gram set broadcasts; the training side
  never shuffles at all in the common case.
- grams can be md5-hashed before the join (functions/text.hash32) to
  cut the broadcast bytes; kept verbatim here so the oracle compares
  strings exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alma_memory_spark.functions.text import ngrams_of_tokens, ws_tokens

__all__ = [
    "contamination_report",
    "decontaminate",
    "decontaminate_fuzzy",
    "decontaminate_semantic",
    "decontaminate_spans",
    "doc_ngrams",
    "fuzzy_band_saturation",
    "fuzzy_bands_from_signature",
    "fuzzy_contamination_report",
    "fuzzy_contamination_report_from_bands",
    "semantic_contamination_report",
    "with_fuzzy_contamination_flag",
]


def doc_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int, distinct: bool = True
) -> DataFrame:
    """(id, gram) pairs; per-doc distinct by default (membership is the
    question — within-doc repeats add nothing but shuffle bytes). The
    tokenizer projects into its own column first (the ngrams_of_tokens
    PERF contract: a tokenizer captured in the gram lambda would re-run
    per position)."""
    toked = df.select(
        F.col(id_col).alias("id"), ws_tokens(text_col).alias("_ts")
    )
    grams = ngrams_of_tokens(F.col("_ts"), n)
    if distinct:
        grams = F.array_distinct(grams)
    return toked.select("id", F.explode(grams).alias("gram"))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """(doc_id, n_shared) for every CONTAMINATED training doc: the
    count of distinct n-grams it shares with the benchmark corpus.
    Clean docs emit no row. n=13 is the published default; corpora of
    short docs use a smaller n (the gate uses 6 on the synthetic
    bag-of-words tables)."""
    tg = doc_ngrams(train, id_col, text_col, n)
    bg = doc_ngrams(bench, id_col, text_col, n).select("gram").distinct()
    return (
        tg.join(F.broadcast(bg), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(F.col("id").alias(id_col), "n_shared")
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Training frame minus contaminated docs (left anti-join on the
    report ids)."""
    bad = contamination_report(train, bench, id_col, text_col, n).select(id_col)
    return train.join(bad, id_col, "left_anti")


def decontaminate_spans(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_hash: str = "md5",
) -> DataFrame:
    """(id, text_clean, n_units, n_kept): EXCISION-mode
    decontamination — instead of dropping a contaminated document
    wholesale (decontaminate), remove every n-token window that
    appears verbatim in the benchmark corpus and re-splice the
    remainder byte-faithfully. The open-data-pipeline middle ground:
    a long, mostly-clean document that quotes one benchmark item
    keeps everything but the quote.

    Composition of two oracle-gated kernels: the window
    fingerprinting + byte-faithful excision machinery of
    dedup_token_windows ('subdedup' gates) and the
    small-side-broadcast membership of decontaminate ('contam' gate).
    Both corpora fingerprint through the SAME normalization
    (operators/substring.token_units), so membership is exact.
    Scale shape: the benchmark fp set broadcasts (eval corpora are
    small by definition); the train side is a narrow map + one
    per-doc aggregation — the training corpus never shuffles on the
    gram key. Docs shorter than n tokens carry no windows and come
    back unchanged. `fp_hash="xxhash64"` is the 8-byte production
    fingerprint (see substring._FP_FNS) — both corpora must use the
    same hash, which threading the one parameter guarantees."""
    from alma_memory_spark.operators.substring import (
        _excise,
        explode_token_windows,
        token_units,
    )

    base = train.select(F.col(id_col), token_units(text_col).alias("units"))
    wins = explode_token_windows(train, n, id_col, text_col, fp_hash=fp_hash)
    bench_fps = (
        explode_token_windows(bench, n, id_col, text_col, fp_hash=fp_hash)
        .select("fp")
        .distinct()
    )
    dropped = (
        wins.join(F.broadcast(bench_fps), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("start")).alias("starts"))
    )
    return _excise(base, dropped, id_col, n).withColumnRenamed(
        "text_dedup", "text_clean"
    )


#: default bench-side band cap (r13, VERDICT r12 #2): the r12 chain
#: proof measured the uncapped form quadratic on collision-dense
#: corpora (116 s vs 16.7 s at the 8x leg) — production callers who
#: never thought about skew should get the guard, not the pathology.
#: Matches the 'contamf' gate's setting; pass bench_band_cap=None to
#: opt out explicitly, and fuzzy_band_saturation() to observe what a
#: cap is dropping.
DEFAULT_BENCH_BAND_CAP = 8


def fuzzy_bands_from_signature(
    df: DataFrame,
    id_col: str,
    ts_col: str = "ts",
    sig_col: str = "sig",
    bands: int = 2,
    rows: int = 4,
    k: int | None = None,
) -> DataFrame:
    """(id_col, ts, band_idx, band_key) from a frame that ALREADY
    carries the distinct-token array and its MinHash signature — the
    share-the-signature entry (VERDICT r12 #3): a caller running LSH
    dedup AND fuzzy decontamination over the same corpus computes ONE
    tokenize->hash->minhash pass and bands it here for every consumer,
    instead of each stage re-deriving the signature from raw text.
    Band keys are identical to _fuzzy_band_frame's (same md5 fold over
    the same signature slices).

    Guard (ADVICE r13 #4): a signature ARRAY shorter than bands*rows
    yields out-of-bounds NULL sig slots that concat_ws silently skips
    — degenerate shared band keys and spurious candidates, the exact
    failure the sibling entry points' bands*rows<=k check prevents.
    Pass `k` (the signature length) for the same eager ValueError;
    with or without it, the band-key expression raises at RUNTIME on
    any row whose signature array has size < bands*rows. (The check is
    on ARRAY SIZE, not slot nullness: a full-length signature with
    NULL slots is legitimate — empty-token docs minhash to all-NULL —
    and bands identically to before.)"""
    if k is not None and bands * rows > k:
        raise ValueError(
            f"bands*rows must be <= k (got bands={bands} rows={rows} k={k})"
        )
    sig = F.col(sig_col)
    need = bands * rows
    short_err = F.raise_error(
        F.concat(
            F.lit(
                "fuzzy_bands_from_signature: signature has fewer than "
                f"bands*rows={need} slots (size "
            ),
            F.size(sig).cast("string"),
            F.lit(")"),
        )
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.when(
                F.size(sig) >= F.lit(need),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            sig[b * rows + r].cast("string")
                            for r in range(rows)
                        ],
                    )
                ),
            )
            .otherwise(short_err)
            .alias("band_key"),
        )
        for b in range(bands)
    ]
    return df.select(
        F.col(id_col),
        F.col(ts_col).alias("ts"),
        F.explode(F.array(*band_structs)).alias("bd"),
    ).select(id_col, "ts", "bd.band_idx", "bd.band_key")


def _fuzzy_band_frame(
    df: DataFrame, id_col: str, text_col: str, out_id: str,
    k: int, bands: int, rows: int,
) -> DataFrame:
    """(out_id, ts, band_idx, band_key) — distinct-token sets plus
    their MinHash band keys; the shared banding kernel of
    fuzzy_contamination_report and fuzzy_band_saturation."""
    from alma_memory_spark.functions.text import hash32, minhash_signature

    toked = (
        df.select(
            F.col(id_col).alias(out_id),
            F.array_distinct(ws_tokens(text_col)).alias("ts"),
        )
        .withColumn("hs", F.transform("ts", hash32))
        .withColumn("sig", minhash_signature(F.col("hs"), k, hashed=True))
    )
    return fuzzy_bands_from_signature(
        toked, out_id, "ts", "sig", bands, rows, k=k
    )


def fuzzy_band_saturation(
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 2,
    rows: int = 4,
    bench_band_cap: int | None = DEFAULT_BENCH_BAND_CAP,
) -> DataFrame:
    """The observability side of the default-on cap (VERDICT r12 #2):
    one row per OVER-CAP bench band bucket — (band_idx, band_key,
    n_bench_docs) — i.e. exactly the buckets
    fuzzy_contamination_report(bench_band_cap=cap) skips, the
    cross-corpus analogue of NearDupIndex's AddStats counters. An
    empty frame means the cap dropped nothing; `count()` of it is the
    capped-groups counter, `sum(n_bench_docs)` the dropped band rows.
    Runs entirely on the eval-set-sized bench frame (one groupBy)."""
    if bands * rows > k:
        raise ValueError(
            f"bands*rows must be <= k (got bands={bands} rows={rows} k={k})"
        )
    bb = _fuzzy_band_frame(bench, id_col, text_col, "_bid", k, bands, rows)
    counts = bb.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("n_bench_docs")
    )
    if bench_band_cap is None:
        return counts.filter(F.lit(False))
    return counts.filter(F.col("n_bench_docs") > bench_band_cap)


def fuzzy_contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 2,
    rows: int = 4,
    verify_t: float = 0.8,
    bench_band_cap: int | None = DEFAULT_BENCH_BAND_CAP,
    warn_dropped: bool = False,
) -> DataFrame:
    """FUZZY decontamination (r12): (doc_id, n_bench_matches,
    max_jaccard_u) for every training doc whose DISTINCT-TOKEN set is
    near-duplicate of ANY benchmark doc — MinHash-LSH candidates
    (band-key equality) verified by exact Jaccard >= `verify_t`.

    `bench_band_cap` is the cross-corpus form of the LSH skew guard:
    a stop-phrase band key shared by many BENCH docs multiplies every
    colliding train row by that bucket's size — capping the BENCH side
    (the small broadcast side, so the count is one cheap window over
    eval-set-sized data) bounds candidates at |train| x cap x bands.
    DEFAULT-ON since r13 (the r12 chain proof measured the uncapped
    form quadratic on collision-dense corpora); pass None to opt out.
    Recall trade as with NearDupIndex.band_cap: a pair whose ONLY
    shared band sits in an over-cap bucket is missed —
    fuzzy_band_saturation() reports exactly the skipped buckets, and
    `warn_dropped=True` (explicit opt-in) raises a UserWarning
    whenever the cap actually drops a bucket, at the cost of one eager
    aggregate over the (eval-set-sized) bench side. Default-OFF on the
    report path since r15 (VERDICT r14 #3): the eager count ran one
    Spark job at plan-CONSTRUCTION time on every call, whether or not
    anything was over cap — the same construction-time fixed-cost
    class r14 removed from the serving tier. A fully lazy warning via
    `df.observe()` was tried first and is NOT viable: in Spark 4.1.2
    observed metrics come back empty/broken whenever the observed
    subtree (which here contains the bucket-count window) sits below a
    join — reproduced with both broadcast-hinted and unhinted joins;
    plain scans, window-only and broadcast-without-window shapes all
    work. The stream-safe flag form (with_fuzzy_contamination_flag)
    keeps its default-ON warning — it collects the bench buckets at
    plan-build time anyway, so its check is free.

    The open-data complement to the exact n-gram stage
    (contamination_report): paraphrased or lightly-edited benchmark
    items share no 13-gram but keep most of their token set — the
    FineWeb/DCLM-style fuzzy pass catches them. `max_jaccard_u` is the
    best match's Jaccard in integer MICRO units
    (round(jaccard * 1e6)): an exact cross-engine value without
    float->string formatting hazards.

    Spark shape (100 TB): the TRAIN side is one narrow map (distinct
    tokens -> k-min signature -> band keys, no explode of grams) and
    never shuffles until the final map-side-combinable groupBy on
    doc_id; the BENCH side (eval sets: thousands of docs) broadcasts
    twice — once as band keys for the candidate join, once as token
    sets for the verify. A stop-phrase band key fans candidates out by
    at most the BENCH bucket size (broadcast-bounded, transient rows
    inside one narrow stage) — there is no train-side self-join, so
    the quadratic blowup LSH dedup needs a band cap for cannot occur
    here. Reference: same signature/banding kernel as the 'pair'/
    'ndidx' gates (functions/text.minhash_signature, Broder 1997;
    banding per Leskovec-Rajaraman-Ullman ch.3)."""
    if bands * rows > k:
        # sig[band*rows + r] past k yields NULLs that concat_ws
        # silently skips -> degenerate shared band keys and spurious
        # candidates (the ADVICE-r6 class NearDupIndex.build guards)
        raise ValueError(
            f"bands*rows must be <= k (got bands={bands} rows={rows} k={k})"
        )

    return fuzzy_contamination_report_from_bands(
        _fuzzy_band_frame(train, id_col, text_col, id_col, k, bands, rows),
        _fuzzy_band_frame(bench, id_col, text_col, id_col, k, bands, rows),
        id_col=id_col,
        verify_t=verify_t,
        bench_band_cap=bench_band_cap,
        warn_dropped=warn_dropped,
    )


def fuzzy_contamination_report_from_bands(
    train_bands: DataFrame,
    bench_bands: DataFrame,
    id_col: str = "doc_id",
    verify_t: float = 0.8,
    bench_band_cap: int | None = DEFAULT_BENCH_BAND_CAP,
    warn_dropped: bool = False,
) -> DataFrame:
    """The join+verify half of fuzzy_contamination_report over
    PRE-BANDED frames — columns (<id_col>, ts, band_idx, band_key),
    the fuzzy_bands_from_signature shape. Use when the signature pass
    is shared with other LSH consumers (VERDICT r12 #3); values are
    identical to the from-raw-text form by construction (the banding
    kernel is the same code path).

    Both token sets ride THROUGH the broadcast band join (each band
    row already carries its side's ts), so the verify needs no re-join
    of candidates against the train table — the train side's only
    shuffles are the (tid, bid) dedup and the final groupBy."""
    tb = train_bands.select(
        F.col(id_col).alias("_tid"), "ts", "band_idx", "band_key"
    )
    bb = bench_bands.select(
        F.col(id_col).alias("_bid"),
        F.col("ts").alias("bts"),
        "band_idx",
        "band_key",
    )
    if bench_band_cap is not None:
        from pyspark.sql.window import Window as _W

        bb = bb.withColumn(
            "_bn",
            F.count(F.lit(1)).over(_W.partitionBy("band_idx", "band_key")),
        )
        if warn_dropped:
            # EXPLICIT OPT-IN (r15; was default-on): one eager
            # aggregate over the BENCH side only (eval-set-sized by
            # definition — the same data that broadcasts next). This
            # runs a Spark job at plan-construction time; the default
            # keeps construction fully lazy and callers who need the
            # exhaustiveness signal opt in here or run
            # fuzzy_band_saturation() themselves.
            import warnings

            n_over = (
                bb.filter(F.col("_bn") > bench_band_cap)
                .select("band_idx", "band_key")
                .distinct()
                .count()
            )
            if n_over:
                warnings.warn(
                    f"fuzzy contamination report: {n_over} bench band "
                    f"bucket(s) exceed bench_band_cap={bench_band_cap} "
                    "and are skipped — the report is not exhaustive. "
                    "Inspect them with fuzzy_band_saturation(); pass "
                    "bench_band_cap=None for the exhaustive (skew-"
                    "exposed) form or warn_dropped=False to silence.",
                    stacklevel=2,
                )
        bb = bb.filter(F.col("_bn") <= bench_band_cap).drop("_bn")
    cand = (
        tb.join(F.broadcast(bb), ["band_idx", "band_key"])
        .select("_tid", "ts", "_bid", "bts")
        .dropDuplicates(["_tid", "_bid"])
    )
    inter = F.size(F.array_intersect("ts", "bts")).cast("double")
    union = (
        F.size("ts").cast("double") + F.size("bts").cast("double") - inter
    )
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    verified = cand.withColumn("_jac", jac).filter(
        F.col("_jac") >= F.lit(verify_t)
    )
    return (
        verified.groupBy("_tid")
        .agg(
            F.count(F.lit(1)).alias("n_bench_matches"),
            F.round(F.max("_jac") * F.lit(1e6)).cast("long").alias("max_jaccard_u"),
        )
        .select(
            F.col("_tid").alias(id_col), "n_bench_matches", "max_jaccard_u"
        )
    )


def decontaminate_fuzzy(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify_t: float = 0.8,
    **kw,
) -> DataFrame:
    """Training frame minus fuzzy-contaminated docs (left anti-join on
    the fuzzy report ids) — the drop-doc form of
    fuzzy_contamination_report."""
    bad = fuzzy_contamination_report(
        train, bench, id_col, text_col, verify_t=verify_t, **kw
    ).select(id_col)
    return train.join(bad, id_col, "left_anti")


def with_fuzzy_contamination_flag(
    df: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    k: int = 8,
    bands: int = 2,
    rows: int = 4,
    verify_t: float = 0.8,
    bench_band_cap: int | None = DEFAULT_BENCH_BAND_CAP,
    flag_col: str = "is_contaminated",
) -> DataFrame:
    """STREAM-SAFE fuzzy decontamination (r13): attach a boolean
    `flag_col` that is true iff the row's distinct-token set is a
    MinHash-LSH candidate + exact-Jaccard >= `verify_t` near-dup of
    any benchmark doc — the per-row FLAG form of
    fuzzy_contamination_report, decision-identical (contract-tested).

    Why a separate form: the report is a join + per-doc aggregate, and
    dropping via its ids is a self-join — none of which a Structured
    Streaming frame allows against itself. This form is ONE stateless
    vectorized pandas UDF: the capped bench band buckets (eval-set-
    sized by definition) collect ONCE at plan-build time and ride the
    task closure, the same shape semantic_contamination_report uses
    for its bench matrix; each row re-derives its signature/band keys
    in the kernel (faithful ports of ws_tokens/hash32/
    minhash_signature — pinned against the column kernels by the
    contract test) and verifies candidates in-process. Works on batch
    frames too; `stream.filter(~F.col(flag_col))` is the streaming
    drop. Cost: one Python pass over the stream — the batch report
    stays the cheaper choice when a join is available.

    The bench collect happens when THIS function runs (plan-build):
    a long-lived streaming query pins that snapshot of the benchmark
    corpus, matching the static-side semantics of stream-static
    joins."""
    import hashlib
    import re

    from alma_memory_spark.functions.text import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_PRIME,
        WS_RE,
    )
    from alma_memory_spark.session import ensure_package_shipped

    if bands * rows > k:
        raise ValueError(
            f"bands*rows must be <= k (got bands={bands} rows={rows} k={k})"
        )
    ensure_package_shipped(df.sparkSession)

    # bench side: capped band buckets -> {(band_idx, band_key):
    # [(bid, frozenset(tokens))]}, collected once (eval-set-sized)
    bb = _fuzzy_band_frame(bench, bench_id_col, text_col, "_bid", k, bands, rows)
    buckets: dict = {}
    for r in bb.collect():
        buckets.setdefault((r["band_idx"], r["band_key"]), []).append(
            (r["_bid"], frozenset(r["ts"]))
        )
    if bench_band_cap is not None:
        # cap applied driver-side over the already-collected buckets
        # (cheaper than the former Spark window — no shuffle at all),
        # which also makes the dropped-bucket warning free
        # (ADVICE r13 #2): decision-identical to filtering _bn <= cap.
        over = [kk for kk, v in buckets.items() if len(v) > bench_band_cap]
        if over:
            import warnings

            warnings.warn(
                f"with_fuzzy_contamination_flag: {len(over)} bench band "
                f"bucket(s) exceed bench_band_cap={bench_band_cap} and "
                "are skipped — the flag is not exhaustive (see "
                "fuzzy_band_saturation; bench_band_cap=None opts out).",
                stacklevel=2,
            )
            for kk in over:
                del buckets[kk]

    ws_re = re.compile(WS_RE)
    a_s, b_s, p = list(MINHASH_A[:k]), list(MINHASH_B[:k]), MINHASH_PRIME

    def _flag_one(text) -> bool:
        ts = {t for t in ws_re.split((text or "").lower()) if t != ""}
        if not ts:
            return False
        hs = [
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
            for t in ts
        ]
        sig = [min((a_s[j] * h + b_s[j]) % p for h in hs) for j in range(k)]
        seen_bids = set()
        for b in range(bands):
            key = hashlib.md5(
                "_".join(
                    str(sig[b * rows + r_]) for r_ in range(rows)
                ).encode()
            ).hexdigest()
            for bid, bts in buckets.get((b, key), ()):
                if bid in seen_bids:
                    continue
                seen_bids.add(bid)
                inter = len(ts & bts)
                union = len(ts) + len(bts) - inter
                # same raw-double compare as the report's verify (ints
                # divide identically in IEEE double on both engines)
                jac = (inter / union) if union > 0 else 0.0
                if jac >= verify_t:
                    return True
        return False

    @F.pandas_udf("boolean")
    def _flag(texts):
        return texts.map(_flag_one)

    return df.withColumn(flag_col, _flag(F.col(text_col)))


def semantic_contamination_report(
    train_emb: DataFrame,
    bench_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """SEMANTIC decontamination (r12): (id, n_bench_matches, max_cos)
    for every training vector whose embedding has cosine >= `threshold`
    against ANY benchmark vector — the third decontamination mode
    (exact n-gram / fuzzy lexical / semantic): a REWRITTEN benchmark
    item shares neither long n-grams nor most of its token set, but a
    decent embedder keeps it close in vector space.

    Spark shape (100 TB): the BENCH matrix (eval-set-sized) collects
    once and rides the task closure L2-normalized; the train side is
    ONE mapInPandas pass — per Arrow batch, a single BLAS matmul
    (Vn @ Bn.T) scores every train row against every bench row, and
    the per-row count/max reduce inside the kernel. No shuffle at all;
    no train self-join. Cosines round at 6dp BEFORE thresholding (the
    established cross-engine contract of the cosine/semdedup gates).
    """
    import numpy as np
    import pandas as pd

    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(train_emb.sparkSession)
    bench_rows = bench_emb.select(vec_col).collect()
    id_type = train_emb.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_bench_matches long, max_cos double"
    )
    if not bench_rows:
        return train_emb.sparkSession.createDataFrame([], out_schema)
    B = np.array([r[0] for r in bench_rows], dtype=np.float64)
    Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
    t_, Bn_, idc = float(threshold), Bn, id_col

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-300
            )
            S = np.round(Vn @ Bn_.T, 6)
            hit = S >= t_
            nm = hit.sum(axis=1)
            keep = nm > 0
            if not keep.any():
                continue
            mx = np.where(hit, S, -np.inf).max(axis=1)
            yield pd.DataFrame(
                {
                    idc: pdf[idc].to_numpy()[keep],
                    "n_bench_matches": nm[keep].astype("int64"),
                    "max_cos": mx[keep],
                }
            )

    return train_emb.select(id_col, vec_col).mapInPandas(score, out_schema)


def decontaminate_semantic(
    train: DataFrame,
    train_emb: DataFrame,
    bench_emb: DataFrame,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Training frame minus semantically-contaminated docs: anti-join
    on the semantic report's ids (train_emb maps emb_id_col ->
    train[id_col])."""
    bad = semantic_contamination_report(
        train_emb, bench_emb, id_col=emb_id_col, threshold=threshold
    ).select(F.col(emb_id_col).alias(id_col))
    return train.join(bad, id_col, "left_anti")
