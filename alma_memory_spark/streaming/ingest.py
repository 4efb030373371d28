"""Structured Streaming layer: continuous learn-ingest and windowed
signal aggregation.

The reference has no streaming engine — its nearest mechanisms are
incremental `learn()` writes with cache invalidation (core.py:309-380)
and a background CleanupScheduler (forgetting.py:1239-1477). This module
is the Spark-native upgrade of those capabilities (SURVEY §2.9):

- `stream_outcomes`: readStream over an outcome-event directory ->
  foreachBatch append into the Parquet store + cache-epoch bump —
  exactly-once per micro-batch, the streaming form of learn();
- `windowed_outcome_stats`: watermarked sliding-window success-rate
  aggregation — the streaming form of the heuristic-extraction
  aggregate (late data handled by the watermark, not by reprocessing);
- `session_activity`: session_window gap sessions (streaming analog of
  the batch sessionize query);
- `streaming_strength`: decay-at-read is a stateless column expression
  (decay.py:74-122 design), so the SAME expression used in batch works
  on a stream — demonstrated here.

All testable locally with file sources + `format("memory")` sinks and
processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import json
import os
import uuid

from alma_memory_spark import schemas
from alma_memory_spark.functions.temporal import recency_score


def _checkpoint_lineage(checkpoint: str | None, fallback: str) -> str:
    """Identify the WRITER RUN feeding a sink: the streaming query id
    Spark records in `<checkpoint>/metadata`. It is stable across
    restarts that resume the same checkpoint (so committed-epoch
    replays are recognized as replays) and fresh for a recreated
    checkpoint dir (so a new query's epoch 0 is recognized as a
    COLLISION with the previous lineage's segment 0, not a replay —
    the silent-drop failure mode of ADVICE r4). `fallback` (a uuid
    minted when the sink was wired) covers checkpoint-less test
    streams: within one query run the closure is stable, and any
    other run gets a different uuid — strictly safer than no id."""
    if checkpoint:
        meta = os.path.join(
            checkpoint[len("file:"):] if checkpoint.startswith("file:") else checkpoint,
            "metadata",
        )
        try:
            with open(meta) as f:
                qid = json.load(f).get("id")
            if qid:
                return str(qid)
        except (OSError, ValueError):
            pass
    return fallback


def read_outcome_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of outcome rows (schema-pinned; maxFilesPerTrigger
    bounds micro-batch size so state stays executor-memory-sized)."""
    return (
        spark.readStream.schema(schemas.OUTCOMES)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def stream_outcomes_into_store(stream: DataFrame, store, on_batch=None,
                               app_id: str = "stream-outcomes"):
    """foreachBatch sink: append each micro-batch to the outcomes table
    (a DataFrame write IS a batch write) and invalidate read caches.
    Returns the StreamingQuery; caller stops it.

    On the txlog backend each batch appends with a Delta-style
    idempotent-writer txn (app id = the sink, version = the epoch_id),
    so a crash-replayed micro-batch cannot double-append rows into the
    store — the same exactly-once contract the index sinks have. The
    swap-store backend keeps the checkpointed-source-only guarantee
    (replay of the window between sink and checkpoint commit
    double-appends there; use backend='txlog' when that matters).

    Fresh-checkpoint guard: txn versions are per-checkpoint epoch ids,
    so a query restarted on a RECREATED checkpoint re-delivers epoch 0
    and the store's txn dedupe would silently drop its batches (the
    same silent-loss mode as the index sinks, ADVICE r4). The sink
    records the checkpoint's streaming query id next to the store and
    raises on the first batch whose lineage changed while the txn
    high-water mark says its epoch "already applied"."""
    import inspect

    takes_txn = "txn" in inspect.signature(store.append).parameters
    suffix = "outcomes" if app_id == "stream-outcomes" else f"outcomes-{app_id}"
    ckpt = store.root + "/_stream_checkpoints/" + suffix
    run_id = uuid.uuid4().hex
    state = {"checked": False}

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if takes_txn:
            lineage = _checkpoint_lineage(ckpt, run_id)
            if not state["checked"]:
                state["checked"] = True
                rec_path = ckpt + ".lineage"
                try:
                    with open(rec_path) as f:
                        rec = f.read().strip()
                except OSError:
                    rec = None
                # two independent detectors for the fresh-checkpoint
                # silent-drop mode:
                # (1) lineage marker changed while this epoch claims
                #     "already applied";
                # (2) epoch STRICTLY below the txn high-water mark — a
                #     legitimate crash replay re-delivers exactly the
                #     high-water epoch, never an older one, so a lower
                #     first epoch means the checkpoint restarted from
                #     scratch. This catches stores written before the
                #     marker existed and marker deletion alike.
                high = store.txn_high_water("outcomes", app_id)
                fresh = (
                    rec is not None and rec != lineage and high >= int(epoch_id)
                ) or int(epoch_id) < high
                if fresh:
                    raise RuntimeError(
                        f"outcome stream at epoch {epoch_id} is behind the "
                        f"store's committed txn high-water mark ({high}) "
                        f"(recorded lineage {rec!r}, this query "
                        f"{lineage!r}): this is a fresh/recreated "
                        "checkpoint whose re-delivered batches would be "
                        "silently dropped by txn dedupe. Resume the "
                        "original checkpoint; for an intentional "
                        "re-ingest into the same store, pass a new "
                        "app_id to stream_outcomes_into_store — it gets "
                        "its own txn version space and checkpoint "
                        "instead of replaying epochs under this writer."
                    )
                os.makedirs(os.path.dirname(rec_path), exist_ok=True)
                with open(rec_path, "w") as f:
                    f.write(lineage)
            store.append(
                "outcomes", batch_df, txn=(app_id, int(epoch_id))
            )
        else:
            store.append("outcomes", batch_df)
        if on_batch is not None:
            on_batch(epoch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .start()
    )


def windowed_outcome_stats(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked windowed success-rate per (agent, task_type): the
    streaming form of the heuristic-extraction aggregate. Late rows
    beyond the watermark are dropped (bounded state)."""
    w = (
        F.window("timestamp", window, slide)
        if slide
        else F.window("timestamp", window)
    )
    n = F.count("*")
    succ = F.sum(F.when(F.col("success"), 1).otherwise(0))
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(w.alias("win"), "agent", "task_type")
        .agg(
            n.alias("occurrence_count"),
            succ.alias("success_count"),
            (succ.cast("double") / n).alias("success_rate"),
        )
    )


def session_activity(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """session_window sessions per agent (streaming analog of the batch
    sessionize operator)."""
    return (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.session_window("timestamp", gap).alias("session"), "agent")
        .agg(F.count("*").alias("n_events"))
    )


def streaming_strength(stream: DataFrame, half_life_days: float = 30.0) -> DataFrame:
    """Decay-at-read on a stream: the same stateless recency expression
    used in batch (design parity with decay.py:74-122)."""
    return stream.withColumn(
        "strength",
        recency_score("timestamp", F.current_timestamp(), half_life_days),
    )


def running_success_rate(
    stream: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-agent RUNNING totals across micro-batches (the incremental form
    of the learning loop's success tracking — state the windowed agg
    cannot express because it never closes).

    State = (occurrences, successes); emits one updated row per agent
    per batch. Pass `timeout_minutes` in production to expire idle
    agents' state (bounded state on an unbounded stream); the default is
    NoTimeout because ProcessingTimeTimeout schedules continuous
    timeout-evaluation batches, which livelocks the synchronous
    `processAllAvailable()` test/maintenance pattern."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "agent string, occurrence_count long, success_count long, success_rate double"
    )
    state_schema = "occ long, succ long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        occ, succ = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            occ += len(pdf)
            succ += int(pdf["success"].sum())
        state.update((occ, succ))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "agent": [key[0]],
                "occurrence_count": [occ],
                "success_count": [succ],
                "success_rate": [succ / occ if occ else 0.0],
            }
        )

    return stream.groupBy("agent").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def stream_documents_into_indexes(
    stream: DataFrame,
    text_index=None,
    ivf_index=None,
    neardup_index=None,
    semdedup_index=None,
    paragraph_index=None,
    window_index=None,
    checkpoint: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    on_batch=None,
    compact_every: int | None = None,
):
    """Continuous index maintenance: each micro-batch of new documents
    lands INCREMENTALLY in the persisted search indexes as an EPOCH
    SEGMENT — `InvertedTextIndex.add_epoch` / `IVFIndex.add_epoch`
    keyed by the foreachBatch epoch_id. This is the streaming form of
    the reference's rebuild-on-change contract
    (alma/retrieval/hybrid.py:53): instead of rebuilding when the
    corpus changes, the corpus change IS the index delta.

    EXACTLY-ONCE under crash replay: a restarted query re-delivers the
    last uncommitted micro-batch with the SAME epoch_id; the segment
    protocol makes that replay a no-op when the epoch already committed
    (atomic `_COMMIT` rename is the commit point) and an idempotent
    segment rewrite when it had not — postings/tf/df/avgdl can never
    double-apply, closing the r3 double-append window. The maintenance
    rebuild folds committed segments into the base index.

    Cost per batch is O(batch), not O(index): neither add reads
    existing postings/lists. Returns the StreamingQuery.

    Contract: ONE streaming writer lineage per index between rebuilds —
    epoch ids are per-checkpoint, so a RESUMED query must reuse its
    `checkpoint` (that is what makes replay detection correct), and a
    brand-new query (fresh checkpoint, epochs restart at 0) requires a
    rebuild first so its epochs cannot collide with committed segments
    of the previous lineage. Delta's txn (appId, version) dedupe has
    the same shape. The contract is ENFORCED, not just documented:
    each committed segment records the writer's lineage (the
    checkpoint's streaming query id), and an epoch collision from a
    different lineage raises in add_epoch instead of silently
    dropping the new query's batches (ADVICE r4).

    `compact_every=N` (r9) folds each maintained index's per-add file
    debris every N processed micro-batches via its compact()/
    compact_to() — every add appends one parquet file per touched
    partition, so a maintainer running thousands of micro-batches
    degrades file listings unboundedly without this (VERDICT r8 #2).
    Compaction swaps the index VERSION, so the sink re-binds its own
    handles; once the stream starts, the sink OWNS the handles — the
    caller's originals keep serving reads of their (retained) snapshot
    but must be re-loaded before any post-stream writes. The text
    index folds its segments at rebuild instead (no compact path)."""
    run_id = uuid.uuid4().hex  # checkpoint-less fallback lineage
    # mutable handle table: compaction returns FRESH handles and the
    # old ones refuse writes (superseded-version guard)
    refs = {
        "ivf": ivf_index,
        "neardup": neardup_index,
        "semdedup": semdedup_index,
        "paragraph": paragraph_index,
        "window": window_index,
    }
    batch_count = {"n": 0}

    def _require_extras(index, batch_df: DataFrame, kind: str) -> list[str]:
        """Scope-aware indexes (extra_cols at build) need those columns
        on every ingested batch; fail loudly with the contract instead
        of an unresolved-column AnalysisException mid-stream."""
        extras = [n for n, _t in getattr(index, "extra_cols", [])]
        missing = [c for c in extras if c not in batch_df.columns]
        if missing:
            raise ValueError(
                f"{kind} index was built with extra_cols={extras}; the "
                f"stream batch lacks {missing} — select them into the "
                "stream or rebuild the index without scope columns"
            )
        return extras

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lineage = _checkpoint_lineage(checkpoint, run_id)
        if text_index is not None:
            extras = _require_extras(text_index, batch_df, "text")
            # the stream's id column name need not match the index's
            # (engine-built indexes use id_col='id'; document streams
            # typically carry 'doc_id') — alias to the index's own
            text_index.add_epoch(
                batch_df.select(
                    F.col(id_col).alias(text_index.id_col),
                    F.col(text_col),
                    *extras,
                ),
                epoch_id,
                text_col=text_col,
                lineage=lineage,
            )
        if refs["ivf"] is not None:
            _require_extras(refs["ivf"], batch_df, "IVF")
            refs["ivf"].add_epoch(
                batch_df, epoch_id, id_col=id_col, vec_col=vec_col,
                lineage=lineage,
            )
        if refs["neardup"] is not None:
            # near-dup maintenance (r6): candidates against only the
            # batch's band buckets, pairs appended. Crash replay of a
            # batch is pair-idempotent (add anti-joins accumulated
            # pairs, and dedupes replayed band/tok rows before the
            # cap + verify reads); the only replay artifacts are
            # storage bloat and an over-counted n_docs stat, both
            # folded by a rebuild — so this add doesn't need the
            # epoch-segment protocol the score-bearing text/IVF adds
            # require
            refs["neardup"].add(
                batch_df.select(
                    F.col(id_col).alias(refs["neardup"].id_col),
                    F.col(text_col),
                ),
                text_col=text_col,
            )
        if refs["semdedup"] is not None:
            # semantic near-dup maintenance (r7): pairs computed against
            # only the batch's cells (pruned lists read), membership
            # published first with a replay guard — a redelivered batch
            # appends zero pairs AND zero list rows (stronger than the
            # lexical index's replay story, which tolerates band/tok
            # bloat until a rebuild), so no epoch-segment protocol here
            # either
            refs["semdedup"].add(
                batch_df.select(
                    F.col(id_col).alias(refs["semdedup"].id_col),
                    F.col(vec_col).alias(refs["semdedup"].vec_col),
                )
            )
        if refs["window"] is not None:
            # substring (token-window) dedup maintenance (r10): same
            # ownership/replay contract as the paragraph index — a
            # redelivered batch appends zero owner rows and returns
            # the byte-identical excised output, so no epoch-segment
            # protocol needed here either
            refs["window"].add(
                batch_df.select(
                    F.col(id_col).alias(refs["window"].id_col),
                    F.col(text_col),
                ),
                text_col=text_col,
            )
        if refs["paragraph"] is not None:
            # paragraph dedup maintenance (r8): within-batch winners
            # registered as owners for unseen fingerprints only
            # (bucket-pruned owner read). Replay appends zero OWNER
            # rows and would return the identical deduped output —
            # ownership, not a bare seen-set — so no epoch-segment
            # protocol here either; the discarded return frame costs
            # nothing (Spark plans are lazy)
            refs["paragraph"].add(
                batch_df.select(
                    F.col(id_col).alias(refs["paragraph"].id_col),
                    F.col(text_col),
                ),
                text_col=text_col,
            )
        batch_count["n"] += 1
        if compact_every and batch_count["n"] % compact_every == 0:
            # fold per-add file debris (one parquet file per touched
            # partition per add) every N batches; the sink runs
            # single-threaded inside foreachBatch, so the single-writer
            # compaction contract holds, and the fresh handles replace
            # the superseded ones for the NEXT batch
            for key in ("neardup", "semdedup", "paragraph", "window"):
                if refs[key] is not None:
                    refs[key] = refs[key].compact()
            if refs["ivf"] is not None:
                # compact_to preserves committed epoch markers, so the
                # exactly-once replay contract survives the fold
                refs["ivf"] = refs["ivf"].compact_to(refs["ivf"].path)
        if on_batch is not None:
            on_batch(epoch_id)

    writer = stream.writeStream.foreachBatch(_sink)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def dedup_document_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: the continuous form of the batch
    `exact_dedup` operator (same md5-over-normalized-text fingerprint,
    functions/text.py). `dropDuplicatesWithinWatermark` keeps ONE row
    per fingerprint and expires its state once the watermark passes —
    bounded state on an unbounded stream, which a plain
    dropDuplicates (state grows forever) cannot give. This is the
    training-data shape: a firehose of documents deduped before they
    reach the corpus, with near-dup handled downstream by the
    incremental index adds (stream_documents_into_indexes)."""
    from alma_memory_spark.functions.text import fingerprint

    return (
        stream.withColumn("fingerprint", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
