"""Parquet-backed table store: the engine's storage layer.

The reference's storage ABC (alma/storage/base.py:36-1171) is a fixed
menu of save/get/delete per memory type with upsert-by-id semantics
(INSERT OR REPLACE, sqlite_local.py:644-813). On Spark + plain Parquet:

- save (single or batch)  -> append new rows (a DataFrame write IS a
  batch write; the reference's separate batch APIs collapse away)
- upsert-by-id            -> union + window-dedup keep-latest rewrite
  (Delta MERGE would replace this where available; import-gated)
- delete                  -> anti-join rewrite, with an append-only
  forget-audit sink written first (reference: sqlite_local.py:1820-1855)
- archive/restore         -> move rows between live and archive tables
  (reference: base.py:991-1128)

Big memory tables are partitioned by (project_id, agent) so the
reference's universal WHERE template becomes partition pruning; at
100 TB that is the difference between scanning everything and scanning
one directory.
"""

from __future__ import annotations

import contextlib
import functools
import hashlib
import operator
import os
import shutil
from datetime import datetime, timezone
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from alma_memory_spark import schemas

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

#: write-time output-file sizing target (guide §6: aim for files sized
#: by data volume, not by task count). Overridable for deployments;
#: the same 128 MiB default the compaction path uses.
_TARGET_FILE_BYTES = int(
    os.environ.get("ALMA_STORE_TARGET_FILE_BYTES", str(128 << 20))
)


def size_write_partitions(df: DataFrame) -> DataFrame:
    """Bound a write's output-file count by the frame's ESTIMATED data
    volume (r14, guide §6 small-files): coalesce to
    ceil(est_bytes / target_file_bytes) when that is below the session
    parallelism, else leave the frame alone.

    Rationale: append/overwrite used to emit one file per input
    partition, so a 500-row engine batch arriving with 32 partitions
    paid 32 task commits + left 32 tiny files (measured 3.8 s vs 0.5 s
    per small write on the bench host). The estimate comes from
    Catalyst (`optimizedPlan().stats()`), which without CBO propagates
    base-relation sizes and does NOT discount filters — i.e. it
    over-estimates, and an over-estimate only means fewer merged
    partitions (safe). Unknown sizes estimate huge -> no resize ->
    prior behavior. repartition() rather than coalesce(): coalesce is
    a narrow dependency that would COLLAPSE the upstream computation
    (an upsert's window-dedup would run single-task — measured as a
    wall regression); the round-robin exchange keeps the upstream
    parallel and only the final write tasks merge. Sort-before-
    repartition (SPARK-23207, default-on) keeps the row-to-partition
    assignment deterministic under task retry."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    if est <= 0:
        return df
    want = -(-est // _TARGET_FILE_BYTES)  # ceil
    par = df.sparkSession.sparkContext.defaultParallelism
    if want >= par:
        return df
    return df.repartition(int(want))

#: version-pinned read-plan cache entries per store handle (r10,
#: VERDICT r9 #4) — each entry is one analyzed DataFrame, a few KB of
#: driver/JVM objects
_READ_CACHE_MAX = 64


def _decode_part(dirname: str):
    """Decode a hive partition dir name ('agent=a%20b') to its value.
    Spark escapes special chars percent-style; the hive default
    partition marker means NULL."""
    value = dirname.split("=", 1)[1]
    if value == _HIVE_NULL:
        return None
    return unquote(value)


class ParquetStore:
    def __init__(self, spark: SparkSession, root: str):
        import threading
        from collections import OrderedDict

        self.spark = spark
        self.root = root
        self._held_locks: set[tuple] = set()
        # version-pinned read-plan cache (r10, VERDICT r9 #4): reads
        # pin the plan to the table's on-disk write-version stamp and
        # serve the SAME DataFrame until any writer (this handle,
        # another handle, another process) bumps it — see read()
        self._read_cache: OrderedDict[tuple, tuple[str, DataFrame]] = (
            OrderedDict()
        )
        self._read_cache_lock = threading.Lock()
        #: escape hatch: set False to force a fresh listing every read
        self.plan_cache_enabled = True

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    @contextlib.contextmanager
    def _table_lock(self, table: str):
        """Advisory per-table writer lock (fcntl flock on `<table>.lock`).

        The directory-rename swap protocol is single-writer-per-table by
        design (the reference is too: one SQLite connection). The lock
        makes that contract ENFORCED on one host instead of assumed —
        two processes upserting the same table serialize their swaps
        rather than interleaving them. Cross-host deployments need a
        transactional table format (Delta/Iceberg) instead; see
        SCALE.md. Reentrant within a process via a held-lock registry
        (delete() takes the lock and calls overwrite(), which takes it
        again)."""
        import threading

        lock_path = self._path(table) + ".lock"
        os.makedirs(self.root, exist_ok=True)
        # reentrance is PER-THREAD: keyed by (thread, path), so one
        # thread's delete()->overwrite() nesting re-enters, but a
        # second thread on the same store handle still blocks on the
        # flock instead of slipping through the held-set
        key = (threading.get_ident(), os.path.abspath(lock_path))
        if key in self._held_locks:
            yield
            return
        import fcntl

        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            self._held_locks.add(key)
            try:
                yield
            finally:
                self._held_locks.discard(key)
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    def _dirty(self, table: str) -> bool:
        """Does the table carry any crash residue worth recovering?

        The scan is lock-free, so it can race a concurrent writer's
        directory renames (listdir on a dir that just moved). Any scan
        error conservatively reports dirty: the caller then takes the
        table lock, waits out the writer, and re-checks."""
        path = self._path(table)
        try:
            if os.path.isfile(path + ".txn") or os.path.isdir(path + ".old"):
                return True
            if not os.path.isdir(path):
                return False
            for proj_dir in os.listdir(path):
                pd = os.path.join(path, proj_dir)
                if not (proj_dir.startswith("project_id=") and os.path.isdir(pd)):
                    continue
                for d in os.listdir(pd):
                    if d.startswith(".agent=") and (
                        d.endswith(".old") or d.endswith(".dropped")
                    ):
                        return True
            return False
        except OSError:
            return True  # racing a writer's rename — settle under the lock

    def _recover(self, table: str) -> None:
        """Crash recovery — DIRTY-GATED and LOCK-AWARE.

        Fast path: a clean table (no marker, no asides, no table-level
        .old) needs nothing; reads stay lock-free and work on read-only
        mounts. A dirty table takes the BLOCKING table lock before
        repairing — so recovery never races an active writer's renames,
        and a second reader arriving mid-recovery waits for the first
        instead of reading a half-repaired directory. If the lock file
        cannot be created (read-only store), the torn state is read
        as-is: nothing else is possible without write access.

        Protocol recovered: every partition swap writes a `<table>.txn`
        PLAN (staged dirs, asides, dropped partitions) whose removal is
        the single commit point. Marker present => roll the WHOLE
        logical write back: remove every planned destination that made
        it live (including brand-new partitions with no aside), restore
        every aside — so swaps are all-or-nothing. No marker: the swap
        committed; stray `.old` asides with a live dir and `.dropped`
        asides are post-commit leftovers to drop, and a lone `.old`
        with no live dir is the overwrite() rename pair to restore."""
        if not self._dirty(table):
            return
        # only LOCK ACQUISITION failures are swallowed (read-only store:
        # nothing can be repaired without write access); errors during
        # the repair itself must surface, not leave a silent half-repair
        cm = self._table_lock(table)
        try:
            cm.__enter__()
        except OSError:
            return
        try:
            # the writer we waited on may have finished cleanly
            if self._dirty(table):
                self._recover_locked(table)
        finally:
            cm.__exit__(None, None, None)

    def _recover_locked(self, table: str) -> None:
        # repairs change the file set; a crashed writer never ran its
        # post-mutation bump, so a plan cached at its pre-bump stamp
        # must not survive the repair
        self._bump_version(table)
        path = self._path(table)
        old = path + ".old"
        if not os.path.isdir(path) and os.path.isdir(old):
            os.rename(old, path)  # overwrite() died between its renames
        elif os.path.isdir(path) and os.path.isdir(old):
            # overwrite() committed (staging renamed in) but died before
            # dropping the old copy — debris; without this, _dirty stays
            # true and every read pays the lock until the next overwrite
            shutil.rmtree(old, ignore_errors=True)
        txn = path + ".txn"
        if os.path.isfile(txn):
            import json

            try:
                with open(txn) as f:
                    plan = json.load(f)
                if not isinstance(plan, dict):
                    plan = None
            except (OSError, ValueError):
                plan = None
            if plan is None:
                # unreadable/legacy marker (e.g. the v1 'swap' text):
                # fall back to the DISK-SCAN rollback — restore every
                # on-disk aside over whatever is live. Removing the
                # marker without rolling back would let the no-marker
                # debris path DELETE those asides (the pre-crash
                # originals) on the next read.
                self._rollback_from_disk(table)
                shutil.rmtree(path + ".staging", ignore_errors=True)
                os.remove(txn)
                return

            def _live_rel(aside_rel: str) -> str:
                base = os.path.basename(aside_rel)
                live_name = base[1:].rsplit(".", 1)[0]  # strip '.'+suffix
                return os.path.join(os.path.dirname(aside_rel), live_name)

            planned_asides = plan.get("asides", []) + plan.get("dropped", [])
            has_aside = {_live_rel(r) for r in planned_asides}
            # ROLLBACK. Ordering is load-bearing: a crash can land
            # BEFORE phase A, when the planned destinations still hold
            # the ORIGINAL data and no aside exists yet — blindly
            # removing every dst would destroy it. A dst is removed
            # only when (a) the plan has no aside for it (brand-new
            # partition: pre-phase-B it doesn't exist, post-rename it
            # must go), or (b) its aside exists on disk (phase A
            # renamed the original away; live is writer debris).
            for rel in plan.get("dsts", []):
                if rel not in has_aside:
                    dst = os.path.join(path, rel)
                    shutil.rmtree(dst, ignore_errors=True)
                    try:  # drop the empty project dir makedirs created
                        os.rmdir(os.path.dirname(dst))
                    except OSError:
                        pass
            for rel in planned_asides:
                aside = os.path.join(path, rel)
                if os.path.isdir(aside):
                    live = os.path.join(path, _live_rel(rel))
                    shutil.rmtree(live, ignore_errors=True)
                    os.rename(aside, live)
                # aside missing => phase A never reached it: the live
                # dir still holds the original data — leave it alone
            shutil.rmtree(path + ".staging", ignore_errors=True)
            os.remove(txn)
            return
        if not os.path.isdir(path):
            return
        # no marker: post-commit leftovers / legacy overwrite residue
        for proj_dir in os.listdir(path):
            pd = os.path.join(path, proj_dir)
            if not (proj_dir.startswith("project_id=") and os.path.isdir(pd)):
                continue
            for d in os.listdir(pd):
                aside = os.path.join(pd, d)
                if d.startswith(".agent=") and d.endswith(".dropped"):
                    shutil.rmtree(aside)  # delete committed at marker removal
                elif d.startswith(".agent=") and d.endswith(".old"):
                    live = os.path.join(pd, d[1:-4])
                    if os.path.isdir(live):
                        shutil.rmtree(aside)
                    else:
                        os.rename(aside, live)

    def _rollback_from_disk(self, table: str) -> None:
        """Plan-less rollback (legacy/corrupt marker): every on-disk
        aside is the pre-crash original — restore it over whatever is
        live. Brand-new partitions cannot be identified without a plan
        and are left in place (extra data, never lost data)."""
        path = self._path(table)
        if not os.path.isdir(path):
            return
        for proj_dir in os.listdir(path):
            pd = os.path.join(path, proj_dir)
            if not (proj_dir.startswith("project_id=") and os.path.isdir(pd)):
                continue
            for d in os.listdir(pd):
                if not d.startswith(".agent="):
                    continue
                if d.endswith(".old"):
                    live = os.path.join(pd, d[1:-4])
                elif d.endswith(".dropped"):
                    live = os.path.join(pd, d[1:-8])
                else:
                    continue
                shutil.rmtree(live, ignore_errors=True)
                os.rename(os.path.join(pd, d), live)

    def exists(self, table: str) -> bool:
        self._recover(table)
        p = self._path(table)
        if not os.path.isdir(p):
            return False
        return any(
            f.endswith(".parquet") or f.startswith("project_id=") or f.startswith("_SUCCESS")
            for f in os.listdir(p)
        )

    # ---- write-version stamps + read-plan cache (r10, VERDICT r9 #4) --
    #
    # spark.read.parquet snapshots the file listing and schema EAGERLY,
    # so a fresh read costs a reader + listing job every call — ~0.1 s
    # of pure serving latency per table on the retrieve hot path. The
    # plan is a pure function of the table's file set, so it is
    # cacheable iff staleness is detectable: every mutation brackets
    # itself with bumps of an on-disk `<table>.ver` stamp (atomic
    # rename), and read() serves the cached plan only while the stamp
    # it was built under is still current. Cross-ENGINE writers (the r9
    # blocker: another process compacting the store would strand a
    # purely in-process cache on deleted files) bump the same on-disk
    # stamp, so their commits invalidate this process's cache too. The
    # PRE-mutation bump covers readers that cache mid-mutation: their
    # entry keys on the pre-bump stamp, which the post-bump supersedes.
    # Tables written by anything OTHER than this protocol (out-of-band
    # file drops) have no stamp and are never cached.

    def _ver_path(self, table: str) -> str:
        return self._path(table) + ".ver"

    def _version_stamp(self, table: str) -> str | None:
        try:
            with open(self._ver_path(table)) as f:
                return f.read()
        except OSError:
            return None

    def version_stamp(self, table: str) -> str | None:
        """Public staleness token for external caches keyed like the
        read-plan cache (e.g. the engine's compiled serving templates):
        changes on every committed mutation by any writer process;
        None when the table has no stamp (never cache)."""
        return self._version_stamp(table)

    def _bump_version(self, table: str) -> None:
        import uuid

        os.makedirs(self.root, exist_ok=True)
        tmp = self._ver_path(table) + "." + uuid.uuid4().hex
        with open(tmp, "w") as f:
            f.write(uuid.uuid4().hex)
        os.rename(tmp, self._ver_path(table))

    @contextlib.contextmanager
    def _bumping(self, table: str):
        """Bracket a mutation with stamp bumps. The post-bump runs even
        on failure — a died-mid-write mutation may have touched files,
        and an extra invalidation is always safe."""
        self._bump_version(table)
        try:
            yield
        finally:
            self._bump_version(table)

    def read(self, table: str, declared_schema: bool = False) -> DataFrame:
        """`declared_schema=True` skips parquet schema inference (its
        footer-sampling jobs are serving-path latency) by trusting the
        registered StructType. Only for tables whose files are always
        written through that exact schema (e.g. retrieval_feedback on
        the retrieve hot path) — NOT for migrate()-managed tables,
        where inferred-vs-declared difference IS the signal.

        Reads are PLAN-CACHED per (table, declared_schema), pinned to
        the table's write-version stamp (see the stamp block above):
        a warm retrieve serves the analyzed DataFrame straight from
        the cache — zero listing jobs, zero py4j plan construction —
        and any committed write (this or another process) invalidates
        via the stamp. Crash residue bypasses the cache (_dirty) so
        recovery still runs before a fresh listing."""
        key = (table, declared_schema)
        stamp = (
            self._version_stamp(table) if self.plan_cache_enabled else None
        )
        if stamp is not None:
            with self._read_cache_lock:
                ent = self._read_cache.get(key)
            if ent is not None and ent[0] == stamp and not self._dirty(table):
                with self._read_cache_lock:
                    self._read_cache.move_to_end(key)
                return ent[1]
        if not self.exists(table):
            schema = schemas.ALL_TABLES[table]
            df = self.spark.createDataFrame([], schema)
        else:
            reader = self.spark.read
            if declared_schema:
                reader = reader.schema(schemas.ALL_TABLES[table])
            df = reader.parquet(self._path(table))
        # cache only when the stamp is UNCHANGED across the build (a
        # concurrent writer's pre-bump between our stamp read and now
        # would otherwise pin its mid-mutation listing) and the table
        # is clean
        if (
            stamp is not None
            and self._version_stamp(table) == stamp
            and not self._dirty(table)
        ):
            with self._read_cache_lock:
                self._read_cache[key] = (stamp, df)
                while len(self._read_cache) > _READ_CACHE_MAX:
                    self._read_cache.popitem(last=False)
        return df

    #: per-table event-time column, used to lay rows out time-sorted
    #: inside every written file: parquet keeps min/max stats per row
    #: group, so temporal predicates (forget's max_age_days cutoff,
    #: as-of reads, retention scans) skip whole row groups of a sorted
    #: file instead of decoding them. Costs one per-task in-memory sort
    #: at write; changes row ORDER only, never content (row order is
    #: not semantic anywhere in the store contract).
    TIME_SORT_COLS = {
        "heuristics": "last_validated",
        "outcomes": "timestamp",
        "domain_knowledge": "last_verified",
        "anti_patterns": "last_seen",
        "workflow_outcomes": "timestamp",
        "retrieval_feedback": "timestamp",
        "forget_audit": "deleted_at",
    }

    def _time_sorted(self, table: str, df: DataFrame) -> DataFrame:
        # size the write BEFORE the within-partition sort so the sort
        # runs once over the final (possibly merged) partitions
        df = size_write_partitions(df)
        ts = self.TIME_SORT_COLS.get(table)
        if ts is None or ts not in df.columns:
            return df
        if table in schemas.PARTITIONED_BY_PROJECT_AGENT:
            # leading partition cols keep the writer's required
            # clustering satisfied, so FileFormatWriter adds no second
            # sort on top of this one
            return df.sortWithinPartitions("project_id", "agent", ts)
        return df.sortWithinPartitions(ts)

    def append(self, table: str, df: DataFrame) -> None:
        with self._table_lock(table):
            self._recover(table)
            with self._bumping(table):
                writer = self._time_sorted(table, df).write.mode("append")
                if table in schemas.PARTITIONED_BY_PROJECT_AGENT:
                    writer = writer.partitionBy("project_id", "agent")
                writer.parquet(self._path(table))

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Crash-safe overwrite of a path the plan may be reading from.

        Write the full result to `<path>.staging` (the source files are
        untouched, so the plan's lineage stays valid — no cache/count
        materialization needed), then swap directories with two renames.
        A crash leaves either the old table live (staging discarded on
        the next overwrite) or a `.old` dir that _recover() renames
        back; at no point is the table's data lost. On a cluster this
        whole method is replaced by a transactional table format
        (Delta/Iceberg MERGE/replace) — this is the zero-dep local
        equivalent of the reference's SQLite transaction
        (sqlite_local.py:644-813)."""
        with self._table_lock(table):
            self._recover_locked(table)
            with self._bumping(table):
                path = self._path(table)
                staging, old = path + ".staging", path + ".old"
                trash = path + ".trash"
                shutil.rmtree(staging, ignore_errors=True)
                shutil.rmtree(trash, ignore_errors=True)  # prior crash leftover
                writer = self._time_sorted(table, df).write.mode("overwrite")
                if table in schemas.PARTITIONED_BY_PROJECT_AGENT:
                    writer = writer.partitionBy("project_id", "agent")
                writer.parquet(staging)
                shutil.rmtree(old, ignore_errors=True)
                if os.path.isdir(path):
                    os.rename(path, old)
                os.rename(staging, path)
                # renaming .old to .trash BEFORE the (potentially long)
                # rmtree shrinks the dirty-visible window to one rename —
                # concurrent readers otherwise block on the table lock
                # for the whole delete of the old copy
                if os.path.isdir(old):
                    os.rename(old, trash)
                shutil.rmtree(trash, ignore_errors=True)

    # ---- partition-scoped rewrites (the plain-Parquet MERGE) ----------
    #
    # The reference's INSERT OR REPLACE touches one row; a full-table
    # rewrite per upsert would be the 100 TB scale-killer. For tables
    # partitioned by (project_id, agent) we instead:
    #   1. collect the distinct partition pairs in the incoming rows
    #      (bounded by #projects x #agents — a handful, never data-sized),
    #   2. partition-prune the existing read down to just those pairs,
    #   3. merge (window-dedup keep-latest), write ONLY those partitions
    #      to a staging dir, and swap the partition directories in.
    # Untouched partitions' files are never read or rewritten. Delta's
    # MERGE INTO does the same file-level pruning transactionally; this
    # is the zero-dep equivalent with per-partition crash recovery.

    def _pairs_of(self, df: DataFrame) -> list[tuple]:
        return [
            (r["project_id"], r["agent"])
            for r in df.select("project_id", "agent").distinct().collect()
        ]

    @staticmethod
    def _pairs_predicate(pairs: list[tuple]):
        return functools.reduce(
            operator.or_,
            [
                F.col("project_id").eqNullSafe(F.lit(p)) & F.col("agent").eqNullSafe(F.lit(a))
                for p, a in pairs
            ],
        )

    def _read_for_pairs(self, table: str, pairs: list[tuple]) -> DataFrame:
        """Read restricted to the given (project_id, agent) pairs — the
        hook the partition-scoped RMW paths (upsert/delete/archive) go
        through. Here: full read + pair predicate (which reaches
        PartitionFilters); TxLogStore overrides with its log-resolved
        per-pair file groups so the plan never mentions other pairs."""
        return self._filter_pairs(self.read(table), pairs)

    def _filter_pairs(self, df: DataFrame, pairs: list[tuple]) -> DataFrame:
        """Restrict df to the given (project_id, agent) pairs. Small
        sets use the OR-chain predicate (it reaches PartitionFilters
        and prunes directories); large sets — the high-cardinality
        compaction path — use a broadcast semi-join on null-coalesced
        surrogates instead, because a 1000-term OR expression tree is
        an analysis-time cost of its own."""
        if len(pairs) <= 32:
            return df.filter(self._pairs_predicate(pairs))
        from alma_memory_spark.session import tiny_df

        null_tag = "\x00null"
        pairs_df = tiny_df(
            self.spark,
            [
                (p if p is not None else null_tag, a if a is not None else null_tag)
                for p, a in pairs
            ],
            "_pj string, _ag string",
        )
        return (
            df.withColumn("_pj", F.coalesce(F.col("project_id"), F.lit(null_tag)))
            .withColumn("_ag", F.coalesce(F.col("agent"), F.lit(null_tag)))
            .join(F.broadcast(pairs_df), ["_pj", "_ag"], "left_semi")
            .drop("_pj", "_ag")
        )

    def _swap_partitions(self, table: str, staging: str, touched: list[tuple]) -> None:
        """Move staged partition dirs into the live table; a touched pair
        with no staged output (all its rows deleted) has its live dir
        removed.

        Two-phase commit under the table lock, bracketed by a
        `<table>.txn` PLAN marker whose removal (an atomic unlink,
        right after phase B) is the single commit point:

        - the marker records the planned destinations, the `.old`
          asides of swapped partitions, and the `.dropped` asides of
          emptied partitions;
        - phase A renames every affected live dir aside, phase B
          renames the staged dirs in, the marker is removed (COMMIT),
          then asides and staging are cleaned up;
        - crash BEFORE marker removal: _recover() rolls the whole
          logical write back from the plan — planned destinations are
          removed even when brand-new (no aside existed), every aside
          is restored. All-or-nothing.
        - crash AFTER marker removal: leftovers are unambiguous —
          `.old` asides with live dirs and `.dropped` asides are
          post-commit debris to delete.

        The audited forget sink is written before the swap, so a
        rolled-back delete re-runs against rows the audit already
        recorded (append-only; a re-run re-audits)."""
        path = self._path(table)
        staged: list[tuple[str, str]] = []  # (src, dst)
        asides: list[tuple[str, str]] = []  # (live, aside) — swapped
        dropped: list[tuple[str, str]] = []  # (live, aside) — emptied
        for proj_dir in os.listdir(staging):
            spd = os.path.join(staging, proj_dir)
            if not (proj_dir.startswith("project_id=") and os.path.isdir(spd)):
                continue
            for agent_dir in os.listdir(spd):
                src = os.path.join(spd, agent_dir)
                if not (agent_dir.startswith("agent=") and os.path.isdir(src)):
                    continue
                dst_parent = os.path.join(path, proj_dir)
                os.makedirs(dst_parent, exist_ok=True)
                dst = os.path.join(dst_parent, agent_dir)
                staged.append((src, dst))
                if os.path.isdir(dst):
                    asides.append(
                        (dst, os.path.join(dst_parent, "." + agent_dir + ".old"))
                    )
        staged_pairs = {
            (
                _decode_part(os.path.basename(os.path.dirname(dst))),
                _decode_part(os.path.basename(dst)),
            )
            for _, dst in staged
        }
        # touched pairs with zero staged rows: their live dirs go aside too
        for proj_dir in os.listdir(path) if os.path.isdir(path) else []:
            pd = os.path.join(path, proj_dir)
            if not (proj_dir.startswith("project_id=") and os.path.isdir(pd)):
                continue
            for agent_dir in os.listdir(pd):
                apd = os.path.join(pd, agent_dir)
                if not (agent_dir.startswith("agent=") and os.path.isdir(apd)):
                    continue
                pair = (_decode_part(proj_dir), _decode_part(agent_dir))
                if pair in touched and pair not in staged_pairs:
                    dropped.append(
                        (apd, os.path.join(pd, "." + agent_dir + ".dropped"))
                    )
        import json

        txn = path + ".txn"
        plan = {
            "dsts": [os.path.relpath(dst, path) for _, dst in staged],
            "asides": [os.path.relpath(a, path) for _, a in asides],
            "dropped": [os.path.relpath(a, path) for _, a in dropped],
        }
        with open(txn, "w") as f:
            json.dump(plan, f)
            f.flush()
            os.fsync(f.fileno())
        # phase A: all rename-asides
        for live, aside in asides + dropped:
            shutil.rmtree(aside, ignore_errors=True)
            os.rename(live, aside)
        # phase B: all rename-ins
        for src, dst in staged:
            os.rename(src, dst)
        os.remove(txn)  # COMMIT POINT (atomic unlink)
        # post-commit cleanup; a crash here leaves unambiguous debris
        # that the no-marker recovery path deletes
        for _, aside in asides + dropped:
            shutil.rmtree(aside, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

    def _rewrite_partitions(self, table: str, touched: list[tuple], content: DataFrame) -> None:
        """Write `content` (the full new contents of the touched
        partitions) to staging and swap those partition dirs in."""
        with self._table_lock(table):
            # a previous writer may have died mid-swap AFTER this
            # writer's pre-lock reads; repair its torn state BEFORE
            # writing a new txn plan — open(txn, 'w') would otherwise
            # truncate the dead writer's plan and orphan its asides
            # (which the debris path would then delete: data loss)
            self._recover_locked(table)
            with self._bumping(table):
                path = self._path(table)
                staging = path + ".staging"
                shutil.rmtree(staging, ignore_errors=True)
                self._time_sorted(table, content).write.mode(
                    "overwrite"
                ).partitionBy("project_id", "agent").parquet(staging)
                self._swap_partitions(table, staging, touched)

    def upsert(
        self,
        table: str,
        new_rows: DataFrame,
        key: str = "id",
        verify_scope: bool = False,
        on_conflict: str = "retry",
    ) -> None:
        """INSERT OR REPLACE by key: keep the newest version of each key.

        Implemented as union + row_number window keep-first. On Delta this
        would be MERGE INTO; on plain Parquet the rewrite is the portable
        equivalent. `_v` disambiguates within-batch duplicates too.
        Partitioned tables only read + rewrite the partitions present in
        `new_rows` (see the partition-scoped block above). Contract: a
        key never changes partition (a memory's project/agent identity
        is fixed at save time in the reference — save_* writes carry the
        row's own scope, sqlite_local.py:644-813), so the old version is
        always found inside the touched partitions. Pass
        verify_scope=True in debug runs to assert that contract (full
        anti-scan — not for the hot path).

        `on_conflict` matters only on the commit-log backend: 'retry'
        (default) re-merges this same batch against a fresh snapshot —
        correct for whole-row upserts; 'raise' surfaces CommitConflict
        for read-modify-write transactions whose NEW ROW must be
        recomputed from fresh state (work-item transitions appending to
        a list column). Ignored here: the swap store's flock serializes
        same-host writers and does not support cross-host writers.
        """
        # the LOCK must cover the read: spark.read.parquet snapshots the
        # file listing eagerly, so a plan built before lock acquisition
        # can merge against a listing another (lock-holding) writer has
        # since replaced — committing that plan drops the other writer's
        # rows (lost update) or hits deleted files. The per-table lock
        # is thread-reentrant, so the nested _rewrite_partitions /
        # overwrite acquisition is free.
        with self._table_lock(table):
            self._upsert_locked(table, new_rows, key, verify_scope)

    def _upsert_locked(
        self, table: str, new_rows: DataFrame, key: str, verify_scope: bool
    ) -> None:
        if not self.exists(table):
            self.append(table, new_rows)
            return
        scoped = table in schemas.PARTITIONED_BY_PROJECT_AGENT
        touched = self._pairs_of(new_rows) if scoped else []
        if scoped:
            if not touched:
                return
            if verify_scope:
                # debug guard for the 'a key never changes partition'
                # contract: an incoming id already stored under an
                # UNTOUCHED (project_id, agent) would silently survive
                # as a duplicate. Full-scan semi-join — debug runs only.
                strays = (
                    self.read(table)
                    .filter(~self._pairs_predicate(touched))
                    .join(new_rows.select(key).distinct(), key, "left_semi")
                    .limit(5)
                    .collect()
                )
                if strays:
                    ids = [r[key] for r in strays]
                    raise ValueError(
                        f"upsert({table}): incoming keys exist under other "
                        f"partitions (key changed scope?): {ids}"
                    )
            existing = self._read_for_pairs(table, touched)
        else:
            existing = self.read(table)
        existing = existing.withColumn("_v", F.lit(0))
        incoming = new_rows.withColumn("_v", F.lit(1))
        merged = existing.unionByName(incoming)
        w = W.partitionBy(key).orderBy(F.desc("_v"))
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )
        if scoped:
            self._rewrite_partitions(table, touched, deduped)
        else:
            self.overwrite(table, deduped)

    def delete(
        self,
        table: str,
        predicate,
        reason: str = "manual",
        audit: bool = True,
        memory_type: str | None = None,
    ) -> int:
        """Delete rows matching `predicate`; write forget-audit first
        (append-only, BEFORE the delete — reference ordering,
        alma/learning/forgetting.py:306-330). Locked across the
        read-plan-write (see upsert: a pre-lock listing races a
        concurrent same-partition writer)."""
        with self._table_lock(table):
            return self._delete_locked(table, predicate, reason, audit, memory_type)

    def _delete_locked(
        self, table, predicate, reason, audit, memory_type
    ) -> int:
        df = self.read(table)
        # `predicate` is a Column, or a callable(df) -> doomed-rows
        # frame derived from THIS locked read — the zero-collect path
        # for mass forgets (a policy selecting millions of ids must not
        # round-trip them through the driver; the callable runs against
        # the fresh snapshot, so it can never reference replaced files)
        doomed = predicate(df) if callable(predicate) else df.filter(predicate)
        n = doomed.count()
        if n == 0:
            return 0
        if audit:
            now = datetime.now(timezone.utc)
            cols = set(doomed.columns)
            audit_df = doomed.select(
                F.concat(F.lit("audit_"), F.md5(F.col("id"))).alias("id"),
                F.col("id").alias("memory_id"),
                F.lit(memory_type or table).alias("memory_type"),
                (F.col("agent") if "agent" in cols else F.lit(None).cast("string")).alias("agent"),
                (
                    F.col("project_id") if "project_id" in cols else F.lit(None).cast("string")
                ).alias("project_id"),
                F.lit(reason).alias("reason"),
                F.lit(now).alias("deleted_at"),
            )
            self.append("forget_audit", audit_df)
        if table in schemas.PARTITIONED_BY_PROJECT_AGENT:
            touched = self._pairs_of(doomed)
            kept = self._read_for_pairs(table, touched).join(
                doomed.select("id"), "id", "left_anti"
            )
            self._rewrite_partitions(table, touched, kept)
        else:
            kept = df.join(doomed.select("id"), "id", "left_anti")
            self.overwrite(table, kept)
        return n

    def archive(self, table: str, predicate, reason: str = "decay") -> int:
        """Soft-delete: move matching rows into archived_memories with the
        full row JSON + embedding preserved, restorable later. Locked
        across the read-plan-write like upsert/delete."""
        with self._table_lock(table):
            return self._archive_locked(table, predicate, reason)

    def _archive_locked(self, table, predicate, reason) -> int:
        df = self.read(table)
        doomed = df.filter(predicate)
        n = doomed.count()
        if n == 0:
            return 0
        now = datetime.now(timezone.utc)
        cols = set(doomed.columns)
        payload = F.to_json(F.struct(*[c for c in doomed.columns if c != "embedding"]))
        arch = doomed.select(
            F.col("id"),
            F.lit(table).alias("memory_type"),
            (F.col("agent") if "agent" in cols else F.lit(None).cast("string")).alias("agent"),
            (F.col("project_id") if "project_id" in cols else F.lit(None).cast("string")).alias(
                "project_id"
            ),
            payload.alias("content"),
            (
                F.col("embedding")
                if "embedding" in cols
                else F.lit(None).cast(schemas.EMBEDDING)
            ).alias("embedding"),
            F.lit(reason).alias("archive_reason"),
            F.lit(None).cast("double").alias("final_strength"),
            F.lit(now).alias("archived_at"),
        )
        self.append("archived_memories", arch)
        if table in schemas.PARTITIONED_BY_PROJECT_AGENT:
            touched = self._pairs_of(doomed)
            kept = self._read_for_pairs(table, touched).join(
                doomed.select("id"), "id", "left_anti"
            )
            self._rewrite_partitions(table, touched, kept)
        else:
            kept = df.join(doomed.select("id"), "id", "left_anti")
            self.overwrite(table, kept)
        return n

    def restore_from_archive(self, memory_ids: list[str]) -> DataFrame:
        """Return archived rows for the ids (caller re-parses `content`
        into the live schema with from_json) and drop them from archive."""
        arch = self.read("archived_memories")
        # materialize to the driver BEFORE rewriting the files the plan
        # reads from (a .cache() is not durable across the overwrite)
        rows = arch.filter(F.col("id").isin(memory_ids)).collect()
        from alma_memory_spark.session import tiny_df

        hit = tiny_df(self.spark, rows, schemas.ARCHIVED_MEMORIES)
        remaining = arch.filter(~F.col("id").isin(memory_ids))
        self.overwrite("archived_memories", remaining)
        return hit

    def purge_archives(self, older_than: datetime) -> int:
        arch = self.read("archived_memories")
        doomed = arch.filter(F.col("archived_at") < F.lit(older_than))
        n = doomed.count()
        if n:
            self.overwrite(
                "archived_memories",
                arch.filter(~(F.col("archived_at") < F.lit(older_than))),
            )
        return n

    def migrate(self, table: str) -> list[str]:
        """Idempotent schema migration: add any columns the current
        schema defines that the stored files lack (NULL-filled), e.g.
        the verification columns added in the reference's v1.2.0
        migration (sqlite_local.py:1726-1818). Returns added columns."""
        if not self.exists(table):
            return []
        target = schemas.ALL_TABLES[table]
        df = self.spark.read.parquet(self._path(table))
        have = set(df.columns)
        added = []
        for field in target.fields:
            if field.name not in have:
                df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
                added.append(field.name)
        if added:
            df = df.select([f.name for f in target.fields])
            self.overwrite(table, df)
        return added

    # ---- compaction (the small-file answer for incremental learn) ----
    #
    # Every incremental learn()/upsert appends or rewrites a handful of
    # rows, and each Spark write commits at least one file per task —
    # at 100 TB with thousands of learn() calls a partition degrades
    # into thousands of KB-sized files, and scan cost becomes file-open
    # cost (footer reads, task scheduling) instead of byte cost. Delta
    # calls the fix OPTIMIZE; this is the zero-dep equivalent on the
    # same crash-safe swap protocol as upsert/delete.

    # preferred sort order inside compacted files: serving-path
    # predicates filter on type-ish and recency-ish columns, so sorting
    # by them gives parquet min/max row-group pruning on exactly those
    # scans. Per-table first-match from this list.
    _COMPACT_SORT_PREFERENCE = (
        "memory_type",
        "type",
        "category",
        "created_at",
        "timestamp",
        "last_validated",
        "id",
    )

    def _partition_file_stats(self, table: str) -> dict[tuple, tuple[int, int]]:
        """(project, agent) -> (n_files, total_bytes), from a driver-side
        walk of the hive layout (bounded by #projects x #agents, never
        data-sized)."""
        path = self._path(table)
        out: dict[tuple, tuple[int, int]] = {}
        if not os.path.isdir(path):
            return out
        for proj_dir in os.listdir(path):
            pd = os.path.join(path, proj_dir)
            if not (proj_dir.startswith("project_id=") and os.path.isdir(pd)):
                continue
            for agent_dir in os.listdir(pd):
                apd = os.path.join(pd, agent_dir)
                if not (agent_dir.startswith("agent=") and os.path.isdir(apd)):
                    continue
                files = [
                    os.path.join(apd, f)
                    for f in os.listdir(apd)
                    if f.endswith(".parquet")
                ]
                pair = (_decode_part(proj_dir), _decode_part(agent_dir))
                out[pair] = (len(files), sum(os.path.getsize(f) for f in files))
        return out

    def _flat_file_stats(self, table: str) -> tuple[int, int]:
        path = self._path(table)
        n = b = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
        sort_columns: list[str] | None = None,
    ) -> dict:
        """Coalesce small files; returns a per-partition report.

        A partition is compacted when its file count exceeds
        max(min_files, ceil(bytes / target_file_bytes)) — i.e. it has
        more files than its data volume justifies. Only those
        partitions are read and rewritten (same partition pruning as
        upsert); each is re-bucketed to ~ceil(bytes/target) output
        files via a per-pair bucket column, and rows are sorted within
        files by the serving predicates' columns so parquet min/max
        pruning works on the compacted files. The rewrite goes through
        `_rewrite_partitions`, so it is locked, crash-recoverable and
        all-or-nothing like every other store write. The LOCK covers
        the stats walk + read too (see upsert: a pre-lock listing races
        a concurrent same-partition writer)."""
        with self._table_lock(table):
            return self._compact_locked(table, target_file_bytes, min_files, sort_columns)

    def _compact_locked(
        self, table, target_file_bytes, min_files, sort_columns
    ) -> dict:
        if not self.exists(table):
            return {}
        report: dict = {}
        if table not in schemas.PARTITIONED_BY_PROJECT_AGENT:
            n, b = self._flat_file_stats(table)
            want = max(1, -(-b // target_file_bytes))
            if n <= max(min_files, want):
                return {}
            df = self.read(table)
            df = df.repartition(int(want))
            sort_cols = sort_columns or [
                c for c in self._COMPACT_SORT_PREFERENCE if c in df.columns
            ]
            if sort_cols:
                df = df.sortWithinPartitions(*sort_cols)
            self.overwrite(table, df)
            after, _ = self._flat_file_stats(table)
            return {"<table>": {"files_before": n, "files_after": after, "bytes": b}}

        stats = self._partition_file_stats(table)
        plan: list[tuple[tuple, int]] = []  # (pair, target_file_count)
        for pair, (n, b) in stats.items():
            want = max(1, -(-b // target_file_bytes))
            if n > max(min_files, want):
                plan.append((pair, int(want)))
        if not plan:
            return {}
        touched = [pair for pair, _ in plan]
        if len(plan) == len(stats):
            content = self.read(table)  # every pair compacts: no filter
        else:
            content = self._read_for_pairs(table, touched)
        # partition discovery infers VOID for a partition column whose
        # every directory is the hive NULL marker; writing that back
        # with partitionBy fails — pin the declared string type
        content = content.withColumn(
            "project_id", F.col("project_id").cast("string")
        ).withColumn("agent", F.col("agent").cast("string"))
        # per-pair bucket count via a broadcast of the (tiny) plan; the
        # repartition on (project_id, agent, _bucket) gives each bucket
        # its own task, so each partition dir lands ~_k output files.
        # Join on null-coalesced surrogates: a plain equi-join would
        # silently DROP rows of a NULL-keyed partition (hive
        # __HIVE_DEFAULT_PARTITION__), losing that partition on rewrite.
        from alma_memory_spark.session import tiny_df

        null_tag = "\x00null"
        pairs_df = tiny_df(
            self.spark,
            [(p if p is not None else null_tag, a if a is not None else null_tag, k)
             for (p, a), k in plan],
            "_pj string, _ag string, _k int",
        )
        total_k = max(1, sum(k for _, k in plan))
        content = (
            content.withColumn("_pj", F.coalesce(F.col("project_id"), F.lit(null_tag)))
            .withColumn("_ag", F.coalesce(F.col("agent"), F.lit(null_tag)))
            .join(F.broadcast(pairs_df), ["_pj", "_ag"])
            .withColumn("_bucket", F.pmod(F.xxhash64("id"), F.col("_k")))
            .repartition(total_k, "project_id", "agent", "_bucket")
            .drop("_pj", "_ag", "_k", "_bucket")
        )
        sort_cols = sort_columns or [
            c for c in self._COMPACT_SORT_PREFERENCE if c in content.columns
        ]
        if sort_cols:
            content = content.sortWithinPartitions(*sort_cols)
        self._rewrite_partitions(table, touched, content)
        after = self._partition_file_stats(table)
        for pair, k in plan:
            n, b = stats[pair]
            report[f"{pair[0]}/{pair[1]}"] = {
                "files_before": n,
                "files_after": after.get(pair, (0, 0))[0],
                "bytes": b,
            }
        return report

    #: above this many (project_id, agent) pairs the hive directory
    #: layout itself becomes the cost (listing-bound planning, 1+ file
    #: per pair no matter how small) — the maintenance scheduler
    #: auto-compacts past it, and SCALE.md documents the bucketed-
    #: layout fallback for deployments that legitimately exceed it
    PAIR_CARDINALITY_THRESHOLD = 1000

    def partition_health(self, table: str) -> dict:
        """Partition-layout report for the cardinality guard: pair
        count, file counts, and whether the table is past the
        documented threshold. Driver-side, bounded by #pairs."""
        stats = self._partition_file_stats(table)
        n_files = sum(n for n, _b in stats.values())
        n_bytes = sum(b for _n, b in stats.values())
        return {
            "n_pairs": len(stats),
            "n_files": n_files,
            "n_bytes": n_bytes,
            "files_per_pair": (n_files / len(stats)) if stats else 0.0,
            "over_threshold": len(stats) > self.PAIR_CARDINALITY_THRESHOLD,
        }

    # Spark's default JSON timestampFormat keeps only milliseconds;
    # full-microsecond format so export -> import is lossless (the gate
    # query json_store_roundtrip hash-checks this against the source)
    _JSON_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        bucket_col: str = "id",
        buckets: int = 16,
        sort: bool = True,
    ) -> str:
        """Bucketed copy of a table for co-located joins.

        At 100 TB the ANN-candidate semi-join, feedback blend, and
        upsert all join on `id`; two tables bucketed on the same key
        with the same bucket count join WITHOUT a shuffle (Spark reads
        bucket i of both sides on the same task). This is the batch
        equivalent of pre-partitioning, paid once at write time.
        Returns the catalog table name (bucketing metadata lives in the
        session catalog, not the parquet files, so readers go through
        spark.table())."""
        # catalog names are session-global: include a digest of the full
        # root path so two stores whose roots share a basename (e.g.
        # both '.../store') cannot collide and clobber each other's
        # bucketed table via mode('overwrite')
        digest = hashlib.sha1(os.path.abspath(self.root).encode()).hexdigest()[:8]
        name = (
            f"alma_bucketed_{os.path.basename(self.root)}_{digest}_{table}"
        ).replace("-", "_")
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, bucket_col)
            .option("path", self._path(table) + ".bucketed")
        )
        if sort:
            writer = writer.sortBy(bucket_col)
        writer.saveAsTable(name)
        return name

    def export_json(self, table: str, path: str) -> None:
        """JSON export (the reference's zero-dep file-based store format,
        alma/storage/file_based.py). Embeddings/maps serialize natively."""
        self.read(table).write.mode("overwrite").option(
            "timestampFormat", self._JSON_TS_FMT
        ).json(path)

    def import_json(self, table: str, path: str) -> None:
        """Import a JSON export, coercing to the table schema."""
        df = (
            self.spark.read.schema(schemas.ALL_TABLES[table])
            .option("timestampFormat", self._JSON_TS_FMT)
            .json(path)
        )
        self.append(table, df)

    def stats(self, project_id: str | None = None) -> dict[str, int]:
        """Per-type row counts (reference: sqlite_local.py:1486-1527).
        ONE Spark job: per-table count branches unioned, single collect
        — not a count() round-trip per table."""
        branches = []
        for t in schemas.MEMORY_TABLES:
            df = self.read(t)
            if project_id is not None and "project_id" in df.columns:
                df = df.filter(F.col("project_id") == project_id)
            branches.append(
                df.agg(F.count(F.lit(1)).alias("n")).select(
                    F.lit(t).alias("t"), "n"
                )
            )
        unioned = branches[0]
        for b in branches[1:]:
            unioned = unioned.unionByName(b)
        out: dict[str, int] = {r["t"]: r["n"] for r in unioned.collect()}
        out["total"] = sum(out.values())
        return out
