"""Scheduled memory maintenance: the reference's CleanupScheduler
(alma/learning/forgetting.py:1239-1477 — registered jobs with an
interval, each run = prune + decay + health check, bounded history)
re-expressed for Spark's batch model.

Design notes vs the reference:
- Job execution is a plain batch run (the Trigger.AvailableNow shape):
  an external scheduler (cron/Airflow/stream trigger) calls
  `run_all_due()`; the reference's `start_background` thread is a
  serving-layer concern like the MCP transport and is intentionally
  out of scope here.
- `apply_decay` is a no-op BY DESIGN: this engine computes strength
  decay at read time from timestamps (decay-at-read,
  functions/temporal.py; reference design alma/learning/decay.py:74-122)
  so there is no stored confidence to rewrite — the flag is kept for
  config parity and reported as `decay_at_read=True`.
- The prune policies delegate to AlmaSpark.forget(), which routes
  through the audited, partition-scoped delete path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from alma_memory_spark.operators.lifecycle import FORGET_TS_COLS

#: prunable tables = exactly the ones the forget path knows a
#: timestamp column for (single source: lifecycle.FORGET_TS_COLS)
MEMORY_TABLES = list(FORGET_TS_COLS)
MAX_HISTORY = 50
WEAK_ALERT_RATIO = 0.5
STALE_ALERT_RATIO = 0.5


@dataclass
class MaintenanceJob:
    """Reference parity: CleanupJob (forgetting.py:1210-1221)."""

    name: str
    project_id: str
    interval_hours: float
    agent: str | None = None
    tables: list[str] | None = None  # default: all memory tables
    max_age_days: float | None = None
    min_confidence: float | None = None
    quota: int | None = None
    apply_decay: bool = True  # decay-at-read: reported, never a rewrite
    compact: bool = False  # run store.compact() after pruning (OPTIMIZE)
    compact_target_bytes: int = 128 << 20
    # rebuild persisted keyword indexes after pruning — the reference's
    # staleness contract ("the text index must be rebuilt when the
    # corpus changes", alma/retrieval/hybrid.py:53) made operational:
    # the maintenance cycle is where rebuilds belong at scale
    reindex_text: bool = False
    # rebuild persisted IVF vector indexes after pruning: deletes
    # tombstone the index (engine.forget), and the rebuild both folds
    # the tombstones away and re-lists vectors added since the last
    # build — the reference's dirty-flag lazy FAISS rebuild
    # (sqlite_local.py:510-521) run at its natural maintenance seat
    reindex_ivf: bool = False
    # partition-cardinality guard: when a table's (project_id, agent)
    # pair count exceeds this, compaction runs EVEN IF job.compact is
    # False — at 10k+ tenant pairs the small-file layout degrades
    # planning to listing cost, and folding each pair to ~1 file is
    # the first (and usually sufficient) defense; SCALE.md documents
    # the bucketed-layout fallback beyond it. None disables the guard.
    compact_when_pairs_over: int | None = None
    # txlog backend only: physically reclaim data files no snapshot can
    # reference, keeping at least this retention window for in-flight
    # readers (Delta VACUUM semantics). None disables; ignored on the
    # swap-store backend (it deletes eagerly under its table lock).
    vacuum_retain_seconds: float | None = None
    # opt-in acknowledgement for sub-floor retention (single-writer
    # deployments/tests only); without it TxLogStore.vacuum raises on a
    # retention shorter than its safety floor — see
    # MIN_VACUUM_RETAIN_SECONDS for the racing-commit rationale
    vacuum_force: bool = False
    enabled: bool = True
    last_run: datetime | None = None
    next_run: datetime | None = None


@dataclass
class MaintenanceResult:
    """Reference parity: CleanupResult (forgetting.py:1224-1235)."""

    job_name: str
    project_id: str
    started_at: datetime
    completed_at: datetime
    deleted: dict[str, int] = field(default_factory=dict)
    compacted: dict[str, dict] = field(default_factory=dict)
    reindexed: dict[str, int] = field(default_factory=dict)
    vacuumed: dict[str, int] = field(default_factory=dict)
    decay_at_read: bool = True
    alerts: list[str] = field(default_factory=list)
    success: bool = True
    error: str | None = None


class MaintenanceScheduler:
    """Register prune/health jobs and run the due ones as batch jobs.

    The clock is injectable (like AlmaSpark's) so due-ness is testable;
    `run_job(name)` forces one job, `run_all_due()` is the entry an
    external scheduler calls on its own cadence."""

    def __init__(self, engine, clock=None):
        self.engine = engine
        self._clock = clock
        self._jobs: dict[str, MaintenanceJob] = {}
        self.history: list[MaintenanceResult] = []

    def _now(self) -> datetime:
        return self._clock() if self._clock else datetime.now(timezone.utc)

    def register_job(self, job: MaintenanceJob) -> None:
        job.next_run = self._now() + timedelta(hours=job.interval_hours)
        self._jobs[job.name] = job

    def unregister_job(self, name: str) -> bool:
        return self._jobs.pop(name, None) is not None

    def run_job(self, name: str, dry_run: bool = False) -> MaintenanceResult:
        if name not in self._jobs:
            raise ValueError(f"job '{name}' not found")
        return self._execute(self._jobs[name], dry_run)

    def run_all_due(self) -> list[MaintenanceResult]:
        now = self._now()
        due = [
            j
            for j in self._jobs.values()
            if j.enabled and j.next_run is not None and j.next_run <= now
        ]
        return [self._execute(j) for j in due]

    # ------------------------------------------------------------------

    def _execute(self, job: MaintenanceJob, dry_run: bool = False) -> MaintenanceResult:
        started = self._now()
        result = MaintenanceResult(
            job_name=job.name,
            project_id=job.project_id,
            started_at=started,
            completed_at=started,
        )
        try:
            for table in job.tables or MEMORY_TABLES:
                if dry_run:
                    result.deleted[table] = self._count_doomed(job, table)
                    continue
                result.deleted[table] = self.engine.forget(
                    table,
                    job.project_id,
                    max_age_days=job.max_age_days,
                    min_confidence=job.min_confidence,
                    quota=job.quota,
                    reason=f"maintenance:{job.name}",
                )
            if not dry_run:
                for table in job.tables or MEMORY_TABLES:
                    # post-prune OPTIMIZE: deletes just rewrote
                    # partitions into fresh small files; fold them
                    # together while the table lock traffic is already
                    # maintenance-owned. The pair-cardinality guard
                    # forces the compaction (min_files=1 — at high
                    # cardinality every extra file per pair is listing
                    # cost) even on jobs that didn't opt in.
                    forced = (
                        job.compact_when_pairs_over is not None
                        and self.engine.store.exists(table)
                        and self.engine.store.partition_health(table)["n_pairs"]
                        > job.compact_when_pairs_over
                    )
                    if not (job.compact or forced):
                        continue
                    rep = self.engine.store.compact(
                        table,
                        target_file_bytes=job.compact_target_bytes,
                        min_files=1 if forced else 2,
                    )
                    if rep:
                        result.compacted[table] = rep
            if job.reindex_text and not dry_run:
                # prunes just removed rows the postings still reference;
                # rebuild every indexed table the engine knows a text
                # projection for (TEXT_EXPRS, not the prune table list —
                # preferences is indexable but never pruned by default)
                import os as _os

                for table in job.tables or list(self.engine.TEXT_EXPRS):
                    if table not in self.engine.TEXT_EXPRS:
                        continue
                    if not _os.path.isdir(self.engine._text_index_path(table)):
                        continue
                    rep = self.engine.index_text(table)
                    if rep.get("indexed"):
                        result.reindexed[table] = rep["n_docs"]
            if job.reindex_ivf and not dry_run:
                for table in job.tables or MEMORY_TABLES:
                    if not self.engine._has_ivf_index(table):
                        continue
                    rep = self.engine.index_vectors(table)
                    if rep.get("indexed"):
                        result.reindexed[f"ivf:{table}"] = rep["n_vectors"]
            if (
                job.vacuum_retain_seconds is not None
                and not dry_run
                and hasattr(self.engine.store, "vacuum")
            ):
                for table in job.tables or MEMORY_TABLES:
                    n = self.engine.store.vacuum(
                        table,
                        retain_seconds=job.vacuum_retain_seconds,
                        force=job.vacuum_force,
                    )
                    if n:
                        result.vacuumed[table] = n
            result.alerts = self._health_alerts(job.project_id)
            if not dry_run:  # a preview must not consume the schedule
                now = self._now()
                job.last_run = now
                job.next_run = now + timedelta(hours=job.interval_hours)
            result.success = True
        except Exception as e:  # job failures are recorded, never raised
            result.success = False
            result.error = str(e)
        result.completed_at = self._now()
        self.history.append(result)
        if len(self.history) > MAX_HISTORY:
            self.history = self.history[-MAX_HISTORY:]
        return result

    def _count_doomed(self, job: MaintenanceJob, table: str) -> int:
        """Dry-run: size of the delete set without touching data — the
        SAME derivation the real delete uses (engine.select_doomed_ids),
        so the preview can never drift from the delete."""
        doomed = self.engine.select_doomed_ids(
            table,
            job.project_id,
            max_age_days=job.max_age_days,
            min_confidence=job.min_confidence,
            quota=job.quota,
        )
        return 0 if doomed is None else doomed.count()

    def _health_alerts(self, project_id: str) -> list[str]:
        """Reference: health_monitor.check_health during each job
        (forgetting.py:1396) — weak/stale ratio alerts over the
        project's memory tables, via the one-job health aggregation."""
        from alma_memory_spark.operators.lifecycle import health_metrics

        tables = {
            t: self.engine.store.read(t).filter(F.col("project_id") == project_id)
            for t in MEMORY_TABLES
            if self.engine.store.exists(t)
        }
        if not tables:
            return []
        hm = health_metrics(tables, now=self._now())
        out: list[str] = []
        for key, val in sorted(hm.items()):
            if key.endswith("_weak_ratio") and val > WEAK_ALERT_RATIO:
                out.append(f"{key} {val:.2f} above {WEAK_ALERT_RATIO}")
            if key.endswith("_stale_ratio") and val > STALE_ALERT_RATIO:
                out.append(f"{key} {val:.2f} above {STALE_ALERT_RATIO}")
        return out
