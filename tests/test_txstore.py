"""TxLogStore: the commit-log multi-writer store behind the
ParquetStore API (sources/txstore.py; design per the public Delta Lake
protocol). Covers the store contract parameterized over both backends,
snapshot isolation, optimistic-conflict retry WITHOUT any shared lock
(the cross-host simulation), vacuum, and log checkpoint roll-up."""

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from alma_memory_spark import schemas
from alma_memory_spark.sources import make_store

NOW = datetime(2024, 2, 15, tzinfo=timezone.utc)


def _dk_row(i, agent="a1", project="p", fact=None):
    return {
        "id": f"id{i}",
        "agent": agent,
        "project_id": project,
        "domain": "d",
        "fact": fact or f"fact {i}",
        "source": "user_stated",
        "confidence": 0.9,
        "last_verified": NOW,
        "verification_status": None,
        "embedding": None,
        "metadata": None,
    }


def _dk(spark, rows):
    return spark.createDataFrame(rows, schemas.ALL_TABLES["domain_knowledge"])


@pytest.fixture(params=["parquet", "txlog", "txlog-nolock"])
def store(request, spark, tmp_path):
    return make_store(spark, str(tmp_path / "store"), request.param)


def test_store_contract_roundtrips(store, spark):
    """The full write-path contract on every backend: append, upsert
    keep-latest, audited delete, archive/restore, migrate idempotence,
    JSON export/import, stats."""
    store.append("domain_knowledge", _dk(spark, [_dk_row(i) for i in range(6)]))
    assert store.exists("domain_knowledge")
    assert store.read("domain_knowledge").count() == 6

    # upsert replaces by id, only in the touched partition
    store.upsert(
        "domain_knowledge", _dk(spark, [_dk_row(1, fact="updated"), _dk_row(99)])
    )
    df = store.read("domain_knowledge")
    assert df.count() == 7
    assert df.filter("id = 'id1'").collect()[0]["fact"] == "updated"

    # audited delete
    n = store.delete(
        "domain_knowledge", F.col("id").isin("id2", "id3"), reason="expired"
    )
    assert n == 2
    assert store.read("domain_knowledge").count() == 5
    audit = store.read("forget_audit")
    assert {r["memory_id"] for r in audit.collect()} == {"id2", "id3"}
    assert {r["reason"] for r in audit.collect()} == {"expired"}

    # archive + restore
    n = store.archive("domain_knowledge", F.col("id") == "id4", reason="decay")
    assert n == 1 and store.read("domain_knowledge").count() == 4
    hit = store.restore_from_archive(["id4"])
    assert hit.count() == 1
    assert store.read("archived_memories").count() == 0

    # migrate is a no-op on a current-schema table, twice
    assert store.migrate("domain_knowledge") == []
    assert store.migrate("domain_knowledge") == []

    # stats sees the live rows
    assert store.stats()["domain_knowledge"] == 4


def test_store_contract_json_roundtrip(store, spark, tmp_path):
    store.append("domain_knowledge", _dk(spark, [_dk_row(i) for i in range(4)]))
    store.export_json("domain_knowledge", str(tmp_path / "export"))
    dst = make_store(
        store.spark, str(tmp_path / "dst"),
        "txlog" if type(store).__name__ == "TxLogStore" else "parquet",
    )
    dst.import_json("domain_knowledge", str(tmp_path / "export"))
    a = sorted(r["id"] for r in store.read("domain_knowledge").collect())
    b = sorted(r["id"] for r in dst.read("domain_knowledge").collect())
    assert a == b


def test_txlog_snapshot_isolation(spark, tmp_path):
    """A plan built before an overwrite still reads the OLD files: the
    log never mutates committed data files, so in-flight readers keep a
    consistent snapshot (the swap store solves this with staging +
    rename; the log solves it by construction)."""
    store = make_store(spark, str(tmp_path / "s"), "txlog")
    store.append("domain_knowledge", _dk(spark, [_dk_row(i) for i in range(5)]))
    old_plan = store.read("domain_knowledge")
    # full rewrite with different content
    store.overwrite(
        "domain_knowledge", _dk(spark, [_dk_row(i + 100) for i in range(3)])
    )
    # the old plan still resolves (files not vacuumed) with old rows
    assert {r["id"] for r in old_plan.collect()} == {f"id{i}" for i in range(5)}
    assert {r["id"] for r in store.read("domain_knowledge").collect()} == {
        "id100", "id101", "id102"
    }
    # vacuum with retention keeps them; retention 0 reclaims
    assert store.vacuum("domain_knowledge") == 0
    # sub-floor retention without force raises: a racing writer's
    # not-yet-committed files look unreferenced (ADVICE r4: an exposed
    # retain_seconds~0 could delete a concurrent commit's data)
    with pytest.raises(ValueError, match="safety floor"):
        store.vacuum("domain_knowledge", retain_seconds=0)
    reclaimed = store.vacuum("domain_knowledge", retain_seconds=0, force=True)
    assert reclaimed > 0
    assert store.read("domain_knowledge").count() == 3


def test_txlog_concurrent_appends_no_lock(spark, tmp_path):
    """Appends from independent handles with NO shared lock (the
    different-hosts simulation): version claims race, nobody loses."""
    from concurrent.futures import ThreadPoolExecutor

    def writer(base):
        st = make_store(spark, str(tmp_path / "s"), "txlog-nolock")
        for i in range(4):
            st.append("domain_knowledge", _dk(spark, [_dk_row(base + i)]))

    with ThreadPoolExecutor(max_workers=3) as pool:
        fs = [pool.submit(writer, b) for b in (100, 200, 300)]
        [f.result() for f in fs]
    st = make_store(spark, str(tmp_path / "s"), "txlog")
    ids = {r["id"] for r in st.read("domain_knowledge").select("id").collect()}
    assert ids == {f"id{b + i}" for b in (100, 200, 300) for i in range(4)}
    # 12 non-voided commits, strictly versioned 0..11
    hist = st.history("domain_knowledge")
    assert [h["version"] for h in hist] == list(range(12))


def test_txlog_concurrent_same_partition_upserts_no_lock(spark, tmp_path):
    """The cross-host lost-update case the flock store CANNOT solve:
    two lock-free handles upserting different ids into the SAME
    partition, several rounds. Optimistic conflict retry must keep
    every id (the losing writer re-reads and re-merges)."""
    from concurrent.futures import ThreadPoolExecutor

    seed = make_store(spark, str(tmp_path / "s"), "txlog")
    seed.append("domain_knowledge", _dk(spark, [_dk_row(0)]))

    def writer(base):
        st = make_store(spark, str(tmp_path / "s"), "txlog-nolock")
        for i in range(3):
            st.upsert("domain_knowledge", _dk(spark, [_dk_row(base + i)]))

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(writer, 100)
        f2 = pool.submit(writer, 200)
        f1.result(), f2.result()

    ids = {r["id"] for r in seed.read("domain_knowledge").select("id").collect()}
    assert ids == {"id0", "id100", "id101", "id102", "id200", "id201", "id202"}


def test_txlog_disjoint_partition_upserts_commute(spark, tmp_path):
    """Writers on DISJOINT (project, agent) partitions never conflict:
    the overlap predicate is partition-scoped, so both commit without a
    re-plan (asserted via the absence of extra data rewrites: one add
    batch per upsert in the history) — Delta's partition-level conflict
    granularity."""
    from concurrent.futures import ThreadPoolExecutor

    seed = make_store(spark, str(tmp_path / "s"), "txlog")
    seed.append(
        "domain_knowledge",
        _dk(spark, [_dk_row(0, agent="a1"), _dk_row(1, agent="a2")]),
    )

    def writer(agent, base):
        st = make_store(spark, str(tmp_path / "s"), "txlog-nolock")
        for i in range(3):
            st.upsert(
                "domain_knowledge", _dk(spark, [_dk_row(base + i, agent=agent)])
            )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(writer, "a1", 100)
        f2 = pool.submit(writer, "a2", 200)
        f1.result(), f2.result()

    df = seed.read("domain_knowledge")
    assert df.count() == 8
    assert df.filter("agent = 'a1'").count() == 4
    assert df.filter("agent = 'a2'").count() == 4


def test_txlog_checkpoint_rollup(spark, tmp_path):
    """Past CHECKPOINT_EVERY commits the reader resolves from the
    rolled-up checkpoint + log tail (and gets identical results)."""
    from alma_memory_spark.sources.txstore import CHECKPOINT_EVERY

    st = make_store(spark, str(tmp_path / "s"), "txlog")
    for i in range(CHECKPOINT_EVERY + 3):
        st.append("domain_knowledge", _dk(spark, [_dk_row(i)]))
    ckpt = os.path.join(st._log_dir("domain_knowledge"), "_checkpoint.json")
    assert os.path.isfile(ckpt)
    assert st.read("domain_knowledge").count() == CHECKPOINT_EVERY + 3
    # a fresh handle resolves through the checkpoint too
    st2 = make_store(spark, str(tmp_path / "s"), "txlog")
    assert st2.read("domain_knowledge").count() == CHECKPOINT_EVERY + 3


def test_txlog_compact_bounds_files(spark, tmp_path):
    """compact() runs through the commit protocol: many tiny appends
    fold into a bounded file count, readers stay correct, and the old
    files become vacuumable garbage."""
    st = make_store(spark, str(tmp_path / "s"), "txlog")
    for i in range(8):
        st.append("domain_knowledge", _dk(spark, [_dk_row(i)]))
    before = st._partition_file_stats("domain_knowledge")[("p", "a1")][0]
    assert before >= 8
    rep = st.compact("domain_knowledge")
    assert rep, "compaction should have triggered"
    after = st._partition_file_stats("domain_knowledge")[("p", "a1")][0]
    assert after < before
    assert st.read("domain_knowledge").count() == 8
    assert st.vacuum("domain_knowledge", retain_seconds=0, force=True) >= 8


def test_txlog_engine_end_to_end(spark, tmp_path):
    """The whole engine on the txlog backend: learn -> heuristic ->
    retrieve, forget with audit — the same e2e the parquet backend
    passes, proving the facade is backend-agnostic."""
    from alma_memory_spark.engine import AlmaSpark

    eng = AlmaSpark(spark, str(tmp_path / "store"), backend="txlog")
    for i in range(3):
        eng.learn(
            agent="helena",
            task=f"form testing attempt {i}",
            outcome=True,
            project_id="proj-a",
            strategy_used="wait for idle network",
            task_type="form_testing",
        )
    assert eng.store.read("outcomes").count() == 3
    heur = eng.store.read("heuristics").collect()
    assert len(heur) == 1 and heur[0]["occurrence_count"] == 3
    sl = eng.retrieve("form testing", agent="helena", project_id="proj-a")
    assert sl.heuristics
    eng.add_knowledge("helena", "proj-a", "d", "ephemeral fact")
    assert eng.forget("domain_knowledge", "proj-a", max_age_days=0) == 1
    assert eng.store.read("forget_audit").count() == 1


def test_txlog_time_travel(spark, tmp_path):
    """read_version resolves the table AS OF any logged version (data
    files are immutable until vacuumed — Delta VERSION AS OF)."""
    st = make_store(spark, str(tmp_path / "s"), "txlog")
    st.append("domain_knowledge", _dk(spark, [_dk_row(0), _dk_row(1)]))  # v0
    st.upsert("domain_knowledge", _dk(spark, [_dk_row(1, fact="v2 fact")]))  # v1
    st.delete("domain_knowledge", F.col("id") == "id0", audit=False)  # v2
    assert {r["id"] for r in st.read_version("domain_knowledge", 0).collect()} == {
        "id0", "id1"
    }
    v1 = {r["id"]: r["fact"] for r in st.read_version("domain_knowledge", 1).collect()}
    assert v1 == {"id0": "fact 0", "id1": "v2 fact"}
    assert {r["id"] for r in st.read("domain_knowledge").collect()} == {"id1"}
    with pytest.raises(ValueError):
        st.read_version("domain_knowledge", 99)


def test_txlog_maintenance_vacuum(spark, tmp_path):
    """The maintenance scheduler reclaims unreferenced txlog files when
    vacuum_retain_seconds is set; the swap backend ignores the knob."""
    from datetime import datetime, timezone

    from alma_memory_spark.engine import AlmaSpark
    from alma_memory_spark.operators.maintenance import (
        MaintenanceJob,
        MaintenanceScheduler,
    )

    now = [datetime(2024, 2, 15, tzinfo=timezone.utc)]
    eng = AlmaSpark(spark, str(tmp_path / "s"), backend="txlog", clock=lambda: now[0])
    eng.add_knowledge("a1", "p1", "d", "fact one")
    eng.store.overwrite(
        "domain_knowledge",
        eng.store.read("domain_knowledge").withColumn("fact", F.lit("rewritten")),
    )
    sched = MaintenanceScheduler(eng, clock=lambda: now[0])
    sched.register_job(
        MaintenanceJob(
            name="vac",
            project_id="p1",
            interval_hours=1,
            tables=["domain_knowledge"],
            vacuum_retain_seconds=0.0,
            vacuum_force=True,
        )
    )
    res = sched.run_job("vac")
    assert res.success, res.error
    assert res.vacuumed.get("domain_knowledge", 0) >= 1
    assert eng.store.read("domain_knowledge").collect()[0]["fact"] == "rewritten"


def test_txlog_idempotent_txn_append(spark, tmp_path):
    """Delta-style txn appends: a replayed (app, version) is a no-op —
    the exactly-once contract for streaming store ingest."""
    st = make_store(spark, str(tmp_path / "s"), "txlog")
    batch = _dk(spark, [_dk_row(0), _dk_row(1)])
    st.append("domain_knowledge", batch, txn=("ingest", 0))
    st.append("domain_knowledge", batch, txn=("ingest", 0))  # replay
    assert st.read("domain_knowledge").count() == 2
    st.append("domain_knowledge", _dk(spark, [_dk_row(2)]), txn=("ingest", 1))
    assert st.read("domain_knowledge").count() == 3
    # an OLDER version replay is also a no-op
    st.append("domain_knowledge", batch, txn=("ingest", 0))
    assert st.read("domain_knowledge").count() == 3
    # a different app id is independent
    st.append("domain_knowledge", _dk(spark, [_dk_row(3)]), txn=("other", 0))
    assert st.read("domain_knowledge").count() == 4
    # the high-water mark survives a checkpoint roll-up
    for i in range(25):
        st.append("domain_knowledge", _dk(spark, [_dk_row(100 + i)]))
    st.append("domain_knowledge", batch, txn=("ingest", 1))  # replay
    assert st.read("domain_knowledge").count() == 29


def test_txlog_streaming_store_ingest_replay_safe(spark, tmp_path):
    """stream_outcomes_into_store on the txlog backend: simulate the
    crash-replay window by re-invoking the sink with an already-applied
    epoch — rows must not double-append."""
    from alma_memory_spark import schemas as _schemas
    from alma_memory_spark.streaming.ingest import (
        read_outcome_stream,
        stream_outcomes_into_store,
    )

    st = make_store(spark, str(tmp_path / "s"), "txlog")
    rows = [
        {
            "id": f"o{i}",
            "agent": "a1",
            "project_id": "p",
            "task_type": "t",
            "success": True,
            "timestamp": NOW,
        }
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, _schemas.OUTCOMES)
    inbox = str(tmp_path / "inbox")
    df.repartition(3).write.parquet(inbox)
    batches: list[int] = []
    q = stream_outcomes_into_store(
        read_outcome_stream(spark, inbox), st, on_batch=batches.append
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert st.read("outcomes").count() == 6
    # crash-replay simulation: re-append a batch with an applied epoch
    st.append("outcomes", df.limit(2), txn=("stream-outcomes", int(max(batches))))
    assert st.read("outcomes").count() == 6


def test_txlog_crash_windows(spark, tmp_path):
    """Every crash window of the commit protocol leaves a readable,
    correct table:
    (a) data files written but no commit claimed -> invisible to
        readers, reclaimed by vacuum;
    (b) orphaned commit temp file -> ignored by the log replay,
        reclaimed by vacuum;
    (c) torn checkpoint -> full log replay still resolves."""
    import json as _json

    st = make_store(spark, str(tmp_path / "s"), "txlog")
    st.append("domain_knowledge", _dk(spark, [_dk_row(0), _dk_row(1)]))

    # (a) simulate a writer dying after the data write, before commit
    orphan_adds = st._write_data_files(
        "domain_knowledge", _dk(spark, [_dk_row(50)])
    )
    assert orphan_adds  # files exist on disk...
    assert st.read("domain_knowledge").count() == 2  # ...but are invisible
    assert st.vacuum("domain_knowledge", retain_seconds=0, force=True) >= 1

    # (b) orphaned commit temp: never replayed, vacuumed away
    tmp_commit = os.path.join(
        st._log_dir("domain_knowledge"), ".tmp-deadbeef.json"
    )
    with open(tmp_commit, "w") as f:
        _json.dump({"adds": [], "removes": []}, f)
    assert st.read("domain_knowledge").count() == 2
    st.vacuum("domain_knowledge", retain_seconds=0, force=True)
    assert not os.path.exists(tmp_commit)

    # (c) torn checkpoint: replay falls back to the full log
    ckpt = os.path.join(st._log_dir("domain_knowledge"), "_checkpoint.json")
    with open(ckpt, "w") as f:
        f.write("{not json")
    st2 = make_store(spark, str(tmp_path / "s"), "txlog")
    assert st2.read("domain_knowledge").count() == 2
    os.remove(ckpt)


def test_txlog_model_based_random_ops(spark, tmp_path):
    """Model-based check: a deterministic random sequence of
    append/upsert/delete/compact/overwrite against TxLogStore must
    match a dict model keyed by id at every step."""
    import random

    rng = random.Random(1234)
    st = make_store(spark, str(tmp_path / "s"), "txlog")
    model: dict[str, str] = {}
    next_id = 0

    def rows_from(ids_facts):
        return _dk(
            spark,
            [
                _dk_row(int(i[2:]), agent=f"a{int(i[2:]) % 3}", fact=fact)
                for i, fact in ids_facts
            ],
        )

    for step in range(25):
        op = rng.choice(["append", "append", "upsert", "delete", "compact"])
        if op == "append":
            batch = [(f"id{next_id + j}", f"fact {next_id + j}") for j in range(rng.randint(1, 3))]
            next_id += len(batch)
            st.append("domain_knowledge", rows_from(batch))
            model.update(batch)
        elif op == "upsert" and model:
            targets = rng.sample(sorted(model), min(2, len(model)))
            batch = [(i, f"updated@{step}") for i in targets]
            st.upsert("domain_knowledge", rows_from(batch))
            model.update(batch)
        elif op == "delete" and model:
            targets = rng.sample(sorted(model), min(2, len(model)))
            st.delete(
                "domain_knowledge", F.col("id").isin(targets), audit=False
            )
            for i in targets:
                model.pop(i)
        elif op == "compact":
            st.compact("domain_knowledge", min_files=1)
        got = {
            r["id"]: r["fact"]
            for r in st.read("domain_knowledge").collect()
        } if model or st.exists("domain_knowledge") else {}
        assert got == model, f"divergence at step {step} ({op})"


def test_store_admin_tools(spark, tmp_path):
    """The r4 store-admin MCP tools: history / time-travel count /
    vacuum / partition health on the txlog backend, graceful errors on
    the swap backend."""
    from alma_memory_spark.api import AlmaToolSurface
    from alma_memory_spark.engine import AlmaSpark

    eng = AlmaSpark(spark, str(tmp_path / "s"), backend="txlog")
    tools = AlmaToolSurface(eng)
    eng.add_knowledge("a1", "p1", "d", "fact one")
    eng.add_knowledge("a1", "p1", "d", "fact two")
    hist = tools.call("alma_store_history", table="domain_knowledge")["history"]
    assert [h["version"] for h in hist] == [0, 1]
    tt = tools.call("alma_time_travel_count", table="domain_knowledge", version=0)
    assert tt["rows"] == 1
    ph = tools.call("alma_partition_health", table="domain_knowledge")
    assert ph["n_pairs"] == 1 and ph["n_files"] >= 2
    vac = tools.call("alma_vacuum", table="domain_knowledge", retain_seconds=0, force=True)
    assert vac["deleted_files"] == 0  # nothing unreferenced yet
    # the tool surfaces the retention floor as an error, not a crash
    guard = tools.call("alma_vacuum", table="domain_knowledge", retain_seconds=0)
    assert "safety floor" in guard.get("error", "")

    swap = AlmaToolSurface(AlmaSpark(spark, str(tmp_path / "p")))
    assert "error" in swap.call("alma_store_history", table="domain_knowledge")


def test_txn_append_claim_exhaustion_is_not_swallowed(spark, tmp_path):
    """A txn append whose commit NEVER landed (claim exhaustion under
    contention) must raise, not silently drop the batch — only a
    verified already-applied (app, version) may no-op."""
    st = make_store(spark, str(tmp_path / "s"), "txlog")
    batch = _dk(spark, [_dk_row(0)])
    st.append("domain_knowledge", batch, txn=("ingest", 0))
    # force every claim to fail: the replayed epoch 0 must still no-op
    # (verified applied), but a NEW epoch must surface the failure
    original = st._try_claim
    st._try_claim = lambda *a, **k: False
    try:
        st.append("domain_knowledge", batch, txn=("ingest", 0))  # applied: ok
        from alma_memory_spark.sources.txstore import CommitConflict

        with pytest.raises(CommitConflict):
            st.append("domain_knowledge", batch, txn=("ingest", 1))
    finally:
        st._try_claim = original
    assert st.read("domain_knowledge").count() == 1


def test_work_item_rmw_survives_lockfree_concurrency(spark, tmp_path):
    """The cross-host work-item case: two LOCK-FREE engine handles
    update the same item concurrently; the whole read-modify-write
    re-runs on commit conflict, so BOTH blocked_by appends land (a
    store-level blind retry would clobber one)."""
    from concurrent.futures import ThreadPoolExecutor

    from alma_memory_spark.engine import AlmaSpark

    root = str(tmp_path / "s")
    e1 = AlmaSpark(spark, root, backend="txlog-nolock")
    e2 = AlmaSpark(spark, root, backend="txlog-nolock")
    item = e1.create_work_item("p1", "contested")
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(
            e1.update_work_item_status, item["id"], "blocked", blocked_by="dep-a"
        )
        f2 = pool.submit(
            e2.update_work_item_status, item["id"], "blocked", blocked_by="dep-b"
        )
        f1.result(), f2.result()
    final = e1.get_work_items(project_id="p1")[0]
    assert sorted(final["blocked_by"]) == ["dep-a", "dep-b"]


def test_txlog_outcome_stream_fresh_checkpoint_fails_loud(spark, tmp_path):
    """A recreated checkpoint restarts epochs at 0; the txn dedupe
    would silently drop the re-delivered batches. The sink records the
    checkpoint's query id and raises on the lineage change instead
    (same contract as the index sinks' epoch-lineage guard)."""
    import shutil

    import pytest as _pytest

    from alma_memory_spark import schemas as _schemas
    from alma_memory_spark.streaming.ingest import (
        read_outcome_stream,
        stream_outcomes_into_store,
    )

    st = make_store(spark, str(tmp_path / "s"), "txlog")
    rows = [
        {
            "id": f"o{i}", "agent": "a1", "project_id": "p",
            "task_type": "t", "success": True, "timestamp": NOW,
        }
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, _schemas.OUTCOMES)
    inbox = str(tmp_path / "inbox")
    df.repartition(2).write.parquet(inbox)

    q = stream_outcomes_into_store(read_outcome_stream(spark, inbox), st)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert st.read("outcomes").count() == 4

    shutil.rmtree(st.root + "/_stream_checkpoints/outcomes")
    q2 = stream_outcomes_into_store(read_outcome_stream(spark, inbox), st)
    try:
        with _pytest.raises(Exception, match="lineage"):
            q2.processAllAvailable()
    finally:
        q2.stop()
    assert st.read("outcomes").count() == 4  # nothing dropped or doubled


def test_txlog_streaming_reingest_under_new_app_id(spark, tmp_path):
    """The lineage guard's documented escape hatch: an INTENTIONAL
    re-ingest of the same inbox passes a new app_id, which gets its
    own checkpoint dir and txn version space — rows land again instead
    of being silently dropped by the original writer's dedupe, and the
    original writer's replay protection is untouched."""
    from alma_memory_spark import schemas as _schemas
    from alma_memory_spark.streaming.ingest import (
        read_outcome_stream,
        stream_outcomes_into_store,
    )

    st = make_store(spark, str(tmp_path / "s"), "txlog")
    rows = [
        {
            "id": f"o{i}", "agent": "a1", "project_id": "p",
            "task_type": "t", "success": True, "timestamp": NOW,
        }
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, _schemas.OUTCOMES)
    inbox = str(tmp_path / "inbox")
    df.repartition(2).write.parquet(inbox)

    q = stream_outcomes_into_store(read_outcome_stream(spark, inbox), st)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert st.read("outcomes").count() == 4

    q2 = stream_outcomes_into_store(
        read_outcome_stream(spark, inbox), st, app_id="reingest-1"
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert st.read("outcomes").count() == 8
    assert os.path.isdir(st.root + "/_stream_checkpoints/outcomes-reingest-1")
    # each writer's own replay protection still holds
    st.append("outcomes", df.limit(2), txn=("stream-outcomes", 0))
    st.append("outcomes", df.limit(2), txn=("reingest-1", 0))
    assert st.read("outcomes").count() == 8


def test_txlog_read_plan_cache_version_pinned(spark, tmp_path):
    """r10 (VERDICT r9 #4): TxLogStore.read pins its plan to the log
    version — same version serves the same DataFrame object, any
    commit (either handle) advances the version and misses."""
    from alma_memory_spark.testing import fixtures as FX

    root = str(tmp_path / "txpc")
    store = make_store(spark, root, "txlog")
    seed = FX.seed_heuristics(spark)
    store.append("heuristics", seed)
    d1 = store.read("heuristics")
    assert store.read("heuristics") is d1
    other = make_store(spark, root, "txlog")
    other.append(
        "heuristics", seed.withColumn("id", F.concat(F.lit("b_"), F.col("id")))
    )
    d2 = store.read("heuristics")
    assert d2 is not d1
    assert d2.count() == 2 * seed.count()
    # the new plan re-caches at the new version
    assert store.read("heuristics") is d2
