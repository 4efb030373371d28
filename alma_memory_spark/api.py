"""Tool-surface adapter: the reference's MCP tool names mapped onto the
Spark engine.

The reference serves 22+ tools over a stdio JSON-RPC MCP server
(alma/mcp/server.py, tools/__init__.py:98-135). The transport is out of
scope for a Spark engine (any thin JSON-RPC/HTTP layer can wrap this),
but the TOOL CONTRACT — names, arguments, dict-shaped results — is part
of API parity, so it lives here as plain callables: `call(tool, **args)`
dispatches exactly like the reference's server does onto its ALMA
facade.
"""

from __future__ import annotations

import json
from typing import Any

from alma_memory_spark.engine import AlmaSpark


class AlmaToolSurface:
    def __init__(self, engine: AlmaSpark):
        self.engine = engine
        self._tools = {
            "alma_retrieve": self._retrieve,
            "alma_retrieve_batch": self._retrieve_batch,
            "alma_retrieve_for_mode": self._retrieve_for_mode,
            "alma_retrieve_smart": self._retrieve_smart,
            "alma_retrieve_scoped": self._retrieve_scoped,
            "alma_retrieve_verified": self._retrieve_verified,
            "alma_retrieve_with_trust": self._retrieve_with_trust,
            "alma_retrieve_with_budget": self._retrieve_with_budget,
            "alma_retrieve_progressive": self._retrieve_progressive,
            "alma_get_memory_full": self._get_memory_full,
            "alma_learn": self._learn,
            "alma_list_verification": self._list_verification,
            "alma_add_knowledge": self._add_knowledge,
            "alma_add_preference": self._add_preference,
            "alma_record_feedback": self._record_feedback,
            "alma_forget": self._smart_forget,
            "alma_consolidate": self._consolidate,
            "alma_reinforce": self._reinforce,
            "alma_get_weak_memories": self._get_weak_memories,
            "alma_smart_forget": self._smart_forget,
            "alma_compress_and_learn": self._compress_and_learn,
            "alma_extract_heuristic": self._extract_heuristic,
            "alma_checkpoint": self._checkpoint,
            "alma_resume": self._resume,
            "alma_merge_states": self._merge_states,
            "alma_workflow_learn": self._workflow_learn,
            "alma_link_artifact": self._link_artifact,
            "alma_get_artifacts": self._get_artifacts,
            "alma_cleanup_checkpoints": self._cleanup_checkpoints,
            "alma_stats": self._stats,
            "alma_health": self._health,
            "alma_optimize": self._optimize,
            "alma_index_text": self._index_text,
            "alma_search_hybrid": self._search_hybrid,
            "alma_index_vectors": self._index_vectors,
            "alma_search_vectors": self._search_vectors,
            "alma_store_history": self._store_history,
            "alma_time_travel_count": self._time_travel_count,
            "alma_vacuum": self._vacuum,
            "alma_partition_health": self._partition_health,
            "alma_assess_strategy": self._assess_strategy,
            "alma_rank_strategies": self._rank_strategies,
            "alma_learn_from_conversation": self._learn_from_conversation,
            "alma_start_session": self._start_session,
            "alma_end_session": self._end_session,
            "alma_create_work_item": self._create_work_item,
            "alma_update_work_item": self._update_work_item,
            "alma_get_work_items": self._get_work_items,
            "alma_get_next_work_item": self._get_next_work_item,
            "alma_progress_summary": self._progress_summary,
            "alma_log_progress": self._log_progress,
            "alma_store_trust_pattern": self._store_trust_pattern,
            "alma_get_trust_warnings": self._get_trust_warnings,
        }

    def tools(self) -> list[str]:
        return sorted(self._tools)

    def call(self, tool: str, **args: Any) -> dict[str, Any]:
        if tool not in self._tools:
            return {"error": f"unknown tool: {tool}", "available": self.tools()}
        try:
            return self._tools[tool](**args)
        except TypeError as e:
            # bad/missing arguments -> structured error payload (the
            # reference's MCP server returns JSON-RPC errors, not stack
            # traces)
            return {"error": f"invalid arguments for {tool}: {e}"}

    # -- retrieval ----------------------------------------------------

    def _slice_dict(self, sl) -> dict[str, Any]:
        return {
            "query": sl.query,
            "agent": sl.agent,
            "mode": sl.mode,
            "counts": {
                "heuristics": len(sl.heuristics),
                "outcomes": len(sl.outcomes),
                "preferences": len(sl.preferences),
                "domain_knowledge": len(sl.domain_knowledge),
                "anti_patterns": len(sl.anti_patterns),
            },
            "heuristics": sl.heuristics,
            "outcomes": sl.outcomes,
            "preferences": sl.preferences,
            "domain_knowledge": sl.domain_knowledge,
            "anti_patterns": sl.anti_patterns,
        }

    def _retrieve(self, task: str, agent: str, project_id: str | None = None,
                  top_k: int = 5, user_id: str | None = None,
                  use_ann: bool = False, nprobe: int = 8) -> dict[str, Any]:
        return self._slice_dict(
            self.engine.retrieve(
                task, agent, project_id, user_id, top_k,
                use_ann=use_ann, nprobe=nprobe,
            )
        )

    def _retrieve_batch(self, tasks: list[str], agent: str,
                        project_id: str | None = None, top_k: int = 5,
                        user_id: str | None = None, use_ann: bool = False,
                        nprobe: int = 8) -> dict[str, Any]:
        """N tasks in one Spark job (engine.retrieve_batch); returns
        {task: slice-dict} — the serving tier's bulk entry point."""
        slices = self.engine.retrieve_batch(
            tasks, agent, project_id, user_id, top_k,
            use_ann=use_ann, nprobe=nprobe,
        )
        return {task: self._slice_dict(sl) for task, sl in slices.items()}

    def _retrieve_smart(self, task: str, agent: str, project_id: str | None = None,
                        top_k: int = 5) -> dict[str, Any]:
        return self._slice_dict(
            self.engine.retrieve(task, agent, project_id, top_k=top_k, mode="auto")
        )

    def _retrieve_scoped(self, task: str, agent: str, project_id: str,
                         inherit_from: list[str] | None = None,
                         top_k: int = 5) -> dict[str, Any]:
        return self._slice_dict(
            self.engine.retrieve(
                task, agent, project_id, top_k=top_k, inherit_from=inherit_from
            )
        )

    def _retrieve_with_budget(self, task: str, agent: str, max_tokens: int,
                              project_id: str | None = None) -> dict[str, Any]:
        sl, prompt = self.engine.retrieve_with_budget(task, agent, max_tokens, project_id)
        out = self._slice_dict(sl)
        out["prompt"] = prompt
        return out

    def _retrieve_progressive(self, task: str, agent: str,
                              project_id: str | None = None,
                              level: str = "summary") -> dict[str, Any]:
        return {
            "items": self.engine.retrieve_progressive(
                task, agent, project_id, level=level
            )
        }

    # -- writes -------------------------------------------------------

    def _learn(self, agent: str, task: str, outcome: bool, project_id: str,
               strategy_used: str | None = None, task_type: str | None = None,
               error_message: str | None = None) -> dict[str, Any]:
        try:
            return self.engine.learn(
                agent, task, outcome, project_id, strategy_used, task_type,
                error_message=error_message,
            )
        except ValueError as e:
            return {"blocked": True, "reason": str(e)}

    def _add_knowledge(self, agent: str, project_id: str, domain: str,
                       fact: str, source: str = "user_stated") -> dict[str, Any]:
        return {"id": self.engine.add_knowledge(agent, project_id, domain, fact, source)}

    def _add_preference(self, user_id: str, category: str, preference: str,
                        source: str = "explicit_instruction") -> dict[str, Any]:
        return {"id": self.engine.add_preference(user_id, category, preference, source)}

    def _record_feedback(self, memory_id: str, memory_type: str, signal: str,
                         agent: str, project_id: str | None = None) -> dict[str, Any]:
        self.engine.record_feedback(memory_id, memory_type, signal, agent, project_id)
        return {"recorded": True}

    # -- lifecycle ----------------------------------------------------

    def _consolidate(self, table: str, project_id: str,
                     threshold: float = 0.85) -> dict[str, Any]:
        return {"merged": self.engine.consolidate(table, project_id, threshold)}

    def _smart_forget(self, table: str, project_id: str,
                      max_age_days: float | None = None,
                      min_confidence: float | None = None,
                      quota: int | None = None) -> dict[str, Any]:
        return {
            "deleted": self.engine.forget(
                table, project_id, max_age_days, min_confidence, quota
            )
        }

    # -- workflow / admin --------------------------------------------

    def _checkpoint(self, run_id: str, node_id: str, state: dict | str,
                    sequence_number: int, branch_id: str | None = None,
                    state_hash: str | None = None,
                    skip_if_unchanged: bool = False) -> dict[str, Any]:
        state_json = state if isinstance(state, str) else json.dumps(state)
        cid = self.engine.checkpoint(
            run_id, node_id, state_json, sequence_number, branch_id,
            state_hash, skip_if_unchanged,
        )
        return {"checkpoint_id": cid, "skipped": cid is None}

    def _resume(self, run_id: str, branch_id: str | None = None) -> dict[str, Any]:
        row = self.engine.resume(run_id, branch_id)
        return {"checkpoint": row}

    def _merge_states(self, run_ids: list[str],
                      reducers: dict[str, str] | None = None) -> dict[str, Any]:
        return {"state": self.engine.merge_states(run_ids, reducers)}

    def _stats(self, project_id: str | None = None) -> dict[str, Any]:
        return self.engine.stats(project_id)

    def _health(self) -> dict[str, Any]:
        return self.engine.health()

    def _optimize(self, tables: list[str] | None = None,
                  target_file_bytes: int = 128 << 20) -> dict[str, Any]:
        """Compact small files (Delta OPTIMIZE analog; beyond reference)."""
        return {"compacted": self.engine.optimize(tables, target_file_bytes)}

    def _index_text(self, table: str = "domain_knowledge",
                    n_buckets: int = 64) -> dict[str, Any]:
        """Build/rebuild the persisted keyword index (reference:
        HybridSearchEngine.index_corpus, hybrid.py:86-97)."""
        return self.engine.index_text(table, n_buckets)

    def _search_hybrid(self, task: str, agent: str,
                       project_id: str | None = None,
                       table: str = "domain_knowledge", top_k: int = 5,
                       vector_weight: float = 0.5,
                       text_weight: float = 0.5) -> dict[str, Any]:
        """Weighted-RRF hybrid retrieval (reference:
        HybridSearchEngine.fuse, hybrid.py:113-178)."""
        return {
            "results": self.engine.search_hybrid(
                task, agent, project_id=project_id, table=table,
                top_k=top_k, vector_weight=vector_weight,
                text_weight=text_weight,
            )
        }

    def _index_vectors(self, table: str = "domain_knowledge",
                       cent_every: int = 50,
                       pq_m: int | None = None) -> dict[str, Any]:
        """Build/rebuild the persisted IVF vector index (reference:
        the FAISS IndexIVFFlat build, sqlite_local.py:555-640).
        pq_m > 0 additionally stores product-quantization codes
        (IndexIVFPQ's memory/IO shape); omitted, a rebuild preserves
        any existing PQ configuration."""
        if pq_m is None:
            return self.engine.index_vectors(table, cent_every=cent_every)
        return self.engine.index_vectors(
            table, cent_every=cent_every, pq_m=pq_m
        )

    def _search_vectors(self, task: str, agent: str | None = None,
                        project_id: str | None = None,
                        table: str = "domain_knowledge", top_k: int = 10,
                        nprobe: int = 3,
                        refine: int | None = None) -> dict[str, Any]:
        """ANN retrieval from the persisted IVF index (tombstone- and
        scope-guarded), exact-scan fallback without one. `refine`
        serves a PQ-built index from its codes (ADC candidate scan +
        exact re-rank of refine*top_k)."""
        return {
            "results": self.engine.search_vectors(
                task, agent=agent, project_id=project_id, table=table,
                top_k=top_k, nprobe=nprobe, refine=refine,
            )
        }

    def _store_history(self, table: str) -> dict[str, Any]:
        """Commit log as data (txlog backend; Delta DESCRIBE HISTORY)."""
        if not hasattr(self.engine.store, "history"):
            return {"error": "store backend has no commit log (use backend='txlog')"}
        return {"history": self.engine.store.history(table)}

    def _time_travel_count(self, table: str, version: int) -> dict[str, Any]:
        """Row count of the table AS OF a log version (txlog backend) —
        the cheap smoke for VERSION AS OF reads."""
        if not hasattr(self.engine.store, "read_version"):
            return {"error": "store backend has no commit log (use backend='txlog')"}
        return {
            "table": table,
            "version": version,
            "rows": self.engine.store.read_version(table, version).count(),
        }

    def _vacuum(
        self,
        table: str,
        retain_seconds: float = 7 * 86400.0,
        force: bool = False,
    ) -> dict[str, Any]:
        if not hasattr(self.engine.store, "vacuum"):
            return {"error": "store backend has no vacuum (use backend='txlog')"}
        try:
            n = self.engine.store.vacuum(table, retain_seconds, force=force)
        except ValueError as e:  # sub-floor retention without force
            return {"error": str(e)}
        return {"table": table, "deleted_files": n}

    def _partition_health(self, table: str) -> dict[str, Any]:
        return {"table": table, **self.engine.store.partition_health(table)}

    def _assess_strategy(self, strategy: str, context: str, agent: str,
                         project_id: str | None = None) -> dict[str, Any]:
        """ConfidenceEngine.assess_strategy (confidence/engine.py:70-150)."""
        return self.engine.assess_strategy(strategy, context, agent, project_id)

    def _rank_strategies(self, strategies: list[str], context: str, agent: str,
                         project_id: str | None = None) -> dict[str, Any]:
        """ConfidenceEngine.rank_strategies (confidence/engine.py:152-182)."""
        return {
            "ranked": self.engine.rank_strategies(
                strategies, context, agent, project_id
            )
        }

    def _learn_from_conversation(self, messages: list, agent: str,
                                 project_id: str,
                                 user_id: str | None = None,
                                 commit: bool = True) -> dict[str, Any]:
        """AutoLearner.learn_from_conversation (auto_learner.py:68-173)."""
        out = self.engine.learn_from_conversation(
            messages, agent, project_id, user_id=user_id, commit=commit
        )
        # fact rows are plain dicts already; trim to the summary shape
        return {k: out[k] for k in
                ("extracted_count", "valid_count", "committed_count",
                 "rejected_count")} | {
            "committed_ids": [c["id"] for c in out["committed"]]
        }

    def _start_session(self, agent: str, project_id: str,
                       goal: str | None = None,
                       session_id: str | None = None) -> dict[str, Any]:
        """SessionManager.start_session (session/manager.py:74-141)."""
        return self.engine.start_session(agent, project_id, goal, session_id)

    def _end_session(self, agent: str, project_id: str, last_action: str,
                     **kw) -> dict[str, Any]:
        """SessionManager.create_handoff at end (session/manager.py:214-273)."""
        return {"handoff_id": self.engine.end_session(agent, project_id,
                                                      last_action, **kw)}

    def _create_work_item(self, project_id: str, title: str, **kw) -> dict[str, Any]:
        """ProgressTracker.create_work_item (progress/tracker.py:58-95)."""
        return self.engine.create_work_item(project_id, title, **kw)

    def _update_work_item(self, item_id: str, status: str, **kw) -> dict[str, Any]:
        """ProgressTracker.update_status (progress/tracker.py:139-186)."""
        return self.engine.update_work_item_status(item_id, status, **kw) or {
            "error": f"work item not found: {item_id}"
        }

    def _get_work_items(self, **kw) -> dict[str, Any]:
        return {"items": self.engine.get_work_items(**kw)}

    def _get_next_work_item(self, agent: str | None = None,
                            strategy: str = "priority") -> dict[str, Any]:
        """ProgressTracker.get_next_item (progress/tracker.py:292-334)."""
        return {"next": self.engine.get_next_work_item(agent, strategy)}

    def _progress_summary(self, agent: str | None = None) -> dict[str, Any]:
        return self.engine.get_progress_summary(agent)

    def _log_progress(self, agent: str, session_id: str,
                      current_action: str = "") -> dict[str, Any]:
        return self.engine.log_progress(agent, session_id, current_action)

    # -- extended surface (remaining reference tools) -----------------

    def _retrieve_for_mode(self, task: str, agent: str, mode: str,
                           project_id: str | None = None,
                           top_k: int = 5) -> dict[str, Any]:
        return self._slice_dict(
            self.engine.retrieve(task, agent, project_id, top_k=top_k, mode=mode)
        )

    def _retrieve_verified(self, task: str, agent: str,
                           project_id: str | None = None,
                           top_k: int = 5) -> dict[str, Any]:
        return self._slice_dict(
            self.engine.retrieve_verified(
                task, agent, project_id=project_id, top_k=top_k
            )
        )

    def _retrieve_with_trust(self, task: str, agent: str,
                             project_id: str | None = None,
                             top_k: int = 5) -> dict[str, Any]:
        return self._slice_dict(
            self.engine.retrieve_with_trust(
                task, agent, project_id=project_id, top_k=top_k
            )
        )

    def _get_memory_full(self, memory_type: str, memory_id: str) -> dict[str, Any]:
        row = self.engine.get_memory_full(memory_type, memory_id)
        return {"memory": row, "found": row is not None}

    def _list_verification(self, table: str, project_id: str, status: str,
                           limit: int = 100) -> dict[str, Any]:
        return {"items": self.engine.list_verification(table, project_id, status, limit)}

    def _reinforce(self, memory_type: str, memory_id: str,
                   importance: float | None = None) -> dict[str, Any]:
        return self.engine.reinforce(memory_type, memory_id, importance)

    def _get_weak_memories(self, threshold: float = 0.3) -> dict[str, Any]:
        return {"items": self.engine.get_weak_memories(threshold)}

    def _compress_and_learn(self, content: str, agent: str, project_id: str,
                            domain: str = "general") -> dict[str, Any]:
        return self.engine.compress_and_learn(content, agent, project_id, domain)

    def _extract_heuristic(self, project_id: str | None = None) -> dict[str, Any]:
        return {"extracted": self.engine.extract_heuristics_batch(project_id)}

    def _workflow_learn(self, workflow_id: str, run_id: str, agent: str,
                        project_id: str, result: str, **kwargs: Any) -> dict[str, Any]:
        return {
            "id": self.engine.record_workflow_outcome(
                workflow_id, run_id, agent, project_id, result, **kwargs
            )
        }

    def _link_artifact(self, memory_type: str, memory_id: str, storage_url: str,
                       mime_type: str | None = None,
                       checksum: str | None = None) -> dict[str, Any]:
        return {
            "id": self.engine.link_artifact(
                memory_type, memory_id, storage_url, mime_type, checksum
            )
        }

    def _get_artifacts(self, memory_type: str, memory_id: str) -> dict[str, Any]:
        return {"items": self.engine.get_artifacts(memory_type, memory_id)}

    def _cleanup_checkpoints(self, run_id: str | None = None,
                             older_than_days: float | None = None) -> dict[str, Any]:
        return {"deleted": self.engine.cleanup_checkpoints(run_id, older_than_days)}

    def _store_trust_pattern(self, agent: str, performance_score: float,
                             behavior_scores: list[float] | None = None,
                             success_streak: int = 0) -> dict[str, Any]:
        self.engine.store_trust_pattern(
            agent, performance_score, behavior_scores, success_streak
        )
        return {"stored": True}

    def _get_trust_warnings(self, threshold: float = 0.5) -> dict[str, Any]:
        return {"items": self.engine.get_trust_warnings(threshold)}
