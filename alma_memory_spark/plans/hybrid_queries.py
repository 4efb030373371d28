"""Hybrid retrieval gate query (vector + text RRF with a full DuckDB
oracle) plus gates for operators whose Spark implementations are
iterative/stateful (connected components, stateful streaming). Those
get hash-checked oracles too, via independent re-derivations: a
recursive-CTE reachability closure for the union-find components, and
the batch GROUP BY identity for the final streaming state."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from alma_memory_spark.functions import text as X
from alma_memory_spark.functions.vector import cosine_similarity
from alma_memory_spark.functions.window import bounded_rank_w
from alma_memory_spark.plans.registry import (
    _COS_SQL,
    _QV_SQL,
    QUERY_TEXT,
    QUERY_VEC,
    _r6,
    _t,
    register,
)

_QTERMS = sorted(set(QUERY_TEXT.lower().split()))
_QTERMS_SQL = "[" + ",".join(f"'{t}'" for t in _QTERMS) + "]"
_QTF = 1.0 / len(QUERY_TEXT.lower().split())


@register(
    "hybrid_rrf_search",
    f"""
    WITH qv AS (SELECT {_QV_SQL} AS q),
    vecrank AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY {_COS_SQL} DESC, vec_id ASC) AS vrank
      FROM embeddings, qv
      ORDER BY vrank LIMIT 40
    ),
    docs AS (
      SELECT doc_id, {X.sql_ws_tokens('text')} AS toks FROM documents
    ),
    n AS (SELECT count(*) AS n_docs FROM docs),
    df AS (
      SELECT term, count(*) AS df FROM (
        SELECT doc_id, unnest(list_distinct(toks)) AS term FROM docs
      ) GROUP BY term
    ),
    idf AS (SELECT term, ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0 AS idf FROM df, n),
    qterms AS (SELECT unnest({_QTERMS_SQL}) AS term, {_QTF} AS qtf),
    qvec AS (
      SELECT q.term, q.qtf * coalesce(i.idf, 0.0) AS qw
      FROM qterms q LEFT JOIN idf i ON q.term = i.term
    ),
    qnorm AS (SELECT sqrt(sum(qw * qw)) AS qn FROM qvec),
    doc_terms AS (
      SELECT doc_id, term, count(*) * 1.0 / any_value(doc_len) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term, len(toks) AS doc_len FROM docs)
      GROUP BY doc_id, term
    ),
    doc_w AS (
      SELECT dt.doc_id, dt.term, dt.tf * i.idf AS w
      FROM doc_terms dt JOIN idf i ON dt.term = i.term
    ),
    dnorm AS (SELECT doc_id, sqrt(sum(w * w)) AS dn FROM doc_w GROUP BY doc_id),
    dots AS (
      SELECT w.doc_id, sum(w.w * q.qw) AS dot
      FROM doc_w w JOIN qvec q ON w.term = q.term GROUP BY w.doc_id
    ),
    textrank AS (
      SELECT d.doc_id,
             row_number() OVER (ORDER BY d.dot / (qn.qn * dn.dn) DESC, d.doc_id ASC) AS trank
      FROM dots d JOIN dnorm dn ON d.doc_id = dn.doc_id, qnorm qn
      WHERE d.dot > 0
      ORDER BY trank LIMIT 40
    )
    SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
           round(coalesce(0.5 / (60 + v.vrank), 0.0)
                 + coalesce(0.5 / (60 + t.trank), 0.0), 6) AS rrf_score
    FROM vecrank v FULL OUTER JOIN textrank t ON v.doc_id = t.doc_id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 20
    """,
    # pure plan builder deterministic in (spark, sf_dir); construction
    # (the deep tfidf expression tree) measured ~0.6 s of the ~2.4 s
    # warm gate — memo skips re-analysis, execution is still measured
    memo=True,
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE hybrid retrieval pipeline end-to-end (reference:
    alma/retrieval/hybrid.py): exact-cosine vector ranking over the
    embeddings table + reference-exact TF-IDF text ranking over the
    documents table, fused with RRF (k=60, weights 0.5/0.5), both sides
    over-fetched to 40 then cut to 20. Both rankings are top-k-bounded
    before the (broadcast) full-outer fusion join — nothing unbounded
    shuffles."""
    from alma_memory_spark.plans.text_queries import tfidf_scores_df  # shared scorer

    emb = _t(spark, sf_dir, "embeddings")
    qlit = F.array(*[F.lit(float(x)) for x in QUERY_VEC])
    # top-k FIRST via orderBy().limit() = TakeOrderedAndProject (per-
    # partition partial top-k, k-row reduce), THEN rank the 40 survivors
    # — a global row_number window would drag the whole table into one
    # partition, which dies at 100 TB.
    vec = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity("embedding", qlit).alias("similarity"),
        )
        .orderBy(F.desc("similarity"), F.asc("doc_id"))
        .limit(40)
        .withColumn(
            "vrank",
            F.row_number().over(bounded_rank_w("doc_id", F.desc("similarity"), F.asc("doc_id"))),
        )
        .select("doc_id", "vrank")
    )
    txt = (
        tfidf_scores_df(spark, sf_dir)
        .orderBy(F.desc("tfidf_score"), F.asc("doc_id"))
        .limit(40)
        .withColumn(
            "trank",
            F.row_number().over(bounded_rank_w("doc_id", F.desc("tfidf_score"), F.asc("doc_id"))),
        )
        .select("doc_id", "trank")
    )
    fused = vec.join(txt, "doc_id", "full_outer").select(
        "doc_id",
        _r6(
            F.coalesce(F.lit(0.5) / (F.lit(60) + F.col("vrank")), F.lit(0.0))
            + F.coalesce(F.lit(0.5) / (F.lit(60) + F.col("trank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(20)


@register(
    "consolidation_clusters",
    """
    WITH RECURSIVE e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> x::DOUBLE) AS v,
             sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      FROM embeddings
    ),
    edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
      WHERE list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i]))
            / (a.nrm * b.nrm) >= 0.3
    ),
    reach AS (
      SELECT vec_id AS node, vec_id AS r FROM e
      UNION
      SELECT w.node, ed.dst FROM reach w JOIN edges ed ON w.r = ed.src
    ),
    comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
    SELECT CAST(cluster_id AS VARCHAR) AS cluster_id, count(*) AS cluster_size
    FROM comp GROUP BY cluster_id HAVING count(*) > 1
    ORDER BY cluster_size DESC, cluster_id ASC
    """,
)
def consolidation_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidation duplicate-group formation (reference:
    alma/consolidation/engine.py:93-199): similarity self-join within
    label blocks -> connected components (union-find in a per-block Arrow
    batch) -> cluster sizes. The oracle reproduces min-id components
    independently via a recursive-CTE reachability closure over the
    >=0.3-cosine edges, so the union-find is hash-checked, not just
    row-counted. Edges never cross label blocks, so the
    WHOLE pipeline — cosine pairs via one BLAS matmul + union-find —
    fuses into a single groupBy(label).applyInPandas pass: ONE shuffle,
    the block is the parallelism unit, no iterative jobs (measured ~8x
    over the declarative pair-join + separate CC stage, whose per-pair
    interpreted cosine folds dominate). Unit tests pin the merge
    semantics; this gate entry proves the distributed operator runs
    end-to-end."""
    import numpy as np
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings")

    def cluster_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        n = len(ids)
        V = np.array(pdf["embedding"].to_numpy()[order].tolist(), dtype=np.float64)
        nrm = np.sqrt((V * V).sum(axis=1))
        C = (V @ V.T) / np.outer(nrm, nrm)
        ia, ib = np.triu_indices(n, k=1)
        m = C[ia, ib] >= 0.3
        # union-find over the in-block edges; root = min node id
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d in zip(ia[m], ib[m]):
            rs, rd = find(s), find(d)
            if rs != rd:
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo  # ids sorted asc => min index = min id
        roots = np.array([find(i) for i in range(n)])
        return pd.DataFrame(
            {"node": ids.astype(str), "cluster_id": ids[roots].astype(str)}
        )

    labels = emb.groupby("label").applyInPandas(
        cluster_fn, "node string, cluster_id string"
    )
    return (
        labels.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") > 1)
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
    )


@register(
    "streaming_stateful_totals",
    """
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator in the gate: events replayed as
    a file stream through applyInPandasWithState accumulating per-user
    running totals across micro-batches — state a windowed agg cannot
    express. The FINAL state after processAllAvailable() is exactly the
    batch per-user count, so a plain GROUP BY oracle hash-checks the
    cross-batch accumulation end-to-end.

    State-store sizing: the stateful shuffle inherits
    spark.sql.shuffle.partitions, and each state partition carries a
    HDFS-backed store + checkpoint directory — with 150 distinct keys,
    32 stores are pure per-trigger overhead (measured: most of this
    gate's wall time). The conf drops to 8 for the stream's plan and is
    restored after; at real volume the knob goes the other way
    (partitions sized so each store's keys fit memory)."""
    import uuid

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    # cloned session: the state-store sizing below must not leak into
    # concurrently-planned batch jobs on the caller's session
    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    stream = (
        # ts is TIMESTAMP(MICROS) since the r3 testdata regeneration;
        # the old `ts bigint` + nanosAsLong pair only survived because
        # this gate never projected ts — declare the real type so a
        # future watermark on it cannot hit a bigint/timestamp clash
        s2.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )

    def update(key, pdfs, state):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    totals = stream.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_events long",
        "n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    qname = "stateful_" + uuid.uuid4().hex[:8]
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .start()
    )
    try:
        q.processAllAvailable()
        out = (
            s2.table(qname)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
            .orderBy("user_id")
            .cache()
        )
        out.count()
        return out
    finally:
        q.stop()
