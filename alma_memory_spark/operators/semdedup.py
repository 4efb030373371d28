"""SemDeDup-shape semantic dedup: cluster-then-dedup over embeddings.

Reference semantics: the consolidation engine's cosine-threshold
duplicate detection (alma/consolidation/engine.py:93-199) finds
semantic duplicates by embedding similarity. Its all-pairs form is the
blocked `neardup_pairs` 'cosine' path; THIS module is the 100 TB shape,
following SemDeDup (Abbas et al. 2023, arXiv:2303.09540): quantize the
embedding space into cells, compare pairs only WITHIN a cell, then
derive duplicate families with global connected components. Pure
composition of shipped operators:

  quantizer cells  <- operators/ann_index.py's IVF seeding/assignment
  per-cell pairs   <- the blocked BLAS cosine kernel (one matmul/cell)
  families         <- operators/components.py connected components

Scale shape: the stride quantizer yields n/cent_every cells, so cell
occupancy stays ~cent_every as the corpus grows — per-cell pair cost is
FLAT (measured by scripts/measure_semdedup.py); the only shuffle is the
groupBy(cell) exchange. No all-pairs join exists at any corpus size.
Assignment is a narrow Arrow-batched map against the broadcast centroid
matrix, identical in shape to IVFIndex._write_lists (ann_index.py:392).

For corpora where n/cent_every centroids no longer fit the driver
(billions of vectors), pass a persisted `IVFIndex` built with coarser
seeding / k-means refinement as `quantizer=` — the same handle the ANN
serving path already maintains, so semantic dedup rides the index the
pipeline has anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "semantic_dedup_pairs",
    "semantic_dedup_pairs_incremental",
    "semantic_dedup_groups",
    "stride_centroids",
]


def stride_centroids(
    df: DataFrame, id_col: str, vec_col: str, cent_every: int
):
    """Deterministic centroid seeds: every id % cent_every == 0 row,
    RAW (un-normalized) vectors plus their norms. Delegates to the ONE
    shared seeding implementation (ann_index.stride_seed_centroids) so
    the advertised IVFIndex-quantizer interchangeability cannot drift;
    the rule is replayable in ANSI SQL (`WHERE id % cent_every = 0`),
    which the oracle gate relies on. Returns (cells desc-sorted int64
    array, C raw matrix, cnrm norms)."""
    import numpy as np

    from alma_memory_spark.operators.ann_index import stride_seed_centroids

    cells, C = stride_seed_centroids(df, id_col, vec_col, cent_every)
    cnrm = np.maximum(np.linalg.norm(C, axis=1), 1e-300)
    return cells, C, cnrm


def _assign_cells(
    df: DataFrame, id_col: str, vec_col: str, cells, C, cnrm
) -> DataFrame:
    """(id, embedding, cell): nearest-centroid assignment, narrow
    Arrow-batched map over the broadcast centroid matrix. Similarity is
    ROUNDED to 6 before the argmax and `cells` is sorted desc, so ties
    resolve to the larger cell id in every engine (np.argmax takes the
    first max; the SQL oracle orders `csim DESC, cell DESC`)."""
    import numpy as np

    spark = df.sparkSession
    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    b = spark.sparkContext.broadcast((cells, C, cnrm))
    id_type = df.schema[id_col].dataType.simpleString()

    def assign(it):
        import pandas as pd

        cells_, C_, cnrm_ = b.value
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vnrm = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
            csims = np.round((V @ C_.T) / np.outer(vnrm, cnrm_), 6)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "v": pdf[vec_col],
                    "cell": cells_[np.argmax(csims, axis=1)],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, f"id {id_type}, v array<double>, cell long"
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    cent_every: int = 50,
    quantizer=None,
) -> DataFrame:
    """Semantic near-dup pairs (id_a, id_b, cos_sim), cosine >=
    threshold, compared only within a quantizer cell. `quantizer`: a
    built/loaded `IVFIndex` to reuse (its centroids are stored
    L2-normalized, norms == 1); default derives stride centroids from
    `df` itself. The per-cell kernel is one BLAS matmul per Arrow
    group — O(occupancy^2) per cell, cells in parallel."""
    import numpy as np

    if quantizer is not None:
        cells, C = quantizer.cells, quantizer.Cn
        cnrm = np.ones(len(cells), dtype=np.float64)
    else:
        cells, C, cnrm = stride_centroids(df, id_col, vec_col, cent_every)
    assigned = _assign_cells(df, id_col, vec_col, cells, C, cnrm)

    def cell_pairs(pdf):
        import pandas as pd

        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": ids.dtype, "id_b": ids.dtype, "cos_sim": "float64"})
        V = np.array(pdf["v"].to_numpy()[order].tolist(), dtype=np.float64)
        nrm = np.maximum(np.sqrt((V * V).sum(axis=1)), 1e-300)
        Csim = (V @ V.T) / np.outer(nrm, nrm)
        ia, ib = np.triu_indices(len(ids), k=1)
        sim = np.round(Csim[ia, ib], 6)
        m = sim >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia][m], "id_b": ids[ib][m], "cos_sim": sim[m]}
        )

    id_type = assigned.schema["id"].dataType.simpleString()
    return assigned.groupby("cell").applyInPandas(
        cell_pairs, f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def semantic_dedup_pairs_incremental(
    quantizer,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
) -> DataFrame:
    """Incremental semantic dedup for a NEW batch against a corpus
    already indexed in a persisted `IVFIndex`: assign the batch to
    cells with the index's quantizer, read ONLY those cells' lists
    (PartitionFilters-pruned; tombstoned ids excluded), and emit
    new-vs-existing AND new-vs-new pairs at cosine >= threshold —
    existing-vs-existing pairs were emitted when those docs were
    indexed, the same accumulation contract as NearDupIndex.add. Cost
    is O(batch x occupancy): growing the corpus never reprocesses it.

    The caller owns persistence: `quantizer.add(new_df)` afterwards
    makes the batch visible to FUTURE increments (add assigns with the
    same stored centroids, so cell placement agrees by construction).
    Pair values match `semantic_dedup_pairs(full, quantizer=...)`
    restricted to pairs touching the batch (contract-tested)."""
    import numpy as np

    cells, C = quantizer.cells, quantizer.Cn
    cnrm = np.ones(len(cells), dtype=np.float64)
    assigned_new = _assign_cells(new_df, id_col, vec_col, cells, C, cnrm)
    new_cells = [r["cell"] for r in assigned_new.select("cell").distinct().collect()]
    if not new_cells:
        spark = new_df.sparkSession
        return spark.createDataFrame(
            [], f"id_a {quantizer.id_type}, id_b {quantizer.id_type}, cos_sim double"
        )
    existing = (
        quantizer._guarded_lists(new_cells, None, None)
        .select(
            F.col("id"),
            F.col("embedding").alias("v"),
            F.col("cell"),
            F.lit(False).alias("is_new"),
        )
    )
    both = assigned_new.withColumn("is_new", F.lit(True)).unionByName(existing)
    id_type = quantizer.id_type

    def cell_pairs(pdf):
        import pandas as pd

        order = np.argsort(pdf["id"].to_numpy())
        pdf = pdf.iloc[order]
        ids = pdf["id"].to_numpy()
        new_mask = pdf["is_new"].to_numpy()
        if not new_mask.any() or len(ids) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": ids.dtype, "id_b": ids.dtype, "cos_sim": "float64"})
        V = np.array(pdf["v"].tolist(), dtype=np.float64)
        nrm = np.maximum(np.sqrt((V * V).sum(axis=1)), 1e-300)
        new_idx = np.nonzero(new_mask)[0]
        # new-vs-ALL in one rectangular matmul — O(batch x occupancy)
        S = np.round(
            (V[new_idx] @ V.T) / np.outer(nrm[new_idx], nrm), 6
        )
        ra, rb = np.nonzero(S >= threshold)
        ga = new_idx[ra]  # global row of the new-side member
        # compare IDS, not row positions: a replayed batch whose ids
        # are already in the lists pairs its own copy at sim 1.0
        # through two different rows — same-id pairs are never real
        keep = ids[ga] != ids[rb]
        ra_k, rb_k, ga_k = ra[keep], rb[keep], ga[keep]
        id_a = np.minimum(ids[ga_k], ids[rb_k])
        id_b = np.maximum(ids[ga_k], ids[rb_k])
        sim = S[ra_k, rb_k]
        out = pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos_sim": sim})
        # new-vs-new pairs surface twice (once from each side's row)
        return out.drop_duplicates(["id_a", "id_b"], ignore_index=True)

    return both.groupby("cell").applyInPandas(
        cell_pairs, f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def semantic_dedup_groups(pairs: DataFrame) -> DataFrame:
    """Pairs -> duplicate FAMILIES (doc_id, group_id, is_canonical) via
    global connected components. Every edge is within-cell by
    construction, so families are cell-bounded — near-dups that straddle
    a cell boundary are missed. That is THE SemDeDup approximation
    (recall traded for never running an all-pairs compare); CC's job
    here is collapsing transitive chains within a cell into one family
    with a deterministic canonical keeper."""
    from alma_memory_spark.operators.components import near_dup_groups

    return near_dup_groups(pairs, id_a="id_a", id_b="id_b")
