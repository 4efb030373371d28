"""Gate queries for the multimodal plumbing and the reranking stage —
the two SURVEY §2 rows that previously had only unit tests.

The multimodal gate runs the REAL mapInPandas decode stage (with its
deterministic fake codec — the pixel libraries are absent by declared
contract, operators/multimodal.py) over binary payloads built from the
documents table; the oracle re-derives the fake codec's hash math in
SQL, so the Arrow batching, schema, and resize planning are all
hash-checked, not just exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alma_memory_spark.functions import text as X
from alma_memory_spark.session import tiny_df as _tiny
from alma_memory_spark.plans.registry import _r6, _t, register
from alma_memory_spark.plans.text_queries import TFIDF_SEARCH_SQL

_HEXVAL = "(strpos('0123456789abcdef', {c}) - 1)"

#: 4x3 binary-PPM header, hex-encoded — shared by the Spark payload
#: builder and the oracle's unhex replay (the 'real:' gate rows)
_P6_HDR_HEX = b"P6\n4 3\n255\n".hex()


def _sha_byte(i: int) -> str:
    """SQL for byte i of sha256(text) as an integer (two hex chars)."""
    hi = _HEXVAL.format(c=f"substr(sha256(text), {2 * i + 1}, 1)")
    lo = _HEXVAL.format(c=f"substr(sha256(text), {2 * i + 2}, 1)")
    return f"({hi} * 16 + {lo})"


@register(
    "multimodal_decode_resize",
    f"""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           'image/fake' AS mime,
           CAST(64 + {_sha_byte(0)} % 192 AS INT) AS width,
           CAST(64 + {_sha_byte(1)} % 192 AS INT) AS height,
           round({_sha_byte(2)} / 255.0, 6) AS mean_luma,
           sha256(text) AS payload_sha256,
           round(least(1.0, 128.0 / greatest(64 + {_sha_byte(0)} % 192,
                                             64 + {_sha_byte(1)} % 192)), 6) AS scale,
           CAST(ceil((64 + {_sha_byte(0)} % 192)
                * least(1.0, 128.0 / greatest(64 + {_sha_byte(0)} % 192,
                                              64 + {_sha_byte(1)} % 192))) AS INT)
             AS target_w,
           CAST(ceil((64 + {_sha_byte(1)} % 192)
                * least(1.0, 128.0 / greatest(64 + {_sha_byte(0)} % 192,
                                              64 + {_sha_byte(1)} % 192))) AS INT)
             AS target_h,
           CAST(least(4, greatest(1, octet_length(encode(text)) // 10)) AS BIGINT)
             AS n_frames,
           CAST(least(10, octet_length(encode(text))) AS INT) AS frame0_len
    FROM documents
    UNION ALL
    -- 'real:' rows (r13): the REAL pure-numpy P6 decoder under the
    -- oracle. The payload is a 4x3 P6 whose 12 identical pixels derive
    -- from doc_id; the oracle replays the hex construction for the
    -- checksum (DuckDB sha256 is VARCHAR-only) and computes the
    -- Rec.601 luma analytically — so the gate hash-proves the decoder
    -- exactly inverts the encoder (header tokenizer, pixel parse,
    -- luma math).
    SELECT 'real:' || CAST(doc_id AS VARCHAR) AS media_id,
           'image/x-portable-pixmap' AS mime,
           4 AS width,
           3 AS height,
           round((0.299 * (doc_id % 256) + 0.587 * ((doc_id * 7) % 256)
                  + 0.114 * ((doc_id * 13) % 256)) / 255.0, 6) AS mean_luma,
           sha256('{_P6_HDR_HEX}'
                  || repeat(printf('%02x%02x%02x',
                                   doc_id % 256,
                                   (doc_id * 7) % 256,
                                   (doc_id * 13) % 256), 12)) AS payload_sha256,
           round(1.0, 6) AS scale,
           4 AS target_w,
           3 AS target_h,
           CAST(4 AS BIGINT) AS n_frames,
           10 AS frame0_len
    FROM documents
    """,
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + resize planning end-to-end: documents' text
    bytes stand in as binary payloads; the REAL Arrow-batched
    mapInPandas decode stage (operators/multimodal.py:60, deterministic
    fake codec — real Pillow kernel plugs into the same stage) extracts
    width/height/luma/sha256, then resize_stage computes the scale plan
    as pure column math. The oracle reproduces the codec's sha256-derived
    dims in SQL, hash-checking the batching plumbing and schema, which
    previously had only unit tests. The 'real:' rows (r13) run the
    REAL P6 decoder over synthesized payloads — see the inline note
    below."""
    from alma_memory_spark.operators.multimodal import (
        decode_image_features,
        resize_stage,
        sample_frames,
    )
    from alma_memory_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image/fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    feats = resize_stage(decode_image_features(media, fake=True))
    # frame-sampling plumbing: the REAL mapInPandas explode stage
    # (every_n=10 bytes/frame stand-in, max 4 frames); the oracle
    # re-derives frame count + first-frame byte length from text bytes
    frames = (
        sample_frames(media, every_n=10, max_frames=4)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max(
                F.when(F.col("frame_idx") == 0, F.octet_length("frame_payload"))
            ).alias("frame0_len"),
        )
    )
    out_cols = [
        "media_id",
        "mime",
        "width",
        "height",
        _r6(F.col("mean_luma")).alias("mean_luma"),
        "payload_sha256",
        _r6(F.col("scale")).alias("scale"),
        "target_w",
        "target_h",
        "n_frames",
        "frame0_len",
    ]
    fake_rows = feats.join(frames, "media_id").select(*out_cols)

    # 'real:' rows (r13) — the REAL pure-numpy P6 decoder
    # (decode_image_features(fake=False)) over payloads SYNTHESIZED as
    # column math: a 4x3 P6 whose 12 identical pixels derive from
    # doc_id (unhex of header-hex + repeated printf pixel hex). The
    # oracle derives the luma ANALYTICALLY from the pixel rule and
    # replays the hex construction for the checksum (DuckDB's sha256
    # is VARCHAR-only, so the checksum pins the HEX form; the binary
    # payload itself is pinned by dims + luma + frame lengths). The
    # gate therefore hash-proves decode(encode(pixels)) == pixels
    # through header tokenizer, binary parse, and Rec.601 luma.
    px_hex = F.concat(
        F.format_string("%02x", F.pmod(F.col("doc_id"), F.lit(256))),
        F.format_string("%02x", F.pmod(F.col("doc_id") * 7, F.lit(256))),
        F.format_string("%02x", F.pmod(F.col("doc_id") * 13, F.lit(256))),
    )
    from alma_memory_spark.plans.media_queries import _P6_HDR_HEX as _HH

    media_real = docs.select(
        F.concat(F.lit("real:"), F.col("doc_id").cast("string")).alias(
            "media_id"
        ),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.unhex(F.concat(F.lit(_HH), F.repeat(px_hex, 12))).alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    feats_real = resize_stage(
        decode_image_features(media_real, fake=False).drop("codec")
    )
    frames_real = (
        sample_frames(media_real, every_n=10, max_frames=4)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max(
                F.when(F.col("frame_idx") == 0, F.octet_length("frame_payload"))
            ).alias("frame0_len"),
        )
    )
    hex_full = F.concat(F.lit(_HH), F.repeat(px_hex, 12))
    hex_sha = docs.select(
        F.concat(F.lit("real:"), F.col("doc_id").cast("string")).alias(
            "media_id"
        ),
        F.sha2(hex_full, 256).alias("_hex_sha"),
    )
    real_rows = (
        feats_real.join(frames_real, "media_id")
        .join(hex_sha, "media_id")
        .withColumn("payload_sha256", F.col("_hex_sha"))
        .select(*out_cols)
    )
    return fake_rows.unionByName(real_rows)


@register(
    "rerank_overlap",
    f"""
    WITH cand AS (
      SELECT t.doc_id, t.tfidf_score,
             row_number() OVER (ORDER BY t.tfidf_score DESC, t.doc_id ASC) AS trank
      FROM ({TFIDF_SEARCH_SQL}) t
    ),
    ov AS (
      SELECT c.doc_id, c.trank,
             len(list_intersect(list_distinct({X.sql_ws_tokens('d.text')}),
                                ['fast','join','query','spark'])) AS overlap
      FROM cand c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY overlap DESC, trank ASC) AS INT)
             AS rerank_pos,
           doc_id,
           CAST(overlap AS INT) AS overlap
    FROM ov
    ORDER BY rerank_pos
    """,
    memo=True,
)
def rerank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reranking stage end-to-end (reference: alma/retrieval/
    reranking.py:16-128 — Reranker ABC over retrieved candidates): the
    TF-IDF top-20 collect to the driver and the REAL OverlapReranker
    re-orders them by query-token overlap, stable w.r.t. the incoming
    (score desc, doc_id asc) order — exactly the reference's
    post-retrieval rerank shape (distributed candidate stage, tiny
    driver-side model pass). The oracle reproduces the stable sort with
    a window over the same TF-IDF subquery."""
    from alma_memory_spark.operators.reranking import OverlapReranker
    from alma_memory_spark.plans.text_queries import _TFIDF_QUERY, tfidf_scores_df

    cand = (
        tfidf_scores_df(spark, sf_dir)
        .orderBy(F.desc("tfidf_score"), F.asc("doc_id"))
        .limit(20)
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [
        r.asDict()
        for r in cand.join(docs, "doc_id")
        .orderBy(F.desc("tfidf_score"), F.asc("doc_id"))
        .collect()
    ]
    reranked = OverlapReranker().rerank(_TFIDF_QUERY, rows, text_key="text")
    qtoks = set(_TFIDF_QUERY.lower().split())
    out = [
        (
            i + 1,
            r["doc_id"],
            len(qtoks & set(str(r["text"]).lower().split())),
        )
        for i, r in enumerate(reranked)
    ]
    return _tiny(spark, out, "rerank_pos int, doc_id bigint, overlap int")
