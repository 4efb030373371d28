"""Property-based tests (hypothesis): invariants the unit goldens can't
cover — upsert idempotence, hash-embedding determinism/normalization,
compression bounds, MinHash containment, merge_states algebra."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from alma_memory_spark.embedding import hash_embed
from alma_memory_spark.functions.text import MINHASH_A, MINHASH_B, MINHASH_PRIME
from alma_memory_spark.operators.compression import compress_text
from alma_memory_spark.operators.workflow import merge_states
from alma_memory_spark.slice import sanitize_query

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")),
    min_size=0,
    max_size=400,
)


@given(TEXT)
@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
def test_hash_embed_unit_norm_and_deterministic(text):
    v1 = hash_embed(text, 32)
    v2 = hash_embed(text, 32)
    assert v1 == v2
    norm = math.sqrt(sum(x * x for x in v1))
    assert abs(norm - 1.0) < 1e-9


@given(TEXT, TEXT)
@settings(max_examples=100)
def test_hash_embed_token_order_invariant(a, b):
    """Bag-of-tokens: token order must not change the embedding."""
    joined = f"{a} {b}"
    reversed_ = f"{b} {a}"
    assert hash_embed(joined, 32) == hash_embed(reversed_, 32)


@given(st.text(min_size=0, max_size=2000))
@settings(max_examples=100)
def test_compress_never_grows(content):
    r = compress_text(content, "medium")
    assert r.compressed_length <= max(r.original_length, 0) or r.summary == content
    assert r.original_length == len(content)
    assert len(r.key_facts) <= 5 and len(r.constraints) <= 3


@given(st.text(min_size=0, max_size=1000))
@settings(max_examples=100)
def test_sanitize_query_bounded(q):
    out = sanitize_query(q)
    assert len(out) <= max(len(q.strip()), 250)
    if len(q.strip()) <= 200:
        assert out == q.strip()


@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "n"]),
            st.integers(min_value=-100, max_value=100),
            max_size=3,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=100)
def test_merge_states_sum_algebra(states):
    out = merge_states(states, {"a": "sum", "b": "max", "n": "min"})
    for k, fn in [("a", sum), ("b", max), ("n", min)]:
        vals = [s[k] for s in states if k in s]
        if vals:
            assert out[k] == fn(vals)
        else:
            assert k not in out


@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=30, unique=True))
@settings(max_examples=50)
def test_minhash_permutation_range(tokens):
    """Driver-side mirror of the minhash permutation: values stay in
    [0, p) and the signature of a superset is <= elementwise (more
    tokens can only lower minima)."""
    import hashlib

    def h32(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    def sig(toks):
        return [
            min(((MINHASH_A[j] * h32(t) + MINHASH_B[j]) % MINHASH_PRIME) for t in toks)
            for j in range(8)
        ]

    s_all = sig(tokens)
    assert all(0 <= v < MINHASH_PRIME for v in s_all)
    subset = tokens[: max(1, len(tokens) // 2)]
    s_sub = sig(subset)
    assert all(a <= b for a, b in zip(s_all, s_sub))


@given(
    st.floats(min_value=0.0, max_value=400.0),
    st.integers(min_value=0, max_value=10_000),
    st.one_of(st.none(), st.floats(min_value=0.0, max_value=1.0)),
    st.integers(min_value=0, max_value=20),
    st.sampled_from([0.0, 7.0, 30.0, 365.0]),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_strength_decay_matches_reference_formula(
    age_days, access, importance, reinf, half_life
):
    """Column expression == the reference MemoryStrength math
    (decay.py:76-126) for arbitrary inputs, including NULL importance
    coalescing to the 0.5 dataclass default and the 0.4/0.3 bonus caps."""
    import math
    from datetime import datetime, timedelta, timezone

    from pyspark.sql import functions as F

    from alma_memory_spark.functions.temporal import strength_decay
    from alma_memory_spark.session import get_spark

    spark = get_spark(cpus=4)
    now = datetime(2024, 6, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("m", now - timedelta(days=age_days), importance)],
        "id string, last_accessed timestamp, imp double",
    )
    out = df.select(
        strength_decay(
            "last_accessed", now, half_life, 1.0, access, F.col("imp"), reinf
        ).alias("s")
    ).collect()[0]["s"]

    base = math.exp(-0.693 * age_days / half_life) if half_life > 0 else 1.0
    access_bonus = min(0.4, 0.1 * math.log1p(access))
    reinf_bonus = min(0.3, 0.1 * reinf)
    factor = 0.5 + 0.5 * (0.5 if importance is None else importance)
    expected = min(1.0, max(0.0, (base + access_bonus + reinf_bonus) * factor))
    assert abs(out - expected) < 1e-9


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
@settings(max_examples=60, deadline=None)
def test_rolling_shingle_hashes_match_python_mirror(s):
    """The vectorized Rabin-Karp kernel must equal a from-scratch
    per-shingle polynomial evaluation on arbitrary printable input —
    the same arithmetic the DuckDB oracle performs via ord() terms."""
    import re

    from alma_memory_spark.functions.text import (
        WINNOW_BASE,
        WINNOW_K,
        WINNOW_MOD,
        rolling_shingle_hashes,
    )

    norm = re.sub(r"\s+", " ", s.strip().lower()) + " " * WINNOW_K
    data = norm.encode("ascii")
    got = rolling_shingle_hashes(data).tolist()
    want = [
        sum(
            data[i + j] * WINNOW_BASE ** (WINNOW_K - 1 - j)
            for j in range(WINNOW_K)
        )
        % WINNOW_MOD
        for i in range(len(data) - WINNOW_K + 1)
    ]
    assert got == want


def test_bpe_token_count_java_matches_python_on_random_strings(spark):
    """The JVM regex count must equal Python re on the same pattern —
    the pattern is restricted to the Java/RE2/Python common subset, so
    any divergence is a portability bug. 300 seeded random printable
    strings (plus whitespace-heavy edge cases) through ONE Spark job,
    compared against Python findall counts."""
    import random
    import re
    import string

    from alma_memory_spark.functions.text import BPE_TOKEN_RE, bpe_token_count

    rng = random.Random(20260814)
    alphabet = string.printable  # includes \t\n\r\x0b\x0c
    cases = ["", " ", "\t\n", "a\x0bb", " x", "x "] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i int, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_token_count("t").alias("n")).collect()
    }
    for i, s in enumerate(cases):
        want = len(re.findall(BPE_TOKEN_RE, s))
        assert got[i] == want, (i, repr(s), got[i], want)


def test_text_index_bucket_hash_cross_engine_on_random_strings(spark):
    """The Python driver and the JVM MUST bucket every term identically
    (md5-hex-prefix mod n) — a single divergent bucket silently loses
    postings at query time. 400 seeded random unicode-ish strings
    through ONE Spark job vs the Python twin, at two bucket counts."""
    import random
    import string

    from pyspark.sql import functions as F

    from alma_memory_spark.operators.text_index import _bucket_col, _bucket_py

    rng = random.Random(20260814)
    alphabet = string.printable + "äöüßμλ中文字"
    cases = ["", "a", " ", "μtoken"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40)))
        for _ in range(400)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i int, t string")
    for n_buckets in (16, 64):
        got = {
            r["i"]: r["b"]
            for r in df.select(
                "i", _bucket_col(F.col("t"), n_buckets).alias("b")
            ).collect()
        }
        for i, s in enumerate(cases):
            assert got[i] == _bucket_py(s, n_buckets), (repr(s), n_buckets)


def test_is_similar_symmetric_and_reflexive(spark):
    """is_similar (confidence engine) is symmetric (every branch —
    exact, substring-either-way, Jaccard — is) and reflexive for
    non-empty strings; empty/null never match (engine.py:474-500)."""
    import random

    from pyspark.sql import functions as F

    from alma_memory_spark.operators.confidence import is_similar_expr

    rng = random.Random(7)
    words = "alpha beta gamma delta spark join query fast slow test".split()
    pairs = [("", ""), ("x", ""), ("", "x")] + [
        (
            " ".join(rng.choices(words, k=rng.randrange(1, 6))),
            " ".join(rng.choices(words, k=rng.randrange(1, 6))),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a",
        "b",
        is_similar_expr(F.col("a"), F.col("b")).alias("ab"),
        is_similar_expr(F.col("b"), F.col("a")).alias("ba"),
        is_similar_expr(F.col("a"), F.col("a")).alias("aa"),
    ).collect()
    for r in rows:
        assert r["ab"] == r["ba"], (r["a"], r["b"])
        assert r["aa"] == (len(r["a"].strip()) > 0), r["a"]


@given(st.lists(TEXT, min_size=0, max_size=30))
@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow])
def test_cached_embedder_transparent_and_bounded(texts):
    """The cache wrapper must be semantically invisible (identical
    vectors to the inner provider, any order, any duplication) and its
    size must never exceed max_size."""
    from alma_memory_spark.embedding import CachedEmbedder, HashEmbedder

    ce = CachedEmbedder(HashEmbedder(), max_size=8)
    plain = HashEmbedder()
    assert ce.encode_batch(texts) == plain.encode_batch(texts)
    # second pass (mixed singles) still identical
    for t in texts[:5]:
        assert ce.encode(t) == plain.encode(t)
    assert ce.get_stats()["size"] <= 8


def test_hash_bucket_matches_python_mirror_on_random_keys(spark):
    """The sampling keep decision must be reproducible OUTSIDE Spark
    (audit scripts, other engines): hash_bucket == the documented
    Python mirror int(md5(key || ':' || salt)[:8], 16) % 1e6 on seeded
    random keys and salts, one Spark job."""
    import hashlib
    import random
    import string

    from alma_memory_spark.operators.sampling import hash_bucket

    rng = random.Random(20260814)
    alphabet = string.ascii_letters + string.digits + "_-."
    cases = [("", ""), ("0", "s"), ("доc", "")] + [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40))),
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 8))),
        )
        for _ in range(200)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, k, s) for i, (k, s) in enumerate(cases)], "i int, k string, s string"
    )
    # per-row salt via expression (hash_bucket takes a literal salt:
    # evaluate one row-set per distinct salt is wasteful — instead
    # replicate its formula with a column salt)
    from alma_memory_spark.functions.text import hash32

    got = {
        r["i"]: r["b"]
        for r in df.select(
            "i",
            F.pmod(
                hash32(F.concat(F.col("k"), F.lit(":"), F.col("s"))),
                F.lit(1_000_000),
            ).alias("b"),
        ).collect()
    }
    for i, (k, s) in enumerate(cases):
        want = (
            int(hashlib.md5(f"{k}:{s}".encode()).hexdigest()[:8], 16)
            % 1_000_000
        )
        assert got[i] == want, (i, k, s, got[i], want)
    # and the operator's own column (literal salt) agrees on a sample
    df2 = spark.createDataFrame(
        [(k,) for k, _ in cases[:50]], "k string"
    ).select("k", hash_bucket("k", "xyz").alias("b"))
    for r in df2.collect():
        want = (
            int(hashlib.md5(f"{r['k']}:xyz".encode()).hexdigest()[:8], 16)
            % 1_000_000
        )
        assert r["b"] == want


def test_packing_invariants_on_random_corpora(spark):
    """Randomized packing invariants, one Spark job per corpus: offsets
    stay inside the budget; within a shard (in key order) pack_id is
    nondecreasing and (pack_id * budget + pack_offset) equals the
    running token sum exactly — i.e. the concatenated stream is cut
    with no gaps and no overlaps."""
    import random

    from alma_memory_spark.operators.packing import pack_documents
    from alma_memory_spark.session import tiny_df

    rng = random.Random(7)
    for trial in range(3):
        budget = rng.choice([128, 512, 1000])
        rows = [
            (i, rng.randrange(0, budget * 2)) for i in range(rng.randrange(5, 120))
        ]
        out = pack_documents(
            tiny_df(spark, rows, "doc_id long, n_tokens long"),
            budget=budget, token_col="n_tokens", key_col="doc_id",
            n_shards=rng.choice([1, 3]),
        ).collect()
        by_shard: dict = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        toks = dict(rows)
        for shard_rows in by_shard.values():
            shard_rows.sort(key=lambda r: r["doc_id"])
            cum = 0
            prev_pack = 0
            for r in shard_rows:
                assert 0 <= r["pack_offset"] < budget, r
                assert r["pack_id"] * budget + r["pack_offset"] == cum, r
                assert r["pack_id"] >= prev_pack
                prev_pack = r["pack_id"]
                cum += toks[r["doc_id"]]


@given(st.text(min_size=0, max_size=300))
@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
def test_bpe_encode_invariants_on_arbitrary_text(text):
    """BPE merge-loop invariants hypothesis can reach and goldens
    can't: concatenating the encoded symbols of every pre-token
    reproduces the pre-token exactly (no character gained or lost by
    any merge sequence), the symbol count never exceeds the character
    count, and encoding is deterministic."""
    import re

    from alma_memory_spark.functions.bpe import bpe_encode, load_merge_ranks
    from alma_memory_spark.functions.text import BPE_TOKEN_RE

    ranks = load_merge_ranks()
    for pt in re.findall(BPE_TOKEN_RE, text):
        syms = bpe_encode(pt, ranks)
        assert "".join(syms) == pt
        assert 1 <= len(syms) <= len(pt)
        assert bpe_encode(pt, ranks) == syms
