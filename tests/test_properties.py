"""Property-based tests (hypothesis) for the MapReduce semantic contracts:

- word count == a trivial Python reference on arbitrary text (tokenize +
  isalnum filter, SURVEY.md O8/O15);
- KV-line parsing drops exactly the malformed lines the reference reducer
  drops (wrong arity / non-integer values, reference
  src/app/reducer.py:11-12,21-24);
- partial+final aggregation invariance (quirk Q3): summing per key is
  independent of how rows are partitioned — verified by comparing different
  partition counts.

Examples are kept small and few: each runs a real Spark job.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sdc_mapreduce_spark import mapreduce as mr

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# words over a tiny alphabet plus punctuation-bearing tokens that the
# isalnum filter must drop
token = st.one_of(
    st.text(alphabet="ab1", min_size=1, max_size=3),
    st.sampled_from(["x!", "a-b", ":", "..", "Ж"]),
)
line = st.lists(token, min_size=0, max_size=6).map(" ".join)


def _ref_wordcount(lines: list[str]) -> dict[str, int]:
    c: Counter[str] = Counter()
    for ln in lines:
        for tok in ln.split():
            if tok.isalnum():
                c[tok] += 1
    return dict(c)


@SETTINGS
@given(lines=st.lists(line, min_size=1, max_size=8))
def test_wordcount_matches_python_reference(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    got = {r["word"]: r["cnt"] for r in mr.word_count(df).collect()}
    assert got == _ref_wordcount(lines)


kv_line = st.one_of(
    st.tuples(
        st.text(alphabet="kxy", min_size=1, max_size=3),
        st.integers(min_value=-(2**31), max_value=2**31),
    ).map(lambda t: f"{t[0]} {t[1]}"),
    st.sampled_from(["only_key", "a b c", "k notanint", "", "  ", "k 1.5"]),
)


def _ref_parse(lines: list[str]) -> list[tuple[str, int]]:
    out = []
    for ln in lines:
        parts = ln.split()
        if len(parts) != 2:
            continue
        try:
            out.append((parts[0], int(parts[1])))
        except ValueError:
            continue
    return sorted(out)


@SETTINGS
@given(lines=st.lists(kv_line, min_size=1, max_size=10))
def test_parse_kv_matches_reference_drop_rules(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    got = sorted(
        (r["key"], r["value"]) for r in mr.parse_kv_lines(df).collect()
    )
    assert got == _ref_parse(lines)


@SETTINGS
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2,
        max_size=30,
    ),
    parts=st.sampled_from([1, 3, 7]),
)
def test_dsum_is_partition_invariant(spark, vals, parts):
    """The engine's core cross-engine determinism claim: a decimal-
    accumulated double sum (queries/base.py dsum) yields the IDENTICAL
    double regardless of partitioning / accumulation order — raw double
    sums do not. Every oracle-checked money aggregate rests on this."""
    from sdc_mapreduce_spark.queries.base import dsum

    df1 = spark.createDataFrame([(v,) for v in vals], "x double").coalesce(1)
    dfp = spark.createDataFrame([(v,) for v in vals], "x double").repartition(parts)
    a = df1.agg(dsum("x", "s")).collect()[0]["s"]
    b = dfp.agg(dsum("x", "s")).collect()[0]["s"]
    assert a == b  # bitwise equality, not approx


@SETTINGS
@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=20,
    ),
    parts=st.sampled_from([1, 2, 5]),
)
def test_group_reduce_partition_invariance(spark, pairs, parts):
    """Quirk Q3: the grouped sum must not depend on physical partitioning
    (the reference's partial-per-file then final-merge contract)."""
    df = spark.createDataFrame(pairs, "key string, value long").repartition(parts)
    got = {
        r["key"]: r["value"] for r in mr.group_reduce_sum(df).collect()
    }
    expected: dict[str, int] = {}
    for k, v in pairs:
        expected[k] = expected.get(k, 0) + v
    assert got == expected


@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    chunk=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_with_stride_equal_chunk_partitions_exactly(spark, n_tokens, chunk):
    """stride == chunk_size must PARTITION the token stream: chunk sizes sum
    to n_tokens, every chunk except the last is full, and concatenating the
    per-chunk fingerprint inputs reproduces the document."""
    from sdc_mapreduce_spark.functions.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        (r["chunk_id"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_size=chunk, stride=chunk).collect()
    )
    sizes = [n for _, n in rows]
    assert sum(sizes) == n_tokens
    assert all(s == chunk for s in sizes[:-1])
    assert 1 <= sizes[-1] <= chunk
    assert [cid for cid, _ in rows] == list(range(len(rows)))


@given(
    sizes=st.lists(st.integers(min_value=5, max_value=400), min_size=2, max_size=4),
    raw_weights=st.lists(
        st.integers(min_value=1, max_value=20), min_size=2, max_size=4
    ),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mix_plan_fractions_bounded_and_mix_achieved(spark, sizes, raw_weights):
    """For any group sizes and normalized targets: every keep fraction lies
    in [0,1], at least one group keeps (essentially) everything — the
    binding group — and the planned kept counts reproduce the target mix to
    within integer rounding."""
    from sdc_mapreduce_spark.functions.splits import mix_rebalance_plan

    k = min(len(sizes), len(raw_weights))
    sizes, raw_weights = sizes[:k], raw_weights[:k]
    groups = [f"g{i}" for i in range(k)]
    total_w = sum(raw_weights)
    targets = {g: w / total_w for g, w in zip(groups, raw_weights)}
    # make shares sum to exactly 1.0 despite float division
    targets[groups[-1]] = 1.0 - sum(targets[g] for g in groups[:-1])

    rows = [
        (i, g)
        for g, n in zip(groups, sizes)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [(i, g) for i, (_, g) in enumerate(rows)], "doc_id long, domain string"
    )
    plan = {r["domain"]: r for r in mix_rebalance_plan(df, "domain", targets).collect()}
    fracs = [plan[g]["keep_fraction"] for g in groups]
    assert all(0.0 <= f <= 1.0 for f in fracs), fracs
    assert max(fracs) > 1.0 - 1e-9, "no binding group kept everything"
    kept_total = sum(plan[g]["n_kept"] for g in groups)
    if kept_total:
        for g in groups:
            achieved = plan[g]["n_kept"] / kept_total
            assert abs(achieved - targets[g]) <= (k + 1) / kept_total + 1e-9, (
                g, achieved, targets[g],
            )


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # user id (hot: few users)
            st.integers(min_value=-2880, max_value=2880),  # minutes around midnight
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sessionize_chunked_equals_plain_on_random_streams(spark, events):
    """Property: the chunk-merge sessionization is result-identical to the
    plain single-window plan on arbitrary streams — including streams built
    to straddle day boundaries (offsets span ±2 days around midnight) and
    duplicate timestamps (event_id tie-break)."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sdc_mapreduce_spark.operators.skew import sessionize_chunked

    midnight = dt.datetime(2024, 6, 2, 0, 0)
    rows = [
        (i, user, midnight + dt.timedelta(minutes=minutes))
        for i, (user, minutes) in enumerate(events)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")

    w_order = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w_order)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL '30' MINUTE")), 1
    ).otherwise(0)
    plain = (
        ev.withColumn("__new", is_new)
        .withColumn(
            "session_id",
            F.sum("__new").over(
                w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )

    def key(df):
        return sorted(
            (r.user_id, r.session_id, r.n_events, r.session_start, r.session_end)
            for r in df.collect()
        )

    assert key(sessionize_chunked(ev)) == key(plain)


@SETTINGS
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True
    ),
    n_shards=st.integers(min_value=1, max_value=8),
    parts=st.integers(min_value=1, max_value=5),
)
def test_corpus_shuffle_permutation_properties(spark, keys, n_shards, parts):
    """For arbitrary key sets, the shuffle is a true permutation: every key
    exactly once, shard ids in range, per-shard positions exactly
    0..len(shard)-1, and the assignment is invariant to input partitioning."""
    from sdc_mapreduce_spark.functions.splits import corpus_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "doc_id int")
    out = corpus_shuffle(df, key="doc_id", n_shards=n_shards).collect()
    assert {r["doc_id"] for r in out} == set(keys)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    again = corpus_shuffle(df.repartition(parts), key="doc_id", n_shards=n_shards)
    assert sorted(map(tuple, out)) == sorted(map(tuple, again.collect()))


@SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_quantize_int8_properties(spark, vecs):
    """For arbitrary finite vectors: q bounded in [-127,127], dequantized
    values within scale/2 of the original, zero vectors -> zeros."""
    from sdc_mapreduce_spark.functions.simsearch import quantize_int8

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for i, v in rows:
        q, scale = list(got[i]["q"]), got[i]["scale"]
        assert len(q) == len(v)
        assert all(-127 <= qi <= 127 for qi in q)
        if scale == 0.0:
            assert all(qi == 0 for qi in q)
        else:
            for qi, xi in zip(q, v):
                assert abs(qi * scale - xi) <= scale / 2 + 1e-9 * max(1.0, abs(xi))


@SETTINGS
@given(
    corpus=st.lists(
        st.lists(st.text(alphabet="abcd", min_size=1, max_size=3),
                 min_size=1, max_size=6).map(" ".join),
        min_size=1, max_size=8, unique=True,
    ),
    batch=st.lists(
        st.lists(st.text(alphabet="abcd", min_size=1, max_size=3),
                 min_size=1, max_size=6).map(" ".join),
        min_size=1, max_size=6,
    ),
)
def test_bloom_prefilter_never_false_negative(spark, corpus, batch):
    from sdc_mapreduce_spark.functions import dedup as D

    existing = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    probe = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)], ["doc_id", "text"]
    )
    # tiny bitmap on purpose: false positives abound, false negatives never
    out = D.bloom_prefilter_dedup(probe, existing, m_bits=64, k=3).collect()
    assert len(out) == len(batch)
    for r in out:
        if r["is_dup"]:
            assert r["bloom_maybe"], r


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from([f"w{i}" for i in range(30)]),
                 min_size=1, max_size=9).map(" ".join),
        min_size=1, max_size=8,
    )
)
def test_boilerplate_strip_is_identity_below_the_cap(spark, docs):
    import hashlib

    from sdc_mapreduce_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    # max_df above the corpus size: nothing is boilerplate, so every doc
    # keeps all segments and the cleaned body re-joins to the original
    out = {r["doc_id"]: r for r in
           T.boilerplate_strip(df, window=2, max_df=len(docs) + 1).collect()}
    for i, t in enumerate(docs):
        r = out[i]
        assert r["n_kept"] == r["n_segments"]
        assert r["cleaned_fp"] == hashlib.md5(t.encode()).hexdigest()


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_exact_substring_dedup_conservation(spark, docs):
    """On arbitrary corpora: every duplicated chunk content survives exactly
    once corpus-wide; token totals are conserved (kept + dropped chunks'
    tokens = all tokens); docs without duplicated chunks are untouched."""
    from collections import Counter

    from sdc_mapreduce_spark.functions.dedup import exact_substring_dedup

    cs = 3
    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in exact_substring_dedup(df, chunk_size=cs).collect()}

    # python replica of the chunk inventory
    chunk_occurrences: Counter[str] = Counter()
    doc_chunks: dict[int, list[tuple[str, int]]] = {}
    for i, text in rows:
        toks = text.split()
        chunks = [
            (" ".join(toks[j * cs : (j + 1) * cs]), len(toks[j * cs : (j + 1) * cs]))
            for j in range((len(toks) + cs - 1) // cs)
        ]
        doc_chunks[i] = chunks
        for content, _ in chunks:
            chunk_occurrences[content] += 1

    for i, text in rows:
        toks = text.split()
        r = got[i]
        assert r["n_chunks"] == (len(toks) + cs - 1) // cs
        dropped_tokens = sum(n for _, n in doc_chunks[i]) - r["n_tokens_kept"]
        assert dropped_tokens >= 0
        if all(chunk_occurrences[c] == 1 for c, _ in doc_chunks[i]):
            assert r["n_dropped"] == 0 and r["n_tokens_kept"] == len(toks)
    # each duplicated content survives exactly once: total kept occurrences
    # of content c across docs == 1 if dup else 1
    total_kept_chunks = sum(
        r["n_chunks"] - r["n_dropped"] for r in got.values()
    )
    assert total_kept_chunks == len(chunk_occurrences)


@SETTINGS
@given(
    li=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 60), st.integers(0, 10)),
        min_size=0,
        max_size=8,
    ),
    ri=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 60), st.integers(0, 10)),
        min_size=0,
        max_size=8,
    ),
)
def test_interval_overlap_random_equals_naive(spark, li, ri):
    """Random keyed intervals (minute-scale starts/lengths vs a 10-minute
    bucket span): the bucketed allocation join == the naive quadratic join,
    exactly once per pair."""
    import datetime as dt

    from sdc_mapreduce_spark.operators.relational import interval_overlap_join

    t0 = dt.datetime(2024, 3, 1)
    mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    left = [
        (k % 3, i, mk(s), mk(s + d)) for i, (s, d, k) in enumerate(li)
    ]
    right = [
        (k % 3, 100 + i, mk(s), mk(s + d)) for i, (s, d, k) in enumerate(ri)
    ]
    if not left or not right:
        return
    ldf = spark.createDataFrame(left, ["k", "lid", "ls", "le"])
    rdf = spark.createDataFrame(right, ["k", "rid", "rs", "re"])
    rows = interval_overlap_join(
        ldf, rdf, "k", "ls", "le", "rs", "re", span_seconds=600
    ).collect()
    got = sorted((r["lid"], r["rid"]) for r in rows)
    naive = sorted(
        (l[1], r[1])
        for l in left
        for r in right
        if l[0] == r[0] and l[2] <= r[3] and r[2] <= l[3]
    )
    assert got == naive


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
def test_bigram_lm_matches_python_replica_on_random_corpora(spark, docs):
    """The add-one-smoothed bigram model's milli-nat sums equal an exact
    Python replay on arbitrary corpora (min_count=2 pruning included)."""
    import math
    from collections import Counter

    from sdc_mapreduce_spark.functions.text import bigram_lm_scores

    toks = {i: t.split() for i, t in enumerate(docs)}
    uni = Counter(w for t in toks.values() for w in t)
    bi = Counter((a, b) for t in toks.values() for a, b in zip(t, t[1:]))
    V = len(uni)

    def nll(a, b):
        c12 = bi[(a, b)] if bi[(a, b)] >= 2 else 0
        p = (c12 + 1) / (uni[a] + V)
        return math.floor(-1000.0 * math.log(p) + 0.5)

    expect = {
        i: sum(nll(a, b) for a, b in zip(t, t[1:])) for i, t in toks.items()
    }
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r["doc_id"]: r["nll_milli"] for r in bigram_lm_scores(df).collect()}
    assert got == expect


@SETTINGS
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    k=st.integers(2, 6),
)
def test_equidepth_histogram_random_multisets(spark, vals, k):
    """Random multisets (heavy ties included): counts sum to n, depths are
    balanced to within 1, and bucket ranges are monotone."""
    from sdc_mapreduce_spark.operators.relational import equidepth_histogram

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = sorted(
        equidepth_histogram(df, "v", "id", n_buckets=k, num_partitions=4).collect(),
        key=lambda r: r["bucket"],
    )
    assert sum(r["n_rows"] for r in got) == len(vals)
    depths = [r["n_rows"] for r in got]
    assert max(depths) - min(depths) <= 1
    for a, b in zip(got, got[1:]):
        assert a["hi"] <= b["lo"]


@SETTINGS
@given(
    n=st.integers(5, 40),
    parts=st.integers(1, 6),
    k=st.integers(1, 10),
)
def test_weighted_sample_layout_invariant(spark, n, parts, k):
    """The drawn sample is identical under any partition layout — the
    content-hash property that per-partition RNG sampling lacks."""
    from sdc_mapreduce_spark.functions.splits import weighted_sample

    rows = [(i, 1 + (i * 7) % 13) for i in range(n)]
    df1 = spark.createDataFrame(rows, ["doc_id", "w"]).repartition(parts)
    df2 = spark.createDataFrame(list(reversed(rows)), ["doc_id", "w"]).coalesce(1)
    s1 = sorted(r["doc_id"] for r in weighted_sample(df1, k, "w").collect())
    s2 = sorted(r["doc_id"] for r in weighted_sample(df2, k, "w").collect())
    assert s1 == s2 and len(s1) == min(k, n)


# ---- round-6 analytics operators ----------------------------------------

_name = st.text(alphabet="ab ", min_size=1, max_size=8).map(lambda s: s.strip() or "a")


@given(names=st.lists(_name, min_size=1, max_size=12))
@SETTINGS
def test_fuzzy_name_pairs_equals_bruteforce_property(spark, names):
    """For arbitrary tiny name multisets: the blocked fuzzy join equals the
    brute-force within-block sweep (same block key, length bound, verify)."""
    from sdc_mapreduce_spark.functions.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(list(enumerate(names)), ["id", "nm"])
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_name_pairs(df, "nm", max_dist=2).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(names))
    want = {}
    for i, a in enumerate(uniq):
        for b in uniq[i + 1 :]:
            if a.lower().split(" ")[0] != b.lower().split(" ")[0]:
                continue
            if abs(len(a) - len(b)) > 2:
                continue
            d = lev(a, b)
            if d <= 2:
                want[(a, b)] = d
    assert got == want


@given(
    states=st.lists(st.sampled_from("ABC"), min_size=1, max_size=10),
    nparts=st.sampled_from([1, 3, 7]),
)
@SETTINGS
def test_scd2_run_collapse_equals_itertools_property(spark, states, nparts):
    """For an arbitrary single-entity state sequence under any partition
    layout: SCD2 versions equal itertools.groupby run collapse."""
    import itertools

    from sdc_mapreduce_spark.operators.relational import scd2_history

    rows = [(i, ts(0, i), 1, s) for i, s in enumerate(states)]
    df = spark.createDataFrame(
        rows, ["event_id", "t", "user_id", "state"]
    ).repartition(nparts)
    out = sorted(
        ((r["version"], r["state"]) for r in
         scd2_history(df, "user_id", "state", "t", "event_id").collect())
    )
    want = [(i + 1, k) for i, (k, _) in enumerate(itertools.groupby(states))]
    assert out == want


def ts(minute: int, second: int = 0):
    import datetime as dt

    return dt.datetime(2024, 1, 1, 10, minute, second)


def _ref_bpe_learn(word_freqs: dict[str, int], k: int):
    """Pure-Python Sennrich learn_bpe (same as tests/test_text.py's
    reference): overlap-counted stats, greedy left-to-right merge with
    skip, (count desc, left asc, right asc) tie-break."""
    state = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


# short words over a 3-letter alphabet: tiny alphabets maximize repeated
# pairs, overlapping runs ('aaa'), and frequency ties — the hard paths of
# the run-parity window and the deterministic tie-break
bpe_word = st.text(alphabet="abc", min_size=1, max_size=6)


@SETTINGS
@given(words=st.lists(bpe_word, min_size=1, max_size=12))
def test_bpe_merges_matches_reference_on_random_corpora(spark, words):
    from collections import Counter as _Counter

    from sdc_mapreduce_spark.functions.text import bpe_merges

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(df, k=3).orderBy("merge_rank").collect()
    ]
    expect = _ref_bpe_learn(dict(_Counter(words)), 3)
    assert got == expect, f"words={words}\n got={got}\nwant={expect}"


def _ref_bpe_batched(word_freqs: dict[str, int], passes: int, m: int):
    """Pure-Python batched reference (same pinned semantics as
    tests/test_text.py): per pass, rank pairs (count desc, left, right)
    with count >= 2, greedily scan the 4*m over-fetched pool keeping
    candidates disjoint from the already-kept set until m are kept
    (skip-and-continue past conflicts, VERDICT r10 ask #2), apply all
    simultaneously."""
    from sdc_mapreduce_spark.functions.text import _BPE_CANDIDATE_OVERFETCH

    state = {w: list(w) for w in word_freqs}
    merges = []
    for pass_id in range(1, passes + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        ranked = sorted(
            ((c, a, b) for (a, b), c in counts.items() if c >= 2),
            key=lambda t: (-t[0], t[1], t[2]),
        )[: m * _BPE_CANDIDATE_OVERFETCH]
        if not ranked:
            break
        sel, used = [], set()
        for c, a, b in ranked:
            if len(sel) >= m:
                break  # batch full
            if a in used or b in used:
                continue  # skip-and-continue: conflict skips, scan goes on
            sel.append((a, b, c))
            used.update((a, b))
        for a, b, c in sel:
            merges.append((len(merges) + 1, pass_id, a, b, c))
        lefts = {a: (a, b) for a, b, _ in sel}
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                pair = lefts.get(syms[i])
                if pair and i + 1 < len(syms) and syms[i + 1] == pair[1]:
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


@SETTINGS
@given(words=st.lists(bpe_word, min_size=1, max_size=12))
def test_bpe_merges_batched_matches_reference_on_random_corpora(spark, words):
    """The distributed batched learner (greedy skip-and-continue disjoint
    selection + one simultaneous run-parity apply per pass) must reproduce
    the pure-Python batched reference on random tiny-alphabet corpora —
    the same hard paths (overlapping runs, ties, conflict-degraded
    batches) as the sequential property test."""
    from collections import Counter as _Counter

    from sdc_mapreduce_spark.functions.text import bpe_merges_batched

    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [
        (r["merge_rank"], r["pass_id"], r["left_sym"], r["right_sym"],
         r["pair_count"])
        for r in bpe_merges_batched(df, passes=2, m=3)
        .orderBy("merge_rank")
        .collect()
    ]
    expect = _ref_bpe_batched(dict(_Counter(words)), 2, 3)
    assert got == expect, f"words={words}\n got={got}\nwant={expect}"


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=2), min_size=1, max_size=60
    ),
    parts=st.integers(min_value=1, max_value=7),
    m=st.integers(min_value=3, max_value=12),
)
@SETTINGS
def test_heavy_hitters_twopass_always_exact(spark, words, parts, m):
    """heavy_hitters_twopass must equal the full aggregation for ANY
    token stream, partitioning, and summary size >= k — whether the
    pigeonhole verification certifies the fast path or the valve falls
    back, the answer is exact (functions.text.heavy_hitters_twopass)."""
    from collections import Counter

    from sdc_mapreduce_spark.functions.text import heavy_hitters_twopass

    k = 3
    if m < k:
        m = k
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    ).repartition(parts)
    got = [
        (r["token"], r["cnt"], r["rank"])
        for r in heavy_hitters_twopass(df, k=k, summary_size=m).collect()
    ]
    counts = Counter(words)
    want = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:k]
    assert got == [(tok, cnt, i + 1) for i, (tok, cnt) in enumerate(want)]


# --- AllPairs prefix-filter completeness lemma (r11) ------------------------
#
# The Spark operator (functions/dedup.py::jaccard_prefix_pairs) indexes only
# each set's first p = |A| - ceil(t*|A|) + 1 elements under a shared total
# order and claims no pair with J(A,B) >= t can be missed. The Spark-side
# parity tests exercise fixture corpora; this pins the LEMMA itself over
# arbitrary set systems, orders, and thresholds — pure Python, no Spark.


@given(
    sets=st.lists(
        st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    ),
    threshold=st.floats(min_value=0.05, max_value=1.0),
    order_seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_lemma_never_misses_a_qualifying_pair(
    sets, threshold, order_seed
):
    import math
    import random

    universe = sorted(set().union(*sets))
    rng = random.Random(order_seed)
    rank = {v: i for i, v in enumerate(rng.sample(universe, len(universe)))}

    def prefix(s):
        ordered = sorted(s, key=rank.__getitem__)
        p = len(s) - math.ceil(threshold * len(s) - 1e-9) + 1
        return set(ordered[: max(1, p)])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                # the candidate join must surface (i, j): their PREFIXES
                # under the shared order must intersect
                assert prefix(a) & prefix(b), (
                    a, b, jac, threshold, prefix(a), prefix(b),
                )
