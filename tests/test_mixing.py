"""Data-mixing operators: PII scrubbing, deterministic stratified
sampling, per-source token-budget selection."""

from pyspark.sql import functions as F

from hadoop_search_spark.operators.mixing import (
    pii_scrub,
    stratified_sample,
    token_budget_mix,
)


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+spam@sub.example.org or bob@x.io thanks"),
            (2, "server 192.168.0.1 and 10.0.255.7 are up"),
            (3, "call +14155551234 or 415-555-1234 today"),
            (4, "clean text with no contact info at all"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].text_scrubbed == "mail me at <EMAIL> or <EMAIL> thanks"
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (2, 0, 0)
    assert out[2].text_scrubbed == "server <IP> and <IP> are up"
    assert out[2].n_ip == 2
    assert out[3].text_scrubbed == "call <PHONE> or <PHONE> today"
    assert out[3].n_phone == 2
    assert out[4].text_scrubbed == "clean text with no contact info at all"
    assert (out[4].n_email, out[4].n_ip, out[4].n_phone) == (0, 0, 0)


def test_pii_scrub_nested_counts_reconcile(spark):
    # an IP-like fragment inside an email must be counted once, as
    # email: the counts reconcile with the placeholder tokens
    docs = spark.createDataFrame(
        [(1, "mail bob@10.0.0.7.example.com and host 10.0.0.9 up")],
        "doc_id LONG, text STRING",
    )
    r = pii_scrub(docs).collect()[0]
    assert r.text_scrubbed == "mail <EMAIL> and host <IP> up"
    assert (r.n_email, r.n_ip, r.n_phone) == (1, 1, 0)


def test_stratified_sample_deterministic_and_monotone(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}", "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id LONG, text STRING, source STRING",
    )
    low = stratified_sample(docs, {"a": 0.3})
    ids_low = {r.doc_id for r in low.collect()}
    # deterministic across runs and partitionings
    assert {r.doc_id for r in stratified_sample(docs.repartition(7), {"a": 0.3}).collect()} == ids_low
    # raising the rate keeps a superset; stratum b (no rate) is dropped
    ids_high = {r.doc_id for r in stratified_sample(docs, {"a": 0.8, "b": 0.5}).collect()}
    assert ids_low <= ids_high
    assert all(i % 2 == 0 for i in ids_low)
    assert any(i % 2 == 1 for i in ids_high)
    # rate 1.0 keeps everything in the stratum
    assert len({r.doc_id for r in stratified_sample(docs, {"a": 1.0}).collect()}) == 100


def test_token_budget_mix_greedy_prefix(spark):
    # stratum "s": qualities rank doc 1 > 2 > 3 by construction
    # (more stopwords => higher stop_ratio => higher quality)
    docs = spark.createDataFrame(
        [
            (1, "the of and to in is it for on a", "s"),       # 10 tokens, top quality
            (2, "the of and to word word word word", "s"),      # 8 tokens
            (3, "word word word word word word", "s"),          # 6 tokens, lowest
            (4, "the of and unlimited stratum here", "u"),      # no budget
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    out = token_budget_mix(docs, {"s": 18})
    rows = {r.doc_id: r for r in out.collect()}
    # doc1 (cum 10) and doc2 (cum 18) fit; doc3 (cum 24) overflows
    assert set(rows) == {1, 2, 4}
    assert rows[1].cum_tokens == 10 and rows[2].cum_tokens == 18
    # unlimited stratum passes through regardless of budget dict
    assert rows[4].source == "u"
    # quality ordering drove the prefix
    assert rows[1].quality > rows[2].quality


def test_decontaminate_flags_overlapping_docs(spark):
    from hadoop_search_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id LONG, text STRING",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),   # shares 3-grams
            (2, "a completely different sentence entirely"),
            (3, "quick brown fox jumps over the lazy dog today"),  # shares many
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r.n_shared for r in decontaminate(docs, bench).collect()}
    assert 2 not in out
    assert out[1] >= 2 and out[3] > out[1]
    # threshold filters low-overlap docs
    strict = {r.doc_id for r in decontaminate(docs, bench, min_shared=5).collect()}
    assert strict == {3}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    from hadoop_search_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame([(9, "a b c d")], "doc_id LONG, text STRING")
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id LONG, text STRING")
    plan = (
        decontaminate(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # benchmark side broadcasts; the corpus is never shuffled on shingle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_pack_two_phase_matches_naive(spark):
    import random

    from hadoop_search_spark.operators.mixing import sequence_pack

    rng = random.Random(11)
    # sparse doc_ids so blocks are uneven; block=8 forces many blocks
    ids = sorted(rng.sample(range(1000), 60))
    rows = [(i, " ".join("w%d" % rng.randint(0, 5) for _ in range(rng.randint(0, 9)))) for i in ids]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    seq_len = 7
    cum = 0
    want = {}
    for i, text in rows:
        n = len([w for w in text.lower().split(" ") if w])
        start = cum
        cum += n
        want[i] = (n, start, start // seq_len, start % seq_len)

    got = {
        r.doc_id: (r.n_tokens, r.start_tok, r.seq_id, r.seq_off)
        for r in sequence_pack(df, seq_len=seq_len, block=8).collect()
    }
    assert got == want


def test_chunk_documents_covers_and_overlaps(spark):
    from hadoop_search_spark.operators.mixing import chunk_documents

    rows = [
        (1, " ".join("t%d" % i for i in range(10))),  # 10 toks: 2 chunks
        (2, "a b c"),                                 # short: 1 chunk
        (3, ""),                                      # empty: no row
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = chunk_documents(df, chunk_len=6, stride=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # 10 tokens, len 6 stride 4 -> chunks at 0 and 4; ceil((10-6)/4)=1
    assert [(r.chunk_id, r.start_tok, r.n_tokens) for r in c1] == [
        (0, 0, 6), (1, 4, 6)]
    assert c1[0].chunk_text.split(" ")[4:] == c1[1].chunk_text.split(" ")[:2]
    # last token is covered by the tail chunk
    assert c1[1].chunk_text.split(" ")[-1] == "t9"
    [c2] = by_doc[2]
    assert (c2.chunk_id, c2.start_tok, c2.n_tokens, c2.chunk_text) == (0, 0, 3, "a b c")

    # tail shorter than chunk_len: 9 tokens, len 4 stride 3 -> starts 0,3,6
    df2 = spark.createDataFrame([(9, " ".join("x%d" % i for i in range(9)))],
                                "doc_id LONG, text STRING")
    got = sorted(chunk_documents(df2, chunk_len=4, stride=3).collect(),
                 key=lambda r: r.chunk_id)
    assert [(r.start_tok, r.n_tokens) for r in got] == [(0, 4), (3, 4), (6, 3)]


def test_shuffle_shard_deterministic_partition_and_manifest(spark):
    import pytest

    from hadoop_search_spark.operators.mixing import shuffle_shard

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (1 + i % 5))) for i in range(300)],
        "doc_id LONG, text STRING",
    )
    out = shuffle_shard(docs, n_shards=4).collect()
    # every doc exactly once; (shard, pos) is a dense unique key
    assert len(out) == 300
    assert len({r.doc_id for r in out}) == 300
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.pos)
        assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
        # cum_tokens is the running sum in pos order; its last value
        # is the shard's manifest size
        running = 0
        for r in rows:
            running += r.n_tokens
            assert r.cum_tokens == running
    # the "shuffle": within-shard order is decorrelated from doc_id
    # ingest order in every shard
    assert all(
        [r.doc_id for r in rows] != sorted(r.doc_id for r in rows)
        for rows in by_shard.values()
    )
    # deterministic across partitionings (the df.sample failure mode)
    again = shuffle_shard(docs.repartition(13), n_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    with pytest.raises(ValueError):
        shuffle_shard(docs, n_shards=0)


def test_temperature_sample_upweights_small_sources(spark):
    """tau=0.5 semantics, verified against a pure-Python integer twin:
    a 16x larger source gets only a 4x larger expected share (sqrt),
    so the SMALL source's keep-rate (thresh) must be ~4x the large
    one's; thresholds must match the exact integer formula and the
    kept set must be the salted-hash prefix of each source."""
    import hashlib

    from hadoop_search_spark.operators.mixing import temperature_sample

    rows = [(i, "big", f"t{i}") for i in range(160)] + [
        (1000 + i, "small", f"s{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    out = temperature_sample(df, target_docs=50).collect()
    th = {r.source: r.thresh for r in out}
    # python twin of the integer arithmetic
    import math

    n = {"big": 160, "small": 10}
    w = {s: math.floor(math.sqrt(v) * 1_000_000) for s, v in n.items()}
    wt = sum(w.values())
    want_th = {s: (10_000 * 50 * w[s]) // (n[s] * wt) for s in n}
    assert th == {s: want_th[s] for s in th}
    # sqrt temperature: 16x the docs -> only 4x the expected share,
    # i.e. the small source's RATE is ~4x the big one's
    assert 3.5 < want_th["small"] / want_th["big"] < 4.5
    # kept set == salted-hash prefix, engine-independent
    def bucket(doc_id):
        return int(hashlib.md5(f"temp:{doc_id}".encode()).hexdigest()[:12], 16) % 10_000

    want_kept = {
        doc_id for doc_id, src, _ in rows if bucket(doc_id) < want_th[src]
    }
    assert {r.doc_id for r in out} == want_kept


def test_dsir_select_hand_computed(spark):
    """Four docs, two sources: the target slice (src0) over-uses 'x',
    so docs heavy in 'x' must score positive (keep) and docs heavy in
    corpus-common tokens negative. Weights verified against a
    pure-Python Decimal twin of the exact smoothed log-ratio."""
    import math
    from decimal import Decimal

    from hadoop_search_spark.operators.mixing import dsir_select

    rows = [
        (1, "src0", "x x y"),
        (2, "src0", "x y y"),
        (3, "src1", "y y z"),
        (4, "src1", "z z y"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    toks_all = [t for _, _, text in rows for t in text.split()]
    toks_t = [t for _, s, text in rows if s == "src0" for t in text.split()]
    n_s, n_t = len(toks_all), len(toks_t)
    v = len(set(toks_all))

    def w6(tok):
        cnt_t = toks_t.count(tok)
        cnt_s = toks_all.count(tok)
        val = math.log10(((cnt_t + 1) * (n_s + v)) / ((cnt_s + 1) * (n_t + v)))
        return Decimal(str(round(val, 6)))

    want = {}
    for doc_id, _, text in rows:
        ts = text.split()
        s = sum((w6(t) for t in ts), Decimal(0))
        want[doc_id] = (len(ts), float(s), s > 0)
    got = {
        r.doc_id: (r.n_tokens, r.score, r.keep)
        for r in dsir_select(df).collect()
    }
    assert got == want
    # the x-heavy target-like doc is kept, the z-heavy one is not
    assert got[1][2] is True and got[4][2] is False


def test_train_val_test_split_stable_and_salted(spark):
    import pytest

    from hadoop_search_spark.operators.mixing import (
        stratified_sample,
        train_val_test_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "a") for i in range(2000)],
        "doc_id LONG, text STRING, source STRING",
    )
    out = {r.doc_id: r.split for r in train_val_test_split(docs, 0.05, 0.05).collect()}
    # every doc assigned; proportions roughly honored
    assert len(out) == 2000
    n_val = sum(1 for s in out.values() if s == "val")
    n_test = sum(1 for s in out.values() if s == "test")
    assert 50 <= n_val <= 150 and 50 <= n_test <= 150
    # stability: a doc keeps its split when the corpus grows
    grown = docs.union(
        spark.createDataFrame(
            [(i, f"doc {i}", "a") for i in range(2000, 3000)],
            "doc_id LONG, text STRING, source STRING",
        )
    )
    out2 = {r.doc_id: r.split for r in train_val_test_split(grown, 0.05, 0.05).collect()}
    assert all(out2[d] == s for d, s in out.items())
    # the salt decorrelates the split from the unsalted sampling hash:
    # the val set must NOT be a subset of a same-rate stratified sample
    sampled = {r.doc_id for r in stratified_sample(docs, {"a": 0.05}).collect()}
    val = {d for d, s in out.items() if s == "val"}
    assert not val <= sampled
    with pytest.raises(ValueError):
        train_val_test_split(docs, 0.6, 0.5)


def test_leakage_safe_split_is_cluster_atomic(spark):
    """Planted near-dup chains (1-2-3, 10-11) plus isolated docs:
    every member of a component must share one split, the split must
    equal the per-key split hash of the component LABEL (the min id),
    and isolated docs keep their individual assignment."""
    from hadoop_search_spark.operators.mixing import (
        leakage_safe_split,
        train_val_test_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id LONG"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    out = {
        r.doc_id: (r.component, r.split)
        for r in leakage_safe_split(docs, pairs, 0.3, 0.3).collect()
    }
    assert len(out) == 7
    assert out[1][0] == out[2][0] == out[3][0] == 1
    assert out[10][0] == out[11][0] == 10
    assert out[20][0] == 20 and out[21][0] == 21
    # cluster-atomicity
    assert out[1][1] == out[2][1] == out[3][1]
    assert out[10][1] == out[11][1]
    # the split is exactly the doc-level hash applied to the label
    labels = spark.createDataFrame(
        [(c,) for c in {c for c, _ in out.values()}], "doc_id LONG"
    )
    ref = {
        r.doc_id: r.split
        for r in train_val_test_split(labels, 0.3, 0.3).collect()
    }
    assert all(ref[c] == s for c, s in out.values())


def test_embedding_quantize_int8_exact_and_bounded(spark):
    """Hand-checkable vectors: quantization is floor(x*127/amax) with
    symmetric clamp; extremes saturate to ±127; all-zero vectors are
    guarded; reconstruction error is bounded by one quantization step
    (amax/127)."""
    from hadoop_search_spark.operators.similarity import embedding_quantize_int8

    rows = [
        (0, [1.0, -1.0, 0.5, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [0.25, 0.1, -0.05, 0.2]),
    ]
    out = {
        r.vec_id: r
        for r in embedding_quantize_int8(
            spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
        ).collect()
    }
    r0 = out[0]
    assert r0.qvec == [127, -127, 63, 0] and r0.amax9 == 1.0
    assert r0.n_sat == 2 and r0.sum_qabs == 127 + 127 + 63
    r1 = out[1]
    assert r1.qvec == [0, 0, 0, 0] and r1.amax9 == 0.0 and r1.max_abs_err9 == 0.0
    r2 = out[2]
    assert r2.qvec == [127, 50, -26, 101]
    # one-step error bound for every vector with a nonzero scale
    for r in (r0, r2):
        assert r.max_abs_err9 <= round(r.amax9 / 127, 9) + 1e-9


def test_int8_topk_zero_vector_excluded(spark):
    """The int8 serving scan's qn=0 guard: an all-zero vector has no
    cosine (0/0 → NaN, whose ordering is engine-dependent, and no
    finite score pin sits below every negative-dot candidate in the
    dot-scaled s8 units) — it is EXCLUDED from the ranking; real
    candidates, including negative-dot ones, still rank."""
    from hadoop_search_spark.operators.similarity import int8_topk

    rows = [
        (0, [1.0, 0.5, -0.25, 0.75]),
        (1, [0.9, 0.55, -0.2, 0.7]),    # near query 0
        (2, [0.0, 0.0, 0.0, 0.0]),      # zero vector
        (3, [-1.0, -0.5, 0.25, -0.75]), # antipodal
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {r.vec_id: (r.s8, r.rn)
           for r in int8_topk(emb, [0], k=4).collect()}
    assert set(got) == {1, 3}  # the zero vector never appears
    assert got[1][1] == 1 and got[3][1] == 2
    assert got[3][0] < 0  # negative-dot candidate keeps its true rank
