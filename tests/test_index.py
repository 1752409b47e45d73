"""Tokenizer + index-build pipeline tests (SURVEY.md §2.2, §2.3)."""

import math

from pyspark.sql import functions as F

from hadoop_search_spark.functions.tokenize import tokenize_with_positions
from hadoop_search_spark.operators.index import (
    build_postings,
    doc_count,
    stop_words,
    word_counts,
)


def test_tokenize_positions_before_filter(spark):
    # positions count the raw token stream; numeric token occupies pos 2
    df = spark.createDataFrame([(1, "Alpha, 42 beta--beta (gamma)")], "doc_id LONG, text STRING")
    rows = tokenize_with_positions(df).orderBy("pos").collect()
    assert [(r.token, r.pos) for r in rows] == [
        ("alpha", 1),
        ("beta", 3),
        ("beta", 4),
        ("gamma", 5),
    ]


def test_tokenize_delimiter_runs(spark):
    df = spark.createDataFrame([(1, "a.b,,c   d[e]{f}/g|h\\i")], "doc_id LONG, text STRING")
    toks = [r.token for r in tokenize_with_positions(df).orderBy("pos").collect()]
    assert toks == list("abcdefghi")


def test_word_counts(spark):
    df = spark.createDataFrame(
        [(1, "cake cake vanilla"), (2, "cake 99 the")], "doc_id LONG, text STRING"
    )
    got = {r.word: r.cnt for r in word_counts(df).collect()}
    assert got == {"cake": 3, "vanilla": 1, "the": 1}  # numeric dropped


def test_stop_words_top_k_tie_break(spark):
    df = spark.createDataFrame(
        [(1, "aa aa bb bb cc dd")], "doc_id LONG, text STRING"
    )
    # counts: aa=2 bb=2 cc=1 dd=1; k=3 → ties by word desc: aa,bb then dd
    got = {r.word for r in stop_words(df, k=3).collect()}
    assert got == {"aa", "bb", "dd"}


def test_doc_count(documents):
    assert doc_count(documents) == 500


def test_build_postings_tfidf(spark):
    df = spark.createDataFrame(
        [
            (1, "cake cake vanilla"),
            (2, "cake chocolate"),
            (3, "chocolate chocolate chocolate"),
        ],
        "doc_id LONG, text STRING",
    )
    postings = build_postings(df, num_docs=3, stem=False)
    rows = {(r.term, r.doc_id): r for r in postings.collect()}

    # tf + positions
    assert rows[("cake", 1)].tf == 2 and rows[("cake", 1)].positions == [1, 2]
    assert rows[("vanilla", 1)].positions == [3]
    assert rows[("chocolate", 3)].tf == 3

    # score = (1 + log10(tf)) * ln(N/df)
    want = (1 + math.log10(2)) * math.log(3 / 2)  # cake: df=2
    assert abs(rows[("cake", 1)].tf - 2) < 1e-12
    assert abs(rows[("cake", 1)].score - want) < 1e-12
    # df=3 → idf = ln(1) = 0
    want_choc3 = (1 + math.log10(3)) * math.log(3 / 2)
    assert abs(rows[("chocolate", 3)].score - want_choc3) < 1e-12


def test_build_postings_stemming_and_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "the meetings cake"), (2, "the meeting")], "doc_id LONG, text STRING"
    )
    sw = spark.createDataFrame([("the",)], "word STRING")
    postings = build_postings(df, stopwords=sw, num_docs=2, stem=True)
    rows = {(r.term, r.doc_id): r for r in postings.collect()}
    assert ("the", 1) not in rows and ("the", 2) not in rows
    # meetings/meeting both stem to "meet"; positions pre-filter (the=1)
    assert rows[("meet", 1)].positions == [2]
    assert rows[("meet", 2)].positions == [2]
    assert ("cake", 1) in rows


def test_postings_on_fixture(documents):
    postings = build_postings(documents, num_docs=500, stem=False)
    # spot-check vs doc 0: "the fast key order sort table scan merge part
    # window small hash scan join order batch batch batch stream spark
    # window window dup"
    r = {(x.term): x for x in postings.filter(F.col("doc_id") == 0).collect()}
    assert r["scan"].tf == 2
    assert r["scan"].positions == [7, 13]
    assert r["batch"].tf == 3


def test_bm25_scores_hand_computed(spark):
    import math

    from hadoop_search_spark.operators.index import bm25_scores

    # two docs: dl=3 and dl=1, avgdl=2; 'a' in both (df=2), 'b' once
    stats = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 1), ("a", 2, 1)],
        "term STRING, doc_id LONG, tf LONG",
    )
    out = {(r.term, r.doc_id): r for r in bm25_scores(stats, num_docs=2).collect()}
    assert out[("a", 1)].dl == 3 and out[("a", 2)].dl == 1
    assert out[("a", 1)].df == 2 and out[("b", 1)].df == 1

    def ref(tf, df, dl, n=2, avgdl=2.0, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    assert abs(out[("a", 1)].bm25 - ref(2, 2, 3)) < 1e-12
    assert abs(out[("b", 1)].bm25 - ref(1, 1, 3)) < 1e-12
    assert abs(out[("a", 2)].bm25 - ref(1, 2, 1)) < 1e-12
    # rarer term outranks common term at equal tf/dl
    assert out[("b", 1)].bm25 > out[("a", 1)].bm25 * 0  # sanity: positive
    assert out[("b", 1)].bm25 > out[("a", 2)].bm25
