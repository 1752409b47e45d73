"""JSONL corpus connector: schema enforcement, corrupt-line
quarantine, deterministic content ids, round-trip."""

import pytest

from pyspark.sql import functions as F

from hadoop_search_spark.sources.jsonl import (
    read_jsonl_corpus,
    split_corrupt,
    with_content_ids,
    write_jsonl_corpus,
)


def test_jsonl_read_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1"}\n'
        'this line is not json at all\n'
        '{"doc_id": 2, "text": "second doc", "lang": "en", "source": "s1"}\n'
        '{"broken": \n'
    )
    docs = read_jsonl_corpus(spark, str(p))
    clean, quarantine = split_corrupt(docs)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert "not json" in bad[0] or "not json" in bad[1]


def test_jsonl_content_ids_deterministic(spark, tmp_path):
    p = tmp_path / "noid.jsonl"
    p.write_text(
        '{"text": "alpha beta", "lang": "en", "source": "s"}\n'
        '{"doc_id": 7, "text": "has id", "lang": "en", "source": "s"}\n'
    )
    clean, _ = split_corrupt(read_jsonl_corpus(spark, str(p)))
    once = {r.text: r.doc_id for r in with_content_ids(clean).collect()}
    again = {r.text: r.doc_id for r in with_content_ids(clean.repartition(4)).collect()}
    assert once == again            # id independent of partitioning
    assert once["has id"] == 7      # existing ids preserved
    assert once["alpha beta"] is not None and once["alpha beta"] > 0


def test_jsonl_content_ids_collapse_only_bit_identical_rows(spark, tmp_path):
    p = tmp_path / "dups.jsonl"
    p.write_text(
        # two bit-identical id-less rows -> one row, one synthesized id
        '{"text": "same doc", "lang": "en", "source": "s1"}\n'
        '{"text": "same doc", "lang": "en", "source": "s1"}\n'
        # same text, different source -> distinct ids, both kept
        '{"text": "same doc", "lang": "en", "source": "s2"}\n'
        # same text under two conflicting pre-existing ids -> both kept
        '{"doc_id": 10, "text": "claimed", "lang": "en", "source": "s"}\n'
        '{"doc_id": 11, "text": "claimed", "lang": "en", "source": "s"}\n'
    )
    clean, _ = split_corrupt(read_jsonl_corpus(spark, str(p)))
    rows = with_content_ids(clean).collect()
    by_source = {(r.text, r.source): r.doc_id for r in rows}
    assert len(rows) == 4  # only the bit-identical pair collapsed
    assert by_source[("same doc", "s1")] != by_source[("same doc", "s2")]
    assert {r.doc_id for r in rows if r.text == "claimed"} == {10, 11}
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == len(ids)  # unique-doc_id invariant holds


def test_jsonl_content_ids_injection_proof(spark):
    # field values crafted so a naive delimiter-joined hash payload
    # would collide across columns ("a\x00b","c") vs ("a","b\x00c"),
    # or confuse null with a null-marker string
    docs = spark.createDataFrame(
        [
            (None, "a\x00b", "c", "s"),
            (None, "a", "b\x00c", "s"),
            (None, None, "\x01", "s"),
            (None, "\x01", None, "s"),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    rows = with_content_ids(docs).collect()
    assert len(rows) == 4  # nothing falsely collapsed
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == 4  # all ids distinct


def test_jsonl_roundtrip_feeds_operators(spark, tmp_path):
    from hadoop_search_spark.operators.textstats import token_counts

    src = spark.createDataFrame(
        [(1, "the quick brown fox", "en", "s")],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    out = str(tmp_path / "out")
    write_jsonl_corpus(src, out)
    clean, quarantine = split_corrupt(read_jsonl_corpus(spark, out))
    assert quarantine.count() == 0
    back = clean.orderBy("doc_id").collect()
    assert [(r.doc_id, r.text) for r in back] == [(1, "the quick brown fox")]
    # the reloaded corpus drives the operator surface unchanged
    assert token_counts(clean).collect()[0].n_tokens == 4
