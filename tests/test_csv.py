"""CSV corpus connector: schema-enforced parse, corrupt quarantine,
content ids, write/read roundtrip."""

from hadoop_search_spark.sources.csv_corpus import (
    read_csv_corpus,
    split_corrupt,
    with_content_ids,
    write_csv_corpus,
)


def test_csv_read_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "1,hello world,en,web\n"
        "not-a-long,oops,en,web\n"  # doc_id fails the LONG cast
        "\n"  # blank line: ignored
        '2,"quoted, with comma",en,books\n'
    )
    docs = read_csv_corpus(spark, str(p))
    clean, quarantine = split_corrupt(docs)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].text == "quoted, with comma"
    assert rows[1].lang == "en" and rows[1].source == "web"
    bad = [r.raw_line for r in quarantine.collect()]
    assert bad == ["not-a-long,oops,en,web"]


def test_csv_content_ids_and_roundtrip(spark, tmp_path):
    p = tmp_path / "noid.csv"
    p.write_text(",alpha beta,en,web\n,gamma delta,fr,web\n")
    clean, q = split_corrupt(read_csv_corpus(spark, str(p)))
    assert q.count() == 0
    withids = with_content_ids(clean)
    ids1 = sorted(r.doc_id for r in withids.collect())
    ids2 = sorted(r.doc_id for r in with_content_ids(clean).collect())
    assert ids1 == ids2 and len(ids1) == 2 and all(i is not None for i in ids1)

    out = tmp_path / "out"
    write_csv_corpus(withids, str(out))
    back, backq = split_corrupt(read_csv_corpus(spark, str(out)))
    assert backq.count() == 0
    assert sorted(r.doc_id for r in back.collect()) == ids1
    texts = {r.text for r in back.collect()}
    assert texts == {"alpha beta", "gamma delta"}


def test_csv_newlines_escaped_on_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(7, "line one\nline two", "en", "web")],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )
    out = tmp_path / "nl"
    write_csv_corpus(df, str(out))
    back, q = split_corrupt(read_csv_corpus(spark, str(out)))
    assert q.count() == 0
    [r] = back.collect()
    assert r.text == "line one\\nline two"  # escaped, audit-visible
