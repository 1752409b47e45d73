"""XML corpus ingestion tests: S1/S2 record reading (plain + gzip),
P1 projection, S4 sorted write + S8 point fetch round trip."""

import gzip
import os

import pytest

from pyspark.sql import functions as F

from hadoop_search_spark.sources.xml_corpus import (
    corpus_split,
    read_wiki_xml,
    strip_wiki_markup,
    write_corpus,
)

WIKI_XML = """<mediawiki>
  <page>
    <title>Alpha</title>
    <id>1</id>
    <revision><text>'''Alpha''' is a [[Greek letter|letter]] {{Infobox x}} &lt;b&gt;used&lt;/b&gt; widely.</text></revision>
  </page>
  <page>
    <title>Beta</title>
    <id>2</id>
    <revision><text>Beta follows [[alpha]].&lt;ref&gt;cite&lt;/ref&gt;</text></revision>
  </page>
  <page>
    <title>NoText</title>
    <id>3</id>
    <revision><text></text></revision>
  </page>
</mediawiki>
"""


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("wiki")
    p = d / "dump.xml"
    p.write_text(WIKI_XML)
    return str(p)


def test_read_pages(spark, xml_path):
    pages = read_wiki_xml(spark, xml_path)
    assert pages.count() == 3
    assert {r.title for r in pages.select("title").collect()} == {"Alpha", "Beta", "NoText"}


def test_read_gzipped(spark, xml_path, tmp_path):
    gz = str(tmp_path / "dump.xml.gz")
    with open(xml_path, "rb") as fin, gzip.open(gz, "wb") as fout:
        fout.write(fin.read())
    assert read_wiki_xml(spark, gz).count() == 3


def test_corpus_split_clean(spark, xml_path):
    pages = read_wiki_xml(spark, xml_path)
    corpus = corpus_split(pages, "string")
    rows = {r.doc_id: r for r in corpus.collect()}
    assert rows[1].title == "Alpha"
    text = rows[1].content
    assert "letter" in text  # link unwrapped to display text
    assert "[[" not in text and "{{" not in text and "'''" not in text
    # XML source already unescaped entities; tag-strip removed <b>
    assert "<b>" not in text and "used" in text
    assert "alpha" in rows[2].content and "cite" not in rows[2].content


def test_corpus_split_html(spark, xml_path):
    pages = read_wiki_xml(spark, xml_path)
    rows = {r.doc_id: r for r in corpus_split(pages, "html").collect()}
    # angle brackets escaped for the display corpus
    assert "&#60;b&#62;" in rows[1].content


def test_write_and_point_fetch(spark, xml_path, tmp_path):
    out = str(tmp_path / "corpus")
    pages = read_wiki_xml(spark, xml_path)
    write_corpus(corpus_split(pages, "string"), out)
    reloaded = spark.read.parquet(out)
    got = reloaded.filter(F.col("doc_id") == 2).collect()
    assert len(got) == 1 and got[0].title == "Beta"
    assert os.path.isdir(out)


def test_strip_wiki_markup_expr(spark):
    df = spark.createDataFrame(
        [("a {{tmp|x}} [[target|label]] ''it'' <i>q</i> b",)], "t STRING"
    )
    got = df.select(strip_wiki_markup(F.col("t")).alias("s")).collect()[0].s
    assert got.strip() == "a label it q b"


@pytest.mark.parametrize(
    "markup,expect",
    [
        # nested templates drop innermost-out
        ("x {{outer|{{inner|1}}|2}} y", "x y"),
        # ref blocks lose their CONTENT, other tags only their markup
        ("a<ref name=n>cited text</ref> b <b>bold</b>", "a b bold"),
        ("a<ref name=n/> b", "a b"),
        # self-closing ref must not swallow text up to a later paired ref
        ("a<ref name=n/> middle <ref>cite</ref> b", "a middle b"),
        # comments (multi-line) vanish
        ("a <!-- hidden\ntext --> b", "a b"),
        # tables, including a nested one
        ("pre {| class=x\n|cell\n{|\n|inner\n|}\n|} post", "pre post"),
        # namespace links drop; piped keep label; plain keep target
        ("see [[Category:Things]] [[fr:Chose]] ok", "see ok"),
        ("a [[Page|the label]] and [[Other]] b", "a the label and Other b"),
        # image with caption containing a nested link: caption survives
        ("x [[File:pic.jpg|thumb|a [[cap|tion]] here]] y", "x a tion here y"),
        # external links
        ("q [http://e.com label text] r [http://bare.com] s", "q label text r s"),
        # headings, lists, rules, magic words
        ("== Head ==\n* item one\n# item two\n----\n__TOC__ tail", "Head item one item two tail"),
        # math/nowiki/code contents dropped
        ("a <math>\\frac{1}{2}</math> b <nowiki>[[x]]</nowiki> c", "a b c"),
        # entities
        ("x &amp;&nbsp;&lt;tag&gt; &quot;v&quot; y", 'x & <tag> "v" y'),
        # bold/italics
        ("'''''both''''' '''bold''' ''it''", "both bold it"),
    ],
)
def test_strip_wiki_markup_cases(spark, markup, expect):
    df = spark.createDataFrame([(markup,)], "t STRING")
    got = df.select(strip_wiki_markup(F.col("t")).alias("s")).collect()[0].s
    assert got.strip() == expect


def test_corpus_orc_roundtrip_and_point_fetch(spark, documents, tmp_path):
    from hadoop_search_spark.plans.results import fetch_docs
    from hadoop_search_spark.sources.xml_corpus import read_corpus, write_corpus

    p = str(tmp_path / "corpus_orc")
    write_corpus(documents.select("doc_id", "text"), p, fmt="orc")
    back = read_corpus(spark, p, fmt="orc")
    assert back.count() == documents.count()
    fetched = fetch_docs(back, [3, 7])
    assert {r.doc_id for r in fetched.collect()} == {3, 7}
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan

    with pytest.raises(ValueError):
        write_corpus(documents, p, fmt="avro")
