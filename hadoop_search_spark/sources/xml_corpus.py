"""Wikipedia-dump XML ingestion — reference operators S1/S2/S4/P1
(SURVEY.md §2.1-2.2; `hadoop_wiki_search/util/XMLInputFormat.java`,
`util/WikipediaPageInputFormat.java`,
`code/corpus/CorpusSplitMapred.java`).

The reference hand-rolls a split-boundary-safe streaming XML record
reader over (possibly gzipped) dumps, binds ``<page>…</page>`` blocks
to a WikipediaPage, and writes two MapFile corpora (clean text +
HTML). Spark 4 ships a native XML source that does the record
splitting, schema binding, and codec handling (gzip transparently) —
so the entire ~350 LoC of S1+S2 reduces to
``spark.read.format("xml").option("rowTag", "page")``.

The wiki-markup → clean-text step lives in the reference's external
cloud9 dependency; here it is a small Catalyst regex chain (strip
templates, links, refs, markup) — same shape, documented
approximation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


PAGE_SCHEMA = "id BIGINT, title STRING, revision STRUCT<text: STRING>"


def read_wiki_xml(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2: dump file(s) → one row per ``<page>`` element.

    Handles gzipped dumps transparently (the XML source inherits
    Hadoop codec handling, the Spark form of
    `XMLInputFormat.java:137-153`). The explicit schema keeps
    ``revision.text`` a string — real dumps escape markup inside
    ``<text>``, and schema inference would otherwise explode embedded
    entities into nested structs."""
    return (
        spark.read.format("xml")
        .option("rowTag", "page")
        .schema(PAGE_SCHEMA)
        .load(path)
    )


# Non-content block elements whose *contents* must be dropped, not
# just the tags (rendered text never contains them).
_BLOCK_TAGS = "ref|nowiki|math|gallery|source|syntaxhighlight|pre|code|timeline|score"
# Bounded iteration depth for nested constructs ({{t|{{u}}}}, a table
# inside a table, a link inside an image caption). Each pass removes
# the innermost level; real wiki text virtually never nests deeper.
_NEST_DEPTH = 4


def strip_wiki_markup(text: Column) -> Column:
    """Wiki markup → clean text, the role of the reference's external
    cloud9 ``WikipediaPage.getContent()``
    (`util/WikipediaPageInputFormat.java:134`), re-expressed from the
    published MediaWiki syntax as a Catalyst regex chain (whole-stage
    codegen, no UDF):

    * comments, ``<ref>``/``<math>``/``<nowiki>``/… blocks dropped
      with their contents; other tags stripped to their text;
    * templates ``{{…}}`` and tables ``{|…|}`` removed innermost-out
      (bounded nesting depth — see ``_NEST_DEPTH``);
    * ``[[ns:target]]`` namespace/interwiki links removed, piped links
      keep their label, image captions survive as text;
    * external links keep their label, bare ones are dropped;
    * headings/lists/rules/bold-italics reduce to their text; magic
      words dropped; common HTML entities unescaped.

    Remaining fidelity gap vs a full parser: template *expansion*
    (a transcluded infobox contributes no text here) and exotic parser
    functions — both are also absent from the reference's cleaned
    corpus, which drops template output too.
    """
    t = F.coalesce(text.cast("string"), F.lit(""))
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # self-closing block tags FIRST — the paired-block pattern below
    # must never treat '<ref …/>' as an opening tag (it would then
    # consume all text through the next real '</ref>')
    t = F.regexp_replace(t, rf"(?i)<(?:{_BLOCK_TAGS})\b[^>]*/>", " ")
    t = F.regexp_replace(t, rf"(?si)<({_BLOCK_TAGS})\b[^>]*?>.*?</\1\s*>", " ")
    for _ in range(_NEST_DEPTH):
        t = F.regexp_replace(t, r"(?s)\{\|(?:(?!\{\|).)*?\|\}", " ")  # tables
        t = F.regexp_replace(t, r"\{\{[^{}]*\}\}", " ")  # templates
    for _ in range(2):  # links: second pass unwraps captions' leftovers
        # [[Namespace:target]] (File/Image/Category/interwiki) — drop
        t = F.regexp_replace(t, r"\[\[[^\[\]|]*:[^\[\]|]*\]\]", " ")
        # [[target|…|label]] — keep the last (rendered) segment
        t = F.regexp_replace(t, r"\[\[[^\[\]]*\|([^\[\]|]*)\]\]", r"$1")
        # [[target]] — keep the target text
        t = F.regexp_replace(t, r"\[\[([^\[\]|]*)\]\]", r"$1")
    t = F.regexp_replace(t, r"\[[a-z]+://[^\s\]]*\s+([^\]]*)\]", r"$1")
    t = F.regexp_replace(t, r"\[[a-z]+://[^\s\]]*\]", " ")
    t = F.regexp_replace(t, r"(?m)^=+\s*(.*?)\s*=+\s*$", r"$1")  # headings
    t = F.regexp_replace(t, r"<[^>]+>", " ")  # remaining tags
    t = F.regexp_replace(t, r"'{2,}", "")  # bold/italic quotes
    t = F.regexp_replace(t, r"(?m)^[\*#:;]+\s*", "")  # list markers
    t = F.regexp_replace(t, r"(?m)^-{4,}\s*$", " ")  # horizontal rules
    t = F.regexp_replace(t, r"__[A-Z]+__", " ")  # magic words
    t = F.regexp_replace(t, "&nbsp;", " ")
    t = F.regexp_replace(t, "&lt;", "<")
    t = F.regexp_replace(t, "&gt;", ">")
    t = F.regexp_replace(t, "&quot;", "\"")
    t = F.regexp_replace(t, "&amp;", "&")
    return F.regexp_replace(t, r"\s+", " ")


def html_escape(text: Column) -> Column:
    """The display/HTML corpus escapes angle brackets — inverse of the
    fetch-side unescape (`util/CorpusFetcher.java:255`, P10)."""
    t = F.coalesce(text.cast("string"), F.lit(""))
    return F.regexp_replace(F.regexp_replace(t, "<", "&#60;"), ">", "&#62;")


def corpus_split(pages: DataFrame, corpus_type: str = "string") -> DataFrame:
    """P1: project pages to ``(doc_id, title, content)`` choosing clean
    text vs HTML by ``corpus_type`` (`CorpusSplitMapred.java:38-50`);
    rows with null id/text are dropped (the reference NPE-catches).

    The reference stores ``title\\ncontent`` as one blob
    (`util/CorpusFetcher.java:106-107`); we keep title a typed column.
    """
    raw_text = F.col("revision.text").cast("string")
    content = (
        html_escape(raw_text) if corpus_type == "html" else strip_wiki_markup(raw_text)
    )
    # drop null id / null revision text BEFORE cleaning — the cleaners
    # coalesce null to "", so a post-projection dropna would never fire
    return (
        pages.filter(F.col("id").isNotNull() & raw_text.isNotNull())
        .select(
            F.col("id").cast("bigint").alias("doc_id"),
            F.col("title").cast("string").alias("title"),
            content.alias("content"),
        )
    )


def write_corpus(
    corpus: DataFrame,
    path: str,
    num_partitions: int | None = None,
    fmt: str = "parquet",
) -> None:
    """S4: publish sorted by doc_id so point fetches (S8) prune row
    groups — the parquet form of the MapFile's key index
    (`CorpusSplitMapred.java:99-103`). ``fmt`` may also be ``"orc"``:
    both columnar formats carry min/max statistics per stripe/row
    group, so the sorted layout gives the same pushed-down point-fetch
    pruning (ORC is the drop-in for Hive-ecosystem consumers)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported corpus format {fmt!r}")
    df = corpus
    if num_partitions:
        df = df.repartitionByRange(num_partitions, "doc_id")
    else:
        df = df.orderBy("doc_id")
    writer = df.sortWithinPartitions("doc_id").write.mode("overwrite")
    getattr(writer, fmt)(path)


def read_corpus(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a published corpus back (parquet or orc)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported corpus format {fmt!r}")
    return getattr(spark.read, fmt)(path)
