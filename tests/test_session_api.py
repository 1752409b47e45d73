"""SearchSession lifecycle tests: cache probe/write, page rendering."""

from hadoop_search_spark.operators.index import build_postings
from hadoop_search_spark.plans.cache import QueryCache
from hadoop_search_spark.plans.planner import SearchEngine
from hadoop_search_spark.plans.session_api import SearchSession


def test_search_session_cache_roundtrip(spark, documents, tmp_path):
    engine = SearchEngine(
        spark, build_postings(documents, num_docs=500, stem=True), documents=documents
    )
    cache = QueryCache(spark, str(tmp_path / "qc"))
    sess = SearchSession(engine, documents, cache=cache)

    sr1 = sess.search_result("spark and stream")
    assert sr1.count > 0
    assert cache.get("spark and stream") == sr1.serialize()

    # second call is a cache hit: same result even if the engine broke
    sess.engine = None
    sr2 = sess.search_result("SPARK and stream")  # lowercased key
    assert sr2.serialize() == sr1.serialize()


def test_search_session_page(spark, documents, tmp_path):
    engine = SearchEngine(
        spark, build_postings(documents, num_docs=500, stem=True), documents=documents
    )
    sess = SearchSession(engine, documents)
    total, rows = sess.page("spark and stream", 1)
    assert total > 10 and len(rows) == 10
    assert all("doc_id" in r and r["snippet"] for r in rows)
    # clamped page returns the tail page
    _, last = sess.page("spark and stream", 10**6)
    assert 0 < len(last) <= 10
