"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make hadoop_search_spark importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

_PKG_ZIP: str | None = None
_REGISTERED: set[str] = set()

import threading as _threading

_REG_LOCK = _threading.Lock()


def _ensure_workers(spark: SparkSession) -> None:
    """Ship the package to Python workers via addPyFile.

    The Porter pandas UDF pickles a reference to
    ``hadoop_search_spark.functions.porter``; workers unpickle it and
    must import the package themselves. When the driver process was
    launched outside the repo, the workers' sys.path has no repo
    entry — the driver-side path insert above does not propagate —
    so the package is zipped once and distributed."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        import tempfile
        import zipfile

        zp = os.path.join(tempfile.mkdtemp(), "hadoop_search_spark.zip")
        with zipfile.ZipFile(zp, "w") as z:
            pkg = os.path.join(_REPO_ROOT, "hadoop_search_spark")
            for dirpath, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, _REPO_ROOT))
        _PKG_ZIP = zp
    # register once per SparkContext, under a lock: addPyFile calls
    # importlib.invalidate_caches(), which is not thread-safe, and the
    # catalog's queries may run from concurrent threads; genuine
    # failures (stopped context, vanished zip) still surface here
    # rather than as a ModuleNotFoundError on a worker
    app = spark.sparkContext.applicationId
    with _REG_LOCK:
        if app not in _REGISTERED:
            spark.sparkContext.addPyFile(_PKG_ZIP)
            _REGISTERED.add(app)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    End-to-end search slice: build the TF-IDF positional inverted
    index over ``documents`` (tokenize → filter → stem → tf/df →
    score), evaluate a CNF boolean query through the join-DAG planner
    (phrase proximity + negation algebra included), rank by score,
    and return the top page joined back to the corpus.
    """
    from pyspark.sql import functions as F

    from hadoop_search_spark.operators.index import build_postings
    from hadoop_search_spark.plans.planner import SearchEngine

    from pyspark import StorageLevel

    _ensure_workers(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # DISK_ONLY persist: the query DAG references the postings frame
    # once per leaf term (plus the engine's one-time vocabulary
    # collect); without materialization the whole tokenize/stem/score
    # build would re-execute per reference (columnar memory cache is
    # pathologically slow for the positions array — see catalog)
    postings = build_postings(docs, num_docs=docs.count(), stem=True).persist(
        StorageLevel.DISK_ONLY
    )
    engine = SearchEngine(spark, postings, documents=docs)
    ranked = engine.search("(spark or streams) and window and not dup")
    return (
        ranked.limit(10)
        .join(docs.select("doc_id", "text", "lang", "source"), "doc_id")
        .select("doc_id", "score", "lang", "source", "text")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    from hadoop_search_spark import catalog

    def with_workers(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers(spark)
            return fn(spark, sf_dir)

        return run

    return {name: with_workers(fn) for name, fn in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    from hadoop_search_spark import catalog

    return catalog.oracle_sql()
