"""Meta-tests pinning the driver contract: every catalog entry must be
runnable and value-checkable, and the gate-ordering invariants that
decide which entries receive the per-round hard signal must hold."""

import re


def test_every_entry_has_an_oracle():
    from hadoop_search_spark import catalog

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    assert set(qs) == set(oracles), "queries() and oracle_sql() keys differ"
    missing = [n for n, sql in oracles.items() if not sql or not sql.strip()]
    assert not missing, f"entries without oracle SQL: {missing}"


def test_driver_front_fits_recording_cap():
    from hadoop_search_spark import catalog

    # the driver records only the FIRST 50 queries() rows
    assert len(catalog._DRIVER_FRONT) <= 50
    assert len(catalog._DRIVER_FRONT) == len(set(catalog._DRIVER_FRONT))
    unknown = set(catalog._DRIVER_FRONT) - set(catalog.CATALOG)
    assert not unknown, f"front list references unregistered entries: {unknown}"
    names = list(catalog.queries())
    assert names[: len(catalog._DRIVER_FRONT)] == catalog._DRIVER_FRONT
    assert len(names) == len(catalog.CATALOG)


def test_oracle_sql_is_duckdb_parsable():
    import duckdb

    from hadoop_search_spark import catalog
    from hadoop_search_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in catalog.oracle_sql().items():
        # PREPARE parses + binds without executing the query
        stmt = re.sub(r"\s+", " ", sql).strip().rstrip(";")
        con.execute(f"PREPARE _q AS {stmt}")
        con.execute("DEALLOCATE _q")
    con.close()


def test_no_scale_killers_in_any_catalog_plan(spark):
    """Every catalog entry's optimized physical plan must be free of
    the two universal scale-killers: CartesianProduct (unbounded pair
    blowup — the intended non-equi broadcasts compile to
    BroadcastNestedLoopJoin instead) and BatchEvalPython (row-at-a-time
    Python; vectorized Arrow UDFs show as ArrowEvalPython/MapInPandas
    and are allowed)."""
    from hadoop_search_spark import catalog

    sf_dir = "/root/testdata/sf0.001"
    bad: dict[str, list[str]] = {}
    for name, fn in catalog.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [k for k in ("CartesianProduct", "BatchEvalPython") if k in plan]
        if hits:
            bad[name] = hits
    assert not bad, f"scale-killer operators in plans: {bad}"
