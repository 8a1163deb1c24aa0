"""Driver-contract smoke: entry() runs, every oracle key has a query, and a
representative query subset matches DuckDB at sf0.001 (full sweep lives in
scripts/verify_entry.py)."""

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_contract_shape():
    qs = E.queries()
    os = E.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) >= 30 and len(os) >= 25


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    from anything2rdf_spark.schemas import TRIPLE_COLS

    assert df.columns == TRIPLE_COLS


@pytest.mark.parametrize(
    "name",
    ["kg_turn_triples", "kg_sessionize", "kg_connected_components", "sim_cosine_topk"],
)
def test_query_matches_oracle(spark, name):
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sdf = E.queries()[name](spark, SF)
    res = con.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def cell(v):
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                return f"{v:.6f}"
            return str(v)

        return sorted(tuple(cell(r[i]) for i in order) for r in rows)

    assert norm(srows, scols) == norm(orows, ocols)


def test_all_query_schemas_are_scalar(spark):
    """Driver-canonicalizer safety: the harness's pandas canonicalizer
    factorizes columns for sorting and cannot hash list/struct/map cells
    (the round-3 kg_label_set_dedup red row) — no queries() entry may return
    a non-scalar column. Also pins the registry inside the harness's
    observed 50-row recording window."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    qs = E.queries()
    assert len(qs) <= 50
    for name, fn in qs.items():
        df = fn(spark, SF)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
                name,
                f.name,
                f.dataType.simpleString(),
            )


def test_driver_queries_are_distinct_callables():
    """Every queries() entry must be a DISTINCT underlying function: a
    module-level def that shadows an earlier same-named def silently points
    two query keys at one implementation (caught live in round 3 when the
    kg_schema_split helper shadowed kg_multivalue_split's)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    underlying = {}
    for name, fn in qs.items():
        # _pq wraps the real query fn in a closure; unwrap via closure cells
        cells = [
            c.cell_contents
            for c in (fn.__closure__ or [])
            if callable(getattr(c, "cell_contents", None))
        ]
        target = cells[0] if cells else fn
        underlying.setdefault(id(target), []).append(name)
    dupes = {tuple(v) for v in underlying.values() if len(v) > 1}
    assert not dupes, f"queries sharing one implementation: {dupes}"

    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for a query that does not exist"
