"""Oracle tests for the date kernel against a straight-line pure-Python
re-implementation of the reference semantics (Anything2RDF.scala:54-77)."""

import calendar

from pyspark.sql import functions as F

from anything2rdf_spark.functions import dates


def py_make_date_time(year: str, month: str, day: str) -> tuple[str, str]:
    """Pure-Python oracle mirroring Anything2RDF.scala:54-77."""
    if year.startswith("-"):
        ayear = "-" + "0" * (5 - len(year)) + year[1:]
    else:
        ayear = "0" * (4 - len(year)) + year

    def wild(v):
        return v == "" or v == "99" or v in ("0", "00")

    bmonth = "01" if wild(month) else month.zfill(2)
    emonth = "12" if wild(month) else month.zfill(2)
    bdate = "01" if wild(day) else day.zfill(2)
    if wild(day):
        edate = str(calendar.monthrange(int(year), int(emonth))[1])
    else:
        edate = day.zfill(2)
    return (f"{ayear}-{bmonth}-{bdate}T00:00:00", f"{ayear}-{emonth}-{edate}T23:59:59")


CASES = [
    ("1771", "", ""),
    ("1771", "99", "99"),
    ("1771", "0", "00"),
    ("1771", "5", ""),
    ("1771", "05", "4"),
    ("1772", "2", ""),   # leap year February → 29
    ("1770", "2", ""),   # non-leap February → 28
    ("845", "", ""),     # 3-digit year pad
    ("92", "3", "7"),
    ("2024", "12", "31"),
]


def test_make_date_time_matches_oracle(spark):
    df = spark.createDataFrame(CASES, "y string, m string, d string")
    got = df.select("y", "m", "d", dates.make_date_time("y", "m", "d").alias("b")).collect()
    for r in got:
        exp = py_make_date_time(r["y"], r["m"], r["d"])
        assert (r["b"]["earliest"], r["b"]["latest"]) == exp, (r["y"], r["m"], r["d"])


def test_make_date_string(spark):
    df = spark.createDataFrame(
        [("1771", "05", "04"), ("1771", "05", ""), ("1771", "", "")],
        "y string, m string, d string",
    )
    vals = [r["s"] for r in df.select(dates.make_date_string("y", "m", "d").alias("s")).collect()]
    assert vals == ["1771-05-04", "1771-05", "1771"]


def test_qualifier_bounds(spark):
    # SDFBCSV2RDF.scala:53-78 semantics
    df = spark.createDataFrame(
        [("AF/IN", "1700"), ("AF", "1700"), ("BF/IN", "1700"), ("BF", "1700"),
         ("IN", "1700"), ("CA", "1700"), ("IN", "")],
        "q string, y string",
    )
    rows = df.select("q", "y", dates.qualifier_bounds("q", "y").alias("b")).collect()
    by_q = {(r["q"], r["y"]): (r["b"]["bob"], r["b"]["eob"]) for r in rows}
    e, l = "1700-01-01T00:00:00", "1700-12-31T23:59:59"
    assert by_q[("AF/IN", "1700")] == (e, None)
    assert by_q[("AF", "1700")] == (l, None)
    assert by_q[("BF/IN", "1700")] == (None, l)
    assert by_q[("BF", "1700")] == (None, e)
    assert by_q[("IN", "1700")] == (e, l)
    assert by_q[("CA", "1700")] == (e, l)
    assert by_q[("IN", "")] == (None, None)


def test_certainty_bucket(spark):
    df = spark.createDataFrame([(0,), (19,), (20,), (45,), (60,), (79,), (99,), (100,)], "p int")
    got = [r["b"] for r in df.select(dates.certainty_bucket("p").alias("b")).orderBy("p").collect()]
    assert got == ["very unlikely ", "very unlikely ", "unlikely ", "possibly ",
                   "likely ", "likely ", "very likely ", ""]


def test_english_date(spark):
    df = spark.createDataFrame(
        [("4th May 1771",), ("May 1771",), ("1771",), ("1st February 1772",),
         ("Floreal 1771",)], "s string"
    )
    early = [r["v"] for r in df.select(dates.english_date("s", True).alias("v")).collect()]
    late = [r["v"] for r in df.select(dates.english_date("s", False).alias("v")).collect()]
    # ISO output: single-digit days zero-padded; unknown month names -> NULL
    assert early == ["1771-05-04", "1771-05-01", "1771-01-01", "1772-02-01", None]
    assert late == ["1771-05-04", "1771-05-31", "1771-12-31", "1772-02-01", None]


def test_repair_partial_date(spark):
    df = spark.createDataFrame(
        [("1771-00-00",), ("1771-03-00",), ("4/7/1771",), ("garbage",)], "s string"
    )
    rows = {r["s"]: (r["b"]["begin"], r["b"]["end"])
            for r in df.select("s", dates.repair_partial_date("s").alias("b")).collect()}
    assert rows["1771-00-00"] == ("1771-01-01", "1771-12-31")
    # reference quirk: month case ends at yyyy-12-<last day of month 03>
    assert rows["1771-03-00"] == ("1771-03-01", "1771-12-31")
    assert rows["4/7/1771"] == ("1771-04-07", "1771-04-07")
    assert rows["garbage"] == (None, None)


def test_time_span_iri(spark):
    df = spark.createDataFrame([("a", None, None, "b")], "p1 string, p2 string, p3 string, p4 string")
    v = df.select(
        dates.time_span_iri(F.col("p1"), F.col("p2"), F.col("p3"), F.col("p4"), "ns/").alias("v")
    ).collect()[0]["v"]
    assert v == "ns/time_a-_-_-b"
