"""Date / time-span scalar kernel (SURVEY §2.4 F12-F19) — native Column
expressions only; everything stays inside whole-stage codegen.

Faithful to the reference semantics:

* ``make_date_time`` — Anything2RDF.scala:54-77: year zero-padded to 4 (5 with
  leading minus), month/day wildcards ``""``/``"99"``/``"0"``/``"00"`` widen to
  (01..12) / (01..last-day-of-month); bounds rendered as
  ``T00:00:00`` / ``T23:59:59``.
* ``make_date_string`` — Anything2RDF.scala:41-52: partial ISO join.
* ``qualifier_bounds`` — SDFBCSV2RDF.scala:53-78,144-167: BF/AF/BF\\/IN/AF\\/IN/
  IN/CA select which of the 4 time-span points get the earliest/latest bound.
* ``certainty_bucket`` — SDFBCSV2RDF.scala:169-174.
* ``english_date`` — FBTEETSV2RDF.scala:257-264 ("4th May 1771" forms).
* ``repair_partial_date`` — procopecsv2rdf.scala:94-118 ("-00-00" forms).
* ``month_number`` / ``month_last_day`` — FBTEETSV2RDF.scala:229-255.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTH_LAST_DAY = ["31", "28", "31", "30", "31", "30", "31", "31", "30", "31", "30", "31"]

def _month_map() -> Column:
    return F.create_map(
        *[x for i, m in enumerate(MONTHS) for x in (F.lit(m), F.lit(f"{i + 1:02d}"))]
    )


def _last_day_map() -> Column:
    return F.create_map(
        *[x for i, m in enumerate(MONTHS) for x in (F.lit(m), F.lit(MONTH_LAST_DAY[i]))]
    )


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def month_number(name: Column | str) -> Column:
    """January→01 … (FBTEETSV2RDF.scala:229-242); unknown → '' (SDFB mapMonth)."""
    return F.coalesce(_month_map()[_c(name)], F.lit(""))


def month_last_day(name: Column | str) -> Column:
    """Month-name → last calendar day, non-leap (FBTEETSV2RDF.scala:244-255)."""
    return _last_day_map()[_c(name)]


def pad_year(year: Column | str) -> Column:
    """Zero-pad year to 4 digits; negative years to '-0yyyy' style
    (Anything2RDF.scala:55)."""
    y = _c(year)
    return F.when(
        y.startswith("-"),
        F.concat(F.lit("-"), F.lpad(y.substr(F.lit(2), F.length(y)), 4, "0")),
    ).otherwise(F.lpad(y, 4, "0"))


def _is_wild(c: Column) -> Column:
    # empty / "99" / "0" / "00"  (Anything2RDF.scala:57-67)
    return (c.isNull()) | (c == "") | (c == "99") | c.rlike("^0{1,2}$")


def _pad2(c: Column) -> Column:
    return F.when(F.length(c) == 1, F.concat(F.lit("0"), c)).otherwise(c)


def _last_day_of(year: Column, month2: Column) -> Column:
    """Last day of (year, month) honoring leap years — the reference uses
    joda ``dayOfMonth().withMaximumValue()`` (Anything2RDF.scala:70)."""
    d = F.last_day(
        F.try_to_date(F.concat(pad_year(year), F.lit("-"), month2, F.lit("-01")))
    )
    return F.lpad(F.dayofmonth(d).cast("string"), 2, "0")


def make_date_string(year: Column | str, month: Column | str, day: Column | str) -> Column:
    """Partial ISO join y[-m[-d]] (Anything2RDF.scala:41-52)."""
    y, m, d = _c(year), _c(month), _c(day)
    return F.when(m.isNull() | (m == ""), y).otherwise(
        F.when(d.isNull() | (d == ""), F.concat_ws("-", y, m)).otherwise(F.concat_ws("-", y, m, d))
    )


def make_date_time(year: Column | str, month: Column | str, day: Column | str) -> Column:
    """(earliest, latest) ISO dateTime bounds with wildcard widening
    (Anything2RDF.scala:54-77). Returns struct<earliest:string, latest:string>.

    The latest-day computation uses the *unpadded* year exactly like the
    reference (it parses ``year+"-"+emonth`` with the raw year string).
    """
    y, m, d = _c(year).cast("string"), _c(month).cast("string"), _c(day).cast("string")
    ayear = pad_year(y)
    bmonth = F.when(_is_wild(m), F.lit("01")).otherwise(_pad2(m))
    emonth = F.when(_is_wild(m), F.lit("12")).otherwise(_pad2(m))
    bdate = F.when(_is_wild(d), F.lit("01")).otherwise(_pad2(d))
    edate = F.when(_is_wild(d), _last_day_of(y, emonth)).otherwise(_pad2(d))
    earliest = F.concat(ayear, F.lit("-"), bmonth, F.lit("-"), bdate, F.lit("T00:00:00"))
    latest = F.concat(ayear, F.lit("-"), emonth, F.lit("-"), edate, F.lit("T23:59:59"))
    return F.struct(earliest.alias("earliest"), latest.alias("latest"))


def qualifier_bounds(
    qualifier: Column | str,
    year: Column | str,
    month: Column | str | None = None,
    day: Column | str | None = None,
    end: bool = False,
) -> Column:
    """Map a date qualifier to the two begin points (or the two end points
    when ``end=True``) of a CIDOC 4-point time-span
    (SDFBCSV2RDF.scala:53-78,144-167).

    Returns struct<p1:string, p2:string> = (bob, eob) or (boe, eoe):
      AF/IN → p1=earliest;  AF → p1=latest;  BF/IN → p2=latest;
      BF → p2=earliest;  IN | CA → p1=earliest, p2=latest.
    Empty/unknown year or qualifier → both null.
    """
    q = _c(qualifier)
    y = _c(year).cast("string")
    dt = make_date_time(y, month if month is not None else F.lit(""), day if day is not None else F.lit(""))
    earliest, latest = dt["earliest"], dt["latest"]
    empty = y.isNull() | (y == "")
    p1 = F.when(empty, F.lit(None).cast("string")).otherwise(
        F.when(q == "AF/IN", earliest)
        .when(q == "AF", latest)
        .when(q.isin("IN", "CA"), earliest)
        .otherwise(F.lit(None).cast("string"))
    )
    p2 = F.when(empty, F.lit(None).cast("string")).otherwise(
        F.when(q == "BF/IN", latest)
        .when(q == "BF", earliest)
        .when(q.isin("IN", "CA"), latest)
        .otherwise(F.lit(None).cast("string"))
    )
    names = ("boe", "eoe") if end else ("bob", "eob")
    return F.struct(p1.alias(names[0]), p2.alias(names[1]))


def certainty_bucket(probability: Column | str) -> Column:
    """0-100 → descriptive-certainty prefix (SDFBCSV2RDF.scala:169-174):
    ≤19 'very unlikely ', ≤39 'unlikely ', ≤59 'possibly ', ≤79 'likely ',
    ≤99 'very likely ', 100 ''."""
    p = _c(probability)
    return (
        F.when(p <= 19, "very unlikely ")
        .when(p <= 39, "unlikely ")
        .when(p <= 59, "possibly ")
        .when(p <= 79, "likely ")
        .when(p <= 99, "very likely ")
        .when(p <= 100, "")
        .otherwise(F.lit(None).cast("string"))
    )


def english_date(s: Column | str, earliest: bool = True) -> Column:
    """'4th May 1771' / 'May 1771' / '1771' → ISO date string
    (FBTEETSV2RDF.scala:257-264): ordinal suffix stripped; 2-part falls back
    to first/last day of month; 1-part to Jan 1 / Dec 31.

    Output is real ISO-8601: single-digit days are zero-padded (an unpadded
    '1771-05-4' fails xsd:date and sorts AFTER '1771-05-31' as a string),
    and an unrecognized month name yields NULL rather than a malformed
    '1771--04' fragment."""
    c = _c(s)
    parts = F.split(c, " ")
    n = F.size(parts)
    day = _pad2(F.regexp_replace(parts[0], "(th|st|rd|nd)", ""))
    m3 = month_number(parts[1])
    m2 = month_number(parts[0])
    null_s = F.lit(None).cast("string")
    three = F.when(m3 != "", F.concat_ws("-", parts[2], m3, day)).otherwise(null_s)
    two = F.when(
        m2 != "",
        F.concat_ws(
            "-",
            parts[1],
            m2,
            F.lit("01") if earliest else month_last_day(parts[0]),
        ),
    ).otherwise(null_s)
    one = F.concat(parts[0], F.lit("-01-01" if earliest else "-12-31"))
    return F.when(n == 3, three).when(n == 2, two).otherwise(one)


def repair_partial_date(d: Column | str) -> Column:
    """'1771-00-00' → year span; '1771-03-00' → month-start..year-end
    (faithful to the reference's quirk of ``yyyy-12-<last day of given
    month>``, procopecsv2rdf.scala:100-105); 'm/d/yyyy' (US order: the
    FIRST slash field is the month) → exact day.
    Returns struct<begin:string, end:string> of ISO dates; null struct fields
    when unparseable (reference throws, procopecsv2rdf.scala:112 — we
    quarantine instead)."""
    c = _c(d)
    year4 = c.substr(1, 4)
    month2 = c.substr(6, 2)
    ldate = _last_day_of(year4, month2)
    slash = F.regexp_extract(c, r"(\d{1,2})/(\d{1,2})/(\d{4})", 0)
    sm = _pad2(F.regexp_extract(c, r"(\d{1,2})/(\d{1,2})/(\d{4})", 1))
    sd = _pad2(F.regexp_extract(c, r"(\d{1,2})/(\d{1,2})/(\d{4})", 2))
    sy = F.regexp_extract(c, r"(\d{1,2})/(\d{1,2})/(\d{4})", 3)
    exact = F.concat_ws("-", sy, sm, sd)
    begin = (
        F.when(c.endswith("-00-00"), F.concat(year4, F.lit("-01-01")))
        .when(c.endswith("-00"), F.concat(year4, F.lit("-"), month2, F.lit("-01")))
        .when(slash != "", exact)
        .otherwise(F.lit(None).cast("string"))
    )
    end_ = (
        F.when(c.endswith("-00-00"), F.concat(year4, F.lit("-12-31")))
        .when(c.endswith("-00"), F.concat(year4, F.lit("-12-"), ldate))
        .when(slash != "", exact)
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(begin.alias("begin"), end_.alias("end"))


def time_span_iri(
    bob: Column, eob: Column, boe: Column, eoe: Column, ns: str
) -> Column:
    """TimeSpan IRI keyed on its own bounds — ``ns+s"time_${bob}-${eob}-…"``
    with '_' for absent points (Anything2RDF.scala:33)."""
    u = F.lit("_")
    return F.concat(
        F.lit(ns + "time_"),
        F.coalesce(bob, u), F.lit("-"),
        F.coalesce(eob, u), F.lit("-"),
        F.coalesce(boe, u), F.lit("-"),
        F.coalesce(eoe, u),
    )
