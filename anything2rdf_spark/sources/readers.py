"""Source adapters (SURVEY §2.1 S1-S10).

The engine's primary input is the transcripts table, but "complete"
coverage means a reference user can point any of its source shapes at this
engine. Each reader returns a DataFrame; custom parsing (XML) runs as an
Arrow-batched pandas UDF over whole-record rows — the Spark re-expression of
the reference's per-record XMLEventReader loops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def csv_positional(spark: SparkSession, path: str, sep: str = ",", quote: str = '"') -> DataFrame:
    """S1: positional CSV — columns _c0.._cN (the reference's
    ``Array[String]`` row, EMLOCSV2RDF.scala:142-146)."""
    return spark.read.option("sep", sep).option("quote", quote).csv(path)


def csv_dict(spark: SparkSession, path: str, sep: str = ",", quote: str = '"') -> DataFrame:
    """S2: header-named CSV (``CSVDictReader``, procopecsv2rdf.scala:121)."""
    return (
        spark.read.option("header", True).option("sep", sep).option("quote", quote).csv(path)
    )


def tsv_custom(
    spark: SparkSession, path: str, sep: str = "\t", quote: str | None = None
) -> DataFrame:
    """S3: TSV with custom separator/quote — the reference's tab-separated
    inputs with ``|``/``€``/null quoting (FBTEETSV2RDF.scala:267;
    geonamescsv2rdf.scala:157). ``quote=None`` disables quoting (the
    CSVReader(null-quote) variant)."""
    r = spark.read.option("sep", sep).option("header", True)
    r = r.option("quote", "\u0000" if quote is None else quote)
    return r.csv(path)


def csv_with_width_check(
    spark: SparkSession, path: str, expected_cols: int, sep: str = ",", quote: str = '"'
) -> tuple[DataFrame, DataFrame]:
    """P4: column-count sanity check (schoenbergcsv2rdf.scala:133-134 warns
    on row width ≠ 50) — rows with the wrong width go to a quarantine
    DataFrame instead of a log line. Returns (good, quarantine).

    ``nullValue=\\u0000`` keeps legitimately-empty fields as '' (Spark's CSV
    default maps them to null, which would wrongly quarantine any row with
    an empty field); only genuinely missing trailing columns are null, so
    the non-null count matches the reference's raw column count."""
    raw = (
        spark.read.option("sep", sep)
        .option("quote", quote)
        .option("nullValue", "\u0000")
        .csv(path)
    )
    width = F.size(F.array(*[F.col(c) for c in raw.columns])) - F.size(
        F.filter(F.array(*[F.col(c) for c in raw.columns]), lambda x: x.isNull())
    )
    tagged = raw.withColumn("_width", width)
    good = tagged.filter(F.col("_width") == expected_cols).drop("_width")
    quarantine = tagged.filter(F.col("_width") != expected_cols)
    return good, quarantine


def json_documents(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """S6: JSON document scan (grandtourjson2rdf.scala:99-196); nested
    children decompose via operators.hierarchy.flatten_tree."""
    return spark.read.option("multiLine", multiline).json(path)


def line_records(spark: SparkSession, path: str) -> DataFrame:
    """S5: line-delimited records, one ``id<TAB>payload`` per line
    (VIAFXML2RDF.scala:249-251). Gzip text is splittable-no: Spark reads a
    .gz file in one task, so the 100 TB path is either pre-split files or a
    recompressed columnar copy — which this function produces downstream."""
    return (
        spark.read.text(path)
        .withColumn("id", F.split("value", "\t").getItem(0))
        .withColumn("payload", F.expr("substring(value, length(split(value, '\t')[0]) + 2)"))
        .drop("value")
    )


def glob_scan(spark: SparkSession, pattern: str, fmt: str = "parquet") -> DataFrame:
    """S8: directory/glob multi-file scan (OBCXML2RDF.scala:171)."""
    return spark.read.format(fmt).load(pattern)


def marker_delimited(
    spark: SparkSession, path: str, marker_regex: str = r"^<L (\S+)>", part_col: str | None = None
) -> DataFrame:
    """S9: marker-delimited plaintext segmentation (ceectsv2rdf.scala:215-227):
    ``<L id>`` marker lines open a record, following lines are its body.
    Returns (record_id, text). Sessionization via last-marker window (W5).

    Line numbers come from ``wholetext`` + ``posexplode(split(...))`` — a
    pure function of file content, deterministic under any partitioning
    (the previous ``monotonically_increasing_id`` window was a
    partition-order accident on multi-split files, VERDICT r1 #3). Marker
    carry-forward is inherently sequential per file, so one-task-per-file
    is the correct parallelism unit here."""
    from ..operators.windows import last_marker_propagation

    # NB: .option("wholetext", True) silently does nothing — the Python
    # bool stringifies to "True" and the text source's option parse is
    # case-sensitive, leaving the reader in line mode (line_no was 0 for
    # every row and record order was a collect_list accident). The kwarg
    # form normalizes the boolean correctly.
    whole = spark.read.text(path, wholetext=True).withColumn(
        "_file", F.input_file_name()
    )
    arr = F.split(F.col("value"), "\n")
    # a trailing newline yields one empty trailing element that line-mode
    # spark.read.text would not produce — drop it for parity
    arr = F.when(
        (F.size(arr) > 0) & (F.element_at(arr, -1) == ""),
        F.slice(arr, 1, F.size(arr) - 1),
    ).otherwise(arr)
    lines = whole.select(
        "_file", F.posexplode(arr).alias("line_no", "value")
    )
    lines = lines.withColumn("marker", F.regexp_extract("value", marker_regex, 1))
    lines = lines.withColumn("marker", F.when(F.col("marker") == "", None).otherwise(F.col("marker")))
    tagged = last_marker_propagation(lines, "marker", "line_no", part_col="_file")
    # Marker rows stay IN the grouping (so a marker immediately followed by
    # another marker still yields a record, with empty text) but contribute
    # no body: the guarded struct is null for them and collect_list skips
    # nulls. The collected structs are array_sorted by line_no before
    # joining — collect_list's post-shuffle order is explicitly
    # non-deterministic, and multi-line bodies must not depend on it.
    body = F.when(F.col("marker").isNull(), F.struct("line_no", "value"))
    return (
        tagged.filter(F.col("current_marker").isNotNull())
        .groupBy(F.col("current_marker").alias("record_id"))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(body)), lambda s: s["value"]
                ),
            ).alias("text")
        )
    )


# --- S4: streaming XML pull scan, re-expressed as Arrow-batched stdlib SAX --

def xml_records_udf(record_schema: str, extractor):
    """Build a ``mapInPandas`` function parsing one XML document per row
    with stdlib ElementTree — the pandas-UDF SAX parser of SURVEY S4.

    ``extractor(xml_string) -> list[dict]`` returns one dict per output row
    (a turn, a name, a statute node …). Parsing is per-batch Python but
    C-accelerated (cElementTree); at scale, parallelism = input splits.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.strip().split(" ")[0] for c in record_schema.split(",")]
        for pdf in batches:
            rows: list[dict] = []
            for xml in pdf["payload"]:
                if xml:
                    rows.extend(extractor(xml))
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return run


def parse_speech_xml(xml: str) -> list[dict]:
    """OBC-shaped speech extractor (OBCXML2RDF.scala:173-213 semantics):
    <speech speaker= role= year=>text</speech> elements under any root."""
    import xml.etree.ElementTree as ET

    out = []
    root = ET.fromstring(xml)
    for i, sp in enumerate(root.iter("speech")):
        out.append(
            {
                "speech_idx": i,
                "speaker": sp.get("speaker"),
                "role": sp.get("role"),
                "year": sp.get("year"),
                "text": "".join(sp.itertext()),
            }
        )
    return out


def xml_speeches(records: DataFrame) -> DataFrame:
    """S4 end-to-end: (id, payload-xml) rows → one row per speech."""
    schema = "speech_idx int, speaker string, role string, year string, text string"
    fn = xml_records_udf(schema, parse_speech_xml)
    return records.select("payload").mapInPandas(fn, schema)


def xsd_enumeration(spark: SparkSession, payload: str) -> DataFrame:
    """S10: XSD <enumeration>/<documentation> code table (PNR2RDF.scala:52-63)
    from an in-memory schema string → dimension DataFrame."""
    import xml.etree.ElementTree as ET

    ns = {"xs": "http://www.w3.org/2001/XMLSchema"}
    root = ET.fromstring(payload)
    rows = []
    for enum in root.iter("{http://www.w3.org/2001/XMLSchema}enumeration"):
        code = enum.get("value")
        for doc in enum.iter("{http://www.w3.org/2001/XMLSchema}documentation"):
            rows.append((code, doc.get("{http://www.w3.org/XML/1998/namespace}lang"), (doc.text or "").strip()))
        if not list(enum.iter("{http://www.w3.org/2001/XMLSchema}documentation")):
            rows.append((code, None, None))
    return spark.createDataFrame(rows, "code string, lang string, label string")


# --- S7: MARC binary scan — stdlib ISO-2709 parser (no pymarc needed) ------

_MARC_FT = 0x1E  # field terminator
_MARC_RT = 0x1D  # record terminator
_MARC_SF = 0x1F  # subfield delimiter


def parse_marc_bytes(blob: bytes) -> list[dict]:
    """Parse a concatenation of ISO-2709 MARC records into flat
    (rec_idx, tag, ind1, ind2, code, value) rows — the field/subfield access
    pattern of HelmetMARC2ISBNRDF.scala:53-106 (leader, directory, control
    fields raw, data fields as indicator pair + $-coded subfields).
    Malformed records are skipped, not fatal (the reference warns)."""
    rows: list[dict] = []
    pos, rec_idx = 0, 0
    n = len(blob)
    while pos < n:
        if n - pos < 24:
            break
        leader = blob[pos : pos + 24]
        try:
            rec_len = int(leader[0:5])
        except ValueError:
            rec_len = -1
        if rec_len < 24:
            # an unparseable/zero/garbage record length cannot advance the
            # cursor — without this resync `pos += rec_len` would loop
            # forever on the same offset (an executor task hang, not a
            # skipped record); skip to the next record terminator instead
            nxt = blob.find(bytes([_MARC_RT]), pos)
            if nxt == -1:
                break
            pos = nxt + 1
            continue
        try:
            base = int(leader[12:17])
        except ValueError:
            # record length is valid but the base address is not: skip this
            # record by its declared length (malformed-skipped, not fatal)
            pos += rec_len
            continue
        rec = blob[pos : pos + rec_len]
        if len(rec) < rec_len:
            break
        directory = rec[24 : base - 1]  # base-1 = directory's field terminator
        for off in range(0, len(directory) - 11, 12):
            entry = directory[off : off + 12]
            try:
                tag = entry[0:3].decode("ascii")
                flen = int(entry[3:7])
                fstart = int(entry[7:12])
            except (ValueError, UnicodeDecodeError):
                continue
            field = rec[base + fstart : base + fstart + flen]
            if field.endswith(bytes([_MARC_FT])):
                field = field[:-1]
            if tag < "010":  # control field: raw data, no indicators
                rows.append(
                    {"rec_idx": rec_idx, "tag": tag, "ind1": None, "ind2": None,
                     "code": None, "value": field.decode("utf-8", "replace")}
                )
            else:
                ind1 = chr(field[0]) if len(field) > 0 else " "
                ind2 = chr(field[1]) if len(field) > 1 else " "
                for sub in field[2:].split(bytes([_MARC_SF])):
                    if not sub:
                        continue
                    rows.append(
                        {"rec_idx": rec_idx, "tag": tag, "ind1": ind1, "ind2": ind2,
                         "code": chr(sub[0]),
                         "value": sub[1:].decode("utf-8", "replace")}
                    )
        rec_idx += 1
        pos += rec_len
        # tolerate a stray record terminator between records
        while pos < n and blob[pos] == _MARC_RT:
            pos += 1
    return rows


MARC_FIELD_SCHEMA = "file string, rec_idx int, tag string, ind1 string, ind2 string, code string, value string"


def marc_records(spark: SparkSession, path: str) -> DataFrame:
    """S7: MARC binary scan — ``binaryFile`` source + Arrow-batched
    ``mapInPandas`` over the stdlib ISO-2709 parser. One task per file;
    at scale MARC dumps ship as many files, so parallelism = file count
    (same story as the reference's per-file iteration,
    HelmetMARC2ISBNRDF.scala:53)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file", "rec_idx", "tag", "ind1", "ind2", "code", "value"]
        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for r in parse_marc_bytes(bytes(content)):
                    r["file"] = fpath
                    rows.append(r)
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
            )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(run, MARC_FIELD_SCHEMA)
    )


def marc_isbns(fields: DataFrame) -> DataFrame:
    """HelmetMARC2ISBNRDF.scala:57-63 semantics: 020$a ISBN values,
    punctuation-trimmed, deduplicated per record."""
    from ..functions.text import punct_trim

    return (
        fields.filter((F.col("tag") == "020") & (F.col("code") == "a"))
        .select("file", "rec_idx", punct_trim("value").alias("isbn"))
        .filter(F.col("isbn") != "")
        .distinct()
    )


def build_marc_record(fields: list[tuple]) -> bytes:
    """Serialize one ISO-2709 record (test fixture / round-trip helper).
    ``fields``: (tag, data) for control fields or
    (tag, ind1, ind2, [(code, value), ...]) for data fields."""
    body = bytearray()
    directory = bytearray()
    for f in fields:
        start = len(body)
        if len(f) == 2:
            payload = f[1].encode("utf-8") + bytes([_MARC_FT])
        else:
            tag, ind1, ind2, subs = f
            payload = (ind1 + ind2).encode("ascii")
            for code, val in subs:
                payload += bytes([_MARC_SF]) + code.encode("ascii") + val.encode("utf-8")
            payload += bytes([_MARC_FT])
        body += payload
        directory += f"{f[0]:<3}{len(payload):04d}{start:05d}".encode("ascii")
    directory += bytes([_MARC_FT])
    base = 24 + len(directory)
    rec_len = base + len(body) + 1  # +1 record terminator
    leader = f"{rec_len:05d}nam a22{base:05d} a 4500".encode("ascii")[:24].ljust(24, b" ")
    return bytes(leader) + bytes(directory) + bytes(body) + bytes([_MARC_RT])
