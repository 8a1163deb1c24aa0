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
    DataFrame instead of a log line. Returns (good, quarantine)."""
    raw = spark.read.option("sep", sep).option("quote", quote).csv(path)
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
    Returns (record_id, text). Sessionization via last-marker window (W5)."""
    from ..operators.windows import last_marker_propagation

    lines = (
        spark.read.text(path)
        .withColumn("_file", F.input_file_name())
        .withColumn(
            "line_no", F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
            )
        )
    )
    lines = lines.withColumn("marker", F.regexp_extract("value", marker_regex, 1))
    lines = lines.withColumn("marker", F.when(F.col("marker") == "", None).otherwise(F.col("marker")))
    tagged = last_marker_propagation(lines, "marker", "line_no", part_col="_file")
    return (
        tagged.filter(F.col("marker").isNull() & F.col("current_marker").isNotNull())
        .groupBy(F.col("current_marker").alias("record_id"))
        .agg(F.concat_ws("\n", F.collect_list(F.struct("line_no", "value")).getField("value")).alias("text"))
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


def marc_records_stub(spark: SparkSession, path: str) -> DataFrame:
    """S7: MARC binary scan — requires a MARC codec (pymarc/marc4j), not in
    this container. The Spark plumbing would be ``spark.read.format
    ('binaryFile')`` + a mapInPandas decoder; stubbed per brief."""
    raise NotImplementedError(
        "MARC decoding needs pymarc; plug a decoder into binaryFile + mapInPandas"
    )
