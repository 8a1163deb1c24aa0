import gzip
import glob as pyglob

from pyspark.sql import functions as F

from anything2rdf_spark.operators import sinks as SK
from anything2rdf_spark.sources import readers as RD


def test_csv_variants(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text('a,b\n1,"x,y"\n2,z\n')
    pos = RD.csv_positional(spark, str(p))
    assert pos.columns == ["_c0", "_c1"] and pos.count() == 3
    named = RD.csv_dict(spark, str(p))
    assert named.columns == ["a", "b"]
    assert {r["b"] for r in named.collect()} == {"x,y", "z"}


def test_tsv_custom_sep(spark, tmp_path):
    p = tmp_path / "d.tsv"
    p.write_text("a\tb\n1\tx|y\n")
    df = RD.tsv_custom(spark, str(p), quote="|")
    assert df.collect()[0]["b"] == "x|y" or df.collect()[0]["b"] == "y"  # quote stripping


def test_line_records(spark, tmp_path):
    p = tmp_path / "r.txt"
    p.write_text("id1\t<xml>one</xml>\nid2\t<xml>two</xml>\n")
    df = RD.line_records(spark, str(p))
    got = {r["id"]: r["payload"] for r in df.collect()}
    assert got == {"id1": "<xml>one</xml>", "id2": "<xml>two</xml>"}


def test_xml_speeches(spark, tmp_path):
    xml = (
        "<doc><speech speaker='s1' role='witness' year='1732'>hello <i>there</i></speech>"
        "<speech speaker='s2' role='judge' year='1732'>order</speech></doc>"
    )
    p = tmp_path / "x.txt"
    p.write_text(f"f1\t{xml}\n")
    recs = RD.line_records(spark, str(p))
    out = RD.xml_speeches(recs)
    rows = {r["speech_idx"]: (r["speaker"], r["role"], r["text"]) for r in out.collect()}
    assert rows[0] == ("s1", "witness", "hello there")
    assert rows[1] == ("s2", "judge", "order")


def test_marker_delimited(spark, tmp_path):
    p = tmp_path / "letters.txt"
    p.write_text("<L L1>\nline a\nline b\n<L L2>\nline c\n")
    df = RD.marker_delimited(spark, str(p))
    got = {r["record_id"]: r["text"] for r in df.collect()}
    assert got == {"L1": "line a\nline b", "L2": "line c"}


def test_xsd_enumeration(spark):
    payload = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"
                            xmlns:xml="http://www.w3.org/XML/1998/namespace">
      <xs:enumeration value="A"><xs:annotation>
        <xs:documentation xml:lang="en">Alpha</xs:documentation>
        <xs:documentation xml:lang="fi">Alfa</xs:documentation>
      </xs:annotation></xs:enumeration>
      <xs:enumeration value="B"/>
    </xs:schema>"""
    df = RD.xsd_enumeration(spark, payload)
    rows = {(r["code"], r["lang"]): r["label"] for r in df.collect()}
    assert rows[("A", "en")] == "Alpha" and rows[("A", "fi")] == "Alfa"
    assert ("B", None) in rows


def test_marc_iso2709_roundtrip(spark, tmp_path):
    """S7: synthetic two-record MARC file → binaryFile + mapInPandas parse →
    field/subfield rows and 020$a ISBN extraction (HelmetMARC2ISBNRDF
    semantics), no MARC library needed."""
    rec1 = RD.build_marc_record(
        [
            ("001", "rec-0001"),
            ("020", " ", " ", [("a", "978-951-0-12345-6 :"), ("c", "EUR 20")]),
            ("245", "1", "0", [("a", "Test title /"), ("b", "subtitle")]),
        ]
    )
    rec2 = RD.build_marc_record(
        [
            ("001", "rec-0002"),
            ("020", " ", " ", [("a", "(nid.)")]),
            ("020", " ", " ", [("a", "0-521-43108-5")]),
        ]
    )
    p = tmp_path / "test.mrc"
    p.write_bytes(rec1 + rec2)

    fields = RD.marc_records(spark, str(p))
    rows = fields.collect()
    by_rec = {}
    for r in rows:
        by_rec.setdefault(r["rec_idx"], []).append(r)
    ctrl = [r for r in by_rec[0] if r["tag"] == "001"]
    assert ctrl[0]["value"] == "rec-0001" and ctrl[0]["code"] is None
    t245 = {r["code"]: r["value"] for r in by_rec[0] if r["tag"] == "245"}
    assert t245 == {"a": "Test title /", "b": "subtitle"}
    assert [r["ind1"] for r in by_rec[0] if r["tag"] == "245"] == ["1", "1"]

    isbns = {(r["rec_idx"], r["isbn"]) for r in RD.marc_isbns(fields).collect()}
    # punctuation-trimmed: trailing " :" and surrounding parens stripped
    assert (0, "978-951-0-12345-6") in isbns
    assert (1, "nid") in isbns and (1, "0-521-43108-5") in isbns


def test_marker_delimited_multifile_deterministic(spark, tmp_path):
    """S9 ordering is a pure function of file content (posexplode line
    numbers), including across several files in one scan."""
    (tmp_path / "a.txt").write_text("<L A1>\nalpha\n<L A2>\nbeta\ngamma\n")
    (tmp_path / "b.txt").write_text("<L B1>\ndelta\n")
    df = RD.marker_delimited(spark, str(tmp_path / "*.txt"))
    got = {r["record_id"]: r["text"] for r in df.collect()}
    assert got == {"A1": "alpha", "A2": "beta\ngamma", "B1": "delta"}


TRIPLES_ROWS = [
    ("http://x/s", "http://x/p", "http://x/o", None, None, None, None, None),
    ("http://x/s", "http://x/p", None, 'li"ne\nbreak', None, None, None, None),
    ("http://x/s", "http://x/p", None, "bonjour", "fr", None, None, None),
    ("http://x/s", "http://x/p", None, "42", None, "http://www.w3.org/2001/XMLSchema#integer", None, None),
    ("_:b1", "http://x/p", "_:b2", None, None, None, None, None),
]
TRIPLES_SCHEMA = (
    "subj string, pred string, obj_iri string, obj_lit string, obj_lang string,"
    " obj_dtype string, conv_id string, turn_idx int"
)


def test_nt_lines(spark):
    df = spark.createDataFrame(TRIPLES_ROWS, TRIPLES_SCHEMA)
    lines = {r["line"] for r in SK.nt_lines(df).collect()}
    assert "<http://x/s> <http://x/p> <http://x/o> ." in lines
    assert '<http://x/s> <http://x/p> "li\\"ne\\nbreak" .' in lines
    assert '<http://x/s> <http://x/p> "bonjour"@fr .' in lines
    assert (
        '<http://x/s> <http://x/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .' in lines
    )
    assert "_:b1 <http://x/p> _:b2 ." in lines


def test_write_nt_gzip(spark, tmp_path):
    df = spark.createDataFrame(TRIPLES_ROWS, TRIPLES_SCHEMA)
    out = str(tmp_path / "nt")
    SK.write_nt(df, out, gzip=True, sort=True)
    files = pyglob.glob(f"{out}/*.txt.gz")
    assert files
    text = "".join(gzip.open(f, "rt").read() for f in files)
    assert text.count(" .") == 5


def test_ttl_prefix_compaction(spark):
    df = spark.createDataFrame(TRIPLES_ROWS[:1], TRIPLES_SCHEMA)
    lines = [r["line"] for r in SK.ttl_lines(df, {"x": "http://x/"}).collect()]
    assert "@prefix x: <http://x/> ." in lines
    assert "x:s x:p x:o ." in lines


def test_ttl_compaction_is_term_level(spark):
    # Compaction must not rewrite IRI-like text INSIDE a literal, and must
    # keep the full <iri> form when the local name is not PN_LOCAL-safe.
    rows = [
        ("http://x/s", "http://x/p", None, "see <http://x/o> inline", None, None, "c", 0),
        ("http://x/s", "http://x/p", "http://x/a/b", None, None, None, "c", 0),
        ("http://x/s", "http://x/p", None, "42", None,
         "http://www.w3.org/2001/XMLSchema#integer", "c", 0),
    ]
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    lines = {r["line"] for r in SK.ttl_lines(
        df, {"x": "http://x/", "xsd": "http://www.w3.org/2001/XMLSchema#"}).collect()}
    assert 'x:s x:p "see <http://x/o> inline" .' in lines
    assert "x:s x:p <http://x/a/b> ." in lines  # 'a/b' not PN_LOCAL-safe
    assert 'x:s x:p "42"^^xsd:integer .' in lines


def test_ttl_pn_local_must_not_end_with_dot(spark):
    # A PN_LOCAL may CONTAIN '.' but not END with it: 'x:v1. .' would merge
    # the local name's dot with the statement terminator and mis-parse.
    rows = [
        ("http://x/s", "http://x/p", "http://x/v1.", None, None, None, "c", 0),
        ("http://x/s", "http://x/p", "http://x/v1.x", None, None, None, "c", 0),
    ]
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    lines = {r["line"] for r in SK.ttl_lines(df, {"x": "http://x/"}).collect()}
    assert "x:s x:p <http://x/v1.> ." in lines  # trailing dot: keep <full>
    assert "x:s x:p x:v1.x ." in lines  # interior dot: compacts fine


def test_split_schema_data(spark):
    df = spark.createDataFrame(
        [("http://x/schema#C", "p", None, None, None, None, None, None)] + TRIPLES_ROWS[:1],
        TRIPLES_SCHEMA,
    )
    schema, data = SK.split_schema_data(df, "http://x/schema#")
    assert schema.count() == 1 and data.count() == 1


def test_marc_zero_length_record_does_not_hang(spark):
    """A leader whose record length parses to 0 (or garbage < 24) must not
    loop forever on the same offset — the parser resyncs at the next record
    terminator and keeps the following good record."""
    good = RD.build_marc_record([("001", "recX")])
    blob = b"00000" + b" " * 19 + b"\x1d" + good
    rows = RD.parse_marc_bytes(blob)
    assert any(r["value"] == "recX" for r in rows)


def test_marker_delimited_empty_body_and_order(spark, tmp_path):
    """A marker immediately followed by another marker still yields a
    record (empty text), and multi-line bodies concatenate in line order
    regardless of collect_list's shuffle order."""
    p = tmp_path / "m.txt"
    p.write_text("<L A>\n<L B>\nline one\nline two\nline three\n")
    out = {r["record_id"]: r["text"] for r in
           RD.marker_delimited(spark, str(p)).collect()}
    assert out == {"A": "", "B": "line one\nline two\nline three"}


def test_nt_lines_drops_malformed_all_null_object(spark):
    """A triple with every object column null renders to a NULL line, which
    the text datasource rejects — such rows are dropped, not job-fatal."""
    rows = [
        ("http://x/s", "http://x/p", "http://x/o", None, None, None, "c", 0),
        ("http://x/bad", "http://x/p", None, None, None, None, "c", 0),
    ]
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    lines = [r["line"] for r in SK.nt_lines(df).collect()]
    assert lines == ["<http://x/s> <http://x/p> <http://x/o> ."]


def test_write_ttl_header_file_sorts_first(spark, tmp_path):
    df = spark.createDataFrame(TRIPLES_ROWS[:2], TRIPLES_SCHEMA)
    out = str(tmp_path / "ttl")
    SK.write_ttl(df, out, {"x": "http://x/"}, sort=True)
    import os
    files = sorted(f for f in os.listdir(out)
                   if not f.startswith(("_", ".")) and not f.endswith(".crc"))
    assert files[0] == "00_prefixes.ttl"
    text = "".join(open(os.path.join(out, f)).read() for f in files)
    # prefix declaration precedes every use in name-order concatenation
    assert text.index("@prefix x:") < text.index("x:")


def test_write_jsonl_roundtrip(spark, tmp_path):
    from anything2rdf_spark.operators.sinks import write_jsonl

    rows = [(1, "plain text", 0.5), (2, 'quotes " and \\ slash', -1.0),
            (3, "unicode — ”curly” and 中文", 0.0), (4, None, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    p = str(tmp_path / "out.jsonl")
    write_jsonl(df.repartition(2), p)
    back = spark.read.json(p)
    # null keys are KEPT (ignoreNullFields=false): the all-null row still
    # carries both columns, so the read-back schema and values round-trip
    assert {tuple(r) for r in back.select("doc_id", "text", "score").collect()} == set(rows)
    # gzip shards read back identically
    pz = str(tmp_path / "out_gz.jsonl")
    write_jsonl(df, pz, compression="gzip")
    import glob

    assert glob.glob(pz + "/*.gz")
    backz = spark.read.json(pz)
    assert {tuple(r) for r in backz.select("doc_id", "text", "score").collect()} == set(rows)
