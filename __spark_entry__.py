"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 over the driver's parquet tables; ``oracle_sql()`` carries the
DuckDB-equivalent SQL. KG operators run over a *derived transcripts view*
(the input_hint shape) built deterministically from the ``events`` table —
identical derivation on both sides, so the comparison checks the operator,
not the generator.

Float discipline: cosine similarities are computed in double precision with
identical left-fold order on both engines and rounded before output;
everything else is integer/string math.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the package queries import anything2rdf_spark; make sure the repo root is
# importable regardless of the harness's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NS = "http://example.org/a2r/"

# ---------------------------------------------------------------------------
# shared derivation: events → transcripts-shaped view (conv_id, turn_idx,
# role, text, tool, ts). Keep EXACTLY in sync with _ORACLE_TRANSCRIPTS.
# ---------------------------------------------------------------------------

_SPARK_TRANSCRIPTS = """
SELECT concat('conv_', cast(user_id AS string))                        AS conv_id,
       cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
       CASE event_type WHEN 'signup' THEN 'system' WHEN 'click' THEN 'user'
                       WHEN 'view' THEN 'user' WHEN 'purchase' THEN 'assistant'
                       ELSE 'tool' END                                  AS role,
       concat(event_type, ' ', props)                                  AS text,
       CASE WHEN event_type = 'error' THEN 'debugger' ELSE NULL END    AS tool,
       ts
FROM events
"""

_ORACLE_TRANSCRIPTS = """
SELECT 'conv_' || cast(user_id AS varchar)                             AS conv_id,
       cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
       CASE event_type WHEN 'signup' THEN 'system' WHEN 'click' THEN 'user'
                       WHEN 'view' THEN 'user' WHEN 'purchase' THEN 'assistant'
                       ELSE 'tool' END                                  AS role,
       event_type || ' ' || props                                      AS text,
       CASE WHEN event_type = 'error' THEN 'debugger' ELSE NULL END    AS tool,
       ts
FROM events
"""

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    spark.sql(_SPARK_TRANSCRIPTS).createOrReplaceTempView("transcripts")


def _q(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _load(spark, sf_dir)
        return spark.sql(sql)

    return run


def _with_transcripts(oracle_body: str) -> str:
    return f"WITH transcripts AS ({_ORACLE_TRANSCRIPTS}) {oracle_body}"


# ---------------------------------------------------------------------------
# KG-core queries (SURVEY §2 operator ids in each docstring/comment)
# ---------------------------------------------------------------------------

# kg_turn_triples — E1/E4/P1/P3/F21: full native per-turn triple emission
_KG_TURN_TRIPLES_SPARK = """
WITH adm AS (SELECT * FROM transcripts WHERE role IS NOT NULL AND text IS NOT NULL)
SELECT subj, pred, obj_iri, obj_lit, obj_dtype FROM (
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)) AS subj,
         'rdf:type' AS pred, '{ns}schema#Turn' AS obj_iri,
         CAST(NULL AS string) AS obj_lit, CAST(NULL AS string) AS obj_dtype
  FROM adm
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'partOf', concat('{ns}conversation_', conv_id), NULL, NULL
  FROM adm
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'turnIndex', NULL, cast(turn_idx AS string), 'xsd:integer'
  FROM adm
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'fulltext', NULL, text, NULL
  FROM adm WHERE trim(text) <> ''
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'wordCount', NULL, cast(size(split(text, '\\\\s+')) - 1 AS string), 'xsd:integer'
  FROM adm WHERE trim(text) <> ''
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'hasRole', concat('{ns}role_', role), NULL, NULL
  FROM adm
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'usedTool', concat('{ns}tool_', tool), NULL, NULL
  FROM adm WHERE tool IS NOT NULL AND trim(tool) <> ''
  UNION ALL
  SELECT concat('{ns}turn_', conv_id, '_', cast(turn_idx AS string)),
         'atTime', NULL, date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), 'xsd:dateTime'
  FROM adm WHERE ts IS NOT NULL
) t
""".replace("{ns}", NS)

_KG_TURN_TRIPLES_ORACLE = _with_transcripts(
    """
, adm AS (SELECT * FROM transcripts WHERE role IS NOT NULL AND text IS NOT NULL)
SELECT subj, pred, obj_iri, obj_lit, obj_dtype FROM (
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar) AS subj,
         'rdf:type' AS pred, '{ns}schema#Turn' AS obj_iri,
         CAST(NULL AS varchar) AS obj_lit, CAST(NULL AS varchar) AS obj_dtype
  FROM adm
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'partOf', '{ns}conversation_' || conv_id, NULL, NULL
  FROM adm
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'turnIndex', NULL, cast(turn_idx AS varchar), 'xsd:integer'
  FROM adm
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'fulltext', NULL, text, NULL
  FROM adm WHERE trim(text) <> ''
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'wordCount', NULL, cast(len(regexp_split_to_array(text, '\\s+')) - 1 AS varchar), 'xsd:integer'
  FROM adm WHERE trim(text) <> ''
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'hasRole', '{ns}role_' || role, NULL, NULL
  FROM adm
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'usedTool', '{ns}tool_' || tool, NULL, NULL
  FROM adm WHERE tool IS NOT NULL AND trim(tool) <> ''
  UNION ALL
  SELECT '{ns}turn_' || conv_id || '_' || cast(turn_idx AS varchar),
         'atTime', NULL, strftime(ts, '%Y-%m-%dT%H:%M:%S'), 'xsd:dateTime'
  FROM adm WHERE ts IS NOT NULL
) t
""".replace("{ns}", NS)
)

# kg_turn_ordering — W1 stable ordering
_KG_ORDER_SPARK = """
SELECT conv_id, turn_idx,
       cast(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS int) AS turn_rank,
       text
FROM transcripts
"""
_KG_ORDER_ORACLE = _with_transcripts(
    "SELECT conv_id, turn_idx, cast(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS int) AS turn_rank, text FROM transcripts"
)

# kg_next_turn_edges — W2 lag/lead chaining
_KG_NEXT_SPARK = f"""
SELECT concat('{NS}turn_', conv_id, '_', cast(turn_idx AS string)) AS subj,
       concat('{NS}turn_', conv_id, '_', cast(next_idx AS string)) AS obj_iri
FROM (
  SELECT conv_id, turn_idx,
         lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_idx
  FROM transcripts
) WHERE next_idx IS NOT NULL
"""
_KG_NEXT_ORACLE = _with_transcripts(
    f"""
SELECT '{NS}turn_' || conv_id || '_' || cast(turn_idx AS varchar) AS subj,
       '{NS}turn_' || conv_id || '_' || cast(next_idx AS varchar) AS obj_iri
FROM (
  SELECT conv_id, turn_idx,
         lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_idx
  FROM transcripts
) t WHERE next_idx IS NOT NULL
"""
)

# kg_sessionize — W5 gap sessionization (30 min)
_KG_SESS_SPARK = """
SELECT conv_id, count(DISTINCT session_n) AS n_sessions, count(*) AS n_turns FROM (
  SELECT conv_id,
         sum(is_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
  FROM (
    SELECT conv_id, turn_idx,
           CASE WHEN lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
                  OR ts > lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM transcripts
  )
) GROUP BY conv_id
"""
_KG_SESS_ORACLE = _with_transcripts(
    """
SELECT conv_id, count(DISTINCT session_n) AS n_sessions, count(*) AS n_turns FROM (
  SELECT conv_id,
         sum(is_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
  FROM (
    SELECT conv_id, turn_idx,
           CASE WHEN lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
                  OR ts > lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM transcripts
  ) a
) b GROUP BY conv_id
"""
)

# kg_dedup_triples — A6 set semantics: distinct triple count per predicate
_KG_DEDUP_SPARK = f"""
WITH t AS (
  SELECT concat('{NS}speaker_', conv_id, '_', role) AS subj, 'hasRole' AS pred,
         concat('{NS}role_', role) AS obj_iri
  FROM transcripts WHERE role IS NOT NULL
)
SELECT pred, count(*) AS n_raw, count(DISTINCT subj, obj_iri) AS n_distinct
FROM t GROUP BY pred
"""
_KG_DEDUP_ORACLE = _with_transcripts(
    f"""
, t AS (
  SELECT '{NS}speaker_' || conv_id || '_' || role AS subj, 'hasRole' AS pred,
         '{NS}role_' || role AS obj_iri
  FROM transcripts WHERE role IS NOT NULL
)
SELECT pred, count(*) AS n_raw, count(DISTINCT (subj, obj_iri)) AS n_distinct
FROM t GROUP BY pred
"""
)

# kg_sentinel_guards — P2 sentinel-value filters on lineitem
_KG_SENTINEL_SPARK = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
WHERE l_returnflag <> 'N' AND l_quantity <> 0 AND cast(l_quantity AS int) <> 99
GROUP BY l_returnflag, l_linestatus
"""
_KG_SENTINEL_ORACLE = _KG_SENTINEL_SPARK

# kg_uncertainty_predicate — P6 flag-driven predicate choice
_KG_UNCERT_SPARK = """
SELECT CASE WHEN o_orderstatus = 'F' AND o_orderpriority LIKE '1%' THEN 'orderedCertain'
            WHEN o_orderstatus = 'F' THEN 'ordered'
            WHEN o_orderstatus = 'O' THEN 'orderedUncertain'
            ELSE 'orderedInferred' END AS pred,
       count(*) AS n
FROM orders GROUP BY 1
"""
_KG_UNCERT_ORACLE = _KG_UNCERT_SPARK

# kg_certainty_bucket — F18 exact SDFB thresholds
_KG_CERT_SPARK = """
SELECT bucket, count(*) AS n FROM (
  SELECT CASE WHEN p <= 19 THEN 'very unlikely '
              WHEN p <= 39 THEN 'unlikely '
              WHEN p <= 59 THEN 'possibly '
              WHEN p <= 79 THEN 'likely '
              WHEN p <= 99 THEN 'very likely '
              ELSE '' END AS bucket
  FROM (SELECT pmod(cast(floor(value * 100) AS int), 101) AS p FROM events)
) GROUP BY bucket
"""
_KG_CERT_ORACLE = """
SELECT bucket, count(*) AS n FROM (
  SELECT CASE WHEN p <= 19 THEN 'very unlikely '
              WHEN p <= 39 THEN 'unlikely '
              WHEN p <= 59 THEN 'possibly '
              WHEN p <= 79 THEN 'likely '
              WHEN p <= 99 THEN 'very likely '
              ELSE '' END AS bucket
  FROM (SELECT cast(floor(value * 100) AS int) % 101 AS p FROM events) a
) b GROUP BY bucket
"""

# kg_date_bounds — F12 wildcard widening (month from orderkey; day wildcard)
_KG_DATE_SPARK = """
SELECT o_orderkey,
       concat(y, '-', bm, '-01T00:00:00') AS earliest,
       concat(y, '-', em, '-', ed, 'T23:59:59') AS latest
FROM (
  SELECT o_orderkey, y,
         CASE WHEN m_raw = '99' THEN '01' ELSE m_raw END AS bm,
         CASE WHEN m_raw = '99' THEN '12' ELSE m_raw END AS em,
         CASE WHEN m_raw = '99'
              THEN cast(day(last_day(to_date(concat(y, '-12-01')))) AS string)
              ELSE cast(day(last_day(to_date(concat(y, '-', m_raw, '-01')))) AS string) END AS ed
  FROM (
    SELECT o_orderkey, cast(year(o_orderdate) AS string) AS y,
           CASE WHEN pmod(o_orderkey, 7) = 0 THEN '99'
                ELSE lpad(cast(month(o_orderdate) AS string), 2, '0') END AS m_raw
    FROM orders
  )
)
"""
_KG_DATE_ORACLE = """
SELECT o_orderkey,
       y || '-' || bm || '-01T00:00:00' AS earliest,
       y || '-' || em || '-' || ed || 'T23:59:59' AS latest
FROM (
  SELECT o_orderkey, y,
         CASE WHEN m_raw = '99' THEN '01' ELSE m_raw END AS bm,
         CASE WHEN m_raw = '99' THEN '12' ELSE m_raw END AS em,
         CASE WHEN m_raw = '99'
              THEN cast(day(last_day(cast(y || '-12-01' AS date))) AS varchar)
              ELSE cast(day(last_day(cast(y || '-' || m_raw || '-01' AS date))) AS varchar) END AS ed
  FROM (
    SELECT o_orderkey, cast(year(o_orderdate) AS varchar) AS y,
           CASE WHEN o_orderkey % 7 = 0 THEN '99'
                ELSE lpad(cast(month(o_orderdate) AS varchar), 2, '0') END AS m_raw
    FROM orders
  ) a
) b
"""

# kg_qualifier_bounds — F17 BF/AF/IN/CA point selection
_KG_QUAL_SPARK = """
SELECT o_orderkey, q,
       CASE q WHEN 'AF/IN' THEN concat(y, '-01-01T00:00:00')
              WHEN 'AF' THEN concat(y, '-12-31T23:59:59')
              WHEN 'IN' THEN concat(y, '-01-01T00:00:00')
              WHEN 'CA' THEN concat(y, '-01-01T00:00:00')
              ELSE NULL END AS bob,
       CASE q WHEN 'BF/IN' THEN concat(y, '-12-31T23:59:59')
              WHEN 'BF' THEN concat(y, '-01-01T00:00:00')
              WHEN 'IN' THEN concat(y, '-12-31T23:59:59')
              WHEN 'CA' THEN concat(y, '-12-31T23:59:59')
              ELSE NULL END AS eob
FROM (
  SELECT o_orderkey, cast(year(o_orderdate) AS string) AS y,
         element_at(array('BF','AF','BF/IN','AF/IN','IN','CA'), cast(pmod(o_orderkey, 6) AS int) + 1) AS q
  FROM orders
)
"""
_KG_QUAL_ORACLE = """
SELECT o_orderkey, q,
       CASE q WHEN 'AF/IN' THEN y || '-01-01T00:00:00'
              WHEN 'AF' THEN y || '-12-31T23:59:59'
              WHEN 'IN' THEN y || '-01-01T00:00:00'
              WHEN 'CA' THEN y || '-01-01T00:00:00'
              ELSE NULL END AS bob,
       CASE q WHEN 'BF/IN' THEN y || '-12-31T23:59:59'
              WHEN 'BF' THEN y || '-01-01T00:00:00'
              WHEN 'IN' THEN y || '-12-31T23:59:59'
              WHEN 'CA' THEN y || '-12-31T23:59:59'
              ELSE NULL END AS eob
FROM (
  SELECT o_orderkey, cast(year(o_orderdate) AS varchar) AS y,
         (['BF','AF','BF/IN','AF/IN','IN','CA'])[(o_orderkey % 6) + 1] AS q
  FROM orders
) a
"""

# kg_reification — G3 qualified statements with md5-hashed statement IRI
_KG_REIFY_SPARK = f"""
WITH e AS (
  SELECT concat('{NS}customer_', cast(o_custkey AS string)) AS s,
         'placedOrder' AS p,
         concat('{NS}order_', cast(o_orderkey AS string)) AS o,
         o_totalprice
  FROM orders
)
SELECT stmt, pred, obj FROM (
  SELECT concat('{NS}stmt_', md5(concat(s, ' ', p, ' ', o))) AS stmt, 'rdf:subject' AS pred, s AS obj FROM e
  UNION ALL
  SELECT concat('{NS}stmt_', md5(concat(s, ' ', p, ' ', o))), 'rdf:predicate', p FROM e
  UNION ALL
  SELECT concat('{NS}stmt_', md5(concat(s, ' ', p, ' ', o))), 'rdf:object', o FROM e
  UNION ALL
  SELECT concat('{NS}stmt_', md5(concat(s, ' ', p, ' ', o))), 'priceBand',
         CASE WHEN o_totalprice < 100 THEN 'low' WHEN o_totalprice < 1000 THEN 'mid' ELSE 'high' END
  FROM e
) t
"""
_KG_REIFY_ORACLE = f"""
WITH e AS (
  SELECT '{NS}customer_' || cast(o_custkey AS varchar) AS s,
         'placedOrder' AS p,
         '{NS}order_' || cast(o_orderkey AS varchar) AS o,
         o_totalprice
  FROM orders
)
SELECT stmt, pred, obj FROM (
  SELECT '{NS}stmt_' || md5(s || ' ' || p || ' ' || o) AS stmt, 'rdf:subject' AS pred, s AS obj FROM e
  UNION ALL
  SELECT '{NS}stmt_' || md5(s || ' ' || p || ' ' || o), 'rdf:predicate', p FROM e
  UNION ALL
  SELECT '{NS}stmt_' || md5(s || ' ' || p || ' ' || o), 'rdf:object', o FROM e
  UNION ALL
  SELECT '{NS}stmt_' || md5(s || ' ' || p || ' ' || o), 'priceBand',
         CASE WHEN o_totalprice < 100 THEN 'low' WHEN o_totalprice < 1000 THEN 'mid' ELSE 'high' END
  FROM e
) t
"""

# kg_sameas_rewrite — G2: rewrite customer→nation triples through a
# canonical map (nation k → nation k - k%5), sameAs-style substitution
_KG_REWRITE_SPARK = f"""
WITH t AS (
  SELECT concat('{NS}customer_', cast(c_custkey AS string)) AS subj,
         'fromNation' AS pred,
         concat('{NS}nation_', cast(c_nationkey AS string)) AS obj_iri
  FROM customer
), m AS (
  SELECT concat('{NS}nation_', cast(n_nationkey AS string)) AS from_iri,
         concat('{NS}nation_', cast(n_nationkey - pmod(n_nationkey, 5) AS string)) AS to_iri
  FROM nation WHERE pmod(n_nationkey, 5) <> 0
)
SELECT t.subj, t.pred, coalesce(m.to_iri, t.obj_iri) AS obj_iri
FROM t LEFT JOIN m ON t.obj_iri = m.from_iri
"""
_KG_REWRITE_ORACLE = f"""
WITH t AS (
  SELECT '{NS}customer_' || cast(c_custkey AS varchar) AS subj,
         'fromNation' AS pred,
         '{NS}nation_' || cast(c_nationkey AS varchar) AS obj_iri
  FROM customer
), m AS (
  SELECT '{NS}nation_' || cast(n_nationkey AS varchar) AS from_iri,
         '{NS}nation_' || cast(n_nationkey - (n_nationkey % 5) AS varchar) AS to_iri
  FROM nation WHERE n_nationkey % 5 <> 0
)
SELECT t.subj, t.pred, coalesce(m.to_iri, t.obj_iri) AS obj_iri
FROM t LEFT JOIN m ON t.obj_iri = m.from_iri
"""

# kg_connected_components — G1 union-find vs DuckDB recursive CTE.
# Deterministic graph: customer→nation stars + chains between consecutive
# nations within a region.
_CC_EDGES_SPARK = """
SELECT concat('c', lpad(cast(c_custkey AS string), 6, '0')) AS src_id,
       concat('n', lpad(cast(c_nationkey AS string), 3, '0')) AS dst_id
FROM customer
UNION ALL
SELECT concat('n', lpad(cast(a.n_nationkey AS string), 3, '0')) AS src_id,
       concat('n', lpad(cast(b.n_nationkey AS string), 3, '0')) AS dst_id
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND b.n_nationkey = a.n_nationkey + 5
"""
_CC_EDGES_ORACLE = """
SELECT 'c' || lpad(cast(c_custkey AS varchar), 6, '0') AS src_id,
       'n' || lpad(cast(c_nationkey AS varchar), 3, '0') AS dst_id
FROM customer
UNION ALL
SELECT 'n' || lpad(cast(a.n_nationkey AS varchar), 3, '0') AS src_id,
       'n' || lpad(cast(b.n_nationkey AS varchar), 3, '0') AS dst_id
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND b.n_nationkey = a.n_nationkey + 5
"""
_KG_CC_ORACLE = f"""
WITH RECURSIVE edges AS ({_CC_EDGES_ORACLE}),
und AS (
  SELECT src_id AS a, dst_id AS b FROM edges
  UNION SELECT dst_id, src_id FROM edges
),
reach AS (
  SELECT a AS node_id, a AS reached FROM und
  UNION SELECT b AS node_id, b AS reached FROM und
  UNION
  SELECT r.node_id, u.b AS reached
  FROM reach r JOIN und u ON r.reached = u.a
)
SELECT node_id, min(reached) AS canonical_id FROM reach GROUP BY node_id
"""


def _kg_cc_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anything2rdf_spark.operators.canonicalize import connected_components

    _load(spark, sf_dir)
    edges = spark.sql(_CC_EDGES_SPARK)
    return connected_components(edges).select("node_id", "canonical_id")


# kg_degree_merge — J7 over supplier↔part pairs from lineitem
_KG_MERGE_SPARK = """
WITH e AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
ld AS (SELECT l_suppkey, count(*) AS sd FROM e GROUP BY l_suppkey),
rd AS (SELECT l_partkey, count(*) AS pd FROM e GROUP BY l_partkey)
SELECT e.l_suppkey, e.l_partkey,
       CASE WHEN ld.sd = 1 AND rd.pd = 1 THEN TRUE ELSE FALSE END AS merge
FROM e JOIN ld ON e.l_suppkey = ld.l_suppkey JOIN rd ON e.l_partkey = rd.l_partkey
"""
_KG_MERGE_ORACLE = _KG_MERGE_SPARK

# kg_get_or_create — J3 via anti-join + deterministic mint
_KG_GOC_SPARK = f"""
SELECT e.user_id,
       coalesce(concat('{NS}entity_', cast(c.c_custkey AS string)),
                concat('{NS}entity_new_u', cast(e.user_id AS string))) AS entity_iri,
       c.c_custkey IS NOT NULL AS matched
FROM (SELECT DISTINCT user_id FROM events) e
LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 10) c
  ON e.user_id = c.c_custkey
"""
_KG_GOC_ORACLE = f"""
SELECT e.user_id,
       coalesce('{NS}entity_' || cast(c.c_custkey AS varchar),
                '{NS}entity_new_u' || cast(e.user_id AS varchar)) AS entity_iri,
       c.c_custkey IS NOT NULL AS matched
FROM (SELECT DISTINCT user_id FROM events) e
LEFT JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 10) c
  ON e.user_id = c.c_custkey
"""

# kg_quarantine — J8 anti-join guard (events whose user misses the dict)
_KG_QUARANTINE_SPARK = """
SELECT e.user_id, count(*) AS n_events
FROM events e
LEFT ANTI JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 10) c
  ON e.user_id = c.c_custkey
GROUP BY e.user_id
"""
_KG_QUARANTINE_ORACLE = """
SELECT e.user_id, count(*) AS n_events
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey < 10 AND c.c_custkey = e.user_id
)
GROUP BY e.user_id
"""

# kg_first_match_precedence — J9 coalesce chain over three dims
_KG_PREC_SPARK = """
SELECT c.c_custkey,
       coalesce(s.s_name, n.n_name, r.r_name) AS resolved
FROM customer c
LEFT JOIN supplier s ON c.c_nationkey = s.s_suppkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_nationkey >= 5
LEFT JOIN (SELECT n_nationkey, r_name FROM nation JOIN region ON n_regionkey = r_regionkey) r
  ON c.c_nationkey = r.n_nationkey
"""
_KG_PREC_ORACLE = _KG_PREC_SPARK

# kg_multivalue_split — F8 split+explode+trim+drop-empties
_KG_SPLIT_SPARK = """
SELECT w AS word, count(*) AS n
FROM part LATERAL VIEW explode(split(p_type, ' ')) AS w
WHERE trim(w) <> ''
GROUP BY w
"""
_KG_SPLIT_ORACLE = """
SELECT w AS word, count(*) AS n
FROM part, unnest(string_split(p_type, ' ')) AS t(w)
WHERE trim(w) <> ''
GROUP BY w
"""

# kg_path_hierarchy — W3 prefix chains over region/nation/nationkey paths
# (procope network-path semantics: a_b_c → a_b → a)
_KG_PATH_SPARK = """
WITH p AS (
  SELECT concat(r_name, '|', n_name, '|', cast(n_nationkey AS string)) AS path
  FROM nation JOIN region ON n_regionkey = r_regionkey
)
SELECT DISTINCT
       array_join(slice(parts, 1, i), '|') AS narrower,
       array_join(slice(parts, 1, i - 1), '|') AS broader
FROM (SELECT split(path, '\\\\|') AS parts FROM p)
LATERAL VIEW explode(sequence(2, size(parts))) AS i
WHERE size(parts) >= 2
"""
_KG_PATH_ORACLE = """
WITH p AS (
  SELECT r_name || '|' || n_name || '|' || cast(n_nationkey AS varchar) AS path
  FROM nation JOIN region ON n_regionkey = r_regionkey
)
SELECT DISTINCT
       array_to_string(parts[1:i], '|') AS narrower,
       array_to_string(parts[1:i-1], '|') AS broader
FROM (SELECT string_split(path, '|') AS parts FROM p) a,
     unnest(generate_series(2, len(parts))) AS t(i)
WHERE len(parts) >= 2
"""

# kg_code_table_join — J1/E3 broadcast dimension join
_KG_CODE_SPARK = f"""
WITH codes AS (
  SELECT * FROM VALUES ('user', 'Human user'), ('assistant', 'AI assistant'),
                       ('system', 'System prompt'), ('tool', 'Tool output')
  AS codes(code, label)
)
SELECT concat('{NS}role_', t.role) AS subj, 'prefLabel' AS pred, c.label AS obj_lit,
       count(*) AS n_uses
FROM transcripts t JOIN codes c ON t.role = c.code
GROUP BY t.role, c.label
"""
_KG_CODE_ORACLE = _with_transcripts(
    f"""
, codes AS (
  SELECT * FROM (VALUES ('user', 'Human user'), ('assistant', 'AI assistant'),
                        ('system', 'System prompt'), ('tool', 'Tool output'))
  AS codes(code, label)
)
SELECT '{NS}role_' || t.role AS subj, 'prefLabel' AS pred, c.label AS obj_lit,
       count(*) AS n_uses
FROM transcripts t JOIN codes c ON t.role = c.code
GROUP BY t.role, c.label
"""
)

# kg_hierarchy_rollup — A5 content rollup over a region→nation→customer tree
# (Spark: bounded transitive-closure joins; oracle: recursive CTE)
_HIER_NODES_SPARK = """
SELECT concat('r', cast(r_regionkey AS string)) AS id, CAST(NULL AS string) AS parent_id, r_name AS content FROM region
UNION ALL
SELECT concat('n', cast(n_nationkey AS string)), concat('r', cast(n_regionkey AS string)), n_name FROM nation
UNION ALL
SELECT concat('c', cast(c_custkey AS string)), concat('n', cast(c_nationkey AS string)), c_name
FROM customer WHERE c_custkey < 40
"""
_HIER_NODES_ORACLE = """
SELECT 'r' || cast(r_regionkey AS varchar) AS id, CAST(NULL AS varchar) AS parent_id, r_name AS content FROM region
UNION ALL
SELECT 'n' || cast(n_nationkey AS varchar), 'r' || cast(n_regionkey AS varchar), n_name FROM nation
UNION ALL
SELECT 'c' || cast(c_custkey AS varchar), 'n' || cast(c_nationkey AS varchar), c_name
FROM customer WHERE c_custkey < 40
"""


def _kg_rollup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anything2rdf_spark.operators.hierarchy import rollup_content

    _load(spark, sf_dir)
    nodes = spark.sql(_HIER_NODES_SPARK)
    return rollup_content(nodes)


_KG_ROLLUP_ORACLE = f"""
WITH RECURSIVE nodes AS ({_HIER_NODES_ORACLE}),
reach AS (
  SELECT id AS anc, id AS node FROM nodes
  UNION ALL
  SELECT r.anc, n.id AS node
  FROM reach r JOIN nodes n ON n.parent_id = r.node
)
SELECT r.anc AS id,
       string_agg(n.content, chr(10) ORDER BY r.node) AS complete_content
FROM reach r JOIN nodes n ON n.id = r.node
GROUP BY r.anc
"""

# ---------------------------------------------------------------------------
# training-data extras over documents / embeddings
# ---------------------------------------------------------------------------

_DEDUP_EXACT_SPARK = """
SELECT doc_id, content_hash,
       min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\\\s+', ' '))) AS content_hash FROM documents)
"""
_DEDUP_EXACT_ORACLE = """
SELECT doc_id, content_hash,
       min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
FROM (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash FROM documents) a
"""

_FINGERPRINT_SPARK = """
SELECT fp, count(*) AS n_docs, min(doc_id) AS canonical_id FROM (
  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' '), '\\\\s+', ' '))) AS fp
  FROM documents
) GROUP BY fp
"""
_FINGERPRINT_ORACLE = """
SELECT fp, count(*) AS n_docs, min(doc_id) AS canonical_id FROM (
  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
  FROM documents
) a GROUP BY fp
"""

_TOKENS_SPARK = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0 ELSE size(split(trim(text), '\\\\s+')) END AS ws_tokens,
       size(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\\\s]', 0)) AS bpe_ish_tokens
FROM documents
"""
_TOKENS_ORACLE = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens
FROM documents
"""

# n-gram Jaccard near-dup pairs on a deterministic subset
_JACCARD_SPARK = """
WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\\\s+', ' ')) AS t FROM documents WHERE doc_id < 80),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', slice(toks, i, 3)) AS s
  FROM (SELECT doc_id, split(t, ' ') AS toks FROM d)
  LATERAL VIEW explode(sequence(1, greatest(size(toks) - 2, 1))) AS i
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT ida, idb, round(cast(i AS double) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
WHERE cast(i AS double) / (sa.sz + sb.sz - i) >= 0.02
"""
_JACCARD_ORACLE = """
WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents WHERE doc_id < 80),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
  FROM (SELECT doc_id, string_split(t, ' ') AS toks FROM d) x,
       unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT ida, idb, round(cast(i AS double) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
WHERE cast(i AS double) / (sa.sz + sb.sz - i) >= 0.02
"""

# exact cosine top-k: double-precision left-fold on both engines, rounded
_COSINE_SPARK = """
WITH c AS (SELECT vec_id, cast(embedding AS array<double>) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, cast(embedding AS array<double>) AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id,
         aggregate(zip_with(c.v, q.qv, (x, y) -> x * y), cast(0.0 AS double), (acc, z) -> acc + z)
         / (sqrt(aggregate(c.v, cast(0.0 AS double), (acc, z) -> acc + z * z))
            * sqrt(aggregate(q.qv, cast(0.0 AS double), (acc, z) -> acc + z * z))) AS cos
  FROM c CROSS JOIN q
)
SELECT query_id, vec_id, cast(rank AS int) AS rank, round(cos, 4) AS cosine_sim FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
"""
_COSINE_ORACLE = """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_inner_product(c.v, q.qv)
         / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(q.qv, q.qv))) AS cos
  FROM c CROSS JOIN q
)
SELECT query_id, vec_id, cast(rank AS int) AS rank, round(cos, 4) AS cosine_sim FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 5
"""

# embedding near-dup pairs (exact, small threshold set)
_NEARDUP_SPARK = """
WITH c AS (SELECT vec_id, cast(embedding AS array<double>) AS v FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS ida, b.vec_id AS idb,
       round(aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 AS double), (acc, z) -> acc + z)
       / (sqrt(aggregate(a.v, cast(0.0 AS double), (acc, z) -> acc + z * z))
          * sqrt(aggregate(b.v, cast(0.0 AS double), (acc, z) -> acc + z * z))), 4) AS cosine_sim
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 AS double), (acc, z) -> acc + z)
      / (sqrt(aggregate(a.v, cast(0.0 AS double), (acc, z) -> acc + z * z))
         * sqrt(aggregate(b.v, cast(0.0 AS double), (acc, z) -> acc + z * z))) >= 0.35
"""
_NEARDUP_ORACLE = """
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS ida, b.vec_id AS idb,
       round(list_inner_product(a.v, b.v)
       / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 4) AS cosine_sim
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.v, b.v)
      / (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))) >= 0.35
"""

# lang id — stopword-hit argmax, EN vs other heuristic (deterministic)
_LANGID_SPARK = """
SELECT lang_guess, count(*) AS n FROM (
  SELECT CASE WHEN size(array_intersect(split(lower(text), '[^a-z]+'),
                                        array('the','and','of','to','a','in','is','with','for','on'))) >= 2
              THEN 'en' ELSE 'und' END AS lang_guess
  FROM documents
) GROUP BY lang_guess
"""
_LANGID_ORACLE = """
SELECT lang_guess, count(*) AS n FROM (
  SELECT CASE WHEN len(list_intersect(regexp_split_to_array(lower(text), '[^a-z]+'),
                                      ['the','and','of','to','a','in','is','with','for','on'])) >= 2
              THEN 'en' ELSE 'und' END AS lang_guess
  FROM documents
) a GROUP BY lang_guess
"""

# quality score — integer-band arithmetic only (no float drift)
_QUALITY_SPARK = """
SELECT doc_id,
       cast(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 40 ELSE 10 END
          + CASE WHEN n_punct * 5 <= n_chars THEN 20 ELSE 10 END
          + CASE WHEN n_stop * 20 >= n_tokens THEN 20 ELSE 12 END AS int) AS quality_pct
FROM (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0 ELSE size(split(trim(text), '\\\\s+')) END AS n_tokens,
         size(regexp_extract_all(text, '[^a-zA-Z0-9\\\\s]', 0)) AS n_punct,
         size(array_intersect(split(lower(text), '[^a-z]+'),
                              array('the','and','of','to','a','in','is','with','for','on'))) AS n_stop
  FROM documents
)
"""
_QUALITY_ORACLE = """
SELECT doc_id,
       cast(CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 40 ELSE 10 END
          + CASE WHEN n_punct * 5 <= n_chars THEN 20 ELSE 10 END
          + CASE WHEN n_stop * 20 >= n_tokens THEN 20 ELSE 12 END AS int) AS quality_pct
FROM (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
         len(list_intersect(regexp_split_to_array(lower(text), '[^a-z]+'),
                            ['the','and','of','to','a','in','is','with','for','on'])) AS n_stop
  FROM documents
) a
"""


# ---------------------------------------------------------------------------
# non-SQL-expressible queries (rows-only checks): pandas-UDF mention scan,
# MinHash-LSH banding, SimHash blocking, LSH ANN, multimodal features
# ---------------------------------------------------------------------------

def _kg_mentions_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anything2rdf_spark.operators.extract import extract_mentions

    _load(spark, sf_dir)
    t = spark.table("transcripts")
    return extract_mentions(t, ["error", "purchase", "signup"]).select(
        "conv_id", "turn_idx", "surface", "norm_surface"
    )


def _dedup_minhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anything2rdf_spark.operators.dedupe import minhash_lsh_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id < 200")
    return minhash_lsh_candidates(docs, shingle_n=3, num_hashes=32, bands=16)


def _dedup_simhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anything2rdf_spark.operators.dedupe import simhash_hamming_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id < 200")
    return simhash_hamming_candidates(docs, max_hamming=8)


def _sim_lsh_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from anything2rdf_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    return lsh_topk(emb, queries, k=5, n_planes=6)


def _multimodal_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anything2rdf_spark.operators.multimodal import extract_features, synth_media

    return extract_features(synth_media(spark, n=128))


def _pipeline_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full staged pipeline over synthetic transcripts (rows-only check —
    the P/R gate lives in pytest against the reference converter)."""
    import tempfile

    from anything2rdf_spark.plans.pipeline import Pipeline
    from anything2rdf_spark.sources import synth

    wh = tempfile.mkdtemp(prefix="a2r_wh_")
    p = Pipeline(spark, wh, n_buckets=8)
    p.run(
        transcripts=synth.transcripts(spark, n_convs=50, seed=42),
        dictionary=synth.entity_dictionary(spark),
        code_tables=synth.code_tables(spark),
        alias_edges=synth.alias_edges(spark, big_chain=100),
        dictionary_surfaces=synth.ALL_MENTION_NAMES,
        fingerprint="entry",
    )
    return p.triples()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-turn triple extraction over the transcripts view
    derived from sf0.001 events."""
    _load(spark, "/root/testdata/sf0.001")
    return spark.sql(_KG_TURN_TRIPLES_SPARK)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # KG core
        "kg_turn_triples": _q(_KG_TURN_TRIPLES_SPARK),
        "kg_turn_ordering": _q(_KG_ORDER_SPARK),
        "kg_next_turn_edges": _q(_KG_NEXT_SPARK),
        "kg_sessionize": _q(_KG_SESS_SPARK),
        "kg_dedup_triples": _q(_KG_DEDUP_SPARK),
        "kg_sentinel_guards": _q(_KG_SENTINEL_SPARK),
        "kg_uncertainty_predicate": _q(_KG_UNCERT_SPARK),
        "kg_certainty_bucket": _q(_KG_CERT_SPARK),
        "kg_date_bounds": _q(_KG_DATE_SPARK),
        "kg_qualifier_bounds": _q(_KG_QUAL_SPARK),
        "kg_reification": _q(_KG_REIFY_SPARK),
        "kg_sameas_rewrite": _q(_KG_REWRITE_SPARK),
        "kg_connected_components": _kg_cc_spark,
        "kg_hierarchy_rollup": _kg_rollup_spark,
        "kg_degree_merge": _q(_KG_MERGE_SPARK),
        "kg_get_or_create": _q(_KG_GOC_SPARK),
        "kg_quarantine": _q(_KG_QUARANTINE_SPARK),
        "kg_first_match_precedence": _q(_KG_PREC_SPARK),
        "kg_multivalue_split": _q(_KG_SPLIT_SPARK),
        "kg_path_hierarchy": _q(_KG_PATH_SPARK),
        "kg_code_table_join": _q(_KG_CODE_SPARK),
        # training-data extras
        "dedup_exact": _q(_DEDUP_EXACT_SPARK),
        "dedup_fingerprint": _q(_FINGERPRINT_SPARK),
        "dedup_ngram_jaccard": _q(_JACCARD_SPARK),
        "text_tokens": _q(_TOKENS_SPARK),
        "text_langid": _q(_LANGID_SPARK),
        "text_quality": _q(_QUALITY_SPARK),
        "sim_cosine_topk": _q(_COSINE_SPARK),
        "sim_embedding_neardup": _q(_NEARDUP_SPARK),
        # non-SQL-expressible (rows-only)
        "kg_mentions_pandas_udf": _kg_mentions_spark,
        "kg_pipeline_full": _pipeline_spark,
        "dedup_minhash_lsh": _dedup_minhash_spark,
        "dedup_simhash": _dedup_simhash_spark,
        "sim_lsh_ann": _sim_lsh_spark,
        "multimodal_features": _multimodal_spark,
    }
    return q


def oracle_sql() -> dict[str, str]:
    return {
        "kg_turn_triples": _KG_TURN_TRIPLES_ORACLE,
        "kg_turn_ordering": _KG_ORDER_ORACLE,
        "kg_next_turn_edges": _KG_NEXT_ORACLE,
        "kg_sessionize": _KG_SESS_ORACLE,
        "kg_dedup_triples": _KG_DEDUP_ORACLE,
        "kg_sentinel_guards": _KG_SENTINEL_ORACLE,
        "kg_uncertainty_predicate": _KG_UNCERT_ORACLE,
        "kg_certainty_bucket": _KG_CERT_ORACLE,
        "kg_date_bounds": _KG_DATE_ORACLE,
        "kg_qualifier_bounds": _KG_QUAL_ORACLE,
        "kg_reification": _KG_REIFY_ORACLE,
        "kg_sameas_rewrite": _KG_REWRITE_ORACLE,
        "kg_connected_components": _KG_CC_ORACLE,
        "kg_hierarchy_rollup": _KG_ROLLUP_ORACLE,
        "kg_degree_merge": _KG_MERGE_ORACLE,
        "kg_get_or_create": _KG_GOC_ORACLE,
        "kg_quarantine": _KG_QUARANTINE_ORACLE,
        "kg_first_match_precedence": _KG_PREC_ORACLE,
        "kg_multivalue_split": _KG_SPLIT_ORACLE,
        "kg_path_hierarchy": _KG_PATH_ORACLE,
        "kg_code_table_join": _KG_CODE_ORACLE,
        "dedup_exact": _DEDUP_EXACT_ORACLE,
        "dedup_fingerprint": _FINGERPRINT_ORACLE,
        "dedup_ngram_jaccard": _JACCARD_ORACLE,
        "text_tokens": _TOKENS_ORACLE,
        "text_langid": _LANGID_ORACLE,
        "text_quality": _QUALITY_ORACLE,
        "sim_cosine_topk": _COSINE_ORACLE,
        "sim_embedding_neardup": _NEARDUP_ORACLE,
    }
