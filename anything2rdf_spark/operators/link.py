"""Stage 3: entity linking (SURVEY §2.6 J1-J4, J9; §7.1 step 4).

Dictionary-based linking of detected mentions against the entity dictionary
— the DataFrame re-expression of the reference's two-pass HashMap pattern
(build map in pass 1, probe in pass 2; EMLOCSV2RDF.scala:109-116, 380-386):

* the dictionary becomes a broadcast dimension (J1),
* surface forms are normalized identically on both sides (NFC + lowercase +
  punct-trim, HelmetMARC2ISBNRDF.scala:46-63),
* ambiguity resolves by *first-match precedence* (J9,
  EMLOCSV2RDF.scala:430-432): pref_label beats alt_label, then min entity_id,
* unmatched mentions take the *get-or-create* path (J3,
  EMLOCSV2RDF.scala:310-336): a new entity IRI minted deterministically from
  the normalized surface — done as a stage-level anti-join + union, never
  per-row mutation,
* skewed mention keys (a hot surface form at 10^12 turns) are handled by
  AQE skew-join plus an optional explicit salt (``salt_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import NS, RDF_TYPE, SCHEMA_NS, SKOS_ALT_LABEL, SKOS_PREF_LABEL
from .. import iri
from ..functions import text as TX
from ..schemas import TRIPLE_COLS
from .extract import P_MENTIONS, _t

C_ENTITY = SCHEMA_NS + "Entity"


def surface_index(dictionary: DataFrame) -> DataFrame:
    """Dictionary → normalized surface lookup (norm_surface → entity_id).

    One row per (surface form, entity); synonyms registered as extra keys
    exactly like the reference's ``locationMap`` synonym registration
    (EMLOCSV2RDF.scala:318-336). ``is_pref`` drives first-match precedence.
    Ambiguous surfaces collapse to ONE winner here — precedence pref > alt,
    then min entity_id — so the probe join is 1:1 and never fans out.
    """
    pref = dictionary.select(
        TX.norm_surface("pref_label").alias("norm_surface"),
        F.col("entity_id"),
        F.lit(True).alias("is_pref"),
    ).filter(F.col("norm_surface").isNotNull() & (F.col("norm_surface") != ""))
    alt = dictionary.select(
        F.explode_outer("alt_labels").alias("alt"), "entity_id"
    ).select(
        TX.norm_surface("alt").alias("norm_surface"),
        "entity_id",
        F.lit(False).alias("is_pref"),
    ).filter(F.col("norm_surface").isNotNull() & (F.col("norm_surface") != ""))
    both = pref.unionByName(alt)
    # deterministic first-match precedence (J9)
    return (
        both.groupBy("norm_surface")
        .agg(
            F.min(
                F.struct(
                    (~F.col("is_pref")).alias("alt_first"),  # False(pref) sorts first
                    F.col("entity_id"),
                )
            ).alias("w")
        )
        .select("norm_surface", F.col("w.entity_id").alias("entity_id"))
    )


def link_mentions(
    mentions: DataFrame,
    dictionary: DataFrame,
    ns: str = NS,
    broadcast_dict: bool = True,
) -> DataFrame:
    """Mentions → linked mentions with get-or-create minting.

    Returns (conv_id, turn_idx, surface, norm_surface, entity_iri, matched).
    Matched mentions link to ``ns+entity_<id>``; unmatched mint
    ``ns+entity-new_<norm_surface>`` (deterministic natural-key IRI — the
    get-or-create path without row-level mutation, SURVEY §7.2 hard-part 5).
    The minted kind is ``entity-new`` (hyphen): ``entity_new_<x>`` would be
    IDENTICAL to a real dictionary IRI whose entity_id starts with ``new_``
    (url_encode leaves '_' unescaped), silently merging two distinct nodes;
    'entity-' vs 'entity_' can never collide.
    """
    idx = surface_index(dictionary)
    if broadcast_dict:
        idx = F.broadcast(idx)
    joined = mentions.join(idx, "norm_surface", "left")
    return joined.select(
        "conv_id",
        "turn_idx",
        "surface",
        "norm_surface",
        F.coalesce(
            iri.entity_iri("entity_id", ns=ns),
            iri.mint("entity-new", "norm_surface", ns=ns),
        ).alias("entity_iri"),
        F.col("entity_id").isNotNull().alias("matched"),
    )


def new_entities(linked: DataFrame) -> DataFrame:
    """Distinct get-or-create entities to union back into the dictionary
    (stage-level, EMLOCSV2RDF.scala:331 get-or-create made set-at-a-time)."""
    return (
        linked.filter(~F.col("matched"))
        .groupBy("norm_surface")
        .agg(F.min("surface").alias("pref_label"), F.min("entity_iri").alias("entity_iri"))
    )


def mention_triples(linked: DataFrame, ns: str = NS) -> DataFrame:
    """Linked mentions → ``turn —mentions→ entity`` triples (E8)."""
    return linked.select(
        iri.turn_iri(ns=ns).alias("subj"),
        F.lit(P_MENTIONS).alias("pred"),
        F.col("entity_iri").alias("obj_iri"),
        F.lit(None).cast("string").alias("obj_lit"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
        "conv_id",
        "turn_idx",
    ).select(*TRIPLE_COLS)


def dictionary_triples(dictionary: DataFrame, ns: str = NS) -> DataFrame:
    """Dictionary → entity declaration triples: rdf:type (kind class),
    skos:prefLabel (lang-tagged), skos:altLabel per synonym (E1/E5;
    label emission per Anything2RDF.scala:126-144)."""
    e = iri.entity_iri(ns=ns)
    kind_class = F.concat(F.lit(SCHEMA_NS), iri.camel_case("kind"))
    head = [
        _t(e, RDF_TYPE, obj_iri=F.lit(C_ENTITY)),
        _t(e, RDF_TYPE, obj_iri=kind_class, guard=F.col("kind").isNotNull()),
        _t(e, SKOS_PREF_LABEL, obj_lit=F.col("pref_label"), lang=F.col("lang")),
    ]
    base = (
        dictionary.select(F.explode(F.array(*head)).alias("r"))
        .filter(F.col("r").isNotNull())
        .select("r.*")
    )
    alts = dictionary.select(
        e.alias("subj"),
        F.lit(SKOS_ALT_LABEL).alias("pred"),
        F.lit(None).cast("string").alias("obj_iri"),
        F.explode_outer("alt_labels").alias("obj_lit"),
        F.col("lang").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
    ).filter(F.col("obj_lit").isNotNull())
    out = base.unionByName(alts)
    return out.select(
        "subj", "pred", "obj_iri", "obj_lit", "obj_lang", "obj_dtype",
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )


def salt_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Explicit skew-salted equi-join (north_rule mandate, beyond AQE).

    The big side gets a deterministic salt ``pmod(xxhash64(all cols), n)``;
    the small side is exploded ×n_salts; join on (key, salt). Use when one
    key holds a double-digit share of rows (the hot conv_id / hot surface
    case, SURVEY §7.2 hard-part 4). Small side must be dimension-sized
    (it is replicated n_salts times, then broadcast).
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = salted_big.join(F.broadcast(salted_small), [key, "_salt"], how)
    return out.drop("_salt")


def composite_key_link(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    value_col: str,
    how: str = "left",
) -> DataFrame:
    """J2: composite-key dictionary join — the (work, author, lang) →
    abstract-work probe (HelmetMARC2ISBNRDF.scala:79-101). Multi-valued key
    columns must be exploded by the caller first (the reference's cartesian
    over field combinations)."""
    return facts.join(F.broadcast(dim.select(*keys, value_col)), keys, how)


def precedence_link(
    facts: DataFrame,
    dims: list[tuple[DataFrame, str]],
    key: str,
) -> DataFrame:
    """J9: first-match precedence over several dictionaries — chained left
    joins + coalesce in priority order (the getOrElse chain,
    EMLOCSV2RDF.scala:430-432). ``dims``: [(dim_df, value_col)] in priority
    order; dim_df has columns (key, value_col). Adds column ``resolved``."""
    out = facts
    vals = []
    for i, (dim, vcol) in enumerate(dims):
        alias = f"_prec_{i}"
        out = out.join(
            F.broadcast(dim.select(F.col(key), F.col(vcol).alias(alias))), key, "left"
        )
        vals.append(F.col(alias))
    out = out.withColumn("resolved", F.coalesce(*vals))
    return out.drop(*[f"_prec_{i}" for i in range(len(dims))])
