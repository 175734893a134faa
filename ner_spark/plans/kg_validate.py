"""SHACL-lite graph validation: declarative shape constraints checked
over the (usually entailed) triple relation, emitting one row per
violation.

A KG-construction pipeline needs a quality gate between materialize
and publish — the reference's implicit invariants (every repo declares
at least one entity, ner-web renders LINKED_TO badges assuming kb ids
look like ``kb:*``) become explicit, machine-checkable shapes here.
The constraint vocabulary is the workhorse SHACL core subset:

- ``target_class``  — focus nodes are the INSTANCE_OF members
- ``pred``          — the property the shape constrains
- ``min_count`` / ``max_count`` — per-focus cardinality bounds
- ``obj_pattern``   — every object must match the regex
- ``obj_class``     — every object must itself be INSTANCE_OF that class

Output: ``(shape_id, focus, constraint, value)`` with ``constraint``
in {minCount, maxCount, pattern, class} and ``value`` the observed
count (count constraints) or the offending object (value constraints).
An empty result means the graph conforms.

Scale shape: shapes are a broadcast dimension; focus selection is a
pred-pruned scan of INSTANCE_OF triples; the per-focus edge join is
one hash join keyed (subj, pred) followed by a map-side-combinable
count; the class-membership check is a broadcast-right? no — a plain
left_anti against the (again pred-pruned) type relation.  Nothing
scans the full triple table more than twice, nothing is quadratic in
the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.plans.kg_infer import RDF_TYPE

SHAPES_SCHEMA = (
    "shape_id string, target_class string, pred string, "
    "min_count int, max_count int, obj_pattern string, obj_class string"
)

# Demo shapes over the entailed gold KG (kg_infer.ontology): exercised
# constraints include a conforming pattern (entity ids are ent:*), a
# conforming class constraint (LINKED_TO objects are class:KbRecord by
# the range rule), and cardinality bounds tight enough that the gold
# graph actually violates some — a validator whose fixture never fires
# is untested by construction.
SHAPES_ROWS = [
    ("repo_declares", "class:Repository", "DECLARES", 1, None, "^ent:", None),
    ("entity_kb_link", "class:Agent", "LINKED_TO", 1, 1, None, "class:KbRecord"),
    ("entity_comention", "class:Thing", "MENTIONED_WITH", None, 3, None, "class:Thing"),
    ("kb_id_format", "class:Agent", "LINKED_TO", None, None, "^Q[0-9]+$", None),
]


def shapes(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [tuple(r) for r in SHAPES_ROWS], SHAPES_SCHEMA
    )


def validate(triples: DataFrame, shape_df: DataFrame) -> DataFrame:
    """Check every shape against the triple relation; see module doc.

    ``triples`` needs (subj, pred, obj) and is expected to be DISTINCT
    per triple (materialize/entail output is) — value violations are
    reported once per offending (shape, focus, object)."""
    t = triples.select("subj", "pred", "obj")
    types = t.where(F.col("pred") == RDF_TYPE).select(
        F.col("subj").alias("t_subj"), F.col("obj").alias("t_cls")
    )
    foc = (
        types.join(
            F.broadcast(shape_df),
            types["t_cls"] == F.col("target_class"),
        )
        .select(
            "shape_id",
            F.col("t_subj").alias("focus"),
            F.col("pred").alias("s_pred"),
            "min_count",
            "max_count",
            "obj_pattern",
            "obj_class",
        )
        .distinct()
    )
    edges = t.select(
        F.col("subj").alias("e_subj"),
        F.col("pred").alias("e_pred"),
        F.col("obj").alias("e_obj"),
    )
    matched = foc.join(
        edges,
        (F.col("focus") == F.col("e_subj"))
        & (F.col("s_pred") == F.col("e_pred")),
        "left",
    )

    counts = matched.groupBy(
        "shape_id", "focus", "min_count", "max_count"
    ).agg(F.count("e_obj").alias("n"))
    min_v = counts.where(
        F.col("min_count").isNotNull() & (F.col("n") < F.col("min_count"))
    ).select(
        "shape_id", "focus", F.lit("minCount").alias("constraint"),
        F.col("n").cast("string").alias("value"),
    )
    max_v = counts.where(
        F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))
    ).select(
        "shape_id", "focus", F.lit("maxCount").alias("constraint"),
        F.col("n").cast("string").alias("value"),
    )
    pat_v = matched.where(
        F.col("obj_pattern").isNotNull()
        & F.col("e_obj").isNotNull()
        & ~F.regexp_like(F.col("e_obj"), F.col("obj_pattern"))
    ).select(
        "shape_id", "focus", F.lit("pattern").alias("constraint"),
        F.col("e_obj").alias("value"),
    )
    cls_v = (
        matched.where(
            F.col("obj_class").isNotNull() & F.col("e_obj").isNotNull()
        )
        .join(
            types,
            (F.col("e_obj") == F.col("t_subj"))
            & (F.col("obj_class") == F.col("t_cls")),
            "left_anti",
        )
        .select(
            "shape_id", "focus", F.lit("class").alias("constraint"),
            F.col("e_obj").alias("value"),
        )
    )
    return min_v.unionByName(max_v).unionByName(pat_v).unionByName(cls_v)
