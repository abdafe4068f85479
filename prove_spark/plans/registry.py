"""Unified query registry: name → (spark_fn, oracle_sql | None).

Drives __spark_entry__.queries()/oracle_sql(). KG-pipeline queries have no
SQL oracle (the transcript derivation + mention kernels are not SQL-
expressible); their correctness gate is the pytest golden-equivalence suite
(tests/test_pipeline_golden.py) against the pandas oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .advanced import ADVANCED_QUERIES
from .disambig import DISAMBIG_QUERIES
from .relational import RELATIONAL_QUERIES
from .textops import TEXTOPS_QUERIES


# caches persisted by the previous kg_* invocation — released on the next
# call so repeated registry runs (bench loops, the driver's sweep) don't
# accumulate dead cached intermediates
_KG_CACHES: list = []


def _kg_build(spark, sf_dir):
    from ..datagen import transcripts_df
    from ..pipeline.run import build_triples

    for df in _KG_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _KG_CACHES.clear()
    return build_triples(
        spark, transcripts_df(spark, sf_dir), cache_registry=_KG_CACHES
    )


def kg_triples(spark, sf_dir):
    """Full KG-construction pipeline: transcripts → verified canonical triples."""
    return _kg_build(spark, sf_dir)


def kg_entity_rollup(spark, sf_dir):
    """Per-entity verdict counts + proveScore (A6) over the KG output."""
    from ..pipeline.run import entity_rollup

    return entity_rollup(_kg_build(spark, sf_dir))


def kg_top_supported(spark, sf_dir):
    """Top-10 entities by supported-claim count (the flagship read query)."""
    return (
        kg_entity_rollup(spark, sf_dir)
        .orderBy(F.desc("n_supports"), F.asc("subj"))
        .limit(10)
    )


def kg_entities(spark, sf_dir):
    """The entities dimension table (canonical id, label, members, stats)."""
    from ..pipeline.run import build_entities

    return build_entities(spark, _kg_build(spark, sf_dir))


KG_QUERIES: dict[str, tuple] = {
    "kg_triples": (kg_triples, None),
    "kg_entity_rollup": (kg_entity_rollup, None),
    "kg_top_supported": (kg_top_supported, None),
    "kg_entities": (kg_entities, None),
}

ALL_QUERIES: dict[str, tuple] = {
    **RELATIONAL_QUERIES,
    **TEXTOPS_QUERIES,
    **ADVANCED_QUERIES,
    **DISAMBIG_QUERIES,
    **KG_QUERIES,
}
