"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG pipeline (pages -> annotate ->
triples) at sf0.001.  ``queries()``/``oracle_sql()`` expose every
implemented operator with a DuckDB oracle where SQL-expressible
(see stanza_spark/queries.py and SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: (subj, pred, obj) triples for the sf0.001 corpus."""
    from stanza_spark.queries import q_kg_triples
    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stanza_spark.queries import KG_QUERIES
    out: dict[str, Callable] = {}
    out.update(KG_QUERIES)
    try:
        from stanza_spark.queries_relational import RELATIONAL_QUERIES
        out.update(RELATIONAL_QUERIES)
    except ImportError:
        pass
    try:
        from stanza_spark.queries_textops import TEXTOPS_QUERIES
        out.update(TEXTOPS_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from stanza_spark.queries import kg_oracles
    out: dict[str, str] = {}
    out.update(kg_oracles())
    try:
        from stanza_spark.queries_relational import relational_oracles
        out.update(relational_oracles())
    except ImportError:
        pass
    try:
        from stanza_spark.queries_textops import textops_oracles
        out.update(textops_oracles())
    except ImportError:
        pass
    return out
