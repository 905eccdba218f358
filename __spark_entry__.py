"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG pipeline (pages -> annotate ->
triples) at sf0.001.  ``queries()``/``oracle_sql()`` expose every
implemented operator with a DuckDB oracle where SQL-expressible
(see stanza_spark/queries.py and SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# ... and for executors' python workers too (a foreign-cwd driver session
# doesn't propagate sys.path): ship the package like spark-submit
# --py-files would.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _ensure_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_stanza_spark_shipped", False):
        return
    import shutil
    import tempfile
    zdir = tempfile.mkdtemp(prefix="stanza-spark-pkg-")
    zpath = shutil.make_archive(os.path.join(zdir, "stanza_spark"), "zip",
                                root_dir=_REPO, base_dir="stanza_spark")
    sc.addPyFile(zpath)
    sc._stanza_spark_shipped = True


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_package(spark)
        return fn(spark, sf_dir)
    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: (subj, pred, obj) triples for the sf0.001 corpus."""
    _ensure_package(spark)
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
    return {k: _wrap(v) for k, v in out.items()}


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
