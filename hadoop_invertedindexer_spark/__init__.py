"""hadoop_invertedindexer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``zhutongxuan/hadoop-InvertedIndexer`` (a single-job Hadoop MapReduce
inverted indexer, ``/root/reference/src/InvertedIndexer.java``) as an
idiomatic Spark DataFrame library, extended with the relational,
streaming, dedup, similarity and text-analysis surface a large-scale
training-data pipeline needs.

Design rules (see SURVEY.md §4, §7):

* Everything is a plain ``DataFrame -> DataFrame`` transform — no RDDs,
  no custom Catalyst rules. Catalyst handles partial aggregation,
  pushdown, pruning, and join strategy selection.
* Hot-path expressions stay JVM-side (built-in ``pyspark.sql.functions``
  inside whole-stage codegen); Pandas UDFs are used only where built-ins
  cannot express the semantics (none are needed for reference parity).
* Scale posture: no ``collect()`` in any operator, broadcast only for
  provably-small sides, single-file output is an explicit compat flag.
"""

__version__ = "0.1.0"
