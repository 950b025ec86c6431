"""Sources and sinks."""

from hadoop_invertedindexer_spark.sources.text import (  # noqa: F401
    scan_text,
    load_stopwords,
    load_punctuation_class,
)
from hadoop_invertedindexer_spark.sources.tables import read_table, TABLES  # noqa: F401
from hadoop_invertedindexer_spark.sources.sinks import sink_text, sink_parquet  # noqa: F401
