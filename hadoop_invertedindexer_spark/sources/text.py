"""Text directory source with file provenance + side-input loaders.

Reference: ``TextInputFormat`` over an input dir, one split per file
(``/root/reference/src/InvertedIndexer.java:259``); document identity is
the input-file basename taken from the split (``:104-105``); stop-word /
punctuation side inputs ship via DistributedCache and are parsed
line-verbatim into sets (``:53-63,70-98``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan_text(
    spark: SparkSession, path: str, line_col: str = "line", doc_col: str = "filename"
) -> DataFrame:
    """Ops `scan_text` + `doc_provenance` (SURVEY §2A #1-2).

    Reads every file under ``path`` as lines and attaches the source-file
    basename. ``input_file_name()`` is only valid before any shuffle, so
    provenance is captured in the same projection as the scan (SURVEY §4
    risk (c)).
    """
    df = spark.read.text(path)
    return df.select(
        F.col("value").alias(line_col),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias(doc_col),
    )


def load_stopwords(path: str) -> list[str]:
    """Op `side_input_load` (SURVEY §2A #3), stop-word half.

    Line-verbatim, no trim/normalize — the reference adds raw
    ``readLine()`` results to the set (ref :70-81), including quirks like
    ``herse"``. 319 entries for the reference file.
    """
    with open(path, encoding="utf-8") as f:
        # rstrip("\r\n") mirrors BufferedReader.readLine, which strips the
        # terminator whether it is \n or \r\n — a CRLF stop-word file must
        # not leave a trailing \r on every entry.
        return [line.rstrip("\r\n") for line in f]


def load_punctuation_class(path: str) -> str:
    """Op `side_input_load` (SURVEY §2A #3), punctuation half.

    The reference keeps 33 single-char regexes (each ``\\X``) and runs 33
    sequential ``replaceAll`` passes (ref :87-98,107-110). Because every
    pattern is a single independent character and the replacement is a
    space, the exactly-equivalent single pass is one character class —
    built here from the file so arbitrary punctuation files keep working.
    """
    chars: list[str] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            pat = line.rstrip("\r\n")  # readLine semantics: \n or \r\n
            if not pat:
                continue
            chars.append(pat[-1])  # '\X' -> X
    # dedupe preserving order (the reference file lists apostrophe twice)
    seen: set[str] = set()
    uniq = [c for c in chars if not (c in seen or seen.add(c))]
    # build a regex character class; escape metacharacters, '-' goes last
    body = "".join("\\" + c if c in "\\^]'\"[" else c for c in uniq if c != "-")
    if "-" in uniq:
        body += "-"
    return "[" + body + "]"
