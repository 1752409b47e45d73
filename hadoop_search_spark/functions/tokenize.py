"""Tokenization — reference operators P2-P5, P8 (SURVEY.md §2.2).

Reference behavior (`hadoop_wiki_search/code/inverted/
InvertedIndexMapred.java:57,69-80` and `code/wordcount/
WordCountMapred.java:41,47-53`):

* split on the delimiter set ``"  \\t\\r\\n,.:;'\\"()[]{}/<>!?\\|-—–#$&=_*+"``
  (Java StringTokenizer: runs of delimiters produce no empty tokens);
* lowercase every token;
* assign 1-based positions counting the **raw token stream before any
  filtering** (P8) — filters run after position assignment;
* wordcount path drops pure-numeric tokens (P4);
* index path additionally keeps only ``[a-z0-9]+`` tokens (P5).

Everything here is built-in Catalyst expressions (split / filter /
posexplode / rlike) — no Python in the hot path, so the whole
tokenize stage stays inside WholeStageCodegen and scales linearly
with input partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same character set as the reference's StringTokenizer delimiters.
DELIM_CHARS = " \t\r\n,.:;'\"()[]{}/<>!?\\|-\u2014\u2013#$&=_*+"
# Regex character class matching one-or-more delimiters (so runs of
# delimiters behave like StringTokenizer: no empty tokens).
DELIM_REGEX = r"""[\s,.:;'"()\[\]{}/<>!?\\|\-\u2014\u2013#$&=_*+]+"""

NUMERIC_RE = r"^[0-9]+$"  # P4
ALNUM_RE = r"^[a-z0-9]+$"  # P5


def tokens_array(text: Column) -> Column:
    """Lowercased non-empty token array, order-preserving."""
    return F.filter(F.split(F.lower(text), DELIM_REGEX), lambda t: t != "")


def tokenize_with_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_numeric: bool = True,
    require_alnum: bool = False,
) -> DataFrame:
    """Explode ``(id, text)`` into ``(id, token, pos)`` rows.

    ``pos`` is 1-based over the raw (pre-filter) token stream, matching
    the reference's position semantics (P8): filters apply *after*
    position assignment, so positions of surviving tokens reflect their
    place among all tokens.
    """
    from hadoop_search_spark.partitioning import spread

    toks = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.posexplode(tokens_array(F.col(text_col))).alias("pos0", "token"),
    ).select(
        F.col(id_col),
        F.col("token"),
        (F.col("pos0") + 1).alias("pos"),
    )
    if drop_numeric:
        toks = toks.filter(~F.col("token").rlike(NUMERIC_RE))
    if require_alnum:
        toks = toks.filter(F.col("token").rlike(ALNUM_RE))
    return toks
