"""The three deterministic binary document raters shared by the
inter-rater statistics family.

Cohen's kappa / McNemar (raters A+B), Fleiss' kappa and Cochran's Q
(raters A+B+C) are only comparable BECAUSE they audit the same raters
— this module makes that invariant structural instead of a
constants-kept-in-lockstep convention (round-8 review finding). Each
rater exists twice by design: a Spark Column expression and the
character-identical DuckDB SQL fragment, both returning 1/0.

  A — "substantial by raw length":      n_chars >= RATER_CHAR_MIN
  B — "substantial by token count":     whitespace tokens >= RATER_TOKEN_MIN
      (token identity = space count + 1, pinned across engines)
  C — "contains running English prose": text LIKE '% the %'
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RATER_CHAR_MIN = 300
RATER_TOKEN_MIN = 55


def rater_a() -> Column:
    return F.when(F.col("n_chars") >= RATER_CHAR_MIN, 1).otherwise(0)


def rater_b() -> Column:
    toks = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    return F.when(toks >= RATER_TOKEN_MIN, 1).otherwise(0)


def rater_c() -> Column:
    return F.when(F.col("text").like("% the %"), 1).otherwise(0)


RATER_A_SQL = f"CASE WHEN n_chars >= {RATER_CHAR_MIN} THEN 1 ELSE 0 END"
RATER_B_SQL = (
    "CASE WHEN length(text) - length(replace(text, ' ', ''))"
    f" + 1 >= {RATER_TOKEN_MIN} THEN 1 ELSE 0 END"
)
RATER_C_SQL = "CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END"
