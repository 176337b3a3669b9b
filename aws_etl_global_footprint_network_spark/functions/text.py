"""Text-analysis expression builders ([EXT]): tokenisation, shingles,
quality stats, language-ID heuristics, document fingerprints.

Built-ins only (``split`` / higher-order array functions) so the hot
path is codegen'd; each builder has a DuckDB ``*_sql`` twin for the
oracle. Tokenisation contract (identical in both engines, pinned by
the oracle harness): lowercase, split on runs of non-alphanumerics,
drop empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """array<string> of normalised tokens.

    ``array_remove(split(...), '')`` rather than a ``filter`` lambda:
    identical semantics, but it is a plain codegen-able builtin — a
    higher-order lambda here would be interpreted AND re-evaluated
    per output row anywhere this expression gets inlined into a
    generator (measured ~3s of the minhash pipeline at sf0.1)."""
    return F.array_remove(F.split(F.lower(_col(c)), "[^a-z0-9]+"), "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'),"
        f" t -> t <> '')"
    )


def word_shingles(toks: Column | str, n: int = 3) -> Column:
    """n-word shingles joined by a single space: array<string>.

    Empty array when the document has fewer than n tokens.
    """
    t = _col(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + F.lit(j)) for j in range(n)]
        ),
    )


def word_shingles_sql(toks_name: str, n: int = 3) -> str:
    """DuckDB twin; ``toks_name`` must be a (CTE) column holding the
    token array — it is referenced multiple times."""
    parts = " || ' ' || ".join(f"{toks_name}[i+{j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({toks_name}) - {n - 1}, 0) + 1),"
        f" i -> {parts})"
    )
