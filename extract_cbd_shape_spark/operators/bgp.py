"""Basic-graph-pattern (BGP) queries over triple DataFrames.

The reference constructs per-entity subgraphs (CBD + shape extraction,
lib/CBDShapeExtractor.ts); consuming the constructed graph at corpus
scale needs the dual operation — SPARQL-style conjunctive pattern
matching. This operator covers the SELECT/BGP core as a pure
DataFrame composition:

- each triple pattern compiles to ONE filtered projection of the
  triples scan: constant positions become equality filters (pushed to
  the parquet scan as PushedFilters — a pattern with a constant
  predicate never reads other predicates' row groups when the table is
  sorted/partitioned by predicate), variable positions become column
  aliases;
- shared variables across patterns become equi-join keys; Catalyst
  reorders the joins and AQE decides broadcast vs shuffle per side at
  runtime (a selective pattern's output is typically broadcast into
  the star);
- a variable repeated WITHIN a pattern is an intra-row equality filter.

Scale notes (100 TB triples table): star patterns (shared subject
variable) are subject-key equi-joins — on a `materialize_table(
bucket_by="subject")` layout every join side is already clustered by
the key, so AQE plans shuffle-free or one-sided exchanges; path
patterns (object of one pattern = subject of the next) shuffle once
per hop, the same cost shape as the extraction engine's BFS waves.
Matching is by term VALUE: the engine's triple tables keep IRIs,
blanks, and literals in disjoint value spaces (`doc:`/`_:`/plain), so
value equality is term equality; pass ``with_kinds=True`` to join on
(value, kind) pairs when the corpus does not guarantee that.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("subject", "predicate", "object_value")
_KIND = {"subject": "subject_kind", "object_value": "object_kind"}


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _compile_pattern(triples: DataFrame, pat, with_kinds: bool) -> DataFrame:
    if len(pat) != 3:
        raise ValueError(f"pattern must be (s, p, o): {pat!r}")
    df = triples
    cols = []
    seen = {}
    for pos, term in zip(_POS, pat):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"bare '?' in pattern {pat!r}")
            if name in seen:
                df = df.filter(F.col(pos) == F.col(seen[name]))
            else:
                seen[name] = pos
                cols.append(F.col(pos).alias(name))
                if with_kinds and pos in _KIND:
                    cols.append(F.col(_KIND[pos]).alias(name + "_kind"))
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    return df.select(*cols)


def _compile_bgp(triples: DataFrame, patterns, with_kinds: bool) -> DataFrame:
    if not patterns:
        raise ValueError("empty basic graph pattern")
    out = None
    for pat in patterns:
        df = _compile_pattern(triples, pat, with_kinds)
        if out is None:
            out = df
        else:
            common = [c for c in out.columns if c in df.columns]
            out = out.join(df, on=common) if common else out.crossJoin(df)
    return out


def bgp_match(
    triples: DataFrame,
    patterns: Sequence[Tuple[str, str, str]],
    select: Optional[Sequence[str]] = None,
    distinct: bool = False,
    with_kinds: bool = False,
    optional: Optional[Sequence[Sequence[Tuple[str, str, str]]]] = None,
    filters: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Match a conjunction of (subject, predicate, object) patterns.

    Terms starting with ``?`` are variables; anything else is a
    constant matched against the column value. Returns one column per
    variable (plus ``<var>_kind`` columns when ``with_kinds``).
    Patterns sharing no variable with the accumulated prefix are a
    cartesian product (allowed, as in SPARQL, but usually a query
    bug — keep patterns connected).

    ``optional``: SPARQL OPTIONAL groups. Each group is itself a BGP
    (a pattern list) compiled and LEFT-joined to the accumulated
    solution on its shared variables (groups apply in order, each
    seeing earlier groups' bindings); its exclusive variables are null
    where the group found no match — exactly SPARQL's compatible-
    solution extension for well-designed patterns. A group sharing no
    variable with the solution raises (that's a cross-join OPTIONAL —
    reject loudly rather than explode).

    ``filters``: SPARQL FILTER expressions as Spark SQL boolean strings
    over the variable columns (e.g. ``"pc < '5000'"``); applied after
    all joins, so they may reference optional bindings. SQL NULL (an
    unbound optional variable) drops the row, matching SPARQL's
    error-eliminates semantics for comparisons on unbound variables.
    Catalyst still pushes filter conjuncts below the joins whenever
    null-semantics allow — write filters declaratively, don't pre-place
    them.
    """
    out = _compile_bgp(triples, patterns, with_kinds)
    for group in optional or []:
        df = _compile_bgp(triples, group, with_kinds)
        common = [c for c in out.columns if c in df.columns]
        if not common:
            raise ValueError(
                f"OPTIONAL group shares no variable with the solution: {group!r}"
            )
        out = out.join(df, on=common, how="left")
    for expr in filters or []:
        out = out.filter(F.expr(expr))
    if select is not None:
        out = out.select(*[v[1:] if _is_var(v) else v for v in select])
    return out.distinct() if distinct else out
