"""Store-local extraction fast path (applyInPandas per store).

When every member's relevant quads live inside one store slice — an
LDES page, a crawled document, a named-graph bundle — which is the
reference's own operating regime (``bulkExtract`` runs over ONE page
store, lib/CBDShapeExtractor.ts:68-127), a global frontier fixpoint is
overkill: the whole extraction for a store fits in one executor task.

This module shuffles quads ONCE by a caller-supplied ``store_key``,
cogroups the member seeds by the same key, and runs the complete
CBD + shape-guided algorithm per store inside an Arrow-batched
``applyInPandas``. Semantics are identical to ``operators/extract.py``
(the same golden fixtures and DuckDB oracles run against both engines);
only the physical strategy differs — the same kind of choice Spark
makes between a broadcast and a shuffle join, made here at the
granularity of the whole algorithm:

* global engine (extract.py): arbitrary cross-store graphs, giant
  stores, shared dimension entities -> driver-coordinated DataFrame
  fixpoints;
* local engine (this file): store-partitioned corpora -> one shuffle +
  embarrassingly parallel per-store Python, no driver rounds, no
  global state. At 10^12 documents this is the throughput path; a
  skewed giant store falls back to the global engine.

The per-store algorithm mirrors the reference's recursive lifecycle
(extract -> extractRecursively -> CBD / path match / nodeLink,
lib/CBDShapeExtractor.ts:305-508) re-derived from SURVEY.md §3 — the
trie is the same reduced-word set used by the bulk engine
(shapes/ast.py), so found() gating and required-path validation are
shared code, not a re-implementation.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_cbd_shape_spark.model import BLANK, IRI, LITERAL, Term
from extract_cbd_shape_spark.shapes.ast import (
    ROOT_WORD,
    AlternativePath,
    InversePath,
    MultiPath,
    Path,
    PredicatePath,
    SequencePath,
    extend_word,
)
from extract_cbd_shape_spark.shapes.compiler import ShapesGraph

# Quad tuple layout inside a store (matches model.QUAD_COLS order).
_S, _SK, _P, _OV, _OK, _OL, _OD, _G, _GK = range(9)

RESULT_SCHEMA = (
    "entity string, subject string, subject_kind tinyint, predicate string, "
    "object_value string, object_kind tinyint, object_lang string, "
    "object_datatype string, graph string, graph_kind tinyint"
)


class _Store:
    """In-memory quad store for ONE store slice, indexed the three ways
    the algorithm looks things up (SPOG / POSG / GSPO of SURVEY §1.2)."""

    def __init__(self, quads: List[tuple]):
        self.quads = quads
        self.by_subject: Dict[tuple, List[tuple]] = {}
        self.by_object: Dict[tuple, List[tuple]] = {}
        self.by_graph: Dict[tuple, List[tuple]] = {}
        for q in quads:
            self.by_subject.setdefault((q[_SK], q[_S]), []).append(q)
            if q[_OK] != LITERAL:
                self.by_object.setdefault((q[_OK], q[_OV]), []).append(q)
            if q[_G] is not None:
                self.by_graph.setdefault((q[_GK], q[_G]), []).append(q)


class _MemberRun:
    """One member's extraction over a _Store (reference ExtractInstance,
    lib/CBDShapeExtractor.ts:173-341)."""

    def __init__(self, store: _Store, shapes: Optional[ShapesGraph],
                 entity: tuple, member_graphs: Set[tuple],
                 graphs_to_ignore: Set[tuple], cbd_default_graph: bool):
        self.store = store
        self.shapes = shapes
        self.entity = entity  # (kind, value)
        self.member_graphs = member_graphs
        self.graphs_to_ignore = graphs_to_ignore
        self.cbd_default_graph = cbd_default_graph
        self.result: Set[tuple] = set()
        self.words: Set[str] = {ROOT_WORD}
        self.visited_cbd: Set[tuple] = set()
        self.visited_shape: Set[tuple] = set()
        self.missing: List[tuple] = []  # (node_value, shape_key, error)

    # -- graph filter (lib/Path.ts:66, lib/CBDShapeExtractor.ts:95-99) --

    def _graph_ok(self, q: tuple) -> bool:
        if q[_G] is None:
            return True
        g = (q[_GK], q[_G])
        if g in self.graphs_to_ignore:
            return False
        if g in self.member_graphs and g != self.entity:
            return False  # bulk isolation: other members' named graphs
        return True

    # ----------------- CBD (lib/CBDShapeExtractor.ts:472-508) -----------------

    def cbd(self, node: tuple, pos: str) -> None:
        # Explicit iterator stack (recursion-eliminated but identical
        # pre-order + visited marks): a blank-node chain deeper than
        # CPython's frame limit must not kill the executor.
        if node in self.visited_cbd:
            return
        self.visited_cbd.add(node)
        stack = [(pos, iter(self.store.by_subject.get(node, ())))]
        while stack:
            pos, it = stack[-1]
            descended = False
            for q in it:
                if self.cbd_default_graph and q[_G] is not None:
                    continue
                if not self._graph_ok(q):
                    continue
                self.result.add(q)
                word = extend_word(pos, q[_P], False)
                self.words.add(word)
                if q[_OK] == BLANK:
                    child = (BLANK, q[_OV])
                    if child not in self.visited_cbd:
                        self.visited_cbd.add(child)
                        stack.append(
                            (word, iter(self.store.by_subject.get(child, ())))
                        )
                        descended = True
                        break
            if not descended:
                stack.pop()

    # -------------- path matching (lib/Path.ts match methods) --------------

    def match(self, path: Path, focus: List[Tuple[tuple, str]],
              inverse: bool = False,
              collect: Optional[Set[tuple]] = None) -> List[Tuple[tuple, str]]:
        """Returns new (node4, pos) targets; witness quads land in
        ``collect`` when given (the paths loop passes self.result; the
        nodeLink fallback passes None, lib/CBDShapeExtractor.ts:421-428).
        node4 = (kind, value, lang, datatype)."""
        if isinstance(path, PredicatePath):
            out = []
            for node, pos in focus:
                if not inverse:
                    if node[0] == LITERAL:
                        continue
                    for q in self.store.by_subject.get((node[0], node[1]), ()):
                        if q[_P] != path.predicate or not self._graph_ok(q):
                            continue
                        word = extend_word(pos, q[_P], False)
                        self.words.add(word)
                        if collect is not None:
                            collect.add(q)
                        out.append(((q[_OK], q[_OV], q[_OL], q[_OD]), word))
                else:
                    if node[0] == LITERAL:
                        # literal focus: inverse hop looks up by full
                        # literal identity (value, lang, datatype)
                        cands = [
                            q for q in self.store.quads
                            if q[_OK] == LITERAL and q[_OV] == node[1]
                            and q[_OL] == node[2] and q[_OD] == node[3]
                        ]
                    else:
                        cands = self.store.by_object.get((node[0], node[1]), ())
                    for q in cands:
                        if q[_P] != path.predicate or not self._graph_ok(q):
                            continue
                        word = extend_word(pos, q[_P], True)
                        self.words.add(word)
                        if collect is not None:
                            collect.add(q)
                        out.append(((q[_SK], q[_S], None, None), word))
            return out
        if isinstance(path, SequencePath):
            cur = focus
            for step in path.sequence:
                cur = self.match(step, cur, inverse, collect)
            return cur
        if isinstance(path, AlternativePath):
            out = []
            for branch in path.alternatives:
                out.extend(self.match(branch, focus, inverse, collect))
            return out
        if isinstance(path, InversePath):
            return self.match(path.path, focus, not inverse, collect)
        if isinstance(path, MultiPath):
            return self._match_multi(path, focus, inverse, collect)
        raise TypeError(f"unknown path type {type(path)}")

    def _match_multi(self, path: MultiPath, focus, inverse, collect):
        """BFS with admit-but-don't-expand for re-reached targets
        (lib/Path.ts:212-287)."""
        out: List[Tuple[tuple, str]] = []
        for root, pos in focus:
            root4 = root if len(root) == 4 else (root[0], root[1], None, None)
            visited = {root4}
            targets = [(root4, pos)]
            i = 0
            while targets:
                if path.admits(i):
                    out.extend(targets)
                if path.max_count is not None and i >= path.max_count:
                    break
                expanded = self.match(path.path, targets, inverse, collect)
                fresh = []
                for node4, w in expanded:
                    if node4 in visited:
                        if path.admits(i + 1):
                            out.append((node4, w))
                        continue
                    visited.add(node4)
                    fresh.append((node4, w))
                targets = fresh
                i += 1
        return out

    # ------- recursive shape extraction (lib/CBDShapeExtractor.ts:374-462) -------

    def extract_recursively(self, node: tuple, shape_id: Optional[Term],
                            pos: str) -> None:
        node4 = node if len(node) == 4 else (node[0], node[1], None, None)
        if node4[0] != LITERAL:
            memo = (node4[0], node4[1])
            if memo in self.visited_shape:
                return
            self.visited_shape.add(memo)
        shape = self.shapes.get(shape_id) if (
            self.shapes is not None and shape_id is not None) else None
        if shape is None or not shape.closed:
            if node4[0] != LITERAL:
                self.cbd((node4[0], node4[1]), pos)
        if shape is None:
            return

        focus = [(node4, pos)]
        matched: Dict[int, List[Tuple[tuple, str]]] = {}
        gated: Set[int] = set()
        for p in shape.match_paths():
            if not shape.closed and p.found(frozenset(self.words), pos) is not None:
                gated.add(id(p))
                continue
            matched[id(p)] = self.match(p, focus, collect=self.result)
        for nl in shape.all_node_links():
            pid = id(nl.path_pattern)
            if pid in matched:
                targets = matched[pid]
            else:
                # gated or link-only path: match for targets, but the
                # witness quads are NOT added (lib/CBDShapeExtractor.ts:421-428)
                targets = self.match(nl.path_pattern, focus, collect=None)
            for tgt4, tpos in targets:
                self.extract_recursively(tgt4, nl.link, tpos)

        if node4[0] == IRI:
            err = shape.required_are_not_present(frozenset(self.words), pos)
            if err is not None:
                self.missing.append(
                    (node4[1], f"{shape_id.kind}:{shape_id.value}",
                     err.to_string())
                )

    def run(self, shape_id: Optional[Term]) -> Set[tuple]:
        self.extract_recursively(self.entity, shape_id, ROOT_WORD)
        # named-graph member pickup — no graph filters
        # (lib/CBDShapeExtractor.ts:317-324)
        for q in self.store.by_graph.get(self.entity, ()):
            self.result.add(q)
        return self.result


def extract_store(quads: List[tuple], members: Sequence[Tuple[int, str]],
                  shapes: Optional[ShapesGraph], shape_id: Optional[Term],
                  bulk: bool = True,
                  graphs_to_ignore: Sequence[tuple] = (),
                  cbd_default_graph: bool = False) -> Iterable[tuple]:
    """Extract every member of one store; yields (entity_value, *quad)."""
    store = _Store(quads)
    member_graphs = {m for m in members if m[0] == IRI} if bulk else set()
    for m in members:
        run = _MemberRun(store, shapes, m, member_graphs,
                         set(graphs_to_ignore), cbd_default_graph)
        for q in sorted(run.run(shape_id), key=str):
            yield (m[1],) + q


def local_bulk_extract(
    triples: DataFrame,
    members: DataFrame,
    shapes_graph: Optional[ShapesGraph] = None,
    shape: Optional[Term] = None,
    store_col: str = "store_key",
    bulk: bool = True,
    cbd_default_graph: bool = False,
    n_buckets: Optional[int] = None,
    graphs_to_ignore: Sequence[Term] = (),
) -> DataFrame:
    """Distributed wrapper: one shuffle by ``store_col``, then per-store
    extraction in applyInPandas (cogrouped with the member seeds).

    ``triples``: quad columns + ``store_col``; ``members``: ``entity``
    (string), optional ``entity_kind``, + ``store_col``.

    Stores are hashed into ``n_buckets`` coarse groups (default 4x the
    default parallelism) so the per-group pandas overhead amortizes over
    thousands of stores per task; store isolation is preserved by
    grouping on ``store_col`` again inside the task."""
    if "entity_kind" not in members.columns:
        members = members.withColumn(
            "entity_kind", F.lit(IRI).cast("tinyint"))
    # NULL store keys must not be dropped silently (pandas groupby drops
    # NaN keys): coalesce to a sentinel so null-store members and quads
    # still pair up as one store.
    _NULL_STORE = "\x00<null-store>"
    triples = triples.withColumn(
        store_col, F.coalesce(F.col(store_col), F.lit(_NULL_STORE))
    )
    members = members.withColumn(
        store_col, F.coalesce(F.col(store_col), F.lit(_NULL_STORE))
    )
    # Re-alias to fresh attributes: when ``members`` derives from
    # ``triples`` (the common subjects-of-the-corpus case), cogroup
    # dedups shared attribute ids and silently DROPS the duplicated
    # column from the right-side pandas frame.
    members = members.select(
        F.col(store_col).alias("_m_store"),
        F.col("entity").alias("_m_entity"),
        F.col("entity_kind").alias("_m_kind"),
    )
    spark = triples.sparkSession
    nb = n_buckets or spark.sparkContext.defaultParallelism * 4
    shapes_local = shapes_graph
    shape_local = shape
    ignore_local = tuple((g.kind, g.value) for g in graphs_to_ignore)
    cols = ["entity", "subject", "subject_kind", "predicate",
            "object_value", "object_kind", "object_lang",
            "object_datatype", "graph", "graph_kind"]

    tb = triples.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(store_col)), F.lit(nb)).cast("int")
    )
    mb = members.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("_m_store")), F.lit(nb)).cast("int")
    )

    def run(key, tpdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
        if mpdf.empty or tpdf.empty:
            return pd.DataFrame(columns=cols)
        out_rows: List[tuple] = []
        member_groups = {
            k: [(int(ek), ev) for ek, ev in zip(g["_m_kind"], g["_m_entity"])]
            for k, g in mpdf.groupby("_m_store", sort=False)
        }
        lang = tpdf["object_lang"].to_numpy()
        dt = tpdf["object_datatype"].to_numpy()
        gr = tpdf["graph"].to_numpy()
        gk = tpdf["graph_kind"].to_numpy()
        quads_all = list(zip(
            tpdf["subject"], tpdf["subject_kind"], tpdf["predicate"],
            tpdf["object_value"], tpdf["object_kind"],
            [None if pd.isna(x) else x for x in lang],
            [None if pd.isna(x) else x for x in dt],
            [None if pd.isna(x) else x for x in gr],
            [None if pd.isna(x) else int(x) for x in gk],
        ))
        by_store: Dict[str, List[tuple]] = {}
        for skey, q in zip(tpdf[store_col], quads_all):
            by_store.setdefault(skey, []).append(q)
        for skey, mlist in member_groups.items():
            quads = by_store.get(skey)
            if not quads:
                continue
            out_rows.extend(
                extract_store(quads, mlist, shapes_local, shape_local,
                              bulk=bulk,
                              graphs_to_ignore=ignore_local,
                              cbd_default_graph=cbd_default_graph)
            )
        return pd.DataFrame(out_rows, columns=cols)

    return (
        tb.groupBy("_bucket")
        .cogroup(mb.groupBy("_bucket"))
        .applyInPandas(run, RESULT_SCHEMA)
    )
