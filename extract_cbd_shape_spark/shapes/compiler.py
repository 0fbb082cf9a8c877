"""SHACL shapes-graph compiler — driver-side, mirrors lib/ShapesGraph.ts.

The shapes graph is tiny (collected to the driver); the compiled
ShapeTemplates are broadcast as plan parameters. Compiled once per
extractor instance (lib/CBDShapeExtractor.ts:168-171).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from extract_cbd_shape_spark.model import (
    BLANK,
    IRI,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RDFS_LABEL,
    SH,
    Quad,
    Term,
)
from extract_cbd_shape_spark.shapes.ast import (
    AlternativePath,
    InversePath,
    NodeLink,
    OneOrMorePath,
    Path,
    PredicatePath,
    SequencePath,
    ShapeTemplate,
    ZeroOrMorePath,
    ZeroOrOnePath,
)

_SH_PROPERTY = SH + "property"
_SH_NODESHAPE = SH + "NodeShape"
_SH_NODE = SH + "node"
_SH_DEACTIVATED = SH + "deactivated"
_SH_DATATYPE = SH + "datatype"
_SH_PATH = SH + "path"
_SH_MINCOUNT = SH + "minCount"
_SH_CLOSED = SH + "closed"
_SH_AND = SH + "and"
_SH_XONE = SH + "xone"
_SH_OR = SH + "or"
_SH_TARGETCLASS = SH + "targetClass"
_SH_ZERO_OR_MORE = SH + "zeroOrMorePath"
_SH_ONE_OR_MORE = SH + "oneOrMorePath"
_SH_ZERO_OR_ONE = SH + "zeroOrOnePath"
_SH_INVERSE = SH + "inversePath"
_SH_ALTERNATIVE = SH + "alternativePath"

TermKey = Tuple[int, str]


def _key(t: Term) -> TermKey:
    return (t.kind, t.value)


class _QuadIndex:
    """Tiny in-memory pattern index over the (small) shapes graph."""

    def __init__(self, quads: List[Quad]):
        self.quads = quads
        self.by_sp: Dict[Tuple[TermKey, str], List[Term]] = {}
        self.by_p: Dict[str, List[Quad]] = {}
        for q in quads:
            self.by_sp.setdefault((_key(q.subject), q.predicate.value), []).append(q.object)
            self.by_p.setdefault(q.predicate.value, []).append(q)

    def objects(self, subject: Term, predicate: str) -> List[Term]:
        return self.by_sp.get((_key(subject), predicate), [])

    def subjects(self, predicate: str, obj: Optional[Term] = None) -> List[Term]:
        out = []
        for q in self.by_p.get(predicate, []):
            if obj is None or (_key(q.object) == _key(obj)):
                out.append(q.subject)
        return out

    def objects_of_predicate(self, predicate: str) -> List[Term]:
        return [q.object for q in self.by_p.get(predicate, [])]


def clean(path: str) -> str:
    """lib/Utils.ts:103-109 — strip <> and neutralize link rendering."""
    return (
        path.replace("<", "")
        .replace("http:", "http:‎")
        .replace("https:", "https:‎")
        .replace("www", "www‎")
        .replace(">", "")
    )


class ShapesGraph:
    """Compiled shapes graph (lib/ShapesGraph.ts:40-83)."""

    def __init__(self) -> None:
        self.shapes: Dict[TermKey, ShapeTemplate] = {}
        self._counter = 0

    def get(self, shape_id: Term) -> Optional[ShapeTemplate]:
        return self.shapes.get(_key(shape_id))

    @classmethod
    def from_quads(cls, quads: List[Quad]) -> "ShapesGraph":
        index = _QuadIndex(quads)
        # Shape nodes: subjects of sh:property U rdf:type sh:NodeShape
        # U objects of sh:node, DISTINCT (lib/ShapesGraph.ts:58-65).
        shape_nodes: List[Term] = []
        seen = set()
        for t in (
            index.subjects(_SH_PROPERTY)
            + index.subjects(RDF_TYPE, Term(IRI, _SH_NODESHAPE))
            + index.objects_of_predicate(_SH_NODE)
        ):
            k = _key(t)
            if k not in seen:
                seen.add(k)
                shape_nodes.append(t)

        graph = cls()
        for shape_id in shape_nodes:
            deactivated = index.objects(shape_id, _SH_DEACTIVATED)
            if deactivated and deactivated[0].value == "true":
                continue  # lib/ShapesGraph.ts:71-77
            shape = ShapeTemplate()
            graph._preprocess_node_shape(index, shape_id, shape)
            graph.shapes[_key(shape_id)] = shape
        return graph

    # --- path parsing (lib/ShapesGraph.ts:250-317) ---

    def _construct_path_pattern(self, index: _QuadIndex, list_item: Term,
                                literal_type: Optional[Term] = None) -> Path:
        if list_item.kind == BLANK:
            zero_or_more = index.objects(list_item, _SH_ZERO_OR_MORE)
            one_or_more = index.objects(list_item, _SH_ONE_OR_MORE)
            zero_or_one = index.objects(list_item, _SH_ZERO_OR_ONE)
            inverse = index.objects(list_item, _SH_INVERSE)
            alternative = index.objects(list_item, _SH_ALTERNATIVE)
            if zero_or_more:
                return ZeroOrMorePath(
                    self._construct_path_pattern(index, zero_or_more[0], literal_type))
            if one_or_more:
                return OneOrMorePath(
                    self._construct_path_pattern(index, one_or_more[0], literal_type))
            if zero_or_one:
                return ZeroOrOnePath(
                    self._construct_path_pattern(index, zero_or_one[0], literal_type))
            if inverse:
                return InversePath(
                    self._construct_path_pattern(index, inverse[0], literal_type))
            if alternative:
                items = self._rdf_list_to_array(index, alternative[0])
                return AlternativePath(
                    [self._construct_path_pattern(index, x, literal_type) for x in items])
            items = self._rdf_list_to_array(index, list_item)
            return SequencePath(
                [self._construct_path_pattern(index, x, literal_type) for x in items])
        return PredicatePath(list_item.value, literal_type)

    # --- property shapes (lib/ShapesGraph.ts:326-382) ---

    def _preprocess_property_shape(self, index: _QuadIndex, prop_id: Term,
                                   shape: ShapeTemplate,
                                   required: bool = False) -> bool:
        deactivated = index.objects(prop_id, _SH_DEACTIVATED)
        if deactivated and deactivated[0].value == "true":
            return True
        literal_types = index.objects(prop_id, _SH_DATATYPE)
        literal_type = literal_types[0] if literal_types else None
        paths = index.objects(prop_id, _SH_PATH)
        if not paths:
            return False  # not a property shape
        path_pattern = self._construct_path_pattern(index, paths[0], literal_type)
        min_count = index.objects(prop_id, _SH_MINCOUNT)
        if (min_count and min_count[0].value != "0") or required:
            shape.required_paths.append(path_pattern)
        else:
            shape.optional_paths.append(path_pattern)
        node_link = index.objects(prop_id, _SH_NODE)
        if node_link:
            shape.node_links.append(NodeLink(path_pattern, node_link[0]))
        return True

    def _preprocess_shape(self, index: _QuadIndex, shape_id: Term,
                          shape: ShapeTemplate) -> bool:
        if self._preprocess_property_shape(index, shape_id, shape):
            return True
        return self._preprocess_node_shape(index, shape_id, shape)

    # --- node shapes (lib/ShapesGraph.ts:403-478) ---

    def _preprocess_node_shape(self, index: _QuadIndex, node_shape_id: Term,
                               shape: ShapeTemplate) -> bool:
        # Label strategy: rdfs:label -> sh:targetClass -> IRI tail / blank id.
        rdfs_label = index.objects(node_shape_id, RDFS_LABEL)
        if rdfs_label:
            shape.label = rdfs_label[0].value
        else:
            target_class = index.objects(node_shape_id, _SH_TARGETCLASS)
            if target_class:
                shape.label = clean(target_class[0].value)
            else:
                shape.label = (
                    node_shape_id.value
                    if node_shape_id.kind == BLANK
                    else node_shape_id.value.split("/")[-1]
                )

        closed = index.objects(node_shape_id, _SH_CLOSED)
        if closed and closed[0].value == "true":
            shape.closed = True

        for prop in index.objects(node_shape_id, _SH_PROPERTY):
            self._preprocess_property_shape(index, prop, shape)

        # sh:and — inline into the same template (lib/ShapesGraph.ts:451-457).
        for and_list in index.objects(node_shape_id, _SH_AND):
            for and_item in self._rdf_list_to_array(index, and_list):
                self._preprocess_shape(index, and_item, shape)

        # sh:xone + sh:or -> atLeastOneLists (lib/ShapesGraph.ts:459-476).
        for xone_or_or in (index.objects(node_shape_id, _SH_XONE)
                           + index.objects(node_shape_id, _SH_OR)):
            at_least_one: List[ShapeTemplate] = []
            for val in self._rdf_list_to_array(index, xone_or_or):
                new_shape = ShapeTemplate()
                self._preprocess_shape(index, val, new_shape)
                at_least_one.append(new_shape)
            shape.at_least_one_lists.append(at_least_one)
        # sh:not is ignored (lib/ShapesGraph.ts:477).
        return True

    # --- RDF lists (lib/ShapesGraph.ts:486-540) ---

    def _rdf_list_to_array(self, index: _QuadIndex, item: Term) -> List[Term]:
        firsts = index.objects(item, RDF_FIRST)
        if not firsts:
            return [item]  # not a list — just one element
        out = [firsts[0]]
        rest = index.objects(item, RDF_REST)
        cur = rest[0] if rest else None
        while cur is not None and cur.value != RDF_NIL:
            first = index.objects(cur, RDF_FIRST)
            if first:
                out.append(first[0])
            nxt = index.objects(cur, RDF_REST)
            cur = nxt[0] if nxt else None
        return out
