"""Mermaid flowchart rendering of compiled shapes — diagnostics parity
with the reference (lib/ShapesGraph.ts:89-248); golden-tested against
the reference's tests/07 fixtures."""

from __future__ import annotations

import re
from typing import List

from extract_cbd_shape_spark.model import Term
from extract_cbd_shape_spark.shapes.ast import Path, ShapeTemplate
from extract_cbd_shape_spark.shapes.compiler import ShapesGraph, clean


class MermaidRenderer:
    def __init__(self, shapes_graph: ShapesGraph):
        self.sg = shapes_graph
        self.counter = 0

    def render(self, term: Term) -> str:
        start = self.sg.get(term)
        self.counter = 0
        if start is None:
            raise ValueError(f'No shape found for term "{term.value}"')
        out = "flowchart LR\n"
        out += self._single(start, "1", start.label or "Shape")
        return out

    def _single(self, shape: ShapeTemplate, id_: str, name: str) -> str:
        out = f"  S{id_}(({name}))\n"
        processed: List[str] = []

        for nl in shape.node_links:
            p = nl.path_pattern.to_string()
            required = self._is_required(p, shape.required_paths)
            processed.append(p)
            p = clean(p)
            linked = self.sg.get(nl.link)
            if linked is None:
                raise ValueError(f'The linked shape "{nl.link}" is not found')
            linked_id = f"{id_}_{self.counter}"
            link = "-->" if required else "-.->"
            if p.startswith("^"):
                p = p[1:]
                out += f'  S{linked_id}[ ]{link}|"{p}"|S{id_}\n'
            else:
                out += f'  S{id_}{link}|"{p}"|S{linked_id}[ ]\n'
            self.counter += 1
            out += self._single(linked, linked_id, linked.label or "Shape")

        for lst in shape.at_least_one_lists:
            if lst:
                x_id = f"{id_}_{self.counter}"
                out += f"  S{id_}---X{x_id}{{OR}}\n"
                for sub in lst:
                    shape_id = f"{id_}_{self.counter}"
                    self.counter += 1
                    out += f"  X{x_id}---S{shape_id}\n"
                    out += self._single(sub, shape_id, sub.label or "Shape")

        out += self._simple_paths(shape.required_paths, processed, id_, "-->")
        out += self._simple_paths(shape.optional_paths, processed, id_, "-.->")
        return out

    @staticmethod
    def _is_required(p: str, required_paths) -> bool:
        return any(p == rp.to_string() for rp in required_paths)

    def _simple_paths(self, paths, processed: List[str], shape_id: str,
                      link: str) -> str:
        out = ""
        for path in paths:
            literal_type = clean(path.literal_type.value) if path.literal_type else None
            p = path.to_string()
            if p in processed:
                continue
            processed.append(p)
            p = clean(p)
            if _is_real_inverse_path(p):
                p = _real_path(p)
                out += (f'  S{shape_id}_{self.counter}[{literal_type or " "}]'
                        f'{link}|"{p}"|S{shape_id}\n')
            else:
                p = _real_path(p)
                out += (f'  S{shape_id}{link}|"{p}"|'
                        f'S{shape_id}_{self.counter}[{literal_type or " "}]\n')
            self.counter += 1
        return out


def _is_real_inverse_path(path: str) -> bool:
    m = re.match(r"^(\^+)[^\^]+", path)
    if not m:
        return False
    return len(m.group(1)) % 2 != 0


def _real_path(path: str) -> str:
    m = re.match(r"^\^*([^\^]+)", path)
    if not m:
        raise ValueError(f'No real path found in "{path}"')
    return m.group(1)


def to_mermaid(shapes_graph: ShapesGraph, term: Term) -> str:
    return MermaidRenderer(shapes_graph).render(term)
