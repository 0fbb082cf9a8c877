"""SHACL path algebra + shape templates (driver-side IR).

Mirrors the reference's Path classes (lib/Path.ts) and ShapeTemplate
(lib/Shape.ts:33-113). These objects are compiled once on the driver,
broadcast, and parameterize generated DataFrame plans — they never run
per-quad logic on executors.

The reference tracks which path positions were already extracted in a
bidirectional trie over predicate values (lib/CBDShapeExtractor.ts:185-279).
A trie node created by ``push(p, inverse)`` links back to its parent with
the opposite direction, so trie nodes are exactly *reduced words* over
steps ``+p`` (forward) / ``-p`` (inverse): pushing ``-p`` onto a word
ending in ``+p`` pops instead of extending (and vice versa). We therefore
represent the per-entity trie as a set of reduced-word strings, and
``Path.found`` (lib/Path.ts:38-40,90-98,150-156,187-189,321-371) becomes a
pure function of (word set, current word).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import FrozenSet, List, Optional, Sequence, Set, Union

from extract_cbd_shape_spark.model import Term

# Word encoding: steps joined by \x1e; each step is '+'/'-' + predicate IRI.
STEP_SEP = "\x1e"
ROOT_WORD = ""


def extend_word(word: str, predicate: str, inverse: bool) -> str:
    """Reduced-word push, mirroring CbdExtracted.push
    (lib/CBDShapeExtractor.ts:241-269): pushing the inverse of the last
    step returns the parent node instead of creating a new one."""
    steps = word.split(STEP_SEP) if word else []
    new_step = ("-" if inverse else "+") + predicate
    if steps:
        last = steps[-1]
        if last[1:] == predicate and last[0] != new_step[0]:
            steps = steps[:-1]
            return STEP_SEP.join(steps)
    steps.append(new_step)
    return STEP_SEP.join(steps)


def reduce_word(steps: Sequence[tuple]) -> str:
    """Build a reduced word from (predicate, inverse) steps."""
    w = ROOT_WORD
    for predicate, inverse in steps:
        w = extend_word(w, predicate, inverse)
    return w


class Path:
    """Abstract SHACL path. ``literal_type`` carries sh:datatype
    (lib/ShapesGraph.ts:344-349) — used only for diagnostics/mermaid."""

    literal_type: Optional[Term] = None

    def to_string(self) -> str:
        raise NotImplementedError

    def found(self, words: FrozenSet[str], pos: str,
              inverse: bool = False) -> Optional[str]:
        """Return the word reached if this path was already witnessed in
        the trie starting at ``pos``, else None. ``''`` (root) is truthy
        as a trie node, so None is the only negative."""
        raise NotImplementedError

    def __str__(self) -> str:  # parity helper for ShapeError.toString
        return self.to_string()


@dataclass
class PredicatePath(Path):
    """One hop over a constant predicate (lib/Path.ts:25-79)."""

    predicate: str
    literal_type: Optional[Term] = None

    def to_string(self) -> str:
        return f"<{self.predicate}>"

    def found(self, words, pos, inverse=False):
        candidate = extend_word(pos, self.predicate, inverse)
        # Trie word sets are parent-closed, so membership is exact.
        if candidate in words:
            return candidate
        return None


@dataclass
class SequencePath(Path):
    """sh:path RDF list (lib/Path.ts:81-139)."""

    sequence: List[Path]
    literal_type: Optional[Term] = None

    def to_string(self) -> str:
        return "/".join(p.to_string() for p in self.sequence)

    def found(self, words, pos, inverse=False):
        current: Optional[str] = pos
        for seq in self.sequence:
            if current is not None:
                current = seq.found(words, current, inverse)
        return current


@dataclass
class AlternativePath(Path):
    """sh:alternativePath (lib/Path.ts:141-176). ``found`` returns the
    FIRST matching branch — order is semantic."""

    alternatives: List[Path]
    literal_type: Optional[Term] = None

    def to_string(self) -> str:
        return "|".join(p.to_string() for p in self.alternatives)

    def found(self, words, pos, inverse=False):
        for option in self.alternatives:
            maybe = option.found(words, pos, inverse)
            if maybe is not None:
                return maybe
        return None


@dataclass
class InversePath(Path):
    """sh:inversePath (lib/Path.ts:178-210): flips direction; a double
    inverse cancels."""

    path: Path
    literal_type: Optional[Term] = None

    def to_string(self) -> str:
        return "^" + self.path.to_string()

    def found(self, words, pos, inverse=False):
        return self.path.found(words, pos, not inverse)


@dataclass
class MultiPath(Path):
    """Base for *, +, ? (lib/Path.ts:212-287)."""

    path: Path
    literal_type: Optional[Term] = None
    max_count: Optional[int] = None

    def admits(self, times: int) -> bool:
        """MultiPath.filter(times, res) — which hop counts are results."""
        raise NotImplementedError


@dataclass
class OneOrMorePath(MultiPath):
    def admits(self, times: int) -> bool:
        return times >= 1

    def to_string(self) -> str:
        return self.path.to_string() + "+"

    def found(self, words, pos, inverse=False):
        # lib/Path.ts:321-333
        new_word = self.path.found(words, pos, inverse)
        if new_word is None:
            return None
        visited: Set[str] = {pos}
        nxt = self.path.found(words, new_word, inverse)
        while nxt is not None and new_word not in visited:
            visited.add(new_word)
            new_word = nxt
            nxt = self.path.found(words, new_word, inverse)
        return new_word


@dataclass
class ZeroOrMorePath(MultiPath):
    def admits(self, times: int) -> bool:
        return True

    def to_string(self) -> str:
        return self.path.to_string() + "*"

    def found(self, words, pos, inverse=False):
        # lib/Path.ts:346-355 — always truthy (zero hops suffice).
        visited: Set[str] = {pos}
        cur = pos
        nxt = self.path.found(words, cur, inverse)
        while nxt is not None and nxt not in visited:
            visited.add(nxt)
            cur = nxt
            nxt = self.path.found(words, cur, inverse)
        return cur


@dataclass
class ZeroOrOnePath(MultiPath):
    def __post_init__(self):
        self.max_count = 1

    def admits(self, times: int) -> bool:
        return times < 2

    def to_string(self) -> str:
        return self.path.to_string() + "?"

    def found(self, words, pos, inverse=False):
        # lib/Path.ts:369-371 — always truthy.
        maybe = self.path.found(words, pos, inverse)
        return maybe if maybe is not None else pos


@dataclass
class NodeLink:
    """sh:node link (lib/Shape.ts:6-13)."""

    path_pattern: Path
    link: Term  # shape id (IRI or blank)


class ShapeError:
    """Mirrors lib/Shape.ts:15-31 — an and/or tree of missing paths."""

    def __init__(self, type_: str, errors: Optional[list] = None):
        self.type = type_
        self.errors: list = errors if errors is not None else []

    def to_string(self) -> str:
        if len(self.errors) == 1:
            return self.errors[0].to_string()
        sep = " && " if self.type == "and" else " || "
        return "(" + sep.join(e.to_string() for e in self.errors) + ")"


@dataclass
class ShapeTemplate:
    """Compiled SHACL NodeShape (lib/Shape.ts:33-113)."""

    closed: bool = False
    required_paths: List[Path] = field(default_factory=list)
    optional_paths: List[Path] = field(default_factory=list)
    node_links: List[NodeLink] = field(default_factory=list)
    at_least_one_lists: List[List["ShapeTemplate"]] = field(default_factory=list)
    label: Optional[str] = None

    def fill_paths_and_links(self, extra_paths: List[Path],
                             extra_node_links: List[NodeLink]) -> None:
        """Flatten xone/or branches into the match set
        (lib/Shape.ts:51-61); extraction != validation, so every branch's
        paths are matched unconditionally."""
        for lst in self.at_least_one_lists:
            for item in lst:
                extra_paths.extend(item.required_paths)
                extra_paths.extend(item.optional_paths)
                extra_node_links.extend(item.node_links)
                item.fill_paths_and_links(extra_paths, extra_node_links)

    def match_paths(self) -> List[Path]:
        """requiredPaths ++ optionalPaths ++ extraPaths — the exact
        order extractRecursively matches them
        (lib/CBDShapeExtractor.ts:395-417)."""
        extra_paths: List[Path] = []
        extra_links: List[NodeLink] = []
        self.fill_paths_and_links(extra_paths, extra_links)
        return self.required_paths + self.optional_paths + extra_paths

    def all_node_links(self) -> List[NodeLink]:
        """nodeLinks ++ extraNodeLinks (lib/CBDShapeExtractor.ts:419)."""
        extra_paths: List[Path] = []
        extra_links: List[NodeLink] = []
        self.fill_paths_and_links(extra_paths, extra_links)
        return self.node_links + extra_links

    # --- validation (lib/Shape.ts:63-112) ---

    def _invalid_at_least_one_lists(self, words, pos) -> Optional[ShapeError]:
        out = ShapeError("and")
        for lst in self.at_least_one_lists:
            sub = ShapeError("or")
            at_least_one = False
            for item in lst:
                error = item.required_are_not_present(words, pos)
                if error is not None:
                    sub.errors.append(error)
                else:
                    at_least_one = True
                    break
            if not at_least_one:
                out.errors.append(sub)
        return out if out.errors else None

    def _required_paths_are_not_present(self, words, pos) -> Optional[ShapeError]:
        errors = [p for p in self.required_paths if p.found(words, pos) is None]
        if errors:
            return ShapeError("and", errors)
        return None

    def required_are_not_present(self, words: FrozenSet[str],
                                 pos: str = ROOT_WORD) -> Optional[ShapeError]:
        required = self._required_paths_are_not_present(words, pos)
        at_least_one = self._invalid_at_least_one_lists(words, pos)
        if required is not None and at_least_one is not None:
            return ShapeError("and", required.errors + at_least_one.errors)
        return required if required is not None else at_least_one
