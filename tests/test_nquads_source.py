"""Distributed N-Quads source: JVM-columnar parse round-trips the
engine's own sink output exactly (reference ingests serialized RDF via
rdf-dereference streaming, e.g. tests/03 .../without-shape.test.ts:58-66;
our scale path reads the same text format as a splittable table)."""

import pytest

from extract_cbd_shape_spark.model import Quad, Term, quad_to_row
from extract_cbd_shape_spark.sinks.nquads import to_nquads
from extract_cbd_shape_spark.sources.fixtures import quads_to_df
from extract_cbd_shape_spark.sources.nquads import (
    parse_nquads_lines,
    read_nquads,
)

EX = "http://example.org/"


def _edge_case_quads():
    return [
        # plain IRI triple, default graph
        Quad(Term.iri(EX + "s"), Term.iri(EX + "p"), Term.iri(EX + "o")),
        # blank subject + blank object
        Quad(Term.blank("b0"), Term.iri(EX + "p"), Term.blank("b1")),
        # plain string literal (xsd:string elided in N-Quads)
        Quad(Term.iri(EX + "s"), Term.iri(EX + "p"), Term.literal("hello")),
        # language-tagged literal
        Quad(Term.iri(EX + "s"), Term.iri(EX + "p"),
             Term.literal("bonjour", lang="fr-BE")),
        # typed literal
        Quad(Term.iri(EX + "s"), Term.iri(EX + "p"),
             Term.literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer")),
        # every ECHAR escape, incl. backslash-before-n ambiguity
        Quad(Term.iri(EX + "s"), Term.iri(EX + "p"),
             Term.literal('q"uote\\nb\nnl\rcr\ttab\\\\')),
        # named graph (IRI) and blank graph
        Quad(Term.iri(EX + "s2"), Term.iri(EX + "p"), Term.literal("g"),
             Term.iri(EX + "g1")),
        Quad(Term.iri(EX + "s2"), Term.iri(EX + "p"), Term.iri(EX + "o"),
             Term.blank("g2")),
    ]


def test_nquads_roundtrip_exact(spark):
    quads = _edge_case_quads()
    lines = to_nquads(quads_to_df(spark, quads))
    parsed = parse_nquads_lines(lines)
    got = {tuple(r) for r in parsed.collect()}
    want = {quad_to_row(q) for q in quads}
    assert got == want


def test_nquads_file_read_with_comments(spark, tmp_path):
    quads = _edge_case_quads()
    text = "\n".join(
        ["# comment line", ""]
        + [r.line for r in to_nquads(quads_to_df(spark, quads)).collect()]
        + ["   ", "# trailing comment"]
    )
    p = tmp_path / "data.nq"
    p.write_text(text)
    got = {tuple(r) for r in read_nquads(spark, str(p)).collect()}
    assert got == {quad_to_row(q) for q in quads}


def test_nquads_malformed_raises_and_drop_skips(spark, tmp_path):
    p = tmp_path / "bad.nq"
    p.write_text(
        f"<{EX}s> <{EX}p> <{EX}o> .\n"
        "<unterminated <oops> .\n"
    )
    with pytest.raises(Exception, match="malformed N-Quads line"):
        read_nquads(spark, str(p)).collect()
    rows = read_nquads(spark, str(p), on_malformed="drop").collect()
    assert len(rows) == 1 and rows[0].subject == EX + "s"


def test_nquads_parse_is_jvm_only(spark):
    """No Python in the parse path: the plan must not contain a
    BatchEvalPython / ArrowEval node."""
    lines = to_nquads(quads_to_df(spark, _edge_case_quads()))
    plan = parse_nquads_lines(lines)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_nquads_non_echar_escapes_raise_not_mangle(spark, tmp_path):
    """ADVICE r3: spec-legal UCHAR escapes (\\u0041) and the
    unsupported ECHARs \\b/\\f are NOT decoded by this reader — lines
    carrying them must take the malformed branch (loud under the
    default mode, dropped in permissive mode), never parse with the
    raw escape text left in object_value."""
    p = tmp_path / "uchar.nq"
    p.write_text(
        f'<{EX}s> <{EX}p> "A\\u0041B" .\n'
        f'<{EX}s> <{EX}p> "A\\fB" .\n'
        f'<{EX}s> <{EX}p> "plain\\tok" .\n'
    )
    with pytest.raises(Exception, match="malformed N-Quads line"):
        read_nquads(spark, str(p)).collect()
    rows = read_nquads(spark, str(p), on_malformed="drop").collect()
    assert len(rows) == 1 and rows[0].object_value == "plain\tok"


def test_nquads_tab_indented_comments_and_blanks(spark, tmp_path):
    """ADVICE r3: N-Quads whitespace is space OR tab — tab-indented
    comments and tab-only blank lines are dropped, not 'malformed'."""
    p = tmp_path / "tabs.nq"
    p.write_text(
        "\t# tab-indented comment\n"
        "\t\t\n"
        f"\t<{EX}s> <{EX}p> <{EX}o> .\n"
    )
    rows = read_nquads(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0].subject == EX + "s"


def test_nquads_rdf_star_lines_raise_not_misparse(spark):
    """The sink can emit RDF-star quoted-triple terms; the columnar
    parser does not support them — they must hit the malformed branch
    (loud error), never silently parse into a wrong quad."""
    from extract_cbd_shape_spark.model import encode_quoted

    q = Quad(
        encode_quoted(Term.iri(EX + "s"), Term.iri(EX + "p"),
                      Term.literal("o")),
        Term.iri(EX + "says"), Term.literal("x"))
    lines = to_nquads(quads_to_df(spark, [q]))
    with pytest.raises(Exception, match="malformed N-Quads line"):
        parse_nquads_lines(lines).collect()
    assert parse_nquads_lines(lines, on_malformed="drop").count() == 0
