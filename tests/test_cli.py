"""CLI parity (bin/extract.ts, bin/mermaid.ts): extraction to N-Quads,
owl:imports closure, mermaid rendering, N-Quads formatting."""

import pytest

from extract_cbd_shape_spark.cli import load_shape_quads, main
from extract_cbd_shape_spark.model import Quad, Term
from extract_cbd_shape_spark.sinks.nquads import to_nquads
from extract_cbd_shape_spark.sources.fixtures import quads_to_df

DATA03 = "/root/reference/tests/03 - CBD tests without a shape/data.ttl"
SHAPE05 = "/root/reference/tests/05 - paths/shape.ttl"


def test_cli_extract_cbd_counts(spark, capsys):
    rc = main(["extract", "--data", DATA03,
               "--entity", "http://example.org/B"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 8
    assert all(line.endswith(" .") for line in out)
    assert out == sorted(out)


def test_cli_default_shape_iri(spark, capsys, tmp_path):
    """--shapes without --shape-iri: a lone node shape becomes the
    default (the reference CLI always pairs a shapes graph with a shape
    id, bin/extract.ts:49-58); several shapes demand an explicit pick."""
    (tmp_path / "shape.ttl").write_text(
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        "ex:OnlyShape a sh:NodeShape ;\n"
        "  sh:property [ sh:path ex:p ; sh:minCount 1 ] .\n"
    )
    (tmp_path / "data.ttl").write_text(
        "<http://example.org/B> <http://example.org/p> \"v\" .\n"
    )
    rc = main(["extract", "--data", str(tmp_path / "data.ttl"),
               "--shapes", str(tmp_path / "shape.ttl"),
               "--entity", "http://example.org/B"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and '"v"' in out[0]

    (tmp_path / "two.ttl").write_text(
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        "ex:A a sh:NodeShape .\n"
        "ex:B a sh:NodeShape .\n"
    )
    with pytest.raises(SystemExit):
        main(["extract", "--data", str(tmp_path / "data.ttl"),
              "--shapes", str(tmp_path / "two.ttl"),
              "--entity", "http://example.org/B"])


def test_cli_default_shape_root_with_children(spark, capsys, tmp_path):
    """A root shape plus child shapes linked via sh:node (the common
    layout, e.g. the KBO shape) still defaults: candidates are ROOT
    shapes only (ADVICE r2, low); a shapes file yielding no IRI node
    shape errors instead of silently degrading to plain CBD."""
    (tmp_path / "shape.ttl").write_text(
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        "ex:RootShape a sh:NodeShape ;\n"
        "  sh:property [ sh:path ex:addr ; sh:node ex:ChildShape ] .\n"
        "ex:ChildShape a sh:NodeShape ;\n"
        "  sh:property [ sh:path ex:street ; sh:minCount 1 ] .\n"
    )
    (tmp_path / "data.ttl").write_text(
        "<http://example.org/B> <http://example.org/addr> "
        "<http://example.org/A1> .\n"
        "<http://example.org/A1> <http://example.org/street> \"S1\" .\n"
        "<http://example.org/A1> <http://example.org/skipme> \"x\" .\n"
    )
    rc = main(["extract", "--data", str(tmp_path / "data.ttl"),
               "--shapes", str(tmp_path / "shape.ttl"),
               "--entity", "http://example.org/B"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # root defaulted: B's star + A1's star via the child shape
    assert len(out) == 3

    (tmp_path / "empty.ttl").write_text(
        "@prefix ex: <http://example.org/> .\n"
        "ex:NotAShape ex:p \"v\" .\n"
    )
    with pytest.raises(SystemExit):
        main(["extract", "--data", str(tmp_path / "data.ttl"),
              "--shapes", str(tmp_path / "empty.ttl"),
              "--entity", "http://example.org/B"])


def test_cli_mermaid(spark, capsys):
    rc = main(["mermaid", SHAPE05, "http://example.org/AlternativePathShape"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("flowchart LR")
    assert "AlternativePathShape" in out


def test_owl_imports_closure(tmp_path):
    (tmp_path / "b.ttl").write_text(
        "<http://example.org/s2> <http://example.org/p> \"from-b\" .\n"
    )
    (tmp_path / "a.ttl").write_text(
        f"<http://example.org/g> <http://www.w3.org/2002/07/owl#imports> "
        f"<file://{tmp_path}/b.ttl> .\n"
        "<http://example.org/g> <http://www.w3.org/2002/07/owl#imports> "
        "<http://remote.example/c.ttl> .\n"
        "<http://example.org/s1> <http://example.org/p> \"from-a\" .\n"
    )
    quads = load_shape_quads(str(tmp_path / "a.ttl"))
    values = {q.object.value for q in quads}
    assert "from-a" in values and "from-b" in values  # local import followed
    # cycle safety: a file importing itself terminates
    (tmp_path / "c.ttl").write_text(
        f"<http://example.org/g> <http://www.w3.org/2002/07/owl#imports> "
        f"<file://{tmp_path}/c.ttl> .\n"
    )
    assert load_shape_quads(str(tmp_path / "c.ttl"))


def test_nquads_literal_escaping(spark):
    quads = [
        Quad(Term.iri("http://s"), Term.iri("http://p"),
             Term.literal('say "hi"\nline2', lang="en")),
        Quad(Term.iri("http://s"), Term.iri("http://p"),
             Term.literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer")),
        Quad(Term.blank("b0"), Term.iri("http://p"), Term.iri("http://o"),
             Term.iri("http://g")),
        Quad(Term.iri("http://s"), Term.iri("http://p"),
             Term.literal("plain")),
    ]
    lines = sorted(
        r.line for r in to_nquads(quads_to_df(spark, quads)).collect()
    )
    assert lines == sorted([
        '<http://s> <http://p> "say \\"hi\\"\\nline2"@en .',
        '<http://s> <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        "_:b0 <http://p> <http://o> <http://g> .",
        '<http://s> <http://p> "plain" .',
    ])


@pytest.fixture()
def query_data(tmp_path):
    f = tmp_path / "q.ttl"
    f.write_text(
        "@prefix ex: <http://example.org/> .\n"
        "ex:m1 a ex:Company ; ex:name \"Acme\" ; ex:addr ex:a1 .\n"
        "ex:a1 ex:zip \"1000\" .\n"
        "ex:m2 a ex:Company ; ex:name \"Globex\" ; ex:addr ex:a2 .\n"
        "ex:a2 ex:zip \"2000\" .\n"
        "ex:m3 ex:name \"NotCo\" .\n"
    )
    return str(f)


def test_cli_query_select(spark, capsys, query_data):
    rc = main([
        "query", "--data", query_data,
        "--pattern",
        "?m <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://example.org/Company>",
        "--pattern", "?m <http://example.org/name> ?n",
        "--select", "?n",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "n" and sorted(out[1:]) == ["Acme", "Globex"]


def test_cli_query_path_predicate_and_filter(spark, capsys, query_data):
    rc = main([
        "query", "--data", query_data,
        "--pattern",
        "?m <http://example.org/addr>/<http://example.org/zip> ?z",
        "--filter", "z >= '2000'",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["m", "z"]
    assert out[1:] == ["http://example.org/m2\t2000"]


def test_cli_query_construct_nquads(spark, capsys, query_data):
    rc = main([
        "query", "--data", query_data,
        "--pattern", "?m <http://example.org/name> ?n",
        "--construct", "?m <http://example.org/label> ?n",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    assert all(line.endswith(" .") for line in out)
    assert any('"Acme"' in line for line in out)
    assert out == sorted(out)


def test_cli_validate_reports_and_exit_code(spark, capsys, tmp_path):
    (tmp_path / "vshape.ttl").write_text(
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://example.org/> .\n"
        "ex:VS a sh:NodeShape ;\n"
        "  sh:property [ sh:path ex:name ; sh:minCount 1 ] ;\n"
        "  sh:property [ sh:path ex:vat ; sh:minCount 1 ] .\n"
    )
    (tmp_path / "vdata.ttl").write_text(
        "@prefix ex: <http://example.org/> .\n"
        'ex:ok ex:name "A" ; ex:vat "BE1" .\n'
        'ex:bad ex:name "B" .\n'
    )
    rc = main(["validate", "--data", str(tmp_path / "vdata.ttl"),
               "--shapes", str(tmp_path / "vshape.ttl"),
               "--shape-iri", "http://example.org/VS",
               "--entity", "http://example.org/ok",
               "--entity", "http://example.org/bad"])
    assert rc == 3  # violations present
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "entity\tconforms\tmissing"
    assert out[1] == "http://example.org/ok\ttrue\t"
    assert out[2].startswith("http://example.org/bad\tfalse\t")
    assert "vat" in out[2]

    rc = main(["validate", "--data", str(tmp_path / "vdata.ttl"),
               "--shapes", str(tmp_path / "vshape.ttl"),
               "--shape-iri", "http://example.org/VS",
               "--entity", "http://example.org/ok"])
    assert rc == 0


def test_cli_query_quoted_literal_with_space(spark, capsys, tmp_path):
    """ADVICE r4: quote-aware pattern lexing — a literal containing a
    space is ONE term, and @lang / ^^datatype suffixes parse."""
    f = tmp_path / "lit.ttl"
    f.write_text(
        "@prefix ex: <http://example.org/> .\n"
        'ex:m1 ex:label "two words" .\n'
        'ex:m2 ex:label "two" .\n'
        'ex:m3 ex:label "chat"@en .\n'
        'ex:m4 ex:label "chat"@fr .\n'
        'ex:m5 ex:label "5"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
    )
    rc = main([
        "query", "--data", str(f),
        "--pattern", '?m <http://example.org/label> "two words"',
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1:] == ["http://example.org/m1"]

    rc = main([
        "query", "--data", str(f),
        "--pattern", '?m <http://example.org/label> "chat"@en',
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1:] == ["http://example.org/m3"]

    rc = main([
        "query", "--data", str(f),
        "--pattern",
        '?m <http://example.org/label> '
        '"5"^^<http://www.w3.org/2001/XMLSchema#int>',
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1:] == ["http://example.org/m5"]


def test_cli_query_group_by_agg(spark, capsys, query_data):
    rc = main([
        "query", "--data", query_data,
        "--pattern",
        "?m <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://example.org/Company>",
        "--pattern", "?m <http://example.org/addr> ?a",
        "--pattern", "?a <http://example.org/zip> ?z",
        "--agg", "n=count(*)", "--agg", "zmax=max(?z)",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["n", "zmax"]
    assert out[1].split("\t") == ["2", "2000"]


def test_cli_query_ask_and_describe(spark, capsys, query_data):
    rc = main([
        "query", "--data", query_data, "--ask",
        "--pattern", "?m <http://example.org/name> ?n",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "true"

    rc = main([
        "query", "--data", query_data, "--ask",
        "--pattern", "?m <http://example.org/nope> ?n",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "false"

    rc = main([
        "query", "--data", query_data, "--describe", "?m",
        "--pattern",
        "?m <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://example.org/Company>",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    # CBD of m1 and m2: 3 triples each (type, name, addr)
    assert len(out) == 6
    assert all(line.endswith(" .") for line in out)
    assert any('"Acme"' in line for line in out)
