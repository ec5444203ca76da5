"""Golden compiled-plan tests — the reference's dominant unit-test pattern
(tests/unit/test_templates.py asserts rendered SQL equals golden files).
Ours: the compiled predicate/statement strings for the shipped demo configs
must stay exactly stable; an unintended compiler change fails here first."""

from __future__ import annotations

import pytest

from cloud_data_quality_spark.compiler.binding import compile_binding
from cloud_data_quality_spark.config.loader import load_configs


@pytest.fixture(scope="module")
def shipped():
    return load_configs("configs")


GOLDEN_PREDICATES = {
    ("DEMO_TEXT_BASICS", "NOT_NULL_SIMPLE"): "TEXT IS NOT NULL",
    ("DEMO_TEXT_BASICS", "NOT_BLANK_SIMPLE"): "TRIM(TEXT) != ''",
    ("DEMO_TEXT_BASICS", "VALUE_LENGTH_BETWEEN"):
        "LENGTH(TEXT) BETWEEN 10 AND 100000",
}

GOLDEN_STATEMENTS = {
    ("DEMO_NO_DUP_TEXT", "NO_DUPLICATES_IN_COLUMN_GROUPS"):
        "select a.*\nfrom data a\ninner join (\n  select text\n  from data\n"
        "  group by text\n  having count(*) > 1\n) duplicates\nusing (text)",
}


def test_golden_simple_predicates(shipped):
    for (rbid, rule_id), expected in GOLDEN_PREDICATES.items():
        b = compile_binding(shipped, rbid)
        got = {r.rule_id: r.predicate_sql for r in b.simple_rules}[rule_id]
        assert got == expected, (rbid, rule_id)


def test_golden_statements(shipped):
    for (rbid, rule_id), expected in GOLDEN_STATEMENTS.items():
        b = compile_binding(shipped, rbid)
        got = {r.rule_id: r.statement_sql for r in b.statement_rules}[rule_id]
        assert got == expected, (rbid, rule_id)


def test_golden_filter_and_batch_params(shipped):
    b = compile_binding(shipped, "DEMO_TEXT_WEBTEXT")
    assert b.filter_sql == "lang = 'en'"
    batch = {r.rule_id: r for r in b.batch_rules}
    assert batch["GOPHER_QUALITY_GATES"].batch_function == "GOPHER_QUALITY"
    assert batch["NO_PII_PRESENT"].batch_function == "NO_PII"


def test_hashsum_changes_when_binding_changes(shipped, tmp_path):
    """configs_hashsum (G8) is content-addressed: same config → same hash,
    any param change → different hash."""
    h1 = shipped.configs_hashsum("DEMO_TEXT_BASICS")
    h2 = load_configs("configs").configs_hashsum("DEMO_TEXT_BASICS")
    assert h1 == h2
    import shutil
    shutil.copytree("configs", tmp_path / "configs")
    demo = (tmp_path / "configs" / "demo_documents.yml")
    demo.write_text(demo.read_text().replace("min_len: 10", "min_len: 11"))
    h3 = load_configs(tmp_path / "configs").configs_hashsum("DEMO_TEXT_BASICS")
    assert h3 != h1
