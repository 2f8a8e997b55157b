"""Guards on the driver-contract rotation machinery
(__spark_entry__._PRIORITY + tools/rotation_audit.py): the correctness
gate only checks the first 50 registry entries, so a malformed window
(wrong length, duplicate, or dangling name) silently shrinks the
driver's coverage — cheap structural asserts catch that at CI time."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_priority_window_is_exactly_the_gate_width():
    assert len(entrymod._PRIORITY) == 50


def test_priority_window_has_no_duplicates():
    assert len(set(entrymod._PRIORITY)) == len(entrymod._PRIORITY)


def test_priority_names_all_registered_and_lead_the_registry():
    qs = list(entrymod.queries())
    missing = [n for n in entrymod._PRIORITY if n not in qs]
    assert not missing, f"window names not in registry: {missing}"
    assert qs[:50] == entrymod._PRIORITY


def test_every_window_entry_has_an_oracle():
    """A window slot without an oracle burns a driver row on the weak
    rows-only check — every current entry is oracle-paired and the
    window must stay that way."""
    oracles = entrymod.oracle_sql()
    missing = [n for n in entrymod._PRIORITY if n not in oracles]
    assert not missing, f"window entries without oracles: {missing}"


def test_rotation_audit_runs_and_covers_registry():
    from tools.rotation_audit import audit

    rows, green, newest, qs = audit()
    assert len(rows) == len(qs)
    assert newest >= 12


def test_rewrite_coverage_tolerates_last_section(tmp_path):
    """ADVICE r13: rewrite_coverage must not raise when 'Registry
    status' is the LAST section of COVERAGE.md (the old text.index
    call raised ValueError with no following '## ' header); and it
    must keep replacing only the section when one follows."""
    from tools.rotation_audit import rewrite_coverage

    rows = [(1, "q_a", "r13", "yes"), (2, "q_b", "r10", "")]
    qs = {"q_a": None, "q_b": None}
    # case 1: a following section survives the rewrite
    p1 = tmp_path / "cov_mid.md"
    p1.write_text(
        "# COVERAGE\n\nintro\n\n## Registry status\n\nold table\n"
        "\n## Next section\n\nkeep me\n"
    )
    assert rewrite_coverage(rows, None, 13, qs, path=str(p1)) == 0
    out1 = p1.read_text()
    assert "## Next section" in out1 and "keep me" in out1
    assert "`q_a` | r13 | yes" in out1 and "old table" not in out1
    # case 2: 'Registry status' as the final section must not raise
    p2 = tmp_path / "cov_last.md"
    p2.write_text(
        "# COVERAGE\n\nintro\n\n## Registry status\n\nold table\n"
    )
    assert rewrite_coverage(rows, None, 13, qs, path=str(p2)) == 0
    out2 = p2.read_text()
    assert "`q_b` | r10 | no" in out2 and "old table" not in out2
    # case 3 (ADVICE r14): final section AND no trailing newline —
    # the old len(text)-1 fallback mis-sliced the tail; nothing from
    # the old table may leak after the regenerated one
    p3 = tmp_path / "cov_last_no_nl.md"
    p3.write_text(
        "# COVERAGE\n\nintro\n\n## Registry status\n\nold table"
    )
    assert rewrite_coverage(rows, None, 13, qs, path=str(p3)) == 0
    out3 = p3.read_text()
    assert "`q_a` | r13 | yes" in out3 and "old table" not in out3
    assert out3.rstrip("\n").endswith("| no |") and out3.endswith("\n")
