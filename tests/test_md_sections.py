"""Unit tests for the shared SCALE.md marker-splice helper: the soak
tools each own marker-delimited sections of one document, and a splice
bug (notably start-without-end) must fail loudly instead of silently
deleting every later section."""

from __future__ import annotations

import pytest

from tools.md_sections import replace_section

S, E = "<!-- x:start -->", "<!-- x:end -->"


def _doc(tmp_path, text):
    p = tmp_path / "SCALE.md"
    p.write_text(text)
    return str(p)


def test_replace_only_own_span(tmp_path):
    p = _doc(tmp_path, f"head\n\n{S}\nold\n{E}\n\ntail section\n")
    replace_section(p, S, E, f"{S}\nnew body\n{E}\n")
    out = open(p).read()
    assert "old" not in out and "new body" in out
    assert out.startswith("head") and "tail section" in out


def test_append_when_absent(tmp_path):
    p = _doc(tmp_path, "just a doc\n")
    replace_section(p, S, E, f"{S}\nadded\n{E}\n")
    out = open(p).read()
    assert out.startswith("just a doc") and "added" in out


def test_start_without_end_refuses(tmp_path):
    p = _doc(tmp_path, f"head\n{S}\nbody\n\n## later section\n")
    with pytest.raises(ValueError, match="no matching end"):
        replace_section(p, S, E, f"{S}\nnew\n{E}\n")
    # and the document is untouched
    assert "## later section" in open(p).read()


def test_end_without_start_refuses(tmp_path):
    p = _doc(tmp_path, f"head\n{E}\n")
    with pytest.raises(ValueError, match="without start"):
        replace_section(p, S, E, f"{S}\nnew\n{E}\n")


def test_creates_missing_file(tmp_path):
    p = str(tmp_path / "new.md")
    replace_section(p, S, E, f"{S}\nbody\n{E}\n")
    assert "body" in open(p).read()


def test_markerless_block_refused(tmp_path):
    """A block that does not carry its own start/end markers would be
    spliced over [start, end] and DELETE the markers -- every later
    run then appends a fresh copy and the document silently
    accumulates duplicate sections. Refuse it loudly."""
    p = _doc(tmp_path, f"{S}\nold\n{E}\n")
    with pytest.raises(ValueError, match="must begin with the start"):
        replace_section(p, S, E, "bare body without markers\n")
    with pytest.raises(ValueError, match="must begin with the start"):
        replace_section(p, S, E, f"{S}\nbody but no end marker\n")
    # the document is untouched either way
    assert "old" in open(p).read()
