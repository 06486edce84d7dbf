"""CLI documentation coverage: every parser flag must be documented in
docs/cli.md with a real description (VERDICT round-3 item #10 — the
reference documents its full surface in website/docs/cli.md)."""

import os
import re

from octopus_tpu.config.options import build_parser

DOC = os.path.join(os.path.dirname(__file__), "..", "docs", "cli.md")


def _documented_flags(text):
    """Map long-flag -> the table-row description cell it appears in."""
    out = {}
    for line in text.splitlines():
        if not line.startswith("| `"):
            continue
        # split on unescaped pipes only (tables use \| inside cells)
        cells = [c.strip().replace("\\|", "|")
                 for c in re.split(r"(?<!\\)\|", line.strip("|"))]
        if len(cells) < 3:
            continue
        for m in re.finditer(r"--[A-Za-z][A-Za-z0-9-]*", cells[0]):
            out[m.group(0)] = cells[2]
    return out


def test_every_flag_documented_with_description():
    text = open(DOC).read()
    doc = _documented_flags(text)
    parser = build_parser()
    missing, thin = [], []
    for action in parser._actions:
        longs = [s for s in action.option_strings if s.startswith("--")]
        if not longs:
            continue
        flag = longs[0]
        if flag == "--help":
            continue
        if flag not in doc:
            missing.append(flag)
        elif len(doc[flag]) < 20:
            thin.append(flag)
    assert not missing, f"flags missing from docs/cli.md: {missing}"
    assert not thin, f"flags with no real description: {thin}"


def test_no_phantom_flags_documented():
    """Docs must not describe flags the parser does not accept."""
    text = open(DOC).read()
    doc = _documented_flags(text)
    parser = build_parser()
    known = {s for a in parser._actions for s in a.option_strings}
    phantom = [f for f in doc if f not in known]
    assert not phantom, f"documented but not in the parser: {phantom}"
