#!/usr/bin/env python3
"""Sync the DocsCoverageSpec-pinned moving numbers in SURVEY.md/README.md.

Usage: python3 tools/sync_docs.py [<registry_count>]

Recomputes the test/suite counts from the test tree (same convention as
DocsCoverageSpec: statement-initial `test("` declarations under
src/test/scala/graft) and rewrites the "N tests / M suites" pins in both
docs. When <registry_count> is given, also rewrites the README
"(N queries" and SURVEY "registry N queries" pins.
"""
import re
import sys
from pathlib import Path

root = Path(__file__).resolve().parent.parent


def tree_counts():
    per_file = []
    for p in (root / "src/test/scala/graft").rglob("*.scala"):
        per_file.append(len(re.findall(r'(?m)^\s*test\("', p.read_text())))
    return sum(per_file), sum(1 for n in per_file if n > 0)


def sub_all(path, pairs):
    text = path.read_text()
    for pat, repl in pairs:
        # first occurrence only — DocsCoverageSpec reads findFirstMatchIn,
        # and later occurrences are HISTORICAL round paragraphs
        text, n = re.subn(pat, repl, text, count=1)
        if n == 0:
            sys.exit(f"pattern {pat!r} not found in {path.name}")
    path.write_text(text)


n_tests, n_suites = tree_counts()
print(f"test tree: {n_tests} tests / {n_suites} suites")
for doc in ("SURVEY.md", "README.md"):
    sub_all(root / doc,
            [(r"\d+ tests / \d+ suites", f"{n_tests} tests / {n_suites} suites")])

if len(sys.argv) > 1:
    n_q = int(sys.argv[1])
    sub_all(root / "README.md", [(r"\(\d+ queries", f"({n_q} queries")])
    sub_all(root / "SURVEY.md", [(r"registry \d+ queries", f"registry {n_q} queries")])
    print(f"registry count set to {n_q}")
