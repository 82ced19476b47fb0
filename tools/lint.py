"""Hermetic lint — the working analog of the reference's pre-commit hooks.

The reference ships .pre-commit-config.yaml (black, isort, flake8,
pre-commit-hooks basics); none of those tools are in this image, so this
implements the checks that matter with the stdlib only:

  - syntax: every .py compiles (compileall equivalent, via ast.parse)
  - trailing whitespace / missing end-of-file newline / tabs in .py
  - merge-conflict markers
  - leftover debugger imports (pdb, breakpoint()) in package code
  - double-quoted docstring convention is NOT enforced (style, not safety)

`make lint` runs it; .pre-commit-config.yaml declares the full hook set for
environments that do have pre-commit installed.

Run: python tools/lint.py [paths...]   (default: package + tests + tools)
Exit 1 with a findings list on any violation.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

DEFAULT_PATHS = ("emojivoice_tpu", "tests", "tools", "bench.py", "__graft_entry__.py")
CONFLICT_MARKERS = ("<" * 7 + " ", "=" * 7 + "\n", ">" * 7 + " ")


def lint_file(path: Path, findings: list[str]) -> None:
    try:
        text = path.read_text()
    except UnicodeDecodeError:
        findings.append(f"{path}: not utf-8")
        return
    if path.suffix == ".py":
        try:
            tree = ast.parse(text, filename=str(path))
        except SyntaxError as e:
            findings.append(f"{path}:{e.lineno}: syntax error: {e.msg}")
            return
        in_package = "emojivoice_tpu" in path.parts
        for node in ast.walk(tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                names = [a.name for a in node.names]
                if "pdb" in names or "ipdb" in names:
                    findings.append(f"{path}:{node.lineno}: debugger import")
            if in_package and isinstance(node, ast.Call) and \
                    isinstance(node.func, ast.Name) and node.func.id == "breakpoint":
                findings.append(f"{path}:{node.lineno}: breakpoint() left in package code")
        if "\t" in text:
            ln = next(i for i, l in enumerate(text.splitlines(), 1) if "\t" in l)
            findings.append(f"{path}:{ln}: tab character")
    if text and not text.endswith("\n"):
        findings.append(f"{path}: no newline at end of file")
    for i, line in enumerate(text.splitlines(), 1):
        if line != line.rstrip():
            findings.append(f"{path}:{i}: trailing whitespace")
        if any(line.startswith(m.rstrip("\n ")) and len(line.split()) <= 2
               for m in CONFLICT_MARKERS) and set(line.split()[0]) in ({"<"}, {"="}, {">"}):
            findings.append(f"{path}:{i}: merge conflict marker")


def main(argv=None) -> int:
    args = (argv if argv is not None else sys.argv[1:]) or list(DEFAULT_PATHS)
    findings: list[str] = []
    n = 0
    for root in args:
        p = Path(root)
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            if "__pycache__" in f.parts:
                continue
            n += 1
            lint_file(f, findings)
    if findings:
        print(f"{len(findings)} finding(s) in {n} files:")
        for f in findings:
            print(" ", f)
        return 1
    print(f"lint ok: {n} files clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
