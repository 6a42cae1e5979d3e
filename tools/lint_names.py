#!/usr/bin/env python
"""Minimal undefined-global-name linter (no pyflakes in this image).

Catches the class of bug that shipped in round 3 (`pipeline.py` used
`os.environ` without `import os`): a function body referencing a global name
that is neither defined at module scope, imported, a builtin, nor declared
`global`/created dynamically. Uses the stdlib `symtable` module so scoping
rules (comprehensions, nested functions, class bodies) are exact.

Usage: python tools/lint_names.py [paths...]   (default: repo source dirs)
Exit code 1 if any finding.
"""
from __future__ import annotations

import builtins
import pathlib
import symtable
import sys

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__", "__package__",
                                 "__spec__", "__loader__", "__builtins__",
                                 "__debug__", "__annotations__", "__dict__",
                                 "__class__", "__module__", "__qualname__"}

DEFAULT_PATHS = ["vexpress_tpu", "cli", "tools", "tests",
                 "bench.py", "__graft_entry__.py"]


def module_scope_names(table: symtable.SymbolTable) -> set:
    names = set()
    for sym in table.get_symbols():
        # Anything assigned, imported, or otherwise bound at module level.
        if sym.is_assigned() or sym.is_imported() or sym.is_namespace():
            names.add(sym.get_name())
    return names


def walk(table: symtable.SymbolTable, module_names: set, findings: list,
         fname: str, use_lines: dict) -> None:
    for sym in table.get_symbols():
        name = sym.get_name()
        if not sym.is_referenced():
            continue
        if sym.is_global() or (table.get_type() != "module" and sym.is_free()
                               is False and not sym.is_local()
                               and not sym.is_parameter()):
            if (name not in module_names and name not in BUILTINS
                    and not sym.is_imported() and not sym.is_assigned()):
                # symtable only knows the enclosing def's line; point at the
                # first actual USE of the name at/after it instead (an
                # undefined name deep in a long function otherwise reports
                # the def line, sending the fixer to the wrong place)
                start = table.get_lineno()
                lineno = next((ln for ln in use_lines.get(name, ())
                               if ln >= start), start)
                findings.append((fname, lineno, table.get_name(), name))
    for child in table.get_children():
        walk(child, module_names, findings, fname, use_lines)


def name_use_lines(src: str) -> dict:
    """name -> sorted line numbers of every Load-context use in the file."""
    import ast

    uses: dict = {}
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            uses.setdefault(node.id, []).append(node.lineno)
    return {k: sorted(v) for k, v in uses.items()}


def check_file(path: pathlib.Path, findings: list) -> None:
    src = path.read_text()
    try:
        table = symtable.symtable(src, str(path), "exec")
    except SyntaxError as e:
        findings.append((str(path), e.lineno or 0, "<module>", f"SYNTAX: {e.msg}"))
        return
    module_names = module_scope_names(table)
    use_lines = name_use_lines(src)
    for child in table.get_children():
        walk(child, module_names, findings, str(path), use_lines)


def main(argv):
    roots = argv[1:] or DEFAULT_PATHS
    findings = []
    for root in roots:
        p = pathlib.Path(root)
        files = [p] if p.suffix == ".py" else sorted(p.rglob("*.py"))
        for f in files:
            if "__pycache__" in f.parts:
                continue
            check_file(f, findings)
    for fname, lineno, scope, name in findings:
        print(f"{fname}:{lineno}: undefined name '{name}' (in {scope})")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
