"""Module-level constant shadowing lint (round-4 advice item).

The gotcha this guards: registered query functions read module globals at
CALL time, so appending a new query that re-assigns an earlier module-level
constant (say a second ``_IMG_W = 16`` further down multimodal.py) silently
changes the EARLIER query's behavior while that query's oracle f-string —
already formatted at import time — keeps the old value. Only the full
317-query gate used to catch this, minutes after the mistake. This lint
catches it at unit-test speed by statically asserting every module-level
binding in the package is made exactly once.

Scope is deliberately the module TOP LEVEL only: rebindings inside
functions, ``try/except`` import fallbacks, and conditional blocks are scoped
or intentional and stay out of the walk (we iterate ``tree.body``, not the
whole AST).
"""

from __future__ import annotations

import ast
import glob
import os

PACKAGE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "genesapi_cli_spark",
)


def duplicate_toplevel_bindings(source: str) -> list[str]:
    """Names bound more than once by top-level statements of ``source``:
    assignments, annotated assignments, function and class definitions."""
    tree = ast.parse(source)
    seen: set[str] = set()
    dups: list[str] = []
    for node in tree.body:
        names: list[str] = []
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    names.extend(
                        e.id for e in t.elts if isinstance(e, ast.Name)
                    )
        elif isinstance(node, ast.AnnAssign):
            if node.value is not None and isinstance(node.target, ast.Name):
                names.append(node.target.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.append(node.name)
        for name in names:
            if name in seen:
                dups.append(name)
            seen.add(name)
    return dups


def test_detector_catches_synthetic_shadowing():
    fixture = (
        "_IMG_W = 8\n"
        "def q_one():\n    return _IMG_W\n"
        "_IMG_W = 16\n"  # the silent change to q_one this lint exists for
    )
    assert duplicate_toplevel_bindings(fixture) == ["_IMG_W"]


def test_detector_ignores_scoped_rebinding():
    fixture = (
        "X = 1\n"
        "try:\n    import numpy\nexcept ImportError:\n    numpy = None\n"
        "def f():\n    X = 2\n    return X\n"
    )
    assert duplicate_toplevel_bindings(fixture) == []


def test_no_module_constant_is_shadowed_in_the_package():
    offenders = {}
    for path in sorted(
        glob.glob(os.path.join(PACKAGE_DIR, "**", "*.py"), recursive=True)
    ):
        with open(path) as fh:
            dups = duplicate_toplevel_bindings(fh.read())
        if dups:
            offenders[os.path.relpath(path, PACKAGE_DIR)] = dups
    assert not offenders, (
        "module-level names bound twice (the earlier query silently changes "
        f"behavior at call time): {offenders}"
    )
