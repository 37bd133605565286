"""Guard against same-module definition shadowing.

Regression for a real round-4 bug: a second top-level
``def chi_square_independence`` added to ``operators/sketch.py``
silently shadowed the original group-capable one, changing the output
schema of the already-registered x145 query (strict parity red) while
every unit test stayed green — both defs satisfied the fields the
tests checked.  Python keeps only the last binding, so a duplicate
top-level name in one module is always a bug here.
"""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "fame2pygen_spark"


def test_no_duplicate_toplevel_defs():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text(), filename=str(py))
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if node.name in seen:
                    offenders.append(
                        f"{py.relative_to(PKG.parent)}:{node.lineno} "
                        f"redefines {node.name!r} "
                        f"(first at line {seen[node.name]})"
                    )
                else:
                    seen[node.name] = node.lineno
    assert not offenders, "shadowed top-level defs:\n" + "\n".join(offenders)
