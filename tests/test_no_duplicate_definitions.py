"""Guards against silent shadowing (the r12 RFM incident).

Python raises nothing when a module defines the same top-level
function twice or a dict key is assigned twice: the later definition
silently wins. In this repo both patterns are how a certified
operator gets *overwritten* instead of flagged — a second
``def customer_rfm_segments`` in plans/relational.py shadowed the
r4-certified one for several edits in r12 before being caught by a
tools/dump_plans.py line-number collision. These AST scans make the
failure loud at test time, with no Spark session needed.
"""

from __future__ import annotations

import ast
import pathlib
from collections import Counter

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "hrfco_data_pipeline_spark"
)

PLAN_MODULES = sorted((PKG / "plans").glob("*.py")) + [
    PKG / "oracles.py",
    PKG.parent / "__spark_entry__.py",
]


@pytest.mark.parametrize("path", PLAN_MODULES, ids=lambda p: p.name)
def test_no_duplicate_toplevel_functions(path):
    tree = ast.parse(path.read_text())
    names = Counter(
        node.name
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
    )
    dups = sorted(n for n, c in names.items() if c > 1)
    assert not dups, (
        f"{path.name} defines {dups} more than once at top level — "
        "the later definition silently shadows the earlier "
        "(certified) one"
    )


def test_no_reassigned_oracle_keys():
    """Each ``<FAMILY>_ORACLES["name"] = ...`` key must be assigned
    exactly once across the module (including the dict-literal
    initializers), or one oracle silently replaces another."""
    tree = ast.parse((PKG / "oracles.py").read_text())
    keys: Counter = Counter()
    for node in ast.walk(tree):
        # literal initializers: FAMILY_ORACLES: dict = {"k": ...}
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            value = node.value
            for t in targets:
                if (
                    isinstance(t, ast.Name)
                    and t.id.endswith("_ORACLES")
                    and isinstance(value, ast.Dict)
                ):
                    for k in value.keys:
                        if isinstance(k, ast.Constant):
                            keys[(t.id, k.value)] += 1
                # subscript assignment: FAMILY_ORACLES["k"] = ...
                if (
                    isinstance(t, ast.Subscript)
                    and isinstance(t.value, ast.Name)
                    and t.value.id.endswith("_ORACLES")
                    and isinstance(t.slice, ast.Constant)
                ):
                    keys[(t.value.id, t.slice.value)] += 1
    dups = sorted(f"{d}[{k!r}]" for (d, k), c in keys.items() if c > 1)
    assert not dups, f"oracle keys assigned more than once: {dups}"


def test_no_cross_module_plan_name_collisions():
    """A plan function name reused across plans/ modules is legal
    Python but a registry-confusion hazard (which module's version is
    certified?). Names prefixed with ``_`` (helpers) are exempt, as
    are documented idioms shared by design."""
    # oracle-probe helpers intentionally mirrored between modules
    ALLOWED = {"main"}
    seen: dict[str, str] = {}
    dups = []
    for path in sorted((PKG / "plans").glob("*.py")):
        tree = ast.parse(path.read_text())
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            if node.name.startswith("_") or node.name in ALLOWED:
                continue
            if node.name in seen:
                dups.append(f"{node.name} ({seen[node.name]} and {path.name})")
            else:
                seen[node.name] = path.name
    assert not dups, f"plan function names defined in two modules: {dups}"
