"""Evidence-window audit for the driver's first-50 correctness contract.

The driver verifies only the FIRST 50 entries of ``__spark_entry__.py``'s
``_REGISTRY``; positions past 50 carry evidence from a PRIOR round and
that evidence is only valid while the code those queries execute is
textually (AST-) unchanged. This tool mechanizes the check the round-3
judge performed by hand:

1. AST-hash every top-level function AND module-level constant in the
   engine package + ``__spark_entry__.py`` at a base revision (default:
   the latest ``verdict`` commit) and in the working tree.
2. Build a conservative static reference graph (a function "uses"
   anything whose bare name it mentions in call or value position —
   over-approximate on purpose: extra edges make the audit stricter,
   never blinder).
3. A registry query is AFFECTED if any changed/new symbol is in its
   transitive closure, or its own body / oracle constant changed.
4. FAIL (exit 1) if an affected query sits past the window (pos > 50).

Usage:  python tools/window_audit.py [--base REV] [--window N] [--json]
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = "__spark_entry__.py"
PACKAGE = "ai_etl_pipeline_spark"
WINDOW = 50


# ---------------------------------------------------------------- sources


def working_tree_sources() -> dict[str, str]:
    out: dict[str, str] = {ENTRY: (REPO / ENTRY).read_text()}
    for p in sorted((REPO / PACKAGE).rglob("*.py")):
        out[str(p.relative_to(REPO))] = p.read_text()
    return out


def revision_sources(rev: str) -> dict[str, str]:
    ls = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", rev],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    paths = [p for p in ls if p == ENTRY or (p.startswith(PACKAGE + "/") and p.endswith(".py"))]
    out: dict[str, str] = {}
    for p in paths:
        show = subprocess.run(
            ["git", "show", f"{rev}:{p}"], cwd=REPO, capture_output=True, text=True, check=True,
        )
        out[p] = show.stdout
    return out


def default_base() -> str:
    log = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    import re

    for line in log:
        sha, _, msg = line.partition(" ")
        # ONLY the driver's round-final commit shape ("round N: verdict
        # ...") — a work commit merely MENTIONING the word 'verdict'
        # must not become the baseline (r11: 'Fix r10 verdict items'
        # silently shrank the audit to an 8-query diff)
        if re.match(r"^round \d+: verdict", msg.lower()):
            return sha
    return log[-1].split()[0]  # fall back to the root commit


# ---------------------------------------------------------------- symbols


def _hash_node(node: ast.AST) -> str:
    # ast.dump excludes line/col info by default -> whitespace/position
    # independent; docstring edits DO change the hash (conservative).
    return hashlib.sha256(ast.dump(node).encode()).hexdigest()


def _free_references(node: ast.AST) -> set[str]:
    """Names a symbol MIGHT resolve outside itself: loaded names minus
    locally-bound ones (parameters, assignments, loop/comprehension
    targets), plus attribute names (``dedup.foo`` links by ``foo``).
    Without the local-binding subtraction, a parameter that happens to
    share a name with a module function (e.g. a ``queries`` argument vs
    the ``queries()`` contract function) creates a phantom edge."""
    loaded = {
        n.id for n in ast.walk(node)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }
    bound = {
        n.id for n in ast.walk(node)
        if isinstance(n, ast.Name) and not isinstance(n.ctx, ast.Load)
    }
    for fn in ast.walk(node):
        if isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            a = fn.args
            for arg in a.posonlyargs + a.args + a.kwonlyargs:
                bound.add(arg.arg)
            if a.vararg:
                bound.add(a.vararg.arg)
            if a.kwarg:
                bound.add(a.kwarg.arg)
    attrs = {n.attr for n in ast.walk(node) if isinstance(n, ast.Attribute)}
    return (loaded - bound) | attrs


def extract_symbols(sources: dict[str, str]) -> dict[str, dict]:
    """``{bare_name: {"hash": h, "refs": {names...}, "file": f}}``.

    Top-level functions/classes and module-level assignments. On a bare-
    name collision across modules the hashes are combined and the
    reference sets unioned — the audit then treats a change to EITHER as
    a change to the name (strictly conservative).
    """
    symbols: dict[str, dict] = {}
    for fname, src in sources.items():
        tree = ast.parse(src)
        for node in tree.body:
            names: list[str] = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                names = [node.target.id]
            if not names:
                continue
            h = _hash_node(node)
            refs = _free_references(node)
            for name in names:
                if name in symbols:
                    prev = symbols[name]
                    prev["hash"] = hashlib.sha256(
                        (prev["hash"] + h).encode()
                    ).hexdigest()
                    prev["refs"] |= refs
                    prev["file"] += f",{fname}"
                else:
                    symbols[name] = {"hash": h, "refs": set(refs), "file": fname}
    return symbols


def changed_symbols(base: dict[str, dict], head: dict[str, dict]) -> set[str]:
    out = set()
    for name, info in head.items():
        if name not in base or base[name]["hash"] != info["hash"]:
            out.add(name)  # new or edited
    return out


def transitive_users(head: dict[str, dict], changed: set[str]) -> set[str]:
    """Every symbol whose closure touches a changed symbol (incl. the
    changed ones themselves)."""
    affected = set(changed)
    grew = True
    while grew:
        grew = False
        for name, info in head.items():
            if name in affected:
                continue
            if info["refs"] & affected:
                affected.add(name)
                grew = True
    return affected


# ---------------------------------------------------------------- registry


def registry_order(entry_src: str) -> list[str]:
    tree = ast.parse(entry_src)
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
            value = node.value
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            targets, value = [node.target.id], node.value
        else:
            continue
        if "_REGISTRY" in targets and isinstance(value, ast.Dict):
            return [k.value for k in value.keys if isinstance(k, ast.Constant)]
    raise SystemExit("window_audit: _REGISTRY dict literal not found in " + ENTRY)


# ---------------------------------------------------------------- audit


def audit(
    base_sources: dict[str, str],
    head_sources: dict[str, str],
    window: int = WINDOW,
) -> dict:
    base_syms = extract_symbols(base_sources)
    head_syms = extract_symbols(head_sources)
    changed = changed_symbols(base_syms, head_syms)
    affected = transitive_users(head_syms, changed)
    order = registry_order(head_sources[ENTRY])
    positions = {name: i + 1 for i, name in enumerate(order)}
    affected_queries = sorted(
        (q for q in order if q in affected), key=positions.__getitem__
    )
    violations = [q for q in affected_queries if positions[q] > window]
    return {
        "window": window,
        "registry_size": len(order),
        "changed_symbols": sorted(changed),
        "affected_queries": {q: positions[q] for q in affected_queries},
        "violations": violations,
        "ok": not violations,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default=None, help="base git revision (default: last 'verdict' commit)")
    ap.add_argument("--window", type=int, default=WINDOW)
    ap.add_argument("--json", action="store_true", help="dump the full report as JSON")
    args = ap.parse_args(argv)
    base = args.base or default_base()
    report = audit(revision_sources(base), working_tree_sources(), args.window)
    report["base"] = base
    if args.json:
        print(json.dumps(report, indent=2))
    else:
        print(f"base: {base}")
        print(f"changed symbols: {len(report['changed_symbols'])}")
        print(f"affected queries (pos): {report['affected_queries']}")
        if report["violations"]:
            print(
                f"VIOLATION: {len(report['violations'])} affected quer"
                f"{'y' if len(report['violations']) == 1 else 'ies'} past "
                f"position {args.window}: {report['violations']}"
            )
        else:
            print(f"OK: every affected query sits inside the first {args.window}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
