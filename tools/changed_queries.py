"""Mechanically derive which contract queries changed since a git ref.

The driver certifies only the FIRST 50 registry entries per round, so
every query whose code changed must be rotated into that window — the r4
round missed q34/q43/q47/q49/q56 because the changed-set was tracked by
hand. This tool derives it from the git diff instead:

1. ``git diff <ref>..HEAD`` over the engine package yields the changed
   line numbers per file (new-side);
2. the AST of each changed file at HEAD maps those lines to enclosing
   top-level functions / assigned constants;
3. a registry query is CHANGED if (a) its own body holds changed lines,
   or (b) its source references a changed helper/constant by name (one
   hop — helpers here are called directly by queries), or (c) it lives in
   a changed file whose module-level code outside any function changed.

Usage: python tools/changed_queries.py [base_ref=round4]
Prints one query name per line; exits 1 if any changed query is missing
from contract.DRIVER_PRIORITY's driver window (first 50).
"""

from __future__ import annotations

import ast
import inspect
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PKG = "webscraping_video_pipeline_spark"
SCOPES = [f"{PKG}/contract", f"{PKG}/operators", f"{PKG}/functions"]
WINDOW = 50


def changed_lines_by_file(base: str) -> dict[str, set[int]]:
    out = subprocess.run(
        # diff base -> WORKING TREE (not ..HEAD): uncommitted edits count
        ["git", "diff", "--unified=0", base, "--", *SCOPES],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    files: dict[str, set[int]] = {}
    cur = None
    for line in out.splitlines():
        if line.startswith("+++ b/"):
            cur = line[6:]
            files.setdefault(cur, set())
        elif line.startswith("@@") and cur is not None:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            start = int(m.group(1))
            n = int(m.group(2)) if m.group(2) is not None else 1
            files[cur].update(range(start, start + max(n, 1)))
    return {f: ls for f, ls in files.items() if f.endswith(".py")}


def changed_names(files: dict[str, set[int]]) -> tuple[set[str], set[str]]:
    """(changed top-level function/constant names, files with changed
    module-level code outside any def)."""
    names: set[str] = set()
    loose_files: set[str] = set()
    for f, lines in files.items():
        path = REPO / f
        if not path.exists():  # deleted file: treat as loose change
            loose_files.add(f)
            continue
        text = path.read_text()
        src_lines = text.splitlines()
        tree = ast.parse(text)
        covered: set[int] = set()
        for node in tree.body:
            start = node.lineno
            deco = getattr(node, "decorator_list", [])
            if deco:  # @query("...", oracle=...) lines belong to the fn
                start = min(start, min(d.lineno for d in deco))
            span = set(range(start, (node.end_lineno or node.lineno) + 1))
            covered |= span
            hit = bool(span & lines)
            if not hit:
                continue
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                names.add(node.name)
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                tgts = (
                    node.targets if isinstance(node, ast.Assign) else [node.target]
                )
                for tg in tgts:
                    if isinstance(tg, ast.Name):
                        names.add(tg.id)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                # track only intra-package imports (helper renames move
                # behavior); library imports (pyspark F/Window/...) would
                # flag every query in the repo on any new file
                mod = getattr(node, "module", None) or ""
                level = getattr(node, "level", 0)
                if level > 0 or mod.startswith(PKG):
                    for alias in node.names:
                        names.add(alias.asname or alias.name.split(".")[-1])
            elif isinstance(node, ast.Expr) and isinstance(
                node.value, ast.Constant
            ):
                pass  # module docstring — no behavior
            else:
                loose_files.add(f)  # module-level statement with effects

        def substantive(i: int) -> bool:
            txt = src_lines[i - 1].strip() if 0 < i <= len(src_lines) else ""
            return bool(txt) and not txt.startswith("#")

        if any(substantive(i) for i in lines - covered):
            loose_files.add(f)
    return names, loose_files


def changed_queries(base: str) -> list[str]:
    from webscraping_video_pipeline_spark import contract

    files = changed_lines_by_file(base)
    names, loose_files = changed_names(files)
    word = {n: re.compile(rf"\b{re.escape(n)}\b") for n in names}
    changed = []
    for qname, fn in contract.QUERIES.items():
        try:
            src = inspect.getsource(fn)
            srcfile = str(
                Path(inspect.getsourcefile(fn)).resolve().relative_to(REPO)
            )
        except (OSError, TypeError, ValueError):
            changed.append(qname)
            continue
        if fn.__name__ in names:
            changed.append(qname)
        elif any(p.search(src) for n, p in word.items() if n != fn.__name__):
            changed.append(qname)
        elif srcfile in loose_files:
            changed.append(qname)
    return changed


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "round4"
    from webscraping_video_pipeline_spark import contract

    window = set(contract.DRIVER_PRIORITY[:WINDOW])
    waived = set(getattr(contract, "WINDOW_WAIVED", []))
    missing = []
    for q in changed_queries(base):
        if q in window:
            mark = ""
        elif q in waived:
            mark = "  (WINDOW_WAIVED)"
        else:
            mark = "  <-- NOT IN DRIVER WINDOW"
            missing.append(q)
        print(f"{q}{mark}")
    if missing:
        print(
            f"\nERROR: {len(missing)} changed quer{'y' if len(missing) == 1 else 'ies'}"
            f" missing from the first {WINDOW} DRIVER_PRIORITY entries"
            " (window them or justify them in contract.WINDOW_WAIVED)",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
