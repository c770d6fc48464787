"""Line-coverage runner producing coverage/badge.json.

The analog of the reference's coverage harness (reference:
coverage/coverage.rs + run.sh), which drives cargo llvm-cov over the test
suite and emits a badge JSON. No coverage package is available in this
image, so this uses Python 3.12's low-overhead sys.monitoring (PEP 669) to
record executed lines of wgpu_3dgs_core_tpu/ while running pytest, then
computes line coverage against the compiled statement lines of each module.

Usage: python coverage/run.py [pytest args...]
"""

from __future__ import annotations

import dis
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "wgpu_3dgs_core_tpu")
TOOL_ID = 3  # sys.monitoring tool slot (COVERAGE_ID)

executed: dict[str, set[int]] = {}


def _on_line(code, line):
    fname = code.co_filename
    if fname.startswith(PKG):
        executed.setdefault(fname, set()).add(line)
    return sys.monitoring.DISABLE  # record each line once: near-zero overhead


def _statement_lines(path: str) -> set[int]:
    """All executable statement lines of a source file (recursive co_lines)."""
    with open(path, "r") as f:
        source = f.read()
    try:
        top = compile(source, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, line in code.co_lines():
            if line is not None and line > 0:
                lines.add(line)
        for const in code.co_consts:
            if isinstance(const, type(top)):
                stack.append(const)
    # Exclude docstring-only and import-time noise? Keep it simple: co_lines
    # is what the interpreter can execute; monitoring reports the same units.
    return lines


def main() -> int:
    sys.monitoring.use_tool_id(TOOL_ID, "coverage")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)

    import pytest

    args = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(args)

    sys.monitoring.set_events(TOOL_ID, 0)
    sys.monitoring.free_tool_id(TOOL_ID)

    total = 0
    hit = 0
    per_file = {}
    for root, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            stmts = _statement_lines(path)
            got = executed.get(path, set()) & stmts
            total += len(stmts)
            hit += len(got)
            rel = os.path.relpath(path, REPO)
            pct = 100.0 * len(got) / len(stmts) if stmts else 100.0
            per_file[rel] = round(pct, 1)
            print(f"{rel:60s} {pct:5.1f}%  ({len(got)}/{len(stmts)})")

    pct = 100.0 * hit / total if total else 0.0
    print(f"\nTOTAL {pct:.1f}% ({hit}/{total} lines)")

    badge = {
        "schemaVersion": 1,
        "label": "coverage",
        "message": f"{pct:.0f}%",
        "color": "brightgreen" if pct >= 90 else
                 "yellow" if pct >= 75 else "red",
    }
    out = os.path.join(REPO, "coverage", "badge.json")
    with open(out, "w") as f:
        json.dump(badge, f, indent=2)
        f.write("\n")
    with open(os.path.join(REPO, "coverage", "report.json"), "w") as f:
        json.dump({"total_percent": round(pct, 2), "files": per_file}, f,
                  indent=2)
        f.write("\n")
    print(f"badge written to {out}")
    return int(rc)


if __name__ == "__main__":
    sys.exit(main())
