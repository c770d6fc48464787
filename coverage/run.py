"""Line-coverage runner producing coverage/badge.json.

The analog of the reference's coverage harness (reference:
coverage/coverage.rs + run.sh), which drives cargo llvm-cov over the test
suite and emits a badge JSON. No coverage package is available in this
image, so this uses Python 3.12's low-overhead sys.monitoring (PEP 669) to
record executed lines of wgpu_3dgs_core_tpu/ while running pytest, then
computes line coverage against the compiled statement lines of each module.

Like the reference harness (coverage/coverage.rs:56-130 runs examples,
doctests, and the test suite), this runs, under one monitoring session:
pytest over tests/, every examples/*.py (from a temp copy so repo assets
are untouched), and doctests of the package modules.

Usage: python coverage/run.py [pytest args...]
"""

from __future__ import annotations

import dis
import json
import os
import shutil
import sys
import tempfile

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


def _run_examples() -> int:
    """Execute every example from a temp copy (examples write into their
    own directory; the repo assets stay untouched)."""
    import runpy

    rc = 0
    src = os.path.join(REPO, "examples")
    with tempfile.TemporaryDirectory() as tmp:
        exdir = os.path.join(tmp, "examples")
        shutil.copytree(src, exdir)
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            for fn in sorted(os.listdir(exdir)):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(exdir, fn)
                # Keep the training example short.
                sys.argv = [path, "2"] if fn == "fit_scene.py" else [path]
                print(f"-- example {fn}", flush=True)
                try:
                    runpy.run_path(path, run_name="__main__")
                except SystemExit as e:
                    rc |= int(bool(e.code))
                except Exception as e:  # noqa: BLE001
                    print(f"example {fn} FAILED: {e!r}")
                    rc = 1
        finally:
            os.chdir(cwd)
    return rc


def _run_doctests() -> int:
    """Doctest every package module (reference: coverage.rs doc tests)."""
    import doctest
    import importlib

    rc = 0
    n = 0
    for root, _, files in os.walk(PKG):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, fn), REPO)
            mod_name = rel[:-3].replace(os.sep, ".")
            if mod_name.endswith(".__init__"):
                mod_name = mod_name[: -len(".__init__")]
            try:
                mod = importlib.import_module(mod_name)
            except Exception:  # pragma: no cover - optional deps
                continue
            res = doctest.testmod(mod, verbose=False)
            n += res.attempted
            if res.failed:
                print(f"doctest FAILED in {mod_name}: {res.failed}")
                rc = 1
    print(f"-- doctests: {n} examples")
    return rc


def main() -> int:
    sys.monitoring.use_tool_id(TOOL_ID, "coverage")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)

    import pytest

    args = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(args)

    rc |= _run_examples()
    rc |= _run_doctests()

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
