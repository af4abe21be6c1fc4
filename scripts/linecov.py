"""Line-coverage runner for the test suite (zero-egress stand-in for
pytest-cov; the reference gates CI at 90% branch coverage via coverage.py,
/root/reference/pyproject.toml [tool.coverage]).

Uses Python 3.12's ``sys.monitoring`` LINE events restricted to files under
``tgp_tpu/``, then reports hit/executable lines per file.  Executable lines
are taken from the compiled code objects' line tables (the same source
coverage.py uses), excluding docstrings-only and ``pragma: no cover`` lines.

Usage:
    python scripts/linecov.py [--fail-under PCT] [pytest args...]
"""

from __future__ import annotations

import argparse
import dis
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "tgp_tpu"
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

TOOL = sys.monitoring.COVERAGE_ID
hits: dict[str, set[int]] = {}


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(str(PKG)):
        hits.setdefault(fn, set()).add(line)
    else:
        return sys.monitoring.DISABLE
    return None


def executable_lines(path: Path) -> set[int]:
    try:
        src = path.read_text()
        code = compile(src, str(path), "exec")
    except SyntaxError:
        return set()
    pragma = {i + 1 for i, l in enumerate(src.splitlines())
              if "pragma: no cover" in l}
    lines: set[int] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        for const in c.co_consts:
            if hasattr(const, "co_code"):
                stack.append(const)
        first_lines = [l for _, l in dis.findlinestarts(c) if l is not None]
        for l in first_lines:
            if l not in pragma:
                lines.add(l)
        # drop the def/class header line itself and bare docstring lines:
        # findlinestarts marks RESUME on the first body line, close enough.
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fail-under", type=float, default=0.0)
    ap.add_argument("pytest_args", nargs="*")
    args = ap.parse_args()

    sys.monitoring.use_tool_id(TOOL, "linecov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    rc = pytest.main(["-q", *(args.pytest_args or ["tests/"])])

    sys.monitoring.set_events(TOOL, 0)
    sys.monitoring.free_tool_id(TOOL)
    if rc != 0:
        print(f"pytest failed (rc={rc}); coverage not evaluated")
        sys.exit(int(rc))

    total_exec = total_hit = 0
    rows = []
    for path in sorted(PKG.rglob("*.py")):
        ex = executable_lines(path)
        if not ex:
            continue
        got = hits.get(str(path), set()) & ex
        total_exec += len(ex)
        total_hit += len(got)
        pct = 100.0 * len(got) / len(ex)
        missing = sorted(ex - got)
        rows.append((str(path.relative_to(ROOT)), len(ex), len(got), pct,
                     missing))

    print(f"\n{'file':58s} {'lines':>6} {'hit':>6} {'cov%':>6}")
    for name, ex, got, pct, missing in rows:
        flag = "" if pct >= 90 else "  << "
        print(f"{name:58s} {ex:6d} {got:6d} {pct:6.1f}{flag}")
    pct_total = 100.0 * total_hit / max(total_exec, 1)
    print(f"{'TOTAL':58s} {total_exec:6d} {total_hit:6d} {pct_total:6.1f}")

    if args.fail_under and pct_total < args.fail_under:
        print(f"FAIL: total line coverage {pct_total:.1f}% < "
              f"{args.fail_under}%")
        sys.exit(2)
    print(f"OK: total line coverage {pct_total:.1f}%")


if __name__ == "__main__":
    main()
