"""Line + branch coverage runner for the test suite (zero-egress stand-in
for pytest-cov; the reference gates CI at 90% BRANCH coverage via
coverage.py, /root/reference/pyproject.toml [tool.coverage]).

Uses Python 3.12's ``sys.monitoring`` LINE and BRANCH events restricted to
files under ``tgp_tpu/``.  Executable lines come from the compiled code
objects' line tables; possible branch outcomes are the conditional-branch
instructions in those code objects (2 outcomes each) — the same arc notion
coverage.py uses, minus its AST exclusions.  Branch coverage = distinct
(branch instruction, destination) pairs observed / (2 × branch
instructions).

Usage:
    python scripts/linecov.py [--fail-under PCT] [--branch-fail-under PCT]
                              [pytest args...]
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
branch_hits: dict[str, dict[tuple[str, int], set[int]]] = {}

#: conditional (2-way) branch opcodes in CPython 3.12 — the instruction
#: offsets at which sys.monitoring fires BRANCH
_BRANCH_OPS = frozenset({
    "POP_JUMP_IF_FALSE", "POP_JUMP_IF_TRUE",
    "POP_JUMP_IF_NONE", "POP_JUMP_IF_NOT_NONE",
    "FOR_ITER",
})


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(str(PKG)):
        hits.setdefault(fn, set()).add(line)
    else:
        return sys.monitoring.DISABLE
    return None


def _on_branch(code, instruction_offset, destination_offset):
    fn = code.co_filename
    if not fn.startswith(str(PKG)):
        return sys.monitoring.DISABLE
    # key on (qualname, offset): offsets alone collide across the file's
    # code objects and silently merge distinct branch sites
    dests = branch_hits.setdefault(fn, {}).setdefault(
        (code.co_qualname, instruction_offset), set())
    dests.add(destination_offset)
    # both outcomes of a 2-way branch observed → stop monitoring this site
    return sys.monitoring.DISABLE if len(dests) >= 2 else None


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


def branch_sites(path: Path) -> int:
    """Number of conditional-branch instructions in the file (each has two
    possible destinations)."""
    return len(branch_site_lines(path))


def branch_site_lines(path: Path) -> list:
    """[(qualname, offset, line)] for every conditional-branch instruction."""
    try:
        code = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return []
    out = []
    stack = [code]
    while stack:
        c = stack.pop()
        for const in c.co_consts:
            if hasattr(const, "co_code"):
                stack.append(const)
        line = None
        for ins in dis.get_instructions(c):
            # 3.13 turned starts_line into a bool and moved the number to
            # ins.line_number; support both
            ln = getattr(ins, "line_number", None)
            if ln is not None:
                line = ln
            elif isinstance(ins.starts_line, int) and not isinstance(
                    ins.starts_line, bool):
                line = ins.starts_line
            if ins.opname in _BRANCH_OPS:
                out.append((c.co_qualname, ins.offset, line))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fail-under", type=float, default=0.0)
    ap.add_argument("--branch-fail-under", type=float, default=0.0)
    ap.add_argument("--missing", action="store_true",
                    help="list unhit/half-hit branch sites per file")
    ap.add_argument("pytest_args", nargs="*")
    args = ap.parse_args()

    sys.monitoring.use_tool_id(TOOL, "linecov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.BRANCH, _on_branch)
    sys.monitoring.set_events(
        TOOL, sys.monitoring.events.LINE | sys.monitoring.events.BRANCH)

    import pytest

    rc = pytest.main(["-q", *(args.pytest_args or ["tests/"])])

    sys.monitoring.set_events(TOOL, 0)
    sys.monitoring.free_tool_id(TOOL)
    if rc != 0:
        print(f"pytest failed (rc={rc}); coverage not evaluated")
        sys.exit(int(rc))

    total_exec = total_hit = 0
    total_br = total_br_hit = 0
    rows = []
    for path in sorted(PKG.rglob("*.py")):
        ex = executable_lines(path)
        if not ex:
            continue
        got = hits.get(str(path), set()) & ex
        n_br = branch_sites(path)
        # distinct observed (offset, dest) pairs, capped at 2 per offset
        seen = branch_hits.get(str(path), {})
        br_hit = sum(min(len(d), 2) for d in seen.values())
        br_hit = min(br_hit, 2 * n_br)
        total_exec += len(ex)
        total_hit += len(got)
        total_br += 2 * n_br
        total_br_hit += br_hit
        pct = 100.0 * len(got) / len(ex)
        bpct = 100.0 * br_hit / max(2 * n_br, 1) if n_br else 100.0
        rows.append((str(path.relative_to(ROOT)), len(ex), len(got), pct,
                     2 * n_br, br_hit, bpct))

    print(f"\n{'file':58s} {'lines':>6} {'hit':>6} {'cov%':>6} "
          f"{'brch':>6} {'bhit':>6} {'bcov%':>6}")
    for name, ex, got, pct, nbr, bhit, bpct in rows:
        flag = "" if pct >= 90 else "  << "
        print(f"{name:58s} {ex:6d} {got:6d} {pct:6.1f} "
              f"{nbr:6d} {bhit:6d} {bpct:6.1f}{flag}")
    if args.missing:
        print("\nmissing branch outcomes (0/2 or 1/2 hit):")
        for path in sorted(PKG.rglob("*.py")):
            seen = branch_hits.get(str(path), {})
            miss = []
            for qual, off, line in branch_site_lines(path):
                n = len(seen.get((qual, off), ()))
                if n < 2:
                    miss.append(f"{line}({n}/2)")
            if miss:
                rel = path.relative_to(ROOT)
                print(f"  {rel}: {' '.join(miss)}")

    pct_total = 100.0 * total_hit / max(total_exec, 1)
    bpct_total = 100.0 * total_br_hit / max(total_br, 1)
    print(f"{'TOTAL':58s} {total_exec:6d} {total_hit:6d} {pct_total:6.1f} "
          f"{total_br:6d} {total_br_hit:6d} {bpct_total:6.1f}")

    rc2 = 0
    if args.fail_under and pct_total < args.fail_under:
        print(f"FAIL: total line coverage {pct_total:.1f}% < "
              f"{args.fail_under}%")
        rc2 = 2
    if args.branch_fail_under and bpct_total < args.branch_fail_under:
        print(f"FAIL: total branch coverage {bpct_total:.1f}% < "
              f"{args.branch_fail_under}%")
        rc2 = 2
    if rc2:
        sys.exit(rc2)
    print(f"OK: line {pct_total:.1f}%  branch {bpct_total:.1f}%")


if __name__ == "__main__":
    main()
