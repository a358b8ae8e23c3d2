"""One-command round verification — runs the whole recipe from
.claude/skills/verify/SKILL.md in order and prints a single PASS/FAIL
summary line per step plus an overall verdict.

Steps (each independently toggleable by flag):
  1. pytest tests/ -q
  2. full-registry parity vs DuckDB at sf0.001 (fast) and sf0.01
     (driver-scale; writes PARITY_sf001.txt at --write-artifact)
  3. bare-session smoke over the driver's first-50 window
  4. window audit (changed code must map to driver-checked positions)

Usage:
  python tools/verify_all.py                # everything except sf0.01
  python tools/verify_all.py --full         # include sf0.01 replay
  python tools/verify_all.py --full --write-artifact

Exit code 0 only when every executed step passes. Never run
concurrently with bench.py (timings skew); parity correctness is
unaffected by concurrency, only slower.
"""

from __future__ import annotations

import re
import subprocess
import sys

STEPS: list[tuple[str, list[str], str]] = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], r"(\d+) passed"),
    (
        "parity sf0.001",
        [sys.executable, "tools/check_parity.py", "/root/testdata/sf0.001"],
        r"^0 failures / \d+ checked",
    ),
    (
        "bare-session smoke",
        [sys.executable, "tools/bare_session_smoke.py", "/root/testdata/sf0.001", "50"],
        r"^0 failures / 50 checked",
    ),
    ("window audit", [sys.executable, "tools/window_audit.py"], r"^OK: "),
]

FULL_STEP = (
    "parity sf0.01",
    [sys.executable, "tools/check_parity.py", "/root/testdata/sf0.01"],
    r"^0 failures / \d+ checked",
)

ARTIFACT = "PARITY_sf001.txt"


def check_artifact(path: str) -> tuple[bool, str]:
    """The artifact must be COMPLETE: one result line per checked query
    plus the summary, and the counts must agree (round-7 lesson: a
    stdout redirect silently lost 8 of 192 PASS lines)."""
    with open(path) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    summary = next(
        (ln for ln in lines if re.match(r"^\d+ failures / \d+ checked", ln)), None
    )
    if summary is None:
        return False, f"{path}: no summary line"
    n_checked = int(re.match(r"^\d+ failures / (\d+) checked", summary).group(1))
    results = [ln for ln in lines if re.match(r"^(PASS|FAIL|okay)", ln)]
    if len(results) != n_checked:
        return False, (
            f"{path}: {len(results)} result lines != {n_checked} checked — "
            "artifact truncated"
        )
    return True, f"{path}: complete ({len(results)} result lines = checked count)"


def run_step(name: str, cmd: list[str], ok_pattern: str) -> tuple[bool, str, str]:
    proc = subprocess.run(cmd, capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    # search the WHOLE output: Spark progress bars on stderr bury the
    # summary line when only a tail window is examined
    hit = next(
        (ln for ln in out.splitlines() if re.search(ok_pattern, ln.strip())),
        None,
    )
    ok = proc.returncode == 0 and hit is not None
    detail = hit or next(
        (ln for ln in reversed(out.strip().splitlines()) if ln.strip()),
        "<no output>",
    )
    return ok, detail, out


def main() -> int:
    full = "--full" in sys.argv
    write_artifact = "--write-artifact" in sys.argv
    steps = list(STEPS) + ([FULL_STEP] if full else [])
    failures = 0
    for name, cmd, pat in steps:
        if write_artifact and name == "parity sf0.01":
            # the parity script writes the artifact ITSELF through a
            # dedicated file handle — never recovered from captured
            # stdout, where Spark progress-bar \r characters eat lines
            cmd = cmd[:2] + ["--artifact", ARTIFACT] + cmd[2:]
        ok, detail, out = run_step(name, cmd, pat)
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")
        failures += 0 if ok else 1
        if ok and write_artifact and name == "parity sf0.01":
            art_ok, art_detail = check_artifact(ARTIFACT)
            print(f"{'PASS' if art_ok else 'FAIL'}  artifact: {art_detail}")
            failures += 0 if art_ok else 1
    print("OVERALL:", "PASS" if failures == 0 else f"FAIL ({failures} steps)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
