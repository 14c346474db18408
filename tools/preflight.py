"""Snapshot preflight gate: mechanically un-reddable end-of-round commits.

Rounds 4 AND 5 both shipped a red test suite because code landed AFTER
the final sweep (the snapshot commit itself rewrote operators). This
tool makes that impossible to do silently: it runs, against the CURRENT
git HEAD with a CLEAN tree,

1. the full pytest suite (or, with ``--fast``, the plan guard +
   oracle-differential subset that catches plan/value regressions),
2. the full local correctness gate (``tools/check.py``, every registry
   query vs its DuckDB/Python oracle at sf0.01),
3. a bench smoke (``bench.py`` with its built-in confirm pass),

and writes ``PREFLIGHT.json`` recording the HEAD SHA it ran against and
each gate's result. The end-of-round snapshot commit must ADD ONLY this
file (plus round artifacts), so the recorded SHA is the snapshot's own
parent — a judge can verify no code changed after the sweep by checking
``PREFLIGHT.json["sha"] == git rev-parse HEAD~1`` and
``PREFLIGHT.json["tree_clean"] == true``.

Usage::

    python tools/preflight.py            # full: pytest + check + bench
    python tools/preflight.py --fast     # plan guard + oracle tests + check
    python tools/preflight.py --no-bench # skip the bench smoke
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

HERE = pathlib.Path(__file__).resolve().parent.parent


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=HERE, capture_output=True, text=True, check=True
    ).stdout.strip()


def _run(label: str, cmd: list[str], timeout_s: int, env: dict | None = None) -> dict:
    t0 = time.time()
    try:
        import os

        proc = subprocess.run(
            cmd,
            cwd=HERE,
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env={**os.environ, **(env or {})},
        )
        tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
        return {
            "cmd": " ".join(cmd),
            "ok": proc.returncode == 0,
            "returncode": proc.returncode,
            "elapsed_s": round(time.time() - t0, 1),
            "tail": tail,
        }
    except subprocess.TimeoutExpired:
        return {
            "cmd": " ".join(cmd),
            "ok": False,
            "returncode": None,
            "elapsed_s": round(time.time() - t0, 1),
            "tail": f"TIMEOUT after {timeout_s}s",
        }


def main() -> int:
    fast = "--fast" in sys.argv
    no_bench = "--no-bench" in sys.argv

    sha = _git("rev-parse", "HEAD")
    dirty = _git("status", "--porcelain")
    result = {
        "sha": sha,
        "tree_clean": not dirty,
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "mode": "fast" if fast else "full",
        "gates": {},
    }
    if dirty:
        # a preflight against a dirty tree proves nothing about HEAD —
        # record the fact loudly and fail
        result["dirty_files"] = dirty.splitlines()[:20]

    py = sys.executable
    if fast:
        result["gates"]["pytest"] = _run(
            "pytest",
            [py, "-m", "pytest", "tests/test_plans.py", "tests/test_queries_oracle.py", "-q", "-x"],
            3600,
        )
    else:
        # the FULL suite, slow marks suppressed (round 14: the default
        # gate deselects the 118 slowest tests to fit the verify
        # driver's budget — preflight is where the whole suite runs)
        result["gates"]["pytest"] = _run(
            "pytest",
            [py, "-m", "pytest", "tests/", "-q", "-x"],
            5400,
            env={"SPARK_GRAFT_FULL_TESTS": "1"},
        )
    result["gates"]["check"] = _run(
        "check", [py, "tools/check.py", "/root/testdata/sf0.01"], 3600
    )
    if not no_bench:
        result["gates"]["bench"] = _run("bench", [py, "bench.py"], 3600)

    result["ok"] = result["tree_clean"] and all(
        g["ok"] for g in result["gates"].values()
    )
    out = HERE / "PREFLIGHT.json"
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: v for k, v in result.items() if k != "gates"}))
    for name, g in result["gates"].items():
        print(f"{'PASS' if g['ok'] else 'FAIL'} {name} ({g['elapsed_s']}s)")
        if not g["ok"]:
            print(g["tail"])
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
