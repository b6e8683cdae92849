#!/usr/bin/env python3
"""Pre-snapshot preflight gate: refuse to let a dying session ship a
non-compiling (or oracle-red) tree.

Round 9's entire driver signal was lost to exactly this: the session
died with one constant uncommitted, the snapshot didn't compile, and
BENCH_r09.json came back rc=1 with no bench or correctness numbers for
the round. This gate is the insurance: run it BEFORE any end-of-round
snapshot commit (and ideally before any large commit late in a
session). Exit 0 = safe to commit; exit 1 = DO NOT SNAPSHOT.

Stages (each must pass; first failure aborts):
  1. `sbt Test/compile`             — main + test trees compile
  2. `sbt runMain graft.Verify`     — full query dump at sf0.001 (fast)
  3. `tools/check_parity.py`        — DuckDB oracle parity on the dump

Usage:
    python3 tools/preflight.py            # sf0.001 (default, ~fast)
    python3 tools/preflight.py sf0.01     # the driver's own gate scale

Dev tool only — not part of the library.
"""
import subprocess, sys, time, shutil, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
SF_DIR = f"/root/testdata/{SF}"
OUT = f"/tmp/preflight_{SF}_out"


def run(label, cmd, **kw):
    t0 = time.time()
    print(f"[preflight] {label}: {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, cwd=REPO, **kw)
    dt = time.time() - t0
    if p.returncode != 0:
        print(f"[preflight] FAIL ({label}, rc={p.returncode}, {dt:.0f}s) — DO NOT SNAPSHOT",
              flush=True)
        sys.exit(1)
    print(f"[preflight] ok ({label}, {dt:.0f}s)", flush=True)
    return p


def main():
    if not os.path.isdir(SF_DIR):
        print(f"[preflight] FAIL: no testdata at {SF_DIR}")
        sys.exit(1)
    shutil.rmtree(OUT, ignore_errors=True)
    run("compile", ["sbt", "-batch", "Test/compile"])
    run("verify-dump", ["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {OUT}"])
    run("oracle-parity", ["python3", "tools/check_parity.py", SF_DIR, OUT])
    print("[preflight] PASS — tree compiles and is oracle-green; safe to snapshot")


if __name__ == "__main__":
    main()
