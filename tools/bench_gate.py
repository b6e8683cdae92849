#!/usr/bin/env python3
"""Bench regression gate: diff two bench JSONs per query, fail loudly.

Usage:
    python3 tools/bench_gate.py OLD.json NEW.json [--waivers BENCH_WAIVERS.md]

Accepts either the driver's per-round format (``BENCH_rN.json`` with a
``parsed`` object) or the raw one-line JSON that ``graft.Bench`` prints
(optionally captured to a file).

Rule: a query is a REGRESSION when its new time exceeds 1 s AND is more
than 1.5x its old time. Regressions fail the gate (exit 1) unless the
query id is waived in the waivers file (markdown bullets ``- id: reason``).
Sub-second queries and the total are reported but never fail the gate —
best-of-two on a shared box prices small queries inside noise.

Round recipe (r12+): run ``sbt "runMain graft.Bench"`` (its stdout line is
now the compact family-subtotal view), then gate the PER-QUERY artifact it
writes: ``python3 tools/bench_gate.py BENCH_r{N-1}.json
BENCH_FULL_LATEST.json`` BEFORE committing perf-relevant work. r4 (q39 2.6x,
ss02 1.8x) and r5 (st01 9.9x) both shipped drifts this caught at commit
time.

r12 format note: the driver line now carries per-FAMILY subtotals
(inventory growth costs zero line chars); per-query timings land in
``BENCH_FULL_LATEST.json`` (repo root, written by every Bench run —
archive the driver's copy as ``BENCH_FULL_r{N}.json`` at next round
start) and ``target/bench_full.json``. This gate auto-resolves a
compact ``BENCH_r{N}.json`` to its ``BENCH_FULL_r{N}.json`` sibling,
or tells you to pass the full artifact.
"""
import json
import os
import re
import sys

THRESH_RATIO = 1.5
THRESH_SECS = 1.0


def load_queries(path):
    """Return (queries: dict, total: float) from a driver or raw bench file."""
    with open(path) as f:
        text = f.read()
    # the file may be a driver round file, a raw JSON object, or stdout
    # containing one JSON line among logs — try whole-file JSON first
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                d = json.loads(line)
                break
        if d is None:
            raise SystemExit(f"[bench_gate] no bench JSON found in {path}")
    if "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"[bench_gate] {path}: no 'queries' key")
    qs = d["queries"]
    # r12: the driver line carries per-FAMILY subtotals whose keys are
    # digit-free by construction (Bench.family); per-query timings live
    # in the BENCH_FULL side artifact. Auto-resolve a numbered sibling
    # (BENCH_r12.json -> BENCH_FULL_r12.json) so round-over-round
    # invocations keep working; otherwise fail with guidance rather
    # than silently comparing family rollups against query keys.
    if qs and all(not any(ch.isdigit() for ch in k) for k in qs):
        m = re.match(r"^(.*BENCH)_r(\d+)\.json$", path)
        sib = f"{m.group(1)}_FULL_r{m.group(2)}.json" if m else None
        if sib and os.path.exists(sib):
            print(f"[bench_gate] {path} is the compact family-subtotal line; "
                  f"using per-query sibling {sib}")
            return load_queries(sib)
        raise SystemExit(
            f"[bench_gate] {path} carries family subtotals (r12 compact driver "
            "line); per-query timings live in the BENCH_FULL artifact — pass "
            "BENCH_FULL_LATEST.json (written by the run you just made) or an "
            "archived BENCH_FULL_r{N}.json instead")
    return {canon(k): v for k, v in qs.items()}, d.get("value")


# Bench.FamilyCode twin: single-char family codes (r10 size lever).
FAMILY = {"cdc": "c", "dd": "d", "dc": "e", "ss": "s", "st": "t",
          "tx": "x", "sp": "p", "pr": "r", "sk": "k", "pk": "b",
          "mm": "m", "gr": "g", "ud": "u"}


def canon(qid):
    """Canonical bench key: zero padding in the numeric suffix stripped
    and the family prefix mapped to its single-char code ("dd03" ->
    "d3"). Bench.renderLine stripped zeros in r9 and shortened family
    prefixes in r10 to keep the one-line JSON under the driver's
    2000-char stdout tail as the inventory grew; canonicalizing BOTH
    sides here keeps cross-round diffs (r8 "dd03" vs r10 "d3") firing
    across both format changes."""
    m = re.match(r"^([A-Za-z_]*?)0*(\d+)$", qid)
    if not m:
        return qid
    return FAMILY.get(m.group(1), m.group(1)) + m.group(2)


def load_waivers(path):
    """Waived ids from markdown bullets '- id: reason'. Missing file = none."""
    waived = {}
    try:
        with open(path) as f:
            for line in f:
                m = re.match(r"^\s*[-*]\s+([A-Za-z0-9_]+)\s*:\s*(.+)$", line)
                if m:
                    # waiver ids canonicalized like query ids, so a
                    # "- dd09: ..." bullet still waives a "dd9" key
                    waived[canon(m.group(1))] = m.group(2).strip()
    except FileNotFoundError:
        pass
    return waived


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = argv[1], argv[2]
    waiver_path = "BENCH_WAIVERS.md"
    if "--waivers" in argv:
        i = argv.index("--waivers")
        if i + 1 >= len(argv):
            print(__doc__)
            print("[bench_gate] --waivers requires a file argument")
            return 2
        waiver_path = argv[i + 1]
    old_q, old_total = load_queries(old_path)
    new_q, new_total = load_queries(new_path)
    waivers = load_waivers(waiver_path)

    regressions, waived_hits, notes = [], [], []

    def gate(qid, line):
        """Route a failing line to waived or regression."""
        if qid in waivers:
            waived_hits.append(line + f"  [waived: {waivers[qid]}]")
        else:
            regressions.append(line)

    for qid in sorted(new_q):
        nv = new_q[qid]
        ov = old_q.get(qid)
        if ov is None:
            if nv <= 0:
                # a query that ships broken on arrival must not slip
                # through as a baseline-less note
                gate(qid, f"  {qid}: new query ERRORED on arrival")
            else:
                notes.append(f"  new query {qid}: {nv:.2f}s (no old baseline)")
            continue
        if nv <= 0:
            if ov > 0:
                # a query that newly errors is the WORST regression —
                # it must fail the gate, not hide in the notes
                gate(qid, f"  {qid}: newly ERRORED (was {ov:.2f}s)")
            else:
                notes.append(f"  {qid}: still errored (old={ov} new={nv})")
            continue
        if ov <= 0:
            notes.append(f"  {qid}: recovered from error -> {nv:.2f}s")
            continue
        ratio = nv / ov
        if nv > THRESH_SECS and ratio > THRESH_RATIO:
            gate(qid, f"  {qid}: {ov:.2f}s -> {nv:.2f}s ({ratio:.1f}x)")
    for qid in sorted(set(old_q) - set(new_q)):
        # a silently dropped query would shrink the inventory unnoticed
        gate(qid, f"  {qid}: DROPPED from inventory (was {old_q[qid]:.2f}s)")

    if old_total and new_total:
        print(f"[bench_gate] total: {old_total:.1f}s -> {new_total:.1f}s "
              f"({new_total / old_total:.2f}x) over {len(new_q)} queries")
    if notes:
        print("[bench_gate] notes:")
        print("\n".join(notes))
    if waived_hits:
        print("[bench_gate] waived regressions:")
        print("\n".join(waived_hits))
    if regressions:
        print(f"[bench_gate] FAIL — unwaived regressions (> {THRESH_SECS}s "
              f"and > {THRESH_RATIO}x):")
        print("\n".join(regressions))
        print(f"[bench_gate] waive knowingly-priced trades in {waiver_path} "
              "('- id: reason'), or fix before committing")
        return 1
    print("[bench_gate] PASS — no unwaived regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
