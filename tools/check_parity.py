#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Verify.scala
parquet dumps (columns sorted by name, rows sorted, values compared
exactly). Dev tool only — not part of the library.

Float columns are compared by RAW IEEE-754 BITS (NaN canonicalized),
not by ==, because the driver hashes fetched values: -0.0 and +0.0 are
== -equal but hash differently, and that exact blind spot let commit
9388414 ship ss06 locally-green / driver-red in r8. `--selftest`
fixtures a -0.0-vs-+0.0 cell and asserts this comparator rejects it.
"""
import sys, json, glob
import numpy as np
import pandas as pd


def bitcanon(df):
    """Float columns viewed as raw bit patterns (int64/int32) with every
    NaN rewritten to the canonical quiet NaN first — so -0.0 vs +0.0
    mismatches exactly like the driver's value hash, while NaN payload
    noise (which no engine round-trips meaningfully) compares equal."""
    out = df.copy()
    for c in out.columns:
        a = out[c].to_numpy()
        if a.dtype == np.float64:
            a = a.copy()
            a[np.isnan(a)] = np.nan
            out[c] = a.view(np.int64)
        elif a.dtype == np.float32:
            a = a.copy()
            a[np.isnan(a)] = np.float32("nan")
            out[c] = a.view(np.int32)
    return out


def compare(got, exp):
    """Return None if bit-identical under (sorted cols, sorted rows),
    else a short failure string. Mirrors the driver: columns sorted by
    name, rows sorted, values hashed — here compared — exactly."""
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA spark={list(got.columns)} oracle={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS   spark={len(got)} oracle={len(exp)}"
    # sort by the BIT-canonical frame: fully deterministic (no NaN or
    # signed-zero ordering ambiguity), so equal-bit frames always align
    gb = bitcanon(got).sort_values(by=list(got.columns)).reset_index(drop=True)
    eb = bitcanon(exp).sort_values(by=list(exp.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(gb, eb, check_dtype=False, check_exact=True)
        return None
    except AssertionError as e:
        return "VALUES " + str(e).splitlines()[-1][:200]


def selftest():
    # -0.0 vs +0.0: == -equal, bit-different — MUST be flagged
    a = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    b = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    assert compare(a, b) is not None, "signed-zero divergence NOT caught"
    # identical frames (incl. a NaN and a -0.0 on BOTH sides) must pass
    c = pd.DataFrame({"k": [1, 2, 3], "v": [-0.0, float("nan"), 2.5]})
    assert compare(c, c.copy()) is None, "identical frames flagged"
    # NaN payload noise must NOT be flagged (canonicalized)
    weird_nan = np.array([np.uint64(0x7FF8000000000001)]).view(np.float64)[0]
    d = pd.DataFrame({"v": [weird_nan]})
    e = pd.DataFrame({"v": [float("nan")]})
    assert compare(d, e) is None, "NaN payload noise flagged"
    # float32 signed zero too
    f = pd.DataFrame({"v": np.array([-0.0], dtype=np.float32)})
    g = pd.DataFrame({"v": np.array([0.0], dtype=np.float32)})
    assert compare(f, g) is not None, "float32 signed zero NOT caught"
    print("selftest OK: signed-zero red, identical green, NaN-canon green")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    import duckdb

    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output"); fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ERROR  {name}: {e}"); fail += 1; continue
        msg = compare(got, exp)
        if msg is None:
            print(f"OK     {name} ({len(got)} rows)")
        else:
            print(f"{msg.split()[0]} {name}: {msg[len(msg.split()[0])+1:]}")
            fail += 1
    print(f"\n{len(oracles)-fail}/{len(oracles)} match")
    sys.exit(1 if fail else 0)
