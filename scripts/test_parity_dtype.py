#!/usr/bin/env python3
"""Self-test for parity.py's int-vs-float dtype strictness.

Seeds the exact r17 failure shape: the Spark dump holds an int64
column, the oracle SQL produces a float64 (as a DuckDB HUGEINT sum
does once pandas gets hold of it). The driver's hasher renders these
"149174" vs "149174.0" and fails; parity.py must fail too, not
coerce. A control pair with matching dtypes must still pass.

Usage: python3 scripts/test_parity_dtype.py   (exits 0 iff both
sub-checks behave, prints PASS/FAIL per check)
"""
import json, os, subprocess, sys, tempfile

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
PARITY = os.path.join(HERE, "parity.py")


def run_parity(sfdir, outdir, names):
    return subprocess.run(
        [sys.executable, PARITY, sfdir, outdir, names],
        capture_output=True, text=True)


def main():
    ok = True
    with tempfile.TemporaryDirectory() as tmp:
        sfdir = os.path.join(tmp, "sf")
        outdir = os.path.join(tmp, "out")
        os.makedirs(sfdir)
        os.makedirs(os.path.join(outdir, "seeded_int_vs_float"))
        os.makedirs(os.path.join(outdir, "seeded_control"))
        # one tiny base table for the oracle side to read
        pd.DataFrame({"k": ["a"], "v": [149174]}).to_parquet(
            os.path.join(sfdir, "seedtab.parquet"))
        # spark dump: int64 column (what Verify writes for a LongType)
        pd.DataFrame({"k": ["a"], "s": pd.array([149174], dtype="int64")}) \
            .to_parquet(os.path.join(outdir, "seeded_int_vs_float", "part.parquet"))
        pd.DataFrame({"k": ["a"], "s": pd.array([149174], dtype="int64")}) \
            .to_parquet(os.path.join(outdir, "seeded_control", "part.parquet"))
        oracles = {
            # HUGEINT sum -> float64 in pandas: numerically equal,
            # dtype-divergent. parity MUST fail this.
            "seeded_int_vs_float":
                "SELECT k, sum(CAST(v AS HUGEINT)) AS s FROM seedtab GROUP BY k",
            # the convention fix: cast to BIGINT -> int64. MUST pass.
            "seeded_control":
                "SELECT k, CAST(sum(v) AS BIGINT) AS s FROM seedtab GROUP BY k",
        }
        with open(os.path.join(outdir, "oracle_sql.json"), "w") as f:
            json.dump(oracles, f)

        r = run_parity(sfdir, outdir, "seeded_int_vs_float")
        if r.returncode != 0 and "dtype mismatch" in r.stdout:
            print("PASS: seeded int-vs-float rejected with dtype mismatch")
        else:
            print("FAIL: seeded int-vs-float NOT rejected\n" + r.stdout)
            ok = False

        r = run_parity(sfdir, outdir, "seeded_control")
        if r.returncode == 0:
            print("PASS: BIGINT-cast control accepted")
        else:
            print("FAIL: control rejected\n" + r.stdout)
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
