#!/usr/bin/env python3
"""Negative test for check.py's streaming-digest mode (NOT part of the
library).

The digest path replaces the in-memory sorted-rows compare above
GRAFT_CHECK_DIGEST_THRESHOLD rows (r17 verdict task 2). A checker that can
only say OK is worthless, so this pins all four behaviors:
  * digest_pass     — identical multisets in different row order → exit 0
                      and the OK line says "digest" (mode engaged).
  * digest_val_diff — ONE value differs out of 64 rows → MUST exit 1
                      with a DIGEST line (a planted 1-row diff fails).
  * digest_row_diff — row counts differ → MUST exit 1 with a ROWS line.
  * digest_hazard   — decimal trailing-zero digitstring → MUST exit 1
                      with a HAZARD line (the hazard gate survives the
                      mode switch).
A fifth control runs digest_pass WITHOUT the lowered threshold and
asserts the normal path is used (no "digest" in the OK line) — the mode
must not engage below the bound.

Usage: python3 tools/test_check_digest.py   (exit 0 = gate behaves)
"""
import decimal, json, os, subprocess, sys, tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")


def write_key(out, name, table):
    os.makedirs(os.path.join(out, name), exist_ok=True)
    pq.write_table(table, os.path.join(out, name, "part-0.parquet"))


def run_check(out, key, threshold=None):
    env = dict(os.environ)
    if threshold is not None:
        env["GRAFT_CHECK_DIGEST_THRESHOLD"] = str(threshold)
    p = subprocess.run([sys.executable, CHECK, out, "/root/testdata/sf0.01",
                        key], capture_output=True, text=True, env=env)
    return p.returncode, p.stdout + p.stderr


def main():
    failures = []

    def expect(key, threshold, want_rc, want_token, label):
        rc, log = run_check(out, key, threshold)
        if rc != want_rc:
            failures.append(f"{label}: exit {rc}, wanted {want_rc}:\n{log}")
        if want_token not in log:
            failures.append(f"{label}: missing '{want_token}' in:\n{log}")

    with tempfile.TemporaryDirectory() as out:
        vals = list(range(64))
        # reversed order on the spark side: the digest must be
        # order-independent for the pass case to pass
        write_key(out, "digest_pass", pa.table(
            {"v": pa.array(list(reversed(vals)), type=pa.int64())}))
        bad = vals.copy()
        bad[37] = 9999
        write_key(out, "digest_val_diff", pa.table(
            {"v": pa.array(bad, type=pa.int64())}))
        write_key(out, "digest_row_diff", pa.table(
            {"v": pa.array(vals[:-1], type=pa.int64())}))
        write_key(out, "digest_hazard", pa.table(
            {"v": pa.array([decimal.Decimal("1.2300")] * 64,
                           type=pa.decimal128(10, 4))}))
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            sql64 = "SELECT x AS v FROM range(64) t(x)"
            json.dump({
                "digest_pass": sql64,
                "digest_val_diff": sql64,
                "digest_row_diff": sql64,
                "digest_hazard":
                    "SELECT CAST(1.2300 AS DECIMAL(10,4)) AS v "
                    "FROM range(64)",
            }, f)

        expect("digest_pass", 10, 0, "rows, digest", "digest_pass")
        expect("digest_val_diff", 10, 1, "DIGEST", "digest_val_diff")
        expect("digest_row_diff", 10, 1, "ROWS", "digest_row_diff")
        expect("digest_hazard", 10, 1, "HAZARD", "digest_hazard")

        # control: default threshold → normal in-memory path
        rc, log = run_check(out, "digest_pass")
        if rc != 0:
            failures.append(f"control: exit {rc}:\n{log}")
        if "rows, digest" in log:
            failures.append(f"control: digest mode engaged below the "
                            f"threshold:\n{log}")

    if failures:
        print("FAIL test_check_digest:")
        for f in failures:
            print("  - " + f)
        sys.exit(1)
    print("OK test_check_digest: 1-row diffs fail, order is ignored, "
          "hazard gate survives the mode switch")


if __name__ == "__main__":
    main()
