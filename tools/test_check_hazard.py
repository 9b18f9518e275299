#!/usr/bin/env python3
"""Negative test for check.py's decimal-hazard gate (NOT part of the library).

Round 15 proved a WARN ships: nine hazard-class fuzz keys reached the
driver red while check.py printed WARN and exited 0. Round 17 promoted
the WARN to a hard FAIL; this test pins that behavior so it can't
silently regress to a warning again.

Builds three probe keys in a temp verify-out dir and runs check.py on
each class:
  * hazard_trailing_zeros — decimal value 1.2300 at scale 4: digitstring
    "1.2300" != float64 shortest-repr "1.23" → check.py MUST exit 1 and
    print HAZARD.
  * hazard_sig_digits — 0.1234567890123456789 at scale 19: more
    significant digits than float64 carries → MUST exit 1.
  * clean_decimal — 1.2345 at scale 4: digitstring equals the float64
    repr, no hazard → MUST exit 0 (control: the gate doesn't over-fire
    on every decimal).

Usage: python3 tools/test_check_hazard.py   (exit 0 = gate behaves)
"""
import decimal, json, os, subprocess, sys, tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")


def write_key(out, name, dec_str, precision, scale):
    os.makedirs(os.path.join(out, name), exist_ok=True)
    tbl = pa.table({"v": pa.array([decimal.Decimal(dec_str)],
                                  type=pa.decimal128(precision, scale))})
    pq.write_table(tbl, os.path.join(out, name, "part-0.parquet"))


def run_check(out, key):
    p = subprocess.run([sys.executable, CHECK, out, "/root/testdata/sf0.01",
                        key], capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def main():
    failures = []
    with tempfile.TemporaryDirectory() as out:
        write_key(out, "hazard_trailing_zeros", "1.2300", 10, 4)
        write_key(out, "hazard_sig_digits", "0.1234567890123456789", 38, 19)
        write_key(out, "clean_decimal", "1.2345", 10, 4)
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({
                "hazard_trailing_zeros":
                    "SELECT CAST(1.2300 AS DECIMAL(10,4)) AS v",
                "hazard_sig_digits":
                    "SELECT CAST(0.1234567890123456789 AS DECIMAL(38,19)) AS v",
                "clean_decimal":
                    "SELECT CAST(1.2345 AS DECIMAL(10,4)) AS v",
            }, f)

        for key in ("hazard_trailing_zeros", "hazard_sig_digits"):
            rc, log = run_check(out, key)
            if rc == 0:
                failures.append(f"{key}: check.py exited 0 — the hazard "
                                "gate regressed to a warning")
            if "HAZARD" not in log:
                failures.append(f"{key}: no HAZARD line in output:\n{log}")

        rc, log = run_check(out, "clean_decimal")
        if rc != 0:
            failures.append(f"clean_decimal: check.py exited {rc} — gate "
                            f"over-fires on a hazard-free decimal:\n{log}")
        if "OK clean_decimal" not in log:
            failures.append(f"clean_decimal: missing OK line:\n{log}")

    if failures:
        print("FAIL test_check_hazard:")
        for f in failures:
            print("  - " + f)
        sys.exit(1)
    print("OK test_check_hazard: hazard keys fail hard, clean key passes")


if __name__ == "__main__":
    main()
