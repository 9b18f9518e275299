#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate (NOT part of the library).

Usage: python3 tools/check.py <verify_out_dir> [sf_dir] [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf parquet tables,
and compares: schema (column names), row count, and exact values after
sorting rows by all columns (mirrors a hash compare).
"""
import hashlib, json, os, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Above this row count the in-memory rows_of() compare (both sides as
# Python row lists) would exhaust memory — switch to a streaming
# order-independent multiset digest instead (r17 verdict task 2: the
# O(lineitem) as-of/correlated-scalar fuzz keys stop at sf0.1 on a
# CHECKER bound, not an engine one). Override for tests/sweeps via env.
DIGEST_ROWS = int(os.environ.get("GRAFT_CHECK_DIGEST_THRESHOLD", "1000000"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # collapse -0.0/+0.0: engines disagree on the sign of a rounded
            # zero (DuckDB keeps IEEE -0.0, Spark's BigDecimal round never
            # emits it); == treats them equal but the str() sort key would
            # misalign the rowwise compare from that row on (sf1 list_stats)
            return 0.0
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def digest_batches(batches, cols, hazard_cols=None):
    """Streaming canonical digest of a record-batch iterator.

    Each row is normalized exactly like rows_of() (same norm()), rendered
    with repr() — type-faithful: 12 vs 12.0 vs Decimal('12.00') all
    differ, which is safe because the TYPES gate has already pinned both
    sides to identical arrow types — hashed to 128 bits, and summed
    mod 2^128. Addition is commutative, so the digest is order-independent
    (a sorted-rows compare without the sort); equal multisets give equal
    digests and a 1-row diff flips the sum (negative-tested by
    tools/test_check_digest.py). Returns (row_count, digest, hazards)
    where hazards counts decimal values whose digitstring != float64
    shortest-repr in the columns named by hazard_cols (the same driver
    canonicalization hazard the in-memory path gates on).
    """
    n = 0
    h = 0
    hazards = 0
    for batch in batches:
        data = batch.select(cols).to_pylist()
        for r in data:
            t = tuple(norm(r[c]) for c in cols)
            d = hashlib.sha1(repr(t).encode()).digest()[:16]
            h = (h + int.from_bytes(d, "big")) % (1 << 128)
        n += len(data)
        if hazard_cols:
            import decimal
            for c in hazard_cols:
                for v in (r[c] for r in data):
                    if not isinstance(v, decimal.Decimal):
                        continue
                    fr = repr(float(v))
                    if fr.endswith(".0"):
                        fr = fr[:-2]
                    if str(v) != fr:
                        hazards += 1
    return n, h, hazards


def rows_of(table):
    cols = sorted(table.column_names)
    table = table.select(cols)
    data = table.to_pylist()
    rows = [tuple(norm(r[c]) for c in cols) for r in data]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out}/oracle_sql.json"))

    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            # driver SFs are single files; ScaleData replicas (sf1) are
            # Spark part-file directories — glob those
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            if t == "events":
                # driver events.ts is TIMESTAMP(NANOS); ScaleData keeps the
                # raw INT64 nanos (Spark writes plain BIGINT under
                # nanosAsLong) — normalize to the µs timestamps the queries
                # compare on, same `div 1000` truncation as queries/util.t
                # (probe via duckdb: pyarrow would trip on _SUCCESS markers)
                row = c.execute(
                    f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()
                ts_type = row[0] if row else None
                if ts_type == "BIGINT":
                    # `//` is floor division, Spark's `div` truncates toward
                    # zero — identical only for ts >= 0, so pin that (a
                    # double-division rewrite would be lossy: nano epochs
                    # ~1.7e18 exceed double's 2^53 mantissa)
                    neg = c.execute(
                        f"SELECT count(*) FROM {src} WHERE ts < 0").fetchone()[0]
                    assert neg == 0, f"events.ts has {neg} pre-1970 nanos; " \
                        "`//` floor-division no longer matches Spark `div`"
                    c.execute("CREATE VIEW events AS SELECT * REPLACE "
                              f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
                    continue
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        return c

    con = fresh_con()
    ok = fail = skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_ds = ds.dataset(f"{out}/{name}")
            got_count = got_ds.count_rows()
        except Exception as e:
            print(f"MISSING {name}: {e}")
            fail += 1
            continue

        if got_count > DIGEST_ROWS:
            # ---- streaming digest path (no in-memory row lists) ----------
            try:
                reader = con.execute(sql).fetch_record_batch(1 << 16)
            except Exception as e:
                print(f"ORACLE-ERR {name}: {str(e)[:300]}")
                fail += 1
                con = fresh_con()
                continue
            gt = {f.name: str(f.type) for f in got_ds.schema}
            et = {f.name: str(f.type) for f in reader.schema}
            tdiff = {k: (gt.get(k), et.get(k)) for k in set(gt) | set(et)
                     if gt.get(k) != et.get(k)}
            if tdiff:
                print(f"TYPES {name}: {tdiff}")
                fail += 1
                continue
            cols = sorted(gt)
            dec_cols = [c for c in cols if gt[c].startswith("decimal")]
            gn, gh, hazards = digest_batches(
                got_ds.to_batches(), cols, hazard_cols=dec_cols)
            en, eh, _ = digest_batches(iter(reader), cols)
            if gn != en:
                print(f"ROWS {name}: spark={gn} oracle={en}")
                fail += 1
                continue
            if gh != eh:
                print(f"DIGEST {name}: multiset digests differ over {gn} "
                      f"rows (spark={gh:032x} oracle={eh:032x})")
                fail += 1
                continue
            if hazards:
                print(f"HAZARD {name}: {hazards} decimal value(s) whose "
                      "digitstring != float64 shortest-repr — driver hash "
                      "hazard; re-emit as a string digitstring")
                fail += 1
                continue
            print(f"OK {name} ({gn} rows, digest)")
            ok += 1
            continue

        got_tbl = got_ds.to_table()
        try:
            exp_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:300]}")
            fail += 1
            con = fresh_con()  # a fatal error invalidates the connection
            continue
        gt = {f.name: str(f.type) for f in got_tbl.schema}
        et = {f.name: str(f.type) for f in exp_tbl.schema}
        tdiff = {k: (gt.get(k), et.get(k)) for k in set(gt) | set(et)
                 if gt.get(k) != et.get(k)}
        if tdiff:
            # the driver hashes raw values, so int64 12 vs double 12.0 or
            # decimal 1.0 vs double 1.0 WILL hash-mismatch even though the
            # lenient Python == below passes — a type diff IS a failure
            # (both r7 red rows carried exactly this signature)
            print(f"TYPES {name}: {tdiff}")
            fail += 1
            continue
        gc, gr = rows_of(got_tbl)
        ec, er = rows_of(exp_tbl)
        if gc != ec:
            print(f"SCHEMA {name}: spark={gc} oracle={ec}")
            fail += 1
            continue
        if len(gr) != len(er):
            print(f"ROWS {name}: spark={len(gr)} oracle={len(er)}")
            fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            print(f"VALUES {name}: {len(bad)}/{len(gr)} rows differ; first: ")
            i, a, b = bad[0]
            for c, x, y in zip(gc, a, b):
                if x != y:
                    print(f"   row{i} col {c}: spark={x!r} oracle={y!r}")
            fail += 1
            continue
        # Driver-canonicalization hazard (the r6-r10 decimal forensics):
        # the driver hashes one side's decimals through float64, so a
        # decimal-typed column hashes green only when every value's
        # digitstring equals the float64 shortest-repr of the value.
        # Two classes violate that — trailing zeros at the declared scale
        # ("…x.yz00" vs float repr "…x.yz"; redded the decimal-typed
        # dtype_decimal_s4 on the r10 record — since re-pinned to a
        # string digitstring probe) and values with more significant
        # digits than float64 carries (redded the original s4nz). The
        # Decimal-vs-Decimal compare here is blind to both, so FAIL hard:
        # r15 proved a WARN ships (nine hazard-class keys reached the
        # driver red); a key that trips this must be re-emitted as a
        # string digitstring (the dtype_decimal_s4 pattern) before it is
        # declared. Negative-tested by tools/test_check_hazard.py.
        import decimal
        hazard = 0
        for f in got_tbl.schema:
            if not str(f.type).startswith("decimal"):
                continue
            bad = 0
            for v in got_tbl.column(f.name).to_pylist():
                if not isinstance(v, decimal.Decimal):
                    continue
                fr = repr(float(v))
                if fr.endswith(".0"):
                    fr = fr[:-2]
                if str(v) != fr:
                    bad += 1
            if bad:
                print(f"HAZARD {name}: decimal col {f.name} has {bad} "
                      "value(s) whose digitstring != float64 shortest-repr "
                      "— driver hash hazard (see QueriesMisc8 "
                      "dtype_decimal_s4 notes); re-emit as a string "
                      "digitstring on both engines")
                hazard += bad
        if hazard:
            fail += 1
            continue
        print(f"OK {name} ({len(gr)} rows)")
        ok += 1
    print(f"\n{ok} ok, {fail} fail, {skip} skip")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
