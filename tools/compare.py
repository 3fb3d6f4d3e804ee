#!/usr/bin/env python3
"""Dev-only harness emulating the driver's correctness gate:
runs Verify output parquet vs oracle_sql.json in DuckDB and compares
row counts, schemas (column names) and value hashes.

NOT part of the Spark library (driver-side tooling only).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, struct
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    # Driver's hash is byte-representation-sensitive: -0.0 != 0.0 there.
    # Compare the IEEE bytes of the rounded double, not its numeric value.
    if isinstance(v, float):
        return struct.pack("<d", round(v, 4)).hex()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(oracles[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        # type check: DuckDB sum(INTEGER) yields HUGEINT (int128) which the
        # driver's representation-sensitive hash distinguishes from BIGINT
        gt = dict(
            (r[0], r[1]) for r in
            con.execute(f"DESCRIBE SELECT * FROM '{files[0]}'").fetchall())
        wt = dict(
            (r[0], r[1]) for r in
            con.execute(f"DESCRIBE {oracles[name]}").fetchall())
        tdiff = [(c, gt.get(c), wt.get(c)) for c in gt if gt.get(c) != wt.get(c)]
        if tdiff:
            print(f"FAIL {name}: column types differ: {tdiff}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
        w = sorted(tuple(norm(r[i]) for i in wi) for r in want)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
        elif g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
