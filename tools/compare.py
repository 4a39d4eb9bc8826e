#!/usr/bin/env python3
"""Dev-only oracle-parity harness (driver-side python; NOT part of the
library). Replicates the driver's correctness gate: run Verify via
sbt, then execute each oracle SQL in DuckDB over the same parquet
tables and compare values exactly (columns POSITIONAL — schema order,
exactly as the driver hashes — rows sorted by all columns).

Usage: python3 tools/compare.py [sfdir] [outdir] [--skip-verify] [query ...]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if v is None:
        return "NULL"
    return str(v)

def norm_type(t, side, name, errors):
    """Canonical Arrow type label. The r12/r13 lesson: the driver
    hashes TYPES (via its own canonicalization), not just stringified
    values — a raw DECIMAL column passed this gate twice while the
    driver stayed red. So (a) decimal anywhere is an outright error,
    (b) tz-AWARE timestamps are an outright error (the proven-green
    contract is NAIVE session-UTC timestamps on both engines; Spark's
    INT96 parquet default reads back naive-ns, which 13 rounds of
    driver hashing accept — annotated-µs would read back tz-aware),
    (c) Spark and DuckDB labels must match after normalizing
    representation-only differences (string vs large_string,
    timestamp unit ns/us/ms/s)."""
    if pa.types.is_decimal(t):
        errors.append(f"{side} '{name}': decimal type {t} (driver-hash-unsafe; cast to DOUBLE)")
        return "decimal"
    if pa.types.is_timestamp(t):
        if t.tz is not None:
            errors.append(f"{side} '{name}': tz-aware timestamp {t} (driver contract is naive)")
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type, side, name, errors)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{norm_type(f.type, side, name, errors)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return (f"map<{norm_type(t.key_type, side, name, errors)},"
                f"{norm_type(t.item_type, side, name, errors)}>")
    if pa.types.is_null(t):
        return "null"
    return str(t)


def schema_types(tbl, side, errors):
    return [norm_type(f.type, side, f.name, errors) for f in tbl.schema]


def table_rows(tbl):
    # POSITIONAL: keep schema order — the driver hashes positionally,
    # so a column-order mismatch must fail here too (r12 lesson).
    cols = list(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(norm(x) for x in row) for row in zip(*data)) if data else []
    return cols, rows

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_verify = "--skip-verify" in sys.argv
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])

    if not skip_verify:
        subset = " " + " ".join(sorted(only)) if only else ""
        rc = os.system(
            f"cd /root/repo && sbt --error 'runMain graft.Verify {sfdir} {outdir}{subset}' 1>&2")
        if rc != 0:
            print("sbt Verify failed"); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sc, sr = table_rows(spark_tbl)
        dc, dr = table_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        terrs = []
        st = schema_types(spark_tbl, "spark", terrs)
        dt = schema_types(duck_tbl, "duck", terrs)
        if terrs:
            print(f"FAIL {name}: unsafe output types: {'; '.join(terrs)}")
            n_fail += 1; continue
        if st != dt:
            diffs = [f"{c}: spark={a} duck={b}"
                     for c, a, b in zip(sc, st, dt) if a != b]
            print(f"FAIL {name}: column types differ: {'; '.join(diffs)}")
            n_fail += 1; continue
        if sr != dr:
            n_fail += 1
            print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows; first diffs:")
            for a, b in list(zip(sr, dr))[:200]:
                if a != b:
                    print(f"  spark={a}\n  duck ={b}")
                    break
            onlys = [r for r in sr if r not in set(dr)][:3]
            onlyd = [r for r in dr if r not in set(sr)][:3]
            if onlys: print(f"  only-spark: {onlys}")
            if onlyd: print(f"  only-duck : {onlyd}")
            continue
        n_pass += 1
        print(f"PASS {name} ({len(sr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
