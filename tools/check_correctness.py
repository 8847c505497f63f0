#!/usr/bin/env python3
"""Local stand-in for the driver's correctness harness.

Usage: python3 tools/check_correctness.py <sfdir> <outdir>
Assumes graft.Verify has already written <outdir>/<name>/ parquet dirs and
<outdir>/oracle_sql.json. Registers every parquet table in <sfdir> as a DuckDB
view, runs each oracle, and compares against the Spark result: columns sorted
by name, rows sorted by all columns, exact value comparison (with a float
near-miss report to distinguish hash-misses from real bugs).
"""
import json, math, os, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in os.listdir(sfdir):
    if f.endswith(".parquet"):
        name = f[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sfdir}/{f}')")

oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(by=cols).reset_index(drop=True), cols

def dtypes_of(sql):
    """Column -> DuckDB type name, lowercased names, for a query."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return {r[0].lower(): r[1] for r in rows}

# The driver's hash is TYPE-sensitive exactly where the pandas
# conversion is (r18 evidence): HUGEINT converts to float64, so an
# uncast window SUM hash-diverges from Spark's int64 (sample_unimax,
# red), while INTEGER vs BIGINT (ann_brute_native rank) and
# DECIMAL(7,2) vs DOUBLE (latest_obs) both land in one pandas family
# and hashed green. Mirror that: normalize DuckDB types into their
# pandas families (machine ints -> int64; FLOAT/DOUBLE/DECIMAL/HUGEINT
# -> float64) and flag only cross-family drift.
_INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}
_FLOAT_FAMILY = {"FLOAT", "DOUBLE", "HUGEINT", "UBIGINT"}

def _norm(t):
    if t in _INT_FAMILY: return "INT64"
    if t in _FLOAT_FAMILY or t.startswith("DECIMAL"): return "FLOAT64"
    return t

def dtype_mismatches(spark_sql, oracle_sql):
    st, ot = dtypes_of(spark_sql), dtypes_of(oracle_sql)
    bad = []
    for c in sorted(set(st) & set(ot)):
        if _norm(st[c]) != _norm(ot[c]):
            bad.append((c, st[c], ot[c]))
    return bad

def cmp_cell(a, b):
    if a is None and b is None: return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None: return False
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb): return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)

ok = fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    if name not in oracles:
        print(f"  {name}: rows-only check, {len(spark_df)} rows "
              f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
        continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"  {name}: ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    s, scols = canon(spark_df)
    o, ocols = canon(oracle_df)
    if scols != [c.lower() for c in ocols] and scols != ocols:
        print(f"  {name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
        fail += 1
        continue
    if len(s) != len(o):
        print(f"  {name}: ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}")
        fail += 1
        continue
    bad = []
    sv, ov = s.values.tolist(), o.values.tolist()
    for i in range(len(sv)):
        for j in range(len(scols)):
            if not cmp_cell(sv[i][j], ov[i][j]):
                bad.append((i, scols[j], sv[i][j], ov[i][j]))
                if len(bad) > 4: break
        if len(bad) > 4: break
    if bad:
        print(f"  {name}: VALUE MISMATCH ({len(s)} rows), first diffs:")
        for i, c, a, b in bad[:5]:
            near = ""
            try:
                if abs(float(a) - float(b)) < 1e-6: near = " (NEAR-MISS <1e-6)"
            except (TypeError, ValueError):
                pass
            print(f"    row {i} col {c}: spark={a!r} oracle={b!r}{near}")
        fail += 1
        continue
    tbad = dtype_mismatches(f"SELECT * FROM read_parquet('{d}/*.parquet')",
                            oracles[name])
    if tbad:
        print(f"  {name}: DTYPE MISMATCH (values equal, driver hash would "
              f"diverge): " + ", ".join(f"{c} spark={a} oracle={b}"
                                        for c, a, b in tbad))
        fail += 1
    else:
        print(f"  {name}: OK ({len(s)} rows, {len(scols)} cols)")
        ok += 1
print(f"\n{ok} ok, {fail} failed, "
      f"{len([n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n)) and n not in oracles])} rows-only")
sys.exit(1 if fail else 0)
