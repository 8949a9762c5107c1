#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet result (written by graft.Verify), runs the
corresponding DuckDB oracle SQL from <out>/oracle_sql.json over the sf_dir
parquet tables, and compares: row count, schema (sorted column names), and
values (rows sorted, columns sorted by name; exact for non-floats, exact and
1e-9-relative for floats, both reported)."""
import sys, json, glob, math, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pq.ParquetDataset(f"{outdir}/{name}").read().to_pandas()

def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort", na_position="first")
    return df

def compare(name, s, d):
    issues = []
    if sorted(s.columns) != sorted(d.columns):
        return [f"SCHEMA cols spark={sorted(s.columns)} duck={sorted(d.columns)}"]
    if len(s) != len(d):
        return [f"ROWS spark={len(s)} duck={len(d)}"]
    s, d = normalize(s), normalize(d)
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                a = sv.astype(float); b = dv.astype(float)
                exact = ((a == b) | (a.isna() & b.isna())).all()
                close = all(
                    (math.isnan(x) and math.isnan(y)) or x == y or
                    abs(x - y) <= 1e-9 * max(abs(x), abs(y), 1.0)
                    for x, y in zip(a.fillna(float("nan")), b.fillna(float("nan"))))
                if not exact:
                    tag = "FLOAT_ULP" if close else "FLOAT_DIFF"
                    bad = (a - b).abs().idxmax()
                    issues.append(f"{tag} col={c} e.g. {a[bad]!r} vs {b[bad]!r}")
            else:
                eq = (sv.astype(object).where(pd.notna(sv), None)
                      == dv.astype(object).where(pd.notna(dv), None)) | (sv.isna() & dv.isna())
                if not eq.all():
                    i = eq.idxmin()
                    issues.append(f"VAL col={c} row{i}: {sv[i]!r} vs {dv[i]!r}")
        except Exception as e:
            issues.append(f"CMPERR col={c}: {e}")
    return issues

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    try:
        errors = json.load(open(f"{outdir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata are single files; ScaleUp output (sf1) is a
        # Spark-style directory of part files — glob it for DuckDB
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    ok = fail = noracle = 0
    for name in sorted(oracle):
        sql = oracle[name]
        if name in errors:
            print(f"QUERYERR {name}: {errors[name]}"); fail += 1; continue
        s = load_spark(outdir, name)
        if s is None:
            print(f"MISSING  {name}: no spark output"); fail += 1; continue
        if list(s.columns) == ["__query_error"]:
            print(f"QUERYERR {name}: {s['__query_error'][0]}"); fail += 1; continue
        try:
            rel = con.sql(sql)
            # Guard the whole bug class behind r4's q64: DuckDB widens
            # sum(BIGINT) to HUGEINT (and leaves DECIMAL uncast), which the
            # driver materializes as float64 while Spark writes int64 — a
            # type-level hash mismatch on bit-identical values. Every oracle
            # must cast such columns (CAST(... AS BIGINT/DOUBLE)) explicitly.
            badtypes = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                        if "HUGEINT" in str(t) or "DECIMAL" in str(t)]
            if badtypes:
                print(f"ORACLETYPE {name}: uncast oracle output column(s) {badtypes} "
                      f"(HUGEINT/DECIMAL hash-mismatch vs Spark — add explicit CASTs)")
                fail += 1; continue
            d = rel.df()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}"); fail += 1; continue
        issues = compare(name, s, d)
        if issues:
            print(f"MISMATCH {name} ({len(s)} rows): " + "; ".join(issues[:4])); fail += 1
        else:
            print(f"OK       {name} ({len(s)} rows)"); ok += 1
    for d_ in sorted(glob.glob(f"{outdir}/*/")):
        n = d_.rstrip("/").split("/")[-1]
        if n not in oracle:
            if n in errors:
                print(f"QUERYERR {n}: {errors[n]}"); fail += 1; continue
            sp = load_spark(outdir, n)
            print(f"NOORACLE {n} ({0 if sp is None else len(sp)} rows)"); noracle += 1
    for n in sorted(errors):
        if n not in oracle and not glob.glob(f"{outdir}/{n}/"):
            print(f"QUERYERR {n}: {errors[n]}"); fail += 1
    print(f"\n{ok} ok, {fail} fail, {noracle} without oracle")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
