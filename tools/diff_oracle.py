#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: diff_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json (or just the named
ones): load the Spark parquet result, run the oracle SQL in DuckDB
against views over <sfDir>, sort columns by name (driver protocol),
and value-compare cell by cell. Exit 1 on any mismatch.
"""
import sys, json, math, datetime

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            # Driver-faithfulness guard: the driver's hasher treats
            # DECIMAL-typed output columns differently across the two
            # engines even when every value matches (round-5 lesson:
            # pipeline_upsert / skew_aqe_join shipped red while this
            # mimic's str() normalization passed them). The repo
            # protocol is: aggregate in DECIMAL, CAST(... AS DOUBLE) as
            # the final step — so any DECIMAL column in a Spark RESULT
            # is a bug regardless of values.
            desc = con.execute(
                f"DESCRIBE SELECT * FROM '{outdir}/{name}/*.parquet'"
            ).fetchall()
            dec_cols = [r[0] for r in desc if "DECIMAL" in r[1].upper()]
            if dec_cols:
                print(f"FAIL {name}: DECIMAL output column(s) {dec_cols} "
                      "break the driver hash — cast to DOUBLE in the "
                      "final select (and CAST(... AS DOUBLE) in the oracle)")
                n_fail += 1
                continue
            # Round-7 lesson (the HUGEINT incident): the driver's hasher
            # is type-sensitive where this mimic's fetchall() is not.
            # All nine round-7 reds had a DuckDB sum(BIGINT) → HUGEINT
            # column (pandas renders int128 as float64: "5.0" vs "5"),
            # while 17 driver-GREEN queries have INTEGER-vs-BIGINT or
            # VARCHAR-vs-JSON diffs — those stringize identically and
            # are safe. So compare by stringization-equivalence class:
            # same class → ok; different class → driver hash breaks.
            def tclass(t):
                if t is None:
                    return "missing"
                t = t.upper()
                if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                         "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                    return "int"        # str() identical across widths
                if t in ("VARCHAR", "JSON"):
                    return "str"
                return t                # HUGEINT, DECIMAL(..), FLOAT,
                                        # DOUBLE, TIMESTAMP.. exact-match
            stypes = {r[0]: r[1] for r in desc}
            otypes = {r[0]: r[1]
                      for r in con.execute("DESCRIBE " + sql).fetchall()}
            tdiff = {c: (stypes.get(c), otypes.get(c))
                     for c in set(stypes) | set(otypes)
                     if tclass(stypes.get(c)) != tclass(otypes.get(c))}
            if tdiff:
                print(f"FAIL {name}: column TYPE mismatch (driver hash is "
                      f"type-sensitive): {tdiff} — CAST the oracle (e.g. "
                      "sum→BIGINT) or the Spark side until DESCRIBE agrees")
                n_fail += 1
                continue
            sdf = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols = [d[0] for d in sdf.description]
            srows = sdf.fetchall()
            odf = con.execute(sql)
            ocols = [d[0] for d in odf.description]
            orows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sv = [tuple(norm(r[i]) for i in sidx) for r in srows]
        ov = [tuple(norm(r[i]) for i in oidx) for r in orows]
        if len(sv) != len(ov):
            print(f"FAIL {name}: rowcount spark={len(sv)} oracle={len(ov)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(sv)} rows differ; first at {i}:")
            print(f"  cols:   {sorted(scols)}")
            print(f"  spark:  {a}")
            print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sv)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
