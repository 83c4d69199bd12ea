#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each query
parquet dump in <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB against the raw testdata tables, then compares
(column-name-sorted, row-sorted) values. Exit 0 iff all match.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def dtypes(con, sql):
    """Pandas dtypes as the driver's fetchdf canonicalization sees them.

    DuckDB HUGEINT (e.g. an uncast windowed sum) silently becomes float64
    here, which value-level compares miss but the driver's hash catches.
    """
    df = con.execute(sql).fetchdf()
    return {c: str(df[c].dtype) for c in df.columns}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # a query that THREW in Verify writes no dump at all — without this
    # check it would vanish from the sweep and ALL GREEN would lie
    # (Verify logs it as "[verify] <q> failed", but the gate is here)
    for name in sorted(set(oracle) - set(names)):
        print(f"FAIL {name}: oracle present but no dump "
              f"(query threw in Verify? see the Verify log)")
        failures += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            failures += 1
            continue
        scols, srows = frame(
            con, f"SELECT * FROM read_parquet({files!r})")
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            ocols, orows = frame(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            failures += 1
            continue
        sdt = dtypes(con, f"SELECT * FROM read_parquet({files!r})")
        odt = dtypes(con, oracle[name])
        bad = [c for c in sdt
               if sdt[c].startswith("int") and odt.get(c, "").startswith("float")]
        if bad:
            print(f"FAIL {name}: oracle canonicalizes as float where spark "
                  f"is integer: {[(c, sdt[c], odt[c]) for c in bad]}")
            failures += 1
            continue
        if srows != orows:
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"  first diff at sorted row {i}:")
                    print(f"    spark : {a}")
                    print(f"    oracle: {b}")
                    break
            else:
                n = min(len(srows), len(orows))
                print(f"  length mismatch after {n} equal rows")
                if len(srows) > n:
                    print(f"    spark extra : {srows[n]}")
                if len(orows) > n:
                    print(f"    oracle extra: {orows[n]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(srows)} rows")
    failures += containment_audits(con, out_dir)
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


def containment_audits(con, out_dir):
    """Recall contracts the hash gate structurally cannot check.

    q127's oracle replays the SAME q-gram blocking as the engine, so a
    blocking recall loss (possible only for names shorter than
    q*(k+1) = 9 chars) would cancel out of the hash comparison. This
    audit recomputes ground truth by BRUTE FORCE — all-pairs edit
    distance over the distinct name universe, no blocking — at the
    verified SF, so a testdata regen that shifts name lengths fails
    loudly here instead of silently losing pairs. Constants mirror
    Dedup.FuzzyQ = 3 / FuzzyMaxDist = 2.
    """
    files = glob.glob(f"{out_dir}/q127_fuzzy_join/*.parquet")
    if not files:
        return 0  # subset run without q127
    got = set(con.execute(
        f"SELECT name_a, name_b, dist FROM read_parquet({files!r})"
    ).fetchall())
    brute = set(con.execute("""
        WITH nm AS (SELECT DISTINCT p_name AS name FROM part
                    WHERE len(p_name) >= 3)
        SELECT a.name, b.name, levenshtein(a.name, b.name) AS dist
        FROM nm a JOIN nm b ON a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 2""").fetchall())
    if got != brute:
        print(f"FAIL q127 brute-force containment: engine {len(got)} pairs, "
              f"brute force {len(brute)}; missing={sorted(brute - got)[:5]} "
              f"extra={sorted(got - brute)[:5]}")
        return 1
    print(f"OK   q127 brute-force containment: {len(brute)} pairs, "
          f"blocking lost nothing at this SF")
    return 0


if __name__ == "__main__":
    main()
