#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load Verify's parquet
dumps, run each oracle SQL in DuckDB (tables registered as views over the
sf dir), compare sorted rows/columns. Usage: check.py <sfDir> <outDir>.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed = [], []
    # Queries that ERRORED in Verify are explicit FAIL rows, not silent
    # absences — the artifact must be self-contained (ADVICE r10).
    try:
        for name, msg in sorted(json.load(
                open(f"{out_dir}/verify_errors.json")).items()):
            failed.append((name, f"verify error: {msg[:200]}"))
    except FileNotFoundError:
        pass
    errored = {name for name, _ in failed}
    for name, sql in sorted(oracle.items()):
        if name in errored:
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got_rel.columns
            # The driver sorts with pandas, which cannot order list columns
            # (numpy.ndarray is unhashable) — round 2's d6_sig_union trap.
            # Flag them here so local green implies driver green.
            listy = [c for c, t in zip(got_cols, got_rel.types)
                     if str(t).endswith("[]") or str(t).startswith("STRUCT")]
            if listy:
                failed.append((name, f"driver-unsortable columns {listy}: "
                               "explode or stringify ARRAY/STRUCT outputs"))
                continue
            got = canon(got_rel.fetchall(), got_cols)
        except Exception as e:
            failed.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            want_rel = con.sql(sql)
            want_cols = want_rel.columns
            # Driver-faithfulness gate (round-12 lesson): the driver loads
            # the oracle result through pandas, which renders DuckDB
            # HUGEINT/DECIMAL as float64 while Spark's parquet is int64 —
            # the values then hash as "72110.0" vs "72110" and fail even
            # though they are numerically equal. Reject such oracle output
            # types outright: the oracle must CAST in its final SELECT.
            bad_types = [f"{c}:{t}" for c, t in zip(want_cols, want_rel.types)
                         if "HUGEINT" in str(t) or "DECIMAL" in str(t)]
            if bad_types:
                failed.append((name, "oracle final SELECT emits driver-"
                               f"unfaithful types {bad_types}: wrap in "
                               "CAST(... AS BIGINT/DOUBLE)"))
                continue
            want = canon(want_rel.fetchall(), want_cols)
        except Exception as e:
            failed.append((name, f"oracle error: {str(e).splitlines()[0][:200]}"))
            continue
        # Second dtype gate: compare pandas dtype KINDS the way the driver
        # materializes both sides. An int64-vs-float64 split on the same
        # column name means the driver's hasher will mismatch regardless of
        # values.
        try:
            got_k = {c: d.kind for c, d in got_rel.df().dtypes.items()}
            want_k = {c: d.kind for c, d in want_rel.df().dtypes.items()}
            dk = [f"{c}: spark={got_k[c]} oracle={want_k[c]}"
                  for c in got_k
                  if c in want_k and got_k[c] != want_k[c]
                  and {got_k[c], want_k[c]} <= {"i", "u", "f"}
                  and not ({got_k[c], want_k[c]} <= {"i", "u"})]
            if dk:
                failed.append((name, f"pandas dtype kinds differ: {dk}"))
                continue
        except Exception:
            pass  # driver can sort these rows; fall through to value compare
        if sorted(got_cols) != sorted(want_cols):
            failed.append((name, f"cols differ: spark={sorted(got_cols)} oracle={sorted(want_cols)}"))
            continue
        if len(got) != len(want):
            failed.append((name, f"rowcount {len(got)} vs {len(want)}"))
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            if g != w:
                ok = True
                for x, y in zip(g, w):
                    if x == y:
                        continue
                    if isinstance(x, float) and isinstance(y, float) and \
                       abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                        continue
                    ok = False
                if not ok:
                    bad = (i, g, w)
                    break
        if bad:
            failed.append((name, f"row {bad[0]}: spark={bad[1]} oracle={bad[2]}"))
        else:
            passed.append(name)
    print(f"PASS {len(passed)}/{len(oracle)}: {' '.join(passed)}")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
