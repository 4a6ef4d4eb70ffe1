#!/bin/bash
# Reassociation / layout-sensitivity harness (COVERAGE.md "Oracle pinning"
# prescribes this manually; this institutionalizes it): run the full Verify
# sweep TWICE under different core counts — different partition counts,
# different merge orders, different reduce trees — and diff the dumps.
# Any query whose output differs between the two runs has a
# layout-dependent result (an unpinned double accumulation, a
# nondeterministic tie-break, an order-sensitive first()) that WILL
# hash-flip at cluster scale even if both runs individually pass the
# oracle. Usage: tools/recheck.sh <sfDir> [cpusA] [cpusB]
set -e
SF=${1:?usage: tools/recheck.sh <sfDir> [cpusA] [cpusB]}
A=${2:-8}
B=${3:-32}
OUTA=/tmp/graft_recheck_a
OUTB=/tmp/graft_recheck_b
rm -rf "$OUTA" "$OUTB"
SPARK_GRAFT_CPUS=$A "$(dirname "$0")/run.sh" graft.Verify "$SF" "$OUTA"
SPARK_GRAFT_CPUS=$B "$(dirname "$0")/run.sh" graft.Verify "$SF" "$OUTB"
python3 - "$OUTA" "$OUTB" <<'EOF'
import json, sys
import duckdb
a, b = sys.argv[1], sys.argv[2]
names = sorted(json.load(open(f"{a}/oracle_sql.json")))
con = duckdb.connect()
bad = []
for n in names:
    try:
        d = con.sql(
            f"SELECT count(*) FROM ((SELECT * FROM '{a}/{n}/*.parquet' "
            f"EXCEPT SELECT * FROM '{b}/{n}/*.parquet') UNION ALL "
            f"(SELECT * FROM '{b}/{n}/*.parquet' EXCEPT "
            f"SELECT * FROM '{a}/{n}/*.parquet'))").fetchone()[0]
        if d:
            bad.append((n, f"{d} differing rows"))
    except Exception as e:
        bad.append((n, f"diff error: {str(e).splitlines()[0][:160]}"))
print(f"LAYOUT-STABLE {len(names) - len(bad)}/{len(names)}")
for n, why in bad:
    print(f"LAYOUT-SENSITIVE {n}: {why}")
sys.exit(1 if bad else 0)
EOF
