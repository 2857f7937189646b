#!/usr/bin/env python3
"""Byte- and value-compare two graft.Verify output dirs (determinism probe)."""
import sys, glob, os, hashlib
from collections import Counter
import duckdb

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, d)))
byte_eq, order_diff, value_diff, missing = [], [], [], []
con = duckdb.connect()
for n in names:
    fa = glob.glob(os.path.join(a_dir, n, "part-*.parquet"))
    fb = glob.glob(os.path.join(b_dir, n, "part-*.parquet"))
    if len(fa) != 1 or len(fb) != 1:
        missing.append(n); continue
    ha = hashlib.sha256(open(fa[0], "rb").read()).hexdigest()
    hb = hashlib.sha256(open(fb[0], "rb").read()).hexdigest()
    if ha == hb:
        byte_eq.append(n); continue
    # bytes differ -> value compare, ordered then orderless
    ra = con.execute(f"SELECT * FROM read_parquet('{fa[0]}')").fetchall()
    rb = con.execute(f"SELECT * FROM read_parquet('{fb[0]}')").fetchall()
    if ra == rb:
        order_diff.append((n, "values+order identical, parquet bytes differ"))
    elif sorted(map(repr, ra)) == sorted(map(repr, rb)):
        order_diff.append((n, f"same multiset, row order differs ({len(ra)} rows)"))
    else:
        # Counter, not set: duplicate-row multiplicity differences must
        # show up in the only-in counts (a set collapses them to 0/0)
        ca, cb = Counter(map(repr, ra)), Counter(map(repr, rb))
        value_diff.append((n, f"{len(ra)} vs {len(rb)} rows; "
                              f"{sum((ca - cb).values())} only-in-A, "
                              f"{sum((cb - ca).values())} only-in-B"))
print(f"byte-identical: {len(byte_eq)}/{len(names)}")
for n, why in order_diff:
    print(f"ORDER  {n}: {why}")
for n, why in value_diff:
    print(f"VALUE  {n}: {why}")
for n in missing:
    print(f"MISSING {n}")
print("== DETERMINISTIC ==" if not value_diff and not missing
      else "== DIVERGENT ==")
