#!/usr/bin/env python3
"""Determinism audit: every registered query must be bit-identical across
shuffle-partition counts (re-partitioning must never change results).

Usage:
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/vd8"
  SPARK_GRAFT_CPUS=3 sbt "runMain graft.Verify <sfDir> /tmp/vd3"
  python3 tools/determinism.py /tmp/vd8 /tmp/vd3

Compares each <name>/ parquet dump as an unordered multiset with columns
sorted by name (same canonicalization as tools/check.py). Exit 1 on any
mismatch.
"""
import os
import sys

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(dir_a: str, dir_b: str) -> int:
    names = sorted(n for n in os.listdir(dir_a)
                   if os.path.isdir(os.path.join(dir_a, n)))
    bad = []
    for name in names:
        a = canon(pd.read_parquet(os.path.join(dir_a, name)))
        b = canon(pd.read_parquet(os.path.join(dir_b, name)))
        status = "PASS" if a.equals(b) else "FAIL"
        if status == "FAIL":
            bad.append(name)
        print(f"{status} {name} ({len(a)} vs {len(b)} rows)")
    print(f"== {len(names) - len(bad)} identical, {len(bad)} mismatched ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
