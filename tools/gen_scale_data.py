"""Replication-scale the sf0.1 testdata to larger scale factors.

The driver provides sf{0.001,0.01,0.1}; the 100-TB story needs measured
points ABOVE sf0.1 (VERDICT r8 item 3).  This tool builds sf0.3 / sf1.0
inputs by unioning K key-offset copies of the read-only sf0.1 tables:

- fact/dim keys shift by ``copy * stride`` (stride = max key + 1), so
  referential integrity and every per-key distribution are preserved
  exactly while row counts scale by K;
- ``documents.text`` gets a per-copy suffix token so replication does
  not fabricate K-way exact-duplicate clusters (which would inflate
  dedup pair counts quadratically instead of scaling the workload);
- ``embeddings.embedding`` gets small deterministic per-copy noise
  (seeded by (copy, vec_id)) and renormalization, for the same reason
  on the near-dup / ANN side;
- ``region`` and ``nation`` stay as-is (fixed TPC-H dimensions).

This is a SCALING harness, not a statistical twin of the driver
generator: each copy's marginals are identical to sf0.1, so measured
sec-vs-sf exponents reflect the engine's partition/shuffle behavior,
not distribution drift.

Usage: python tools/gen_scale_data.py <K> <out_dir>   (K=3 and K=10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"

KEYED = {
    # table -> {column: stride-source table key column}
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def main() -> None:
    k = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    strides: dict[str, int] = {}
    for t in ["customer", "supplier", "part", "orders", "events",
              "documents", "embeddings"]:
        df = pd.read_parquet(f"{SRC}/{t}.parquet")
        for col in df.columns:
            if col in ("c_custkey", "s_suppkey", "p_partkey",
                       "o_orderkey", "event_id", "user_id", "doc_id",
                       "vec_id"):
                strides[col] = int(df[col].max()) + 1
    for t in ["region", "nation"]:
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(
            f"{out}/{t}.parquet", index=False
        )
    for t, cols in KEYED.items():
        base = pd.read_parquet(f"{SRC}/{t}.parquet")
        copies = []
        for c in range(k):
            cp = base.copy()
            for col, stride_key in cols.items():
                cp[col] = cp[col] + c * strides[stride_key]
            if t == "documents" and c > 0:
                cp["text"] = cp["text"].astype(str) + f" copytok{c}"
                if "n_chars" in cp.columns:
                    cp["n_chars"] = cp["text"].str.len()
            if t == "embeddings" and c > 0:
                rng = np.random.default_rng(1_000_003 * c + 17)
                mat = np.stack(cp["embedding"].to_numpy()).astype(
                    np.float64
                )
                mat = mat + rng.normal(scale=0.15, size=mat.shape)
                mat /= np.linalg.norm(mat, axis=1, keepdims=True)
                cp["embedding"] = [row.astype(np.float32) for row in mat]
            copies.append(cp)
        allc = pd.concat(copies, ignore_index=True)
        allc.to_parquet(f"{out}/{t}.parquet", index=False)
        print(t, len(base), "->", len(allc))


if __name__ == "__main__":
    main()
