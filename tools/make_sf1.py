"""Synthesize a local sf1 slice (10x sf0.1) for scale rehearsal.

/root/testdata is driver-owned and read-only, and the committed SFs top
out at 0.1 — so the "survives 100x" argument rested on plan shape alone.
This tool upsamples sf0.1 by REP=10 into .localdata/sf1 (gitignored),
schema-identical, so BENCH_SF1 can measure one decade of scaling on the
most expensive queries (round-8 verdict task 5).

Upsampling rules (deterministic, seed-free — pure key arithmetic):
- region/nation: fixed dims, copied as-is.
- keyed fact/dim tables: REP copies with key-space striding (new_key =
  key + rep * (max_key + 1)) applied consistently to every FK, so join
  fan-outs, group cardinalities and key distributions scale linearly
  instead of densifying (10 copies of the SAME keys would multiply
  per-key group sizes, not the key space — a different, unrealistic
  scale-up).
- events: user_id/event_id strided; ts kept (10x event density over the
  same calendar — how real traffic grows); props untouched.
- documents: doc_id strided; rep 0 keeps the original text, reps 1-9
  word-shuffle each doc with a per-(rep, doc) LCG permutation. Unigram
  stats are preserved exactly, but shingle/n-gram content differs across
  reps, so near-dup clusters do NOT inflate quadratically (10 verbatim
  copies would make every LSH bucket 10x denser and every dup cluster
  100x more pairs — super-linear by construction of the data, which
  would mask real plan super-linearity).
- embeddings: vec_id strided; reps 1-9 apply a per-rep fixed permutation
  of the 64 dims plus alternating sign flips. Norms and intra-rep
  geometry are preserved exactly; cross-rep cosine similarity is
  scrambled, so ANN/dedup candidate volume scales linearly.

Usage: python tools/make_sf1.py [--rep 10] [--out .localdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

STRIDED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

# FK stride domains must match the PK stride of the table they point at
STRIDE_DOMAIN = {
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
}


def strides(con) -> dict[str, int]:
    out = {}
    for tbl, keys in STRIDED.items():
        for k in keys:
            dom = STRIDE_DOMAIN.get(k, k)
            if dom not in out:
                src_tbl = {v: t for t, ks in STRIDED.items() for v in ks}[dom]
                out[dom] = (
                    con.execute(
                        f"SELECT MAX({dom}) + 1 FROM "
                        f"read_parquet('{SRC}/{src_tbl}.parquet')"
                    ).fetchone()[0]
                )
            out[k] = out[dom]
    return out


def upsample_keyed(con, tbl: str, rep: int, out_dir: str, st: dict) -> int:
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchall()
    ]
    parts = []
    for i in range(rep):
        sel = ", ".join(
            f"{c} + {i} * {st[c]}::BIGINT AS {c}" if c in STRIDED[tbl] else c
            for c in cols
        )
        parts.append(f"SELECT {sel} FROM read_parquet('{SRC}/{tbl}.parquet')")
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
    )
    return con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{tbl}.parquet')"
    ).fetchone()[0]


def _shuffle_words(text: str, seed: int) -> str:
    words = text.split()
    n = len(words)
    if n < 2:
        return text
    # LCG-driven Fisher-Yates: deterministic, no global RNG state
    s = (seed * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
    for j in range(n - 1, 0, -1):
        s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        k = s % (j + 1)
        words[j], words[k] = words[k], words[j]
    return " ".join(words)


def upsample_documents(con, rep: int, out_dir: str) -> int:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    stride = max(r[0] for r in rows) + 1
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(rep):
        for doc_id, text, lang, source, n_chars in rows:
            t = text if i == 0 else _shuffle_words(text, i * stride + doc_id)
            out["doc_id"].append(doc_id + i * stride)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t))
    tab = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(tab, f"{out_dir}/documents.parquet")
    return tab.num_rows


def upsample_embeddings(con, rep: int, out_dir: str) -> int:
    rows = con.execute(
        f"SELECT vec_id, embedding, label "
        f"FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    stride = max(r[0] for r in rows) + 1
    dim = len(rows[0][1])
    base = np.array([r[1] for r in rows], dtype=np.float32)
    ids, vecs, labels = [], [], []
    rng_perm = np.arange(dim)
    for i in range(rep):
        if i == 0:
            m = base
        else:
            # fixed per-rep dim permutation + alternating sign flips:
            # norm-preserving, intra-rep geometry identical, cross-rep
            # cosines scrambled. The roll amount i*7 is distinct mod 64
            # for every rep (and even reps additionally reverse), so no
            # two reps share a transform — the round-9 form gave reps 2
            # and 8 byte-identical (perm, signs), silently doubling
            # dedup/ANN candidate volume for that pair.
            perm = np.roll(rng_perm, i * 7)
            if i % 2 == 0:
                perm = perm[::-1].copy()
            signs = np.where((np.arange(dim) + i) % 3 == 0, -1.0, 1.0).astype(
                np.float32
            )
            m = base[:, perm] * signs
        ids.extend(r[0] + i * stride for r in rows)
        labels.extend(r[2] for r in rows)
        vecs.append(m)
    allv = np.concatenate(vecs, axis=0)
    tab = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(allv), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tab, f"{out_dir}/embeddings.parquet")
    return tab.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--out", default=".localdata/sf1")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    con = duckdb.connect()
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
            f"TO '{a.out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(tbl, "copied")
    st = strides(con)
    for tbl in STRIDED:
        n = upsample_keyed(con, tbl, a.rep, a.out, st)
        print(tbl, n)
    print("documents", upsample_documents(con, a.rep, a.out))
    print("embeddings", upsample_embeddings(con, a.rep, a.out))


if __name__ == "__main__":
    main()
