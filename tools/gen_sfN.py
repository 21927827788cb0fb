"""Scale a driver testdata directory up by an integer factor.

The driver ships sf{0.001,0.01,0.1}; the bench at sf0.1 is floor-dominated
on most relational queries (VERDICT r10 Next #6), so this produces an
sf1.0-equivalent directory for a work-dominated datapoint WITHOUT touching
the read-only /root/testdata tree.

Method — replica stamping, the TPC-H dbgen convention re-expressed over
the base parquet (every key range in the base is dense 0-based, verified
in-script):

* ``region``/``nation`` are fixed dimensions: copied as-is.
* ``customer``/``supplier``/``part``/``orders``/``lineitem``: replica i
  adds ``i * base_rowcount`` to every PRIMARY and FOREIGN key that scales
  (o_custkey -> customer replica i, l_partkey/l_suppkey/l_orderkey
  likewise), so join fan-in/fan-out and filter selectivities are
  byte-identical per replica — the same shape dbgen produces at a larger
  SF. Non-key columns (dates, prices, flags, names) are untouched.
* ``events``: event_id/user_id offset per replica; timestamps unchanged
  (10x users -> 10x concurrent sessions, the shape sessionization scales
  with).
* ``documents``: replica 0 is the base corpus verbatim; replicas 1..9 are
  REGENERATED with the base generator's own statistics (vocabulary =
  distinct base tokens, per-doc token-count distribution resampled from
  the base, lang/source proportions preserved, the base's exact-duplicate
  rate re-planted per replica). Plain row duplication would be wrong
  here: it would hand dedup_exact/minhash a corpus where every text has
  factor-many copies — a pair-explosion the base workload doesn't have.
* ``embeddings``: replica 0 verbatim; replicas 1..9 perturb the base
  unit vectors with seeded gaussian noise and renormalize — preserves the
  10-label cluster geometry without degenerate duplicate vectors.

Deterministic: every replica draws from numpy PCG64 seeded with
(table, replica). Usage:

    python tools/gen_sfN.py --base /root/testdata/sf0.1 \
        --out /root/repo/.bench_sf1 --factor 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _seed(table: str, replica: int) -> np.random.Generator:
    # zlib.crc32 is stable across processes — Python's hash() is salted
    # per-run (PYTHONHASHSEED), which would make the "deterministic"
    # generator produce different data on every invocation
    import zlib

    return np.random.default_rng(zlib.crc32(f"{table}/{replica}".encode()))


def _stamp(tbl: pa.Table, replica: int, offsets: dict[str, int]) -> pa.Table:
    cols = []
    for name in tbl.column_names:
        col = tbl.column(name)
        if name in offsets and replica > 0:
            col = pa.compute.add(col, replica * offsets[name])
        cols.append(col)
    return pa.table(dict(zip(tbl.column_names, cols)))


def _gen_documents(base: pa.Table, replica: int, n_base: int) -> pa.Table:
    rng = _seed("documents", replica)
    texts = [t for t in base.column("text").to_pylist() if t]
    vocab = sorted({w for t in texts for w in t.split(" ")})
    lens = np.array([len(t.split(" ")) for t in texts])
    langs = base.column("lang").to_pylist()
    lang_vals, lang_counts = np.unique(np.array(langs), return_counts=True)
    n_dup_pairs = n_base - len(set(base.column("text").to_pylist()))

    n_words = rng.choice(lens, size=n_base)
    word_idx = [rng.integers(0, len(vocab), size=k) for k in n_words]
    new_texts = [" ".join(vocab[j] for j in idx) for idx in word_idx]
    # re-plant the base's exact-duplicate rate (pairs of identical texts)
    dup_src = rng.choice(n_base, size=2 * n_dup_pairs, replace=False)
    for a, b in zip(dup_src[::2], dup_src[1::2]):
        new_texts[b] = new_texts[a]
    new_langs = rng.choice(lang_vals, size=n_base, p=lang_counts / lang_counts.sum())
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(n_base, dtype=np.int64) + replica * n_base
            ),
            "text": pa.array(new_texts),
            "lang": pa.array(new_langs.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n_base)]),
            "n_chars": pa.array(
                np.array([len(t) for t in new_texts], dtype=np.int64)
            ),
        }
    )


def _gen_embeddings(base: pa.Table, replica: int, n_base: int) -> pa.Table:
    rng = _seed("embeddings", replica)
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    noisy = vecs + rng.normal(0.0, 0.08, size=vecs.shape).astype(np.float32)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(
                np.arange(n_base, dtype=np.int64) + replica * n_base
            ),
            "embedding": pa.array(
                [v for v in noisy.tolist()], type=pa.list_(pa.float32())
            ),
            "label": base.column("label"),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--row-group-size",
        type=int,
        default=128_000,
        help="parquet row-group rows. The driver's sf0.1 files are ONE "
        "row group each, capping scan parallelism at 1 task per table "
        "for BOTH Spark and DuckDB; a 100 TB lake is thousands of "
        "splits, so the scaled files are written splittable — 128k-row "
        "groups give the 6M-row lineitem ~47 scan tasks on local[32].",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    tables = {
        t: pq.read_table(os.path.join(args.base, f"{t}.parquet"))
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split()
    }
    counts = {t: tbl.num_rows for t, tbl in tables.items()}
    # dense 0-based key precondition — replica stamping is only exact then
    for t, key in (
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
    ):
        lo = pa.compute.min(tables[t].column(key)).as_py()
        hi = pa.compute.max(tables[t].column(key)).as_py()
        assert lo == 0 and hi == counts[t] - 1, (t, lo, hi)
        # min/max alone can't see duplicates — a key column with dupes
        # would make replica stamping emit colliding keys
        ndist = pa.compute.count_distinct(tables[t].column(key)).as_py()
        assert ndist == counts[t], (t, "dup keys", ndist, counts[t])

    offsets = {
        "customer": {"c_custkey": counts["customer"]},
        "supplier": {"s_suppkey": counts["supplier"]},
        "part": {"p_partkey": counts["part"]},
        "orders": {
            "o_orderkey": counts["orders"],
            "o_custkey": counts["customer"],
        },
        "lineitem": {
            "l_orderkey": counts["orders"],
            "l_partkey": counts["part"],
            "l_suppkey": counts["supplier"],
        },
        "events": {
            "event_id": counts["events"],
            # derive the user-id stride from the base (dense 0-based ids
            # are NOT guaranteed for users, so offset past the max seen)
            "user_id": pa.compute.max(
                tables["events"].column("user_id")
            ).as_py() + 1,
        },
    }

    for t, tbl in tables.items():
        path = os.path.join(args.out, f"{t}.parquet")
        if t in ("region", "nation"):
            pq.write_table(tbl, path)
            continue
        replicas = []
        for i in range(args.factor):
            if t == "documents":
                replicas.append(
                    tbl if i == 0 else _gen_documents(tbl, i, counts[t])
                )
            elif t == "embeddings":
                replicas.append(
                    tbl if i == 0 else _gen_embeddings(tbl, i, counts[t])
                )
            else:
                replicas.append(_stamp(tbl, i, offsets.get(t, {})))
        out = pa.concat_tables([r.select(tbl.column_names) for r in replicas])
        pq.write_table(out, path, row_group_size=args.row_group_size)
        print(f"{t}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
