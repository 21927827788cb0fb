"""r14 equivalence check: fused pq_fit vs the old per-subspace
kmeans_fit loop, and Arrow-kernel pca_transform vs the r13 JVM HOF
expression — bit-for-bit on the real sf0.01 embeddings."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sids_data_pipeline_spark.operators.similarity import (
    pq_fit,
    kmeans_fit,
    pca_fit,
    pca_transform,
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("r14-equiv")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
print("rows:", emb.count(), "schema:", emb.schema.simpleString())
id_col, vec_col = emb.columns[0], emb.columns[1]

# --- old pq_fit: per-subspace kmeans_fit loop (r13 shape, verbatim) ---
first = emb.select(vec_col).first()
d = len(first[0])
m, kc, iters = 4, 16, 5
sub = d // m
old_books = []
for s in range(m):
    subdf = emb.select(
        id_col, F.slice(vec_col, s * sub + 1, sub).alias(vec_col)
    )
    cb, _assigned = kmeans_fit(subdf, k=kc, iters=iters, id_col=id_col, vec_col=vec_col)
    old_books.append(cb)

new_books = pq_fit(emb, m=m, kc=kc, iters=iters, id_col=id_col, vec_col=vec_col)
assert old_books == new_books, "pq_fit MISMATCH"
print("pq_fit: fused == per-subspace, bit-identical", flush=True)

# also m=8 to catch shape bugs
old8 = []
sub8 = d // 8
for s in range(8):
    subdf = emb.select(id_col, F.slice(vec_col, s * sub8 + 1, sub8).alias(vec_col))
    cb, _a = kmeans_fit(subdf, k=8, iters=3, id_col=id_col, vec_col=vec_col)
    old8.append(cb)
new8 = pq_fit(emb, m=8, kc=8, iters=3, id_col=id_col, vec_col=vec_col)
assert old8 == new8, "pq_fit m=8 MISMATCH"
print("pq_fit m=8/kc=8/iters=3: bit-identical", flush=True)

# --- old pca_transform: r13 HOF expression (verbatim reconstruction) ---
def old_pca_transform(df, model, vec_col="embedding", out_col="pc", whiten=False):
    mean = model["mean"]
    comps = model["components"]
    explained = model.get("explained", [])
    mean_lit = F.array(*[F.lit(float(mm)) for mm in mean])
    comp_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in comps]
    )
    scales = [
        1.0 / math.sqrt(explained[ci])
        if whiten and ci < len(explained) and explained[ci] > 0
        else 1.0
        for ci in range(len(comps))
    ]
    ctr = f"_ctr_{out_col}"
    while ctr in df.columns:
        ctr += "_"
    staged = df.withColumn(
        ctr,
        F.zip_with(F.col(vec_col), mean_lit, lambda x, mu: x.cast("double") - mu),
    )
    proj = F.transform(
        comp_lit,
        lambda row: F.aggregate(
            F.zip_with(row, F.col(ctr), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if any(s != 1.0 for s in scales):
        proj = F.zip_with(
            proj, F.array(*[F.lit(s) for s in scales]), lambda p, s: p * s
        )
    return staged.withColumn(out_col, proj).drop(ctr)


model = pca_fit(emb, k=16, vec_col=vec_col)
for whiten in (False, True):
    a = old_pca_transform(emb, model, vec_col=vec_col, whiten=whiten).select(
        id_col, "pc"
    ).orderBy(id_col).collect()
    b = pca_transform(emb, model, vec_col=vec_col, whiten=whiten).select(
        id_col, "pc"
    ).orderBy(id_col).collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0]
        assert list(ra.pc) == list(rb.pc), f"pca MISMATCH id={ra[0]} whiten={whiten}\n{ra.pc}\n{rb.pc}"
    print(f"pca_transform whiten={whiten}: {len(a)} rows bit-identical", flush=True)

# full-rank (the opq_rotate shape: k = d, zero mean)
full = {"mean": [0.0] * d, "components": [[1.0 if i == j else (0.01 * ((i * 7 + j * 3) % 11 - 5)) for j in range(d)] for i in range(d)], "explained": []}
a = old_pca_transform(emb, full, vec_col=vec_col).select(id_col, "pc").orderBy(id_col).collect()
b = pca_transform(emb, full, vec_col=vec_col).select(id_col, "pc").orderBy(id_col).collect()
for ra, rb in zip(a, b):
    assert list(ra.pc) == list(rb.pc), f"full-rank MISMATCH id={ra[0]}"
print(f"pca_transform full-rank {d}x{d}: {len(a)} rows bit-identical", flush=True)

# null/width edge cases
edge = spark.createDataFrame(
    [(1, [1.5] * d), (2, None), (3, [1.0] * (d - 1))],
    f"{id_col} long, {vec_col} array<float>",
)
a = old_pca_transform(edge, model, vec_col=vec_col).select(id_col, "pc").orderBy(id_col).collect()
b = pca_transform(edge, model, vec_col=vec_col).select(id_col, "pc").orderBy(id_col).collect()
for ra, rb in zip(a, b):
    la = None if ra.pc is None else list(ra.pc)
    lb = None if rb.pc is None else list(rb.pc)
    assert la == lb, f"edge MISMATCH id={ra[0]}: {la} vs {lb}"
print("pca_transform null/width edge rows match:", [(r[0], r.pc) for r in b], flush=True)

print("ALL EQUIVALENCE CHECKS PASSED")
spark.stop()
