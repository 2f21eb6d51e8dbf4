#!/usr/bin/env python
"""Same-session interleaved A/B of the beam-audit hop loop.

A = current shape: expanded.distinct() -> score -> row_number <= BEAM.
B = no-distinct:   score duplicates    -> dense_rank <= BEAM -> driver dedupe.

Equivalence: within a query, order by (cos desc, vec_id asc); duplicate
rows are identical (q, vec_id, cos) triples, so dense_rank of a pair
equals its row_number among distinct pairs. Asserts set equality of the
final beam every round.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.operators import similarity as S
from velib_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_index(spark):
    from velib_lakehouse_spark.functions.hashing import md5_long

    v = S._vectors(spark, SF_DIR).persist()
    bands_arr = "array({})".format(
        ", ".join(S._band_bucket_expr("v", b) for b in range(S.ANN_BANDS))
    )
    wb = Window.partitionBy("band", "bucket").orderBy(
        md5_long(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    vb = (
        v.select("vec_id", F.posexplode(F.expr(bands_arr)).alias("band", "bucket"))
        .withColumn("r", F.row_number().over(wb))
        .persist()
    )
    steps = spark.range(1, S.GRAPH_NBHD + 1).select(
        F.col("id").cast("int").alias("step")
    )
    probes = vb.crossJoin(F.broadcast(steps)).select(
        "band", "bucket", (F.col("r") + F.col("step")).alias("r"),
        F.col("vec_id").alias("peer"),
    )
    cand = (
        vb.join(probes.hint("merge"), ["band", "bucket", "r"])
        .where(F.col("vec_id") != F.col("peer"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("vec_id").alias("src"), F.col("peer").alias("dst")),
                    F.struct(F.col("peer").alias("src"), F.col("vec_id").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    scored_e = (
        cand.join(v.select(F.col("vec_id").alias("src"), F.col("v").alias("sv"),
                           F.col("norm").alias("snorm")), "src")
        .join(v.select(F.col("vec_id").alias("dst"), F.col("v").alias("dv"),
                       F.col("norm").alias("dnorm")), "dst")
        .select("src", "dst",
                F.round(F.expr(S._DOT.format(a="sv", b="dv"))
                        / (F.col("snorm") * F.col("dnorm")), 6).alias("cos"))
    )
    wdeg = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    knn = (scored_e.withColumn("rn", F.row_number().over(wdeg))
           .filter(F.col("rn") <= S.GRAPH_DEG).select("src", "dst"))
    edges = (knn.unionByName(knn.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
             .distinct().persist())
    edges.count()
    q = v.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"))
    entries = v.filter((F.col("vec_id") >= S.N_QUERIES)
                       & (F.col("vec_id") < S.N_QUERIES + S.GRAPH_ENTRIES)).select("vec_id")
    start = [(r["q_vec_id"], r["vec_id"])
             for r in q.select("q_vec_id").crossJoin(F.broadcast(entries)).collect()]
    return v, edges, q, start


def run_hops(spark, v, edges, q, start, variant):
    wq = Window.partitionBy("q_vec_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())

    def _score(ids):
        return (ids.join(v, "vec_id").join(F.broadcast(q), "q_vec_id")
                .where(F.col("vec_id") != F.col("q_vec_id"))
                .select("q_vec_id", "vec_id",
                        F.round(F.expr(S._DOT.format(a="qv", b="v"))
                                / (F.col("qnorm") * F.col("norm")), 6).alias("cos")))

    frontier_rows = list(start)
    beam_rows = []
    t0 = time.perf_counter()
    for _ in range(S.GRAPH_HOPS):
        frontier = spark.createDataFrame(frontier_rows, "q_vec_id long, vec_id long")
        expanded = frontier.unionByName(
            edges.join(F.broadcast(frontier.select("q_vec_id", F.col("vec_id").alias("src"))),
                       "src").select("q_vec_id", F.col("dst").alias("vec_id")))
        if variant == "A":
            rows = (_score(expanded.distinct())
                    .withColumn("rn", F.row_number().over(wq))
                    .filter(F.col("rn") <= S.GRAPH_BEAM)
                    .select("q_vec_id", "vec_id", "cos").collect())
            beam_rows = [(r["q_vec_id"], r["vec_id"], r["cos"]) for r in rows]
        else:
            rows = (_score(expanded)
                    .withColumn("rn", F.dense_rank().over(wq))
                    .filter(F.col("rn") <= S.GRAPH_BEAM)
                    .select("q_vec_id", "vec_id", "cos").collect())
            beam_rows = sorted({(r["q_vec_id"], r["vec_id"], r["cos"]) for r in rows})
        frontier_rows = [(qv, vid) for qv, vid, _ in beam_rows]
    dt = round(time.perf_counter() - t0, 3)
    return dt, set(beam_rows)


def main():
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="exp-beam-hops")
    spark.range(1000).selectExpr("sum(id)").collect()
    v, edges, q, start = build_index(spark)
    ref = None
    times = {"A": [], "B": []}
    for i in range(3):
        for variant in ("A", "B"):
            dt, beam = run_hops(spark, v, edges, q, start, variant)
            times[variant].append(dt)
            if ref is None:
                ref = beam
            else:
                assert beam == ref, f"variant {variant} diverged!"
            print(f"round{i} {variant}: {dt}s beam={len(beam)}", flush=True)
    print("RESULT", {k: (min(vv), vv) for k, vv in times.items()})
    spark.stop()


if __name__ == "__main__":
    main()
