#!/usr/bin/env python
"""Segment breakdown of ann_graph_beam_audit (r10 VERDICT next-round #5).

Re-runs the operator's exact internal structure with a wall timer around
each segment: (a) index build — banded candidates, edge scoring, kNN
cut, symmetrize, persist; (b) the GRAPH_HOPS beam rounds (one collect
each); (c) the exact-recall audit + final assembly through the noop
sink.  Also times the registered query end-to-end in the same session
for the cross-check total.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from velib_lakehouse_spark.operators import similarity as S
from velib_lakehouse_spark.registry import QUERIES
from velib_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def segments(spark) -> dict[str, float]:
    t: dict[str, float] = {}
    t0 = time.perf_counter()
    v = S._vectors(spark, SF_DIR).persist()
    bands_arr = "array({})".format(
        ", ".join(S._band_bucket_expr("v", b) for b in range(S.ANN_BANDS))
    )
    from velib_lakehouse_spark.functions.hashing import md5_long

    wb = Window.partitionBy("band", "bucket").orderBy(
        md5_long(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    vb = (
        v.select(
            "vec_id", F.posexplode(F.expr(bands_arr)).alias("band", "bucket")
        )
        .withColumn("r", F.row_number().over(wb))
        .persist()
    )
    steps = spark.range(1, S.GRAPH_NBHD + 1).select(
        F.col("id").cast("int").alias("step")
    )
    probes = vb.crossJoin(F.broadcast(steps)).select(
        "band",
        "bucket",
        (F.col("r") + F.col("step")).alias("r"),
        F.col("vec_id").alias("peer"),
    )
    cand = (
        vb.join(probes.hint("merge"), ["band", "bucket", "r"])
        .where(F.col("vec_id") != F.col("peer"))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("vec_id").alias("src"), F.col("peer").alias("dst")
                    ),
                    F.struct(
                        F.col("peer").alias("src"), F.col("vec_id").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    scored_e = (
        cand.join(
            v.select(
                F.col("vec_id").alias("src"),
                F.col("v").alias("sv"),
                F.col("norm").alias("snorm"),
            ),
            "src",
        )
        .join(
            v.select(
                F.col("vec_id").alias("dst"),
                F.col("v").alias("dv"),
                F.col("norm").alias("dnorm"),
            ),
            "dst",
        )
        .select(
            "src",
            "dst",
            F.round(
                F.expr(S._DOT.format(a="sv", b="dv"))
                / (F.col("snorm") * F.col("dnorm")),
                6,
            ).alias("cos"),
        )
    )
    wdeg = Window.partitionBy("src").orderBy(
        F.col("cos").desc(), F.col("dst").asc()
    )
    knn = (
        scored_e.withColumn("rn", F.row_number().over(wdeg))
        .filter(F.col("rn") <= S.GRAPH_DEG)
        .select("src", "dst")
    )
    edges = (
        knn.unionByName(
            knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    n_edges = edges.count()  # force the index build
    t["index_build"] = round(time.perf_counter() - t0, 3)

    q = v.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    entries = v.filter(
        (F.col("vec_id") >= S.N_QUERIES)
        & (F.col("vec_id") < S.N_QUERIES + S.GRAPH_ENTRIES)
    ).select("vec_id")

    def _score(ids):
        return (
            ids.join(v, "vec_id")
            .join(F.broadcast(q), "q_vec_id")
            .where(F.col("vec_id") != F.col("q_vec_id"))
            .select(
                "q_vec_id",
                "vec_id",
                F.round(
                    F.expr(S._DOT.format(a="qv", b="v"))
                    / (F.col("qnorm") * F.col("norm")),
                    6,
                ).alias("cos"),
            )
        )

    wq = Window.partitionBy("q_vec_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    t0 = time.perf_counter()
    frontier_rows = [
        (r["q_vec_id"], r["vec_id"])
        for r in q.select("q_vec_id").crossJoin(F.broadcast(entries)).collect()
    ]
    t["entries_collect"] = round(time.perf_counter() - t0, 3)
    beam_rows: list[tuple] = []
    for h in range(S.GRAPH_HOPS):
        t0 = time.perf_counter()
        frontier = spark.createDataFrame(
            frontier_rows, "q_vec_id long, vec_id long"
        )
        expanded = frontier.unionByName(
            edges.join(
                F.broadcast(
                    frontier.select("q_vec_id", F.col("vec_id").alias("src"))
                ),
                "src",
            ).select("q_vec_id", F.col("dst").alias("vec_id"))
        ).distinct()
        beam_rows = [
            (r["q_vec_id"], r["vec_id"], r["cos"])
            for r in (
                _score(expanded)
                .withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") <= S.GRAPH_BEAM)
                .select("q_vec_id", "vec_id", "cos")
                .collect()
            )
        ]
        frontier_rows = [(qv, vid) for qv, vid, _ in beam_rows]
        t[f"hop_{h}"] = round(time.perf_counter() - t0, 3)
    v.unpersist()
    vb.unpersist()
    edges.unpersist()
    t0 = time.perf_counter()
    vx = S._vectors(spark, SF_DIR)
    qx = vx.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    exact = (
        vx.crossJoin(F.broadcast(qx))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .withColumn(
            "cos",
            F.round(
                F.expr(S._DOT.format(a="qv", b="v"))
                / (F.col("qnorm") * F.col("norm")),
                6,
            ),
        )
        .withColumn("xrn", F.row_number().over(wq))
        .filter(F.col("xrn") <= S.TOP_K)
        .select("q_vec_id", "vec_id", F.lit(1).alias("hit"))
    )
    beam = spark.createDataFrame(
        beam_rows, "q_vec_id long, vec_id long, cos double"
    )
    (
        beam.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= S.TOP_K)
        .join(exact, ["q_vec_id", "vec_id"], "left")
        .select(
            "q_vec_id",
            "vec_id",
            "cos",
            F.col("rank").cast("bigint").alias("rank"),
            F.coalesce("hit", F.lit(0)).cast("bigint").alias("in_exact"),
        )
    ).write.format("noop").mode("overwrite").save()
    t["exact_audit_and_sink"] = round(time.perf_counter() - t0, 3)
    t["n_edges"] = n_edges
    return t


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(app_name="beam-segments")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    for i in range(2):
        t0 = time.perf_counter()
        QUERIES["ann_graph_beam_audit"](spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        total = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        seg = segments(spark)
        spark.catalog.clearCache()
        print(f"run{i}: total={total} segments={seg}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
