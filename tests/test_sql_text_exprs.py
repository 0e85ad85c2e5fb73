"""SQL-text expression fragments == the Python-lambda HOF forms.

r15 converted the vector/codebook expression helpers from Python-lambda
higher-order functions (F.transform/F.zip_with/F.aggregate with Python
callables) to SQL text parsed by one F.expr: each Python lambda costs
~56-70 ms of py4j round-trips at BUILD time (measured; the family's
bench rows were construction-dominated), while the parsed text is
~0.5 ms and must yield the IDENTICAL analyzed expression.  These tests
pin that identity: every converted fragment is compared against the
ORIGINAL Python-lambda construction on the real test corpus — same
values bit-for-bit (doubles fold in the same left-to-right order) and
same schema (struct field names included, since downstream getField
and array_sort orderings depend on them).
"""

from __future__ import annotations

import pyspark.sql.functions as F

import near_indexer_for_explorer_spark.functions.vectors as vec
import near_indexer_for_explorer_spark.operators.similarity as sim


def _assert_same(df, ref_col, new_col):
    """Collect both columns side by side and require exact equality
    (bit-identical doubles via repr) plus identical dtypes."""
    out = df.select(ref_col.alias("ref"), new_col.alias("new"))
    dt = dict(out.dtypes)
    assert dt["ref"] == dt["new"], (dt["ref"], dt["new"])
    rows = out.collect()
    assert rows, "empty comparison frame"
    for r in rows:
        assert repr(r["ref"]) == repr(r["new"]), (r["ref"], r["new"])


def _emb(spark, sf_dir):
    from near_indexer_for_explorer_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(64)
    return e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "emb"
        ),
    )


def test_vectors_sql_fragments_match_lambda_hofs(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "emb2", F.reverse(F.col("emb"))
    )
    # as_double_array
    raw = (
        _emb(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(64)
    )
    _assert_same(
        raw,
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.expr(vec.as_double_array_sql("embedding")),
    )
    # dot
    _assert_same(
        e,
        F.aggregate(
            F.zip_with(F.col("emb"), F.col("emb2"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        F.expr(vec.dot_sql("emb", "emb2")),
    )
    # l2_norm
    _assert_same(
        e,
        F.sqrt(
            F.aggregate(
                F.transform(F.col("emb"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        F.expr(vec.l2_norm_sql("emb")),
    )
    # cosine (against the explicit dot/norm quotient)
    nrm = e.withColumn(
        "na", F.expr(vec.l2_norm_sql("emb"))
    ).withColumn("nb", F.expr(vec.l2_norm_sql("emb2")))
    _assert_same(
        nrm,
        F.aggregate(
            F.zip_with(F.col("emb"), F.col("emb2"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("na") * F.col("nb")),
        F.expr(vec.cosine_sql("emb", "emb2", "na", "nb")),
    )


def test_distance_argmin_fragments_match_lambda_hofs(spark, sf_dir):
    e = _emb(spark, sf_dir)
    # a packed candidate row exactly like _packed_centroids builds
    cents = e.limit(4).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("c_emb")
    )
    packed = cents.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("centroid_id"), F.col("c_emb")))
        ).alias("__cands")
    )
    df = e.crossJoin(F.broadcast(packed))

    def ref_sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # _sqdist_sql
    df2 = df.withColumn("c0", F.expr("element_at(__cands, 1).c_emb"))
    _assert_same(
        df2,
        ref_sqdist(F.col("emb"), F.col("c0")),
        F.expr(sim._sqdist_sql("emb", "c0")),
    )
    # _cand_dists
    _assert_same(
        df,
        F.transform(
            F.col("__cands"),
            lambda c: ref_sqdist(F.col("emb"), c.getField("c_emb")),
        ),
        sim._cand_dists("emb"),
    )
    # _argmin_pos over the distance array
    da = df.withColumn("__da", sim._cand_dists("emb"))
    _assert_same(
        da,
        F.array_position(F.col("__da"), F.array_min(F.col("__da"))).cast(
            "int"
        ),
        sim._argmin_pos("__da"),
    )
    # _scored_candidates / _scored_candidates_idx (schema pins the
    # struct field names the array_sort orderings rely on)
    _assert_same(
        df,
        F.transform(
            F.col("__cands"),
            lambda c: F.struct(
                ref_sqdist(F.col("emb"), c.getField("c_emb")).alias("d"),
                c.getField("centroid_id").alias("centroid_id"),
            ),
        ),
        sim._scored_candidates("emb"),
    )
    _assert_same(
        df,
        F.transform(
            F.col("__cands"),
            lambda c, i: F.struct(
                ref_sqdist(F.col("emb"), c.getField("c_emb")).alias("d"),
                c.getField("centroid_id").alias("centroid_id"),
                i.alias("idx"),
            ),
        ),
        sim._scored_candidates_idx("emb"),
    )
    # _residual
    _assert_same(
        df2,
        F.zip_with(F.col("emb"), F.col("c0"), lambda x, y: x - y),
        sim._residual("emb", "c0"),
    )


def test_pq_fragments_match_lambda_hofs(spark, sf_dir):
    e = _emb(spark, sf_dir)
    books = sim._pq_books_long_from(e, sim._train_mod(sf_dir))
    packed = sim._packed_books(books)
    df = e.crossJoin(F.broadcast(packed))

    def ref_sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # _pq_sub_dists for every subspace
    for s in range(sim._PQ_M):
        sub = F.slice(F.col("emb"), s * sim._PQ_SUB + 1, sim._PQ_SUB)
        _assert_same(
            df,
            F.transform(
                F.col(f"__bk{s}"),
                lambda b: ref_sqdist(sub, b.getField("c_emb")),
            ),
            sim._pq_sub_dists("emb", s),
        )
    # _pq_adc_sum vs the old per-term element_at chain
    coded = df.select(
        "vec_id",
        *[
            sim._pq_sub_dists("emb", s).alias(f"lut_{s}")
            for s in range(sim._PQ_M)
        ],
    ).withColumn(
        "codes",
        F.expr(
            "array("
            + ", ".join(
                f"CAST(1 + pmod(vec_id + {s}, size(lut_{s})) AS INT)"
                for s in range(sim._PQ_M)
            )
            + ")"
        ),
    )
    ref_adc = F.element_at(F.col("lut_0"), F.col("codes").getItem(0))
    for s in range(1, sim._PQ_M):
        ref_adc = ref_adc + F.element_at(
            F.col(f"lut_{s}"), F.col("codes").getItem(s)
        )
    _assert_same(coded, ref_adc, sim._pq_adc_sum("codes"))


def test_lsh_bucket_sql_matches_lambda_loop(spark, sf_dir):
    e = _emb(spark, sf_dir)
    bucket = F.lit(0)
    for p, comp in enumerate(sim._hyperplanes()):
        w = F.array(*[F.lit(c) for c in comp])
        proj = F.aggregate(
            F.zip_with(F.col("emb"), w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    _assert_same(e, bucket, sim.lsh_bucket("emb"))


def test_recenter_transform_text_matches_lambda(spark, sf_dir):
    e = _emb(spark, sf_dir)
    comp = (
        e.select("vec_id", F.posexplode("emb").alias("i", "x"))
        .groupBy(F.col("vec_id").alias("g"), F.col("i"))
        .agg(F.avg("x").alias("m"))
    )
    ref = comp.groupBy("g").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("m")))),
            lambda st: st.getField("m"),
        ).alias("v")
    )
    new = comp.groupBy("g").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, m))), st -> st.m)"
        ).alias("v")
    )
    assert ref.schema == new.schema
    a = {r["g"]: repr(r["v"]) for r in ref.collect()}
    b = {r["g"]: repr(r["v"]) for r in new.collect()}
    assert a == b
