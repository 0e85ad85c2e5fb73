"""10x scale canary for the dedup/ANN families (r6 verdict #6).

The shipped testdata tops out at sf0.1 (5k docs / 2k vectors), so the
"these legs scale linearly" claims in SURVEY.md section 6 were design
arguments, not measurements.  This script synthesizes a ~10x corpus
and measures the claim: run B2/B3/B11/B43 at sf0.1 and at 10x, record
wall times, output rows, and the MinHash/LSH candidate-pair count, and
print one JSON line with the ratios.  Linear legs should show
pairs/rows ratios ~= 10 and time ratios <= ~10 (32 cores are not
saturated at sf0.1, so sublinear time is expected).

Synthesis keeps the duplicate-rate REALISTIC instead of quadratic:
replica r of a document suffixes every token with "_r", and replica r
of an embedding circularly shifts the vector by 7*r positions — so
replicas of the same row are NOT near-duplicates of each other, the
vocabulary grows 10x with an identical df shape, and every replica
family reproduces the original corpus's internal near-dup structure.
Appending 10 verbatim copies instead would manufacture 45 extra dup
pairs per doc and the canary would (wrongly) measure quadratic growth.

Usage: python scale_canary.py  [prints one JSON line; ~3 min]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_CANARY_X", "10"))


def synthesize(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    doc_off = 10 ** (len(str(docs.agg(F.max("doc_id")).first()[0])) + 1)
    vec_off = 10 ** (len(str(emb.agg(F.max("vec_id")).first()[0])) + 1)

    doc_parts = [docs]
    emb_parts = [emb]
    for r in range(1, REPLICAS):
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * doc_off)).alias("doc_id"),
                F.expr(
                    f"array_join(transform(split(text, '\\\\s+'),"
                    f" t -> concat(t, '_{r}')), ' ')"
                ).alias("text"),
                "lang",
                "source",
                F.col("n_chars").alias("n_chars"),
            )
        )
        shift = (7 * r) % 64
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * vec_off)).alias("vec_id"),
                F.expr(
                    # bracket indexing is 0-based (element_at is 1-based)
                    f"transform(sequence(0, 63),"
                    f" i -> embedding[(i + {shift}) % 64])"
                ).alias("embedding"),
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    e.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # r11 legs: events (per-user pair fan-out), orders+lineitem (the
    # orphan-redrive enrichment join).  Replicas live in DISJOINT id
    # spaces (users, orderkeys), so join/pair structure grows linearly
    # — the same no-manufactured-quadratics discipline as documents.
    from near_indexer_for_explorer_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    ev_off = 10 ** (len(str(ev.agg(F.max("event_id")).first()[0])) + 1)
    u_off = 10 ** (len(str(ev.agg(F.max("user_id")).first()[0])) + 1)
    ev_parts = [ev]
    for r in range(1, REPLICAS):
        ev_parts.append(
            ev.select(
                (F.col("event_id") + F.lit(r * ev_off)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(r * u_off)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    evd = ev_parts[0]
    for pdf in ev_parts[1:]:
        evd = evd.unionByName(pdf)
    evd.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    ok_off = 10 ** (len(str(orders.agg(F.max("o_orderkey")).first()[0])) + 1)
    o_parts, l_parts = [orders], [li]
    for r in range(1, REPLICAS):
        o_parts.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(r * ok_off)
            )
        )
        l_parts.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * ok_off)
            )
        )
    od = o_parts[0]
    for pdf in o_parts[1:]:
        od = od.unionByName(pdf)
    ld = l_parts[0]
    for pdf in l_parts[1:]:
        ld = ld.unionByName(pdf)
    od.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    ld.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))

    # r12: orders_basket_rules keeps l_partkey VERBATIM across replicas
    # (disjoint orderkeys -> per-order pairs grow linearly; the part
    # catalog is the fixed dimension), and reads the part footer for
    # its broadcast size gate — ship the dim unchanged.
    spark.read.parquet(os.path.join(SF_DIR, "part.parquet")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "part.parquet"))


def measure(spark, sf_dir: str) -> dict:
    from near_indexer_for_explorer_spark.operators.dedup import (
        _distinct_shingles,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from near_indexer_for_explorer_spark.operators.corpus import (
        skipgram_cooc_pmi,
    )
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_components,
        dedup_incremental_cohort,
        dedup_pair_features,
    )
    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_cosine_topk,
        embedding_dedup_cosine,
        ivfpq_ann_topk,
    )
    from near_indexer_for_explorer_spark.operators.similarity import (
        kmeans_elbow_curve as _elbow,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        pii_incidence_by_source as _pii,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        quality_filter_gopher as _gopher,
    )
    from near_indexer_for_explorer_spark.operators.corpus import (
        boilerplate_segments as _boiler,
    )
    from near_indexer_for_explorer_spark.operators import similarity as sim
    from near_indexer_for_explorer_spark.multimodal.decode import (
        multimodal_image_dhash_pairs as _img_pairs,
    )
    from near_indexer_for_explorer_spark.multimodal.decode import (
        multimodal_gif_roundtrip as _gif,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        doc_char_entropy as _chent,
    )
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_normalization_lift as _normlift,
    )
    from near_indexer_for_explorer_spark.plans.relational import (
        QUERIES as _REL_QUERIES,
    )
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_boundary_stitch as _stitch,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        access_keys_state as _ak_state,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        access_keys_with_genesis as _ak_genesis,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        account_balances_state as _bal_state,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        account_balances_with_genesis as _bal_genesis,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        account_changes_typed as _ch_typed,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        accounts_state as _acct_state,
    )
    from near_indexer_for_explorer_spark.operators.assets import (
        actions_typed_args as _actions_typed,
    )
    from near_indexer_for_explorer_spark.multimodal.decode import (
        multimodal_png_meta_scrub as _png_scrub,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        text_code_detect as _code_detect,
    )
    from pyspark.sql import functions as F

    _etuo = _REL_QUERIES["event_type_user_overlap"]

    out: dict = {}
    t0 = time.perf_counter()
    out["lsh_candidate_pairs"] = lsh_candidate_pairs(
        minhash_signatures(_distinct_shingles(spark, sf_dir))
    ).count()
    out["lsh_candidate_sec"] = round(time.perf_counter() - t0, 2)
    for name, fn in (
        ("dedup_ngram_jaccard", dedup_ngram_jaccard),
        ("dedup_minhash_lsh", dedup_minhash_lsh),
        ("embedding_dedup_cosine", embedding_dedup_cosine),
        ("ivfpq_ann_topk", ivfpq_ann_topk),
        # r8: the B5 exact baseline under the FIXED query set — result
        # rows must now grow ~1x (|Q| pinned), only scan cost grows
        ("ann_cosine_topk", ann_cosine_topk),
        # r7 session-4 additions: the map-side pair explode (linear in
        # tokens) and the candidate-bounded feature pass (first call
        # includes the frozen-leg build, i.e. the full B3 shape)
        ("skipgram_cooc_pmi", skipgram_cooc_pmi),
        ("dedup_pair_features", dedup_pair_features),
        # r7 session-5 addition: the production incremental-ingest
        # shape (base x incoming straddle over the frozen LSH leg +
        # candidate-bounded verify; output = whole incoming cohort)
        ("dedup_incremental_cohort", dedup_incremental_cohort),
        # r8 session-2 additions: map-only scans (rows grow with the
        # bounded source/lang grain ~1x, time ~linear in corpus) and
        # the sample-bounded elbow (result fixed at |Ks| rows; time
        # grows with the rowcount-capped train sample — r9)
        ("pii_incidence_by_source", _pii),
        ("quality_filter_gopher", _gopher),
        ("kmeans_elbow_curve", _elbow),
        # r9 additions (r8 verdict #8): the B20 fresh label-propagation
        # build (edge join + 4 bounded rounds, linear in pairs) and the
        # line-frequency boilerplate pass (two token-keyed aggregates,
        # linear in lines)
        ("dedup_components", dedup_components),
        ("boilerplate_segments", _boiler),
        # r9 late addition: perceptual image pairs — replica families
        # reproduce the originals' near-dup structure byte-wise, so
        # candidate pairs must land ~10x while the band join stays
        # bucket-local
        ("multimodal_image_dhash_pairs", _img_pairs),
        # r10 additions: the heaviest new legs — the per-char HOF
        # entropy scan (map-only, rows 10x, time ~linear in bytes),
        # the Python-LZW GIF roundtrip (map-only Arrow kernel, the
        # priciest per-byte codec), and the double-hash normalization
        # lift (two hash-keyed aggregates, source-grain output ~1x)
        ("doc_char_entropy", _chent),
        ("multimodal_gif_roundtrip", _gif),
        ("dedup_normalization_lift", _normlift),
        # r11 additions (r10 verdict #8): the newest join legs — the
        # per-user event-type pair fan-out (disjoint replica users ->
        # pairs grow ~10x linearly, never quadratically), the
        # df-capped boundary-stitch join (candidate-bounded), and the
        # orphan-redrive enrichment join below (the C44 retry join's
        # full-relation worst case)
        ("event_type_user_overlap", _etuo),
        ("dedup_boundary_stitch", _stitch),
        # r12 additions (r11 verdict #7): the statistical legs — the
        # per-order co-purchase pair join (disjoint replica orderkeys,
        # pairs ~10x, part-pair output grain grows with pair counts
        # crossing the min-support gate), the value-grain rank path
        # (one aggregate + one cumulative window per type; output =
        # type grain ~1x), and the 18-sum wide bootstrap aggregate
        # (output = type grain ~1x, time ~linear in the scan)
        ("orders_basket_rules", _REL_QUERIES["orders_basket_rules"]),
        ("events_mann_whitney", _REL_QUERIES["events_mann_whitney"]),
        ("events_bootstrap_ci", _REL_QUERIES["events_bootstrap_ci"]),
        # r13 additions (r12 verdict #6): the state folds.  Typed
        # projections are map-only (rows ~10x, time ~linear in scan);
        # access_keys/accounts fold to a FIXED synthetic key grain
        # (owner_<0..6> x PK_<0..499>) so rows land ~1x while the scan
        # grows; the balances fold is account-grain (disjoint replica
        # users -> rows ~10x); the genesis compositions add one
        # full-outer SMJ against a fixed dim (rows track their folds)
        ("actions_typed_args", _actions_typed),
        ("access_keys_state", _ak_state),
        ("accounts_state", _acct_state),
        ("access_keys_with_genesis", _ak_genesis),
        ("account_changes_typed", _ch_typed),
        ("account_balances_state", _bal_state),
        ("account_balances_with_genesis", _bal_genesis),
        # r13 wave 2: both map-only over documents (rows 10x, time
        # ~linear in bytes; B149 is the two-decode codec shape)
        ("text_code_detect", _code_detect),
        ("multimodal_png_meta_scrub", _png_scrub),
    ):
        t0 = time.perf_counter()
        out[f"{name}_rows"] = fn(spark, sf_dir).count()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 2)

    # r9 (r8 verdict #3): the k-means training sample is capped by the
    # rowcount-derived modulus.  Pin the cap LOW enough to bind at both
    # corpus sizes (the shipped 100k cap binds only past 500k vectors)
    # and measure the training-set size: the capped leg must land ~1x
    # at 10x corpus, while the uncapped floor (mod 5) grows 10x.
    e = sim._vectors(spark, sf_dir)
    out["ivf_train_rows_floor"] = e.where(
        F.col("vec_id") % sim._IVF_TRAIN_MOD_MIN == 0
    ).count()
    # r11: the C44 retry join kernel over the full relations (each
    # micro-batch joins parked+batch vs parents; this measures the
    # degenerate everything-parked bound)
    from near_indexer_for_explorer_spark.sources.tables import load_table as _lt
    from near_indexer_for_explorer_spark.streaming.pipelines import (
        orphan_enrich_join as _oej,
    )

    t0 = time.perf_counter()
    out["orphan_enrich_join_rows"] = _oej(
        _lt(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            F.col("l_partkey").cast("long").alias("l_partkey"),
            F.col("l_suppkey").cast("long").alias("l_suppkey"),
            "l_extendedprice",
        ),
        _lt(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        ),
    ).count()
    out["orphan_enrich_join_sec"] = round(time.perf_counter() - t0, 2)

    old_cap = sim._IVF_TRAIN_CAP
    sim._IVF_TRAIN_CAP = 400
    try:
        out["ivf_train_rows_capped"] = e.where(
            F.col("vec_id") % sim._train_mod(sf_dir) == 0
        ).count()
    finally:
        sim._IVF_TRAIN_CAP = old_cap
    return out


def main() -> None:
    from near_indexer_for_explorer_spark.session import get_spark

    spark = get_spark(app_name="nifes-scale-canary")
    # warm the JVM/codegen so the first measured row isn't startup cost
    from near_indexer_for_explorer_spark.operators.dedup import (
        _distinct_shingles,
    )

    _distinct_shingles(spark, SF_DIR).count()
    base = measure(spark, SF_DIR)
    tmp = tempfile.mkdtemp(prefix="nifes_canary_")
    try:
        synthesize(spark, tmp)
        big = measure(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ratios = {
        k: (round(big[k] / base[k], 2) if base[k] else None)
        for k in base
    }
    print(
        json.dumps(
            {
                "metric": "scale_canary",
                "replicas": REPLICAS,
                "sf01": base,
                "x10": big,
                "ratio": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
