"""Unit semantics for operators whose driver check is rows-only
(approximate / non-SQL-expressible): they must agree with their exact
baselines on the planted test data."""

from __future__ import annotations


def _pairs(df, c1, c2):
    return {(r[c1], r[c2]) for r in df.collect()}


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """Planted near-dups sit at jaccard >= 0.8 where LSH(16x4) recall is
    ~0.9998, and candidates are verified exactly — so LSH output must
    equal the exact-join output on this data."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard_unpruned,
    )

    exact = _pairs(
        dedup_ngram_jaccard_unpruned(spark, sf_dir), "doc_id_1", "doc_id_2"
    )
    lsh = _pairs(dedup_minhash_lsh(spark, sf_dir), "doc_id_1", "doc_id_2")
    assert exact, "test data should contain planted near-dup pairs"
    assert lsh == exact


def test_simhash_finds_near_dups(spark, sf_dir):
    """SimHash (token-level) must recover the planted near-dup pairs;
    allow extra (lower-precision) pairs but no missed ones."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_ngram_jaccard_unpruned,
        dedup_simhash,
    )

    exact = _pairs(
        dedup_ngram_jaccard_unpruned(spark, sf_dir), "doc_id_1", "doc_id_2"
    )
    sim = _pairs(dedup_simhash(spark, sf_dir), "doc_id_1", "doc_id_2")
    missed = exact - sim
    assert not missed, f"simhash missed planted near-dups: {sorted(missed)[:5]}"


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    """Bucketed ANN trades recall for a 2^planes candidate reduction;
    on random embeddings it must still find a reasonable fraction of the
    true top-k and only ever return true vectors with correct sims."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_cosine_topk,
        ann_lsh_topk,
    )

    exact = _pairs(ann_cosine_topk(spark, sf_dir), "q_id", "neighbor_id")
    approx_rows = ann_lsh_topk(spark, sf_dir).collect()
    approx = {(r["q_id"], r["neighbor_id"]) for r in approx_rows}
    assert approx, "lsh ann returned nothing"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2, f"lsh ann recall {recall:.2f} below floor"
    # sims of returned pairs must match the brute-force values
    exact_sims = {
        (r["q_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    for r in approx_rows:
        key = (r["q_id"], r["neighbor_id"])
        if key in exact_sims:
            assert r["cos_sim"] == exact_sims[key]


def test_multimodal_decode_deterministic(spark, sf_dir):
    """The stubbed decode must be bit-stable across runs (the driver's
    rows-only check depends on it) and byte_len must equal the real
    utf-8 payload length."""
    from near_indexer_for_explorer_spark.multimodal.decode import multimodal_decode

    r1 = sorted([tuple(r) for r in multimodal_decode(spark, sf_dir).collect()])
    r2 = sorted([tuple(r) for r in multimodal_decode(spark, sf_dir).collect()])
    assert r1 == r2
    assert all(row[4] == "stub" for row in r1)
    from near_indexer_for_explorer_spark.sources.tables import load_table

    texts = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    for doc_id, byte_len, _hdr, _mean, _backend in r1[:20]:
        assert byte_len == len(texts[doc_id].encode("utf-8"))


def test_exact_dedup_keeps_min_id(spark, sf_dir):
    from near_indexer_for_explorer_spark.operators.dedup import dedup_exact_docs

    rows = dedup_exact_docs(spark, sf_dir).collect()
    assert rows
    # no exact dups planted in documents: every group is a singleton
    assert all(r["n_copies"] >= 1 for r in rows)
    assert len({r["text_hash"] for r in rows}) == len(rows)


def test_typed_event_extraction_policies(spark, sf_dir):
    """The EVENT_JSON parser must drop non-event log lines, capture
    malformed JSON via the corrupt-record column (not crash), drop
    unknown standards, and keep every valid kind."""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.operators.assets import (
        EVENT_SCHEMA,
        events_typed_extract,
        synthesize_event_logs,
    )

    logs = synthesize_event_logs(spark, sf_dir)
    typed = events_typed_extract(spark, sf_dir)
    # buckets 7 (no prefix), 8 (malformed), 9 (unknown standard) must
    # never reach the typed output
    bad = typed.where(F.col("emitted_by_event_id") % 10 >= 7).count()
    assert bad == 0
    kinds = {r["event_kind"] for r in typed.select("event_kind").distinct().collect()}
    assert kinds == {
        "ft_mint", "ft_transfer", "ft_burn",
        "nft_mint", "nft_transfer", "nft_burn",
    }
    # malformed lines surface in _corrupt instead of killing the parse
    corrupt = (
        logs.where(F.trim("log_line").startswith("EVENT_JSON:"))
        .select(
            F.from_json(
                F.expr("trim(substring(trim(log_line), 12))"),
                EVENT_SCHEMA,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
            ).alias("ev")
        )
        .where(F.col("ev._corrupt").isNotNull())
        .count()
    )
    n_malformed = logs.where(F.col("event_id") % 10 == 8).count()
    assert corrupt == n_malformed > 0
    # second data entries exploded: event_id % 3 == 0 rows have 2 entries
    two = typed.where(F.col("entry_index") == 1)
    assert two.count() > 0
    assert two.where(F.col("emitted_by_event_id") % 3 != 0).count() == 0


def test_jaccard_df_prune_bounds_posting_lists(spark, sf_dir):
    """The df-cap must actually bound every posting list (the 100 TB
    guarantee: no shingle's candidate contribution exceeds cap^2), and
    the pruned operator must still recover the planted near-dup pairs."""
    import math

    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.operators.dedup import (
        _MAX_DF_FRAC,
        _MIN_DF_CAP,
        _df_pruned_shingles,
        dedup_ngram_jaccard,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    cap = max(_MIN_DF_CAP, math.ceil(_MAX_DF_FRAC * n_docs))
    max_df = (
        _df_pruned_shingles(spark, sf_dir)
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("m"))
        .collect()[0]["m"]
    )
    assert max_df <= cap, f"posting list df {max_df} exceeds cap {cap}"
    assert dedup_ngram_jaccard(spark, sf_dir).count() > 0


def _planted_neardup_dir(tmp_path) -> str:
    """Write an embeddings.parquet with PLANTED near-dup pairs.

    The driver's synthetic embeddings are quasi-random (no pair above
    cos ~0.51 at test SFs), so the >=0.85 near-dup regime the blocking
    targets is unexercisable on them; this corpus plants 60 partner
    vectors at controlled cosines spread over [0.86, 0.99] among 400
    random base vectors.  Deterministic (fixed seed), float32 to match
    the real table's FLOAT[] column."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260813)
    dim, n_base, n_planted = 64, 400, 60
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i]) for i in range(n_base)]
    for j in range(n_planted):
        v = base[j]
        c = 0.86 + 0.13 * (j / max(n_planted - 1, 1))
        u = rng.standard_normal(dim)
        u -= (u @ v) * v
        u /= np.linalg.norm(u)
        rows.append((n_base + j, c * v + np.sqrt(1.0 - c * c) * u))
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1].astype("float32") for r in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_embedding_dedup_blocked_subset_and_recall(spark, tmp_path):
    """LSH-blocked near-dup pairs must be a subset of the all-pairs
    baseline with identical cosines (exact verification) and recall
    >=0.9 on a planted corpus in the >=0.85 regime the 16-plane/
    radius-2 blocking targets (theoretical recall ~0.99 at cos=0.85,
    ~1.0 at cos>=0.9)."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_dedup_cosine,
        embedding_dedup_cosine_allpairs,
    )

    planted_dir = _planted_neardup_dir(tmp_path)
    blocked = {
        (r["vec_id_1"], r["vec_id_2"]): r["cos_sim"]
        for r in embedding_dedup_cosine(spark, planted_dir).collect()
    }
    exact = {
        (r["vec_id_1"], r["vec_id_2"]): r["cos_sim"]
        for r in embedding_dedup_cosine_allpairs(spark, planted_dir).collect()
    }
    assert len(exact) >= 50, "planted corpus must yield >=0.85 pairs"
    assert set(blocked) <= set(exact)
    for key, sim in blocked.items():
        assert sim == exact[key]
    recall = len(blocked) / len(exact)
    assert recall >= 0.9, f"blocked recall {recall:.2f} below floor"


def test_dup_band_rows_arrow_matches_fold(spark, sf_dir, tmp_path):
    """The r15 vectorized Arrow bucketing must be BIT-IDENTICAL to the
    declared fold expression (the oracle's form) on real data — both on
    the driver corpus and on the planted near-dup corpus, whose
    correlated vectors exercise small-magnitude projections where a
    different IEEE addition order would first show."""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.operators.similarity import (
        _dup_band_rows_arrow,
        _vectors,
        dup_band_buckets,
    )

    for data_dir in (sf_dir, _planted_neardup_dir(tmp_path)):
        e = _vectors(spark, data_dir)
        fold = (
            e.select("vec_id", F.explode(dup_band_buckets("emb")).alias("b"))
            .select(
                "vec_id",
                F.col("b.band_id").alias("band_id"),
                F.col("b.bucket").alias("bucket"),
            )
        )
        arrow = _dup_band_rows_arrow(e)
        # names and types must match exactly; nullability may differ
        # (mapInArrow output is declared nullable, literals are not)
        assert [(f.name, f.dataType) for f in arrow.schema] == [
            (f.name, f.dataType) for f in fold.schema
        ]
        a = sorted(tuple(r) for r in arrow.collect())
        f = sorted(tuple(r) for r in fold.collect())
        assert a == f


def test_embedding_dedup_empty_on_quasirandom(spark, sf_dir):
    """On the driver's quasi-random corpus there are no pairs at the
    near-dup threshold — the operator (and its oracle) must return
    zero rows, proving no false positives."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_dedup_cosine,
    )

    assert embedding_dedup_cosine(spark, sf_dir).count() == 0


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=4 of 16 lists must beat a recall floor and only
    report true cosine values."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_cosine_topk,
        ann_ivf_topk,
    )

    exact_rows = ann_cosine_topk(spark, sf_dir).collect()
    exact = {(r["q_id"], r["neighbor_id"]): r["cos_sim"] for r in exact_rows}
    ivf_rows = ann_ivf_topk(spark, sf_dir).collect()
    assert ivf_rows
    hits = [r for r in ivf_rows if (r["q_id"], r["neighbor_id"]) in exact]
    recall = len(hits) / len(exact)
    assert recall >= 0.2, f"ivf recall {recall:.2f} below floor"
    for r in hits:
        assert r["cos_sim"] == exact[(r["q_id"], r["neighbor_id"])]

    # determinism: a second run returns the identical result
    again = sorted(tuple(r) for r in ann_ivf_topk(spark, sf_dir).collect())
    assert again == sorted(tuple(r) for r in ivf_rows)


def test_multimodal_frame_sample_fanout_and_determinism(spark, sf_dir):
    """Frame sampling must fan out to <= N_FRAMES rows per doc with
    consistent offsets/lengths, deterministically."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _N_FRAMES,
        multimodal_frame_sample,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    rows = multimodal_frame_sample(spark, sf_dir).collect()
    again = multimodal_frame_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    n_docs = load_table(spark, sf_dir, "documents").count()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == n_docs  # every (non-empty) doc produced frames
    for frames in by_doc.values():
        assert 1 <= len(frames) <= _N_FRAMES
        idx = sorted(f["frame_index"] for f in frames)
        assert idx == list(range(len(frames)))
        for f in frames:
            assert f["frame_len"] > 0
            assert abs(f["frame_byte_sum"] - f["frame_mean"] * f["frame_len"]) < 1e-6
            assert 0.0 <= f["frame_mean"] <= 255.0


def test_multimodal_resize_grid_invariants(spark, sf_dir):
    """Every doc maps to exactly one fixed-size [0,1] pixel grid."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _RESIZE_H,
        _RESIZE_W,
        multimodal_resize,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    df = multimodal_resize(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert len(r["pixels"]) == _RESIZE_W * _RESIZE_H
        assert all(0.0 <= p <= 1.0 for p in r["pixels"])


def test_multimodal_resize_cells_match_array(spark, sf_dir):
    """The hash-proof exploded-cells companion (B36) must agree with
    B23's array output value-for-value: px_frac[i] == pixels[i]."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _RESIZE_H,
        _RESIZE_W,
        multimodal_resize,
        multimodal_resize_cells,
    )

    grids = {
        r["doc_id"]: r["pixels"] for r in multimodal_resize(spark, sf_dir).collect()
    }
    cells = multimodal_resize_cells(spark, sf_dir).collect()
    assert len(cells) == len(grids) * _RESIZE_W * _RESIZE_H
    for c in cells:
        assert c["px_frac"] == grids[c["doc_id"]][c["px_index"]]
        assert c["px_u8"] == round(c["px_frac"] * 255.0)


def test_approx_distinct_accuracy(spark, sf_dir):
    """The sketch's accuracy contract: every day's HLL++ estimate is
    within 3x the configured rsd of the exact distinct count (no
    oracle possible — DuckDB's sketch is a different algorithm)."""
    from near_indexer_for_explorer_spark.plans.relational import (
        _HLL_RSD,
        events_daily_approx_distinct,
    )

    rows = events_daily_approx_distinct(spark, sf_dir).collect()
    assert len(rows) >= 28  # a month of days
    for r in rows:
        assert r["rel_err"] <= 3 * _HLL_RSD, (r["event_date"], r["rel_err"])


def test_span_runs_planted_duplicate_paragraph(spark, tmp_path):
    """A paragraph planted verbatim in two documents must surface as
    ONE maximal run whose token length equals the paragraph's, and the
    interval-union coverage must not double-count overlapping windows
    (two shared regions separated by < 8 unique tokens merge in token
    space but stay distinct runs)."""
    from near_indexer_for_explorer_spark.operators.corpus import dedup_span_runs

    para = " ".join(f"p{i}" for i in range(20))  # 20-token shared paragraph
    docs = [
        (0, f"alpha beta gamma {para} delta epsilon zeta", "en", "s", 0),
        (1, f"one two three four five six seven {para} eight", "en", "s", 0),
        # unique doc: no shared grams at all
        (2, " ".join(f"u{i}" for i in range(30)), "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r for r in dedup_span_runs(spark, str(tmp_path)).collect()
    }
    # 20-token paragraph -> 13 consecutive shared 8-gram positions ->
    # one run of 13 + 7 = 20 tokens, covering exactly 20 tokens.
    for d in (0, 1):
        assert rows[d]["n_runs"] == 1
        assert rows[d]["max_run_tokens"] == 20
        assert rows[d]["covered_tokens"] == 20
    assert rows[2]["n_runs"] == 0
    assert rows[2]["max_run_tokens"] == 0
    assert rows[2]["covered_tokens"] == 0
    assert rows[2]["dup_token_frac"] == 0.0


def test_edit_verify_order_sensitivity(spark, tmp_path):
    """The edit-similarity verify leg must (a) confirm a one-word-edit
    near-copy and (b) REJECT a block-rotated document that bag-of-
    shingles Jaccard (B3's verify) would accept — rotation keeps nearly
    all word 3-grams (certain LSH candidate) but costs ~half the text
    in edits."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_edit_verify,
        dedup_minhash_lsh,
    )

    import hashlib

    # mutually dissimilar tokens (md5-derived) so cross-token character
    # overlap doesn't mask the rotation's edit cost
    words = [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in range(40)]
    base = " ".join(words)
    near = " ".join(["CHANGED" if i == 7 else words[i] for i in range(40)])
    rotated = " ".join(words[20:] + words[:20])
    unrelated = " ".join(f"zzz{i}" for i in range(40))
    docs = [
        (0, base, "en", "s", 0),
        (1, near, "en", "s", 0),
        (2, rotated, "en", "s", 0),
        (3, unrelated, "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = {
        (r["doc_id_1"], r["doc_id_2"]): r
        for r in dedup_edit_verify(spark, str(tmp_path)).collect()
    }
    assert rows[(0, 1)]["is_dup"], "one-word edit must verify as dup"
    assert rows[(0, 1)]["edit_sim"] > 0.9
    assert (0, 2) in rows, "rotation shares ~all shingles -> LSH candidate"
    assert not rows[(0, 2)]["is_dup"], "rotation must fail the edit verify"
    assert rows[(0, 2)]["edit_sim"] < 0.8
    assert not any(3 in k for k in rows), "unrelated doc must not pair"

    # contrast with B3: the Jaccard leg ACCEPTS the rotated pair
    jac = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, str(tmp_path)).collect()
    }
    assert jac[(0, 2)] >= 0.5, "shingle Jaccard is blind to the rotation"


def test_interval_join_binned_equals_naive(spark, tmp_path):
    """The binned interval join must equal a naive all-pairs range join
    on a corpus crafted to hit the edges: windows straddling a bin
    boundary, events exactly at start (inclusive) and end (exclusive),
    and an empty window."""
    import datetime as dt

    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.plans.relational import (
        _IVL_SPAN_US,
        events_interval_join,
    )

    base = dt.datetime(2024, 3, 1, 1, 0, 0)  # NOT bin-aligned (2h bins)
    span = dt.timedelta(microseconds=_IVL_SPAN_US)
    rows = [
        # anchor window straddles the 02:00 bin edge
        (1, base, 7, "error", 200.0, "{}"),
        (2, base, 8, "view", 1.0, "{}"),  # == start: INcluded
        (3, base + span, 9, "view", 2.0, "{}"),  # == end: EXcluded
        (4, base + span - dt.timedelta(seconds=1), 10, "click", 4.0, "{}"),
        (5, base - dt.timedelta(seconds=1), 11, "view", 8.0, "{}"),  # before
        # empty window: anchor in a quiet region
        (6, dt.datetime(2024, 3, 10), 12, "error", 300.0, "{}"),
        # low-value error: NOT an anchor
        (7, base + dt.timedelta(minutes=5), 13, "error", 10.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["window_id"]: (r["n_events"], r["total_value"])
        for r in events_interval_join(spark, str(tmp_path)).collect()
    }
    # window 1 covers events 2 (==start), 4, 7 (other error, low value);
    # excludes 3 (==end), 5 (before), itself
    assert got[1] == (3, 1.0 + 4.0 + 10.0)
    assert got[6] == (0, 0.0)
    assert set(got) == {1, 6}


def test_rp_projection_preserves_norms(spark, sf_dir):
    """JL contract: the 16-dim +-1/sqrt(16) projection preserves norms
    in expectation (E[ratio^2] = 1) — corpus mean of norm_ratio near 1
    and no catastrophic collapse on any vector."""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.operators.similarity import (
        rp_project_embeddings,
    )

    stats = (
        rp_project_embeddings(spark, sf_dir)
        .agg(
            F.avg("norm_ratio").alias("mean"),
            F.min("norm_ratio").alias("lo"),
            F.max("norm_ratio").alias("hi"),
        )
        .collect()[0]
    )
    assert 0.85 <= stats["mean"] <= 1.15, stats
    assert stats["lo"] > 0.3 and stats["hi"] < 2.0, stats


def test_bpe_greedy_merge_and_decode(spark, tmp_path):
    """BPE on a crafted corpus: round 1 must merge the most frequent
    pair; round 2's candidates must be expressed over the MERGED
    symbol (greedy left-to-right re-segmentation, like replace()), and
    sentinel symbols must decode back to real strings."""
    from near_indexer_for_explorer_spark.operators.bpe import bpe_train_merges

    docs = [
        (0, "aaab aaab ccc", "en", "s", 0),
        (1, "aaab ccc", "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        (r["round"], r["rank"]): r
        for r in bpe_train_merges(spark, str(tmp_path)).collect()
    }
    # word freqs: aaab x3, ccc x2 -> pairs: aa=6, ab=3, cc=4
    r1 = rows[(1, 1)]
    assert (r1["left_sym"], r1["right_sym"], r1["merged"], r1["weight"]) == (
        "a", "a", "aa", 6
    )
    assert rows[(1, 2)]["merged"] == "cc" and rows[(1, 2)]["weight"] == 4
    # re-encode: aaab -> [aa]ab (greedy: no second 'aa' left), so round
    # 2 sees (aa,a)=3, (a,b)=3, (c,c)=4 -> cc wins, then the sentinel
    # pairs — decoded to real strings
    r2 = rows[(2, 1)]
    assert (r2["left_sym"], r2["right_sym"], r2["merged"], r2["weight"]) == (
        "c", "c", "cc", 4
    )
    merged2 = {rows[(2, i)]["merged"] for i in (2, 3)}
    assert merged2 == {"aaa", "ab"}
    assert rows[(2, 2)]["weight"] == 3 and rows[(2, 3)]["weight"] == 3


def test_ivfpq_recall_beats_direct_pq(spark):
    """Residual quantization is the point of IVF+PQ (Jegou 2011 §V):
    with the same 8-nibble code budget it recovers MORE of the exact
    top-k than direct PQ.  Pinned at sf0.01 (measured 0.38 vs 0.28):
    at sf0.001 the 500-vector corpus gives each of the 16 lists ~31
    members and nprobe-4 probing loses more candidates than residual
    precision wins back, so the ordering only emerges at realistic
    list occupancy — which is itself the textbook IVF tradeoff."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_cosine_topk,
        ivfpq_ann_topk,
        pq_ann_topk,
    )

    sf_dir = "/root/testdata/sf0.01"
    exact = _pairs(ann_cosine_topk(spark, sf_dir), "q_id", "neighbor_id")
    ivfpq = _pairs(ivfpq_ann_topk(spark, sf_dir), "q_id", "neighbor_id")
    pq = _pairs(pq_ann_topk(spark, sf_dir), "q_id", "neighbor_id")
    r_ivfpq = len(ivfpq & exact) / len(exact)
    r_pq = len(pq & exact) / len(exact)
    assert r_ivfpq >= r_pq, (r_ivfpq, r_pq)
    assert r_ivfpq >= 0.2, r_ivfpq


def test_approx_percentiles_rank_error_contract(spark, sf_dir):
    """A61: the sketch percentile's RANK error must respect the
    configured accuracy — for each (type, p), the approx value's true
    rank within the group sits within max(1, n/accuracy) positions of
    p*n.  (Value-space error is unbounded on skewed data; rank error
    is the contract percentile_approx actually makes.)"""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.plans.relational import (
        _APPROX_PCT_ACC,
        events_value_approx_percentiles,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = events_value_approx_percentiles(spark, sf_dir).collect()
    for r in rows:
        et = r["event_type"]
        grp = ev.where(F.col("event_type") == et)
        n = grp.count()
        tol = max(1.0, n / _APPROX_PCT_ACC) + 1  # +1 for interpolation
        for p, col in ((0.5, "p5_approx"), (0.9, "p9_approx"), (0.99, "p99_approx")):
            approx = r[col]
            rank = grp.where(F.col("value") <= approx).count()
            assert abs(rank - p * n) <= tol, (et, p, rank, p * n, tol)


def test_opq_rotation_is_isometric_and_error_neutral(spark, sf_dir):
    """The Householder rotation must preserve norms exactly (up to
    float rounding), and on the isotropic synthetic embeddings the
    rotated-space PQ error must track the original-space error in
    aggregate (OPQ's error DROP only appears on correlated data; a
    blow-up here would mean the rotation is wrong)."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        opq_rotate_quantize,
    )

    rows = opq_rotate_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.norm_ratio - 1.0) < 1e-9, r
    tot_o = sum(r.err_orig for r in rows)
    tot_r = sum(r.err_rot for r in rows)
    assert 0.8 < tot_r / tot_o < 1.25, (tot_o, tot_r)


def test_heavy_hitters_sketch_contract(spark, sf_dir):
    """freqItems' guarantee: NO false negatives — every event_type
    whose exact share exceeds the support threshold must appear in the
    surfaced candidate set, and surfaced rows carry exact counts."""
    from near_indexer_for_explorer_spark.plans.relational import (
        _HH_SUPPORT,
        events_heavy_hitters,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    got = {r.event_type: (r.exact_count, r.share) for r in
           events_heavy_hitters(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    exact = {
        r["event_type"]: r["c"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for et, c in exact.items():
        if c / n > _HH_SUPPORT:
            assert et in got, f"{et} ({c}/{n}) missing from sketch output"
    for et, (c, share) in got.items():
        assert c == exact[et]
        assert abs(share - c / n) < 1e-12


def test_pair_alignment_finds_planted_block(spark, tmp_path):
    """Two near-identical docs differing in ONE word: the alignment
    must report exactly the prefix block (8-gram positions 0..7 -> a
    15-token block), the suffix block, and the exact interval-union
    coverage, all on diagonal 0."""
    words = [f"w{i}" for i in range(30)]
    t1 = " ".join(words)
    t2 = " ".join(w if i != 15 else "zzz" for i, w in enumerate(words))
    rows = [
        (1, t1, "en", "srcA", len(t1)),
        (2, t2, "en", "srcA", len(t2)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    from near_indexer_for_explorer_spark.operators.corpus import (
        dedup_pair_alignment,
    )

    out = dedup_pair_alignment(spark, str(tmp_path)).collect()
    assert len(out) == 1, out  # the pair must surface as an LSH candidate
    r = out[0]
    assert (r.doc_id_1, r.doc_id_2) == (1, 2)
    # shared 8-gram positions: p <= 7 (before the edit) and p in 16..22
    assert r.n_matches == 15
    assert r.longest_align_tokens == 15  # run p=0..7 -> 8+7 tokens
    assert r.cov1_tokens == 29 and r.cov2_tokens == 29  # union of both blocks


def test_banded_edit_distance_matches_full_within_band(spark):
    """B53 contract: the O(len*K) banded fold equals full Levenshtein
    whenever the true distance <= K (the optimal path never leaves the
    |i-j| <= K strip), and reports the K+1 cap whenever it exceeds K —
    including the trivial |len diff| > K reject and empty strings.
    Long inputs (3000+ chars, beyond B37's quadratic comfort zone) are
    exercised with small and large edit loads."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        _BAND_K,
        _banded_dist_spark,
    )

    base = "the quick brown fox jumps over the lazy dog " * 70  # ~3000 chars
    k = _BAND_K
    cases = [
        ("kitten", "sitting"),                      # 3
        ("abc", "abc"),                             # 0
        ("", ""),                                   # 0
        ("", "x" * k),                              # == K exactly
        ("", "x" * (k + 1)),                        # len-diff reject
        ("a" * 40, "a" * 40 + "b" * (k + 5)),       # len-diff reject
        (base, base),                               # 0 on long text
        (base, base.replace("quick", "quack", 3)),  # small edits, long text
        (base[:-5], "xy" + base[: -7]),             # shifted long text
        (base, base[: len(base) // 2] + "z" * (len(base) // 2)),  # huge dist
        ("abcdefgh" * 4, "badcfehg" * 4),           # mid-range swaps
    ]
    df = spark.createDataFrame(cases, ["a", "b"])
    rows = df.selectExpr(
        "a",
        "b",
        f"{_banded_dist_spark('a', 'b')} AS banded",
        "CAST(levenshtein(a, b) AS BIGINT) AS full",
    ).collect()
    checked_le, checked_gt = 0, 0
    for r in rows:
        if r["full"] <= k:
            assert r["banded"] == r["full"], (r["a"][:40], r["b"][:40], r)
            checked_le += 1
        else:
            assert r["banded"] == k + 1, (r["a"][:40], r["b"][:40], r)
            checked_gt += 1
    # both sides of the contract must actually have been exercised
    assert checked_le >= 5 and checked_gt >= 3


def test_banded_edit_query_agrees_everywhere(spark, sf_dir):
    """The registered query's `agrees` column (band contract vs the full
    kernel) must hold on every real LSH candidate pair."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_edit_banded,
    )

    out = dedup_edit_banded(spark, sf_dir)
    rows = out.collect()
    assert rows, "LSH candidates expected in test data"
    assert all(r["agrees"] for r in rows)


def test_longest_substring_exact_vs_python(spark, sf_dir):
    """B54: the 11-round binary search over md5-hashed substring sets
    must return the EXACT longest-common-substring length for every LSH
    candidate pair (checked against an O(m*n) python DP on the same
    normalized capped text), with a verified witness of that length."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        _EDIT_MAX_CHARS,
        dedup_longest_substring,
    )

    def py_lcs(a: str, b: str) -> int:
        best, prev = 0, [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    out = dedup_longest_substring(spark, sf_dir).collect()
    assert out, "LSH candidates expected in test data"
    docs = {
        r["doc_id"]: r["txt"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr(
            "doc_id",
            f"substring(lower(trim(text)), 1, {_EDIT_MAX_CHARS}) AS txt",
        )
        .collect()
    }
    nonzero = 0
    for r in out:
        expect = py_lcs(docs[r["doc_id_1"]], docs[r["doc_id_2"]])
        assert r["match_len"] == expect, (r["doc_id_1"], r["doc_id_2"], r)
        if expect:
            nonzero += 1
            assert r["verified"] and len(r["match_sub"]) == expect
            assert r["match_sub"] in docs[r["doc_id_1"]]
            assert r["match_sub"] in docs[r["doc_id_2"]]
    assert nonzero, "near-dup candidates should share substrings"


def test_opq_learned_rotation_beats_identity_on_correlated_data(spark):
    """OPQ-NP alternating optimization (Ge 2013): on data whose
    variance is concentrated inside ONE PQ subspace (the case plain PQ
    handles worst and a balanced rotation fixes), the learned rotation
    must (a) stay orthonormal, (b) never increase the reconstruction
    error across iterations, and (c) clearly beat the identity-rotation
    baseline.  Closes the r5 verdict's "learned-rotation OPQ" question:
    the Procrustes correlation matrix is computed distributed, only the
    64x64 SVD runs driver-side."""
    import random

    from near_indexer_for_explorer_spark.operators.similarity import (
        _DIM,
        opq_learn_rotation,
    )

    rng = random.Random(42)
    rows = []
    for v in range(200):
        big = [rng.gauss(0.0, 1.0) for _ in range(8)]
        noise = [rng.gauss(0.0, 0.02) for _ in range(56)]
        rows.append((v, big + noise))
    e = spark.createDataFrame(rows, "vec_id long, emb array<double>")

    R, errors = opq_learn_rotation(e, iters=3)
    # (a) orthonormal: R R^T == I
    dev = max(
        abs(sum(R[i][k] * R[j][k] for k in range(_DIM)) - (1.0 if i == j else 0.0))
        for i in range(_DIM)
        for j in range(_DIM)
    )
    assert dev < 1e-9, dev
    # (b) alternation is monotone non-increasing
    for a, b in zip(errors, errors[1:]):
        assert b <= a + 1e-9, errors
    # (c) the learned rotation beats plain PQ by a clear margin
    assert errors[-1] < 0.9 * errors[0], errors


def test_containment_catches_planted_excerpt(spark, tmp_path):
    """B56: a short document embedded verbatim in a much longer one has
    Jaccard far below the B2 threshold (symmetric dedup misses it) but
    containment ~1 — the operator must surface it flagged is_excerpt,
    and must NOT pair unrelated documents."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_containment,
    )

    small = " ".join(f"w{i}" for i in range(12))  # 12 tokens -> 10 shingles
    filler = " ".join(f"f{i}" for i in range(120))
    docs = [
        (0, small, "en", "s", 0),
        (1, f"{filler} {small}", "en", "s", 0),  # excerpt host
        (2, " ".join(f"u{i}" for i in range(40)), "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {(r["doc_id_1"], r["doc_id_2"]): r
            for r in dedup_containment(spark, str(tmp_path)).collect()}
    assert set(rows) == {(0, 1)}
    r = rows[(0, 1)]
    assert r["c_1_in_2"] == 1.0          # every shingle of the excerpt is shared
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.5            # symmetric dedup would have missed it
    assert r["is_excerpt"]


def test_chunk_windows_overlap_and_ragged_tail(spark, tmp_path):
    """B57 window math: a 100-token doc at window 64 / stride 48 cuts
    into exactly 1 + ceil((100-64)/48) = 2 chunks — starts 0 and 48,
    lengths 64 and a ragged 52, overlapping by 16 tokens — and a doc
    shorter than one window yields exactly one ragged chunk.  Chunk
    hashes are pinned against python md5 of the same token slices."""
    import hashlib

    from near_indexer_for_explorer_spark.operators.corpus import (
        _CHUNK_N,
        _CHUNK_STRIDE,
        corpus_chunk_windows,
    )

    toks_a = [f"t{i}" for i in range(100)]
    toks_b = [f"s{i}" for i in range(10)]
    docs = [
        (0, " ".join(toks_a), "en", "s", 0),
        (1, " ".join(toks_b), "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tokens"], r["chunk_hash"])
        for r in corpus_chunk_windows(spark, str(tmp_path)).collect()
    )

    def h(toks):
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    assert rows == [
        (0, 0, 0, 64, h(toks_a[0:64])),
        (0, 1, 48, 52, h(toks_a[48:100])),
        (1, 0, 0, 10, h(toks_b)),
    ]


def test_weighted_sample_is_deterministic_and_size_biased(spark, tmp_path):
    """B58 A-ES contract: (a) the sample is a pure function of doc_id
    (re-running and growing the corpus never changes an existing doc's
    key), (b) no replacement (distinct docs), and (c) heavy documents
    are overrepresented relative to their count share."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        _SAMPLE_K,
        corpus_weighted_sample,
    )

    # 300 light docs (w=10) + 100 heavy docs (w=1000): heavy count
    # share is 25%, heavy WEIGHT share is ~97%
    docs = [(i, "x", "en", "s", 10) for i in range(300)]
    docs += [(300 + i, "x", "en", "s", 1000) for i in range(100)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    s1 = corpus_weighted_sample(spark, str(tmp_path)).collect()
    s2 = corpus_weighted_sample(spark, str(tmp_path)).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # deterministic
    ids = [r["doc_id"] for r in s1]
    assert len(ids) == len(set(ids)) == _SAMPLE_K  # without replacement
    heavy = sum(1 for r in s1 if r["n_chars"] == 1000)
    assert heavy / _SAMPLE_K > 0.5  # count share would be 0.25

    # growth stability: same docs + 200 more -> existing keys unchanged
    grown = docs + [(1000 + i, "x", "en", "s", 500) for i in range(200)]
    spark.createDataFrame(grown, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    s3 = corpus_weighted_sample(spark, str(tmp_path)).collect()
    keys1 = {r["doc_id"]: r["skey"] for r in s1}
    keys3 = {r["doc_id"]: r["skey"] for r in s3}
    for d in set(keys1) & set(keys3):
        assert keys1[d] == keys3[d]


def test_bigram_backoff_orders_fluent_above_garbled(spark, tmp_path):
    """B59 semantics: under the train-split Stupid-Backoff LM, a test
    document repeating a train phrase verbatim scores bigram hits on
    every interior token and lower cross-entropy than the SAME WORDS
    garbled into unseen bigrams (a unigram LM cannot separate the two
    — that's the point of the bigram upgrade)."""
    import hashlib

    from near_indexer_for_explorer_spark.operators.corpus import (
        _SPLIT_MOD,
        bigram_backoff_xent,
    )

    def bucket(doc_id):
        h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % _SPLIT_MOD

    train_ids = [i for i in range(200) if bucket(i) < 32][:3]
    test_ids = [i for i in range(200) if bucket(i) >= 36][:2]
    phrase = "the quick brown fox jumps over the lazy dog"
    garbled = "dog the fox lazy quick jumps brown over the"  # same words
    docs = [(i, phrase, "en", "s", 0) for i in train_ids]
    docs += [(test_ids[0], phrase, "en", "s", 0)]
    docs += [(test_ids[1], garbled, "en", "s", 0)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in bigram_backoff_xent(spark, str(tmp_path)).collect()}
    fluent, bad = rows[test_ids[0]], rows[test_ids[1]]
    assert fluent["split"] == "test" and bad["split"] == "test"
    assert fluent["n_bigram_hits"] == fluent["n_tokens"] - 1  # every pair seen
    assert bad["n_bigram_hits"] < fluent["n_bigram_hits"]
    assert fluent["xent"] < bad["xent"]


def test_robust_anomalies_resist_outlier_masking(spark, tmp_path):
    """A75's reason to exist: a huge outlier inflates mean/stddev enough
    to mask itself (classic z-score breakdown), while median/MAD keep a
    50% breakdown point.  On a planted series with one extreme spike:
    (a) the robust operator flags exactly the spike, and (b) the
    spike's plain z-score is demonstrably dampened below its robust z."""
    import statistics

    from near_indexer_for_explorer_spark.plans.relational import (
        events_value_robust_anomalies,
    )

    vals = [10.0, 10.1, 9.9, 10.2, 9.8, 10.0, 10.1, 9.9, 10.3, 10000.0]
    rows = [
        (i, 1, "t", float(v), "{}", f"2024-01-01 00:{i:02d}:00")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, props string, ts string"
    ).selectExpr(
        "event_id", "user_id", "event_type", "value", "props",
        "CAST(ts AS TIMESTAMP_NTZ) AS ts",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_value_robust_anomalies(spark, str(tmp_path)).collect()
    assert [r["event_id"] for r in out] == [9]  # exactly the spike
    spike = out[0]
    # plain z of the spike on the same series (population stddev):
    mu = statistics.mean(vals)
    sd = statistics.pstdev(vals)
    plain_z = (vals[9] - mu) / sd
    assert plain_z < 3.1  # mean/stddev nearly mask the spike...
    assert spike["robust_z"] > 1000  # ...median/MAD do not


def test_bloom_filter_contract(spark, sf_dir):
    """B60 contract on real data: a bloom NEVER produces a false
    negative (every truly-seen probe is a member), and at the sized
    m/k the realized false-positive rate stays within an order of the
    theoretical bound (sanity, not exactness — fp is the traded
    quantity)."""
    import math

    from near_indexer_for_explorer_spark.operators.corpus import (
        _BLOOM_BITS,
        _BLOOM_K,
        bloom_seen_filter,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    rows = bloom_seen_filter(spark, sf_dir).collect()
    assert rows
    assert all(r["n_false_neg"] == 0 for r in rows)
    n_probes = sum(r["n_probes"] for r in rows)
    n_fp = sum(r["n_false_pos"] for r in rows)
    n_true = sum(r["n_true_seen"] for r in rows)
    assert n_true > 0, "test data should have users on both sides"
    n_seen = (
        load_table(spark, sf_dir, "events")
        .where("event_id % 2 = 0")
        .select("user_id")
        .distinct()
        .count()
    )
    theory = (1 - math.exp(-_BLOOM_K * n_seen / _BLOOM_BITS)) ** _BLOOM_K
    realized = n_fp / max(1, n_probes - n_true)
    assert realized <= max(10 * theory, 0.02), (realized, theory)


def test_frozen_minhash_index_memoizes_per_session(spark, sf_dir):
    """The dedup-verify family's shared LSH candidate leg is built once
    per (sf_dir, session) and reused as an eager checkpoint: repeated
    calls return the SAME DataFrame objects (no retraining), and the
    frozen candidate relation equals a fresh recomputation row-for-row
    (deterministic md5-based permutations — the property that lets the
    composed queries keep their oracles verbatim)."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        _distinct_shingles,
        frozen_lsh_candidates,
        frozen_minhash_index,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sig1, cand1 = frozen_minhash_index(spark, sf_dir)
    sig2, cand2 = frozen_minhash_index(spark, sf_dir)
    assert sig1 is sig2 and cand1 is cand2
    assert frozen_lsh_candidates(spark, sf_dir) is cand1

    fresh = lsh_candidate_pairs(
        minhash_signatures(_distinct_shingles(spark, sf_dir))
    )
    frozen_rows = sorted(map(tuple, cand1.collect()))
    fresh_rows = sorted(map(tuple, fresh.collect()))
    assert frozen_rows == fresh_rows


def test_multimodal_decode_backend_gating(spark, sf_dir):
    """The registered query pins the stub backend (its byte-math oracle
    must stay valid in every environment); 'auto' falls back to the
    stub when Pillow is absent and never raises."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        DECODE_SCHEMA,
        make_decode_kernel,
        multimodal_decode,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    rows = multimodal_decode(spark, sf_dir).limit(5).collect()
    assert rows and all(r.decode_backend == "stub" for r in rows)

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    auto = docs.mapInPandas(
        make_decode_kernel("auto"), schema=DECODE_SCHEMA
    ).limit(5).collect()
    try:
        import PIL.Image  # noqa: F401

        # with Pillow present 'auto' goes real — text bytes aren't an
        # image, so the kernel raising is the expected surface there;
        # this branch only runs in media-capable environments
        assert True
    except ImportError:
        assert auto and all(r.decode_backend == "stub" for r in auto)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown decode backend"):
        make_decode_kernel("webp")


def test_multimodal_real_pil_decode(spark):
    """Env-gated (C15 precedent): with Pillow installed, the 'pil'
    backend decodes a real in-memory PNG through the same Arrow
    mapInPandas plumbing and reports exact pixel statistics."""
    import pytest as _pytest

    PIL_Image = _pytest.importorskip("PIL.Image")
    import io

    def png_bytes(val: int, size: int = 8) -> bytes:
        img = PIL_Image.new("L", (size, size), color=val)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    from near_indexer_for_explorer_spark.multimodal.decode import (
        DECODE_SCHEMA,
        make_decode_kernel,
    )

    payloads = [(1, png_bytes(0)), (2, png_bytes(255)), (3, png_bytes(128))]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {
        r.doc_id: r
        for r in df.mapInPandas(
            make_decode_kernel("pil"), schema=DECODE_SCHEMA
        ).collect()
    }
    assert got[1].decode_backend == "pil"
    assert got[1].fake_mean_byte == 0.0
    assert got[2].fake_mean_byte == 255.0
    assert got[3].fake_mean_byte == 128.0
    # header_u32 = big-endian PNG magic first word, same byte math as stub
    assert got[1].header_u32 == int.from_bytes(b"\x89PNG", "big")


def test_dsir_weights_prefer_target_domain(spark, tmp_path):
    """B61 semantics: a raw document phrased like the TARGET (val-split)
    domain gets a higher DSIR log importance weight than one phrased
    like the off-target bulk — with identical lengths, so the ordering
    comes from the hashed-n-gram likelihood ratio, not size."""
    import hashlib

    from near_indexer_for_explorer_spark.operators.corpus import (
        _SPLIT_MOD,
        dsir_importance_weights,
    )

    def bucket(doc_id):
        h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % _SPLIT_MOD

    ids = list(range(400))
    train_ids = [i for i in ids if bucket(i) < 32][:20]
    val_ids = [i for i in ids if 32 <= bucket(i) < 36][:5]
    test_ids = [i for i in ids if bucket(i) >= 36][:2]
    target_phrase = "formal proofs of theorem statements in lean four"
    bulk_phrase = "click here to win amazing prizes right now"
    docs = [(i, bulk_phrase, "en", "s", 0) for i in train_ids]
    docs += [(i, target_phrase, "en", "s", 0) for i in val_ids]
    docs += [(test_ids[0], target_phrase, "en", "s", 0)]
    docs += [(test_ids[1], bulk_phrase, "en", "s", 0)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r for r in dsir_importance_weights(spark, str(tmp_path)).collect()
    }
    on_target, off_target = rows[test_ids[0]], rows[test_ids[1]]
    assert on_target["split"] == "test" and off_target["split"] == "test"
    assert on_target["n_feats"] == off_target["n_feats"]  # same length
    assert on_target["log_w"] > off_target["log_w"]


def test_kneser_ney_continuation_diversity(spark, tmp_path):
    """B62's reason to exist (the "Francisco" effect): a word that is
    FREQUENT but continues only one context gets a LOWER KN score in a
    novel context than a rarer word with diverse continuations — the
    exact ordering count-based Stupid Backoff (B59) gets backwards.
    Both orderings are asserted, proving the two LMs genuinely
    disagree on the planted corpus."""
    import hashlib

    from near_indexer_for_explorer_spark.operators.corpus import (
        _SPLIT_MOD,
        bigram_backoff_xent,
        kneser_ney_bigram_xent,
    )

    def bucket(doc_id):
        h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % _SPLIT_MOD

    ids = list(range(400))
    train_ids = [i for i in ids if bucket(i) < 32][:5]
    test_ids = [i for i in ids if bucket(i) >= 36][:2]
    # "francisco" occurs 8x but ONLY after "san"; "the" occurs 4x after
    # 4 DISTINCT contexts.  Unigram frequency favors francisco;
    # continuation diversity favors the.
    docs = [
        (train_ids[0], "san francisco san francisco san francisco san francisco "
         "san francisco san francisco san francisco san francisco",
         "en", "s", 0),
        (train_ids[1], "alpha the", "en", "s", 0),
        (train_ids[2], "beta the", "en", "s", 0),
        (train_ids[3], "gamma the", "en", "s", 0),
        (train_ids[4], "delta the", "en", "s", 0),
        # test docs: unseen starter "query" -> second token scores on
        # the lower-order distribution alone in both LMs
        (test_ids[0], "query francisco", "en", "s", 0),
        (test_ids[1], "query the", "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    kn = {r["doc_id"]: r for r in kneser_ney_bigram_xent(spark, str(tmp_path)).collect()}
    sb = {r["doc_id"]: r for r in bigram_backoff_xent(spark, str(tmp_path)).collect()}
    # KN: diverse continuations win
    assert kn[test_ids[1]]["xent"] < kn[test_ids[0]]["xent"]
    # Stupid Backoff: raw frequency wins (the opposite ordering)
    assert sb[test_ids[0]]["xent"] < sb[test_ids[1]]["xent"]
    # seen-context sanity: interior tokens of a train phrase all hit
    assert kn[train_ids[0]]["n_bigram_hits"] == kn[train_ids[0]]["n_tokens"] - 1


def test_lsh_s_curve_monotone_in_band_width(spark, sf_dir):
    """B63 structure: if a pair agrees on some r-row band, every row of
    that band agrees, so it also agrees on a band of every FINER
    factorization — caught sets are nested along (4,16) ⊆ (8,8) ⊆
    (16,4) ⊆ (32,2) ⊆ (64,1).  Checked on the real corpus, plus the
    theoretical S-curve values ordering the same way and the empirical
    recall never exceeding 1."""
    from near_indexer_for_explorer_spark.operators.dedup import lsh_s_curve

    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_s_curve(spark, sf_dir).collect()
    }
    order = [(64, 1), (32, 2), (16, 4), (8, 8), (4, 16)]
    assert set(rows) == set(order)
    for finer, coarser in zip(order, order[1:]):
        assert rows[finer]["n_dup_caught"] >= rows[coarser]["n_dup_caught"]
        assert rows[finer]["n_nondup_caught"] >= rows[coarser]["n_nondup_caught"]
        assert rows[finer]["theory_p_at_t"] >= rows[coarser]["theory_p_at_t"]
    for cfg in order:
        r = rows[cfg]
        assert r["n_dup_caught"] <= r["n_dup_pairs"]
        if r["recall"] is not None:
            assert 0.0 <= r["recall"] <= 1.0


def test_hard_negatives_exclude_near_dups(spark, tmp_path):
    """B64 semantics: mined hard negatives sit strictly inside the
    [_NEG_LO, _NEG_HI) band, so a PLANTED near-duplicate of an anchor
    (cos >= 0.86 — a false negative for contrastive training) never
    appears in the anchor's negative set, and ranks are contiguous
    hardest-first."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        _NEG_HI,
        _NEG_K,
        _NEG_LO,
        ann_hard_negatives,
    )

    planted_dir = _planted_neardup_dir(tmp_path)
    rows = ann_hard_negatives(spark, planted_dir).collect()
    assert rows, "expected mined negatives on the planted corpus"
    for r in rows:
        assert _NEG_LO <= r["cos_sim"] < _NEG_HI
    # anchor 400 is the planted partner of base 0 (cos 0.86) and both
    # are in the query set (vec_id % 100 == 0): the pair must be banned
    mined = {(r["q_id"], r["neighbor_id"]) for r in rows}
    assert (400, 0) not in mined and (0, 400) not in mined
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= _NEG_K
        ordered = sorted(rs, key=lambda x: x["rank"])
        sims = [x["cos_sim"] for x in ordered]
        assert sims == sorted(sims, reverse=True)


def test_ewma_dyadic_kernel_semantics(spark, tmp_path):
    """A77: the renormalized dyadic kernel is unbiased on a constant
    series (ewma == the constant to float precision at every prefix
    length) and tracks a step change monotonically from inside the
    (old, new) interval."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import events_ewma_value

    t0 = datetime.datetime(2024, 1, 1)
    const = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "c", 10.0, "{}")
        for i in range(30)
    ]
    step = [
        (100 + i, t0 + datetime.timedelta(minutes=i), 2, "c",
         0.0 if i < 25 else 100.0, "{}")
        for i in range(50)
    ]
    spark.createDataFrame(
        const + step,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    rows = events_ewma_value(spark, str(tmp_path)).collect()
    u1 = sorted((r for r in rows if r["user_id"] == 1), key=lambda r: r["event_id"])
    assert abs(u1[0]["ewma"] - 10.0) == 0.0  # n=1: x/2 / (1/2), exact
    for r in u1:
        assert abs(r["ewma"] - 10.0) < 1e-9
    u2 = sorted((r for r in rows if r["user_id"] == 2), key=lambda r: r["event_id"])
    tail = [r["ewma"] for r in u2 if r["event_id"] >= 125]
    # reaches exactly 100 once the 20-term window is all post-step
    assert all(0.0 < v <= 100.0 for v in tail)
    assert tail == sorted(tail)  # monotone approach to the new level
    assert tail[-1] > 99.0  # 25 steps of halving ~ fully converged


def test_top_component_recovers_planted_direction(spark, tmp_path):
    """B66: on a corpus whose variance is concentrated along ONE
    planted direction, 3 power iterations recover it (|cosine| > 0.99
    to the planted axis) and the explained-variance share reflects the
    concentration (well above the isotropic 1/64)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_top_component,
    )

    rng = np.random.default_rng(20260814)
    dim, n = 64, 2000
    d = rng.standard_normal(dim)
    d /= np.linalg.norm(d)
    data = rng.standard_normal((n, dim)) * 0.1
    data += np.outer(rng.standard_normal(n) * 2.0, d)
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype("float32") for row in data], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    rows = embedding_top_component(spark, str(tmp_path)).collect()
    assert len(rows) == 64
    v = np.zeros(dim)
    for r in rows:
        v[r["dim_idx"]] = r["loading"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    assert abs(float(v @ d)) > 0.99
    frac = rows[0]["explained_frac"]
    assert all(abs(r["explained_frac"] - frac) < 1e-12 for r in rows)
    # planted: ~4/(4 + 64*0.01) ~ 0.86 of total variance on one axis
    assert frac > 0.5
    assert rows[0]["lambda_est"] > 0


def test_cusum_finds_planted_step_change(spark, tmp_path):
    """A78: a planted mean shift maximizes the CUSUM walk exactly at
    the step boundary (flagged, located); an alternating stationary
    series stays below the critical value."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import events_value_cusum

    t0 = datetime.datetime(2024, 1, 1)
    step = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "c",
         10.0 if i < 50 else 20.0, "{}")
        for i in range(100)
    ]
    flat = [
        (200 + i, t0 + datetime.timedelta(minutes=i), 2, "c",
         10.0 + (0.01 if i % 2 == 0 else -0.01), "{}")
        for i in range(100)
    ]
    spark.createDataFrame(
        step + flat,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    rows = {r["user_id"]: r for r in events_value_cusum(spark, str(tmp_path)).collect()}
    assert rows[1]["changepoint"] is True
    assert rows[1]["cp_event_id"] == 49  # the last pre-shift row peaks the walk
    assert rows[1]["cusum_norm"] > 1.358
    assert rows[2]["changepoint"] is False
    assert rows[2]["cusum_norm"] < 1.358


def test_bm25_ranks_planted_relevant_doc_first(spark, tmp_path):
    """B67: a short document dense in BOTH query terms outranks
    single-term and diluted documents; docs with no query term never
    appear."""
    from near_indexer_for_explorer_spark.operators.textops import bm25_search

    filler = "data table row column value stream"
    docs = [(i, filler, "en", "s", 0) for i in range(30)]
    docs.append((100, "hash join hash join hash join", "en", "s", 0))  # dense, both
    docs.append((101, "hash hash " + filler * 4, "en", "s", 0))  # one term, diluted
    docs.append((102, filler + " join " + filler, "en", "s", 0))  # one term once
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = [r for r in bm25_search(spark, str(tmp_path)).collect() if r["query_id"] == 1]
    assert rows, "query 1 should match planted docs"
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert by_rank[0]["doc_id"] == 100
    returned = {r["doc_id"] for r in rows}
    assert returned == {100, 101, 102}  # fillers contain neither term
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[100] > scores[101] and scores[100] > scores[102]


def test_autocorrelation_detects_planted_weekly_period(spark, tmp_path):
    """A79: a perfectly period-7 daily series has lag-7 autocorrelation
    exactly 1 and smaller lag-1 correlation; the budget curve test data
    doubles as a monotonicity check for B68."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        events_daily_autocorrelation,
    )

    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    pattern = [1, 5, 2, 9, 3, 7, 4]  # weekly profile, all days present
    for day in range(28):
        for _ in range(pattern[day % 7]):
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, minutes=eid % 60),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    acf = {
        r["lag"]: r for r in events_daily_autocorrelation(spark, str(tmp_path)).collect()
    }
    assert acf[7]["acf"] == 1.0
    assert acf[7]["n_pairs"] == 21
    assert acf[1]["acf"] < 0.99


def test_quality_budget_curve_monotone(spark, sf_dir):
    """B68: kept docs/tokens are monotone nondecreasing in the
    threshold and fractions stay in [0, 1]."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        quality_budget_curve,
    )

    rows = sorted(
        quality_budget_curve(spark, sf_dir).collect(), key=lambda r: r["threshold"]
    )
    assert len(rows) == 9
    docs = [r["n_docs_kept"] for r in rows]
    toks = [r["n_tokens_kept"] for r in rows]
    assert docs == sorted(docs) and toks == sorted(toks)
    for r in rows:
        assert 0.0 <= r["doc_frac"] <= 1.0 and 0.0 <= r["token_frac"] <= 1.0


def test_ivf_recall_curve_monotone_nested(spark, sf_dir):
    """B69: candidate sets are nested in nprobe by construction, so
    candidates, hits, and recall are all monotone nondecreasing; at
    nprobe = max the candidates are exactly the full IVF search leg."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        _IVF_NPROBE,
        _ivf_probe_pairs,
        ivf_nprobe_recall_curve,
    )

    rows = sorted(
        ivf_nprobe_recall_curve(spark, sf_dir).collect(), key=lambda r: r["nprobe"]
    )
    assert [r["nprobe"] for r in rows] == list(range(1, _IVF_NPROBE + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["n_candidates"] <= b["n_candidates"]
        assert a["n_hit"] <= b["n_hit"]
        assert a["recall"] <= b["recall"]
    assert rows[-1]["n_candidates"] == _ivf_probe_pairs(spark, sf_dir).count()
    assert 0.0 < rows[-1]["recall"] <= 1.0


def test_kl_drift_separates_planted_shift(spark, tmp_path):
    """B70: a val split phrased like train scores near-zero divergence;
    a val split with disjoint phrasing scores clearly higher, and JS
    stays within its ln(2) bound."""
    import hashlib
    import math

    from near_indexer_for_explorer_spark.operators.corpus import (
        _SPLIT_MOD,
        token_kl_drift,
    )

    def bucket(doc_id):
        h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16) % _SPLIT_MOD

    ids = list(range(600))
    train_ids = [i for i in ids if bucket(i) < 32][:30]
    val_ids = [i for i in ids if 32 <= bucket(i) < 36][:10]
    same = "alpha beta gamma delta epsilon zeta"
    shifted = "omega psi chi phi upsilon tau"
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def corpus(val_phrase):
        docs = [(i, same, "en", "s", 0) for i in train_ids]
        docs += [(i, val_phrase, "en", "s", 0) for i in val_ids]
        return docs

    results = {}
    for tag, phrase in (("same", same), ("shifted", shifted)):
        spark.createDataFrame(corpus(phrase), schema).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "documents.parquet"))
        results[tag] = token_kl_drift(spark, str(tmp_path)).collect()[0]
    assert results["same"]["kl_val_train"] < 0.01
    assert results["shifted"]["kl_val_train"] > results["same"]["kl_val_train"] * 10
    for tag in results:
        assert 0.0 <= results[tag]["js"] <= math.log(2.0) + 1e-9


def test_minhash_width_curve_consistency(spark, sf_dir):
    """B71: same candidate pairs at every width; the 64-hash column
    reproduces B31's estimator error (same signatures), and all errors
    are valid magnitudes."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_width_curve,
    )

    rows = {r["n_perms"]: r for r in minhash_width_curve(spark, sf_dir).collect()}
    assert set(rows) == {16, 32, 64}
    n = {r["n_pairs"] for r in rows.values()}
    assert len(n) == 1
    for r in rows.values():
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] <= 1.0
    b31 = minhash_jaccard_estimate(spark, sf_dir).collect()
    mean31 = sum(r["abs_err"] for r in b31) / len(b31)
    assert abs(rows[64]["mean_abs_err"] - mean31) < 1e-5


def test_receipt_depth_histogram_structure(spark, sf_dir):
    """A81: depth 0 counts the root set (n_nodes == n_roots_reaching),
    and the set of roots reaching depth d is nonincreasing in d."""
    from near_indexer_for_explorer_spark.plans.relational import (
        receipt_depth_histogram,
    )

    rows = {r["depth"]: r for r in receipt_depth_histogram(spark, sf_dir).collect()}
    assert 0 in rows
    assert rows[0]["n_nodes"] == rows[0]["n_roots_reaching"]
    depths = sorted(rows)
    for a, b in zip(depths, depths[1:]):
        assert rows[a]["n_roots_reaching"] >= rows[b]["n_roots_reaching"]


def test_winnowing_guarantee_and_density(spark, tmp_path):
    """B72 contracts: (1) the winnowing theorem — two docs sharing a
    token run of length >= w + k - 1 share at least one selected
    fingerprint, and a 16-token shared run (11 fully-interior windows,
    each fingerprint covering at most w=4 of them) yields >= ceil(11/4)
    = 3 shared fingerprints, clearing the report threshold; (2) the
    selected-fingerprint density on distinct-token text sits near the
    paper's 2/(w+1) expectation."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        _WIN_W,
        _winnow_fingerprints,
        dedup_winnowing,
    )

    shared = " ".join(f"run{i}" for i in range(16))
    docs = [
        (1, "alpha bravo charlie delta " + shared + " echo foxtrot golf hotel", "en", "s", 0),
        (2, "india juliett kilo lima " + shared + " mike november oscar papa", "en", "s", 0),
    ]
    # filler docs with fully distinct vocabularies (no shared grams)
    for d in range(3, 13):
        docs.append((d, " ".join(f"w{d}x{i}" for i in range(40)), "en", "s", 0))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    fps = _winnow_fingerprints(spark, str(tmp_path))
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_h"])
    n_shared = len(by_doc[1] & by_doc[2])
    assert n_shared >= 3  # theorem bound for the 16-token run

    pairs = {(r["doc_id_1"], r["doc_id_2"]): r for r in dedup_winnowing(
        spark, str(tmp_path)).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["n_shared_fp"] == n_shared
    assert 0.0 < pairs[(1, 2)]["overlap"] <= 1.0
    # no cross-pairs among the distinct-vocabulary fillers
    assert all(a == 1 and b == 2 for (a, b) in pairs)

    # density: one 500-distinct-token doc -> ~2/(w+1) of windows selected
    long_doc = [(99, " ".join(f"t{i}" for i in range(500)), "en", "s", 0)]
    spark.createDataFrame(long_doc, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    n_fp = _winnow_fingerprints(spark, str(tmp_path)).count()
    n_windows = (500 - 2) - (_WIN_W - 1)
    density = n_fp / n_windows
    assert 0.25 < density < 0.55, density


def test_keep_best_selects_quality_not_min_id(spark, tmp_path):
    """B73 semantics: within a near-dup cluster the keep flag follows
    the QUALITY ranking, not the component label (which is the min id);
    singletons keep themselves; exactly one keep per component."""
    from near_indexer_for_explorer_spark.operators.dedup import dedup_keep_best

    base = " ".join(f"shared{i}" for i in range(200))
    # doc 2 = doc 1 + a stopword-rich tail: still a near-dup (the tail
    # is ~5% of the grams) but strictly higher quality_score (higher
    # stopword ratio at the same token budget)
    docs = [
        (1, base, "en", "s", 0),
        (2, base + " the a of to and is in that it on", "en", "s", 0),
    ]
    for d in range(3, 9):
        docs.append((d, " ".join(f"w{d}y{i}" for i in range(60)), "en", "s", 0))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r["doc_id"]: r for r in dedup_keep_best(spark, str(tmp_path)).collect()}
    assert rows[1]["component_id"] == rows[2]["component_id"] == 1
    assert rows[1]["n_cluster"] == rows[2]["n_cluster"] == 2
    assert rows[2]["quality_r"] > rows[1]["quality_r"]
    assert rows[2]["keep"] and not rows[1]["keep"]  # best, not min-id
    for d in range(3, 9):
        assert rows[d]["keep"] and rows[d]["n_cluster"] == 1
    by_comp = {}
    for r in rows.values():
        by_comp.setdefault(r["component_id"], []).append(r["keep"])
    assert all(sum(flags) == 1 for flags in by_comp.values())


def test_triangle_census_planted_graph(spark, tmp_path):
    """A82 semantics on a hand-built basket set: parts 1-2-3 co-occur
    twice each (one triangle), part 4 hangs off part 1, a support-1
    pair is pruned.  Every census column is checkable by hand."""
    from near_indexer_for_explorer_spark.plans.relational import (
        part_copurchase_triangles,
    )

    rows = []
    for o in (1, 2):  # triangle 1-2-3, support 2 per edge
        rows += [(o, 1), (o, 2), (o, 3)]
    for o in (3, 4):  # pendant edge 1-4, support 2
        rows += [(o, 1), (o, 4)]
    rows += [(5, 2), (5, 5)]  # support-1 pair: pruned
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))

    out = part_copurchase_triangles(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 4  # (1,2) (1,3) (2,3) (1,4)
    assert r["n_wedges"] == 5  # deg 3,2,2,1 -> 3+1+1+0
    assert r["n_triangles"] == 1  # counted once despite 3 corners
    assert abs(r["global_cc"] - 0.6) < 1e-12
    assert r["max_degree"] == 3


def test_isotropy_planted_spectra(spark, tmp_path):
    """B74 semantics: a label whose variance lives in ONE dimension
    scores PR ~= 1; a label with equal variance in every dimension
    scores PR = 64 exactly (the isotropic limit)."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_isotropy,
    )

    rows = []
    # label 0: +-1 in dim 0 only -> var = (1.0) in dim 0, 0 elsewhere
    for i in range(64):
        v = [0.0] * 64
        v[0] = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, v, 0))
    # label 1: one-hot basis vectors cycled -> identical variance per dim
    for i in range(128):
        v = [0.0] * 64
        v[i % 64] = 1.0
        rows.append((1000 + i, v, 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r["label"]: r for r in embedding_isotropy(spark, str(tmp_path)).collect()}
    assert out[0]["n_vecs"] == 64 and out[1]["n_vecs"] == 128
    assert abs(out[0]["participation_ratio"] - 1.0) < 1e-9
    assert abs(out[0]["isotropy_score"] - 1 / 64) < 1e-6
    assert abs(out[1]["participation_ratio"] - 64.0) < 1e-6
    assert abs(out[1]["isotropy_score"] - 1.0) < 1e-6


def test_dow_seasonality_planted_weekly_pattern(spark, tmp_path):
    """A83 semantics on a planted weekly series: Mondays carry 10
    events, other days 2, one Monday spikes to 40.  The weekday index
    must mark Mondays hot, the epoch-day arithmetic must put Monday at
    dow=0, and the only anomaly is the planted spike."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        events_dow_seasonality,
    )

    rows = []
    eid = 0
    start = dt.date(2024, 1, 1)  # a Monday
    for day in range(28):  # 4 full weeks
        d = start + dt.timedelta(days=day)
        n = 10 if d.weekday() == 0 else 2
        if day == 21:  # the 4th Monday spikes
            n = 40
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(d.year, d.month, d.day, 12), 1, "click", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["event_date"]: r for r in events_dow_seasonality(
        spark, str(tmp_path)).collect()}
    assert len(out) == 28
    mon = out[dt.date(2024, 1, 1)]
    assert mon["dow"] == 0  # epoch-day arithmetic, Monday = 0
    assert mon["dow_mean"] == 17.5  # (10+10+10+40)/4
    assert mon["seasonal_index"] > 1.5  # Mondays run hot
    tue = out[dt.date(2024, 1, 2)]
    assert tue["dow"] == 1 and tue["dow_mean"] == 2.0
    anomalies = [d for d, r in out.items() if r["is_anomaly"]]
    assert anomalies == [dt.date(2024, 1, 22)]  # only the planted spike


def test_packing_curve_hand_checked(spark, tmp_path):
    """B75 arithmetic on 3 hand-sized docs (tokens 100, 600, 2500):
    every column per L is checkable by hand, including the ceil-div
    boundary (600 tokens at L=512 -> 2 sequences, 424 pad)."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        packing_efficiency_curve,
    )

    def doc(i, n):
        return (i, " ".join(f"t{k}" for k in range(n)), "en", "s", 0)

    spark.createDataFrame(
        [doc(1, 100), doc(2, 600), doc(3, 2500)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["seq_len"]: r for r in packing_efficiency_curve(
        spark, str(tmp_path)).collect()}
    total = 100 + 600 + 2500
    r = out[512]
    assert r["n_docs"] == 3 and r["total_tokens"] == total
    assert r["n_docs_over"] == 2  # 600 and 2500 exceed 512
    assert r["n_sequences"] == 1 + 2 + 5  # ceil(100/512)+ceil(600/512)+ceil(2500/512)
    assert r["pad_tokens"] == (512 - 100) + (1024 - 600) + (2560 - 2500)
    assert abs(r["efficiency"] - total / (8 * 512)) < 1e-6
    assert r["packed_sequences"] == 7  # ceil(3200/512)
    assert out[2048]["n_docs_over"] == 1
    assert out[128]["n_sequences"] == 1 + 5 + 20


def test_heaps_growth_planted_limits(spark, tmp_path):
    """B76 contracts: a corpus where every 3-gram type is globally
    unique has V(N) = N at every prefix, so the log-log OLS fit must
    return exactly b=1, k=1; on a pure-duplicate corpus (every doc the
    same text) the type inventory saturates in the first quarter, b
    collapses toward 0, and the left-join zero-fill still emits all 4
    curve points.  Structural: grams strictly increase, types never
    decrease, the 4th point equals the corpus totals."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        vocab_growth_heaps,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    uniq = [
        (d, " ".join(f"u{d}x{i}" for i in range(30)), "en", "s", 0)
        for d in range(40)
    ]
    spark.createDataFrame(uniq, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = sorted(
        vocab_growth_heaps(spark, str(tmp_path)).collect(),
        key=lambda r: r["prefix_quarter"],
    )
    assert [r["prefix_quarter"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert r["types_cum"] == r["n_grams_cum"]  # every gram unique
    assert rows[-1]["n_grams_cum"] == 40 * 28  # 30 tokens -> 28 grams/doc
    assert all(
        a["n_grams_cum"] < b["n_grams_cum"] and a["types_cum"] < b["types_cum"]
        for a, b in zip(rows, rows[1:])
    )
    assert rows[0]["heaps_b"] == 1.0 and rows[0]["heaps_k"] == 1.0

    dup = [(d, "same tokens every single doc", "en", "s", 0) for d in range(40)]
    spark.createDataFrame(dup, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = sorted(
        vocab_growth_heaps(spark, str(tmp_path)).collect(),
        key=lambda r: r["prefix_quarter"],
    )
    assert len(rows) == 4  # zero-fill keeps the saturated quarters
    assert rows[-1]["types_cum"] == 3  # one doc's worth of grams
    assert rows[0]["heaps_b"] < 0.2  # type inventory saturates


def test_doc_novelty_first_occurrence_attribution(spark, tmp_path):
    """B77 semantics: the first doc containing a gram gets the credit.
    Doc 1 is all-novel (it's first); doc 2 copies doc 1 plus one new
    sentence (partial novelty); doc 3 is a verbatim copy of doc 1
    (novelty 0, flagged redundant)."""
    from near_indexer_for_explorer_spark.operators.corpus import doc_novelty

    base = " ".join(f"b{i}" for i in range(20))  # 18 grams
    extra = " ".join(f"x{i}" for i in range(10))
    docs = [
        (1, base, "en", "s", 0),
        (2, base + " " + extra, "en", "s", 0),
        (3, base, "en", "s", 0),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["doc_id"]: r for r in doc_novelty(spark, str(tmp_path)).collect()}
    assert out[1]["n_grams"] == 18 and out[1]["novelty"] == 1.0
    assert not out[1]["is_redundant"]
    # doc 2: 30 tokens -> 28 grams; 18 copied + 2 bridge + 8 extra-only
    assert out[2]["n_grams"] == 28
    assert out[2]["n_novel"] == 10  # the 2 bridge + 8 extra grams
    assert abs(out[2]["novelty"] - 10 / 28) < 1e-6
    assert out[3]["n_novel"] == 0 and out[3]["novelty"] == 0.0
    assert out[3]["is_redundant"]


def test_dedup_savings_report_token_vs_doc_divergence(spark, tmp_path):
    """B78 semantics: dropping one of two near-dups in source 'a'
    halves its doc rate but NOT its token rate (the kept copy is the
    longer one); untouched source 'b' keeps 100% of both."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_savings_report,
    )

    base = " ".join(f"shared{i}" for i in range(200))
    docs = [
        (1, base, "en", "a", 0),
        (2, base + " the a of to and is in that it on", "en", "a", 0),
    ]
    for d in range(3, 9):
        docs.append((d, " ".join(f"w{d}y{i}" for i in range(60)), "en", "b", 0))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r["source"]: r for r in dedup_savings_report(
        spark, str(tmp_path)).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 2 and a["n_docs_kept"] == 1
    assert a["doc_keep_rate"] == 0.5
    assert a["n_tokens"] == 200 + 210 and a["n_tokens_kept"] == 210
    assert a["token_keep_rate"] > 0.5  # the longer copy was kept
    assert b["n_docs_kept"] == b["n_docs"] == 6
    assert b["token_keep_rate"] == 1.0


def test_attribution_models_planted_journey(spark, tmp_path):
    """A84 semantics: a purchase with a click 1 day before and a view
    2 days before splits linear credit 0.5/0.5 but gives last-touch
    credit to the click alone; a click 10 days out is outside the
    window; a touchless purchase contributes nothing."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        attribution_models,
    )

    t0 = dt.datetime(2024, 5, 10, 12)

    def at(days):
        return t0 + dt.timedelta(days=days)

    rows = [
        (1, at(-10), 7, "click", 0.0, "{}"),   # outside the 7d window
        (2, at(-2), 7, "view", 0.0, "{}"),
        (3, at(-1), 7, "click", 0.0, "{}"),
        (4, at(0), 7, "purchase", 9.0, "{}"),
        (5, at(3), 8, "purchase", 9.0, "{}"),  # touchless
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["event_type"]: r for r in attribution_models(
        spark, str(tmp_path)).collect()}
    assert set(out) == {"click", "view"}
    assert out["click"]["n_touch_credits"] == 1  # the -10d click excluded
    assert out["click"]["linear_credit"] == 0.5
    assert out["view"]["linear_credit"] == 0.5
    assert out["click"]["last_touch_conversions"] == 1
    assert out["view"]["last_touch_conversions"] == 0
    assert out["click"]["n_conversions_touched"] == 1


def test_engagement_windows_planted_activity(spark, tmp_path):
    """A85 semantics: activity on day X covers WAU for X..X+6 and MAU
    for X..X+27.  User 1 active Jan 1 only; user 2 active Jan 1 and
    Jan 11.  On Jan 11: DAU=1 (u2), WAU=1 (u1's coverage lapsed Jan 7),
    MAU=2 (u1 still covers)."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        engagement_dau_wau_mau,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "click", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 11), 2, "click", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 11, 9), 2, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["event_date"]: r for r in engagement_dau_wau_mau(
        spark, str(tmp_path)).collect()}
    assert set(out) == {dt.date(2024, 1, 1), dt.date(2024, 1, 11)}
    d1 = out[dt.date(2024, 1, 1)]
    assert (d1["dau"], d1["wau"], d1["mau"]) == (2, 2, 2)
    assert d1["stickiness_dw"] == 1.0
    d11 = out[dt.date(2024, 1, 11)]
    assert (d11["dau"], d11["wau"], d11["mau"]) == (1, 1, 2)
    assert d11["stickiness_dm"] == 0.5


def test_split_leakage_planted_cross_pair(spark, tmp_path):
    """B79 semantics: two planted near-dup docs whose md5 split buckets
    land in different splits must surface as a cross-split pair with
    the later-split doc counted as leaked; within-split rows report 0
    leaked docs by definition."""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.functions.hashing import md5_u32
    from near_indexer_for_explorer_spark.operators.corpus import (
        _SPLIT_MOD,
        split_leakage_report,
    )

    # find doc ids whose split buckets differ (train vs val/test)
    spark_ids = spark.range(0, 200).select(
        "id", md5_u32(F.col("id"), "split:", _SPLIT_MOD).alias("sb")
    ).collect()
    train_id = next(r["id"] for r in spark_ids if r["sb"] < 32)
    eval_id = next(r["id"] for r in spark_ids if r["sb"] >= 32)

    base = " ".join(f"leak{i}" for i in range(200))
    docs = [
        (train_id, base, "en", "s", 0),
        (eval_id, base + " tail drift", "en", "s", 0),
    ]
    filler_ids = [r["id"] for r in spark_ids
                  if r["id"] not in (train_id, eval_id)][:6]
    for d in filler_ids:
        docs.append((int(d), " ".join(f"w{d}z{i}" for i in range(60)), "en", "s", 0))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {(r["split_1"], r["split_2"]): r for r in split_leakage_report(
        spark, str(tmp_path)).collect()}
    cross = [k for k in out if k[0] != k[1]]
    assert len(cross) == 1 and cross[0][0] == "train"
    r = out[cross[0]]
    assert r["n_pairs"] == 1 and r["n_docs_leaked"] == 1
    for k in out:
        if k[0] == k[1]:
            assert out[k]["n_docs_leaked"] == 0


def test_abc_pareto_planted_classes(spark, tmp_path):
    """A89 semantics: revenues 70/20/10 split exactly at the 70%/90%
    boundaries — the boundary part belongs to the HEAD class because
    the comparison is <= on exact decimals."""
    from near_indexer_for_explorer_spark.plans.relational import (
        parts_abc_pareto,
    )

    rows = [(1, 70.0, 0.0), (2, 20.0, 0.0), (3, 10.0, 0.0)]
    spark.createDataFrame(
        rows, "l_partkey long, l_extendedprice double, l_discount double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    out = {r["abc_class"]: r for r in parts_abc_pareto(spark, str(tmp_path)).collect()}
    assert out["A"]["n_parts"] == 1 and out["A"]["class_revenue"] == 70.0
    assert out["B"]["n_parts"] == 1 and out["B"]["class_revenue"] == 20.0
    assert out["C"]["n_parts"] == 1 and out["C"]["class_revenue"] == 10.0
    assert out["A"]["revenue_share"] == 0.7


def test_hhi_monopoly_vs_uniform(spark, tmp_path):
    """A87 semantics: a single-supplier market scores HHI = 1; four
    equal suppliers score exactly 0.25."""
    from near_indexer_for_explorer_spark.plans.relational import (
        supplier_market_hhi,
    )

    li = [(1, 1, 50.0, 0.0)] + [(2, s, 25.0, 0.0) for s in range(1, 5)]
    spark.createDataFrame(
        li,
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "MONO"), (2, "UNIF")], "p_partkey long, p_type string"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    out = {r["p_type"]: r for r in supplier_market_hhi(spark, str(tmp_path)).collect()}
    assert out["MONO"]["hhi"] == 1.0 and out["MONO"]["top_share"] == 1.0
    assert out["UNIF"]["n_suppliers"] == 4
    assert out["UNIF"]["hhi"] == 0.25 and out["UNIF"]["top_share"] == 0.25


def test_gapfill_planted_gap_and_delta(spark, tmp_path):
    """A88 semantics: activity in Jan and Mar only — Feb must exist
    with revenue 0 and Mar's MoM delta must span the gap from 0."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        orders_monthly_gapfill,
    )

    spark.createDataFrame(
        [
            (1, 1, 100.0, datetime.datetime(1995, 1, 15)),
            (2, 1, 40.0, datetime.datetime(1995, 3, 2)),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 7)], "c_custkey long, c_nationkey int"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(7, "FRANCE")], "n_nationkey int, n_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))

    out = {
        str(r["month"]): r
        for r in orders_monthly_gapfill(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"1995-01-01", "1995-02-01", "1995-03-01"}
    assert out["1995-02-01"]["revenue"] == 0.0
    assert out["1995-02-01"]["mom_delta"] == -100.0
    assert out["1995-03-01"]["mom_delta"] == 40.0
    assert out["1995-01-01"]["prev_revenue"] is None


def test_daily_trend_planted_line(spark, tmp_path):
    """A90 semantics: daily totals exactly on y = 2x + 3 (x = epoch
    day) recover slope 2, intercept 3, r2 = 1 bit-exactly — the
    closed form runs on exact sufficient statistics."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        events_daily_trend,
    )

    rows = []
    base = datetime.date(2020, 1, 1)
    for i in range(10):
        d = base + datetime.timedelta(days=i)
        x = (d - datetime.date(1970, 1, 1)).days
        rows.append(
            (i, datetime.datetime(d.year, d.month, d.day, 12), "t", 2.0 * x + 3.0)
        )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = events_daily_trend(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 10
    assert r["slope"] == 2.0 and r["intercept"] == 3.0 and r["r2"] == 1.0


def test_centroid_confusion_planted_orthogonal(spark, tmp_path):
    """B80 semantics: two languages with orthogonal embeddings give a
    perfectly diagonal confusion matrix with share 1.0."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        centroid_assign_confusion,
    )

    rows, docs = [], []
    for i in range(8):
        v = [0.0] * 64
        v[0] = 1.0
        rows.append((i, v, 0))
        docs.append((i, "en"))
    for i in range(8, 16):
        v = [0.0] * 64
        v[1] = 1.0
        rows.append((i, v, 1))
        docs.append((i, "fr"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    spark.createDataFrame(docs, "doc_id long, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = centroid_assign_confusion(spark, str(tmp_path)).collect()
    got = {(r["true_lang"], r["assigned_lang"]): r for r in out}
    assert set(got) == {("en", "en"), ("fr", "fr")}
    assert all(r["share"] == 1.0 and r["n_docs"] == 8 for r in out)


def test_rerank_int8_equals_exact_when_prefilter_covers(spark, tmp_path):
    """B81 contract: with fewer corpus vectors than RERANK_M, the
    coarse stage keeps everything and the rerank output must equal the
    brute-force exact top-k verbatim."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_cosine_topk,
        ann_rerank_int8,
    )

    rows = []
    for i in range(40):
        v = [
            ((_h.md5(f"{i}:{j}".encode()).digest()[0] / 255.0) - 0.5)
            for j in range(64)
        ]
        rows.append((i * 10, v))  # ids 0,10,...,390: queries at 0,100,...
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    exact = {
        (r["q_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_cosine_topk(spark, str(tmp_path)).collect()
    }
    rerank = {
        (r["q_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_rerank_int8(spark, str(tmp_path)).collect()
    }
    assert exact and rerank == exact


def test_skipgram_pmi_planted_pair(spark, tmp_path):
    """B83 semantics: 12 two-token docs 'a b' yield c_pair 12, margins
    12/12, N = 12, pmi = ln 4."""
    import math

    from near_indexer_for_explorer_spark.operators.corpus import (
        skipgram_cooc_pmi,
    )

    docs = [(i, "a b", "s") for i in range(12)]
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = skipgram_cooc_pmi(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["c_pair"]) == ("a", "b", 12)
    assert r["marg_w1"] == 12 and r["marg_w2"] == 12
    assert abs(r["pmi"] - round(math.log(4.0), 6)) < 1e-9


def test_burstiness_planted_clump_vs_spread(spark, tmp_path):
    """B82 semantics: 24 occurrences in one doc score burstiness 24;
    24 occurrences across 24 docs score 1; a single source means the
    chi-square dispersion is exactly 0."""
    from near_indexer_for_explorer_spark.operators.textops import (
        term_burstiness,
    )

    docs = [(0, " ".join(["clump"] * 24), "s")]
    docs += [(i, "spread", "s") for i in range(1, 25)]
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["term"]: r for r in term_burstiness(spark, str(tmp_path)).collect()}
    assert out["clump"]["cf"] == 24 and out["clump"]["df"] == 1
    assert out["clump"]["burstiness"] == 24.0
    assert out["spread"]["burstiness"] == 1.0
    assert out["clump"]["chi2_dispersion"] == 0.0
    assert out["spread"]["chi2_dispersion"] == 0.0


def test_top_paths_planted_sessions(spark, tmp_path):
    """A91 semantics: five single-session users each doing a>b>c
    yield one path row with support 5; a 2-event session contributes
    no trigram."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        events_top_paths,
    )

    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    for u in range(5):
        for k, et in enumerate(["a", "b", "c"]):
            rows.append((eid, base + datetime.timedelta(seconds=k), u, et, 1.0))
            eid += 1
    rows.append((eid, base, 99, "a", 1.0))
    rows.append((eid + 1, base + datetime.timedelta(seconds=1), 99, "b", 1.0))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = events_top_paths(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["path"] == "a>b>c"
    assert r["n_occurrences"] == 5 and r["n_sessions"] == 5


def test_matryoshka_equals_exact_when_prefilter_covers(spark, tmp_path):
    """B85 contract: with fewer corpus vectors than RERANK_M the
    prefix-dim coarse stage keeps everything, so the rerank output
    must equal the brute-force exact top-k verbatim."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_cosine_topk,
        matryoshka_ann_topk,
    )

    rows = []
    for i in range(40):
        v = [
            ((_h.md5(f"m{i}:{j}".encode()).digest()[0] / 255.0) - 0.5)
            for j in range(64)
        ]
        rows.append((i * 10, v))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    exact = {
        (r["q_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_cosine_topk(spark, str(tmp_path)).collect()
    }
    got = {
        (r["q_id"], r["neighbor_id"]): r["cos_sim"]
        for r in matryoshka_ann_topk(spark, str(tmp_path)).collect()
    }
    assert exact and got == exact


def test_induced_stopwords_planted_ratios(spark, tmp_path):
    """B86 semantics: df_ratio 1.0 curated word induced, boundary 0.5
    word included (exact-integer threshold), 0.25 word excluded."""
    from near_indexer_for_explorer_spark.operators.textops import (
        induced_stopwords,
    )

    docs = [
        (0, "the zebra runs", "s", "en"),
        (1, "the zebra sleeps", "s", "en"),
        (2, "the fox", "s", "en"),
        (3, "the fox rare", "s", "en"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["term"]: r for r in induced_stopwords(spark, str(tmp_path)).collect()}
    assert out["the"]["df_ratio"] == 1.0 and out["the"]["is_curated"]
    assert out["zebra"]["df_ratio"] == 0.5 and not out["zebra"]["is_curated"]
    assert out["fox"]["df_ratio"] == 0.5
    assert "rare" not in out and "runs" not in out


def test_anisotropy_whiten_planted_common_direction(spark, tmp_path):
    """B87 semantics: vectors sharing a dominant common direction score
    a high raw mean pairwise cosine; diagonal whitening (which must
    survive the 62 zero-variance padding dims) pulls it near zero."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_anisotropy_whiten,
    )

    rows = []
    combos = [(0.1, 0.5), (0.1, -0.5), (-0.1, 0.5), (-0.1, -0.5)]
    for i in range(16):
        d0, d1 = combos[i % 4]
        v = [0.0] * 64
        v[0] = 1.0 + d0
        v[1] = d1
        rows.append((i, v))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r["variant"]: r for r in embedding_anisotropy_whiten(spark, str(tmp_path)).collect()}
    assert out["raw"]["n_vecs"] == 16
    assert out["raw"]["mean_pairwise_cos"] > 0.5
    assert abs(out["whitened"]["mean_pairwise_cos"]) < 0.1
    assert out["whitened"]["mean_pairwise_cos"] < out["raw"]["mean_pairwise_cos"]


def test_cohort_ltv_planted_curve(spark, tmp_path):
    """A92 semantics: a 2-customer cohort where one customer returns
    in month+1 — active counts, cumulative revenue, and per-member
    LTV are all hand-checkable."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        cohort_ltv_curves,
    )

    spark.createDataFrame(
        [
            (1, 10, 100.0, datetime.datetime(1995, 1, 5)),
            (2, 10, 50.0, datetime.datetime(1995, 2, 7)),
            (3, 20, 30.0, datetime.datetime(1995, 1, 20)),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = {r["age_months"]: r for r in cohort_ltv_curves(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_active"] == 2 and out[0]["revenue"] == 130.0
    assert out[0]["cumulative_revenue"] == 130.0
    assert out[0]["ltv_per_customer"] == 65.0
    assert out[1]["n_active"] == 1 and out[1]["revenue"] == 50.0
    assert out[1]["cumulative_revenue"] == 180.0
    assert out[1]["ltv_per_customer"] == 90.0


def test_user_entropy_planted_bot_vs_organic(spark, tmp_path):
    """A93 semantics: a 12-event single-type user scores entropy 0 and
    the low-entropy flag; an even two-type mix scores ln 2; a 4-event
    user never flags regardless of entropy."""
    import datetime
    import math

    from near_indexer_for_explorer_spark.plans.relational import (
        user_event_entropy,
    )

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for _ in range(12):
        rows.append((eid, base, 1, "x", 1.0)); eid += 1
    for k in range(12):
        rows.append((eid, base, 2, "x" if k % 2 else "y", 1.0)); eid += 1
    for _ in range(4):
        rows.append((eid, base, 3, "x", 1.0)); eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["user_id"]: r for r in user_event_entropy(spark, str(tmp_path)).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["is_low_entropy"]
    assert abs(out[2]["entropy"] - round(math.log(2.0), 6)) < 1e-9
    assert not out[2]["is_low_entropy"]
    assert out[3]["n_events"] == 4 and not out[3]["is_low_entropy"]


def test_cross_lang_overlap_planted_sets(spark, tmp_path):
    """B88 semantics: vocabularies {a,b,c} and {b,c,d} overlap with
    Jaccard 0.5 and containment 2/3."""
    from near_indexer_for_explorer_spark.operators.textops import (
        cross_lang_vocab_overlap,
    )

    docs = [(0, "a b c", "s", "en"), (1, "b c d", "s", "fr")]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = cross_lang_vocab_overlap(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lang_1"], r["lang_2"]) == ("en", "fr")
    assert r["n_common"] == 2 and r["n_1"] == 3 and r["n_2"] == 3
    assert r["jaccard"] == 0.5 and r["containment"] == round(2 / 3, 6)


def test_pair_features_planted_identical_docs(spark, tmp_path):
    """B89 semantics: two byte-identical documents are an LSH candidate
    pair with jaccard = containment = len_ratio = 1 and the near-dup
    flag; the unrelated third doc pairs with nobody."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_pair_features,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight nine"
    docs = [
        (0, text, "s", "en", len(text)),
        (1, text, "s", "en", len(text)),
        (2, other, "s", "en", len(other)),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = dedup_pair_features(spark, str(tmp_path)).collect()
    pairs = {(r["doc_id_1"], r["doc_id_2"]): r for r in out}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    assert r["jaccard"] == 1.0 and r["containment"] == 1.0
    assert r["len_ratio"] == 1.0 and r["is_near_dup"]
    assert all(2 not in k for k in pairs)


def test_rerank_curve_monotone_and_saturates(spark, tmp_path):
    """B92 contract: recall is monotone non-decreasing in the rerank
    depth and saturates at exactly 1.0 once the depth covers the whole
    corpus (here 39 < 50 candidates per query)."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_rerank_curve,
    )

    rows = []
    for i in range(40):
        v = [
            ((_h.md5(f"c{i}:{j}".encode()).digest()[0] / 255.0) - 0.5)
            for j in range(64)
        ]
        rows.append((i * 10, v))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r["rerank_m"]: r["mean_recall"] for r in ann_rerank_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == [10, 25, 50]
    assert out[10] <= out[25] <= out[50]
    assert out[50] == 1.0


def test_borderline_docs_planted_single_failures(spark, tmp_path):
    """B93 semantics: exactly-one-rule failures enter the review queue
    labeled with the failed rule; multi-rule failures and clean docs
    stay out."""
    from near_indexer_for_explorer_spark.operators.textops import (
        borderline_docs,
    )

    import itertools
    import string

    two = [a + b for a, b in itertools.product(string.ascii_lowercase, repeat=2)]
    four = [
        "".join(w) for w in itertools.product(string.ascii_lowercase, repeat=2)
    ]
    four = [w + "xy" for w in four]
    docs = [
        (0, " ".join(four[:10]), "s", "xx"),   # only n_words fails (10 < 25)
        (1, " ".join(two[:30]), "s", "xx"),    # only mean_word_len fails (2.0)
        (2, " ".join(two[:10]), "s", "xx"),    # both fail -> excluded
        (3, " ".join(four[:30]), "s", "xx"),   # clean -> excluded
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["doc_id"]: r for r in borderline_docs(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    assert out[0]["failed_rule"] == "n_words"
    assert out[1]["failed_rule"] == "mean_word_len"


def test_norm_outliers_planted_blowup(spark, tmp_path):
    """B91 semantics: a label with one blown-up-norm vector flags
    exactly that vector; a healthy label still emits its top-3 review
    rows with no outlier flag."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_norm_outliers,
    )

    rows = []
    for i in range(20):
        v = [
            ((_h.md5(f"n{i}:{j}".encode()).digest()[0] / 255.0) - 0.5) * 0.1
            for j in range(64)
        ]
        v[0] += 1.0  # healthy norms cluster near 1
        rows.append((i, v, 0))
    blown = [0.0] * 64
    blown[0] = 50.0
    rows.append((100, blown, 1))
    for i in range(101, 120):
        v = [
            ((_h.md5(f"m{i}:{j}".encode()).digest()[0] / 255.0) - 0.5) * 0.1
            for j in range(64)
        ]
        v[0] += 1.0
        rows.append((i, v, 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = embedding_norm_outliers(spark, str(tmp_path)).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    assert len(by_label[0]) == 3 and len(by_label[1]) == 3
    assert not any(r["is_outlier"] for r in by_label[0])
    flagged = [r for r in by_label[1] if r["is_outlier"]]
    assert [r["vec_id"] for r in flagged] == [100]
    assert flagged[0]["robust_z"] > 100


def test_order_ship_latency_planted_percentiles(spark, tmp_path):
    """A94 semantics: latencies 1..10 days give interpolated p50 5.5,
    p90 9.1, p99 9.91, mean 5.5."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        order_ship_latency,
    )

    base = datetime.datetime(1995, 1, 1)
    orders = [(k, base, "1-URGENT") for k in range(1, 11)]
    lines = [
        (k, base + datetime.timedelta(days=k)) for k in range(1, 11)
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    out = order_ship_latency(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_lines"] == 10 and r["mean_days"] == 5.5
    assert r["p50"] == 5.5 and r["p90"] == 9.1 and r["p99"] == 9.91


def test_dau_split_planted_lifecycle(spark, tmp_path):
    """A95 semantics: day 1 has one new user; day 2 adds a second new
    user while the first returns — pct_new 0.5."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        dau_new_vs_returning,
    )

    d1 = datetime.datetime(2024, 1, 1, 9)
    d2 = datetime.datetime(2024, 1, 2, 9)
    rows = [(0, d1, 1, "x", 1.0), (1, d2, 1, "x", 1.0), (2, d2, 2, "x", 1.0)]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {str(r["event_date"]): r for r in dau_new_vs_returning(spark, str(tmp_path)).collect()}
    assert out["2024-01-01"]["dau"] == 1 and out["2024-01-01"]["new_users"] == 1
    assert out["2024-01-02"]["dau"] == 2
    assert out["2024-01-02"]["new_users"] == 1
    assert out["2024-01-02"]["returning_users"] == 1
    assert out["2024-01-02"]["pct_new"] == 0.5


def test_cluster_sizes_planted_histogram(spark, tmp_path):
    """B94 semantics: a 3-copy family and a 2-copy family yield one
    size-3 and one size-2 histogram row; the unique doc is no
    cluster."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_cluster_sizes,
    )

    a = "alpha beta gamma delta epsilon zeta eta theta iota"
    b = "one two three four five six seven eight nine ten"
    c = "lorem ipsum dolor sit amet consectetur adipiscing elit sed"
    docs = [(i, a, "s", "en") for i in range(3)]
    docs += [(10 + i, b, "s", "en") for i in range(2)]
    docs += [(20, c, "s", "en")]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {r["cluster_size"]: r for r in dedup_cluster_sizes(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 3}
    assert out[3]["n_clusters"] == 1 and out[3]["n_removable"] == 2
    assert out[2]["n_clusters"] == 1 and out[2]["n_removable"] == 1


def test_hourly_profile_planted_peak(spark, tmp_path):
    """A96 semantics: Monday (dow 0) 9am carries the mass and is the
    unique peak cell; shares sum to 1 over the type."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        events_hourly_profile,
    )

    rows, eid = [], 0
    for _ in range(8):  # 2024-01-01 is a Monday
        rows.append((eid, datetime.datetime(2024, 1, 1, 9, 5), 1, "t", 1.0)); eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 2, 14, 0), 1, "t", 1.0)); eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 7, 23, 0), 1, "t", 1.0)); eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = events_hourly_profile(spark, str(tmp_path)).collect()
    cells = {(r["dow"], r["hour"]): r for r in out}
    assert cells[(0, 9)]["n_events"] == 8 and cells[(0, 9)]["is_peak"]
    assert cells[(1, 14)]["n_events"] == 1 and not cells[(1, 14)]["is_peak"]
    assert (6, 23) in cells  # Sunday
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-6


def test_hubness_report_degree_conservation(spark, tmp_path):
    """B95 contract: in-degrees across the histogram account for every
    top-k slot exactly (sum degree*count == TOP_K * n_queries), and
    the hub id is one of the most-referenced vectors."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        TOP_K,
        ann_cosine_topk,
        ann_hubness_report,
    )

    rows = []
    for i in range(40):
        v = [
            ((_h.md5(f"h{i}:{j}".encode()).digest()[0] / 255.0) - 0.5)
            for j in range(64)
        ]
        rows.append((i * 10, v))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    topk = ann_cosine_topk(spark, str(tmp_path)).collect()
    nq = len({r["q_id"] for r in topk})
    out = ann_hubness_report(spark, str(tmp_path)).collect()
    assert sum(r["in_degree"] * r["n_vectors"] for r in out) == TOP_K * nq
    max_deg = max(r["in_degree"] for r in out)
    from collections import Counter

    degs = Counter(r["neighbor_id"] for r in topk)
    hubs = {v for v, d in degs.items() if d == max_deg}
    assert out[0]["max_hub_id"] == min(hubs)


def test_survival_curve_planted_km(spark, tmp_path):
    """A97 semantics: hand-computed Kaplan-Meier with censoring.
    Events {2,2,5,10}, censors {6,5,0,0} (8 obs): S(2) = 1-2/6,
    S(5) = (2/3)(3/4) = 0.5, and at t=10 the last at-risk obs is the
    event itself (d = n) so the curve drops to exactly 0."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        customer_survival_curve,
    )

    base = datetime.datetime(1995, 1, 1)

    def d(n):
        return base + datetime.timedelta(days=n)

    rows = [
        (1, d(0), 1), (1, d(2), 2), (1, d(4), 3),   # gaps 2,2; censor 6
        (2, d(0), 4), (2, d(5), 5),                  # gap 5; censor 5
        (3, d(10), 6),                               # censor 0 (fixes max)
        (4, d(0), 7), (4, d(10), 8),                 # gap 10; censor 0
    ]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_orderkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = {r["gap_days"]: r for r in customer_survival_curve(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 5, 10}
    assert out[2]["n_at_risk"] == 6 and out[2]["n_events"] == 2
    assert out[2]["survival"] == 0.666667
    assert out[5]["n_at_risk"] == 4 and out[5]["n_events"] == 1
    assert out[5]["survival"] == 0.5
    assert out[10]["n_at_risk"] == 1 and out[10]["n_events"] == 1
    assert out[10]["survival"] == 0.0


def test_order_backlog_planted_intervals(spark, tmp_path):
    """A98 semantics: two orders open day 0, one more day 2; closes at
    ship-max 1 and 3 leave on days 2 and 4; the unshipped order never
    leaves — backlog 2, 2, 1."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        order_backlog_daily,
    )

    base = datetime.datetime(1995, 1, 1)

    def d(n):
        return base + datetime.timedelta(days=n)

    orders = [(1, d(0)), (2, d(0)), (3, d(2))]
    lines = [(1, d(1)), (2, d(3)), (2, d(1))]  # order 3 never ships
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    out = {str(r["event_date"]): r for r in order_backlog_daily(spark, str(tmp_path)).collect()}
    assert set(out) == {"1995-01-01", "1995-01-03", "1995-01-05"}
    assert out["1995-01-01"]["n_opened"] == 2 and out["1995-01-01"]["backlog"] == 2
    assert out["1995-01-03"]["n_opened"] == 1 and out["1995-01-03"]["n_leaving"] == 1
    assert out["1995-01-03"]["backlog"] == 2
    assert out["1995-01-05"]["n_leaving"] == 1 and out["1995-01-05"]["backlog"] == 1


def test_incremental_cohort_planted_base_dup(spark, tmp_path):
    """B96 semantics: an incoming doc identical to a BASE doc is
    dropped (max_base_jaccard 1.0); an incoming doc with no base
    candidate is kept outright; two identical INCOMING docs are both
    kept — the screen is asymmetric by contract (within-cohort dedup
    is the ordinary pipeline's job).  Split buckets: md5-split ids
    0/3 are base, 1/2/8/9 incoming."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_incremental_cohort,
    )

    t_shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, t_shared),                                   # base
        (3, "lorem ipsum dolor sit amet consectetur"),   # base filler
        (1, t_shared),                                   # incoming dup of base
        (2, "one two three four five six"),              # incoming unique
        (8, "red green blue purple orange yellow"),      # incoming twins
        (9, "red green blue purple orange yellow"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["doc_id"]: r for r in dedup_incremental_cohort(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 8, 9}  # incoming cohort only
    assert out[1]["is_dup"] and not out[1]["kept"]
    assert out[1]["max_base_jaccard"] == 1.0
    assert out[1]["n_base_candidates"] >= 1
    assert out[2]["kept"] and out[2]["n_base_candidates"] == 0
    assert out[2]["max_base_jaccard"] is None
    assert out[8]["kept"] and out[9]["kept"]  # incoming-incoming not screened


def test_simhash_hamming_curve_planted_monotone(spark, tmp_path):
    """B97 semantics: identical docs (hamming 0, jaccard 1) are caught
    at every cutoff including 0; catch counts are monotone in the
    cutoff (nesting); the pair universe is constant across rows."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        _HAMMING_CURVE_CUTOFFS,
        simhash_hamming_curve,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),     # dup pair, hamming 0
        (2, "shared tri gram aaa bbb ccc"),
        (3, "shared tri gram xxx yyy zzz"),             # 1 common shingle
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["h_max"]: r for r in simhash_hamming_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == sorted(_HAMMING_CURVE_CUTOFFS)
    universe = {
        (r["n_dup_pairs"], r["n_nondup_pairs"]) for r in out.values()
    }
    assert len(universe) == 1  # same pair universe in every row
    assert out[0]["n_dup_caught"] >= 1  # the identical pair at cutoff 0
    cuts = sorted(_HAMMING_CURVE_CUTOFFS)
    for lo, hi in zip(cuts, cuts[1:]):
        assert out[lo]["n_dup_caught"] <= out[hi]["n_dup_caught"]
        assert out[lo]["n_nondup_caught"] <= out[hi]["n_nondup_caught"]


def test_interarrival_planted_bot_vs_organic(spark, tmp_path):
    """A99 semantics: a metronome user (25 events, exactly 60 s apart)
    scores cv = 0 and trips the regular-cadence flag; a bursty user
    does not (and misses the volume floor)."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        user_interarrival_stats,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=60 * i), 1, "x", 1.0)
        for i in range(25)
    ]
    bursty_offsets = [0, 10, 1010, 1020]
    rows += [
        (100 + i, base + datetime.timedelta(seconds=s), 2, "x", 1.0)
        for i, s in enumerate(bursty_offsets)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["user_id"]: r for r in user_interarrival_stats(spark, str(tmp_path)).collect()}
    assert out[1]["n_gaps"] == 24 and out[1]["mean_gap_s"] == 60.0
    assert out[1]["cv"] == 0.0 and out[1]["is_regular"]
    assert out[2]["n_gaps"] == 3 and not out[2]["is_regular"]
    assert out[2]["cv"] > 0.2


def test_bpe_merge_curve_monotone_and_baseline(spark, tmp_path):
    """B98 semantics: depth 0 is the character baseline (n_symbols ==
    n_chars), each merge can only shrink the encoding, and the grid
    has one row per depth 0..3."""
    from near_indexer_for_explorer_spark.operators.bpe import (
        _BPE_ROUNDS,
        bpe_merge_curve,
    )

    rows = [
        (0, "banana banana bandana"),
        (1, "banana bandana cabana"),
        (2, "an ban nan banana"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["n_merges"]: r for r in bpe_merge_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == list(range(_BPE_ROUNDS + 1))
    assert out[0]["n_symbols"] == out[0]["n_chars"]
    assert out[0]["fertility"] == out[0]["n_chars"] / out[0]["n_words"]
    for k in range(_BPE_ROUNDS):
        assert out[k + 1]["n_symbols"] < out[k]["n_symbols"]  # 'an' is everywhere
        assert out[k + 1]["n_words"] == out[k]["n_words"]


def test_vocab_oov_curve_planted_coverage(spark, tmp_path):
    """B99 semantics: 2 hot types + 20 singleton types; V=16 covers the
    hot mass plus 14 tie-broken singletons (oov 6/100), V>=64 covers
    everything."""
    from near_indexer_for_explorer_spark.operators.textops import (
        vocab_oov_curve,
    )

    text_hot = " ".join(["aa"] * 50 + ["bb"] * 30)
    text_tail = " ".join(f"c{i:02d}" for i in range(20))
    rows = [(0, text_hot), (1, text_tail)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["vocab_size"]: r for r in vocab_oov_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == [16, 64, 256, 1024]
    assert out[16]["total_tokens"] == 100
    assert out[16]["n_vocab_types"] == 16
    assert out[16]["covered_tokens"] == 94  # aa+bb + 14 singletons (token asc)
    assert out[16]["oov_rate"] == 0.06
    for v in (64, 256, 1024):
        assert out[v]["n_vocab_types"] == 22
        assert out[v]["oov_rate"] == 0.0


def test_trending_decayed_planted_recency_beats_volume(spark, tmp_path):
    """A100 semantics: a recent moderate spender outranks a bigger
    all-time spender whose activity is 10 half-lives old; rank 1's
    decayed score ~ its raw sum (age 0)."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        trending_users_decayed,
    )

    now = datetime.datetime(2024, 6, 1)
    old = now - datetime.timedelta(days=300)  # 10 half-lives: x ~2^-10
    rows = [(0, now, 1, "x", 100.0), (1, old, 2, "x", 1000.0)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["rank"]: r for r in trending_users_decayed(spark, str(tmp_path)).collect()}
    assert out[1]["user_id"] == 1 and out[2]["user_id"] == 2
    assert out[1]["decayed_score"] == 100.0  # age 0: weight exactly 1
    assert out[2]["decayed_score"] < 1.0     # 1000 * 2^-10 < 1
    assert out[2]["raw_sum"] == 1000.0


def test_contamination_curve_planted_span(spark, tmp_path):
    """B100 semantics: an eval doc containing an exact 8-token span
    from a train doc is contaminated at n = 4 and n = 8 but clean at
    n = 13; leakage rate is non-increasing in n.  (md5 decon split:
    ids 1, 2 are train; 0, 7 are eval.)"""
    import hashlib

    from near_indexer_for_explorer_spark.operators.corpus import (
        contamination_ngram_curve,
    )

    def bucket(i):
        return int(hashlib.md5(f"decon:{i}".encode()).hexdigest()[:8], 16) % 10

    train_ids = [i for i in range(20) if bucket(i) < 8][:2]
    eval_ids = [i for i in range(20) if bucket(i) >= 8][:2]
    span = "one two three four five six seven eight"
    rows = [
        (train_ids[0], f"{span} tail words here"),
        (train_ids[1], "totally unrelated training text body"),
        (eval_ids[0], f"prefix {span} suffix"),          # leaked span
        (eval_ids[1], "clean evaluation document nothing shared"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["ngram_n"]: r for r in contamination_ngram_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == [4, 8, 13]
    assert out[4]["n_contaminated"] == 1
    assert out[8]["n_contaminated"] == 1
    assert out[13]["n_contaminated"] == 0  # the span is only 8 tokens
    assert out[4]["overlap_rate"] >= out[8]["overlap_rate"] >= out[13]["overlap_rate"]
    assert out[13]["n_overlap"] == 0


def test_weekly_mix_drift_planted_shift(spark, tmp_path):
    """A101 semantics: week 1 matches the overall mix (chi2 near 0 is
    impossible since week 2 skews the overall — but week 2's chi2 must
    be strictly larger); a type missing for a week still contributes
    (zero-cell inclusion)."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        events_weekly_mix_drift,
    )

    # week A (Mon 2024-01-01..): 10 click + 10 view (balanced)
    # week B (Mon 2024-01-08..): 20 click + 0 view (skewed, view vanishes)
    wa = datetime.datetime(2024, 1, 1, 12)
    wb = datetime.datetime(2024, 1, 8, 12)
    rows = [(i, wa, 1, "click", 1.0) for i in range(10)]
    rows += [(100 + i, wa, 1, "view", 1.0) for i in range(10)]
    rows += [(200 + i, wb, 1, "click", 1.0) for i in range(20)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {str(r["week_start"]): r for r in events_weekly_mix_drift(spark, str(tmp_path)).collect()}
    assert set(out) == {"2024-01-01", "2024-01-08"}
    assert out["2024-01-01"]["n_events"] == 20
    assert out["2024-01-08"]["n_events"] == 20
    # overall mix: 30 click / 10 view.  Week A expected (15, 5) vs obs
    # (10, 10): chi2 = 25/15 + 25/5 = 6.6667.  Week B expected (15, 5)
    # vs obs (20, 0): same cells mirrored -> equal chi2 by symmetry.
    assert abs(out["2024-01-01"]["chi2"] - (25 / 15 + 25 / 5)) < 1e-4
    assert abs(out["2024-01-08"]["chi2"] - (25 / 15 + 25 / 5)) < 1e-4


def test_lsh_probe_curve_monotone_and_saturates(spark, sf_dir):
    """B101 semantics: candidates and hits are monotone in the probe
    radius (mask nesting), recall at radius 2 matches B6's configured
    operating point, and the pair universe at radius 2 equals the full
    probe set."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        lsh_probe_budget_curve,
    )

    out = {r["radius"]: r for r in lsh_probe_budget_curve(spark, sf_dir).collect()}
    assert sorted(out) == [0, 1, 2]
    assert out[0]["n_candidates"] <= out[1]["n_candidates"] <= out[2]["n_candidates"]
    assert out[0]["n_hits"] <= out[1]["n_hits"] <= out[2]["n_hits"]
    assert out[0]["recall_at_k"] <= out[2]["recall_at_k"]
    assert out[2]["n_queries"] > 0 and out[2]["recall_at_k"] > 0.0


def test_duplicate_payments_planted_pair(spark, tmp_path):
    """A102 semantics: same customer + identical amount within 3 days
    is flagged; the same amount 10 days apart, a different amount, and
    a different customer are not."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        orders_duplicate_payments,
    )

    base = datetime.datetime(1995, 1, 1)

    def d(n):
        return base + datetime.timedelta(days=n)

    rows = [
        (1, 7, 100.00, d(0)),
        (2, 7, 100.00, d(2)),    # dup of 1 (2 days apart)
        (3, 7, 100.00, d(12)),   # same amount, too far from both
        (4, 7, 250.00, d(1)),    # different amount
        (5, 8, 100.00, d(1)),    # different customer
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = orders_duplicate_payments(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["orderkey_1"], r["orderkey_2"]) == (1, 2)
    assert r["amount"] == 100.0 and r["days_apart"] == 2


def test_ivf_list_balance_conservation(spark, sf_dir):
    """B102 semantics: list sizes partition the corpus (sizes sum to
    n, shares to 1), imbalance is share*k, and a hot flag fires iff
    the exact-integer rule does."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        _IVF_K,
        ivf_list_balance,
    )

    rows = ivf_list_balance(spark, sf_dir).collect()
    assert 0 < len(rows) <= _IVF_K
    n = sum(r["list_size"] for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r["imbalance"] - r["share"] * _IVF_K) < 1e-4
        assert r["is_hot"] == (r["list_size"] * _IVF_K > 2 * n)


def test_chain_gap_planted_open_and_closed_wedges(spark, tmp_path):
    """B103 semantics: a~b~c with different halves replaced is an OPEN
    wedge (jaccard(a,c) = 10/26 < t), an identical triple is a CLOSED
    triangle — closure_rate 3/4 and the open pair's exact severity
    reported."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_chain_gap_report,
    )

    toks = [f"t{i:02d}" for i in range(20)]
    b = " ".join(toks)
    a = " ".join([f"x{i}" for i in range(4)] + toks[4:])
    c = " ".join(toks[:16] + [f"y{i}" for i in range(4)])
    same = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, a), (1, b), (2, c),
        (3, "unrelated filler words entirely different"),
        (4, same), (5, same), (6, same),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = dedup_chain_gap_report(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_dup_pairs"] == 5          # a-b, b-c + the 3 triangle edges
    assert r["n_wedge_pairs"] == 4        # (a,c) + the 3 triangle closures
    assert r["n_closed"] == 3 and r["n_open"] == 1
    assert r["closure_rate"] == 0.75
    assert r["avg_open_jaccard"] == 0.384615  # 10 / 26 exactly


def test_daily_decomposition_planted_line_and_spike(spark, tmp_path):
    """A103 semantics: a perfect line decomposes to zero residuals and
    no flags; a single mid-series spike is the one flagged day; and
    observed == trend_fit + dow_adj + residual holds on every row."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        events_daily_decomposition,
    )

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(28):
        ts = base + datetime.timedelta(days=i, hours=9)
        rows.append((eid, ts, 1, "line", 100.0 + 2.0 * i))
        eid += 1
        rows.append((eid, ts, 1, "spike", 5000.0 if i == 13 else 50.0))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = events_daily_decomposition(spark, str(tmp_path)).collect()
    assert len(out) == 56
    line = [r for r in out if r["event_type"] == "line"]
    assert max(abs(r["residual"]) for r in line) == 0.0
    assert not any(r["is_anomaly"] for r in line)
    flagged = [r for r in out if r["event_type"] == "spike" and r["is_anomaly"]]
    assert [str(r["event_date"]) for r in flagged] == ["2024-01-14"]
    for r in out:  # the additive identity is exact up to float eps
        assert abs(
            r["observed"] - (r["trend_fit"] + r["dow_adj"] + r["residual"])
        ) < 1e-9


def test_df_cap_curve_planted_hot_shingle(spark, tmp_path):
    """B104 semantics: 20 docs sharing one boilerplate shingle + one
    rare pair-shingle — the hot shingle's 190-pair bound survives only
    caps >= its df; monotone bounds in the cap; total bound constant."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        shingle_df_cap_curve,
    )

    rows = []
    for i in range(20):  # every doc carries the same "hot one two" shingle
        rows.append((i, f"hot one two filler{i} alpha{i} beta{i}"))
    rows.append((100, "rare gram pair unique tail words"))
    rows.append((101, "rare gram pair other tail words"))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["cap_frac"]: r for r in shingle_df_cap_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == [0.02, 0.05, 0.1, 0.2]
    n_docs = 22
    totals = {r["pairs_bound_total"] for r in out.values()}
    assert len(totals) == 1  # constant across grid rows
    # the hot shingle (df=20) contributes 190 pairs; floor cap is
    # max(4, ceil(frac*22)) = 4 or 5 -> hot dropped at every tested cap
    for frac, r in out.items():
        assert r["cap_df"] == max(4, -(-int(frac * 100) * n_docs // 100))
        assert r["pairs_bound_kept"] < r["pairs_bound_total"]
    caps = sorted(out)
    for lo, hi in zip(caps, caps[1:]):
        assert out[lo]["n_kept"] <= out[hi]["n_kept"]
        assert out[lo]["pairs_bound_kept"] <= out[hi]["pairs_bound_kept"]
    # the rare pair-shingles (df=2, one pair each) always survive
    assert all(r["pairs_bound_kept"] >= 1.0 for r in out.values())


def test_weekly_movers_planted_rank_swap(spark, tmp_path):
    """A104 semantics: clicks lead week 1, views lead week 2 — the
    rank_gain columns show the swap exactly (+1 for views, -1 for
    clicks), first week NULL."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        weekly_top_movers,
    )

    wa = datetime.datetime(2024, 1, 1, 12)
    wb = datetime.datetime(2024, 1, 8, 12)
    rows = [(i, wa, 1, "click", 1.0) for i in range(10)]
    rows += [(100 + i, wa, 1, "view", 1.0) for i in range(5)]
    rows += [(200 + i, wb, 1, "click", 1.0) for i in range(5)]
    rows += [(300 + i, wb, 1, "view", 1.0) for i in range(10)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        (str(r["week_start"]), r["event_type"]): r
        for r in weekly_top_movers(spark, str(tmp_path)).collect()
    }
    assert out[("2024-01-01", "click")]["rank"] == 1
    assert out[("2024-01-01", "click")]["prev_rank"] is None
    assert out[("2024-01-08", "view")]["rank"] == 1
    assert out[("2024-01-08", "view")]["rank_gain"] == 1
    assert out[("2024-01-08", "click")]["rank_gain"] == -1


def test_retention_fit_planted_power_law(spark, tmp_path):
    """A105 semantics: a cohort engineered to retain at exactly
    offset^-1 (100 customers at m0; 100/k active at offset k) fits
    slope -1, r2 1, and projects 1/12 at month 12."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        retention_curve_fit,
    )

    base = datetime.datetime(2020, 1, 1)
    rows = []
    kid = 0
    # cohort of 100 customers, all first-order in Jan 2020
    for c in range(100):
        rows.append((kid, c, base))
        kid += 1
    # at offset k (1..4), exactly 100/k of them order again
    for k in (1, 2, 4):
        m = datetime.datetime(2020, 1 + k, 1)
        for c in range(100 // k):
            rows.append((kid, c, m))
            kid += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = retention_curve_fit(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 3
    assert r["slope"] == -1.0 and r["r2"] == 1.0
    assert abs(r["intercept"]) < 1e-5
    assert abs(r["projected_retention_m12"] - 1 / 12) < 1e-4


def test_frozen_artifact_roundtrip(spark, sf_dir, tmp_path):
    """The frozen-memo's production path: persist the MinHash index
    artifacts to the lake, wipe the in-session memo, reload from disk
    — and the served candidate relation (and a composed verify query)
    are ROW-FOR-ROW identical to the rebuilt ones, because builds are
    deterministic."""
    from near_indexer_for_explorer_spark.operators import frozen as fz
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_pair_features,
        frozen_minhash_index,
        lsh_candidates_serve,
    )

    built = frozen_minhash_index(spark, sf_dir)
    want_cand = sorted(map(tuple, lsh_candidates_serve(spark, sf_dir).collect()))
    want_feat = sorted(map(tuple, dedup_pair_features(spark, sf_dir).collect()))

    path = str(tmp_path / "minhash_artifact")
    fz.persist_artifacts(built, path, name="minhash_index", sf_dir=sf_dir)
    app_id = spark.sparkContext.applicationId
    del fz._FROZEN[("minhash_index", sf_dir, app_id)]
    fz.load_artifacts("minhash_index", spark, sf_dir, path, arity=2)

    got_cand = sorted(map(tuple, lsh_candidates_serve(spark, sf_dir).collect()))
    got_feat = sorted(map(tuple, dedup_pair_features(spark, sf_dir).collect()))
    assert got_cand == want_cand and len(want_cand) > 0
    assert got_feat == want_feat


def test_frozen_artifact_manifest_rejects_mismatch(spark, sf_dir, tmp_path):
    """A persisted artifact's manifest is provenance: loading it under
    a different name, sf_dir, or arity must raise instead of silently
    poisoning every frozen(name, ...) consumer in the session."""
    import pytest

    from near_indexer_for_explorer_spark.operators import frozen as fz
    from near_indexer_for_explorer_spark.operators.dedup import (
        frozen_minhash_index,
    )

    built = frozen_minhash_index(spark, sf_dir)
    path = str(tmp_path / "artifact")
    fz.persist_artifacts(built, path, name="minhash_index", sf_dir=sf_dir)

    with pytest.raises(ValueError, match="name"):
        fz.load_artifacts("b11_pairs", spark, sf_dir, path, arity=2)
    with pytest.raises(ValueError, match="sf_dir"):
        fz.load_artifacts("minhash_index", spark, "/elsewhere", path, arity=2)
    with pytest.raises(ValueError, match="arity"):
        fz.load_artifacts("minhash_index", spark, sf_dir, path, arity=3)
    # manifest-less dir: arity checked against the part dirs on disk
    import os

    os.remove(os.path.join(path, "manifest.json"))
    with pytest.raises(ValueError, match="part dirs"):
        fz.load_artifacts("minhash_index", spark, sf_dir, path, arity=3)
    got = fz.load_artifacts("minhash_index", spark, sf_dir, path, arity=2)
    assert len(got) == 2


def test_matryoshka_curve_monotone_and_full_dim_perfect(spark, sf_dir):
    """B105 semantics: recall is (weakly) monotone in the prefix width
    and EXACTLY 1 at the full 64 dims (prefix == full vector, and
    RERANK_M > k guarantees coverage)."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        matryoshka_dim_curve,
    )

    out = {r["prefix_dim"]: r for r in matryoshka_dim_curve(spark, sf_dir).collect()}
    assert sorted(out) == [8, 16, 32, 64]
    assert out[64]["recall_at_k"] == 1.0
    dims = sorted(out)
    for lo, hi in zip(dims, dims[1:]):
        assert out[lo]["n_hits"] <= out[hi]["n_hits"] + 2  # near-monotone
    assert out[8]["n_queries"] > 0


def test_amount_drift_planted_shift(spark, tmp_path):
    """A106 semantics: week A draws from the low half, week B from the
    high half of a two-point amount distribution — both weeks' ECDFs
    sit 0.5 away from the pooled one at the median boundary; a third
    balanced week scores ~0."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        weekly_amount_drift,
    )

    wa = datetime.datetime(2024, 1, 1, 12)
    wb = datetime.datetime(2024, 1, 8, 12)
    wc = datetime.datetime(2024, 1, 15, 12)
    rows = [(i, 1, 10.0, wa) for i in range(20)]
    rows += [(100 + i, 1, 1000.0, wb) for i in range(20)]
    rows += [(200 + i, 1, 10.0 if i % 2 == 0 else 1000.0, wc) for i in range(20)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    out = {str(r["week_start"]): r for r in weekly_amount_drift(spark, str(tmp_path)).collect()}
    assert set(out) == {"2024-01-01", "2024-01-08", "2024-01-15"}
    # pooled mix is 30 low / 30 high: low-only week's ECDF at the
    # median boundary is 1.0 vs pooled 0.5 -> ks 0.5 and drifted
    assert out["2024-01-01"]["ks_stat"] == 0.5 and out["2024-01-01"]["drifted"]
    assert out["2024-01-08"]["ks_stat"] == 0.5 and out["2024-01-08"]["drifted"]
    assert out["2024-01-15"]["ks_stat"] == 0.0
    assert not out["2024-01-15"]["drifted"]


def test_lsh_bucket_balance_conservation(spark, sf_dir):
    """B106 semantics: bucket sizes partition the corpus, shares sum
    to 1, imbalance is share*64, hot flag matches the integer rule."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        _N_PLANES,
        lsh_bucket_balance,
    )

    rows = lsh_bucket_balance(spark, sf_dir).collect()
    nb = 1 << _N_PLANES
    assert 0 < len(rows) <= nb
    n = sum(r["bucket_size"] for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r["imbalance"] - r["share"] * nb) < 1e-3
        assert r["is_hot"] == (r["bucket_size"] * nb > 2 * n)


def test_reciprocity_planted_flows(spark, tmp_path):
    """A107 semantics: A->B flow 100, B->A flow 25 nets +75 with
    reciprocity 0.25; a one-way pair scores 0."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        nation_trade_reciprocity,
    )

    ts = datetime.datetime(1996, 6, 1)
    spark.createDataFrame(
        [(1, "NA"), (2, "NB"), (3, "NC")], "n_nationkey long, n_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "s_suppkey long, s_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(20, 1), (21, 2)], "c_custkey long, c_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    # orders: o1 by cust of NB (receives from NA), o2 by cust of NA
    spark.createDataFrame(
        [(100, 21), (101, 20)], "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (100, 10, 100.0, 0.0, ts),  # NA supplier -> NB customer: 100
        (101, 11, 25.0, 0.0, ts),   # NB supplier -> NA customer: 25
        (100, 12, 40.0, 0.0, ts),   # NC supplier -> NB customer: one-way
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    out = {
        (r["nation_a"], r["nation_b"]): r
        for r in nation_trade_reciprocity(spark, str(tmp_path)).collect()
    }
    ab = out[("NA", "NB")]
    assert ab["flow_ab"] == 100.0 and ab["flow_ba"] == 25.0
    assert ab["net_ab"] == 75.0 and ab["reciprocity"] == 0.25
    cb = out[("NB", "NC")]
    assert cb["reciprocity"] == 0.0
    assert (cb["flow_ab"], cb["flow_ba"]) in {(0.0, 40.0), (40.0, 0.0)}


def test_keep_best_lift_planted_quality_order(spark, tmp_path):
    """B107 semantics: in a 2-doc cluster where the HIGHER-quality doc
    has the HIGHER doc_id, keep-best beats min-id by exactly their
    round-6 quality gap; singletons are excluded."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        keep_best_quality_lift,
    )
    from near_indexer_for_explorer_spark.operators.textops import text_quality

    # identical token multisets => jaccard 1 (a near-dup pair), but
    # different punctuation/length => different quality scores
    good = "the quick brown fox jumps over the lazy dog today"
    bad = good + " !!! ??? !!! ??? !!! ???"
    rows = [(1, bad), (2, good), (9, "completely unrelated singleton text")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    q = {
        r["doc_id"]: round(r["quality_score"], 6)
        for r in text_quality(spark, str(tmp_path)).collect()
    }
    out = keep_best_quality_lift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    if r["n_clusters"] == 1 and q[2] != q[1]:
        assert r["n_clustered_docs"] == 2
        hi, lo = max(q[1], q[2]), min(q[1], q[2])
        assert abs(r["mean_quality_keep_best"] - hi) < 1e-6
        assert abs(r["mean_quality_min_id"] - q[1]) < 1e-6
        expected_lift = round(hi - q[1], 6)
        assert abs(r["quality_lift"] - expected_lift) < 1e-6


def test_bitwidth_curve_monotone_and_ternary_worst(spark, sf_dir):
    """B108 semantics: more bits can only shrink the error (nested
    level grids at these widths), int8 is tight (<2% mean relative
    error on 64-dim vectors) and ternary is the worst row."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_bitwidth_curve,
    )

    out = {r["bits"]: r for r in embedding_bitwidth_curve(spark, sf_dir).collect()}
    assert sorted(out) == [2, 4, 8]
    assert out[2]["levels"] == 1 and out[8]["levels"] == 127
    assert out[2]["mean_rel_err"] >= out[4]["mean_rel_err"] >= out[8]["mean_rel_err"]
    assert out[8]["mean_rel_err"] < 0.02
    assert out[2]["max_rel_err"] >= out[8]["max_rel_err"]
    n = {r["n_vectors"] for r in out.values()}
    assert len(n) == 1  # same corpus every row


def test_winnowing_curve_density_and_guarantee(spark, tmp_path):
    """B109 semantics: density falls with the window (near the
    2/(w+1) expectation on random-ish text, within 2x), the guarantee
    length is w + k - 1, and the gram-position census is constant
    across rows."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        winnowing_window_curve,
    )

    import hashlib
    words = [hashlib.md5(str(i).encode()).hexdigest()[:6] for i in range(400)]
    rows = [(d, " ".join(words[d * 40:(d + 1) * 40] * 3)) for d in range(10)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["window_w"]: r for r in winnowing_window_curve(spark, str(tmp_path)).collect()}
    assert sorted(out) == [4, 8, 16]
    assert {r["n_gram_positions"] for r in out.values()} == {
        out[4]["n_gram_positions"]
    }
    for w, r in out.items():
        assert r["guarantee_len"] == w + 2
        assert 0 < r["density"] <= 1.0
        assert r["density"] < 2.0 * r["theory_density"] + 0.05
    assert out[4]["density"] > out[8]["density"] > out[16]["density"]


def test_session_stats_planted_distribution(spark, tmp_path):
    """A108 semantics: 3 planted sessions — a bounce, a 2-event
    10-minute visit, a 3-event 40-minute visit (split by the 30-min
    gap? no: consecutive gaps < 30 min keep it one session) — counts,
    bounce rate 1/3, and exact interpolated percentiles."""
    import datetime

    from near_indexer_for_explorer_spark.plans.relational import (
        session_duration_stats,
    )

    base = datetime.datetime(2024, 1, 1, 9)

    def at(minute):
        return base + datetime.timedelta(minutes=minute)

    rows = [
        (0, at(0), 1, "x", 1.0),                       # user 1: bounce
        (1, at(0), 2, "x", 1.0), (2, at(10), 2, "x", 1.0),  # 600 s
        (3, at(0), 3, "x", 1.0), (4, at(20), 3, "x", 1.0),
        (5, at(40), 3, "x", 1.0),                      # 2400 s (gaps 20,20)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = session_duration_stats(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 3 and r["n_users"] == 3
    assert r["n_bounces"] == 1 and abs(r["bounce_rate"] - 1 / 3) < 1e-6
    # durations {0, 600, 2400}: p50 interpolates to 600
    assert r["p50_duration_s"] == 600.0
    assert r["p99_duration_s"] > r["p90_duration_s"] > r["p50_duration_s"]
    assert r["mean_events"] == 2.0


def test_receipt_data_dag_planted(spark, tmp_path):
    """A109/A110 semantics on a hand-built DAG: receipt k produces
    {k*8+j : j<=k%3} and consumes {(k+j)*8+1 : j<=k%4}; with orders
    {3,4,5,8,9,10}, receipt 9 is the only one whose inputs are all
    produced, 3/5/10 are blocked (1,1,2 missing), 4 and 8 have no
    inputs so don't appear in the readiness relation at all."""
    from near_indexer_for_explorer_spark.plans.relational import (
        receipt_data_edges,
        receipt_data_readiness,
    )

    rows = [
        (3, 103, "A"),
        (4, 104, "A"),
        (5, 105, "B"),
        (8, 108, "B"),
        (9, 109, "B"),
        (10, 110, "B"),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    edges = receipt_data_edges(spark, str(tmp_path)).collect()
    outs = {(r["data_id"], r["receipt_id"], r["receiver_id"])
            for r in edges if r["kind"] == "output"}
    ins = {(r["data_id"], r["receipt_id"]) for r in edges if r["kind"] == "input"}
    assert outs == {(33, 4, 104), (41, 5, 105), (42, 5, 105),
                    (65, 8, 108), (66, 8, 108), (81, 10, 110)}
    assert ins == {(33, 3), (41, 3), (49, 3), (49, 5), (81, 9), (89, 10), (97, 10)}
    assert all(r["receiver_id"] is None for r in edges if r["kind"] == "input")
    assert len(edges) == 13

    ready = {r["o_orderpriority"]: r
             for r in receipt_data_readiness(spark, str(tmp_path)).collect()}
    assert set(ready) == {"A", "B"}
    a, b = ready["A"], ready["B"]
    assert (a["n_receipts"], a["n_ready"], a["n_blocked"], a["n_missing_inputs"]) == (1, 0, 1, 1)
    assert (b["n_receipts"], b["n_ready"], b["n_blocked"], b["n_missing_inputs"]) == (3, 1, 2, 3)


def test_reason_kind_planted_violation_and_evolution(spark, tmp_path):
    """A60/A111 semantics: an unmapped cause ('bogus' event_type) is a
    domain_events_reason_kind violation (the enum-cast-failure case);
    error-cause changes BEFORE the evolution cutoff carry the
    pre-migration catch-all, and the ALTER-TYPE-added values
    (MIGRATION/RESHARDING) first appear at/after the cutoff."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        account_changes_by_reason,
        data_quality_report,
    )

    def d(day):
        return dt.datetime(2024, 1, day)

    spark.createDataFrame([(1,)], "c_custkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 1, "O")], "o_orderkey long, o_custkey long, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1.0, "N", "O")],
        "l_orderkey long, l_quantity double, l_returnflag string, l_linestatus string",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    events = [
        (2, 10, "error", d(10), 5.0),     # pre-cutoff -> RECEIPT_PROCESSING
        (4, 10, "error", d(20), 5.0),     # post, even -> MIGRATION
        (5, 11, "error", d(21), 5.0),     # post, odd  -> RESHARDING
        (6, 11, "purchase", d(5), 7.0),   # even -> TRANSACTION_PROCESSING
        (7, 12, "bogus", d(5), 1.0),      # unmapped -> NULL reason
    ]
    spark.createDataFrame(
        events,
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    dq = {r["constraint_name"]: r
          for r in data_quality_report(spark, str(tmp_path)).collect()}
    rk = dq["domain_events_reason_kind"]
    assert rk["n_checked"] == 5 and rk["n_violations"] == 1 and not rk["ok"]

    roll = {r["reason_kind"]: r
            for r in account_changes_by_reason(spark, str(tmp_path)).collect()}
    assert set(roll) == {"RECEIPT_PROCESSING", "MIGRATION", "RESHARDING",
                         "TRANSACTION_PROCESSING"}
    assert roll["RECEIPT_PROCESSING"]["first_day"] == dt.date(2024, 1, 10)
    assert roll["MIGRATION"]["first_day"] == dt.date(2024, 1, 20)
    assert roll["RESHARDING"]["first_day"] == dt.date(2024, 1, 21)
    assert roll["MIGRATION"]["n_changes"] == 1
    assert roll["TRANSACTION_PROCESSING"]["total_value"] == 7.0


def test_boilerplate_segments_planted(spark, tmp_path):
    """B110 semantics: a 4-token segment shared VERBATIM by 3 docs
    (df >= _BLP_MIN_DF) is boilerplate and its tokens drop; a segment
    in only 2 docs survives; a short tail segment counts its real
    token count."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        boilerplate_segments,
    )

    banner = "all rights reserved worldwide"      # planted boilerplate
    pair = "only two docs share"                  # df=2 -> kept
    rows = [
        (1, f"{banner} unique alpha words here tail"),
        (2, f"{banner} other beta tokens going by"),
        (3, f"{banner} third gamma phrasing entirely new"),
        (4, f"{pair} something else entirely for four"),
        (5, f"{pair} yet another distinct tail five"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = {r["doc_id"]: r
           for r in boilerplate_segments(spark, str(tmp_path)).collect()}
    # doc 1: 9 tokens -> segments [banner][unique alpha words here][tail]
    d1 = out[1]
    assert d1["n_segments"] == 3 and d1["n_tokens"] == 9
    assert d1["n_boiler_segments"] == 1           # only the banner
    assert d1["n_tokens_kept"] == 5               # 4 + 1-token tail
    assert d1["keep_ratio"] == round(5 / 9, 6)
    # docs 4/5: the pair segment has df=2 < 3 -> everything kept
    for d in (4, 5):
        assert out[d]["n_boiler_segments"] == 0
        assert out[d]["keep_ratio"] == 1.0
    # every doc sharing the banner lost exactly 4 tokens
    for d in (2, 3):
        assert out[d]["n_tokens"] - out[d]["n_tokens_kept"] == 4


def test_gopher_filter_planted_rule_isolation(spark, tmp_path):
    """B111 semantics: each planted doc violates exactly the targeted
    Gopher rule; the unknown-lang doc passes the stopword floor by
    definition (no vocabulary to check against)."""
    import itertools
    import string

    from near_indexer_for_explorer_spark.operators.textops import (
        quality_filter_gopher,
    )

    four = [
        a + b + "xy"
        for a, b in itertools.product(string.ascii_lowercase, repeat=2)
    ]
    two = [a + b for a, b in itertools.product(string.ascii_lowercase, repeat=2)]
    nums = [str(1000 + i) for i in range(15)]
    docs = [
        (0, " ".join(four[:18] + ["the", "and"]), "s", "en"),  # clean
        (1, " ".join(four[:3] + ["the", "and"]), "s", "en"),   # too few words
        (2, " ".join(four[:18] + ["the", "and", "#", "#", "#"]), "s", "en"),
        (3, " ".join(nums + four[:3] + ["the", "and"]), "s", "en"),  # numeric
        (4, " ".join(four[:20]), "s", "en"),                   # no stopwords
        (5, " ".join(four[:20]), "s", "xx"),                   # unknown lang
        (6, " ".join(two[:12]), "s", "xx"),                    # short words
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in quality_filter_gopher(spark, str(tmp_path)).collect()
    }
    flags = [
        "ok_n_words",
        "ok_mean_word_len",
        "ok_alpha_words",
        "ok_symbol_ratio",
        "ok_distinct_stops",
    ]

    def failed(doc_id):
        return [f for f in flags if not out[doc_id][f]]

    assert out[0]["kept"] and failed(0) == []
    assert failed(1) == ["ok_n_words"]
    assert failed(2) == ["ok_symbol_ratio"]
    assert failed(3) == ["ok_alpha_words"]
    assert failed(4) == ["ok_distinct_stops"]
    assert out[5]["kept"] and out[5]["n_distinct_stops"] is None
    assert failed(6) == ["ok_mean_word_len"]
    assert abs(out[6]["mean_word_len"] - 2.0) < 1e-12


def test_lang_id_margin_planted_buckets(spark, tmp_path):
    """B112 semantics: the four confidence buckets are pinned by
    exact stopword-score arithmetic — unambiguous evidence is
    'strong', a tie is 'ambiguous', a sub-half margin is 'weak', and
    zero evidence is 'none' with an 'unknown' prediction."""
    from near_indexer_for_explorer_spark.operators.textops import (
        lang_id_margin,
    )

    docs = [
        (0, "the of and wxyz qrst", "s", "en"),   # en 3-0: strong
        (1, "wxyz qrst mnop", "s", "en"),          # 0-0: none
        (2, "the der wxyz", "s", "en"),            # en 1 = de 1: ambiguous
        (3, "the of and der und", "s", "en"),      # en 3, de 2: weak
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r for r in lang_id_margin(spark, str(tmp_path)).collect()
    }
    assert out[0]["confidence"] == "strong" and out[0]["lang_pred"] == "en"
    assert abs(out[0]["margin_ratio"] - 1.0) < 1e-12
    assert out[1]["confidence"] == "none" and out[1]["lang_pred"] == "unknown"
    assert out[1]["margin_ratio"] is None
    assert out[2]["confidence"] == "ambiguous" and out[2]["lang_pred"] == "en"
    assert out[2]["margin"] == 0
    assert out[3]["confidence"] == "weak" and out[3]["margin"] == 1
    assert abs(out[3]["margin_ratio"] - 1.0 / 3.0) < 1e-12


def test_pii_incidence_planted_per_source(spark, tmp_path):
    """B113 semantics: each PII family is counted independently per
    source; a clean source reports zero exposure."""
    from near_indexer_for_explorer_spark.operators.textops import (
        pii_incidence_by_source,
    )

    docs = [
        (0, "contact bob@example.com and sue@example.com today", "web", "en"),
        (1, "see https://example.com/page for details", "web", "en"),
        (2, "server at 10.0.0.1 and 192.168.1.1 plus +4915123456", "web", "en"),
        (3, "call 555-123-4567 now", "web", "en"),
        (4, "perfectly clean prose with no identifiers", "web", "en"),
        (5, "also clean text here", "book", "en"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["source"]: r
        for r in pii_incidence_by_source(spark, str(tmp_path)).collect()
    }
    web = out["web"]
    assert web["n_docs"] == 5 and web["docs_with_pii"] == 4
    assert web["n_emails"] == 2 and web["docs_with_email"] == 1
    assert web["n_urls"] == 1 and web["docs_with_url"] == 1
    assert web["n_ipv4"] == 2 and web["docs_with_ipv4"] == 1
    assert web["n_phones"] == 2 and web["docs_with_phone"] == 2
    assert abs(web["pii_doc_rate"] - 0.8) < 1e-12
    book = out["book"]
    assert book["docs_with_pii"] == 0 and book["pii_doc_rate"] == 0.0


def test_token_fertility_planted_exact_ratios(spark, tmp_path):
    """B114 semantics: fertility is the exact corpus-sum ratio of
    BPE-ish lexer tokens to whitespace words per (lang, source)."""
    from near_indexer_for_explorer_spark.operators.textops import (
        token_fertility_by_lang,
    )

    docs = [
        (0, "ab cd", "web", "en"),      # ws 2, bpe 2, chars 5
        (1, "a1 b2", "web", "en"),      # ws 2, bpe 4, chars 5
        (2, "hello world", "web", "de"),  # ws 2, bpe 2, chars 11
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        (r["lang"], r["source"]): r
        for r in token_fertility_by_lang(spark, str(tmp_path)).collect()
    }
    en = out[("en", "web")]
    assert en["n_docs"] == 2
    assert en["ws_tokens"] == 4 and en["bpe_ish_tokens"] == 6
    assert en["n_chars"] == 10
    assert abs(en["fertility"] - 1.5) < 1e-12
    assert abs(en["chars_per_word"] - 2.5) < 1e-12
    de = out[("de", "web")]
    assert de["ws_tokens"] == 2 and abs(de["fertility"] - 1.0) < 1e-12


def test_kmeans_elbow_planted_clusters(spark, tmp_path):
    """B115 semantics: on four well-separated planted clusters the
    elbow is at k=4 — inertia collapses from k=2 to k=4, k=4 uses all
    four lists at perfect balance, and larger k cannot make the fit
    worse on this geometry."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        kmeans_elbow_curve,
    )

    # 4 clusters x 5 vectors in 8-D; ids multiples of 5 so every vector
    # is in the deterministic train sample; ids interleave clusters so
    # the first-k seeds at k=4 start one-per-cluster.
    rows = []
    for i in range(20):
        c = i % 4
        base = [10.0 * (1 if j == 2 * c else 0) for j in range(8)]
        jit = [
            (_h.md5(f"e{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 0.2
            for j in range(8)
        ]
        rows.append((5 * i, [float(b + g) for b, g in zip(base, jit)], c))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r["k"]: r for r in kmeans_elbow_curve(spark, str(tmp_path)).collect()}
    assert set(out) == {2, 4, 8, 16}
    assert all(r["n_vectors"] == 20 for r in out.values())
    assert out[4]["n_lists_used"] == 4
    assert abs(out[4]["max_share"] - 0.25) < 1e-12
    assert out[4]["inertia"] < out[2]["inertia"] / 10
    assert out[16]["inertia"] <= out[4]["inertia"] + 1e-9
    for r in out.values():
        assert r["n_lists_used"] <= r["k"]
        assert abs(
            r["mean_sq_dist"] - round(r["inertia"] / r["n_vectors"], 6)
        ) < 1e-6


def test_quality_rules_agreement_planted_cells(spark, tmp_path):
    """B116 semantics: each confusion cell is pinned by a planted doc
    engineered to pass/fail exactly one family's rules."""
    import itertools
    import string

    from near_indexer_for_explorer_spark.operators.textops import (
        quality_rules_agreement,
    )

    four = [
        a + b + "xy"
        for a, b in itertools.product(string.ascii_lowercase, repeat=2)
    ]
    # C4 kept needs 25..95 words, mean 3..10, stop_frac >= 0.05, low
    # 2-gram repetition; Gopher kept needs 10..80 words, mean 3..10,
    # alpha >= 0.8, symbols <= 1/10 words, >= 2 distinct stops.
    both = " ".join(four[:28] + ["the", "and"])              # 30 words
    c4_only = " ".join(
        four[:84] + ["the", "and", "of", "to", "is", "in"]
    )  # 90 words (>80 fails gopher; stop_frac 6/90 passes c4)
    gp_only = " ".join(four[28:40] + ["the", "and"])         # 14 words (<25 c4)
    neither = " ".join(four[:5])                              # 5 words, no stops
    docs = [
        (0, both, "web", "en"),
        (1, c4_only, "web", "en"),
        (2, gp_only, "web", "en"),
        (3, neither, "web", "en"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["source"]: r
        for r in quality_rules_agreement(spark, str(tmp_path)).collect()
    }
    web = out["web"]
    assert web["n_docs"] == 4
    assert web["kept_both"] == 1
    assert web["kept_c4_only"] == 1
    assert web["kept_gopher_only"] == 1
    assert web["dropped_both"] == 1
    assert abs(web["agree_rate"] - 0.5) < 1e-12
    assert abs(web["kept_jaccard"] - 1.0 / 3.0) < 1e-12


def test_frozen_reports_match_fresh_computation(spark, sf_dir):
    """The r8 frozen-serving claim, pinned: every report that reads a
    session-frozen artifact is bit-identical to computing the same
    relation fresh (the builds are deterministic, so serving from the
    memo can never change a result — the invariant that keeps the
    composed oracles valid verbatim)."""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.operators.similarity import (
        _IVF_ITERS,
        _IVF_K,
        _kmeans_centroids,
        _train_mod,
        _vectors,
        ivf_assignments,
        ivf_list_balance,
    )
    from near_indexer_for_explorer_spark.operators.textops import (
        borderline_docs,
        quality_filter_columns,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    # borderline_docs (frozen B25 metrics) vs the fresh projection
    frozen_rows = sorted(
        tuple(r) for r in borderline_docs(spark, sf_dir).collect()
    )
    cols = quality_filter_columns(load_table(spark, sf_dir, "documents"))
    n_failed = (
        (~F.col("ok_n_words")).cast("int")
        + (~F.col("ok_mean_word_len")).cast("int")
        + (~F.col("ok_stopwords")).cast("int")
        + (~F.col("ok_repetition")).cast("int")
    )
    failed_rule = (
        F.when(~F.col("ok_n_words"), "n_words")
        .when(~F.col("ok_mean_word_len"), "mean_word_len")
        .when(~F.col("ok_stopwords"), "stopwords")
        .otherwise("repetition")
    )
    fresh = cols.where(n_failed == 1).select(
        "doc_id",
        "lang",
        failed_rule.alias("failed_rule"),
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("stop_frac", 6).alias("stop_frac"),
        F.round("dup_frac_2gram", 6).alias("dup_frac_2gram"),
    )
    assert frozen_rows == sorted(tuple(r) for r in fresh.collect())
    assert len(frozen_rows) > 0

    # ivf_list_balance (frozen assignments) vs a fresh train+assign
    frozen_sizes = sorted(
        (r["centroid_id"], r["list_size"])
        for r in ivf_list_balance(spark, sf_dir).collect()
    )
    e = _vectors(spark, sf_dir)
    train = e.where(F.col("vec_id") % _train_mod(sf_dir) == 0)
    cents = _kmeans_centroids(
        train.select("vec_id", "emb"), _IVF_K, _IVF_ITERS
    )
    fresh_sizes = sorted(
        (r["centroid_id"], r["n"])
        for r in ivf_assignments(e.select("vec_id", "emb"), cents)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    assert frozen_sizes == fresh_sizes and len(frozen_sizes) > 0


def test_gated_percentiles_array_equals_scalars(spark, sf_dir):
    """gated_percentiles(col, fracs) must return exactly the values of
    the per-fraction gated_percentile calls on BOTH gate branches —
    the single-buffer rewrite is a physical change only."""
    from pyspark.sql import functions as F  # noqa: F401

    from near_indexer_for_explorer_spark.functions.percentiles import (
        gated_percentile,
        gated_percentiles,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    fracs = [0.1, 0.5, 0.9, 0.99]
    for exact in (True, False):
        row = ev.groupBy("event_type").agg(
            gated_percentiles("value", fracs, exact).alias("arr"),
            *[
                gated_percentile("value", f, exact).alias(f"s{i}")
                for i, f in enumerate(fracs)
            ],
        ).collect()
        assert row
        for r in row:
            for i in range(len(fracs)):
                assert r["arr"][i] == r[f"s{i}"], (r["arr"][i], r[f"s{i}"])


def test_mixture_epoch_plan_planted_tail_repeats(spark, tmp_path):
    """B117 semantics: with a 90/10 char split and alpha=0.5 the tail
    source samples at p~=0.75/0.25, so at a 1x-corpus budget the tail
    repeats ~2.5 epochs while the head stays under one epoch; at 4x
    both repeat."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        mixture_epoch_plan,
    )

    words = [f"w{i:03d}" for i in range(100)]
    docs = []
    for d in range(9):  # head: 9 docs x 10 four-char tokens
        docs.append((d, " ".join(words[d * 10:(d + 1) * 10]), "head", "en"))
    docs.append((9, " ".join(words[90:100]), "tail", "en"))
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        (r["budget_x"], r["source"]): r
        for r in mixture_epoch_plan(spark, str(tmp_path)).collect()
    }
    assert len(out) == 8  # 2 sources x 4 budget multiples
    one_tail = out[(1.0, "tail")]
    one_head = out[(1.0, "head")]
    assert one_tail["budget_tokens"] == 100
    assert one_tail["source_tokens"] == 10
    assert abs(one_tail["p_sampled"] - 0.25) < 1e-3
    assert 2.4 <= one_tail["epochs"] <= 2.6 and one_tail["repeated"]
    assert abs(one_head["p_sampled"] - 0.75) < 1e-3
    assert 0.80 <= one_head["epochs"] <= 0.85 and not one_head["repeated"]
    four_head = out[(4.0, "head")]
    # head alloc at 4x = 0.75 * 400 = 300 tokens over a 90-token supply
    assert four_head["repeated"] and 3.2 <= four_head["epochs"] <= 3.5


def test_lognormal_fit_planted_uniform_and_spread(spark, tmp_path):
    """B118 semantics: a constant-length source fits exactly (sigma 0,
    zero tail gap); a two-point spread source reproduces the moment
    fit computed by hand in log space."""
    import math

    from near_indexer_for_explorer_spark.operators.textops import (
        doc_length_lognormal_fit,
    )

    docs = [(i, "x", "uniform", "en", 500) for i in range(10)]
    docs += [
        (100 + i, "x", "spread", "en", 100 if i < 10 else 10000)
        for i in range(20)
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, source string, lang string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["source"]: r
        for r in doc_length_lognormal_fit(spark, str(tmp_path)).collect()
    }
    uni = out["uniform"]
    # sigma carries ~1e-5 catastrophic-cancellation residue from the
    # two-sums variance (identical in both engines — the oracle hashes
    # it); the semantic claim is "no spread", not bitwise zero
    assert uni["sigma_log"] < 1e-4
    assert abs(uni["mu_log"] - round(math.log(500), 6)) < 1e-9
    assert abs(uni["fitted_p90_log"] - uni["mu_log"]) < 1e-4
    assert uni["emp_p90"] == 500.0
    assert abs(uni["p90_log_gap"]) < 1e-4

    sp = out["spread"]
    lo, hi = round(math.log(100), 6), round(math.log(10000), 6)
    mu = (lo + hi) / 2
    sigma = (hi - lo) / 2
    assert abs(sp["mu_log"] - round(mu, 6)) < 1e-6
    assert abs(sp["sigma_log"] - round(sigma, 6)) < 1e-6
    assert abs(sp["fitted_p90_log"] - round(mu + 1.281552 * sigma, 6)) < 1e-6
    assert sp["emp_p90"] == 10000.0
    assert abs(
        sp["p90_log_gap"]
        - round(round(mu + 1.281552 * sigma, 6) - hi, 6)
    ) < 1e-6


def test_embedding_dim_stats_planted_dead_and_biased(spark, tmp_path):
    """B119 semantics: a planted all-zero dimension reads is_dead with
    zero variance share; a planted constant-offset dimension reads a
    large mean_bias; healthy dimensions read neither."""
    import hashlib as _h

    from near_indexer_for_explorer_spark.operators.similarity import (
        embedding_dim_stats,
    )

    rows = []
    for i in range(50):
        v = [
            (_h.md5(f"d{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 0.4
            for j in range(8)
        ]
        v[3] = 0.0                      # dead dim
        v[5] = 2.0 + v[5] * 0.01        # huge offset, tiny spread
        rows.append((i, [float(x) for x in v], i % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r["dim"]: r for r in embedding_dim_stats(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(8))
    assert all(r["n_vecs"] == 50 for r in out.values())
    dead = out[3]
    assert dead["is_dead"] and dead["variance"] == 0.0
    assert dead["var_share"] == 0.0 and dead["mean_bias"] is None
    biased = out[5]
    assert not biased["is_dead"]
    assert biased["mean_bias"] > 100  # ~2.0 offset over ~0.002 sd
    healthy = out[0]
    assert not healthy["is_dead"] and healthy["mean_bias"] < 1
    assert abs(sum(r["var_share"] for r in out.values()) - 1.0) < 1e-3


def test_ivf_train_mod_caps_training_sample(spark, sf_dir, monkeypatch):
    """r9 scale fix (r8 verdict #2): the k-means training-sample
    modulus is derived from the corpus rowcount, so the training set
    plateaus at ~_IVF_TRAIN_CAP rows instead of staying a constant
    fraction of the corpus.  Pure-function bounds first, then the
    capped branch end-to-end: with the cap monkeypatched down, the
    registered quantizer chain must train on the LARGER modulus (the
    plan picks up the derived value, not a baked constant)."""
    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.operators import similarity as sim

    # floor at test scale: every historical oracle value is unchanged
    assert sim.ivf_train_mod(500) == 5
    assert sim.ivf_train_mod(5 * sim._IVF_TRAIN_CAP) == 5
    # the cap binds past the floor: training rows ~= _IVF_TRAIN_CAP
    assert sim.ivf_train_mod(10**9) == 10**9 // sim._IVF_TRAIN_CAP
    rows = 10**9
    mod = sim.ivf_train_mod(rows)
    assert rows // mod <= sim._IVF_TRAIN_CAP
    assert rows // mod >= sim._IVF_TRAIN_CAP // 2

    # capped branch e2e: 500 vectors, cap 50 -> mod 10 (not the floor 5)
    monkeypatch.setattr(sim, "_IVF_TRAIN_CAP", 50)
    assert sim._train_mod(sf_dir) == 10
    e = sim._vectors(spark, sf_dir)
    expected = sim._kmeans_centroids(
        e.where(F.col("vec_id") % 10 == 0).select("vec_id", "emb"),
        sim._IVF_K,
        sim._IVF_ITERS,
    )
    got = sim._topic_centroids(spark, sf_dir)
    exp_rows = sorted(
        (r["centroid_id"], tuple(r["c_emb"])) for r in expected.collect()
    )
    got_rows = sorted(
        (r["centroid_id"], tuple(r["c_emb"])) for r in got.collect()
    )
    assert got_rows == exp_rows and len(got_rows) == sim._IVF_K


def test_png_codec_real_decode_filters_and_kernel(spark):
    """r9 (r8 verdict #5): the REAL pixel path runs UN-GATED in this
    sandbox — stdlib PNG decode (zlib inflate + unfilter) pinned
    against hand-computed bytes for every filter type, then driven
    through the same Arrow decode kernel in Spark."""
    import struct
    import zlib

    from near_indexer_for_explorer_spark.multimodal.decode import (
        DECODE_SCHEMA,
        _png_codec,
        make_decode_kernel,
    )

    encode_gray, decode_pixels = _png_codec()

    # roundtrip: encode is lossless up to zero padding
    data = bytes(range(1, 70))  # 69 bytes -> 32x3 grid, 27 pad zeros
    w, h, px = decode_pixels(encode_gray(data, 32))
    assert (w, h) == (32, 3)
    assert bytes(px[:69]) == data and set(px[69:]) == {0}

    # hand-built 3x3 grayscale exercising filters 1 (sub), 2 (up),
    # 4 (paeth).  Reconstruction math done by hand:
    #   row0 sub:   [10, +5, +5]          -> 10, 15, 20
    #   row1 up:    [+1, +1, +1]          -> 11, 16, 21
    #   row2 paeth: [+2, +2, +2] with predictors a/b/c ->
    #     px0: p=b=11 -> 13; px1: a=13,b=16,c=11, p=18 -> pc=7,pa=5,pb=2
    #          -> pred=b=16 -> 18; px2: a=18,b=21,c=16, p=23 -> pred=b=21
    #          -> 23
    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = bytes([1, 10, 5, 5]) + bytes([2, 1, 1, 1]) + bytes([4, 2, 2, 2])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, px = decode_pixels(png)
    assert (w, h, px) == (3, 3, [10, 15, 20, 11, 16, 21, 13, 18, 23])

    # RGB with filter 3 (average): row0 avg over zero priors is
    # cumulative left/2 per channel; hand math:
    #   bytes [3, 10, 20, 30, 100, 110, 120]? -> keep it 2 px wide:
    #   row0: [3, 8, 6, 4, 10, 11, 12]
    #     px0: a=0,b=0 -> 8,6,4 ; px1: a=(8,6,4) -> 10+4=14, 11+3=14,
    #          12+2=14
    raw_rgb = bytes([3, 8, 6, 4, 10, 11, 12])
    png_rgb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw_rgb))
        + chunk(b"IEND", b"")
    )
    w, h, px = decode_pixels(png_rgb)
    assert (w, h, px) == (2, 1, [8, 6, 4, 14, 14, 14])

    # the same decoder through the Arrow kernel in Spark: real PNG
    # payloads, 'png' backend, pixel means exact
    rows = [(1, encode_gray(bytes([100, 200]), 2)), (2, png)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in df.mapInPandas(
            make_decode_kernel("png"), schema=DECODE_SCHEMA
        ).collect()
    }
    assert got[1]["decode_backend"] == "png"
    assert got[1]["fake_mean_byte"] == 150.0
    assert got[2]["fake_mean_byte"] == sum(
        [10, 15, 20, 11, 16, 21, 13, 18, 23]
    ) / 9
    assert got[1]["header_u32"] == int.from_bytes(b"\x89PNG", "big")


def test_wav_codec_real_decode_and_roundtrip(spark):
    """The audio twin of the PNG test: stdlib RIFF/PCM decode pinned
    against hand-built WAV bytes (8-bit and 16-bit branches, extra
    chunk skipped, word-aligned odd chunk), then the roundtrip kernel
    through Spark."""
    import struct

    from near_indexer_for_explorer_spark.multimodal.decode import (
        WAV_ROUNDTRIP_SCHEMA,
        _wav_codec,
        make_wav_roundtrip_kernel,
    )

    encode_pcm16, decode_samples = _wav_codec()

    # roundtrip: u8 -> s16 widening is exact
    sr, nch, bits, samples = decode_samples(encode_pcm16(bytes([0, 128, 255])))
    assert (sr, nch, bits) == (8000, 1, 16)
    assert samples == [(-128) << 8, 0, 127 << 8]

    # hand-built 8-bit stereo WAV with a skipped odd-length LIST chunk
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 2, 2, 8)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc" + b"\0"  # word-aligned
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + bytes([10, 20, 30, 40])
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_samples(wav) == (44100, 2, 8, [10, 20, 30, 40])

    # the kernel through Spark: exact sums per the u8->s16 identity
    df = spark.createDataFrame(
        [(7, bytes([1, 2, 3, 4]))], "doc_id long, payload binary"
    )
    (row,) = df.mapInPandas(
        make_wav_roundtrip_kernel(), schema=WAV_ROUNDTRIP_SCHEMA
    ).collect()
    assert row["n_samples"] == 4
    assert row["samples_sum"] == (1 + 2 + 3 + 4 - 128 * 4) * 256
    assert row["decode_backend"] == "wav" and row["bits"] == 16


def test_image_dhash_hand_computed_and_pairs(spark, tmp_path):
    """dHash over REAL decoded pixels, pinned by hand: a monotone
    non-increasing byte ramp sets every gradient bit (all 7 sample
    rows read the single 32-wide scanline), a non-decreasing ramp sets
    none, and the banded pair query finds exactly the identical pair
    at hamming 0 while the opposite ramp stays out (hamming 56 > 10)."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        multimodal_image_dhash,
        multimodal_image_dhash_pairs,
    )

    down = "".join(chr(0x7A - i) for i in range(32))   # strictly decreasing
    up = "".join(chr(0x20 + i) for i in range(32))     # strictly increasing
    rows = [
        (1, down, "en", "web", 32),
        (2, down, "en", "web", 32),   # identical image -> hamming 0
        (3, up, "en", "web", 32),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: (r["dhash"], r["bits_set"])
        for r in multimodal_image_dhash(spark, str(tmp_path)).collect()
    }
    assert got[1] == ((1 << 56) - 1, 56)   # every comparison fires
    assert got[2] == got[1]
    assert got[3] == (0, 0)                # no gradient ever decreases

    pairs = {
        (r["doc_id_1"], r["doc_id_2"]): r["hamming"]
        for r in multimodal_image_dhash_pairs(spark, str(tmp_path)).collect()
    }
    assert pairs == {(1, 2): 0}


def test_audio_energy_hand_computed(spark):
    """Real WAV roundtrip -> energy/ZC features pinned by hand, driven
    straight through the Arrow kernel with binary payloads (bytes 128
    are 2-byte UTF-8, so text cannot express them): a constant-128
    payload decodes to all-zero samples (zero energy, no crossings);
    an alternating 127/129 payload crosses zero at every step with
    per-sample energy 256^2."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        AUDIO_ENERGY_SCHEMA,
        make_audio_energy_kernel,
    )

    rows = [(1, bytes([128] * 8)), (2, bytes([127, 129] * 4))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in df.mapInPandas(
            make_audio_energy_kernel(), schema=AUDIO_ENERGY_SCHEMA
        ).collect()
    }
    s = got[1]
    assert s["n_samples"] == 8 and s["zero_crossings"] == 0
    assert (s["e0"], s["e1"], s["e2"], s["e3"]) == (0, 0, 0, 0)
    assert s["mean_energy"] == 0.0
    a = got[2]
    # samples alternate -256, +256: every adjacent pair crosses
    assert a["zero_crossings"] == 7
    assert (a["e0"], a["e1"], a["e2"], a["e3"]) == (2 * 256**2,) * 4
    assert a["mean_energy"] == 256.0**2


def test_documents_corpus_is_ascii():
    """r9 advice: the real-codec oracles (PNG/WAV roundtrip, dHash,
    audio energy) equate unicode(substr(text, i, 1)) with byte i of
    encode(text) — valid only while every document character is
    single-byte.  Assert the precondition over EVERY shipped SF so a
    non-ASCII regeneration fails loudly here instead of silently
    hash-diverging Spark (UTF-8 bytes) from DuckDB (codepoints)."""
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        (n_bad,) = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()
        assert n_bad == 0, f"{sf}: {n_bad} non-single-byte documents"


def test_png_decode_bounded_inflate():
    """r9 advice: decode_pixels inflates at most the byte count the
    IHDR promises — a crafted deflate bomb (tiny payload, ~1000x
    expansion) and a truncated IDAT both fail with a ValueError
    instead of allocating unbounded executor memory."""
    import struct
    import zlib

    import pytest

    from near_indexer_for_explorer_spark.multimodal.decode import _png_codec

    encode_gray, decode_pixels = _png_codec()

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    def png_of(w, h, raw):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    # bomb: IHDR says 2x2 gray (expects 6 raw bytes) but the IDAT
    # inflates to 1 MB
    with pytest.raises(ValueError, match="exceeds IHDR"):
        decode_pixels(png_of(2, 2, b"\0" * 1_000_000))
    # truncated: IHDR promises 100x100 but only 10 raw bytes exist
    with pytest.raises(ValueError, match="promises"):
        decode_pixels(png_of(100, 100, b"\0" * 10))
    # zero dims rejected before any allocation
    with pytest.raises(ValueError, match="non-positive"):
        decode_pixels(png_of(0, 4, b""))
    # the happy path is unchanged: exact roundtrip
    w, h, px = decode_pixels(encode_gray(bytes(range(64)), 32))
    assert (w, h) == (32, 2) and bytes(px) == bytes(range(64))


def test_forecast_backtest_planted_series(spark, tmp_path):
    """A112 semantics on a hand-built series: type 'w' repeats weekly
    exactly (seasonal MAE 0, skill 1, seasonal wins); type 'c' is
    constant (both MAEs 0, skill NULL, seasonal does NOT win)."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        events_forecast_backtest,
    )

    rows = []
    eid = 0
    base = dt.datetime(1995, 1, 2)
    for day in range(21):
        d = base + dt.timedelta(days=day)
        # weekly pattern: count = 1 + (weekday index), repeats exactly
        for _ in range(1 + day % 7):
            rows.append((eid, d, 1, "w", 1.0, "{}"))
            eid += 1
        # constant: 2 events every day
        for _ in range(2):
            rows.append((eid, d, 2, "c", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: r
        for r in events_forecast_backtest(spark, str(tmp_path)).collect()
    }
    w = got["w"]
    assert w["n_days"] == 14  # days 7..20 have both d-7 and d-1
    assert w["mae_seasonal"] == 0.0 and w["mape_seasonal"] == 0.0
    assert w["skill"] == 1.0 and w["seasonal_wins"]
    assert w["mae_naive"] > 0.0
    c = got["c"]
    assert c["mae_seasonal"] == 0.0 and c["mae_naive"] == 0.0
    assert c["skill"] is None and not c["seasonal_wins"]


def test_srm_check_planted_mismatch(spark, tmp_path):
    """A113 semantics: a balanced day passes (chi2 0), a 90/10 day
    flags; chi2 equals the closed form (n_a-n_b)^2/n."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        events_srm_check,
    )

    rows = []
    eid = 0
    d1, d2 = dt.datetime(1995, 1, 1), dt.datetime(1995, 1, 2)
    for i in range(100):  # day 1: 50 even / 50 odd users
        rows.append((eid, d1, i, "t", 1.0, "{}")); eid += 1
    for i in range(100):  # day 2: 90 even / 10 odd
        uid = 2 * i if i < 90 else 2 * i + 1
        rows.append((eid, d2, uid, "t", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        str(r["event_date"]): r
        for r in events_srm_check(spark, str(tmp_path)).collect()
    }
    ok = got["1995-01-01"]
    assert (ok["n_a"], ok["n_b"], ok["chi2"], ok["srm_flag"]) == (
        50, 50, 0.0, False,
    )
    bad = got["1995-01-02"]
    assert (bad["n_a"], bad["n_b"]) == (90, 10)
    assert bad["chi2"] == 64.0  # (90-10)^2 / 200
    assert bad["srm_flag"]


def test_winsorized_clamps_planted_outlier(spark, tmp_path):
    """A114 semantics: one huge outlier among 100 values moves the raw
    mean but barely moves the winsorized mean, and is counted in
    n_clipped_high."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        events_value_winsorized,
    )

    base = dt.datetime(1995, 1, 1)
    rows = [(i, base, i, "t", 10.0, "{}") for i in range(99)]
    rows.append((99, base, 99, "t", 1_000_000.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    (r,) = events_value_winsorized(spark, str(tmp_path)).collect()
    assert r["n_events"] == 100
    assert r["n_clipped_high"] == 1 and r["n_clipped_low"] == 0
    assert r["raw_mean"] > 10_000
    # clamp bound hi = p95 interpolated within the 10.0 mass = 10.0
    assert r["winsorized_mean"] == 10.0


def test_scrub_effectiveness_planted_residuals(spark, tmp_path):
    """B126 semantics: emails/URLs are fully removed (rates 1.0),
    phones/IPv4 survive the scrub and are reported as residuals."""
    from near_indexer_for_explorer_spark.operators.textops import (
        scrub_effectiveness,
    )

    docs = [
        (0, "contact me at bob@example.com or https://ex.org/x now", "en", "s0", 50),
        (1, "call 555-123-4567 or ping 10.0.0.1 today", "en", "s0", 40),
        (2, "clean text with nothing sensitive at all", "en", "s1", 40),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r
        for r in scrub_effectiveness(spark, str(tmp_path)).collect()
    }
    s0 = got["s0"]
    assert s0["n_pre_emails"] == 1 and s0["n_res_emails"] == 0
    assert s0["n_pre_urls"] == 1 and s0["n_res_urls"] == 0
    assert s0["email_removal_rate"] == 1.0 and s0["url_removal_rate"] == 1.0
    assert s0["n_res_phones"] == 1 and s0["n_res_ipv4"] == 1
    assert s0["docs_with_residual"] == 1
    s1 = got["s1"]
    assert s1["docs_with_residual"] == 0
    assert s1["email_removal_rate"] is None  # no PII to remove


def test_char_entropy_planted_extremes(spark, tmp_path):
    """B127 semantics: a single-character run has entropy 0 and a
    4-char cycle ln(4) — both repetitive enough to flag at length >=
    50; a 16-char uniform cycle (ln 16 > 2 nats) passes, and short
    docs never flag regardless of entropy."""
    import math
    import string

    from near_indexer_for_explorer_spark.operators.textops import (
        doc_char_entropy,
    )

    docs = [
        (0, "a" * 100, "en", "s0", 100),
        (1, "abcd" * 25, "en", "s0", 100),
        (2, "ab", "en", "s0", 2),
        (3, string.ascii_lowercase[:16] * 8, "en", "s0", 128),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in doc_char_entropy(spark, str(tmp_path)).collect()}
    assert got[0]["char_entropy"] == 0.0 and got[0]["is_low_entropy"]
    assert abs(got[1]["char_entropy"] - math.log(4)) < 1e-6
    assert got[1]["is_low_entropy"]  # ln(4) ~ 1.386 < 2 nats
    assert got[2]["n_chars"] == 2 and not got[2]["is_low_entropy"]  # short
    assert abs(got[3]["char_entropy"] - math.log(16)) < 1e-6
    assert not got[3]["is_low_entropy"]


def test_image_histogram_hand_pinned(spark):
    """B128: histogram of a hand-built payload through the REAL PNG
    roundtrip — 3 bytes + 29 pad zeros on the 32-wide grid."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        IMAGE_HIST_SCHEMA,
        make_image_histogram_kernel,
    )

    # bytes: 0 (bin 0), 17 (bin 1), 255 (bin 15); pad 29 zeros -> bin 0
    df = spark.createDataFrame(
        [(1, bytes([0, 17, 255]))], "doc_id long, payload binary"
    )
    got = {
        r["bin"]: r
        for r in df.mapInPandas(
            make_image_histogram_kernel(), schema=IMAGE_HIST_SCHEMA
        ).collect()
    }
    assert len(got) == 16
    assert got[0]["n_px"] == 30  # the 0 byte + 29 pad pixels
    assert got[1]["n_px"] == 1 and got[15]["n_px"] == 1
    assert sum(r["n_px"] for r in got.values()) == 32
    assert got[0]["frac"] == 30 / 32


def test_audio_downsample_hand_pinned(spark):
    """B129: pairwise-average downsample of hand-built bytes through
    the REAL WAV roundtrip — exact integer outputs, odd tail dropped."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        AUDIO_DOWNSAMPLE_SCHEMA,
        make_audio_downsample_kernel,
    )

    # bytes 128,130 -> samples 0,512 -> avg 256; bytes 0,255 ->
    # samples -32768,32512 -> avg -128; byte 200 dropped (odd tail)
    df = spark.createDataFrame(
        [(1, bytes([128, 130, 0, 255, 200]))], "doc_id long, payload binary"
    )
    (r,) = df.mapInPandas(
        make_audio_downsample_kernel(), schema=AUDIO_DOWNSAMPLE_SCHEMA
    ).collect()
    assert (r["n_in"], r["n_out"]) == (5, 2)
    assert r["sum_out"] == 256 - 128
    assert r["energy_out"] == 256 * 256 + 128 * 128
    assert r["peak_abs"] == 256
    assert r["mean_out"] == (256 - 128) / 2


def test_gif_lzw_decoder_on_streams_it_did_not_write(spark):
    """B132: the GIF decoder is a REAL variable-width LZW — pinned
    against (a) a hand-packed stream exercising the KwKwK corner case,
    (b) a genuinely COMPRESSING encoder written independently in this
    test (table growth through 10/11-bit widths and a 4096-entry
    clear), and (c) the registered kernel end-to-end in Spark."""
    import struct

    from near_indexer_for_explorer_spark.multimodal.decode import (
        GIF_ROUNDTRIP_SCHEMA,
        _gif_codec,
        make_gif_roundtrip_kernel,
    )

    encode_gray_gif, decode_gif_pixels = _gif_codec()

    def pack(codes, width_bits):
        acc = n = 0
        out = bytearray()
        for c in codes:
            acc |= c << n
            n += width_bits
            while n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            out.append(acc & 0xFF)
        return bytes(out)

    def wrap(lzw, w, h, min_code=8):
        blocks = b"".join(
            bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
            for i in range(0, len(lzw), 255)
        )
        palette = b"".join(bytes([i, i, i]) for i in range(256))
        return (
            b"GIF87a"
            + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
            + palette
            + b"\x2c"
            + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([min_code])
            + blocks
            + b"\x00\x3b"
        )

    # (a) hand-derived LZW for pixels [10]*5:
    #   CLEAR, 10, 258 (KwKwK: not yet in the table), 258, EOI
    gif = wrap(pack([256, 10, 258, 258, 257], 9), 5, 1)
    w, h, px = decode_gif_pixels(gif)
    assert (w, h, px) == (5, 1, [10] * 5)

    # (b) an independent REAL compressing encoder (greedy LZW with
    # decoder-synchronized width growth and a 4096 clear)
    def real_lzw_encode(data):
        CLEAR, EOI = 256, 257
        codes = [CLEAR]
        table = {bytes([i]): i for i in range(256)}
        next_code, size, width = 258, 258, 9
        widths = []  # width used for each emitted code
        widths.append(width)  # the CLEAR itself
        first = True
        w = b""
        for b in data:
            wb = w + bytes([b])
            if wb in table:
                w = wb
                continue
            codes.append(table[w])
            widths.append(width)
            if not first:
                size += 1
                if size == (1 << width) and width < 12:
                    width += 1
            first = False
            table[wb] = next_code
            next_code += 1
            if next_code > 4096:
                codes.append(CLEAR)
                widths.append(width)
                table = {bytes([i]): i for i in range(256)}
                next_code, size, width, first = 258, 258, 9, True
            w = bytes([b])
        if w:
            codes.append(table[w])
            widths.append(width)
        codes.append(EOI)
        widths.append(width)
        acc = n = 0
        out = bytearray()
        for c, cw in zip(codes, widths):
            acc |= c << n
            n += cw
            while n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            out.append(acc & 0xFF)
        return bytes(out)

    # repetitive data compresses hard and grows the table past 512
    # entries (10-bit codes) and 1024 (11-bit)
    data = (b"abcab" * 400 + bytes(range(256)) * 4)[: 32 * 90]
    w, h, px = decode_gif_pixels(wrap(real_lzw_encode(data), 32, 90))
    assert (w, h) == (32, 90)
    assert bytes(px) == data

    # (c) the registered kernel through Spark: real GIF both ways.
    # Default config ships the numpy fast path (r13), so the kernel
    # reports 'native:gif'; clearing the registry restores the stdlib
    # prover with IDENTICAL pixel stats.
    from near_indexer_for_explorer_spark.multimodal import decode as D

    df = spark.createDataFrame(
        [(1, bytes([7, 9, 11]))], "doc_id long, payload binary"
    )
    (r,) = df.mapInPandas(
        make_gif_roundtrip_kernel(), schema=GIF_ROUNDTRIP_SCHEMA
    ).collect()
    expect = "native:gif" if "gif" in D.NATIVE_DECODERS else "gif"
    assert r["decode_backend"] == expect
    assert (r["width"], r["height"], r["n_px"]) == (32, 1, 32)
    assert r["px_sum"] == 7 + 9 + 11

    saved = dict(D.NATIVE_DECODERS)
    D.NATIVE_DECODERS.clear()
    try:
        (r2,) = df.mapInPandas(
            make_gif_roundtrip_kernel(), schema=GIF_ROUNDTRIP_SCHEMA
        ).collect()
    finally:
        D.NATIVE_DECODERS.update(saved)
    assert r2["decode_backend"] == "gif"
    assert (r2["px_sum"], r2["n_px"]) == (r["px_sum"], r["n_px"])


def test_changepoint_binseg_planted_shift(spark, tmp_path):
    """A115 semantics: a clean level shift (5/day -> 15/day at day 11)
    is localized exactly; a flat series is not flagged."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        events_changepoint_binseg,
    )

    rows = []
    eid = 0
    base = dt.datetime(1995, 1, 1)
    for day in range(20):
        d = base + dt.timedelta(days=day)
        for _ in range(5 if day < 10 else 15):
            rows.append((eid, d, 1, "shift", 1.0, "{}")); eid += 1
        for _ in range(7):
            rows.append((eid, d, 2, "flat", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: r
        for r in events_changepoint_binseg(spark, str(tmp_path)).collect()
    }
    s = got["shift"]
    assert str(s["change_day"]) == "1995-01-11"
    assert s["mu_before"] == 5.0 and s["mu_after"] == 15.0
    assert s["shift"] == 10.0 and s["is_changepoint"]
    f = got["flat"]
    assert not f["is_changepoint"] and f["gain"] == 0.0


def test_normalization_lift_planted_casefold_dups(spark, tmp_path):
    """B131 semantics: docs equal only after lower/punct/whitespace
    folding count as norm-only dups; byte-identical docs count under
    both."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_normalization_lift,
    )

    docs = [
        (0, "Hello,   World!", "en", "s0", 15),
        (1, "hello world", "en", "s0", 11),      # norm-dup of 0 only
        (2, "exact copy here", "en", "s0", 15),
        (3, "exact copy here", "en", "s0", 15),  # raw dup of 2
        (4, "a unique document", "en", "s0", 17),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    (r,) = dedup_normalization_lift(spark, str(tmp_path)).collect()
    assert r["n_docs"] == 5
    assert r["n_raw_dup"] == 2      # docs 2, 3
    assert r["n_norm_dup"] == 4     # docs 0, 1, 2, 3
    assert r["n_norm_only"] == 2    # docs 0, 1
    assert r["norm_lift_rate"] == 0.4


def test_lang_confusion_planted_labels(spark, tmp_path):
    """B130 semantics: stopword-rich docs confuse correctly; recall/
    precision are exact ratios of the planted matrix."""
    from near_indexer_for_explorer_spark.operators.textops import (
        lang_id_confusion,
    )

    docs = [
        (0, "the and of to in is was he for it", "en", "s0", 30),
        (1, "the and of to in is was she for it", "en", "s0", 30),
        (2, "der und die das ist von mit sich des auf", "de", "s0", 30),
        (3, "zz qq xx vv kk jj pp ww", "de", "s0", 20),  # no stopwords
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["lang_true"], r["lang_pred"]): r
        for r in lang_id_confusion(spark, str(tmp_path)).collect()
    }
    en = got[("en", "en")]
    assert en["n_docs"] == 2 and en["recall"] == 1.0 and en["is_correct"]
    de = got[("de", "de")]
    assert de["n_docs"] == 1 and de["recall"] == 0.5
    unk = got[("de", "unknown")]
    assert unk["n_docs"] == 1 and not unk["is_correct"]


def test_boundary_stitch_planted_split_doc(spark, tmp_path):
    """B133 semantics: a document split into two halves with an
    8-token overlap is stitched (tail of A == head of B); unrelated
    docs and short docs are not."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_boundary_stitch,
    )

    boundary = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    left = "one two three four five six seven eight " + boundary
    right = boundary + " nine ten eleven twelve thirteen fourteen fifteen sixteen"
    docs = [
        (0, left, "en", "s0", len(left)),
        (1, right, "en", "s0", len(right)),
        (2, "an unrelated document with plenty of words to pass the "
            "length gate easily for this test case here", "en", "s0", 100),
        (3, "too short", "en", "s0", 9),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in dedup_boundary_stitch(spark, str(tmp_path)).collect()
    }
    assert got[0]["is_stitch_head"] and got[0]["continues_doc_id"] == 1
    assert got[0]["tail_h"] == got[1]["head_h"]
    assert not got[1]["is_stitch_head"]
    assert not got[2]["is_stitch_head"]
    assert got[3]["head_h"] is None and not got[3]["is_stitch_head"]


def test_quality_calibration_planted_buckets(spark, tmp_path):
    """B134 semantics: a duplicated low-quality pair and a PII doc
    land in their buckets with exact rates."""
    from near_indexer_for_explorer_spark.operators.textops import (
        quality_signal_calibration,
    )

    junk = "zzz qqq xxx"  # low score: 3 tokens, no stopwords
    good = ("the quick brown fox jumps over the lazy dog and then "
            "it runs far away into the woods with great speed") 
    docs = [
        (0, junk, "en", "s0", len(junk)),
        (1, junk, "en", "s0", len(junk)),        # exact dup of 0
        (2, good + " mail bob@x.com", "en", "s0", 120),  # PII doc
        (3, good, "en", "s0", 110),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = quality_signal_calibration(spark, str(tmp_path)).collect()
    assert sum(r["n_docs"] for r in rows) == 4
    by_bucket = {r["bucket"]: r for r in rows}
    junk_bucket = min(by_bucket)   # the two junk docs share the lowest
    assert by_bucket[junk_bucket]["n_docs"] == 2
    assert by_bucket[junk_bucket]["dup_rate"] == 1.0
    assert by_bucket[junk_bucket]["pii_rate"] == 0.0
    hi = [r for b, r in by_bucket.items() if b != junk_bucket]
    assert sum(r["n_docs"] for r in hi) == 2
    # exactly one of the two good docs carries PII
    assert sum(r["n_docs"] * r["pii_rate"] for r in hi) == 1.0


def test_weekday_anova_planted_effect(spark, tmp_path):
    """A116 semantics: a strong Monday spike over 4 weeks flags the
    weekday effect; day-to-day jitter uncorrelated with weekday does
    not."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        orders_weekday_anova,
    )

    def write(rows, path):
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp_ntz, "
            "o_orderpriority string"
        ).write.parquet(str(path / "orders.parquet"))

    base = dt.datetime(1995, 1, 2)  # a Monday
    rows, k = [], 0
    for day in range(28):
        d = base + dt.timedelta(days=day)
        n = 30 if day % 7 == 0 else 10  # Mondays triple
        for _ in range(n):
            rows.append((k, 1, "O", 100.0, d, "1-URGENT")); k += 1
    p1 = tmp_path / "effect"; p1.mkdir(); write(rows, p1)
    (r,) = orders_weekday_anova(spark, str(p1)).collect()
    assert r["n_days"] == 28 and r["k"] == 7
    # identical counts within every weekday: SSW exactly 0, F
    # undefined (NULL), effect called by SSB alone
    assert r["ss_within"] == 0.0 and r["f_stat"] is None
    assert r["weekday_effect"] and r["ss_between"] > 0

    rows2, k = [], 0
    for day in range(28):
        d = base + dt.timedelta(days=day)
        n = 10 + (day % 2)  # jitter orthogonal to weekday
        for _ in range(n):
            rows2.append((k, 1, "O", 100.0, d, "1-URGENT")); k += 1
    p2 = tmp_path / "flat"; p2.mkdir(); write(rows2, p2)
    (r2,) = orders_weekday_anova(spark, str(p2)).collect()
    assert not r2["weekday_effect"]


def test_type_overlap_planted_jaccard(spark, tmp_path):
    """A117 semantics: hand-built user sets give exact Jaccards."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        event_type_user_overlap,
    )

    ts = dt.datetime(1995, 1, 1)
    # users 1,2,3 do 'a'; users 2,3 do 'b'; user 9 does 'c'
    rows = [(i, ts, u, t, 1.0, "{}") for i, (u, t) in enumerate(
        [(1, "a"), (2, "a"), (3, "a"), (2, "b"), (3, "b"), (9, "c"),
         (2, "a"), (3, "b")]  # repeats must not double-count
    )]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["type_a"], r["type_b"]): r
        for r in event_type_user_overlap(spark, str(tmp_path)).collect()
    }
    ab = got[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 2)
    assert ab["jaccard"] == round(2 / 3, 6)
    assert ("a", "c") not in got  # zero intersection -> no pair row


def test_dedup_growth_curve_planted_prefixes(spark, tmp_path):
    """B135 semantics: nested prefixes count only dups whose FIRST
    occurrence is also inside the prefix."""
    from near_indexer_for_explorer_spark.operators.dedup import (
        dedup_growth_curve,
    )

    texts = {i: f"unique text number {i}" for i in range(1, 9)}
    texts[4] = texts[2]  # dup inside prefix <=4
    texts[8] = texts[2]  # dup only in the full corpus
    docs = [(i, texts[i], "en", "s0", len(texts[i])) for i in range(1, 9)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["denom"]: r for r in dedup_growth_curve(spark, str(tmp_path)).collect()}
    assert got[8]["cutoff"] == 1 and got[8]["n_docs"] == 1 and got[8]["n_dup"] == 0
    assert got[4]["cutoff"] == 2 and got[4]["n_dup"] == 0
    assert got[2]["cutoff"] == 4 and got[2]["n_dup"] == 1
    assert got[2]["dup_rate"] == 0.25
    assert got[1]["cutoff"] == 8 and got[1]["n_dup"] == 2
    assert got[1]["dup_rate"] == 0.25


def test_publish_atomic_wap_protocol(spark, tmp_path):
    """sinks.publish_atomic: versioned write-audit-publish — readers
    only ever see fully-published snapshots; audit failures and torn
    stages are invisible."""
    import glob
    import os

    import pytest

    from near_indexer_for_explorer_spark.sources.sinks import (
        publish_atomic,
        read_published,
    )

    out = str(tmp_path / "wap")
    df1 = spark.range(10).withColumnRenamed("id", "x")
    with pytest.raises(FileNotFoundError):
        read_published(spark, out)
    v0 = publish_atomic(df1, out)
    assert v0.endswith("v=0")
    assert read_published(spark, out).count() == 10

    # audit rejection: nothing published, old version still served
    with pytest.raises(ValueError, match="audit rejected"):
        publish_atomic(
            spark.range(3).withColumnRenamed("id", "x"), out,
            audit=lambda d: d.count() > 5,
        )
    assert read_published(spark, out).count() == 10
    assert not glob.glob(os.path.join(out, "_staging_*"))  # cleaned up

    # torn stage (crash before rename): invisible to readers
    torn = os.path.join(out, "_staging_deadbeef")
    spark.range(2).write.parquet(torn)
    assert read_published(spark, out).count() == 10

    # v=1 dir without the marker (crash between rename and marker):
    # still invisible; the NEXT publish must not collide with it
    spark.range(4).withColumnRenamed("id", "x").write.parquet(
        os.path.join(out, "v=1")
    )
    assert read_published(spark, out).count() == 10

    v2 = publish_atomic(
        spark.range(20).withColumnRenamed("id", "x"), out,
        audit=lambda d: d.count() == 20,
    )
    assert read_published(spark, out).count() == 20
    assert v2.endswith("v=2")


def test_publish_atomic_persistent_rename_error_preserves_staging(
    spark, tmp_path, monkeypatch
):
    """publish_atomic retries ONLY collision errnos: a persistent
    non-collision rename failure (EACCES, read-only fs, ...) must
    surface the original OSError immediately and leave the fully
    staged, audited snapshot on disk for recovery — not spin 16
    futile retries and rmtree the data."""
    import errno
    import glob
    import os

    import pytest

    from near_indexer_for_explorer_spark.sources import sinks

    out = str(tmp_path / "wap_eacces")
    attempts = []
    real_rename = os.rename

    def deny(src, dst):
        attempts.append(dst)
        raise OSError(errno.EACCES, "permission denied", dst)

    monkeypatch.setattr(sinks.os, "rename", deny)
    with pytest.raises(OSError) as exc_info:
        sinks.publish_atomic(
            spark.range(5).withColumnRenamed("id", "x"), out
        )
    assert exc_info.value.errno == errno.EACCES
    assert len(attempts) == 1  # no futile retry loop
    staged = glob.glob(os.path.join(out, "_staging_*"))
    assert len(staged) == 1  # snapshot preserved for recovery
    assert spark.read.parquet(staged[0]).count() == 5

    # collision errnos still retry: first rename loses the race, the
    # re-scan picks the next free number and succeeds
    lost = {"n": 0}

    def collide_once(src, dst):
        if lost["n"] == 0:
            lost["n"] += 1
            raise OSError(errno.ENOTEMPTY, "directory not empty", dst)
        return real_rename(src, dst)

    monkeypatch.setattr(sinks.os, "rename", collide_once)
    out2 = str(tmp_path / "wap_race")
    v0 = sinks.publish_atomic(
        spark.range(7).withColumnRenamed("id", "x"), out2
    )
    assert lost["n"] == 1 and os.path.isdir(v0)
    assert sinks.read_published(spark, out2).count() == 7


def test_actions_typed_args_per_kind_with_corrupt_rows(spark):
    """A125: every one of the nine action kinds projects exactly its
    serializer fields (serializers.rs:64-129), the AddKey nested
    permission flattens with allowance/receiver/method_names, a
    corrupt-args row of EVERY kind quarantines as bad_json with no
    typed field leaking through, and an off-vocabulary kind
    quarantines as bad_kind even with parseable args."""
    import json

    from near_indexer_for_explorer_spark.operators.assets import (
        ACTION_KINDS,
        parse_typed_actions,
    )

    valid = {
        "CREATE_ACCOUNT": {},
        "DEPLOY_CONTRACT": {"code_sha256": "ab" * 16},
        "FUNCTION_CALL": {
            "method_name": "ft_transfer",
            "args_base64": "eyJ4IjoxfQ==",
            "gas": 30000000000000,
            "deposit": "1",
        },
        "TRANSFER": {"deposit": "42"},
        "STAKE": {"stake": "990000", "public_key": "ed25519:PK_1"},
        "ADD_KEY": {
            "public_key": "ed25519:PK_2",
            "access_key": {
                "nonce": 7,
                "permission": {
                    "permission_kind": "FUNCTION_CALL",
                    "permission_details": {
                        "allowance": "250000",
                        "receiver_id": "acct_9",
                        "method_names": ["claim", "withdraw"],
                    },
                },
            },
        },
        "DELETE_KEY": {"public_key": "ed25519:PK_3"},
        "DELETE_ACCOUNT": {"beneficiary_id": "acct_5"},
        "DELEGATE_ACTION": {},
    }
    rows = []
    i = 0
    for kind in ACTION_KINDS:
        rows.append((i, kind, json.dumps(valid[kind])))
        i += 1
        rows.append((i, kind, '{"truncated": '))  # corrupt args per kind
        i += 1
    rows.append((i, "RUN_CONTRACT", "{}"))  # off the closed vocabulary
    df = spark.createDataFrame(
        rows, "event_id long, action_kind string, args string"
    )
    got = {r["event_id"]: r for r in parse_typed_actions(df).collect()}

    typed_cols = [
        "code_sha256", "method_name", "args_base64", "gas", "deposit",
        "stake", "public_key", "beneficiary_id", "ak_nonce",
        "ak_permission_kind", "ak_allowance", "ak_receiver_id",
        "ak_method_names_csv",
    ]
    for j, kind in enumerate(ACTION_KINDS):
        ok, bad = got[2 * j], got[2 * j + 1]
        assert ok["args_class"] == "typed", kind
        assert bad["args_class"] == "bad_json", kind
        assert all(bad[c] is None for c in typed_cols), kind

    fc = got[4]
    assert fc["method_name"] == "ft_transfer"
    assert fc["gas"] == 30000000000000 and fc["deposit"] == "1"
    assert got[0] and got[0]["args_class"] == "typed"  # CREATE_ACCOUNT {}
    assert got[2]["code_sha256"] == "ab" * 16
    assert got[6]["deposit"] == "42"
    assert got[8]["stake"] == "990000" and got[8]["public_key"] == "ed25519:PK_1"
    ak = got[10]
    assert ak["public_key"] == "ed25519:PK_2" and ak["ak_nonce"] == 7
    assert ak["ak_permission_kind"] == "FUNCTION_CALL"
    assert ak["ak_allowance"] == "250000"
    assert ak["ak_receiver_id"] == "acct_9"
    assert ak["ak_method_names_csv"] == "claim,withdraw"
    assert got[12]["public_key"] == "ed25519:PK_3"
    assert got[14]["beneficiary_id"] == "acct_5"
    # DEPLOY_CONTRACT must not leak FUNCTION_CALL fields and vice versa
    assert got[2]["method_name"] is None and got[4]["code_sha256"] is None
    unk = got[2 * len(ACTION_KINDS)]
    assert unk["args_class"] == "bad_kind"
    assert all(unk[c] is None for c in typed_cols)


def test_access_keys_fold_interactions(spark):
    """A126: the last-writer-wins fold reproduces the reference's
    guarded-upsert semantics — add->delete closes the row keeping the
    add's permission, delete->re-add reactivates with the NEW add's
    permission, a delete with no prior add inserts the FULL_ACCESS
    placeholder (access_keys.rs:55-64), and out-of-order input
    (higher event_id folded regardless of row order) cannot regress
    state."""
    from near_indexer_for_explorer_spark.operators.assets import (
        fold_access_keys,
    )

    rows = [
        # (account, pk, event_id, is_add, perm)
        ("a1", "k1", 10, True, "FULL_ACCESS"),     # add -> delete: closed
        ("a1", "k1", 20, False, None),
        ("a1", "k2", 35, True, "FUNCTION_CALL"),   # out-of-order re-add
        ("a1", "k2", 30, False, None),             #   (delete is OLDER)
        ("a1", "k2", 25, True, "FULL_ACCESS"),
        ("a2", "k1", 40, False, None),             # delete-only placeholder
        ("a2", "k3", 50, True, "FUNCTION_CALL"),   # plain active add
    ]
    df = spark.createDataFrame(
        rows,
        "account_id string, public_key string, event_id long, "
        "is_add boolean, ak_permission_kind string",
    )
    got = {
        (r["account_id"], r["public_key"]): r
        for r in fold_access_keys(df).collect()
    }
    closed = got[("a1", "k1")]
    assert not closed["is_active"]
    assert closed["created_by_event_id"] == 10
    assert closed["deleted_by_event_id"] == 20
    assert closed["permission_kind"] == "FULL_ACCESS"  # add's, unchanged
    assert closed["last_update_event_id"] == 20

    readd = got[("a1", "k2")]
    assert readd["is_active"]
    assert readd["created_by_event_id"] == 35
    assert readd["deleted_by_event_id"] is None
    assert readd["permission_kind"] == "FUNCTION_CALL"  # LATEST add wins
    assert readd["last_update_event_id"] == 35

    placeholder = got[("a2", "k1")]
    assert not placeholder["is_active"]
    assert placeholder["created_by_event_id"] is None
    assert placeholder["deleted_by_event_id"] == 40
    assert placeholder["permission_kind"] == "FULL_ACCESS"

    active = got[("a2", "k3")]
    assert active["is_active"] and active["deleted_by_event_id"] is None


def test_supply_catchup_incremental_frozen_base(spark, sf_dir):
    """A130: the registered incremental cycle reuses the session-frozen
    base publish (one base build per session+sf_dir), never mutates it,
    and each call returns the full A37-equal series."""
    import os

    from near_indexer_for_explorer_spark.plans import relational as R

    first = R.supply_catchup_incremental(spark, sf_dir)
    base = R._supply_catchup_base(spark, sf_dir)
    before = sorted(os.listdir(base))
    second = R.supply_catchup_incremental(spark, sf_dir)
    # frozen base: same dir, untouched version set (each cycle clones)
    assert R._supply_catchup_base(spark, sf_dir) == base
    assert sorted(os.listdir(base)) == before
    a = sorted(first.collect(), key=lambda r: r["snap_date"])
    b = sorted(second.collect(), key=lambda r: r["snap_date"])
    assert a == b and len(a) > 0
    oneshot = sorted(
        R.circulating_supply_daily(spark, sf_dir).collect(),
        key=lambda r: r["snap_date"],
    )
    assert a == oneshot


def test_supply_catchup_protocol_and_crash_recovery(spark, sf_dir, tmp_path, monkeypatch):
    """A124: the catch-up computes exactly the missing days, is
    idempotent under restart, survives a crash mid-publish with the
    old version still served, and after recovery the published series
    equals the one-shot A37 aggregate row-for-row — the reference's
    per-day check-and-collect resume protocol
    (circulating-supply/src/main.rs:59-104) on the lake."""
    import datetime
    import errno
    import os

    import pytest

    from near_indexer_for_explorer_spark.plans.relational import (
        circulating_supply_daily,
        supply_catchup,
        supply_missing_days,
    )
    from near_indexer_for_explorer_spark.sources import sinks

    out = str(tmp_path / "supply_agg")
    pivot = datetime.date(1995, 6, 30)

    # leg 1: partial history backfill
    v1 = supply_catchup(spark, sf_dir, out, upto=pivot)
    assert v1 is not None
    pub1 = {r["snap_date"] for r in sinks.read_published(spark, out).collect()}
    assert pub1 and all(d <= pivot for d in pub1)

    # the restart decision sees exactly the complement
    missing, published = supply_missing_days(spark, sf_dir, out)
    assert published is not None
    missing_days = {r["snap_date"] for r in missing.collect()}
    assert missing_days and all(d > pivot for d in missing_days)

    # crash mid-leg-2: rename fails persistently -> the publish
    # surfaces the error, the OLD version stays served, staging is
    # preserved (and invisible)
    def deny(src, dst):
        raise OSError(errno.EACCES, "permission denied", dst)

    monkeypatch.setattr(sinks.os, "rename", deny)
    with pytest.raises(OSError):
        supply_catchup(spark, sf_dir, out)
    monkeypatch.undo()
    assert {
        r["snap_date"] for r in sinks.read_published(spark, out).collect()
    } == pub1

    # recovery: the re-run completes despite the leftover staging dir
    v2 = supply_catchup(spark, sf_dir, out)
    assert v2 is not None

    # idempotence: nothing missing -> no new version
    n_versions = len(
        [p for p in os.listdir(out) if p.startswith("v=")]
    )
    assert supply_catchup(spark, sf_dir, out) is None
    assert (
        len([p for p in os.listdir(out) if p.startswith("v=")]) == n_versions
    )

    # the incrementally-published union equals the one-shot series
    got = sorted(
        (tuple(r) for r in sinks.read_published(spark, out).collect()),
        key=repr,
    )
    want = sorted(
        (tuple(r) for r in circulating_supply_daily(spark, sf_dir).collect()),
        key=repr,
    )
    assert got == want


def test_media_router_sniffs_all_branches(spark):
    """B136: the router sniffs magic bytes and decodes each branch
    with the REAL codec — hand-built payloads of all four kinds in one
    mixed column."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        MEDIA_ROUTER_SCHEMA,
        _gif_codec,
        _png_codec,
        _wav_codec,
        make_media_router_kernel,
    )

    enc_png, _ = _png_codec()
    enc_gif, _ = _gif_codec()
    enc_wav, _ = _wav_codec()
    data = bytes([10, 20, 30])
    rows = [
        (0, enc_png(data, 32)),
        (1, enc_gif(data, 32)),
        (2, enc_wav(data)),
        (3, b"not a media file"),
    ]
    got = {
        r["doc_id"]: r
        for r in spark.createDataFrame(rows, "doc_id long, payload binary")
        .mapInPandas(make_media_router_kernel(), schema=MEDIA_ROUTER_SCHEMA)
        .collect()
    }
    assert got[0]["mime"] == "image/png" and got[0]["unit_sum"] == 60
    assert got[0]["n_units"] == 32  # padded grid
    assert got[1]["mime"] == "image/gif" and got[1]["unit_sum"] == 60
    assert got[2]["mime"] == "audio/wav"
    assert got[2]["unit_sum"] == ((10 - 128) + (20 - 128) + (30 - 128)) * 256
    assert got[3]["mime"] == "unknown"
    assert got[3]["unit_sum"] == sum(b"not a media file")


def test_readability_hand_computed(spark, tmp_path):
    """B137: Flesch ease / FK grade pinned on a hand-counted sentence
    ('the cat sat on the mat.' = 6 words, 1 sentence, 6 syllables) and
    the band thresholds on planted easy/hard docs."""
    from near_indexer_for_explorer_spark.operators.textops import (
        text_readability,
    )

    hard = ("extraordinarily incomprehensible organizational "
            "responsibilities necessitate unintelligible documentation")
    docs = [
        (0, "the cat sat on the mat.", "en", "s0", 23),
        (1, hard, "en", "s0", len(hard)),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in text_readability(spark, str(tmp_path)).collect()}
    r = got[0]
    assert (r["n_words"], r["n_sents"], r["n_syllables"]) == (6, 1, 6)
    # ease = 206.835 - 1.015*6 - 84.6*1 = 116.145; grade = 0.39*6 + 11.8*1 - 15.59
    assert r["flesch_ease"] == round(206.835 - 1.015 * 6 - 84.6, 6)
    assert r["fk_grade"] == round(0.39 * 6 + 11.8 - 15.59, 6)
    assert r["band"] == "easy"
    assert got[1]["band"] == "hard" and got[1]["fk_grade"] > 15


def test_publish_atomic_many_manifest_protocol(spark, tmp_path):
    """Multi-relation WAP: every crash interleaving leaves readers on
    a complete consistent snapshot (all tables from the SAME publish),
    mirroring the reference's one-Postgres-transaction-per-block
    commit (indexer/src/main.rs, database/src/adapters/)."""
    import glob
    import json
    import os

    import pytest

    from near_indexer_for_explorer_spark.sources.sinks import (
        publish_atomic_many,
        read_published_many,
    )

    out = str(tmp_path / "wapmany")
    orders = spark.range(10).withColumnRenamed("id", "o")
    lines = spark.range(30).withColumnRenamed("id", "l")

    with pytest.raises(FileNotFoundError):
        read_published_many(spark, out)
    with pytest.raises(ValueError, match="no relations"):
        publish_atomic_many({}, out)
    with pytest.raises(ValueError, match="unsafe table names"):
        publish_atomic_many({"_bad": orders}, out)

    m0 = publish_atomic_many({"orders": orders, "lineitem": lines}, out)
    assert m0.endswith("_MANIFEST_0")
    got = read_published_many(spark, out)
    assert set(got) == {"orders", "lineitem"}
    assert got["orders"].count() == 10 and got["lineitem"].count() == 30

    # audit sees ALL staged tables together and can reject the whole
    # snapshot cross-table — nothing publishes
    with pytest.raises(ValueError, match="audit rejected"):
        publish_atomic_many(
            {"orders": spark.range(2).withColumnRenamed("id", "o"),
             "lineitem": lines},
            out,
            audit=lambda staged: staged["orders"].count()
            >= staged["lineitem"].count() // 10,
        )
    assert read_published_many(spark, out)["orders"].count() == 10
    assert not glob.glob(os.path.join(out, "_staging_*"))

    # crash interleaving 1: mid-stage (writer died) -> torn staging
    # dir, invisible to readers
    os.makedirs(os.path.join(out, "_staging_deadbeef"))
    spark.range(1).write.parquet(
        os.path.join(out, "_staging_deadbeef", "orders")
    )
    assert read_published_many(spark, out)["orders"].count() == 10

    # crash interleaving 2: after the snapshot rename, BEFORE the
    # manifest -> snap dir exists, readers still on the old snapshot
    os.makedirs(os.path.join(out, "snap_cafecafe0000"))
    spark.range(7).withColumnRenamed("id", "o").write.parquet(
        os.path.join(out, "snap_cafecafe0000", "orders")
    )
    assert read_published_many(spark, out)["orders"].count() == 10

    # crash interleaving 3: torn manifest (unparseable) and a manifest
    # whose snapshot dir is missing — both skipped for the next-newest
    # complete one
    with open(os.path.join(out, "_MANIFEST_1"), "w") as fh:
        fh.write("{half a js")
    with open(os.path.join(out, "_MANIFEST_2"), "w") as fh:
        fh.write(json.dumps({"snapshot": "snap_gone", "tables": {"orders": 1}}))
    assert read_published_many(spark, out)["orders"].count() == 10

    # next publish numbers PAST the dead manifests and goes live with
    # both tables at once
    m3 = publish_atomic_many(
        {"orders": spark.range(5).withColumnRenamed("id", "o"),
         "lineitem": spark.range(6).withColumnRenamed("id", "l")},
        out,
    )
    assert m3.endswith("_MANIFEST_3")
    got = read_published_many(spark, out)
    assert got["orders"].count() == 5 and got["lineitem"].count() == 6
    # no tmp manifest files leaked
    assert not glob.glob(os.path.join(out, "_manifest_tmp_*"))


def test_publish_atomic_many_two_publisher_collision(spark, tmp_path):
    """Manifest-number race: two publishers staging concurrently both
    land — unique snapshot tokens mean no data-dir collision, and the
    hard-link manifest publication is atomic-or-EEXIST so the loser
    retries onto the next number.  Simulated by pre-claiming the
    number the second publisher would otherwise take."""
    import json
    import os

    from near_indexer_for_explorer_spark.sources.sinks import (
        publish_atomic_many,
        read_published_many,
    )

    out = str(tmp_path / "race")
    publish_atomic_many({"t": spark.range(3).withColumnRenamed("id", "x")}, out)

    # a peer wins _MANIFEST_1 between our scan and link: pre-create it
    # pointing at its own (valid) snapshot
    os.makedirs(os.path.join(out, "snap_peer00000000"))
    spark.range(9).withColumnRenamed("id", "x").write.parquet(
        os.path.join(out, "snap_peer00000000", "t")
    )
    with open(os.path.join(out, "_MANIFEST_1"), "w") as fh:
        fh.write(
            json.dumps({"snapshot": "snap_peer00000000", "tables": {"t": 9}})
        )

    m = publish_atomic_many(
        {"t": spark.range(4).withColumnRenamed("id", "x")}, out
    )
    assert m.endswith("_MANIFEST_2")  # retried past the peer's number
    assert read_published_many(spark, out)["t"].count() == 4


def test_publish_stale_ghost_sweep(spark, tmp_path):
    """r10 advice: leaked _staging_* dirs (hard kill mid-write) and
    unmarked v=<n> dirs (crash between rename and marker) are swept by
    the NEXT publish once older than the age gate; younger ones — a
    live peer — are never touched."""
    import glob
    import os
    import time

    from near_indexer_for_explorer_spark.sources.sinks import (
        publish_atomic,
        publish_atomic_many,
        read_published,
        read_published_many,
    )

    out = str(tmp_path / "sweep")
    df = spark.range(5).withColumnRenamed("id", "x")
    publish_atomic(df, out)

    old_stage = os.path.join(out, "_staging_00000000dead")
    spark.range(1).write.parquet(old_stage)
    young_stage = os.path.join(out, "_staging_00000000beef")
    spark.range(1).write.parquet(young_stage)
    # planted high so the post-sweep publish (which renumbers from the
    # surviving v=0) cannot re-create the same path
    torn_v = os.path.join(out, "v=5")
    spark.range(2).write.parquet(torn_v)  # no _PUBLISHED marker
    past = time.time() - 7200
    os.utime(old_stage, (past, past))
    os.utime(torn_v, (past, past))

    publish_atomic(df, out, stale_age_s=3600.0)
    assert not os.path.exists(old_stage)  # stale ghost swept
    assert not os.path.exists(torn_v)  # stale unmarked version swept
    assert os.path.exists(young_stage)  # live peer untouched
    assert read_published(spark, out).count() == 5

    # manifest flavor: stale unreferenced snap dirs swept, referenced
    # snapshot history retained
    mout = str(tmp_path / "msweep")
    publish_atomic_many({"t": df}, mout)
    ghost = os.path.join(mout, "snap_00000000dead")
    spark.range(1).write.parquet(os.path.join(ghost, "t"))
    os.utime(ghost, (past, past))
    live = glob.glob(os.path.join(mout, "snap_*"))
    live.remove(ghost)
    os.utime(live[0], (past, past))  # referenced: old age must NOT matter
    publish_atomic_many({"t": df}, mout, stale_age_s=3600.0)
    assert not os.path.exists(ghost)
    assert os.path.exists(live[0])
    assert read_published_many(spark, mout)["t"].count() == 5


def test_args_base64_decode_quarantine(spark):
    """Pre-migration args ingest (reference migration
    2021-05-07-115559_convert_args_base64_to_args_json): planted
    valid / MIME-wrapped / corrupt-JSON / non-base64 / empty blobs all
    classify without raising, and good rows decode typed fields."""
    import base64

    from near_indexer_for_explorer_spark.operators.assets import (
        decode_args_base64,
    )

    good = base64.b64encode(
        b'{"method_name":"mint","deposit":"12","gas":300,"filler":""}'
    ).decode()
    # historical MIME-wrapped blob: same payload with \r\n line breaks
    wrapped_payload = (
        b'{"method_name":"transfer","deposit":"999","gas":5000,'
        b'"filler":"' + b"y" * 120 + b'"}'
    )
    wrapped = base64.encodebytes(wrapped_payload).decode()  # \n every 76
    assert "\n" in wrapped
    not_json = base64.b64encode(b"just some bytes").decode()
    rows = [
        (1, good),
        (2, wrapped),
        (3, not_json),
        (4, "!!!definitely not base64!!!"),
        (5, ""),
        (6, "abc"),  # valid charset, broken padding (len % 4 != 0)
    ]
    out = {
        r["event_id"]: r
        for r in decode_args_base64(
            spark.createDataFrame(rows, "event_id long, args_base64 string")
        ).collect()
    }
    assert out[1]["args_class"] == "json"
    assert out[1]["method_name"] == "mint"
    assert out[1]["deposit"] == "12" and out[1]["gas"] == 300
    assert out[2]["args_class"] == "json"
    assert out[2]["method_name"] == "transfer" and out[2]["gas"] == 5000
    assert out[3]["args_class"] == "bad_json"
    assert out[3]["method_name"] is None and out[3]["gas"] is None
    assert out[4]["args_class"] == "bad_base64"
    assert out[5]["args_class"] == "bad_base64"
    assert out[6]["args_class"] == "bad_base64"


def test_media_router_decode_budget_and_corruption(spark):
    """r10 verdict #5: the router prices every payload's HEADER claim
    before committing decoder memory — a decode bomb (tiny payload,
    huge promised output) is tagged over_budget, a structurally broken
    payload is tagged corrupt, and NOTHING raises out of the kernel."""
    import struct
    import zlib

    from near_indexer_for_explorer_spark.multimodal.decode import (
        MEDIA_ROUTER_SCHEMA,
        _claimed_units,
        _gif_codec,
        _png_codec,
        _wav_codec,
        make_media_router_kernel,
    )

    def png_bomb() -> bytes:
        # valid signature + IHDR claiming 60000x60000 gray8 (~3.6e9 px)
        ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\0\0\0\0"
        idat_raw = zlib.compress(b"\x00" * 100)
        idat = struct.pack(">I", len(idat_raw)) + b"IDAT" + idat_raw + b"\0\0\0\0"
        return b"\x89PNG\r\n\x1a\n" + chunk + idat

    def gif_bomb() -> bytes:
        # GIF87a whose image descriptor claims 65535x65535 (~4.3e9 px)
        palette = b"".join(bytes([i, i, i]) for i in range(256))
        return (
            b"GIF87a"
            + struct.pack("<HHBBB", 65535, 65535, 0xF7, 0, 0)
            + palette
            + b"\x2c"
            + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
            + bytes([8, 1, 0x00, 0x00, 0x3b])
        )

    encode_png, _ = _png_codec()
    encode_gif, _ = _gif_codec()
    encode_wav, _ = _wav_codec()
    good_png = encode_png(b"hello png", 32)
    good_gif = encode_gif(b"hello gif", 32)
    good_wav = encode_wav(b"hello wav", 8000)
    # sane IHDR (survives the budget precheck) but the IDAT bytes are
    # torn mid-stream -> the bounded inflate fails -> corrupt
    corrupt_png = good_png[:41] + b"\xff" * 30
    corrupt_gif = good_gif[:12]  # truncated before any image block
    rows = [
        (1, png_bomb()),
        (2, gif_bomb()),
        (3, good_png),
        (4, good_gif),
        (5, good_wav),
        (6, corrupt_png),
        (7, corrupt_gif),
        (8, b"plain garbage bytes"),
    ]
    out = {
        r["doc_id"]: r
        for r in spark.createDataFrame(rows, "doc_id long, payload binary")
        .mapInPandas(make_media_router_kernel(), schema=MEDIA_ROUTER_SCHEMA)
        .collect()
    }
    assert out[1]["mime"] == "over_budget"
    assert out[2]["mime"] == "over_budget"
    # over-budget rows carry byte stats (the 'unknown' discipline)
    assert out[1]["n_units"] == len(png_bomb())
    assert out[3]["mime"] == "image/png"
    assert out[4]["mime"] == "image/gif"
    assert out[5]["mime"] == "audio/wav"
    assert out[6]["mime"] == "corrupt"
    assert out[7]["mime"] == "corrupt"
    assert out[8]["mime"] == "unknown"

    # the budget is a knob: a small budget flips REAL payloads to
    # over_budget for every codec (WAV included — its claim is the
    # payload size itself)
    tight = {
        r["doc_id"]: r["mime"]
        for r in spark.createDataFrame(
            [(3, good_png), (4, good_gif), (5, good_wav)],
            "doc_id long, payload binary",
        )
        .mapInPandas(make_media_router_kernel(max_units=8), schema=MEDIA_ROUTER_SCHEMA)
        .collect()
    }
    assert tight == {3: "over_budget", 4: "over_budget", 5: "over_budget"}

    # the claim readers never amplify: WAV's claim is bounded by the
    # actual payload; the image claims match the lying headers
    assert _claimed_units(png_bomb(), "png") == 60000 * 60000
    assert _claimed_units(gif_bomb(), "gif") == 65535 * 65535
    assert _claimed_units(good_wav, "wav") == len(good_wav)


def test_bmp_codec_roundtrip_corners():
    """B139: the stdlib BMP codec proves the format's real quirks —
    4-byte stride padding (width 30 -> 2 pad bytes/row), BOTTOM-UP row
    order, and the top-down negative-height variant."""
    import struct

    from near_indexer_for_explorer_spark.multimodal.decode import (
        _BMP_W,
        _bmp_codec,
    )

    encode, decode = _bmp_codec()
    payload = bytes(range(64))  # 64 bytes over width 30 -> 3 rows
    bmp = encode(payload)
    w, h, px = decode(bmp)
    assert (w, h) == (_BMP_W, 3)
    assert px[: len(payload)] == list(payload)  # logical order restored
    assert all(p == 0 for p in px[len(payload) :])  # zero pad pixels
    # the FILE stores rows bottom-up with stride 32: the first stored
    # row is the LAST logical row
    (offset,) = struct.unpack("<I", bmp[10:14])
    stride = (_BMP_W + 3) & ~3
    assert stride == 32
    first_stored = bmp[offset : offset + _BMP_W]
    assert list(first_stored) == px[2 * _BMP_W : 3 * _BMP_W]

    # top-down variant (negative height) decodes to the same pixels
    neg = bytearray(bmp)
    neg[22:26] = struct.pack("<i", -3)
    down_rows = [px[r * _BMP_W : (r + 1) * _BMP_W] for r in range(3)]
    stored = b"".join(
        bytes(r) + bytes(stride - _BMP_W) for r in down_rows
    )
    neg[offset:] = stored
    w2, h2, px2 = decode(bytes(neg))
    assert (w2, h2, px2) == (w, h, px)

    # empty payload still yields one (all-pad) row
    w3, h3, px3 = decode(encode(b""))
    assert (w3, h3) == (_BMP_W, 1) and sum(px3) == 0


def test_media_router_bmp_branch_and_native_swap(spark):
    """The router sniffs 'BM' to the real BMP decoder, prices its
    header claim like every other branch, and the NATIVE_DECODERS
    seam (the documented Pillow/libgif swap point) overrides the
    stdlib prover without any plan or schema change."""
    import struct

    from near_indexer_for_explorer_spark.multimodal import decode as D

    encode_bmp, _ = D._bmp_codec()
    good = encode_bmp(b"hello bmp")
    bomb = bytearray(encode_bmp(b"x"))
    bomb[18:26] = struct.pack("<ii", 60000, 60000)  # lying dims
    rows = [(1, bytes(good)), (2, bytes(bomb))]
    out = {
        r["doc_id"]: r
        for r in spark.createDataFrame(rows, "doc_id long, payload binary")
        .mapInPandas(D.make_media_router_kernel(), schema=D.MEDIA_ROUTER_SCHEMA)
        .collect()
    }
    assert out[1]["mime"] == "image/bmp"
    assert out[1]["unit_sum"] == sum(b"hello bmp")
    assert out[1]["n_units"] == D._BMP_W  # one padded row
    assert out[2]["mime"] == "over_budget"

    # native swap: a registered decoder takes the branch over the
    # stdlib prover (no 'bmp' entry is registered by default — only
    # the numpy GIF pair ships, r13)
    assert "bmp" not in D.NATIVE_DECODERS
    D.NATIVE_DECODERS["bmp"] = lambda p: [7, 7, 7]
    try:
        swapped = (
            spark.createDataFrame([(1, bytes(good))], "doc_id long, payload binary")
            .mapInPandas(D.make_media_router_kernel(), schema=D.MEDIA_ROUTER_SCHEMA)
            .collect()[0]
        )
        assert swapped["mime"] == "image/bmp"
        assert swapped["n_units"] == 3 and swapped["unit_sum"] == 21
    finally:
        del D.NATIVE_DECODERS["bmp"]


def test_gif_seam_reaches_every_decode_path():
    """r11 verdict item #2: the NATIVE_DECODERS seam must be consulted
    by ALL GIF decode paths — the single-frame roundtrip kernel, the
    multi-frame container walk (whole-container 'gif_frames' entry),
    and the per-frame 'gif' fallback inside the walk — with an
    identical-output contract (a delegating native decoder changes
    nothing but the consultation count)."""
    from near_indexer_for_explorer_spark.multimodal import decode as D

    encode_one, decode_one = D._gif_codec()
    # start from an empty registry (the numpy pair ships by default
    # since r13); restored at the end
    _default = dict(D.NATIVE_DECODERS)
    D.NATIVE_DECODERS.clear()

    # Reference outputs through the pure-stdlib path
    _, stdlib_frames = D._gif_frames_codec()
    payload = bytes(range(64)) * 3
    frames_in = [payload[j::3] for j in range(3)]
    enc_frames, _ = D._gif_frames_codec()
    container = enc_frames(frames_in, 32)
    ref_frames = stdlib_frames(container)
    single = encode_one(payload, 32)
    ref_single = decode_one(single)

    calls = {"gif": 0}

    def native_gif(p):
        calls["gif"] += 1
        return decode_one(p)[2]

    # (a) per-frame 'gif' consultation: only 'gif' registered — the
    # walk must call it once per image block and match stdlib exactly
    D.NATIVE_DECODERS["gif"] = native_gif
    try:
        _, walk = D._gif_frames_codec()
        got = walk(container)
        assert calls["gif"] == 3  # one consultation per frame
        assert [(w, h, list(px)) for w, h, px in got] == ref_frames

        # single-frame roundtrip kernel consults the same entry
        import pandas as pd

        kern = D.make_gif_roundtrip_kernel(32)
        out = list(kern(iter([pd.DataFrame(
            {"doc_id": [1], "payload": [payload]}
        )])))[0].iloc[0]
        assert out["decode_backend"] == "native:gif"
        assert out["px_sum"] == sum(ref_single[2])
        assert out["n_px"] == ref_single[0] * ref_single[1]
    finally:
        del D.NATIVE_DECODERS["gif"]

    # (b) whole-container 'gif_frames' consultation outranks 'gif'
    whole = {"n": 0}

    def native_whole(p):
        whole["n"] += 1
        return ref_frames

    D.NATIVE_DECODERS["gif_frames"] = native_whole
    D.NATIVE_DECODERS["gif"] = native_gif
    try:
        calls["gif"] = 0
        _, walk = D._gif_frames_codec()
        assert walk(container) == ref_frames
        assert whole["n"] == 1 and calls["gif"] == 0
    finally:
        del D.NATIVE_DECODERS["gif_frames"]
        del D.NATIVE_DECODERS["gif"]
        D.NATIVE_DECODERS.update(_default)


def test_numpy_gif_decoders_match_stdlib():
    """numpy_gif_decoders (the in-container 'native' registration the
    A/B tool uses) must be byte-identical to the stdlib prover on
    self-encoded streams AND fall back to the general LZW decoder on
    streams outside the fixed-9-bit clear-interleaved shape."""
    from near_indexer_for_explorer_spark.multimodal import decode as D

    encode_one, decode_one = D._gif_codec()
    enc_frames, dec_frames = D._gif_frames_codec()
    fast_units, fast_frames = D.numpy_gif_decoders()

    for payload in (b"", b"x", bytes(range(256)), b"hello gif" * 41):
        gif = encode_one(payload, 32)
        assert fast_units(gif) == decode_one(gif)[2], len(payload)

    container = enc_frames([b"abcdef", b"ghijkl", b"mnopqr"], 32)
    assert [
        (w, h, list(px)) for w, h, px in fast_frames(container)
    ] == dec_frames(container)

    # General (table-growing) LZW stream: codes CLEAR,a,b,EOI with no
    # interleaved clears — the fast path must REJECT the shape and
    # fall back, not misdecode.
    import struct

    def pack9(codes):
        acc = n = 0
        out = bytearray()
        for c in codes:
            acc |= c << n
            n += 9
            while n >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n -= 8
        if n:
            out.append(acc & 0xFF)
        return bytes(out)

    lzw = pack9([256, 65, 66, 257])  # CLEAR 'A' 'B' EOI
    palette = b"".join(bytes([i, i, i]) for i in range(256))
    gif2 = (
        b"GIF87a"
        + struct.pack("<HHBBB", 2, 1, 0xF7, 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
        + bytes([8])
        + bytes([len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    assert decode_one(gif2)[2] == [65, 66]  # stdlib handles it
    assert fast_units(gif2) == [65, 66]     # fast path fell back

    # interlaced flag: both paths must fail LOUDLY and identically —
    # decoding an interlaced stream in storage order would silently
    # return spatially-wrong pixels
    import pytest

    inter = bytearray(encode_one(b"interlaced", 32))
    # image descriptor packed byte sits 9 bytes into the 0x2C block
    idesc = inter.index(0x2C, 13 + 3 * 256)
    inter[idesc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_one(bytes(inter))
    with pytest.raises(ValueError, match="interlaced"):
        fast_units(bytes(inter))


def test_native_decoders_registered_by_default():
    """r13: the numpy GIF pair is registered at import when numpy is
    importable (NATIVE_DECODERS_DEFAULTED), the gif-roundtrip oracle's
    backend tag flips in lockstep, re-registration is a setdefault
    no-op, and the env opt-out yields the stdlib default (checked in a
    fresh interpreter because registration runs at import time)."""
    import subprocess
    import sys

    from near_indexer_for_explorer_spark.multimodal import decode as D

    # numpy is baked into this container, so the default MUST be on
    assert D.NATIVE_DECODERS_DEFAULTED
    assert set(D.NATIVE_DECODERS) >= {"gif", "gif_frames"}
    assert "'native:gif' AS decode_backend" in D.ORACLES[
        "multimodal_gif_roundtrip"
    ]
    before = dict(D.NATIVE_DECODERS)
    assert D.register_default_native_decoders()  # idempotent
    assert D.NATIVE_DECODERS == before
    # the oracle flip must also be idempotent (no double-replace)
    assert D.ORACLES["multimodal_gif_roundtrip"].count("AS decode_backend") == 1

    # native divisibility guard (ADVICE r12): a native decoder
    # returning a non-row-multiple pixel list raises, never emits an
    # inconsistent row
    import pandas as pd

    D.NATIVE_DECODERS["gif"] = lambda p: [1, 2, 3]  # 3 % 32 != 0
    try:
        kern = D.make_gif_roundtrip_kernel(32)
        import pytest

        with pytest.raises(ValueError, match="not a multiple"):
            list(kern(iter([pd.DataFrame({"doc_id": [1], "payload": [b"xy"]})])))
    finally:
        D.NATIVE_DECODERS.update(before)

    # env opt-out: a fresh interpreter with the flag set keeps the
    # stdlib default and the stdlib oracle tag
    code = (
        "import os; os.environ['SPARK_GRAFT_NO_NATIVE_DECODERS']='1';"
        "from near_indexer_for_explorer_spark.multimodal import decode as D;"
        "assert D.NATIVE_DECODERS == {}, D.NATIVE_DECODERS;"
        "assert not D.NATIVE_DECODERS_DEFAULTED;"
        "assert \"'gif' AS decode_backend\" in "
        "D.ORACLES['multimodal_gif_roundtrip'];"
        "print('optout-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "optout-ok" in out.stdout


def test_ann_filtered_topk_semantics(spark, sf_dir):
    """B140/B141: filtered search returns ONLY same-label neighbors,
    the filter genuinely binds (the filtered top-k differs from the
    unfiltered one), and post-filtered IVF recall is a well-formed
    fraction of the filtered-exact truth."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        TOP_K,
        ann_cosine_topk,
        ann_filtered_ivf_recall,
        ann_filtered_topk,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    filtered = ann_filtered_topk(spark, sf_dir).collect()
    assert filtered, "query lattice must be non-empty"
    for r in filtered:
        assert labels[r["neighbor_id"]] == r["q_label"] == labels[r["q_id"]]

    unfiltered = {
        (r["q_id"], r["neighbor_id"]) for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    fset = {(r["q_id"], r["neighbor_id"]) for r in filtered}
    assert fset != unfiltered  # the predicate changes the answer

    rec = ann_filtered_ivf_recall(spark, sf_dir).collect()
    assert rec
    for r in rec:
        assert 0 <= r["n_hits"] <= r["n_exact"] <= TOP_K
        assert r["n_ivf"] <= TOP_K
        assert abs(r["recall"] - round(r["n_hits"] / r["n_exact"], 6)) < 1e-9


def test_corpus_stratified_sample_allocations(spark, sf_dir):
    """B142: both allocation policies hold their invariants — per-source
    takes are the exact integer-floor allocations (>=1), ranks are
    hash-deterministic and contiguous from 1, and every selected row
    is in at least one policy's sample."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        _STRAT_BUDGET,
        corpus_stratified_sample,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    counts = {
        r["source"]: r["cnt"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    total, n_sources = sum(counts.values()), len(counts)
    rows = corpus_stratified_sample(spark, sf_dir).collect()
    assert rows
    by_source: dict = {}
    for r in rows:
        assert r["in_proportional"] or r["in_equal"]
        assert r["n_source"] == counts[r["source"]]
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        n_prop = max(1, (_STRAT_BUDGET * counts[src]) // total)
        n_eq = max(1, _STRAT_BUDGET // n_sources)
        ranks = sorted(r["stratum_rank"] for r in rs)
        assert ranks == list(range(1, max(n_prop, n_eq) + 1))
        assert sum(r["in_proportional"] for r in rs) == n_prop
        assert sum(r["in_equal"] for r in rs) == n_eq
    # every source is represented (the force-coverage property)
    assert set(by_source) == set(counts)

    # determinism: a second run returns the identical sample
    again = corpus_stratified_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_image_downsample2x_pinned(spark):
    """B143: hand-pinned 2x2 box math over a real PNG roundtrip —
    cell partition conserves the byte total, the top-left box is the
    exact sum of its four bytes, and an odd bottom row keeps 1-row
    boxes."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        DOWNSAMPLE2X_SCHEMA,
        make_image_downsample2x_kernel,
    )

    # 3 rows over width 4 (odd h): bytes 0..11
    payload = bytes(range(12))
    out = (
        spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        .mapInPandas(
            make_image_downsample2x_kernel(width=4), schema=DOWNSAMPLE2X_SCHEMA
        )
        .collect()[0]
    )
    assert (out["w_out"], out["h_out"], out["n_cells"]) == (2, 2, 4)
    assert out["cells_sum"] == sum(range(12))
    # boxes: rows 0-1 x cols 0-1 -> 0+1+4+5=10; cols 2-3 -> 2+3+6+7=18;
    # bottom odd row: 8+9=17 and 10+11=21
    assert out["cells_max"] == 21


def test_vacuum_manifests_retention(spark, tmp_path):
    """WAP retention: vacuum keeps the newest keep_last complete
    manifests + snapshots, removes older history (manifest file before
    snapshot dir, so a reader never resolves a dangling manifest), and
    leaves the live read path intact."""
    import glob
    import os

    from near_indexer_for_explorer_spark.sources.sinks import (
        publish_atomic_many,
        read_published_many,
        vacuum_manifests,
    )

    out = str(tmp_path / "vac")
    for i in range(5):
        publish_atomic_many(
            {"t": spark.range(i + 1).withColumnRenamed("id", "x")}, out
        )
    assert len(glob.glob(os.path.join(out, "_MANIFEST_*"))) == 5
    stats = vacuum_manifests(out, keep_last=2)
    assert stats == {"manifests_removed": 3, "snapshots_removed": 3}
    assert len(glob.glob(os.path.join(out, "_MANIFEST_*"))) == 2
    assert len(glob.glob(os.path.join(out, "snap_*"))) == 2
    # newest snapshot still serves
    assert read_published_many(spark, out)["t"].count() == 5
    # idempotent below the threshold
    assert vacuum_manifests(out, keep_last=2) == {
        "manifests_removed": 0,
        "snapshots_removed": 0,
    }

    # a torn manifest never consumes a retention slot: plant one OLDER
    # than the newest complete manifest -> vacuum drops it while the
    # two complete ones survive intact
    torn = os.path.join(out, "_MANIFEST_2")  # number below the head
    with open(torn, "w") as fh:
        fh.write("{not json")
    stats = vacuum_manifests(out, keep_last=2)
    assert stats == {"manifests_removed": 1, "snapshots_removed": 0}
    assert not os.path.exists(torn)
    assert len(glob.glob(os.path.join(out, "_MANIFEST_*"))) == 2
    assert read_published_many(spark, out)["t"].count() == 5


def test_ann_label_probe_dominance(spark, sf_dir):
    """B144: label-aware probing can only help — per query the aware
    hit count >= the post-filter hit count (the candidate-superset
    argument), and at least the verdict column is TRUE everywhere."""
    from near_indexer_for_explorer_spark.operators.similarity import (
        ann_label_probe_recall,
    )

    rows = ann_label_probe_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["aware_geq_post"] is True
        assert r["hits_aware"] >= r["hits_post"]
        assert r["recall_aware"] >= r["recall_post"]


def test_gif_frames_codec_multiframe():
    """B145: the multi-image GIF container round-trips N frames of
    DIFFERENT heights through the real LZW path, and the decoder's
    block walk skips extension blocks between frames."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _gif_frames_codec,
    )

    encode, decode = _gif_frames_codec()
    frames = [bytes(range(10)), bytes(range(100, 180)), b"xyz"]
    gif = encode(frames, width=8)
    decoded = decode(gif)
    assert len(decoded) == 3
    for raw, (w, h, px) in zip(frames, decoded):
        assert w == 8 and h == max(1, -(-len(raw) // 8))
        assert px[: len(raw)] == list(raw)
        assert all(p == 0 for p in px[len(raw) :])

    # an extension block between image blocks is skipped, not fatal
    head_len = 13 + 3 * 256
    ext = b"\x21\xfe\x05hello\x00"  # comment extension
    gif2 = gif[:head_len] + ext + gif[head_len:]
    assert len(decode(gif2)) == 3


def test_scene_cuts_pinned(spark):
    """B146: hand-pinned cut math — identical frames yield zero cuts,
    a flat-vs-bright frame pair crosses the mean-|diff| threshold."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        SCENE_CUT_SCHEMA,
        make_scene_cut_kernel,
    )

    # doc 3: nf = 1 + 3%3 = 1 -> no pairs, no cuts
    # doc 4: nf = 2 -> frames = even-bytes, odd-bytes; payload
    # alternating 0/255 makes every compared position differ by 255
    alternating = bytes([0, 255] * 40)
    out = {
        r["doc_id"]: r
        for r in spark.createDataFrame(
            [(3, b"whatever"), (4, alternating)],
            "doc_id long, payload binary",
        )
        .mapInPandas(make_scene_cut_kernel(), schema=SCENE_CUT_SCHEMA)
        .collect()
    }
    assert out[3]["n_frames"] == 1 and out[3]["n_cuts"] == 0
    assert out[3]["max_delta"] == 0 and out[3]["mean_abs_delta"] == 0.0
    r = out[4]
    assert r["n_frames"] == 2
    # frame0 = 40 zeros, frame1 = 40 times 255 -> delta = 40*255 over a
    # 64-position pair grid (two 32-wide rows... h=2); mean 159.375 > 8
    assert r["n_cuts"] == 1
    assert r["max_delta"] == 40 * 255


def test_audio_windows_pinned(spark):
    """B147: hand-pinned window segmentation — a silent payload (all
    0x80 -> sample 0) yields zero active windows; a loud payload (all
    0x00 -> sample -32768) crosses the RMS threshold in every window;
    the short last window thresholds on ITS length, not the full
    window size."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _AUDIO_WIN,
        AUDIO_WINDOWS_SCHEMA,
        make_audio_windows_kernel,
    )

    silent = b"\x80" * (_AUDIO_WIN + 10)  # 2 windows, all-zero samples
    loud = b"\x00" * (_AUDIO_WIN + 10)  # 2 windows, |s| = 32768
    out = {
        r["doc_id"]: r
        for r in spark.createDataFrame(
            [(1, silent), (2, loud), (3, b"")],
            "doc_id long, payload binary",
        )
        .mapInPandas(make_audio_windows_kernel(), schema=AUDIO_WINDOWS_SCHEMA)
        .collect()
    }
    assert out[1]["n_windows"] == 2 and out[1]["n_active"] == 0
    assert out[1]["max_window_energy"] == 0
    assert out[2]["n_windows"] == 2 and out[2]["n_active"] == 2
    assert out[2]["max_window_energy"] == _AUDIO_WIN * 32768 * 32768
    assert out[3]["n_windows"] == 0 and out[3]["mean_window_energy"] == 0.0


def test_orders_basket_rules_semantics(spark, sf_dir):
    """A119: rule metrics are internally consistent — support =
    pairs/orders, confidence = pairs/n_a, lift symmetric in a<->b up to
    the confidence direction, and every pair meets min support."""
    from near_indexer_for_explorer_spark.plans.relational import (
        _BASKET_MIN_PAIRS,
        orders_basket_rules,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    n_orders = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    rows = orders_basket_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_pairs"] >= _BASKET_MIN_PAIRS
        assert r["n_pairs"] <= min(r["n_a"], r["n_b"])
        assert abs(r["support"] - round(r["n_pairs"] / n_orders, 6)) < 1e-9
        assert abs(r["confidence_a_b"] - round(r["n_pairs"] / r["n_a"], 6)) < 1e-9
        want_lift = round(r["n_pairs"] * n_orders / (r["n_a"] * r["n_b"]), 6)
        assert abs(r["lift"] - want_lift) < 1e-9


def test_events_power_analysis_formula(spark, sf_dir):
    """A120: the per-arm sample size reproduces the two-sample z
    formula from the exact cent moments, and the sufficiency verdict
    matches n against it."""
    from near_indexer_for_explorer_spark.plans.relational import (
        _MDE_REL,
        _Z_ALPHA_2,
        _Z_POWER,
        events_power_analysis,
    )

    rows = events_power_analysis(spark, sf_dir).collect()
    assert rows
    for r in rows:
        mean_c = r["mean_value"] * 100
        var_c = r["var_value"] * 10000
        want = round(
            2 * (_Z_ALPHA_2 + _Z_POWER) ** 2 * var_c / (_MDE_REL * mean_c) ** 2,
            4,
        )
        assert abs(r["n_per_arm"] - want) < 1e-6 * max(1.0, want)
        assert r["observed_n_sufficient"] == (r["n"] >= r["n_per_arm"] or
                                              abs(r["n"] - r["n_per_arm"]) < 1)


def test_events_bootstrap_ci_semantics(spark, sf_dir):
    """A121: the Poisson-bootstrap CI is well-formed — SE positive on
    real data, the CI brackets the point estimate symmetrically, and
    the deterministic weights make the whole estimator replayable
    (two runs byte-identical)."""
    from near_indexer_for_explorer_spark.plans.relational import (
        events_bootstrap_ci,
    )

    rows = events_bootstrap_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["boot_se"] > 0
        assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
        lo_gap = r["mean_value"] - r["ci_lo"]
        hi_gap = r["ci_hi"] - r["mean_value"]
        assert abs(lo_gap - hi_gap) < 2e-6  # symmetric up to rounding
        # the SE of a mean of ~n/arms samples shrinks like 1/sqrt(n):
        # sanity-bound it by the naive sd/sqrt(n) within a loose factor
        assert r["boot_se"] < 10 * (r["mean_value"] + 1)
    again = events_bootstrap_ci(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_events_mann_whitney_against_scipyless_reference(spark):
    """A122: hand-computed rank-sum on a planted frame — known ranks,
    known ties, known U — and the tie correction actually binds."""
    from near_indexer_for_explorer_spark.plans.relational import (
        events_mann_whitney,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    # planted: arm1 (even users) values {1,2,2}, arm2 (odd) {2,4}
    # ranks: 1 -> 1; the three 2s share (2+3+4)/3 = 3; 4 -> 5
    # R1 = 1 + 3 + 3 = 7 -> U1 = 7 - 3*4/2 = 1; u2 = 2
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [
        (1, "t", 2, 0.01),
        (2, "t", 4, 0.02),
        (3, "t", 6, 0.02),
        (4, "t", 1, 0.02),
        (5, "t", 3, 0.04),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "user_id", "value"])
    df = spark.createDataFrame(pdf)
    df = df.withColumn("ts", F.current_timestamp()).withColumn(
        "props", F.lit("{}")
    )
    import near_indexer_for_explorer_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, n: df  # noqa: ARG005
        import near_indexer_for_explorer_spark.plans.relational as rel

        orig_rel = rel.load_table
        rel.load_table = lambda s, d, n: df
        try:
            out = events_mann_whitney(spark, "unused").collect()[0]
        finally:
            rel.load_table = orig_rel
    finally:
        tables.load_table = orig
    assert (out["n1"], out["n2"]) == (3, 2)
    assert out["u2"] == 2
    # z = (U - n1 n2 / 2) / sqrt(var); var = 3*2/12 * (6 - T/(5*4)),
    # T = (3^3 - 3) = 24 -> var = 0.5 * 4.8 = 2.4; z = (1-3)/sqrt(2.4)
    import math

    assert abs(out["z"] - round(-2 / math.sqrt(2.4), 6)) < 1e-9
    assert out["arms_differ"] == (abs(out["z"]) > 1.959964)


def test_discount_elasticity_ols_identity(spark, sf_dir):
    """A123: the reported slope/intercept/r2 reproduce the OLS normal
    equations recomputed from the raw observations in python."""
    from near_indexer_for_explorer_spark.plans.relational import (
        lineitem_discount_elasticity,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    obs = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .selectExpr(
            "p_brand",
            "CAST(round(l_discount * 10000) AS LONG) AS x",
            "CAST(round(l_quantity) AS LONG) AS y",
        )
        .collect()
    )
    by_brand: dict = {}
    for r in obs:
        by_brand.setdefault(r["p_brand"], []).append((r["x"], r["y"]))
    got = {r["p_brand"]: r for r in lineitem_discount_elasticity(spark, sf_dir).collect()}
    assert set(got) == set(by_brand)
    for brand, pts in list(by_brand.items())[:5]:
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        assert abs(got[brand]["slope_per_bp"] - want) < 1e-9
        assert got[brand]["discount_lifts_volume"] == (n * sxy - sx * sy > 0)
        assert 0 <= got[brand]["r2"] <= 1


def test_events_page_after_tie_break_planted(spark, tmp_path):
    """A134 semantics on a planted corpus: the cursor row itself is
    excluded, a SAME-timestamp row with a larger event_id is included
    (the composite tie-break — absent from the synthetic corpus, whose
    timestamps are unique), rows before the cursor never appear, and
    the page is the first k of the (ts, event_id) total order."""
    import datetime as dt

    from near_indexer_for_explorer_spark.plans.relational import (
        _PAGE_CURSOR_TS,
        _PAGE_SIZE,
        events_page_after,
    )

    cur = dt.datetime.fromisoformat(_PAGE_CURSOR_TS)
    rows = [
        (0, cur, 1, "view", 1.0, "{}"),                      # cursor row: out
        (7, cur, 1, "view", 1.0, "{}"),                      # tie-break: in
        (3, cur - dt.timedelta(seconds=1), 1, "view", 1.0, "{}"),  # before: out
    ]
    # 30 rows after the cursor -> the page cuts at _PAGE_SIZE
    rows += [
        (100 + i, cur + dt.timedelta(seconds=i + 1), 1, "view", 1.0, "{}")
        for i in range(30)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    page = events_page_after(spark, str(tmp_path)).collect()
    ids = [r["event_id"] for r in page]
    assert len(ids) == _PAGE_SIZE
    assert ids[0] == 7  # the tie-break row leads the page
    assert ids[1:] == [100 + i for i in range(_PAGE_SIZE - 1)]
    assert 0 not in ids and 3 not in ids


def test_png_meta_scrub_surgical(spark):
    """B149 semantics on hand-built payloads: the injected tEXt chunks
    (and ONLY they) are removed byte-for-byte, pixels survive the
    scrub bit-identically, critical chunks are never touched, and a
    non-PNG payload fails loudly."""
    import pytest

    from near_indexer_for_explorer_spark.multimodal import decode as D

    encode_gray, decode_pixels = D._png_codec()
    clean = encode_gray(b"scrub me", 32)
    meta = D.png_text_chunk(b"Author", b"user_1") + D.png_text_chunk(
        b"GPS", b"13,7"
    )
    tagged = D.png_insert_after_ihdr(clean, meta)
    scrubbed, n, removed = D.png_scrub_ancillary(tagged)
    assert (n, removed) == (2, len(meta))
    assert scrubbed == clean  # byte-identical to the pre-injection PNG
    assert decode_pixels(scrubbed) == decode_pixels(tagged)
    # scrubbing a clean PNG is a no-op
    assert D.png_scrub_ancillary(clean) == (clean, 0, 0)
    with pytest.raises(ValueError, match="not a PNG"):
        D.png_scrub_ancillary(b"GIF87a junk")

    # through Spark: the kernel reports the exact injected byte count
    df = spark.createDataFrame([(5, b"abc")], "doc_id long, payload binary")
    (r,) = df.mapInPandas(
        D.make_png_meta_scrub_kernel(), schema=D.PNG_META_SCRUB_SCHEMA
    ).collect()
    want_meta = len(
        D.png_text_chunk(b"Author", b"user_5") + D.png_text_chunk(b"GPS", b"65,35")
    )
    assert r["meta_bytes_removed"] == want_meta
    assert r["pixels_identical"] and r["px_sum"] == sum(b"abc")


def test_text_code_detect_routes_planted_corpus(spark, tmp_path):
    """B148 semantics: the pseudo-code form scores above the
    threshold, plain prose scores ~0, and the detector measures the
    TEXT (a hand-planted code-looking prose doc is routed as code even
    though doc_id % 4 != 0 — no construction-spec branch)."""
    rows = [
        (0, "plain words here", "en", "s0", 16),       # -> code form
        (1, "just some prose words", "en", "s0", 21),  # prose
        (2, "x = [1]; y = (2);\n    z = [];", "en", "s0", 29),  # code-y text
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    from near_indexer_for_explorer_spark.operators.textops import (
        text_code_detect,
    )

    got = {
        r["doc_id"]: r for r in text_code_detect(spark, str(tmp_path)).collect()
    }
    assert got[0]["is_code"] and got[0]["indent_lines"] >= 2
    assert not got[1]["is_code"] and got[1]["symbol_count"] == 0
    assert got[2]["is_code"]  # routed by MEASUREMENT, not by doc_id


def test_kmeans_books_fused_matches_per_subspace_chains(spark, sf_dir):
    """r14: the fused multi-tag Lloyd chain must reproduce the
    per-subspace `_kmeans_centroids` trainings row for row — seeds,
    packed-argmin assignment and exact-decimal recenter are the same
    arithmetic, only the plan is fused (one tower instead of one per
    subspace).  Checked on the real sf corpus for the PQ slicing AND
    for a two-column (emb, rot_emb) mixed-source tag set (the OPQ
    16-tag shape)."""
    import pyspark.sql.functions as F

    import near_indexer_for_explorer_spark.operators.similarity as sim

    e = sim._vectors(spark, sf_dir)
    mod = sim._train_mod(sf_dir)

    # PQ shape: 8 tags slicing one column
    fused = sim._pq_books_long_from(e, mod)
    expected = []
    for s, book in enumerate(sim._pq_codebooks_from(e, mod)):
        expected += [
            (s, r["centroid_id"], tuple(r["c_emb"])) for r in book.collect()
        ]
    got = [
        (r["s"], r["centroid_id"], tuple(r["c_emb"])) for r in fused.collect()
    ]
    assert sorted(got) == sorted(expected)

    # OPQ shape: 16 tags over two source columns, split back per space
    rotated = sim._opq_rotated(e)
    books_o, books_r = sim._opq_books_from(rotated, mod)
    for got_df, space_col in ((books_o, "emb"), (books_r, "rot_emb")):
        ref_e = rotated.select("vec_id", F.col(space_col).alias("emb"))
        expected = []
        for s, book in enumerate(sim._pq_codebooks_from(ref_e, mod)):
            expected += [
                (s, r["centroid_id"], tuple(r["c_emb"]))
                for r in book.collect()
            ]
        got = [
            (r["s"], r["centroid_id"], tuple(r["c_emb"]))
            for r in got_df.collect()
        ]
        assert sorted(got) == sorted(expected)
