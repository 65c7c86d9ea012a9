"""Round-7 operators: df-capped span dedup, IVM aggregate delta, and the
concurrency-adjacent store behaviors not covered by test_merge_store."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_span_capped_nonbinding_cap_equals_uncapped(spark):
    """With a cap no gram can exceed, the hash-keyed capped detector must
    report EXACTLY the uncapped detector's (pair, span) multiset — the cap
    and md5 keying change the plan, never the semantics."""
    from mongraph_spark.queries.dedup import (
        MIN_SPAN,
        SPAN_GRAM,
        span_boiler_corpus,
        span_pairs,
        span_pairs_capped,
    )

    corpus = span_boiler_corpus(spark, SF).localCheckpoint(eager=True)
    capped, _ = span_pairs_capped(corpus, SPAN_GRAM, MIN_SPAN, df_cap=1_000_000_000)
    got = sorted(
        (r.id_a, r.id_b, r.span_tokens) for r in capped.collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.span_tokens) for r in span_pairs(corpus, SPAN_GRAM, MIN_SPAN).collect()
    )
    assert got == want and len(got) > 0


def test_span_capped_drops_boilerplate_keeps_planted(spark):
    """The summary's own invariants: boilerplate mass is actually dropped
    (n_occ_dropped > 0), the reported span count stays orders below the
    avoided quadratic pair count, and planted-truth recall is positive with
    full-span hits a subset of pair hits."""
    from mongraph_spark.queries.dedup import dedup_span_capped, span_pairs_capped
    from mongraph_spark.queries.dedup import (
        MIN_SPAN,
        SPAN_DF_CAP,
        SPAN_GRAM,
        span_boiler_corpus,
    )

    row = dedup_span_capped(spark, SF).first()
    assert row.n_occ_dropped > 0
    assert 0 < row.n_pairs_found <= row.n_true_pairs
    assert row.n_full_found <= row.n_pairs_found
    assert row.recall_bp == 10000 * row.n_pairs_found // row.n_true_pairs
    spans, _ = span_pairs_capped(
        span_boiler_corpus(spark, SF), SPAN_GRAM, MIN_SPAN, SPAN_DF_CAP
    )
    n_spans = spans.count()
    # the C(n_boiler, 2) blowup is avoided, not just reduced
    assert n_spans < row.boiler_pairs_avoided / 10


def test_ivm_agg_delta_identity_and_group_moves(spark):
    """Every group's maintained view must equal the full recompute, the
    group-changing update must materialize the 'moved' group (absent at
    v0), and deltas must be nonzero somewhere (the mutations did work)."""
    from mongraph_spark.queries.quality import ivm_agg_delta

    rows = ivm_agg_delta(spark, SF).collect()
    assert rows and all(r.identity_holds for r in rows)
    by_src = {r.source: r for r in rows}
    assert "moved" in by_src and by_src["moved"].n_docs_v0 == 0
    assert by_src["moved"].n_docs_full > 0
    assert any(r.d_docs != 0 or r.d_chars != 0 for r in rows)
    # maintained arithmetic is literally v0 + delta
    for r in rows:
        assert r.n_docs_maintained == r.n_docs_v0 + r.d_docs
        assert r.sum_chars_maintained == r.sum_chars_v0 + r.d_chars


def test_streaming_span_dedup_equals_batch_detector(spark):
    """The micro-batched incremental gram-index twin must report EXACTLY the
    batch detector's span set on the same corpus (pair-normalized, so the
    equality holds regardless of arrival batching)."""
    from mongraph_spark.queries.dedup import dedup_span_exact
    from mongraph_spark.streaming.events import streaming_span_dedup

    got = sorted(map(tuple, streaming_span_dedup(spark, SF).collect()))
    want = sorted(map(tuple, dedup_span_exact(spark, SF).collect()))
    assert got == want and len(got) > 0


def test_bpe_train_matches_independent_python_replay(spark):
    """The distributed trainer must learn EXACTLY the merge list an
    independent single-process BPE trainer learns on the same corpus —
    same pairs, same order, same selection counts, same post-merge corpus
    token totals (this also pins the count-DESC/pair-ASC tie-break)."""
    import collections
    import re

    from mongraph_spark.queries.text import BPE_TRAIN_ROUNDS, text_bpe_train
    from mongraph_spark.sparkutil import read_table

    got = [tuple(r) for r in text_bpe_train(spark, SF).collect()]

    texts = [r.text for r in read_table(spark, SF, "documents").select("text").collect()]
    state = [re.sub(r"(.)", lambda m: m.group(1) + " ", t.lower()) for t in texts]
    want = []
    for rank in range(1, BPE_TRAIN_ROUNDS + 1):
        cnt = collections.Counter()
        for t in state:
            toks = t.split(" ")
            for a, b in zip(toks, toks[1:]):
                if a and b:
                    cnt[(a, b)] += 1
        (w1, w2), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        state = [t.replace(f"{w1} {w2}", w1 + w2) for t in state]
        n_after = sum(len([x for x in t.split(" ") if x]) for t in state)
        want.append((rank, w1, w2, c, n_after))
    assert got == want


def test_bpe_train_token_totals_strictly_decrease(spark):
    """Each merge must strictly shrink the corpus (it rewrites a pair that
    occurred at selection time), and later merges can never beat an earlier
    round's count by more than the corpus allows (counts need not be
    monotone, but totals must be)."""
    from mongraph_spark.queries.text import text_bpe_train

    rows = sorted(text_bpe_train(spark, SF).collect(), key=lambda r: r.merge_rank)
    totals = [r.n_tokens_after for r in rows]
    assert all(a > b for a, b in zip(totals, totals[1:]))
    assert all(r.pair_count > 0 for r in rows)


def test_semdedup_planted_recall_and_keep_rule(spark):
    """Cluster pruning must still catch most planted copy-pairs (a copy can
    land in a different cell than its original — that loss is the operator's
    honest recall), every caught pair must be a planted one on this corpus
    (random vectors don't hit cosine >= 0.9), and the keep rule drops at
    most one member per pair (n_dropped <= n_dup_pairs per cell)."""
    from mongraph_spark.queries.dedup import dedup_semdedup
    from mongraph_spark.sparkutil import read_table

    rows = dedup_semdedup(spark, SF).collect()
    n_emb = read_table(spark, SF, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == 2 * n_emb
    total_pairs = sum(r.n_dup_pairs for r in rows)
    total_planted = sum(r.n_planted_pairs for r in rows)
    assert total_planted == total_pairs  # no false positives on this corpus
    assert total_planted > 0.7 * n_emb  # cluster pruning keeps most truth
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_dup_pairs


def test_dsir_en_slice_dominates(spark):
    """The target (en) slice must rank highest under its own importance
    model: strictly the largest above-corpus-mean share AND the largest
    mean score of any language (both compared with exact integer
    cross-multiplication, mirroring the operator's own arithmetic)."""
    from mongraph_spark.queries.corpus import corpus_dsir_weights

    rows = {r.lang: r for r in corpus_dsir_weights(spark, SF).collect()}
    en = rows.pop("en")
    assert rows  # other languages exist
    for r in rows.values():
        # share: en.n_above/en.n > r.n_above/r.n
        assert en.n_above_mean * r.n_docs > r.n_above_mean * en.n_docs
        # mean score: en.sum/en.n > r.sum/r.n  (scores are negative ints)
        assert en.sum_score_micro * r.n_docs > r.sum_score_micro * en.n_docs


def test_streaming_ivm_agg_equals_batch_twin(spark):
    """The stream-maintained view must hold the identity per group AND be
    row-for-row equal to the batch IVM twin (same history, same output
    contract) — micro-batch boundaries cannot perturb commutative signed
    contributions."""
    from mongraph_spark.queries.quality import ivm_agg_delta
    from mongraph_spark.streaming.events import streaming_ivm_agg

    got = sorted(map(tuple, streaming_ivm_agg(spark, SF).collect()))
    assert got and all(r[-1] for r in got)  # identity_holds everywhere
    want = sorted(map(tuple, ivm_agg_delta(spark, SF).collect()))
    assert got == want


def test_matryoshka_full_width_anchor_and_shape(spark):
    """The full-width row IS the truth (recall exactly 10000), every width
    has exactly one row, hits are bounded by n_queries*K, and the widest
    truncation can never beat full width."""
    from mongraph_spark.queries.similarity import (
        MATRYOSHKA_DIMS,
        N_QUERIES,
        TOP_K,
        ann_matryoshka_curve,
    )

    rows = {r.dim: r for r in ann_matryoshka_curve(spark, SF).collect()}
    assert sorted(rows) == MATRYOSHKA_DIMS
    full = rows[MATRYOSHKA_DIMS[-1]]
    assert full.recall_bp == 10000 and full.n_hits == N_QUERIES * TOP_K
    for d, r in rows.items():
        assert 0 <= r.n_hits <= N_QUERIES * TOP_K
        assert r.recall_bp == (10000 * r.n_hits) // (N_QUERIES * TOP_K)


def test_bpe_apply_totals_match_trainer_final_count(spark):
    """text_bpe_apply's docstring contract: encoding with the learned
    merges and counting tokens the trainer's way must reproduce the
    trainer's own final n_tokens_after exactly (summed over sources), and
    the learned-merge path must differ from nothing-learned char counts
    (compression actually happened: fertility < chars-per-word)."""
    from mongraph_spark.queries.text import (
        BPE_TRAIN_ROUNDS,
        text_bpe_apply,
        text_bpe_train,
    )

    trained = text_bpe_train(spark, SF).collect()
    assert len(trained) == BPE_TRAIN_ROUNDS
    final_total = max(r.n_tokens_after for r in trained if r.merge_rank == BPE_TRAIN_ROUNDS)
    applied = text_bpe_apply(spark, SF).collect()
    assert sum(r.n_bpe_tokens for r in applied) == final_total
    for r in applied:
        assert r.n_bpe_tokens < 10000 * r.n_words  # sanity: finite fertility
        assert r.fertility_bp == 10000 * r.n_bpe_tokens // r.n_words
        assert r.chars_per_token_bp > 10000  # >1 char per token: merges bought compression


def test_streaming_lsh_dedup_equals_batch_twin(spark):
    """The ingest-path LSH twin's contract: the union of per-batch verified
    pairs must equal dedup_ngram_jaccard on the full corpus, row for row
    (cross pairs match when the later doc arrives, intra pairs when both
    share a batch — exactly once either way)."""
    from mongraph_spark.queries.dedup import dedup_ngram_jaccard
    from mongraph_spark.streaming.events import streaming_lsh_dedup

    got = sorted(map(tuple, streaming_lsh_dedup(spark, SF).collect()))
    want = sorted(map(tuple, dedup_ngram_jaccard(spark, SF).collect()))
    assert got == want and len(got) > 0


def test_hybrid_rrf_fusion_algebra(spark):
    """search_hybrid_rrf pins: 10 fused rows per anchor with dense ranks
    1..10, every candidate came from at least one branch's top-L, and
    rrf_ppb is EXACTLY the integer RRF of the reported branch ranks
    (floor(1e9/(60+rank)) per present branch, absent branch contributes 0)."""
    from mongraph_spark.queries.search import (
        HY_ANCHORS,
        HY_L,
        HY_TOP,
        RRF_K,
        RRF_SCALE,
        search_hybrid_rrf,
    )

    rows = search_hybrid_rrf(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert sorted(by_q) == list(range(HY_ANCHORS))
    for q, rs in by_q.items():
        assert sorted(r.fused_rank for r in rs) == list(range(1, HY_TOP + 1))
        for r in rs:
            assert r.lex_rank != -1 or r.dense_rank != -1
            assert r.c_id != q
            want = 0
            for rk in (r.lex_rank, r.dense_rank):
                if rk != -1:
                    assert 1 <= rk <= HY_L
                    want += RRF_SCALE // (RRF_K + rk)
            assert r.rrf_ppb == want


def test_streaming_ann_ivf_equals_frozen_quantizer_replay(spark):
    """The ingest-path IVF twin's contract: train-once on the first ntile(4)
    arrival group + incremental list appends must equal a batch replay with
    the SAME frozen quantizer (centroids from the first group, lists over
    the full corpus) — and the fused index must actually contain vectors
    that arrived after training (accumulation is visible in the top-k)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mongraph_spark.queries.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
        _ivf_centroids,
        _ivf_lists,
        _ivf_probe_score,
    )
    from mongraph_spark.sparkutil import const_part, read_table
    from mongraph_spark.streaming.events import streaming_ann_ivf

    got = sorted(map(tuple, streaming_ann_ivf(spark, SF).collect()))

    emb = read_table(spark, SF, "embeddings")
    first = (
        emb.withColumn(
            "arrival",
            F.ntile(4).over(
                Window.partitionBy(const_part(F.col("vec_id"))).orderBy("vec_id")
            ),
        )
        .filter(F.col("arrival") == 1)
        .select("vec_id", "embedding")
    )
    cents = _ivf_centroids(first)
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    lists = _ivf_lists(vecs, cents)
    queries = lists.filter(F.col("c_id") < N_QUERIES).select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_bp"), F.asc("c_id"))
    want = sorted(
        map(
            tuple,
            _ivf_probe_score(lists, queries, cents, IVF_NPROBE)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("q_id", "c_id", "cos_bp", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) == N_QUERIES * TOP_K
    first_sz = first.count()
    assert any(c_id >= first_sz for (_, c_id, _, _) in got)  # post-training arrivals retrieved


def test_ddsketch_error_bound_and_mergeability(spark):
    """sketch_ddsketch_quantiles pins: the bucket-wise-merged per-priority
    sketches reproduce the directly-built global sketch's estimate EXACTLY
    (mergeability), every estimate is a lower bound within the documented
    <1/17 relative-error guarantee (≤600bp with the /16 edge floor), and
    the synopsis stays O(#buckets) — tiny next to the row count."""
    from mongraph_spark.queries.relational import sketch_ddsketch_quantiles
    from mongraph_spark.sparkutil import read_table

    rows = {r.p: r for r in sketch_ddsketch_quantiles(spark, SF).collect()}
    assert sorted(rows) == [50, 90, 99]
    n = read_table(spark, SF, "orders").count()
    for p, r in rows.items():
        assert r.est_merged_cents == r.est_cents  # bucket-wise sum == direct build
        assert r.est_cents <= r.exact_cents  # lower-edge estimate
        assert 0 <= r.rel_err_bp <= 600  # < 1/17 relative error, pinned
        assert r.n_buckets < n // 10  # synopsis, not a copy of the data


def test_rendezvous_movement_is_one_over_n(spark):
    """pipeline_rendezvous_shards pins: growing 8→9 shards moves ~1/9 of
    docs (the HRW theorem — binomial-banded around 11.1%), every doc that
    lands on the NEW shard 8 arrived by definition, per-shard accounting
    conserves (stayed+arrived = n_at9, Σn_at8 = Σn_at9 = corpus), and
    balance holds (no shard 2× the mean)."""
    from mongraph_spark.queries.pipeline import (
        RV_SHARDS_NEW,
        pipeline_rendezvous_shards,
    )

    rows = {r.shard: r for r in pipeline_rendezvous_shards(spark, SF).collect()}
    assert sorted(rows) == list(range(RV_SHARDS_NEW))
    total = sum(r.n_at9 for r in rows.values())
    assert sum(r.n_at8 for r in rows.values()) == total
    moved = sum(r.arrived for r in rows.values())
    assert 0.06 * total <= moved <= 0.17 * total  # E[moved] = total/9
    newest = rows[RV_SHARDS_NEW - 1]
    assert newest.stayed == 0 and newest.n_at8 == 0  # shard 8 didn't exist at n=8
    for r in rows.values():
        assert r.stayed + r.arrived == r.n_at9
        assert r.n_at9 <= 2 * total // RV_SHARDS_NEW  # balance


def test_cluster_split_repair_zeroes_leakage(spark):
    """The cluster-granularity split must (a) zero the verified cross-split
    pair count that the doc-level rule leaks, (b) never move a singleton
    (cluster label == doc_id ⇒ same md5 bucket), and (c) conserve docs —
    the movement matrix totals the dup corpus exactly."""
    from mongraph_spark.queries.dedup import dup_corpus
    from mongraph_spark.queries.pipeline import corpus_cluster_split

    rows = corpus_cluster_split(spark, SF).collect()
    assert len(rows) > 0
    # (a) repair meter: doc-level leaks, cluster-level leaks nothing
    assert all(r.leaked_pairs_cluster_split == 0 for r in rows)
    assert rows[0].leaked_pairs_doc_split > 0
    # (c) conservation: matrix covers every doc of the dup corpus once
    n_docs = dup_corpus(spark, SF, drop_last=1).count()
    assert sum(r.n_docs for r in rows) == n_docs
    # (b) movement is bounded by the non-singleton (dup-cluster) mass
    moved = sum(r.n_docs for r in rows if r.doc_split != r.cluster_split)
    from mongraph_spark.queries.dedup import _shingled_corpus
    from mongraph_spark.queries.pipeline import _cluster_labels

    shingled = _shingled_corpus(spark, SF, drop_last=1)
    labels = _cluster_labels(shingled)
    non_singleton = (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > 1)
        .agg(F.sum("sz"))
        .collect()[0][0]
        or 0
    )
    assert moved <= non_singleton


def test_ccnet_buckets_invariants(spark):
    """CCNet-filter contract per language: (a) tercile xent ceilings are
    strictly monotone head < middle < tail, (b) the curated reference
    slice concentrates in the head (the model recognizes its own domain),
    (c) terciles are balanced within one doc, (d) the matrix conserves the
    scored corpus."""
    from collections import defaultdict

    from mongraph_spark.queries.corpus import corpus_ccnet_buckets
    from mongraph_spark.sparkutil import read_table

    rows = corpus_ccnet_buckets(spark, SF).collect()
    per_lang = defaultdict(dict)
    for r in rows:
        per_lang[r.lang][r.bucket] = r
    assert set(per_lang)  # at least one language scored
    for lang, b in per_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        assert (
            b["head"].max_xent_cb < b["middle"].max_xent_cb < b["tail"].max_xent_cb
        ), lang
        assert b["head"].n_ref_docs > b["middle"].n_ref_docs + b["tail"].n_ref_docs
        sizes = [b[k].n_docs for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    n_docs = read_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_semantic_decon_flags_planted_cross_split_copies(spark):
    """Every planted (original, tail-zeroed copy) pair that (a) crosses the
    train/eval boundary and (b) actually clears the cosine threshold —
    cos(orig, copy) = ‖head‖/‖orig‖, which varies with the random tail
    energy — must be flagged with the planted partner as the best train
    match (unrelated 64-d vectors never get close to 0.9)."""
    import hashlib
    import math

    from mongraph_spark.queries.dedup import (
        COS_THRESHOLD_BP,
        ID_SHIFT,
        SEM_TRAIN_LT,
        ZERO_TAIL,
        corpus_semantic_decon,
    )
    from mongraph_spark.sparkutil import read_table

    def split_of(vid: int) -> str:
        b = int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < SEM_TRAIN_LT else "eval"

    embs = read_table(spark, SF, "embeddings").collect()
    expected = {}  # eval_id -> its planted train partner
    n_crossing = 0
    for r in embs:
        vid, vec = r.vec_id, [float(x) for x in r.embedding]
        head = sum(x * x for x in vec[: len(vec) - ZERO_TAIL])
        total = sum(x * x for x in vec)
        cos_bp = math.floor(10000 * math.sqrt(head) / math.sqrt(total))
        cid = vid + ID_SHIFT
        cross = {split_of(vid), split_of(cid)} == {"train", "eval"}
        n_crossing += cross
        if not (cross and cos_bp >= COS_THRESHOLD_BP):
            continue
        if split_of(vid) == "train":
            expected[cid] = vid
        else:
            expected[vid] = cid
    assert n_crossing > 0, "corpus too small: no planted pair crosses the boundary"
    assert expected, "no crossing pair clears the threshold at this SF"
    rows = {r.eval_id: r for r in corpus_semantic_decon(spark, SF).collect()}
    missing = set(expected) - set(rows)
    assert not missing, f"planted cross-split copies not flagged: {missing}"
    for eval_id, partner in expected.items():
        r = rows[eval_id]
        assert r.best_train_id == partner, (eval_id, r.best_train_id, partner)
        assert r.best_cos_bp >= COS_THRESHOLD_BP


def test_unimax_waterfill_invariants(spark):
    """UniMax contract: (a) no language exceeds its epoch cap, (b) capped
    languages sit EXACTLY at the cap, (c) uncapped languages share one
    water line that is ≥ every capped language's cap (else the fill would
    be non-uniform), and (d) the allocation exhausts the budget up to
    integer-division remainder (< n_uncapped tokens)."""
    from mongraph_spark.queries.corpus import (
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_EPOCH_CAP,
        corpus_unimax_budget,
    )

    rows = corpus_unimax_budget(spark, SF).collect()
    assert rows
    total_tokens = sum(r.n_tokens for r in rows)
    budget = total_tokens * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN
    capped = [r for r in rows if r.is_capped == 1]
    uncapped = [r for r in rows if r.is_capped == 0]
    for r in rows:
        assert r.alloc_tokens <= r.cap_tokens
        assert r.cap_tokens == UNIMAX_EPOCH_CAP * r.n_tokens
        assert r.epochs_bp == 10000 * r.alloc_tokens // r.n_tokens
    for r in capped:
        assert r.alloc_tokens == r.cap_tokens and r.epochs_bp == 10000 * UNIMAX_EPOCH_CAP
    if uncapped:
        lines = {r.alloc_tokens for r in uncapped}
        assert len(lines) == 1  # one shared water line
        line = lines.pop()
        assert all(line >= r.cap_tokens for r in capped)
        spent = sum(r.alloc_tokens for r in rows)
        assert 0 <= budget - spent < len(uncapped)
    else:
        assert sum(r.alloc_tokens for r in rows) <= budget


def test_ccnet_sketch_cutoffs_guarantee(spark):
    """The sketch-cutoff path must honor DDSketch's contract: each cutoff
    is the lower edge of the bucket holding the rank-target value, so
    cut ≤ v_target and v_target − cut ≤ v_target/256 + 1; buckets conserve
    the scored corpus, cut33 ≤ cut67, and boundary movement vs the exact
    terciles stays a small fraction."""
    from collections import defaultdict

    from mongraph_spark.queries.corpus import (
        ccnet_model,
        ccnet_score,
        corpus_ccnet_sketch_cutoffs,
    )
    from mongraph_spark.sparkutil import read_table

    rows = corpus_ccnet_sketch_cutoffs(spark, SF).collect()
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r.lang].append(r)
    docs = read_table(spark, SF, "documents")
    scored = ccnet_score(docs, *ccnet_model(docs)).collect()
    xents = defaultdict(list)
    for s in scored:
        xents[s.lang].append(s.xent_cb)
    for lang, cells in per_lang.items():
        vals = sorted(xents[lang])
        n = len(vals)
        assert sum(c.n_docs for c in cells) == n  # conservation
        cut33, cut67 = cells[0].cut33, cells[0].cut67
        assert cut33 <= cut67
        for p, cut in ((33, cut33), (67, cut67)):
            v = vals[(p * n + 99) // 100 - 1]
            assert cut <= v and v - cut <= v // 256 + 1, (lang, p, cut, v)
        moved = sum(c.n_moved for c in cells)
        assert moved <= max(2, n // 5), (lang, moved, n)


def test_neyman_allocation_exact_integer_replay(spark):
    """The whole allocation must replay exactly in python from the raw
    cents (same decimal-exact variance numerator, same cent-grid sqrt
    quantization, same largest-remainder) and sum to the budget exactly;
    the max-weight stratum can never receive less than the min-weight
    one."""
    import math
    from collections import defaultdict

    from mongraph_spark.queries.relational import (
        NEYMAN_BUDGET,
        stats_neyman_allocation,
    )
    from mongraph_spark.sparkutil import read_table

    rows = {r.priority: r for r in stats_neyman_allocation(spark, SF).collect()}
    assert sum(r.alloc_neyman for r in rows.values()) == NEYMAN_BUDGET

    cents = defaultdict(list)
    for o in read_table(spark, SF, "orders").select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    ).collect():
        cents[o.o_orderpriority].append(o.c)
    w = {}
    for p, xs in cents.items():
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        s_cents = math.floor(math.sqrt(n * sxx - sx * sx) / n)
        assert rows[p].s_cents == s_cents
        assert rows[p].mean_cents == math.floor(sx / n)  # sx/n float ok at SF
        w[p] = n * s_cents
    w_sum = sum(w.values())
    base = {p: NEYMAN_BUDGET * wh // w_sum for p, wh in w.items()}
    rem = sorted(
        w, key=lambda p: (-(NEYMAN_BUDGET * w[p] % w_sum), p)
    )
    k = NEYMAN_BUDGET - sum(base.values())
    for i, p in enumerate(rem):
        base[p] += 1 if i < k else 0
    for p in w:
        assert rows[p].alloc_neyman == base[p], (p, rows[p].alloc_neyman, base[p])
    wmax = max(w, key=lambda p: (w[p], p))
    wmin = min(w, key=lambda p: (w[p], p))
    assert rows[wmax].alloc_neyman >= rows[wmin].alloc_neyman


def test_ams_f2_exact_python_replay_and_unbiasedness_shape(spark):
    """Every estimator's signed sum must replay exactly in python from the
    md5 parities; the median-of-squares and exact-F2 arithmetic must
    match; and the estimate must be within the coarse 8-estimator band
    (|err| sanity, not a theorem — the exact replay IS the contract)."""
    import hashlib
    from collections import Counter

    from mongraph_spark.queries.events import AMS_D, events_ams_f2
    from mongraph_spark.sparkutil import read_table

    rows = sorted(events_ams_f2(spark, SF).collect(), key=lambda r: r.j)
    users = [
        r.user_id for r in read_table(spark, SF, "events").select("user_id").collect()
    ]

    def sign(j, u):
        h = int(hashlib.md5(f"{j}:{u}".encode()).hexdigest()[:8], 16) % 2
        return 1 - 2 * h

    for j in range(AMS_D):
        want = sum(sign(j, u) for u in users)
        assert rows[j].x == want and rows[j].x2 == want * want, (j, rows[j].x, want)
    x2s = sorted((r.x2, r.j) for r in rows)
    want_med = (x2s[AMS_D // 2 - 1][0] + x2s[AMS_D // 2][0]) // 2
    exact = sum(c * c for c in Counter(users).values())
    for r in rows:
        assert r.f2_med_est == want_med
        assert r.exact_f2 == exact
        assert r.abs_err_bp == 10000 * abs(want_med - exact) // exact


def test_streaming_ams_equals_batch(spark):
    """Signed sums are associative: the one-state-row streaming sketch
    must reproduce the batch accumulator row register-exactly, hence the
    identical finisher output."""
    from mongraph_spark.queries.events import events_ams_f2
    from mongraph_spark.streaming.events import streaming_ams_f2

    got = sorted(map(tuple, streaming_ams_f2(spark, SF).collect()))
    want = sorted(map(tuple, events_ams_f2(spark, SF).collect()))
    assert got == want


def test_neyman_degenerate_zero_variance_falls_back_proportional(spark):
    """All-constant strata give every weight 0; the allocator must fall
    back to proportional weights instead of dividing by zero, and still
    exhaust the budget exactly."""
    from mongraph_spark.queries.relational import NEYMAN_BUDGET, neyman_allocate

    df = spark.createDataFrame(
        [("a", 100)] * 30 + [("b", 100)] * 10, "priority string, cents long"
    )
    rows = {r.priority: r for r in neyman_allocate(df).collect()}
    assert all(r.s_cents == 0 for r in rows.values())
    assert sum(r.alloc_neyman for r in rows.values()) == NEYMAN_BUDGET
    assert rows["a"].alloc_neyman == NEYMAN_BUDGET * 30 // 40
    assert rows["a"].alloc_proportional == NEYMAN_BUDGET * 30 // 40


def test_kaplan_meier_exact_python_replay(spark):
    """The whole product-limit estimate must replay exactly in python from
    per-user (first_day, last_day): same churn/censor split, same at-risk
    ladder, same floored micro-nat log-survival, and survival must be
    non-increasing across steps."""
    import math
    from collections import Counter

    from mongraph_spark.queries.events import events_kaplan_meier
    from mongraph_spark.sparkutil import read_table

    rows = sorted(events_kaplan_meier(spark, SF).collect(), key=lambda r: r.t)
    assert rows
    ev = read_table(spark, SF, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    spans = {}
    for r in ev.collect():
        lo, hi = spans.get(r.user_id, (r.day, r.day))
        spans[r.user_id] = (min(lo, r.day), max(hi, r.day))
    end = max(hi for _, hi in spans.values())
    d, c = Counter(), Counter()
    for lo, hi in spans.values():
        t = (hi - lo).days
        (d if hi < end else c)[t] += 1
    ts = sorted(set(d) | set(c))
    at_risk, run = {}, 0
    for t in sorted(ts, reverse=True):
        run += d[t] + c[t]
        at_risk[t] = run
    lnS, got_i, prev_bp = 0.0, 0, None
    for t in ts:
        if d[t] > 0 and d[t] < at_risk[t]:
            lnS += math.log(1.0 - d[t] / at_risk[t])
        if d[t] > 0:
            r = rows[got_i]
            got_i += 1
            assert (r.t, r.n_at_risk, r.d, r.c) == (t, at_risk[t], d[t], c[t])
            if d[t] < at_risk[t]:
                assert r.neg_ln_s_micro == math.floor(-1e6 * lnS)
            if prev_bp is not None:
                assert r.surv_bp <= prev_bp
            prev_bp = r.surv_bp
    assert got_i == len(rows)


def test_mann_whitney_exact_python_replay(spark):
    """Doubled tie-averaged ranks, U, tie correction, and the bp-floored
    z² must all replay exactly in python from the raw cents."""
    from collections import Counter

    from mongraph_spark.queries.relational import (
        MW_GROUP_A,
        MW_GROUP_B,
        stats_mann_whitney,
    )
    from mongraph_spark.sparkutil import read_table

    row = stats_mann_whitney(spark, SF).first()
    data = [
        (r.o_orderpriority, int(round(r.o_totalprice * 100)))
        for r in read_table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
        if r.o_orderpriority in (MW_GROUP_A, MW_GROUP_B)
    ]
    vals = sorted(c for _, c in data)
    # doubled tie-averaged rank per value: (min_rank + max_rank)
    first = {}
    for i, v in enumerate(vals, 1):
        first.setdefault(v, i)
    tie = Counter(vals)
    dr2 = {v: 2 * first[v] + tie[v] - 1 for v in tie}
    n_a = sum(1 for g, _ in data if g == MW_GROUP_A)
    n_b = len(data) - n_a
    r2_a = sum(dr2[c] for g, c in data if g == MW_GROUP_A)
    u2 = r2_a - n_a * (n_a + 1)
    mu2 = n_a * n_b
    t_term = sum(t**3 - t for t in tie.values())
    n = n_a + n_b
    z2_bp = (
        10000 * (u2 - mu2) ** 2 * 3 * n * (n - 1)
    ) // (n_a * n_b * (n**3 - n - t_term))
    assert (row.n_a, row.n_b, row.u2_a, row.mu2, row.tie_term) == (
        n_a,
        n_b,
        u2,
        mu2,
        t_term,
    )
    assert row.z2_bp == z2_bp
    assert row.significant_95 == (1 if z2_bp >= 38416 else 0)


def test_spearman_exact_python_replay(spark):
    """Spearman on doubled tie-averaged ranks and the contrast Pearson
    must replay in python to the same bp floor; Spearman must be
    invariant to a monotone transform of revenue (rank property) while
    Pearson is not pinned to be."""
    import math
    from collections import Counter, defaultdict

    from mongraph_spark.queries.relational import stats_spearman_corr
    from mongraph_spark.sparkutil import read_table

    row = stats_spearman_corr(spark, SF).first()
    per = defaultdict(lambda: [0, 0])
    for r in (
        read_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .collect()
    ):
        per[r.l_orderkey][0] += 1
        per[r.l_orderkey][1] += int(round(r.l_extendedprice * 100))
    pairs = [(q, p) for q, p in per.values()]
    n = len(pairs)

    def dranks(vals):
        first, tie = {}, Counter(vals)
        for i, v in enumerate(sorted(vals), 1):
            first.setdefault(v, i)
        return [2 * first[v] + tie[v] - 1 for v in vals]

    def corr_bp(xs, ys):
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        return math.floor(
            10000
            * float(n * sxy - sx * sy)
            / (math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy)))
        )

    qs = [q for q, _ in pairs]
    ps = [p for _, p in pairs]
    dq, dp = dranks(qs), dranks(ps)
    assert row.n_rows == n
    assert row.spearman_bp == corr_bp(dq, dp)
    assert row.pearson_bp == corr_bp(qs, ps)
    # rank property: squaring revenue (monotone) leaves Spearman unchanged
    assert corr_bp(dq, dranks([p * p for p in ps])) == row.spearman_bp


def test_did_exact_python_replay(spark):
    """The four-cell table and the micro-cent DiD estimate must replay
    exactly in python (Fraction arithmetic — the alternating sum of four
    exact rationals, floored toward -inf as both engines do via the
    sign-split)."""
    from fractions import Fraction

    from mongraph_spark.queries.events import (
        DID_CUT_DAYS,
        DID_TREAT_MOD,
        events_did,
    )
    from mongraph_spark.sparkutil import read_table

    rows = {(r.grp, r.period): r for r in events_did(spark, SF).collect()}
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value").collect()
    d0 = min(r.ts.date() for r in ev)
    cells = {}
    for r in ev:
        grp = "treated" if r.user_id % DID_TREAT_MOD == 0 else "control"
        per = "post" if (r.ts.date() - d0).days >= DID_CUT_DAYS else "pre"
        n, s = cells.get((grp, per), (0, 0))
        cells[(grp, per)] = (n + 1, s + int(round(r.value * 100)))
    assert set(rows) == set(cells)
    for k, (n, s) in cells.items():
        assert (rows[k].n_events, rows[k].sum_cents) == (n, s)
        assert rows[k].mean_micro_cents == 1000000 * s // n
    m = {k: Fraction(s, n) for k, (n, s) in cells.items()}
    did = (
        m[("treated", "post")]
        - m[("treated", "pre")]
        - (m[("control", "post")] - m[("control", "pre")])
    )
    scaled = 1000000 * did
    want = (
        scaled.numerator // scaled.denominator
        if scaled >= 0
        else -((-scaled).numerator // (-scaled).denominator)
    )
    assert all(r.did_micro_cents == want for r in rows.values())


def test_theil_sen_exact_python_replay_and_robustness(spark):
    """Median-of-slopes and OLS must replay exactly in python (Fraction
    ordering, lower median, sign-split floor), and Theil–Sen must be
    robust where OLS is not: corrupting one day's count by 10× moves the
    OLS slope but leaves the Theil–Sen median within the slope grid."""
    from collections import Counter
    from fractions import Fraction

    from mongraph_spark.queries.events import events_theil_sen
    from mongraph_spark.sparkutil import read_table

    row = events_theil_sen(spark, SF).first()
    days = Counter(
        r.d for r in read_table(spark, SF, "events").select(
            F.to_date("ts").alias("d")
        ).collect()
    )
    d0 = min(days)
    pts = sorted(((d - d0).days, c) for d, c in days.items())

    def floor_micro(fr):
        scaled = 1000000 * fr
        if scaled >= 0:
            return scaled.numerator // scaled.denominator
        return -((-scaled).numerator // (-scaled).denominator)

    def theil_sen(points):
        slopes = sorted(
            (Fraction(yb - ya, xb - xa), yb - ya, xb - xa)
            for i, (xa, ya) in enumerate(points)
            for xb, yb in points[i + 1 :]
        )
        k = (len(slopes) + 1) // 2
        fr, num, den = slopes[k - 1]
        return floor_micro(Fraction(num, den)), len(slopes)

    ts_micro, n_pairs = theil_sen(pts)
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    ols_micro = floor_micro(Fraction(n * sxy - sx * sy, n * sxx - sx * sx))
    assert (row.n_days, row.n_pairs) == (n, n_pairs)
    assert row.theil_sen_micro_per_day == ts_micro
    assert row.ols_micro_per_day == ols_micro
    # robustness: 10x one middle day
    corrupted = [(x, y * 10 if i == len(pts) // 2 else y) for i, (x, y) in enumerate(pts)]
    ts_c, _ = theil_sen(corrupted)
    nc, sxc = n, sx
    syc = sum(y for _, y in corrupted)
    sxyc = sum(x * y for x, y in corrupted)
    ols_c = floor_micro(Fraction(nc * sxyc - sxc * syc, nc * sxx - sxc * sxc))
    assert abs(ols_c - ols_micro) > 10 * abs(ts_c - ts_micro)


def test_cem_att_exact_python_replay(spark):
    """CEM's grid estimator must replay exactly in python: per-user
    pre-bins and post means, per-stratum floored gaps, treated-weighted
    ATT, and the off-support treated count; matched strata must contain
    both cohorts."""
    from collections import defaultdict

    from mongraph_spark.queries.events import (
        CEM_BIN_WIDTH,
        DID_CUT_DAYS,
        DID_TREAT_MOD,
        events_cem_att,
    )
    from mongraph_spark.sparkutil import read_table

    rows = {r.bin: r for r in events_cem_att(spark, SF).collect()}
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value").collect()
    d0 = min(r.ts.date() for r in ev)
    acc = defaultdict(lambda: [0, 0, 0])  # n_pre, post_cents, n_post
    for r in ev:
        a = acc[r.user_id]
        if (r.ts.date() - d0).days >= DID_CUT_DAYS:
            a[1] += int(round(r.value * 100))
            a[2] += 1
        else:
            a[0] += 1

    def sdiv(n, d):
        return n // d if n >= 0 else -((-n) // d)

    strata = defaultdict(lambda: [0, 0, 0, 0])  # n_t n_c sy_t sy_c
    for uid, (n_pre, pc, n_post) in acc.items():
        if n_post == 0:
            continue
        b = n_pre // CEM_BIN_WIDTH
        y = (1000000 * pc) // n_post
        t = 1 if uid % DID_TREAT_MOD == 0 else 0
        s = strata[b]
        s[0] += t
        s[1] += 1 - t
        (s.__setitem__(2, s[2] + y) if t else s.__setitem__(3, s[3] + y))
    num = den = unmatched = 0
    for b, (n_t, n_c, sy_t, sy_c) in strata.items():
        r = rows[b]
        assert (r.n_t, r.n_c) == (n_t, n_c)
        if n_t > 0 and n_c > 0:
            gap = sdiv(sy_t * n_c - sy_c * n_t, n_t * n_c)
            assert r.matched == 1 and r.gap_micro == gap
            num += n_t * gap
            den += n_t
        else:
            assert r.matched == 0 and r.gap_micro is None
            unmatched += n_t
    att = sdiv(num, den)
    for r in rows.values():
        assert r.att_micro == att
        assert r.n_treated_unmatched == unmatched
    assert set(rows) == set(strata)


def test_trimmed_means_exact_python_replay(spark):
    """All three location estimates must replay exactly in python, the
    trimmed/winsorized pair must sit between min and max, and injecting a
    huge outlier (python-side) must move the raw mean while leaving the
    trimmed mean unchanged on the micro grid."""
    from mongraph_spark.queries.relational import TRIM_PCT_BP, stats_trimmed_means
    from mongraph_spark.sparkutil import read_table

    row = stats_trimmed_means(spark, SF).first()
    cents = sorted(
        int(round(r.o_totalprice * 100))
        for r in read_table(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = len(cents)
    k = n * TRIM_PCT_BP // 10000
    lo, hi = cents[k], cents[n - k - 1]
    mid = cents[k : n - k]
    wins = [min(max(c, lo), hi) for c in cents]
    assert (row.n_rows, row.k_per_tail) == (n, k)
    assert row.mean_micro == 1000000 * sum(cents) // n
    assert row.trimmed_micro == 1000000 * sum(mid) // (n - 2 * k)
    assert row.winsorized_micro == 1000000 * sum(wins) // n
    # robustness: one huge outlier moves the mean, not the trim
    poisoned = sorted(cents + [10**12])
    n2 = n + 1
    k2 = n2 * TRIM_PCT_BP // 10000
    mid2 = poisoned[k2 : n2 - k2]
    t2 = 1000000 * sum(mid2) // (n2 - 2 * k2)
    m2 = 1000000 * sum(poisoned) // n2
    assert abs(m2 - row.mean_micro) > 100 * abs(t2 - row.trimmed_micro)
