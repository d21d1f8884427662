"""Dedup / similarity / text-analysis / multimodal operator tests.

Runs over the driver's read-only testdata (TESTDATA.md) plus small
hand-built corpora with known duplicate structure.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from llm_information_extraction_spark.functions.textmetrics import (
    detect_lang,
    doc_fingerprint,
    quality_score,
    token_count,
)
from llm_information_extraction_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    exact_duplicate_groups,
    hamming64,
    minhash_dedup_groups,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dup_pairs,
)
from llm_information_extraction_spark.operators.multimodal import (
    extract_media_features,
    media_stats,
    resize_media,
    synth_media,
)
from llm_information_extraction_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_join,
    rp_lsh_near_dup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)


@pytest.fixture(scope="module")
def dup_corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),                                   # exact dup of 1
        (3, BASE.replace("warm", "cold")),           # near dup of 1
        (4, "completely different text about spark sql shuffle partitions"),
        (5, "  THE   quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill and the birds sing in the garden "),
        # normalized-exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(dup_corpus):
    groups = exact_duplicate_groups(dup_corpus).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2, 5]
    assert groups[0]["keep_id"] == 1
    kept = {r["doc_id"] for r in exact_dedup(dup_corpus).collect()}
    assert kept == {1, 3, 4}


def test_ngram_jaccard_pairs(dup_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert pairs[(1, 5)] == pytest.approx(1.0)
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert all(a != 4 and b != 4 for a, b in pairs)


def test_minhash_dedup_groups(dup_corpus):
    got = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups(dup_corpus, threshold=0.5).collect()
    }
    # 1,2,5 exact-identical signatures; 3 near-dup joins the cluster
    assert got["1"] == got["2"] == got["5"] == got["3"]
    assert "4" not in got


def test_minhash_dedup_groups_fast_matches_pairwise(dup_corpus):
    from llm_information_extraction_spark.operators.dedup import (
        minhash_dedup_groups_fast,
    )

    pairwise = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups(dup_corpus, threshold=0.5).collect()
    }
    fast = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups_fast(
            dup_corpus, verify_threshold=0.5
        ).collect()
    }
    assert fast == pairwise  # {1,2,3,5} clustered; 4 alone
    # unverified variant may only ADD members (banding precision), never
    # lose any, and must keep the same representative
    loose = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups_fast(dup_corpus).collect()
    }
    assert set(pairwise) <= set(loose)
    assert all(loose[k] == v for k, v in pairwise.items())


def test_minhash_fast_rep_verify_drops_chained_member(spark):
    """Pins the DOCUMENTED rep-verify caveat (minhash_dedup_groups_fast
    docstring): on a bucket-chained cluster A~B~C with J(A,B) ≥ t and
    J(B,C) ≥ t but J(A,C) < t, rep-verify (against rep = min id = A)
    drops the legitimately chained member C, while the unverified
    variant and the PAIRWISE path (which verifies edges, not members)
    both keep it. Exact-dedup-first in KGPipeline is the rescue for
    exact copies — this caveat only affects near-dup chains."""
    from llm_information_extraction_spark.operators.dedup import (
        minhash_dedup_groups_fast,
        ngram_jaccard_pairs,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    wa = base.split()
    wb = list(wa)
    wb[2], wb[14] = "changeb1", "changeb2"
    wc = list(wb)
    wc[7], wc[20], wc[26] = "changec1", "changec2", "changec3"
    df = spark.createDataFrame(
        [
            (1, " ".join(wa)),
            (2, " ".join(wb)),
            (3, " ".join(wc)),
            (4, "unrelated filler text about entirely different things "
                "and topics galore"),
        ],
        "doc_id bigint, text string",
    )
    # the planted chain: A~B and B~C above 0.5, A~C below it
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    assert jac[(1, 2)] >= 0.5 and jac[(2, 3)] >= 0.5
    assert jac[(1, 3)] < 0.5
    loose = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups_fast(df).collect()
    }
    assert loose == {"1": "1", "2": "1", "3": "1"}  # banding chains A-B-C
    verified = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups_fast(
            df, verify_threshold=0.5
        ).collect()
    }
    # C fails J(member, rep=A) and leaves the cluster — the documented
    # O(cluster) rep-verify trade-off vs O(cluster²) pair verification
    assert verified == {"1": "1", "2": "1"}
    pairwise = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups(df, threshold=0.5).collect()
    }
    assert pairwise == {"1": "1", "2": "1", "3": "1"}


def test_minhash_row_wise_signatures_value_equal(spark):
    """The per-row HOF signature and the explode+agg signature must be
    VALUE-IDENTICAL (same shingles, same hash family) — row_wise is a
    pure performance knob, so dedup groups must also coincide."""
    from llm_information_extraction_spark.operators.dedup import (
        minhash_dedup_groups,
        minhash_signatures,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    agg = {
        r["id"]: r["sig"]
        for r in minhash_signatures(d, "doc_id", "text").collect()
    }
    hof = {
        r["id"]: r["sig"]
        for r in minhash_signatures(
            d, "doc_id", "text", row_wise=True
        ).collect()
    }
    assert agg == hof and len(agg) == d.count()
    groups_agg = sorted(
        (r["doc_id"], r["group_id"])
        for r in minhash_dedup_groups(d, threshold=0.5).collect()
    )
    groups_hof = sorted(
        (r["doc_id"], r["group_id"])
        for r in minhash_dedup_groups(d, threshold=0.5, row_wise=True).collect()
    )
    assert groups_agg == groups_hof and groups_agg


def test_simhash_md5_arrow_matches_agg(spark):
    """The numpy-vectorized md5 signature path (hash_fn='md5') must be
    BIT-IDENTICAL to the 65-aggregate expression flavor (kept reachable
    as hash_fn='md5_agg') — the oracle's bit-exactness rests on it."""
    from llm_information_extraction_spark.operators.dedup import (
        simhash_signatures,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    arrow = {
        r["id"]: r["sig"]
        for r in simhash_signatures(d, hash_fn="md5").collect()
    }
    agg = {
        r["id"]: r["sig"]
        for r in simhash_signatures(d, hash_fn="md5_agg").collect()
    }
    assert arrow == agg and len(arrow) == d.count()


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: a shared token run of length ≥ window+n−1
    yields ≥1 shared fingerprint; disjoint docs share none."""
    from llm_information_extraction_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    shared_run = "the hippocampus modulates consolidation during slow wave sleep"
    rows = [
        (1, f"intro words alpha beta {shared_run} closing remarks one"),
        (2, f"totally different opening gamma delta {shared_run} and more"),
        (3, "nothing in common here whatsoever with anybody else at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_pairs(
            docs, n=3, window=4, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


def test_stop_shingle_filter_breaks_boilerplate_chaining(spark):
    """All docs share a boilerplate prefix: unfiltered bucket-CC chains
    everything into one component; dropping corpus-frequent shingles
    leaves only the true duplicate pair grouped."""
    from llm_information_extraction_spark.operators.dedup import (
        minhash_dedup_groups_fast,
    )

    boiler = (
        "this article is distributed under the terms of the creative "
        "commons attribution license which permits unrestricted use"
    )
    rows = [
        (i, f"{boiler} study number {i} investigated outcome variable "
            f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(20)
    ]
    rows += [
        (20, f"{boiler} completely identical trailing content about "
             "sleep and memory consolidation in adults"),
        (21, f"{boiler} completely identical trailing content about "
             "sleep and memory consolidation in adults"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    chained = minhash_dedup_groups_fast(docs)
    assert chained.count() >= 18  # boilerplate chains most of the corpus
    biggest = (
        chained.groupBy("group_id").count().agg(F.max("count").alias("m"))
    ).first()["m"]
    assert biggest >= 15  # dominated by a giant chained component

    filtered = {
        r["doc_id"]: r["group_id"]
        for r in minhash_dedup_groups_fast(
            docs, max_shingle_doc_freq=0.5
        ).collect()
    }
    assert set(filtered) == {"20", "21"}  # only the true dup pair


def test_simhash_near_dups(dup_corpus):
    sigs = {
        r["doc_id"]: r["sig"]
        for r in dup_corpus.select(
            "doc_id", simhash64("text").alias("sig")
        ).collect()
    }
    assert sigs[1] == sigs[2] == sigs[5]
    assert sigs[1] != sigs[4]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            # hamming budgets > 6 need an explicit narrow-key opt-in —
            # fine on a 5-doc corpus, refused by default (scale guard)
            dup_corpus, max_hamming=12, min_key_bits=4
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs  # one-word edit stays within the budget
    assert all(4 not in p for p in pairs)


def _random_docs(spark, n, words_per_doc=12, vocab=1000):
    from pyspark.sql import functions as F

    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(vocab))
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def test_simhash_blocking_is_lossless(spark):
    """Multi-table blocked pairs == brute-force Hamming pairs, at d=3
    (single-block 16-bit keys) and d=5 (2-of-7-block composite keys)."""
    from pyspark.sql import functions as F

    from llm_information_extraction_spark.operators.dedup import (
        hamming64,
        simhash_signatures,
    )

    docs = _random_docs(spark, 300, vocab=40).cache()  # small vocab → near dups
    sig = simhash_signatures(docs, "doc_id", "text").cache()
    for d in (3, 5):
        brute = {
            (r["id_a"], r["id_b"])
            for r in sig.alias("a")
            .crossJoin(sig.alias("b"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                hamming64(F.col("a.sig"), F.col("b.sig")).alias("h"),
            )
            .filter(F.col("h") <= d)
            .collect()
        }
        blocked = {
            (r["id_a"], r["id_b"])
            for r in simhash_near_dup_pairs(docs, max_hamming=d).collect()
        }
        assert blocked == brute, f"d={d}: blocked != brute force"


def test_simhash_refuses_degenerate_band_widths():
    import pytest as _pytest

    from llm_information_extraction_spark.operators.dedup import (
        _simhash_block_plan,
    )

    with _pytest.raises(ValueError, match="minhash"):
        _simhash_block_plan(10)  # the round-1 scale-killer budget
    widths, _, tables = _simhash_block_plan(3)
    assert len(tables) == 4 and all(len(t) == 1 for t in tables)
    widths6, _, tables6 = _simhash_block_plan(6)
    # composite 2-of-8-block keys: 16-bit effective width, 28 tables
    assert all(len(t) == 2 for t in tables6) and len(tables6) == 28


def test_simhash_candidate_pairs_stay_linear(spark):
    """On 10⁵ random docs the per-table buckets must spread: total
    candidate pairs Σ c·(c−1)/2 stays O(n), nowhere near the O(n²/2^bits)
    a narrow-key scheme produces."""
    from pyspark.sql import functions as F

    from llm_information_extraction_spark.operators.dedup import (
        _simhash_block_plan,
        simhash_signatures,
    )

    n = 100_000
    docs = _random_docs(spark, n)
    widths, offsets, tables = _simhash_block_plan(3)
    sig = simhash_signatures(docs, "doc_id", "text")
    key_cols = []
    for t, blocks in enumerate(tables):
        key = F.lit(0).cast("long")
        for k in blocks:
            key = F.shiftleft(key, widths[k]).bitwiseOR(
                F.shiftrightunsigned(F.col("sig"), offsets[k]).bitwiseAND(
                    F.lit((1 << widths[k]) - 1).cast("long")
                )
            )
        key_cols.append(F.struct(F.lit(t).alias("band"), key.alias("key")))
    buckets = (
        sig.select(F.explode(F.array(*key_cols)).alias("bk"))
        .groupBy("bk.band", "bk.key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cand = buckets.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
    ).first()["pairs"]
    assert cand <= 20 * n, f"{cand} candidate pairs for n={n}"


def test_simhash_md5_variant_finds_exact_dups(dup_corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(
            dup_corpus, max_hamming=3, hash_fn="md5"
        ).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(2, 5)] == 0 and pairs[(1, 5)] == 0
    assert all(4 not in p for p in pairs)


def test_embedding_near_dup_and_lsh(spark):
    rng = np.random.default_rng(0)
    base = rng.normal(size=8)
    rows = [
        (1, (base / np.linalg.norm(base)).tolist()),
        (2, (base / np.linalg.norm(base) * 3.0).tolist()),   # same direction
        (3, (base + rng.normal(scale=0.01, size=8)).tolist()),  # tiny noise
        (4, rng.normal(size=8).tolist()),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(df, threshold=0.99).collect()
    }
    assert (1, 2) in exact and (1, 3) in exact and (2, 3) in exact
    assert all(4 not in p for p in exact)
    approx = {
        (r["id_a"], r["id_b"])
        for r in rp_lsh_near_dup_pairs(df, dim=8, threshold=0.99, num_planes=8).collect()
    }
    # LSH must find the identical-direction pair (same bucket guaranteed)
    assert (1, 2) in approx
    assert approx <= exact  # no false positives (exact verify step)


def test_cosine_topk_on_testdata(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    first = emb.orderBy("vec_id").first()
    got = cosine_topk(emb, list(first["embedding"]), k=5).collect()
    assert got[0]["id"] == first["vec_id"]  # self is nearest
    assert got[0]["cosine"] == pytest.approx(1.0)
    sims = [r["cosine"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_cosine_topk_join(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk_join(emb, queries, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    for qid, rows in by_q.items():
        assert len(rows) == 4
        assert rows[0]["id"] == qid  # rank 1 is self
        assert [r["rank"] for r in sorted(rows, key=lambda x: x["rank"])] == [1, 2, 3, 4]
    # the no-broadcast shape (query sets too large to broadcast) must
    # return identical rows
    plain = cosine_topk_join(emb, queries, k=4, broadcast_queries=False)
    assert sorted(
        (r["query_id"], r["rank"], r["id"]) for r in plain.collect()
    ) == sorted((r["query_id"], r["rank"], r["id"]) for r in got)


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
    )

    index, centroids = ivf_index(emb, n_centroids=8)
    index = index.cache()
    q = emb.orderBy("vec_id").first()
    query = [float(x) for x in q["embedding"]]
    exact = [r["id"] for r in cosine_topk(emb, query, k=10).collect()]
    # full probe == exact search
    full = [r["id"] for r in
            ivf_topk(index, centroids, query, k=10, n_probe=8).collect()]
    assert full == exact
    # partial probe finds the self-match and decent recall
    approx = [r["id"] for r in
              ivf_topk(index, centroids, query, k=10, n_probe=3).collect()]
    assert approx[0] == q["vec_id"]
    assert len(set(approx) & set(exact)) >= 5


def test_ivf_sample_fit_full_probe_still_exact(spark):
    """fit_fraction trains the quantizer on a deterministic hash sample;
    exactness at n_probe == n_centroids is fit-independent (every cell
    scanned), every vector still gets assigned, and the sample fit is
    reproducible."""
    from llm_information_extraction_spark.operators.similarity import (
        cosine_topk,
        ivf_index,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    index, centroids = ivf_index(emb, n_centroids=8, fit_fraction=0.5)
    assert index.count() == n  # full corpus assigned
    q = emb.orderBy("vec_id").first()
    query = [float(x) for x in q["embedding"]]
    exact = [r["id"] for r in cosine_topk(emb, query, k=10).collect()]
    full = [
        r["id"]
        for r in ivf_topk(index, centroids, query, k=10, n_probe=8).collect()
    ]
    assert full == exact
    # deterministic: same sample, same centroids on re-fit
    _, centroids2 = ivf_index(emb, n_centroids=8, fit_fraction=0.5)
    assert centroids2 == centroids


def test_ivf_topk_join_matches_per_query_probes(spark):
    """Batched serving: one broadcast-join job over the index must equal
    the union of per-query ivf_topk results (same probes, same ranks)."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        ivf_topk_join,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index, centroids = ivf_index(emb, n_centroids=8)
    qrows = emb.orderBy("vec_id").limit(40).collect()[::13]  # 4 queries
    queries = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows],
        "query_id bigint, embedding array<float>",
    )
    joined = ivf_topk_join(index, centroids, queries, k=5, n_probe=3)
    got = {
        (r["query_id"], r["rank"]): r["id"] for r in joined.collect()
    }
    for r in qrows:
        single = ivf_topk(
            index, centroids, [float(x) for x in r["embedding"]], k=5, n_probe=3
        ).collect()
        for rank, s in enumerate(single, start=1):
            assert got[(r["vec_id"], rank)] == s["id"], (r["vec_id"], rank)
    assert len(got) == len(qrows) * 5


def test_ivf_topk_join_empty_queries(spark):
    """Zero queries → zero rows, correct schema, no error."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk_join,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index, centroids = ivf_index(emb, n_centroids=4)
    empty = emb.limit(0).selectExpr(
        "vec_id as query_id", "embedding"
    )
    out = ivf_topk_join(index, centroids, empty, k=3, n_probe=2)
    assert out.columns == ["query_id", "id", "cosine", "rank"]
    assert out.count() == 0


def test_ivf_topk_join_shuffle_fallback_matches_broadcast(spark):
    """The cell-repartition shuffle shape (probe sets too large to
    broadcast) must return exactly the broadcast serving shape's rows,
    and the auto knob must pick it when n_queries*n_probe exceeds the
    limit."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk_join,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index, centroids = ivf_index(emb, n_centroids=8)
    queries = emb.orderBy("vec_id").limit(20).selectExpr(
        "vec_id as query_id", "embedding"
    )

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["id"], round(r["cosine"], 9))
            for r in df.collect()
        )

    bc = ivf_topk_join(
        index, centroids, queries, k=5, n_probe=3, broadcast_queries=True
    )
    sh = ivf_topk_join(
        index, centroids, queries, k=5, n_probe=3, broadcast_queries=False
    )
    assert rows(sh) == rows(bc)
    # auto mode: 20 queries * 3 probes = 60 > limit → shuffle path; the
    # plan must carry no broadcast of the probe set
    auto = ivf_topk_join(
        index, centroids, queries, k=5, n_probe=3, broadcast_limit=10
    )
    assert rows(auto) == rows(bc)


def test_ivf_index_undersized_fit_sample_falls_back_to_full(spark):
    """A hash sample smaller than n_centroids cannot train the
    quantizer: ivf_index must warn and fall back to a full-corpus fit
    instead of failing inside KMeans with an opaque error."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.warns(UserWarning, match="fewer than n_centroids"):
        index, centroids = ivf_index(
            emb, n_centroids=8, fit_fraction=1e-9
        )
    _, full = ivf_index(emb, n_centroids=8)
    assert centroids == full  # identical to the full-corpus fit
    assert index.count() == emb.count()


def test_ivf_topk_tied_centroids_match_batched_probe_choice(spark):
    """Duplicate centroids produce exactly tied centroid similarities:
    the numpy probe pick (stable argsort) and the window pick
    (csim desc, cell asc) must choose the SAME cells — lower cell index
    wins in both paths."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_join,
    )

    # handcrafted index: cells 0/1 share a centroid (exact tie), cell 2
    # is orthogonal to the query
    centroids = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    index = spark.createDataFrame(
        [(1, [0.9, 0.1], 0), (2, [0.8, 0.2], 1), (3, [0.0, 1.0], 2)],
        "id bigint, v array<double>, cell int",
    )
    query = [1.0, 0.0]
    single = [
        r["id"]
        for r in ivf_topk(index, centroids, query, k=5, n_probe=1).collect()
    ]
    queries = spark.createDataFrame(
        [(7, query)], "query_id bigint, embedding array<double>"
    )
    joined = ivf_topk_join(index, centroids, queries, k=5, n_probe=1)
    batched = [
        r["id"] for r in joined.orderBy("rank").collect()
    ]
    # n_probe=1 on a tied pair: both paths must probe cell 0 only
    assert single == [1] and batched == [1]


def test_ivf_topk_join_dynamic_partition_pruning(spark, tmp_path):
    """Batched serving against a PERSISTED cell-partitioned index:
    the broadcast serving shape pre-filters the index scan to the probed
    cells, which parquet turns into STATIC partition pruning (round 6 —
    formerly a runtime DPP filter from the probe join; the static
    literal filter prunes at planning time, strictly earlier), and
    results match the in-memory path exactly."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk_join,
        ivf_write,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index, centroids = ivf_index(emb, n_centroids=8)
    path = str(tmp_path / "ivf_join")
    ivf_write(index, path)
    queries = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    disk = ivf_topk_join(
        spark.read.parquet(path), centroids, queries, k=5, n_probe=2
    )
    rows = {(r["query_id"], r["rank"]): r["id"] for r in disk.collect()}
    plan = disk._jdf.queryExecution().executedPlan().toString()
    # the probed-cell literal filter must reach the scan as a partition
    # filter (static pruning — unprobed cell directories never open)
    assert "PartitionFilters: [cell" in plan
    mem = ivf_topk_join(index, centroids, queries, k=5, n_probe=2)
    assert rows == {(r["query_id"], r["rank"]): r["id"] for r in mem.collect()}


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    """The serving path: a persisted cell-partitioned index turns the
    probe filter into parquet partition PRUNING — the scan's
    PartitionFilters carries the cell predicate and results match the
    in-memory probe exactly."""
    from llm_information_extraction_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        ivf_topk_from_path,
        ivf_write,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index, centroids = ivf_index(emb, n_centroids=8)
    path = str(tmp_path / "ivf")
    ivf_write(index, path)

    q = emb.orderBy("vec_id").first()
    query = [float(x) for x in q["embedding"]]
    disk = ivf_topk_from_path(spark, path, centroids, query, k=10, n_probe=3)
    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    mem = ivf_topk(index, centroids, query, k=10, n_probe=3)
    assert [r["id"] for r in disk.collect()] == [r["id"] for r in mem.collect()]


def test_text_metrics_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = docs.select(
        "doc_id",
        token_count("text").alias("tokens"),
        quality_score("text").alias("quality"),
        detect_lang("text").alias("lang"),
        doc_fingerprint("text").alias("fp"),
    ).collect()
    assert all(r["tokens"] > 0 for r in out)
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)
    assert all(len(r["fp"]) == 32 for r in out)
    langs = {r["lang"] for r in out}
    assert langs <= {"en", "de", "fr", "es", "und"}


def test_detect_lang_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat in the house for a while",),
            ("der hund und die katze sind nicht in das haus",),
            ("le chat et les oiseaux dans le jardin est une",),
            ("xyzzy plugh 12345",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(detect_lang("text")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_multimodal_pipeline(spark):
    media = synth_media(spark, 40, seed=1).cache()
    feats = extract_media_features(media).cache()
    ok = feats.filter(F.col("error").isNull())
    assert ok.count() == 40
    pixel = ok.filter(F.col("kind") != "table").first()
    assert len(pixel["features"]) == 16
    assert abs(sum(pixel["features"]) - 1.0) < 1e-9
    assert 0 <= pixel["mean_intensity"] <= 255
    table = ok.filter(F.col("kind") == "table").first()
    n_rows, n_cols, numeric_ratio = table["features"]
    assert n_rows >= 3 and n_cols >= 2  # header + body
    assert 0.0 <= numeric_ratio <= 1.0
    assert table["mean_intensity"] is None

    resized = resize_media(media, 8, 8)
    sizes = resized.filter(F.col("codec") == "raw8").select(
        "media_id", F.length("payload").alias("nbytes"), "n_frames"
    ).collect()
    for r in sizes:
        assert r["nbytes"] == 8 * 8 * r["n_frames"]

    stats = {r["kind"]: r["n_items"] for r in media_stats(media).collect()}
    assert sum(stats.values()) == 40


def test_multimodal_unknown_codec_lands_in_error(spark):
    media = synth_media(spark, 4, seed=2).withColumn("codec", F.lit("jpeg"))
    feats = extract_media_features(media).collect()
    assert all(r["error"] is not None and "jpeg" in r["error"] for r in feats)
    assert all(r["features"] is None for r in feats)


def test_table_media_extraction_on_reference_tables(spark):
    """Real parity: the reference's extracted-table CSVs (its actual
    interleaved media, data/raw/dementia_data/**/tables/table_NNN.csv)
    decode through the csv media path and yield tract mentions."""
    import glob

    paths = sorted(
        glob.glob(
            "/root/reference/data/raw/dementia_data/*/articles/*/*/tables/table_*.csv"
        )
    )[:6]
    if not paths:
        pytest.skip("reference tables not available")
    rows = [
        (f"med_{i}", f"doc_{i}", "table", open(p, "rb").read(), 0, 0, 1, "csv")
        for i, p in enumerate(paths)
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, doc_id string, kind string, payload binary, "
        "width int, height int, n_frames int, codec string",
    )
    from llm_information_extraction_spark.operators.multimodal import (
        extract_from_table_media,
    )

    mentions = extract_from_table_media(media)
    tracts = {
        r["obj"]
        for r in mentions.filter(
            F.col("pred") == "whitematter_tracts"
        ).collect()
    }
    # table_001 of pmcid_10481508 names corpus callosum + corticospinal tract
    assert {"corpus callosum", "corticospinal tract"} & tracts


def test_corpus_profile_approx_matches_exact(spark):
    """The scale path (approx_percentile sketch, O(accuracy) buffer per
    group) must agree with the exact path within the sketch's rank-error
    bound at sf0.1 — the contract's corpus_stats pins exact ONLY for
    DuckDB bit-equality; this is the profiling default for big corpora."""
    from llm_information_extraction_spark.functions.textmetrics import (
        corpus_profile,
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    approx = {
        r["lang"]: r.asDict()
        for r in corpus_profile(docs, approx=True, accuracy=10000).collect()
    }
    exact = {
        r["lang"]: r.asDict()
        for r in corpus_profile(docs, approx=False).collect()
    }
    assert approx.keys() == exact.keys()
    for lang, e in exact.items():
        a = approx[lang]
        # count/avg/max are sketch-free: identical
        assert a["n_docs"] == e["n_docs"]
        assert a["avg_n_chars"] == e["avg_n_chars"]
        assert a["max_n_chars"] == e["max_n_chars"]
        # percentiles: rank error ≤ n/accuracy ⇒ tiny value drift on
        # a dense integer distribution
        spread = e["max_n_chars"] or 1
        for p in ("p50_n_chars", "p90_n_chars"):
            assert abs(a[p] - e[p]) <= max(0.01 * spread, 2.0), (lang, p)


def _bmp24(pixels):
    """Encode an (h, w, 3) RGB uint8 array as a bottom-up 24-bit BMP."""
    import struct

    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR on disk
        line += b"\x00" * (stride - len(line))
        body += line
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def test_bmp_decoder_real_binary_media(spark):
    """A real binary image decoder (24-bit BMP, pure python) behind the
    same codec boundary: featurize over actual encoded bytes and check
    the histogram/mean against numpy on the known pixel grid."""
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    payload = _bmp24(pixels)
    media = spark.createDataFrame(
        [("m0", "d0", "image", bytearray(payload), 9, 5, 1, "bmp")],
        "media_id string, doc_id string, kind string, payload binary, "
        "width int, height int, n_frames int, codec string",
    )
    r, g, b = (pixels[..., i].astype(np.int32) for i in range(3))
    luma = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    hist, _ = np.histogram(luma, bins=16, range=(0, 256))
    want = (hist / hist.sum()).tolist()

    row = extract_media_features(media).collect()[0]
    assert row["error"] is None
    assert row["features"] == pytest.approx(want)
    assert row["mean_intensity"] == pytest.approx(float(luma.mean()))

    # resize of a decoded container re-encodes as headerless raw8
    from llm_information_extraction_spark.operators.multimodal import (
        resize_media,
    )
    rz = resize_media(media, 4, 4).collect()[0]
    assert rz["codec"] == "raw8" and len(rz["payload"]) == 16


def test_wav_decoder_real_binary_media(spark):
    """Real PCM WAV decode via stdlib wave: 16-bit stereo samples are
    downmixed to channel 0 and scaled to uint8; histogram/mean match
    numpy on the known sample buffer."""
    import io
    import wave

    rng = np.random.default_rng(11)
    s16 = rng.integers(-32768, 32767, size=400, dtype=np.int16)  # L/R interleaved
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(s16.tobytes())
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [("a0", "d0", "audio", bytearray(payload), 0, 0, 1, "wav")],
        "media_id string, doc_id string, kind string, payload binary, "
        "width int, height int, n_frames int, codec string",
    )
    ch0 = s16[::2].astype(np.int32)
    samples = ((ch0 // 256) + 128).astype(np.uint8)
    hist, _ = np.histogram(samples, bins=16, range=(0, 256))
    want = (hist / hist.sum()).tolist()

    row = extract_media_features(media).collect()[0]
    assert row["error"] is None
    assert row["features"] == pytest.approx(want)
    assert row["mean_intensity"] == pytest.approx(float(samples.mean()))


def test_compressed_codecs_still_error_per_row(spark):
    """The NotImplementedError boundary is unchanged for codecs that
    genuinely need external libraries — and a corrupt BMP/WAV payload
    degrades to the error column too, never a task failure."""
    rng = np.random.default_rng(3)
    full = _bmp24(rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8))
    rows = [
        ("x1", "d", "image", bytearray(b"\xff\xd8\xff junk"), 0, 0, 1, "jpeg"),
        ("x2", "d", "image", bytearray(b"not a bmp"), 0, 0, 1, "bmp"),
        ("x3", "d", "audio", bytearray(b"RIFFgarbage"), 0, 0, 1, "wav"),
        # valid header, truncated pixel data → ValueError path
        ("x4", "d", "image", bytearray(full[:80]), 0, 0, 1, "bmp"),
        # sub-chunk-header WAV → EOFError path (not wave.Error)
        ("x5", "d", "audio", bytearray(b"RIFF"), 0, 0, 1, "wav"),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, doc_id string, kind string, payload binary, "
        "width int, height int, n_frames int, codec string",
    )
    got = {r["media_id"]: r for r in extract_media_features(media).collect()}
    bad = ("x1", "x2", "x3", "x4", "x5")
    assert all(got[m]["error"] is not None for m in bad)
    assert all(got[m]["features"] is None for m in bad)
