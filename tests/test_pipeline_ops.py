"""Training-data pipeline operators: dedup / similarity / textops /
multimodal — numpy-oracle and invariant tests (the golden cross-engine
checks run in scripts/check_entry.py against DuckDB)."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark import dedup, multimodal, similarity, textops
from solr_spark.analysis import CODE_CHAIN

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_finds_planted_clones(docs):
    clones = docs.where(F.col("doc_id") < 10).withColumn("doc_id", F.col("doc_id") + 5000)
    u = docs.select("doc_id", "text").unionByName(clones.select("doc_id", "text"))
    groups = dedup.exact_dup_groups(u, "text", "doc_id").collect()
    assert len(groups) == 10
    assert all(g["n_dups"] == 2 for g in groups)
    assert sorted(g["canonical_id"] for g in groups) == list(range(10))


def test_jaccard_pairs_match_numpy(docs):
    rows = docs.select("doc_id", "text").collect()
    sets = {
        r["doc_id"]: {
            " ".join(toks[i : i + 3])
            for toks in [CODE_CHAIN.tokenize_py(r["text"])]
            for i in range(max(len(toks) - 2, 0))
        }
        for r in rows
    }
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / len(sets[a] | sets[b])
                if j >= 0.4:
                    expected[(a, b)] = j
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.4).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], abs=1e-9)


def test_minhash_verified_subset_of_exact(docs):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_neardup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert lsh <= exact
    if exact:
        # banded LSH recall on high-jaccard pairs should be near-total here
        assert len(lsh) / len(exact) >= 0.8


def test_minhash_plan_has_no_allpairs_shingle_selfjoin(docs):
    """The LSH candidate join must sit BELOW the exact-Jaccard
    verification: no Join node may pair shingles on (h = h AND
    doc_id < doc_id) — the quadratic all-co-shingled-pairs shape that
    LSH exists to avoid. The remaining `<` join is the band-key
    candidate join (band_key equi-keys), which is capped/bucketed."""
    df = dedup.minhash_neardup_pairs(docs, "doc_id", "text", threshold=0.5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "Join" in line and "doc_id" in line and "<" in line:
            # a range self-join is only legal on band keys, never on h
            assert "band" in line, f"all-pairs shingle self-join in plan: {line}"


def test_jaccard_for_pairs_restricted_to_candidates(docs):
    """jaccard_for_pairs computes Jaccard ONLY for supplied pairs: a
    known near-dup pair left out of the candidate set must be absent."""
    exact = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    if len(exact) < 2:
        pytest.skip("need >=2 exact near-dup pairs at this SF")
    spark = docs.sparkSession
    keep = [(r["doc_a"], r["doc_b"]) for r in exact[1:]]
    cands = spark.createDataFrame(keep, "doc_a long, doc_b long")
    sh = dedup.shingle_set(docs, "doc_id", "text")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.jaccard_for_pairs(sh, cands, 0.5).collect()}
    assert set(got) == set(keep)
    expected = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in exact}
    for k in got:
        assert got[k] == pytest.approx(expected[k], abs=1e-12)


def test_simhash_band_join_equals_bruteforce(docs):
    sim = dedup.simhash(docs, "doc_id", "text").collect()
    vals = {r["doc_id"]: r["simhash"] for r in sim}
    expected = set()
    ids = sorted(vals)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(vals[a] ^ vals[b]).count("1")
            if h <= 6:
                expected.add((a, b, h))
    sim_df = dedup.simhash(docs, "doc_id", "text")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_pairs(sim_df, max_hamming=6).collect()
    }
    assert got == expected  # pigeonhole banding is lossless


def test_simhash_kernel_equals_expression_form(docs):
    """The numpy bit-matrix kernel (hot path, no 60x fan-out) must equal
    the pure-expression oracle form bit-for-bit."""
    fast = {(r["doc_id"], r["simhash"]) for r in dedup.simhash(docs, "doc_id", "text").collect()}
    expr = {(r["doc_id"], r["simhash"]) for r in dedup.simhash_expr(docs, "doc_id", "text").collect()}
    assert fast == expr


def test_simhash_stable_under_partitioning(spark, docs):
    one = {
        (r["doc_id"], r["simhash"])
        for r in dedup.simhash(docs.repartition(1), "doc_id", "text").collect()
    }
    many = {
        (r["doc_id"], r["simhash"])
        for r in dedup.simhash(docs.repartition(7), "doc_id", "text").collect()
    }
    assert one == many


def test_embedding_neardup_numpy_oracle(emb):
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    expected = {}
    ids = sorted(V)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = float(V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b])))
            if c >= 0.4:
                expected[(a, b)] = c
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_neardup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], abs=1e-9)


def test_embedding_lsh_subset_and_recall(emb):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_lsh_pairs(emb, "vec_id", "embedding", 0.4, max_hamming=2).collect()
    }
    assert approx <= exact  # precision 1 (verified candidates)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def test_cosine_topk_matches_numpy(emb):
    rows = emb.collect()
    V = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qv = V[1]
    scored = sorted(
        ((float(V[i] @ qv / (np.linalg.norm(V[i]) * np.linalg.norm(qv))), -i) for i in V),
        reverse=True,
    )
    expected = [-i for _, i in scored[:5]]
    got = [
        r["id"]
        for r in similarity.cosine_topk(emb, "vec_id", "embedding", list(qv), k=5).collect()
    ]
    assert got == expected


def test_lsh_topk_recall(emb):
    rows = emb.collect()
    qv = [float(x) for x in rows[0]["embedding"]]
    buckets = similarity.build_lsh_buckets(emb, "vec_id", "embedding")
    exact = {r["id"] for r in similarity.cosine_topk(emb, "vec_id", "embedding", qv, 10).collect()}
    approx = {r["id"] for r in similarity.cosine_topk_lsh(buckets, qv, 10, probe_hamming=2).collect()}
    # self-match must always be found (hamming 0 probe includes own bucket)
    assert rows[0]["vec_id"] in approx
    assert len(approx & exact) >= 2  # partial recall at toy scale, quantified


# ---------------------------------------------------------------------------
# textops
# ---------------------------------------------------------------------------


def test_token_counts_python_oracle(docs):
    import re

    got = docs.select(
        "doc_id",
        textops.token_count_ws("text").alias("ws"),
        textops.token_count_bpe("text").alias("bpe"),
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in got:
        t = texts[r["doc_id"]]
        assert r["ws"] == len([w for w in re.split(r"\s+", t) if w])
        assert r["bpe"] == len(re.findall(r"\w+|[^\w\s]", t))


def test_language_id_detects_profiles(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and that is fine"),
            (2, "der hund ist nicht mit der katze und das ist gut"),
            (3, "le chat est dans la maison pour les amis"),
            (4, "el perro es para la casa y es una buena idea"),
            (5, "zzz qqq xxx"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lang"] for r in df.select("id", textops.language_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),       # same tokens → same fp
            (3, "Alpha  BETA gamma"),      # case/whitespace noise → same fp
            (4, "gamma beta alpha"),       # order-sensitive → different fp
        ],
        "id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", textops.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[1] != fps[4]


def test_quality_score_bounds(docs):
    rows = textops.quality_features(docs, "text").select("q_score").collect()
    assert all(0.0 <= r["q_score"] <= 1.0 for r in rows)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_schema_and_payloads(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 12))
    rows = mm.collect()
    # names and types must match the declared schema (nullability flags
    # differ for derived expression columns — that is fine)
    assert [(f.name, f.dataType) for f in mm.schema.fields] == [
        (f.name, f.dataType) for f in multimodal.MULTIMODAL_SCHEMA.fields
    ]
    texts = {r["doc_id"]: r["text"] for r in docs.where(F.col("doc_id") < 12).collect()}
    for r in rows:
        header = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}[r["modality"]]
        assert bytes(r["data"]) == header + texts[r["doc_id"]].encode()
        if r["modality"] == "image":
            assert r["meta"]["width"] is not None and r["meta"]["height"] is not None
        if r["modality"] == "audio":
            assert r["meta"]["sample_rate"] == 16000


def test_multimodal_features_numpy_oracle(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 12))
    payloads = {r["doc_id"]: bytes(r["data"]) for r in mm.collect()}
    feats = multimodal.extract_features(mm).collect()
    assert len(feats) == len(payloads)
    for r in feats:
        buf = np.frombuffer(payloads[r["doc_id"]], dtype=np.uint8)
        assert r["n_bytes"] == len(buf)
        assert r["payload_sha256"] == hashlib.sha256(payloads[r["doc_id"]]).hexdigest()
        assert r["mean_byte"] == pytest.approx(float(buf.mean()), abs=1e-9)
        hist = np.bincount(buf, minlength=256) / len(buf)
        nz = hist[hist > 0]
        assert r["byte_entropy"] == pytest.approx(float(-(nz * np.log2(nz)).sum()), abs=1e-9)
        assert len(r["feature"]) == 8
        assert sum(r["feature"]) == pytest.approx(1.0, abs=1e-9)


def test_frame_sample_shapes(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 30))
    frames = multimodal.frame_sample(mm, every_n=4, frame_bytes=32).collect()
    assert frames, "expected at least one video frame"
    for r in frames:
        assert r["frame_no"] % 4 == 0
        assert 1 <= len(bytes(r["frame"])) <= 32


def test_decode_image_is_gated_stub(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 3))
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(mm)


def test_decode_fake_deterministic_and_shaped(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 30))
    dec = multimodal.decode_fake(mm)
    rows = {r["doc_id"]: r for r in dec.collect()}
    again = {r["doc_id"]: r for r in multimodal.decode_fake(mm).collect()}
    assert rows, "expected image rows"
    payloads = {
        r["doc_id"]: (bytes(r["data"]), r["meta"]) for r in mm.where("modality = 'image'").collect()
    }
    assert set(rows) == set(payloads)
    for doc_id, r in rows.items():
        data, meta = payloads[doc_id]
        assert (r["width"], r["height"]) == (meta["width"], meta["height"])
        assert len(r["pixels"]) == r["width"] * r["height"]
        # numpy-oracle: identical byte-arithmetic expansion
        buf = np.frombuffer(data, dtype=np.uint8)[4:]
        exp = multimodal._fake_pixels(buf, r["width"], r["height"])
        assert np.array_equal(np.asarray(r["pixels"], dtype=np.uint8), exp)
        # run-to-run determinism
        assert again[doc_id]["pixels"] == r["pixels"]
    # map-only plan: decode must not introduce a shuffle
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_area_mean_oracle(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 30))
    dec = multimodal.decode_fake(mm)
    # synth image dims are multiples of 64 → 32x16 divides every row evenly
    small = {r["doc_id"]: r for r in multimodal.resize_image(dec, 32, 16).collect()}
    for r in dec.collect():
        w, h = r["width"], r["height"]
        img = np.asarray(r["pixels"], dtype=np.float64).reshape(h, w)
        exp = img.reshape(16, h // 16, 32, w // 32).mean(axis=(1, 3))
        got = np.asarray(small[r["doc_id"]]["pixels"]).reshape(16, 32)
        assert np.allclose(got, exp)
        # area mean preserves the global mean exactly
        assert got.mean() == pytest.approx(img.mean(), abs=1e-9)
    # non-divisible target → nearest-neighbor picks existing pixel values
    odd = multimodal.resize_image(dec, 7, 5).collect()
    for r in odd:
        assert len(r["pixels"]) == 35


def test_audio_features_numpy_oracle(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 30))
    feats = {r["doc_id"]: r for r in multimodal.audio_features(mm).collect()}
    auds = mm.where("modality = 'audio'").collect()
    assert feats and len(feats) == len(auds)
    for a in auds:
        x = (np.frombuffer(bytes(a["data"]), dtype=np.uint8)[4:].astype(np.float64) - 127.5) / 127.5
        r = feats[a["doc_id"]]
        assert r["n_samples"] == len(x)
        assert r["zcr"] == pytest.approx(
            float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()), abs=1e-12
        )
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), d=1.0 / 16000)
        assert r["spectral_centroid"] == pytest.approx(
            float((freqs * mag).sum() / mag.sum()), rel=1e-9
        )
        assert 0.0 <= r["rms"] <= 1.0


def test_frame_features_shapes(docs):
    mm = multimodal.synth_multimodal(docs.where(F.col("doc_id") < 30))
    frames = multimodal.frame_sample(mm, every_n=4, frame_bytes=32)
    stats = multimodal.frame_features(frames).collect()
    assert stats
    for r in stats:
        assert 0.0 <= r["mean_byte"] <= 255.0 and r["std_byte"] >= 0.0


def test_ivf_assignment_matches_numpy(emb):
    cent = similarity.train_ivf_centroids(emb, "vec_id", "embedding", n_lists=8)
    ivf = similarity.build_ivf(emb, "vec_id", "embedding", cent)
    got = {r["id"]: r["list_id"] for r in ivf.select("id", "list_id").collect()}
    rows = emb.select("vec_id", "embedding").collect()
    import numpy as np
    for r in rows:
        v = np.asarray([float(x) for x in r["embedding"]])
        d = ((cent - v) ** 2).sum(1)
        assert got[r["vec_id"]] == int(d.argmin()), r["vec_id"]


def test_ivf_recall_vs_bruteforce(emb):
    cent = similarity.train_ivf_centroids(emb, "vec_id", "embedding", n_lists=8)
    ivf = similarity.build_ivf(emb, "vec_id", "embedding", cent).persist()
    rows = emb.where(F.col("vec_id") < 5).collect()
    recalls = []
    for r in rows:
        q = [float(x) for x in r["embedding"]]
        exact = {x["id"] for x in similarity.cosine_topk(emb, "vec_id", "embedding", q, k=10).collect()}
        approx = {x["id"] for x in similarity.cosine_topk_ivf(ivf, cent, q, k=10, n_probe=4).collect()}
        assert approx <= {x["id"] for x in ivf.select("id").collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.6  # 4/8 lists probed
    ivf.unpersist()


def test_ivf_training_is_deterministic(emb):
    import numpy as np
    c1 = similarity.train_ivf_centroids(emb, "vec_id", "embedding", n_lists=8)
    c2 = similarity.train_ivf_centroids(emb, "vec_id", "embedding", n_lists=8)
    assert np.array_equal(c1, c2)


def test_embedding_lsh_plan_has_no_unconditioned_crossjoin(emb):
    """VERDICT r2 #3: the scale-path embedding entry (LSH candidates →
    exact cosine on candidates only) must never cross-join all vector
    pairs — every self-join in the plan must be keyed on the LSH band
    columns (mirror of the MinHash plan assert)."""
    df = dedup.embedding_lsh_pairs(emb, "vec_id", "embedding", threshold=0.45)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "Join" in line:
            assert "band" in line, f"unconditioned vector join in plan: {line}"


# ---------------------------------------------------------------------------
# HNSW (partition-local graphs, solr_spark/hnsw.py)
# ---------------------------------------------------------------------------


def test_hnsw_recall_vs_bruteforce(emb, tmp_path):
    from solr_spark import hnsw

    graph = hnsw.build_hnsw(emb, "vec_id", "embedding", n_partitions=4)
    # graph survives a parquet roundtrip (nested neighbor arrays)
    out = str(tmp_path / "hnsw_graph")
    graph.write.parquet(out)
    graph = emb.sparkSession.read.parquet(out)
    rows = emb.where(F.col("vec_id") < 5).collect()
    recalls = []
    for r in rows:
        q = [float(x) for x in r["embedding"]]
        exact = [x["id"] for x in similarity.cosine_topk(emb, "vec_id", "embedding", q, k=10).collect()]
        approx = [x["id"] for x in hnsw.cosine_topk_hnsw(graph, q, k=10, ef_search=96).collect()]
        recalls.append(len(set(exact) & set(approx)) / 10)
        # surfaced scores are EXACT cosines -> any overlap ranks identically
    assert sum(recalls) / len(recalls) >= 0.9


def test_hnsw_graph_structure_and_determinism(emb):
    from solr_spark import hnsw

    g1 = hnsw.build_hnsw(emb, "vec_id", "embedding", n_partitions=2).collect()
    g2 = hnsw.build_hnsw(emb, "vec_id", "embedding", n_partitions=2).collect()
    key = lambda r: r["id"]
    for a, b in zip(sorted(g1, key=key), sorted(g2, key=key)):
        assert (a["id"], a["level"], a["nbrs"]) == (b["id"], b["level"], b["nbrs"])
    n = len(g1)
    # degree bound: <= M at upper layers, <= 2M at layer 0 (M=8)
    for r in g1:
        assert len(r["nbrs"]) == r["level"] + 1
        assert all(len(layer) <= 16 for layer in r["nbrs"])
        # neighbors stay inside the node's own shard
        for layer in r["nbrs"]:
            for nb in layer:
                assert nb % 2 == r["pid"]
    assert n == emb.count()


def test_gather_nodes_distinct_without_metrics(spark):
    from pyspark.sql import functions as F

    from solr_spark.operators.relational import gather_nodes

    seeds = spark.createDataFrame([(1,), (2,)], ["k"])
    edges = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c")], ["src", "val"]
    )
    got = {r["node"] for r in gather_nodes(seeds, edges, "k", "src", "val").collect()}
    assert got == {"a", "b"}
    agg = gather_nodes(
        seeds, edges, "k", "src", "val", {"cnt": F.count("*")}
    ).collect()
    assert {(r["node"], r["cnt"]) for r in agg} == {("a", 2), ("b", 1)}


def test_score_nodes_idf_formula(spark):
    import math

    from pyspark.sql import functions as F

    from solr_spark.operators.relational import score_nodes

    edges = spark.createDataFrame(
        [(10,), (10,), (10,), (20,)], ["node_src"]
    )
    nodes = spark.createDataFrame([(10, 2), (20, 1)], ["node", "cnt"])
    got = {r["node"]: r for r in score_nodes(nodes, edges, "node_src").collect()}
    assert abs(got[10]["score"] - 2 * math.log(1 + 4 / 3)) < 1e-9
    assert abs(got[20]["score"] - 1 * math.log(1 + 4 / 1)) < 1e-9


def test_quantize_embeddings_roundtrip_and_recall(emb):
    from pyspark.sql import functions as F

    from solr_spark import similarity

    qemb = similarity.quantize_embeddings(emb, "vec_id", "embedding")
    # storage contract: int8 codes + one double scale per vector
    assert dict(qemb.dtypes)["qvec"] == "array<tinyint>"
    row = qemb.where(F.col("id") == 3).collect()[0]
    orig = emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]
    # reconstruction error bounded by scale/2 per component
    for o, qc in zip(orig, row["qvec"]):
        assert abs(o - qc * row["scale"]) <= row["scale"] / 2 + 1e-12
    # top-10 over the quantized store ≈ float top-10 (64-dim, int8 →
    # high overlap; exact identity not guaranteed)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    f10 = {r["id"] for r in similarity.cosine_topk(emb, "vec_id", "embedding", qv, k=10).collect()}
    q10 = {r["id"] for r in similarity.cosine_topk_quantized(qemb, qv, k=10).collect()}
    assert len(f10 & q10) >= 8


# ---------------------------------------------------------------------------
# duplicate clusters / canonicalization / decontamination / stratification
# ---------------------------------------------------------------------------


def test_dup_clusters_connected_components(spark):
    """Min-label propagation + pointer jumping finds components exactly:
    a 5-node chain (worst case for diameter), a triangle, and a pair."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21)],                           # pair
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_canonical_per_cluster_keeps_best(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    clusters = dedup.dup_clusters(pairs)
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50)], "doc_id long, n_chars long"
    )
    rows = dedup.canonical_per_cluster(docs, clusters).collect()
    assert len(rows) == 1
    r = rows[0]
    # longest doc wins; doc_id asc breaks the 300-char tie
    assert (r["cluster_id"], r["size"], r["canonical_id"]) == (1, 3, 2)


def test_decontaminate_flags_shared_ngrams(spark):
    corpus = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the dog"),
         (11, "completely unrelated words here only"),
         (12, "quick brown fox jumps somewhere else")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "a quick brown fox jumps test question")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_overlap"]
           for r in dedup.decontaminate_flags(corpus, bench, n=4).collect()}
    # docs 10 and 12 share the 4-gram 'quick brown fox jumps'; 11 is clean
    assert set(got) == {10, 12} and all(v >= 1 for v in got.values())


def test_stratified_hash_sample_quota_and_determinism(docs, spark):
    from solr_spark.operators.relational import stratified_hash_sample

    s1 = stratified_hash_sample(docs, "lang", "doc_id", 7)
    counts = {r["lang"]: r["n"] for r in
              s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(7, full[lang])
    # deterministic: same rows under a different partitioning
    s2 = stratified_hash_sample(docs.repartition(13), "lang", "doc_id", 7)
    assert {r["doc_id"] for r in s1.collect()} == {r["doc_id"] for r in s2.collect()}


def test_repetition_features(spark):
    """Gopher repetition rules: duplicate-line fractions and top-bigram
    dominance on constructed docs."""
    from solr_spark.textops import repetition_features

    df = spark.createDataFrame(
        [
            (1, "aaa\nbbb\naaa\n\nccc"),          # 'aaa' duplicated
            (2, "x y x y x y"),                    # 'x y' dominates bigrams
            (3, "unique line\nanother one"),       # no repetition
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            repetition_features(df, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 4 and abs(r1["dup_line_frac"] - 0.25) < 1e-9
    assert abs(r1["dup_line_char_frac"] - 6 / 12) < 1e-9  # 'aaa' twice = 6 of 12 chars
    r2 = rows[2]
    # bigrams of 6 tokens: 5 slots; 'x y' appears 3 times
    assert r2["n_bigrams"] == 5 and abs(r2["top_bigram_frac"] - 0.6) < 1e-9
    r3 = rows[3]
    assert r3["dup_line_frac"] == 0.0 and r3["dup_line_char_frac"] == 0.0


def test_pii_scrub_and_counts(spark):
    """PII scrubbing: emails/IPv4/phones replaced with typed placeholders,
    counts match, non-PII text untouched; Spark and DuckDB twins agree."""
    import duckdb

    from solr_spark.textops import (
        pii_counts, pii_counts_sql, scrub_pii, scrub_pii_sql,
    )

    texts = [
        "mail a.user+tag@sub.example.org or b@x.io, host 10.0.0.1, call 555-123-4567",
        "no pii here, just 1.5 numbers and code()",
        "+44 123-456-7890 then 192.168.001.255 end",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    counts = pii_counts("text")
    got = df.select(
        scrub_pii("text").alias("clean"), *[c.alias(n) for n, c in counts.items()]
    ).collect()
    assert got[0]["clean"] == "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>"
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == (2, 1, 1)
    assert got[1]["clean"] == texts[1]  # untouched
    assert got[1]["n_emails"] == got[1]["n_ips"] == got[1]["n_phones"] == 0
    assert "<IP>" in got[2]["clean"] and "<PHONE>" in got[2]["clean"]

    con = duckdb.connect()
    for i, t in enumerate(texts):
        lit = "'" + t.replace("'", "''") + "'"
        sql_clean = con.execute(f"SELECT {scrub_pii_sql(lit)}").fetchone()[0]
        assert sql_clean == got[i]["clean"], t
        cs = pii_counts_sql(lit)
        vals = con.execute(
            f"SELECT {cs['n_emails']}, {cs['n_ips']}, {cs['n_phones']}"
        ).fetchone()
        assert tuple(vals) == (
            got[i]["n_emails"], got[i]["n_ips"], got[i]["n_phones"]
        ), t


def test_span_dedup_keep_first(spark):
    """C4-style span dedup: the globally FIRST (doc_id, pos) occurrence
    of a span is kept; all later occurrences count as removed; tail
    tokens short of a full span never form one."""
    from solr_spark.dedup import span_dedup_counts

    rows = [
        (1, "a b c d e f"),        # spans: 'a b c', 'd e f'  (both first)
        (2, "a b c a b c x"),      # 'a b c' dup, 'a b c' dup again; 'x' = tail
        (3, "d e f g h i d e f"),  # 'd e f' dup, 'g h i' first, 'd e f' dup
        (4, "z z"),                # shorter than one span -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_removed"])
        for r in span_dedup_counts(df, span_tokens=3).collect()
    }
    assert got == {1: (2, 0), 2: (2, 2), 3: (3, 2)}


def test_bigram_lm_crossentropy_python_oracle(spark):
    """Laplace bigram LM: engine cross-entropy equals the pure-Python
    computation on a tiny corpus; 1-token docs drop."""
    import math
    from collections import Counter

    from solr_spark.textops import bigram_lm_scores

    rows = [(1, "a b a b c"), (2, "b c b"), (3, "a"), (4, "c a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    toks = {i: t.split() for i, t in rows}
    occ = [(w1, w2) for t in toks.values() for w1, w2 in zip(t, t[1:])]
    c12, c1 = Counter(occ), Counter(w1 for w1, _ in occ)
    V = len({w for t in toks.values() for w in t})

    def ce(t):
        pairs = list(zip(t, t[1:]))
        return sum(
            -math.log((c12[p] + 1.0) / (c1[p[0]] + 1.0 * V)) for p in pairs
        ) / len(pairs)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in bigram_lm_scores(df).collect()
    }
    assert set(got) == {1, 2, 4}  # doc 3 has no bigram
    for i in (1, 2, 4):
        assert got[i][0] == len(toks[i]) - 1
        assert got[i][1] == pytest.approx(round(ce(toks[i]), 5), abs=1e-9)


def test_gopher_filter_flags_rules(spark):
    """Each Gopher rule trips independently and keep is the conjunction."""
    from solr_spark.textops import gopher_filter_flags

    good = "the and of " + " ".join(f"word{i}" for i in range(60))
    rows = [
        (1, good),                                        # passes all
        (2, "the and " + "w " * 10),                      # too few words
        (3, "the and of " + "ab " * 60),                  # mean word len < 3
        (4, "the and of " + " ".join("!!!word%d!!!" % i for i in range(60))),  # symbols
        (5, " ".join(f"word{i}" for i in range(60))),     # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_filter_flags(df, "doc_id", "text").collect()}
    assert got[1]["keep"]
    assert not got[2]["ok_word_count"] and not got[2]["keep"]
    assert not got[3]["ok_mean_word_len"] and not got[3]["keep"]
    assert not got[4]["ok_symbol_ratio"] and not got[4]["keep"]
    assert not got[5]["ok_stopwords"] and not got[5]["keep"]


def test_dup_substring_overlap_merge(spark):
    """ExactSubstr windows: a shared run longer than min_len produces
    overlapping duplicate windows whose covered positions MERGE (no
    double count); unique docs report zeros; short docs drop."""
    from solr_spark.dedup import dup_substring_stats

    shared = " ".join(f"s{i}" for i in range(6))  # 6-token shared run
    rows = [
        (1, shared + " x1 x2 x3 x4"),   # 10 toks: windows at 0..5 (W=5)
        (2, "y0 " + shared + " y1"),    # same 6-token run elsewhere
        (3, "z0 z1 z2 z3 z4 z5 z6"),    # unique content
        (4, "w0 w1"),                   # shorter than one window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["n_dup_tokens"])
        for r in dup_substring_stats(df, min_len=5).collect()
    }
    # the 6-token shared run contains TWO 5-token windows; both dup;
    # their coverage merges to exactly the 6 shared positions
    assert got[1] == (6, 2, 6)
    assert got[2] == (4, 2, 6)
    assert got[3] == (3, 0, 0)
    assert 4 not in got


def test_embedding_exact_twin_refuses_large_corpus(spark):
    from pyspark.sql import functions as F

    from solr_spark.dedup import embedding_neardup_pairs

    big = spark.range(100_001).select(
        F.col("id"), F.array(F.lit(1.0), F.lit(0.0)).alias("emb")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="oracle twin"):
        embedding_neardup_pairs(big, "id", "emb")
