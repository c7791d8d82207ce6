"""Index-build invariants: sha256 per row, doc stats, blocks, salting,
lineage manifests, resume, parallelism-invariance."""

import hashlib
import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.corpus import synth_corpus
from solr_spark.index.build import IndexConfig, build_index
from solr_spark.index.codec import delta_varint_decode, varint_decode


def test_meta(index, oracle):
    assert index.n_docs == oracle.n_docs
    assert abs(index.avgdl - oracle.avgdl) < 1e-9


def test_content_sha256_invariant(index, oracle_corpus):
    """Per-row invariant (BASELINE.json input_hint): sha256(content) equality."""
    got = {r["doc_id"]: r["content_sha256"] for r in index.docs.select("doc_id", "content_sha256").collect()}
    assert len(got) == len(oracle_corpus)
    for row in oracle_corpus.itertuples():
        expected = hashlib.sha256(row.content.encode()).hexdigest()
        assert got[row.doc_id] == expected


def test_doc_ids_are_global_rank(index, oracle_corpus):
    rows = index.docs.select("doc_id", "repo", "path", "commit").collect()
    got = sorted((r["repo"], r["path"], r["commit"], r["doc_id"]) for r in rows)
    for i, (_, _, _, doc_id) in enumerate(got):
        assert doc_id == i


def test_doc_len_matches_oracle(index, oracle):
    got = {r["doc_id"]: r["doc_len"] for r in index.docs.select("doc_id", "doc_len").collect()}
    for doc_id, dl in zip(oracle.doc_ids, oracle.doc_len):
        assert got[int(doc_id)] == int(dl)


def test_term_dict_matches_oracle(index, oracle):
    rows = index.term_dict.collect()
    assert len(rows) == len(oracle.postings)
    for r in rows:
        t = r["term"]
        assert t in oracle.postings
        assert r["df"] == len(oracle.postings[t][0])
        assert r["cf"] == int(oracle.postings[t][1].sum())
        assert abs(r["idf"] - oracle.idf(t)) < 1e-12


def test_blocks_decode_to_postings(index, oracle, test_config):
    """Decode every block of a few terms; postings must equal the oracle's."""
    terms = ["import", "value", "config"]
    doc_id_of_row = {i: int(d) for i, d in enumerate(oracle.doc_ids)}
    for term in terms:
        if term not in oracle.postings:
            continue
        blocks = index.blocks.where(F.col("term") == term).collect()
        got = {}
        for b in blocks:
            ids = delta_varint_decode(bytes(b["doc_ids_enc"]))
            tfs = varint_decode(bytes(b["tfs_enc"]))
            dls = varint_decode(bytes(b["dls_enc"]))
            assert len(ids) == b["n_docs"] == len(tfs) == len(dls)
            assert int(ids[0]) == b["min_doc_id"] and int(ids[-1]) == b["max_doc_id"]
            assert b["n_docs"] <= test_config.block_size
            for d, tf in zip(ids, tfs):
                got[int(d)] = int(tf)
        rows, tfs = oracle.postings[term]
        expected = {doc_id_of_row[int(r)]: int(tf) for r, tf in zip(rows, tfs)}
        assert got == expected


def test_hot_terms_are_salted(index, test_config):
    hot = [r["term"] for r in index.term_dict.where("is_hot").collect()]
    assert hot, "test corpus must contain hot terms above threshold"
    n_salts = (
        index.blocks.where(F.col("term").isin(hot))
        .select("term", "salt").distinct()
        .groupBy("term").count().collect()
    )
    assert any(r["count"] > 1 for r in n_salts), "salting did not split any hot term"
    cold_salts = index.blocks.where(~F.col("term").isin(hot)).select("salt").distinct().collect()
    assert [r["salt"] for r in cold_salts] == [0]


def test_block_bound_metadata_is_sound(index):
    """(max_tf, min_dl) must be the true block extremes, and the derived
    impact bound idf·max_tf/(max_tf+k1(1-b+b·min_dl/avgdl)) must
    dominate every decoded posting's impact (BMW soundness with
    stats-independent metadata)."""
    k1, b, avgdl = index.config.k1, index.config.b, index.avgdl
    idf = {r["term"]: r["idf"] for r in index.term_dict.collect()}
    sample = index.blocks.limit(200).collect()
    for blk in sample:
        tfs = varint_decode(bytes(blk["tfs_enc"])).astype(np.float64)
        dls = varint_decode(bytes(blk["dls_enc"])).astype(np.float64)
        assert int(tfs.max()) == blk["max_tf"]
        assert int(dls.min()) == blk["min_dl"]
        impacts = idf[blk["term"]] * tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
        mt, mdl = float(blk["max_tf"]), float(blk["min_dl"])
        bound = idf[blk["term"]] * mt / (mt + k1 * (1 - b + b * mdl / avgdl))
        assert impacts.max() <= bound + 1e-12


def test_manifests_lineage(index):
    ms = index.manifests()
    assert set(ms) == {"analyzed", "segments", "term_dict", "blocks"}
    for stage, m in ms.items():
        assert m["rows"] > 0
        assert m["n_files"] == len(m["files"])
        assert sum(f["rows"] for f in m["files"]) == m["rows"]
        assert m["config_hash"] == index.config.config_hash()
        assert m["wall_sec"] >= 0


def test_resume_skips_completed_stages(spark, index, test_config, tmp_path):
    """Delete the blocks stage, resume → only blocks rebuilds, bit-identical."""
    out = str(tmp_path / "resume_idx")
    shutil.copytree(index.dir, out)
    before = spark.read.parquet(os.path.join(out, "blocks"))
    before_pd = before.orderBy("term", "salt", "block_no").toPandas()
    # simulate a crash during the blocks stage
    shutil.rmtree(os.path.join(out, "blocks"))
    os.remove(os.path.join(out, "_MANIFEST_blocks.json"))
    with open(os.path.join(out, "_MANIFEST_analyzed.json")) as f:
        analyzed_before = json.load(f)["completed_at"]

    corpus = synth_corpus(spark, 10)  # wrong corpus — must NOT be re-read
    idx2 = build_index(spark, corpus, out, test_config, resume=True)
    # earlier stages untouched (the tiny corpus would have changed them)
    with open(os.path.join(out, "_MANIFEST_analyzed.json")) as f:
        assert json.load(f)["completed_at"] == analyzed_before
    assert idx2.n_docs == index.n_docs
    after_pd = idx2.blocks.orderBy("term", "salt", "block_no").toPandas()
    assert len(before_pd) == len(after_pd)
    for col in ["term", "salt", "block_no", "n_docs", "min_doc_id", "max_doc_id"]:
        assert list(before_pd[col]) == list(after_pd[col]), col
    for col in ["doc_ids_enc", "tfs_enc", "dls_enc"]:
        assert [bytes(x) for x in before_pd[col]] == [bytes(x) for x in after_pd[col]], col


def test_parallelism_invariance(spark, index, test_config, tmp_path):
    """Same corpus at different partitioning → identical index content.

    This is the property that makes the N vs 4N scaling runs comparable
    and doc_ids stable across cluster sizes."""
    out = str(tmp_path / "par3_idx")
    corpus3 = synth_corpus(spark, 1200, partitions=3)  # vs default 8
    idx3 = build_index(spark, corpus3, out, test_config)
    a = index.blocks.orderBy("term", "salt", "block_no").toPandas()
    b = idx3.blocks.orderBy("term", "salt", "block_no").toPandas()
    assert len(a) == len(b)
    assert list(a["term"]) == list(b["term"])
    assert [bytes(x) for x in a["doc_ids_enc"]] == [bytes(x) for x in b["doc_ids_enc"]]
    assert [bytes(x) for x in a["tfs_enc"]] == [bytes(x) for x in b["tfs_enc"]]


def test_xxhash64_py_matches_spark(spark):
    """The driver-side XXH64 mirror must be bit-identical to Spark's
    xxhash64 expression (term → bucket routing depends on it)."""
    from pyspark.sql import functions as F

    from solr_spark.functions.hashing import xxhash64_py

    terms = ["import", "def", "", "a", "x" * 31, "y" * 32, "z" * 100,
             "getUserName", "längër-ünïcode-ßtring", "snake_case_name"]
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", F.xxhash64("term").alias("h"),
                F.pmod(F.xxhash64("term"), F.lit(8)).cast("int").alias("b"))
        .collect()
    )
    for r in rows:
        assert xxhash64_py(r["term"]) == r["h"], r["term"]
        assert xxhash64_py(r["term"]) % 8 == r["b"], r["term"]


def test_payload_postings_roundtrip(spark, tmp_path):
    """with_payloads stores a per-occurrence payload stream (frozen
    function (len(token)+position) mod 8) that survives the codec:
    payload_score(sum) equals a driver-side recompute from stored_text."""
    from solr_spark.query.engine import SearchEngine
    from solr_spark.query.payload import payload_check, payload_score

    cfg = IndexConfig(
        block_size=8, hot_df_threshold=100, n_salts=2, n_term_buckets=4,
        with_payloads=True,
    )
    corpus = synth_corpus(spark, 300)
    idx = build_index(spark, corpus, str(tmp_path / "pidx"), cfg)
    eng = SearchEngine(idx)
    got = {r["doc_id"]: r["score"] for r in payload_score(eng, "import", "sum", k=5).collect()}

    chain = cfg.chain()
    expect = {}
    for r in idx.docs.select("doc_id", "stored_text").collect():
        toks = chain.tokenize_py(r["stored_text"])
        s = sum((len(t) + i) % 8 for i, t in enumerate(toks) if t == "import")
        if any(t == "import" for t in toks):
            expect[r["doc_id"]] = float(s)
    top = dict(sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    assert got == top

    # payload_check: every hit doc really has an occurrence with pay==3
    for r in payload_check(eng, "import", payload=3, k=5).collect():
        toks = chain.tokenize_py(
            idx.docs.where(F.col("doc_id") == r["doc_id"]).collect()[0]["stored_text"]
        )
        assert any(t == "import" and (len(t) + i) % 8 == 3 for i, t in enumerate(toks))


def test_arrow_postings_kernel_edge_cases(spark):
    """Empty-token docs and unicode terms through the mapInArrow
    postings kernel."""
    import pandas as pd

    from solr_spark.index.build import IndexConfig, build_postings

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "doc_len": [0, 3, 0, 2],
            "tokens": [[], ["héllo", "wörld", "héllo"], [], ["a", "a"]],
        }
    )
    df = spark.createDataFrame(pdf).repartition(2)
    out = build_postings(df, IndexConfig()).orderBy("doc_id", "term").collect()
    got = [(r["doc_id"], r["term"], r["tf"], list(r["positions"])) for r in out]
    assert got == [
        (1, "héllo", 2, [0, 2]),
        (1, "wörld", 1, [1]),
        (3, "a", 2, [0, 1]),
    ]


def test_snapshot_restore_roundtrip(spark, index, test_config, tmp_path):
    """BACKUPCORE/RESTORECORE analog: snapshot, clobber the live blocks,
    restore → queries answer identically to the pre-snapshot state."""
    from solr_spark.index.build import InvertedIndex, create_snapshot, restore_snapshot
    from solr_spark.query.engine import SearchEngine

    out = str(tmp_path / "snap_idx")
    shutil.copytree(index.dir, out)
    eng = SearchEngine(InvertedIndex(spark, out))
    before = [(r["doc_id"], r["score"]) for r in eng.topk("server data", k=10).collect()]

    snap = create_snapshot(out, "pre")
    assert os.path.isdir(os.path.join(snap, "blocks"))
    with pytest.raises(ValueError):
        create_snapshot(out, "pre")  # duplicate names refused

    # clobber the live index (truncate blocks to nothing)
    shutil.rmtree(os.path.join(out, "blocks"))
    os.makedirs(os.path.join(out, "blocks"))

    restore_snapshot(out, "pre")
    eng2 = SearchEngine(InvertedIndex(spark, out))
    after = [(r["doc_id"], r["score"]) for r in eng2.topk("server data", k=10).collect()]
    assert after == before
    # a completed restore leaves no journal marker or temp tree behind
    from solr_spark.index.build import pending_restore
    assert pending_restore(out) is None
    assert not os.path.exists(os.path.join(out, ".restore-tmp"))

    with pytest.raises(ValueError):
        restore_snapshot(out, "nope")

    # interrupted restore: simulate a crash mid-swap (marker written, a
    # live stage already deleted) — pending_restore names the snapshot and
    # re-running it heals the index idempotently
    with open(os.path.join(out, ".restore-inprogress"), "w") as f:
        f.write("pre")
    shutil.rmtree(os.path.join(out, "blocks"))
    assert pending_restore(out) == "pre"
    restore_snapshot(out, pending_restore(out))
    assert pending_restore(out) is None
    eng3 = SearchEngine(InvertedIndex(spark, out))
    healed = [(r["doc_id"], r["score"]) for r in eng3.topk("server data", k=10).collect()]
    assert healed == before
