"""Python/NumPy oracles for the operators whose semantics aren't cleanly
SQL-expressible (driver records rows-only checks for these): simhash, ANN
top-k (brute + LSH recall), mapInPandas media features, and HLL tolerance
(SURVEY.md §5.2 items 2 and 5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkcheck.operators import dedup, multimodal, similarity
from sparkcheck.operators.stats import column_stats

from .conftest import SF_DIR, SF_SMALL


def _docs(spark, sf=SF_SMALL):
    return spark.read.parquet(f"{sf}/documents.parquet")


def _emb(spark, sf=SF_SMALL):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


# --- simhash vs pure-python reimplementation ---------------------------------

def simhash_py(text: str, bits: int = 32) -> int:
    votes = [0] * bits
    for w in text.split(" "):
        h = hashlib.md5(w.encode()).hexdigest()
        for i in range(bits):
            votes[i] += 1 if h[i] in "13579bdf" else -1
    out = 0
    for i in range(bits):
        if votes[i] > 0:
            out |= 1 << i
    return out


def test_simhash_matches_python(spark):
    docs = _docs(spark).limit(50)
    got = {r["id"]: r["simhash"]
           for r in dedup.simhash(docs, id_col="doc_id").collect()}
    for row in docs.select("doc_id", "text").collect():
        assert got[row["doc_id"]] == simhash_py(row["text"]), row["doc_id"]


def test_simhash_similar_texts_close(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy cat today"),
         (3, "completely different words about spark query engines here")],
        "id long, text string")
    s = {r["id"]: r["simhash"] for r in dedup.simhash(df, "id").collect()}
    d12 = bin(s[1] ^ s[2]).count("1")
    d13 = bin(s[1] ^ s[3]).count("1")
    assert d12 < d13  # near-dup pair closer in hamming space


# --- ANN: brute-force vs numpy; LSH recall ------------------------------------

def _numpy_topk(emb_rows, query_ids, k=10):
    ids = np.array([r["vec_id"] for r in emb_rows])
    m = np.stack([np.array(r["embedding"], dtype=np.float64)
                  for r in emb_rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in query_ids:
        qv = m[ids == q][0]
        scores = np.round(m @ qv, 4)
        order = sorted((r_id for r_id in ids if r_id != q),
                       key=lambda r_id: (-scores[ids == r_id][0], r_id))
        out[q] = order[:k]
    return out


def test_brute_topk_matches_numpy(spark):
    emb = _emb(spark)
    rows = emb.collect()
    expected = _numpy_topk(rows, [0, 1, 2], k=10)
    got = similarity.brute_topk(emb, [0, 1, 2], k=10).collect()
    for q in [0, 1, 2]:
        mine = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == q), key=lambda r: r["rank"])]
        assert mine == list(expected[q]), f"query {q}"


def test_lsh_topk_recall_reasonable(spark):
    emb = _emb(spark)
    brute = similarity.brute_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    lsh = similarity.lsh_topk(emb, [0, 1, 2, 3, 4], k=10, bits=4,
                              tables=4).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    l = {(r["query_id"], r["vec_id"]) for r in lsh}
    recall = len(b & l) / len(b)
    # 4-bit × 4-table OR-construction on random vectors: nontrivial recall
    assert recall > 0.15, recall
    # LSH scores must agree with brute scores on the intersection
    bscore = {(r["query_id"], r["vec_id"]): r["score"] for r in brute}
    for r in lsh:
        key = (r["query_id"], r["vec_id"])
        if key in bscore:
            assert abs(r["score"] - bscore[key]) < 1e-9


def test_lsh_bucket_udf_matches_sql_expr(spark):
    """The Arrow-matmul bucket UDF (scale path) and the codegen SQL bucket
    expression (oracle path) must assign identical signatures."""
    emb = _emb(spark)
    udf_b = similarity.lsh_bucket_udf(64, bits=8, seed=7)
    got = (emb.select(
        udf_b(F.col("embedding")).alias("u"),
        similarity.lsh_bucket_expr("embedding", 64, bits=8, seed=7).alias("s"))
        .filter(F.col("u") != F.col("s")).count())
    assert got == 0


# --- media features (mapInPandas plumbing with deterministic fake decoder) ---

def test_media_features_deterministic_and_correct(spark):
    from sparkcheck.sources.pages import load_pages
    pages = load_pages(spark, SF_SMALL, replicas=2).limit(40)
    feats = multimodal.extract_features(pages, "html", "rid", kind="page") \
        .collect()
    assert len(feats) == pages.filter(F.col("html").isNotNull()).count()
    raw = {str(r["rid"]): bytes(r["html"])
           for r in pages.select("rid", "html").collect()
           if r["html"] is not None}
    for r in feats[:10]:
        expect_feat, w, h = multimodal.fake_decoder(raw[r["media_id"]], "page")
        assert np.allclose(r["feat"], expect_feat)
        assert (r["width"], r["height"]) == (w, h)
        assert r["byte_len"] == len(raw[r["media_id"]])


def test_real_decoder_unsupported_formats_raise():
    # formats needing PIL/librosa/ffmpeg stay an explicit, documented stub
    with pytest.raises(NotImplementedError):
        multimodal.real_decoder(b"\x89PNG\r\n", "image")
    with pytest.raises(NotImplementedError):
        multimodal.real_decoder(b"ID3\x04", "audio")


def _ppm_bytes(w: int, h: int) -> bytes:
    px = bytes((x * 7 + 13) % 256 for x in range(w * h * 3))
    return f"P6\n# test comment\n{w} {h}\n255\n".encode() + px


def _wav_bytes(n_frames: int, ch: int = 2) -> bytes:
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(bytes((i * 31) % 256 for i in range(n_frames * ch * 2)))
    return buf.getvalue()


def test_real_decoder_ppm_and_wav_on_real_bytes(spark):
    ppm = _ppm_bytes(8, 6)
    feat, w, h = multimodal.real_decoder(ppm, "image")
    assert (w, h) == (8, 6) and len(feat) == multimodal.FEAT_DIM
    # feature = mean pixel value per 1/16th of the payload
    px = np.frombuffer(ppm[-8 * 6 * 3:], dtype=np.uint8).astype(np.float64)
    assert abs(feat[0] - np.array_split(px, 16)[0].mean()) < 1e-3

    wav = _wav_bytes(64)
    feat2, nf, meta = multimodal.real_decoder(wav, "audio")
    assert nf == 64 and meta == 2016  # 2 channels × 1000 + 16 bits

    # end-to-end through the Spark mapInPandas path on real bytes
    df = spark.createDataFrame([("img-1", ppm)], "media_id string, blob binary")
    rows = multimodal.extract_features(df, "blob", "media_id", kind="image",
                                       decoder=multimodal.real_decoder) \
        .collect()
    assert len(rows) == 1 and rows[0]["width"] == 8
    assert np.allclose(rows[0]["feat"], feat)


# --- HLL distinct within rsd tolerance vs exact --------------------------------

def test_hll_distinct_within_tolerance(spark):
    docs = _docs(spark, SF_DIR)
    approx = {r["col"]: r["n_distinct"]
              for r in column_stats(docs, ["doc_id", "lang"],
                                    hll_rsd=0.02).collect()}
    exact = {r["col"]: r["n_distinct"]
             for r in column_stats(docs, ["doc_id", "lang"],
                                   exact_distinct=True).collect()}
    for c in ["doc_id", "lang"]:
        assert abs(approx[c] - exact[c]) <= max(3, 0.1 * exact[c]), c


def test_auto_bits_scales_with_corpus():
    from sparkcheck.operators.similarity import auto_bits
    assert auto_bits(100) == 4              # tiny corpus → floor
    assert auto_bits(10_000) == 7           # ceil(log2(10000/128))
    assert auto_bits(10**9) == 23           # constant occupancy at scale
    assert auto_bits(10**12) == 30          # hi cap (2^30 buckets)


def test_embedding_near_dups_auto_bits(spark):
    emb = _emb(spark)
    # bits=None auto-sizes (500 rows → 4 bits); equals the explicit setting
    auto = similarity.embedding_near_dups(emb, threshold=0.4, bits=None)
    fixed = similarity.embedding_near_dups(emb, threshold=0.4, bits=4)
    assert sorted(map(tuple, auto.collect())) == \
        sorted(map(tuple, fixed.collect()))


def test_rolling_fingerprint_order_sensitive(spark):
    """roll_fp distinguishes reordered token streams; the set-hash fp does
    not — together they split exact-dup vs bag-of-words-dup."""
    from sparkcheck.operators.textstats import fingerprint, fingerprint_rolling
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"),
         (3, "alpha beta gamma")], "doc_id long, text string")
    roll = {r["doc_id"]: r["roll_fp"]
            for r in fingerprint_rolling(df).collect()}
    setfp = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert roll[1] == roll[3] != roll[2]
    assert setfp[1] == setfp[2] == setfp[3]


# --- IVF ANN (coarse-quantizer companion to LSH) -----------------------------

def test_ivf_assign_udf_matches_sql(spark):
    """The Arrow-matmul assignment (scale path) and the crossJoin+argmax SQL
    path must pick identical centroids for every vector (both argmax over
    the 4dp-rounded score grid, ties → smallest cid)."""
    emb = _emb(spark)
    cent = similarity.ivf_centroids(emb, 16)
    a = similarity.ivf_assign(emb, cent).select("vec_id", "cid")
    b = similarity.ivf_assign_udf(emb, cent).select(
        "vec_id", F.col("cid").alias("cid_udf"))
    mismatches = (a.join(b, "vec_id")
                   .filter(F.col("cid") != F.col("cid_udf")).count())
    assert mismatches == 0
    assert a.count() == emb.count()


def test_ivf_topk_recall_and_scores(spark):
    """nprobe=2 of 4 cells scans ~half the corpus → nontrivial top-10
    recall; every returned score must equal the brute-force score for the
    same pair (IVF changes the candidate set, never the metric)."""
    emb = _emb(spark)
    brute = similarity.brute_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    ivf = similarity.ivf_topk(emb, [0, 1, 2, 3, 4], k=10,
                              n_centroids=4, nprobe=2).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    i = {(r["query_id"], r["vec_id"]) for r in ivf}
    recall = len(b & i) / len(b)
    assert recall > 0.2, recall
    bscore = {(r["query_id"], r["vec_id"]): r["score"] for r in brute}
    for r in ivf:
        key = (r["query_id"], r["vec_id"])
        if key in bscore:
            assert abs(r["score"] - bscore[key]) < 1e-9


def test_auto_centroids_ladder_matches_sql():
    """Python ladder ≡ SQL ladder for every corpus size across the range
    (the oracled query derives C from count(*) on both sides)."""
    import duckdb
    con = duckdb.connect()
    for n in [1, 4, 15, 16, 17, 500, 10**4, 10**6, 10**8]:
        sql = similarity.auto_centroids_sql(str(n))
        got = con.execute(f"SELECT {sql}").fetchone()[0]
        assert got == similarity.auto_centroids(n), n
    assert similarity.auto_centroids(10**12) == 4096  # capped


# --- skew diagnostics --------------------------------------------------------

def test_heavy_hitters_and_skew_stats(spark):
    """heavy_hitters order/share vs a pandas recomputation; skew_stats
    consistency (max_cnt is the top hitter's count)."""
    from sparkcheck.operators.skew import heavy_hitters, skew_stats
    from sparkcheck.sources.pages import load_pages
    docs = load_pages(spark, SF_SMALL, replicas=2)
    host = F.regexp_extract(F.col("url"), r"https?://([^/]+)", 1)
    hh = heavy_hitters(docs, host, k=5, key_name="host").collect()
    pdf = docs.select(host.alias("host")).toPandas()
    counts = pdf["host"].value_counts()
    total = len(pdf)
    assert [r["host"] for r in hh[:3]] == [
        k for k, _ in sorted(counts.items(),
                             key=lambda kv: (-kv[1], kv[0]))[:3]]
    for r in hh:
        assert r["cnt"] == counts[r["host"]]
        import math
        assert abs(r["share"]
                   - math.floor(r["cnt"] / total * 10000 + 0.5) / 10000) < 1e-12
    st = skew_stats(docs, host, key_name="host").collect()[0]
    assert st["n_keys"] == counts.size
    assert st["max_cnt"] == counts.max() == hh[0]["cnt"]
    assert st["skew_ratio"] >= 1.0


def test_ivf_topk_udf_path_matches_sql_path(spark):
    """ivf_topk(use_udf=True) wires the Arrow assignment into the same
    search — results must be identical to the SQL-path call."""
    emb = _emb(spark)
    a = similarity.ivf_topk(emb, [0, 1, 2], k=5, n_centroids=8,
                            nprobe=2).collect()
    b = similarity.ivf_topk(emb, [0, 1, 2], k=5, n_centroids=8,
                            nprobe=2, use_udf=True).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in a]) == \
           sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in b])


def test_ivf_auto_switches_to_arrow_assignment_at_large_c(spark):
    """VERDICT r3 item 3: the engine decides the assignment strategy itself.
    At n_centroids ≤ IVF_UDF_SWITCH the plan stays pure codegen SQL (no
    Python eval node); one centroid above, the Arrow matmul path is chosen —
    and the switched path returns exactly what the SQL-expr path computes."""
    from sparkcheck.operators.similarity import IVF_UDF_SWITCH

    emb = _emb(spark)

    def plan(c):
        df = similarity.ivf_topk(emb, [0, 1, 2], k=5, n_centroids=c)
        return df._jdf.queryExecution().executedPlan().toString()

    sql_plan = plan(IVF_UDF_SWITCH)
    assert "EvalPython" not in sql_plan and "MapInPandas" not in sql_plan
    assert "MapInPandas" in plan(IVF_UDF_SWITCH + 1)

    # equality ON the switched path: auto (→ Arrow) vs forced SQL folds at a
    # C above the switch point
    sql = similarity.ivf_topk(emb, [0, 1, 2], k=5, n_centroids=300,
                              use_udf=False).collect()
    auto = similarity.ivf_topk(emb, [0, 1, 2], k=5, n_centroids=300).collect()
    canon = lambda rows: sorted(
        (r["query_id"], r["vec_id"], r["score"], r["rank"]) for r in rows)
    assert canon(sql) == canon(auto)


def test_ivf_arrow_search_is_single_corpus_pass(spark):
    """VERDICT r5 item 1 regression pin, updated for the r7 fused search:
    the Arrow IVF search must run exactly ONE Python evaluation pass over
    the corpus. Before the round-6 fix the optimizer duplicated the
    assignment pandas UDF into the inferred join-key null filter and the
    executed plan stacked TWO ArrowEvalPython passes over the full corpus
    — the driver-measured 175s at 1M vectors. Round 7 fused assignment +
    probe membership + scoring + per-batch top-k pruning into a single
    mapInPandas node (_ivf_search_fused), so the pinned shape is now: ONE
    MapInPandas, ZERO ArrowEvalPython/BatchEvalPython, and no join in the
    search at all (only the top-k window follows the scan)."""
    from sparkcheck.operators.similarity import IVF_UDF_SWITCH

    emb = _emb(spark)
    df = similarity.ivf_topk(emb, [0, 1, 2], k=5,
                             n_centroids=IVF_UDF_SWITCH + 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan, plan


def test_lsh_bucket_parity_above_16_bits(spark):
    """VERDICT r3 item 5 boundary: the >16-plane signature path executes
    bit-for-bit identically in both engines (a 20-plane fold per row), so
    the ORACLE_MAX_BITS=30 masked oracle is exercised beyond the old 16-bit
    cap without needing an 8.4M-row corpus for the ladder to get there."""
    import duckdb
    from sparkcheck.operators.similarity import lsh_bucket_expr, lsh_bucket_sql

    emb = _emb(spark)
    s = {r["vec_id"]: r["b"]
         for r in emb.select("vec_id",
                             lsh_bucket_expr("embedding", 64, 20).alias("b"))
         .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF_SMALL}/embeddings.parquet'")
    o = dict(con.execute(
        "SELECT vec_id, " + lsh_bucket_sql("embedding", 64, 20)
        + " FROM embeddings").fetchall())
    con.close()
    assert len(s) == len(o) and s == o
    assert max(s.values()) >= (1 << 16)  # signatures genuinely use high bits


def test_auto_bits_ladder_python_vs_sql_past_16(spark):
    """The auto_bits integer ladder and its SQL rendering decide identically
    for corpus sizes on both sides of the old 16-bit cap, up to the hi=30
    engine ceiling."""
    import duckdb
    from sparkcheck.operators.similarity import auto_bits, auto_bits_sql

    con = duckdb.connect()
    for n in [1, 500, 2048, (128 << 16) - 1, 128 << 16, (128 << 16) + 1,
              128 << 22, (128 << 29) + 1, 10 ** 12]:
        py = auto_bits(n)
        sql = con.execute(f"SELECT {auto_bits_sql(str(n))}").fetchone()[0]
        assert py == sql, (n, py, sql)
    assert auto_bits(10 ** 9) == 23 and auto_bits(10 ** 12) == 30
    con.close()


def test_brute_topk_udf_matches_sql_path(spark):
    """The Arrow matmul brute force (the recall oracle at 10^6+ corpora)
    produces the identical (query, neighbor, score, rank) set as the
    interpreted-lambda SQL formulation on the 4dp grid."""
    emb = _emb(spark)
    a = similarity.brute_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    b = similarity.brute_topk_udf(emb, [0, 1, 2, 3, 4], k=10).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert [(r["query_id"], r["vec_id"], r["score"], r["rank"])
            for r in sorted(a, key=key)] == \
           [(r["query_id"], r["vec_id"], r["score"], r["rank"])
            for r in sorted(b, key=key)]


def test_load_embeddings_amplified_deterministic(spark):
    """Replica-amplified corpus: exact row count, collision-free id spaces,
    distinct perturbed vectors, and bit-stable across invocations (integer
    hash noise, no RNG state)."""
    from sparkcheck.sources.embeddings import load_embeddings
    amp = load_embeddings(spark, SF_SMALL, replicas=3)
    n_base = _emb(spark).count()
    assert amp.count() == 3 * n_base
    assert amp.select("vec_id").distinct().count() == 3 * n_base
    # replicas of base row 0 are near (perturb=0.1) but not equal
    rows = {r["vec_id"]: list(r["embedding"])
            for r in amp.filter(
                F.col("vec_id") % n_base == 0).collect()}
    v0, v1 = rows[0], rows[n_base]
    assert v0 != v1
    import numpy as np
    a, b = np.array(v0), np.array(v1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.95, cos
    again = {r["vec_id"]: list(r["embedding"])
             for r in load_embeddings(spark, SF_SMALL, replicas=3)
             .filter(F.col("vec_id") % n_base == 0).collect()}
    assert again == rows
