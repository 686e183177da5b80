"""Deduplication operators for training-data pipelines: exact (hash-groupBy),
MinHash+LSH (shingle → minhash → band → bucket-join), n-gram Jaccard
verification, SimHash. (Beyond the reference's surface — first-class
components per the build brief.)

Scale design: exact dedup is a map-side-combining hash aggregate on the text
hash; MinHash signatures are computed with higher-order array functions (no
explode — one pass, no shuffle until the band-bucket groupBy); candidate
generation shuffles only (band, bucket) pairs; Jaccard verification touches
candidate pairs only (a broadcast-joinable set when near-dup density is sane).

Portability: min-hashes are the lexicographic MIN of fixed-width md5 hex
strings (numeric min == string min for fixed-length hex), so the DuckDB
oracle reproduces signatures byte-for-byte — no engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 8      # minhash functions
DEFAULT_BANDS = 4  # bands (rows per band = K // BANDS)
_HASHMIN_CP_EVERY = 6  # hash-min lineage-truncation cadence (plan ≤ 2^6)
SHINGLE = 3        # word-shingle width


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") \
        -> DataFrame:
    """Exact dedup groups: (text_hash, n_docs, min_id) for texts appearing
    more than once. One hash aggregate (partial+final)."""
    return (df.filter(F.col(text_col).isNotNull())
              .groupBy(F.md5(F.col(text_col)).alias("text_hash"))
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.min(id_col).alias("min_id"))
              .filter(F.col("n_docs") > 1))


def exact_drop_list(df: DataFrame, id_col: str, text_col: str = "text") \
        -> DataFrame:
    """The operational half of exact dedup: (id, keep_id) for every row that
    should be DELETED — all members of a duplicate-text group except the
    keeper (min id). One agg + one equi-join on the text hash (both sides
    hash-partitioned by it; AQE broadcasts the dup-group side when small).
    `df.join(exact_drop_list(df, id), id, 'left_anti')` is the dedup write."""
    groups = exact_duplicates(df, id_col, text_col) \
        .select("text_hash", F.col("min_id").alias("keep_id"))
    rows = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.md5(F.col(text_col)).alias("text_hash")))
    return (rows.join(groups, on="text_hash")
                .filter(F.col("id") != F.col("keep_id"))
                .select("id", "keep_id"))


def shingles(text_col: str, width: int = SHINGLE):
    """Word w-shingles via higher-order functions (no explode)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    return F.when(n >= width, F.transform(
        F.sequence(F.lit(1), n - width + 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, width)))
    ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signature(text_col: str, k: int = DEFAULT_K,
                      width: int = SHINGLE):
    """Array of k min-hashes; hash_j(s) = md5('{j}:' || s) (hex string min)."""
    sh = shingles(text_col, width)

    def hash_fn(j):
        # factory closure — a default-arg lambda would be seen as a 2-arg
        # (element, index) higher-order function by pyspark
        return lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))

    return F.array(*[
        F.array_min(F.transform(sh, hash_fn(j))) for j in range(k)])


def with_minhash(df: DataFrame, id_col: str, text_col: str = "text",
                 k: int = DEFAULT_K, bands: int = DEFAULT_BANDS) -> DataFrame:
    """(id, band, bucket): one row per band; bucket = md5 of the band's
    signature slice."""
    rows = k // bands
    sig = minhash_signature(text_col, k)
    d = (df.filter(F.col(text_col).isNotNull())
           .select(F.col(id_col).alias("id"), sig.alias("sig")))
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat_ws("|", *[
                     F.col("sig")[b * rows + r] for r in range(rows)]))
                 .alias("bucket"))
        for b in range(bands)])
    return (d.select("id", F.explode(band_structs).alias("bb"))
             .select("id", F.col("bb")["band"].alias("band"),
                     F.col("bb")["bucket"].alias("bucket")))


def with_minhash_fast(df: DataFrame, id_col: str, text_col: str = "text",
                      k: int = DEFAULT_K, bands: int = DEFAULT_BANDS) \
        -> DataFrame:
    """The SCALE-PATH band/bucket builder: same (id, band, bucket) contract
    as with_minhash but measured 7× faster per signature at 100k pages
    (17.7s → 2.5s, local[32]).

    Why: Spark's array higher-order functions evaluate their lambdas
    INTERPRETED, outside whole-stage codegen — k transforms over ~80-element
    shingle arrays dominate the md5 formulation's cost (swapping md5 for
    xxhash64 inside the lambdas recovered only ~16%). This variant explodes
    the shingles once and computes all k min-hashes as codegen'd scalar
    xxhash64 aggregates with map-side partial combine — the one extra
    shuffle moves just (id, k longs) per row. Buckets are bigint (not md5
    hex), so signatures are NOT byte-compatible with the oracle-pinned md5
    formulation — use the md5 variant where DuckDB parity matters, this one
    at scale."""
    rows = k // bands
    # explode gram START POSITIONS and build each shingle as a codegen'd
    # scalar expression (concat_ws over slice) instead of exploding the
    # interpreted `shingles()` transform array — higher-order array lambdas
    # evaluate outside whole-stage codegen (the BENCH/BASELINE.md minhash
    # lesson; same formulation as cross_doc_gram_frac/dup_spans). Start
    # index 0 encodes the degenerate whole-text shingle, so the produced
    # strings are byte-identical to the transform formulation.
    words = F.split(F.col(text_col), " ")
    base = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("id"), words.alias("_w")))
    starts = (F.when(F.size("_w") >= SHINGLE,
                     F.sequence(F.lit(1), F.size("_w") - (SHINGLE - 1)))
               .otherwise(F.array(F.lit(0))))
    gram = (F.when(F.col("_i") == 0, F.concat_ws(" ", F.col("_w")))
             .otherwise(F.concat_ws(" ", F.slice("_w", F.col("_i"),
                                                 SHINGLE))))
    ex = (base.select("id", F.explode(starts).alias("_i"), "_w")
              .select("id", gram.alias("_s")))
    aggs = [F.min(F.xxhash64(F.lit(j), F.col("_s"))).alias(f"_h{j}")
            for j in range(k)]
    sig = ex.groupBy("id").agg(*aggs)
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.lit(b), *[F.col(f"_h{b * rows + r}")
                                        for r in range(rows)])
                 .alias("bucket"))
        for b in range(bands)])
    return (sig.select("id", F.explode(band_structs).alias("bb"))
               .select("id", F.col("bb")["band"].alias("band"),
                       F.col("bb")["bucket"].alias("bucket")))


DEFAULT_MAX_BUCKET = 200  # pair blowup cap: ≤ cap²/2 pairs per bucket


def minhash_candidates(df: DataFrame, id_col: str, text_col: str = "text",
                       k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
                       max_bucket: int = DEFAULT_MAX_BUCKET,
                       variant: str = "md5") -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH bucket.

    Bucket-size cap (100-TB guard): on web data a mass-duplicated page puts
    millions of ids into ONE (band,bucket) — within-bucket pairing is O(n²)
    and a single collect_set row OOMs an executor. Bucket sizes are counted
    FIRST (cheap map-side-combining agg); only buckets with 2..max_bucket
    members are collected and paired. Overflowing buckets are mass
    duplication — exact_duplicates catches those groups at O(n), and
    minhash_bucket_stats surfaces them for logging.

    variant='md5' is the oracle-parity formulation; variant='fast' swaps in
    with_minhash_fast (codegen'd xxhash64, measured 7× cheaper signatures)
    — same LSH statistics, different hash family, so candidate SETS differ
    between variants (both are valid LSH candidate generators)."""
    builder = {"md5": with_minhash, "fast": with_minhash_fast}[variant]
    bb = builder(df, id_col, text_col, k, bands)
    eligible = (bb.groupBy("band", "bucket")
                  .agg(F.count(F.lit(1)).alias("_n"))
                  .filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket))
                  .select("band", "bucket"))
    # semi-join keeps only pair-eligible buckets BEFORE the heavy collect —
    # AQE broadcasts `eligible` when small, shuffled join otherwise
    grouped = (bb.join(eligible, on=["band", "bucket"], how="left_semi")
                 .groupBy("band", "bucket")
                 .agg(F.array_sort(F.collect_set("id")).alias("ids")))
    pairs = grouped.select(F.explode(F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
        "struct(x as id_a, y as id_b))))")).alias("p"))
    return (pairs.select(F.col("p")["id_a"].alias("id_a"),
                         F.col("p")["id_b"].alias("id_b"))
                 .distinct())


def minhash_bucket_stats(df: DataFrame, id_col: str, text_col: str = "text",
                         k: int = DEFAULT_K, bands: int = DEFAULT_BANDS,
                         max_bucket: int = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Per-bucket sizes with the overflow flag — the 'what was dropped' log
    for capped candidate generation (no silent truncation)."""
    bb = with_minhash(df, id_col, text_col, k, bands)
    return (bb.groupBy("band", "bucket")
              .agg(F.count(F.lit(1)).alias("n"))
              .withColumn("overflowed", F.col("n") > max_bucket))


def ngram_jaccard(df: DataFrame, pairs: DataFrame, id_col: str,
                  text_col: str = "text", width: int = SHINGLE,
                  key: str = "string") -> DataFrame:
    """Jaccard similarity of word-shingle sets for candidate pairs:
    (id_a, id_b, jaccard rounded 4dp). Joins the candidate set to the corpus
    twice. The pair set is data-dependent (bounded per bucket by the
    max_bucket cap but still O(corpus) under high near-dup density), so no
    static broadcast hint — AQE broadcasts it at runtime when it measures
    small.

    key='hash' (the VERDICT r5 item 6 option, extended here): each
    document's DISTINCT shingle set is represented as xxhash64 longs, so
    the two pair-joins shuffle 8 bytes per shingle instead of the gram
    string — at high near-dup density the shingle arrays riding the pair
    frame ARE the shuffle cost. |A∩B|/|A∪B| over hashed sets equals the
    string-set value up to 64-bit collisions inside one pair's union
    (~|A∪B|²/2⁶⁵ — negligible), equivalence pytest-pinned; key='string'
    (default) keeps the byte-exact oracle formulation."""
    sh_arr = F.array_distinct(shingles(text_col, width))
    if key == "hash":
        sh_arr = F.array_distinct(
            F.transform(shingles(text_col, width), lambda s: F.xxhash64(s)))
    else:
        _keyed(F.lit(""), key)  # validate the option eagerly
    sh = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("_jid"), sh_arr.alias("_sh")))
    a = sh.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("sh_b"))
    j = (F.size(F.array_intersect("sh_a", "sh_b")) /
         F.size(F.array_union("sh_a", "sh_b")))
    j4 = F.floor(j * 10000 + F.lit(0.5)) / 10000.0  # cross-engine-stable 4dp
    return (pairs.join(a, "id_a").join(b, "id_b")
                 .select("id_a", "id_b", j4.alias("jaccard")))


def connected_components(pairs: DataFrame, a: str = "id_a", b: str = "id_b",
                         max_iter: int = 25,
                         owner: list | None = None,
                         formulation: str = "hashmin") -> DataFrame:
    """Connected components over an undirected pair list via hash-min label
    propagation: every node starts labeled with its own id; each round a node
    takes the MIN of its label and its neighbors' labels; fixpoint = every
    node carries its component's minimum id. Returns (id, component).

    Scale design: one shuffle join (edges × labels) + one map-side-combining
    min-aggregate per round; rounds = O(component diameter). Near-dup
    components on web data are tight clusters (a page and its mutations all
    pair with each other), so diameter is small; pathological chain graphs
    would need the large-star/small-star alternating formulation (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — max_iter guards
    against that shape with a loud error instead of a silently-partial
    labeling. Convergence is detected by the label SUM (labels only ever
    decrease, so an unchanged sum ⟺ fixpoint); summed as decimal(38,0) so
    10^12-scale ids cannot overflow the check.

    Lifecycle (same convention as uniqueness.gate_broadcast): iteration
    frames are persisted while the loop runs. With `owner` (a list, e.g. the
    engine's `persisted`) the converged label frame stays cached and its
    handle is appended for the caller to release. With owner=None no
    persisted handle survives the call — consuming the result recomputes the
    propagation chain once (lineage is intact and deterministic); fine for
    one-shot consumers, pass an owner when the components feed several
    downstream frames.

    NOTE eager: runs one Spark job per propagation round at call time.
    Every `_HASHMIN_CP_EVERY` rounds the label frame is rewritten through a
    parquet checkpoint: the iterative plan references `labels` twice per
    round (the join and the union), so the logical tree doubles every round
    and plan canonicalization at persist-time OOMs the driver past ~8-10
    rounds — truncation bounds the tree at 2^6 nodes while costing one tiny
    columnar write only on long-diameter graphs (tight web near-dup
    clusters converge before the first checkpoint and never pay it).

    `formulation`: "hashmin" (default — O(diameter) rounds, 1 join/round,
    right for the tight clusters web near-dup graphs form) or "star"
    (alternating large-star/small-star contraction, Kiveris et al. 2014 —
    O(log n) rounds at 2 joins/round, the escape hatch for chain-shaped
    graphs whose diameter exceeds any sane hash-min bound)."""
    if formulation == "star":
        return _cc_star(pairs, a, b, max_iter, owner)
    if formulation != "hashmin":
        raise ValueError(f"unknown formulation {formulation!r} "
                         "(expected 'hashmin' or 'star')")
    from pyspark.storagelevel import StorageLevel
    # the edge list (often the tail of an expensive candidate+verify
    # pipeline) is referenced once per round — persist it for the loop's
    # lifetime, released in the finally below. Symmetrization is an explode
    # of both orientations from ONE scan: the union formulation referenced
    # `pairs` twice, so materializing the cache ran the whole upstream
    # (LSH candidates + Jaccard verify) once per branch.
    edges = (pairs.select(F.explode(F.array(
                 F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                 F.struct(F.col(b).alias("src"), F.col(a).alias("dst"))))
                 .alias("_e"))
             .select(F.col("_e.src").alias("src"),
                     F.col("_e.dst").alias("dst"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    labels = (edges.select(F.col("src").alias("id")).distinct()
                   .select("id", F.col("id").alias("lbl"))
                   .persist(StorageLevel.MEMORY_AND_DISK))
    import shutil
    import tempfile

    spark = pairs.sparkSession
    cp_root: str | None = None
    cp_prev: str | None = None
    try:
        prev_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
        for rnd in range(1, max_iter + 1):
            msgs = (edges.join(labels, edges["src"] == labels["id"])
                         .select(F.col("dst").alias("id"), F.col("lbl")))
            new_labels = (msgs.union(labels.select("id", "lbl"))
                              .groupBy("id").agg(F.min("lbl").alias("lbl"))
                              .persist(StorageLevel.MEMORY_AND_DISK))
            new_sum = new_labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                out = labels.select("id", F.col("lbl").alias("component"))
                if owner is not None:
                    owner.append(labels)
                else:
                    labels.unpersist()
                return out
            prev_sum = new_sum
            if rnd % _HASHMIN_CP_EVERY == 0:
                # lineage truncation (see docstring): rewrite through
                # parquet so the doubling plan tree resets. The file backs
                # the frame from here on, so the dir must outlive the
                # returned frame's consumption — only the PREVIOUS
                # checkpoint is deleted.
                if cp_root is None:
                    cp_root = tempfile.mkdtemp(prefix="sparkcheck_cc_")
                path = f"{cp_root}/round_{rnd}"
                labels.write.mode("overwrite").parquet(path)
                labels.unpersist()
                labels = (spark.read.parquet(path)
                          .persist(StorageLevel.MEMORY_AND_DISK))
                if cp_prev is not None:
                    shutil.rmtree(cp_prev, ignore_errors=True)
                cp_prev = path
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds the bound; raise max_iter or rerun "
            "with formulation='star' (O(log n) rounds on chain-shaped "
            "graphs)")
    except Exception:
        if labels.is_cached:
            labels.unpersist()
        raise
    finally:
        edges.unpersist()


def _cc_star(pairs: DataFrame, a: str, b: str, max_iter: int,
             owner: list | None) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
    and Beyond", SoCC 2014): each round rewires every edge toward the
    minimum of a local neighborhood, halving effective diameter — O(log n)
    rounds on ANY graph shape, including the chains that defeat hash-min.

    large-star: for each node u, connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u}).  small-star: orient edges large→small, connect every
    smaller neighbor (and u itself) to that minimum.  At the fixpoint the
    graph is disjoint stars centered at component minima (Theorem 1 of the
    paper), so the final edge list IS the labeling.

    Convergence: a decimal(38,0) per-node label sum (labels never increase
    — every rewire targets a neighborhood minimum ≤ the old endpoint), the
    same monotone-checksum scheme the hash-min path uses; when the cheap
    sum goes flat, one exact set-equality check (except + count) confirms
    the edge-set fixpoint before declaring victory, so a sum collision can
    never return a partial labeling.

    Lineage: each round REWRITES the edge list through a parquet checkpoint
    (GraphFrames' connectedComponents does the same) — both star operations
    reference the edge frame twice (the symmetric union), so an in-memory
    iterative plan doubles per round and OOMs the driver on plan-string
    generation around round ~10. Checkpoint files live under
    `checkpoint_dir` (default: a driver tempdir — fine in local mode; on a
    multi-node cluster pass a SHARED path, e.g. on the object store).
    Intermediate rounds are deleted as the loop advances; the FINAL round's
    file backs the returned frame, so the directory must outlive
    consumption of the result. Because the result is parquet-backed,
    `owner` is accepted for signature parity but no persisted handle is
    ever created (re-consuming re-scans a tiny parquet file, not the loop).

    Scale shape per round: two groupBy-min aggregates + two shuffle joins
    on the node key + distinct + one parquet rewrite of the (small,
    ever-shrinking toward |V|) edge list. ~2× hash-min's per-round cost,
    which is why hash-min stays the default for tight web near-dup
    clusters. NOTE eager: runs Spark jobs per round at call time."""
    import shutil
    import tempfile

    spark = pairs.sparkSession
    cp_root = tempfile.mkdtemp(prefix="sparkcheck_cc_star_")

    def _cp(df: DataFrame, rnd: int) -> DataFrame:
        path = f"{cp_root}/round_{rnd}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def _label_sum(e: DataFrame):
        lab = (e.select(F.col("u").alias("id"), F.col("v").alias("lbl"))
                .union(e.select(F.col("v").alias("id"),
                                F.col("v").alias("lbl")))
                .groupBy("id").agg(F.min("lbl").alias("lbl")))
        return lab, lab.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]

    # one scan of `pairs` (often an expensive upstream pipeline): the
    # canonical pair list is checkpointed first, and nodes/edges both read
    # the checkpoint. Self-loop-only nodes survive via `nodes`.
    base = _cp(pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
                    .distinct(), 0)
    nodes = (base.select(F.col("u").alias("id"))
                 .union(base.select(F.col("v").alias("id")))
                 .distinct())
    edges = base.filter(F.col("u") != F.col("v"))
    prev_sum = _label_sum(edges)[1]
    prev_path = None  # round 0 backs `nodes` — never deleted in the loop
    for rnd in range(1, max_iter + 1):
        # large-star: sym neighborhoods, emit (v, m) for v > u
        sym = edges.union(edges.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("_mn"))
                   .select("u", F.least("_mn", F.col("u")).alias("m")))
        large = (sym.join(mins, "u")
                    .filter(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                    .filter(F.col("u") != F.col("v")).distinct())
        # small-star: orient large→small, emit (x, m) for x ∈ Γ(u)∪{u}
        ori = large.select(F.greatest("u", "v").alias("u"),
                           F.least("u", "v").alias("v")).distinct()
        mins2 = (ori.groupBy("u").agg(F.min("v").alias("_mn"))
                    .select("u", F.least("_mn", F.col("u")).alias("m")))
        small = _cp(ori.join(mins2, "u")
                       .select(F.col("v").alias("x"), "m")
                       .union(mins2.select(F.col("u").alias("x"), "m"))
                       .filter(F.col("x") != F.col("m"))
                       .select(F.col("x").alias("u"), F.col("m").alias("v"))
                       .distinct(), rnd)
        lab, new_sum = _label_sum(small)
        converged = False
        if new_sum == prev_sum:
            # cheap sum went flat → confirm the exact edge fixpoint
            converged = (small.exceptAll(edges).isEmpty()
                         and small.count() == edges.count())
        if prev_path is not None:
            shutil.rmtree(prev_path, ignore_errors=True)
        if converged:
            return (nodes.join(lab, "id", "left")
                    .select("id",
                            F.coalesce("lbl", "id").alias("component")))
        prev_path = f"{cp_root}/round_{rnd}"
        edges = small
        prev_sum = new_sum
    shutil.rmtree(cp_root, ignore_errors=True)
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} "
        "rounds — raise max_iter (rounds are O(log n), so this "
        "indicates a pathological input or too-small bound)")


def fuzzy_drop_list(df: DataFrame, id_col: str, text_col: str = "text",
                    threshold: float = 0.8, k: int = DEFAULT_K,
                    bands: int = DEFAULT_BANDS,
                    max_bucket: int = DEFAULT_MAX_BUCKET,
                    variant: str = "md5", max_iter: int = 25,
                    owner: list | None = None,
                    formulation: str = "hashmin") -> DataFrame:
    """The operational fuzzy half of dedup (the near-dup analogue of
    exact_drop_list, completing the reference's duplicate-check archetype
    /root/reference/src/test.spec.ts:407-446 at the fuzzy level): MinHash+LSH
    candidates → n-gram Jaccard ≥ threshold verified edges → connected
    components → (id, keep_id) for every row to DELETE, keeper = the
    component's minimum id. `df.join(fuzzy_drop_list(df, id), id,
    'left_anti')` is the dedup write.

    NOTE eager: the component loop runs Spark jobs at call time (one per
    propagation round). Inherits minhash_candidates' bucket-size cap, so
    mass-duplicated pages cannot blow up candidate generation (their groups
    are caught at O(n) by exact_drop_list, which composes with this one)."""
    cand = minhash_candidates(df, id_col, text_col, k, bands, max_bucket,
                              variant)
    # the fast (xxhash64) variant is already hash-family territory — its
    # Jaccard verify rides hashed shingle sets too (same values up to
    # 64-bit collisions, a fraction of the pair-join shuffle width); the
    # md5 variant keeps the byte-exact oracle formulation
    edges = (ngram_jaccard(df, cand, id_col, text_col,
                           key="hash" if variant == "fast" else "string")
             .filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b"))
    try:
        comp = connected_components(edges, max_iter=max_iter, owner=owner,
                                    formulation=formulation)
    except RuntimeError as e:
        if "did not converge" not in str(e) or formulation != "hashmin":
            raise
        raise RuntimeError(
            "fuzzy_drop_list: the near-dup graph is chain-shaped (component "
            f"diameter > {max_iter} propagation rounds) — rerun with "
            "formulation='star' (O(log n) contraction) or raise max_iter"
        ) from e
    return (comp.filter(F.col("id") != F.col("component"))
                .select("id", F.col("component").alias("keep_id")))


def dedup_clean(df: DataFrame, id_col: str, text_col: str = "text",
                threshold: float = 0.8, variant: str = "md5",
                owner: list | None = None,
                formulation: str = "hashmin") -> DataFrame:
    """THE dedup write, composed end-to-end the way a training-data pipeline
    runs it: exact dedup first (O(n) hash agg — catches mass duplication the
    LSH bucket cap deliberately skips), then fuzzy dedup over the exact
    survivors (MinHash→Jaccard→connected components). Returns the SURVIVING
    rows of `df` (anti-join of both drop lists), i.e. what the pipeline
    would write out.

    Ordering matters at scale: running fuzzy on exact-survivors shrinks the
    candidate universe by the duplication factor and keeps identical-text
    groups from re-pairing inside LSH buckets.

    NOTE eager (inherited from fuzzy_drop_list): the component loop runs
    Spark jobs at call time."""
    survivors = df.join(exact_drop_list(df, id_col, text_col)
                        .select(F.col("id").alias(id_col)),
                        on=id_col, how="left_anti")
    fuzzy = fuzzy_drop_list(survivors, id_col, text_col,
                            threshold=threshold, variant=variant,
                            owner=owner, formulation=formulation)
    return survivors.join(fuzzy.select(F.col("id").alias(id_col)),
                          on=id_col, how="left_anti")


def simhash_bits(text_col: str = "text", bits: int = 32):
    """SimHash as pure SQL: per token t, md5(t) supplies `bits` hex nibbles;
    bit_i = (nibble_i & 1). Weighted sum over tokens per bit → sign →
    fingerprint int. Pure higher-order functions, portable formulation, but
    O(bits) expressions — default 32 bits keeps codegen sane."""
    words = F.split(F.col(text_col), " ")
    hashes = F.transform(words, lambda w: F.md5(w))
    def vote_fn(i):
        # +1 when hex nibble i is odd else -1, summed over tokens
        # (factory closure — a default-arg lambda would change the arity
        # pyspark infers for the higher-order function)
        def merge(acc, h):
            return acc + F.when(
                F.substring(h, i + 1, 1).isin(
                    "1", "3", "5", "7", "9", "b", "d", "f"),
                F.lit(1)).otherwise(F.lit(-1))
        return merge

    bit_cols = []
    for i in range(bits):
        votes = F.aggregate(hashes, F.lit(0), vote_fn(i))
        bit_cols.append(F.when(votes > 0, F.lit(1)).otherwise(F.lit(0))
                        * F.lit(2 ** i))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out.cast("bigint")


def simhash(df: DataFrame, id_col: str, text_col: str = "text",
            bits: int = 32) -> DataFrame:
    return (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("id"),
                      simhash_bits(text_col, bits).alias("simhash")))


def _keyed(col, key: str):
    """Shuffle-key choice for gram/line-keyed aggregates and joins:
    key='string' groups on the raw text (byte-parity with the oracle);
    key='hash' swaps in xxhash64(text) — identical groups up to 64-bit
    collisions (~N²/2⁶⁵: negligible at 10^12 grams) at a fraction of the
    shuffle width (8 bytes vs the full gram/line string). The VERDICT r5
    item 6 option: at 100 TB the string key IS the shuffle cost."""
    if key == "hash":
        return F.xxhash64(col)
    if key == "string":
        return col
    raise ValueError(f"key must be 'string' or 'hash', got {key!r}")


def cross_doc_gram_frac(df: DataFrame, id_col: str, text_col: str = "text",
                        n: int = SHINGLE, key: str = "string") -> DataFrame:
    """Per-document cross-corpus duplicate n-gram fraction — the
    RefinedWeb/MassiveText-style `dup_ngram_frac` filter signal: the share
    of a document's DISTINCT word n-grams that also appear in at least one
    OTHER document. Documents shorter than n words contribute their whole
    text as the single gram (same degenerate case as `shingles`).

    Output: (id, n_grams, n_dup_grams, dup_frac) with dup_frac 4dp-floored
    (the shared cross-engine float convention).

    Plan: explode gram START POSITIONS (codegen sequence + slice +
    array_join — scalar exprs in the hot per-element loop, not interpreted
    array lambdas, per the minhash lesson in BENCH/BASELINE.md), DISTINCT
    (id, gram), one map-side-combining aggregate per gram for document
    counts, join back, per-doc aggregate. Three key-partitioned shuffles,
    nothing all-pairs; the gram→count join is AQE's call (the dup-gram side
    is data-dependent). key='hash' (the 100-TB option, VERDICT r5 item 6)
    swaps the gram string for xxhash64(gram) as the distinct/agg/join key
    to cut shuffle width — counts identical up to 64-bit collisions
    (~N²/2⁶⁵); key='string' (default) keeps byte-identical oracle group
    keys. Equivalence pytest-pinned.
    """
    words = F.split(F.col(text_col), " ")
    base = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("id"), words.alias("w")))
    # start index 0 encodes the degenerate whole-text gram
    starts = (F.when(F.size("w") >= n,
                     F.sequence(F.lit(1), F.size("w") - (n - 1)))
               .otherwise(F.array(F.lit(0))))
    grams = (base.select("id", F.explode(starts).alias("i"), "w")
                 .select("id",
                         _keyed(F.when(F.col("i") == 0,
                                       F.array_join("w", " "))
                                 .otherwise(F.array_join(
                                     F.slice("w", F.col("i"), n), " ")),
                                key).alias("gram")))
    dg = grams.distinct()
    gc = dg.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("bigint")
    return (dg.join(gc, "gram")
              .groupBy("id")
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   dup.alias("n_dup_grams"))
              .select("id", "n_grams", "n_dup_grams",
                      (F.floor(F.col("n_dup_grams") / F.col("n_grams")
                               * 1e4 + F.lit(0.5)) / 1e4).alias("dup_frac")))


def line_dedup(df: DataFrame, id_col: str, text_col: str = "text",
               key: str = "string") -> DataFrame:
    """Cross-document line-level deduplication — the CCNet/RefinedWeb
    boilerplate-removal pass: across the whole corpus, each DISTINCT line
    text survives exactly once, in its first occurrence by (doc_id, line
    position); every other occurrence (nav bars, cookie banners, repeated
    headers) is dropped. Deterministic by construction — no shard-order
    dependence like the original CCNet hash-shard formulation.

    Output: (doc_id, n_lines, n_kept, clean_text) for every input doc
    (docs whose every line was dropped keep a row with clean_text='').

    Plan: posexplode lines → ONE map-side-combining min(struct(doc_id,
    pos)) aggregate per line text (the group-agg+join-back formulation of
    the first-occurrence window — no giant per-line window partitions) →
    join occurrences back on the line text (AQE's call) → per-doc
    reassembly via sort_array over (pos, line) structs. Three
    key-partitioned shuffles, nothing all-pairs. key='hash' (the 100-TB
    option, VERDICT r5 item 6) swaps the line string for xxhash64(line) as
    the agg/join key to cut shuffle width (identical survivors up to
    64-bit collisions; the line text still rides the occurrence side for
    reassembly); key='string' (default) keeps byte-identical oracle group
    keys — equivalence pytest-pinned. The final field-extraction transform
    is an interpreted lambda, but it runs once per KEPT line inside an
    already-shuffled row — not a hot scan loop."""
    _keyed(F.lit(""), key)  # validate the option eagerly
    base = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("id"),
                      F.split(F.col(text_col), "\n").alias("lines")))
    occ = base.select(
        "id", F.posexplode("lines").alias("pos", "line"))
    if key == "hash":
        occ = occ.withColumn("_lk", F.xxhash64("line"))
        join_key = "_lk"
    else:
        join_key = "line"
    first = occ.groupBy(join_key).agg(
        F.min(F.struct(F.col("id"), F.col("pos"))).alias("f"))
    kept = (occ.join(first, join_key)
               .filter((F.col("id") == F.col("f.id"))
                       & (F.col("pos") == F.col("f.pos")))
               .groupBy("id")
               .agg(F.count(F.lit(1)).cast("int").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.sort_array(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("clean_text")))
    return (base.select(F.col("id").alias("doc_id"),
                        F.size("lines").cast("int").alias("n_lines"))
                .join(kept.withColumnRenamed("id", "doc_id"),
                      "doc_id", "left")
                .select("doc_id", "n_lines",
                        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                        F.coalesce("clean_text", F.lit(""))
                         .alias("clean_text")))


DUP_SPAN_N = 5  # duplicated-span seed gram width (Lee et al. use 50 BPE
                # tokens at production scale; 5 words keeps the driver-gate
                # corpus exercising the merge logic)


def dup_spans(df: DataFrame, id_col: str, text_col: str = "text",
              n: int = DUP_SPAN_N, key: str = "string") -> DataFrame:
    """Cross-document duplicated SPANS — the exact-substring dedup signal
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), word-granular: every length-n token gram that occurs in more
    than one document (or more than once in one document) seeds a
    duplicated region; overlapping / touching seed grams within a document
    merge into maximal spans. Downstream, a pipeline masks or cuts these
    spans instead of dropping whole documents.

    Output: one row per maximal span (doc_id, span_start, span_end,
    span_len), token positions 1-based inclusive.

    Plan: explode gram start positions (codegen sequence + slice +
    array_join, the cross_doc_gram_frac formulation) → one map-side-
    combining count per gram (duplicated iff total occurrences > 1 —
    corpus-wide, so a gram repeated within one doc also counts) → join
    occurrences back on the gram string (Zipf-bounded vocab, AQE's call)
    → per-doc interval merge via two windows ordered by span start
    (running max of end over preceding rows → new-span flag → running sum
    as span id). Each window partition is ONE document's duplicated-gram
    starts — bounded by doc length, never the corpus. key='hash' (the
    100-TB option, VERDICT r5 item 6) swaps the gram string for
    xxhash64(gram) as the agg/join key as in cross_doc_gram_frac —
    identical spans up to 64-bit collisions, equivalence pytest-pinned;
    key='string' (default) keeps byte-identical oracle group keys."""
    from pyspark.sql import Window
    words = F.split(F.col(text_col), " ")
    base = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("doc_id"), words.alias("w"))
              .filter(F.size("w") >= n))
    grams = (base.select("doc_id",
                         F.explode(F.sequence(
                             F.lit(1), F.size("w") - (n - 1))).alias("i"),
                         "w")
                 .select("doc_id", "i",
                         _keyed(F.array_join(F.slice("w", F.col("i"), n),
                                             " "),
                                key).alias("gram")))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("occ"))
    seeds = (grams.join(counts.filter(F.col("occ") > 1), "gram")
                  .select("doc_id", F.col("i").alias("s"),
                          (F.col("i") + (n - 1)).alias("e")))
    w_prev = (Window.partitionBy("doc_id").orderBy("s")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("doc_id").orderBy("s")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    flagged = (seeds
               .withColumn("prev_max", F.max("e").over(w_prev))
               .withColumn("new_span",
                           (F.col("prev_max").isNull()
                            | (F.col("s") > F.col("prev_max") + 1))
                           .cast("int"))
               .withColumn("span_id", F.sum("new_span").over(w_run)))
    return (flagged.groupBy("doc_id", "span_id")
                   .agg(F.min("s").cast("int").alias("span_start"),
                        F.max("e").cast("int").alias("span_end"))
                   .select("doc_id", "span_start", "span_end",
                           (F.col("span_end") - F.col("span_start") + 1)
                           .cast("int").alias("span_len")))


def cut_dup_spans(df: DataFrame, id_col: str, text_col: str = "text",
                  n: int = DUP_SPAN_N, key: str = "string") -> DataFrame:
    """The operational half of span-level dedup: REMOVE every duplicated
    span found by `dup_spans` from the document text (Lee et al. 2022 cut
    the duplicated substring rather than the document). Output: (doc_id,
    n_tokens, n_cut, clean_text) for every input doc — n_cut is the
    number of tokens removed (spans are disjoint after the merge, so the
    span-length sum is exact), clean_text the surviving tokens rejoined.

    Plan: dup_spans' three shuffles, then ONE per-doc aggregate collecting
    that doc's (few, merged) spans into an array, one left join back to
    the corpus on doc_id, and a shuffle-free array filter dropping covered
    token positions. The position test is an interpreted lambda over
    tokens × spans-per-doc — spans are merged maximal intervals (handfuls
    per doc), so the inner list is tiny; the explode+range-join
    alternative would shuffle every token against a range predicate.
    key='hash' passes through to dup_spans (the 100-TB shuffle-width
    option)."""
    spans = dup_spans(df, id_col, text_col, n, key=key)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.sum("span_len").cast("int").alias("n_cut"))
    base = (df.filter(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("doc_id"),
                      F.split(F.col(text_col), " ").alias("w")))
    joined = base.join(per_doc, "doc_id", "left")
    sp = F.coalesce(F.col("_spans"),
                    F.array().cast(
                        "array<struct<span_start:int,span_end:int>>"))
    kept = F.filter(
        "w",
        lambda x, i: ~F.exists(
            sp, lambda s: (i + 1 >= s["span_start"])
                          & (i + 1 <= s["span_end"])))
    return joined.select(
        "doc_id",
        F.size("w").cast("int").alias("n_tokens"),
        F.coalesce("n_cut", F.lit(0)).alias("n_cut"),
        F.array_join(kept, " ").alias("clean_text"))
