"""Scale-behavior tests (SURVEY.md §5.2 item 4 + §4.2):
- skew: hot-key synthetic skew → salted two-phase counts identical to plain
  groupBy counts, and identical across salt_buckets settings
- plan quality: filters are pushed to the parquet scan; dimension joins are
  broadcast; no per-row Python UDF appears in the pure-SQL rule path
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcheck import suite as S
from sparkcheck.operators.uniqueness import duplicate_keys
from sparkcheck.sources.dims import iso_lang_dim
from sparkcheck.sources.pages import load_pages

from .conftest import SF_SMALL


def test_salted_count_matches_plain_groupby_under_skew(spark):
    # hot key: 50k rows on ONE key + uniform tail
    hot = spark.range(50_000).select(F.lit("https://hot/1").alias("url"))
    tail = spark.range(10_000).select(
        F.concat(F.lit("https://t/"), (F.col("id") % 5000).cast("string"))
        .alias("url"))
    df = hot.unionByName(tail)
    for buckets in (4, 64, 257):
        salted = {(r["url"], r["cnt"]) for r in
                  duplicate_keys(df, "url", salt_buckets=buckets).collect()}
        plain = {(r["url"], r["cnt"]) for r in
                 df.groupBy("url").agg(F.count(F.lit(1)).alias("cnt"))
                   .filter(F.col("cnt") > 1).collect()}
        assert salted == plain, f"buckets={buckets}"
    assert ("https://hot/1", 50_000) in plain


def test_filter_pushdown_reaches_parquet_scan(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = docs.filter(F.col("lang") == "en").select("doc_id", "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: scan schema must not include untouched text column
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_dimension_join_is_broadcast(spark):
    pages = load_pages(spark, SF_SMALL, replicas=2)
    fr = S.valid_pages(pages, iso_lang_dim(spark))
    plan = fr._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dup_key_join_not_statically_broadcast_under_mass_dup(spark):
    """100×-scale guard: the duplicate-key list is O(duplicate keys) —
    unbounded on web data — so the engine must NOT force-broadcast it. With
    ~30% of rows duplicated and the AQE broadcast threshold below the dup
    list size, the executed plan must keep a shuffled join (SortMergeJoin /
    ShuffledHashJoin), not a broadcast."""
    from sparkcheck import FieldConstraint, build_validator

    n = 30_000
    # ids 0..8999 appear twice (30% of 60k rows duplicated), rest unique
    base = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % (n - 9_000)).cast("string"))
        .alias("url"))
    v = (build_validator()
         .input(constraints=[FieldConstraint("url", "url IS NOT NULL", "req")],
                key_col="url")
         .unique("url"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        res = v.validate(base, persist=False)
        res.verdicts.collect()  # finalize the adaptive plan
        plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        res.unpersist()
    assert "BroadcastHashJoin" not in plan, plan[:2000]
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    # and the verdicts are still right: 2×9000 duplicated rows fail
    n_fail = res.verdicts.filter(~F.col("success")).count()
    assert n_fail == 18_000


def test_dup_key_join_aqe_broadcasts_when_small(spark):
    """The same plan with a tiny dup list: AQE's runtime size check converts
    the join to a broadcast — the threshold gate works both ways."""
    from sparkcheck import FieldConstraint, build_validator

    base = spark.range(10_000).select(
        F.when(F.col("id") < 4, F.lit("dup"))
         .otherwise(F.col("id").cast("string")).alias("url"))
    v = (build_validator()
         .input(constraints=[FieldConstraint("url", "url IS NOT NULL", "req")],
                key_col="url")
         .unique("url"))
    res = v.validate(base, persist=False)
    res.verdicts.collect()
    plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    res.unpersist()
    assert "BroadcastHashJoin" in plan


def test_minhash_bucket_cap_bounds_mass_duplication(spark):
    """A mass-duplicated text (one page duplicated 500×) must NOT explode
    candidate generation quadratically: its buckets overflow the cap and are
    skipped (surfaced via minhash_bucket_stats), while exact_duplicates
    catches the mass-dup group at O(n)."""
    from sparkcheck.operators import dedup

    mass = spark.range(500).select(
        F.col("id").alias("rid"),
        F.lit("the same spam page text repeated across many mirror hosts "
              "with identical words everywhere").alias("text"))
    near = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta"),
         (1001, "alpha beta gamma delta epsilon zeta eta iota")],
        "rid long, text string")
    df = mass.unionByName(near)

    cand = dedup.minhash_candidates(df, id_col="rid", max_bucket=50).collect()
    # bounded: only the small near-dup bucket pairs, not 500×499/2 spam pairs
    assert {(r["id_a"], r["id_b"]) for r in cand} == {(1000, 1001)}

    stats = dedup.minhash_bucket_stats(df, id_col="rid", max_bucket=50)
    overflow = stats.filter(F.col("overflowed")).collect()
    assert overflow and all(r["n"] == 500 for r in overflow)

    exact = dedup.exact_duplicates(df, id_col="rid").collect()
    assert len(exact) == 1 and exact[0]["n_docs"] == 500

    # the fast (codegen xxhash64) variant upholds the identical cap contract
    fcand = dedup.minhash_candidates(df, id_col="rid", max_bucket=50,
                                     variant="fast").collect()
    assert {(r["id_a"], r["id_b"]) for r in fcand} == {(1000, 1001)}


def test_minhash_fast_variant_finds_exact_dups(spark):
    """LSH invariant independent of the hash family: byte-identical texts
    produce identical signatures, hence collide in EVERY band — both the
    md5 (oracle) and xxhash64 (scale) variants must emit all exact-dup
    pairs, and near-identical texts must collide in at least one band."""
    from sparkcheck.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base),
         (4, base.replace("kappa", "lambda")),
         (5, "utterly different words nothing shared with the others at all x y z")],
        "rid long, text string")
    expect_exact = {(1, 2), (1, 3), (2, 3)}
    for variant in ("md5", "fast"):
        got = {(r["id_a"], r["id_b"]) for r in dedup.minhash_candidates(
            df, id_col="rid", variant=variant).collect()}
        assert expect_exact <= got, (variant, got)


def test_no_persisted_rdd_leak_from_gate_broadcast(spark):
    """Round-2 leak (VERDICT r02 item 5): gate_broadcast persisted the
    dup-key frame and frontier_after_unique/duplicate_rows discarded the
    handle — one cached frame leaked per driver query. The collect-once gate
    never persists under the threshold; after a stats-style query completes,
    the persisted-RDD registry is back where it started. The engine path
    (above-threshold persist with owner=persisted) is cleared by
    ValidationResult.unpersist()."""
    from sparkcheck.operators.stats import column_stats
    from sparkcheck.operators.uniqueness import duplicate_rows

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    pages = load_pages(spark, SF_SMALL, replicas=2)
    dim = iso_lang_dim(spark)
    column_stats(S.frontier_after_unique(pages, dim), S.STATS_COLS).collect()
    duplicate_rows(pages.select("url"), "url").count()
    assert jsc.getPersistentRDDs().size() == before

    # engine path: handles (annotated persist + any gate persist) all tracked
    v, deps = S.pages_validator(spark, with_stats=False, with_drift=False,
                                with_extraction=False)
    deps["baseline_stats"] = spark.createDataFrame(
        [], "col string, bucket string, p double")
    res = v.provide(**deps).validate(pages)
    res.verdicts.count()
    res.unpersist()
    assert jsc.getPersistentRDDs().size() == before


def test_sql_rule_path_has_no_python_udf(spark):
    pages = load_pages(spark, SF_SMALL, replicas=2)
    v, deps = S.pages_validator(spark, with_stats=False, with_drift=False,
                                with_extraction=False)
    deps["baseline_stats"] = spark.createDataFrame(
        [], "col string, bucket string, p double")
    res = v.provide(**deps).validate(pages, persist=False)
    res.verdicts.collect()  # finalize THIS query's AQE plan (count() would
    # execute a different wrapped queryExecution)
    plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "PythonUDF", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_ivf_assignment_plan_shape(spark):
    """IVF assignment must stay a broadcast crossJoin (centroids are the
    small side) with a partial (map-side-combining) argmax aggregate — only
    N rows may reach the shuffle, never the N×C scored pairs, and no
    shuffled join may appear anywhere in the build."""
    from sparkcheck.operators import similarity
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cent = similarity.ivf_centroids(emb, 16)
    plan = (similarity.ivf_assign(emb, cent)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # partial (map-side) aggregation below the exchange: the argmax is a
    # SortAggregate (the array-typed first(vec) buffer rules out hash agg)
    # but partial_max still collapses each task's N×C scored rows to N
    # before the single shuffle
    assert "partial_max" in plan
    assert plan.split("== Initial Plan ==")[0] \
               .count("Exchange hashpartitioning") == 1


def test_gate_small_and_big_paths_agree(spark):
    """The gate decision is a PHYSICAL choice only: forcing the big
    (shuffled, cache-backed) path by shrinking the broadcast threshold must
    produce byte-identical verdicts to the default (LocalRelation
    broadcast) path on the same input."""
    from sparkcheck import FieldConstraint, build_validator

    df = spark.range(20_000).select(
        F.concat(F.lit("https://x/p/"),
                 (F.col("id") % 15_000).cast("string")).alias("url"))

    def run():
        v = (build_validator()
             .input(constraints=[FieldConstraint("url", "url IS NOT NULL",
                                                 "req")], key_col="url")
             .unique("url"))
        res = v.validate(df)
        out = sorted((r["url"], r["success"], r["rule_id"])
                     for r in res.verdicts.collect())
        res.unpersist()
        return out

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    small_path = run()
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        big_path = run()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert small_path == big_path


def test_connected_components_label_propagation(spark):
    """Hash-min propagation reaches the component minimum across multi-hop
    chains (diameter > 1), labels singleton-edge and triangle components,
    and leaves no persisted RDD behind."""
    from sparkcheck.operators.dedup import connected_components

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain: min must travel 3 hops
         (10, 11),                        # single edge
         (20, 21), (21, 22), (20, 22)],   # triangle
        "id_a long, id_b long")
    comp = {r["id"]: r["component"]
            for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before


def test_connected_components_nonconvergence_is_loud(spark):
    """A diameter larger than max_iter must raise, never return a partial
    labeling silently."""
    import pytest
    from sparkcheck.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    ok = {r["id"]: r["component"]
          for r in connected_components(chain, max_iter=10).collect()}
    assert set(ok.values()) == {1}


def test_fuzzy_drop_list_bounds_mass_duplication(spark):
    """fuzzy_drop_list inherits the LSH bucket cap: a 500×-duplicated spam
    page cannot explode the component build (its buckets overflow and are
    skipped — exact_drop_list owns that group at O(n)); the genuine near-dup
    pair still yields its drop row."""
    from sparkcheck.operators import dedup

    mass = spark.range(500).select(
        F.col("id").alias("rid"),
        F.lit("the same spam page text repeated across many mirror hosts "
              "with identical words everywhere").alias("text"))
    near = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta"),
         (1001, "alpha beta gamma delta epsilon zeta eta iota")],
        "rid long, text string")
    df = mass.unionByName(near)

    drops = dedup.fuzzy_drop_list(df, id_col="rid", threshold=0.7,
                                  max_bucket=50).collect()
    assert {(r["id"], r["keep_id"]) for r in drops} == {(1001, 1000)}

    # exact dedup composes: the mass-dup group is caught at O(n)
    exact = dedup.exact_drop_list(df, id_col="rid")
    assert exact.count() == 499


def test_connected_components_star_chain_past_hashmin_bound(spark):
    """The star-contraction escape hatch: a 64-node chain (diameter 63)
    defeats hash-min at max_iter=10 but converges under the alternating
    large-star/small-star formulation in O(log n) rounds — and leaves no
    persisted RDD behind."""
    import pytest
    from sparkcheck.operators.dedup import connected_components

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="formulation='star'"):
        connected_components(chain, max_iter=10)
    comp = {r["id"]: r["component"]
            for r in connected_components(
                chain, max_iter=10, formulation="star").collect()}
    assert comp == {i: 1 for i in range(1, 65)}
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before


def test_connected_components_star_matches_hashmin(spark):
    """Both formulations produce the identical (id, component-minimum)
    labeling on a mixed-shape graph: chain + single edge + triangle +
    two components sharing no nodes."""
    from sparkcheck.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),
         (10, 11),
         (20, 21), (21, 22), (20, 22),
         (30, 31), (31, 30),              # reverse-duplicated edge
         (40, 40)],                       # self-loop: singleton labels itself
        "id_a long, id_b long")
    hm = {r["id"]: r["component"]
          for r in connected_components(edges).collect()}
    st = {r["id"]: r["component"]
          for r in connected_components(
              edges, formulation="star").collect()}
    assert st == hm
    assert st[40] == 40 and st[4] == 1 and st[22] == 20


def test_connected_components_star_owner_lifecycle(spark):
    """star is parquet-checkpoint-backed: it never creates a persisted
    handle (owner accepted for signature parity, stays empty) and the
    result survives repeated consumption (re-scans the final round file,
    does not re-run the contraction)."""
    from sparkcheck.operators.dedup import connected_components

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)], "id_a long, id_b long")
    handles: list = []
    out = connected_components(edges, formulation="star", owner=handles)
    assert handles == []
    assert {r["component"] for r in out.collect()} == {1}
    assert out.count() == 20  # second consumption: parquet re-scan
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before


def test_fuzzy_drop_list_star_formulation_passthrough(spark):
    """fuzzy_drop_list(formulation='star') runs the contraction end-to-end
    on real near-dup text and yields the same drop list as hash-min."""
    from sparkcheck.operators import dedup

    near = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta"),
         (1001, "alpha beta gamma delta epsilon zeta eta iota"),
         (2000, "one two three four five six seven eight nine ten"),
         (2001, "one two three four five six seven eight nine eleven")],
        "rid long, text string")
    hm = {(r["id"], r["keep_id"]) for r in dedup.fuzzy_drop_list(
        near, id_col="rid", threshold=0.7).collect()}
    st = {(r["id"], r["keep_id"]) for r in dedup.fuzzy_drop_list(
        near, id_col="rid", threshold=0.7,
        formulation="star").collect()}
    assert st == hm == {(1001, 1000), (2001, 2000)}
