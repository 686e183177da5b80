"""Round-6 operators: pack_sequences (two-phase distributed prefix sum)
and mixture_resample (exact-integer target-mixture rates)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkcheck.operators import sampling
from sparkcheck.operators.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestPackSequences:
    def test_known_answer(self, spark):
        # token counts: 3, 4, 2, 5 -> ends 3, 7, 9, 14; seq_len 4
        rows = [(1, "a b c"), (2, "a b c d"), (3, "a b"), (4, "a b c d e")]
        got = {r["doc_id"]: r for r in
               pack_sequences(_docs(spark, rows), seq_len=4,
                              bucket_width=2).collect()}
        # doc 1: [0,3) -> seq 0 only
        assert (got[1]["start_off"], got[1]["first_seq"],
                got[1]["last_seq"], got[1]["spans"]) == (0, 0, 0, 1)
        # doc 2: [3,7) -> crosses seq 0/1 boundary at 4
        assert (got[2]["start_off"], got[2]["first_seq"],
                got[2]["last_seq"], got[2]["spans"]) == (3, 0, 1, 2)
        # doc 3: [7,9) -> crosses 1/2 boundary at 8
        assert (got[3]["first_seq"], got[3]["last_seq"]) == (1, 2)
        # doc 4: [9,14) -> seqs 2..3
        assert (got[4]["start_off"], got[4]["first_seq"],
                got[4]["last_seq"], got[4]["spans"]) == (9, 2, 3, 2)

    def test_null_text_excluded_and_offsets_contiguous(self, spark):
        rows = [(1, "a b"), (2, None), (3, "c"), (4, "d e f")]
        got = sorted(pack_sequences(_docs(spark, rows), seq_len=2,
                                    bucket_width=2).collect(),
                     key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in got] == [1, 3, 4]
        # null-text doc contributes no tokens: stream is contiguous
        for prev, cur in zip(got, got[1:]):
            assert cur["start_off"] == prev["start_off"] + prev["n_tokens"]

    def test_bucket_width_invariance(self, spark):
        """The two-phase prefix sum is a pure optimization: placements are
        identical for any bucket width, including one doc per bucket and
        everything in one bucket (the one-window semantics)."""
        rows = [(i * 7 % 97, " ".join(["t"] * (1 + i % 9)))
                for i in range(60)]
        ref = sorted(map(tuple, pack_sequences(
            _docs(spark, rows), seq_len=8, bucket_width=10**6).collect()))
        for width in (1, 3, 16):
            got = sorted(map(tuple, pack_sequences(
                _docs(spark, rows), seq_len=8, bucket_width=width).collect()))
            assert got == ref, f"bucket_width={width}"

    def test_no_global_one_partition_window(self, spark):
        """The corpus-sized window is partitioned by bucket; the only
        unpartitioned window runs over the tiny bucket-summary frame.
        Pin: the physical plan's window over n_tokens rows must carry a
        partition spec (the oracle's global ORDER BY-only window would
        not)."""
        rows = [(i, "a b c") for i in range(50)]
        plan = pack_sequences(_docs(spark, rows), seq_len=4,
                              bucket_width=8)._jdf.queryExecution() \
            .executedPlan().toString()
        # every Window node over the doc stream must be partitioned by _b —
        # and the loop must actually MATCH at least one such node, so a
        # plan-string formatting change can't make the pin pass vacuously
        # (ADVICE r6)
        matched = 0
        for line in plan.splitlines():
            if "Window" in line and "n_tokens" in line \
                    and "partial" not in line:
                assert "_b" in line, line
                matched += 1
        assert matched >= 1, plan


class TestMixtureResample:
    def test_exact_rates(self, spark):
        # counts: en 40, de 10, fr 50; targets en 5000, de 4000, dflt 1000
        rows = ([(i, "en") for i in range(40)]
                + [(100 + i, "de") for i in range(10)]
                + [(200 + i, "fr") for i in range(50)])
        df = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = sampling.mixture_resample(
            df, "doc_id", "lang", {"en": 5000, "de": 4000}, 1000)
        rates = {r["stratum"]: r["rate_myriad"]
                 for r in out.select("stratum", "rate_myriad")
                             .distinct().collect()}
        # argmax ratio: de 4000/10=400 > en 125 > fr 20 -> de keeps all
        assert rates["de"] == sampling.SAMPLE_MOD
        # en: floor(5000*10*10000 / (4000*40)) = 3125
        assert rates["en"] == 3125
        # fr: floor(1000*10*10000 / (4000*50)) = 500
        assert rates["fr"] == 500

    def test_subset_of_input_and_deterministic(self, spark):
        rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out1 = sampling.mixture_resample(df, "doc_id", "lang",
                                         {"en": 6000}, 2000)
        a = sorted(r["doc_id"] for r in out1.collect())
        b = sorted(r["doc_id"] for r in out1.collect())
        assert a == b and set(a) <= set(range(300))

    def test_kept_rows_are_the_hash_filtered_set(self, spark):
        """Engine-side recomputation: for each stratum, the kept set must
        equal {id: md5_bucket(id) < rate}, i.e. the rate fully describes
        the sample (reproducibility contract)."""
        rows = [(i, ["en", "de"][i % 2]) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = sampling.mixture_resample(df, "doc_id", "lang",
                                        {"en": 7000}, 3000).collect()
        rates = {}
        for r in out:
            rates.setdefault(r["stratum"], r["rate_myriad"])
        buckets = {r["doc_id"]: r["b"] for r in df.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id")).alias("b"))
            .collect()}
        kept = {(r["stratum"], r["doc_id"]) for r in out}
        for i, lang in rows:
            expect = lang in rates and buckets[i] < rates[lang]
            assert ((lang, i) in kept) == expect

    def test_lazy_construction(self, spark):
        """Building the frame must not trigger a job (the tfidf
        eager-count lesson): rates are computed in-plan, not collected."""
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        df = spark.createDataFrame([(1, "en")], "doc_id bigint, lang string")
        sampling.mixture_resample(df, "doc_id", "lang", {"en": 5000}, 1000)
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before
