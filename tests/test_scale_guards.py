"""Scale-guard regressions: the dedup candidate generators must stay
BOUNDED on a degenerate boilerplate corpus (thousands of near-identical
docs) — the shape that turns uncapped pair generation quadratic. 20k docs
with a 5k-doc boilerplate cluster: uncapped, that cluster alone is
~12.5M candidate pairs; the caps must keep both paths small and fast."""

from __future__ import annotations

from pyspark.sql import functions as F

N_BOILER = 5_000
N_DISTINCT = 15_000


def _corpus(spark):
    boiler = spark.range(N_BOILER).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "subscribe to our newsletter for updates terms of service apply "
            "all rights reserved contact support for help"
        ).alias("text"),
    )
    distinct = spark.range(N_BOILER, N_BOILER + N_DISTINCT).select(
        F.col("id").alias("doc_id"),
        F.format_string(
            "document %d unique alpha%d beta%d gamma%d delta%d epsilon%d body",
            "id", "id", F.pmod("id", F.lit(97)), F.pmod("id", F.lit(89)),
            F.pmod("id", F.lit(83)), F.pmod("id", F.lit(79)),
        ).alias("text"),
    )
    return boiler.unionByName(distinct)


class TestDegenerateCorpusBounds:
    def test_df_cap_bounds_hot_shingle_blowup(self, spark):
        from tomixpanel_spark.operators.dedup import near_dup_pairs

        pairs = near_dup_pairs(_corpus(spark), df_cap=100)
        n = pairs.count()
        # every boilerplate shingle is in 5k docs > cap: its postings are
        # dropped, so the quadratic cluster contributes nothing; distinct
        # docs share only sub-threshold overlap
        assert n < 1_000, f"df_cap failed to bound candidate pairs: {n}"

    def test_band_cap_bounds_hot_band_blowup(self, spark):
        from tomixpanel_spark.operators.dedup import (
            lsh_pairs_from_signatures,
            minhash_columns,
            shingle_arrays_for,
        )

        sig = shingle_arrays_for(_corpus(spark)).select("doc_id", *minhash_columns())
        pairs = lsh_pairs_from_signatures(sig, band_cap=100)
        n = pairs.count()
        # identical signatures put all 5k boilerplate docs in the same
        # band -> group size 5000 > cap -> dropped wholesale
        assert n < 1_000, f"band_cap failed to bound candidate pairs: {n}"

    def test_capped_pipeline_still_finds_real_neardups(self, spark):
        """The caps must not blind the pipeline to ORDINARY near-dups:
        plant 50 mutated copies of distinct docs and require the capped
        LSH pipeline to drop them while keeping everything else."""
        from tomixpanel_spark.operators.dedup import dedup_pipeline

        base = _corpus(spark)
        mutated = (
            base.filter((F.col("doc_id") >= N_BOILER) & (F.col("doc_id") < N_BOILER + 50))
            .select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat("text", F.lit(" tail")).alias("text"),
            )
        )
        out = dedup_pipeline(
            base.unionByName(mutated),
            candidate_source="lsh",
            band_cap=100,
            threshold=0.5,
        )
        try:
            keep = out["keep_list"]
            n_total = N_BOILER + N_DISTINCT + 50
            kept = keep.count()
            dropped_mutants = (
                out["pairs"].filter(F.col("doc_b") >= 1_000_000).select("doc_b").distinct().count()
            )
            # most mutated copies detected (banding is probabilistic but
            # these pairs share nearly all shingles) and nothing else lost
            assert dropped_mutants >= 40, f"only {dropped_mutants} mutants caught"
            assert kept == n_total - dropped_mutants
        finally:
            out["pairs"].unpersist()
