"""Sketch-operator invariants (queries/sketches.py): the mathematical
guarantees each sketch carries, checked against exact computation on the
sf0.001 corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_spark.catalog import load_table
from data_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _corrected(row) -> float:
    """The caller-side small-range correction the query docstring
    prescribes (linear counting when the raw estimate is under 2.5m and
    zero registers remain — ln() deliberately lives here, outside the
    cross-engine hashed comparison)."""
    import math

    est, zeros = row["est_distinct_raw"], row["registers_zero"]
    if est <= 2.5 * 256 and zeros > 0:
        return 256.0 * math.log(256.0 / zeros)
    return est


def test_hll_estimate_tracks_exact_distinct(spark):
    """Corrected HLL (m=256, std error ~6.5%) must land within 25% of
    the exact per-source distinct-token count, and the merged '__all__'
    estimate must dominate every per-source estimate (register-wise MAX
    only shrinks the inverse-power sum)."""
    rows = {
        r["source"]: r
        for r in QUERIES["d42_hll_cardinality"].spark_fn(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents")
    exact = {
        r["source"]: r["n"]
        for r in (
            docs.select(
                "source",
                F.explode(
                    F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\f\r]+")
                ).alias("tok"),
            )
            .filter(F.col("tok") != "")
            .groupBy("source")
            .agg(F.countDistinct("tok").alias("n"))
            .collect()
        )
    }
    all_raw = rows["__all__"]["est_distinct_raw"]
    for src, n in exact.items():
        est = _corrected(rows[src])
        assert abs(est - n) / n < 0.25, (src, est, n)
        # raw-estimate monotonicity under the register-wise MAX merge
        assert all_raw >= rows[src]["est_distinct_raw"] - 1e-9, (src, all_raw)


def test_cms_estimates_are_one_sided(spark):
    """Count-min's defining property: every point estimate >= the true
    count (hash collisions only ADD), and equals it when no collision
    lands in any of the 4 salted rows."""
    rows = QUERIES["d43_cms_heavy_hitters"].spark_fn(spark, SF).collect()
    assert rows, "probe tokens must exist in the corpus"
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"], r


def test_histogram_quantiles_are_monotone(spark):
    """p50 <= p90 <= p99 per source, and every bound brackets its bin."""
    rows = QUERIES["d44_token_histogram_quantiles"].spark_fn(spark, SF).collect()
    by_src: dict[str, dict[str, int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["quantile"]] = r["bin"]
        assert r["tokens_lo"] <= r["tokens_hi"]
        if r["bin"] > 0:
            assert r["tokens_lo"] == 2 ** (r["bin"] - 1)
            assert r["tokens_hi"] == 2 ** r["bin"] - 1
    for src, q in by_src.items():
        assert set(q) == {"p50", "p90", "p99"}, (src, q)
        assert q["p50"] <= q["p90"] <= q["p99"], (src, q)


def test_theta_sketch_overlap_bounds_and_accuracy(spark):
    """Set-algebra invariants on every pair (n_inter <= min, n_union >=
    max, jaccard in [0,1]) plus accuracy: the sketch Jaccard must track
    the EXACT distinct-token Jaccard within 0.3 on the densest pair
    (p=1/16 keeps ~vocab/16 samples; std error ~1/sqrt(samples))."""
    rows = QUERIES["d45_theta_sketch_overlap"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_inter"] <= min(r["n_a"], r["n_b"]), r
        assert r["n_union"] >= max(r["n_a"], r["n_b"]), r
        assert 0.0 <= r["jaccard_est"] <= 1.0, r
        assert r["est_inter_distinct"] == 16 * r["n_inter"], r
    best = max(rows, key=lambda r: r["n_inter"])
    docs = load_table(spark, SF, "documents")
    toks = (
        docs.filter(F.col("source").isin(best["src_a"], best["src_b"]))
        .select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\f\r]+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    per = {
        r["source"]: r["n"]
        for r in toks.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    inter = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 2)
        .count()
    )
    true_j = inter / (per[best["src_a"]] + per[best["src_b"]] - inter)
    assert abs(best["jaccard_est"] - true_j) < 0.3, (best, true_j)


def test_leakage_safe_split_group_atomicity(spark):
    """The defining guarantee: every fingerprint group lands in exactly
    one split (the injected exact copies MUST follow their original),
    and the doc-level fractions track the 205/25/26-bucket design."""
    rows = QUERIES["d46_leakage_safe_split"].spark_fn(spark, SF).collect()
    by_fp: dict[str, set[str]] = {}
    docs_by_fp: dict[str, int] = {}
    n_by_split: dict[str, int] = {}
    for r in rows:
        by_fp.setdefault(r["group_fp"], set()).add(r["split"])
        docs_by_fp[r["group_fp"]] = docs_by_fp.get(r["group_fp"], 0) + 1
        n_by_split[r["split"]] = n_by_split.get(r["split"], 0) + 1
        assert 0 <= r["bucket"] < 256, r
    multi = {fp: s for fp, s in by_fp.items() if len(s) > 1}
    assert not multi, multi
    # the injected copies make >=1 multi-doc group at any SF — without
    # them the no-straddle assertion above would be vacuous
    assert any(n > 1 for n in docs_by_fp.values())
    n = sum(n_by_split.values())
    assert 0.70 < n_by_split.get("train", 0) / n < 0.90, n_by_split
    assert n_by_split.get("val", 0) / n < 0.20, n_by_split
    assert n_by_split.get("test", 0) / n < 0.20, n_by_split
