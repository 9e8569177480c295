"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.2.1).

Every query with an oracle is hash-compared against DuckDB at sf0.01;
rows-only queries are smoke-run (executes, sane schema, deterministic count).
"""

from __future__ import annotations

import pytest

import distributed_system_mapreduce_spark  # noqa: F401
from distributed_system_mapreduce_spark.registry import ORACLES, QUERIES
from distributed_system_mapreduce_spark.testing import run_parity

from conftest import SF_DIR


def _oracle_names():
    return sorted(ORACLES)


def _rows_only_names():
    return sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(name, spark, duck):
    problems = run_parity(name, spark, duck, SF_DIR)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_smoke(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


#: Rows-only queries are deterministic for fixed seeds/permutations, so
#: their sf0.01 outputs are pinned exactly — the driver can't oracle-check
#: them (no DuckDB xxhash64/HLL twin), so regressions must surface here.
ROWS_ONLY_EXPECTED = {
    "agg_approx_distinct": [
        ("click", 151), ("error", 151), ("purchase", 151),
        ("signup", 151), ("view", 151),
    ],
    # (n_docs, n_candidates, n_dups) under the seeded-xxhash64 permutation
    # family (r7): 25 candidates / 25 verified dups — the old affine family
    # produced 30 candidates for the same 25 dups, its correlated-minima
    # false positives (MINHASH_N_PERMS note in operators/dedup.py)
    "dedup_near_minhash": [(500, 25, 25)],
    # dedup_simhash / dedup_simhash64 left this table in r13: they now
    # carry DuckDB oracles (SQL-exact dup_text_pairs + coverage-bound
    # claims, VERDICT r12 #6); their raw (n_docs, n_close_pairs) stay
    # pinned via _simhash_raw/_simhash64_raw below.
    # k-core of the support>=2 backbone: the peel's fixpoint is
    # order-invariant, so (k, core nodes, core edges, rounds) is exact.
    # (Oracled since r11 via the unrolled-CTE oracle; the exact pin stays
    # as a second, independent witness of the fixpoint.)
    # Re-pinned in r15 when copurchase_support deduped (l_orderkey,
    # l_partkey) before pairing (the sf0.1 parity sweep caught duplicate
    # lineitem rows inflating support counts): the corrected backbone has
    # fewer edges, so both cores shrink — mirrored in the CTE oracles.
    "graph_kcore": [(2, 1535, 3108, 4)],
    "graph_kcore_k3": [(3, 935, 1970, 11)],
    # (media_type, n_items, total_bytes, byte_sum, byte_sqsum): exact int64
    # witnesses of the fake-decode pipeline — associative-exact, so stable
    # under any partitioning. Since r13 both multimodal queries ALSO carry
    # full DuckDB oracles (md5-expansion arithmetic, VERDICT r12 #3); the
    # pins stay as a second, independent witness like graph_kcore's.
    "multimodal_media_features": [
        ("audio", 167, 50917, 6431657, 1086176071),
        ("image", 167, 52037, 6912736, 1192901270),
        ("video", 166, 46220, 5816841, 977056657),
    ],
    # (n_frames_sampled, n_videos, total_frame_bytes)
    "multimodal_frame_sample": [(436, 166, 27376)],
    # embed_pca_top_component left this table in r12: it now carries a
    # DuckDB oracle (hash-checked variance/eigenvalue bounds, VERDICT r11
    # #2); its raw spectral summary stays pinned via _pca_raw below.
    # sim_ivfpq_recall left this table in r11: it now carries a DuckDB
    # oracle (hash-checked recall bound, VERDICT r10 #6); its raw recall
    # (0.6533 at sf0.01, between the IVF-only 0.69 and exhaustive-ADC
    # 0.7267 audits, as it must sit) is asserted via _ivfpq_hits in
    # tests/test_ann_quality.py.
}


@pytest.mark.parametrize("name", sorted(ROWS_ONLY_EXPECTED))
def test_rows_only_pinned_values(name, spark):
    got = sorted(tuple(r) for r in QUERIES[name](spark, SF_DIR).collect())
    assert got == ROWS_ONLY_EXPECTED[name]


# r11 sketch-bound promotions: agg_hll_union and agg_percentile_sketch_error
# now emit hash-checked bound rows (exact values + within_bound, oracled);
# the RAW sketch outputs keep the exact-pin contract here through the
# shared internal builders, so a sketch regression still surfaces even
# though the registered queries no longer expose the estimates.
def _hll_raw(spark):
    from distributed_system_mapreduce_spark.operators.aggregations import (
        _hll_union_estimates,
    )

    return _hll_union_estimates(spark, SF_DIR)


def _pctl_raw(spark):
    from distributed_system_mapreduce_spark.operators.aggregations import (
        _percentile_sketch_errors,
    )

    return _percentile_sketch_errors(spark, SF_DIR)


def _pca_raw(spark):
    from distributed_system_mapreduce_spark.functions.vectors import (
        pca_power_frame,
    )

    return pca_power_frame(spark, SF_DIR)


def _simhash_raw(spark):
    from distributed_system_mapreduce_spark.operators.dedup import (
        simhash_close_pairs,
    )
    from distributed_system_mapreduce_spark.sources.io import load

    return simhash_close_pairs(load(spark, SF_DIR, "documents"))


def _simhash64_raw(spark):
    from distributed_system_mapreduce_spark.operators.dedup import (
        simhash_close_pairs,
    )
    from distributed_system_mapreduce_spark.sources.io import load

    return simhash_close_pairs(
        load(spark, SF_DIR, "documents"), bits=64, n_blocks=4, max_dist=3
    )


BUILDER_PINNED = {
    # DataSketches HLL estimates are deterministic per input set; 150
    # distinct users at sf0.01 is below the sketch's exact-mode cutoff, so
    # per-type and merged estimates are all exactly 150
    _hll_raw: [
        ("__all__", 150.0), ("click", 150.0), ("error", 150.0),
        ("purchase", 150.0), ("signup", 150.0), ("view", 150.0),
    ],
    # Greenwald-Khanna sketch outputs are deterministic per input set;
    # (type, p50_exact, p50_approx, p50_err, p99_exact, p99_approx, p99_err)
    _pctl_raw: [
        ("click", 35.31, 35.23, 0.08, 221.9675, 219.76, 2.2075),
        ("error", 34.39, 34.24, 0.15, 236.0178, 232.27, 3.7478),
        ("purchase", 33.95, 33.73, 0.22, 222.036, 220.13, 1.906),
        ("signup", 35.92, 35.85, 0.07, 233.0392, 230.3, 2.7392),
        ("view", 33.835, 33.71, 0.125, 209.8429, 209.23, 0.6129),
    ],
    # (n_vecs, n_iters, eigenvalue, top_dim, top_weight): Gram entries are
    # quantized before the driver-local eigensolve, so the spectral summary
    # is exact-stable across runs/partitionings (pre-r12 shape of
    # embed_pca_top_component, now the bound-oracled query's raw witness)
    _pca_raw: [(500, 100, 0.0276, 9, 0.403)],
    # (n_docs, n_close_pairs) under seeded xxhash64 codes — pre-r13 shapes
    # of dedup_simhash / dedup_simhash64, now the coverage-bound-oracled
    # queries' raw witnesses. 64-bit codes (4 x 16-bit blocks):
    # near-orthogonal hashes make d<=3 collisions rare — the
    # discriminative regime the 16-bit query lacks.
    _simhash_raw: [(500, 33276)],
    _simhash64_raw: [(500, 17)],
}


@pytest.mark.parametrize(
    "builder", sorted(BUILDER_PINNED, key=lambda f: f.__name__)
)
def test_promoted_sketch_raw_outputs_pinned(builder, spark):
    got = sorted(tuple(r) for r in builder(spark).collect())
    assert got == BUILDER_PINNED[builder]


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_schema_hashable(name, spark):
    """The driver canonicalizes results via pandas sort_values, which cannot
    hash array/map/struct cells (round-1 inverted_index crash). Every
    oracle-checked query must emit only scalar columns."""
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    complex_cols = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.dataType.simpleString().startswith(("array", "map", "struct"))
    ]
    assert not complex_cols, f"{name}: non-hashable columns {complex_cols}"
