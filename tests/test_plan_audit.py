"""Plan audit over EVERY registered query: no accidental cartesian
products. Intentional nested-loop plans (crossJoin of dimensions, the
single-row broadcast query-vector pattern) are allowlisted explicitly —
anything else joining without keys is a bug at 100 TB."""

import pytest

from cartodb_importer_spark.queries import QUERIES

# queries whose plans legitimately contain a nested-loop/cartesian join:
# tiny-side cross joins and single-row broadcast scalars
ALLOWED_NLJ = {
    "join_cross",              # dimension cartesian by design
    "llm_cosine_topk",         # 1-row query vector broadcast
    "llm_euclidean_topk",      # 1-row query vector broadcast
    "scalar_fuzzy_match",      # 25-row candidate set broadcast
    "stream_late_data_filter", # 1-row max-ts broadcast
    "q11_important_parts",     # 1-row threshold broadcast
    "q20_excess_suppliers",    # 1-row threshold broadcast
    "q22_idle_customers",      # 1-row threshold broadcast
    "agg_rollup",              # broadcast dims (BNLJ never appears; safety)
    "agg_equidepth_bins",      # 1-row decile-boundary broadcast
    "llm_embedding_standardize",  # 1-row per-dim mean/std broadcast
    "llm_tfidf_top_terms",     # 1-row doc-count broadcast
}

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_nlj = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    if name in ALLOWED_NLJ:
        return  # allowlisted; presence is fine either way
    assert not has_nlj, f"{name} plans a cartesian/nested-loop join"
