"""DuckDB-oracle equivalence for every registered query (SURVEY.md §5.1)
— the same comparison the driver's t2 gate performs, at sf0.001."""

from __future__ import annotations

import pytest

from cust_sagemaker_feature_store_spark.queries import REGISTRY
from cust_sagemaker_feature_store_spark.testing import compare_spark_to_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only contract: must execute and return a stable schema
        assert sdf.count() >= 0
        assert sdf.columns
        return
    problems = compare_spark_to_oracle(sdf, duck, spec.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)
