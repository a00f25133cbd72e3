"""Repo-WIDE plan-hygiene sweep (complements test_plans.py's targeted
assertions): every registered batch query's physical plan is checked for
the two properties that are never acceptable at 100 TB —

1. no `CartesianProduct` anywhere (a broadcast nested-loop against a
   parameter-sized side is a designed shape, e.g. brute-force ANN's
   query set; an un-broadcast cartesian is always a bug);
2. no row-at-a-time `BatchEvalPython` (Arrow-batched eval is the
   designed pandas path; the single exception is `udtf_word_explode`,
   the deliberately scope-bounded API-tier pin whose production path is
   the JVM explode).

Streaming queries are excluded (invoking them executes a replay);
test_streaming.py and the oracle sweep cover them. Marked `slow`: the
sweep builds ~146 plans and a handful of queries run training jobs at
construction time.
"""

from __future__ import annotations

import pytest

from autoaudit_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

#: row-at-a-time Python is allowed ONLY here (documented API-tier pin)
PY_EVAL_OK = {"udtf_word_explode"}


def plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.slow
def test_no_cartesian_and_no_rowwise_python_anywhere(spark):
    offenders_cart: list[str] = []
    offenders_py: list[str] = []
    for name, fn in QUERIES.items():
        if name.startswith("stream_"):
            continue
        p = plan(fn(spark, SF))
        if "CartesianProduct" in p:
            offenders_cart.append(name)
        if "BatchEvalPython" in p and name not in PY_EVAL_OK:
            offenders_py.append(name)
    assert not offenders_cart, f"CartesianProduct in: {offenders_cart}"
    assert not offenders_py, f"row-at-a-time Python in: {offenders_py}"
