"""M4 — log-log power-law fit (slope, intercept, R²) as pure SQL
aggregates.

Reference (`AA-AR.py:188-212`): sklearn LinearRegression on
(log x, log y) + r2_score. The 1-D closed form is classical:

    slope = cov(lx, ly) / var(lx)
    intercept = mean(ly) − slope·mean(lx)
    R² = corr(lx, ly)²

(`normalize=True` rescales the coefficient path, not the 1-D result.)

Cross-engine discipline: rather than `regr_slope`/`covar_pop` (whose
internal accumulation differs per engine), both sides compute from the
five ROUNDED raw sums Σlx, Σly, Σlx², Σly², Σlx·ly — identical doubles →
bit-identical derived stats. Implemented on the per-account scatter
(x = multi out-degree, y = total out-weight), the classic degree/weight
power law."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import EDGES_SQL, edges


def powerlaw_fit(xy: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """(slope, intercept, r2, n) of the log-log fit of y on x.
    Input columns must be positive; caller applies the +1 shift."""
    lx, ly = F.log(F.col(x)), F.log(F.col(y))
    agg = xy.agg(
        F.count("*").alias("n"),
        F.round(F.sum(lx), 6).alias("sx"),
        F.round(F.sum(ly), 6).alias("sy"),
        F.round(F.sum(lx * lx), 6).alias("sxx"),
        F.round(F.sum(ly * ly), 6).alias("syy"),
        F.round(F.sum(lx * ly), 6).alias("sxy"),
    )
    n = F.col("n")
    cov = F.col("sxy") / n - F.col("sx") * F.col("sy") / n / n
    varx = F.col("sxx") / n - F.col("sx") * F.col("sx") / n / n
    vary = F.col("syy") / n - F.col("sy") * F.col("sy") / n / n
    slope = cov / varx
    intercept = F.col("sy") / n - slope * F.col("sx") / n
    r2 = cov * cov / (varx * vary)
    return agg.select(
        slope.alias("slope"), intercept.alias("intercept"), r2.alias("r2"), n.alias("n")
    )


@query(
    "powerlaw_fit",
    oracle=f"""
    WITH edges AS ({EDGES_SQL}),
    pts AS (
        SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS x,
               ROUND(SUM(weight), 2) + 1 AS y
        FROM edges GROUP BY src
    ),
    s AS (
        SELECT COUNT(*) AS n,
               ROUND(SUM(LN(x)), 6) AS sx, ROUND(SUM(LN(y)), 6) AS sy,
               ROUND(SUM(LN(x) * LN(x)), 6) AS sxx,
               ROUND(SUM(LN(y) * LN(y)), 6) AS syy,
               ROUND(SUM(LN(x) * LN(y)), 6) AS sxy
        FROM pts
    )
    SELECT (sxy / n - sx * sy / n / n) / (sxx / n - sx * sx / n / n) AS slope,
           sy / n - (sxy / n - sx * sy / n / n) / (sxx / n - sx * sx / n / n) * sx / n
               AS intercept,
           (sxy / n - sx * sy / n / n) * (sxy / n - sx * sy / n / n)
               / ((sxx / n - sx * sx / n / n) * (syy / n - sy * sy / n / n)) AS r2,
           n
    FROM s
    """,
)
def q_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 on the per-account (out-degree+1, total-out-weight+1) scatter
    (`AA-AR.py:188-212`, +1 shift at `:179`)."""
    pts = (
        edges(spark, sf_dir)
        .groupBy("src")
        .agg(
            (F.count("*") + 1).cast("double").alias("x"),
            (F.round(F.sum("weight"), 2) + 1).alias("y"),
        )
    )
    return powerlaw_fit(pts)
