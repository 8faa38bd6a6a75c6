"""Cross-engine deterministic statistical scalar functions.

The standard normal CDF is the gate to p-values (z-tests, BH-FDR,
Bayesian A/B readouts), but neither Spark nor DuckDB exposes erf with
bit-identical semantics — and libm erf differs across platforms anyway.
So Φ is computed from the Abramowitz & Stegun 7.1.26 rational
approximation of erf (|error| < 1.5e-7 — far inside the 6-dp rounding
every consumer applies), built ONLY from +,-,*,/ and one exp() whose
output is rounded to 12 dp on both engines before use (the playbook's
libm-absorption rule).  ``std_normal_cdf`` (Spark Column) and
``std_normal_cdf_sql`` (oracle SQL text) emit the SAME expression tree
token-for-token, so results hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Abramowitz & Stegun 7.1.26 coefficients
_P = "0.3275911"
_A1 = "0.254829592"
_A2 = "-0.284496736"
_A3 = "1.421413741"
_A4 = "-1.453152027"
_A5 = "1.061405429"


def std_normal_cdf(z: Column) -> Column:
    """Φ(z) with ~1.5e-7 absolute error, deterministic across engines
    and partitionings (consumers must round to <= 6 dp)."""
    x = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(float(_P)) * x)
    poly = t * (
        F.lit(float(_A1))
        + t
        * (
            F.lit(float(_A2))
            + t
            * (
                F.lit(float(_A3))
                + t * (F.lit(float(_A4)) + t * F.lit(float(_A5)))
            )
        )
    )
    e = F.round(F.exp(-x * x), 12)
    erf_abs = F.lit(1.0) - poly * e
    sgn = F.when(z < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.lit(0.5) * (F.lit(1.0) + sgn * erf_abs)


def std_normal_cdf_sql(z: str) -> str:
    """The DuckDB twin of :func:`std_normal_cdf` — same expression
    tree over the SQL expression ``z`` (pass a column or a
    parenthesized expression)."""
    x = f"(ABS({z}) / sqrt(CAST(2.0 AS DOUBLE)))"
    t = (
        f"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)"
        f" + CAST('{_P}' AS DOUBLE) * {x}))"
    )
    poly = (
        f"({t} * (CAST('{_A1}' AS DOUBLE) + {t} *"
        f" (CAST('{_A2}' AS DOUBLE) + {t} *"
        f" (CAST('{_A3}' AS DOUBLE) + {t} *"
        f" (CAST('{_A4}' AS DOUBLE) + {t} * CAST('{_A5}' AS DOUBLE))))))"
    )
    e = f"ROUND(exp(-{x} * {x}), 12)"
    erf_abs = f"(CAST(1.0 AS DOUBLE) - {poly} * {e})"
    sgn = f"(CASE WHEN {z} < 0 THEN -1.0 ELSE 1.0 END)"
    return (
        f"(CAST(0.5 AS DOUBLE) * (CAST(1.0 AS DOUBLE)"
        f" + {sgn} * {erf_abs}))"
    )
