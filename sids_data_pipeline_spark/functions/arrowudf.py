"""Typed pandas-UDF wrapper helpers.

This module deliberately does NOT use ``from __future__ import
annotations``: ``pandas_udf`` infers its eval type from *resolved*
annotation objects, and under PEP 563 every annotation in the defining
module is an unevaluated string. Callers living in PEP-563 modules wrap
their batch functions here instead of mutating ``__annotations__`` by
hand (ADVICE r14)."""

import pandas as pd
from pyspark.sql import functions as F


def series_udf(fn, return_type: str):
    """``fn(pd.Series) -> pd.Series`` as a scalar Series-to-Series
    pandas UDF with real (non-PEP563) annotations for eval-type
    inference."""

    def _wrapped(vs: pd.Series) -> pd.Series:
        return fn(vs)

    _wrapped.__name__ = getattr(fn, "__name__", "series_udf")
    return F.pandas_udf(_wrapped, return_type)
