"""Skew mitigation: salted joins (SURVEY.md §6).

AQE's skew-join splitting handles sort-merge skew at runtime, but a
*deliberately* salted join is still the tool when one hot key would
overwhelm a single task even after splitting (e.g. joining a
power-law keyed event stream against per-key state). The salt
spreads one hot key over `n_salts` tasks; the small side is
replicated n_salts× — bounded, because the small side is small by
contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: Column, n_salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of a unique
    column (NOT rand() — reruns and retried tasks must agree)."""
    return df.withColumn("_salt", F.pmod(F.abs(F.xxhash64(salt_from)), F.lit(n_salts)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `big` (skewed on `on`) against `small`, spreading each of
    big's keys across n_salts shuffle partitions. Equivalent rows to
    a plain join; the exchange key becomes (on, _salt)."""
    b = with_salt(big, salt_from, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")
