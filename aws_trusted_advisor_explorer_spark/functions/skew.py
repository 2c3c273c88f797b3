"""Skew-mitigation helpers (SCALE.md): salted equi-join for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most
skew by splitting oversized shuffle partitions. Salting is the manual
fallback for the pathological case AQE can't fix — a single join key
so hot that even a split partition's build side won't fit: the big
side scatters each hot key across ``n_salts`` shuffle partitions and
the small side is replicated once per salt, so the hot key's work
spreads over ``n_salts`` tasks. Results are identical to the plain
join for ANY salt assignment, which is what the equivalence test
asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                n_salts: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with the big side salted.

    ``small`` is exploded ``n_salts``-fold (only acceptable for a
    genuinely small side); the join adds the salt to the key so each
    (key, salt) shard shuffles independently. Output columns match
    ``big.join(small, keys, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # a pre-existing column named SALT_COL would be silently
    # OVERWRITTEN by withColumn and then dropped from the output —
    # data loss vs the documented plain-join contract; refuse loudly
    for side, df in (("big", big), ("small", small)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"salted_join: {side} side already has a {SALT_COL!r} "
                f"column — rename it; the helper would overwrite and "
                f"drop it")
    salted_big = big.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_small = small.withColumn(SALT_COL, salts)
    out = salted_big.join(salted_small, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
