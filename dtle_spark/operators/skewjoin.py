"""Skew-mitigating salted equi join — a plan-level operator for the
hot-key problem AQE's skew handling cannot always reach.

AQE splits skewed SORT-MERGE partitions post-shuffle
(`spark.sql.adaptive.skewJoin.enabled`), but it only triggers on
sort-merge joins between shuffle stages, after the skewed partition
was already built; pre-shuffle salting spreads a hot key across
``n_salts`` reducers in the map stage itself, works under any join
strategy, and composes with checkpointed/bucketed inputs where AQE
sees no shuffle to split. The classic trade: the small side is
replicated ``n_salts`` times (broadcast-sized growth), the big side
gets a per-row salt column and shuffles uniformly.

The salt is DETERMINISTIC — ``xxhash64`` of the big side's row, mod
``n_salts`` — never ``rand()``: a random salt re-draws on task retry,
and a shuffle-stage replay then routes the same row to a different
reducer than its first attempt, which under partial stage reuse can
drop or duplicate rows. Hash-of-row keeps retries route-stable while
still spreading a hot key's rows (whose non-key columns differ)
evenly.

Result equivalence: every big row carries exactly one salt and the
small side holds every salt value, so (key, salt) matches exactly
where (key) matches — identical multiset to the unsalted join for
``inner`` and ``left`` joins. ``right``/``full`` are rejected: an
unmatched small row would surface once per replica.

Reference context: the reference engine resolves its write-side skew
with writeset/MTS scheduling (driver/mysql/applier_incr.go); on the
read/analytics side it has no join at all (SURVEY §2.6) — this is
part of the §2.6 surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join ``big`` with ``small`` on ``on``, spreading each join
    key over ``n_salts`` shuffle partitions.

    ``big`` is the skewed fact side (salted per row); ``small`` is
    replicated ``n_salts`` times, so keep it dimension-sized. Output
    columns match ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: an "
            "unmatched small-side row would appear once per salt "
            "replica under right/full semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    for c in (_SALT,):
        if c in big.columns or c in small.columns:
            raise ValueError(f"column {c!r} already exists on an input")

    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    out = salted_big.join(replicated_small, keys + [_SALT], how)
    return out.drop(_SALT)
