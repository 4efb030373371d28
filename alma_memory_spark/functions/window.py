"""Window helpers.

`bounded_rank_w` is the declared form of a GLOBAL rank over a frame
already bounded by a limit/top-k: the single partition is intended (the
frame is <= k rows), so the window carries an explicit constant
partition key. A foldable key (`F.lit(0)`, the round-6 idiom) no longer
works — Spark 4's EliminateWindowPartitions strips foldable partition
expressions, regressing the plan to the empty-spec WindowExec path and
its "No Partition Defined" warning. `pmod(xxhash64(anchor), 1)` is 0
for every row but references a column, so the optimizer must keep it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


def bounded_rank_w(anchor: Column | str, *order: Column | str) -> WindowSpec:
    """Single-partition window for ranks over BOUNDED (post-limit)
    frames. `anchor` is any column of the frame (used only to make the
    constant key non-foldable); `order` is the rank ordering — always
    include a unique tiebreaker."""
    a = F.col(anchor) if isinstance(anchor, str) else anchor
    return W.partitionBy(F.pmod(F.xxhash64(a), F.lit(1))).orderBy(*order)
