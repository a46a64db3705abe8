"""Streaming count-min sketch (running heavy-hitter counts).

The streaming form of ``operators/sketches.cms_build``: the d×w counter
grid lives in keyed state — one key per hash ROW, state = the row's w
counters — so state is the FIXED grid no matter how many tokens stream
past (an exact running frequency table grows with the vocabulary). A CMS
is a pure cell-wise-sum fold, so the post-drain grid is arrival-order-
and batch-boundary-INDEPENDENT: after the stream drains, the cells must
equal the batch sketch over the same rows exactly — the declared query
pins that equality against the batch oracle.

Scale shape: the (row, col) derivation is JVM-side; one shuffle on the
d row keys into the stateful operator (d pandas groups per batch, each
folding a value_counts into its w-length array — vectorized, not
per-token Python); w longs of state per row key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _bloom_pos

#: per-batch emit: every non-zero cell AFTER folding the batch in; seq
#: lets the reader pick each row's final (post-drain) snapshot
OUTPUT_SCHEMA = "row int, seq long, col long, cnt long"
STATE_SCHEMA = "counters array<long>, seq long"


def _cms_fn(w: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            counters, seq = np.array(state.get[0], dtype=np.int64), state.get[1]
        else:
            counters, seq = np.zeros(w, dtype=np.int64), 0
        for pdf in pdfs:
            vc = pdf["col"].value_counts()
            counters[vc.index.to_numpy(dtype=np.int64)] += vc.to_numpy(
                dtype=np.int64
            )
        seq += 1
        state.update((counters.tolist(), seq))
        nz = np.nonzero(counters)[0]
        yield pd.DataFrame(
            {
                "row": np.full(len(nz), key[0], dtype=np.int32),
                "seq": np.full(len(nz), seq, dtype=np.int64),
                "col": nz.astype(np.int64),
                "cnt": counters[nz],
            }
        )

    return fn


def cms_cells_stream(
    values_stream: DataFrame, col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """value stream → one (row, seq, col, cnt) emission per non-zero cell
    per batch; the max-seq snapshot per row is the final grid. The
    position derivation is the engine-exact md5 family shared with the
    batch sketch, computed JVM-side before the state op."""
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _bloom_pos(F.col(col), i, w).alias("col")
                )
                for i in range(d)
            ]
        )
    ).alias("c")
    keyed = (
        values_stream.filter(F.col(col).isNotNull())
        .select(cell)
        .select(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    )
    return keyed.groupBy("row").applyInPandasWithState(
        _cms_fn(w),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
