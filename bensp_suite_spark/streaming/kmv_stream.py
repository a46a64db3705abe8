"""Streaming per-key KMV cardinality sketches (running distinct counts).

The streaming form of ``operators/sketches.py``: each key (source/domain)
keeps the k smallest distinct hashes seen so far — state is BOUNDED at k
longs per key no matter how many rows stream past, which is the whole
point of sketching a stream (an exact running count-distinct would hold
every value in state). Because a KMV sketch is a pure set-union fold, the
final state is arrival-order- and batch-boundary-INDEPENDENT: after the
stream drains, each key's sketch must equal the batch sketch over the same
rows exactly — the declared query pins that equality against the batch
per-group oracle.

Scale shape: one shuffle on the key into the stateful operator, k-row
state per key (RocksDB-backed at scale), exactly-once across restarts via
the checkpoint like every state-store op.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-batch emit schema: the sketch summary AFTER folding the batch in;
#: seq lets the reader pick each key's final (post-drain) snapshot
OUTPUT_SCHEMA = "source string, seq long, n_hashes long, kth_min long"
STATE_SCHEMA = "hs array<long>, seq long"


def _kmv_fn(k: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hs, seq = (set(state.get[0]), state.get[1]) if state.exists else (set(), 0)
        for pdf in pdfs:
            # NULL hashes arrive as NaN — they must never occupy a sketch slot
            hs.update(int(h) for h in pdf["h"].dropna())
        top = sorted(hs)[:k]
        seq += 1
        state.update((top, seq))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "seq": [seq],
                "n_hashes": [len(top)],
                "kth_min": [top[-1] if top else 0],
            }
        )

    return fn


def stream_kmv_per_key(hashed_stream: DataFrame, k: int = 32) -> DataFrame:
    """(source, h) stream → one (source, seq, n_hashes, kth_min) row per
    key per batch; the max-seq row per key is the final sketch summary."""
    return hashed_stream.groupBy("source").applyInPandasWithState(
        _kmv_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
