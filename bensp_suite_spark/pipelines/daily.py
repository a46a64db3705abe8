"""The daily-increment loop generalized to day N.

A production corpus grows by one crawl batch per day; each batch dedups
against everything accepted so far. The reference's pipelines run this as
repeated full-corpus jobs; at 100 TB the only viable shape is the
incremental one:

    day N:  flags     = incremental_dedup(batch_N, history_sig)
            survivors = batch_N semi-joined on kept flags
            history_sig += signatures(survivors)        # APPEND, O(day)

The signature tables (distinct normalized content hashes + per-doc SimHash
fingerprints, ``operators/dedup_text.history_signatures``) are the ONLY
persistent state. ``advance_signatures`` appends each day's survivor
signatures — never re-derives from raw history — so the day-N cost is
O(|batch_N|) plus banded joins against fingerprint tables that grow by
survivors/day, and raw history text is never rescanned after day 0.

The declared query ``pipeline_daily_increment_day3`` drives three
iterations of this loop against a DuckDB oracle that recomputes every
day's flags from FULL history — proving append-maintained signatures are
engine-exactly equal to re-derivation.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup_text import incremental_dedup

Sig = tuple[DataFrame, DataFrame]
_IDENT = lambda df, _key: df  # noqa: E731


def daily_step(
    history_sig: Sig,
    batch: DataFrame,
    max_hamming: int = 3,
    persist: Callable[[DataFrame, str], DataFrame] | None = None,
    day: int | str = "",
    advance: bool = True,
    history_bloom_packed: bytes | None = None,
    history_band_bloom_packed: bytes | None = None,
    bloom_m: int | None = None,
    bloom_k: int | None = None,
) -> tuple[DataFrame, DataFrame, Sig]:
    """ONE day of the loop: → (flags, survivors, advanced signature
    tables). The advance is a pure survivor-append (see
    ``advance_signatures``) — O(|batch|) work, raw history untouched.
    Use directly when day N+1's batch depends on day N's survivors
    (e.g. re-crawl simulations); ``run_daily_increments`` wraps it for
    a plain batch sequence. ``advance=False`` skips the signature
    advance (the final day of a bounded run doesn't need it).

    ``history_bloom_packed`` (built by ``dedup_text.history_bloom`` over
    the hashes table, advanced by OR-ing each day's survivor bits —
    ``sketches.bloom_merge_packed``) pre-filters the exact check so only
    bloom-maybe rows reach the history join; flags are identical either
    way (zero false negatives). The advance of the bloom itself is the
    caller's (``daily_cli`` keeps it as a third state file)."""
    from ..operators.dedup_text import BLOOM_K, BLOOM_M, batch_signatures

    keep = persist or _IDENT
    # ONE SimHash aggregation per day, shared between the flags pass and
    # the signature advance (r11): the advance previously re-derived
    # simhash(survivors) from raw text even though the flags pass had
    # just fingerprinted the same batch — at 100 TB that's the day's
    # dominant aggregation twice. Pinning the batch fingerprints (only
    # when the day advances AND the caller persists state at all) lets
    # the advance project the survivor rows out of the cached frame;
    # per-doc signatures are deterministic, so the appended rows are
    # bit-identical to history_signatures(survivors).
    new_h, new_s = batch_signatures(batch)
    if advance and persist is not None:
        new_s = keep(new_s, f"daily.batch_sims{day}")
    flags = incremental_dedup(
        batch,
        max_hamming=max_hamming,
        history_sig=history_sig,
        history_bloom_packed=history_bloom_packed,
        history_band_bloom_packed=history_band_bloom_packed,
        bloom_m=bloom_m or BLOOM_M,
        bloom_k=bloom_k or BLOOM_K,
        new_sig=(new_h, new_s),
    )
    survivors = batch.join(
        flags.filter(F.col("is_kept")).select("doc_id"), "doc_id", "left_semi"
    )
    if not advance:
        # no signature advance → nothing downstream forces the survivor
        # frame; leave it lazy (the caller pins it if it needs it)
        return flags, survivors, history_sig
    survivors = keep(survivors, f"daily.surv{day}")
    surv_ids = survivors.select("doc_id")
    hist_h, hist_s = history_sig
    day_h = (
        new_h.join(surv_ids, "doc_id", "left_semi")
        .select("content_hash")
        .distinct()
    )
    day_s = new_s.join(surv_ids, "doc_id", "left_semi").select(
        F.col("simhash").alias("hist_sim")
    )
    h, s = hist_h.unionByName(day_h), hist_s.unionByName(day_s)
    if persist is not None:
        # the two advanced tables are independent materializations over
        # already-pinned parents (batch_sims + survivors) — overlap them
        # so the day pays one persist latency, not two (guide §2.6); at
        # toy scale each persist is ~1 job of driver fixed cost, which is
        # the whole local bill of the day loop
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fh = pool.submit(keep, h, f"daily.sig_h{day}")
            fs = pool.submit(keep, s, f"daily.sig_s{day}")
            sig = (fh.result(), fs.result())
    else:
        sig = (keep(h, f"daily.sig_h{day}"), keep(s, f"daily.sig_s{day}"))
    return flags, survivors, sig


def run_daily_increments(
    history_sig: Sig,
    batches: Iterable[DataFrame],
    max_hamming: int = 3,
    persist: Callable[[DataFrame, str], DataFrame] | None = None,
) -> Iterator[tuple[DataFrame, DataFrame]]:
    """Iterate :func:`daily_step` over a batch sequence: yields
    ``(flags, survivors)`` per day, carrying the signature state forward
    by survivor-append only.

    ``persist`` (e.g. ``session.pooled_persist``) is applied to each day's
    survivor frame and advanced signature tables — REQUIRED in practice:
    without it day N's plan re-derives every prior day lazily (the loop
    is correct but the plan grows multiplicatively). A real deployment
    writes the advanced tables to parquet instead; the append shape is
    identical.
    """
    sig = history_sig
    for day, batch in enumerate(batches, start=1):
        flags, survivors, sig = daily_step(
            sig, batch, max_hamming=max_hamming, persist=persist, day=day
        )
        yield flags, survivors
