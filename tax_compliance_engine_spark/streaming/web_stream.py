"""Streaming URL/host hygiene: per-host admission control at ingest.

The batch cap (``operators/webops.per_host_cap_sample``) keeps the
cap-SMALLEST LCG keys per host — a rule that may displace a previously
kept row when a smaller key arrives, which a stream that has already
emitted rows cannot do.  The streaming contract is therefore
FIRST-``cap``-ARRIVALS per host (admission control): every arriving
document is admitted while its host's admitted count is below the cap,
rejected afterwards — the rate-limit form every real crawl-ingest
pipeline runs, complementary to the batch re-mix.  Within a micro-batch
arrivals are processed in id order, so the drained result is a pure
function of (batch boundaries, ids) — deterministic and pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOST_CAP_OUT_SCHEMA = "doc_id long, host string, url_canon string, host_rank int"
# admitted keeps ADMISSION ORDER (host_rank = its index + 1).  Rejected
# ids are deliberately NOT stored: rejection only happens once the cap is
# reached and the cap never un-fills, so a re-delivered rejected id
# deterministically rejects again — state stays O(cap) per host forever,
# never O(arrivals)
_HOST_CAP_STATE_SCHEMA = "admitted array<long>"


def streaming_host_cap(
    stream: DataFrame,
    cap: int = 20,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit at most ``cap`` documents per canonical host from a
    document stream: emits (doc_id, host, url_canon, host_rank) for
    admitted rows only, where host_rank is the admission order (1-based).

    One ``applyInPandasWithState`` keyed by host; state is the host's
    admitted id list (O(cap) longs per host — bounded forever, no
    watermark needed).  Re-delivered ids are idempotently skipped (an
    admitted id is never re-emitted, a rejected id never retries —
    rejection is deterministic given the admission history).
    Unparseable URLs (NULL host) are dropped before the state op, same
    as the batch operator."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.webops import url_canonicalize

    if cap < 1:
        raise ValueError(f"cap must be ≥ 1: {cap}")
    canon = (
        url_canonicalize(stream, url_col)
        .filter(F.col("host").isNotNull())
        .select(F.col(id_col).alias("doc_id"), "host", "url_canon")
    )

    def func(key, pdfs, state: "GroupState"):
        admitted = list(state.get[0]) if state.exists else []
        seen = set(admitted)
        arrivals: list[tuple[int, str]] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                arrivals.append((int(r.doc_id), r.url_canon))
        arrivals.sort()
        out: list[tuple[int, str, str, int]] = []
        for doc_id, url_canon in arrivals:
            if doc_id in seen or len(admitted) >= cap:
                # re-delivered admitted id, or host at cap (a re-delivered
                # REJECTED id lands here too: the cap never un-fills, so
                # its rejection re-derives without storing rejected ids)
                continue
            admitted.append(doc_id)
            seen.add(doc_id)
            out.append((doc_id, key[0], url_canon, len(admitted)))
        state.update((admitted,))
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "host", "url_canon", "host_rank"]
            )

    return canon.groupBy("host").applyInPandasWithState(
        func,
        HOST_CAP_OUT_SCHEMA,
        _HOST_CAP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
