"""Streaming URL/host hygiene: first-seen URL dedup and per-host
admission control at ingest.

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

URL_DEDUP_OUT_SCHEMA = "doc_id long, host string, url_canon string"
# one long per distinct canonical URL — the first admitted id.  Re-delivered
# admitted ids skip (id == canonical), re-delivered duplicates re-reject
# (state exists, id differs): nothing but the winner is ever stored.
_URL_DEDUP_STATE_SCHEMA = "canonical_id long"


def streaming_url_dedup(
    stream: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """First-seen canonical-URL ADMISSION screen — the streaming form of
    ``webops.url_dedup``: the first document to arrive under each
    canonical URL is admitted (emitted), every later arrival of the
    same canonical URL is rejected forever.  The batch operator's
    min-id canonical is a re-mix rule a stream that has already emitted
    cannot honor; within a micro-batch arrivals process in id order, so
    a single drain's admitted set IS the batch operator's
    non-duplicate set bit-for-bit, and across drains the result is the
    deterministic admission replay over the batch boundaries (the
    ``streaming_host_cap`` contract).

    Unparseable rows (NULL url_canon) are each their own page identity
    — they key the state store under a per-row sentinel (never under a
    shared NULL key, which would wrongly collapse them) and always
    admit, matching the batch operator's quarantine-not-drop stance.

    Idempotence: an admitted id re-delivered after a checkpoint replay
    compares equal to the stored canonical and is NOT re-emitted; a
    rejected id re-derives its rejection from the existing state (the
    winner never changes), so nothing beyond one long per key is stored
    and re-drains emit nothing.

    STATE-SIZE BOUNDARY (documented, the winnow-index honesty rule):
    state grows ∝ distinct canonical URLs ever seen — the unavoidable
    price of exact forever-dedup.  When that is too much, bound it the
    way the repo's other standing screens do: (a) event-time TTL via
    ``streaming_exact_dedup``'s ``dropDuplicatesWithinWatermark`` shape
    (keys evict past the horizon, late re-crawls re-admit), or (b) the
    ``streaming_winnow_index_writer`` pattern — persist the admitted
    key set as a compacted parquet artifact and serve the screen as a
    per-micro-batch anti-join against it (state store empty, the
    artifact is the state)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.webops import url_canonicalize

    canon = url_canonicalize(stream, url_col).select(
        F.col(id_col).alias("doc_id"),
        "host",
        "url_canon",
        F.coalesce(
            F.col("url_canon"),
            F.concat(
                F.lit("\x00unparsed\x00"), F.col(id_col).cast("string")
            ),
        ).alias("_key"),
    )

    def func(key, pdfs, state: "GroupState"):
        canonical = state.get[0] if state.exists else None
        arrivals: list[tuple[int, str | None, str | None]] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                arrivals.append((int(r.doc_id), r.host, r.url_canon))
        arrivals.sort(key=lambda a: a[0])
        out = []
        for doc_id, host, url_canon in arrivals:
            if canonical is None:
                canonical = doc_id
                state.update((doc_id,))
                out.append((doc_id, host, url_canon))
            # else: re-delivered winner (== canonical) or duplicate —
            # both deterministically emit nothing
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "host", "url_canon"]
            )

    return canon.groupBy("_key").applyInPandasWithState(
        func,
        URL_DEDUP_OUT_SCHEMA,
        _URL_DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


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
    from ..operators.webops import url_canonicalize_parsed

    canon = url_canonicalize_parsed(stream, url_col).select(
        F.col(id_col).alias("doc_id"), "host", "url_canon"
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


ADMISSION_OUT_SCHEMA = "doc_id long, host string, url_canon string"


def streaming_admission_screen(
    stream: DataFrame,
    blocked_host_suffixes: list[str],
    blocked_path_terms: list[str] | None = None,
    robots_rules: list[tuple[str, str]] | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocklist + robots ADMISSION screen at ingest — the crawl loop's
    remaining batch-only screens as a streaming filter: a document is
    admitted iff its URL parses, its canonical host/path passes the
    blocklist (``webops.url_blocklist_screen`` rules), and the
    caller-resolved robots rule group allows its path
    (``webops.robots_screen`` semantics; no ``robots_rules`` →
    everything robots-allowed).  Emits (doc_id, host, url_canon) for
    admitted rows only; unparseable rows are NOT admitted (no host to
    screen — quarantine upstream, the batch screens' stance).

    Both screens are pure per-row Column expressions, so this op is
    STATELESS: a drained run equals the batch composition row-for-row
    by construction, restart/replay re-derives identical verdicts from
    the rows alone (no state store, no watermark), and at 100 TB/day it
    is an embarrassingly parallel map over the ingest stream.  The
    stateful admission ops (``streaming_url_dedup``,
    ``streaming_host_cap``) compose AFTER this screen — cheapest
    filters first, so blocked/disallowed rows never reach the state
    store."""
    from ..operators.webops import (
        robots_screen,
        url_blocklist_screen,
        url_canonicalize_parsed,
    )

    canon = url_canonicalize_parsed(stream, url_col)
    screened = url_blocklist_screen(
        canon,
        blocked_host_suffixes,
        blocked_path_terms,
        precanonicalized=True,
    )
    if robots_rules:
        screened = robots_screen(
            screened, robots_rules, precanonicalized=True
        ).filter(F.col("robots_allowed"))
    return screened.filter(~F.col("blocked")).select(
        F.col(id_col).alias("doc_id"), "host", "url_canon"
    )
