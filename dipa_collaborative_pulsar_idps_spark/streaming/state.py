"""Custom stateful streaming operators (SURVEY.md §2 C1-C3, I2-I8, I16).

These are the only operators in the engine that genuinely need
``applyInPandasWithState`` — everything else is built-in. Both keep state
bounded via GroupStateTimeout (the analogue of the reference's flow
idle_timeout=60 s eviction, DIPA_Controller.py:222,225).

Scale: state lives in the per-partition state store (RocksDB-capable),
keyed by the REAL flow key — fixing the reference's positional-index state
bug (DIPA_Controller.py:462, see SURVEY.md §7 watch list).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import DEFAULT, DetectionConfig

# ---------------------------------------------------------------------------
# C1-C3: cumulative-counter → delta with reset detection, streaming form.
# State: last counter per key. Negative delta ⇒ counter reset (flow
# re-install / switch reboot) ⇒ delta = current counter (SURVEY.md §4 #1).
# ---------------------------------------------------------------------------


def counter_delta_stream(
    df: DataFrame,
    key_cols: list[str],
    counter_col: str = "packet_count",
    ts_col: str = "poll_ts",
    idle_timeout_ms: int | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Streaming per-key counter deltas, SHARDED state.

    Output schema: key_cols + (poll_ts timestamp, counter long, delta long).

    Throughput design: ``applyInPandasWithState`` pays a Python invocation
    per state GROUP per batch — with one group per flow (8k flows/poll,
    the reference's saturation point) that overhead alone blows the 2 s
    poll budget. So the state key is a hash SHARD of the flow key
    (``n_shards`` Python calls per batch, not n_flows) and each shard's
    state holds the per-flow last-counter map as parallel arrays; the
    per-flow delta is a vectorized pandas groupby+shift inside the shard.
    Same semantics, ~n_flows/n_shards× less invocation overhead.

    Per-flow TTL eviction (I2) happens INSIDE the shard using EVENT time:
    entries whose last poll is older than ``idle_timeout_ms`` behind the
    shard's newest event are pruned each batch — matching the reference's
    data-driven flow idle timeout, and safe under Trigger.AvailableNow
    (no ProcessingTimeTimeout, which would re-arm forever and keep
    AvailableNow scheduling batches). State size is bounded by live flows;
    the shard rows themselves are bounded by ``n_shards``.
    """
    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + f", {ts_col} timestamp, {counter_col} long, delta long"
    )
    state_schema = "flow_keys array<string>, last_counters array<long>, last_seen_us array<long>"
    sep = "\x1f"

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ks, vs, seen = state.get
            prev_map = dict(zip(ks, vs))
            seen_map = dict(zip(ks, seen))
        else:
            prev_map, seen_map = {}, {}
        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        flow = rows[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            flow = flow + sep + rows[c].astype(str)
        rows = rows.assign(__flow=flow).sort_values(["__flow", ts_col])
        if idle_timeout_ms and seen_map:
            # evict BEFORE computing deltas: a flow idle past the timeout
            # re-installed (reference idle_timeout=60 s) — its old counter
            # must not seed the new delta.
            batch_max_us = int(rows[ts_col].astype("int64").max() // 1000)
            horizon = batch_max_us - idle_timeout_ms * 1000
            for k_ in [k_ for k_, u in seen_map.items() if u < horizon]:
                del prev_map[k_], seen_map[k_]
        vals = rows[counter_col].to_numpy(dtype="int64")
        prev = rows.groupby("__flow", sort=False)[counter_col].shift(1)
        first_mask = prev.isna().to_numpy()
        seed = rows["__flow"].map(prev_map).fillna(0).to_numpy(dtype="int64")
        prev = prev.fillna(0).to_numpy(dtype="int64")
        prev[first_mask] = seed[first_mask]  # carry state across batches
        deltas = vals - prev
        deltas = np.where(deltas < 0, vals, deltas)  # reset detection
        # update per-flow state: last counter + last event-time seen
        us = (rows[ts_col].astype("int64") // 1000).to_numpy()  # ns → µs
        tail = rows.assign(__v=vals, __us=us).groupby("__flow", sort=False).tail(1)
        prev_map.update(dict(zip(tail["__flow"], (int(v) for v in tail["__v"]))))
        seen_map.update(dict(zip(tail["__flow"], (int(u) for u in tail["__us"]))))
        state.update(
            (list(prev_map.keys()), list(prev_map.values()), [seen_map[k_] for k_ in prev_map])
        )
        out = pd.DataFrame(
            {c: rows[c].astype(str).values for c in key_cols}
        )
        out[ts_col] = rows[ts_col].values
        out[counter_col] = vals
        out["delta"] = deltas
        yield out

    shard = F.pmod(F.xxhash64(*key_cols), F.lit(n_shards)).alias("__shard")
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


# ---------------------------------------------------------------------------
# I16: keyed alert lifecycle state machine — sustained-count hysteresis up
# (I3, Controller1.py:419-429), calm-count down (I4, :434-443), latch (I7),
# TTL eviction (I2).
# Emits transition rows only (change-detection, not per-poll spam).
# ---------------------------------------------------------------------------


def alert_state_machine(
    df: DataFrame,
    key_col: str = "src",
    hot_col: str = "hot",
    ts_col: str = "poll_ts",
    cfg: DetectionConfig = DEFAULT,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-source alert lifecycle: suspected → ALERT after
    ``cfg.sustained_count`` consecutive hot polls; ALERT → ESCALATE
    (rate-limit → block, I5: TestCase_7/timeStamp2.py:353-359) after
    ``cfg.escalate_persist`` further hot polls; ALERT/ESCALATE → CLEAR after
    ``cfg.calm_count`` calm polls. Output: (key, event, event_ts, streak).

    ``idle_timeout_ms``: state TTL for continuous streams only (see
    :func:`counter_delta_stream`).
    """
    out_schema = f"{key_col} string, event string, event_ts timestamp, streak int"
    state_schema = "streak int, calm int, alerted boolean, escalated boolean"
    sustained, calm_needed = cfg.sustained_count, cfg.calm_count
    escalate_at = cfg.sustained_count + cfg.escalate_persist

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        streak, calm, alerted, escalated = (
            state.get if state.exists else (0, 0, False, False)
        )
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        events = []
        for _, r in rows.iterrows():
            if bool(r[hot_col]):
                streak, calm = streak + 1, 0
                if not alerted and streak >= sustained:
                    alerted = True
                    events.append(("ALERT", r[ts_col], streak))
                elif alerted and not escalated and streak >= escalate_at:
                    escalated = True
                    events.append(("ESCALATE", r[ts_col], streak))
            else:
                calm, streak = calm + 1, 0
                if alerted and calm >= calm_needed:
                    alerted = escalated = False
                    events.append(("CLEAR", r[ts_col], calm))
        state.update((int(streak), int(calm), bool(alerted), bool(escalated)))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        if events:
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])] * len(events),
                    "event": [e[0] for e in events],
                    "event_ts": [e[1] for e in events],
                    "streak": [int(e[2]) for e in events],
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


# ---------------------------------------------------------------------------
# I8: pushback sustained dedupe (TestCase_2/Controller1.py:354-363) — a
# per-domain pushback SET must stay identical for N consecutive polls
# before it is sent upstream, and an unchanged set is never re-sent.
# ---------------------------------------------------------------------------


def pushback_dedupe_stream(
    df: DataFrame,
    key_col: str = "vm",
    members_col: str = "members",
    ts_col: str = "poll_ts",
    sustain: int = 5,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Input: one row per (key, poll) carrying the poll's pushback set as an
    array column. Emits (key, sent_ts, members, streak) exactly once per
    sustained run: when the sorted set has been identical for *sustain*
    consecutive polls. A changed set resets the streak; after a send, the
    same set never re-fires until it changes and re-sustains.

    State: (canonical set string, streak, sent flag) — bounded per key.
    """
    out_schema = f"{key_col} string, sent_ts timestamp, members array<string>, streak int"
    state_schema = "sig string, streak int, sent boolean"

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        sig, streak, sent = state.get if state.exists else ("", 0, False)
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        fired = []
        for _, r in rows.iterrows():
            members = sorted(set(r[members_col]))
            new_sig = "\x1f".join(members)
            if new_sig == sig:
                streak += 1
            else:
                sig, streak, sent = new_sig, 1, False
            if not sent and members and streak >= sustain:
                sent = True
                fired.append((r[ts_col], members, streak))
        state.update((sig, int(streak), bool(sent)))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        if fired:
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])] * len(fired),
                    "sent_ts": [f[0] for f in fired],
                    "members": [f[1] for f in fired],
                    "streak": [int(f[2]) for f in fired],
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
