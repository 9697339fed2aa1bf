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

import pandas as pd
from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Streaming per-key counter deltas.

    Output schema: key_cols + (poll_ts timestamp, counter long, delta long).

    ``idle_timeout_ms`` enables state TTL eviction (I2) for continuous
    production streams. Leave ``None`` for replay/AvailableNow runs:
    ProcessingTimeTimeout keeps re-arming and AvailableNow then never
    terminates (it schedules batches until no pending timeouts remain).
    """
    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + f", {ts_col} timestamp, {counter_col} long, delta long"
    )
    state_schema = "last_counter long"

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        deltas = []
        for c in rows[counter_col]:
            c = int(c)
            if last is None:
                deltas.append(c)  # req1 seeded 0 (DIPA_Controller.py:134)
            else:
                d = c - last
                deltas.append(c if d < 0 else d)  # reset detection
            last = c
        state.update((last,))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        out = pd.DataFrame({c: [str(k)] * len(rows) for c, k in zip(key_cols, key)})
        out[ts_col] = rows[ts_col].values
        out[counter_col] = rows[counter_col].values
        out["delta"] = deltas
        yield out

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
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
