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


_FLOW_SEP = "\x1f"


def _delta_batch(
    rows: pd.DataFrame,
    key_cols: list[str],
    counter_col: str,
    ts_col: str,
    prev_map: dict,
    seen_map: dict,
    idle_timeout_ms: int | None,
    sep: str = _FLOW_SEP,
) -> tuple[pd.DataFrame, dict, list]:
    """One micro-batch of the per-flow counter-delta kernel, shared by the
    sharded `applyInPandasWithState` form and the transformWithState twin:
    vectorized per-flow shift deltas with reset detection, seeded from and
    updating ``prev_map``/``seen_map`` (mutated in place). Returns
    (output rows, {flow: (counter, last_seen_us)} updates, evicted flows).
    """
    flow = rows[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        flow = flow + sep + rows[c].astype(str)
    rows = rows.assign(__flow=flow).sort_values(["__flow", ts_col])
    evicted: list = []
    if idle_timeout_ms and seen_map:
        # evict BEFORE computing deltas: a flow idle past the timeout
        # re-installed (reference idle_timeout=60 s) — its old counter
        # must not seed the new delta.
        batch_max_us = int(rows[ts_col].astype("int64").max() // 1000)
        horizon = batch_max_us - idle_timeout_ms * 1000
        for k_ in [k_ for k_, u in seen_map.items() if u < horizon]:
            del prev_map[k_], seen_map[k_]
            evicted.append(k_)
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
    updates = {
        f: (int(v), int(u))
        for f, v, u in zip(tail["__flow"], tail["__v"], tail["__us"])
    }
    prev_map.update({f: v for f, (v, _) in updates.items()})
    seen_map.update({f: u for f, (_, u) in updates.items()})
    out = pd.DataFrame({c: rows[c].astype(str).values for c in key_cols})
    out[ts_col] = rows[ts_col].values
    out[counter_col] = vals
    out["delta"] = deltas
    return out, updates, evicted


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
    sep = _FLOW_SEP

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
        out, _, _ = _delta_batch(
            rows, key_cols, counter_col, ts_col, prev_map, seen_map,
            idle_timeout_ms, sep,
        )
        state.update(
            (list(prev_map.keys()), list(prev_map.values()), [seen_map[k_] for k_ in prev_map])
        )
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


def _runs(keys: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length segmentation: start indices and lengths of maximal runs of
    rows sharing (key, value) — the backbone of the vectorized state
    machines (events are computed per RUN, not per row)."""
    n = len(keys)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    change = np.ones(n, dtype=bool)
    change[1:] = (keys[1:] != keys[:-1]) | (values[1:] != values[:-1])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, n))
    return starts, lengths


def _advance_lifecycle(
    st: list,
    is_hot: bool,
    ln: int,
    ts_run,
    sustained: int,
    calm_needed: int,
    escalate_at: int,
) -> list[tuple[str, Any, int]]:
    """Advance one key's lifecycle state ``st = [streak, calm, alerted,
    escalated]`` (mutated in place) through ONE maximal run of ``ln``
    consecutive polls of the same hotness; ``ts_run`` holds the run's
    timestamps. Returns the transition events fired inside the run.

    This is THE lifecycle arithmetic — the sharded machine and the
    transformWithState twin both call it, so every lifecycle golden/
    property test certifies both forms' semantics."""
    # st may carry extra fields past [3] (the sharded form appends
    # last_seen_us); only the lifecycle quadruple is read/written here
    streak, calm, alerted, escalated = st[0], st[1], st[2], st[3]
    events: list[tuple[str, Any, int]] = []
    if is_hot:
        if not alerted and streak + ln >= sustained:
            p = max(sustained - streak, 1)
            alerted = True
            events.append(("ALERT", ts_run[p - 1], streak + p))
        if alerted and not escalated and streak + ln >= escalate_at:
            p = max(escalate_at - streak, 1)
            if p <= ln:
                escalated = True
                events.append(("ESCALATE", ts_run[p - 1], streak + p))
        streak, calm = streak + ln, 0
    else:
        if alerted and calm + ln >= calm_needed:
            p = max(calm_needed - calm, 1)
            alerted = escalated = False
            events.append(("CLEAR", ts_run[p - 1], calm + p))
        calm, streak = calm + ln, 0
    st[0], st[1], st[2], st[3] = int(streak), int(calm), bool(alerted), bool(escalated)
    return events


def alert_state_machine(
    df: DataFrame,
    key_col: str = "src",
    hot_col: str = "hot",
    ts_col: str = "poll_ts",
    cfg: DetectionConfig = DEFAULT,
    idle_timeout_ms: int | None = None,
    n_shards: int = 64,
    emit_state_size: bool = False,
) -> DataFrame:
    """Per-source alert lifecycle: suspected → ALERT after
    ``cfg.sustained_count`` consecutive hot polls; ALERT → ESCALATE
    (rate-limit → block, I5: TestCase_7/timeStamp2.py:353-359) after
    ``cfg.escalate_persist`` further hot polls; ALERT/ESCALATE → CLEAR after
    ``cfg.calm_count`` calm polls. Output: (key, event, event_ts, streak).

    SHARDED state, same design as :func:`counter_delta_stream`: the group
    key is a hash shard (``n_shards`` Python invocations per batch, not
    n_keys) and each shard holds its keys' lifecycle tuples as parallel
    arrays. Inside the shard the poll timeline is run-length segmented
    (consecutive hot / calm runs per key); transitions are emitted with
    O(1) arithmetic per RUN — the crossing position of sustained /
    escalate / calm thresholds — so cost scales with state changes, not
    polls. ``idle_timeout_ms`` is an EVENT-TIME TTL applied inside the
    shard (entries idle past the horizon are pruned before processing) —
    never ProcessingTimeTimeout, which re-arms forever and hangs
    Trigger.AvailableNow harnesses.

    ``emit_state_size=True`` adds one observability row per shard per
    batch — (``__shard=<n>``, event=``STATE_SIZE``, batch max ts,
    streak=tracked keys AFTER TTL pruning) — so soak tests/monitors can
    assert the state stays bounded instead of trusting the TTL. The
    sharded layout makes the engine-level ``numRowsTotal`` metric read
    n_shards regardless of key count; this probe is the honest signal.
    """
    out_schema = f"{key_col} string, event string, event_ts timestamp, streak int"
    state_schema = (
        "keys array<string>, streaks array<int>, calms array<int>, "
        "alerteds array<boolean>, escalateds array<boolean>, last_seen_us array<long>"
    )
    sustained, calm_needed = cfg.sustained_count, cfg.calm_count
    escalate_at = cfg.sustained_count + cfg.escalate_persist

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ks, st_, ca, al, es, seen = state.get
            smap = {k_: [st_[i], ca[i], al[i], es[i], seen[i]] for i, k_ in enumerate(ks)}
        else:
            smap = {}
        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        rows = rows.sort_values([key_col, ts_col])
        keys_a = rows[key_col].astype(str).to_numpy(dtype=object)
        hot_a = rows[hot_col].to_numpy(dtype=bool)
        ts_a = rows[ts_col].to_numpy()
        us_a = rows[ts_col].astype("int64").to_numpy() // 1000  # ns → µs
        if idle_timeout_ms and smap:
            horizon = int(us_a.max()) - idle_timeout_ms * 1000
            for k_ in [k_ for k_, v in smap.items() if v[4] < horizon]:
                del smap[k_]
        starts, lengths = _runs(keys_a, hot_a)
        events: list[tuple[str, str, Any, int]] = []
        for s, ln in zip(starts, lengths):
            k_ = keys_a[s]
            st = smap.get(k_) or [0, 0, False, False, 0]
            for ev, ts, stk in _advance_lifecycle(
                st, bool(hot_a[s]), int(ln), ts_a[s : s + ln],
                sustained, calm_needed, escalate_at,
            ):
                events.append((k_, ev, ts, stk))
            st[4] = int(us_a[s + ln - 1])
            smap[k_] = st
        if emit_state_size:
            events.append((f"__shard={key[0]}", "STATE_SIZE", ts_a.max(), len(smap)))
        state.update(
            (
                list(smap.keys()),
                [v[0] for v in smap.values()],
                [v[1] for v in smap.values()],
                [v[2] for v in smap.values()],
                [v[3] for v in smap.values()],
                [v[4] for v in smap.values()],
            )
        )
        if events:
            yield pd.DataFrame(
                {
                    key_col: [e[0] for e in events],
                    "event": [e[1] for e in events],
                    "event_ts": [e[2] for e in events],
                    "streak": [int(e[3]) for e in events],
                }
            )

    shard = F.pmod(F.xxhash64(key_col), F.lit(n_shards)).alias("__shard")
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


# ---------------------------------------------------------------------------
# I16 on Spark 4's transformWithState API: the forward-looking twin of
# alert_state_machine. State lives PER KEY in the native state store
# (RocksDB required by the API), not in sharded Python dicts — the layout
# production Spark is converging on for custom stateful operators.
# ---------------------------------------------------------------------------


def make_alert_processor(
    key_col: str = "src",
    hot_col: str = "hot",
    ts_col: str = "poll_ts",
    cfg: DetectionConfig = DEFAULT,
    state_ttl_ms: int | None = None,
):
    """Build the StatefulProcessor behind :func:`alert_state_machine_tws`.
    Exposed separately so tests can drive it WIRE-FREE against a fake
    handle (the protobuf state protocol is absent in the sandbox)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    sustained, calm_needed = cfg.sustained_count, cfg.calm_count
    escalate_at = cfg.sustained_count + cfg.escalate_persist

    class _AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "alert",
                "streak int, calm int, alerted boolean, escalated boolean",
                ttlDurationMs=state_ttl_ms,
            )

        def handleInputRows(self, key, rows, timer_values):
            chunks = list(rows)
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            pdf = pdf.sort_values(ts_col)
            hot_a = pdf[hot_col].to_numpy(dtype=bool)
            ts_a = pdf[ts_col].to_numpy()
            st = list(self._st.get()) if self._st.exists() else [0, 0, False, False]
            # ONE key here, so runs segment purely on the hot flag; the
            # transition arithmetic is the SHARED kernel
            starts, lengths = _runs(np.zeros(len(hot_a)), hot_a)
            events: list[tuple[str, Any, int]] = []
            for s, ln in zip(starts, lengths):
                events.extend(
                    _advance_lifecycle(
                        st, bool(hot_a[s]), int(ln), ts_a[s : s + ln],
                        sustained, calm_needed, escalate_at,
                    )
                )
            self._st.update(tuple(st))
            if events:
                yield pd.DataFrame(
                    {
                        key_col: [str(key[0])] * len(events),
                        "event": [e[0] for e in events],
                        "event_ts": [e[1] for e in events],
                        "streak": [int(e[2]) for e in events],
                    }
                )

        def close(self) -> None:
            pass

    return _AlertProcessor()


def alert_state_machine_tws(
    df: DataFrame,
    key_col: str = "src",
    hot_col: str = "hot",
    ts_col: str = "poll_ts",
    cfg: DetectionConfig = DEFAULT,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Identical lifecycle semantics to :func:`alert_state_machine`
    (suspected → ALERT → ESCALATE → CLEAR, same thresholds, same
    transition-only emission; equivalence is pytest-certified), expressed
    on ``transformWithStateInPandas`` (Spark 4 structured-streaming
    stateful v2):

    - ONE ValueState tuple per key in the native store — the engine never
      serializes parallel arrays through GroupState, and RocksDB holds
      key-level entries (the ``numRowsTotal`` metric reads true key
      counts when ``trackTotalNumberOfRows`` is on; the engine's default
      ``ROCKSDB_STATE_CONF`` trades that metric for write throughput —
      r10 soak — so audit key counts via the State Data Source
      (``streaming/stateview.py``) or re-enable tracking per session);
    - TTL is the API's built-in per-state ``ttlDurationMs``
      (processing-time — the state-hygiene clock a production cluster
      actually runs; the sharded form's event-time TTL remains the
      replay-deterministic variant);
    - REQUIRES the RocksDB state store provider
      (``session.enable_rocksdb_state``) — a transformWithState query on
      the default HDFS provider fails at start by Spark's own contract —
      AND the ``protobuf`` package in the Python environment (the TWS
      state protocol is protobuf-framed; absent in this sandbox, so the
      wire tests skip-gate on it exactly like the Pulsar-jar tests,
      while the processor itself is certified wire-free against a fake
      handle and shares :func:`_advance_lifecycle` with the fully-tested
      sharded machine).

    Trade-off vs the sharded form: per-key handler invocations cost more
    Python dispatch per batch at huge key counts (the sharded form
    amortizes to ``n_shards`` calls), but state layout, TTL, timers and
    metrics are native.
    """
    out_schema = f"{key_col} string, event string, event_ts timestamp, streak int"
    # Spark rejects TTL state registration unless the query runs in
    # processing-time mode (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_
    # ASSIGN_TTL), so the time mode follows the TTL parameter.
    time_mode = "processingTime" if state_ttl_ms is not None else "None"
    return df.groupBy(key_col).transformWithStateInPandas(
        make_alert_processor(key_col, hot_col, ts_col, cfg, state_ttl_ms),
        out_schema,
        "append",
        time_mode,
    )


def make_delta_processor(
    key_cols: list[str] | None = None,
    counter_col: str = "packet_count",
    ts_col: str = "poll_ts",
    idle_timeout_ms: int | None = None,
):
    """Build the StatefulProcessor behind :func:`counter_delta_tws`.
    Exposed separately so tests can drive it WIRE-FREE against a fake
    handle (the TWS protobuf protocol is absent in this sandbox), exactly
    like :func:`make_alert_processor`."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    kc = key_cols or ["src"]

    class _DeltaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # native MapState: one entry PER FLOW inside each shard's
            # state — RocksDB stores and iterates entries individually,
            # so per-flow updates/evictions don't rewrite the whole
            # shard blob the way the sharded form's parallel arrays do.
            self._flows = handle.getMapState(
                "flows", "flow string", "last_counter long, last_seen_us long"
            )

        def handleInputRows(self, key, rows, timer_values):
            chunks = list(rows)
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            prev_map: dict = {}
            seen_map: dict = {}
            if self._flows.exists():
                for k_, v in self._flows.iterator():
                    prev_map[k_[0]] = v[0]
                    seen_map[k_[0]] = v[1]
            out, updates, evicted = _delta_batch(
                pdf, kc, counter_col, ts_col, prev_map, seen_map, idle_timeout_ms
            )
            for f in evicted:
                self._flows.removeKey((f,))
            for f, (v, u) in updates.items():
                self._flows.updateValue((f,), (v, u))
            yield out

        def close(self) -> None:
            pass

    return _DeltaProcessor()


def counter_delta_tws(
    df: DataFrame,
    key_cols: list[str],
    counter_col: str = "packet_count",
    ts_col: str = "poll_ts",
    idle_timeout_ms: int | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """:func:`counter_delta_stream` on Spark 4's ``transformWithState``
    API — IDENTICAL semantics (same `_delta_batch` kernel, same shard
    fan-in), different state layout: per-flow entries live in a native
    ``MapState`` instead of parallel arrays serialized as one shard
    tuple. RocksDB then stores each flow as its own key-value entry, so
    a shard touching 3 of its 10k flows rewrites 3 entries (plus their
    changelog records), not one 10k-wide blob — and the State Data
    Source reads per-flow rows directly (`streaming/stateview.py`).

    Requires the RocksDB provider + protobuf like
    :func:`alert_state_machine_tws` (wire tests gate on it; the
    processor itself is certified wire-free against a fake MapState
    handle, and the kernel is the fully-tested `_delta_batch`)."""
    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + f", {ts_col} timestamp, {counter_col} long, delta long"
    )
    shard = F.pmod(F.xxhash64(*key_cols), F.lit(n_shards)).alias("__shard")
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard")
        .transformWithStateInPandas(
            make_delta_processor(key_cols, counter_col, ts_col, idle_timeout_ms),
            out_schema,
            "append",
            "None",
        )
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
    n_shards: int = 64,
) -> DataFrame:
    """Input: one row per (key, poll) carrying the poll's pushback set as an
    array column. Emits (key, sent_ts, members, streak) exactly once per
    sustained run: when the sorted set has been identical for *sustain*
    consecutive polls. A changed set resets the streak; after a send, the
    same set never re-sent until it changes and re-sustains.

    SHARDED state (see :func:`counter_delta_stream`): one Python call per
    hash shard per batch; per-key (sig, streak, sent) tuples held as
    parallel arrays in the shard. The poll timeline is run-length
    segmented on (key, canonical-set signature); a send is the O(1)
    crossing position of ``sustain`` within a run — no per-row loop.
    ``idle_timeout_ms`` = event-time TTL inside the shard (never
    ProcessingTimeTimeout — see alert_state_machine).
    """
    out_schema = f"{key_col} string, sent_ts timestamp, members array<string>, streak int"
    state_schema = (
        "keys array<string>, sigs array<string>, streaks array<int>, "
        "sents array<boolean>, last_seen_us array<long>"
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ks, sg, st_, sn, seen = state.get
            smap = {k_: [sg[i], st_[i], sn[i], seen[i]] for i, k_ in enumerate(ks)}
        else:
            smap = {}
        chunks = list(pdfs)
        rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        rows = rows.sort_values([key_col, ts_col])
        keys_a = rows[key_col].astype(str).to_numpy(dtype=object)
        ts_a = rows[ts_col].to_numpy()
        us_a = rows[ts_col].astype("int64").to_numpy() // 1000
        mem_canon = np.empty(len(rows), dtype=object)
        sig_a = np.empty(len(rows), dtype=object)
        for i, m in enumerate(rows[members_col].to_numpy()):
            canon = sorted(set(m))
            mem_canon[i] = canon
            sig_a[i] = "\x1f".join(canon)
        if idle_timeout_ms and smap:
            horizon = int(us_a.max()) - idle_timeout_ms * 1000
            for k_ in [k_ for k_, v in smap.items() if v[3] < horizon]:
                del smap[k_]
        starts, lengths = _runs(keys_a, sig_a)
        fired: list[tuple[str, Any, list, int]] = []
        for s, ln in zip(starts, lengths):
            k_ = keys_a[s]
            st = smap.get(k_)
            if st is not None and st[0] == sig_a[s]:
                start, sent = st[1], st[2]
            else:
                start, sent = 0, False
            if not sent and mem_canon[s] and start + ln >= sustain:
                p = max(sustain - start, 1)
                sent = True
                fired.append((k_, ts_a[s + p - 1], mem_canon[s], start + p))
            smap[k_] = [sig_a[s], int(start + ln), bool(sent), int(us_a[s + ln - 1])]
        state.update(
            (
                list(smap.keys()),
                [v[0] for v in smap.values()],
                [v[1] for v in smap.values()],
                [v[2] for v in smap.values()],
                [v[3] for v in smap.values()],
            )
        )
        if fired:
            yield pd.DataFrame(
                {
                    key_col: [f[0] for f in fired],
                    "sent_ts": [f[1] for f in fired],
                    "members": [f[2] for f in fired],
                    "streak": [int(f[3]) for f in fired],
                }
            )

    shard = F.pmod(F.xxhash64(key_col), F.lit(n_shards)).alias("__shard")
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandasWithState(fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


def heavy_hitters_stream(
    df: DataFrame,
    col: str,
    m: int = 128,
    n_shards: int = 16,
) -> DataFrame:
    """Streaming frequent items: per-shard SpaceSaving state over an
    unbounded stream (the streaming twin of
    `operators/heavyhitters.heavy_hitters_exact`).

    Values are SHARDED BY VALUE HASH, so every occurrence of a value
    lands in the same shard and each shard maintains one SpaceSaving
    summary of ≤ ``m`` counters — state is O(m · n_shards) FOREVER,
    regardless of stream length or value cardinality (no watermark
    needed: the summary itself is the bounded structure, unlike dedup
    state). Each batch the shard re-emits its current candidate set as
    (value, est_count, err_bound): est overestimates the true count by at
    most err_bound (the count the entry inherited at its last eviction) —
    the standard SpaceSaving guarantee, which also means any value with
    true frequency > batch_total/m so far is present.

    Append-mode emission of per-batch snapshots: downstream takes the
    latest batch (or maxes over time) for a live top-k board.
    """
    out_schema = f"{col} string, est_count long, err_bound long"
    state_schema = "vals array<string>, counts array<long>, errs array<long>"

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            vs, cs, es = state.get
            counts = dict(zip(vs, cs))
            errs = dict(zip(vs, es))
        else:
            counts, errs = {}, {}
        for pdf in pdfs:
            for v in pdf[col]:
                if v in counts:
                    counts[v] += 1
                elif len(counts) < m:
                    counts[v] = 1
                    errs[v] = 0
                else:
                    mk = min(counts, key=counts.get)
                    mv = counts.pop(mk)
                    errs.pop(mk)
                    counts[v] = mv + 1
                    errs[v] = mv  # overestimate bound inherited on eviction
        keys = list(counts.keys())
        state.update((keys, [counts[k2] for k2 in keys], [errs[k2] for k2 in keys]))
        yield pd.DataFrame(
            {
                col: keys,
                "est_count": [counts[k2] for k2 in keys],
                "err_bound": [errs[k2] for k2 in keys],
            }
        )

    shard = F.pmod(F.xxhash64(F.col(col)), F.lit(n_shards)).alias("__shard")
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
