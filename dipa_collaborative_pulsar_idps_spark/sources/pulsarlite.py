"""`pulsarlite`: a loopback message broker as a PySpark Python Data Source.

Why this exists (SURVEY.md §2 A5-A7): the reference's collaboration layer
rides a Pulsar broker on localhost (`pulsar://localhost:6650`, Shared
subscription, multi-topic `update{i}`/`time{i}` consumers, async ZLib
producers — DIPA_Controller.py:67-90, threaded_consumer.py:38-44). The
sandbox has neither a broker nor the StreamNative connector jar, so the
A5-A7 builders in :mod:`.pulsar` could only be error-path-probed.

This module closes that gap WITHOUT faking the test: it registers a real
Spark streaming source/sink (the DataSource V2 Python API, public since
Spark 4.0) named ``pulsarlite`` that speaks the same surface the Pulsar
connector exposes — ``service.url``, ``topicsPattern``,
``startingOffsets``, ``topic``, ``pulsar.producer.compressionType`` — and
the same output columns (``__key``, ``__topic``, ``__publishTime``,
``value``). `pulsar_source_reader(fmt="pulsarlite")` and
`pulsar_sink_writer(fmt="pulsarlite")` therefore exercise their REAL code
paths end-to-end through Spark's streaming engine: offset tracking,
micro-batch planning, per-partition reads on executors, staged writes with
driver-side commit, replay idempotence.

Broker model (one directory = one broker):
- ``service.url`` is ``pulsarlite://<abs-dir>`` (or a bare path);
- each topic is one append-only JSON-lines log ``<dir>/<quoted-topic>.jsonl``
  (message = ``{"us": publish-epoch-µs, "k": key|null, "c": codec,
  "v": base64 payload}``);
- offsets are per-topic byte positions, clamped to the last complete line
  so a concurrent append never yields a torn record;
- the producer stages per-partition part files and appends them to the
  topic log in a single driver-side commit; a per-topic ``.commits``
  marker makes replayed commits of the same epoch no-ops (the
  effective-exactly-once contract of I12);
- ``compressionType: zlib`` is honored for real (payloads stored
  zlib-deflated, inflated on read) — parity with the reference's
  ZLib producers;
- partitioned topics (r5): ``create_partitioned_topic`` writes broker
  metadata + N internal ``<topic>-partition-<i>`` logs (Pulsar's exact
  naming); producers run the ``RoundRobinPartition`` router the
  reference configures (DIPA_Controller.py:74-80) — keyless messages
  round-robin, keyed messages hash to a fixed partition,
  ``SinglePartition`` pins the producer to one — and the consumer's
  pattern matches BASE names then fans in every partition topic,
  preserving per-partition order (one input slice per partition log).

Scale note: this is deliberately a LOOPBACK transport (local filesystem,
single broker dir) — the air-gapped stand-in for the reference's
localhost standalone broker, and the CI proof of the A5-A7 plumbing. On a
cluster, the same builders target the real connector (``fmt="pulsar"`` /
``fmt="kafka"``); nothing downstream changes because every pipeline takes
a DataFrame.
"""

from __future__ import annotations

import base64
import dataclasses
import datetime as dt
import json
import os
import re
import time
import uuid
import zlib
from collections.abc import Iterator
from urllib.parse import quote, unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORMAT_NAME = "pulsarlite"

#: Column surface shared with the Pulsar connector (the subset the engine
#: selects in pulsar.py: __publishTime/__topic/value; __key for keyed topics).
SCHEMA = StructType(
    [
        StructField("__key", StringType()),
        StructField("__topic", StringType()),
        StructField("__publishTime", TimestampType()),
        StructField("value", BinaryType()),
    ]
)

_LOG_EXT = ".jsonl"
_PARTITIONS_EXT = ".partitions"

#: Pulsar's partitioned-topic naming convention: partition i of topic T is
#: the internal topic "T-partition-i" (what __topic reports and what a
#: multi-topic consumer fans in — same as the real broker).
_PARTITION_FMT = "{topic}-partition-{i}"


def broker_dir(service_url: str) -> str:
    """``pulsarlite://<dir>`` or a bare directory path → broker directory."""
    if "://" in service_url:
        scheme, _, rest = service_url.partition("://")
        if scheme not in (FORMAT_NAME, "pulsar", "file"):
            raise ValueError(f"unsupported service.url scheme {scheme!r}")
        return "/" + rest.lstrip("/") if not rest.startswith("/") else rest
    return service_url


def _topic_log(root: str, topic: str) -> str:
    # Pulsar topic names carry '/' (persistent://tenant/ns/name); quote for FS.
    return os.path.join(root, quote(topic, safe="") + _LOG_EXT)


def _list_topics(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        unquote(f[: -len(_LOG_EXT)])
        for f in os.listdir(root)
        if f.endswith(_LOG_EXT)
    )


def _partitions_meta(root: str, topic: str) -> str:
    return os.path.join(root, quote(topic, safe="") + _PARTITIONS_EXT)


def create_partitioned_topic(root: str, topic: str, n_partitions: int) -> None:
    """Create a partitioned topic: broker metadata (partition count) plus
    empty partition logs — the pulsarlite twin of
    ``pulsar-admin topics create-partitioned-topic -p N``. Producers that
    target ``topic`` route across the N internal ``topic-partition-i``
    logs; consumers subscribing to ``topic`` fan them all in."""
    if n_partitions < 1:
        raise ValueError("n_partitions must be >= 1")
    os.makedirs(root, exist_ok=True)
    with open(_partitions_meta(root, topic), "w", encoding="ascii") as f:
        f.write(str(int(n_partitions)))
    for i in range(n_partitions):
        path = _topic_log(root, _PARTITION_FMT.format(topic=topic, i=i))
        if not os.path.exists(path):
            open(path, "a").close()


def topic_partitions(root: str, topic: str) -> int:
    """Partition count of ``topic``: N for a partitioned topic, 0 for a
    plain (non-partitioned) one — mirroring the broker metadata lookup the
    Pulsar client does before choosing a message router."""
    try:
        with open(_partitions_meta(root, topic), encoding="ascii") as f:
            return int(f.read().strip())
    except OSError:
        return 0


def _complete_size(path: str) -> int:
    """Byte size of the log up to (and including) the last '\\n' — a reader
    planned against this offset can never see a torn record.

    The backward scan loops in 4 KiB windows until a newline or
    start-of-file: a single fixed-size peek would return 0 whenever the
    torn (in-progress) tail line alone exceeds the window, regressing
    latestOffset to 0 and re-delivering the whole topic once the line
    completes — breaking effective exactly-once."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return 0
    pos = size
    with open(path, "rb") as f:
        while pos > 0:
            back = min(4096, pos)
            f.seek(pos - back)
            window = f.read(back)
            nl = window.rfind(b"\n")
            if nl >= 0:
                return pos - (back - nl - 1)
            pos -= back
    return 0


def encode_message(value: bytes, key: str | None, codec: str, publish_us: int) -> str:
    payload = zlib.compress(value) if codec == "zlib" else value
    return json.dumps(
        {
            "us": publish_us,
            "k": key,
            "c": codec,
            "v": base64.b64encode(payload).decode("ascii"),
        },
        separators=(",", ":"),
    )


def decode_message(line: str) -> tuple[str | None, int, bytes]:
    m = json.loads(line)
    raw = base64.b64decode(m["v"])
    value = zlib.decompress(raw) if m.get("c") == "zlib" else raw
    return m.get("k"), int(m["us"]), value


def seed_topic(
    root: str,
    topic: str,
    messages: list[bytes | str],
    *,
    codec: str = "none",
    start_us: int | None = None,
) -> None:
    """Test/backfill helper: append messages to a topic log directly (the
    out-of-band producer, e.g. the reference's attacker VMs). ``start_us``
    pins publish times for event-time-deterministic tests; default is now."""
    os.makedirs(root, exist_ok=True)
    now_us = int(time.time() * 1_000_000) if start_us is None else start_us
    lines = []
    for i, msg in enumerate(messages):
        b = msg.encode("utf-8") if isinstance(msg, str) else msg
        lines.append(encode_message(b, None, codec, now_us + i))
    with open(_topic_log(root, topic), "a", encoding="ascii") as f:
        f.write("".join(line + "\n" for line in lines))


@dataclasses.dataclass
class TopicSlice(InputPartition):
    path: str
    topic: str
    start: int
    end: int


class PulsarLiteStreamReader(DataSourceStreamReader):
    """Offset-tracked multi-topic reader: one input partition per topic per
    micro-batch; reads happen on executors (driver only stats file sizes)."""

    def __init__(self, options: dict):
        url = options.get("service.url")
        if not url:
            raise ValueError("pulsarlite requires option service.url")
        self.root = broker_dir(url)
        pattern = options.get("topicspattern")
        if not pattern:
            literal = options.get("topic")
            if not literal:
                raise ValueError("pulsarlite requires option topicsPattern (or topic)")
            # `topic` is the connector's LITERAL-name option — Pulsar names
            # legally contain regex metachars ('.', '+'), so escape before
            # compiling; only topicsPattern is a user regex.
            pattern = re.escape(literal)
        # Java-regex option; anchored full-match like the connector.
        self.pattern = re.compile(pattern)
        self.starting = (options.get("startingoffsets") or "latest").lower()
        # Monotonicity guard: offsets an append-only log has reported can
        # never regress (a regressed end offset would re-deliver committed
        # bytes on the next batch, breaking effective exactly-once).
        self._watermarks: dict[str, int] = {}

    def _topics(self) -> list[str]:
        """Subscribed topics: the pattern (or literal name) matches BASE
        topic names, exactly like Pulsar's regex consumer — a matched
        partitioned topic fans in to all its internal ``-partition-i``
        topics (whose names then surface in ``__topic``). A pattern may
        also address one specific partition topic directly."""
        out = {t for t in _list_topics(self.root) if self.pattern.fullmatch(t)}
        if os.path.isdir(self.root):
            for f in os.listdir(self.root):
                if not f.endswith(_PARTITIONS_EXT):
                    continue
                base = unquote(f[: -len(_PARTITIONS_EXT)])
                if self.pattern.fullmatch(base):
                    n = topic_partitions(self.root, base)
                    out.update(
                        _PARTITION_FMT.format(topic=base, i=i) for i in range(n)
                    )
        return sorted(out)

    def _snapshot(self) -> dict[str, int]:
        snap = {}
        for t in self._topics():
            size = _complete_size(_topic_log(self.root, t))
            size = max(size, self._watermarks.get(t, 0))
            self._watermarks[t] = size
            snap[t] = size
        return snap

    def initialOffset(self) -> dict:
        return self._snapshot() if self.starting == "latest" else {}

    def latestOffset(self) -> dict:
        return self._snapshot()

    def partitions(self, start: dict, end: dict) -> list[TopicSlice]:
        out = []
        for topic, hi in end.items():
            lo = int(start.get(topic, 0))
            if hi > lo:
                out.append(TopicSlice(_topic_log(self.root, topic), topic, lo, int(hi)))
        return out

    def read(self, partition: TopicSlice) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            chunk = f.read(partition.end - partition.start)
        for line in chunk.decode("ascii").splitlines():
            if not line:
                continue
            key, us, value = decode_message(line)
            # yield the AWARE instant: a naive datetime would be
            # reinterpreted in the session timezone, skewing __publishTime
            # by the zone offset on any non-UTC session
            ts = dt.datetime.fromtimestamp(us / 1_000_000, tz=dt.timezone.utc)
            yield (key, partition.topic, ts, value)

    def commit(self, end: dict) -> None:  # broker keeps the full log (replayable)
        pass


class PulsarLiteBatchReader(DataSourceReader):
    """Batch (backfill) read of whole topics — the `spark.read` twin of the
    stream reader, for replaying a topic's full history into a batch job
    (the reference re-reads its Pulsar topics the same way for offline
    analysis). One partition per topic; decode on executors."""

    def __init__(self, options: dict):
        self._stream = PulsarLiteStreamReader(options)

    def partitions(self) -> list[TopicSlice]:
        return self._stream.partitions({}, self._stream.latestOffset())

    def read(self, partition: TopicSlice) -> Iterator[tuple]:
        return self._stream.read(partition)


@dataclasses.dataclass
class StagedPart(WriterCommitMessage):
    """One task's staged parts: ``parts`` is a tuple of
    (part_path, n_rows, dest_topic) — one entry per routed destination
    (exactly one for a plain topic; up to n_partitions for a partitioned
    topic's round-robin router)."""

    parts: tuple = ()


class PulsarLiteStreamWriter(DataSourceStreamWriter):
    """Producer with staged parts + atomic driver-side commit.

    Executors append encoded rows to per-task part files (no broker
    contention); ``commit`` concatenates the parts into the topic log(s)
    in one pass and records the epoch id in ``<topic>.commits`` — a
    replayed epoch (restart between commit and checkpoint advance) is
    detected there and skipped, so delivery is effectively exactly-once.

    Partitioned topics (DIPA_Controller.py:74-80 — SURVEY A7): when the
    target topic has partition metadata, each task runs Pulsar's
    ``RoundRobinPartition`` message router — keyless messages round-robin
    across the N internal partition topics; keyed messages hash their key
    to a fixed partition (so per-key order is per-partition order, as on
    the real broker). ``SinglePartition`` mode sends every keyless
    message of this producer to one partition. One staged part per
    (task, routed partition); the epoch commit appends each to its own
    partition log under the ONE base-topic marker, so a fully-replayed
    epoch is skipped across all partitions — effectively exactly-once
    absent a crash INSIDE the commit itself (a failure between the
    individual partition-log appends and the marker write re-appends the
    already-written partitions on replay; the marker-after-append window
    of the single-log sink, multiplied across N logs).
    """

    def __init__(self, options: dict):
        url = options.get("service.url")
        topic = options.get("topic")
        if not url or not topic:
            raise ValueError("pulsarlite sink requires options service.url and topic")
        self.root = broker_dir(url)
        self.topic = topic
        self.codec = (
            options.get("pulsar.producer.compressiontype") or "none"
        ).lower()
        if self.codec not in ("none", "zlib"):
            raise ValueError(f"unsupported compressionType {self.codec!r}")
        self.routing = (
            options.get("pulsar.producer.messageroutingmode")
            or "roundrobinpartition"
        ).lower()
        if self.routing not in ("roundrobinpartition", "singlepartition"):
            raise ValueError(f"unsupported messageRoutingMode {self.routing!r}")
        # Partition metadata is resolved ONCE at producer build (driver),
        # like the Pulsar client's partitioned-metadata lookup.
        self.n_partitions = topic_partitions(self.root, topic)
        self.staging = os.path.join(self.root, "_staging")

    def _route(self, key: str | None, rr: int) -> str:
        """Destination topic for one message — Pulsar router semantics."""
        if self.n_partitions <= 0:
            return self.topic
        if key is not None:
            # keyed: stable hash → fixed partition (per-key ordering)
            i = zlib.crc32(key.encode("utf-8")) % self.n_partitions
        elif self.routing == "singlepartition":
            # one partition per producer; derived from the topic so the
            # loopback broker stays deterministic (a real client picks
            # randomly per producer instance)
            i = zlib.crc32(self.topic.encode("utf-8")) % self.n_partitions
        else:
            i = rr % self.n_partitions
        return _PARTITION_FMT.format(topic=self.topic, i=i)

    def write(self, iterator) -> StagedPart:
        os.makedirs(self.staging, exist_ok=True)
        files: dict[str, object] = {}
        counts: dict[str, int] = {}
        paths: dict[str, str] = {}
        n = 0
        now_us = int(time.time() * 1_000_000)
        try:
            for row in iterator:
                value = row["value"]
                key = row["__key"] if "__key" in row else None
                dest = self._route(key, n)
                f = files.get(dest)
                if f is None:
                    paths[dest] = os.path.join(
                        self.staging, f"{uuid.uuid4().hex}.part"
                    )
                    f = files[dest] = open(paths[dest], "w", encoding="ascii")
                    counts[dest] = 0
                f.write(
                    encode_message(bytes(value), key, self.codec, now_us + n) + "\n"
                )
                counts[dest] += 1
                n += 1
        finally:
            for f in files.values():
                f.close()
        return StagedPart(tuple((paths[d], counts[d], d) for d in paths))

    def _commits_marker(self) -> str:
        return _topic_log(self.root, self.topic) + ".commits"

    def _committed(self) -> set[int]:
        try:
            with open(self._commits_marker(), encoding="ascii") as f:
                return {int(x) for x in f.read().split()}
        except OSError:
            return set()

    def commit(self, messages, batchId: int) -> None:
        parts = [
            (path, n, topic)
            for m in messages
            if m is not None
            for (path, n, topic) in m.parts
            if n > 0
        ]
        if batchId not in self._committed():
            by_topic: dict[str, list[str]] = {}
            for path, _, topic in parts:
                with open(path, encoding="ascii") as f:
                    by_topic.setdefault(topic or self.topic, []).append(f.read())
            for topic, blobs in sorted(by_topic.items()):
                with open(_topic_log(self.root, topic), "a", encoding="ascii") as f:
                    f.write("".join(blobs))
            with open(self._commits_marker(), "a", encoding="ascii") as f:
                f.write(f"{batchId}\n")
        for path, _, _ in parts:
            try:
                os.remove(path)
            except OSError:
                pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                for path, _, _ in m.parts:
                    try:
                        os.remove(path)
                    except OSError:
                        pass


class PulsarLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> PulsarLiteBatchReader:
        return PulsarLiteBatchReader(self.options)

    def streamReader(self, schema: StructType) -> PulsarLiteStreamReader:
        return PulsarLiteStreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> PulsarLiteStreamWriter:
        return PulsarLiteStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the ``pulsarlite`` format on a session."""
    spark.dataSource.register(PulsarLiteDataSource)
