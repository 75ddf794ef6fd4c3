"""HTTP feed source connector — the spec's consumer protocol as a Spark
data source (PySpark Python DataSource API, Spark 4.x).

Implements the client side of the HTTP Feeds specification
(/root/reference/README.md):

- GET the endpoint; response is ``application/cloudevents-batch+json`` — a
  JSON array of CloudEvents objects (README.md:10-11, example :20-66).
- Scroll with ``lastEventId`` — the id of the last processed event; the
  server returns only strictly-newer events (README.md:12, :71-77, :300).
- An empty array signals the feed end (README.md:79-82).
- Long polling: pass ``timeout`` ms; the server holds the connection until
  events arrive or the timeout lapses (README.md:118-146, :301).
- The client must persist ``lastEventId`` (README.md:111) — here that IS
  the Structured Streaming offset, persisted in the checkpoint; delivery
  is at-least-once (README.md:113), matching Spark's semantics exactly.

Streaming: ``SimpleDataSourceStreamReader`` — the driver polls one batch
per micro-batch trigger (offset = {"lastEventId": ...}). Feed consumption
is inherently a serial cursor walk (each request needs the previous
response's last id), so a single-reader poll loop is the correct topology;
*scale-out happens downstream* — the moment rows land they are repartition-
distributed for parse/compaction/aggregation across the cluster, and bulk
bootstrap should replay the Parquet landing zone (A1 batch path), not HTTP.

Batch: ``DataSourceReader`` paginates the whole feed to its end — intended
for tests and small bootstraps (one partition; see above).

No third-party HTTP client: stdlib urllib keeps the source dependency-free.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from http_feeds_spark.schema import WIRE_ENVELOPE

FIELDS = [f.name for f in WIRE_ENVELOPE.fields]


def _parse_time(v: str | None):
    if v is None:
        return None
    # ISO 8601 UTC per README.md:312; tolerate 'Z' suffix and no-fraction
    try:
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _event_to_row(e: dict) -> tuple:
    data = e.get("data")
    if data is not None and not isinstance(data, str):
        data = json.dumps(data, separators=(",", ":"), sort_keys=True)
    return (
        e.get("specversion", "1.0"),
        e["id"],
        e.get("type", ""),
        e.get("source", ""),
        _parse_time(e.get("time")),
        e.get("subject"),
        e.get("method"),
        e.get("datacontenttype"),
        data,
    )


def fetch_batch(url: str, last_event_id: str | None, timeout_ms: int | None,
                max_wait_s: float = 30.0) -> list[dict]:
    """One GET against the feed endpoint (README.md:69-82)."""
    params = {}
    if last_event_id is not None:
        params["lastEventId"] = last_event_id
    if timeout_ms is not None:
        params["timeout"] = str(timeout_ms)
    full = url + ("?" + urllib.parse.urlencode(params) if params else "")
    req = urllib.request.Request(full, headers={"Accept": "application/cloudevents-batch+json"})
    with urllib.request.urlopen(req, timeout=max_wait_s) as resp:
        body = resp.read()
    events = json.loads(body)
    if not isinstance(events, list):
        raise ValueError(f"feed endpoint returned non-array body: {body[:200]!r}")
    return events


class HttpFeedStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offset dict = {"lastEventId": str|None}.

    Spark persists the returned offset in the streaming checkpoint —
    fulfilling the spec's "client must persist the lastEventId"
    (README.md:111). ``readBetweenOffsets`` replays a window after restart
    (at-least-once, README.md:113).
    """

    def __init__(self, options: dict):
        self.url = options["url"]
        if not self.url.startswith(("http://", "https://")):
            raise ValueError("httpfeed: option 'url' must be an http(s) URL")
        self.timeout_ms = int(options["timeout"]) if "timeout" in options else None
        self.start_from = options.get("lasteventid")  # resume override

    def initialOffset(self) -> dict:
        # absent/null lastEventId = start from the beginning (README.md:300)
        return {"lastEventId": self.start_from}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        cursor = start.get("lastEventId")
        events = fetch_batch(self.url, cursor, self.timeout_ms)
        if not events:  # empty array = end of feed for now (README.md:82)
            return iter([]), start
        rows = [_event_to_row(e) for e in events]
        next_off = {"lastEventId": events[-1]["id"]}
        return iter(rows), next_off

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Replay for recovery: walk the cursor from start to end. The
        # server honors the position even if the cursor event was deleted
        # (README.md:150-154), so this is safe across compactions.
        cursor = start.get("lastEventId")
        stop = end.get("lastEventId")
        out: list[tuple] = []
        while cursor != stop:
            events = fetch_batch(self.url, cursor, None)
            if not events:
                break
            for e in events:
                out.append(_event_to_row(e))
                cursor = e["id"]
                if cursor == stop:
                    break
        return iter(out)

    def commit(self, end: dict) -> None:
        # nothing server-side to ack — the feed is a plain GET endpoint
        pass


class _WholeFeed(InputPartition):
    def __init__(self):
        super().__init__(value=0)


class HttpFeedBatchReader(DataSourceReader):
    """Bounded read: paginate from the start (or a cursor) to the feed end
    (first empty batch, README.md:79-82). Single partition by design —
    the protocol is a serial cursor walk; see module docstring."""

    def __init__(self, options: dict):
        self.url = options["url"]
        self.start_from = options.get("lasteventid")

    def partitions(self):
        return [_WholeFeed()]

    def read(self, partition) -> Iterator[tuple]:
        cursor = self.start_from
        while True:
            events = fetch_batch(self.url, cursor, None)
            if not events:
                return
            for e in events:
                yield _event_to_row(e)
            cursor = events[-1]["id"]


class HttpFeedDataSource(DataSource):
    """`spark.read/readStream.format("httpfeed").option("url", ...)`.

    Options:
      url          feed endpoint (required)
      timeout      long-poll milliseconds, passed through (README.md:301)
      lastEventId  resume cursor override (default: start of feed)
    """

    @classmethod
    def name(cls) -> str:
        return "httpfeed"

    def schema(self) -> StructType:
        return WIRE_ENVELOPE

    def simpleStreamReader(self, schema: StructType) -> HttpFeedStreamReader:
        return HttpFeedStreamReader(self.options)

    def reader(self, schema: StructType) -> HttpFeedBatchReader:
        return HttpFeedBatchReader(self.options)


def register(spark) -> None:
    """Register the source under the name 'httpfeed'."""
    spark.dataSource.register(HttpFeedDataSource)
