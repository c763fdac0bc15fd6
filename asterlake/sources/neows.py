"""NASA NeoWs REST ingestion (bronze source).

Parity surface: reference ``src/etl/bronze_ingest.py:19-49`` — driver-side
GET of ``/neo/rest/v1/feed?start_date&end_date&api_key`` and verbatim JSON
persisted to bronze, one document per day.

Scale surface: a PySpark 4 **Python Data Source** (``spark.dataSource.
register``) that partitions a date range into NeoWs' 7-day request windows
and fetches them *in parallel on executors* — a backfill of years becomes a
distributed scan instead of a driver loop.

Network calls are injectable (``fetcher``) so tests run hermetically; the
default fetcher uses stdlib urllib (no extra deps in this image).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable
from datetime import date, timedelta

NEOWS_FEED_URL = "https://api.nasa.gov/neo/rest/v1/feed"
MAX_WINDOW_DAYS = 7  # NeoWs feed API hard limit per request

Fetcher = Callable[[str], dict]


def _default_fetcher(url: str) -> dict:
    with urllib.request.urlopen(url, timeout=60) as resp:  # pragma: no cover
        return json.loads(resp.read().decode("utf-8"))


def feed_url(start: date, end: date, api_key: str) -> str:
    params = urllib.parse.urlencode(
        {
            "start_date": start.isoformat(),
            "end_date": end.isoformat(),
            "api_key": api_key,
        }
    )
    return f"{NEOWS_FEED_URL}?{params}"


def date_windows(start: date, end: date) -> list[tuple[date, date]]:
    """Split [start, end] into <=7-day windows (inclusive bounds)."""
    windows = []
    cur = start
    while cur <= end:
        stop = min(cur + timedelta(days=MAX_WINDOW_DAYS - 1), end)
        windows.append((cur, stop))
        cur = stop + timedelta(days=1)
    return windows


def fetch_feed(
    start: date, end: date, api_key: str, fetcher: Fetcher | None = None
) -> dict:
    """Driver-side fetch of one <=7-day window (reference bronze_ingest.py:19-28)."""
    if (end - start).days >= MAX_WINDOW_DAYS:
        raise ValueError(f"NeoWs feed window is limited to {MAX_WINDOW_DAYS} days")
    return (fetcher or _default_fetcher)(feed_url(start, end, api_key))


def ingest_range(
    start: date,
    end: date,
    api_key: str,
    bronze_root: str,
    fetcher: Fetcher | None = None,
) -> list[str]:
    """Sequential driver-side backfill to bronze (parity path). One document
    per request window, named by its start date (reference names by 'today',
    bronze_ingest.py:43)."""
    from asterlake.sources.bronze import write_bronze_document

    paths = []
    for w_start, w_end in date_windows(start, end):
        doc = fetch_feed(w_start, w_end, api_key, fetcher)
        paths.append(write_bronze_document(bronze_root, w_start, doc))
    return paths


# ---------------------------------------------------------------------------
# Parallel executor-side source (PySpark 4 Python Data Source API)
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import surface depends on pyspark version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _WindowPartition(InputPartition):
        def __init__(self, start: str, end: str):
            self.start = start
            self.end = end

    class NeoWsDataSourceReader(DataSourceReader):
        def __init__(self, options):
            self.options = options

        def partitions(self):
            start = date.fromisoformat(self.options["start_date"])
            end = date.fromisoformat(self.options["end_date"])
            return [
                _WindowPartition(s.isoformat(), e.isoformat())
                for s, e in date_windows(start, end)
            ]

        def read(self, partition):
            # Runs on executors: each task fetches its own 7-day window.
            # fixture_dir (tests/offline): read the window's bronze document
            # from a local directory instead of the NeoWs API — exercises
            # the identical partition/read/serialize path without network.
            fixture_dir = self.options.get("fixture_dir")
            if fixture_dir:
                from asterlake.sources.bronze import bronze_path

                with open(bronze_path(fixture_dir, partition.start)) as f:
                    doc = json.load(f)
            else:
                doc = _default_fetcher(
                    feed_url(
                        date.fromisoformat(partition.start),
                        date.fromisoformat(partition.end),
                        self.options.get("api_key", "DEMO_KEY"),
                    )
                )
            yield (json.dumps(doc),)

    class NeoWsStreamReader(SimpleDataSourceStreamReader):
        """Streaming twin of the batch reader: a polling REST source.

        Offsets are calendar dates — ``{"next_date": "YYYY-MM-DD"}`` —
        the natural exactly-once cursor for a daily feed: restart from a
        checkpoint re-reads from the committed date, and
        ``readBetweenOffsets`` replays any uncommitted batch by
        re-deriving it from its date bounds alone (the fetch is a pure
        function of the date window). Each micro-batch drains every
        whole day available up to ``end_date`` (or yesterday, when
        polling live), one document row per day, so
        ``trigger(availableNow=True)`` catches up in one batch and
        stops — the bounded-backfill shape the file-source ingest in
        ``streaming/pipeline.py`` uses. The per-batch fetch is
        driver-side and document-sized; the heavy flatten runs
        distributed downstream, same as bronze.
        """

        def __init__(self, options):
            self.options = options

        def initialOffset(self):
            return {"next_date": self.options["start_date"]}

        def _end(self) -> date:
            end_opt = self.options.get("end_date")
            if end_opt:
                return date.fromisoformat(end_opt)
            # live polling: complete days only (today is still filling)
            return date.today() - timedelta(days=1)  # pragma: no cover

        def _fetch_day(self, day: date) -> dict:
            fixture_dir = self.options.get("fixture_dir")
            if fixture_dir:
                from asterlake.sources.bronze import bronze_path

                with open(bronze_path(fixture_dir, day.isoformat())) as f:
                    return json.load(f)
            return _default_fetcher(  # pragma: no cover
                feed_url(day, day, self.options.get("api_key", "DEMO_KEY"))
            )

        def _read_span(self, start: date, stop: date):
            rows = []
            day = start
            while day < stop:
                rows.append((json.dumps(self._fetch_day(day)),))
                day += timedelta(days=1)
            return rows

        def read(self, start):
            cursor = date.fromisoformat(start["next_date"])
            available = self._end() + timedelta(days=1)
            if cursor >= available:
                return [], start  # caught up: offset unchanged
            rows = self._read_span(cursor, available)
            return rows, {"next_date": available.isoformat()}

        def readBetweenOffsets(self, start, end):
            return self._read_span(
                date.fromisoformat(start["next_date"]),
                date.fromisoformat(end["next_date"]),
            )

        def commit(self, end):
            pass  # the source is external REST; nothing to clean up

    class NeoWsDataSource(DataSource):
        """spark.read.format("neows").option("start_date", ...).load()
        — or ``spark.readStream.format("neows")`` for the polling
        streaming variant (daily-date offsets, checkpoint-replayable).

        Emits one raw JSON document string per 7-day window (batch) /
        per day (streaming); downstream, parse with
        from_json(BRONZE_FEED_SCHEMA) and flatten_feed.
        """

        @classmethod
        def name(cls):
            return "neows"

        def schema(self):
            return "document string"

        def reader(self, schema):
            return NeoWsDataSourceReader(self.options)

        def simpleStreamReader(self, schema):
            return NeoWsStreamReader(self.options)

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAS_DATASOURCE_API = False
    NeoWsDataSource = None  # type: ignore[assignment]


def register_neows_source(spark) -> bool:
    """Register the parallel source if this pyspark supports it."""
    if not HAS_DATASOURCE_API:
        return False
    spark.dataSource.register(NeoWsDataSource)
    return True
