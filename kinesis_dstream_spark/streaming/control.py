"""Control plane for streaming jobs (reference O-13, ``app/app.py``).

The reference manages pollers as OS processes over a Flask API: /start
spawns ``subprocess.Popen``, /stop is ``kill -9``, /check greps ``ps``
output (``app/app.py:62-116``). The Spark-native control plane is the
``spark.streams`` registry: queries are named, started/stopped
gracefully (draining the current micro-batch — deliberately *not* the
reference's kill -9, SURVEY §7 hard-part 5), and inspected via
``status``/``lastProgress`` instead of parsing process tables.

A thin header-auth HTTP shim (the reference's ``x-api-key`` decorator,
``app/app.py:31-52``) would wrap this class 1:1; the engine-level surface
is this API.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


class StreamingJobRegistry:
    """Named lifecycle management over ``spark.streams``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._jobs: dict[str, StreamingQuery] = {}

    def start(self, name: str, builder: Callable[[], StreamingQuery]) -> dict:
        """Start a named job (reference POST /start, ``app/app.py:62-83``).

        ``builder`` returns a started StreamingQuery (i.e. calls
        ``writeStream...start()``); double-starts are rejected instead of
        spawning duplicate pollers like the reference would.
        """
        if name in self._jobs and self._jobs[name].isActive:
            raise ValueError(f"job {name!r} is already active")
        query = builder()
        self._jobs[name] = query
        return self.status(name)

    def stop(self, name: str) -> dict:
        """Graceful stop (reference POST /stop, ``app/app.py:86-98`` —
        minus the kill -9: the current micro-batch drains first)."""
        q = self._jobs.get(name)
        if q is None:
            raise KeyError(f"unknown job {name!r}")
        if q.isActive:
            q.stop()
            q.awaitTermination(30)
        return {"name": name, "active": q.isActive}

    def status(self, name: str) -> dict:
        """Single-job status (reference POST /check, ``app/app.py:101-116``)."""
        q = self._jobs.get(name)
        if q is None:
            raise KeyError(f"unknown job {name!r}")
        return {
            "name": name,
            "id": str(q.id),
            "run_id": str(q.runId),
            "active": q.isActive,
            "status": q.status,
            "last_progress": q.lastProgress,
        }

    def check(self) -> list[dict]:
        """All registered jobs — the ``ps -A | grep`` replacement."""
        return [self.status(name) for name in sorted(self._jobs)]

    def active(self) -> list[str]:
        """Names of currently-active queries (via spark.streams)."""
        active_ids = {str(q.id) for q in self.spark.streams.active}
        return sorted(
            name for name, q in self._jobs.items() if str(q.id) in active_ids
        )
