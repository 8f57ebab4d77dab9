"""Doris workload groups ([docs: workload-group; upstream:
fe/.../resource/workloadgroup/WorkloadGroup.java — capability
reference only, original implementation]) — named resource groups
with admission control.

What is REAL here: the admission gate. Each group is a concurrency
token bucket — at most ``max_concurrency`` statements of the group
execute at once; up to ``max_queue_size`` more wait, each for at most
``queue_timeout`` ms, and anything beyond that fails loudly with
upstream's "queue full" error. :meth:`PaloSession.sql` acquires a
slot for every top-level query/DML statement of the session's
current group (``SET workload_group = '...'``).

What is ACCEPTED AS METADATA: ``cpu_share`` / ``memory_limit`` are
validated and displayed but not enforced — they map to cgroup /
executor-memory controls that need a resource manager this embedded
single-JVM session does not have. On a cluster the same group
definitions would feed spark.scheduler.pool (FAIR scheduler weights)
and executor memory overhead — admission control at the FE is
engine-side in both designs.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

#: upstream defaults: effectively-unlimited concurrency, no queue
_DEFAULTS = {
    "cpu_share": "1024",
    "memory_limit": "100%",
    "max_concurrency": "2147483647",
    "max_queue_size": "0",
    "queue_timeout": "0",
}


class WorkloadGroup:
    """One named group: validated properties + the admission gate."""

    def __init__(self, name: str, props: dict | None = None):
        self.name = name.lower()
        self.props = dict(_DEFAULTS)
        self._cond = threading.Condition()
        self._running = 0
        self._waiting = 0
        if props:
            self.update(props)

    def update(self, props: dict) -> None:
        unknown = set(props) - set(_DEFAULTS)
        if unknown:
            raise ValueError(
                f"unknown workload group properties: {sorted(unknown)} "
                f"(known: {sorted(_DEFAULTS)})"
            )
        staged = dict(self.props)
        staged.update({k: str(v) for k, v in props.items()})
        if int(staged["max_concurrency"]) < 1:
            raise ValueError("max_concurrency must be >= 1")
        if int(staged["max_queue_size"]) < 0:
            raise ValueError("max_queue_size must be >= 0")
        if int(staged["queue_timeout"]) < 0:
            raise ValueError("queue_timeout must be >= 0 (milliseconds)")
        self.props = staged

    # ------------------------------------------------------- admission

    def acquire(self) -> None:
        """Take an execution slot or queue for one; raises (upstream's
        errors) when the queue is full or the wait times out."""
        limit = int(self.props["max_concurrency"])
        with self._cond:
            if self._running < limit:
                self._running += 1
                return
            if self._waiting >= int(self.props["max_queue_size"]):
                raise RuntimeError(
                    f"query queue full for workload group {self.name!r} "
                    f"(max_concurrency={limit}, "
                    f"max_queue_size={self.props['max_queue_size']})"
                )
            self._waiting += 1
            try:
                deadline = (
                    time.monotonic() + int(self.props["queue_timeout"]) / 1000.0
                )
                while self._running >= limit:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        raise RuntimeError(
                            f"query wait timeout in workload group "
                            f"{self.name!r} "
                            f"(queue_timeout={self.props['queue_timeout']} ms)"
                        )
                    self._cond.wait(remaining)
                self._running += 1
            finally:
                self._waiting -= 1

    def release(self) -> None:
        with self._cond:
            self._running -= 1
            self._cond.notify()

    @contextmanager
    def slot(self):
        self.acquire()
        try:
            yield
        finally:
            self.release()

    def show_row(self) -> tuple:
        return (
            self.name,
            self.props["cpu_share"],
            self.props["memory_limit"],
            self.props["max_concurrency"],
            self.props["max_queue_size"],
            self.props["queue_timeout"],
            self._running,
            self._waiting,
        )
