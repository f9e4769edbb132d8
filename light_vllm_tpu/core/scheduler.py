"""Abstract scheduler: waiting deque + lazy abort bookkeeping.

Counterpart of the reference's Scheduler ABC
(reference: light_vllm/core/scheduler.py:14-84). Aborts are lazy: ids are
recorded in a set and requests are dropped when next encountered, so abort is
O(1) even with deep queues.
"""

from abc import ABC, abstractmethod
from collections import deque
from typing import Deque, Iterable, Set, Union

from light_vllm_tpu.core.schema.engine_io import Request, SchedulerOutput


class Scheduler(ABC):

    def __init__(self, scheduler_config, request_processor) -> None:
        self.scheduler_config = scheduler_config
        self.request_processor = request_processor
        self.waiting: Deque[Request] = deque()
        self.requests: Set[str] = set()
        self.aborted_requests: Set[str] = set()

    @classmethod
    def from_engine(cls, engine) -> "Scheduler":
        return cls(engine.engine_config.scheduler_config,
                   engine.request_processor)

    def add_request(self, request: Request) -> None:
        if (request.request_id in self.requests
                or request.request_id in self.aborted_requests):
            raise KeyError(f"duplicate request id {request.request_id!r}")
        self.requests.add(request.request_id)
        self.waiting.append(request)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        ids = {request_id} if isinstance(request_id, str) else set(request_id)
        self.aborted_requests.update(ids & self.requests)

    def remove_abort_request(self) -> None:
        """Drop aborted requests currently sitting in the waiting queue.

        Ids NOT in the waiting queue (running / swapped / in-flight) must
        SURVIVE in `aborted_requests` — subclass schedule() loops handle
        those lazily (decoding/scheduler.py `_abort_group`). Clearing the
        whole set here silently un-aborted any already-running request."""
        if not self.aborted_requests:
            return
        waiting_ids = {r.request_id for r in self.waiting}
        handled = self.aborted_requests & waiting_ids
        if handled:
            self.waiting = deque(r for r in self.waiting
                                 if r.request_id not in handled)
            self.requests -= handled
            self.actual_abort(handled)
            self.aborted_requests -= handled
        # Drop stale ids whose request finished before the abort landed.
        self.aborted_requests &= self.requests

    def actual_abort(self, request_ids: Set[str]) -> None:
        """Hook for subclasses to release per-request resources."""

    def has_unfinished_requests(self) -> bool:
        return len(self.requests) > 0

    def get_num_unfinished_requests(self) -> int:
        return len(self.requests)

    @abstractmethod
    def schedule(self) -> SchedulerOutput:
        ...

    def free_finished_request(self, *args, **kwargs) -> None:
        """Hook: release state of finished requests after output processing."""
