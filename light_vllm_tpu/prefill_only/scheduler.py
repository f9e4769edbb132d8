"""FCFS prefill-only scheduler (reference: light_vllm/prefill_only/scheduler.py:14-100).

Batches waiting requests under a (token budget, request budget); requests
longer than max_model_len are ignored (returned as finished/ignored rather
than crashing the engine).
"""

from typing import List

from light_vllm_tpu.core.scheduler import Scheduler
from light_vllm_tpu.core.schema.engine_io import Request
from light_vllm_tpu.logger import init_logger
from light_vllm_tpu.prefill_only.schema import (PrefillOnlySchedulerOutput,
                                                TextSchedulableRequest)

logger = init_logger(__name__)


class PrefillOnlySchedulingBudget:

    def __init__(self, token_budget: int, max_num_requests: int) -> None:
        self.token_budget = token_budget
        self.max_num_requests = max_num_requests
        self.num_batched_tokens = 0
        self.num_requests = 0

    def can_schedule(self, num_tokens: int) -> bool:
        return (self.num_batched_tokens + num_tokens <= self.token_budget
                and self.num_requests + 1 <= self.max_num_requests)

    def add(self, num_tokens: int) -> None:
        self.num_batched_tokens += num_tokens
        self.num_requests += 1


class PrefillOnlyScheduler(Scheduler):

    support_scheduling = ["sync_scheduling", "async_scheduling"]

    def schedule(self) -> PrefillOnlySchedulerOutput:
        budget = PrefillOnlySchedulingBudget(
            self.scheduler_config.max_num_batched_tokens,
            self.scheduler_config.max_num_requests)
        scheduled: List[TextSchedulableRequest] = []
        ignored: List[Request] = []

        while self.waiting:
            request = self.waiting[0]
            if request.request_id in self.aborted_requests:
                self.waiting.popleft()
                continue
            if not isinstance(request, TextSchedulableRequest):
                # Lazy tokenization at first scheduling
                # (reference: prefill_only/scheduler.py:77-79).
                request = self.request_processor(request)
                self.waiting[0] = request
            num_tokens = request.num_new_tokens()
            if num_tokens > self.scheduler_config.max_model_len:
                self.waiting.popleft()
                self.requests.discard(request.request_id)
                ignored.append(request)
                continue
            if not budget.can_schedule(num_tokens):
                break
            budget.add(num_tokens)
            self.waiting.popleft()
            scheduled.append(request)

        return PrefillOnlySchedulerOutput(scheduled_requests=scheduled,
                                          ignored_requests=ignored)

    def free_finished_request(self, scheduler_output=None) -> None:
        if scheduler_output is None:
            return
        for r in scheduler_output.scheduled_requests:
            self.requests.discard(r.request_id)
        for r in scheduler_output.ignored_requests:
            self.requests.discard(r.request_id)
