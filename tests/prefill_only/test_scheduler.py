"""PrefillOnlyScheduler batching under token/request budget (reference
pattern: tests/prefill_only/test_scheduler.py:11-61 — fake request processor
fabricates token ids, real scheduler logic)."""

import pytest

from light_vllm_tpu.core.schema.engine_io import (TextOnlyInputs, TextRequest)
from light_vllm_tpu.prefill_only.config import PrefillOnlySchedulerConfig
from light_vllm_tpu.prefill_only.scheduler import PrefillOnlyScheduler
from light_vllm_tpu.prefill_only.schema import TextSchedulableRequest


class FakeRequestProcessor:

    def __init__(self, num_tokens=10):
        self.num_tokens = num_tokens

    def __call__(self, request):
        return TextSchedulableRequest(
            request_id=request.request_id,
            inputs=TextOnlyInputs(prompt_token_ids=list(
                range(self.num_tokens))),
            params=None, arrival_time=request.arrival_time)


def _make(max_requests=4, max_len=64, token_budget=None, num_tokens=10):
    cfg = PrefillOnlySchedulerConfig(max_num_requests=max_requests,
                                     max_model_len=max_len,
                                     max_num_batched_tokens=token_budget)
    return PrefillOnlyScheduler(cfg, FakeRequestProcessor(num_tokens))


@pytest.mark.parametrize("n", [1, 3, 9])
def test_request_budget(n):
    s = _make(max_requests=4)
    for i in range(n):
        s.add_request(TextRequest(request_id=str(i)))
    out = s.schedule()
    assert len(out.scheduled_requests) == min(n, 4)


def test_token_budget():
    s = _make(max_requests=100, token_budget=35, num_tokens=10)
    for i in range(10):
        s.add_request(TextRequest(request_id=str(i)))
    out = s.schedule()
    assert len(out.scheduled_requests) == 3  # 3*10 <= 35 < 4*10


def test_too_long_requests_ignored():
    s = _make(max_len=5, num_tokens=10)
    s.add_request(TextRequest(request_id="a"))
    out = s.schedule()
    assert not out.scheduled_requests
    assert len(out.ignored_requests) == 1
    assert not s.has_unfinished_requests()


def test_drains_over_multiple_steps():
    s = _make(max_requests=2)
    for i in range(5):
        s.add_request(TextRequest(request_id=str(i)))
    seen = []
    for _ in range(3):
        out = s.schedule()
        seen += [r.request_id for r in out.scheduled_requests]
        s.free_finished_request(out)
    assert seen == ["0", "1", "2", "3", "4"]
    assert not s.has_unfinished_requests()
