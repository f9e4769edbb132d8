"""Scheduler ABC bookkeeping invariants (reference pattern:
tests/core/test_scheduler.py — stub scheduler, add/abort/remove-abort)."""

import pytest

from light_vllm_tpu.core.scheduler import Scheduler
from light_vllm_tpu.core.schema.engine_io import Request


class SchedulerForTest(Scheduler):

    def __init__(self):
        super().__init__(scheduler_config=None, request_processor=None)

    def schedule(self):
        return None


def _req(i):
    return Request(request_id=str(i))


@pytest.mark.parametrize("n", [1, 7, 64])
def test_add_and_abort(n):
    s = SchedulerForTest()
    for i in range(n):
        s.add_request(_req(i))
    assert s.get_num_unfinished_requests() == n
    assert len(s.waiting) == n

    s.abort_request([str(i) for i in range(0, n, 2)])
    # abort is lazy until remove_abort_request
    assert len(s.waiting) == n
    s.remove_abort_request()
    assert len(s.waiting) == n - len(range(0, n, 2))
    assert s.get_num_unfinished_requests() == len(s.waiting)


def test_duplicate_request_id_raises():
    s = SchedulerForTest()
    s.add_request(_req(1))
    with pytest.raises(KeyError):
        s.add_request(_req(1))


def test_abort_unknown_id_is_noop():
    s = SchedulerForTest()
    s.add_request(_req(1))
    s.abort_request("999")
    s.remove_abort_request()
    assert s.get_num_unfinished_requests() == 1
