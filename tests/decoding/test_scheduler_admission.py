"""Scheduler admission cap: max_num_seqs bounds CONCURRENT sequences
across schedule() calls, not per call (regression: without seeding the
budget with live seqs, each schedule admitted up to max_num_seqs NEW
prompts and the running set grew unboundedly — every new high-water mark
compiled a fresh decode executable)."""

from light_vllm_tpu.core.schema.engine_io import TextOnlyInputs, TextRequest
from light_vllm_tpu.decoding.config import (CacheConfig,
                                            DecodingSchedulerConfig)
from light_vllm_tpu.decoding.processor import DecodingRequestProcessor
from light_vllm_tpu.decoding.sampling_params import SamplingParams
from light_vllm_tpu.decoding.scheduler import DecodingScheduler
from light_vllm_tpu.decoding.schema import SequenceStatus


class FakeTokenizer:
    eos_token_id = 0

    def encode(self, text):
        return [1] * 8


def make_scheduler(max_num_seqs=4, max_num_batched_tokens=1024):
    sc = DecodingSchedulerConfig(
        max_num_requests=max_num_seqs,
        max_model_len=256,
        max_num_batched_tokens=max_num_batched_tokens,
        enable_chunked_prefill=False)
    cc = CacheConfig(block_size=16)
    cc.num_device_blocks = 1024
    cc.num_cpu_blocks = 64
    rp = DecodingRequestProcessor(FakeTokenizer(), cc.block_size)
    return DecodingScheduler(sc, cc, rp)


def add_request(sched, rid, n_tokens=32):
    req = TextRequest(request_id=rid, arrival_time=0.0,
                      inputs=TextOnlyInputs(
                          prompt_token_ids=list(range(2, 2 + n_tokens))),
                      params=SamplingParams(max_tokens=8, ignore_eos=True))
    sched.add_request(req)


def test_admission_respects_max_num_seqs_across_steps():
    sched = make_scheduler(max_num_seqs=4)
    for i in range(10):
        add_request(sched, f"r{i}")

    out1 = sched.schedule()
    assert 0 < len(out1.scheduled_seq_groups) <= 4
    assert len(sched.running) <= 4
    # groups stay busy until the engine frees them; clear to simulate the
    # step completing
    for s in out1.scheduled_seq_groups:
        s.seq_group.busy = False
        for seq in s.seq_group.get_seqs():
            seq.data.update_num_computed_tokens(
                seq.get_len() - seq.data.get_num_computed_tokens())

    # Second schedule: seats are full — no further admission.
    out2 = sched.schedule()
    new_ids = {s.seq_group.request_id for s in out2.scheduled_seq_groups}
    assert len(sched.running) <= 4, (
        f"running grew past max_num_seqs: {len(sched.running)}")
    # every scheduled group in step 2 is a decode of an existing group
    assert all(rid in {g.request_id for g in sched.running}
               for rid in new_ids)


def test_waiting_drains_as_seats_free():
    sched = make_scheduler(max_num_seqs=2)
    for i in range(4):
        add_request(sched, f"r{i}")
    out1 = sched.schedule()
    assert len(sched.running) == 2 and len(sched.waiting) == 2
    # finish the two running groups
    for s in out1.scheduled_seq_groups:
        g = s.seq_group
        g.busy = False
        for seq in g.get_seqs():
            seq.status = SequenceStatus.FINISHED_STOPPED
    sched.free_finished_request(out1)
    out2 = sched.schedule()
    assert len(out2.scheduled_seq_groups) == 2
    assert len(sched.running) == 2 and len(sched.waiting) == 0
