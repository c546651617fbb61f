# SPDX-License-Identifier: Apache-2.0
"""Failure recovery: a fatal step error fails in-flight requests with
finish_reason=error and the engine keeps serving new requests
(reference scheduler.py:2415-2489 recovery semantics)."""

import numpy as np
import pytest

from vllm_mlx_tpu.core.request import RequestStatus

from test_scheduler import (  # noqa: F401
    EOS,
    _req,
    make_scheduler,
    reference_greedy,
    run_to_completion,
    tiny_cfg,
    tiny_params,
)


def test_recover_from_error(tiny_cfg, tiny_params, rng):
    sched = make_scheduler(tiny_cfg, tiny_params)
    prompt = rng.integers(2, 128, size=10).tolist()
    sched.add_request(_req("a", prompt, max_tokens=20))
    sched.step()  # a is mid-flight

    outs = sched.recover_from_error(RuntimeError("injected"))
    assert any(
        o.request_id == "a" and o.finish_reason == "error" for o in outs
    )
    assert sched.requests["a"].status == RequestStatus.FINISHED_ERROR
    assert sched.num_running == 0
    assert sched.block_mgr.num_active_blocks == 0

    # engine continues to serve correctly after recovery
    prompt2 = rng.integers(2, 128, size=8).tolist()
    sched.add_request(_req("b", prompt2, max_tokens=6))
    outs = run_to_completion(sched)
    expected = reference_greedy(tiny_params, tiny_cfg, prompt2, 6)
    assert outs["b"].output_token_ids == expected


def test_engine_core_step_recovery(tiny_cfg, tiny_params, rng):
    """AsyncEngineCore catches step exceptions and recovers in-loop."""
    import asyncio

    from vllm_mlx_tpu.core.engine_core import AsyncEngineCore
    from vllm_mlx_tpu.core.request import Request, SamplingParams

    sched = make_scheduler(tiny_cfg, tiny_params)
    boom = {"calls": 0, "fired": False}
    orig_step = sched.step

    def flaky_step():
        boom["calls"] += 1
        # fail mid-generation of the first request (it must be RUNNING;
        # with multi-step decode bundles the request can finish within
        # two steps, so inject right after admission/prefill)
        if boom["calls"] == 2 and not boom["fired"]:
            boom["fired"] = True
            raise RuntimeError("injected step failure")
        return orig_step()

    sched.step = flaky_step

    async def go():
        core = AsyncEngineCore(sched)
        core.start()
        try:
            # request 1 dies on the injected failure
            req1 = Request(
                request_id="r1",
                prompt=rng.integers(2, 128, size=6).tolist(),
                sampling_params=SamplingParams(temperature=0, max_tokens=5),
            )
            outs1 = []
            async for out in core.stream_outputs(req1):
                outs1.append(out)
            assert outs1[-1].finish_reason == "error"
            # request 2 succeeds afterwards
            req2 = Request(
                request_id="r2",
                prompt=rng.integers(2, 128, size=6).tolist(),
                sampling_params=SamplingParams(temperature=0, max_tokens=4),
            )
            outs2 = []
            async for out in core.stream_outputs(req2):
                outs2.append(out)
            assert outs2[-1].finished
            assert outs2[-1].finish_reason in ("stop", "length")
        finally:
            core.stop()

    asyncio.run(go())
