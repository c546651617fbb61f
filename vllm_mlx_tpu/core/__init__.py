# SPDX-License-Identifier: Apache-2.0
"""Engine core: requests, block manager, model runner, scheduler."""

from .request import Request, RequestOutput, RequestStatus, SamplingParams  # noqa: F401
