"""Receive chain: decimation planning and chain composition."""

from quisk_tpu.rx.planner import DecimPlan, plan_decimation  # noqa: F401
from quisk_tpu.rx.chain import RxChain, RxChainConfig  # noqa: F401
from quisk_tpu.rx.frontend import FrontConditioner  # noqa: F401
