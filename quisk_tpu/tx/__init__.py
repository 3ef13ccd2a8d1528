"""Transmit chain, EER polar split, PureSignal predistortion."""

from quisk_tpu.tx.chain import TxChain, TxChainConfig  # noqa: F401
from quisk_tpu.tx.eer import EERSplitter  # noqa: F401
from quisk_tpu.tx.puresignal import Predistorter, two_tone_imd_db  # noqa: F401
