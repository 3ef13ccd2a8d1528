"""Transmit chain."""

from quisk_tpu.tx.chain import TxChain, TxChainConfig  # noqa: F401
