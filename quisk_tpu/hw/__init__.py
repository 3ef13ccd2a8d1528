"""Hardware control plugins.

Parity: the reference's per-radio control plane — a ``Hardware`` class with
a fixed API instantiated from config (quisk_hardware_model.py:17-150,
chosen at quisk.py:3863-3883) plus per-radio implementations (hiqsdr/,
hermes/, softrock/, …).  Here the same plugin concept with a registry:
config names a hardware key, the framework instantiates it, and the sample
plane (quisk_tpu.io.native framing + ring buffers) is shared.
"""

from quisk_tpu.hw.base import (FileHardware, Hardware, SimHardware,
                               get_hardware, register_hardware)
from quisk_tpu.hw.afedri import AfedriHardware
from quisk_tpu.hw.fifisdr import FifiSdrHardware
from quisk_tpu.hw.hamlib_hw import HamlibHardware
from quisk_tpu.hw.hermes import HermesControl, HermesHardware
from quisk_tpu.hw.hiqsdr import HiqsdrControl, HiqsdrHardware
from quisk_tpu.hw.hl2_oob import HermesLite2OOBHardware
from quisk_tpu.hw.multus import MultusHardware
from quisk_tpu.hw.perseus import PerseusHardware
from quisk_tpu.hw.sdr8600 import Sdr8600Hardware
from quisk_tpu.hw.sdriq import SdriqHardware
from quisk_tpu.hw.sdrmicron import MicronFramer, SdrMicronHardware
from quisk_tpu.hw.soapy import SoapyHardware
from quisk_tpu.hw.softrock import SoftrockHardware
from quisk_tpu.hw.wideband import WidebandHardware

__all__ = [
    "Hardware", "FileHardware", "SimHardware",
    "register_hardware", "get_hardware",
    "HiqsdrControl", "HiqsdrHardware", "HermesControl", "HermesHardware",
    "SoftrockHardware", "SdriqHardware", "SdrMicronHardware",
    "MicronFramer", "MultusHardware", "FifiSdrHardware",
    "Sdr8600Hardware", "HamlibHardware", "HermesLite2OOBHardware",
    "AfedriHardware", "PerseusHardware", "SoapyHardware",
]
