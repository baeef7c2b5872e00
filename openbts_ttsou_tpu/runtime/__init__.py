"""Native runtime bindings (ctypes over native/libtrx_runtime.so)."""

from openbts_ttsou_tpu.runtime.native import (  # noqa: F401
    BurstQueue,
    SampleRing,
    UdpTransport,
    load_runtime,
)
