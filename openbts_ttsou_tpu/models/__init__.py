"""End-to-end pipeline models. Flagship: the multi-channel Transceiver."""

from openbts_ttsou_tpu.models.transceiver import Transceiver  # noqa: F401
