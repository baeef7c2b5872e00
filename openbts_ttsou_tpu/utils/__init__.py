"""Foundation utilities (reference: CommonLibs/, GSM/GSMCommon.*)."""

from openbts_ttsou_tpu.utils.gsm_time import (  # noqa: F401
    HYPERFRAME,
    Time,
    fn_delta,
    fn_compare,
)
from openbts_ttsou_tpu.utils import constants  # noqa: F401
