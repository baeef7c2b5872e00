"""The transceiver engine (reference: Transceiver52M/Transceiver.{h,cpp}).

The reference is a thread-per-stage state machine over one ARFCN; here
the engine is a pair of pure, jit-compiled step functions — `rx_step` /
`tx_step` — batched over `[channel, timeslot]` with all per-slot state in
an explicit functional `TrxState` pytree. Adaptive behaviors (energy
thresholds, channel aging, filler fallback) are masked vectorized
updates instead of branches.
"""

from openbts_ttsou_tpu.trx.engine import (  # noqa: F401
    ChanType,
    CorrType,
    TrxConfig,
    TrxState,
    expected_corr_type,
    init_state,
    rx_step,
    tx_step,
)
