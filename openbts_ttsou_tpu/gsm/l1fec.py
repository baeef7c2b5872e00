"""Per-channel L1 FEC codecs: XCCH, RACH, SCH, TCH/FS.

Reference behavior: `GSM/GSML1FEC.{h,cpp}` — XCCHL1Encoder/Decoder
(GSML1FEC.cpp:530-860), RACHL1Decoder (:440-513), SCHL1Encoder
(:880-925), TCHFACCHL1Encoder/Decoder (:998-1405). These compose the
`gsm.fec` primitives into the full GSM 05.03 channel-coding chains.

Everything is functional and batched over leading axes; the reference's
threaded encoder/decoder objects become pure `*_encode`/`*_decode`
functions plus the TDMA pacing data in `gsm.tdma`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from openbts_ttsou_tpu.gsm import fec
from openbts_ttsou_tpu.utils import constants as C

Array = jax.Array


def lsb8msb(bits: Array) -> Array:
    """Reverse bit order within each full byte; trailing partial byte is
    left alone (BitVector::LSB8MSB, BitVector.cpp:189-196). Used at the
    L2↔L1 boundary: GSM transmits octets LSB-first."""
    bits = jnp.asarray(bits)
    n = bits.shape[-1]
    n8 = 8 * (n // 8)
    head = bits[..., :n8]
    rev = jnp.flip(head.reshape(bits.shape[:-1] + (n // 8, 8)), axis=-1)
    return jnp.concatenate(
        [rev.reshape(bits.shape[:-1] + (n8,)), bits[..., n8:]], axis=-1)


def pack_field(vals, widths):
    """Pack integer fields MSB-first into a bit array
    (BitVector::writeField semantics). vals: list of [..., ] int arrays."""
    planes = []
    for v, w in zip(vals, widths):
        v = jnp.asarray(v, jnp.int32)
        shifts = jnp.arange(w - 1, -1, -1)
        planes.append(((v[..., None] >> shifts) & 1).astype(jnp.uint8))
    return jnp.concatenate(planes, axis=-1)


def unpack_field(bits: Array, pos: int, width: int) -> Array:
    """Read an MSB-first integer field (BitVector::peekField)."""
    bits = jnp.asarray(bits).astype(jnp.int32)
    seg = bits[..., pos : pos + width]
    weights = (1 << jnp.arange(width - 1, -1, -1)).astype(jnp.int32)
    return jnp.sum(seg * weights, axis=-1)


# ---------------------------------------------------------------------------
# XCCH (SDCCH / SACCH / FACCH / BCCH / CCCH data part): GSM 05.03 4.1
# ---------------------------------------------------------------------------

def xcch_encode(frames: Array,
                stealing: tuple[int, int] = (1, 1),
                tsc: int | None = None) -> Array:
    """184-bit L1 frame → 4 bursts [..., 4, 148]
    (XCCHL1Encoder::encode + interleave + transmit,
    GSML1FEC.cpp:795-849). Input must already be in air bit order
    (callers apply `lsb8msb` to L2 octet frames)."""
    frames = jnp.asarray(frames, jnp.uint8)
    p = fec.parity_word(frames, fec.FIRECODE_XCCH)
    tail = jnp.zeros(frames.shape[:-1] + (4,), jnp.uint8)
    u = jnp.concatenate([frames, p, tail], axis=-1)  # [..., 228]
    c = fec.conv_encode(u)  # [..., 456]
    i = fec.interleave(c, fec.xcch_interleave_map(), 4)
    return fec.map_to_burst(i, stealing, tsc=tsc)


def xcch_decode_coded(c_soft: Array) -> tuple[Array, Array]:
    """456 deinterleaved soft coded bits → (frame [..., 184] air-order,
    ok [...]): the Viterbi + FireCode tail of XCCHL1Decoder::decode
    (GSML1FEC.cpp:632-655). Also the FACCH frame decoder — FACCH is
    XCCH coding on the TCH's stolen 8-burst diagonal."""
    u = fec.viterbi_decode(jnp.asarray(c_soft, jnp.float32))  # [..., 228]
    ok = fec.syndrome_ok(u[..., :224], fec.FIRECODE_XCCH)
    return u[..., :184], ok


def xcch_decode(soft_bursts: Array) -> tuple[Array, Array]:
    """4 soft bursts [..., 4, 148] (or payloads [..., 4, 114]) →
    (frames [..., 184], ok [...]) (XCCHL1Decoder::processBurst +
    deinterleave + decode, GSML1FEC.cpp:572-655)."""
    soft_bursts = jnp.asarray(soft_bursts, jnp.float32)
    if soft_bursts.shape[-1] == 148:
        payload, _ = fec.unmap_from_burst(soft_bursts)
    else:
        payload = soft_bursts
    c = fec.deinterleave(payload, fec.xcch_interleave_map())
    return xcch_decode_coded(c)


# ---------------------------------------------------------------------------
# RACH: GSM 05.03 4.6
# ---------------------------------------------------------------------------

def rach_encode(ra: Array, bsic: Array) -> Array:
    """RA byte(s) → 36 coded bits [..., 36] (the MS-side inverse of
    RACHL1Decoder, for tests/loopback)."""
    ra_bits = pack_field([jnp.asarray(ra)], [8])
    d = lsb8msb(ra_bits)  # transmitted bit order
    parity = fec.parity_word(d, fec.PARITY_RACH, invert=True)
    # parity is additionally XOR'd with the BSIC "color" (GSM 05.03 4.6)
    bsic_bits = pack_field([jnp.asarray(bsic)], [6])
    parity = parity ^ bsic_bits
    tail = jnp.zeros(d.shape[:-1] + (4,), jnp.uint8)
    u = jnp.concatenate([d, parity, tail], axis=-1)  # [..., 18]
    return fec.conv_encode(u)


def rach_decode(soft: Array, bsic: int) -> tuple[Array, Array]:
    """36 soft bits (burst bits 49..85) → (RA [...], ok [...])
    (RACHL1Decoder::writeLowSide, GSML1FEC.cpp:474-513): Viterbi, zero
    tail check, 6-bit parity XOR BSIC check, LSB8MSB → RA."""
    u = fec.viterbi_decode(jnp.asarray(soft, jnp.float32))  # [..., 18]
    tail_ok = unpack_field(u, 14, 4) == 0
    sent_parity = (~unpack_field(u, 8, 6)) & 0x3F
    d = u[..., :8]
    calc = fec.parity_word(d, fec.PARITY_RACH, invert=False)
    calc_parity = unpack_field(calc, 0, 6)
    ok = tail_ok & ((sent_parity ^ calc_parity) == bsic)
    ra = unpack_field(lsb8msb(d), 0, 8)
    return ra, ok


# RACH burst geometry: synch sequence at bits 8..48, data at 49..84
# (RACHL1Decoder reads segment(49,36), GSML1FEC.cpp:478)
RACH_DATA_START = 49


# ---------------------------------------------------------------------------
# SCH: GSM 05.03 4.7
# ---------------------------------------------------------------------------

def sch_pack(bsic: Array, t1: Array, t2: Array, t3p: Array) -> Array:
    """Pack the 25-bit SCH payload (GSM 04.08 9.1.30 + LSB8MSB,
    SCHL1Encoder::generate, GSML1FEC.cpp:898-905)."""
    d = pack_field([bsic, t1, t2, t3p], [6, 11, 5, 3])
    return lsb8msb(d)


def sch_encode(bsic: Array, t1: Array, t2: Array, t3p: Array) -> Array:
    """SCH burst bits [..., 148]: coded halves at 3..41/106..144 with the
    64-bit extended training sequence at 42..105
    (GSML1FEC.cpp:880-925)."""
    d = sch_pack(bsic, t1, t2, t3p)
    p = fec.parity_word(d, fec.PARITY_SCH)
    tail = jnp.zeros(d.shape[:-1] + (4,), jnp.uint8)
    u = jnp.concatenate([d, p, tail], axis=-1)  # [..., 39]
    e = fec.conv_encode(u)  # [..., 78]
    burst = jnp.zeros(d.shape[:-1] + (148,), jnp.uint8)
    burst = burst.at[..., 3:42].set(e[..., :39])
    burst = burst.at[..., 106:145].set(e[..., 39:])
    burst = burst.at[..., 42:106].set(
        jnp.asarray(C.SCH_SYNCH_SEQUENCE, jnp.uint8))
    return burst


def sch_decode(soft_burst: Array) -> tuple[dict, Array]:
    """SCH burst soft bits → ({bsic, t1, t2, t3p}, ok)."""
    soft_burst = jnp.asarray(soft_burst, jnp.float32)
    e = jnp.concatenate(
        [soft_burst[..., 3:42], soft_burst[..., 106:145]], axis=-1)
    u = fec.viterbi_decode(e)  # [..., 39]
    ok = fec.syndrome_ok(u[..., :35], fec.PARITY_SCH) & \
        (unpack_field(u, 35, 4) == 0)
    d = lsb8msb(u[..., :25])
    fields = {
        "bsic": unpack_field(d, 0, 6),
        "t1": unpack_field(d, 6, 11),
        "t2": unpack_field(d, 17, 5),
        "t3p": unpack_field(d, 22, 3),
    }
    return fields, ok


# ---------------------------------------------------------------------------
# TCH/FS: GSM 05.03 3.1
# ---------------------------------------------------------------------------

_TCH_K = np.arange(91)


def tch_encode(d: Array) -> Array:
    """260-bit vocoder frame (coder order) → 456 coded bits
    (TCHFACCHL1Encoder::encodeTCH, GSML1FEC.cpp:1280-1310)."""
    d = jnp.asarray(d, jnp.uint8)
    lead = d.shape[:-1]
    u = jnp.zeros(lead + (189,), jnp.uint8)
    u = u.at[..., _TCH_K].set(d[..., 2 * _TCH_K])
    u = u.at[..., 184 - _TCH_K].set(d[..., 2 * _TCH_K + 1])
    p = fec.parity_word(d[..., :50], fec.PARITY_TCH)
    u = u.at[..., 91:94].set(p)
    c1 = fec.conv_encode(u)  # [..., 378]
    return jnp.concatenate([c1, d[..., 182:260]], axis=-1)  # [..., 456]


def tch_decode(c_soft: Array) -> tuple[Array, Array]:
    """456 soft bits → (d [..., 260] coder-order vocoder frame, good)
    (TCHFACCHL1Decoder::decodeTCH, GSML1FEC.cpp:1125-1175)."""
    c_soft = jnp.asarray(c_soft, jnp.float32)
    u = fec.viterbi_decode(c_soft[..., :378])  # [..., 189]
    lead = u.shape[:-1]
    d = jnp.zeros(lead + (260,), jnp.uint8)
    d = d.at[..., 2 * _TCH_K].set(u[..., _TCH_K])
    d = d.at[..., 2 * _TCH_K + 1].set(u[..., 184 - _TCH_K])
    d = d.at[..., 182:260].set((c_soft[..., 378:] > 0.5).astype(jnp.uint8))
    sent_parity = (~unpack_field(u, 91, 3)) & 0x7
    calc = fec.parity_word(d[..., :50], fec.PARITY_TCH, invert=False)
    calc_parity = unpack_field(calc, 0, 3)
    good = (sent_parity == calc_parity) & (unpack_field(u, 185, 4) == 0)
    return d, good


# ---------------------------------------------------------------------------
# TCH/FS + FACCH windowed downlink encoder (device-resident)
# ---------------------------------------------------------------------------

class TchTxCarry:
    """Cross-window diagonal-interleaver carry for the fused TCH
    downlink (the encoder's persistent mI[]/mPreviousFACCH,
    GSML1FEC.cpp:1380-1393): the interleaved rows of the last two
    dispatched coded blocks plus their FACCH flags, per burst lane."""

    @staticmethod
    def zeros(n: int):
        z = jnp.zeros((n, 8, 114), jnp.uint8)
        f = jnp.zeros((n,), bool)
        return (z, z, f, f)  # (i_prev, i_cur, facch_prev, facch_cur)


def _tch_tx_tables(frames: int) -> tuple[np.ndarray, ...]:
    """Static per-window-phase geometry for the TCH/F downlink
    dispatcher. The diagonal has a relational form: coded bit k of
    dispatch block g lands in global burst 4g + k%8 (even interleaver
    columns from the current block, odd from the previous — GSM 05.03
    3.1.3), so each window needs only the indices below.

    Returns, each indexed by phase p = fn0 % 26:
      blk  [26, frames]  block index d per frame into the window's
                         block list [prev, cur, new0, new1, ...]
                         (−1 where the frame is not a TCH burst);
      pos  [26, frames]  burst position b = B % 4 within its block;
      nd   [26]          number of NEW dispatch blocks in the window.
    """
    from openbts_ttsou_tpu.gsm.tdma import FACCH_TCHF

    rev = FACCH_TCHF.reverse_map()  # [26], −1 on SACCH/idle
    blk = np.full((26, frames), -1, np.int32)
    pos = np.zeros((26, frames), np.int32)
    nd = np.zeros(26, np.int32)
    for p in range(26):
        d = 1  # carried current block until the first new dispatch
        dcount = 0
        for f in range(frames):
            b8 = int(rev[(p + f) % 26])
            if b8 < 0:
                continue
            b = b8 % 4
            if b == 0:  # a new half-block dispatch starts here
                d = 2 + dcount
                dcount += 1
            blk[p, f] = d
            pos[p, f] = b
        nd[p] = dcount
    return blk, pos, nd


def tch_tx_window(speech: Array, speech_valid: Array, facch: Array,
                  facch_valid: Array, carry, fn0: Array, frames: int
                  ) -> tuple[Array, Array, Array, tuple]:
    """Encode one window of TCH/FS + FACCH downlink for N burst lanes
    in a single batched program (TCHFACCHL1Encoder::sendFrame/dispatch
    + interleave, GSML1FEC.cpp:1310-1393, re-derived for windowed
    batching: no sequential dispatch loop, no mutable diagonal
    buffer).

    speech [G, N, 260] coder-order vocoder frames, speech_valid
    [G, N]; facch [G, N, 184] air-order FACCH frames, facch_valid
    [G, N] (FACCH steals the dispatch — the encoder's priority,
    GSML1FEC.cpp:1325-1340; silence filler when neither is valid);
    carry from `TchTxCarry.zeros(N)` or a previous window; fn0 []
    int32 window-start FN (same frame origin as the uplink decoder's
    tables). G must be ≥ the MAX dispatch count over phases (3 for
    frames=13; checked); extra entries are coded but never dispatched
    and do not enter the carry.

    Returns (bits [frames, N, 148] uint8 with zeroed midamble — the
    caller stamps the TSC like downlink_block_encoded —, is_burst
    [frames, N] bool (False on SACCH/idle frames), stealing Hu flag
    handled inside, new_carry)."""
    i_prev, i_cur, f_prev, f_cur = carry
    n = i_prev.shape[0]
    g = speech.shape[0]
    blk_t, pos_t, nd_t = _tch_tx_tables(frames)
    if g < int(nd_t.max()):
        raise ValueError(f"G={g} < max dispatch count {int(nd_t.max())}"
                         f" for frames={frames}")
    p26 = fn0 % 26
    blk = jax.lax.dynamic_index_in_dim(jnp.asarray(blk_t), p26, 0,
                                       keepdims=False)  # [frames]
    pos = jax.lax.dynamic_index_in_dim(jnp.asarray(pos_t), p26, 0,
                                       keepdims=False)
    ndp = jax.lax.dynamic_index_in_dim(jnp.asarray(nd_t), p26, 0,
                                       keepdims=False)  # [] dispatches

    # code every dispatch's content in one batch: FACCH > speech > fill
    c_facch = _facch_coded(facch)  # [G, N, 456]
    c_speech = tch_encode(speech)  # [G, N, 456]
    use_f = facch_valid[..., None]
    use_s = (~facch_valid & speech_valid)[..., None]
    coded = jnp.where(use_f, c_facch,
                      jnp.where(use_s, c_speech,
                                jnp.zeros_like(c_speech)))
    i_new = fec.interleave(coded, fec.tch_interleave_map(0), 8)
    # block list: [prev, cur, new...] → [2+G, N, 8, 114]
    blocks = jnp.concatenate([i_prev[None], i_cur[None], i_new], axis=0)
    flags = jnp.concatenate([f_prev[None], f_cur[None], facch_valid],
                            axis=0)

    # per-frame gather: burst(d, b) = blocks[d][:, b] (even columns)
    #                               + blocks[d-1][:, 4+b] (odd columns)
    dtot = 2 + g
    rows = jnp.moveaxis(blocks, 2, 1).reshape(dtot * 8, n, 114)
    safe_blk = jnp.maximum(blk, 1)  # −1 rows masked by is_burst below
    cur_rows = jnp.take(rows, safe_blk * 8 + pos, axis=0)
    prv_rows = jnp.take(rows, (safe_blk - 1) * 8 + 4 + pos, axis=0)
    i114 = cur_rows + prv_rows  # disjoint even/odd columns
    hu = jnp.take(flags, safe_blk, axis=0)  # [frames, N]
    hl = jnp.take(flags, safe_blk - 1, axis=0)
    bits = fec.map_to_burst(i114, stealing=(0, 0), tsc=None)
    bits = bits.at[..., 60].set(hl.astype(jnp.uint8))
    bits = bits.at[..., 87].set(hu.astype(jnp.uint8))
    is_burst = blk >= 0  # [frames]
    is_burst = jnp.broadcast_to(is_burst[:, None], (frames, n))

    # carry out: the last two DISPATCHED blocks of the window's list —
    # list indices nd and 1+nd (new block k sits at index 2+k, so the
    # last dispatch is 2+(nd−1)). Indexed from the phase's dispatch
    # count, NOT from G: with G > nd the tail entries of `blocks` were
    # coded but never dispatched and must not enter the carry.
    new_carry = (jnp.take(blocks, ndp, axis=0),
                 jnp.take(blocks, 1 + ndp, axis=0),
                 jnp.take(flags, ndp, axis=0),
                 jnp.take(flags, 1 + ndp, axis=0))
    return bits, is_burst, hu, new_carry


def _facch_coded(frames184: Array) -> Array:
    """184-bit air-order FACCH frame → 456 coded bits (the XCCH coding
    chain without interleave/mapping — FACCH shares it,
    GSML1FEC.cpp:795-808)."""
    frames184 = jnp.asarray(frames184, jnp.uint8)
    p = fec.parity_word(frames184, fec.FIRECODE_XCCH)
    tail = jnp.zeros(frames184.shape[:-1] + (4,), jnp.uint8)
    u = jnp.concatenate([frames184, p, tail], axis=-1)
    return fec.conv_encode(u)
