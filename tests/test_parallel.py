import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openbts_ttsou_tpu.ops import fir, gmsk
from openbts_ttsou_tpu.parallel import (
    exchange_halo,
    make_mesh,
    mesh_factors,
    resample_block,
    sharded_uplink_pipeline,
)
from openbts_ttsou_tpu.parallel.halo import resample_halo
from openbts_ttsou_tpu.parallel.sharded import (
    ShardedPipelineSpec,
    _slot_windows,
    state_for_shards,
)
from openbts_ttsou_tpu.trx import ChanType, TrxConfig, init_state, rx_step
from openbts_ttsou_tpu.utils import constants as C

RNG = np.random.default_rng(31)


def test_mesh_factors():
    assert mesh_factors(8) == (4, 2)
    assert mesh_factors(1) == (1, 1)
    assert mesh_factors(2) == (1, 2)
    assert mesh_factors(6) == (3, 2)


def test_exchange_halo_ring():
    mesh = make_mesh(4, axis_names=("chan", "time"))  # (2, 2)... factors
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                             ("chan", "time"))
    x = jnp.arange(40, dtype=jnp.float32).reshape(1, 40)

    def body(xl):
        return exchange_halo(xl, 3, 2, "time")

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("chan", "time"),
        out_specs=P("chan", "time")))(x)
    out = np.asarray(out).reshape(4, 15)
    # shard 1 holds samples 10..19; left halo = 7,8,9; right halo = 20,21
    np.testing.assert_array_equal(out[1], [7, 8, 9] + list(range(10, 20)) + [20, 21])
    # stream edges zero-filled
    np.testing.assert_array_equal(out[0][:3], [0, 0, 0])
    np.testing.assert_array_equal(out[3][-2:], [0, 0])


def test_resample_block_matches_full_stream():
    p, q, taps = 65, 96, 961
    lpf = fir.resampler_lpf(p, q, taps)
    halo = resample_halo(p, q, taps)
    assert halo % q == 0
    n_blocks, block = 4, 96 * 25
    x = (RNG.standard_normal(n_blocks * block)
         + 1j * RNG.standard_normal(n_blocks * block)).astype(np.complex64)
    full = np.asarray(fir.polyphase_resample(x[None], p, q, lpf))[0]
    out_block = block * p // q
    for b in range(n_blocks):
        lo = b * block - halo
        hi = (b + 1) * block + halo
        xh = np.zeros(block + 2 * halo, np.complex64)
        src_lo, src_hi = max(lo, 0), min(hi, len(x))
        xh[src_lo - lo : src_lo - lo + src_hi - src_lo] = x[src_lo:src_hi]
        got = np.asarray(resample_block(xh[None], p, q, lpf, halo, block))[0]
        want = full[b * out_block : (b + 1) * out_block]
        np.testing.assert_allclose(got, want, rtol=2e-3,
                                   atol=2e-3 * np.abs(full).max())


def normal_burst_bits(tsc=0, seed=1):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [[0, 0, 0], rng.integers(0, 2, 57), [1], C.TRAINING_SEQUENCE[tsc], [1],
         rng.integers(0, 2, 57), [0, 0, 0]]).astype(np.uint8)


def test_sharded_pipeline_matches_serial():
    """Pod-slice streaming (BASELINE config 5, scaled down): the sharded
    (chan × time) pipeline must produce the same detections and soft bits
    as the serial single-device chain."""
    mesh = make_mesh(8)  # (4, 2) on the virtual CPU mesh
    n_time = mesh.shape["time"]
    cfg = TrxConfig(n_chan=4)
    spec = ShardedPipelineSpec(n_chan_total=4, frames_per_shard=13)

    # synthesize a symbol-rate stream with bursts, then UP-sample to the
    # device rate so the pipeline's 65/96 front-end has work to do
    frames_total = n_time * spec.frames_per_shard
    sym = np.zeros((4, frames_total * 1250), np.complex64)
    planted = {}
    for c in range(4):
        for f in range(0, frames_total, 3):
            bits = normal_burst_bits(seed=100 * c + f)
            wave = 9000.0 * np.asarray(gmsk.modulate_burst(bits[None], 1))[0]
            off = f * 1250 + 157  # slot 1
            sym[c, off : off + 148] += wave
            planted[(c, f)] = bits
    dev_rate = np.asarray(fir.polyphase_resample(
        sym, 96, 65, fir.resampler_lpf(96, 65, 651)))
    dev_rate = dev_rate[:, : n_time * spec.block_in]

    chan_type = np.zeros((4, 8), np.int32)
    chan_type[:, 1] = ChanType.I
    state0 = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))

    # serial reference: full-stream resample + frame scan on one device
    sym_back = fir.polyphase_resample(
        jnp.asarray(dev_rate), 65, 96, fir.resampler_lpf(65, 96, 961))
    wins = _slot_windows(sym_back, frames_total)
    st = state0
    det_serial = []
    soft_serial = []
    for f in range(frames_total):
        st, r = rx_step(cfg, st, wins[f])
        det_serial.append(np.asarray(r.detected))
        soft_serial.append(np.asarray(r.soft_bits))
    det_serial = np.stack(det_serial)
    soft_serial = np.stack(soft_serial)

    # sharded run
    step = sharded_uplink_pipeline(mesh, cfg, spec)
    state_sh = state_for_shards(state0, n_time)
    state_sh2, res, clock = step(state_sh, jnp.asarray(dev_rate),
                                 jnp.asarray(0, jnp.int32))
    det_sh = np.asarray(res.detected)
    soft_sh = np.asarray(res.soft_bits)

    assert det_sh.shape == det_serial.shape
    assert int(clock) == n_time * spec.block_in
    # detections agree everywhere except (possibly) the stream-edge frames
    interior = np.ones(frames_total, bool)
    interior[0] = interior[-1] = False
    np.testing.assert_array_equal(det_sh[interior], det_serial[interior])
    # planted bursts are detected and demodulate to the right bits
    hits = 0
    for (c, f), bits in planted.items():
        if not interior[f]:
            continue
        assert det_sh[f, c, 1], f"missed burst chan {c} frame {f}"
        ber = np.mean((soft_sh[f, c, 1] > 0.5).astype(int) != bits)
        assert ber < 0.02, f"sharded BER {ber} at chan {c} frame {f}"
        hits += 1
    assert hits >= 12
    # soft bits match the serial chain bit-for-bit (same kernels)
    np.testing.assert_allclose(soft_sh[interior], soft_serial[interior],
                               atol=5e-3)


def test_sharded_duplex_downlink_matches_serial():
    """The time-sharded downlink leg (tx symbol-halo ring + per-shard
    96/65 resample) must emit the same device-rate stream as the serial
    full-window `downlink_block` — the tx mirror of the rx overlap-save
    identity (sendHistory, Transceiver/radioInterface.cpp:123-186)."""
    from openbts_ttsou_tpu.models.transceiver import UplinkSpec, downlink_block
    from openbts_ttsou_tpu.parallel import sharded_duplex_pipeline

    mesh = make_mesh(8)
    n_time = mesh.shape["time"]
    n = 4
    cfg = TrxConfig(n_chan=n)
    spec = ShardedPipelineSpec(n_chan_total=n, frames_per_shard=13)
    frames_total = n_time * spec.frames_per_shard

    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (frames_total, n, 8, 148)).astype(np.uint8)
    valid = rng.random((frames_total, n, 8)) < 0.6
    atten = np.zeros((frames_total, n, 8), np.float32)
    chan_type = np.full((n, 8), ChanType.I, np.int32)
    state0 = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))

    ul = np.zeros((n, n_time * spec.block_in), np.complex64)
    step = sharded_duplex_pipeline(mesh, cfg, spec)
    state_sh = state_for_shards(state0, n_time)
    _, res, tx_sh, clock = step(state_sh, jnp.asarray(ul),
                                jnp.asarray(bits), jnp.asarray(valid),
                                jnp.asarray(atten),
                                jnp.asarray(0, jnp.int32))
    tx_sh = np.asarray(tx_sh)
    assert tx_sh.shape == (n, n_time * spec.block_in)
    assert int(clock) == n_time * spec.block_in

    serial_spec = UplinkSpec(frames=frames_total)
    tx_serial = np.asarray(downlink_block(
        cfg, serial_spec, state0, jnp.asarray(bits), jnp.asarray(valid),
        jnp.asarray(atten), jnp.asarray(0, jnp.int32)))
    scale = np.abs(tx_serial).max()
    np.testing.assert_allclose(tx_sh, tx_serial, atol=2e-4 * scale)
    # the rx leg still ran (no detections on silence, state advanced)
    assert not np.asarray(res.detected).any()


def test_cross_shard_state_carry():
    """The adaptive engine state must track the serial stream across
    sharded steps (the reference's single Transceiver walks energy
    thresholds and channel state serially, Transceiver.cpp:294-356).

    Scenario: near-threshold bursts whose detectability depends on the
    accumulated threshold adaptation — slot 1 bursts open the energy
    gate only after the first quiet decrement (−10 @ frame 51), and
    slot 2 bursts (planted from frame 104, a step boundary) are
    detectable only because ~50 slot-1 hits (−1 each) have lowered the
    threshold. With carry_state the step-boundary threshold trajectory
    and every detection match the serial engine; without it each shard
    misses the other's hits and slot 2 goes undetected."""
    devs = np.asarray(jax.devices()[:2]).reshape(1, 2)
    mesh = jax.sharding.Mesh(devs, ("chan", "time"))
    n_time, F = 2, 13
    steps = 6
    frames_total = steps * n_time * F  # 156
    cfg = TrxConfig(n_chan=1)
    spec = ShardedPipelineSpec(n_chan_total=1, frames_per_shard=F)

    wave1 = np.asarray(gmsk.modulate_burst(
        normal_burst_bits(seed=5)[None], 1))[0]
    # Calibrate so the energy gate (mean power of the first 20 samples
    # of the slot window vs threshold², ops.correlate.energy_detect)
    # sees the target power AFTER the 96/65 up + 65/96 down round trip:
    # pilot-plant the burst, round-trip, measure.
    up_lpf = fir.resampler_lpf(96, 65, 651)
    down_lpf = fir.resampler_lpf(65, 96, 961)
    pilot = np.zeros((1, 13 * 1250), np.complex64)
    pilot[0, 6 * 1250 + 157: 6 * 1250 + 157 + len(wave1)] = wave1
    pilot_rt = np.asarray(fir.polyphase_resample(
        fir.polyphase_resample(jnp.asarray(pilot), 96, 65, up_lpf),
        65, 96, down_lpf))
    pw20 = np.mean(np.abs(pilot_rt[0, 6 * 1250 + 157:
                                   6 * 1250 + 157 + 20]) ** 2)
    a1 = np.sqrt(60000.0 / pw20)   # between 240² and 250²
    a2 = np.sqrt(40000.0 / pw20)   # needs threshold < 200
    sym = np.zeros((1, frames_total * 1250), np.complex64)
    for f in range(frames_total):
        off = f * 1250 + 157  # slot 1
        sym[0, off: off + len(wave1)] += a1 * wave1
        if f >= 104:  # slot 2, from a step boundary
            off2 = f * 1250 + 157 + 156
            sym[0, off2: off2 + len(wave1)] += a2 * wave1
    dev_rate = np.asarray(fir.polyphase_resample(
        jnp.asarray(sym), 96, 65, up_lpf))

    chan_type = np.zeros((1, 8), np.int32)
    chan_type[0, 1] = chan_type[0, 2] = ChanType.I
    state0 = init_state(cfg)._replace(chan_type=jnp.asarray(chan_type))

    # serial reference over the whole stream
    sym_back = fir.polyphase_resample(jnp.asarray(dev_rate), 65, 96,
                                      down_lpf)
    wins = _slot_windows(sym_back, frames_total)
    st = state0
    det_serial = []
    thr_serial = []  # threshold at each step boundary
    for f in range(frames_total):
        st, r = rx_step(cfg, st, wins[f])
        det_serial.append(np.asarray(r.detected))
        if (f + 1) % (n_time * F) == 0:
            thr_serial.append(float(np.asarray(st.energy_threshold)[0]))
    det_serial = np.stack(det_serial)  # [156, 1, 8]
    # sanity: the scenario is actually near-threshold
    assert not det_serial[:51, 0, 1].any()
    assert det_serial[52:, 0, 1].all()
    assert det_serial[104:, 0, 2].all() and not det_serial[:104, 0, 2].any()

    def run(carry):
        step = sharded_uplink_pipeline(mesh, cfg, spec,
                                       carry_state=carry)
        st_sh = state_for_shards(state0, n_time)
        dets, thrs = [], []
        block = n_time * spec.block_in
        for s in range(steps):
            x = jnp.asarray(dev_rate[:, s * block: (s + 1) * block])
            st_sh, res, _ = step(st_sh, x,
                                 jnp.asarray(s * n_time * F, jnp.int32))
            dets.append(np.asarray(res.detected))
            thrs.append(float(np.asarray(st_sh.energy_threshold)[0, 0]))
        return np.concatenate(dets), thrs

    det_carry, thr_carry = run(True)
    np.testing.assert_array_equal(det_carry, det_serial)
    np.testing.assert_allclose(thr_carry, thr_serial, atol=1e-3)

    det_nc, thr_nc = run(False)
    # without the carry the accumulated hit decrements are lost and the
    # slot-2 bursts stay below the per-shard gates
    assert det_nc[104:, 0, 2].sum() < det_serial[104:, 0, 2].sum()
    assert not np.allclose(thr_nc, thr_serial, atol=1.0)


def test_distributed_helpers_single_process():
    from openbts_ttsou_tpu.parallel import distributed

    distributed.initialize()  # no-op without a coordinator
    mesh = make_mesh(8)
    cs, ts = distributed.host_local_shard((8, 4), mesh)
    # single process owns everything
    assert cs == slice(0, 8) and ts == slice(0, 4)


def test_sharded_pipeline_exact_engine():
    mesh = make_mesh(4)
    n_time = mesh.shape["time"]
    cfg = TrxConfig(n_chan=2)
    spec = ShardedPipelineSpec(n_chan_total=2, frames_per_shard=13)
    ct = np.zeros((2, 8), np.int32)
    ct[:, 1] = ChanType.I
    state = init_state(cfg)._replace(chan_type=jnp.asarray(ct))
    sym = np.zeros((2, n_time * spec.frames_per_shard * 1250), np.complex64)
    bits = normal_burst_bits(seed=3)
    wave = 9000.0 * np.asarray(gmsk.modulate_burst(bits[None], 1))[0]
    for f in range(2, n_time * 13, 4):
        sym[:, f * 1250 + 157: f * 1250 + 157 + 148] += wave
    dev = np.asarray(fir.polyphase_resample(
        jnp.asarray(sym), 96, 65, fir.resampler_lpf(96, 65, 651)))
    dev = jnp.asarray(dev[:, : n_time * spec.block_in])
    step = sharded_uplink_pipeline(mesh, cfg, spec)
    st, res, clock = step(state_for_shards(state, n_time), dev,
                          jnp.asarray(0, jnp.int32))
    det = np.asarray(res.detected)
    hits = sum(bool(det[f, c, 1]) for f in range(2, n_time * 13 - 1, 4)
               for c in range(2))
    assert hits >= 10, hits


def test_sharded_streaming_decode_spanning_groups():
    """Time-sharded STREAMING FEC decode: TCH/FS + FACCH groups whose
    8-burst diagonals span time-SHARD boundaries (and the STEP
    boundary) decode exactly once — the soft-bit prelude rides a
    neighbor ppermute within the step and the carried prev_soft across
    steps (the reference's persistent mI[] semantics, GSML1FEC.cpp:
    572-630, 1031-1100, on the sharded path)."""
    from openbts_ttsou_tpu.gsm import l1fec, tdma
    from openbts_ttsou_tpu.models.transceiver import (
        DECODE_PRELUDE,
        UplinkSpec,
        downlink_block_tch,
    )

    mesh = make_mesh(4)  # (chan 2, time 2)
    n_time = mesh.shape["time"]
    n_chan = mesh.shape["chan"]  # 1 carrier per chan shard
    rng = np.random.default_rng(41)
    cfg = TrxConfig(n_chan=n_chan)
    uspec = UplinkSpec()
    spec = ShardedPipelineSpec(n_chan_total=n_chan, frames_per_shard=13)
    rev = tdma.FACCH_TCHF.reverse_map()
    fn0 = int(np.where(rev == 0)[0][0])
    while fn0 % 4:
        fn0 += 26
    tch_mask = np.zeros((n_chan, 8), bool)
    tch_mask[:, 2] = True
    ct = np.zeros((n_chan, 8), np.int32)
    ct[:, 2] = ChanType.I
    state = init_state(cfg)._replace(chan_type=jnp.asarray(ct))

    # generate the air stream window-by-window via the windowed TCH
    # downlink encoder (13-frame windows = one per time shard)
    n_steps = 2
    n_win = n_steps * n_time + 1  # one flush window
    sent = []
    carry = l1fec.TchTxCarry.zeros(n_chan * 8)
    xcch = jnp.zeros((3, n_chan, 8, 184), jnp.uint8)
    xv = jnp.zeros((3, n_chan, 8), bool)
    atten = jnp.zeros((13, n_chan, 8), np.float32)
    devs = []
    for w in range(n_win):
        sp = np.zeros((3, n_chan, 8, 260), np.uint8)
        spv = np.zeros((3, n_chan, 8), bool)
        fa = np.zeros((3, n_chan, 8, 184), np.uint8)
        fav = np.zeros((3, n_chan, 8), bool)
        for j in range(3 if w < n_win - 1 else 0):
            d = rng.integers(0, 2, 260).astype(np.uint8)
            sp[j, :, 2], spv[j, :, 2] = d, True
            sent.append(d)
        dev, carry = downlink_block_tch(
            cfg, uspec, state, xcch, xv, jnp.asarray(sp),
            jnp.asarray(spv), jnp.asarray(fa), jnp.asarray(fav),
            jnp.asarray(tch_mask), atten, carry,
            jnp.asarray(fn0 + 13 * w, jnp.int32))
        devs.append(np.asarray(dev) / cfg.tx_full_scale * 9000.0)
    stream = np.concatenate(devs, axis=-1)

    step = sharded_uplink_pipeline(mesh, cfg, spec, mode="decoded")
    st_sh = state_for_shards(
        state._replace(fn=jnp.asarray(fn0, jnp.int32)), n_time)
    prev = jnp.zeros((1, DECODE_PRELUDE, n_chan, 8, 148), jnp.float32)
    pvalid = jnp.asarray(False)
    got = []
    # 2 steps of n_time shards + the flush window via a final step
    # padded with silence
    pad = np.zeros((n_chan, (n_time - 1) * spec.block_in), np.complex64)
    windows = [stream[:, k * n_time * spec.block_in:
                      (k + 1) * n_time * spec.block_in]
               for k in range(n_steps)]
    windows.append(np.concatenate(
        [devs[-1] * 0 + stream[:, n_steps * n_time * spec.block_in:],
         pad], axis=-1))
    for k, win in enumerate(windows):
        fnk = fn0 + 13 * n_time * k
        st_sh = jax.tree.map(
            lambda x: x, st_sh)  # keep sharding
        st_sh, res, clock, dec = step(
            st_sh, jnp.asarray(win), jnp.asarray(fnk, jnp.int32),
            prev, pvalid)
        prev = res.soft_bits[-DECODE_PRELUDE:][None]
        pvalid = jnp.asarray(True)
        tg = np.asarray(dec.tch_good)
        ef = np.asarray(dec.tch_end_fn)
        for gi in range(tg.shape[0]):
            for c in range(n_chan):
                if tg[gi, c, 2]:
                    got.append((c, np.asarray(dec.tch_speech)[gi, c, 2],
                                int(ef.reshape(-1)[gi])))
    # every sent frame decoded exactly once per carrier
    for c in range(n_chan):
        end_fns = [g[2] for g in got if g[0] == c]
        assert len(end_fns) == len(set(end_fns)), "group decoded twice"
        assert len(end_fns) == len(sent), (c, len(end_fns), len(sent))
        for payload in sent:
            assert any(np.array_equal(v, payload)
                       for cc, v, _ in got if cc == c), "frame lost"
