"""Unit parity tests: tap designers, LFSR, CRC, Hamming, GF, RS vs the
reference oracle."""

import importlib

import numpy as np
import pytest

from pymodem_tpu.dsp import window_design as wd
from pymodem_tpu.ops import gf as gf_ops
from pymodem_tpu.ops import rs as rs_ops
from pymodem_tpu.ops.crc import np_append_crc, np_check_packet
from pymodem_tpu.ops.hamming import hamming74_decode
from pymodem_tpu.ops.lfsr import descramble_bytes, np_descramble_bytes


def _ref(reference, name):
    return importlib.import_module(f"modems_codecs.{name}")


# ---------------------------------------------------------------------------
# tap designers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "rate,sym,span,rolloff",
    [(8000.0, 300.0, 6, 0.6), (8000.0, 1200.0, 3, 0.9), (44100.0, 1800.0, 8, 0.3),
     (9600.0, 4800.0, 9, 0.2)],
)
def test_rrc_matches_reference(reference, rate, sym, span, rolloff):
    ref_rrc = _ref(reference, "rrc").RRC(
        sample_rate=rate, symbol_rate=sym, symbol_span=span, rolloff_rate=rolloff
    )
    ours = wd.rrc_taps(rate, sym, span, rolloff)
    np.testing.assert_array_equal(ours, np.asarray(ref_rrc.taps))


@pytest.mark.parametrize("tap_count", [13, 21, 47, 149])
def test_hilbert_matches_reference(reference, tap_count):
    ref_h = _ref(reference, "hilbert").Hilbert(tap_count=tap_count)
    np.testing.assert_allclose(
        wd.hilbert_taps(tap_count), np.asarray(ref_h.taps), rtol=0, atol=0
    )


def test_nco_wavetable_matches_reference(reference):
    ref_nco = _ref(reference, "nco").NCO(
        sample_rate=8000.0, amplitude=1.0, set_frequency=1700.0, wavetable_size=256
    )
    np.testing.assert_array_equal(
        wd.nco_wavetable(256, 1.0), np.asarray(ref_nco.wavetable)
    )


def test_iir_coefs_match_reference(reference):
    ref_iir = _ref(reference, "iir").IIR_1(
        sample_rate=8000.0, filter_type="lpf", cutoff=150.0, gain=1.0
    )
    b0, a1 = wd.iir1_lpf_coefs(8000.0, 150.0, 1.0)
    assert [b0, b0] == ref_iir.b_coefs
    assert [0.0, a1] == ref_iir.a_coefs


def test_qpsk_error_table_matches_reference(reference):
    ref_pd = _ref(reference, "phase_detector").PhaseDetector("qpsk", 64, 32)
    np.testing.assert_array_equal(
        wd.qpsk_error_table(64, 32), np.asarray(ref_pd.qpsk_error_table)
    )


# ---------------------------------------------------------------------------
# LFSR descrambler
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("poly,invert", [(0x1, False), (0x3, True), (0x63003, True),
                                         (0x211, False)])
def test_lfsr_stream_matches_reference(reference, rng, poly, invert):
    lfsr_mod = _ref(reference, "lfsr")
    dc = _ref(reference, "data_classes")
    data = rng.integers(0, 256, size=300)
    ref_obj = lfsr_mod.LFSR(poly=poly, invert=invert)
    ref_out = ref_obj.stream_unscramble_8bit(
        [dc.AddressedData(int(b), i) for i, b in enumerate(data)]
    )
    ref_bytes = np.array([a.data for a in ref_out], dtype=np.uint8)
    ours_np = np_descramble_bytes(data.astype(np.uint8), poly, invert)
    np.testing.assert_array_equal(ours_np, ref_bytes)
    ours_jax = np.asarray(descramble_bytes(data.astype(np.uint8), poly, invert))
    np.testing.assert_array_equal(ours_jax, ref_bytes)


def test_lfsr_seeded_block_matches_reference(reference, rng):
    # IL2P block unscramble: poly 0x211 seeded 0x1F0 (il2p.py:160-163)
    lfsr_mod = _ref(reference, "lfsr")
    data = rng.integers(0, 256, size=64)
    ref_obj = lfsr_mod.LFSRnoaddr(poly=0x211, invert=False)
    ref_obj.shift_register = 0x1F0
    ref_bytes = np.array(
        ref_obj.stream_unscramble_8bit([int(b) for b in data]), dtype=np.uint8
    )
    ours = np_descramble_bytes(data.astype(np.uint8), 0x211, seed=0x1F0)
    np.testing.assert_array_equal(ours, ref_bytes)
    ours_jax = np.asarray(descramble_bytes(data.astype(np.uint8), 0x211, seed=0x1F0))
    np.testing.assert_array_equal(ours_jax, ref_bytes)


# ---------------------------------------------------------------------------
# CRC and Hamming
# ---------------------------------------------------------------------------


def test_crc_matches_reference(reference, rng):
    crc_mod = _ref(reference, "crc_functions")
    for size in (18, 50, 300):
        packet = [int(b) for b in rng.integers(0, 256, size=size)]
        ref_carried, ref_calc, ref_valid = crc_mod.CheckCRC(list(packet))
        carried, calc, valid = np_check_packet(np.array(packet))
        assert (carried, calc, valid) == (ref_carried, ref_calc, ref_valid)
        # matched pair round-trips as valid
        body = packet[:-2]
        ref_append = list(body)
        crc_mod.AppendCRC(ref_append)
        ours_append = list(body)
        np_append_crc(ours_append)
        assert ours_append == ref_append
        assert np_check_packet(np.array(ours_append))[2]


def test_crc_device_masked(rng):
    import jax.numpy as jnp

    from pymodem_tpu.ops.crc import crc16_masked, np_crc16

    buf = rng.integers(0, 256, size=(3, 64)).astype(np.uint8)
    lengths = np.array([10, 0, 64], dtype=np.int32)
    out = np.asarray(crc16_masked(jnp.asarray(buf), jnp.asarray(lengths)))
    for row, (data, n) in enumerate(zip(buf, lengths)):
        assert out[row] == np_crc16(data[:n])


def test_hamming_decode_matches_reference(reference):
    il2p_mod = _ref(reference, "il2p")
    for word in range(256):
        assert hamming74_decode(word) == il2p_mod.hamming_decode(word)


# ---------------------------------------------------------------------------
# GF / RS
# ---------------------------------------------------------------------------


def test_gf_tables_match_reference(reference):
    gf_mod = _ref(reference, "gf_functions")
    ref_gf = gf_mod.initialize(8, 0x11D)
    gf = gf_ops.GF256
    np.testing.assert_array_equal(gf.antilog, np.array(ref_gf["table"]))
    np.testing.assert_array_equal(gf.log, np.array(ref_gf["index"]))
    np.testing.assert_array_equal(gf.inverse, np.array(ref_gf["inverse"]))


def test_rs_genpoly_matches_reference(reference):
    rs_mod = _ref(reference, "rs_functions")
    for nroots in (2, 16):
        ref_rs = rs_mod.initialize(0, nroots, 8, 0x11D)
        ours = rs_ops.make_rs(0, nroots)
        np.testing.assert_array_equal(ours.genpoly, np.array(ref_rs["genpoly"]))


def _random_blocks(rng, nroots, n_cases=60):
    """Clean/corrupted RS codewords across sizes and error weights."""
    rs = rs_ops.make_rs(0, nroots)
    cases = []
    for _ in range(n_cases):
        k = int(rng.integers(1, 240 - nroots))
        data = rng.integers(0, 256, size=k).astype(np.int32)
        codeword = rs_ops.rs_encode_np(rs, data)
        n_err = int(rng.integers(0, nroots + 2))  # up to beyond capacity
        corrupted = codeword.copy()
        pos = rng.choice(len(codeword), size=min(n_err, len(codeword)), replace=False)
        for p in pos:
            corrupted[p] ^= int(rng.integers(1, 256))
        cases.append(corrupted)
    # plus pure-noise blocks
    for _ in range(20):
        size = int(rng.integers(nroots + 1, 255))
        cases.append(rng.integers(0, 256, size=size).astype(np.int32))
    return cases


@pytest.mark.parametrize("nroots,min_distance", [(2, 0), (16, 0), (16, 1)])
def test_rs_decode_np_matches_reference(reference, rng, nroots, min_distance):
    rs_mod = _ref(reference, "rs_functions")
    ref_rs = rs_mod.initialize(0, nroots, 8, 0x11D)
    ours_rs = rs_ops.make_rs(0, nroots)
    for block in _random_blocks(rng, nroots):
        ref_buf = [int(b) for b in block]
        ref_result = rs_mod.decode(ref_rs, ref_buf, len(block), min_distance)
        our_buf = block.copy()
        our_result = rs_ops.rs_decode_np(ours_rs, our_buf, len(block), min_distance)
        assert our_result == ref_result
        np.testing.assert_array_equal(our_buf, np.array(ref_buf))


@pytest.mark.parametrize("nroots,min_distance", [(2, 0), (16, 0), (16, 1)])
def test_rs_decode_jax_matches_np(rng, nroots, min_distance):
    import jax.numpy as jnp

    ours_rs = rs_ops.make_rs(0, nroots)
    blocks = _random_blocks(rng, nroots, n_cases=40)
    L = 255
    padded = np.zeros((len(blocks), L), dtype=np.int32)
    sizes = np.zeros(len(blocks), dtype=np.int32)
    for i, b in enumerate(blocks):
        padded[i, : len(b)] = b
        sizes[i] = len(b)
    corrected, results = rs_ops.rs_decode_jax(
        jnp.asarray(padded), jnp.asarray(sizes), num_roots=nroots,
        min_distance=min_distance,
    )
    corrected = np.asarray(corrected)
    results = np.asarray(results)
    for i, b in enumerate(blocks):
        expect_buf = b.copy()
        expect = rs_ops.rs_decode_np(ours_rs, expect_buf, len(b), min_distance)
        assert results[i] == expect, f"block {i}"
        np.testing.assert_array_equal(corrected[i, : len(b)], expect_buf)


def test_rs_computed_gf_matches_tables():
    """The TPU-path computed GF(256) arithmetic (bit-ladder multiply,
    square-and-multiply inverse / alpha-power) equals the log/antilog
    tables on every operand pair; the tables themselves are asserted
    against the reference by test_gf_tables_match_reference."""
    import jax.numpy as jnp

    gf = rs_ops.GF256
    a = np.arange(256, dtype=np.int32)
    aa, bb = np.meshgrid(a, a)
    got = np.asarray(rs_ops._jmul_c(jnp.asarray(aa), jnp.asarray(bb)))
    want = np.where(
        (aa == 0) | (bb == 0), 0,
        gf.antilog[(gf.log[aa] + gf.log[bb]) % 255],
    )
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(rs_ops._jinv(jnp.asarray(a))), gf.inverse
    )
    x = np.arange(255, dtype=np.int32)
    np.testing.assert_array_equal(
        np.asarray(rs_ops._jpow_alpha(jnp.asarray(x))), gf.antilog[:255]
    )


def test_rs_encode_roundtrip(rng):
    rs = rs_ops.RS_BLOCK
    data = rng.integers(0, 256, size=100).astype(np.int32)
    codeword = rs_ops.rs_encode_np(rs, data)
    buf = codeword.copy()
    assert rs_ops.rs_decode_np(rs, buf, len(buf)) == 0
    # correctable errors are fixed
    buf[5] ^= 0xA5
    buf[60] ^= 0x11
    assert rs_ops.rs_decode_np(rs, buf, len(buf)) == 2
    np.testing.assert_array_equal(buf, codeword)


def test_pi_update_reset_matches_reference(reference, rng):
    """update_reset variant (unused by any modem) vs the reference class."""
    import jax.numpy as jnp

    from modems_codecs.pi_control import PI_control

    from pymodem_tpu.dsp.loops import LoopParams, pi_update_reset
    from pymodem_tpu.dsp.window_design import nco_wavetable

    ref = PI_control(p=0.3, i=0.02, i_limit=5.0, gain=10.0)
    params = LoopParams(
        wavetable=jnp.asarray(nco_wavetable(256, 1.0)),
        set_frequency=jnp.float64(0), phase_scale=jnp.float64(0),
        index_scale=jnp.float64(0), iir_b0=jnp.float64(0), iir_a1=jnp.float64(0),
        pi_gp=jnp.float64(10.0 * 0.3), pi_gain=jnp.float64(10.0),
        pi_i=jnp.float64(0.02), pi_limit=jnp.float64(5.0),
        pi_integral0=jnp.float64(0),
    )
    integral = jnp.float64(0.0)
    for x in rng.standard_normal(200) * 3:
        expected = ref.update_reset(float(x))
        prop, integral = pi_update_reset(jnp.float64(x), integral, params)
        assert float(prop + integral) == expected


def test_pd_lookup_computed_matches_table(rng):
    """f32 computed phase-detector path == f64 table gathers (same quantized
    indices; values differ only if atan2 ulps cross a round boundary)."""
    import jax.numpy as jnp

    from pymodem_tpu.dsp.loops import _pd_lookup
    from pymodem_tpu.dsp.window_design import qpsk_error_table

    g, gain = 64, 32.0
    table = jnp.asarray(qpsk_error_table(g, gain))
    re = rng.uniform(-2, 2, 4096)
    im = rng.uniform(-2, 2, 4096)
    via_table = _pd_lookup(
        jnp.asarray(re, jnp.float64), jnp.asarray(im, jnp.float64),
        table, jnp.int32(g), jnp.float64(gain),
    )
    computed = _pd_lookup(
        jnp.asarray(re, jnp.float32), jnp.asarray(im, jnp.float32),
        table, jnp.int32(g), jnp.float32(gain),
    )
    diff = np.abs(np.asarray(via_table) - np.asarray(computed))
    assert (diff != 0).mean() < 0.001  # rare round-boundary flips only
    assert diff.max() <= 1


def test_crc_bit_distance_matches_reference_table():
    """The CheckCRC near-miss metric (crc_functions.py:14-61): the
    reference's Distance8 table is the per-byte popcount, so the
    two-byte distance is the CRC XOR's popcount -- crc_bit_distance.
    The shipped threshold (<= 0) reduces to the equality np_check_packet
    applies by default (verified against ref.CheckCRC on valid and
    corrupted packets), while the exposed knob accepts near-misses."""
    import importlib.util

    from pymodem_tpu.ops.crc import (
        crc_bit_distance,
        np_append_crc,
        np_check_packet,
    )

    spec = importlib.util.spec_from_file_location(
        "ref_crc", "/root/reference/modems_codecs/crc_functions.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    rng = np.random.default_rng(9)
    for trial in range(50):
        data = list(rng.integers(0, 256, 24))
        np_append_crc(data)
        arr = np.asarray(data)
        if trial % 2:  # corrupt 1-3 packet/CRC bytes
            for pos in rng.integers(0, len(arr), rng.integers(1, 4)):
                arr[pos] ^= int(rng.integers(1, 256))
        r_carried, r_calc, r_valid = ref.CheckCRC(arr)
        carried, calc, valid = np_check_packet(arr)
        assert (carried, calc, valid) == (r_carried, r_calc, r_valid)
        # the metric itself: distance 0 iff the reference accepts
        assert (crc_bit_distance(carried, calc) == 0) == r_valid
    # the near-miss knob: a 1-bit-corrupted CRC is rejected by both
    # shipped paths, accepted at max_distance=1
    data = list(rng.integers(0, 256, 32))
    np_append_crc(data)
    corrupt = np.asarray(data)
    corrupt[-1] ^= 0x10
    assert ref.CheckCRC(corrupt)[2] is False
    assert not np_check_packet(corrupt)[2]
    assert np_check_packet(corrupt, max_distance=1)[2]
    assert crc_bit_distance(*np_check_packet(corrupt)[:2]) == 1
