"""Codec-layer differential tests: bit-exact vs the reference FSMs.

Feeds identical byte streams to our host codecs and the reference's
IL2PCodec / AX25Codec and asserts identical packet lists (data bytes,
streamaddresses, bytes_corrected).  Streams used: pure noise bytes (stress
the sync/abort paths) and noise with embedded valid frames.
"""

import numpy as np
import pytest

from pymodem_tpu.codecs.host import ax25_decode_host, il2p_decode_host


def _ref_ax25(reference, data, addresses, ident="ref"):
    from modems_codecs.ax25 import AX25Codec
    from modems_codecs.data_classes import AddressedData

    codec = AX25Codec(ident=ident)
    stream = [AddressedData(int(v), int(a)) for v, a in zip(data, addresses)]
    return codec.decode(stream)


def _ref_il2p(reference, data, addresses, ident="ref", crc=True):
    import contextlib
    import io

    from modems_codecs.il2p import IL2PCodec
    from modems_codecs.data_classes import AddressedData

    codec = IL2PCodec(ident=ident, crc=crc, min_dist=0, disable_rs=False)
    stream = [AddressedData(int(v), int(a)) for v, a in zip(data, addresses)]
    with contextlib.redirect_stdout(io.StringIO()):
        return codec.decode(stream)


def _assert_same(ours, refs):
    assert len(ours) == len(refs)
    for mine, ref in zip(ours, refs):
        assert list(mine.data) == [int(v) for v in ref.data]
        assert mine.streamaddress == int(ref.streamaddress)
        assert mine.bytes_corrected == int(ref.BytesCorrected)


def test_ax25_differential_noise(reference, rng):
    data = rng.integers(0, 256, size=20000, dtype=np.int64)
    addresses = np.arange(1, len(data) + 1, dtype=np.int64)
    _assert_same(
        ax25_decode_host(data, addresses, "ref"),
        _ref_ax25(reference, data, addresses),
    )


def test_ax25_differential_frames(reference, rng):
    """Noise with embedded HDLC frames (flags + bit-stuffed payload)."""

    def stuff(bits):
        out, ones = [], 0
        for b in bits:
            out.append(b)
            ones = ones + 1 if b else 0
            if ones == 5:
                out.append(0)
                ones = 0
        return out

    bit_stream = []
    for _ in range(12):
        bit_stream += [int(b) for b in rng.integers(0, 2, size=64)]
        bit_stream += [0, 1, 1, 1, 1, 1, 1, 0]  # flag
        payload = rng.integers(0, 256, size=30)
        bits = []
        for byte in payload:
            bits += [(int(byte) >> k) & 1 for k in range(8)]  # LSB-first
        bit_stream += stuff(bits)
        bit_stream += [0, 1, 1, 1, 1, 1, 1, 0]
    # pack MSB-first into bytes as the slicer does
    while len(bit_stream) % 8:
        bit_stream.append(0)
    data = np.array(
        [
            sum(bit << (7 - k) for k, bit in enumerate(bit_stream[i : i + 8]))
            for i in range(0, len(bit_stream), 8)
        ],
        dtype=np.int64,
    )
    addresses = np.arange(1, len(data) + 1, dtype=np.int64)
    ours = ax25_decode_host(data, addresses, "ref")
    refs = _ref_ax25(reference, data, addresses)
    assert len(ours) >= 6  # the embedded frames must actually decode
    _assert_same(ours, refs)


def test_il2p_differential_noise(reference, rng):
    data = rng.integers(0, 256, size=20000, dtype=np.int64)
    addresses = np.arange(1, len(data) + 1, dtype=np.int64)
    _assert_same(
        il2p_decode_host(data, addresses, "ref"),
        _ref_il2p(reference, data, addresses),
    )


@pytest.mark.parametrize("crc", [True, False])
def test_il2p_differential_frames(reference, rng, crc):
    """Noise with embedded sync words so header/payload phases execute."""
    chunks = []
    for _ in range(40):
        chunks.append(rng.integers(0, 256, size=40, dtype=np.int64))
        chunks.append(np.array([0xF1, 0x5E, 0x48], dtype=np.int64))  # sync24
        chunks.append(rng.integers(0, 256, size=80, dtype=np.int64))
    data = np.concatenate(chunks)
    addresses = np.arange(1, len(data) + 1, dtype=np.int64)
    ours = il2p_decode_host(data, addresses, "ref", collect_trailing_crc=crc)
    refs = _ref_il2p(reference, data, addresses, crc=crc)
    _assert_same(ours, refs)


def test_il2p_sync_candidates_device(rng):
    """Device sync scan == host window scan (pure-bit positions)."""
    import jax.numpy as jnp

    from pymodem_tpu.codecs.host import SYNC24, SYNC32, Il2pDecoder
    from pymodem_tpu.ops.sync import il2p_sync_candidates

    data = rng.integers(0, 256, size=2000, dtype=np.uint8)
    # embed both syncwords
    data[500:503] = [0xF1, 0x5E, 0x48]
    data[1200:1204] = [0x5D, 0x57, 0xDF, 0x7F]
    cand = np.asarray(il2p_sync_candidates(jnp.asarray(data), 0))
    bits = np.unpackbits(data).astype(np.uint64)
    n = len(bits)
    expect = np.zeros(n, dtype=bool)
    word = 0
    for i in range(n):
        word = ((word << 1) | int(bits[i])) & 0xFFFFFFFF
        if (
            bin((word & 0xFFFFFF) ^ SYNC24).count("1") == 0
            or bin(word ^ SYNC32).count("1") == 0
        ):
            expect[i] = True
    assert np.array_equal(cand, expect)


def test_il2p_candidates_path_matches_rescan(reference, rng):
    """decode() with device candidates == decode() with host rescan."""
    import jax.numpy as jnp

    from pymodem_tpu.ops.sync import il2p_sync_candidates

    chunks = []
    for _ in range(20):
        chunks.append(rng.integers(0, 256, size=60, dtype=np.int64))
        chunks.append(np.array([0xF1, 0x5E, 0x48], dtype=np.int64))
        chunks.append(rng.integers(0, 256, size=60, dtype=np.int64))
    data = np.concatenate(chunks)
    addresses = np.arange(1, len(data) + 1, dtype=np.int64)
    cand = np.flatnonzero(
        np.asarray(il2p_sync_candidates(jnp.asarray(data.astype(np.uint8)), 0))
    )
    with_cand = il2p_decode_host(data, addresses, "x", sync_candidates=cand)
    without = il2p_decode_host(data, addresses, "x")
    refs = _ref_il2p(reference, data, addresses)
    _assert_same(with_cand, refs)
    _assert_same(without, refs)
