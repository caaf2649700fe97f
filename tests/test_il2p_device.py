"""On-device IL2P codec vs the (reference-exact) host decoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from pymodem_tpu.codecs.host import il2p_decode_host
from pymodem_tpu.codecs.il2p_device import il2p_decode_blocks
from pymodem_tpu.ops.sync import il2p_sync_candidates
from pymodem_tpu.synth.encode import il2p_frame
from pymodem_tpu.synth.fixtures import payloads


def _device_decode(stream: np.ndarray, collect_crc=True, disable_rs=False,
                   min_distance=0, max_packets=8):
    K = -(-len(stream) // 128) * 128
    data = np.zeros(K, np.uint8)
    data[: len(stream)] = stream
    addr = np.arange(1, K + 1, dtype=np.int32)
    sync = np.packbits(np.asarray(il2p_sync_candidates(jnp.asarray(data), 0)))
    out = il2p_decode_blocks(
        jnp.asarray(data)[None, :], jnp.asarray(sync)[None, :],
        jnp.asarray([len(stream)], jnp.int32), jnp.asarray(addr)[None, :],
        max_packets=max_packets, collect_crc=collect_crc,
        disable_rs=disable_rs, min_distance=min_distance,
    )
    out = {k: np.asarray(v)[0] for k, v in out.items()}
    pkts = []
    for i in range(max_packets):
        if out["ok"][i]:
            length = int(out["length"][i])
            pkts.append(
                (
                    list(out["packet"][i][:length]),
                    int(out["address"][i]),
                    int(out["corrected"][i]),
                    bool(out["crc_ok"][i]),
                )
            )
    return pkts


def _host_decode(stream, collect_crc=True, disable_rs=False, min_distance=0):
    addr = np.arange(1, len(stream) + 1, dtype=np.int64)
    pkts = il2p_decode_host(
        stream.astype(np.int64), addr, "h",
        collect_trailing_crc=collect_crc, disable_rs=disable_rs,
        min_distance=min_distance,
    )
    out = []
    for p in pkts:
        p.validate()
        out.append(
            (list(p.data), p.streamaddress, p.bytes_corrected, p.valid_crc)
        )
    return out


def _stream_with_frames(rng, n_frames=3, corrupt=0, **frame_kw):
    parts = []
    for i in range(n_frames):
        parts.append(rng.integers(0, 256, 60, dtype=np.int64))
        payload = payloads(rng, count=1, size=30 + i * 60)[0]
        frame = np.array(il2p_frame("KI5ABC", "N0CALL", payload, **frame_kw),
                         dtype=np.int64)
        if corrupt:
            # flip bytes inside the first payload block region (RS territory)
            pos = rng.choice(np.arange(20, len(frame) - 6), corrupt, replace=False)
            frame[pos] ^= rng.integers(1, 256, corrupt)
        parts.append(frame)
    parts.append(rng.integers(0, 256, 60, dtype=np.int64))
    return np.concatenate(parts)


def test_clean_frames(rng):
    stream = _stream_with_frames(rng, 3)
    assert _device_decode(stream) == _host_decode(stream)
    assert len(_host_decode(stream)) == 3


def test_rs_corrections(rng):
    stream = _stream_with_frames(rng, 3, corrupt=4)
    dev, host = _device_decode(stream), _host_decode(stream)
    assert dev == host
    assert any(c > 0 for _, _, c, _ in host)


def test_no_trailing_crc(rng):
    stream = _stream_with_frames(rng, 2, append_crc=False)
    assert _device_decode(stream, collect_crc=False) == _host_decode(
        stream, collect_crc=False
    )


def test_noise_only(rng):
    stream = rng.integers(0, 256, 20000, dtype=np.int64)
    assert _device_decode(stream) == _host_decode(stream)


def test_embedded_syncs_in_noise(rng):
    chunks = []
    for _ in range(10):
        chunks.append(rng.integers(0, 256, 50, dtype=np.int64))
        chunks.append(np.array([0xF1, 0x5E, 0x48], dtype=np.int64))
        chunks.append(rng.integers(0, 256, 100, dtype=np.int64))
    stream = np.concatenate(chunks)
    dev, host = _device_decode(stream, max_packets=16), _host_decode(stream)
    # device packets are a prefix-capacity-limited equal set
    assert dev == host[: len(dev)]


def test_seeded_sync_history_deviation():
    """Pin the documented device-path deviation (il2p_device.py module
    docstring): a sync match that depends on CARRIED WORD HISTORY -- here
    the host FSM's 0xFFFFFF seed supplying the leading 1-bits of
    0xF15E48 when the stream starts mid-syncword -- is caught by the
    bit-serial host FSM but is absent from the device path's pure-bit
    candidate map (probability < 2^-20 per boundary in real traffic).

    The stream begins with the LAST 20 bits of the 24-bit syncword (its
    first 4 bits are 1111, exactly what the seed provides), followed by a
    valid frame body."""
    import jax.numpy as jnp

    from pymodem_tpu.codecs.host import il2p_decode_host
    from pymodem_tpu.codecs.il2p_device import il2p_decode_blocks
    from pymodem_tpu.ops.sync import il2p_sync_candidates
    from pymodem_tpu.runtime.bank import pack_bits
    from pymodem_tpu.synth import encode as enc

    frame = enc.il2p_frame("KI5ABC", "N0CALL", b"seeded-sync-test")
    bits = enc.bytes_to_bits_msb(frame)
    assert bits[:4] == [1, 1, 1, 1]  # 0xF15E48 leads with 1111
    clipped = bits[4:]  # stream starts 4 bits into the syncword
    clipped += [1 if i % 2 == 0 else 0 for i in range(64 - len(clipped) % 8)]
    stream = np.packbits(np.asarray(clipped, np.uint8))

    addresses = np.arange(1, len(stream) + 1, dtype=np.int64)
    host_pkts = il2p_decode_host(
        stream.astype(np.int64), addresses, "t", sync_candidates=None
    )
    assert len(host_pkts) == 1  # the seed completes the truncated sync
    assert bytes(host_pkts[0].data)[16:] [:16] == b"seeded-sync-test"

    data = jnp.asarray(stream)[None, :]
    sync = pack_bits(il2p_sync_candidates(data, 0))
    out = il2p_decode_blocks(
        data, sync, jnp.asarray([len(stream)], jnp.int32),
        jnp.asarray(addresses, jnp.int32)[None, :], max_packets=4,
    )
    # the pure-bit candidate map cannot see the seeded match: documented
    # miss, with no dropped flag (the deviation is accepted, not fallen
    # back from)
    assert int(np.asarray(out["ok"]).sum()) == 0
    assert int(np.asarray(out["dropped"]).sum()) == 0

    # the production host-codec pipeline still catches it: block skipping
    # consults il2p_seeded_sync_possible on the stream head
    from pymodem_tpu.codecs.host import il2p_seeded_sync_possible

    assert il2p_seeded_sync_possible(stream[:4].astype(np.int64), 0)


def test_multiblock_payloads(rng):
    """Payloads past 239 bytes split into 2-5 RS blocks with the
    big/small ceil-split layout (il2p.py:346-358): the device codec must
    match the host FSM on clean and RS-corrected multi-block frames,
    including the protocol-max 1023-byte payload (5 blocks), and the
    per-candidate payload budget must either cover the packet or drop
    its stream block for exact host fallback -- never truncate."""
    from pymodem_tpu.codecs.il2p_device import il2p_decode_blocks
    from pymodem_tpu.ops.sync import il2p_sync_candidates
    from pymodem_tpu.runtime.bank import pack_bits

    import jax.numpy as jnp

    for size, corrupt in ((300, 0), (500, 3), (1023, 0)):
        parts = [rng.integers(0, 256, 40, dtype=np.int64)]
        payload = payloads(rng, count=1, size=size)[0]
        frame = np.array(il2p_frame("KI5ABC", "N0CALL", payload),
                         dtype=np.int64)
        if corrupt:
            pos = rng.choice(np.arange(20, len(frame) - 6), corrupt,
                             replace=False)
            frame[pos] ^= rng.integers(1, 256, corrupt)
        parts += [frame, rng.integers(0, 256, 40, dtype=np.int64)]
        stream = np.concatenate(parts)
        host = _host_decode(stream)
        assert len(host) == 1 and len(host[0][0]) == size + 18, size
        dev = _device_decode(stream)
        assert dev == host, size

        # budget smaller than the payload: the block is flagged dropped
        # (dispatcher escalates / falls back), with no truncated emission
        data = jnp.asarray(stream.astype(np.uint8))[None, :]
        sync = pack_bits(il2p_sync_candidates(data, 0))
        out = il2p_decode_blocks(
            data, sync, jnp.asarray([len(stream)], jnp.int32),
            jnp.arange(1, len(stream) + 1, dtype=jnp.int32)[None, :],
            max_packets=4, max_payload=128,
        )
        assert int(np.asarray(out["ok"]).sum()) == 0
        assert int(np.asarray(out["dropped"]).sum()) > 0
