"""On-device AX.25/HDLC deframer vs the reference-exact host decoder."""

import numpy as np

import jax.numpy as jnp

from pymodem_tpu.codecs.ax25_device import ax25_decode_blocks
from pymodem_tpu.codecs.host import ax25_decode_host
from pymodem_tpu.synth.encode import ax25_ui_frame, bits_to_bytes_msb, hdlc_encode


def _run_both(stream, max_packets=8):
    K = -(-len(stream) // 128) * 128
    data = np.zeros(K, np.uint8)
    data[: len(stream)] = stream
    addr = np.arange(1, K + 1, dtype=np.int32)
    host = ax25_decode_host(
        stream.astype(np.int64), addr[: len(stream)].astype(np.int64), "h"
    )
    dev = ax25_decode_blocks(
        jnp.asarray(data)[None], jnp.asarray([len(stream)], jnp.int32),
        jnp.asarray(addr)[None], max_packets=max_packets,
    )
    dev = {k: np.asarray(v)[0] for k, v in dev.items()}
    dpk = []
    for i in range(max_packets):
        if dev["ok"][i]:
            length = int(dev["length"][i])
            dpk.append((list(dev["packet"][i][:length]), int(dev["address"][i])))
    hpk = [(list(p.data), p.streamaddress) for p in host]
    return dpk, hpk


def test_frames_roundtrip(rng):
    bits = []
    for i in range(4):
        bits += [int(b) for b in rng.integers(0, 2, 200)]
        payload = bytes(
            rng.choice(np.frombuffer(b"ABCdef123 ", dtype=np.uint8), 20 + i * 10)
        )
        bits += hdlc_encode(ax25_ui_frame("KI5ABC", "N0CALL", payload), flag_count=3)
    bits += [0] * ((8 - len(bits) % 8) % 8)
    stream = np.array(bits_to_bytes_msb(bits))
    dev, host = _run_both(stream)
    assert len(host) == 4
    assert dev == host


def test_noise_prefix_equal(rng):
    stream = rng.integers(0, 256, 20000)
    dev, host = _run_both(stream, max_packets=16)
    assert dev == host[: len(dev)]


def test_stuffing_and_aborts(rng):
    # craft pathological runs: long 1-runs (aborts), stuffed sequences
    bits = []
    for _ in range(30):
        bits += [1] * int(rng.integers(1, 12))
        bits += [0] * int(rng.integers(1, 3))
    payload = bytes(b"Stress! 0123456789")
    bits += hdlc_encode(ax25_ui_frame("AB1CDE", "FG2HIJ", payload), flag_count=2)
    bits += [1] * 20 + [0]
    bits += [0] * ((8 - len(bits) % 8) % 8)
    stream = np.array(bits_to_bytes_msb(bits))
    dev, host = _run_both(stream)
    assert dev == host


def test_overflow_sets_dropped(rng):
    """More closing flags than max_packets -> per-block dropped signal
    (device result incomplete; runtimes fall back to the host FSM)."""
    bits = []
    for _ in range(6):
        payload = bytes(b"0123456789ABCDEFGH")
        bits += hdlc_encode(ax25_ui_frame("KI5ABC", "N0CALL", payload),
                            flag_count=2)
    bits += [0] * ((8 - len(bits) % 8) % 8)
    stream = np.array(bits_to_bytes_msb(bits))
    K = -(-len(stream) // 128) * 128
    data = np.zeros(K, np.uint8)
    data[: len(stream)] = stream
    addr = np.arange(1, K + 1, dtype=np.int32)
    dev = ax25_decode_blocks(
        jnp.asarray(data)[None], jnp.asarray([len(stream)], jnp.int32),
        jnp.asarray(addr)[None], max_packets=4,
    )
    assert int(np.asarray(dev["dropped"])[0]) > 0
    full = ax25_decode_blocks(
        jnp.asarray(data)[None], jnp.asarray([len(stream)], jnp.int32),
        jnp.asarray(addr)[None], max_packets=8,
    )
    assert int(np.asarray(full["dropped"])[0]) == 0
    assert int(np.asarray(full["ok"]).sum()) == 6
