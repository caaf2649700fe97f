"""Debug/porting dumpers: byte parity with the reference's printers.

The reference uses these when porting tables to C firmware
(hilbert.py:36-46, phase_detector.py:50-63) and when debugging IL2P
framing (il2p.py:155-158, 183-186); downstream tooling scrapes the text,
so the formats are compared verbatim (modulo the final newline, which the
reference's ``end=''`` prints leave to the next caller)."""

import io
from contextlib import redirect_stdout

import numpy as np

from pymodem_tpu import debug


def _ref_stdout(fn, *args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(*args)
    return buf.getvalue()


def test_hilbert_print_matches_reference(reference):
    from modems_codecs.hilbert import Hilbert

    for tap_count, amplitude in ((21, 32767.0), (41, 1000.0)):
        ref = _ref_stdout(Hilbert(tap_count=tap_count).print, amplitude)
        buf = io.StringIO()
        debug.print_hilbert(tap_count, amplitude, file=buf)
        assert buf.getvalue().rstrip("\n") == ref.rstrip("\n")


def test_qpsk_pd_print_matches_reference(reference):
    from modems_codecs.phase_detector import PhaseDetector

    for granularity, gain in ((16, 1.0), (24, 2.0)):
        pd = PhaseDetector("qpsk", granularity, gain)
        ref = _ref_stdout(pd.print_qpsk_pd)
        buf = io.StringIO()
        debug.print_qpsk_pd(granularity, gain, file=buf)
        assert buf.getvalue().rstrip("\n") == ref.rstrip("\n")


def test_block_and_header_dump_formats():
    rng = np.random.default_rng(3)
    block = rng.integers(0, 256, 32).astype(np.int64)
    buf = io.StringIO()
    debug.dump_block_hex(block, file=buf)
    text = buf.getvalue()
    assert text.endswith(" \nend block\n")
    assert text.split(" \nend block\n")[0] == " ".join(
        hex(int(b)) for b in block
    )
    buf = io.StringIO()
    debug.dump_header_hex(block, file=buf)
    text = buf.getvalue()
    assert text.endswith(" end header\n")
    assert len(text.split(" end header\n")[0].split(" ")) == 13
