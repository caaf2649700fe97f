"""Golden-WAV generator CLI.

    python -m pymodem_tpu.synth <family> <out.wav> [--seconds N] [--snr DB]

Families: afsk1200, afsk300, fsk9600, bpsk300, qpsk2400, 4fsk4800.
Writes an int16 mono WAV of IL2P frames (AX.25 for fsk9600) that the
matching decode chain locks to; prints the frame payloads transmitted.
"""

from __future__ import annotations

import argparse

import numpy as np

from . import fixtures as fx
from . import modulate as mod
from ..wav_io import write_wav

FAMILIES = {
    # name: (rate, build(line_bits) -> audio, line kind, bit rate, poly, invert)
    "afsk1200": (44100, "afsk", 1200.0, (1200.0, 2200.0), 0x3, False),
    "afsk300": (8000, "afsk", 300.0, (1695.0, 1705.0), 0x3, False),
    "fsk9600": (96000, "fsk", 9600.0, None, 0x63003, False),
    "bpsk300": (8000, "bpsk", 300.0, 1500.0, 0x3, False),
    "qpsk2400": (44100, "qpsk", 1200.0, 1800.0, 0x1, False),
    "4fsk4800": (96000, "4fsk", 4800.0, None, 0x1, False),
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m pymodem_tpu.synth")
    ap.add_argument("family", choices=sorted(FAMILIES))
    ap.add_argument("out")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--snr", type=float, default=None, help="AWGN SNR in dB")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rate, kind, symrate, carrier, poly, invert = FAMILIES[args.family]
    rng = np.random.default_rng(args.seed)
    bits_per_sec = symrate * (2 if kind in ("qpsk", "4fsk") else 1)
    frame_bits = 1200  # ~ one IL2P frame incl. framing
    n_frames = max(1, int(args.seconds * bits_per_sec / (frame_bits + 800)))
    payloads = fx.payloads(rng, count=n_frames, size=40)

    if kind == "fsk":
        line = fx.ax25_line_bits(payloads, polynomial=poly, invert=invert,
                                 gap_bits=800)
    else:
        line = fx.il2p_line_bits(payloads, polynomial=poly, invert=invert,
                                 gap_bits=800)

    if kind == "afsk":
        mark, space = carrier
        audio = mod.afsk_modulate(line, rate, symrate, mark, space)
    elif kind == "fsk":
        audio = mod.fsk_modulate(line, rate, symrate)
    elif kind == "bpsk":
        audio = mod.bpsk_modulate(line, rate, symrate, carrier)
    elif kind == "qpsk":
        audio = mod.qpsk_modulate(line, rate, symrate, carrier)
    else:  # 4fsk
        dibits = [(a << 1) | b for a, b in zip(line[::2], line[1::2])]
        audio = mod.four_level_modulate(dibits, rate, symrate)

    if args.snr is not None:
        audio = mod.awgn(audio, args.snr, rng)
    write_wav(args.out, rate, mod.to_int16(audio))
    print(f"wrote {args.out}: {len(audio) / rate:.1f}s @ {rate} Hz, "
          f"{n_frames} frames")
    for i, p in enumerate(payloads):
        print(f"  frame {i}: {p.decode()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
