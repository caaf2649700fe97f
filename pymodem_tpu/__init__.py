"""pymodem_tpu: a TPU-native packet-radio decode framework.

A ground-up JAX/XLA/Pallas re-architecture of the capabilities of
ninocarrillo/pymodem: configurable demodulate -> slice -> descramble -> decode
chains for AFSK/FSK/4FSK/BPSK/QPSK audio, AX.25 (HDLC) and IL2P
(Reed-Solomon + CRC) codecs, multi-chain packet correlation and reporting --
built as batched, shardable device programs instead of per-process Python
sample loops.
"""

__version__ = "0.1.0"
