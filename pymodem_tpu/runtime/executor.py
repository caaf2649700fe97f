"""End-to-end chain execution: audio -> packets.

The demod / slice / descramble stages run on device as one jitted program per
chain family; codec and report stages run on host (their input is ~one byte
per eight transmitted symbols).  A fully on-device codec path lives in
``pymodem_tpu.codecs`` and is used by the batched/sharded runtimes; this
executor is the reference-parity single-host orchestrator, the analog of the
reference's process-per-chain driver (pymodem.py:140-166) with the process
pool replaced by compiled device programs.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

from .. import modems
from ..codecs.host import ax25_decode_host, il2p_decode_host
from ..config import (
    AX25CodecSpec,
    BinarySlicerSpec,
    ChainSpec,
    FourLevelSlicerSpec,
    IL2PCodecSpec,
    QuadratureSlicerSpec,
    RunPlan,
)
from ..ops.lfsr import descramble_bytes
from ..ops.slicers import (
    binary_slice,
    compact_bytes,
    four_level_slice,
    quadrature_slice,
    safe_compact_window,
)
from ..packets import Packet, PacketAggregate


def _slice_capacity(n_samples: int, samples_per_symbol: float, bits_per_symbol: int) -> int:
    nominal = n_samples / samples_per_symbol * bits_per_symbol / 8.0
    return int(nominal * 4) + 64


def run_slicer(spec, baseband, unroll: int = 8):
    """Dispatch a slicer spec; returns (bytes, addresses, count) device arrays."""
    sps = spec.sample_rate / spec.symbol_rate
    if isinstance(spec, BinarySlicerSpec):
        out = binary_slice(baseband, sps, spec.lock_rate, unroll=unroll)
        n = baseband.shape[-1]
        bps = 1
    elif isinstance(spec, QuadratureSlicerSpec):
        i_data, q_data = baseband
        out = quadrature_slice(
            i_data, q_data, sps, spec.lock_rate,
            jnp.asarray(np.array(spec.demap, dtype=np.int32)),
            spec.state_mask, spec.bits_per_symbol, unroll=unroll,
        )
        n = i_data.shape[-1]
        bps = spec.bits_per_symbol
    elif isinstance(spec, FourLevelSlicerSpec):
        out = four_level_slice(
            baseband, sps, spec.lock_rate,
            jnp.asarray(np.array(spec.demap, dtype=np.int32)), 0.0, unroll=unroll,
        )
        n = baseband.shape[-1]
        bps = 2
    else:
        raise ValueError(type(spec))
    capacity = _slice_capacity(n, sps, bps)
    window = safe_compact_window(sps, spec.lock_rate, bps)
    return compact_bytes(out, capacity, window)


def run_chain(spec: ChainSpec, audio: np.ndarray, dtype=None,
              method: str = "auto", unroll: int = 8) -> list[Packet]:
    """Run one chain over an audio buffer; returns decoded packets."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    params = modems.build_params(spec.modem)
    device_audio = jnp.asarray(np.asarray(audio), dtype)
    baseband = modems.demod(spec.modem, params, device_audio, method, unroll)
    data, addr, count = run_slicer(spec.slicer, baseband, unroll)
    if spec.stream is not None and spec.stream.polynomial != 0:
        data = descramble_bytes(
            data.astype(jnp.uint8), spec.stream.polynomial, spec.stream.invert
        )
    n = int(count)
    data_np = np.asarray(data[:n]).astype(np.int64)
    addr_np = np.asarray(addr[:n])
    codec = spec.codec
    if isinstance(codec, AX25CodecSpec):
        return ax25_decode_host(
            data_np, addr_np, codec.ident,
            min_packet_length=codec.min_packet_length,
            max_packet_length=codec.max_packet_length,
        )
    if isinstance(codec, IL2PCodecSpec):
        return il2p_decode_host(
            data_np, addr_np, codec.ident,
            collect_trailing_crc=codec.collect_trailing_crc,
            disable_rs=codec.disable_rs,
            min_distance=codec.min_distance,
            sync_tolerance=codec.sync_tolerance,
        )
    raise ValueError(type(codec))


@dataclass
class RunResult:
    aggregate: PacketAggregate
    reports: list[str]


def run_plan(plan: RunPlan, audio: np.ndarray, sample_rate: float,
             dtype=None, method: str = "auto", verbose: bool = False,
             resilient: bool = True) -> RunResult:
    """Run every chain and aggregate/correlate/report (pymodem.py:134-183).

    ``resilient`` replicates the reference's skip-and-continue stage
    resilience (chain_execute.py:8-27): a chain that raises mid-run is
    reported and skipped, the remaining chains still decode -- minus the
    reference's hang when a dead chain never reaches queue.put
    (pymodem.py:158-163).  Pass ``resilient=False`` to re-raise.
    """
    aggregate = PacketAggregate()
    for chain in plan.chains:
        if verbose:
            print(f"{chain.name} chain start")
        try:
            packets = run_chain(chain, audio, dtype=dtype, method=method)
        except Exception as exc:  # noqa: BLE001 - skip-and-continue contract
            if not resilient:
                raise
            print(f"skipped chain {chain.name}: {type(exc).__name__}: {exc}")
            packets = []
        aggregate.add(packets)
    aggregate.validate_all()
    aggregate.correlate(address_distance=sample_rate / 40)
    reports = [
        aggregate.render_raw_bad() + aggregate.render_report(r.style)
        for r in plan.reports
    ]
    return RunResult(aggregate=aggregate, reports=reports)
