"""Multi-device execution: the bank program over a ('chain', 'time') mesh.

The reference's only parallelism is one OS process per chain with the whole
recording copied into each (pymodem.py:140-166).  Here both axes of the
banked program shard over a device mesh:

* mesh axis ``chain``: the stacked chain-parameter pytree (leading axis C)
  -- the DP-like axis; no communication.
* mesh axis ``time``: the overlap-save block axis (B) -- the SP/CP-like
  axis.  The recording is framed host-side into (B, block_input_len)
  overlap-save windows and the frame matrix is SHARDED over ``time``: each
  device holds only its own blocks' windows (~n_audio/n_time + halo), not
  the whole recording.  Halos are *baked into the frames* (each block
  carries its own ``overlap + trim`` warm-up samples), so there is no
  neighbour dependence and no ppermute halo exchange; the one true
  cross-shard dependence -- the AGC's whole-recording max (agc.py:67) --
  is an explicit ``lax.pmax`` over the time axis.

Built on ``shard_map`` so the collective is visible and the per-shard
program is exactly the single-device bank program.  Packet-material outputs
come back sharded (C, B, cap); the codec stage either runs the host FSMs on
candidate positions (codec='host') or decodes fully on device per shard
into fixed-capacity packet buffers (codec='device', the device-side packet
gather SURVEY.md section 2.6 maps the reference's Queue onto).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from . import bank as bank_mod
from .bank import BlockPlan, _slicer_static, bank_capacity


def make_mesh(n_chain: int, n_time: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_chain * n_time, (devices.size, n_chain, n_time)
    grid = devices[: n_chain * n_time].reshape(n_chain, n_time)
    return Mesh(grid, axis_names=("chain", "time"))


def gather_to_host(x) -> np.ndarray:
    """Materialize a (possibly multi-process) sharded array on the host.

    Single process: a plain transfer.  Under ``jax.distributed`` (>= 2
    hosts), the array's shards live on different processes, so this is the
    cross-host packet/result gather -- an allgather over DCN -- replacing
    the reference's multiprocessing.Queue drain (pymodem.py:158-163).
    Every process ends up with the identical full array, so aggregation
    and reports are deterministic on all hosts."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def frame_blocks_host(audio: np.ndarray, plan: BlockPlan) -> np.ndarray:
    """Host-side overlap-save framing: (n,) -> (n_blocks, block_input_len).

    The frame matrix is what gets sharded over the ``time`` axis -- each
    device receives only its own blocks' windows (~n_audio/n_time plus the
    per-block halo), never the whole recording."""
    total = plan.n_blocks * plan.block_len + plan.overlap + plan.trim
    padded = np.zeros(total, dtype=np.asarray(audio).dtype)
    padded[plan.overlap : plan.overlap + len(audio)] = audio
    stride = padded.strides[0]
    return np.lib.stride_tricks.as_strided(
        padded, (plan.n_blocks, plan.block_input_len),
        (stride * plan.block_len, stride),
    ).copy()


def sharded_bank_step(mesh: Mesh, kind: str, slicer_kind: str, params,
                      frames: jax.Array, plan: BlockPlan, capacity: int,
                      poly: int, invert: bool, slicer_static_mask: int,
                      slicer_static_bps: int, sync_tolerance: int = 0,
                      method: str = "auto", unroll: int = 8,
                      compact_window: int = 1):
    """jit(shard_map(...)) of the full bank program over the mesh.

    params leaves are sharded on their leading chain axis; ``frames``
    (B, block_input_len) is sharded on the block axis over ``time``.
    Returns (data, addr, count, packed_sync) with (C, B, ...) layouts
    sharded over ('chain', 'time').
    """
    n_time = mesh.shape["time"]
    assert frames.shape[0] % n_time == 0, (frames.shape, n_time)

    pallas = bank_mod._pallas_loop_wanted(frames.dtype)

    def shard_fn(shard_params, blocks):
        # The per-shard program IS the single-device bank program
        # (bank.py _bank_frames_compute -- Pallas loop/slicer kernels on
        # TPU, scan engines elsewhere; the engine choice resolves OUTSIDE
        # the trace so it keys the jit cache); the one cross-shard
        # dependency, the AGC whole-recording max (agc.py:67), enters as
        # a pmax collective over the time axis via normal_fn.
        return bank_mod._bank_frames_compute(
            kind, slicer_kind, shard_params, blocks, capacity, poly,
            invert, slicer_static_mask, slicer_static_bps, sync_tolerance,
            method, unroll, compact_window,
            normal_fn=lambda n: jax.lax.pmax(n, "time"), pallas=pallas,
        )

    from jax import shard_map

    spec_params = jax.tree_util.tree_map(lambda _: P("chain"), params)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_params, P("time")),
        out_specs=(
            P("chain", "time"), P("chain", "time"), P("chain", "time"),
            P("chain", "time"),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(params, frames)


def sharded_codec_step(mesh: Mesh, codec_key, data, addr, count, sync,
                       plan: BlockPlan, max_packets: int = 8,
                       total_candidates: int | None = None):
    """Device codec stage per shard: (C, B, cap) sharded byte streams ->
    fixed-capacity per-shard packet buffers, still sharded over
    ('chain', 'time').  This is the device-side packet gather of SURVEY.md
    section 2.6: each shard fills its own buffers; the host (or an
    all_gather) collects fixed shapes instead of the reference's Queue
    (pymodem.py:158-163).  Absolute stream addresses are computed in-shard
    from the time-axis index."""
    from ..codecs.ax25_device import ax25_decode_blocks
    from ..codecs.il2p_device import il2p_decode_blocks

    def shard_fn(d, a, c, s):
        t_idx = jax.lax.axis_index("time")
        nb_local = d.shape[1]
        g = t_idx * nb_local + jnp.arange(nb_local, dtype=jnp.int32)
        offs = g * plan.block_len - plan.overlap
        addr_abs = a + offs[None, :, None]
        if codec_key[0] == "il2p":
            out = il2p_decode_blocks(
                d.astype(jnp.uint8), s, c, addr_abs,
                max_packets=max_packets, collect_crc=codec_key[1],
                disable_rs=codec_key[2], min_distance=codec_key[3],
                total_candidates=total_candidates,
            )
        else:
            out = ax25_decode_blocks(
                d.astype(jnp.uint8), c, addr_abs, max_packets=max_packets,
                min_packet_length=codec_key[1], max_packet_length=codec_key[2],
            )
        out["packet"] = out["packet"].astype(jnp.uint8)
        return out

    from jax import shard_map

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("chain", "time"),) * 4,
        out_specs=P("chain", "time"),
        check_vma=False,
    )
    return jax.jit(fn)(data, addr, count, sync)


def run_banked_sharded(chains, audio: np.ndarray, mesh: Mesh, dtype=None,
                       block_seconds: float = 16.0, overlap_seconds: float = 6.0,
                       method: str = "auto", unroll: int = 8,
                       codec: str = "device", max_packets_per_block: int = 8,
                       total_candidates: int | None = None):
    """Sharded analog of bank.run_banked over an existing mesh.

    Bank chain counts must divide the mesh 'chain' axis size evenly (pad
    your sweep banks); the block count is rounded up to a multiple of the
    'time' axis.  Audio is framed host-side and sharded over ``time`` --
    per-device input memory is ~n_audio/n_time plus the per-block halo.

    codec: 'host' runs the reference-exact FSMs on device-computed sync
    candidates; 'device' runs the batched on-device codecs per shard
    (fixed-capacity packet buffers, no host byte-stream transfer) when
    every chain in a bank shares codec options.
    """
    from ..config import IL2PCodecSpec
    from .bank import (
        _bank_uniform_codec,
        _dedup_block_boundary,
        host_decode_block,
        packets_from_device_out,
    )

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    audio = np.asarray(audio)
    n_chain = mesh.shape["chain"]
    n_time = mesh.shape["time"]
    results: dict[str, list] = {}
    for bank in bank_mod.group_chains(list(chains), dtype):
        if len(bank.specs) % n_chain != 0:
            raise ValueError(
                f"bank of {len(bank.specs)} chains does not divide mesh "
                f"chain axis {n_chain}"
            )
        sample_rate = bank.specs[0].modem.sample_rate
        plan = bank_mod.default_block_plan(
            len(audio), bank.trim, sample_rate, block_seconds, overlap_seconds
        )
        # round blocks up to a multiple of the time axis
        n_blocks = -(-plan.n_blocks // n_time) * n_time
        block_len = plan.block_len
        if n_blocks != plan.n_blocks:
            plan = BlockPlan(
                n_audio=plan.n_audio, trim=plan.trim,
                block_len=-(-plan.n_demod // n_blocks),
                overlap=plan.overlap,
            )
            while plan.n_blocks != n_blocks:  # exact tiling
                block_len = plan.block_len + (1 if plan.n_blocks > n_blocks else -1)
                plan = BlockPlan(plan.n_audio, plan.trim, block_len, plan.overlap)
        st = _slicer_static(bank)
        cap = bank_capacity(bank, plan)
        sync_tol = max(
            (
                getattr(c.codec, "sync_tolerance", 0)
                for c in bank.specs
                if isinstance(c.codec, IL2PCodecSpec)
            ),
            default=0,
        )
        from jax.sharding import NamedSharding

        # keep the host->device scatter a numpy array: device_put from host
        # can target a multi-process sharding, a committed single-device
        # jnp array cannot
        frames = frame_blocks_host(audio, plan)
        frames = frames.astype(np.dtype(jnp.dtype(dtype).name), copy=False)
        framed = jax.device_put(frames, NamedSharding(mesh, P("time")))
        data, addr, count, sync = sharded_bank_step(
            mesh, bank.kind, bank.slicer_kind, bank.params,
            framed, plan, cap,
            bank.stream_poly, bank.stream_invert,
            st["state_mask"], st["bits_per_symbol"], sync_tol, method, unroll,
            st["compact_window"],
        )
        codec_key = _bank_uniform_codec(bank) if codec == "device" else None
        if codec_key is not None:
            if codec_key[0] == "il2p" and total_candidates is None:
                # per-shard budget sized from the GLOBAL candidate count --
                # conservative (each shard holds a fraction), always safe
                from .bank import auto_candidate_budget

                total_candidates = auto_candidate_budget(gather_to_host(sync))
            out = sharded_codec_step(
                mesh, codec_key, data, addr, count, sync, plan,
                max_packets=max_packets_per_block,
                total_candidates=total_candidates,
            )
            out = {k: gather_to_host(v) for k, v in out.items()}
            if out.get("dropped") is not None and out["dropped"].any():
                # saturated blocks fall back to the host FSM, which needs
                # the byte streams on host
                data, addr, count, sync = map(
                    gather_to_host, (data, addr, count, sync)
                )
            for name, pkts in packets_from_device_out(
                bank, plan, out, data, addr, count, sync
            ).items():
                results[name] = pkts
            continue
        data, addr, count, sync = map(gather_to_host, (data, addr, count, sync))
        for ci, chain in enumerate(bank.specs):
            packets = []
            for b in range(plan.n_blocks):
                n = int(count[ci, b])
                if n == 0:
                    continue
                offset = b * plan.block_len - plan.overlap
                pkts = host_decode_block(
                    chain,
                    data[ci, b, :n].astype(np.int64),
                    addr[ci, b, :n].astype(np.int64) + offset,
                    sync[ci, b],
                )
                lo, hi = plan.keep_range(b)
                packets.extend(p for p in pkts if lo < p.streamaddress <= hi)
            results[chain.name] = _dedup_block_boundary(packets, chain)
    return results
