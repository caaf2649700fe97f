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
program is exactly the single-device bank program -- including its fast
path: on the device-codec route each shard runs codec + compaction
in-shard with shared static budgets, every shard emits an identically
shaped packed uint8 buffer, and the host performs ONE gather of the
(n_chain, n_time, L) stack per bank.  Budgets come from a two-scalar
device readback (never a full bitmap gather) and are cached per workload
shape, so steady state is demod -> codec -> compaction as one dispatch
chain with a single readback -- the same contract as the single-device
runtime (bank.py _device_codec_submit).  Long recordings bound per-shard
HBM by lax.map-ing the bank pipeline over fixed-size block groups inside
the shard (the sharded analog of bank_device_step_grouped).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from . import bank as bank_mod
from .bank import (
    BlockPlan,
    _budget_bucket,
    _len_bucket,
    _slicer_static,
    _split_compact,
    bank_capacity,
    compact_codec_out,
    packets_from_compact,
)


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
    total = plan.n_blocks * plan.stride_in + plan.block_input_len - plan.stride_in
    padded = np.zeros(total, dtype=np.asarray(audio).dtype)
    padded[plan.front_pad : plan.front_pad + len(audio)] = audio
    stride = padded.strides[0]
    return np.lib.stride_tricks.as_strided(
        padded, (plan.n_blocks, plan.block_input_len),
        (stride * plan.stride_in, stride),
    ).copy()


# ---------------------------------------------------------------------------
# shard_map program builders (memoized: rebuilding jit(shard_map(closure))
# per call would retrace the whole bank program every time)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _bank_step_fn(mesh: Mesh, kind: str, slicer_kind: str, capacity: int,
                  polys: tuple, inverts: tuple, slicer_static_mask: int,
                  slicer_static_bps: int, sync_tolerance: int, method: str,
                  unroll: int, compact_window: int, pallas: bool,
                  group: int | None, slicer_demap: tuple = ()):
    def compute(shard_params, frames):
        # The per-shard program IS the single-device bank program
        # (bank.py _bank_frames_compute -- Pallas loop/slicer kernels on
        # TPU, scan engines elsewhere; the engine choice resolves OUTSIDE
        # the trace so it keys the jit cache); the one cross-shard
        # dependency, the AGC whole-recording max (agc.py:67), enters as
        # a pmax collective over the time axis via normal_fn.  The
        # descrambler (polys/inverts) covers the FULL bank; chain0 selects
        # this shard's window of per-chain masks.
        c_local = int(np.shape(shard_params["sps"])[0])
        chain0 = jax.lax.axis_index("chain") * c_local
        return bank_mod._bank_frames_compute(
            kind, slicer_kind, shard_params, frames, capacity, polys,
            inverts, slicer_static_mask, slicer_static_bps, sync_tolerance,
            method, unroll, compact_window,
            normal_fn=lambda n: jax.lax.pmax(n, "time"), pallas=pallas,
            slicer_demap=slicer_demap, chain0=chain0,
        )

    def shard_fn(shard_params, blocks):
        b_local = blocks.shape[0]
        if group is None or b_local <= group:
            return compute(shard_params, blocks)
        # HBM-bounding group map (the in-shard analog of
        # bank_device_step_grouped): live intermediates scale with the
        # group size, not the shard's share of the recording.  Padded
        # blocks are all-zero audio; their outputs are sliced off.
        g = group
        n_groups = -(-b_local // g)
        bp = jnp.pad(blocks, ((0, n_groups * g - b_local), (0, 0)))
        outs = jax.lax.map(
            lambda fr: compute(shard_params, fr),
            bp.reshape(n_groups, g, bp.shape[-1]),
        )

        def merge(x):
            x = jnp.moveaxis(x, 0, 1)  # (C, G, g, ...)
            return x.reshape(x.shape[0], n_groups * g, *x.shape[3:])[
                :, :b_local
            ]

        return tuple(merge(x) for x in outs)

    from jax import shard_map

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("chain"), P("time")),
        out_specs=(
            P("chain", "time"), P("chain", "time"), P("chain", "time"),
            P("chain", "time"),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_bank_step(mesh: Mesh, kind: str, slicer_kind: str, params,
                      frames: jax.Array, plan: BlockPlan, capacity: int,
                      polys: tuple, inverts: tuple, slicer_static_mask: int,
                      slicer_static_bps: int, sync_tolerance: int = 0,
                      method: str = "auto", unroll: int = 8,
                      compact_window: int = 1, group: int | None = None,
                      slicer_demap: tuple = ()):
    """jit(shard_map(...)) of the full bank program over the mesh.

    params leaves are sharded on their leading chain axis; ``frames``
    (B, block_input_len) is sharded on the block axis over ``time``.
    Returns (data, addr, count, packed_sync) with (C, B, ...) layouts
    sharded over ('chain', 'time').  ``group`` bounds per-shard HBM by
    mapping the pipeline over fixed-size block groups inside each shard.
    """
    n_time = mesh.shape["time"]
    assert frames.shape[0] % n_time == 0, (frames.shape, n_time)
    pallas = bank_mod._pallas_loop_wanted(frames.dtype)
    fn = _bank_step_fn(
        mesh, kind, slicer_kind, capacity, polys, inverts,
        slicer_static_mask,
        slicer_static_bps, sync_tolerance, method, unroll, compact_window,
        pallas, group, slicer_demap,
    )
    return fn(params, frames)


def _shard_codec(codec_key, plan: BlockPlan, max_packets: int,
                 total_candidates: int | None, scan_cap: int,
                 rs_fail_frac: int | None, max_payload: int,
                 d, a, c, s):
    """The per-shard codec body: (C_l, B_l, cap) byte streams -> fixed
    packet buffers.  Absolute stream addresses are computed in-shard from
    the time-axis index."""
    from ..codecs.ax25_device import ax25_decode_blocks
    from ..codecs.il2p_device import il2p_decode_blocks

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
            # see bank._dispatch_codec: live RS rows ~ 1/packet, budget
            # carries a >= 25% margin; overflow -> per-block host fallback
            total_rs_blocks=total_candidates,
            scan_cap=scan_cap,
            rs_fail_frac=rs_fail_frac,
            max_payload=max_payload,
        )
    else:
        out = ax25_decode_blocks(
            d.astype(jnp.uint8), c, addr_abs, max_packets=max_packets,
            min_packet_length=codec_key[1], max_packet_length=codec_key[2],
        )
    # per-block keep window on device (bank.bank_codec_step keep_filter):
    # the sharded plan is always the true global recording, so halo
    # duplicates drop before the in-shard compaction and the gather
    lo = (g * plan.block_len)[None, :, None]
    hi = jnp.minimum(lo + plan.block_len, plan.n_demod)
    a_out = out["address"]
    out["ok"] = out["ok"] & (a_out > lo) & (a_out <= hi)
    out["packet"] = out["packet"].astype(jnp.uint8)
    return out


@lru_cache(maxsize=256)
def _codec_step_fn(mesh: Mesh, codec_key, plan: BlockPlan, max_packets: int,
                   total_candidates: int | None, scan_cap: int,
                   rs_fail_frac: int | None = 2, max_payload: int = 1023):
    from jax import shard_map

    fn = shard_map(
        partial(_shard_codec, codec_key, plan, max_packets,
                total_candidates, scan_cap, rs_fail_frac, max_payload),
        mesh=mesh,
        in_specs=(P("chain", "time"),) * 4,
        out_specs=P("chain", "time"),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_codec_step(mesh: Mesh, codec_key, data, addr, count, sync,
                       plan: BlockPlan, max_packets: int = 8,
                       total_candidates: int | None = None,
                       scan_cap: int = 64, rs_fail_frac: int | None = 2,
                       max_payload: int = 1023):
    """Device codec stage per shard: (C, B, cap) sharded byte streams ->
    fixed-capacity per-shard packet buffers, still sharded over
    ('chain', 'time').  This is the device-side packet gather of SURVEY.md
    section 2.6: each shard fills its own buffers; the host (or an
    all_gather) collects fixed shapes instead of the reference's Queue
    (pymodem.py:158-163)."""
    fn = _codec_step_fn(mesh, codec_key, plan, max_packets,
                        total_candidates, scan_cap, rs_fail_frac,
                        max_payload)
    return fn(data, addr, count, sync)


@lru_cache(maxsize=256)
def _codec_compact_fn(mesh: Mesh, codec_key, plan: BlockPlan,
                      max_packets: int, total_candidates: int | None,
                      scan_cap: int, meta_budget: int, len_budget: int,
                      rs_fail_frac: int | None = 2, max_payload: int = 1023):
    from jax import shard_map

    def shard_fn(d, a, c, s):
        out = _shard_codec(codec_key, plan, max_packets, total_candidates,
                           scan_cap, rs_fail_frac, max_payload, d, a, c, s)
        packed = compact_codec_out(
            out["ok"], out["address"], out["length"], out.get("corrected"),
            out["packet"], meta_budget, len_budget, out.get("dropped"),
        )
        return packed[None, None, :]

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("chain", "time"),) * 4,
        out_specs=P("chain", "time"),
        check_vma=False,
    )
    return jax.jit(fn)


@lru_cache(maxsize=256)
def _compact_only_fn(mesh: Mesh, has_corrected: bool, meta_budget: int,
                     len_budget: int):
    from jax import shard_map

    if has_corrected:
        def shard_fn(ok, address, length, corrected, packet, dropped):
            packed = compact_codec_out(ok, address, length, corrected,
                                       packet, meta_budget, len_budget,
                                       dropped)
            return packed[None, None, :]
        n_in = 6
    else:
        def shard_fn(ok, address, length, packet, dropped):
            packed = compact_codec_out(ok, address, length, None, packet,
                                       meta_budget, len_budget, dropped)
            return packed[None, None, :]
        n_in = 5
    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=(P("chain", "time"),) * n_in,
        out_specs=P("chain", "time"), check_vma=False,
    )
    return jax.jit(fn)


def sharded_compact_only(mesh: Mesh, out: dict, meta_budget: int,
                         len_budget: int):
    """Per-shard compaction over an ALREADY-COMPUTED codec output: the
    sizing path holds the codec buffers on device, so only the packing
    re-runs with the exact budgets (the fused codec+compact step would
    re-execute the whole decode)."""
    has_corr = out.get("corrected") is not None
    fn = _compact_only_fn(mesh, has_corr, meta_budget, len_budget)
    args = (out["ok"], out["address"], out["length"])
    if has_corr:
        args += (out["corrected"],)
    args += (out["packet"], out["dropped"])
    return fn(*args)


def sharded_codec_compact_step(mesh: Mesh, codec_key, data, addr, count,
                               sync, plan: BlockPlan, max_packets: int,
                               total_candidates: int | None, scan_cap: int,
                               meta_budget: int, len_budget: int,
                               rs_fail_frac: int | None = 2,
                               max_payload: int = 1023):
    """Fused per-shard codec + compaction: every shard emits one packed
    uint8 buffer (bank.compact_codec_out layout) of identical static size,
    stacked as (n_chain, n_time, L) -- ONE gather collects every shard's
    packets.  The sharded analog of the single-device steady-state path."""
    fn = _codec_compact_fn(mesh, codec_key, plan, max_packets,
                           total_candidates, scan_cap, meta_budget,
                           len_budget, rs_fail_frac, max_payload)
    return fn(data, addr, count, sync)


# ---------------------------------------------------------------------------
# Device-side budget sizing (two-scalar readbacks, never a bitmap gather)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_chain", "n_time"))
def _shard_sync_stats(sync, n_chain: int, n_time: int):
    """(max per-shard candidate total, max candidates in any block) of the
    global packed sync bitmap -- the reductions run on device (sharded),
    only two scalars transfer.  Replaces gathering the whole (C, B, cap)
    bitmap to host (the round-2 slow path)."""
    pc = jax.lax.population_count(sync.astype(jnp.uint8)).astype(jnp.int32)
    per_block = jnp.sum(pc, axis=-1)  # (C, B)
    C, B = per_block.shape
    tiles = per_block.reshape(n_chain, C // n_chain, n_time, B // n_time)
    per_shard = jnp.sum(tiles, axis=(1, 3))
    return jnp.stack([jnp.max(per_shard), jnp.max(per_block)])


@partial(jax.jit, static_argnames=("n_chain", "n_time"))
def _shard_out_stats(ok, length, n_chain: int, n_time: int):
    """(max per-shard valid packets, global max packet length) of the codec
    output -- sizes the per-shard compaction budgets in one readback."""
    C, B, Pk = ok.shape
    okr = ok.reshape(n_chain, C // n_chain, n_time, B // n_time, Pk)
    lenr = jnp.where(okr, length.reshape(okr.shape).astype(jnp.int32), 0)
    per_shard = jnp.sum(okr.astype(jnp.int32), axis=(1, 3, 4))
    return jnp.stack([jnp.max(per_shard), jnp.max(lenr)])


def _scan_cap_bucket(max_per_block: int) -> int:
    cap = 8
    while cap < min(max_per_block, 64):
        cap *= 2
    return cap


# Steady-state per-shard codec budgets per (codec options, block geometry,
# bank/mesh shape): a repeat call with the same workload shape skips both
# sizing readbacks and runs demod -> codec -> compaction as one dispatch
# chain with a SINGLE packed gather.  Undershoot is always detectable
# (``dropped`` per block; compaction overflow from the sizes carried in
# each shard's packed buffer), so correctness never depends on the cache.
_SHARDED_BUDGET_CACHE: dict = {}


def _merge_shard_compacts(packed: np.ndarray, has_corrected: bool,
                          meta_budget: int, len_budget: int,
                          c_local: int, b_local: int):
    """Merge per-shard packed buffers (n_chain, n_time, L) into one global
    compact dict (local chain/block indices -> global, byte bases offset
    by the preceding shards' streams).

    Returns (n_ok_total, shard_ok_max, max_len, comp, dropped)."""
    n_chain, n_time = packed.shape[:2]
    keys = [k for k in bank_mod.COMPACT_META_KEYS
            if has_corrected or k != "corrected"]
    merged: dict[str, list] = {k: [] for k in keys}
    bytes_parts: list[np.ndarray] = []
    dropped = np.zeros((n_chain * c_local, n_time * b_local), np.int32)
    n_ok_total = 0
    shard_ok_max = 0
    max_len_all = 0
    byte_off = 0
    for i in range(n_chain):
        for j in range(n_time):
            sizes, comp, drp = _split_compact(
                packed[i, j], meta_budget, len_budget, has_corrected,
                (c_local, b_local),
            )
            n_ok, _total_bytes, max_len = sizes
            shard_ok_max = max(shard_ok_max, n_ok)
            max_len_all = max(max_len_all, max_len)
            n_keep = min(n_ok, meta_budget)
            for k in keys:
                v = comp[k][:n_keep].astype(np.int64)
                if k == "chain":
                    v = v + i * c_local
                elif k == "block":
                    v = v + j * b_local
                elif k == "base":
                    v = v + byte_off
                merged[k].append(v)
            bytes_parts.append(comp["bytes"])
            byte_off += len(comp["bytes"])
            dropped[i * c_local:(i + 1) * c_local,
                    j * b_local:(j + 1) * b_local] = drp
            n_ok_total += n_keep
    comp_all = {
        k: (np.concatenate(v) if v else np.zeros(0, np.int64))
        for k, v in merged.items()
    }
    comp_all["bytes"] = (
        np.concatenate(bytes_parts) if bytes_parts
        else np.zeros(0, np.uint8)
    )
    return n_ok_total, shard_ok_max, max_len_all, comp_all, dropped


def _sharded_codec_submit(mesh: Mesh, bank, plan: BlockPlan, codec_key,
                          data, addr, count, sync, max_packets: int,
                          total_candidates: int | None):
    """Dispatch the per-shard codec + compaction; return a collect()
    closure performing the single packed gather and the packet build.

    Mirrors bank._device_codec_submit: on a budget-cache hit everything
    dispatches now (zero sync points until collect); on a miss the exact
    sizing reads back two scalar pairs first."""
    from .. import profiling

    n_chain, n_time = mesh.shape["chain"], mesh.shape["time"]
    C, B = data.shape[:2]
    c_local, b_local = C // n_chain, B // n_time
    pay0 = (
        bank_mod._il2p_payload_budget(bank, plan)
        if codec_key[0] == "il2p" else 1023
    )
    Lmax = (
        16 + pay0 + 2 if codec_key[0] == "il2p" else codec_key[2] + 2
    )
    cache_key = (codec_key, plan, (C, B), max_packets, (n_chain, n_time))
    cached = (
        _SHARDED_BUDGET_CACHE.get(cache_key)
        if total_candidates is None
        else None
    )

    def run_exact(mp, cand_budget, scan_cap, rs_frac, pay_budget):
        with profiling.timed("sharded_codec_sizing"):
            out = sharded_codec_step(
                mesh, codec_key, data, addr, count, sync, plan,
                max_packets=mp, total_candidates=cand_budget,
                scan_cap=scan_cap, rs_fail_frac=rs_frac,
                max_payload=pay_budget,
            )
            shard_ok_max, max_len = (
                int(v) for v in np.asarray(
                    _shard_out_stats(out["ok"], out["length"],
                                     n_chain, n_time)
                )
            )
        meta_budget = _budget_bucket(shard_ok_max)
        len_budget = _len_bucket(max_len, Lmax)
        with profiling.timed("sharded_codec_compact"):
            # compaction ONLY: the codec buffers from the sizing step are
            # still on device, so the decode does not run a second time
            packed = sharded_compact_only(mesh, out, meta_budget, len_budget)
        with profiling.timed("sharded_codec_transfer"):
            flat = gather_to_host(packed)
        n_ok, _s, _m, comp, dropped = _merge_shard_compacts(
            flat, codec_key[0] == "il2p", meta_budget, len_budget,
            c_local, b_local,
        )
        return n_ok, meta_budget, len_budget, comp, dropped

    def resolve(mp, cand_budget, scan_cap, rs_frac, pay_budget, n_ok,
                meta_budget, len_budget, comp, dropped):
        # per-block budget saturation escalates ON DEVICE, like
        # bank._device_codec_submit; host FSM only past MP_CAP
        while dropped.any() and mp < bank_mod.MP_CAP:
            with profiling.timed("sharded_codec_escalate"):
                mp = mp * 2
                scan_cap = min(scan_cap * 2, 128)
                rs_frac = None  # see bank._device_codec_submit.resolve
                pay_budget = 1023
                if total_candidates is None and cand_budget is not None:
                    cand_budget = cand_budget * 2
                n_ok, meta_budget, len_budget, comp, dropped = run_exact(
                    mp, cand_budget, scan_cap, rs_frac, pay_budget
                )
        if dropped.any():
            _SHARDED_BUDGET_CACHE.pop(cache_key, None)
            arrays = tuple(
                gather_to_host(x) for x in (data, addr, count, sync)
            )
        else:
            if total_candidates is None:
                _SHARDED_BUDGET_CACHE[cache_key] = (
                    bank_mod._merge_budget_entry(
                        _SHARDED_BUDGET_CACHE.get(cache_key),
                        (mp, cand_budget, scan_cap, meta_budget,
                         len_budget, rs_frac, pay_budget),
                    )
                )
            arrays = (data, addr, count, sync)
        return packets_from_compact(
            bank, plan, comp, n_ok, dropped, *arrays
        )

    if cached is not None:
        # speculative steady-state path: ZERO readbacks before the packed
        # gather -- demod, codec and compaction queue back-to-back on the
        # devices; the single gather at the end synchronizes everything
        (mp0, cand_budget, scan_cap, meta_budget0, len_budget0, rs_frac0,
         payc) = cached
        with profiling.timed("sharded_codec_step"):
            packed = sharded_codec_compact_step(
                mesh, codec_key, data, addr, count, sync, plan,
                mp0, cand_budget, scan_cap, meta_budget0, len_budget0,
                rs_frac0, payc,
            )

        def collect_cached():
            meta_budget, len_budget = meta_budget0, len_budget0
            with profiling.timed("sharded_codec_transfer"):
                flat = gather_to_host(packed)
            n_ok, shard_ok_max, max_len, comp, dropped = (
                _merge_shard_compacts(
                    flat, codec_key[0] == "il2p", meta_budget, len_budget,
                    c_local, b_local,
                )
            )
            if shard_ok_max > meta_budget or max_len > len_budget:
                # cached compaction budgets overflowed (workload grew):
                # redo with exact budgets -- the cache only saves trips
                # (run_exact re-runs the codec once; the fused cached
                # step's buffers were not kept)
                with profiling.timed("sharded_codec_redo"):
                    _SHARDED_BUDGET_CACHE.pop(cache_key, None)
                    n_ok, meta_budget, len_budget, comp, dropped = (
                        run_exact(mp0, cand_budget, scan_cap, rs_frac0,
                                  payc)
                    )
            return resolve(mp0, cand_budget, scan_cap, rs_frac0, payc, n_ok,
                           meta_budget, len_budget, comp, dropped)

        return collect_cached

    def collect():
        scan_cap = 64
        cand_budget = total_candidates
        mp = max_packets
        if codec_key[0] == "il2p" and total_candidates is None:
            with profiling.timed("sharded_candidate_budget"):
                shard_total, max_pb = (
                    int(v) for v in np.asarray(
                        _shard_sync_stats(sync, n_chain, n_time)
                    )
                )
            cand_budget = _budget_bucket(shard_total)
            scan_cap = _scan_cap_bucket(max_pb)
            # right-size packet slots from the busiest block's candidates
            # (see bank._auto_max_packets) -- avoids escalation recompiles
            mp = bank_mod._auto_max_packets(
                max_pb, max_packets, c_local * b_local, Lmax,
            )
        frac0 = bank_mod._rs_frac_default()
        n_ok, meta_budget, len_budget, comp, dropped = run_exact(
            mp, cand_budget, scan_cap, frac0, pay0
        )
        return resolve(mp, cand_budget, scan_cap, frac0, pay0, n_ok,
                       meta_budget, len_budget, comp, dropped)

    return collect


_PAD_PREFIX = "__pad"


def _reorder_pad_bank(bank, n_chain: int, subgroups):
    """Reorder a bank's chains so codec sub-groups are contiguous, padding
    each sub-group to a multiple of the mesh chain axis with duplicate
    chains (clones of the sub-group's first chain under reserved
    ``__pad...`` names whose results are discarded).

    This is how the sharded runtime gets BOTH round-4 single-device
    features without new kernel code: a mixed-codec bank becomes a list
    of contiguous, shard-aligned chain slices -- one _sharded_codec_submit
    per slice -- and a bank whose chain count doesn't divide the mesh
    chain axis gains masked dead lanes instead of raising.  Padded chains
    demod garbage that is never read (their packets are dropped by name),
    matching the reference's free codec mixing across its process pool
    (chain_builder.py:64-68, pymodem.py:140-166).

    ``subgroups``: bank._codec_subgroups output, or None (host-codec path:
    one group of all chains).  Returns (new_bank, [(codec_key, lo, hi)]).
    """
    from dataclasses import replace as _replace

    if subgroups is None:
        subgroups = [(None, list(range(len(bank.specs))))]
    perm: list[int] = []
    specs: list = []
    polys: list = []
    inverts: list = []
    slices: list[tuple] = []
    n_pad = 0
    for key, idxs in subgroups:
        lo = len(perm)
        pad = -len(idxs) % n_chain
        for i in idxs:
            perm.append(i)
            specs.append(bank.specs[i])
            polys.append(bank.stream_polys[i])
            inverts.append(bank.stream_inverts[i])
        for _ in range(pad):
            i0 = idxs[0]
            s0 = bank.specs[i0]
            perm.append(i0)
            specs.append(_replace(s0, name=f"{_PAD_PREFIX}{n_pad}~{s0.name}"))
            polys.append(bank.stream_polys[i0])
            inverts.append(bank.stream_inverts[i0])
            n_pad += 1
        slices.append((key, lo, len(perm)))
    if perm == list(range(len(bank.specs))):
        return bank, slices  # already contiguous and aligned
    perm_a = np.asarray(perm)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x)[perm_a], bank.params
    )
    new_bank = _replace(
        bank, specs=specs, params=params,
        stream_polys=tuple(polys), stream_inverts=tuple(inverts),
    )
    return new_bank, slices


def run_banked_sharded(chains, audio: np.ndarray, mesh: Mesh, dtype=None,
                       block_seconds: float | str = "auto",
                       overlap_seconds: float | str = "auto",
                       method: str = "auto", unroll: int = 8,
                       codec: str = "device", max_packets_per_block: int = 8,
                       total_candidates: int | None = None,
                       max_blocks_per_step: int | None | str = "auto",
                       max_packet_seconds: float | None = None):
    """Sharded analog of bank.run_banked over an existing mesh.

    Any chain count works: banks whose chain count doesn't divide the
    mesh 'chain' axis are padded with dead duplicate lanes whose results
    are discarded (_reorder_pad_bank), and the block count is rounded up
    to a multiple of the 'time' axis.  Audio is framed host-side and
    sharded over ``time`` -- per-device input memory is ~n_audio/n_time
    plus the per-block halo, and per-shard working HBM is bounded by the
    in-shard block-group map (``max_blocks_per_step``; 'auto' sizes
    groups like the single-device runtime).

    codec: 'host' runs the reference-exact FSMs on device-computed sync
    candidates; 'device' (default) runs the batched on-device codecs per
    shard into fixed-capacity packet buffers, compacted in-shard and
    gathered as ONE packed buffer per bank slice (_sharded_codec_submit).
    Banks mixing codec OPTIONS (the reference's free codec mixing,
    chain_builder.py:64-68) reorder into contiguous per-codec sub-group
    slices and dispatch one device codec per slice -- no chain drops to
    the host FSM for having a different-protocol neighbour.
    """
    from ..config import IL2PCodecSpec
    from .bank import (
        _dedup_block_boundary,
        auto_blocks_per_step,
        host_decode_block,
    )

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    audio = np.asarray(audio)
    n_chain = mesh.shape["chain"]
    n_time = mesh.shape["time"]
    results: dict[str, list] = {}
    for bank0 in bank_mod.group_chains(list(chains), dtype):
        sample_rate = bank0.specs[0].modem.sample_rate
        # the SAME plan as the single-device runtime (plan_bank_run aligns
        # auto geometry to the recording) -- block boundaries must match it
        # exactly so packets are identical; the plan comes from the
        # UNPADDED bank for the same reason (padding must not change
        # geometry), and only the per-shard group is re-chosen below for
        # the per-device HBM budget
        plan, _ = bank_mod.plan_bank_run(
            bank0, len(audio), sample_rate, dtype, block_seconds,
            overlap_seconds, max_packet_seconds, "auto",
        )
        groups0 = (
            bank_mod._codec_subgroups(bank0) if codec == "device" else None
        )
        bank, slices = _reorder_pad_bank(bank0, n_chain, groups0)
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
        group = max_blocks_per_step
        if group == "auto":
            # post-resample intermediates are up x larger than the input
            # block (same accounting as the single-device dispatcher)
            group = auto_blocks_per_step(
                len(bank.specs) // n_chain, plan.block_input_len * plan.up,
                plan.n_blocks // n_time, dtype,
            )
        from jax.sharding import NamedSharding

        # keep the host->device scatter a numpy array: device_put from host
        # can target a multi-process sharding, a committed single-device
        # jnp array cannot
        frames = frame_blocks_host(audio, plan)
        # round the block count up to a multiple of the time axis with
        # all-zero blocks (they decode nothing and keep_range clips past
        # n_demod) -- block boundaries stay IDENTICAL to the single-device
        # plan, so packets match it exactly
        pad_rows = -(-plan.n_blocks // n_time) * n_time - plan.n_blocks
        if pad_rows:
            frames = np.concatenate(
                [frames, np.zeros((pad_rows, frames.shape[1]), frames.dtype)]
            )
        frames = frames.astype(np.dtype(jnp.dtype(dtype).name), copy=False)
        framed = jax.device_put(frames, NamedSharding(mesh, P("time")))
        data, addr, count, sync = sharded_bank_step(
            mesh, bank.kind, bank.slicer_kind, bank.params,
            framed, plan, cap,
            bank.stream_polys, bank.stream_inverts,
            st["state_mask"], st["bits_per_symbol"], sync_tol, method, unroll,
            st["compact_window"], group=group, slicer_demap=st["demap"],
        )
        if groups0 is not None:
            # one _sharded_codec_submit per contiguous, shard-aligned codec
            # sub-group slice (see _reorder_pad_bank) -- every sub-group
            # dispatches before any gather, exactly like the single-device
            # _device_codec_submit_mixed
            C = len(bank.specs)
            collects = []
            for key, lo, hi in slices:
                sub = bank_mod._bank_chain_subset(bank, list(range(lo, hi)))
                args = (
                    (data, addr, count, sync)
                    if (lo, hi) == (0, C)
                    else tuple(x[lo:hi] for x in (data, addr, count, sync))
                )
                collects.append(_sharded_codec_submit(
                    mesh, sub, plan, key, *args,
                    max_packets_per_block, total_candidates,
                ))
            for collect in collects:
                results.update({
                    name: pkts for name, pkts in collect().items()
                    if not name.startswith(_PAD_PREFIX)
                })
            continue
        data, addr, count, sync = map(gather_to_host, (data, addr, count, sync))
        for ci, chain in enumerate(bank.specs):
            if chain.name.startswith(_PAD_PREFIX):
                continue
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
