"""IL2P decode fully on device: batched bit/GF kernels, no host FSM.

Strategy (contrast with the reference's per-bit FSM, il2p.py:360-519): the
sync scan (ops/sync.py) yields candidate bit positions; every candidate is
decoded *independently* in fixed shapes -- header + up to MAX_BLOCKS
Reed-Solomon payload blocks + Hamming CRC trailer -- with all candidates
batched through the vectorized RS decoder (ops/rs.py rs_decode_jax).  A
final tiny scan over the (few) candidates enforces the FSM's consumption
rule: a sync match inside an already-consumed packet span is ignored.
Redundant decode work on overlapping candidates is negligible because
candidates are rare (2^-24 per bit in noise).

Known deviation from the bit-serial reference: sync matches that depend on
carried word history (the 0xFFFFFF seed in a stream's first 32 bits, or the
last consumed byte right after a packet) are not in the pure-bit candidate
map; probability < 2^-20 per boundary, and the exact host path
(codecs/host.py) remains available for parity runs.

Outputs are fixed-capacity packet buffers: (MAX_PACKETS, MAX_PACKET_LEN)
bytes + lengths + stream addresses + validity/corrected counts, ready for
all_gather across shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rs as rs_ops
from ..ops.bits import bytes_to_bits_msb
from ..ops.crc import crc16_masked
from ..ops.hamming import HAMMING74_DECODE
from ..ops.lfsr import descramble_bytes
from .host import PID_TABLE, SCRAMBLE_POLY, SCRAMBLE_SEED, U_CONTROL

MAX_BLOCKS = 5  # ceil(1023 / 239), il2p.py:346-358
MAX_PAYLOAD = 1023
MAX_AX25_HEADER = 16
MAX_PACKET_LEN = MAX_AX25_HEADER + MAX_PAYLOAD + 2
# numpy (not jnp): these must stay host constants -- building device arrays
# at import time leaks tracers when the module is first imported inside a
# jit trace.
_HAMMING = HAMMING74_DECODE.astype(np.int32)
_PID = np.asarray(PID_TABLE, dtype=np.int32)
_UCTL = np.asarray(U_CONTROL, dtype=np.int32)


def _parse_header(buf):
    """Unpack 13 descrambled header bytes (il2p.py:214-290).  buf: (13,)."""
    i10 = jnp.arange(10)
    count = jnp.sum(
        jnp.where((buf[i10 + 2] & 0x80) != 0, 0x200 >> i10, 0)
    ).astype(jnp.int32)
    i4 = jnp.arange(4)
    pid = jnp.sum(jnp.where((buf[i4 + 1] & 0x40) != 0, 0x8 >> i4, 0)).astype(jnp.int32)
    i7 = jnp.arange(7)
    control = jnp.sum(
        jnp.where((buf[i7 + 5] & 0x40) != 0, 0x40 >> i7, 0)
    ).astype(jnp.int32)
    header_type = (buf[1] & 0x80) >> 7
    ui = (buf[0] & 0x40) != 0
    dest = (buf[:6] & 0x3F) + 0x20
    dest_ssid = buf[12] >> 4
    source = (buf[6:12] & 0x3F) + 0x20
    source_ssid = buf[12] & 0xF
    return count, pid, control, header_type, ui, dest, dest_ssid, source, source_ssid


def _ax25_header(count, pid, control, header_type, ui, dest, dest_ssid,
                 source, source_ssid):
    """Re-synthesize the AX.25 header (il2p.py:292-344) in fixed shape.

    Returns (header_bytes (16,), header_len).  Type-0 -> length 0.
    """
    # frame type: UI > (pid==0 -> S) > (pid==1 -> U) > I
    is_ui = ui
    is_s = (~ui) & (pid == 0)
    is_u = (~ui) & (pid == 1)
    is_i = (~ui) & (pid > 1)

    pf_bit = (control & 0x40) != 0
    ns = control & 0x7
    nr = (control >> 3) & 0x7
    c_bit = jnp.where(is_i, True, (control & 0x4) != 0)
    opcode = jnp.where(is_s, control & 0x3, (control >> 3) & 0x7)

    out = jnp.zeros((MAX_AX25_HEADER,), jnp.int32)
    out = out.at[0:6].set(dest.astype(jnp.int32) << 1)
    dssid = (dest_ssid.astype(jnp.int32) << 1) + 0x60 + jnp.where(c_bit, 0x80, 0)
    out = out.at[6].set(dssid)
    out = out.at[7:13].set(source.astype(jnp.int32) << 1)
    sssid = (source_ssid.astype(jnp.int32) << 1) + 0x60 + jnp.where(c_bit, 0, 0x80) + 1
    out = out.at[13].set(sssid)

    u_ctl = jnp.asarray(_UCTL)[jnp.clip(opcode, 0, 7)] | jnp.where(pf_bit, 0x10, 0)
    s_ctl = 0x1 | (opcode << 2) | (nr << 5) | jnp.where(pf_bit, 0x10, 0)
    i_ctl = (ns << 1) | (nr << 5) | jnp.where(pf_bit, 0x10, 0)
    control_byte = jnp.where(is_u | is_ui, u_ctl, jnp.where(is_s, s_ctl, i_ctl))
    out = out.at[14].set(control_byte)

    pid_byte = jnp.asarray(_PID)[jnp.clip(pid, 0, 15)]
    has_pid = pid_byte != 0
    out = out.at[15].set(pid_byte)
    length = jnp.where(header_type == 1, jnp.where(has_pid, 16, 15), 0)
    # when pid is omitted the byte at 15 must not be kept
    out = out.at[15].set(jnp.where(has_pid, pid_byte, 0))
    return out, length.astype(jnp.int32)


def _descramble_fixed(data, n_valid):
    """Device block descramble (il2p.py:160-163): feed-forward XOR with the
    0x211/0x1F0 seed over the first n_valid bytes; rest passed through."""
    out = descramble_bytes(data.astype(jnp.uint8), SCRAMBLE_POLY,
                           seed=SCRAMBLE_SEED).astype(jnp.int32)
    idx = jnp.arange(data.shape[-1])
    return jnp.where(idx < n_valid, out, data.astype(jnp.int32))


def _pack_bytes_at(byte_row, bit_pos, count):
    """Extract ``count`` bytes starting at bit offset ``bit_pos`` from a
    byte array (MSB-first bit order): out[i] spans source bytes
    bit_pos//8 + i and +1.  Two byte gathers + shifts per output byte --
    ~20x less gather traffic than unpacking to a bit array first."""
    sh = (bit_pos % 8).astype(jnp.int32)
    byte0 = bit_pos // 8
    idx = byte0 + jnp.arange(count)
    b0 = jnp.take(byte_row, idx, mode="fill", fill_value=0).astype(jnp.int32)
    b1 = jnp.take(byte_row, idx + 1, mode="fill", fill_value=0).astype(jnp.int32)
    return ((b0 << sh) | (b1 >> (8 - sh))) & 0xFF


@partial(jax.jit, static_argnames=("max_packets", "collect_crc", "disable_rs",
                                   "min_distance", "total_candidates",
                                   "total_rs_blocks"))
def il2p_decode_blocks(data: jax.Array, sync_packed: jax.Array,
                       counts: jax.Array, addresses: jax.Array,
                       max_packets: int = 8, collect_crc: bool = True,
                       disable_rs: bool = False, min_distance: int = 0,
                       total_candidates: int | None = None,
                       total_rs_blocks: int | None = None):
    """Decode IL2P packets from byte-stream blocks, fully on device.

    data: (..., K) uint8 descrambled stream bytes; sync_packed: (..., K)
    uint8 packed candidate bitmap (ops/sync.py); counts: (...,) valid byte
    counts; addresses: (..., K) per-byte stream addresses.

    Returns dict of (..., max_packets, ...) arrays: ``packet`` bytes,
    ``length``, ``address``, ``ok`` (structurally complete), ``crc_ok``,
    ``corrected``, plus per-block ``dropped`` counts (see
    _il2p_decode_flat).

    ``total_candidates``: global candidate-slot capacity across the whole
    batch (default blocks * max_packets).  ``total_rs_blocks``: global
    payload-RS-row budget (default 2 * total_candidates; most packets use
    one payload block, the 5-slot worst case is rare).  Decode work scales
    with these budgets, not with blocks x max_packets; undershoot marks the
    affected stream blocks ``dropped`` so callers can fall back.
    """
    batch_shape = data.shape[:-1]
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch_shape):])
    out = _il2p_decode_flat(
        flat(data), flat(sync_packed), counts.reshape(-1), flat(addresses),
        max_packets, collect_crc, disable_rs, min_distance, total_candidates,
        total_rs_blocks,
    )
    return {k: v.reshape(batch_shape + v.shape[1:]) for k, v in out.items()}


def _il2p_decode_flat(data, sync_packed, counts, addresses, max_packets,
                      collect_crc, disable_rs, min_distance,
                      total_candidates=None, total_rs_blocks=None):
    """Globally candidate-compacted decode.

    Candidates are compacted ACROSS the whole (flattened) block batch before
    any decode work: with T total candidate slots (~2 per block on average)
    the expensive batched RS decodes scale with actual traffic instead of
    blocks x max_packets.  Candidate order (block, pos) is preserved by the
    compaction, so one scan with per-block resets enforces the FSM's span-
    consumption rule; results scatter back to (N, max_packets) slots.
    """
    N, K = data.shape
    n_bits_total = K * 8
    # global candidate capacity: defaults to the per-block guarantee; cap it
    # (e.g. ~2-4x the expected packet count) on sparse workloads so RS work
    # scales with traffic instead of blocks x max_packets
    T = total_candidates if total_candidates else N * max_packets
    T = max(T, 8)

    bit_idx = jnp.arange(n_bits_total)
    cand = bytes_to_bits_msb(sync_packed).astype(jnp.bool_)
    cand = cand & (bit_idx[None, :] < (counts * 8)[:, None])

    # ---- global compaction: flat index = block * K8 + pos (sorted) ----
    flat = cand.reshape(-1)
    csum = jnp.cumsum(flat.astype(jnp.int32))
    total = csum[-1]
    slots = jnp.arange(1, T + 1)
    src = jnp.clip(jnp.searchsorted(csum, slots), 0, N * n_bits_total - 1)
    cand_valid = slots <= total
    blk = (src // n_bits_total).astype(jnp.int32)
    pos = (src % n_bits_total).astype(jnp.int32)
    n_bits_of = counts[blk] * 8  # (T,)

    rows = jnp.take(data, blk, axis=0).astype(jnp.int32)  # (T, K) byte rows

    # ---- per-candidate fixed-shape decode (vmapped over T) ----
    hdr_raw = jax.vmap(lambda row, p: _pack_bytes_at(row, p + 1, 15))(rows, pos)
    if disable_rs:
        hdr_corr, hdr_res = hdr_raw, jnp.zeros((T,), jnp.int32)
    else:
        hdr_corr, hdr_res = rs_ops.rs_decode_jax(
            hdr_raw, jnp.full((T,), 15, jnp.int32),
            num_roots=2, min_distance=min_distance,
        )
    hdr = jax.vmap(lambda h: _descramble_fixed(h[:13], 13))(hdr_corr)

    parsed = jax.vmap(_parse_header)(hdr)
    count = jnp.clip(parsed[0], 0, MAX_PAYLOAD)
    ax25, ax25_len = jax.vmap(_ax25_header)(*parsed)

    # block layout (il2p.py:346-358)
    block_count = jnp.maximum(-(-count // 239), 0)
    base_size = jnp.where(block_count > 0, count // jnp.maximum(block_count, 1), 0)
    big_blocks = count - block_count * base_size
    k_idx = jnp.arange(MAX_BLOCKS)[None, :]
    sizes = jnp.where(
        k_idx < big_blocks[:, None], base_size[:, None] + 1,
        jnp.where(k_idx < block_count[:, None], base_size[:, None], 0),
    )  # (T, MB)
    coded_sizes = jnp.where(sizes > 0, sizes + 16, 0)
    block_bit_off = 120 + 8 * (jnp.cumsum(coded_sizes, axis=1) - coded_sizes)

    blocks_raw = jax.vmap(
        lambda row, p, offs: jax.vmap(
            lambda o: _pack_bytes_at(row, p + 1 + o, 255)
        )(offs)
    )(rows, pos, block_bit_off)  # (T, MB, 255)

    rs_overflow = jnp.zeros((T,), jnp.bool_)
    if disable_rs:
        blocks_corr = blocks_raw
        blk_res = jnp.zeros((T, MAX_BLOCKS), jnp.int32)
    else:
        # Compact the LIVE (candidate, slot) pairs before the expensive
        # 16-root RS decode: nearly all packets use one payload block, so
        # decoding all T*MAX_BLOCKS slots wastes ~5x RS work.  Budget
        # overflow marks the candidate (host fallback via ``dropped``).
        Rb = total_rs_blocks if total_rs_blocks else 2 * T
        Rb = min(max(Rb, 8), T * MAX_BLOCKS)
        flat_sizes = coded_sizes.reshape(-1)  # (T*MB,)
        live = flat_sizes > 0
        lcsum = jnp.cumsum(live.astype(jnp.int32))
        n_live = lcsum[-1]
        rs_slots = jnp.arange(1, Rb + 1)
        rs_src = jnp.clip(
            jnp.searchsorted(lcsum, rs_slots), 0, T * MAX_BLOCKS - 1
        )
        rs_valid = rs_slots <= n_live
        rows_rs = jnp.take(blocks_raw.reshape(-1, 255), rs_src, axis=0)
        sizes_rs = jnp.maximum(jnp.take(flat_sizes, rs_src), 1)
        bc_c, br_c = rs_ops.rs_decode_jax(
            jnp.where(rs_valid[:, None], rows_rs, 0), sizes_rs,
            num_roots=16, min_distance=min_distance,
        )
        # scatter back: flat slot -> its compact row (or none on overflow)
        dest = lcsum - 1  # compact index of each live flat slot
        in_budget = live & (dest < Rb)
        safe_dest = jnp.clip(dest, 0, Rb - 1)
        blocks_corr = jnp.where(
            in_budget[:, None],
            jnp.take(bc_c, safe_dest, axis=0),
            blocks_raw.reshape(-1, 255),
        ).reshape(T, MAX_BLOCKS, 255)
        blk_res = jnp.where(
            in_budget, jnp.take(br_c, safe_dest), 0
        ).reshape(T, MAX_BLOCKS)
        rs_overflow = jnp.any(
            (live & ~in_budget).reshape(T, MAX_BLOCKS), axis=1
        )

    blocks_plain = jax.vmap(
        jax.vmap(_descramble_fixed, in_axes=(0, 0)), in_axes=(0, 0)
    )(blocks_corr, sizes)

    # gather payload bytes: payload[i] lives in block k(i) at i - start_k
    pay_idx = jnp.arange(MAX_PAYLOAD)[None, :]
    starts = jnp.cumsum(sizes, axis=1) - sizes
    k_of = jnp.sum(
        (pay_idx[:, :, None] >= starts[:, None, :]) & (sizes[:, None, :] > 0),
        axis=2,
    ) - 1
    k_of = jnp.clip(k_of, 0, MAX_BLOCKS - 1)
    within = pay_idx - jnp.take_along_axis(starts, k_of, axis=1)
    payload = jnp.take_along_axis(
        blocks_plain.reshape(T, -1), k_of * 255 + jnp.clip(within, 0, 254),
        axis=1,
    )  # (T, MP)

    # trailing CRC (il2p.py:503-518)
    crc_off = 120 + 8 * jnp.sum(coded_sizes, axis=1)
    crc_raw = jax.vmap(lambda row, p, off: _pack_bytes_at(row, p + 1 + off, 4))(
        rows, pos, crc_off
    )
    nib = jnp.asarray(_HAMMING)[crc_raw & 0x7F]
    sh = jnp.asarray([12, 8, 4, 0])
    carried_crc = jnp.sum(nib << sh[None, :], axis=1)

    # assemble packet = ax25 header + payload (+2 CRC bytes)
    slot = jnp.arange(MAX_PACKET_LEN)[None, :]
    hdr_sel = jnp.take_along_axis(
        ax25, jnp.clip(slot, 0, MAX_AX25_HEADER - 1), axis=1
    )
    pay_pos = slot - ax25_len[:, None]
    pay_sel = jnp.take_along_axis(
        payload, jnp.clip(pay_pos, 0, MAX_PAYLOAD - 1), axis=1
    )
    pkt = jnp.where(slot < ax25_len[:, None], hdr_sel,
                    jnp.where(pay_pos < count[:, None], pay_sel, 0))
    data_len = ax25_len + count
    total_len = data_len + 2
    calc_crc = crc16_masked(pkt.astype(jnp.uint8), data_len).astype(jnp.int32)
    trail = carried_crc if collect_crc else calc_crc
    pkt = jnp.where(slot == data_len[:, None], trail[:, None] & 0xFF, pkt)
    pkt = jnp.where(slot == (data_len + 1)[:, None], trail[:, None] >> 8, pkt)

    # span consumed (bits): sync bit + header + blocks (+ crc)
    span_ok = 1 + 120 + 8 * jnp.sum(coded_sizes, axis=1) + (32 if collect_crc else 0)
    hdr_fail = hdr_res < 0
    blk_fail_any = jnp.any((blk_res < 0) & (coded_sizes > 0), axis=1)
    first_bad = jnp.argmax((blk_res < 0) & (coded_sizes > 0), axis=1)
    span_blk_fail = 1 + 120 + 8 * (
        jnp.take_along_axis(
            jnp.cumsum(coded_sizes, axis=1), first_bad[:, None], axis=1
        )[:, 0]
    )
    span = jnp.where(hdr_fail, 1 + 120,
                     jnp.where(blk_fail_any, span_blk_fail, span_ok))
    structural_ok = (
        cand_valid & (~hdr_fail) & (~blk_fail_any) & (~rs_overflow)
        & (pos + span <= n_bits_of) & (pos < n_bits_of)
    )
    corrected = jnp.maximum(hdr_res, 0) + jnp.sum(
        jnp.where(coded_sizes > 0, jnp.maximum(blk_res, 0), 0), axis=1
    )

    # ---- acceptance scan (candidates are (block, pos)-ordered) ----
    # ``take`` consumes the candidate's span (the FSM moves past a failed RS
    # decode's collected bytes too); ``rank`` counts only EMITTED packets, so
    # RS-failed candidates never use up the per-block max_packets budget.
    def accept_step(carry, xs):
        cur_blk, resume, rank = carry
        b, p, sp, v, s_ok, nb = xs
        new_block = b != cur_blk
        resume = jnp.where(new_block, 0, resume)
        rank = jnp.where(new_block, 0, rank)
        take = v & (p >= resume)
        resume = jnp.where(take & (p < nb), p + sp, resume)
        emit_here = take & s_ok
        out_rank = rank
        rank = jnp.where(emit_here, rank + 1, rank)
        return (b, resume, rank), (emit_here, out_rank)

    z = jnp.zeros((), jnp.int32)
    _, (emit, rank) = jax.lax.scan(
        accept_step, (jnp.full((), -1, jnp.int32), z, z),
        (blk, pos, span.astype(jnp.int32), cand_valid, structural_ok,
         n_bits_of),
    )

    last_bit = jnp.clip(pos + span - 1, 0, n_bits_total - 1)
    address = addresses[blk, jnp.clip(last_bit // 8, 0, K - 1)].astype(jnp.int32)
    crc_ok = (calc_crc == carried_crc) if collect_crc else jnp.ones_like(emit)

    # ---- scatter back to (N, max_packets) slots ----
    out_blk = jnp.where(emit & (rank < max_packets), blk, N)
    out_rank = jnp.clip(rank, 0, max_packets - 1)

    def scatter(values, fill=0):
        buf = jnp.full((N + 1, max_packets) + values.shape[1:], fill,
                       dtype=values.dtype)
        return buf.at[out_blk, out_rank].set(values)[:N]

    # per-block saturation signal: candidates lost to global compaction
    # (slot budget T exhausted) plus emitted packets beyond max_packets.
    # dropped > 0 means this block's result may be incomplete -- callers
    # fall back to the host FSM for it.
    per_block_cands = jnp.sum(cand, axis=1).astype(jnp.int32)
    assigned = (
        jnp.zeros((N + 1,), jnp.int32)
        .at[jnp.where(cand_valid, blk, N)].add(1)[:N]
    )
    over = (
        jnp.zeros((N + 1,), jnp.int32)
        .at[jnp.where(emit & (rank >= max_packets), blk, N)].add(1)[:N]
    )
    rs_drop = (
        jnp.zeros((N + 1,), jnp.int32)
        .at[jnp.where(cand_valid & rs_overflow, blk, N)].add(1)[:N]
    )
    dropped = (per_block_cands - assigned) + over + rs_drop

    return {
        "packet": scatter(pkt),
        "length": scatter(jnp.where(emit, total_len, 0)),
        "address": scatter(jnp.where(emit, address, 0)),
        "ok": scatter(emit),
        "crc_ok": scatter(emit & crc_ok),
        "corrected": scatter(jnp.where(emit, corrected, 0)),
        "dropped": dropped,
    }
