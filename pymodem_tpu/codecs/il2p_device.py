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
from ..ops.bits import place_rows_shifted, take_rows_shifted
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
# _SETBIT_POS[v, r] = stream-order index (0 = MSB) of the (r+1)-th set bit
# of byte value v (unused ranks point at 0; rank validity is guaranteed by
# the popcount cumsum that produced the rank)
_SETBIT_POS = np.zeros((256, 8), dtype=np.int32)
for _v in range(256):
    _k = [i for i in range(8) if (_v >> (7 - i)) & 1]
    _SETBIT_POS[_v, : len(_k)] = _k
del _v, _k


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


@partial(jax.jit, static_argnames=("max_packets", "collect_crc", "disable_rs",
                                   "min_distance", "total_candidates",
                                   "total_rs_blocks", "scan_cap",
                                   "rs_fail_frac", "max_payload"))
def il2p_decode_blocks(data: jax.Array, sync_packed: jax.Array,
                       counts: jax.Array, addresses: jax.Array,
                       max_packets: int = 8, collect_crc: bool = True,
                       disable_rs: bool = False, min_distance: int = 0,
                       total_candidates: int | None = None,
                       total_rs_blocks: int | None = None,
                       scan_cap: int = 64,
                       rs_fail_frac: int | None = 2,
                       max_payload: int = MAX_PAYLOAD):
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

    ``rs_fail_frac``: syndrome-zero split knob for the batched RS decodes
    (ops/rs.py rs_decode_jax fail_budget) -- the expensive correction
    path runs only on rows with nonzero syndromes, compacted into
    ~1/frac of each decode chunk's rows.  Clean traffic then pays only
    the syndrome matmul.  A chunk whose corrupt-row population overflows
    the budget marks the affected stream blocks ``dropped`` (exact host
    fallback), and the dispatcher retries with the split disabled
    (None), so results never depend on the guess.

    ``max_payload``: per-candidate payload-byte budget.  EVERY
    per-candidate buffer (span window, payload assembly, packet bytes,
    CRC mask) is budget-shaped, and the protocol maximum of 1023 bytes
    is ~10x the longest packet the block plan even protects on typical
    workloads -- the dispatcher passes the plan-derived wire bound
    (bank._il2p_payload_budget), cutting the codec's dominant
    byte-traffic term by the same factor.  A decoded header announcing a
    LONGER payload marks its stream block ``dropped`` (exact host
    fallback; the dispatcher escalates to the full 1023), so packets
    never depend on the budget.
    """
    batch_shape = data.shape[:-1]
    flat = lambda a: a.reshape((-1,) + a.shape[len(batch_shape):])
    out = _il2p_decode_flat(
        flat(data), flat(sync_packed), counts.reshape(-1), flat(addresses),
        max_packets, collect_crc, disable_rs, min_distance, total_candidates,
        total_rs_blocks, scan_cap, rs_fail_frac, max_payload,
    )
    return {k: v.reshape(batch_shape + v.shape[1:]) for k, v in out.items()}


_RS_CHUNK = 2048  # rs_decode_jax default chunk_size


def _rs_fail_budget(rows: int, frac: int | None) -> int | None:
    """Per-chunk correction-row budget for the syndrome-zero split:
    ~rows/frac, bucketed {2^k, 1.5*2^k} so distinct budgets (compiles)
    stay rare.  None (or a budget that covers the whole chunk, or a tiny
    batch where the split gathers cost more than they save) disables the
    split."""
    if frac is None or rows < 512:
        return None
    per = min(rows, _RS_CHUNK)
    need = max(64, per // frac + 32)
    p = 1 << (need - 1).bit_length()
    b = p - p // 4 if need <= p - p // 4 else p
    return b if b < per else None


def _il2p_decode_flat(data, sync_packed, counts, addresses, max_packets,
                      collect_crc, disable_rs, min_distance,
                      total_candidates=None, total_rs_blocks=None,
                      scan_cap=64, rs_fail_frac=2,
                      max_payload=MAX_PAYLOAD):
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

    # ---- global compaction: flat index = block * K8 + pos (sorted) ----
    # Byte-granular: the candidate mask (bit < counts*8) is exactly a byte
    # mask (byte j live iff j < counts), so the rank cumsum runs over byte
    # POPCOUNTS (N*K int32) instead of expanded bits (8x the traffic); the
    # bit within the source byte comes from a (256, 8) set-bit-position
    # table gather on the T slots only.
    masked = jnp.where(
        jnp.arange(K)[None, :] < counts[:, None], sync_packed, 0
    ).astype(jnp.uint8)
    pcb2 = jax.lax.population_count(masked).astype(jnp.int32)  # (N, K)
    pcb = pcb2.reshape(-1)
    bcs = jnp.cumsum(pcb)
    total = bcs[-1]
    slots = jnp.arange(1, T + 1)
    bsrc = jnp.clip(jnp.searchsorted(bcs, slots), 0, N * K - 1)
    cand_valid = slots <= total
    before = jnp.take(bcs, bsrc) - jnp.take(pcb, bsrc)
    rank_in_byte = jnp.clip(slots - 1 - before, 0, 7)
    bytev = jnp.take(masked.reshape(-1), bsrc).astype(jnp.int32)
    k_in = jnp.asarray(_SETBIT_POS)[bytev, rank_in_byte]
    src = bsrc * 8 + k_in
    blk = (src // n_bits_total).astype(jnp.int32)
    pos = (src % n_bits_total).astype(jnp.int32)
    n_bits_of = counts[blk] * 8  # (T,)

    rows = jnp.take(data, blk, axis=0)  # (T, K) uint8 candidate byte rows

    # ---- bit-aligned candidate spans ----
    # One elementwise shift aligns each candidate's data (which starts at
    # bit pos+1) to a byte boundary, then one shifted-window extraction per
    # candidate gathers everything downstream reads (header, payload
    # blocks, CRC trailer).  Per-byte element gathers here cost ~20 ns
    # each on TPU, and per-row dynamic slices ~3 us/row; the static
    # binary-decomposition rolls of take_rows_shifted run at copy speed.
    start_bit = pos + 1
    shv = (start_bit % 8)[:, None].astype(jnp.int32)
    r32 = rows.astype(jnp.int32)
    nxt = jnp.concatenate([r32[:, 1:], jnp.zeros((T, 1), jnp.int32)], axis=1)
    rows_sh = (((r32 << shv) | (nxt >> (8 - shv))) & 0xFF).astype(jnp.uint8)
    # payload-byte budget shapes every per-candidate buffer (see
    # il2p_decode_blocks docstring); headers announcing more mark their
    # block dropped below
    mp = int(min(max(max_payload, 64), MAX_PAYLOAD))
    mb = -(-mp // 239)
    pkt_len = MAX_AX25_HEADER + mp + 2
    # span covers header + max coded payload + CRC trailer, plus slack so
    # the fixed 255-wide block reads below never clamp
    span_w = 15 + mp + 16 * mb + 255
    byte0 = (start_bit // 8).astype(jnp.int32)
    spans = take_rows_shifted(rows_sh, byte0, span_w)
    # (T, span_w) uint8, candidate-aligned

    # ---- per-candidate fixed-shape decode (vmapped over T) ----
    # Dead tail slots (slots > total) carry garbage span bytes; zero them
    # so the syndrome-zero split sees them as clean instead of spending
    # correction-budget slots on rows whose results are discarded anyway.
    hdr_raw = jnp.where(
        cand_valid[:, None], spans[:, :15].astype(jnp.int32), 0
    )
    hdr_ovf = jnp.zeros((T,), bool)
    if disable_rs:
        hdr_corr, hdr_res = hdr_raw, jnp.zeros((T,), jnp.int32)
    else:
        fb_hdr = _rs_fail_budget(T, rs_fail_frac)
        out_h = rs_ops.rs_decode_jax(
            hdr_raw, jnp.full((T,), 15, jnp.int32),
            num_roots=2, min_distance=min_distance, fail_budget=fb_hdr,
        )
        if fb_hdr is None:
            hdr_corr, hdr_res = out_h
        else:
            hdr_corr, hdr_res, hdr_ovf = out_h
    hdr = jax.vmap(lambda h: _descramble_fixed(h[:13], 13))(hdr_corr)

    parsed = jax.vmap(_parse_header)(hdr)
    hdr_fail = hdr_res < 0
    count = jnp.clip(parsed[0], 0, MAX_PAYLOAD)
    # a decoded header announcing a payload past the budget cannot decode
    # in these shapes: zero its layout and mark the block dropped (exact
    # host fallback; the dispatcher escalates the budget)
    too_long = cand_valid & (~hdr_fail) & (count > mp)
    # Payload work is skipped entirely for failed headers and dead slots:
    # their byte counts are garbage (the FSM consumes only the 121 header
    # bits there), so zeroing the block layout removes up to mb phantom
    # RS rows per bad candidate -- and the spurious RS-budget pressure
    # (false ``dropped`` fallbacks) they caused.
    count_live = jnp.where(hdr_fail | ~cand_valid | too_long, 0, count)
    ax25, ax25_len = jax.vmap(_ax25_header)(*parsed)

    # block layout (il2p.py:346-358)
    block_count = jnp.maximum(-(-count_live // 239), 0)
    base_size = jnp.where(
        block_count > 0, count_live // jnp.maximum(block_count, 1), 0
    )
    big_blocks = count_live - block_count * base_size
    k_idx = jnp.arange(mb)[None, :]
    sizes = jnp.where(
        k_idx < big_blocks[:, None], base_size[:, None] + 1,
        jnp.where(k_idx < block_count[:, None], base_size[:, None], 0),
    )  # (T, MB)
    coded_sizes = jnp.where(sizes > 0, sizes + 16, 0)
    coded_total = jnp.sum(coded_sizes, axis=1)
    # byte offset of each coded block within the candidate span
    block_byte_off = 15 + (jnp.cumsum(coded_sizes, axis=1) - coded_sizes)

    # Compact the LIVE (candidate, slot) pairs before the expensive
    # 16-root RS decode: nearly all packets use one payload block, so
    # decoding all T*MAX_BLOCKS slots wastes ~5x RS work.  Budget
    # overflow marks the candidate (host fallback via ``dropped``).
    Rb = total_rs_blocks if total_rs_blocks else 2 * T
    Rb = min(max(Rb, 8), T * mb)
    flat_sizes = coded_sizes.reshape(-1)  # (T*mb,)
    live = flat_sizes > 0
    lcsum = jnp.cumsum(live.astype(jnp.int32))
    n_live = lcsum[-1]
    rs_slots = jnp.arange(1, Rb + 1)
    rs_src = jnp.clip(
        jnp.searchsorted(lcsum, rs_slots), 0, T * mb - 1
    )
    rs_valid = rs_slots <= n_live
    rs_cand = (rs_src // mb).astype(jnp.int32)
    rs_off = jnp.take(block_byte_off.reshape(-1), rs_src)
    spans_rs = jnp.take(spans, rs_cand, axis=0)  # (Rb, span_w) row gather
    rows_rs = take_rows_shifted(spans_rs, rs_off, 255).astype(jnp.int32)
    rows_rs = jnp.where(rs_valid[:, None], rows_rs, 0)
    sizes_rs = jnp.maximum(jnp.take(flat_sizes, rs_src), 1)
    pay_ovf = jnp.zeros((Rb,), bool)
    if disable_rs:
        bc_c, br_c = rows_rs, jnp.zeros((Rb,), jnp.int32)
    else:
        fb_pay = _rs_fail_budget(Rb, rs_fail_frac)
        out_p = rs_ops.rs_decode_jax(
            rows_rs, sizes_rs, num_roots=16, min_distance=min_distance,
            fail_budget=fb_pay,
        )
        if fb_pay is None:
            bc_c, br_c = out_p
        else:
            bc_c, br_c, pay_ovf = out_p
    # per-slot RS results scatter back to (T, MB) for span/failure math
    dest = lcsum - 1  # compact index of each live flat slot
    in_budget = live & (dest < Rb)
    safe_dest = jnp.clip(dest, 0, Rb - 1)
    blk_res = jnp.where(
        in_budget, jnp.take(br_c, safe_dest), 0
    ).reshape(T, mb)
    blk_ovf = jnp.where(
        in_budget, jnp.take(pay_ovf, safe_dest), False
    ).reshape(T, mb)
    rs_overflow = (
        jnp.any((live & ~in_budget).reshape(T, mb), axis=1)
        | jnp.any(blk_ovf, axis=1)
        | hdr_ovf
        | too_long
    )

    # Descramble the corrected data bytes on the compact rows, route them
    # back to the (T, MAX_BLOCKS) slot grid (a row gather on the compact
    # index), then place block k's data bytes at its payload offset with
    # static binary rolls.  Blocks are disjoint in payload space, so the
    # sum over k is placement; rows are masked beyond their data size and
    # dead/over-budget slots are all-zero.  (A windowed scatter-add here
    # cost ~3 us/row on TPU.)
    data_sizes_rs = jnp.maximum(sizes_rs - 16, 0)
    plain_rs = jax.vmap(_descramble_fixed)(bc_c, data_sizes_rs)
    col255 = jnp.arange(255)[None, :]
    upd = jnp.where(
        (col255 < data_sizes_rs[:, None]) & rs_valid[:, None], plain_rs, 0
    ).astype(jnp.uint8)
    pdata = jnp.where(
        in_budget[:, None], jnp.take(upd, safe_dest, axis=0), 0
    ).reshape(T, mb, 255)
    starts = jnp.cumsum(sizes, axis=1) - sizes
    payload = jnp.zeros((T, mp), jnp.uint8)
    pw = min(255, mp)  # block data bytes never exceed min(239, mp)
    for k in range(mb):
        payload = payload + place_rows_shifted(
            pdata[:, k, :pw], starts[:, k], mp
        )

    # trailing CRC (il2p.py:503-518): 4 bytes right after the coded payload
    crc_raw = take_rows_shifted(
        spans, 15 + coded_total, 4
    ).astype(jnp.int32)
    nib = jnp.asarray(_HAMMING)[crc_raw & 0x7F]
    sh = jnp.asarray([12, 8, 4, 0])
    carried_crc = jnp.sum(nib << sh[None, :], axis=1)

    # assemble packet = ax25 header + payload (+2 CRC bytes): the payload
    # (masked to ``count`` bytes) is placed at its header offset with
    # static binary rolls; the header merges elementwise (it lives at
    # offset 0, a static pad)
    slot = jnp.arange(pkt_len)[None, :]
    pay_idx = jnp.arange(mp)[None, :]
    pay_masked = jnp.where(pay_idx < count[:, None], payload, 0)
    placed = place_rows_shifted(pay_masked, ax25_len, pkt_len)
    hdr_pad = jnp.pad(ax25, ((0, 0), (0, pkt_len - MAX_AX25_HEADER)))
    pkt = jnp.where(slot < ax25_len[:, None], hdr_pad,
                    placed.astype(jnp.int32))
    data_len = ax25_len + count
    total_len = data_len + 2
    calc_crc = crc16_masked(pkt.astype(jnp.uint8), data_len).astype(jnp.int32)
    trail = carried_crc if collect_crc else calc_crc
    pkt = jnp.where(slot == data_len[:, None], trail[:, None] & 0xFF, pkt)
    pkt = jnp.where(slot == (data_len + 1)[:, None], trail[:, None] >> 8, pkt)

    # span consumed (bits): sync bit + header + blocks (+ crc)
    span_ok = 1 + 120 + 8 * coded_total + (32 if collect_crc else 0)
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
    # Candidates sit contiguously per block in compaction order, so instead
    # of T sequential scalar steps the scan runs SCAN_CAP sequential steps
    # of (N,)-wide vector ops over per-block candidate windows.  A block
    # with more than SCAN_CAP candidates reports the excess as ``dropped``
    # (host-FSM fallback), like the other budget overflows.
    span_i = span.astype(jnp.int32)
    # dead tail slots carry a clipped blk (N-1); push them past every real
    # block so they don't inflate the last block's window / overflow count
    blk_s = jnp.where(cand_valid, blk, N)
    bstart = jnp.searchsorted(
        blk_s, jnp.arange(N + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    bcount = bstart[1:] - bstart[:-1]  # (N,) candidates per block
    starts_b = bstart[:-1]

    def win(a):
        ap = jnp.pad(a, (0, scan_cap))
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(ap, s, scan_cap)
        )(starts_b)  # (N, scan_cap) per-block windows

    pos2 = win(pos)
    span2 = win(span_i)
    v2 = win(cand_valid.astype(jnp.int32)) > 0
    s2 = win(structural_ok.astype(jnp.int32)) > 0
    inb = jnp.arange(scan_cap)[None, :] < bcount[:, None]
    nb_blk = counts.astype(jnp.int32) * 8  # (N,) valid bits per block
    resume = jnp.zeros((N,), jnp.int32)
    rank_v = jnp.zeros((N,), jnp.int32)
    emit_cols, rank_cols = [], []
    for j in range(scan_cap):
        p = pos2[:, j]
        v = v2[:, j] & inb[:, j]
        take = v & (p >= resume)
        resume = jnp.where(take & (p < nb_blk), p + span2[:, j], resume)
        e = take & s2[:, j]
        emit_cols.append(e)
        rank_cols.append(rank_v)
        rank_v = jnp.where(e, rank_v + 1, rank_v)
    emit2 = jnp.stack(emit_cols, axis=1)  # (N, scan_cap)
    rank2 = jnp.stack(rank_cols, axis=1)
    # windowed scatter back to flat candidate slots (a window may overlap
    # the next block's region; masked entries add zero)
    dnums1 = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    emit = jax.lax.scatter_add(
        jnp.zeros((T + scan_cap,), jnp.int32), starts_b[:, None],
        (emit2 & inb).astype(jnp.int32), dnums1,
    )[:T] > 0
    rank = jax.lax.scatter_add(
        jnp.zeros((T + scan_cap,), jnp.int32), starts_b[:, None],
        jnp.where(inb, rank2, 0).astype(jnp.int32), dnums1,
    )[:T]
    scan_over = jnp.maximum(bcount - scan_cap, 0)

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
    per_block_cands = jnp.sum(pcb2, axis=1)
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
    dropped = (per_block_cands - assigned) + over + rs_drop + scan_over

    return {
        "packet": scatter(pkt),
        "length": scatter(jnp.where(emit, total_len, 0)),
        "address": scatter(jnp.where(emit, address, 0)),
        "ok": scatter(emit),
        "crc_ok": scatter(emit & crc_ok),
        "corrected": scatter(jnp.where(emit, corrected, 0)),
        "dropped": dropped,
    }
