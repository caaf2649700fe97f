"""Streaming decode: unbounded recordings in bounded memory.

The reference loads the whole WAV into every chain process (pymodem.py:46,
145) -- memory and latency scale with file length and there is no
checkpoint/resume (SURVEY.md section 5).  Here the block runtime's carry
structure becomes a streaming API: feed audio chunks of any size; whenever
enough samples accumulate for a fixed group of blocks, one compiled device
step (always the same shapes, so it compiles exactly once) decodes them; the
host retains only the ``overlap + trim`` tail between steps.  Stream
addresses are global, so packets are identical to a one-shot decode of the
concatenated audio (asserted in tests/test_stream.py).

The decoder state between feeds is a plain (offset, tail) pair per bank --
serializable, i.e. a natural checkpoint for multi-hour streams.

Note on AGC semantics: the reference's AGC scales by the max over the WHOLE
recording (agc.py:67) -- inherently non-causal.  A stream normalizes per
step group instead, which can shift coherent chains' lock byte phase by up
to one byte period relative to a one-shot decode; packet contents are
unaffected.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import bank as bank_mod
from .bank import (
    Bank,
    BlockPlan,
    _dedup_block_boundary,
    _slicer_static,
    bank_capacity,
    host_decode_block,
)
from ..config import IL2PCodecSpec


@dataclass
class _BankState:
    bank: Bank
    plan: BlockPlan  # geometry template (block_len / overlap / trim)
    capacity: int
    static: dict
    sync_tol: int
    next_block: int = 0  # index of the next undecoded block
    # device-resident audio tail (the overlap+trim halo between steps):
    # bank_device_step_stream returns it and the next step consumes it,
    # so only NEW samples cross the host->device link in steady state.
    # ``tail_block`` is the step start the tail is positioned for; any
    # mismatch (first step, retry after a failed collect, dtype switch)
    # falls back to a full host-built window and re-seeds the tail.
    tail: object = None
    tail_block: int = -1


class StreamDecoder:
    """Incremental decoder over a fixed chain list.

    >>> dec = StreamDecoder(chains, sample_rate=8000)
    >>> for chunk in chunks:
    ...     packets += dec.feed(chunk)
    >>> packets += dec.flush()

    ``overlap_seconds`` must cover loop acquisition PLUS the longest packet
    duration -- packets straddling a block boundary are decoded by the next
    block's halo, so a too-short overlap silently drops them.  The default
    'auto' geometry protects the PROTOCOL-maximum packet at each bank's
    bit rate (bank_auto_geometry); pass ``max_packet_seconds`` when the
    traffic's packets are known to be shorter to shrink the halo tax.
    """

    def __init__(self, chains, sample_rate: float, dtype=None,
                 block_seconds: float | str = "auto",
                 overlap_seconds: float | str = "auto",
                 blocks_per_step: int = 4, method: str = "auto",
                 unroll: int = 8, codec: str = "device",
                 max_packets_per_block: int = 8, pipeline_depth: int = 2,
                 max_packet_seconds: float | None = None):
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self.method = method
        self.unroll = unroll
        self.codec = codec
        self.max_packets_per_block = max_packets_per_block
        # steps kept in flight beyond the one being collected: bounds
        # device memory at (depth+1) steps' buffers while still hiding
        # each readback behind the next step's compute
        self.pipeline_depth = max(int(pipeline_depth), 0)
        self.blocks_per_step = blocks_per_step
        banks = bank_mod.group_chains(list(chains), dtype)
        if block_seconds == "auto" or overlap_seconds == "auto":
            # one feed-carry geometry serves every bank: take the widest
            # auto choice across banks (safe for all of them)
            geos = [
                bank_mod.bank_auto_geometry(b, sample_rate, dtype,
                                            max_packet_seconds)
                for b in banks
            ]
            if block_seconds == "auto":
                block_seconds = max(g[0] for g in geos)
            if overlap_seconds == "auto":
                overlap_seconds = max(g[1] for g in geos)
        self.block_len = max(int(block_seconds * sample_rate), 1)
        self.overlap = int(overlap_seconds * sample_rate)
        self._audio = np.zeros(0, dtype=np.float64)
        self._consumed = 0  # absolute index of self._audio[0]
        # steps dispatched but not yet collected -- persists ACROSS feeds:
        # a feed returns as soon as its dispatches are queued and only
        # drains steps beyond pipeline_depth, so the per-feed readback
        # sync disappears from the steady state (the next feed collects
        # results whose compute long finished).  collect() closures run on
        # ONE background worker: the packed readback (a ~31 ms tunnel
        # round trip plus transfer that releases the GIL) then overlaps
        # the NEXT step's window upload on the main thread -- the two
        # host-blocking halves of a step used to serialize, and the
        # upload alone is ~93 ms per 64-chain step on this tunnel.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self._pending: deque = deque()  # (state, advance_to, Future)
        self._collector = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="stream-collect"
        )
        self._banks = []
        for bank in banks:
            # output_oversample chains (afsk.py:164-165): feed carry and
            # windows stay input-rate; the plan's demod-unit geometry
            # (up/trim_post, stride_in/front_pad) is the same input-domain
            # framing the sharded path uses (test_sharded oversample)
            plan = BlockPlan(
                n_audio=0, trim=bank.trim,
                block_len=self.block_len * bank.up,
                overlap=self.overlap * bank.up,
                up=bank.up, trim_post=bank.trim_post,
            )
            st = _slicer_static(bank)
            cap_plan = BlockPlan(
                n_audio=self.block_len + self.overlap + bank.trim + 20,
                trim=bank.trim, block_len=plan.block_len,
                overlap=plan.overlap, up=bank.up, trim_post=bank.trim_post,
            )
            self._banks.append(
                _BankState(
                    bank=bank, plan=plan, capacity=bank_capacity(bank, cap_plan),
                    static=st,
                    sync_tol=max(
                        (
                            getattr(c.codec, "sync_tolerance", 0)
                            for c in bank.specs
                            if isinstance(c.codec, IL2PCodecSpec)
                        ),
                        default=0,
                    ),
                )
            )
        self._results: dict[str, list] = {
            c.name: [] for c in chains
        }
        # per-chain count of deduplicated packets already returned by
        # feed()/flush() -- the incremental view of packets()
        self._n_emitted: dict[str, int] = {c.name: 0 for c in chains}
        # deduplicated packets PRUNED from the front of _results: emitted
        # packets far behind the committed frontier are dropped so retained
        # state (and checkpoints) stay bounded by the stream TAIL, not the
        # stream length (a multi-hour soak otherwise grows the checkpoint
        # linearly with decoded traffic)
        self._emitted_base: dict[str, int] = {c.name: 0 for c in chains}
        self._total = 0  # absolute samples received

    def _audio_window(self, start_abs: int, length: int) -> np.ndarray:
        """``length`` retained stream samples from absolute input index
        ``start_abs``, zero-padded where the stream has none (before 0 or
        past the current total)."""
        buf = np.zeros(length, dtype=self._audio.dtype)
        lo = max(start_abs, 0)
        hi = min(start_abs + length, self._total)
        if hi > lo:
            rel = lo - self._consumed
            buf[lo - start_abs : hi - start_abs] = (
                self._audio[rel : rel + (hi - lo)]
            )
        return buf

    def _window_for(self, state: _BankState, first_block: int):
        """The contiguous audio window covering blocks_per_step blocks
        (plus overlap+trim halo) starting at ``first_block``, zero-padded
        where the stream has no samples.  Framing happens ON DEVICE, so
        this window is the whole host->device transfer for a cold step;
        warm steps upload only its fresh suffix (see _submit_blocks)."""
        lin = state.plan.block_input_len
        # absolute INPUT start (stride_in == self.block_len input samples
        # per block; front_pad covers the demod-unit overlap + resample halo)
        a0 = first_block * self.block_len - state.plan.front_pad
        span = (self.blocks_per_step - 1) * self.block_len + lin
        return self._audio_window(a0, span)

    def _submit_blocks(self, state: _BankState, first_block: int,
                       n_blocks: int, final: bool):
        """Dispatch one step's device programs; return a collect() closure.

        Submit/collect are split so the caller can dispatch EVERY due step
        (across banks and step groups) before reading anything back --
        each step's packed readback then hides behind the next step's
        device compute (the streaming analog of run_banked_many).

        Steady state uploads ONLY the step's new samples: the previous
        step's overlap+trim halo stays on device (_BankState.tail,
        bank_device_step_stream) and the window composes there.  A cold
        step -- stream start, retry after an abandoned pipeline, a wire
        dtype switch -- rebuilds the full window host-side and re-seeds
        the tail from it; the device program is the SAME either way (the
        host just chooses what the (tail, fresh) pair is)."""
        from .bank import _pallas_loop_wanted, bank_device_step_stream

        lin = state.plan.block_input_len
        ext = lin - self.block_len
        warm = (
            state.tail is not None
            and state.tail_block == first_block
            and str(state.tail.dtype) == str(self._audio.dtype)
        )
        if warm:
            tail = state.tail
            a0 = first_block * self.block_len - state.plan.front_pad
            fresh = self._audio_window(
                a0 + ext, self.blocks_per_step * self.block_len
            )
        else:
            window = self._window_for(state, first_block)
            tail, fresh = window[:ext], window[ext:]
        data, addr, count, sync, new_tail = bank_device_step_stream(
            state.bank.kind, state.bank.slicer_kind, state.bank.params,
            jnp.asarray(tail), jnp.asarray(fresh), self.blocks_per_step,
            self.block_len, ext, state.capacity,
            state.bank.stream_polys, state.bank.stream_inverts,
            state.static["state_mask"], state.static["bits_per_symbol"],
            state.sync_tol, self.method, self.unroll,
            state.static["compact_window"],
            pallas=_pallas_loop_wanted(self.dtype),
            slicer_demap=state.static["demap"], dtype=self.dtype,
        )
        state.tail = new_tail
        state.tail_block = first_block + self.blocks_per_step
        groups = (
            bank_mod._codec_subgroups(state.bank)
            if self.codec == "device"
            else None
        )
        if groups is not None:
            # device codec + compaction against the FIXED template plan
            # (block indices local to this step, so the jit program and
            # the codec-budget cache key are identical every feed);
            # packets globalize by block0 and clip against the real
            # stream length on host (bank._device_codec_submit).  Mixed
            # codec options dispatch per sub-group of chain rows.
            host_plan = BlockPlan(
                n_audio=self._total, trim=state.bank.trim,
                block_len=state.plan.block_len, overlap=state.plan.overlap,
                up=state.bank.up, trim_post=state.bank.trim_post,
            )
            return bank_mod._device_codec_submit_mixed(
                state.bank, state.plan, groups, data, addr, count, sync,
                self.max_packets_per_block, None, block0=first_block,
                host_plan=host_plan,
            )
        # demod-unit geometry for stream addresses / keep windows
        bl = state.plan.block_len
        ov = state.plan.overlap
        n_demod_total = BlockPlan(
            n_audio=self._total, trim=state.bank.trim, block_len=bl,
            overlap=ov, up=state.bank.up, trim_post=state.bank.trim_post,
        ).n_demod

        def collect():
            d, a, c, s = map(np.asarray, (data, addr, count, sync))
            out: dict[str, list] = {}
            for ci, chain in enumerate(state.bank.specs):
                new_pkts = []
                for i in range(n_blocks):
                    b = first_block + i
                    n = int(c[ci, i])
                    if n == 0:
                        continue
                    offset = b * bl - ov
                    pkts = host_decode_block(
                        chain,
                        d[ci, i, :n].astype(np.int64),
                        a[ci, i, :n].astype(np.int64) + offset,
                        s[ci, i],
                    )
                    lo = b * bl
                    hi = (b + 1) * bl
                    if final:
                        hi = min(hi, max(n_demod_total, 0)) if b * bl < n_demod_total else hi
                    new_pkts.extend(
                        p for p in pkts if lo < p.streamaddress <= hi
                    )
                out[chain.name] = new_pkts
            return out

        return collect

    def feed(self, chunk: np.ndarray) -> list:
        """Append samples; decode every block that is now complete.

        Returns newly decoded packets (globally addressed, deduplicated
        against block-boundary repeats).  int16 chunks keep their wire
        dtype end-to-end (half the per-step upload; int16 -> f32/f64 on
        device is exact, so decisions are unchanged); anything else is
        carried as float64."""
        chunk = np.asarray(chunk)
        if chunk.dtype != np.int16:
            chunk = chunk.astype(np.float64)
        if self._audio.dtype != chunk.dtype:
            if self._total == 0 and len(self._audio) == 0:
                self._audio = self._audio.astype(chunk.dtype)
            else:  # mixed dtypes across feeds: carry everything as f64
                self._audio = self._audio.astype(np.float64)
                chunk = chunk.astype(np.float64)
        self._audio = np.concatenate([self._audio, chunk])
        self._total += len(chunk)
        # pipelined ACROSS feeds: up to pipeline_depth steps stay in
        # flight when feed() returns, so the per-feed readback sync
        # disappears in steady state -- the next feed (or flush) collects
        # results whose device compute finished long ago.  state.next_block
        # commits only AFTER a step's collect succeeds: if a collect
        # raises, the uncollected steps' blocks are re-submitted by the
        # retry feed (their audio is still retained, since retention keys
        # off the committed cursor).
        for state in self._banks:
            # block b reads the input window [b*L - front_pad,
            # b*L - front_pad + block_input_len); submit once complete
            cursor = self._cursor(state)
            while True:
                last = cursor + self.blocks_per_step - 1
                need = (last * self.block_len - state.plan.front_pad
                        + state.plan.block_input_len)
                if need > self._total:
                    break
                self._pending.append((
                    state,
                    cursor + self.blocks_per_step,
                    self._collector.submit(self._submit_blocks(
                        state, cursor, self.blocks_per_step, final=False,
                    )),
                ))
                cursor += self.blocks_per_step
                while len(self._pending) > self.pipeline_depth:
                    self._drain_one()
        while len(self._pending) > self.pipeline_depth:
            self._drain_one()
        # drop audio no bank will read again (committed cursors only, so a
        # failed collect can always re-read its blocks' samples)
        min_needed_from = self._total  # lowest absolute sample still needed
        for state in self._banks:
            needed_from = (state.next_block * self.block_len
                           - state.plan.front_pad)
            min_needed_from = min(min_needed_from, max(needed_from, 0))
        drop = min_needed_from - self._consumed
        if drop > 0:
            self._audio = self._audio[drop:]
            self._consumed += drop
        return self._emit_fresh()

    def _cursor(self, state: _BankState) -> int:
        """Next block index not yet submitted (committed cursor plus any
        in-flight steps for this bank)."""
        cursor = state.next_block
        for st, advance_to, _c in self._pending:
            if st is state:
                cursor = max(cursor, advance_to)
        return cursor

    def _drain_one(self) -> None:
        # .result() re-raises a failed collect here, BEFORE next_block
        # advances.  On failure the WHOLE in-flight pipeline is abandoned:
        # later steps' advance_to values feed _cursor, so leaving them
        # queued would let the next successful commit jump next_block
        # PAST the failed step's never-collected blocks (silent packet
        # loss).  Dropping them means the retry feed re-submits everything
        # from the committed cursors -- their audio is still retained,
        # since retention keys off next_block.
        state, advance_to, future = self._pending.popleft()
        try:
            results = future.result()
        except BaseException:
            self._pending.clear()
            raise
        for name, pkts in results.items():
            self._results[name].extend(pkts)
        state.next_block = advance_to

    def drain(self) -> list:
        """Collect every in-flight step (without submitting new work)."""
        while self._pending:
            self._drain_one()
        return self._emit_fresh()

    def flush(self) -> list:
        """Decode the final partial blocks; returns the remaining packets."""
        for state in self._banks:
            n_demod = self._total * state.bank.up - state.plan.trim * state.bank.up - state.bank.trim_post
            last_block = max(-(-n_demod // state.plan.block_len) - 1, -1)
            if last_block < self._cursor(state):
                continue
            for start in range(self._cursor(state), last_block + 1,
                               self.blocks_per_step):
                n = min(self.blocks_per_step, last_block - start + 1)
                self._pending.append((
                    state, start + n,
                    self._collector.submit(self._submit_blocks(
                        state, start, n, final=True,
                    )),
                ))
                while len(self._pending) > self.pipeline_depth:
                    self._drain_one()
        while self._pending:
            self._drain_one()
        return self._emit_fresh()

    def _emit_fresh(self) -> list:
        """Newly deduplicated packets since the last feed()/flush().

        Blocks decode in address order per chain, so the deduplicated list
        only ever grows at the tail; returning the suffix past the emitted
        count gives incremental results identical to packets().  After
        emission, packets far behind the committed frontier prune."""
        fresh: list = []
        for state in self._banks:
            for chain in state.bank.specs:
                name = chain.name
                deduped = _dedup_block_boundary(
                    list(self._results[name]), chain
                )
                start = self._n_emitted[name] - self._emitted_base[name]
                fresh.extend(deduped[start:])
                self._n_emitted[name] = (
                    self._emitted_base[name] + len(deduped)
                )
                self._prune_chain(state, chain)
        return fresh

    def _prune_chain(self, state: _BankState, chain) -> None:
        """Drop emitted packets that can no longer dedup against anything:
        addresses at least a block + overlap + dedup-window behind the
        committed frontier, cut only across an address gap wider than the
        dedup window so no duplicate pair spans the cut.  Keeps retained
        results -- and state() checkpoints -- bounded by the stream tail."""
        name = chain.name
        raw = self._results[name]
        if len(raw) < 64:
            return
        sl = chain.slicer
        window = 16.0 * sl.sample_rate / sl.symbol_rate
        cutoff = (
            state.next_block * state.plan.block_len
            - state.plan.block_len - state.plan.overlap - window
        )
        cut = 0
        for i, p in enumerate(raw):
            if p.streamaddress > cutoff:
                break
            nxt = raw[i + 1].streamaddress if i + 1 < len(raw) else None
            if nxt is None or nxt - p.streamaddress >= window:
                cut = i + 1
        if cut:
            self._emitted_base[name] += len(
                _dedup_block_boundary(raw[:cut], chain)
            )
            self._results[name] = raw[cut:]

    def packets(self) -> dict[str, list]:
        """Retained packets per chain, block-boundary deduplicated.

        Long streams PRUNE emitted packets far behind the frontier (the
        feed()/flush() return values carry the full stream); short runs
        retain everything, so this is the complete set for one-shot use."""
        out = {}
        name_to_chain = {
            c.name: c for st in self._banks for c in st.bank.specs
        }
        for name, pkts in self._results.items():
            out[name] = _dedup_block_boundary(list(pkts), name_to_chain[name])
        return out

    # ------------------------------------------------------------------
    # Checkpoint / resume
    # ------------------------------------------------------------------

    def state(self) -> dict:
        """JSON-serializable checkpoint of the decode progress.

        Captures the retained audio tail, stream counters, per-bank block
        progress and accumulated packets -- everything mutable.  Restore
        into a NEW StreamDecoder built with the same chains and settings:

        >>> blob = json.dumps(dec.state())
        >>> dec2 = StreamDecoder(chains, rate, ...)   # same construction
        >>> dec2.restore(json.loads(blob))

        The reference has no equivalent (its whole WAV is one shot,
        SURVEY.md section 5); the block runtime's carry structure keeps the
        checkpoint small regardless of how many hours were decoded: the
        audio tail serializes as a zlib-compressed base64 field of its raw
        samples (a JSON float list measured ~20 bytes PER SAMPLE).
        In-flight steps are collected first, so the snapshot is complete.
        """
        import base64
        import zlib
        from dataclasses import asdict

        # collect in-flight steps WITHOUT emitting (their packets must
        # come back from feed()/flush() after restore, so the emitted
        # counters stay in sync with what the caller has actually seen)
        while self._pending:
            self._drain_one()
        tail = np.ascontiguousarray(self._audio)
        return {
            "version": 3,
            "consumed": int(self._consumed),
            "total": int(self._total),
            "audio_tail": {
                "dtype": str(tail.dtype),
                "b64z": base64.b64encode(
                    zlib.compress(tail.tobytes())
                ).decode("ascii"),
            },
            "next_block": [st.next_block for st in self._banks],
            "n_emitted": dict(self._n_emitted),
            # results hold only the PRUNED tail (_prune_chain), so the
            # checkpoint stays bounded no matter how many hours decoded
            "emitted_base": dict(self._emitted_base),
            "results": {
                name: [asdict(p) for p in pkts]
                for name, pkts in self._results.items()
            },
        }

    def restore(self, state: dict) -> None:
        """Restore a state() checkpoint into this (freshly built) decoder.

        The decoder must have been constructed with the same chains and
        block geometry as the one that produced the checkpoint; continuing
        feeds after restore yields packets identical to an uninterrupted
        decode (tests/test_stream.py)."""
        import base64
        import zlib

        from ..packets import Packet

        if state.get("version") not in (1, 2, 3):
            raise ValueError(f"unknown checkpoint version: {state.get('version')!r}")
        if len(state["next_block"]) != len(self._banks):
            raise ValueError("checkpoint bank count does not match decoder")
        if set(state["results"]) != set(self._results):
            raise ValueError("checkpoint chain names do not match decoder")
        self._consumed = int(state["consumed"])
        self._total = int(state["total"])
        tail = state["audio_tail"]
        if isinstance(tail, dict):  # v2: compressed raw samples
            self._audio = np.frombuffer(
                zlib.decompress(base64.b64decode(tail["b64z"])),
                dtype=np.dtype(tail["dtype"]),
            ).copy()
        else:  # v1: JSON float list
            self._audio = np.asarray(tail, dtype=np.float64)
        for st, nb in zip(self._banks, state["next_block"]):
            st.next_block = int(nb)
        self._n_emitted = {k: int(v) for k, v in state["n_emitted"].items()}
        self._emitted_base = {
            k: int(v)
            for k, v in state.get(
                "emitted_base", {k: 0 for k in state["results"]}
            ).items()
        }
        self._results = {
            name: [Packet(**d) for d in pkts]
            for name, pkts in state["results"].items()
        }
