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
        self._banks = []
        for bank in banks:
            if bank.up != 1:
                raise ValueError(
                    f"chain {bank.specs[0].name!r}: output_oversample > 1 "
                    "is supported by run_banked/run_plan_banked but not by "
                    "the streaming decoder (its feed carry is input-rate)"
                )
            plan = BlockPlan(
                n_audio=0, trim=bank.trim, block_len=self.block_len,
                overlap=self.overlap,
            )
            st = _slicer_static(bank)
            cap_plan = BlockPlan(
                n_audio=self.block_len + self.overlap + bank.trim,
                trim=bank.trim, block_len=self.block_len, overlap=self.overlap,
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
        self._total = 0  # absolute samples received

    def _window_for(self, state: _BankState, first_block: int):
        """The contiguous audio window covering blocks_per_step blocks
        (plus overlap+trim halo) starting at ``first_block``, zero-padded
        where the stream has no samples.  Framing happens ON DEVICE
        (bank_device_step_window), so this window is also the whole
        host->device transfer for the step."""
        lin = state.plan.block_input_len
        a0 = first_block * self.block_len - self.overlap  # absolute start
        span = (self.blocks_per_step - 1) * self.block_len + lin
        buf = np.zeros(span, dtype=self._audio.dtype)
        lo = max(a0, 0)
        hi = min(a0 + span, self._total)
        if hi > lo:
            rel = lo - self._consumed
            buf[lo - a0 : hi - a0] = self._audio[rel : rel + (hi - lo)]
        return buf

    def _submit_blocks(self, state: _BankState, first_block: int,
                       n_blocks: int, final: bool):
        """Dispatch one step's device programs; return a collect() closure.

        Submit/collect are split so the caller can dispatch EVERY due step
        (across banks and step groups) before reading anything back --
        each step's packed readback then hides behind the next step's
        device compute (the streaming analog of run_banked_many)."""
        from .bank import _pallas_loop_wanted, bank_device_step_window

        window = self._window_for(state, first_block)
        lin = state.plan.block_input_len
        data, addr, count, sync = bank_device_step_window(
            state.bank.kind, state.bank.slicer_kind, state.bank.params,
            jnp.asarray(window), self.blocks_per_step,
            self.block_len, lin - self.block_len, state.capacity,
            state.bank.stream_polys, state.bank.stream_inverts,
            state.static["state_mask"], state.static["bits_per_symbol"],
            state.sync_tol, self.method, self.unroll,
            state.static["compact_window"],
            pallas=_pallas_loop_wanted(self.dtype),
            slicer_demap=state.static["demap"], dtype=self.dtype,
        )
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
                block_len=self.block_len, overlap=self.overlap,
            )
            return bank_mod._device_codec_submit_mixed(
                state.bank, state.plan, groups, data, addr, count, sync,
                self.max_packets_per_block, None, block0=first_block,
                host_plan=host_plan,
            )
        n_demod_total = self._total - state.plan.trim

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
                    offset = b * self.block_len - self.overlap
                    pkts = host_decode_block(
                        chain,
                        d[ci, i, :n].astype(np.int64),
                        a[ci, i, :n].astype(np.int64) + offset,
                        s[ci, i],
                    )
                    lo = b * self.block_len
                    hi = (b + 1) * self.block_len
                    if final:
                        hi = min(hi, max(n_demod_total, 0)) if b * self.block_len < n_demod_total else hi
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
        from collections import deque

        # pipelined: up to pipeline_depth steps dispatch ahead of the one
        # being collected, so each step's packed readback hides behind the
        # next step's device compute while in-flight device memory stays
        # bounded.  state.next_block commits only AFTER a step's collect
        # succeeds: if a collect raises, the uncollected steps' blocks are
        # re-submitted by the retry feed (their audio is still retained,
        # since retention keys off the committed cursor).
        pending: deque = deque()  # (state, advance_to, collect)

        def drain_one():
            state, advance_to, collect = pending.popleft()
            for name, pkts in collect().items():
                self._results[name].extend(pkts)
            state.next_block = advance_to

        for state in self._banks:
            # block b needs input through b*L + L + trim - 1
            cursor = state.next_block
            while True:
                last = cursor + self.blocks_per_step - 1
                need = (last + 1) * self.block_len + state.plan.trim
                if need > self._total:
                    break
                pending.append((
                    state,
                    cursor + self.blocks_per_step,
                    self._submit_blocks(state, cursor,
                                        self.blocks_per_step, final=False),
                ))
                cursor += self.blocks_per_step
                while len(pending) > self.pipeline_depth:
                    drain_one()
        while pending:
            drain_one()
        # drop audio no bank will read again (committed cursors only, so a
        # failed collect can always re-read its blocks' samples)
        min_needed_from = self._total  # lowest absolute sample still needed
        for state in self._banks:
            needed_from = state.next_block * self.block_len - self.overlap
            min_needed_from = min(min_needed_from, max(needed_from, 0))
        drop = min_needed_from - self._consumed
        if drop > 0:
            self._audio = self._audio[drop:]
            self._consumed += drop
        return self._emit_fresh()

    def flush(self) -> list:
        """Decode the final partial blocks; returns the remaining packets."""
        from collections import deque

        pending: deque = deque()

        def drain_one():
            state, advance_to, collect = pending.popleft()
            for name, pkts in collect().items():
                self._results[name].extend(pkts)
            state.next_block = advance_to

        for state in self._banks:
            n_demod = self._total - state.plan.trim
            last_block = max(-(-n_demod // self.block_len) - 1, -1)
            if last_block < state.next_block:
                continue
            for start in range(state.next_block, last_block + 1,
                               self.blocks_per_step):
                n = min(self.blocks_per_step, last_block - start + 1)
                pending.append((
                    state, start + n,
                    self._submit_blocks(state, start, n, final=True),
                ))
                while len(pending) > self.pipeline_depth:
                    drain_one()
        while pending:
            drain_one()
        return self._emit_fresh()

    def _emit_fresh(self) -> list:
        """Newly deduplicated packets since the last feed()/flush().

        Blocks decode in address order per chain, so the deduplicated list
        only ever grows at the tail; returning the suffix past the emitted
        count gives incremental results identical to packets()."""
        fresh: list = []
        for name, pkts in self.packets().items():
            fresh.extend(pkts[self._n_emitted[name]:])
            self._n_emitted[name] = len(pkts)
        return fresh

    def packets(self) -> dict[str, list]:
        """All packets so far, per chain, block-boundary deduplicated."""
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
        SURVEY.md section 5); the block runtime's carry structure makes the
        checkpoint a few KB regardless of how many hours were decoded.
        """
        from dataclasses import asdict

        return {
            "version": 1,
            "consumed": int(self._consumed),
            "total": int(self._total),
            "audio_tail": self._audio.tolist(),
            "next_block": [st.next_block for st in self._banks],
            "n_emitted": dict(self._n_emitted),
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
        from ..packets import Packet

        if state.get("version") != 1:
            raise ValueError(f"unknown checkpoint version: {state.get('version')!r}")
        if len(state["next_block"]) != len(self._banks):
            raise ValueError("checkpoint bank count does not match decoder")
        if set(state["results"]) != set(self._results):
            raise ValueError("checkpoint chain names do not match decoder")
        self._consumed = int(state["consumed"])
        self._total = int(state["total"])
        self._audio = np.asarray(state["audio_tail"], dtype=np.float64)
        for st, nb in zip(self._banks, state["next_block"]):
            st.next_block = int(nb)
        self._n_emitted = {k: int(v) for k, v in state["n_emitted"].items()}
        self._results = {
            name: [Packet(**d) for d in pkts]
            for name, pkts in state["results"].items()
        }
