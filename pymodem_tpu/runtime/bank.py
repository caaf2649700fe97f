"""Banked, block-parallel chain execution -- the TPU-native runtime.

The reference parallelizes by forking one OS process per demod chain and
giving each the whole recording (pymodem.py:140-166).  Here the same workload
is one compiled device program:

* **Chain bank axis**: chains with identical static structure (same modem
  family and parameter shapes, same slicer family) are
  stacked into a single pytree with a leading chain axis and vmapped.
  Sweep-bank configs (8 AFSK emphasis chains, QPSK carrier sweeps) become a
  single batched program instead of 8 processes.
* **Time-block axis**: the recording is split into fixed-size blocks with an
  overlap-save halo.  FIR stages read ``trim`` extra input samples per block
  (exact, like overlap-save FFT convolution); recurrent stages (AGC, PLL /
  Costas, slicer clock) warm up inside the halo, which is sized to cover
  loop acquisition plus the longest packet, and every packet is attributed
  to exactly one block by its stream address.  This turns strictly
  sequential scans into ``chains x blocks`` independent lanes, which is what
  fills the VPU (a lone scan step is a handful of scalar flops; a banked
  step is a wide vector op).
* The AGC's non-causal whole-recording max (agc.py:67) is computed across
  all blocks before the per-block scan -- under multi-device sharding this
  is the global-max collective.

Decision parity: FIR block outputs are bit-exact vs the sequential path
(same conv op on the same windows).  Recurrent state at a block's keep
region converges to the sequential trajectory within the halo (envelope
clamps and phase locks are contractive); decisions -- bits, packets, stream
addresses -- match the sequential run except for bit-marginal samples deep
in noise.  Byte-boundary phase in a block differs from the sequential run
(both codecs are bit-serial, so packets are unaffected), which shifts
reported stream addresses by at most 7 symbol periods.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import modems
from ..config import (
    ChainSpec,
    FourLevelSlicerSpec,
    IL2PCodecSpec,
    QuadratureSlicerSpec,
)
from ..dsp.agc import agc_apply
from ..dsp.fir import fir_valid_multi, fir_valid_nd
from ..dsp.loops import afsk_pll, bpsk_costas, mpsk_loop, qpsk_costas
from ..ops.slicers import (
    binary_slice,
    compact_bytes,
    four_level_slice,
    quadrature_slice,
)


# ---------------------------------------------------------------------------
# Block plan
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlockPlan:
    """Time-block layout over the demodulated stream.

    Demod-output index space: the sequential demod output has ``n_demod``
    samples (input length minus the FIR trim cascade).  Block ``b`` computes
    demod indices ``[b*block_len - overlap, b*block_len + block_len)``; the
    leading ``overlap`` is warm-up halo and packets are kept only when their
    stream address lands in ``(b*block_len, (b+1)*block_len]``.

    ``up > 1`` models AFSK output_oversample (afsk.py:164-165): the demod
    stream runs at ``up`` times the input rate.  ``block_len`` / ``overlap``
    stay in demod units (multiples of ``up``, so every block starts on an
    input-sample phase); ``trim`` is the INPUT-rate FIR trim before the
    polyphase upsample and ``trim_post`` the demod-rate trim after it.  The
    kaiser anti-imaging filter's half width is exactly ``10*up`` taps
    (scipy resample_poly's design, _resample_poly_taps), so each block reads
    10 extra input samples of real halo on each side and its in-block
    zero-stuff + valid convolution reproduces the sequential stream sample
    for sample in the interior.  At the recording's very edges the two
    paths pad differently (the sequential path zero-pads the STUFFED
    correlator stream; the banked path zero-pads the audio, whose partial
    conv windows still overlap real samples), so the first/last ~10*up
    demod samples can differ numerically -- no packet preamble fits
    there, so decisions are unaffected.
    """

    n_audio: int
    trim: int  # input-rate FIR trim of the modem cascade (sum of taps-1)
    block_len: int
    overlap: int
    up: int = 1  # demod-output rate multiple (AFSK output_oversample)
    trim_post: int = 0  # demod-rate FIR trim after the upsample (up > 1)

    @property
    def n_demod(self) -> int:
        if self.up == 1:
            return self.n_audio - self.trim
        return (self.n_audio - self.trim) * self.up - self.trim_post

    @property
    def n_blocks(self) -> int:
        return -(-self.n_demod // self.block_len)

    @property
    def stride_in(self) -> int:
        """Input samples between consecutive block starts."""
        return self.block_len // self.up

    @property
    def front_pad(self) -> int:
        """Zero pad ahead of the audio (block 0's halo), input units."""
        return self.overlap // self.up + (10 if self.up > 1 else 0)

    @property
    def block_input_len(self) -> int:
        if self.up == 1:
            return self.block_len + self.overlap + self.trim
        return (
            (self.block_len + self.overlap) // self.up + self.trim
            + 20 + -(-self.trim_post // self.up)
        )

    def keep_range(self, b: int) -> tuple[int, int]:
        """(lo, hi]: stream addresses owned by block b (1-based addresses)."""
        lo = b * self.block_len
        return lo, min(lo + self.block_len, self.n_demod)


def overlapped_frames(window: jax.Array, n_blocks: int, block_len: int,
                      ext: int) -> jax.Array:
    """(n_blocks*block_len + ext,) -> (n_blocks, block_len + ext) overlapped
    frames, stride block_len.

    Built from reshapes + a shifted second reshape -- NO gather: an index-
    matrix jnp.take of the same framing measured ~0.6 GB/s on the TPU
    backend (half the whole demod pipeline); this form is a plain copy.
    Requires ext <= block_len (every bundled config: overlap+trim <
    block_len); falls back to the gather otherwise.
    """
    if ext == 0:
        return window[: n_blocks * block_len].reshape(n_blocks, block_len)
    if ext > block_len:  # general (unused by default plans) -- gather
        starts = (
            jnp.arange(n_blocks, dtype=jnp.int32)[:, None] * block_len
        )
        idx = starts + jnp.arange(block_len + ext, dtype=jnp.int32)[None, :]
        return jnp.take(window, idx, axis=0)
    base = window[: n_blocks * block_len].reshape(n_blocks, block_len)
    shifted = window[block_len : n_blocks * block_len + ext]
    shifted = jnp.pad(shifted, (0, block_len - ext))
    halo = shifted.reshape(n_blocks, block_len)[:, :ext]
    return jnp.concatenate([base, halo], axis=1)


def frame_blocks(audio: jax.Array, plan: BlockPlan) -> jax.Array:
    """(n,) -> (n_blocks, block_input_len) overlapped block matrix.

    Front-padded with ``overlap`` zeros (block 0's halo) and tail-padded to
    fill the last block; tail packets are clipped by keep_range.  Traceable:
    called inside the bank jit.
    """
    ext = plan.block_input_len - plan.stride_in
    total = plan.n_blocks * plan.stride_in + ext
    padded = jnp.pad(audio, (plan.front_pad, total - plan.front_pad - plan.n_audio))
    return overlapped_frames(
        padded, plan.n_blocks, plan.stride_in, ext,
    )


def pack_bits(bits: jax.Array) -> jax.Array:
    """(..., K*8) {0,1} -> (..., K) uint8 MSB-first (np.unpackbits inverse)."""
    from ..ops.bits import bits_to_bytes_msb

    return bits_to_bytes_msb(bits.astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Bank grouping
# ---------------------------------------------------------------------------


def _tree_shapes(tree) -> tuple:
    return tuple(
        (tuple(np.shape(leaf)), str(np.asarray(leaf).dtype))
        for leaf in jax.tree_util.tree_leaves(tree)
    )


@dataclass
class Bank:
    """A group of chains executable as one batched device program."""

    kind: str  # modem family
    specs: list[ChainSpec]
    params: Any  # pytree with leading chain axis on every leaf
    trim: int
    slicer_kind: str
    # per-chain descrambler settings -- NOT grouping keys: the reference
    # driver mixes any (poly, invert) across its process pool
    # (pymodem.py:140-166), and the XOR-convolution descrambler applies
    # them as per-chain masks (ops/lfsr.descramble_bytes_multi), so e.g.
    # afsk_300_pll.json's invert pair runs as ONE 2-chain bank
    stream_polys: tuple[int, ...] = ()
    stream_inverts: tuple[bool, ...] = ()
    up: int = 1  # demod-output rate multiple (AFSK output_oversample)
    trim_post: int = 0  # demod-rate trim after the upsample (up > 1)


def _modem_geometry(kind: str, p) -> tuple[int, int, int]:
    """(input-rate trim, demod-rate trim_post, up) for the block plan.

    up == 1 for every family except AFSK with output_oversample > 1
    (afsk.py:164-165), where the output LPF acts on the upsampled stream."""
    if kind == "afsk" and p.oversample > 1:
        trim_pre = (p.input_bpf.shape[-1] - 1) + (p.mark_i.shape[-1] - 1)
        return trim_pre, p.output_lpf.shape[-1] - 1, int(p.oversample)
    return _modem_trim(kind, p), 0, 1


def _modem_trim(kind: str, p) -> int:
    if kind == "afsk":
        return (
            (p.input_bpf.shape[-1] - 1)
            + (p.mark_i.shape[-1] - 1)
            + (p.output_lpf.shape[-1] - 1)
        )
    if kind == "afsk_pll":
        return (p.input_bpf.shape[-1] - 1) + (p.output_lpf.shape[-1] - 1)
    if kind in ("bpsk", "qpsk"):
        return (p.input_bpf.shape[-1] - 1) + (p.rrc.shape[-1] - 1)
    if kind == "mpsk":
        return (
            (p.input_bpf.shape[-1] - 1)
            + (p.hilbert.shape[-1] - 1)
            + (p.rrc.shape[-1] - 1)
        )
    if kind == "fsk":
        return p.input_lpf.shape[-1] - 1
    raise ValueError(kind)


def _chain_device_params(chain: ChainSpec, dtype):
    """Per-chain pytree of HOST (numpy) arrays: modem + loop + slicer
    constants.  Kept on host so a bank stacks and transfers as one pytree --
    per-leaf device puts cost a full round trip each on a tunneled TPU.
    """
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    def to_host(a):
        a = np.asarray(a)
        return a.astype(np_dtype) if a.dtype.kind == "f" else a

    mp = modems.build_params(chain.modem)
    d: dict[str, Any] = {
        "modem": jax.tree_util.tree_map(to_host, mp._asdict())
    }
    spec = chain.modem
    if chain.modem.kind in ("afsk_pll", "bpsk", "qpsk", "mpsk"):
        d["loop"] = jax.tree_util.tree_map(
            to_host, modems._loop_params_host(spec)._asdict()
        )
    if chain.modem.kind == "qpsk":
        from ..dsp import window_design as wd

        bb0, ba1 = wd.iir1_lpf_coefs(spec.sample_rate, spec.branch_lpf_cutoff, 1.0)
        d["branch_b0"] = np_dtype.type(bb0)
        d["branch_a1"] = np_dtype.type(ba1)
    if chain.modem.kind == "mpsk":
        d["pd_granularity"] = np.int32(spec.pd_granularity)
        d["pd_gain"] = np_dtype.type(spec.pd_gain)
    if chain.modem.kind == "fsk":
        # invert as a sign multiplier so banks can mix inverted chains
        d["modem"]["sign"] = np_dtype.type(-1.0 if spec.invert else 1.0)
        del d["modem"]["invert"]
    sl = chain.slicer
    d["sps"] = np_dtype.type(sl.sample_rate / sl.symbol_rate)
    d["lock_rate"] = np_dtype.type(sl.lock_rate)
    if isinstance(sl, (QuadratureSlicerSpec, FourLevelSlicerSpec)):
        d["demap"] = np.asarray(sl.demap, dtype=np.int32)
    return d


def _afsk_shared_scales(specs: list[ChainSpec]):
    """(C,) space-gain ratios when an AFSK bank is a pure space_gain sweep.

    The reference's sweep-bank pattern (its super_opt configs, bench.py)
    varies ONLY ``space_gain``; every filter is then identical across the
    bank, and since space_gain scales the space correlator TAPS
    (afsk.py:143) the whole demod is linear in it: conv, magnitude (g>0)
    and the resample/output-LPF stages all commute with the scalar.  One
    chain's convolutions + a per-chain ``mark - s_c*space`` combine then
    replaces C full demods (the 187-tap BPF alone was ~64 redundant MXU
    convs on the bench hour).  Detection is on the SPEC fields -- exact,
    no tap numerics.  None = not a pure sweep (or not worth it)."""
    if len(specs) < 2:
        return None
    fields = (
        "sample_rate", "symbol_rate", "correlator_span", "correlator_offset",
        "mark_freq", "space_freq", "input_bpf_low_cutoff",
        "input_bpf_high_cutoff", "input_bpf_span", "output_lpf_cutoff",
        "output_lpf_span", "output_oversample",
    )
    m0 = specs[0].modem
    for c in specs[1:]:
        if any(getattr(c.modem, k) != getattr(m0, k) for k in fields):
            return None
    g0 = float(m0.space_gain)
    gains = [float(c.modem.space_gain) for c in specs]
    if g0 <= 0 or any(g <= 0 for g in gains):
        return None  # magnitude linearity needs g > 0
    return np.asarray([g / g0 for g in gains])


def group_chains(chains: list[ChainSpec], dtype) -> list[Bank]:
    """Group chains into banks keyed by their static structure."""
    banks: dict[tuple, Bank] = {}
    order: list[tuple] = []
    for chain in chains:
        params = _chain_device_params(chain, dtype)
        poly = chain.stream.polynomial if chain.stream else 0
        invert = bool(chain.stream.invert) if chain.stream else False
        sl = chain.slicer
        slicer_static = (
            sl.kind,
            getattr(sl, "bits_per_symbol", None),
            getattr(sl, "state_mask", None),
            getattr(sl, "demap", None),
        )
        # Rates are part of the key: bank_capacity and the block plan derive
        # from the bank's rates, so chains differing only in sample/symbol
        # rate must not share a bank (a higher-byte-rate chain would overflow
        # a capacity sized for the first spec).  The descrambler (poly,
        # invert) is per-chain DATA, not a key (descramble_bytes_multi).
        rates = (chain.modem.sample_rate, sl.sample_rate, sl.symbol_rate)
        key = (chain.modem.kind, _tree_shapes(params), slicer_static, rates)
        if key not in banks:
            trim, trim_post, up = _modem_geometry(
                chain.modem.kind, modems.build_params(chain.modem)
            )
            banks[key] = Bank(
                kind=chain.modem.kind,
                specs=[],
                params=[],
                trim=trim,
                slicer_kind=sl.kind,
                up=up,
                trim_post=trim_post,
            )
            order.append(key)
        banks[key].specs.append(chain)
        banks[key].params.append(params)
        banks[key].stream_polys += (poly,)
        banks[key].stream_inverts += (invert,)
    out = []
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    for key in order:
        bank = banks[key]
        bank.params = jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves), *bank.params
        )
        # pure space_gain sweeps carry a scale row and demod as ONE chain
        # (_afsk_bank_demod_shared).  The leaf's PRESENCE is the switch --
        # pytree structure is part of the jit cache key, so no extra
        # static plumbing.  f64 keeps the per-chain reference operand
        # order (bit-parity contract); the scalar reassociation is f32
        # accelerator-path only.
        if bank.kind == "afsk" and np_dtype != np.float64:
            scales = _afsk_shared_scales(bank.specs)
            if scales is not None:
                bank.params["space_scale"] = scales.astype(np_dtype)
        # coherent carrier sweeps: when EVERY modem leaf is bitwise
        # identical across chains (only the loop's NCO frequency differs,
        # which lives in params["loop"]), the whole pre-loop pipeline
        # (BPF, AGC envelope, Hilbert) computes once and broadcasts --
        # bitwise equal to the per-chain form, so safe at any dtype.
        # The flag leaf is (C,)-shaped so it shards like every other leaf.
        if bank.kind in _COHERENT_KINDS and len(bank.specs) >= 2:
            m = bank.params["modem"]
            if all(
                bool(np.all(np.asarray(leaf) == np.asarray(leaf)[:1]))
                for leaf in jax.tree_util.tree_leaves(m)
            ):
                bank.params["pre_shared"] = np.ones(
                    len(bank.specs), np_dtype
                )
        out.append(bank)
    return out


# ---------------------------------------------------------------------------
# Per-family block pipelines (single chain, batched over blocks)
# ---------------------------------------------------------------------------


def _mk(named_tuple_cls, d, fields):
    return named_tuple_cls(**{k: d[k] for k in fields})


def _agc_blocks(blocks, agc_d, unroll, normal):
    per_block = partial(
        agc_apply,
        scaled_attack=agc_d.scaled_attack,
        scaled_decay=agc_d.scaled_decay,
        sustain_time=agc_d.sustain_time,
        sustain_increment=agc_d.sustain_increment,
        target_amplitude=agc_d.target,
        unroll=unroll,
        normal=normal,
    )
    return jax.vmap(per_block)(blocks)


def _loop_from(d):
    from ..dsp.loops import LoopParams

    return LoopParams(**d["loop"])


def _afsk_bank_demod_shared(params, blocks: jax.Array, method: str):
    """All chains of a space_gain-sweep AFSK bank from ONE chain's convs.

    Linearity (see _afsk_shared_scales): baseband_c = M - s_c * S, where
    M/S are row 0's mark/space magnitude pipelines and s_c is the gain
    ratio to row 0 (scales renormalize to the CURRENT row 0, so chain
    subsets -- shard slices -- stay correct).  f32 results differ from
    the per-chain form only by the scalar reassociation's ulps; decision
    parity is asserted by tests/test_bank_runtime.py's sweep test.
    Returns (C, B, L2)."""
    m = params["modem"]
    x = fir_valid_nd(blocks, m["input_bpf"][0], method)
    corr = jnp.stack([m["mark_i"][0], m["mark_q"][0],
                      m["space_i"][0], m["space_q"][0]])
    mi, mq, si, sq = fir_valid_multi(x, corr, method)
    mark = jnp.sqrt(mi * mi + mq * mq)
    space = jnp.sqrt(si * si + sq * sq)

    def tail(diff):
        # the (linear) oversample + output-LPF tail, exactly as
        # demod_blocks' afsk branch applies it to the mark-space diff
        n_rs = m["resample_taps"].shape[-1]
        if n_rs > 0:
            up = (n_rs - 1) // 20
            n = diff.shape[-1]
            stuffed = jnp.zeros(diff.shape[:-1] + (n * up,), diff.dtype)
            stuffed = stuffed.at[..., ::up].set(diff)
            y = fir_valid_nd(stuffed, m["resample_taps"][0], method)
            y = fir_valid_nd(y, m["output_lpf"][0], method)
            t_post = m["output_lpf"].shape[-1] - 1
            target = (n - 20 - -(-t_post // up)) * up
            return y[..., :target]
        return fir_valid_nd(diff, m["output_lpf"][0], method)

    mark_f = tail(mark)
    space_f = tail(space)
    scales = params["space_scale"]
    s = (scales / scales[0]).reshape(-1, 1, 1).astype(mark_f.dtype)
    return mark_f[None] - s * space_f[None]


def demod_blocks(kind: str, params, blocks: jax.Array, method: str,
                 unroll: int, normal_fn=None):
    """Demodulate (B, Lin) input blocks for ONE chain -> (B, Lout) baseband
    (or an (i, q) pair).  Mirrors modems.demod stage order per family.

    ``normal_fn`` maps the shard-local AGC max to the whole-recording max
    (identity on one device; ``lax.pmax`` over the time axis under
    shard_map -- the reference's non-causal agc.py:67 pre-pass)."""
    m = params["modem"]
    if kind == "afsk":
        x = fir_valid_nd(blocks, m["input_bpf"], method)
        corr = jnp.stack([m["mark_i"], m["mark_q"], m["space_i"], m["space_q"]])
        mi, mq, si, sq = fir_valid_multi(x, corr, method)
        diff = jnp.sqrt(mi * mi + mq * mq) - jnp.sqrt(si * si + sq * sq)
        n_rs = m["resample_taps"].shape[-1]
        if n_rs > 0:
            # output_oversample (afsk.py:164-165) as an UNPADDED zero-stuff
            # + valid conv: the block halo supplies the real neighbor
            # samples scipy's resample_poly zero-pads for, so interior
            # blocks reproduce the sequential stream exactly (BlockPlan
            # docstring).  taps = 2*(10*up)+1 -> up from the static shape.
            up = (n_rs - 1) // 20
            n = diff.shape[-1]
            stuffed = jnp.zeros(diff.shape[:-1] + (n * up,), diff.dtype)
            stuffed = stuffed.at[..., ::up].set(diff)
            y = fir_valid_nd(stuffed, m["resample_taps"], method)
            y = fir_valid_nd(y, m["output_lpf"], method)
            t_post = m["output_lpf"].shape[-1] - 1
            # first output = demod index block_start; trim the ((-t_post)
            # mod up) tail extras the ceil'd input budget over-computes
            target = (n - 20 - -(-t_post // up)) * up
            return y[..., :target]
        return fir_valid_nd(diff, m["output_lpf"], method)
    if kind == "fsk":
        return fir_valid_nd(blocks, m["input_lpf"], method) * m["sign"]
    # coherent families: BPF -> AGC (global max across blocks) -> loop
    x = fir_valid_nd(blocks, m["input_bpf"], method)
    normal = jnp.max(x)  # whole-recording signed max (agc.py:67)
    if normal_fn is not None:
        normal = normal_fn(normal)
    x = _agc_blocks(x, m["agc"], unroll, normal)
    if kind == "afsk_pll":
        demod = jax.vmap(lambda row: afsk_pll(row, _loop_from(params), unroll=unroll))(x)
        return fir_valid_nd(demod, m["output_lpf"], method)
    if kind == "bpsk":
        demod = jax.vmap(lambda row: bpsk_costas(row, _loop_from(params), unroll=unroll))(x)
        return fir_valid_nd(demod, m["rrc"], method)
    if kind == "qpsk":
        from ..dsp.loops import QPSKLoopParams

        loop = QPSKLoopParams(
            base=_loop_from(params),
            branch_b0=params["branch_b0"],
            branch_a1=params["branch_a1"],
        )
        i_data, q_data = jax.vmap(lambda row: qpsk_costas(row, loop, unroll=unroll))(x)
        return (
            fir_valid_nd(i_data, m["rrc"], method),
            fir_valid_nd(q_data, m["rrc"], method),
        )
    if kind == "mpsk":
        from ..dsp.loops import MPSKLoopParams

        imag = fir_valid_nd(x, m["hilbert"], method)
        delay = (m["hilbert"].shape[-1] - 1) // 2
        real = x[..., delay:-delay] if delay else x
        loop = MPSKLoopParams(
            base=_loop_from(params),
            pd_table=m["pd_table"],
            pd_granularity=params["pd_granularity"],
            pd_gain=params["pd_gain"],
        )
        i_data, q_data = jax.vmap(
            lambda re, im: mpsk_loop(re, im, loop, unroll=unroll)
        )(real, imag)
        return (
            fir_valid_nd(i_data, m["rrc"], method),
            fir_valid_nd(q_data, m["rrc"], method),
        )
    raise ValueError(kind)


def _lane_path_ok(n_lanes: int, t_len: int) -> bool:
    """HBM sanity for the Pallas lane kernels: they tile lanes in units of
    8 sublanes x 128 lanes = 1024, and XLA materializes the lane-padded
    (Lp, T) arrays in HBM before the kernel.  A few-lane bank over
    multi-megasample blocks (e.g. 8 chains x 2 blocks at 96 kHz) would pad
    16 -> 1024 lanes and allocate ~8 GB per temp (observed v5e OOM), while
    gaining nothing -- under ~1k live lanes the VPU is starved either way.
    Refuse the lane path when padding is both heavily wasteful and large;
    the scan engines handle any geometry.  A forced engine
    (PYMODEM_TPU_LOOP_ENGINE=pallas -- parity tests in interpret mode,
    where no real HBM is at stake) bypasses the guard."""
    import os

    if os.environ.get("PYMODEM_TPU_LOOP_ENGINE") == "pallas":
        return True
    lanes_padded = -(-max(n_lanes, 1) // 1024) * 1024
    if lanes_padded <= 2 * n_lanes:
        return True  # modest padding: auto_blocks_per_step governs HBM
    return lanes_padded * t_len * 4 <= 1_500_000_000


def _pallas_loop_wanted(dtype) -> bool:
    import os

    engine = os.environ.get("PYMODEM_TPU_LOOP_ENGINE", "auto")
    if engine == "scan":
        return False
    from ..dsp.pallas_loops import use_pallas_loops

    if engine == "pallas":
        return True
    return use_pallas_loops(dtype)


def coherent_bank_demod_pallas(kind: str, params, blocks: jax.Array,
                               method: str, unroll: int, normal_fn=None):
    """Bank-level coherent demod with the Pallas loop engine.

    params: C-stacked chain pytree; blocks: (B, Lin).  FIR stages stay
    vmapped XLA matmuls; the AGC follower and the PLL/Costas recurrence
    run as ONE Pallas kernel over all C*B lanes (dsp/pallas_loops.py)
    instead of vmapped scans (AGC fuses into the loop kernel for
    afsk_pll/bpsk/qpsk; mpsk runs it as a standalone lane kernel because
    the Hilbert FIR sits between).  Returns (C, B, Lout) baseband, or an
    (i, q) pair of those for qpsk/mpsk.
    """
    from ..dsp.loops import LoopParams
    from ..dsp.pallas_loops import (
        agc_lane_params,
        iq_loop_lanes_pallas,
        lane_params_from_loop,
        loop_lanes_pallas,
    )

    m = params["modem"]
    pre_shared = "pre_shared" in params
    if pre_shared:
        # carrier sweep (group_chains detected every modem leaf bitwise
        # identical): the BPF runs ONCE and broadcasts -- the per-chain
        # form would compute C identical convs into the same lane array
        x1 = fir_valid_nd(blocks, m["input_bpf"][0], method)  # (B, L1)
        C = int(np.shape(m["input_bpf"])[0])
        x = jnp.broadcast_to(x1[None], (C,) + x1.shape)
        normals = jnp.broadcast_to(jnp.max(x1)[None], (C,))
    else:
        x = jax.vmap(lambda taps: fir_valid_nd(blocks, taps, method))(
            m["input_bpf"]
        )  # (C, B, L1)
        # per-chain whole-recording max (agc.py:67), as in demod_blocks;
        # the AGC follower itself runs in a Pallas lane kernel.
        normals = jnp.max(x, axis=(1, 2))
    # normal_fn turns the shard-local max into the global one under
    # shard_map
    if normal_fn is not None:
        normals = normal_fn(normals)
    C, B, L1 = x.shape
    loop = LoopParams(**params["loop"])
    base_rows = lane_params_from_loop(loop, C, B)
    agc_rows = agc_lane_params(m["agc"], normals, C, B)
    wsize = loop.wavetable.shape[-1]

    def rep(leaf):
        return jnp.repeat(jnp.asarray(leaf, jnp.float32).reshape(C), B)

    if kind in ("afsk_pll", "bpsk"):
        lane_params = jnp.concatenate([base_rows, agc_rows])
        demod = loop_lanes_pallas(x.reshape(C * B, L1), lane_params, kind,
                                  wavetable_size=wsize)
        demod = demod.reshape(C, B, L1)
        taps = m["output_lpf"] if kind == "afsk_pll" else m["rrc"]
        return jax.vmap(lambda d, t: fir_valid_nd(d, t, method))(demod, taps)

    if kind == "qpsk":
        lane_params = jnp.concatenate([
            base_rows,
            rep(params["branch_b0"])[None],
            rep(params["branch_a1"])[None],
            agc_rows,
        ])
        i_d, q_d = iq_loop_lanes_pallas(x.reshape(C * B, L1), lane_params,
                                        "qpsk", wavetable_size=wsize)
        rrc = m["rrc"]
        f = jax.vmap(lambda d, t: fir_valid_nd(d, t, method))
        return (f(i_d.reshape(C, B, L1), rrc), f(q_d.reshape(C, B, L1), rrc))

    if kind == "mpsk":
        if pre_shared:
            # AGC + Hilbert are identical across the sweep too: run the
            # AGC lane kernel over B lanes (not C*B) and the Hilbert conv
            # once, then broadcast the analytic signal to the chain axis
            agc0 = jax.tree_util.tree_map(
                lambda l: jnp.asarray(l).reshape(-1)[:1], m["agc"]
            )
            agc1 = agc_lane_params(agc0, normals[:1], 1, B)
            x1a = loop_lanes_pallas(x1.reshape(B, L1), agc1, "agc")
            imag1 = fir_valid_nd(x1a, m["hilbert"][0], method)
            delay = (m["hilbert"].shape[-1] - 1) // 2
            real1 = x1a[..., delay:-delay] if delay else x1a
            real = jnp.broadcast_to(real1[None], (C,) + real1.shape)
            imag = jnp.broadcast_to(imag1[None], (C,) + imag1.shape)
        else:
            x = loop_lanes_pallas(x.reshape(C * B, L1), agc_rows, "agc"
                                  ).reshape(C, B, L1)
            imag = jax.vmap(lambda d, t: fir_valid_nd(d, t, method))(
                x, m["hilbert"])
            delay = (m["hilbert"].shape[-1] - 1) // 2
            real = x[..., delay:-delay] if delay else x
        L2 = real.shape[-1]
        lane_params = jnp.concatenate([
            base_rows,
            rep(params["pd_gain"])[None],
            rep(params["pd_granularity"])[None],
        ])
        i_d, q_d = iq_loop_lanes_pallas(
            (real.reshape(C * B, L2), imag.reshape(C * B, L2)), lane_params,
            "mpsk", wavetable_size=wsize)
        rrc = m["rrc"]
        f = jax.vmap(lambda d, t: fir_valid_nd(d, t, method))
        return (f(i_d.reshape(C, B, L2), rrc), f(q_d.reshape(C, B, L2), rrc))

    raise ValueError(kind)


def slice_blocks(slicer_kind: str, params, baseband, capacity: int,
                 unroll: int, window: int = 1):
    """Run the slicer over (B, L) baseband -> dense (B, cap) byte/addr arrays."""
    if slicer_kind == "binary":
        out = jax.vmap(
            lambda row: binary_slice(row, params["sps"], params["lock_rate"], unroll=unroll)
        )(baseband)
    elif slicer_kind == "quadrature":
        i_data, q_data = baseband
        spec = params["slicer_static"]
        out = jax.vmap(
            lambda i, q: quadrature_slice(
                i, q, params["sps"], params["lock_rate"], params["demap"],
                spec["state_mask"], spec["bits_per_symbol"], unroll=unroll,
            )
        )(i_data, q_data)
    elif slicer_kind == "4level":
        out = jax.vmap(
            lambda row: four_level_slice(
                row, params["sps"], params["lock_rate"], params["demap"],
                jnp.zeros((), row.dtype), unroll=unroll,
            )
        )(baseband)
    else:
        raise ValueError(slicer_kind)
    return jax.vmap(lambda o: compact_bytes(o, capacity, window))(out)


# ---------------------------------------------------------------------------
# Bank runner
# ---------------------------------------------------------------------------


def _slicer_static(bank: Bank) -> dict:
    from ..ops.slicers import safe_compact_window

    sl = bank.specs[0].slicer
    bps = getattr(sl, "bits_per_symbol", 2 if sl.kind == "4level" else 1)
    window = min(
        safe_compact_window(
            c.slicer.sample_rate / c.slicer.symbol_rate, c.slicer.lock_rate,
            getattr(c.slicer, "bits_per_symbol",
                    2 if c.slicer.kind == "4level" else 1),
        )
        for c in bank.specs
    )
    return {
        "state_mask": getattr(sl, "state_mask", 0),
        "bits_per_symbol": getattr(sl, "bits_per_symbol", 1),
        "compact_window": window,
        # bank-uniform (part of the grouping key): lets the Pallas slicer
        # lane kernels take the demap as a static host constant
        "demap": tuple(int(v) for v in getattr(sl, "demap", ()) or ()),
    }


def bank_capacity(bank: Bank, plan: BlockPlan) -> int:
    # max over specs: robust even if a future grouping key change lets
    # mixed-rate chains share a bank
    cap = 16
    for c in bank.specs:
        sl = c.slicer
        sps = sl.sample_rate / sl.symbol_rate
        bps = getattr(sl, "bits_per_symbol", 2 if sl.kind == "4level" else 1)
        nominal = (plan.block_len + plan.overlap) / sps * bps / 8.0
        cap = max(cap, int(nominal * 1.5) + 16)
    return -(-cap // 8) * 8


@partial(jax.jit, static_argnames=("kind", "slicer_kind", "plan", "capacity",
                                   "polys", "inverts", "slicer_static_mask",
                                   "slicer_static_bps", "sync_tolerance",
                                   "method", "unroll", "compact_window",
                                   "pallas", "slicer_demap", "dtype"))
def bank_device_step(kind: str, slicer_kind: str, params, audio: jax.Array,
                     plan: BlockPlan, capacity: int, polys: tuple,
                     inverts: tuple,
                     slicer_static_mask: int, slicer_static_bps: int,
                     sync_tolerance: int = 0,
                     method: str = "auto", unroll: int = 8,
                     compact_window: int = 1, pallas: bool | None = None,
                     slicer_demap: tuple = (), dtype=None):
    """One bank's full device program: audio (n,) -> per-chain packets' raw
    material (C, B, cap) bytes + addresses + counts + packed IL2P syncword
    candidate map (C, B, cap) uint8.

    Framing, demod, slicing, descrambling and syncword scanning all run on
    device in one compiled program; the host FSM only touches candidate
    positions.  vmapped over the chain axis of ``params``; everything inside
    is batched over the block axis.

    ``audio`` may arrive at the wire dtype (int16 WAV): framing -- a pure
    copy -- then moves 2-byte elements and the exact int16 -> float cast
    happens on the (B, Lin) frames (half the pad/concat traffic of casting
    the stream first)."""
    blocks = frame_blocks(audio, plan)
    if dtype is not None and blocks.dtype != jnp.dtype(dtype):
        blocks = blocks.astype(dtype)
    return bank_device_step_frames(
        kind, slicer_kind, params, blocks, capacity, polys, inverts,
        slicer_static_mask, slicer_static_bps, sync_tolerance, method,
        unroll, compact_window, pallas=pallas, slicer_demap=slicer_demap,
    )


def _bank_frames_compute(kind: str, slicer_kind: str, params,
                         blocks: jax.Array, capacity: int, polys: tuple,
                         inverts: tuple, slicer_static_mask: int,
                         slicer_static_bps: int, sync_tolerance: int,
                         method: str, unroll: int, compact_window: int,
                         normal_fn=None, pallas: bool | None = None,
                         slicer_demap: tuple = (), chain0=None):
    """Traced body shared by the jitted bank-step entry points: (B, Lin)
    frames -> per-chain (C, B, cap) bytes/addresses/counts/sync bitmap.
    Byte streams leave as uint8 (4x smaller host transfers than the
    compaction's int32).

    ``polys``/``inverts`` are per-chain descrambler settings over the FULL
    bank, applied as XOR masks on the stacked stream
    (descramble_bytes_multi); ``chain0`` (traced, from shard_map's
    axis_index) selects this shard's chain window."""
    from ..ops.lfsr import descramble_bytes_multi
    from ..ops.sync import il2p_sync_candidates

    def tail_stages(chain_params, baseband):
        chain_params = dict(chain_params)
        chain_params["slicer_static"] = {
            "state_mask": slicer_static_mask,
            "bits_per_symbol": slicer_static_bps,
        }
        return slice_blocks(
            slicer_kind, chain_params, baseband, capacity, unroll,
            compact_window,
        )

    def post_slicer(data, addr, count):
        # stacked (C, B, cap): per-chain descramble masks + sync scan
        data = descramble_bytes_multi(
            data.astype(jnp.uint8), polys, inverts, chain0
        )
        sync = il2p_sync_candidates(data, sync_tolerance)
        return data, addr, count, pack_bits(sync)

    if pallas is None:
        pallas = _pallas_loop_wanted(blocks.dtype)
    n_chains = int(np.shape(params["sps"])[0])  # static shape, trace-safe
    lanes = pallas and _lane_path_ok(
        n_chains * blocks.shape[0], blocks.shape[1]
    ) and (
        slicer_kind == "binary"
        or (slicer_kind in ("quadrature", "4level") and bool(slicer_demap))
    )
    if lanes:
        # bank-level path: demod to (C, B, L2) basebands, then ONE Pallas
        # slicer kernel over all C*B lanes (ops/pallas_slicers.py) instead
        # of a vmapped scan, then the per-chain byte tail.  The quadrature
        # and 4-level kernels take the demap as a static host constant
        # (``slicer_demap``, bank-uniform by the grouping key).
        from ..ops.pallas_slicers import (
            binary_slice_lanes_pallas,
            decode_emissions,
            four_level_slice_lanes_pallas,
            quadrature_slice_lanes_pallas,
        )
        from ..ops.slicers import SlicerOut, compact_windowed

        if kind in ("afsk_pll", "bpsk", "qpsk", "mpsk"):
            basebands = coherent_bank_demod_pallas(kind, params, blocks,
                                                   method, unroll, normal_fn)
        elif kind == "afsk" and "space_scale" in params:
            basebands = _afsk_bank_demod_shared(params, blocks, method)
        else:
            basebands = jax.vmap(
                lambda cp: demod_blocks(kind, dict(cp), blocks, method,
                                        unroll, normal_fn)
            )(params)
        pair = isinstance(basebands, tuple)
        C, B, L2 = (basebands[0] if pair else basebands).shape
        lane_params = jnp.stack([
            jnp.repeat(jnp.asarray(params["sps"], jnp.float32).reshape(C), B),
            jnp.repeat(
                jnp.asarray(params["lock_rate"], jnp.float32).reshape(C), B
            ),
        ])
        w = compact_window
        if slicer_kind == "binary":
            enc = binary_slice_lanes_pallas(
                basebands.reshape(C * B, L2), lane_params, window=w
            )
        elif slicer_kind == "quadrature":
            enc = quadrature_slice_lanes_pallas(
                basebands[0].reshape(C * B, L2),
                basebands[1].reshape(C * B, L2),
                lane_params, slicer_demap, slicer_static_mask,
                slicer_static_bps, window=w,
            )
        else:
            enc = four_level_slice_lanes_pallas(
                basebands.reshape(C * B, L2), lane_params, slicer_demap,
                window=w,
            )
        enc = enc.reshape(C, B, -1)
        if w > 1:
            # the 1-emission-per-window reduction runs inside the kernel:
            # the emission stream leaves at window granularity
            data, addr, count = jax.vmap(jax.vmap(
                lambda e: compact_windowed(e, w, capacity)
            ))(enc)
            return post_slicer(data, addr, count)
        valid, byte = decode_emissions(enc)
        data, addr, count = jax.vmap(jax.vmap(
            lambda v, b: compact_bytes(SlicerOut(v, b), capacity, w)
        ))(valid, byte)
        return post_slicer(data, addr, count)

    if kind in ("afsk_pll", "bpsk", "qpsk", "mpsk") and pallas:
        basebands = coherent_bank_demod_pallas(kind, params, blocks, method,
                                               unroll, normal_fn)
        return post_slicer(*jax.vmap(tail_stages)(params, basebands))

    if kind == "afsk" and "space_scale" in params:
        basebands = _afsk_bank_demod_shared(params, blocks, method)
        return post_slicer(*jax.vmap(tail_stages)(params, basebands))

    def one_chain(chain_params):
        baseband = demod_blocks(kind, dict(chain_params), blocks, method,
                                unroll, normal_fn)
        return tail_stages(chain_params, baseband)

    return post_slicer(*jax.vmap(one_chain)(params))


@partial(jax.jit, static_argnames=("kind", "slicer_kind", "capacity", "polys",
                                   "inverts", "slicer_static_mask",
                                   "slicer_static_bps", "sync_tolerance",
                                   "method", "unroll", "compact_window",
                                   "pallas", "slicer_demap"))
def bank_device_step_frames(kind: str, slicer_kind: str, params,
                            blocks: jax.Array, capacity: int, polys: tuple,
                            inverts: tuple, slicer_static_mask: int,
                            slicer_static_bps: int, sync_tolerance: int = 0,
                            method: str = "auto", unroll: int = 8,
                            compact_window: int = 1,
                            pallas: bool | None = None,
                            slicer_demap: tuple = ()):
    """bank_device_step on pre-framed (B, Lin) blocks -- the streaming entry
    point, where the host carries the overlap+trim tail between feeds.

    ``pallas`` (engine choice) is a static arg so it is part of the jit
    cache key -- resolved from the environment by callers OUTSIDE the
    trace (None here falls back to resolving it at trace time, which is
    only correct if the environment never changes mid-process)."""
    return _bank_frames_compute(
        kind, slicer_kind, params, blocks, capacity, polys, inverts,
        slicer_static_mask, slicer_static_bps, sync_tolerance, method,
        unroll, compact_window, pallas=pallas, slicer_demap=slicer_demap,
    )


@partial(jax.jit, static_argnames=("kind", "slicer_kind", "n_blocks",
                                   "stride", "ext", "capacity", "polys",
                                   "inverts", "slicer_static_mask",
                                   "slicer_static_bps", "sync_tolerance",
                                   "method", "unroll", "compact_window",
                                   "pallas", "slicer_demap", "dtype"))
def bank_device_step_window(kind: str, slicer_kind: str, params,
                            window: jax.Array, n_blocks: int, stride: int,
                            ext: int, capacity: int, polys: tuple,
                            inverts: tuple,
                            slicer_static_mask: int, slicer_static_bps: int,
                            sync_tolerance: int = 0, method: str = "auto",
                            unroll: int = 8, compact_window: int = 1,
                            pallas: bool | None = None,
                            slicer_demap: tuple = (), dtype=jnp.float32):
    """Streaming step on ONE pre-positioned audio window: the overlapped
    (n_blocks, stride+ext) frames are built ON DEVICE (overlap-save copy),
    so the host uploads the contiguous window -- cutting each step's
    host->device transfer by the halo-duplication factor (~1.6x at the
    default 8 s blocks / 6 s overlap) vs uploading pre-framed blocks.
    ``window`` keeps its wire dtype (int16 feeds upload 2 bytes/sample,
    an exact conversion); frames convert to ``dtype`` on device."""
    if pallas is None:
        pallas = _pallas_loop_wanted(dtype)
    frames = overlapped_frames(window, n_blocks, stride, ext).astype(dtype)
    return _bank_frames_compute(
        kind, slicer_kind, params, frames, capacity, polys, inverts,
        slicer_static_mask, slicer_static_bps, sync_tolerance, method,
        unroll, compact_window, pallas=pallas, slicer_demap=slicer_demap,
    )


@partial(jax.jit, static_argnames=("kind", "slicer_kind", "n_blocks",
                                   "stride", "ext", "capacity", "polys",
                                   "inverts", "slicer_static_mask",
                                   "slicer_static_bps", "sync_tolerance",
                                   "method", "unroll", "compact_window",
                                   "pallas", "slicer_demap", "dtype"))
def bank_device_step_stream(kind: str, slicer_kind: str, params,
                            tail: jax.Array, fresh: jax.Array,
                            n_blocks: int, stride: int, ext: int,
                            capacity: int, polys: tuple, inverts: tuple,
                            slicer_static_mask: int, slicer_static_bps: int,
                            sync_tolerance: int = 0, method: str = "auto",
                            unroll: int = 8, compact_window: int = 1,
                            pallas: bool | None = None,
                            slicer_demap: tuple = (), dtype=jnp.float32):
    """Streaming step with a DEVICE-RESIDENT audio tail.

    The step window composes ON DEVICE as concat(tail, fresh): ``tail``
    (ext samples) is the previous step's retained overlap+trim halo --
    returned by the previous call and never shipped to the host -- and
    ``fresh`` holds only the ``n_blocks * stride`` NEW input samples, so
    steady-state host->device traffic is exactly the new samples at the
    wire dtype.  (The predecessor path uploaded the whole window,
    re-sending the halo every step over a ~40 MB/s tunnel.)  Returns the
    bank outputs plus the NEXT step's tail (the window's last ext
    samples, still on device)."""
    if pallas is None:
        pallas = _pallas_loop_wanted(dtype)
    window = jnp.concatenate([tail, fresh])
    frames = overlapped_frames(window, n_blocks, stride, ext).astype(dtype)
    out = _bank_frames_compute(
        kind, slicer_kind, params, frames, capacity, polys, inverts,
        slicer_static_mask, slicer_static_bps, sync_tolerance, method,
        unroll, compact_window, pallas=pallas, slicer_demap=slicer_demap,
    )
    return out + (window[n_blocks * stride:],)


@partial(jax.jit, static_argnames=("kind", "slicer_kind", "plan", "group",
                                   "capacity", "polys", "inverts",
                                   "slicer_static_mask", "slicer_static_bps",
                                   "sync_tolerance", "method", "unroll",
                                   "compact_window", "dtype", "pallas",
                                   "slicer_demap"))
def bank_device_step_grouped(kind: str, slicer_kind: str, params,
                             audio: jax.Array, plan: BlockPlan, group: int,
                             capacity: int, polys: tuple, inverts: tuple,
                             slicer_static_mask: int, slicer_static_bps: int,
                             sync_tolerance: int = 0, method: str = "auto",
                             unroll: int = 8, compact_window: int = 1,
                             dtype=jnp.float32, pallas: bool | None = None,
                             slicer_demap: tuple = ()):
    """bank_device_step for long recordings: ONE device program that
    `lax.map`s the bank pipeline over fixed-size block groups.

    The audio uploads once in its storage dtype (int16 WAV stays int16 on
    the wire -- frames convert to the compute dtype on device), HBM stays
    bounded by the group size (not recording length), and the outputs stay
    on device for the codec stage.  This replaces a host-side loop of
    per-group dispatches whose framed-f32 uploads cost ~4x the recording
    and a readback per group (the reference analog is pymodem.py:140-166's
    per-process full-audio copy)."""
    g = group
    n_groups = -(-plan.n_blocks // g)
    stride = plan.stride_in
    ext = plan.block_input_len - stride
    total = n_groups * g * stride + ext
    padded = jnp.pad(audio, (plan.front_pad, total - plan.front_pad - plan.n_audio))
    win_len = (g - 1) * stride + plan.block_input_len

    def body(start):
        win = jax.lax.dynamic_slice(padded, (start,), (win_len,))
        frames = overlapped_frames(win, g, stride, ext).astype(dtype)
        return _bank_frames_compute(
            kind, slicer_kind, params, frames, capacity, polys, inverts,
            slicer_static_mask, slicer_static_bps, sync_tolerance, method,
            unroll, compact_window, pallas=pallas, slicer_demap=slicer_demap,
        )

    starts = jnp.arange(n_groups, dtype=jnp.int32) * (g * stride)
    outs = jax.lax.map(body, starts)  # each (G, C, g, ...)

    def merge(x):
        x = jnp.moveaxis(x, 0, 1)  # (C, G, g, ...)
        return x.reshape(x.shape[0], n_groups * g, *x.shape[3:])[
            :, : plan.n_blocks
        ]

    return tuple(merge(x) for x in outs)


@partial(jax.jit, static_argnames=("codec_kind", "plan", "max_packets",
                                   "collect_crc", "disable_rs", "min_distance",
                                   "min_packet_length", "max_packet_length",
                                   "total_candidates", "total_rs_blocks",
                                   "scan_cap", "rs_fail_frac", "max_payload",
                                   "keep_filter"))
def bank_codec_step(codec_kind: str, data, addr, count, sync, plan: BlockPlan,
                    max_packets: int = 8, collect_crc: bool = True,
                    disable_rs: bool = False, min_distance: int = 0,
                    min_packet_length: int = 18, max_packet_length: int = 1023,
                    total_candidates: int | None = None,
                    total_rs_blocks: int | None = None,
                    scan_cap: int = 64, rs_fail_frac: int | None = 2,
                    max_payload: int = 1023, keep_filter: bool = False,
                    keep_globals: tuple[int, int] | None = None):
    """On-device codec stage over bank_device_step outputs: (C, B, cap) byte
    streams -> fixed-capacity packet buffers (C, B, max_packets, ...).

    Absolute stream addresses are formed on device (block b's demod range
    starts at b*block_len - overlap).

    ``keep_filter``: apply the per-block keep window (plan.keep_range) ON
    DEVICE -- each packet is attributed to exactly one block before
    compaction, so halo duplicates (~1+overlap/block of the emitted
    rows) never reach the packed transfer or the host packet build.  The
    host-side filter stays as an idempotent guard.  Only valid when
    ``plan`` describes the true global recording (the streaming path
    addresses blocks locally against a template plan and filters on
    host) -- unless ``keep_globals`` supplies the missing geometry.

    ``keep_globals``: (block0, n_demod_true) for block-RANGE dispatches
    against a local template plan (_submit_codec_tiled): emitted
    addresses stay LOCAL (the host build shifts them by whole blocks,
    packets_from_compact), but the keep window is evaluated at the true
    global block indices, so halo duplicates are still dropped on device
    before the packed transfer."""
    from ..codecs.ax25_device import ax25_decode_blocks
    from ..codecs.il2p_device import il2p_decode_blocks

    n_blocks = data.shape[1]
    offsets = (
        jnp.arange(n_blocks, dtype=jnp.int32) * plan.block_len - plan.overlap
    )
    addr_abs = addr + offsets[None, :, None]
    if codec_kind == "il2p":
        out = il2p_decode_blocks(
            data.astype(jnp.uint8), sync, count, addr_abs,
            max_packets=max_packets, collect_crc=collect_crc,
            disable_rs=disable_rs, min_distance=min_distance,
            total_candidates=total_candidates,
            total_rs_blocks=total_rs_blocks,
            scan_cap=scan_cap,
            rs_fail_frac=rs_fail_frac,
            max_payload=max_payload,
        )
    elif codec_kind == "ax25":
        out = ax25_decode_blocks(
            data.astype(jnp.uint8), count, addr_abs, max_packets=max_packets,
            min_packet_length=min_packet_length,
            max_packet_length=max_packet_length,
        )
    else:
        raise ValueError(codec_kind)
    if keep_filter:
        idx = jnp.arange(n_blocks, dtype=jnp.int32)
        if keep_globals is None:
            # keep this trace IDENTICAL to the pre-keep_globals form: a
            # dead `+ 0` would change every cached codec executable's
            # persistent-cache key and force a recompile sweep for a no-op
            lo = (idx * plan.block_len)[None, :, None]
            hi = jnp.minimum(lo + plan.block_len, plan.n_demod)
            a = out["address"]
        else:
            # block-range tile: b0 / n_demod_true trace as runtime
            # scalars, so every tile of a recording shares ONE program
            b0, n_demod_true = keep_globals
            lo = ((idx + b0) * plan.block_len)[None, :, None]
            hi = jnp.minimum(lo + plan.block_len, n_demod_true)
            a = out["address"] + b0 * plan.block_len
        out["ok"] = out["ok"] & (a > lo) & (a <= hi)
    out["packet"] = out["packet"].astype(jnp.uint8)  # shrink the transfer
    return out


def _codec_static_key(codec):
    """Static (kind, options) of one chain's device codec, or None when no
    device implementation exists for the codec type."""
    from ..config import AX25CodecSpec, IL2PCodecSpec

    if isinstance(codec, IL2PCodecSpec):
        return ("il2p", codec.collect_trailing_crc, codec.disable_rs,
                codec.min_distance, codec.sync_tolerance)
    if isinstance(codec, AX25CodecSpec):
        return ("ax25", codec.min_packet_length, codec.max_packet_length)
    return None


def _bank_uniform_codec(bank: Bank):
    """The (kind, options) shared by every chain of the bank, or None."""
    keys = {_codec_static_key(c.codec) for c in bank.specs}
    return keys.pop() if len(keys) == 1 else None


def _codec_subgroups(bank: Bank):
    """[(codec_key, chain_index_list)] in config order, or None when some
    chain's codec has no device implementation.

    A bank mixing codec OPTIONS (the reference's normal A/B pattern --
    e.g. an ax25 and an il2p chain sharing one demod family,
    chain_builder.py:64-68) dispatches the device codec per sub-group of
    chain indices instead of dropping the whole bank to the host FSMs."""
    order: list[tuple] = []
    groups: dict[tuple, list[int]] = {}
    for i, c in enumerate(bank.specs):
        key = _codec_static_key(c.codec)
        if key is None:
            return None
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(i)
    return [(k, groups[k]) for k in order]


def _bank_chain_subset(bank: Bank, idxs: list[int]) -> Bank:
    """A chain-index view of the bank for the codec/packet stage (which
    reads only specs and the per-chain stream settings, never params)."""
    from dataclasses import replace as _replace

    return _replace(
        bank,
        specs=[bank.specs[i] for i in idxs],
        params=None,
        stream_polys=tuple(bank.stream_polys[i] for i in idxs),
        stream_inverts=tuple(bank.stream_inverts[i] for i in idxs),
    )


def _chain_bit_rate(chain: ChainSpec) -> float:
    sl = chain.slicer
    bps = getattr(sl, "bits_per_symbol", 2 if sl.kind == "4level" else 1)
    return sl.symbol_rate * bps


def _protocol_max_packet_seconds(chain: ChainSpec) -> float:
    """Upper bound on one wire packet's duration for the chain's codec at
    its bit rate -- what the block overlap must cover so NO protocol-legal
    packet can straddle a boundary unseen.

    AX.25: max_packet_length decoded bytes (ax25.py:15), worst-case HDLC
    stuffing 6/5 (one stuffed zero per five ones), plus flags.  IL2P: the
    protocol-max 1023-byte payload framed as sync(3) + header(15) +
    payload + ceil-split RS parity (16/block, il2p.py:346-358) + trailing
    CRC(4) = 1125 bytes."""
    from ..config import AX25CodecSpec, IL2PCodecSpec

    codec = chain.codec
    if isinstance(codec, AX25CodecSpec):
        wire_bits = codec.max_packet_length * 8 * 1.2 + 32
    elif isinstance(codec, IL2PCodecSpec):
        payload = 1023
        wire_bits = (3 + 15 + payload + -(-payload // 239) * 16 + 4) * 8
    else:
        wire_bits = 1125 * 8
    return wire_bits / _chain_bit_rate(chain)


# warm-up floor for the recurrent stages (AGC attack, PLL/Costas lock,
# slicer clock): whichever is longer of a fixed settle time and ~192
# symbol periods.  Validated by the banked-vs-sequential parity matrix
# (tests/test_runtime_parity_matrix.py) -- widen here if a new family's
# loop acquires slower.
_ACQ_SECONDS_FLOOR = 0.35
_ACQ_SYMBOLS = 192.0
# The coherent families (AGC envelope follower + PLL/Costas carrier lock)
# acquire on ABSOLUTE time scales set by the AGC attack/sustain constants
# and the loop filter bandwidth, not symbol counts: a hardware boundary
# case (QPSK-Costas 2400, packet whose byte-phase-shifted address crossed
# into the next block) showed 0.58 s of cold-start warm-up losing the
# packet while ~1.3 s decodes it; 1.25 s is the validated floor.
_ACQ_COHERENT_FLOOR = 1.25
_COHERENT_KINDS = ("afsk_pll", "bpsk", "qpsk", "mpsk")
# The 4-level slicer learns its decision threshold from dual AGC envelope
# followers plus a sync-pattern re-arm (slicer.py:312-389) whose time
# constants are absolute seconds too: a hardware sweep on synthesized
# 4FSK-9600 (2026-08-20) decoded 2680/2832 packets at a 0.41 s overlap,
# 2768 at 0.6 s, and exactly 2832 from 1.0 s up.
_ACQ_FLOOR_BY_SLICER = {"4level": 1.2}


def bank_auto_geometry(bank: Bank, sample_rate: float, dtype,
                       max_packet_seconds: float | None = None,
                       target_lanes: int = 2048,
                       hbm_budget: float = 3e9) -> tuple[float, float]:
    """(block_seconds, overlap_seconds) for one bank, chosen by the runtime.

    The overlap protects exactly two things: recurrent-loop acquisition
    (a few hundred symbol periods) and the longest packet that may
    straddle a block boundary -- by default the PROTOCOL maximum at the
    bank's bit rate (30 s of wire time for a max IL2P frame at 300 bps,
    ~0.9 s at 9600), or the caller's ``max_packet_seconds`` traffic bound
    when the workload's packets are known to be shorter.  The block is
    then sized so the halo tax (block+overlap)/block stays <= ~1.33 while
    per-group live intermediates still fit ``hbm_budget`` at
    ``target_lanes`` concurrent scan lanes (the VPU needs ~1-2k lanes,
    tools/scan_sweep.py; lanes x bytes-per-lane is HBM-bounded, so larger
    blocks trade lane count for lower tax).

    Replaces the rate-blind 16 s / 6 s defaults: at 96 kHz those starved
    nothing but taxed nothing either, while short-packet workloads ran a
    1.75x redundant-demod halo (BENCH_r03 fsk/4fsk/qpsk)."""
    floor = (
        _ACQ_COHERENT_FLOOR if bank.kind in _COHERENT_KINDS
        else _ACQ_SECONDS_FLOOR
    )
    acq = max(
        max(
            _ACQ_FLOOR_BY_SLICER.get(c.slicer.kind, floor)
            for c in bank.specs
        ),
        max(_ACQ_SYMBOLS / c.slicer.symbol_rate for c in bank.specs),
    )
    if max_packet_seconds is None:
        packet = max(_protocol_max_packet_seconds(c) for c in bank.specs)
    else:
        packet = float(max_packet_seconds)
    overlap = acq + packet
    # largest block that still reaches target_lanes concurrent lanes under
    # the HBM budget (live bytes/lane ~ (block+overlap)*rate*itemsize*2.5,
    # the auto_blocks_per_step accounting), floored at 3x overlap so the
    # halo tax never exceeds ~1.33 even when protection is expensive
    rate_eff = sample_rate * bank.up
    bytes_per = jnp.dtype(dtype).itemsize
    lane_budget_seconds = hbm_budget / (
        target_lanes * rate_eff * bytes_per * 2.5
    )
    block = max(3.0 * overlap, lane_budget_seconds - overlap)
    # keep the Pallas lane path viable: XLA materializes the lane kernels'
    # lane-padded (>=1024, T) arrays in HBM and _lane_path_ok refuses the
    # kernel past ~1.5 GB per temp, dropping to the ~2x-slower scan engine
    # (hardware sweep 2026-08-20: BPSK 602 Msps on the lane path vs 295
    # once T crossed the guard).  Clamp T = (block+overlap)*rate to a
    # margin under the guard, but never push the halo tax past 1.5x --
    # when protection demands a huge overlap (protocol-max packets at low
    # bit rates) the scan engine is the right engine anyway.
    t_cap_seconds = 1.2e9 / (1024 * bytes_per) / rate_eff
    block = min(block, max(t_cap_seconds - overlap, 2.0 * overlap))
    return block, overlap


def resolve_bank_geometry(bank: Bank, sample_rate: float, dtype,
                          block_seconds, overlap_seconds,
                          max_packet_seconds: float | None = None
                          ) -> tuple[float, float]:
    """Resolve 'auto' block/overlap requests to concrete per-bank seconds."""
    if block_seconds == "auto" or overlap_seconds == "auto":
        auto_block, auto_ov = bank_auto_geometry(
            bank, sample_rate, dtype, max_packet_seconds
        )
        if block_seconds == "auto":
            block_seconds = auto_block
        if overlap_seconds == "auto":
            overlap_seconds = auto_ov
    return float(block_seconds), float(overlap_seconds)


def default_block_plan(n_audio: int, trim: int, sample_rate: float,
                       block_seconds: float = 16.0,
                       overlap_seconds: float = 6.0, up: int = 1,
                       trim_post: int = 0) -> BlockPlan:
    """Pick a block layout.  ``overlap`` must cover loop acquisition plus the
    longest expected packet duration (SURVEY.md section 7 'hard parts').

    ``sample_rate`` is the INPUT (recording) rate; block geometry lives in
    demod units, ``up`` times faster, rounded to multiples of ``up`` so
    every block starts on an input-sample phase."""
    demod_rate = sample_rate * up
    block_len = -(-max(int(block_seconds * demod_rate), up) // up) * up
    overlap = int(overlap_seconds * demod_rate) // up * up
    n_demod = (n_audio - trim) * up - trim_post
    if block_len >= n_demod:
        one = -(-max(n_demod, 1) // up) * up
        return BlockPlan(n_audio, trim, one, 0, up, trim_post)
    return BlockPlan(n_audio, trim, block_len, overlap, up, trim_post)




def auto_blocks_per_step(n_chains: int, block_input_len: int, n_blocks: int,
                         dtype, target_lanes: int = 2560,
                         hbm_budget: float = 3e9) -> int | None:
    """Pick the block-group size for bank_device_step_grouped.

    The recurrent stages (AGC/PLL/slicer scans) run at full rate only with
    >= ~2k concurrent lanes (tools/scan_sweep.py); lanes per map step =
    n_chains * group.  Group size is raised toward ``target_lanes`` lanes
    and capped so the live per-stage (C, g, Lin) intermediates fit the HBM
    budget.  None = recording fits in a single ungrouped dispatch."""
    bytes_per = jnp.dtype(dtype).itemsize
    live_factor = 2.5  # demod + slicer-emission intermediates per stage
    per_block = max(n_chains * block_input_len * bytes_per * live_factor, 1.0)
    cap = max(int(hbm_budget / per_block), 1)
    g = min(max(-(-target_lanes // max(n_chains, 1)), 1), cap)
    if g >= n_blocks:
        return None
    # balance: ceil(n_blocks / n_groups) so the last group is not mostly
    # padding (225 blocks at g=212 would compute 2x212 slots; 2x113 here)
    n_groups = -(-n_blocks // g)
    return -(-n_blocks // n_groups)


def plan_bank_run(bank: Bank, n_audio: int, sample_rate: float, dtype,
                  block_seconds="auto", overlap_seconds="auto",
                  max_packet_seconds: float | None = None,
                  max_blocks_per_step="auto",
                  hbm_budget: float = 3e9):
    """Resolve one bank's full execution geometry: (BlockPlan, group).

    When both the block size and the group size are 'auto', the block
    length snaps to the RECORDING so the per-step lane count
    (chains x blocks-per-group) lands exactly on a Pallas lane-tile
    quantum.  The lane kernels tile rows in units of 8 sublanes x 128
    lanes = 1024 ((8,512) tile) or 2048 ((16,128) tile,
    dsp/pallas_loops.auto_tile); unaligned geometry silently pads -- e.g.
    8 chains x 129 blocks = 1032 lanes rounds up to 2048 kernel rows, so
    HALF the loop kernel's compute was dead lanes (hardware stage profile
    2026-08-20: that kernel was 51% of the PLL pipeline wall time).  The
    quantum (2048 vs 1024) is chosen by minimizing halo-tax / padded-rate
    with the sweep-measured rates (4.27 vs 2.85 Gsamples/s); the group's
    live intermediates stay under ``hbm_budget`` like auto_blocks_per_step.
    """
    resolved = resolve_bank_geometry(
        bank, sample_rate, dtype, block_seconds, overlap_seconds,
        max_packet_seconds,
    )

    def fallback():
        plan = default_block_plan(
            n_audio, bank.trim, sample_rate, resolved[0], resolved[1],
            bank.up, bank.trim_post,
        )
        group = max_blocks_per_step
        if group == "auto":
            group = auto_blocks_per_step(
                len(bank.specs), plan.block_input_len * plan.up,
                plan.n_blocks, dtype,
            )
        return plan, group

    if block_seconds != "auto" or max_blocks_per_step != "auto":
        return fallback()
    C = len(bank.specs)
    demod_rate = sample_rate * bank.up
    bytes_per = jnp.dtype(dtype).itemsize
    ov_len = int(resolved[1] * demod_rate) // bank.up * bank.up
    n_demod = (n_audio - bank.trim) * bank.up - bank.trim_post
    if n_demod <= 0:
        return fallback()  # degenerate recording: default plan clamps it
    # the quantum trade is kernel-rate-weighted only for coherent kinds,
    # where the fused loop kernel dominates (hardware: 4.27 Gs/s padded at
    # the (16,128)/2048 tile vs 2.85 at (8,512)/1024); noncoherent
    # families are FIR/MXU-bound, so halo alone decides and alignment
    # just keeps the slicer kernel pad-free (equal scores tie toward the
    # larger quantum = fewer dispatches)
    coherent = bank.kind in _COHERENT_KINDS
    quanta = ((2048, 4.27), (1024, 2.85)) if coherent else \
        ((2048, 1.0), (1024, 1.0))
    # halo-tax ceiling ~1.67: exact lane occupancy usually beats the
    # fallback's padded kernels even at this tax (e.g. 8-chain BPSK:
    # 1024 exact lanes at halo 1.61 vs 800 live in a 1024-row kernel at
    # halo 1.48 -- 22% less padded work)
    min_block = -(-3 * ov_len // 2)
    best = None  # (score, block_len, g)
    for target, padded_rate in quanta:
        g = target // C
        if g < 1:
            continue
        lanes = C * g
        # per-step live intermediates ~ lanes * T * bytes * 2.5
        t_budget = hbm_budget / (lanes * bytes_per * 2.5)
        block_max = int(t_budget) - ov_len
        if block_max < min_block:
            continue  # halo tax too high at this lane count
        # 2% slack on the soft HBM bound: without it a recording a hair
        # past k groups' capacity doubles k (and the halo tax) for a
        # 0.01% budget overshoot
        k = -(-n_demod // max(int(g * block_max * 1.02), 1))
        raw = -(-n_demod // (k * g))
        block_len = -(-raw // bank.up) * bank.up
        if block_len < min_block:
            continue  # recording too short to fill this quantum
        halo = (block_len + ov_len) / block_len
        score = halo / padded_rate
        if best is None or score < best[0]:
            best = (score, block_len, g)
    if best is None:
        return fallback()
    _, block_len, g = best
    if block_len >= n_demod:
        return fallback()
    plan = BlockPlan(n_audio, bank.trim, block_len, ov_len, bank.up,
                     bank.trim_post)
    return plan, (g if g < plan.n_blocks else None)


def auto_candidate_budget(sync: np.ndarray) -> int:
    """Size the device codec's global candidate-slot budget from the actual
    sync-candidate population (packed bitmap), bucketed ({2^k, 1.5*2^k}, _budget_bucket) so
    distinct budgets (hence compiles) stay rare.  The margin covers
    seeded-history candidates the pure-bit map cannot see; undershoot is
    safe -- saturated blocks carry a ``dropped`` flag and fall back to the
    host FSM."""
    n_cand = int(np.bitwise_count(np.asarray(sync)).sum())
    return _budget_bucket(n_cand)


@jax.jit
def _popcount_stats(sync):
    """(total candidates, max candidates in any one block) of a packed
    (..., cap) sync bitmap."""
    pc = jax.lax.population_count(sync.astype(jnp.uint8)).astype(jnp.int32)
    per_block = jnp.sum(pc, axis=-1)
    return jnp.stack([jnp.sum(per_block), jnp.max(per_block)])


def auto_candidate_budget_device(sync) -> tuple[int, int, int]:
    """(candidate-slot budget, acceptance-scan cap, busiest-block candidate
    count) for a device-resident bitmap: reads back TWO scalars in one
    transfer (the reductions run on device) instead of the whole (C, B,
    cap) bitmap -- this readback is also the first sync point after the
    demod program, so it should carry minimum transfer.  The scan cap is
    the power-of-two bucket covering the busiest block (the unrolled
    acceptance scan runs that many sequential steps); blocks beyond 64
    fall back to the host FSM via ``dropped``."""
    total, max_pb = map(int, np.asarray(_popcount_stats(sync)))
    cap = 8
    while cap < min(max_pb, 64):
        cap *= 2
    return _budget_bucket(total), cap, max_pb


def _auto_max_packets(max_pb: int, default_mp: int, n_rows: int,
                      lmax: int, hbm_limit: float = 1e9) -> int:
    """Initial per-block packet-slot budget from the busiest block's
    candidate count (emitted packets per block never exceed its
    candidates), bucketed to a power of two so compiles stay rare and
    bounded so the (rows, mp, lmax) packet buffer stays under
    ``hbm_limit``.  Right-sizing here avoids the escalation ladder
    (mp x2 -> full codec recompile + re-run per rung) that a packet-dense
    block would otherwise climb on its first decode."""
    mp = default_mp
    while mp < min(max_pb, MP_CAP):
        mp *= 2
    hbm_mp = max(int(hbm_limit / max(n_rows * lmax, 1)), default_mp)
    return max(min(mp, MP_CAP, hbm_mp), default_mp)


def _budget_bucket(n: int, lo: int = 64) -> int:
    """Bucket >= 1.25*n from {2^k, 1.5*2^k} so distinct budgets (compiles)
    stay rare while the worst overshoot is 1.5x, not 2x (budget-scaled
    device work is the codec program's dominant cost)."""
    need = max(lo, int(n * 1.25) + 16)
    p = 1 << (need - 1).bit_length()
    return p - p // 4 if need <= p - p // 4 else p


@jax.jit
def _codec_out_sizes(ok, length):
    """(n_valid_packets, total_valid_bytes, max_packet_len) -- one tiny
    readback that also synchronizes the codec step before the compaction
    dispatch."""
    okf = ok.reshape(-1)
    lenf = jnp.where(okf, length.reshape(-1).astype(jnp.int32), 0)
    return jnp.stack([
        jnp.sum(okf.astype(jnp.int32)),
        jnp.sum(lenf),
        jnp.max(lenf),
    ])


# row order of compact_codec_out's stacked "meta" array ("corrected" row
# present only when the codec reports correction counts)
COMPACT_META_KEYS = ("address", "length", "chain", "block", "base",
                     "corrected")


def _le_bytes(x):
    """int32 array -> flat little-endian uint8 view (portable byte
    decomposition; host reassembles with ndarray.view('<i4'))."""
    x = x.astype(jnp.int32)
    b = jnp.stack([(x >> (8 * k)) & 0xFF for k in range(4)], axis=-1)
    return b.astype(jnp.uint8).reshape(-1)


@partial(jax.jit, static_argnames=("meta_budget", "len_budget"))
def compact_codec_out(ok, address, length, corrected, packet,
                      meta_budget: int, len_budget: int | None = None,
                      dropped=None):
    """Dense-pack the codec's fixed (C, B, P, Lmax) packet buffers on device.

    Readback of the fixed buffers scales with C*B*P*Lmax (~150 MB for the
    64-chain bench hour); the payloads themselves are ~100x smaller.  Valid
    rows rank-compact into ``meta_budget`` metadata slots; their
    length-masked bytes come back as the compact (meta_budget, len_budget)
    row matrix -- the host flattens it to the contiguous stream (the
    on-device windowed scatter that used to build the stream cost ~3
    us/row on TPU, more than the whole transfer).  Budgets are bucketed
    from the exact on-device counts (_codec_out_sizes), so overflow is
    impossible."""
    C, B, Pk = ok.shape
    okf = ok.reshape(-1)
    lenf = jnp.where(okf, length.reshape(-1).astype(jnp.int32), 0)
    rank = jnp.cumsum(okf.astype(jnp.int32)) - 1
    pos = jnp.where(okf, rank, meta_budget)

    def cmeta(x):
        # rank indices are unique in-bounds (invalid rows hit the
        # out-of-range drop slot): collision-free scatter lowering
        return (
            jnp.zeros((meta_budget,), jnp.int32)
            .at[pos]
            .set(x.reshape(-1).astype(jnp.int32), mode="drop",
                 unique_indices=True)
        )

    ci = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[:, None, None], ok.shape
    )
    bi = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[None, :, None], ok.shape
    )
    base = jnp.cumsum(lenf) - lenf
    meta_rows = [cmeta(address), cmeta(length), cmeta(ci), cmeta(bi),
                 cmeta(base)]
    if corrected is not None:
        meta_rows.append(cmeta(corrected))
    row_src = (
        jnp.zeros((meta_budget,), jnp.int32)
        .at[pos]
        .set(jnp.arange(C * B * Pk, dtype=jnp.int32), mode="drop",
             unique_indices=True)
    )
    # gather/scatter width tracks the LONGEST valid packet (bucketed, from
    # the same sizes readback), not the structural Lmax of 1041: typical
    # traffic is ~200-byte packets, a 4-8x cut in compaction work
    flat_pk = packet.reshape(C * B * Pk, -1)
    if len_budget is not None and len_budget < flat_pk.shape[-1]:
        flat_pk = flat_pk[:, :len_budget]
    rows = flat_pk[row_src]  # (M, len_budget) uint8
    j = jnp.arange(rows.shape[-1], dtype=jnp.int32)[None, :]
    rows = jnp.where(j < meta_rows[1][:, None], rows, 0)
    # ONE flat uint8 buffer: the exact output sizes (so callers running on
    # CACHED budgets can verify n_ok <= meta_budget / max_len <= len_budget
    # from the same transfer), the stacked int32 metadata (COMPACT_META_KEYS
    # row order) as little-endian bytes, the codec's per-block ``dropped``
    # counts, then the compact byte rows -- a single readback instead of
    # three, because each np.asarray is a ~31 ms tunnel round trip on the
    # axon backend and the host can split by the static budget sizes.
    parts = [_le_bytes(_codec_out_sizes(ok, length)),
             _le_bytes(jnp.stack(meta_rows))]
    if dropped is not None:
        parts.append(_le_bytes(dropped))
    parts.append(rows.reshape(-1))
    return jnp.concatenate(parts)


# Steady-state codec budgets per (codec options, block geometry, bank
# shape): a repeat call with the same workload shape skips BOTH exact-sizing
# readbacks (candidate stats after the demod program, output sizes after the
# codec program) and runs demod -> codec -> compaction as one uninterrupted
# dispatch chain with a SINGLE readback at the end.  Safe because every
# undershoot is detectable: candidate/scan saturation surfaces per block in
# ``dropped`` (device-side budget escalation, then host-FSM fallback past
# MP_CAP), and compaction overflow is caught from the exact sizes carried
# in the packed readback (redo with exact budgets).
_CODEC_BUDGET_CACHE: dict = {}

# terminal per-block packet-slot budget for device-side escalation; blocks
# still saturated at MP_CAP decode via the host FSM (packets_from_compact)
MP_CAP = 64


def _merge_budget_entry(prev, new):
    """Upper-bound merge of two budget-cache entries sharing one key.

    Several dispatches can share a cache key while seeing different
    traffic (block groups of one recording, streaming steps): if each
    stored ITS exact budgets, a group that escalated (e.g. payload
    budget -> 1023) and one that didn't would overwrite each other and
    every later run would ping-pong through redo -> escalate -> pop
    (measured: a 0.29 s PLL hour became 13 s/run).  Budgets are upper
    bounds -- taking the elementwise maximum (and the SAFER side of the
    RS split knob) is always correct and converges the shared entry."""
    if prev is None:
        return new
    mp = max(prev[0], new[0])
    cand = (
        None if prev[1] is None or new[1] is None
        else max(prev[1], new[1])
    )
    scan = max(prev[2], new[2])
    meta = max(prev[3], new[3])
    lenb = max(prev[4], new[4])
    frac = (
        None if prev[5] is None or new[5] is None
        else min(prev[5], new[5])
    )
    pay = max(prev[6], new[6])
    return (mp, cand, scan, meta, lenb, frac, pay)


def _il2p_payload_budget(bank, plan: BlockPlan) -> int:
    """Static per-candidate payload-byte budget for the device IL2P codec,
    from the plan's protected-packet bound: the block overlap covers loop
    acquisition PLUS the longest packet the runtime protects
    (bank_auto_geometry), so a packet whose wire time exceeds the overlap
    is already outside the runtime's protection contract -- budgeting the
    codec's per-candidate buffers (span window, payload assembly, packet
    bytes, CRC) to that bound cuts its dominant byte-traffic term ~10x on
    short-packet traffic (the protocol max is 1023).  Bucketed
    {2^k, 1.5*2^k} so compiles stay rare; a header announcing more marks
    its block dropped (exact host fallback + escalation to 1023), so
    packets never depend on the bound."""
    wire_bytes = 0.0
    for c in bank.specs:
        sl = c.slicer
        sps = sl.sample_rate / sl.symbol_rate
        bps = getattr(sl, "bits_per_symbol", 2 if sl.kind == "4level" else 1)
        wire_bytes = max(wire_bytes, plan.overlap / sps * bps / 8.0)
    if plan.overlap <= 0:
        return 1023  # single-block plan: no straddle bound to infer from
    # invert wire = sync(3) + header(15) + mp + 16*ceil(mp/239) + crc(4)
    mp = 0
    for blocks in range(1, 6):
        cand = int(wire_bytes) - 3 - 15 - 16 * blocks - 4
        cand = min(cand, blocks * 239)
        if cand > (blocks - 1) * 239:
            mp = max(mp, cand)
    return min(_budget_bucket(max(mp, 64), lo=64), 1023)


def _rs_frac_default() -> int | None:
    """Initial syndrome-split fraction (codecs/il2p_device.py
    _rs_fail_budget); PYMODEM_TPU_RS_FAIL_FRAC overrides (0 = split off)
    for perf sweeps."""
    import os

    v = os.environ.get("PYMODEM_TPU_RS_FAIL_FRAC")
    if v is None:
        return 2
    n = int(v)
    return n if n > 0 else None


def _dispatch_codec(codec_key, data, addr, count, sync, plan,
                    max_packets_per_block, total_candidates, scan_cap,
                    rs_fail_frac: int | None = 2, max_payload: int = 1023,
                    keep_filter: bool = False,
                    keep_globals: tuple[int, int] | None = None):
    if codec_key[0] == "il2p":
        return bank_codec_step(
            "il2p", data, addr, count, sync, plan,
            max_packets=max_packets_per_block,
            collect_crc=codec_key[1], disable_rs=codec_key[2],
            min_distance=codec_key[3],
            total_candidates=total_candidates,
            # failed-header candidates contribute zero RS rows, so the
            # live-row population is ~1 payload block per real packet;
            # T already carries a >= 25% margin over the candidate
            # count.  Multi-block-heavy workloads that overflow fall
            # back per block to the host FSM via ``dropped``.
            total_rs_blocks=total_candidates,
            scan_cap=scan_cap,
            rs_fail_frac=rs_fail_frac,
            max_payload=max_payload,
            keep_filter=keep_filter,
            keep_globals=keep_globals,
        )
    return bank_codec_step(
        "ax25", data, addr, count, sync, plan,
        max_packets=max_packets_per_block,
        min_packet_length=codec_key[1],
        max_packet_length=codec_key[2],
        keep_filter=keep_filter,
        keep_globals=keep_globals,
    )


def _read_compact(out, meta_budget, len_budget, flat):
    """Split compact_codec_out's packed readback into (sizes, comp dict,
    dropped) by the static budget sizes."""
    return _split_compact(
        flat, meta_budget, len_budget, "corrected" in out,
        out["dropped"].shape if "dropped" in out else None,
    )


def _split_compact(flat, meta_budget, len_budget, has_corrected: bool,
                   dropped_shape):
    """Shape-driven form of _read_compact (no codec-output dict needed):
    the sharded runtime parses each shard's packed buffer with this."""
    n_ok, total_bytes, max_len = (int(v) for v in flat[:12].view("<i4"))
    off = 12
    keys = COMPACT_META_KEYS if has_corrected else COMPACT_META_KEYS[:-1]
    end = off + len(keys) * meta_budget * 4
    comp = dict(zip(keys, flat[off:end].view("<i4").reshape(len(keys), -1)))
    off = end
    dropped = None
    if dropped_shape is not None:
        dsize = int(np.prod(dropped_shape))
        dropped = flat[off : off + dsize * 4].view("<i4").reshape(dropped_shape)
        off += dsize * 4
    rows_np = flat[off:].reshape(meta_budget, len_budget)
    # flatten the length-masked rows to the contiguous byte stream the
    # packet builder slices with meta's ``base`` offsets (vectorized numpy;
    # meta slots are rank-ordered, so row order == stream order)
    comp["bytes"] = rows_np[
        np.arange(rows_np.shape[-1])[None, :] < comp["length"][:, None]
    ]
    return (n_ok, total_bytes, max_len), comp, dropped


def _len_bucket(max_len: int, lmax: int) -> int:
    """Byte-row width bucket: {2^k, 1.5*2^k} like _budget_bucket -- the
    packed readback is meta_budget x len_budget bytes, and the pow2-only
    form shipped 128-byte rows for ~90-byte packets (a 25% transfer tax
    on the packet-dense PLL bench).  Cached-budget reuse stays safe: the
    packed sizes carry the exact max_len, and overflow redoes compaction
    with exact budgets (collect's redo path)."""
    need = max(max_len, 64)
    p = 1 << (need - 1).bit_length()
    b = p - p // 4 if need <= p - p // 4 else p
    return min(b, lmax)


def _device_codec_submit(bank, plan, codec_key, data, addr, count, sync,
                         max_packets_per_block, total_candidates,
                         block0: int = 0, host_plan: BlockPlan | None = None,
                         keep_globals: tuple[int, int] | None = None):
    """Dispatch the on-device codec + compaction over bank outputs; return
    a collect() closure that performs the (single, packed) readback and
    builds packet objects.

    Split so callers can pipeline: dispatch is async, so submitting the
    next bank's (or next recording's) codec stage before collecting this
    one hides the readback round trip and the host packet build behind
    device compute.  On a budget-cache hit the codec and compaction
    dispatch NOW (zero sync points until collect); on a miss the exact
    two-phase sizing (which must read back intermediate scalars) happens
    inside collect().

    ``block0``/``host_plan`` serve the streaming decoder: the device
    program addresses blocks 0..B-1 against the fixed template ``plan``
    (so the jit program and the budget cache key never change between
    steps), while the host packet build shifts to global block
    ``block0`` and clips against ``host_plan``'s real recording length.

    Packet-dense traffic that saturates a per-block budget (``dropped``)
    ESCALATES on device -- packet slots, acceptance-scan cap and (when
    auto-sized) the candidate budget double and the codec re-runs --
    rather than host-FSM decoding the saturated blocks (measured 2.6 ms
    per block of pure-Python IL2P, ~50x the whole device program on a
    dense FSK bank).  The learned budgets land in the cache, so repeat
    calls dispatch at the right sizes immediately; the host fallback
    remains only as the terminal path past MP_CAP."""
    from .. import profiling

    # the true-global-plan path filters packets to their block's keep
    # window ON DEVICE (bank_codec_step keep_filter); the streaming path
    # (local block template + host_plan) keeps host-side filtering --
    # except block-RANGE tiles, which pass the true geometry via
    # keep_globals so the device filter still applies
    device_keep = (host_plan is None and block0 == 0) or (
        keep_globals is not None
    )
    if host_plan is None:
        host_plan = plan
    cache_key = (codec_key, plan, data.shape[:2], max_packets_per_block)
    cached = (
        _CODEC_BUDGET_CACHE.get(cache_key)
        if total_candidates is None
        else None
    )

    def run_exact(mp, cand_budget, scan_cap, rs_frac, pay_budget):
        with profiling.timed("device_codec_step"):
            out = _dispatch_codec(
                codec_key, data, addr, count, sync, plan, mp, cand_budget,
                scan_cap, rs_frac, pay_budget, device_keep, keep_globals,
            )
        with profiling.timed("codec_sizes"):
            n_ok, _total_bytes, max_len = map(
                int, np.asarray(_codec_out_sizes(out["ok"], out["length"]))
            )
        with profiling.timed("device_codec_compact"):
            len_budget = _len_bucket(max_len, out["packet"].shape[-1])
            meta_budget = _budget_bucket(n_ok)
            packed = compact_codec_out(
                out["ok"], out["address"], out["length"],
                out.get("corrected"), out["packet"], meta_budget,
                len_budget, out.get("dropped"),
            )
        with profiling.timed("device_codec_transfer"):
            flat = np.asarray(packed)
        _sizes, comp, dropped = _read_compact(out, meta_budget, len_budget,
                                              flat)
        return n_ok, meta_budget, len_budget, comp, dropped

    def resolve(mp, cand_budget, scan_cap, rs_frac, pay_budget, n_ok,
                meta_budget, len_budget, comp, dropped):
        while dropped is not None and dropped.any() and mp < MP_CAP:
            with profiling.timed("device_codec_escalate"):
                mp = mp * 2
                scan_cap = min(scan_cap * 2, 128)
                # dropped does not say WHICH budget saturated; disable the
                # RS syndrome-split and the payload budget alongside the
                # doublings so ANY saturated budget converges to exact
                rs_frac = None
                pay_budget = 1023
                if total_candidates is None and cand_budget is not None:
                    cand_budget = cand_budget * 2
                n_ok, meta_budget, len_budget, comp, dropped = run_exact(
                    mp, cand_budget, scan_cap, rs_frac, pay_budget
                )
        if total_candidates is None and not (
            dropped is not None and dropped.any()
        ):
            _CODEC_BUDGET_CACHE[cache_key] = _merge_budget_entry(
                _CODEC_BUDGET_CACHE.get(cache_key),
                (mp, cand_budget, scan_cap, meta_budget, len_budget,
                 rs_frac, pay_budget),
            )
        else:
            _CODEC_BUDGET_CACHE.pop(cache_key, None)
        return packets_from_compact(
            bank, host_plan, comp, n_ok, dropped, data, addr, count, sync,
            block0,
        )

    if cached is not None:
        # speculative steady-state path: ZERO readbacks before the packed
        # result -- demod, codec, and compaction queue back-to-back on the
        # device and the single transfer at the end synchronizes everything
        (mp0, cand_budget, scan_cap, meta_budget0, len_budget0, rs_frac0,
         pay0) = cached
        with profiling.timed("device_codec_step"):
            out = _dispatch_codec(
                codec_key, data, addr, count, sync, plan, mp0, cand_budget,
                scan_cap, rs_frac0, pay0, device_keep, keep_globals,
            )
        with profiling.timed("device_codec_compact"):
            packed = compact_codec_out(
                out["ok"], out["address"], out["length"],
                out.get("corrected"), out["packet"], meta_budget0,
                len_budget0, out.get("dropped"),
            )

        def collect():
            meta_budget, len_budget = meta_budget0, len_budget0
            with profiling.timed("device_codec_transfer"):
                flat = np.asarray(packed)
            sizes, comp, dropped = _read_compact(out, meta_budget,
                                                 len_budget, flat)
            n_ok, _total_bytes, max_len = sizes
            if n_ok > meta_budget or max_len > len_budget:
                # compaction budgets overflowed (workload grew): redo the
                # compaction with exact budgets -- correctness never depends
                # on the cache, it only saves round trips
                with profiling.timed("device_codec_redo"):
                    meta_budget = _budget_bucket(n_ok)
                    len_budget = _len_bucket(max_len,
                                             out["packet"].shape[-1])
                    repacked = compact_codec_out(
                        out["ok"], out["address"], out["length"],
                        out.get("corrected"), out["packet"], meta_budget,
                        len_budget, out.get("dropped"),
                    )
                    _, comp, dropped = _read_compact(
                        out, meta_budget, len_budget, np.asarray(repacked)
                    )
            return resolve(mp0, cand_budget, scan_cap, rs_frac0, pay0, n_ok,
                           meta_budget, len_budget, comp, dropped)

        return collect

    def collect():
        scan_cap = 64
        cand_budget = total_candidates
        mp = max_packets_per_block
        pay0 = (
            _il2p_payload_budget(bank, plan)
            if codec_key[0] == "il2p" else 1023
        )
        if codec_key[0] == "il2p" and total_candidates is None:
            with profiling.timed("candidate_budget"):
                cand_budget, scan_cap, max_pb = (
                    auto_candidate_budget_device(sync)
                )
            # right-size the packet-slot budget from the busiest block's
            # candidate count -- skips the escalation recompile ladder on
            # packet-dense blocks (e.g. single-block plans)
            mp = _auto_max_packets(
                max_pb, max_packets_per_block,
                data.shape[0] * data.shape[1], 16 + pay0 + 2,
            )
        frac0 = _rs_frac_default()
        n_ok, meta_budget, len_budget, comp, dropped = run_exact(
            mp, cand_budget, scan_cap, frac0, pay0
        )
        return resolve(mp, cand_budget, scan_cap, frac0, pay0, n_ok,
                       meta_budget, len_budget, comp, dropped)

    return collect


def _device_codec_submit_mixed(bank, plan, groups, data, addr, count, sync,
                               max_packets_per_block, total_candidates,
                               block0: int = 0,
                               host_plan: BlockPlan | None = None,
                               keep_globals: tuple[int, int] | None = None):
    """_device_codec_submit over the bank's codec SUB-GROUPS: a bank whose
    chains mix codec options dispatches one device codec per sub-group of
    chain rows (sliced along the chain axis; the demod/slicer program
    already ran once for the whole bank) -- no chain falls back to the
    host FSM just because its neighbour decodes a different protocol.
    ``groups`` comes from _codec_subgroups.  Every sub-group dispatches
    before any readback; collect() drains them in config order."""
    if len(groups) == 1:
        return _device_codec_submit(
            bank, plan, groups[0][0], data, addr, count, sync,
            max_packets_per_block, total_candidates, block0, host_plan,
            keep_globals,
        )
    subs = []
    for key, idxs in groups:
        lo, hi = idxs[0], idxs[-1] + 1
        sel = slice(lo, hi) if idxs == list(range(lo, hi)) else np.asarray(idxs)
        subs.append(_device_codec_submit(
            _bank_chain_subset(bank, idxs), plan, key,
            data[sel], addr[sel], count[sel], sync[sel],
            max_packets_per_block, total_candidates, block0, host_plan,
            keep_globals,
        ))

    def collect():
        out: dict[str, list] = {}
        for c in subs:
            out.update(c())
        return out

    return collect


# tile the codec stage only when the single-dispatch recording is long
# enough that its packed readback + host build tail (~75 ms on the PLL
# hour: 1.5 MB at ~40 MB/s tunnel + ~8k Packet objects) clearly exceeds
# the sizing/compile cost of extra sub-range programs
_CODEC_TILE_MIN_BLOCKS = 96
_CODEC_TILES = 4


def _submit_codec_tiled(bank, plan, groups, data, addr, count, sync,
                        max_packets_per_block, total_candidates):
    """Codec submission for the single-dispatch route, tiled over block
    ranges with threaded collects.

    plan_bank_run's lane-quantum alignment often fits a whole recording
    in ONE demod dispatch (e.g. the PLL hour: 8 chains x 256 blocks =
    exactly one 2048-lane tile), so the per-group pipelining of
    _submit_bank_group_pipelined never triggers and the codec stage, its
    packed readback and the host packet build run as a serial tail with
    the device idle (measured 310 ms hour: demod 145 / codec ~60 /
    transfer+build ~75).  Here the demod still runs as that one optimal
    dispatch, but the codec is submitted per block RANGE against a local
    template plan (the streaming decoder's block0/host_plan mechanics,
    _device_codec_submit) with ``keep_globals`` carrying the true block
    indices so the device keep filter still drops halo duplicates before
    the packed transfer.  Tile collects drain on a 2-worker pool: tile
    i's transfer overlaps tile i+1..'s codec compute AND tile i-1's host
    packet build.  Packet semantics are unchanged -- same keep windows,
    same escalation/fallback per tile, same boundary dedup (asserted by
    tests/test_bank_runtime.py's tiled-vs-single parity test)."""
    n_blocks = data.shape[1]
    if n_blocks < _CODEC_TILE_MIN_BLOCKS:
        return _device_codec_submit_mixed(
            bank, plan, groups, data, addr, count, sync,
            max_packets_per_block, total_candidates,
        )
    from concurrent.futures import ThreadPoolExecutor

    tile = -(-n_blocks // _CODEC_TILES)
    template = BlockPlan(
        n_audio=0, trim=plan.trim, block_len=plan.block_len,
        overlap=plan.overlap, up=plan.up, trim_post=plan.trim_post,
    )
    subs = []
    for b0 in range(0, n_blocks, tile):
        b1 = min(b0 + tile, n_blocks)
        subs.append(_device_codec_submit_mixed(
            bank, template, groups,
            data[:, b0:b1], addr[:, b0:b1], count[:, b0:b1],
            sync[:, b0:b1], max_packets_per_block, total_candidates,
            block0=b0, host_plan=plan,
            keep_globals=(b0, plan.n_demod),
        ))
    pool = ThreadPoolExecutor(max_workers=2, thread_name_prefix="codec-tile")
    futs = [pool.submit(s) for s in subs]

    def collect():
        merged: dict[str, list] = {}
        try:
            for f in futs:
                for name, pkts in f.result().items():
                    merged.setdefault(name, []).extend(pkts)
        finally:
            pool.shutdown(wait=False)
        by_name = {c.name: c for c in bank.specs}
        return {
            name: _dedup_block_boundary(pkts, by_name[name])
            for name, pkts in merged.items()
        }

    return collect


def _device_codec_packets(bank, plan, codec_key, data, addr, count, sync,
                          max_packets_per_block, total_candidates):
    """Run the on-device codec over bank outputs and build packet objects."""
    return _device_codec_submit(
        bank, plan, codec_key, data, addr, count, sync,
        max_packets_per_block, total_candidates,
    )()


def _fallback_block_packets(per_chain, bank, plan, fallback, data, addr,
                            count, sync, block0: int = 0):
    """Decode candidate-saturated blocks with the exact host FSM (device
    result may be incomplete there).  Reads the byte streams back only when
    such blocks exist.  ``fallback`` holds LOCAL (chain, block) indices;
    ``block0`` shifts them to global stream position (streaming steps)."""
    if not fallback:
        return
    data, addr, count, sync = (
        np.asarray(x) for x in (data, addr, count, sync)
    )
    for ci, b in sorted(fallback):
        chain = bank.specs[ci]
        n = int(count[ci, b])
        if n == 0:
            continue
        offset = (b + block0) * plan.block_len - plan.overlap
        pkts = host_decode_block(
            chain,
            data[ci, b, :n].astype(np.int64),
            addr[ci, b, :n].astype(np.int64) + offset,
            sync[ci, b],
        )
        lo, hi = plan.keep_range(b + block0)
        per_chain.setdefault(int(ci), []).extend(
            p for p in pkts if lo < p.streamaddress <= hi
        )


def packets_from_compact(bank, plan, comp, n_ok, dropped, data, addr, count,
                         sync, block0: int = 0):
    """Build per-chain Packet lists from compact_codec_out readbacks.

    ``block0``: global stream index of the buffers' block 0 (streaming
    steps address blocks locally on device; addresses and keep windows
    shift by whole blocks here on host)."""
    from .. import profiling
    from ..packets import Packet

    with profiling.timed("packet_objects"):
        fallback = (
            set(map(tuple, np.argwhere(dropped > 0)))
            if dropped is not None
            else set()
        )
        corrected = comp.get("corrected")
        # vectorized keep filter (keep_range + fallback membership), then
        # ONE bulk bytes->list conversion and a plain zip loop of dataclass
        # constructions -- the per-packet int()/tolist() form cost ~56 us
        # per packet, dominating the packet-dense PLL bench
        chain_a = comp["chain"][:n_ok].astype(np.int64)
        block_a = comp["block"][:n_ok].astype(np.int64)  # LOCAL indices
        addr_a = (
            comp["address"][:n_ok].astype(np.int64)
            + block0 * plan.block_len
        )
        lo = (block_a + block0) * plan.block_len
        keep = (addr_a > lo) & (
            addr_a <= np.minimum(lo + plan.block_len, plan.n_demod)
        )
        if fallback:
            key = chain_a * plan.n_blocks + block_a
            fb_keys = np.array(
                [ci * plan.n_blocks + b for ci, b in fallback], dtype=np.int64
            )
            keep &= ~np.isin(key, fb_keys)
        idx = np.nonzero(keep)[0]
        flat_list = comp["bytes"].tolist()
        corr_l = (
            corrected[:n_ok][idx].tolist()
            if corrected is not None
            else [0] * len(idx)
        )
        idents = [spec.codec.ident for spec in bank.specs]
        per_chain: dict[int, list] = {}
        with profiling.timed("packet_build"):
            for ci, address, length, base, corr in zip(
                chain_a[idx].tolist(), addr_a[idx].tolist(),
                comp["length"][:n_ok][idx].tolist(),
                comp["base"][:n_ok][idx].tolist(), corr_l,
            ):
                per_chain.setdefault(ci, []).append(
                    Packet(
                        data=flat_list[base : base + length],
                        streamaddress=address,
                        source_decoder=idents[ci],
                        bytes_corrected=corr,
                    )
                )
        with profiling.timed("packet_fallback"):
            _fallback_block_packets(
                per_chain, bank, plan, fallback, data, addr, count, sync,
                block0,
            )
        for pkts in per_chain.values():
            pkts.sort(key=lambda p: p.streamaddress)
        with profiling.timed("packet_dedup"):
            return {
                chain.name: _dedup_block_boundary(per_chain.get(ci, []), chain)
                for ci, chain in enumerate(bank.specs)
            }


def packets_from_device_out(bank, plan, out, data, addr, count, sync):
    """Convert numpy device-codec output buffers into per-chain Packet lists,
    with host-FSM fallback for candidate-saturated blocks."""
    from .. import profiling
    from ..packets import Packet

    with profiling.timed("packet_objects"):
        corrected = out.get("corrected")
        # blocks whose candidate compaction saturated (device result may be
        # incomplete) fall back to the exact host FSM
        dropped = out.get("dropped")
        fallback = (
            set(map(tuple, np.argwhere(dropped > 0)))
            if dropped is not None
            else set()
        )
        per_chain: dict[int, list] = {}
        for ci, b, p in np.argwhere(out["ok"]):
            if (ci, b) in fallback:
                continue
            address = int(out["address"][ci, b, p])
            lo, hi = plan.keep_range(b)
            if not (lo < address <= hi):
                continue
            length = int(out["length"][ci, b, p])
            per_chain.setdefault(int(ci), []).append(
                Packet(
                    data=out["packet"][ci, b, p, :length].tolist(),
                    streamaddress=address,
                    source_decoder=bank.specs[ci].codec.ident,
                    bytes_corrected=int(corrected[ci, b, p])
                    if corrected is not None
                    else 0,
                )
            )
        _fallback_block_packets(
            per_chain, bank, plan, fallback, data, addr, count, sync
        )
        for pkts in per_chain.values():
            pkts.sort(key=lambda p: p.streamaddress)
        return {
            chain.name: _dedup_block_boundary(per_chain.get(ci, []), chain)
            for ci, chain in enumerate(bank.specs)
        }


def _dispatch_bank_step(bank, plan, st, cap, sync_tol, audio, dtype,
                        method, unroll, max_blocks_per_step):
    """Run the bank device program.  Recordings longer than
    max_blocks_per_step blocks run as ONE device program that maps over
    fixed-shape block groups (bank_device_step_grouped) -- a single native
    -dtype audio upload, HBM bounded by group size.  Returns DEVICE arrays;
    callers decide what (if anything) to read back."""
    pallas = _pallas_loop_wanted(dtype)
    # keep the wire dtype: int16 WAV uploads as int16; frames convert on
    # device (int16 -> f32/f64 is exact, so decisions are unchanged).  Audio
    # already resident on device (a jax.Array, e.g. from a serving loop or a
    # prior feed) is used as-is -- no host round trip, no re-upload.
    if isinstance(audio, jax.Array) and not isinstance(audio, np.ndarray):
        wire = audio
    else:
        audio = np.asarray(audio)
        wire = audio if audio.dtype in (np.int16, np.float32) else (
            audio.astype(np.float64) if dtype == jnp.float64
            else audio.astype(np.float32)
        )
    if max_blocks_per_step is None or plan.n_blocks <= max_blocks_per_step:
        return bank_device_step(
            bank.kind, bank.slicer_kind, bank.params,
            jnp.asarray(wire), plan, cap,
            bank.stream_polys, bank.stream_inverts,
            st["state_mask"], st["bits_per_symbol"], sync_tol, method,
            unroll, st["compact_window"], pallas, st["demap"],
            dtype=jnp.dtype(dtype).name,
        )
    return bank_device_step_grouped(
        bank.kind, bank.slicer_kind, bank.params,
        jnp.asarray(wire), plan, max_blocks_per_step, cap,
        bank.stream_polys, bank.stream_inverts,
        st["state_mask"], st["bits_per_symbol"], sync_tol, method,
        unroll, st["compact_window"], dtype, pallas, st["demap"],
    )


def run_banked(chains: list[ChainSpec], audio: np.ndarray, dtype=None,
               block_seconds: float | str = "auto",
               overlap_seconds: float | str = "auto",
               method: str = "auto", unroll: int = 8, codec: str = "device",
               max_packets_per_block: int = 8,
               max_blocks_per_step: int | None | str = "auto",
               total_candidates: int | None = None,
               max_packet_seconds: float | None = None):
    """Run a full chain list via banked block-parallel device programs.

    Returns {chain_name: list[Packet]} with per-block keep-region filtering
    applied (each packet attributed to exactly one block).

    codec: 'device' (default -- measurably faster end-to-end, bench.py)
    runs the batched on-device codecs (codecs/il2p_device.py,
    codecs/ax25_device.py) when every chain in a bank shares codec
    options, leaving the host only packet-object conversion and
    reporting; banks with mixed codec options, and blocks whose device
    result saturated a budget (candidate overflow, max_packets), fall
    back per bank / per block to 'host' -- the reference-exact FSMs on
    device-computed sync candidates.

    max_blocks_per_step: cap on blocks per device dispatch.  Long
    recordings run as ONE device program mapping over fixed-shape block
    groups, bounding HBM by group size instead of recording length.  The
    default 'auto' sizes groups for VPU lane occupancy vs HBM
    (auto_blocks_per_step); None forces a single ungrouped dispatch.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if not isinstance(audio, jax.Array):
        audio = np.asarray(audio)
    results: dict[str, list] = {}
    for collect in _submit_banked(
        chains, audio, dtype, block_seconds, overlap_seconds, method,
        unroll, codec, max_packets_per_block, max_blocks_per_step,
        total_candidates, max_packet_seconds,
    ):
        results.update(collect())
    return results


def _host_codec_collect(bank, plan, sync_tol, arrays):
    """collect() for a bank on the host-FSM codec path: read the byte
    streams back and run the reference-exact FSMs per block."""
    from .. import profiling
    from ..codecs.host import il2p_seeded_sync_any
    from ..config import IL2PCodecSpec

    data, addr, count, sync = arrays
    results: dict[str, list] = {}
    with profiling.timed("transfer"):
        data = np.asarray(data)
        addr = np.asarray(addr)
        count = np.asarray(count)
        sync = np.asarray(sync)  # packed bitmap (C, B, cap) uint8
    # vectorized block skip: a block without any sync candidate (and no
    # possible seeded-history sync in its first 32 bits) emits nothing
    has_cand = sync.any(axis=2) | il2p_seeded_sync_any(
        data[:, :, :4], sync_tol
    )
    for ci, chain in enumerate(bank.specs):
        skippable = isinstance(chain.codec, IL2PCodecSpec)
        packets = []
        for b in range(plan.n_blocks):
            n = int(count[ci, b])
            if n == 0 or (skippable and not has_cand[ci, b]):
                continue
            block_bytes = data[ci, b, :n].astype(np.int64)
            # addresses are 1-based within the block's demod range,
            # which starts at absolute index b*block_len - overlap.
            offset = b * plan.block_len - plan.overlap
            block_addr = addr[ci, b, :n].astype(np.int64) + offset
            with profiling.timed("host_codec"):
                pkts = host_decode_block(
                    chain, block_bytes, block_addr, sync[ci, b]
                )
            lo, hi = plan.keep_range(b)
            packets.extend(
                p for p in pkts if lo < p.streamaddress <= hi
            )
        results[chain.name] = _dedup_block_boundary(packets, chain)
    return results


def _submit_banked(chains, audio, dtype, block_seconds, overlap_seconds,
                   method, unroll, codec, max_packets_per_block,
                   max_blocks_per_step, total_candidates,
                   max_packet_seconds=None):
    """Dispatch every bank's device programs for one recording; return a
    list of collect() closures (one per bank, each -> {chain: packets}).

    Dispatch is async, so bank i's first sync point (candidate stats or
    byte-stream transfer) overlaps banks i+1..n's device compute -- the
    multi-bank CLI configs (e.g. afsk_300.json builds 4 banks) would
    otherwise serialize a full tunnel round trip per bank.  On budget-cache
    hits the codec + compaction stages dispatch here too, so a whole
    recording runs back-to-back on device with one readback per bank at
    collect time (run_banked_many pipelines this across recordings)."""
    from functools import partial as _p

    from .. import profiling

    with profiling.timed("group_chains"):
        banks = group_chains(chains, dtype)
    collectors = []
    for bank in banks:
        sample_rate = bank.specs[0].modem.sample_rate
        plan, group = plan_bank_run(
            bank, len(audio), sample_rate, dtype, block_seconds,
            overlap_seconds, max_packet_seconds, max_blocks_per_step,
        )
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
        groups = _codec_subgroups(bank) if codec == "device" else None
        if (
            groups is not None
            and group is not None
            and plan.n_blocks > group
        ):
            # long recording on the device-codec route: per-group
            # pipelined dispatch (readbacks/host builds hide behind
            # later groups' device compute)
            with profiling.timed("device_step"):
                collectors.append(_submit_bank_group_pipelined(
                    bank, plan, group, st, cap, sync_tol, audio, dtype,
                    method, unroll, groups, max_packets_per_block,
                    total_candidates,
                ))
            continue
        with profiling.timed("device_step"):
            arrays = _dispatch_bank_step(
                bank, plan, st, cap, sync_tol, audio, dtype, method,
                unroll, group,
            )
        if groups is not None:
            data, addr, count, sync = arrays
            collectors.append(_submit_codec_tiled(
                bank, plan, groups, data, addr, count, sync,
                max_packets_per_block, total_candidates,
            ))
        else:
            collectors.append(_p(_host_codec_collect, bank, plan, sync_tol,
                                 arrays))
    return collectors


@partial(jax.jit, static_argnames=("win_len",))
def _slice_window(padded: jax.Array, start, win_len: int) -> jax.Array:
    return jax.lax.dynamic_slice(
        padded, (jnp.asarray(start, jnp.int32),), (win_len,)
    )


def _submit_bank_group_pipelined(bank, plan, group, st, cap, sync_tol, audio,
                                 dtype, method, unroll, codec_groups,
                                 max_packets_per_block, total_candidates):
    """Per-block-group pipelined submission for one bank: demod + codec +
    compaction dispatch PER GROUP, so group i's packed readback and host
    packet build overlap groups i+1..'s device compute.

    The single-program grouped dispatch (bank_device_step_grouped) leaves
    a serial tail on a single-shot call: after the whole device chain
    finishes, the packed transfer (~2 MB at ~40 MB/s on this tunnel) and
    the host Packet build run with the device idle -- ~75-100 ms of the
    coherent-PLL hour that only run_banked_many's cross-recording
    pipelining could hide.  Here the recording's padded audio stays
    device-resident and each group runs the SAME programs the streaming
    decoder uses (bank_device_step_window + the local-template
    _device_codec_submit with ``block0``), so every group's collect
    drains while later groups compute.  Semantics are identical to the
    grouped dispatch: same block boundaries, same per-group AGC
    normalization (the grouped lax.map also normalizes per group), same
    keep/dedup arithmetic -- asserted by the grouped-vs-single parity
    tests."""
    g = group
    n_groups = -(-plan.n_blocks // g)
    stride = plan.stride_in
    ext = plan.block_input_len - stride
    total = n_groups * g * stride + ext
    if isinstance(audio, jax.Array) and not isinstance(audio, np.ndarray):
        wire = audio
    else:
        audio = np.asarray(audio)
        wire = audio if audio.dtype in (np.int16, np.float32) else (
            audio.astype(np.float64) if dtype == jnp.float64
            else audio.astype(np.float32)
        )
    padded = jnp.pad(
        jnp.asarray(wire),
        (plan.front_pad, total - plan.front_pad - plan.n_audio),
    )
    win_len = (g - 1) * stride + plan.block_input_len
    template = BlockPlan(
        n_audio=0, trim=bank.trim, block_len=plan.block_len,
        overlap=plan.overlap, up=plan.up, trim_post=plan.trim_post,
    )
    pallas = _pallas_loop_wanted(dtype)
    subs = []
    for gi in range(n_groups):
        win = _slice_window(padded, gi * g * stride, win_len)
        data, addr, count, sync = bank_device_step_window(
            bank.kind, bank.slicer_kind, bank.params, win, g, stride, ext,
            cap, bank.stream_polys, bank.stream_inverts,
            st["state_mask"], st["bits_per_symbol"], sync_tol, method,
            unroll, st["compact_window"], pallas=pallas,
            slicer_demap=st["demap"], dtype=jnp.dtype(dtype).name,
        )
        subs.append(_device_codec_submit_mixed(
            bank, template, codec_groups, data, addr, count, sync,
            max_packets_per_block, total_candidates, block0=gi * g,
            host_plan=plan,
        ))

    def collect():
        merged: dict[str, list] = {}
        for sub in subs:
            for name, pkts in sub().items():
                merged.setdefault(name, []).extend(pkts)
        by_name = {c.name: c for c in bank.specs}
        return {
            name: _dedup_block_boundary(pkts, by_name[name])
            for name, pkts in merged.items()
        }

    return collect


def run_banked_many(chains, audios, depth: int = 1, dtype=None,
                    block_seconds: float | str = "auto",
                    overlap_seconds: float | str = "auto",
                    method: str = "auto", unroll: int = 8,
                    codec: str = "device", max_packets_per_block: int = 8,
                    max_blocks_per_step: int | None | str = "auto",
                    total_candidates: int | None = None,
                    max_packet_seconds: float | None = None):
    """Pipelined decode of a stream of recordings (the serving loop):
    recording i+1's device programs are dispatched before recording i's
    results are read back, so each readback round trip and host packet
    build hides behind the next recording's device compute.

    ``depth`` recordings stay in flight (device memory holds depth+1
    recordings' block outputs).  Returns one {chain: packets} dict per
    recording, in order -- identical to [run_banked(chains, a) for a in
    audios].  (The reference's per-process whole-file model has no serving
    analog; this is the TPU-native replacement for re-running
    pymodem.py per file.)"""
    from collections import deque

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    kw = (dtype, block_seconds, overlap_seconds, method, unroll, codec,
          max_packets_per_block, max_blocks_per_step, total_candidates,
          max_packet_seconds)

    def drain(collectors):
        res: dict[str, list] = {}
        for collect in collectors:
            res.update(collect())
        return res

    out = []
    queue: deque = deque()
    for audio in audios:
        if not isinstance(audio, jax.Array):
            audio = np.asarray(audio)
        queue.append(_submit_banked(chains, audio, *kw))
        if len(queue) > depth:
            out.append(drain(queue.popleft()))
    while queue:
        out.append(drain(queue.popleft()))
    return out




def host_decode_block(chain: ChainSpec, block_bytes: np.ndarray,
                      block_addr: np.ndarray, sync_row: np.ndarray | None):
    """Run a chain's codec FSM over one block's byte stream (host side).

    ``sync_row``: packed IL2P sync-candidate bitmap for the block's bytes,
    or None to rescan on host.  Returns the block's packets (unfiltered).
    """
    from ..codecs.host import (
        ax25_decode_host,
        il2p_decode_host,
        il2p_seeded_sync_possible,
    )
    from ..config import AX25CodecSpec, IL2PCodecSpec

    codec = chain.codec
    n = len(block_bytes)
    if isinstance(codec, AX25CodecSpec):
        return ax25_decode_host(
            block_bytes, block_addr, codec.ident,
            min_packet_length=codec.min_packet_length,
            max_packet_length=codec.max_packet_length,
        )
    if isinstance(codec, IL2PCodecSpec):
        candidates = None
        if sync_row is not None:
            if not sync_row[:n].any() and not il2p_seeded_sync_possible(
                block_bytes[:4], codec.sync_tolerance
            ):
                return []
            candidates = np.flatnonzero(np.unpackbits(sync_row[:n]))
        return il2p_decode_host(
            block_bytes, block_addr, codec.ident,
            collect_trailing_crc=codec.collect_trailing_crc,
            disable_rs=codec.disable_rs,
            min_distance=codec.min_distance,
            sync_tolerance=codec.sync_tolerance,
            sync_candidates=candidates,
        )
    raise ValueError(type(codec))


def _dedup_block_boundary(packets, chain):
    """Drop block-boundary duplicates: a packet ending within one byte-phase
    quantum of a block edge can be claimed by both neighbouring blocks under
    different reported addresses."""
    sl = chain.slicer
    window = 16.0 * sl.sample_rate / sl.symbol_rate
    packets.sort(key=lambda p: p.streamaddress)
    deduped = []
    for p in packets:
        if (
            deduped
            and list(p.data) == list(deduped[-1].data)
            and p.streamaddress - deduped[-1].streamaddress < window
        ):
            continue
        deduped.append(p)
    return deduped



def run_banked_files(chains: list[ChainSpec], audios: list[np.ndarray],
                     dtype=None, block_seconds: float | str = "auto",
                     overlap_seconds: float | str = "auto",
                     method: str = "auto",
                     unroll: int = 8, codec: str = "device",
                     max_packets_per_block: int = 8,
                     max_packet_seconds: float | None = None):
    """Decode SEVERAL recordings in one device program per bank.

    Every file's overlap-save blocks concatenate along the block axis (the
    recordings-batch analog of the reference's one-file-per-run driver), so
    a whole corpus fills the lane dimension of a single dispatch.  Returns
    one {chain_name: packets} dict per input file, each with per-file
    stream addresses identical to decoding that file alone.

    codec='device' (default) runs the batched on-device codec per file
    slice against a FIXED template plan (every file shares the jit program
    and the budget cache for its block count), with all files' codec
    stages dispatched before any packed readback; 'host' (or mixed codec
    options) runs the reference-exact FSMs on the device-computed sync
    candidates.
    """
    from .. import profiling
    from ..codecs.host import il2p_seeded_sync_any

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    audios = [np.asarray(a) for a in audios]
    results: list[dict[str, list]] = [dict() for _ in audios]
    for bank in group_chains(chains, dtype):
        sample_rate = bank.specs[0].modem.sample_rate
        bank_block, bank_overlap = resolve_bank_geometry(
            bank, sample_rate, dtype, block_seconds, overlap_seconds,
            max_packet_seconds,
        )
        # uniform geometry so every file's blocks share one compiled program:
        # short files use the standard block size too (padded + keep-clipped)
        # instead of default_block_plan's shrunken single block
        demod_rate = sample_rate * bank.up
        block_len = -(-max(int(bank_block * demod_rate), bank.up)
                      // bank.up) * bank.up
        overlap = int(bank_overlap * demod_rate) // bank.up * bank.up
        plans = [
            BlockPlan(len(a), bank.trim, block_len, overlap, bank.up,
                      bank.trim_post)
            for a in audios
        ]
        lin = plans[0].block_input_len
        st = _slicer_static(bank)
        cap = max(bank_capacity(bank, p) for p in plans)
        sync_tol = max(
            (
                getattr(c.codec, "sync_tolerance", 0)
                for c in bank.specs
                if isinstance(c.codec, IL2PCodecSpec)
            ),
            default=0,
        )
        np_dt = np.dtype(jnp.dtype(dtype).name)
        frames_list = []
        owners = []  # (file_idx, block_idx)
        for fi, (audio, plan) in enumerate(zip(audios, plans)):
            # frames materialize directly at the wire dtype (f32 on
            # accelerators): half the host RAM and transfer of an f64 build
            padded = np.zeros(
                plan.n_blocks * plan.stride_in + lin - plan.stride_in,
                dtype=np_dt,
            )
            padded[plan.front_pad : plan.front_pad + len(audio)] = audio
            for b in range(plan.n_blocks):
                s = b * plan.stride_in
                frames_list.append(padded[s : s + lin])
                owners.append((fi, b))
        frames = np.stack(frames_list)
        data, addr, count, sync = bank_device_step_frames(
            bank.kind, bank.slicer_kind, bank.params,
            jnp.asarray(frames), cap,
            bank.stream_polys, bank.stream_inverts,
            st["state_mask"], st["bits_per_symbol"], sync_tol, method, unroll,
            st["compact_window"], slicer_demap=st["demap"],
        )
        groups = _codec_subgroups(bank) if codec == "device" else None
        if groups is not None:
            # per-file device codec over block-axis slices, all files'
            # codec + compaction dispatched before any packed readback
            # (the fixed template plan keys one jit program and one budget
            # cache entry per block-count shape, not per file)
            template = BlockPlan(
                n_audio=0, trim=bank.trim, block_len=block_len,
                overlap=overlap, up=bank.up, trim_post=bank.trim_post,
            )
            collectors = []
            start = 0
            for fi, plan in enumerate(plans):
                nb = plan.n_blocks
                sl = slice(start, start + nb)
                start += nb
                collectors.append((fi, _device_codec_submit_mixed(
                    bank, template, groups, data[:, sl], addr[:, sl],
                    count[:, sl], sync[:, sl], max_packets_per_block,
                    None, host_plan=plan,
                )))
            for fi, collect in collectors:
                results[fi].update(collect())
            continue
        data, addr, count, sync = map(np.asarray, (data, addr, count, sync))
        has_cand = sync.any(axis=2) | il2p_seeded_sync_any(
            data[:, :, :4], sync_tol
        )
        for ci, chain in enumerate(bank.specs):
            skippable = isinstance(chain.codec, IL2PCodecSpec)
            per_file: list[list] = [[] for _ in audios]
            for gi, (fi, b) in enumerate(owners):
                n = int(count[ci, gi])
                if n == 0 or (skippable and not has_cand[ci, gi]):
                    continue
                plan = plans[fi]
                offset = b * plan.block_len - plan.overlap
                pkts = host_decode_block(
                    chain,
                    data[ci, gi, :n].astype(np.int64),
                    addr[ci, gi, :n].astype(np.int64) + offset,
                    sync[ci, gi],
                )
                lo, hi = plan.keep_range(b)
                per_file[fi].extend(
                    p for p in pkts if lo < p.streamaddress <= hi
                )
            for fi in range(len(audios)):
                results[fi][chain.name] = _dedup_block_boundary(
                    per_file[fi], chain
                )
    return results

def run_plan_banked(plan, audio: np.ndarray, sample_rate: float, dtype=None,
                    block_seconds: float | str = "auto",
                    overlap_seconds: float | str = "auto",
                    method: str = "auto", unroll: int = 8,
                    codec: str = "device", verbose: bool = False,
                    resilient: bool = True,
                    max_packet_seconds: float | None = None):
    """Banked analog of executor.run_plan: full plan -> aggregated report.

    Chain order in the aggregate follows the config file (deterministic),
    unlike the reference's process-completion order (pymodem.py:158-163).

    ``resilient`` mirrors the reference's per-stage skip-and-continue
    (chain_execute.py:8-27): if the banked program fails, every chain is
    retried individually through the sequential executor and chains that
    still fail are reported and skipped rather than killing the run.
    """
    from ..packets import PacketAggregate
    from .executor import RunResult

    if verbose:
        print(f"banked runtime: {len(plan.chains)} chains")
    from .executor import run_chain

    seq_chains = []
    try:
        by_name = run_banked(
            plan.chains, audio, dtype=dtype, block_seconds=block_seconds,
            overlap_seconds=overlap_seconds, method=method, unroll=unroll,
            codec=codec, max_packet_seconds=max_packet_seconds,
        )
    except Exception as exc:  # noqa: BLE001 - skip-and-continue contract
        if not resilient:
            raise
        print(f"banked runtime failed ({type(exc).__name__}: {exc}); "
              f"retrying chains sequentially")
        by_name = {}
        seq_chains = list(plan.chains)
    for c in seq_chains:
        try:
            by_name[c.name] = run_chain(c, audio, dtype=dtype, method=method,
                                        unroll=unroll)
        except Exception as exc:  # noqa: BLE001
            if not resilient:
                raise
            print(f"skipped chain {c.name}: {type(exc).__name__}: {exc}")
            by_name[c.name] = []
    return _finish_plan(plan, by_name, sample_rate)


def _finish_plan(plan, by_name: dict, sample_rate: float):
    """Aggregate one recording's per-chain packets into a RunResult
    (config-order chains, cross-chain correlate, rendered reports)."""
    from ..packets import PacketAggregate
    from .executor import RunResult

    aggregate = PacketAggregate()
    for chain in plan.chains:
        aggregate.add(by_name.get(chain.name, []))
    aggregate.validate_all()
    # Cross-chain dedup window: the reference's rate/40 (pymodem.py:175)
    # widened by two byte-phase quanta -- block slicers restart their byte
    # counter per block, so the same packet's reported address differs by up
    # to 8 symbol periods per chain.
    max_sps = max(
        (c.slicer.sample_rate / c.slicer.symbol_rate for c in plan.chains),
        default=1.0,
    )
    aggregate.correlate(address_distance=sample_rate / 40 + 16 * max_sps)
    reports = [
        aggregate.render_raw_bad() + aggregate.render_report(r.style)
        for r in plan.reports
    ]
    return RunResult(aggregate=aggregate, reports=reports)


def run_plans_banked_pipelined(jobs, depth: int = 1, dtype=None,
                               block_seconds: float | str = "auto",
                               overlap_seconds: float | str = "auto",
                               method: str = "auto", unroll: int = 8,
                               codec: str = "device",
                               max_packet_seconds: float | None = None):
    """Pipelined decode of (plan, audio, sample_rate) jobs that may use
    DIFFERENT configs: every job's device programs dispatch before earlier
    jobs' packed readbacks (up to ``depth`` jobs in flight), so a mixed
    queue -- e.g. a serve.py batch spanning config files -- hides each
    readback and report build behind the next job's compute instead of
    serializing at config-group boundaries.  Returns one RunResult per
    job, identical to per-job run_plan_banked."""
    from collections import deque

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def drain(item):
        plan, rate, collectors = item
        by_name: dict[str, list] = {}
        for collect in collectors:
            by_name.update(collect())
        return _finish_plan(plan, by_name, rate)

    out = []
    queue: deque = deque()
    for plan, audio, rate in jobs:
        if not isinstance(audio, jax.Array):
            audio = np.asarray(audio)
        queue.append((plan, rate, _submit_banked(
            plan.chains, audio, dtype, block_seconds, overlap_seconds,
            method, unroll, codec, 8, "auto", None, max_packet_seconds,
        )))
        if len(queue) > depth:
            out.append(drain(queue.popleft()))
    while queue:
        out.append(drain(queue.popleft()))
    return out


def run_plan_banked_many(plan, audios, sample_rate: float, depth: int = 1,
                         dtype=None, block_seconds: float | str = "auto",
                         overlap_seconds: float | str = "auto",
                         method: str = "auto",
                         unroll: int = 8, codec: str = "device",
                         resilient: bool = True,
                         max_packet_seconds: float | None = None):
    """Pipelined run_plan_banked over several recordings (the serving warm
    path): recording i+1's device programs dispatch before recording i's
    packed readback (run_banked_many), so the readback round trip and the
    host packet/report build hide behind device compute.  Returns one
    RunResult per recording, identical to per-recording run_plan_banked."""
    try:
        per_rec = run_banked_many(
            plan.chains, audios, depth=depth, dtype=dtype,
            block_seconds=block_seconds, overlap_seconds=overlap_seconds,
            method=method, unroll=unroll, codec=codec,
            max_packet_seconds=max_packet_seconds,
        )
    except Exception as exc:  # noqa: BLE001 - skip-and-continue contract
        if not resilient:
            raise
        print(f"banked runtime failed ({type(exc).__name__}: {exc}); "
              f"retrying recordings individually")
        return [
            run_plan_banked(plan, a, sample_rate, dtype=dtype,
                            block_seconds=block_seconds,
                            overlap_seconds=overlap_seconds, method=method,
                            unroll=unroll, codec=codec,
                            max_packet_seconds=max_packet_seconds)
            for a in audios
        ]
    return [
        _finish_plan(plan, by_name, sample_rate)
        for by_name in per_rec
    ]
