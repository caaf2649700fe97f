"""Reed-Solomon decode (and encode, for the signal synthesizer).

IL2P uses two RS codes over GF(256)/0x11D, first root 0: a (15,13) header
code (2 roots) and a (N,N-16) payload-block code (16 roots) (il2p.py:130-136).

``rs_decode_np`` reproduces the reference decoder's exact behaviour
(rs_functions.py:33-150): Horner syndromes, a Berlekamp iteration with a
persistent (stale-carrying) next-locator buffer, Chien search over the block,
Forney magnitudes with the reference's index arithmetic quirks (log[0] == 0;
index reductions that may pass through -1, which aliases to table[254]), a
``min_distance`` margin that refuses corrections when error_count exceeds
(nroots/2 - min_distance), and a final syndrome recheck that returns -1 on
failure while leaving any corrections applied.

``rs_decode_jax`` is the same algorithm in fixed-shape, batched array form:
everything is vectorized over a batch of blocks, loops are unrolled to the
static root count, and data-dependent sizes become masks.  Equivalence to the
numpy version (and transitively to the reference) is asserted in
tests/test_primitives.py over randomized error patterns.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .gf import GF256, GFTables, np_gf_mul, np_poly_mul


@dataclass(frozen=True)
class RSCode:
    gf: GFTables
    first_root: int
    num_roots: int
    genpoly: np.ndarray  # lowest order first, degree == num_roots


def make_rs(first_root: int, num_roots: int, gf: GFTables = GF256) -> RSCode:
    """Generator polynomial prod_{i}(x + alpha^(first_root+i))
    (rs_functions.py:9-31)."""
    genpoly = np.array([gf.antilog[first_root], 1], dtype=np.int32)
    for i in range(first_root + 1, first_root + num_roots):
        factor = np.array([gf.antilog[i], 1], dtype=np.int32)
        genpoly = np_poly_mul(gf, genpoly, factor)
    return RSCode(gf=gf, first_root=first_root, num_roots=num_roots, genpoly=genpoly)


RS_HEADER = make_rs(0, 2)  # il2p.py:131-135
RS_BLOCK = make_rs(0, 16)  # il2p.py:132-136


# ---------------------------------------------------------------------------
# Host (numpy) decoder -- exact mirror of the reference control flow
# ---------------------------------------------------------------------------


def _np_syndromes(rs: RSCode, data, block_size: int) -> np.ndarray:
    """Vectorized syndromes, identical to the reference's Horner loop
    (rs_functions.py:36-42): synd[i] = XOR_j d[j] * alpha^((fr+i)(bs-1-j))."""
    gf = rs.gf
    d = np.asarray(data[:block_size], dtype=np.int32)
    deg = np.arange(block_size - 1, -1, -1, dtype=np.int64)[:, None]  # (L, 1)
    roots = np.arange(rs.first_root, rs.first_root + rs.num_roots)[None, :]
    power = (deg * roots) % (gf.order - 1)  # (L, R)
    terms = np.where(
        d[:, None] == 0, 0, gf.antilog[(gf.log[d][:, None] + power) % (gf.order - 1)]
    )
    return np.bitwise_xor.reduce(terms, axis=0).astype(np.int32)


def rs_decode_np(rs: RSCode, data, block_size: int, min_distance: int = 0) -> int:
    """Decode in place; returns corrected-error count or -1 on failure."""
    gf = rs.gf
    order = gf.order
    nroots = rs.num_roots
    t2 = nroots // 2
    mul = lambda a, b: int(np_gf_mul(gf, a, b))

    synd = _np_syndromes(rs, data, block_size)

    # Berlekamp-Massey with the reference's buffer-reuse semantics.
    locator = np.zeros(nroots, dtype=np.int64)
    locator[0] = 1
    corrector = np.zeros(nroots + 1, dtype=np.int64)
    corrector[1] = 1
    next_locator = np.zeros(nroots, dtype=np.int64)  # persists across steps
    tracker = 0
    for step in range(1, nroots + 1):
        y = step - 1
        e = int(synd[y])
        for i in range(1, tracker + 1):
            e ^= mul(int(locator[i]), int(synd[y - i]))
        if e != 0:
            for i in range(tracker + 1):
                next_locator[i] = int(locator[i]) ^ mul(e, int(corrector[i]))
            e_inv = int(gf.inverse[e])
            for i in range(t2 + 1):
                corrector[i] = mul(int(locator[i]), e_inv)
            locator[: t2 + 1] = next_locator[: t2 + 1]
        if 2 * tracker < step:
            tracker = step - tracker
        corrector[1:] = corrector[:-1]
        corrector[0] = 0

    # Chien search (vectorized; the reference's repeated subtract-by-255
    # index reduction equals mod 255 on these non-negative indices).
    y = (np.arange(block_size, dtype=np.int64) + order - block_size)[:, None]
    i_idx = np.arange(1, t2 + 1, dtype=np.int64)[None, :]
    loc_i = locator[1 : t2 + 1][None, :]
    z = (y * i_idx + gf.log[loc_i]) % (order - 1)
    chien = np.bitwise_xor.reduce(
        np.where(loc_i != 0, gf.antilog[z], 0), axis=1
    ) ^ int(locator[0])
    locations = np.flatnonzero(chien == 0).tolist()
    error_count = len(locations)

    if error_count <= t2 - min_distance:
        # Forney.
        omega = np.zeros(nroots + 1, dtype=np.int64)
        for i in range(error_count):
            omega[i] = int(synd[rs.first_root + i])
            for j in range(1, i + 1):
                omega[i] ^= mul(int(synd[rs.first_root + i - j]), int(locator[j]))
        for k in range(error_count):
            e = block_size - locations[k] - 1
            z = int(omega[0])
            for j in range(1, error_count):
                # reference's two-step fold computes alpha^(-e*j)
                x = (-(e * j)) % (order - 1)
                z ^= mul(int(omega[j]), int(gf.antilog[x]))
            z = mul(z, int(gf.antilog[e]))
            y = int(locator[1])
            for j in range(3, t2 + 1, 2):
                x = (-(e * (j - 1))) % (order - 1)
                y ^= mul(int(locator[j]), int(gf.antilog[x]))
            ly = int(gf.log[y])  # log[0] == 0 quirk preserved
            yidx = order - ly - 1
            if yidx == order - 1:
                yidx = 0
            y = int(gf.antilog[yidx])
            data[locations[k]] ^= mul(y, z)

    # Recheck: corrections stay applied even on failure.
    synd = _np_syndromes(rs, data, block_size)
    if np.any(synd != 0):
        return -1
    return error_count


def rs_encode_np(rs: RSCode, data: np.ndarray) -> np.ndarray:
    """Append num_roots parity bytes so every decode syndrome is zero.

    The decoder evaluates the block as a polynomial with data[0] as the
    highest-order coefficient, so parity is the remainder of
    d(x) * x^nroots mod genpoly(x), appended after the data.
    """
    gf = rs.gf
    nroots = rs.num_roots
    work = np.concatenate([np.asarray(data, dtype=np.int32), np.zeros(nroots, np.int32)])
    gp = rs.genpoly[::-1]  # highest order first; gp[0] == 1
    for i in range(len(data)):
        coef = int(work[i])
        if coef:
            work[i : i + nroots + 1] ^= np_gf_mul(gf, coef, gp)
    out = np.concatenate([np.asarray(data, dtype=np.int32), work[len(data):]])
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Device (jax) decoder -- batched, fixed shapes, mask-driven
# ---------------------------------------------------------------------------


def _xor_reduce(x: jax.Array, axis: int) -> jax.Array:
    return jax.lax.reduce(x, np.int32(0), jax.lax.bitwise_xor, (axis,))


# Computed GF(256)/0x11D arithmetic -- no table gathers.  On the TPU
# backend a 256-entry table gather over a large batch lowers far slower
# than a short chain of shift/xor/select VPU ops, and the Berlekamp/Forney
# stages issue ~100 such gathers per decode batch.  On CPU the opposite
# holds (gathers are cheap, the unrolled ladder multiplies compile time by
# ~7x), so _rs_decode_batch picks per backend at trace time.
def _jmul_c(a, b):
    """Carry-less multiply (8-step bit ladder) + poly reduction by 0x11D."""
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    res = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), jnp.int32)
    for i in range(8):
        res = res ^ jnp.where((b >> i) & 1 != 0, a << i, 0)
    for k in range(14, 7, -1):
        res = res ^ jnp.where((res >> k) & 1 != 0, 0x11D << (k - 8), 0)
    return res


_ALPHA_POW2 = GF256.antilog[(1 << np.arange(8)) % 255]  # alpha^(2^k)


def _jpow_alpha(x):
    """alpha^x for x in [0, 254], computed by square-and-multiply over the
    bits of x (alpha^(2^k) are host constants)."""
    x = x.astype(jnp.int32)
    res = jnp.ones_like(x)
    for k in range(8):
        res = jnp.where(
            (x >> k) & 1 != 0, _jmul_c(res, int(_ALPHA_POW2[k])), res
        )
    return res


def _jinv(a):
    """a^254 == a^-1 (0 -> 0), by square-and-multiply: 254 = sum 2^1..2^7."""
    sq = a.astype(jnp.int32)
    res = jnp.ones_like(sq)
    for k in range(1, 8):
        sq = _jmul_c(sq, sq)
        res = _jmul_c(res, sq)
    return res


def _gf_ops(gf: GFTables):
    """(mul, inv, pow_alpha) chosen per backend at trace time.

    TPU: computed shift/xor ladders (no gathers).  CPU (the test platform)
    or a non-0x11D field: log/antilog table gathers.
    """
    if jax.default_backend() != "cpu" and gf is GF256:
        return _jmul_c, _jinv, _jpow_alpha
    antilog = jnp.asarray(gf.antilog)
    log = jnp.asarray(gf.log)
    inverse = jnp.asarray(gf.inverse)

    def mul(a, b):
        prod = antilog[(log[a] + log[b]) % (gf.order - 1)]
        return jnp.where((a == 0) | (b == 0), 0, prod)

    def inv(a):
        return inverse[a]

    def pow_alpha(x):
        return antilog[x]

    return mul, inv, pow_alpha


@partial(jax.jit, static_argnames=("num_roots", "first_root", "min_distance",
                                   "chunk_size", "fail_budget"))
def rs_decode_jax(data: jax.Array, block_size: jax.Array, num_roots: int,
                  first_root: int = 0, min_distance: int = 0,
                  gf: GFTables = GF256, chunk_size: int = 2048,
                  fail_budget: int | None = None):
    """Batched RS decode.

    data: (B, L) int32 with L >= max block size (255); block_size: (B,) int32.
    Returns (corrected_data (B, L), result (B,) int32) where result is the
    corrected-error count or -1 on failure, matching rs_decode_np per block.

    Batches larger than ``chunk_size`` stream through lax.map so the
    (chunk, L, R) syndrome term tensors stay bounded (a 100k-block batch
    would otherwise materialize multi-GB temporaries).

    ``fail_budget`` enables the syndrome-zero split: syndromes (one cheap
    MXU bit-matmul) run for every row, rows whose syndromes are all zero
    finish immediately (result 0, data untouched -- exactly the reference
    outcome, rs_functions.py:141-150, since a zero-syndrome block takes no
    corrections), and ONLY rows with nonzero syndromes compact into
    ``fail_budget`` slots (per chunk) for the expensive correction path
    (Berlekamp / Chien / location sort / Forney / recheck).  Typical
    decode batches are dominated by clean blocks, so correction work then
    scales with actual corruption instead of batch size.  The return
    becomes a 3-tuple (corrected, result, overflow) where ``overflow``
    marks failing rows past the budget (their result is -1 and their data
    untouched); callers must surface those rows for retry/fallback --
    the IL2P device codec turns them into per-block ``dropped`` flags.
    """
    B = data.shape[0]
    if B > chunk_size:
        pad = -B % chunk_size
        data_p = jnp.pad(data, ((0, pad), (0, 0)))
        bs_p = jnp.pad(block_size, (0, pad), constant_values=1)
        n_chunks = (B + pad) // chunk_size
        corr, res, ovf = jax.lax.map(
            lambda args: _rs_decode_batch(
                args[0], args[1], num_roots, first_root, min_distance, gf,
                fail_budget,
            ),
            (
                data_p.reshape(n_chunks, chunk_size, -1),
                bs_p.reshape(n_chunks, chunk_size),
            ),
        )
        out = (corr.reshape(-1, data.shape[1])[:B], res.reshape(-1)[:B],
               ovf.reshape(-1)[:B])
    else:
        out = _rs_decode_batch(data, block_size, num_roots, first_root,
                               min_distance, gf, fail_budget)
    if fail_budget is None:
        return out[0], out[1]
    return out


_BITMAT_CACHE: dict = {}


def _bitlinear_mats(num_roots: int, first_root: int, gf: GFTables):
    """GF(2)-linear operator matrices for syndrome and Chien evaluation.

    GF(2^8) multiplication by a constant is linear over GF(2), so with
    blocks right-aligned into a 255-byte frame both evaluations become
    binary matrix products -- MXU matmuls followed by mod 2 -- instead of
    per-element log/antilog gathers.

    Row/column index order is BIT-MAJOR -- input row (a, j') = a*lm + j',
    output column (c, j') = c*lm + j' -- so the device-side bit expansion
    is 8 cheap (B, lm) shift/mask slices concatenated on the last axis.
    (The byte-major (B, lm, 8) form had a minor dimension of 8, which the
    TPU pads to 128 lanes: a 16x memory bloat that made the bit expansion
    ~15x more expensive than the MXU matmul it fed -- 29 of the 31 ms of
    a 16k-row decode, measured 2026-08-20.)

    M_synd[(a, j'), (i, b)] = bit b of (2^a) * alpha^((254-j')*(fr+i))
    M_chien[(i-1)*8+b, (c, j')] = bit c of (2^b) * alpha^((j'+1)*i)
    (the reference's Chien exponent is (j + 256 - bs)*i, rs_functions.py:87).
    """
    key = (num_roots, first_root, gf.order)
    if key in _BITMAT_CACHE:
        return _BITMAT_CACHE[key]
    lm = gf.order - 1  # 255
    t2 = num_roots // 2
    jp = np.arange(lm)
    a = np.arange(8)
    # syndromes
    i_r = np.arange(num_roots)
    exp_s = ((lm - 1 - jp)[:, None] * (first_root + i_r)[None, :]) % lm
    const_s = gf.antilog[exp_s]  # (lm, R)
    prod_s = np_gf_mul(gf, (1 << a)[None, :, None], const_s[:, None, :])  # (lm, 8, R)
    bits_s = (prod_s[..., None] >> a[None, None, None, :]) & 1  # (lm, 8, R, 8)
    # bit-major rows: (a, j') -> a*lm + j'
    m_synd = bits_s.transpose(1, 0, 2, 3).reshape(
        lm * 8, num_roots * 8
    ).astype(np.float32)
    # chien
    i_c = np.arange(1, t2 + 1)
    exp_c = (((jp + 1)[None, :]) * i_c[:, None]) % lm  # (t2, lm)
    const_c = gf.antilog[exp_c]
    prod_c = np_gf_mul(gf, (1 << a)[None, :, None], const_c[:, None, :])  # (t2, 8, lm)
    bits_c = (prod_c[..., None] >> a[None, None, None, :]) & 1  # (t2, 8, lm, 8)
    # bit-major columns: (c, j') -> c*lm + j'
    m_chien = bits_c.transpose(0, 1, 3, 2).reshape(
        t2 * 8, lm * 8
    ).astype(np.float32)
    _BITMAT_CACHE[key] = (m_synd, m_chien)
    return _BITMAT_CACHE[key]


def _gf2_matmul(bits: jax.Array, mat: np.ndarray) -> jax.Array:
    """(B, K) {0,1} @ (K, M) binary matrix over GF(2) via an MXU matmul.

    Exact: counts stay far below float32's integer range; parity via mod 2.
    """
    prod = jnp.dot(bits.astype(jnp.float32), jnp.asarray(mat),
                   preferred_element_type=jnp.float32)
    return jnp.mod(prod, 2.0).astype(jnp.int32)


def _rs_syndromes_jax(data, block_size, num_roots, first_root, gf,
                      m_synd, gmul, gpow):
    """Batched syndromes: one GF(2) bit-matmul over left-aligned frames.

    Left-aligned evaluation with a per-root exponent fix-up.  The frame
    exponent at left-aligned column j is (lm-1-j)*r = (bs-1-j)*r +
    shift*r, a factor alpha^(shift*r_i) uniform over j, so
    S_i = T_i * alpha^(-shift*r_i) with T_i evaluated through the SAME
    bit matrix -- no per-row realignment (a windowed gather there cost
    ~2.5 us/row, dominating the whole decode)."""
    B, L = data.shape
    lm = gf.order - 1
    col = jnp.arange(L, dtype=jnp.int32)[None, :]
    d_m = jnp.where(col < block_size[:, None], data, 0)
    d_f = d_m if L >= lm else jnp.pad(d_m, ((0, 0), (0, lm - L)))
    d_f = d_f[..., :lm]
    # bit-major expansion (matches m_synd's row order): 8 well-laid (B, lm)
    # slices instead of a (B, lm, 8) tensor whose minor dim of 8 pads to
    # 128 TPU lanes (see _bitlinear_mats)
    bits = jnp.concatenate([(d_f >> k) & 1 for k in range(8)], axis=-1)
    sb = _gf2_matmul(bits, m_synd).reshape(B, num_roots, 8)  # tiny
    bit_w = jnp.arange(8, dtype=jnp.int32)
    t_i = jnp.sum(sb << bit_w, axis=2).astype(jnp.int32)  # (B, R)
    r_i = (first_root + jnp.arange(num_roots, dtype=jnp.int32))[None, :]
    shift = lm - block_size
    corr_e = (-(shift[:, None] * r_i)) % lm
    return gmul(t_i, gpow(corr_e))


def _rs_decode_batch(data: jax.Array, block_size: jax.Array, num_roots: int,
                     first_root: int = 0, min_distance: int = 0,
                     gf: GFTables = GF256, fail_budget: int | None = None):
    B, L = data.shape
    m_synd, m_chien = _bitlinear_mats(num_roots, first_root, gf)
    gmul, ginv, gpow = _gf_ops(gf)
    synd = _rs_syndromes_jax(data, block_size, num_roots, first_root, gf,
                             m_synd, gmul, gpow)
    if fail_budget is None or fail_budget >= B:
        corr, res = _rs_correct_batch(
            data, block_size, synd, num_roots, first_root, min_distance, gf,
            m_synd, m_chien, gmul, ginv, gpow,
        )
        return corr, res, jnp.zeros((B,), bool)

    # ---- syndrome-zero split (see rs_decode_jax docstring) ----
    # Zero-syndrome rows are DONE: the reference decoder finds no error
    # locations and the recheck passes with the data untouched
    # (rs_functions.py:83-150), so result == 0 exactly.  Compact the
    # failing rows into ``fail_budget`` slots and correct only those.
    nz = jnp.any(synd != 0, axis=1)
    cs = jnp.cumsum(nz.astype(jnp.int32))
    n_fail = cs[-1]
    F = fail_budget
    slots = jnp.arange(1, F + 1, dtype=jnp.int32)
    src = jnp.clip(jnp.searchsorted(cs, slots), 0, B - 1).astype(jnp.int32)
    valid = slots <= n_fail
    data_f = jnp.where(valid[:, None], jnp.take(data, src, axis=0), 0)
    synd_f = jnp.where(valid[:, None], jnp.take(synd, src, axis=0), 0)
    bs_f = jnp.where(valid, jnp.take(block_size, src), 1)
    corr_f, res_f = _rs_correct_batch(
        data_f, bs_f, synd_f, num_roots, first_root, min_distance, gf,
        m_synd, m_chien, gmul, ginv, gpow,
    )
    # scatter the corrected rows back; untouched rows keep their data.
    # ``src`` is strictly increasing over valid slots, so in-bounds
    # indices are unique and the scatter is collision-free.
    dest = jnp.where(valid, src, B)
    corrected = data.at[dest].set(
        jnp.where(valid[:, None], corr_f, 0), mode="drop",
        unique_indices=True,
    )
    result = (
        jnp.zeros((B,), jnp.int32)
        .at[dest]
        .set(jnp.where(valid, res_f, 0), mode="drop", unique_indices=True)
    )
    overflow = nz & (cs - 1 >= F)
    result = jnp.where(overflow, -1, result)
    return corrected, result, overflow


def _rs_correct_batch(data, block_size, synd, num_roots, first_root,
                      min_distance, gf, m_synd, m_chien, gmul, ginv, gpow):
    """The correction path on precomputed syndromes: Berlekamp-Massey,
    Chien search, Forney magnitudes, in-place fix, syndrome recheck."""
    order = gf.order
    B, L = data.shape
    t2 = num_roots // 2
    lm = order - 1
    shift = lm - block_size  # (B,) right-align offset
    bit_w = jnp.arange(8, dtype=jnp.int32)

    # Berlekamp-Massey, unrolled over the (static) root count.
    locator = jnp.zeros((B, num_roots), jnp.int32).at[:, 0].set(1)
    corrector = jnp.zeros((B, num_roots + 1), jnp.int32).at[:, 1].set(1)
    next_locator = jnp.zeros((B, num_roots), jnp.int32)
    tracker = jnp.zeros((B,), jnp.int32)
    idx_r = jnp.arange(num_roots, dtype=jnp.int32)[None, :]
    for step in range(1, num_roots + 1):
        y = step - 1
        # e = synd[y] ^ XOR_{1<=i<=tracker} locator[i]*synd[y-i]
        gather = jnp.clip(y - idx_r, 0, num_roots - 1)
        terms = gmul(locator, jnp.take_along_axis(synd, gather, axis=1))
        terms = jnp.where((idx_r >= 1) & (idx_r <= tracker[:, None]), terms, 0)
        e = synd[:, y] ^ _xor_reduce(terms, axis=1)
        active = (e != 0)[:, None]
        nl_upd = locator ^ gmul(e[:, None], corrector[:, :num_roots])
        in_range = idx_r <= tracker[:, None]
        next_locator = jnp.where(active & in_range, nl_upd, next_locator)
        e_inv = ginv(e)
        low = idx_r <= t2
        corr_upd = gmul(locator, e_inv[:, None])
        corrector = corrector.at[:, :num_roots].set(
            jnp.where(active & low, corr_upd, corrector[:, :num_roots])
        )
        locator = jnp.where(active & low, next_locator, locator)
        tracker = jnp.where(2 * tracker < step, step - tracker, tracker)
        corrector = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), corrector[:, :-1]], axis=1
        )

    # Chien search as a GF(2) matmul over the right-aligned frame; the
    # output unpacks bit-major (m_chien's column order) so the byte
    # reassembly runs on (B, lm) slices, never a lane-padded (B, lm, 8)
    loc_bits = ((locator[:, 1 : t2 + 1, None] >> bit_w) & 1).reshape(B, t2 * 8)
    cb = _gf2_matmul(loc_bits, m_chien).reshape(B, 8, lm)
    chien = jnp.zeros((B, lm), jnp.int32)
    for k in range(8):
        chien = chien | (cb[:, k, :] << k)
    chien = chien ^ locator[:, None, 0]
    jp = jnp.arange(lm, dtype=jnp.int32)[None, :]
    j_orig = jp - shift[:, None]  # (B, lm) original byte positions
    is_err = (chien == 0) & (j_orig >= 0)
    error_count = jnp.sum(is_err, axis=1).astype(jnp.int32)
    # positions in ascending order, padded with L (out of range): only the
    # t2 smallest of the lm candidates matter, so top_k on the negation
    # replaces a full (B, lm) sort (the sort dominated the correction path)
    loc_sorted = -jax.lax.top_k(-jnp.where(is_err, j_orig, L), t2)[0]  # (B, t2)

    apply_fix = error_count <= (t2 - min_distance)

    # Forney error evaluator omega[i], i < t2 (only entries < error_count used).
    omega = []
    for i0 in range(t2):
        acc = synd[:, first_root + i0]
        for jj in range(1, i0 + 1):
            acc = acc ^ gmul(synd[:, first_root + i0 - jj], locator[:, jj])
        omega.append(acc)
    omega = jnp.stack(omega, axis=1)  # (B, t2)

    e_pos = block_size[:, None] - loc_sorted - 1  # (B, t2); garbage where masked
    e_pos = jnp.clip(e_pos, 0, order - 2)

    def fold(epw, jw):
        # alpha^(-e*j): the reference's two-step index fold reduces to this
        # (its transient -1 index aliases to table[254] == alpha^254).
        return (-(epw * jw)) % (order - 1)

    k_idx = jnp.arange(t2, dtype=jnp.int32)[None, :]
    valid_err = k_idx < error_count[:, None]  # (B, t2)

    z_acc = jnp.broadcast_to(omega[:, 0:1], (B, t2))
    for jj in range(1, t2):
        term = gmul(omega[:, jj : jj + 1], gpow(fold(e_pos, jj)))
        z_acc = jnp.where(jj < error_count[:, None], z_acc ^ term, z_acc)
    z_acc = gmul(z_acc, gpow(e_pos))
    y_acc = jnp.broadcast_to(locator[:, 1:2], (B, t2))
    for jj in range(3, t2 + 1, 2):
        term = gmul(locator[:, jj : jj + 1], gpow(fold(e_pos, jj - 1)))
        y_acc = y_acc ^ term
    # y_val = antilog[order - log[y] - 1] with the reference's log[0] == 0
    # and yidx == 255 -> 0 quirks: both y in {0, 1} give antilog[0] == 1,
    # otherwise the true inverse y^-1 == y^254.
    y_val = jnp.where(y_acc == 0, 1, ginv(y_acc))
    mags = gmul(y_val, z_acc)

    do_fix = valid_err & apply_fix[:, None]
    scatter_pos = jnp.where(do_fix, loc_sorted, L)  # L drops out of range
    corr = jnp.zeros((B, L), jnp.int32)
    corr = corr.at[jnp.arange(B)[:, None], scatter_pos].add(
        jnp.where(do_fix, mags, 0), mode="drop"
    )
    corrected = data ^ corr

    recheck = _rs_syndromes_jax(corrected, block_size, num_roots, first_root,
                                gf, m_synd, gmul, gpow)
    ok = jnp.all(recheck == 0, axis=1)
    result = jnp.where(ok, error_count, -1)
    return corrected, result
