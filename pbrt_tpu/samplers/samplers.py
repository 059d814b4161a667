"""Stateless sampler variants.

kinds:
  independent — pcg4d hash streams (ref: IndependentSampler, samplers.h:442)
  stratified  — per-dimension shuffled strata + jitter (ref: StratifiedSampler
                samplers.h:568, generalized to arbitrary dimension index)
  sobol       — Owen-scrambled exact Joe-Kuo Sobol': one per-pixel shuffled
                sample index feeds EVERY dimension slot through the true
                dim-th generator matrix, preserving the joint (t,s)-net
                structure that padded dim-0/1 pairs lose (ref: SobolSampler,
                samplers.h:353 + util/sobolmatrices.cpp)
  zsobol      — Morton/Z-curve index with hashed base-4 digit permutations
                per dimension (Ahmed & Wonka style decorrelation), dims via
                exact Sobol' matrices (ref: ZSobolSampler, samplers.h:225)
  halton      — true per-dimension prime radical inverse with per-digit hash
                permutations (ref: HaltonSampler samplers.h:53 +
                util/lowdiscrepancy.h:86-115)
  padded      — the round-1 padded Owen-scrambled dim-0/1 Sobol' pairs
                (ref: PaddedSobolSampler, samplers.h:144)

All return floats in [0, 1). The exact Sobol' path uses the checked-in
Joe-Kuo generator matrices (samplers/sobol.py).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.gather import gather_rows
from ..core.pytree import pytree, static_field
from .sobol import sobol_bits

_U32 = jnp.uint32


def _reverse_bits32(v):
    v = ((v >> 16) | (v << 16)).astype(_U32)
    v = (((v & _U32(0x00FF00FF)) << 8) | ((v & _U32(0xFF00FF00)) >> 8)).astype(_U32)
    v = (((v & _U32(0x0F0F0F0F)) << 4) | ((v & _U32(0xF0F0F0F0)) >> 4)).astype(_U32)
    v = (((v & _U32(0x33333333)) << 2) | ((v & _U32(0xCCCCCCCC)) >> 2)).astype(_U32)
    v = (((v & _U32(0x55555555)) << 1) | ((v & _U32(0xAAAAAAAA)) >> 1)).astype(_U32)
    return v


def _sobol_dim0(idx):
    """First Sobol' dimension: radical inverse base 2 (bit reversal)."""
    return _reverse_bits32(idx.astype(_U32))


_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
            59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
            127, 131)
_PRIMES_ARR = np.asarray(_PRIMES, np.uint32)
# Digits needed so that base^digits >= 2^32 for the smallest base handled by
# the traced-base path (base 3 -> 21; base 2 is handled separately).
_HALTON_DIGITS = 21


def _scrambled_radical_inverse(idx, base: int, perm_seed):
    """Radical inverse in a *static* `base` with per-digit hash permutations.

    Reference: ScrambledRadicalInverse + DigitPermutation
    (util/lowdiscrepancy.h:26,115). The permutation of digit position i is
    a hash-derived affine map (d + h(i)) % base — enough decorrelation for
    padded usage.
    """
    inv_base = 1.0 / base
    n_digits = max(2, int(32 / max(1, (base - 1).bit_length())))

    def body(i, carry):
        val, inv, rest = carry
        digit = rest % base
        h, _, _, _ = rng.pcg4d(perm_seed, i, base, 0x51633E2D)
        digit = (digit + h % base) % base
        val = val + digit.astype(jnp.float32) * inv
        return val, inv * inv_base, rest // base

    val, _, _ = jax.lax.fori_loop(
        0, n_digits,
        body,
        (jnp.zeros(idx.shape, jnp.float32),
         jnp.full(idx.shape, inv_base, jnp.float32),
         idx.astype(jnp.uint32)),
    )
    return jnp.minimum(val, 1.0 - 1e-7)


def _halton_traced_base(idx, dim, perm_seed):
    """Radical inverse where the prime base is selected by a traced dim.

    base = PRIMES[dim % 32]; a fixed 21-step loop covers every base >= 3 to
    full 2^32 index range (leading zero digits contribute nothing beyond the
    permutation offset, which is part of the scramble). Base 2 (dim % 32 ==
    0) is routed through the exact bit-reversal path by the caller.
    """
    dim = jnp.asarray(dim, jnp.int32) % len(_PRIMES)
    base = jax.lax.dynamic_slice_in_dim(_PRIMES_ARR, dim, 1)[0]
    base_f = base.astype(jnp.float32)
    inv_base = 1.0 / base_f

    def body(i, carry):
        val, inv, rest = carry
        digit = rest % base
        h, _, _, _ = rng.pcg4d(perm_seed, i, base, 0x51633E2D)
        digit = (digit + h % base) % base
        val = val + digit.astype(jnp.float32) * inv
        return val, inv * inv_base, rest // base

    val, _, _ = jax.lax.fori_loop(
        0, _HALTON_DIGITS,
        body,
        (jnp.zeros(idx.shape, jnp.float32),
         jnp.full(idx.shape, inv_base, jnp.float32),
         idx.astype(jnp.uint32)),
    )
    return jnp.minimum(val, 1.0 - 1e-7)


def _fast_owen_scramble(v, scramble_seed):
    """Laine-Karras-style hash acting as an Owen scramble in reversed-bit
    space (ref: FastOwenScrambler, util/lowdiscrepancy.h:168)."""
    v = _reverse_bits32(v)
    v ^= v * _U32(0x3D20ADEA)
    v += scramble_seed
    v *= (scramble_seed >> 16) | _U32(1)
    v ^= v * _U32(0x05526C56)
    v ^= v * _U32(0x53A22864)
    return _reverse_bits32(v)


# All 24 permutations of {0,1,2,3}, packed 2 bits per entry (entry j at bit
# 2j). Order is itertools-lexicographic — any fixed enumeration works.
_PERM4_PACKED = np.asarray(
    [sum(p[j] << (2 * j) for j in range(4))
     for p in itertools.permutations(range(4))],
    np.uint32,
)


def _interleave_bits16(x):
    """Spread the low 16 bits of x to even bit positions (Morton helper)."""
    x = x.astype(_U32) & _U32(0xFFFF)
    x = (x | (x << 8)) & _U32(0x00FF00FF)
    x = (x | (x << 4)) & _U32(0x0F0F0F0F)
    x = (x | (x << 2)) & _U32(0x33333333)
    x = (x | (x << 1)) & _U32(0x55555555)
    return x


_PMJ_CACHE = None


def _pmj_tables():
    """Lazy-loaded pmj02 point tables + blue-noise texture as jnp consts
    (PMJ02BNSampler assets, samplers.h:609; generated by pmj02.py)."""
    global _PMJ_CACHE
    if _PMJ_CACHE is None:
        from .pmj02 import load_tables

        pts, bn = load_tables()
        _PMJ_CACHE = (
            jnp.asarray(pts.reshape(-1, 2)), jnp.asarray(bn),
            pts.shape[0], pts.shape[1], bn.shape[0],
        )
    return _PMJ_CACHE


def as_sampler(x, spp: int = 16) -> "Sampler":
    """Coerce a Sampler, or an int/array seed (-> independent), to a Sampler.

    Any object with a get_1d attribute passes through unchanged (e.g. the
    primary-sample-space replay sampler MLT drives integrators with)."""
    if isinstance(x, Sampler) or hasattr(x, "get_1d"):
        return x
    return Sampler(seed=jnp.asarray(x, jnp.int32), kind="independent", spp=spp)


_KINDS = (
    "independent", "stratified", "sobol", "zsobol", "halton", "padded",
    "pmj02bn",
)


@pytree
class Sampler:
    seed: jnp.ndarray  # () int32 — data so reseeding doesn't recompile
    kind: str = static_field(default="independent")
    spp: int = static_field(default=16)
    # Image width (pixel ids are y*nx + x); 0 = unknown (zsobol then uses the
    # flat pixel id as its Morton prefix — still a bijection, just without
    # the Z-curve spatial locality).
    nx: int = static_field(default=0)
    log2_res: int = static_field(default=10)

    @staticmethod
    def create(kind: str = "independent", spp: int = 16, seed: int = 0,
               nx: int = 0, log2_res: int = 10):
        assert kind in _KINDS, kind
        return Sampler(seed=jnp.asarray(seed, jnp.int32), kind=kind, spp=spp,
                       nx=nx, log2_res=log2_res)

    # -- implementation helpers ---------------------------------------------

    def _hash(self, pixel, dim):
        """Per-(pixel, dimension, seed) decorrelation key."""
        h, _, _, _ = rng.pcg4d(pixel, dim, self.seed, 0x9E3779B9)
        return h

    def _shuffled_index(self, pixel, sample_idx, dim):
        """Per-(pixel, dim) random permutation of sample order via Feistel-lite
        hashing (decorrelates padded dimensions like PaddedSobolSampler)."""
        h = self._hash(pixel, dim)
        # Cranley-Patterson-free index shuffle: XOR-fold within spp when spp is
        # a power of two, else hash-offset modulo spp.
        s = sample_idx.astype(jnp.uint32)
        spp = self.spp
        if spp & (spp - 1) == 0:
            return (s ^ (h % jnp.uint32(spp))).astype(jnp.uint32)
        return ((s + h) % jnp.uint32(spp)).astype(jnp.uint32)

    def _log2spp(self) -> int:
        return max(1, (self.spp - 1).bit_length())

    def _zsobol_index(self, pixel, sample_idx, dim):
        """ZSobolSampler::GetSampleIndex (samplers.h:225-320): Morton-code
        (pixel, sample) index whose base-4 digits are permuted by a hash of
        the digits above + the dimension — a full-sequence shuffle that
        keeps power-of-4 prefix blocks intact."""
        log2spp = self._log2spp()
        pix = jnp.asarray(pixel).astype(_U32)
        if self.nx > 0:
            px = pix % _U32(self.nx)
            py = pix // _U32(self.nx)
            morton_pix = _interleave_bits16(px) | (
                _interleave_bits16(py) << _U32(1)
            )
        else:
            morton_pix = pix
        mi = (morton_pix << _U32(log2spp)) | jnp.asarray(sample_idx).astype(
            _U32
        )

        n_index_bits = min(32, 2 * self.log2_res + log2spp)
        pow2_odd = log2spp & 1
        n_base4 = (n_index_bits + 1) // 2
        dim_u = jnp.asarray(dim).astype(_U32) * _U32(0x55555555)
        out = jnp.zeros_like(mi)
        last = 1 if pow2_odd else 0
        for i in range(n_base4 - 1, last - 1, -1):
            shift = 2 * i - pow2_odd
            digit = (mi >> _U32(shift)) & _U32(3)
            higher = mi >> _U32(min(shift + 2, 31)) if shift + 2 < 32 else (
                jnp.zeros_like(mi)
            )
            h, _, _, _ = rng.pcg4d(higher, dim_u, self.seed, 0xA511E9B3)
            p = ((h >> _U32(8)) % _U32(24)).astype(jnp.int32)
            packed = gather_rows(_PERM4_PACKED, p)
            new_digit = (packed >> (_U32(2) * digit)) & _U32(3)
            out = out | (new_digit << _U32(shift))
        if pow2_odd:
            h, _, _, _ = rng.pcg4d(mi >> _U32(1), dim_u, self.seed, 0xC2B2AE35)
            out = out | ((mi & _U32(1)) ^ (h & _U32(1)))
        return out

    # -- public API ----------------------------------------------------------

    def _pmj_sample(self, pixel, sample_idx, dim):
        """PMJ02BNSampler sample (samplers.h:609): a pmj02 table chosen by
        dimension, indexed by the pixel's shuffled sample counter, with a
        blue-noise Cranley-Patterson rotation keyed by screen position so
        error distributes as blue noise across the image."""
        pts, bn, n_tables, table_size, bres = _pmj_tables()
        h, hx, hy, _ = rng.pcg4d(
            jnp.asarray(dim, jnp.uint32), self.seed, 0x504D4A30, 0
        )
        tbl = (h % jnp.uint32(n_tables)).astype(jnp.int32)
        idx = (
            self._shuffled_index(pixel, sample_idx, dim)
            % jnp.uint32(table_size)
        ).astype(jnp.int32)
        p = pts[tbl * table_size + idx]  # (N, 2)
        pix = jnp.asarray(pixel).astype(jnp.int32)
        if self.nx > 0:
            px = pix % self.nx
            py = pix // self.nx
        else:
            px = pix % bres
            py = pix // bres
        sx = (hx % jnp.uint32(bres)).astype(jnp.int32)
        sy = (hy % jnp.uint32(bres)).astype(jnp.int32)
        b0 = bn[(py + sy) % bres, (px + sx) % bres]
        b1 = bn[(py + sx + 17) % bres, (px + sy + 41) % bres]
        return (p[..., 0] + b0) % 1.0, (p[..., 1] + b1) % 1.0

    def get_1d(self, pixel, sample_idx, dim):
        if self.kind == "independent":
            return rng.uniform_1d(pixel, sample_idx, dim, self.seed)
        if self.kind == "stratified":
            idx = self._shuffled_index(pixel, sample_idx, dim)
            jitter = rng.uniform_1d(pixel, sample_idx, dim, self.seed + 1)
            return (idx.astype(jnp.float32) + jitter) / self.spp
        if self.kind == "halton":
            # True Halton: prime base PRIMES[dim % 32]. Pixels sample one
            # GLOBAL sequence at per-pixel hash offsets with a fixed stride
            # of 65537 between a pixel's consecutive samples (the role of
            # the reference's CRT pixel strides, samplers.cpp Halton): the
            # stride is prime and > 131, so it is co-prime to every base and
            # each pixel's samples sweep every base's digit space instead of
            # sitting in one contiguous block; 65537 = 2^16+1 also keeps
            # base-2 power-of-two stratification exact.
            h_off, _, _, _ = rng.pcg4d(pixel, self.seed, 0x48616C74, 0)
            idx = h_off + jnp.asarray(sample_idx).astype(_U32) * _U32(65537)
            hd, _, _, _ = rng.pcg4d(
                jnp.asarray(dim, jnp.uint32), self.seed, 0x48616C74, 1
            )
            dim_m = jnp.asarray(dim, jnp.int32) % len(_PRIMES)
            u_b2 = rng.u32_to_uniform(_fast_owen_scramble(_sobol_dim0(idx), hd))
            u_bp = _halton_traced_base(idx, dim, hd)
            return jnp.where(dim_m == 0, u_b2, u_bp)
        if self.kind == "sobol":
            # Exact Sobol': per-pixel index (same across dims) through the
            # true dim-th generator matrix; per-(pixel,dim) Owen scramble
            # randomizes while preserving net structure.
            idx = self._shuffled_index(pixel, sample_idx, jnp.int32(0))
            bits = sobol_bits(idx, dim)
            return rng.u32_to_uniform(
                _fast_owen_scramble(bits, self._hash(pixel, dim))
            )
        if self.kind == "zsobol":
            idx = self._zsobol_index(pixel, sample_idx, dim)
            bits = sobol_bits(idx, jnp.int32(0))
            h, _, _, _ = rng.pcg4d(
                jnp.asarray(dim, jnp.uint32), self.seed, 0x6C8E9CF5, 0
            )
            return rng.u32_to_uniform(_fast_owen_scramble(bits, h))
        if self.kind == "pmj02bn":
            u0, _ = self._pmj_sample(pixel, sample_idx, dim)
            return u0
        # padded (round-1 scheme): fresh shuffled dim-0 pair per slot.
        idx = self._shuffled_index(pixel, sample_idx, dim)
        bits = _fast_owen_scramble(_sobol_dim0(idx), self._hash(pixel, dim))
        return rng.u32_to_uniform(bits)

    def get_2d(self, pixel, sample_idx, dim):
        if self.kind == "independent":
            return rng.uniform_2d(pixel, sample_idx, dim, self.seed)
        if self.kind == "stratified":
            # Stratify over a near-square grid of the spp count.
            nx = 1
            while (nx * 2) * (nx * 2) <= self.spp:
                nx *= 2
            ny = max(self.spp // nx, 1)
            idx = self._shuffled_index(pixel, sample_idx, dim)
            jx = rng.uniform_1d(pixel, sample_idx, dim, self.seed + 1)
            jy = rng.uniform_1d(pixel, sample_idx, dim, self.seed + 2)
            sx = (idx % nx).astype(jnp.float32)
            sy = ((idx // nx) % ny).astype(jnp.float32)
            return (sx + jx) / nx, (sy + jy) / ny
        if self.kind == "halton":
            # Consecutive prime bases for the pair; the 1<<20 offset keeps
            # get_2d's doubled slots disjoint from get_1d's raw slots (same
            # slot id would otherwise reuse the same scramble hash).
            d2 = jnp.asarray(dim, jnp.int32) * 2 + (1 << 20)
            return self.get_1d(pixel, sample_idx, d2), self.get_1d(
                pixel, sample_idx, d2 + 1
            )
        if self.kind == "sobol":
            idx = self._shuffled_index(pixel, sample_idx, jnp.int32(0))
            d2 = jnp.asarray(dim, jnp.int32) * 2 + (1 << 20)
            u0 = rng.u32_to_uniform(_fast_owen_scramble(
                sobol_bits(idx, d2), self._hash(pixel, d2)
            ))
            u1 = rng.u32_to_uniform(_fast_owen_scramble(
                sobol_bits(idx, d2 + 1), self._hash(pixel, d2 + 1)
            ))
            return u0, u1
        if self.kind == "pmj02bn":
            return self._pmj_sample(pixel, sample_idx, dim)
        if self.kind == "zsobol":
            idx = self._zsobol_index(pixel, sample_idx, dim)
            h0, h1, _, _ = rng.pcg4d(
                jnp.asarray(dim, jnp.uint32), self.seed, 0x6C8E9CF5, 1
            )
            u0 = rng.u32_to_uniform(_fast_owen_scramble(
                sobol_bits(idx, jnp.int32(0)), h0
            ))
            u1 = rng.u32_to_uniform(_fast_owen_scramble(
                sobol_bits(idx, jnp.int32(1)), h1
            ))
            return u0, u1
        # padded: a fresh scrambled (dim0, dim1) pair per dimension slot.
        idx = self._shuffled_index(pixel, sample_idx, dim)
        h0 = self._hash(pixel, dim)
        h1 = self._hash(pixel, dim + jnp.int32(0x5555))
        u0 = rng.u32_to_uniform(_fast_owen_scramble(_sobol_dim0(idx), h0))
        u1 = rng.u32_to_uniform(
            _fast_owen_scramble(sobol_bits(idx, jnp.int32(1)), h1)
        )
        return u0, u1
