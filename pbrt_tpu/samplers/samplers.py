"""Stateless sampler variants.

kinds:
  independent — pcg4d hash streams (ref: IndependentSampler, samplers.h:442)
  stratified  — per-dimension shuffled strata + jitter (ref: StratifiedSampler
                samplers.h:568, generalized to arbitrary dimension index)
  sobol       — padded Owen-scrambled base-2 Sobol' pairs: every (pixel, dim)
                gets the first two Sobol' dimensions under an independent
                Laine-Karras-style Owen scramble (ref: PaddedSobolSampler
                samplers.h:144 with FastOwenScrambler, lowdiscrepancy.h:168)

All return floats in [0, 1). The Sobol' generator matrices used are the
canonical first two base-2 dimensions (identity-reversed / Pascal), computed
procedurally — no table data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.pytree import pytree, static_field

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


def _sobol_dim1(idx):
    """Second Sobol' dimension via the Pascal-matrix recurrence v <- v ^ v>>1."""
    idx = idx.astype(_U32)

    def body(j, carry):
        result, v, i = carry
        result = jnp.where((i & 1) == 1, result ^ v, result)
        return (result, (v ^ (v >> 1)).astype(_U32), i >> 1)

    init = (
        jnp.zeros_like(idx),
        jnp.full_like(idx, _U32(1 << 31)),
        idx,
    )
    result, _, _ = jax.lax.fori_loop(0, 32, body, init)
    return result


_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
            59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
            127, 131)


def _scrambled_radical_inverse(idx, base: int, perm_seed):
    """Radical inverse in `base` with per-digit hash permutations.

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


def as_sampler(x, spp: int = 16) -> "Sampler":
    """Coerce a Sampler, or an int/array seed (-> independent), to a Sampler."""
    if isinstance(x, Sampler):
        return x
    return Sampler(seed=jnp.asarray(x, jnp.int32), kind="independent", spp=spp)


@pytree
class Sampler:
    seed: jnp.ndarray  # () int32 — data so reseeding doesn't recompile
    kind: str = static_field(default="independent")
    spp: int = static_field(default=16)

    @staticmethod
    def create(kind: str = "independent", spp: int = 16, seed: int = 0):
        assert kind in ("independent", "stratified", "sobol", "halton"), kind
        return Sampler(seed=jnp.asarray(seed, jnp.int32), kind=kind, spp=spp)

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

    # -- public API ----------------------------------------------------------

    def get_1d(self, pixel, sample_idx, dim):
        if self.kind == "independent":
            return rng.uniform_1d(pixel, sample_idx, dim, self.seed)
        if self.kind == "stratified":
            idx = self._shuffled_index(pixel, sample_idx, dim)
            jitter = rng.uniform_1d(pixel, sample_idx, dim, self.seed + 1)
            return (idx.astype(jnp.float32) + jitter) / self.spp
        if self.kind == "halton":
            idx = self._shuffled_index(pixel, sample_idx, dim)
            base = _PRIMES[0]
            return _scrambled_radical_inverse(
                idx, base, self._hash(pixel, dim)
            )
        # sobol
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
            # Padded (base-2, base-3) Halton pair per dimension slot.
            idx = self._shuffled_index(pixel, sample_idx, dim)
            u0 = _scrambled_radical_inverse(idx, 2, self._hash(pixel, dim))
            u1 = _scrambled_radical_inverse(
                idx, 3, self._hash(pixel, dim + jnp.int32(0x7777))
            )
            return u0, u1
        # sobol: a fresh scrambled (dim0, dim1) pair per dimension slot.
        idx = self._shuffled_index(pixel, sample_idx, dim)
        h0 = self._hash(pixel, dim)
        h1 = self._hash(pixel, dim + jnp.int32(0x5555))
        u0 = rng.u32_to_uniform(_fast_owen_scramble(_sobol_dim0(idx), h0))
        u1 = rng.u32_to_uniform(_fast_owen_scramble(_sobol_dim1(idx), h1))
        return u0, u1
