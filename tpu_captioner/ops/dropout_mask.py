"""Pallas TPU kernel: one-launch dropout mask pool.

The flagship TF train step draws ~45M Bernoulli mask bits per step across
~38 dropout sites (reference trains with dropout 0.5: transformerDecoder.py
layer dropouts, decoder.py:109).  Generating them with threefry
(`jax.random.bernoulli` per site) costs ~2 ms/step of pure VPU bit-mixing
at batch 32 (BENCHMARKING.md round-3 MFU analysis); the typed-`rbg` key
alternative measured a 16x pathological slowdown on v5e (round 4).

This kernel generates the WHOLE step's masks in ONE launch from the TPU's
native hardware PRNG (`pltpu.prng_random_bits`): grid cells each seed with
(seed0, seed1, cell index) and emit a bool tile; consumers slice their
site's range out of the flat pool (models/layers.py:MaskPool).  The mask
stream differs from threefry's — distribution-identical (P(keep) matches
to 2^-32), reproducible per (key, shape) on a given compiler/hardware
generation, but a different sequence, so seed-for-seed training curves
shift vs the threefry path (exactly as any RNG backend change would).

CPU fallback: `prng_seed` has no CPU/interpret lowering in this JAX, so
off-TPU the pool is filled by one big `jax.random.bernoulli` — same
plumbing, threefry bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of uint32 draws per grid cell: 1M draws = 4 MB VMEM for the bits
# plus 1 MB for the bool tile.
_TILE_ROWS = 1024
_TILE_COLS = 1024


def _mask_kernel(seed_ref, o_ref, *, threshold):
    # Mosaic on this libtpu rejects >2 seed words ("Setting seed with more
    # than 2 values is not supported"), so fold the grid-cell index into the
    # second word: a Weyl step by the odd constant 0x9E3779B9 keeps distinct
    # cells on distinct seeds (injective in uint32 because the constant is
    # odd), giving each cell its own stream from a 2-word seed.
    cell = jnp.uint32(pl.program_id(0))
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + cell * jnp.uint32(0x9E3779B9))
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(o_ref.shape), jnp.uint32
    )
    o_ref[:] = bits < jnp.uint32(threshold)


def random_mask_pool(
    key: jax.Array, n: int, keep: float, *, on_tpu: bool
) -> jnp.ndarray:
    """(n,) bool keep-mask pool, P(True) = keep (quantized to 2^-32 on the
    kernel path, 2^-24 via threefry off-TPU)."""
    if not (0.0 < keep < 1.0):
        raise ValueError(f"keep must be in (0, 1), got {keep}")
    if not on_tpu:
        return jax.random.bernoulli(key, keep, (n,))
    threshold = min(int(round(keep * 2.0**32)), 2**32 - 1)
    rows = pl.cdiv(n, _TILE_COLS)
    grid = (pl.cdiv(rows, _TILE_ROWS),)
    rows_pad = grid[0] * _TILE_ROWS
    # Two seed words from either key flavor: raw uint32[2] (jax.random.
    # PRNGKey, the shipping default — core/prng.py) or a typed key.
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    flat = key.reshape(-1).astype(jnp.uint32)
    seed = flat[:2] if flat.shape[0] >= 2 else jnp.pad(flat, (0, 1))
    out = pl.pallas_call(
        functools.partial(_mask_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((rows_pad, _TILE_COLS), jnp.bool_),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (_TILE_ROWS, _TILE_COLS), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(seed)
    return out.reshape(-1)[:n]
