"""Chunked/grouped network-application helpers (network/utility.py parity).

  * ``chunked_apply``  — memory-bounded forward over huge point sets
    (forward_model, network/utility.py:61-126).  Gradient-through-chunks is
    unnecessary in JAX (jax.grad + jax.checkpoint replace the reference's
    retain_graph dance), so this is a pure inference helper.
  * ``get_samples``    — r^3 lattice in [a, b]^3 (network/utility.py:129-149).
  * ``pack_samples``   — fixed-width random subsample per group (replaces the
    pack_batch CUDA kernel + torch.unique, network/utility.py:152-183).
  * ``groupby_reduce`` — masked segment mean/sum (replaces groupby_sum CUDA,
    network/utility.py:186-208).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import voxel as vox


def chunked_apply(fn, inputs: jnp.ndarray, max_chunk: int = 1 << 18):
    """Apply ``fn`` over axis-0 chunks of at most ``max_chunk`` rows.

    Pads the tail chunk so only two program shapes ever compile.
    """
    n = inputs.shape[0]
    if n <= max_chunk:
        return fn(inputs)
    outs = []
    for s in range(0, n, max_chunk):
        chunk = inputs[s:s + max_chunk]
        if chunk.shape[0] < max_chunk:
            pad = max_chunk - chunk.shape[0]
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out = fn(chunk)
            out = jax.tree_util.tree_map(lambda o: o[:max_chunk - pad], out)
        else:
            out = fn(chunk)
        outs.append(out)
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *outs)


def get_samples(r: int, a: float = 0.0, b: float = None) -> jnp.ndarray:
    """(r^3, 3) lattice over [a, b]^3, x-major (network/utility.py:129-149)."""
    if b is None:
        b = 1.0 - 1.0 / r
    ax = jnp.linspace(a, b, r)
    X, Y, Z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([X, Y, Z], -1).reshape(-1, 3)


def groupby_reduce(sample_indexer: jnp.ndarray, sample_values: jnp.ndarray,
                   op: str = "mean", num_segments: int = None,
                   valid: jnp.ndarray = None):
    """Group-by reduce with static output size.

    :param sample_indexer: (N,) int segment ids in [0, num_segments).
    :param sample_values: (N, L).
    :param num_segments: static segment count (defaults to a host read of
        max+1 — pass it explicitly inside jit).
    """
    if num_segments is None:
        num_segments = int(sample_indexer.max()) + 1
    if valid is None:
        valid = jnp.ones(sample_indexer.shape, bool)
    sums = vox.masked_segment_sum(sample_values, sample_indexer, valid,
                                  num_segments)
    if op == "sum":
        return sums
    if op == "mean":
        cnt = vox.masked_segment_sum(jnp.ones_like(sample_indexer, jnp.float32),
                                     sample_indexer, valid, num_segments)
        return sums / jnp.maximum(cnt, 1.0)[:, None]
    raise NotImplementedError(op)


def pack_samples(sample_indexer: jnp.ndarray, count: int,
                 sample_values: jnp.ndarray, num_segments: int,
                 rng) -> tuple:
    """Fixed-width random subsample per group.

    For each segment, pick ``count`` member rows (with replacement among its
    members).  Returns (packed (num_segments, count, L),
    group_valid (num_segments,)).
    Static-shape version of network/utility.py:152-183.
    """
    N = sample_indexer.shape[0]
    # sort rows by (segment, random) so each segment's members are contiguous
    # in a random order
    rand = jax.random.uniform(rng, (N,))
    perm = jnp.lexsort((rand, sample_indexer))
    sorted_seg = sample_indexer[perm]
    # rank within segment
    first = jnp.searchsorted(sorted_seg, jnp.arange(num_segments))
    counts = jnp.searchsorted(sorted_seg, jnp.arange(num_segments), side="right") - first
    sel = jax.random.randint(rng, (num_segments, count), 0, 1 << 30)
    sel = first[:, None] + sel % jnp.maximum(counts, 1)[:, None]
    sel = jnp.clip(sel, 0, N - 1)
    packed = sample_values[perm[sel]]
    return packed, counts > 0