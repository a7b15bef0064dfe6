"""Synthetic missing-frame corruption — stateless, PRNG-keyed, vectorized.

Re-derivation of the reference's ``put_missing_frames``
(dataloader.py:314-436), THE data-corruption kernel, as pure functions of a
``jax.random`` key with static shapes (padded videos + dynamic true length),
so corruption fuses into the jitted preprocessing pipeline.

Three modes, matching the reference:

  * random   (dataloader.py:320-334): zero out 60% of frames chosen WITH
    replacement; mask = 1 on chosen frames.
  * blocks "all" (dataloader.py:337-361): 4-7 blocks of 3-8 consecutive
    frames, one per equal section; the reference's offset expression
    ``randint(0, min(0, ...))`` pins every offset to 0.
  * blocks per-dataset (dataloader.py:364-419): block-count range derived
    from the 25th/75th percentiles of Gaussian samples parameterized by the
    dataset's *consecutive-missing* stats, and block-size range from its
    *number-of-missing-blocks* stats (the reference swaps the two stat
    groups relative to their names — reproduced faithfully), then one block
    per section at a random offset.

In block modes, missing frames are FILLED WITH A FREEZE-FRAME COPY of a
reference frame — block 0 copies its end frame, later blocks copy the frame
before the block (dataloader.py:424-434) — and because the reference copies
in block order from a mutated buffer, a later block's reference frame may
itself already be a copy; we reproduce that propagation with a resolved
source-index map.

RNG NOTE: the reference draws from Python/global RNG state; we use explicit
key threading, so the *distribution* matches but individual draws differ.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

# Static unroll bound for the built-in modes: mode "all" draws 4-7 blocks
# (dataloader.py:339) and every built-in dataset's stats keep nb_max well
# under 16.  Registry OVERLAYS can exceed it — missing_blocks_dataset
# derives a per-stats bound (static_max_blocks) instead of clipping.
MAX_BLOCKS = 16


def static_max_blocks(stats: "DatasetMissingStats") -> int:
    """Static (trace-time) upper bound on the block count the reference's
    sampling loop (dataloader.py:364-401) can produce for ``stats``.

    The reference draws ``samples`` Gaussians from N(mean_cm, std_cm) and
    uses ceil(75th percentile) as nb_max; the p75 of any sample set is
    bounded by its max draw, and a 6-sigma margin bounds the max draw with
    overwhelming probability (P < 1e-9 per call even at samples=1e4), so
    the unrolled fill loop sized by this bound matches the reference's
    dynamic behavior for any registry overlay, not just the built-ins."""
    hi = stats.mean_consecutive_missing + 6.0 * stats.std_consecutive_missing
    return max(MAX_BLOCKS, int(math.ceil(hi)) + 1)


@dataclasses.dataclass(frozen=True)
class DatasetMissingStats:
    """Per-dataset missingness statistics (dataset_config.json schema)."""

    mean_consecutive_missing: float
    std_consecutive_missing: float
    mean_number_missing_blocks: float
    std_number_missing_blocks: float
    samples: int


def random_missing(key, video, t_actual=None):
    """Zero 60% of frames (chosen with replacement).  (T, K, 2) -> same."""
    T = video.shape[0]
    t_actual = T if t_actual is None else t_actual
    n_max = int(T * 0.6)
    k_idx, = jax.random.split(key, 1)
    idx = jax.random.randint(k_idx, (max(n_max, 1),), 0, jnp.maximum(t_actual, 1))
    take = jnp.arange(max(n_max, 1)) < (t_actual * 6) // 10
    mask = jnp.zeros(T, jnp.float32).at[idx].max(take.astype(jnp.float32))
    out = jnp.where(mask[:, None, None] > 0, 0.0, video)
    return out, mask


def _freeze_fill(video, starts, ends, active, T):
    """Apply block freeze-frame fill + mask, with in-order ref propagation.

    Block i covers frames [starts[i], ends[i]); its reference frame is
    ends[0] for i == 0 and starts[i] - 1 otherwise; refs resolve through
    earlier blocks' copies (see module docstring).
    """
    frames = jnp.arange(T)
    src_map = frames
    mask = jnp.zeros(T, jnp.float32)
    for i in range(starts.shape[0]):  # static MAX_BLOCKS unroll
        ref = ends[i] if i == 0 else starts[i] - 1
        ref = jnp.clip(ref, 0, T - 1)
        resolved = src_map[ref]
        in_block = jnp.logical_and(frames >= starts[i], frames < ends[i])
        hit = jnp.logical_and(in_block, active[i])
        src_map = jnp.where(hit, resolved, src_map)
        mask = jnp.where(hit, 1.0, mask)
    return video[src_map], mask


def _blocks_from_sections(key, t, num_blocks, section, rest,
                          size_min, size_max, random_offset: bool,
                          max_blocks: int = MAX_BLOCKS):
    """Vectorized version of the reference's per-section block placement
    (dataloader.py:344-361, 407-419)."""
    i = jnp.arange(max_blocks)
    active = i < num_blocks
    k_size, k_off = jax.random.split(key)
    num_ceros = jax.random.randint(k_size, (max_blocks,),
                                   size_min, size_max + 1)
    num_ceros = jnp.minimum(num_ceros, section)
    is_last = i == (num_blocks - 1)
    rest_i = jnp.where(is_last, rest, 0)
    if random_offset:
        hi = jnp.maximum(rest_i + section - num_ceros, 0)
        offset = jax.random.randint(k_off, (max_blocks,), 0, hi + 1)
    else:
        # mode "all": randint(0, min(0, ...)) == 0 (dataloader.py:356)
        offset = jnp.zeros(max_blocks, jnp.int32)
    starts = section * i + offset
    ends = jnp.minimum(starts + num_ceros, t - 1)
    return starts, ends, active


def missing_blocks_all(key, video, t_actual=None):
    """Mode for dataset name 'all' (dataloader.py:337-361)."""
    T = video.shape[0]
    t = jnp.asarray(T if t_actual is None else t_actual)
    k_nb, k_blocks = jax.random.split(key)
    num_blocks = jax.random.randint(k_nb, (), 4, 8)
    section = t // num_blocks          # no clamp in this mode (:341)
    rest = t % num_blocks
    starts, ends, active = _blocks_from_sections(
        k_blocks, t, num_blocks, section, rest, 3, 8, random_offset=False)
    return _freeze_fill(video, starts, ends, active, T)


def missing_blocks_dataset(key, video, stats: DatasetMissingStats,
                           t_actual=None):
    """Per-dataset mode (dataloader.py:364-419)."""
    T = video.shape[0]
    t = jnp.asarray(T if t_actual is None else t_actual)
    k_lim, k_size, k_nb, k_blocks = jax.random.split(key, 4)

    # The reference draws `samples` Gaussians per call and takes the
    # 25th/75th percentiles (dataloader.py:369-383).
    lim = stats.mean_consecutive_missing + stats.std_consecutive_missing * \
        jax.random.normal(k_lim, (stats.samples,))
    siz = stats.mean_number_missing_blocks + \
        stats.std_number_missing_blocks * \
        jax.random.normal(k_size, (stats.samples,))
    block_limit = jnp.percentile(lim, jnp.array([25.0, 75.0]))
    block_size = jnp.percentile(siz, jnp.array([25.0, 75.0]))

    nb_min = jnp.maximum(jnp.floor(block_limit[0]).astype(jnp.int32), 1)
    nb_max = jnp.ceil(block_limit[1]).astype(jnp.int32)
    nb_max = jnp.maximum(nb_max, nb_min)
    bs_min = jnp.maximum(jnp.floor(block_size[0]).astype(jnp.int32), 1)
    bs_max = jnp.ceil(block_size[1]).astype(jnp.int32)
    bs_max = jnp.maximum(bs_max, bs_min)

    # Static per-stats unroll bound — registry overlays with large block
    # counts get a larger unroll instead of a silent clip at MAX_BLOCKS.
    max_blocks = static_max_blocks(stats)
    num_blocks = jax.random.randint(k_nb, (), nb_min, nb_max + 1)
    num_blocks = jnp.minimum(num_blocks, max_blocks)
    section = jnp.maximum(1, t // num_blocks)

    # Widen sections (and shrink the block count) when they cannot host the
    # largest block plus padding (dataloader.py:397-401): the widened
    # section is bs_max + 4 itself, NOT recomputed from the new count.
    need = bs_max + 4
    adj = section < need
    nb_adj = jnp.clip(t // jnp.maximum(need, 1), 1, max_blocks)
    num_blocks = jnp.where(adj, nb_adj, num_blocks)
    section = jnp.where(adj, jnp.maximum(need, 1), section)
    rest = t % num_blocks

    starts, ends, active = _blocks_from_sections(
        k_blocks, t, num_blocks, section, rest, bs_min, bs_max,
        random_offset=True, max_blocks=max_blocks)
    return _freeze_fill(video, starts, ends, active, T)


def put_missing_frames(key, video, *, is_random_missing: bool = False,
                       dataset_name: str = "all",
                       stats: Optional[DatasetMissingStats] = None,
                       t_actual=None):
    """Dispatcher matching the reference's mode selection
    (dataloader.py:314-436).  Returns (corrupted_video, missing_mask)."""
    if is_random_missing:
        return random_missing(key, video, t_actual)
    if dataset_name == "all":
        return missing_blocks_all(key, video, t_actual)
    if stats is None:
        raise ValueError(
            f"dataset {dataset_name!r} needs DatasetMissingStats")
    return missing_blocks_dataset(key, video, stats, t_actual)


def zero_missing_frames(video, mask):
    """Replace masked frames with zeros (A3/A4 input prep,
    A4_train_with_pretrained.py:107-108)."""
    return jnp.where(mask[..., None, None] > 0, 0.0, video)


def put_missing_values(key, video, bm=None):
    """Alternate corruption (reference put_missing_values,
    dataloader.py:288-312 — dead there, call commented at :670): on a
    random set of frames, collapse the left and/or right hand onto its
    wrist position.  Returns (video, per-frame hand-corruption code in
    {0: left, 1: right, 2: both, -1: untouched})."""
    from ..data.keypoints import body_map

    bm = bm or body_map()
    T = video.shape[0]
    k_amt, k_pick, k_type = jax.random.split(key, 3)
    # random.randrange(1, T) frames chosen WITH replacement (:293-294)
    amount = jax.random.randint(k_amt, (), 1, jnp.maximum(T, 2))
    idx = jax.random.randint(k_pick, (T,), 0, T)
    take = jnp.arange(T) < amount
    hand_type = jax.random.randint(k_type, (T,), 0, 3)

    chosen = jnp.full(T, -1, jnp.int32)
    chosen = chosen.at[idx].max(jnp.where(take, hand_type, -1))

    left = jnp.asarray(bm.left_hand)
    right = jnp.asarray(bm.right_hand)
    lw = video[:, bm.index_of["pose_left_wrist"], :][:, None, :]
    rw = video[:, bm.index_of["pose_right_wrist"], :][:, None, :]

    do_left = jnp.isin(chosen, jnp.asarray([0, 2]))[:, None, None]
    do_right = jnp.isin(chosen, jnp.asarray([1, 2]))[:, None, None]
    out = video.at[:, left, :].set(
        jnp.where(do_left, jnp.broadcast_to(lw, video[:, left, :].shape),
                  video[:, left, :]))
    out = out.at[:, right, :].set(
        jnp.where(do_right, jnp.broadcast_to(rw, out[:, right, :].shape),
                  out[:, right, :]))
    return out, chosen


def add_sos(video, mask=None, sos_value: float = 1.0):
    """Prepend an all-ones start-of-sequence frame; extend the mask with 0
    (dataloader.py:482-493).  Works on (T, K, 2) or batched (B, T, K, 2)."""
    pad = [(0, 0)] * video.ndim
    pad[-3] = (1, 0)
    out = jnp.pad(video, pad, constant_values=sos_value)
    if mask is None:
        return out
    mpad = [(0, 0)] * mask.ndim
    mpad[-1] = (1, 0)
    return out, jnp.pad(mask, mpad, constant_values=0.0)


def add_sos_eos(video, mask=None):
    """SOS (all ones) + EOS (zeros except the last coordinate, which copies
    the SOS value 1) — reference add_sos_eos (dataloader.py:495-509; dead,
    call commented at :679)."""
    K, C = video.shape[-2], video.shape[-1]
    sos = jnp.ones(video.shape[:-3] + (1, K, C), video.dtype)
    eos = jnp.concatenate(
        [jnp.zeros(video.shape[:-3] + (1, K, C - 1), video.dtype),
         jnp.ones(video.shape[:-3] + (1, K, 1), video.dtype)], axis=-1)
    out = jnp.concatenate([sos, video, eos], axis=-3)
    if mask is None:
        return out, None
    zero = jnp.zeros(mask.shape[:-1] + (1,), mask.dtype)
    return out, jnp.concatenate([zero, mask, zero], axis=-1)


def delete_last_sequence(video, mask):
    """Drop the final frame (reference dataloader.py:511-516; dead)."""
    return video[..., :-1, :, :], mask[..., :-1]


def create_chunks(videos, cut_size: int = 20):
    """Re-cut ragged videos into fixed-size chunks (reference create_chunks,
    dataloader.py:518-542; dead, call commented at :596).  Host-side numpy:
    full chunks plus, when a remainder exists, the LAST cut_size frames;
    videos shorter than cut_size pass through unchanged."""
    out = []
    for v in videos:
        t = len(v)
        times, rest = t // cut_size, t % cut_size
        if times == 0:
            out.append(v)
            continue
        for c in range(times):
            out.append(v[cut_size * c:cut_size * (c + 1)])
        if rest > 0:
            out.append(v[-cut_size:])
    return out
