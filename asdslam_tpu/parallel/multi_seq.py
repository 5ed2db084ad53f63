"""Concurrent multi-sequence tracking: the fused per-frame tracking step
vmapped over a batch of sequences and sharded over the device mesh.

The BASELINE "config 5" requirement (SURVEY.md §2.4) asks for concurrent
multi-sequence operation on a pod slice.  The per-sequence hot path is
already one jitted program (frontend/track_step.py); scaling it is pure data
parallelism: vmap over the sequence axis, shard that axis over the mesh —
each chip tracks its own subset of sequences with zero collectives (per-
sequence state never crosses chips).  The host keeps one MapStore per
sequence and decodes each sequence's result bundle exactly as in the
single-sequence tracker.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from asdslam_tpu.config import SlamConfig
from asdslam_tpu.frontend import track_step as track_step_mod


def make_dp_track_step(cfg: SlamConfig, K, extract_fn, mesh: Mesh,
                       axis: str = "data"):
    """Build a batched tracking step: every argument/result gains a leading
    sequence axis, sharded over ``mesh[axis]``.

    Call with (imgs [B, H, W], poses [B, 7], velocities [B, 7],
    prev_feats (FrameFeatures with leading B), prev_geom (GeomBlock, leading
    B), cand_pts (PointBlock, leading B)); B must be divisible by the mesh
    size.  Returns (feats, TrackResult) with leading B.
    """
    step = track_step_mod.make_track_step(cfg, K, extract_fn)
    batched = jax.vmap(step)

    # shard_map, not vmap + sharding constraints: with constraints the SPMD
    # partitioner is free to re-shard intermediates (it inserts small
    # all-gathers inside top_k), while shard_map runs each device's
    # sub-batch as a fully local program — zero collectives BY CONSTRUCTION
    # (the dryrun asserts this on the compiled HLO).
    from jax.experimental.shard_map import shard_map

    spec = P(axis)
    run = jax.jit(shard_map(
        batched, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=spec, check_rep=False))
    return run
