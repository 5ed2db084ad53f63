"""Hierarchical k-means vocabulary over 128-float descriptors, as dense
arrays with batched tree descent.

TPU-native replacement for DBoW2's TemplatedVocabulary + the authors' FSift
descriptor class (src/dbow2/, SURVEY.md §2.3): the k-ary tree is stored as
per-level centroid matrices (children of node n at level l live at indices
n*b .. n*b+b-1 of level l+1), so transforming a frame's 2000 descriptors is
`depth` batched gather+argmin steps — no pointer chasing.  Scoring uses
DBoW2's TF_IDF weighting with L1 scoring (s = 1 - 0.5*|v - w|_1 on
L1-normalized vectors), the configuration the reference's ORBVocabulary
uses.  Training (k-means per node, batched over all nodes of a level) stands
in for the reference's offline `small_voc.yml.gz`, which is not in-repo.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Vocabulary(NamedTuple):
    levels: List[jnp.ndarray]   # level l: [b^l, D] centroids (level 0 = root, unused)
    idf: jnp.ndarray            # [W] inverse document frequency weights
    branching: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.branching ** self.depth


def train_vocab(key, descs, branching: int = 10, depth: int = 4,
                iters: int = 8) -> Vocabulary:
    """Hierarchical k-means.  descs: [N, D] training descriptors."""
    N, D = descs.shape
    descs = jnp.asarray(descs)
    assign = jnp.zeros(N, jnp.int32)  # node id at current level
    levels = [jnp.zeros((1, D))]
    for level in range(1, depth + 1):
        n_parents = branching ** (level - 1)
        n_nodes = branching ** level
        # init: stratified picks from each parent's own pool (sort-by-parent,
        # strided selection); empty parents fall back to random descriptors
        key, k1 = jax.random.split(key)
        order = jnp.argsort(assign)
        counts = jnp.zeros(n_parents, jnp.int32).at[assign].add(1)
        starts = jnp.cumsum(counts) - counts
        cc = jnp.arange(branching)
        pick_in_parent = (cc[None, :] * counts[:, None]) // branching
        pick_idx = starts[:, None] + jnp.minimum(pick_in_parent,
                                                 jnp.maximum(counts[:, None] - 1, 0))
        cents = descs[order[jnp.clip(pick_idx.reshape(-1), 0, N - 1)]]
        rand_cents = descs[jax.random.randint(k1, (n_nodes,), 0, N)]
        empty = jnp.repeat(counts == 0, branching)
        cents = jnp.where(empty[:, None], rand_cents, cents)

        def lloyd(_, cents):
            # each vector only competes among its parent's children
            cand = cents.reshape(n_parents, branching, D)[assign]  # [N, b, D]
            d2 = jnp.sum((cand - descs[:, None, :]) ** 2, axis=-1)
            child = jnp.argmin(d2, axis=1).astype(jnp.int32)
            new_assign = assign * branching + child
            sums = jnp.zeros((n_nodes, D)).at[new_assign].add(descs)
            cnts = jnp.zeros((n_nodes,)).at[new_assign].add(1.0)
            new_cents = jnp.where(cnts[:, None] > 0, sums / jnp.clip(cnts[:, None], 1.0), cents)
            return new_cents

        cents = jax.lax.fori_loop(0, iters, lloyd, cents)
        # final assignment at this level
        cand = cents.reshape(n_parents, branching, D)[assign]
        d2 = jnp.sum((cand - descs[:, None, :]) ** 2, axis=-1)
        assign = (assign * branching + jnp.argmin(d2, axis=1).astype(jnp.int32))
        levels.append(cents)

    W = branching ** depth
    counts = np.bincount(np.asarray(assign), minlength=W)
    idf = jnp.asarray(np.log(N / (counts + 1.0)), jnp.float32)
    return Vocabulary(levels=levels, idf=idf, branching=branching, depth=depth)


@functools.partial(jax.jit, static_argnames=("branching", "depth"))
def _descend(levels_tuple, descs, branching: int, depth: int):
    node = jnp.zeros(descs.shape[0], jnp.int32)
    for level in range(1, depth + 1):
        cents = levels_tuple[level]
        n_parents = branching ** (level - 1)
        cand = cents.reshape(n_parents, branching, -1)[node]
        d2 = jnp.sum((cand - descs[:, None, :]) ** 2, axis=-1)
        node = node * branching + jnp.argmin(d2, axis=1).astype(jnp.int32)
    return node


def transform(vocab: Vocabulary, descs, valid=None):
    """descs [N, D] -> word ids [N] (leaves)."""
    words = _descend(tuple(vocab.levels), jnp.asarray(descs),
                     vocab.branching, vocab.depth)
    if valid is not None:
        words = jnp.where(valid, words, -1)
    return words


def bow_vector(vocab: Vocabulary, words, n_words=None) -> np.ndarray:
    """word ids [N] (-1 = invalid) -> L1-normalized tf-idf vector [W] (numpy)."""
    W = n_words or vocab.n_words
    w = np.asarray(words)
    w = w[w >= 0]
    v = np.zeros(W, np.float32)
    np.add.at(v, w, 1.0)
    v *= np.asarray(vocab.idf)
    s = v.sum()
    if s > 0:
        v /= s
    return v


def score_l1(v1: np.ndarray, v2: np.ndarray) -> float:
    """DBoW2 L1 score between L1-normalized vectors: in [0, 1]."""
    return float(1.0 - 0.5 * np.abs(v1 - v2).sum())


def save_vocab(vocab: Vocabulary, path: str):
    """Serialize to .npz — the TPU-native stand-in for the reference's
    OpenCV-yml vocabulary file (TemplatedVocabulary.h:1347-1455)."""
    arrays = {"level_%d" % i: np.asarray(l) for i, l in enumerate(vocab.levels)}
    np.savez_compressed(
        path, idf=np.asarray(vocab.idf),
        branching=np.int32(vocab.branching), depth=np.int32(vocab.depth),
        n_levels=np.int32(len(vocab.levels)), **arrays)


def load_vocab(path: str) -> Vocabulary:
    z = np.load(path)
    n = int(z["n_levels"])
    return Vocabulary(
        levels=[jnp.asarray(z["level_%d" % i]) for i in range(n)],
        idf=jnp.asarray(z["idf"]),
        branching=int(z["branching"]), depth=int(z["depth"]))
