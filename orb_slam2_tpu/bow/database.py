"""Keyframe database for place recognition.

Replaces `KeyFrameDatabase` (`src/KeyFrameDatabase.cc`): instead of an
inverted file of word -> keyframe lists, each keyframe stores a dense
L1-normalized BoW vector (W,), so querying is ONE elementwise min-sum over
(K, W) — an MXU/VPU-friendly reduction instead of list walking. Shared-word
counts (the reference's first gate) come from the same arrays.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BowDatabase(NamedTuple):
    vectors: jnp.ndarray    # (K, W) float32, L1-normalized rows (0 if unused)
    has_word: jnp.ndarray   # (K, W) bool
    valid: jnp.ndarray      # (K,) bool

    @staticmethod
    def empty(max_keyframes: int, n_words: int):
        return BowDatabase(
            vectors=jnp.zeros((max_keyframes, n_words), jnp.float32),
            has_word=jnp.zeros((max_keyframes, n_words), bool),
            valid=jnp.zeros((max_keyframes,), bool))

    def add(self, kf_id, bow_vec):
        return self._replace(
            vectors=self.vectors.at[kf_id].set(bow_vec),
            has_word=self.has_word.at[kf_id].set(bow_vec > 0),
            valid=self.valid.at[kf_id].set(True))

    def erase(self, kf_mask):
        return self._replace(valid=self.valid & ~kf_mask)


@jax.jit
def query_scores(db: BowDatabase, bow_vec):
    """(K,) L1 scores + shared-word counts of a query vs all keyframes."""
    scores = jnp.sum(jnp.minimum(db.vectors, bow_vec[None, :]), axis=-1)
    shared = jnp.sum(db.has_word & (bow_vec > 0)[None, :], axis=-1)
    scores = jnp.where(db.valid, scores, 0.0)
    shared = jnp.where(db.valid, shared, 0)
    return scores, shared


@jax.jit
def detect_candidates(db: BowDatabase, bow_vec, exclude_mask, min_score,
                      covis):
    """`DetectLoopCandidates` (`src/KeyFrameDatabase.cc:113-264`): keyframes
    (outside exclude_mask) sharing >= 0.8*max shared words and scoring >=
    min_score; candidate score is accumulated over its covisibility group
    (top-10 neighbors), kept if accScore > 0.75 * bestAccScore.

    covis: (K,K) covisibility weights. Returns (cand_mask, acc_scores)."""
    scores, shared = query_scores(db, bow_vec)
    usable = db.valid & ~exclude_mask
    shared = jnp.where(usable, shared, 0)
    max_common = jnp.max(shared)
    min_common = 0.8 * max_common
    first = usable & (shared > min_common) & (shared > 0) & (scores >= min_score)

    # accumulated score over each candidate's top-10 covisible group
    w = covis
    K = w.shape[0]
    top_w, top_i = jax.lax.top_k(w, min(10, K))            # (K,10)
    group_scores = jnp.where(
        (top_w > 0) & first[top_i], scores[top_i], 0.0)     # (K,10)
    acc = jnp.where(first, scores + jnp.sum(group_scores, axis=1), 0.0)
    best_acc = jnp.max(acc)
    keep = first & (acc > 0.75 * best_acc) & (acc > 0)
    return keep, acc
