"""Keyframe database for place recognition.

Replaces `KeyFrameDatabase` (`src/KeyFrameDatabase.cc`). The reference keeps
an inverted file word -> list<KeyFrame> sized to the vocabulary
(`src/KeyFrameDatabase.cc:45-50`); a dense (K, W) matrix equivalent cannot
host the real ~1M-word ORB vocabulary (2.5 GB at K=512). Instead each
keyframe stores a fixed-capacity SORTED sparse BoW row — (word ids, weights),
at most one entry per extracted feature — and a query (itself a sorted
sparse row) scores against all keyframes with one vectorized binary search:
O(K * S log S) independent of vocabulary size. Shared-word counts (the
reference's first gate) fall out of the same lookup.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PAD = jnp.iinfo(jnp.int32).max   # sorted-row padding (sorts last)


class BowDatabase(NamedTuple):
    words: jnp.ndarray      # (K, S) int32, sorted word ids, PAD for unused
    weights: jnp.ndarray    # (K, S) float32, L1-normalized per row
    valid: jnp.ndarray      # (K,) bool

    @staticmethod
    def empty(max_keyframes: int, capacity: int):
        """capacity: max distinct words per keyframe (= max features)."""
        return BowDatabase(
            words=jnp.full((max_keyframes, capacity), PAD, jnp.int32),
            weights=jnp.zeros((max_keyframes, capacity), jnp.float32),
            valid=jnp.zeros((max_keyframes,), bool))

    def add(self, kf_id, bow):
        """bow: (words (S,), weights (S,)) from vocabulary.bow_sparse."""
        w, wt = bow
        return self._replace(
            words=self.words.at[kf_id].set(w),
            weights=self.weights.at[kf_id].set(wt),
            valid=self.valid.at[kf_id].set(True))

    def erase(self, kf_mask):
        return self._replace(valid=self.valid & ~kf_mask)


@jax.jit
def query_scores(db: BowDatabase, bow):
    """(K,) L1 scores + shared-word counts of a sparse query vs all keyframes.
    For L1-normalized vectors the DBoW2 L1 score equals sum min(a_w, b_w)
    over shared words (`ScoringObject.cc` L1Scoring)."""
    qw, qwt = bow
    S = qw.shape[0]
    idx = jnp.clip(jnp.searchsorted(qw, db.words), 0, S - 1)
    hit = (qw[idx] == db.words) & (db.words != PAD)
    scores = jnp.sum(jnp.where(hit, jnp.minimum(db.weights, qwt[idx]), 0.0),
                     axis=-1)
    shared = jnp.sum(hit.astype(jnp.int32), axis=-1)
    scores = jnp.where(db.valid, scores, 0.0)
    shared = jnp.where(db.valid, shared, 0)
    return scores, shared


@jax.jit
def detect_candidates(db: BowDatabase, bow, exclude_mask, min_score, covis):
    """`DetectLoopCandidates` (`src/KeyFrameDatabase.cc:113-264`): keyframes
    (outside exclude_mask) sharing >= 0.8*max shared words and scoring >=
    min_score; candidate score is accumulated over its covisibility group
    (top-10 neighbors), kept if accScore > 0.75 * bestAccScore.

    covis: (K,K) covisibility weights. Returns (cand_mask, acc_scores)."""
    scores, shared = query_scores(db, bow)
    usable = db.valid & ~exclude_mask
    shared = jnp.where(usable, shared, 0)
    max_common = jnp.max(shared)
    min_common = 0.8 * max_common
    first = usable & (shared > min_common) & (shared > 0) & (scores >= min_score)

    # accumulated score over each candidate's top-10 covisible group
    K = covis.shape[0]
    top_w, top_i = jax.lax.top_k(covis, min(10, K))            # (K,10)
    group_scores = jnp.where(
        (top_w > 0) & first[top_i], scores[top_i], 0.0)         # (K,10)
    acc = jnp.where(first, scores + jnp.sum(group_scores, axis=1), 0.0)
    best_acc = jnp.max(acc)
    keep = first & (acc > 0.75 * best_acc) & (acc > 0)
    return keep, acc


@jax.jit
def detect_reloc_candidates(db: BowDatabase, bow, covis):
    """`DetectRelocalizationCandidates` (`src/KeyFrameDatabase.cc:275-420`):
    like loop detection but with no min-score gate and no exclusion set;
    candidate score accumulates over the covisibility group, groups with
    accScore > 0.75 * best are kept, and the returned keyframe per group is
    the BEST-SCORING member (`:398-414`), not the seed.

    Returns (cand_mask (K,), acc (K,), scores (K,))."""
    scores, shared = query_scores(db, bow)
    usable = db.valid
    shared = jnp.where(usable, shared, 0)
    max_common = jnp.max(shared)
    first = usable & (shared.astype(jnp.float32) > 0.8 * max_common) & (shared > 0)

    K = covis.shape[0]
    top_w, top_i = jax.lax.top_k(covis, min(10, K))            # (K,10)
    member_ok = (top_w > 0) & first[top_i]
    group_scores = jnp.where(member_ok, scores[top_i], 0.0)
    acc = jnp.where(first, scores + jnp.sum(group_scores, axis=1), 0.0)
    best_acc = jnp.max(acc)
    keep_group = first & (acc > 0.75 * best_acc) & (acc > 0)

    # best member of each kept group (seed included)
    mem_scores = jnp.where(member_ok, scores[top_i], -1.0)
    best_col = jnp.argmax(mem_scores, axis=1)
    rows = jnp.arange(K)
    best_mem = top_i[rows, best_col]
    best_mem_score = mem_scores[rows, best_col]
    best_kf = jnp.where(best_mem_score > scores, best_mem, rows)
    mask = jnp.zeros((K,), bool).at[
        jnp.where(keep_group, best_kf, K)].set(True, mode="drop")
    return mask, acc, scores
