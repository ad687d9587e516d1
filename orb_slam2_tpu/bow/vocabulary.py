"""Array-form binary vocabulary tree (DBoW2 equivalent).

Replaces `TemplatedVocabulary` / `FORB` (`Thirdparty/DBoW2/DBoW2/
TemplatedVocabulary.h:135-372`, `FORB.cpp:30-60`): a k-ary tree over 256-bit
ORB descriptors. The tree is stored as flat arrays (children index matrix +
packed uint32 centroids); `transform` is a batched Hamming-argmin descent —
N descriptors x L levels x k children, fully vectorized (no per-descriptor
recursion). Training is hierarchical k-medians over binary descriptors
(bit-majority centroids, like FORB::meanValue); `load_orb_vocabulary` reads
the reference's ORBvoc.txt format for drop-in use.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class Vocabulary(NamedTuple):
    k: int                    # branching factor
    depth: int                # number of levels below root
    children: jnp.ndarray     # (n_nodes, k) int32 child node ids (-1 pad)
    centroids: jnp.ndarray    # (n_nodes, 8) uint32 node descriptors
    node_valid: jnp.ndarray   # (n_nodes,) bool
    word_id: jnp.ndarray      # (n_nodes,) int32 leaf -> word id (-1 inner)
    word_weight: jnp.ndarray  # (n_nodes,) float32 idf weight (leaves)
    n_words: int

    @property
    def n_nodes(self):
        return self.children.shape[0]


def _popcount_np(x):
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _hamming_np(a, b):
    """a: (N,8) uint32, b: (M,8) -> (N,M) int."""
    x = a[:, None, :] ^ b[None, :, :]
    return _popcount_np(x)


def _mean_binary(descs):
    """Bit-majority centroid (FORB::meanValue)."""
    bits = np.unpackbits(descs.view(np.uint8), axis=-1)   # (n, 256)
    mean = bits.mean(0) >= 0.5
    return np.packbits(mean.astype(np.uint8)).view(np.uint32)


def build_vocabulary(descriptors: np.ndarray, k: int = 10, depth: int = 4,
                     seed: int = 0, n_iters: int = 8) -> Vocabulary:
    """Hierarchical k-medians over (N,8) uint32 descriptors. Node count is
    bounded by geometric series; unused branches are masked."""
    rng = np.random.default_rng(seed)
    descriptors = np.asarray(descriptors, dtype=np.uint32)

    max_nodes = 1 + sum(k ** (l + 1) for l in range(depth))
    children = np.full((max_nodes, k), -1, np.int32)
    centroids = np.zeros((max_nodes, 8), np.uint32)
    node_valid = np.zeros(max_nodes, bool)
    node_valid[0] = True
    next_node = 1
    word_id = np.full(max_nodes, -1, np.int32)

    def kmedians(data):
        n = len(data)
        kk = min(k, n)
        cent = data[rng.choice(n, kk, replace=False)]
        for _ in range(n_iters):
            d = _hamming_np(data, cent)
            assign = d.argmin(1)
            for c in range(kk):
                sel = data[assign == c]
                if len(sel):
                    cent[c] = _mean_binary(sel)
        d = _hamming_np(data, cent)
        return cent, d.argmin(1), kk

    # BFS split
    queue = [(0, descriptors, 0)]   # (node, data, level)
    leaves = []
    while queue:
        node, data, level = queue.pop(0)
        if level == depth or len(data) <= 1:
            leaves.append(node)
            continue
        cent, assign, kk = kmedians(data)
        for c in range(kk):
            child = next_node
            next_node += 1
            children[node, c] = child
            centroids[child] = cent[c]
            node_valid[child] = True
            sel = data[assign == c]
            if level + 1 == depth or len(sel) <= 1:
                leaves.append(child)
            else:
                queue.append((child, sel, level + 1))

    for w, leaf in enumerate(sorted(leaves)):
        word_id[leaf] = w

    voc_tmp = Vocabulary(
        k=k, depth=depth,
        children=jnp.asarray(children[:next_node]),
        centroids=jnp.asarray(centroids[:next_node]),
        node_valid=jnp.asarray(node_valid[:next_node]),
        word_id=jnp.asarray(word_id[:next_node]),
        word_weight=jnp.asarray(np.where(word_id[:next_node] >= 0, 1.0, 0.0)
                                .astype(np.float32)),
        n_words=len(leaves))
    # IDF weights from the training set (DBoW2 TF_IDF weighting: rare words
    # discriminate; without this, uniform weights inflate common-word scores)
    import jax.numpy as _jnp
    w_assign, _, _ = transform(voc_tmp, _jnp.asarray(descriptors),
                               _jnp.ones(len(descriptors), bool))
    counts = np.bincount(np.asarray(w_assign)[np.asarray(w_assign) >= 0],
                         minlength=len(leaves))
    idf = np.log(len(descriptors) / (1.0 + counts)).astype(np.float32)
    idf = np.maximum(idf, 0.0)
    weights = np.zeros(next_node, np.float32)
    mask = word_id[:next_node] >= 0
    weights[mask] = idf[word_id[:next_node][mask]]

    return Vocabulary(
        k=k, depth=depth,
        children=jnp.asarray(children[:next_node]),
        centroids=jnp.asarray(centroids[:next_node]),
        node_valid=jnp.asarray(node_valid[:next_node]),
        word_id=jnp.asarray(word_id[:next_node]),
        word_weight=jnp.asarray(weights[:next_node]),
        n_words=len(leaves))


def synth_vocabulary(k: int = 10, depth: int = 6, seed: int = 0,
                     device=None) -> Vocabulary:
    """Synthesize a COMPLETE k-ary tree at the reference ORBvoc scale
    (k=10, depth=6 -> 10^6 leaf words, 1,111,111 nodes — `src/System.cc:58-77`
    loads exactly this shape). Centroids are random descriptors and weights
    random idf values: structurally and computationally identical to the real
    vocabulary for transform/DB purposes (same tree descent, same memory
    layout, same sparse-row sizes), without shipping the 140MB ORBvoc.txt.

    Built with vectorized numpy (no per-node loop: the BFS child layout of a
    complete k-ary tree is arithmetic)."""
    rng = np.random.default_rng(seed)
    level_sizes = [k ** (l + 1) for l in range(depth)]
    n_nodes = 1 + sum(level_sizes)
    # BFS layout: level l starts at off[l]; node p of level l has children
    # at off[l+1] + p*k .. +k-1
    off = np.zeros(depth + 1, np.int64)
    off[0] = 0
    for l in range(depth):
        off[l + 1] = off[l] + (1 if l == 0 else level_sizes[l - 1])
    children = np.full((n_nodes, k), -1, np.int32)
    for l in range(depth):
        n_par = 1 if l == 0 else level_sizes[l - 1]
        par = np.arange(off[l], off[l] + n_par)
        base = off[l + 1] + np.arange(n_par)[:, None] * k
        children[par] = (base + np.arange(k)[None, :]).astype(np.int32)
    centroids = rng.integers(0, 2 ** 32, size=(n_nodes, 8), dtype=np.uint64
                             ).astype(np.uint32)
    word_id = np.full(n_nodes, -1, np.int32)
    n_words = level_sizes[-1]
    word_id[off[depth]:] = np.arange(n_words, dtype=np.int32)
    weights = np.zeros(n_nodes, np.float32)
    weights[off[depth]:] = rng.uniform(0.1, 4.0, n_words).astype(np.float32)
    put = (lambda x: jax.device_put(x, device)) if device is not None \
        else jnp.asarray
    return Vocabulary(
        k=k, depth=depth, children=put(children), centroids=put(centroids),
        node_valid=put(np.ones(n_nodes, bool)), word_id=put(word_id),
        word_weight=put(weights), n_words=n_words)


def save_npz(voc: Vocabulary, path: str):
    """Cache a vocabulary as npz (the 1M-word ORBvoc.txt takes minutes to
    parse; convert once — the reference pays the text-load cost every run,
    `src/System.cc:58-77`)."""
    np.savez_compressed(
        path, k=voc.k, depth=voc.depth, children=np.asarray(voc.children),
        centroids=np.asarray(voc.centroids), node_valid=np.asarray(voc.node_valid),
        word_id=np.asarray(voc.word_id), word_weight=np.asarray(voc.word_weight),
        n_words=voc.n_words)


def load_npz(path: str) -> Vocabulary:
    d = np.load(path)
    return Vocabulary(
        k=int(d["k"]), depth=int(d["depth"]), children=jnp.asarray(d["children"]),
        centroids=jnp.asarray(d["centroids"]), node_valid=jnp.asarray(d["node_valid"]),
        word_id=jnp.asarray(d["word_id"]), word_weight=jnp.asarray(d["word_weight"]),
        n_words=int(d["n_words"]))


def load_orb_vocabulary(path: str) -> Vocabulary:
    """Load the reference's ORBvoc.txt (DBoW2 text format: header 'k L s1 s2'
    then one line per node: parent is-leaf d0..d31 weight)."""
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        rows = []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            rows.append(parts)
    n = len(rows) + 1
    children = np.full((n, k), -1, np.int32)
    centroids = np.zeros((n, 8), np.uint32)
    node_valid = np.zeros(n, bool)
    node_valid[0] = True
    word_id = np.full(n, -1, np.int32)
    weights = np.zeros(n, np.float32)
    child_count = np.zeros(n, np.int32)
    n_words = 0
    for i, parts in enumerate(rows):
        nid = i + 1
        parent = int(parts[0])
        is_leaf = int(parts[1])
        desc_bytes = np.array([int(x) for x in parts[2:34]], np.uint8)
        centroids[nid] = desc_bytes.view(np.uint32)
        weights[nid] = float(parts[34])
        children[parent, child_count[parent]] = nid
        child_count[parent] += 1
        node_valid[nid] = True
        if is_leaf:
            word_id[nid] = n_words
            n_words += 1
    return Vocabulary(k=k, depth=L, children=jnp.asarray(children),
                      centroids=jnp.asarray(centroids),
                      node_valid=jnp.asarray(node_valid),
                      word_id=jnp.asarray(word_id),
                      word_weight=jnp.asarray(weights), n_words=n_words)


def transform(voc: Vocabulary, desc, valid, levels_up: int = 2):
    """Batched tree descent (DBoW2 `transform` with the FeatureVector's
    levels-up node record). Returns (word (N,), weight (N,), node (N,)):
    word = leaf word id (-1 invalid), node = tree node at depth `levels_up`
    (the reference calls transform(...,4) on a depth-6 tree -> depth-2 nodes;
    pass the depth directly here).

    Not jitted here: `voc` mixes arrays with static ints (k, depth); callers
    wrap this in their own jit with the vocabulary as a closure constant."""
    N = desc.shape[0]
    cur = jnp.zeros((N,), jnp.int32)
    rec = jnp.zeros((N,), jnp.int32)
    for level in range(voc.depth):
        ch = voc.children[jnp.clip(cur, 0, voc.n_nodes - 1)]     # (N,k)
        ch_ok = ch >= 0
        cent = voc.centroids[jnp.clip(ch, 0, voc.n_nodes - 1)]   # (N,k,8)
        x = jnp.bitwise_xor(cent, desc[:, None, :])
        d = jnp.sum(jax.lax.population_count(x), axis=-1)
        d = jnp.where(ch_ok, d, 1 << 20)
        best = jnp.argmin(d, axis=-1)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        # stop at dead ends (node without children keeps its id)
        has_any = jnp.any(ch_ok, axis=-1)
        cur = jnp.where(has_any, nxt, cur)
        if level + 1 == levels_up:
            rec = cur
    word = voc.word_id[jnp.clip(cur, 0, voc.n_nodes - 1)]
    weight = voc.word_weight[jnp.clip(cur, 0, voc.n_nodes - 1)]
    word = jnp.where(valid, word, -1)
    weight = jnp.where(valid, weight, 0.0)
    rec = jnp.where(valid, rec, -1)
    return word, weight, rec


def bow_sparse(word, weight):
    """Aggregate per-descriptor (word, weight) pairs into a SORTED sparse
    L1-normalized BoW row: (words (N,) int32 ascending, INT32_MAX padded;
    weights (N,) float32). Zero-weight words (idf-0 stop words) are dropped,
    matching DBoW2's BowVector::addWeight TF-IDF behavior. Vocabulary-size
    independent — this is what lets the database host the ~1M-word ORBvoc."""
    N = word.shape[0]
    pad = jnp.iinfo(jnp.int32).max
    w = jnp.where((word >= 0) & (weight > 0), word, pad)
    order = jnp.argsort(w)
    ws = w[order]
    wt = jnp.where(ws != pad, weight[order], 0.0)
    is_first = jnp.concatenate([jnp.ones((1,), bool), ws[1:] != ws[:-1]])
    is_first = is_first & (ws != pad)
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1          # run index
    agg = jnp.zeros((N,), jnp.float32).at[
        jnp.where(ws != pad, seg, N)].add(wt, mode="drop")
    uniq = jnp.full((N,), pad, jnp.int32).at[
        jnp.where(is_first, seg, N)].set(ws, mode="drop")
    total = jnp.sum(agg)
    return uniq, agg / jnp.maximum(total, 1e-12)


def bow_vector(word, weight, n_words: int):
    """Aggregate per-descriptor words into a dense L1-normalized BoW vector
    (W,). The dense form makes frame-vs-all-keyframes scoring one min-sum."""
    W = n_words
    v = jnp.zeros((W,), jnp.float32).at[
        jnp.where(word >= 0, word, W)].add(weight, mode="drop")
    s = jnp.sum(v)
    return v / jnp.maximum(s, 1e-12)


def l1_score(v1, v2):
    """DBoW2 L1 scoring: for L1-normalized vectors, score = sum min(a,b)
    (equivalent to 1 - 0.5*|a-b|_1, `ScoringObject.cc` L1Scoring)."""
    return jnp.sum(jnp.minimum(v1, v2), axis=-1)
