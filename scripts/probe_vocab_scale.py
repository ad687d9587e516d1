"""Vocabulary at reference scale on TPU (VERDICT r2 missing #4 proof).

Synthesizes the full k=10/depth=6 tree (10^6 words, 1,111,111 nodes — the
ORBvoc.txt shape, `src/System.cc:58-77`), uploads it, and measures:
  - device memory of the tree arrays;
  - per-frame transform (1000 descriptors) ms;
  - bow_sparse + database add + full-database query ms at K=512.

Default env (axon):
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u scripts/probe_vocab_scale.py > /root/probe_vocab.log 2>&1 &
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from orb_slam2_tpu.bow import vocabulary as voc_mod
    from orb_slam2_tpu.bow import database as db_mod

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    t0 = time.time()
    voc = voc_mod.synth_vocabulary(k=10, depth=6, seed=0, device=dev)
    nbytes = sum(np.asarray(x).nbytes if not hasattr(x, "nbytes") else x.nbytes
                 for x in [voc.children, voc.centroids, voc.node_valid,
                           voc.word_id, voc.word_weight])
    print(f"tree built+uploaded in {time.time()-t0:.1f}s: "
          f"{voc.n_nodes} nodes, {voc.n_words} words, "
          f"{nbytes/1e6:.1f} MB device", flush=True)

    N, K = 1000, 512
    rng = np.random.default_rng(0)
    desc = jax.device_put(jnp.asarray(rng.integers(
        0, 2 ** 32, size=(N, 8), dtype=np.uint64).astype(np.uint32)), dev)
    valid = jax.device_put(jnp.ones(N, bool), dev)

    # transform runs EAGERLY like production (_bow_vec): jitting with the
    # 90MB tree as a closure constant folds it into the executable and the
    # compile never finishes at this scale
    def frame_bow(desc, valid):
        word, weight, node = voc_mod.transform(voc, desc, valid)
        return voc_mod.bow_sparse(word, weight)

    w, wt = frame_bow(desc, valid)
    _ = jax.device_get(w)
    t0 = time.time()
    k = 20
    for _ in range(k):
        w, wt = frame_bow(desc, valid)
    _ = jax.device_get(w)
    t_tr = (time.time() - t0) / k
    print(f"transform+bow_sparse (1000 desc, 10^6 words): {t_tr*1e3:.2f} ms/frame",
          flush=True)

    db = db_mod.BowDatabase.empty(K, N)
    t0 = time.time()
    for kf in range(64):
        db = db.add(kf, (w, wt))
    _ = jax.device_get(db.valid)
    print(f"db add x64: {(time.time()-t0)/64*1e3:.2f} ms/add", flush=True)

    sc, sh = db_mod.query_scores(db, (w, wt))
    _ = jax.device_get(sc)
    t0 = time.time()
    for _ in range(k):
        sc, sh = db_mod.query_scores(db, (w, wt))
    _ = jax.device_get(sc)
    print(f"query_scores vs K={K}: {(time.time()-t0)/k*1e3:.2f} ms/query",
          flush=True)
    s = np.asarray(sc)
    assert abs(s[0] - 1.0) < 1e-3, s[0]
    print("self-score sanity ok", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
