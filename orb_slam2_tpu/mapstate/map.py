"""The map as a fixed-capacity structure-of-arrays pytree.

TPU-native replacement for the reference's pointer graph — Map, KeyFrame,
MapPoint with their ~15 mutexes (`include/Map.h:42-163`,
`include/KeyFrame.h:291-435`, `include/MapPoint.h:231-331`). Design rules:

- capacities are static (config.max_keyframes K, max_map_points P,
  max_keypoints N); every entity has a validity mask; "delete" = clear bit.
- the observation graph is stored once, keyframe-major: `kf_obs[k, i]` is the
  map-point id seen by feature i of keyframe k (-1 = none). Point-major views
  (needed for distinctive descriptors, normals, culling) are derived on
  demand by one sort over the flat incidence (`point_observations`).
- covisibility is a dense (K,K) int32 matrix of shared-point counts —
  O(K^2) memory buys O(1) covisible-set queries as pure array ops
  (`KeyFrame::UpdateConnections`, `src/KeyFrame.cc:411-533`, becomes one
  gather + scatter row update).
- all mutation functions are pure: MapState in, MapState out; the pipeline
  commits a new snapshot per stage, which replaces the reference's
  `mMutexMapUpdate` single-writer protocol (SURVEY §2.3 P4).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

INVALID = -1


class MapState(NamedTuple):
    # --- keyframes ---
    kf_pose: jnp.ndarray       # (K,4,4) f32 Tcw
    kf_valid: jnp.ndarray      # (K,) bool
    kf_frame_id: jnp.ndarray   # (K,) i32 source frame index
    kf_timestamp: jnp.ndarray  # (K,) f32
    # --- per-keyframe features ---
    kf_xy: jnp.ndarray         # (K,N,2) f32 undistorted pixel coords
    kf_level: jnp.ndarray      # (K,N) i32
    kf_angle: jnp.ndarray      # (K,N) f32 degrees
    kf_desc: jnp.ndarray       # (K,N,8) u32
    kf_ur: jnp.ndarray         # (K,N) f32 stereo right x (-1 mono)
    kf_depth: jnp.ndarray      # (K,N) f32 stereo depth (-1 none)
    kf_feat_valid: jnp.ndarray # (K,N) bool
    kf_obs: jnp.ndarray        # (K,N) i32 -> point id or -1
    # --- map points ---
    pt_pos: jnp.ndarray        # (P,3) f32 world
    pt_valid: jnp.ndarray      # (P,) bool
    pt_desc: jnp.ndarray       # (P,8) u32 distinctive descriptor
    pt_normal: jnp.ndarray     # (P,3) f32 mean viewing direction
    pt_min_dist: jnp.ndarray   # (P,) f32 scale-invariance band
    pt_max_dist: jnp.ndarray   # (P,) f32
    pt_ref_kf: jnp.ndarray     # (P,) i32
    pt_first_kf: jnp.ndarray   # (P,) i32 creation keyframe (culling window)
    pt_visible: jnp.ndarray    # (P,) i32 mnVisible counter
    pt_found: jnp.ndarray      # (P,) i32 mnFound counter
    pt_obs_cnt: jnp.ndarray    # (P,) i32 cached weighted observation count
                               # (refreshed after keyframe insertion and each
                               # mapping pass; per-frame consumers read the
                               # snapshot instead of re-scattering K*N entries)
    pt_forward: jnp.ndarray    # (P,) i32 replacement forwarding: fusion
                               # redirects point i to pt_forward[i] (identity
                               # when live). Device-side equivalent of the
                               # reference's MapPoint::GetReplaced chain that
                               # Tracking::CheckReplacedInLastFrame walks
                               # (src/Tracking.cc:1135-1163): the tracking
                               # step resolves last-frame bindings through it
                               # so a point fused away between frames keeps
                               # matching under its survivor id.
    # --- cached point-major observation table ---
    obs_kf: jnp.ndarray        # (P,OBS_W) i32 observing keyframe ids (-1 pad)
    obs_ft: jnp.ndarray        # (P,OBS_W) i32 feature index in that keyframe
                               # Derived view of kf_obs, refreshed at keyframe
                               # events (insert finale / loop correction); the
                               # per-frame and per-event consumers that used
                               # to sweep the full (K,N) incidence (local-map
                               # selection, covisibility updates, point
                               # erase/replace) read or patch this instead —
                               # a ~35x smaller working set at K=512.
    # --- graphs ---
    covis: jnp.ndarray         # (K,K) i32 shared-point counts
    parent: jnp.ndarray        # (K,) i32 spanning-tree parent (-1 root)
    loop_edges: jnp.ndarray    # (L,2) i32 persisted loop-closure edges
                               # (`KeyFrame::mspLoopEdges`,
                               # src/KeyFrame.cc:591-599), -1 padded
    # --- counters ---
    next_kf: jnp.ndarray       # () i32 — high-water mark for kf ids
    next_pt: jnp.ndarray       # () i32

    @property
    def n_keyframes(self):
        return jnp.sum(self.kf_valid.astype(jnp.int32))

    @property
    def n_points(self):
        return jnp.sum(self.pt_valid.astype(jnp.int32))

    @property
    def capacity_kf(self):
        return self.kf_valid.shape[0]

    @property
    def capacity_pt(self):
        return self.pt_valid.shape[0]

    @property
    def n_feat(self):
        return self.kf_obs.shape[1]


OBS_W = 16   # cached observation-table width (first OBS_W by (kf, feat))


def empty(max_keyframes: int, max_points: int, max_keypoints: int,
          max_loop_edges: int = 32) -> MapState:
    K, P, N = max_keyframes, max_points, max_keypoints
    f = jnp.zeros
    return MapState(
        kf_pose=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4)).copy(),
        kf_valid=f((K,), bool),
        kf_frame_id=jnp.full((K,), INVALID, jnp.int32),
        kf_timestamp=f((K,), jnp.float32),
        kf_xy=f((K, N, 2), jnp.float32),
        kf_level=f((K, N), jnp.int32),
        kf_angle=f((K, N), jnp.float32),
        kf_desc=f((K, N, 8), jnp.uint32),
        kf_ur=jnp.full((K, N), -1.0, jnp.float32),
        kf_depth=jnp.full((K, N), -1.0, jnp.float32),
        kf_feat_valid=f((K, N), bool),
        kf_obs=jnp.full((K, N), INVALID, jnp.int32),
        pt_pos=f((P, 3), jnp.float32),
        pt_valid=f((P,), bool),
        pt_desc=f((P, 8), jnp.uint32),
        pt_normal=f((P, 3), jnp.float32),
        pt_min_dist=f((P,), jnp.float32),
        pt_max_dist=f((P,), jnp.float32),
        pt_ref_kf=jnp.full((P,), INVALID, jnp.int32),
        pt_first_kf=jnp.full((P,), INVALID, jnp.int32),
        pt_visible=f((P,), jnp.int32),
        pt_found=f((P,), jnp.int32),
        pt_obs_cnt=f((P,), jnp.int32),
        pt_forward=jnp.arange(P, dtype=jnp.int32),
        obs_kf=jnp.full((P, OBS_W), INVALID, jnp.int32),
        obs_ft=jnp.full((P, OBS_W), INVALID, jnp.int32),
        covis=f((K, K), jnp.int32),
        parent=jnp.full((K,), INVALID, jnp.int32),
        loop_edges=jnp.full((max_loop_edges, 2), INVALID, jnp.int32),
        next_kf=jnp.zeros((), jnp.int32),
        next_pt=jnp.zeros((), jnp.int32),
    )


def add_loop_edge(m: MapState, kf_i, kf_j) -> MapState:
    """Persist a loop-closure edge (i, j). The reference stores these per
    keyframe (`KeyFrame::AddLoopEdge`, src/KeyFrame.cc:591-599) and feeds them
    into every later essential-graph solve (src/Optimizer.cc:1248-1283); they
    also make both endpoints uncullable (`KeyFrame::SetBadFlag` early-outs on
    mbNotErase, src/KeyFrame.cc:603-649)."""
    free = jnp.argmin(m.loop_edges[:, 0] >= 0)   # first row with -1
    row = jnp.stack([jnp.asarray(kf_i, jnp.int32), jnp.asarray(kf_j, jnp.int32)])
    # if the table is full (no free row), drop the write rather than clobber
    has_free = ~jnp.all(m.loop_edges[:, 0] >= 0)
    idx = jnp.where(has_free, free, m.loop_edges.shape[0])
    return m._replace(loop_edges=m.loop_edges.at[idx].set(row, mode="drop"))


def loop_protected_keyframes(m: MapState) -> jnp.ndarray:
    """(K,) bool: keyframes participating in a persisted loop edge."""
    K = m.capacity_kf
    le = m.loop_edges
    prot = jnp.zeros((K,), bool)
    prot = prot.at[jnp.where(le[:, 0] >= 0, le[:, 0], K)].set(True, mode="drop")
    prot = prot.at[jnp.where(le[:, 1] >= 0, le[:, 1], K)].set(True, mode="drop")
    return prot


# ---------------------------------------------------------------------------
# Keyframe insertion
# ---------------------------------------------------------------------------

def add_keyframe(m: MapState, pose, xy, level, angle, desc, ur, depth,
                 feat_valid, obs, frame_id, timestamp):
    """Insert a keyframe into the first free slot. obs: (N,) point ids already
    matched by tracking (-1 for none). Returns (map, kf_id)."""
    slot = jnp.argmin(m.kf_valid)  # first False; if full, slot 0 (caller guards)
    m = m._replace(
        kf_pose=m.kf_pose.at[slot].set(pose),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_frame_id=m.kf_frame_id.at[slot].set(frame_id),
        kf_timestamp=m.kf_timestamp.at[slot].set(timestamp),
        kf_xy=m.kf_xy.at[slot].set(xy),
        kf_level=m.kf_level.at[slot].set(level),
        kf_angle=m.kf_angle.at[slot].set(angle),
        kf_desc=m.kf_desc.at[slot].set(desc),
        kf_ur=m.kf_ur.at[slot].set(ur),
        kf_depth=m.kf_depth.at[slot].set(depth),
        kf_feat_valid=m.kf_feat_valid.at[slot].set(feat_valid),
        kf_obs=m.kf_obs.at[slot].set(jnp.where(feat_valid, obs, INVALID)),
        next_kf=m.next_kf + 1,
    )
    return m, slot


def point_indicator(m: MapState, kf_id):
    """(P,) float indicator of points observed by kf_id."""
    obs = m.kf_obs[kf_id]
    ind = jnp.zeros((m.capacity_pt,), jnp.int32).at[
        jnp.clip(obs, 0, m.capacity_pt - 1)
    ].max(jnp.where(obs >= 0, 1, 0))
    return ind


def update_connections(m: MapState, kf_id, use_table: bool = False):
    """Recompute covisibility weights of kf_id vs all keyframes and set the
    spanning-tree parent (best covisible among earlier KFs), mirroring
    `KeyFrame::UpdateConnections` (`src/KeyFrame.cc:411-533`): weights below
    th=15 are kept in the matrix (queries threshold as needed); parent set
    once (first call with nonzero weights). EXACT weights via the
    chunk-skipped incidence sweep (use_table kept for signature
    compatibility; both paths are exact)."""
    del use_table
    ind = point_indicator(m, kf_id)                            # (P,)
    w = incidence_counts(m, ind)
    w = jnp.where(m.kf_valid, w, 0)
    w = w.at[kf_id].set(0)
    covis = m.covis.at[kf_id, :].set(w)
    covis = covis.at[:, kf_id].set(w)

    # spanning-tree parent: highest-weight earlier keyframe, set once
    earlier = m.kf_frame_id < m.kf_frame_id[kf_id]
    w_earlier = jnp.where(earlier & m.kf_valid, w, -1)
    best = jnp.argmax(w_earlier)
    has_parent = m.parent[kf_id] >= 0
    new_parent = jnp.where(
        has_parent, m.parent[kf_id],
        jnp.where(w_earlier[best] > 0, best, INVALID),
    )
    return m._replace(covis=covis, parent=m.parent.at[kf_id].set(new_parent))


def covisible_keyframes(m: MapState, kf_id, k: int, min_weight: int = 1):
    """Top-k covisible keyframe ids of kf_id (fixed size k, -1 padded)."""
    w = jnp.where(m.kf_valid, m.covis[kf_id], 0)
    vals, idx = jax.lax.top_k(w, k)
    return jnp.where(vals >= min_weight, idx, INVALID), vals


# ---------------------------------------------------------------------------
# Point insertion / removal
# ---------------------------------------------------------------------------

def allocate_points(m: MapState, want_mask):
    """Find free point slots for each True in want_mask (B,). Returns (B,)
    slot ids (-1 if map full). cumsum+scatter compaction (compact_mask), not
    an argsort over the P-point capacity."""
    B = want_mask.shape[0]
    free_slots, free_ok = compact_mask(~m.pt_valid, B)
    n_free = jnp.sum(free_ok.astype(jnp.int32))
    order = jnp.cumsum(want_mask.astype(jnp.int32)) - 1   # rank among wanted
    slot = jnp.where(
        want_mask & (order < n_free),
        free_slots[jnp.clip(order, 0, B - 1)],
        INVALID,
    )
    return slot


def add_points(m: MapState, slots, pos, desc, ref_kf, first_kf):
    """Write point data into pre-allocated slots (B,). slots<0 are skipped
    (scattered out of range and dropped)."""
    ok = slots >= 0
    si = jnp.where(ok, slots, m.capacity_pt)  # out-of-range -> dropped
    upd = lambda arr, val: arr.at[si].set(val, mode="drop")
    return m._replace(
        pt_pos=upd(m.pt_pos, pos),
        pt_desc=upd(m.pt_desc, desc),
        pt_valid=m.pt_valid.at[si].set(True, mode="drop"),
        pt_ref_kf=upd(m.pt_ref_kf, jnp.broadcast_to(ref_kf, slots.shape)),
        pt_first_kf=upd(m.pt_first_kf, jnp.broadcast_to(first_kf, slots.shape)),
        pt_visible=m.pt_visible.at[si].set(1, mode="drop"),
        pt_found=m.pt_found.at[si].set(1, mode="drop"),
        # a reallocated slot is a fresh point: clear any old redirect, any
        # stale cached observation count AND the stale cached table row (the
        # incremental table discipline — round 5 — no longer rebuilds the
        # table after point creation, so stale rows must die here)
        pt_forward=m.pt_forward.at[si].set(
            jnp.where(ok, slots, 0), mode="drop"),
        pt_obs_cnt=m.pt_obs_cnt.at[si].set(0, mode="drop"),
        obs_kf=m.obs_kf.at[si].set(INVALID, mode="drop"),
        obs_ft=m.obs_ft.at[si].set(INVALID, mode="drop"),
        next_pt=m.next_pt + jnp.sum(ok.astype(jnp.int32)),
    )


def table_append_keyframe(m: MapState, kf_id) -> MapState:
    """Patch the cached observation table with keyframe kf_id's bindings:
    each point bound in kf_obs[kf_id] gains the entry (kf_id, feat) at the
    first free slot of its row (rows are left-packed; full rows drop the
    entry, the same truncation point_observations applies). One (N,)-entry
    scatter instead of the full table rebuild the keyframe event used to
    pay (~31 ms at K=128/P=16k through the chunked builder, PERF.md r5).

    Caller contract: kf_id's bindings are NOT yet in the table (fresh
    keyframe slot, or a slot whose previous occupant was culled — culling
    rebuilds the table)."""
    P = m.capacity_pt
    row = m.kf_obs[kf_id]                                  # (N,)
    on = row >= 0
    pt = jnp.clip(row, 0, P - 1)
    pos = jnp.sum((m.obs_kf[pt] >= 0).astype(jnp.int32), axis=1)   # (N,)
    keep = on & (pos < OBS_W)
    ridx = jnp.where(keep, pt, P)
    cidx = jnp.where(keep, pos, 0)
    return m._replace(
        obs_kf=m.obs_kf.at[ridx, cidx].set(
            jnp.asarray(kf_id, jnp.int32), mode="drop"),
        obs_ft=m.obs_ft.at[ridx, cidx].set(
            jnp.arange(row.shape[0], dtype=jnp.int32), mode="drop"),
    )


def table_revalidate_points(m: MapState, pt_mask, max_pts: int = 512
                            ) -> MapState:
    """Re-derive the cached table rows of the points in pt_mask (P,) from
    kf_obs (the ground truth): entries whose keyframe no longer binds the
    point are dropped and the row is re-left-packed. Serves the BA outlier
    erasure (a handful of (kf, feat) slots reset to -1 after the solve) at
    the cost of one small gather instead of the full table rebuild; any
    staleness in a flagged row heals, including duplicate erasures on one
    row. Falls back to the full rebuild under a lax.cond when more than
    max_pts points are flagged."""
    P = m.capacity_pt
    K = m.capacity_kf
    n = jnp.sum(pt_mask.astype(jnp.int32))
    sel, ok = compact_mask(pt_mask, max_pts)
    p = jnp.clip(sel, 0, P - 1)

    def fast(m):
        rows_kf = m.obs_kf[p]                              # (B,W)
        rows_ft = m.obs_ft[p]
        on = rows_kf >= 0
        back = m.kf_obs[jnp.clip(rows_kf, 0, K - 1),
                        jnp.clip(rows_ft, 0, m.n_feat - 1)]
        keep = on & (back == p[:, None])
        # cached weighted counts DECREMENT by the dropped entries' weights
        # (not recomputed from the surviving row: a truncated/dangling-dup
        # row undercounts the point's true observation count, and the
        # running counter still carries those — mono culling starves on
        # undercounts, r3 notes)
        dropped = on & ~keep
        wdrop = jnp.where(m.kf_ur[jnp.clip(rows_kf, 0, K - 1),
                                  jnp.clip(rows_ft, 0, m.n_feat - 1)] >= 0,
                          2, 1)
        dec = jnp.sum(jnp.where(dropped, wdrop, 0), axis=1).astype(jnp.int32)
        rows_kf = jnp.where(keep, rows_kf, INVALID)
        rows_ft = jnp.where(keep, rows_ft, INVALID)
        # left-pack the touched rows (valid-first stable order over W)
        order = jnp.argsort(rows_kf < 0, axis=1, stable=True)
        rows_kf = jnp.take_along_axis(rows_kf, order, axis=1)
        rows_ft = jnp.take_along_axis(rows_ft, order, axis=1)
        pi = jnp.where(ok, p, P)
        cnt = jnp.maximum(m.pt_obs_cnt[p] - dec, 0)
        return m._replace(
            obs_kf=m.obs_kf.at[pi].set(rows_kf, mode="drop"),
            obs_ft=m.obs_ft.at[pi].set(rows_ft, mode="drop"),
            pt_obs_cnt=m.pt_obs_cnt.at[pi].set(cnt, mode="drop"))

    def slow(m):
        return refresh_obs_table(m)

    return jax.lax.cond(n > max_pts, slow, fast, m)


def bind_observations(m: MapState, kf_id, feat_idx, point_ids, mask):
    """Set kf_obs[kf_id, feat_idx[b]] = point_ids[b] where mask."""
    fi = jnp.where(mask, feat_idx, m.n_feat)  # masked-out -> dropped
    row = m.kf_obs[kf_id]
    row = row.at[fi].set(point_ids, mode="drop")
    return m._replace(kf_obs=m.kf_obs.at[kf_id].set(row))


def erase_points(m: MapState, point_mask):
    """Invalidate points where point_mask (P,) — `MapPoint::SetBadFlag`
    (`src/MapPoint.cc`): clears every observation referencing them."""
    kill = point_mask & m.pt_valid
    obs_clear = kill[jnp.clip(m.kf_obs, 0, m.capacity_pt - 1)] & (m.kf_obs >= 0)
    return m._replace(
        pt_valid=m.pt_valid & ~kill,
        kf_obs=jnp.where(obs_clear, INVALID, m.kf_obs),
    )


def replace_points(m: MapState, mapping):
    """Point fusion — `MapPoint::Replace`: mapping (P,) gives for each point
    either itself or the id it is replaced by. Observations are redirected;
    where a keyframe already observes the replacement, the duplicate slot is
    cleared. Replaced points become invalid."""
    redirected = jnp.where(m.kf_obs >= 0,
                           mapping[jnp.clip(m.kf_obs, 0, m.capacity_pt - 1)],
                           INVALID)
    # clear duplicates: if a KF row ends up observing a point twice, keep the
    # first occurrence (lowest feature index)
    K, N = redirected.shape
    P = m.capacity_pt
    fidx = jnp.broadcast_to(jnp.arange(N)[None, :], (K, N))
    key = jnp.where(redirected >= 0, fidx, N)
    first = jnp.full((K, P), N, jnp.int32).at[
        jnp.arange(K)[:, None], jnp.clip(redirected, 0, P - 1)
    ].min(key)
    dup = (redirected >= 0) & (
        fidx != first[jnp.arange(K)[:, None], jnp.clip(redirected, 0, P - 1)]
    )
    new_obs = jnp.where(dup, INVALID, redirected)
    replaced = mapping != jnp.arange(P)
    # accumulate found/visible like Replace does
    add_vis = jnp.zeros((P,), jnp.int32).at[jnp.clip(mapping, 0, P - 1)].add(
        jnp.where(replaced, m.pt_visible, 0))
    add_fnd = jnp.zeros((P,), jnp.int32).at[jnp.clip(mapping, 0, P - 1)].add(
        jnp.where(replaced, m.pt_found, 0))
    return m._replace(
        kf_obs=new_obs,
        pt_valid=m.pt_valid & ~replaced,
        pt_visible=m.pt_visible + add_vis,
        pt_found=m.pt_found + add_fnd,
        # compose the forwarding chain: ids handed out earlier (e.g. a
        # pipelined frame's bindings) resolve to the survivor
        pt_forward=mapping[jnp.clip(m.pt_forward, 0, P - 1)],
    )


def erase_points_fast(m: MapState, point_mask, extra_row=None,
                      max_killed: int = 4096):
    """erase_points via the cached observation table: compact the killed set
    and clear exactly its (kf, feat) entries — a (max_killed, OBS_W) scatter
    instead of the full (K,N) incidence sweep. extra_row: a keyframe id whose
    row is additionally swept directly (the just-inserted keyframe, whose
    bindings postdate the table).

    A killed point whose table row is FULL may have >OBS_W observations the
    table doesn't list — clearing only the listed ones leaves dangling
    kf_obs entries that permanently block those features from triangulation
    (this starved monocular mapping, where ratio-culling kills well-observed
    points). Any full-row kill (or >max_killed overflow) falls back to the
    full incidence sweep under a lax.cond — paid only when it happens."""
    K = m.capacity_kf
    P = m.capacity_pt
    kill = point_mask & m.pt_valid
    sel, ok = compact_mask(kill, max_killed)
    rows_kf = m.obs_kf[sel]
    rows_ft = m.obs_ft[sel]
    full_rows = jnp.any(ok & jnp.all(rows_kf >= 0, axis=1))
    overflow = full_rows | (jnp.sum(kill.astype(jnp.int32)) > max_killed)

    def slow(m):
        obs_clear = kill[jnp.clip(m.kf_obs, 0, P - 1)] & (m.kf_obs >= 0)
        return m._replace(kf_obs=jnp.where(obs_clear, INVALID, m.kf_obs))

    def fast(m):
        on = (rows_kf >= 0) & ok[:, None]
        kf_obs = m.kf_obs.at[
            jnp.where(on, rows_kf, K), jnp.where(on, rows_ft, 0)
        ].set(INVALID, mode="drop")
        if extra_row is not None:
            row = kf_obs[extra_row]
            row = jnp.where((row >= 0) & kill[jnp.clip(row, 0, P - 1)],
                            INVALID, row)
            kf_obs = kf_obs.at[extra_row].set(row)
        return m._replace(kf_obs=kf_obs)

    m = jax.lax.cond(overflow, slow, fast, m)
    return m._replace(
        pt_valid=m.pt_valid & ~kill,
        obs_kf=jnp.where(kill[:, None], INVALID, m.obs_kf),
        obs_ft=jnp.where(kill[:, None], INVALID, m.obs_ft),
    )


def replace_points_fast(m: MapState, mapping, max_replaced: int = 2048):
    """Point fusion (`MapPoint::Replace`) via the cached observation table:
    compact the replaced set, rewrite exactly its observations, and patch the
    table rows — instead of redirecting the full (K,N) incidence and building
    a (K,P) first-occurrence matrix.

    Faithful duplicate rule (`src/MapPoint.cc` Replace +
    `KeyFrame::ReplaceMapPointMatch`): where a keyframe already observes the
    replacement, the SOURCE slot is erased (the existing binding wins);
    otherwise the source slot is rewritten to the replacement. mapping must
    be chain-resolved (a->b->c composed to a->c). Replaced points beyond
    max_replaced still lose validity/get forwarded, but their kf_obs entries
    dangle until the end-of-pass rebuild (consumers mask by pt_valid)."""
    K = m.capacity_kf
    P = m.capacity_pt
    W = OBS_W
    replaced = (mapping != jnp.arange(P)) & m.pt_valid
    sel, ok = compact_mask(replaced, max_replaced)
    src = jnp.clip(sel, 0, P - 1)
    tgt = jnp.clip(mapping[src], 0, P - 1)
    s_kf = m.obs_kf[src]
    s_ft = m.obs_ft[src]
    t_kf = m.obs_kf[tgt]
    t_ft = m.obs_ft[tgt]
    s_on = (s_kf >= 0) & ok[:, None]
    t_on = (t_kf >= 0) & ok[:, None]
    dup = jnp.any(
        s_kf[:, :, None] == jnp.where(t_on, t_kf, -2)[:, None, :],
        axis=2) & s_on

    # a replaced source with a FULL table row may hold observations beyond
    # OBS_W: rewrite via the full incidence sweep instead (rare — fusion
    # losers have fewer observations than winners by construction)
    overflow = jnp.any(ok & jnp.all(s_kf >= 0, axis=1)) | \
        (jnp.sum(replaced.astype(jnp.int32)) > max_replaced)

    def slow(kf_obs):
        redirected = jnp.where(
            kf_obs >= 0, mapping[jnp.clip(kf_obs, 0, P - 1)], INVALID)
        # duplicate rule: where the row already held the target, the moved
        # (source) entry is erased — detect entries that CHANGED and collide
        # with an unchanged entry's value via the per-target table row
        changed = redirected != kf_obs
        trow = m.obs_kf[jnp.clip(redirected, 0, P - 1)]       # (K,N,W)
        krow = jnp.arange(K, dtype=jnp.int32)[:, None, None]
        already = jnp.any((trow == krow) & (trow >= 0), axis=-1)
        dup_entry = changed & (kf_obs >= 0) & already
        return jnp.where(dup_entry, INVALID, redirected)

    def fast(kf_obs):
        newval = jnp.where(dup, INVALID, tgt[:, None])
        return kf_obs.at[
            jnp.where(s_on, s_kf, K), jnp.where(s_on, s_ft, 0)
        ].set(jnp.broadcast_to(newval, s_kf.shape), mode="drop")

    kf_obs = jax.lax.cond(overflow, slow, fast, m.kf_obs)

    # patch the table: target rows gain the source's non-duplicate entries
    add_kf = jnp.where(s_on & ~dup, s_kf, INVALID)
    add_ft = jnp.where(s_on & ~dup, s_ft, INVALID)
    merged_kf = jnp.concatenate([jnp.where(t_on, t_kf, INVALID), add_kf], 1)
    merged_ft = jnp.concatenate([jnp.where(t_on, t_ft, INVALID), add_ft], 1)
    order = jnp.argsort(merged_kf < 0, axis=1, stable=True)       # valid first
    mk = jnp.take_along_axis(merged_kf, order, axis=1)[:, :W]
    mf = jnp.take_along_axis(merged_ft, order, axis=1)[:, :W]
    ti = jnp.where(ok, tgt, P)
    obs_kf = m.obs_kf.at[ti].set(mk, mode="drop")
    obs_ft = m.obs_ft.at[ti].set(mf, mode="drop")
    blank = jnp.full((max_replaced, W), INVALID, jnp.int32)
    si = jnp.where(ok, src, P)
    obs_kf = obs_kf.at[si].set(blank, mode="drop")
    obs_ft = obs_ft.at[si].set(blank, mode="drop")

    # counters: survivors accumulate the replaced points' visible/found and
    # observation weights (AddObservation semantics for the moved entries)
    vis_add = jnp.zeros((P,), jnp.int32).at[ti].add(
        jnp.where(ok, m.pt_visible[src], 0), mode="drop")
    fnd_add = jnp.zeros((P,), jnp.int32).at[ti].add(
        jnp.where(ok, m.pt_found[src], 0), mode="drop")
    w_add = jnp.where(
        (add_kf >= 0),
        jnp.where(m.kf_ur[jnp.clip(add_kf, 0, K - 1),
                          jnp.clip(add_ft, 0, m.n_feat - 1)] >= 0, 2, 1), 0)
    cnt_add = jnp.zeros((P,), jnp.int32).at[ti].add(
        jnp.sum(w_add, axis=1), mode="drop")

    return m._replace(
        kf_obs=kf_obs,
        obs_kf=obs_kf,
        obs_ft=obs_ft,
        pt_valid=m.pt_valid & ~replaced,
        pt_visible=m.pt_visible + vis_add,
        pt_found=m.pt_found + fnd_add,
        pt_obs_cnt=m.pt_obs_cnt + cnt_add,
        pt_forward=mapping[jnp.clip(m.pt_forward, 0, P - 1)],
    )


# ---------------------------------------------------------------------------
# Derived point-major views
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_obs", "chunk"))
def point_observations(m: MapState, max_obs: int = 16, chunk: int = 32):
    """Build point-major observation lists from kf_obs: returns
    (obs_kf, obs_feat, obs_valid), each (P, max_obs). Points with more than
    max_obs observations keep the first max_obs by (kf, feat) order.

    Processed in keyframe CHUNKS with empty chunks skipped at runtime
    (lax.cond): keyframe slots are allocated lowest-first (add_keyframe's
    argmin), so a map with V valid keyframes only pays for ceil(V/chunk)
    chunks. The flat single-sort version sorted + scattered the full K*N
    incidence (1M entries at K=512/N=2048 — ~76 ms/call on TPU v5e, and it
    ran several times per keyframe event)."""
    K, N = m.kf_obs.shape
    P = m.capacity_pt
    chunk = min(chunk, K)
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    kf_obs = m.kf_obs if Kp == K else jnp.concatenate(
        [m.kf_obs, jnp.full((Kp - K, N), INVALID, jnp.int32)])
    kf_valid = m.kf_valid if Kp == K else jnp.concatenate(
        [m.kf_valid, jnp.zeros((Kp - K,), bool)])
    rows_c = kf_obs.reshape(n_chunks, chunk, N)
    valid_c = kf_valid.reshape(n_chunks, chunk)
    k0_c = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def body(carry, inp):
        rows, vmask, k0 = inp

        def work(carry):
            # SORT-FREE within-chunk placement: a keyframe observes a point
            # at most once (row-unique invariant), so the slot of entry
            # (r, i) observing p is fill[p] + (# rows r' < r in this chunk
            # observing p) — an exclusive row-prefix of the presence
            # histogram. TPU sorts cost ~3x the two scatters this needs.
            obs_kf, obs_ft, fill = carry
            r_iota = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
            on = rows >= 0
            pt = jnp.clip(rows, 0, P - 1)
            H = jnp.zeros((chunk, P), jnp.int32).at[
                jnp.where(on, r_iota, chunk), pt
            ].set(1, mode="drop")
            Cex = jnp.cumsum(H, axis=0) - H                   # exclusive
            pos = fill[pt] + Cex[jnp.clip(r_iota, 0, chunk - 1), pt]
            keep = on & (pos < max_obs)
            ridx = jnp.where(keep, pt, P)
            cidx = jnp.where(keep, jnp.clip(pos, 0, max_obs - 1), 0)
            obs_kf = obs_kf.at[ridx, cidx].set(k0 + r_iota, mode="drop")
            obs_ft = obs_ft.at[ridx, cidx].set(
                jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1),
                mode="drop")
            fill = fill + jnp.sum(H, axis=0)
            return obs_kf, obs_ft, fill

        carry = jax.lax.cond(jnp.any(vmask), work, lambda c: c, carry)
        return carry, ()

    obs_kf0 = jnp.full((P, max_obs), INVALID, jnp.int32)
    obs_ft0 = jnp.full((P, max_obs), INVALID, jnp.int32)
    fill0 = jnp.zeros((P,), jnp.int32)
    (obs_kf, obs_ft, _), _ = jax.lax.scan(
        body, (obs_kf0, obs_ft0, fill0), (rows_c, valid_c, k0_c))
    return obs_kf, obs_ft, obs_kf >= 0


def refresh_obs_table(m: MapState, obs=None) -> MapState:
    """Rebuild the cached point-major observation table (and the weighted
    counts) from kf_obs. Call after bulk observation mutations outside the
    standard keyframe event (loop-closure fusion, manual map construction,
    checkpoint load); keyframe insertion and the mapping finale refresh it
    themselves."""
    if obs is None:
        obs = point_observations(m, OBS_W)
    obs_kf, obs_ft, _ = obs
    m = m._replace(obs_kf=obs_kf[:, :OBS_W], obs_ft=obs_ft[:, :OBS_W])
    return m._replace(pt_obs_cnt=obs_table_counts(
        m, (m.obs_kf, m.obs_ft, m.obs_kf >= 0)))


def incidence_counts(m: MapState, ind, chunk: int = 64):
    """(K,) per-keyframe sums of a point indicator over the observation
    incidence: w[k] = sum_i ind[kf_obs[k, i]]. EXACT (no observation-table
    truncation — covisibility weights feed the w>=100 essential-graph edge
    set and the w>=15 neighbor sets, where undercounting breaks loop
    closing), but chunk-skipped like point_observations: only chunks holding
    valid keyframes pay their (chunk*N) gather."""
    K, N = m.kf_obs.shape
    P = m.capacity_pt
    chunk = min(chunk, K)
    n_chunks = -(-K // chunk)
    Kp = n_chunks * chunk
    kf_obs = m.kf_obs if Kp == K else jnp.concatenate(
        [m.kf_obs, jnp.full((Kp - K, N), INVALID, jnp.int32)])
    kf_valid = m.kf_valid if Kp == K else jnp.concatenate(
        [m.kf_valid, jnp.zeros((Kp - K,), bool)])
    rows_c = kf_obs.reshape(n_chunks, chunk, N)
    valid_c = kf_valid.reshape(n_chunks, chunk)

    def body(carry, inp):
        rows, vmask = inp

        def work(_):
            g = ind[jnp.clip(rows, 0, P - 1)]
            return jnp.sum(jnp.where(rows >= 0, g, 0), axis=1).astype(
                jnp.int32)

        w = jax.lax.cond(jnp.any(vmask), work,
                         lambda _: jnp.zeros((chunk,), jnp.int32), None)
        return carry, w

    _, w = jax.lax.scan(body, (), (rows_c, valid_c))
    return w.reshape(Kp)[:K]


def shared_observers(m: MapState, point_ids, point_mask):
    """(K,) count of the given map points observed per keyframe — EXACT via
    incidence_counts (the cached table caps at OBS_W observers per point and
    undercounts covisibility in revisit regions)."""
    P = m.capacity_pt
    ind = jnp.zeros((P,), jnp.int32).at[
        jnp.where(point_mask, point_ids, P)].max(1, mode="drop")
    return incidence_counts(m, ind)


def obs_table_counts(m: MapState, obs) -> jnp.ndarray:
    """Weighted observation counts (+1 mono / +2 stereo, like nObs) derived
    from an existing point_observations table — no K*N scatter. Counts
    saturate at the table width (max_obs), which is above every consumer's
    threshold (2/3 for culling and keyframe_stats, winner-picking in fusion)."""
    obs_kf, obs_ft, obs_on = obs
    kfc = jnp.clip(obs_kf, 0, m.capacity_kf - 1)
    ftc = jnp.clip(obs_ft, 0, m.n_feat - 1)
    w = jnp.where(m.kf_ur[kfc, ftc] >= 0, 2, 1)
    return jnp.sum(jnp.where(obs_on, w, 0), axis=-1).astype(jnp.int32)


def compact_mask(mask, size: int):
    """Indices of the first `size` True entries of mask (ascending order).
    Returns (idx (size,) int32 — in-range, 0-filled past the end; valid
    (size,) bool). One cumsum + one scatter: replaces argsort-over-capacity
    compactions (a P-element bitonic sort per call on TPU)."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.zeros((size,), jnp.int32).at[
        jnp.where(mask & (rank < size), rank, size)
    ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    valid = jnp.arange(size) < jnp.sum(mask.astype(jnp.int32))
    return idx, valid


def count_observations(m: MapState):
    """(P,) observation count weighted like nObs: +1 mono, +2 stereo
    (`MapPoint::AddObservation`, `include/MapPoint.h:116-130`)."""
    P = m.capacity_pt
    w = jnp.where(m.kf_ur >= 0, 2, 1)
    cnt = jnp.zeros((P,), jnp.int32).at[
        jnp.where(m.kf_obs >= 0, m.kf_obs, P)
    ].add(jnp.where(m.kf_obs >= 0, w, 0), mode="drop")
    return cnt


def refresh_obs_count(m: MapState) -> MapState:
    """Recompute the cached pt_obs_cnt snapshot (call after bulk observation
    mutations: keyframe insertion, the mapping pass, loop correction)."""
    return m._replace(pt_obs_cnt=count_observations(m))


def update_point_descriptors(m: MapState, point_mask, max_obs: int = 16,
                             obs=None):
    """Distinctive descriptor = min-median-Hamming among observations
    (`MapPoint::ComputeDistinctiveDescriptors`). Batched for points in mask.
    obs: optional precomputed point_observations(m, max_obs) to share the
    (K*N)-element sort with other consumers."""
    obs_kf, obs_ft, obs_ok = obs if obs is not None else \
        point_observations(m, max_obs)
    kfc = jnp.clip(obs_kf, 0, m.capacity_kf - 1)
    ftc = jnp.clip(obs_ft, 0, m.n_feat - 1)
    descs = m.kf_desc[kfc, ftc]                        # (P, O, 8)
    x = jnp.bitwise_xor(descs[:, :, None, :], descs[:, None, :, :])
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)  # (P,O,O)
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    dist = jnp.where(pair_ok, dist, 512)
    # median distance per candidate row (among valid obs)
    srt = jnp.sort(dist, axis=-1)
    n_obs = jnp.sum(obs_ok, axis=-1)
    med_idx = jnp.clip((n_obs[:, None] - 1) // 2, 0, max_obs - 1)
    med = jnp.take_along_axis(srt, med_idx[:, :, None], axis=-1)[..., 0]  # (P,O)
    med = jnp.where(obs_ok, med, 1 << 20)
    best = jnp.argmin(med, axis=-1)                    # (P,)
    new_desc = descs[jnp.arange(m.capacity_pt), best]
    use = point_mask & m.pt_valid & (n_obs > 0)
    return m._replace(pt_desc=jnp.where(use[:, None], new_desc, m.pt_desc))


def update_point_normals(m: MapState, point_mask, scale_factors,
                         max_obs: int = 16, obs=None):
    """Mean viewing direction + scale-invariance distance band
    (`MapPoint::UpdateNormalAndDepth`, `src/MapPoint.cc`)."""
    from ..geometry import se3

    obs_kf, obs_ft, obs_ok = obs if obs is not None else \
        point_observations(m, max_obs)
    kfc = jnp.clip(obs_kf, 0, m.capacity_kf - 1)
    Twc = se3.inverse(m.kf_pose)
    centers = se3.translation(Twc)                     # (K,3) camera centers
    cam_of_obs = centers[kfc]                          # (P,O,3)
    d = m.pt_pos[:, None, :] - cam_of_obs
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    n_obs = jnp.maximum(jnp.sum(obs_ok, axis=-1), 1)
    normal = jnp.sum(jnp.where(obs_ok[..., None], d, 0.0), axis=1) / n_obs[:, None]

    sf = jnp.asarray(scale_factors, jnp.float32)
    n_levels = sf.shape[0]
    ref = jnp.clip(m.pt_ref_kf, 0, m.capacity_kf - 1)
    dist_ref = jnp.linalg.norm(m.pt_pos - centers[ref], axis=-1)
    # level of the observing feature in the ref keyframe: find the obs whose
    # kf == ref (first match), else level 0
    is_ref = obs_ok & (obs_kf == m.pt_ref_kf[:, None])
    ftc = jnp.clip(obs_ft, 0, m.n_feat - 1)
    levels = m.kf_level[kfc, ftc]
    ref_level = jnp.max(jnp.where(is_ref, levels, 0), axis=-1)
    level_sf = sf[jnp.clip(ref_level, 0, n_levels - 1)]
    max_dist = dist_ref * level_sf
    min_dist = max_dist / sf[n_levels - 1]
    use = point_mask & m.pt_valid
    return m._replace(
        pt_normal=jnp.where(use[:, None], normal, m.pt_normal),
        pt_max_dist=jnp.where(use, max_dist, m.pt_max_dist),
        pt_min_dist=jnp.where(use, min_dist, m.pt_min_dist),
    )


def predict_scale(m: MapState, dist, log_scale_factor: float, n_levels: int):
    """`MapPoint::PredictScale` (`src/MapPoint.cc`): level from distance ratio."""
    ratio = m.pt_max_dist / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale_factor)
    return jnp.clip(lvl.astype(jnp.int32), 0, n_levels - 1)
