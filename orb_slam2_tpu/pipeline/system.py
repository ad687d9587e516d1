"""System facade + tracking state machine + staged local mapping.

Replaces `System` / `Tracking` / `LocalMapping` orchestration
(`src/System.cc:18-147`, `src/Tracking.cc:431-767`, `src/LocalMapping.cc:71-159`).
The reference's 3 threads + queues + ~15 mutexes become a deterministic staged
schedule: every tracked frame runs the jitted tracking steps; keyframe
insertion immediately runs the jitted mapping stages (cull -> triangulate ->
fuse -> local BA -> KF cull) on the new map snapshot. All heavy work is on
device; this class only sequences jitted calls and keeps small host state.
"""
from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..bow import database as bow_db
from ..bow import vocabulary as bow_voc
from ..geometry import se3
from ..mapstate import map as mapstate
from ..ops import matching
from ..solvers import initializer, pnp, pose_opt, schur_ba
from ..utils.config import SlamConfig, SENSOR_MONOCULAR
from . import frame as frame_mod
from . import loop_closing, mapping_ops, tracking_ops, tracking_step
from .frame import FrameData

NOT_INITIALIZED = 0
OK = 1
LOST = 2

INVALID = -1


class _Pending:
    """Sentinel returned by the pipelined stream while a frame's result is
    still in flight (truthy: the frame was dispatched, not lost)."""
    def __repr__(self):
        return "<pose pending>"

    def __bool__(self):
        return True


PENDING = _Pending()


_TRUE = None   # cached device-resident True (avoids one transfer per frame)


def _true():
    global _TRUE
    if _TRUE is None:
        _TRUE = jnp.asarray(True)
    return _TRUE


def _unpack(pk: np.ndarray):
    """Split the fused step's (42,) retire payload into
    (scalars int (10,), Tcw (4,4), T_rel (4,4))."""
    sc = pk[:10].astype(np.int64)
    return sc, pk[10:26].reshape(4, 4), pk[26:42].reshape(4, 4)


@dataclass
class TrajectoryEntry:
    timestamp: float
    T_rel: np.ndarray      # Tcw * inv(T_ref_kf) at track time
    ref_kf: int
    lost: bool


class SlamSystem:
    """Facade: construct once, call track_* per frame, then get_trajectory()."""

    def __init__(self, cfg: SlamConfig, vocabulary=None, enable_loop_closing=True,
                 gba_mesh=None, pipeline_depth: int = 0,
                 mapping_device=None):
        self.cfg = cfg
        # Two-chip pipeline split (SURVEY P1/P7): with `mapping_device` set
        # and the pipelined stream active, every keyframe's mapping pass
        # (cull/triangulate/fuse/local BA) is dispatched to that device and
        # its result adopted at the NEXT retire — tracking keeps streaming
        # on the pre-keyframe snapshot meanwhile, exactly the reference's
        # tracking-thread/mapping-thread relaxation across two chips. The
        # pure MapState -> MapState mapping pass makes the split a pure
        # dataflow edge (no locks to translate).
        self.mapping_device = mapping_device
        self.tracking_device = None
        if mapping_device is not None:
            import jax as _jax
            self.tracking_device = _jax.devices()[0]
        self._pending_mapping = None
        # pipeline_depth > 0 enables the software-pipelined tracking stream:
        # dispatch frame i, retire frame i-depth (read its scalars, run the
        # keyframe decision). The device runs ahead of the host, hiding the
        # dispatch/readback round trip — the same relaxation the reference
        # makes by running LocalMapping in a separate thread (a tracked frame
        # often doesn't see the keyframe its predecessor spawned,
        # src/LocalMapping.cc:71-159). 0 = fully synchronous.
        self.pipeline_depth = int(pipeline_depth)
        self._pending = deque()   # in-flight (timestamp, frame_id, res)
        self._chain = None        # device-resident next-step inputs
        self.cam = cfg.camera()
        self.m = mapstate.empty(cfg.max_keyframes, cfg.max_map_points,
                                cfg.max_keypoints)
        # Place recognition: vocabulary either injected (e.g. converted
        # ORBvoc.txt) or trained on the fly from early frames' descriptors
        # (System ctor loads the vocabulary up front, src/System.cc:58-77).
        self.voc = vocabulary
        self.db = (bow_db.BowDatabase.empty(cfg.max_keyframes,
                                            cfg.max_keypoints)
                   if self.voc is not None else None)
        self._voc_train_desc = []
        self.enable_loop_closing = enable_loop_closing
        self.gba_mesh = gba_mesh
        self.loop_state = loop_closing.LoopState()
        self.n_loops_closed = 0
        self.localization_only = False
        self.state = NOT_INITIALIZED
        self.velocity: Optional[np.ndarray] = None
        self.last_Tcw: Optional[np.ndarray] = None
        self.last_frame: Optional[FrameData] = None
        self.last_pts = None          # (N,3) 3D for last frame features
        self.last_pts_valid = None
        self.last_matched_pt = None   # (N,) map point ids of last frame
        self.ref_kf = 0
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.last_reloc_frame_id = -(1 << 30)
        self._n_kf_host = None      # host mirror of n_keyframes (lazy)
        self._kf_seq_host = 0       # host mirror of m.next_kf (loop-gap gate)
        self._kf_blackout_fid = -1  # stream: frames dispatched before the
                                    # last KF insertion skip the KF decision
                                    # (their ref-matches stats predate the
                                    # map update — the reference equivalently
                                    # skips NeedNewKeyFrame while the mapper
                                    # is busy, src/Tracking.cc:1561-1567)
        self.init_frame: Optional[FrameData] = None
        self.trajectory: List[TrajectoryEntry] = []
        self.n_inliers = 0
        self._kfs_since_gba = 0
        self._gba_chunks_left = 0
        self.metrics: List[dict] = []
        self.stage_ms: dict = {}   # wall ms of the last KF's pipeline stages

    # ------------------------------------------------------------------
    # public entry points (System::TrackMonocular/Stereo/RGBD)
    # ------------------------------------------------------------------

    def track_monocular(self, img, timestamp: float):
        # dtype preserved: uint8 input uploads 4x less and converts on device;
        # before initialization the extraction budget doubles (reference's
        # mpIniORBextractor, src/Tracking.cc:188-190,398)
        if self.state == OK:
            images = (jnp.asarray(img),)
            if self.pipeline_depth > 0:
                return self._track_stream(images, timestamp, "mono")
            return self._track(None, timestamp, images=images, sensor="mono")
        self._flush_pipeline()
        f = frame_mod.make_frame_monocular(
            jnp.asarray(img), self.cfg, init=self.state == NOT_INITIALIZED)
        return self._track(f, timestamp)

    def track_stereo(self, img_left, img_right, timestamp: float):
        if self.state == OK:
            images = (jnp.asarray(img_left), jnp.asarray(img_right))
            if self.pipeline_depth > 0:
                return self._track_stream(images, timestamp, "stereo")
            return self._track(None, timestamp, images=images, sensor="stereo")
        self._flush_pipeline()
        f = frame_mod.make_frame_stereo(
            jnp.asarray(img_left), jnp.asarray(img_right), self.cfg)
        return self._track(f, timestamp)

    def track_rgbd(self, img, depth, timestamp: float):
        if self.state == OK:
            images = (jnp.asarray(img), jnp.asarray(depth))
            if self.pipeline_depth > 0:
                return self._track_stream(images, timestamp, "rgbd")
            return self._track(None, timestamp, images=images, sensor="rgbd")
        self._flush_pipeline()
        f = frame_mod.make_frame_rgbd(
            jnp.asarray(img), jnp.asarray(depth), self.cfg)
        return self._track(f, timestamp)

    # ------------------------------------------------------------------

    def _track(self, f: Optional[FrameData], timestamp: float, images=None,
               sensor=None):
        if self.state == NOT_INITIALIZED:
            Tcw = self._initialize(f, timestamp)
        else:
            Tcw = self._track_frame(f, timestamp, images=images, sensor=sensor)
        self.frame_id += 1
        return Tcw

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def _initialize(self, f: FrameData, timestamp: float):
        if self.cfg.sensor == SENSOR_MONOCULAR:
            return self._initialize_monocular(f, timestamp)
        return self._initialize_depth(f, timestamp)

    def _initialize_depth(self, f: FrameData, timestamp: float):
        """StereoInitialization (src/Tracking.cc:774-860): need >500 features
        (scaled to the configured budget), create KF0 with a map point per
        depth measurement."""
        n = int(f.n)
        if n <= min(500, self.cfg.n_features // 2):
            return None
        Tcw = jnp.eye(4)
        matched = jnp.full((self.cfg.max_keypoints,), INVALID, jnp.int32)
        self.m, kf_id = mapping_ops.insert_keyframe(
            self.cfg, self.m, f, Tcw, matched, self.frame_id, timestamp,
            all_depth=True)
        self.ref_kf = int(kf_id)
        self.last_kf_frame_id = self.frame_id
        self._kf_seq_host += 1
        self._n_kf_host = None
        self.state = OK
        self._set_last(f, Tcw, self.m.kf_obs[kf_id])
        self.velocity = None
        self._on_keyframe_inserted(int(kf_id), f)
        self._record(timestamp, np.asarray(Tcw), self.ref_kf, False)
        return np.asarray(Tcw)

    def _initialize_monocular(self, f: FrameData, timestamp: float):
        """MonocularInitialization (src/Tracking.cc:864-944)."""
        if self.init_frame is None or int(f.n) <= 100:
            self.init_frame = f if int(f.n) > 100 else None
            self.init_ts = timestamp
            return None
        ref = self.init_frame
        mm = matching.search_for_initialization(
            ref.xy, ref.level, ref.desc, ref.valid, ref.angle,
            f.xy, f.level, f.desc, f.valid, f.angle)
        n_matches = int(jnp.sum(mm.valid))
        if n_matches < 100:
            self.init_frame = None
            return None
        p1 = ref.xy
        p2 = f.xy[jnp.clip(mm.idx, 0, f.xy.shape[0] - 1)]
        res = initializer.initialize(
            p1, p2, mm.valid, float(self.cfg.fx), float(self.cfg.fy),
            float(self.cfg.cx), float(self.cfg.cy),
            key=jax.random.PRNGKey(self.frame_id))
        if not bool(res.success):
            return None

        # --- CreateInitialMapMonocular (src/Tracking.cc:944-1127) ---
        T0 = jnp.eye(4)
        T1 = se3.make(res.R21, res.t21)
        good = np.asarray(res.good)
        N = self.cfg.max_keypoints
        matched0 = jnp.full((N,), INVALID, jnp.int32)
        m, kf0 = mapstate.add_keyframe(
            self.m, T0, ref.xy, ref.level, ref.angle, ref.desc, ref.ur,
            ref.depth, ref.valid, matched0, self.frame_id - 1, self.init_ts)
        m, kf1 = mapstate.add_keyframe(
            m, T1, f.xy, f.level, f.angle, f.desc, f.ur, f.depth, f.valid,
            matched0, self.frame_id, timestamp)
        slots = mapstate.allocate_points(m, res.good)
        m = mapstate.add_points(m, slots, res.points, ref.desc, kf0, 0)
        okc = res.good & (slots >= 0)
        m = mapstate.bind_observations(m, kf0, jnp.arange(N), slots, okc)
        m = mapstate.bind_observations(m, kf1, mm.idx, slots, okc & mm.valid)
        m = mapstate.update_connections(m, kf1)
        pmask = jnp.zeros((m.capacity_pt,), bool).at[
            jnp.where(okc, slots, m.capacity_pt)].set(True, mode="drop")
        m = mapstate.update_point_descriptors(m, pmask)
        m = mapstate.update_point_normals(m, pmask, self.cfg.scale_factors)

        m = mapstate.refresh_obs_table(m)
        # full BA on the two views (reference: GBA 20 iters)
        m = self._two_view_ba(m, kf0, kf1)

        # scale by inverse median depth of KF0
        obs0 = m.kf_obs[kf0]
        pos = m.pt_pos[jnp.clip(obs0, 0, m.capacity_pt - 1)]
        z = jnp.where(obs0 >= 0, pos[:, 2], jnp.inf)
        zs = jnp.sort(z)
        nv = int(jnp.sum((obs0 >= 0).astype(jnp.int32)))
        if nv < 50:
            return None
        med = float(zs[nv // 2])
        if med <= 0:
            return None
        inv_med = 1.0 / med
        T1b = np.array(m.kf_pose[kf1])
        T1b[:3, 3] *= inv_med
        m = m._replace(
            kf_pose=m.kf_pose.at[kf1].set(jnp.asarray(T1b)),
            pt_pos=jnp.where(m.pt_valid[:, None], m.pt_pos * inv_med, m.pt_pos))

        self.m = m
        self.state = OK
        self.ref_kf = int(kf1)
        self.last_kf_frame_id = self.frame_id
        self._kf_seq_host += 2
        self._n_kf_host = None
        Tcw = m.kf_pose[kf1]
        self._set_last(f, Tcw, m.kf_obs[kf1])
        self.velocity = None
        self._on_keyframe_inserted(int(kf0), ref)
        self._on_keyframe_inserted(int(kf1), f)
        self._record(self.init_ts, np.eye(4), int(kf0), False)
        self._record(timestamp, np.eye(4), int(kf1), False)
        return np.asarray(Tcw)

    def _two_view_ba(self, m, kf0, kf1):
        C = 2
        Q = self.cfg.max_keypoints
        obs_kf, obs_ft, obs_on = mapstate.point_observations(m, max_obs=4)
        order = jnp.argsort(~m.pt_valid, stable=True)
        sel = order[:Q]
        sel_ok = m.pt_valid[sel]
        okf = obs_kf[sel][:, :2]
        oft = obs_ft[sel][:, :2]
        oon = obs_on[sel][:, :2]
        slot = jnp.where(okf == kf0, 0, jnp.where(okf == kf1, 1, INVALID))
        slot = jnp.where(oon, slot, INVALID)
        kfc = jnp.clip(okf, 0, m.capacity_kf - 1)
        ftc = jnp.clip(oft, 0, m.n_feat - 1)
        xy = m.kf_xy[kfc, ftc]
        ur = m.kf_ur[kfc, ftc]
        lvl = m.kf_level[kfc, ftc]
        prob = schur_ba.BAProblem(
            poses=jnp.stack([m.kf_pose[kf0], m.kf_pose[kf1]]),
            cam_valid=jnp.ones(2, bool),
            cam_fixed=jnp.asarray([True, False]),
            points=m.pt_pos[sel], pt_valid=sel_ok,
            obs_cam=slot, obs_uvr=jnp.concatenate([xy, ur[..., None]], -1),
            obs_level=lvl)
        res = schur_ba.solve_ba(self.cam, prob, self.cfg.level_sigma2,
                                iters_a=10, iters_b=10)
        m = m._replace(
            kf_pose=m.kf_pose.at[kf1].set(res.poses[1]),
            pt_pos=m.pt_pos.at[jnp.where(sel_ok, sel, m.capacity_pt)].set(
                res.points, mode="drop"))
        return m

    # ------------------------------------------------------------------
    # Per-frame tracking
    # ------------------------------------------------------------------

    def _set_last(self, f: FrameData, Tcw, matched_pt):
        """Prepare last-frame 3D points for the next motion-model step:
        matched map points, plus temporal VO points from close stereo depth
        (UpdateLastFrame, src/Tracking.cc:1228-1330)."""
        self.last_frame = f
        self.last_Tcw = np.asarray(Tcw)
        matched_pt = jnp.asarray(matched_pt)
        self.last_matched_pt = matched_pt
        pos = self.m.pt_pos[jnp.clip(matched_pt, 0, self.m.capacity_pt - 1)]
        # mask bindings whose point was culled/fused away by the mapping pass
        has_pt = (matched_pt >= 0) & self.m.pt_valid[
            jnp.clip(matched_pt, 0, self.m.capacity_pt - 1)]
        if self.cfg.sensor != SENSOR_MONOCULAR:
            cam = self.cam
            z = jnp.maximum(f.depth, 1e-6)
            x = (f.xy[:, 0] - cam.cx) / cam.fx * z
            y = (f.xy[:, 1] - cam.cy) / cam.fy * z
            pc = jnp.stack([x, y, z], axis=-1)
            pw = se3.apply(se3.inverse(jnp.asarray(Tcw)), pc)
            close = (f.depth > 0) & (f.depth < self.cfg.th_depth * self.cfg.baseline)
            temporal = close & ~has_pt & f.valid
            pos = jnp.where(temporal[:, None], pw, pos)
            valid = has_pt | temporal
        else:
            valid = has_pt
        self.last_pts = pos
        self.last_pts_valid = valid

    def _track_frame(self, f: Optional[FrameData], timestamp: float,
                     images=None, sensor=None):
        cfg = self.cfg

        if self.state == LOST:
            T_r, m_r, reloc_kf, ok = self._relocalize(f)
            if not ok:
                self._record(timestamp, np.eye(4), self.ref_kf, True)
                self.metrics.append(dict(frame=self.frame_id, state="LOST",
                                         inliers=0))
                return None
            # re-enter normal tracking from the relocalized pose
            self.last_Tcw = np.asarray(T_r)
            self.velocity = None
            self.last_matched_pt = m_r
            self.last_frame = f
            self.last_pts = self.m.pt_pos[
                jnp.clip(m_r, 0, self.m.capacity_pt - 1)]
            self.last_pts_valid = m_r >= 0
            self.state = OK
            self.ref_kf = reloc_kf
            self.last_reloc_frame_id = self.frame_id
            # the relocalized frame IS tracked: record its true relative pose
            # (the reference only marks genuinely lost frames with mbLost,
            # src/Tracking.cc:714-751)
            T_ref = np.asarray(self.m.kf_pose[reloc_kf])
            self._record(timestamp, np.asarray(T_r) @ np.linalg.inv(T_ref),
                         reloc_kf, False)
            return np.asarray(T_r)

        has_vel = self.velocity is not None
        vel = jnp.asarray(self.velocity if has_vel else np.eye(4, dtype=np.float32))
        recently_reloc = self.frame_id < self.last_reloc_frame_id + int(cfg.fps)
        # inlier floor is 50 for one second after a relocalization
        # (src/Tracking.cc:1471-1477)
        min_inl = 50 if recently_reloc else 30
        if images is not None:
            # steady-state fast path: extraction fused into the step — ONE
            # device dispatch per tracked frame
            res = tracking_step.full_tracking_step_from_images(
                cfg, self.m, images, self.last_frame, self.last_pts,
                self.last_pts_valid, self.last_matched_pt,
                jnp.asarray(self.last_Tcw), vel, jnp.asarray(has_vel),
                jnp.asarray(self.ref_kf), min_inl, sensor)
            f = res.frame
        else:
            res = tracking_step.full_tracking_step(
                cfg, self.m, f, self.last_frame, self.last_pts,
                self.last_pts_valid, self.last_matched_pt,
                jnp.asarray(self.last_Tcw), vel, jnp.asarray(has_vel),
                jnp.asarray(self.ref_kf), min_inl)
        self.m = res.m
        sc, Tcw, T_rel = _unpack(jax.device_get(res.packed))
        ok = bool(sc[0])
        n_local_inl = int(sc[3])
        self.ref_kf = int(sc[8])
        self.n_inliers = n_local_inl

        if not ok and self.localization_only and bool(sc[9]) and int(sc[2]) >= 10:
            # mbVO: map matches collapsed but visual odometry still holds
            # (temporal points carry the pose) — keep the VO pose and try to
            # relocalize on the spot (src/Tracking.cc:533-560, 1018-1090)
            T_r, m_r, reloc_kf, r_ok = self._relocalize(f)
            if r_ok:
                self.last_Tcw = np.asarray(T_r)
                self.velocity = None
                self.last_matched_pt = m_r
                self.last_frame = f
                self.last_pts = self.m.pt_pos[
                    jnp.clip(m_r, 0, self.m.capacity_pt - 1)]
                self.last_pts_valid = m_r >= 0
                self.state = OK
                self.ref_kf = reloc_kf
                self.last_reloc_frame_id = self.frame_id
                T_ref = np.asarray(self.m.kf_pose[reloc_kf])
                self._record(timestamp,
                             np.asarray(T_r) @ np.linalg.inv(T_ref),
                             reloc_kf, False)
                self.metrics.append(dict(frame=self.frame_id, state="OK",
                                         inliers=n_local_inl, vo=False,
                                         relocalized=True))
                return np.asarray(T_r)
            # no reloc yet: continue on odometry alone
            self.state = OK
            if self.last_Tcw is not None:
                self.velocity = Tcw @ np.linalg.inv(self.last_Tcw)
            self.last_frame = f
            self.last_Tcw = Tcw
            self.last_matched_pt = res.matched_pt
            self.last_pts = res.next_pts
            self.last_pts_valid = res.next_pts_valid
            self._record(timestamp, T_rel, self.ref_kf, False)
            self.metrics.append(dict(frame=self.frame_id, state="OK",
                                     inliers=n_local_inl, vo=True))
            return Tcw

        if not ok:
            if (not self.localization_only and
                    int(self._nkf_cache()) <= 5):
                # lost right after initialization: scrap the thin map and
                # start over (src/Tracking.cc:726-735)
                self.reset()
                self._record(timestamp, np.eye(4), 0, True)
                self.metrics.append(dict(frame=self.frame_id, state="RESET",
                                         inliers=n_local_inl))
                return None
            self.state = LOST
            self._record(timestamp, np.eye(4), self.ref_kf, True)
            self.metrics.append(dict(frame=self.frame_id, state="LOST",
                                     inliers=n_local_inl))
            return None

        self.state = OK
        if self.last_Tcw is not None:
            self.velocity = Tcw @ np.linalg.inv(self.last_Tcw)
        if self.voc is None:
            # keep collecting training descriptors from every tracked frame
            # until the on-the-fly vocabulary can be built (the reference
            # instead loads ORBvoc.txt up front, src/System.cc:58-77)
            self._ensure_vocabulary(f)

        matched_pt = res.matched_pt
        need_kf = (not self.localization_only and
                   self._need_kf_from_scalars(sc))
        if need_kf:
            Tcw, matched_pt, _ = self._handle_keyframe(
                f, Tcw, matched_pt, self.frame_id, timestamp)
            self._set_last(f, Tcw, matched_pt)
            T_ref = np.asarray(self.m.kf_pose[self.ref_kf])
            T_rel = Tcw @ np.linalg.inv(T_ref)
        else:
            # fast path: next-frame state comes straight from the fused step
            self.last_frame = f
            self.last_Tcw = Tcw
            self.last_matched_pt = matched_pt
            self.last_pts = res.next_pts
            self.last_pts_valid = res.next_pts_valid

        self._record(timestamp, T_rel, self.ref_kf, False)
        entry = dict(frame=self.frame_id, state="OK",
                     inliers=n_local_inl, kf=bool(need_kf),
                     n_kf=self._nkf_cache() if need_kf else None,
                     # stage counters for failure forensics (EVAL metrics):
                     # motion-model matches / its pose inliers / reference-
                     # KF-tracked matches in the ref keyframe / fallback?
                     n_mm=int(sc[1]), mm_inl=int(sc[2]),
                     ref_matches=int(sc[4]), fallback=bool(sc[7]))
        if need_kf:
            entry["stage_ms"] = self.stage_ms
        self.metrics.append(entry)
        return Tcw

    # ------------------------------------------------------------------
    # Pipelined tracking stream (pipeline_depth > 0): the device runs
    # ahead of the host by `depth` frames. Dispatch frame i with fully
    # device-resident chained state (no host round trip on the hot path),
    # then retire frame i-depth: one small scalar read (prefetched with
    # copy_to_host_async), the keyframe decision, trajectory recording.
    # The KF a frame spawns becomes visible to tracking `depth` frames
    # later — the same relaxation the reference makes by running
    # LocalMapping in its own thread (src/LocalMapping.cc:71-159).
    # ------------------------------------------------------------------

    def _track_stream(self, images, timestamp: float, sensor: str):
        cfg = self.cfg
        if self._chain is None:
            # (re)build device chain from host state (after init, KF with
            # correction, relocalization, or mode switches)
            has_vel = self.velocity is not None
            vel = np.asarray(self.velocity if has_vel else np.eye(4),
                             dtype=np.float32)
            self._chain = dict(
                last=self.last_frame, pts=self.last_pts,
                ptsv=self.last_pts_valid,
                mpt=jnp.asarray(self.last_matched_pt),
                Tcw=jnp.asarray(np.asarray(self.last_Tcw, dtype=np.float32)),
                vel=jnp.asarray(vel), has_vel=jnp.asarray(has_vel),
                ref=jnp.asarray(self.ref_kf, dtype=jnp.int32))
        ch = self._chain
        recently_reloc = self.frame_id < self.last_reloc_frame_id + int(cfg.fps)
        min_inl = 50 if recently_reloc else 30
        res = tracking_step.full_tracking_step_from_images(
            cfg, self.m, images, ch["last"], ch["pts"], ch["ptsv"],
            ch["mpt"], ch["Tcw"], ch["vel"], ch["has_vel"], ch["ref"],
            min_inl, sensor)
        self.m = res.m
        try:
            res.packed.copy_to_host_async()
        except Exception:
            pass   # backend without async host copies: retire pays 1 RTT
        self._chain = dict(
            last=res.frame, pts=res.next_pts, ptsv=res.next_pts_valid,
            mpt=res.matched_pt, Tcw=res.Tcw, vel=res.next_vel,
            has_vel=_true(), ref=res.ref_kf)
        self._pending.append((timestamp, self.frame_id, res))
        self.frame_id += 1
        if len(self._pending) > self.pipeline_depth:
            return self._retire_one()
        return PENDING

    def _retire_one(self):
        """Finish the oldest in-flight frame: read its packed payload (one
        transfer, prefetched with copy_to_host_async at dispatch), run the
        host-side tail of the tracking state machine (KF decision, loop
        closing, trajectory recording). Returns its pose or None if lost."""
        if self._pending_mapping is not None:
            # split mode: adopt the mapping-device result dispatched at the
            # previous keyframe (its compute overlapped the tracked frames
            # in flight on the tracking chip)
            t0 = time.time()
            pend = self._pending_mapping
            self._pending_mapping = None
            Tcw_kf, matched_kf, corrected = self._finish_keyframe(pend)
            self.stage_ms["mapping_adopt_wall"] = (time.time() - t0) * 1e3
            if corrected:
                # pose-graph/GBA rewrote poses: the stream chain is stale
                self._drain_pipeline(record_lost=False)
                self._set_last(pend["f"], np.asarray(Tcw_kf), matched_kf)
                self._chain = None
                self._kf_blackout_fid = self.frame_id
                # the drain just emptied the in-flight queue (and recorded
                # every frame) — there is nothing left to retire this call
                if not self._pending:
                    return np.asarray(Tcw_kf)
        timestamp, fid, res = self._pending.popleft()
        sc, Tcw, T_rel = _unpack(jax.device_get(res.packed))
        ok = bool(sc[0])
        n_local = int(sc[3])
        self.ref_kf = int(sc[8])
        self.n_inliers = n_local
        f = res.frame

        if not ok:
            if self.localization_only and bool(sc[9]) and int(sc[2]) >= 10:
                # mbVO: map matches collapsed but odometry holds — keep the
                # VO pose and keep streaming (src/Tracking.cc:533-560); the
                # full relocalization engages when the pose itself fails
                self.state = OK
                self.last_Tcw = Tcw
                self._record(timestamp, T_rel, self.ref_kf, False)
                self.metrics.append(dict(frame=fid, state="OK",
                                         inliers=n_local, vo=True))
                return Tcw
            # genuinely lost: frames dispatched after this one chained from
            # a bad pose — drain them as lost and leave the stream
            self._drain_pipeline(record_lost=True)
            self._chain = None
            if (not self.localization_only and int(self._nkf_cache()) <= 5):
                self.reset()
                self._record(timestamp, np.eye(4), 0, True)
                self.metrics.append(dict(frame=fid, state="RESET",
                                         inliers=n_local))
                return None
            self.state = LOST
            self._record(timestamp, np.eye(4), self.ref_kf, True)
            self.metrics.append(dict(frame=fid, state="LOST",
                                     inliers=n_local))
            return None

        self.state = OK
        if self.last_Tcw is not None:
            self.velocity = Tcw @ np.linalg.inv(self.last_Tcw)
        self.last_Tcw = Tcw
        if self.voc is None:
            self._ensure_vocabulary(f)

        need_kf = (not self.localization_only and
                   fid >= self._kf_blackout_fid and
                   self._need_kf_from_scalars(sc, fid=fid))
        self._record(timestamp, T_rel, self.ref_kf, False)
        if need_kf:
            # Drain the (short) in-flight queue and insert the keyframe from
            # the NEWEST tracked frame (the reference's CreateNewKeyFrame
            # also snapshots the CURRENT frame, src/Tracking.cc:1638), then
            # rebuild the chain from the keyframe's post-mapping bindings.
            # The drain is nearly free now: every retire payload was
            # prefetched with copy_to_host_async at dispatch, so the
            # device_gets return from host memory (round 2 measured them as
            # serialized tunnel RTTs and dropped the drain — which starved
            # the next frames of the keyframe's new map points: the chain
            # kept motion-modeling against the PRE-KF bindings, the inlier/
            # ref-matches ratio stayed ~0.5, and the stream inserted a
            # keyframe every blackout window. The reference hands the new
            # points to the next frame through mCurrentFrame.mvpMapPoints,
            # src/Tracking.cc:1702-1712 — _set_last is that handoff.)
            newest = self._drain_pipeline(record_lost=False)
            if newest is not None:
                ts2, fid2, res2, Tcw2 = newest
            else:
                ts2, fid2, res2, Tcw2 = timestamp, fid, res, Tcw
            if self.mapping_device is not None:
                # split: enqueue the pass on the mapping chip and keep
                # streaming against the current snapshot; the result is
                # adopted at the next retire (new points then reach
                # tracking through the map, and stale last-frame bindings
                # resolve through pt_forward / CheckReplaced)
                self._pending_mapping = self._dispatch_mapping(
                    res2.frame, Tcw2, res2.matched_pt, fid2, ts2)
                self._set_last(res2.frame, np.asarray(Tcw2), res2.matched_pt)
                self._chain = None
                self._kf_blackout_fid = self.frame_id
                Tcw_kf = Tcw2
            else:
                Tcw_kf, matched_kf, corrected = self._handle_keyframe(
                    res2.frame, Tcw2, res2.matched_pt, fid2, ts2)
                self._set_last(res2.frame, np.asarray(Tcw_kf), matched_kf)
                self._chain = None
                # no KF decisions for frames dispatched before this insertion
                self._kf_blackout_fid = self.frame_id
            self.metrics.append(dict(frame=fid2, state="OK", kf=True,
                                     inliers=n_local,
                                     ref_matches=int(sc[4]),
                                     close_tracked=int(sc[5]),
                                     close_untracked=int(sc[6]),
                                     n_kf=self._nkf_cache(),
                                     stage_ms=self.stage_ms))
        else:
            self.metrics.append(dict(frame=fid, state="OK", inliers=n_local))
        return Tcw

    def _drain_pipeline(self, record_lost: bool):
        """Empty the in-flight queue without running keyframe decisions:
        either record frames as lost (the chain upstream broke) or record
        their tracked poses as-is. Returns the newest successfully tracked
        (timestamp, frame_id, res, Tcw) or None."""
        newest = None
        while self._pending:
            ts2, fid2, r2 = self._pending.popleft()
            sc2, Tcw2, T_rel2 = _unpack(jax.device_get(r2.packed))
            ok2 = bool(sc2[0]) and not record_lost
            if ok2:
                if self.last_Tcw is not None:
                    # keep the motion model current so the post-drain chain
                    # rebuild predicts from the newest inter-frame motion
                    self.velocity = Tcw2 @ np.linalg.inv(self.last_Tcw)
                self.last_Tcw = Tcw2
                self._record(ts2, T_rel2, int(sc2[8]), False)
                newest = (ts2, fid2, r2, Tcw2)
            else:
                self._record(ts2, np.eye(4), self.ref_kf, True)
            self.metrics.append(dict(frame=fid2,
                                     state="OK" if ok2 else "LOST",
                                     inliers=int(sc2[3])))
        return newest

    def _flush_pipeline(self):
        """Retire everything in flight (sequence end / state transitions)."""
        while self._pending:
            self._retire_one()
        self._chain = None

    def flush(self):
        """Public: drain the pipelined stream and complete any pending
        amortized-GBA chunks — the System::Shutdown semantics (the reference
        waits for a running GBA thread before SaveTrajectory,
        src/System.cc:349-360). Call at end of a sequence before reading the
        trajectory."""
        self._flush_pipeline()
        if self._pending_mapping is not None:
            t0 = time.time()
            pend = self._pending_mapping
            self._pending_mapping = None
            self._finish_keyframe(pend)
            self.stage_ms["mapping_adopt_wall"] = (time.time() - t0) * 1e3
        while self._gba_chunks_left > 0:
            n = max(1, -(-self.cfg.gba_total_iters //
                         self.cfg.gba_async_chunks))
            self.m = loop_closing.run_global_ba(
                self.cfg, self.m, mesh=self.gba_mesh, n_iters=n)
            self._gba_chunks_left -= 1

    def _handle_keyframe(self, f: FrameData, Tcw, matched_pt, fid: int,
                         timestamp: float):
        """Insert a keyframe from frame `f` at pose `Tcw` and run the full
        per-KF pipeline (mapping pass, loop closing, amortized/periodic GBA).
        Returns (possibly corrected Tcw, the KF's obs bindings, corrected?).

        Host-transfer budget: ONE device_get for the whole event (the fused
        keyframe_pass summary + the loop-candidate list), plus rare extras
        when a keyframe was actually culled or a loop candidate passes the
        consistency gate (compute_sim3 is host-sequenced)."""
        pend = self._dispatch_mapping(f, Tcw, matched_pt, fid, timestamp)
        return self._finish_keyframe(pend)

    def _dispatch_mapping(self, f: FrameData, Tcw, matched_pt, fid: int,
                          timestamp: float):
        """Enqueue the fused mapping pass — on `self.mapping_device` when the
        two-chip pipeline split is active (SURVEY P1/P7: tracking chip 0,
        mapping chip 1; the pure-snapshot MapState makes the split a pure
        dataflow edge), else in-place. Returns the pending-event record."""
        t_kf0 = time.time()
        m, f_m, Tcw_d, mp = (self.m, f, jnp.asarray(Tcw),
                             jnp.asarray(matched_pt))
        if self.mapping_device is not None:
            m = jax.device_put(m, self.mapping_device)
            f_m = jax.device_put(f_m, self.mapping_device)
            Tcw_d = jax.device_put(Tcw_d, self.mapping_device)
            mp = jax.device_put(mp, self.mapping_device)
        m_new, culled, summary = mapping_ops.keyframe_pass(
            self.cfg, m, f_m, Tcw_d, mp, fid, timestamp)
        self.last_kf_frame_id = fid
        self._kf_seq_host += 1
        return dict(m=m_new, culled=culled, summary=summary, f=f,
                    fid=fid, timestamp=timestamp, kf_seq=self._kf_seq_host,
                    t_kf0=t_kf0, Tcw=np.asarray(Tcw))

    def _finish_keyframe(self, pend):
        """Adopt a mapping pass's result: place recognition, the ONE host
        transfer, loop closing, amortized GBA. In split mode this runs one
        retire later, with the map transferred back to the tracking device
        (per-frame visible/found counter updates from the frames tracked in
        between are superseded by the snapshot — the same benign race the
        reference's tracking/mapping threads have on MapPoint counters)."""
        cfg = self.cfg
        t_kf0 = pend["t_kf0"]
        f = pend["f"]
        kf_seq = pend["kf_seq"]
        culled = pend["culled"]
        summary = pend["summary"]
        if self.mapping_device is not None:
            self.m = jax.device_put(pend["m"], self.tracking_device)
            summary = jax.device_put(summary, self.tracking_device)
        else:
            self.m = pend["m"]
        Tcw = pend["Tcw"]
        loops_before = self.n_loops_closed
        # place-recognition dispatches (still no host sync)
        self._ensure_vocabulary(f)
        cands_dev = None
        if self.voc is not None:
            vec = self._bow_vec(f.desc, f.valid)
            self.db = self.db.add(summary[0], vec)
            if (self.enable_loop_closing and
                    kf_seq - self.loop_state.last_loop_kf_seq >=
                    cfg.loop_kf_gap):
                cands_dev = loop_closing.detect_loop_dispatch(
                    cfg, self.m, self.db, vec, summary[0], self.loop_state)
        # the ONE per-keyframe host transfer
        if cands_dev is not None:
            summary_h, cands_h = jax.device_get((summary, cands_dev))
        else:
            summary_h, cands_h = jax.device_get(summary), []
        kf_id = int(summary_h[0])
        self._n_kf_host = int(summary_h[1])
        self.ref_kf = kf_id
        if int(summary_h[3]):        # a keyframe was culled (rare)
            culled_h = np.asarray(culled)
            if self.db is not None:
                self.db = self.db.erase(jnp.asarray(culled_h))
            self._rehome_trajectory(culled_h)
        matched_pt = self.m.kf_obs[kf_id]
        t_loop0 = time.time()
        for cand in [int(c) for c in cands_h if c >= 0]:
            # try every consistent candidate until one passes ComputeSim3
            # (the reference iterates mvpEnoughConsistentCandidates,
            # src/LoopClosing.cc:331-466)
            ok, Scm, n_inl = loop_closing.compute_sim3(
                cfg, self.m, kf_id, cand)
            if not ok:
                continue
            amortize = cfg.gba_async_chunks > 0
            self.m = loop_closing.correct_loop(
                cfg, self.m, kf_id, cand, Scm, mesh=self.gba_mesh,
                run_gba=not amortize)
            if amortize:
                # P5: spread the GBA over the next N keyframe insertions;
                # discarding chunks pending from an older loop is the
                # reference's mbStopGBA abort (src/LoopClosing.cc:559-572)
                self._gba_chunks_left = cfg.gba_async_chunks
            self.loop_state.last_loop_kf_seq = kf_seq
            self.n_loops_closed += 1
            self._kfs_since_gba = 0  # loop correction just ran a GBA
            break
        self.stage_ms = {"mapping": (t_loop0 - t_kf0) * 1e3,
                         "loop": (time.time() - t_loop0) * 1e3}
        gba_chunk_ran = False
        if (self.n_loops_closed == loops_before and
                self._gba_chunks_left > 0):
            # one amortized loop-GBA chunk per keyframe (P5; a fresh
            # loop closure above would have reset the schedule)
            n = max(1, -(-cfg.gba_total_iters // cfg.gba_async_chunks))
            self.m = loop_closing.run_global_ba(
                cfg, self.m, mesh=self.gba_mesh, n_iters=n)
            self._gba_chunks_left -= 1
            gba_chunk_ran = True
        corrected = (self._maybe_periodic_gba() or gba_chunk_ran or
                     self.n_loops_closed != loops_before)
        if corrected:
            # loop correction / GBA rewrote keyframe poses (incl. this
            # KF's): continue tracking from the corrected pose, and drop
            # the motion model (it was computed against the stale poses)
            Tcw = np.asarray(self.m.kf_pose[int(kf_id)])
            self.velocity = None
        return Tcw, matched_pt, corrected

    def _need_kf_from_scalars(self, sc, fid=None) -> bool:
        """NeedNewKeyFrame from the fused step's scalar bundle. `fid` is the
        frame the scalars belong to (differs from self.frame_id by the
        pipeline depth in stream mode)."""
        cfg = self.cfg
        if fid is None:
            fid = self.frame_id
        if self._pending_mapping is not None:
            # split mode: one mapping pass in flight — the reference's
            # KeyframesInQueue() >= N backpressure (src/Tracking.cc:1605)
            return False
        if int(self._nkf_cache()) >= cfg.max_keyframes - 2:
            return False
        n_kf_now = self._nkf_cache()
        if (fid < self.last_reloc_frame_id + int(cfg.fps)
                and n_kf_now > int(cfg.fps)):
            # no new keyframes for one second after a relocalization
            # (src/Tracking.cc:1513-1515)
            return False
        n_inliers = int(sc[3])
        ref_matches = int(sc[4])
        close_tracked = int(sc[5])
        close_untracked = int(sc[6])
        frames_since = fid - self.last_kf_frame_id
        n_kf = self._nkf_cache()
        th_ratio = 0.75 if cfg.sensor != SENSOR_MONOCULAR else 0.9
        if n_kf < 2:
            th_ratio = 0.4
        need_close = (cfg.sensor != SENSOR_MONOCULAR and
                      (close_tracked < 100 and close_untracked > 70))
        # bLocalMappingIdle stand-in (src/Tracking.cc:1537,1546-1567 +
        # SetAcceptKeyFrames): the mapper counts as busy for
        # mapper_busy_frames_effective frames after an insertion — one
        # mapping iteration's wall time at the camera rate. On a young map
        # (< 10 keyframes) one iteration is far cheaper than a frame
        # interval (local BA and the table ops scale with the local map),
        # so the mapper is idle — the regime right after monocular
        # initialization, where the reference densifies with back-to-back
        # insertions and throttling instead starves the thin map.
        busy_window = cfg.mapper_busy_frames_effective if n_kf >= 10 else 0
        idle = frames_since > busy_window
        c1a = frames_since >= int(cfg.fps)
        c1b = idle                       # mMinFrames = 0: c1b == idle
        c1c = cfg.sensor != SENSOR_MONOCULAR and \
            (n_inliers < ref_matches * 0.25 or need_close)
        c2 = (n_inliers < ref_matches * th_ratio or need_close) and n_inliers > 15
        if not ((c1a or c1b or c1c) and c2):
            return False
        if idle:
            return True
        # Mapper busy (src/Tracking.cc:1592-1623): the reference interrupts
        # BA and then inserts anyway for stereo/RGBD as long as < 3 keyframes
        # queue up — this serial design processes each pass to completion, so
        # the queue is always empty and stereo/RGBD insert. Monocular never
        # inserts while the mapper is busy.
        return cfg.sensor != SENSOR_MONOCULAR

    def _nkf_cache(self) -> int:
        # host-tracked keyframe count (avoids a device read per frame);
        # refreshed from the keyframe_pass summary and at initialization
        if self._n_kf_host is None:
            self._n_kf_host = int(self.m.n_keyframes)
        return self._n_kf_host

    def _maybe_periodic_gba(self):
        """Opt-in periodic global BA (cfg.gba_every_n_kf > 0): bounds mono
        scale drift on loop-free sequences. The reference runs GBA only on
        loop closure (src/LoopClosing.cc:873-1017); same solver, different
        trigger. A loop closure resets the counter (it just ran GBA)."""
        if self.cfg.gba_every_n_kf <= 0:
            return False
        self._kfs_since_gba += 1
        if self._kfs_since_gba < self.cfg.gba_every_n_kf:
            return False
        self._kfs_since_gba = 0
        self.m = loop_closing.run_global_ba(self.cfg, self.m,
                                            mesh=self.gba_mesh)
        return True

    # ------------------------------------------------------------------
    # Mode switches / reset / accessors (System facade parity:
    # ActivateLocalizationMode/Reset/GetTrackingState, src/System.cc:150-344,
    # 621-639)
    # ------------------------------------------------------------------

    def activate_localization_mode(self):
        """Tracking-only: stop inserting keyframes / running mapping (the
        reference freezes LocalMapping, src/System.cc:164-194)."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """System::Reset (src/Tracking.cc:2265-2313): clear map, database,
        trajectory bookkeeping and return to the uninitialized state (the
        reference also clears mlRelativeFramePoses/mlpReferences — old
        entries reference destroyed keyframes)."""
        cfg = self.cfg
        self.m = mapstate.empty(cfg.max_keyframes, cfg.max_map_points,
                                cfg.max_keypoints)
        if self.voc is not None:
            self.db = bow_db.BowDatabase.empty(cfg.max_keyframes,
                                               cfg.max_keypoints)
        self.loop_state.reset()
        self.state = NOT_INITIALIZED
        self.velocity = None
        self.init_frame = None
        self.last_frame = None
        self.ref_kf = 0
        self.last_kf_frame_id = self.frame_id
        self.last_reloc_frame_id = -(1 << 30)
        self.trajectory = []
        self._kfs_since_gba = 0
        self._kf_seq_host = 0
        self._kf_blackout_fid = -1
        self._n_kf_host = None
        self._pending.clear()   # in-flight stream results reference the old map
        self._chain = None
        self._pending_mapping = None

    def get_tracking_state(self):
        return self.state

    def get_map_stats(self):
        """Structured observability snapshot (SURVEY §5.5)."""
        return dict(
            n_keyframes=int(self.m.n_keyframes),
            n_map_points=int(self.m.n_points),
            n_loops_closed=self.n_loops_closed,
            state={0: "NOT_INITIALIZED", 1: "OK", 2: "LOST"}[self.state],
            last_inliers=self.n_inliers,
            frame_id=self.frame_id,
        )

    def get_tracked_map_points(self):
        """Map point ids matched in the last frame (-1 per unmatched
        keypoint) — System::GetTrackedMapPoints."""
        return (np.asarray(self.last_matched_pt)
                if self.last_matched_pt is not None else None)

    def draw_current_frame(self, img, path="frame.png"):
        """FrameDrawer::DrawFrame parity: annotated overlay of the last
        tracked frame's keypoints + status banner (src/FrameDrawer.cc:33-208),
        written to `path` (headless form of the live viewer panel)."""
        from .. import viewer
        if self.last_frame is None:
            return None
        matched = (np.asarray(self.last_matched_pt) >= 0
                   if self.last_matched_pt is not None else None)
        return viewer.draw_frame(img, self.last_frame, matched_mask=matched,
                                 path=path, status=self.get_map_stats())

    def get_tracked_keypoints_un(self):
        """Undistorted keypoints (+validity) of the last frame —
        System::GetTrackedKeyPointsUn (src/System.cc:634-639)."""
        if self.last_frame is None:
            return None
        return (np.asarray(self.last_frame.xy),
                np.asarray(self.last_frame.valid))

    # ------------------------------------------------------------------
    # Place recognition / loop closing / relocalization
    # ------------------------------------------------------------------

    def _ensure_vocabulary(self, f: FrameData):
        if self.voc is not None:
            return
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        self._voc_train_desc.append(d)
        total = sum(len(x) for x in self._voc_train_desc)
        if total >= 1500:
            train = np.concatenate(self._voc_train_desc)
            self.voc = bow_voc.build_vocabulary(train, k=10, depth=3)
            self.db = bow_db.BowDatabase.empty(self.cfg.max_keyframes,
                                               self.cfg.max_keypoints)
            # backfill keyframes inserted before the vocabulary existed
            for k in np.nonzero(np.asarray(self.m.kf_valid))[0]:
                vec = self._bow_vec(self.m.kf_desc[int(k)],
                                    self.m.kf_feat_valid[int(k)])
                self.db = self.db.add(int(k), vec)
            self._voc_train_desc = []

    def _bow_vec(self, desc, valid):
        """Sorted sparse BoW row (words, weights) — vocabulary-size
        independent, so the database can host the real ~1M-word ORBvoc."""
        word, weight, _ = bow_voc.transform(self.voc, desc, valid)
        return bow_voc.bow_sparse(word, weight)

    def _on_keyframe_inserted(self, kf_id: int, f: FrameData):
        """Initialization-path bookkeeping: train/apply the vocabulary and
        register the new keyframe in the place-recognition DB (loop detection
        proper is gap-gated off this early; steady-state keyframes go through
        `_handle_keyframe`, which folds detection into its one transfer)."""
        self._ensure_vocabulary(f)
        if self.voc is None:
            return
        vec = self._bow_vec(f.desc, f.valid)
        self.db = self.db.add(kf_id, vec)

    def _relocalize(self, f: FrameData):
        """Tracking::Relocalization (src/Tracking.cc:2039-2262): BoW
        candidates -> descriptor matching against candidate keyframe points
        -> EPnP RANSAC -> pose optimization -> if <50 inliers, the reference's
        rescue rounds: wide projection re-search of the candidate KF's points
        (window 10, ORBdist 100) and, if still 30..50, a narrow second round
        (window 3, ORBdist 64), re-optimizing after each (:2172-2241)."""
        if self.voc is None or self.db is None:
            return None, None, None, False
        vec = self._bow_vec(f.desc, f.valid)
        from ..bow import database as db_mod
        cand_mask, acc, scores = db_mod.detect_reloc_candidates(
            self.db, vec, self.m.covis)
        cand_mask = np.asarray(cand_mask) & np.asarray(self.m.kf_valid)
        scores = np.asarray(scores)
        order = [int(c) for c in np.argsort(-scores) if cand_mask[c]]
        for k in order:
            f_ok2 = self.m.kf_feat_valid[k] & (self.m.kf_obs[k] >= 0)
            mm = matching.search_by_node(
                jnp.where(f.valid, 0, -1), f.desc, f.valid, f.angle,
                jnp.where(f_ok2, 0, -1), self.m.kf_desc[k], f_ok2,
                self.m.kf_angle[k], nn_ratio=0.75)
            pt = self.m.kf_obs[k][jnp.clip(mm.idx, 0, self.cfg.max_keypoints - 1)]
            valid = mm.valid & (pt >= 0)
            if int(jnp.sum(valid)) < 15:
                continue
            Xw = self.m.pt_pos[jnp.clip(pt, 0, self.m.capacity_pt - 1)]
            res = pnp.ransac_pnp(
                Xw, f.xy, f.level, valid, self.cfg.level_sigma2,
                float(self.cfg.fx), float(self.cfg.fy), float(self.cfg.cx),
                float(self.cfg.cy),
                # fresh hypotheses per (frame, candidate): a retry after a
                # failed attempt must not redraw the identical sample sets
                key=jax.random.PRNGKey(self.frame_id * 131 + k))
            if not bool(res.ok):
                continue
            matched_pt = jnp.where(res.inliers, pt, INVALID)
            obs = jnp.concatenate([f.xy, f.ur[:, None]], axis=-1)
            opt = pose_opt.optimize_pose(
                self.cam, res.Tcw, Xw, obs, f.level, matched_pt >= 0,
                self.cfg.level_sigma2)
            n_good = int(opt.n_inliers)
            if n_good < 10:
                continue
            matched_pt = jnp.where(opt.inliers, matched_pt, INVALID)
            Tcw = opt.Tcw
            if n_good < 50:
                Tcw, matched_pt, n_inl = tracking_ops.reloc_rescue(
                    self.cfg, self.m, k, f, Tcw, matched_pt,
                    th=10.0, orb_dist=100)
                n_good = int(n_inl)
                if 30 < n_good < 50:
                    Tcw, matched_pt, n_inl = tracking_ops.reloc_rescue(
                        self.cfg, self.m, k, f, Tcw, matched_pt,
                        th=3.0, orb_dist=64)
                    n_good = int(n_inl)
            if n_good >= 50:
                return Tcw, matched_pt, k, True
        return None, None, None, False

    # ------------------------------------------------------------------
    # Trajectory bookkeeping under keyframe culling
    # ------------------------------------------------------------------

    def _rehome_trajectory(self, culled: np.ndarray):
        """When a keyframe is culled its slot may be reused and its stored
        pose goes stale (excluded from later pose-graph/GBA writes), so every
        trajectory entry referencing it is re-based NOW onto its nearest
        surviving spanning-tree ancestor: T_rel <- T_rel * Tcp, ref <- parent.
        This is the reference's mTcp bad-KF chain (`KeyFrame::SetBadFlag`
        stores mTcp, `System::SaveTrajectoryTUM` walks it,
        src/System.cc:431-505 at :476) done eagerly instead of at export."""
        poses = np.asarray(self.m.kf_pose)
        valid = np.asarray(self.m.kf_valid)
        parent = np.asarray(self.m.parent)
        remap = {}          # culled kf -> (survivor kf, Tcp)
        for k in np.nonzero(culled)[0]:
            p = int(parent[k])
            while p >= 0 and not valid[p]:
                p = int(parent[p])
            if p < 0:       # no surviving ancestor: fall back to oldest valid
                alive = np.nonzero(valid)[0]
                if len(alive) == 0:
                    continue
                fid = np.asarray(self.m.kf_frame_id)
                p = int(alive[np.argmin(fid[alive])])
            Tcp = poses[k] @ np.linalg.inv(poses[p])
            remap[int(k)] = (p, Tcp)
        if not remap:
            return
        for e in self.trajectory:
            if e.ref_kf in remap:
                p, Tcp = remap[e.ref_kf]
                e.T_rel = e.T_rel @ Tcp
                e.ref_kf = p
        if self.ref_kf in remap:
            self.ref_kf = remap[self.ref_kf][0]

    # ------------------------------------------------------------------
    # Output
    # ------------------------------------------------------------------

    def _record(self, ts, T_rel, ref_kf, lost):
        self.trajectory.append(TrajectoryEntry(ts, np.asarray(T_rel), ref_kf, lost))

    def get_trajectory(self) -> List[Tuple[float, np.ndarray]]:
        """Final camera trajectory Twc per frame, composing the stored
        relative pose with the (possibly optimized) keyframe pose — the
        reference's SaveTrajectoryTUM walk (`src/System.cc:416-505`)."""
        out = []
        poses = np.asarray(self.m.kf_pose)
        for e in self.trajectory:
            if e.lost:
                continue
            Tcw = e.T_rel @ poses[e.ref_kf]
            out.append((e.timestamp, np.linalg.inv(Tcw)))
        return out

    def keyframe_trajectory(self):
        poses = np.asarray(self.m.kf_pose)
        valid = np.asarray(self.m.kf_valid)
        ts = np.asarray(self.m.kf_timestamp)
        fid = np.asarray(self.m.kf_frame_id)
        order = np.argsort(fid)
        return [(float(ts[k]), np.linalg.inv(poses[k]))
                for k in order if valid[k]]
