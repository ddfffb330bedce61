"""Live visualization consumer.

TPU analog of the reference's separate visualization process
(reference droid.py:40-43 spawns visualization.py:60-163, which polls the
shared-CUDA-memory DepthVideo's `dirty` flags each animation frame).  On
TPU there is no cross-process device memory: a daemon THREAD polls
`video.dirty`, snapshots just the dirty keyframes to host (one small
device->host copy per poll, off the tracking hot path), re-runs the
depth-consistency filter for them, and maintains an incrementally-updated
per-keyframe point/camera store.  Sinks:

- PLY streaming (default): the merged cloud + camera trail is rewritten
  atomically every refresh, so any external viewer (or `cli view`) watching
  the file shows the reconstruction growing live.
- Open3D window when open3d is importable (same actor-replacement scheme
  as the reference: reference visualization.py:117-141), used off-image.

Keyframes edited later (BA refines poses/disps, `dirty` gets re-set —
reference depth_video.py:23-46 semantics) are re-snapshotted and their
points replaced, exactly like the reference removes and re-adds actors.
"""
import os
import threading
import time

import numpy as np

from .pointcloud import backproject_points, depth_filter, export_ply


class LiveViewer:
    """Consumes `video.dirty` and maintains a live point-cloud view.

    Mirrors reference visualization.py:84-141 (animation_callback): drain
    dirty indices, filter depths, replace that keyframe's geometry.
    """

    def __init__(self, video, out_path="live.ply", interval=0.5,
                 filter_thresh=0.005, filter_count=2, warmup=2):
        self.video = video
        self.out_path = out_path
        self.interval = interval
        self.filter_thresh = filter_thresh
        self.filter_count = filter_count
        self.warmup = warmup
        self.points = {}   # keyframe ix -> [N, 3]
        self.colors = {}   # keyframe ix -> [N, 3]
        self.cameras = {}  # keyframe ix -> [3] camera center (trail)
        self.refreshes = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    # ------------------------------------------------------------ lifecycle
    def start(self):
        self._thread.start()
        return self

    def stop(self, final_flush=True):
        self._stop.set()
        self._thread.join(timeout=10)
        if final_flush:
            self.refresh_once()
            self._write()

    def _run(self):
        while not self._stop.is_set():
            try:
                if self.refresh_once():
                    self._write()
            except Exception:
                # the viewer must never take down tracking
                pass
            self._stop.wait(self.interval)

    # ------------------------------------------------------------- one poll
    def refresh_once(self):
        """Drain dirty keyframes, rebuild their points.  Returns #updated."""
        import jax.numpy as jnp

        from ..lie import se3_inv

        v = self.video
        t = int(v.counter)
        if t < self.warmup:
            return 0
        dirty = np.where(np.asarray(v.dirty[:t]))[0]
        if len(dirty) == 0:
            return 0
        v.dirty[dirty] = False

        # host snapshot of the dirty slice only (reference :99-110)
        poses = jnp.asarray(v.poses[:t])
        disps = jnp.asarray(v.disps[:t])
        intr = jnp.asarray(v.intrinsics[0])
        ix = np.asarray(dirty)

        pts = np.asarray(backproject_points(poses[ix], disps[ix], intr))
        disps_np = np.asarray(disps[ix])
        # constant per-frame threshold (reference visualization.py:108 uses
        # filter_thresh * ones_like(...) — NOT scaled by scene disparity)
        thresh = self.filter_thresh * np.ones(len(ix))
        counts = np.asarray(depth_filter(poses, disps, intr, ix, thresh))
        masks = (counts >= self.filter_count) & (
            disps_np > 0.5 * disps_np.mean(axis=(1, 2), keepdims=True)
        )

        H8, W8 = disps_np.shape[1:]
        cams = np.asarray(se3_inv(poses[ix]))[:, :3]
        for k, i in enumerate(ix):
            img = v.images[i]
            color = img[3::8, 3::8][:H8, :W8, ::-1] / 255.0
            m = masks[k]
            self.points[int(i)] = pts[k][m]
            self.colors[int(i)] = color[m]
            self.cameras[int(i)] = cams[k]
        self.refreshes += 1
        return len(ix)

    # --------------------------------------------------------------- output
    def cloud(self):
        """Merged (points, colors) across all keyframes seen so far."""
        if not self.points:
            return np.zeros((0, 3)), np.zeros((0, 3))
        keys = sorted(self.points)
        pts = np.concatenate([self.points[k] for k in keys], axis=0)
        clr = np.concatenate([self.colors[k] for k in keys], axis=0)
        return pts, clr

    def _write(self):
        pts, clr = self.cloud()
        tmp = self.out_path + ".tmp"
        export_ply(tmp, pts, clr)
        os.replace(tmp, self.out_path)  # atomic for external watchers


def try_open3d_viewer(viewer, height=540, width=960):
    """Attach an Open3D window to a running LiveViewer (off-image only;
    reference visualization.py:155-163).  Returns False when open3d is
    unavailable."""
    try:
        import open3d as o3d
    except ImportError:
        return False

    vis = o3d.visualization.Visualizer()
    vis.create_window(height=height, width=width)
    pcd = o3d.geometry.PointCloud()
    vis.add_geometry(pcd)
    last = -1
    while not viewer._stop.is_set():
        if viewer.refreshes != last:
            last = viewer.refreshes
            pts, clr = viewer.cloud()
            pcd.points = o3d.utility.Vector3dVector(pts)
            pcd.colors = o3d.utility.Vector3dVector(clr)
            vis.update_geometry(pcd)
        if not vis.poll_events():
            break
        vis.update_renderer()
        time.sleep(0.03)
    vis.destroy_window()
    return True
