"""Command-line entry points (reference demo.py, evaluation_scripts/*,
train.py — one CLI with subcommands instead of per-script flag duplication).

Usage:
  python -m droid_slam_reserch_tpu.cli demo --imagedir DIR --calib FILE
  python -m droid_slam_reserch_tpu.cli euroc --datapath .../MH_01/mav0 --gt gt.txt [--stereo]
  python -m droid_slam_reserch_tpu.cli tum --datapath .../rgbd_dataset_freiburg1_xyz
  python -m droid_slam_reserch_tpu.cli eth3d --datapath DIR [--depth]
  python -m droid_slam_reserch_tpu.cli tartanair --datapath SCENE [--stereo]
  python -m droid_slam_reserch_tpu.cli train --datapath .../TartanAir
"""
import argparse
import os
import json
import sys

import numpy as np


def _add_slam_flags(p):
    """Shared SLAM flags (reference demo.py:103-128)."""
    p.add_argument("--weights", default=None, help="droid.pth-style checkpoint")
    p.add_argument("--buffer", type=int, default=None)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--disable_backend", action="store_true")
    p.add_argument("--upsample", action="store_true")
    p.add_argument("--reconstruction_path", default=None)
    p.add_argument("--vis_path", default=None,
                   help="stream a live, incrementally-updated PLY here")
    p.add_argument("--bf16", action="store_true", help="bfloat16 network compute")
    p.add_argument("--image_size", type=int, nargs=2, default=None,
                   help="engine H W (streams resize to match)")
    for name, typ in [
        ("filter_thresh", float), ("warmup", int), ("keyframe_thresh", float),
        ("frontend_thresh", float), ("frontend_window", int),
        ("frontend_radius", int), ("frontend_nms", int), ("beta", float),
        ("backend_thresh", float), ("backend_radius", int), ("backend_nms", int),
        ("quality_mean_thresh", float), ("quality_min_thresh", float),
    ]:
        p.add_argument(f"--{name}", type=typ, default=None)


def _config_from_args(base, args):
    over = {}
    for f in ("weights", "buffer", "vis_path", "filter_thresh", "warmup", "keyframe_thresh",
              "frontend_thresh", "frontend_window", "frontend_radius",
              "frontend_nms", "beta", "backend_thresh", "backend_radius",
              "backend_nms", "upsample", "quality_mean_thresh",
              "quality_min_thresh"):
        v = getattr(args, f, None)
        if v is not None and v is not False:
            over[f] = v
    if getattr(args, "image_size", None) is not None:
        over["image_size"] = tuple(args.image_size)
    if getattr(args, "bf16", False):
        over["compute_dtype"] = "bfloat16"
    return base.replace(**over)


def _track_stream(droid, stream, use_depth=False, progress=True):
    n = 0
    for item in stream:
        if use_depth and len(item) == 4:
            t, image, depth, intrinsics = item
            droid.track(t, image, depth=depth, intrinsics=intrinsics)
        else:
            t, image, intrinsics = item[0], item[1], item[-1]
            droid.track(t, image, intrinsics=intrinsics)
        n += 1
        if progress and n % 25 == 0:
            print(f"  frame {n}, keyframes {droid.video.counter}", flush=True)
    return n


def _save_trajectory(path, tstamps, traj):
    """TUM-format trajectory file (t tx ty tz qx qy qz qw)."""
    with open(path, "w") as f:
        for t, p in zip(tstamps, traj):
            f.write(f"{t} " + " ".join(f"{x:.9f}" for x in p) + "\n")


def cmd_demo(args):
    from .data import generic_image_stream
    from .engine import Droid
    from .utils import DroidConfig

    cfg = _config_from_args(DroidConfig(image_size=(240, 320)), args)
    # probe first frame for actual stream resolution
    probe = next(iter(generic_image_stream(args.imagedir, args.calib, args.stride,
                                           target_area=args.target_area)))
    h, w = probe[1].shape[:2]
    cfg = cfg.replace(image_size=(h, w))

    droid = Droid(cfg)
    stream = generic_image_stream(args.imagedir, args.calib, args.stride,
                                  target_area=args.target_area)
    _track_stream(droid, stream)
    if args.reconstruction_path:
        droid.save_reconstruction(args.reconstruction_path)
    if not args.disable_backend:
        droid.terminate()
    t = droid.video.counter
    print(f"tracked {t} keyframes")
    if args.reconstruction_path:
        droid.save_reconstruction(args.reconstruction_path)


def cmd_euroc(args):
    from .data import euroc_stream
    from .engine import Droid
    from .eval import evaluate_ate
    from .utils import EUROC_CONFIG

    cfg = _config_from_args(EUROC_CONFIG.replace(stereo=args.stereo), args)
    droid = Droid(cfg)
    stream = euroc_stream(args.datapath, image_size=cfg.image_size,
                          stereo=args.stereo, stride=args.stride)
    _track_stream(droid, stream)

    if args.reconstruction_path:
        # multisession stage 1: session checkpoint + keyframe image export
        # (reference Euroc_Multisession_Stereo/KeyFramesAndRawData.py)
        droid.save_reconstruction(args.reconstruction_path)
        from .multisession.pipeline import extract_images_by_timestamp

        extract_images_by_timestamp(
            os.path.join(args.datapath, "cam0/data"),
            droid.video.tstamp[: droid.video.counter],
            os.path.join(args.reconstruction_path, "keyframes_cam0"),
        )

    fill_stream = (
        (t, im, intr)
        for (t, im, intr) in euroc_stream(
            args.datapath, image_size=cfg.image_size, stereo=args.stereo, stride=args.stride
        )
    )
    traj = droid.terminate_eva(fill_stream)

    from .data.euroc import euroc_timestamps

    tstamps = euroc_timestamps(args.datapath, stride=args.stride)[: len(traj)]
    if args.out:
        _save_trajectory(args.out, tstamps, traj)

    if args.gt:
        # EuRoC ships state_groundtruth_estimate0/data.csv (comma, ns
        # stamps); processed TUM-style files are space-separated
        with open(args.gt) as f:
            head = f.readline()
        delim = "," if head.count(",") > head.count(" ") else None
        gt = np.loadtxt(args.gt, delimiter=delim, comments="#")[:, :8]
        est = np.concatenate(
            [np.asarray(tstamps)[:, None] * 1e-9, traj[:, :3], traj[:, 3:]], axis=1
        )
        if not args.stereo:
            est[:, 1:4] *= 1.10  # mono scale fudge (reference test_euroc.py:134)
        res = evaluate_ate(
            est, gt, align=True, correct_scale=not args.stereo, max_dt=0.1
        )
        print(json.dumps({"ate": res}))
        if args.out:
            with open(args.out + ".ate.json", "w") as f:
                json.dump(res, f)


def cmd_tum(args):
    from .data import tum_stream
    from .engine import Droid
    from .eval import evaluate_ate
    from .utils import TUM_CONFIG

    cfg = _config_from_args(
        TUM_CONFIG.replace(
            filter_thresh=1.75, warmup=12, keyframe_thresh=2.25,
            frontend_thresh=12.0, beta=0.6, backend_thresh=15.0,
            image_size=(240, 320),  # the stream's post-crop size
        ),
        args,
    )
    droid = Droid(cfg)
    _track_stream(droid, tum_stream(args.datapath, stride=2,
                                    image_size=cfg.image_size))
    traj = droid.terminate_eva(
        iter(list(tum_stream(args.datapath, stride=2,
                             image_size=cfg.image_size))))
    print(f"tracked {len(traj)} frames")
    if args.gt:
        from .data.tum import tum_timestamps

        gt = np.loadtxt(args.gt)
        # associate by the frames' epoch timestamps (filenames), as the
        # reference's evo protocol does — index association drifts whenever
        # frames were dropped from either stream
        ts = tum_timestamps(args.datapath, stride=2)[: len(traj)]
        if len(ts) < len(traj):
            ts = np.concatenate([ts, np.arange(len(ts), len(traj), dtype=np.float64)])
        est = np.concatenate([ts[:, None], traj[:, :3], traj[:, 3:]], axis=1)
        res = evaluate_ate(est, gt, align=True, correct_scale=True)
        print(json.dumps({"ate": res}))


def cmd_eth3d(args):
    from .data import eth3d_stream
    from .engine import Droid
    from .utils import ETH3D_CONFIG

    cfg = _config_from_args(ETH3D_CONFIG, args)
    # resize_to_area keeps aspect, so probe the stream for the actual size
    ta = cfg.image_size[0] * cfg.image_size[1]
    probe = next(iter(eth3d_stream(args.datapath, use_depth=args.depth,
                                   target_area=ta)))
    h, w = probe[1].shape[:2]
    cfg = cfg.replace(image_size=(h, w))
    droid = Droid(cfg)
    _track_stream(
        droid, eth3d_stream(args.datapath, use_depth=args.depth,
                            stride=args.stride, target_area=ta),
        use_depth=args.depth,
    )
    traj = droid.terminate_eva(
        iter([(x[0], x[1], x[-1])
              for x in eth3d_stream(args.datapath, stride=args.stride,
                                    target_area=ta)])
    )
    print(f"tracked {len(traj)} frames")

    # ATE vs groundtruth.txt when present (the reference ships the eval
    # commented out, test_eth3d.py:112-118; a new framework should report it)
    gt_file = os.path.join(args.datapath, "groundtruth.txt")
    if os.path.exists(gt_file):
        from .data import eth3d_timestamps
        from .eval import evaluate_ate

        stamps = np.asarray(eth3d_timestamps(args.datapath, stride=args.stride))
        n = min(len(stamps), len(traj))
        est = np.concatenate(
            [stamps[:n, None], traj[:n, :3], traj[:n, 3:]], axis=1
        )
        gt = np.loadtxt(gt_file, comments="#")
        try:
            res = evaluate_ate(est, gt, max_dt=0.1)
            print(json.dumps({"ate": res}))
        except ValueError as e:
            print(json.dumps({"ate_error": str(e)}))


def _tartanair_one(cfg, scenedir, gt_file, stereo, stride):
    from .data import tartan_stream
    from .engine import Droid
    from .eval.metrics import evaluate_tartanair

    droid = Droid(cfg)
    _track_stream(droid, tartan_stream(scenedir, stereo=stereo, stride=stride,
                                       image_size=cfg.image_size))
    traj = droid.terminate_eva(
        iter([(x[0], x[1][0] if stereo else x[1], x[2])
              for x in tartan_stream(scenedir, stereo=stereo, stride=stride,
                                     image_size=cfg.image_size)])
    )
    res = None
    if gt_file and os.path.exists(gt_file):
        gt = np.loadtxt(gt_file)[:, [1, 2, 0]]  # NED -> xyz translation part
        res = evaluate_tartanair(traj[: len(gt), :3], gt[: len(traj)])
    return traj, res


def cmd_tartanair(args):
    """Single scene, or (--split) the full TartanAir test-split sweep with a
    success-rate curve (reference validate_tartanair.py:77-114)."""
    from .utils import TARTANAIR_CONFIG

    cfg = _config_from_args(TARTANAIR_CONFIG.replace(stereo=args.stereo), args)
    if not args.split:
        traj, res = _tartanair_one(cfg, args.datapath, args.gt,
                                   args.stereo, args.stride)
        if res is not None:
            print(json.dumps(res))
        return

    from .data.tartan import TARTAN_TEST_SPLIT

    scenes = [s for s in TARTAN_TEST_SPLIT
              if os.path.isdir(os.path.join(args.datapath, s))]
    if args.id >= 0:
        scenes = [TARTAN_TEST_SPLIT[args.id]]
    ates = []
    for scene in scenes:
        scenedir = os.path.join(args.datapath, scene)
        gt_file = os.path.join(scenedir, "pose_left.txt")
        print(f"evaluating {scene}", flush=True)
        _, res = _tartanair_one(cfg, scenedir, gt_file, args.stereo, args.stride)
        ate = res["ate_score"] if res else float("nan")
        ates.append(ate)
        print(json.dumps({"scene": scene, "ate": ate}))

    # success-rate curve: fraction of runs under each ATE threshold
    # (reference validate_tartanair.py:106-114 plot, emitted as JSON here)
    ate_arr = np.asarray([a for a in ates if np.isfinite(a)])
    xs = np.linspace(0.0, 1.0, 512)
    curve = [float(np.count_nonzero(ate_arr < t)) / max(len(ate_arr), 1) for t in xs]
    summary = {
        "scenes": len(scenes),
        "mean_ate": float(np.nanmean(ates)) if ates else None,
        "success_rate_curve": {"thresholds": xs.tolist()[::32],
                               "fraction": curve[::32]},
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"per_scene": dict(zip(scenes, ates)), **summary}, f)


def cmd_view(args):
    """Export saved reconstruction(s) as a PLY point cloud.

    Multiple --reconstruction paths produce one fused cloud; with
    --color_by_session each map's points are tinted a distinct hue, the
    multi-map viewer behavior of the reference (vis_two.py:1-122,
    s_visualization.py:42-65 hsv session colors)."""
    import colorsys

    from .viz import export_ply, reconstruction_pointcloud

    paths = args.reconstruction
    all_pts, all_cols = [], []
    for i, path in enumerate(paths):
        state = dict(np.load(path, allow_pickle=True))
        pts, cols = reconstruction_pointcloud(state)
        if args.color_by_session and len(paths) > 1:
            tint = np.asarray(
                colorsys.hsv_to_rgb(i / max(len(paths), 1), 1.0, 1.0)
            )
            cols = 0.4 * cols + 0.6 * tint[None]
        all_pts.append(pts)
        all_cols.append(cols)
        print(f"{path}: {len(pts)} points")
    pts = np.concatenate(all_pts, axis=0)
    cols = np.concatenate(all_cols, axis=0)
    export_ply(args.out, pts, cols)
    print(f"wrote {len(pts)} points to {args.out}")


def cmd_multisession(args):
    """Stages 2+3 of the multisession pipeline over saved session npz files
    (reference Euroc_Multisession_Stereo/{AdjustCoordinates,BackendAllMaps}.py)."""
    import glob as _glob

    from .multisession import fuse_maps
    from .utils import EUROC_CONFIG
    from .engine.droid import init_params

    cfg = _config_from_args(EUROC_CONFIG.replace(stereo=args.stereo), args)
    params = init_params(cfg)
    states = []
    for p in sorted(_glob.glob(os.path.join(args.sessions, "*", "reconstruction.npz"))):
        states.append(dict(np.load(p, allow_pickle=True)))
        print(f"loaded {p}: {len(states[-1]['poses'])} keyframes")
    fused = fuse_maps(cfg, params, states, subsample=args.subsample)
    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(os.path.join(args.out, "fused.npz"), **fused)
    print(f"fused map: {len(fused['poses'])} keyframes -> {args.out}/fused.npz")


def cmd_multisession_align(args):
    """Stage 2 / 2v2: align map B into map A's frame via warm-started loop
    replay (reference AdjustCoordinates.py:107-236), optionally through the
    quality-gated ImproveAdjust driver (reference ImproveAdjust.py:204-337).

    --spec is a JSON file:
      {"groups": [{"seed_idx": [...], "frame_idx": [...], "old_idx": [...],
                   "imagedir": "path", "calib": "calib.txt"}, ...]}
    seed_idx indexes map A's keyframes; frame_idx is the group's matched
    frame ordering (increasing = forward); old_idx indexes map B's keyframes
    (plain align mode).
    """
    from .data import generic_image_stream
    from .engine.droid import init_params
    from .multisession import align_pair
    from .multisession.pipeline import improve_adjust
    from .utils import EUROC_CONFIG

    cfg = _config_from_args(EUROC_CONFIG.replace(stereo=args.stereo), args)
    params = init_params(cfg)
    first = dict(np.load(args.first, allow_pickle=True))
    spec = json.load(open(args.spec))
    ta = cfg.image_size[0] * cfg.image_size[1]

    def factory(g):
        return lambda: generic_image_stream(g["imagedir"], g["calib"], 1,
                                            target_area=ta)

    os.makedirs(args.out, exist_ok=True)
    if args.improve:
        groups = [dict(seed_idx=g["seed_idx"], frame_idx=g["frame_idx"],
                       stream_factory=factory(g), name=g.get("name", i))
                  for i, g in enumerate(spec["groups"])]
        state, report = improve_adjust(cfg, params, first, groups,
                                       bad_limit=args.bad_limit)
        print(json.dumps({"report": report, "recovered": state is not None}))
        if state is not None:
            np.savez_compressed(os.path.join(args.out, "recovered.npz"), **state)
    else:
        if args.second is None:
            raise SystemExit(
                "multisession-align: --second is required unless --improve")
        second = dict(np.load(args.second, allow_pickle=True))
        runs = [(np.asarray(g["seed_idx"]), np.asarray(g["old_idx"]), factory(g))
                for g in spec["groups"]]
        T, new_poses, rows = align_pair(cfg, params, first, second, runs)
        np.savez_compressed(os.path.join(args.out, "aligned.npz"),
                            T=T, poses=new_poses, rows=rows)
        out = {"T": np.asarray(T).tolist(), "rows": len(rows)}
        if not args.no_joint:
            # stage 2 ends with a joint global backend over the concatenated
            # pair (reference AdjustCoordinates.py:219-229)
            from .multisession.pipeline import joint_backend

            second_t = dict(second)
            second_t["poses"] = np.asarray(new_poses)
            refined = joint_backend(cfg, params, [first, second_t])
            np.savez_compressed(
                os.path.join(args.out, "aligned_joint.npz"),
                poses_first=refined[0], poses_second=refined[1], T=T,
            )
            out["joint"] = "aligned_joint.npz"
        print(json.dumps(out))


def cmd_multisession_evaluate(args):
    """Stage 4 (reference Whole_Evaluate.py:142-225): per-sequence pose fill
    from the fused map, concatenated ATE vs concatenated groundtruth.

    --spec JSON: {"sequences": [{"start": a, "stop": b, "imagedir": ...,
                                 "calib": ..., "gt": "file.txt"}, ...]}
    """
    from .data import generic_image_stream
    from .engine.droid import init_params
    from .multisession.pipeline import evaluate_fused_map
    from .utils import EUROC_CONFIG

    cfg = _config_from_args(EUROC_CONFIG.replace(stereo=args.stereo), args)
    params = init_params(cfg)
    fused = dict(np.load(args.fused, allow_pickle=True))
    spec = json.load(open(args.spec))
    slices = [(s["start"], s["stop"]) for s in spec["sequences"]]
    ta = cfg.image_size[0] * cfg.image_size[1]
    streams = [
        (lambda s=s: generic_image_stream(s["imagedir"], s["calib"], 1,
                                          target_area=ta))
        for s in spec["sequences"]
    ]
    gts = None
    if all("gt" in s for s in spec["sequences"]):
        gts = [np.loadtxt(s["gt"]) for s in spec["sequences"]]
    trajs, res = evaluate_fused_map(cfg, params, fused, slices, streams,
                                    gts=gts, correct_scale=not args.stereo)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        for i, tr in enumerate(trajs):
            np.save(os.path.join(args.out, f"traj_{i}.npy"), tr)
    print(json.dumps({"ate": res, "sequences": len(trajs)}))


def cmd_train(args):
    """Training loop with the reference's full behavior (train.py:43-186):
    50/50 covisibility-vs-temporal graph sampling per item (:88-94), random
    pose restarts with gradient accumulation (:102-118), background-thread
    data prefetch (the TPU analog of the reference's worker DataLoader
    :61-66), and multi-host rendezvous (:28-36)."""
    import queue
    import threading

    import jax
    import jax.numpy as jnp

    from .data import dataset_factory
    from .lie import se3_inv
    from .parallel import init_distributed
    from .train import Logger, TrainConfig, init_train_state
    from .train.step import make_train_step_dynamic, sample_frame_graph

    init_distributed()
    crop = tuple(args.image_size)
    cfg = TrainConfig(
        name=args.name, lr=args.lr, steps=args.steps, batch=args.batch,
        n_frames=args.n_frames, iters=args.iters, image_size=crop,
    )
    os.makedirs("checkpoints", exist_ok=True)
    # scene-index cache lives under the dataset root so different datasets
    # (and test fixtures) never share a stale pickle
    db = dataset_factory(["tartan"], datapath=args.datapath,
                         n_frames=cfg.n_frames, fmin=cfg.fmin, fmax=cfg.fmax,
                         crop_size=crop,
                         cache_dir=os.path.join(args.datapath, ".droid_cache"))
    grad_step, apply_step = make_train_step_dynamic(cfg)

    # --- data parallelism over every device of every process (the DDP
    # analog, reference train.py:28-36,174-186): the per-process batch is
    # assembled into ONE global array sharded over a "dp" mesh spanning
    # jax.devices(); params/opt stay replicated, so jit/GSPMD inserts the
    # cross-replica gradient reduction that DDP does in backward().
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as JP

    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    use_dp = jax.device_count() > 1 and cfg.batch % n_local == 0
    if n_proc > 1 and not use_dp:
        raise SystemExit(
            f"multi-host training needs --batch divisible by the "
            f"{n_local} local devices (got {cfg.batch})"
        )
    if use_dp:
        mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
        dp_sh = NamedSharding(mesh, JP("dp"))
        rep_sh = NamedSharding(mesh, JP())

        def put_batch(x):
            x = np.asarray(x)
            if n_proc > 1:
                return jax.make_array_from_process_local_data(dp_sh, x)
            return jax.device_put(x, dp_sh)

        def put_rep(x):
            return jax.device_put(jnp.asarray(x), rep_sh)
    else:
        put_batch = jnp.asarray
        put_rep = jnp.asarray

    params, opt_state = init_train_state(cfg, image_size=cfg.image_size)
    start_step = 0
    if args.ckpt:
        from .train import load_ckpt

        params, opt2, start_step = load_ckpt(args.ckpt)
        if opt2 is not None:
            # full resume: Adam moments + schedule position + loop step
            # (reference train.py:57-58 restores weights only)
            opt_state = opt2
    if use_dp:
        params = jax.device_put(params, rep_sh)
        opt_state = jax.device_put(opt_state, rep_sh)
    logger = Logger(cfg.name)
    restart_prob = getattr(args, "restart_prob", 0.2)
    # fixed edge pad: covers the r=2 temporal graph AND the covisibility
    # sampler's num_edges=24 (step.py:205 silently truncates past e_pad)
    e_pad = max(4 * cfg.n_frames, 24)

    # background prefetch: sample items + per-item graph off the step loop
    q = queue.Queue(maxsize=4)
    stop = threading.Event()

    def producer():
        # rngs are seeded PER STEP INDEX (not stateful across the run) so a
        # resumed run replays the exact data order of an uninterrupted one:
        # item sampling varies by process, graph sampling must agree across
        # processes (one graph per GLOBAL batch, like the single-process
        # loop shares one graph per batch) so it excludes process_index
        t = start_step
        try:
            while not stop.is_set():
                prng = np.random.default_rng((54321, jax.process_index(), t))
                grng = np.random.default_rng((98765, t))
                idx = prng.integers(0, len(db), size=cfg.batch)
                items = [db[int(i)] for i in idx]
                images = np.stack([x[0] for x in items])
                poses = np.stack([x[1] for x in items])
                disps = np.stack([x[2] for x in items])
                intr = np.stack([x[3] for x in items])
                ii, jj, emask = sample_frame_graph(
                    grng, poses, disps, intr, cfg.n_frames, e_pad)
                t += 1
                while not stop.is_set():
                    try:
                        q.put((images, poses, disps, intr, ii, jj, emask),
                              timeout=5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface dataset errors to the main loop
            q.put(e)
            raise

    th = threading.Thread(target=producer, daemon=True)
    th.start()

    def next_item():
        while True:
            try:
                item = q.get(timeout=10)
            except queue.Empty:
                if not th.is_alive():
                    raise RuntimeError("data producer thread died")
                continue
            if isinstance(item, BaseException):
                raise RuntimeError("data producer failed") from item
            return item

    total = start_step
    try:
        while total < cfg.steps:
            images, poses, disps, intr, ii, jj, emask = next_item()
            # restart draws must be SHARED across processes (all replicas
            # run the same number of accumulation passes per optimizer
            # step, like DDP's lockstep backward) and replayable on resume
            rng = np.random.default_rng((12345, total))
            if n_proc > 1:
                # one graph per global batch: the covisibility graph depends
                # on local data, so take process 0's for every replica
                from jax.experimental import multihost_utils

                ii, jj, emask = multihost_utils.broadcast_one_to_all(
                    (ii, jj, emask))
            poses = put_batch(poses)
            Ps = se3_inv(poses)
            Gs0 = jnp.concatenate(
                [Ps[:, :1], jnp.repeat(Ps[:, 1:2], Ps.shape[1] - 1, axis=1)],
                axis=1,
            )
            disps = put_batch(disps)
            disp0 = jnp.ones_like(disps[:, :, 3::8, 3::8])
            batch = {
                "images": put_batch(images),
                "poses": poses,
                "disps": disps,
                "intrinsics": put_batch(intr),
                "ii": put_rep(ii), "jj": put_rep(jj),
                "emask": put_rep(emask),
                "Gs0": Gs0, "disp0": disp0,
            }

            # random-restart loop (reference train.py:102-118): accumulate
            # grads across passes, re-seed pose/disp init from the last
            # estimate, step the optimizer once.  Do-while: at least one
            # pass always runs (restart_prob=0 must still train)
            grads_acc = None
            metrics = None
            while True:
                grads, metrics, (Gs_last, disp_last) = grad_step(params, batch)
                grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
                    jnp.add, grads_acc, grads)
                batch = dict(batch, Gs0=Gs_last, disp0=disp_last)
                if rng.random() >= restart_prob:
                    break
            params, opt_state = apply_step(params, opt_state, grads_acc)

            logger.push({k: float(v) for k, v in metrics.items()})
            total += 1
            if total % args.save_every == 0 and jax.process_index() == 0:
                from .train import save_ckpt

                save_ckpt(f"checkpoints/{cfg.name}_{total:06d}.npz",
                          params, opt_state, total)
    finally:
        stop.set()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="droid_slam_reserch_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("demo")
    p.add_argument("--imagedir", required=True)
    p.add_argument("--calib", required=True)
    p.add_argument("--target_area", type=int, default=384 * 512,
                   help="resize frames so h*w ~= this (reference demo.py:66)")
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("euroc")
    p.add_argument("--datapath", required=True)
    p.add_argument("--gt", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--stereo", action="store_true")
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_euroc)

    p = sub.add_parser("tum")
    p.add_argument("--datapath", required=True)
    p.add_argument("--gt", default=None)
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_tum)

    p = sub.add_parser("eth3d")
    p.add_argument("--datapath", required=True)
    p.add_argument("--depth", action="store_true")
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_eth3d)

    p = sub.add_parser("tartanair")
    p.add_argument("--datapath", required=True)
    p.add_argument("--gt", default=None)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--split", action="store_true",
                   help="sweep the TartanAir test split + success-rate curve")
    p.add_argument("--id", type=int, default=-1, help="single split scene index")
    p.add_argument("--out", default=None, help="JSON results path (--split)")
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_tartanair)

    p = sub.add_parser("view")
    p.add_argument("--reconstruction", required=True, nargs="+",
                   help="one or more reconstruction.npz (multi-map fusion)")
    p.add_argument("--out", default="cloud.ply")
    p.add_argument("--color_by_session", action="store_true",
                   help="tint each map a distinct hue (reference vis_two.py)")
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("multisession")
    p.add_argument("--sessions", required=True, help="dir of session subdirs")
    p.add_argument("--out", required=True)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--subsample", type=int, default=2)
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_multisession)

    p = sub.add_parser("multisession-align")
    p.add_argument("--first", required=True, help="map A reconstruction.npz")
    p.add_argument("--second", default=None, help="map B reconstruction.npz")
    p.add_argument("--spec", required=True, help="loop-group JSON spec")
    p.add_argument("--out", required=True)
    p.add_argument("--stereo", action="store_true")
    p.add_argument("--improve", action="store_true",
                   help="quality-gated ImproveAdjust driver")
    p.add_argument("--bad_limit", type=int, default=4)
    p.add_argument("--no_joint", action="store_true",
                   help="skip the joint global backend over the aligned pair "
                        "(reference AdjustCoordinates.py:219-229)")
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_multisession_align)

    p = sub.add_parser("multisession-evaluate")
    p.add_argument("--fused", required=True, help="fused.npz")
    p.add_argument("--spec", required=True, help="sequence JSON spec")
    p.add_argument("--out", default=None)
    p.add_argument("--stereo", action="store_true")
    _add_slam_flags(p)
    p.set_defaults(fn=cmd_multisession_evaluate)

    p = sub.add_parser("train")
    p.add_argument("--datapath", required=True)
    p.add_argument("--ckpt", default=None, help="npz checkpoint to resume from")
    p.add_argument("--save_every", type=int, default=10000,
                   help="checkpoint every N steps (params + optimizer state "
                        "+ step; reference train.py:134-136 saves weights "
                        "only)")
    p.add_argument("--name", default="droid")
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--steps", type=int, default=250000)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--n_frames", type=int, default=7)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--image_size", type=int, nargs=2, default=[384, 512],
                   help="training crop H W (reference augmentation crop)")
    p.add_argument("--restart_prob", type=float, default=0.2,
                   help="random pose-restart probability (reference train.py:102)")
    p.set_defaults(fn=cmd_train)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
