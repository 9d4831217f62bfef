#!/usr/bin/env python
"""Training CLI — reference-compatible flags (reference train.py:24-54).

python train.py --root_dir <vox-png> --batch_size 8 --num_epochs 150 ...

Differences from the reference launcher: no mp.spawn / CUDA_VISIBLE_DEVICES /
MASTER_ADDR plumbing — one controller process drives all local devices
through a 1-axis mesh, and multi-host runs call jax.distributed.initialize
(env-configured).  --gpu_ids is accepted for CLI parity and interpreted as
"number of devices to use".
"""
import argparse
import os


def str2bool(s):
    return s.lower().startswith("t")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="face-vid2vid")
    parser.add_argument("--batch_size", default=8, type=int, help="Batch size per device")
    parser.add_argument("--benchmark", type=str2bool, default=True,
                        help="(parity flag; XLA autotunes regardless)")
    parser.add_argument("--gpu_ids", default=None, type=str,
                        help="parity flag: comma list; its length = number of devices")
    parser.add_argument("--lr", default=0.00005, type=float, help="Learning rate")
    parser.add_argument("--num_epochs", default=150, type=int)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--ckp_dir", type=str, default="ckp")
    parser.add_argument("--vis_dir", type=str, default="vis")
    parser.add_argument("--ckp", type=int, default=0,
                        help="Checkpoint epoch to resume (-1 = newest in ckp_dir)")
    parser.add_argument("--log_file", type=str, default="log.txt")
    parser.add_argument("--ext", type=str, default="", help="suffix appended to dirs/log")
    parser.add_argument("--root_dir", type=str, required=True, help="dataset path")
    # framework extensions
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--num_repeats", type=int, default=100)
    parser.add_argument("--train_vae", type=str2bool, default=False)
    parser.add_argument("--tiny", type=str2bool, default=False,
                        help="tiny 64px config (BASELINE configs[0])")
    parser.add_argument("--bf16", type=str2bool, default=False)
    parser.add_argument("--remat", type=str2bool, default=True,
                        help="rematerialize big forwards in the backward "
                             "(saves HBM, ~9%% slower; 256² batch<=8 fits "
                             "without it — bench.py runs remat off)")
    parser.add_argument("--cpu_aug", type=str2bool, default=False,
                        help="use the CPU-parity augmentation path")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--checkpoint_freq", type=int, default=1,
                        help="save a checkpoint every N epochs (reference: "
                             "every epoch, logger.py:183)")
    parser.add_argument("--keep_checkpoints", type=int, default=5,
                        help="retain only the N newest epoch checkpoints "
                             "(0 = keep all, the reference's ~240 GB/150-epoch "
                             "behavior); crash-saves are never pruned")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="with --device_cache: K train steps per XLA "
                             "dispatch (lax.scan over the HBM cache) — "
                             "removes ALL per-step host work; 8 is a good "
                             "default")
    parser.add_argument("--device_cache", type=str2bool, default=False,
                        help="decode the whole train split ONCE into device "
                             "HBM (uint8) and sample batches by device-side "
                             "gather — zero per-step pixel transfer; for "
                             "datasets that fit a few GiB")
    parser.add_argument("--debug_nans", type=str2bool, default=False,
                        help="trap the first NaN (reference detect_anomaly parity)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="write a jax.profiler trace of steps 10-14")
    parser.add_argument("--tensorboard", type=str2bool, default=False)
    parser.add_argument("--pretrained_dir", type=str, default="",
                        help="dir of converted teacher npz artifacts "
                             "(tools/fetch_teachers.py); empty = random-init "
                             "teachers (no egress)")
    args = parser.parse_args(argv)
    if args.ext:
        args.ckp_dir = args.ckp_dir + args.ext
        args.vis_dir = args.vis_dir + args.ext
        root, ext = os.path.splitext(args.log_file)
        args.log_file = root + args.ext + (ext or ".txt")
    return args


def build_config(args):
    import dataclasses
    from facevae_tpu.config import Config, ModelConfig, TrainConfig, DataConfig, tiny_config

    if args.tiny:
        cfg = tiny_config(image_size=args.image_size if args.image_size != 256 else 64)
    else:
        cfg = Config(model=ModelConfig(
            image_size=args.image_size,
            compute_dtype="bfloat16" if args.bf16 else "float32",
            remat=args.remat))
    train = TrainConfig(
        batch_size=args.batch_size, lr=args.lr, num_epochs=args.num_epochs,
        num_repeats=args.num_repeats, train_vae=args.train_vae,
        ckp_dir=args.ckp_dir, vis_dir=args.vis_dir, log_file=args.log_file,
        seed=args.seed, debug_nans=args.debug_nans,
        checkpoint_freq=args.checkpoint_freq,
        keep_checkpoints=args.keep_checkpoints,
        steps_per_call=args.steps_per_call,
        profile_dir=args.profile_dir, tensorboard=args.tensorboard)
    data = dataclasses.replace(cfg.data, root_dir=args.root_dir,
                               num_workers=args.num_workers,
                               on_device_aug=not args.cpu_aug,
                               frame_shape=(args.image_size, args.image_size, 3))
    loss = cfg.loss
    if args.pretrained_dir:
        loss = dataclasses.replace(loss, pretrained_dir=args.pretrained_dir)
    return dataclasses.replace(cfg, train=train, data=data, loss=loss)


def main(argv=None):
    args = parse_args(argv)
    cfg = build_config(args)

    # hang diagnosis: FACEVAE_WATCHDOG=<secs> dumps every thread's stack to
    # stderr on that period (non-fatal) — a stalled tunnel transfer then
    # leaves its smoking gun in the run log instead of a silent timeout
    wd = int(os.environ.get("FACEVAE_WATCHDOG", "0"))
    if wd > 0:
        import faulthandler
        import sys
        faulthandler.dump_traceback_later(wd, repeat=True, exit=False,
                                          file=sys.stderr)

    import jax
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from facevae_tpu.parallel import make_mesh, init_distributed, is_master, DATA_AXIS
    from facevae_tpu.data import FramesDataset, DatasetRepeater, PrefetchLoader
    from facevae_tpu.train import create_train_state, load_checkpoint
    from facevae_tpu.train.loop import train_loop

    init_distributed()
    n_devices = len(jax.devices())
    if args.gpu_ids:
        n_devices = min(n_devices, len(str(args.gpu_ids).strip("[]").split(",")))
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    axis = DATA_AXIS if mesh is not None else None

    global_batch = cfg.train.batch_size * n_devices
    if args.steps_per_call > 1 and not args.device_cache:
        raise SystemExit("--steps_per_call > 1 requires --device_cache "
                         "(the scan dispatcher samples from the HBM cache)")
    if args.device_cache:
        if args.cpu_aug:
            raise SystemExit("--device_cache requires the on-device aug path")
        from facevae_tpu.data.device_cache import DeviceFrameCache, CachedLoader
        # with a mesh the cache shards over the devices (identity round-robin,
        # DistributedSampler parity) and the scan program runs under shard_map
        cache = DeviceFrameCache(cfg.data.root_dir,
                                 frame_shape=cfg.data.frame_shape,
                                 num_workers=cfg.data.num_workers,
                                 mesh=mesh)
        loader = CachedLoader(cache, batch_size=global_batch,
                              num_items=cache.num_identities
                              * cfg.train.num_repeats,
                              seed=cfg.train.seed)
        if is_master():
            print(f"device cache: {cache.frames.shape[0]} frames "
                  f"({cache.frames.nbytes / 2**20:.0f} MiB) in HBM")
    else:
        # on-device aug (default): items are raw uint8 (source, driving)
        # pairs — the fused augmentation runs inside the train step and the
        # transfer is 4x smaller.  --cpu_aug keeps the reference's CPU
        # transform parity path.
        dataset = DatasetRepeater(
            FramesDataset(cfg.data.root_dir, frame_shape=cfg.data.frame_shape,
                          augmentation_params=None if args.cpu_aug else {},
                          on_device_aug=not args.cpu_aug),
            num_repeats=cfg.train.num_repeats)
        loader = PrefetchLoader(dataset, batch_size=global_batch,
                                num_workers=cfg.data.num_workers,
                                shard=(jax.process_index(), jax.process_count()),
                                seed=cfg.train.seed)

    state = create_train_state(cfg, seed=cfg.train.seed, axis_name=axis)
    start_epoch = 0
    ckp = args.ckp
    if ckp == -1:
        from facevae_tpu.train.checkpoint import latest_checkpoint_epoch
        latest = latest_checkpoint_epoch(cfg.train.ckp_dir)
        # resume even from epoch 0 (unlike the reference's `ckp > 0` gate,
        # train.py:18 — a run killed in epoch 1 leaves only 00000000-*)
        if latest is not None:
            state = load_checkpoint(cfg.train.ckp_dir, latest, state)
            start_epoch = int(state.epoch) + 1
            if is_master():
                print(f"resumed from epoch {latest} (latest), "
                      f"continuing at {start_epoch}")
        ckp = 0
    if ckp > 0:
        state = load_checkpoint(cfg.train.ckp_dir, ckp, state)
        start_epoch = int(state.epoch) + 1
        if is_master():
            print(f"resumed from epoch {ckp}, continuing at {start_epoch}")

    train_loop(cfg, state, loader, mesh=mesh, start_epoch=start_epoch)


if __name__ == "__main__":
    main()
