#!/usr/bin/env python
"""Inference CLI — reference-compatible flags (reference evaluate.py:95-109),
with the reference's staleness fixed (quirk q1) and two extra modes.

  --source r          reconstruction: frame 0 drives the rest of --driving
  --source f          frontalization of every frame in --driving
  --source <img>      cross-identity reenactment from a source image
  --source s          expression sampling from the EFE latent (configs[5])
  --source i          expression interpolation between first/last frame
  --source m          QUANTITATIVE eval: recon L1/MSE/PSNR over the FULL test
                      split (--driving = dataset ROOT), batched driving, with
                      per-video records + L1/PSNR distribution; prints one
                      JSON line and (--metrics_out) writes the full artifact.
                      The north-star metric (BASELINE.json recon L1) measured
                      on a checkpoint — the reference only ever eyeballs gifs
                      (evaluate.py:22-45).
  --source p          cross-identity reenactment over PairedDataset pairs
                      (--driving = dataset ROOT; reference dataset.py:154-181)

Writes a side-by-side gif to --output (modes r/f/s/i/p).
"""
import argparse
import os


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="face-vid2vid")
    parser.add_argument("--ckp_dir", type=str, default="ckp")
    parser.add_argument("--output", type=str, default="output.gif")
    parser.add_argument("--ckp", type=int, default=0, help="Checkpoint epoch")
    parser.add_argument("--source", type=str, default="r",
                        help="r=reconstruction, f=frontalization, s=sampling, "
                             "i=interpolation, m=metrics, p=pairs, or a "
                             "source image path")
    parser.add_argument("--driving", type=str, required=True,
                        help="Driving frame dir (modes m/p: dataset root)")
    parser.add_argument("--num_frames", type=int, default=90)
    parser.add_argument("--num_videos", type=int, default=0,
                        help="mode m: test videos to evaluate (0 = full split)")
    parser.add_argument("--eval_batch", type=int, default=8,
                        help="mode m: driving frames per dispatch")
    parser.add_argument("--metrics_out", type=str, default="",
                        help="mode m: also write the JSON artifact here")
    parser.add_argument("--num_pairs", type=int, default=4,
                        help="mode p: PairedDataset pairs to animate")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--tiny", type=lambda s: s.lower().startswith("t"), default=False)
    parser.add_argument("--use_efe", type=lambda s: s.lower().startswith("t"), default=True,
                        help="False reproduces the reference's pre-EFE path")
    return parser.parse_args(argv)


def eval_metrics(pipe, root_dir, image_size, num_videos, num_frames,
                 batch: int = 8):
    """Recon L1/MSE/PSNR over the test split: frame 0 of each test video is
    the source, every later frame is re-driven and compared to ground truth.

    A parity INSTRUMENT, not a smoke metric (the reference only eyeballs
    gifs, evaluate.py:22-45): num_videos=0 evaluates the FULL test split,
    frames drive in batches of `batch` per dispatch, and the result carries
    the per-video L1/PSNR records plus their distribution so a trained-
    checkpoint regression is detectable round-over-round (diff the JSON)."""
    import numpy as np
    import jax.numpy as jnp
    from facevae_tpu.data import FramesDataset

    ds = FramesDataset(root_dir, frame_shape=(image_size, image_size, 3),
                       is_train=False)
    n_videos = len(ds) if num_videos <= 0 else min(len(ds), num_videos)
    per_video, n_frames = [], 0
    for vid_idx in range(n_videos):
        video = np.asarray(ds[vid_idx], np.float32)[:num_frames]
        if video.shape[0] < 2:
            continue
        fs, kp_c, kp_s, Rs = pipe.encode_source(jnp.asarray(video[:1]))
        gt_all = video[1:]
        gens = []
        for off in range(0, gt_all.shape[0], batch):
            chunk = gt_all[off:off + batch]
            pad = batch - chunk.shape[0]
            if pad:                          # fixed B: one compile total
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            out = np.asarray(pipe.drive_batch(fs, kp_c, kp_s, Rs,
                                              jnp.asarray(chunk)))
            gens.append(out[:batch - pad] if pad else out)
        gen = np.concatenate(gens).clip(0.0, 1.0)
        v_l1 = float(np.abs(gen - gt_all).mean())
        v_mse = float(((gen - gt_all) ** 2).mean())
        per_video.append({
            "video": ds.videos[vid_idx],
            "frames": int(gt_all.shape[0]),
            "l1": round(v_l1, 6),
            "mse": round(v_mse, 6),
            "psnr_db": round(float(10.0 * np.log10(1.0 / max(v_mse, 1e-12))), 3),
        })
        n_frames += int(gt_all.shape[0])

    weights = np.asarray([v["frames"] for v in per_video], np.float64)
    l1s = np.asarray([v["l1"] for v in per_video])
    mses = np.asarray([v["mse"] for v in per_video])
    psnrs = np.asarray([v["psnr_db"] for v in per_video])
    mse = float(np.average(mses, weights=weights))

    def dist(x):
        return {"p10": round(float(np.percentile(x, 10)), 6),
                "p50": round(float(np.percentile(x, 50)), 6),
                "p90": round(float(np.percentile(x, 90)), 6)}

    return {
        "metric": "recon_eval",
        "recon_l1": round(float(np.average(l1s, weights=weights)), 6),
        "recon_mse": round(mse, 6),
        "psnr_db": round(float(10.0 * np.log10(1.0 / max(mse, 1e-12))), 3),
        "frames": n_frames,
        "videos": len(per_video),
        "l1_dist": dist(l1s),
        "psnr_dist": dist(psnrs),
        "per_video": per_video,
    }


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    import imageio.v2 as imageio
    import jax
    from facevae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from facevae_tpu.config import Config, ModelConfig, tiny_config
    from facevae_tpu.data.dataset import _imread_float
    from facevae_tpu.ops.interpolate import interpolate_nearest_2d
    from facevae_tpu.train import create_train_state, load_checkpoint
    from facevae_tpu.train.inference import InferencePipeline

    cfg = tiny_config(image_size=args.image_size) if args.tiny else \
        Config(model=ModelConfig(image_size=args.image_size))
    state = create_train_state(cfg, seed=0)
    state = load_checkpoint(args.ckp_dir, args.ckp, state)
    pipe = InferencePipeline(cfg, state, use_efe=args.use_efe)

    if args.source == "m":
        import json
        out = eval_metrics(pipe, args.driving, args.image_size,
                           args.num_videos, args.num_frames,
                           batch=args.eval_batch)
        if args.metrics_out:
            with open(args.metrics_out, "w") as f:
                json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items() if k != "per_video"}))
        return out

    if args.source == "p":
        # cross-identity reenactment over PairedDataset pairs (the
        # reference's dormant pairs path, dataset.py:154-181): each pair's
        # source frame 0 is driven by the driving video; no ground truth
        # exists for cross-identity, so this mode is qualitative (gif strip)
        from facevae_tpu.data import FramesDataset, PairedDataset
        ds = FramesDataset(args.driving,
                           frame_shape=(args.image_size, args.image_size, 3),
                           is_train=False)
        paired = PairedDataset(ds, number_of_pairs=args.num_pairs)
        strips = []
        for i in range(len(paired)):
            item = paired[i]
            src = jnp.asarray(item["source_video"][:1], jnp.float32)
            drv = np.asarray(item["driving_video"], np.float32)[: args.num_frames]
            fs, kp_c, kp_s, Rs = pipe.encode_source(src)
            row = []
            for t in range(drv.shape[0]):
                img = jnp.asarray(drv[t][None])
                gen = pipe.drive_frame(fs, kp_c, kp_s, Rs, img)
                row.append(np.concatenate([np.asarray(src)[0],
                                           np.asarray(img)[0],
                                           np.asarray(gen)[0]], axis=1))
            strips.append(np.stack(row))
        n_frames = min(s.shape[0] for s in strips)
        frames_out = [
            (255 * np.concatenate([s[t] for s in strips], axis=0).clip(0, 1))
            .astype(np.uint8) for t in range(n_frames)]
        imageio.mimsave(args.output, frames_out)
        print(f"wrote {len(frames_out)} frames ({len(strips)} pairs) to {args.output}")
        return None

    frames = sorted(os.listdir(args.driving))[: args.num_frames]
    video = [_imread_float(os.path.join(args.driving, f)) for f in frames]
    video = [jnp.asarray(v, jnp.float32)[None] for v in video]

    def to_uint8(img_pair):
        out = np.asarray(img_pair)[0].clip(0, 1)
        return (255 * out).astype(np.uint8)

    output_frames = []
    if args.source == "r":
        fs, kp_c, kp_s, Rs = pipe.encode_source(video[0])
        for img in video[1:]:
            gen = pipe.drive_frame(fs, kp_c, kp_s, Rs, img)
            output_frames.append(to_uint8(jnp.concatenate([img, gen], axis=2)))
    elif args.source == "f":
        for img in video:
            gen = pipe.frontalize_frame(img)
            output_frames.append(to_uint8(jnp.concatenate([img, gen], axis=2)))
    elif args.source == "s":
        key = jax.random.PRNGKey(0)
        for i, img in enumerate(video):
            gen = pipe.sample_expression(img, jax.random.fold_in(key, i),
                                         jnp.asarray(1.0))
            output_frames.append(to_uint8(jnp.concatenate([img, gen], axis=2)))
    elif args.source == "i":
        s_img, d_img = video[0], video[-1]
        n = max(2, len(video))
        for i in range(n):
            alpha = jnp.asarray(i / (n - 1), jnp.float32)
            gen = pipe.interpolate_expression(s_img, d_img, alpha)
            output_frames.append(to_uint8(jnp.concatenate([s_img, gen, d_img], axis=2)))
    else:
        s = _imread_float(args.source)[None]
        s = interpolate_nearest_2d(jnp.asarray(s), (args.image_size, args.image_size))
        fs, kp_c, kp_s, Rs = pipe.encode_source(s)
        for img in video:
            gen = pipe.drive_frame(fs, kp_c, kp_s, Rs, img)
            output_frames.append(to_uint8(jnp.concatenate([img, gen], axis=2)))

    imageio.mimsave(args.output, output_frames)
    print(f"wrote {len(output_frames)} frames to {args.output}")


if __name__ == "__main__":
    main()
