#!/usr/bin/env python
"""Inference CLI — reference-compatible flags (reference evaluate.py:95-109),
with the reference's staleness fixed (quirk q1) and two extra modes.

  --source r          reconstruction: frame 0 drives the rest of --driving
  --source f          frontalization of every frame in --driving
  --source <img>      cross-identity reenactment from a source image
  --source s          expression sampling from the EFE latent (configs[5])
  --source i          expression interpolation between first/last frame

Writes a side-by-side gif to --output.
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
                             "i=interpolation, or a source image path")
    parser.add_argument("--driving", type=str, required=True, help="Driving frame dir")
    parser.add_argument("--num_frames", type=int, default=90)
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--tiny", type=lambda s: s.lower().startswith("t"), default=False)
    parser.add_argument("--use_efe", type=lambda s: s.lower().startswith("t"), default=True,
                        help="False reproduces the reference's pre-EFE path")
    return parser.parse_args(argv)


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
