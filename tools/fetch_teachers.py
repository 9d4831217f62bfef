#!/usr/bin/env python
"""One-command teacher-weight ingest: download (when egress exists), verify,
convert to facevae_tpu npz artifacts, and check layouts end-to-end.

The reference downloads its frozen teachers at construction time:
  VGG19    https://download.pytorch.org/models/vgg19-dcbb9e9d.pth
           (/root/reference/losses.py:55-56)
  VGG-Face http://www.robots.ox.ac.uk/~albanie/models/pytorch-mcn/vgg_face_dag.pth
           (/root/reference/losses.py:80-81)
  Hopenet  hopenet_robust_alpha1.pkl — local file (trainer.py:224-229), shipped
           by github.com/natanielruiz/deep-head-pose (Google Drive id
           1m25PrSE7g9D2q2XJVMR6IA7RaCvWSzCR; no direct URL — download
           manually or via `gdown <id>`)

This build environment has NO egress, so downloads are gated: pass
--allow-download on a machine with network, or pre-place the files in
--cache-dir and the script only converts+verifies.

Usage (network machine):
  python tools/fetch_teachers.py --allow-download --out artifacts/
Usage (airgapped, files pre-fetched into ./teacher_cache/):
  python tools/fetch_teachers.py --cache-dir teacher_cache --out artifacts/

Verification layers:
  1. sha256 of each downloaded/cached file printed; VGG19 checked against the
     torchvision filename convention (first 8 hex == dcbb9e9d); any file
     checked against --sha256-<name> when given.
  2. structural check of the torch state dicts (key/shape spot checks).
  3. the converted npz is loaded into freshly-built teacher variable trees
     (facevae_tpu.losses.pretrained.load_pretrained), which raises on any
     path or shape mismatch — the same loader train.py uses.
"""
import argparse
import hashlib
import os
import sys
import urllib.request

URLS = {
    "vgg19": "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
    "vggface": "http://www.robots.ox.ac.uk/~albanie/models/pytorch-mcn/vgg_face_dag.pth",
}
FILENAMES = {
    "vgg19": "vgg19-dcbb9e9d.pth",
    "vggface": "vgg_face_dag.pth",
    "hopenet": "hopenet_robust_alpha1.pkl",
}
# torchvision names files <name>-<first 8 hex of sha256>.pth
VGG19_SHA_PREFIX = "dcbb9e9d"

# (key, shape) spot checks on the raw torch state dicts
STRUCTURE = {
    "vgg19": [("features.0.weight", (64, 3, 3, 3)),
              ("features.28.weight", (512, 512, 3, 3)),
              ("classifier.6.weight", (1000, 4096))],
    "vggface": [("conv1_1.weight", (64, 3, 3, 3)),
                ("conv5_1.weight", (512, 512, 3, 3)),
                ("fc8.weight", (2622, 4096))],
    "hopenet": [("conv1.weight", (64, 3, 7, 7)),
                ("layer4.2.conv3.weight", (2048, 512, 1, 1)),
                ("fc_yaw.weight", (66, 2048))],
}


def sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name, cache_dir, allow_download):
    path = os.path.join(cache_dir, FILENAMES[name])
    if os.path.exists(path):
        return path
    if name not in URLS:
        print(f"[{name}] no direct URL — download {FILENAMES[name]} manually "
              f"(see module docstring) into {cache_dir}/")
        return None
    if not allow_download:
        print(f"[{name}] missing from {cache_dir} and --allow-download not "
              f"set; expected {URLS[name]}")
        return None
    print(f"[{name}] downloading {URLS[name]} ...")
    urllib.request.urlretrieve(URLS[name], path)  # noqa: S310 — pinned URLs
    return path


def check_structure(name, sd):
    for key, shape in STRUCTURE[name]:
        if key not in sd:
            raise SystemExit(f"[{name}] structural check FAILED: missing {key}")
        got = tuple(sd[key].shape)
        if got != shape:
            raise SystemExit(f"[{name}] structural check FAILED: {key} has "
                             f"shape {got}, expected {shape}")
    print(f"[{name}] structural check ok ({len(sd)} tensors)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cache-dir", default="teacher_cache")
    p.add_argument("--out", default="artifacts")
    p.add_argument("--allow-download", action="store_true",
                   help="fetch from the pinned URLs (needs egress)")
    for n in FILENAMES:
        p.add_argument(f"--sha256-{n}", default=None,
                       help=f"expected sha256 of {FILENAMES[n]}")
    p.add_argument("--no-verify-hash", action="store_true",
                   help="skip the VGG19 filename-hash gate (synthetic-file "
                        "tests only; real artifacts should pass it)")
    args = p.parse_args(argv)
    os.makedirs(args.cache_dir, exist_ok=True)
    os.makedirs(args.out, exist_ok=True)

    import torch
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.convert_torch_weights import (VGG19_IDX, VGGFACE_NAMES,
                                             convert_vgg, convert_hopenet)

    converted = []
    for name in FILENAMES:
        path = fetch(name, args.cache_dir, args.allow_download)
        if path is None:
            continue
        digest = sha256(path)
        print(f"[{name}] sha256 {digest}")
        expect = getattr(args, f"sha256_{name}")
        if expect and digest != expect:
            raise SystemExit(f"[{name}] sha256 MISMATCH: expected {expect}")
        if (name == "vgg19" and not args.no_verify_hash
                and not digest.startswith(VGG19_SHA_PREFIX)):
            raise SystemExit(f"[{name}] sha256 does not start with the "
                             f"torchvision filename hash {VGG19_SHA_PREFIX}")
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
        check_structure(name, sd)
        if name == "vgg19":
            from facevae_tpu.losses.vgg import VGG19_BLOCKS
            convert_vgg(sd, VGG19_BLOCKS, os.path.join(args.out, "vgg19.npz"),
                        lambda bi, ci: f"features.{VGG19_IDX[(bi, ci)]}"
                        if (bi, ci) in VGG19_IDX else None)
        elif name == "vggface":
            from facevae_tpu.losses.vgg import VGG16_BLOCKS
            convert_vgg(sd, VGG16_BLOCKS, os.path.join(args.out, "vggface.npz"),
                        lambda bi, ci: VGGFACE_NAMES.get((bi, ci)))
        else:
            convert_hopenet(sd, os.path.join(args.out, "hopenet.npz"))
        converted.append(name)

    if not converted:
        raise SystemExit("nothing converted (no files found/downloaded)")

    # end-to-end layout check: load the npz into real teacher trees with the
    # same loader train.py uses (raises on any path/shape mismatch).  Teacher
    # param shapes are config-independent, so the tiny config keeps this fast.
    from facevae_tpu.config import tiny_config
    from facevae_tpu.losses.pretrained import load_pretrained
    from facevae_tpu.train.state import create_train_state
    state = create_train_state(tiny_config(), seed=0)
    load_pretrained(state.teachers, args.out)
    print(f"layout check ok — artifacts in {args.out}/: "
          f"{', '.join(n + '.npz' for n in converted)}")
    print("train.py picks these up via --pretrained_dir", args.out)


if __name__ == "__main__":
    main()
