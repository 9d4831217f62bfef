#!/usr/bin/env python
"""Dataset preparation CLI (layer L0; reference datasets/load_videos.py).

Same CLI and on-disk output layout: reads a VoxCeleb-style metadata CSV
(video_id, start, end, bbox "l-t-r-b", fps, height, width, partition,
person_id), optionally downloads source videos, crops each chunk's bbox,
resizes to --image_shape, and writes
  out_folder/{train,test}/<person_id>#<chunk>#<video_id>#<start>#<end>.mp4
(or a PNG-frame directory with %07d.png frames for --format .png — the layout
FramesDataset consumes).

Differences from the reference:
  - download is gated: this environment has no egress, so --youtube is only
    invoked if the binary exists; otherwise videos must already be in
    --video_folder (the reference silently spawns youtube-dl).
  - resize uses cv2 INTER_AREA (antialiased downsample) instead of
    skimage.transform.resize (not available here) — equivalent output class.
  - multiprocessing works as in the reference (Pool.imap_unordered).
"""
from __future__ import annotations

import os
import subprocess
import warnings
from argparse import ArgumentParser
from itertools import cycle
from multiprocessing import Pool

import numpy as np
import cv2
import imageio.v2 as imageio
import pandas as pd
from tqdm import tqdm

warnings.filterwarnings("ignore")


def save(path, frames, fmt):
    if fmt == ".mp4":
        imageio.mimsave(path, frames)
    elif fmt == ".png":
        if os.path.exists(path):
            print(f"Warning: skipping video {os.path.basename(path)}")
            return
        os.makedirs(path)
        for j, frame in enumerate(frames):
            imageio.imsave(os.path.join(path, str(j).zfill(7) + ".png"), frame)
    else:
        raise SystemExit(f"Unknown format {fmt}")


def download(video_id, args):
    video_path = os.path.join(args.video_folder, video_id + ".mp4")
    if not (args.youtube and os.path.exists(args.youtube)):
        print(f"no downloader at {args.youtube!r}; expected {video_path} to exist")
        return video_path
    subprocess.call(
        [args.youtube, "-f", "''best/mp4''", "--write-auto-sub", "--write-sub",
         "--sub-lang", "en", "--skip-unavailable-fragments",
         "https://www.youtube.com/watch?v=" + video_id,
         "--output", video_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return video_path


def _resize_ubyte(crop, shape):
    out = cv2.resize(crop, (shape[1], shape[0]), interpolation=cv2.INTER_AREA)
    return out.astype(np.uint8)


def _open_source(video_folder, base_id, default_fps=25.0):
    """Yield (frames-iterator, fps).  Source is <id>.mp4, or a PNG-frame
    directory <id>/ (fallback for environments without an ffmpeg backend)."""
    mp4 = os.path.join(video_folder, base_id + ".mp4")
    if os.path.exists(mp4):
        reader = imageio.get_reader(mp4)
        return reader, reader.get_meta_data().get("fps", default_fps)
    frame_dir = os.path.join(video_folder, base_id)
    if os.path.isdir(frame_dir):
        files = sorted(os.listdir(frame_dir))
        return (imageio.imread(os.path.join(frame_dir, f)) for f in files), default_fps
    return None, None


def run(data):
    video_id, args = data
    base_id = video_id.split("#")[0]
    src = os.path.join(args.video_folder, base_id + ".mp4")
    if not os.path.exists(src) and not os.path.isdir(os.path.join(args.video_folder, base_id)):
        download(base_id, args)
    reader, fps = _open_source(args.video_folder, base_id)
    if reader is None:
        print(f"Can not load video {base_id}, broken link")
        return

    df = pd.read_csv(args.metadata)
    df = df[df["video_id"] == video_id]
    chunks = [{"start": df["start"].iloc[j], "end": df["end"].iloc[j],
               "bbox": list(map(int, df["bbox"].iloc[j].split("-"))),
               "frames": []} for j in range(df.shape[0])]
    ref_fps = df["fps"].iloc[0]
    ref_h, ref_w = df["height"].iloc[0], df["width"].iloc[0]
    partition = df["partition"].iloc[0]
    try:
        for i, frame in enumerate(reader):
            for entry in chunks:
                if entry["start"] * fps <= i * ref_fps < entry["end"] * fps:
                    left, top, right, bot = entry["bbox"]
                    left = int(left / (ref_w / frame.shape[1]))
                    top = int(top / (ref_h / frame.shape[0]))
                    right = int(right / (ref_w / frame.shape[1]))
                    bot = int(bot / (ref_h / frame.shape[0]))
                    crop = frame[top:bot, left:right]
                    if args.image_shape is not None:
                        crop = _resize_ubyte(crop, args.image_shape)
                    entry["frames"].append(crop)
    except Exception:
        pass       # truncated stream: keep what decoded (reference behavior)

    for entry in chunks:
        first_part = (df["person_id"].iloc[0] + "#") if "person_id" in df else ""
        first_part = first_part + "#".join(video_id.split("#")[::-1])
        name = (first_part + "#" + str(entry["start"]).zfill(6)
                + "#" + str(entry["end"]).zfill(6) + args.format)
        save(os.path.join(args.out_folder, partition, name), entry["frames"], args.format)


def main():
    parser = ArgumentParser()
    parser.add_argument("--video_folder", default="youtube-voxceleb")
    parser.add_argument("--metadata", default="vox-metadata.csv")
    parser.add_argument("--out_folder", default="vox")
    parser.add_argument("--format", default=".png")
    parser.add_argument("--workers", default=1, type=int)
    parser.add_argument("--youtube", default="./youtube-dl")
    parser.add_argument("--image_shape", default=(256, 256),
                        type=lambda x: None if x == "None" else tuple(map(int, x.split(","))))
    args = parser.parse_args()

    os.makedirs(args.video_folder, exist_ok=True)
    for partition in ("test", "train"):
        os.makedirs(os.path.join(args.out_folder, partition), exist_ok=True)

    df = pd.read_csv(args.metadata)
    video_ids = set(df["video_id"])
    print("Number of videos:", len(video_ids))
    with Pool(processes=args.workers) as pool:
        for _ in tqdm(pool.imap_unordered(run, zip(video_ids, cycle([args])))):
            pass


if __name__ == "__main__":
    main()
