"""L0 dataset-prep CLI: crop/resize/save pipeline on a local synthetic video."""
import os
import subprocess
import sys

import numpy as np
import imageio.v2 as imageio
import pandas as pd


def test_load_videos_crop_pipeline(tmp_path):
    # synthetic source video as a PNG-frame dir (no ffmpeg backend in this env)
    video_dir = tmp_path / "videos"
    out_dir = tmp_path / "out"
    (video_dir / "vid0").mkdir(parents=True)
    for i in range(12):
        frame = (np.random.RandomState(i).rand(128, 128, 3) * 255).astype(np.uint8)
        imageio.imsave(str(video_dir / "vid0" / f"{i:07d}.png"), frame)

    meta = pd.DataFrame([{
        "video_id": "vid0#000", "start": 0, "end": 5,
        "bbox": "16-16-112-112", "fps": 25, "height": 128, "width": 128,
        "partition": "train", "person_id": "id9"}])
    meta_path = tmp_path / "meta.csv"
    meta.to_csv(meta_path, index=False)

    subprocess.run([sys.executable, "datasets/load_videos.py",
                    "--video_folder", str(video_dir), "--metadata", str(meta_path),
                    "--out_folder", str(out_dir), "--format", ".png",
                    "--image_shape", "64,64", "--youtube", "/nonexistent"],
                   check=True, capture_output=True)

    train = os.listdir(out_dir / "train")
    assert len(train) == 1
    # reference naming: person_id # reversed-video_id # zfill(start) # zfill(end)
    assert train[0] == "id9#000#vid0#000000#000005.png"
    clip_dir = out_dir / "train" / train[0]
    pngs = sorted(os.listdir(clip_dir))
    assert len(pngs) == 5                      # frames [0,5)
    img = imageio.imread(clip_dir / pngs[0])
    assert img.shape == (64, 64, 3)
