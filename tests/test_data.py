"""Data pipeline tests: synthetic dataset round-trip, augmentation parity
properties, prefetch loader sharding, on-device augmentation."""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facevae_tpu.data import FramesDataset, DatasetRepeater, PairedDataset, PrefetchLoader
from facevae_tpu.data.augmentation import AllAugmentationTransform, ColorJitter, RandomRotation
from facevae_tpu.data.device_aug import augment_batch
from facevae_tpu.config import DataConfig


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fakedata"))
    subprocess.run([sys.executable, "tools/make_synthetic_data.py", out,
                    "--num_ids", "4", "--clips_per_id", "2", "--frames", "6",
                    "--size", "64"], check=True)
    return out


def test_frames_dataset(data_dir):
    ds = FramesDataset(data_dir, frame_shape=(64, 64, 3), id_sampling=True, is_train=True)
    assert len(ds) == 4                      # identities, not clips
    s, d, s_a, d_a = ds[0]
    for arr in (s, d, s_a, d_a):
        assert arr.shape == (64, 64, 3) and arr.dtype == np.float32
        assert 0.0 <= arr.min() and arr.max() <= 1.0

    test_ds = FramesDataset(data_dir, frame_shape=(64, 64, 3), is_train=False)
    video = test_ds[0]
    assert video.ndim == 4 and video.shape[-1] == 3

    rep = DatasetRepeater(ds, num_repeats=10)
    assert len(rep) == 40
    paired = PairedDataset(test_ds, number_of_pairs=1)
    item = paired[0]
    assert "driving_video" in item and "source_video" in item


def test_frames_dataset_uint8_fast_path(data_dir):
    """on_device_aug items: raw uint8 (source, driving) pairs, no CPU
    transform — the fused aug runs inside the train step and the transfer is
    4x smaller than the reference's float32 DataLoader path (train.py:16)."""
    ds = FramesDataset(data_dir, frame_shape=(64, 64, 3), on_device_aug=True)
    item = ds[0]
    assert len(item) == 2
    for arr in item:
        assert arr.shape == (64, 64, 3) and arr.dtype == np.uint8
    # loader stacks the 2-tuple items into 2 batch arrays
    loader = PrefetchLoader(DatasetRepeater(ds, 10), batch_size=4, num_workers=2)
    batch = next(iter(loader))
    assert len(batch) == 2 and batch[0].shape == (4, 64, 64, 3)
    assert batch[0].dtype == np.uint8


def test_prefetch_loader_sharding(data_dir):
    ds = DatasetRepeater(FramesDataset(data_dir, frame_shape=(64, 64, 3)), 10)
    loaders = [PrefetchLoader(ds, batch_size=4, num_workers=2, shard=(i, 2), seed=0)
               for i in range(2)]
    assert len(loaders[0]) == len(ds) // 2 // 4
    b0 = next(iter(loaders[0]))
    assert len(b0) == 4 and b0[0].shape == (4, 64, 64, 3)
    # different shards see different indices (same epoch perm, disjoint slices)
    i0 = loaders[0]._indices()
    i1 = loaders[1]._indices()
    assert set(i0).isdisjoint(set(i1))


def test_device_frame_cache(data_dir):
    """HBM-resident cache: all frames decoded once; batches sampled by
    device-side gather with FramesDataset semantics (identity -> clip ->
    2 sorted frames)."""
    from facevae_tpu.data.device_cache import DeviceFrameCache, CachedLoader
    cache = DeviceFrameCache(data_dir, frame_shape=(64, 64, 3), num_workers=2)
    assert cache.num_identities == 4
    assert cache.frames.shape == (4 * 2 * 6, 64, 64, 3)     # ids*clips*frames
    assert cache.frames.dtype == jnp.uint8

    rng_np = np.random.RandomState(0)
    s_idx, d_idx = cache.sample_indices(rng_np, 16)
    # source frame never after driving (sorted 2-frame draw, dataset.py:107)
    assert (s_idx <= d_idx).all()
    # both frames always inside one clip
    clip_of = np.searchsorted(cache.clip_start, s_idx, side="right") - 1
    assert (d_idx < cache.clip_start[clip_of] + cache.clip_count[clip_of]).all()

    s = cache.gather(s_idx)
    assert s.shape == (16, 64, 64, 3) and s.dtype == jnp.uint8
    # gather matches direct indexing
    np.testing.assert_array_equal(np.asarray(s),
                                  np.asarray(cache.frames)[s_idx])

    loader = CachedLoader(cache, batch_size=4, num_items=40, seed=0)
    assert len(loader) == 10
    batches = list(iter(loader))
    assert len(batches) == 10 and batches[0][0].shape == (4, 64, 64, 3)
    # different epochs draw different indices
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.array_equal(np.asarray(batches[0][0]), np.asarray(b1[0]))


def test_cpu_augmentation_properties(rng):
    frame = rng.rand(64, 64, 3).astype(np.float32)
    aug = AllAugmentationTransform(
        rotation_param={"degrees": 30},
        perspective_param={"pers_num": 30, "enlarge_num": 40},
        jitter_param={"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0.1})
    out = aug([frame])[0]
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()
    assert not np.allclose(out, frame)     # actually transformed

    # jitter-only at 0 strength on uint8-exact input is identity up to quantization
    jit0 = ColorJitter(brightness=0, contrast=0, saturation=0, hue=0)
    exact = np.round(frame * 255) / 255
    np.testing.assert_allclose(jit0([exact.astype(np.float32)])[0], exact, atol=1 / 254)

    # rotation by ~0 degrees is near-identity
    rot = RandomRotation((0.0, 1e-6))
    np.testing.assert_allclose(rot([frame])[0], frame, atol=1e-3)


def test_device_augmentation(rng):
    frames = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    cfg = DataConfig()
    out = jax.jit(lambda k, f: augment_batch(k, f, cfg))(jax.random.PRNGKey(0), frames)
    assert out.shape == frames.shape
    assert bool(jnp.isfinite(out).all())
    assert bool(((out >= 0) & (out <= 1)).all())
    # different per-frame draws
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # deterministic under the same key
    out2 = jax.jit(lambda k, f: augment_batch(k, f, cfg))(jax.random.PRNGKey(0), frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_train_loop_scan_mode(data_dir, tmp_path):
    """Loop-level scan mode: device-cache loader + steps_per_call>1 runs the
    lax.scan dispatcher end-to-end — NO steps dropped (the len%K remainder
    runs as one final smaller chunk), add.txt lines for every step,
    checkpoint written, vis PNG written."""
    import dataclasses
    from facevae_tpu.config import tiny_config
    from facevae_tpu.data.device_cache import DeviceFrameCache, CachedLoader
    from facevae_tpu.train import create_train_state
    from facevae_tpu.train.loop import train_loop

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, num_epochs=1, steps_per_call=2,
        ckp_dir=str(tmp_path / "ckp"), vis_dir=str(tmp_path / "vis"),
        log_file=str(tmp_path / "log.txt")))
    cache = DeviceFrameCache(data_dir, frame_shape=(64, 64, 3), num_workers=2)
    # 5 steps of batch 2 -> 2 chunks of K=2 + a remainder chunk of 1
    loader = CachedLoader(cache, batch_size=2, num_items=10, seed=0)
    chunks = list(loader.iter_index_chunks(2))
    assert [c[0].shape[0] for c in chunks] == [2, 2, 1]

    state = create_train_state(cfg, seed=0)
    state = train_loop(cfg, state, loader)
    assert int(state.step) == 5                 # all len(loader) steps ran

    # add.txt grammar: ONE epoch-mean G line + one D line per epoch
    lines = open(cfg.train.log_file).read().strip().splitlines()
    g_lines = [l for l in lines if l.startswith("G00000000)")]
    d_lines = [l for l in lines if l.startswith("D00000000)")]
    assert len(g_lines) == 1 and len(d_lines) == 1
    assert os.path.exists(os.path.join(cfg.train.ckp_dir,
                                       "00000000-checkpoint.msgpack"))
    vis = os.listdir(cfg.train.vis_dir)
    assert any(f.endswith("-rec.png") for f in vis)


def test_device_frame_cache_sharded(data_dir):
    """Mesh-sharded cache: identities round-robin over shards
    (DistributedSampler stride parity, reference train.py:15-16), frames laid
    out shard-major with per-shard padding, sample_indices returns
    shard-LOCAL indices whose gather matches direct host indexing."""
    from facevae_tpu.data.device_cache import DeviceFrameCache
    from facevae_tpu.parallel import make_mesh

    mesh = make_mesh(2)
    cache = DeviceFrameCache(data_dir, frame_shape=(64, 64, 3),
                             num_workers=2, mesh=mesh)
    assert cache.n_shards == 2
    assert cache.shard_identities == [[0, 2], [1, 3]]
    # 2 ids x 2 clips x 6 frames per shard -> S = 24, no padding waste
    assert cache.shard_size == 24
    assert cache.frames.shape == (48, 64, 64, 3)

    rng_np = np.random.RandomState(0)
    s_idx, d_idx = cache.sample_indices(rng_np, 8)
    assert (s_idx <= d_idx).all()
    assert (s_idx < cache.shard_size).all()          # shard-LOCAL
    # both frames of a pair stay inside one clip of the right shard
    flat_s, flat_d = cache.to_flat(s_idx), cache.to_flat(d_idx)
    s = np.asarray(cache.gather(s_idx))
    np.testing.assert_array_equal(s, np.asarray(cache.frames)[flat_s])
    # shard-major layout: first half of the batch gathers from shard 0's
    # [0, S) flat block, second half from shard 1's [S, 2S)
    S = cache.shard_size
    assert (flat_s[:4] < S).all() and (flat_s[4:] >= S).all()

    # unsharded cache on the same data sees identical frame CONTENT
    cache1 = DeviceFrameCache(data_dir, frame_shape=(64, 64, 3), num_workers=2)
    f_sharded = np.asarray(cache.frames)
    f_flat = np.asarray(cache1.frames)
    assert sorted(map(bytes, f_sharded)) == sorted(map(bytes, f_flat))
