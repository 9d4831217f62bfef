"""Configuration tree for facevae_tpu.

The reference hardcodes every model hyperparameter as constructor defaults
(/root/reference/models.py:731-736,966,1001,1052,1093,1117) and selects model
variants by editing import lines (/root/reference/trainer.py:7-11).  Here the
whole stack is driven by one dataclass tree so tiny configs (tests, multi-chip
dry runs) and the full 256x256 config coexist.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shared model hyperparameters (reference: K=15, D=16, C=32 throughout)."""

    image_size: int = 256
    num_kp: int = 15                 # K keypoints
    depth: int = 16                  # D depth planes of 3D feature volumes
    app_channels: int = 32           # C appearance channels

    # AFE (reference models.py:922-945)
    afe_down_seq: Sequence[int] = (64, 128, 256)
    afe_n_res: int = 6

    # CKD (reference models.py:948-987)
    ckd_down_seq: Sequence[int] = (3, 64, 128, 256, 512, 1024)
    ckd_up_seq: Sequence[int] = (1024, 512, 256, 128, 64, 32)
    ckd_scale_factor: float = 0.25

    # HPE_EDE (reference models.py:990-1037)
    hpe_filters: Sequence[int] = (64, 256, 512, 1024, 2048)
    hpe_blocks: Sequence[int] = (3, 3, 5, 2)
    n_bins: int = 66

    # EFE variant selection + EFE_conv5 shape (reference models.py:724-799)
    efe_variant: str = "conv5"
    efe_down_seq: Sequence[int] = (3, 32, 64, 128, 256, 32)
    efe_up_seq: Sequence[int] = (256, 256, 128, 64, 32, 32)
    efe_n_res: int = 3
    efe_scale_factor: float = 0.25
    efe_use_vae: bool = True

    # MFE (reference models.py:1040-1082)
    mfe_down_seq: Sequence[int] = (80, 64, 128, 256, 512, 1024)
    mfe_up_seq: Sequence[int] = (1024, 512, 256, 128, 64, 32)
    mfe_compress: int = 4            # C2: fs compressed channels

    # Generator (reference models.py:1085-1111)
    gen_up_seq: Sequence[int] = (256, 128, 64)
    gen_n_res: int = 6
    gen_use_weight_norm: bool = True

    # Discriminator (reference models.py:1114-1139)
    disc_down_seq: Sequence[int] = (64, 128, 256, 512)
    disc_use_weight_norm: bool = True

    use_weight_norm: bool = False    # spectral norm on the non-GAN nets (reference default False)

    # dtype policy: compute dtype for conv-heavy paths; params and BN stats stay fp32.
    compute_dtype: str = "float32"   # "bfloat16" for the bf16 config
    # rematerialize the big nets' forwards during backward (trades ~30% FLOPs
    # for activation memory — required to fit 256² training in 16GB HBM)
    remat: bool = True

    @property
    def kp_spatial(self) -> Tuple[int, int, int]:
        """(D, H/4, W/4) heatmap/feature-volume spatial size."""
        return (self.depth, self.image_size // 4, self.image_size // 4)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference trainer.py:240-252)."""

    perceptual: float = 10.0         # P
    gan: float = 1.0                 # G
    feature_matching: float = 10.0   # F
    equivariance: float = 20.0       # E
    keypoint_prior: float = 10.0     # L
    headpose: float = 20.0           # H
    deformation_prior: float = 0.5   # D
    contrastive: float = 10.0        # C
    kl: float = 0.0                  # K (reference runs VAE in deterministic mode, q8)
    recon: float = 0.0               # R

    kp_prior_dt: float = 0.1
    kp_prior_zt: float = 0.33
    # Replicate the reference's stale-loop-variable image pyramid (only relu_5_1
    # at extra scales, quirk q3 at losses.py:145-150) unless fixed_pyramid=True.
    fixed_pyramid: bool = False
    n_scales: int = 3
    # Contrastive SimSiam head params are trainable-but-never-stepped in the
    # reference (quirk q7, logger.py:60-61).  Default mirrors that; True adds
    # them to the generator optimizer.
    train_contrastive_head: bool = False
    # Use real pretrained VGG19/VGG-Face/Hopenet weights if artifact files
    # exist (converted offline); otherwise deterministic random init.
    pretrained_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8              # per-device (reference train.py:31)
    lr: float = 5e-5
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    num_epochs: int = 150
    num_repeats: int = 100           # DatasetRepeater (reference train.py:14)
    train_vae: bool = False          # quirk q8: hardcoded False in reference loop
    ckp_dir: str = "ckp"
    vis_dir: str = "vis"
    log_file: str = "log.txt"
    checkpoint_freq: int = 1
    # retention: keep only the N newest epoch checkpoints (0 = keep all —
    # the reference's behavior, ~240 GB over a 150-epoch run, logger.py:93-102)
    keep_checkpoints: int = 5
    seed: int = 1
    vis_every: int = 50              # tensorboard cadence (reference logger.py:177)
    sigma_affine: float = 0.05       # Transform / equivariance TPS
    sigma_tps: float = 0.005
    points_tps: int = 5
    # aux subsystems (SURVEY.md §5): the reference's only runtime tripwire is
    # torch.autograd.set_detect_anomaly (distributed.py:26)
    # device-cache scan mode: K train steps per XLA dispatch (lax.scan over
    # the HBM frame cache).  1 = one dispatch per step (the default loop).
    steps_per_call: int = 1
    debug_nans: bool = False         # jax_debug_nans: trap the first NaN
    profile_dir: str = ""            # jax.profiler trace of steps 10..14
    tensorboard: bool = False        # scalars via tensorboardX (logger.py:177-181)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    root_dir: str = ""
    frame_shape: Tuple[int, int, int] = (256, 256, 3)
    id_sampling: bool = True
    # active default augmentation pipeline (reference dataset.py:52-57)
    rotation_degrees: float = 30.0
    pers_num: int = 30
    enlarge_num: int = 40
    jitter: float = 0.1
    use_flip: bool = False
    num_workers: int = 8
    on_device_aug: bool = True       # fused jax augmentation (north-star path)


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)


def tiny_config(image_size: int = 64, num_kp: int = 5, depth: int = 4,
                app_channels: int = 8, compute_dtype: str = "float32") -> Config:
    """A small config for CPU tests and multi-chip dry runs.

    Shapes scale down uniformly: 64x64 images, D=4 depth planes, K=5 keypoints,
    narrow channel stacks.  Matches BASELINE.json configs[0].
    """
    model = ModelConfig(
        image_size=image_size,
        num_kp=num_kp,
        depth=depth,
        app_channels=app_channels,
        afe_down_seq=(16, 24, 32),
        afe_n_res=2,
        ckd_down_seq=(3, 16, 32, 64),
        ckd_up_seq=(64, 32, 16, 8),
        hpe_filters=(16, 32, 48, 64, 96),
        hpe_blocks=(1, 1, 1, 1),
        efe_down_seq=(3, 8, 16, 24, 32, 32),
        efe_up_seq=(32, 32, 24, 16, 8, 8),
        efe_n_res=1,
        mfe_down_seq=((num_kp + 1) * 5, 16, 32, 64),
        mfe_up_seq=(64, 32, 16, 8),
        gen_up_seq=(32, 16, 8),
        gen_n_res=2,
        compute_dtype=compute_dtype,
    )
    # 64px images support only 1 pyramid scale (VGG needs >=16px for its
    # deepest tap; the reference's 3 scales assume 256px inputs).
    loss = LossConfig(n_scales=1)
    return Config(model=model, loss=loss)
