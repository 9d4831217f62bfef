"""Training runtime (layer L5).

objective.py  — GeneratorFull / DiscriminatorFull forward + loss dicts
               (reference trainer.py:214-337) as pure functions
state.py      — TrainState pytree + initialization
step.py       — jitted train_step (G update then D update), shard_map DP
checkpoint.py — epoch checkpoints (reference logger.py:93-115 format parity)
logger.py     — text log (add.txt format), tensorboard, visualizer
"""
from facevae_tpu.train.state import TrainState, create_train_state
from facevae_tpu.train.step import make_train_step
from facevae_tpu.train.checkpoint import save_checkpoint, load_checkpoint, checkpoint_path
