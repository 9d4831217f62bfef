#!/bin/bash
# Launch parity with the reference train.sh: 8-way data parallel, batch 3 per
# device, resume from epoch 44.  One controller process drives all devices
# (no mp.spawn / CUDA_LAUNCH_BLOCKING).
python train.py --root_dir "${ROOT_DIR:-/data/vox-png}" --batch_size 3 --ckp 44 --num_epochs 150 "$@"
