#!/usr/bin/env bash
# Multi-host launcher — the jax.distributed equivalent of the reference's
# tools/scripts/dist_train.sh (torch.distributed.launch wrapper).
#
# Usage (run ON EACH HOST):
#   NUM_HOSTS=2 HOST_RANK=0 MASTER_ADDR=10.0.0.1 [MASTER_PORT=29500] \
#     bash tools/scripts/dist_train.sh --cfg_file tools/cfgs/...yaml [args]
#
# Each host runs ONE process that drives all of its local TPU chips
# (single-controller JAX); WORLD_SIZE is the number of hosts, not chips.
set -e
NUM_HOSTS=${NUM_HOSTS:-1}
HOST_RANK=${HOST_RANK:-0}
MASTER_ADDR=${MASTER_ADDR:-localhost}
MASTER_PORT=${MASTER_PORT:-29500}

WORLD_SIZE=$NUM_HOSTS RANK=$HOST_RANK MASTER_ADDR=$MASTER_ADDR \
MASTER_PORT=$MASTER_PORT \
python "$(dirname "$0")/../train.py" --dist "$@"
