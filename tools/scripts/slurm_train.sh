#!/usr/bin/env bash
# SLURM launcher — equivalent of the reference's tools/scripts/slurm_train.sh.
# jax.distributed reads SLURM_NTASKS/SLURM_PROCID/SLURM_NODELIST directly
# (findnpropagate_tpu/parallel/mesh.py:init_distributed).
#
# Usage: sbatch/salloc, then:
#   srun --ntasks-per-node=1 bash tools/scripts/slurm_train.sh \
#     --cfg_file tools/cfgs/...yaml [args]
set -e
python "$(dirname "$0")/../train.py" --dist "$@"
