#!/bin/bash
# TPU-pod / SLURM launch script — the reference's examples/train.sh
# (SLURM, 1 GPU, 7 days) re-targeted at TPU slices.
#
# Two launch modes:
#
# 1) Cloud TPU pod slice (one worker process per host; JAX auto-detects the
#    TPU coordinator from the pod metadata — no env vars needed):
#
#      gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all -- \
#        "cd ~/torchdriveenv_tpu && bash examples/train_tpu.sh \
#           examples/env_configs/multi_agent/sac_training.yml"
#
# 2) SLURM multi-node CPU/TPU cluster (opt-in auto-init via TDE_DISTRIBUTED;
#    see torchdriveenv_tpu/parallel/mesh.py:maybe_init_distributed):
#
#      sbatch examples/train_tpu.sh examples/env_configs/multi_agent/sac_training.yml
#
#SBATCH --cpus-per-task=16
#SBATCH --mem-per-cpu=8G
#SBATCH --time=7-00:00:00
#SBATCH --ntasks-per-node=1

set -euo pipefail

CONFIG="${1:-examples/env_configs/multi_agent/sac_training.yml}"
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_ROOT"

# Offline by default: wandb logs locally (rl/train.py degrades gracefully);
# export WANDB_API_KEY + WANDB_MODE=online to stream (reference train.sh
# exports IAI_API_KEY/WANDB_API_KEY — no IAI key needed here, NPCs are local).
export WANDB_MODE="${WANDB_MODE:-offline}"

# SLURM multi-task jobs: opt into jax.distributed auto-init.
if [[ -n "${SLURM_NTASKS:-}" && "${SLURM_NTASKS}" != "1" ]]; then
  export TDE_DISTRIBUTED=1
fi

exec python -m torchdriveenv_tpu.rl.train --config_file "$CONFIG" "${@:2}"
