#!/bin/bash
# TPU training job launcher (reference tools/job.sh was SLURM 1 node x 4 GPUs).
# For a TPU pod slice: run this on every host (e.g. via gcloud compute tpus
# tpu-vm ssh --worker=all); jax.distributed picks up the topology.
set -euo pipefail
CONFIG=${1:-config.json}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
python -m gwen_tpu train-mesh --config "$CONFIG" "${@:2}"
