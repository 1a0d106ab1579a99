#!/bin/bash
# Multi-host pod launcher for batch annotation eval — the TPU counterpart
# of the reference's 4-GPU Slurm + `accelerate launch` wrapper
# (/root/reference/multi_modality_model/multi_modality_v1/eval/eval.sh:1-26).
#
# One task per host; every task runs the SAME command. jax.distributed
# bootstraps from the env vars below (core/mesh.initialize_distributed),
# the mesh spans all chips of all hosts, eval inputs shard per process
# (evals/runner host slice) and results gather to process 0.
#
# Slurm usage:
#   sbatch -N 4 --ntasks-per-node=1 scripts/eval_pod.sh \
#       --model-base ... --weights ... --esm ... --test-json ...
#
# Outside Slurm, export JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
# JAX_PROCESS_ID yourself and run the python line on each host.
#SBATCH --job-name=opus-pllm-eval
#SBATCH --ntasks-per-node=1
set -eu

# sbatch executes the batch script ONCE on the first node; srun re-enters
# this script one task per node (SLURM_STEP_ID marks the srun step, and
# only under srun is SLURM_PROCID per-task) — without this fan-out a
# single process would block forever in jax.distributed.initialize
# waiting for the other JAX_NUM_PROCESSES-1 processes
if [ -n "${SLURM_JOB_ID:-}" ] && [ -z "${SLURM_STEP_ID:-}" ]; then
    exec srun --ntasks-per-node=1 "$0" "$@"
fi

if [ -n "${SLURM_JOB_ID:-}" ]; then
    head=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
    export JAX_COORDINATOR_ADDRESS="${head}:8476"
    export JAX_NUM_PROCESSES="$SLURM_NTASKS"
    export JAX_PROCESS_ID="$SLURM_PROCID"
fi

# --distributed calls jax.distributed.initialize from the env vars above;
# --mesh D,M lays DP/FSDP x TP over every chip in the pod (ICI-major).
exec python -m opus_pllm_tpu.cli.main annotate \
    --distributed \
    --mesh "${OPUS_MESH:-8,1}" \
    --batch-size "${OPUS_BATCH:-8}" \
    --temperature "${OPUS_TEMPERATURE:-0.1}" \
    "$@"
