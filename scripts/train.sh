#!/bin/bash
# Usage: sh scripts/train.sh <script> <config>   (parity: reference scripts/train.sh)
# SPMD over all local TPU chips — no torchrun; multi-host via jax.distributed.
script=${1:-uvltrack}
config=${2:-baseline_base}
mkdir -p output/logs
nohup python -m uvltrack_tpu.cli.train --script "$script" --config "$config" \
    > "output/logs/${script}-${config}.out" 2>&1 &
echo "training started: output/logs/${script}-${config}.out"
