#!/bin/bash
# Usage: sh scripts/test.sh <script> <config> <dataset> [checkpoint]
script=${1:-uvltrack}
config=${2:-baseline_base}
dataset=${3:-otb99}
ckpt=${4:-}
extra=""
[ -n "$ckpt" ] && extra="--test_checkpoint $ckpt"
python -m uvltrack_tpu.cli.test "$script" "$config" --dataset_name "$dataset" $extra
python -m uvltrack_tpu.cli.analyze --tracker_name "$script" --tracker_param "$config" --dataset_name "$dataset"
